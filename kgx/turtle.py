"""Minimal Turtle reader (for --include preload and the golden-corpus tests).

Covers the subset of Turtle emitted by the reference's golden ``.ttl``
files (otsrdflib output): @prefix declarations, IRIs, prefixed names,
``a``, ``;``/``,`` continuations, plain/lang-tagged/typed literals and the
bare booleans ``true``/``false``. Not a general-purpose parser.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

Triple = Tuple[str, str, str, bool, Optional[str], Optional[str]]

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_TOKEN = re.compile(
    r"""
    (?P<iri><[^>]*>)
  | (?P<literal>"(?:[^"\\]|\\.)*")(?:@(?P<lang>[A-Za-z0-9\-]+)|\^\^(?P<dtiri><[^>]*>|[A-Za-z_][\w\-]*:[\w\-.]*))?
  | (?P<punct>[;,.\[\]\(\)])
  | (?P<kw>\ba\b|true|false)
  | (?P<pname>[A-Za-z_][\w\-]*:[\w\-.%]*|:[\w\-.%]+)
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\", "'": "'",
}


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt == "u":
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            if nxt == "U":
                out.append(chr(int(s[i + 2:i + 10], 16)))
                i += 10
                continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def parse_turtle(text: str) -> List[Triple]:
    prefixes = {}
    triples: List[Triple] = []

    # strip comments (golden files have none inside literals)
    lines = []
    for line in text.splitlines():
        if line.strip().startswith("#"):
            continue
        lines.append(line)
    body = "\n".join(lines)

    # prefix declarations
    for m in re.finditer(r"@prefix\s+([\w\-]*):\s*<([^>]*)>\s*\.", body):
        prefixes[m.group(1)] = m.group(2)
    body = re.sub(r"@prefix\s+[\w\-]*:\s*<[^>]*>\s*\.", "", body)

    def expand(pname: str) -> str:
        pfx, _, local = pname.partition(":")
        return prefixes.get(pfx, pfx + ":") + local

    subj = None
    pred = None
    for m in _TOKEN.finditer(body):
        if m.group("punct"):
            p = m.group("punct")
            if p == ".":
                subj = pred = None
            elif p == ";":
                pred = None
            # ',' keeps subj+pred
            continue
        if m.group("kw") in ("true", "false"):
            triples.append((subj, pred, m.group("kw"), True, None, XSD + "boolean"))
            continue
        if m.group("kw") == "a":
            pred = RDF_TYPE
            continue
        if m.group("literal") is not None:
            value = _unescape(m.group("literal")[1:-1])
            lang = m.group("lang")
            dt = m.group("dtiri")
            if dt:
                dt = dt[1:-1] if dt.startswith("<") else expand(dt)
            triples.append((subj, pred, value, True, lang, dt))
            continue
        term = None
        if m.group("iri"):
            term = m.group("iri")[1:-1]
        elif m.group("pname"):
            term = expand(m.group("pname"))
        if term is None:
            continue
        if subj is None:
            subj = term
        elif pred is None:
            pred = term
        else:
            triples.append((subj, pred, term, False, None, None))
    return triples
