"""Turtle reader for --include preload and the golden-corpus tests.

A sequential tokenizer + recursive-descent parser over the W3C Turtle
grammar: @prefix/@base (and the SPARQL PREFIX/BASE forms), IRIs with
base resolution, prefixed names, ``a``, ``;``/``,`` continuations,
labeled (``_:x``) and anonymous (``[ ... ]``) blank nodes with property
lists, collections ``( ... )`` expanded to rdf:first/rest/nil chains,
all four literal quote forms with language tags / datatypes, and
numeric/boolean shorthand literals. Anything outside the grammar raises
``TurtleParseError`` with a line number — never a silent skip (the
reference preloads any rdflib-parseable file, mc2skos.py:284-288; a
mis-parse of e.g. a mads:componentList graph must fail loudly, not
mis-attach list members).

Not covered (raises loudly): triple-quoted strings ARE covered; unicode
IRIs are passed through verbatim; ``@base``-relative resolution uses
urljoin semantics.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple
from urllib.parse import urljoin

Triple = Tuple[str, str, str, bool, Optional[str], Optional[str]]

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF + "type"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"


class TurtleParseError(ValueError):
    pass


_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\", "'": "'",
    "b": "\b", "f": "\f",
}

# PN_LOCAL is approximated: word chars, dot, dash, percent-escapes and
# backslash-escaped punctuation (rdflib emits e.g. ``ns:a\.b``). A local
# name may CONTAIN dots but never END with one — the trailing dot is the
# statement terminator (``ns:x.`` must lex as PNAME then '.').
_PNCHR = r"[\w\-%:]|\\[-_~.!$&'()*+,;=/?#@%]"
_PNAME = (r"(?:[A-Za-z_][\w\-.]*)?:"
          r"(?:(?:" + _PNCHR + r"|\.)*(?:" + _PNCHR + r"))?")

_TOKEN_SPEC = [
    ("WS", r"[ \t\r\n]+"),
    ("COMMENT", r"#[^\n]*"),
    ("IRIREF", r"<[^<>\"{}|^`\\\x00-\x20]*>"),
    ("STRING_LONG2", r'"""(?:[^"\\]|\\.|"(?!""))*"""'),
    ("STRING_LONG1", r"'''(?:[^'\\]|\\.|'(?!''))*'''"),
    ("STRING2", r'"(?:[^"\\\n]|\\.)*"'),
    ("STRING1", r"'(?:[^'\\\n]|\\.)*'"),
    ("PREFIX_KW", r"@prefix\b|PREFIX\b"),
    ("BASE_KW", r"@base\b|BASE\b"),
    ("LANGTAG", r"@[A-Za-z]+(?:-[A-Za-z0-9]+)*"),
    ("DTSEP", r"\^\^"),
    ("DOUBLE", r"[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.?\d+[eE][+-]?\d+)"),
    ("DECIMAL", r"[+-]?\d*\.\d+"),
    ("INTEGER", r"[+-]?\d+"),
    ("BNODE", r"_:[\w](?:[\w\-.]*[\w\-])?"),
    ("KW_A", r"a(?=[ \t\r\n<\[_])"),
    ("BOOL", r"(?:true|false)(?![\w\-.:])"),
    ("PNAME", _PNAME),
    ("PUNCT", r"[;,.\[\]()]"),
]
_MASTER = re.compile("|".join("(?P<%s>%s)" % (n, p) for n, p in _TOKEN_SPEC))


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


def _unescape_local(s: str) -> str:
    """PN_LOCAL backslash escapes (``\\.`` etc.) — NOT string escapes."""
    return re.sub(r"\\([-_~.!$&'()*+,;=/?#@%])", r"\1", s)


def _tokenize(text: str):
    """Yield (kind, value, line); raise on any unlexable character."""
    pos, line = 0, 1
    n = len(text)
    while pos < n:
        m = _MASTER.match(text, pos)
        if m is None:
            raise TurtleParseError(
                "line %d: unlexable input at %r" % (
                    line, text[pos:pos + 20]))
        kind = m.lastgroup
        val = m.group()
        line += val.count("\n")
        pos = m.end()
        if kind in ("WS", "COMMENT"):
            continue
        yield kind, val, line
    yield "EOF", "", line


_STRING_KINDS = {"STRING2": 1, "STRING1": 1,
                 "STRING_LONG2": 3, "STRING_LONG1": 3}


class _Parser:
    def __init__(self, text: str):
        self.toks = list(_tokenize(text))
        self.i = 0
        self.prefixes: dict = {}
        self.base: Optional[str] = None
        self.triples: List[Triple] = []
        self._anon = 0

    # -- token plumbing ----------------------------------------------
    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind, value=None):
        k, v, ln = self.next()
        if k != kind or (value is not None and v != value):
            raise TurtleParseError(
                "line %d: expected %s%s, got %s %r" % (
                    ln, kind, " %r" % value if value else "", k, v))
        return v

    def err(self, msg):
        k, v, ln = self.peek()
        raise TurtleParseError("line %d: %s (at %s %r)" % (ln, msg, k, v))

    # -- term helpers ------------------------------------------------
    def _iri(self, raw: str) -> str:
        iri = _unescape(raw[1:-1])
        if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", iri):
            return urljoin(self.base, iri)
        return iri

    def _pname(self, raw: str) -> str:
        pfx, _, local = raw.partition(":")
        if pfx not in self.prefixes:
            raise TurtleParseError("undefined prefix %r in %r" % (pfx, raw))
        return self.prefixes[pfx] + _unescape_local(local)

    def _new_bnode(self) -> str:
        self._anon += 1
        return "_:kgxa%d" % self._anon

    # -- grammar -----------------------------------------------------
    def parse(self) -> List[Triple]:
        while True:
            k, v, ln = self.peek()
            if k == "EOF":
                return self.triples
            if k == "PREFIX_KW":
                self.next()
                pn = self.expect("PNAME")
                if not pn.endswith(":") or pn.count(":") != 1:
                    raise TurtleParseError(
                        "line %d: malformed prefix name %r" % (ln, pn))
                iri = self._iri(self.expect("IRIREF"))
                self.prefixes[pn[:-1]] = iri
                if v == "@prefix":
                    self.expect("PUNCT", ".")
                continue
            if k == "BASE_KW":
                self.next()
                self.base = self._iri(self.expect("IRIREF"))
                if v == "@base":
                    self.expect("PUNCT", ".")
                continue
            self._triples_stmt()

    def _triples_stmt(self):
        k, v, ln = self.peek()
        if k == "PUNCT" and v == "[":
            subj = self._bnode_property_list()
            # predicateObjectList is optional after a [..] subject
            k2, v2, _ = self.peek()
            if not (k2 == "PUNCT" and v2 == "."):
                self._predicate_object_list(subj)
        else:
            subj = self._subject()
            self._predicate_object_list(subj)
        self.expect("PUNCT", ".")

    def _subject(self) -> str:
        k, v, ln = self.next()
        if k == "IRIREF":
            return self._iri(v)
        if k == "PNAME":
            return self._pname(v)
        if k == "BNODE":
            return v
        if k == "PUNCT" and v == "(":
            return self._collection()
        raise TurtleParseError(
            "line %d: expected subject, got %s %r" % (ln, k, v))

    def _verb(self) -> str:
        k, v, ln = self.next()
        if k == "KW_A":
            return RDF_TYPE
        if k == "IRIREF":
            return self._iri(v)
        if k == "PNAME":
            return self._pname(v)
        raise TurtleParseError(
            "line %d: expected predicate, got %s %r" % (ln, k, v))

    def _predicate_object_list(self, subj: str):
        while True:
            pred = self._verb()
            while True:
                self._object(subj, pred)
                k, v, _ = self.peek()
                if k == "PUNCT" and v == ",":
                    self.next()
                    continue
                break
            k, v, _ = self.peek()
            if k == "PUNCT" and v == ";":
                self.next()
                # trailing ';' before '.' or ']' is legal
                k, v, _ = self.peek()
                if k == "PUNCT" and v in (".", "]"):
                    return
                continue
            return

    def _object(self, subj: str, pred: str):
        k, v, ln = self.peek()
        if k in _STRING_KINDS:
            self.next()
            q = _STRING_KINDS[k]
            value = _unescape(v[q:-q])
            lang = dt = None
            k2, v2, _ = self.peek()
            if k2 == "LANGTAG":
                self.next()
                lang = v2[1:]
            elif k2 == "DTSEP":
                self.next()
                k3, v3, ln3 = self.next()
                if k3 == "IRIREF":
                    dt = self._iri(v3)
                elif k3 == "PNAME":
                    dt = self._pname(v3)
                else:
                    raise TurtleParseError(
                        "line %d: expected datatype IRI after ^^" % ln3)
            self.triples.append((subj, pred, value, True, lang, dt))
            return
        if k == "BOOL":
            self.next()
            self.triples.append((subj, pred, v, True, None, XSD + "boolean"))
            return
        if k == "INTEGER":
            self.next()
            self.triples.append((subj, pred, v, True, None, XSD + "integer"))
            return
        if k == "DECIMAL":
            self.next()
            self.triples.append((subj, pred, v, True, None, XSD + "decimal"))
            return
        if k == "DOUBLE":
            self.next()
            self.triples.append((subj, pred, v, True, None, XSD + "double"))
            return
        if k == "IRIREF":
            self.next()
            self.triples.append((subj, pred, self._iri(v), False, None, None))
            return
        if k == "PNAME":
            self.next()
            self.triples.append(
                (subj, pred, self._pname(v), False, None, None))
            return
        if k == "BNODE":
            self.next()
            self.triples.append((subj, pred, v, False, None, None))
            return
        if k == "PUNCT" and v == "[":
            node = self._bnode_property_list()
            self.triples.append((subj, pred, node, False, None, None))
            return
        if k == "PUNCT" and v == "(":
            self.next()
            node = self._collection_body()
            self.triples.append((subj, pred, node, False, None, None))
            return
        raise TurtleParseError(
            "line %d: expected object, got %s %r" % (ln, k, v))

    def _bnode_property_list(self) -> str:
        self.expect("PUNCT", "[")
        node = self._new_bnode()
        k, v, _ = self.peek()
        if not (k == "PUNCT" and v == "]"):  # [] is a plain anon node
            self._predicate_object_list(node)
        self.expect("PUNCT", "]")
        return node

    def _collection(self) -> str:
        self.expect("PUNCT", "(")
        return self._collection_body()

    def _collection_body(self) -> str:
        """'(' already consumed; emit the rdf:first/rest chain."""
        items: List[str] = []
        chain_heads: List[str] = []
        while True:
            k, v, _ = self.peek()
            if k == "PUNCT" and v == ")":
                self.next()
                break
            head = self._new_bnode()
            chain_heads.append(head)
            # parse the item as an object of (head, rdf:first, ·)
            self._object(head, RDF_FIRST)
            items.append(head)
        if not chain_heads:
            return RDF_NIL
        for a, b in zip(chain_heads, chain_heads[1:] + [RDF_NIL]):
            self.triples.append((a, RDF_REST, b, False, None, None))
        return chain_heads[0]


def parse_turtle(text: str) -> List[Triple]:
    return _Parser(text).parse()
