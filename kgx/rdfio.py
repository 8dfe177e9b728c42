"""--include RDF loading with format-from-extension (reference parity:
mc2skos preloads includes via ``rdflib.util.guess_format`` +
``graph.load``, mc2skos.py:284-288 — the format comes from the file
extension, not a flag)."""

from __future__ import annotations

import os
from typing import List

from .turtle import Triple, parse_turtle

_TURTLE_EXTS = {".ttl", ".turtle", ".n3"}
_NT_EXTS = {".nt", ".ntriples"}
_JSONLD_EXTS = {".jsonld", ".json-ld", ".json"}


def load_rdf(path: str) -> List[Triple]:
    """Parse an RDF file into (subj, pred, obj, is_literal, lang,
    datatype) tuples, inferring the format from the extension:
    Turtle (.ttl/.turtle/.n3), N-Triples (.nt — a Turtle subset), or
    JSON-LD (.jsonld/.json). Unknown extensions raise a loud
    ValueError naming the supported formats."""
    ext = os.path.splitext(path)[1].lower()
    with open(path, encoding="utf-8") as fp:
        text = fp.read()
    if ext in _TURTLE_EXTS or ext in _NT_EXTS:
        return parse_turtle(text)
    if ext in _JSONLD_EXTS:
        from .jsonld import parse_jsonld

        return parse_jsonld(text)
    raise ValueError(
        "--include %r: cannot infer RDF format from extension %r — "
        "supported: %s" % (path, ext, sorted(
            _TURTLE_EXTS | _NT_EXTS | _JSONLD_EXTS)))
