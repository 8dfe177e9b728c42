"""JSON-LD reader for --include preload (reference parity: mc2skos
preloads any rdflib-parseable file via ``guess_format``, mc2skos.py:
284-288, and its docs suggest including scheme descriptions — which
commonly ship as JSON-LD).

Covers the JSON-LD shapes concept-scheme descriptions actually use:
a top-level ``@context`` (term → IRI strings, prefix definitions, and
expanded term definitions with ``@id`` / ``@type`` / ``@container:
@list`` / ``@language``), ``@base`` / ``@vocab``, ``@graph`` arrays,
node objects with ``@id`` / ``@type``, nested node objects, value
objects (``@value`` / ``@language`` / ``@type``), ``@list`` arrays,
and JSON native booleans/numbers. Anything outside this subset —
``@reverse``, ``@nest``, ``@index``, scoped (nested) contexts, remote
context URLs — raises ``JsonLdParseError`` loudly; never a silent
skip.

Triples come out in the same 6-tuple shape as ``turtle.parse_turtle``:
(subj, pred, obj, obj_is_literal, obj_lang, obj_datatype).
"""

from __future__ import annotations

import json
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

_KEYWORDS_UNSUPPORTED = ("@reverse", "@nest", "@index", "@included",
                         "@version", "@propagate", "@protected")

_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


class JsonLdParseError(ValueError):
    pass


class _Ctx:
    def __init__(self, context):
        self.terms: dict = {}
        self.base: Optional[str] = None
        self.vocab: Optional[str] = None
        self.language: Optional[str] = None
        if context is None:
            return
        if isinstance(context, list):
            for c in context:
                self._load(c)
        else:
            self._load(context)

    def _load(self, context):
        if isinstance(context, str):
            raise JsonLdParseError(
                "remote @context URL %r is not supported — inline the "
                "context" % context)
        if not isinstance(context, dict):
            raise JsonLdParseError("@context must be an object")
        for term, defn in context.items():
            if term == "@base":
                self.base = defn
            elif term == "@vocab":
                self.vocab = defn
            elif term == "@language":
                self.language = defn
            elif term.startswith("@"):
                raise JsonLdParseError(
                    "unsupported @context keyword %r" % term)
            elif isinstance(defn, str):
                self.terms[term] = {"@id": defn}
            elif isinstance(defn, dict):
                bad = [k for k in defn
                       if k not in ("@id", "@type", "@container",
                                    "@language")]
                if bad:
                    raise JsonLdParseError(
                        "unsupported term-definition keys %r for %r"
                        % (bad, term))
                cont = defn.get("@container")
                if cont not in (None, "@list", "@set"):
                    raise JsonLdParseError(
                        "unsupported @container %r for %r" % (cont, term))
                self.terms[term] = dict(defn)
            else:
                raise JsonLdParseError(
                    "unsupported term definition for %r" % term)

    # -- IRI expansion ------------------------------------------------
    def expand_iri(self, value: str, vocab: bool = False) -> str:
        if value.startswith("_:"):
            return value
        if value in self.terms:
            return self.expand_iri(self.terms[value]["@id"], vocab=True)
        pfx, sep, local = value.partition(":")
        if sep and pfx in self.terms and not local.startswith("//"):
            return self.terms[pfx]["@id"] + local
        if _ABS_IRI.match(value):
            return value
        if vocab and self.vocab is not None:
            return self.vocab + value
        if not vocab and self.base is not None:
            return urljoin(self.base, value)
        raise JsonLdParseError(
            "cannot expand %r: no matching term, prefix, %s" % (
                value, "@vocab" if vocab else "@base"))

    def term_def(self, term: str) -> dict:
        return self.terms.get(term, {})


class _Reader:
    def __init__(self, ctx: _Ctx):
        self.ctx = ctx
        self.triples: List[Triple] = []
        self._anon = 0

    def _new_bnode(self) -> str:
        self._anon += 1
        return "_:kgxj%d" % self._anon

    def node(self, obj: dict) -> str:
        """Emit a node object's triples; return its subject term."""
        for k in obj:
            if k in _KEYWORDS_UNSUPPORTED or (
                    k.startswith("@") and k not in
                    ("@id", "@type", "@context", "@graph")):
                raise JsonLdParseError("unsupported keyword %r" % k)
        if "@context" in obj:
            raise JsonLdParseError(
                "nested (scoped) @context is not supported — move it "
                "to the top level")
        subj = obj.get("@id")
        if subj is None:
            subj = self._new_bnode()
        elif not isinstance(subj, str):
            raise JsonLdParseError("@id must be a string")
        else:
            subj = self.ctx.expand_iri(subj)
        types = obj.get("@type", [])
        if isinstance(types, str):
            types = [types]
        for t in types:
            self.triples.append(
                (subj, RDF_TYPE, self.ctx.expand_iri(t, vocab=True),
                 False, None, None))
        for key, value in obj.items():
            if key.startswith("@"):
                if key == "@graph":  # named-graph contents flatten
                    for n in _as_list(value):
                        self.node(_require_node(n))
                continue
            pred = self.ctx.expand_iri(key, vocab=True)
            tdef = self.ctx.term_def(key)
            if tdef.get("@container") == "@list":
                self._emit(subj, pred, {"@list": _as_list(value)}, tdef)
            else:
                for v in _as_list(value):
                    self._emit(subj, pred, v, tdef)
        return subj

    def _emit(self, subj: str, pred: str, value, tdef: dict):
        if isinstance(value, dict):
            if "@list" in value:
                extra = [k for k in value if k != "@list"]
                if extra:
                    raise JsonLdParseError(
                        "@list object with extra keys %r" % extra)
                self.triples.append(
                    (subj, pred, self._list(_as_list(value["@list"]),
                                            tdef), False, None, None))
                return
            if "@value" in value:
                self._value_object(subj, pred, value)
                return
            # nested node object
            node = self.node(_require_node(value))
            self.triples.append((subj, pred, node, False, None, None))
            return
        if isinstance(value, bool):
            self.triples.append(
                (subj, pred, "true" if value else "false", True, None,
                 XSD + "boolean"))
            return
        if isinstance(value, int):
            self.triples.append(
                (subj, pred, str(value), True, None, XSD + "integer"))
            return
        if isinstance(value, float):
            self.triples.append(
                (subj, pred, repr(value), True, None, XSD + "double"))
            return
        if isinstance(value, str):
            coerce = tdef.get("@type")
            if coerce == "@id":
                self.triples.append(
                    (subj, pred, self.ctx.expand_iri(value), False,
                     None, None))
                return
            lang = tdef.get("@language", self.ctx.language)
            if coerce is not None:
                self.triples.append(
                    (subj, pred, value, True, None,
                     self.ctx.expand_iri(coerce, vocab=True)))
            else:
                self.triples.append((subj, pred, value, True, lang, None))
            return
        raise JsonLdParseError("unsupported value %r" % (value,))

    def _value_object(self, subj: str, pred: str, value: dict):
        bad = [k for k in value if k not in ("@value", "@language",
                                             "@type")]
        if bad:
            raise JsonLdParseError("unsupported value-object keys %r"
                                   % bad)
        v = value["@value"]
        lang = value.get("@language")
        dt = value.get("@type")
        if dt is not None and lang is not None:
            raise JsonLdParseError(
                "@value with both @language and @type")
        if isinstance(v, bool):
            lex, dt = ("true" if v else "false"), dt or XSD + "boolean"
        elif isinstance(v, int):
            lex, dt = str(v), dt or XSD + "integer"
        elif isinstance(v, float):
            lex, dt = repr(v), dt or XSD + "double"
        elif isinstance(v, str):
            lex = v
        else:
            raise JsonLdParseError("unsupported @value %r" % (v,))
        if dt is not None:
            dt = self.ctx.expand_iri(dt, vocab=True)
        self.triples.append((subj, pred, lex, True, lang, dt))

    def _list(self, items: list, tdef: dict) -> str:
        if not items:
            return RDF_NIL
        heads = [self._new_bnode() for _ in items]
        inner = dict(tdef)
        inner.pop("@container", None)
        for head, item in zip(heads, items):
            self._emit(head, RDF_FIRST, item, inner)
        for a, b in zip(heads, heads[1:] + [RDF_NIL]):
            self.triples.append((a, RDF_REST, b, False, None, None))
        return heads[0]


def _as_list(v) -> list:
    return v if isinstance(v, list) else [v]


def _require_node(v) -> dict:
    if not isinstance(v, dict):
        raise JsonLdParseError("expected a node object, got %r" % (v,))
    return v


def parse_jsonld(text: str) -> List[Triple]:
    try:
        doc = json.loads(text)
    except json.JSONDecodeError as e:
        raise JsonLdParseError("invalid JSON: %s" % e)
    if isinstance(doc, list):
        ctx = _Ctx(None)
        nodes = doc
    elif isinstance(doc, dict):
        ctx = _Ctx(doc.get("@context"))
        if "@graph" in doc:
            nodes = _as_list(doc["@graph"])
            extra = [k for k in doc
                     if k not in ("@context", "@graph", "@id")]
            if extra:
                raise JsonLdParseError(
                    "top-level keys %r next to @graph are not "
                    "supported" % extra)
        else:
            top = {k: v for k, v in doc.items() if k != "@context"}
            nodes = [top] if top else []
    else:
        raise JsonLdParseError("top level must be an object or array")
    rd = _Reader(ctx)
    for n in nodes:
        rd.node(_require_node(n))
    return rd.triples
