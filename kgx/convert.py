"""Record parsing (extract) and triple emission (link) kernels.

Pure functions, no Ray: the extract stage turns a MARCXML record into a
flat ``ParsedRecord`` dict (candidate triples + candidate links); the link
stage resolves candidate links against the vocabulary registry, mints URIs
and emits (subj, pred, obj) triples.

Reference parity map:
- record struct + parse:      /root/reference/mc2skos/record.py:30-160
- classification parse:       record.py:241-591
- authority parse:            record.py:594-761
- mappings (024/7XX):         record.py:183-238
- triple emission:            /root/reference/mc2skos/mc2skos.py:50-154
- record-kind dispatch:       mc2skos.py:157-177
"""

from __future__ import annotations

import hashlib
from datetime import datetime
from typing import Dict, List, Optional

from . import marc
from .config import PipelineConfig
from .marc import Datafield, InvalidRecordError, MarcRecord
from .vocab import AUTHORITY, CLASSIFICATION, ConceptScheme, UnknownSchemeError, Vocabularies

# --- namespaces ---
SKOS = "http://www.w3.org/2004/02/skos/core#"
DCTERMS = "http://purl.org/dc/terms/"
OWL = "http://www.w3.org/2002/07/owl#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
WD = "http://data.ub.uio.no/webdewey-terms#"
MADS = "http://www.loc.gov/mads/rdf/v1#"

RDF_TYPE = RDF + "type"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"

# relation codes used in candidate links; resolved to IRIs at emission
_REL = {
    "broader": SKOS + "broader",
    "narrower": SKOS + "narrower",
    "related": SKOS + "related",
    "exactMatch": SKOS + "exactMatch",
    "closeMatch": SKOS + "closeMatch",
    "broadMatch": SKOS + "broadMatch",
    "narrowMatch": SKOS + "narrowMatch",
    "relatedMatch": SKOS + "relatedMatch",
}

# ISO 25964 relation codes in $4 (parity: record.py:204-210)
_ISO25964 = {
    "=EQ": SKOS + "exactMatch",
    "~EQ": SKOS + "closeMatch",
    "BM": SKOS + "broadMatch",
    "NM": SKOS + "narrowMatch",
    "RM": SKOS + "relatedMatch",
}


def is_uri(value: str) -> bool:
    # parity: /root/reference/mc2skos/util.py:1-2
    return value.startswith("http://") or value.startswith("https://")


def _triple(subj, pred, obj, is_literal=False, lang=None, datatype=None) -> dict:
    return {
        "subj": subj,
        "pred": pred,
        "obj": obj,
        "obj_is_literal": is_literal,
        "obj_lang": lang,
        "obj_datatype": datatype,
    }


# ---------------------------------------------------------------------------
# Extract: MarcRecord → ParsedRecord dict
# ---------------------------------------------------------------------------

def _base_parse(record: MarcRecord) -> dict:
    """Shared field extraction (parity: Record.parse, record.py:129-159)."""
    # 001, overridden by 010 $a, overridden by 016 $a (record.py:131-144)
    control_number = record.control("001")
    for tag in ("010", "016"):
        value = record.first_value(tag, "a")
        if value is not None:
            control_number = value

    modified = None
    value = record.control("005")
    if value is not None:
        try:
            modified = marc.parse_long_timestamp(value)
        except ValueError:
            pass  # warn-and-ignore (record.py:154-155); counted by caller

    return {
        "control_number": control_number,
        "control_number_identifier": record.control("003"),
        "modified": modified,
        "lang": marc.normalize_language(record.first_value("040", "b")),
    }


def _collect_mappings(record: MarcRecord, links: List[dict]) -> None:
    """024 + 7XX heading-linking candidates (parity: record.py:183-238)."""
    for df in record.fields("024"):
        scheme_code = df.first("2")
        if scheme_code != "uri":
            links.append({
                "scheme_code": scheme_code,
                "relation": _REL["exactMatch"],
                "control_number": df.first("a"),
                "object": None,
                "collection": None,
                "edition": None,
                "direct_uri": None,
                "tag": "024",
            })

    for term in marc.get_terms(record, "7"):
        df = term.node
        relation = None
        for sf in df.subfields:
            if sf.code == "4":
                text = sf.value or ""
                if is_uri(text):
                    relation = text
                else:
                    relation = _ISO25964.get(text)  # None if no match
            elif sf.code in ("0", "1"):
                relation = relation if relation else _REL["closeMatch"]
                text = sf.value or ""
                if is_uri(text):
                    links.append({
                        "scheme_code": None,
                        "relation": relation,
                        "control_number": None,
                        "object": None,
                        "collection": None,
                        "edition": None,
                        "direct_uri": text,
                        "tag": df.tag,
                    })
                else:
                    scheme_code = {
                        "0": "a",   # LCSH
                        "1": "b",   # LCSH for children's literature
                        "2": "c",   # MeSH
                        "3": "d",   # NAL subject authority file
                        "4": "n",   # Source not specified
                        "5": "k",   # Canadian Subject Headings
                        "6": "v",   # Répertoire de vedettes-matière
                        "7": df.first("2"),  # source in $2
                    }.get(df.ind2)
                    links.append({
                        "scheme_code": scheme_code,
                        "relation": relation,
                        "control_number": text,
                        "object": None,
                        "collection": None,
                        "edition": None,
                        "direct_uri": None,
                        "tag": df.tag,
                    })


def parse_classification(record: MarcRecord) -> dict:
    """ClassificationRecord.parse (parity: record.py:266-433)."""
    out = _base_parse(record)
    out["kind"] = CLASSIFICATION

    created, record_type, number_type, display, synthesized, deprecated = (
        marc.parse_008_classification(record.control("008"))
    )

    el_153 = record.first_field("153")
    if el_153 is None:
        raise InvalidRecordError("153 field is missing", control_number=out["control_number"])
    table, notation, is_top_concept, parent_notation, caption = marc.parse_153(el_153)

    if record_type is None:
        # no 008 → guess from table presence (record.py:280-285)
        record_type = marc.TABLE_RECORD if table is not None else marc.SCHEDULE_RECORD

    out.update(
        created=created,
        record_type=record_type,
        number_type=number_type,
        display=display,
        synthesized=synthesized,
        deprecated=deprecated,
        table=table,
        notation=notation,
        is_top_concept=is_top_concept,
        parent_notation=parent_notation,
        pref_label=caption,
    )

    notes: List[dict] = []
    webdewey: List[dict] = []

    # 253 / 353 / 683 / 684 / 694 → editorialNote; 685 → historyNote;
    # 680 → definition (ess=ndf) or scopeNote (+ webdewey topic extraction)
    # (parity: record.py:297-388)
    for df in record.datafields:
        if df.tag in ("253", "353", "683", "684", "694"):
            notes.append({"kind": "editorialNote", "text": marc.stringify(df)})
        elif df.tag == "685":
            notes.append({"kind": "historyNote", "text": marc.stringify(df)})
        elif df.tag == "680":
            ess = df.ess_codes()
            if "ndf" in ess:
                notes.append({"kind": "definition", "text": marc.stringify(df)})
            else:
                notes.append({"kind": "scopeNote", "text": marc.stringify(df)})
                topics = [t.capitalize() for t in df.all_values("t")]
                key = None
                if "nvn" in ess:
                    key = "variantName"
                elif "nch" in ess:
                    key = "classHere"
                elif "nin" in ess:
                    key = "including"
                elif "nph" in ess:
                    key = "formerName"
                if key is not None:
                    for topic in topics:
                        webdewey.append({"key": key, "value": topic})
    out["notes"] = notes
    out["webdewey"] = webdewey

    # 7XX index terms → altLabel (record.py:391-394)
    out["alt_labels"] = [t.value for t in marc.get_terms(record, "7")]

    links: List[dict] = []
    _collect_mappings(record, links)
    out["links"] = links

    # 765 components (record.py:406-433)
    out["components"] = marc.parse_765_components(record, notation)

    # own-scheme resolution inputs (vocabularies.py:77-81)
    out["scheme_code"] = record.first_value("084", "a")
    out["scheme_edition"] = record.first_value("084", "c")
    return out


def parse_authority(record: MarcRecord) -> dict:
    """AuthorityRecord.parse (parity: record.py:594-761)."""
    out = _base_parse(record)
    out["kind"] = AUTHORITY

    leader = record.leader or ""
    out["deprecated"] = len(leader) > 5 and leader[5] in ("d", "o", "s", "x")

    field_008 = record.control("008")
    out["created"] = marc.parse_yymmdd(field_008[:6]) if field_008 else None

    links: List[dict] = []

    def class_number(df: Datafield) -> Optional[str]:
        # parity: record.py:610-617
        start = df.first("a")
        end = df.first("b")
        return "{}-{}".format(start, end) if end is not None else start

    # 065 / 080 / 083 → exactMatch to classification concepts (record.py:634-667)
    el = record.first_field("065")
    if el is not None:
        links.append({
            "scheme_code": el.first("2"), "relation": _REL["exactMatch"],
            "control_number": None, "object": class_number(el), "collection": None,
            "edition": None, "direct_uri": None, "tag": "065",
        })
    el = record.first_field("080")
    if el is not None:
        links.append({
            "scheme_code": "udc", "relation": _REL["exactMatch"],
            "control_number": None, "object": class_number(el), "collection": None,
            "edition": None, "direct_uri": None, "tag": "080",
        })
    el = record.first_field("083")
    if el is not None:
        links.append({
            "scheme_code": "ddc", "relation": _REL["exactMatch"],
            "control_number": None, "object": class_number(el), "collection": "class",
            "edition": el.first("2"), "direct_uri": None, "tag": "083",
        })

    # 1XX heading → prefLabel (last wins, record.py:670-671)
    pref_label = None
    for term in marc.get_terms(record, "1"):
        pref_label = term.value
    out["pref_label"] = pref_label

    # 4XX → altLabel (record.py:674-677)
    out["alt_labels"] = [t.value for t in marc.get_terms(record, "4")]

    # 5XX → semantic relations (record.py:679-708)
    for term in marc.get_terms(record, "5"):
        df = term.node
        local_id = df.first("0")
        if not local_id:
            continue
        sf_w = df.first("w")
        sf_4 = df.first("4")
        if sf_w == "g":
            relation = _REL["broader"]
        elif sf_w == "h":
            relation = _REL["narrower"]
        elif sf_w == "r" and sf_4 is not None and is_uri(sf_4):
            relation = sf_4
        else:
            relation = _REL["related"]
        if is_uri(local_id):
            links.append({
                "scheme_code": None, "relation": relation, "control_number": None,
                "object": None, "collection": None, "edition": None,
                "direct_uri": local_id, "tag": df.tag,
            })
        else:
            links.append({
                "scheme_code": "__self__", "relation": relation,
                "control_number": local_id, "object": None, "collection": None,
                "edition": None, "direct_uri": None, "tag": df.tag,
            })

    # note fields (record.py:710-751)
    notes: List[dict] = []
    for df in record.datafields:
        tag = df.tag
        if tag == "667":
            notes.append({"kind": "editorialNote", "text": marc.stringify(df, ("a",))})
        elif tag == "670":
            notes.append({"kind": "note", "text": "Source: " + marc.stringify(df, ("a",))})
        elif tag == "677":
            notes.append({"kind": "definition", "text": marc.stringify(df, ("a",))})
        elif tag == "678":
            notes.append({"kind": "note", "text": marc.stringify(df, ("a", "b"))})
        elif tag == "680":
            notes.append({"kind": "note", "text": marc.stringify(df, ("a", "i"))})
        elif tag == "681":
            notes.append({"kind": "example", "text": marc.stringify(df, ("a", "i"))})
        elif tag == "682":
            notes.append({"kind": "changeNote", "text": marc.stringify(df, ("a", "i"))})
        elif tag == "688":
            notes.append({"kind": "historyNote", "text": marc.stringify(df, ("a",))})
    out["notes"] = notes

    # 7XX heading-linking entries (record.py:753-761)
    _collect_mappings(record, links)
    out["links"] = links

    # scheme resolution inputs (vocabularies.py:67-75)
    scheme_code = None
    if field_008 and len(field_008) > 11:
        code = field_008[11]
        if code == "z":
            code = record.first_value("040", "f")
        if code and code != " ":
            scheme_code = code
    out["scheme_code"] = scheme_code
    out["scheme_edition"] = None

    out.update(
        record_type=None, number_type=None, display=True, synthesized=False,
        table=None, notation=None, is_top_concept=False, parent_notation=None,
        components=[], webdewey=[],
    )
    return out


def dispatch_record(record: MarcRecord, config: PipelineConfig) -> Optional[dict]:
    """Leader-byte dispatch (parity: mc2skos.py:157-174).

    Returns a ParsedRecord dict, or None when the record class is skipped.
    Raises InvalidRecordError for non-classification/authority records.
    """
    leader = record.leader
    if leader is None:
        raise InvalidRecordError(
            "Record does not have a leader", control_number=record.control("001")
        )
    kind_byte = leader[6] if len(leader) > 6 else ""
    if kind_byte == "w":
        if config.skip_classification:
            return None
        return parse_classification(record)
    elif kind_byte == "z":
        if config.skip_authority:
            return None
        return parse_authority(record)
    raise InvalidRecordError(
        "Record is not a Marc21 Classification or Authority record",
        control_number=record.control("001"),
    )


def is_public(parsed: dict) -> bool:
    """Visibility filter (parity: record.py:161-162, 574-591)."""
    if parsed["kind"] != CLASSIFICATION:
        return True
    if not parsed["display"]:
        return False
    if parsed["record_type"] not in (marc.SCHEDULE_RECORD, marc.TABLE_RECORD):
        return False
    notation = parsed["notation"] or ""
    if ":" in notation:  # add-table number
        return False
    return True


# ---------------------------------------------------------------------------
# Link: ParsedRecord + registry → triples
# ---------------------------------------------------------------------------

def resolve_scheme(parsed: dict, vocabularies: Vocabularies) -> ConceptScheme:
    if vocabularies.default_scheme is not None:
        return vocabularies.default_scheme
    code = parsed.get("scheme_code")
    if code:
        if parsed["kind"] == CLASSIFICATION:
            return vocabularies.get(code, edition=parsed.get("scheme_edition"))
        return vocabularies.get(code)
    raise UnknownSchemeError()


def generate_uris(parsed: dict, scheme: ConceptScheme):
    """Concept + scheme URI minting (parity: record.py:248-264, 599-608)."""
    scheme_uris: List[str] = []
    if parsed["kind"] == CLASSIFICATION:
        if parsed["record_type"] == marc.TABLE_RECORD:
            table = parsed["table"] if parsed["table"] is not None else ""
            uri = scheme.uri("scheme", collection="table", object=table)
            if uri:
                scheme_uris.append(uri)
        obj = "edition" if scheme.edition is not None else ""
        uri = scheme.uri("scheme", collection="scheme", object=obj)
        if uri:
            scheme_uris.append(uri)
        record_uri = scheme.uri(
            "concept",
            collection="class",
            object=parsed["notation"],
            control_number=parsed["control_number"],
        )
    else:
        uri = scheme.uri("scheme")
        if uri:
            scheme_uris.append(uri)
        record_uri = scheme.uri("concept", control_number=parsed["control_number"])
    return record_uri, scheme_uris


def resolve_links(
    parsed: dict,
    scheme: ConceptScheme,
    vocabularies: Vocabularies,
    dropped: Optional[List[dict]] = None,
) -> List[dict]:
    """Resolve candidate links to (uri, relation) pairs.

    parity: append_relation (record.py:164-181) — unknown schemes are
    warn-once dropped; here they go to the ``dropped`` metrics channel.
    """
    out = []
    for link in parsed.get("links", ()):
        if link.get("direct_uri"):
            out.append({"uri": link["direct_uri"], "relation": link["relation"]})
            continue
        code = link.get("scheme_code")
        if code == "__self__":
            code = scheme.code
        try:
            target = vocabularies.get(code, edition=link.get("edition"))
            kwargs = {}
            if link.get("control_number") is not None:
                kwargs["control_number"] = link["control_number"]
            if link.get("object") is not None:
                kwargs["object"] = link["object"]
            if link.get("collection") is not None:
                kwargs["collection"] = link["collection"]
            uri = target.uri("concept", **kwargs)
        except UnknownSchemeError:
            if dropped is not None:
                dropped.append({"scheme_code": code, "tag": link.get("tag")})
            continue
        if uri:
            out.append({"uri": uri, "relation": link["relation"]})
    return out


def _component_bnode(subj: str, components, index: int) -> str:
    # deterministic blank-node label so exact dedup stays idempotent;
    # includes a digest of the component VALUES so two records minting the
    # same subject with different 765 lists keep disjoint rdf:first/rest
    # chains (the reference uses fresh BNodes per record)
    h = hashlib.md5(
        ("\x1f".join(components) + "\x1e" + subj).encode("utf-8")
    ).hexdigest()[:16]
    return "_:cl{}_{}".format(h, index)


def emit_triples(parsed: dict, scheme: ConceptScheme, vocabularies: Vocabularies,
                 config: PipelineConfig, dropped: Optional[List[dict]] = None) -> List[dict]:
    """Flatten one linked record into triples (parity: mc2skos.py:50-154)."""
    uri, scheme_uris = generate_uris(parsed, scheme)
    lang = parsed["lang"]
    triples = [_triple(uri, RDF_TYPE, SKOS + "Concept")]

    for scheme_uri in scheme_uris:
        if parsed["is_top_concept"]:
            triples.append(_triple(uri, SKOS + "topConceptOf", scheme_uri))
        else:
            triples.append(_triple(uri, SKOS + "inScheme", scheme_uri))

    if parsed.get("created") is not None:
        triples.append(_triple(uri, DCTERMS + "created",
                               parsed["created"].strftime("%Y-%m-%d"),
                               True, None, XSD + "date"))
    if parsed.get("modified") is not None:
        triples.append(_triple(uri, DCTERMS + "modified",
                               parsed["modified"].strftime("%Y-%m-%d"),
                               True, None, XSD + "date"))

    notation = parsed.get("notation")
    if notation:
        value = "T" + notation if parsed["record_type"] == marc.TABLE_RECORD else notation
        triples.append(_triple(uri, SKOS + "notation", value, True))

    if parsed.get("control_number"):
        triples.append(_triple(uri, DCTERMS + "identifier", parsed["control_number"], True))

    alt_labels = list(parsed.get("alt_labels") or ())
    pref_label = parsed.get("pref_label")
    if pref_label:
        triples.append(_triple(uri, SKOS + "prefLabel", pref_label, True, lang))
    elif config.include_webdewey and alt_labels:
        # fallback: first index term becomes prefLabel (mc2skos.py:89-94)
        caption = alt_labels.pop(0)
        if alt_labels:
            caption = caption + ", …"
        triples.append(_triple(uri, SKOS + "prefLabel", caption, True, lang))

    if config.include_altlabels:
        for label in alt_labels:
            triples.append(_triple(uri, SKOS + "altLabel", label, True, lang))

    # same-scheme broader edge from 153 $e/$f (record.py:289-295)
    if parsed.get("parent_notation") is not None:
        parent_uri = scheme.uri("concept", collection="class", object=parsed["parent_notation"])
        if parent_uri is not None:
            triples.append(_triple(uri, SKOS + "broader", parent_uri))

    for rel in resolve_links(parsed, scheme, vocabularies, dropped):
        if rel.get("uri") is not None:
            triples.append(_triple(uri, rel["relation"], rel["uri"]))

    if not config.exclude_notes:
        for note in parsed.get("notes") or ():
            triples.append(_triple(uri, SKOS + note["kind"], note["text"], True, lang))

    if parsed.get("deprecated"):
        triples.append(_triple(uri, OWL + "deprecated", "true", True, None, XSD + "boolean"))

    components = parsed.get("components") or ()
    if config.include_components and len(components) != 0:
        # ordered RDF list with deterministic blank nodes (mc2skos.py:134-148)
        prev = None
        for i, component in enumerate(components):
            comp_uri = scheme.uri("concept", collection="class", object=component)
            node = _component_bnode(uri, components, i)
            if prev is None:
                triples.append(_triple(uri, MADS + "componentList", node))
            else:
                triples.append(_triple(prev, RDF_REST, node))
            triples.append(_triple(node, RDF_FIRST, comp_uri))
            prev = node
        triples.append(_triple(prev, RDF_REST, RDF_NIL))

    if config.include_webdewey:
        for extra in parsed.get("webdewey") or ():
            triples.append(_triple(uri, WD + extra["key"], extra["value"], True, lang))

    return triples


def record_to_triples(xml_str, config: Optional[PipelineConfig] = None,
                      vocabularies: Optional[Vocabularies] = None) -> List[dict]:
    """Per-record kernel: MARCXML string → list of triples.

    Equivalent of the reference's ``process_record`` (mc2skos.py:157-177);
    the unit-test surface for record-level triple-set parity.
    """
    config = config or PipelineConfig()
    if vocabularies is None:
        vocabularies = Vocabularies()
        vocabularies.set_default_scheme(
            generic=config.default_uri,
            scheme=config.default_scheme,
            whitespace=config.default_whitespace,
        )
    record = marc.parse_record_xml(xml_str)
    parsed = dispatch_record(record, config)
    if parsed is None:
        return []
    scheme = resolve_scheme(parsed, vocabularies)
    # authority URIs may fail on schemes without templates → InvalidRecordError
    if not is_public(parsed):
        return []
    return emit_triples(parsed, scheme, vocabularies, config)
