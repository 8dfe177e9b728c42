"""MARCXML record model and field-level parsers.

This module is the *pure* (no Ray) kernel of the extract stage: it parses a
MARCXML ``<record>`` element once into plain Python structures and provides
the field-level transforms the reference engine defines:

- text flattening with processing-instruction stripping
  (parity: /root/reference/mc2skos/element.py:40-61)
- note assembly ``stringify`` (parity: element.py:77-98)
- heading/label building ``get_terms`` (parity: record.py:72-127)
- the 153 number-building state machine (parity: record.py:503-572)
- the 008 fixed-field decoder (parity: record.py:437-501)
- 765 synthesized-number component assembly (parity: record.py:406-433)

Unlike the reference (repeated lxml xpath over a DOM), records are parsed
exactly once into tuples/lists so the hot path inside ``map_batches`` is
allocation-light and xpath-free.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from datetime import datetime
from typing import Iterator, List, Optional, Tuple

MARC_NS = "http://www.loc.gov/MARC21/slim"

# record_type constants (parity: /root/reference/mc2skos/constants.py:5-16)
SCHEDULE_RECORD = "schedule_record"
TABLE_RECORD = "table_record"
INTERNAL_SUMMARY_OF_SCHEDULE_NUMBER = "internal_summary_of_schedule_number"
EXTERNAL_SUMMARY = "external_summary"
INTERNAL_SUMMARY_OF_TABLE_NUMBER = "internal_summary_of_table_number"
MANUAL_NOTE_RECORD = "manual_note_record"
UNKNOWN = "unknown"
SINGLE_NUMBER = "single_number"
NUMBER_SPAN = "number_span"
SUMMARY_NUMBER_SPAN = "summary_number_span"


class InvalidRecordError(RuntimeError):
    """A record that cannot be converted (parity: error.py:1-8)."""

    def __init__(self, msg: str, control_number: Optional[str] = None):
        super().__init__(msg)
        self.control_number = control_number


def parse_yymmdd(value: str) -> datetime:
    """008[:6] '%y%m%d' without strptime (hot path; same 2-digit-year
    pivot semantics: 00-68 → 2000s, 69-99 → 1900s)."""
    if len(value) != 6 or not value.isdigit():
        raise ValueError("invalid yymmdd: %r" % value)
    yy = int(value[0:2])
    year = 2000 + yy if yy <= 68 else 1900 + yy
    return datetime(year, int(value[2:4]), int(value[4:6]))


def parse_long_timestamp(value: str) -> datetime:
    """005 '%Y%m%d%H%M%S.%f': fast path for the canonical 14-digit form,
    strptime fallback for short forms (strptime backtracks on e.g.
    '201709121656.1' — keep that reference quirk)."""
    if len(value) >= 16 and value[14] == "." and value[:14].isdigit() \
            and value[15:].isdigit():
        micro = int(value[15:].ljust(6, "0")[:6])
        return datetime(int(value[0:4]), int(value[4:6]), int(value[6:8]),
                        int(value[8:10]), int(value[10:12]), int(value[12:14]),
                        micro)
    return datetime.strptime(value, "%Y%m%d%H%M%S.%f")


@dataclass(slots=True)
class Subfield:
    """One MARC subfield.

    ``value`` is the PI-flattened text; ``has_text`` records whether the raw
    XML node had direct text (the reference's list extractions filter on the
    raw ``.text`` being non-None, element.py:66, even though the returned
    string is the flattened one).
    """

    code: str
    value: Optional[str]
    has_text: bool = True


@dataclass(slots=True)
class Datafield:
    tag: str
    ind1: str
    ind2: str
    subfields: List[Subfield] = field(default_factory=list)

    def first(self, code: str) -> Optional[str]:
        for sf in self.subfields:
            if sf.code == code:
                return sf.value
        return None

    def all_values(self, code: str) -> List[str]:
        # parity with Element.text(xpath, all=True): skip subfields whose raw
        # node text is None (element.py:66)
        return [
            sf.value
            for sf in self.subfields
            if sf.code == code and sf.has_text and sf.value is not None
        ]

    def ess_codes(self) -> List[str]:
        # parity: element.py:70-71
        return [
            sf.value[4:]
            for sf in self.subfields
            if sf.code == "9" and sf.value is not None and sf.value.startswith("ess=")
        ]


@dataclass(slots=True)
class MarcRecord:
    leader: Optional[str]
    controlfields: dict
    datafields: List[Datafield]

    def control(self, tag: str) -> Optional[str]:
        return self.controlfields.get(tag)

    def fields(self, *tags: str) -> Iterator[Datafield]:
        for df in self.datafields:
            if df.tag in tags:
                yield df

    def first_field(self, tag: str) -> Optional[Datafield]:
        for df in self.datafields:
            if df.tag == tag:
                return df
        return None

    def first_value(self, tag: str, code: str) -> Optional[str]:
        for df in self.datafields:
            if df.tag == tag:
                return df.first(code)
        return None


def _flatten_text(node: ET.Element) -> Tuple[Optional[str], bool]:
    """Return (flattened text, raw-text-present).

    Captions may contain processing-instruction children; the reference
    strips them and concatenates the PI tails (element.py:40-61). Returns
    the same string the reference produces, plus whether the raw node text
    was non-None (used by list extractions).
    """
    if len(node):
        value = ""
        for child in node:
            tail = child.tail
            if tail is not None:
                value += tail
        return value, node.text is not None
    text = node.text
    return text, text is not None


def _make_parser() -> ET.XMLParser:
    # insert_pis=True keeps processing instructions as children so the
    # reference's PI-tail flattening semantics can be mirrored exactly.
    return ET.XMLParser(target=ET.TreeBuilder(insert_pis=True))


_LOCALNAME_CACHE: dict = {}


def _localname(tag) -> str:
    # called for every element of every record — memoize per distinct tag
    # (the MARCXML tag set is tiny; the bound guards junk-tag payloads)
    v = _LOCALNAME_CACHE.get(tag)
    if v is None:
        v = tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""
        if len(_LOCALNAME_CACHE) < 4096:
            _LOCALNAME_CACHE[tag] = v
    return v


def parse_record_element(elem: ET.Element) -> MarcRecord:
    """Convert an ElementTree <record> element into a MarcRecord."""
    leader = None
    controlfields: dict = {}
    datafields: List[Datafield] = []
    # hot loop of the map wave: bind the helpers once per record
    local = _localname
    flatten = _flatten_text
    mk_df = Datafield
    mk_sf = Subfield
    for child in elem:
        name = local(child.tag)
        if name == "leader":
            leader, _ = flatten(child)
        elif name == "controlfield":
            tag = child.get("tag")
            if tag is not None and tag not in controlfields:
                value, _ = flatten(child)
                controlfields[tag] = value
        elif name == "datafield":
            df = mk_df(
                tag=child.get("tag") or "",
                ind1=child.get("ind1") or "",
                ind2=child.get("ind2") or "",
            )
            sub_append = df.subfields.append
            for sf in child:
                if local(sf.tag) == "subfield":
                    value, has_text = flatten(sf)
                    sub_append(mk_sf(code=sf.get("code") or "",
                                     value=value, has_text=has_text))
            datafields.append(df)
    return MarcRecord(leader=leader, controlfields=controlfields, datafields=datafields)


def parse_record_xml(xml_str) -> MarcRecord:
    """Parse a standalone MARCXML record string/bytes."""
    root = ET.fromstring(xml_str, parser=_make_parser())
    return parse_record_element(root)


def parse_datafield_xml(xml_str) -> Datafield:
    """Parse a standalone <datafield> element (test convenience)."""
    root = ET.fromstring(xml_str, parser=_make_parser())
    df = Datafield(tag=root.get("tag") or "", ind1=root.get("ind1") or "",
                   ind2=root.get("ind2") or "")
    for sf in root:
        if _localname(sf.tag) == "subfield":
            value, has_text = _flatten_text(sf)
            df.subfields.append(Subfield(code=sf.get("code") or "", value=value,
                                         has_text=has_text))
    return df


def iter_records_from_xml(data) -> Iterator[ET.Element]:
    """Yield every <record> element found in an XML document (any depth).

    Ray-side page extraction: a page's html payload may contain a whole
    collection wrapper or several records.
    """
    root = ET.fromstring(data, parser=_make_parser())
    if _localname(root.tag) == "record":
        yield root
        return
    for elem in root.iter():
        if _localname(elem.tag) == "record":
            yield elem


# ---------------------------------------------------------------------------
# Field-level transforms
# ---------------------------------------------------------------------------

# Punctuation that suppresses the joining space (parity: element.py:92)
_NO_SPACE_BEFORE = re.compile(r"[.\?#@+,<>%~`!$^&\(\):;\]]")

STRINGIFY_DEFAULT_CODES = ("a", "c", "i", "t", "x")


def stringify(df: Datafield, codes=STRINGIFY_DEFAULT_CODES) -> str:
    """Assemble a note string from subfields (parity: element.py:77-98).

    ``$c`` is treated as the end of a number span (joined with ``-``);
    other subfields are space-joined unless they start with punctuation.
    """
    label = ""
    code_set = set(codes)
    for sf in df.subfields:
        if sf.code not in code_set:
            continue
        value = sf.value
        if value is None:
            continue
        if sf.code == "c":
            value = "-" + value
        elif len(label) != 0 and not _NO_SPACE_BEFORE.match(value[0]):
            value = " " + value
        label = label + value
    return label


_TERM_TAG_SUFFIXES = ("00", "10", "11", "30", "47", "48", "50", "51", "53", "55", "62")


def term_tags(base: str) -> Tuple[str, ...]:
    """Heading-family tags X00..X62 (parity: record.py:73-84)."""
    return tuple(base + s for s in _TERM_TAG_SUFFIXES)


def build_term_label(df: Datafield) -> str:
    """Fold heading subfields a,d,x,y,z,v into a display string.

    parity: the reducer in record.py:89-103 — ``$d`` is paren-wrapped unless
    the label ends with ``,``/``;``; ``x,y,z,v`` join with ``--``.
    """
    value = ""
    for sf in df.subfields:
        if sf.code not in ("a", "d", "x", "y", "z", "v"):
            continue
        text = sf.value
        prefix, suffix = " ", ""
        if value == "":
            prefix = ""
        elif sf.code == "d" and value[-1] not in (",", ";"):
            prefix, suffix = " (", ")"
        elif sf.code in ("x", "y", "z", "v"):
            prefix = "--"
        value = value + prefix + (text if text is not None else "") + suffix
    return value


@dataclass(slots=True)
class Term:
    value: str
    node: Datafield
    control_number: Optional[str]
    control_number_identifier: Optional[str]


def get_terms(record: MarcRecord, base: str = "1") -> List[Term]:
    """Extract heading terms for a tag family (parity: record.py:72-127).

    ``ess=isCaption`` terms are promoted to the list head. ``$0`` control
    numbers have their ``(ORG)`` qualifier split off.
    """
    tags = set(term_tags(base))
    terms: List[Term] = []
    for df in record.datafields:
        if df.tag not in tags:
            continue
        label = build_term_label(df)
        cn = df.first("0")
        cni = None
        if cn is not None:
            parts = cn.split(")")
            if len(parts) == 2:
                cni = parts[0].lstrip("(")
                cn = parts[1]
            else:
                cn = parts[0]
        term = Term(value=label, node=df, control_number=cn, control_number_identifier=cni)
        if "isCaption" in df.ess_codes():
            terms.insert(0, term)
        else:
            terms.append(term)
    return terms


def parse_008_classification(value: Optional[str]):
    """Decode the classification 008 fixed field (parity: record.py:437-501).

    Returns (created, record_type, number_type, display, synthesized,
    deprecated). ``None`` input means "guess later" (record.py:441-442).
    """
    if value is None:
        return None, None, None, True, False, False

    created = parse_yymmdd(value[:6])

    record_type = {
        "a": SCHEDULE_RECORD,
        "b": TABLE_RECORD,
        "e": EXTERNAL_SUMMARY,
        "i": INTERNAL_SUMMARY_OF_SCHEDULE_NUMBER,
        "j": INTERNAL_SUMMARY_OF_TABLE_NUMBER,
        "m": MANUAL_NOTE_RECORD,
        # undocumented value seen in the wild (record.py:458-459)
        "1": SCHEDULE_RECORD,
    }.get(value[6], UNKNOWN)

    number_type = {
        "a": SINGLE_NUMBER,
        "b": NUMBER_SPAN,
        "c": SUMMARY_NUMBER_SPAN,
    }.get(value[7], UNKNOWN)

    deprecated = value[8] in ("d", "e")
    synthesized = value[12] == "b"

    if value[13] in ("a", "b"):
        display = True
    elif value[13] == "h":
        display = False
    elif value[7] == "n":
        display = False
    else:
        display = False

    return created, record_type, number_type, display, synthesized, deprecated


def parse_153(df: Datafield):
    """The 153 number-building state machine (parity: record.py:503-572).

    Returns (table, notation, is_top_concept, parent_notation, caption).
    Order-sensitive: mode moves notation → parent → other so trailing
    subfields (e.g. ``$x`` after ``$i``) never leak into the notation.
    """
    table = None
    add_table = None
    notation = None
    parent_notation = None
    caption = None
    is_top_concept = True

    mode = "notation"
    for sf in df.subfields:
        code, value = sf.code, sf.value
        if code == "z":
            table = value
        elif code == "y":
            add_table = value
        elif code == "a" and mode == "notation":
            if add_table == "1":
                notation += ":"
            elif add_table is not None:
                notation += ":%s;" % add_table
            elif table is not None:
                notation = "%s--" % table
            else:
                notation = ""
            notation += value
            add_table = None
        elif code == "c" and mode == "notation":
            notation += "-" + value
        elif code == "e" and mode in ("notation", "parent"):
            parent_notation = ""
            if add_table == "1":
                parent_notation += ":"
            elif add_table is not None:
                parent_notation += ";%s:" % add_table
            elif table is not None:
                parent_notation = "%s--" % table
            parent_notation += value
            add_table = None
            mode = "parent"
        elif code == "f" and mode == "parent":
            parent_notation += "-" + value
        elif code == "j":
            caption = value
        elif code == "h":
            # parent headings present → not a top concept (record.py:560-564)
            is_top_concept = False
        else:
            mode = "other"

    if parent_notation is not None:
        is_top_concept = False

    return table, notation, is_top_concept, parent_notation, caption


def parse_765_components(record: MarcRecord, notation: Optional[str]) -> List[str]:
    """Assemble synthesized-number components from 765 fields.

    parity: record.py:406-433 — fields are processed in *reverse* document
    order; ``$b`` (base) only contributes while the component list is empty;
    ``$r``+``$s`` splice with the ``>3 digits → insert '.'`` rule; ``$z``
    prefixes the next component with ``{table}--``.
    """
    components: List[str] = []
    for df in reversed([f for f in record.datafields if f.tag == "765"]):
        table = ""
        rootno = ""
        for sf in df.subfields:
            code, value = sf.code, sf.value
            if code == "b":
                if len(components) == 0:
                    components.append(table + (value or ""))
                    table = ""
            elif code == "r":
                rootno = value or ""
            elif code == "z":
                table = "{0}--".format(value)
            elif code == "s":
                if value is None:
                    continue
                tmp = rootno + value
                if len(tmp) > 3:
                    tmp = tmp[:3] + "." + tmp[3:]
                components.append(table + tmp)
                table = ""
    return components


# ---------------------------------------------------------------------------
# Language normalisation (ISO-639-2b → ISO-639-1)
# ---------------------------------------------------------------------------

# Static subset of the ISO-639 table covering every 2b code with a part1
# equivalent that MARC cataloguing data plausibly uses
# (parity: record.py:157-159, which delegates to the iso639 package).
ISO639_2B_TO_1 = {
    "aar": "aa", "abk": "ab", "afr": "af", "aka": "ak", "alb": "sq", "amh": "am",
    "ara": "ar", "arg": "an", "arm": "hy", "asm": "as", "ava": "av", "ave": "ae",
    "aym": "ay", "aze": "az", "bak": "ba", "bam": "bm", "baq": "eu", "bel": "be",
    "ben": "bn", "bis": "bi", "bos": "bs", "bre": "br", "bul": "bg", "bur": "my",
    "cat": "ca", "cha": "ch", "che": "ce", "chi": "zh", "chu": "cu", "chv": "cv",
    "cor": "kw", "cos": "co", "cre": "cr", "cze": "cs", "dan": "da", "div": "dv",
    "dut": "nl", "dzo": "dz", "eng": "en", "epo": "eo", "est": "et", "ewe": "ee",
    "fao": "fo", "fij": "fj", "fin": "fi", "fre": "fr", "fry": "fy", "ful": "ff",
    "geo": "ka", "ger": "de", "gla": "gd", "gle": "ga", "glg": "gl", "glv": "gv",
    "gre": "el", "grn": "gn", "guj": "gu", "hat": "ht", "hau": "ha", "heb": "he",
    "her": "hz", "hin": "hi", "hmo": "ho", "hrv": "hr", "hun": "hu", "ibo": "ig",
    "ice": "is", "ido": "io", "iii": "ii", "iku": "iu", "ile": "ie", "ina": "ia",
    "ind": "id", "ipk": "ik", "ita": "it", "jav": "jv", "jpn": "ja", "kal": "kl",
    "kan": "kn", "kas": "ks", "kau": "kr", "kaz": "kk", "khm": "km", "kik": "ki",
    "kin": "rw", "kir": "ky", "kom": "kv", "kon": "kg", "kor": "ko", "kua": "kj",
    "kur": "ku", "lao": "lo", "lat": "la", "lav": "lv", "lim": "li", "lin": "ln",
    "lit": "lt", "ltz": "lb", "lub": "lu", "lug": "lg", "mac": "mk", "mah": "mh",
    "mal": "ml", "mao": "mi", "mar": "mr", "may": "ms", "mlg": "mg", "mlt": "mt",
    "mon": "mn", "nau": "na", "nav": "nv", "nbl": "nr", "nde": "nd", "ndo": "ng",
    "nep": "ne", "nno": "nn", "nob": "nb", "nor": "no", "nya": "ny", "oci": "oc",
    "oji": "oj", "ori": "or", "orm": "om", "oss": "os", "pan": "pa", "per": "fa",
    "pli": "pi", "pol": "pl", "por": "pt", "pus": "ps", "que": "qu", "roh": "rm",
    "rum": "ro", "run": "rn", "rus": "ru", "sag": "sg", "san": "sa", "sin": "si",
    "slo": "sk", "slv": "sl", "sme": "se", "smo": "sm", "sna": "sn", "snd": "sd",
    "som": "so", "sot": "st", "spa": "es", "srd": "sc", "srp": "sr", "ssw": "ss",
    "sun": "su", "swa": "sw", "swe": "sv", "tah": "ty", "tam": "ta", "tat": "tt",
    "tel": "te", "tgk": "tg", "tgl": "tl", "tha": "th", "tib": "bo", "tir": "ti",
    "ton": "to", "tsn": "tn", "tso": "ts", "tuk": "tk", "tur": "tr", "twi": "tw",
    "uig": "ug", "ukr": "uk", "urd": "ur", "uzb": "uz", "ven": "ve", "vie": "vi",
    "vol": "vo", "wel": "cy", "wln": "wa", "wol": "wo", "xho": "xh", "yid": "yi",
    "yor": "yo", "zha": "za", "zul": "zu", "bih": "bh",
}
ISO639_1_TO_2B = {v: k for k, v in ISO639_2B_TO_1.items() if k != "nor"}


def normalize_language(code_2b: Optional[str]) -> str:
    """040 ``$b`` ISO-639-2b (default ``eng``) → ISO-639-1.

    parity: record.py:157-159. The table covers every ISO-639-2b code
    that has a 639-1 equivalent (all 184 of them — the same set the
    reference's ``iso639.languages.get(part2b=...)`` resolves); a code
    without an equivalent raises there too (uncaught KeyError in the
    reference — here it is an InvalidRecordError routed to the error
    channel, strictly more tolerant).
    """
    code = code_2b or "eng"
    try:
        return ISO639_2B_TO_1[code]
    except KeyError:
        raise InvalidRecordError("Unknown language code in 040 $b: %s" % code)
