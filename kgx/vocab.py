"""Concept-scheme registry and URI minting (the entity-linking dictionary).

The registry is the small broadcast side of the linking stage: it is built
once per linker actor (``LinkerActor.__init__``) and queried in-memory for
every candidate link. Semantics parity with the reference:

- registry / edition memoization: /root/reference/mc2skos/vocabularies.py:37-83
- URI template expansion with slice+format coercion, org-prefix stripping
  and whitespace policy: vocabularies.py:113-160
- scheme resolution from record fields (084 / 008[11] / 040 $f):
  vocabularies.py:62-83
"""

from __future__ import annotations

import re
from typing import Dict, Optional

from .marc import InvalidRecordError, MarcRecord


class UnknownSchemeError(InvalidRecordError):
    """Unknown classification scheme / subject vocabulary (parity: error.py:11-20)."""

    def __init__(self, code: Optional[str] = None, message: Optional[str] = None):
        if message is None:
            if code is None:
                message = "Could not find classification scheme or subject vocabulary code."
            else:
                message = (
                    'Cannot generate URIs for unknown classification scheme or '
                    'subject vocabulary "%s".' % code
                )
        super().__init__(message)
        self.code = code


CLASSIFICATION = "classification"
AUTHORITY = "authority"

# Default registry — semantics of /root/reference/mc2skos/vocabularies.yml.
# Each entry: kind, concept template, scheme template, whitespace policy.
# A bare string means base_uri (used for both concept and scheme URIs).
DEFAULT_VOCABULARIES: Dict[str, dict] = {
    # classification schemes
    "asb": {"kind": CLASSIFICATION, "base_uri": "http://uri.gbv.de/terminology/asb/{object}"},
    "bkl": {"kind": CLASSIFICATION, "base_uri": "http://uri.gbv.de/terminology/bk/{object}"},
    "ddc": {"kind": CLASSIFICATION, "base_uri": "http://dewey.info/{collection}/{object}/e{edition}/"},
    "rvk": {
        "kind": CLASSIFICATION,
        "concept": "http://rvk.uni-regensburg.de/nt/{object}",
        "scheme": "http://rvk.uni-regensburg.de/nt/",
        "whitespace": "_",
    },
    "utklklass": {
        "kind": CLASSIFICATION,
        "concept": "http://data.ub.uio.no/lklass/L{object[2:]}",
        "scheme": "http://data.ub.uio.no/lklass/",
    },
    # subject schemes
    "a": {
        "kind": AUTHORITY,
        "concept": "http://id.loc.gov/authorities/subjects/{control_number}",
        "scheme": "http://id.loc.gov/authorities/subjects",
    },
    "d": {"kind": AUTHORITY, "base_uri": "http://lod.nal.usda.gov/nalt/{control_number[4:]:d}"},
    "usvd": {
        "kind": AUTHORITY,
        "concept": "http://data.ub.uio.no/usvd/c{control_number[4:]}",
        "scheme": "http://data.ub.uio.no/usvd/",
    },
    "humord": {
        "kind": AUTHORITY,
        "concept": "http://data.ub.uio.no/humord/c{control_number[4:]}",
        "scheme": "http://data.ub.uio.no/humord/",
    },
    "noubojur": {
        "kind": AUTHORITY,
        "concept": "http://data.ub.uio.no/lskjema/c{control_number[4:]:06d}",
        "scheme": "http://data.ub.uio.no/lskjema/",
    },
    "noubomn": {
        "kind": AUTHORITY,
        "concept": "http://data.ub.uio.no/realfagstermer/c{control_number[4:]}",
        "scheme": "http://data.ub.uio.no/realfagstermer/",
    },
    "noubomr": {
        "kind": AUTHORITY,
        "concept": "http://data.ub.uio.no/mrtermer/c{control_number[3:]}",
        "scheme": "http://data.ub.uio.no/mrtermer/",
    },
    "gnd": {
        "kind": AUTHORITY,
        "concept": "http://d-nb.info/gnd/{control_number}",
        "scheme": "http://d-nb.info/gnd/",
    },
    "lccn": {
        "kind": AUTHORITY,
        "concept": "http://id.loc.gov/authorities/names/{control_number}",
        "scheme": "http://id.loc.gov/authorities/names/",
    },
    "lcgft": {
        "kind": AUTHORITY,
        "concept": "http://id.loc.gov/authorities/genreForms/{control_number}",
        "scheme": "http://id.loc.gov/authorities/genreForms",
    },
    "ddcri": {"kind": AUTHORITY, "scheme": "http://id.loc.gov/vocabulary/subjectSchemes/ddcri"},
    "TESA": {"kind": AUTHORITY, "scheme": "http://lod.nal.usda.gov/nalt/"},
    "viaf": {"kind": AUTHORITY, "concept": "http://viaf.org/viaf/{control_number}"},
    "wikidata": {"kind": AUTHORITY, "concept": "http://www.wikidata.org/entity/{control_number}"},
    # NB: the reference declares whitespace '' here, but '' is falsy so the
    # effective replacement stays '-' (vocabularies.py:102); keep behavior.
    "isni": {"kind": AUTHORITY, "concept": "http://isni.org/{control_number}", "whitespace": ""},
    "orcid": {"kind": AUTHORITY, "concept": "https://orcid.org/{control_number}"},
}

def load_vocabularies_yaml(path: str) -> Dict[str, dict]:
    """Load a registry file in the reference's YAML layout
    (``classification_schemes`` / ``subject_schemes`` maps; a bare string
    value means ``base_uri``) into this module's options format."""
    import yaml

    with open(path) as fp:
        data = yaml.safe_load(fp)
    out: Dict[str, dict] = {}
    kinds = {"classification_schemes": CLASSIFICATION, "subject_schemes": AUTHORITY}
    for section, vocabs in (data or {}).items():
        kind = kinds.get(section)
        for code, options in (vocabs or {}).items():
            if isinstance(options, str):
                options = {"base_uri": options}
            else:
                options = dict(options)
            options["kind"] = kind
            out[code] = options
    return out


_ORG_PREFIX = re.compile(r"^\(.+\)(.+)$")
_TEMPLATE_PARAM = re.compile(
    r"\{(?P<param>[a-z_]+)(?:\[(?P<start>\d+)?:(?P<end>\d+)?\])?(?P<formatter>[:!][^\}]+)?\}"
)


def _compile_template(template: str):
    """Pre-split a URI template into literal strings and
    (param, start, end, format) placeholder tuples — parsed once per
    scheme instead of re.sub per minted URI."""
    segments = []
    pos = 0
    for m in _TEMPLATE_PARAM.finditer(template):
        if m.start() > pos:
            segments.append(template[pos:m.start()])
        start = int(m.group("start")) if m.group("start") else None
        end = int(m.group("end")) if m.group("end") else None
        fmt = ("{0" + m.group("formatter") + "}") if m.group("formatter") else None
        segments.append((m.group("param"), start, end, fmt))
        pos = m.end()
    if pos < len(template):
        segments.append(template[pos:])
    return segments


def fmt_apply(fmt: str, value) -> str:
    return fmt.format(value)


class ConceptScheme:
    """A vocabulary with URI templates (parity: vocabularies.py:87-160)."""

    def __init__(self, kind=None, code=None, edition=None, options=None):
        options = options or {}
        self.kind = kind
        self.code = code
        self.edition = edition
        self.options = options
        self.edition_numeric = re.sub(r"[^0-9]", "", edition or "")
        base = options.get("base_uri")
        self.concept_template = options.get("concept") or base
        self.scheme_template = options.get("scheme") or base
        # falsy override ('' included) means '-' (vocabularies.py:102)
        self.whitespace = options.get("whitespace") or "-"
        self._compiled: dict = {}

    def with_edition(self, edition: str) -> "ConceptScheme":
        return ConceptScheme(self.kind, self.code, edition, self.options)

    def __repr__(self):
        if self.edition is not None:
            return "%s (%s ed.)" % (self.code, self.edition)
        return "%s" % self.code

    def uri(self, uri_type: str, **kwargs) -> str:
        """Mint a concept/scheme URI from the template.

        Supports ``{param}``, slice syntax ``{param[4:]}`` and format
        coercion ``{param[4:]:06d}`` with int/float conversion; empty slice
        results bypass coercion (parity: vocabularies.py:134-149). The
        control number's ``(ORG)`` prefix is stripped, and whitespace in the
        final URI is replaced per scheme policy.
        """
        if uri_type == "concept":
            template = self.concept_template
        elif uri_type == "scheme":
            template = self.scheme_template
        else:
            raise ValueError("Unknown URI type: %s" % uri_type)
        if template is None:
            raise UnknownSchemeError(
                self.code,
                message='No URI template found for URIs of type "%s" in vocabulary "%s"'
                % (uri_type, self.code),
            )

        kwargs["edition"] = self.edition_numeric
        if uri_type == "scheme":
            kwargs["control_number"] = ""
        if kwargs.get("control_number") is not None:
            kwargs["control_number"] = _ORG_PREFIX.sub(r"\1", kwargs["control_number"])

        segments = self._compiled.get(uri_type)
        if segments is None:
            segments = _compile_template(template)
            self._compiled[uri_type] = segments

        parts = []
        for seg in segments:
            if isinstance(seg, str):
                parts.append(seg)
                continue
            param, start, end, fmt = seg
            raw = kwargs.get(param)
            if raw is None:
                # a malformed record (e.g. 024 with $2 but no $a) must land
                # in the data-error channel, not kill the Ray task
                raise InvalidRecordError(
                    'Missing value for URI template parameter "%s" in vocabulary "%s"'
                    % (param, self.code))
            value = raw[start:end]
            if len(value) == 0:
                # empty string is legal for scheme URIs; never coerce it
                parts.append(value)
                continue
            if fmt is None:
                parts.append(value)
                continue
            try:
                if "d" in fmt:
                    value = int(value)
                elif "f" in fmt:
                    value = float(value)
                parts.append(fmt_apply(fmt, value))
            except (ValueError, TypeError) as exc:
                raise InvalidRecordError(
                    'Cannot coerce "%s" for URI template of vocabulary "%s": %s'
                    % (value, self.code, exc))
        uri = "".join(parts)
        return uri.replace(" ", self.whitespace)


class Vocabularies:
    """Registry of concept schemes keyed by code (parity: vocabularies.py:10-83).

    Edition lookups memoize derived ``code-edition`` entries; the derivation
    is deterministic, so per-actor caches are safe.
    """

    def __init__(self, data: Optional[Dict[str, dict]] = None):
        self.entries: Dict[str, ConceptScheme] = {}
        self.default_scheme: Optional[ConceptScheme] = None
        if data is None:
            data = DEFAULT_VOCABULARIES
        for code, options in data.items():
            if isinstance(options, str):
                options = {"base_uri": options}
            kind = options.get("kind")
            self.entries[code] = ConceptScheme(kind, code, options=options)

    def __iter__(self):
        return iter(self.entries.values())

    def set_default_scheme(self, generic=None, concept=None, scheme=None, whitespace=None):
        """Manual URI-template override (parity: vocabularies.py:20-35)."""
        if generic is None and concept is None and scheme is None:
            self.default_scheme = None
            return
        options = {
            "base_uri": generic,
            "concept": concept,
            "scheme": scheme,
            "whitespace": whitespace,
        }
        if scheme in self.entries:
            self.default_scheme = self.entries[scheme]
        else:
            self.default_scheme = ConceptScheme(options={k: v for k, v in options.items()})

    def get(self, scheme_code: Optional[str], edition: Optional[str] = None) -> ConceptScheme:
        # 'n' = "source not specified" → never resolvable (vocabularies.py:50-51)
        if scheme_code == "n":
            raise UnknownSchemeError()
        if scheme_code not in self.entries:
            raise UnknownSchemeError(scheme_code)
        scheme = self.entries[scheme_code]
        if edition is not None:
            key = "%s-%s" % (scheme_code, edition)
            if key not in self.entries:
                self.entries[key] = scheme.with_edition(edition)
            return self.entries[key]
        return scheme

    def get_for_record(self, record: MarcRecord, record_kind: str) -> ConceptScheme:
        """Resolve the scheme a record belongs to (parity: vocabularies.py:62-83)."""
        if self.default_scheme is not None:
            return self.default_scheme

        if record_kind == AUTHORITY:
            field_008 = record.control("008")
            if field_008:
                code = field_008[11]
                if code == "z":
                    code = record.first_value("040", "f")
                if code:
                    return self.get(code)

        if record_kind == CLASSIFICATION:
            code = record.first_value("084", "a")
            edition = record.first_value("084", "c")
            if code:
                return self.get(code, edition=edition)

        raise UnknownSchemeError()
