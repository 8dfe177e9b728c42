# encoding=utf-8
"""Golden-corpus end-to-end parity tests.

Runs the conversion kernel over the reference's own example corpus
(/root/reference/examples/*.xml) and asserts subset containment of the paired
``.ttl`` expected triples — the same assertion the reference's
test_process_examples.py:45-46 makes. This is the P/R >= 0.95 evidence.
"""

import glob
import os
import re

import pytest

from kgx import marc
from kgx.config import PipelineConfig
from kgx.convert import record_to_triples
from kgx.marc import InvalidRecordError

from .turtle_util import parse_turtle

EXAMPLES = "/root/reference/examples"


def convert_file(path, config):
    triples = set()
    with open(path, "rb") as fp:
        data = fp.read()
    for elem in marc.iter_records_from_xml(data):
        record_xml = marc.parse_record_element(elem)
        try:
            from kgx.convert import dispatch_record, emit_triples, is_public, resolve_scheme
            from kgx.vocab import Vocabularies

            voc = Vocabularies()
            voc.set_default_scheme(
                generic=config.default_uri,
                scheme=config.default_scheme,
                whitespace=config.default_whitespace,
            )
            parsed = dispatch_record(record_xml, config)
            if parsed is None or not is_public(parsed):
                continue
            scheme = resolve_scheme(parsed, voc)
            for t in emit_triples(parsed, scheme, voc, config):
                triples.add((t["subj"], t["pred"], t["obj"], t["obj_is_literal"],
                             t["obj_lang"], t["obj_datatype"]))
        except InvalidRecordError:
            continue
    return triples


def expected_triples(ttl_path):
    with open(ttl_path, encoding="utf-8") as fp:
        return set(parse_turtle(fp.read()))


def check(xml_path, config):
    ttl_path = re.sub(r"xml$", "ttl", xml_path)
    if not os.path.isfile(ttl_path):
        pytest.skip("no golden ttl for %s" % xml_path)
    got = convert_file(xml_path, config)
    want = expected_triples(ttl_path)
    missing = want - got
    assert not missing, "missing %d/%d triples, e.g. %s" % (
        len(missing), len(want), sorted(missing)[:3])
    return got, want


def _examples(pattern):
    regex = re.compile(r"^%s\.xml$" % pattern)
    return sorted(
        f for f in glob.glob(os.path.join(EXAMPLES, "*.xml"))
        if regex.match(os.path.basename(f))
    )


@pytest.mark.parametrize("path", _examples(
    r"ddc(?P<edition>\d{2})(?P<lang>[a-z]+)-(?P<notation>((?P<table>\d+)--)?[\d.]+-?[\d.]*)"))
def test_ddc_examples(path):
    stem = os.path.basename(path)[:-4]  # strip .xml
    m = re.match(r"ddc(\d{2})[a-z]+-((\d+)--)?([\d.]+-?[\d.]*)$", stem)
    edition, table = m.group(1), m.group(3)
    got, _ = check(path, PipelineConfig(include_webdewey=True))
    # the filename encodes the expected concept URI + notation literal
    full_notation = (m.group(2) or "") + m.group(4)
    uri = "http://dewey.info/class/%s/e%s/" % (full_notation, edition)
    assert any(t[0] == uri for t in got), uri
    expected_literal = ("T" + full_notation) if table else full_notation
    assert (uri, "http://www.w3.org/2004/02/skos/core#notation",
            expected_literal, True, None, None) in got


@pytest.mark.parametrize("path", _examples(r"(bk|asb)-[0-9.ubk\-]+"))
def test_bk_asb_examples(path):
    check(path, PipelineConfig(include_altlabels=True))


@pytest.mark.parametrize("path", _examples(r"rvk(-.*)?"))
def test_rvk_examples(path):
    check(path, PipelineConfig(include_altlabels=True))


_AUTHORITY = ["lcgft", "lcsh", "noubomn", "noubojur", "humord", "nalt", "gnd"]


@pytest.mark.parametrize("path", _examples(r"(%s)-.+" % "|".join(_AUTHORITY)))
def test_authority_examples(path):
    name = os.path.basename(path)
    config = PipelineConfig(include_altlabels=True)
    if name.startswith("gnd-"):
        # GND records need --scheme gnd (reference issue #56)
        config.default_scheme = "gnd"
    check(path, config)


# The only corpus-wide precision divergence: 4 triples from rvk.xml that
# the CURRENT reference code emits but its stale rvk.ttl snapshot lacks.
# The reference's own assertion is subset-CONTAINMENT of the .ttl
# (test_process_examples.py:45-46), so a .ttl generated before a feature
# landed never gets regenerated. Specifically: ClassificationRecord.parse
# appends every get_terms('7') heading to altLabel (record.py:389-394 —
# tag 750 is in the X50 family, record.py:84-85) and get_mappings yields
# the 750 $0/$2=gnd closeMatch candidates (record.py:196-238), so with
# include_altlabels=True the reference today emits exactly these triples.
_KNOWN_EXTRA = {
    ("http://rvk.uni-regensburg.de/nt/AA_09900",
     "http://www.w3.org/2004/02/skos/core#altLabel",
     "Bibliografie", True, "de", None),
    ("http://rvk.uni-regensburg.de/nt/AA_09900",
     "http://www.w3.org/2004/02/skos/core#altLabel",
     "Zeitschrift", True, "de", None),
    ("http://rvk.uni-regensburg.de/nt/AA_09900",
     "http://www.w3.org/2004/02/skos/core#closeMatch",
     "http://d-nb.info/gnd/4006432-3", False, None, None),
    ("http://rvk.uni-regensburg.de/nt/AA_09900",
     "http://www.w3.org/2004/02/skos/core#closeMatch",
     "http://d-nb.info/gnd/4067488-5", False, None, None),
}


def test_corpus_precision_recall():
    """Aggregate P/R across the whole golden corpus (target >= 0.95)."""
    total_want = 0
    total_hit = 0
    total_got = 0
    matched_got = 0
    all_extra = set()
    for path in _examples(r".*"):
        name = os.path.basename(path)
        ttl = re.sub(r"xml$", "ttl", path)
        if not os.path.isfile(ttl):
            continue
        config = PipelineConfig(include_altlabels=True)
        if name.startswith("ddc"):
            config = PipelineConfig(include_webdewey=True)
        if name.startswith("gnd-"):
            config.default_scheme = "gnd"
        got = convert_file(path, config)
        want = expected_triples(ttl)
        total_want += len(want)
        total_hit += len(want & got)
        total_got += len(got)
        matched_got += len(got & want)
        all_extra |= got - want
    recall = total_hit / total_want if total_want else 1.0
    precision = matched_got / total_got if total_got else 1.0
    print("golden corpus: precision=%.4f recall=%.4f (want=%d got=%d)"
          % (precision, recall, total_want, total_got))
    assert recall >= 0.95
    assert precision >= 0.95
    # every emitted-but-not-expected triple is one of the 4 documented
    # stale-snapshot cases — effective precision vs the CURRENT reference
    # behavior is 1.0
    assert all_extra == _KNOWN_EXTRA, all_extra - _KNOWN_EXTRA
