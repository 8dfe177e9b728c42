# encoding=utf-8
"""Record-level semantic tests (port of /root/reference/test/test_process_record.py)."""

import pytest

from kgx import marc
from kgx.config import PipelineConfig
from kgx.convert import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    SKOS,
    dispatch_record,
    record_to_triples,
)
from kgx.marc import InvalidRecordError


def parse(xml, **cfg):
    return dispatch_record(marc.parse_record_xml(xml), PipelineConfig(**cfg))


def tset(triples):
    return set((t['subj'], t['pred'], t['obj'], t['obj_lang']) for t in triples)


CLS_HEAD = '''
  <mx:leader>00000nw  a2200000n  4500</mx:leader>
  <mx:controlfield tag="008">%s</mx:controlfield>
  <mx:datafield tag="084" ind2=" " ind1="0">
    <mx:subfield code="a">ddc</mx:subfield>
    <mx:subfield code="c">23no</mx:subfield>
  </mx:datafield>
'''


def cls_record(body, f008='091203aaaaaaaa'):
    return ('<mx:record xmlns:mx="http://www.loc.gov/MARC21/slim">'
            + CLS_HEAD % f008 + body + '</mx:record>')


class TestClassificationParse:
    def test_simple_number(self):
        rec = parse(cls_record('''
          <mx:datafield tag="153">
            <mx:subfield code="a">152</mx:subfield>
            <mx:subfield code="e">152</mx:subfield>
            <mx:subfield code="f">158</mx:subfield>
            <mx:subfield code="j">Sansing</mx:subfield>
          </mx:datafield>'''))
        assert rec['record_type'] == marc.SCHEDULE_RECORD
        assert rec['number_type'] == marc.SINGLE_NUMBER
        assert rec['display'] is True
        assert rec['synthesized'] is False

    def test_add_table_number_broader(self):
        # parity: test_process_record.py:48-78
        rec_xml = cls_record('''
          <mx:datafield tag="153">
            <mx:subfield code="a">811</mx:subfield>
            <mx:subfield code="c">818</mx:subfield>
            <mx:subfield code="y">2</mx:subfield>
            <mx:subfield code="a">4</mx:subfield>
            <mx:subfield code="e">811</mx:subfield>
            <mx:subfield code="f">818</mx:subfield>
            <mx:subfield code="j">1867-1899 i Canada</mx:subfield>
          </mx:datafield>''', f008='100414baabaaaa')
        rec = parse(rec_xml)
        assert rec['record_type'] == marc.TABLE_RECORD
        assert rec['notation'] == '811-818:2;4'
        # notation contains ':' → not public (add-table number)
        triples = record_to_triples(rec_xml)
        assert triples == []
        # but the broader edge would point at the span class
        from kgx.convert import emit_triples, resolve_scheme
        from kgx.vocab import Vocabularies
        voc = Vocabularies()
        scheme = resolve_scheme(rec, voc)
        ts = emit_triples(rec, scheme, voc, PipelineConfig())
        broaders = [t for t in ts if t['pred'] == SKOS + 'broader']
        assert [t['obj'] for t in broaders] == ['http://dewey.info/class/811-818/e23/']

    def test_synthesized_record_with_index_terms(self):
        rec = parse(cls_record('''
          <mx:datafield tag="153">
            <mx:subfield code="a">006.686</mx:subfield>
            <mx:subfield code="e">006.68</mx:subfield>
            <mx:subfield code="9">ess=ien</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="730" ind2="7" ind1=" ">
            <mx:subfield code="a">CorelDRAW</mx:subfield>
            <mx:subfield code="0">(OCoLC-D)99928acf</mx:subfield>
            <mx:subfield code="2">ddcri</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="750" ind2="7" ind1=" ">
            <mx:subfield code="a">CorelDRAW!</mx:subfield>
            <mx:subfield code="0">(OCoLC-D)73e62e00</mx:subfield>
            <mx:subfield code="2">ddcri</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="750" ind2="7" ind1=" ">
            <mx:subfield code="a">Personlige datamaskiner</mx:subfield>
            <mx:subfield code="x">grafikkprogrammer</mx:subfield>
            <mx:subfield code="0">(OCoLC-D)1226b03f</mx:subfield>
            <mx:subfield code="2">ddcri</mx:subfield>
            <mx:subfield code="9">ess=isCaption</mx:subfield>
          </mx:datafield>''', f008='091203aaaaaabb'))
        assert rec['synthesized'] is True
        assert rec['pref_label'] is None
        assert rec['alt_labels'] == [
            'Personlige datamaskiner--grafikkprogrammer',
            'CorelDRAW',
            'CorelDRAW!',
        ]

    def test_synthesized_number_components(self):
        rec = parse(cls_record('''
          <mx:datafield tag="153">
            <mx:subfield code="a">306.6804</mx:subfield>
            <mx:subfield code="e">306.63</mx:subfield>
            <mx:subfield code="f">306.69</mx:subfield>
            <mx:subfield code="9">ess=ien</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="765" ind2=" " ind1="0">
              <mx:subfield code="b">306.6</mx:subfield>
              <mx:subfield code="a">306.63</mx:subfield>
              <mx:subfield code="c">306.69</mx:subfield>
              <mx:subfield code="r">2</mx:subfield>
              <mx:subfield code="s">804</mx:subfield>
              <mx:subfield code="u">306.6804</mx:subfield>
          </mx:datafield>''', f008='100204aaaaaabb'))
        assert rec['components'] == ['306.6', '280.4']


class TestProcessRecord:
    def test_empty_record(self):
        with pytest.raises(InvalidRecordError):
            record_to_triples('<marc:record xmlns:marc="http://www.loc.gov/MARC21/slim"/>')

    def test_invalid_leader(self):
        with pytest.raises(InvalidRecordError):
            record_to_triples('''
              <marc:record xmlns:marc="http://www.loc.gov/MARC21/slim">
                <marc:leader>00000aa  a2200000n  4500</marc:leader>
              </marc:record>''')

    def test_record_without_153(self):
        with pytest.raises(InvalidRecordError):
            record_to_triples('''
              <marc:record xmlns:marc="http://www.loc.gov/MARC21/slim">
                <marc:leader>00000nw  a2200000n  4500</marc:leader>
              </marc:record>''')

    def test_153_triple_set_equality(self):
        # parity: test_process_record.py:441-465 — full triple-set equality
        triples = record_to_triples('''
          <marc:record xmlns:marc="http://www.loc.gov/MARC21/slim">
            <marc:leader>00000nw  a2200000n  4500</marc:leader>
            <marc:datafield tag="153" ind1=" " ind2=" ">
              <marc:subfield code="a">003.5</marc:subfield>
              <marc:subfield code="e">003</marc:subfield>
              <marc:subfield code="h">Generalities</marc:subfield>
              <marc:subfield code="h">Systems</marc:subfield>
              <marc:subfield code="j">Theory of communication and control</marc:subfield>
            </marc:datafield>
          </marc:record>
        ''', PipelineConfig(default_uri='http://test/{object}'))
        uri = 'http://test/003.5'
        RDF_TYPE = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
        assert tset(triples) == {
            (uri, RDF_TYPE, SKOS + 'Concept', None),
            (uri, SKOS + 'broader', 'http://test/003', None),
            (uri, SKOS + 'prefLabel', 'Theory of communication and control', 'en'),
            (uri, SKOS + 'inScheme', 'http://test/', None),
            (uri, SKOS + 'notation', '003.5', None),
        }

    def test_language_tagging(self):
        triples = record_to_triples('''
          <marc:record xmlns:marc="http://www.loc.gov/MARC21/slim">
            <marc:leader>00000nw  a2200000n  4500</marc:leader>
            <marc:datafield tag="040">
              <marc:subfield code="a">OCLCD</marc:subfield>
              <marc:subfield code="b">nob</marc:subfield>
            </marc:datafield>
            <marc:datafield tag="153">
              <marc:subfield code="a">564.58</marc:subfield>
              <marc:subfield code="e">564.5</marc:subfield>
              <marc:subfield code="j">Decapoda (tiarmede blekkspruter)</marc:subfield>
            </marc:datafield>
          </marc:record>
        ''', PipelineConfig(default_uri='http://test/{object}'))
        labels = [t for t in triples if t['pred'] == SKOS + 'prefLabel']
        assert labels[0]['obj_lang'] == 'nb'

    def test_component_list_order(self):
        # parity: test_process_record.py:496-536 — componentList order via
        # the rdf:first/rdf:rest chain
        triples = record_to_triples('''
        <mx:record xmlns:mx="http://www.loc.gov/MARC21/slim">
          <mx:leader>00000nw  a2200000n  4500</mx:leader>
          <mx:controlfield tag="001">ocd00132963</mx:controlfield>
          <mx:controlfield tag="008">100204aaaaaabb</mx:controlfield>
          <mx:datafield tag="084" ind2=" " ind1="0">
            <mx:subfield code="a">ddc</mx:subfield>
            <mx:subfield code="c">23no</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="153" ind2=" " ind1=" ">
            <mx:subfield code="a">306.6804</mx:subfield>
            <mx:subfield code="e">306.63</mx:subfield>
            <mx:subfield code="f">306.69</mx:subfield>
            <mx:subfield code="9">ess=ien</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="765" ind2=" " ind1="0">
            <mx:subfield code="b">306.6</mx:subfield>
            <mx:subfield code="a">306.63</mx:subfield>
            <mx:subfield code="c">306.69</mx:subfield>
            <mx:subfield code="r">2</mx:subfield>
            <mx:subfield code="s">804</mx:subfield>
            <mx:subfield code="u">306.6804</mx:subfield>
          </mx:datafield>
        </mx:record>
        ''', PipelineConfig(include_components=True))

        by_sp = {(t['subj'], t['pred']): t['obj'] for t in triples}
        uri = 'http://dewey.info/class/306.6804/e23/'
        head = by_sp[(uri, 'http://www.loc.gov/mads/rdf/v1#componentList')]
        chain = []
        node = head
        while node != RDF_NIL:
            chain.append(by_sp[(node, RDF_FIRST)])
            node = by_sp[(node, RDF_REST)]
        assert chain == ['http://dewey.info/class/306.6/e23/',
                         'http://dewey.info/class/280.4/e23/']

    def test_mappings_iso25964(self):
        # 7XX with $4 BM → broadMatch; ind2=0 → LCSH scheme 'a'
        triples = record_to_triples('''
          <mx:record xmlns:mx="http://www.loc.gov/MARC21/slim">
            <mx:leader>00000nz  a2200000n  4500</mx:leader>
            <mx:controlfield tag="001">REAL000001</mx:controlfield>
            <mx:controlfield tag="008">140825nz  a2200000n  4500</mx:controlfield>
            <mx:datafield tag="150">
              <mx:subfield code="a">Mugg</mx:subfield>
            </mx:datafield>
            <mx:datafield tag="750" ind2="0" ind1=" ">
              <mx:subfield code="a">Mold</mx:subfield>
              <mx:subfield code="4">BM</mx:subfield>
              <mx:subfield code="0">sh85086566</mx:subfield>
            </mx:datafield>
          </mx:record>
        ''', PipelineConfig(default_scheme='noubomn'))
        match = [t for t in triples if t['pred'] == SKOS + 'broadMatch']
        assert [t['obj'] for t in match] == \
            ['http://id.loc.gov/authorities/subjects/sh85086566']

    def test_authority_5xx_relations(self):
        triples = record_to_triples('''
          <mx:record xmlns:mx="http://www.loc.gov/MARC21/slim">
            <mx:leader>00000nz  a2200000n  4500</mx:leader>
            <mx:controlfield tag="001">REAL000002</mx:controlfield>
            <mx:controlfield tag="008">140825|||a|||||||||||||||||||||||||||</mx:controlfield>
            <mx:datafield tag="150">
              <mx:subfield code="a">Sopp</mx:subfield>
            </mx:datafield>
            <mx:datafield tag="550">
              <mx:subfield code="w">g</mx:subfield>
              <mx:subfield code="a">Organismer</mx:subfield>
              <mx:subfield code="0">REAL000003</mx:subfield>
            </mx:datafield>
            <mx:datafield tag="550">
              <mx:subfield code="a">Muggsopp</mx:subfield>
              <mx:subfield code="0">REAL000004</mx:subfield>
            </mx:datafield>
          </mx:record>
        ''', PipelineConfig(default_scheme='noubomn'))
        # default_scheme='noubomn' → the registry entry (code set) is used,
        # so same-scheme 5XX control numbers mint in noubomn
        broader = [t['obj'] for t in triples if t['pred'] == SKOS + 'broader']
        related = [t['obj'] for t in triples if t['pred'] == SKOS + 'related']
        assert broader == ['http://data.ub.uio.no/realfagstermer/c000003']
        assert related == ['http://data.ub.uio.no/realfagstermer/c000004']

    def test_deprecated_authority(self):
        triples = record_to_triples('''
          <mx:record xmlns:mx="http://www.loc.gov/MARC21/slim">
            <mx:leader>00000dz  a2200000n  4500</mx:leader>
            <mx:controlfield tag="001">REAL000011</mx:controlfield>
            <mx:datafield tag="150">
              <mx:subfield code="a">Mugg</mx:subfield>
            </mx:datafield>
          </mx:record>
        ''', PipelineConfig(default_scheme='noubomn'))
        depr = [t for t in triples if t['pred'].endswith('deprecated')]
        assert len(depr) == 1 and depr[0]['obj'] == 'true'

    def test_skip_flags(self):
        rec = '''
          <marc:record xmlns:marc="http://www.loc.gov/MARC21/slim">
            <marc:leader>00000nw  a2200000n  4500</marc:leader>
            <marc:datafield tag="153">
              <marc:subfield code="a">003.5</marc:subfield>
            </marc:datafield>
          </marc:record>'''
        assert record_to_triples(
            rec, PipelineConfig(default_uri='http://test/{object}',
                                skip_classification=True)) == []

    def test_altlabels_flag(self):
        rec = cls_record('''
          <mx:datafield tag="153">
            <mx:subfield code="a">543.17</mx:subfield>
            <mx:subfield code="e">543.1</mx:subfield>
            <mx:subfield code="j">Analytisk organisk kjemi</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="750" ind2="7" ind1=" ">
            <mx:subfield code="a">Analytisk kjemi</mx:subfield>
            <mx:subfield code="x">organisk kjemi</mx:subfield>
          </mx:datafield>''')
        no_alt = record_to_triples(rec)
        with_alt = record_to_triples(rec, PipelineConfig(include_altlabels=True))
        assert not [t for t in no_alt if t['pred'] == SKOS + 'altLabel']
        assert [t['obj'] for t in with_alt if t['pred'] == SKOS + 'altLabel'] == \
            ['Analytisk kjemi--organisk kjemi']

    def test_webdewey_pref_label_fallback(self):
        rec = cls_record('''
          <mx:datafield tag="153">
            <mx:subfield code="a">006.686</mx:subfield>
            <mx:subfield code="e">006.68</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="750" ind2="7" ind1=" ">
            <mx:subfield code="a">CorelDRAW</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="750" ind2="7" ind1=" ">
            <mx:subfield code="a">Tegneprogrammer</mx:subfield>
          </mx:datafield>''')
        ts = record_to_triples(rec, PipelineConfig(include_webdewey=True,
                                                   include_altlabels=True))
        pref = [t['obj'] for t in ts if t['pred'] == SKOS + 'prefLabel']
        alts = [t['obj'] for t in ts if t['pred'] == SKOS + 'altLabel']
        assert pref == ['CorelDRAW, …']
        assert alts == ['Tegneprogrammer']


class TestComponentBnodeLabels:
    """Two records minting the SAME subject with DIFFERENT 765 component
    lists must get disjoint rdf:first/rest chains (ADVICE r01; the
    reference uses fresh BNodes per record), while identical lists still
    dedup to identical labels."""

    def test_differing_lists_stay_disjoint(self):
        from kgx.convert import _component_bnode

        uri = "http://test/x"
        a0 = _component_bnode(uri, ["306.6", "280.4"], 0)
        b0 = _component_bnode(uri, ["299", "5--931"], 0)
        assert a0 != b0

    def test_identical_lists_dedup(self):
        from kgx.convert import _component_bnode

        uri = "http://test/x"
        assert _component_bnode(uri, ["306.6"], 0) == _component_bnode(uri, ["306.6"], 0)
