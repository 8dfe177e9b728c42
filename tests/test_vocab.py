# encoding=utf-8
"""URI-minting and registry tests (parity: vocabularies.py:87-160)."""

import pytest

from kgx.vocab import ConceptScheme, UnknownSchemeError, Vocabularies


@pytest.fixture
def vocab():
    return Vocabularies()


class TestUriMinting:
    def test_ddc_concept(self, vocab):
        scheme = vocab.get('ddc', edition='23no')
        uri = scheme.uri('concept', collection='class', object='003.5', control_number=None)
        assert uri == 'http://dewey.info/class/003.5/e23/'

    def test_ddc_scheme_edition(self, vocab):
        scheme = vocab.get('ddc', edition='23no')
        assert scheme.uri('scheme', collection='scheme', object='edition') == \
            'http://dewey.info/scheme/edition/e23/'

    def test_ddc_table_scheme(self, vocab):
        scheme = vocab.get('ddc', edition='21')
        assert scheme.uri('scheme', collection='table', object='6') == \
            'http://dewey.info/table/6/e21/'

    def test_slice(self, vocab):
        scheme = vocab.get('noubomn')
        assert scheme.uri('concept', control_number='REAL000011') == \
            'http://data.ub.uio.no/realfagstermer/c000011'

    def test_slice_with_format_coercion(self, vocab):
        scheme = vocab.get('noubojur')
        assert scheme.uri('concept', control_number='UJUR504') == \
            'http://data.ub.uio.no/lskjema/c000504'

    def test_d_coercion(self, vocab):
        scheme = vocab.get('d')  # NAL: {control_number[4:]:d}
        assert scheme.uri('concept', control_number='nal1396') == \
            'http://lod.nal.usda.gov/nalt/396'

    def test_org_prefix_strip(self, vocab):
        scheme = vocab.get('gnd')
        assert scheme.uri('concept', control_number='(DE-588)4006432-3') == \
            'http://d-nb.info/gnd/4006432-3'

    def test_whitespace_policy(self, vocab):
        scheme = vocab.get('rvk')
        assert scheme.uri('concept', object='AA 09900') == \
            'http://rvk.uni-regensburg.de/nt/AA_09900'

    def test_empty_slice_skips_coercion(self, vocab):
        # scheme URIs force control_number='' — an empty slice must not be
        # int()-coerced (vocabularies.py:138-142)
        scheme = vocab.get('noubojur')
        assert scheme.uri('scheme') == 'http://data.ub.uio.no/lskjema/'

    def test_missing_template_raises(self, vocab):
        scheme = vocab.get('viaf')  # concept only, no scheme template
        with pytest.raises(UnknownSchemeError):
            scheme.uri('scheme')

    def test_falsy_whitespace_override_means_dash(self):
        # vocabularies.py:102 — '' is falsy, so the replacement stays '-'
        scheme = ConceptScheme(options={'concept': 'http://x/{control_number}', 'whitespace': ''})
        assert scheme.uri('concept', control_number='a b') == 'http://x/a-b'


class TestRegistry:
    def test_unknown_scheme(self, vocab):
        with pytest.raises(UnknownSchemeError):
            vocab.get('nope')

    def test_source_not_specified(self, vocab):
        with pytest.raises(UnknownSchemeError):
            vocab.get('n')

    def test_edition_memoization(self, vocab):
        s1 = vocab.get('ddc', edition='23no')
        s2 = vocab.get('ddc', edition='23no')
        assert s1 is s2
        assert s1.edition_numeric == '23'

    def test_default_scheme_generic(self, vocab):
        vocab.set_default_scheme(generic='http://test/{object}')
        assert vocab.default_scheme.uri('concept', object='003') == 'http://test/003'
        vocab.set_default_scheme()
        assert vocab.default_scheme is None

    def test_default_scheme_by_code(self, vocab):
        vocab.set_default_scheme(scheme='gnd')
        assert vocab.default_scheme is vocab.entries['gnd']


class TestUriErrorChannel:
    """A malformed record must raise InvalidRecordError (routed to the
    error channel), never a bare KeyError/TypeError that kills the Ray
    task (ADVICE r01: 024 with known $2 but no $a)."""

    def test_missing_param_raises_invalid_record(self, vocab):
        from kgx.marc import InvalidRecordError

        scheme = vocab.get('gnd')
        with pytest.raises(InvalidRecordError):
            scheme.uri('concept')  # no control_number at all

    def test_none_param_raises_invalid_record(self, vocab):
        from kgx.marc import InvalidRecordError

        scheme = vocab.get('gnd')
        with pytest.raises(InvalidRecordError):
            scheme.uri('concept', control_number=None)

    def test_uncoercible_param_raises_invalid_record(self, vocab):
        from kgx.marc import InvalidRecordError

        scheme = vocab.get('noubojur')  # {control_number[4:]:06d}
        with pytest.raises(InvalidRecordError):
            scheme.uri('concept', control_number='abcdNOTANUMBER')


class TestLanguageTable:
    def test_full_iso639_coverage(self):
        from kgx.marc import ISO639_2B_TO_1, normalize_language

        # complete 2b→1 registry (184 codes), not a curated subset
        assert len(ISO639_2B_TO_1) == 184
        assert normalize_language('ita') == 'it'
        assert normalize_language('jpn') == 'ja'
        assert normalize_language('bih') == 'bh'
        assert normalize_language(None) == 'en'  # default eng

    def test_unknown_code_goes_to_error_channel(self):
        from kgx.marc import InvalidRecordError, normalize_language

        with pytest.raises(InvalidRecordError):
            normalize_language('zxx')  # no 639-1 equivalent
