# encoding=utf-8
"""Unit tests for the MARC field parsers.

Ports the *semantics* of the reference's unit tests
(/root/reference/test/test_153.py, test_stringify.py) to the new kernel.
"""

import pytest

from kgx import marc


def df_from_xml(xml):
    return marc.parse_datafield_xml(xml)


def wrap(field_xml):
    return (
        '<mx:record xmlns:mx="http://www.loc.gov/MARC21/slim">%s</mx:record>' % field_xml
    )


class TestParse153:
    def test_simple_class(self):
        df = df_from_xml('''
            <marc:datafield tag="153" xmlns:marc="http://www.loc.gov/MARC21/slim">
              <marc:subfield code="a">003.5</marc:subfield>
              <marc:subfield code="e">003</marc:subfield>
              <marc:subfield code="h">Generalities</marc:subfield>
              <marc:subfield code="h">Systems</marc:subfield>
              <marc:subfield code="j">Theory of communication and control</marc:subfield>
            </marc:datafield>
        ''')
        table, notation, is_top, parent, caption = marc.parse_153(df)
        assert notation == '003.5'
        assert parent == '003'
        assert is_top is False
        assert caption == 'Theory of communication and control'

    def test_table_add_table_entry(self):
        df = df_from_xml('''
            <mx:datafield tag="153" xmlns:mx="http://www.loc.gov/MARC21/slim">
                <mx:subfield code="z">3B</mx:subfield>
                <mx:subfield code="a">81</mx:subfield>
                <mx:subfield code="c">89</mx:subfield>
                <mx:subfield code="y">1</mx:subfield>
                <mx:subfield code="a">02</mx:subfield>
                <mx:subfield code="z">3B</mx:subfield>
                <mx:subfield code="e">81</mx:subfield>
                <mx:subfield code="f">89</mx:subfield>
                <mx:subfield code="j">Anekdoter</mx:subfield>
            </mx:datafield>
        ''')
        table, notation, is_top, parent, caption = marc.parse_153(df)
        assert table == '3B'
        assert notation == '3B--81-89:02'
        assert is_top is False
        assert parent == '3B--81-89'
        assert caption == 'Anekdoter'

    def test_add_table_entry(self):
        df = df_from_xml('''
            <mx:datafield tag="153" xmlns:mx="http://www.loc.gov/MARC21/slim">
                <mx:subfield code="a">820.1</mx:subfield>
                <mx:subfield code="c">828</mx:subfield>
                <mx:subfield code="y">4</mx:subfield>
                <mx:subfield code="a">1</mx:subfield>
                <mx:subfield code="e">820</mx:subfield>
                <mx:subfield code="j">Early period to 1858</mx:subfield>
            </mx:datafield>
        ''')
        table, notation, is_top, parent, caption = marc.parse_153(df)
        assert table is None
        assert notation == '820.1-828:4;1'
        assert is_top is False
        assert parent == '820'
        assert caption == 'Early period to 1858'

    def test_table_entry_old_style(self):
        df = df_from_xml('''
            <marc:datafield tag="153" xmlns:marc="http://www.loc.gov/MARC21/slim">
                <marc:subfield code="z">6</marc:subfield>
                <marc:subfield code="a">9839</marc:subfield>
                <marc:subfield code="h">Languages</marc:subfield>
                <marc:subfield code="j">Arawakan languages</marc:subfield>
            </marc:datafield>
        ''')
        table, notation, is_top, parent, caption = marc.parse_153(df)
        assert table == '6'
        assert notation == '6--9839'
        assert is_top is False
        assert parent is None
        assert caption == 'Arawakan languages'

    def test_complex_table_entry_with_undocumented_stuff(self):
        # junk after $f must not leak into the notation
        df = df_from_xml('''
            <mx:datafield tag="153" xmlns:mx="http://www.loc.gov/MARC21/slim">
                <mx:subfield code="z">1</mx:subfield>
                <mx:subfield code="a">0926</mx:subfield>
                <mx:subfield code="z">1</mx:subfield>
                <mx:subfield code="e">0923</mx:subfield>
                <mx:subfield code="f">0928</mx:subfield>
                <mx:subfield code="j">Samlingsbiografier</mx:subfield>
                <mx:subfield code="i">[tidligere</mx:subfield>
                <mx:subfield code="z">1</mx:subfield>
                <mx:subfield code="x">0922</mx:subfield>
                <mx:subfield code="i">,</mx:subfield>
                <mx:subfield code="z">1</mx:subfield>
                <mx:subfield code="x">0923</mx:subfield>
                <mx:subfield code="i">]</mx:subfield>
            </mx:datafield>
        ''')
        table, notation, is_top, parent, caption = marc.parse_153(df)
        assert table == '1'
        assert notation == '1--0926'
        assert is_top is False
        assert parent == '1--0923-0928'
        assert caption == 'Samlingsbiografier'

    def test_standard_subdivision_info(self):
        df = df_from_xml('''
            <mx:datafield tag="153" xmlns:mx="http://www.loc.gov/MARC21/slim">
                <mx:subfield code="a">973</mx:subfield>
                <mx:subfield code="9">ess=si1</mx:subfield>
            </mx:datafield>
        ''')
        table, notation, is_top, parent, caption = marc.parse_153(df)
        assert table is None
        assert notation == '973'
        assert caption is None

    def test_synthesized_number(self):
        df = df_from_xml('''
            <mx:datafield tag="153" xmlns:mx="http://www.loc.gov/MARC21/slim">
                <mx:subfield code="a">001.4092</mx:subfield>
                <mx:subfield code="e">001.4</mx:subfield>
                <mx:subfield code="9">ess=ien</mx:subfield>
            </mx:datafield>
        ''')
        table, notation, is_top, parent, caption = marc.parse_153(df)
        assert table is None
        assert is_top is False
        assert notation == '001.4092'
        assert parent == '001.4'
        assert caption is None

    def test_extra_subfields(self):
        df = df_from_xml('''
            <mx:datafield tag="153" xmlns:mx="http://www.loc.gov/MARC21/slim">
                <mx:subfield code="a">332.0240081</mx:subfield>
                <mx:subfield code="c">332.0240088</mx:subfield>
                <mx:subfield code="e">332.024001</mx:subfield>
                <mx:subfield code="f">332.024009</mx:subfield>
                <mx:subfield code="j">Miscellaneous specific kinds of persons</mx:subfield>
                <mx:subfield code="i">[formerly</mx:subfield>
                <mx:subfield code="x">332.02404</mx:subfield>
                <mx:subfield code="c">332.0249</mx:subfield>
                <mx:subfield code="i">]</mx:subfield>
            </mx:datafield>
        ''')
        table, notation, is_top, parent, caption = marc.parse_153(df)
        assert table is None
        assert is_top is False
        assert notation == '332.0240081-332.0240088'
        assert parent == '332.024001-332.024009'
        assert caption == 'Miscellaneous specific kinds of persons'


class TestStringify:
    def test_see_note(self):
        df = df_from_xml(u'''
            <datafield tag="253" xmlns="http://www.loc.gov/MARC21/slim">
                <subfield code="t">Vitenskap og lærdom</subfield>
                <subfield code="i">, se</subfield>
                <subfield code="a">001.2</subfield>
            </datafield>
        ''')
        assert marc.stringify(df) == u'Vitenskap og lærdom, se 001.2'

    def test_see_also_note(self):
        df = df_from_xml(u'''
            <datafield tag="353" xmlns="http://www.loc.gov/MARC21/slim">
                <subfield code="i">Se også</subfield>
                <subfield code="a">900</subfield>
                <subfield code="i">for en</subfield>
                <subfield code="t">bred beskrivelse</subfield>
            </datafield>
        ''')
        assert marc.stringify(df) == u'Se også 900 for en bred beskrivelse'

    def test_note_with_class_number_range(self):
        df = df_from_xml(u'''
            <datafield tag="253" xmlns="http://www.loc.gov/MARC21/slim">
                <subfield code="i">Klassifiser</subfield>
                <subfield code="t">andre bestemte internasjonale språk</subfield>
                <subfield code="i">med språket i</subfield>
                <subfield code="a">420</subfield>
                <subfield code="c">490</subfield>
                <subfield code="i">, f.eks.</subfield>
                <subfield code="t">latin som et diplomatspråk</subfield>
                <subfield code="e">470</subfield>
                <subfield code="i">,</subfield>
                <subfield code="t">swahili som et lingua franca</subfield>
                <subfield code="e">496.392</subfield>
            </datafield>
        ''')
        assert marc.stringify(df) == (
            u'Klassifiser andre bestemte internasjonale språk med språket i 420-490,'
            u' f.eks. latin som et diplomatspråk, swahili som et lingua franca'
        )

    def test_complex_note(self):
        df = df_from_xml(u'''
            <datafield tag="680" xmlns="http://www.loc.gov/MARC21/slim">
                <subfield code="i">Inkluderer:</subfield>
                <subfield code="t">Case-studier</subfield>
                <subfield code="i">[tidligere</subfield>
                <subfield code="x">001.432</subfield>
                <subfield code="i">];</subfield>
                <subfield code="t">utvalgsteknikker</subfield>
                <subfield code="i">;</subfield>
                <subfield code="t">rundspørringer</subfield>
            </datafield>
        ''')
        assert marc.stringify(df) == (
            u'Inkluderer: Case-studier [tidligere 001.432]; utvalgsteknikker; rundspørringer'
        )


class TestFlattenText:
    def test_processing_instruction_stripping(self):
        # parity: element.py:40-61 — PI tags stripped, tails concatenated
        rec = marc.parse_record_xml(
            '<mx:record xmlns:mx="http://www.loc.gov/MARC21/slim">'
            '<mx:datafield tag="153"><mx:subfield code="j">'
            '<?ddc fotag="fo:inline" font-style="italic"?>L'
            '<?ddc fotag="fo:inline" vertical-align="super" font-size="70%"?>p'
            '<?ddc fotag="/fo:inline"?><?ddc fotag="/fo:inline"?>-rom'
            '</mx:subfield></mx:datafield></mx:record>'
        )
        assert rec.datafields[0].first('j') == 'Lp-rom'


class TestTerms:
    def test_term_label_joiners(self):
        rec = marc.parse_record_xml(wrap('''
          <mx:datafield tag="750" ind2="7" ind1=" ">
            <mx:subfield code="a">Personlige datamaskiner</mx:subfield>
            <mx:subfield code="x">grafikkprogrammer</mx:subfield>
          </mx:datafield>
        '''))
        terms = marc.get_terms(rec, '7')
        assert [t.value for t in terms] == ['Personlige datamaskiner--grafikkprogrammer']

    def test_is_caption_promotion(self):
        rec = marc.parse_record_xml(wrap('''
          <mx:datafield tag="730" ind2="7" ind1=" ">
            <mx:subfield code="a">CorelDRAW</mx:subfield>
            <mx:subfield code="0">(OCoLC-D)99928acf</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="750" ind2="7" ind1=" ">
            <mx:subfield code="a">Personlige datamaskiner</mx:subfield>
            <mx:subfield code="x">grafikkprogrammer</mx:subfield>
            <mx:subfield code="9">ess=isCaption</mx:subfield>
          </mx:datafield>
        '''))
        terms = marc.get_terms(rec, '7')
        assert [t.value for t in terms] == [
            'Personlige datamaskiner--grafikkprogrammer',
            'CorelDRAW',
        ]
        assert terms[1].control_number == '99928acf'
        assert terms[1].control_number_identifier == 'OCoLC-D'

    def test_d_paren_wrapping(self):
        # $d paren-wrapped unless preceded by ',' or ';' (record.py:95-97)
        rec = marc.parse_record_xml(wrap('''
          <mx:datafield tag="100">
            <mx:subfield code="a">Schneider, Birgit</mx:subfield>
            <mx:subfield code="d">1971-</mx:subfield>
          </mx:datafield>
        '''))
        assert marc.get_terms(rec, '1')[0].value == 'Schneider, Birgit (1971-)'

        rec2 = marc.parse_record_xml(wrap('''
          <mx:datafield tag="100">
            <mx:subfield code="a">Schneider,</mx:subfield>
            <mx:subfield code="d">1971-</mx:subfield>
          </mx:datafield>
        '''))
        assert marc.get_terms(rec2, '1')[0].value == 'Schneider, 1971-'


class TestParse008:
    def test_none(self):
        assert marc.parse_008_classification(None) == (None, None, None, True, False, False)

    def test_schedule(self):
        created, rt, nt, display, synth, depr = marc.parse_008_classification('091203aaaaaaaa')
        assert created.year == 2009 and created.month == 12 and created.day == 3
        assert rt == marc.SCHEDULE_RECORD
        assert nt == marc.SINGLE_NUMBER
        assert display is True and synth is False and depr is False

    def test_table_hidden(self):
        _, rt, nt, display, synth, depr = marc.parse_008_classification('091203baaaaaah')
        assert rt == marc.TABLE_RECORD
        assert display is False

    def test_synthesized_span(self):
        _, rt, nt, display, synth, depr = marc.parse_008_classification('091203abdaaaba')
        assert nt == marc.NUMBER_SPAN
        assert synth is True
        assert depr is True  # byte 8 == 'd'

    def test_display_b_and_7n(self):
        assert marc.parse_008_classification('091203aaaaaabb')[3] is True
        assert marc.parse_008_classification('091203anaaaaxx')[3] is False


class Test765Components:
    def test_components_root_splice(self):
        rec = marc.parse_record_xml(wrap('''
          <mx:datafield tag="765" ind2=" " ind1="0">
              <mx:subfield code="b">306.6</mx:subfield>
              <mx:subfield code="a">306.63</mx:subfield>
              <mx:subfield code="c">306.69</mx:subfield>
              <mx:subfield code="r">2</mx:subfield>
              <mx:subfield code="s">804</mx:subfield>
              <mx:subfield code="u">306.6804</mx:subfield>
          </mx:datafield>
        '''))
        assert marc.parse_765_components(rec, '306.6804') == ['306.6', '280.4']

    def test_components_reversed_with_table(self):
        rec = marc.parse_record_xml(wrap('''
          <mx:datafield tag="765" ind2=" " ind1="0">
              <mx:subfield code="b">299.31</mx:subfield>
              <mx:subfield code="a">299.31</mx:subfield>
              <mx:subfield code="a">290</mx:subfield>
              <mx:subfield code="w">290</mx:subfield>
              <mx:subfield code="y">1</mx:subfield>
              <mx:subfield code="a">1</mx:subfield>
              <mx:subfield code="c">9</mx:subfield>
              <mx:subfield code="r">20</mx:subfield>
              <mx:subfield code="s">13</mx:subfield>
              <mx:subfield code="u">299.3113</mx:subfield>
          </mx:datafield>
          <mx:datafield tag="765" ind2=" " ind1="0">
              <mx:subfield code="b">299</mx:subfield>
              <mx:subfield code="a">299.1</mx:subfield>
              <mx:subfield code="c">299.4</mx:subfield>
              <mx:subfield code="z">5</mx:subfield>
              <mx:subfield code="r">9</mx:subfield>
              <mx:subfield code="s">31</mx:subfield>
              <mx:subfield code="u">299.31</mx:subfield>
          </mx:datafield>
        '''))
        assert marc.parse_765_components(rec, '299.3113') == ['299', '5--931', '201.3']


class TestLanguage:
    def test_default(self):
        assert marc.normalize_language(None) == 'en'

    def test_bibliographic_codes(self):
        assert marc.normalize_language('nob') == 'nb'
        assert marc.normalize_language('ger') == 'de'
        assert marc.normalize_language('fre') == 'fr'
        assert marc.normalize_language('chi') == 'zh'

    def test_unknown_raises(self):
        with pytest.raises(marc.InvalidRecordError):
            marc.normalize_language('zzz')
