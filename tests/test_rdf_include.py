# encoding=utf-8
"""--include RDF preload: full-Turtle parsing (blank nodes, collections),
JSON-LD, format-from-extension, loud errors on unsupported syntax.

Reference parity: mc2skos preloads any rdflib-parseable file
(mc2skos.py:284-288, guess_format); kgx's own mads:componentList output
must be re-ingestable without silent mis-parse."""

import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
SKOS = "http://www.w3.org/2004/02/skos/core#"
MADS = "http://www.loc.gov/mads/rdf/v1#"


class TestTurtleFull:
    def test_collection_expands_to_first_rest_chain(self):
        from kgx.turtle import parse_turtle

        src = (
            "@prefix mads: <%s> .\n" % MADS
            + "<http://x/c1> mads:componentList "
            "( <http://x/p1> <http://x/p2> ) .\n")
        t = parse_turtle(src)
        by_pred: dict = {}
        for s, p, o, lit, lang, dt in t:
            by_pred.setdefault(p, []).append((s, o))
        head = by_pred[MADS + "componentList"][0][1]
        firsts = dict(by_pred[RDF + "first"])
        rests = dict(by_pred[RDF + "rest"])
        # walk the chain: p1 then p2 then nil
        assert firsts[head] == "http://x/p1"
        nxt = rests[head]
        assert firsts[nxt] == "http://x/p2"
        assert rests[nxt] == RDF + "nil"

    def test_anonymous_bnode_property_list(self):
        from kgx.turtle import parse_turtle

        src = (
            "@prefix skos: <%s> .\n" % SKOS
            + '<http://x/c> skos:related '
            '[ a skos:Concept ; skos:prefLabel "inner"@en ] .\n')
        t = parse_turtle(src)
        rel = [x for x in t if x[1] == SKOS + "related"]
        assert len(rel) == 1
        node = rel[0][2]
        assert node.startswith("_:")
        assert (node, RDF + "type", SKOS + "Concept", False, None,
                None) in t
        assert (node, SKOS + "prefLabel", "inner", True, "en", None) in t

    def test_base_and_sparql_directives(self):
        from kgx.turtle import parse_turtle

        src = ("BASE <http://example.org/dir/>\n"
               "PREFIX skos: <%s>\n" % SKOS
               + "<c1> skos:broader <../up> .\n")
        t = parse_turtle(src)
        assert t == [("http://example.org/dir/c1", SKOS + "broader",
                      "http://example.org/up", False, None, None)]

    def test_numeric_and_quote_forms(self):
        from kgx.turtle import parse_turtle

        xsd = "http://www.w3.org/2001/XMLSchema#"
        src = ("<http://x/s> <http://x/p> 42, -3.5, 1.0e2, false, "
               "'sq', '''tq''' .\n")
        objs = {(o, dt) for _, _, o, _, _, dt in parse_turtle(src)}
        assert (("42", xsd + "integer") in objs
                and ("-3.5", xsd + "decimal") in objs
                and ("1.0e2", xsd + "double") in objs
                and ("false", xsd + "boolean") in objs
                and ("sq", None) in objs and ("tq", None) in objs)

    def test_unsupported_syntax_raises_loudly(self):
        from kgx.turtle import TurtleParseError, parse_turtle

        cases = [
            "<http://a> <http://b> <http://c>",        # missing dot
            "<http://a> <http://b> {<http://c>} .",    # graph braces
            'pfx:x <http://b> "v" .',                  # undefined prefix
            "<http://a> <http://b> ( <http://c> .",    # unclosed list
            "<http://a> <http://b> [ <http://p> .",    # unclosed bnode
        ]
        for bad in cases:
            with pytest.raises(TurtleParseError):
                parse_turtle(bad)

    def test_own_turtle_output_reparses(self, ray_session, tmp_path):
        """kgx's own --components Turtle output (labeled-bnode
        rdf:first/rest chains) round-trips through the parser with the
        component structure intact."""
        from kgx.cli import main
        from kgx.turtle import parse_turtle

        out = str(tmp_path / "comp.ttl")
        rc = main(["/root/reference/examples/ddc21en-003.54.xml", out,
                   "--components", "--webdewey"])
        assert rc == 0
        t = parse_turtle(open(out, encoding="utf-8").read())
        preds = {p for _, p, _, _, _, _ in t}
        assert MADS + "componentList" in preds
        assert RDF + "first" in preds and RDF + "rest" in preds
        # every chain terminates at rdf:nil
        rests = {s: o for s, p, o, *_ in t if p == RDF + "rest"}
        firsts = {s for s, p, o, *_ in t if p == RDF + "first"}
        heads = [o for _, p, o, *_ in t if p == MADS + "componentList"]
        for h in heads:
            seen = 0
            while h != RDF + "nil":
                assert h in firsts and h in rests
                h = rests[h]
                seen += 1
                assert seen < 100
            assert seen >= 1


class TestIncludeRoundtrip:
    def test_include_components_graph_roundtrips(self, ray_session,
                                                 tmp_path):
        """An rdflib-style include carrying a mads:componentList as a
        Turtle COLLECTION (the syntax the old subset parser silently
        mis-attached) must arrive in the output as an intact
        rdf:first/rest chain."""
        from kgx.cli import main

        inc = tmp_path / "scheme.ttl"
        inc.write_text(
            "@prefix skos: <http://www.w3.org/2004/02/skos/core#> .\n"
            "@prefix mads: <%s> .\n" % MADS
            + "<http://x/comp> a skos:Concept ;\n"
            "  mads:componentList ( <http://x/m1> <http://x/m2> ) .\n")
        out = tmp_path / "out.nt"
        rc = main(["/root/reference/examples/ddc23no-001.xml", str(out),
                   "--include", str(inc)])
        assert rc == 0
        lines = out.read_text().splitlines()
        chain = [ln for ln in lines if RDF + "first" in ln
                 or RDF + "rest" in ln]
        # 2 first + 2 rest links, members NOT attached as direct objects
        assert len([ln for ln in chain if RDF + "first" in ln]) == 2
        assert len([ln for ln in chain if RDF + "rest" in ln]) == 2
        direct = [ln for ln in lines if "componentList" in ln
                  and "http://x/m1" in ln]
        assert direct == []  # the old silent mis-parse emitted this
        assert any("componentList" in ln and " _:" in ln
                   for ln in lines)

    def test_include_jsonld_scheme(self, ray_session, tmp_path):
        from kgx.cli import main

        inc = tmp_path / "scheme.jsonld"
        inc.write_text(
            '{"@context": {"skos": "%s"},\n' % SKOS
            + ' "@id": "http://dewey.info/scheme/edition/e23/",\n'
            ' "@type": "skos:ConceptScheme",\n'
            ' "skos:prefLabel": {"@value": "DDC 23", "@language": "en"}}'
        )
        out = tmp_path / "out.nt"
        rc = main(["/root/reference/examples/ddc23no-001.xml", str(out),
                   "--include", str(inc)])
        assert rc == 0
        text = out.read_text()
        assert ("<http://dewey.info/scheme/edition/e23/> "
                "<%stype> <%sConceptScheme>" % (RDF, SKOS)) in text
        assert '"DDC 23"@en' in text

    def test_include_unknown_extension_fails(self, ray_session,
                                             tmp_path):
        from kgx.cli import main

        inc = tmp_path / "scheme.rdfxml"
        inc.write_text("<rdf/>")
        with pytest.raises(ValueError, match="cannot infer RDF format"):
            main(["/root/reference/examples/ddc23no-001.xml",
                  str(tmp_path / "o.nt"), "--include", str(inc)])

    def test_include_bad_turtle_fails(self, ray_session, tmp_path):
        from kgx.cli import main
        from kgx.turtle import TurtleParseError

        inc = tmp_path / "bad.ttl"
        inc.write_text("<http://a> <http://b> {oops} .")
        with pytest.raises(TurtleParseError):
            main(["/root/reference/examples/ddc23no-001.xml",
                  str(tmp_path / "o.nt"), "--include", str(inc)])
