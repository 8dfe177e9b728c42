# encoding=utf-8
"""Tests for the CLI surface, --include preload, YAML vocab loading, and
the union-find components operator."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestComponents:
    def test_sameas_components(self, ray_session):
        from kgx.components import sameas_components

        df = sameas_components("/root/testdata/sf0.001").to_pandas()
        assert len(df) == 500
        assert df["component"].nunique() == 20  # one component per source
        # component id is the minimum doc_id of the group
        assert (df.groupby("component")["doc_id"].min().values ==
                sorted(df["component"].unique())).all()

    def test_pagerank_matches_local_integer_reference(self, ray_session):
        import pyarrow.parquet as pq

        from kgx.components import _PR_Q, pagerank

        sf = "/root/testdata/sf0.001"
        df = pagerank(sf).to_pandas().set_index("doc_id")["rank_q"]
        n = pq.read_metadata("%s/documents.parquet" % sf).num_rows
        assert len(df) == n
        # local reference with plain Python ints (same floor arithmetic)
        edges: dict[int, list[int]] = {}
        for v in range(n):
            dsts = {(v * v + 1) % n} | ({v // 2} if v > 0 else set())
            edges[v] = sorted(dsts)
        base = (15 * (_PR_Q // n)) // 100
        r = {v: _PR_Q // n for v in range(n)}
        for _ in range(8):
            acc = {v: 0 for v in range(n)}
            for v, dsts in edges.items():
                c = r[v] // len(dsts)
                for d in dsts:
                    acc[d] += c
            r = {v: base + (85 * acc[v]) // 100 for v in range(n)}
        assert {v: int(df.loc[v]) for v in range(n)} == r
        # ranks stay positive and total mass stays below the quantum
        assert min(r.values()) > 0 and sum(r.values()) <= _PR_Q

    def test_pagerank_fast_and_distributed_paths_agree(self, ray_session):
        import pandas as pd
        import ray.data

        from kgx.components import pagerank_ranks

        edges = ray.data.from_pandas(pd.DataFrame({
            "src": [0, 1, 2, 3, 4, 4, 5],
            "dst": [1, 2, 0, 0, 1, 2, 5],
        }))
        fast = (pagerank_ranks(edges, num_nodes=6, iters=4).to_pandas()
                .sort_values("node").reset_index(drop=True))
        dist = (pagerank_ranks(edges, num_nodes=6, iters=4,
                               small_graph_threshold=0).to_pandas()
                .sort_values("node").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            fast.astype("int64"), dist.astype("int64"))

    def test_components_fast_and_distributed_paths_agree(self, ray_session):
        import pandas as pd
        import ray.data

        from kgx.components import connected_components

        edges = ray.data.from_pandas(pd.DataFrame({
            "a": [1, 2, 5, 9, 9, 20],
            "b": [2, 3, 6, 10, 11, 21],
        }))
        fast = connected_components(edges).to_pandas()
        dist = connected_components(edges, small_graph_threshold=0).to_pandas()
        key = lambda df: sorted(map(tuple, df[["node", "component"]].values))
        assert key(fast) == key(dist)
        assert len(fast) == 10

    def test_connected_components_basic(self, ray_session):
        import pandas as pd
        import ray.data

        from kgx.components import connected_components

        edges = ray.data.from_pandas(pd.DataFrame({
            "a": [1, 2, 5, 7], "b": [2, 3, 6, 7]}))
        df = connected_components(edges).to_pandas()
        got = dict(zip(df["node"], df["component"]))
        assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 7}

    def test_kcore_peel_semantics(self, ray_session):
        # triangle {1,2,3} + pendant edge 3-4: k=2 peels the pendant in
        # round 1 (deg(4)=1), leaving the triangle at core_deg 2 each
        import pandas as pd
        import ray.data

        from kgx.components import _local_kcore

        edges = ray.data.from_pandas(pd.DataFrame({
            "a": [1, 1, 2, 3], "b": [2, 3, 3, 4]}))
        df = _local_kcore(edges, k=2, rounds=4).to_pandas()
        assert dict(zip(df["doc_id"], df["core_deg"])) == {1: 2, 2: 2, 3: 2}

    def test_kcore_fast_and_distributed_paths_agree(self, ray_session):
        from kgx.components import kcore

        sf = "/root/testdata/sf0.001"
        key = lambda ds: sorted(
            map(tuple, ds.to_pandas()[["doc_id", "core_deg"]].values))
        fast = key(kcore(sf))
        dist = key(kcore(sf, small_graph_threshold=0, num_partitions=4))
        assert fast == dist and len(fast) > 0

    def test_labelprop_semantics(self, ray_session):
        # triangle {1,2,3}: round 1 votes → {1:2, 2:1, 3:1}; round 2
        # collapses onto 1; the component converges to its min id
        import pandas as pd
        import ray.data

        from kgx.components import _local_labelprop

        edges = ray.data.from_pandas(pd.DataFrame({
            "a": [1, 1, 2], "b": [2, 3, 3]}))
        one = _local_labelprop(edges, rounds=1).to_pandas()
        assert dict(zip(one["doc_id"], one["label"])) == {1: 2, 2: 1, 3: 1}
        done = _local_labelprop(edges, rounds=4).to_pandas()
        assert dict(zip(done["doc_id"], done["label"])) == {1: 1, 2: 1, 3: 1}

    def test_labelprop_fast_and_distributed_paths_agree(self, ray_session):
        from kgx.components import label_propagation

        sf = "/root/testdata/sf0.001"
        key = lambda ds: sorted(
            map(tuple, ds.to_pandas()[["doc_id", "label"]].values))
        fast = key(label_propagation(sf))
        dist = key(label_propagation(sf, small_graph_threshold=0,
                                     num_partitions=4))
        assert fast == dist and len(fast) > 0

    def test_kcore_converged_by_fixed_rounds(self, ray_session):
        # the fixed-round answer equals rounds+1: the peel reaches its
        # fixpoint inside the 4 rounds the oracle unrolls
        from kgx.components import kcore

        sf = "/root/testdata/sf0.001"
        key = lambda ds: sorted(
            map(tuple, ds.to_pandas()[["doc_id", "core_deg"]].values))
        assert key(kcore(sf, rounds=4)) == key(kcore(sf, rounds=5))


class TestVocabYaml:
    def test_load_reference_format(self, tmp_path):
        from kgx.vocab import Vocabularies, load_vocabularies_yaml

        path = tmp_path / "vocab.yml"
        path.write_text(
            "classification_schemes:\n"
            "  myclass: http://example.org/c/{object}\n"
            "subject_schemes:\n"
            "  mysubj:\n"
            "    concept: http://example.org/s/{control_number}\n"
            "    scheme: http://example.org/s/\n"
        )
        extra = load_vocabularies_yaml(str(path))
        voc = Vocabularies({**extra})
        assert voc.get("myclass").uri("concept", object="101") == \
            "http://example.org/c/101"
        assert voc.get("mysubj").uri("scheme") == "http://example.org/s/"


class TestTurtleReader:
    def test_include_roundtrip(self, tmp_path):
        from kgx.turtle import parse_turtle

        ttl = (
            "@prefix skos: <http://www.w3.org/2004/02/skos/core#> .\n"
            "<http://x/s> a skos:ConceptScheme ;\n"
            '    skos:prefLabel "Scheme"@en .\n'
        )
        triples = parse_turtle(ttl)
        assert ("http://x/s",
                "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                "http://www.w3.org/2004/02/skos/core#ConceptScheme",
                False, None, None) in triples


@pytest.mark.slow
class TestCli:
    def test_cli_turtle_output(self, tmp_path):
        out = tmp_path / "out.ttl"
        proc = subprocess.run(
            [sys.executable, "-m", "kgx.cli",
             "/root/reference/examples/ddc23no-001.xml", str(out),
             "--webdewey"],
            cwd=REPO, capture_output=True, text=True, timeout=240)
        assert proc.returncode == 0, proc.stderr[-2000:]
        text = out.read_text()
        assert "<http://dewey.info/class/001/e23/>" in text
        assert 'skos:notation "001"' in text

    def test_cli_include_and_ndjson(self, tmp_path):
        inc = tmp_path / "scheme.ttl"
        inc.write_text(
            "@prefix skos: <http://www.w3.org/2004/02/skos/core#> .\n"
            "<http://dewey.info/scheme/edition/e23/> a skos:ConceptScheme .\n")
        out = tmp_path / "out.ndjson"
        proc = subprocess.run(
            [sys.executable, "-m", "kgx.cli",
             "/root/reference/examples/ddc23no-001.xml", str(out),
             "--include", str(inc)],
            cwd=REPO, capture_output=True, text=True, timeout=240)
        assert proc.returncode == 0, proc.stderr[-2000:]
        docs = [json.loads(line) for line in out.read_text().splitlines()]
        uris = {d["uri"] for d in docs}
        assert "http://dewey.info/class/001/e23/" in uris
        assert "http://dewey.info/scheme/edition/e23/" in uris  # from include


class TestJskosSingleDoc:
    def test_write_jskos_reference_example(self, ray_session, tmp_path):
        """Single-document jskos outformat (mc2skos.py:348-354): one
        sorted-keys JSON doc with @context + @graph, concepts in URI
        order, jskos-context.json frame shapes."""
        import json

        from kgx.cli import main

        out = str(tmp_path / "rvk.json")
        rc = main(["/root/reference/examples/rvk.xml", out,
                   "-o", "jskos", "--altlabels"])
        assert rc == 0
        with open(out) as fp:
            doc = json.load(fp)
        assert doc["@context"] == "https://gbv.github.io/jskos/context.json"
        g = doc["@graph"]
        uris = [c["uri"] for c in g]
        assert uris == sorted(uris)
        top = {c["uri"]: c for c in g}
        aa = top["http://rvk.uni-regensburg.de/nt/AA_09900"]
        # @language container for prefLabel; scalar dates; uri-object sets
        assert aa["prefLabel"] == {"de": "Bibliographische Zeitschriften"}
        assert aa["created"] == "2012-07-05"
        assert aa["broader"] == [{"uri": "http://rvk.uni-regensburg.de/nt/AA"}]
        assert aa["type"] == ["http://www.w3.org/2004/02/skos/core#Concept"]
        # altLabel is a {lang: [values]} container
        assert aa["altLabel"]["de"] == ["Bibliografie", "Zeitschrift"]
