"""Tests for the two-pass sort exchange (kgx/exchange.py).

Pins the module's contract: byte/set parity with the Dataset engine
(pipeline.build_graph → materialize), global output order across shards,
resume-from-partials lineage, and the error channel.
"""

import io
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kgx.config import PipelineConfig
from kgx.exchange import write_canonical_graph

CORPUS_PAGES = 900
KEY_COLS = ["subj", "pred", "obj", "obj_is_literal", "obj_lang", "obj_datatype"]


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    from kgx.pages import synthetic_pages

    path = str(tmp_path_factory.mktemp("exchange_corpus"))
    synthetic_pages(CORPUS_PAGES, override_num_blocks=6).write_parquet(path)
    return path


def _read_shards(out_dir):
    with open(os.path.join(out_dir, "_MANIFEST.json")) as fp:
        manifest = json.load(fp)
    tables = [pq.read_table(os.path.join(out_dir, p["file"]))
              for p in manifest["partitions"]]
    return manifest, pa.concat_tables(tables)


def _dataset_graph(corpus, cfg):
    import ray.data

    from kgx.pipeline import build_graph

    pages = ray.data.read_parquet(corpus, columns=["url", "html"])
    return build_graph(pages, cfg)


@pytest.mark.parametrize("expand", [False, True])
def test_exchange_matches_dataset_engine(ray_session, corpus, tmp_path, expand):
    cfg = PipelineConfig(include_altlabels=True, include_components=True,
                         include_webdewey=True, expand=expand)
    out = str(tmp_path / "graph")
    manifest = write_canonical_graph(corpus, out, cfg, num_parts=5, map_tasks=3)
    _, got = _read_shards(out)
    got_df = got.to_pandas()
    want = _dataset_graph(corpus, cfg).to_pandas()
    assert manifest["rows"] == len(got_df) == len(want)
    a = got_df[KEY_COLS].sort_values(KEY_COLS).reset_index(drop=True)
    b = want[KEY_COLS].sort_values(KEY_COLS).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_exchange_output_globally_ordered(ray_session, corpus, tmp_path):
    """Concatenating the shards in part order IS the global serializer
    order: the subject sort key is non-decreasing across the whole run
    and every subject's triples are contiguous."""
    from kgx.materialize import sort_key

    cfg = PipelineConfig(include_altlabels=True)
    out = str(tmp_path / "graph")
    write_canonical_graph(corpus, out, cfg, num_parts=7, map_tasks=2)
    _, got = _read_shards(out)
    subj = got.column("subj").to_pylist()
    skeys = [sort_key(s) for s in subj]
    assert all(a <= b for a, b in zip(skeys, skeys[1:]))
    seen, current = set(), None
    for s in subj:
        if s != current:
            assert s not in seen, "subject block split across shards"
            seen.add(s)
            current = s


def test_exchange_ntriples_byte_parity(ray_session, corpus, tmp_path):
    """Shard concatenation in part order == the driver-streamed
    write_ntriples over the Dataset engine's canonical graph."""
    from kgx.materialize import write_ntriples

    cfg = PipelineConfig(include_altlabels=True)
    out = str(tmp_path / "nt")
    write_canonical_graph(corpus, out, cfg, num_parts=4, map_tasks=2,
                          fmt="ntriples")
    with open(os.path.join(out, "_MANIFEST.json")) as fp:
        manifest = json.load(fp)
    blob = "".join(
        open(os.path.join(out, p["file"]), encoding="utf-8").read()
        for p in manifest["partitions"])
    buf = io.StringIO()
    write_ntriples(_dataset_graph(corpus, cfg), buf, sort=False)
    assert blob == buf.getvalue()


def test_exchange_resume_skips_completed_partitions(ray_session, corpus, tmp_path):
    cfg = PipelineConfig()
    out = str(tmp_path / "graph")
    m1 = write_canonical_graph(corpus, out, cfg, num_parts=4, map_tasks=2,
                               fingerprint="fp1")
    assert m1["resumed_parts"] == 0 and not m1["skipped"]

    # complete manifest + same fingerprint → the whole run is skipped
    m2 = write_canonical_graph(corpus, out, cfg, num_parts=4, map_tasks=2,
                               fingerprint="fp1")
    assert m2["skipped"]

    # simulate a crash: manifest lost, one shard torn away
    os.unlink(os.path.join(out, "_MANIFEST.json"))
    os.unlink(os.path.join(out, m1["partitions"][2]["file"]))
    m3 = write_canonical_graph(corpus, out, cfg, num_parts=4, map_tasks=2,
                               fingerprint="fp1")
    assert m3["resumed_parts"] == 3
    assert m3["rows"] == m1["rows"]
    assert [p["rows"] for p in m3["partitions"]] == \
        [p["rows"] for p in m1["partitions"]]

    # different fingerprint → stale partials ignored, full rerun
    m4 = write_canonical_graph(corpus, out, cfg, num_parts=4, map_tasks=2,
                               fingerprint="fp2")
    assert m4["resumed_parts"] == 0 and m4["rows"] == m1["rows"]


def test_exchange_error_channel(ray_session, corpus, tmp_path):
    import ray.data

    from kgx.pipeline import build_triples, split_errors

    cfg = PipelineConfig()
    out = str(tmp_path / "graph")
    write_canonical_graph(corpus, out, cfg, num_parts=3, map_tasks=2)
    err = pq.read_table(os.path.join(out, "_errors.parquet"))
    pages = ray.data.read_parquet(corpus, columns=["url", "html"])
    _real, errors = split_errors(build_triples(pages, cfg))
    assert err.num_rows == errors.count()
    assert err.num_rows > 0  # the synthetic corpus plants invalid records


def test_exchange_tiny_corpus_empty_partitions(ray_session, tmp_path):
    """More partitions than data: most reduces receive zero rows and
    must still emit well-formed (possibly empty) shards whose
    concatenation is the full graph."""
    from kgx.pages import synthetic_pages

    corpus = str(tmp_path / "tiny")
    synthetic_pages(30, override_num_blocks=2).write_parquet(corpus)
    out = str(tmp_path / "graph")
    manifest = write_canonical_graph(corpus, out, PipelineConfig(),
                                     num_parts=16, map_tasks=4)
    assert len(manifest["partitions"]) == 16
    _, got = _read_shards(out)
    want = _dataset_graph(corpus, PipelineConfig()).to_pandas()
    assert got.num_rows == manifest["rows"] == len(want)


def test_batched_ingest_matches_single_run(ray_session, corpus, tmp_path):
    """The 100 TB ingest shape: the corpus chained through bounded
    write+merge batches (with compaction) equals the single-run graph
    row-for-row in global order."""
    import os

    from kgx.exchange import ingest_corpus_batched

    cfg = PipelineConfig(include_altlabels=True)
    files = sorted(os.path.join(corpus, f) for f in os.listdir(corpus)
                   if f.endswith(".parquet"))
    assert len(files) >= 4
    man = ingest_corpus_batched(corpus, str(tmp_path / "chain"), cfg,
                                files_per_batch=2, num_parts=5,
                                fingerprint="fp1",
                                compact_max_rows=1500)
    live = man["live_dir"]
    tables = [pq.read_table(os.path.join(live, p["file"]))
              for p in man["partitions"] if p["rows"]]
    got = pa.concat_tables(tables).to_pandas()

    out = str(tmp_path / "single")
    write_canonical_graph(corpus, out, cfg, num_parts=5, map_tasks=3)
    _, want = _read_shards(out)
    want = want.to_pandas()
    assert man["rows"] == len(got) == len(want)
    a = got[KEY_COLS].reset_index(drop=True)
    b = want[KEY_COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # global ORDER identical too
    # compaction really bounded the shards
    assert max(p["rows"] for p in man["partitions"]) <= 1500
    # resume: re-running with the same fingerprint is a no-op fast path
    man2 = ingest_corpus_batched(corpus, str(tmp_path / "chain"), cfg,
                                 files_per_batch=2, num_parts=5,
                                 fingerprint="fp1",
                                 compact_max_rows=1500)
    assert man2["rows"] == man["rows"]


def test_batched_ingest_rejects_per_batch_skosify(corpus, tmp_path):
    """Per-batch closure would miss cross-batch broader chains — the
    chain must refuse skosify rather than silently under-close."""
    from kgx.exchange import ingest_corpus_batched

    with pytest.raises(ValueError, match="WHOLE hierarchy"):
        ingest_corpus_batched(corpus, str(tmp_path / "x"),
                              PipelineConfig(skosify=True))


def test_batched_ingest_rejects_empty_corpus(tmp_path):
    """An empty corpus directory must raise a clear ValueError before
    the batch loop, not an opaque TypeError on the final manifest."""
    import os

    from kgx.exchange import ingest_corpus_batched

    empty = tmp_path / "empty_corpus"
    os.makedirs(str(empty))
    with pytest.raises(ValueError, match="no parquet fragments"):
        ingest_corpus_batched(str(empty), str(tmp_path / "out"),
                              PipelineConfig())


def test_exchange_rejects_skosify_repair(corpus, tmp_path):
    """The exchange cannot add/remove rows after the map wave keyed
    them — skosify_repair must be refused loudly."""
    from kgx.exchange import write_canonical_graph

    with pytest.raises(ValueError, match="skosify_repair"):
        write_canonical_graph(corpus, str(tmp_path / "x"),
                              PipelineConfig(skosify=True,
                                             skosify_repair=True))


def test_repair_post_pass_matches_dataset_engine(ray_session, corpus,
                                                 tmp_path):
    """repair_canonical_graph (the exchange route to skosify_repair)
    must produce the same triple SET as the Dataset engine running
    skosify_repair=True in-pipeline — including on a graph with a real
    broader cycle (injected via --include)."""
    import os

    import ray.data

    from kgx.cli import _include_dataset
    from kgx.exchange import (repair_canonical_graph,
                              write_canonical_graph)
    from kgx.pipeline import build_graph

    inc = tmp_path / "cyc.ttl"
    inc.write_text(
        "@prefix skos: <http://www.w3.org/2004/02/skos/core#> .\n"
        "<http://x/a> skos:broader <http://x/b> .\n"
        "<http://x/b> skos:broader <http://x/a> .\n"
        "<http://x/a> skos:inScheme <http://x/sch> .\n"
        "<http://x/b> skos:inScheme <http://x/sch> .\n")
    cfg = PipelineConfig(include_altlabels=True)
    base = str(tmp_path / "base")
    write_canonical_graph(corpus, base, cfg, num_parts=5, map_tasks=3,
                          include=[str(inc)])
    man = repair_canonical_graph(base, str(tmp_path / "rep"))
    shards = [os.path.join(str(tmp_path / "rep"), p["file"])
              for p in man["partitions"] if p["rows"]]
    got = ray.data.read_parquet(shards).to_pandas()

    pages = ray.data.read_parquet(corpus, columns=["url", "html"])
    want = build_graph(
        pages, PipelineConfig(include_altlabels=True,
                              skosify_repair=True),
        include=_include_dataset(str(inc))).to_pandas()
    a = got[KEY_COLS].sort_values(KEY_COLS).reset_index(drop=True)
    b = want[KEY_COLS].sort_values(KEY_COLS).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # the cycle really got repaired: b>=a dropped, a->b kept, and the
    # node that lost its only broader edge became a top concept
    S = "http://www.w3.org/2004/02/skos/core#"
    bro = got[got["pred"] == S + "broader"]
    assert ((bro["subj"] == "http://x/a")
            & (bro["obj"] == "http://x/b")).any()
    assert not ((bro["subj"] == "http://x/b")
                & (bro["obj"] == "http://x/a")).any()
    assert ((got["pred"] == S + "topConceptOf")
            & (got["subj"] == "http://x/b")).any()


def test_batched_ingest_resumes_after_mid_chain_crash(ray_session, corpus,
                                                      tmp_path,
                                                      monkeypatch):
    """Kill the chain between batches; the rerun must resume from
    _CURRENT (not restart) and still equal the single-run graph."""
    import os

    import kgx.exchange as ex

    cfg = PipelineConfig(include_altlabels=True)
    root = str(tmp_path / "chain")
    real_merge = ex.merge_canonical_graphs
    calls = {"n": 0}

    def dying_merge(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash before first merge")
        return real_merge(*a, **kw)

    monkeypatch.setattr(ex, "merge_canonical_graphs", dying_merge)
    with pytest.raises(RuntimeError, match="injected crash"):
        ex.ingest_corpus_batched(corpus, root, cfg, files_per_batch=2,
                                 num_parts=5, fingerprint="fpc")
    # batch 0 committed, the crash hit while merging batch 1
    with open(os.path.join(root, "_CURRENT")) as f:
        assert json.load(f)["batches"] == 1
    monkeypatch.setattr(ex, "merge_canonical_graphs", real_merge)
    man = ex.ingest_corpus_batched(corpus, root, cfg, files_per_batch=2,
                                   num_parts=5, fingerprint="fpc")
    assert calls["n"] == 1  # resumed: batch 0 was not reprocessed

    out = str(tmp_path / "single")
    write_canonical_graph(corpus, out, cfg, num_parts=5, map_tasks=3)
    _, want = _read_shards(out)
    live = man["live_dir"]
    got = pa.concat_tables(
        [pq.read_table(os.path.join(live, p["file"]))
         for p in man["partitions"] if p["rows"]]).to_pandas()
    w = want.to_pandas()
    assert man["rows"] == len(got) == len(w)
    pd.testing.assert_frame_equal(
        got[KEY_COLS].reset_index(drop=True),
        w[KEY_COLS].reset_index(drop=True))


def test_exchange_include_matches_dataset_engine(ray_session, corpus,
                                                 tmp_path):
    """--include preload through the exchange engine: the parsed RDF
    scatters into the same range reduce; with skosify on, include
    broader edges feed the closure — parity with the Dataset engine's
    union-before-skosify-before-canonicalize, row-for-row."""
    inc = tmp_path / "scheme.ttl"
    inc.write_text(
        "@prefix skos: <http://www.w3.org/2004/02/skos/core#> .\n"
        "<http://example.org/inc/A> a skos:Concept ;\n"
        '  skos:prefLabel "Included A"@en ;\n'
        "  skos:broader <http://example.org/inc/B> .\n"
        "<http://example.org/inc/B> skos:broader "
        "<http://example.org/inc/C> .\n")
    cfg = PipelineConfig(include_altlabels=True, skosify=True)
    out = str(tmp_path / "graph")
    manifest = write_canonical_graph(corpus, out, cfg, num_parts=5,
                                     map_tasks=3, include=[str(inc)])
    _, got = _read_shards(out)
    got_df = got.to_pandas()

    import ray.data

    from kgx.cli import _include_dataset
    from kgx.pipeline import build_graph

    pages = ray.data.read_parquet(corpus, columns=["url", "html"])
    want = build_graph(pages, cfg,
                       include=_include_dataset(str(inc))).to_pandas()
    assert manifest["rows"] == len(got_df) == len(want)
    assert manifest["include"] == ["scheme.ttl"]
    a = got_df[KEY_COLS].sort_values(KEY_COLS).reset_index(drop=True)
    b = want[KEY_COLS].sort_values(KEY_COLS).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # the include really landed AND its broader chain closed
    # transitively (A -> B -> C only exists via the include edges)
    assert (got_df["subj"] == "http://example.org/inc/A").any()
    bt = got_df[(got_df["subj"] == "http://example.org/inc/A")
                & got_df["pred"].str.endswith("broaderTransitive")]
    assert set(bt["obj"]) == {"http://example.org/inc/B",
                              "http://example.org/inc/C"}


def test_exchange_skosify_distributed_closure_matches_driver_path(
        ray_session, corpus, tmp_path):
    """skosify_edge_cap=0 forces the fully distributed closure
    (transitive_closure + per-block scatter tasks); output must be
    row-identical to the driver path-doubling path."""
    cfg = PipelineConfig(include_altlabels=True, skosify=True)
    out_a = str(tmp_path / "driver")
    out_b = str(tmp_path / "dist")
    write_canonical_graph(corpus, out_a, cfg, num_parts=5, map_tasks=3)
    write_canonical_graph(corpus, out_b, cfg, num_parts=5, map_tasks=3,
                          skosify_edge_cap=0)
    _, a = _read_shards(out_a)
    _, b = _read_shards(out_b)
    pd.testing.assert_frame_equal(a.to_pandas()[KEY_COLS],
                                  b.to_pandas()[KEY_COLS])


@pytest.mark.parametrize("expand", [False, True])
def test_exchange_skosify_matches_dataset_engine(ray_session, corpus,
                                                 tmp_path, expand):
    """--skosify on the exchange engine: closure triples scatter into the
    same range reduce and the output matches the Dataset engine's
    pre-canonicalize union row-for-row."""
    cfg = PipelineConfig(include_altlabels=True, include_components=True,
                         skosify=True, expand=expand)
    out = str(tmp_path / "graph")
    manifest = write_canonical_graph(corpus, out, cfg, num_parts=5,
                                     map_tasks=3)
    _, got = _read_shards(out)
    got_df = got.to_pandas()

    want = _dataset_graph(corpus, cfg).to_pandas()
    assert manifest["rows"] == len(got_df) == len(want)
    a = got_df[KEY_COLS].sort_values(KEY_COLS).reset_index(drop=True)
    b = want[KEY_COLS].sort_values(KEY_COLS).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # the closure really fired: transitive triples exist in the output
    assert (got_df["pred"].str.endswith("broaderTransitive")).any()
    assert (got_df["pred"].str.endswith("narrowerTransitive")).any()


def test_merge_matches_full_rebuild(ray_session, corpus, tmp_path):
    """Incremental merge == full rebuild, row-for-row in global order,
    and the merged output is itself a valid base (merges chain). The
    corpus split puts planted cross-page duplicates on BOTH sides, so
    cross-run dedup is exercised."""
    from kgx.exchange import merge_canonical_graphs

    cfg = PipelineConfig(include_altlabels=True)
    files = sorted(os.path.join(corpus, f) for f in os.listdir(corpus)
                   if f.endswith(".parquet"))
    assert len(files) >= 3
    base_files, delta_files = files[:-2], files[-2:]

    base = str(tmp_path / "base")
    delta = str(tmp_path / "delta")
    merged = str(tmp_path / "merged")
    full = str(tmp_path / "full")
    write_canonical_graph(base_files, base, cfg, num_parts=5, map_tasks=2)
    write_canonical_graph(delta_files, delta, cfg, num_parts=3, map_tasks=2)
    m = merge_canonical_graphs(base, delta, merged)
    write_canonical_graph(files, full, cfg, num_parts=5, map_tasks=2)

    _, got = _read_shards(merged)
    _, want = _read_shards(full)
    assert m["rows"] == got.num_rows == want.num_rows
    # identical ROW ORDER, not just set equality: both concatenations are
    # the total tkey order and tkey is unique after dedup
    pd.testing.assert_frame_equal(got.to_pandas(), want.to_pandas())

    # chain: merge an empty-ish second delta (reuse delta) into merged —
    # idempotent, since every delta triple is already in the base side
    merged2 = str(tmp_path / "merged2")
    m2 = merge_canonical_graphs(merged, delta, merged2)
    _, got2 = _read_shards(merged2)
    assert m2["rows"] == m["rows"]
    pd.testing.assert_frame_equal(got2.to_pandas(), want.to_pandas())


def test_keep_key_merge_parity(ray_session, corpus, tmp_path):
    """keep_key=True persists tkey in the shards; the merge then reuses
    the stored keys (no polars re-key) and the triple content is still
    identical to a full rebuild. Output stays keep_key so chains stay
    rekey-free."""
    from kgx.exchange import merge_canonical_graphs

    cfg = PipelineConfig(include_altlabels=True)
    files = sorted(os.path.join(corpus, f) for f in os.listdir(corpus)
                   if f.endswith(".parquet"))
    base, delta = str(tmp_path / "kb"), str(tmp_path / "kd")
    write_canonical_graph(files[:-2], base, cfg, num_parts=4, keep_key=True)
    write_canonical_graph(files[-2:], delta, cfg, num_parts=2, keep_key=True)
    merged = str(tmp_path / "km")
    m = merge_canonical_graphs(base, delta, merged)
    assert m["keep_key"]

    full = str(tmp_path / "kf")
    write_canonical_graph(files, full, cfg, num_parts=4)
    _, got = _read_shards(merged)
    _, want = _read_shards(full)
    assert "tkey" in got.column_names and "tkey" not in want.column_names
    pd.testing.assert_frame_equal(
        got.to_pandas()[KEY_COLS], want.to_pandas()[KEY_COLS])

    # stored tkey equals the recomputed one (the reuse is sound);
    # compare as sets — _add_tkey_arrow's internal unique() may reorder
    from kgx.canonicalize import _add_tkey_arrow
    recomputed = _add_tkey_arrow(got.select(KEY_COLS), expand=False)
    assert set(recomputed.column("tkey").to_pylist()) == \
        set(got.column("tkey").to_pylist())


def test_compaction_bounds_partitions_and_stays_mergeable(
        ray_session, corpus, tmp_path):
    """compact_canonical_graph splits oversized partitions in place:
    every partition ends ≤ max_rows, the concatenated graph is unchanged,
    and a subsequent merge into the compacted run still matches a full
    rebuild (the updated boundaries route correctly)."""
    from kgx.exchange import compact_canonical_graph, merge_canonical_graphs

    cfg = PipelineConfig(include_altlabels=True)
    files = sorted(os.path.join(corpus, f) for f in os.listdir(corpus)
                   if f.endswith(".parquet"))
    base = str(tmp_path / "cb")
    write_canonical_graph(files[:-2], base, cfg, num_parts=3, keep_key=True)
    _, before = _read_shards(base)

    max_rows = before.num_rows // 8
    man = compact_canonical_graph(base, max_rows)
    assert man["compacted_parts"] >= 1
    assert all(p["rows"] <= max_rows for p in man["partitions"])
    assert len(man["boundaries_hex"]) == len(man["partitions"]) - 1
    _, after = _read_shards(base)
    pd.testing.assert_frame_equal(before.to_pandas(), after.to_pandas())

    # idempotent: nothing left oversized
    man2 = compact_canonical_graph(base, max_rows)
    assert man2["compacted_parts"] == 0

    # the compacted run is still a valid merge base
    delta = str(tmp_path / "cd")
    write_canonical_graph(files[-2:], delta, cfg, num_parts=2,
                          keep_key=True)
    merged = str(tmp_path / "cm")
    merge_canonical_graphs(base, delta, merged)
    full = str(tmp_path / "cf")
    write_canonical_graph(files, full, cfg, num_parts=3)
    _, got = _read_shards(merged)
    _, want = _read_shards(full)
    pd.testing.assert_frame_equal(
        got.to_pandas()[KEY_COLS], want.to_pandas()[KEY_COLS])

    # non-keep_key runs are rejected upfront
    plain = str(tmp_path / "cp")
    write_canonical_graph(files[:1], plain, cfg, num_parts=2)
    with pytest.raises(ValueError, match="keep_key"):
        compact_canonical_graph(plain, 10)


def test_merge_empty_delta_fast_copies(ray_session, corpus, tmp_path):
    """Partitions untouched by the delta take the LSM fast path: the base
    shard is byte-copied, not rekeyed+rewritten. An empty delta run makes
    every partition untouched — output byte-identical to the base."""
    from kgx.exchange import merge_canonical_graphs

    files = sorted(os.path.join(corpus, f) for f in os.listdir(corpus)
                   if f.endswith(".parquet"))
    base, empty = str(tmp_path / "eb"), str(tmp_path / "ed")
    write_canonical_graph(files[:3], base, PipelineConfig(), num_parts=4)
    write_canonical_graph([], empty, PipelineConfig(), num_parts=2)
    m = merge_canonical_graphs(base, empty, str(tmp_path / "em"))
    assert m["copied_parts"] == 4
    for part in m["partitions"]:
        a = open(os.path.join(base, part["file"]), "rb").read()
        b = open(os.path.join(str(tmp_path / "em"), part["file"]),
                 "rb").read()
        assert a == b


def test_merge_single_partition_base(ray_session, corpus, tmp_path):
    """P == 1 exercises the num_returns=1 route path (a 1-tuple cannot be
    unpacked by Ray — the route task returns the bare table)."""
    from kgx.exchange import merge_canonical_graphs

    files = sorted(os.path.join(corpus, f) for f in os.listdir(corpus)
                   if f.endswith(".parquet"))
    base, delta = str(tmp_path / "b1"), str(tmp_path / "d1")
    write_canonical_graph(files[:2], base, PipelineConfig(), num_parts=1)
    write_canonical_graph(files[2:4], delta, PipelineConfig(), num_parts=2)
    m = merge_canonical_graphs(base, delta, str(tmp_path / "m1"))
    full = str(tmp_path / "f1")
    write_canonical_graph(files[:4], full, PipelineConfig(), num_parts=1)
    _, got = _read_shards(str(tmp_path / "m1"))
    _, want = _read_shards(full)
    assert m["rows"] == got.num_rows == want.num_rows
    pd.testing.assert_frame_equal(got.to_pandas(), want.to_pandas())


def test_merge_guards(ray_session, corpus, tmp_path):
    """In-place merge (sweep would destroy an input), non-parquet inputs,
    and cross-version tkey drift are all rejected upfront."""
    import json as _json

    from kgx.exchange import merge_canonical_graphs

    files = sorted(os.path.join(corpus, f) for f in os.listdir(corpus)
                   if f.endswith(".parquet"))
    base, delta = str(tmp_path / "b2"), str(tmp_path / "d2")
    write_canonical_graph(files[:2], base, PipelineConfig(), num_parts=2)
    write_canonical_graph(files[2:3], delta, PipelineConfig(), num_parts=2)

    with pytest.raises(ValueError, match="out_dir must differ"):
        merge_canonical_graphs(base, delta, base)

    nt = str(tmp_path / "nt2")
    write_canonical_graph(files[2:3], nt, PipelineConfig(), fmt="ntriples",
                          num_parts=2)
    with pytest.raises(ValueError, match="parquet"):
        merge_canonical_graphs(base, nt, str(tmp_path / "x2"))

    man_path = os.path.join(delta, "_MANIFEST.json")
    with open(man_path) as fp:
        man = _json.load(fp)
    man["polars_version"] = "0.0.0"
    with open(man_path, "w") as fp:
        _json.dump(man, fp)
    with pytest.raises(ValueError, match="polars"):
        merge_canonical_graphs(base, delta, str(tmp_path / "y2"))


def test_diff_canonical_graphs(ray_session, corpus, tmp_path):
    """Diff of two disjoint-corpus runs reports both sides exactly (set
    semantics vs the Dataset engine); self-diff is empty."""
    from kgx.exchange import diff_canonical_graphs

    cfg = PipelineConfig(include_altlabels=True)
    files = sorted(os.path.join(corpus, f) for f in os.listdir(corpus)
                   if f.endswith(".parquet"))
    a_dir, b_dir = str(tmp_path / "da"), str(tmp_path / "db")
    write_canonical_graph(files[:-2], a_dir, cfg, num_parts=5, map_tasks=2)
    write_canonical_graph(files[-2:], b_dir, cfg, num_parts=3, map_tasks=2)

    got = diff_canonical_graphs(a_dir, b_dir).to_pandas()
    a_set = set(map(tuple, _dataset_graph(files[:-2], cfg)
                    .to_pandas()[KEY_COLS].itertuples(index=False)))
    b_set = set(map(tuple, _dataset_graph(files[-2:], cfg)
                    .to_pandas()[KEY_COLS].itertuples(index=False)))
    got_a = set(map(tuple, got.loc[got["side"] == "A", KEY_COLS]
                    .itertuples(index=False)))
    got_b = set(map(tuple, got.loc[got["side"] == "B", KEY_COLS]
                    .itertuples(index=False)))
    assert got_a == a_set - b_set
    assert got_b == b_set - a_set
    assert got_b, "split corpora should disagree on at least one triple"

    self_diff = diff_canonical_graphs(a_dir, a_dir).to_pandas()
    assert len(self_diff) == 0


def test_merge_rejects_mismatched_config(ray_session, corpus, tmp_path):
    from kgx.exchange import merge_canonical_graphs

    files = sorted(os.path.join(corpus, f) for f in os.listdir(corpus)
                   if f.endswith(".parquet"))
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_canonical_graph(files[:1], a, PipelineConfig(), num_parts=2)
    write_canonical_graph(files[1:2], b, PipelineConfig(expand=True),
                          num_parts=2)
    with pytest.raises(ValueError, match="semantic options"):
        merge_canonical_graphs(a, b, str(tmp_path / "m"))


def test_cli_exchange_engine(ray_session, corpus, tmp_path):
    """--engine exchange routes a pages-dir run through
    write_canonical_graph; same triple count as the dataset engine."""
    from kgx.cli import main

    out = str(tmp_path / "graph_dir")
    rc = main([corpus, out, "--engine", "exchange", "--altlabels"])
    assert rc == 0
    manifest, got = _read_shards(out)
    want = _dataset_graph(corpus, PipelineConfig(include_altlabels=True))
    assert manifest["rows"] == got.num_rows == want.count()

    import pytest as _pytest
    with _pytest.raises(SystemExit):  # argparse error paths
        main([corpus, "-", "--engine", "exchange"])


def test_reduce_write_is_crash_idempotent(ray_session, corpus, tmp_path):
    """A reduce worker dying mid-write (torn .tmp on disk, process killed)
    is retried by Ray (tasks default to max_retries=3 on worker death) and
    the retry produces a well-formed shard — pins the tmp+rename
    idempotence claim under real worker loss, not just clean reruns."""
    import ray as _ray

    from kgx.canonicalize import _add_tkey_arrow
    from kgx.exchange import _sort_dedup_write

    @_ray.remote(max_retries=3)
    def flaky_reduce(part_idx, out_dir, marker, *slices):
        if not os.path.exists(marker):
            open(marker, "w").close()
            # simulate a crash AFTER a partial tmp write: torn temp file
            # on disk, then the worker process dies without cleanup
            with open(os.path.join(out_dir, ".part-%05d.parquet.tmp"
                                   % part_idx), "wb") as fp:
                fp.write(b"torn")
            os._exit(1)
        return _sort_dedup_write(part_idx, out_dir, "parquet", list(slices))

    keyed = _add_tkey_arrow(pa.table({
        "subj": ["http://x/a", "http://x/b"],
        "pred": ["http://p", "http://p"],
        "obj": ["v1", "v2"],
        "obj_is_literal": [True, True],
        "obj_lang": pa.array([None, None], pa.string()),
        "obj_datatype": pa.array([None, None], pa.string()),
    }))
    out = str(tmp_path / "crash")
    os.makedirs(out)
    marker = str(tmp_path / "died_once")
    rec = _ray.get(flaky_reduce.remote(0, out, marker, keyed))
    assert os.path.exists(marker), "first attempt should have died"
    assert rec["rows"] == 2
    t = pq.read_table(os.path.join(out, rec["file"]))
    assert t.num_rows == 2
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]


def test_reduce_unifies_disjoint_map_dictionaries(ray_session):
    """Two map slices whose dictionary-encoded pred/lang/datatype carry
    DISJOINT dictionaries must unify in the reduce and decode back to
    plain strings — guards the int8-dictionary shuffle encoding."""
    import pyarrow as pa

    from kgx.canonicalize import _add_tkey_arrow
    from kgx.exchange import _dict_encode, _reduce_task

    def keyed(pred, lang):
        return _dict_encode(_add_tkey_arrow(pa.table({
            "subj": ["http://x/%s" % pred],
            "pred": ["http://p/%s" % pred],
            "obj": ["v"],
            "obj_is_literal": [True],
            "obj_lang": [lang],
            "obj_datatype": [None],
        }).cast(pa.schema([
            ("subj", pa.string()), ("pred", pa.string()),
            ("obj", pa.string()), ("obj_is_literal", pa.bool_()),
            ("obj_lang", pa.string()), ("obj_datatype", pa.string()),
        ]))))

    import tempfile

    import ray

    with tempfile.TemporaryDirectory() as out:
        rec = ray.get(_reduce_task.remote(
            0, out, "parquet", False, keyed("a", "en"), keyed("b", "de")))
        assert rec["rows"] == 2
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(out, rec["file"]))
        assert set(t.column("pred").to_pylist()) == {"http://p/a",
                                                     "http://p/b"}
        assert set(t.column("obj_lang").to_pylist()) == {"en", "de"}
        for c in ("pred", "obj_lang", "obj_datatype"):
            assert t.schema.field(c).type == pa.string()
