"""Driver-facing query implementations.

Each function takes ``sf_dir`` and returns a Ray Dataset / pandas
DataFrame whose columns match the DuckDB oracle SQL in
``__ray_entry__.oracle_sql`` exactly (names and types), so the driver's
order-insensitive value-hash comparison holds.

Ray is assumed to be initialised by the caller (driver contract).
"""

from __future__ import annotations

import pandas as pd

from .canonicalize import SKOS
from .config import PipelineConfig
from .pages import DOC_VOCABULARY, pages_from_documents
from .pipeline import build_graph


def _doc_config(**overrides) -> PipelineConfig:
    base = dict(include_altlabels=True, extra_vocabularies=DOC_VOCABULARY)
    base.update(overrides)
    return PipelineConfig(**base)


def doc_graph(sf_dir: str, **overrides):
    pages = pages_from_documents(sf_dir)
    return build_graph(pages, _doc_config(**overrides))


def kg_triples(sf_dir: str):
    """Full extract→link→canonicalize run; the headline correctness query."""
    return doc_graph(sf_dir).select_columns(["subj", "pred", "obj", "obj_lang"])


def kg_pred_counts(sf_dir: str):
    """Triples per predicate (aggregation over the canonical graph)."""
    ds = doc_graph(sf_dir).groupby("pred").count()
    return ds.map_batches(lambda df: df.rename(columns={"count()": "n"}),
                          batch_format="pandas")


def kg_dedup(sf_dir: str):
    """Set semantics under duplicated input: the same pages streamed twice
    must yield the identical graph (parity: rdflib.Graph.add set semantics,
    mc2skos.py:183)."""
    pages = pages_from_documents(sf_dir).union(pages_from_documents(sf_dir))
    graph = build_graph(pages, _doc_config())
    ds = graph.groupby("pred").count()
    return ds.map_batches(lambda df: df.rename(columns={"count()": "n"}),
                          batch_format="pandas")


def kg_expand(sf_dir: str):
    """--expand inference closure: inverse narrower edges entailed by
    broader (parity: skosify.infer.skos_hierarchical, mc2skos.py:192-196)."""
    graph = doc_graph(sf_dir, expand=True)
    import pyarrow.compute as pc

    def narrower_only(batch):
        return batch.filter(pc.equal(batch.column("pred"), SKOS + "narrower"))

    return graph.map_batches(narrower_only, batch_format="pyarrow") \
        .select_columns(["subj", "pred", "obj"])


def kg_skosify(sf_dir: str):
    """--skosify cleanup pass (mc2skos.py:198-201 with examples/skosify.cfg):
    the skos:broaderTransitive / narrowerTransitive closure triples."""
    graph = doc_graph(sf_dir, skosify=True)
    keep = {SKOS + "broaderTransitive", SKOS + "narrowerTransitive"}

    def closure_only(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["pred"].isin(keep)][["subj", "pred", "obj"]]

    return graph.map_batches(closure_only, batch_format="pandas")


def kg_skosify_repair(sf_dir: str):
    """--skosify hierarchy REPAIR (components.skos_repair — the
    skosify.skosify checks beyond the closure, reference delegation at
    mc2skos.py:198-201): the doc corpus broader TREE is made cyclic by
    injecting deterministic back-edges — a 2-cycle (the reverse of the
    tree edge) at every doc_id % 97 == 0, a 3-ring closure
    doc → 4·doc at doc_id % 211 == 3 (when 4·doc exists), and a
    self-loop at doc_id % 401 == 5 — then repaired. Output: every
    surviving skos:broader edge plus the topConceptOf/hasTopConcept
    marks the orphan rule adds (nodes whose only outgoing broader edge
    was cycle-dropped become top concepts — the corpus makes real ones).
    The SQL oracle replays SCC membership as mutual ≥1-step
    reachability (recursive CTE to fixpoint — no depth cap needed: the
    pair set is finite) and the subj >= obj string drop rule."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .components import skos_repair
    from .readers import bounded_read_parquet as _bread
    from .schemas import GRAPH

    n = pq.read_metadata("%s/documents.parquet" % sf_dir).num_rows
    graph = doc_graph(sf_dir)
    docs = _bread("%s/documents.parquet" % sf_dir, columns=["doc_id"])
    broader_p = SKOS + "broader"

    def inject(df: pd.DataFrame) -> pa.Table:
        i = df["doc_id"].astype("int64")

        def uri(s):
            return ("http://example.org/doc/"
                    + s.astype("int64").astype(str))

        two = i[(i > 0) & (i % 97 == 0)]
        ring = i[(i > 0) & (i % 211 == 3) & (4 * i < n)]
        loop = i[i % 401 == 5]
        subj = (list(uri(two // 2)) + list(uri(ring))
                + list(uri(loop)))
        obj = (list(uri(two)) + list(uri(4 * ring)) + list(uri(loop)))
        m = len(subj)
        return pa.Table.from_pydict({
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array([broader_p] * m, pa.string()),
            "obj": pa.array(obj, pa.string()),
            "obj_is_literal": pa.array([False] * m, pa.bool_()),
            "obj_lang": pa.nulls(m, pa.string()),
            "obj_datatype": pa.nulls(m, pa.string()),
        }, schema=GRAPH)

    extra = docs.map_batches(inject, batch_format="pandas")
    repaired = skos_repair(graph.union(extra))
    keep = {broader_p, SKOS + "topConceptOf", SKOS + "hasTopConcept"}

    def filter_repair(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["pred"].isin(keep)][["subj", "pred", "obj"]]

    return repaired.map_batches(filter_repair, batch_format="pandas")


def kg_ingest_batched(sf_dir: str):
    """kg_triples through ``exchange.ingest_corpus_batched`` — the
    documents-derived corpus chained as bounded write+merge batches
    with compaction (the 100 TB ingest shape); the standing graph's
    triples hash-check against the same SQL as kg_triples."""
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray.data

    from .exchange import ingest_corpus_batched
    from .pages import pages_from_documents

    n = pq.read_metadata("%s/documents.parquet" % sf_dir).num_rows
    root = "/tmp/kgx_ingest_batched_%d" % n
    shutil.rmtree(root, ignore_errors=True)
    corpus = os.path.join(root, "pages")
    pages_from_documents(sf_dir, override_num_blocks=6).write_parquet(corpus)
    man = ingest_corpus_batched(corpus, os.path.join(root, "chain"),
                                _doc_config(), files_per_batch=2,
                                compact_max_rows=200_000)
    shards = [os.path.join(man["live_dir"], p["file"])
              for p in man["partitions"] if p["rows"]]
    return (ray.data.read_parquet(shards)
            .select_columns(["subj", "pred", "obj", "obj_lang"]))


def kg_nt_roundtrip(sf_dir: str):
    """kg_triples through the N-Triples SERIALIZATION LOOP: the corpus
    graph is written as sorted .nt shards by the exchange engine, the
    shards are re-ingested (one parse task per shard — kgx/turtle.py's
    reader covers the NT subset it writes), and the recovered triples
    hash-check against the kg_triples SQL. This is the sink↔source
    closure a graph pipeline needs for interchange with rdflib/Jena
    tooling.
    """
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray.data

    from .exchange import write_canonical_graph
    from .pages import pages_from_documents
    from .turtle import parse_turtle

    n = pq.read_metadata("%s/documents.parquet" % sf_dir).num_rows
    root = "/tmp/kgx_nt_roundtrip_%d" % n
    shutil.rmtree(root, ignore_errors=True)
    corpus = os.path.join(root, "pages")
    pages_from_documents(sf_dir).write_parquet(corpus)
    man = write_canonical_graph(corpus, os.path.join(root, "graph"),
                                _doc_config(), fmt="ntriples")
    shards = [os.path.join(root, "graph", p["file"])
              for p in man["partitions"] if p["rows"]]

    def parse_shard(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for path in df["path"]:
            with open(path, encoding="utf-8") as fp:
                rows.extend(parse_turtle(fp.read()))
        return pd.DataFrame(
            rows, columns=["subj", "pred", "obj", "obj_is_literal",
                           "obj_lang", "obj_datatype"])

    paths = ray.data.from_pandas(pd.DataFrame({"path": shards}))
    return (paths.map_batches(parse_shard, batch_format="pandas")
            .select_columns(["subj", "pred", "obj", "obj_lang"]))


def kg_ttl_roundtrip(sf_dir: str):
    """kg_triples through the ORDERED TURTLE loop — the reference's
    primary output format (OrderedTurtleSerializer, mc2skos.py:332-346):
    the corpus graph serializes to prefixed sorted Turtle, re-ingests
    through the same reader --include uses, and hash-checks against the
    kg_triples SQL. Single-file by the reference's contract (ordered
    ttl is the small/medium-graph interchange format; bulk runs use the
    sharded nt/parquet sinks)."""
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray.data

    from .materialize import write_turtle
    from .turtle import parse_turtle

    n = pq.read_metadata("%s/documents.parquet" % sf_dir).num_rows
    root = "/tmp/kgx_ttl_roundtrip_%d" % n
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    path = os.path.join(root, "graph.ttl")
    with open(path, "w", encoding="utf-8") as fp:
        write_turtle(doc_graph(sf_dir), fp)
    with open(path, encoding="utf-8") as fp:
        rows = parse_turtle(fp.read())
    df = pd.DataFrame(
        rows, columns=["subj", "pred", "obj", "obj_is_literal",
                       "obj_lang", "obj_datatype"])
    return ray.data.from_pandas(
        df[["subj", "pred", "obj", "obj_lang"]])


def kg_skosify_exchange(sf_dir: str):
    """kg_skosify routed through the EXCHANGE engine: the documents-derived
    corpus is written to page parquet, write_canonical_graph runs with
    skosify=True (closure triples scatter into the range reduce —
    exchange._skosify_closure_slices), and the closure predicates are
    filtered back out. Same oracle SQL as kg_skosify, so the driver gate
    hash-checks the exchange routing end-to-end."""
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray.data

    from .exchange import write_canonical_graph
    from .pages import pages_from_documents

    n = pq.read_metadata("%s/documents.parquet" % sf_dir).num_rows
    root = "/tmp/kgx_skosify_exchange_%d" % n
    shutil.rmtree(root, ignore_errors=True)
    corpus = os.path.join(root, "pages")
    pages_from_documents(sf_dir).write_parquet(corpus)
    manifest = write_canonical_graph(
        corpus, os.path.join(root, "graph"),
        _doc_config(skosify=True))
    shards = [os.path.join(root, "graph", p["file"])
              for p in manifest["partitions"] if p["rows"]]
    keep = {SKOS + "broaderTransitive", SKOS + "narrowerTransitive"}

    def closure_only(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["pred"].isin(keep)][["subj", "pred", "obj"]]

    return (ray.data.read_parquet(shards)
            .map_batches(closure_only, batch_format="pandas"))


def kg_synthetic(sf_dir: str):
    """Richer classification+authority corpus (153 hierarchy, notes,
    mappings, 765 component lists, WebDewey extras, deliberate duplicate
    records, invalid records) through the full pipeline. ``n`` pages =
    2 × the documents row count, so the DuckDB oracle can derive the
    same corpus size from the registered views."""
    import pyarrow.parquet as pq

    from .pages import synthetic_pages

    n = 2 * pq.read_metadata("%s/documents.parquet" % sf_dir).num_rows
    cfg = PipelineConfig(include_altlabels=True, include_components=True,
                         include_webdewey=True)
    return build_graph(synthetic_pages(n), cfg)


def kg_incremental(sf_dir: str):
    """kg_synthetic's corpus ingested as TWO crawl batches through the
    exchange engine — base run + delta run merged incrementally
    (``exchange.merge_canonical_graphs``, base never reshuffled). The
    merged triple set is identical to the single-run graph, so the same
    _SYNTH_CTE oracle hash-checks the incremental-update path end-to-end
    (row-order parity vs a full rebuild is additionally pinned in
    tests/test_exchange.py)."""
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray.data

    from .exchange import merge_canonical_graphs, write_canonical_graph
    from .pages import synthetic_pages

    n = 2 * pq.read_metadata("%s/documents.parquet" % sf_dir).num_rows
    cfg = PipelineConfig(include_altlabels=True, include_components=True,
                         include_webdewey=True)
    root = "/tmp/kgx_incremental_%d" % n
    shutil.rmtree(root, ignore_errors=True)
    corpus = os.path.join(root, "pages")
    synthetic_pages(n).write_parquet(corpus)
    files = sorted(os.path.join(corpus, f) for f in os.listdir(corpus)
                   if f.endswith(".parquet"))
    half = max(1, len(files) // 2)
    # keep_key: the standing-graph schema — merge reuses the stored sort
    # key instead of re-keying every base shard
    write_canonical_graph(files[:half], os.path.join(root, "base"), cfg,
                          keep_key=True)
    write_canonical_graph(files[half:], os.path.join(root, "delta"), cfg,
                          keep_key=True)
    manifest = merge_canonical_graphs(os.path.join(root, "base"),
                                      os.path.join(root, "delta"),
                                      os.path.join(root, "merged"))
    shards = [os.path.join(root, "merged", p["file"])
              for p in manifest["partitions"] if p["rows"]]
    return (ray.data.read_parquet(shards)
            .select_columns(["subj", "pred", "obj", "obj_is_literal",
                             "obj_lang", "obj_datatype"]))


def kg_graph_diff(sf_dir: str):
    """Set difference of two canonical runs (exchange.diff_canonical_
    graphs): the full synthetic corpus vs its first half. Every half-
    corpus triple also exists in the full run, so the exact expected
    output is ``full EXCEPT half`` with side='A' — expressed directly in
    the SQL oracle by instantiating the corpus-reconstruction CTE at both
    sizes."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from .exchange import diff_canonical_graphs, write_canonical_graph
    from .pages import synthetic_pages

    n = 2 * pq.read_metadata("%s/documents.parquet" % sf_dir).num_rows
    cfg = PipelineConfig(include_altlabels=True, include_components=True,
                         include_webdewey=True)
    root = "/tmp/kgx_graphdiff_%d" % n
    shutil.rmtree(root, ignore_errors=True)
    for name, pages in (("full", n), ("half", n // 2)):
        corpus = os.path.join(root, "pages_" + name)
        synthetic_pages(pages).write_parquet(corpus)
        write_canonical_graph(corpus, os.path.join(root, name), cfg)
    ds = diff_canonical_graphs(os.path.join(root, "full"),
                               os.path.join(root, "half"))
    return ds.select_columns(["side", "subj", "pred", "obj",
                              "obj_is_literal", "obj_lang", "obj_datatype"])


def kg_degree_histogram(sf_dir: str):
    """Distribution of per-subject triple counts (degree histogram) —
    exercises the two-level aggregation path."""
    graph = doc_graph(sf_dir)
    per_subj = graph.groupby("subj").count()
    hist = per_subj.map_batches(
        lambda df: df.rename(columns={"count()": "degree"}),
        batch_format="pandas",
    ).groupby("degree").count()
    return hist.map_batches(
        lambda df: df.rename(columns={"count()": "n_subjects"}),
        batch_format="pandas",
    )


def kg_label_conflicts(sf_dir: str):
    """(pred, label, lang, n_subjects) — SKOS label-conflict audit (the
    skosify library's check_labels family, beyond the reference's own
    cfg): every (predicate, literal, language) claimed as a prefLabel or
    altLabel by MORE than one concept. Real KG hygiene — cross-concept
    label collisions are what sameAs/closeMatch candidate generation and
    editorial dedup queues key on.

    Scale shape: labels are one-to-two rows per concept, so the
    per-batch distinct combiner bounds shuffle rows at the label
    vocabulary; one hash(label) co-group counts distinct subjects
    exactly (a subject's labels may straddle batches); conflicts
    (count > 1) survive. No driver materialization.
    """
    import ray

    SKOS_ = "http://www.w3.org/2004/02/skos/core#"
    keep = {SKOS_ + "prefLabel", SKOS_ + "altLabel"}
    nparts = max(4, int(ray.cluster_resources().get("CPU", 8)))
    graph = doc_graph(sf_dir)

    def label_rows(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["pred"].isin(keep)]
        out = pd.DataFrame({
            "pred": d["pred"].astype(str),
            "label": d["obj"].astype(str),
            # '' for untagged literals: astype(str) would coin "None"
            # and pandas groupby would DROP real-None keys — both wrong
            "lang": d["obj_lang"].fillna("").astype(str),
            "subj": d["subj"].astype(str),
        }).drop_duplicates()
        key = out["pred"] + "\x1f" + out["label"] + "\x1f" + out["lang"]
        out["bucket"] = (pd.util.hash_pandas_object(key, index=False)
                         % nparts).astype("int32")
        return out

    def count_conflicts(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.drop_duplicates(["pred", "label", "lang", "subj"])
             .groupby(["pred", "label", "lang"], as_index=False)["subj"]
             .nunique().rename(columns={"subj": "n_subjects"}))
        g = g[g["n_subjects"] > 1]
        return pd.DataFrame({
            "pred": g["pred"], "label": g["label"], "lang": g["lang"],
            "n_subjects": g["n_subjects"].astype("int64")})

    return (graph.map_batches(label_rows, batch_format="pandas")
            .groupby("bucket").map_groups(count_conflicts,
                                          batch_format="pandas"))


# ---------------------------------------------------------------------------
# Oracle SQL — the shared triple-construction CTE over `documents`
# ---------------------------------------------------------------------------

# Reconstructs, in ANSI SQL, the exact triples the pipeline extracts from
# the deterministic MARCXML embed in kgx.pages.pages_from_documents.
TRIPLES_CTE = """
WITH docs AS (
  SELECT doc_id, text, lang, source, n_chars,
         'http://example.org/doc/' || doc_id AS uri,
         strftime(DATE '2020-01-01' + CAST(doc_id % 365 AS INTEGER), '%Y-%m-%d') AS created
  FROM documents
),
triples AS (
  SELECT uri AS subj, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
         'http://www.w3.org/2004/02/skos/core#Concept' AS obj, NULL AS obj_lang FROM docs
  UNION ALL
  SELECT uri, 'http://www.w3.org/2004/02/skos/core#inScheme',
         'http://example.org/docs/', NULL FROM docs
  UNION ALL
  SELECT uri, 'http://purl.org/dc/terms/created', created, NULL FROM docs
  UNION ALL
  SELECT uri, 'http://purl.org/dc/terms/identifier', 'DOC' || doc_id, NULL FROM docs
  UNION ALL
  SELECT uri, 'http://www.w3.org/2004/02/skos/core#prefLabel', text, lang FROM docs
  UNION ALL
  SELECT uri, 'http://www.w3.org/2004/02/skos/core#altLabel',
         source || '--' || lang, lang FROM docs
  UNION ALL
  SELECT uri, 'http://www.w3.org/2004/02/skos/core#editorialNote',
         'chars ' || n_chars, lang FROM docs
  UNION ALL
  SELECT uri, 'http://www.w3.org/2004/02/skos/core#broader',
         'http://example.org/doc/' || (doc_id // 2), NULL FROM docs WHERE doc_id > 0
  UNION ALL
  SELECT uri, 'http://www.w3.org/2002/07/owl#deprecated', 'true', NULL
  FROM docs WHERE doc_id % 10 = 0
)
"""

def _minhash_pairs_sql(threshold: float, shingle_k: int,
                       num_perm: int = 64) -> str:
    """Exact SQL mirror of dedup.minhash_lsh_pairs up to the ``pairs``
    CTE: md5-u64 shingle hashes (token_hash64 semantics), the same
    (a·h + b) mod 2^64 mod M61 universal hashing with the seeded
    permutation constants EMBEDDED AS LITERALS, banding by the
    threshold-derived regime, candidate self-join on equal band
    signatures, estimated Jaccard = matching-row fraction. The one
    intentional divergence: the engine coarsens band keys through a
    64-bit pandas hash (collisions ~2^-64 can only ADD candidates, which
    the est-threshold filter then kills), and caps pathological buckets
    at 200 (never reached on the oracle corpus — asserted in tests)."""
    from .dedup import _MERSENNE, _perm_params, lsh_bands_for_threshold

    a, b = _perm_params(num_perm)
    bands = lsh_bands_for_threshold(threshold, num_perm)
    r = num_perm // bands
    values = ",\n    ".join(
        "(%d, %d::UBIGINT, %d::UBIGINT)" % (p, int(a[p]), int(b[p]))
        for p in range(num_perm))
    if shingle_k == 1:
        grams_cte = ("SELECT doc_id, unnest(string_split(text, ' ')) AS g"
                     " FROM documents")
    else:
        grams_cte = f"""
  SELECT doc_id,
         CASE WHEN len(t) < {shingle_k} THEN array_to_string(t, ' ')
              ELSE array_to_string(t[i:i+{shingle_k - 1}], ' ') END AS g
  FROM (SELECT doc_id, t,
          unnest(generate_series(1, greatest(len(t) - {shingle_k - 1}, 1))) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))"""
    return f"""
WITH RECURSIVE params(p, a, b) AS (VALUES
    {values}),
grams AS ({grams_cte}),
gh AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 16))::UBIGINT AS h FROM grams),
sigs AS (
  SELECT doc_id, p,
    min((((a::HUGEINT * h) % 18446744073709551616 + b)
         % 18446744073709551616)::UBIGINT % {int(_MERSENNE)}::UBIGINT) AS s
  FROM gh CROSS JOIN params GROUP BY doc_id, p
),
bands AS (
  SELECT doc_id, p // {r} AS band,
         string_agg(s::VARCHAR, ',' ORDER BY p) AS bkey
  FROM sigs GROUP BY doc_id, p // {r}
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
),
pairs AS (
  SELECT c.a AS doc_id_a, c.b AS doc_id_b,
         (count(*) FILTER (WHERE sa.s = sb.s)) / {num_perm}.0 AS jaccard_est
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.a
  JOIN sigs sb ON sb.doc_id = c.b AND sb.p = sa.p
  GROUP BY c.a, c.b
)
"""



def _embedding_lsh_sql(threshold: float = 0.4, num_planes: int = 4,
                       num_bands: int = 24, seed: int = 7,
                       dim: int = 64) -> str:
    """Exact SQL mirror of dedup.embedding_near_dup_lsh: the seeded
    hyperplane matrix is EMBEDDED AS LITERALS (dim × planes·bands
    doubles, repr round-trip = bit-exact), sign bits come from the same
    dot products (normalization cannot change a sign), band keys group
    candidates, and the exact-cosine verify reuses the same
    list_cosine_similarity expression the exact-path oracle already
    hash-matches with. The engine's partition coarsening groups by the
    true (band, key) value, so the candidate sets are identical."""
    import numpy as np

    planes = np.random.RandomState(seed).randn(dim, num_planes * num_bands)
    values = ",".join(
        "(%d,%d,%r)" % (j, i, planes[i, j])
        for j in range(num_planes * num_bands) for i in range(dim))
    return f"""
WITH planes(j, i, w) AS (VALUES {values}),
e AS (
  SELECT vec_id, unnest(embedding) AS x,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
),
bits AS (
  SELECT e.vec_id, p.j, sum(CAST(e.x AS DOUBLE) * p.w) > 0 AS bit
  FROM e JOIN planes p ON p.i = e.i - 1
  GROUP BY e.vec_id, p.j
),
keys AS (
  SELECT vec_id, j // {num_planes} AS band,
         sum(CASE WHEN bit THEN (1 << (j % {num_planes})) ELSE 0 END) AS bkey
  FROM bits GROUP BY vec_id, j // {num_planes}
),
cand AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM keys x JOIN keys y
    ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id
)
SELECT c.a AS vec_id_a, c.b AS vec_id_b
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.a
JOIN embeddings eb ON eb.vec_id = c.b
WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= {threshold}
"""


def _ivf_sql(sf_dir: str = "/root/testdata/sf0.01", stride: int = 50,
             k: int = 5, nlist: int = 64, nprobe: int = 16) -> str:
    """Exact SQL mirror of simsearch.knn_ivf GIVEN the trained coarse
    quantizer: ``train_centroids`` is pure numpy over the parquet file
    (no Ray), so the oracle embeds the resulting centroid matrix as
    literals and replays assignment (argmax of v·c — scaling-invariant,
    so no normalization needed), nprobe probe selection, bucket-candidate
    scoring and the (sim DESC, neighbor ASC) top-k rule. The quantizer is
    a model artifact of the sf0.01 table — the scale the driver's
    correctness gate runs at — so this oracle is sf0.01-specific; at
    other scales the Ray path trains a different quantizer and the
    recall-vs-bruteforce pin (tests/test_ops.py) is the check."""
    from .simsearch import train_centroids

    C = train_centroids(sf_dir, nlist)
    values = ",".join(
        "(%d,%d,%r)" % (c, i, C[c, i])
        for c in range(C.shape[0]) for i in range(C.shape[1]))
    return f"""
WITH cents(c, i, w) AS (VALUES {values}),
e AS (
  SELECT vec_id, unnest(embedding) AS x,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
),
sims AS (
  SELECT e.vec_id, cents.c, sum(CAST(e.x AS DOUBLE) * cents.w) AS s
  FROM e JOIN cents ON cents.i = e.i - 1
  GROUP BY e.vec_id, cents.c
),
assign AS (
  SELECT vec_id, c FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c) AS rk
    FROM sims) WHERE rk = 1
),
probes AS (
  SELECT vec_id, c FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c) AS rk
    FROM sims WHERE vec_id % {stride} = 0) WHERE rk <= {nprobe}
),
cand AS (
  SELECT p.vec_id AS qid, a.vec_id AS nid
  FROM probes p JOIN assign a ON a.c = p.c AND a.vec_id <> p.vec_id
),
scored AS (
  SELECT qid, nid,
         list_cosine_similarity(eq.embedding, en.embedding) AS sim
  FROM cand
  JOIN embeddings eq ON eq.vec_id = qid
  JOIN embeddings en ON en.vec_id = nid
)
SELECT qid AS query_id, nid AS neighbor_id, CAST(rk AS BIGINT) AS rank
FROM (SELECT qid, nid,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
      FROM scored)
WHERE rk <= {k}
"""


DOC_ORACLES = {
    "token_counts": (
        "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents"
    ),
    "quality": (
        "SELECT doc_id, length(text) AS n_chars,"
        " len(string_split(text, ' ')) AS n_tokens,"
        " len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens"
        " FROM documents"
    ),
    "lang_counts": "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
    # punctuation / stopword load (integer counts; list_filter keeps
    # duplicates, matching the per-token Python count)
    "quality_ratios": r"""
SELECT doc_id,
       length(text) - length(regexp_replace(text,
           '[^A-Za-z0-9 \t\n\r\f\v]', '', 'g')) AS n_punct,
       len(list_filter(string_split(lower(text), ' '),
           t -> list_contains(['the','and','of','to','in','is','that','for',
                               'with','as'], t))) AS n_stopwords,
       len(string_split(text, ' ')) AS n_tokens
FROM documents
""",
    # identical RE2 pattern to textops._BPE_PATTERN (explicit ASCII
    # whitespace class — RE2 \s is ASCII-only, Python's is Unicode)
    "token_counts_bpe": (
        "SELECT doc_id, len(regexp_extract_all(text,"
        " '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\v]+')) AS n_bpe_tokens"
        " FROM documents"
    ),
    # textops.bigram_lm_score: interpolated bigram LM replayed with the
    # identical float64 tree (exact int→double divisions, dyadic λ=3/4,
    # shared libm ln), each term floor-quantized BEFORE the integer sum
    "bigram_lm_score": r"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS T FROM uni),
big AS (SELECT doc_id, t[i] AS v, t[i + 1] AS w
        FROM (SELECT doc_id, t,
                     unnest(generate_series(1, len(t) - 1)) AS i
              FROM toks)),
cvw AS (SELECT v, w, CAST(count(*) AS BIGINT) AS c FROM big GROUP BY v, w),
cv AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM big GROUP BY v),
term AS (
  SELECT b.doc_id,
         CAST(floor(1048576.0 * ln(
           0.75 * (CAST(cvw.c AS DOUBLE) / cv.c)
           + 0.25 * (CAST(u.c AS DOUBLE) / t.T))) AS BIGINT) AS q
  FROM big b
  JOIN cvw ON cvw.v = b.v AND cvw.w = b.w
  JOIN cv ON cv.v = b.v
  JOIN uni u ON u.tok = b.w
  CROSS JOIN tot t),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(q) AS BIGINT) AS lm2_q20
        FROM term GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
       coalesce(a.lm2_q20, 0) AS lm2_q20
FROM documents d LEFT JOIN agg a USING (doc_id)
""",
    # textops.kn_bigram_score: interpolated Kneser-Ney with D = 3/4 —
    # same float64 expression tree as the engine (greatest/max binds
    # never: scoring the training corpus means c_vw >= 1), ln shared
    # libm, per-term floor-quantize before the order-independent sum
    "kn_bigram_score": r"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
big AS (SELECT doc_id, t[i] AS v, t[i + 1] AS w
        FROM (SELECT doc_id, t,
                     unnest(generate_series(1, len(t) - 1)) AS i
              FROM toks)),
cvw AS (SELECT v, w, CAST(count(*) AS BIGINT) AS c FROM big GROUP BY v, w),
cv AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM big GROUP BY v),
n1pv AS (SELECT v, CAST(count(DISTINCT w) AS BIGINT) AS c
         FROM big GROUP BY v),
contw AS (SELECT w, CAST(count(DISTINCT v) AS BIGINT) AS c
          FROM big GROUP BY w),
n1pt AS (SELECT CAST(count(*) AS DOUBLE) AS T
         FROM (SELECT DISTINCT v, w FROM big)),
term AS (
  SELECT b.doc_id,
         CAST(floor(1048576.0 * ln(
           greatest(CAST(cvw.c AS DOUBLE) - 0.75, 0.0)
             / CAST(cv.c AS DOUBLE)
           + ((0.75 * CAST(n1pv.c AS DOUBLE)) / CAST(cv.c AS DOUBLE))
             * (CAST(contw.c AS DOUBLE) / t.T))) AS BIGINT) AS q
  FROM big b
  JOIN cvw ON cvw.v = b.v AND cvw.w = b.w
  JOIN cv ON cv.v = b.v
  JOIN n1pv ON n1pv.v = b.v
  JOIN contw ON contw.w = b.w
  CROSS JOIN n1pt t),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(q) AS BIGINT) AS kn_q20
        FROM term GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
       coalesce(a.kn_q20, 0) AS kn_q20
FROM documents d LEFT JOIN agg a USING (doc_id)
""",
    # textops.gopher_filter: every rule an integer inequality over exact
    # counts (mean-word-length as 3n ≤ len_sum ≤ 10n), same stopword
    # list and [A-Za-z] class as the engine
    "gopher_filter": r"""
WITH c AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS len_sum,
         CAST(len(list_filter(string_split(text, ' '),
             w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT)
           AS n_alpha_words,
         CAST(len(list_filter(string_split(lower(text), ' '),
             t -> list_contains(['the','and','of','to','in','is','that',
                                 'for','with','as'], t))) AS BIGINT)
           AS n_stopwords
  FROM documents
)
SELECT doc_id, n_words, len_sum, n_alpha_words, n_stopwords,
       (n_words >= 50 AND n_words <= 100000
        AND 3 * n_words <= len_sum AND len_sum <= 10 * n_words
        AND 5 * n_alpha_words >= 4 * n_words
        AND n_stopwords >= 2) AS keep
FROM c
""",
    "top_terms": (
        "SELECT tok, count(*) AS n FROM ("
        "SELECT unnest(string_split(text, ' ')) AS tok FROM documents"
        ") GROUP BY tok ORDER BY n DESC, tok LIMIT 100"
    ),
    # exact-substring duplication signal (textops.dup_ngram_stats, l=8):
    # positions whose 8-token window text occurs >=2 times corpus-wide
    "dup_ngram_stats": """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
w AS (
  SELECT doc_id, array_to_string(t[i:i+7], ' ') AS w
  FROM (SELECT doc_id, t,
               unnest(generate_series(1, len(t) - 7)) AS i FROM toks)),
cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS occ FROM w GROUP BY w),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
         CAST(sum(CASE WHEN c.occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup
  FROM w JOIN cnt c USING (w) GROUP BY doc_id)
SELECT d.doc_id, coalesce(p.n_windows, 0) AS n_windows,
       coalesce(p.n_dup, 0) AS n_dup_positions
FROM documents d LEFT JOIN per p USING (doc_id)
""",
    # Gopher-style bigram repetition signals (textops.repetition_stats);
    # zipped unnests give token ordinals, lead() forms the bigrams
    "repetition_stats": """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS t,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS i
  FROM documents),
grams AS (
  SELECT doc_id,
         t || ' ' || lead(t) OVER (PARTITION BY doc_id ORDER BY i) AS g
  FROM toks),
per AS (
  SELECT doc_id, g, count(*) AS c FROM grams
  WHERE g IS NOT NULL GROUP BY doc_id, g),
st AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams,
         CAST(count(*) AS BIGINT) AS n_uniq_2grams,
         CAST(max(c) AS BIGINT) AS top_2gram_n
  FROM per GROUP BY doc_id)
SELECT d.doc_id, coalesce(st.n_2grams, 0) AS n_2grams,
       coalesce(st.n_uniq_2grams, 0) AS n_uniq_2grams,
       coalesce(st.top_2gram_n, 0) AS top_2gram_n
FROM documents d LEFT JOIN st USING (doc_id)
""",
    # email scan+redact over the deterministically PII-injected corpus
    # (textops.inject_pii mirrors the CASE expressions exactly; the
    # pattern is ASCII-only so Python re and RE2 agree)
    "pii_scrub": """
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' contact user' || doc_id || '@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' mail admin@test.org' ELSE '' END AS text
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.]+'))
            AS BIGINT) AS n_emails,
       regexp_replace(text, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g')
         AS scrubbed
FROM aug
""",
    # integer-quantized tf·idf top-3 keywords per doc
    # (textops.tfidf_keywords); ties broken by token text on both sides
    "tfidf_keywords": """
WITH tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       FROM tk GROUP BY doc_id, tok),
dfq AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM tk GROUP BY tok),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
sc AS (SELECT tf.doc_id, tf.tok,
              tf.tf * ((nn.n * 1048576) // dfq.df) AS score_q
       FROM tf JOIN dfq USING (tok) CROSS JOIN nn)
SELECT doc_id, tok, CAST(score_q AS BIGINT) AS score_q,
       CAST(rk AS BIGINT) AS rk
FROM (SELECT doc_id, tok, score_q,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_q DESC, tok) AS rk
      FROM sc)
WHERE rk <= 3
""",
    # dyadic-quantized unigram LM score (textops.unigram_lm_score):
    # integer floor division makes the float-free score bit-exact
    "unigram_lm_score": """
WITH tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
cnt AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY t),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS s FROM cnt),
w AS (SELECT t, CAST((c * 1048576) // s AS BIGINT) AS q FROM cnt, tot)
SELECT doc_id, CAST(sum(q) AS BIGINT) AS lm_q20,
       CAST(count(*) AS BIGINT) AS n_tokens
FROM tk JOIN w USING (t) GROUP BY doc_id
""",
    # exact relational mirror of textops.classify_lang (stopword-hit argmax
    # with en>de>fr>es priority + CJK codepoint-ratio gate)
    "lang_id": r"""
WITH t AS (
  SELECT doc_id, text,
    list_distinct(string_split(lower(text), ' ')) AS toks,
    substr(text, 1, 200) AS head
  FROM documents
), h AS (
  SELECT doc_id, text, head,
    len(list_intersect(toks, ['the','and','of','to','in','is','that','for','with','as'])) AS h_en,
    len(list_intersect(toks, ['der','die','und','das','ist','von','mit','für','ein','nicht'])) AS h_de,
    len(list_intersect(toks, ['le','la','et','les','des','est','pour','dans','une','que'])) AS h_fr,
    len(list_intersect(toks, ['el','la','de','los','que','en','es','para','con','una'])) AS h_es,
    length(regexp_replace(head, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk
  FROM t
)
SELECT doc_id,
  CASE
    WHEN text IS NULL OR text = '' THEN 'und'
    WHEN cjk > length(head) * 0.2 THEN 'zh'
    WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
    WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
    WHEN h_fr >= h_es THEN 'fr'
    ELSE 'es'
  END AS lang_pred
FROM h
""",
    # exact relational mirror of textops._rolling_fingerprint (md5 token
    # hash folded through a 63-bit polynomial rolling hash)
    "fingerprint": r"""
SELECT doc_id, CAST(list_reduce(
  list_prepend(14695981039346656037::UBIGINT,
    list_transform(string_split(text, ' '),
      t -> ('0x' || substr(md5(t), 1, 16))::UBIGINT)),
  (h, t) -> xor(((h::HUGEINT * 1099511628211) % 18446744073709551616)::UBIGINT, t)
            % 9223372036854775808::UBIGINT
) AS BIGINT) AS fp
FROM documents
""",
    # exact relational mirror of dedup.simhash (per-bit majority vote over
    # md5 token hashes)
    "simhash": r"""
WITH toks AS (
  SELECT doc_id,
         ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 16))::UBIGINT AS th
  FROM documents
), bitvotes AS (
  SELECT doc_id, b AS bit,
         count(*) FILTER (WHERE (th >> b) & 1 = 1) AS ones,
         count(*) AS total
  FROM toks, (SELECT unnest(generate_series(0, 63)) AS b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       lower(lpad(to_hex(CAST(sum(CASE WHEN 2 * ones > total
                                       THEN (1::UBIGINT << bit)
                                       ELSE 0::UBIGINT END) AS UBIGINT)),
                  16, '0')) AS simhash
FROM bitvotes GROUP BY doc_id
""",
    "dedup_exact": "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
    "dedup_first3": (
        "SELECT min(doc_id) AS doc_id FROM documents "
        "GROUP BY array_to_string(string_split(text, ' ')[1:3], ' ')"
    ),
    "jaccard_pairs": (
        "WITH d AS (SELECT doc_id, list_distinct(string_split(text,' ')) AS toks,"
        " string_split(text,' ')[1] AS blk FROM documents) "
        "SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b "
        "FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id "
        "WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)"
        " / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))"
        " >= 0.8"
    ),
    # connected components in SQL: a doc is removed iff it can reach a
    # smaller doc_id through the (undirected) near-dup pair graph
    "near_dup_dedup": r"""
WITH RECURSIVE d AS (
  SELECT doc_id, list_distinct(string_split(text,' ')) AS toks,
         string_split(text,' ')[1] AS blk FROM documents
), p AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= 0.8
), e AS (
  SELECT a, b FROM p UNION SELECT b, a FROM p
), reach AS (
  SELECT a AS node, b AS r FROM e
  UNION
  SELECT reach.node, e.b FROM reach JOIN e ON reach.r = e.a
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (
  SELECT node FROM reach GROUP BY node HAVING min(r) < node)
""",
    "embedding_near_dup": (
        "SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b "
        "FROM embeddings a, embeddings b "
        "WHERE a.vec_id < b.vec_id "
        "AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4"
    ),
    "knn_bruteforce": (
        "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings"
        " WHERE vec_id % 50 = 0), "
        "s AS (SELECT qid, vec_id AS nid,"
        " list_cosine_similarity(qe, embedding) AS sim"
        " FROM q, embeddings WHERE vec_id != qid), "
        "r AS (SELECT qid, nid,"
        " row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk"
        " FROM s) "
        "SELECT qid AS query_id, nid AS neighbor_id, rk AS rank FROM r"
        " WHERE rk <= 5"
    ),
    # all-pairs k-NN graph: every vector is a query
    "knn_graph": (
        "WITH s AS (SELECT a.vec_id AS vid, b.vec_id AS nid,"
        " list_cosine_similarity(a.embedding, b.embedding) AS sim"
        " FROM embeddings a, embeddings b WHERE a.vec_id != b.vec_id), "
        "r AS (SELECT vid, nid,"
        " row_number() OVER (PARTITION BY vid ORDER BY sim DESC, nid) AS rk"
        " FROM s) "
        "SELECT vid AS vec_id, nid AS neighbor_id, rk AS rank FROM r"
        " WHERE rk <= 5"
    ),
    "sessionize": (
        "SELECT user_id, count(*) AS n_events,"
        " CAST(1 + sum(CASE WHEN gap > 1800 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_sessions FROM ("
        "SELECT user_id, epoch(ts - lag(ts) OVER"
        " (PARTITION BY user_id ORDER BY ts)) AS gap FROM events"
        ") GROUP BY user_id"
    ),
    "event_type_hourly": (
        "SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n"
        " FROM events GROUP BY 1, 2"
    ),
    # semi-structured props ingestion (mirrors events.props_stats)
    "props_stats": (
        "SELECT event_type, count(*) AS n,"
        " CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)"
        " AS sum_k,"
        " max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k"
        " FROM events WHERE json_extract(props, '$.k') IS NOT NULL"
        " GROUP BY event_type"
    ),
    # cohort retention (mirrors events.cohort_retention: epoch-day
    # integer division, per-user min day = cohort)
    "cohort_retention": """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), c AS (
  SELECT user_id, day,
         min(day) OVER (PARTITION BY user_id) AS cohort
  FROM ud
)
SELECT CAST(cohort AS BIGINT) AS cohort_day,
       CAST(day - cohort AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM c GROUP BY 1, 2
""",
    # conversion funnel, first-occurrence cascade with strict-> ordering
    # (mirrors events.funnel_stages)
    "funnel_stages": """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
     c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
           JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
           WHERE e.event_type = 'click' GROUP BY e.user_id),
     p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
           JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
           WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT u.user_id,
       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                 WHEN c.user_id IS NOT NULL THEN 2
                 WHEN v.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS funnel_stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN v ON v.user_id = u.user_id
LEFT JOIN c ON c.user_id = u.user_id
LEFT JOIN p ON p.user_id = u.user_id
""",
    # as-of join: latest strictly-earlier view per purchase, same user
    "events_asof": """
WITH p AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
     -- tie rule mirrored from events.asof_bucket: one view per
     -- (user, ts), the max event_id among ties
     v AS (SELECT max(event_id) AS event_id, user_id, ts FROM events
           WHERE event_type = 'view' GROUP BY user_id, ts)
SELECT p.event_id,
       max_by(v.event_id, v.ts) AS asof_event_id,
       date_diff('microsecond', max(v.ts), p.ts) AS gap_us
FROM p JOIN v ON p.user_id = v.user_id AND v.ts < p.ts
GROUP BY p.event_id, p.ts
""",
    # 1h windows sliding every 15min; window_start = epoch seconds
    "sliding_window_counts": """
SELECT event_type, window_start, count(*) AS n FROM (
  SELECT event_type,
         (CAST(floor(epoch(ts) / 900) AS BIGINT) * 900) - 900 * off
           AS window_start
  FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS off)
) GROUP BY 1, 2
""",
    "lineitem_summary": (
        "SELECT l_returnflag, l_linestatus, count(*) AS n_rows,"
        " CAST(sum(l_quantity) AS BIGINT) AS sum_qty,"
        " strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship,"
        " strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship"
        " FROM lineitem GROUP BY 1, 2"
    ),
    "orders_by_customer_nation": (
        "SELECT n_name, count(*) AS n_orders FROM orders"
        " JOIN customer ON o_custkey = c_custkey"
        " JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
    ),
    # relational.shipping_priority (TPC-H Q3 shape): revenue quantized
    # PER LINE ITEM (floor(100·price·(1−disc)), exactly-rounded float64
    # ops of bit-matched operands) before the order-independent BIGINT
    # sum; total order (revenue DESC, date, orderkey) mirrored
    "shipping_priority": """
WITH agg AS (
  SELECT l.l_orderkey,
         CAST(sum(CAST(floor(100.0 * (l.l_extendedprice
                * (1.0 - l.l_discount))) AS BIGINT)) AS BIGINT)
           AS revenue_q2,
         strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
         o.o_orderpriority
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
    AND l.l_shipdate > TIMESTAMP '1998-01-01'
  GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
)
SELECT l_orderkey, revenue_q2, o_orderdate, o_orderpriority
FROM (SELECT *, row_number() OVER (ORDER BY revenue_q2 DESC,
                                   o_orderdate ASC, l_orderkey ASC) AS rk
      FROM agg)
WHERE rk <= 10
""",
    "payload_stats": (
        "SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents"
    ),
    # multimodal.bmp_pixel_stats (width=32): the real BMP decode round
    # trip — geometry h = max(1, ceil(n/96)) pins header/stride/flip
    # handling, px_sum = Σ byte values pins the pixel payload (padding
    # zeros and the BGR→RGB reorder are sum-invariant; corpus is ASCII
    # so octet == codepoint)
    "bmp_pixel_stats": """
WITH chars AS (
  SELECT doc_id, ascii(substr(text, i, 1)) AS v
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text))) AS i
        FROM documents)
),
s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS px_sum
      FROM chars GROUP BY doc_id)
SELECT doc_id, GREATEST(1, CAST(ceil(n / 96.0) AS BIGINT)) AS h,
       CAST(32 AS BIGINT) AS w, px_sum
FROM s
""",
    # exact mirror of multimodal.frame_sample geometry (16-byte frames,
    # every 4th sampled)
    "frame_sample": """
SELECT doc_id, frame_idx,
       least(16, len - frame_idx * 16) AS n_bytes
FROM (
  SELECT doc_id, len,
         unnest(generate_series(0, n_frames - 1, 4)) AS frame_idx
  FROM (
    SELECT doc_id, octet_length(encode(text)) AS len,
           CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT) AS n_frames
    FROM documents
  )
)
""",
    "sameas_components": (
        "SELECT doc_id, min(doc_id) OVER (PARTITION BY source) AS component"
        " FROM documents"
    ),
    # hyperplane-LSH embedding near-dup (plane matrix embedded as
    # literals; exact-cosine verify)
    "embedding_near_dup_lsh": _embedding_lsh_sql(),
    # full MinHash+LSH mirror (perm constants embedded as literals):
    # driver defaults threshold=0.5, shingle_k=3
    "minhash_lsh_pairs": _minhash_pairs_sql(0.5, 3) + (
        "SELECT doc_id_a, doc_id_b, jaccard_est FROM pairs"
        " WHERE jaccard_est >= 0.5"
    ),
    # LSH-based near-dup REMOVAL: estimated-Jaccard pair graph
    # (threshold=0.8, token-set signatures) → undirected reachability →
    # min-survivor, like near_dup_dedup but over the LSH pair stage
    "near_dup_dedup_lsh": _minhash_pairs_sql(0.8, 1) + """
, e AS (
  SELECT doc_id_a AS a, doc_id_b AS b FROM pairs WHERE jaccard_est >= 0.8
  UNION
  SELECT doc_id_b, doc_id_a FROM pairs WHERE jaccard_est >= 0.8
), reach AS (
  SELECT a AS node, b AS r FROM e
  UNION
  SELECT reach.node, e.b FROM reach JOIN e ON reach.r = e.a
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (
  SELECT node FROM reach GROUP BY node HAVING min(r) < node)
""",
    # exact mirror of traindata.decontaminate (5-gram shingles, bench set
    # = doc_id % 50 == 7, distinct contaminated shingles per train doc)
    "decontaminate": r"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), pos AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
  FROM toks WHERE len(t) >= 5
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle FROM pos
), b AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 7
)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shared_shingles
FROM sh s JOIN b USING (shingle)
WHERE s.doc_id % 50 <> 7
GROUP BY s.doc_id
""",
    # traindata.seeded_sample(frac=0.25, seed=42): md5-u64 < 2^62
    "seeded_sample": (
        "SELECT doc_id FROM documents"
        " WHERE ('0x' || substr(md5(doc_id || ':42'), 1, 16))::UBIGINT"
        " < 4611686018427387904::UBIGINT"
    ),
    # traindata.stratified_sample(n_per_group=50, seed=42)
    "stratified_sample": (
        "SELECT doc_id, lang FROM ("
        " SELECT doc_id, lang, row_number() OVER ("
        "  PARTITION BY lang"
        "  ORDER BY ('0x' || substr(md5(doc_id || ':42'), 1, 16))::UBIGINT"
        " ) AS rk FROM documents) WHERE rk <= 50"
    ),
    # traindata.weighted_sample(k=100, seed=42): A-Res keys via the
    # matched float tree — u = (CAST(h AS DOUBLE) + 1) / 2^64, key =
    # floor(2^20 · ln(u)/w) — and the (key DESC, doc_id) top-k rank
    "weighted_sample": """
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ('0x' || substr(md5(doc_id || ':42'), 1, 16))::UBIGINT AS h
  FROM documents
), keys AS (
  SELECT doc_id, n_tokens,
         CAST(floor(1048576.0 * (
           ln((CAST(h AS DOUBLE) + 1) / 18446744073709551616.0)
           / n_tokens)) AS BIGINT) AS key_q20
  FROM d
)
SELECT doc_id, n_tokens, key_q20 FROM (
  SELECT doc_id, n_tokens, key_q20,
         row_number() OVER (ORDER BY key_q20 DESC, doc_id) AS rk
  FROM keys
) WHERE rk <= 100
""",
    # traindata.temperature_mix(total=200, seed=42): α=1/2 mixture rates
    # in pure integer arithmetic (isqrt == floor(sqrt(DOUBLE)) while
    # n·2^40 < 2^52), seeded md5-u64 threshold per language
    "temperature_mix": """
WITH c AS (SELECT lang, CAST(count(*) AS HUGEINT) AS n
           FROM documents GROUP BY lang),
w AS (SELECT lang, n,
             CAST(floor(sqrt(CAST(n * 1099511627776 AS DOUBLE))) AS HUGEINT)
             AS w
      FROM c),
tot AS (SELECT CAST(sum(w) AS HUGEINT) AS sw FROM w),
thr AS (SELECT w.lang,
               (CAST(200 AS HUGEINT) * w.w
                * CAST('18446744073709551616' AS HUGEINT))
               // (t.sw * w.n) AS t
        FROM w, tot t)
SELECT d.doc_id, d.lang FROM documents d JOIN thr ON thr.lang = d.lang
WHERE CAST(('0x' || substr(md5(d.doc_id || ':42'), 1, 16))::UBIGINT
           AS HUGEINT) < thr.t
""",
    # the full composed curation pipeline (traindata.curate_corpus):
    # near-dup removal -> decontamination -> quality filter -> packing,
    # replayed in one WITH RECURSIVE query from the stage oracles
    "curate_corpus": r"""
WITH RECURSIVE d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks,
         string_split(text, ' ')[1] AS blk FROM documents
), pr AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= 0.8
), e AS (
  SELECT a, b FROM pr UNION SELECT b, a FROM pr
), reach AS (
  SELECT a AS node, b AS r FROM e
  UNION
  SELECT reach.node, e.b FROM reach JOIN e ON reach.r = e.a
), survivors AS (
  SELECT doc_id FROM documents WHERE doc_id NOT IN (
    SELECT node FROM reach GROUP BY node HAVING min(r) < node)
), tok2 AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), pos AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
  FROM tok2 WHERE len(t) >= 5
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle FROM pos
), bset AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 7
), contaminated AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN bset USING (shingle)
  WHERE s.doc_id % 50 <> 7
), kept AS (
  SELECT dd.doc_id, dd.lang, dd.doc_id % 16 AS shard,
         len(string_split(dd.text, ' ')) AS n
  FROM documents dd
  JOIN survivors USING (doc_id)
  WHERE dd.doc_id % 50 <> 7
    AND dd.doc_id NOT IN (SELECT doc_id FROM contaminated)
    AND len(string_split(dd.text, ' ')) >= 20
), k2 AS (
  SELECT doc_id, lang, shard, n,
         row_number() OVER (PARTITION BY lang, shard ORDER BY doc_id) AS rn
  FROM kept
), pk AS (
  SELECT lang, shard, rn, doc_id, n, n AS acc, 1 AS seq FROM k2 WHERE rn = 1
  UNION ALL
  SELECT k2.lang, k2.shard, k2.rn, k2.doc_id, k2.n,
         CASE WHEN pk.acc + k2.n > 256 THEN k2.n ELSE pk.acc + k2.n END,
         CASE WHEN pk.acc + k2.n > 256 THEN pk.seq + 1 ELSE pk.seq END
  FROM pk JOIN k2 ON k2.lang = pk.lang AND k2.shard = pk.shard
                 AND k2.rn = pk.rn + 1
)
SELECT doc_id, lang, CAST(shard AS BIGINT) AS shard,
       CAST(seq AS BIGINT) AS seq_id FROM pk
""",
    # traindata.pack_sequences(capacity=256, num_shards=16): the greedy
    # reset-cumsum replayed per (lang, shard) by a recursive CTE
    "pack_sequences": r"""
WITH RECURSIVE d AS (
  SELECT doc_id, lang, doc_id % 16 AS shard,
         len(string_split(text, ' ')) AS n,
         row_number() OVER (PARTITION BY lang, doc_id % 16
                            ORDER BY doc_id) AS rn
  FROM documents
), p AS (
  SELECT lang, shard, rn, doc_id, n, n AS acc, 1 AS seq FROM d WHERE rn = 1
  UNION ALL
  SELECT d.lang, d.shard, d.rn, d.doc_id, d.n,
         CASE WHEN p.acc + d.n > 256 THEN d.n ELSE p.acc + d.n END,
         CASE WHEN p.acc + d.n > 256 THEN p.seq + 1 ELSE p.seq END
  FROM p JOIN d ON d.lang = p.lang AND d.shard = p.shard AND d.rn = p.rn + 1
)
SELECT doc_id, lang, CAST(shard AS BIGINT) AS shard,
       CAST(seq AS BIGINT) AS seq_id FROM p
""",
    # traindata.chunk_documents(chunk_tokens=64, overlap=8): the
    # identical window slicing via generate_series + list_slice
    # (stride = 56; k = max(1, ceil((n - 8) / 56)))
    "chunk_documents": r"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), c AS (
  SELECT doc_id, toks, len(toks) AS n,
         greatest(1, CAST(ceil((len(toks) - 8) / 56.0) AS BIGINT)) AS k
  FROM t
), e AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(0, k - 1)) AS chunk_id
  FROM c
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       least(chunk_id * 56 + 64, n) - chunk_id * 56 AS n_tokens,
       array_to_string(list_slice(toks, chunk_id * 56 + 1,
                                  least(chunk_id * 56 + 64, n)),
                       ' ') AS chunk_text
FROM e
""",
}

def _payload_features_sql(dim: int = 16, seed: int = 42) -> str:
    """Exact mirror of multimodal.payload_features_vals: the seeded
    dyadic-quantized projection embedded as literals; per-byte histogram
    via codepoints (corpus is ASCII — octet==char); all sums are exact
    multiples of 2^-8 so float equality is bit-for-bit."""
    import numpy as np

    W = np.round(np.random.RandomState(seed).standard_normal((256, dim))
                 * 256) / 256
    values = ",".join("(%d,%d,%r)" % (v, j, W[v, j])
                      for v in range(256) for j in range(dim))
    return f"""
WITH w(v, j, wt) AS (VALUES {values}),
chars AS (
  SELECT doc_id, ascii(substr(text, i, 1)) AS v
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text))) AS i
        FROM documents)
),
hist AS (SELECT doc_id, v, count(*) AS c FROM chars GROUP BY doc_id, v)
SELECT h.doc_id, CAST(w.j AS BIGINT) AS j, sum(h.c * w.wt) AS val
FROM hist h JOIN w ON w.v = h.v
GROUP BY h.doc_id, w.j
"""


# The IVF oracle embeds the TRAINED quantizer, which is derived from the
# sf0.01 embeddings file at import time; when that table is absent (repo
# used outside the driver sandbox) knn_ivf simply falls back to the
# rows-only check instead of breaking the import.
def _ivfpq_sql(sf_dir: str = "/root/testdata/sf0.01", stride: int = 50,
               k: int = 5, nlist: int = 64, nprobe: int = 16,
               m: int = 8, ksub: int = 256, refine: int = 4) -> str:
    """Exact SQL mirror of simsearch.knn_ivfpq GIVEN the trained
    (C, CB): normalize, coarse-assign, residual-encode every candidate
    (argmin Σ(r−w)², ties to the lowest code — the identical arithmetic
    form the engine uses), build each query's per-probed-bucket LUT, sum
    m lookups into the ADC distance, keep the per-query refine·k by
    (dist ASC, neighbor ASC) and re-rank those by exact cosine.
    sf0.01-specific like _ivf_sql (the quantizer is a model artifact of
    that table); other scales rely on the recall pin vs bruteforce."""
    from .simsearch import train_ivfpq

    C, CB = train_ivfpq(sf_dir, nlist=nlist, m=m, ksub=ksub)
    sd = CB.shape[2]
    cvals = ",".join(
        "(%d,%d,%r)" % (c, i, C[c, i])
        for c in range(C.shape[0]) for i in range(C.shape[1]))
    cbvals = ",".join(
        "(%d,%d,%d,%r)" % (mi, j, ii, CB[mi, j, ii])
        for mi in range(CB.shape[0]) for j in range(CB.shape[1])
        for ii in range(CB.shape[2]))
    return f"""
WITH cents(c, i, w) AS (VALUES {cvals}),
cb(mi, j, ii, w) AS (VALUES {cbvals}),
e AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         unnest(generate_series(1, len(embedding))) - 1 AS i
  FROM embeddings
),
nrm AS (SELECT vec_id, sqrt(sum(x * x)) AS nn FROM e GROUP BY vec_id),
en AS (SELECT e.vec_id, e.i, e.x / nrm.nn AS x
       FROM e JOIN nrm USING (vec_id)),
sims AS (
  SELECT en.vec_id, cents.c, sum(en.x * cents.w) AS s
  FROM en JOIN cents ON cents.i = en.i
  GROUP BY en.vec_id, cents.c
),
assign AS (
  SELECT vec_id, c FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c) AS rk
    FROM sims) WHERE rk = 1
),
probes AS (
  SELECT vec_id, c FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c) AS rk
    FROM sims WHERE vec_id % {stride} = 0) WHERE rk <= {nprobe}
),
res AS (
  SELECT en.vec_id, en.i, en.x - cents.w AS r
  FROM en JOIN assign a USING (vec_id)
  JOIN cents ON cents.c = a.c AND cents.i = en.i
),
cdist AS (
  SELECT r.vec_id, cb.mi, cb.j, sum((r.r - cb.w) * (r.r - cb.w)) AS d2
  FROM res r JOIN cb ON cb.mi = r.i // {sd} AND cb.ii = r.i % {sd}
  GROUP BY r.vec_id, cb.mi, cb.j
),
codes AS (
  SELECT vec_id, mi, j AS code FROM (
    SELECT vec_id, mi, j,
           row_number() OVER (PARTITION BY vec_id, mi
                              ORDER BY d2 ASC, j ASC) AS rk
    FROM cdist) WHERE rk = 1
),
qres AS (
  SELECT p.vec_id AS qid, p.c, en.i, en.x - cents.w AS r
  FROM probes p JOIN en ON en.vec_id = p.vec_id
  JOIN cents ON cents.c = p.c AND cents.i = en.i
),
lut AS (
  SELECT q.qid, q.c, cb.mi, cb.j, sum((q.r - cb.w) * (q.r - cb.w)) AS d2
  FROM qres q JOIN cb ON cb.mi = q.i // {sd} AND cb.ii = q.i % {sd}
  GROUP BY q.qid, q.c, cb.mi, cb.j
),
adc AS (
  SELECT p.vec_id AS qid, a.vec_id AS nid, sum(l.d2) AS dist
  FROM probes p
  JOIN assign a ON a.c = p.c AND a.vec_id <> p.vec_id
  JOIN codes cd ON cd.vec_id = a.vec_id
  JOIN lut l ON l.qid = p.vec_id AND l.c = p.c
            AND l.mi = cd.mi AND l.j = cd.code
  GROUP BY p.vec_id, a.vec_id
),
adcr AS (
  SELECT qid, nid FROM (
    SELECT qid, nid,
           row_number() OVER (PARTITION BY qid
                              ORDER BY dist ASC, nid) AS rk
    FROM adc) WHERE rk <= {refine * k}
),
refined AS (
  SELECT a.qid, a.nid,
         list_cosine_similarity(eq.embedding, en.embedding) AS sim
  FROM adcr a
  JOIN embeddings eq ON eq.vec_id = a.qid
  JOIN embeddings en ON en.vec_id = a.nid
)
SELECT qid AS query_id, nid AS neighbor_id, CAST(rk AS BIGINT) AS rank
FROM (SELECT qid, nid,
             row_number() OVER (PARTITION BY qid
                                ORDER BY sim DESC, nid) AS rk
      FROM refined)
WHERE rk <= {k}
"""


try:
    DOC_ORACLES["knn_ivf"] = _ivf_sql()
    DOC_ORACLES["knn_ivfpq"] = _ivfpq_sql()
    # recall@k: the two oracles nested as derived tables (DuckDB allows
    # WITH inside a subquery), intersected per query — evaluation of an
    # index by its own oracle pair
    DOC_ORACLES["ann_recall"] = (
        "SELECT e.query_id, CAST(5 AS BIGINT) AS k,"
        " CAST(count(i.neighbor_id) AS BIGINT) AS n_hits"
        " FROM (" + DOC_ORACLES["knn_bruteforce"] + ") e"
        " LEFT JOIN (" + _ivf_sql() + ") i"
        " ON i.query_id = e.query_id"
        " AND i.neighbor_id = e.neighbor_id"
        " GROUP BY e.query_id"
    )
except OSError:
    pass

# the broadcast decontamination plan computes the IDENTICAL answer to
# the co-group plan (real set intersection, not a sketch) — one oracle
# serves both, which is exactly the point of having two plans
DOC_ORACLES["decontaminate_broadcast"] = DOC_ORACLES["decontaminate"]

# exact mirror of traindata.dsir_weights: per-token integer-quantized
# log-ratio weights (add-1 smoothing, target = doc_id % 50 == 7), INT64
# sum per training doc. Both products are exact BIGINTs cast to DOUBLE
# once (mirrors Python's float(num)/float(den)); ln is the same libm
# call on both sides, so floor(2^20·ln(...)) agrees bit-for-bit.
DOC_ORACLES["dsir_weights"] = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), counts AS (
  SELECT tok,
    CAST(sum(CASE WHEN doc_id % 50 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS t_n,
    CAST(sum(CASE WHEN doc_id % 50 <> 7 THEN 1 ELSE 0 END) AS BIGINT) AS s_n
  FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(sum(t_n) AS BIGINT) AS t_tot,
         CAST(sum(s_n) AS BIGINT) AS s_tot,
         CAST(count(*) AS BIGINT) AS v
  FROM counts
), w AS (
  SELECT tok,
    CAST(floor(1048576.0 * ln(
      CAST((t_n + 1) * (s_tot + v) AS DOUBLE) /
      CAST((s_n + 1) * (t_tot + v) AS DOUBLE))) AS BIGINT) AS w
  FROM counts, tot
)
SELECT t.doc_id,
       CAST(sum(w.w) AS BIGINT) AS dsir_q20,
       CAST(count(*) AS BIGINT) AS n_tokens
FROM toks t JOIN w USING (tok)
WHERE t.doc_id % 50 <> 7
GROUP BY t.doc_id
"""

# exact mirror of traindata.token_quantiles: discrete per-lang quantiles
# of whitespace token counts (quantile_disc = the ceil(q*N)-th smallest,
# the same rule the engine's histogram walk implements)
DOC_ORACLES["token_quantiles"] = """
WITH n AS (
  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
)
SELECT lang,
  unnest([25, 50, 90, 99]) AS q_pct,
  unnest([quantile_disc(n, 0.25), quantile_disc(n, 0.50),
          quantile_disc(n, 0.90), quantile_disc(n, 0.99)]) AS n_tokens
FROM n GROUP BY lang
"""

# exact replay of traindata.distinct_token_kmv: the KMV sketch is
# deterministic (md5-u64 token hashes), so the oracle recomputes the k
# smallest hashes and the (k-1)*2^64 // kth estimator bit-for-bit
DOC_ORACLES["distinct_token_kmv"] = """
WITH toks AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents
), h AS (
  SELECT ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h FROM toks
), km AS (
  SELECT h FROM h ORDER BY h LIMIT 256
), agg AS (
  SELECT count(*) AS kn, max(h) AS kth FROM km
)
SELECT CAST(kn AS BIGINT) AS k_used,
       CAST(kth AS VARCHAR) AS kth_hash,
       CAST(CASE WHEN kn < 256 THEN CAST(kn AS HUGEINT)
            ELSE (CAST(kn - 1 AS HUGEINT)
                  * CAST('18446744073709551616' AS HUGEINT))
                 // CAST(kth AS HUGEINT)
       END AS BIGINT) AS est_distinct
FROM agg
"""

# exact mirror of traindata.inverted_index: df over ALL docs, posting
# list = the 32 smallest doc_ids per token
DOC_ORACLES["inverted_index"] = """
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents
), dfreq AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM pairs GROUP BY tok
), ranked AS (
  SELECT tok, doc_id,
         row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rk
  FROM pairs
)
SELECT r.tok, d.df, r.doc_id
FROM ranked r JOIN dfreq d USING (tok) WHERE r.rk <= 32
"""

# textops.pmi_bigrams(min_count=5, k=100): the identical five-term
# libm-ln expression tree, floor-quantized per bigram; global top-k with
# (pmi DESC, x, y) ties
DOC_ORACLES["pmi_bigrams"] = r"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), uni AS (
  SELECT unnest(t) AS x FROM toks
), ucnt AS (
  SELECT x, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY x
), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uni),
bg AS (
  SELECT t[i] AS x, t[i + 1] AS y
  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)
), bb AS (SELECT CAST(count(*) AS BIGINT) AS b FROM bg),
bcnt AS (
  SELECT x, y, CAST(count(*) AS BIGINT) AS cxy
  FROM bg GROUP BY x, y HAVING count(*) >= 5
), scored AS (
  SELECT bc.x, bc.y, bc.cxy,
         CAST(floor(1048576.0 * (
           ln(bc.cxy) - ln((SELECT b FROM bb)) + 2.0 * ln((SELECT n FROM nn))
           - ln(ux.c) - ln(uy.c))) AS BIGINT) AS pmi_q20
  FROM bcnt bc
  JOIN ucnt ux ON ux.x = bc.x
  JOIN ucnt uy ON uy.x = bc.y
)
SELECT x, y, cxy, pmi_q20 FROM (
  SELECT x, y, cxy, pmi_q20,
         row_number() OVER (ORDER BY pmi_q20 DESC, x, y) AS rk
  FROM scored
) WHERE rk <= 100
"""

# dedup.winnow_fingerprints(k=4, w=4): identical k-gram hash, window
# extent (single window when a doc has fewer than w k-grams), and
# rightmost-minimum tie rule (max(pos) among window positions whose hash
# equals the window minimum)
DOC_ORACLES["winnow_fingerprints"] = r"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), kg AS (
  SELECT doc_id, i - 1 AS pos,
         ('0x' || substr(md5(array_to_string(
             list_slice(t, i, i + 3), ' ')), 1, 16))::UBIGINT AS h,
         len(t) - 3 AS nk
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 3)) AS i
        FROM toks WHERE len(t) >= 4)
), starts AS (
  SELECT doc_id, unnest(generate_series(0, greatest(nk - 4, 0))) AS s
  FROM (SELECT DISTINCT doc_id, nk FROM kg)
), wmin AS (
  SELECT st.doc_id, st.s, min(k.h) AS mh
  FROM starts st
  JOIN kg k ON k.doc_id = st.doc_id AND k.pos BETWEEN st.s AND st.s + 3
  GROUP BY st.doc_id, st.s
), sel AS (
  SELECT w.doc_id, max(k.pos) AS pos, w.mh AS fp
  FROM wmin w
  JOIN kg k ON k.doc_id = w.doc_id AND k.pos BETWEEN w.s AND w.s + 3
           AND k.h = w.mh
  GROUP BY w.doc_id, w.s, w.mh
)
SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, fp FROM sel
"""

# MOSS similarity report on the same winnowing chain: doc pairs sharing
# ≥2 fingerprints, boilerplate fingerprints (df > 32) dropped first
DOC_ORACLES["fingerprint_overlap_pairs"] = \
    DOC_ORACLES["winnow_fingerprints"].replace(
        "SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, fp FROM sel",
        """, fpd AS (SELECT DISTINCT doc_id, fp FROM sel),
dfc AS (SELECT fp, count(*) AS nd FROM fpd GROUP BY fp),
keep AS (SELECT fpd.doc_id, fpd.fp
         FROM fpd JOIN dfc USING (fp) WHERE dfc.nd BETWEEN 2 AND 32),
pr AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
              CAST(count(*) AS BIGINT) AS n_shared
       FROM keep a JOIN keep b ON a.fp = b.fp AND a.doc_id < b.doc_id
       GROUP BY a.doc_id, b.doc_id)
SELECT doc_id_a, doc_id_b, n_shared FROM pr WHERE n_shared >= 2""")

# traindata.ccnet_buckets: the unigram_lm_score CTE (identical integer
# weights), per-token normalization by integer floor division, dyadic
# per-lang quartile cutpoints via quantile_disc (== the engine's
# ceil(q·N)-th-smallest histogram walk), CASE order mirrored
DOC_ORACLES["ccnet_buckets"] = """
WITH tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
cnt AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY t),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS s FROM cnt),
w AS (SELECT t, CAST((c * 1048576) // s AS BIGINT) AS q FROM cnt, tot),
sc AS (SELECT doc_id, CAST(sum(q) AS BIGINT) AS lm,
              CAST(count(*) AS BIGINT) AS n
       FROM tk JOIN w USING (t) GROUP BY doc_id),
s8 AS (SELECT d.doc_id, d.lang,
              CAST((sc.lm * 256) // (sc.n * 1048576) AS BIGINT) AS ppl_q8
       FROM sc JOIN documents d USING (doc_id)),
th AS (SELECT lang, quantile_disc(ppl_q8, 0.25) AS t25,
              quantile_disc(ppl_q8, 0.75) AS t75
       FROM s8 GROUP BY lang)
SELECT s.doc_id, s.lang, s.ppl_q8,
       CASE WHEN s.ppl_q8 <= th.t25 THEN 'tail'
            WHEN s.ppl_q8 > th.t75 THEN 'head'
            ELSE 'middle' END AS bucket
FROM s8 s JOIN th USING (lang)
"""

# traindata.bm25_search(k=10, n_queries=16): BM25 replayed relationally.
# Same float64 discipline as dsir_weights: ln is the shared libm call,
# every other op an exactly-rounded double ·/÷ of bit-matched operands in
# the IDENTICAL expression tree, each term floor-quantized to int64
# BEFORE the order-independent sum.
DOC_ORACLES["bm25_search"] = r"""
WITH train AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE doc_id % 50 <> 7
), stats AS (
  SELECT count(*) AS n,
         CAST(sum(len(t)) AS DOUBLE) / count(*) AS avgdl
  FROM train
), ex AS (
  SELECT doc_id, len(t) AS dl, unnest(t) AS tok FROM train
), tf AS (
  SELECT doc_id, tok, max(dl) AS dl, count(*) AS tf
  FROM ex GROUP BY doc_id, tok
), dfreq AS (
  SELECT tok, count(*) AS df FROM tf GROUP BY tok
), q AS (
  SELECT doc_id AS qid,
         unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents WHERE doc_id % 50 = 7 AND doc_id < 800
), contrib AS (
  SELECT q.qid, tf.doc_id,
         CAST(floor(1048576.0 * (
           ln(1 + ((SELECT n FROM stats) - d.df + 0.5) / (d.df + 0.5))
           * (tf.tf * 2.25)
           / (tf.tf + 1.25 * (0.25 + 0.75 *
              (tf.dl / (SELECT avgdl FROM stats)))))) AS BIGINT) AS c
  FROM q
  JOIN tf ON tf.tok = q.tok
  JOIN dfreq d ON d.tok = q.tok
), scores AS (
  SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS score_q20
  FROM contrib GROUP BY qid, doc_id
), ranked AS (
  SELECT qid, doc_id, score_q20,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score_q20 DESC, doc_id) AS rk
  FROM scores
)
SELECT qid, CAST(rk AS BIGINT) AS rank, doc_id, score_q20
FROM ranked WHERE rk <= 10
"""

# traindata.rrf_fusion(k=10, stride=50, n_queries=10): the bm25_search
# CTE chain re-parameterized to the % 50 = 0 query set, the
# knn_bruteforce chain restricted to the same ids, and the fusion layer
# in pure integer arithmetic (2^20 // (60 + rank), BIGINT sums)
DOC_ORACLES["rrf_fusion"] = r"""
WITH train AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE doc_id % 50 <> 0
), stats AS (
  SELECT count(*) AS n,
         CAST(sum(len(t)) AS DOUBLE) / count(*) AS avgdl
  FROM train
), ex AS (
  SELECT doc_id, len(t) AS dl, unnest(t) AS tok FROM train
), tf AS (
  SELECT doc_id, tok, max(dl) AS dl, count(*) AS tf
  FROM ex GROUP BY doc_id, tok
), dfreq AS (
  SELECT tok, count(*) AS df FROM tf GROUP BY tok
), q AS (
  SELECT doc_id AS qid,
         unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents WHERE doc_id % 50 = 0 AND doc_id < 500
), contrib AS (
  SELECT q.qid, tf.doc_id,
         CAST(floor(1048576.0 * (
           ln(1 + ((SELECT n FROM stats) - d.df + 0.5) / (d.df + 0.5))
           * (tf.tf * 2.25)
           / (tf.tf + 1.25 * (0.25 + 0.75 *
              (tf.dl / (SELECT avgdl FROM stats)))))) AS BIGINT) AS c
  FROM q
  JOIN tf ON tf.tok = q.tok
  JOIN dfreq d ON d.tok = q.tok
), sscores AS (
  SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS s
  FROM contrib GROUP BY qid, doc_id
), sranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY s DESC, doc_id) AS rk
  FROM sscores
), dq AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings
  WHERE vec_id % 50 = 0 AND vec_id < 500
), dsim AS (
  SELECT qid, vec_id AS nid, list_cosine_similarity(qe, embedding) AS sim
  FROM dq, embeddings WHERE vec_id != qid
), dranked AS (
  SELECT qid, nid,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
  FROM dsim
), contribs AS (
  SELECT qid, doc_id, 1048576 // (60 + rk) AS c FROM sranked WHERE rk <= 10
  UNION ALL
  SELECT qid, nid AS doc_id, 1048576 // (60 + rk) FROM dranked WHERE rk <= 5
), fused AS (
  SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS rrf_q20
  FROM contribs GROUP BY qid, doc_id
)
SELECT qid, CAST(rk AS BIGINT) AS rank, doc_id, rrf_q20
FROM (SELECT qid, doc_id, rrf_q20,
             row_number() OVER (PARTITION BY qid
                                ORDER BY rrf_q20 DESC, doc_id) AS rk
      FROM fused)
WHERE rk <= 10
"""

# traindata.segment_dedup(seg_tokens=16): identical slicing
# (generate_series + list_slice), identical u64 segment hash
# (('0x'||substr(md5,1,16))::UBIGINT, collision-faithful to the engine's
# partitioning key), identical keeper rule (min (doc_id, sidx) per hash)
DOC_ORACLES["segment_dedup"] = r"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), segs AS (
  SELECT doc_id, i AS sidx,
         array_to_string(list_slice(t, i * 16 + 1, i * 16 + 16), ' ') AS seg
  FROM (SELECT doc_id, t,
               unnest(generate_series(0,
                   CAST(ceil(len(t) / 16.0) AS BIGINT) - 1)) AS i
        FROM toks)
), ranked AS (
  SELECT doc_id, sidx, seg,
         row_number() OVER (
           PARTITION BY ('0x' || substr(md5(seg), 1, 16))::UBIGINT
           ORDER BY doc_id, sidx) AS rn
  FROM segs
)
SELECT doc_id,
       coalesce(string_agg(seg, ' ' ORDER BY sidx) FILTER (WHERE rn = 1),
                '') AS text,
       count(*) AS n_segments,
       count(*) FILTER (WHERE rn > 1) AS n_removed
FROM ranked GROUP BY doc_id
"""

# exact mirror of components.triangle_count over the jaccard_pairs edge
# set: canonical a<b edges; triangle (x<y<z) matched once as
# e1=(x,y), e2=(x,z), e3=(y,z)
# OLAP crosstab/PIVOT: conditional aggregation per (source × lang)
DOC_ORACLES["pivot_counts"] = """
SELECT source,
  CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
  CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
  CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
  CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS n_zh,
  CAST(sum(CASE WHEN lang NOT IN ('de','en','es','fr','zh')
           THEN 1 ELSE 0 END) AS BIGINT) AS n_other
FROM documents GROUP BY source
"""

# materialized session table: break flags via lag, session index via
# cumulative window sum, µs-exact bounds
DOC_ORACLES["session_table"] = """
WITH o AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS tus,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (
  SELECT user_id, tus,
         sum(brk) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS sidx
  FROM o)
SELECT user_id, CAST(sidx AS BIGINT) AS session_idx,
       CAST(min(tus) AS BIGINT) AS start_us,
       CAST(max(tus) AS BIGINT) AS end_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sidx
"""

# sweep-line interval concurrency over the session table: +1/−1 deltas,
# one global-order running sum, per-hour max of post-delta values
DOC_ORACLES["max_concurrent_sessions"] = (
    "WITH sess AS (" + DOC_ORACLES["session_table"] + "), "
    "d AS (SELECT user_id, session_idx, start_us AS t, 1 AS dd FROM sess"
    " UNION ALL"
    " SELECT user_id, session_idx, end_us + 1, -1 FROM sess), "
    "r AS (SELECT t, dd,"
    " sum(dd) OVER (ORDER BY t, dd, user_id, session_idx) AS conc"
    " FROM d) "
    "SELECT CAST(t // 3600000000 AS BIGINT) AS hour,"
    " CAST(max(conc) AS BIGINT) AS max_concurrent "
    "FROM r GROUP BY 1")

# bounded-frame window: 3-event moving sum per user (integer cents)
DOC_ORACLES["moving_sum_3"] = """
SELECT event_id, user_id,
  CAST(sum(CAST(floor(100.0 * value) AS BIGINT))
       OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
    AS mov3_q2
FROM events
"""

# CDC latest-wins compaction: one row per user, (ts, event_id) argmax
DOC_ORACLES["latest_event_per_user"] = """
SELECT user_id, event_id, event_type,
       CAST(floor(100.0 * value) AS BIGINT) AS value_q2
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) AS rk FROM events)
WHERE rk = 1
"""

# α=1/2 integer EWMA per user: the per-step floor makes the scan
# non-associative, so the oracle replays the walk with a recursive CTE
# (depth = max events per user). value > 0 in this corpus, so DuckDB's
# truncating // equals numpy's floor //.
DOC_ORACLES["ewma_user_value"] = """
WITH RECURSIVE ev AS (
  SELECT user_id, event_id,
         CAST(floor(100.0 * value) AS BIGINT) AS vq,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS i
  FROM events
), walk AS (
  SELECT user_id, event_id, i, vq AS s FROM ev WHERE i = 1
  UNION ALL
  SELECT e.user_id, e.event_id, e.i, (w.s + e.vq) // 2
  FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.i = w.i + 1
)
SELECT user_id, event_id, CAST(s AS BIGINT) AS ewma_q FROM walk
"""

# distributed Lloyd k-means, FULL training loop replayed: coordinates
# floor-quantized once so every distance / member sum / centroid update
# is exact integer arithmetic; two unrolled rounds + final assignment.
# floor(CAST(s AS DOUBLE)/cnt) is the true floor: denominators ≤ row
# count keep rational spacing (1/cnt) far above double rounding error.
DOC_ORACLES["kmeans_lloyd"] = """
WITH v AS (
  SELECT vec_id, i - 1 AS j,
         CAST(floor(1024.0 * CAST(embedding[i] AS DOUBLE)) AS BIGINT) AS x
  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) s
), init AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS c
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
), c0 AS (
  SELECT init.c, v.j, v.x FROM init JOIN v USING (vec_id)
), d1 AS (
  SELECT v.vec_id, c0.c, sum((v.x - c0.x) * (v.x - c0.x)) AS dd
  FROM v JOIN c0 ON v.j = c0.j GROUP BY v.vec_id, c0.c
), a1 AS (
  SELECT vec_id, c FROM (
    SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id
           ORDER BY dd, c) AS rk FROM d1) WHERE rk = 1
), s1 AS (
  SELECT a1.c, v.j, sum(v.x) AS s, count(*) AS cnt
  FROM a1 JOIN v USING (vec_id) GROUP BY a1.c, v.j
), c1 AS (
  SELECT c0.c, c0.j,
         COALESCE(CAST(floor(CAST(s1.s AS DOUBLE) / s1.cnt) AS BIGINT),
                  c0.x) AS x
  FROM c0 LEFT JOIN s1 ON s1.c = c0.c AND s1.j = c0.j
), d2 AS (
  SELECT v.vec_id, c1.c, sum((v.x - c1.x) * (v.x - c1.x)) AS dd
  FROM v JOIN c1 ON v.j = c1.j GROUP BY v.vec_id, c1.c
), a2 AS (
  SELECT vec_id, c FROM (
    SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id
           ORDER BY dd, c) AS rk FROM d2) WHERE rk = 1
), s2 AS (
  SELECT a2.c, v.j, sum(v.x) AS s, count(*) AS cnt
  FROM a2 JOIN v USING (vec_id) GROUP BY a2.c, v.j
), c2 AS (
  SELECT c1.c, c1.j,
         COALESCE(CAST(floor(CAST(s2.s AS DOUBLE) / s2.cnt) AS BIGINT),
                  c1.x) AS x
  FROM c1 LEFT JOIN s2 ON s2.c = c1.c AND s2.j = c1.j
), d3 AS (
  SELECT v.vec_id, c2.c, sum((v.x - c2.x) * (v.x - c2.x)) AS dd
  FROM v JOIN c2 ON v.j = c2.j GROUP BY v.vec_id, c2.c
)
SELECT vec_id, c AS cluster FROM (
  SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id
         ORDER BY dd, c) AS rk FROM d3) WHERE rk = 1
"""

# minimum spanning forest of the weighted near-dup graph. The edge
# order (sim_q DESC, a, b) is total, so the MSF is unique and Kruskal's
# cut property characterizes it edge-by-edge: e ∈ MSF iff its endpoints
# are NOT connected using strictly earlier-ranked edges (recursive-CTE
# reachability per edge; dup components are small cliques, so the
# reach table stays tiny).
DOC_ORACLES["msf_boruvka"] = """
WITH RECURSIVE d AS (
  SELECT doc_id, list_distinct(string_split(text,' ')) AS toks,
         string_split(text,' ')[1] AS blk FROM documents
), p0 AS (
  SELECT a.doc_id AS ea, b.doc_id AS eb,
    CAST((1048576 * len(list_intersect(a.toks, b.toks)))
         // (len(a.toks) + len(b.toks)
             - len(list_intersect(a.toks, b.toks))) AS BIGINT) AS sim_q
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= 0.8
), p AS (
  SELECT ea, eb, sim_q,
         row_number() OVER (ORDER BY sim_q DESC, ea, eb) AS rn
  FROM p0
), reach AS (
  SELECT rn AS eid, ea AS node FROM p
  UNION
  SELECT r.eid,
         CASE WHEN e.ea = r.node THEN e.eb ELSE e.ea END AS node
  FROM reach r JOIN p e
    ON (e.ea = r.node OR e.eb = r.node) AND e.rn < r.eid
)
SELECT ea AS doc_id_a, eb AS doc_id_b, sim_q FROM p
WHERE NOT EXISTS (SELECT 1 FROM reach r
                  WHERE r.eid = p.rn AND r.node = p.eb)
"""

# LEFT OUTER aggregate: every customer, zero-filled order counts
DOC_ORACLES["customer_order_counts"] = """
SELECT c.c_custkey,
       CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
"""

# exact dedup on the canonicalized form (normalize_text's regexes)
DOC_ORACLES["dedup_normalized"] = """
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
FROM (
  SELECT doc_id,
    trim(regexp_replace(regexp_replace(lower(text),
                                       '[^a-z0-9 ]', ' ', 'g'),
                        ' +', ' ', 'g'), ' ') AS n
  FROM documents)
GROUP BY n
"""

# weighted near-dup pairs: exact Jaccard floor-quantized from pure
# integers (q·|A∩B| // |A∪B|) — bit-exact with zero float mirroring
DOC_ORACLES["jaccard_pairs_sim"] = """
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text,' ')) AS toks,
         string_split(text,' ')[1] AS blk FROM documents
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
  CAST((1048576 * len(list_intersect(a.toks, b.toks)))
       // (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
       AS BIGINT) AS sim_q
FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      >= 0.8
"""

# REAL video decode end-to-end: frame f of the Cmono Y4M stream covers
# payload bytes [f·128, (f+1)·128) zero-padded; ASCII ⇒ codepoint==byte
DOC_ORACLES["y4m_frame_stats"] = """
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
fr AS (
  SELECT doc_id, text, n, greatest(1, (n + 127) // 128) AS nf FROM d),
s AS (
  SELECT doc_id, text, n,
         unnest(generate_series(0, (nf + 3) // 4 - 1)) * 4 AS frame_idx
  FROM fr),
ch AS (
  SELECT doc_id, frame_idx,
         ascii(substr(text, frame_idx * 128 + i, 1)) AS v
  FROM (SELECT doc_id, text, frame_idx,
               unnest(generate_series(
                   1, least(128, n - frame_idx * 128))) AS i
        FROM s))
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(sum(v) AS BIGINT) AS luma_sum
FROM ch GROUP BY doc_id, frame_idx
"""

# exact per-type value percentiles (integer cents, quantile_disc rule)
DOC_ORACLES["value_percentiles"] = """
WITH e AS (
  SELECT event_type, CAST(floor(100.0 * value) AS BIGINT) AS c
  FROM events
)
SELECT event_type,
  unnest([50, 95, 99]) AS q_pct,
  unnest([quantile_disc(c, 0.50), quantile_disc(c, 0.95),
          quantile_disc(c, 0.99)]) AS value_cents
FROM e GROUP BY event_type
"""

# exact COUNT(DISTINCT user) per hourly tumbling window (DAU/HAU)
DOC_ORACLES["hourly_active_users"] = """
SELECT CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS hour,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
FROM events GROUP BY 1
"""

# χ² term–language association in exact HUGEINT arithmetic (the
# squares overflow int64; numerator nonneg so truncating // == floor)
DOC_ORACLES["chi2_terms"] = """
WITH tk AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
c AS (SELECT lang, tok, CAST(count(*) AS HUGEINT) AS a
      FROM tk GROUP BY lang, tok),
lt AS (SELECT lang, CAST(count(*) AS HUGEINT) AS nl
       FROM tk GROUP BY lang),
tt AS (SELECT tok, CAST(count(*) AS HUGEINT) AS nt
       FROM tk GROUP BY tok),
n AS (SELECT CAST(count(*) AS HUGEINT) AS tot FROM tk),
x AS (
  SELECT c.lang, c.tok, a, nl - a AS b, nt - a AS cc,
         tot - nl - nt + a AS d, tot
  FROM c JOIN lt USING (lang) JOIN tt USING (tok), n)
SELECT lang, tok,
  CAST(CASE WHEN (a+b)*(cc+d)*(a+cc)*(b+d) = 0 THEN 0
       ELSE (CAST(1048576 AS HUGEINT) * tot
             * (a*d - b*cc) * (a*d - b*cc))
            // ((a+b)*(cc+d)*(a+cc)*(b+d)) END AS BIGINT) AS chi2_q
FROM x
"""

# classifier-evaluation confusion matrix: the lang_id oracle chain
# (nested WITH in a derived table) joined back to the labels
DOC_ORACLES["langid_confusion"] = (
    "WITH pred AS (" + DOC_ORACLES["lang_id"] + ") "
    "SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n "
    "FROM pred p JOIN documents d USING (doc_id) "
    "GROUP BY d.lang, p.lang_pred")

# grouped top-k over a global aggregate: per-language term ranking
DOC_ORACLES["top_terms_by_lang"] = """
WITH t AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
c AS (
  SELECT lang, tok, CAST(count(*) AS BIGINT) AS n
  FROM t GROUP BY lang, tok),
r AS (
  SELECT *, row_number() OVER (PARTITION BY lang
           ORDER BY n DESC, tok) AS rank FROM c)
SELECT lang, tok, n, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 10
"""

# text canonicalization: ASCII-explicit classes so re and RE2 agree;
# the md5 proves byte-identical normalization across engines
DOC_ORACLES["normalize_text"] = """
SELECT doc_id,
  CAST(length(n) AS BIGINT) AS n_chars_norm,
  md5(n) AS norm_md5
FROM (
  SELECT doc_id,
    trim(regexp_replace(regexp_replace(lower(text),
                                       '[^a-z0-9 ]', ' ', 'g'),
                        ' +', ' ', 'g'), ' ') AS n
  FROM documents)
"""

# per-doc Shannon entropy of the token histogram, as two per-term
# floor-quantized integer sums (order-independent, bit-exact)
DOC_ORACLES["token_entropy"] = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
cnt AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY doc_id, t),
per AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(sum(CAST(floor(1048576.0 *
               (CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))) AS BIGINT))
           AS BIGINT) AS slogc_q
  FROM cnt GROUP BY doc_id)
SELECT doc_id, n_tokens,
  CAST(floor(1048576.0 * (CAST(n_tokens AS DOUBLE)
        * ln(CAST(n_tokens AS DOUBLE)))) AS BIGINT) AS nlogn_q,
  slogc_q
FROM per
"""

# per-lang z-score normalization: integer sufficient statistics, one
# exactly-rounded IEEE sqrt/divide/multiply tree → bit-exact floor
DOC_ORACLES["zscore_quality"] = """
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS x
  FROM documents),
s AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS s1,
         CAST(sum(x*x) AS BIGINT) AS s2
  FROM t GROUP BY lang)
SELECT t.doc_id, t.lang, t.x AS n_tokens,
  CASE WHEN s.n*s.s2 - s.s1*s.s1 = 0 THEN CAST(0 AS BIGINT)
       ELSE CAST(floor(1048576.0 * (CAST(s.n*t.x - s.s1 AS DOUBLE)
                 / sqrt(CAST(s.n*s.s2 - s.s1*s.s1 AS DOUBLE))))
            AS BIGINT)
  END AS z_q
FROM t JOIN s USING (lang)
"""

# NDJSON / CSV source-format roundtrips: the oracle computes the digest
# straight from the parquet view, so a hash-match proves the export →
# shard-files → re-ingest path byte-lossless per document
_ROUNDTRIP_SQL = (
    "SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars_rt,"
    " md5(text) AS text_md5 FROM documents"
)
DOC_ORACLES["ndjson_roundtrip"] = _ROUNDTRIP_SQL
DOC_ORACLES["csv_roundtrip"] = _ROUNDTRIP_SQL

# TPC-H Q18 shape: HAVING-filtered child aggregate gates the parent join
DOC_ORACLES["big_orders"] = """
WITH t AS (
  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 250)
SELECT o.o_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate, t.total_qty
FROM orders o JOIN t ON o.o_orderkey = t.l_orderkey
"""

# Heaps'-law vocabulary growth: cumulative tokens + distinct vocabulary
# after each tenth of the corpus (docs ordered by the dense doc_id)
DOC_ORACLES["vocab_growth"] = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
n AS (SELECT count(*) AS nd FROM documents),
cuts AS (SELECT k, (k * nd) // 10 AS cut
         FROM generate_series(1, 10) t(k), n),
firsts AS (SELECT tok, min(doc_id) AS fd FROM tok GROUP BY tok)
SELECT CAST(k AS BIGINT) AS checkpoint, CAST(cut AS BIGINT) AS n_docs,
  CAST((SELECT count(*) FROM tok WHERE doc_id < cut) AS BIGINT)
    AS n_tokens,
  CAST((SELECT count(*) FROM firsts WHERE fd < cut) AS BIGINT)
    AS n_distinct
FROM cuts
"""

DOC_ORACLES["triangle_count"] = """
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text,' ')) AS toks,
         string_split(text,' ')[1] AS blk FROM documents
), p AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= 0.8
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM p e1 JOIN p e2 ON e2.a = e1.a AND e2.b > e1.b
          JOIN p e3 ON e3.a = e1.b AND e3.b = e2.b
"""

# degree-assortativity sufficient statistics over the same pair graph
# (both orientations of every edge, so the two marginals coincide)
DOC_ORACLES["degree_assortativity_sums"] = """
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text,' ')) AS toks,
         string_split(text,' ')[1] AS blk FROM documents
), p AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= 0.8
), deg AS (
  SELECT node, count(*) AS dg FROM (
    SELECT a AS node FROM p UNION ALL SELECT b FROM p)
  GROUP BY node
), ends AS (
  SELECT da.dg AS dx, db.dg AS dy
  FROM p JOIN deg da ON da.node = p.a JOIN deg db ON db.node = p.b
  UNION ALL
  SELECT db.dg AS dx, da.dg AS dy
  FROM p JOIN deg da ON da.node = p.a JOIN deg db ON db.node = p.b
)
SELECT CAST(count(*) AS BIGINT) AS n_ends,
       CAST(sum(dx) AS BIGINT) AS s_d,
       CAST(sum(dx*dx) AS BIGINT) AS s_dd,
       CAST(sum(dx*dy) AS BIGINT) AS s_prod
FROM ends
"""

# per-node triangles + degree over the same pair graph: the local
# clustering coefficient 2·n_tri/(deg·(deg−1)) divides out exactly
DOC_ORACLES["clustering_coeff"] = """
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text,' ')) AS toks,
         string_split(text,' ')[1] AS blk FROM documents
), p AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= 0.8
), t AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM p e1 JOIN p e2 ON e2.a = e1.a AND e2.b > e1.b
            JOIN p e3 ON e3.a = e1.b AND e3.b = e2.b
), tri AS (
  SELECT node, count(*) AS nt FROM (
    SELECT x AS node FROM t UNION ALL SELECT y FROM t
    UNION ALL SELECT z FROM t)
  GROUP BY node
), deg AS (
  SELECT node, count(*) AS dg FROM (
    SELECT a AS node FROM p UNION ALL SELECT b FROM p)
  GROUP BY node
)
SELECT deg.node, CAST(deg.dg AS BIGINT) AS deg,
       CAST(COALESCE(tri.nt, 0) AS BIGINT) AS n_tri
FROM deg LEFT JOIN tri ON deg.node = tri.node
"""

# exact long-format mirror of the payload feature model (dyadic weights)
DOC_ORACLES["payload_features_vals"] = _payload_features_sql()

# exact long-format mirror of the resize stage's integer sampling grid
# (target 8x8=64 bytes; ASCII corpus => codepoint == payload byte)
DOC_ORACLES["payload_resize_vals"] = """
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
g AS (
  SELECT doc_id, text, n, least(64, n) AS num,
         unnest(generate_series(0, least(64, n) - 1)) AS i
  FROM d WHERE n > 0
)
SELECT doc_id, i,
       CAST(ascii(substr(text,
            CAST(CASE WHEN num = 1 THEN 0
                 ELSE (i * (n - 1)) // (num - 1) END AS INTEGER) + 1, 1))
            AS BIGINT) AS byte
FROM g
"""

# recursive-CTE ancestor closure over the documents broader chain
# (parent = doc_id // 2); base edges included = skosify.infer.skos_transitive
_ANC_CTE = """
WITH RECURSIVE anc AS (
  SELECT doc_id AS d, doc_id // 2 AS a FROM documents WHERE doc_id > 0
  UNION
  SELECT anc.d, documents.doc_id // 2
  FROM anc JOIN documents ON anc.a = documents.doc_id
  WHERE documents.doc_id > 0
)
"""

# Exact SQL reconstruction of the synthetic benchmark corpus's canonical
# graph (kgx.pages._cls_record_xml / _auth_record_xml through the full
# extract→link→canonicalize pipeline). Every branch of the generator is
# mirrored: notation/parent digits, caption word table, 008-driven
# deprecation (i%17), scopeNote+classHere (i%3), LCSH closeMatch (i%4),
# dropped-vocabulary index terms that still yield altLabels (i%5), 765
# component lists with md5-digest blank-node chains (i%7), gnd authority
# records (i%9), plus set-semantics dedup of the deliberate duplicate
# records (i%10==9) via the final DISTINCT. n = 2 × count(documents),
# matching queries.kg_synthetic.
_SYNTH_CTE = """
WITH seq AS (
  SELECT unnest(generate_series(0, 2 * (SELECT count(*) FROM documents) - 1)) AS i
), wt AS (
  SELECT ['Systems','Theory','Knowledge','Languages','History','Analysis',
          'Methods','Physics','Chemistry','Biology','Computing','Society',
          'Religion','Arts','Literature','Geography','Statistics','Music'] AS W
), cls AS (
  SELECT i,
    parent,
    parent || '.' || i AS notation,
    'http://dewey.info/class/' || parent || '.' || i || '/e23/' AS u,
    'http://dewey.info/class/' || parent || '/e23/' AS parent_uri,
    W[(i % 18) + 1] || ' ' || W[((i * 7 + 3) % 18) + 1] || ' ' || i AS caption,
    strftime(DATE '2020-01-01' + CAST(i % 365 AS INTEGER), '%Y-%m-%d') AS created,
    CAST(i % 10 AS VARCHAR) || lpad(CAST(i % 100 AS VARCHAR), 2, '0') AS comp2
  FROM (
    SELECT i,
      CAST(i % 10 AS VARCHAR) || CAST((i // 10) % 10 AS VARCHAR)
        || CAST((i // 100) % 10 AS VARCHAR) AS parent
    FROM seq
  ), wt
), comp AS (
  SELECT i, u, parent_uri,
    'http://dewey.info/class/' || comp2 || '/e23/' AS comp2_uri,
    '_:cl' || substr(md5(parent || chr(31) || comp2 || chr(30) || u), 1, 16)
      AS bn
  FROM cls WHERE i % 7 = 0
), auth AS (
  SELECT i,
    'http://d-nb.info/gnd/' || (1000000 + i) AS a,
    'http://d-nb.info/gnd/' || (1000000 + i // 2) AS pa,
    strftime(DATE '2020-01-01' + CAST(i % 365 AS INTEGER), '%Y-%m-%d') AS created
  FROM seq WHERE i % 9 = 0
), raw AS (
  SELECT u AS subj, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
         'http://www.w3.org/2004/02/skos/core#Concept' AS obj,
         FALSE AS obj_is_literal, NULL AS obj_lang, NULL AS obj_datatype FROM cls
  UNION ALL
  SELECT u, 'http://www.w3.org/2004/02/skos/core#inScheme',
         'http://dewey.info/scheme/edition/e23/', FALSE, NULL, NULL FROM cls
  UNION ALL
  SELECT u, 'http://purl.org/dc/terms/created', created, TRUE, NULL,
         'http://www.w3.org/2001/XMLSchema#date' FROM cls
  UNION ALL
  SELECT u, 'http://www.w3.org/2004/02/skos/core#notation', notation,
         TRUE, NULL, NULL FROM cls
  UNION ALL
  SELECT u, 'http://purl.org/dc/terms/identifier',
         'ocd' || lpad(CAST(i AS VARCHAR), 8, '0'), TRUE, NULL, NULL FROM cls
  UNION ALL
  SELECT u, 'http://www.w3.org/2004/02/skos/core#prefLabel', caption,
         TRUE, 'en', NULL FROM cls
  UNION ALL
  SELECT u, 'http://www.w3.org/2004/02/skos/core#broader', parent_uri,
         FALSE, NULL, NULL FROM cls
  UNION ALL
  SELECT u, 'http://www.w3.org/2004/02/skos/core#altLabel', 'Heading ' || i,
         TRUE, 'en', NULL FROM cls WHERE i % 4 = 0
  UNION ALL
  SELECT u, 'http://www.w3.org/2004/02/skos/core#altLabel', 'Term ' || i,
         TRUE, 'en', NULL FROM cls WHERE i % 5 = 0
  UNION ALL
  SELECT u, 'http://www.w3.org/2004/02/skos/core#closeMatch',
         'http://id.loc.gov/authorities/subjects/sh'
           || lpad(CAST(i AS VARCHAR), 8, '0'),
         FALSE, NULL, NULL FROM cls WHERE i % 4 = 0
  UNION ALL
  SELECT u, 'http://www.w3.org/2004/02/skos/core#scopeNote', 'Her: tema ' || i,
         TRUE, 'en', NULL FROM cls WHERE i % 3 = 0
  UNION ALL
  SELECT u, 'http://data.ub.uio.no/webdewey-terms#classHere', 'Tema ' || i,
         TRUE, 'en', NULL FROM cls WHERE i % 3 = 0
  UNION ALL
  SELECT u, 'http://www.w3.org/2002/07/owl#deprecated', 'true', TRUE, NULL,
         'http://www.w3.org/2001/XMLSchema#boolean' FROM cls WHERE i % 17 = 0
  UNION ALL
  SELECT u, 'http://www.loc.gov/mads/rdf/v1#componentList', bn || '_0',
         FALSE, NULL, NULL FROM comp
  UNION ALL
  SELECT bn || '_0', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first',
         parent_uri, FALSE, NULL, NULL FROM comp
  UNION ALL
  SELECT bn || '_0', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest',
         bn || '_1', FALSE, NULL, NULL FROM comp
  UNION ALL
  SELECT bn || '_1', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first',
         comp2_uri, FALSE, NULL, NULL FROM comp
  UNION ALL
  SELECT bn || '_1', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest',
         'http://www.w3.org/1999/02/22-rdf-syntax-ns#nil',
         FALSE, NULL, NULL FROM comp
  UNION ALL
  SELECT a, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
         'http://www.w3.org/2004/02/skos/core#Concept',
         FALSE, NULL, NULL FROM auth
  UNION ALL
  SELECT a, 'http://www.w3.org/2004/02/skos/core#inScheme',
         'http://d-nb.info/gnd/', FALSE, NULL, NULL FROM auth
  UNION ALL
  SELECT a, 'http://purl.org/dc/terms/created', created, TRUE, NULL,
         'http://www.w3.org/2001/XMLSchema#date' FROM auth
  UNION ALL
  SELECT a, 'http://purl.org/dc/terms/identifier',
         CAST(1000000 + i AS VARCHAR), TRUE, NULL, NULL FROM auth
  UNION ALL
  SELECT a, 'http://www.w3.org/2004/02/skos/core#prefLabel', 'Begriff ' || i,
         TRUE, 'de', NULL FROM auth
  UNION ALL
  SELECT a, 'http://www.w3.org/2004/02/skos/core#broader', pa,
         FALSE, NULL, NULL FROM auth
  UNION ALL
  SELECT a, 'http://www.w3.org/2004/02/skos/core#exactMatch',
         'http://www.wikidata.org/entity/Q' || i, FALSE, NULL, NULL FROM auth
)
"""

KG_ORACLES = {
    "kg_synthetic": _SYNTH_CTE + (
        "SELECT DISTINCT subj, pred, obj, obj_is_literal,"
        " CAST(obj_lang AS VARCHAR) AS obj_lang,"
        " CAST(obj_datatype AS VARCHAR) AS obj_datatype FROM raw"
    ),
    # the incremental merge produces the identical triple set, so the
    # same corpus reconstruction is its oracle
    "kg_incremental": _SYNTH_CTE + (
        "SELECT DISTINCT subj, pred, obj, obj_is_literal,"
        " CAST(obj_lang AS VARCHAR) AS obj_lang,"
        " CAST(obj_datatype AS VARCHAR) AS obj_datatype FROM raw"
    ),
    # graph diff: the CTE instantiated at full (2×docs pages) and half
    # (docs pages) corpus size; half ⊂ full, so the difference is
    # one-sided ('A')
    "kg_graph_diff": (
        "SELECT 'A' AS side, * FROM ((" + _SYNTH_CTE +
        " SELECT DISTINCT subj, pred, obj, obj_is_literal,"
        " CAST(obj_lang AS VARCHAR) AS obj_lang,"
        " CAST(obj_datatype AS VARCHAR) AS obj_datatype FROM raw"
        ") EXCEPT (" + _SYNTH_CTE.replace(
            "2 * (SELECT count(*) FROM documents)",
            "(SELECT count(*) FROM documents)") +
        " SELECT DISTINCT subj, pred, obj, obj_is_literal,"
        " CAST(obj_lang AS VARCHAR) AS obj_lang,"
        " CAST(obj_datatype AS VARCHAR) AS obj_datatype FROM raw))"
    ),
    "kg_skosify": _ANC_CTE + (
        "SELECT 'http://example.org/doc/' || d AS subj,"
        " 'http://www.w3.org/2004/02/skos/core#broaderTransitive' AS pred,"
        " 'http://example.org/doc/' || a AS obj FROM anc"
        " UNION ALL "
        "SELECT 'http://example.org/doc/' || a,"
        " 'http://www.w3.org/2004/02/skos/core#narrowerTransitive',"
        " 'http://example.org/doc/' || d FROM anc"
    ),
    "kg_skosify_exchange": _ANC_CTE + (
        "SELECT 'http://example.org/doc/' || d AS subj,"
        " 'http://www.w3.org/2004/02/skos/core#broaderTransitive' AS pred,"
        " 'http://example.org/doc/' || a AS obj FROM anc"
        " UNION ALL "
        "SELECT 'http://example.org/doc/' || a,"
        " 'http://www.w3.org/2004/02/skos/core#narrowerTransitive',"
        " 'http://example.org/doc/' || d FROM anc"
    ),
    "kg_broader_closure": _ANC_CTE + (
        "SELECT d AS doc_id, a AS ancestor FROM anc"
    ),
    # SCC as mutual >=1-step reachability (plain UNION recursion — the
    # pair set is finite so the fixpoint terminates without a depth
    # cap); drop rule subj >= obj on URI STRINGS, identical to
    # components.skos_repair. Orphans: every doc (all carry inScheme,
    # none carry topConceptOf) without a surviving outgoing edge.
    "kg_skosify_repair": """
WITH RECURSIVE edges AS MATERIALIZED (
  SELECT doc_id AS si, doc_id // 2 AS oi FROM documents WHERE doc_id > 0
  UNION ALL
  SELECT doc_id // 2, doc_id FROM documents
  WHERE doc_id > 0 AND doc_id % 97 = 0
  UNION ALL
  SELECT doc_id, 4 * doc_id FROM documents
  WHERE doc_id > 0 AND doc_id % 211 = 3
    AND 4 * doc_id < (SELECT count(*) FROM documents)
  UNION ALL
  SELECT doc_id, doc_id FROM documents WHERE doc_id % 401 = 5),
reach AS (
  SELECT si AS a, oi AS b FROM edges
  UNION
  SELECT r.a, e.oi FROM reach r JOIN edges e ON e.si = r.b),
kept AS MATERIALIZED (
  SELECT 'http://example.org/doc/' || e.si AS s,
         'http://example.org/doc/' || e.oi AS o
  FROM edges e
  WHERE NOT (
    EXISTS (SELECT 1 FROM reach r1
            WHERE r1.a = e.si AND r1.b = e.oi)
    AND EXISTS (SELECT 1 FROM reach r2
                WHERE r2.a = e.oi AND r2.b = e.si)
    AND 'http://example.org/doc/' || e.si
        >= 'http://example.org/doc/' || e.oi)),
orphans AS (
  SELECT 'http://example.org/doc/' || doc_id AS curi FROM documents d
  WHERE NOT EXISTS (SELECT 1 FROM kept k
                    WHERE k.s = 'http://example.org/doc/' || d.doc_id))
SELECT s AS subj,
       'http://www.w3.org/2004/02/skos/core#broader' AS pred,
       o AS obj FROM kept
UNION ALL
SELECT curi, 'http://www.w3.org/2004/02/skos/core#topConceptOf',
       'http://example.org/docs/' FROM orphans
UNION ALL
SELECT 'http://example.org/docs/',
       'http://www.w3.org/2004/02/skos/core#hasTopConcept', curi
FROM orphans
""",
    "kg_triples": TRIPLES_CTE + "SELECT subj, pred, obj, obj_lang FROM triples",
    "kg_ingest_batched": TRIPLES_CTE
    + "SELECT subj, pred, obj, obj_lang FROM triples",
    "kg_nt_roundtrip": TRIPLES_CTE
    + "SELECT subj, pred, obj, obj_lang FROM triples",
    "kg_ttl_roundtrip": TRIPLES_CTE
    + "SELECT subj, pred, obj, obj_lang FROM triples",
    "kg_pred_counts": TRIPLES_CTE + "SELECT pred, count(*) AS n FROM triples GROUP BY pred",
    "kg_dedup": TRIPLES_CTE + "SELECT pred, count(*) AS n FROM triples GROUP BY pred",
    "kg_expand": TRIPLES_CTE + (
        "SELECT obj AS subj, 'http://www.w3.org/2004/02/skos/core#narrower' AS pred, "
        "subj AS obj FROM triples "
        "WHERE pred = 'http://www.w3.org/2004/02/skos/core#broader'"
    ),
    "kg_label_conflicts": TRIPLES_CTE + (
        "SELECT pred, obj AS label,"
        " COALESCE(CAST(obj_lang AS VARCHAR), '') AS lang,"
        " CAST(count(DISTINCT subj) AS BIGINT) AS n_subjects"
        " FROM triples"
        " WHERE pred IN ("
        "'http://www.w3.org/2004/02/skos/core#prefLabel',"
        "'http://www.w3.org/2004/02/skos/core#altLabel')"
        " GROUP BY pred, obj, obj_lang"
        " HAVING count(DISTINCT subj) > 1"
    ),
    "kg_degree_histogram": TRIPLES_CTE + (
        "SELECT degree, count(*) AS n_subjects FROM ("
        "  SELECT subj, count(*) AS degree FROM triples GROUP BY subj"
        ") GROUP BY degree"
    ),
}


def _pagerank_sql(iters: int = 8) -> str:
    """Exact mirror of components.pagerank: integer-quantized PageRank
    unrolled as one CTE chain per iteration (floor division throughout,
    so every rank is bit-identical to the engine's int64 arithmetic)."""
    q = 1 << 40
    steps = []
    for k in range(iters):
        steps.append(f"""
c{k} AS (
  SELECT e.dst AS doc_id, sum(r.r // e.deg) AS s
  FROM edges e JOIN r{k} r ON r.doc_id = e.src GROUP BY e.dst),
r{k + 1} AS (
  SELECT n.doc_id,
         CAST((15 * ({q} // p.n)) // 100
              + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS r
  FROM nodes n CROSS JOIN params p
  LEFT JOIN c{k} c ON c.doc_id = n.doc_id)""")
    return f"""
WITH nodes AS (SELECT doc_id FROM documents),
params AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
eraw AS (
  SELECT doc_id AS src, doc_id // 2 AS dst FROM documents WHERE doc_id > 0
  UNION
  SELECT doc_id, (doc_id * doc_id + 1) % p.n FROM documents, params p),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM eraw GROUP BY src),
edges AS (SELECT e.src, e.dst, d.deg FROM eraw e JOIN deg d USING (src)),
r0 AS (SELECT doc_id, CAST({q} // p.n AS BIGINT) AS r
       FROM nodes, params p),{",".join(steps)}
SELECT doc_id, r AS rank_q FROM r{iters}
"""


def _kcore_sql(k: int = 2, rounds: int = 4) -> str:
    """Exact mirror of components.kcore: the jaccard_pairs edge CTE
    (same as triangle_count's), then ``rounds`` unrolled peel steps —
    degrees over e_{r-1}, edges kept iff both endpoints have deg ≥ k —
    and the final degree count over the surviving subgraph. Fixed-round
    on both sides, so the match is by construction even pre-fixpoint
    (the engine's early-exit on an identity round is a no-op)."""
    parts = ["""
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text,' ')) AS toks,
         string_split(text,' ')[1] AS blk FROM documents
), e0 AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= 0.8
)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
d{r} AS (
  SELECT node, count(*) AS deg
  FROM (SELECT a AS node FROM e{r - 1}
        UNION ALL SELECT b AS node FROM e{r - 1})
  GROUP BY node
), e{r} AS (
  SELECT e.a, e.b FROM e{r - 1} e
  JOIN d{r} da ON da.node = e.a
  JOIN d{r} db ON db.node = e.b
  WHERE da.deg >= {k} AND db.deg >= {k}
)""")
    parts.append(f"""
SELECT node AS doc_id, CAST(count(*) AS BIGINT) AS core_deg
FROM (SELECT a AS node FROM e{rounds} UNION ALL SELECT b AS node FROM e{rounds})
GROUP BY node""")
    return "".join(parts)


DOC_ORACLES["kcore"] = _kcore_sql()


def _labelprop_sql(rounds: int = 4) -> str:
    """Exact mirror of components.label_propagation: the jaccard_pairs
    edge CTE (same as kcore/triangle_count), bidirectional adjacency,
    then ``rounds`` unrolled synchronous votes — per node the most
    frequent neighbour label, ties to the smallest label (row_number
    over (cnt DESC, lbl ASC)). Fixed-round on both sides, so the match
    is by construction even pre-convergence."""
    parts = ["""
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text,' ')) AS toks,
         string_split(text,' ')[1] AS blk FROM documents
), e0 AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= 0.8
), adj AS (
  SELECT a AS node, b AS nbr FROM e0
  UNION ALL SELECT b, a FROM e0
), l0 AS (
  SELECT DISTINCT node, node AS lbl FROM adj
)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
c{r} AS (
  SELECT adj.node, l.lbl, count(*) AS cnt
  FROM adj JOIN l{r - 1} l ON l.node = adj.nbr
  GROUP BY adj.node, l.lbl
), l{r} AS (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node
                              ORDER BY cnt DESC, lbl ASC) AS rn
    FROM c{r}) WHERE rn = 1
)""")
    parts.append(f"""
SELECT node AS doc_id, CAST(lbl AS BIGINT) AS label FROM l{rounds}""")
    return "".join(parts)


DOC_ORACLES["label_propagation"] = _labelprop_sql()

DOC_ORACLES["pagerank"] = _pagerank_sql()


def _ppr_sql(iters: int = 8, seed_mod: int = 101) -> str:
    """Exact mirror of components.personalized_pagerank: pagerank's
    unrolled integer CTE chain with the restart/init mass on the seed
    set (doc_id % seed_mod == 0) — base = 15·(Q // |S|) // 100 for
    seeds, 0 elsewhere; r0 likewise."""
    q = 1 << 40
    steps = []
    for k in range(iters):
        steps.append(f"""
c{k} AS (
  SELECT e.dst AS doc_id, sum(r.r // e.deg) AS s
  FROM edges e JOIN r{k} r ON r.doc_id = e.src GROUP BY e.dst),
r{k + 1} AS (
  SELECT n.doc_id,
         CAST(CASE WHEN n.doc_id % {seed_mod} = 0
                   THEN (15 * ({q} // p.ns)) // 100 ELSE 0 END
              + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS r
  FROM nodes n CROSS JOIN params p
  LEFT JOIN c{k} c ON c.doc_id = n.doc_id)""")
    return f"""
WITH nodes AS (SELECT doc_id FROM documents),
params AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN doc_id % {seed_mod} = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS ns
  FROM nodes),
eraw AS (
  SELECT doc_id AS src, doc_id // 2 AS dst FROM documents WHERE doc_id > 0
  UNION
  SELECT doc_id, (doc_id * doc_id + 1) % p.n FROM documents, params p),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM eraw GROUP BY src),
edges AS (SELECT e.src, e.dst, d.deg FROM eraw e JOIN deg d USING (src)),
r0 AS (SELECT doc_id,
              CAST(CASE WHEN doc_id % {seed_mod} = 0
                   THEN {q} // p.ns ELSE 0 END AS BIGINT) AS r
       FROM nodes, params p),{",".join(steps)}
SELECT doc_id, r AS ppr_q FROM r{iters}
"""


DOC_ORACLES["personalized_pagerank"] = _ppr_sql()


def _harmonic_sql(sources=(0, 1, 2, 3)) -> str:
    """Exact mirror of components.harmonic_centrality: one recursive
    min-distance walk per sample source (the diameter_estimate
    machinery, depth bounded by node count), contributions
    floor-quantized to ⌊2^20/d⌋ before the order-free sum."""
    walks, joins, terms = [], [], []
    for i, s in enumerate(sources):
        walks.append(f"""
w{i} AS (
  SELECT {s} AS node, 0 AS d
  UNION
  SELECT e.t, w.d + 1 FROM w{i} w JOIN e ON e.s = w.node
  WHERE w.d < (SELECT c FROM nb)),
c{i} AS MATERIALIZED (
  SELECT node, 1048576 // min(d) AS v FROM w{i}
  GROUP BY node HAVING min(d) > 0)""")
        joins.append(f" LEFT JOIN c{i} ON c{i}.node = doc.doc_id")
        terms.append(f"coalesce(c{i}.v, 0)")
    return f"""
WITH RECURSIVE nb AS (SELECT CAST(count(*) AS BIGINT) AS c
                      FROM documents),
e AS MATERIALIZED (
  SELECT doc_id AS s, doc_id // 2 AS t FROM documents WHERE doc_id > 0
  UNION
  SELECT doc_id, (doc_id * doc_id + 1) % (SELECT c FROM nb)
  FROM documents),{",".join(walks)}
SELECT doc.doc_id,
       CAST({" + ".join(terms)} AS BIGINT) AS harm_q20
FROM documents doc{"".join(joins)}
"""


DOC_ORACLES["harmonic_centrality"] = _harmonic_sql()


def _kmeans_assign_ctes(sf_dir: str, nlist: int) -> str:
    """The shared assignment CTE chain: trained centroids embedded as
    literals → per-vector dot products → argmax cluster in ``asgn``."""
    from .simsearch import train_centroids

    C = train_centroids(sf_dir, nlist)
    values = ",".join(
        "(%d,%d,%r)" % (c, i, C[c, i])
        for c in range(C.shape[0]) for i in range(C.shape[1]))
    return f"""
WITH cents(c, i, w) AS (VALUES {values}),
e AS (
  SELECT vec_id, unnest(embedding) AS x,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
),
sims AS (
  SELECT e.vec_id, cents.c, sum(CAST(e.x AS DOUBLE) * cents.w) AS s
  FROM e JOIN cents ON cents.i = e.i - 1
  GROUP BY e.vec_id, cents.c
),
asgn AS (
  SELECT vec_id, c AS cluster FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c) AS rk
    FROM sims) WHERE rk = 1
)"""


def _kmeans_sql(sf_dir: str = "/root/testdata/sf0.01",
                nlist: int = 64) -> str:
    """Exact SQL mirror of simsearch.kmeans_clusters GIVEN the trained
    quantizer (embedded as literals, same caveats as _ivf_sql: the
    artifact is sf0.01-specific; other scales rely on the determinism
    and local-recompute tests)."""
    return _kmeans_assign_ctes(sf_dir, nlist) + """
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM asgn
"""


def _semantic_dedup_sql(sf_dir: str = "/root/testdata/sf0.01",
                        threshold: float = 0.4, nlist: int = 64) -> str:
    """Exact SQL mirror of dedup.semantic_dedup: the shared quantizer
    assignment, then drop every vector with an earlier (lower vec_id)
    cluster-mate at cosine >= threshold (list_cosine_similarity, the
    same kernel the embedding_near_dup oracle hash-matches with)."""
    return _kmeans_assign_ctes(sf_dir, nlist) + f"""
SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster
FROM asgn a JOIN embeddings ea ON ea.vec_id = a.vec_id
WHERE NOT EXISTS (
  SELECT 1 FROM asgn b JOIN embeddings eb ON eb.vec_id = b.vec_id
  WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
    AND list_cosine_similarity(ea.embedding, eb.embedding) >= {threshold})
"""


def _pq_codes_sql(sf_dir: str = "/root/testdata/sf0.01",
                  m: int = 8, ksub: int = 16) -> str:
    """Exact SQL mirror of simsearch.pq_codes GIVEN the trained
    codebooks (embedded as literals; sf0.01-specific like _ivf_sql).
    argmin L2 replayed as argmax (x·c − ||c||²/2) with (score DESC, c)
    tie rank — the identical expression the engine evaluates."""
    from .simsearch import train_pq_codebooks

    CB = train_pq_codebooks(sf_dir, m=m, ksub=ksub)
    sd = CB.shape[2]
    hn = 0.5 * (CB ** 2).sum(axis=2)
    cb_vals = ",".join(
        "(%d,%d,%d,%r)" % (mi, c, mi * sd + i, CB[mi, c, i])
        for mi in range(m) for c in range(ksub) for i in range(sd))
    hn_vals = ",".join("(%d,%d,%r)" % (mi, c, hn[mi, c])
                       for mi in range(m) for c in range(ksub))
    return f"""
WITH cb(m, c, i, w) AS (VALUES {cb_vals}),
hn(m, c, n2) AS (VALUES {hn_vals}),
e AS (
  SELECT vec_id, unnest(embedding) AS x,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
),
sims AS (
  SELECT e.vec_id, cb.m, cb.c, sum(CAST(e.x AS DOUBLE) * cb.w) AS s
  FROM e JOIN cb ON cb.i = e.i - 1
  GROUP BY e.vec_id, cb.m, cb.c
)
SELECT vec_id, CAST(m AS BIGINT) AS m, CAST(c AS BIGINT) AS code FROM (
  SELECT s.vec_id, s.m, s.c,
         row_number() OVER (PARTITION BY s.vec_id, s.m
                            ORDER BY s.s - hn.n2 DESC, s.c) AS rk
  FROM sims s JOIN hn ON hn.m = s.m AND hn.c = s.c
) WHERE rk = 1
"""


try:
    DOC_ORACLES["kmeans_clusters"] = _kmeans_sql()
    DOC_ORACLES["semantic_dedup"] = _semantic_dedup_sql()
    DOC_ORACLES["pq_codes"] = _pq_codes_sql()
except OSError:
    pass


# exact replay of traindata.heavy_hitters: the Count-Min sketch cells
# (md5-u64 row hashes mod 1024, depth 4), the min-over-rows estimate per
# DISTINCT token, and the integer-permille threshold. CMS collisions —
# the sketch's only approximation — are deterministic and reproduced by
# the identical cell hash, so the estimates match bit-for-bit.
DOC_ORACLES["heavy_hitters"] = r"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), cnt AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt
), rws AS (
  SELECT unnest([0, 1, 2, 3]) AS r
), cells AS (
  SELECT rws.r AS r,
         CAST(('0x' || substr(md5(CAST(rws.r AS VARCHAR) || ':' || tok),
                              1, 16))::UBIGINT % 1024 AS BIGINT) AS col,
         CAST(sum(c) AS BIGINT) AS cell
  FROM cnt CROSS JOIN rws GROUP BY 1, 2
), est AS (
  SELECT t.tok, min(ce.cell) AS est
  FROM cnt t CROSS JOIN rws
  JOIN cells ce ON ce.r = rws.r AND ce.col =
    CAST(('0x' || substr(md5(CAST(rws.r AS VARCHAR) || ':' || t.tok),
                         1, 16))::UBIGINT % 1024 AS BIGINT)
  GROUP BY t.tok
)
SELECT e.tok, CAST(e.est AS BIGINT) AS est
FROM est e, tot
WHERE e.est >= (tot.n * 34 + 999) // 1000
"""

# exact replay of traindata.hll_distinct (p=8, 3-token shingles): md5-u64
# shingle hashes, register j = top 8 bits, rho = leading zeros of the
# 56-bit remainder + 1 (bit length via an exact power-of-two join, never
# float log2), elementwise-max registers, and the estimator in exact
# integer arithmetic — harmonic sum as HUGEINT sum of 2^(64-Mj), alpha
# as the rational 7213*256000/(10^4*257079); the linear-counting branch
# shares libm ln on an exactly-rounded m/V.
DOC_ORACLES["hll_distinct"] = r"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), pos AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
  FROM toks WHERE len(t) >= 3
), h AS (
  SELECT DISTINCT ('0x' || substr(md5(array_to_string(t[i:i+2], ' ')),
                                  1, 16))::UBIGINT AS h
  FROM pos
), reg AS (
  SELECT CAST(h >> 56 AS BIGINT) AS j,
         h & CAST(72057594037927935 AS UBIGINT) AS v
  FROM h
), pw AS (
  SELECT p, CAST(1 AS UBIGINT) << CAST(p AS INTEGER) AS tp
  FROM range(0, 56) t(p)
), bl AS (
  SELECT reg.j, reg.v, coalesce(max(pw.p) + 1, 0) AS bitlen
  FROM reg LEFT JOIN pw ON reg.v >= pw.tp
  GROUP BY reg.j, reg.v
), rho AS (
  SELECT j, max(57 - bitlen) AS mj FROM bl GROUP BY j
), regs AS (
  SELECT r.j, coalesce(rho.mj, 0) AS mj
  FROM range(0, 256) r(j) LEFT JOIN rho ON rho.j = r.j
), agg AS (
  SELECT sum(CAST('18446744073709551616' AS HUGEINT)
             // (CAST(1 AS UBIGINT) << CAST(mj AS INTEGER))) AS s,
         CAST(sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros
  FROM regs
), raw AS (
  SELECT zeros,
         CAST('2232315375841361980711845756928000' AS HUGEINT)
           // (CAST(2570790000 AS HUGEINT) * s) AS est
  FROM agg
)
SELECT CAST(256 AS BIGINT) AS m,
       zeros AS zero_registers,
       CAST(CASE WHEN est * 2 <= 1280 AND zeros > 0
                 THEN CAST(floor(256.0 * ln(256.0 / zeros)) AS HUGEINT)
                 ELSE est END AS BIGINT) AS est_distinct
FROM raw
"""

# composed RAG retrieval: chunk → integer feature-hashing embedding →
# exact-int-dot top-k over other-document chunks. Dense pair space via
# CROSS JOIN + LEFT JOIN so zero-overlap pairs (dot=0) rank identically
# to the engine, which scores EVERY candidate.
DOC_ORACLES["hash_embed_retrieval"] = r"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), c AS (
  SELECT doc_id, toks, len(toks) AS n,
         greatest(1, CAST(ceil((len(toks) - 8) / 56.0) AS BIGINT)) AS k
  FROM t
), ch AS (
  SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         list_slice(toks, chunk_id * 56 + 1,
                    least(chunk_id * 56 + 64, n)) AS ctoks
  FROM (SELECT doc_id, toks, n,
               unnest(generate_series(0, k - 1)) AS chunk_id
        FROM c)
), hh AS (
  SELECT doc_id, chunk_id,
         ('0x' || substr(md5(tk), 1, 16))::UBIGINT AS h
  FROM (SELECT doc_id, chunk_id, unnest(ctoks) AS tk FROM ch)
), sp AS (
  SELECT doc_id, chunk_id, CAST(h % 16 AS BIGINT) AS j,
         sum(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS val
  FROM hh GROUP BY doc_id, chunk_id, j
), pairs AS (
  SELECT q.doc_id AS q_doc, q.chunk_id AS q_chunk,
         a.doc_id AS n_doc, a.chunk_id AS n_chunk
  FROM ch q JOIN ch a ON a.doc_id != q.doc_id
  WHERE q.doc_id % 97 = 0
), d0 AS (
  SELECT q.doc_id AS q_doc, q.chunk_id AS q_chunk,
         s.doc_id AS n_doc, s.chunk_id AS n_chunk,
         CAST(sum(q.val * s.val) AS BIGINT) AS dot
  FROM sp q JOIN sp s ON q.j = s.j AND s.doc_id != q.doc_id
  WHERE q.doc_id % 97 = 0
  GROUP BY q.doc_id, q.chunk_id, s.doc_id, s.chunk_id
), dots AS (
  SELECT p.q_doc, p.q_chunk, p.n_doc, p.n_chunk,
         COALESCE(d0.dot, 0) AS dot
  FROM pairs p LEFT JOIN d0 ON d0.q_doc = p.q_doc
   AND d0.q_chunk = p.q_chunk AND d0.n_doc = p.n_doc
   AND d0.n_chunk = p.n_chunk
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_doc, q_chunk
             ORDER BY dot DESC, n_doc, n_chunk) AS rank
  FROM dots
)
SELECT q_doc, q_chunk, n_doc, n_chunk, CAST(dot AS BIGINT) AS dot,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""

# grouped HLL: COUNT(DISTINCT user) GROUP BY event_type as a mergeable
# sketch — identical register/estimator replay to hll_distinct, per group
DOC_ORACLES["hll_user_counts"] = r"""
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT
           AS h
  FROM events
), reg AS (
  SELECT event_type, CAST(h >> 56 AS BIGINT) AS j,
         h & CAST(72057594037927935 AS UBIGINT) AS v
  FROM h
), pw AS (
  SELECT p, CAST(1 AS UBIGINT) << CAST(p AS INTEGER) AS tp
  FROM range(0, 56) t(p)
), bl AS (
  SELECT reg.event_type, reg.j, reg.v,
         coalesce(max(pw.p) + 1, 0) AS bitlen
  FROM reg LEFT JOIN pw ON reg.v >= pw.tp
  GROUP BY reg.event_type, reg.j, reg.v
), rho AS (
  SELECT event_type, j, max(57 - bitlen) AS mj
  FROM bl GROUP BY event_type, j
), types AS (SELECT DISTINCT event_type FROM events),
regs AS (
  SELECT t.event_type, r.j, coalesce(rho.mj, 0) AS mj
  FROM types t CROSS JOIN range(0, 256) r(j)
  LEFT JOIN rho ON rho.event_type = t.event_type AND rho.j = r.j
), agg AS (
  SELECT event_type,
         sum(CAST('18446744073709551616' AS HUGEINT)
             // (CAST(1 AS UBIGINT) << CAST(mj AS INTEGER))) AS s,
         CAST(sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros
  FROM regs GROUP BY event_type
), raw AS (
  SELECT event_type, zeros,
         CAST('2232315375841361980711845756928000' AS HUGEINT)
           // (CAST(2570790000 AS HUGEINT) * s) AS est
  FROM agg
)
SELECT event_type, CAST(256 AS BIGINT) AS m,
       zeros AS zero_registers,
       CAST(CASE WHEN est * 2 <= 1280 AND zeros > 0
                 THEN CAST(floor(256.0 * ln(256.0 / zeros)) AS HUGEINT)
                 ELSE est END AS BIGINT) AS est_distinct
FROM raw
"""

# exact mirror of traindata.shard_corpus (seed=42, shard_size=100):
# md5(seed:doc_id) global order, row_number rank, fixed-size shard cut
DOC_ORACLES["shard_corpus"] = r"""
WITH k AS (
  SELECT doc_id,
         ('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)),
                         1, 16))::UBIGINT AS key
  FROM documents
), r AS (
  SELECT doc_id, row_number() OVER (ORDER BY key, doc_id) - 1 AS rk
  FROM k
)
SELECT doc_id, CAST(rk // 100 AS BIGINT) AS shard,
       CAST(rk % 100 AS BIGINT) AS pos
FROM r
"""


def _bpe_chain(num_merges: int, walk_through_last: bool) -> str:
    """The shared unrolled-BPE CTE chain (vocabulary, per-round pair
    counts p{k}, argmax b{k}, recursive greedy merge walks w{k}) used by
    both the bpe_train and bpe_encode oracles. With
    ``walk_through_last`` the chain also applies the LAST learned merge,
    ending at w{num_merges} (what bpe_encode tokenizes with)."""
    parts = ["""
WITH RECURSIVE vocab AS (
  SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
), w0 AS (
  SELECT word, freq,
         list_transform(generate_series(1, len(word)),
                        i -> substr(word, i, 1)) AS seq
  FROM vocab
)"""]
    for k in range(1, num_merges + 1):
        prev = "w%d" % (k - 1)
        parts.append(f""", p{k} AS (
  SELECT seq[i] AS l, seq[i+1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
  FROM {prev}, unnest(generate_series(1, len(seq) - 1)) t(i)
  GROUP BY 1, 2
), b{k} AS (
  SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1
)""")
        if k < num_merges or walk_through_last:
            parts.append(f""", walk{k}(word, freq, seq, i, out) AS (
  SELECT word, freq, seq, 1, CAST([] AS VARCHAR[]) FROM {prev}
  UNION ALL
  SELECT word, freq, seq, i + CASE WHEN hit THEN 2 ELSE 1 END,
         list_append(out, CASE WHEN hit THEN seq[i] || seq[i+1]
                               ELSE seq[i] END)
  FROM (SELECT w.*, (w.i < len(w.seq) AND w.seq[w.i] = b.l
                     AND w.seq[w.i+1] = b.r) AS hit
        FROM walk{k} w CROSS JOIN b{k} b) t
  WHERE i <= len(seq)
), w{k} AS (
  SELECT word, freq, out AS seq FROM walk{k} WHERE i > len(seq)
)""")
    return "".join(parts)


def _bpe_sql(num_merges: int = 4) -> str:
    """Unrolled replay of traindata.bpe_train: word-frequency vocabulary,
    per-round adjacent-pair counts over the evolving symbol sequences,
    argmax with the (cnt DESC, l, r) tie rule, and a recursive-CTE
    greedy left-to-right merge walk per round (the exact `_bpe_apply`
    semantics — pinned equivalent by tests/test_ops.py)."""
    sel = "\nUNION ALL ".join(
        "SELECT CAST(%d AS BIGINT) AS rnd, l, r, cnt AS freq FROM b%d"
        % (k, k) for k in range(1, num_merges + 1))
    return _bpe_chain(num_merges, walk_through_last=False) + "\n" + sel


def _bpe_encode_sql(num_merges: int = 4) -> str:
    """Replay of traindata.bpe_encode: the same trained merge chain
    applied THROUGH the last merge (w{K}), then every document's words
    joined to their final symbol-sequence lengths."""
    return _bpe_chain(num_merges, walk_through_last=True) + f"""
, wl AS (
  SELECT word, CAST(len(seq) AS BIGINT) AS n FROM w{num_merges}
), dt AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(wl.n) AS BIGINT) AS n_bpe_tokens
FROM dt d JOIN wl USING (word)
GROUP BY d.doc_id
"""


DOC_ORACLES["bpe_train"] = _bpe_sql()
DOC_ORACLES["bpe_encode"] = _bpe_encode_sql()


# exact replay of traindata.decontaminate_bloom: the holdout shingles'
# bloom bit positions (md5, 2 hash fns, 2^16 bits), then per train doc
# the count of DISTINCT shingles whose every position is set — the
# filter's deterministic false positives included
DOC_ORACLES["decontaminate_bloom"] = r"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), pos AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
  FROM toks WHERE len(t) >= 5
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
  FROM pos
), hs AS (
  SELECT unnest([0, 1]) AS h
), bits AS (
  SELECT DISTINCT
    CAST(('0x' || substr(md5(CAST(hs.h AS VARCHAR) || ':' || s.shingle),
                         1, 16))::UBIGINT % 65536 AS BIGINT) AS p
  FROM (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 7) s
  CROSS JOIN hs
), flagged AS (
  SELECT s.doc_id, s.shingle
  FROM sh s
  WHERE s.doc_id % 50 <> 7 AND NOT EXISTS (
    SELECT 1 FROM hs
    WHERE CAST(('0x' || substr(md5(CAST(hs.h AS VARCHAR) || ':'
                               || s.shingle), 1, 16))::UBIGINT
               % 65536 AS BIGINT) NOT IN (SELECT p FROM bits)
  )
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bloom_hits
FROM flagged GROUP BY doc_id
"""


# exact mirror of events.running_totals: per-event integer quantization
# (floor(100*value) — one exactly-rounded float64 multiply on both
# sides) makes the running sum association-free, so DuckDB's window
# aggregate and the engine's vectorized cumsum agree bit-for-bit
DOC_ORACLES["running_totals"] = """
SELECT event_id, user_id,
       CAST(sum(CAST(floor(100 * value) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS BIGINT) AS cum_value_q2
FROM events
"""

# exact mirror of textops.rollup_stats: GROUP BY ROLLUP with the same
# '*' sentinel for subtotal slots
DOC_ORACLES["rollup_stats"] = """
SELECT coalesce(lang, '*') AS lang, coalesce(source, '*') AS source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM documents GROUP BY ROLLUP(lang, source)
"""


# exact replay of multimodal.wav_pcm_stats: the synthesized PCM16 stream
# is the document's UTF-8 bytes (ASCII corpus → chars are the bytes)
# zero-padded to a whole sample; sample i = b(2i) + 256*b(2i+1) signed
DOC_ORACLES["wav_pcm_stats"] = """
WITH ch AS (
  SELECT doc_id, text, len(text) AS n,
         unnest(generate_series(1, (len(text) + 1) // 2)) AS i
  FROM documents
), smp AS (
  SELECT doc_id,
         ascii(substr(text, 2*i - 1, 1))
         + 256 * (CASE WHEN 2*i <= n THEN ascii(substr(text, 2*i, 1))
                       ELSE 0 END) AS x
  FROM ch
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(CASE WHEN x < 32768 THEN x ELSE 65536 - x END)
            AS BIGINT) AS amp_sum
FROM smp GROUP BY doc_id
"""


# exact mirror of events.range_join_counts: LEFT band self-join on
# (user, ts in [p.ts - 60 min, p.ts)), microsecond-exact on both sides
DOC_ORACLES["range_join_counts"] = """
SELECT p.event_id, CAST(count(v.event_id) AS BIGINT) AS n_right_in_window
FROM events p LEFT JOIN events v
  ON v.user_id = p.user_id AND v.event_type = 'view'
 AND v.ts < p.ts AND v.ts >= p.ts - INTERVAL 60 MINUTE
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
"""


# exact mirror of textops.freq_spectrum: count-of-counts over the
# token-frequency table (the Good–Turing N_k input)
DOC_ORACLES["freq_spectrum"] = """
WITH cnt AS (
  SELECT tok, count(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
)
SELECT CAST(c AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_types
FROM cnt GROUP BY c
"""


# relational.local_supplier_volume (TPC-H Q5 shape): six-table join,
# revenue quantized per line item with the shipping_priority rule so
# the BIGINT sum is order-independent
DOC_ORACLES["local_supplier_volume"] = """
SELECT n_name,
       CAST(sum(CAST(floor(100.0 * (l_extendedprice
             * (1.0 - l_discount))) AS BIGINT)) AS BIGINT) AS revenue_q2
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY n_name
"""


# textops.dedup_substrings (Lee et al. exact-substring rewrite): drop
# every token position covered by a length-8 window whose text occurs
# >=2 times corpus-wide; rebuild the text from the survivors. 1-based
# positions throughout; fully-covered docs keep an empty string via the
# LEFT JOIN (mirroring the engine's reindex-fill)
DOC_ORACLES["dedup_substrings"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
w AS (
  SELECT doc_id, i AS s, array_to_string(t[i:i+7], ' ') AS w
  FROM (SELECT doc_id, t,
               unnest(generate_series(1, len(t) - 7)) AS i FROM toks)),
cnt AS (SELECT w FROM w GROUP BY w HAVING count(*) >= 2),
cov AS (
  SELECT DISTINCT w.doc_id, w.s + o.o AS i
  FROM w JOIN cnt USING (w)
  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS o) AS o),
tok AS (
  SELECT doc_id, unnest(t) AS tok,
         unnest(generate_series(1, len(t))) AS i
  FROM toks),
kept AS (
  SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.i) AS txt
  FROM tok t ANTI JOIN cov c ON (t.doc_id = c.doc_id AND t.i = c.i)
  GROUP BY t.doc_id)
SELECT d.doc_id, coalesce(k.txt, '') AS text_dedup
FROM documents d LEFT JOIN kept k USING (doc_id)
"""


# first-order Markov transition counts over each user's time-ordered
# stream; (ts, event_id) is the shared deterministic total order
DOC_ORACLES["markov_transitions"] = """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events)
SELECT prev_type, event_type AS next_type,
       CAST(count(*) AS BIGINT) AS n
FROM s WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""


# market-basket co-occurrence: part pairs bought together in >= 2
# distinct orders
DOC_ORACLES["cooccurrence_pairs"] = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       CAST(count(*) AS BIGINT) AS n_orders
FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey < b.l_partkey
GROUP BY part_a, part_b
HAVING count(*) >= 2
"""


# TPC-H Q4 shape: EXISTS(line item shipped > 60 days after order date),
# rewritten on the engine side as a per-order MAX semi-join
DOC_ORACLES["late_orders_by_priority"] = """
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_late
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
"""


# TPC-H Q22 shape: above-positive-average balance + NOT EXISTS order,
# regrouped by nation; cents via floor(100x+0.5), threshold multiplied
# out (bal·n > sum) so the comparison is pure integer
DOC_ORACLES["no_orders_customers"] = """
WITH q AS (
  SELECT c_custkey, c_nationkey,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal
  FROM customer),
t AS (SELECT sum(bal) AS s, count(*) AS n FROM q WHERE bal > 0)
SELECT CAST(q.c_nationkey AS BIGINT) AS nationkey,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(q.bal) AS BIGINT) AS sum_bal_q2
FROM q, t
WHERE q.bal * t.n > t.s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = q.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-06-01')
GROUP BY q.c_nationkey
"""


# TPC-H Q15 shape: max-of-aggregate and the suppliers achieving it, in
# exact integer revenue units cents·(100−disc%)
DOC_ORACLES["top_supplier"] = """
WITH rev AS (
  SELECT l_suppkey AS k,
         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
         AS rev
  FROM lineitem GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name,
       CAST(r.rev AS BIGINT) AS total_revenue_u
FROM supplier s JOIN rev r ON r.k = s.s_suppkey
WHERE r.rev = (SELECT max(rev) FROM rev)
"""


# per-part argmax-of-aggregate: the supplier shipping the most total
# quantity, ties to the smaller suppkey
DOC_ORACLES["top_supplier_per_part"] = """
WITH g AS (
  SELECT l_partkey AS p, l_suppkey AS s,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY l_partkey, l_suppkey),
r AS (
  SELECT p, s, q,
         row_number() OVER (PARTITION BY p ORDER BY q DESC, s) AS rn
  FROM g)
SELECT p AS p_partkey, s AS top_suppkey, q AS total_qty
FROM r WHERE rn = 1
"""

# TPC-H Q14 shape: PROMO revenue share in exact integer units; the
# ratio floor-divides non-negative integers so both engines agree
DOC_ORACLES["promo_revenue"] = """
WITH rev AS (
  SELECT l.l_partkey,
         sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
         AS rev
  FROM lineitem l GROUP BY l.l_partkey),
j AS (
  SELECT r.rev, (p.p_type LIKE 'PROMO%') AS is_promo
  FROM rev r JOIN part p ON p.p_partkey = r.l_partkey),
s AS (
  SELECT CAST(sum(CASE WHEN is_promo THEN rev ELSE 0 END) AS BIGINT)
           AS promo_rev_u,
         CAST(sum(rev) AS BIGINT) AS total_rev_u
  FROM j)
SELECT promo_rev_u, total_rev_u,
       CAST(1000000 * promo_rev_u // total_rev_u AS BIGINT)
         AS promo_ratio_q6
FROM s
"""


# TPC-H Q16 shape: distinct acceptable suppliers per (brand, size),
# NOT IN the negative-balance exclusion list
DOC_ORACLES["parts_supplier_counts"] = """
SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_size
"""


# OLS from integer sufficient statistics; token count = spaces + 1;
# HUGEINT keeps the normal-equation products exact, // truncates in
# both engines (the Python side sign-splits to match)
DOC_ORACLES["linreg_tokens"] = """
WITH s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(n_chars) AS HUGEINT) AS sx,
         CAST(sum(length(text) - length(replace(text, ' ', '')) + 1)
              AS HUGEINT) AS sy,
         CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT)
           AS sxx,
         CAST(sum(CAST(n_chars AS HUGEINT)
                  * (length(text) - length(replace(text, ' ', '')) + 1))
              AS HUGEINT) AS sxy
  FROM documents)
SELECT CAST(n AS BIGINT) AS n_docs, CAST(sx AS BIGINT) AS sx,
       CAST(sy AS BIGINT) AS sy, CAST(sxx AS BIGINT) AS sxx,
       CAST(sxy AS BIGINT) AS sxy,
       CAST(1000000 * (n * sxy - sx * sy)
            // (n * sxx - sx * sx) AS BIGINT) AS slope_q6,
       CAST(1000000 * (sy * sxx - sx * sxy)
            // (n * sxx - sx * sx) AS BIGINT) AS intercept_q6
FROM s
"""


# tokenizer coverage: OOV rate of the odd-doc_id split against the
# even-doc_id vocabulary, per lang
DOC_ORACLES["oov_rate"] = """
WITH tr AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE doc_id % 2 = 0),
ev AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE doc_id % 2 = 1),
g AS (
  SELECT e.lang, count(*) AS n_tokens,
         sum(CASE WHEN t.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM ev e LEFT JOIN tr t ON t.tok = e.tok
  GROUP BY e.lang)
SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_oov AS BIGINT) AS n_oov,
       CAST(1000000 * n_oov // n_tokens AS BIGINT) AS oov_q6
FROM g
"""


# multinomial Naive Bayes language ID replayed end-to-end in SQL:
# train counts on the even split, score the odd split with
# floor(1e6·ln(·)) integer logs (shared libm — dsir precedent), ties
# to the lexicographically smallest lang
DOC_ORACLES["naive_bayes_langid"] = """
WITH tr AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE doc_id % 2 = 0),
cnt AS (SELECT lang, tok, count(*) AS n FROM tr GROUP BY lang, tok),
tot AS (SELECT lang, count(*) AS tot FROM tr GROUP BY lang),
voc AS (SELECT count(DISTINCT tok) AS v FROM tr),
pri AS (SELECT lang, count(*) AS nd FROM documents
        WHERE doc_id % 2 = 0 GROUP BY lang),
ev AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE doc_id % 2 = 1),
evc AS (SELECT doc_id, tok, count(*) AS n FROM ev
        GROUP BY doc_id, tok),
sc AS (
  SELECT e.doc_id, t.lang,
         sum(e.n * (CAST(floor(1000000 * ln(coalesce(c.n, 0) + 1))
                         AS BIGINT)
                    - CAST(floor(1000000 * ln(t.tot + v.v)) AS BIGINT)))
           AS s
  FROM evc e
  CROSS JOIN tot t CROSS JOIN voc v
  LEFT JOIN cnt c ON c.lang = t.lang AND c.tok = e.tok
  GROUP BY e.doc_id, t.lang),
fin AS (
  SELECT s.doc_id, s.lang,
         s.s + CAST(floor(1000000 * ln(p.nd)) AS BIGINT) AS score
  FROM sc s JOIN pri p ON p.lang = s.lang),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang) AS rn
  FROM fin)
SELECT doc_id, lang AS nb_pred FROM r WHERE rn = 1
"""


# multi-source BFS over the symmetrized exact k-NN graph (the knn_graph
# edge CTE verbatim); the walk bound 16 dominates the true eccentricity
# (engine asserts convergence within the same bound), so min(d) is the
# exact hop distance
DOC_ORACLES["bfs_distances"] = """
WITH RECURSIVE s AS (
  SELECT a.vec_id AS vid, b.vec_id AS nid,
         list_cosine_similarity(a.embedding, b.embedding) AS sim
  FROM embeddings a, embeddings b WHERE a.vec_id != b.vec_id),
r AS (
  SELECT vid, nid,
         row_number() OVER (PARTITION BY vid
                            ORDER BY sim DESC, nid) AS rk
  FROM s),
e AS (
  SELECT vid AS a, nid AS b FROM r WHERE rk <= 5
  UNION
  SELECT nid AS a, vid AS b FROM r WHERE rk <= 5),
walk AS (
  SELECT vec_id AS node, 0 AS d FROM embeddings WHERE vec_id % 97 = 0
  UNION
  SELECT e.b AS node, w.d + 1 AS d
  FROM walk w JOIN e ON e.a = w.node WHERE w.d < 16)
SELECT node AS vec_id, CAST(min(d) AS BIGINT) AS dist
FROM walk GROUP BY node
"""


# 2-D skyline (Pareto frontier): minimize price, maximize size; equal
# points are mutually non-dominating
DOC_ORACLES["skyline_parts"] = """
WITH q AS (
  SELECT p_partkey,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_q2,
         CAST(p_size AS BIGINT) AS p_size
  FROM part)
SELECT a.p_partkey, a.price_q2, a.p_size
FROM q a
WHERE NOT EXISTS (
  SELECT 1 FROM q b
  WHERE b.price_q2 <= a.price_q2 AND b.p_size >= a.p_size
    AND (b.price_q2 < a.price_q2 OR b.p_size > a.p_size))
"""


# ordered collect_list: each user's full event-type journey
DOC_ORACLES["user_paths"] = """
SELECT user_id,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
"""


# exact per-lang RANK by length, computed without a global sort
DOC_ORACLES["doc_rank_by_length"] = """
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(rank() OVER (PARTITION BY lang ORDER BY n_chars)
            AS BIGINT) AS rnk,
       CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
FROM documents
"""


# vector-column GROUP BY: per-label component sums of floor(1024·x)
# quantized embeddings (exact integers; centroid = sum_q / n)
DOC_ORACLES["label_centroids"] = """
WITH x AS (
  SELECT label, embedding,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings)
SELECT CAST(label AS BIGINT) AS label,
       CAST(i - 1 AS BIGINT) AS dim,
       CAST(sum(CAST(floor(1024.0 * CAST(embedding[i] AS DOUBLE))
                     AS BIGINT)) AS BIGINT) AS sum_q,
       CAST(count(*) AS BIGINT) AS n
FROM x GROUP BY label, i
"""


# schema profiling of orders: per-column rows / nulls / exact distinct
DOC_ORACLES["profile_columns"] = """
SELECT 'o_custkey' AS col, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_null,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
FROM orders
UNION ALL SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(count(DISTINCT o_orderdate) AS BIGINT) FROM orders
UNION ALL SELECT 'o_orderkey', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders
UNION ALL SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM orders
UNION ALL SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders
UNION ALL SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(count(DISTINCT o_totalprice) AS BIGINT) FROM orders
"""


# odd-cycle diagnostic: BFS-parity 2-coloring conflicts over the
# symmetrized k-NN graph (composes the bfs_distances walk CTE)
DOC_ORACLES["bipartite_conflicts"] = """
WITH RECURSIVE s AS (
  SELECT a.vec_id AS vid, b.vec_id AS nid,
         list_cosine_similarity(a.embedding, b.embedding) AS sim
  FROM embeddings a, embeddings b WHERE a.vec_id != b.vec_id),
r AS (
  SELECT vid, nid,
         row_number() OVER (PARTITION BY vid
                            ORDER BY sim DESC, nid) AS rk
  FROM s),
e AS (
  SELECT vid AS a, nid AS b FROM r WHERE rk <= 5
  UNION
  SELECT nid AS a, vid AS b FROM r WHERE rk <= 5),
walk AS (
  SELECT vec_id AS node, 0 AS d FROM embeddings WHERE vec_id % 97 = 0
  UNION
  SELECT e.b AS node, w.d + 1 AS d
  FROM walk w JOIN e ON e.a = w.node WHERE w.d < 16),
dist AS (
  SELECT node, min(d) AS d FROM walk GROUP BY node),
und AS (
  SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM e)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(CASE WHEN da.d % 2 = db.d % 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_conflicts
FROM und u
LEFT JOIN dist da ON da.node = u.a
LEFT JOIN dist db ON db.node = u.b
"""


# Welch two-sample z between user_id-parity arms from six integer
# sufficient statistics; the float tree order mirrors events.py
# literally so floor(1e6·z) is bit-portable
DOC_ORACLES["ab_test_zstat"] = """
WITH c AS (
  SELECT user_id % 2 = 0 AS arm_a,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
s AS (
  SELECT CAST(sum(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm_a THEN cents ELSE 0 END) AS BIGINT)
           AS s1_a,
         CAST(sum(CASE WHEN arm_a THEN cents * cents ELSE 0 END)
              AS BIGINT) AS s2_a,
         CAST(sum(CASE WHEN arm_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN arm_a THEN 0 ELSE cents END) AS BIGINT)
           AS s1_b,
         CAST(sum(CASE WHEN arm_a THEN 0 ELSE cents * cents END)
              AS BIGINT) AS s2_b
  FROM c)
SELECT n_a, s1_a, s2_a, n_b, s1_b, s2_b,
       CAST(floor(1000000.0 * (
         (CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE)
          - CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE))
         / sqrt(
             ((CAST(s2_a AS DOUBLE)
               - CAST(s1_a AS DOUBLE) * CAST(s1_a AS DOUBLE)
                 / CAST(n_a AS DOUBLE)) / CAST(n_a - 1 AS DOUBLE))
             / CAST(n_a AS DOUBLE)
             + ((CAST(s2_b AS DOUBLE)
                 - CAST(s1_b AS DOUBLE) * CAST(s1_b AS DOUBLE)
                   / CAST(n_b AS DOUBLE)) / CAST(n_b - 1 AS DOUBLE))
             / CAST(n_b AS DOUBLE)))) AS BIGINT) AS z_q6
FROM s
"""


# watermark / late-data accounting over a deterministic md5 arrival
# permutation: watermark = running max event time over strictly
# earlier arrivals; late when trailing it by > 300 s
DOC_ORACLES["late_events"] = """
WITH a AS (
  SELECT event_type, epoch_us(ts) AS us,
         ('0x' || substr(md5('arr:' || CAST(event_id AS VARCHAR)),
                         1, 16))::UBIGINT AS k,
         event_id
  FROM events),
w AS (
  SELECT event_type, us,
         max(us) OVER (ORDER BY k, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS wm
  FROM a)
SELECT event_type,
       CAST(sum(CASE WHEN us < wm - 300000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late,
       CAST(count(*) AS BIGINT) AS n_total
FROM w GROUP BY event_type
"""


# relational DIVISION (FOR ALL): tokens present in every language
DOC_ORACLES["division_tokens"] = """
WITH p AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok, lang
  FROM documents)
SELECT tok FROM p
GROUP BY tok
HAVING count(DISTINCT lang) = (SELECT count(DISTINCT lang)
                               FROM documents)
"""

# OLAP CUBE over (lang, source); '*' marks the rolled-up level
DOC_ORACLES["cube_stats"] = """
SELECT coalesce(lang, '*') AS lang, coalesce(source, '*') AS source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY CUBE (lang, source)
"""


# strongly connected components of the DIRECTED k-NN graph: mutual
# reachability via an unbounded (src,node)-pair closure (finite, UNION
# dedups), scc_id = min mutually-reachable node (self included)
DOC_ORACLES["scc"] = """
WITH RECURSIVE s AS (
  SELECT a.vec_id AS vid, b.vec_id AS nid,
         list_cosine_similarity(a.embedding, b.embedding) AS sim
  FROM embeddings a, embeddings b WHERE a.vec_id != b.vec_id),
r0 AS (
  SELECT vid, nid,
         row_number() OVER (PARTITION BY vid
                            ORDER BY sim DESC, nid) AS rk
  FROM s),
e AS (SELECT vid AS a, nid AS b FROM r0 WHERE rk <= 5),
reach AS (
  SELECT a AS src, b AS node FROM e
  UNION
  SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.node),
mutual AS (
  SELECT r1.src AS u, r1.node AS v
  FROM reach r1 JOIN reach r2
    ON r2.src = r1.node AND r2.node = r1.src),
allp AS (
  SELECT vec_id AS u, vec_id AS v FROM embeddings
  UNION ALL
  SELECT u, v FROM mutual)
SELECT u AS vec_id, CAST(min(v) AS BIGINT) AS scc_id
FROM allp GROUP BY u
"""


# TPC-H Q21 shape: sole late shipper on multi-supplier orders
DOC_ORACLES["wait_chain_suppliers"] = """
WITH l AS (
  SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
         max(l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2)
SELECT a.sk AS s_suppkey, CAST(count(*) AS BIGINT) AS n_orders
FROM l a
WHERE a.late
  AND EXISTS (SELECT 1 FROM l b WHERE b.ok = a.ok AND b.sk != a.sk)
  AND NOT EXISTS (SELECT 1 FROM l c
                  WHERE c.ok = a.ok AND c.sk != a.sk AND c.late)
GROUP BY a.sk
"""

# lag over an aggregate: day-over-day revenue change per event type
DOC_ORACLES["daily_type_delta"] = """
WITH d AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS rev
  FROM events GROUP BY 1, 2)
SELECT event_type, CAST(day AS BIGINT) AS day,
       CAST(rev AS BIGINT) AS rev_q2,
       CAST(rev - coalesce(lag(rev) OVER (PARTITION BY event_type
                                          ORDER BY day), rev)
            AS BIGINT) AS delta_q2
FROM d
"""


# hierarchy aggregation: transitive subtree sizes over the broader
# chain (composes the kg_broader_closure CTE)
DOC_ORACLES["kg_subtree_sizes"] = _ANC_CTE + """
SELECT a AS ancestor, CAST(count(*) AS BIGINT) AS n_descendants
FROM anc GROUP BY a
"""

# UNPIVOT/melt of the quality metrics into long form
DOC_ORACLES["unpivot_quality"] = """
SELECT doc_id, 'n_chars' AS metric,
       CAST(length(text) AS BIGINT) AS value FROM documents
UNION ALL
SELECT doc_id, 'n_tokens',
       CAST(len(string_split(text, ' ')) AS BIGINT) FROM documents
UNION ALL
SELECT doc_id, 'n_uniq_tokens',
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
FROM documents
"""


# string-similarity join: customer-name pairs within edit distance 1
# (engine: SymSpell deletion-neighborhood blocking + exact verify)
DOC_ORACLES["typo_pairs"] = """
WITH v AS (SELECT DISTINCT c_name AS n FROM customer)
SELECT a.n AS name_a, b.n AS name_b
FROM v a JOIN v b ON a.n < b.n AND levenshtein(a.n, b.n) <= 1
"""


# robust statistics: exact per-lang lower median + MAD of doc length
DOC_ORACLES["mad_chars"] = """
WITH m AS (
  SELECT lang, quantile_disc(n_chars, 0.5) AS med
  FROM documents GROUP BY lang)
SELECT d.lang, CAST(m.med AS BIGINT) AS median_chars,
       CAST(quantile_disc(abs(d.n_chars - m.med), 0.5) AS BIGINT)
         AS mad_chars
FROM documents d JOIN m ON m.lang = d.lang
GROUP BY d.lang, m.med
"""


# survivorship-policy dedup: per canonical form keep the LONGEST doc,
# ties to min doc_id (normalization mirrors dedup_normalized)
DOC_ORACLES["dedup_keep_best"] = """
WITH n AS (
  SELECT doc_id, n_chars,
    trim(regexp_replace(regexp_replace(lower(text),
                                       '[^a-z0-9 ]', ' ', 'g'),
                        ' +', ' ', 'g'), ' ') AS norm
  FROM documents),
r AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY norm
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM n)
SELECT doc_id FROM r WHERE rn = 1
"""


# winsorization to the exact [p05, p95] integer-cents band
DOC_ORACLES["winsorize_values"] = """
WITH c AS (
  SELECT event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
q AS (
  SELECT quantile_disc(cents, 0.05) AS plo,
         quantile_disc(cents, 0.95) AS phi
  FROM c)
SELECT c.event_id, c.cents AS value_q2,
       CAST(least(greatest(c.cents, q.plo), q.phi) AS BIGINT)
         AS value_wins_q2
FROM c, q
"""

# order-independent table fingerprints: sum of row md5-u64 mod 2^64,
# reduced mod 2^63 for a signed, hash-portable column
DOC_ORACLES["table_checksums"] = """
WITH o AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(('0x' || substr(md5(
                 CAST(o_orderkey AS VARCHAR) || '|' ||
                 CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                      AS VARCHAR)), 1, 16))::UBIGINT::HUGEINT)
              % 9223372036854775808 AS BIGINT) AS checksum
  FROM orders),
c AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(('0x' || substr(md5(
                 CAST(c_custkey AS VARCHAR) || '|' ||
                 CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                      AS VARCHAR)), 1, 16))::UBIGINT::HUGEINT)
              % 9223372036854775808 AS BIGINT) AS checksum
  FROM customer)
SELECT 'customer' AS tbl, n_rows, checksum FROM c
UNION ALL
SELECT 'orders', n_rows, checksum FROM o
"""


# exact Gini coefficient of event values from 1-based ascending ranks
# (tie order irrelevant to Σ i·xᵢ); pure integer, HUGEINT-safe
DOC_ORACLES["gini_values"] = """
WITH c AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
r AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents) AS rk
  FROM c),
s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(cents) AS HUGEINT) AS s,
         CAST(sum(CAST(rk AS HUGEINT) * cents) AS HUGEINT) AS sw
  FROM r)
SELECT CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS sum_q2,
       CAST((1000000 * (2 * sw - (n + 1) * s)) // (n * s) AS BIGINT)
         AS gini_q6
FROM s
"""


# exact per-type inter-arrival percentiles (gap since the same user's
# previous event of the same type)
DOC_ORACLES["interarrival_percentiles"] = """
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id, event_type
                 ORDER BY ts, event_id) AS gap
  FROM events)
SELECT event_type,
       CAST(quantile_disc(gap, 0.5) AS BIGINT) AS p50_us,
       CAST(quantile_disc(gap, 0.95) AS BIGINT) AS p95_us
FROM g WHERE gap IS NOT NULL
GROUP BY event_type
"""


# percent-of-total: each nation's revenue share in integer millionths
DOC_ORACLES["nation_revenue_share"] = """
WITH r AS (
  SELECT c.c_nationkey AS nat,
         sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey),
t AS (SELECT sum(rev) AS total FROM r)
SELECT n.n_name, CAST(r.rev AS BIGINT) AS rev_q2,
       CAST(1000000 * r.rev // t.total AS BIGINT) AS share_q6
FROM r JOIN nation n ON n.n_nationkey = r.nat, t
"""

# running COUNT(DISTINCT): daily new users (first-seen day) + the
# cumulative curve
DOC_ORACLES["cumulative_users_by_day"] = """
WITH f AS (
  SELECT user_id,
         min(epoch_us(ts) // 86400000000) AS day
  FROM events GROUP BY user_id),
d AS (
  SELECT day, count(*) AS n_new FROM f GROUP BY day)
SELECT CAST(day AS BIGINT) AS day, CAST(n_new AS BIGINT) AS n_new,
       CAST(sum(n_new) OVER (ORDER BY day
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_cumulative
FROM d
"""


# duplicate-group size spectrum (count-of-counts over the canonical
# form — dedup_normalized's normalization)
DOC_ORACLES["dup_group_spectrum"] = """
WITH n AS (
  SELECT trim(regexp_replace(regexp_replace(lower(text),
                                            '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g'), ' ') AS norm
  FROM documents),
g AS (SELECT count(*) AS group_size FROM n GROUP BY norm)
SELECT CAST(group_size AS BIGINT) AS group_size,
       CAST(count(*) AS BIGINT) AS n_groups
FROM g GROUP BY group_size
"""


# correlated scalar-per-group filter: orders above the customer's own
# average, with the division multiplied out (cents·n > sum)
DOC_ORACLES["above_avg_orders"] = """
WITH c AS (
  SELECT o_custkey AS k,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
a AS (SELECT k, count(*) AS n, sum(cents) AS s FROM c GROUP BY k)
SELECT c.k AS o_custkey,
       CAST(sum(CASE WHEN c.cents * a.n > a.s THEN 1 ELSE 0 END)
            AS BIGINT) AS n_above,
       CAST(count(*) AS BIGINT) AS n_orders
FROM c JOIN a ON a.k = c.k
GROUP BY c.k
"""


# asymmetric containment pairs (|A∩B|/|A| ≥ 0.8) on first-token blocks
DOC_ORACLES["containment_pairs"] = """
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks,
         string_split(text, ' ')[1] AS blk FROM documents)
SELECT a.doc_id AS doc_id_src, b.doc_id AS doc_id_dst,
       CAST((1048576 * len(list_intersect(a.toks, b.toks)))
            // len(a.toks) AS BIGINT) AS cont_q
FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id != b.doc_id
WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / len(a.toks) >= 0.8
"""


# Arrow IPC (Feather v2) roundtrip: digest from the parquet view — a
# hash-match proves the export → shards → custom-source ingest path
# byte-lossless per document
DOC_ORACLES["arrow_ipc_roundtrip"] = """
SELECT doc_id, lang,
       CAST(length(text) AS BIGINT) AS n_chars_rt,
       md5(text) AS text_md5
FROM documents
"""


# TPC-H Q6 shape: filtered scalar aggregate; discount band compared on
# the rounded integer percent so both engines filter identical integers
DOC_ORACLES["forecast_revenue"] = """
SELECT CAST(COALESCE(sum(cents * pct), 0) AS BIGINT) AS revenue_q4
FROM (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS pct
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_quantity < 24)
WHERE pct BETWEEN 5 AND 7
"""


# TPC-H Q17 shape: correlated per-part 20%-of-average filter with the
# fraction multiplied out (5·qty·n < sum); non-negative numerator so
# DuckDB's truncating // equals Python's floor //
DOC_ORACLES["small_qty_revenue"] = """
WITH l AS (
  SELECT l_partkey AS k, CAST(l_quantity AS BIGINT) AS qty,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem),
a AS (SELECT k, count(*) AS n, sum(qty) AS s FROM l GROUP BY k)
SELECT CAST(COALESCE(sum(l.cents), 0) // 7 AS BIGINT)
       AS rev_per_year_cents
FROM l JOIN a ON a.k = l.k
WHERE 5 * l.qty * a.n < a.s
"""


# TPC-H Q13 shape: customers-per-order-count spectrum including the
# zero-order customers (the LEFT JOIN half)
DOC_ORACLES["order_count_distribution"] = """
WITH c AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS n
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey)
SELECT CAST(n AS BIGINT) AS n_orders,
       CAST(count(*) AS BIGINT) AS n_customers
FROM c GROUP BY n
"""


# TPC-H Q11 shape: per-part value with HAVING against a global scalar;
# v·2000 > total rewritten v > total//2000 (int64-safe map-side)
DOC_ORACLES["important_parts"] = """
WITH v AS (
  SELECT l_partkey AS k,
         sum(CAST(l_quantity AS BIGINT) *
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS v
  FROM lineitem GROUP BY l_partkey),
t AS (SELECT sum(v) AS total FROM v)
SELECT v.k AS p_partkey, CAST(v.v AS BIGINT) AS value_cents
FROM v, t WHERE v.v > t.total // 2000
"""


# TPC-H Q12 shape: per-line shipping-delay band × order priority;
# the delay clamps at 0 BEFORE division so floor == truncate
DOC_ORACLES["ship_delay_priority"] = """
WITH j AS (
  SELECT least(greatest(epoch_us(l.l_shipdate)
                        - epoch_us(o.o_orderdate), 0)
               // 86400000000 // 30, 4) AS band,
         CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS hi
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
SELECT CAST(band AS BIGINT) AS delay_band,
       CAST(sum(hi) AS BIGINT) AS n_high_lines,
       CAST(sum(1 - hi) AS BIGINT) AS n_low_lines
FROM j GROUP BY band
"""


# TPC-H Q10 shape: returned-item revenue per customer in 1996 Q1,
# global top-20 under the (rev DESC, custkey) total order
DOC_ORACLES["returned_top_customers"] = """
WITH r AS (
  SELECT l_orderkey AS k,
         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
             (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
         AS rev
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey),
c AS (
  SELECT o.o_custkey AS ck, sum(r.rev) AS rev
  FROM r JOIN orders o ON o.o_orderkey = r.k
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1996-04-01'
  GROUP BY o.o_custkey),
ranked AS (
  SELECT c.ck, c.rev, cu.c_name, cu.c_acctbal, cu.c_nationkey,
         row_number() OVER (ORDER BY c.rev DESC, c.ck) AS rn
  FROM c JOIN customer cu ON cu.c_custkey = c.ck)
SELECT ck AS c_custkey, c_name,
       CAST(rev AS BIGINT) AS rev_q4,
       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
       n.n_name
FROM ranked JOIN nation n ON n.n_nationkey = ranked.c_nationkey
WHERE rn <= 20
"""


# TPC-H Q7 shape: two-nation shipping volume by ship year, both
# directions, same-nation pairs excluded; the nation pair derives from
# the supplier dimension (two smallest nation keys) on both sides
DOC_ORACLES["volume_shipping"] = """
WITH nats AS (
  SELECT DISTINCT s_nationkey AS nk FROM supplier
  ORDER BY nk LIMIT 2),
l AS (
  SELECT l_orderkey AS k, s.s_nationkey AS snat,
         CAST(year(l_shipdate) AS BIGINT) AS yr,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
         (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS rev
  FROM lineitem
  JOIN supplier s ON s.s_suppkey = l_suppkey
  WHERE s.s_nationkey IN (SELECT nk FROM nats)
    AND l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'),
j AS (
  SELECT c.c_nationkey AS cnat, l.snat, l.yr, l.rev
  FROM l JOIN orders o ON o.o_orderkey = l.k
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_nationkey IN (SELECT nk FROM nats)
    AND c.c_nationkey != l.snat)
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       yr AS l_year, CAST(sum(rev) AS BIGINT) AS revenue_q4
FROM j JOIN nation n1 ON n1.n_nationkey = j.snat
       JOIN nation n2 ON n2.n_nationkey = j.cnat
GROUP BY n1.n_name, n2.n_name, yr
"""


# TPC-H Q20 shape: suppliers who shipped more than a TENTH of a PROMO
# part's total quantity (10·q > total, pure integers)
DOC_ORACLES["promo_part_suppliers"] = """
WITH lq AS (
  SELECT l_partkey AS k, l_suppkey AS s,
         sum(CAST(l_quantity AS BIGINT)) AS q
  FROM lineitem GROUP BY l_partkey, l_suppkey),
tot AS (SELECT k, sum(q) AS tq FROM lq GROUP BY k),
win AS (
  SELECT DISTINCT lq.s
  FROM lq JOIN tot ON tot.k = lq.k
  JOIN part p ON p.p_partkey = lq.k
  WHERE p.p_type = 'PROMO' AND 10 * lq.q > tot.tq)
SELECT win.s AS s_suppkey, su.s_name
FROM win JOIN supplier su ON su.s_suppkey = win.s
"""


# hive-partitioned write + partition-pruned read: only the lang=en
# directory is opened; digest proves the partitioned sink round-trips
DOC_ORACLES["partition_pruned_read"] = """
SELECT doc_id, lang, length(text) AS n_chars_rt, md5(text) AS text_md5
FROM documents WHERE lang = 'en'
"""


# TPC-H Q8 shape: one nation's market share within its own region's
# customer orders for one part type, by order year; the nation derives
# from the supplier dimension (min nation key) on both sides.
# share_ppm = 10^6·nation // total in exact integer arithmetic (both
# sums are HUGEINT here, Python bigints engine-side).
DOC_ORACLES["market_share"] = """
WITH nat AS (SELECT min(s_nationkey) AS nk FROM supplier),
reg AS (SELECT n_regionkey AS rk FROM nation
        WHERE n_nationkey = (SELECT nk FROM nat)),
j AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
         (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))
         AS rev,
         CASE WHEN s.s_nationkey = (SELECT nk FROM nat)
              THEN 1 ELSE 0 END AS isnat
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
    AND cn.n_regionkey = (SELECT rk FROM reg))
SELECT yr AS o_year, CAST(sum(rev) AS BIGINT) AS total_q4,
       CAST(sum(rev * isnat) AS BIGINT) AS nation_q4,
       CAST(CASE WHEN sum(rev) > 0
                 THEN (1000000 * sum(rev * isnat)) // sum(rev)
                 ELSE 0 END AS BIGINT) AS share_ppm
FROM j GROUP BY yr
"""


# TPC-H Q9 shape: profit by supplier nation and order year over parts
# whose name contains a substring; no partsupp table in this corpus,
# so unit cost = the part's retail price on BOTH sides. profit can go
# negative — plain int64 on both sides.
DOC_ORACLES["product_profit"] = """
WITH j AS (
  SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS yr,
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
         (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))
         - CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT) * 100 *
           CAST(l.l_quantity AS BIGINT) AS profit
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
             AND p.p_name LIKE '%gear%'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey)
SELECT n_name, yr AS o_year, CAST(sum(profit) AS BIGINT) AS profit_q4
FROM j GROUP BY n_name, yr
"""


# TPC-H Q19 shape: one scalar revenue over a disjunction of correlated
# (brand, size, quantity) predicate bands
DOC_ORACLES["brand_qty_revenue"] = """
SELECT CAST(COALESCE(sum(
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
         (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))), 0)
       AS BIGINT) AS revenue_q4
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


# Adamic–Adar link prediction over the jaccard_pairs edge set: score
# non-adjacent pairs by Σ 1/ln(deg) over common neighbors, with the
# per-apex weight 10^12 // floor(1e6·ln(deg)) in pure integers after
# one shared-libm ln (apexes need deg ≥ 2 to form a wedge)
DOC_ORACLES["adamic_adar"] = """
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text,' ')) AS toks,
         string_split(text,' ')[1] AS blk FROM documents),
p AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks)
           - len(list_intersect(a.toks, b.toks))) >= 0.8),
e AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
deg AS (SELECT a AS node, count(*) AS deg FROM e GROUP BY a),
w AS (
  SELECT node,
         1000000000000 // CAST(floor(1e6 * ln(deg)) AS BIGINT) AS wq
  FROM deg WHERE deg >= 2),
wedge AS (
  SELECT e1.b AS u, e2.b AS v, w.wq
  FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
  JOIN w ON w.node = e1.a),
sc AS (SELECT u, v, sum(wq) AS score FROM wedge GROUP BY u, v)
SELECT sc.u AS doc_id_a, sc.v AS doc_id_b,
       CAST(sc.score AS BIGINT) AS score_q
FROM sc
WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.a = sc.u AND p.b = sc.v)
"""


# data-quality constraint audit: PK uniqueness (rows − distinct) and FK
# orphan counts (child rows with no parent) across every keyed table
DOC_ORACLES["integrity_audit"] = """
SELECT 'pk_orders' AS check, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_bad
FROM orders
UNION ALL
SELECT 'pk_customer', count(*),
       count(*) - count(DISTINCT c_custkey) FROM customer
UNION ALL
SELECT 'pk_part', count(*),
       count(*) - count(DISTINCT p_partkey) FROM part
UNION ALL
SELECT 'pk_supplier', count(*),
       count(*) - count(DISTINCT s_suppkey) FROM supplier
UNION ALL
SELECT 'pk_documents', count(*),
       count(*) - count(DISTINCT doc_id) FROM documents
UNION ALL
SELECT 'pk_events', count(*),
       count(*) - count(DISTINCT event_id) FROM events
UNION ALL
SELECT 'pk_embeddings', count(*),
       count(*) - count(DISTINCT vec_id) FROM embeddings
UNION ALL
SELECT 'fk_lineitem_orders', count(*),
       count(*) FILTER (WHERE o.o_orderkey IS NULL)
FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
UNION ALL
SELECT 'fk_lineitem_part', count(*),
       count(*) FILTER (WHERE p.p_partkey IS NULL)
FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
UNION ALL
SELECT 'fk_lineitem_supplier', count(*),
       count(*) FILTER (WHERE s.s_suppkey IS NULL)
FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
UNION ALL
SELECT 'fk_orders_customer', count(*),
       count(*) FILTER (WHERE c.c_custkey IS NULL)
FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
UNION ALL
SELECT 'fk_customer_nation', count(*),
       count(*) FILTER (WHERE n.n_nationkey IS NULL)
FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
UNION ALL
SELECT 'fk_supplier_nation', count(*),
       count(*) FILTER (WHERE n.n_nationkey IS NULL)
FROM supplier s LEFT JOIN nation n ON n.n_nationkey = s.s_nationkey
UNION ALL
SELECT 'fk_nation_region', count(*),
       count(*) FILTER (WHERE r.r_regionkey IS NULL)
FROM nation n LEFT JOIN region r ON r.r_regionkey = n.n_regionkey
"""


# gap-filled daily count series: every epoch day in the global span
# appears for every type, zero-filled (dense grid via generate_series)
# per-cell MI decomposition: integer-product ratios through shared
# libm ln, floor-quantized per cell
DOC_ORACLES["mutual_information"] = """
WITH t AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY lang, source),
tn AS (SELECT CAST(sum(n) AS BIGINT) AS N FROM t),
ni AS (SELECT lang, CAST(sum(n) AS BIGINT) AS c FROM t GROUP BY lang),
mj AS (SELECT source, CAST(sum(n) AS BIGINT) AS c
       FROM t GROUP BY source)
SELECT t.lang, t.source, t.n AS n_ij,
       CAST(t.n * floor(1048576.0 * ln(
         CAST(t.n * tn.N AS DOUBLE) / CAST(ni.c * mj.c AS DOUBLE)))
         AS BIGINT) AS mi_term_q20
FROM t CROSS JOIN tn
JOIN ni ON ni.lang = t.lang
JOIN mj ON mj.source = t.source
"""

# exact integer W1: cross-multiplied cumulative gaps over the dense
# day grid (same day/grid construction as dense_daily_counts)
DOC_ORACLES["w1_drift"] = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         count(*) AS n
  FROM events GROUP BY event_type, day),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM c),
grid AS (
  SELECT t.event_type, d.day, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM span),
                                            (SELECT hi FROM span)))
              AS day) d
  LEFT JOIN c ON c.event_type = t.event_type AND c.day = d.day),
cum AS (SELECT event_type, day,
               sum(n) OVER (PARTITION BY event_type
                            ORDER BY day) AS cn
        FROM grid),
tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS N
        FROM grid GROUP BY event_type)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(sum(abs(a.cn * tb.N - b.cn * ta.N)) AS BIGINT) AS w1_num,
       ta.N AS n_a, tb.N AS n_b
FROM cum a
JOIN cum b ON b.day = a.day AND a.event_type < b.event_type
JOIN tot ta ON ta.event_type = a.event_type
JOIN tot tb ON tb.event_type = b.event_type
GROUP BY a.event_type, b.event_type, ta.N, tb.N
"""

DOC_ORACLES["dense_daily_counts"] = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         count(*) AS n
  FROM events GROUP BY event_type, day),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM c),
grid AS (
  SELECT t.event_type, d.day
  FROM (SELECT DISTINCT event_type FROM events) t,
       (SELECT unnest(generate_series((SELECT lo FROM span),
                                      (SELECT hi FROM span))) AS day)
       d)
SELECT g.event_type, CAST(g.day AS BIGINT) AS day,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM grid g LEFT JOIN c ON c.event_type = g.event_type
                       AND c.day = g.day
"""


# SCD type-2 temporal table: each event's validity interval runs to the
# user's next event (ties ordered by event_id), open rows closed with
# the 2100-01-01 sentinel
DOC_ORACLES["scd2_intervals"] = """
SELECT user_id, event_id,
       CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
       CAST(COALESCE(lead(epoch_us(ts)) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id),
                     4102444800000000) AS BIGINT) AS valid_to_us
FROM events
"""


# lag-1 autocorrelation sufficient statistics of the DENSE daily count
# series per type (zero-filled grid; r = cov/sqrt(vx*vy) divides out of
# the exact integer columns)
DOC_ORACLES["autocorr_daily"] = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         count(*) AS n
  FROM events GROUP BY event_type, day),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM c),
grid AS (
  SELECT t.event_type, d.day, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM span),
                                            (SELECT hi FROM span)))
              AS day) d
  LEFT JOIN c ON c.event_type = t.event_type AND c.day = d.day),
l AS (
  SELECT event_type, n AS x,
         lead(n) OVER (PARTITION BY event_type ORDER BY day) AS y
  FROM grid)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
         AS cov_num,
       CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
         AS var_x_num,
       CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS BIGINT)
         AS var_y_num
FROM l WHERE y IS NOT NULL GROUP BY event_type
"""


# PSI drift terms between md5(doc_id)-parity halves per language,
# add-one smoothed; the float tree is mirrored op-for-op from
# textops.psi_drift (two exact divisions, one exactly-representable
# integer ratio into the shared libm ln, one multiply, floor at 1e6)
DOC_ORACLES["psi_drift"] = """
WITH s AS (
  SELECT lang,
         CAST(('0x' || substr(md5(doc_id || ':psi'), 1, 16))::UBIGINT
              % 2 AS BIGINT) AS sp
  FROM documents),
c AS (
  SELECT lang,
         sum(CASE WHEN sp = 0 THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN sp = 1 THEN 1 ELSE 0 END) AS b
  FROM s GROUP BY lang),
t AS (SELECT count(*) AS nl, sum(a) AS ta, sum(b) AS tb FROM c)
SELECT lang, CAST(a AS BIGINT) AS n_a, CAST(b AS BIGINT) AS n_b,
       CAST(floor(1000000 * (
         (CAST(a + 1 AS DOUBLE) / CAST(ta + nl AS DOUBLE)
          - CAST(b + 1 AS DOUBLE) / CAST(tb + nl AS DOUBLE))
         * ln(CAST((a + 1) * (tb + nl) AS DOUBLE)
              / CAST((b + 1) * (ta + nl) AS DOUBLE))))
       AS BIGINT) AS psi_term_q
FROM c, t
"""


# item-item co-occurrence cosine over order baskets: cos2_q =
# 10^12 * n_ab^2 // (n_a * n_b) in exact integers
DOC_ORACLES["item_similarity"] = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
ci AS (SELECT p, count(*) AS c FROM op GROUP BY p),
pairs AS (
  SELECT a.p AS pa, b.p AS pb, count(*) AS cab
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING count(*) >= 2)
SELECT pa AS part_a, pb AS part_b,
       CAST(ca.c AS BIGINT) AS n_a, CAST(cb.c AS BIGINT) AS n_b,
       CAST(cab AS BIGINT) AS n_ab,
       CAST((1000000000000::HUGEINT * cab * cab) // (ca.c * cb.c)
            AS BIGINT) AS cos2_q
FROM pairs JOIN ci ca ON ca.p = pairs.pa
           JOIN ci cb ON cb.p = pairs.pb
"""


def _hits_sql(iters: int = 3) -> str:
    """Exact mirror of components.hits_scores: pure-integer HITS
    unrolled one CTE pair per round (h⁰=1; aʳ = in-sum of hʳ⁻¹;
    hʳ = out-sum of aʳ; int64 sums throughout, bit-identical to the
    engine). Every doc has an out-edge (the scatter rule), so inner
    joins lose nothing; docs without in-edges coalesce to 0."""
    steps = []
    for k in range(iters):
        steps.append(f"""
a{k + 1} AS (
  SELECT e.dst AS doc_id, sum(h.v) AS v
  FROM eraw e JOIN h{k} h ON h.doc_id = e.src GROUP BY e.dst),
h{k + 1} AS (
  SELECT e.src AS doc_id, sum(a.v) AS v
  FROM eraw e JOIN a{k + 1} a ON a.doc_id = e.dst GROUP BY e.src)""")
    return f"""
WITH nodes AS (SELECT doc_id FROM documents),
params AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
eraw AS (
  SELECT doc_id AS src, doc_id // 2 AS dst FROM documents
  WHERE doc_id > 0
  UNION
  SELECT doc_id, (doc_id * doc_id + 1) % p.n FROM documents, params p),
h0 AS (SELECT doc_id, CAST(1 AS BIGINT) AS v FROM nodes),{",".join(steps)}
SELECT n.doc_id, CAST(coalesce(h{iters}.v, 0) AS BIGINT) AS hub_q,
       CAST(coalesce(a{iters}.v, 0) AS BIGINT) AS auth_q
FROM nodes n LEFT JOIN h{iters} ON h{iters}.doc_id = n.doc_id
             LEFT JOIN a{iters} ON a{iters}.doc_id = n.doc_id
"""


DOC_ORACLES["hits_scores"] = _hits_sql()


# interval union per user over value-length intervals [ts, ts+cents·10ms):
# window-cummax island breaks, per-island max(e)−min(s), summed
DOC_ORACLES["interval_coverage"] = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts)
         + CAST(floor(value * 100 + 0.5) AS BIGINT) * 10000 AS e
  FROM events),
m AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS prev_max
  FROM iv),
b AS (
  SELECT user_id, s, e,
         CASE WHEN prev_max IS NULL OR s > prev_max
              THEN 1 ELSE 0 END AS brk
  FROM m),
g AS (
  SELECT user_id, s, e,
         sum(brk) OVER (PARTITION BY user_id ORDER BY s, e,
                        brk DESC) AS isl
  FROM b),
isls AS (
  SELECT user_id, isl, max(e) - min(s) AS cov
  FROM g GROUP BY user_id, isl)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(cov) AS BIGINT) AS covered_us
FROM isls GROUP BY user_id
"""


# snapshot CDC diff: B derives from A by md5 rules (%10==0 delete,
# %10==1 edit, %10==2 spawns one added row); classify added / removed
# / changed via content digests
DOC_ORACLES["table_cdc_diff"] = """
WITH r AS (
  SELECT doc_id, text,
         CAST(('0x' || substr(md5(doc_id || ':cdc'), 1, 16))::UBIGINT
              % 10 AS BIGINT) AS rule
  FROM documents),
a AS (SELECT doc_id AS k, md5(text) AS h FROM documents),
b AS (
  SELECT doc_id AS k,
         CASE WHEN rule = 1 THEN md5(text || ' v2')
              ELSE md5(text) END AS h
  FROM r WHERE rule != 0
  UNION ALL
  SELECT doc_id + 1000000000,
         md5('added doc ' || doc_id)
  FROM r WHERE rule = 2)
SELECT 'removed' AS op, a.k AS doc_id
FROM a LEFT JOIN b ON b.k = a.k WHERE b.k IS NULL
UNION ALL
SELECT 'added', b.k FROM b LEFT JOIN a ON a.k = b.k WHERE a.k IS NULL
UNION ALL
SELECT 'changed', a.k
FROM a JOIN b ON b.k = a.k WHERE a.h != b.h
"""


# interpolated (percentile_cont) percentiles with cleared denominators:
# p50·2 and p95·20 are exact integers picked at ranks ⌊pos⌋/⌈pos⌉ of
# the per-type value order
DOC_ORACLES["value_percentiles_cont"] = """
WITH v AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events),
r AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c)
           AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v),
s AS (SELECT DISTINCT event_type, n FROM r)
SELECT s.event_type, CAST(s.n AS BIGINT) AS n,
       CAST((SELECT c FROM r WHERE r.event_type = s.event_type
             AND rn = (s.n - 1) // 2 + 1)
          + (SELECT c FROM r WHERE r.event_type = s.event_type
             AND rn = s.n // 2 + 1) AS BIGINT) AS p50_x2,
       CAST((20 - (19 * (s.n - 1)) % 20)
            * (SELECT c FROM r WHERE r.event_type = s.event_type
               AND rn = (19 * (s.n - 1)) // 20 + 1)
          + ((19 * (s.n - 1)) % 20)
            * (SELECT c FROM r WHERE r.event_type = s.event_type
               AND rn = least((19 * (s.n - 1)) // 20 + 2, s.n))
            AS BIGINT) AS p95_x20
FROM s
"""


# batch perceptron (full-batch Rosenblatt updates) for is-English over
# pure-integer features — the whole training loop unrolled, bit-exact
# by construction (no float anywhere)
DOC_ORACLES["perceptron_langid"] = """
WITH feat AS MATERIALIZED (
  SELECT doc_id,
         CAST(1 AS BIGINT) AS f1,
         CAST(least(len(string_split(text, ' ')), 63) AS BIGINT)
           AS f2,
         CAST(least(len(list_filter(string_split(lower(text), ' '),
                    t -> t IN ('the','and','of','to','a','in','is'))), 15) AS BIGINT) AS f3
  FROM documents),
lab AS MATERIALIZED (
  SELECT doc_id, f1, f2, f3,
         CASE WHEN 16 * f3 > f2 THEN 1 ELSE -1 END AS y
  FROM feat),
w0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2,
              CAST(0 AS BIGINT) AS w3),
m0 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w0 w),
w1 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w0 w, m0 m),
m1 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w1 w),
w2 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w1 w, m1 m),
m2 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w2 w),
w3 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w2 w, m2 m),
m3 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w3 w),
w4 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w3 w, m3 m),
m4 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w4 w),
w5 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w4 w, m4 m),
m5 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w5 w),
w6 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w5 w, m5 m),
m6 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w6 w),
w7 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w6 w, m6 m),
m7 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w7 w),
w8 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w7 w, m7 m),
m8 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w8 w),
w9 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w8 w, m8 m),
m9 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w9 w),
w10 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w9 w, m9 m),
m10 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w10 w),
w11 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w10 w, m10 m),
m11 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w11 w),
w12 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w11 w, m11 m),
m12 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w12 w),
w13 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w12 w, m12 m),
m13 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w13 w),
w14 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w13 w, m13 m),
m14 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w14 w),
w15 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w14 w, m14 m),
m15 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w15 w),
w16 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w15 w, m15 m),
m16 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w16 w),
w17 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w16 w, m16 m),
m17 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w17 w),
w18 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w17 w, m17 m),
m18 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w18 w),
w19 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w18 w, m18 m),
m19 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w19 w),
w20 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w19 w, m19 m),
m20 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w20 w),
w21 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w20 w, m20 m),
m21 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w21 w),
w22 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w21 w, m21 m),
m22 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w22 w),
w23 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w22 w, m22 m),
m23 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w23 w),
w24 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w23 w, m23 m),
m24 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w24 w),
w25 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w24 w, m24 m),
m25 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w25 w),
w26 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w25 w, m25 m),
m26 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w26 w),
w27 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w26 w, m26 m),
m27 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w27 w),
w28 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w27 w, m27 m),
m28 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w28 w),
w29 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w28 w, m28 m),
m29 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w29 w),
w30 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w29 w, m29 m),
m30 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w30 w),
w31 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w30 w, m30 m),
m31 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w31 w),
w32 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w31 w, m31 m),
m32 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w32 w),
w33 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w32 w, m32 m),
m33 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w33 w),
w34 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w33 w, m33 m),
m34 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w34 w),
w35 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w34 w, m34 m),
m35 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w35 w),
w36 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w35 w, m35 m),
m36 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w36 w),
w37 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w36 w, m36 m),
m37 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w37 w),
w38 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w37 w, m37 m),
m38 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w38 w),
w39 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w38 w, m38 m),
m39 AS MATERIALIZED (
  SELECT
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f1 ELSE 0 END), 0) AS s1,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f2 ELSE 0 END), 0) AS s2,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN y * f3 ELSE 0 END), 0) AS s3,
    coalesce(sum(CASE WHEN y * (w.w1*f1 + w.w2*f2 + w.w3*f3) <= 0
                 THEN 1 ELSE 0 END), 0) AS nm
  FROM lab, w39 w),
w40 AS MATERIALIZED (
  SELECT CAST(w.w1 + m.s1 AS BIGINT) AS w1,
         CAST(w.w2 + m.s2 AS BIGINT) AS w2,
         CAST(w.w3 + m.s3 AS BIGINT) AS w3
  FROM w39 w, m39 m),
cand AS (SELECT 0 AS k, (SELECT nm FROM m0) AS nm, w1, w2, w3 FROM w0 UNION ALL SELECT 1 AS k, (SELECT nm FROM m1) AS nm, w1, w2, w3 FROM w1 UNION ALL SELECT 2 AS k, (SELECT nm FROM m2) AS nm, w1, w2, w3 FROM w2 UNION ALL SELECT 3 AS k, (SELECT nm FROM m3) AS nm, w1, w2, w3 FROM w3 UNION ALL SELECT 4 AS k, (SELECT nm FROM m4) AS nm, w1, w2, w3 FROM w4 UNION ALL SELECT 5 AS k, (SELECT nm FROM m5) AS nm, w1, w2, w3 FROM w5 UNION ALL SELECT 6 AS k, (SELECT nm FROM m6) AS nm, w1, w2, w3 FROM w6 UNION ALL SELECT 7 AS k, (SELECT nm FROM m7) AS nm, w1, w2, w3 FROM w7 UNION ALL SELECT 8 AS k, (SELECT nm FROM m8) AS nm, w1, w2, w3 FROM w8 UNION ALL SELECT 9 AS k, (SELECT nm FROM m9) AS nm, w1, w2, w3 FROM w9 UNION ALL SELECT 10 AS k, (SELECT nm FROM m10) AS nm, w1, w2, w3 FROM w10 UNION ALL SELECT 11 AS k, (SELECT nm FROM m11) AS nm, w1, w2, w3 FROM w11 UNION ALL SELECT 12 AS k, (SELECT nm FROM m12) AS nm, w1, w2, w3 FROM w12 UNION ALL SELECT 13 AS k, (SELECT nm FROM m13) AS nm, w1, w2, w3 FROM w13 UNION ALL SELECT 14 AS k, (SELECT nm FROM m14) AS nm, w1, w2, w3 FROM w14 UNION ALL SELECT 15 AS k, (SELECT nm FROM m15) AS nm, w1, w2, w3 FROM w15 UNION ALL SELECT 16 AS k, (SELECT nm FROM m16) AS nm, w1, w2, w3 FROM w16 UNION ALL SELECT 17 AS k, (SELECT nm FROM m17) AS nm, w1, w2, w3 FROM w17 UNION ALL SELECT 18 AS k, (SELECT nm FROM m18) AS nm, w1, w2, w3 FROM w18 UNION ALL SELECT 19 AS k, (SELECT nm FROM m19) AS nm, w1, w2, w3 FROM w19 UNION ALL SELECT 20 AS k, (SELECT nm FROM m20) AS nm, w1, w2, w3 FROM w20 UNION ALL SELECT 21 AS k, (SELECT nm FROM m21) AS nm, w1, w2, w3 FROM w21 UNION ALL SELECT 22 AS k, (SELECT nm FROM m22) AS nm, w1, w2, w3 FROM w22 UNION ALL SELECT 23 AS k, (SELECT nm FROM m23) AS nm, w1, w2, w3 FROM w23 UNION ALL SELECT 24 AS k, (SELECT nm FROM m24) AS nm, w1, w2, w3 FROM w24 UNION ALL SELECT 25 AS k, (SELECT nm FROM m25) AS nm, w1, w2, w3 FROM w25 UNION ALL SELECT 26 AS k, (SELECT nm FROM m26) AS nm, w1, w2, w3 FROM w26 UNION ALL SELECT 27 AS k, (SELECT nm FROM m27) AS nm, w1, w2, w3 FROM w27 UNION ALL SELECT 28 AS k, (SELECT nm FROM m28) AS nm, w1, w2, w3 FROM w28 UNION ALL SELECT 29 AS k, (SELECT nm FROM m29) AS nm, w1, w2, w3 FROM w29 UNION ALL SELECT 30 AS k, (SELECT nm FROM m30) AS nm, w1, w2, w3 FROM w30 UNION ALL SELECT 31 AS k, (SELECT nm FROM m31) AS nm, w1, w2, w3 FROM w31 UNION ALL SELECT 32 AS k, (SELECT nm FROM m32) AS nm, w1, w2, w3 FROM w32 UNION ALL SELECT 33 AS k, (SELECT nm FROM m33) AS nm, w1, w2, w3 FROM w33 UNION ALL SELECT 34 AS k, (SELECT nm FROM m34) AS nm, w1, w2, w3 FROM w34 UNION ALL SELECT 35 AS k, (SELECT nm FROM m35) AS nm, w1, w2, w3 FROM w35 UNION ALL SELECT 36 AS k, (SELECT nm FROM m36) AS nm, w1, w2, w3 FROM w36 UNION ALL SELECT 37 AS k, (SELECT nm FROM m37) AS nm, w1, w2, w3 FROM w37 UNION ALL SELECT 38 AS k, (SELECT nm FROM m38) AS nm, w1, w2, w3 FROM w38 UNION ALL SELECT 39 AS k, (SELECT nm FROM m39) AS nm, w1, w2, w3 FROM w39),
pocket AS (
  SELECT w1, w2, w3 FROM cand
  ORDER BY nm, k LIMIT 1)
SELECT l.doc_id, CAST(l.y AS BIGINT) AS y,
       CAST(CASE WHEN p.w1*f1 + p.w2*f2 + p.w3*f3 > 0
                 THEN 1 ELSE -1 END AS BIGINT) AS yhat
FROM lab l, pocket p
"""


# robust daily anomaly flags: |count − median| > 3·MAD over the dense
# zero-filled grid, quantile_disc lower-median rule on both statistics
DOC_ORACLES["daily_anomalies"] = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         count(*) AS n
  FROM events GROUP BY event_type, day),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM c),
grid AS (
  SELECT t.event_type, d.day, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM span),
                                            (SELECT hi FROM span)))
              AS day) d
  LEFT JOIN c ON c.event_type = t.event_type AND c.day = d.day),
med AS (
  SELECT event_type, quantile_disc(n, 0.5) AS m FROM grid
  GROUP BY event_type),
mad AS (
  SELECT g.event_type, quantile_disc(abs(g.n - med.m), 0.5) AS md
  FROM grid g JOIN med ON med.event_type = g.event_type
  GROUP BY g.event_type)
SELECT g.event_type, CAST(g.day AS BIGINT) AS day,
       CAST(g.n AS BIGINT) AS n_events,
       CAST(CASE WHEN abs(g.n - med.m) > 3 * mad.md
                 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM grid g JOIN med ON med.event_type = g.event_type
            JOIN mad ON mad.event_type = g.event_type
"""


# ontology consistency: nodes on a directed cycle of the two-rule edge
# set (a node is cyclic iff it reaches itself through >= 1 edge)
DOC_ORACLES["kg_cycle_nodes"] = """
WITH RECURSIVE params AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
e AS (
  SELECT doc_id AS src, doc_id // 2 AS dst FROM documents
  WHERE doc_id > 0
  UNION
  SELECT doc_id, (doc_id * doc_id + 1) % p.n
  FROM documents, params p),
r AS (
  SELECT src AS s, dst AS d FROM e
  UNION
  SELECT r.s, e.dst FROM r JOIN e ON e.src = r.d)
SELECT DISTINCT s AS doc_id FROM r WHERE s = d
"""


# token-bucket rate limiter replay (cap 5 tokens ×1e6, refill
# gap_us // 10, cost 1e6): the genuinely sequential per-user walk as a
# recursive-CTE position chain (the ewma pattern)
DOC_ORACLES["rate_limit_replay"] = """
WITH RECURSIVE o AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS pos
  FROM events),
walk AS (
  SELECT user_id, event_id, tus, pos,
         CAST(4000000 AS BIGINT) AS bpost,
         CAST(1 AS BIGINT) AS admitted
  FROM o WHERE pos = 1
  UNION ALL
  SELECT o.user_id, o.event_id, o.tus, o.pos,
         CAST(CASE WHEN least(5000000,
                             w.bpost + (o.tus - w.tus) // 10)
                        >= 1000000
              THEN least(5000000,
                         w.bpost + (o.tus - w.tus) // 10) - 1000000
              ELSE least(5000000,
                         w.bpost + (o.tus - w.tus) // 10)
              END AS BIGINT),
         CAST(CASE WHEN least(5000000,
                             w.bpost + (o.tus - w.tus) // 10)
                        >= 1000000
              THEN 1 ELSE 0 END AS BIGINT)
  FROM walk w JOIN o ON o.user_id = w.user_id
                    AND o.pos = w.pos + 1)
SELECT user_id, event_id, admitted, bpost AS bucket_q FROM walk
"""


# bottom-k hash sample quantile sketch: the k rows with smallest
# md5(event_id) are an exact uniform sample; quantile_disc cutpoints
# (1-based rank ceil(q*n)) read off the sample — the oracle replays the
# sketch exactly, sampled rows included
DOC_ORACLES["quantile_sketch_values"] = """
WITH h AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         ('0x' || substr(md5(event_id || ':qsk'), 1, 16))::UBIGINT
           AS hh
  FROM events),
samp AS (SELECT cents FROM h ORDER BY hh, cents LIMIT 512),
n AS (SELECT count(*) AS k FROM samp),
r AS (SELECT cents,
             row_number() OVER (ORDER BY cents) AS rn
      FROM samp)
SELECT q.q_pct, r.cents AS value_cents, CAST(n.k AS BIGINT) AS k_used
FROM (VALUES (25, 0.25), (50, 0.5), (75, 0.75), (90, 0.9),
             (99, 0.99)) AS q(q_pct, qq)
JOIN n ON TRUE
JOIN r ON r.rn = greatest(1, CAST(ceil(q.qq * n.k) AS BIGINT))
"""


# Laplace-mechanism DP count release: noise = b·ln(u1/u2), u_i =
# (md5-u64+1)/2^64 — the exact float tree of traindata.dp_noisy_counts
DOC_ORACLES["dp_noisy_counts"] = """
WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY lang),
u AS (
  SELECT lang, n,
         (CAST(('0x' || substr(md5(lang || ':dp1'), 1, 16))::UBIGINT
               AS DOUBLE) + 1) / 18446744073709551616.0 AS u1,
         (CAST(('0x' || substr(md5(lang || ':dp2'), 1, 16))::UBIGINT
               AS DOUBLE) + 1) / 18446744073709551616.0 AS u2
  FROM c)
SELECT lang, n AS n_true,
       CAST(floor(1000000 * (1.0 * ln(u1 / u2))) AS BIGINT)
         AS noise_q6,
       CAST(1000000 * n
            + CAST(floor(1000000 * (1.0 * ln(u1 / u2))) AS BIGINT)
         AS BIGINT) AS n_noisy_q6
FROM u
"""


# deterministic DeepWalk walk corpus over the exact k-NN graph: at
# 0-based step t on node v move to sorted-neighbor index
# md5('start:t:v') % degree; one walk per node, path string per start
DOC_ORACLES["graph_random_walks"] = """
WITH RECURSIVE s AS MATERIALIZED (
  SELECT a.vec_id AS vid, b.vec_id AS nid,
         list_cosine_similarity(a.embedding, b.embedding) AS sim
  FROM embeddings a, embeddings b WHERE a.vec_id != b.vec_id),
topk AS MATERIALIZED (
  SELECT vid, nid FROM (
    SELECT vid, nid,
           row_number() OVER (PARTITION BY vid
                              ORDER BY sim DESC, nid) AS rk
    FROM s) WHERE rk <= 5),
e AS MATERIALIZED (
  SELECT vid, nid,
         row_number() OVER (PARTITION BY vid ORDER BY nid) AS rn,
         count(*) OVER (PARTITION BY vid) AS deg
  FROM topk),
walk AS (
  SELECT vid AS start, 0 AS step, vid AS cur
  FROM (SELECT DISTINCT vid FROM e)
  UNION ALL
  SELECT w.start, w.step + 1, e.nid
  FROM walk w JOIN e ON e.vid = w.cur
   AND e.rn = 1 + CAST(
     ('0x' || substr(md5(w.start || ':' || w.step || ':' || w.cur),
                     1, 16))::UBIGINT % e.deg AS BIGINT)
  WHERE w.step < 6)
SELECT start AS vec_id,
       string_agg(CAST(cur AS VARCHAR), '>' ORDER BY step) AS path
FROM walk GROUP BY start
"""


# word2vec negative-sampling table: weights floor(sqrt(floor(sqrt(f^3))))
# (IEEE sqrt is correctly rounded — bit-portable, unlike exp), draws
# md5('i:neg') % total through the lexicographic cumulative table
DOC_ORACLES["negative_samples"] = """
WITH f AS (
  SELECT t AS tok, count(*) AS f
  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
  GROUP BY t),
w AS (
  SELECT tok,
         CAST(floor(sqrt(floor(sqrt(
           CAST(f AS DOUBLE) * f * f)))) AS BIGINT) AS wq
  FROM f),
c AS (
  SELECT tok, wq,
         COALESCE(sum(wq) OVER (ORDER BY tok
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS lo
  FROM w),
tot AS (SELECT sum(wq) AS total FROM w),
d AS (
  SELECT i,
         CAST(('0x' || substr(md5(i || ':neg'), 1, 16))::UBIGINT
              % (SELECT total FROM tot) AS BIGINT) AS draw
  FROM (SELECT unnest(generate_series(0, 499)) AS i))
SELECT d.i, c.tok AS token
FROM d JOIN c ON d.draw >= c.lo AND d.draw < c.lo + c.wq
"""


# exact ROC-AUC (Mann-Whitney U, average ranks for ties ×2) of the
# stopword-count score vs the hidden stopword-density rule
DOC_ORACLES["auc_eval"] = """
WITH feat AS (
  SELECT CAST(least(len(string_split(text, ' ')), 63) AS BIGINT)
           AS f2,
         CAST(least(len(list_filter(string_split(lower(text), ' '),
              t -> t IN ('the','and','of','to','a','in','is'))), 15)
           AS BIGINT) AS f3
  FROM documents),
lab AS (
  SELECT f3 AS s,
         CASE WHEN 16 * f3 > f2 THEN 1 ELSE 0 END AS y
  FROM feat),
h AS (SELECT s, sum(y) AS p, sum(1 - y) AS g FROM lab GROUP BY s),
o AS (
  SELECT s, p, g,
         COALESCE(sum(p + g) OVER (ORDER BY s
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS nb
  FROM h),
agg AS (
  SELECT sum(p) AS np, sum(g) AS ng,
         sum(p * (2 * nb + p + g + 1)) AS r2
  FROM o)
SELECT CAST(np AS BIGINT) AS n_pos, CAST(ng AS BIGINT) AS n_neg,
       CAST(r2 - np * (np + 1) AS BIGINT) AS u_x2,
       CAST((1000000 * (r2 - np * (np + 1))) // (2 * np * ng)
            AS BIGINT) AS auc_ppm
FROM agg
"""


# precision/recall curve points at every integer threshold of the
# stopword-count score (predict positive iff score >= t)
DOC_ORACLES["pr_curve"] = """
WITH feat AS (
  SELECT CAST(least(len(string_split(text, ' ')), 63) AS BIGINT)
           AS f2,
         CAST(least(len(list_filter(string_split(lower(text), ' '),
              t -> t IN ('the','and','of','to','a','in','is'))), 15)
           AS BIGINT) AS f3
  FROM documents),
lab AS (
  SELECT f3 AS s,
         CASE WHEN 16 * f3 > f2 THEN 1 ELSE 0 END AS y
  FROM feat),
tot AS (SELECT CAST(sum(y) AS BIGINT) AS n_pos FROM lab),
th AS (SELECT unnest(generate_series(0, 16)) AS t)
SELECT th.t AS threshold,
       CAST(COALESCE(sum(CASE WHEN s >= th.t THEN y END), 0)
            AS BIGINT) AS tp,
       CAST(COALESCE(sum(CASE WHEN s >= th.t THEN 1 - y END), 0)
            AS BIGINT) AS fp,
       CAST(tot.n_pos
            - COALESCE(sum(CASE WHEN s >= th.t THEN y END), 0)
            AS BIGINT) AS fn,
       CAST(CASE WHEN COALESCE(sum(CASE WHEN s >= th.t THEN 1 END), 0)
                      > 0
            THEN (1000000 *
                  COALESCE(sum(CASE WHEN s >= th.t THEN y END), 0))
                 // sum(CASE WHEN s >= th.t THEN 1 END)
            ELSE 1000000 END AS BIGINT) AS precision_ppm,
       CAST(CASE WHEN tot.n_pos > 0
            THEN (1000000 *
                  COALESCE(sum(CASE WHEN s >= th.t THEN y END), 0))
                 // tot.n_pos
            ELSE 1000000 END AS BIGINT) AS recall_ppm
FROM th CROSS JOIN tot LEFT JOIN lab ON TRUE
GROUP BY th.t, tot.n_pos
"""


# exact stratified 80/10/10 split: per-lang md5 rank, first floor(0.8n)
# train, next floor(0.1n) val, rest test
# A-ES weighted reservoir: identical float64 expression tree (cast →
# +1 → exact 2^-64 scale → shared-libm ln → /w), doc_id tiebreak
DOC_ORACLES["weighted_reservoir_sample"] = """
WITH kdoc AS (
  SELECT source, doc_id,
         ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                  ::UBIGINT AS DOUBLE) + 1.0)
            / 18446744073709551616.0)
           / CAST(n_chars AS DOUBLE) AS key
  FROM documents),
r AS (SELECT source, doc_id, key,
             row_number() OVER (PARTITION BY source
                                ORDER BY key DESC, doc_id) AS rk
      FROM kdoc)
SELECT source, CAST(rk AS BIGINT) AS rank, doc_id,
       CAST(floor(1048576.0 * key) AS BIGINT) AS key_q20
FROM r WHERE rk <= 5
"""

DOC_ORACLES["stratified_split"] = """
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5(doc_id || ':split'), 1, 16))
                    ::UBIGINT, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents)
SELECT doc_id, lang,
       CASE WHEN rn <= n * 80 // 100 THEN 'train'
            WHEN rn <= n * 80 // 100 + n * 10 // 100 THEN 'val'
            ELSE 'test' END AS split
FROM r
"""

DOC_ORACLES["stump_split"] = """
WITH feat AS (
  SELECT CAST(least(len(string_split(text, ' ')), 63) AS BIGINT)
           AS f2,
         CAST(least(len(list_filter(string_split(lower(text), ' '),
              t -> t IN ('the','and','of','to','a','in','is'))), 15)
           AS BIGINT) AS f3
  FROM documents),
lab AS (
  SELECT CAST(0 AS BIGINT) AS feature, f2 AS v,
         CAST(CASE WHEN 16 * f3 > f2 THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM feat
  UNION ALL
  SELECT CAST(1 AS BIGINT), f3,
         CAST(CASE WHEN 16 * f3 > f2 THEN 1 ELSE 0 END AS BIGINT)
  FROM feat),
th AS (
  SELECT CAST(0 AS BIGINT) AS feature,
         unnest(generate_series(0, 64)) AS t
  UNION ALL
  SELECT CAST(1 AS BIGINT), unnest(generate_series(0, 16))),
cells AS (
  SELECT feature, t AS threshold,
         CAST(COALESCE(sum(CASE WHEN v < t THEN 1 END), 0)
              AS BIGINT) AS n_left,
         CAST(COALESCE(sum(CASE WHEN v < t THEN y END), 0)
              AS BIGINT) AS pos_left,
         CAST(COALESCE(sum(CASE WHEN v >= t THEN 1 END), 0)
              AS BIGINT) AS n_right,
         CAST(COALESCE(sum(CASE WHEN v >= t THEN y END), 0)
              AS BIGINT) AS pos_right,
         CAST(count(*) AS BIGINT) AS total_n
  FROM th JOIN lab USING (feature)
  GROUP BY feature, t),
g AS (
  SELECT feature, threshold, n_left, pos_left, n_right, pos_right,
    CASE WHEN n_left = 0 THEN CAST(0 AS HUGEINT) ELSE
      (1000000 * (CAST(n_left AS HUGEINT) * n_left
                  - CAST(pos_left AS HUGEINT) * pos_left
                  - CAST(n_left - pos_left AS HUGEINT)
                    * (n_left - pos_left)))
      // (CAST(n_left AS HUGEINT) * n_left) END AS gl,
    CASE WHEN n_right = 0 THEN CAST(0 AS HUGEINT) ELSE
      (1000000 * (CAST(n_right AS HUGEINT) * n_right
                  - CAST(pos_right AS HUGEINT) * pos_right
                  - CAST(n_right - pos_right AS HUGEINT)
                    * (n_right - pos_right)))
      // (CAST(n_right AS HUGEINT) * n_right) END AS gr,
    total_n
  FROM cells)
SELECT feature, threshold, n_left, pos_left, n_right, pos_right,
       CAST(gl AS BIGINT) AS gini_left_ppm,
       CAST(gr AS BIGINT) AS gini_right_ppm,
       CAST((n_left * gl + n_right * gr) // total_n AS BIGINT)
         AS weighted_ppm
FROM g
"""

DOC_ORACLES["skipgram_pairs"] = """
WITH toks AS (
  SELECT string_split(text, ' ') AS t FROM documents
), pos AS (
  SELECT t, unnest(generate_series(1, len(t))) AS i FROM toks
), pairs AS (
  SELECT p.t[p.i] AS center, p.t[p.i + o.o] AS context
  FROM pos p, (SELECT unnest(generate_series(-3, 3)) AS o) o
  WHERE o.o != 0 AND p.i + o.o >= 1 AND p.i + o.o <= len(p.t)
)
SELECT center, context, CAST(count(*) AS BIGINT) AS n
FROM pairs GROUP BY center, context
"""

DOC_ORACLES["spatial_neighbor_pairs"] = """
WITH pts AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('x:' || doc_id), 1, 16))::UBIGINT
              % 1048576 AS BIGINT) AS x,
         CAST(('0x' || substr(md5('y:' || doc_id), 1, 16))::UBIGINT
              % 1048576 AS BIGINT) AS y
  FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST((a.x - b.x) * (a.x - b.x)
            + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
FROM pts a JOIN pts b ON a.doc_id < b.doc_id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= 16384 * 16384
"""

# pca_power: the whole training loop mirrored — covariance suffstats,
# then ``rounds`` integer power-iteration steps unrolled one CTE pair
# per round (HUGEINT; DuckDB // truncates toward zero, which the
# engine's trunc_div mirrors), then the final projection. Step CTEs
# MATERIALIZED — DuckDB otherwise re-inlines the doubly-referenced
# u/w chain exponentially (the perceptron_langid lesson).
def _pca_power_sql(rounds: int = 64) -> str:
    head = """WITH v AS MATERIALIZED (
  SELECT vec_id, i - 1 AS j,
         CAST(floor(1024.0 * CAST(embedding[i] AS DOUBLE)) AS BIGINT)
           AS x
  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) s
), s1 AS MATERIALIZED (
  SELECT j, CAST(sum(x) AS HUGEINT) AS s FROM v GROUP BY j
), nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
s2 AS MATERIALIZED (
  SELECT a.j AS j, b.j AS k,
         CAST(sum(CAST(a.x AS HUGEINT) * b.x) AS HUGEINT) AS s
  FROM v a JOIN v b USING (vec_id) GROUP BY a.j, b.j
), cm AS MATERIALIZED (
  SELECT s2.j, s2.k, (SELECT n FROM nn) * s2.s - sa.s * sb.s AS c
  FROM s2 JOIN s1 sa ON sa.j = s2.j JOIN s1 sb ON sb.j = s2.k
), w0 AS (
  SELECT unnest(generate_series(0, 63)) AS j, CAST(1 AS HUGEINT) AS w
)"""
    steps = []
    for t in range(1, rounds + 1):
        steps.append(""", u{t} AS MATERIALIZED (
  SELECT cm.j, CAST(sum(cm.c * w{p}.w) AS HUGEINT) AS u
  FROM cm JOIN w{p} ON w{p}.j = cm.k GROUP BY cm.j
), w{t} AS MATERIALIZED (
  SELECT j, (u * 1048576) // (SELECT max(abs(u)) FROM u{t}) AS w
  FROM u{t}
)""".format(t=t, p=t - 1))
    tail = """
SELECT v.vec_id,
       CAST(sum(CAST(v.x AS HUGEINT) * w{r}.w) AS BIGINT) AS score
FROM v JOIN w{r} ON w{r}.j = v.j GROUP BY v.vec_id
""".format(r=rounds)
    return head + "".join(steps) + tail


DOC_ORACLES["pca_power"] = _pca_power_sql()


# kcenter_coreset: exact-integer greedy farthest-point replay. The
# pairwise distance table materializes ONCE (n² rows at oracle scale);
# each greedy round is then a LIMIT-1 selection + a least() fold, and
# the final assignment ranks (dd, selection order) per point.
def _kcenter_sql(k: int = 8) -> str:
    head = """WITH v AS MATERIALIZED (
  SELECT vec_id, i - 1 AS j,
         CAST(floor(1024.0 * CAST(embedding[i] AS DOUBLE)) AS BIGINT)
           AS x
  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) s
), pdist AS MATERIALIZED (
  SELECT a.vec_id AS pid, b.vec_id AS cid,
         CAST(sum((a.x - b.x) * (a.x - b.x)) AS BIGINT) AS dd
  FROM v a JOIN v b ON a.j = b.j GROUP BY a.vec_id, b.vec_id
), c1 AS (SELECT min(vec_id) AS cid FROM embeddings),
m1 AS MATERIALIZED (
  SELECT pid, dd FROM pdist WHERE cid = (SELECT cid FROM c1)
)"""
    steps = []
    for t in range(2, k + 1):
        steps.append(""", pick{t} AS MATERIALIZED (
  SELECT pid AS cid FROM m{p} ORDER BY dd DESC, pid LIMIT 1
), m{t} AS MATERIALIZED (
  SELECT m.pid, least(m.dd, p.dd) AS dd
  FROM m{p} m JOIN pdist p
    ON p.pid = m.pid AND p.cid = (SELECT cid FROM pick{t})
)""".format(t=t, p=t - 1))
    cents = ["SELECT (SELECT cid FROM c1) AS cid, 1 AS t"]
    for t in range(2, k + 1):
        cents.append("SELECT (SELECT cid FROM pick%d), %d" % (t, t))
    tail = """, cents AS MATERIALIZED (
  %s
)
SELECT pid AS vec_id, cid AS center, dd AS dist2 FROM (
  SELECT p.pid, p.cid, p.dd,
         row_number() OVER (PARTITION BY p.pid
                            ORDER BY p.dd, c.t) AS rk
  FROM pdist p JOIN cents c ON c.cid = p.cid
) WHERE rk = 1
""" % "\n  UNION ALL ".join(cents)
    return head + "".join(steps) + tail


DOC_ORACLES["kcenter_coreset"] = _kcenter_sql()

DOC_ORACLES["mutual_knn"] = """
WITH s AS (
  SELECT a.vec_id AS vid, b.vec_id AS nid,
         list_cosine_similarity(a.embedding, b.embedding) AS sim
  FROM embeddings a, embeddings b WHERE a.vec_id != b.vec_id
), r AS (
  SELECT vid, nid,
         row_number() OVER (PARTITION BY vid
                            ORDER BY sim DESC, nid) AS rk
  FROM s
), g AS (SELECT vid, nid, rk FROM r WHERE rk <= 5)
SELECT a.vid AS vec_id, a.nid AS neighbor_id,
       CAST(a.rk AS BIGINT) AS rank
FROM g a JOIN g b ON b.vid = a.nid AND b.nid = a.vid
"""


# sssp_weighted: fixed-round synchronous Bellman-Ford unrolled, one
# MATERIALIZED min-fold CTE per round over the rank-weighted
# symmetrized knn_graph edge set.
def _sssp_sql(rounds: int = 8, seed_mod: int = 97, k: int = 5) -> str:
    head = """WITH s AS (
  SELECT a.vec_id AS vid, b.vec_id AS nid,
         list_cosine_similarity(a.embedding, b.embedding) AS sim
  FROM embeddings a, embeddings b WHERE a.vec_id != b.vec_id
), r AS (
  SELECT vid, nid,
         row_number() OVER (PARTITION BY vid
                            ORDER BY sim DESC, nid) AS rk
  FROM s
), g AS MATERIALIZED (SELECT vid, nid, rk FROM r WHERE rk <= {k}),
e AS MATERIALIZED (
  SELECT vid AS src, nid AS dst, CAST(rk AS BIGINT) AS w FROM g
  UNION ALL
  SELECT nid, vid, CAST(rk AS BIGINT) FROM g
), d0 AS MATERIALIZED (
  SELECT vec_id AS node, CAST(0 AS BIGINT) AS dist FROM embeddings
  WHERE vec_id % {m} = 0
)""".format(k=k, m=seed_mod)
    steps = []
    for t in range(1, rounds + 1):
        steps.append(""", d{t} AS MATERIALIZED (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d{p}
    UNION ALL
    SELECT e.dst AS node, d{p}.dist + e.w AS dist
    FROM d{p} JOIN e ON e.src = d{p}.node
  ) GROUP BY node
)""".format(t=t, p=t - 1))
    tail = ("\nSELECT node AS vec_id, CAST(dist AS BIGINT) AS dist "
            "FROM d%d\n" % rounds)
    return head + "".join(steps) + tail


DOC_ORACLES["sssp_weighted"] = _sssp_sql()


# cross-user interval overlap join over the session table (closed
# intervals; pair emitted once — the engine's grid rule is exactly-once
# by construction, the oracle just enumerates)
DOC_ORACLES["session_overlap_pairs"] = (
    "WITH sess AS (" + DOC_ORACLES["session_table"] + ") "
    "SELECT a.user_id AS user_a, a.session_idx AS session_a,"
    " b.user_id AS user_b, b.session_idx AS session_b,"
    " CAST(least(a.end_us, b.end_us)"
    "      - greatest(a.start_us, b.start_us) AS BIGINT) AS ovl_us "
    "FROM sess a JOIN sess b ON a.user_id < b.user_id"
    " AND greatest(a.start_us, b.start_us) <= least(a.end_us, b.end_us)")

DOC_ORACLES["gzip_ndjson_roundtrip"] = _ROUNDTRIP_SQL


# Poisson-bootstrap means: the same u64 CDF literals, md5 uniforms and
# exact integer folds as traindata._POISSON1_TH
DOC_ORACLES["bootstrap_means"] = """
WITH th AS (
  SELECT * FROM (VALUES
    (0, 6786177901268885504::UBIGINT),
    (1, 13572355802537771008::UBIGINT),
    (2, 16965444753172213760::UBIGINT),
    (3, 18096474403383695360::UBIGINT),
    (4, 18379231815936565248::UBIGINT),
    (5, 18435783298447138816::UBIGINT),
    (6, 18445208545532233728::UBIGINT),
    (7, 18446555009401532416::UBIGINT)) t(k, thr)
), draws AS (
  SELECT b, d.n_chars,
         ('0x' || substr(md5('bs:' || b || ':' || d.doc_id), 1, 16))
           ::UBIGINT AS u
  FROM documents d,
       (SELECT unnest(generate_series(0, 15)) AS b) r
), wts AS (
  SELECT b, n_chars,
         (SELECT count(*) FROM th WHERE th.thr <= draws.u) AS w
  FROM draws
)
SELECT CAST(b AS BIGINT) AS replica,
       CAST(sum(w) AS BIGINT) AS n_eff,
       CAST(sum(w * n_chars) AS BIGINT) AS sum_chars,
       CAST((1000000 * CAST(sum(w * n_chars) AS HUGEINT))
            // sum(w) AS BIGINT) AS mean_q6
FROM wts GROUP BY b
"""


# Fellegi–Sunter linkage scores over the typo_pairs candidates:
# u-probabilities as exact collision sums, each weight ONE ln over one
# IEEE division of exact integers, fixed-order 3-term sum (the
# psi_drift float-portability contract)
DOC_ORACLES["linkage_scores"] = """
WITH v AS (SELECT DISTINCT c_name AS n FROM customer),
pairs AS (
  SELECT a.n AS name_a, b.n AS name_b
  FROM v a JOIN v b ON a.n < b.n AND levenshtein(a.n, b.n) <= 1),
mk AS (SELECT c_name, min(c_custkey) AS ck FROM customer
       GROUP BY c_name),
attr AS (
  SELECT mk.c_name AS n, c.c_nationkey AS nat, c.c_mktsegment AS seg
  FROM mk JOIN customer c ON c.c_custkey = mk.ck),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer),
u_nat AS (SELECT CAST(sum(c * c) AS BIGINT) AS s FROM
  (SELECT count(*) AS c FROM customer GROUP BY c_nationkey)),
u_seg AS (SELECT CAST(sum(c * c) AS BIGINT) AS s FROM
  (SELECT count(*) AS c FROM customer GROUP BY c_mktsegment)),
u_name AS (SELECT CAST(sum(c * c) AS BIGINT) AS s FROM
  (SELECT count(*) AS c FROM customer GROUP BY c_name)),
w AS (
  SELECT
    ln((19.0 * nn.n * nn.n) / (20.0 * u_name.s)) AS w_name,
    ln((19.0 * nn.n * nn.n) / (20.0 * u_nat.s)) AS wa_nat,
    ln((1.0 * nn.n * nn.n)
       / (20.0 * (nn.n * nn.n - u_nat.s))) AS wd_nat,
    ln((19.0 * nn.n * nn.n) / (20.0 * u_seg.s)) AS wa_seg,
    ln((1.0 * nn.n * nn.n)
       / (20.0 * (nn.n * nn.n - u_seg.s))) AS wd_seg
  FROM nn, u_nat, u_seg, u_name)
SELECT p.name_a, p.name_b,
  CAST(CASE WHEN a1.nat = a2.nat THEN 1 ELSE 0 END AS BIGINT)
    AS agree_nation,
  CAST(CASE WHEN a1.seg = a2.seg THEN 1 ELSE 0 END AS BIGINT)
    AS agree_segment,
  CAST(floor(1000000.0 * (
    (w.w_name + CASE WHEN a1.nat = a2.nat THEN w.wa_nat
                     ELSE w.wd_nat END)
    + CASE WHEN a1.seg = a2.seg THEN w.wa_seg ELSE w.wd_seg END))
    AS BIGINT) AS score_q6
FROM pairs p
JOIN attr a1 ON a1.n = p.name_a
JOIN attr a2 ON a2.n = p.name_b, w
"""


# KMV join-overlap sketch replayed exactly: k-min hash sets per side,
# union sketch, resemblance, and the (k-1)*2^64 // kth estimators
DOC_ORACLES["kmv_join_overlap"] = """
WITH so AS (
  SELECT DISTINCT ('0x' || substr(md5('kmv:' || o_custkey), 1, 16))
           ::UBIGINT AS h
  FROM orders ORDER BY h LIMIT 256
), sc AS (
  SELECT DISTINCT ('0x' || substr(md5('kmv:' || c_custkey), 1, 16))
           ::UBIGINT AS h
  FROM customer ORDER BY h LIMIT 256
), ss AS (
  SELECT DISTINCT ('0x' || substr(md5('kmv:' || l_suppkey), 1, 16))
           ::UBIGINT AS h
  FROM lineitem ORDER BY h LIMIT 256
), r1 AS (
  SELECT 'orders_custkey~customer_custkey' AS pair,
    (SELECT CAST(count(*) AS BIGINT) FROM
      (SELECT h FROM (SELECT h FROM so UNION SELECT h FROM sc)
       ORDER BY h LIMIT 256)) AS k_used,
    (SELECT CAST(count(*) AS BIGINT) FROM
      (SELECT h FROM (SELECT h FROM so UNION SELECT h FROM sc)
       ORDER BY h LIMIT 256)
     WHERE h IN (SELECT h FROM so) AND h IN (SELECT h FROM sc))
      AS matches,
    (SELECT count(*) FROM so) AS ca,
    (SELECT max(h) FROM so) AS ka,
    (SELECT count(*) FROM sc) AS cb,
    (SELECT max(h) FROM sc) AS kb
), r2 AS (
  SELECT 'orders_custkey~lineitem_suppkey' AS pair,
    (SELECT CAST(count(*) AS BIGINT) FROM
      (SELECT h FROM (SELECT h FROM so UNION SELECT h FROM ss)
       ORDER BY h LIMIT 256)) AS k_used,
    (SELECT CAST(count(*) AS BIGINT) FROM
      (SELECT h FROM (SELECT h FROM so UNION SELECT h FROM ss)
       ORDER BY h LIMIT 256)
     WHERE h IN (SELECT h FROM so) AND h IN (SELECT h FROM ss))
      AS matches,
    (SELECT count(*) FROM so) AS ca,
    (SELECT max(h) FROM so) AS ka,
    (SELECT count(*) FROM ss) AS cb,
    (SELECT max(h) FROM ss) AS kb
), allr AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
SELECT pair, k_used, matches,
       CAST(1000000 * matches // k_used AS BIGINT) AS jacc_est_ppm,
       CAST(CASE WHEN ca < 256 THEN ca
            ELSE (CAST(ca - 1 AS HUGEINT)
                  * 18446744073709551616) // ka END AS BIGINT)
         AS est_distinct_a,
       CAST(CASE WHEN cb < 256 THEN cb
            ELSE (CAST(cb - 1 AS HUGEINT)
                  * 18446744073709551616) // kb END AS BIGINT)
         AS est_distinct_b
FROM allr
"""

# Benford leading-digit audit: integer-to-string leading digit (both
# engines portable), expected counts through the shared-libm ln tree
DOC_ORACLES["benford_digits"] = """
WITH cents AS (
  SELECT CAST(floor(100.0 * o_totalprice) AS BIGINT) AS c FROM orders
), dg AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM cents
), h AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM dg GROUP BY digit
), tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM h),
d9 AS (SELECT unnest(generate_series(1, 9)) AS digit)
SELECT d9.digit, CAST(COALESCE(h.n, 0) AS BIGINT) AS n,
  CAST(floor((1000000.0 * tot.t)
             * (ln((d9.digit + 1.0) / d9.digit) / ln(10.0)))
       AS BIGINT) AS expected_q6,
  CAST((1000000 * (1000000 * CAST(COALESCE(h.n, 0) AS HUGEINT)
        - CAST(floor((1000000.0 * tot.t)
               * (ln((d9.digit + 1.0) / d9.digit) / ln(10.0)))
          AS HUGEINT)))
       // (1000000 * CAST(tot.t AS HUGEINT)) AS BIGINT) AS dev_ppm
FROM d9 LEFT JOIN h ON h.digit = d9.digit, tot
"""

# Manku simhash near-dup pairing: the ENTIRE chain — signature,
# pigeonhole banding, hamming verify — replayed relationally; bit_count
# over xor of the UBIGINT signatures is the popcount verify
DOC_ORACLES["simhash_pairs"] = """
WITH toks AS (
  SELECT doc_id,
         ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 16))::UBIGINT AS th
  FROM documents
), bitvotes AS (
  SELECT doc_id, b AS bit,
         count(*) FILTER (WHERE (th >> b) & 1 = 1) AS ones,
         count(*) AS total
  FROM toks, (SELECT unnest(generate_series(0, 63)) AS b)
  GROUP BY doc_id, b
), s AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN 2 * ones > total THEN (1::UBIGINT << bit)
                       ELSE 0::UBIGINT END) AS UBIGINT) AS sh
  FROM bitvotes GROUP BY doc_id
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3
"""

# Prefix-filtering exact set-similarity join (Chaudhuri ICDE'06 /
# Bayardo All-Pairs WWW'07): the oracle is the unblocked all-pairs
# truth — any pair the banded engine missed or fabricated breaks the
# hash; integer 5·|A∩B| >= 4·|A∪B| threshold, same floor quantization
DOC_ORACLES["ssjoin_prefix"] = """
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST((1048576 * len(list_intersect(a.toks, b.toks)))
            // (len(a.toks) + len(b.toks)
                - len(list_intersect(a.toks, b.toks))) AS BIGINT) AS sim_q
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE 5 * len(list_intersect(a.toks, b.toks))
      >= 4 * (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
"""

# content-defined chunking: boundary = token with md5-u64 % 16 = 0
# (ends its chunk); chunk index = count of strictly-earlier boundaries
# (window sum); chunk digest = md5 of the space-joined span
DOC_ORACLES["cdc_chunks"] = r"""
WITH toks AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t))) AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
), flagged AS (
  SELECT doc_id, pos, t[pos] AS tok,
         CASE WHEN ('0x' || substr(md5(t[pos]), 1, 16))::UBIGINT % 16 = 0
              THEN 1 ELSE 0 END AS b
  FROM toks
), idx AS (
  SELECT doc_id, pos, tok,
         coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS chunk_idx
  FROM flagged
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(min(pos) - 1 AS BIGINT) AS start_tok,
       CAST(count(*) AS BIGINT) AS n_tokens,
       md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
FROM idx GROUP BY doc_id, chunk_idx
"""


def _set_cover_sql(k: int = 8) -> str:
    """Greedy max-coverage unrolled: one MATERIALIZED gain/winner/
    covered CTE triple per round (DuckDB re-inlines un-materialized
    chains exponentially — the perceptron lesson)."""
    parts = ["t AS MATERIALIZED (SELECT DISTINCT doc_id,"
             " array_to_string(s[i:i+2], ' ') AS tok"
             " FROM (SELECT doc_id, string_split(text, ' ') AS s,"
             " unnest(generate_series(1, len(string_split(text, ' ')) - 2))"
             " AS i FROM documents))"]
    for r in range(1, k + 1):
        if r == 1:
            gain = "SELECT doc_id, count(*) AS gain FROM t GROUP BY doc_id"
        else:
            gain = ("SELECT doc_id, count(*) AS gain FROM t"
                    " WHERE tok NOT IN (SELECT tok FROM c%d)"
                    " GROUP BY doc_id" % (r - 1))
        parts.append("g%d AS MATERIALIZED (%s)" % (r, gain))
        parts.append("w%d AS MATERIALIZED (SELECT %d AS rnd, doc_id, gain"
                     " FROM g%d ORDER BY gain DESC, doc_id LIMIT 1)"
                     % (r, r, r))
        if r == 1:
            parts.append("c1 AS MATERIALIZED (SELECT DISTINCT tok"
                         " FROM t JOIN w1 USING (doc_id))")
        else:
            parts.append("c%d AS MATERIALIZED (SELECT tok FROM c%d"
                         " UNION SELECT tok FROM t JOIN w%d USING (doc_id))"
                         % (r, r - 1, r))
    union = " UNION ALL ".join("SELECT * FROM w%d" % r
                               for r in range(1, k + 1))
    return ("WITH " + ",\n".join(parts) +
            "\nSELECT CAST(rnd AS BIGINT) AS rnd,"
            " CAST(doc_id AS BIGINT) AS doc_id,"
            " CAST(gain AS BIGINT) AS gain,"
            " CAST(sum(gain) OVER (ORDER BY rnd) AS BIGINT)"
            " AS covered_after FROM (" + union + ")")


DOC_ORACLES["greedy_set_cover"] = _set_cover_sql()

# streaming debounce: kept-chain walk replayed as a recursive CTE over
# the (user, type) position chain — the rate_limit_replay pattern; the
# kept decision feeds the next last_kept, which lag() cannot express
DOC_ORACLES["debounce_events"] = """
WITH RECURSIVE o AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS tus,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS pos
  FROM events),
walk AS (
  SELECT user_id, event_type, event_id, tus, pos,
         CAST(1 AS BIGINT) AS kept, tus AS last_kept
  FROM o WHERE pos = 1
  UNION ALL
  SELECT o.user_id, o.event_type, o.event_id, o.tus, o.pos,
         CAST(CASE WHEN o.tus - w.last_kept >= 86400000000
              THEN 1 ELSE 0 END AS BIGINT),
         CASE WHEN o.tus - w.last_kept >= 86400000000
              THEN o.tus ELSE w.last_kept END
  FROM walk w JOIN o ON o.user_id = w.user_id
                    AND o.event_type = w.event_type
                    AND o.pos = w.pos + 1)
SELECT user_id, event_type, event_id, kept FROM walk
"""

# ranking window trio: ROW_NUMBER / NTILE(4) / peer-inclusive
# cumulative count (CUME_DIST's integer numerator — no float ratio)
DOC_ORACLES["ntile_buckets"] = """
SELECT doc_id, lang, n_chars,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(ntile(4) OVER w AS BIGINT) AS ntile4,
       CAST(count(*) OVER (PARTITION BY lang ORDER BY n_chars)
            AS BIGINT) AS cume_cnt
FROM documents
WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)
"""


def _luby_sql(rounds: int = 8) -> str:
    """Exact mirror of components.luby_mis: jaccard_pairs edge CTE,
    md5 priorities, and ``rounds`` unrolled two-phase Luby steps —
    an undecided node with an MIS neighbour is excluded, else it
    enters the MIS iff no undecided neighbour beats it on
    (prio, node). Fixed-round on both sides."""
    parts = ["""
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text,' ')) AS toks,
         string_split(text,' ')[1] AS blk FROM documents
), e0 AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= 0.8
), adj AS (
  SELECT a AS node, b AS nbr FROM e0
  UNION ALL SELECT b, a FROM e0
), p AS (
  SELECT DISTINCT node,
         CAST((('0x' || substr(md5('mis:' || node), 1, 16))::UBIGINT >> 1)
              AS BIGINT) AS prio
  FROM adj
), s0 AS (
  SELECT DISTINCT node, CAST(0 AS BIGINT) AS status FROM adj
)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
s{r} AS MATERIALIZED (
  SELECT s.node,
    CAST(CASE WHEN s.status <> 0 THEN s.status
         WHEN EXISTS (
           SELECT 1 FROM adj a JOIN s{r - 1} t ON t.node = a.nbr
           WHERE a.node = s.node AND t.status = 1) THEN 2
         WHEN NOT EXISTS (
           SELECT 1 FROM adj a JOIN s{r - 1} t ON t.node = a.nbr
           JOIN p pn ON pn.node = a.nbr JOIN p po ON po.node = s.node
           WHERE a.node = s.node AND t.status = 0
             AND (pn.prio < po.prio
                  OR (pn.prio = po.prio AND a.nbr < s.node))) THEN 1
         ELSE 0 END AS BIGINT) AS status
  FROM s{r - 1} s)""")
    parts.append(f"""
SELECT node AS doc_id, status FROM s{rounds}""")
    return "".join(parts)


DOC_ORACLES["luby_mis"] = _luby_sql()

# lagged cross-correlation: same dense-grid + integer-numerator
# contract as autocorr_daily, one row per lag 0..7
DOC_ORACLES["xcorr_daily"] = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         count(*) AS n
  FROM events GROUP BY event_type, day),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM c),
grid AS (
  SELECT t.event_type, d.day, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM events
        WHERE event_type IN ('view', 'purchase')) t
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM span),
                                            (SELECT hi FROM span)))
              AS day) d
  LEFT JOIN c ON c.event_type = t.event_type AND c.day = d.day),
x AS (SELECT day, n FROM grid WHERE event_type = 'view'),
y AS (SELECT day, n FROM grid WHERE event_type = 'purchase'),
pairs AS (
  SELECT l.lag, x.n AS xv, y.n AS yv
  FROM (SELECT unnest(generate_series(0, 7)) AS lag) l
  JOIN x ON true
  JOIN y ON y.day = x.day + l.lag)
SELECT CAST(lag AS BIGINT) AS lag,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(*) * sum(xv * yv) - sum(xv) * sum(yv) AS BIGINT)
         AS cov_num,
       CAST(count(*) * sum(xv * xv) - sum(xv) * sum(xv) AS BIGINT)
         AS var_x_num,
       CAST(count(*) * sum(yv * yv) - sum(yv) * sum(yv) AS BIGINT)
         AS var_y_num
FROM pairs GROUP BY lag
"""

# Sorted Neighborhood Method: global rank over the scrambling sort key
# (reversed name — unique, so the order is total), pairs within the
# rank window, gap = rank distance
DOC_ORACLES["snm_pairs"] = """
WITH r AS (
  SELECT c_name AS name,
         row_number() OVER (ORDER BY reverse(c_name)) AS rk
  FROM customer)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(b.rk - a.rk AS BIGINT) AS gap
FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 5
"""

# Page's CUSUM over the dense grid: the clamped walk is a recursive
# CTE over the (type, position) chain; ref/threshold exact integers
DOC_ORACLES["cusum_changepoint"] = """
WITH RECURSIVE c0 AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS n
  FROM events GROUP BY event_type, day),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM c0),
grid AS (
  SELECT t.event_type, d.day, COALESCE(c0.n, 0) AS n,
         row_number() OVER (PARTITION BY t.event_type ORDER BY d.day)
           AS pos
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM span),
                                            (SELECT hi FROM span)))
              AS day) d
  LEFT JOIN c0 ON c0.event_type = t.event_type AND c0.day = d.day),
ref AS (
  SELECT event_type, CAST(sum(n) // count(*) AS BIGINT) AS ref
  FROM grid GROUP BY event_type),
walk AS (
  SELECT g.event_type, g.day, g.pos,
         greatest(0, g.n - r.ref) AS s
  FROM grid g JOIN ref r USING (event_type) WHERE g.pos = 1
  UNION ALL
  SELECT g.event_type, g.day, g.pos,
         greatest(0, w.s + g.n - r.ref)
  FROM walk w
  JOIN grid g ON g.event_type = w.event_type AND g.pos = w.pos + 1
  JOIN ref r ON r.event_type = g.event_type)
SELECT w.event_type, w.day, CAST(w.s AS BIGINT) AS cusum,
       CAST(CASE WHEN w.s > r.ref // 2 THEN 1 ELSE 0 END AS BIGINT)
         AS alarm
FROM walk w JOIN ref r USING (event_type)
"""

# storage-layout co-partitioned join: the oracle is the plain join +
# aggregate truth — a wrong bucket routing loses/duplicates custkeys
# and breaks the hash
DOC_ORACLES["bucketed_join"] = """
SELECT c.c_custkey AS custkey,
       CAST(c.c_nationkey AS BIGINT) AS nationkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_cents
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_nationkey
"""


def _wordpiece_sql(num_merges: int = 4) -> str:
    """Replay of traindata.wordpiece_encode: the bpe_train chain
    supplies the learned pieces; the longest-match step table m(word,
    pos → step) is precomputed non-recursively (DuckDB recursive terms
    reject correlated subqueries), and the greedy cursor walk is a
    recursive join over it."""
    union_pieces = " UNION SELECT l || r AS piece FROM b%d" * num_merges
    union_pieces = union_pieces % tuple(range(1, num_merges + 1))
    return _bpe_chain(num_merges, walk_through_last=False) + f"""
, pieces AS MATERIALIZED (
  SELECT DISTINCT substr(word, i, 1) AS piece
  FROM vocab, unnest(generate_series(1, len(word))) t(i)
  {union_pieces}
), m AS MATERIALIZED (
  SELECT v.word, t.i AS pos, max(len(p.piece)) AS step
  FROM vocab v, unnest(generate_series(1, len(v.word))) t(i)
  JOIN pieces p ON substr(v.word, t.i, len(p.piece)) = p.piece
  GROUP BY 1, 2
), wpwalk(word, pos, cnt) AS (
  SELECT word, 1, 0 FROM vocab
  UNION ALL
  SELECT w.word, w.pos + m.step, w.cnt + 1
  FROM wpwalk w JOIN m ON m.word = w.word AND m.pos = w.pos
), wl AS (
  SELECT word, CAST(cnt AS BIGINT) AS n
  FROM wpwalk WHERE pos > len(word)
), dt AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(wl.n) AS BIGINT) AS n_wp_tokens
FROM dt d JOIN wl ON wl.word = d.word
GROUP BY d.doc_id
"""


DOC_ORACLES["wordpiece_encode"] = _wordpiece_sql()

# zone-map pruning: the oracle is the plain range scan — pruning may
# only change which bytes are read, never the answer
DOC_ORACLES["zonemap_pruned_read"] = """
SELECT doc_id, lang,
       CAST(length(text) AS BIGINT) AS n_chars_rt,
       md5(text) AS text_md5
FROM documents WHERE length(text) BETWEEN 200 AND 280
"""

# Theil-Sen: pairwise trunc-division slopes over the dense grid,
# lower-median via quantile_disc on both slope and intercept
DOC_ORACLES["theil_sen_daily"] = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS n
  FROM events GROUP BY event_type, day),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM c),
grid AS (
  SELECT t.event_type, d.day, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM span),
                                            (SELECT hi FROM span)))
              AS day) d
  LEFT JOIN c ON c.event_type = t.event_type AND c.day = d.day),
slopes AS (
  SELECT a.event_type,
         (1000000 * (b.n - a.n)) // (b.day - a.day) AS s
  FROM grid a JOIN grid b
    ON b.event_type = a.event_type AND b.day > a.day),
med AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(quantile_disc(s, 0.5) AS BIGINT) AS slope_q6_med
  FROM slopes GROUP BY event_type)
SELECT m.event_type, m.n_pairs, m.slope_q6_med,
       CAST(quantile_disc(1000000 * g.n - m.slope_q6_med * g.day, 0.5)
            AS BIGINT) AS intercept_q6
FROM grid g JOIN med m USING (event_type)
GROUP BY m.event_type, m.n_pairs, m.slope_q6_med
"""

# point-in-time join: composes the independently-oracled scd2 CTE; the
# [from, to) containment gives exactly one version per fact
DOC_ORACLES["pit_join"] = (
    "WITH s AS (" + DOC_ORACLES["scd2_intervals"] + """),
f AS (
  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS tus
  FROM events WHERE event_type = 'purchase')
SELECT f.event_id, f.user_id, s.event_id AS version_event_id,
       CAST(f.tus - s.valid_from_us AS BIGINT) AS age_us
FROM f JOIN s ON s.user_id = f.user_id
             AND f.tus >= s.valid_from_us AND f.tus < s.valid_to_us
""")

# exact two-sample KS: denominator-cleared max CDF gap over the
# bounded length domain; ties broken to the smallest attaining length
DOC_ORACLES["ks_drift"] = """
WITH s AS (
  SELECT CAST(('0x' || substr(md5(doc_id || ':psi'), 1, 16))::UBIGINT
              % 2 AS BIGINT) AS split,
         length(text) AS v
  FROM documents),
tot AS (
  SELECT sum(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS n_a,
         sum(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS n_b
  FROM s),
cum AS (
  SELECT v,
         sum(sum(CASE WHEN split = 0 THEN 1 ELSE 0 END))
           OVER (ORDER BY v) AS cum_a,
         sum(sum(CASE WHEN split = 1 THEN 1 ELSE 0 END))
           OVER (ORDER BY v) AS cum_b
  FROM s GROUP BY v),
gaps AS (
  SELECT v, abs(cum_a * tot.n_b - cum_b * tot.n_a) AS d
  FROM cum, tot)
SELECT CAST(tot.n_a AS BIGINT) AS n_a, CAST(tot.n_b AS BIGINT) AS n_b,
       CAST((SELECT max(d) FROM gaps) AS BIGINT) AS d_num,
       CAST(tot.n_a * tot.n_b AS BIGINT) AS d_den,
       CAST((SELECT min(v) FROM gaps
             WHERE d = (SELECT max(d) FROM gaps)) AS BIGINT) AS at_value
FROM tot
"""

# CSN power-law MLE: degrees from the jaccard edge CTE, one shared-libm
# ln per distinct degree, integer-weighted order-independent sum
DOC_ORACLES["powerlaw_alpha"] = """
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text,' ')) AS toks,
         string_split(text,' ')[1] AS blk FROM documents
), e0 AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= 0.8
), deg AS (
  SELECT node, count(*) AS dg FROM (
    SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
  GROUP BY node
), h AS (
  SELECT dg, count(*) AS cnt FROM deg GROUP BY dg
), agg AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(cnt * CAST(floor(1000000.0 * ln(CAST(dg AS DOUBLE)))
                             AS BIGINT)) AS BIGINT) AS s_q6,
         CAST(max(dg) AS BIGINT) AS d_max
  FROM h)
SELECT n AS n_nodes, s_q6,
       CAST(1000000 + (1000000000000 * CAST(n AS HUGEINT)) // s_q6
            AS BIGINT) AS alpha_q6,
       d_max
FROM agg
"""

# exact silhouette over the kmeans_lloyd clustering: the pairwise sum
# collapses to cluster sufficient statistics (n·|x|² + Q − 2x·M);
# fraction order by cross-multiplication, trunc-division quantization
DOC_ORACLES["silhouette_eval"] = (
    "WITH km AS MATERIALIZED (SELECT * FROM ("
    + DOC_ORACLES["kmeans_lloyd"] + """) t),
v2 AS MATERIALIZED (
  SELECT vec_id, i - 1 AS j,
         CAST(floor(1024.0 * CAST(embedding[i] AS DOUBLE)) AS BIGINT)
           AS x
  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) s),
nrm AS MATERIALIZED (
  SELECT vec_id, CAST(sum(x * x) AS BIGINT) AS q FROM v2
  GROUP BY vec_id),
cs AS MATERIALIZED (
  SELECT km.cluster, v2.j, CAST(sum(v2.x) AS BIGINT) AS m
  FROM v2 JOIN km USING (vec_id) GROUP BY 1, 2),
cn AS MATERIALIZED (
  SELECT km.cluster, CAST(count(*) AS BIGINT) AS n_c,
         CAST(sum(nrm.q) AS BIGINT) AS qc
  FROM km JOIN nrm USING (vec_id) GROUP BY 1),
dots AS MATERIALIZED (
  SELECT v2.vec_id, cs.cluster, CAST(sum(v2.x * cs.m) AS BIGINT) AS dot
  FROM v2 JOIN cs USING (j) GROUP BY 1, 2),
sic AS MATERIALIZED (
  SELECT d.vec_id, d.cluster,
         cn.n_c * nrm.q + cn.qc - 2 * d.dot AS ss, cn.n_c
  FROM dots d JOIN cn USING (cluster)
  JOIN nrm ON nrm.vec_id = d.vec_id),
own AS (
  SELECT s.vec_id, km.cluster, s.ss AS sa, s.n_c - 1 AS da
  FROM sic s JOIN km ON km.vec_id = s.vec_id
                    AND km.cluster = s.cluster),
cand AS (
  SELECT s.vec_id, s.cluster, s.ss, s.n_c
  FROM sic s JOIN km ON km.vec_id = s.vec_id
                    AND km.cluster <> s.cluster
  WHERE s.n_c > 0),
best AS (
  SELECT c1.vec_id, c1.cluster AS b_cluster, c1.ss AS sb,
         c1.n_c AS db
  FROM cand c1 WHERE NOT EXISTS (
    SELECT 1 FROM cand c2 WHERE c2.vec_id = c1.vec_id
      AND (c2.ss * c1.n_c < c1.ss * c2.n_c
           OR (c2.ss * c1.n_c = c1.ss * c2.n_c
               AND c2.cluster < c1.cluster))))
SELECT o.vec_id, o.cluster, b.b_cluster,
       CAST(CASE WHEN o.da <= 0 THEN 0
                 WHEN greatest(o.sa * b.db, b.sb * o.da) = 0 THEN 0
                 ELSE (1000000 * CAST(b.sb * o.da - o.sa * b.db
                                      AS HUGEINT))
                      // CAST(greatest(o.sa * b.db, b.sb * o.da)
                              AS HUGEINT)
            END AS BIGINT) AS s_q6
FROM own o JOIN best b USING (vec_id)
""")

# rendezvous hashing: per-(doc, shard) md5 weights, argmax via
# row_number (u64 compare == the engine's uint64 argmax; ties
# impossible at md5 scale but broken identically by shard)
DOC_ORACLES["hrw_assign"] = """
WITH w AS (
  SELECT doc_id, s AS shard,
         ('0x' || substr(md5(doc_id || ':shard' || s), 1, 16))::UBIGINT
           AS h
  FROM documents, (SELECT unnest(generate_series(0, 7)) AS s)),
r AS (
  SELECT doc_id, shard, h,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY h DESC, shard) AS rn
  FROM w)
SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       CAST(h >> 1 AS BIGINT) AS win_hash
FROM r WHERE rn = 1
"""

# leakage-safe grouped K-fold: component = min reachable doc through
# the near-dup graph (self if isolated), fold from md5 of the label
DOC_ORACLES["group_kfold"] = r"""
WITH RECURSIVE d AS (
  SELECT doc_id, list_distinct(string_split(text,' ')) AS toks,
         string_split(text,' ')[1] AS blk FROM documents
), p AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= 0.8
), e AS (
  SELECT a, b FROM p UNION SELECT b, a FROM p
), reach AS (
  SELECT a AS node, b AS r FROM e
  UNION
  SELECT reach.node, e.b FROM reach JOIN e ON reach.r = e.a
), comp AS (
  SELECT doc_id,
         COALESCE((SELECT least(min(r), doc_id) FROM reach
                   WHERE node = doc_id), doc_id) AS component
  FROM documents)
SELECT doc_id, component,
       CAST(('0x' || substr(md5('fold:' || component), 1, 16))::UBIGINT
            % 5 AS BIGINT) AS fold
FROM comp
"""

# scene cuts: SAD between consecutive frames replayed from document
# bytes (frame f pixel p = codepoint at f*128+p+1, zero-padded tail)
DOC_ORACLES["scene_cuts"] = """
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
fr AS (
  SELECT doc_id, text, n, greatest(1, (n + 127) // 128) AS nf FROM d),
fs AS (
  SELECT doc_id, text, n,
         unnest(generate_series(1, nf - 1)) AS frame_idx
  FROM fr WHERE nf > 1),
px AS (
  SELECT doc_id, frame_idx,
         abs(CASE WHEN frame_idx * 128 + i <= n
                  THEN ascii(substr(text, frame_idx * 128 + i, 1))
                  ELSE 0 END
             - CASE WHEN (frame_idx - 1) * 128 + i <= n
                    THEN ascii(substr(text, (frame_idx - 1) * 128 + i, 1))
                    ELSE 0 END) AS dv
  FROM fs, (SELECT unnest(generate_series(1, 128)) AS i) s)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(sum(dv) AS BIGINT) AS sad,
       CAST(CASE WHEN sum(dv) > 4096 THEN 1 ELSE 0 END AS BIGINT)
         AS is_cut
FROM px GROUP BY doc_id, frame_idx
"""

# AMS F2 sketch: md5-parity signs make the linear sketch exactly
# replayable — z_sum per sketch from the token-instance stream
DOC_ORACLES["ams_f2"] = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
z AS (
  SELECT s.s AS sketch_id,
         CAST(sum(CASE WHEN ('0x' || substr(md5(s.s || ':' || tok),
                                            1, 16))::UBIGINT % 2 = 0
                       THEN 1 ELSE -1 END) AS BIGINT) AS z_sum
  FROM toks, (SELECT unnest(generate_series(0, 15)) AS s) s
  GROUP BY s.s)
SELECT sketch_id, z_sum, CAST(z_sum * z_sum AS BIGINT) AS z2 FROM z
"""

# Cohen's kappa between the heuristic and trained language classifiers:
# both full prediction chains nested as derived tables, margins joined
DOC_ORACLES["classifier_agreement"] = (
    "WITH nb AS MATERIALIZED (SELECT * FROM ("
    + DOC_ORACLES["naive_bayes_langid"] + """)),
j AS (SELECT d.lang AS a, nb.nb_pred AS b
      FROM documents d JOIN nb USING (doc_id)),
ct AS (SELECT a, b, count(*) AS c FROM j GROUP BY a, b),
rm AS (SELECT a AS l, sum(c) AS rc FROM ct GROUP BY a),
cm AS (SELECT b AS l, sum(c) AS cc FROM ct GROUP BY b),
agg AS (
  SELECT (SELECT sum(c) FROM ct) AS n,
         (SELECT COALESCE(sum(c), 0) FROM ct WHERE a = b) AS diag,
         (SELECT sum(rm.rc * cm.cc)
          FROM rm JOIN cm USING (l)) AS pe_num)
SELECT CAST(n AS BIGINT) AS n_docs, CAST(diag AS BIGINT) AS n_agree,
       CAST(pe_num AS BIGINT) AS pe_num,
       CAST((1000000 * CAST(n * diag - pe_num AS HUGEINT))
            // CAST(n * n - pe_num AS HUGEINT) AS BIGINT) AS kappa_q6
FROM agg
""")

# Kendall-tau rank stability of the global top-20 terms between the
# md5-parity halves; within-half ranks by (count DESC, token)
DOC_ORACLES["rank_stability"] = """
WITH toks AS (
  SELECT CAST(('0x' || substr(md5(doc_id || ':psi'), 1, 16))::UBIGINT
              % 2 AS BIGINT) AS split,
         unnest(string_split(text, ' ')) AS tok
  FROM documents),
counts AS (SELECT split, tok, count(*) AS n FROM toks GROUP BY 1, 2),
tot AS (SELECT tok, sum(n) AS n FROM counts GROUP BY tok),
top AS (SELECT tok FROM tot ORDER BY n DESC, tok LIMIT 20),
ra AS (
  SELECT top.tok,
         row_number() OVER (ORDER BY COALESCE(c.n, 0) DESC, top.tok)
           AS r
  FROM top LEFT JOIN counts c ON c.tok = top.tok AND c.split = 0),
rb AS (
  SELECT top.tok,
         row_number() OVER (ORDER BY COALESCE(c.n, 0) DESC, top.tok)
           AS r
  FROM top LEFT JOIN counts c ON c.tok = top.tok AND c.split = 1),
pr AS (
  SELECT (a1.r - a2.r) * (b1.r - b2.r) AS s
  FROM ra a1 JOIN ra a2 ON a1.tok < a2.tok
  JOIN rb b1 ON b1.tok = a1.tok
  JOIN rb b2 ON b2.tok = a2.tok),
agg AS (
  SELECT count(*) AS np,
         sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS c,
         sum(CASE WHEN s > 0 THEN 0 ELSE 1 END) AS d
  FROM pr)
SELECT CAST((SELECT count(*) FROM top) AS BIGINT) AS n_terms,
       CAST(np AS BIGINT) AS n_pairs, CAST(c AS BIGINT) AS concordant,
       CAST(d AS BIGINT) AS discordant,
       CAST((1000000 * (c - d)) // np AS BIGINT) AS tau_q6
FROM agg
"""

# incremental delta-vs-base dedup on the first-5-token key: a delta
# (odd) doc duplicates iff a base (even) doc or an earlier delta doc
# shares its key; dup_of = the minimum such doc_id
DOC_ORACLES["delta_dedup"] = """
WITH k AS (
  SELECT doc_id,
         array_to_string(string_split(text, ' ')[1:5], ' ') AS key
  FROM documents),
delta AS (SELECT * FROM k WHERE doc_id % 2 = 1),
cand AS (
  SELECT d.doc_id, min(o.doc_id) AS dup_of
  FROM delta d JOIN k o
    ON o.key = d.key
   AND (o.doc_id % 2 = 0 OR o.doc_id < d.doc_id)
  GROUP BY d.doc_id)
SELECT d.doc_id,
       CAST(CASE WHEN c.dup_of IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS is_dup,
       CAST(COALESCE(c.dup_of, -1) AS BIGINT) AS dup_of
FROM delta d LEFT JOIN cand c USING (doc_id)
"""

# Bloomjoin pruning ledger: the filter's bits replay exactly from md5,
# so pass/true/false-positive counts are all oracle-checkable
DOC_ORACLES["bloom_semijoin"] = """
WITH seg AS (
  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
bset AS (
  SELECT DISTINCT ('0x' || substr(md5(h.h || ':ck' || k), 1, 16))::UBIGINT
           % 4096 AS bit
  FROM seg, (SELECT unnest(generate_series(0, 1)) AS h) h),
o AS (
  SELECT o_custkey AS ck,
         (SELECT count(*) FROM (SELECT unnest(generate_series(0, 1)) AS h) h
          WHERE ('0x' || substr(md5(h.h || ':ck' || o_custkey), 1, 16))::UBIGINT
                % 4096 IN (SELECT bit FROM bset)) = 2 AS pass,
         o_custkey IN (SELECT k FROM seg) AS tru
  FROM orders)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pass_bloom,
       CAST(sum(CASE WHEN pass AND tru THEN 1 ELSE 0 END) AS BIGINT)
         AS n_true_match,
       CAST(sum(CASE WHEN pass AND NOT tru THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_positive
FROM o
"""

# merkle range checksums: both snapshots' row checksums summed mod 2^63
# per (level, key range); FULL OUTER on the cell table, missing side 0
DOC_ORACLES["merkle_ranges"] = """
WITH a AS (
  SELECT doc_id AS k, md5(text) AS h FROM documents),
b0 AS (
  SELECT doc_id, text,
         ('0x' || substr(md5(doc_id || ':mk'), 1, 16))::UBIGINT % 100
           AS r
  FROM documents),
b AS (
  SELECT doc_id AS k,
         md5(CASE WHEN r = 1 THEN text || ' v2' ELSE text END) AS h
  FROM b0 WHERE r <> 0
  UNION ALL
  SELECT doc_id + 1000000000, md5('added doc ' || doc_id)
  FROM b0 WHERE r = 2),
ca AS (
  SELECT lvl.level,
         CASE WHEN lvl.level = 0 THEN k // 8 ELSE k // 64 END
           AS range_id,
         CAST(sum(CAST(('0x' || substr(md5(k || ':' || h), 1, 16))
                       ::UBIGINT % 9223372036854775808 AS HUGEINT))
              % 9223372036854775808 AS BIGINT) AS ck
  FROM a, (SELECT unnest([0, 1]) AS level) lvl
  GROUP BY 1, 2),
cb AS (
  SELECT lvl.level,
         CASE WHEN lvl.level = 0 THEN k // 8 ELSE k // 64 END
           AS range_id,
         CAST(sum(CAST(('0x' || substr(md5(k || ':' || h), 1, 16))
                       ::UBIGINT % 9223372036854775808 AS HUGEINT))
              % 9223372036854775808 AS BIGINT) AS ck
  FROM b, (SELECT unnest([0, 1]) AS level) lvl
  GROUP BY 1, 2)
SELECT COALESCE(ca.level, cb.level) AS level,
       COALESCE(ca.range_id, cb.range_id) AS range_id,
       CAST(COALESCE(ca.ck, 0) AS BIGINT) AS ck_a,
       CAST(COALESCE(cb.ck, 0) AS BIGINT) AS ck_b,
       CAST(CASE WHEN COALESCE(ca.ck, 0) <> COALESCE(cb.ck, 0)
            THEN 1 ELSE 0 END AS BIGINT) AS differs
FROM ca FULL OUTER JOIN cb
  ON cb.level = ca.level AND cb.range_id = ca.range_id
"""

# Mann-Kendall S + tie-corrected 18*Var(S) over the dense grid
DOC_ORACLES["mann_kendall"] = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS n
  FROM events GROUP BY event_type, day),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM c),
grid AS (
  SELECT t.event_type, d.day, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM span),
                                            (SELECT hi FROM span)))
              AS day) d
  LEFT JOIN c ON c.event_type = t.event_type AND c.day = d.day),
s AS (
  SELECT a.event_type,
         sum(CASE WHEN b.n > a.n THEN 1
                  WHEN b.n < a.n THEN -1 ELSE 0 END) AS s_stat
  FROM grid a JOIN grid b
    ON b.event_type = a.event_type AND b.day > a.day
  GROUP BY a.event_type),
nd AS (SELECT event_type, count(*) AS n FROM grid GROUP BY event_type),
ties AS (
  SELECT event_type,
         COALESCE(sum(CASE WHEN t > 1
                           THEN t * (t - 1) * (2 * t + 5)
                           ELSE 0 END), 0) AS corr
  FROM (SELECT event_type, n AS val, count(*) AS t FROM grid
        GROUP BY event_type, n)
  GROUP BY event_type)
SELECT s.event_type, CAST(nd.n AS BIGINT) AS n_days,
       CAST(s.s_stat AS BIGINT) AS s_stat,
       CAST(nd.n * (nd.n - 1) * (2 * nd.n + 5) - ties.corr AS BIGINT)
         AS var18
FROM s JOIN nd USING (event_type) JOIN ties USING (event_type)
"""

# double-sweep diameter bound: two bounded min-hop walks over the
# symmetrized exact k-NN edges; far node = min id at max first-sweep
# eccentricity
DOC_ORACLES["diameter_estimate"] = """
WITH RECURSIVE nbound AS (SELECT count(*) AS c FROM embeddings),
s AS (
  SELECT a.vec_id AS vid, b.vec_id AS nid,
         list_cosine_similarity(a.embedding, b.embedding) AS sim
  FROM embeddings a, embeddings b WHERE a.vec_id != b.vec_id),
r AS (
  SELECT vid, nid,
         row_number() OVER (PARTITION BY vid
                            ORDER BY sim DESC, nid) AS rk
  FROM s),
e AS (
  SELECT vid AS a, nid AS b FROM r WHERE rk <= 5
  UNION
  SELECT nid AS a, vid AS b FROM r WHERE rk <= 5),
w1 AS (
  SELECT (SELECT min(vec_id) FROM embeddings) AS node, 0 AS d
  UNION
  SELECT e.b, w.d + 1 FROM w1 w JOIN e ON e.a = w.node
  WHERE w.d < (SELECT c FROM nbound)),
d1 AS (SELECT node, min(d) AS d FROM w1 GROUP BY node),
ecc1 AS (SELECT max(d) AS v FROM d1),
far AS (SELECT min(node) AS v FROM d1 WHERE d = (SELECT v FROM ecc1)),
w2 AS (
  SELECT (SELECT v FROM far) AS node, 0 AS d
  UNION
  SELECT e.b, w.d + 1 FROM w2 w JOIN e ON e.a = w.node
  WHERE w.d < (SELECT c FROM nbound)),
d2 AS (SELECT node, min(d) AS d FROM w2 GROUP BY node)
SELECT CAST((SELECT min(vec_id) FROM embeddings) AS BIGINT)
         AS start_node,
       CAST((SELECT v FROM ecc1) AS BIGINT) AS sweep1_ecc,
       CAST((SELECT v FROM far) AS BIGINT) AS far_node,
       CAST((SELECT max(d) FROM d2) AS BIGINT) AS sweep2_ecc
"""

# DBSCAN: eps-pairs (exact cosine join), degree >= min_pts cores,
# core-core reachability labels (min reachable core), borders to the
# min neighbouring core label, everything else noise
DOC_ORACLES["dbscan_clusters"] = """
WITH RECURSIVE e AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a, embeddings b
  WHERE a.vec_id < b.vec_id
    AND list_cosine_similarity(a.embedding, b.embedding) >= 0.35),
adjn AS (SELECT a AS node, b AS nbr FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT node, count(*) AS dg FROM adjn GROUP BY node),
core AS (SELECT node FROM deg WHERE dg >= 3),
cce AS (
  SELECT e.a, e.b FROM e
  JOIN core ca ON ca.node = e.a JOIN core cb ON cb.node = e.b),
cadj AS (SELECT a AS x, b AS y FROM cce UNION SELECT b, a FROM cce),
reach AS (
  SELECT x AS node, y AS r FROM cadj
  UNION
  SELECT reach.node, cadj.y FROM reach JOIN cadj ON cadj.x = reach.r),
lab AS (
  SELECT c.node, least(c.node, COALESCE(min(r.r), c.node)) AS lbl
  FROM core c LEFT JOIN reach r ON r.node = c.node
  GROUP BY c.node),
border AS (
  SELECT adjn.node AS nc, min(lab.lbl) AS lbl
  FROM adjn JOIN core ON core.node = adjn.nbr
  JOIN lab ON lab.node = adjn.nbr
  WHERE adjn.node NOT IN (SELECT node FROM core)
  GROUP BY adjn.node)
SELECT em.vec_id,
       CAST(CASE WHEN l.lbl IS NOT NULL THEN 1
                 WHEN b2.lbl IS NOT NULL THEN 2
                 ELSE 0 END AS BIGINT) AS role,
       CAST(COALESCE(l.lbl, b2.lbl, -1) AS BIGINT) AS cluster
FROM embeddings em
LEFT JOIN lab l ON l.node = em.vec_id
LEFT JOIN border b2 ON b2.nc = em.vec_id
"""

# pseudonymization: the oracle rebuilds the text from the injection
# rule with identical md5 surrogates — any regex miss breaks the hash
DOC_ORACLES["pseudonymize"] = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
            + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END
            AS BIGINT) AS n_emails,
       text
       || CASE WHEN doc_id % 5 = 0
          THEN ' contact user' ||
               (('0x' || substr(md5('user' || doc_id
                                     || '@example.com'), 1, 16))
                ::UBIGINT % 1000000000000)::VARCHAR
               || '@anon.example now'
          ELSE '' END
       || CASE WHEN doc_id % 7 = 0
          THEN ' mail user' ||
               (('0x' || substr(md5('admin@test.org'), 1, 16))
                ::UBIGINT % 1000000000000)::VARCHAR
               || '@anon.example'
          ELSE '' END AS pseudo
FROM documents
"""

# gaps-and-islands longest streak: day - row_number is constant
# within a consecutive run
DOC_ORACLES["max_streak"] = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events),
i AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id
                                  ORDER BY day) AS island
  FROM d),
runs AS (
  SELECT user_id, island, count(*) AS len
  FROM i GROUP BY user_id, island)
SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(max(len) AS BIGINT) AS max_streak
FROM runs GROUP BY user_id
"""

# sliding-window HLL: per-day registers merged by max over each 7-day
# window; the hll_user_counts estimator algebra per window
DOC_ORACLES["hll_sliding_users"] = r"""
WITH h AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT
           AS h
  FROM events
), reg AS (
  SELECT day, CAST(h >> 56 AS BIGINT) AS j,
         h & CAST(72057594037927935 AS UBIGINT) AS v
  FROM h
), pw AS (
  SELECT p, CAST(1 AS UBIGINT) << CAST(p AS INTEGER) AS tp
  FROM range(0, 56) t(p)
), bl AS (
  SELECT reg.day, reg.j, reg.v,
         coalesce(max(pw.p) + 1, 0) AS bitlen
  FROM reg LEFT JOIN pw ON reg.v >= pw.tp
  GROUP BY reg.day, reg.j, reg.v
), rho AS (
  SELECT day, j, max(57 - bitlen) AS mj FROM bl GROUP BY day, j
), span AS (SELECT min(day) AS lo, max(day) AS hi FROM rho),
wins AS (
  SELECT unnest(generate_series((SELECT lo FROM span),
                                (SELECT hi FROM span) - 6)) AS w
), wreg AS (
  SELECT wins.w, r.j, coalesce(max(rho.mj), 0) AS mj
  FROM wins CROSS JOIN range(0, 256) r(j)
  LEFT JOIN rho ON rho.j = r.j
                AND rho.day BETWEEN wins.w AND wins.w + 6
  GROUP BY wins.w, r.j
), agg AS (
  SELECT w,
         sum(CAST('18446744073709551616' AS HUGEINT)
             // (CAST(1 AS UBIGINT) << CAST(mj AS INTEGER))) AS s,
         CAST(sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS zeros
  FROM wreg GROUP BY w
), est AS (
  SELECT w, zeros,
         (CAST(7213 AS HUGEINT) * 256000 * 256 * 256
          * CAST('18446744073709551616' AS HUGEINT))
         // (CAST(10000 AS HUGEINT) * 257079 * s) AS raw
  FROM agg)
SELECT CAST(w AS BIGINT) AS win_start_day,
       zeros AS zero_registers,
       CAST(CASE WHEN raw * 2 <= 5 * 256 AND zeros > 0
            THEN CAST(floor(256.0 * ln(256.0 / zeros)) AS HUGEINT)
            ELSE raw END AS BIGINT) AS est_distinct
FROM est
"""

# Newman modularity of the LPA communities, denominators cleared:
# q_num = sum_c (4m*e_c - d_c^2), q_den = 4m^2
DOC_ORACLES["modularity_score"] = (
    "WITH lp AS MATERIALIZED (SELECT * FROM ("
    + DOC_ORACLES["label_propagation"] + """)),
d AS (
  SELECT doc_id, list_distinct(string_split(text,' ')) AS toks,
         string_split(text,' ')[1] AS blk FROM documents
), e0 AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= 0.8
), ed AS (
  SELECT e0.a, e0.b, la.label AS la, lb.label AS lb
  FROM e0 JOIN lp la ON la.doc_id = e0.a
  JOIN lp lb ON lb.doc_id = e0.b
), mm AS (SELECT count(*) AS m FROM ed),
ec AS (SELECT la AS c, count(*) AS e FROM ed WHERE la = lb GROUP BY la),
dcv AS (
  SELECT c, count(*) AS d FROM (
    SELECT la AS c FROM ed UNION ALL SELECT lb FROM ed)
  GROUP BY c)
SELECT CAST((SELECT count(*) FROM dcv) AS BIGINT) AS n_communities,
       CAST(mm.m AS BIGINT) AS m_edges,
       CAST((SELECT sum(4 * mm.m * COALESCE(ec.e, 0)
                        - CAST(dcv.d AS HUGEINT) * dcv.d)
             FROM dcv LEFT JOIN ec USING (c)) AS BIGINT) AS q_num,
       CAST(4 * CAST(mm.m AS HUGEINT) * mm.m AS BIGINT) AS q_den
FROM mm
""")


def _percolation_sql(thresholds=(50, 60, 70, 80, 90)) -> str:
    """One reachability chain per threshold (comp = min reachable),
    summaries unioned — the dedup-threshold percolation curve."""
    parts = ["""
WITH RECURSIVE d AS (
  SELECT doc_id, list_distinct(string_split(text,' ')) AS toks,
         string_split(text,' ')[1] AS blk FROM documents
)"""]
    sels = []
    for t in thresholds:
        parts.append(f""",
e{t} AS MATERIALIZED (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks)
           - len(list_intersect(a.toks, b.toks))) >= {t} / 100.0
), u{t} AS (
  SELECT a AS x, b AS y FROM e{t} UNION SELECT b, a FROM e{t}
), r{t} AS (
  SELECT x AS node, y AS r FROM u{t}
  UNION
  SELECT r{t}.node, u{t}.y FROM r{t} JOIN u{t} ON u{t}.x = r{t}.r
), c{t} AS (
  SELECT node, least(node, min(r)) AS comp
  FROM r{t} GROUP BY node
), s{t} AS (SELECT comp, count(*) AS sz FROM c{t} GROUP BY comp)""")
        sels.append(
            f"SELECT CAST({t} AS BIGINT) AS thr_pct,"
            f" CAST((SELECT count(*) FROM e{t}) AS BIGINT) AS n_edges,"
            f" CAST(COALESCE((SELECT sum(sz) FROM s{t}), 0) AS BIGINT)"
            f" AS n_touched,"
            f" CAST(COALESCE((SELECT count(*) FROM s{t}), 0) AS BIGINT)"
            f" AS n_components,"
            f" CAST(COALESCE((SELECT max(sz) FROM s{t}), 0) AS BIGINT)"
            f" AS max_component")
    return "".join(parts) + "\n" + "\nUNION ALL ".join(sels)


DOC_ORACLES["percolation_curve"] = _percolation_sql()

# Kleinberg burst Viterbi: forward recursive CTE carrying (c0, c1,
# predecessor decisions) per (type, position), then a backward
# recursive walk re-deriving the optimal state labels
DOC_ORACLES["burst_intervals"] = """
WITH RECURSIVE cgrid AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS n
  FROM events GROUP BY event_type, day),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM cgrid),
grid AS (
  SELECT t.event_type, d.day, COALESCE(cgrid.n, 0) AS n,
         row_number() OVER (PARTITION BY t.event_type ORDER BY d.day)
           AS pos
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM span),
                                            (SELECT hi FROM span)))
              AS day) d
  LEFT JOIN cgrid ON cgrid.event_type = t.event_type
                  AND cgrid.day = d.day),
stats AS (
  SELECT event_type, sum(n) AS s, count(*) AS nd
  FROM grid GROUP BY event_type),
costs AS (
  SELECT g.event_type, g.day, g.pos,
         (1000000 * st.s) // st.nd
         - CAST(floor(1000000.0 * (g.n * (ln(1.0 * st.s)
                                          - ln(1.0 * st.nd))))
                AS BIGINT) AS k0,
         (1000000 * 6 * st.s) // (5 * st.nd)
         - CAST(floor(1000000.0 * (g.n * (ln(1.0 * 6 * st.s)
                                          - ln(1.0 * 5 * st.nd))))
                AS BIGINT) AS k1,
         st.nd
  FROM grid g JOIN stats st USING (event_type)),
fwd AS (
  SELECT event_type, day, pos, nd,
         k0 AS c0, 2000000 + k1 AS c1,
         CAST(-1 AS BIGINT) AS p0, CAST(-1 AS BIGINT) AS p1
  FROM costs WHERE pos = 1
  UNION ALL
  SELECT c.event_type, c.day, c.pos, c.nd,
         least(f.c0, f.c1) + c.k0,
         least(f.c0 + 2000000, f.c1) + c.k1,
         CAST(CASE WHEN f.c0 <= f.c1 THEN 0 ELSE 1 END AS BIGINT),
         CAST(CASE WHEN f.c0 + 2000000 <= f.c1 THEN 0 ELSE 1 END
              AS BIGINT)
  FROM fwd f JOIN costs c ON c.event_type = f.event_type
                          AND c.pos = f.pos + 1),
back AS (
  SELECT event_type, day, pos, c0, c1, p0, p1,
         CAST(CASE WHEN c0 <= c1 THEN 0 ELSE 1 END AS BIGINT) AS state
  FROM fwd WHERE pos = nd
  UNION ALL
  SELECT f.event_type, f.day, f.pos, f.c0, f.c1, f.p0, f.p1,
         CASE WHEN b.state = 0 THEN b.p0 ELSE b.p1 END
  FROM back b JOIN fwd f ON f.event_type = b.event_type
                         AND f.pos = b.pos - 1)
SELECT event_type, day, state, CAST(c0 AS BIGINT) AS c0,
       CAST(c1 AS BIGINT) AS c1 FROM back
"""

# coordinated key-hash sampling: the shared md5 rule replays exactly;
# referential completeness makes n_joined == n_lineitems
DOC_ORACLES["coordinated_sample"] = """
WITH so AS (
  SELECT o_orderkey FROM orders
  WHERE ('0x' || substr(md5('ok' || o_orderkey), 1, 16))::UBIGINT
        % 20 = 0),
sl AS (
  SELECT l_orderkey,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem
  WHERE ('0x' || substr(md5('ok' || l_orderkey), 1, 16))::UBIGINT
        % 20 = 0)
SELECT CAST((SELECT count(*) FROM so) AS BIGINT) AS n_orders,
       CAST((SELECT count(*) FROM sl) AS BIGINT) AS n_lineitems,
       CAST((SELECT count(*) FROM sl JOIN so
             ON so.o_orderkey = sl.l_orderkey) AS BIGINT) AS n_joined,
       CAST(COALESCE((SELECT sum(cents) FROM sl JOIN so
                      ON so.o_orderkey = sl.l_orderkey), 0) AS BIGINT)
         AS revenue_cents
"""

# learned-index audit: OLS CDF fit + max position error, all HUGEINT
# with denominators cleared; // truncation matches the engine's
# sign-handled quantization
DOC_ORACLES["learned_index_audit"] = """
WITH v AS (SELECT length(text) AS x FROM documents),
h AS (SELECT x, count(*) AS c FROM v GROUP BY x),
r AS (
  SELECT x, c,
         COALESCE(sum(c) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
                               PRECEDING AND 1 PRECEDING), 0) AS rnk
  FROM h),
st AS (
  SELECT CAST(sum(c) AS HUGEINT) AS n,
         CAST(sum(c * x) AS HUGEINT) AS sx,
         CAST(sum(CAST(c AS HUGEINT) * rnk) AS HUGEINT) AS sy,
         CAST(sum(CAST(c AS HUGEINT) * x * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(c AS HUGEINT) * x * rnk) AS HUGEINT) AS sxy
  FROM r),
fit AS (
  SELECT n, n * (n * sxx - sx * sx) AS den,
         n * (n * sxy - sx * sy) AS b_n,
         (n * sxx - sx * sx) * sy - (n * sxy - sx * sy) * sx AS a_n
  FROM st),
err AS (
  SELECT max(abs(f.den * r.rnk - (f.b_n * r.x + f.a_n))) AS me
  FROM r, fit f)
SELECT CAST(f.n AS BIGINT) AS n,
       CAST((1000000 * f.b_n) // f.den AS BIGINT) AS b_q6,
       CAST((1000000 * f.a_n) // f.den AS BIGINT) AS a_q6,
       CAST((1000000 * e.me) // f.den AS BIGINT) AS max_err_rows_q6
FROM fit f, err e
"""

# Morton interleave replayed bit-by-bit via a generate_series join
DOC_ORACLES["zorder_values"] = """
WITH pt AS (
  SELECT doc_id,
         ('0x' || substr(md5('x:' || doc_id), 1, 16))::UBIGINT
           % 1048576 AS x,
         ('0x' || substr(md5('y:' || doc_id), 1, 16))::UBIGINT
           % 1048576 AS y
  FROM documents),
bitsum AS (
  SELECT doc_id,
         sum((((x >> 10) >> i) & 1) * (CAST(1 AS UBIGINT)
                                       << CAST(2 * i AS INTEGER))
             + (((y >> 10) >> i) & 1) * (CAST(1 AS UBIGINT)
                                         << CAST(2 * i + 1 AS INTEGER)))
           AS z
  FROM pt, (SELECT unnest(generate_series(0, 9)) AS i)
  GROUP BY doc_id)
SELECT pt.doc_id, CAST(pt.x AS BIGINT) AS x, CAST(pt.y AS BIGINT) AS y,
       CAST(b.z AS BIGINT) AS zval,
       CAST(CASE WHEN pt.x BETWEEN 100000 AND 400000
                  AND pt.y BETWEEN 200000 AND 600000
            THEN 1 ELSE 0 END AS BIGINT) AS in_box
FROM pt JOIN bitsum b USING (doc_id)
"""

# one-way ANOVA with all fractions cleared over n*prod(n_g); the
# group product folds via exp(sum(ln)) being unsafe — use a
# recursive product over the ordered group list instead
DOC_ORACLES["anova_f"] = """
WITH RECURSIVE g AS (
  SELECT lang, CAST(count(*) AS HUGEINT) AS ng,
         CAST(sum(length(text)) AS HUGEINT) AS s,
         CAST(sum(CAST(length(text) AS HUGEINT) * length(text))
              AS HUGEINT) AS q,
         row_number() OVER (ORDER BY lang) AS rn
  FROM documents GROUP BY lang),
prod AS (
  SELECT rn, ng AS p FROM g WHERE rn = 1
  UNION ALL
  SELECT g.rn, prod.p * g.ng FROM prod
  JOIN g ON g.rn = prod.rn + 1),
pp AS (SELECT max_by(p, rn) AS p FROM prod),
tot AS (
  SELECT CAST(count(*) AS HUGEINT) AS k,
         CAST(sum(ng) AS HUGEINT) AS n,
         CAST(sum(s) AS HUGEINT) AS st,
         CAST(sum(q) AS HUGEINT) AS qt,
         CAST(sum(s * s * ((SELECT p FROM pp) // ng)) AS HUGEINT)
           AS sg2
  FROM g)
SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
       CAST((100 * (n * sg2 - st * st * (SELECT p FROM pp)))
            // (n * (SELECT p FROM pp)) AS BIGINT) AS ssb_q2,
       CAST((100 * (qt * n * (SELECT p FROM pp) - n * sg2))
            // (n * (SELECT p FROM pp)) AS BIGINT) AS ssw_q2,
       CAST((1000000 * (n * sg2 - st * st * (SELECT p FROM pp))
             * (n - k))
            // ((qt * n * (SELECT p FROM pp) - n * sg2) * (k - 1))
            AS BIGINT) AS f_q6
FROM tot
"""


def _ktruss_sql(k: int = 4, rounds: int = 3) -> str:
    """Unrolled k-truss peel: per round a triple-join triangle
    enumeration, per-edge support via UNION ALL credits, then the
    support filter; final support recomputed on the surviving set."""
    parts = ["""
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text,' ')) AS toks,
         string_split(text,' ')[1] AS blk FROM documents
), e0 AS MATERIALIZED (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= 0.8
)"""]
    for r in range(1, rounds + 2):
        prev = "e%d" % (r - 1)
        parts.append(f""",
tri{r} AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM {prev} e1 JOIN {prev} e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN {prev} e3 ON e3.a = e1.b AND e3.b = e2.b
), s{r} AS MATERIALIZED (
  SELECT a, b, count(*) AS c FROM (
    SELECT x AS a, y AS b FROM tri{r}
    UNION ALL SELECT x, z FROM tri{r}
    UNION ALL SELECT y, z FROM tri{r})
  GROUP BY a, b
)""")
        if r <= rounds:
            parts.append(f""",
e{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM {prev} e
  JOIN s{r} s ON s.a = e.a AND s.b = e.b
  WHERE s.c >= {k - 2}
)""")
    parts.append(f"""
SELECT e.a, e.b, CAST(COALESCE(s.c, 0) AS BIGINT) AS support
FROM e{rounds} e LEFT JOIN s{rounds + 1} s
  ON s.a = e.a AND s.b = e.b""")
    return "".join(parts)


DOC_ORACLES["ktruss"] = _ktruss_sql()

# framewise audio features replayed from document bytes: little-endian
# int16 samples, 64-sample frames, exact energy + strict sign flips
DOC_ORACLES["wav_frame_features"] = """
WITH ch AS (
  SELECT doc_id, text, len(text) AS n,
         unnest(generate_series(1, (len(text) + 1) // 2)) AS i
  FROM documents
), smp AS (
  SELECT doc_id, i,
         (SELECT CASE WHEN x < 32768 THEN x ELSE x - 65536 END
          FROM (SELECT ascii(substr(text, 2*i - 1, 1))
                + 256 * (CASE WHEN 2*i <= n
                         THEN ascii(substr(text, 2*i, 1))
                         ELSE 0 END) AS x)) AS s
  FROM ch
), fr AS (
  SELECT doc_id, i, s, (i - 1) // 64 AS frame_idx,
         lead(s) OVER (PARTITION BY doc_id ORDER BY i) AS nxt
  FROM smp
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(sum(s * s) AS BIGINT) AS energy,
       CAST(sum(CASE WHEN ((i - 1) % 64) < 63 AND nxt IS NOT NULL
                      AND (s - 20000) * (nxt - 20000) < 0
                 THEN 1 ELSE 0 END) AS BIGINT)
         AS zcr
FROM fr GROUP BY doc_id, frame_idx
"""

# dHash: per-column byte sums (pixel (r,c) = bytes 96r+3c..+2,
# zero-padded), gradient sign bits packed big-endian-first
DOC_ORACLES["bmp_dhash"] = """
WITH px AS (
  SELECT doc_id, ((i - 1) % 96) // 3 AS c,
         ascii(substr(text, i, 1)) AS v
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text))) AS i
        FROM documents)
), col AS (
  SELECT d.doc_id, g.c, COALESCE(sum(px.v), 0) AS s
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS c) g
  LEFT JOIN px ON px.doc_id = d.doc_id AND px.c = g.c
  GROUP BY d.doc_id, g.c
), bits AS (
  SELECT a.doc_id, a.c,
         CASE WHEN a.s > b.s THEN 1 ELSE 0 END AS bit
  FROM col a JOIN col b ON b.doc_id = a.doc_id AND b.c = a.c + 1
)
SELECT doc_id,
       CAST(sum(bit * (CAST(1 AS UBIGINT) << CAST(30 - c AS INTEGER)))
            AS BIGINT) AS dhash_q,
       CAST(32 AS BIGINT) AS n_cols
FROM bits GROUP BY doc_id
"""

# keyframes = frame 0 + scene_cuts' flagged frames, with luma sums
DOC_ORACLES["keyframes"] = (
    "WITH cuts AS (" + DOC_ORACLES["scene_cuts"] + """),
fr AS (
  SELECT doc_id, text, length(text) AS n,
         unnest(generate_series(
             0, greatest(1, (length(text) + 127) // 128) - 1))
           AS frame_idx
  FROM documents),
keep AS (
  SELECT f.doc_id, f.frame_idx, f.text, f.n
  FROM fr f LEFT JOIN cuts c
    ON c.doc_id = f.doc_id AND c.frame_idx = f.frame_idx
  WHERE f.frame_idx = 0 OR c.is_cut = 1),
px AS (
  SELECT doc_id, frame_idx,
         CASE WHEN frame_idx * 128 + i <= n
              THEN ascii(substr(text, frame_idx * 128 + i, 1))
              ELSE 0 END AS v
  FROM keep, (SELECT unnest(generate_series(1, 128)) AS i) s)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(sum(v) AS BIGINT) AS luma_sum
FROM px GROUP BY doc_id, frame_idx
""")

# rich-club: per cutoff, edges among nodes of degree > k
DOC_ORACLES["rich_club"] = """
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text,' ')) AS toks,
         string_split(text,' ')[1] AS blk FROM documents
), e0 AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= 0.8
), deg AS (
  SELECT node, count(*) AS dg FROM (
    SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
  GROUP BY node
), ks AS (SELECT unnest([2, 4, 8]) AS k),
stats AS (
  SELECT ks.k,
         (SELECT count(*) FROM deg WHERE dg > ks.k) AS n_rich,
         (SELECT count(*) FROM e0
          JOIN deg d1 ON d1.node = e0.a AND d1.dg > ks.k
          JOIN deg d2 ON d2.node = e0.b AND d2.dg > ks.k) AS e_rich
  FROM ks)
SELECT CAST(k AS BIGINT) AS k, CAST(n_rich AS BIGINT) AS n_rich,
       CAST(e_rich AS BIGINT) AS e_rich,
       CAST(CASE WHEN n_rich > 1
            THEN (1000000 * 2 * e_rich) // (n_rich * (n_rich - 1))
            ELSE 0 END AS BIGINT) AS phi_q6
FROM stats
"""

# exact Levenshtein per blocked near-dup candidate pair; DuckDB's
# levenshtein() is the independent reference implementation
DOC_ORACLES["pair_edit_stats"] = """
WITH d AS (
  SELECT doc_id, text, list_distinct(string_split(text,' ')) AS toks,
         string_split(text,' ')[1] AS blk FROM documents
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
       CAST(length(a.text) AS BIGINT) AS len_a,
       CAST(length(b.text) AS BIGINT) AS len_b
FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      >= 0.8
"""

# Wilson z=2 interval: the identical fixed-order IEEE tree into the
# correctly-rounded sqrt (bit-portable, unlike exp)
DOC_ORACLES["wilson_bounds"] = """
WITH c AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS s,
         sum(CASE WHEN event_type IN ('view', 'purchase') THEN 1
                  ELSE 0 END) AS n
  FROM events WHERE event_type IN ('view', 'purchase')
  GROUP BY day)
SELECT CAST(day AS BIGINT) AS day, CAST(n AS BIGINT) AS n_trials,
       CAST(s AS BIGINT) AS n_success,
       CAST(floor(1000000.0 * ((s + 2 - 2 * sqrt(s * (n - s) / n + 1.0))
                               / (n + 4))) AS BIGINT) AS lo_q6,
       CAST(floor(1000000.0 * ((s + 2 + 2 * sqrt(s * (n - s) / n + 1.0))
                               / (n + 4))) AS BIGINT) AS hi_q6
FROM c WHERE n > 0
"""

# histogram intersection with denominators cleared: per shared length
# value min(c_a*n_b, c_b*n_a), absent side contributes zero
DOC_ORACLES["hist_overlap"] = """
WITH h AS (
  SELECT lang, length(text) AS v, count(*) AS c
  FROM documents GROUP BY lang, v),
tot AS (SELECT lang, sum(c) AS n FROM h GROUP BY lang),
pairs AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, a.n AS n_a, b.n AS n_b
  FROM tot a JOIN tot b ON a.lang < b.lang),
ovl AS (
  SELECT p.lang_a, p.lang_b,
         sum(least(ha.c * p.n_b, hb.c * p.n_a)) AS s
  FROM pairs p
  JOIN h ha ON ha.lang = p.lang_a
  JOIN h hb ON hb.lang = p.lang_b AND hb.v = ha.v
  GROUP BY p.lang_a, p.lang_b)
SELECT p.lang_a, p.lang_b, CAST(p.n_a AS BIGINT) AS n_a,
       CAST(p.n_b AS BIGINT) AS n_b,
       CAST((1000000 * COALESCE(o.s, 0)) // (p.n_a * p.n_b) AS BIGINT)
         AS ovl_ppm
FROM pairs p LEFT JOIN ovl o
  ON o.lang_a = p.lang_a AND o.lang_b = p.lang_b
"""

# gazetteer mention detection: substring counts are exact token-adjacent
# mention counts by gazetteer construction (see textops.MENTION_GAZETTEER);
# replace()-length arithmetic counts the same non-overlapping occurrences
DOC_ORACLES["entity_mentions"] = """
WITH g(phrase) AS (VALUES ('fast table'), ('key agg'), ('sort window'),
                          ('spark order'), ('value part'), ('batch merge'),
                          ('query big'), ('stream group'))
SELECT d.doc_id, g.phrase,
       CAST((length(d.text) - length(replace(d.text, g.phrase, '')))
            / length(g.phrase) AS BIGINT) AS n_mentions
FROM documents d CROSS JOIN g
WHERE length(d.text) - length(replace(d.text, g.phrase, '')) > 0
"""

# entity linking: candidate senses scored by context-token occurrence,
# winner = max score with ties to the lower sense id (row_number mirrors
# np.argmax-first-maximum exactly)
DOC_ORACLES["entity_link"] = """
WITH cand(phrase, k, ctx) AS (VALUES
  ('fast table', 1, 'scan'), ('fast table', 2, 'join'),
  ('key agg', 1, 'hash'), ('key agg', 2, 'group'),
  ('sort window', 1, 'order'), ('sort window', 2, 'stream'),
  ('spark order', 1, 'batch'), ('spark order', 2, 'query'),
  ('value part', 1, 'column'), ('value part', 2, 'row'),
  ('batch merge', 1, 'slow'), ('batch merge', 2, 'small'),
  ('query big', 1, 'filter'), ('query big', 2, 'vector'),
  ('stream group', 1, 'customer'), ('stream group', 2, 'line')),
m AS (
  SELECT d.doc_id, c.phrase, c.k,
         (length(d.text) - length(replace(d.text, c.ctx, '')))
           / length(c.ctx) AS score
  FROM documents d JOIN cand c
    ON length(d.text) - length(replace(d.text, c.phrase, '')) > 0)
SELECT doc_id, phrase,
       'http://example.org/entity/' || replace(phrase, ' ', '_')
         || '/' || CAST(k AS VARCHAR) AS uri,
       CAST(score AS BIGINT) AS score
FROM (SELECT m.*, row_number() OVER (
        PARTITION BY doc_id, phrase ORDER BY score DESC, k) AS rn
      FROM m)
WHERE rn = 1
"""

# co-mention edges: docs mentioning both phrases of an unordered pair
DOC_ORACLES["mention_cooccurrence"] = """
WITH g(phrase) AS (VALUES ('fast table'), ('key agg'), ('sort window'),
                          ('spark order'), ('value part'), ('batch merge'),
                          ('query big'), ('stream group')),
hit AS (
  SELECT d.doc_id, g.phrase FROM documents d CROSS JOIN g
  WHERE length(d.text) - length(replace(d.text, g.phrase, '')) > 0)
SELECT a.phrase AS phrase_a, b.phrase AS phrase_b,
       CAST(count(*) AS BIGINT) AS n_docs
FROM hit a JOIN hit b
  ON a.doc_id = b.doc_id AND a.phrase < b.phrase
GROUP BY a.phrase, b.phrase
"""


def _greedy_search_sql(n_queries: int = 10, max_hops: int = 12,
                       k: int = 5) -> str:
    """Unrolled replay of simsearch.knn_greedy_search: one MATERIALIZED
    CTE pair per hop (candidates = cur ∪ out-neighbors minus the query;
    next = row_number 1 by (cosine DESC, id ASC); hops advance only on
    a move). Converged walks are fixpoints of further hops, so
    unrolling the full cap is exact regardless of when each query
    stops.

    TOLERANCE ASSUMPTION (deviation from the bit-exact-oracle
    discipline, documented per ADVICE): the per-hop argmax compares
    numpy float64 normalized-dot (engine) against DuckDB
    ``list_cosine_similarity`` (oracle) — different expression trees,
    so the two sides agree only up to last-ulp rounding. The oracle
    therefore assumes NO near-tie within ~1 ulp among a hop's
    candidates; on this md5-derived corpus the minimum observed
    candidate gap is ~1e-3 (10^13 ulp), and the secondary id-ASC key
    only ever breaks EXACT ties (identical vectors), which both sides
    resolve identically. A corpus with adversarially colinear
    embeddings could flip a hop; the integer-exact alternative
    (quantize embeddings to 2^15 grid, compare s_a²·|b|² vs s_b²·|a|²
    in HUGEINT) is noted here for that case."""
    parts = [
        "WITH s AS (SELECT a.vec_id AS vid, b.vec_id AS nid,"
        " list_cosine_similarity(a.embedding, b.embedding) AS sim"
        " FROM embeddings a, embeddings b WHERE a.vec_id != b.vec_id),"
        " r AS (SELECT vid, nid, row_number() OVER (PARTITION BY vid"
        " ORDER BY sim DESC, nid) AS rk FROM s),"
        " e AS (SELECT vid, nid FROM r WHERE rk <= %d)," % k,
        " q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings"
        " WHERE vec_id < %d)," % n_queries,
        " h0 AS MATERIALIZED (SELECT qid,"
        " CASE WHEN qid = 0 THEN 1 ELSE 0 END AS cur, 0 AS hops FROM q)",
    ]
    for i in range(max_hops):
        parts.append(
            ", x%d AS MATERIALIZED ("
            "SELECT qid, cur AS cid, cur, hops FROM h%d"
            " UNION ALL SELECT h.qid, e.nid, h.cur, h.hops"
            " FROM h%d h JOIN e ON e.vid = h.cur)" % (i, i, i))
        parts.append(
            ", s%d AS MATERIALIZED ("
            "SELECT x.qid, x.cid, x.cur, x.hops,"
            " row_number() OVER (PARTITION BY x.qid ORDER BY"
            " list_cosine_similarity(q.qe, em.embedding) DESC, x.cid)"
            " AS rn"
            " FROM x%d x JOIN q ON q.qid = x.qid"
            " JOIN embeddings em ON em.vec_id = x.cid"
            " WHERE x.cid <> x.qid)" % (i, i))
        parts.append(
            ", h%d AS MATERIALIZED ("
            "SELECT qid, cid AS cur,"
            " hops + CASE WHEN cid <> cur THEN 1 ELSE 0 END AS hops"
            " FROM s%d WHERE rn = 1)" % (i + 1, i))
    parts.append(
        " SELECT qid AS query_id, CAST(cur AS BIGINT) AS found_id,"
        " CAST(hops AS BIGINT) AS n_hops FROM h%d" % max_hops)
    return "".join(parts)


DOC_ORACLES["knn_greedy_search"] = _greedy_search_sql()


def _hnsw_search_sql(n_queries: int = 10, max_hops: int = 12,
                     k: int = 5, cap: int = 2) -> str:
    """Unrolled replay of simsearch.hnsw_search: the deterministic
    geometric layer table (md5 low-bit CASE), one exact k-NN edge CTE
    per layer (members = lvl >= layer), the per-query top-layer entry
    (min member id, query excluded), and the greedy hop unrolling of
    _greedy_search_sql repeated per layer with each layer's fixpoint
    seeding the next (hops accumulate through the descent). The same
    float-argmax tolerance assumption as knn_greedy_search applies."""
    parts = [
        "WITH lv AS MATERIALIZED (SELECT vec_id,"
        " CASE WHEN h % 4 = 0 THEN 2 WHEN h % 2 = 0 THEN 1"
        " ELSE 0 END AS lvl FROM (SELECT vec_id,"
        " ('0x' || substr(md5('lvl:' || CAST(vec_id AS VARCHAR)),"
        " 1, 16))::UBIGINT AS h FROM embeddings)),",
    ]
    for l in range(cap, -1, -1):
        memb = ("" if l == 0 else
                " JOIN lv la ON la.vec_id = a.vec_id AND la.lvl >= %d"
                " JOIN lv lb ON lb.vec_id = b.vec_id AND lb.lvl >= %d"
                % (l, l))
        parts.append(
            " sim%d AS (SELECT a.vec_id AS vid, b.vec_id AS nid,"
            " list_cosine_similarity(a.embedding, b.embedding) AS sim"
            " FROM embeddings a JOIN embeddings b"
            " ON a.vec_id != b.vec_id%s),"
            " rk%d AS (SELECT vid, nid, row_number() OVER"
            " (PARTITION BY vid ORDER BY sim DESC, nid) AS rk"
            " FROM sim%d),"
            " e%d AS (SELECT vid, nid FROM rk%d WHERE rk <= %d),"
            % (l, memb, l, l, l, l, k))
    parts.append(
        " q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings"
        " WHERE vec_id < %d)," % n_queries)
    parts.append(
        " g%d_0 AS MATERIALIZED (SELECT q.qid,"
        " (SELECT min(vec_id) FROM lv"
        "  WHERE lvl >= %d AND vec_id <> q.qid) AS cur,"
        " 0 AS hops FROM q)" % (cap, cap))
    for l in range(cap, -1, -1):
        if l < cap:  # seed from the layer above's fixpoint
            parts.append(
                ", g%d_0 AS MATERIALIZED (SELECT * FROM g%d_%d)"
                % (l, l + 1, max_hops))
        for i in range(max_hops):
            parts.append(
                ", x%d_%d AS MATERIALIZED ("
                "SELECT qid, cur AS cid, cur, hops FROM g%d_%d"
                " UNION ALL SELECT h.qid, e.nid, h.cur, h.hops"
                " FROM g%d_%d h JOIN e%d e ON e.vid = h.cur)"
                % (l, i, l, i, l, i, l))
            parts.append(
                ", t%d_%d AS MATERIALIZED ("
                "SELECT x.qid, x.cid, x.cur, x.hops,"
                " row_number() OVER (PARTITION BY x.qid ORDER BY"
                " list_cosine_similarity(q.qe, em.embedding) DESC,"
                " x.cid) AS rn"
                " FROM x%d_%d x JOIN q ON q.qid = x.qid"
                " JOIN embeddings em ON em.vec_id = x.cid"
                " WHERE x.cid <> x.qid)" % (l, i, l, i))
            parts.append(
                ", g%d_%d AS MATERIALIZED ("
                "SELECT qid, cid AS cur,"
                " hops + CASE WHEN cid <> cur THEN 1 ELSE 0 END AS hops"
                " FROM t%d_%d WHERE rn = 1)" % (l, i + 1, l, i))
    parts.append(
        " SELECT qid AS query_id, CAST(cur AS BIGINT) AS found_id,"
        " CAST(hops AS BIGINT) AS n_hops FROM g0_%d" % max_hops)
    return "".join(parts)


DOC_ORACLES["hnsw_search"] = _hnsw_search_sql()

# DL<=1 fuzzy join: DuckDB's damerau_levenshtein is the unrestricted
# variant, which coincides with the engine's single-operation check at
# distance 1; transposition-only pairs are exactly those at lev = 2
DOC_ORACLES["typo_pairs_dl"] = """
WITH v AS (SELECT DISTINCT c_name AS n FROM customer)
SELECT a.n AS name_a, b.n AS name_b,
       CAST(CASE WHEN levenshtein(a.n, b.n) = 2 THEN 1 ELSE 0 END
            AS BIGINT) AS is_transposition
FROM v a JOIN v b
  ON a.n < b.n AND damerau_levenshtein(a.n, b.n) <= 1
"""

# word2vec subsampling: p = sqrt(t/f) + t/f with t = 1/1024; keep draw =
# md5-u64("doc:pos:tok")/2^64 — sqrt/division exactly rounded, identical
# expression trees, so the sampled counts hash-match exactly
DOC_ORACLES["subsample_tokens"] = """
WITH cnts AS (
  SELECT t AS tok, count(*) AS c FROM (
    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
  GROUP BY t),
tot AS (SELECT sum(c) AS n FROM cnts),
pos AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
sc AS (
  SELECT p.doc_id, p.i, p.t[p.i] AS w,
         sqrt(0.0009765625 / (CAST(c.c AS DOUBLE)
                              / CAST(t.n AS DOUBLE)))
         + 0.0009765625 / (CAST(c.c AS DOUBLE)
                           / CAST(t.n AS DOUBLE)) AS p
  FROM pos p JOIN cnts c ON c.tok = p.t[p.i] CROSS JOIN tot t),
kept AS (
  SELECT doc_id,
         CASE WHEN p >= 1.0 THEN 1
              WHEN CAST(('0x' || substr(md5(doc_id || ':' || i || ':'
                        || w), 1, 16))::UBIGINT AS DOUBLE)
                   / 18446744073709551616.0 < p THEN 1
              ELSE 0 END AS k
  FROM sc)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(k) AS BIGINT) AS n_kept
FROM kept GROUP BY doc_id
"""

# Kneser-Ney continuation counts: distinct predecessors per token
DOC_ORACLES["continuation_counts"] = """
WITH toks AS (
  SELECT string_split(text, ' ') AS t FROM documents),
pairs AS (
  SELECT DISTINCT p.t[p.i] AS prev, p.t[p.i + 1] AS tok
  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM toks) p)
SELECT tok, CAST(count(DISTINCT prev) AS BIGINT) AS n_left_contexts
FROM pairs GROUP BY tok
"""

# Church-Gale burstiness: occurrences over containing docs, q20
DOC_ORACLES["token_burstiness"] = """
WITH occ AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents)
SELECT tok, CAST(count(*) AS BIGINT) AS cf,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(count(*) * 1048576 // count(DISTINCT doc_id) AS BIGINT)
         AS burst_q20
FROM occ GROUP BY tok
"""

# Hill tail-index over the top-k doc lengths: k / sum ln(x_i/x_(k+1)),
# ln of exact integer ratios (shared libm), floor-q20
DOC_ORACLES["tail_index_hill"] = """
WITH ranked AS (
  SELECT n_chars, row_number() OVER (ORDER BY n_chars DESC) AS rn
  FROM documents),
xk1 AS (SELECT n_chars AS v FROM ranked WHERE rn = 101),
s AS (
  SELECT sum(CAST(floor(1048576.0
        * ln(CAST(r.n_chars AS DOUBLE) / CAST(x.v AS DOUBLE)))
        AS BIGINT)) AS sq
  FROM ranked r CROSS JOIN xk1 x WHERE r.rn <= 100)
SELECT CAST(100 AS BIGINT) AS k,
       CAST((SELECT v FROM xk1) AS BIGINT) AS xk1,
       CAST((100::HUGEINT * 1099511627776) // (SELECT sq FROM s)
            AS BIGINT) AS hill_q20
"""
