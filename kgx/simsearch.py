"""Similarity search over the ``embeddings`` table.

- ``knn_bruteforce``: exact top-k cosine. The query matrix is loaded ONCE
  per actor (constructor), candidate batches stream through a numpy
  matmul; per-batch partial top-k is reduced by a small groupby. This is
  the baseline the driver's DuckDB oracle can verify.
- ``knn_ivf``: bucketed approximate variant — candidates are partitioned
  by a deterministic coarse quantizer (sign bits of projections onto
  fixed random axes); each query probes only its own and adjacent
  buckets. The scale path for 10^9+ vectors.
"""

from __future__ import annotations

import functools as _functools

import numpy as np
import pandas as pd

from .readers import compute_heavy_read_parquet as _bread


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.linalg.norm(M, axis=1, keepdims=True)


def _load_queries(sf_dir: str, stride: int):
    import pyarrow.parquet as pq

    table = pq.read_table("%s/embeddings.parquet" % sf_dir,
                          columns=["vec_id", "embedding"])
    ids = np.asarray(table.column("vec_id"))
    mask = ids % stride == 0
    M = np.array(table.column("embedding").to_pylist(), dtype=np.float64)[mask]
    return ids[mask], _normalize(M)


class _BatchScorer:
    """Actor: query matrix in memory once; scores candidate batches."""

    def __init__(self, sf_dir: str, stride: int, k: int):
        self.qids, self.Q = _load_queries(sf_dir, stride)
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        C = _normalize(np.array(df["embedding"].tolist(), dtype=np.float64))
        cids = df["vec_id"].to_numpy()
        sims = self.Q @ C.T  # (n_queries, batch)
        out_q, out_n, out_s = [], [], []
        k = min(self.k, sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            # exclude self-match
            valid = cids != self.qids[qi]
            idx = np.argpartition(-np.where(valid, row, -np.inf), k - 1)[:k]
            for j in idx:
                if valid[j]:
                    out_q.append(self.qids[qi])
                    out_n.append(cids[j])
                    out_s.append(row[j])
        return pd.DataFrame({
            "query_id": pd.Series(out_q, dtype="int64"),
            "neighbor_id": pd.Series(out_n, dtype="int64"),
            "sim": out_s,
        })


def _final_topk(df: pd.DataFrame, k: int) -> pd.DataFrame:
    df = df.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
    df = df.reset_index(drop=True)
    return pd.DataFrame({
        "query_id": df["query_id"].astype("int64"),
        "neighbor_id": df["neighbor_id"].astype("int64"),
        "rank": pd.Series(range(1, len(df) + 1), dtype="int64"),
    })


def _final_topk_reduce(partial, k: int, num_partitions: int = None):
    """Reduce per-batch partial top-k rows to the global per-query top-k.

    Buckets on ``hash(query_id) % nparts`` (one Ray group per partition,
    never one per query — query_id is unbounded-cardinality at scale) and
    does the true per-query reduction in pandas inside the bucket."""
    if num_partitions is None:
        import ray

        num_partitions = max(4, int(ray.cluster_resources().get("CPU", 8)))
    nparts = num_partitions

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            bucket=(pd.util.hash_pandas_object(df["query_id"], index=False)
                    % nparts).astype("int32"))

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = [_final_topk(g, k) for _, g in df.groupby("query_id", sort=False)]
        if not out:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "neighbor_id": pd.Series([], dtype="int64"),
                                 "rank": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    return (partial.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(reduce_bucket, batch_format="pandas"))


def knn_bruteforce(sf_dir: str, stride: int = 50, k: int = 5):
    """Exact cosine top-k: (query_id, neighbor_id, rank).

    Queries = embeddings with vec_id % stride == 0 (deterministic subset).
    """
    import ray
    import ray.data

    ds = _bread("%s/embeddings.parquet" % sf_dir,
                               columns=["vec_id", "embedding"])
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    partial = ds.map_batches(
        _BatchScorer,
        fn_constructor_kwargs={"sf_dir": sf_dir, "stride": stride, "k": k},
        batch_format="pandas",
        batch_size=512,
        concurrency=(1, max(2, ncpu // 2)),
    )
    # partial top-k per batch → bucketed global reduce per query
    return _final_topk_reduce(partial, k)


def _cell_topk_partial(qids: np.ndarray, cids: np.ndarray,
                       sims: np.ndarray, k: int) -> pd.DataFrame:
    """Per-cell partial top-k: for every row of ``sims`` keep the k best
    columns (vectorized argpartition, no per-row Python loop). Entries
    masked to -inf (self-matches) are dropped after selection."""
    n, m = sims.shape
    if n == 0 or m == 0:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "neighbor_id": pd.Series([], dtype="int64"),
                             "sim": pd.Series([], dtype="float64")})
    k2 = min(k, m)
    if k2 < m:
        idx = np.argpartition(-sims, k2 - 1, axis=1)[:, :k2]
    else:
        idx = np.broadcast_to(np.arange(m), (n, m)).copy()
    vals = np.take_along_axis(sims, idx, axis=1)
    keep = np.isfinite(vals.ravel())
    return pd.DataFrame({
        "query_id": np.repeat(qids, k2)[keep],
        "neighbor_id": cids[idx.ravel()][keep],
        "sim": vals.ravel()[keep],
    })


def _hnsw_level(ids, cap: int = 2):
    """Deterministic HNSW layer assignment: geometric(1/2) via the
    md5-derived hash's low bits, capped — lvl = 2 if h % 4 == 0 else
    1 if h % 2 == 0 else 0 (cap=2), so a node appears in layers
    0..lvl. Replayed in SQL as the same modulo CASE."""
    from .traindata import _md5_u64

    out = []
    for v in ids:
        h = _md5_u64("lvl:%d" % int(v))
        lvl = 0
        while lvl < cap and h % (1 << (lvl + 1)) == 0:
            lvl += 1
        out.append(lvl)
    return np.array(out, dtype=np.int64)


def knn_graph(sf_dir: str, k: int = 5, num_blocks: int = None,
              level_at_least: int = None):
    """(vec_id, neighbor_id, rank) — the exact all-pairs k-NN graph: top-k
    cosine neighbors for EVERY vector (what semantic-dedup clustering,
    graph-based ANN indexes and kNN-classification pipelines build on),
    not just for a query subset like ``knn_bruteforce``.

    Scale shape — block-grid all-pairs join (same grid as
    ``dedup.embedding_near_dup``): vector → block ``g = vec_id % B``;
    each unordered block pair is one grid cell and a vector replicates to
    its B cells, so every vector meets every other vector in EXACTLY one
    cell. One Ray group per cell computes the (n/B)²·d matmul and keeps
    only a per-row partial top-k, so the reduce shuffle carries
    O(N·B·k) fixed-width partial rows — never the O(N²) similarity
    matrix — and the existing bucketed per-query reduce
    (``_final_topk_reduce``: one group per hash bucket, never per node)
    merges cell partials into global ranks. Per-task memory is
    O(2N/B · d); size B ≈ sqrt(4·cores) so cells ≈ 2× cores.
    """
    import ray
    import ray.data

    if num_blocks is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        num_blocks = max(4, int((4 * ncpu) ** 0.5))
    B = num_blocks

    ds = _bread("%s/embeddings.parquet" % sf_dir,
                               columns=["vec_id", "embedding"])

    def to_cells(df: pd.DataFrame) -> pd.DataFrame:
        if level_at_least is not None:  # hnsw layer restriction
            df = df[_hnsw_level(df["vec_id"].astype("int64"))
                    >= level_at_least]
        g = (df["vec_id"] % B).astype("int32")
        copies = []
        for h in range(B):
            lo = np.minimum(g, h)
            hi = np.maximum(g, h)
            copies.append(pd.DataFrame({
                "vec_id": df["vec_id"],
                "embedding": df["embedding"],
                "g": g,
                "cell": (lo * B + hi).astype("int32"),
            }))
        return pd.concat(copies, ignore_index=True)

    def topk_in_cell(df: pd.DataFrame) -> pd.DataFrame:
        cell = int(df["cell"].iloc[0])
        lo, hi = divmod(cell, B)
        ids = df["vec_id"].to_numpy()
        M = _normalize(np.array(df["embedding"].tolist(), dtype=np.float64))
        if lo == hi:
            sims = M @ M.T
            np.fill_diagonal(sims, -np.inf)
            parts = [_cell_topk_partial(ids, ids, sims, k)]
        else:
            left = df["g"].to_numpy() == lo
            A, C = M[left], M[~left]
            aid, cid = ids[left], ids[~left]
            sims = A @ C.T if len(aid) and len(cid) else \
                np.zeros((len(aid), len(cid)))
            parts = [_cell_topk_partial(aid, cid, sims, k),
                     _cell_topk_partial(cid, aid, sims.T, k)]
        out = pd.concat(parts, ignore_index=True)
        return pd.DataFrame({
            "query_id": out["query_id"].astype("int64"),
            "neighbor_id": out["neighbor_id"].astype("int64"),
            "sim": out["sim"].astype("float64")})

    partials = (ds.map_batches(to_cells, batch_format="pandas")
                .groupby("cell").map_groups(topk_in_cell,
                                            batch_format="pandas"))
    ranked = _final_topk_reduce(partials, k)
    return ranked.map_batches(
        lambda df: df.rename(columns={"query_id": "vec_id"}),
        batch_format="pandas")


def train_centroids(sf_dir: str, nlist: int = 64, sample: int = 4096,
                    iters: int = 10, seed: int = 7) -> np.ndarray:
    """Deterministic spherical k-means on a bounded driver-side sample
    (first ``sample`` rows of the embeddings parquet) — the small "train
    the coarse quantizer" step every IVF index has. O(sample · d) memory,
    independent of table size."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile("%s/embeddings.parquet" % sf_dir)
    batch = next(pf.iter_batches(batch_size=sample, columns=["embedding"]))
    M = _normalize(np.array(batch.column("embedding").to_pylist(),
                            dtype=np.float64))
    rng = np.random.RandomState(seed)
    nlist = min(nlist, len(M))
    C = M[rng.choice(len(M), size=nlist, replace=False)]
    for _ in range(iters):
        assign = np.argmax(M @ C.T, axis=1)
        for c in range(nlist):
            members = M[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


def knn_ivf(sf_dir: str, stride: int = 50, k: int = 5, nlist: int = 64,
            nprobe: int = 16, shards_per_bucket: int = None,
            target_shard_rows: int = 65536,
            small_table_threshold: int = 500_000):
    """Approximate top-k: IVF with a trained coarse quantizer.

    Candidates are assigned to their nearest of ``nlist`` k-means
    centroids inside ``map_batches``; queries are SHIPPED AS DATA — each
    query row is replicated to its ``nprobe`` nearest centroid buckets —
    and both sides co-group through ONE shuffle (reduce-side join, no
    driver-held query closure). Per-bucket partial top-k is reduced by a
    small groupby(query). Scoring work is ~``nprobe/nlist`` of brute
    force; recall vs ``knn_bruteforce`` is pinned by tests/test_ops.py.

    Buckets are SUB-SHARDED: the group key is ``bucket * S + vec_id % S``
    with ``S = ceil(rows / (nlist · target_shard_rows))`` (overridable),
    so no single reduce task ever materializes a whole IVF bucket —
    at 10^9 vectors a bucket is ~10^7 rows, but each shard stays at
    ~``target_shard_rows``. Queries replicate to all S shards of each
    probed bucket (queries are the small side); candidates land in
    exactly one shard, so no (query, neighbor) pair duplicates and the
    existing per-query reduce merges shard partials unchanged.
    Returns (query_id, neighbor_id, rank).
    """
    import ray.data

    C = train_centroids(sf_dir, nlist)
    nprobe = min(nprobe, C.shape[0])

    ds = _bread("%s/embeddings.parquet" % sf_dir,
                               columns=["vec_id", "embedding"])
    nrows = ds.count()  # parquet-metadata count: cheap, no data scan
    if shards_per_bucket is None:
        shards_per_bucket = max(1, -(-nrows // (C.shape[0] * target_shard_rows)))
    S = shards_per_bucket

    def tag_candidates(df: pd.DataFrame) -> pd.DataFrame:
        M = _normalize(np.array(df["embedding"].tolist(), dtype=np.float64))
        bucket = np.argmax(M @ C.T, axis=1).astype("int64")
        shard = df["vec_id"].to_numpy() % S
        return pd.DataFrame({
            "vec_id": df["vec_id"],
            "embedding": df["embedding"],
            "gkey": (bucket * S + shard).astype("int64"),
            "is_query": False,
        })

    def tag_queries(df: pd.DataFrame) -> pd.DataFrame:
        q = df[df["vec_id"] % stride == 0]
        if q.empty:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "embedding": pd.Series([], dtype="object"),
                                 "gkey": pd.Series([], dtype="int64"),
                                 "is_query": pd.Series([], dtype="bool")})
        Q = _normalize(np.array(q["embedding"].tolist(), dtype=np.float64))
        # nprobe nearest centroids per query → one replica per probe
        # bucket × shard
        order = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
        reps = []
        for p in range(nprobe):
            for s in range(S):
                reps.append(pd.DataFrame({
                    "vec_id": q["vec_id"].to_numpy(),
                    "embedding": q["embedding"].to_numpy(),
                    "gkey": (order[:, p].astype("int64") * S + s),
                    "is_query": True,
                }))
        return pd.concat(reps, ignore_index=True)

    candidates = ds.map_batches(tag_candidates, batch_format="pandas")
    queries = ds.map_batches(tag_queries, batch_format="pandas")

    def score_bucket(df: pd.DataFrame) -> pd.DataFrame:
        q = df[df["is_query"]]
        c = df[~df["is_query"]]
        if q.empty or c.empty:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "neighbor_id": pd.Series([], dtype="int64"),
                                 "sim": pd.Series([], dtype="float64")})
        Q = _normalize(np.array(q["embedding"].tolist(), dtype=np.float64))
        Cm = _normalize(np.array(c["embedding"].tolist(), dtype=np.float64))
        qids = q["vec_id"].to_numpy()
        cids = c["vec_id"].to_numpy()
        sims = Q @ Cm.T
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            row = sims[qi]
            valid = cids != qids[qi]
            kk = min(k, int(valid.sum()))
            if kk == 0:
                continue
            idx = np.argpartition(-np.where(valid, row, -np.inf), kk - 1)[:kk]
            for j in idx:
                if valid[j]:
                    out_q.append(qids[qi])
                    out_n.append(cids[j])
                    out_s.append(row[j])
        return pd.DataFrame({"query_id": pd.Series(out_q, dtype="int64"),
                             "neighbor_id": pd.Series(out_n, dtype="int64"),
                             "sim": out_s})

    if 0 < nrows < small_table_threshold:
        # single-task gate (same pattern + pin as knn_ivfpq's): the two
        # exchanges are pure orchestration at this scale; identical
        # tag/score float trees, row-identical to the distributed path
        import pyarrow.parquet as _ppq

        full = _ppq.read_table("%s/embeddings.parquet" % sf_dir,
                               columns=["vec_id", "embedding"]).to_pandas()
        cat = pd.concat([tag_candidates(full), tag_queries(full)],
                        ignore_index=True)
        pdf = pd.concat([score_bucket(g)
                         for _, g in cat.groupby("gkey", sort=False)],
                        ignore_index=True)
        outs = [_final_topk(g, k)
                for _, g in pdf.groupby("query_id", sort=False)]
        return (pd.concat(outs, ignore_index=True) if outs else
                pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                              "neighbor_id": pd.Series([], dtype="int64"),
                              "rank": pd.Series([], dtype="int64")}))

    partial = (candidates.union(queries)
               .groupby("gkey").map_groups(score_bucket, batch_format="pandas"))
    return _final_topk_reduce(partial, k)


def train_ivfpq(sf_dir: str, nlist: int = 64, m: int = 8, ksub: int = 16,
                sample: int = 4096, iters: int = 10, seed: int = 11):
    """Coarse quantizer + RESIDUAL product-quantization codebooks,
    trained jointly on the bounded driver-side sample — the true IVF-PQ
    trainer (Jégou, Douze & Schmid, TPAMI 2011): PQ learns the residual
    distribution x̂ − c(x̂), not the raw vectors, which is what makes the
    4-bit codes tight enough to rank within a bucket. Deterministic
    (fixed seeds, argmin ties to the lowest code id); O(sample·d)
    memory, independent of table size. Returns (C, CB) with C (nlist, d)
    and CB (m, ksub, d/m)."""
    import pyarrow.parquet as pq

    C = train_centroids(sf_dir, nlist)
    pf = pq.ParquetFile("%s/embeddings.parquet" % sf_dir)
    batch = next(pf.iter_batches(batch_size=sample, columns=["embedding"]))
    M = _normalize(np.array(batch.column("embedding").to_pylist(),
                            dtype=np.float64))
    R = M - C[np.argmax(M @ C.T, axis=1)]
    d = R.shape[1]
    assert d % m == 0, "embedding dim must split evenly into subspaces"
    sd = d // m
    rng = np.random.RandomState(seed)
    ksub = min(ksub, len(R))
    CB = np.empty((m, ksub, sd), dtype=np.float64)
    for mi in range(m):
        sub = R[:, mi * sd:(mi + 1) * sd]
        Cc = sub[rng.choice(len(sub), size=ksub, replace=False)].copy()
        sub2 = (sub * sub).sum(axis=1)
        for _ in range(iters):
            # ||s−c||² via the matmul expansion — one BLAS call instead
            # of an n×ksub×sd broadcast temp (training-only arithmetic:
            # the learned CB feeds engine and oracle as the same
            # literals, so this never has to bit-match the SQL)
            d2 = (sub2[:, None] + (Cc * Cc).sum(axis=1)[None, :]
                  - 2.0 * (sub @ Cc.T))
            a = d2.argmin(axis=1)
            sums = np.zeros((ksub, sd), dtype=np.float64)
            np.add.at(sums, a, sub)
            counts = np.bincount(a, minlength=ksub)
            nz = counts > 0
            Cc[nz] = sums[nz] / counts[nz, None]
        CB[mi] = Cc
    return C, CB


@_functools.lru_cache(maxsize=4)
def _queries_cached(sf_dir: str, stride: int):
    """Per-worker cache of the (query ids, normalized query matrix) pair
    — the refine stage's analogue of _BatchScorer's constructor load."""
    return _load_queries(sf_dir, stride)


def knn_ivfpq(sf_dir: str, stride: int = 50, k: int = 5, nlist: int = 64,
              nprobe: int = 16, m: int = 8, ksub: int = 256,
              refine: int = 4, shards_per_bucket: int = None,
              target_shard_rows: int = 262144,
              small_table_threshold: int = 500_000):
    """Approximate top-k: full IVF-PQ with asymmetric-distance (ADC)
    scoring — the composition of ``knn_ivf``'s routing and ``pq_codes``'s
    compression, and the shape a 10^9-vector index actually takes.

    The scale win over ``knn_ivf`` is WHAT THE SHUFFLE SHIPS: each
    candidate row is (vec_id, group key, ONE packed int64 of m 4-bit
    codes) — 8 bytes of payload instead of a d·8-byte vector, a 64×
    reduction of the all-to-all for d=64 (512× at d=4096). Encoding is
    map-only against broadcast codebooks; only the replicated QUERY rows
    (the small side) carry real vectors. Per bucket shard the reducer
    builds the per-query LUT — ||r_q,sub − CB[mi,j]||² for all (mi, j),
    m·ksub floats — once, then scores every candidate with m table
    lookups, never touching candidate vectors.

    ADC ranks are then REFINED (FAISS's refine stage): the top
    ``refine·k`` ADC candidates per query re-rank by exact cosine. The
    pair list is nq·refine·k rows — queries are the small side of a
    search workload by definition (the same assumption _BatchScorer
    makes loading the query matrix per actor) — so it broadcasts into a
    map-side gather over ONE more streaming pass of the embeddings
    table: matched rows re-score in place, nothing else leaves the map,
    no additional all-to-all. ``refine=0`` returns raw ADC ranks.
    Measured at sf0.001: ADC-only recall@5 0.52, refined 0.78 — exactly
    the nprobe=16/64 routing ceiling (``knn_ivf`` gets the same 0.78
    while shipping every candidate vector through the shuffle).

    Sub-centroid distances use the same Σ(r−w)² form on the engine and
    oracle sides, so code assignment, ADC ranks and the refine replay
    bit-for-bit in SQL with the trained (C, CB) embedded as literals
    (sf0.01-specific, same caveat as ``knn_ivf``'s oracle); recall@k vs
    ``knn_bruteforce`` is pinned in tests/test_ops.py. Buckets sub-shard
    on ``vec_id % S`` exactly as in ``knn_ivf``. Returns
    (query_id, neighbor_id, rank)."""
    import ray.data

    C, CB = train_ivfpq(sf_dir, nlist=nlist, m=m, ksub=ksub)
    nprobe = min(nprobe, C.shape[0])
    sd = CB.shape[2]
    bits = max(4, int(ksub - 1).bit_length())

    ds = _bread("%s/embeddings.parquet" % sf_dir,
                               columns=["vec_id", "embedding"])
    nrows = ds.count()  # parquet-metadata count: cheap, no data scan
    if shards_per_bucket is None:
        shards_per_bucket = max(1, -(-nrows // (C.shape[0] * target_shard_rows)))
    S = shards_per_bucket
    small = 0 < nrows < small_table_threshold

    def encode_candidates(df: pd.DataFrame) -> pd.DataFrame:
        M = _normalize(np.array(df["embedding"].tolist(), dtype=np.float64))
        bucket = np.argmax(M @ C.T, axis=1)
        R = M - C[bucket]
        packed = np.zeros(len(M), dtype=np.int64)
        for mi in range(CB.shape[0]):
            sub = R[:, mi * sd:(mi + 1) * sd]
            d2 = ((sub[:, None, :] - CB[mi][None, :, :]) ** 2).sum(axis=2)
            packed |= d2.argmin(axis=1).astype(np.int64) << (bits * mi)
        shard = df["vec_id"].to_numpy() % S
        return pd.DataFrame({
            "vec_id": df["vec_id"].astype("int64"),
            "gkey": (bucket.astype("int64") * S + shard),
            "codes": packed,
            "emb": np.full(len(M), b"", dtype=object),
            "is_query": False,
        })

    def tag_queries(df: pd.DataFrame) -> pd.DataFrame:
        q = df[df["vec_id"] % stride == 0]
        if q.empty:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "gkey": pd.Series([], dtype="int64"),
                                 "codes": pd.Series([], dtype="int64"),
                                 "emb": pd.Series([], dtype="object"),
                                 "is_query": pd.Series([], dtype="bool")})
        Q = _normalize(np.array(q["embedding"].tolist(), dtype=np.float64))
        order = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
        blobs = [row.tobytes() for row in Q]
        reps = []
        for p in range(nprobe):
            for s in range(S):
                reps.append(pd.DataFrame({
                    "vec_id": q["vec_id"].to_numpy(),
                    "gkey": (order[:, p].astype("int64") * S + s),
                    "codes": np.int64(0),
                    "emb": pd.Series(blobs, dtype="object"),
                    "is_query": True,
                }))
        return pd.concat(reps, ignore_index=True)

    candidates = ds.map_batches(encode_candidates, batch_format="pandas")
    queries = ds.map_batches(tag_queries, batch_format="pandas")
    mask = (1 << bits) - 1
    nm = CB.shape[0]

    def score_shard(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                              "neighbor_id": pd.Series([], dtype="int64"),
                              "sim": pd.Series([], dtype="float64")})
        q = df[df["is_query"]]
        c = df[~df["is_query"]]
        if q.empty or c.empty:
            return empty
        b = int(df["gkey"].iloc[0]) // S
        Q = np.frombuffer(b"".join(q["emb"]), dtype=np.float64)
        Q = Q.reshape(len(q), -1)
        Rq = Q - C[b]
        qids = q["vec_id"].to_numpy()
        cids = c["vec_id"].to_numpy()
        packed = c["codes"].to_numpy(dtype=np.int64)
        adc = np.zeros((len(q), len(c)), dtype=np.float64)
        for mi in range(nm):
            sub = Rq[:, mi * sd:(mi + 1) * sd]
            lut = ((sub[:, None, :] - CB[mi][None, :, :]) ** 2).sum(axis=2)
            codes = (packed >> (bits * mi)) & mask
            adc += lut[:, codes]
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            row = adc[qi]
            valid = cids != qids[qi]
            kk = min(k, int(valid.sum()))
            if kk == 0:
                continue
            idx = np.argpartition(np.where(valid, row, np.inf), kk - 1)[:kk]
            for j in idx:
                if valid[j]:
                    out_q.append(qids[qi])
                    out_n.append(cids[j])
                    out_s.append(-row[j])  # sim = −ADC distance
        return pd.DataFrame({"query_id": pd.Series(out_q, dtype="int64"),
                             "neighbor_id": pd.Series(out_n, dtype="int64"),
                             "sim": out_s})

    def _rescore_hits(hit: pd.DataFrame, nid2q: dict) -> pd.DataFrame:
        if hit.empty:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "neighbor_id": pd.Series([], dtype="int64"),
                                 "sim": pd.Series([], dtype="float64")})
        qids_, Q_ = _queries_cached(sf_dir, stride)
        qpos = {int(x): i for i, x in enumerate(qids_)}
        V = _normalize(np.array(hit["embedding"].tolist(), dtype=np.float64))
        sims = Q_ @ V.T  # (nq, h)
        out_q, out_n, out_s = [], [], []
        for j, nid in enumerate(hit["vec_id"].to_numpy()):
            for qid in nid2q[int(nid)]:
                out_q.append(qid)
                out_n.append(int(nid))
                out_s.append(sims[qpos[qid], j])
        return pd.DataFrame({"query_id": pd.Series(out_q, dtype="int64"),
                             "neighbor_id": pd.Series(out_n, dtype="int64"),
                             "sim": out_s})

    def _nid2q(pdf: pd.DataFrame) -> dict:
        out: dict = {}
        for qid, nid in zip(pdf["query_id"].to_numpy(),
                            pdf["neighbor_id"].to_numpy()):
            out.setdefault(int(nid), []).append(int(qid))
        return out

    if small:
        # single-task gate: at this scale the 4 exchange passes above
        # are pure orchestration (the graph-op gate pattern). Same
        # encode/score/rescore functions, same float trees — pinned
        # row-identical to the distributed path in tests/test_ops.py.
        import pyarrow.parquet as _ppq

        full = _ppq.read_table("%s/embeddings.parquet" % sf_dir,
                               columns=["vec_id", "embedding"]).to_pandas()

        def local_topk(pdf: pd.DataFrame, kk: int) -> pd.DataFrame:
            outs = [_final_topk(g, kk)
                    for _, g in pdf.groupby("query_id", sort=False)]
            if not outs:
                return pd.DataFrame({
                    "query_id": pd.Series([], dtype="int64"),
                    "neighbor_id": pd.Series([], dtype="int64"),
                    "rank": pd.Series([], dtype="int64")})
            return pd.concat(outs, ignore_index=True)

        cat = pd.concat([encode_candidates(full), tag_queries(full)],
                        ignore_index=True)
        pdf = pd.concat([score_shard(g)
                         for _, g in cat.groupby("gkey", sort=False)],
                        ignore_index=True)
        if not refine:
            return local_topk(pdf, k)
        n2q = _nid2q(local_topk(pdf, refine * k))
        hit = full[full["vec_id"].isin(set(n2q))]
        return local_topk(_rescore_hits(hit, n2q), k)

    partial = (candidates.union(queries)
               .groupby("gkey").map_groups(score_shard, batch_format="pandas"))
    if not refine:
        return _final_topk_reduce(partial, k)

    # refine: top-R ADC pairs (small) broadcast into a map-side gather +
    # exact-cosine rescore over one streaming pass of the table
    nid2q = _nid2q(_final_topk_reduce(partial, refine * k).to_pandas())
    wanted = set(nid2q)

    def gather_rescore(df: pd.DataFrame) -> pd.DataFrame:
        return _rescore_hits(df[df["vec_id"].isin(wanted)], nid2q)

    rescored = ds.map_batches(gather_rescore, batch_format="pandas")
    return _final_topk_reduce(rescored, k)


def kmeans_clusters(sf_dir: str, nlist: int = 64):
    """(vec_id, cluster) — assign every embedding to its nearest of
    ``nlist`` trained spherical-k-means centroids (argmax of v·c, ties to
    the lowest centroid id — np.argmax and the oracle's (s DESC, c) rank
    agree by construction).

    Map-only: the quantizer trains once on a bounded driver-side sample
    (train_centroids — O(sample·d), independent of table size) and the
    centroid matrix broadcasts into the assign map via closure capture
    (64×d floats; ship via ray.put for thousands of centroids). The
    embeddings table streams through one vectorized matmul pass —
    the canonical "cluster a corpus by embedding" topic-bucketing stage.
    """
    import ray.data

    C = train_centroids(sf_dir, nlist)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        M = np.array(df["embedding"].to_list(), dtype=np.float64)
        a = np.argmax(M @ C.T, axis=1)
        return pd.DataFrame({"vec_id": df["vec_id"].astype("int64"),
                             "cluster": a.astype("int64")})

    ds = _bread("%s/embeddings.parquet" % sf_dir,
                               columns=["vec_id", "embedding"])
    return ds.map_batches(assign, batch_format="pandas")


def train_pq_codebooks(sf_dir: str, m: int = 8, ksub: int = 16,
                       sample: int = 4096, iters: int = 10,
                       seed: int = 11) -> np.ndarray:
    """Deterministic per-subspace L2 k-means on a bounded driver-side
    sample — the "train the product quantizer" step of IVF-PQ (Jégou,
    Douze & Schmid, "Product Quantization for Nearest Neighbor Search",
    TPAMI 2011). Returns an (m, ksub, d/m) array; O(sample·d) memory,
    independent of table size. Empty clusters keep their previous
    centroid (deterministic)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile("%s/embeddings.parquet" % sf_dir)
    batch = next(pf.iter_batches(batch_size=sample, columns=["embedding"]))
    M = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
    d = M.shape[1]
    assert d % m == 0, "embedding dim must split evenly into subspaces"
    sd = d // m
    rng = np.random.RandomState(seed)
    ksub = min(ksub, len(M))
    out = np.empty((m, ksub, sd), dtype=np.float64)
    for mi in range(m):
        sub = M[:, mi * sd:(mi + 1) * sd]
        C = sub[rng.choice(len(sub), size=ksub, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(ksub):
                members = sub[a == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        out[mi] = C
    return out


def pq_codes(sf_dir: str, m: int = 8, ksub: int = 16):
    """(vec_id, m, code) — product-quantization encoding, the
    compression half of IVF-PQ: split each embedding into ``m``
    subspaces and store only the id of the nearest trained sub-centroid
    per subspace (L2; here m=8 × 16 codes = 8 × 4 bits — a 64-float
    vector becomes 4 bytes, the 64× compression that makes 10^9-vector
    ANN fit in RAM). Ties go to the lowest code id (np.argmax first-hit
    == the oracle's (score DESC, c) rank).

    Map-only, the same shape as ``kmeans_clusters``: codebooks train
    once on a bounded driver-side sample, broadcast via closure, and the
    table streams through one vectorized matmul per subspace — argmin
    ||x−c||² computed as argmax (x·c − ||c||²/2), the form the SQL
    oracle replays with the trained codebook embedded as literals.
    """
    import ray.data

    CB = train_pq_codebooks(sf_dir, m=m, ksub=ksub)
    sd = CB.shape[2]
    halfnorm = 0.5 * (CB ** 2).sum(axis=2)  # (m, ksub)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        X = np.array(df["embedding"].to_list(), dtype=np.float64)
        n = len(X)
        vec_ids = df["vec_id"].to_numpy(dtype="int64")
        outs = []
        for mi in range(CB.shape[0]):
            sub = X[:, mi * sd:(mi + 1) * sd]
            scores = sub @ CB[mi].T - halfnorm[mi]
            outs.append(pd.DataFrame({
                "vec_id": vec_ids,
                "m": np.full(n, mi, dtype="int64"),
                "code": scores.argmax(axis=1).astype("int64")}))
        return pd.concat(outs, ignore_index=True)

    ds = _bread("%s/embeddings.parquet" % sf_dir,
                               columns=["vec_id", "embedding"])
    return ds.map_batches(encode, batch_format="pandas")


def kmeans_lloyd(sf_dir: str, k: int = 8, rounds: int = 2,
                 scale: int = 1 << 10):
    """(vec_id, cluster) — DISTRIBUTED Lloyd k-means training in exact
    integer arithmetic: coordinates quantize once to
    ``floor(scale·x)`` int64, so every distance, member sum and
    centroid update is exact and the WHOLE training loop — not just one
    assignment — carries a bit-exact unrolled-CTE SQL oracle. (The
    other quantizers here train on a bounded driver sample;
    this is the full-corpus iterative-ML loop.)

    Init = the ``k`` lowest-vec_id vectors (deterministic). Each round:
    centroids broadcast via closure into a map-only pass that assigns
    every vector (vectorized integer ‖v−c‖², ties to the lowest
    cluster) and emits per-batch per-(cluster, dim) partial sums — a
    combiner whose output is ≤ k·(d+1) rows per batch regardless of
    data size — merged driver-side (model-sized state, like the sketch
    ops); update is elementwise floor(S/cnt), empty clusters keep their
    centroid. Output is the final assignment under the trained
    centroids. Zero data-sized all-to-alls; ``rounds``+1 corpus passes.
    """
    Cf = _lloyd_centroids(sf_dir, k, rounds, scale)

    def final_assign(df: pd.DataFrame) -> pd.DataFrame:
        vid, Vq = _quantize_batch(df, scale)
        return pd.DataFrame({
            "vec_id": pd.Series(vid, dtype="int64"),
            "cluster": pd.Series(_lloyd_assign(Vq, Cf), dtype="int64")})

    return _bread("%s/embeddings.parquet" % sf_dir,
                  columns=["vec_id", "embedding"]) \
        .map_batches(final_assign, batch_format="pandas")


def _quantize_batch(df: pd.DataFrame, scale: int):
    V = np.array(df["embedding"].tolist(), dtype=np.float64)
    return (df["vec_id"].to_numpy(dtype="int64"),
            np.floor(float(scale) * V).astype(np.int64))


def _lloyd_assign(Vq: np.ndarray, Cm: np.ndarray) -> np.ndarray:
    d2 = ((Vq * Vq).sum(axis=1)[:, None]
          - 2 * (Vq @ Cm.T)
          + (Cm * Cm).sum(axis=1)[None, :])
    return np.argmin(d2, axis=1).astype(np.int64)  # ties → lowest c


def _lloyd_centroids(sf_dir: str, k: int, rounds: int,
                     scale: int) -> np.ndarray:
    """The kmeans_lloyd training loop, factored so silhouette_eval can
    reuse the trained model — arithmetic unchanged (oracle-pinned)."""

    def load_batches():
        return _bread("%s/embeddings.parquet" % sf_dir,
                      columns=["vec_id", "embedding"])

    # deterministic init: k lowest vec_ids, cluster index by vec_id rank
    import pyarrow.parquet as pq

    tbl = pq.read_table("%s/embeddings.parquet" % sf_dir,
                        columns=["vec_id", "embedding"])
    ids = np.asarray(tbl.column("vec_id"), dtype=np.int64)
    order = np.argsort(ids)[:k]
    C = np.floor(float(scale) * np.array(
        [tbl.column("embedding")[int(i)].as_py() for i in order],
        dtype=np.float64)).astype(np.int64)
    d = C.shape[1]

    for _ in range(rounds):
        Cm = C.copy()

        def partials(df: pd.DataFrame) -> pd.DataFrame:
            _, Vq = _quantize_batch(df, scale)
            a = _lloyd_assign(Vq, Cm)
            S = np.zeros((k, d), dtype=np.int64)
            np.add.at(S, a, Vq)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            cs = np.repeat(np.arange(k, dtype=np.int64), d)
            js = np.tile(np.arange(d, dtype=np.int64), k)
            out = pd.DataFrame({"c": cs, "j": js, "s": S.ravel()})
            return pd.concat([out, pd.DataFrame(
                {"c": np.arange(k, dtype=np.int64),
                 "j": np.int64(-1), "s": cnt})], ignore_index=True)

        agg = (load_batches()
               .map_batches(partials, batch_format="pandas")
               .to_pandas()
               .groupby(["c", "j"], as_index=False)["s"].sum())
        cnts = agg[agg["j"] == -1].set_index("c")["s"]
        sums = agg[agg["j"] >= 0]
        for c in range(k):
            n = int(cnts.get(c, 0))
            if n == 0:
                continue
            row = sums[sums["c"] == c].sort_values("j")["s"] \
                .to_numpy(dtype="int64")
            C[c] = row // n  # floor division, exact

        del Cm

    return C


def label_centroids(sf_dir: str, scale: int = 1 << 10):
    """(label, dim, sum_q, n) — per-label embedding sums in exact
    integers (the vector-column GROUP BY: class centroids up to the
    trivial division, prototype vectors, per-class drift monitoring).
    Components quantize once to floor(scale·x) int64 (the kmeans_lloyd
    rule), so per-label sums are order-independent and engine-portable;
    the caller divides sum_q/n for the centroid.

    Scale shape: map-only combiner — each batch collapses to at most
    |labels|·d partial rows (one vectorized matrix groupby-add), then a
    |labels|·d-key native hash aggregate; no embedding ever crosses the
    exchange.
    """
    import ray.data

    ds = _bread("%s/embeddings.parquet" % sf_dir,
                               columns=["embedding", "label"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        V = np.array(df["embedding"].tolist(), dtype=np.float64)
        Q = np.floor(float(scale) * V).astype(np.int64)
        lab = df["label"].to_numpy(dtype="int64")
        labs = np.unique(lab)
        d = Q.shape[1]
        rows = []
        for l in labs:
            m = lab == l
            s = Q[m].sum(axis=0)
            rows.append(pd.DataFrame({
                "label": np.int64(l), "dim": np.arange(d, dtype="int64"),
                "sum_q": s.astype("int64"),
                "n": np.int64(int(m.sum()))}))
        return pd.concat(rows, ignore_index=True)

    # partials are ≤ |labels|·d rows per batch — fold driver-side:
    # Ray's native multi-key aggregate is pathological even at 640
    # keys (measured 9.7 s vs 0.7 s at sf0.1/32; CLAUDE.md gotcha)
    t = ds.map_batches(partial, batch_format="pandas").to_pandas()
    g = t.groupby(["label", "dim"], as_index=False)[["sum_q", "n"]].sum()
    return pd.DataFrame({
        "label": g["label"].astype("int64"),
        "dim": g["dim"].astype("int64"),
        "sum_q": g["sum_q"].astype("int64"),
        "n": g["n"].astype("int64")})


def pca_power(sf_dir: str, rounds: int = 64, scale: int = 1 << 10):
    """(vec_id, score) — every vector's projection onto the TOP
    PRINCIPAL COMPONENT of the embedding table, trained distributed
    and bit-exactly: the d×d covariance sufficient statistics
    (n, Σx, ΣxxT over coordinates floor-quantized to ``scale``) fold
    from a map-only per-batch combiner — ≤ d² + d + 1 cells per batch
    regardless of data size, zero all-to-alls — and the driver runs
    ``rounds`` of integer power iteration on C = n·ΣxxT − (Σx)(Σx)ᵀ
    (the n²-scaled covariance): u = C·v, then v = trunc(u·2²⁰ /
    max|u|). Every step is exact integer arithmetic (Python bigints
    driver-side, HUGEINT in the SQL mirror; DuckDB ``//`` TRUNCATES
    toward zero while Python ``//`` floors, so the engine mirrors
    trunc-division explicitly). The spectral sibling of kmeans_lloyd's
    full-corpus iterative training: one suffstats pass + one scoring
    pass with the trained component broadcast via closure.

    The 2²⁰ renormalization each round keeps every u entry under
    64·|C|·2²⁰ ≈ 10²¹ — inside HUGEINT at any corpus size whose C
    fits 10¹⁵ (n ≤ ~10⁶ at this scale; shift ``scale`` down for
    larger corpora). Rounds are pure driver work on the d×d model —
    the corpus is touched exactly twice however many rounds run; the
    default 64 converges the near-flat synthetic spectrum
    (λ₁/λ₂ ≈ 1.07 ⇒ |corr| vs the exact eigenvector 0.9997).
    """
    ds = _bread("%s/embeddings.parquet" % sf_dir,
                columns=["vec_id", "embedding"])
    d = 64

    def suffstats(df: pd.DataFrame) -> pd.DataFrame:
        X = np.array(df["embedding"].tolist(), dtype=np.float64)
        x = np.floor(float(scale) * X).astype(np.int64)
        s2 = x.T @ x                       # d×d, fits int64 per batch
        s1 = x.sum(axis=0)
        jj, kk = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        return pd.DataFrame({
            "j": np.concatenate([jj.ravel(), np.arange(d), [d]]),
            "k": np.concatenate([kk.ravel(), np.full(d, d), [d]]),
            "s": np.concatenate([s2.ravel(), s1, [len(x)]]),
        }).astype("int64")

    parts = ds.map_batches(suffstats, batch_format="pandas").to_pandas()
    S: dict = {}
    for j, k, s in parts.itertuples(index=False):
        S[(int(j), int(k))] = S.get((int(j), int(k)), 0) + int(s)
    n = S[(d, d)]
    s1 = [S.get((j, d), 0) for j in range(d)]
    C = [[n * S.get((j, k), 0) - s1[j] * s1[k] for k in range(d)]
         for j in range(d)]

    def trunc_div(a: int, b: int) -> int:
        return -((-a) // b) if a < 0 else a // b

    v = [1] * d
    for _ in range(rounds):
        u = [sum(C[j][k] * v[k] for k in range(d)) for j in range(d)]
        m = max(abs(x) for x in u)
        assert m > 0, "degenerate covariance (all-equal vectors)"
        v = [trunc_div(x << 20, m) for x in u]
    varr = np.array(v, dtype=np.int64)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        X = np.array(df["embedding"].tolist(), dtype=np.float64)
        x = np.floor(float(scale) * X).astype(np.int64)
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy("int64"),
            "score": (x @ varr).astype("int64")})

    return ds.map_batches(score, batch_format="pandas")


def kcenter_coreset(sf_dir: str, k: int = 8, scale: int = 1 << 10,
                    small_table_threshold: int = 500_000):
    """(vec_id, center, dist2) — greedy k-CENTER / farthest-point
    coreset selection (Gonzalez 1985; the 2-approximation every
    coreset-based data-selection pipeline starts from): seed with the
    min vec_id, then ``k−1`` times add the point FARTHEST from its
    nearest chosen center (ties → min vec_id), finally assign every
    point to its nearest center (ties → min center id). Coordinates
    floor-quantize to ``scale`` once, so every distance is an exact
    int64 and the whole selection walk + assignment replays
    bit-for-bit in an unrolled-CTE SQL oracle (the kmeans_lloyd
    contract).

    Scale shape: each greedy round is ONE map-only corpus pass — the
    ≤ k chosen centers broadcast via closure, the per-batch combiner
    emits a single (vec_id, dist2) argmax row, the driver folds
    n_batches rows. k rounds ⇒ k+1 passes, zero all-to-alls. Below
    ``small_table_threshold`` rows a single-task gate runs the same
    integer walk on one in-memory matrix (pure orchestration
    otherwise), row-identical by exactness.
    """
    ds = _bread("%s/embeddings.parquet" % sf_dir,
                columns=["vec_id", "embedding"])
    nrows = ds.count()

    def quantize(df: pd.DataFrame):
        X = np.array(df["embedding"].tolist(), dtype=np.float64)
        return (df["vec_id"].to_numpy("int64"),
                np.floor(float(scale) * X).astype(np.int64))

    def min_dist2(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
        # exact int64: 64·(2·scale)² per term, k centers
        best = None
        for c in cents:
            d = x - c[None, :]
            dd = (d * d).sum(axis=1)
            best = dd if best is None else np.minimum(best, dd)
        return best

    def farthest(ids: np.ndarray, dd: np.ndarray):
        j = np.lexsort((ids, -dd))[0]
        return int(ids[j]), int(dd[j])

    if 0 < nrows < small_table_threshold:
        import pyarrow.parquet as _ppq

        full = _ppq.read_table("%s/embeddings.parquet" % sf_dir,
                               columns=["vec_id", "embedding"]
                               ).to_pandas()
        ids, X = quantize(full)
        order = np.argsort(ids)
        ids, X = ids[order], X[order]
        cents = X[[0]]
        cent_ids = [int(ids[0])]
        for _ in range(k - 1):
            dd = min_dist2(X, cents)
            vid, _d = farthest(ids, dd)
            cents = np.vstack([cents, X[ids == vid][:1]])
            cent_ids.append(vid)
        # assignment: nearest center, ties to the LOWEST selection
        # index (earliest-chosen center) — mirrored as (dd, t) in SQL
        dall = np.stack([((X - c[None, :]) ** 2).sum(axis=1)
                         for c in cents], axis=1)
        a = dall.argmin(axis=1)
        cent_ids = np.array(cent_ids, dtype=np.int64)
        return pd.DataFrame({
            "vec_id": pd.Series(ids, dtype="int64"),
            "center": pd.Series(cent_ids[a], dtype="int64"),
            "dist2": pd.Series(dall[np.arange(len(ids)), a],
                               dtype="int64")})

    # distributed: per-round map-only argmax combiner. Each partial row
    # carries the candidate's QUANTIZED vector (d ints), so the driver
    # never pays an extra fetch pass per chosen center — k+1 passes
    # total including the seed scan and the final assignment.
    def seed_partial(df: pd.DataFrame) -> pd.DataFrame:
        ids, X = quantize(df)
        j = int(np.argmin(ids))
        return pd.DataFrame({"vec_id": pd.Series([int(ids[j])],
                                                 dtype="int64"),
                             "dist2": pd.Series([0], dtype="int64"),
                             "vq": [X[j].tolist()]})

    seeds = ds.map_batches(seed_partial, batch_format="pandas").to_pandas()
    j = int(seeds["vec_id"].idxmin())
    cents = [np.array(seeds["vq"].iloc[j], dtype=np.int64)]
    cent_ids = [int(seeds["vec_id"].iloc[j])]
    for _ in range(k - 1):
        cl = np.stack(cents)

        def round_partial(df: pd.DataFrame, _c=cl) -> pd.DataFrame:
            ids, X = quantize(df)
            dd = min_dist2(X, _c)
            jj = np.lexsort((ids, -dd))[0]
            return pd.DataFrame({"vec_id": pd.Series([int(ids[jj])],
                                                     dtype="int64"),
                                 "dist2": pd.Series([int(dd[jj])],
                                                    dtype="int64"),
                                 "vq": [X[jj].tolist()]})

        parts = (ds.map_batches(round_partial, batch_format="pandas")
                 .to_pandas())
        order = np.lexsort((parts["vec_id"].to_numpy("int64"),
                            -parts["dist2"].to_numpy("int64")))
        w = int(order[0])
        cents.append(np.array(parts["vq"].iloc[w], dtype=np.int64))
        cent_ids.append(int(parts["vec_id"].iloc[w]))

    cl = np.stack(cents)
    cid_arr = np.array(cent_ids, dtype=np.int64)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        ids, X = quantize(df)
        dall = np.stack([((X - c[None, :]) ** 2).sum(axis=1)
                         for c in cl], axis=1)
        a = dall.argmin(axis=1)
        return pd.DataFrame({
            "vec_id": pd.Series(ids, dtype="int64"),
            "center": pd.Series(cid_arr[a], dtype="int64"),
            "dist2": pd.Series(dall[np.arange(len(ids)), a],
                               dtype="int64")})

    return ds.map_batches(assign, batch_format="pandas")


def mutual_knn(sf_dir: str, k: int = 5,
               num_partitions: int = None):
    """(vec_id, neighbor_id, rank) — the MUTUAL k-NN graph: keep the
    edge (a → b, rank r) only when b also lists a in ITS top-k. The
    standard noise-pruning step between a raw k-NN graph and
    clustering / semantic-dedup / manifold methods (reciprocal
    nearest neighbors): hub vectors that appear in everyone's list
    but reciprocate nothing lose their spurious edges.

    Scale shape: one extra fixed-width exchange over the k·N edge
    rows of ``knn_graph`` — each edge emits under its canonical
    (min, max) pair key, a hash co-group keeps pairs seen from BOTH
    directions, and the surviving rows retain their original rank.
    """
    import ray

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))
    edges = knn_graph(sf_dir, k=k)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        a = df["vec_id"].to_numpy("int64")
        b = df["neighbor_id"].to_numpy("int64")
        u = np.minimum(a, b)
        w = np.maximum(a, b)
        return pd.DataFrame({
            "vec_id": a, "neighbor_id": b,
            "rank": df["rank"].to_numpy("int64"),
            "u": u, "w": w,
            "part": ((pd.util.hash_pandas_object(pd.Series(u),
                                                 index=False) * 31
                      + pd.util.hash_pandas_object(pd.Series(w),
                                                   index=False))
                     % nparts).astype("int32")})

    def keep_mutual(df: pd.DataFrame) -> pd.DataFrame:
        both = df.groupby(["u", "w"])["vec_id"].transform("size")
        m = df[both == 2]
        return pd.DataFrame({
            "vec_id": m["vec_id"].astype("int64"),
            "neighbor_id": m["neighbor_id"].astype("int64"),
            "rank": m["rank"].astype("int64")})

    return (edges.map_batches(tag, batch_format="pandas")
            .groupby("part").map_groups(keep_mutual,
                                        batch_format="pandas"))


def silhouette_eval(sf_dir: str, k: int = 8, rounds: int = 2,
                    scale: int = 1 << 10):
    """(vec_id, cluster, b_cluster, s_q6) — EXACT silhouette scores
    (Rousseeuw 1987, on squared quantized distances) for the
    kmeans_lloyd clustering: a(i) = mean d² to own-cluster mates,
    b(i) = min over other clusters of mean d² — s = (b−a)/max(a,b),
    the standard clustering-quality evaluation. The O(N²) pairwise
    definition collapses to CLUSTER SUFFICIENT STATISTICS:
    Σ_{j∈c}‖xᵢ−xⱼ‖² = n_c·‖xᵢ‖² + Q_c − 2·xᵢ·M_c, so after training
    the whole evaluation is ONE stats-combiner pass plus ONE map-only
    scoring pass — no pairwise join at any corpus size.

    Exactness: coordinates are kmeans_lloyd's int64 quantization, so
    every S_c(i) is an exact integer (bounded while N < 2³⁷ at this
    scale); fraction comparisons cross-multiply, b ties go to the
    lowest cluster, s_q6 = trunc(10⁶·(b−a)/max(a,b)) mirroring
    DuckDB's truncating ``//`` on the negative side; singleton
    clusters score 0 by the standard convention.
    """
    C = _lloyd_centroids(sf_dir, k, rounds, scale)
    d = C.shape[1]

    def load():
        return _bread("%s/embeddings.parquet" % sf_dir,
                      columns=["vec_id", "embedding"])

    def stat_partials(df: pd.DataFrame) -> pd.DataFrame:
        _, Vq = _quantize_batch(df, scale)
        a = _lloyd_assign(Vq, C)
        S = np.zeros((k, d), dtype=np.int64)
        np.add.at(S, a, Vq)
        cnt = np.bincount(a, minlength=k).astype(np.int64)
        q = np.zeros(k, dtype=np.int64)
        np.add.at(q, a, (Vq * Vq).sum(axis=1))
        cs = np.repeat(np.arange(k, dtype=np.int64), d)
        js = np.tile(np.arange(d, dtype=np.int64), k)
        out = pd.DataFrame({"c": cs, "j": js, "s": S.ravel()})
        extra = pd.DataFrame({
            "c": np.tile(np.arange(k, dtype=np.int64), 2),
            "j": np.repeat(np.array([-1, -2], dtype=np.int64), k),
            "s": np.concatenate([cnt, q])})
        return pd.concat([out, extra], ignore_index=True)

    agg = (load().map_batches(stat_partials, batch_format="pandas")
           .to_pandas().groupby(["c", "j"], as_index=False)["s"].sum())
    n_c = [int(agg[(agg["c"] == c) & (agg["j"] == -1)]["s"].sum())
           for c in range(k)]
    q_c = [int(agg[(agg["c"] == c) & (agg["j"] == -2)]["s"].sum())
           for c in range(k)]
    M = np.zeros((k, d), dtype=np.int64)
    sums = agg[agg["j"] >= 0]
    for c in range(k):
        row = sums[sums["c"] == c].sort_values("j")["s"]
        if len(row):
            M[c] = row.to_numpy("int64")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        vid, Vq = _quantize_batch(df, scale)
        a = _lloyd_assign(Vq, C)
        qi = (Vq * Vq).sum(axis=1)
        dots = Vq @ M.T  # exact while N < 2^37
        out_b, out_s = np.zeros(len(vid), dtype=np.int64), \
            np.zeros(len(vid), dtype=np.int64)
        for i in range(len(vid)):
            own = int(a[i])
            sa = int(n_c[own]) * int(qi[i]) + q_c[own] \
                - 2 * int(dots[i, own])
            da = n_c[own] - 1
            bc, sb, db = -1, 0, 0
            for c in range(k):
                if c == own or n_c[c] == 0:
                    continue
                sc = int(n_c[c]) * int(qi[i]) + q_c[c] \
                    - 2 * int(dots[i, c])
                if bc < 0 or sc * db < sb * n_c[c]:
                    bc, sb, db = c, sc, n_c[c]
            if da <= 0 or bc < 0:
                out_b[i], out_s[i] = bc, 0
                continue
            bn, an = sb * da, sa * db
            den = max(an, bn)
            if den == 0:
                out_b[i], out_s[i] = bc, 0
                continue
            num = bn - an
            qv = (1000000 * abs(num)) // den
            out_b[i] = bc
            out_s[i] = qv if num >= 0 else -qv
        return pd.DataFrame({
            "vec_id": pd.Series(vid, dtype="int64"),
            "cluster": pd.Series(a, dtype="int64"),
            "b_cluster": pd.Series(out_b, dtype="int64"),
            "s_q6": pd.Series(out_s, dtype="int64")})

    return load().map_batches(score, batch_format="pandas")


def knn_greedy_search(sf_dir: str, n_queries: int = 10,
                      max_hops: int = 12,
                      small_graph_threshold: int = 500_000,
                      num_partitions: Optional[int] = None):
    """(query_id, found_id, n_hops) — GREEDY GRAPH SEARCH over the exact
    k-NN graph: the navigation primitive graph-based ANN indexes
    (HNSW layer 0, NSG) are built on. From a fixed entry node (node 0;
    node 1 for query 0), repeatedly move to the candidate — current
    node plus its k out-neighbors, the query itself excluded — with the
    best (cosine DESC, id ASC) score; stop when the best candidate IS
    the current node. The (sim, -id) objective strictly increases on
    every move, so the walk provably terminates (ties collapse to the
    smallest id, which then holds).

    Scale shape: the query matrix broadcasts once (knn_bruteforce's
    pattern); each hop is three bucketed co-groups — state×adjacency on
    hash(cur), candidates×embeddings on hash(cand) (sims computed
    in-bucket against the broadcast queries), argmax per query on
    hash(qid) — so per-hop traffic is O(queries·k) fixed-width rows and
    the graph/embedding tables never move. Graphs at or below
    ``small_graph_threshold`` nodes take a single-task walk (pinned
    identical to the distributed loop by test). The walk is exact
    greedy search, not approximate: its answer is a property of the
    graph, and the SQL oracle replays every hop.
    """
    import ray

    from .readers import bounded_read_parquet as _bread_local

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    import pyarrow.parquet as pq_

    meta_rows = pq_.read_metadata(
        "%s/embeddings.parquet" % sf_dir).num_rows

    edges = knn_graph(sf_dir).materialize()

    # queries broadcast: row-group-filtered read, queries-sized — the
    # full embedding table lands driver-side only inside the
    # small-graph local gate below
    qtbl = pq_.read_table("%s/embeddings.parquet" % sf_dir,
                          columns=["vec_id", "embedding"],
                          filters=[("vec_id", "<", n_queries)])
    Q = _normalize(np.array(qtbl.column("embedding").to_pylist(),
                            dtype=np.float64))
    qids = np.asarray(qtbl.column("vec_id")).astype(np.int64)
    qrow = {int(v): i for i, v in enumerate(qids)}

    entries = [1 if int(q) == 0 else 0 for q in qids]
    if meta_rows <= small_graph_threshold:
        tbl = pq_.read_table("%s/embeddings.parquet" % sf_dir,
                             columns=["vec_id", "embedding"])
        ids = np.asarray(tbl.column("vec_id"))
        M = _normalize(np.array(tbl.column("embedding").to_pylist(),
                                dtype=np.float64))
        row = {int(v): i for i, v in enumerate(ids)}
        out = _greedy_walk_local(edges.to_pandas(), M, row, Q, qrow,
                                 qids, entries, max_hops)
        return pd.DataFrame(out, columns=["query_id", "found_id",
                                          "n_hops"]).astype("int64")

    return _greedy_walk_dist(sf_dir, edges, qids, entries, Q, qrow,
                             max_hops, nparts)


def _greedy_walk_local(edge_df, M, row, Q, qrow, qids, entries,
                       max_hops: int):
    """Single-task greedy (cosine DESC, id ASC) walks over one edge
    set; shared by knn_greedy_search's small-graph gate and each layer
    of hnsw_search. Returns [(qid, found, hops)] aligned to qids."""
    adj: dict = {}
    for v, n in zip(edge_df["vec_id"].astype(int),
                    edge_df["neighbor_id"].astype(int)):
        adj.setdefault(v, []).append(n)
    out = []
    for q, entry in zip(qids, entries):
        q = int(q)
        qe = Q[qrow[q]]
        cur = int(entry)
        hops = 0
        for _ in range(max_hops):
            cands = [c for c in [cur] + adj.get(cur, [])
                     if c != q]
            sims = {c: float(M[row[c]] @ qe) for c in cands}
            nxt = sorted(cands, key=lambda c: (-sims[c], c))[0]
            if nxt == cur:
                break
            cur = nxt
            hops += 1
        else:
            raise AssertionError(
                "greedy walk for query %d hit max_hops=%d without "
                "converging — raise the hop cap (and the oracle's "
                "unrolled depth)" % (q, max_hops))
        out.append((q, cur, hops))
    return out


def _greedy_walk_dist(sf_dir: str, edges, qids, entries, Q, qrow,
                      max_hops: int, nparts: int):
    """Distributed greedy walk (see knn_greedy_search's docstring for
    the three bucketed co-groups per hop); shared with hnsw_search's
    per-layer descents. ``entries`` aligns with ``qids``."""
    import ray
    import ray.data

    from .readers import bounded_read_parquet as _bread_local

    q_ref = ray.put((qrow, Q))

    emb = _bread_local("%s/embeddings.parquet" % sf_dir,
                       columns=["vec_id", "embedding"])

    def emb_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "vec_id": df["vec_id"].astype("int64"),
            "embedding": df["embedding"],
            "side": np.int8(1), "qid": np.int64(0)})
        out["bucket"] = (df["vec_id"].astype("int64")
                         % nparts).astype("int32")
        return out

    def adj_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "vec_id": df["vec_id"].astype("int64"),
            "neighbor_id": df["neighbor_id"].astype("int64"),
            "side": np.int8(1), "qid": np.int64(0)})
        out["bucket"] = (out["vec_id"] % nparts).astype("int32")
        return out

    adj_tagged = edges.map_batches(adj_rows,
                                   batch_format="pandas").materialize()
    emb_tagged = emb.map_batches(emb_rows,
                                 batch_format="pandas").materialize()

    state = pd.DataFrame({
        "qid": qids,
        "cur": [int(e) for e in entries],
        "n_hops": np.int64(0)})

    from .traindata import _bcast_get

    for _hop in range(max_hops):
        sdf = state.copy()
        sdf["bucket"] = (sdf["cur"] % nparts).astype("int32")
        s_ds = ray.data.from_pandas(pd.DataFrame({
            "vec_id": sdf["cur"].astype("int64"),
            "neighbor_id": np.int64(-1),
            "side": np.int8(0), "qid": sdf["qid"].astype("int64"),
            "bucket": sdf["bucket"]}))

        def expand(df: pd.DataFrame) -> pd.DataFrame:
            st = df[df["side"] == 0][["qid", "vec_id"]]
            ad = df[(df["side"] == 1)][["vec_id", "neighbor_id"]]
            if st.empty:
                return pd.DataFrame({"qid": pd.Series([], dtype="int64"),
                                     "cand": pd.Series([], dtype="int64"),
                                     "bucket": pd.Series([], dtype="int32")})
            m = st.merge(ad, on="vec_id", how="left")
            cands = pd.concat([
                pd.DataFrame({"qid": st["qid"], "cand": st["vec_id"]}),
                pd.DataFrame({"qid": m["qid"],
                              "cand": m["neighbor_id"]}).dropna()],
                ignore_index=True)
            cands["cand"] = cands["cand"].astype("int64")
            cands = cands[cands["cand"] != cands["qid"]].drop_duplicates()
            cands["bucket"] = (cands["cand"] % nparts).astype("int32")
            return cands

        cands = (s_ds.union(adj_tagged)
                 .groupby("bucket").map_groups(expand,
                                               batch_format="pandas"))

        dim = Q.shape[1]

        def cand_tag(df: pd.DataFrame) -> pd.DataFrame:
            # typed zero placeholder so the union's embedding column
            # concats with the real float32 tensor rows
            return pd.DataFrame({
                "vec_id": df["cand"].astype("int64"),
                "embedding": [np.zeros(dim, dtype=np.float32)] * len(df),
                "side": np.int8(0), "qid": df["qid"].astype("int64"),
                "bucket": df["bucket"].astype("int32")})

        def score_bucket(df: pd.DataFrame) -> pd.DataFrame:
            qrow_l, Q_l = _bcast_get(q_ref)
            emb_side = df[df["side"] == 1]
            cand_side = df[df["side"] == 0]
            if cand_side.empty:
                return pd.DataFrame({"qid": pd.Series([], dtype="int64"),
                                     "cand": pd.Series([], dtype="int64"),
                                     "sim": pd.Series([], dtype="float64"),
                                     "qb": pd.Series([], dtype="int32")})
            ev = {int(v): e for v, e in
                  zip(emb_side["vec_id"].astype("int64"),
                      emb_side["embedding"])}
            sims = []
            for c in cand_side["vec_id"].astype("int64"):
                e = np.asarray(ev[int(c)], dtype=np.float64)
                sims.append(e / np.linalg.norm(e))
            qi = cand_side["qid"].astype("int64").to_numpy()
            sv = np.asarray([float(s @ Q_l[qrow_l[int(q)]])
                             for s, q in zip(sims, qi)])
            out = pd.DataFrame({"qid": qi,
                                "cand": cand_side["vec_id"]
                                .astype("int64").to_numpy(),
                                "sim": sv})
            out["qb"] = (out["qid"] % nparts).astype("int32")
            return out

        scored = (cands.map_batches(cand_tag, batch_format="pandas")
                  .union(emb_tagged)
                  .groupby("bucket").map_groups(score_bucket,
                                                batch_format="pandas"))

        def argmax_q(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"qid": pd.Series([], dtype="int64"),
                                     "nxt": pd.Series([], dtype="int64")})
            d = df.sort_values(["qid", "sim", "cand"],
                               ascending=[True, False, True])
            top = d.groupby("qid", as_index=False).first()
            return pd.DataFrame({"qid": top["qid"].astype("int64"),
                                 "nxt": top["cand"].astype("int64")})

        best = (scored.groupby("qb").map_groups(argmax_q,
                                                batch_format="pandas")
                .to_pandas())
        state = state.merge(best, on="qid", how="left")
        moved = state["nxt"].notna() & (state["nxt"] != state["cur"])
        state.loc[moved, "cur"] = state.loc[moved, "nxt"].astype("int64")
        state.loc[moved, "n_hops"] += 1
        state = state.drop(columns=["nxt"])
        if not moved.any():
            break
    else:
        raise AssertionError(
            "distributed greedy walk hit max_hops=%d without converging"
            % max_hops)

    return pd.DataFrame({
        "query_id": state["qid"].astype("int64"),
        "found_id": state["cur"].astype("int64"),
        "n_hops": state["n_hops"].astype("int64")})


def knn_graph_layers(sf_dir: str, k: int = 5, cap: int = 2,
                     num_blocks: int = None):
    """(layer, vec_id, neighbor_id, rank) — ALL of hnsw_search's layer
    graphs from ONE block-grid pass: each grid cell computes its
    similarity matrix once and emits per-layer masked partial top-ks
    (members = lvl >= layer), so the corpus is read and the all-pairs
    matmul grid is scheduled once instead of cap+1 times. The layer
    rides inside the reduce key (query_id·4 + layer) so the existing
    bucketed top-k reduce is reused unchanged; per-layer edge sets are
    pinned identical to ``knn_graph(level_at_least=l)`` by test."""
    import ray
    import ray.data

    if num_blocks is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        num_blocks = max(4, int((4 * ncpu) ** 0.5))
    B = num_blocks

    ds = _bread("%s/embeddings.parquet" % sf_dir,
                columns=["vec_id", "embedding"])

    def to_cells(df: pd.DataFrame) -> pd.DataFrame:
        g = (df["vec_id"] % B).astype("int32")
        copies = []
        for h in range(B):
            lo = np.minimum(g, h)
            hi = np.maximum(g, h)
            copies.append(pd.DataFrame({
                "vec_id": df["vec_id"],
                "embedding": df["embedding"],
                "g": g,
                "cell": (lo * B + hi).astype("int32"),
            }))
        return pd.concat(copies, ignore_index=True)

    def layered_partials(ids, lv, sims, cids, clv, k):
        parts = []
        for layer in range(cap + 1):
            rm = lv >= layer
            cm = clv >= layer
            if not rm.any() or not cm.any():
                continue
            sub = sims[np.ix_(rm, cm)]
            p = _cell_topk_partial(ids[rm] * 4 + layer, cids[cm],
                                   sub, k)
            parts.append(p)
        return parts

    def topk_in_cell(df: pd.DataFrame) -> pd.DataFrame:
        cell = int(df["cell"].iloc[0])
        lo, hi = divmod(cell, B)
        ids = df["vec_id"].to_numpy()
        lv = _hnsw_level(ids, cap)
        M = _normalize(np.array(df["embedding"].tolist(),
                                dtype=np.float64))
        if lo == hi:
            sims = M @ M.T
            np.fill_diagonal(sims, -np.inf)
            parts = layered_partials(ids, lv, sims, ids, lv, k)
        else:
            left = df["g"].to_numpy() == lo
            A, C = M[left], M[~left]
            aid, cid = ids[left], ids[~left]
            alv, clv = lv[left], lv[~left]
            sims = A @ C.T if len(aid) and len(cid) else \
                np.zeros((len(aid), len(cid)))
            parts = (layered_partials(aid, alv, sims, cid, clv, k)
                     + layered_partials(cid, clv, sims.T, aid, alv, k))
        if not parts:
            return pd.DataFrame({
                "query_id": pd.Series([], dtype="int64"),
                "neighbor_id": pd.Series([], dtype="int64"),
                "sim": pd.Series([], dtype="float64")})
        return pd.concat(parts, ignore_index=True)

    partial = ds.map_batches(to_cells, batch_format="pandas") \
        .groupby("cell").map_groups(topk_in_cell,
                                    batch_format="pandas")
    reduced = _final_topk_reduce(partial, k)

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        q = df["query_id"].astype("int64")
        return pd.DataFrame({
            "layer": (q % 4).astype("int64"),
            "vec_id": (q // 4).astype("int64"),
            "neighbor_id": df["neighbor_id"].astype("int64"),
            "rank": df["rank"].astype("int64")})

    return reduced.map_batches(decode, batch_format="pandas")


def ann_recall(sf_dir: str, k: int = 5,
               num_partitions: Optional[int] = None):
    """(query_id, k, n_hits) — RECALL@k evaluation of the IVF index
    against exact brute force, per query: n_hits = |top-k(IVF) ∩
    top-k(exact)| (recall = n_hits/k, kept as exact integers). The
    standard ANN quality gate — every index deployment reports this
    number before trading exactness for speed; here it composes the
    two independently-oracled ops (``knn_ivf``, ``knn_bruteforce``)
    so the evaluation itself is oracle-checkable.

    Scale shape: both sides emit O(queries·k) fixed-width rows; the
    intersection is ONE hash(query) co-group over those tiny tables —
    evaluation cost is query-sized regardless of corpus size.
    """
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "query_id": df["query_id"].astype("int64"),
                "neighbor_id": df["neighbor_id"].astype("int64"),
                "side": np.int8(side)})
            out["bucket"] = (out["query_id"] % nparts).astype("int32")
            return out
        return fn

    def as_ds(x):
        return x if hasattr(x, "map_batches") \
            else ray.data.from_pandas(x)

    u = as_ds(knn_ivf(sf_dir, k=k)) \
        .map_batches(tag(0), batch_format="pandas") \
        .union(as_ds(knn_bruteforce(sf_dir, k=k))
               .map_batches(tag(1), batch_format="pandas"))

    def hits(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == 0][["query_id", "neighbor_id"]]
        b = df[df["side"] == 1][["query_id", "neighbor_id"]]
        m = a.merge(b, on=["query_id", "neighbor_id"])
        n = m.groupby("query_id").size()
        qs = pd.Series(sorted(set(b["query_id"])), dtype="int64")
        return pd.DataFrame({
            "query_id": qs.to_numpy(),
            "k": np.int64(k),
            "n_hits": np.array([int(n.get(q, 0)) for q in qs],
                               dtype="int64")})

    return u.groupby("bucket").map_groups(hits, batch_format="pandas")


def hnsw_search(sf_dir: str, n_queries: int = 10, max_hops: int = 12,
                cap: int = 2,
                small_graph_threshold: int = 500_000,
                num_partitions: Optional[int] = None):
    """(query_id, found_id, n_hops) — MULTI-LAYER GREEDY SEARCH, the
    HNSW descent (Malkov & Yashunin, TPAMI 2020) over deterministic
    layers: node v joins layers 0..lvl(v) with lvl geometric(1/2) from
    md5 low bits capped at ``cap`` (so layer 2 holds ~n/4 nodes, layer
    1 ~n/2, layer 0 all — the exponentially-thinning hierarchy); each
    layer's graph is the EXACT k-NN graph among its members (knn_graph
    restricted by ``level_at_least``). A query starts at the top
    layer's minimum-id member (itself excluded), runs the same
    (cosine DESC, id ASC) greedy walk knn_greedy_search pins, and each
    layer's fixpoint seeds the next layer down; n_hops sums all
    layers. Upper layers cross the space in long strides before layer
    0 refines locally — the reason HNSW beats flat greedy search on
    hard queries.

    Scale shape: cap+1 knn_graph builds (block-grid, O(N·B·k) reduce
    rows each — upper layers shrink geometrically) and cap+1 walks;
    walk state is O(queries) rows and each hop is the three bucketed
    co-groups of _greedy_walk_dist (single-task gate under
    ``small_graph_threshold``, pinned identical). The SQL oracle
    replays layers, entries and every hop (unrolled MATERIALIZED CTEs
    per layer); the knn_greedy_search float-argmax tolerance
    assumption applies per hop.
    """
    import ray

    import pyarrow.parquet as pq_

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))
    meta_rows = pq_.read_metadata(
        "%s/embeddings.parquet" % sf_dir).num_rows
    # query matrix: row-group-filtered read, queries-sized — the full
    # embedding table never lands on the driver on the distributed path
    qtbl = pq_.read_table("%s/embeddings.parquet" % sf_dir,
                          columns=["vec_id", "embedding"],
                          filters=[("vec_id", "<", n_queries)])
    Q = _normalize(np.array(qtbl.column("embedding").to_pylist(),
                            dtype=np.float64))
    qids = np.asarray(qtbl.column("vec_id")).astype(np.int64)
    qrow = {int(v): i for i, v in enumerate(qids)}

    # entry rule needs only the TWO smallest top-layer ids (min, and
    # second-min for the query that IS the min) — a bounded per-batch
    # fold, never the node-sized top-layer membership on the driver
    def min2_partial(df: pd.DataFrame) -> pd.DataFrame:
        vid = df["vec_id"].astype("int64").to_numpy()
        top = np.sort(vid[_hnsw_level(vid, cap) >= cap])[:2]
        return pd.DataFrame({"v": pd.Series(top, dtype="int64")})

    top2 = np.sort(_bread("%s/embeddings.parquet" % sf_dir,
                          columns=["vec_id"])
                   .map_batches(min2_partial, batch_format="pandas")
                   .to_pandas()["v"].to_numpy())[:2]
    assert len(top2) >= 2, \
        "hnsw_search: top layer needs >= 2 members"
    top2 = [int(top2[0]), int(top2[1])]

    def entry_for(q: int) -> int:
        return top2[1] if q == top2[0] else top2[0]

    entries = [entry_for(int(q)) for q in qids]
    total = {int(q): 0 for q in qids}
    local = meta_rows <= small_graph_threshold
    if local:
        tbl = pq_.read_table("%s/embeddings.parquet" % sf_dir,
                             columns=["vec_id", "embedding"])
        ids = np.asarray(tbl.column("vec_id"))
        M = _normalize(np.array(tbl.column("embedding").to_pylist(),
                                dtype=np.float64))
        row = {int(v): i for i, v in enumerate(ids)}
    cur = entries
    # ONE block-grid pass builds every layer's edge set
    all_edges = knn_graph_layers(sf_dir, cap=cap).materialize()
    if local:
        all_e = all_edges.to_pandas()
    for layer in range(cap, -1, -1):
        if local:
            edge_df = all_e[all_e["layer"] == layer]
            out = _greedy_walk_local(edge_df, M, row, Q,
                                     qrow, qids, cur, max_hops)
            res = {q: (f, h) for q, f, h in out}
        else:
            edges = all_edges.map_batches(
                lambda df, _l=layer: df[df["layer"] == _l]
                [["vec_id", "neighbor_id", "rank"]],
                batch_format="pandas").materialize()
            df = _greedy_walk_dist(sf_dir, edges, qids,
                                   cur, Q, qrow, max_hops, nparts)
            res = {int(r.query_id): (int(r.found_id), int(r.n_hops))
                   for r in df.itertuples()}
        cur = [res[int(q)][0] for q in qids]
        for q in qids:
            total[int(q)] += res[int(q)][1]
    return pd.DataFrame({
        "query_id": pd.Series(qids, dtype="int64"),
        "found_id": pd.Series(cur, dtype="int64"),
        "n_hops": pd.Series([total[int(q)] for q in qids],
                            dtype="int64")})
