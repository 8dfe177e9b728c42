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

import numpy as np
import pandas as pd


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


def knn_bruteforce(sf_dir: str, stride: int = 50, k: int = 5):
    """Exact cosine top-k: (query_id, neighbor_id, rank).

    Queries = embeddings with vec_id % stride == 0 (deterministic subset).
    """
    import ray
    import ray.data

    ds = ray.data.read_parquet("%s/embeddings.parquet" % sf_dir,
                               columns=["vec_id", "embedding"])
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    partial = ds.map_batches(
        _BatchScorer,
        fn_constructor_kwargs={"sf_dir": sf_dir, "stride": stride, "k": k},
        batch_format="pandas",
        batch_size=512,
        concurrency=(1, max(2, ncpu // 2)),
    )
    # partial top-k per batch → tiny global reduce per query
    return partial.groupby("query_id").map_groups(
        lambda df: _final_topk(df, k), batch_format="pandas")


def _coarse_bucket(M: np.ndarray, axes: np.ndarray) -> np.ndarray:
    """Deterministic quantizer: sign bits of projections on fixed axes."""
    bits = (M @ axes.T) > 0
    return (bits * (1 << np.arange(axes.shape[0]))).sum(axis=1).astype("int64")


def knn_ivf(sf_dir: str, stride: int = 50, k: int = 5, n_bits: int = 3):
    """Approximate top-k: candidates bucketed by coarse quantizer, each
    query scored only against its own bucket (plus Hamming-1 probes).

    Returns (query_id, neighbor_id, rank) — approximate; no SQL oracle.
    """
    import ray.data

    rng = np.random.RandomState(7)
    # fixed random projection axes — the "trained" coarse quantizer
    axes = rng.standard_normal((n_bits, 64))

    qids, Q = _load_queries(sf_dir, stride)
    qbuckets = _coarse_bucket(Q, axes)
    # probe set per bucket: itself + all Hamming-1 neighbours
    probes: dict = {}
    for b in range(1 << n_bits):
        probes[b] = [b] + [b ^ (1 << i) for i in range(n_bits)]
    bucket_to_queries: dict = {}
    for qi, qb in enumerate(qbuckets):
        for b in probes[qb]:
            bucket_to_queries.setdefault(b, []).append(qi)

    ds = ray.data.read_parquet("%s/embeddings.parquet" % sf_dir,
                               columns=["vec_id", "embedding"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        M = _normalize(np.array(df["embedding"].tolist(), dtype=np.float64))
        return df.assign(bucket=_coarse_bucket(M, axes))

    def score_bucket(df: pd.DataFrame) -> pd.DataFrame:
        bucket = int(df["bucket"].iloc[0])
        q_idx = bucket_to_queries.get(bucket, [])
        if not q_idx:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "neighbor_id": pd.Series([], dtype="int64"),
                                 "sim": pd.Series([], dtype="float64")})
        C = _normalize(np.array(df["embedding"].tolist(), dtype=np.float64))
        cids = df["vec_id"].to_numpy()
        sims = Q[q_idx] @ C.T
        out_q, out_n, out_s = [], [], []
        for row_i, qi in enumerate(q_idx):
            row = sims[row_i]
            valid = cids != qids[qi]
            kk = min(k, valid.sum())
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

    partial = (ds.map_batches(add_bucket, batch_format="pandas")
               .groupby("bucket").map_groups(score_bucket, batch_format="pandas"))
    return partial.groupby("query_id").map_groups(
        lambda df: _final_topk(df, k), batch_format="pandas")
