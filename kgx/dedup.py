"""Deduplication operators over the ``documents`` table.

Five flavours, each in its scale-correct Ray Data shape:

- exact: hash-bucket shuffle on the dedup key, per-group min(doc_id)
- key-prefix exact (blocking key variant of the same machinery)
- n-gram Jaccard pairs: block → local pairwise verify inside map_groups
- MinHash+LSH: shingle → minhash signature → band buckets (groupby) →
  candidate pairs → distributed hash-join back to signatures → verify
- embedding cosine near-dup: blocked pairwise over normalized vectors

Everything is deterministic across processes (crc32/np hashing, no
PYTHONHASHSEED dependence).
"""

from __future__ import annotations

import itertools
import zlib
from typing import Optional

import numpy as np
import pandas as pd


def _read_documents(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet("%s/documents.parquet" % sf_dir, columns=columns)


def _bucketed_min(ds, key_fn, num_buckets: int = 64):
    """Generic exact dedup: key → hash bucket shuffle → per-key min(doc_id)."""
    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        keys = key_fn(df)
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "key": keys,
            "bucket": (pd.util.hash_pandas_object(keys, index=False)
                       % num_buckets).astype("int32"),
        })

    def dedup_group(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("key", as_index=False)["doc_id"].min()
        return out[["doc_id"]]

    return (ds.map_batches(add_key, batch_format="pandas")
            .groupby("bucket").map_groups(dedup_group, batch_format="pandas"))


def dedup_exact(sf_dir: str):
    """Survivor doc_ids after exact full-text dedup (min doc_id per text)."""
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])
    return _bucketed_min(ds, lambda df: df["text"])


def dedup_first3(sf_dir: str):
    """Exact dedup on a blocking key (first three tokens) — exercises
    collision-heavy keys through the same machinery."""
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def key(df: pd.DataFrame) -> pd.Series:
        return df["text"].str.split(" ").str[:3].str.join(" ")

    return _bucketed_min(ds, key)


def jaccard_pairs(sf_dir: str, threshold: float = 0.8):
    """(doc_id_a, doc_id_b) pairs with token-set Jaccard >= threshold,
    blocked on the first token (each block is verified locally inside
    ``map_groups`` — the block key is the partitioning assumption)."""
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def add_block(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "text": df["text"],
            "block": df["text"].str.split(" ").str[0],
        })

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].tolist()
        sets = [set(t.split(" ")) for t in df["text"]]
        out_a, out_b = [], []
        for i, j in itertools.combinations(range(len(ids)), 2):
            inter = len(sets[i] & sets[j])
            union = len(sets[i]) + len(sets[j]) - inter
            if union and inter / union >= threshold:
                a, b = sorted((ids[i], ids[j]))
                out_a.append(a)
                out_b.append(b)
        return pd.DataFrame({"doc_id_a": pd.Series(out_a, dtype="int64"),
                             "doc_id_b": pd.Series(out_b, dtype="int64")})

    return (ds.map_batches(add_block, batch_format="pandas")
            .groupby("block").map_groups(verify, batch_format="pandas"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    toks = text.split(" ")
    if len(toks) < k:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return np.array([zlib.crc32(g.encode("utf-8")) for g in grams], dtype=np.uint64)


def _minhash(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # (num_perm, n_shingles) universal hashing, vectorized
    with np.errstate(over="ignore"):
        vals = (a[:, None] * hashes[None, :] + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


def minhash_signatures(sf_dir: str, num_perm: int = 64):
    """(doc_id, sig) MinHash signatures; sig is hex-encoded (fixed-width
    string survives Arrow hash joins, list columns do not)."""
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])
    a, b = _perm_params(num_perm)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        sigs = [
            _minhash(_shingle_hashes(t), a, b).astype(">u8").tobytes().hex()
            for t in df["text"]
        ]
        return pd.DataFrame({"doc_id": df["doc_id"], "sig": sigs})

    return ds.map_batches(fn, batch_format="pandas")


def _sig_array(hex_sig: str) -> np.ndarray:
    return np.frombuffer(bytes.fromhex(hex_sig), dtype=">u8")


def minhash_lsh_pairs(sf_dir: str, num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.5, num_partitions: Optional[int] = None):
    """Near-duplicate pairs via MinHash+LSH with exact-Jaccard verify.

    shingle → signature → band buckets (groupby bucket) → candidate pairs
    → hash-join signatures back on both sides → estimated-Jaccard filter.
    Returns (doc_id_a, doc_id_b, jaccard_est).
    """
    if num_partitions is None:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(4, ncpu)
    nparts = num_partitions
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(sf_dir, num_perm).materialize()

    def to_buckets(df: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_bucket = [], []
        chars_per_band = 16 * rows_per_band  # 16 hex chars per u64
        for doc_id, sig in zip(df["doc_id"], df["sig"]):
            for band in range(bands):
                chunk = sig[band * chars_per_band:(band + 1) * chars_per_band]
                key = zlib.crc32(("%d:%s" % (band, chunk)).encode())
                out_doc.append(doc_id)
                out_bucket.append(key)
        out = pd.DataFrame({"doc_id": pd.Series(out_doc, dtype="int64"),
                            "bucket": pd.Series(out_bucket, dtype="int64")})
        # coarse shuffle key: millions of LSH buckets co-group into nparts
        # partitions; the true bucket grouping happens inside the partition
        out["part"] = (out["bucket"] % nparts).astype("int32")
        return out

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in df.groupby("bucket"):
            ids = sorted(set(g["doc_id"].tolist()))
            if len(ids) > 200:  # pathological bucket guard
                ids = ids[:200]
            for a_, b_ in itertools.combinations(ids, 2):
                out_a.append(a_)
                out_b.append(b_)
        out = pd.DataFrame({"doc_id_a": pd.Series(out_a, dtype="int64"),
                            "doc_id_b": pd.Series(out_b, dtype="int64")})
        return out.drop_duplicates()

    buckets = sigs.map_batches(to_buckets, batch_format="pandas")
    candidates = buckets.groupby("part").map_groups(bucket_pairs,
                                                    batch_format="pandas")

    # global candidate-pair dedup (same pair from several bands landing in
    # different partitions), coarse-bucketed again
    def pair_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        pk = df["doc_id_a"] * np.int64(1 << 32) + df["doc_id_b"]
        return df.assign(part=(pk % nparts).astype("int32"))

    candidates = (candidates.map_batches(pair_part, batch_format="pandas")
                  .groupby("part").map_groups(
                      lambda df: df.drop_duplicates(
                          subset=["doc_id_a", "doc_id_b"])[
                          ["doc_id_a", "doc_id_b"]],
                      batch_format="pandas"))

    # verify: reduce-side join of signatures to both pair sides (build
    # rows and probe rows co-grouped on a hash of the doc id)
    def _attach(cands, cand_cols, key_col: str, out_col: str):
        # fixed union schema: pair payload + join machinery columns
        all_cols = list(cand_cols) + ["k", "sig", "is_build", "part"]

        def placeholder(col):
            return "" if col.startswith("sig") else np.int64(0)

        def probe_rows(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["k"] = out[key_col].astype("int64")
            out["sig"] = ""
            out["is_build"] = False
            out["part"] = (out["k"] % nparts).astype("int32")
            return out[all_cols]

        def build_rows(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"k": df["doc_id"].astype("int64"),
                                "sig": df["sig"]})
            out["is_build"] = True
            out["part"] = (out["k"] % nparts).astype("int32")
            for col in cand_cols:
                out[col] = placeholder(col)
            return out[all_cols]

        probes = cands.map_batches(probe_rows, batch_format="pandas")
        builds = sigs.map_batches(build_rows, batch_format="pandas")

        def join_part(df: pd.DataFrame) -> pd.DataFrame:
            build = df[df["is_build"]][["k", "sig"]].rename(
                columns={"sig": out_col})
            probe = df[~df["is_build"]][list(cand_cols) + ["k"]]
            return probe.merge(build, on="k").drop(columns=["k"])

        return probes.union(builds).groupby("part").map_groups(
            join_part, batch_format="pandas")

    joined = _attach(candidates, ["doc_id_a", "doc_id_b"], "doc_id_a", "sig_a")
    joined = _attach(joined, ["doc_id_a", "doc_id_b", "sig_a"], "doc_id_b", "sig_b")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        est = [
            float((_sig_array(sa) == _sig_array(sb)).mean())
            for sa, sb in zip(df["sig_a"], df["sig_b"])
        ]
        out = pd.DataFrame({
            "doc_id_a": df["doc_id_a"].astype("int64"),
            "doc_id_b": df["doc_id_b"].astype("int64"),
            "jaccard_est": est,
        })
        return out[out["jaccard_est"] >= threshold]

    return joined.map_batches(verify, batch_format="pandas")


def simhash(sf_dir: str):
    """(doc_id, simhash hex string) — 64-bit SimHash over token crc32s."""
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        bits = np.arange(64, dtype=np.uint64)
        for text in df["text"]:
            hashes = np.array(
                [zlib.crc32(t.encode()) for t in text.split(" ")], dtype=np.uint64)
            # crc32 is 32-bit; extend deterministically to 64
            hashes = hashes * np.uint64(2654435761) + np.uint64(0x9E3779B97F4A7C15)
            votes = np.zeros(64, dtype=np.int64)
            for h in hashes:
                b = (h >> bits) & np.uint64(1)
                votes += np.where(b == 1, 1, -1)
            val = np.uint64(0)
            for i in range(64):
                if votes[i] > 0:
                    val |= np.uint64(1) << np.uint64(i)
            out.append("%016x" % int(val))
        return pd.DataFrame({"doc_id": df["doc_id"], "simhash": out})

    return ds.map_batches(fn, batch_format="pandas")


def embedding_near_dup(sf_dir: str, threshold: float = 0.4):
    """(vec_id_a, vec_id_b) pairs with cosine >= threshold.

    Blocked all-pairs: candidate side is broadcast once per actor (the
    embedding table's normalized matrix), batches scan against it. The
    scale path replaces the broadcast with an LSH/IVF bucket groupby;
    at testdata scale the matrix is small and broadcast wins (no shuffle).
    """
    import ray
    import ray.data

    ds = ray.data.read_parquet("%s/embeddings.parquet" % sf_dir,
                               columns=["vec_id", "embedding"])

    class PairFinder:
        def __init__(self, sf_dir: str, threshold: float):
            import pyarrow.parquet as pq

            table = pq.read_table("%s/embeddings.parquet" % sf_dir,
                                  columns=["vec_id", "embedding"])
            self.ids = np.asarray(table.column("vec_id"))
            M = np.array(table.column("embedding").to_pylist(), dtype=np.float64)
            self.M = M / np.linalg.norm(M, axis=1, keepdims=True)
            self.threshold = threshold

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            Q = np.array(df["embedding"].tolist(), dtype=np.float64)
            Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
            sims = Q @ self.M.T
            qa, qb = [], []
            qids = df["vec_id"].to_numpy()
            for r in range(sims.shape[0]):
                hits = self.ids[sims[r] >= self.threshold]
                for h in hits:
                    if qids[r] < h:  # upper triangle only, excludes self
                        qa.append(qids[r])
                        qb.append(h)
            return pd.DataFrame({"vec_id_a": pd.Series(qa, dtype="int64"),
                                 "vec_id_b": pd.Series(qb, dtype="int64")})

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return ds.map_batches(
        PairFinder,
        fn_constructor_kwargs={"sf_dir": sf_dir, "threshold": threshold},
        batch_format="pandas",
        batch_size=256,
        concurrency=(1, max(2, ncpu // 2)),
    )
