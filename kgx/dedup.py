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
from typing import Optional

import numpy as np
import pandas as pd

from .readers import compute_heavy_read_parquet as _bread


def _read_documents(sf_dir: str, columns=None):
    import ray.data

    return _bread("%s/documents.parquet" % sf_dir, columns=columns)


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


def _block_pairs_exact(ids, sets, threshold: float,
                       with_counts: bool = False) -> list:
    """All-pairs exact token-set Jaccard inside one block: O(n²).
    ``with_counts`` appends the exact (inter, union) integers so a
    caller can re-threshold later with the identical float compare
    (percolation_curve's shared-pair-stage optimization)."""
    out = []
    for i, j in itertools.combinations(range(len(ids)), 2):
        inter = len(sets[i] & sets[j])
        union = len(sets[i]) + len(sets[j]) - inter
        if union and inter / union >= threshold:
            a, b = sorted((ids[i], ids[j]))
            out.append((a, b, inter, union) if with_counts else (a, b))
    return out


def _block_pairs_escalated(ids, sets, threshold: float, num_perm: int = 64,
                           bands: int = 16, max_bucket: int = 200,
                           with_counts: bool = False) -> list:
    """Oversized-block path: MinHash-LSH candidate generation + EXACT
    Jaccard verify, O(n·num_perm + candidates) instead of O(n²).

    Precision is exact (every emitted pair passes the same exact-Jaccard
    test as the small-block path); recall is the LSH catch probability —
    1-(1-t^(num_perm/bands))^bands ≈ 0.9998 at t = 0.8 with the default
    16 bands of 4 rows, rising toward 1 above the threshold. So the
    answer is preserved except for a ~2·10⁻⁴ tail of pairs sitting
    exactly at the threshold.
    """
    from .textops import token_hash64

    a, b = _perm_params(num_perm)
    rpb = num_perm // bands
    sigs = np.vstack([
        _minhash(np.array([token_hash64(t) for t in s], dtype=np.uint64),
                 a, b)
        for s in sets
    ])
    cand = set()
    for band in range(bands):
        chunk = sigs[:, band * rpb:(band + 1) * rpb]
        buckets: dict = {}
        for i in range(len(ids)):
            buckets.setdefault(chunk[i].tobytes(), []).append(i)
        for members in buckets.values():
            if len(members) > max_bucket:  # pathological bucket guard
                members = members[:max_bucket]
            cand.update(itertools.combinations(members, 2))
    out = []
    for i, j in cand:
        inter = len(sets[i] & sets[j])
        union = len(sets[i]) + len(sets[j]) - inter
        if union and inter / union >= threshold:
            a, b = sorted((ids[i], ids[j]))
            out.append((a, b, inter, union) if with_counts else (a, b))
    return sorted(out)  # set-iteration order must not leak into the output


def jaccard_pairs(sf_dir: str, threshold: float = 0.8,
                  num_partitions: Optional[int] = None,
                  max_block: Optional[int] = None,
                  block_cap: Optional[int] = 4096,
                  emit_counts: bool = False):
    """(doc_id_a, doc_id_b) pairs with token-set Jaccard >= threshold,
    blocked on the first token.

    Scale shape: blocks are COARSENED into ``num_partitions`` hash
    partitions (one Ray group per partition, never one per distinct
    token); the true per-block grouping and the pairwise verify happen in
    pandas inside the partition. Blocks larger than ``block_cap`` (a
    hyper-common first token — the one skew case a blocked all-pairs
    cannot absorb) automatically escalate to LSH candidate generation
    with the SAME exact-Jaccard verify (``_block_pairs_escalated``), so
    no task ever runs an unbounded O(n²): compute is O(n·perm +
    candidates) for those blocks, with exact precision and ≥0.999 recall
    at the threshold. ``max_block`` is the older truncate-the-block guard
    — off by default because it changes the answer.
    """
    if num_partitions is None:
        import ray

        num_partitions = max(4, int(ray.cluster_resources().get("CPU", 8)))
    nparts = num_partitions
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def add_block(df: pd.DataFrame) -> pd.DataFrame:
        block = df["text"].str.split(" ").str[0]
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "text": df["text"],
            "block": block,
            "part": (pd.util.hash_pandas_object(block, index=False)
                     % nparts).astype("int32"),
        })

    def verify_part(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, g in df.groupby("block", sort=False):
            ids = g["doc_id"].tolist()
            texts = g["text"]
            if max_block is not None and len(ids) > max_block:
                order = np.argsort(ids)[:max_block]
                ids = [ids[i] for i in order]
                texts = texts.iloc[order]
            sets = [set(t.split(" ")) for t in texts]
            if block_cap is not None and len(ids) > block_cap:
                rows.extend(_block_pairs_escalated(
                    ids, sets, threshold, with_counts=emit_counts))
            else:
                rows.extend(_block_pairs_exact(
                    ids, sets, threshold, with_counts=emit_counts))
        cols = (["doc_id_a", "doc_id_b", "inter", "union_sz"]
                if emit_counts else ["doc_id_a", "doc_id_b"])
        return pd.DataFrame(rows, columns=cols).astype("int64") \
            if rows else pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in cols})

    return (ds.map_batches(add_block, batch_format="pandas")
            .groupby("part").map_groups(verify_part, batch_format="pandas"))


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
    """md5-u64 shingle hashes (textops.token_hash64 — per-worker cached);
    md5 rather than crc32 so DuckDB reproduces every hash bit-for-bit
    and the whole MinHash+LSH pipeline carries a real SQL oracle
    (queries.minhash_oracle)."""
    from .textops import token_hash64

    toks = text.split(" ")
    if len(toks) < k:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return np.array([token_hash64(g) for g in grams], dtype=np.uint64)


def _minhash(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # (num_perm, n_shingles) universal hashing, vectorized
    with np.errstate(over="ignore"):
        vals = (a[:, None] * hashes[None, :] + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


def minhash_signatures(sf_dir: str, num_perm: int = 64, shingle_k: int = 3):
    """(doc_id, sig) MinHash signatures; sig is hex-encoded (fixed-width
    string survives Arrow hash joins, list columns do not).

    ``shingle_k=3`` (default) estimates 3-gram shingle Jaccard — the
    standard near-dup similarity; ``shingle_k=1`` estimates token-SET
    Jaccard, the similarity ``jaccard_pairs`` computes exactly (used by
    the recall cross-check in tests/test_ops.py).
    """
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])
    a, b = _perm_params(num_perm)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        sigs = [
            _minhash(_shingle_hashes(t, shingle_k), a, b)
            .astype(">u8").tobytes().hex()
            for t in df["text"]
        ]
        return pd.DataFrame({"doc_id": df["doc_id"], "sig": sigs})

    return ds.map_batches(fn, batch_format="pandas")


def _sig_array(hex_sig: str) -> np.ndarray:
    return np.frombuffer(bytes.fromhex(hex_sig), dtype=">u8")


def lsh_bands_for_threshold(threshold: float, num_perm: int = 64) -> int:
    """Pick the band count whose LSH S-curve knee (1/L)^(1/r) sits just
    below ``threshold`` — the sharpest bucket regime that still catches
    at-threshold pairs. Low thresholds get many short bands (wide
    search); dedup thresholds (~0.8) get few long bands (L=8, r=8 at 64
    perms), cutting bucket occupancy from N/2^(64·4/64) collisions per
    band to far sparser 128-bit keys and starving the candidate flood."""
    best = None
    for L in (32, 16, 8, 4):
        if num_perm % L:
            continue
        r = num_perm // L
        knee = (1.0 / L) ** (1.0 / r)
        if knee <= threshold and (best is None or knee > best[1]):
            best = (L, knee)
    return best[0] if best else 32


def minhash_lsh_pairs(sf_dir: str, num_perm: int = 64,
                      bands: Optional[int] = None,
                      threshold: float = 0.5, num_partitions: Optional[int] = None,
                      shingle_k: int = 3, max_bucket: int = 200,
                      verify: str = "carry"):
    """Near-duplicate pairs via MinHash+LSH with estimated-Jaccard verify.
    Returns (doc_id_a, doc_id_b, jaccard_est); ``bands=None`` derives the
    band regime from the threshold (``lsh_bands_for_threshold``: 16×4 at
    0.5, 8×8 at 0.8). Two verify plans, identical answers:

    - ``verify="carry"`` (default): each band row carries the doc's
      binary signature into the bucket shuffle; the estimated-Jaccard
      compare runs INSIDE the bucket partition and only verified pairs
      take one more (tiny) pair-keyed dedup exchange. 2 all-to-all
      rounds total. Shuffle bytes: bands × 8·num_perm B per doc
      (8 bands × 512 B at the 0.8-threshold regime).
    - ``verify="join"``: band rows carry only doc_ids; candidate pairs
      hash-join the signature table back onto both sides (reduce-side
      union+co-group). 4 all-to-all rounds, but each doc's signature
      ships ~twice regardless of band count — the cheaper plan when
      bands is large (low thresholds) or rows are huge; the exchange
      engine's lesson (BASELINE.md) is that shuffle BYTES, not rounds,
      bound 8→32 scaling at corpus scale, so the crossover is real.
    - ``verify="carry_filtered"``: the carry plan behind a
      singleton-bucket pre-filter — an 8-byte-key counting pass finds
      the non-singleton buckets first, and signatures ship only for
      rows that can actually form a pair (measured 91% fewer carried
      signature bytes at sf0.1; see _lsh_pairs_carry_filtered).

    Both run every bucket group inside coarse hash partitions (one Ray
    group per partition, never per bucket) and cap pathological buckets
    at ``max_bucket`` after a doc_id sort, so skewed buckets degrade
    deterministically instead of OOMing a worker.
    """
    if num_partitions is None:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(4, ncpu)
    nparts = num_partitions
    if bands is None:
        bands = lsh_bands_for_threshold(threshold, num_perm)
    rows_per_band = num_perm // bands
    if verify == "carry":
        return _lsh_pairs_carry(sf_dir, num_perm, bands, rows_per_band,
                                threshold, nparts, shingle_k, max_bucket)
    if verify == "carry_filtered":
        return _lsh_pairs_carry_filtered(
            sf_dir, num_perm, bands, rows_per_band, threshold, nparts,
            shingle_k, max_bucket)
    sigs = minhash_signatures(sf_dir, num_perm, shingle_k).materialize()

    def to_buckets(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized banding: one pandas string-slice + hash per band
        # (bands is small and fixed; docs is the big axis)
        chars_per_band = 16 * rows_per_band  # 16 hex chars per u64
        sig = df["sig"]
        doc_ids = df["doc_id"].astype("int64")
        frames = []
        for band in range(bands):
            chunk = sig.str.slice(band * chars_per_band,
                                  (band + 1) * chars_per_band)
            key = pd.util.hash_pandas_object(
                str(band) + ":" + chunk, index=False).astype("int64").abs()
            frames.append(pd.DataFrame({"doc_id": doc_ids, "bucket": key}))
        out = pd.concat(frames, ignore_index=True)
        # coarse shuffle key: millions of LSH buckets co-group into nparts
        # partitions; the true bucket grouping happens inside the partition
        out["part"] = (out["bucket"] % nparts).astype("int32")
        return out

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # singleton buckets (the vast majority) can't produce pairs —
        # drop them vectorized before the per-bucket loop
        df = df[df.duplicated("bucket", keep=False)]
        out_a, out_b = [], []
        for _, g in df.groupby("bucket"):
            ids = sorted(set(g["doc_id"].tolist()))
            if len(ids) > max_bucket:  # pathological bucket guard
                ids = ids[:max_bucket]
            for a_, b_ in itertools.combinations(ids, 2):
                out_a.append(a_)
                out_b.append(b_)
        out = pd.DataFrame({"doc_id_a": pd.Series(out_a, dtype="int64"),
                            "doc_id_b": pd.Series(out_b, dtype="int64")})
        return out.drop_duplicates()

    buckets = sigs.map_batches(to_buckets, batch_format="pandas")
    candidates = buckets.groupby("part").map_groups(bucket_pairs,
                                                    batch_format="pandas")

    # verify: reduce-side join of signatures to both pair sides (build
    # rows and probe rows co-grouped on a hash of the doc id).
    # ``dedup``: the global candidate-pair dedup (same pair surfacing from
    # several bands in different partitions) rides the FIRST attach
    # shuffle for free — its key is doc_id_a, so every duplicate of an
    # (a, b) pair lands in the same partition; no separate dedup exchange.
    def _attach(cands, cand_cols, key_col: str, out_col: str,
                dedup: bool = False):
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
            if dedup:
                probe = probe.drop_duplicates(subset=["doc_id_a", "doc_id_b"])
            return probe.merge(build, on="k").drop(columns=["k"])

        return probes.union(builds).groupby("part").map_groups(
            join_part, batch_format="pandas")

    joined = _attach(candidates, ["doc_id_a", "doc_id_b"], "doc_id_a", "sig_a",
                     dedup=True)
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


def _band_keys(sig_hex: pd.Series, band: int,
               chars_per_band: int) -> pd.Series:
    """The shared LSH band key: pandas 64-bit hash of
    ``"<band>:<hex slice>"`` — every plan (carry / join /
    carry_filtered, and the SQL oracle's collision model) derives
    buckets from this exact construction, so their buckets are
    bit-identical."""
    chunk = sig_hex.str.slice(band * chars_per_band,
                              (band + 1) * chars_per_band)
    return pd.util.hash_pandas_object(
        str(band) + ":" + chunk, index=False).astype("int64").abs()


def _lsh_pairs_carry(sf_dir: str, num_perm: int, bands: int,
                     rows_per_band: int, threshold: float, nparts: int,
                     shingle_k: int, max_bucket: int):
    """The ``verify="carry"`` plan of ``minhash_lsh_pairs``: band rows
    ship the binary signature, the estimate runs inside the bucket
    partition, and only verified pairs take the final pair-keyed dedup
    exchange. Band keys are hashed from the hex form so the two plans
    produce bit-identical buckets (pinned in tests/test_ops.py)."""
    a, b = _perm_params(num_perm)
    chars_per_band = 16 * rows_per_band
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def to_band_rows(df: pd.DataFrame) -> pd.DataFrame:
        raw = [_minhash(_shingle_hashes(t, shingle_k), a, b)
               .astype(">u8").tobytes() for t in df["text"]]
        sig_hex = pd.Series([r.hex() for r in raw])
        doc_ids = df["doc_id"].astype("int64").reset_index(drop=True)
        frames = []
        for band in range(bands):
            key = _band_keys(sig_hex, band, chars_per_band)
            frames.append(pd.DataFrame({"doc_id": doc_ids, "sig": raw,
                                        "bucket": key}))
        out = pd.concat(frames, ignore_index=True)
        out["part"] = (out["bucket"] % nparts).astype("int32")
        return out

    verified = (ds.map_batches(to_band_rows, batch_format="pandas")
                .groupby("part").map_groups(
                    _lsh_verify_bucket_fn(num_perm, threshold,
                                          max_bucket),
                    batch_format="pandas"))
    return _lsh_pair_dedup(verified, nparts)


def _lsh_verify_bucket_fn(num_perm: int, threshold: float,
                          max_bucket: int):
    """In-partition estimated-Jaccard verify over carried signatures
    (shared by the carry and carry_filtered plans)."""

    def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # singleton buckets (the vast majority) can't produce pairs
        df = df[df.duplicated("bucket", keep=False)]
        frames = []
        for _, g in df.groupby("bucket", sort=False):
            g = g.drop_duplicates("doc_id").sort_values("doc_id")
            if len(g) < 2:
                continue
            if len(g) > max_bucket:  # pathological bucket guard
                g = g.head(max_bucket)
            ids = g["doc_id"].to_numpy()
            S = np.frombuffer(b"".join(g["sig"]), dtype=">u8") \
                .reshape(len(g), num_perm)
            est = (S[:, None, :] == S[None, :, :]).mean(axis=2)
            ii, jj = np.where(np.triu(est >= threshold, k=1))
            frames.append(pd.DataFrame({
                "doc_id_a": pd.Series(ids[ii], dtype="int64"),
                "doc_id_b": pd.Series(ids[jj], dtype="int64"),
                "jaccard_est": est[ii, jj].astype("float64"),
            }))
        if not frames:
            return pd.DataFrame({"doc_id_a": pd.Series(dtype="int64"),
                                 "doc_id_b": pd.Series(dtype="int64"),
                                 "jaccard_est": pd.Series(dtype="float64")})
        # same pair found by several bands within this partition
        return pd.concat(frames, ignore_index=True).drop_duplicates(
            subset=["doc_id_a", "doc_id_b"])

    return verify_bucket


def _lsh_pair_dedup(verified, nparts: int):
    """Cross-partition pair dedup (same pair surfacing from bands that
    hashed to different partitions): co-locate duplicates by hashing
    the pair."""

    def pair_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(subset=["doc_id_a", "doc_id_b"])
        pk = pd.util.hash_pandas_object(df[["doc_id_a", "doc_id_b"]],
                                        index=False)
        return df.assign(part=(pk % nparts).astype("int32"))

    return (verified.map_batches(pair_part, batch_format="pandas")
            .groupby("part").map_groups(
                lambda df: df.drop_duplicates(
                    subset=["doc_id_a", "doc_id_b"])
                [["doc_id_a", "doc_id_b", "jaccard_est"]],
                batch_format="pandas"))


def _lsh_pairs_carry_filtered(sf_dir: str, num_perm: int, bands: int,
                              rows_per_band: int, threshold: float,
                              nparts: int, shingle_k: int,
                              max_bucket: int,
                              hot_cap: int = 2_000_000):
    """The ``verify="carry_filtered"`` plan: the carry plan behind a
    SINGLETON-BUCKET PRE-FILTER. The carry plan ships 8·num_perm B of
    signature per (doc, band) row, yet the vast majority of LSH
    buckets are singletons whose rows are dropped on arrival (measured
    sf0.1 @ 0.5-regime: 8.6% of band rows live in non-singleton
    buckets — 41 MB of carried signature shrinks to 3.5 MB). So:

    1. signatures compute ONCE into a materialized (doc_id, sig)
       table (one plasma crossing, no shuffle);
    2. pass 1 ships ONLY 8-byte band keys (per-batch ``value_counts``
       partials → bucket co-group) and collects the non-singleton
       bucket set — anomaly-sized on real corpora; if it exceeds
       ``hot_cap`` (an extremely dup-heavy corpus, where filtering
       would not pay anyway) the plan FALLS BACK to ``verify="join"``;
    3. pass 2 re-derives band keys from the signature table (hex
       slicing, no re-minhashing) and carries signatures only for
       rows whose bucket is in the broadcast hot set (ray.put once,
       per-worker cache) into the same verify/dedup exchanges as the
       carry plan.

    Output is bit-identical to carry/join: singleton rows can never
    form a pair, so dropping them pre-shuffle changes bytes, not
    answers (pinned in tests/test_ops.py)."""
    import ray

    from .traindata import _bcast_get

    a, b = _perm_params(num_perm)
    chars_per_band = 16 * rows_per_band
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def to_sig(df: pd.DataFrame) -> pd.DataFrame:
        raw = [_minhash(_shingle_hashes(t, shingle_k), a, b)
               .astype(">u8").tobytes() for t in df["text"]]
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64").reset_index(drop=True),
            "sig": raw})

    sigs = ds.map_batches(to_sig, batch_format="pandas").materialize()

    def key_partials(df: pd.DataFrame) -> pd.DataFrame:
        sig_hex = pd.Series([r.hex() for r in df["sig"]])
        keys = pd.concat(
            [_band_keys(sig_hex, band, chars_per_band)
             for band in range(bands)], ignore_index=True)
        vc = keys.value_counts()
        out = pd.DataFrame({
            "bucket": pd.Series(vc.index, dtype="int64").to_numpy(),
            "cnt": vc.to_numpy().astype("int64")})
        out["part"] = (out["bucket"] % nparts).astype("int32")
        return out

    def hot_in_part(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby("bucket")["cnt"].sum()
        hot = sizes[sizes >= 2]
        return pd.DataFrame({"bucket": pd.Series(hot.index,
                                                 dtype="int64")})

    hot = (sigs.map_batches(key_partials, batch_format="pandas")
           .groupby("part").map_groups(hot_in_part,
                                       batch_format="pandas")
           .to_pandas())
    if len(hot) > hot_cap:
        return minhash_lsh_pairs(
            sf_dir, num_perm=num_perm, bands=bands,
            threshold=threshold, num_partitions=nparts,
            shingle_k=shingle_k, max_bucket=max_bucket, verify="join")
    hot_ref = ray.put(frozenset(int(x) for x in hot["bucket"]))

    def to_hot_band_rows(df: pd.DataFrame) -> pd.DataFrame:
        hot_set = _bcast_get(hot_ref)
        sig_hex = pd.Series([r.hex() for r in df["sig"]])
        doc_ids = df["doc_id"].astype("int64").reset_index(drop=True)
        raw = df["sig"].reset_index(drop=True)
        frames = []
        for band in range(bands):
            key = _band_keys(sig_hex, band, chars_per_band)
            m = key.isin(hot_set).to_numpy()
            if not m.any():
                continue
            frames.append(pd.DataFrame({"doc_id": doc_ids[m],
                                        "sig": raw[m],
                                        "bucket": key[m]}))
        if not frames:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype="int64"),
                "sig": pd.Series(dtype="object"),
                "bucket": pd.Series(dtype="int64"),
                "part": pd.Series(dtype="int32")})
        out = pd.concat(frames, ignore_index=True)
        out["part"] = (out["bucket"] % nparts).astype("int32")
        return out

    verified = (sigs.map_batches(to_hot_band_rows,
                                 batch_format="pandas")
                .groupby("part").map_groups(
                    _lsh_verify_bucket_fn(num_perm, threshold,
                                          max_bucket),
                    batch_format="pandas"))
    return _lsh_pair_dedup(verified, nparts)


def embedding_near_dup_lsh(sf_dir: str, threshold: float = 0.4,
                           num_planes: int = 4, num_bands: int = 24,
                           num_partitions: Optional[int] = None,
                           max_bucket: int = 4000, seed: int = 7):
    """(vec_id_a, vec_id_b) cosine >= threshold pairs via random-hyperplane
    LSH — the scale path for 10^9+ vectors where the exact block-grid
    (``embedding_near_dup``) is infeasible.

    Shape: each vector gets ``num_bands`` bucket keys (sign-bit signature
    of ``num_planes`` hyperplanes per band, planes re-derived from the
    seed inside every task — nothing is shipped); buckets are coarsened
    into hash partitions (one Ray group per partition, never per bucket);
    candidate pairs are verified with EXACT cosine inside the partition,
    so precision is 1.0 and only recall is approximate; the cross-band
    pair dedup is a bucketed drop-duplicates keyed on the pair itself.

    Parameter regime: per-pair recall is 1-(1-p^b)^L with p =
    1-acos(cos)/pi. The defaults (b=4, L=24) target this corpus's low
    similarity band (cos 0.4 → recall ≈ 0.98). Production near-dup at
    cos >= 0.85 wants b=16, L=8: fewer replicas, sharper buckets, and
    bucket occupancy ~N/2^16 per band instead of N/2^4.
    """
    import ray
    import ray.data

    if num_partitions is None:
        num_partitions = max(4, int(ray.cluster_resources().get("CPU", 8)))
    nparts = num_partitions
    b, L = num_planes, num_bands

    ds = _bread("%s/embeddings.parquet" % sf_dir,
                               columns=["vec_id", "embedding"])

    def to_buckets(df: pd.DataFrame) -> pd.DataFrame:
        M = np.array(df["embedding"].tolist(), dtype=np.float64)
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        planes = np.random.RandomState(seed).randn(M.shape[1], b * L)
        bits = (M @ planes) > 0  # (n, b*L)
        weights = (1 << np.arange(b)).astype(np.int64)
        frames = []
        for band in range(L):
            key = bits[:, band * b:(band + 1) * b] @ weights  # (n,)
            bucket = (np.int64(band) << np.int64(32)) | key.astype(np.int64)
            frames.append(pd.DataFrame({
                "vec_id": df["vec_id"].astype("int64"),
                "embedding": df["embedding"],
                "bucket": bucket,
            }))
        out = pd.concat(frames, ignore_index=True)
        out["part"] = (out["bucket"] % nparts).astype("int32")
        return out

    def verify_part(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in df.groupby("bucket", sort=False):
            if len(g) < 2:
                continue
            if len(g) > max_bucket:  # pathological bucket guard
                g = g.nsmallest(max_bucket, "vec_id")
            ids = g["vec_id"].to_numpy()
            M = np.array(g["embedding"].tolist(), dtype=np.float64)
            M = M / np.linalg.norm(M, axis=1, keepdims=True)
            sims = M @ M.T
            ii, jj = np.where(np.triu(sims >= threshold, k=1))
            a, bb = ids[ii], ids[jj]
            swap = a > bb
            out_a.append(np.where(swap, bb, a))
            out_b.append(np.where(swap, a, bb))
        if out_a:
            a = np.concatenate(out_a)
            bb = np.concatenate(out_b)
        else:
            a = bb = np.array([], dtype=np.int64)
        out = pd.DataFrame({"vec_id_a": pd.Series(a, dtype="int64"),
                            "vec_id_b": pd.Series(bb, dtype="int64")})
        return out.drop_duplicates()

    cands = (ds.map_batches(to_buckets, batch_format="pandas")
             .groupby("part").map_groups(verify_part, batch_format="pandas"))

    # cross-band global dedup: co-locate duplicates of a pair by hashing
    # the pair itself, drop inside the partition
    def pair_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        pk = pd.util.hash_pandas_object(df[["vec_id_a", "vec_id_b"]],
                                        index=False)
        return df.assign(part=(pk % nparts).astype("int32"))

    return (cands.map_batches(pair_part, batch_format="pandas")
            .groupby("part").map_groups(
                lambda df: df.drop_duplicates()[["vec_id_a", "vec_id_b"]],
                batch_format="pandas"))


def near_dup_dedup(sf_dir: str, threshold: float = 0.8,
                   num_partitions: Optional[int] = None,
                   use_lsh: bool = False):
    """Survivor doc_ids after near-duplicate REMOVAL — the corpus-level
    dedup a training-data pipeline actually runs: similar pairs
    (token-set Jaccard >= threshold, ``jaccard_pairs`` semantics) are
    clustered into connected components, and only the minimum doc_id of
    each cluster survives.

    Scale shape: pairs come from the blocked pairwise stage, clustering
    is the distributed hash-to-min union-find (components.py — one
    co-grouped shuffle per round, O(log n) rounds), and the final
    anti-join of the removal set against the corpus is a bucketed
    co-group (never a driver-side set, never Dataset.join).
    ``use_lsh=True`` swaps the quadratic-within-block exact pair stage
    for ``minhash_lsh_pairs`` (token-set signatures, estimated Jaccard)
    — the 10^9+-doc path; clustering and anti-join are unchanged.
    """
    from .components import connected_components

    if num_partitions is None:
        import ray

        num_partitions = max(4, int(ray.cluster_resources().get("CPU", 8)))
    nparts = num_partitions

    docs = _read_documents(sf_dir, columns=["doc_id"])

    if use_lsh:
        # the 10^9-doc path: sub-quadratic candidate generation; estimated
        # Jaccard >= threshold stands in for the exact verify
        pairs = minhash_lsh_pairs(sf_dir, threshold=threshold,
                                  num_partitions=nparts, shingle_k=1)
    else:
        pairs = jaccard_pairs(sf_dir, threshold, num_partitions=nparts)
    edges = pairs.map_batches(
        lambda df: pd.DataFrame({"a": df["doc_id_a"].astype("int64"),
                                 "b": df["doc_id_b"].astype("int64")}),
        batch_format="pandas").materialize()
    if edges.count() == 0:  # no near-dups anywhere → everything survives
        return docs
    comp = connected_components(edges, num_partitions=nparts)
    # removed = every clustered doc that is not its cluster's minimum
    removed = comp.map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df.loc[df["node"] != df["component"],
                              "node"].astype("int64")}),
        batch_format="pandas")

    def tag(flag: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            d = df["doc_id"].astype("int64")
            return pd.DataFrame({
                "doc_id": d,
                "is_removed": np.int8(flag),
                "bucket": (pd.util.hash_pandas_object(d, index=False)
                           % nparts).astype("int32"),
            })
        return fn

    u = docs.map_batches(tag(0), batch_format="pandas").union(
        removed.map_batches(tag(1), batch_format="pandas"))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        gone = set(df.loc[df["is_removed"] == 1, "doc_id"].tolist())
        left = df.loc[df["is_removed"] == 0, "doc_id"]
        return pd.DataFrame({"doc_id": left[~left.isin(gone)]
                             .astype("int64")})

    return u.groupby("bucket").map_groups(keep, batch_format="pandas")


def _simhash_u64(texts) -> np.ndarray:
    """uint64 SimHash per text — per-bit majority vote over md5 token
    hashes (textops.token_hash64, so DuckDB reproduces every bit).
    Shared by ``simhash`` (hex form) and ``simhash_pairs`` (band join)."""
    from .textops import token_hash64

    out = np.empty(len(texts), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, text in enumerate(texts):
        hashes = np.array([token_hash64(t) for t in text.split(" ")],
                          dtype=np.uint64)
        # vectorized vote per bit: +1 for a set bit, -1 otherwise
        B = ((hashes[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
        votes = (2 * B - 1).sum(axis=0)
        val = np.uint64(0)
        set_bits = np.where(votes > 0)[0].astype(np.uint64)
        for b in set_bits:
            val |= np.uint64(1) << b
        out[i] = val
    return out


def simhash(sf_dir: str):
    """(doc_id, simhash hex string) — 64-bit SimHash over md5 token
    hashes (shared with textops.token_hash64 so DuckDB can reproduce the
    value bit-for-bit — full oracle check, not just a smoke test)."""
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        vals = _simhash_u64(df["text"].tolist())
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "simhash": ["%016x" % int(v) for v in vals]})

    return ds.map_batches(fn, batch_format="pandas")


def embedding_near_dup(sf_dir: str, threshold: float = 0.4,
                       num_blocks: Optional[int] = None):
    """(vec_id_a, vec_id_b) pairs with cosine >= threshold — EXACT, via a
    block-grid all-pairs join.

    Each vector belongs to block ``g = vec_id % B``; every
    unordered block pair (g, h) is one grid cell, and a vector is
    replicated to the B cells it participates in. One Ray group per cell
    computes the cross-block (or within-block) pairwise cosine, so
    per-task memory is O(2N/B · d) — no actor ever loads the full
    matrix — and shuffle volume is O(N · B). Size B to the cluster
    (cells ≈ 2× cores). For 10^9+ vectors, where exact all-pairs is
    infeasible at any B, route through an LSH/IVF candidate stage
    (``knn_ivf``'s quantizer) and accept bounded recall.
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

    def pairs_in_cell(df: pd.DataFrame) -> pd.DataFrame:
        cell = int(df["cell"].iloc[0])
        lo, hi = divmod(cell, B)
        ids = df["vec_id"].to_numpy()
        M = np.array(df["embedding"].tolist(), dtype=np.float64)
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        gs = df["g"].to_numpy()
        if lo == hi:
            sims = M @ M.T
            ii, jj = np.where(np.triu(sims >= threshold, k=1))
            a, b = ids[ii], ids[jj]
        else:
            left = gs == lo
            A, Bm = M[left], M[~left]
            aid, bid = ids[left], ids[~left]
            if len(aid) == 0 or len(bid) == 0:
                a = b = np.array([], dtype=np.int64)
            else:
                sims = A @ Bm.T
                ii, jj = np.where(sims >= threshold)
                a, b = aid[ii], bid[jj]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        keep = a2 != b2
        return pd.DataFrame({"vec_id_a": pd.Series(a2[keep], dtype="int64"),
                             "vec_id_b": pd.Series(b2[keep], dtype="int64")})

    return (ds.map_batches(to_cells, batch_format="pandas")
            .groupby("cell").map_groups(pairs_in_cell, batch_format="pandas"))


def semantic_dedup(sf_dir: str, threshold: float = 0.4, nlist: int = 64,
                   chunk: int = 4096):
    """(vec_id, cluster) survivors of SemDeDup-style semantic dedup
    (Abbas et al. 2023, arXiv:2303.09540): cluster every embedding with
    the trained spherical-k-means quantizer (same assignment rule as
    ``simsearch.kmeans_clusters`` — raw dot product argmax, ties to the
    lowest centroid id), then WITHIN each cluster drop every vector that
    has an earlier (lower vec_id) cluster-mate with cosine similarity
    >= ``threshold``. "Earlier-mate" is the deterministic, SQL-mirrorable
    form of the paper's keep-one-per-duplicate-group rule.

    Scale shape: the quantizer trains once on a bounded driver-side
    sample (O(sample·d), independent of table size) and broadcasts via
    closure; assignment is one vectorized map pass; the only shuffle is
    the single cluster exchange — COARSENED to ``hash(cluster) %
    nparts`` Ray groups (never one Ray group per cluster key: the
    published contract is nlist ~10^5 at billions of vectors, exactly
    the high-cardinality ``map_groups`` pathology), with the true
    per-cluster grouping in pandas inside the partition. Per-cluster
    work is O(n_c²·d) compute by the algorithm's definition, but the
    similarity matrix is built in ``chunk`` -column blocks (O(n_c·chunk)
    memory, never the dense n_c² matrix — 20 GB at n_c = 50k).
    """
    import ray
    import ray.data

    from .simsearch import train_centroids

    C = train_centroids(sf_dir, nlist)
    nparts = max(4, int(ray.cluster_resources().get("CPU", 8)))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        M = np.array(df["embedding"].to_list(), dtype=np.float64)
        cl = np.argmax(M @ C.T, axis=1).astype("int64")
        return pd.DataFrame({
            "vec_id": df["vec_id"].astype("int64"),
            "embedding": df["embedding"],
            "cluster": cl,
            "bucket": (cl % nparts).astype("int32"),
        })

    def prune_cluster(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("vec_id").reset_index(drop=True)
        M = np.array(df["embedding"].to_list(), dtype=np.float64)
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        n = len(M)
        # dup[j] iff any earlier row i<j has cos(i, j) >= threshold;
        # "earlier" means ALL earlier rows, kept or dropped (SemDeDup
        # keeps one representative per duplicate chain). Column-chunked:
        # each block compares rows [0, e) against columns [s, e).
        dup = np.zeros(n, dtype=bool)
        for s in range(0, n, chunk):
            e = min(n, s + chunk)
            sims = M[:e] @ M[s:e].T
            earlier = (np.arange(e)[:, None]
                       < np.arange(s, e)[None, :])
            dup[s:e] = ((sims >= threshold) & earlier).any(axis=0)
        keep = df.loc[~dup]
        return pd.DataFrame({"vec_id": keep["vec_id"].astype("int64"),
                             "cluster": keep["cluster"].astype("int64")})

    def prune_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = [prune_cluster(g) for _, g in df.groupby("cluster")]
        if not outs:
            return pd.DataFrame({
                "vec_id": pd.Series([], dtype="int64"),
                "cluster": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    ds = _bread("%s/embeddings.parquet" % sf_dir,
                               columns=["vec_id", "embedding"])
    return (ds.map_batches(assign, batch_format="pandas")
            .groupby("bucket").map_groups(prune_bucket,
                                          batch_format="pandas"))


def winnow_fingerprints(sf_dir: str, k: int = 4, w: int = 4):
    """(doc_id, pos, fp) — winnowing fingerprints (Schleimer, Wilkerson
    & Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD 2003 — the MOSS algorithm): hash every ``k``-token k-gram,
    slide a window of ``w`` consecutive hashes, and select the RIGHTMOST
    minimal hash in each window; the distinct selected (position, hash)
    pairs are the document's fingerprint. Winnowing guarantees any
    shared substring of ≥ w+k-1 tokens yields a shared fingerprint,
    with density ~2/(w+1) — the position-robust sketch the
    fingerprint/simhash family lacks (both break under token insertion).

    Scale shape: map-only, embarrassingly parallel (per-doc numpy
    sliding-window argmin over md5-u64 k-gram hashes, rightmost-tie via
    the reversed-argmin trick); no shuffle. Docs shorter than ``k``
    tokens emit nothing; docs with fewer than ``w`` k-grams form a
    single window. The SQL oracle replays the identical hash
    (collision-faithful ('0x'||substr(md5,1,16))::UBIGINT), window
    extent, and max-position tie rule.
    """
    import hashlib

    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def fps(df: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_pos, out_h = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = text.split(" ")
            t = len(toks) - k + 1
            if t <= 0:
                continue
            hs = np.array(
                [int(hashlib.md5(" ".join(toks[i:i + k]).encode("utf-8"))
                     .hexdigest()[:16], 16) for i in range(t)],
                dtype=np.uint64)
            if t <= w:
                j = t - 1 - int(np.argmin(hs[::-1]))
                sel = {(j, int(hs[j]))}
            else:
                sw = np.lib.stride_tricks.sliding_window_view(hs, w)
                # argmin picks the FIRST minimum; reversing each window
                # makes that the rightmost one
                jrel = w - 1 - sw[:, ::-1].argmin(axis=1)
                pos = np.arange(t - w + 1) + jrel
                sel = set(zip(pos.tolist(), hs[pos].tolist()))
            for p, h in sorted(sel):
                out_doc.append(doc_id)
                out_pos.append(p)
                out_h.append(h)
        return pd.DataFrame({
            "doc_id": pd.Series(out_doc, dtype="int64"),
            "pos": pd.Series(out_pos, dtype="int64"),
            "fp": pd.Series(out_h, dtype="uint64"),
        })

    return ds.map_batches(fps, batch_format="pandas")


def jaccard_pairs_sim(sf_dir: str, threshold: float = 0.8,
                      num_partitions: Optional[int] = None,
                      q: int = 1 << 20):
    """(doc_id_a, doc_id_b, sim_q) — ``jaccard_pairs`` WITH the exact
    similarity attached, floor-quantized from pure integers
    (sim_q = (q·|A∩B|) // |A∪B| — no float anywhere), which is what a
    WEIGHTED near-dup graph needs (threshold sweeps, weighted
    clustering, MST-style diagnostics) and what makes the value
    bit-exact against SQL.

    Same scale shape as ``jaccard_pairs``: first-token blocks coarsened
    into hash partitions, exact O(n²) verify per block (route
    hyper-common first tokens through the LSH-escalated variant when
    they appear; this op keeps the exact path because the weighted
    graph's edge set must equal the blocked ground truth).
    """
    if num_partitions is None:
        import ray

        num_partitions = max(4, int(ray.cluster_resources().get("CPU", 8)))
    nparts = num_partitions
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def add_block(df: pd.DataFrame) -> pd.DataFrame:
        block = df["text"].str.split(" ").str[0]
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "text": df["text"],
            "block": block,
            "part": (pd.util.hash_pandas_object(block, index=False)
                     % nparts).astype("int32"),
        })

    def verify_part(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_s = [], [], []
        for _, g in df.groupby("block", sort=False):
            ids = g["doc_id"].tolist()
            sets = [set(t.split(" ")) for t in g["text"]]
            for i, j in itertools.combinations(range(len(ids)), 2):
                inter = len(sets[i] & sets[j])
                union = len(sets[i]) + len(sets[j]) - inter
                if union and inter / union >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    out_a.append(a)
                    out_b.append(b)
                    out_s.append((q * inter) // union)
        return pd.DataFrame({"doc_id_a": pd.Series(out_a, dtype="int64"),
                             "doc_id_b": pd.Series(out_b, dtype="int64"),
                             "sim_q": pd.Series(out_s, dtype="int64")})

    return (ds.map_batches(add_block, batch_format="pandas")
            .groupby("part").map_groups(verify_part,
                                        batch_format="pandas"))


def fingerprint_overlap_pairs(sf_dir: str, k: int = 4, w: int = 4,
                              min_shared: int = 2, max_df: int = 32,
                              num_partitions: Optional[int] = None):
    """(doc_id_a, doc_id_b, n_shared) — the MOSS similarity REPORT
    (Schleimer et al. 2003 §4): document pairs sharing at least
    ``min_shared`` distinct winnowing fingerprints, with the shared
    count. Fingerprints present in more than ``max_df`` documents are
    dropped first — exactly MOSS's "too common = boilerplate/template"
    rule, and the bound that keeps the per-fingerprint pair expansion
    quadratic only in ``max_df``, never in corpus size.

    Scale shape: fingerprints are map-only (``winnow_fingerprints``);
    ONE hash(fp) co-group sees every holder of its fingerprints, so the
    document-frequency filter and the pair expansion (≤ max_df² rows
    per fingerprint) happen locally with a per-bucket pair-count
    combiner; a second hash(pair) exchange sums the counts and applies
    the ``min_shared`` filter. Shuffles carry fingerprint/pair rows
    only — never documents.
    """
    if num_partitions is None:
        import ray

        num_partitions = max(4, int(ray.cluster_resources().get("CPU", 8)))
    nparts = num_partitions
    fps = winnow_fingerprints(sf_dir, k=k, w=w)

    def distinct_fp(df: pd.DataFrame) -> pd.DataFrame:
        g = df[["doc_id", "fp"]].drop_duplicates()
        return g.assign(bucket=(pd.util.hash_pandas_object(
            g["fp"], index=False) % nparts).astype("int32"))

    def pairs_per_fp(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_n = [], [], []
        g = df[["doc_id", "fp"]].drop_duplicates()
        pair_counts: dict = {}
        for _, grp in g.groupby("fp", sort=False):
            docs = np.sort(grp["doc_id"].unique())
            if len(docs) < 2 or len(docs) > max_df:
                continue
            ii, jj = np.triu_indices(len(docs), k=1)
            for a, b in zip(docs[ii], docs[jj]):
                key = (int(a), int(b))
                pair_counts[key] = pair_counts.get(key, 0) + 1
        for (a, b), n in pair_counts.items():
            out_a.append(a); out_b.append(b); out_n.append(n)
        out = pd.DataFrame({"doc_id_a": pd.Series(out_a, dtype="int64"),
                            "doc_id_b": pd.Series(out_b, dtype="int64"),
                            "n_shared": pd.Series(out_n, dtype="int64")})
        out["bucket"] = ((pd.util.hash_pandas_object(out["doc_id_a"],
                                                     index=False)
                          * 31 + pd.util.hash_pandas_object(
                              out["doc_id_b"], index=False))
                         % nparts).astype("int32")
        return out

    def reduce_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["doc_id_a", "doc_id_b"], as_index=False)
             ["n_shared"].sum())
        g = g[g["n_shared"] >= min_shared]
        return g.astype("int64")

    return (fps.map_batches(distinct_fp, batch_format="pandas")
            .groupby("bucket").map_groups(pairs_per_fp,
                                          batch_format="pandas")
            .groupby("bucket").map_groups(reduce_pairs,
                                          batch_format="pandas"))


def dedup_normalized(sf_dir: str, num_partitions: Optional[int] = None):
    """(doc_id,) survivors of exact dedup on the CANONICALIZED text
    (``textops.normalize_text``: lowercase / punctuation strip /
    whitespace collapse) — the standard first dedup pass that catches
    the case/punctuation/spacing variants byte-exact dedup misses;
    keeper = min doc_id per normalized form.

    Scale shape: normalization + md5 are map-only; the exchange carries
    fixed-width (digest, doc_id) rows bucketed on hash(digest) — the
    dedup_exact shape on the normalized digest.
    """
    import hashlib

    import ray

    if num_partitions is None:
        num_partitions = max(4, int(ray.cluster_resources().get("CPU", 8)))
    nparts = num_partitions
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        s = (df["text"].str.lower()
             .str.replace(r"[^a-z0-9 ]", " ", regex=True)
             .str.replace(r" +", " ", regex=True)
             .str.strip())
        out = pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "h": [hashlib.md5(t.encode()).hexdigest() for t in s]})
        # per-batch combiner: one candidate per digest per batch
        out = out.groupby("h", as_index=False)["doc_id"].min()
        out["bucket"] = (pd.util.hash_pandas_object(out["h"], index=False)
                         % nparts).astype("int32")
        return out

    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("h", as_index=False)["doc_id"].min()
        return pd.DataFrame({"doc_id": g["doc_id"].astype("int64")})

    return (ds.map_batches(digest, batch_format="pandas")
            .groupby("bucket").map_groups(keep_min,
                                          batch_format="pandas"))


def _ed_le1(a: str, b: str) -> bool:
    """Unit-cost edit distance ≤ 1 (exact, mirrors levenshtein ≤ 1)."""
    la, lb = len(a), len(b)
    if a == b:
        return True
    if abs(la - lb) > 1:
        return False
    if la == lb:  # exactly one substitution allowed
        return sum(1 for x, y in zip(a, b) if x != y) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # one insertion: advance past the single mismatch
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def typo_pairs(sf_dir: str, num_partitions=None):
    """(name_a, name_b) — all pairs of customer names within edit
    distance 1: the fuzzy/entity-matching string-similarity JOIN, via
    SymSpell deletion-neighborhood blocking (Garbe) instead of the
    O(V²) cross product — two names within one edit ALWAYS share a
    member of {self} ∪ {one-char deletions}, so candidates come from
    ONE hash(variant) co-group and only candidates pay the exact
    verify.

    Scale shape: the vocabulary is dimension-sized (distinct-value
    combiner first); each name expands to len+1 variant rows (bounded
    by key length); pairs sharing several variants dedup globally in a
    second fixed-width hash(pair) exchange. The exact ≤1 check runs
    per CANDIDATE, not per pair of the cross product.
    """
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    ds = _bread("%s/customer.parquet" % sf_dir,
                               columns=["c_name"])

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        names = pd.Series(df["c_name"].unique()).astype(str)
        rows_v, rows_n = [], []
        for n in names:
            rows_v.append(n)
            rows_n.append(n)
            for i in range(len(n)):
                rows_v.append(n[:i] + n[i + 1:])
                rows_n.append(n)
        out = pd.DataFrame({"variant": rows_v, "name": rows_n})
        out["bucket"] = (pd.util.hash_pandas_object(out["variant"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["variant", "name"]].drop_duplicates()
        m = d.merge(d, on="variant")
        m = m[m["name_x"] < m["name_y"]]
        m = m[["name_x", "name_y"]].drop_duplicates()
        ok = [_ed_le1(a, b) for a, b in
              zip(m["name_x"], m["name_y"])]
        # dtype=bool is load-bearing: an empty `ok` otherwise builds an
        # object-dtype Series, which pandas treats as column-label
        # selection (not a mask) — a group whose candidates all fail
        # the verify then returns a columnless frame and name_x KeyErrors
        m = m[pd.Series(ok, index=m.index, dtype=bool)]
        h = pd.util.hash_pandas_object(m["name_x"] + "\x1f"
                                       + m["name_y"], index=False)
        return pd.DataFrame({"name_a": m["name_x"].astype(str),
                             "name_b": m["name_y"].astype(str),
                             "bucket2": (h % nparts).astype("int32")})

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df[["name_a", "name_b"]].drop_duplicates()
        return pd.DataFrame({"name_a": g["name_a"].astype(str),
                             "name_b": g["name_b"].astype(str)})

    return (ds.map_batches(variants, batch_format="pandas")
            .groupby("bucket").map_groups(candidates,
                                          batch_format="pandas")
            .groupby("bucket2").map_groups(dedup_pairs,
                                           batch_format="pandas"))


def _dl_le1(a: str, b: str) -> bool:
    """Unrestricted Damerau-Levenshtein <= 1: one insert/delete/
    substitute OR one adjacent transposition (at distance 1 the two DL
    variants coincide; matches DuckDB's damerau_levenshtein)."""
    if _ed_le1(a, b):
        return True
    if len(a) != len(b):
        return False
    diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    return (len(diff) == 2 and diff[1] == diff[0] + 1
            and a[diff[0]] == b[diff[1]] and a[diff[1]] == b[diff[0]])


def typo_pairs_dl(sf_dir: str, num_partitions=None):
    """(name_a, name_b, is_transposition) — the fuzzy-matching join at
    Damerau-Levenshtein <= 1: everything ``typo_pairs`` finds PLUS the
    adjacent-transposition typos plain edit distance misses (the most
    common human keystroke error — "teh"). ``is_transposition`` = 1 for
    pairs only DL catches (lev = 2). Same SymSpell deletion-
    neighborhood blocking: a transposed pair shares the variant that
    deletes either transposed character, so DL<=1 candidates always
    co-locate and only candidates pay the exact verify.

    Scale shape: identical to typo_pairs — distinct-name combiner,
    len+1 variant rows per name, one hash(variant) co-group + one
    fixed-width hash(pair) dedup exchange.
    """
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))
    ds = _bread("%s/customer.parquet" % sf_dir, columns=["c_name"])

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        names = pd.Series(df["c_name"].unique()).astype(str)
        rows_v, rows_n = [], []
        for n in names:
            rows_v.append(n)
            rows_n.append(n)
            for i in range(len(n)):
                rows_v.append(n[:i] + n[i + 1:])
                rows_n.append(n)
        out = pd.DataFrame({"variant": rows_v, "name": rows_n})
        out["bucket"] = (pd.util.hash_pandas_object(out["variant"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["variant", "name"]].drop_duplicates()
        m = d.merge(d, on="variant")
        m = m[m["name_x"] < m["name_y"]]
        m = m[["name_x", "name_y"]].drop_duplicates()
        ok = [_dl_le1(a, b) for a, b in zip(m["name_x"], m["name_y"])]
        m = m[pd.Series(ok, index=m.index, dtype=bool)]
        tr = [0 if _ed_le1(a, b) else 1
              for a, b in zip(m["name_x"], m["name_y"])]
        h = pd.util.hash_pandas_object(m["name_x"] + "\x1f"
                                       + m["name_y"], index=False)
        return pd.DataFrame({
            "name_a": m["name_x"].astype(str),
            "name_b": m["name_y"].astype(str),
            "is_transposition": pd.Series(tr, index=m.index,
                                          dtype="int64"),
            "bucket2": (h % nparts).astype("int32")})

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df[["name_a", "name_b",
                "is_transposition"]].drop_duplicates()
        return pd.DataFrame({
            "name_a": g["name_a"].astype(str),
            "name_b": g["name_b"].astype(str),
            "is_transposition": g["is_transposition"].astype("int64")})

    return (ds.map_batches(variants, batch_format="pandas")
            .groupby("bucket").map_groups(candidates,
                                          batch_format="pandas")
            .groupby("bucket2").map_groups(dedup_pairs,
                                           batch_format="pandas"))


def dedup_keep_best(sf_dir: str, num_partitions=None):
    """(doc_id) — exact dedup on the canonicalized text with a QUALITY
    survivorship policy: within a duplicate group keep the LONGEST
    original document (ties → min doc_id), not the arbitrary min-id —
    the survivorship rule real curation pipelines need (keep the
    richest capture of a page, not the first-crawled one).

    Same scale shape as dedup_normalized (map-side digest + per-batch
    argmax combiner, one fixed-width hash(digest) exchange); only the
    survivor rule differs: argmax (n_chars, −doc_id) merges per batch
    and again in the bucket reduce.
    """
    import hashlib

    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    ds = _bread("%s/documents.parquet" % sf_dir,
                               columns=["doc_id", "text", "n_chars"])

    import re as _re

    drop = _re.compile(r"[^a-z0-9 ]")
    squash = _re.compile(r" +")

    def best(df: pd.DataFrame) -> pd.DataFrame:
        # argmax (n_chars DESC, doc_id ASC) per digest, vectorized
        df = df.sort_values(["digest", "n_chars", "doc_id"],
                            ascending=[True, False, True])
        return df.groupby("digest", as_index=False).head(1)

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        norm = (df["text"].str.lower()
                .str.replace(drop, " ", regex=True)
                .str.replace(squash, " ", regex=True)
                .str.strip(" "))
        t = pd.DataFrame({
            "digest": [hashlib.md5(s.encode()).hexdigest()[:16]
                       for s in norm],
            "doc_id": df["doc_id"].astype("int64"),
            "n_chars": df["n_chars"].astype("int64")})
        g = best(t)
        g["bucket"] = (pd.util.hash_pandas_object(g["digest"],
                                                  index=False)
                       % nparts).astype("int32")
        return g

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = best(df)
        return pd.DataFrame({"doc_id": g["doc_id"].astype("int64")})

    return (ds.map_batches(combiner, batch_format="pandas")
            .groupby("bucket").map_groups(reduce,
                                          batch_format="pandas"))


def dup_group_spectrum(sf_dir: str, num_partitions=None):
    """(group_size, n_groups) — the duplicate-group size spectrum over
    the canonicalized text form (how much of the corpus is singletons
    vs k-way duplicates — the first diagnostic before choosing a dedup
    budget). Count-of-counts, the freq_spectrum shape on digest groups.

    Scale shape: map-side digest + per-batch (digest, n) combiner, one
    hash(digest) exchange finishes group sizes and emits a per-bucket
    size histogram, so the driver folds an output-sized spectrum.
    """
    import hashlib
    import re as _re

    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    ds = _bread("%s/documents.parquet" % sf_dir,
                               columns=["text"])
    drop = _re.compile(r"[^a-z0-9 ]")
    squash = _re.compile(r" +")

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        norm = (df["text"].str.lower()
                .str.replace(drop, " ", regex=True)
                .str.replace(squash, " ", regex=True)
                .str.strip(" "))
        t = pd.Series([hashlib.md5(s.encode()).hexdigest()[:16]
                       for s in norm])
        g = t.value_counts()
        out = pd.DataFrame({"digest": g.index, "n": g.to_numpy()})
        out["bucket"] = (pd.util.hash_pandas_object(out["digest"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    def spectrum(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby("digest")["n"].sum()
        h = sizes.value_counts()
        return pd.DataFrame({"group_size": h.index.astype("int64"),
                             "n_groups": h.to_numpy("int64")})

    t = (ds.map_batches(combiner, batch_format="pandas")
         .groupby("bucket").map_groups(spectrum, batch_format="pandas")
         .to_pandas().groupby("group_size", as_index=False)
         ["n_groups"].sum().sort_values("group_size"))
    return t.astype({"group_size": "int64", "n_groups": "int64"}) \
        .reset_index(drop=True)


def containment_pairs(sf_dir: str, threshold: float = 0.8,
                      num_partitions: Optional[int] = None,
                      q: int = 1 << 20):
    """(doc_id_src, doc_id_dst, cont_q) — ASYMMETRIC near-dup: ordered
    pairs where src's token set is ≥``threshold`` CONTAINED in dst
    (containment = |A∩B|/|A|, Broder's other resemblance measure —
    what quote/excerpt/boilerplate-subset detection needs when Jaccard
    misses a small doc swallowed by a big one). cont_q floor-quantizes
    from pure integers; self-pairs excluded; both directions emitted
    when both qualify.

    Same blocking scale shape as ``jaccard_pairs_sim`` (first-token
    blocks coarsened into hash partitions, exact verify per block) —
    with the same stated blocking caveat and LSH escape hatch.
    """
    import itertools

    if num_partitions is None:
        import ray

        num_partitions = max(4, int(ray.cluster_resources()
                                    .get("CPU", 8)))
    nparts = num_partitions
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def add_block(df: pd.DataFrame) -> pd.DataFrame:
        block = df["text"].str.split(" ").str[0]
        return pd.DataFrame({
            "doc_id": df["doc_id"], "text": df["text"],
            "block": block,
            "part": (pd.util.hash_pandas_object(block, index=False)
                     % nparts).astype("int32")})

    def verify_part(df: pd.DataFrame) -> pd.DataFrame:
        out_s, out_d, out_c = [], [], []
        for _, g in df.groupby("block", sort=False):
            ids = g["doc_id"].tolist()
            sets = [set(t.split(" ")) for t in g["text"]]
            for i, j in itertools.combinations(range(len(ids)), 2):
                inter = len(sets[i] & sets[j])
                for a, b in ((i, j), (j, i)):
                    la = len(sets[a])
                    if la and inter / la >= threshold:
                        out_s.append(ids[a])
                        out_d.append(ids[b])
                        out_c.append((q * inter) // la)
        return pd.DataFrame({
            "doc_id_src": pd.Series(out_s, dtype="int64"),
            "doc_id_dst": pd.Series(out_d, dtype="int64"),
            "cont_q": pd.Series(out_c, dtype="int64")})

    return (ds.map_batches(add_block, batch_format="pandas")
            .groupby("part").map_groups(verify_part,
                                        batch_format="pandas"))


def spatial_neighbor_pairs(sf_dir: str, radius: int = 16384,
                           num_partitions: Optional[int] = None):
    """(doc_a, doc_b, dist2) — the 2-D SPATIAL self-join: all point
    pairs within Euclidean distance ``radius``, over deterministic
    coordinates x = md5('x:'||doc_id) % 2^20 (same for y). The
    grid-cell bucketing pattern every geo/point-cloud join needs and
    Ray Data lacks natively: cell side == radius, each point
    replicated to its 3×3 cell neighborhood, and a pair is emitted at
    exactly ONE cell — the lexicographic min of the two home cells
    (both points are present there, since |Δcoord| ≤ r bounds the
    home cells to adjacent). No global dedup pass needed.

    Scale shape: one hash(cell) exchange of 9 fixed-width rows per
    point; per-cell work is O(points-in-cell²) with the verify
    vectorized across ALL cells of a bucket in one self-merge — cell
    side tracks the join radius, so occupancy (and the quadratic
    term) is set by data density, not corpus size. At 100 TB the
    only knob is the radius→cell ratio (sub-split hot cells the way
    jaccard_pairs coarsens blocks).
    """
    import ray

    from .traindata import _md5_u64

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))
    ds = _bread("%s/documents.parquet" % sf_dir, columns=["doc_id"])
    G = 1 << 20
    ncell = (G + radius - 1) // radius
    r2 = radius * radius

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy("int64")
        x = np.array([_md5_u64("x:%d" % d) % G for d in ids],
                     dtype="int64")
        y = np.array([_md5_u64("y:%d" % d) % G for d in ids],
                     dtype="int64")
        cx, cy = x // radius, y // radius
        home = cx * 4096 + cy
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nx_, ny_ = cx + dx, cy + dy
                ok = ((nx_ >= 0) & (nx_ < ncell)
                      & (ny_ >= 0) & (ny_ < ncell))
                outs.append(pd.DataFrame({
                    "cell": (nx_ * 4096 + ny_)[ok],
                    "doc_id": ids[ok], "x": x[ok], "y": y[ok],
                    "home": home[ok]}))
        out = pd.concat(outs, ignore_index=True)
        out["part"] = (out["cell"] % nparts).astype("int32")
        return out

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["cell", "doc_id", "x", "y", "home"]]
        m = d.merge(d, on="cell")
        m = m[(m["doc_id_x"] < m["doc_id_y"])
              & (np.minimum(m["home_x"], m["home_y"]) == m["cell"])]
        dx = m["x_x"].to_numpy("int64") - m["x_y"].to_numpy("int64")
        dy = m["y_x"].to_numpy("int64") - m["y_y"].to_numpy("int64")
        d2 = dx * dx + dy * dy
        m = m[pd.Series(d2 <= r2, index=m.index, dtype=bool)]
        d2 = d2[d2 <= r2]
        return pd.DataFrame({
            "doc_a": m["doc_id_x"].to_numpy("int64"),
            "doc_b": m["doc_id_y"].to_numpy("int64"),
            "dist2": d2.astype("int64")})

    return (ds.map_batches(replicate, batch_format="pandas")
            .groupby("part").map_groups(pairs, batch_format="pandas"))


def linkage_scores(sf_dir: str, num_partitions: Optional[int] = None):
    """(name_a, name_b, agree_nation, agree_segment, score_q6) —
    Fellegi–Sunter RECORD-LINKAGE scoring (the probabilistic ER layer
    every entity-resolution pipeline puts on top of blocking): for
    each typo_pairs candidate (edit distance ≤ 1 on customer name),
    score = Σ_fields ln(m/u) if the field agrees else ln((1−m)/(1−u)),
    with m = 19/20 a fixed prior and every u ESTIMATED FROM THE DATA
    exactly — u_f = Σ_v cnt_v² / N², the collision probability of two
    random records on field f, folded from a per-batch value-count
    combiner over the dimension-sized customer table. The name field
    agrees by construction (candidates), nation/segment are compared
    via a min-custkey attribute map. Each weight is ONE shared-libm
    ln over one IEEE division of exact sub-2⁵³ integers and the score
    a fixed-order 3-term sum (the psi_drift float-portability
    contract), so floor(10⁶·score) is bit-equal in DuckDB.

    Scale shape: u-statistics and the name→attribute map are
    dimension-sized driver folds (the nation/supplier-dim
    convention); scoring is one map-only pass over the candidate
    pairs with the map in closure. The pair stage itself is
    typo_pairs' SymSpell co-group.
    """
    import math

    import pyarrow.parquet as _ppq

    cust = _ppq.read_table(
        "%s/customer.parquet" % sf_dir,
        columns=["c_custkey", "c_name", "c_nationkey",
                 "c_mktsegment"]).to_pandas()
    n = len(cust)
    assert n * n < (1 << 53), "u-statistics must stay exact doubles"
    s_nat = int((cust.groupby("c_nationkey").size() ** 2).sum())
    s_seg = int((cust.groupby("c_mktsegment").size() ** 2).sum())
    s_name = int((cust.groupby("c_name").size() ** 2).sum())
    amap = (cust.sort_values("c_custkey")
            .drop_duplicates("c_name", keep="first")
            .set_index("c_name")[["c_nationkey", "c_mktsegment"]])
    nat = amap["c_nationkey"].to_dict()
    seg = amap["c_mktsegment"].to_dict()

    n2 = n * n
    w_name = math.log((19.0 * n * n) / (20.0 * s_name))

    def w_pair(s_f: int):
        wa = math.log((19.0 * n * n) / (20.0 * s_f))
        wd = math.log((1.0 * n * n) / (20.0 * (n2 - s_f)))
        return wa, wd

    wa_nat, wd_nat = w_pair(s_nat)
    wa_seg, wd_seg = w_pair(s_seg)

    pairs = typo_pairs(sf_dir, num_partitions=num_partitions)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        an = df["name_a"].map(nat).to_numpy()
        bn = df["name_b"].map(nat).to_numpy()
        asg = df["name_a"].map(seg).to_numpy()
        bsg = df["name_b"].map(seg).to_numpy()
        ag_n = (an == bn)
        ag_s = (asg == bsg)
        sc = [math.floor(1000000.0 * ((w_name
                                       + (wa_nat if gn else wd_nat))
                                      + (wa_seg if gs else wd_seg)))
              for gn, gs in zip(ag_n, ag_s)]
        return pd.DataFrame({
            "name_a": df["name_a"].astype(str),
            "name_b": df["name_b"].astype(str),
            "agree_nation": pd.Series(ag_n.astype("int64"),
                                      index=df.index),
            "agree_segment": pd.Series(ag_s.astype("int64"),
                                       index=df.index),
            "score_q6": pd.Series(sc, index=df.index, dtype="int64")})

    return pairs.map_batches(score, batch_format="pandas")


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over a uint64 array (numpy<2 lacks
    bitwise_count): byte view + 256-entry table, 8 adds per value."""
    if len(x) == 0:
        return np.zeros(0, dtype=np.int64)
    return _POP8[np.ascontiguousarray(x).view(np.uint8)
                 .reshape(-1, 8)].sum(axis=1).astype(np.int64)


def simhash_pairs(sf_dir: str, max_hamming: int = 3,
                  num_partitions: Optional[int] = None):
    """(doc_id_a, doc_id_b, hamming) — ALL unordered doc pairs whose
    64-bit SimHash signatures differ in at most ``max_hamming`` bits
    (Manku, Jain & Das Sarma, WWW 2007 — the production web-crawl
    near-dup detector). EXACT and COMPLETE, not approximate: the
    signature splits into max_hamming+1 = 4 contiguous 16-bit bands,
    and by pigeonhole two signatures within hamming <= 3 must agree on
    at least one whole band — so pairs sharing any band value are the
    candidate set and no qualifying pair can be missed; candidates are
    then verified exactly by popcount(xor).

    Scale shape: 4 fixed-width (band, value, signature) rows per doc
    into ONE hash(band,value) exchange; the verify is vectorized
    across all band cells of a bucket in a single self-merge, and each
    pair is emitted at exactly ONE cell — its minimal agreeing band,
    decidable locally from the two carried signatures (no dedup
    pass). Per-cell work is O(occupancy^2): at 10^9 docs a hot band
    value (boilerplate-dominated 0x0000) needs the Manku remedy —
    more, narrower bands for pigeonhole slack, then sub-shard a hot
    cell on signature bits outside its band.
    """
    import ray

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))
    nbands = max_hamming + 1
    width = 64 // nbands  # 16 for the default
    mask = np.uint64((1 << width) - 1)
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        sh = _simhash_u64(df["text"].tolist())
        ids = df["doc_id"].to_numpy("int64")
        outs = []
        for b in range(nbands):
            val = ((sh >> np.uint64(width * b)) & mask).astype("int64")
            outs.append(pd.DataFrame({
                # band index rides in the key's high bits so one merge
                # column keys the whole self-join
                "key": (np.int64(b) << np.int64(width)) | val,
                "doc_id": ids,
                "sh": sh.view(np.int64),  # bit-preserving signed view
            }))
        out = pd.concat(outs, ignore_index=True)
        out["part"] = (pd.util.hash_pandas_object(out["key"], index=False)
                       % nparts).astype("int32")
        return out

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["key", "doc_id", "sh"]]
        m = d.merge(d, on="key")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        empty = pd.DataFrame({
            "doc_id_a": pd.Series([], dtype="int64"),
            "doc_id_b": pd.Series([], dtype="int64"),
            "hamming": pd.Series([], dtype="int64")})
        if m.empty:
            return empty
        sa = m["sh_x"].to_numpy(np.int64).view(np.uint64)
        sb = m["sh_y"].to_numpy(np.int64).view(np.uint64)
        x = sa ^ sb
        ham = _popcount64(x)
        band = (m["key"].to_numpy(np.int64) >> width).astype(np.int64)
        agree = np.stack(
            [((x >> np.uint64(width * b)) & mask) == 0
             for b in range(nbands)], axis=1)
        # emit-once: only at the FIRST agreeing band (this row's band
        # agrees by construction, so argmax finds a real True)
        minband = np.argmax(agree, axis=1)
        keep = (ham <= max_hamming) & (minband == band)
        if not keep.any():
            return empty
        return pd.DataFrame({
            "doc_id_a": m["doc_id_x"].to_numpy("int64")[keep],
            "doc_id_b": m["doc_id_y"].to_numpy("int64")[keep],
            "hamming": ham[keep]})

    return (ds.map_batches(band_rows, batch_format="pandas")
            .groupby("part").map_groups(verify, batch_format="pandas"))


def ssjoin_prefix(sf_dir: str, tn: int = 4, td: int = 5,
                  num_partitions: Optional[int] = None, q: int = 1 << 20,
                  force_general: bool = False, force_banded: bool = False,
                  vocab_broadcast_limit: int = 5_000_000,
                  cell_target: int = 4096):
    """(doc_id_a, doc_id_b, sim_q) — ALL unordered doc pairs with
    token-set Jaccard >= tn/td, EXACT and COMPLETE: the
    prefix-filtering set-similarity join (Chaudhuri et al. ICDE 2006;
    Bayardo et al. "All-Pairs", WWW 2007). Unlike ``jaccard_pairs``
    (first-token blocking, misses cross-block pairs) and MinHash
    (approximate), this finds every qualifying pair: J(A,B) >= t
    implies |A∩B| >= t·|A|, so under any fixed global token order A
    and B must share a token inside each one's first
    |T| - ceil(t·|T|) + 1 tokens — the prefix. Candidates = pairs
    meeting in a prefix token; verify is exact integer
    td·|A∩B| >= tn·|A∪B|.

    Scale shape: one vocabulary-sized df aggregate (distinct-token
    combiner — the tfidf_keywords pass) fixes the global order
    rarest-first, shipped ONCE via ray.put; each doc then emits only
    ~(1−t)·|T|+1 prefix rows (its rarest tokens, so cells stay small
    where a frequency-blind order would flood hot tokens) carrying the
    sorted rank vector packed as bytes; ONE hash(token) exchange; each
    verified pair is emitted at exactly ONE cell — the minimal common
    PREFIX token, decidable locally from the two carried vectors (no
    dedup pass). At 10^9 docs the rank map exceeds one broadcast:
    above ``vocab_broadcast_limit`` distinct tokens (or under
    ``force_banded``) the BANDED path replaces the driver-side
    ``{token: rank}`` dict with a (df-band, token-hash-cell) bucketed
    derivation — the driver ever holds only per-band sizes (≤ ~4160
    rows) and per-cell counts (~vocab/``cell_target`` rows), ranks are
    assigned inside a cell-bucketed group pass, and each doc's rank
    vector is attached via two hash co-group exchanges instead of a
    broadcast. Any injective total order yields the same exact join
    (completeness holds per band-major order; verify is exact), so the
    banded path is pinned pair-identical to the dict path by test.
    """
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])
    return _ssjoin_prefix_ds(
        ds, tn=tn, td=td, num_partitions=num_partitions, q=q,
        force_general=force_general, force_banded=force_banded,
        vocab_broadcast_limit=vocab_broadcast_limit,
        cell_target=cell_target)


def _ssjoin_prefix_ds(ds, *, tn: int = 4, td: int = 5,
                      num_partitions: Optional[int] = None,
                      q: int = 1 << 20, force_general: bool = False,
                      force_banded: bool = False,
                      vocab_broadcast_limit: int = 5_000_000,
                      cell_target: int = 4096):
    """Core of ``ssjoin_prefix`` over any (doc_id, text) Dataset."""
    import ray

    from .traindata import _bcast_get

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    # pass A: global document frequency — per-batch distinct-doc token
    # counts, then a hash(token)-bucketed co-group sum (the combiner
    # pattern; Ray's native high-cardinality groupby is pathological)
    def local_df(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        d = pl.from_pandas(df[["doc_id", "text"]])
        vc = (d.with_columns(pl.col("text").str.split(" ").alias("t"))
              .drop("text").explode("t").unique(subset=["doc_id", "t"])
              .group_by("t").agg(pl.len().cast(pl.Int64).alias("n")))
        out = vc.rename({"t": "tok"}).to_pandas()
        out["part"] = (pd.util.hash_pandas_object(out["tok"], index=False)
                       % nparts).astype("int32")
        return out

    def fold_df(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"tok": pd.Series([], dtype="object"),
                                 "df": pd.Series([], dtype="int64")})
        g = df.groupby("tok", as_index=False)["n"].sum()
        return pd.DataFrame({"tok": g["tok"],
                             "df": g["n"].astype("int64")})

    tokdf = (ds.map_batches(local_df, batch_format="pandas")
             .groupby("part").map_groups(fold_df, batch_format="pandas")
             .materialize())
    vocab_n = tokdf.count()
    assert vocab_n < (1 << 31)

    if force_banded or vocab_n > vocab_broadcast_limit:
        return _ssjoin_banded(ds, tokdf, tn=tn, td=td, nparts=nparts,
                              q=q, cell_target=cell_target)

    dfreq = tokdf.to_pandas()
    order = sorted(zip(dfreq["df"].astype(int), dfreq["tok"]))
    rank_ref = ray.put({t: i for i, (_, t) in enumerate(order)})

    if len(order) <= 63 and not force_general:
        # BITSET fast path: the whole vocabulary fits one int64 mask
        # (rank == bit), so |A∩B|/|A∪B| are popcounts of mask ANDs and
        # the emit-once token is the lowest set bit of the ANDed
        # prefix masks — the verify is fully vectorized, no per-pair
        # set intersection. Answer pinned identical to the general
        # path (tests). Real corpora land here for char-level /
        # small-alphabet set joins; word-level vocabularies take the
        # packed-vector path below.
        return _ssjoin_bitset(ds, rank_ref, tn, td, nparts, q)

    def prefix_rows(df: pd.DataFrame) -> pd.DataFrame:
        rank = _bcast_get(rank_ref)
        out_tok, out_doc, out_blob = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = set(text.split(" "))
            r = np.sort(np.fromiter((rank[t] for t in toks),
                                    dtype=np.int32, count=len(toks)))
            n = len(r)
            alpha = -((-tn * n) // td)  # ceil(tn*n/td), pure integers
            blob = r.tobytes()
            for tk in r[:n - alpha + 1]:
                out_tok.append(tk)
                out_doc.append(doc_id)
                out_blob.append(blob)
        out = pd.DataFrame({
            "tok": pd.Series(out_tok, dtype="int64"),
            "doc_id": pd.Series(out_doc, dtype="int64"),
            "blob": pd.Series(out_blob, dtype="object")})
        out["part"] = (pd.util.hash_pandas_object(out["tok"], index=False)
                       % nparts).astype("int32")
        return out

    return (ds.map_batches(prefix_rows, batch_format="pandas")
            .groupby("part").map_groups(_ssjoin_verify(tn, td, q),
                                        batch_format="pandas"))


def _ssjoin_verify(tn: int, td: int, q: int):
    """Per-cell exact verify for the prefix join: candidates meet on a
    prefix rank, verified td·|A∩B| >= tn·|A∪B| over the carried sorted
    rank vectors, emitted only at the minimal common PREFIX rank."""
    def verify(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["tok", "doc_id", "blob"]]
        m = d.merge(d, on="tok")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out_a, out_b, out_s = [], [], []
        for tok, ida, idb, ba, bb in zip(
                m["tok"].to_numpy("int64"),
                m["doc_id_x"].to_numpy("int64"),
                m["doc_id_y"].to_numpy("int64"),
                m["blob_x"], m["blob_y"]):
            ra = np.frombuffer(ba, dtype=np.int32)
            rb = np.frombuffer(bb, dtype=np.int32)
            na, nb = len(ra), len(rb)
            inter = np.intersect1d(ra, rb, assume_unique=True)
            i_n = len(inter)
            u_n = na + nb - i_n
            if td * i_n < tn * u_n:
                continue
            # emit-once: only at the minimal common PREFIX token (both
            # vectors sorted ascending, prefixes recomputed locally)
            pa = na - (-((-tn * na) // td)) + 1
            pb = nb - (-((-tn * nb) // td)) + 1
            common_pref = np.intersect1d(ra[:pa], rb[:pb],
                                         assume_unique=True)
            if common_pref[0] != tok:
                continue
            out_a.append(ida)
            out_b.append(idb)
            out_s.append((q * i_n) // u_n)
        return pd.DataFrame({
            "doc_id_a": pd.Series(out_a, dtype="int64"),
            "doc_id_b": pd.Series(out_b, dtype="int64"),
            "sim_q": pd.Series(out_s, dtype="int64")})

    return verify


_SSJOIN_BAND_CAP = 4096  # exact df below, bit_length bands above


def _ssjoin_band_of(dfv: np.ndarray) -> np.ndarray:
    """df value → band id, monotone in df: exact below _SSJOIN_BAND_CAP,
    bit_length (exact integer log2 via a powers-of-two searchsorted, no
    float) above — ≤ _SSJOIN_BAND_CAP + 64 distinct bands ever."""
    dfv = dfv.astype(np.int64)
    pows = np.left_shift(np.int64(1), np.arange(63, dtype=np.int64))
    bl = np.searchsorted(pows, dfv, side="right").astype(np.int64)
    return np.where(dfv < _SSJOIN_BAND_CAP, dfv,
                    np.int64(_SSJOIN_BAND_CAP) + bl)


def _ssjoin_banded(ds, tokdf, *, tn: int, td: int, nparts: int, q: int,
                   cell_target: int):
    """The 10^9-token-vocabulary rank path: no driver-side {token: rank}
    dict, no vocabulary broadcast. The injective band-major total order
    is rank(t) = band_offset[band(df_t)] + cell_offset[(band, cb_t)] +
    position-of-t-in-its-cell (cells = token-hash buckets sized
    ~``cell_target``, positions by token sort inside one group task).
    Driver state: per-band sizes (≤ ~4160 rows) and per-cell counts
    (~vocab/cell_target rows) — both folded from bounded partials.
    Docs get their rank vectors via a hash(token) co-group attach and a
    hash(doc) regroup, then the standard prefix-cell exchange + verify.
    Rarest-first still holds at band granularity (bands ascend in df),
    which is what keeps prefix cells small; within-band order is
    arbitrary-but-consistent, which exactness never depended on.
    """
    import ray

    from .traindata import _bcast_get

    # stage B1: band sizes (driver fold of bounded per-batch partials)
    def band_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"band": pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        band = _ssjoin_band_of(df["df"].to_numpy(np.int64))
        g = pd.DataFrame({"band": band}).groupby(
            "band", as_index=False).size()
        return pd.DataFrame({"band": g["band"].astype("int64"),
                             "cnt": g["size"].astype("int64")})

    bparts = tokdf.map_batches(band_partial,
                               batch_format="pandas").to_pandas()
    bsizes = (bparts.groupby("band", as_index=False)["cnt"].sum()
              .sort_values("band").reset_index(drop=True))
    off = 0
    band_meta = {}  # band -> (band_offset, n_cells_in_band)
    for band, cnt in zip(bsizes["band"].astype(int),
                         bsizes["cnt"].astype(int)):
        band_meta[band] = (off, max(1, -(-cnt // cell_target)))
        off += cnt
    bmeta_ref = ray.put(band_meta)

    def add_cell(df: pd.DataFrame) -> pd.DataFrame:
        """tok, df → band, cb (token-hash cell within band), cellid."""
        bmeta = _bcast_get(bmeta_ref)
        band = _ssjoin_band_of(df["df"].to_numpy(np.int64))
        ncells = np.fromiter((bmeta[int(b)][1] for b in band),
                             dtype=np.int64, count=len(band))
        h = pd.util.hash_pandas_object(df["tok"],
                                       index=False).to_numpy(np.uint64)
        cb = (h % ncells.astype(np.uint64)).astype(np.int64)
        out = pd.DataFrame({"tok": df["tok"], "band": band, "cb": cb})
        out["cellid"] = (out["band"].to_numpy(np.int64) << 32) | cb
        return out

    # stage B2: per-cell counts → within-band prefix offsets (driver
    # fold; ~vocab/cell_target rows, e.g. 244k at 10^9 tokens)
    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"cellid": pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        c = add_cell(df)
        g = c.groupby(["band", "cb"], as_index=False).size()
        return pd.DataFrame({
            "cellid": (g["band"].to_numpy(np.int64) << 32)
            | g["cb"].to_numpy(np.int64),
            "cnt": g["size"].astype("int64")})

    cparts = tokdf.map_batches(cell_partial,
                               batch_format="pandas").to_pandas()
    cells = (cparts.groupby("cellid", as_index=False)["cnt"].sum()
             .sort_values("cellid").reset_index(drop=True))
    cid = cells["cellid"].to_numpy(np.int64)
    ccnt = cells["cnt"].to_numpy(np.int64)
    band_of_cell = cid >> 32
    # cumulative within band: global cumsum minus each band's start
    cum = np.concatenate([[0], np.cumsum(ccnt)[:-1]])
    first_in_band = np.concatenate(
        [[True], band_of_cell[1:] != band_of_cell[:-1]])
    band_start = np.where(first_in_band, cum, 0)
    band_start = np.maximum.accumulate(band_start)
    boff = np.fromiter((band_meta[int(b)][0] for b in band_of_cell),
                       dtype=np.int64, count=len(band_of_cell))
    cell_off = {int(c): int(boff[i] + cum[i] - band_start[i])
                for i, c in enumerate(cid)}
    coff_ref = ray.put(cell_off)

    # stage B3: rank assignment — cells co-grouped, position by token
    def add_gpart(df: pd.DataFrame) -> pd.DataFrame:
        c = add_cell(df)
        c["gpart"] = (c["cellid"].to_numpy(np.uint64)
                      % np.uint64(nparts)).astype("int32")
        return c

    def assign_ranks(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"tok": pd.Series([], dtype="object"),
                                 "rank": pd.Series([], dtype="int64")})
        coff = _bcast_get(coff_ref)
        d = df.sort_values(["cellid", "tok"]).reset_index(drop=True)
        cellv = d["cellid"].to_numpy(np.int64)
        newcell = np.concatenate([[True], cellv[1:] != cellv[:-1]])
        idx = np.arange(len(d), dtype=np.int64)
        cellstart = np.maximum.accumulate(np.where(newcell, idx, 0))
        pos = idx - cellstart
        base = np.fromiter((coff[int(c)] for c in cellv),
                           dtype=np.int64, count=len(cellv))
        return pd.DataFrame({"tok": d["tok"],
                             "rank": base + pos})

    tokrank = (tokdf.map_batches(add_gpart, batch_format="pandas")
               .groupby("gpart").map_groups(assign_ranks,
                                            batch_format="pandas"))

    # stage B4: attach ranks to doc tokens (hash(token) union co-group)
    def doc_tok(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        d = pl.from_pandas(df[["doc_id", "text"]])
        e = (d.with_columns(pl.col("text").str.split(" ").alias("t"))
             .drop("text").explode("t")
             .unique(subset=["doc_id", "t"])).to_pandas()
        out = pd.DataFrame({"doc_id": e["doc_id"].astype("int64"),
                            "tok": e["t"],
                            "rank": np.int64(0),
                            "side": np.int8(0)})
        out["part"] = (pd.util.hash_pandas_object(out["tok"], index=False)
                       % nparts).astype("int32")
        return out

    def rank_side(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"doc_id": np.int64(0),
                            "tok": df["tok"],
                            "rank": df["rank"].astype("int64"),
                            "side": np.int8(1)})
        out["part"] = (pd.util.hash_pandas_object(out["tok"], index=False)
                       % nparts).astype("int32")
        return out

    def merge_ranks(df: pd.DataFrame) -> pd.DataFrame:
        lhs = df[df["side"] == 0][["doc_id", "tok"]]
        rhs = df[df["side"] == 1][["tok", "rank"]]
        if lhs.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "rank": pd.Series([], dtype="int64"),
                                 "dpart": pd.Series([], dtype="int32")})
        m = lhs.merge(rhs, on="tok", how="inner")
        out = pd.DataFrame({"doc_id": m["doc_id"].astype("int64"),
                            "rank": m["rank"].astype("int64")})
        out["dpart"] = (pd.util.hash_pandas_object(
            out["doc_id"], index=False) % nparts).astype("int32")
        return out

    docrank = (ds.map_batches(doc_tok, batch_format="pandas")
               .union(tokrank.map_batches(rank_side,
                                          batch_format="pandas"))
               .groupby("part").map_groups(merge_ranks,
                                           batch_format="pandas"))

    # stage B5: per-doc vector rebuild (hash(doc) co-group) → prefix
    # rows identical in shape to the dict path, then the shared verify
    def emit_prefix(df: pd.DataFrame) -> pd.DataFrame:
        out_tok, out_doc, out_blob = [], [], []
        if not df.empty:
            d = df.sort_values(["doc_id", "rank"])
            for doc_id, g in d.groupby("doc_id", sort=False):
                r = g["rank"].to_numpy(np.int64).astype(np.int32)
                n = len(r)
                alpha = -((-tn * n) // td)
                blob = r.tobytes()
                for tk in r[:n - alpha + 1]:
                    out_tok.append(tk)
                    out_doc.append(doc_id)
                    out_blob.append(blob)
        out = pd.DataFrame({
            "tok": pd.Series(out_tok, dtype="int64"),
            "doc_id": pd.Series(out_doc, dtype="int64"),
            "blob": pd.Series(out_blob, dtype="object")})
        out["part"] = (pd.util.hash_pandas_object(out["tok"], index=False)
                       % nparts).astype("int32")
        return out

    return (docrank.groupby("dpart")
            .map_groups(emit_prefix, batch_format="pandas")
            .groupby("part").map_groups(_ssjoin_verify(tn, td, q),
                                        batch_format="pandas"))


def _cdc_split(toks, mod: int):
    """Content-defined chunk spans over a token list: a token whose
    md5-u64 hash is ≡ 0 (mod ``mod``) ENDS its chunk. Returns
    (start, n_tokens) spans; position-independent, so an insertion
    re-aligns every chunk after the next boundary (the CDC property
    fixed-size segmenting lacks)."""
    from .textops import token_hash64

    h = np.fromiter((token_hash64(t) for t in toks), dtype=np.uint64,
                    count=len(toks))
    cut = np.nonzero(h % np.uint64(mod) == 0)[0] + 1
    starts = np.concatenate([[0], cut])
    ends = np.concatenate([cut, [len(toks)]])
    return [(int(s), int(e - s)) for s, e in zip(starts, ends) if e > s]


def cdc_chunks(sf_dir: str, mod: int = 16):
    """(doc_id, chunk_idx, start_tok, n_tokens, chunk_md5) — CONTENT-
    DEFINED chunking (the rsync / LBFS (Muthitacharoen et al. SOSP
    2001) / dedup-storage boundary rule, at token granularity): a
    chunk ends at every token whose md5-u64 hash ≡ 0 (mod 16), so
    expected chunk length is 16 tokens and boundaries depend only on
    CONTENT — inserting a sentence shifts fixed-size segments
    (segment_dedup) out of alignment corpus-wide, but CDC chunks
    re-synchronize at the next boundary and chunk-level dedup still
    fires. chunk_md5 is the digest downstream chunk-store dedup keys
    on.

    Scale shape: map-only — one pass, zero exchanges at any corpus
    size; the per-doc boundary scan is a vectorized hash + nonzero
    over the token array.
    """
    import hashlib

    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out_id, out_ci, out_st, out_n, out_md5 = [], [], [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = text.split(" ")
            for ci, (s, n) in enumerate(_cdc_split(toks, mod)):
                out_id.append(doc_id)
                out_ci.append(ci)
                out_st.append(s)
                out_n.append(n)
                out_md5.append(hashlib.md5(
                    " ".join(toks[s:s + n]).encode()).hexdigest())
        return pd.DataFrame({
            "doc_id": pd.Series(out_id, dtype="int64"),
            "chunk_idx": pd.Series(out_ci, dtype="int64"),
            "start_tok": pd.Series(out_st, dtype="int64"),
            "n_tokens": pd.Series(out_n, dtype="int64"),
            "chunk_md5": pd.Series(out_md5, dtype="object")})

    return ds.map_batches(fn, batch_format="pandas")


def _ssjoin_bitset(ds, rank_ref, tn: int, td: int, nparts: int, q: int):
    """ssjoin_prefix's ≤63-token-vocabulary plan: one int64 bitmask per
    doc. Same prefix rows, same exchange, vectorized popcount verify."""
    from .traindata import _bcast_get

    def prefix_rows(df: pd.DataFrame) -> pd.DataFrame:
        rank = _bcast_get(rank_ref)
        out_tok, out_doc, out_mask, out_pmask = [], [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = set(text.split(" "))
            r = np.sort(np.fromiter((rank[t] for t in toks),
                                    dtype=np.int64, count=len(toks)))
            n = len(r)
            alpha = -((-tn * n) // td)
            p = n - alpha + 1
            mask = 0
            for b in r.tolist():
                mask |= 1 << b
            pmask = 0
            for b in r[:p].tolist():
                pmask |= 1 << b
            for tk in r[:p].tolist():
                out_tok.append(tk)
                out_doc.append(doc_id)
                out_mask.append(mask)
                out_pmask.append(pmask)
        out = pd.DataFrame({
            "tok": pd.Series(out_tok, dtype="int64"),
            "doc_id": pd.Series(out_doc, dtype="int64"),
            "mask": pd.Series(out_mask, dtype="int64"),
            "pmask": pd.Series(out_pmask, dtype="int64")})
        out["part"] = (pd.util.hash_pandas_object(out["tok"], index=False)
                       % nparts).astype("int32")
        return out

    def pop64(x: np.ndarray) -> np.ndarray:
        return _popcount64(x.view(np.uint64))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["tok", "doc_id", "mask", "pmask"]]
        m = d.merge(d, on="tok")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        empty = pd.DataFrame({
            "doc_id_a": pd.Series([], dtype="int64"),
            "doc_id_b": pd.Series([], dtype="int64"),
            "sim_q": pd.Series([], dtype="int64")})
        if m.empty:
            return empty
        ma = m["mask_x"].to_numpy("int64")
        mb = m["mask_y"].to_numpy("int64")
        inter = pop64(ma & mb)
        union = pop64(ma) + pop64(mb) - inter
        both = m["pmask_x"].to_numpy("int64") & m["pmask_y"].to_numpy("int64")
        # lowest common prefix bit: popcount((v & -v) - 1) == index
        low = (both & -both) - 1
        keep = ((td * inter >= tn * union)
                & (pop64(low) == m["tok"].to_numpy("int64")))
        if not keep.any():
            return empty
        return pd.DataFrame({
            "doc_id_a": m["doc_id_x"].to_numpy("int64")[keep],
            "doc_id_b": m["doc_id_y"].to_numpy("int64")[keep],
            "sim_q": (q * inter[keep]) // union[keep]})

    return (ds.map_batches(prefix_rows, batch_format="pandas")
            .groupby("part").map_groups(verify, batch_format="pandas"))


def snm_pairs(sf_dir: str, window: int = 5,
              num_partitions: Optional[int] = None):
    """(name_a, name_b, gap) — SORTED NEIGHBORHOOD METHOD candidate
    generation (Hernández & Stolfo, SIGMOD 1995 — the classic
    record-linkage blocking alternative to key equality): sort all
    customer names by a scrambling sort key (the reversed name) and
    emit every pair within ``window`` positions of each other
    (gap = rank distance, 1..window). Downstream matchers (typo_pairs'
    verify, linkage_scores) consume these candidates; SNM catches
    near-keys that differ in their leading characters, which prefix /
    equality blocking misses.

    Scale shape: the global RANK comes without a global sort — the
    shard_corpus trick: the first byte of the sort key is ORDER-
    ALIGNED with the lexicographic order, so 256 range buckets + a
    tiny per-bucket count aggregate give broadcast rank offsets and
    each bucket sorts only its own rows. The windowed self-join then
    needs each bucket's LAST ``window`` ranks replicated to the
    buckets holding the next ``window`` ranks (HALO / ghost rows —
    the boundary-exchange pattern of every sorted sliding-window
    join); each pair is emitted at exactly ONE bucket, the one owning
    its higher-rank member. Two fixed-width exchanges total.
    """
    import ray

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))
    ds = _bread("%s/customer.parquet" % sf_dir, columns=["c_name"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        names = df["c_name"].astype(str)
        rev = names.map(lambda s: s[::-1])
        return pd.DataFrame({
            "skey": rev, "name": names,
            "rbucket": rev.map(lambda s: ord(s[0]) if s else 0)
            .astype("int64")})

    keyed_ds = ds.map_batches(keyed, batch_format="pandas").materialize()

    # tiny aggregate: rows per range bucket → global rank offsets
    counts = (keyed_ds.map_batches(
        lambda df: df.groupby("rbucket", as_index=False).size()
        .rename(columns={"size": "n"}), batch_format="pandas")
        .to_pandas().groupby("rbucket")["n"].sum().sort_index())
    offsets, acc = {}, 0
    for b, n in counts.items():
        offsets[int(b)] = acc
        acc += int(n)
    total = acc
    bucket_lo = dict(offsets)

    def rank_and_halo(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["skey", "name"]).reset_index(drop=True)
        rb = int(df["rbucket"].iloc[0])
        grank = offsets[rb] + np.arange(len(df), dtype=np.int64)
        rows = [pd.DataFrame({"grank": grank, "name": df["name"],
                              "owner": np.int64(1), "tbucket": rb})]
        # halo: a row must ALSO visit every bucket whose rank range
        # starts within (grank, grank + window]
        for tb, lo in bucket_lo.items():
            if tb == rb:
                continue
            need = (grank < lo) & (lo <= grank + window)
            if need.any():
                rows.append(pd.DataFrame({
                    "grank": grank[need], "name": df["name"][need],
                    "owner": np.int64(0), "tbucket": tb}))
        out = pd.concat(rows, ignore_index=True)
        out["part"] = (out["tbucket"] % nparts).astype("int32")
        return out

    def window_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_g = [], [], []
        for _, g in df.groupby("tbucket", sort=False):
            g = g.sort_values("grank").reset_index(drop=True)
            rk = g["grank"].to_numpy("int64")
            nm = g["name"].to_numpy()
            own = g["owner"].to_numpy("int64")
            # per owner row b: partners with rank in [rk_b-window, rk_b-1]
            for i in range(len(g)):
                if own[i] != 1:
                    continue
                j = i - 1
                while j >= 0 and rk[i] - rk[j] <= window:
                    out_a.append(nm[j])
                    out_b.append(nm[i])
                    out_g.append(rk[i] - rk[j])
                    j -= 1
        return pd.DataFrame({
            "name_a": pd.Series(out_a, dtype="object"),
            "name_b": pd.Series(out_b, dtype="object"),
            "gap": pd.Series(out_g, dtype="int64")})

    return (keyed_ds.groupby("rbucket")
            .map_groups(rank_and_halo, batch_format="pandas")
            .groupby("part").map_groups(window_pairs,
                                        batch_format="pandas"))


def _attach_flag(rows, flags, key: str, out_col: str, nparts: int,
                 fill: int = 0):
    """Dataset[rows] ⟕ Dataset[(node, flag)] on ``key`` → rows +
    ``out_col`` (``fill`` when absent) — a schema-preserving bucketed
    left join (the luby_mis union-tag pattern)."""
    cols = [c for c in rows.schema().names]

    def tag_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__side"] = np.int8(0)
        out["__flag"] = np.int64(0)
        out["__bucket"] = (pd.util.hash_pandas_object(
            out[key], index=False) % nparts).astype("int32")
        return out

    def tag_flags(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({c: np.int64(0) for c in cols},
                           index=df.index)
        out[key] = df["node"].astype("int64")
        out["__side"] = np.int8(1)
        out["__flag"] = df["flag"].astype("int64")
        out["__bucket"] = (pd.util.hash_pandas_object(
            out[key], index=False) % nparts).astype("int32")
        return out

    u = rows.map_batches(tag_rows, batch_format="pandas").union(
        flags.map_batches(tag_flags, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        lhs = df[df["__side"] == 0][cols]
        f = (df[df["__side"] == 1][[key, "__flag"]]
             .groupby(key, as_index=False)["__flag"].max())
        m = lhs.merge(f, on=key, how="left")
        m[out_col] = m["__flag"].fillna(fill).astype("int64")
        return m[cols + [out_col]]

    return u.groupby("__bucket").map_groups(merge,
                                            batch_format="pandas")


def _local_dbscan(sf_dir: str, edges, min_pts: int) -> pd.DataFrame:
    """Single-task DBSCAN over a materialized pair list — same core /
    border / noise rules and tie conventions as the distributed path."""
    from collections import defaultdict

    import pyarrow.parquet as pq_

    e = edges.to_pandas()
    adj = defaultdict(set)
    for a, b in zip(e["a"].astype(int), e["b"].astype(int)):
        adj[a].add(b)
        adj[b].add(a)
    core = {v for v, nb in adj.items() if len(nb) >= min_pts}
    # components of core-core edges via union-find
    parent = {v: v for v in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(e["a"].astype(int), e["b"].astype(int)):
        if a in core and b in core:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    # find() yields the component minimum: unions always point the
    # larger root at the smaller, so every tree's root is its min
    label = {v: find(v) for v in core}
    all_ids = pq_.read_table("%s/embeddings.parquet" % sf_dir,
                             columns=["vec_id"]).column("vec_id")         .to_pylist()
    rows = []
    for v in sorted(int(x) for x in all_ids):
        if v in core:
            rows.append((v, 1, label[v]))
        else:
            cn = [label[u] for u in adj.get(v, ()) if u in core]
            if cn:
                rows.append((v, 2, min(cn)))
            else:
                rows.append((v, 0, -1))
    return pd.DataFrame(rows, columns=["vec_id", "role", "cluster"])         .astype("int64")


def dbscan_clusters(sf_dir: str, threshold: float = 0.35,
                    min_pts: int = 3,
                    num_partitions: Optional[int] = None,
                    small_graph_threshold: int = 2_000_000):
    """(vec_id, role, cluster) — DBSCAN density clustering (Ester et
    al. KDD 1996, the test-of-time clustering that needs no k and
    calls sparse points noise): eps-neighbors = exact cosine ≥
    ``threshold`` pairs (``embedding_near_dup``'s block-grid join),
    CORE points have ≥ ``min_pts`` neighbors (role 1, clustered as
    connected components of core–core edges, label = min core id),
    BORDER points are non-core with a core neighbor (role 2, joined
    to the minimum neighboring core label — the deterministic
    tie rule), everything else is NOISE (role 0, cluster −1).

    Scale shape: one degree exchange (value_counts combiner), two
    schema-preserving flag attaches onto the pair list, the
    union-find component loop over core–core edges, one label
    attach for borders, and a final doc-hash co-group unioning roles
    over all vectors. Every stage is the bucketed fixed-width-row
    machinery the graph ops share; the pair list (the only data-sized
    table) is bounded by the eps-join output.
    """
    import ray

    from .components import _edge_degrees, connected_components

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    pairs = embedding_near_dup(sf_dir, threshold=threshold)
    edges = pairs.map_batches(
        lambda df: pd.DataFrame({"a": df["vec_id_a"].astype("int64"),
                                 "b": df["vec_id_b"].astype("int64")}),
        batch_format="pandas").materialize()
    if edges.count() <= small_graph_threshold:
        # the six chained graph stages are pure orchestration below
        # millions of pairs (the kcore/ktruss gate) — row-identical
        # by exactness, pinned by test
        return _local_dbscan(sf_dir, edges, min_pts)
    deg = _edge_degrees(edges, nparts)
    core = deg.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["node"].astype("int64"),
             "flag": (df["deg"] >= min_pts).astype("int64")}),
        batch_format="pandas")

    e1 = _attach_flag(edges, core, "a", "fa", nparts)
    e2 = _attach_flag(e1, core, "b", "fb", nparts).materialize()

    cc_edges = e2.map_batches(
        lambda df: df[(df["fa"] == 1) & (df["fb"] == 1)][["a", "b"]],
        batch_format="pandas")
    comp = connected_components(cc_edges, num_partitions=nparts)
    labels = comp.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["node"].astype("int64"),
             "flag": df["component"].astype("int64")}),
        batch_format="pandas")
    # isolated cores (no core neighbour) are their own cluster — they
    # don't appear in cc_edges, so default label = self (attached last)

    # border candidates: one core endpoint; rows (noncore, corenode)
    bc = e2.map_batches(
        lambda df: pd.concat([
            df[(df["fa"] == 1) & (df["fb"] == 0)].rename(
                columns={"b": "nc", "a": "cr"})[["nc", "cr"]],
            df[(df["fb"] == 1) & (df["fa"] == 0)].rename(
                columns={"a": "nc", "b": "cr"})[["nc", "cr"]]],
            ignore_index=True),
        batch_format="pandas")
    bl = _attach_flag(bc, labels, "cr", "lbl", nparts, fill=-1)
    # an isolated core (no core neighbour) never entered cc_edges: its
    # cluster label is itself — resolve the -1 fill to the core id
    bl = bl.map_batches(
        lambda df: df.assign(lbl=np.where(df["lbl"] < 0, df["cr"],
                                          df["lbl"]).astype("int64")),
        batch_format="pandas")

    import pyarrow.parquet as pq_
    all_ids = pq_.read_table("%s/embeddings.parquet" % sf_dir,
                             columns=["vec_id"]).column("vec_id") \
        .to_pylist()
    base = ray.data.from_pandas(pd.DataFrame(
        {"vec_id": pd.Series(sorted(all_ids), dtype="int64")}))

    def tag(side: int, cols_fn):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = cols_fn(df)
            out["side"] = np.int8(side)
            out["bucket"] = (pd.util.hash_pandas_object(
                out["vec_id"], index=False) % nparts).astype("int32")
            return out
        return fn

    u = base.map_batches(
        tag(0, lambda df: pd.DataFrame(
            {"vec_id": df["vec_id"].astype("int64"),
             "val": np.int64(0)})), batch_format="pandas") \
        .union(core.map_batches(
            tag(1, lambda df: pd.DataFrame(
                {"vec_id": df["node"].astype("int64"),
                 "val": df["flag"].astype("int64")})),
            batch_format="pandas")) \
        .union(labels.map_batches(
            tag(2, lambda df: pd.DataFrame(
                {"vec_id": df["node"].astype("int64"),
                 "val": df["flag"].astype("int64")})),
            batch_format="pandas")) \
        .union(bl.map_batches(
            tag(3, lambda df: pd.DataFrame(
                {"vec_id": df["nc"].astype("int64"),
                 "val": df["lbl"].astype("int64")})),
            batch_format="pandas"))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[df["side"] == 0][["vec_id"]].drop_duplicates()
        isc = df[(df["side"] == 1) & (df["val"] == 1)]["vec_id"]
        lab = df[df["side"] == 2].groupby("vec_id")["val"].min()
        bmin = df[df["side"] == 3].groupby("vec_id")["val"].min()
        roles, clusters = [], []
        core_set = set(isc.astype(int))
        for v in ids["vec_id"].astype(int):
            if v in core_set:
                roles.append(1)
                clusters.append(int(lab.get(v, v)))  # isolated → self
            elif v in bmin.index:
                roles.append(2)
                clusters.append(int(bmin[v]))
            else:
                roles.append(0)
                clusters.append(-1)
        return pd.DataFrame({
            "vec_id": ids["vec_id"].astype("int64").to_numpy(),
            "role": pd.Series(roles, dtype="int64").to_numpy(),
            "cluster": pd.Series(clusters, dtype="int64").to_numpy()})

    return u.groupby("bucket").map_groups(finalize,
                                          batch_format="pandas")


def percolation_curve(sf_dir: str,
                      thresholds=(50, 60, 70, 80, 90),
                      num_partitions: Optional[int] = None):
    """(thr_pct, n_edges, n_touched, n_components, max_component) —
    the DEDUP-THRESHOLD SENSITIVITY CURVE: sweep the Jaccard
    threshold and report, per setting, how the near-dup pair graph
    percolates — edge count, touched nodes, component count and the
    LARGEST component's size. This is the analysis that picks a
    production dedup threshold: set it too low and a giant connected
    component swallows the corpus (near_dup_dedup would then delete
    almost everything via transitive merging — the classic
    percolation failure); the curve shows exactly where that phase
    transition starts.

    Scale shape: the blocked pair stage runs ONCE at the lowest sweep
    threshold with ``emit_counts=True`` — the exact (inter, union)
    integers ride along, so every higher point is a map-side filter
    re-applying the IDENTICAL float compare (inter/union ≥ t) instead
    of re-reading and re-tokenizing the corpus per threshold. For
    exact-path blocks this is literally the same pair set a standalone
    run at t would produce; for ``block_cap``-escalated blocks the
    lower threshold's banding is MORE permissive, so candidate recall
    per point is ≥ the standalone run's (the only divergence, and in
    the conservative direction). Per threshold the filtered edges flow
    Dataset→Dataset into ``connected_components``, and the
    component-size summary is the per-batch-combiner pattern:
    per-batch ``value_counts`` partials, hash(component)%nparts bucket
    co-group to true sizes, then ONE summary row per bucket; the
    driver folds only ``nparts`` rows per threshold. This matters
    precisely at low thresholds, where the edge count explodes — the
    percolation regime the curve exists to probe.
    """
    import ray

    from .components import connected_components

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    pairs_all = jaccard_pairs(sf_dir, min(thresholds) / 100.0,
                              num_partitions=nparts,
                              emit_counts=True).materialize()

    def to_edges_at(thr: float):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            keep = (df["inter"].to_numpy(dtype="float64")
                    / df["union_sz"].to_numpy(dtype="float64")) >= thr
            e = df.loc[keep]
            return pd.DataFrame({"a": e["doc_id_a"].astype("int64"),
                                 "b": e["doc_id_b"].astype("int64")})
        return fn

    def size_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["component"].value_counts()
        comp_ids = pd.Series(vc.index, dtype="int64")
        return pd.DataFrame({
            "component": comp_ids.to_numpy(),
            "cnt": vc.to_numpy().astype("int64"),
            "bucket": (pd.util.hash_pandas_object(comp_ids, index=False)
                       % nparts).astype("int32")})

    def bucket_summary(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby("component")["cnt"].sum()
        return pd.DataFrame({"n_nodes": [int(sizes.sum())],
                             "n_components": [len(sizes)],
                             "max_component": [int(sizes.max())]})

    rows = []
    for t in thresholds:
        edges = pairs_all.map_batches(
            to_edges_at(t / 100.0), batch_format="pandas").materialize()
        n_edges = edges.count()
        if n_edges == 0:
            rows.append((t, 0, 0, 0, 0))
            continue
        comp = connected_components(edges, num_partitions=nparts)
        s = comp.map_batches(size_partial, batch_format="pandas") \
            .groupby("bucket") \
            .map_groups(bucket_summary, batch_format="pandas") \
            .to_pandas()
        rows.append((t, n_edges, int(s["n_nodes"].sum()),
                     int(s["n_components"].sum()),
                     int(s["max_component"].max())))
    return pd.DataFrame(
        rows, columns=["thr_pct", "n_edges", "n_touched",
                       "n_components", "max_component"]).astype("int64")


def _lev(a: str, b: str) -> int:
    """Wagner–Fischer edit distance, row-vectorized: the left-neighbor
    dependency resolves with the minimum-accumulate trick (subtract
    the column index, running min, add it back)."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    bs = np.frombuffer(b.encode("utf-8"), dtype=np.uint8)
    idx = np.arange(len(bs) + 1, dtype=np.int64)
    prev = idx.copy()
    for i, ca in enumerate(a.encode("utf-8")):
        cost = (bs != ca).astype(np.int64)
        cand = np.empty(len(bs) + 1, dtype=np.int64)
        cand[0] = i + 1
        cand[1:] = np.minimum(prev[1:] + 1, prev[:-1] + cost)
        # chained left-insertions close in one running min over
        # (candidate − column), since new_j = min_k≤j (cand_k + j − k)
        prev = np.minimum.accumulate(cand - idx) + idx
    return int(prev[-1])


def pair_edit_stats(sf_dir: str, threshold: float = 0.8,
                    num_partitions: Optional[int] = None):
    """(doc_id_a, doc_id_b, lev, len_a, len_b) — exact character-level
    LEVENSHTEIN distance for every near-dup candidate pair (the
    ``jaccard_pairs`` blocked set): token-set similarity says two
    docs share words; the edit distance says how much typing actually
    separates them — the post-candidate feature record linkage and
    fuzzy-dedup scorers consume. Computed inside the SAME blocked
    partitions the candidates come from (texts are already local —
    no second join ships them), with Myers' bit-parallel DP per pair
    (8× the row-vectorized Wagner–Fischer on these ~420-char texts;
    banding would not help — qualifying pairs share token SETS but
    scramble order, median distance 317).
    """
    import itertools

    import ray

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def add_block(df: pd.DataFrame) -> pd.DataFrame:
        block = df["text"].str.split(" ").str[0]
        return pd.DataFrame({
            "doc_id": df["doc_id"], "text": df["text"],
            "block": block,
            "part": (pd.util.hash_pandas_object(block, index=False)
                     % nparts).astype("int32")})

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        oa, ob, ol, la, lb = [], [], [], [], []
        for _, g in df.groupby("block", sort=False):
            ids = g["doc_id"].tolist()
            texts = g["text"].tolist()
            sets = [set(t.split(" ")) for t in texts]
            for i, j in itertools.combinations(range(len(ids)), 2):
                inter = len(sets[i] & sets[j])
                union = len(sets[i]) + len(sets[j]) - inter
                if inter / union < threshold:
                    continue
                x, y = ((i, j) if ids[i] < ids[j] else (j, i))
                oa.append(ids[x])
                ob.append(ids[y])
                ol.append(_lev_myers(texts[x], texts[y]))
                la.append(len(texts[x]))
                lb.append(len(texts[y]))
        return pd.DataFrame({
            "doc_id_a": pd.Series(oa, dtype="int64"),
            "doc_id_b": pd.Series(ob, dtype="int64"),
            "lev": pd.Series(ol, dtype="int64"),
            "len_a": pd.Series(la, dtype="int64"),
            "len_b": pd.Series(lb, dtype="int64")})

    return (ds.map_batches(add_block, batch_format="pandas")
            .groupby("part").map_groups(verify, batch_format="pandas"))


def _lev_myers(a: str, b: str) -> int:
    """Myers' bit-parallel edit distance (J.ACM 1999): the full DP
    column collapses to O(1) arbitrary-precision bit operations per
    character of ``b`` — exact, ~60× fewer word-ops than the
    row-vectorized DP on long strings. Python bigints are the bit
    vectors, so any pattern length works."""
    m = len(a)
    if m == 0:
        return len(b)
    if not b:
        return m
    peq: dict = {}
    for i, ch in enumerate(a):
        peq[ch] = peq.get(ch, 0) | (1 << i)
    mask = (1 << m) - 1
    high = 1 << (m - 1)
    pv = mask
    mv = 0
    score = m
    for ch in b:
        eq = peq.get(ch, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | (~(xh | pv) & mask)
        mh = pv & xh
        if ph & high:
            score += 1
        elif mh & high:
            score -= 1
        ph = ((ph << 1) | 1) & mask
        mh = (mh << 1) & mask
        pv = (mh | (~(xv | ph) & mask))
        mv = ph & xv
    return score
