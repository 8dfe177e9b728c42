"""Training-data assembly operators over the ``documents`` table.

The three steps between "deduplicated corpus" and "pretraining batches"
that the dedup/quality families don't cover:

- ``decontaminate`` — n-gram overlap against a held-out benchmark set
  (the GPT-3-style 13-gram decontamination check, here 5-grams): which
  training documents share shingles with eval data, and how many.
- ``seeded_sample`` / ``stratified_sample`` — deterministic sampling for
  data mixing: a seeded hash threshold (uniform) and a per-group top-n
  by seeded hash (stratified), both reproducible in SQL bit-for-bit.
- ``pack_sequences`` — greedy token-budget packing of documents into
  training sequences, shard-local so it parallelizes.

Everything is deterministic (md5-based hashing, no PYTHONHASHSEED
dependence) and mirrored exactly by the DuckDB oracles in
``kgx/queries.py`` (TRAINDATA_ORACLES).
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd

from .readers import compute_heavy_read_parquet as _bread


def _read_documents(sf_dir: str, columns=None):
    import ray.data

    return _bread("%s/documents.parquet" % sf_dir, columns=columns)


def _nparts():
    import ray

    return max(4, int(ray.cluster_resources().get("CPU", 8)))


def _md5_u64(s: str) -> int:
    """First 16 hex chars of md5 as u64 — reproduced in SQL as
    ('0x' || substr(md5(s), 1, 16))::UBIGINT (same trick as
    textops.token_hash64)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)


# decontamination defaults — shared by decontaminate, curate_corpus and
# the SQL oracles (queries.py) so the composed pipeline can never
# silently diverge from the standalone stage
SHINGLE_K = 5
BENCH_MOD = 50
BENCH_REM = 7


def _shingle_rows_fn(shingle_k: int, bench_mod: int, bench_rem: int,
                     nparts: int):
    """(doc_id, shingle, is_bench, part) explode with per-doc distinct
    combiner — the map side of the decontamination co-group."""

    def shingle_rows(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, shingles = [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = text.split(" ")
            if len(toks) < shingle_k:
                continue
            seen = {" ".join(toks[i:i + shingle_k])
                    for i in range(len(toks) - shingle_k + 1)}
            doc_ids.extend([doc_id] * len(seen))
            shingles.extend(seen)
        out = pd.DataFrame({
            "doc_id": pd.Series(doc_ids, dtype="int64"),
            "shingle": pd.Series(shingles, dtype="object"),
        })
        out["is_bench"] = (out["doc_id"] % bench_mod == bench_rem)
        out["part"] = (pd.util.hash_pandas_object(out["shingle"], index=False)
                       % nparts).astype("int32")
        return out

    return shingle_rows


# ---------------------------------------------------------------------------
# Decontamination
# ---------------------------------------------------------------------------

def decontaminate(sf_dir: str, shingle_k: int = SHINGLE_K,
                  bench_mod: int = BENCH_MOD, bench_rem: int = BENCH_REM,
                  num_partitions: Optional[int] = None):
    """(doc_id, n_shared_shingles) for every TRAINING document that
    shares at least one ``shingle_k``-gram with the benchmark holdout
    (docs with ``doc_id % bench_mod == bench_rem`` stand in for an eval
    set). ``n_shared_shingles`` counts the doc's DISTINCT contaminated
    shingles. Documents shorter than ``shingle_k`` tokens emit no
    shingles.

    Scale shape: both sides explode to (shingle, doc_id, is_bench) rows
    with a per-batch (doc, shingle) dedup as the combiner; ONE hash
    shuffle on the shingle co-groups train and bench rows (a given
    shingle lives in exactly one partition, so the per-partition distinct
    count is globally correct); per-doc partials then sum in a hash
    aggregate. The shingle is shipped as text here for oracle-exact
    semantics — at 10^9 docs ship ``token_hash64(shingle)`` instead
    (same shape, 8 bytes/row, ~1e-9 collision odds per corpus).
    """
    nparts = num_partitions or _nparts()
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])
    shingle_rows = _shingle_rows_fn(shingle_k, bench_mod, bench_rem, nparts)

    def match_part(df: pd.DataFrame) -> pd.DataFrame:
        bench = set(df.loc[df["is_bench"], "shingle"])
        if not bench:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "partial_n": pd.Series([], dtype="int64")})
        train = df[~df["is_bench"]]
        hit = train[train["shingle"].isin(bench)]
        g = hit.groupby("doc_id", as_index=False).size()
        return pd.DataFrame({"doc_id": g["doc_id"].astype("int64"),
                             "partial_n": g["size"].astype("int64")})

    partials = (ds.map_batches(shingle_rows, batch_format="pandas")
                .groupby("part").map_groups(match_part, batch_format="pandas"))

    # per-doc sum as a hash co-group, not the native sort-aggregate —
    # downstream of a co-group shuffle the native path pays a full sort
    # over compounded block counts (same fix as textops.dup_ngram_stats)
    def doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            b2=(pd.util.hash_pandas_object(df["doc_id"], index=False)
                % nparts).astype("int32"))

    def final_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False)["partial_n"].sum()
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "n_shared_shingles": g["partial_n"].astype("int64")})

    return (partials.map_batches(doc_bucket, batch_format="pandas")
            .groupby("b2").map_groups(final_sum, batch_format="pandas"))


def _bench_shingle_set(sf_dir: str, shingle_k: int, bench_mod: int,
                       bench_rem: int) -> frozenset:
    """Distinct shingles of the benchmark holdout, collected driver-side.

    Bounded by construction: the holdout is the small, FIXED side of
    decontamination (real pipelines hold a few hundred eval sets — MBs
    of text — against a 100 TB corpus), so its distinct-shingle set fits
    on the driver and is the natural broadcast payload. Per-batch
    distinct is the combiner; ``take_all`` only ever sees holdout-sized
    rows, never corpus-sized. At true scale the holdout would be its own
    small table and this read replaced by it — the derived-from-the-same-
    table form here exists so the oracle can replay it relationally.
    """
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def bench_shingles(df: pd.DataFrame) -> pd.DataFrame:
        b = df[df["doc_id"] % bench_mod == bench_rem]
        out = set()
        for text in b["text"]:
            toks = text.split(" ")
            if len(toks) < shingle_k:
                continue
            out.update(" ".join(toks[i:i + shingle_k])
                       for i in range(len(toks) - shingle_k + 1))
        return pd.DataFrame({"shingle": pd.Series(sorted(out),
                                                  dtype="object")})

    rows = ds.map_batches(bench_shingles, batch_format="pandas").take_all()
    return frozenset(r["shingle"] for r in rows)


# per-worker cache of deserialized broadcast objects: ray.get() of a
# Python set unpickles per TASK otherwise; keyed by the object ref so a
# new broadcast invalidates naturally (same pattern as link.py's
# per-worker registry cache)
_BCAST_CACHE: dict = {}


def _bcast_get(ref):
    import ray

    key = ref.hex()
    if key not in _BCAST_CACHE:
        _BCAST_CACHE.clear()  # at most one live broadcast per worker
        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


def decontaminate_broadcast(sf_dir: str, shingle_k: int = SHINGLE_K,
                            bench_mod: int = BENCH_MOD,
                            bench_rem: int = BENCH_REM):
    """Same answer as ``decontaminate`` — (doc_id, n_shared_shingles)
    for contaminated training docs — via the broadcast plan instead of
    the shingle co-group: the holdout's distinct-shingle set is shipped
    ONCE through the object store (``ray.put``) and every scan task
    counts its docs' distinct shingles against it in place. ZERO
    all-to-all exchanges (the co-group plan pays one over the full
    corpus's exploded shingle rows).

    This is the right plan whenever the holdout side is small — the
    normal case for benchmark decontamination — and the co-group plan
    remains the general one for two big sides. Exactness is preserved
    (a real set, not a Bloom filter), so both plans share one oracle.
    """
    import ray

    bench_ref = ray.put(_bench_shingle_set(sf_dir, shingle_k, bench_mod,
                                           bench_rem))
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def count_hits(df: pd.DataFrame) -> pd.DataFrame:
        bench = _bcast_get(bench_ref)
        doc_ids, counts = [], []
        train = df[df["doc_id"] % bench_mod != bench_rem]
        for doc_id, text in zip(train["doc_id"], train["text"]):
            toks = text.split(" ")
            if len(toks) < shingle_k:
                continue
            seen = {" ".join(toks[i:i + shingle_k])
                    for i in range(len(toks) - shingle_k + 1)}
            n = len(seen & bench)
            if n:
                doc_ids.append(doc_id)
                counts.append(n)
        return pd.DataFrame({
            "doc_id": pd.Series(doc_ids, dtype="int64"),
            "n_shared_shingles": pd.Series(counts, dtype="int64")})

    return ds.map_batches(count_hits, batch_format="pandas")


def dsir_weights(sf_dir: str, bench_mod: int = BENCH_MOD,
                 bench_rem: int = BENCH_REM):
    """(doc_id, dsir_q20, n_tokens) — DSIR-style importance weights
    (Data Selection with Importance Resampling, arXiv:2302.03169): score
    every training document by how target-like its unigram distribution
    is, where the target is the benchmark holdout (``doc_id % bench_mod
    == bench_rem``) and the source is the rest of the corpus.

    Per token: w(tok) = floor(2^20 · ln(p_target(tok) / p_source(tok)))
    with add-1 smoothing; per doc: the INT64 sum of its tokens' weights
    (high = target-like, the docs DSIR would up-sample). Quantizing each
    token weight to an integer BEFORE the sum makes the result exact and
    order-independent, so Ray and the SQL oracle agree bit-for-bit —
    Python ``math.log`` and DuckDB ``ln`` are the same libm call, and
    both sides divide the identical pair of sub-2^53 doubles (guarded).

    Scale shape: the same two-pass broadcast-aggregate as
    ``textops.unigram_lm_score`` — pass 1 aggregates (tok, n_target,
    n_source) through a per-batch combiner (the shuffle carries
    vocabulary, not occurrences), the MB-sized weight table broadcasts
    into the map-only pass 2.
    """
    import math

    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def local_counts(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        d = pl.from_pandas(df[["doc_id", "text"]])
        ex = (d.with_columns(pl.col("text").str.split(" ").alias("t"))
              .drop("text").explode("t")
              .with_columns((pl.col("doc_id") % bench_mod == bench_rem)
                            .alias("is_b")))
        g = ex.group_by("t").agg(
            pl.col("is_b").sum().cast(pl.Int64).alias("t_n"),
            (pl.len() - pl.col("is_b").sum()).cast(pl.Int64).alias("s_n"))
        return g.rename({"t": "tok"}).to_pandas()

    vocab = (ds.map_batches(local_counts, batch_format="pandas")
             .groupby("tok").sum(["t_n", "s_n"]).to_pandas())
    t_tot = int(vocab["sum(t_n)"].sum())
    s_tot = int(vocab["sum(s_n)"].sum())
    v = len(vocab)
    q = 1 << 20
    weights = {}
    for tok, t_n, s_n in zip(vocab["tok"], vocab["sum(t_n)"],
                             vocab["sum(s_n)"]):
        num = (int(t_n) + 1) * (s_tot + v)
        den = (int(s_n) + 1) * (t_tot + v)
        # both factors must be exactly representable doubles or the
        # engine/oracle double-rounding paths could diverge
        assert num < (1 << 53) and den < (1 << 53), "quantize counts first"
        weights[tok] = math.floor(q * math.log(float(num) / float(den)))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        d = pl.from_pandas(df[["doc_id", "text"]])
        d = d.filter(pl.col("doc_id") % bench_mod != bench_rem)
        ex = (d.with_columns(pl.col("text").str.split(" ").alias("t"))
              .drop("text").explode("t")
              .with_columns(pl.col("t").replace_strict(
                  weights, default=0, return_dtype=pl.Int64).alias("w")))
        out = ex.group_by("doc_id").agg(
            pl.col("w").sum().cast(pl.Int64).alias("dsir_q20"),
            pl.len().cast(pl.Int64).alias("n_tokens"))
        return out.to_pandas()

    return ds.map_batches(score, batch_format="pandas")


# ---------------------------------------------------------------------------
# Deterministic sampling
# ---------------------------------------------------------------------------

def seeded_sample(sf_dir: str, frac: float = 0.25, seed: int = 42):
    """(doc_id) — uniform deterministic sample: keep a doc iff the u64
    md5 hash of ``"{doc_id}:{seed}"`` falls below ``frac`` of the hash
    space. Map-only (no shuffle); re-runs and the SQL oracle select the
    identical set."""
    ds = _read_documents(sf_dir, columns=["doc_id"])
    threshold = int(frac * 2 ** 64)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = df["doc_id"].map(lambda d: _md5_u64("%d:%d" % (d, seed)))
        return pd.DataFrame({"doc_id": df.loc[[x < threshold for x in h],
                                              "doc_id"].astype("int64")})

    return ds.map_batches(keep, batch_format="pandas")


def weighted_sample(sf_dir: str, k: int = 100, seed: int = 42):
    """(doc_id, n_tokens, key_q20) — weighted sampling WITHOUT
    replacement, A-Res (Efraimidis & Spirakis, "Weighted random sampling
    with a reservoir", IPL 2006): each doc draws u from its seeded md5
    hash and competes with key u^(1/w), w = its token count — the
    standard "sample ∝ length/quality" data-mixing primitive. Selecting
    the top ``k`` by key is equivalent to top-k by ln(u)/w (monotone),
    which needs only the libm ln both engines share; the key is
    floor-quantized to 2^-20 so the selection is integer-exact (ties
    broken by doc_id — a tie means two keys agree to within 2^-20, where
    either choice is a valid A-Res draw).

    Scale shape: map-only scoring with a per-batch top-k combiner; the
    single-group final reduce sees ≤ k·n_batches rows. The float tree is
    matched to the oracle: u = (CAST(h AS DOUBLE) + 1) / 2^64 (never
    zero, +1 applied AFTER the double rounding on both sides).
    """
    import math

    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        n = (df["text"].str.count(" ") + 1).astype("int64")
        keys = []
        for doc_id, w in zip(df["doc_id"], n):
            u = (float(_md5_u64("%d:%d" % (doc_id, seed))) + 1.0) \
                / 18446744073709551616.0
            keys.append(math.floor(1048576.0 * (math.log(u) / float(w))))
        out = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype="int64"),
            "n_tokens": n.to_numpy(dtype="int64"),
            "key_q20": pd.Series(keys, dtype="int64")})
        out = out.sort_values(["key_q20", "doc_id"],
                              ascending=[False, True]).head(k)
        out["g"] = np.int8(0)
        return out

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.sort_values(["key_q20", "doc_id"],
                              ascending=[False, True]).head(k))
        return out[["doc_id", "n_tokens", "key_q20"]].reset_index(drop=True)

    return (ds.map_batches(score, batch_format="pandas")
            .groupby("g").map_groups(final_topk, batch_format="pandas"))


def stratified_sample(sf_dir: str, n_per_group: int = 50, seed: int = 42):
    """(doc_id, lang) — per-language stratified sample: the ``n`` docs
    with the smallest seeded hash in each language (ties impossible —
    the hash input includes the unique doc_id). The balanced-mixture
    primitive for data mixing.

    Scale shape: per-batch top-n per group is the combiner, then one
    groupby over the LOW-cardinality group key reduces candidates —
    never more than n_per_group × n_batches rows reach the shuffle."""
    ds = _read_documents(sf_dir, columns=["doc_id", "lang"])

    def local_topn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(h=[_md5_u64("%d:%d" % (d, seed)) for d in df["doc_id"]])
        # nsmallest per lang within the batch (combiner)
        return (df.sort_values(["lang", "h"])
                .groupby("lang", sort=False).head(n_per_group))

    def final_topn(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.sort_values("h").head(n_per_group)
               .sort_values("doc_id"))
        return pd.DataFrame({"doc_id": out["doc_id"].astype("int64"),
                             "lang": out["lang"]})

    cands = ds.map_batches(local_topn, batch_format="pandas")
    return cands.groupby("lang").map_groups(final_topn, batch_format="pandas")


def temperature_mix(sf_dir: str, total: int = 200, seed: int = 42,
                    group_col: str = "lang"):
    """(doc_id, lang) — temperature-scaled mixture sampling, the GPT-3 /
    multilingual-LM data-mixing step: group g with n_g documents gets
    sampling mass ∝ n_g^α with α = 1/2, so rare groups are UPSAMPLED
    relative to proportional (en:fr 218:64 mixes ≈1.85:1 instead of
    3.4:1) while expected output size stays ``total``. A doc is kept iff
    its seeded md5-u64 hash falls below its group's threshold
    t_g = total · w_g · 2^64 // (Σw · n_g) with w_g = isqrt(n_g · 2^40)
    — ALL arithmetic integer, so the engine (Python bigints) and the
    DuckDB oracle (HUGEINT; floor(sqrt(DOUBLE)) == isqrt while
    n·2^40 < 2^52, i.e. through the oracle's own scale) agree
    bit-for-bit with no float-summation-order risk.

    Scale shape: pass 1 is a per-batch value_counts combiner into a
    tiny group aggregate (group keys are low-cardinality by
    construction — languages, sources); the resulting rate table lives
    on the driver and broadcasts into pass 2, a map-only hash filter.
    No all-to-all at any size.
    """
    import math

    ds = _read_documents(sf_dir, columns=["doc_id", group_col])

    def local_counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[group_col].value_counts()
        return pd.DataFrame({"g": vc.index, "n": vc.to_numpy(dtype="int64")})

    counts = (ds.map_batches(local_counts, batch_format="pandas")
              .groupby("g").sum("n").to_pandas())
    n_by_g = dict(zip(counts["g"], (int(x) for x in counts["sum(n)"])))
    w_by_g = {g: math.isqrt(n << 40) for g, n in n_by_g.items()}
    W = sum(w_by_g.values())
    thr = {g: (total * w_by_g[g] * (1 << 64)) // (W * n_by_g[g])
           for g in n_by_g}

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = [_md5_u64("%d:%d" % (d, seed)) for d in df["doc_id"]]
        mask = [x < thr[g] for x, g in zip(h, df[group_col])]
        out = df.loc[mask]
        return pd.DataFrame({"doc_id": out["doc_id"].astype("int64"),
                             group_col: out[group_col]})

    return ds.map_batches(keep, batch_format="pandas")


def token_quantiles(sf_dir: str, qs=(0.25, 0.5, 0.9, 0.99)):
    """(lang, q_pct, n_tokens) — EXACT per-language quantiles of the
    document token-count distribution (the length profile that drives
    chunk/pack/filter thresholds), discrete percentile semantics
    (smallest value whose cumulative count reaches ceil(q·N) — DuckDB's
    ``quantile_disc``).

    Exact distributed quantiles without sorting the data: token counts
    live in a BOUNDED INTEGER domain, so a per-batch (lang, n) histogram
    is a lossless combiner — the shuffle carries histogram rows (at most
    |langs| × distinct lengths), never documents, and the per-language
    cumulative walk runs over that tiny frame. This is the 100 TB shape
    for any quantile over a discrete/quantized column; continuous
    doubles would quantize first (t-digest territory otherwise).
    """
    import math

    ds = _read_documents(sf_dir, columns=["lang", "text"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        n = (df["text"].str.count(" ") + 1).astype("int64")
        g = (pd.DataFrame({"lang": df["lang"], "n": n})
             .groupby(["lang", "n"], as_index=False).size())
        return pd.DataFrame({"lang": g["lang"], "n": g["n"].astype("int64"),
                             "cnt": g["size"].astype("int64")})

    def quant(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("n", as_index=False)["cnt"].sum()
             .sort_values("n").reset_index(drop=True))
        cum = g["cnt"].cumsum().to_numpy()
        vals = g["n"].to_numpy()
        total = int(cum[-1])
        rows = [(df["lang"].iloc[0], int(round(q * 100)),
                 int(vals[np.searchsorted(cum, math.ceil(q * total))]))
                for q in qs]
        return pd.DataFrame(rows, columns=["lang", "q_pct", "n_tokens"])

    return (ds.map_batches(hist, batch_format="pandas")
            .groupby("lang").map_groups(quant, batch_format="pandas"))


def distinct_token_kmv(sf_dir: str, k: int = 256):
    """(k_used, kth_hash, est_distinct) — corpus-wide distinct-token
    cardinality via a K-Minimum-Values sketch (Bar-Yossef et al. 2002):
    keep the ``k`` smallest 64-bit token hashes; the estimator is
    ``(k−1) · 2^64 // kth_smallest`` (exact count when fewer than ``k``
    distinct hashes exist).

    The sketch state is k·8 bytes regardless of corpus size — the
    per-batch combiner emits each batch's k smallest distinct-token
    hashes, the merge is "k smallest of the union" over ≤ k·n_batches
    rows on one tiny partition. Because the hash is the shared md5-u64
    (``textops.token_hash64``), the sketch is DETERMINISTIC and the SQL
    oracle replays it EXACTLY — an approximate operator with an exact
    correctness gate, not just an error-bound smoke test.
    """
    from .textops import token_hash64

    ds = _read_documents(sf_dir, columns=["text"])

    def kmin(df: pd.DataFrame) -> pd.DataFrame:
        toks = set()
        for t in df["text"]:
            toks.update(t.split(" "))
        hs = sorted(token_hash64(t) for t in toks)[:k]
        return pd.DataFrame({"h": pd.Series(hs, dtype="uint64")})

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        hs = np.unique(df["h"].to_numpy())[:k]
        kn = len(hs)
        kth = int(hs[-1])
        est = kn if kn < k else ((kn - 1) << 64) // kth
        return pd.DataFrame({"k_used": pd.Series([kn], dtype="int64"),
                             "kth_hash": [str(kth)],
                             "est_distinct": pd.Series([est],
                                                       dtype="int64")})

    return (ds.map_batches(kmin, batch_format="pandas")
            .repartition(1).map_batches(estimate, batch_format="pandas"))


def inverted_index(sf_dir: str, max_postings: int = 32,
                   num_partitions: Optional[int] = None):
    """(tok, df, doc_id) — the inverted index a search / RAG stack
    builds over the corpus: every token's exact document frequency plus
    its posting list CAPPED at the ``max_postings`` smallest doc_ids
    (deterministic truncation — the impact-ordering trick that keeps
    stopword rows bounded; df stays exact over ALL docs).

    Scale shape: per-batch distinct (doc, tok) explode is the combiner
    (a doc lives in exactly one batch, so partial dfs SUM exactly); the
    one exchange is keyed by ``hash(tok) % nparts`` — never by raw token
    (vocabulary is high-cardinality; the true per-token grouping happens
    vectorized inside the bucket). Posting rows entering the shuffle are
    already capped per batch, so a hot token ships ≤ cap·n_batches rows,
    not its full posting list.
    """
    nparts = num_partitions or _nparts()
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        d = pl.from_pandas(df[["doc_id", "text"]])
        ex = (d.with_columns(pl.col("text").str.split(" ").alias("t"))
              .drop("text").explode("t").unique(subset=["doc_id", "t"]))
        dfreq = ex.group_by("t").agg(pl.len().cast(pl.Int64).alias("n"))
        posts = (ex.sort("doc_id").group_by("t", maintain_order=True)
                 .head(max_postings))
        a = dfreq.rename({"t": "tok"}).to_pandas()
        a["doc_id"] = np.int64(-1)
        b = posts.rename({"t": "tok"}).to_pandas()
        b["n"] = np.int64(-1)
        out = pd.concat([a[["tok", "doc_id", "n"]],
                         b[["tok", "doc_id", "n"]]], ignore_index=True)
        out["part"] = (pd.util.hash_pandas_object(out["tok"], index=False)
                       % nparts).astype("int32")
        return out

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        dfreq = (df[df["n"] > 0].groupby("tok", as_index=False)["n"].sum()
                 .rename(columns={"n": "dfreq"}))
        posts = (df[df["n"] < 0].sort_values(["tok", "doc_id"])
                 .groupby("tok", sort=False).head(max_postings))
        m = posts.merge(dfreq, on="tok")
        return pd.DataFrame({"tok": m["tok"],
                             "df": m["dfreq"].astype("int64"),
                             "doc_id": m["doc_id"].astype("int64")})

    return (ds.map_batches(partials, batch_format="pandas")
            .groupby("part").map_groups(reduce, batch_format="pandas"))


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

def curate_corpus(sf_dir: str, threshold: float = 0.8, min_tokens: int = 20,
                  capacity: int = 256, num_shards: int = 16,
                  num_partitions: Optional[int] = None):
    """The end-to-end corpus-curation pipeline a pretraining run feeds
    on, composed from the individually-oracled stages:

    1. near-duplicate REMOVAL (token-set Jaccard ≥ ``threshold`` pair
       graph → connected components → min-survivor, ``near_dup_dedup``),
    2. benchmark DECONTAMINATION (drop the holdout docs and every
       training doc sharing a 5-gram with them, ``decontaminate``),
    3. quality filter (≥ ``min_tokens`` whitespace tokens),
    4. greedy sequence PACKING over the survivors (``pack_sequences``
       semantics, shard-local per (lang, doc_id % num_shards)).

    Returns (doc_id, lang, shard, seq_id). Exchange-minimal shape
    (ONE curate-level all-to-all — near_dup_dedup's internal exchanges
    now dominate; was 3, 11.8 s → ~6 s → remeasure at sf0.1/32):

    - contamination uses the BROADCAST plan (``decontaminate_broadcast``):
      the holdout's distinct-shingle set ships once via ``ray.put`` and
      each scan task flags its own docs in place — the exploded-shingle
      co-group exchange is gone entirely (set semantics, identical
      answer);
    - the verdict co-group is keyed by ``shard = doc_id % num_shards``
      (coarsened ``% nparts``) instead of a doc-id hash, so every
      ``(lang, shard)`` pack cell arrives COMPLETE in one group and the
      greedy packing fuses into the same exchange — no driver-side set,
      no second shuffle.

    The DuckDB oracle replays the whole composition in a single
    WITH RECURSIVE query.
    """
    import ray

    from .dedup import near_dup_dedup

    nparts = num_partitions or _nparts()

    surv = near_dup_dedup(sf_dir, threshold=threshold,
                          num_partitions=nparts)
    docs = _read_documents(sf_dir, columns=["doc_id", "lang", "text"])

    # contaminated flag computed in the scan against the broadcast
    # holdout shingle set — same semantics as decontaminate, zero
    # exchanges (see decontaminate_broadcast)
    bench_ref = ray.put(_bench_shingle_set(sf_dir, SHINGLE_K, BENCH_MOD,
                                           BENCH_REM))

    def doc_rows(df: pd.DataFrame) -> pd.DataFrame:
        bench = _bcast_get(bench_ref)
        dirty = []
        for text in df["text"]:
            toks = text.split(" ")
            dirty.append(
                len(toks) >= SHINGLE_K
                and any(" ".join(toks[i:i + SHINGLE_K]) in bench
                        for i in range(len(toks) - SHINGLE_K + 1)))
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "kind": np.int8(0),
            "lang": df["lang"],
            "n_tokens": (df["text"].str.count(" ") + 1).astype("int64"),
            "dirty": pd.Series(dirty, dtype="int8"),
        })

    def verdict_rows(kind: int, col: str = "doc_id"):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df[col].astype("int64"),
                "kind": np.int8(kind),
                "lang": "",
                "n_tokens": np.int64(0),
                "dirty": np.int8(0),
            })
        return fn

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # bucket = shard (coarsened): keeps each (lang, shard) cell whole
        return df.assign(
            bucket=((df["doc_id"] % num_shards) % nparts).astype("int32"))

    # the survivor verdict stream is tiny (KBs) but arrives as nparts
    # blocks; coalescing it keeps the sort exchange at ~nparts input
    # blocks instead of 2×nparts (native sort cost scales with
    # blocks_in × parts_out)
    u = (docs.map_batches(doc_rows, batch_format="pandas")
         .union(surv.map_batches(verdict_rows(1), batch_format="pandas")
                .repartition(8))
         .map_batches(add_bucket, batch_format="pandas"))

    def keep_and_pack(df: pd.DataFrame) -> pd.DataFrame:
        alive = set(df.loc[df["kind"] == 1, "doc_id"])
        d = df[df["kind"] == 0]
        d = d[d["doc_id"].isin(alive) & (d["dirty"] == 0)
              & (d["doc_id"] % BENCH_MOD != BENCH_REM)
              & (d["n_tokens"] >= min_tokens)]
        d = d.assign(shard=(d["doc_id"] % num_shards).astype("int64"))
        outs = []
        for (lang, shard), cell in d.groupby(["lang", "shard"], sort=False):
            cell = cell.sort_values("doc_id")
            seq = greedy_pack(cell["n_tokens"].to_numpy(), capacity)
            outs.append(pd.DataFrame({
                "doc_id": cell["doc_id"].astype("int64"),
                "lang": cell["lang"],
                "shard": cell["shard"].astype("int64"),
                "seq_id": seq}))
        if not outs:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "lang": pd.Series([], dtype="object"),
                                 "shard": pd.Series([], dtype="int64"),
                                 "seq_id": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    return u.groupby("bucket").map_groups(keep_and_pack,
                                          batch_format="pandas")


def chunk_documents(sf_dir: str, chunk_tokens: int = 64, overlap: int = 8):
    """(doc_id, chunk_id, n_tokens, chunk_text) — split every document
    into fixed-size token windows with overlap, the context-window
    chunking step between curation and tokenization (RAG indexing and
    long-doc pretraining both consume this shape).

    Chunk i covers whitespace tokens [i·stride, i·stride+chunk_tokens)
    with stride = chunk_tokens − overlap; a document shorter than one
    chunk yields exactly one chunk. Map-only (no shuffle, embarrassingly
    parallel); the DuckDB oracle replays the identical slicing with
    generate_series + list_slice.
    """
    stride = chunk_tokens - overlap
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def chunks(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, chunk_ids, n_toks, texts = [], [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = text.split(" ")
            n = len(toks)
            k = max(1, -(-(n - overlap) // stride))
            for i in range(k):
                start = i * stride
                end = min(start + chunk_tokens, n)
                doc_ids.append(doc_id)
                chunk_ids.append(i)
                n_toks.append(end - start)
                texts.append(" ".join(toks[start:end]))
        return pd.DataFrame({
            "doc_id": pd.Series(doc_ids, dtype="int64"),
            "chunk_id": pd.Series(chunk_ids, dtype="int64"),
            "n_tokens": pd.Series(n_toks, dtype="int64"),
            "chunk_text": pd.Series(texts, dtype="object"),
        })

    return ds.map_batches(chunks, batch_format="pandas")


def ccnet_buckets(sf_dir: str):
    """(doc_id, lang, ppl_q8, bucket) — CCNet-style quality
    partitioning (arXiv:1911.00359): score every document with the
    corpus unigram LM (``textops.unigram_lm_score`` semantics, identical
    integer-quantized weights), normalize to a PER-TOKEN score
    ``ppl_q8 = (lm_q20 · 256) // (n_tokens · 2^20)`` (integer floor
    division — bit-exact, bounded domain [0, 256]), and split each
    language into ``head`` (most target-like: above the per-lang 0.75
    discrete quantile), ``tail`` (at or below the 0.25 quantile) and
    ``middle``. Quartile cutpoints are dyadic on purpose: ``0.25·N`` is
    exactly representable, so the engine's ceil(q·N)-th-smallest walk
    and DuckDB's ``quantile_disc`` provably agree (CCNet's thirds would
    put ``0.33·N`` float rounding between the two engines).

    Scale shape: the LM weight table is the unigram broadcast-aggregate
    (vocabulary-sized shuffle, ``unigram_lm_score``'s pass 1); the
    scoring pass reads (doc_id, lang, text) directly so lang rides along
    for free — NO join exchange — and reduces the corpus to a
    3-column int table that is pinned once (at 10^10 docs ~300 GB,
    object-store spillable — pinning beats re-tokenizing the text a
    second time); the per-lang histogram combiner ships at most
    |langs|·257 rows per batch, the cumulative walk runs on the driver,
    and bucketing is a map over the pinned int table.
    """
    import math

    ds = _read_documents(sf_dir, columns=["doc_id", "lang", "text"])

    # pass 1: the identical vocabulary aggregate as unigram_lm_score
    # (same integer quantization, so ppl_q8 matches the shared oracle CTE)
    def local_counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].str.split(" ").explode().value_counts()
        return pd.DataFrame({"tok": vc.index.astype(str),
                             "n": vc.to_numpy(dtype="int64")})

    vocab = (ds.map_batches(local_counts, batch_format="pandas")
             .groupby("tok").sum("n").to_pandas())
    total = int(vocab["sum(n)"].sum())
    weights = {t: (int(n) * 1048576) // total
               for t, n in zip(vocab["tok"], vocab["sum(n)"])}

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        d = pl.from_pandas(df[["doc_id", "lang", "text"]])
        ex = (d.with_columns(pl.col("text").str.split(" ").alias("t"))
              .drop("text").explode("t")
              .with_columns(pl.col("t").replace_strict(
                  weights, default=0, return_dtype=pl.Int64).alias("q")))
        g = (ex.group_by(["doc_id", "lang"]).agg(
            pl.col("q").sum().cast(pl.Int64).alias("lm"),
            pl.len().cast(pl.Int64).alias("n")).to_pandas())
        s8 = (g["lm"].to_numpy(dtype="int64") * 256
              // (g["n"].to_numpy(dtype="int64") * 1048576))
        return pd.DataFrame({"doc_id": g["doc_id"].astype("int64"),
                             "lang": g["lang"],
                             "ppl_q8": pd.Series(s8, dtype="int64")})

    scored = ds.map_batches(score, batch_format="pandas").materialize()

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["lang", "ppl_q8"], as_index=False).size())
        return pd.DataFrame({"lang": g["lang"],
                             "v": g["ppl_q8"].astype("int64"),
                             "cnt": g["size"].astype("int64")})

    h = (scored.map_batches(hist, batch_format="pandas")
         .groupby(["lang", "v"]).sum("cnt").to_pandas())
    thresholds = {}
    for lang, g in h.groupby("lang"):
        g = g.sort_values("v")
        cum = g["sum(cnt)"].cumsum().to_numpy()
        vals = g["v"].to_numpy()
        total = int(cum[-1])
        t25 = int(vals[np.searchsorted(cum, math.ceil(0.25 * total))])
        t75 = int(vals[np.searchsorted(cum, math.ceil(0.75 * total))])
        thresholds[lang] = (t25, t75)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        t25 = df["lang"].map(lambda x: thresholds[x][0]).to_numpy()
        t75 = df["lang"].map(lambda x: thresholds[x][1]).to_numpy()
        v = df["ppl_q8"].to_numpy()
        bucket = np.where(v <= t25, "tail",
                          np.where(v > t75, "head", "middle"))
        out = df[["doc_id", "lang", "ppl_q8"]].copy()
        out["bucket"] = bucket
        return out

    return scored.map_batches(bucketize, batch_format="pandas")


def bm25_search(sf_dir: str, k: int = 10, n_queries: int = 16,
                bench_mod: int = BENCH_MOD, bench_rem: int = BENCH_REM):
    """(qid, rank, doc_id, score_q20) — BM25 top-``k`` retrieval, the
    query side of the search/RAG stack whose build side is
    ``inverted_index``: the first ``n_queries`` holdout documents
    (``doc_id % bench_mod == bench_rem``, ``doc_id < mod·n_queries``)
    are the queries (their distinct tokens), scored against every
    TRAINING document with BM25 (k1 = 1.25, b = 0.75 — dyadic constants
    so both engines hit the same float64 path).

    Per shared token: contrib = floor(2^20 · idf · (tf·(k1+1)) /
    (tf + k1·(1−b+b·dl/avgdl))) with idf = ln(1+(N−df+0.5)/(df+0.5));
    per (query, doc): the INT64 sum. Quantizing each term BEFORE the sum
    makes the score exact and order-independent; ln is the same libm
    call on both sides and every other op is an exactly-rounded float64
    ·/÷ of bit-matched operands (same guard discipline as
    ``dsir_weights``), so the SQL oracle hash-matches bit-for-bit.

    Scale shape: the query set is the small, FIXED side (bounded by
    ``n_queries``, never corpus-sized). Pass A aggregates df ONLY for
    the query vocabulary plus (N, Σdl) through a per-batch combiner —
    the exchange carries at most |qvocab|+1 rows per batch; the MB-sized
    (tok, qid, idf) table then rides each pass-B task's closure, where
    scoring is a map-only vectorized merge with a per-batch per-query
    top-k combiner; the final exchange groups the ≤ n_queries·k·n_batches
    partials by qid (bounded cardinality).
    """
    import math

    import pyarrow.parquet as pq

    q_max = bench_mod * n_queries
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    # the bounded query side, read driver-side (same rationale as
    # _bench_shingle_set: the query set is MBs against a 100 TB corpus)
    qdocs = pq.read_table(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"],
        filters=[("doc_id", "<", q_max)]).to_pandas()
    qdocs = qdocs[qdocs["doc_id"] % bench_mod == bench_rem]
    q_rows = [(int(qid), tok) for qid, text in zip(qdocs["doc_id"],
                                                   qdocs["text"])
              for tok in sorted(set(text.split(" ")))]
    qvocab = frozenset(t for _, t in q_rows)

    def df_partials(df: pd.DataFrame) -> pd.DataFrame:
        t = df[df["doc_id"] % bench_mod != bench_rem]
        cnt: dict = {}
        dl_sum = int((t["text"].str.count(" ") + 1).sum())
        for text in t["text"]:
            for tok in set(text.split(" ")) & qvocab:
                cnt[tok] = cnt.get(tok, 0) + 1
        out = pd.DataFrame({
            "tok": pd.Series(list(cnt) + [""], dtype="object"),
            "n": pd.Series(list(cnt.values()) + [len(t)], dtype="int64"),
            "dl": pd.Series([0] * len(cnt) + [dl_sum], dtype="int64"),
        })
        return out

    agg = (ds.map_batches(df_partials, batch_format="pandas")
           .groupby("tok").sum(["n", "dl"]).to_pandas())
    totals = agg[agg["tok"] == ""]
    n_docs = int(totals["sum(n)"].iloc[0])
    dl_tot = int(totals["sum(dl)"].iloc[0])
    assert n_docs < (1 << 52) and dl_tot < (1 << 53), "quantize first"
    avgdl = float(dl_tot) / float(n_docs)
    dfreq = {tok: int(n) for tok, n in zip(agg["tok"], agg["sum(n)"])
             if tok != ""}
    # (qid, tok, idf) — tokens absent from every training doc drop out
    # (df = 0 would still be well-defined, but the SQL joins on tf)
    qtab = pd.DataFrame(
        [(qid, tok,
          math.log(1.0 + (float(n_docs) - dfreq[tok] + 0.5)
                   / (dfreq[tok] + 0.5)))
         for qid, tok in q_rows if tok in dfreq],
        columns=["qid", "tok", "idf"])

    def score_batch(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        t = df[df["doc_id"] % bench_mod != bench_rem]
        d = pl.from_pandas(t[["doc_id", "text"]])
        ex = (d.with_columns(pl.col("text").str.split(" ").alias("t"))
              .with_columns(pl.col("t").list.len().cast(pl.Int64)
                            .alias("dl"))
              .drop("text").explode("t"))
        tf = (ex.group_by(["doc_id", "t"])
              .agg(pl.len().cast(pl.Int64).alias("tf"),
                   pl.col("dl").first().alias("dl"))
              .rename({"t": "tok"}).to_pandas())
        m = tf.merge(qtab, on="tok")
        if m.empty:
            return pd.DataFrame({
                "qid": pd.Series([], dtype="int64"),
                "doc_id": pd.Series([], dtype="int64"),
                "score_q20": pd.Series([], dtype="int64")})
        tfv = m["tf"].to_numpy(dtype="float64")
        dlv = m["dl"].to_numpy(dtype="float64")
        idf = m["idf"].to_numpy(dtype="float64")
        contrib = (idf * (tfv * 2.25)
                   / (tfv + 1.25 * (0.25 + 0.75 * (dlv / avgdl))))
        m["c"] = np.floor(1048576.0 * contrib).astype("int64")
        s = (m.groupby(["qid", "doc_id"], as_index=False)["c"].sum()
             .rename(columns={"c": "score_q20"}))
        # per-batch per-query top-k combiner: (qid, doc) pairs are
        # complete here (a doc lives in one batch), so pruning to the
        # k best per query is lossless
        s = (s.sort_values(["qid", "score_q20", "doc_id"],
                           ascending=[True, False, True])
             .groupby("qid", sort=False).head(k))
        return pd.DataFrame({
            "qid": s["qid"].to_numpy(dtype="int64"),
            "doc_id": s["doc_id"].to_numpy(dtype="int64"),
            "score_q20": s["score_q20"].to_numpy(dtype="int64")})

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        s = (df.sort_values(["score_q20", "doc_id"],
                            ascending=[False, True]).head(k))
        return pd.DataFrame({
            "qid": s["qid"].to_numpy(dtype="int64"),
            "rank": np.arange(1, len(s) + 1, dtype="int64"),
            "doc_id": s["doc_id"].to_numpy(dtype="int64"),
            "score_q20": s["score_q20"].to_numpy(dtype="int64")})

    return (ds.map_batches(score_batch, batch_format="pandas")
            .groupby("qid").map_groups(final_topk, batch_format="pandas"))


def rrf_fusion(sf_dir: str, k: int = 10, k_sparse: int = 10,
               k_dense: int = 5, rrf_k: int = 60, stride: int = 50,
               n_queries: int = 10):
    """(qid, rank, doc_id, rrf_q20) — hybrid retrieval by reciprocal-
    rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009): the sparse
    side is ``bm25_search`` over the query docs' tokens, the dense side
    ``knn_bruteforce`` over the same ids' embeddings, and each hit
    contributes 2^20 // (rrf_k + rank) — integer, so the fused scores
    and ranks are bit-exact in SQL with no float path at the fusion
    layer. Queries are doc_id % stride == 0, doc_id < stride·n_queries
    (the intersection convention of both sub-searches).

    Scale shape: both retrievals keep their own distributed plans; the
    fusion tail sees only their outputs — ≤ n_queries·(k_sparse+k_dense)
    rows, bounded by construction — so the per-qid group reduce is a
    fixed-size epilogue, never a corpus-sized shuffle.
    """
    from .simsearch import knn_bruteforce

    q_max = stride * n_queries
    sparse = bm25_search(sf_dir, k=k_sparse, n_queries=n_queries,
                         bench_mod=stride, bench_rem=0)
    dense = knn_bruteforce(sf_dir, stride=stride, k=k_dense)

    def sp_c(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "qid": df["qid"].astype("int64"),
            "doc_id": df["doc_id"].astype("int64"),
            "c": (1048576 // (rrf_k + df["rank"].astype("int64")))
            .astype("int64")})

    def de_c(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["query_id"] < q_max]
        return pd.DataFrame({
            "qid": d["query_id"].astype("int64"),
            "doc_id": d["neighbor_id"].astype("int64"),
            "c": (1048576 // (rrf_k + d["rank"].astype("int64")))
            .astype("int64")})

    fused = (sparse.map_batches(sp_c, batch_format="pandas")
             .union(dense.map_batches(de_c, batch_format="pandas")))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["qid", "doc_id"], as_index=False)["c"].sum()
        g = (g.sort_values(["c", "doc_id"], ascending=[False, True])
             .head(k).reset_index(drop=True))
        return pd.DataFrame({
            "qid": g["qid"].astype("int64"),
            "rank": pd.Series(range(1, len(g) + 1), dtype="int64"),
            "doc_id": g["doc_id"].astype("int64"),
            "rrf_q20": g["c"].astype("int64")})

    return fused.groupby("qid").map_groups(topk, batch_format="pandas")


def segment_dedup(sf_dir: str, seg_tokens: int = 16,
                  num_partitions: Optional[int] = None):
    """(doc_id, text, n_segments, n_removed) — exact duplicated-span
    REMOVAL with document REWRITING (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", arXiv:2107.06499, approximated
    at fixed token-segment granularity — the shape production pipelines
    use when a corpus-wide suffix array is infeasible). Every document
    is cut into consecutive ``seg_tokens``-token segments (the tail
    segment may be short); a segment whose content already occurred at a
    smaller ``(doc_id, seg_idx)`` anywhere in the corpus is removed, and
    each document is reassembled from its surviving segments (possibly
    down to the empty string). Unlike dedup_exact / near_dup_dedup
    (whole-document verdicts) and dup_ngram_stats (statistics only),
    this operator changes the text itself.

    Scale shape: two all-to-alls; document text crosses plasma exactly
    once. (1) segments explode to ``(h=md5-u64(segment), doc_id, sidx)``
    fixed-width rows bucketed by ``h % nparts`` — every occurrence of a
    segment lands in one partition, where a vectorized first-of-sorted
    pass picks the global keeper per hash and emits verdict rows ONLY
    for the duplicates (sparse on a clean corpus, never segment text);
    (2) verdicts co-group with the original documents on
    ``doc_id % nparts`` and each flagged document is re-split locally
    and rebuilt; unflagged documents pass through untouched. The DuckDB
    oracle replays the identical slicing (generate_series + list_slice),
    the identical u64 hash partitioning, and the identical
    ``row_number() ... ORDER BY doc_id, sidx`` keeper rule.
    """
    nparts = num_partitions or _nparts()
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def seg_rows(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, sidxs, hs = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = text.split(" ")
            nseg = (len(toks) + seg_tokens - 1) // seg_tokens
            for i in range(nseg):
                hs.append(_md5_u64(
                    " ".join(toks[i * seg_tokens:(i + 1) * seg_tokens])))
                doc_ids.append(doc_id)
                sidxs.append(i)
        out = pd.DataFrame({
            "h": pd.Series(hs, dtype="uint64"),
            "doc_id": pd.Series(doc_ids, dtype="int64"),
            "sidx": pd.Series(sidxs, dtype="int64"),
        })
        out["part"] = (out["h"] % np.uint64(nparts)).astype("int32")
        return out

    def dup_verdicts(df: pd.DataFrame) -> pd.DataFrame:
        # global keeper per h = min (doc_id, sidx); everything else in
        # the hash's partition-complete group is a duplicate
        df = df.sort_values(["h", "doc_id", "sidx"], kind="mergesort")
        dups = df[df["h"].duplicated()]
        return pd.DataFrame({
            "doc_id": dups["doc_id"].astype("int64"),
            "sidx": dups["sidx"].astype("int64"),
            "text": "",
            "kind": np.int8(1),
            "part2": (dups["doc_id"] % nparts).astype("int32"),
        })

    verdicts = (ds.map_batches(seg_rows, batch_format="pandas")
                .groupby("part")
                .map_groups(dup_verdicts, batch_format="pandas"))

    def doc_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "sidx": np.int64(-1),
            "text": df["text"],
            "kind": np.int8(0),
            "part2": (df["doc_id"] % nparts).astype("int32"),
        })

    docs = ds.map_batches(doc_side, batch_format="pandas")

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["kind"] == 0]
        drop_map: dict = {}
        for doc_id, sidx in zip(df.loc[df["kind"] == 1, "doc_id"],
                                df.loc[df["kind"] == 1, "sidx"]):
            drop_map.setdefault(doc_id, set()).add(sidx)
        texts, nsegs, nrem = [], [], []
        for doc_id, text in zip(d["doc_id"], d["text"]):
            toks = text.split(" ")
            nseg = (len(toks) + seg_tokens - 1) // seg_tokens
            nsegs.append(nseg)
            dropped = drop_map.get(doc_id)
            if not dropped:
                texts.append(text)
                nrem.append(0)
                continue
            texts.append(" ".join(
                " ".join(toks[i * seg_tokens:(i + 1) * seg_tokens])
                for i in range(nseg) if i not in dropped))
            nrem.append(len(dropped))
        return pd.DataFrame({
            "doc_id": d["doc_id"].to_numpy(dtype="int64"),
            "text": pd.Series(texts, dtype="object"),
            "n_segments": pd.Series(nsegs, dtype="int64"),
            "n_removed": pd.Series(nrem, dtype="int64"),
        })

    return (docs.union(verdicts).groupby("part2")
            .map_groups(rebuild, batch_format="pandas"))


def greedy_pack(n_tokens: np.ndarray, capacity: int) -> np.ndarray:
    """The greedy reset-cumsum: 1-based sequence id per document, new
    sequence when adding the doc would exceed ``capacity`` (an oversized
    doc occupies a sequence alone). Kept as a module-level kernel so the
    property tests and the recursive-CTE oracle pin the identical walk."""
    seq = np.empty(len(n_tokens), dtype=np.int64)
    acc, cur = 0, 1
    for i, tokens in enumerate(n_tokens):
        if acc + tokens > capacity and acc > 0:
            cur += 1
            acc = 0
        acc += tokens
        seq[i] = cur
    return seq


def pack_sequences(sf_dir: str, capacity: int = 256, num_shards: int = 16):
    """(doc_id, lang, shard, seq_id) — greedy token-budget packing:
    within each (lang, shard) group, walk docs in doc_id order and start
    a new sequence whenever adding the doc would exceed ``capacity``
    whitespace tokens (a doc longer than capacity gets a sequence of its
    own). ``shard = doc_id % num_shards``.

    Packing is inherently sequential, so the op is defined SHARD-LOCAL —
    the standard trick that makes it embarrassingly parallel: one Ray
    group per (lang, shard) cell (bounded cardinality: langs ×
    num_shards), a vectorized token count in the map stage, and an O(n)
    walk over two numpy arrays inside the cell. The same (lang, shard)
    definition is mirrored in the oracle's recursive CTE.
    """
    ds = _read_documents(sf_dir, columns=["doc_id", "lang", "text"])

    def add_keys(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "lang": df["lang"],
            "shard": (df["doc_id"] % num_shards).astype("int64"),
            "n_tokens": (df["text"].str.count(" ") + 1).astype("int64"),
        })

    def pack_cell(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id")
        seq = greedy_pack(df["n_tokens"].to_numpy(), capacity)
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "lang": df["lang"],
                             "shard": df["shard"].astype("int64"),
                             "seq_id": seq})

    keyed = ds.map_batches(add_keys, batch_format="pandas")
    return keyed.groupby(["lang", "shard"]).map_groups(
        pack_cell, batch_format="pandas")


# ---------------------------------------------------------------------------
# Frequency / cardinality sketches (Count-Min, HyperLogLog)
# ---------------------------------------------------------------------------


def heavy_hitters(sf_dir: str, threshold_permille: int = 34,
                  depth: int = 4, width: int = 1024):
    """(tok, est) — corpus heavy hitters via a Count-Min sketch (Cormode
    & Muthukrishnan 2005): tokens whose CMS frequency ESTIMATE is at
    least ``ceil(threshold_permille/1000)`` of the total token count.

    The canonical two-pass CMS heavy-hitter plan:

    - pass 1 builds the sketch: each batch's combiner emits at most
      ``depth × width`` (row, col, cnt) cells plus one total-count cell,
      so the shuffle carries sketch cells, never token occurrences; the
      merge is an order-independent integer hash aggregate. The finished
      sketch is ``depth·width·8`` bytes REGARDLESS of corpus size.
    - pass 2 broadcasts the sketch (closure capture — ~32 KB) back over
      the corpus: per batch, DISTINCT tokens get a vectorized
      min-over-rows estimate, only candidates with ``est ≥ T`` survive,
      and a tiny groupby dedups candidates across batches.

    CMS guarantees est ≥ true count, so every true heavy hitter is
    reported (recall 1.0); over-threshold false positives from cell
    collisions are possible but DETERMINISTIC (md5 row hashes), which is
    what lets the SQL oracle replay the sketch — and its collisions —
    bit-for-bit. Threshold is integer arithmetic (``(N·p + 999) //
    1000``) so engine and oracle can never diverge on a float ceil.
    """
    ds = _read_documents(sf_dir, columns=["text"])
    from .textops import token_hash64

    def cell_cols(tok: str) -> list:
        return [_md5_u64("%d:%s" % (r, tok)) % width for r in range(depth)]

    def sketch_cells(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].str.split(" ").explode().value_counts()
        rows, cols, cnts = [], [], []
        for tok, c in vc.items():
            for r, col in enumerate(cell_cols(tok)):
                rows.append(r)
                cols.append(col)
                cnts.append(int(c))
        rows.append(-1)
        cols.append(0)
        cnts.append(int(vc.sum()))
        out = (pd.DataFrame({"r": rows, "c": cols, "cnt": cnts})
               .groupby(["r", "c"], as_index=False)["cnt"].sum())
        return pd.DataFrame({"r": out["r"].astype("int64"),
                             "c": out["c"].astype("int64"),
                             "cnt": out["cnt"].astype("int64")})

    cells = (ds.map_batches(sketch_cells, batch_format="pandas")
             .groupby(["r", "c"]).sum("cnt").to_pandas())
    total = int(cells.loc[cells["r"] == -1, "sum(cnt)"].iloc[0])
    sketch = np.zeros((depth, width), dtype=np.int64)
    body = cells[cells["r"] >= 0]
    sketch[body["r"].to_numpy(), body["c"].to_numpy()] = (
        body["sum(cnt)"].to_numpy())
    thresh = (total * threshold_permille + 999) // 1000

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        toks = set()
        for t in df["text"]:
            toks.update(t.split(" "))
        toks = sorted(toks)
        ests = [int(min(sketch[r, col]
                        for r, col in enumerate(cell_cols(t))))
                for t in toks]
        out = pd.DataFrame({"tok": pd.Series(toks, dtype="object"),
                            "est": pd.Series(ests, dtype="int64")})
        return out[out["est"] >= thresh]

    return (ds.map_batches(candidates, batch_format="pandas")
            .groupby("tok").max("est")
            .map_batches(lambda df: df.rename(columns={"max(est)": "est"}),
                         batch_format="pandas"))


def _hll_estimate(regs, m: int):
    """(est, zero_registers) — the HLL estimator in EXACT arithmetic:
    harmonic sum as Σ 2^(64−M_j) over Python bigints, α_m as the
    rational 7213·256000/(10⁴·257079), one floor division; the
    small-range branch (raw est ≤ 5m/2 with empty registers) is linear
    counting ``floor(m·ln(m/V))`` on the shared libm ln. Mirrored
    line-for-line by the SQL oracle (queries.DOC_ORACLES['hll_distinct'])."""
    import math

    s = sum(1 << (64 - int(r)) for r in regs)
    est = (7213 * 256000 * m * m << 64) // (10000 * 257079 * s)
    zeros = int(sum(1 for r in regs if r == 0))
    if est * 2 <= 5 * m and zeros > 0:
        est = int(math.floor(m * math.log(m / zeros)))
    return est, zeros


def hll_distinct(sf_dir: str, shingle_k: int = 3, p: int = 8):
    """(m, zero_registers, est_distinct) — distinct-shingle cardinality
    via HyperLogLog (Flajolet et al. 2007) with ``m = 2^p`` registers.

    Register state is ``m`` bytes regardless of corpus size and merges
    by ELEMENTWISE MAX — the property that makes HLL the sketch of
    choice for distributed distinct counts: each batch's combiner emits
    its local register maxima (≤ m rows), the reduce is one tiny
    ``groupby(j).max()``. The estimator runs in EXACT integer
    arithmetic: the harmonic sum is computed as ``Σ 2^(64−M_j)``
    (dyadic terms scaled by 2^64, exact in Python bigints and DuckDB
    HUGEINT) and the bias constant α_m = 0.7213/(1+1.079/m) as the
    rational (7213·256000)/(10⁴·257079), so the raw estimate is one
    floor division both engine- and oracle-side. The small-range branch
    (est ≤ 5m/2 with empty registers → linear counting ``m·ln(m/V)``)
    uses the shared libm ln on an exactly-rounded m/V, then floors —
    bit-equal in DuckDB. Hashes are the shared md5-u64 over
    space-joined ``shingle_k``-grams, so the sketch — an approximation —
    still carries an EXACT oracle (same trick as distinct_token_kmv).
    """
    from .textops import token_hash64

    m = 1 << p
    ds = _read_documents(sf_dir, columns=["text"])

    def registers(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        # vectorized shingle construction + per-batch DEDUP before
        # hashing: register maxima only depend on the distinct shingle
        # set, and the templated-corpus ratio is ~10:1 instances per
        # distinct — the md5 walk runs once per distinct shingle
        g = (pl.from_pandas(df[["text"]])
             .with_columns(pl.col("text").str.split(" ").alias("t"))
             .with_row_index("r")
             .explode("t"))
        shifted = [pl.col("t").shift(-o).over("r").alias("t%d" % o)
                   for o in range(1, shingle_k)]
        names = ["t"] + ["t%d" % o for o in range(1, shingle_k)]
        sh = (g.with_columns(shifted)
              .drop_nulls(names[1:])
              .select(pl.concat_str([pl.col(c) for c in names],
                                    separator=" ").alias("s"))
              .unique()["s"].to_list())
        regs = np.zeros(m, dtype=np.int64)
        for sgl in sh:
            h = token_hash64(sgl)
            j = h >> (64 - p)
            v = h & ((1 << (64 - p)) - 1)
            rho = (64 - p) - v.bit_length() + 1
            if rho > regs[j]:
                regs[j] = rho
        return pd.DataFrame({"j": np.arange(m, dtype=np.int64),
                             "rho": regs})

    merged = (ds.map_batches(registers, batch_format="pandas")
              .groupby("j").max("rho").to_pandas())
    regs = np.zeros(m, dtype=np.int64)
    regs[merged["j"].to_numpy()] = merged["max(rho)"].to_numpy()

    est, zeros = _hll_estimate(regs, m)
    return pd.DataFrame({"m": pd.Series([m], dtype="int64"),
                         "zero_registers": pd.Series([zeros],
                                                     dtype="int64"),
                         "est_distinct": pd.Series([est], dtype="int64")})


# ---------------------------------------------------------------------------
# Training-shard assembly (deterministic global shuffle)
# ---------------------------------------------------------------------------


def shard_corpus(sf_dir: str, shard_size: int = 100, seed: int = 42):
    """(doc_id, shard, pos) — the deterministic global shuffle every
    pretraining run needs before writing token shards: documents are
    ordered by ``md5(seed:doc_id)`` (ties by doc_id) and cut into
    fixed-size shards of ``shard_size`` docs, ``pos`` being the
    document's slot within its shard.

    Global RANK without a global sort materialization — the counting-
    sort offset pattern: the md5 key's top byte routes each doc to one
    of 256 key-range buckets; pass 1 is a tiny per-batch bucket-count
    combiner (≤256 rows/batch) whose cumulative sums give every
    bucket's global rank offset (driver-side, 256 rows); pass 2 is ONE
    bucket co-group that sorts locally and adds the broadcast offset.
    Each reduce task holds one key range — at 100 TB it would write its
    own shard files right there (the exchange.py write-in-reduce
    shape), and buckets are balanced by construction because md5 keys
    are uniform. Oracle: ``row_number() OVER (ORDER BY key, doc_id)``.
    """
    ds = _read_documents(sf_dir, columns=["doc_id"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        keys = np.array([_md5_u64("%d:%d" % (seed, d))
                         for d in df["doc_id"]], dtype=np.uint64)
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "key": keys,
                             "bucket": (keys >> np.uint64(56)).astype(
                                 "int64")})

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["bucket"].value_counts()
        return pd.DataFrame({"bucket": vc.index.astype("int64"),
                             "n": vc.values.astype("int64")})

    with_key = ds.map_batches(keyed, batch_format="pandas")
    counts = (with_key.map_batches(bucket_counts, batch_format="pandas")
              .groupby("bucket").sum("n").to_pandas()
              .sort_values("bucket"))
    offsets = np.zeros(256, dtype=np.int64)
    b = counts["bucket"].to_numpy()
    n = counts["sum(n)"].to_numpy()
    cum = np.concatenate([[0], np.cumsum(n)[:-1]])
    offsets[b] = cum

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["key", "doc_id"])
        rk = offsets[int(df["bucket"].iloc[0])] + np.arange(len(df))
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "shard": (rk // shard_size).astype("int64"),
                             "pos": (rk % shard_size).astype("int64")})

    return with_key.groupby("bucket").map_groups(
        rank_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al. 2016, arXiv:1508.07909)
# ---------------------------------------------------------------------------


def _bpe_apply(word: str, merges) -> list:
    """Greedy left-to-right application of ``merges`` (in order) to the
    character sequence of ``word`` — the reference BPE semantics
    (non-overlapping, leftmost-first, identical to regex replace of
    'a b'→'ab' and to the SQL oracle's recursive walk)."""
    seq = list(word)
    for a, b in merges:
        out, i, n = [], 0, len(seq)
        while i < n:
            if i < n - 1 and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def bpe_train(sf_dir: str, num_merges: int = 4,
              small_vocab_threshold: int = 2_000_000):
    """(rnd, l, r, freq) — the first ``num_merges`` BPE merge rules
    learned from the corpus (Sennrich et al. 2016): per round, the most
    frequent adjacent symbol pair across the word vocabulary (weighted
    by word frequency, ties to the lexicographically smallest pair),
    then merged greedily left-to-right in every word.

    The 100 TB shape mirrors how production tokenizer trainers work:
    the CORPUS is read exactly once, collapsed into a word-frequency
    vocabulary by a per-batch value_counts combiner + hash aggregate
    (the shuffle carries vocabulary rows, never token occurrences).
    Every merge round then runs over the materialized VOCABULARY
    dataset only: a map-only pair-count combiner (current merge list —
    K tiny rows — broadcast via closure; per-batch partial counts), a
    small pair hash aggregate, and a per-batch top-1 combiner so the
    driver picks the argmax from ≤ n_batches candidate rows. Nothing
    corpus-sized moves after pass 1.

    Oracle: the full replay — vocabulary CTE, per-round pair counts,
    argmax with the same tie rule, and a recursive-CTE greedy
    left-to-right merge walk per round (pinned equivalent to
    ``_bpe_apply`` by the probe in tests).
    """
    ds = _read_documents(sf_dir, columns=["text"])

    def wcounts(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].str.split(" ").explode().value_counts()
        return pd.DataFrame({"word": vc.index.astype(str),
                             "freq": vc.values.astype("int64")})

    vocab = (ds.map_batches(wcounts, batch_format="pandas")
             .groupby("word").sum("freq")
             .map_batches(lambda df: df.rename(
                 columns={"sum(freq)": "freq"}), batch_format="pandas")
             .materialize())

    # vocabulary gate (the perceptron_langid pattern): the corpus pass
    # above is distributed regardless; the merge ROUNDS only touch the
    # vocabulary, and below ~2M distinct words each round's 3-stage Ray
    # pipeline is pure orchestration. Same pair-count arithmetic and
    # (cnt DESC, l, r) tie rule — gate==distributed pinned by test.
    vdf = (vocab.to_pandas()
           if vocab.count() < small_vocab_threshold else None)

    merges = []
    for rnd in range(num_merges):
        cur = [(a, b) for a, b, _ in merges]

        def pair_counts(df: pd.DataFrame, _m=cur) -> pd.DataFrame:
            agg = {}
            for word, freq in zip(df["word"], df["freq"]):
                seq = _bpe_apply(word, _m)
                for i in range(len(seq) - 1):
                    k = (seq[i], seq[i + 1])
                    agg[k] = agg.get(k, 0) + int(freq)
            ls = [k[0] for k in agg]
            rs = [k[1] for k in agg]
            return pd.DataFrame({"l": pd.Series(ls, dtype="string"),
                                 "r": pd.Series(rs, dtype="string"),
                                 "cnt": pd.Series(list(agg.values()),
                                                  dtype="int64")})

        def local_top1(df: pd.DataFrame) -> pd.DataFrame:
            df = df.rename(columns={"sum(cnt)": "cnt"})
            df = df.sort_values(["cnt", "l", "r"],
                                ascending=[False, True, True])
            return df.head(1)

        if vdf is not None:
            tops = (pair_counts(vdf)
                    .groupby(["l", "r"], as_index=False)["cnt"].sum())
        else:
            tops = (vocab.map_batches(pair_counts, batch_format="pandas")
                    .groupby(["l", "r"]).sum("cnt")
                    .map_batches(local_top1, batch_format="pandas")
                    .to_pandas())
        tops = tops.sort_values(["cnt", "l", "r"],
                                ascending=[False, True, True])
        best = tops.iloc[0]
        merges.append((str(best["l"]), str(best["r"]), int(best["cnt"])))

    return pd.DataFrame({
        "rnd": pd.Series(range(1, num_merges + 1), dtype="int64"),
        "l": [m[0] for m in merges],
        "r": [m[1] for m in merges],
        "freq": pd.Series([m[2] for m in merges], dtype="int64"),
    })


def bpe_encode(sf_dir: str, num_merges: int = 4):
    """(doc_id, n_words, n_bpe_tokens) — tokenize the corpus with the
    BPE merge table trained by ``bpe_train`` on the same corpus: every
    word's final symbol count after applying all ``num_merges`` merges
    greedily left-to-right, summed per document.

    Train-then-apply is the production tokenizer shape: training runs
    over the vocabulary (see bpe_train), then the K-row merge table is
    broadcast via closure into ONE map-only encoding pass over the
    corpus — no shuffle at all in the apply stage, and a per-worker
    word→length cache amortizes the merge walk to once per distinct
    word. Oracle: the shared unrolled merge chain applied through the
    last merge, joined to each document's words.
    """
    trained = bpe_train(sf_dir, num_merges=num_merges)
    merges = list(zip(trained["l"], trained["r"]))
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def encode(df: pd.DataFrame, _cache={}) -> pd.DataFrame:
        def wlen(w: str) -> int:
            n = _cache.get(w)
            if n is None:
                n = len(_bpe_apply(w, merges))
                _cache[w] = n
            return n

        toks = df["text"].str.split(" ")
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_words": toks.str.len().astype("int64"),
            "n_bpe_tokens": toks.map(
                lambda ws: sum(wlen(w) for w in ws)).astype("int64"),
        })

    return ds.map_batches(encode, batch_format="pandas")


def decontaminate_bloom(sf_dir: str, shingle_k: int = SHINGLE_K,
                        bench_mod: int = BENCH_MOD,
                        bench_rem: int = BENCH_REM,
                        m_bits: int = 1 << 16, n_hashes: int = 2):
    """(doc_id, n_bloom_hits) — benchmark decontamination through a
    BLOOM FILTER of the holdout's shingles: the constant-memory plan for
    when even the distinct holdout-shingle SET is too big to broadcast
    (the bit array is ``m_bits/8`` bytes — here 8 KB — independent of
    shingle count; a 10⁹-shingle holdout at 1% FP is ~1.2 GB of bits vs
    ~50 GB of strings).

    Same zero-all-to-all shape as decontaminate_broadcast: the packed
    bit array ships once via ``ray.put`` into a per-worker cache and
    every flag is computed in the scan. Bloom false positives — the
    plan's only approximation — are DETERMINISTIC (md5 bit positions),
    so the SQL oracle replays the filter, including its FPs, exactly:
    ``n_bloom_hits ≥ n_shared_shingles`` per doc, with equality unless a
    non-holdout shingle collides on all ``n_hashes`` positions.
    """
    import ray

    bench = _bench_shingle_set(sf_dir, shingle_k, bench_mod, bench_rem)
    bits = np.zeros(m_bits, dtype=bool)
    for s in bench:
        for h in range(n_hashes):
            bits[_md5_u64("%d:%s" % (h, s)) % m_bits] = True
    ref = ray.put(np.packbits(bits))
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def count_hits(df: pd.DataFrame) -> pd.DataFrame:
        b = np.unpackbits(_bcast_get(ref)).astype(bool)
        t = df[df["doc_id"] % bench_mod != bench_rem]
        ids, hits = [], []
        for doc_id, text in zip(t["doc_id"], t["text"]):
            toks = text.split(" ")
            if len(toks) < shingle_k:
                continue
            sh = {" ".join(toks[i:i + shingle_k])
                  for i in range(len(toks) - shingle_k + 1)}
            n = sum(1 for s in sh
                    if all(b[_md5_u64("%d:%s" % (h, s)) % m_bits]
                           for h in range(n_hashes)))
            if n:
                ids.append(int(doc_id))
                hits.append(n)
        return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                             "n_bloom_hits": pd.Series(hits,
                                                       dtype="int64")})

    return ds.map_batches(count_hits, batch_format="pandas")


def hll_user_counts(sf_dir: str, p: int = 8):
    """(event_type, m, zero_registers, est_distinct) — distinct USERS
    per event type via per-group HyperLogLog registers: the
    sketch-as-GROUPED-aggregate pattern (one COUNT(DISTINCT …) GROUP BY
    at 100 TB without shuffling user ids — the classic analytics
    rollup). State per group is m bytes; the per-batch combiner emits
    local (event_type, register) maxima (≤ |types|·m rows per batch),
    the reduce is one tiny two-key ``groupby(type, j).max()``, and the
    exact-integer estimator (``_hll_estimate``, same harmonic-sum /
    linear-counting branches and md5-u64 hash as ``hll_distinct``)
    replays per group on the merged register table — so the
    approximation itself carries an exact SQL oracle.
    """
    import ray.data

    from .textops import token_hash64

    m = 1 << p
    ds = _bread("%s/events.parquet" % sf_dir,
                               columns=["event_type", "user_id"])
    # exact integer bit_length for 56-bit tails: float log2 would round
    # values ≥ 2^53 and misplace rho by one
    pows = (np.uint64(1) << np.arange(0, 64 - p,
                                      dtype=np.uint64)).astype(np.uint64)

    def registers(df: pd.DataFrame) -> pd.DataFrame:
        hs = np.array([token_hash64(str(int(u))) for u in df["user_id"]],
                      dtype=np.uint64)
        j = (hs >> np.uint64(64 - p)).astype(np.int64)
        v = hs & np.uint64((1 << (64 - p)) - 1)
        bitlen = np.searchsorted(pows, v, side="right")
        rho = (64 - p) - bitlen + 1
        t = pd.DataFrame({"event_type": df["event_type"].astype(str),
                          "j": j, "rho": rho.astype("int64")})
        g = t.groupby(["event_type", "j"], as_index=False)["rho"].max()
        # bucketed co-group reduce on hash(event_type): Ray's native
        # multi-key sort aggregate measured 14 s where this exchange
        # takes ~1 s at sf0.1/32
        g["bucket"] = (pd.util.hash_pandas_object(
            g["event_type"], index=False) % 16).astype("int32")
        return g

    def merge_regs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "j"], as_index=False)["rho"].max()
        return g[["event_type", "j", "rho"]]

    merged = (ds.map_batches(registers, batch_format="pandas")
              .groupby("bucket").map_groups(merge_regs,
                                            batch_format="pandas")
              .to_pandas())

    rows = []
    for et, g in merged.groupby("event_type"):
        regs = np.zeros(m, dtype=np.int64)
        regs[g["j"].to_numpy(dtype="int64")] = \
            g["rho"].to_numpy(dtype="int64")
        est, zeros = _hll_estimate(regs, m)
        rows.append((et, m, zeros, est))
    out = pd.DataFrame(rows, columns=["event_type", "m",
                                      "zero_registers", "est_distinct"])
    for c in ("m", "zero_registers", "est_distinct"):
        out[c] = out[c].astype("int64")
    return out


def _hash_embed(texts, dim: int = 16):
    """Feature-hashing chunk embedding (Weinberger et al. 2009, the
    hashing trick): e_j = Σ_tokens sign(h)·[h mod dim = j] over md5-u64
    token hashes, sign from bit ⌈log2 dim⌉ — ALL integer, so dot-product
    scores are exact and SQL-replayable. Returns int64 (n, dim)."""
    from .textops import token_hash64

    out = np.zeros((len(texts), dim), dtype=np.int64)
    for r, t in enumerate(texts):
        for tok in t.split(" "):
            h = token_hash64(tok)
            j = h % dim
            out[r, j] += 1 if (h // dim) % 2 == 0 else -1
    return out


def hash_embed_retrieval(sf_dir: str, dim: int = 16, k: int = 5,
                         query_mod: int = 97, chunk_tokens: int = 64,
                         overlap: int = 8):
    """(q_doc, q_chunk, n_doc, n_chunk, dot, rank) — the composed RAG
    retrieval stack with NO pretrained model: chunk every document
    (``chunk_documents`` semantics), embed each chunk with the integer
    feature-hashing trick (``_hash_embed`` — token md5-u64 → signed
    count in bucket h mod dim), and retrieve the top-``k`` most similar
    OTHER-document chunks for every chunk of the query docs
    (doc_id % ``query_mod`` = 0) by exact integer dot product. Because
    embeddings and scores are integers end-to-end, the whole pipeline —
    chunking, featurization, retrieval ranking — carries one exact SQL
    oracle (no float tree to mirror at all).

    Scale shape: chunking + embedding are MAP-ONLY (chunks never leave
    the batch that created them); the bounded query matrix broadcasts
    once via ``ray.put`` into the per-worker cache; scoring is one
    vectorized int matmul per batch with a per-batch per-query top-k
    combiner, so the only exchange is the final ≤ n_queries·k·n_batches
    partial-row reduce (the bm25_search shape).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data

    stride = chunk_tokens - overlap

    def chunk_frame(doc_ids, texts) -> pd.DataFrame:
        d_out, c_out, t_out = [], [], []
        for doc_id, text in zip(doc_ids, texts):
            toks = text.split(" ")
            n = len(toks)
            kk = max(1, -(-(n - overlap) // stride))
            for i in range(kk):
                start = i * stride
                end = min(start + chunk_tokens, n)
                d_out.append(int(doc_id))
                c_out.append(i)
                t_out.append(" ".join(toks[start:end]))
        return pd.DataFrame({"doc_id": pd.Series(d_out, dtype="int64"),
                             "chunk_id": pd.Series(c_out, dtype="int64"),
                             "chunk_text": t_out})

    # bounded query side: chunks + embeddings of the query docs, built
    # driver-side from a pruned read and broadcast once
    tbl = pq.read_table("%s/documents.parquet" % sf_dir,
                        columns=["doc_id", "text"])
    ids = np.asarray(tbl.column("doc_id"))
    mask = ids % query_mod == 0
    qchunks = chunk_frame(ids[mask],
                          np.asarray(tbl.column("text"))[mask])
    Q = _hash_embed(qchunks["chunk_text"].tolist(), dim)
    q_ref = ray.put((qchunks["doc_id"].to_numpy(dtype="int64"),
                     qchunks["chunk_id"].to_numpy(dtype="int64"), Q))

    ds = _bread("%s/documents.parquet" % sf_dir,
                               columns=["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        qd, qc, Qm = _bcast_get(q_ref)
        ch = chunk_frame(df["doc_id"].to_numpy(),
                         df["text"].to_numpy())
        E = _hash_embed(ch["chunk_text"].tolist(), dim)
        dots = Qm @ E.T  # (n_queries, n_chunks) exact int64
        cd = ch["doc_id"].to_numpy()
        cc = ch["chunk_id"].to_numpy()
        rows = []
        for qi in range(len(qd)):
            valid = cd != qd[qi]
            if not valid.any():
                continue
            row = dots[qi]
            k2 = min(k, int(valid.sum()))
            cand = np.flatnonzero(valid)
            # partial top-k with the exact final tie rule
            order = np.lexsort((cc[cand], cd[cand], -row[cand]))
            pick = cand[order[:k2]]
            for j in pick:
                rows.append((qd[qi], qc[qi], cd[j], cc[j], row[j]))
        return pd.DataFrame(rows, columns=["q_doc", "q_chunk", "n_doc",
                                           "n_chunk", "dot"]) \
            .astype("int64")

    partial = ds.map_batches(score, batch_format="pandas")

    nparts = max(4, int(ray.cluster_resources().get("CPU", 8)))

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        key = df["q_doc"] * 1000003 + df["q_chunk"]
        return df.assign(bucket=(pd.util.hash_pandas_object(
            key, index=False) % nparts).astype("int32"))

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby(["q_doc", "q_chunk"], sort=False):
            g = g.sort_values(["dot", "n_doc", "n_chunk"],
                              ascending=[False, True, True]).head(k)
            g = g.assign(rank=pd.Series(range(1, len(g) + 1),
                                        dtype="int64", index=g.index))
            out.append(g[["q_doc", "q_chunk", "n_doc", "n_chunk",
                          "dot", "rank"]])
        if not out:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ["q_doc", "q_chunk", "n_doc",
                                           "n_chunk", "dot", "rank"]})
        return pd.concat(out, ignore_index=True)

    return (partial.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(reduce_bucket,
                                          batch_format="pandas"))


def naive_bayes_langid(sf_dir: str, q: int = 10**6,
                       num_partitions=None):
    """(doc_id, nb_pred) — multinomial Naive Bayes language ID: TRAIN
    on the even-doc_id split (Laplace-smoothed per-(lang, token)
    counts, per-lang totals, doc priors), BROADCAST the
    vocabulary-sized model once via ``ray.put``, and SCORE the odd
    split map-side — the canonical "model fits, data doesn't"
    train/apply pattern.

    Scoring is engine-portable integers: every log is
    ``floor(q·math.log(integer))`` — Python ``math.log`` and DuckDB
    ``ln`` are the same libm call on identical integer-valued doubles
    (the dsir_weights precedent), so
    score(c) = qln(n_docs_c) + Σ_t n_t·qln(cnt_{t,c}+1)
             − N_doc·qln(tot_c+V)
    is bit-identical in both engines; argmax ties break to the
    lexicographically smallest lang in both.

    Scale shape: training is one combiner-fed hash(token) co-group
    (the exchange carries (lang, token) vocabulary rows, never token
    occurrences); priors/totals reduce from per-batch scalars; the
    apply pass is map-only against the per-worker cached model matrix
    with a vectorized explode → index-lookup → per-doc matrix sum.
    """
    import math

    import numpy as np
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    docs = _bread("%s/documents.parquet" % sf_dir,
                                 columns=["doc_id", "text", "lang"])

    def train_partials(df: pd.DataFrame) -> pd.DataFrame:
        tr = df[df["doc_id"] % 2 == 0]
        e = (pd.DataFrame({"lang": tr["lang"].astype(str),
                           "tok": tr["text"].str.split(" ")})
             .explode("tok"))
        g = e.groupby(["lang", "tok"], as_index=False).size()
        return pd.DataFrame({
            "lang": g["lang"], "tok": g["tok"].astype(str),
            "n": g["size"].astype("int64"),
            "bucket": (pd.util.hash_pandas_object(g["tok"], index=False)
                       % nparts).astype("int32")})

    def train_reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "tok"], as_index=False)["n"].sum()
        return pd.DataFrame({"lang": g["lang"].astype(str),
                             "tok": g["tok"].astype(str),
                             "n": g["n"].astype("int64")})

    model = (docs.map_batches(train_partials, batch_format="pandas")
             .groupby("bucket").map_groups(train_reduce,
                                           batch_format="pandas")
             .to_pandas())  # vocabulary-sized by construction

    def prior_partials(df: pd.DataFrame) -> pd.DataFrame:
        tr = df[df["doc_id"] % 2 == 0]
        g = tr.groupby("lang", as_index=False).size()
        return pd.DataFrame({"lang": g["lang"].astype(str),
                             "nd": g["size"].astype("int64")})

    pri = (docs.map_batches(prior_partials, batch_format="pandas")
           .to_pandas().groupby("lang", as_index=False)["nd"].sum())

    langs = sorted(pri["lang"])
    lidx = {l: i for i, l in enumerate(langs)}
    L = len(langs)
    vocab = model["tok"].unique()
    V = len(vocab)
    tidx = pd.Series(np.arange(V, dtype="int64"), index=vocab)

    def qln(x: int) -> int:
        return math.floor(q * math.log(x))

    # M[tok, lang] = qln(cnt+1); absent pairs stay qln(1) = 0
    M = np.zeros((V, L), dtype="int64")
    M[tidx[model["tok"]].to_numpy(),
      model["lang"].map(lidx).to_numpy()] = [
        qln(int(n) + 1) for n in model["n"]]
    tot = model.groupby("lang")["n"].sum()
    denom = np.array([qln(int(tot.get(l, 0)) + V) for l in langs],
                     dtype="int64")
    prior = np.array(
        [qln(int(pri.loc[pri["lang"] == l, "nd"].iloc[0]))
         for l in langs], dtype="int64")
    model_ref = ray.put((tidx, M, denom, prior))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        tix, mm, dn, pr = _bcast_get(model_ref)
        ev = df[df["doc_id"] % 2 == 1]
        if ev.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "nb_pred": pd.Series([], dtype=str)})
        e = (pd.DataFrame({"doc_id": ev["doc_id"].astype("int64"),
                           "tok": ev["text"].str.split(" ")})
             .explode("tok"))
        g = e.groupby(["doc_id", "tok"], as_index=False).size()
        ix = tix.reindex(g["tok"]).fillna(-1).to_numpy(dtype="int64")
        n = g["size"].to_numpy(dtype="int64")
        contrib = np.where(ix[:, None] >= 0,
                           mm[np.clip(ix, 0, None)], 0) * n[:, None]
        cf = pd.DataFrame(contrib, index=g["doc_id"])
        sums = cf.groupby(level=0).sum()
        ntot = pd.Series(n, index=g["doc_id"]).groupby(level=0).sum()
        scores = (pr[None, :] + sums.to_numpy()
                  - ntot.to_numpy()[:, None] * dn[None, :])
        pred = [langs[i] for i in scores.argmax(axis=1)]
        return pd.DataFrame({"doc_id": sums.index.astype("int64"),
                             "nb_pred": pd.Series(pred, dtype=str,
                                                  index=sums.index)})

    return docs.map_batches(score, batch_format="pandas")


_PERC_STOPS = ("the", "and", "of", "to", "a", "in", "is")


def perceptron_langid(sf_dir: str, iters: int = 40,
                      small_corpus_threshold: int = 2_000_000):
    """(doc_id, y, yhat) — POCKET perceptron training (Gallant, IEEE
    TNN 1990: batch Rosenblatt updates, keep the weights with the
    fewest misclassifications seen) in PURE integer arithmetic. The
    target is a hidden linear rule over text features — y = +1 iff
    16·n_stopwords > n_tokens (stopword density above 1/16; the
    corpus's lang column is metadata independent of the text by
    construction, so it is unlearnable from text and would be a
    dishonest demo target). Features f = (1, min(n_tokens, 63),
    min(n_en_stopwords, 15)), update w ← w + Σ_mis y·f, pocket on
    (misclassified count, epoch). No float exists anywhere, so the
    unrolled SQL oracle is bit-exact by construction (a sigmoid loss
    cannot be: DuckDB's exp() is measurably not bit-portable against
    libm, unlike ln). Recovers the hidden rule to ~0.92/0.83 accuracy
    at sf0.001/sf0.01 vs 0.63/0.56 majority.

    Scale shape: each epoch is one map-only corpus pass with the
    3-int weight vector broadcast via closure and a per-batch 4-int
    combiner (misclassified-gradient sums + count) folded driver-side
    (model-sized state, the kmeans_lloyd pattern); zero data-sized
    all-to-alls, ``iters``+1 corpus passes.
    """
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def feats(df: pd.DataFrame):
        toks = df["text"].astype(str).str.split(" ")
        f2 = toks.str.len().clip(upper=63).to_numpy("int64")
        stops = set(_PERC_STOPS)
        f3 = np.array([min(sum(1 for t in ts if t in stops), 15)
                       for ts in df["text"].astype(str).str.lower()
                       .str.split(" ")], dtype="int64")
        y = np.where(16 * f3 > f2, 1, -1).astype("int64")
        return y, np.ones(len(df), dtype="int64"), f2, f3

    w = (0, 0, 0)
    pocket, pocket_mis = w, None

    # small-corpus gate (the _local_pagerank pattern): below the
    # threshold the 40 sequential map-only passes are pure Ray
    # orchestration (~0.43 s each on 500 docs — 17.6 s of battery
    # wall) — extract features in ONE pass and run the epochs on the
    # driver over the n×3 integer matrix; identical arithmetic,
    # pinned by the replay test
    if ds.count() <= small_corpus_threshold:
        def feat_rows(df: pd.DataFrame) -> pd.DataFrame:
            y, f1, f2, f3 = feats(df)
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "y": pd.Series(y, index=df.index),
                "f2": pd.Series(f2, index=df.index),
                "f3": pd.Series(f3, index=df.index)})

        t = ds.map_batches(feat_rows, batch_format="pandas")             .to_pandas()
        y = t["y"].to_numpy("int64")
        F = np.stack([np.ones(len(t), dtype="int64"),
                      t["f2"].to_numpy("int64"),
                      t["f3"].to_numpy("int64")])
        wv = np.zeros(3, dtype=object)
        for _ in range(iters):
            m = y * (wv @ F) <= 0
            nm = int(m.sum())
            if pocket_mis is None or nm < pocket_mis:
                pocket, pocket_mis = tuple(int(x) for x in wv), nm
            if nm == 0:
                break
            wv = wv + (y[m] * F[:, m]).sum(axis=1)
        z = (pocket[0] * F[0] + pocket[1] * F[1] + pocket[2] * F[2])
        return pd.DataFrame({
            "doc_id": t["doc_id"].astype("int64"),
            "y": t["y"].astype("int64"),
            "yhat": pd.Series(np.where(z > 0, 1, -1), dtype="int64")})

    def epoch_partial(wv):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            y, f1, f2, f3 = feats(df)
            m = y * (wv[0] * f1 + wv[1] * f2 + wv[2] * f3) <= 0
            return pd.DataFrame({
                "s1": [int((y[m] * f1[m]).sum())],
                "s2": [int((y[m] * f2[m]).sum())],
                "s3": [int((y[m] * f3[m]).sum())],
                "nm": [int(m.sum())]})
        return fn

    for _ in range(iters):
        t = ds.map_batches(epoch_partial(w),
                           batch_format="pandas").to_pandas()
        nm = int(t["nm"].sum())
        if pocket_mis is None or nm < pocket_mis:
            pocket, pocket_mis = w, nm
        if nm == 0:
            break
        w = (w[0] + int(t["s1"].sum()), w[1] + int(t["s2"].sum()),
             w[2] + int(t["s3"].sum()))

    wv = pocket

    def predict(df: pd.DataFrame) -> pd.DataFrame:
        y, f1, f2, f3 = feats(df)
        z = wv[0] * f1 + wv[1] * f2 + wv[2] * f3
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "y": pd.Series(y, dtype="int64", index=df.index),
            "yhat": pd.Series(np.where(z > 0, 1, -1), dtype="int64",
                              index=df.index)})

    return ds.map_batches(predict, batch_format="pandas")


def quantile_sketch_values(sf_dir: str, k: int = 512,
                           qs=(0.25, 0.5, 0.75, 0.9, 0.99)):
    """(q_pct, value_cents, k_used) — MERGEABLE quantile sketch for
    UNBOUNDED domains: a deterministic bottom-k hash sample (the rows
    whose md5(event_id) is among the k smallest form an exact uniform
    without-replacement sample — KMV applied to rows instead of
    distinct values), quantile_disc cutpoints read off the sample.
    The histogram-walk percentile ops in this repo need a bounded
    integer domain; this sketch does not, its state is k·16 bytes,
    and two sketches merge as "k smallest of the union" — the shape
    that survives 100 TB and re-aggregation across shards. Like the
    KMV/CMS/HLL sketches here, the md5 hash makes the sketch
    deterministic, so the oracle replays the approximation EXACTLY
    (including which rows got sampled); accuracy vs the exact
    percentiles is pinned separately by test.

    Scale shape: per-batch (hash, cents) bottom-k combiner; ONE tiny
    single-partition reduce over ≤ k·n_batches fixed-width rows;
    cutpoints fold driver-side.
    """
    import math

    from .readers import bounded_read_parquet

    ds = bounded_read_parquet("%s/events.parquet" % sf_dir,
                              columns=["event_id", "value"])

    def bottom_k(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(100.0 * df["value"].to_numpy("float64")
                         + 0.5).astype("int64")
        hs = np.array([_md5_u64("%d:qsk" % e) for e in
                       df["event_id"]], dtype="uint64")
        t = pd.DataFrame({"h": hs, "cents": cents}) \
            .sort_values(["h", "cents"]).head(k)
        return t

    t = (ds.map_batches(bottom_k, batch_format="pandas").to_pandas()
         .sort_values(["h", "cents"]).head(k))
    vals = np.sort(t["cents"].to_numpy("int64"))
    n = len(vals)
    rows = [(int(round(100 * q)),
             int(vals[max(0, math.ceil(q * n) - 1)]), n)
            for q in qs]
    return pd.DataFrame(rows, columns=["q_pct", "value_cents",
                                       "k_used"]).astype("int64")


def dp_noisy_counts(sf_dir: str, b: float = 1.0):
    """(lang, n_true, noise_q6, n_noisy_q6) — differentially-private
    count release (Laplace mechanism, sensitivity 1, ε = 1/b): per
    language, the true document count plus Laplace(b) noise drawn
    DETERMINISTICALLY as b·ln(u₁/u₂) (a difference of exponentials is
    Laplace), u_i = (md5-u64(lang:dpᵢ)+1)/2⁶⁴. The whole noise tree —
    two exactly-rounded uint→double conversions, one division, the
    shared libm ln, one multiply, floor at 10⁶ — is mirrored
    op-for-op in SQL, so the released noisy counts hash-match exactly
    (the weighted_sample float-tree contract). n_noisy_q6 =
    10⁶·n_true + noise_q6.

    Scale shape: per-batch lang-count combiner into a tiny hash
    aggregate; the noise fold is |langs|-sized driver work. Zero
    data-sized all-to-alls.
    """
    import math

    ds = _read_documents(sf_dir, columns=["lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lang").size().reset_index(name="n")
        return g

    t = (ds.map_batches(partial, batch_format="pandas").to_pandas()
         .groupby("lang", as_index=False)["n"].sum())
    rows = []
    for _, r in t.sort_values("lang").iterrows():
        lang, n = str(r["lang"]), int(r["n"])
        u1 = (float(_md5_u64("%s:dp1" % lang)) + 1.0) / 2.0**64
        u2 = (float(_md5_u64("%s:dp2" % lang)) + 1.0) / 2.0**64
        noise = b * math.log(u1 / u2)
        nq = math.floor(1e6 * noise)
        rows.append((lang, n, nq, 10**6 * n + nq))
    return pd.DataFrame(rows, columns=["lang", "n_true", "noise_q6",
                                       "n_noisy_q6"]).astype(
        {"n_true": "int64", "noise_q6": "int64",
         "n_noisy_q6": "int64"})


def negative_samples(sf_dir: str, n_samples: int = 500):
    """(i, token) — the word2vec NEGATIVE-SAMPLING table (Mikolov et
    al. 2013): draw tokens ∝ freq^{3/4}. The 3/4 power stays
    bit-portable as w = floor(√(floor(√(f³)))) — IEEE square root is
    CORRECTLY ROUNDED by the standard (unlike libm exp), so engine
    and DuckDB agree bit-for-bit at any scale; draws are md5("i:neg")
    mod Σw mapped through the lexicographic cumulative-weight table
    (the md5-randomness contract).

    Scale shape: per-batch token value_counts combiner → one
    hash(token) co-group for exact frequencies; the weight table is
    vocabulary-sized model state (the unigram_lm_score caveat) folded
    driver-side; the draw mapping is a searchsorted over it.
    """
    import math

    from .textops import _read_documents as _docs

    ds = _docs(sf_dir, columns=["text"])
    nparts = 16

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = pd.Series(np.concatenate(
            [t.split(" ") for t in df["text"].astype(str)])) \
            .value_counts()
        out = pd.DataFrame({"tok": vc.index.astype(str),
                            "f": vc.to_numpy("int64")})
        out["bucket"] = (pd.util.hash_pandas_object(out["tok"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    t = (ds.map_batches(counts, batch_format="pandas")
         .groupby("bucket").map_groups(
             lambda df: df.groupby("tok", as_index=False)["f"].sum(),
             batch_format="pandas")
         .to_pandas().sort_values("tok").reset_index(drop=True))
    # mirror the oracle's float tree exactly: (double)f · f · f with
    # per-step rounding, NOT float(f³) — they differ above 2^53
    w = [math.floor(math.sqrt(math.floor(math.sqrt(
        (float(int(f)) * int(f)) * int(f))))) for f in t["f"]]
    cum = np.cumsum([0] + w)
    total = int(cum[-1])
    toks = t["tok"].to_numpy()
    draws = [_md5_u64("%d:neg" % i) % total for i in range(n_samples)]
    idx = np.searchsorted(cum, draws, side="right") - 1
    return pd.DataFrame({
        "i": pd.Series(range(n_samples), dtype="int64"),
        "token": pd.Series([str(toks[j]) for j in idx])})


def weighted_reservoir_sample(sf_dir: str, k: int = 5):
    """(source, rank, doc_id, key_q20) — WEIGHTED RESERVOIR SAMPLING
    per source, the A-ES scheme (Efraimidis & Spirakis, IPL 2006):
    each doc draws u ∈ (0, 1] deterministically from md5(doc_id) and
    competes with key = ln(u)/w, weight w = n_chars; the k LARGEST
    keys per source win. This is the one-pass weighted sampler
    corpus-curation mixtures use when "sample proportional to length /
    quality weight" must stream (the reservoir never exceeds k rows
    per group, no matter the corpus).

    Determinism/oracle: u = (CAST(h AS DOUBLE) + 1) / 2^64 — the cast
    rounds identically in both engines, +1 and the power-of-two
    division are exact; ln is the shared-libm portable call; key
    comparison of identical doubles is exact, with doc_id as the
    (never-reached) tiebreak. ``key_q20 = floor(2^20·key)`` of
    identical doubles is identical, so the output hash-matches.

    Scale shape: map-only per-batch top-k partials per source (each
    batch emits ≤ groups·k fixed-width rows — the reservoir property),
    then one tiny co-group on the low-cardinality source key finishes
    the top-k. No corpus-sized shuffle anywhere.
    """
    ds = _read_documents(sf_dir, columns=["doc_id", "source",
                                          "n_chars"])

    def keys_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        h = np.array([_md5_u64(str(int(i))) for i in ids],
                     dtype="uint64")
        u = (h.astype("float64") + 1.0) / 18446744073709551616.0
        w = df["n_chars"].to_numpy(dtype="float64")
        key = np.log(u) / w
        out = pd.DataFrame({"source": df["source"].astype(str),
                            "doc_id": ids.to_numpy(),
                            "key": key})
        out = out.sort_values(["source", "key", "doc_id"],
                              ascending=[True, False, True])
        return out.groupby("source", sort=False).head(k)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["key", "doc_id"],
                            ascending=[False, True]).head(k)
        return pd.DataFrame({
            "source": df["source"].astype(str),
            "rank": pd.Series(range(1, len(df) + 1),
                              dtype="int64").to_numpy(),
            "doc_id": df["doc_id"].astype("int64").to_numpy(),
            "key_q20": np.floor(1048576.0 * df["key"].to_numpy())
            .astype("int64")})

    return (ds.map_batches(keys_topk, batch_format="pandas")
            .groupby("source").map_groups(finish,
                                          batch_format="pandas"))


def stratified_split(sf_dir: str, pcts=(80, 10)):
    """(doc_id, lang, split) — EXACT stratified train/val/test split:
    within each language docs rank by md5(doc_id:split) and the first
    ⌊0.8·n⌋ ranks are 'train', the next ⌊0.1·n⌋ 'val', the rest
    'test' — per-stratum counts are exact by construction, unlike the
    threshold sampling of seeded_sample (binomial counts). The split
    is deterministic and reproducible from the hash alone.

    Scale shape: lang cardinality is tiny but per-lang rank needs a
    per-lang global order — one hash(lang) co-group sorts each
    language's (hash, doc_id) rows in place (fixed-width; text never
    ships). At extreme per-lang cardinality the doc_rank_by_length
    histogram trick would replace the in-bucket sort.
    """
    import ray

    ds = _read_documents(sf_dir, columns=["doc_id", "lang"])
    nparts = max(4, int(ray.cluster_resources().get("CPU", 8)))

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "lang": df["lang"].astype(str),
            "h": pd.Series([_md5_u64("%d:split" % d)
                            for d in df["doc_id"]], dtype="uint64",
                           index=df.index)})
        out["bucket"] = (pd.util.hash_pandas_object(out["lang"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for lang, g in df.groupby("lang", sort=False):
            g = g.sort_values(["h", "doc_id"]).reset_index(drop=True)
            n = len(g)
            n_tr = n * pcts[0] // 100
            n_va = n * pcts[1] // 100
            split = np.full(n, "test", dtype=object)
            split[:n_tr] = "train"
            split[n_tr:n_tr + n_va] = "val"
            outs.append(pd.DataFrame({
                "doc_id": g["doc_id"].astype("int64"),
                "lang": lang, "split": split}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "lang": pd.Series([], dtype=str),
                          "split": pd.Series([], dtype=str)})

    return (ds.map_batches(keyed, batch_format="pandas")
            .groupby("bucket").map_groups(assign,
                                          batch_format="pandas"))


# Poisson(1) CDF thresholds as u64 literals — floor(2^64·CDF(k)),
# k = 0..7 — precomputed once so engine and oracle compare the same
# integers (the md5-randomness contract: no float path at eval time)
_POISSON1_TH = (6786177901268885504, 13572355802537771008,
                16965444753172213760, 18096474403383695360,
                18379231815936565248, 18435783298447138816,
                18445208545532233728, 18446555009401532416)


def bootstrap_means(sf_dir: str, replicas: int = 16):
    """(replica, n_eff, sum_chars, mean_q6) — the POISSON BOOTSTRAP
    (Chamandy et al. 2012, the resampling scheme that works in one
    streaming pass because each row draws an independent Poisson(1)
    weight instead of a global multinomial): ``replicas`` bootstrap
    estimates of mean document length, weight = inverse-CDF lookup of
    a deterministic md5 uniform against fixed u64 CDF literals (both
    engines compare the same integers — no float path), mean_q6 =
    10⁶·Σw·len // Σw exact.

    Scale shape: ONE map-only corpus pass; the per-batch combiner
    emits ≤ 2·replicas cells (per-replica Σw·len and Σw partials), the
    driver folds replica-count-sized rows. Zero all-to-alls at any
    corpus size — the whole point of the Poisson trick.
    """
    ds = _read_documents(sf_dir, columns=["doc_id", "n_chars"])
    th = np.array(_POISSON1_TH, dtype=np.uint64)

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy("int64")
        ln = df["n_chars"].to_numpy("int64")
        rows = []
        for b in range(replicas):
            u = np.array([_md5_u64("bs:%d:%d" % (b, d)) for d in ids],
                         dtype=np.uint64)
            w = np.searchsorted(th, u, side="right").astype("int64")
            rows.append((b, int((w * ln).sum()), int(w.sum())))
        return pd.DataFrame(rows, columns=["replica", "swl", "sw"]) \
            .astype("int64")

    parts = ds.map_batches(cells, batch_format="pandas").to_pandas()
    g = parts.groupby("replica", as_index=False)[["swl", "sw"]].sum()
    g = g.sort_values("replica").reset_index(drop=True)
    return pd.DataFrame({
        "replica": g["replica"].astype("int64"),
        "n_eff": g["sw"].astype("int64"),
        "sum_chars": g["swl"].astype("int64"),
        "mean_q6": ((10**6 * g["swl"]) // g["sw"]).astype("int64")})


def kmv_join_overlap(sf_dir: str, k: int = 256):
    """(k_used, matches, jacc_est_ppm, est_distinct_a, est_distinct_b)
    — sketch-based JOIN-OVERLAP estimation (Beyer et al., SIGMOD 2007):
    the KMV resemblance of key columns across tables — distinct
    ``o_custkey`` (orders) vs ``c_custkey`` (customer), and the same
    vs ``l_suppkey`` (a different keyspace, the negative control the
    join-discovery use case needs) — without ever joining them: each side keeps its k smallest md5-u64
    key hashes, the union sketch is the k smallest of both, Jaccard ≈
    |union-sketch ∩ A ∩ B| / |union-sketch|, and per-side
    cardinalities come from the usual (k−1)·2⁶⁴ // kth estimator.
    This is how a query optimizer sizes a join from k·8-byte
    summaries instead of a shuffle.

    Scale shape: one map-only pass per table (per-batch k-smallest
    distinct-hash combiner, ≤ k rows out per batch), two tiny
    single-partition merges, constant driver fold. The md5 hash makes
    the sketch deterministic, so the SQL oracle replays it EXACTLY —
    estimator, collisions and all.
    """
    def kmin(col):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            keys = pd.unique(df[col])
            hs = sorted(_md5_u64("kmv:%d" % int(x)) for x in keys)[:k]
            return pd.DataFrame({"h": pd.Series(hs, dtype="uint64")})
        return fn

    def sketch(table, col):
        ds = _bread("%s/%s.parquet" % (sf_dir, table), columns=[col])
        parts = ds.map_batches(kmin(col),
                               batch_format="pandas").to_pandas()
        return np.unique(parts["h"].to_numpy())[:k]

    so = sketch("orders", "o_custkey")
    sc = sketch("customer", "c_custkey")
    ss = sketch("lineitem", "l_suppkey")

    def est(s) -> int:
        kn = len(s)
        return kn if kn < k else ((kn - 1) << 64) // int(s[-1])

    def compare(pair, sa, sb):
        union = np.unique(np.concatenate([sa, sb]))[:k]
        matches = int((np.isin(union, sa) & np.isin(union, sb)).sum())
        ku = len(union)
        return (pair, ku, matches, (10**6 * matches) // ku,
                est(sa), est(sb))

    rows = [compare("orders_custkey~customer_custkey", so, sc),
            compare("orders_custkey~lineitem_suppkey", so, ss)]
    out = pd.DataFrame(rows, columns=[
        "pair", "k_used", "matches", "jacc_est_ppm",
        "est_distinct_a", "est_distinct_b"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def greedy_set_cover(sf_dir: str, k: int = 8, shingle_k: int = 3):
    """(rnd, doc_id, gain, covered_after) — greedy MAX-COVERAGE
    document selection (the submodular data-selection primitive;
    Nemhauser, Wolsey & Fisher 1978 give the (1−1/e) guarantee) over
    3-token SHINGLE sets: pick the doc covering the most distinct
    shingles, then k−1 times the doc adding the most shingles not yet
    covered (ties → min doc_id; gain-0 docs never selected).
    ``gain`` counts newly covered shingles; ``covered_after`` is the
    running union size. The diversity-selection counterpart of
    kcenter_coreset, over n-gram sets instead of embeddings (unigrams
    would saturate: this corpus's word vocabulary is 31 tokens).

    Scale shape: each greedy round is ONE map-only corpus pass — the
    covered-token set ships once per round via ray.put, the per-batch
    combiner emits a single (gain, doc_id, uncovered-token payload)
    argmax row carrying the winner's would-be-new tokens so no fetch
    pass follows, and the driver folds n_batches rows. k rounds ⇒ k
    passes, zero all-to-alls at any corpus size. The covered set is
    vocabulary-bounded; at 10^9-doc vocabularies ship a Bloom filter
    (decontaminate_bloom's plan) and accept approximate gains.
    """
    import ray

    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    rows = []
    covered: set = set()
    covered_n = 0
    for rnd in range(k):
        cov_ref = ray.put(covered)

        def best_in_batch(df: pd.DataFrame, _ref=cov_ref) -> pd.DataFrame:
            cov = _bcast_get(_ref)
            bg, bd, bt = -1, -1, None
            for doc_id, text in zip(df["doc_id"], df["text"]):
                toks = text.split(" ")
                sh = {" ".join(toks[i:i + shingle_k])
                      for i in range(len(toks) - shingle_k + 1)}
                new = sh - cov
                g = len(new)
                if g > bg or (g == bg and doc_id < bd):
                    bg, bd, bt = g, int(doc_id), new
            if bg <= 0:
                return pd.DataFrame({"gain": pd.Series([], dtype="int64"),
                                     "doc_id": pd.Series([], dtype="int64"),
                                     "toks": pd.Series([], dtype="object")})
            return pd.DataFrame({"gain": [bg], "doc_id": [bd],
                                 "toks": ["\x1f".join(sorted(bt))]})

        cand = ds.map_batches(best_in_batch,
                              batch_format="pandas").to_pandas()
        if cand.empty:
            break
        cand = cand.sort_values(["gain", "doc_id"],
                                ascending=[False, True])
        win = cand.iloc[0]
        new_toks = win["toks"].split("\x1f") if win["toks"] else []
        covered |= set(new_toks)
        covered_n += int(win["gain"])
        rows.append((rnd + 1, int(win["doc_id"]), int(win["gain"]),
                     covered_n))

    return pd.DataFrame(rows, columns=["rnd", "doc_id", "gain",
                                       "covered_after"]).astype("int64")


def _wp_pieces(sf_dir: str, num_merges: int) -> set:
    """WordPiece inventory: every character of the corpus vocabulary
    plus the ``num_merges`` BPE-trained merged pieces (BERT's vocab is
    built by BPE-style training and APPLIED by longest-match — this op
    mirrors that split)."""
    trained = bpe_train(sf_dir, num_merges=num_merges)
    pieces = {l + r for l, r in zip(trained["l"], trained["r"])}
    vocab = _read_documents(sf_dir, columns=["text"]).map_batches(
        lambda df: pd.DataFrame(
            {"ch": sorted({c for t in df["text"] for c in t
                           if c != " "})}),
        batch_format="pandas").to_pandas()
    pieces |= set(vocab["ch"].astype(str))
    return pieces


def _wp_encode_word(word: str, pieces: set, max_len: int) -> int:
    """Greedy longest-match-first token count of one word (the
    WordPiece / BERT apply walk; single chars are all in the
    inventory, so the walk is total)."""
    pos, cnt = 0, 0
    n = len(word)
    while pos < n:
        step = 1
        for ln in range(min(max_len, n - pos), 0, -1):
            if word[pos:pos + ln] in pieces:
                step = ln
                break
        pos += step
        cnt += 1
    return cnt


def wordpiece_encode(sf_dir: str, num_merges: int = 4):
    """(doc_id, n_words, n_wp_tokens) — WordPiece tokenization (Wu et
    al. 2016; the BERT apply algorithm): per word, repeatedly take the
    LONGEST inventory piece matching at the cursor. The inventory is
    the corpus's characters plus the ``bpe_train``-learned merged
    pieces — the production split where a BPE-style trainer builds the
    vocab and a longest-match encoder applies it. Differs from
    ``bpe_encode``'s merge-ORDER walk by algorithm (longest-match is
    order-free), and the two counts are compared by test.

    Scale shape: training as in bpe_train (corpus read once into a
    vocabulary); the piece inventory is tiny and broadcasts via
    closure into ONE map-only encoding pass, with a per-worker
    word→count cache amortizing the walk to once per distinct word.
    Zero shuffles in the apply stage.
    """
    pieces = _wp_pieces(sf_dir, num_merges)
    max_len = max(len(p) for p in pieces)
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def encode(df: pd.DataFrame, _cache={}) -> pd.DataFrame:
        def wlen(w: str) -> int:
            n = _cache.get(w)
            if n is None:
                n = _wp_encode_word(w, pieces, max_len)
                _cache[w] = n
            return n

        toks = df["text"].str.split(" ")
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_words": toks.str.len().astype("int64"),
            "n_wp_tokens": toks.map(
                lambda ws: sum(wlen(w) for w in ws)).astype("int64"),
        })

    return ds.map_batches(encode, batch_format="pandas")


def hrw_assign(sf_dir: str, n_shards: int = 8):
    """(doc_id, shard, win_hash) — RENDEZVOUS (highest-random-weight)
    hashing (Thaler & Ravishankar 1996): each doc goes to the shard
    maximizing md5(doc_id:shard) — the consistent-hashing assignment
    behind stable shard/cache/worker placement. Its defining property
    (pinned by test): removing one shard re-routes ONLY that shard's
    keys — every other key keeps its placement, unlike mod-N hashing
    where nearly all keys move.

    Scale shape: map-only, zero exchanges; the per-row argmax is over
    ``n_shards`` md5 evaluations.
    """
    ds = _read_documents(sf_dir, columns=["doc_id"])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        H = np.array([[_md5_u64("%d:shard%d" % (d, s))
                       for s in range(n_shards)] for d in ids],
                     dtype=np.uint64)
        shard = H.argmax(axis=1).astype("int64")
        win = H.max(axis=1)
        return pd.DataFrame({
            "doc_id": ids,
            "shard": pd.Series(shard, dtype="int64"),
            "win_hash": pd.Series([int(x) >> 1 for x in win],
                                  dtype="int64")})

    return ds.map_batches(assign, batch_format="pandas")


def group_kfold(sf_dir: str, n_folds: int = 5, threshold: float = 0.8,
                num_partitions: Optional[int] = None):
    """(doc_id, component, fold) — LEAKAGE-SAFE grouped K-fold
    assignment: near-duplicate documents (the ``jaccard_pairs``
    graph's connected components) always land in the SAME fold —
    fold = md5('fold:' || component_min) % n_folds — so a model
    evaluated on fold i never saw a near-copy of its eval docs in
    training (the GroupKFold discipline; random splits leak through
    duplicates and overstate accuracy). Singleton docs are their own
    component.

    Scale shape: pairs → distributed union-find (components.py) →
    one doc-hash bucketed co-group attaching the component label
    (absent → self), fold derived map-side from md5. Nothing
    corpus-sized is ever collected on the driver.
    """
    import ray

    from kgx.components import connected_components
    from kgx.dedup import jaccard_pairs

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))
    docs = _read_documents(sf_dir, columns=["doc_id"])
    pairs = jaccard_pairs(sf_dir, threshold, num_partitions=nparts)
    edges = pairs.map_batches(
        lambda df: pd.DataFrame({"a": df["doc_id_a"].astype("int64"),
                                 "b": df["doc_id_b"].astype("int64")}),
        batch_format="pandas").materialize()
    comp = connected_components(edges, num_partitions=nparts)

    def tag(side: int, key: str, val: Optional[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "doc_id": df[key].astype("int64"),
                "component": (df[val].astype("int64") if val
                              else df[key].astype("int64")),
                "side": np.int8(side)})
            out["bucket"] = (pd.util.hash_pandas_object(
                out["doc_id"], index=False) % nparts).astype("int32")
            return out
        return fn

    u = docs.map_batches(tag(0, "doc_id", None),
                         batch_format="pandas").union(
        comp.map_batches(tag(1, "node", "component"),
                         batch_format="pandas"))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        base = df[df["side"] == 0][["doc_id", "component"]]
        lab = df[df["side"] == 1][["doc_id", "component"]] \
            .rename(columns={"component": "lbl"})
        m = base.merge(lab, on="doc_id", how="left")
        compv = m["lbl"].fillna(m["component"]).astype("int64")
        fold = pd.Series([_md5_u64("fold:%d" % c) % n_folds
                          for c in compv],
                         dtype="int64", index=m.index)
        return pd.DataFrame({"doc_id": m["doc_id"].astype("int64"),
                             "component": compv, "fold": fold})

    return u.groupby("bucket").map_groups(attach, batch_format="pandas")


def ams_f2(sf_dir: str, n_sketches: int = 16):
    """(sketch_id, z_sum, z2) — the ALON–MATIAS–SZEGEDY F₂ sketch
    (STOC 1996): for each of ``n_sketches`` independent ±1 hash
    functions s, Z_s = Σ_tokens sign_s(tok)·freq(tok); each Z_s² is an
    unbiased estimate of the second frequency moment Σ f_t² (the
    token-frequency "self-join size" — skew/heavy-hitter mass that
    drives join and shuffle cost models). Signs derive from
    md5(s || ':' || tok) parity, so the sketch — a LINEAR function of
    the frequency vector — replays exactly in SQL, and the estimate's
    variance is pinned against the true F₂ by test.

    Scale shape: the sketch is linear ⇒ per-batch partials are just
    per-sketch signed sums (an ``n_sketches``-cell combiner); zero
    all-to-alls, driver folds n_batches × n_sketches cells. The
    textbook mergeable-sketch contract (like HLL's register max,
    CMS's cell add).
    """
    ds = _read_documents(sf_dir, columns=["text"])
    S = n_sketches

    def partial(df: pd.DataFrame, _signs={}) -> pd.DataFrame:
        z = np.zeros(S, dtype=np.int64)
        for text in df["text"]:
            for tok in text.split(" "):
                sg = _signs.get(tok)
                if sg is None:
                    sg = np.array(
                        [1 if _md5_u64("%d:%s" % (s, tok)) % 2 == 0
                         else -1 for s in range(S)], dtype=np.int64)
                    _signs[tok] = sg
                z += sg
        return pd.DataFrame({"sketch_id": np.arange(S, dtype=np.int64),
                             "z": z})

    agg = (ds.map_batches(partial, batch_format="pandas").to_pandas()
           .groupby("sketch_id", as_index=False)["z"].sum())
    z = agg.sort_values("sketch_id")["z"].astype("int64")
    return pd.DataFrame({
        "sketch_id": np.arange(S, dtype=np.int64),
        "z_sum": z.to_numpy(),
        "z2": (z * z).to_numpy()}).astype("int64")


def hll_sliding_users(sf_dir: str, window_days: int = 7, p: int = 8):
    """(win_start_day, zero_registers, est_distinct) — distinct users
    per SLIDING 7-day window via HyperLogLog register merging: each
    day's m-byte register sketch is built ONCE (combiner + one tiny
    co-group), and every window's sketch is the elementwise MAX of
    its days' sketches — the mergeability property that lets a
    streaming analytics store answer any window from per-interval
    sketches without ever re-touching events (re-scanning raw events
    per window is the anti-pattern this op replaces). Estimator in
    exact integers (``_hll_estimate``); window merges fold on the
    output-sized (day, register) table driver-side.
    """
    from .textops import token_hash64

    m = 1 << p
    ds = _bread("%s/events.parquet" % sf_dir,
                columns=["ts", "user_id"])
    pows = (np.uint64(1) << np.arange(0, 64 - p,
                                      dtype=np.uint64)).astype(np.uint64)

    def registers(df: pd.DataFrame) -> pd.DataFrame:
        day = (((df["ts"] - pd.Timestamp(0))
                // pd.Timedelta(microseconds=1))
               // 86400000000).astype("int64")
        hs = np.array([token_hash64(str(int(u)))
                       for u in df["user_id"]], dtype=np.uint64)
        j = (hs >> np.uint64(64 - p)).astype(np.int64)
        v = hs & np.uint64((1 << (64 - p)) - 1)
        bitlen = np.searchsorted(pows, v, side="right")
        rho = (64 - p) - bitlen + 1
        t = pd.DataFrame({"day": day, "j": j,
                          "rho": rho.astype("int64")})
        g = t.groupby(["day", "j"], as_index=False)["rho"].max()
        g["bucket"] = (g["day"] % 16).astype("int32")
        return g

    def merge_regs(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["day", "j"], as_index=False)["rho"].max()

    cells = (ds.map_batches(registers, batch_format="pandas")
             .groupby("bucket").map_groups(merge_regs,
                                           batch_format="pandas")
             .to_pandas())
    d0, d1 = int(cells["day"].min()), int(cells["day"].max())
    by_day = {d: np.zeros(m, dtype=np.int64) for d in range(d0, d1 + 1)}
    for d, j, r in zip(cells["day"].astype(int),
                       cells["j"].astype(int),
                       cells["rho"].astype(int)):
        by_day[d][j] = max(by_day[d][j], r)
    rows = []
    for w in range(d0, d1 - window_days + 2):
        regs = np.zeros(m, dtype=np.int64)
        for d in range(w, w + window_days):
            np.maximum(regs, by_day[d], out=regs)
        est, zeros = _hll_estimate(regs.tolist(), m)
        rows.append((w, zeros, est))
    return pd.DataFrame(
        rows, columns=["win_start_day", "zero_registers",
                       "est_distinct"]).astype("int64")


def subsample_tokens(sf_dir: str):
    """(doc_id, n_tokens, n_kept) — word2vec FREQUENCY SUBSAMPLING
    (Mikolov et al. 2013, word2vec.c): an occurrence of token w
    survives with p = sqrt(t/f) + t/f where f is w's corpus frequency
    and t = 1/1024 (dyadic) — frequent filler tokens are mostly
    dropped, rare content tokens always kept (p >= 1). The keep draw
    is the md5-u64 of "doc:pos:token" mapped to [0,1) — deterministic,
    so the sketch-style trick applies: the sampling itself carries an
    EXACT oracle. sqrt and float division are exactly-rounded IEEE ops
    (portable like ln, unlike exp — BASELINE discipline), and the
    expression tree is written identically on both sides.

    Scale shape: unigram counts from the broadcast-aggregate combiner
    (unigram_lm_score's shape); the keep pass is map-only — per batch
    one polars explode + a per-occurrence md5 (the same cost class as
    the fingerprint ops); only three ints per doc leave the batch.
    """
    import math

    from .textops import _local_token_counts_arrow, token_hash64

    ds = _read_documents(sf_dir, columns=["doc_id", "text"])
    vocab = (ds.map_batches(_local_token_counts_arrow,
                            batch_format="pyarrow", zero_copy_batch=True)
             .groupby("tok").sum("n").to_pandas())
    total = int(vocab["sum(n)"].sum())
    T = 0.0009765625  # 1/1024, dyadic
    pkeep = {}
    for tok, c in zip(vocab["tok"], vocab["sum(n)"]):
        f = float(int(c)) / float(total)
        r = T / f
        pkeep[tok] = math.sqrt(r) + r

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        out_doc, out_n, out_k = [], [], []
        for doc_id, text in zip(df["doc_id"].astype("int64"),
                                df["text"]):
            toks = text.split(" ")
            kept = 0
            for i, w in enumerate(toks, start=1):
                p = pkeep[w]
                if p >= 1.0:
                    kept += 1
                    continue
                h = int.from_bytes(hashlib.md5(
                    ("%d:%d:%s" % (doc_id, i, w)).encode()).digest()[:8],
                    "big")
                if float(h) / 18446744073709551616.0 < p:
                    kept += 1
            out_doc.append(int(doc_id))
            out_n.append(len(toks))
            out_k.append(kept)
        return pd.DataFrame({
            "doc_id": pd.Series(out_doc, dtype="int64"),
            "n_tokens": pd.Series(out_n, dtype="int64"),
            "n_kept": pd.Series(out_k, dtype="int64")})

    return ds.map_batches(fn, batch_format="pandas")
