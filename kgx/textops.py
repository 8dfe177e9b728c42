"""Text-analysis operators over the ``documents`` table.

All stages are single-pass ``map_batches`` transforms (no shuffle): token
counting, quality scoring, n-gram language identification and rolling-hash
document fingerprinting. Vectorized with pandas string kernels where the
semantics allow; per-row Python only where a set/hash per document is
inherent.
"""

from __future__ import annotations

import re
import zlib
from functools import lru_cache
from typing import Optional

import numpy as np
import pandas as pd

from .readers import compute_heavy_read_parquet as _bread


def _read_documents(sf_dir: str, columns=None):
    import ray.data

    return _bread("%s/documents.parquet" % sf_dir, columns=columns)


def token_counts(sf_dir: str):
    """(doc_id, n_tokens) — whitespace tokenization as a zero-copy Arrow
    kernel: tokens = separator count + 1 (split(" ") semantics), no
    pandas object boxing anywhere."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(tbl: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(tbl.column("text"), " "),
                   1).cast(pa.int64())
        return pa.table({"doc_id": tbl.column("doc_id"), "n_tokens": n})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality(sf_dir: str):
    """Per-document quality metrics: length, token count, vocabulary size,
    max token repetition. Integer-valued so results are exactly portable."""
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(tbl) -> pd.DataFrame:
        import polars as pl

        d = pl.from_arrow(tbl.select(["doc_id", "text"]))
        out = (d.with_columns(
                   pl.col("text").str.len_chars().cast(pl.Int64)
                   .alias("n_chars"),
                   pl.col("text").str.split(" ").alias("t"))
               .with_columns(
                   pl.col("t").list.len().cast(pl.Int64)
                   .alias("n_tokens"),
                   pl.col("t").list.n_unique().cast(pl.Int64)
                   .alias("n_uniq_tokens"))
               .select(["doc_id", "n_chars", "n_tokens",
                        "n_uniq_tokens"]))
        return out.to_pandas()

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# gopher_filter's "word contains an alphabetic char" test (compiled once
# per worker; the same class RE2 evaluates identically in the oracle)
_ALPHA_RE = re.compile(r"[A-Za-z]")

# tiny per-language stopword profiles for the heuristic language ID
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "as"},
    "de": {"der", "die", "und", "das", "ist", "von", "mit", "für", "ein", "nicht"},
    "fr": {"le", "la", "et", "les", "des", "est", "pour", "dans", "une", "que"},
    "es": {"el", "la", "de", "los", "que", "en", "es", "para", "con", "una"},
    "zh": set(),  # handled by the CJK codepoint ratio below
}


def classify_lang(text: str) -> str:
    """Stopword-hit + CJK-ratio language heuristic for one document.

    Deliberately a pure relational expression (set intersections with
    fixed stopword lists, a codepoint-range ratio, ordered argmax) so the
    whole operator is DuckDB-oracle-checkable; accuracy on real sentences
    is pinned by tests/test_ops.py.
    """
    if not text:
        return "und"
    head = text[:200]
    cjk = sum(1 for ch in head if "一" <= ch <= "鿿")
    if cjk > len(head) * 0.2:
        return "zh"
    toks = set(text.lower().split(" "))
    best, best_hits = "en", -1
    for lang, stop in _LANG_PROFILES.items():
        if not stop:
            continue
        hits = len(toks & stop)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best


def lang_id(sf_dir: str):
    """(doc_id, lang_pred) — vectorized ``classify_lang`` over documents."""
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "lang_pred": [classify_lang(t) for t in df["text"]],
        })

    return ds.map_batches(fn, batch_format="pandas")


_FP_BASE = 1099511628211
_FP_MASK = (1 << 63) - 1
_FP_SEED = 14695981039346656037
_M64 = 1 << 64


@lru_cache(maxsize=1 << 18)
def token_hash64(tok: str) -> int:
    """First 8 bytes of md5 as uint64 — the shared token hash for
    fingerprint/simhash, chosen because DuckDB can compute the identical
    value (``('0x' || substr(md5(t), 1, 16))::UBIGINT``), which makes both
    operators fully oracle-checkable. Cached per worker process: corpus
    vocabulary is tiny next to token instances, so the md5 cost amortizes
    to near zero on real text."""
    import hashlib

    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:16], 16)


def _rolling_fingerprint(text: str) -> int:
    """Deterministic rolling (polynomial) hash over tokens — stable
    across processes (md5 token hashes, no PYTHONHASHSEED dependence)."""
    h = _FP_SEED
    for tok in text.split(" "):
        h = (((h * _FP_BASE) % _M64) ^ token_hash64(tok)) & _FP_MASK
    return h


def fingerprint(sf_dir: str):
    """(doc_id, fp) — 63-bit rolling-hash document fingerprint."""
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "fp": pd.Series([_rolling_fingerprint(t) for t in df["text"]],
                            dtype="int64"),
        })

    return ds.map_batches(fn, batch_format="pandas")


def quality_ratios(sf_dir: str):
    """(doc_id, n_punct, n_stopwords, n_tokens) — punctuation/stopword
    load per document (integer counts; the ratios divide out exactly, and
    integers hash portably across engines). Vectorized: one regex count
    and one set-intersection pass per batch."""
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])
    stop = _LANG_PROFILES["en"]

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.split(" ")
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_punct": df["text"].str.count(
                r"[^A-Za-z0-9 \t\n\r\f\v]").astype("int64"),
            "n_stopwords": toks.map(
                lambda t: sum(1 for x in t if x in stop)).astype("int64"),
            "n_tokens": toks.str.len().astype("int64"),
        })

    return ds.map_batches(fn, batch_format="pandas")


def gopher_filter(sf_dir: str, min_words: int = 50,
                  max_words: int = 100_000):
    """(doc_id, n_words, len_sum, n_alpha_words, n_stopwords, keep) —
    the Gopher quality-rule gate (Rae et al., "Scaling Language Models:
    ... Gopher", 2021, §A1.1; also Dolma's reimplementation): keep a
    document iff
      · word count in [min_words, max_words],
      · mean word length in [3, 10]  — tested as the INTEGER inequality
        3·n_words ≤ len_sum ≤ 10·n_words (len_sum = chars excl. spaces),
      · ≥ 80% of words contain an alphabetic char (5·n_alpha ≥ 4·n_words),
      · ≥ 2 stopwords (the same 10-word list quality_ratios uses).
    Every rule is integer arithmetic over exact counts, so the SQL
    oracle reproduces keep bit-for-bit — no float ratio thresholds.

    Map-only single pass (vectorized str ops per batch), no shuffle at
    any scale; the per-rule counts ride along so downstream stages can
    re-threshold without a second scan."""
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])
    stop = _LANG_PROFILES["en"]

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        low = df["text"].str.lower().str.split(" ")
        n_words = toks.str.len().astype("int64")
        len_sum = (df["text"].str.len()
                   - df["text"].str.count(" ")).astype("int64")
        n_alpha = toks.map(
            lambda t: sum(1 for x in t if _ALPHA_RE.search(x))
        ).astype("int64")
        n_stop = low.map(
            lambda t: sum(1 for x in t if x in stop)).astype("int64")
        keep = ((n_words >= min_words) & (n_words <= max_words)
                & (3 * n_words <= len_sum) & (len_sum <= 10 * n_words)
                & (5 * n_alpha >= 4 * n_words) & (n_stop >= 2))
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_words": n_words,
            "len_sum": len_sum,
            "n_alpha_words": n_alpha,
            "n_stopwords": n_stop,
            "keep": keep,
        })

    return ds.map_batches(fn, batch_format="pandas")


# GPT-2-style pre-tokenizer classes, simplified to what Python re and
# DuckDB RE2 evaluate identically: letter runs, digit runs, punctuation
# runs (whitespace separates, never emits). The whitespace class is an
# EXPLICIT ASCII set — Python re's \s is Unicode-aware while RE2's \s is
# ASCII-only, so \s here would diverge on e.g. U+00A0 (ADVICE r2)
_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\v]+"


def token_counts_bpe(sf_dir: str):
    """(doc_id, n_bpe_tokens) — BPE-ish pre-tokenizer counts: the token
    count an LLM data pipeline budgets with (letter/digit/punctuation
    runs), vs ``token_counts``'s whitespace split. Vectorized regex count
    per batch; the identical RE2 pattern runs in the DuckDB oracle."""
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_bpe_tokens": df["text"].str.count(_BPE_PATTERN).astype("int64"),
        })

    return ds.map_batches(fn, batch_format="pandas")


def _local_token_counts_arrow(tbl):
    """(tok, n) per-batch token-OCCURRENCE combiner, zero-copy Arrow →
    polars (no pandas object boxing): split, explode, hash-aggregate.
    Output cast back to (string, int64) so downstream Ray aggregates see
    a stable non-large schema."""
    import polars as pl
    import pyarrow as pa

    out = (pl.from_arrow(tbl.select(["text"]))
           .with_columns(pl.col("text").str.split(" ").alias("t"))
           .drop("text").explode("t")
           .group_by("t").agg(pl.len().cast(pl.Int64).alias("n"))
           .rename({"t": "tok"}))
    return out.to_arrow().cast(
        pa.schema([("tok", pa.string()), ("n", pa.int64())]))


def top_terms(sf_dir: str, k: int = 100):
    """(tok, n) — the k most frequent whitespace tokens corpus-wide.

    Scale shape: per-batch ``value_counts`` is the combiner (shuffle
    volume is per-block vocabulary, not per-token occurrences), then one
    ``groupby(tok).sum`` — a high-cardinality key is fine for a hash/sort
    AGGREGATE (unlike per-key ``map_groups``) — and a small sort+limit on
    the aggregated vocabulary. Ties broken by token so top-k is
    deterministic."""
    ds = _read_documents(sf_dir, columns=["text"])

    counts = (ds.map_batches(_local_token_counts_arrow,
                             batch_format="pyarrow", zero_copy_batch=True)
              .groupby("tok").sum("n"))
    counts = counts.map_batches(
        lambda df: df.rename(columns={"sum(n)": "n"}), batch_format="pandas")
    return counts.sort(["n", "tok"], descending=[True, False]).limit(k)


def repetition_stats(sf_dir: str):
    """(doc_id, n_2grams, n_uniq_2grams, top_2gram_n) — Gopher-style
    repetition signals: bigram total/distinct counts and the most-repeated
    bigram's count per document (the dup-2gram and top-2gram fractions
    divide out exactly from these integers, which hash portably).

    Map-only: tokens explode, bigrams form by a within-doc shift, and the
    per-(doc, gram) counting is a polars hash aggregate inside the batch —
    the shuffle never sees token occurrences."""
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        d = pl.from_pandas(df[["doc_id", "text"]])
        ex = (d.with_columns(pl.col("text").str.split(" ").alias("t"))
              .drop("text").explode("t")
              .with_columns(pl.col("t").shift(-1).over("doc_id").alias("t2")))
        per = (ex.drop_nulls("t2")
               .with_columns((pl.col("t") + " " + pl.col("t2")).alias("g"))
               .group_by(["doc_id", "g"]).agg(pl.len().alias("c")))
        st = per.group_by("doc_id").agg(
            pl.col("c").sum().cast(pl.Int64).alias("n_2grams"),
            pl.len().cast(pl.Int64).alias("n_uniq_2grams"),
            pl.col("c").max().cast(pl.Int64).alias("top_2gram_n"))
        # single-token docs have no bigrams: join back so every doc_id
        # appears (zeros), mirroring the oracle's LEFT JOIN
        out = (d.select("doc_id").join(st, on="doc_id", how="left")
               .fill_null(0))
        return out.to_pandas()

    return ds.map_batches(fn, batch_format="pandas")


# ASCII-only email shape: Python re and DuckDB RE2 evaluate it
# identically (no \s/\w class divergence, no alternation ambiguity)
_EMAIL_PATTERN = r"[a-z0-9._]+@[a-z0-9.]+"


def inject_pii(sf_dir: str):
    """documents with deterministic synthetic PII appended — the test
    corpus carries none, so the scrub operator needs a non-trivial,
    reproducible input. doc_id % 5 gains a per-doc email, % 7 a fixed
    one (% 35 both); the DuckDB oracle applies the identical CASE."""
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        tail5 = np.where(
            ids % 5 == 0,
            " contact user" + ids.astype(str) + "@example.com now", "")
        tail7 = np.where(ids % 7 == 0, " mail admin@test.org", "")
        return pd.DataFrame({"doc_id": ids,
                             "text": df["text"] + tail5 + tail7})

    return ds.map_batches(fn, batch_format="pandas")


def pii_scrub(sf_dir: str):
    """(doc_id, n_emails, scrubbed) — count and redact email-shaped spans
    (vectorized regex count + sub per batch). Runs over the PII-injected
    corpus so the redaction path is actually exercised."""
    ds = inject_pii(sf_dir)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_emails": df["text"].str.count(_EMAIL_PATTERN).astype("int64"),
            "scrubbed": df["text"].str.replace(
                _EMAIL_PATTERN, "<EMAIL>", regex=True),
        })

    return ds.map_batches(fn, batch_format="pandas")


def dup_ngram_stats(sf_dir: str, l: int = 8):
    """(doc_id, n_windows, n_dup_positions) — exact-substring duplication
    signal (Lee et al. 2022 style): for every length-``l`` token window,
    count positions whose window text occurs ≥2 times CORPUS-WIDE
    (including within the same document). Per-doc integer counts — the
    duplicated fraction divides out exactly — instead of emitting doc
    pairs, which explode quadratically on templated corpora.

    Scale shape: per-batch polars groupby collapses windows to
    (doc_id, window, c) before the window-hash shuffle (the combiner);
    one co-group per window bucket computes global occurrence counts AND
    the per-doc duplicated-position partials in place (every row of one
    window lands in one bucket); one doc-hash aggregate finishes. The
    window vocabulary is too large to broadcast — this is the join-side
    twin of unigram_lm_score's broadcast shape."""
    import ray
    import ray.data

    nparts = max(4, int(ray.cluster_resources().get("CPU", 8)))
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def windows(tbl) -> pd.DataFrame:
        import polars as pl

        d = pl.from_arrow(tbl.select(["doc_id", "text"]))
        ex = (d.with_columns(pl.col("text").str.split(" ").alias("t"))
              .drop("text").explode("t"))
        cols = [pl.col("t").shift(-k).over("doc_id") for k in range(1, l)]
        w = (ex.with_columns(
                pl.concat_str([pl.col("t")] + cols, separator=" ",
                              ignore_nulls=False).alias("w"))
             .drop_nulls("w")
             .group_by(["doc_id", "w"]).agg(pl.len().cast(pl.Int64)
                                            .alias("c")))
        out = w.to_pandas()
        out["bucket"] = (pd.util.hash_pandas_object(out["w"], index=False)
                         % nparts).astype("int32")
        return out

    def bucket_reduce(df: pd.DataFrame) -> pd.DataFrame:
        occ = df.groupby("w")["c"].transform("sum")
        dup = df[occ >= 2]
        part = dup.groupby("doc_id", as_index=False)["c"].sum()
        tot = df.groupby("doc_id", as_index=False)["c"].sum()
        m = tot.merge(part, on="doc_id", how="left", suffixes=("_all", "_dup"))
        return pd.DataFrame({
            "doc_id": m["doc_id"].astype("int64"),
            "n_windows": m["c_all"].astype("int64"),
            "n_dup_positions": m["c_dup"].fillna(0).astype("int64")})

    partials = (ds.map_batches(windows, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("bucket").map_groups(bucket_reduce,
                                              batch_format="pandas"))
    # docs shorter than l tokens have zero windows: union zero rows so
    # every doc_id appears (mirrors the oracle's LEFT JOIN)
    zeros = ds.map_batches(
        lambda df: pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_windows": np.int64(0), "n_dup_positions": np.int64(0)}),
        batch_format="pandas")

    # final per-doc sum as a bucketed co-group, NOT the native
    # groupby().sum(): Ray's sort-based aggregate on the (already
    # many-blocked) shuffle output measured 18 s of pure orchestration
    # at sf0.1 where this hash co-group takes ~2 s — same lesson as the
    # components loop (CLAUDE.md: chained-shuffle block counts)
    def doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            b2=(pd.util.hash_pandas_object(df["doc_id"], index=False)
                % nparts).astype("int32"))

    def final_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False)[
            ["n_windows", "n_dup_positions"]].sum()
        return g.astype({"doc_id": "int64", "n_windows": "int64",
                         "n_dup_positions": "int64"})

    return (partials.union(zeros)
            .map_batches(doc_bucket, batch_format="pandas")
            .groupby("b2").map_groups(final_sum, batch_format="pandas"))


_LM_Q = 1 << 20  # dyadic quantizer: floor(freq · 2^20) is integer-exact


def unigram_lm_score(sf_dir: str):
    """(doc_id, lm_q20, n_tokens) — unigram language-model score per
    document: sum over tokens of the corpus-wide token probability,
    quantized to integers (floor(count·2^20 / total)) so Ray and SQL agree
    bit-for-bit.

    The canonical broadcast-aggregate shape: pass 1 computes global term
    frequencies with a per-batch combiner (shuffle carries vocabulary,
    not occurrences), the tiny aggregate comes back to the driver and the
    weight table broadcasts into the pass-2 map via closure capture —
    at 100 TB the vocabulary table is MBs while the corpus is TBs, so
    this costs one small collect instead of a second all-to-all."""
    import ray.data

    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    vocab = (ds.map_batches(_local_token_counts_arrow,
                            batch_format="pyarrow", zero_copy_batch=True)
             .groupby("tok").sum("n").to_pandas())
    total = int(vocab["sum(n)"].sum())
    weights = {t: (int(n) * _LM_Q) // total
               for t, n in zip(vocab["tok"], vocab["sum(n)"])}

    def score(tbl):
        import polars as pl

        d = pl.from_arrow(tbl.select(["doc_id", "text"]))
        ex = (d.with_columns(pl.col("text").str.split(" ").alias("t"))
              .drop("text").explode("t")
              .with_columns(pl.col("t").replace_strict(
                  weights, default=0, return_dtype=pl.Int64).alias("q")))
        out = ex.group_by("doc_id").agg(
            pl.col("q").sum().cast(pl.Int64).alias("lm_q20"),
            pl.len().cast(pl.Int64).alias("n_tokens"))
        return out.to_pandas()

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def _bigram_rows_fn(nparts: int):
    """Per-batch (doc_id, v, w, m) adjacent-bigram count combiner,
    keyed on hash(v) — shared by ``bigram_lm_score`` and
    ``kn_bigram_score``. Vectorized polars explode + shift within each
    document row; < 2-token docs ride along as (v = w = "", m = 0)
    sentinel rows so they surface in the output with zero scores."""

    def bigram_rows(tbl) -> pd.DataFrame:
        import polars as pl
        import pyarrow.compute as pc

        g = (pl.from_arrow(tbl.select(["doc_id", "text"]))
             .with_columns(pl.col("text").str.split(" ").alias("t"))
             .drop("text").with_row_index("r").explode("t")
             .with_columns(pl.col("t").shift(-1).over("r").alias("w"))
             .drop_nulls("w")
             .group_by(["doc_id", "t", "w"])
             .agg(pl.len().cast(pl.Int64).alias("m"))
             .rename({"t": "v"})).to_pandas()
        g["doc_id"] = g["doc_id"].astype("int64")
        zero = tbl.filter(pc.equal(
            pc.count_substring(tbl.column("text"), " "),
            0)).column("doc_id").to_pylist()
        if zero:
            g = pd.concat([g, pd.DataFrame({
                "doc_id": pd.Series(zero, dtype="int64"),
                "v": "", "w": "", "m": np.int64(0)})], ignore_index=True)
        g["bucket"] = (pd.util.hash_pandas_object(g["v"], index=False)
                       % nparts).astype("int32")
        return g

    return bigram_rows


def bigram_lm_score(sf_dir: str, num_partitions: Optional[int] = None):
    """(doc_id, n_bigrams, lm2_q20) — interpolated bigram language-model
    score per document: Σ over positions i ≥ 2 of
    floor(2^20 · ln(3/4 · P(wᵢ|wᵢ₋₁) + 1/4 · P(wᵢ))), with
    P(w|v) = c(v,w)/c(v,·) from corpus bigram counts and P(w) the
    unigram frequency — the context-aware upgrade of
    ``unigram_lm_score`` (CCNet's real filter is an n-gram LM, not a
    unigram one). λ = 3/4 is dyadic, every division is an
    exactly-rounded float64 of sub-2^53 integers in the IDENTICAL
    expression tree as the SQL oracle, ln is the shared libm call, and
    each term floor-quantizes to int64 BEFORE the order-independent sum
    — so the oracle hash-matches bit-for-bit (same discipline as
    dsir_weights / bm25_search). Documents with < 2 tokens score
    (0, 0), carried as m=0 sentinel rows.

    Scale shape: the bigram table is corpus-sized (NOT broadcastable,
    unlike the unigram vocabulary, which ships via closure as in
    unigram_lm_score). Key the ONE bigram exchange on hash(v): every
    (v, ·) occurrence co-locates, so c(v,w) AND the denominator c(v,·)
    are both partition-local — no second exchange for the conditional.
    The per-batch (doc, v, w) count combiner bounds shuffle rows at
    per-block distinct bigrams; per-doc partials then sum in a bucketed
    hash aggregate (one row per doc per v-partition crosses)."""
    import ray

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    vocab = (ds.map_batches(_local_token_counts_arrow,
                            batch_format="pyarrow", zero_copy_batch=True)
             .groupby("tok").sum("n").to_pandas())
    total = float(int(vocab["sum(n)"].sum()))
    uni = {t: int(n) for t, n in zip(vocab["tok"], vocab["sum(n)"])}

    bigram_rows = _bigram_rows_fn(nparts)

    def score_part(df: pd.DataFrame) -> pd.DataFrame:
        zero = df[df["m"] == 0]
        df = df[df["m"] > 0]
        outs = []
        if len(df):
            cvw = df.groupby(["v", "w"], as_index=False)["m"].sum() \
                .rename(columns={"m": "c_vw"})
            cv = df.groupby("v", as_index=False)["m"].sum() \
                .rename(columns={"m": "c_v"})
            d = df.merge(cvw, on=["v", "w"]).merge(cv, on="v")
            p = (0.75 * (d["c_vw"].to_numpy(dtype="float64")
                         / d["c_v"].to_numpy(dtype="float64"))
                 + 0.25 * (np.array([uni[w] for w in d["w"]],
                                    dtype="float64") / total))
            q = np.floor(1048576.0 * np.log(p)).astype("int64")
            part = pd.DataFrame({"doc_id": d["doc_id"],
                                 "nb": d["m"].astype("int64"),
                                 "s": d["m"].to_numpy(dtype="int64") * q})
            outs.append(part.groupby("doc_id", as_index=False).sum())
        if len(zero):
            outs.append(pd.DataFrame({
                "doc_id": zero["doc_id"].astype("int64"),
                "nb": np.int64(0), "s": np.int64(0)}))
        if not outs:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "nb": pd.Series([], dtype="int64"),
                                 "s": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    partials = (ds.map_batches(bigram_rows, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("bucket").map_groups(score_part,
                                              batch_format="pandas"))

    def rebucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            b2=(pd.util.hash_pandas_object(df["doc_id"], index=False)
                % nparts).astype("int32"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False)[["nb", "s"]].sum()
        return pd.DataFrame({"doc_id": g["doc_id"].astype("int64"),
                             "n_bigrams": g["nb"].astype("int64"),
                             "lm2_q20": g["s"].astype("int64")})

    return (partials.map_batches(rebucket, batch_format="pandas")
            .groupby("b2").map_groups(final, batch_format="pandas"))


def kn_bigram_score(sf_dir: str, num_partitions: Optional[int] = None):
    """(doc_id, n_bigrams, kn_q20) — INTERPOLATED KNESER-NEY bigram
    language-model score per document (Kneser & Ney, ICASSP 1995, in
    the interpolated formulation of Chen & Goodman 1998): Σ over
    positions i ≥ 2 of floor(2^20 · ln(P_KN(wᵢ|wᵢ₋₁))) with absolute
    discount D = 3/4 (dyadic):

        P_KN(w|v) = max(c(v,w) − D, 0) / c(v,·)
                  + (D · N1+(v,·)) / c(v,·) · (N1+(·,w) / N1+(·,·))

    The continuation probability N1+(·,w)/N1+(·,·) — how many DISTINCT
    contexts a word completes, ``continuation_counts``' statistic — is
    what distinguishes KN from ``bigram_lm_score``'s linear
    interpolation: "Francisco" is frequent but completes one context,
    so KN correctly scores it low in novel contexts. This is the
    smoothing real perplexity-filter LMs use. Every count is an exact
    integer, D is dyadic, both engines evaluate the IDENTICAL float64
    expression tree (ln is the shared-libm portable call), and each
    term floor-quantizes to int64 BEFORE the order-independent sum —
    the SQL oracle hash-matches bit-for-bit. Docs with < 2 tokens
    score (0, 0). Scoring the corpus itself means every bigram was
    counted, so P_KN ≥ (1−D)/c(v,·) > 0 — ln never sees 0.

    Scale shape: the (doc, v, w, m) bigram combiner table materializes
    ONCE and takes the hash(v) exchange twice. Pass 1: all copies of a
    (v, w) type co-locate under the v key, so distinct-(v,w) is
    partition-exact and per-w distinct-v PARTIALS fold driver-side
    into the vocabulary-sized continuation table (broadcast via
    closure — the unigram_lm_score shape: MBs of vocabulary against
    TBs of corpus). Pass 2: c(v,w), c(v,·) and N1+(v,·) are all
    partition-local under the same key; per-doc partials then sum in
    the bucketed doc-keyed hash aggregate."""
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    g = ds.map_batches(_bigram_rows_fn(nparts), batch_format="pyarrow",
                       zero_copy_batch=True).materialize()

    # pass 1: continuation partials — exact because a (v, w) type
    # lives in exactly one v-partition
    def cont_partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["m"] > 0]
        types = df[["v", "w"]].drop_duplicates()
        out = types.groupby("w", as_index=False).size()
        return pd.DataFrame({"w": out["w"],
                             "n1p": out["size"].astype("int64")})

    cont_df = (g.groupby("bucket").map_groups(cont_partials,
                                              batch_format="pandas")
               .to_pandas().groupby("w")["n1p"].sum())
    cont = {w: int(n) for w, n in cont_df.items()}
    n1p_tot = float(sum(cont.values()))

    def score_part(df: pd.DataFrame) -> pd.DataFrame:
        zero = df[df["m"] == 0]
        df = df[df["m"] > 0]
        outs = []
        if len(df):
            cvw = df.groupby(["v", "w"], as_index=False)["m"].sum() \
                .rename(columns={"m": "c_vw"})
            cv = df.groupby("v", as_index=False)["m"].sum() \
                .rename(columns={"m": "c_v"})
            n1pv = df[["v", "w"]].drop_duplicates() \
                .groupby("v", as_index=False).size() \
                .rename(columns={"size": "n1p_v"})
            d = df.merge(cvw, on=["v", "w"]).merge(cv, on="v") \
                .merge(n1pv, on="v")
            c_vw = d["c_vw"].to_numpy(dtype="float64")
            c_v = d["c_v"].to_numpy(dtype="float64")
            n1v = d["n1p_v"].to_numpy(dtype="float64")
            cw = np.array([cont[w] for w in d["w"]], dtype="float64")
            p = (np.maximum(c_vw - 0.75, 0.0) / c_v
                 + ((0.75 * n1v) / c_v) * (cw / n1p_tot))
            q = np.floor(1048576.0 * np.log(p)).astype("int64")
            part = pd.DataFrame({"doc_id": d["doc_id"],
                                 "nb": d["m"].astype("int64"),
                                 "s": d["m"].to_numpy(dtype="int64") * q})
            outs.append(part.groupby("doc_id", as_index=False).sum())
        if len(zero):
            outs.append(pd.DataFrame({
                "doc_id": zero["doc_id"].astype("int64"),
                "nb": np.int64(0), "s": np.int64(0)}))
        if not outs:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "nb": pd.Series([], dtype="int64"),
                                 "s": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    partials = g.groupby("bucket").map_groups(score_part,
                                              batch_format="pandas")

    def rebucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            b2=(pd.util.hash_pandas_object(df["doc_id"], index=False)
                % nparts).astype("int32"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        gg = df.groupby("doc_id", as_index=False)[["nb", "s"]].sum()
        return pd.DataFrame({"doc_id": gg["doc_id"].astype("int64"),
                             "n_bigrams": gg["nb"].astype("int64"),
                             "kn_q20": gg["s"].astype("int64")})

    return (partials.map_batches(rebucket, batch_format="pandas")
            .groupby("b2").map_groups(final, batch_format="pandas"))


def tfidf_keywords(sf_dir: str, k: int = 3):
    """(doc_id, tok, score_q, rk) — each document's top-``k`` keywords by
    integer-quantized tf·idf: score = tf · ((N_docs·2^20) // df), ties
    broken by token text so the ranking is total and the oracle's
    row_number mirrors it exactly.

    Two-pass broadcast shape like unigram_lm_score: document frequencies
    aggregate through a per-batch distinct combiner (shuffle carries
    vocabulary), the small idf table broadcasts into the pass-2 map,
    which does the per-doc counting + ranking in one polars pass."""
    import ray.data

    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def local_df(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        d = pl.from_pandas(df[["doc_id", "text"]])
        vc = (d.with_columns(pl.col("text").str.split(" ").alias("t"))
              .drop("text").explode("t").unique(subset=["doc_id", "t"])
              .group_by("t").agg(pl.len().cast(pl.Int64).alias("n")))
        return vc.rename({"t": "tok"}).to_pandas()

    dfreq = (ds.map_batches(local_df, batch_format="pandas")
             .groupby("tok").sum("n").to_pandas())
    n_docs = int(pq_row_count("%s/documents.parquet" % sf_dir))
    idf = {t: (n_docs * _LM_Q) // int(c)
           for t, c in zip(dfreq["tok"], dfreq["sum(n)"])}

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        d = pl.from_pandas(df[["doc_id", "text"]])
        tf = (d.with_columns(pl.col("text").str.split(" ").alias("t"))
              .drop("text").explode("t")
              .group_by(["doc_id", "t"]).agg(pl.len().cast(pl.Int64)
                                             .alias("tf")))
        sc = tf.with_columns(
            (pl.col("tf") * pl.col("t").replace_strict(
                idf, default=0, return_dtype=pl.Int64)).alias("score_q"))
        sc = sc.sort(["doc_id", "score_q", "t"],
                     descending=[False, True, False])
        sc = sc.with_columns(
            (pl.int_range(pl.len()).over("doc_id") + 1).cast(pl.Int64)
            .alias("rk")).filter(pl.col("rk") <= k)
        return (sc.rename({"t": "tok"})
                .select(["doc_id", "tok", "score_q", "rk"]).to_pandas())

    return ds.map_batches(score, batch_format="pandas")


def pq_row_count(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(path).num_rows


def lang_counts(sf_dir: str):
    """(lang, n) — corpus language distribution (groupby aggregate)."""
    ds = _read_documents(sf_dir, columns=["doc_id", "lang"])
    out = ds.groupby("lang").count()
    return out.map_batches(lambda df: df.rename(columns={"count()": "n"}),
                           batch_format="pandas")


def pmi_bigrams(sf_dir: str, min_count: int = 5, k: int = 100):
    """(x, y, cxy, pmi_q20) — the global top-``k`` adjacent-token
    bigrams by pointwise mutual information, the word2phrase phrase-
    mining step (Mikolov et al., arXiv:1310.4546): PMI =
    ln(c_xy) − ln(B) + 2·ln(N) − ln(c_x) − ln(c_y) over bigrams seen at
    least ``min_count`` times, floor-quantized to 2^-20 so the score is
    an integer and the ordering oracle-exact (the five-term expression
    tree is written identically on both sides; every ln argument is an
    exact sub-2^53 double and ln itself is the shared libm call —
    ``math.log`` per surviving row, never numpy's SIMD log, which does
    not bit-match libm).

    Scale shape: unigram counts come from the vocabulary-sized
    broadcast-aggregate (``unigram_lm_score``'s shape); bigram counts
    take ONE hash exchange with a per-batch value_counts combiner (the
    shuffle carries the bigram VOCABULARY per batch, not occurrences);
    scoring and a per-bucket top-k happen inside the bucket, so the
    final single-group reduce sees at most nparts·k rows.
    """
    import math

    import ray

    ds = _read_documents(sf_dir, columns=["doc_id", "text"])
    nparts = max(4, int(ray.cluster_resources().get("CPU", 8)))

    vocab = (ds.map_batches(_local_token_counts_arrow,
                            batch_format="pyarrow", zero_copy_batch=True)
             .groupby("tok").sum("n").to_pandas())
    ucnt = {t: int(n) for t, n in zip(vocab["tok"], vocab["sum(n)"])}
    n_uni = int(vocab["sum(n)"].sum())

    def bigram_meta(tbl):
        import pyarrow as pa
        import pyarrow.compute as pc

        nb = pc.sum(pc.count_substring(tbl.column("text"),
                                       " ")).as_py() or 0  # Σ (len_d − 1)
        return pa.table({"nb": pa.array([int(nb)], pa.int64())})

    n_bi = int(ds.map_batches(bigram_meta, batch_format="pyarrow",
                              zero_copy_batch=True).sum("nb"))
    assert n_uni < (1 << 53) and n_bi < (1 << 53), "quantize counts first"
    ln_n = math.log(float(n_uni))
    ln_b = math.log(float(n_bi))

    def bigram_partials(tbl) -> pd.DataFrame:
        import polars as pl

        # adjacent pairs inside each doc: zip t with its own tail
        g = (pl.from_arrow(tbl.select(["text"]))
             .with_columns(pl.col("text").str.split(" ").alias("t"))
             .with_row_index("r")
             .explode("t")
             .with_columns(pl.col("t").shift(-1).over("r").alias("y"))
             .drop_nulls("y")
             .group_by(["t", "y"]).agg(pl.len().cast(pl.Int64).alias("n"))
             .rename({"t": "x"}).to_pandas())
        g["part"] = (pd.util.hash_pandas_object(
            g["x"] + "\x1f" + g["y"], index=False) % nparts).astype("int32")
        return g

    def score_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["x", "y"], as_index=False)["n"].sum()
        g = g[g["n"] >= min_count]
        rows = []
        for x, y, cxy in zip(g["x"], g["y"], g["n"]):
            pmi = (math.log(float(cxy)) - ln_b + 2.0 * ln_n
                   - math.log(float(ucnt[x])) - math.log(float(ucnt[y])))
            rows.append((x, y, int(cxy), math.floor(1048576.0 * pmi)))
        out = pd.DataFrame(rows, columns=["x", "y", "cxy", "pmi_q20"])
        out = out.sort_values(["pmi_q20", "x", "y"],
                              ascending=[False, True, True]).head(k)
        out["g"] = np.int8(0)
        return out.astype({"cxy": "int64", "pmi_q20": "int64"})

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.sort_values(["pmi_q20", "x", "y"],
                              ascending=[False, True, True]).head(k))
        return out[["x", "y", "cxy", "pmi_q20"]].reset_index(drop=True)

    return (ds.map_batches(bigram_partials, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("part").map_groups(score_bucket, batch_format="pandas")
            .groupby("g").map_groups(final_topk, batch_format="pandas"))


def rollup_stats(sf_dir: str):
    """(lang, source, n_docs, n_tokens) — the multi-level ROLLUP
    aggregate (detail, per-lang subtotal, grand total; subtotal slots
    hold ``'*'``) computed in ONE exchange: the per-batch combiner emits
    every grouping-set row pre-aggregated (≤ 3× the batch's distinct
    (lang, source) pairs — bounded by the key domain, never by rows), so
    the shuffle carries subtotal partials, not documents, and the reduce
    is a plain hash aggregate. The 100 TB shape for OLAP-style rollups:
    no second pass per grouping level.
    """
    ds = _read_documents(sf_dir, columns=["lang", "source", "text"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        base = pd.DataFrame({
            "lang": df["lang"],
            "source": df["source"],
            "n_docs": np.int64(1),
            "n_tokens": (df["text"].str.count(" ") + 1).astype("int64"),
        })
        levels = [base,
                  base.assign(source="*"),
                  base.assign(lang="*", source="*")]
        out = (pd.concat(levels, ignore_index=True)
               .groupby(["lang", "source"], as_index=False)
               [["n_docs", "n_tokens"]].sum())
        out["n_docs"] = out["n_docs"].astype("int64")
        out["n_tokens"] = out["n_tokens"].astype("int64")
        return out

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"sum(n_docs)": "n_docs",
                                  "sum(n_tokens)": "n_tokens"})

    return (ds.map_batches(partials, batch_format="pandas")
            .groupby(["lang", "source"]).sum(["n_docs", "n_tokens"])
            .map_batches(rename, batch_format="pandas"))


def freq_spectrum(sf_dir: str):
    """(k, n_types) — the corpus frequency spectrum (how many token
    TYPES occur exactly k times), the frequency-of-frequencies table
    Good–Turing smoothing and vocabulary-growth estimators consume.

    Two cascaded hash aggregates, both combiner-fed: the token-count
    aggregate ships per-batch value_counts partials (vocabulary rows,
    never occurrences), and the spectrum aggregate ships per-block
    count-of-counts partials (≤ distinct-k rows per block — a few dozen
    at any corpus size). Nothing driver-side.
    """
    ds = _read_documents(sf_dir, columns=["text"])

    def tok_partials(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].str.split(" ").explode().value_counts()
        return pd.DataFrame({"tok": vc.index.astype(str),
                             "n": vc.values.astype("int64")})

    def spectrum_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["sum(n)"].value_counts()
        return pd.DataFrame({"k": vc.index.astype("int64"),
                             "nt": vc.values.astype("int64")})

    return (ds.map_batches(tok_partials, batch_format="pandas")
            .groupby("tok").sum("n")
            .map_batches(spectrum_partial, batch_format="pandas")
            .groupby("k").sum("nt")
            .map_batches(lambda df: df.rename(columns={"sum(nt)":
                                                       "n_types"}),
                         batch_format="pandas"))


def dedup_substrings(sf_dir: str, l: int = 8):
    """(doc_id, text_dedup) — exact-substring deduplication REWRITE
    (Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better"): every token position covered by some length-``l`` window
    whose text occurs ≥2 times CORPUS-WIDE (including within one
    document) is dropped; the surviving tokens are re-joined in order.
    The companion of dup_ngram_stats that actually rewrites the corpus
    instead of scoring it.

    Scale shape — two exchanges, no quadratic blowup: (1) window rows
    (content string, doc, start) shuffle on hash(window); each bucket
    holds EVERY occurrence of its windows, so global occurrence counts
    and the covered (doc, start) pairs fall out locally — duplicated
    positions only (typically a small fraction) continue. (2) the
    covered starts co-group with the documents on hash(doc_id); the
    rebuild is fully vectorized per bucket (one explode, one int64
    (doc,pos) key array, np.isin anti-join, one groupby-join — no
    per-document Python loop). Production note: the window string is
    the shuffle key so the exact-content grouping is oracle-checkable;
    at 100 TB you would key on a 16-byte content hash instead (the
    exchange engine's trick), shrinking stage 1's rows ~4×.
    """
    import ray
    import ray.data

    nparts = max(4, int(ray.cluster_resources().get("CPU", 8)))
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def windows(tbl) -> pd.DataFrame:
        import polars as pl

        d = pl.from_arrow(tbl.select(["doc_id", "text"]))
        ex = (d.with_columns(pl.col("text").str.split(" ").alias("t"))
              .drop("text").explode("t"))
        ex = ex.with_columns(pl.int_range(pl.len()).over("doc_id")
                             .cast(pl.Int64).alias("s"))
        cols = [pl.col("t").shift(-k).over("doc_id") for k in range(1, l)]
        w = (ex.with_columns(
                pl.concat_str([pl.col("t")] + cols, separator=" ",
                              ignore_nulls=False).alias("w"))
             .drop_nulls("w").select(["doc_id", "s", "w"]))
        out = w.to_pandas()
        out["bucket"] = (pd.util.hash_pandas_object(out["w"], index=False)
                         % nparts).astype("int32")
        return out

    def dup_starts(df: pd.DataFrame) -> pd.DataFrame:
        occ = df.groupby("w")["w"].transform("size")
        dup = df[occ >= 2]
        did = dup["doc_id"].astype("int64")
        return pd.DataFrame({
            "doc_id": did, "s": dup["s"].astype("int64"),
            "text": "", "part": (did % nparts).astype("int32")})

    def doc_rows(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].astype("int64")
        return pd.DataFrame({
            "doc_id": did, "s": np.int64(-1),
            "text": df["text"].astype(str),
            "part": (did % nparts).astype("int32")})

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        docs = df[df["s"] < 0][["doc_id", "text"]]
        cov = df[df["s"] >= 0]
        toks = docs["text"].str.split(" ")
        ex = toks.explode()
        flat_doc = (docs["doc_id"].reindex(ex.index)
                    .to_numpy(dtype="int64"))
        pos = ex.groupby(level=0).cumcount().to_numpy(dtype="int64")
        # (doc, pos) packed into one int64 key (doc_id < 2^31, pos < 2^32)
        key = flat_doc * (1 << 32) + pos
        s = cov["s"].to_numpy(dtype="int64")
        cd = cov["doc_id"].to_numpy(dtype="int64")
        ckey = (np.repeat(cd, l) * (1 << 32) + np.repeat(s, l)
                + np.tile(np.arange(l, dtype="int64"), len(s)))
        keep = ~np.isin(key, ckey)
        kept = pd.DataFrame({"doc_id": flat_doc[keep],
                             "tok": ex.to_numpy()[keep]})
        agg = kept.groupby("doc_id")["tok"].agg(" ".join)
        out = agg.reindex(docs["doc_id"].to_numpy(dtype="int64")).fillna("")
        return pd.DataFrame({"doc_id": out.index.astype("int64"),
                             "text_dedup": out.to_numpy().astype(str)})

    cov = (ds.map_batches(windows, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bucket").map_groups(dup_starts,
                                         batch_format="pandas"))
    docs = ds.map_batches(doc_rows, batch_format="pandas")
    return (cov.union(docs).groupby("part")
            .map_groups(rebuild, batch_format="pandas"))


def vocab_growth(sf_dir: str, checkpoints: int = 10):
    """(checkpoint, n_docs, n_tokens, n_distinct) — the Heaps'-law
    vocabulary-growth curve: after each corpus prefix (docs ordered by
    doc_id; checkpoint k covers doc_id < k·N/K) the cumulative token
    count and cumulative DISTINCT-vocabulary size. The standard plot for
    sizing tokenizer vocabularies and testing corpus diversity
    (V(n) ≈ K·n^β, Heaps 1978).

    Scale shape — two combiner-fed passes, shuffles never carry token
    occurrences: pass A ships per-batch (token → min doc_id) partials
    into a vocabulary-row hash aggregate (high-cardinality key is fine
    for an AGGREGATE, like top_terms), then folds each token's global
    first occurrence into a ≤K-row interval histogram; pass B ships
    per-batch K-row occurrence histograms straight into a tiny
    aggregate. Final assembly is a K-row cumulative sum.
    """
    import pyarrow.parquet as pq

    K = checkpoints
    N = pq.ParquetFile("%s/documents.parquet" % sf_dir).metadata.num_rows
    cuts = np.array([(k * N) // K for k in range(1, K + 1)], dtype=np.int64)

    def interval(vals: np.ndarray) -> np.ndarray:
        # smallest j with val < cuts[j]; doc_id ≤ N-1 < cuts[K-1] always
        return np.searchsorted(cuts, vals, side="right")

    def hist_df(j: np.ndarray, weights: np.ndarray) -> pd.DataFrame:
        cnt = np.bincount(j, weights=weights, minlength=K).astype("int64")
        return pd.DataFrame({"j": np.arange(K, dtype="int64"), "n": cnt})

    # pass A — global first occurrence per token, then interval histogram
    def first_partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df[["doc_id", "text"]].copy()
        ex["tok"] = ex["text"].str.split(" ")
        ex = ex[["doc_id", "tok"]].explode("tok")
        g = ex.groupby("tok", sort=False)["doc_id"].min()
        return pd.DataFrame({"tok": g.index.astype(str),
                             "fd": g.to_numpy(dtype="int64")})

    def first_hist(df: pd.DataFrame) -> pd.DataFrame:
        j = interval(df["min(fd)"].to_numpy(dtype="int64"))
        return hist_df(j, np.ones(len(j)))

    distinct = (_read_documents(sf_dir, columns=["doc_id", "text"])
                .map_batches(first_partial, batch_format="pandas")
                .groupby("tok").min("fd")
                .map_batches(first_hist, batch_format="pandas")
                .groupby("j").sum("n").to_pandas())

    # pass B — cumulative token totals per interval
    def tok_hist(df: pd.DataFrame) -> pd.DataFrame:
        j = interval(df["doc_id"].to_numpy(dtype="int64"))
        n = df["text"].str.split(" ").str.len().to_numpy(dtype="int64")
        return hist_df(j, n)

    totals = (_read_documents(sf_dir, columns=["doc_id", "text"])
              .map_batches(tok_hist, batch_format="pandas")
              .groupby("j").sum("n").to_pandas())

    def cum(df: pd.DataFrame) -> np.ndarray:
        v = np.zeros(K, dtype=np.int64)
        v[df["j"].to_numpy(dtype="int64")] = df["sum(n)"].to_numpy("int64")
        return np.cumsum(v)

    return pd.DataFrame({
        "checkpoint": pd.Series(range(1, K + 1), dtype="int64"),
        "n_docs": pd.Series(cuts, dtype="int64"),
        "n_tokens": pd.Series(cum(totals), dtype="int64"),
        "n_distinct": pd.Series(cum(distinct), dtype="int64"),
    })


def zscore_quality(sf_dir: str, q: int = 1 << 20):
    """(doc_id, lang, n_tokens, z_q) — per-language standardization of
    the per-doc token count (the feature-normalization step quality
    classifiers and mixture samplers consume): z = (x − μ_lang)/σ_lang,
    emitted floor-quantized at ``q`` so the hash comparison is exact.

    Bit-exact across engines because the float tree is built ONLY from
    exactly-representable integers and exactly-rounded IEEE ops:
    z_q = floor(q · (n·x − S1) / sqrt(n·S2 − S1²)) with per-lang integer
    sufficient statistics (n, S1=Σx, S2=Σx²) all below 2^53; σ=0 groups
    (single-doc languages, constant features) pin z_q = 0.

    Scale shape: the statistics come from a per-batch combiner into a
    ≤|langs|-row hash aggregate, broadcast back via closure into one
    map-only scoring pass — zero data-sized all-to-alls.
    """
    stats = (_read_documents(sf_dir, columns=["lang", "text"])
             .map_batches(
                 lambda df: pd.DataFrame({
                     "lang": df["lang"].astype(str),
                     "x": df["text"].str.split(" ").str.len()
                     .astype("int64")})
                 .assign(x2=lambda d: d["x"] * d["x"],
                         n=np.int64(1))
                 .groupby("lang", as_index=False).sum(),
                 batch_format="pandas")
             .groupby("lang").sum(["x", "x2", "n"]).to_pandas())
    table = {r["lang"]: (int(r["sum(n)"]), int(r["sum(x)"]),
                         int(r["sum(x2)"]))
             for _, r in stats.iterrows()}

    def score(df: pd.DataFrame) -> pd.DataFrame:
        x = df["text"].str.split(" ").str.len().to_numpy(dtype="int64")
        langs = df["lang"].astype(str)
        n = np.array([table[l][0] for l in langs], dtype=np.int64)
        s1 = np.array([table[l][1] for l in langs], dtype=np.int64)
        s2 = np.array([table[l][2] for l in langs], dtype=np.int64)
        var_int = n * s2 - s1 * s1            # exact: < 2^53
        num = (n * x - s1).astype(np.float64)  # exact: < 2^53
        den = np.sqrt(var_int.astype(np.float64))
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.floor(float(q) * (num / den))
        z = np.where(var_int == 0, 0.0, z)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "lang": langs,
            "n_tokens": pd.Series(x, dtype="int64", index=df.index),
            "z_q": pd.Series(z, dtype="int64", index=df.index)})

    return (_read_documents(sf_dir, columns=["doc_id", "lang", "text"])
            .map_batches(score, batch_format="pandas"))


def token_entropy(sf_dir: str, q: int = 1 << 20):
    """(doc_id, n_tokens, nlogn_q, slogc_q) — per-document token-
    distribution entropy in EXACT integer components: the Shannon
    entropy of the token histogram is
    H = ln(N) − (Σ cᵢ·ln cᵢ)/N = (nlogn_q/N − slogc_q/N)/q up to
    quantization, a standard diversity/quality signal (low H = highly
    repetitive boilerplate). Emitting the two floor-quantized integer
    sums instead of H itself makes the float work per-TERM (each term
    floor-quantized before an order-independent integer sum) so the
    hash comparison is bit-exact — the same trick as unigram_lm_score.

    Map-only single pass: the token histogram is an in-batch polars
    hash aggregate; nothing crosses a shuffle.
    """
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        d = pl.from_pandas(df[["doc_id", "text"]])
        per = (d.with_columns(pl.col("text").str.split(" ").alias("t"))
               .drop("text").explode("t")
               .group_by(["doc_id", "t"]).agg(pl.len().alias("c"))
               .to_pandas())
        c = per["c"].to_numpy(dtype="float64")
        term = np.floor(float(q) * (c * np.log(c))).astype("int64")
        g = (per.assign(term=term)
             .groupby("doc_id", as_index=False)
             .agg(n_tokens=("c", "sum"), slogc_q=("term", "sum")))
        n = g["n_tokens"].to_numpy(dtype="float64")
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "n_tokens": g["n_tokens"].astype("int64"),
            "nlogn_q": np.floor(float(q) * (n * np.log(n)))
            .astype("int64"),
            "slogc_q": g["slogc_q"].astype("int64")})

    return ds.map_batches(fn, batch_format="pandas")


_PIVOT_LANGS = ("de", "en", "es", "fr", "zh")


def pivot_counts(sf_dir: str):
    """(source, n_de, n_en, n_es, n_fr, n_zh, n_other) — the OLAP
    crosstab/PIVOT: document counts per source, one column per language.
    A pivot is just a conditional aggregation, which makes it fully
    combiner-friendly: each batch emits its local ≤|sources|-row
    crosstab, one small hash aggregate sums the partials — the shuffle
    carries crosstab rows, never documents. Unknown languages fold into
    ``n_other`` so the column set is schema-stable at any corpus.
    """
    ds = _read_documents(sf_dir, columns=["source", "lang"])
    cols = ["n_%s" % l for l in _PIVOT_LANGS]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"source": df["source"].astype(str)})
        lang = df["lang"].astype(str)
        known = np.zeros(len(df), dtype=bool)
        for l, c in zip(_PIVOT_LANGS, cols):
            m = (lang == l).to_numpy()
            out[c] = m.astype("int64")
            known |= m
        out["n_other"] = (~known).astype("int64")
        return out.groupby("source", as_index=False).sum()

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby("source").sum(cols + ["n_other"]))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        ren = {"sum(%s)" % c: c for c in cols + ["n_other"]}
        df = df.rename(columns=ren)
        for c in cols + ["n_other"]:
            df[c] = df[c].astype("int64")
        return df[["source"] + cols + ["n_other"]]

    return agg.map_batches(finish, batch_format="pandas")


def normalize_text(sf_dir: str):
    """(doc_id, n_chars_norm, norm_md5) — corpus text canonicalization
    (the pre-dedup/pre-tokenization cleanup pass): lowercase, strip
    non-alphanumeric characters to spaces, collapse whitespace runs,
    trim. Emitting the md5 of the normalized text (not the text) keeps
    the row fixed-width — at 100 TB the digest is what downstream exact
    dedup consumes anyway. Map-only, vectorized pandas str ops; the
    character classes are ASCII-explicit so Python re and DuckDB RE2
    provably agree (the quality_ratios constraint).
    """
    import hashlib

    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        s = (df["text"].str.lower()
             .str.replace(r"[^a-z0-9 ]", " ", regex=True)
             .str.replace(r" +", " ", regex=True)
             .str.strip())
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_chars_norm": s.str.len().astype("int64"),
            "norm_md5": [hashlib.md5(t.encode()).hexdigest() for t in s],
        })

    return ds.map_batches(fn, batch_format="pandas")


def top_terms_by_lang(sf_dir: str, k: int = 10,
                      num_partitions: Optional[int] = None):
    """(lang, tok, n, rank) — the k most frequent tokens PER LANGUAGE
    (grouped top-k over a global aggregate — per-group vocabularies for
    lang-specific tokenizers/stopword lists). Ties by token, so the
    ranking is total and deterministic.

    Scale shape: per-batch (lang, tok) value_counts combiner (shuffle
    carries per-block vocabulary rows, never token occurrences), one
    hash(lang, tok)-bucket co-group completes exact counts, then a
    per-lang top-k combiner feeds a tiny final reduce — ≤ nparts·k rows
    per language cross the last exchange, never the vocabulary.
    """
    if num_partitions is None:
        import ray

        num_partitions = max(4, int(ray.cluster_resources().get("CPU", 8)))
    nparts = num_partitions
    ds = _read_documents(sf_dir, columns=["lang", "text"])

    def local_counts(df: pd.DataFrame) -> pd.DataFrame:
        ex = df[["lang"]].copy()
        ex["tok"] = df["text"].str.split(" ")
        ex = ex.explode("tok")
        g = (ex.groupby(["lang", "tok"], as_index=False).size()
             .rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        g["bucket"] = ((pd.util.hash_pandas_object(g["lang"], index=False)
                        * 31 + pd.util.hash_pandas_object(g["tok"],
                                                          index=False))
                       % nparts).astype("int32")
        return g

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        # exact counts (every (lang, tok) copy landed here), then a
        # per-lang partial top-k so only candidate rows continue
        g = df.groupby(["lang", "tok"], as_index=False)["n"].sum()
        g = (g.sort_values(["lang", "n", "tok"],
                           ascending=[True, False, True])
             .groupby("lang", sort=False).head(k))
        g["n"] = g["n"].astype("int64")
        return g[["lang", "tok", "n"]]

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lang, g in df.groupby("lang", sort=False):
            g = g.sort_values(["n", "tok"],
                              ascending=[False, True]).head(k)
            g = g.assign(rank=pd.Series(range(1, len(g) + 1),
                                        dtype="int64", index=g.index))
            out.append(g[["lang", "tok", "n", "rank"]])
        return pd.concat(out, ignore_index=True)

    return (ds.map_batches(local_counts, batch_format="pandas")
            .groupby("bucket").map_groups(partial_topk,
                                          batch_format="pandas")
            .repartition(1)
            .map_batches(final_topk, batch_format="pandas"))


def langid_confusion(sf_dir: str):
    """(lang, lang_pred, n) — the classifier-evaluation CONFUSION MATRIX
    of the heuristic language identifier against the labeled ``lang``
    column (the accuracy/precision/recall table every model-scoring
    pipeline ends with — all three divide out exactly from these
    integer cells). Map-only classification with a per-batch crosstab
    combiner; the shuffle carries ≤ |langs|² cells per batch, never
    documents.
    """
    ds = _read_documents(sf_dir, columns=["lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({
                "lang": df["lang"].astype(str),
                "lang_pred": [classify_lang(t) for t in df["text"]]})
             .groupby(["lang", "lang_pred"], as_index=False).size()
             .rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        return g

    out = (ds.map_batches(partial, batch_format="pandas")
           .groupby(["lang", "lang_pred"]).sum("n"))
    return out.map_batches(
        lambda df: df.rename(columns={"sum(n)": "n"})
        .astype({"n": "int64"}), batch_format="pandas")


def chi2_terms(sf_dir: str, q: int = 1 << 20):
    """(lang, tok, chi2_q) — χ² term–language association (the classic
    feature-selection score for supervised text classifiers), computed
    EXACTLY: with a = occurrences of ``tok`` in ``lang``, b = other
    tokens in lang, c = tok elsewhere, d = the rest, and N the corpus
    occurrence total, chi2_q = ⌊q·N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))⌋
    — every operand a Python bigint (the squares overflow int64 but not
    arbitrary precision / HUGEINT), so the oracle is bit-exact.

    Scale shape: one vocabulary-row combiner ((lang, tok) value_counts
    per batch) into a tiny aggregate; the χ² arithmetic runs over the
    |langs|·|vocab| contingency table — model-sized state, never
    documents.
    """
    ds = _read_documents(sf_dir, columns=["lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df[["lang"]].copy()
        ex["tok"] = df["text"].str.split(" ")
        g = (ex.explode("tok")
             .groupby(["lang", "tok"], as_index=False).size()
             .rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        return g

    counts = (ds.map_batches(partial, batch_format="pandas")
              .to_pandas()
              .groupby(["lang", "tok"], as_index=False)["n"].sum())
    tot = int(counts["n"].sum())
    lang_tot = counts.groupby("lang")["n"].sum().to_dict()
    tok_tot = counts.groupby("tok")["n"].sum().to_dict()

    rows = []
    for lang, tok, a in counts.itertuples(index=False):
        a = int(a)
        b = int(lang_tot[lang]) - a
        c = int(tok_tot[tok]) - a
        d = tot - a - b - c
        num = q * tot * (a * d - b * c) ** 2
        den = (a + b) * (c + d) * (a + c) * (b + d)
        rows.append((lang, tok, num // den if den else 0))
    out = pd.DataFrame(rows, columns=["lang", "tok", "chi2_q"])
    out["chi2_q"] = out["chi2_q"].astype("int64")
    return out


def linreg_tokens(sf_dir: str):
    """One row (n_docs, sx, sy, sxx, sxy, slope_q6, intercept_q6) —
    ordinary least squares of tokens-per-doc (y) against chars-per-doc
    (x), fitted from EXACT integer sufficient statistics: the
    sufficient-statistics pattern every distributed ML fit reduces to
    (means/covariances shrink to a handful of scalars; the model solves
    closed-form driver-side from output-sized partials).

    Map-only: each batch emits one 5-int partial row (no shuffle at
    all); the driver folds partials in arbitrary-precision Python ints,
    so the closed-form solve is overflow-proof at any scale. slope and
    intercept quantize by TRUNCATING division toward zero — DuckDB's
    ``//`` truncates while Python's floors, so the sign-split mirrors
    the SQL exactly (CLAUDE.md gotcha).
    """
    import ray.data

    ds = _bread("%s/documents.parquet" % sf_dir,
                               columns=["text", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["n_chars"].to_numpy(dtype="int64")
        y = (df["text"].str.count(" ").to_numpy(dtype="int64") + 1)
        return pd.DataFrame({
            "n": [len(df)], "sx": [int(x.sum())], "sy": [int(y.sum())],
            "sxx": [int((x * x).sum())], "sxy": [int((x * y).sum())]})

    t = ds.map_batches(partial, batch_format="pandas").to_pandas()
    n, sx, sy = int(t["n"].sum()), int(t["sx"].sum()), int(t["sy"].sum())
    sxx, sxy = int(t["sxx"].sum()), int(t["sxy"].sum())

    def tdiv(a: int, b: int) -> int:
        # truncate toward zero (DuckDB // semantics; Python // floors)
        s = -1 if (a < 0) != (b < 0) else 1
        return s * (abs(a) // abs(b))

    den = n * sxx - sx * sx
    slope_q6 = tdiv(10**6 * (n * sxy - sx * sy), den)
    intercept_q6 = tdiv(10**6 * (sy * sxx - sx * sxy), den)
    return pd.DataFrame({
        "n_docs": pd.Series([n], dtype="int64"),
        "sx": pd.Series([sx], dtype="int64"),
        "sy": pd.Series([sy], dtype="int64"),
        "sxx": pd.Series([sxx], dtype="int64"),
        "sxy": pd.Series([sxy], dtype="int64"),
        "slope_q6": pd.Series([slope_q6], dtype="int64"),
        "intercept_q6": pd.Series([intercept_q6], dtype="int64")})


def oov_rate(sf_dir: str, num_partitions=None):
    """(lang, n_tokens, n_oov, oov_q6) — out-of-vocabulary rate of a
    held-out split against a vocabulary trained on the other split
    (doc_id parity defines the deterministic train/eval split): the
    tokenizer-coverage check every corpus/tokenizer pairing needs
    before training. oov_q6 is the integer floor of 10⁶·oov/total.

    Scale shape: both sides collapse to vocabulary-row combiners
    before the one exchange — train batches emit distinct tokens, eval
    batches emit (token, lang, n) counts — so the hash(token) co-group
    carries vocabularies, never token occurrences. Equal tokens hash to
    the same bucket, making the membership test exact; the per-bucket
    output is per-lang partials, reduced by a |langs|-row hash
    aggregate.
    """
    import numpy as np
    import ray

    ds = _read_documents(sf_dir, columns=["doc_id", "text", "lang"])
    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    def sides(df: pd.DataFrame) -> pd.DataFrame:
        even = df["doc_id"] % 2 == 0
        toks = df["text"].str.split(" ")
        tr = toks[even].explode().dropna().drop_duplicates()
        train = pd.DataFrame({"tok": tr.astype(str), "lang": "",
                              "n": np.int64(0), "side": np.int8(0)})
        ev = (pd.DataFrame({"lang": df.loc[~even, "lang"].astype(str),
                            "tok": toks[~even]})
              .explode("tok"))
        ev["tok"] = ev["tok"].astype(str)
        g = ev.groupby(["tok", "lang"], as_index=False).size()
        evs = pd.DataFrame({"tok": g["tok"], "lang": g["lang"],
                            "n": g["size"].astype("int64"),
                            "side": np.int8(1)})
        out = pd.concat([train, evs], ignore_index=True)
        out["bucket"] = (pd.util.hash_pandas_object(out["tok"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    def cogroup(df: pd.DataFrame) -> pd.DataFrame:
        vocab = set(df.loc[df["side"] == 0, "tok"])
        ev = df[df["side"] == 1]
        oov = ~ev["tok"].isin(vocab)
        g = (ev.assign(oov_n=ev["n"].where(oov, 0))
             .groupby("lang", as_index=False)
             .agg(n_tokens=("n", "sum"), n_oov=("oov_n", "sum")))
        return pd.DataFrame({"lang": g["lang"].astype(str),
                             "n_tokens": g["n_tokens"].astype("int64"),
                             "n_oov": g["n_oov"].astype("int64")})

    from ray.data.aggregate import Sum

    partials = (ds.map_batches(sides, batch_format="pandas")
                .groupby("bucket").map_groups(cogroup,
                                              batch_format="pandas"))
    out = partials.groupby("lang").aggregate(Sum("n_tokens"),
                                             Sum("n_oov"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        nt = df["sum(n_tokens)"].astype("int64")
        no = df["sum(n_oov)"].astype("int64")
        return pd.DataFrame({
            "lang": df["lang"].astype(str), "n_tokens": nt, "n_oov": no,
            "oov_q6": (10**6 * no // nt).astype("int64")})

    return out.map_batches(finish, batch_format="pandas")


def doc_rank_by_length(sf_dir: str):
    """(doc_id, lang, n_chars, rnk, n_lang) — every document's exact
    RANK() within its language by length, WITHOUT a global sort: the
    counting-sort ranking trick. Pass 1 reduces the corpus to a
    per-(lang, length) histogram (combiner — the exchange carries
    histogram rows, never documents; lengths are a bounded vocabulary);
    the cumulative strictly-smaller counts per lang broadcast via
    closure and pass 2 assigns rank = #smaller + 1 map-side (ties share
    the min rank, mirroring SQL RANK). Scale shape: one tiny aggregate
    plus one map-only pass — no document ever crosses the wire.
    """
    import numpy as np
    import ray.data

    ds = _read_documents(sf_dir, columns=["doc_id", "lang", "n_chars"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["lang", "n_chars"], as_index=False).size()
             .rename(columns={"size": "n"}))
        return pd.DataFrame({"lang": g["lang"].astype(str),
                             "n_chars": g["n_chars"].astype("int64"),
                             "n": g["n"].astype("int64")})

    h = (ds.map_batches(hist, batch_format="pandas").to_pandas()
         .groupby(["lang", "n_chars"], as_index=False)["n"].sum()
         .sort_values(["lang", "n_chars"]))
    h["cum"] = h.groupby("lang")["n"].cumsum() - h["n"]  # strictly smaller
    totals = h.groupby("lang")["n"].sum().to_dict()
    smaller = {(l, int(c)): int(v) for l, c, v in
               zip(h["lang"], h["n_chars"], h["cum"])}

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        keys = list(zip(df["lang"], df["n_chars"].astype("int64")))
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "lang": df["lang"].astype(str),
            "n_chars": df["n_chars"].astype("int64"),
            "rnk": pd.Series([smaller[k] + 1 for k in keys],
                             dtype="int64", index=df.index),
            "n_lang": df["lang"].map(totals).astype("int64")})

    return ds.map_batches(rank, batch_format="pandas")


def division_tokens(sf_dir: str, num_partitions=None):
    """(tok) — tokens that occur in EVERY language of the corpus:
    relational DIVISION (the FOR-ALL join, the one relational shape
    plain join/aggregate pipelines get wrong). Division reduces to
    "count of distinct divisors per candidate == |divisor set|".

    Scale shape: per-batch distinct (token, lang) pairs (vocabulary-row
    combiner), ONE hash(token) co-group where each token's lang set is
    complete — count distinct langs vectorized, keep == |langs|. The
    divisor cardinality comes from a tiny per-batch lang-set union.
    """
    import ray

    ds = _read_documents(sf_dir, columns=["text", "lang"])
    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        e = (pd.DataFrame({"lang": df["lang"].astype(str),
                           "tok": df["text"].str.split(" ")})
             .explode("tok"))
        g = e.drop_duplicates()
        return pd.DataFrame({
            "tok": g["tok"].astype(str), "lang": g["lang"],
            "bucket": (pd.util.hash_pandas_object(g["tok"],
                                                  index=False)
                       % nparts).astype("int32")})

    # divisor set: the distinct langs (config-sized)
    langs = (ds.map_batches(
        lambda df: pd.DataFrame({"lang": df["lang"].unique()}),
        batch_format="pandas").to_pandas()["lang"].unique())
    n_langs = len(langs)

    def divide(df: pd.DataFrame) -> pd.DataFrame:
        g = (df[["tok", "lang"]].drop_duplicates()
             .groupby("tok", as_index=False).size())
        keep = g[g["size"] == n_langs]
        return pd.DataFrame({"tok": keep["tok"].astype(str)})

    return (ds.map_batches(pairs, batch_format="pandas")
            .groupby("bucket").map_groups(divide,
                                          batch_format="pandas"))


def cube_stats(sf_dir: str):
    """(lang, source, n_docs, sum_chars) over GROUP BY CUBE(lang,
    source) — all four grouping sets (detail, per-lang, per-source,
    grand total) with a '*' sentinel for the rolled-up level: the OLAP
    CUBE materialization (rollup_stats covers the hierarchy; this is
    the full lattice).

    Scale shape: the per-batch combiner emits every grouping-set row
    pre-aggregated in ONE pass (≤ 4·|lang×source| rows per batch), so
    the exchange carries cube cells, never documents; one small hash
    aggregate finishes.
    """
    ds = _read_documents(sf_dir, columns=["lang", "source", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        base = pd.DataFrame({"lang": df["lang"].astype(str),
                             "source": df["source"].astype(str),
                             "n_chars": df["n_chars"].astype("int64")})
        frames = []
        for gl, gs in ((True, True), (True, False), (False, True),
                       (False, False)):
            t = base.copy()
            if not gl:
                t["lang"] = "*"
            if not gs:
                t["source"] = "*"
            g = t.groupby(["lang", "source"], as_index=False).agg(
                n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
            frames.append(g)
        out = pd.concat(frames, ignore_index=True)
        out["n_docs"] = out["n_docs"].astype("int64")
        out["sum_chars"] = out["sum_chars"].astype("int64")
        return out

    from ray.data.aggregate import Sum

    out = (ds.map_batches(partial, batch_format="pandas")
           .groupby(["lang", "source"])
           .aggregate(Sum("n_docs"), Sum("sum_chars")))
    return out.map_batches(
        lambda df: pd.DataFrame({
            "lang": df["lang"].astype(str),
            "source": df["source"].astype(str),
            "n_docs": df["sum(n_docs)"].astype("int64"),
            "sum_chars": df["sum(sum_chars)"].astype("int64")}),
        batch_format="pandas")


def unpivot_quality(sf_dir: str):
    """(doc_id, metric, value) — UNPIVOT/melt of the per-doc quality
    metrics into long form (the OLAP inverse of pivot_counts; what
    metric stores and feature pipelines ingest). Map-only: each batch
    melts locally, no shuffle; metric order is schema-stable.
    """
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        wide = pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_chars": df["text"].str.len().astype("int64"),
            "n_tokens": toks.str.len().astype("int64"),
            "n_uniq_tokens": pd.Series([len(set(t)) for t in toks],
                                       dtype="int64", index=df.index)})
        out = wide.melt(id_vars=["doc_id"], var_name="metric",
                        value_name="value")
        return out.astype({"doc_id": "int64", "metric": str,
                           "value": "int64"})

    return ds.map_batches(melt, batch_format="pandas")


def mad_chars(sf_dir: str):
    """(lang, median_chars, mad_chars) — exact per-lang median and
    median absolute deviation of document length: the robust outlier
    statistics (the MAD-based length filter quality pipelines prefer
    over mean/σ). Median rule = lower median (element at 0-indexed
    rank (n−1)//2), matching DuckDB ``quantile_disc(0.5)``.

    Scale shape: ONE corpus pass — the per-(lang, length) histogram
    combiner (the doc_rank_by_length exchange); both medians derive
    driver-side from that output-sized histogram, because the
    |x − med| histogram is a pure fold of the length histogram. No
    second pass, no sort.
    """
    import ray.data

    ds = _read_documents(sf_dir, columns=["lang", "n_chars"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["lang", "n_chars"], as_index=False).size()
             .rename(columns={"size": "n"}))
        return pd.DataFrame({"lang": g["lang"].astype(str),
                             "n_chars": g["n_chars"].astype("int64"),
                             "n": g["n"].astype("int64")})

    h = (ds.map_batches(hist, batch_format="pandas").to_pandas()
         .groupby(["lang", "n_chars"], as_index=False)["n"].sum())

    def lower_median(vals: np.ndarray, cnts: np.ndarray) -> int:
        order = np.argsort(vals)
        vals, cnts = vals[order], cnts[order]
        target = (cnts.sum() - 1) // 2 + 1  # 1-based rank
        cum = np.cumsum(cnts)
        return int(vals[np.searchsorted(cum, target)])

    rows = []
    for lang, g in h.groupby("lang"):
        v = g["n_chars"].to_numpy("int64")
        c = g["n"].to_numpy("int64")
        med = lower_median(v, c)
        dev = np.abs(v - med)
        dd = pd.DataFrame({"d": dev, "c": c}).groupby(
            "d", as_index=False)["c"].sum()
        mad = lower_median(dd["d"].to_numpy("int64"),
                           dd["c"].to_numpy("int64"))
        rows.append((lang, med, mad))
    out = pd.DataFrame(rows, columns=["lang", "median_chars",
                                      "mad_chars"])
    return out.astype({"lang": str, "median_chars": "int64",
                       "mad_chars": "int64"}).sort_values("lang") \
        .reset_index(drop=True)


def mutual_information(sf_dir: str):
    """(lang, source, n_ij, mi_term_q20) + implicit total — the
    per-cell decomposition of the MUTUAL INFORMATION between the
    ``lang`` and ``source`` columns: for each contingency cell,
    mi_term_q20 = n_ij · ⌊2^20 · ln((n_ij·N)/(n_i·m_j))⌋ (the plug-in
    MI estimate is Σ terms / (N·2^20) nats) — the dataset-association
    audit (is language confounded with source? stratified sampling and
    leakage checks start here). Every ratio is a division of exact
    sub-2^53 integer products, ln is the shared-libm portable call,
    and each term floor-quantizes BEFORE anything sums — the SQL
    oracle hash-matches bit-for-bit, per cell.

    Scale shape: per-batch (lang, source) crosstab combiner — the
    exchange carries cells, never documents; marginals and the term
    arithmetic run on the |langs|·|sources| output grid driver-side.
    Zero all-to-alls.
    """
    import math

    ds = _read_documents(sf_dir, columns=["lang", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "source"]).size().reset_index(name="n")
        return g

    t = (ds.map_batches(partial, batch_format="pandas").to_pandas()
         .groupby(["lang", "source"], as_index=False)["n"].sum())
    N = int(t["n"].sum())
    ni = t.groupby("lang")["n"].sum()
    mj = t.groupby("source")["n"].sum()
    terms = []
    for r in t.itertuples():
        ratio = float(int(r.n) * N) / float(int(ni[r.lang])
                                            * int(mj[r.source]))
        terms.append(int(r.n) * math.floor(1048576.0 * math.log(ratio)))
    return pd.DataFrame({
        "lang": t["lang"].astype(str),
        "source": t["source"].astype(str),
        "n_ij": t["n"].astype("int64"),
        "mi_term_q20": pd.Series(terms, dtype="int64")}) \
        .sort_values(["lang", "source"]).reset_index(drop=True)


def psi_drift(sf_dir: str):
    """(lang, n_a, n_b, psi_term_q) — Population Stability Index
    terms between two deterministic halves of the corpus (md5(doc_id)
    parity — in production the two sides are yesterday's and today's
    crawl): per language bucket, term = (p_A − p_B)·ln(p_A/p_B) with
    add-one smoothing so empty cells stay finite; Σ terms is the PSI
    drift score (>0.2 conventionally flags distribution shift).

    Exactness contract: the counts are exact integers; each term is
    ONE fixed-order IEEE float tree (two exactly-rounded divisions, a
    subtraction, an exactly-representable integer ratio into the
    shared libm ln, one multiply, floor at 10⁶) mirrored literally in
    the SQL oracle — the ab_test_zstat pattern.

    Scale shape: map-only per-batch (lang, split) count combiner,
    zero all-to-alls; the term fold runs on the |langs|-row frame
    driver-side.
    """
    import math

    from .traindata import _md5_u64

    ds = _read_documents(sf_dir, columns=["doc_id", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sp = np.array([_md5_u64("%d:psi" % d) % 2
                       for d in df["doc_id"]], dtype="int64")
        t = pd.DataFrame({"lang": df["lang"].astype(str), "sp": sp})
        g = t.groupby(["lang", "sp"]).size().reset_index(name="n")
        return g

    t = (ds.map_batches(partial, batch_format="pandas").to_pandas()
         .groupby(["lang", "sp"], as_index=False)["n"].sum())
    piv = t.pivot_table(index="lang", columns="sp", values="n",
                        fill_value=0, aggfunc="sum")
    langs = sorted(piv.index)
    a = {l: int(piv.loc[l, 0]) if 0 in piv.columns else 0
         for l in langs}
    b = {l: int(piv.loc[l, 1]) if 1 in piv.columns else 0
         for l in langs}
    L, A, B = len(langs), sum(a.values()), sum(b.values())
    rows = []
    for l in langs:
        a1, b1 = a[l] + 1, b[l] + 1
        A1, B1 = A + L, B + L
        term = ((float(a1) / float(A1) - float(b1) / float(B1))
                * math.log(float(a1 * B1) / float(b1 * A1)))
        rows.append((l, a[l], b[l], math.floor(1e6 * term)))
    return pd.DataFrame(rows, columns=["lang", "n_a", "n_b",
                                       "psi_term_q"]).astype(
        {"n_a": "int64", "n_b": "int64", "psi_term_q": "int64"})


def auc_eval(sf_dir: str):
    """One row (n_pos, n_neg, u_x2, auc_ppm) — EXACT ROC-AUC of the
    stopword-count score against the hidden stopword-density rule
    (the perceptron_langid target): AUC is the Mann–Whitney U rank
    statistic, U = R⁺ − n⁺(n⁺+1)/2, with AVERAGE ranks for tied
    scores — doubled (u_x2) so ties stay integral, then
    auc_ppm = 10⁶·u_x2 // (2·n⁺·n⁻). Tie handling rides the same
    tie-order-free rank-run algebra as gini_values: per score value
    with p positives among c tied items after N items,
    2·R⁺ += p·(2N + c + 1). The classifier-evaluation op beyond
    accuracy (langid_confusion) — threshold-free ranking quality.

    Scale shape: the score domain is bounded (0–15 stopwords), so a
    per-batch (score, y) count combiner collapses the corpus into
    ≤ 32 cells per batch; the rank fold is constant-size driver work.
    Zero all-to-alls.
    """
    ds = _read_documents(sf_dir, columns=["text"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].astype(str).str.split(" ")
        f2 = toks.str.len().clip(upper=63).to_numpy("int64")
        stops = {"the", "and", "of", "to", "a", "in", "is"}
        f3 = np.array([min(sum(1 for t in ts if t in stops), 15)
                       for ts in df["text"].astype(str).str.lower()
                       .str.split(" ")], dtype="int64")
        y = (16 * f3 > f2).astype("int64")
        t = pd.DataFrame({"s": f3, "y": y})
        g = t.groupby(["s", "y"]).size().reset_index(name="n")
        return g

    h = (ds.map_batches(cells, batch_format="pandas").to_pandas()
         .groupby(["s", "y"], as_index=False)["n"].sum())
    piv = h.pivot_table(index="s", columns="y", values="n",
                        fill_value=0, aggfunc="sum").sort_index()
    np_, ng, r2, before = 0, 0, 0, 0
    for s, row in piv.iterrows():
        p = int(row.get(1, 0))
        g = int(row.get(0, 0))
        c = p + g
        r2 += p * (2 * before + c + 1)
        before += c
        np_ += p
        ng += g
    u_x2 = r2 - np_ * (np_ + 1)
    return pd.DataFrame({
        "n_pos": pd.Series([np_], dtype="int64"),
        "n_neg": pd.Series([ng], dtype="int64"),
        "u_x2": pd.Series([u_x2], dtype="int64"),
        "auc_ppm": pd.Series([(10**6 * u_x2) // (2 * np_ * ng)],
                             dtype="int64")})


def pr_curve(sf_dir: str):
    """(threshold, tp, fp, fn, precision_ppm, recall_ppm) — the full
    precision/recall curve of the stopword-count score against the
    hidden density rule, one row per integer threshold (predict
    positive iff score ≥ t, t = 0..16): the threshold-sweep
    evaluation that picks an operating point after auc_eval ranks
    threshold-free. Ratios are exact integer ppm (floor division of
    exact counts).

    Scale shape: the same ≤32-cell (score, y) combiner as auc_eval —
    one pass, zero all-to-alls; the sweep is a reversed cumulative
    sum over the 16-row histogram driver-side.
    """
    ds = _read_documents(sf_dir, columns=["text"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].astype(str).str.split(" ")
        f2 = toks.str.len().clip(upper=63).to_numpy("int64")
        stops = {"the", "and", "of", "to", "a", "in", "is"}
        f3 = np.array([min(sum(1 for t in ts if t in stops), 15)
                       for ts in df["text"].astype(str).str.lower()
                       .str.split(" ")], dtype="int64")
        y = (16 * f3 > f2).astype("int64")
        t = pd.DataFrame({"s": f3, "y": y})
        return t.groupby(["s", "y"]).size().reset_index(name="n")

    h = (ds.map_batches(cells, batch_format="pandas").to_pandas()
         .groupby(["s", "y"], as_index=False)["n"].sum())
    pos = np.zeros(17, dtype="int64")
    neg = np.zeros(17, dtype="int64")
    for _, r in h.iterrows():
        (pos if int(r["y"]) == 1 else neg)[int(r["s"])] += int(r["n"])
    n_pos = int(pos.sum())
    rows = []
    for t in range(17):
        tp = int(pos[t:].sum())
        fp = int(neg[t:].sum())
        fn = n_pos - tp
        prec = (10**6 * tp) // (tp + fp) if tp + fp else 10**6
        rec = (10**6 * tp) // n_pos if n_pos else 10**6
        rows.append((t, tp, fp, fn, prec, rec))
    return pd.DataFrame(rows, columns=[
        "threshold", "tp", "fp", "fn", "precision_ppm",
        "recall_ppm"]).astype("int64")


def stump_split(sf_dir: str):
    """(feature, threshold, n_left, pos_left, n_right, pos_right,
    gini_left_ppm, gini_right_ppm, weighted_ppm) — the decision-tree
    NODE-SPLIT sweep: for each integer feature (0 = clipped token
    count, domain 0–63; 1 = clipped stopword count, domain 0–15) and
    every threshold t, split the corpus into left = (x < t) /
    right = (x ≥ t) against the hidden stopword-density label
    (the perceptron_langid / auc_eval target) and score the split by
    exact integer Gini impurity: for a side with n rows, p positives
    and g = n−p negatives, gini_ppm = 10⁶·(n² − p² − g²) // n²
    (0 for an empty side) and weighted_ppm =
    (n_l·gini_l + n_r·gini_r) // N. Every ratio is a floor division
    of exact non-negative integers, so the DuckDB oracle replays the
    sweep bit-for-bit; a tree learner takes the argmin row.

    Scale shape: the corpus collapses into a per-batch
    (feature, value, y) count combiner — ≤ 2·(64+16) cells per batch
    regardless of data size; the threshold sweep is a cumulative walk
    over the 80-bin histogram driver-side. Zero all-to-alls, one pass.
    """
    ds = _read_documents(sf_dir, columns=["text"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].astype(str).str.split(" ")
        f2 = toks.str.len().clip(upper=63).to_numpy("int64")
        stops = {"the", "and", "of", "to", "a", "in", "is"}
        f3 = np.array([min(sum(1 for t in ts if t in stops), 15)
                       for ts in df["text"].astype(str).str.lower()
                       .str.split(" ")], dtype="int64")
        y = (16 * f3 > f2).astype("int64")
        t = pd.concat([
            pd.DataFrame({"feature": 0, "v": f2, "y": y}),
            pd.DataFrame({"feature": 1, "v": f3, "y": y}),
        ])
        return (t.groupby(["feature", "v", "y"]).size()
                .reset_index(name="n"))

    h = (ds.map_batches(cells, batch_format="pandas").to_pandas()
         .groupby(["feature", "v", "y"], as_index=False)["n"].sum())

    def gini_ppm(n: int, p: int) -> int:
        if n == 0:
            return 0
        g = n - p
        return (10**6 * (n * n - p * p - g * g)) // (n * n)

    rows = []
    for feat, dom in ((0, 64), (1, 16)):
        pos = np.zeros(dom, dtype="int64")
        cnt = np.zeros(dom, dtype="int64")
        sub = h[h["feature"] == feat]
        for _, r in sub.iterrows():
            cnt[int(r["v"])] += int(r["n"])
            if int(r["y"]) == 1:
                pos[int(r["v"])] += int(r["n"])
        total_n, total_p = int(cnt.sum()), int(pos.sum())
        for t in range(dom + 1):
            n_l = int(cnt[:t].sum())
            p_l = int(pos[:t].sum())
            n_r, p_r = total_n - n_l, total_p - p_l
            gl, gr = gini_ppm(n_l, p_l), gini_ppm(n_r, p_r)
            rows.append((feat, t, n_l, p_l, n_r, p_r, gl, gr,
                         (n_l * gl + n_r * gr) // total_n))
    return pd.DataFrame(rows, columns=[
        "feature", "threshold", "n_left", "pos_left", "n_right",
        "pos_right", "gini_left_ppm", "gini_right_ppm",
        "weighted_ppm"]).astype("int64")


def skipgram_pairs(sf_dir: str, window: int = 3,
                   num_partitions: Optional[int] = None):
    """(center, context, n) — word2vec SKIP-GRAM training-pair
    generation (Mikolov et al., arXiv:1301.3781): every ordered
    (center, context) token pair with the context within ±``window``
    positions inside a document, counted over the corpus. Feeds the
    (center, context) positive stream that negative_samples draws
    negatives for — together they are the word2vec data-prep stage.

    Scale shape: pair extraction is vectorized (polars explode + one
    shift per offset, both directions — never a per-row Python loop)
    and each batch pre-aggregates into a (center, context) value_counts
    combiner, so the ONE hash exchange carries the pair VOCABULARY per
    batch, not the ~2·w·tokens pair occurrences; the reduce is a plain
    in-bucket sum. Same shape as pmi_bigrams' bigram exchange.
    """
    import ray

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))
    ds = _read_documents(sf_dir, columns=["text"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        g = (pl.from_pandas(df[["text"]])
             .with_columns(pl.col("text").str.split(" ").alias("t"))
             .with_row_index("r")
             .explode("t"))
        outs = []
        for o in range(1, window + 1):
            sh = (g.with_columns(pl.col("t").shift(-o).over("r")
                                 .alias("y"))
                  .drop_nulls("y"))
            outs.append(sh.select(pl.col("t").alias("center"),
                                  pl.col("y").alias("context")))
            outs.append(sh.select(pl.col("y").alias("center"),
                                  pl.col("t").alias("context")))
        allp = (pl.concat(outs)
                .group_by(["center", "context"])
                .agg(pl.len().cast(pl.Int64).alias("n"))
                .to_pandas())
        allp["part"] = (pd.util.hash_pandas_object(
            allp["center"] + "\x1f" + allp["context"], index=False)
            % nparts).astype("int32")
        return allp

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["center", "context"], as_index=False)["n"].sum()
        return g.astype({"n": "int64"})

    return (ds.map_batches(partials, batch_format="pandas")
            .groupby("part").map_groups(fold, batch_format="pandas"))


def ntile_buckets(sf_dir: str, tiles: int = 4,
                  num_partitions: Optional[int] = None):
    """(doc_id, lang, n_chars, rn, ntile4, cume_cnt) — the ranking
    window-function trio per language over document length, WITHOUT a
    global sort: ROW_NUMBER() (total order, doc_id tiebreak), NTILE(4)
    (equi-height quartile assignment — the standard length-bucketing
    step before curriculum batching), and the cumulative peer-inclusive
    count (the integer numerator of CUME_DIST — emitted as a count,
    not a ratio, so no float crosses the oracle).

    Scale shape: the doc_rank_by_length counting-sort trick plus one
    cell co-group — pass 1 reduces the corpus to a (lang, length)
    histogram (combiner; the exchange carries histogram rows), whose
    strictly-smaller cumulatives and totals broadcast via closure;
    pass 2 co-locates each (lang, length) CELL once to assign the
    within-cell doc_id ordinal, and every window value follows
    map-side by integer arithmetic. No document row is ever sorted
    globally.
    """
    import ray

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))
    ds = _read_documents(sf_dir, columns=["doc_id", "lang", "n_chars"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["lang", "n_chars"], as_index=False).size()
             .rename(columns={"size": "n"}))
        return pd.DataFrame({"lang": g["lang"].astype(str),
                             "n_chars": g["n_chars"].astype("int64"),
                             "n": g["n"].astype("int64")})

    h = (ds.map_batches(hist, batch_format="pandas").to_pandas()
         .groupby(["lang", "n_chars"], as_index=False)["n"].sum()
         .sort_values(["lang", "n_chars"]))
    h["cum"] = h.groupby("lang")["n"].cumsum() - h["n"]
    totals = h.groupby("lang")["n"].sum().to_dict()
    smaller = {(l, int(c)): int(v) for l, c, v in
               zip(h["lang"], h["n_chars"], h["cum"])}
    cell_n = {(l, int(c)): int(v) for l, c, v in
              zip(h["lang"], h["n_chars"], h["n"])}

    def add_cell(df: pd.DataFrame) -> pd.DataFrame:
        key = df["lang"].astype(str) + "\x1f" + df["n_chars"].astype(str)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "lang": df["lang"].astype(str),
            "n_chars": df["n_chars"].astype("int64"),
            "part": (pd.util.hash_pandas_object(key, index=False)
                     % nparts).astype("int32")})

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values(["lang", "n_chars", "doc_id"])
              .reset_index(drop=True))
        ordinal = (df.groupby(["lang", "n_chars"]).cumcount()
                   .to_numpy() + 1)
        keys = list(zip(df["lang"], df["n_chars"].astype(int)))
        base = np.fromiter((smaller[k] for k in keys), dtype=np.int64,
                           count=len(keys))
        cn = np.fromiter((cell_n[k] for k in keys), dtype=np.int64,
                         count=len(keys))
        tot = df["lang"].map(totals).to_numpy("int64")
        rn = base + ordinal
        # SQL NTILE: the first N % tiles buckets take ceil(N/tiles) rows
        size, rem = tot // tiles, tot % tiles
        in_big = rn <= (size + 1) * rem
        nt = np.where(in_big, (rn - 1) // np.maximum(size + 1, 1) + 1,
                      rem + (rn - 1 - (size + 1) * rem)
                      // np.maximum(size, 1) + 1)
        return pd.DataFrame({
            "doc_id": df["doc_id"], "lang": df["lang"],
            "n_chars": df["n_chars"],
            "rn": pd.Series(rn, dtype="int64"),
            "ntile4": pd.Series(nt, dtype="int64"),
            "cume_cnt": pd.Series(base + cn, dtype="int64")})

    return (ds.map_batches(add_cell, batch_format="pandas")
            .groupby("part").map_groups(windows, batch_format="pandas"))


def ks_drift(sf_dir: str):
    """(n_a, n_b, d_num, d_den, at_value) — EXACT two-sample
    Kolmogorov–Smirnov statistic between the two md5-parity corpus
    halves (psi_drift's split) over document length: D = max_x
    |ECDF_A(x) − ECDF_B(x)| kept exact by clearing denominators —
    d_num = max_x |cumA(x)·n_b − cumB(x)·n_a|, d_den = n_a·n_b, and
    ``at_value`` the smallest length attaining the max. KS is the
    nonparametric drift test PSI's binned score complements: it
    needs no binning choice and is sensitive anywhere in the CDF.

    Scale shape: one per-batch (split, n_chars) histogram combiner
    (bounded length domain — the exchange carries histogram cells,
    never documents), cumulative walk on the output-sized table
    driver-side in exact integers.
    """
    from .traindata import _md5_u64

    ds = _read_documents(sf_dir, columns=["doc_id", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sp = np.array([_md5_u64("%d:psi" % d) % 2
                       for d in df["doc_id"]], dtype="int64")
        g = (pd.DataFrame({"split": sp,
                           "n_chars": df["n_chars"].astype("int64")})
             .groupby(["split", "n_chars"], as_index=False).size()
             .rename(columns={"size": "n"}))
        return g.astype({"split": "int64", "n_chars": "int64",
                         "n": "int64"})

    h = (ds.map_batches(partial, batch_format="pandas").to_pandas()
         .groupby(["split", "n_chars"], as_index=False)["n"].sum())
    piv = (h.pivot_table(index="n_chars", columns="split", values="n",
                         fill_value=0).sort_index())
    ca = [int(x) for x in piv.get(0, pd.Series(dtype=int))]
    cb = [int(x) for x in piv.get(1, pd.Series(dtype=int))]
    vals = [int(v) for v in piv.index]
    n_a, n_b = sum(ca), sum(cb)
    best, at, cum_a, cum_b = -1, -1, 0, 0
    for v, a, b in zip(vals, ca, cb):
        cum_a += a
        cum_b += b
        d = abs(cum_a * n_b - cum_b * n_a)
        if d > best:
            best, at = d, v
    return pd.DataFrame([(n_a, n_b, best, n_a * n_b, at)],
                        columns=["n_a", "n_b", "d_num", "d_den",
                                 "at_value"]).astype("int64")


def classifier_agreement(sf_dir: str, num_partitions: Optional[int] = None):
    """(n_docs, n_agree, pe_num, kappa_q6) — COHEN'S KAPPA of the
    trained ``naive_bayes_langid`` predictions against the TRUE lang
    labels (its scored odd split): κ = (p_o − p_e)/(1 − p_e) with
    chance agreement p_e from the margin products — the evaluation
    metric raw accuracy overstates under skewed priors. On this
    corpus the labels are text-independent by construction, and κ
    exposes exactly that: NB scores ~34% raw accuracy vs a 32%
    prior-matching chance floor, κ ≈ 0.02 — chance-level, where
    accuracy alone looks "above chance" (pinned by test). All exact
    integers: n_agree, pe_num = Σ_label row·col margins, and
    kappa_q6 = trunc(10⁶·(n·n_agree − pe_num)/(n² − pe_num)).

    Scale shape: the NB scoring pass is map-only; predictions meet
    the labels in ONE doc-hash co-group whose per-bucket output is a
    label-pair crosstab partial (≤|langs|² cells), folded
    driver-side.
    """
    import ray

    from .traindata import naive_bayes_langid

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))
    truth = _read_documents(sf_dir, columns=["doc_id", "lang"])
    nb = naive_bayes_langid(sf_dir)

    def tag(col: str, side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "pred": df[col].astype(str),
                "side": np.int8(side)})
            out["bucket"] = (pd.util.hash_pandas_object(
                out["doc_id"], index=False) % nparts).astype("int32")
            return out
        return fn

    u = truth.map_batches(tag("lang", 0), batch_format="pandas") \
        .union(nb.map_batches(tag("nb_pred", 1), batch_format="pandas"))

    def crosstab(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == 0][["doc_id", "pred"]] \
            .rename(columns={"pred": "a"})
        b = df[df["side"] == 1][["doc_id", "pred"]] \
            .rename(columns={"pred": "b"})
        m = a.merge(b, on="doc_id")
        g = m.groupby(["a", "b"], as_index=False).size() \
            .rename(columns={"size": "c"})
        return g.astype({"c": "int64"})

    ct = (u.groupby("bucket").map_groups(crosstab,
                                         batch_format="pandas")
          .to_pandas().groupby(["a", "b"], as_index=False)["c"].sum())
    n = int(ct["c"].sum())
    diag = int(ct.loc[ct["a"] == ct["b"], "c"].sum())
    rm = ct.groupby("a")["c"].sum()
    cm = ct.groupby("b")["c"].sum()
    pe_num = sum(int(rm[l]) * int(cm[l])
                 for l in set(rm.index) & set(cm.index))
    num = 1000000 * (n * diag - pe_num)
    den = n * n - pe_num
    kq = abs(num) // den
    kappa_q6 = kq if num >= 0 else -kq
    return pd.DataFrame(
        [(n, diag, pe_num, kappa_q6)],
        columns=["n_docs", "n_agree", "pe_num",
                 "kappa_q6"]).astype("int64")


def rank_stability(sf_dir: str, k: int = 20):
    """(n_terms, n_pairs, concordant, discordant, tau_q6) — KENDALL-τ
    rank stability of the top-``k`` global terms between the two
    md5-parity corpus halves (psi_drift's split): rank each of the
    overall-top-k terms by frequency within half A and within half B
    (ties → term text, a total order), count concordant/discordant
    term pairs, τ = (C − D)/C(n,2). The rank-churn counterpart of
    psi/ks value-drift — "did the vocabulary ORDER shift between
    crawls", exact in integers end to end
    (tau_q6 = trunc(10⁶·(C−D)/(n·(n−1)/2))).

    Scale shape: one (split, token) value_counts combiner (the
    exchange carries vocabulary cells); top-k selection and the k²
    pair sweep fold on the output-sized table driver-side.
    """
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        from .traindata import _md5_u64

        sp = pd.Series([_md5_u64("%d:psi" % d) % 2
                        for d in df["doc_id"]], index=df.index)
        d = pl.from_pandas(pd.DataFrame({"split": sp,
                                         "text": df["text"]}))
        vc = (d.with_columns(pl.col("text").str.split(" ").alias("t"))
              .drop("text").explode("t")
              .group_by(["split", "t"]).agg(pl.len().cast(pl.Int64)
                                            .alias("n")))
        return vc.rename({"t": "tok"}).to_pandas()

    h = (ds.map_batches(partial, batch_format="pandas").to_pandas()
         .groupby(["split", "tok"], as_index=False)["n"].sum())
    tot = h.groupby("tok")["n"].sum()
    # top-k by (count DESC, token ASC) — total order both engines share
    top = [t for _, t in sorted(
        ((-int(c), t) for t, c in tot.items()))][:k]
    a = {t: int(h[(h["split"] == 0) & (h["tok"] == t)]["n"].sum())
         for t in top}
    b = {t: int(h[(h["split"] == 1) & (h["tok"] == t)]["n"].sum())
         for t in top}
    # ranks inside each half by (count DESC, token ASC)
    ra = {t: i for i, t in enumerate(
        [t for _, t in sorted(((-a[t], t) for t in top))])}
    rb = {t: i for i, t in enumerate(
        [t for _, t in sorted(((-b[t], t) for t in top))])}
    conc = disc = 0
    for i, t1 in enumerate(top):
        for t2 in top[i + 1:]:
            s1 = ra[t1] - ra[t2]
            s2 = rb[t1] - rb[t2]
            if s1 * s2 > 0:
                conc += 1
            else:
                disc += 1
    n = len(top)
    pairs = n * (n - 1) // 2
    num = 1000000 * (conc - disc)
    q = abs(num) // pairs
    tau_q6 = q if num >= 0 else -q
    return pd.DataFrame(
        [(n, pairs, conc, disc, tau_q6)],
        columns=["n_terms", "n_pairs", "concordant", "discordant",
                 "tau_q6"]).astype("int64")


def pseudonymize(sf_dir: str):
    """(doc_id, n_emails, pseudo) — PSEUDONYMIZATION with referential
    integrity (the GDPR-grade upgrade of ``pii_scrub``'s blanket
    redaction): every email-shaped span is replaced by a
    deterministic surrogate ``user<md5-u64 % 10¹²>@anon.example`` —
    the SAME identity maps to the SAME surrogate corpus-wide (joins,
    counts and linkage over the identity column keep working on the
    pseudonymized corpus; pinned by test on the shared admin@test.org
    identity), while distinct identities stay distinct. Runs over
    the PII-injected corpus; map-only, zero exchanges.

    The oracle reconstructs the pseudonymized text from the known
    injection rule with the identical md5 surrogate — a hash-match
    proves the generic regex path found exactly the injected spans.
    """
    import re

    from .traindata import _md5_u64

    ds = inject_pii(sf_dir)
    pat = re.compile(_EMAIL_PATTERN)

    def sub(m) -> str:
        return "user%d@anon.example" % (_md5_u64(m.group(0)) % 10**12)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_emails": df["text"].str.count(_EMAIL_PATTERN)
            .astype("int64"),
            "pseudo": [pat.sub(sub, t) for t in df["text"]],
        })

    return ds.map_batches(fn, batch_format="pandas")


def learned_index_audit(sf_dir: str):
    """(n, b_q6, a_q6, max_err_rows_q6) — LEARNED-INDEX error audit
    (Kraska et al., SIGMOD 2018): fit the linear CDF model
    position ≈ a + b·key over document length (key = n_chars, true
    position = count of strictly-smaller rows) and report the model's
    maximum position error — the lookup window a learned index must
    search around its prediction, THE number that decides whether the
    model replaces a B-tree level. Everything exact: OLS normal
    equations in bigints with denominators cleared
    (den = n(nΣxx−Sx²), pred·den = b_n·x + a_n), per-key errors
    |den·rank − (b_n·x + a_n)| evaluated on the distinct-value
    histogram (rows of equal key share a rank), quantized by
    trunc-division at 10⁶.

    Scale shape: ONE histogram-combiner pass (the mad_chars
    exchange); suffstats, fit and the per-distinct-value error sweep
    fold on the output-sized histogram driver-side.
    """
    ds = _read_documents(sf_dir, columns=["n_chars"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_chars", as_index=False).size() \
            .rename(columns={"size": "cnt"})
        return g.astype({"n_chars": "int64", "cnt": "int64"})

    h = (ds.map_batches(hist, batch_format="pandas").to_pandas()
         .groupby("n_chars", as_index=False)["cnt"].sum()
         .sort_values("n_chars"))
    vals = [int(v) for v in h["n_chars"]]
    cnts = [int(c) for c in h["cnt"]]
    n = sum(cnts)
    # rank (first position) per distinct value + OLS suffstats over ROWS
    ranks, acc = [], 0
    sx = sy = sxx = sxy = 0
    for v, c in zip(vals, cnts):
        ranks.append(acc)
        sx += c * v
        sy += c * acc
        sxx += c * v * v
        sxy += c * v * acc
        acc += c
    den = n * (n * sxx - sx * sx)
    b_n = n * (n * sxy - sx * sy)
    a_n = (n * sxx - sx * sx) * sy - (n * sxy - sx * sy) * sx
    max_err = max(abs(den * r - (b_n * v + a_n))
                  for v, r in zip(vals, ranks))

    def tq(num: int, d: int) -> int:
        q = (1000000 * abs(num)) // d
        return q if num >= 0 else -q

    return pd.DataFrame(
        [(n, tq(b_n, den), tq(a_n, den), tq(max_err, den))],
        columns=["n", "b_q6", "a_q6",
                 "max_err_rows_q6"]).astype("int64")


def anova_f(sf_dir: str):
    """(k, n, ssb_q2, ssw_q2, f_q6) — one-way ANOVA of document
    length across the language groups: between-group and within-group
    sums of squares from exact integer sufficient statistics
    (SSB = Σ S_g²/n_g − S²/n, SSW = Q − Σ S_g²/n_g — all fractions
    cleared over n·Πn_g in Python bigints), F = (SSB/(k−1)) /
    (SSW/(n−k)) trunc-quantized at 10⁶. The multi-group extension of
    ab_test_zstat — does a column differ across partitions, the DQ
    question behind per-source drift triage.

    Scale shape: ONE map-only pass — a per-batch ≤|langs|-row
    (n, Σx, Σx²) combiner; the algebra folds on the group-sized frame
    driver-side.
    """
    ds = _read_documents(sf_dir, columns=["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["n_chars"].astype("int64")
        g = pd.DataFrame({"lang": df["lang"].astype(str), "x": x,
                          "xx": x * x}) \
            .groupby("lang", as_index=False).agg(
                n=("x", "size"), s=("x", "sum"), q=("xx", "sum"))
        return g.astype({"n": "int64", "s": "int64", "q": "int64"})

    h = (ds.map_batches(partial, batch_format="pandas").to_pandas()
         .groupby("lang", as_index=False).sum(numeric_only=True))
    ns = [int(v) for v in h["n"]]
    ss = [int(v) for v in h["s"]]
    qs = [int(v) for v in h["q"]]
    k = len(ns)
    n = sum(ns)
    S = sum(ss)
    Q = sum(qs)
    P = 1
    for g_n in ns:
        P *= g_n
    # cleared over n·P: SSB·n·P and SSW·n·P are exact integers
    sg2 = sum(s * s * (P // g_n) for s, g_n in zip(ss, ns))
    ssb_np = n * sg2 - S * S * P
    ssw_np = Q * n * P - n * sg2
    f_num = 1000000 * ssb_np * (n - k)
    f_den = ssw_np * (k - 1)
    return pd.DataFrame(
        [(k, n, (100 * ssb_np) // (n * P), (100 * ssw_np) // (n * P),
          f_num // f_den)],
        columns=["k", "n", "ssb_q2", "ssw_q2",
                 "f_q6"]).astype("int64")


def hist_overlap(sf_dir: str):
    """(lang_a, lang_b, n_a, n_b, ovl_ppm) — pairwise HISTOGRAM
    INTERSECTION similarity between the languages' document-length
    distributions: Σ_v min(p_a(v), p_b(v)) — the direct
    distribution-overlap matrix (1 = identical shapes, 0 = disjoint
    support) that complements KS (max gap) and PSI (binned
    log-ratio). Kept exact by clearing denominators:
    ovl_ppm = Σ_v min(c_a(v)·n_b, c_b(v)·n_a) · 10⁶ // (n_a·n_b).

    Scale shape: one (lang, length) histogram combiner (the
    doc_rank exchange — documents never cross the wire); the
    |langs|² pair sweep folds on the output-sized histogram
    driver-side.
    """
    ds = _read_documents(sf_dir, columns=["lang", "n_chars"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["lang", "n_chars"], as_index=False).size()
             .rename(columns={"size": "n"}))
        return g.astype({"n_chars": "int64", "n": "int64"})

    h = (ds.map_batches(hist, batch_format="pandas").to_pandas()
         .groupby(["lang", "n_chars"], as_index=False)["n"].sum())
    langs = sorted(h["lang"].unique())
    cnt = {l: dict(zip(g["n_chars"].astype(int), g["n"].astype(int)))
           for l, g in h.groupby("lang")}
    tot = {l: sum(cnt[l].values()) for l in langs}
    rows = []
    for i, la in enumerate(langs):
        for lb in langs[i + 1:]:
            na, nb = tot[la], tot[lb]
            s = sum(min(cnt[la].get(v, 0) * nb, cnt[lb].get(v, 0) * na)
                    for v in set(cnt[la]) | set(cnt[lb]))
            rows.append((la, lb, na, nb, (1000000 * s) // (na * nb)))
    return pd.DataFrame(
        rows, columns=["lang_a", "lang_b", "n_a", "n_b",
                       "ovl_ppm"]).astype(
        {"n_a": "int64", "n_b": "int64", "ovl_ppm": "int64"})


# Gazetteer for the mention-detection stage: two-token phrases over the
# corpus vocabulary, chosen so no vocabulary token has a phrase-boundary
# word as a proper prefix or suffix — substring occurrence count then
# equals token-adjacent mention count exactly, and the SQL oracle's
# replace()-length arithmetic counts the identical (non-overlapping)
# occurrences.
MENTION_GAZETTEER = (
    "fast table", "key agg", "sort window", "spark order",
    "value part", "batch merge", "query big", "stream group",
)


def entity_mentions(sf_dir: str, gazetteer=MENTION_GAZETTEER):
    """(doc_id, phrase, n_mentions) — batched gazetteer MENTION DETECTION
    over the web-text corpus (the north-star pipeline's stage between
    extraction and entity linking): every occurrence of a concept-label
    phrase in a document, counted exactly. The gazetteer is the small
    side — broadcast once via closure capture, never shuffled; at a real
    10^6-label vocabulary this becomes the actor-pool stage holding an
    Aho–Corasick automaton per worker (kgx/link.py's per-worker cache is
    the same pattern for the MARC linking dictionaries).

    Scale shape: map-only, one pass, zero exchanges — per batch one
    zero-copy Arrow ``count_substring`` kernel per phrase (the phrase
    list is fixed; docs are the big axis). Emits only hits (n > 0).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _read_documents(sf_dir, columns=["doc_id", "text"])
    phrases = list(gazetteer)

    def fn(tbl: pa.Table) -> pa.Table:
        doc = tbl.column("doc_id")
        text = tbl.column("text")
        outs = []
        for p in phrases:
            n = pc.count_substring(text, p).cast(pa.int64())
            mask = pc.greater(n, 0)
            outs.append(pa.table({
                "doc_id": pc.filter(doc, mask),
                "phrase": pa.array(
                    [p] * (pc.sum(pc.cast(mask, pa.int64())).as_py() or 0),
                    pa.string()),
                "n_mentions": pc.filter(n, mask)}))
        return pa.concat_tables(outs)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# Candidate table for the linking stage: each gazetteer phrase has two
# candidate entity senses; a sense's CONTEXT token (substring-safe, see
# MENTION_GAZETTEER note) scores it against the mentioning document.
MENTION_CANDIDATES = {
    "fast table": (("scan", 1), ("join", 2)),
    "key agg": (("hash", 1), ("group", 2)),
    "sort window": (("order", 1), ("stream", 2)),
    "spark order": (("batch", 1), ("query", 2)),
    "value part": (("column", 1), ("row", 2)),
    "batch merge": (("slow", 1), ("small", 2)),
    "query big": (("filter", 1), ("vector", 2)),
    "stream group": (("customer", 1), ("line", 2)),
}


def entity_link(sf_dir: str):
    """(doc_id, phrase, uri, score) — the ENTITY-LINKING stage over the
    mention hits: each mentioned phrase has two candidate senses; the
    winner is the sense whose context token occurs most in the document
    (ties to the lower sense id) — candidate generation + context
    scoring + deterministic argmax, the disambiguation shape the
    north-star pipeline runs with vocabulary tries in an actor pool
    (kgx/link.py holds the real MARC dictionaries the same way).

    Scale shape: the candidate table is the broadcast small side
    (closure capture); scoring is one zero-copy Arrow count_substring
    per (phrase, sense) over the batch; map-only, zero exchanges, the
    argmax is a local vectorized compare — never a shuffle.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _read_documents(sf_dir, columns=["doc_id", "text"])
    cands = {p: tuple(c) for p, c in MENTION_CANDIDATES.items()}

    def fn(tbl: pa.Table) -> pa.Table:
        doc = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        text = tbl.column("text")
        out_doc, out_phr, out_uri, out_sc = [], [], [], []
        for phrase, senses in cands.items():
            nm = pc.count_substring(text, phrase).to_numpy(
                zero_copy_only=False)
            hit = nm > 0
            if not hit.any():
                continue
            scores = np.stack(
                [pc.count_substring(text, ctx).to_numpy(
                    zero_copy_only=False) for ctx, _k in senses])
            # argmax over senses, ties to the LOWER sense id (np.argmax
            # returns the first maximum; senses are ordered by k)
            win = np.argmax(scores, axis=0)
            slug = phrase.replace(" ", "_")
            for i in np.nonzero(hit)[0]:
                k = senses[win[i]][1]
                out_doc.append(int(doc[i]))
                out_phr.append(phrase)
                out_uri.append(
                    "http://example.org/entity/%s/%d" % (slug, k))
                out_sc.append(int(scores[win[i], i]))
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "phrase": pa.array(out_phr, pa.string()),
            "uri": pa.array(out_uri, pa.string()),
            "score": pa.array(out_sc, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def mention_cooccurrence(sf_dir: str, num_partitions: Optional[int] = None):
    """(phrase_a, phrase_b, n_docs) — the CO-MENTION edge builder: for
    every unordered pair of gazetteer phrases, the number of documents
    mentioning BOTH. This is the classic KG-from-web-text edge
    extraction (co-occurrence graphs feed relation candidates and
    entity-embedding training); downstream the pair weights become
    candidate (subj, related, obj) triples.

    Scale shape: per batch, one zero-copy Arrow count_substring per
    phrase builds a docs × phrases hit matrix; the C(|G|, 2) pair
    counts collapse to ONE small partial per batch (a numpy matmul of
    the 0/1 matrix — pairs are counted without materializing per-doc
    pair rows), then the fixed-size partials fold driver-side. Zero
    exchanges; the gazetteer (and so the partial) is O(|G|^2), never
    O(docs).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _read_documents(sf_dir, columns=["doc_id", "text"])
    phrases = list(MENTION_GAZETTEER)
    m = len(phrases)

    def partials(tbl: pa.Table) -> pd.DataFrame:
        text = tbl.column("text")
        hits = np.stack([
            (pc.count_substring(text, p).to_numpy(zero_copy_only=False)
             > 0).astype(np.int64) for p in phrases])
        co = hits @ hits.T  # phrases × phrases co-mention doc counts
        ia, ib = np.triu_indices(m, k=1)
        return pd.DataFrame({
            "ai": ia.astype(np.int64), "bi": ib.astype(np.int64),
            "n": co[ia, ib].astype(np.int64)})

    agg = (ds.map_batches(partials, batch_format="pyarrow",
                          zero_copy_batch=True)
           .to_pandas().groupby(["ai", "bi"], as_index=False)["n"].sum())
    agg = agg[agg["n"] > 0]
    # unordered pairs present lexicographically (phrase_a < phrase_b),
    # independent of gazetteer index order
    pa_, pb_ = zip(*(sorted((phrases[a], phrases[b]))
                     for a, b in zip(agg["ai"], agg["bi"]))) \
        if len(agg) else ((), ())
    return pd.DataFrame({
        "phrase_a": pd.Series(pa_, dtype="object"),
        "phrase_b": pd.Series(pb_, dtype="object"),
        "n_docs": agg["n"].astype("int64").to_numpy()})


def compression_ratio(sf_dir: str, level: int = 6):
    """(doc_id, n_bytes, n_compressed, ratio_ppm) — zlib compressibility
    per document, the MassiveText/RefinedWeb quality signal: template
    boilerplate and repetition compress far below natural text, so the
    ratio (compressed/raw, ppm) separates machine-generated sludge from
    prose. zlib level 6 output is deterministic for a given input and
    zlib build, so results are stable across workers (pinned by a
    replay test; no SQL oracle — DuckDB has no zlib, so the driver
    records the weaker rows-only check like the other codec ops).

    Scale shape: map-only, one pass; the per-doc compress is the
    vectorization floor (zlib is C; the loop body is one C call per
    row), and nothing ever leaves the batch but three ints per doc.
    """
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        raw = [t.encode("utf-8") for t in df["text"]]
        comp = [len(zlib.compress(b, level)) for b in raw]
        nb = np.fromiter((len(b) for b in raw), dtype=np.int64,
                         count=len(raw))
        nc = np.asarray(comp, dtype=np.int64)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_bytes": nb,
            "n_compressed": nc,
            "ratio_ppm": (1_000_000 * nc) // np.maximum(nb, 1)})

    return ds.map_batches(fn, batch_format="pandas")


def continuation_counts(sf_dir: str, num_partitions: Optional[int] = None):
    """(tok, n_left_contexts) — Kneser-Ney CONTINUATION counts: for each
    token, the number of DISTINCT predecessors it follows corpus-wide.
    The KN-smoothed LM's signature statistic — "how many contexts does
    this word complete" separates versatile words from ones frozen
    inside collocations, which raw frequency (unigram_lm_score) cannot.

    Scale shape: per-batch polars explode+shift builds the distinct
    (prev, tok) pairs (the combiner bounds shuffle rows at the BIGRAM
    vocabulary); one hash(tok) co-group counts distinct predecessors
    exactly. Map + one exchange, never occurrence-sized.
    """
    import ray

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))
    ds = _read_documents(sf_dir, columns=["text"])

    def pairs(tbl) -> pd.DataFrame:
        import polars as pl

        g = (pl.from_arrow(tbl.select(["text"]))
             .with_columns(pl.col("text").str.split(" ").alias("t"))
             .drop("text").with_row_index("r").explode("t")
             .with_columns(pl.col("t").shift(-1).over("r").alias("y"))
             .drop_nulls("y")
             .select(["t", "y"]).unique()).to_pandas()
        out = pd.DataFrame({"prev": g["t"], "tok": g["y"]})
        out["bucket"] = (pd.util.hash_pandas_object(out["tok"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.drop_duplicates(["prev", "tok"])
             .groupby("tok", as_index=False)["prev"].nunique()
             .rename(columns={"prev": "n_left_contexts"}))
        return pd.DataFrame({
            "tok": g["tok"].astype(str),
            "n_left_contexts": g["n_left_contexts"].astype("int64")})

    return (ds.map_batches(pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket").map_groups(count_distinct,
                                          batch_format="pandas"))


def token_burstiness(sf_dir: str, num_partitions: Optional[int] = None):
    """(tok, cf, df, burst_q20) — Church-Gale BURSTINESS per token:
    collection frequency over document frequency, floor-quantized to
    2^-20. cf/df ≈ 1 marks evenly-sprinkled function words; high
    ratios mark topical words that clump into few documents — the
    signal behind IDF correction terms and topical-spam detection.

    Scale shape: ONE per-batch polars combiner emits both partials
    (occurrence count + distinct-doc count per token; shuffle rows
    bounded at per-block vocabulary); one hash(tok) co-group sums and
    divides. Exact integers end to end.
    """
    import ray

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))
    ds = _read_documents(sf_dir, columns=["doc_id", "text"])

    def partials(tbl) -> pd.DataFrame:
        import polars as pl

        ex = (pl.from_arrow(tbl.select(["doc_id", "text"]))
              .with_columns(pl.col("text").str.split(" ").alias("t"))
              .drop("text").explode("t"))
        g = (ex.group_by("t")
             .agg(pl.len().cast(pl.Int64).alias("cf"),
                  pl.col("doc_id").n_unique().cast(pl.Int64)
                  .alias("df"))).to_pandas()
        out = pd.DataFrame({"tok": g["t"], "cf": g["cf"], "df": g["df"]})
        out["bucket"] = (pd.util.hash_pandas_object(out["tok"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    def reduce_tok(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tok", as_index=False)[["cf", "df"]].sum()
        return pd.DataFrame({
            "tok": g["tok"].astype(str),
            "cf": g["cf"].astype("int64"),
            "df": g["df"].astype("int64"),
            "burst_q20": ((g["cf"].astype("int64") * (1 << 20))
                          // g["df"].astype("int64")).astype("int64")})

    return (ds.map_batches(partials, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket").map_groups(reduce_tok,
                                          batch_format="pandas"))


def tail_index_hill(sf_dir: str, k: int = 100):
    """(k, xk1, hill_q20) — the HILL ESTIMATOR of the document-length
    tail index over the top-``k`` order statistics: alpha_hat =
    k / Σ_{i≤k} ln(x_(i) / x_(k+1)) — the standard heavy-tail
    diagnostic (is the length distribution power-law-ish, and how
    heavy?) complementing ``powerlaw_alpha``'s discrete degree MLE.
    Every ln term floor-quantizes to 2^-20 BEFORE the sum (integer,
    order-independent — float sums are not associative and SQL sum
    order is unspecified), so the final (k << 40) // S_q division is
    pure-integer and bit-portable (the exp-free discipline).

    Scale shape: per-batch top-(k+1) combiner (fixed-width partials),
    driver merges k+1 values — a corpus-size-independent collect; no
    full sort, no exchange.
    """
    import math

    ds = _read_documents(sf_dir, columns=["n_chars"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df["n_chars"].to_numpy(np.int64))[::-1][:k + 1]
        return pd.DataFrame({"v": pd.Series(v, dtype="int64")})

    parts = ds.map_batches(topk, batch_format="pandas").to_pandas()
    top = np.sort(parts["v"].to_numpy(np.int64))[::-1][:k + 1]
    # preconditions of the estimator itself (mirrors the
    # quantize-counts assert discipline): the corpus must have more
    # than k docs, and the top k lengths must not ALL equal x_(k+1)
    # (s_q = 0 ⇒ the tail is flat and alpha is undefined; the SQL
    # oracle divides by zero in the same place)
    assert len(top) > k, \
        "tail_index_hill needs > k=%d documents, got %d" % (k, len(top))
    xk1 = int(top[k])
    s_q = 0
    for x in top[:k]:
        s_q += math.floor(
            1048576.0 * math.log(float(int(x)) / float(xk1)))
    assert s_q > 0, \
        "tail_index_hill: degenerate tail (quantized ln-sum is 0 — " \
        "top k lengths indistinguishable from x_(k+1) at 2^-20 grid)"
    return pd.DataFrame({
        "k": pd.Series([k], dtype="int64"),
        "xk1": pd.Series([xk1], dtype="int64"),
        "hill_q20": pd.Series([(k << 40) // s_q], dtype="int64")})
