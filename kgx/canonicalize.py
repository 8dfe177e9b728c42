"""Stage 3 — canonicalize: global exact triple dedup + inference closure.

Dedup reproduces the reference's ``rdflib.Graph.add`` set semantics
(mc2skos.py:183 — identical (s, p, o, lang, datatype) collapses to one)
as a two-phase distributed operation:

1. per-block vectorized pre-dedup inside ``map_batches`` (combiner —
   shrinks the shuffle),
2. hash-bucket shuffle: ``bucket = hash64(triple key) % B`` followed by
   ``groupby(bucket).map_groups(drop_duplicates)``.

Keying the shuffle on a hash of the FULL triple (not the subject) is the
skew treatment: super-node subjects (scheme URIs, top classes appearing in
every record's inScheme edge, SURVEY §7.4) spread uniformly over buckets,
so no salt-and-resplit second pass is needed for exact dedup. Per-subject
operations that *do* need subject locality (JSON grouping) live in
materialize.py and use the bucket+local-groupby pattern there.

The ``--expand`` closure (mc2skos.py:192-196, skosify rules) is map-only:
inverse/symmetric edges are emitted from edge rows and unioned back —
no join required (SURVEY A3).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

SKOS = "http://www.w3.org/2004/02/skos/core#"

_KEY_COLS = ["subj", "pred", "obj", "obj_is_literal", "obj_lang", "obj_datatype"]

# inference rules: pred → inverse pred (skosify.infer semantics,
# test pinned by /root/reference/test/test_skosify.py:19-23)
_INVERSES = {
    SKOS + "broader": SKOS + "narrower",
    SKOS + "narrower": SKOS + "broader",
    SKOS + "related": SKOS + "related",
    SKOS + "topConceptOf": SKOS + "hasTopConcept",
    SKOS + "hasTopConcept": SKOS + "topConceptOf",
}


def _key_series(df: pd.DataFrame) -> pd.Series:
    key = df["subj"].astype(str)
    for col in _KEY_COLS[1:]:
        key = key + "\x1f" + df[col].astype(str)
    return key


def _prededup_block(df: pd.DataFrame) -> pd.DataFrame:
    # combiner: exact-dup rows collapse before the shuffle
    return df.drop_duplicates(subset=_KEY_COLS)


def _add_bucket(df: pd.DataFrame, num_buckets: int) -> pd.DataFrame:
    df = df.drop_duplicates(subset=_KEY_COLS)
    # vectorized, deterministic 64-bit hash of the full triple key
    df = df.assign(bucket=(pd.util.hash_pandas_object(_key_series(df), index=False)
                           % num_buckets).astype("int32"))
    return df


def _dedup_group(df: pd.DataFrame) -> pd.DataFrame:
    out = df.drop_duplicates(subset=_KEY_COLS)
    return out.drop(columns=["bucket"])


def exact_dedup(triples, num_buckets: Optional[int] = None, keep_url: bool = False):
    """Dataset[triples] → Dataset[graph] with set semantics.

    ``keep_url=False`` drops lineage columns so the result is a
    deterministic triple set (duplicate triples from different pages pick
    no winner).
    """
    if num_buckets is None:
        num_buckets = 64
    cols = _KEY_COLS if not keep_url else _KEY_COLS + ["url"]
    ds = triples.map_batches(
        lambda df: _add_bucket(df[cols], num_buckets),
        batch_format="pandas",
    )
    return ds.groupby("bucket").map_groups(_dedup_group, batch_format="pandas")


def _expand_batch(df: pd.DataFrame) -> pd.DataFrame:
    mask = df["pred"].isin(_INVERSES.keys()) & ~df["obj_is_literal"]
    edges = df[mask]
    if edges.empty:
        return df.iloc[0:0]
    inv = edges.assign(
        subj=edges["obj"],
        obj=edges["subj"],
        pred=edges["pred"].map(_INVERSES),
    )
    return inv


def expand_inference(graph):
    """Emit the SKOS inference closure edges and union them in.

    Rules: related symmetry, topConceptOf ⇄ hasTopConcept, broader ⇄
    narrower (skos_hierarchical(narrower=True)). One map + union; caller
    re-dedups. Single-step rules need no fixpoint loop.
    """
    inverses = graph.map_batches(_expand_batch, batch_format="pandas")
    return graph.union(inverses)


def _add_tkey_arrow(batch, expand: bool = False):
    """Combiner + sort-key, vectorized end-to-end in polars.

    The composite key is a BINARY column: ``skey ␟ subj ␟ h1·h2`` where
    the tail is the 128-bit triple hash as 16 big-endian bytes (bytewise
    binary order == numeric hash order, so the output order is identical
    to the former decimal-zfill encoding at 24 fewer bytes/row — tkey was
    the measured 49% of shuffle traffic). It leads with the output sort
    key (the reference's 3-sorter rule on the subject URI) and the
    subject, so range partitioning is a deterministic function of the
    key and identical triples can never straddle a partition boundary;
    within one subject, output order is by triple hash (deterministic;
    the reference only fixes subject-block order). Hash determinism
    relies on a homogeneous polars version across the cluster (true for
    any one Ray runtime env).

    With ``expand``, the SKOS inference closure's inverse edges are
    emitted in the same pass — no extra shuffle; duplicates collapse in
    the shared dedup.
    """
    import polars as pl

    if batch.num_rows == 0:
        return batch.drop_columns(["subj"]).append_column(
            "tkey", pa.array([], pa.binary()))
    df = pl.from_arrow(batch).select(_KEY_COLS)
    # "\x1f" is the tkey field separator and subj rides inside tkey
    # (reconstructed by split after the sort) — a subject containing the
    # separator would silently shift the fields, so strip it here.
    # Junk/adversarial input only; legal URIs never contain C0 controls.
    df = df.with_columns(pl.col("subj").str.replace_all("\x1f", "", literal=True))
    if expand:
        inv = (df.filter(pl.col("pred").is_in(list(_INVERSES)) &
                         ~pl.col("obj_is_literal"))
               .with_columns(
                   pl.col("obj").alias("subj_new"),
                   pl.col("subj").alias("obj_new"),
                   pl.col("pred").replace_strict(_INVERSES, default=None)
                   .alias("pred_new"),
               )
               .drop(["subj", "obj", "pred"])
               .rename({"subj_new": "subj", "obj_new": "obj",
                        "pred_new": "pred"})
               .select(df.columns))
        if inv.height:
            df = pl.concat([df, inv], how="vertical")

    # identity = a 128-bit struct hash of the full triple key (two
    # independent 64-bit passes; deterministic across processes for one
    # polars version). Hashing the struct directly — and deduping on the
    # two u64 columns BEFORE any string building — replaces the old
    # concat-the-whole-triple + unique-on-40-char-string combiner
    # (measured ~35% of the keying pass).
    key_struct = pl.struct(_KEY_COLS)
    df = df.with_columns(
        key_struct.hash(seed=2654435761).alias("_h1"),
        key_struct.hash(seed=40503).alias("_h2"),
    ).unique(subset=["_h1", "_h2"], keep="any")

    subj = pl.col("subj")
    m1a = subj.str.extract(r"/([0-9A-Z\-]+)--([0-9.\-;:]+)/e", 1)
    m1b = subj.str.extract(r"/([0-9A-Z\-]+)--([0-9.\-;:]+)/e", 2)
    m2 = subj.str.extract(r"/([0-9.\-;:]+)/e", 1)
    # A-case (any URI outside the two class-number families — the vast
    # majority of a web corpus): skey would be "A"+subj, so embedding
    # subj AGAIN as tkey field 1 ships it twice. Fold it: tkey =
    # "A"+subj+"␟␟"+hash, with subj reconstructed from the sort-key
    # field when field 1 is empty (_dedup_sorted_block). Byte order is
    # unchanged — both encodings compare "A"+subj first, then 0x1f
    # (below any URI byte), then the hash tail — and the keyed row
    # drops ~25 B (~24% of shuffle traffic at the 100 B/row baseline).
    out = df.with_columns(
        pl.when(m1a.is_not_null())
        .then(pl.concat_str([pl.lit("C"), m1a, pl.lit("--"), m1b,
                             pl.lit("\x1f"), subj, pl.lit("\x1f")]))
        .when(m2.is_not_null())
        .then(pl.concat_str([pl.lit("B"), m2, pl.lit("\x1f"), subj,
                             pl.lit("\x1f")]))
        .otherwise(pl.concat_str([pl.lit("A"), subj, pl.lit("\x1f\x1f")]))
        .alias("_pfx"))
    # subj is embedded in tkey (field 1) — do not ship it through the
    # shuffle twice; _dedup_sorted_block reconstructs it after the sort.
    tbl = out.drop(["subj"]).to_arrow().combine_chunks()
    n = tbl.num_rows
    hb = np.empty((n, 16), dtype=np.uint8)
    hb[:, :8] = (tbl.column("_h1").to_numpy().astype(">u8")
                 .view(np.uint8).reshape(-1, 8))
    hb[:, 8:] = (tbl.column("_h2").to_numpy().astype(">u8")
                 .view(np.uint8).reshape(-1, 8))
    tail = pa.Array.from_buffers(
        pa.binary(16), n, [None, pa.py_buffer(hb.tobytes())])
    import pyarrow.compute as pc

    tkey = pc.binary_join_element_wise(
        pc.cast(tbl.column("_pfx").chunk(0), pa.binary()),
        tail.cast(pa.binary()), b"")
    return tbl.drop_columns(["_pfx", "_h1", "_h2"]).append_column(
        "tkey", tkey)


def _dedup_sorted_block(batch):
    """Adjacent-dedup on a sorted Arrow block (all-C, no Python objects);
    reconstructs ``subj`` from the sort key (tkey = skey␟subj␟hash —
    the subject column is not shipped through the shuffle)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = batch.num_rows
    if n == 0:
        return batch.drop_columns(["tkey"]).append_column(
            "subj", pa.array([], pa.string()))
    col = batch.column("tkey").combine_chunks()
    arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
    neq = pc.not_equal(arr.slice(1), arr.slice(0, n - 1))
    mask = pa.concat_arrays([pa.array([True]), neq])
    out = batch.filter(mask)
    # max_splits=2: the 16-byte hash tail is raw binary and may itself
    # contain 0x1f — only the first two separators delimit fields
    parts = pc.split_pattern(out.column("tkey"), pattern=b"\x1f",
                             max_splits=2)
    f0 = pc.cast(pc.list_element(parts, 0), pa.string())
    f1 = pc.cast(pc.list_element(parts, 1), pa.string())
    # A-case keys fold subj into the sort-key field ("A"+subj, field 1
    # empty); B/C keys carry it as field 1. B/C subjects are never empty
    # (the class-number regexes require content), so the empty-field-1
    # test is unambiguous.
    subj = pc.if_else(pc.equal(pc.utf8_length(f1), 0),
                      pc.utf8_slice_codeunits(f0, 1), f1)
    return out.drop_columns(["tkey"]).append_column(
        "subj", pc.cast(subj, pa.string()))


def canonicalize(triples, expand: bool = False, num_buckets: Optional[int] = None,
                 sort_partitions: Optional[int] = None):
    """triples → deduplicated graph dataset in deterministic global order.

    Exact dedup + the reference's global output sort (A1 + A5) fused into
    a single range shuffle. ``expand`` unions the inference-closure edges
    *before* the shuffle, so the closure costs no extra all-to-all
    (duplicate inverse edges collapse in the same dedup).

    ``sort_partitions`` (default None = no repartition) optionally
    coalesces the keyed stream before the sort — only worth its extra
    pass when the upstream read yields pathologically many tiny blocks;
    size the READ's override_num_blocks to ~2 blocks per CPU (bench.py)
    or ~512 MB per block on a real multi-node run instead.
    """
    # batch_size=None → one polars pass per upstream block, which keeps
    # this map fused with the extract stage into a single physical pass
    # (an explicit batch_size forces a rebatch boundary — measured 5× on
    # the 1.2M-page headline together with the repartition below)
    keyed = triples.map_batches(
        lambda b: _add_tkey_arrow(b.select(_KEY_COLS), expand),
        batch_format="pyarrow", zero_copy_batch=True)
    # no repartition by default: it is a full extra pass over the triple
    # stream. Pass sort_partitions only when the upstream read yields
    # pathologically many tiny blocks (the sort exchange creates
    # B_in × B_out intermediate objects).
    if sort_partitions is not None:
        keyed = keyed.repartition(sort_partitions)
    # batch_size=None → whole sorted blocks, so a duplicate run can never be
    # split across batches of one block
    return keyed.sort("tkey").map_batches(
        _dedup_sorted_block, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
