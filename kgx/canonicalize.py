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


def canonicalize(triples, expand: bool = False, num_buckets: Optional[int] = None):
    """triples → deduplicated (optionally expanded) graph dataset."""
    graph = exact_dedup(triples, num_buckets=num_buckets)
    if expand:
        graph = exact_dedup(expand_inference(graph), num_buckets=num_buckets)
    return graph
