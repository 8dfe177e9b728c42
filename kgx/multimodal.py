"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake behind an import-try); the Ray-side plumbing — binary
schema, actor-pool stage with model load in ``__init__``, small batches
sized for large payloads, typed feature output — is real and tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def decode_image(payload: bytes):
    """Decode an image payload. Real decode needs PIL, which is not baked
    into this container — callers use the deterministic fake features
    below instead."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "image decode requires PIL; use FeatureExtractor's deterministic "
            "byte-level features in this environment"
        )
    raise NotImplementedError("real decode path not wired in this build")


class FeatureExtractor:
    """Actor-pool stage: 'model' built once per actor, batched inference.

    The fake model is a fixed random projection (seeded) over the payload
    byte histogram — deterministic across actors and runs, with the same
    call signature a real embedding model would have.
    """

    def __init__(self, dim: int = 16, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.W = rng.standard_normal((256, dim))  # "model load", once per actor

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        feats = []
        n_bytes = []
        for payload in df["payload"]:
            buf = np.frombuffer(payload, dtype=np.uint8)
            hist = np.bincount(buf, minlength=256).astype(np.float64)
            n_bytes.append(len(buf))
            feats.append((hist @ self.W).tolist())
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_bytes": pd.Series(n_bytes, dtype="int64"),
            "feature": feats,
        })


def payload_features(sf_dir: str, batch_size: int = 64):
    """documents.text bytes stand in for binary payloads; returns
    (doc_id, n_bytes, feature list<double>). Small ``batch_size`` models
    the large-binary-payload memory constraint."""
    import ray
    import ray.data

    ds = ray.data.read_parquet("%s/documents.parquet" % sf_dir,
                               columns=["doc_id", "text"])

    def to_payload(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "payload": [t.encode("utf-8") for t in df["text"]],
        })

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return ds.map_batches(to_payload, batch_format="pandas").map_batches(
        FeatureExtractor,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, max(2, ncpu // 2)),
    )


def payload_stats(sf_dir: str):
    """(doc_id, n_bytes) — SQL-verifiable subset of the payload pipeline."""
    feats = payload_features(sf_dir)
    return feats.select_columns(["doc_id", "n_bytes"])
