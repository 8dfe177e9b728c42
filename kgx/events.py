"""Windowed / sessionized aggregates over the ``events`` stream table.

The reference has no streaming-time semantics (SURVEY §2.4 "not present"),
but a web-scale training-data pipeline needs them. user_id is a
high-cardinality key, so sessionize shuffles on ``hash(user_id) % nparts``
buckets and does the true per-user grouping in pandas inside each bucket —
one Ray group per PARTITION, not per user. The partitioning assumption is
one user's events fit one bucket partition (they hash together by key).
"""

from __future__ import annotations

import pandas as pd

_GAP_MINUTES = 30


def _read_events(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet("%s/events.parquet" % sf_dir, columns=columns)


def _nparts():
    import ray

    return max(4, int(ray.cluster_resources().get("CPU", 8)))


def sessionize(sf_dir: str, gap_minutes: int = _GAP_MINUTES):
    """(user_id, n_events, n_sessions) — a new session starts when the gap
    since the previous event exceeds ``gap_minutes``."""
    ds = _read_events(sf_dir, columns=["user_id", "ts"])
    nparts = _nparts()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            bucket=(pd.util.hash_pandas_object(df["user_id"], index=False)
                    % nparts).astype("int32"))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized across ALL users in the bucket: one sort, one diff
        df = df.sort_values(["user_id", "ts"])
        same_user = df["user_id"].eq(df["user_id"].shift())
        gap = df["ts"].diff().dt.total_seconds() > gap_minutes * 60
        new_session = same_user & gap
        out = df.assign(ns=new_session).groupby("user_id", as_index=False).agg(
            n_events=("ts", "size"), n_sessions=("ns", "sum"))
        out["n_events"] = out["n_events"].astype("int64")
        out["n_sessions"] = (out["n_sessions"] + 1).astype("int64")
        return out[["user_id", "n_events", "n_sessions"]]

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))


def event_type_hourly(sf_dir: str):
    """(event_type, hour, n) — time-bucketed aggregate (tumbling window by
    event time), pre-aggregated inside map_batches before the groupby."""
    ds = _read_events(sf_dir, columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.assign(hour=df["ts"].dt.floor("h"))
               .groupby(["event_type", "hour"], as_index=False).size()
               .rename(columns={"size": "partial_n"}))
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["event_type", "hour"], as_index=False)["partial_n"]
                .sum().rename(columns={"partial_n": "n"}))

    # combiner (per block) then a small shuffle on the compound key
    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby(["event_type", "hour"]).map_groups(
        merge, batch_format="pandas")
