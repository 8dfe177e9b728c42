"""Windowed / sessionized aggregates over the ``events`` stream table.

The reference has no streaming-time semantics (SURVEY §2.4 "not present"),
but a web-scale training-data pipeline needs them; implemented as the
groupby(user).map_groups pattern with per-group time ordering — the
partitioning assumption is one user's events fit one group.
"""

from __future__ import annotations

import pandas as pd

_GAP_MINUTES = 30


def _read_events(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet("%s/events.parquet" % sf_dir, columns=columns)


def sessionize(sf_dir: str, gap_minutes: int = _GAP_MINUTES):
    """(user_id, n_events, n_sessions) — a new session starts when the gap
    since the previous event exceeds ``gap_minutes``."""
    ds = _read_events(sf_dir, columns=["user_id", "ts"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("ts")
        gaps = df["ts"].diff().dt.total_seconds() > gap_minutes * 60
        return pd.DataFrame({
            "user_id": [df["user_id"].iloc[0]],
            "n_events": pd.Series([len(df)], dtype="int64"),
            "n_sessions": pd.Series([int(gaps.sum()) + 1], dtype="int64"),
        })

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


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
