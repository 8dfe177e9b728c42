"""Windowed / sessionized aggregates over the ``events`` stream table.

The reference has no streaming-time semantics (SURVEY §2.4 "not present"),
but a web-scale training-data pipeline needs them. user_id is a
high-cardinality key, so sessionize shuffles on ``hash(user_id) % nparts``
buckets and does the true per-user grouping in pandas inside each bucket —
one Ray group per PARTITION, not per user. The partitioning assumption is
one user's events fit one bucket partition (they hash together by key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .readers import bounded_read_parquet as _bread

_GAP_MINUTES = 30


def _read_events(sf_dir: str, columns=None):
    import ray.data

    return _bread("%s/events.parquet" % sf_dir, columns=columns)


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


def events_asof(sf_dir: str, left_type: str = "purchase",
                right_type: str = "view", num_partitions=None):
    """As-of join within the event stream: for each ``left_type`` event,
    the latest strictly-earlier ``right_type`` event by the same user.
    Returns (event_id, asof_event_id, gap_us).

    Ray Data has no as-of join; this is the documented composition
    (SURVEY "custom operators"): both sides co-partition through ONE
    hash-bucket shuffle on user_id, then a vectorized ``merge_asof``
    (sorted by ts, by=user_id) runs per partition. Partitioning
    assumption: one user's events hash to one partition.
    """
    ds = _read_events(sf_dir, columns=["event_id", "ts", "user_id",
                                       "event_type"])
    nparts = num_partitions or _nparts()
    keep = (left_type, right_type)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(keep)]
        return df.assign(
            bucket=(pd.util.hash_pandas_object(df["user_id"], index=False)
                    % nparts).astype("int32"))

    def asof_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["event_type"] == left_type].sort_values("ts")
        # deterministic tie rule: among right-side events with identical
        # (user, ts), keep the max event_id — merge_asof would otherwise
        # pick whichever tie sorts last, disagreeing with the oracle's
        # max_by on tie-containing data (same dedup mirrored in the SQL)
        right = (df[df["event_type"] == right_type]
                 [["ts", "user_id", "event_id"]]
                 .groupby(["user_id", "ts"], as_index=False)["event_id"].max()
                 .sort_values("ts")
                 .rename(columns={"event_id": "asof_event_id",
                                  "ts": "asof_ts"}))
        if left.empty or right.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "asof_event_id": pd.Series([], dtype="int64"),
                                 "gap_us": pd.Series([], dtype="int64")})
        m = pd.merge_asof(left, right, left_on="ts", right_on="asof_ts",
                          by="user_id", direction="backward",
                          allow_exact_matches=False)
        m = m.dropna(subset=["asof_event_id"])
        # unit-safe µs difference (parquet timestamps may surface as
        # datetime64[us] or [ns] depending on the pandas/arrow bridge)
        gap = (m["ts"] - m["asof_ts"]) // pd.Timedelta(microseconds=1)
        return pd.DataFrame({"event_id": m["event_id"].astype("int64"),
                             "asof_event_id": m["asof_event_id"].astype("int64"),
                             "gap_us": gap.astype("int64")})

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(asof_bucket, batch_format="pandas"))


def sliding_window_counts(sf_dir: str, window_sec: int = 3600,
                          slide_sec: int = 900):
    """(event_type, window_start, n) — sliding-window counts: windows of
    ``window_sec`` starting every ``slide_sec``; an event at time t counts
    in the window_sec/slide_sec windows covering t. ``window_start`` is
    epoch seconds (grid-aligned), so the value is engine-portable.

    Map-only expansion (each event → window_sec/slide_sec rows) with a
    per-batch combiner BEFORE the groupby shuffle — the shuffle carries
    (type, window) partial counts, not event rows."""
    ds = _read_events(sf_dir, columns=["event_type", "ts"])
    k = window_sec // slide_sec

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sec = (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(seconds=1)
        base = (sec // slide_sec) * slide_sec
        frames = []
        for i in range(k):
            frames.append(pd.DataFrame({
                "event_type": df["event_type"],
                "window_start": base - i * slide_sec,
            }))
        out = pd.concat(frames, ignore_index=True)
        g = out.groupby(["event_type", "window_start"], as_index=False).size()
        return g.rename(columns={"size": "partial_n"})

    # hash AGGREGATE, not per-key map_groups: no UDF dispatch per
    # distinct (type, window) key
    partials = ds.map_batches(partial, batch_format="pandas")
    out = partials.groupby(["event_type", "window_start"]).sum("partial_n")
    return out.map_batches(
        lambda df: df.rename(columns={"sum(partial_n)": "n"}).astype({"n": "int64"}),
        batch_format="pandas")


def event_type_hourly(sf_dir: str):
    """(event_type, hour, n) — time-bucketed aggregate (tumbling window by
    event time), pre-aggregated inside map_batches before the groupby."""
    ds = _read_events(sf_dir, columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.assign(hour=df["ts"].dt.floor("h"))
               .groupby(["event_type", "hour"], as_index=False).size()
               .rename(columns={"size": "partial_n"}))
        return out

    # combiner (per block) then one hash aggregate on the compound key
    # (no per-distinct-key UDF dispatch)
    partials = ds.map_batches(partial, batch_format="pandas")
    out = partials.groupby(["event_type", "hour"]).sum("partial_n")
    return out.map_batches(
        lambda df: df.rename(columns={"sum(partial_n)": "n"}).astype({"n": "int64"}),
        batch_format="pandas")


def funnel_stages(sf_dir: str, stages=("view", "click", "purchase")):
    """(user_id, funnel_stage) — classic conversion-funnel analysis with
    first-occurrence cascade semantics: stage k is reached iff an event
    of type ``stages[k-1]`` occurs STRICTLY AFTER the timestamp that
    reached stage k-1 (stage 1 = the user's first ``stages[0]`` event).
    funnel_stage is the deepest stage reached (0 if none).

    Scale shape: the sessionize bucket co-group — hash(user_id) % nparts,
    one Ray group per partition; inside each bucket the cascade is three
    vectorized merge+filter+groupby-min passes, never a per-user loop.
    """
    ds = _read_events(sf_dir, columns=["user_id", "ts", "event_type"])
    nparts = _nparts()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            bucket=(pd.util.hash_pandas_object(df["user_id"], index=False)
                    % nparts).astype("int32"))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        users = df[["user_id"]].drop_duplicates()
        # stage 1: first occurrence of the entry event
        reach = (df[df["event_type"] == stages[0]]
                 .groupby("user_id", as_index=False)["ts"].min())
        stage_of = users.merge(reach.assign(stage=1), how="left",
                               on="user_id")
        for k, ev in enumerate(stages[1:], start=2):
            cand = df[df["event_type"] == ev].merge(
                reach.rename(columns={"ts": "prev_ts"}), on="user_id")
            cand = cand[cand["ts"] > cand["prev_ts"]]
            reach = cand.groupby("user_id", as_index=False)["ts"].min()
            stage_of = stage_of.merge(reach.assign(**{"s%d" % k: k})
                                      [["user_id", "s%d" % k]],
                                      how="left", on="user_id")
            stage_of["stage"] = stage_of[["stage", "s%d" % k]].max(axis=1)
            stage_of = stage_of.drop(columns=["s%d" % k])
        return pd.DataFrame({
            "user_id": stage_of["user_id"].astype("int64"),
            "funnel_stage": stage_of["stage"].fillna(0).astype("int64"),
        })

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))


def props_stats(sf_dir: str, key: str = "k"):
    """(event_type, n, sum_k, max_k) — semi-structured ingestion: pull an
    integer field out of the JSON ``props`` column and aggregate per
    event type. The extraction is a vectorized regex (exact for the
    integer-valued field; a full JSON path would swap in pyarrow's
    json parsing at the same spot), the aggregate is a per-batch
    combiner + tiny hash groupby — the standard two-level shape.
    """
    import re

    ds = _read_events(sf_dir, columns=["event_type", "props"])
    pat = re.escape('"%s":' % key) + r"\s*(-?\d+)"

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        k = pd.to_numeric(df["props"].str.extract(pat, expand=False),
                          errors="coerce")
        d = df.assign(k=k).dropna(subset=["k"])
        g = d.groupby("event_type", as_index=False).agg(
            n=("k", "size"), sum_k=("k", "sum"), max_k=("k", "max"))
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), sum_k=("sum_k", "sum"), max_k=("max_k", "max"))
        return pd.DataFrame({
            "event_type": g["event_type"],
            "n": g["n"].astype("int64"),
            "sum_k": g["sum_k"].astype("int64"),
            "max_k": g["max_k"].astype("int64"),
        })

    return (ds.map_batches(combine, batch_format="pandas")
            .groupby("event_type").map_groups(final, batch_format="pandas"))


def cohort_retention(sf_dir: str):
    """(cohort_day, day_offset, n_users) — classic cohort retention:
    bucket every user by their first active day (epoch days), then count
    how many users of each cohort were active again ``day_offset`` days
    later. The growth-analytics staple over an event stream.

    Scale shape: the per-batch combiner reduces events to DISTINCT
    (user, day) pairs (bounded by users × active-days, far below event
    count); one hash exchange on the user co-locates each user's days,
    where the cohort assignment is a vectorized groupby-min; the final
    (cohort, offset) count pre-aggregates per bucket and finishes in a
    tiny hash aggregate — event rows never cross a shuffle.
    """
    ds = _read_events(sf_dir, columns=["user_id", "ts"])
    nparts = _nparts()

    def user_days(df: pd.DataFrame) -> pd.DataFrame:
        # normalize to µs explicitly: parquet timestamp[us] may surface
        # as datetime64[us] or [ns] depending on the pandas/Arrow path
        us = df["ts"].astype("datetime64[us]").astype("int64")
        out = pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "day": us // 86_400_000_000,
        }).drop_duplicates()
        out["bucket"] = (pd.util.hash_pandas_object(out["user_id"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["user_id", "day"]].drop_duplicates()
        d = d.assign(cohort=d.groupby("user_id")["day"].transform("min"))
        g = (d.assign(day_offset=d["day"] - d["cohort"])
             .groupby(["cohort", "day_offset"], as_index=False).size())
        return pd.DataFrame({
            "cohort_day": g["cohort"].astype("int64"),
            "day_offset": g["day_offset"].astype("int64"),
            "n": g["size"].astype("int64")})

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cohort_day": df["cohort_day"].astype("int64"),
            "day_offset": df["day_offset"].astype("int64"),
            "n_users": df["sum(n)"].astype("int64")})

    return (ds.map_batches(user_days, batch_format="pandas")
            .groupby("bucket").map_groups(per_bucket, batch_format="pandas")
            .groupby(["cohort_day", "day_offset"]).sum("n")
            .map_batches(rename, batch_format="pandas"))


def running_totals(sf_dir: str):
    """(event_id, user_id, cum_value_q2) — the classic cumulative window
    function: per-user running sum of ``value`` in (ts, event_id) order,
    ``SUM(...) OVER (PARTITION BY user ORDER BY ts, event_id)``.

    Values are quantized per EVENT (floor(100·value) — one exactly-
    rounded float64 multiply) so the running sums are integer and
    therefore association-free: the engine's vectorized pandas cumsum
    and DuckDB's window aggregate (which may sum in a different tree
    shape) agree bit-for-bit. One hash(user) bucket exchange; the
    cumulative walk is vectorized across ALL users in the bucket
    (sort + groupby-cumsum), the same shape as sessionize.
    """
    ds = _read_events(sf_dir, columns=["event_id", "user_id", "ts",
                                       "value"])
    nparts = _nparts()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "ts": df["ts"],
            "vq": np.floor(100.0 * df["value"].to_numpy(dtype="float64"))
            .astype("int64"),
            "bucket": (pd.util.hash_pandas_object(df["user_id"],
                                                  index=False)
                       % nparts).astype("int32"),
        })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        cum = df.groupby("user_id")["vq"].cumsum()
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "cum_value_q2": cum.astype("int64"),
        })

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas"))


def range_join_counts(sf_dir: str, left_type: str = "purchase",
                      right_type: str = "view",
                      window_minutes: int = 60):
    """(event_id, n_right_in_window) — the RANGE (band) JOIN: for every
    ``left_type`` event, the number of same-user ``right_type`` events
    with ``ts ∈ [left.ts − window, left.ts)`` (strictly earlier;
    microsecond-exact integer bounds on both sides).

    Ray Data has no range-join primitive; the scalable composition is
    the same co-partition the as-of join uses — ONE hash(user) exchange
    puts every user's lefts and rights in the same partition — and the
    band COUNT per left is two vectorized ``searchsorted`` probes into
    the user's sorted right-timestamp array (O((L+R)·log R) per
    partition, never a per-pair expansion, so a hot user cannot blow up
    a task the way a naive interval cross-join would). The partitioning
    assumption (one user fits one partition) is the documented
    sessionize contract.
    """
    delta = np.int64(window_minutes) * 60_000_000
    ds = _read_events(sf_dir, columns=["event_id", "ts", "user_id",
                                       "event_type"])
    nparts = _nparts()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin([left_type, right_type])]
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "ts_us": ((df["ts"] - pd.Timestamp(0))
                      // pd.Timedelta(microseconds=1)).astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "is_left": (df["event_type"] == left_type),
            "bucket": (pd.util.hash_pandas_object(df["user_id"],
                                                  index=False)
                       % nparts).astype("int32"),
        })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rights = {u: np.sort(g["ts_us"].to_numpy())
                  for u, g in df[~df["is_left"]].groupby("user_id")}
        left = df[df["is_left"]]
        out_id, out_n = [], []
        for u, g in left.groupby("user_id"):
            arr = rights.get(u)
            ts = g["ts_us"].to_numpy()
            if arr is None:
                n = np.zeros(len(g), dtype=np.int64)
            else:
                n = (np.searchsorted(arr, ts, side="left")
                     - np.searchsorted(arr, ts - delta, side="left"))
            out_id.extend(g["event_id"].tolist())
            out_n.extend(n.tolist())
        return pd.DataFrame({
            "event_id": pd.Series(out_id, dtype="int64"),
            "n_right_in_window": pd.Series(out_n, dtype="int64"),
        })

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas"))


def ewma_user_value(sf_dir: str):
    """(user_id, event_id, ewma_q) — per-user exponentially-weighted
    moving average of ``value`` with α = 1/2 in (ts, event_id) order:
    s₁ = v₁, sᵢ = ⌊(sᵢ₋₁ + vᵢ)/2⌋ over floor(100·value) integers. The
    genuinely NON-associative sequential scan (the per-step floor makes
    it irreducible to a prefix sum), i.e. the decayed-engagement /
    session-recency score every feature pipeline keeps per key.

    Integer fixed-point keeps it oracle-able: ``value`` is positive in
    this corpus so numpy floor division and DuckDB's truncating ``//``
    agree, and the DuckDB side replays the walk with a recursive CTE
    (the bpe_train greedy-walk trick; depth = max events per user).

    Scale shape: ONE hash(user) bucket exchange (sessionize's shape);
    inside a bucket the walk is vectorized ACROSS users — the loop runs
    over position-within-user (≤ max events per user, ~dozens), each
    step a vectorized update of every user's row at that position,
    never a per-row or per-user Python loop.
    """
    ds = _read_events(sf_dir, columns=["event_id", "user_id", "ts",
                                       "value"])
    nparts = _nparts()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "ts": df["ts"],
            "vq": np.floor(100.0 * df["value"].to_numpy(dtype="float64"))
            .astype("int64"),
            "bucket": (pd.util.hash_pandas_object(df["user_id"],
                                                  index=False)
                       % nparts).astype("int32"),
        })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "event_id": pd.Series([], dtype="int64"),
                "ewma_q": pd.Series([], dtype="int64")})
        df = df.sort_values(["user_id", "ts", "event_id"]) \
               .reset_index(drop=True)
        pos = df.groupby("user_id").cumcount().to_numpy()
        vq = df["vq"].to_numpy(dtype="int64")
        s = vq.copy()
        for t in range(1, int(pos.max()) + 1 if len(pos) else 0):
            m = np.flatnonzero(pos == t)
            if len(m) == 0:
                break
            s[m] = (s[m - 1] + vq[m]) // 2
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "event_id": df["event_id"].astype("int64"),
            "ewma_q": pd.Series(s, dtype="int64"),
        })

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas"))


def value_percentiles(sf_dir: str, qs=(0.5, 0.95, 0.99)):
    """(event_type, q_pct, value_cents) — EXACT per-event-type p50/p95/
    p99 of the event value (the classic ops/latency metric), discrete
    percentile semantics (smallest value with cumulative count ≥
    ceil(q·N), DuckDB's ``quantile_disc``). Values quantize losslessly
    to integer cents (floor(100·v) — one exactly-rounded multiply) so
    the bounded-integer-domain histogram combiner applies: the shuffle
    carries (type, cents) histogram rows, never events — the
    token_quantiles shape on the events table.
    """
    import math

    ds = _read_events(sf_dir, columns=["event_type", "value"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(100.0 * df["value"].to_numpy(dtype="float64")) \
            .astype("int64")
        g = (pd.DataFrame({"event_type": df["event_type"].astype(str),
                           "c": c})
             .groupby(["event_type", "c"], as_index=False).size())
        return pd.DataFrame({"event_type": g["event_type"],
                             "c": g["c"].astype("int64"),
                             "cnt": g["size"].astype("int64")})

    def quant(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("c", as_index=False)["cnt"].sum()
             .sort_values("c").reset_index(drop=True))
        cum = g["cnt"].cumsum().to_numpy()
        vals = g["c"].to_numpy()
        total = int(cum[-1])
        rows = [(df["event_type"].iloc[0], int(round(q * 100)),
                 int(vals[np.searchsorted(cum, math.ceil(q * total))]))
                for q in qs]
        return pd.DataFrame(rows, columns=["event_type", "q_pct",
                                           "value_cents"])

    return (ds.map_batches(hist, batch_format="pandas")
            .groupby("event_type").map_groups(quant,
                                              batch_format="pandas"))


def hourly_active_users(sf_dir: str, num_partitions=None):
    """(hour, n_active) — EXACT distinct users per hourly tumbling
    window, the DAU/HAU engagement metric (COUNT(DISTINCT) per window).
    The per-batch combiner emits distinct (hour, user) pairs — events
    collapse to at most one row per user per hour BEFORE the shuffle —
    and one hour-hash bucket co-group finishes the exact nunique; the
    exchange never carries raw events.
    """
    ds = _read_events(sf_dir, columns=["ts", "user_id"])
    nparts = num_partitions or _nparts()

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        hour = (df["ts"].to_numpy().astype("datetime64[h]")
                .astype("int64"))
        g = (pd.DataFrame({"hour": hour,
                           "user_id": df["user_id"].astype("int64")})
             .drop_duplicates())
        g["bucket"] = (pd.util.hash_pandas_object(g["hour"], index=False)
                       % nparts).astype("int32")
        return g

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = (df[["hour", "user_id"]].drop_duplicates()
             .groupby("hour", as_index=False).size())
        return pd.DataFrame({"hour": g["hour"].astype("int64"),
                             "n_active": g["size"].astype("int64")})

    return (ds.map_batches(pairs, batch_format="pandas")
            .groupby("bucket").map_groups(reduce, batch_format="pandas"))


def moving_sum_3(sf_dir: str):
    """(event_id, user_id, mov3_q2) — the bounded-frame window
    aggregate: per-user sum of the current and two preceding event
    values in (ts, event_id) order (``ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW``) — the smoothing window running_totals'
    unbounded-preceding frame doesn't cover. Integer cents per event
    keep the sums association-free and bit-exact.

    One hash(user) bucket exchange; inside a bucket the frame sum is a
    vectorized cumsum difference (cum[i] − cum[i−3]) across ALL users
    at once, with the user boundary handled by masking positions < 3
    within each user — no per-user loop.
    """
    ds = _read_events(sf_dir, columns=["event_id", "user_id", "ts",
                                       "value"])
    nparts = _nparts()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "ts": df["ts"],
            "vq": np.floor(100.0 * df["value"].to_numpy(dtype="float64"))
            .astype("int64"),
            "bucket": (pd.util.hash_pandas_object(df["user_id"],
                                                  index=False)
                       % nparts).astype("int32"),
        })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "mov3_q2": pd.Series([], dtype="int64")})
        df = df.sort_values(["user_id", "ts", "event_id"]) \
               .reset_index(drop=True)
        vq = df["vq"].to_numpy(dtype="int64")
        pos = df.groupby("user_id").cumcount().to_numpy()
        out = vq.copy()
        m1 = pos >= 1
        out[m1] += vq[np.flatnonzero(m1) - 1]
        m2 = pos >= 2
        out[m2] += vq[np.flatnonzero(m2) - 2]
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "mov3_q2": pd.Series(out, dtype="int64")})

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas"))


def latest_event_per_user(sf_dir: str):
    """(user_id, event_id, event_type, value_q2) — latest-wins upsert
    compaction (the CDC / state-table pattern): every user reduced to
    their most recent event, ties on ts broken by the higher event_id
    (the deterministic total order both engines share).

    The argmax is fully combiner-friendly: each batch keeps one row per
    user (per-batch idxmax), so the hash(user) exchange carries at most
    one row per (user, batch); the bucket reduce repeats the same
    argmax. Values quantize to integer cents for a hash-portable
    output.
    """
    ds = _read_events(sf_dir, columns=["event_id", "user_id", "ts",
                                       "event_type", "value"])
    nparts = _nparts()

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        return df.groupby("user_id", as_index=False).tail(1)

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        g = best(df)
        return pd.DataFrame({
            "user_id": g["user_id"].astype("int64"),
            "event_id": g["event_id"].astype("int64"),
            "ts": g["ts"],
            "event_type": g["event_type"].astype(str),
            "vq": np.floor(100.0 * g["value"].to_numpy(dtype="float64"))
            .astype("int64"),
            "bucket": (pd.util.hash_pandas_object(g["user_id"],
                                                  index=False)
                       % nparts).astype("int32"),
        })

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = best(df)
        return pd.DataFrame({
            "user_id": g["user_id"].astype("int64"),
            "event_id": g["event_id"].astype("int64"),
            "event_type": g["event_type"].astype(str),
            "value_q2": g["vq"].astype("int64")})

    return (ds.map_batches(combiner, batch_format="pandas")
            .groupby("bucket").map_groups(reduce, batch_format="pandas"))


def session_table(sf_dir: str, gap_minutes: int = _GAP_MINUTES):
    """(user_id, session_idx, start_us, end_us, n_events) — the
    materialized SESSION TABLE (one row per session with bounds and
    size), the join-ready artifact downstream funnel/attribution work
    consumes; ``sessionize`` only reports per-user counts. A session
    breaks when the gap since the user's previous event exceeds
    ``gap_minutes`` (strict, µs-exact); timestamps surface as epoch µs
    int64 so the row hashes engine-portably.

    One hash(user) bucket exchange; inside a bucket the break flags,
    session indices (per-user cumsum) and the (user, session) aggregate
    are all vectorized across every user at once.
    """
    ds = _read_events(sf_dir, columns=["event_id", "user_id", "ts"])
    nparts = _nparts()
    gap_us = gap_minutes * 60 * 1_000_000

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            bucket=(pd.util.hash_pandas_object(df["user_id"], index=False)
                    % nparts).astype("int32"))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "session_idx", "start_us", "end_us",
                "n_events"]
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in cols})
        df = df.sort_values(["user_id", "ts", "event_id"]) \
               .reset_index(drop=True)
        tus = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        same = df["user_id"].eq(df["user_id"].shift()).to_numpy()
        prev = np.roll(tus, 1)
        brk = same & ((tus - prev) > gap_us)
        sidx = pd.Series(brk.astype("int64")) \
            .groupby(df["user_id"].to_numpy()).cumsum()
        g = (pd.DataFrame({"user_id": df["user_id"].astype("int64"),
                           "session_idx": sidx.astype("int64"),
                           "tus": tus})
             .groupby(["user_id", "session_idx"], as_index=False)
             .agg(start_us=("tus", "min"), end_us=("tus", "max"),
                  n_events=("tus", "size")))
        for c in cols:
            g[c] = g[c].astype("int64")
        return g[cols]

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas"))


def max_concurrent_sessions(sf_dir: str, gap_minutes: int = _GAP_MINUTES):
    """(hour, max_concurrent) — the SWEEP-LINE interval query: peak
    session concurrency per hour over ``session_table``'s intervals
    (the capacity-planning metric). Each session contributes +1 at
    start_us and −1 at end_us+1 (inclusive ends); concurrency is the
    running sum over the global (t, delta, user, session) order, and
    each hour reports the maximum post-delta value among its own sweep
    points (hours with no boundary events are constant and omitted).

    Scale shape — a global ordered scan WITHOUT a global sort
    materialization (the shard_corpus counting-sort trick on the time
    axis): delta rows are session-sized (2 per session); a per-hour
    delta-sum combiner (tiny) gives every hour's carry-in by cumulative
    sum of an hours-sized table; ONE hour co-group then computes the
    within-hour running sums locally and adds the broadcast carry-in.
    """
    import ray

    sess = session_table(sf_dir, gap_minutes)
    nparts = _nparts()
    hour_us = 3_600_000_000

    def deltas(df: pd.DataFrame) -> pd.DataFrame:
        a = pd.DataFrame({"t": df["start_us"].astype("int64"),
                          "dd": np.int64(1),
                          "u": df["user_id"].astype("int64"),
                          "s": df["session_idx"].astype("int64")})
        b = pd.DataFrame({"t": (df["end_us"] + 1).astype("int64"),
                          "dd": np.int64(-1),
                          "u": df["user_id"].astype("int64"),
                          "s": df["session_idx"].astype("int64")})
        out = pd.concat([a, b], ignore_index=True)
        out["hour"] = (out["t"] // hour_us).astype("int64")
        return out

    dl = sess.map_batches(deltas, batch_format="pandas").materialize()

    # pass A: per-hour delta sums (combiner) → carry-in by cumsum
    def hour_sums(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("hour", as_index=False)["dd"].sum()
        return pd.DataFrame({"hour": g["hour"].astype("int64"),
                             "dsum": g["dd"].astype("int64")})

    hs = (dl.map_batches(hour_sums, batch_format="pandas")
          .to_pandas().groupby("hour", as_index=False)["dsum"].sum()
          .sort_values("hour"))
    carry = dict(zip(hs["hour"],
                     hs["dsum"].cumsum().shift(fill_value=0)))
    carry_ref = ray.put(carry)

    # pass B: one hour co-group — local sweep + broadcast carry-in
    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(bucket=(pd.util.hash_pandas_object(
            df["hour"], index=False) % nparts).astype("int32"))

    def sweep_hours(df: pd.DataFrame) -> pd.DataFrame:
        from kgx.traindata import _bcast_get

        cin = _bcast_get(carry_ref)
        df = df.sort_values(["t", "dd", "u", "s"]).reset_index(drop=True)
        out_h, out_m = [], []
        for hour, g in df.groupby("hour", sort=False):
            run = int(cin.get(int(hour), 0)) + g["dd"].cumsum()
            out_h.append(int(hour))
            out_m.append(int(run.max()))
        return pd.DataFrame({"hour": pd.Series(out_h, dtype="int64"),
                             "max_concurrent": pd.Series(out_m,
                                                         dtype="int64")})

    return (dl.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(sweep_hours,
                                          batch_format="pandas"))


def markov_transitions(sf_dir: str):
    """(prev_type, next_type, n) — the first-order Markov transition
    counts over each user's time-ordered event stream (the sequence-
    model / clickstream-mining primitive; row order within a user is
    (ts, event_id), the deterministic total order both engines share).

    Consecutiveness needs a user's full stream co-located, so the one
    exchange ships raw (user, ts, id, type) rows hash(user)-bucketed —
    same shape as sessionize. Inside a bucket every user is processed
    at once: one sort, one shift, a boolean same-user mask, then a
    crosstab-sized groupby; the per-bucket output is at most
    |types|² rows, so the final reduce is a tiny hash aggregate.
    """
    ds = _read_events(sf_dir, columns=["event_id", "user_id", "ts",
                                       "event_type"])
    nparts = _nparts()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "ts": df["ts"],
            "event_id": df["event_id"].astype("int64"),
            "event_type": df["event_type"].astype(str),
            "bucket": (pd.util.hash_pandas_object(
                df["user_id"].astype("int64"), index=False)
                % nparts).astype("int32")})

    def transitions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        same = df["user_id"].to_numpy() == np.roll(
            df["user_id"].to_numpy(), 1)
        same[0] = False
        prev = np.roll(df["event_type"].to_numpy(), 1)
        t = pd.DataFrame({"prev_type": prev[same],
                          "next_type": df["event_type"].to_numpy()[same]})
        g = t.groupby(["prev_type", "next_type"], as_index=False).size()
        return pd.DataFrame({"prev_type": g["prev_type"].astype(str),
                             "next_type": g["next_type"].astype(str),
                             "n": g["size"].astype("int64")})

    from ray.data.aggregate import Sum

    partials = (ds.map_batches(add_bucket, batch_format="pandas")
                .groupby("bucket").map_groups(transitions,
                                              batch_format="pandas"))
    # |types|² keys — native hash aggregate is fine at this cardinality
    out = partials.groupby(["prev_type", "next_type"]).aggregate(Sum("n"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"prev_type": df["prev_type"].astype(str),
                             "next_type": df["next_type"].astype(str),
                             "n": df["sum(n)"].astype("int64")})

    return out.map_batches(finish, batch_format="pandas")


def user_paths(sf_dir: str):
    """(user_id, path, n_events) — each user's full time-ordered
    event-type journey as a '>'-joined string (the clickstream
    path-analysis / ordered collect_list shape); order is (ts,
    event_id), the deterministic total order both engines share.

    One hash(user) exchange of raw (user, ts, id, type) rows — ordered
    reassembly needs a user's events co-located, same shape as
    sessionize. Inside a bucket one sort serves every user and the
    join is a vectorized groupby-agg; path length is bounded by a
    user's own event count.
    """
    ds = _read_events(sf_dir, columns=["event_id", "user_id", "ts",
                                       "event_type"])
    nparts = _nparts()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "ts": df["ts"],
            "event_id": df["event_id"].astype("int64"),
            "event_type": df["event_type"].astype(str),
            "bucket": (pd.util.hash_pandas_object(
                df["user_id"].astype("int64"), index=False)
                % nparts).astype("int32")})

    def paths(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        g = df.groupby("user_id", as_index=False).agg(
            path=("event_type", ">".join),
            n_events=("event_id", "size"))
        return pd.DataFrame({"user_id": g["user_id"].astype("int64"),
                             "path": g["path"].astype(str),
                             "n_events": g["n_events"].astype("int64")})

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(paths, batch_format="pandas"))


def ab_test_zstat(sf_dir: str, q: int = 10**6):
    """One row (n_a, s1_a, s2_a, n_b, s1_b, s2_b, z_q6) — the two-sample
    Welch z-statistic comparing event values between the A/B arms
    (user_id parity): the experiment-analysis primitive, reduced to six
    integer sufficient statistics (the linreg_tokens pattern).

    Map-only 6-int per-batch partials (zero shuffles), exact Python-int
    driver fold; the z float tree is built in ONE fixed order from the
    integer stats — int→double conversion and each IEEE op are
    identical in numpy and DuckDB, so floor(q·z) is bit-portable:
    z = (s1a/na − s1b/nb) /
        sqrt(((s2a − s1a·s1a/na)/(na−1))/na +
             ((s2b − s1b·s1b/nb)/(nb−1))/nb)
    """
    ds = _read_events(sf_dir, columns=["user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(100.0 * df["value"].to_numpy("float64")
                         + 0.5).astype("int64")
        a = (df["user_id"].to_numpy("int64") % 2) == 0
        return pd.DataFrame({
            "n_a": [int(a.sum())], "s1_a": [int(cents[a].sum())],
            "s2_a": [int((cents[a] * cents[a]).sum())],
            "n_b": [int((~a).sum())], "s1_b": [int(cents[~a].sum())],
            "s2_b": [int((cents[~a] * cents[~a]).sum())]})

    t = ds.map_batches(partial, batch_format="pandas").to_pandas()
    na, s1a, s2a = int(t["n_a"].sum()), int(t["s1_a"].sum()), \
        int(t["s2_a"].sum())
    nb, s1b, s2b = int(t["n_b"].sum()), int(t["s1_b"].sum()), \
        int(t["s2_b"].sum())
    # fixed-order IEEE tree, mirrored literally in the SQL oracle
    ma = float(s1a) / float(na)
    mb = float(s1b) / float(nb)
    va = (float(s2a) - float(s1a) * float(s1a) / float(na)) \
        / float(na - 1)
    vb = (float(s2b) - float(s1b) * float(s1b) / float(nb)) \
        / float(nb - 1)
    import math

    z = (ma - mb) / math.sqrt(va / float(na) + vb / float(nb))
    return pd.DataFrame({
        "n_a": pd.Series([na], dtype="int64"),
        "s1_a": pd.Series([s1a], dtype="int64"),
        "s2_a": pd.Series([s2a], dtype="int64"),
        "n_b": pd.Series([nb], dtype="int64"),
        "s1_b": pd.Series([s1b], dtype="int64"),
        "s2_b": pd.Series([s2b], dtype="int64"),
        "z_q6": pd.Series([math.floor(float(q) * z)], dtype="int64")})


def late_events(sf_dir: str, delay_sec: int = 300,
                num_partitions=None):
    """(event_type, n_late, n_total) — watermark / late-data
    accounting, the streaming-ingestion semantics a batch engine must
    reproduce for backfills: events ARRIVE in a deterministic md5
    permutation of event_id (simulating network reordering — the
    corpus itself is fully ordered, so identity order would be
    degenerate), the watermark is the running max event-time over
    strictly earlier arrivals, and an event is late when its event
    time trails the watermark by more than ``delay_sec``.

    A GLOBAL ordered scan without a global sort (the
    max_concurrent_sessions carry-in trick on the arrival axis): the
    arrival key's top bits range-partition events; each bucket sorts
    locally and cummaxes; per-bucket max event-times form an
    output-sized prefix table whose carry-in broadcasts back; the late
    flags and per-type counts vectorize inside each bucket. One
    exchange total.
    """
    import hashlib

    ds = _read_events(sf_dir, columns=["event_id", "ts", "event_type"])
    nparts = num_partitions or _nparts()

    def key_of(ids: pd.Series) -> np.ndarray:
        return np.array(
            [int(hashlib.md5(("arr:%d" % i).encode()).hexdigest()[:16],
                 16) for i in ids], dtype="uint64")

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        k = key_of(df["event_id"].astype("int64"))
        return pd.DataFrame({
            "k": k, "event_id": df["event_id"].astype("int64"),
            "us": (df["ts"] - pd.Timestamp(0))
            // pd.Timedelta(microseconds=1),
            "event_type": df["event_type"].astype(str),
            # range partition on the arrival key (order-preserving)
            "bucket": pd.Series(
                k // np.uint64((1 << 64) // nparts + 1),
                index=df.index).astype("int32")})

    kds = ds.map_batches(keyed, batch_format="pandas").materialize()

    # output-sized prefix table: per-bucket max event time
    def bmax(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bucket", as_index=False)["us"].max()
        return pd.DataFrame({"bucket": g["bucket"].astype("int32"),
                             "mx": g["us"].astype("int64")})

    pref = (kds.map_batches(bmax, batch_format="pandas").to_pandas()
            .groupby("bucket", as_index=False)["mx"].max()
            .sort_values("bucket"))
    carry = {}
    run = None
    for b, m in zip(pref["bucket"], pref["mx"]):
        carry[int(b)] = run
        run = int(m) if run is None else max(run, int(m))

    delay_us = delay_sec * 10**6

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["k", "event_id"]).reset_index(drop=True)
        us = df["us"].to_numpy("int64")
        cm = np.maximum.accumulate(us)
        wm = np.empty(len(us), dtype="float64")
        wm[0] = np.nan
        wm[1:] = cm[:-1]
        cin = carry.get(int(df["bucket"].iloc[0]))
        if cin is not None:
            wm = np.where(np.isnan(wm), float(cin),
                          np.maximum(wm, float(cin)))
        late = ~np.isnan(wm) & (us.astype("float64")
                                < wm - float(delay_us))
        g = (df.assign(late=late.astype("int64"))
             .groupby("event_type", as_index=False)
             .agg(n_late=("late", "sum"), n_total=("late", "size")))
        return pd.DataFrame({
            "event_type": g["event_type"].astype(str),
            "n_late": g["n_late"].astype("int64"),
            "n_total": g["n_total"].astype("int64")})

    t = (kds.groupby("bucket").map_groups(scan, batch_format="pandas")
         .to_pandas().groupby("event_type", as_index=False)
         [["n_late", "n_total"]].sum())
    return pd.DataFrame({
        "event_type": t["event_type"].astype(str),
        "n_late": t["n_late"].astype("int64"),
        "n_total": t["n_total"].astype("int64")})


def daily_type_delta(sf_dir: str):
    """(event_type, day, rev_q2, delta_q2) — daily value totals per
    event type with the day-over-day change (lag over an AGGREGATE:
    the reporting-pipeline window-on-rollup shape; delta is NULL-free —
    the first present day per type reports 0, mirroring
    coalesce(lag)). Days are epoch days; values exact integer cents.

    Scale shape: per-batch (type, day) combiner so the exchange
    carries daily cells; the aggregated series is tiny
    (|types|·|days|), so the lag computes driver-side on the
    output-sized frame.
    """
    ds = _read_events(sf_dir, columns=["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "day": ((df["ts"] - pd.Timestamp(0))
                    // pd.Timedelta(days=1)).astype("int64"),
            "v": np.floor(100.0 * df["value"].to_numpy("float64")
                          + 0.5).astype("int64")})
        return t.groupby(["event_type", "day"], as_index=False)["v"].sum()

    t = (ds.map_batches(partial, batch_format="pandas").to_pandas()
         .groupby(["event_type", "day"], as_index=False)["v"].sum()
         .sort_values(["event_type", "day"]).reset_index(drop=True))
    prev = t.groupby("event_type")["v"].shift()
    return pd.DataFrame({
        "event_type": t["event_type"].astype(str),
        "day": t["day"].astype("int64"),
        "rev_q2": t["v"].astype("int64"),
        "delta_q2": (t["v"] - prev.fillna(t["v"])).astype("int64")})


def winsorize_values(sf_dir: str, lo: float = 0.05, hi: float = 0.95):
    """(event_id, value_q2, value_wins_q2) — winsorization: clip event
    values to the exact [p05, p95] band (the robust-preprocessing step
    before averaging heavy-tailed metrics). Percentile rule =
    ``quantile_disc`` (value at 1-based rank ceil(q·n)), computed
    exactly from the integer-cents histogram — no sort, no sampling.

    Scale shape: one histogram combiner (the value_percentiles
    exchange, output-sized), cut points broadcast by closure into a
    map-only clip pass.
    """
    ds = _read_events(sf_dir, columns=["event_id", "value"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(100.0 * df["value"].to_numpy("float64")
                     + 0.5).astype("int64")
        g = pd.Series(c).value_counts().sort_index()
        return pd.DataFrame({"cents": g.index.astype("int64"),
                             "n": g.to_numpy("int64")})

    h = (ds.map_batches(hist, batch_format="pandas").to_pandas()
         .groupby("cents", as_index=False)["n"].sum()
         .sort_values("cents"))
    cum = h["n"].cumsum().to_numpy()
    n = int(cum[-1])
    vals = h["cents"].to_numpy("int64")

    def qdisc(q: float) -> int:
        target = int(np.ceil(q * n))
        return int(vals[np.searchsorted(cum, target)])

    plo, phi = qdisc(lo), qdisc(hi)

    def clip(df: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(100.0 * df["value"].to_numpy("float64")
                     + 0.5).astype("int64")
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "value_q2": pd.Series(c, dtype="int64", index=df.index),
            "value_wins_q2": pd.Series(np.clip(c, plo, phi),
                                       dtype="int64", index=df.index)})

    return ds.map_batches(clip, batch_format="pandas")


def gini_values(sf_dir: str):
    """One row (n, sum_q2, gini_q6) — the exact Gini coefficient of
    event values (inequality / concentration diagnostics for spend or
    token distributions): G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over
    1-based ranks of the ascending sort — computed WITHOUT a sort from
    the integer-cents histogram (ties share consecutive ranks, and
    equal values make Σ i·xᵢ independent of tie order: per value v
    with count c starting at rank r, the contribution is
    v·(c·r + c·(c−1)/2)). Pure integers; gini_q6 floor-divides the
    non-negative numerator.

    Scale shape: one histogram combiner (output-sized), driver fold in
    arbitrary-precision ints — no sort, no second pass.
    """
    ds = _read_events(sf_dir, columns=["value"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(100.0 * df["value"].to_numpy("float64")
                     + 0.5).astype("int64")
        g = pd.Series(c).value_counts().sort_index()
        return pd.DataFrame({"cents": g.index.astype("int64"),
                             "n": g.to_numpy("int64")})

    h = (ds.map_batches(hist, batch_format="pandas").to_pandas()
         .groupby("cents", as_index=False)["n"].sum()
         .sort_values("cents"))
    n = 0
    s = 0
    sw = 0  # Σ rank·x over the ascending order, ties rank-consecutive
    for v, c in zip(h["cents"], h["n"]):
        v, c = int(v), int(c)
        r = n + 1  # first rank of this run
        sw += v * (c * r + c * (c - 1) // 2)
        n += c
        s += v * c
    gini_q6 = (10**6 * (2 * sw - (n + 1) * s)) // (n * s)
    return pd.DataFrame({
        "n": pd.Series([n], dtype="int64"),
        "sum_q2": pd.Series([s], dtype="int64"),
        "gini_q6": pd.Series([gini_q6], dtype="int64")})


def interarrival_percentiles(sf_dir: str, qs=(0.5, 0.95)):
    """(event_type, p50_us, p95_us) — exact percentiles of the
    inter-arrival gap (µs since the same user's previous event of the
    SAME type): the latency/engagement distribution per event family.
    Percentile rule = quantile_disc (1-based rank ceil(q·n)).

    Scale shape: the gaps need per-(user, type) streams co-located —
    one hash(user) exchange (the sessionize shape); inside a bucket
    one sort + shift serves every (user, type) pair, and the bucket
    emits a (type, gap) HISTOGRAM (combiner), so the second pass is an
    output-sized driver fold — no sort at any scale. Gap values are
    µs-exact integers.
    """
    ds = _read_events(sf_dir, columns=["user_id", "ts", "event_id",
                                       "event_type"])
    nparts = _nparts()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "ts": df["ts"],
            "event_id": df["event_id"].astype("int64"),
            "event_type": df["event_type"].astype(str),
            "bucket": (pd.util.hash_pandas_object(
                df["user_id"].astype("int64"), index=False)
                % nparts).astype("int32")})

    def gaps_hist(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts",
                             "event_id"])
        same = (df["user_id"].eq(df["user_id"].shift())
                & df["event_type"].eq(df["event_type"].shift()))
        gap = ((df["ts"] - df["ts"].shift())
               // pd.Timedelta(microseconds=1))
        t = pd.DataFrame({"event_type": df["event_type"],
                          "gap": gap})[same.to_numpy()]
        g = (t.groupby(["event_type", "gap"], as_index=False).size()
             .rename(columns={"size": "n"}))
        return pd.DataFrame({"event_type": g["event_type"].astype(str),
                             "gap": g["gap"].astype("int64"),
                             "n": g["n"].astype("int64")})

    h = (ds.map_batches(add_bucket, batch_format="pandas")
         .groupby("bucket").map_groups(gaps_hist,
                                       batch_format="pandas")
         .to_pandas()
         .groupby(["event_type", "gap"], as_index=False)["n"].sum())

    rows = []
    for et, g in h.groupby("event_type"):
        g = g.sort_values("gap")
        cum = g["n"].cumsum().to_numpy()
        n = int(cum[-1])
        vals = g["gap"].to_numpy("int64")
        ps = [int(vals[np.searchsorted(cum, int(np.ceil(q * n)))])
              for q in qs]
        rows.append((et, *ps))
    out = pd.DataFrame(rows, columns=["event_type", "p50_us",
                                      "p95_us"])
    return out.astype({"event_type": str, "p50_us": "int64",
                       "p95_us": "int64"}).sort_values("event_type") \
        .reset_index(drop=True)


def cumulative_users_by_day(sf_dir: str):
    """(day, n_new, n_cumulative) — daily new users and the cumulative
    distinct-user count (the growth-curve / running COUNT(DISTINCT)
    window, which naive pipelines recompute per day at O(days·users)):
    each user reduces to their FIRST-seen day (per-batch argmin
    combiner → one hash(user) co-group), days histogram to new-user
    counts, and the cumulative sum folds driver-side over the
    output-sized day series.
    """
    ds = _read_events(sf_dir, columns=["user_id", "ts"])
    nparts = _nparts()

    def first_seen(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "day": ((df["ts"] - pd.Timestamp(0))
                    // pd.Timedelta(days=1)).astype("int64")})
        g = t.groupby("user_id", as_index=False)["day"].min()
        return pd.DataFrame({
            "user_id": g["user_id"], "day": g["day"].astype("int64"),
            "bucket": (pd.util.hash_pandas_object(g["user_id"],
                                                  index=False)
                       % nparts).astype("int32")})

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False)["day"].min()
        d = g.groupby("day", as_index=False).size()
        return pd.DataFrame({"day": d["day"].astype("int64"),
                             "n_new": d["size"].astype("int64")})

    t = (ds.map_batches(first_seen, batch_format="pandas")
         .groupby("bucket").map_groups(reduce, batch_format="pandas")
         .to_pandas().groupby("day", as_index=False)["n_new"].sum()
         .sort_values("day"))
    return pd.DataFrame({
        "day": t["day"].astype("int64"),
        "n_new": t["n_new"].astype("int64"),
        "n_cumulative": t["n_new"].cumsum().astype("int64")}) \
        .reset_index(drop=True)


def dense_daily_counts(sf_dir: str):
    """(event_type, day, n_events) — the gap-filled (dense) daily
    count series per event type: EVERY epoch day in the corpus's
    global [min_day, max_day] span appears for every type, absent
    cells zero-filled. Downstream time-series consumers (lag windows,
    seasonality fits, anomaly scoring) require a dense grid — a
    sparse groupby silently skips quiet days and shifts every lag.

    Scale shape: per-batch (type, day) count combiner — the exchange
    carries daily cells, never events; the dense reindex happens on
    the output-sized (|types|·|days|) frame driver-side. Zero
    all-to-alls.
    """
    ds = _read_events(sf_dir, columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "day": ((df["ts"] - pd.Timestamp(0))
                    // pd.Timedelta(days=1)).astype("int64")})
        g = t.groupby(["event_type", "day"]).size().reset_index(
            name="n")
        return g

    t = (ds.map_batches(partial, batch_format="pandas").to_pandas()
         .groupby(["event_type", "day"], as_index=False)["n"].sum())
    days = np.arange(int(t["day"].min()), int(t["day"].max()) + 1)
    types = sorted(t["event_type"].unique())
    grid = pd.MultiIndex.from_product([types, days],
                                      names=["event_type", "day"])
    out = (t.set_index(["event_type", "day"])["n"]
           .reindex(grid, fill_value=0).reset_index())
    return pd.DataFrame({
        "event_type": out["event_type"].astype(str),
        "day": out["day"].astype("int64"),
        "n_events": out["n"].astype("int64")})


def w1_drift(sf_dir: str):
    """(type_a, type_b, w1_num, n_a, n_b) — exact WASSERSTEIN-1
    (earth-mover) distance between every pair of event types' daily
    arrival distributions over the dense global day grid: with
    cum_t(d) the cumulative count of type t through day d and N_t its
    total, W1 = Σ_d |cum_a(d)/N_a − cum_b(d)/N_b| (in day units). To
    stay in EXACT integers the op emits the cross-multiplied
    numerator w1_num = Σ_d |cum_a(d)·N_b − cum_b(d)·N_a| with the
    N_a·N_b denominator recoverable from the emitted totals — the
    distribution-shift measure that, unlike PSI (bin-ratio) and KS
    (max gap), weighs HOW FAR mass moved, completing the drift trio.

    Scale shape: the same per-batch (type, day) count combiner as
    ``dense_daily_counts`` (the exchange carries daily cells, never
    events); cumulative sums and the pairwise fold run on the
    output-sized |types|·|days| grid driver-side. Zero all-to-alls.
    """
    import itertools

    dense = dense_daily_counts(sf_dir)
    dense = dense.to_pandas() if hasattr(dense, "to_pandas") else dense
    piv = dense.pivot(index="day", columns="event_type",
                      values="n_events").sort_index()
    cum = piv.cumsum()
    totals = piv.sum()
    rows = []
    for a, b in itertools.combinations(sorted(piv.columns), 2):
        na, nb = int(totals[a]), int(totals[b])
        num = int(np.abs(cum[a].to_numpy("int64") * nb
                         - cum[b].to_numpy("int64") * na).sum())
        rows.append((a, b, num, na, nb))
    return pd.DataFrame(rows, columns=["type_a", "type_b", "w1_num",
                                       "n_a", "n_b"]) \
        .astype({"w1_num": "int64", "n_a": "int64", "n_b": "int64"})


def scd2_intervals(sf_dir: str):
    """(user_id, event_id, valid_from_us, valid_to_us) — the SCD
    type-2 temporal table build: each user event becomes a validity
    interval [its ts, the user's next event ts), the current (open)
    row closed with the 2100-01-01 sentinel. Ties on ts order by
    event_id — the same deterministic total order every sequential
    operator in this module uses. The upsert-log → snapshot-table
    shape (latest_event_per_user is the SCD1 special case).

    Scale shape: one hash(user) exchange; inside each bucket one sort
    + one shift serves every user vectorized (lead = next row's ts
    where the next row is the same user, else sentinel).
    """
    SENTINEL = 4102444800000000  # 2100-01-01 epoch µs
    nparts = _nparts()
    ds = _read_events(sf_dir, columns=["user_id", "event_id", "ts"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "event_id": df["event_id"].astype("int64"),
            "tus": ((df["ts"] - pd.Timestamp(0))
                    // pd.Timedelta(microseconds=1)).astype("int64"),
            "bucket": (pd.util.hash_pandas_object(
                df["user_id"], index=False) % nparts).astype("int32")})

    def intervals(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "tus", "event_id"]) \
            .reset_index(drop=True)
        nxt_user = df["user_id"].shift(-1)
        nxt_tus = df["tus"].shift(-1)
        to_us = np.where(nxt_user == df["user_id"],
                         nxt_tus, float(SENTINEL)).astype("int64")
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "event_id": df["event_id"].astype("int64"),
            "valid_from_us": df["tus"].astype("int64"),
            "valid_to_us": pd.Series(to_us, dtype="int64")})

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(intervals,
                                          batch_format="pandas"))


def autocorr_daily(sf_dir: str):
    """(event_type, n_pairs, cov_num, var_x_num, var_y_num) — lag-1
    autocorrelation diagnostics of each type's DENSE daily count
    series (zero-filled days included — computing this on the sparse
    series silently shifts every lag, which is why
    ``dense_daily_counts`` exists). The Pearson r over (xₜ, xₜ₊₁)
    pairs reduces to integer sufficient statistics: cov_num =
    n·Σxy − Σx·Σy, var_*_num = n·Σ·² − (Σ·)²; r = cov/√(vx·vy)
    divides out, so the emitted columns are exact integers
    (the linreg_tokens pattern).

    Scale shape: inherits dense_daily_counts' combiner (the exchange
    carries daily cells, never events); the pair fold runs on the
    output-sized dense frame driver-side in Python bigints.
    """
    dense = dense_daily_counts(sf_dir)
    rows = []
    for et, g in dense.groupby("event_type", sort=True):
        v = [int(x) for x in
             g.sort_values("day")["n_events"].to_numpy()]
        x, y = v[:-1], v[1:]
        n = len(x)
        sx, sy = sum(x), sum(y)
        sxy = sum(a * b for a, b in zip(x, y))
        sxx = sum(a * a for a in x)
        syy = sum(b * b for b in y)
        rows.append((str(et), n, n * sxy - sx * sy,
                     n * sxx - sx * sx, n * syy - sy * sy))
    return pd.DataFrame(
        rows, columns=["event_type", "n_pairs", "cov_num",
                       "var_x_num", "var_y_num"]).astype(
        {"n_pairs": "int64", "cov_num": "int64",
         "var_x_num": "int64", "var_y_num": "int64"})


def interval_coverage(sf_dir: str):
    """(user_id, n_islands, covered_us) — interval UNION per user
    (gaps-and-islands over ranges): each event opens an interval
    [ts, ts + cents·10ms) whose length depends on its value, so
    intervals genuinely nest/engulf (a long interval can swallow
    several later ones — this is NOT gap-sessionization, which only
    looks at adjacent starts). Emits the merged-island count and the
    exact union length in µs — the "how much wall-clock was covered"
    primitive behind SLA accounting and ad-exposure dedup.

    Scale shape: one hash(user) exchange; inside a bucket one sort +
    one grouped cummax serves every user vectorized (break ⟺ start >
    running max of prior ends; island coverage = max end − min start).
    """
    nparts = _nparts()
    ds = _read_events(sf_dir, columns=["user_id", "ts", "value"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        s = ((df["ts"] - pd.Timestamp(0))
             // pd.Timedelta(microseconds=1)).astype("int64")
        cents = np.floor(100.0 * df["value"].to_numpy("float64")
                         + 0.5).astype("int64")
        return pd.DataFrame({
            "u": df["user_id"].astype("int64"), "s": s,
            "e": s + cents * 10_000,
            "bucket": (pd.util.hash_pandas_object(
                df["user_id"], index=False) % nparts).astype("int32")})

    def sweep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["u", "s", "e"]).reset_index(drop=True)
        prev_max = df.groupby("u")["e"].cummax() \
            .groupby(df["u"]).shift()
        brk = prev_max.isna() | (df["s"] > prev_max)
        isl = brk.astype("int64").cumsum()  # global island ids
        g = df.assign(isl=isl).groupby(["u", "isl"], as_index=False) \
            .agg(s=("s", "min"), e=("e", "max"))
        out = g.groupby("u", as_index=False).agg(
            n_islands=("isl", "size"), covered_us=("e", "sum"))
        start_sum = g.groupby("u")["s"].sum().to_numpy()
        return pd.DataFrame({
            "user_id": out["u"].astype("int64"),
            "n_islands": out["n_islands"].astype("int64"),
            "covered_us": (out["covered_us"].to_numpy("int64")
                           - start_sum).astype("int64")})

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(sweep,
                                          batch_format="pandas"))


def value_percentiles_cont(sf_dir: str):
    """(event_type, n, p50_x2, p95_x20) — INTERPOLATED percentiles
    (SQL percentile_cont semantics) per event type, kept exact by
    clearing the interpolation denominators: at q the value sits at
    position (n−1)·q, so p50·2 = c⌊pos⌋ + c⌈pos⌉ and p95·20 =
    (20−r)·c⌊pos⌋ + r·c⌈pos⌉ with r = (19·(n−1)) mod 20 — every
    output an exact integer (the quantile_disc ops in this module
    cover the discrete rule; this is the other SQL percentile).

    Scale shape: same bounded-integer-domain histogram combiner as
    value_percentiles — the exchange carries (type, cents) histogram
    rows, never events; the interpolation walks the cumulative
    histogram driver-side (no sort at any scale).
    """
    ds = _read_events(sf_dir, columns=["event_type", "value"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({
            "event_type": df["event_type"].astype(str),
            "cents": np.floor(100.0 * df["value"].to_numpy("float64")
                              + 0.5).astype("int64")})
        g = t.groupby(["event_type", "cents"]).size().reset_index(
            name="n")
        return g

    h = (ds.map_batches(hist, batch_format="pandas").to_pandas()
         .groupby(["event_type", "cents"], as_index=False)["n"].sum())
    rows = []
    for et, g in h.groupby("event_type", sort=True):
        g = g.sort_values("cents")
        vals = g["cents"].to_numpy("int64")
        cum = g["n"].cumsum().to_numpy("int64")
        n = int(cum[-1])

        def at(rank0: int) -> int:  # 0-based rank via cumulative walk
            return int(vals[np.searchsorted(cum, rank0 + 1)])

        lo50, hi50 = at((n - 1) // 2), at(n // 2)
        pos95, r95 = divmod(19 * (n - 1), 20)
        lo95 = at(pos95)
        hi95 = at(min(pos95 + 1, n - 1)) if r95 else lo95
        rows.append((str(et), n, lo50 + hi50,
                     (20 - r95) * lo95 + r95 * hi95))
    return pd.DataFrame(rows, columns=["event_type", "n", "p50_x2",
                                       "p95_x20"]).astype(
        {"n": "int64", "p50_x2": "int64", "p95_x20": "int64"})


def daily_anomalies(sf_dir: str, k: int = 3):
    """(event_type, day, n_events, is_anomaly) — robust time-series
    anomaly flags over the DENSE daily count series: a day is
    anomalous when |count − median| > k·MAD (median absolute
    deviation), the classic robust detector that a single spike
    cannot poison the way mean/σ can. Median and MAD use the
    quantile_disc rule (lower median — value at 0-based rank
    (n−1)//2), so everything stays in exact integers.

    Scale shape: inherits dense_daily_counts' combiner (daily cells
    cross the exchange, never events); the per-type median/MAD walk
    runs on the output-sized dense frame driver-side and the flag is
    a vectorized compare.
    """
    dense = dense_daily_counts(sf_dir)
    out = []
    for et, g in dense.groupby("event_type", sort=True):
        g = g.sort_values("day").reset_index(drop=True)
        c = g["n_events"].to_numpy("int64")
        med = int(np.sort(c)[(len(c) - 1) // 2])
        dev = np.abs(c - med)
        mad = int(np.sort(dev)[(len(dev) - 1) // 2])
        out.append(pd.DataFrame({
            "event_type": str(et), "day": g["day"].astype("int64"),
            "n_events": c,
            "is_anomaly": (dev > k * mad).astype("int64")}))
    return pd.concat(out, ignore_index=True)


def rate_limit_replay(sf_dir: str):
    """(user_id, event_id, admitted, bucket_q) — token-bucket rate
    limiter REPLAY over the event log: capacity 5 tokens, refill 0.1
    token/s, cost 1 token per event — which requests WOULD have been
    throttled, the capacity-planning / abuse-forensics question. All
    state is integer (tokens ×10⁶; refill = gap_µs // 10 exactly), and
    the walk is genuinely sequential per user (each admit decision
    feeds the next balance — no prefix-sum shortcut exists because of
    the min-cap clamp), the ewma_user_value shape.

    Scale shape: one hash(user) exchange; inside a bucket the walk
    vectorizes ACROSS users by position-within-user (loop length =
    max events per user, each step a vectorized update).
    """
    CAP, COST = 5_000_000, 1_000_000
    nparts = _nparts()
    ds = _read_events(sf_dir, columns=["user_id", "event_id", "ts"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "event_id": df["event_id"].astype("int64"),
            "tus": ((df["ts"] - pd.Timestamp(0))
                    // pd.Timedelta(microseconds=1)).astype("int64"),
            "bucket": (pd.util.hash_pandas_object(
                df["user_id"], index=False) % nparts).astype("int32")})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "event_id": pd.Series([], dtype="int64"),
                "admitted": pd.Series([], dtype="int64"),
                "bucket_q": pd.Series([], dtype="int64")})
        df = df.sort_values(["user_id", "tus", "event_id"]) \
            .reset_index(drop=True)
        pos = df.groupby("user_id").cumcount().to_numpy()
        tus = df["tus"].to_numpy("int64")
        bpost = np.zeros(len(df), dtype="int64")
        admit = np.zeros(len(df), dtype="int64")
        first = pos == 0
        admit[first] = 1  # a full bucket always admits
        bpost[first] = CAP - COST
        for t in range(1, int(pos.max()) + 1 if len(pos) else 0):
            m = np.flatnonzero(pos == t)
            if len(m) == 0:
                break
            bpre = np.minimum(CAP, bpost[m - 1]
                              + (tus[m] - tus[m - 1]) // 10)
            ok = bpre >= COST
            admit[m] = ok.astype("int64")
            bpost[m] = bpre - COST * ok
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "event_id": df["event_id"].astype("int64"),
            "admitted": pd.Series(admit, dtype="int64"),
            "bucket_q": pd.Series(bpost, dtype="int64")})

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas"))


def session_overlap_pairs(sf_dir: str, gap_minutes: int = _GAP_MINUTES,
                          cell_hours: int = 1,
                          num_partitions: Optional[int] = None):
    """(user_a, session_a, user_b, session_b, ovl_us) — the cross-user
    INTERVAL OVERLAP JOIN: every pair of sessions from two different
    users whose [start, end] intervals intersect (closed; ovl_us =
    min(end)−max(start) ≥ 0), built on the independently-oracled
    ``session_table``. The 1-D analog of spatial_neighbor_pairs'
    grid bucketing, and the shape every temporal co-occurrence /
    concurrency-attribution join takes.

    Scale shape: each interval replicates to the time-grid cells it
    touches (cell width ``cell_hours``; sessions are gap-bounded so
    the span — and the fan-out — is small); one hash(cell) exchange;
    inside a cell the verify is one vectorized self-merge, and a pair
    is emitted at exactly ONE cell — the cell containing
    max(start_a, start_b), which both intervals provably touch. No
    dedup pass. Same-user pairs cannot overlap (session gaps are
    strict) and are excluded canonically (user_a < user_b).
    """
    import ray

    nparts = num_partitions or _nparts()
    W = int(cell_hours) * 3600 * 1_000_000
    sess = session_table(sf_dir, gap_minutes)

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        st = df["start_us"].to_numpy("int64")
        en = df["end_us"].to_numpy("int64")
        c0 = st // W
        cnt = (en // W - c0 + 1).astype("int64")
        idx = np.repeat(np.arange(len(df)), cnt)
        pos = np.arange(len(idx)) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        cell = c0[idx] + pos
        out = pd.DataFrame({
            "cell": cell.astype("int64"),
            "user_id": df["user_id"].to_numpy("int64")[idx],
            "session_idx": df["session_idx"].to_numpy("int64")[idx],
            "st": st[idx], "en": en[idx]})
        out["part"] = (out["cell"] % nparts).astype("int32")
        return out

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["cell", "user_id", "session_idx", "st", "en"]]
        m = d.merge(d, on="cell")
        m = m[m["user_id_x"] < m["user_id_y"]]
        if m.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ["user_a", "session_a",
                                           "user_b", "session_b",
                                           "ovl_us"]})
        mx = np.maximum(m["st_x"].to_numpy("int64"),
                        m["st_y"].to_numpy("int64"))
        mn = np.minimum(m["en_x"].to_numpy("int64"),
                        m["en_y"].to_numpy("int64"))
        keep = (mx <= mn) & (mx // W == m["cell"].to_numpy("int64"))
        m = m[pd.Series(keep, index=m.index, dtype=bool)]
        return pd.DataFrame({
            "user_a": m["user_id_x"].astype("int64"),
            "session_a": m["session_idx_x"].astype("int64"),
            "user_b": m["user_id_y"].astype("int64"),
            "session_b": m["session_idx_y"].astype("int64"),
            "ovl_us": pd.Series(mn[keep] - mx[keep], index=m.index,
                                dtype="int64")})

    return (sess.map_batches(replicate, batch_format="pandas")
            .groupby("part").map_groups(pairs, batch_format="pandas"))


def debounce_events(sf_dir: str, window_minutes: int = 1440):
    """(user_id, event_type, event_id, kept) — streaming DEBOUNCE /
    in-window suppression: an event is kept iff it is the first of its
    (user, type) key or ≥ ``window_minutes`` after the last KEPT event
    of that key. This is the stateful streaming dedup every
    ingestion pipeline runs (alert suppression, at-least-once source
    collapse) — and it is genuinely sequential per key: whether event
    i survives depends on which earlier events survived (a lag-based
    filter would over-keep inside bursts), so no prefix-sum shortcut
    exists.

    Scale shape: one hash(user) exchange; inside a bucket the kept
    chain vectorizes ACROSS keys by position-within-key (the
    rate_limit_replay walk — loop length = max events per key, each
    step one vectorized update).
    """
    W = window_minutes * 60_000_000
    nparts = _nparts()
    ds = _read_events(sf_dir, columns=["user_id", "event_type",
                                       "event_id", "ts"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "event_type": df["event_type"].astype(str),
            "event_id": df["event_id"].astype("int64"),
            "tus": ((df["ts"] - pd.Timestamp(0))
                    // pd.Timedelta(microseconds=1)).astype("int64"),
            "bucket": (pd.util.hash_pandas_object(
                df["user_id"], index=False) % nparts).astype("int32")})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype="object"),
            "event_id": pd.Series([], dtype="int64"),
            "kept": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        df = (df.sort_values(["user_id", "event_type", "tus", "event_id"])
              .reset_index(drop=True))
        pos = (df.groupby(["user_id", "event_type"]).cumcount()
               .to_numpy())
        tus = df["tus"].to_numpy("int64")
        kept = np.zeros(len(df), dtype="int64")
        last_kept = np.zeros(len(df), dtype="int64")
        first = pos == 0
        kept[first] = 1
        last_kept[first] = tus[first]
        for t in range(1, int(pos.max()) + 1 if len(pos) else 0):
            m = np.flatnonzero(pos == t)
            if len(m) == 0:
                break
            ok = tus[m] - last_kept[m - 1] >= W
            kept[m] = ok.astype("int64")
            last_kept[m] = np.where(ok, tus[m], last_kept[m - 1])
        return pd.DataFrame({
            "user_id": df["user_id"],
            "event_type": df["event_type"],
            "event_id": df["event_id"],
            "kept": pd.Series(kept, dtype="int64")})

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas"))


def xcorr_daily(sf_dir: str, type_x: str = "view",
                type_y: str = "purchase", max_lag: int = 7):
    """(lag, n_pairs, cov_num, var_x_num, var_y_num) — CROSS-
    correlation sufficient statistics between two event types' dense
    daily count series at lags 0..``max_lag`` (does `view` activity
    lead `purchase` activity, and by how many days — the
    marketing-attribution / leading-indicator diagnostic). Pairs are
    (x_t, y_{t+lag}) over the zero-filled shared grid; as in
    autocorr_daily the Pearson numerators are exact integers
    (cov_num = n·Σxy − Σx·Σy) and r divides out downstream.

    Scale shape: inherits dense_daily_counts' combiner (the exchange
    carries daily cells, never events); the per-lag fold runs on the
    output-sized dense frame driver-side in Python bigints.
    """
    dense = dense_daily_counts(sf_dir)
    g = dense[dense["event_type"].isin([type_x, type_y])]
    piv = (g.pivot_table(index="day", columns="event_type",
                         values="n_events", fill_value=0)
           .sort_index())
    x = [int(v) for v in piv[type_x]]
    y = [int(v) for v in piv[type_y]]
    rows = []
    for lag in range(max_lag + 1):
        xs = x[:len(x) - lag] if lag else x
        ys = y[lag:]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        rows.append((lag, n, n * sxy - sx * sy,
                     n * sxx - sx * sx, n * syy - sy * sy))
    return pd.DataFrame(
        rows, columns=["lag", "n_pairs", "cov_num",
                       "var_x_num", "var_y_num"]).astype("int64")


def cusum_changepoint(sf_dir: str):
    """(event_type, day, cusum, alarm) — one-sided CUSUM drift
    detection (Page 1954) over each type's dense daily count series:
    S_d = max(0, S_{d-1} + (n_d − ref)) with ref = the type's exact
    integer mean (floor), alarm when S_d exceeds ref // 2. Where
    median/MAD (daily_anomalies) flags single-day spikes, CUSUM
    accumulates small persistent shifts — the drift-vs-spike pair
    every ops/DQ monitor runs together. The max-clamp makes the walk
    genuinely sequential (no prefix-sum shortcut), all state integer.

    Scale shape: inherits dense_daily_counts' combiner (the exchange
    carries daily cells, never events); the clamped walk runs on the
    output-sized dense frame driver-side.
    """
    dense = dense_daily_counts(sf_dir)
    rows = []
    for et, g in dense.groupby("event_type", sort=True):
        g = g.sort_values("day")
        v = [int(x) for x in g["n_events"]]
        ref = sum(v) // len(v)
        thr = ref // 2
        s = 0
        for day, x in zip(g["day"], v):
            s = max(0, s + x - ref)
            rows.append((str(et), int(day), s, 1 if s > thr else 0))
    return pd.DataFrame(
        rows, columns=["event_type", "day", "cusum", "alarm"]).astype(
        {"day": "int64", "cusum": "int64", "alarm": "int64"})


def theil_sen_daily(sf_dir: str):
    """(event_type, n_pairs, slope_q6_med, intercept_q6) — Theil–Sen
    ROBUST trend estimation per event type over the dense daily count
    series: the median of all C(D,2) pairwise slopes (a single
    outlier day cannot tip the estimate the way OLS's squared loss
    can — the robust counterpart of linreg_tokens). Slopes quantize
    as trunc(10⁶·Δn / Δday) (DuckDB ``//`` truncates toward zero, so
    the engine mirrors trunc-division on negatives, the benford
    contract); the median is the lower median, matching
    quantile_disc(0.5); intercept_q6 = lower median of
    10⁶·n_d − slope_q6_med·d over the days.

    Scale shape: inherits dense_daily_counts' combiner; the D²-pair
    sweep runs on the output-sized dense frame driver-side in exact
    integers (D = corpus day span, independent of corpus row count).
    """
    def trunc_div(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    dense = dense_daily_counts(sf_dir)
    rows = []
    for et, g in dense.groupby("event_type", sort=True):
        g = g.sort_values("day")
        days = [int(d) for d in g["day"]]
        v = [int(x) for x in g["n_events"]]
        slopes = []
        for i in range(len(v)):
            for j in range(i + 1, len(v)):
                slopes.append(trunc_div(1000000 * (v[j] - v[i]),
                                        days[j] - days[i]))
        slopes.sort()
        med = slopes[(len(slopes) - 1) // 2]
        inter = sorted(1000000 * x - med * d for d, x in zip(days, v))
        imed = inter[(len(inter) - 1) // 2]
        rows.append((str(et), len(slopes), med, imed))
    return pd.DataFrame(
        rows, columns=["event_type", "n_pairs", "slope_q6_med",
                       "intercept_q6"]).astype(
        {"n_pairs": "int64", "slope_q6_med": "int64",
         "intercept_q6": "int64"})


def pit_join(sf_dir: str):
    """(event_id, user_id, version_event_id, age_us) — the POINT-IN-
    TIME (temporal validity) join: each *purchase* event matched to
    the SCD2 dimension version (``scd2_intervals`` row of the same
    user) whose [valid_from, valid_to) interval CONTAINS its
    timestamp — the "which version of the record was true when this
    fact happened" join behind every feature-store / ML-leakage-safe
    training join. Differs from ``events_asof`` (nearest earlier
    EVENT) in semantics: PIT matches an interval, and a fact at
    exactly valid_from matches its own opening version (age_us = 0).

    Scale shape: ONE hash(user) co-group of facts with the user's
    version intervals; inside the bucket one sort + searchsorted
    probe per fact (O((F+V)·log V) per partition, no interval
    expansion). The version side here derives from the same event
    log, so the op is self-contained and the oracle composes the
    independently-oracled scd2 CTE.
    """
    nparts = _nparts()
    ds = _read_events(sf_dir, columns=["user_id", "event_id", "ts",
                                       "event_type"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        tus = ((df["ts"] - pd.Timestamp(0))
               // pd.Timedelta(microseconds=1)).astype("int64")
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "event_id": df["event_id"].astype("int64"),
            "tus": tus,
            "is_fact": (df["event_type"] == "purchase").astype("int8"),
            "bucket": (pd.util.hash_pandas_object(
                df["user_id"], index=False) % nparts).astype("int32")})

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        df = df.sort_values(["user_id", "tus", "event_id"]) \
            .reset_index(drop=True)
        for _, g in df.groupby("user_id", sort=False):
            starts = g["tus"].to_numpy("int64")
            vids = g["event_id"].to_numpy("int64")
            facts = g[g["is_fact"] == 1]
            if facts.empty:
                continue
            ft = facts["tus"].to_numpy("int64")
            # version = last interval with valid_from <= ts (ties on
            # equal ts resolve to the LAST of the equal-ts versions,
            # matching scd2's (ts, event_id) order where earlier
            # same-ts versions close instantly)
            idx = np.searchsorted(starts, ft, side="right") - 1
            out.append(pd.DataFrame({
                "event_id": facts["event_id"].to_numpy("int64"),
                "user_id": facts["user_id"].to_numpy("int64"),
                "version_event_id": vids[idx],
                "age_us": ft - starts[idx]}))
        if not out:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "version_event_id": pd.Series([], dtype="int64"),
                "age_us": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    return (ds.map_batches(tag, batch_format="pandas")
            .groupby("bucket").map_groups(probe, batch_format="pandas"))


def mann_kendall(sf_dir: str):
    """(event_type, n_days, s_stat, var18) — the MANN–KENDALL trend
    TEST over each type's dense daily series: S = Σ_{i<j}
    sign(n_j − n_i) (positive ⇒ rising trend), with the tie-corrected
    variance kept exact as var18 = 18·Var(S) = n(n−1)(2n+5) −
    Σ_ties t(t−1)(2t+5). The significance companion of
    ``theil_sen_daily``'s slope estimate — z = S/√(Var) divides out
    downstream; everything emitted is an exact integer.

    Scale shape: inherits dense_daily_counts' combiner; the pair
    sweep and tie histogram fold on the output-sized dense frame
    driver-side.
    """
    dense = dense_daily_counts(sf_dir)
    rows = []
    for et, g in dense.groupby("event_type", sort=True):
        g = g.sort_values("day")
        v = [int(x) for x in g["n_events"]]
        n = len(v)
        s = 0
        for i in range(n):
            for j in range(i + 1, n):
                d = v[j] - v[i]
                s += (d > 0) - (d < 0)
        ties = pd.Series(v).value_counts()
        var18 = n * (n - 1) * (2 * n + 5) - sum(
            int(t) * (int(t) - 1) * (2 * int(t) + 5)
            for t in ties if int(t) > 1)
        rows.append((str(et), n, s, var18))
    return pd.DataFrame(
        rows, columns=["event_type", "n_days", "s_stat",
                       "var18"]).astype(
        {"n_days": "int64", "s_stat": "int64", "var18": "int64"})


def max_streak(sf_dir: str):
    """(user_id, n_active_days, max_streak) — longest run of
    CONSECUTIVE active days per user: the canonical gaps-and-islands
    identity (day − dense_rank(day) is constant within an island), the
    engagement-streak metric every retention dashboard carries next
    to cohort curves. Exact integers; days are epoch days.

    Scale shape: a per-batch distinct (user, day) combiner collapses
    events BEFORE the shuffle (the cohort_retention discipline), one
    hash(user) exchange, and the island sweep is vectorized across
    ALL users of a bucket (sort + rank-difference grouping).
    """
    nparts = _nparts()
    ds = _read_events(sf_dir, columns=["user_id", "ts"])

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        day = ((df["ts"] - pd.Timestamp(0))
               // pd.Timedelta(microseconds=1)) // 86400000000
        out = (pd.DataFrame({"user_id": df["user_id"].astype("int64"),
                             "day": day.astype("int64")})
               .drop_duplicates())
        out["bucket"] = (pd.util.hash_pandas_object(
            out["user_id"], index=False) % nparts).astype("int32")
        return out

    def streaks(df: pd.DataFrame) -> pd.DataFrame:
        d = (df[["user_id", "day"]].drop_duplicates()
             .sort_values(["user_id", "day"]).reset_index(drop=True))
        rnk = d.groupby("user_id").cumcount()
        island = d["day"] - rnk  # constant within a consecutive run
        g = (d.assign(island=island)
             .groupby(["user_id", "island"]).size()
             .groupby("user_id").agg(["sum", "max"]))
        return pd.DataFrame({
            "user_id": g.index.astype("int64"),
            "n_active_days": g["sum"].astype("int64").to_numpy(),
            "max_streak": g["max"].astype("int64").to_numpy()})

    return (ds.map_batches(combiner, batch_format="pandas")
            .groupby("bucket").map_groups(streaks,
                                          batch_format="pandas"))


def burst_intervals(sf_dir: str, g_cost: int = 2_000_000):
    """(event_type, day, state, c0, c1) — KLEINBERG BURST DETECTION
    (Kleinberg, KDD 2002; the trending-topic primitive): a 2-state
    automaton over each type's dense daily counts — base state emits
    at the series mean rate λ₀ = S/D, burst state at λ₁ = (6/5)λ₀
    (this corpus's daily fluctuations are ±20%, so a 1.2× burst rate
    flags sustained high-count runs — ~3% of days — where 2× would
    never fire); entering the burst state costs ``g_cost``. ``state`` is the
    exact VITERBI minimum-cost labeling (ties prefer base), and
    c0/c1 are the forward costs so the whole DP — not just its
    answer — is oracle-checked. Day costs are the float-portability
    contract: cost_j = (10⁶·S_j)//D − floor(10⁶·(c·(ln S_j − ln D)))
    — one fixed-order IEEE tree into the shared libm ln on
    integer-valued doubles (constant-per-day terms cancel across
    states, so dropping ln c! is exact for the argmin).

    Scale shape: inherits dense_daily_counts' combiner; the DP and
    backtrack run on the output-sized dense frame driver-side.
    """
    import math

    dense = dense_daily_counts(sf_dir)
    rows = []
    for et, g in dense.groupby("event_type", sort=True):
        g = g.sort_values("day")
        days = [int(d) for d in g["day"]]
        v = [int(x) for x in g["n_events"]]
        D = len(v)
        S = sum(v)
        lam_q = [(1000000 * S) // D, (1000000 * 6 * S) // (5 * D)]
        lnS = [math.log(S), math.log(6 * S)]
        lnDj = [math.log(D), math.log(5 * D)]

        def day_cost(c: int, j: int) -> int:
            return lam_q[j] - math.floor(
                1000000.0 * (c * (lnS[j] - lnDj[j])))

        c0 = day_cost(v[0], 0)
        c1 = g_cost + day_cost(v[0], 1)  # burst entry from base start
        hist = [(c0, c1, -1, -1)]
        for t in range(1, D):
            p0 = 0 if c0 <= c1 else 1
            p1 = 0 if c0 + g_cost <= c1 else 1
            n0 = min(c0, c1) + day_cost(v[t], 0)
            n1 = min(c0 + g_cost, c1) + day_cost(v[t], 1)
            hist.append((n0, n1, p0, p1))
            c0, c1 = n0, n1
        # backtrack
        state = 0 if c0 <= c1 else 1
        states = [0] * D
        for t in range(D - 1, -1, -1):
            states[t] = state
            if t > 0:
                state = hist[t][2] if state == 0 else hist[t][3]
        for t in range(D):
            rows.append((str(et), days[t], states[t],
                         hist[t][0], hist[t][1]))
    return pd.DataFrame(
        rows, columns=["event_type", "day", "state", "c0",
                       "c1"]).astype(
        {"day": "int64", "state": "int64", "c0": "int64",
         "c1": "int64"})


def wilson_bounds(sf_dir: str):
    """(day, n_trials, n_success, lo_q6, hi_q6) — WILSON SCORE 95%
    interval for each day's purchase share among view+purchase events
    (z = 2 exactly, so the classic formula clears to
    (s + 2 ∓ 2·√(s·(n−s)/n + 1)) / (n + 4)): the
    proportion-uncertainty primitive dashboards should use where the
    naive ±√(p(1−p)/n) collapses at the boundaries. Float-portability
    contract: one fixed-order IEEE tree of exactly-representable
    integers into the correctly-rounded sqrt (the negative_samples
    precedent — sqrt IS bit-portable, exp is not), floor-quantized
    at 10⁶.

    Scale shape: the daily (type, day) count combiner; the interval
    algebra folds on the output-sized frame driver-side.
    """
    import math

    nparts = _nparts()
    ds = _read_events(sf_dir, columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = ((df["ts"] - pd.Timestamp(0))
               // pd.Timedelta(microseconds=1)) // 86400000000
        d = pd.DataFrame({"day": day.astype("int64"),
                          "event_type": df["event_type"].astype(str)})
        d = d[d["event_type"].isin(["view", "purchase"])]
        g = (d.groupby(["day", "event_type"], as_index=False).size()
             .rename(columns={"size": "n"}))
        return g.astype({"day": "int64", "n": "int64"})

    h = (ds.map_batches(partial, batch_format="pandas").to_pandas()
         .groupby(["day", "event_type"], as_index=False)["n"].sum())
    piv = (h.pivot_table(index="day", columns="event_type",
                         values="n", fill_value=0).sort_index())
    rows = []
    for day in piv.index:
        s = int(piv.loc[day].get("purchase", 0))
        n = s + int(piv.loc[day].get("view", 0))
        if n == 0:
            continue
        root = math.sqrt(s * (n - s) / n + 1.0)
        lo = math.floor(1000000.0 * ((s + 2 - 2 * root) / (n + 4)))
        hi = math.floor(1000000.0 * ((s + 2 + 2 * root) / (n + 4)))
        rows.append((int(day), n, s, lo, hi))
    return pd.DataFrame(
        rows, columns=["day", "n_trials", "n_success", "lo_q6",
                       "hi_q6"]).astype("int64")
