"""Relational aggregates over the TPC-H-ish tables — evidence that the
engine's groupby/aggregate machinery handles ordinary warehouse shapes,
with partial aggregation (combiner) before the shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


from .readers import bounded_read_parquet as _bread


def lineitem_summary(sf_dir: str):
    """Pricing-summary-style aggregate (counts + date bounds + integral
    quantity sum) grouped by returnflag/linestatus."""
    import ray.data

    ds = _bread(
        "%s/lineitem.parquet" % sf_dir,
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_shipdate"],
    )

    keys = ["l_returnflag", "l_linestatus"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False).agg(
            n_rows=("l_quantity", "size"),
            sum_qty=("l_quantity", "sum"),
            min_ship=("l_shipdate", "min"),
            max_ship=("l_shipdate", "max"),
        )
        g["sum_qty"] = g["sum_qty"].astype("int64")
        g["n_rows"] = g["n_rows"].astype("int64")
        return g

    # hash AGGREGATE over the partials (no per-distinct-key UDF dispatch)
    from ray.data.aggregate import Max, Min, Sum

    partials = ds.map_batches(partial, batch_format="pandas")
    out = partials.groupby(keys).aggregate(
        Sum("n_rows"), Sum("sum_qty"), Min("min_ship"), Max("max_ship"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"sum(n_rows)": "n_rows",
                                "sum(sum_qty)": "sum_qty",
                                "min(min_ship)": "min_ship",
                                "max(max_ship)": "max_ship"})
        df["n_rows"] = df["n_rows"].astype("int64")
        df["sum_qty"] = df["sum_qty"].astype("int64")
        df["min_ship"] = df["min_ship"].dt.strftime("%Y-%m-%d")
        df["max_ship"] = df["max_ship"].dt.strftime("%Y-%m-%d")
        return df[keys + ["n_rows", "sum_qty", "min_ship", "max_ship"]]

    return out.map_batches(finish, batch_format="pandas")


def orders_by_customer_nation(sf_dir: str, num_partitions=None):
    """orders ⋈ customer ⋈ nation → orders per nation.

    Scale shape (no ``Dataset.join`` — see CLAUDE.md on its fragility):
    orders are pre-aggregated to per-custkey counts inside ``map_batches``
    (combiner — shuffle volume is distinct customers, not order rows);
    the customer side ships (custkey, nationkey) rows; both sides
    co-group through ONE hash-bucket shuffle (reduce-side join, the same
    robust pattern as components._join_kv). nation (25 rows, config-sized)
    is broadcast via closure capture and mapped inside the reduce task.
    """
    import ray
    import ray.data
    import pyarrow.parquet as pq

    if num_partitions is None:
        num_partitions = max(4, int(ray.cluster_resources().get("CPU", 8)))
    nparts = num_partitions

    nt = pq.read_table("%s/nation.parquet" % sf_dir,
                       columns=["n_nationkey", "n_name"])
    nation_map = dict(zip(nt.column("n_nationkey").to_pylist(),
                          nt.column("n_name").to_pylist()))

    orders = _bread("%s/orders.parquet" % sf_dir,
                                   columns=["o_custkey"])
    customer = _bread("%s/customer.parquet" % sf_dir,
                                     columns=["c_custkey", "c_nationkey"])

    def order_partials(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).size()
        return pd.DataFrame({
            "k": g["o_custkey"].astype("int64"),
            "n": g["size"].astype("int64"),
            "nk": pd.Series(-1, index=g.index, dtype="int64"),
            "part": (g["o_custkey"] % nparts).astype("int32"),
        })

    def customer_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": df["c_custkey"].astype("int64"),
            "n": pd.Series(0, index=df.index, dtype="int64"),
            "nk": df["c_nationkey"].astype("int64"),
            "part": (df["c_custkey"] % nparts).astype("int32"),
        })

    def join_count(df: pd.DataFrame) -> pd.DataFrame:
        cust = df[df["nk"] >= 0]
        ords = df[df["nk"] < 0]
        merged = ords.merge(cust[["k", "nk"]], on="k", how="inner")
        g = merged.groupby("nk_y", as_index=False)["n"].sum()
        return pd.DataFrame({
            "n_name": g["nk_y"].map(nation_map),
            "n": g["n"].astype("int64"),
        })

    both = (orders.map_batches(order_partials, batch_format="pandas")
            .union(customer.map_batches(customer_rows, batch_format="pandas")))
    partials = both.groupby("part").map_groups(join_count, batch_format="pandas")
    out = partials.groupby("n_name").sum("n")
    return out.map_batches(
        lambda df: df.rename(columns={"sum(n)": "n_orders"}).astype(
            {"n_orders": "int64"}),
        batch_format="pandas")


def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = "1998-01-01", k: int = 10,
                      num_partitions=None, plan: str = "broadcast"):
    """TPC-H Q3 shape: top-``k`` unshipped orders of one market segment
    by revenue — the canonical 3-way join + aggregate + top-k. Revenue
    is integer-quantized PER LINE ITEM (floor(100·price·(1−disc)) —
    both factors are exactly-rounded float64 ops of bit-matched
    operands) so the per-order sum is order-independent and the SQL
    oracle hash-matches bit-for-bit. Returns
    (l_orderkey, revenue_q2, o_orderdate, o_orderpriority).

    Scale shape: both date predicates push into the parquet read
    (row-group pruning); lineitem — the big side — pre-aggregates
    revenue per orderkey inside each batch (combiner), so the orderkey
    exchange carries distinct orders, not line items; the top-k runs as
    a per-partition combiner into a single bounded reduce (≤ k·nparts
    rows), the same shape as weighted_sample. Two PLANS, pinned
    result-identical (tests/test_ops.py):

    - ``plan="broadcast"`` (default): the segment-filtered customer
      KEYS (≈1/5 of custkeys — int64s, ~1.6 GB per 10⁹ customers) ship
      once via ``ray.put`` into a per-worker cache; orders are
      semi-join-filtered MAP-SIDE before the orderkey exchange, which
      both removes the second all-to-all entirely and shrinks the
      orders side of the remaining one ~5×. ONE data-sized exchange.
    - ``plan="exchange"``: the huge-customer fallback — a second
      hash(custkey) co-group semi-join instead of the broadcast, for
      the regime where the filtered key set no longer fits a worker.
    """
    import datetime

    import numpy as np
    import pyarrow.dataset as pds
    import ray
    import ray.data

    if num_partitions is None:
        num_partitions = max(4, int(ray.cluster_resources().get("CPU", 8)))
    nparts = num_partitions
    cut = datetime.datetime.fromisoformat(cutoff)

    lineitem = _bread(
        "%s/lineitem.parquet" % sf_dir,
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pds.field("l_shipdate") > cut))
    orders = _bread(
        "%s/orders.parquet" % sf_dir,
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"],
        filter=(pds.field("o_orderdate") < cut))
    customer = _bread(
        "%s/customer.parquet" % sf_dir, columns=["c_custkey"],
        filter=(pds.field("c_mktsegment") == segment))

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(100.0 * (df["l_extendedprice"].to_numpy(dtype="float64")
                              * (1.0 - df["l_discount"]
                                 .to_numpy(dtype="float64"))))
        t = pd.DataFrame({"k": df["l_orderkey"].astype("int64"),
                          "rev": q.astype("int64")})
        g = t.groupby("k", as_index=False)["rev"].sum()
        return pd.DataFrame({
            "k": g["k"], "rev": g["rev"].astype("int64"),
            "ck": np.int64(-1), "od": np.int64(0), "prio": "",
            "part": (g["k"] % nparts).astype("int32"),
            "side": np.int8(0)})

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        od = df["o_orderdate"].to_numpy().astype("datetime64[D]") \
            .astype("int64")
        return pd.DataFrame({
            "k": df["o_orderkey"].astype("int64"),
            "rev": np.int64(0), "ck": df["o_custkey"].astype("int64"),
            "od": od, "prio": df["o_orderpriority"].astype(str),
            "part": (df["o_orderkey"] % nparts).astype("int32"),
            "side": np.int8(1)})

    def join_orders(df: pd.DataFrame) -> pd.DataFrame:
        li = df[df["side"] == 0]
        rev = li.groupby("k", as_index=False)["rev"].sum()
        o = df[df["side"] == 1][["k", "ck", "od", "prio"]]
        m = o.merge(rev, on="k", how="inner")
        return pd.DataFrame({
            "k": m["k"].astype("int64"),
            "rev": m["rev"].astype("int64"),
            "ck": m["ck"].astype("int64"),
            "od": m["od"].astype("int64"),
            "prio": m["prio"],
            "part": (m["ck"] % nparts).astype("int32"),
            "side": np.int8(0)})

    def c_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": np.int64(0), "rev": np.int64(0),
            "ck": df["c_custkey"].astype("int64"),
            "od": np.int64(0), "prio": "",
            "part": (df["c_custkey"] % nparts).astype("int32"),
            "side": np.int8(1)})

    def topk_local(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["side"] == 0]
        keep = set(df.loc[df["side"] == 1, "ck"])
        o = o[o["ck"].isin(keep)]
        o = o.sort_values(["rev", "od", "k"],
                          ascending=[False, True, True]).head(k)
        return pd.DataFrame({"k": o["k"].astype("int64"),
                             "rev": o["rev"].astype("int64"),
                             "od": o["od"].astype("int64"),
                             "prio": o["prio"], "g": np.int8(0)})

    def topk_final(df: pd.DataFrame) -> pd.DataFrame:
        o = df.sort_values(["rev", "od", "k"],
                           ascending=[False, True, True]).head(k)
        return pd.DataFrame({
            "l_orderkey": o["k"].astype("int64"),
            "revenue_q2": o["rev"].astype("int64"),
            "o_orderdate": pd.to_datetime(o["od"], unit="D")
            .dt.strftime("%Y-%m-%d"),
            "o_orderpriority": o["prio"]})

    if plan == "broadcast":
        from .traindata import _bcast_get

        keys = np.sort(customer.to_pandas()["c_custkey"]
                       .to_numpy(dtype="int64"))
        keys_ref = ray.put(keys)

        def li_slim(df: pd.DataFrame) -> pd.DataFrame:
            out = li_partial(df)
            return out[["k", "rev", "od", "prio", "part", "side"]]

        def o_rows_b(df: pd.DataFrame) -> pd.DataFrame:
            ks = _bcast_get(keys_ref)
            df = df[np.isin(df["o_custkey"].to_numpy(dtype="int64"), ks)]
            out = o_rows(df)
            return out[["k", "rev", "od", "prio", "part", "side"]]

        def join_topk(df: pd.DataFrame) -> pd.DataFrame:
            li = df[df["side"] == 0]
            rev = li.groupby("k", as_index=False)["rev"].sum()
            o = df[df["side"] == 1][["k", "od", "prio"]]
            m = o.merge(rev, on="k", how="inner")
            m = m.sort_values(["rev", "od", "k"],
                              ascending=[False, True, True]).head(k)
            return pd.DataFrame({"k": m["k"].astype("int64"),
                                 "rev": m["rev"].astype("int64"),
                                 "od": m["od"].astype("int64"),
                                 "prio": m["prio"], "g": np.int8(0)})

        return (lineitem.map_batches(li_slim, batch_format="pandas")
                .union(orders.map_batches(o_rows_b,
                                          batch_format="pandas"))
                .groupby("part")
                .map_groups(join_topk, batch_format="pandas")
                .groupby("g").map_groups(topk_final,
                                         batch_format="pandas"))

    joined = (lineitem.map_batches(li_partial, batch_format="pandas")
              .union(orders.map_batches(o_rows, batch_format="pandas"))
              .groupby("part")
              .map_groups(join_orders, batch_format="pandas"))
    filtered = (joined.union(
                    customer.map_batches(c_rows, batch_format="pandas"))
                .groupby("part")
                .map_groups(topk_local, batch_format="pandas"))
    return filtered.groupby("g").map_groups(topk_final,
                                            batch_format="pandas")


def local_supplier_volume(sf_dir: str, region: str = "ASIA",
                          date_from: str = "1995-01-01",
                          date_to: str = "1996-01-01",
                          num_partitions=None):
    """TPC-H Q5 shape: revenue per nation from orders where the customer
    and the line item's supplier sit in the SAME nation of one region —
    the canonical six-table join (region ⋈ nation ⋈ customer ⋈ orders ⋈
    lineitem ⋈ supplier). Revenue is integer-quantized per line item
    (floor(100·price·(1−disc)), the shipping_priority rule) so sums are
    order-independent and the SQL oracle hash-matches bit-for-bit.
    Returns (n_name, revenue_q2).

    Scale shape — TWO data-sized exchanges total, each carrying
    combiner-shrunk rows:

    - region (5 rows) and nation (25 rows) are config-sized: read
      driver-side, captured in closures.
    - supplier is ~1/10,000th of lineitem (TPC-H ratios): the
      region-filtered (suppkey → nationkey) pair ships ONCE via
      ``ray.put`` into the per-worker broadcast cache and is probed
      map-side with a sorted-array searchsorted — lineitem rows outside
      the region die before any shuffle.
    - exchange 1, hash(custkey): date-pruned orders (predicate pushed
      into the parquet read) co-group with region-filtered customers —
      a reduce-side join emitting (orderkey → customer nation).
    - exchange 2, hash(orderkey): lineitem pre-aggregates
      (orderkey, supplier_nation) → Σrev inside each batch (combiner),
      then co-groups with exchange 1's output; the same-nation predicate
      (c_nationkey = s_nationkey) applies in the reduce, leaving ≤25
      partial rows per partition for the final tiny hash aggregate.
    """
    import datetime

    import numpy as np
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from .traindata import _bcast_get

    if num_partitions is None:
        num_partitions = max(4, int(ray.cluster_resources().get("CPU", 8)))
    nparts = num_partitions
    d0 = datetime.datetime.fromisoformat(date_from)
    d1 = datetime.datetime.fromisoformat(date_to)

    # config-sized dims, driver-side
    rt = pq.read_table("%s/region.parquet" % sf_dir)
    rkeys = {r for r, n in zip(rt.column("r_regionkey").to_pylist(),
                               rt.column("r_name").to_pylist())
             if n == region}
    nt = pq.read_table("%s/nation.parquet" % sf_dir)
    nation_name = {}
    region_nations = set()
    for nk, nm, rk in zip(nt.column("n_nationkey").to_pylist(),
                          nt.column("n_name").to_pylist(),
                          nt.column("n_regionkey").to_pylist()):
        nation_name[nk] = nm
        if rk in rkeys:
            region_nations.add(nk)
    rn_arr = np.array(sorted(region_nations), dtype="int64")

    # supplier broadcast: sorted (suppkey, nationkey), region-only
    st = pq.read_table("%s/supplier.parquet" % sf_dir,
                       columns=["s_suppkey", "s_nationkey"])
    sk = st.column("s_suppkey").to_numpy().astype("int64")
    sn = st.column("s_nationkey").to_numpy().astype("int64")
    keep = np.isin(sn, rn_arr)
    order = np.argsort(sk[keep], kind="stable")
    supp_ref = ray.put((sk[keep][order], sn[keep][order]))

    orders = _bread(
        "%s/orders.parquet" % sf_dir,
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=((pds.field("o_orderdate") >= d0)
                & (pds.field("o_orderdate") < d1)))
    customer = _bread(
        "%s/customer.parquet" % sf_dir,
        columns=["c_custkey", "c_nationkey"])
    lineitem = _bread(
        "%s/lineitem.parquet" % sf_dir,
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_custkey"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "k": k, "v": df["o_orderkey"].astype("int64"),
            "part": (k % nparts).astype("int32"),
            "side": np.int8(0)})

    def c_rows(df: pd.DataFrame) -> pd.DataFrame:
        nk = df["c_nationkey"].to_numpy(dtype="int64")
        m = np.isin(nk, rn_arr)
        k = df["c_custkey"].to_numpy(dtype="int64")[m]
        return pd.DataFrame({
            "k": k, "v": nk[m],
            "part": (k % nparts).astype("int32"),
            "side": np.int8(1)})

    def join_cust(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["side"] == 0]
        c = df[df["side"] == 1][["k", "v"]]
        m = o.merge(c, on="k", how="inner")  # v_x=orderkey, v_y=cnation
        ok = m["v_x"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "k": ok, "nk": m["v_y"].astype("int64"),
            "rev": np.int64(0),
            "part": (ok % nparts).astype("int32"),
            "side": np.int8(1)})

    def li_partials(df: pd.DataFrame) -> pd.DataFrame:
        skeys, snats = _bcast_get(supp_ref)
        empty = pd.DataFrame({"k": pd.Series(dtype="int64"),
                              "nk": pd.Series(dtype="int64"),
                              "rev": pd.Series(dtype="int64"),
                              "part": pd.Series(dtype="int32"),
                              "side": pd.Series(dtype="int8")})
        if len(skeys) == 0:
            return empty
        s = df["l_suppkey"].to_numpy(dtype="int64")
        pos = np.searchsorted(skeys, s)
        pos[pos >= len(skeys)] = 0
        hit = skeys[pos] == s
        df = df[hit]
        if not len(df):
            return empty
        q = np.floor(100.0 * (df["l_extendedprice"].to_numpy(dtype="float64")
                              * (1.0 - df["l_discount"]
                                 .to_numpy(dtype="float64"))))
        t = pd.DataFrame({"k": df["l_orderkey"].astype("int64"),
                          "nk": snats[pos[hit]],
                          "rev": q.astype("int64")})
        g = t.groupby(["k", "nk"], as_index=False)["rev"].sum()
        k = g["k"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "k": k, "nk": g["nk"].astype("int64"),
            "rev": g["rev"].astype("int64"),
            "part": (k % nparts).astype("int32"),
            "side": np.int8(0)})

    def join_orders(df: pd.DataFrame) -> pd.DataFrame:
        li = df[df["side"] == 0]
        o = df[df["side"] == 1][["k", "nk"]]
        m = li.merge(o, on="k", how="inner")  # nk_x=snation, nk_y=cnation
        m = m[m["nk_x"] == m["nk_y"]]
        g = m.groupby("nk_x", as_index=False)["rev"].sum()
        return pd.DataFrame({"nk": g["nk_x"].astype("int64"),
                             "rev": g["rev"].astype("int64")})

    joined = (orders.map_batches(o_rows, batch_format="pandas")
              .union(customer.map_batches(c_rows, batch_format="pandas"))
              .groupby("part").map_groups(join_cust,
                                          batch_format="pandas"))
    partials = (lineitem.map_batches(li_partials, batch_format="pandas")
                .union(joined)
                .groupby("part").map_groups(join_orders,
                                            batch_format="pandas"))

    # the per-bucket output is ≤ |nations| rows: fold driver-side
    # instead of paying a third all-to-all for a 25-key aggregate
    # (measured 8.2 s → 5.8 s warm at sf0.001/32)
    t = partials.to_pandas()
    g = t.groupby("nk", as_index=False)["rev"].sum()
    return pd.DataFrame({
        "n_name": g["nk"].map(nation_name),
        "revenue_q2": g["rev"].astype("int64")})


def big_orders(sf_dir: str, min_qty: int = 250):
    """TPC-H Q18 shape: orders whose TOTAL line-item quantity exceeds
    ``min_qty``, with their customer — the aggregate-filtered semi-join
    (a HAVING on a child aggregate gates the parent join). Returns
    (o_custkey, o_orderkey, o_orderdate, total_qty); quantities are
    integral in TPC-H so total_qty is an exact int64.

    Scale shape: the only all-to-all is the per-order quantity
    aggregate, and it is combiner-fed (per-batch groupby-sum, so the
    exchange carries distinct orderkeys, never line items). The HAVING
    filter makes the surviving table OUTPUT-sized by construction
    (~1% of orders at the default threshold), so it ships once via
    ``ray.put`` into the per-worker broadcast cache and the
    orders-side join is a MAP-side sorted probe — zero further
    exchanges, the same plan shape as shipping_priority's broadcast
    semi-join. For a threshold chosen so low the survivor table no
    longer fits a worker, fall back to a hash(orderkey) co-group like
    shipping_priority's ``plan="exchange"``.
    """
    import numpy as np
    import ray
    import ray.data

    from .traindata import _bcast_get

    lineitem = _bread(
        "%s/lineitem.parquet" % sf_dir,
        columns=["l_orderkey", "l_quantity"])

    nparts = max(4, int(ray.cluster_resources().get("CPU", 8)))

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"k": df["l_orderkey"].astype("int64"),
                          "qty": df["l_quantity"].astype("int64")})
        g = t.groupby("k", as_index=False)["qty"].sum()
        g["qty"] = g["qty"].astype("int64")
        # bucketed co-group reduce, NOT Dataset.groupby(k).sum: Ray's
        # native aggregate over 10^5+ distinct keys measured 83 s where
        # this exchange takes ~3 s at sf0.1/32 (same gotcha class as
        # high-cardinality map_groups)
        g["bucket"] = (pd.util.hash_pandas_object(g["k"], index=False)
                       % nparts).astype("int32")
        return g

    def li_reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k", as_index=False)["qty"].sum()
        g = g[g["qty"] > min_qty]
        return pd.DataFrame({"k": g["k"].astype("int64"),
                             "qty": g["qty"].astype("int64")})

    totals = (lineitem.map_batches(li_partial, batch_format="pandas")
              .groupby("bucket").map_groups(li_reduce,
                                            batch_format="pandas")
              .to_pandas())
    keys = totals["k"].to_numpy(dtype="int64")
    order = np.argsort(keys)
    big_ref = ray.put((keys[order],
                       totals["qty"].to_numpy(dtype="int64")[order]))

    orders = _bread(
        "%s/orders.parquet" % sf_dir,
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        ks, qs = _bcast_get(big_ref)
        ok = df["o_orderkey"].to_numpy(dtype="int64")
        pos = np.searchsorted(ks, ok)
        pos = np.clip(pos, 0, len(ks) - 1) if len(ks) else pos
        hit = (len(ks) > 0) & (ks[pos] == ok) if len(ks) else \
            np.zeros(len(ok), dtype=bool)
        d = df[hit]
        return pd.DataFrame({
            "o_custkey": d["o_custkey"].astype("int64"),
            "o_orderkey": d["o_orderkey"].astype("int64"),
            "o_orderdate": d["o_orderdate"].dt.strftime("%Y-%m-%d"),
            "total_qty": pd.Series(qs[pos[hit]], dtype="int64",
                                   index=d.index)})

    return orders.map_batches(probe, batch_format="pandas")


def customer_order_counts(sf_dir: str, num_partitions=None):
    """(c_custkey, n_orders) for EVERY customer, including the ones with
    zero orders — the LEFT OUTER aggregate (and its anti-join corollary:
    filter n_orders = 0), the relational shape inner-join pipelines
    silently get wrong. Returns exact int64 counts.

    Scale shape: orders pre-aggregate per custkey inside each batch
    (combiner — the exchange carries distinct custkeys, never orders),
    then ONE hash(custkey) co-group unions the customer keys with the
    count partials and left-merges inside the bucket, zero-filling
    customers no order row reached. No broadcast needed: both sides
    partition on the same key.
    """
    import numpy as np
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    customer = _bread("%s/customer.parquet" % sf_dir,
                                     columns=["c_custkey"])
    orders = _bread("%s/orders.parquet" % sf_dir,
                                   columns=["o_custkey"])

    def c_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].astype("int64")
        return pd.DataFrame({
            "k": k, "n": np.int64(0), "side": np.int8(0),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def o_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("o_custkey", as_index=False).size()
             .rename(columns={"o_custkey": "k", "size": "n"}))
        k = g["k"].astype("int64")
        return pd.DataFrame({
            "k": k, "n": g["n"].astype("int64"), "side": np.int8(1),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cust = df[df["side"] == 0][["k"]].drop_duplicates()
        cnt = (df[df["side"] == 1].groupby("k", as_index=False)["n"]
               .sum())
        m = cust.merge(cnt, on="k", how="left")
        return pd.DataFrame({
            "c_custkey": m["k"].astype("int64"),
            "n_orders": m["n"].fillna(0).astype("int64")})

    both = (customer.map_batches(c_rows, batch_format="pandas")
            .union(orders.map_batches(o_partial, batch_format="pandas")))
    return both.groupby("bucket").map_groups(merge, batch_format="pandas")


def cooccurrence_pairs(sf_dir: str, min_orders: int = 2,
                       num_partitions=None):
    """(part_a, part_b, n_orders) for part pairs co-purchased in at
    least ``min_orders`` distinct orders — the market-basket
    co-occurrence graph (the apriori-style frequent-pair primitive).

    Scale shape: two exchanges, both combiner-fed. (1) distinct
    (orderkey, partkey) rows bucket on hash(orderkey) — pair expansion
    happens INSIDE the bucket where one order's items are co-located,
    bounded by C(basket,2) per order (baskets are small by domain).
    (2) the per-bucket pair-count partials bucket on hash(pair) for the
    final sum + HAVING filter; pair cardinality is ~10^5 at sf0.01 so
    Ray's native aggregate is avoided (CLAUDE.md gotcha) — the reduce
    is a bucketed co-group.
    """
    import numpy as np
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    li = _bread("%s/lineitem.parquet" % sf_dir,
                               columns=["l_orderkey", "l_partkey"])

    def distinct_items(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates()
        k = g["l_orderkey"].astype("int64")
        return pd.DataFrame({
            "o": k, "p": g["l_partkey"].astype("int64"),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def expand_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df[["o", "p"]].drop_duplicates()
        m = g.merge(g, on="o")
        m = m[m["p_x"] < m["p_y"]]
        c = m.groupby(["p_x", "p_y"], as_index=False).size()
        h = pd.util.hash_pandas_object(
            c["p_x"] * np.int64(1000003) + c["p_y"], index=False)
        return pd.DataFrame({
            "pa": c["p_x"].astype("int64"),
            "pb": c["p_y"].astype("int64"),
            "n": c["size"].astype("int64"),
            "bucket2": (h % nparts).astype("int32")})

    def reduce_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["pa", "pb"], as_index=False)["n"].sum()
        g = g[g["n"] >= min_orders]
        return pd.DataFrame({"part_a": g["pa"].astype("int64"),
                             "part_b": g["pb"].astype("int64"),
                             "n_orders": g["n"].astype("int64")})

    return (li.map_batches(distinct_items, batch_format="pandas")
            .groupby("bucket").map_groups(expand_pairs,
                                          batch_format="pandas")
            .groupby("bucket2").map_groups(reduce_pairs,
                                           batch_format="pandas"))


def late_orders_by_priority(sf_dir: str, late_days: int = 60,
                            num_partitions=None):
    """(o_orderpriority, n_late) — orders where SOME line item shipped
    more than ``late_days`` after the order date, counted by priority:
    the EXISTS correlated-subquery shape (TPC-H Q4), rewritten as an
    aggregate semi-join (EXISTS over a monotone predicate ≡ a per-order
    MAX crossing the threshold).

    Scale shape: the lineitem side pre-aggregates max(shipdate) per
    orderkey inside each batch (combiner — the exchange carries
    distinct orderkeys), orders co-partition on the same hash(orderkey)
    bucket, and the per-bucket merge emits priority-count partials, so
    the final reduce is a |priorities|-row hash aggregate.
    """
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    li = _bread("%s/lineitem.parquet" % sf_dir,
                               columns=["l_orderkey", "l_shipdate"])
    orders = _bread(
        "%s/orders.parquet" % sf_dir,
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("l_orderkey", as_index=False)["l_shipdate"].max()
             .rename(columns={"l_orderkey": "k", "l_shipdate": "max_ship"}))
        k = g["k"].astype("int64")
        return pd.DataFrame({
            "k": k, "max_ship": g["max_ship"],
            "odate": pd.NaT, "prio": "",
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].astype("int64")
        return pd.DataFrame({
            "k": k, "max_ship": pd.NaT,
            "odate": df["o_orderdate"],
            "prio": df["o_orderpriority"].astype(str),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def cogroup(df: pd.DataFrame) -> pd.DataFrame:
        li_side = (df[df["max_ship"].notna()]
                   .groupby("k", as_index=False)["max_ship"].max())
        o_side = df[df["odate"].notna()][["k", "odate", "prio"]]
        m = o_side.merge(li_side, on="k", how="inner")
        late = m[(m["max_ship"] - m["odate"])
                 > pd.Timedelta(days=late_days)]
        g = late.groupby("prio", as_index=False).size()
        return pd.DataFrame({"o_orderpriority": g["prio"].astype(str),
                             "n": g["size"].astype("int64")})

    from ray.data.aggregate import Sum

    partials = (li.map_batches(li_partial, batch_format="pandas")
                .union(orders.map_batches(o_rows, batch_format="pandas"))
                .groupby("bucket").map_groups(cogroup,
                                              batch_format="pandas"))
    out = partials.groupby("o_orderpriority").aggregate(Sum("n"))
    return out.map_batches(
        lambda df: pd.DataFrame({
            "o_orderpriority": df["o_orderpriority"].astype(str),
            "n_late": df["sum(n)"].astype("int64")}),
        batch_format="pandas")


def no_orders_customers(sf_dir: str, since: str = "2000-06-01",
                        num_partitions=None):
    """(nationkey, n_cust, sum_bal_q2) — customers with an
    above-average positive account balance and NO order since the
    ``since`` cutoff (lapsed high-value customers), aggregated by
    nation: the TPC-H Q22 shape (scalar-subquery threshold +
    NOT EXISTS anti-join + re-aggregate). The recency predicate keeps
    the anti-join non-vacuous on a corpus where every customer has
    SOME order.

    Exact integer arithmetic end-to-end: balances quantize to cents via
    floor(100·x + 0.5) (round-half-up, mirrored in the SQL), and the
    "above average" test multiplies out the division —
    bal_q2 · n_pos > sum_pos — so no float ever crosses engines.

    Scale shape: the threshold needs only two scalars, computed by a
    per-batch combiner and reduced driver-side (output-sized). The
    anti-join is ONE hash(custkey) co-group — orders pre-aggregate to
    distinct custkeys per batch (combiner), customers carry their
    attributes; survivors emit per-nation partials so the final reduce
    is a |nations|-row hash aggregate. No broadcast: both sides
    partition on the same key, and the survivor set never materializes
    driver-side.
    """
    import numpy as np
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    customer = _bread("%s/customer.parquet" % sf_dir,
                                     columns=cust_cols)

    def q2(x) -> np.ndarray:
        return np.floor(100.0 * np.asarray(x, dtype="float64")
                        + 0.5).astype("int64")

    # scalar threshold: sum + count of positive balances (2-int reduce)
    def pos_partial(df: pd.DataFrame) -> pd.DataFrame:
        bal = q2(df["c_acctbal"])
        pos = bal[bal > 0]
        return pd.DataFrame({"s": [int(pos.sum())], "n": [len(pos)]})

    t = customer.map_batches(pos_partial, batch_format="pandas").to_pandas()
    sum_pos, n_pos = int(t["s"].sum()), int(t["n"].sum())

    orders = _bread("%s/orders.parquet" % sf_dir,
                                   columns=["o_custkey", "o_orderdate"])
    cutoff = pd.Timestamp(since)

    def c_rows(df: pd.DataFrame) -> pd.DataFrame:
        bal = q2(df["c_acctbal"])
        keep = bal * n_pos > sum_pos
        d = df[keep]
        k = d["c_custkey"].astype("int64")
        return pd.DataFrame({
            "k": k, "nat": d["c_nationkey"].astype("int64"),
            "bal": bal[keep], "side": np.int8(0),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def o_keys(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["o_orderdate"] >= cutoff]
        k = pd.Series(d["o_custkey"].unique()).astype("int64")
        return pd.DataFrame({
            "k": k, "nat": np.int64(0), "bal": np.int64(0),
            "side": np.int8(1),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        has_order = set(df.loc[df["side"] == 1, "k"])
        c = df[df["side"] == 0]
        c = c[~c["k"].isin(has_order)]
        g = c.groupby("nat", as_index=False).agg(
            n_cust=("k", "size"), sum_bal=("bal", "sum"))
        return pd.DataFrame({"nationkey": g["nat"].astype("int64"),
                             "n_cust": g["n_cust"].astype("int64"),
                             "sum_bal": g["sum_bal"].astype("int64")})

    from ray.data.aggregate import Sum

    partials = (customer.map_batches(c_rows, batch_format="pandas")
                .union(orders.map_batches(o_keys, batch_format="pandas"))
                .groupby("bucket").map_groups(anti, batch_format="pandas"))
    out = partials.groupby("nationkey").aggregate(
        Sum("n_cust"), Sum("sum_bal"))
    return out.map_batches(
        lambda df: pd.DataFrame({
            "nationkey": df["nationkey"].astype("int64"),
            "n_cust": df["sum(n_cust)"].astype("int64"),
            "sum_bal_q2": df["sum(sum_bal)"].astype("int64")}),
        batch_format="pandas")


def top_supplier(sf_dir: str, num_partitions=None):
    """(s_suppkey, s_name, total_revenue_u) — the supplier(s) achieving
    the maximum total revenue: the TPC-H Q15 shape (aggregate → scalar
    MAX of the aggregate → equality join back). Revenue is exact
    integer units: cents · (100 − discount%), both factors quantized
    floor(100·x + 0.5), so the argmax is engine-portable.

    Scale shape: revenue pre-aggregates per suppkey inside each batch
    (combiner — the exchange carries distinct suppkeys, never line
    items), one hash(suppkey) co-group produces the supplier-sized
    revenue table (materialized once: it is dimension-table-sized by
    construction), the scalar max reduces from per-bucket partials, and
    the winner set — OUTPUT-sized, usually one row — probes the
    supplier dimension map-side via closure. No all-to-all after the
    first exchange.
    """
    import numpy as np
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    li = _bread(
        "%s/lineitem.parquet" % sf_dir,
        columns=["l_suppkey", "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(100.0 * df["l_extendedprice"].to_numpy("float64")
                         + 0.5).astype("int64")
        disc = np.floor(100.0 * df["l_discount"].to_numpy("float64")
                        + 0.5).astype("int64")
        t = pd.DataFrame({"k": df["l_suppkey"].astype("int64"),
                          "rev": cents * (100 - disc)})
        g = t.groupby("k", as_index=False)["rev"].sum()
        return pd.DataFrame({
            "k": g["k"].astype("int64"), "rev": g["rev"].astype("int64"),
            "bucket": (pd.util.hash_pandas_object(g["k"], index=False)
                       % nparts).astype("int32")})

    def reduce_rev(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k", as_index=False)["rev"].sum()
        return pd.DataFrame({"k": g["k"].astype("int64"),
                             "rev": g["rev"].astype("int64")})

    agg = (li.map_batches(partial, batch_format="pandas")
           .groupby("bucket").map_groups(reduce_rev,
                                         batch_format="pandas")
           .materialize())  # supplier-dimension-sized, reused twice
    maxv = int(agg.max("rev"))

    def winners_only(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["rev"] == maxv]

    win = agg.map_batches(winners_only, batch_format="pandas").to_pandas()
    win_rev = dict(zip(win["k"].astype("int64"),
                       win["rev"].astype("int64")))

    supplier = _bread("%s/supplier.parquet" % sf_dir,
                                     columns=["s_suppkey", "s_name"])

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["s_suppkey"].isin(win_rev)]
        return pd.DataFrame({
            "s_suppkey": d["s_suppkey"].astype("int64"),
            "s_name": d["s_name"].astype(str),
            "total_revenue_u": d["s_suppkey"].map(win_rev)
            .astype("int64")})

    return supplier.map_batches(probe, batch_format="pandas")


def top_supplier_per_part(sf_dir: str, num_partitions=None):
    """(p_partkey, top_suppkey, total_qty) — for every part, the
    supplier that shipped the most total quantity (ties broken by the
    smaller suppkey): the per-group argmax-of-aggregate (TPC-H Q2's
    correlated-min shape, on the lineitem link).

    Scale shape: one combiner-fed exchange. Per-batch groupby on
    (partkey, suppkey) collapses line items to pair partials, the
    hash(partkey) co-group finishes the sum and takes the per-part
    argmax vectorized (one sort + head(1) across every part in the
    bucket) — never a per-part UDF dispatch.
    """
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    li = _bread(
        "%s/lineitem.parquet" % sf_dir,
        columns=["l_partkey", "l_suppkey", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"p": df["l_partkey"].astype("int64"),
                          "s": df["l_suppkey"].astype("int64"),
                          "q": df["l_quantity"].astype("int64")})
        g = t.groupby(["p", "s"], as_index=False)["q"].sum()
        return pd.DataFrame({
            "p": g["p"], "s": g["s"], "q": g["q"].astype("int64"),
            "bucket": (pd.util.hash_pandas_object(g["p"], index=False)
                       % nparts).astype("int32")})

    def argmax_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["p", "s"], as_index=False)["q"].sum()
        g = g.sort_values(["p", "q", "s"],
                          ascending=[True, False, True])
        top = g.groupby("p", as_index=False).head(1)
        return pd.DataFrame({"p_partkey": top["p"].astype("int64"),
                             "top_suppkey": top["s"].astype("int64"),
                             "total_qty": top["q"].astype("int64")})

    return (li.map_batches(partial, batch_format="pandas")
            .groupby("bucket").map_groups(argmax_part,
                                          batch_format="pandas"))


def promo_revenue(sf_dir: str):
    """One row (promo_rev_u, total_rev_u, promo_ratio_q6) — the share
    of revenue from PROMO-type parts: the TPC-H Q14 shape (fact ⋈
    dimension + conditional aggregation to a scalar ratio). Revenue in
    exact integer units cents·(100−disc%); the ratio is the integer
    floor of 10⁶·promo/total (both non-negative, so floor division
    agrees across engines).

    Scale shape: lineitem pre-aggregates revenue per partkey inside
    each batch (combiner — the exchange carries distinct partkeys, not
    line items), the part side ships (partkey, is_promo) flags, one
    hash(partkey) co-group emits 2-int partials per bucket, and the
    driver folds the bucket partials (output-sized). Returns pandas —
    the result is a scalar row.
    """
    import numpy as np
    import ray
    import ray.data

    nparts = max(4, int(ray.cluster_resources().get("CPU", 8)))

    li = _bread(
        "%s/lineitem.parquet" % sf_dir,
        columns=["l_partkey", "l_extendedprice", "l_discount"])
    part = _bread("%s/part.parquet" % sf_dir,
                                 columns=["p_partkey", "p_type"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(100.0 * df["l_extendedprice"].to_numpy("float64")
                         + 0.5).astype("int64")
        disc = np.floor(100.0 * df["l_discount"].to_numpy("float64")
                        + 0.5).astype("int64")
        t = pd.DataFrame({"k": df["l_partkey"].astype("int64"),
                          "rev": cents * (100 - disc)})
        g = t.groupby("k", as_index=False)["rev"].sum()
        return pd.DataFrame({
            "k": g["k"], "rev": g["rev"].astype("int64"),
            "promo": np.int8(-1),
            "bucket": (pd.util.hash_pandas_object(g["k"], index=False)
                       % nparts).astype("int32")})

    def p_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["p_partkey"].astype("int64")
        return pd.DataFrame({
            "k": k, "rev": np.int64(0),
            "promo": df["p_type"].str.startswith("PROMO")
            .astype("int8"),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def cogroup(df: pd.DataFrame) -> pd.DataFrame:
        rev = (df[df["promo"] < 0].groupby("k", as_index=False)
               ["rev"].sum())
        flags = df[df["promo"] >= 0][["k", "promo"]]
        m = rev.merge(flags, on="k", how="inner")
        promo = int(m.loc[m["promo"] == 1, "rev"].sum())
        total = int(m["rev"].sum())
        return pd.DataFrame({"promo": [promo], "total": [total]})

    parts = (li.map_batches(li_partial, batch_format="pandas")
             .union(part.map_batches(p_rows, batch_format="pandas"))
             .groupby("bucket").map_groups(cogroup,
                                           batch_format="pandas")
             .to_pandas())
    promo_u = int(parts["promo"].sum())
    total_u = int(parts["total"].sum())
    return pd.DataFrame({
        "promo_rev_u": pd.Series([promo_u], dtype="int64"),
        "total_rev_u": pd.Series([total_u], dtype="int64"),
        "promo_ratio_q6": pd.Series([10**6 * promo_u // total_u],
                                    dtype="int64")})


def parts_supplier_counts(sf_dir: str, num_partitions=None):
    """(p_brand, p_size, supplier_cnt) — how many distinct acceptable
    suppliers serve each (brand, size) of part: the TPC-H Q16 shape
    (COUNT DISTINCT over a join, minus a NOT IN supplier exclusion
    list).

    Scale shape: the exclusion list (suppliers with negative balance)
    is dimension-derived and tiny — it ships once by closure and
    filters MAP-side (for a pathological exclusion set, swap to a
    hash(suppkey) co-group). Line items collapse to distinct
    (partkey, suppkey) pairs per batch (combiner), one hash(partkey)
    co-group attaches brand/size and emits distinct
    (brand, size, suppkey) rows, and a second exchange on
    hash(brand, size) makes the distinct count exact — every row of a
    group lands in one bucket, deduped vectorized before counting.
    """
    import numpy as np
    import pyarrow.parquet as pq_
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    sup = pq_.read_table("%s/supplier.parquet" % sf_dir,
                         columns=["s_suppkey", "s_acctbal"]).to_pandas()
    excluded = frozenset(
        sup.loc[sup["s_acctbal"] < 0, "s_suppkey"].astype("int64"))

    li = _bread("%s/lineitem.parquet" % sf_dir,
                               columns=["l_partkey", "l_suppkey"])
    part = _bread("%s/part.parquet" % sf_dir,
                                 columns=["p_partkey", "p_brand",
                                          "p_size"])

    def li_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates()
        g = g[~g["l_suppkey"].isin(excluded)]
        k = g["l_partkey"].astype("int64")
        return pd.DataFrame({
            "k": k, "s": g["l_suppkey"].astype("int64"),
            "brand": "", "size": np.int64(-1),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def p_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["p_partkey"].astype("int64")
        return pd.DataFrame({
            "k": k, "s": np.int64(-1),
            "brand": df["p_brand"].astype(str),
            "size": df["p_size"].astype("int64"),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        pairs = df[df["s"] >= 0][["k", "s"]].drop_duplicates()
        attrs = df[df["s"] < 0][["k", "brand", "size"]]
        m = pairs.merge(attrs, on="k", how="inner")
        g = m[["brand", "size", "s"]].drop_duplicates()
        h = pd.util.hash_pandas_object(
            g["brand"] + "\x1f" + g["size"].astype(str), index=False)
        return pd.DataFrame({
            "brand": g["brand"].astype(str),
            "size": g["size"].astype("int64"),
            "s": g["s"].astype("int64"),
            "bucket2": (h % nparts).astype("int32")})

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        d = (df[["brand", "size", "s"]].drop_duplicates()
             .rename(columns={"size": "psize"}))
        g = (d.groupby(["brand", "psize"], as_index=False)
             .agg(supplier_cnt=("s", "size")))
        return pd.DataFrame({
            "p_brand": g["brand"].astype(str),
            "p_size": g["psize"].astype("int64"),
            "supplier_cnt": g["supplier_cnt"].astype("int64")})

    return (li.map_batches(li_pairs, batch_format="pandas")
            .union(part.map_batches(p_rows, batch_format="pandas"))
            .groupby("bucket").map_groups(attach, batch_format="pandas")
            .groupby("bucket2").map_groups(count_distinct,
                                           batch_format="pandas"))


def _local_skyline(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized 2-D skyline (minimize price_q2, maximize p_size) of
    one frame; duplicates of a skyline point all survive (no strict
    dominance between equals — mirrors the SQL NOT EXISTS rule)."""
    import numpy as np

    d = df.sort_values(["price_q2", "p_size", "p_partkey"],
                       ascending=[True, False, True]).reset_index(drop=True)
    size = d["p_size"].to_numpy(dtype="int64")
    price = d["price_q2"].to_numpy(dtype="int64")
    # running max size over STRICTLY cheaper prefix: group rows by
    # price, shift the group-wise running max down one price level
    cummax = np.maximum.accumulate(size)
    first_of_price = np.ones(len(d), dtype=bool)
    first_of_price[1:] = price[1:] != price[:-1]
    grp_start = np.maximum.accumulate(
        np.where(first_of_price, np.arange(len(d)), 0))
    prev_max = np.full(len(d), np.iinfo("int64").min, dtype="int64")
    nz = grp_start > 0
    prev_max[nz] = cummax[grp_start[nz] - 1]
    # same-price prefix max (sorted size-desc, so it's the group head)
    head_size = size[grp_start]
    dominated = (prev_max >= size) | (head_size > size)
    return d[~dominated]


def skyline_parts(sf_dir: str):
    """(p_partkey, price_q2, p_size) — the Pareto frontier of parts
    (cheapest price vs largest size): the SKYLINE operator. A point
    survives iff nothing is at-least-as-good in both dimensions and
    strictly better in one; equal points are mutually non-dominating
    and all survive.

    Scale shape: skyline-of-skylines is exact (a dominated point can
    never eliminate anything a surviving dominator would not), so each
    batch reduces to its local frontier (combiner) and the driver folds
    the concatenated local frontiers — output-sized for correlated
    dimensions (anti-correlated worst cases need a partition-by-price-
    range second level; documented, not needed here). Zero shuffles.
    """
    import numpy as np
    import ray.data

    ds = _bread("%s/part.parquet" % sf_dir,
                               columns=["p_partkey", "p_retailprice",
                                        "p_size"])

    def local(df: pd.DataFrame) -> pd.DataFrame:
        q = pd.DataFrame({
            "p_partkey": df["p_partkey"].astype("int64"),
            "price_q2": np.floor(100.0 * df["p_retailprice"]
                                 .to_numpy("float64") + 0.5)
            .astype("int64"),
            "p_size": df["p_size"].astype("int64")})
        return _local_skyline(q)

    t = ds.map_batches(local, batch_format="pandas").to_pandas()
    return _local_skyline(t).reset_index(drop=True)


def profile_columns(sf_dir: str, num_partitions=None):
    """(col, n_rows, n_null, n_distinct) — the schema-profiling pass
    (the first thing run against any new 100 TB drop): per-column row
    count, null count, and EXACT distinct cardinality for every column
    of ``orders``.

    Scale shape: row/null counts fold from per-batch scalars
    (output-sized). Distincts: each batch emits its per-column distinct
    value set as (col, val-as-string) rows (combiner), one
    hash(col, val) co-group dedups globally and emits per-column
    partial counts, and the final reduce is a |columns|-row hash
    aggregate — the exchange carries distinct values, never rows. For
    ultra-wide high-cardinality columns, swap the value string for its
    16-byte digest (the dedup_exact trick) to fix the row width.
    """
    import numpy as np
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    ds = _bread("%s/orders.parquet" % sf_dir)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in df.columns:
            rows.append((c, len(df), int(df[c].isna().sum())))
        return pd.DataFrame(rows, columns=["col", "n_rows", "n_null"])

    base = (ds.map_batches(counts, batch_format="pandas").to_pandas()
            .groupby("col", as_index=False)[["n_rows", "n_null"]].sum())

    def distinct_vals(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in df.columns:
            u = df[c].dropna().unique()
            s = pd.Series(u).astype(str)
            frames.append(pd.DataFrame({"col": c, "val": s}))
        out = pd.concat(frames, ignore_index=True)
        out["bucket"] = (pd.util.hash_pandas_object(
            out["col"] + "\x1f" + out["val"], index=False)
            % nparts).astype("int32")
        return out

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df[["col", "val"]].drop_duplicates()
             .groupby("col", as_index=False).size())
        return pd.DataFrame({"col": g["col"].astype(str),
                             "nd": g["size"].astype("int64")})

    nd = (ds.map_batches(distinct_vals, batch_format="pandas")
          .groupby("bucket").map_groups(count_partial,
                                        batch_format="pandas")
          .to_pandas().groupby("col", as_index=False)["nd"].sum())

    out = base.merge(nd, on="col", how="left")
    return pd.DataFrame({
        "col": out["col"].astype(str),
        "n_rows": out["n_rows"].astype("int64"),
        "n_null": out["n_null"].astype("int64"),
        "n_distinct": out["nd"].fillna(0).astype("int64")}) \
        .sort_values("col").reset_index(drop=True)


def wait_chain_suppliers(sf_dir: str, late_days: int = 90,
                         num_partitions=None):
    """(s_suppkey, n_orders) — suppliers who were the SOLE late shipper
    on multi-supplier orders, counted per supplier: the TPC-H Q21
    shape, the nastiest standard correlated query (EXISTS another
    supplier on the order AND NOT EXISTS another LATE supplier).

    Scale shape: ONE hash(orderkey) exchange. The lineitem combiner
    collapses to distinct (orderkey, suppkey, late-flag-partial) rows
    (late = any line > late_days after the order date, so per-batch OR
    partials merge by max); orders co-partition on the same key;
    inside a bucket the EXISTS pair turns into two vectorized
    per-order aggregates (n_suppliers, n_late_suppliers) and the
    qualifying rows emit per-supplier count partials into a
    dimension-sized final aggregate via a second tiny exchange.
    """
    import numpy as np
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    li = _bread("%s/lineitem.parquet" % sf_dir,
                               columns=["l_orderkey", "l_suppkey",
                                        "l_shipdate"])
    orders = _bread("%s/orders.parquet" % sf_dir,
                                   columns=["o_orderkey",
                                            "o_orderdate"])

    # fixed-width exchange rows: timestamps as epoch µs int64 with a
    # -1 sentinel — a NaT-mixed datetime union degrades to object
    # dtype and slows serialization (measured 14.6 → 6.0 s cold)
    def li_rows(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["l_orderkey", "l_suppkey"], as_index=False)
             ["l_shipdate"].max())
        k = g["l_orderkey"].astype("int64")
        ship = ((g["l_shipdate"] - pd.Timestamp(0))
                // pd.Timedelta(microseconds=1)).astype("int64")
        return pd.DataFrame({
            "k": k, "s": g["l_suppkey"].astype("int64"),
            "ship": ship, "odate": np.int64(-1),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].astype("int64")
        od = ((df["o_orderdate"] - pd.Timestamp(0))
              // pd.Timedelta(microseconds=1)).astype("int64")
        return pd.DataFrame({
            "k": k, "s": np.int64(-1), "ship": np.int64(-1),
            "odate": od,
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    late_us = np.int64(late_days) * 86400 * 10**6

    def cogroup(df: pd.DataFrame) -> pd.DataFrame:
        pairs = (df[df["s"] >= 0]
                 .groupby(["k", "s"], as_index=False)["ship"].max())
        od = df[df["s"] < 0][["k", "odate"]]
        m = pairs.merge(od, on="k", how="inner")
        m["late"] = (m["ship"] - m["odate"]) > late_us
        agg = m.groupby("k").agg(n_supp=("s", "size"),
                                 n_late=("late", "sum"))
        m = m.join(agg, on="k")
        keep = m[m["late"] & (m["n_supp"] > 1) & (m["n_late"] == 1)]
        g = keep.groupby("s", as_index=False).size()
        return pd.DataFrame({"s": g["s"].astype("int64"),
                             "n": g["size"].astype("int64")})

    # per-bucket output is supplier-dimension-sized: fold driver-side
    # instead of paying another all-to-all
    t = (li.map_batches(li_rows, batch_format="pandas")
         .union(orders.map_batches(o_rows, batch_format="pandas"))
         .groupby("bucket").map_groups(cogroup, batch_format="pandas")
         .to_pandas().groupby("s", as_index=False)["n"].sum())
    return pd.DataFrame({
        "s_suppkey": t["s"].astype("int64"),
        "n_orders": t["n"].astype("int64")}) \
        .sort_values("s_suppkey").reset_index(drop=True)


def table_checksums(sf_dir: str):
    """(tbl, n_rows, checksum) — order-independent integrity
    fingerprints of the orders and customer tables: checksum =
    Σ md5-u64(canonical row string) mod 2⁶⁴, the anti-entropy /
    replication-verification primitive (two sites compare one row per
    table instead of shipping data). Map-only scalar combiners; the
    canonical row string is the '|'-joined key and integer-cents
    columns, reproduced verbatim in the SQL.
    """
    import hashlib

    import numpy as np
    import ray.data

    out_rows = []
    MOD = 1 << 64

    def run(tbl: str, build) -> None:
        ds = _bread("%s/%s.parquet" % (sf_dir, tbl))

        def partial(df: pd.DataFrame, build=build) -> pd.DataFrame:
            s = build(df)
            acc = 0
            for row in s:
                acc += int(hashlib.md5(row.encode()).hexdigest()[:16],
                           16)
            # reduce mod 2^63 per batch: partials stay valid int64 and
            # modular addition distributes over the driver fold
            return pd.DataFrame({"n": [len(s)], "c": [acc % (1 << 63)]})

        t = ds.map_batches(partial, batch_format="pandas").to_pandas()
        out_rows.append((tbl, int(t["n"].sum()),
                         sum(int(x) for x in t["c"]) % (1 << 63)))

    run("orders", lambda df: (
        df["o_orderkey"].astype("int64").astype(str) + "|"
        + np.floor(100.0 * df["o_totalprice"].to_numpy("float64")
                   + 0.5).astype("int64").astype(str)).tolist())
    run("customer", lambda df: (
        df["c_custkey"].astype("int64").astype(str) + "|"
        + np.floor(100.0 * df["c_acctbal"].to_numpy("float64")
                   + 0.5).astype("int64").astype(str)).tolist())

    out = pd.DataFrame(out_rows, columns=["tbl", "n_rows", "checksum"])
    return out.astype({"tbl": str, "n_rows": "int64",
                       "checksum": "int64"}) \
        .sort_values("tbl").reset_index(drop=True)


def nation_revenue_share(sf_dir: str, num_partitions=None):
    """(n_name, rev_q2, share_q6) — each nation's share of total
    revenue (the percent-of-total / ratio_to_report window): customer
    nation attribution over orders, exact integer cents, share =
    floor(10⁶·rev/total).

    Scale shape: orders pre-aggregate revenue per custkey (combiner),
    ONE hash(custkey) co-group attaches the customer's nation and
    emits ≤|nations| partials per bucket; the grand total is the sum
    of the same partials, so the share computes in the output-sized
    driver fold — no second pass.
    """
    import numpy as np
    import pyarrow.parquet as pq_
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    nt = pq_.read_table("%s/nation.parquet" % sf_dir,
                        columns=["n_nationkey", "n_name"])
    nation_map = dict(zip(nt.column("n_nationkey").to_pylist(),
                          nt.column("n_name").to_pylist()))

    orders = _bread("%s/orders.parquet" % sf_dir,
                                   columns=["o_custkey",
                                            "o_totalprice"])
    customer = _bread("%s/customer.parquet" % sf_dir,
                                     columns=["c_custkey",
                                              "c_nationkey"])

    def o_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({
            "k": df["o_custkey"].astype("int64"),
            "rev": np.floor(100.0 * df["o_totalprice"]
                            .to_numpy("float64") + 0.5)
            .astype("int64")})
        g = t.groupby("k", as_index=False)["rev"].sum()
        return pd.DataFrame({
            "k": g["k"], "rev": g["rev"].astype("int64"),
            "nat": np.int64(-1),
            "bucket": (pd.util.hash_pandas_object(g["k"], index=False)
                       % nparts).astype("int32")})

    def c_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].astype("int64")
        return pd.DataFrame({
            "k": k, "rev": np.int64(0),
            "nat": df["c_nationkey"].astype("int64"),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def cogroup(df: pd.DataFrame) -> pd.DataFrame:
        rev = df[df["nat"] < 0].groupby("k", as_index=False)["rev"].sum()
        cust = df[df["nat"] >= 0][["k", "nat"]]
        m = rev.merge(cust, on="k", how="inner")
        g = m.groupby("nat", as_index=False)["rev"].sum()
        return pd.DataFrame({"nat": g["nat"].astype("int64"),
                             "rev": g["rev"].astype("int64")})

    t = (orders.map_batches(o_partial, batch_format="pandas")
         .union(customer.map_batches(c_rows, batch_format="pandas"))
         .groupby("bucket").map_groups(cogroup, batch_format="pandas")
         .to_pandas().groupby("nat", as_index=False)["rev"].sum())
    total = int(t["rev"].sum())
    return pd.DataFrame({
        "n_name": t["nat"].map(nation_map).astype(str),
        "rev_q2": t["rev"].astype("int64"),
        "share_q6": (10**6 * t["rev"] // total).astype("int64")}) \
        .sort_values("n_name").reset_index(drop=True)


def above_avg_orders(sf_dir: str, num_partitions=None):
    """(o_custkey, n_above, n_orders) — per customer, how many of
    their orders exceed their OWN average order value: the correlated
    scalar-per-group filter (HAVING-against-own-aggregate), resolved
    in pure integers by multiplying the average out —
    price_cents · n_orders > sum_cents. Customers with one order
    report 0 (nothing exceeds its own average).

    Scale shape: ONE hash(custkey) exchange of per-batch partials
    carrying (custkey, n, sum_cents, and the batch's raw
    (custkey, cents) rows needed for the comparison) — the comparison
    needs each order against its customer's global aggregate, so raw
    order rows co-locate with their aggregate in the same bucket; the
    per-bucket pass is two vectorized groupbys and a join-free map
    lookup.
    """
    import numpy as np
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    orders = _bread("%s/orders.parquet" % sf_dir,
                                   columns=["o_custkey",
                                            "o_totalprice"])

    def rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_custkey"].astype("int64")
        return pd.DataFrame({
            "k": k,
            "cents": np.floor(100.0 * df["o_totalprice"]
                              .to_numpy("float64") + 0.5)
            .astype("int64"),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def cogroup(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("k").agg(n=("cents", "size"),
                                  s=("cents", "sum"))
        n = agg["n"].reindex(df["k"]).to_numpy("int64")
        s = agg["s"].reindex(df["k"]).to_numpy("int64")
        above = df["cents"].to_numpy("int64") * n > s
        g = (df.assign(above=above.astype("int64"))
             .groupby("k", as_index=False)
             .agg(n_above=("above", "sum"), n_orders=("above", "size")))
        return pd.DataFrame({
            "o_custkey": g["k"].astype("int64"),
            "n_above": g["n_above"].astype("int64"),
            "n_orders": g["n_orders"].astype("int64")})

    return (orders.map_batches(rows, batch_format="pandas")
            .groupby("bucket").map_groups(cogroup,
                                          batch_format="pandas"))


def forecast_revenue(sf_dir: str):
    """One-row (revenue_q4) — TPC-H Q6 shape: the pure filtered scalar
    aggregate (no join, no groupby). The shipdate window and quantity
    predicates are PUSHED INTO THE PARQUET READ (``filter=`` → row-group
    pruning; at 100 TB only qualifying row groups leave storage); the
    discount band filters on the rounded integer percent so the engine
    and the SQL oracle compare identical integers. Revenue is
    Σ cents·disc_pct (units of 10^-4 dollars) folded from map-only
    per-batch one-row partials — ZERO shuffles at any scale.
    """
    import datetime

    import numpy as np
    import pyarrow.compute as pc
    import ray.data

    flt = ((pc.field("l_shipdate")
            >= datetime.datetime(1996, 1, 1))
           & (pc.field("l_shipdate")
              < datetime.datetime(1997, 1, 1))
           & (pc.field("l_quantity") < 24.0))
    ds = _bread(
        "%s/lineitem.parquet" % sf_dir,
        columns=["l_extendedprice", "l_discount"],
        filter=flt)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pct = np.floor(100.0 * df["l_discount"].to_numpy("float64")
                       + 0.5).astype("int64")
        cents = np.floor(100.0 * df["l_extendedprice"]
                         .to_numpy("float64") + 0.5).astype("int64")
        m = (pct >= 5) & (pct <= 7)
        return pd.DataFrame({"rev": [int((cents[m] * pct[m]).sum())]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return pd.DataFrame({"revenue_q4": [int(parts["rev"].sum())]})


def small_qty_revenue(sf_dir: str, num_partitions=None):
    """One-row (rev_per_year_cents) — TPC-H Q17 shape: the correlated
    per-group FRACTION-of-average filter (quantity below 20% of the
    part's own average), with the fraction multiplied out into pure
    integers: qty < sum/(5n) ⇔ 5·qty·n < sum. Like above_avg_orders,
    raw rows must meet their group's aggregate, so ONE hash(partkey)
    exchange ships fixed-width (partkey, qty, cents) rows and each
    bucket reduces to a single partial; the yearly average divides the
    folded total by 7 in integer cents on both sides.
    """
    import numpy as np
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    li = _bread(
        "%s/lineitem.parquet" % sf_dir,
        columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["l_partkey"].astype("int64")
        return pd.DataFrame({
            "k": k,
            "qty": df["l_quantity"].to_numpy("float64").astype("int64"),
            "cents": np.floor(100.0 * df["l_extendedprice"]
                              .to_numpy("float64") + 0.5).astype("int64"),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def cogroup(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("k").agg(n=("qty", "size"), s=("qty", "sum"))
        n = agg["n"].reindex(df["k"]).to_numpy("int64")
        s = agg["s"].reindex(df["k"]).to_numpy("int64")
        m = 5 * df["qty"].to_numpy("int64") * n < s
        return pd.DataFrame(
            {"rev": [int(df["cents"].to_numpy("int64")[m].sum())]})

    parts = (li.map_batches(rows, batch_format="pandas")
             .groupby("bucket").map_groups(cogroup, batch_format="pandas")
             .to_pandas())
    return pd.DataFrame(
        {"rev_per_year_cents": [int(parts["rev"].sum()) // 7]})


def order_count_distribution(sf_dir: str, num_partitions=None):
    """(n_orders, n_customers) — TPC-H Q13 shape: the distribution of
    customers by how many orders they placed, INCLUDING the zero-order
    customers (the LEFT-JOIN half that a plain orders groupby misses).

    Scale shape: orders pre-aggregate to per-custkey counts in-batch
    (combiner — the exchange carries distinct customers, never order
    rows); customer keys ride the same ONE hash(custkey) co-group where
    missing counts zero-fill; each bucket emits its count-of-counts
    partial, so the driver folds output-sized spectra (≤ max-orders-
    per-customer rows per bucket), never customer rows.
    """
    import numpy as np
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    orders = _bread("%s/orders.parquet" % sf_dir,
                                   columns=["o_custkey"])
    customer = _bread("%s/customer.parquet" % sf_dir,
                                     columns=["c_custkey"])

    def o_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).size()
        k = g["o_custkey"].astype("int64")
        return pd.DataFrame({
            "k": k, "n": g["size"].astype("int64"),
            "is_c": np.int64(0),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def c_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].astype("int64")
        return pd.DataFrame({
            "k": k, "n": np.int64(0), "is_c": np.int64(1),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def cogroup(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df[df["is_c"] == 0].groupby("k")["n"].sum()
        cust = df[df["is_c"] == 1]["k"]
        n = cnt.reindex(cust).fillna(0).astype("int64")
        spec = n.value_counts()
        return pd.DataFrame({
            "n_orders": spec.index.to_numpy("int64"),
            "n_customers": spec.to_numpy("int64")})

    parts = (orders.map_batches(o_partial, batch_format="pandas")
             .union(customer.map_batches(c_rows, batch_format="pandas"))
             .groupby("bucket").map_groups(cogroup, batch_format="pandas")
             .to_pandas())
    out = parts.groupby("n_orders", as_index=False)["n_customers"].sum()
    return pd.DataFrame({
        "n_orders": out["n_orders"].astype("int64"),
        "n_customers": out["n_customers"].astype("int64")}) \
        .sort_values("n_orders").reset_index(drop=True)


def important_parts(sf_dir: str, num_partitions=None):
    """(p_partkey, value_cents) for parts whose lineitem value exceeds
    1/2000 of the corpus total — TPC-H Q11 shape: HAVING against a
    GLOBAL scalar aggregate. The output is bounded by construction
    (≤ 2000 rows can each exceed total/2000), so the expensive side is
    the per-part aggregate, not the filter.

    Scale shape: per-batch per-part value partials (combiner) through
    ONE hash(partkey) exchange give exact per-part values as a Dataset;
    the global total folds from map-only one-row partials over that
    part-sized aggregate (a second pass over parts, never line items);
    the threshold broadcasts via closure into a map-side filter. The
    v·2000 > total comparison is rewritten v > total//2000 so the
    map-side compare stays in int64 at any corpus size.
    """
    import numpy as np
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    li = _bread(
        "%s/lineitem.parquet" % sf_dir,
        columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(100.0 * df["l_extendedprice"]
                         .to_numpy("float64") + 0.5).astype("int64")
        qty = df["l_quantity"].to_numpy("float64").astype("int64")
        t = pd.DataFrame({"k": df["l_partkey"].astype("int64"),
                          "v": cents * qty})
        g = t.groupby("k", as_index=False)["v"].sum()
        return pd.DataFrame({
            "k": g["k"], "v": g["v"].astype("int64"),
            "bucket": (pd.util.hash_pandas_object(g["k"], index=False)
                       % nparts).astype("int32")})

    def cogroup(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k", as_index=False)["v"].sum()
        return pd.DataFrame({"k": g["k"].astype("int64"),
                             "v": g["v"].astype("int64")})

    values = (li.map_batches(partial, batch_format="pandas")
              .groupby("bucket").map_groups(cogroup,
                                            batch_format="pandas")
              .materialize())
    totals = values.map_batches(
        lambda df: pd.DataFrame({"t": [int(df["v"].sum())]}),
        batch_format="pandas").to_pandas()
    thresh = int(totals["t"].sum()) // 2000

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["v"] > thresh]
        return pd.DataFrame({"p_partkey": m["k"].astype("int64"),
                             "value_cents": m["v"].astype("int64")})

    return values.map_batches(keep, batch_format="pandas")


def ship_delay_priority(sf_dir: str, num_partitions=None):
    """(delay_band, n_high_lines, n_low_lines) — TPC-H Q12 shape
    (lineitem ⋈ orders with the measure split by order priority),
    banded by shipping delay: band = min(max(days,0)//30, 4), where
    days = (l_shipdate − o_orderdate) in whole days. Clamping at 0
    BEFORE the division keeps numpy floor-division and SQL truncating
    division identical.

    Scale shape: ONE hash(orderkey) co-group — lineitem ships
    fixed-width (orderkey, ship_us) rows (per-line delays can't
    pre-aggregate), orders ship (orderkey, order_us, hi_flag); each
    bucket merges vectorized and emits a ≤ 5×2-cell crosstab partial;
    the driver folds band-count partials (output-sized).
    """
    import numpy as np
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    li = _bread("%s/lineitem.parquet" % sf_dir,
                               columns=["l_orderkey", "l_shipdate"])
    orders = _bread(
        "%s/orders.parquet" % sf_dir,
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    DAY_US = 86400 * 10**6

    def l_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["l_orderkey"].astype("int64")
        return pd.DataFrame({
            "k": k,
            "us": df["l_shipdate"].astype("datetime64[us]")
            .astype("int64"),
            "hi": np.int8(-1),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].astype("int64")
        return pd.DataFrame({
            "k": k,
            "us": df["o_orderdate"].astype("datetime64[us]")
            .astype("int64"),
            "hi": df["o_orderpriority"]
            .isin(["1-URGENT", "2-HIGH"]).astype("int8"),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def cogroup(df: pd.DataFrame) -> pd.DataFrame:
        lines = df[df["hi"] < 0][["k", "us"]]
        ords = df[df["hi"] >= 0][["k", "us", "hi"]] \
            .rename(columns={"us": "ous"})
        m = lines.merge(ords, on="k", how="inner")
        delta = np.maximum(
            m["us"].to_numpy("int64") - m["ous"].to_numpy("int64"), 0)
        band = np.minimum(delta // DAY_US // 30, 4)
        hi = m["hi"].to_numpy("int64")
        t = pd.DataFrame({"band": band, "hi": hi})
        g = t.groupby("band", as_index=False).agg(
            n_hi=("hi", "sum"), n=("hi", "size"))
        return pd.DataFrame({
            "band": g["band"].astype("int64"),
            "n_hi": g["n_hi"].astype("int64"),
            "n_lo": (g["n"] - g["n_hi"]).astype("int64")})

    parts = (li.map_batches(l_rows, batch_format="pandas")
             .union(orders.map_batches(o_rows, batch_format="pandas"))
             .groupby("bucket").map_groups(cogroup,
                                           batch_format="pandas")
             .to_pandas())
    g = parts.groupby("band", as_index=False).sum()
    return pd.DataFrame({
        "delay_band": g["band"].astype("int64"),
        "n_high_lines": g["n_hi"].astype("int64"),
        "n_low_lines": g["n_lo"].astype("int64")}) \
        .sort_values("delay_band").reset_index(drop=True)


def returned_top_customers(sf_dir: str, num_partitions=None, k: int = 20):
    """Top-20 customers by returned-item revenue in 1996 Q1 — TPC-H
    Q10 shape: fact filter ⋈ orders (date window pushed into the
    parquet read) ⋈ customer ⋈ nation, global top-k. Revenue is exact
    integer units cents·(100−disc%); the (rev DESC, c_custkey) total
    order makes the top-k deterministic.

    Scale shape: lineitem filters returnflag='R' map-side and
    pre-aggregates revenue per orderkey in-batch (combiner); a
    hash(orderkey) co-group with the date-filtered orders re-keys
    revenue to custkey (combined again); a second hash(custkey)
    co-group attaches the customer row and emits a per-BUCKET top-k
    partial, so the driver folds nparts·k candidate rows; nation (25
    rows) broadcasts via closure.
    """
    import datetime

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    nt = pq.read_table("%s/nation.parquet" % sf_dir,
                       columns=["n_nationkey", "n_name"])
    nation_map = dict(zip(nt.column("n_nationkey").to_pylist(),
                          nt.column("n_name").to_pylist()))

    li = _bread(
        "%s/lineitem.parquet" % sf_dir,
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"])
    orders = _bread(
        "%s/orders.parquet" % sf_dir,
        columns=["o_orderkey", "o_custkey"],
        filter=((pc.field("o_orderdate")
                 >= datetime.datetime(1996, 1, 1))
                & (pc.field("o_orderdate")
                   < datetime.datetime(1996, 4, 1))))
    customer = _bread(
        "%s/customer.parquet" % sf_dir,
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_returnflag"] == "R"]
        cents = np.floor(100.0 * df["l_extendedprice"]
                         .to_numpy("float64") + 0.5).astype("int64")
        disc = np.floor(100.0 * df["l_discount"].to_numpy("float64")
                        + 0.5).astype("int64")
        t = pd.DataFrame({"k": df["l_orderkey"].astype("int64"),
                          "rev": cents * (100 - disc)})
        g = t.groupby("k", as_index=False)["rev"].sum()
        return pd.DataFrame({
            "k": g["k"], "rev": g["rev"].astype("int64"),
            "ck": np.int64(-1),
            "bucket": (pd.util.hash_pandas_object(g["k"], index=False)
                       % nparts).astype("int32")})

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].astype("int64")
        return pd.DataFrame({
            "k": k, "rev": np.int64(0),
            "ck": df["o_custkey"].astype("int64"),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def to_cust(df: pd.DataFrame) -> pd.DataFrame:
        rev = df[df["ck"] < 0].groupby("k", as_index=False)["rev"].sum()
        ords = df[df["ck"] >= 0][["k", "ck"]]
        m = rev.merge(ords, on="k", how="inner")
        g = m.groupby("ck", as_index=False)["rev"].sum()
        k = g["ck"].astype("int64")
        return pd.DataFrame({
            "k": k, "rev": g["rev"].astype("int64"),
            "nk": np.int64(-1), "bal": np.int64(0),
            "name": "",
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def c_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].astype("int64")
        return pd.DataFrame({
            "k": k, "rev": np.int64(0),
            "nk": df["c_nationkey"].astype("int64"),
            "bal": np.floor(100.0 * df["c_acctbal"]
                            .to_numpy("float64") + 0.5).astype("int64"),
            "name": df["c_name"].astype(str),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def topk_partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = df[df["nk"] < 0].groupby("k", as_index=False)["rev"].sum()
        cust = df[df["nk"] >= 0][["k", "nk", "bal", "name"]]
        m = rev.merge(cust, on="k", how="inner")
        m = m.sort_values(["rev", "k"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({
            "c_custkey": m["k"].astype("int64"),
            "c_name": m["name"].astype(str),
            "rev_q4": m["rev"].astype("int64"),
            "acctbal_cents": m["bal"].astype("int64"),
            "n_name": m["nk"].map(nation_map).astype(str)})

    cust_rev = (li.map_batches(li_partial, batch_format="pandas")
                .union(orders.map_batches(o_rows, batch_format="pandas"))
                .groupby("bucket").map_groups(to_cust,
                                              batch_format="pandas"))
    cand = (cust_rev
            .union(customer.map_batches(c_rows, batch_format="pandas"))
            .groupby("bucket").map_groups(topk_partial,
                                          batch_format="pandas")
            .to_pandas())
    return cand.sort_values(["rev_q4", "c_custkey"],
                            ascending=[False, True]).head(k) \
        .reset_index(drop=True)


def volume_shipping(sf_dir: str, num_partitions=None):
    """(supp_nation, cust_nation, l_year, revenue_q4) — TPC-H Q7
    shape: revenue shipped between two nations (supplier side vs
    customer side, both directions, excluding same-nation), by ship
    year. The nation pair is data-derived deterministically (the two
    smallest nation keys present in the supplier dimension — the SQL
    oracle derives the same pair); revenue in exact integer units
    cents·(100−disc%).

    Scale shape: the shipdate window pushes into the parquet read; the
    two-nation supplier subset (2/25 of a dimension table) is captured
    as sorted searchsorted arrays in the map closure — lineitems from
    other suppliers never enter the pipeline; revenue pre-aggregates
    per (orderkey, s_nation, year) in-batch (combiner) → hash(orderkey)
    co-group attaches custkey → re-combined per (custkey, …) →
    hash(custkey) co-group attaches the customer nation; the driver
    folds ≤ 2·2·|years| cells per bucket. Two all-to-alls total, both
    over combiner-shrunk rows.
    """
    import datetime

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    nt = pq.read_table("%s/nation.parquet" % sf_dir,
                       columns=["n_nationkey", "n_name"])
    nation_map = dict(zip(nt.column("n_nationkey").to_pylist(),
                          nt.column("n_name").to_pylist()))
    st = pq.read_table("%s/supplier.parquet" % sf_dir,
                       columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat_pair = sorted(set(st["s_nationkey"].astype(int)))[:2]
    NAT_A, NAT_B = nat_pair[0], nat_pair[-1]
    st = st[st["s_nationkey"].isin([NAT_A, NAT_B])] \
        .sort_values("s_suppkey")
    s_keys = st["s_suppkey"].to_numpy("int64")
    s_nats = st["s_nationkey"].to_numpy("int64")

    li = _bread(
        "%s/lineitem.parquet" % sf_dir,
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"],
        filter=((pc.field("l_shipdate")
                 >= datetime.datetime(1995, 1, 1))
                & (pc.field("l_shipdate")
                   < datetime.datetime(1997, 1, 1))))
    orders = _bread("%s/orders.parquet" % sf_dir,
                                   columns=["o_orderkey", "o_custkey"])
    customer = _bread(
        "%s/customer.parquet" % sf_dir,
        columns=["c_custkey", "c_nationkey"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        sk = df["l_suppkey"].to_numpy("int64")
        pos = np.searchsorted(s_keys, sk)
        pos = np.minimum(pos, len(s_keys) - 1)
        hit = s_keys[pos] == sk
        df = df[hit]
        snat = s_nats[pos[hit]]
        cents = np.floor(100.0 * df["l_extendedprice"]
                         .to_numpy("float64") + 0.5).astype("int64")
        disc = np.floor(100.0 * df["l_discount"].to_numpy("float64")
                        + 0.5).astype("int64")
        yr = (df["l_shipdate"].to_numpy()
              .astype("datetime64[Y]").astype("int64") + 1970)
        t = pd.DataFrame({"k": df["l_orderkey"].astype("int64"),
                          "snat": snat, "yr": yr,
                          "rev": cents * (100 - disc)})
        g = t.groupby(["k", "snat", "yr"], as_index=False)["rev"].sum()
        return pd.DataFrame({
            "k": g["k"].astype("int64"),
            "snat": g["snat"].astype("int64"),
            "yr": g["yr"].astype("int64"),
            "rev": g["rev"].astype("int64"), "ck": np.int64(-1),
            "bucket": (pd.util.hash_pandas_object(g["k"], index=False)
                       % nparts).astype("int32")})

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].astype("int64")
        return pd.DataFrame({
            "k": k, "snat": np.int64(0), "yr": np.int64(0),
            "rev": np.int64(0),
            "ck": df["o_custkey"].astype("int64"),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def to_cust(df: pd.DataFrame) -> pd.DataFrame:
        rev = df[df["ck"] < 0][["k", "snat", "yr", "rev"]]
        ords = df[df["ck"] >= 0][["k", "ck"]]
        m = rev.merge(ords, on="k", how="inner")
        g = m.groupby(["ck", "snat", "yr"], as_index=False)["rev"].sum()
        k = g["ck"].astype("int64")
        return pd.DataFrame({
            "k": k, "snat": g["snat"].astype("int64"),
            "yr": g["yr"].astype("int64"),
            "rev": g["rev"].astype("int64"), "cnat": np.int64(-1),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def c_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["c_nationkey"].isin([NAT_A, NAT_B])]
        k = df["c_custkey"].astype("int64")
        return pd.DataFrame({
            "k": k, "snat": np.int64(0), "yr": np.int64(0),
            "rev": np.int64(0),
            "cnat": df["c_nationkey"].astype("int64"),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def pair_cells(df: pd.DataFrame) -> pd.DataFrame:
        rev = df[df["cnat"] < 0][["k", "snat", "yr", "rev"]]
        cust = df[df["cnat"] >= 0][["k", "cnat"]]
        m = rev.merge(cust, on="k", how="inner")
        m = m[m["snat"] != m["cnat"]]
        g = m.groupby(["snat", "cnat", "yr"], as_index=False)["rev"] \
            .sum()
        return pd.DataFrame({
            "snat": g["snat"].astype("int64"),
            "cnat": g["cnat"].astype("int64"),
            "yr": g["yr"].astype("int64"),
            "rev": g["rev"].astype("int64")})

    cells = (li.map_batches(li_partial, batch_format="pandas")
             .union(orders.map_batches(o_rows, batch_format="pandas"))
             .groupby("bucket").map_groups(to_cust,
                                           batch_format="pandas")
             .union(customer.map_batches(c_rows, batch_format="pandas"))
             .groupby("bucket").map_groups(pair_cells,
                                           batch_format="pandas")
             .to_pandas())
    g = cells.groupby(["snat", "cnat", "yr"], as_index=False)["rev"] \
        .sum()
    return pd.DataFrame({
        "supp_nation": g["snat"].map(nation_map).astype(str),
        "cust_nation": g["cnat"].map(nation_map).astype(str),
        "l_year": g["yr"].astype("int64"),
        "revenue_q4": g["rev"].astype("int64")}) \
        .sort_values(["supp_nation", "cust_nation", "l_year"]) \
        .reset_index(drop=True)


def promo_part_suppliers(sf_dir: str, num_partitions=None):
    """(s_suppkey, s_name) — TPC-H Q20 shape: the per-group
    MAJORITY-CONTRIBUTOR semi-join. Suppliers who shipped more than
    a tenth of some PROMO-type part's total quantity (10·q > total in
    pure integers — parts spread across the supplier dimension make
    stricter majorities empty on this generator).

    Scale shape: lineitem pre-aggregates quantity per (partkey,
    suppkey) in-batch (combiner); part ships (partkey, is_promo)
    flags; ONE hash(partkey) co-group computes per-part totals and the
    majority test in place, emitting per-bucket DISTINCT suppkeys
    (bounded by the supplier dimension); the driver dedups the union
    and probes the supplier dimension for names.
    """
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    st = pq.read_table("%s/supplier.parquet" % sf_dir,
                       columns=["s_suppkey", "s_name"]).to_pandas()
    name_map = dict(zip(st["s_suppkey"].astype("int64"),
                        st["s_name"].astype(str)))

    li = _bread(
        "%s/lineitem.parquet" % sf_dir,
        columns=["l_partkey", "l_suppkey", "l_quantity"])
    part = _bread("%s/part.parquet" % sf_dir,
                                 columns=["p_partkey", "p_type"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({
            "k": df["l_partkey"].astype("int64"),
            "s": df["l_suppkey"].astype("int64"),
            "q": df["l_quantity"].to_numpy("float64").astype("int64")})
        g = t.groupby(["k", "s"], as_index=False)["q"].sum()
        return pd.DataFrame({
            "k": g["k"], "s": g["s"], "q": g["q"].astype("int64"),
            "bucket": (pd.util.hash_pandas_object(g["k"], index=False)
                       % nparts).astype("int32")})

    def p_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["p_partkey"].astype("int64")
        return pd.DataFrame({
            "k": k, "s": np.int64(-1),
            "q": (df["p_type"] == "PROMO").astype("int64"),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def cogroup(df: pd.DataFrame) -> pd.DataFrame:
        lq = df[df["s"] >= 0].groupby(["k", "s"],
                                      as_index=False)["q"].sum()
        promo = set(df.loc[(df["s"] < 0) & (df["q"] == 1), "k"]
                    .astype("int64"))
        tot = lq.groupby("k")["q"].sum()
        t = tot.reindex(lq["k"]).to_numpy("int64")
        win = lq[(10 * lq["q"].to_numpy("int64") > t)
                 & lq["k"].isin(promo)]
        return pd.DataFrame(
            {"s": np.unique(win["s"].to_numpy("int64"))})

    parts = (li.map_batches(li_partial, batch_format="pandas")
             .union(part.map_batches(p_rows, batch_format="pandas"))
             .groupby("bucket").map_groups(cogroup,
                                           batch_format="pandas")
             .to_pandas())
    sk = np.unique(parts["s"].to_numpy("int64")) if len(parts) else \
        np.array([], dtype="int64")
    return pd.DataFrame({
        "s_suppkey": sk,
        "s_name": pd.Series(sk).map(name_map).astype(str)})


def market_share(sf_dir: str, ptype: str = "ECONOMY",
                 num_partitions=None):
    """(o_year, total_q4, nation_q4, share_ppm) — TPC-H Q8 shape: the
    market share of one nation's suppliers within a region's customer
    orders for one part type, by order year. The nation is
    data-derived deterministically (smallest nation key in the
    supplier dimension — the SQL oracle derives the same), the region
    is that nation's own region. share_ppm = 1000000·nation_q4 //
    total_q4 stays in exact integer arithmetic (both engines truncate
    a non-negative quotient identically).

    Scale shape: the order-date window pushes into the orders read;
    the one-nation supplier subset (1/25 of a dimension) is a
    searchsorted closure flagging lineitems map-side (ray.put the
    arrays on a real cluster); three combiner-fed co-groups chain
    hash(partkey) → hash(orderkey) → hash(custkey), each over rows
    pre-shrunk by the previous reduce; the driver folds ≤ |years|
    cells per bucket. Every exchange row is fixed-width int64.
    """
    import datetime

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    st = pq.read_table("%s/supplier.parquet" % sf_dir,
                       columns=["s_suppkey", "s_nationkey"]).to_pandas()
    NAT = int(st["s_nationkey"].min())
    sub = st[st["s_nationkey"] == NAT].sort_values("s_suppkey")
    s_keys = sub["s_suppkey"].to_numpy("int64")
    nt = pq.read_table("%s/nation.parquet" % sf_dir,
                       columns=["n_nationkey", "n_regionkey"]).to_pandas()
    REG = int(nt.loc[nt["n_nationkey"] == NAT, "n_regionkey"].iloc[0])
    region_nations = set(
        nt.loc[nt["n_regionkey"] == REG, "n_nationkey"].astype(int))

    li = _bread(
        "%s/lineitem.parquet" % sf_dir,
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])
    part = _bread("%s/part.parquet" % sf_dir,
                                 columns=["p_partkey", "p_type"])
    orders = _bread(
        "%s/orders.parquet" % sf_dir,
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=((pc.field("o_orderdate")
                 >= datetime.datetime(1996, 1, 1))
                & (pc.field("o_orderdate")
                   < datetime.datetime(1998, 1, 1))))
    customer = _bread(
        "%s/customer.parquet" % sf_dir,
        columns=["c_custkey", "c_nationkey"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        sk = df["l_suppkey"].to_numpy("int64")
        pos = np.searchsorted(s_keys, sk)
        pos = np.minimum(pos, max(len(s_keys) - 1, 0))
        is_nat = (s_keys[pos] == sk) if len(s_keys) else \
            np.zeros(len(df), dtype=bool)
        cents = np.floor(100.0 * df["l_extendedprice"]
                         .to_numpy("float64") + 0.5).astype("int64")
        disc = np.floor(100.0 * df["l_discount"].to_numpy("float64")
                        + 0.5).astype("int64")
        rev = cents * (100 - disc)
        t = pd.DataFrame({"k": df["l_partkey"].astype("int64"),
                          "ok": df["l_orderkey"].astype("int64"),
                          "rev": rev,
                          "nrev": np.where(is_nat, rev, 0)})
        g = t.groupby(["k", "ok"], as_index=False)[["rev", "nrev"]] \
            .sum()
        g["bucket"] = (pd.util.hash_pandas_object(g["k"], index=False)
                       % nparts).astype("int32")
        return g

    def p_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["p_type"] == ptype]
        k = df["p_partkey"].astype("int64")
        return pd.DataFrame({
            "k": k, "ok": np.int64(-1), "rev": np.int64(0),
            "nrev": np.int64(0),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def to_orders(df: pd.DataFrame) -> pd.DataFrame:
        keep = set(df.loc[df["ok"] < 0, "k"].astype("int64"))
        li = df[df["ok"] >= 0]
        li = li[li["k"].isin(keep)]
        g = li.groupby("ok", as_index=False)[["rev", "nrev"]].sum()
        g = g.rename(columns={"ok": "k"})
        g["ck"] = np.int64(-1)
        g["yr"] = np.int64(0)
        g["bucket"] = (pd.util.hash_pandas_object(g["k"], index=False)
                       % nparts).astype("int32")
        return g[["k", "rev", "nrev", "ck", "yr", "bucket"]]

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].astype("int64")
        yr = (df["o_orderdate"].to_numpy()
              .astype("datetime64[Y]").astype("int64") + 1970)
        return pd.DataFrame({
            "k": k, "rev": np.int64(0), "nrev": np.int64(0),
            "ck": df["o_custkey"].astype("int64"), "yr": yr,
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def to_cust(df: pd.DataFrame) -> pd.DataFrame:
        rev = df[df["ck"] < 0][["k", "rev", "nrev"]]
        ords = df[df["ck"] >= 0][["k", "ck", "yr"]]
        m = rev.merge(ords, on="k", how="inner")
        g = m.groupby(["ck", "yr"], as_index=False)[["rev", "nrev"]] \
            .sum()
        g = g.rename(columns={"ck": "k"})
        g["flag"] = np.int64(0)
        g["bucket"] = (pd.util.hash_pandas_object(g["k"], index=False)
                       % nparts).astype("int32")
        return g[["k", "yr", "rev", "nrev", "flag", "bucket"]]

    def c_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["c_nationkey"].astype(int).isin(region_nations)]
        k = df["c_custkey"].astype("int64")
        return pd.DataFrame({
            "k": k, "yr": np.int64(0), "rev": np.int64(0),
            "nrev": np.int64(0), "flag": np.int64(1),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def year_cells(df: pd.DataFrame) -> pd.DataFrame:
        keep = set(df.loc[df["flag"] == 1, "k"].astype("int64"))
        rev = df[df["flag"] == 0]
        rev = rev[rev["k"].isin(keep)]
        g = rev.groupby("yr", as_index=False)[["rev", "nrev"]].sum()
        return g[["yr", "rev", "nrev"]]

    cells = (li.map_batches(li_partial, batch_format="pandas")
             .union(part.map_batches(p_rows, batch_format="pandas"))
             .groupby("bucket").map_groups(to_orders,
                                           batch_format="pandas")
             .union(orders.map_batches(o_rows, batch_format="pandas"))
             .groupby("bucket").map_groups(to_cust,
                                           batch_format="pandas")
             .union(customer.map_batches(c_rows, batch_format="pandas"))
             .groupby("bucket").map_groups(year_cells,
                                           batch_format="pandas")
             .to_pandas())
    g = cells.groupby("yr", as_index=False)[["rev", "nrev"]].sum()
    tot = g["rev"].to_numpy("int64")
    nat = g["nrev"].to_numpy("int64")
    # ppm ratio in Python bigints: 10^6·nation_q4 can overflow int64
    # at large scale factors (DuckDB's HUGEINT sum never does)
    ppm = [(1000000 * int(n)) // int(t) if t > 0 else 0
           for n, t in zip(nat, tot)]
    return pd.DataFrame({
        "o_year": g["yr"].astype("int64"),
        "total_q4": tot, "nation_q4": nat,
        "share_ppm": pd.Series(ppm, dtype="int64")}) \
        .sort_values("o_year").reset_index(drop=True)


def product_profit(sf_dir: str, name_sub: str = "gear",
                   num_partitions=None):
    """(n_name, o_year, profit_q4) — TPC-H Q9 shape: profit by the
    SUPPLIER's nation and order year over parts whose name contains a
    substring. This corpus has no partsupp table, so unit cost is the
    part's retail price (the same substitution on both engine and
    oracle sides): per line item profit_q4 = cents·(100−disc) −
    retail_cents·100·qty, an exact (possibly negative) int64.

    Scale shape: the supplier→nation map is a searchsorted closure
    (dimension-sized; ray.put on a real cluster); lineitem combines
    per (partkey, orderkey, nation) in-batch; hash(partkey) co-group
    attaches the name filter + retail cents; hash(orderkey) co-group
    attaches the order year; the driver folds ≤ 25·|years| cells per
    bucket. Two all-to-alls, both combiner-shrunk.
    """
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    st = pq.read_table("%s/supplier.parquet" % sf_dir,
                       columns=["s_suppkey", "s_nationkey"]).to_pandas()
    st = st.sort_values("s_suppkey")
    s_keys = st["s_suppkey"].to_numpy("int64")
    s_nats = st["s_nationkey"].to_numpy("int64")
    nt = pq.read_table("%s/nation.parquet" % sf_dir,
                       columns=["n_nationkey", "n_name"])
    nation_map = dict(zip(nt.column("n_nationkey").to_pylist(),
                          nt.column("n_name").to_pylist()))

    li = _bread(
        "%s/lineitem.parquet" % sf_dir,
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"])
    part = _bread(
        "%s/part.parquet" % sf_dir,
        columns=["p_partkey", "p_name", "p_retailprice"])
    orders = _bread(
        "%s/orders.parquet" % sf_dir,
        columns=["o_orderkey", "o_orderdate"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        sk = df["l_suppkey"].to_numpy("int64")
        pos = np.searchsorted(s_keys, sk)
        pos = np.minimum(pos, len(s_keys) - 1)
        snat = s_nats[pos]
        cents = np.floor(100.0 * df["l_extendedprice"]
                         .to_numpy("float64") + 0.5).astype("int64")
        disc = np.floor(100.0 * df["l_discount"].to_numpy("float64")
                        + 0.5).astype("int64")
        t = pd.DataFrame({
            "k": df["l_partkey"].astype("int64"),
            "ok": df["l_orderkey"].astype("int64"), "snat": snat,
            "rev": cents * (100 - disc),
            "qty": df["l_quantity"].to_numpy("float64")
            .astype("int64")})
        g = t.groupby(["k", "ok", "snat"], as_index=False)[
            ["rev", "qty"]].sum()
        g["retail"] = np.int64(-1)
        g["bucket"] = (pd.util.hash_pandas_object(g["k"], index=False)
                       % nparts).astype("int32")
        return g

    def p_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["p_name"].astype(str).str.contains(name_sub,
                                                      regex=False)]
        k = df["p_partkey"].astype("int64")
        retail = np.floor(100.0 * df["p_retailprice"]
                          .to_numpy("float64") + 0.5).astype("int64")
        return pd.DataFrame({
            "k": k, "ok": np.int64(-1), "snat": np.int64(0),
            "rev": np.int64(0), "qty": np.int64(0), "retail": retail,
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def to_orders(df: pd.DataFrame) -> pd.DataFrame:
        pr = df[df["retail"] >= 0][["k", "retail"]]
        li = df[df["retail"] < 0]
        m = li.merge(pr, left_on="k", right_on="k", how="inner",
                     suffixes=("", "_p"))
        profit = (m["rev"].to_numpy("int64")
                  - m["retail_p"].to_numpy("int64") * 100
                  * m["qty"].to_numpy("int64"))
        t = pd.DataFrame({"k": m["ok"].astype("int64"),
                          "snat": m["snat"].astype("int64"),
                          "profit": profit})
        g = t.groupby(["k", "snat"], as_index=False)["profit"].sum()
        g["yr"] = np.int64(-1)
        g["bucket"] = (pd.util.hash_pandas_object(g["k"], index=False)
                       % nparts).astype("int32")
        return g[["k", "snat", "profit", "yr", "bucket"]]

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].astype("int64")
        yr = (df["o_orderdate"].to_numpy()
              .astype("datetime64[Y]").astype("int64") + 1970)
        return pd.DataFrame({
            "k": k, "snat": np.int64(0), "profit": np.int64(0),
            "yr": yr,
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def nation_cells(df: pd.DataFrame) -> pd.DataFrame:
        pr = df[df["yr"] < 0][["k", "snat", "profit"]]
        ords = df[df["yr"] >= 0][["k", "yr"]]
        m = pr.merge(ords, on="k", how="inner")
        g = m.groupby(["snat", "yr"], as_index=False)["profit"].sum()
        return g[["snat", "yr", "profit"]]

    cells = (li.map_batches(li_partial, batch_format="pandas")
             .union(part.map_batches(p_rows, batch_format="pandas"))
             .groupby("bucket").map_groups(to_orders,
                                           batch_format="pandas")
             .union(orders.map_batches(o_rows, batch_format="pandas"))
             .groupby("bucket").map_groups(nation_cells,
                                           batch_format="pandas")
             .to_pandas())
    g = cells.groupby(["snat", "yr"], as_index=False)["profit"].sum()
    return pd.DataFrame({
        "n_name": g["snat"].map(nation_map).astype(str),
        "o_year": g["yr"].astype("int64"),
        "profit_q4": g["profit"].astype("int64")}) \
        .sort_values(["n_name", "o_year"]).reset_index(drop=True)


def brand_qty_revenue(sf_dir: str, num_partitions=None):
    """(revenue_q4,) — TPC-H Q19 shape: one scalar revenue over a
    DISJUNCTION of correlated part/lineitem predicate bands
    ((Brand#12, size 1-5, qty 1-11) OR (Brand#23, size 1-10, qty
    10-20) OR (Brand#34, size 1-15, qty 20-30)). The interesting part
    at scale is that the predicate couples a fact column (quantity)
    with dimension columns (brand, size), so neither side can be
    fully filtered before the join.

    Scale shape: quantities are integral and banded ≤ 30, so lineitem
    combines per (partkey, qty_int) in-batch — the exchange carries at
    most |part|·30 cells regardless of corpus size; part ships
    (partkey, band-class); ONE hash(partkey) co-group evaluates the
    disjunction vectorized and emits a per-bucket scalar.
    """
    import numpy as np
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    li = _bread(
        "%s/lineitem.parquet" % sf_dir,
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"])
    part = _bread(
        "%s/part.parquet" % sf_dir,
        columns=["p_partkey", "p_brand", "p_size"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        qty = df["l_quantity"].to_numpy("float64").astype("int64")
        keep = qty <= 30
        df, qty = df[keep], qty[keep]
        cents = np.floor(100.0 * df["l_extendedprice"]
                         .to_numpy("float64") + 0.5).astype("int64")
        disc = np.floor(100.0 * df["l_discount"].to_numpy("float64")
                        + 0.5).astype("int64")
        t = pd.DataFrame({"k": df["l_partkey"].astype("int64"),
                          "q": qty, "rev": cents * (100 - disc)})
        g = t.groupby(["k", "q"], as_index=False)["rev"].sum()
        g["cls"] = np.int64(-1)
        g["bucket"] = (pd.util.hash_pandas_object(g["k"], index=False)
                       % nparts).astype("int32")
        return g[["k", "q", "rev", "cls", "bucket"]]

    def p_rows(df: pd.DataFrame) -> pd.DataFrame:
        brand = df["p_brand"].astype(str)
        size = df["p_size"].to_numpy("int64")
        cls = np.select(
            [(brand == "Brand#12") & (size >= 1) & (size <= 5),
             (brand == "Brand#23") & (size >= 1) & (size <= 10),
             (brand == "Brand#34") & (size >= 1) & (size <= 15)],
            [1, 2, 3], default=0).astype("int64")
        df = df[cls > 0]
        k = df["p_partkey"].astype("int64")
        return pd.DataFrame({
            "k": k, "q": np.int64(0), "rev": np.int64(0),
            "cls": cls[cls > 0],
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def cogroup(df: pd.DataFrame) -> pd.DataFrame:
        pr = df[df["cls"] >= 0][["k", "cls"]]
        li = df[df["cls"] < 0][["k", "q", "rev"]]
        m = li.merge(pr, on="k", how="inner")
        q = m["q"].to_numpy("int64")
        cls = m["cls_y"].to_numpy("int64") if "cls_y" in m.columns \
            else m["cls"].to_numpy("int64")
        hit = (((cls == 1) & (q >= 1) & (q <= 11))
               | ((cls == 2) & (q >= 10) & (q <= 20))
               | ((cls == 3) & (q >= 20) & (q <= 30)))
        return pd.DataFrame({"rev": [int(m["rev"].to_numpy("int64")
                                         [hit].sum())]})

    parts = (li.map_batches(li_partial, batch_format="pandas")
             .union(part.map_batches(p_rows, batch_format="pandas"))
             .groupby("bucket").map_groups(cogroup,
                                           batch_format="pandas")
             .to_pandas())
    return pd.DataFrame({"revenue_q4": [int(parts["rev"].sum())]})


def integrity_audit(sf_dir: str, num_partitions=None):
    """(check, n_rows, n_bad) — the data-quality constraint audit run
    before any pipeline trusts a drop: PRIMARY-KEY uniqueness on every
    keyed table (n_bad = rows − distinct keys) and REFERENTIAL
    integrity on every foreign key (n_bad = child rows whose key has
    no parent). Green zeros are the contract the join operators in
    this module rely on (their searchsorted probes assume resolvable
    keys); the row totals pin that every table was actually scanned.

    Scale shape: ONE all-to-all serves all fourteen checks. Every
    scan emits per-batch DISTINCT (check, key) cells with counts (the
    combiner — the exchange carries key cells, never raw rows; parent
    sides ship bare keys), everything unions into one hash(check,
    key) co-group where PK duplicates fold as Σcnt − nunique and FK
    orphans as Σcnt over parentless keys; the driver folds one
    fixed-width partial row per (bucket, check).
    """
    import numpy as np
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    # (code, kind): kind pk=0 fk=1 — reduce needs to know the formula
    CHECKS = [
        ("pk_orders", 0), ("pk_customer", 1), ("pk_part", 2),
        ("pk_supplier", 3), ("pk_documents", 4), ("pk_events", 5),
        ("pk_embeddings", 6),
        ("fk_lineitem_orders", 7), ("fk_lineitem_part", 8),
        ("fk_lineitem_supplier", 9), ("fk_orders_customer", 10),
        ("fk_customer_nation", 11), ("fk_supplier_nation", 12),
        ("fk_nation_region", 13)]
    NAMES = {c: n for n, c in CHECKS}
    FK_CODES = frozenset(c for n, c in CHECKS if n.startswith("fk_"))

    def emitter(spec):
        """spec: list of (code, col, side) — one batch → distinct
        (chk, key) cells with counts (side 0) or bare parent keys
        (side 1, cnt 0)."""

        def fn(df: pd.DataFrame) -> pd.DataFrame:
            parts = []
            for code, col, side in spec:
                k = df[col].astype("int64")
                if side == 0:
                    vc = k.value_counts()
                    parts.append(pd.DataFrame({
                        "chk": np.int64(code),
                        "k": vc.index.astype("int64"),
                        "cnt": vc.to_numpy(dtype="int64"),
                        "side": np.int8(0)}))
                else:
                    u = np.unique(k.to_numpy("int64"))
                    parts.append(pd.DataFrame({
                        "chk": np.int64(code), "k": u,
                        "cnt": np.int64(0), "side": np.int8(1)}))
            out = pd.concat(parts, ignore_index=True)
            out["bucket"] = ((out["chk"] * 1000003
                              + pd.util.hash_pandas_object(
                                  out["k"], index=False).astype("int64"))
                             % nparts).astype("int32")
            return out

        return fn

    def scan(table, cols, spec):
        # bound the block count per source: a ten-way union of
        # default-split reads hands the sort ~650 tiny blocks and the
        # exchange drowns in per-block orchestration (measured 47.6 s
        # → 5.7 s at sf0.1/32 by sizing blocks to ≥ ~64k rows, capped
        # at 4·CPUs so a huge table still streams)
        import pyarrow.parquet as pq

        path = "%s/%s.parquet" % (sf_dir, table)
        rows = pq.read_metadata(path).num_rows
        blocks = max(1, min(4 * nparts, rows // 65536 + 1))
        ds = _bread(path, columns=cols,
                                   override_num_blocks=blocks)
        return ds.map_batches(emitter(spec), batch_format="pandas")

    srcs = [
        scan("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"],
             [(7, "l_orderkey", 0), (8, "l_partkey", 0),
              (9, "l_suppkey", 0)]),
        scan("orders", ["o_orderkey", "o_custkey"],
             [(0, "o_orderkey", 0), (10, "o_custkey", 0),
              (7, "o_orderkey", 1)]),
        scan("customer", ["c_custkey", "c_nationkey"],
             [(1, "c_custkey", 0), (11, "c_nationkey", 0),
              (10, "c_custkey", 1)]),
        scan("part", ["p_partkey"],
             [(2, "p_partkey", 0), (8, "p_partkey", 1)]),
        scan("supplier", ["s_suppkey", "s_nationkey"],
             [(3, "s_suppkey", 0), (12, "s_nationkey", 0),
              (9, "s_suppkey", 1)]),
        scan("nation", ["n_nationkey", "n_regionkey"],
             [(13, "n_regionkey", 0), (11, "n_nationkey", 1),
              (12, "n_nationkey", 1)]),
        scan("region", ["r_regionkey"], [(13, "r_regionkey", 1)]),
        scan("documents", ["doc_id"], [(4, "doc_id", 0)]),
        scan("events", ["event_id"], [(5, "event_id", 0)]),
        scan("embeddings", ["vec_id"], [(6, "vec_id", 0)]),
    ]
    ds = srcs[0]
    for s in srcs[1:]:
        ds = ds.union(s)

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for chk, g in df.groupby("chk", sort=False):
            child = g[g["side"] == 0]
            # a key's cells from different batches all hash here, so
            # per-bucket distinct/parent lookups are globally correct
            n = int(child["cnt"].sum())
            if int(chk) in FK_CODES:
                parents = set(g.loc[g["side"] == 1, "k"]
                              .to_numpy("int64"))
                cg = child.groupby("k")["cnt"].sum()
                bad = int(cg[~cg.index.isin(parents)].sum())
            else:
                bad = n - int(child["k"].nunique())
            rows.append((int(chk), n, bad))
        return pd.DataFrame(rows, columns=["chk", "rows", "bad"]) \
            .astype("int64")

    parts = (ds.groupby("bucket")
             .map_groups(reduce_bucket, batch_format="pandas")
             .to_pandas())
    g = parts.groupby("chk", as_index=False)[["rows", "bad"]].sum()
    return pd.DataFrame({
        "check": g["chk"].map(NAMES).astype(str),
        "n_rows": g["rows"].astype("int64"),
        "n_bad": g["bad"].astype("int64")}) \
        .sort_values("check").reset_index(drop=True)


def item_similarity(sf_dir: str, min_cooc: int = 2,
                    num_partitions=None):
    """(part_a, part_b, n_a, n_b, n_ab, cos2_q) — item–item
    co-occurrence cosine over order baskets (the classic
    collaborative-filtering similarity: cos(i,j) =
    n_ij/√(n_i·n_j) on the binary order×part matrix). cos² is
    emitted instead of cos so everything stays rational:
    cos2_q = 10¹²·n_ab² // (n_a·n_b) in exact (big)integers.

    Scale shape: distinct (order, part) pairs combine in-batch; ONE
    hash(order) co-group holds each complete basket, so pair
    expansion is bounded by C(basket, 2) per order AND the per-part
    distinct-order counts fall out of the same exchange (orders
    partition across buckets, so bucket counts sum exactly); pair
    partials then settle in a hash(pair) exchange. The part-count
    table is dimension-bounded and broadcasts into the final reduce.
    """
    import numpy as np
    import ray
    import ray.data

    nparts = num_partitions or max(
        4, int(ray.cluster_resources().get("CPU", 8)))

    li = _bread("%s/lineitem.parquet" % sf_dir,
                               columns=["l_orderkey", "l_partkey"])

    def distinct_op(df: pd.DataFrame) -> pd.DataFrame:
        t = df[["l_orderkey", "l_partkey"]].drop_duplicates()
        o = t["l_orderkey"].astype("int64")
        return pd.DataFrame({
            "o": o, "p": t["l_partkey"].astype("int64"),
            "bucket": (pd.util.hash_pandas_object(o, index=False)
                       % nparts).astype("int32")})

    def baskets(df: pd.DataFrame) -> pd.DataFrame:
        # all copies of an order land here → exact distinct baskets
        t = df[["o", "p"]].drop_duplicates()
        pas, pbs, ns = [], [], []
        for _, g in t.groupby("o", sort=False):
            items = np.sort(g["p"].to_numpy("int64"))
            if len(items) > 1:
                iu, iw = np.triu_indices(len(items), k=1)
                pas.append(items[iu]); pbs.append(items[iw])
        if pas:
            pairs = pd.DataFrame({"pa": np.concatenate(pas),
                                  "pb": np.concatenate(pbs)})
            pg = pairs.groupby(["pa", "pb"]).size().reset_index(
                name="n")
        else:
            pg = pd.DataFrame({"pa": pd.Series([], dtype="int64"),
                               "pb": pd.Series([], dtype="int64"),
                               "n": pd.Series([], dtype="int64")})
        # per-part distinct-order partials ride along (pb = -1)
        pc = t.groupby("p").size().reset_index(name="n")
        pc = pd.DataFrame({"pa": pc["p"].astype("int64"),
                           "pb": np.int64(-1),
                           "n": pc["n"].astype("int64")})
        out = pd.concat([pg, pc], ignore_index=True)
        out["bucket"] = ((pd.util.hash_pandas_object(out["pa"],
                                                     index=False) * 31
                          + pd.util.hash_pandas_object(out["pb"],
                                                       index=False))
                         % nparts).astype("int32")
        return out.astype({"pa": "int64", "pb": "int64", "n": "int64",
                           "bucket": "int32"})

    # the per-part count partials: dimension-bounded, folded driver-side
    exchanged = (li.map_batches(distinct_op, batch_format="pandas")
                 .groupby("bucket").map_groups(baskets,
                                               batch_format="pandas")
                 .materialize())
    counts = (exchanged.map_batches(
        lambda df: df[df["pb"] == -1][["pa", "n"]],
        batch_format="pandas")
        .to_pandas().groupby("pa")["n"].sum())
    cmap = {int(k): int(v) for k, v in counts.items()}
    cref = ray.put(cmap)

    def reduce_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["pb"] >= 0]
        g = df.groupby(["pa", "pb"], as_index=False)["n"].sum()
        g = g[g["n"] >= min_cooc]
        cm = ray.get(cref)
        na = [cm[int(x)] for x in g["pa"]]
        nb = [cm[int(x)] for x in g["pb"]]
        cos2 = [(10**12 * int(n) * int(n)) // (int(x) * int(y))
                for n, x, y in zip(g["n"], na, nb)]
        return pd.DataFrame({
            "part_a": g["pa"].astype("int64"),
            "part_b": g["pb"].astype("int64"),
            "n_a": pd.Series(na, dtype="int64", index=g.index),
            "n_b": pd.Series(nb, dtype="int64", index=g.index),
            "n_ab": g["n"].astype("int64"),
            "cos2_q": pd.Series(cos2, dtype="int64", index=g.index)})

    out = (exchanged.groupby("bucket")
           .map_groups(reduce_pairs, batch_format="pandas")
           .to_pandas())
    return out.sort_values(["part_a", "part_b"]).reset_index(drop=True)


def benford_digits(sf_dir: str):
    """(digit, n, expected_q6, dev_ppm) — BENFORD'S-LAW leading-digit
    audit of ``o_totalprice`` (the classic forensic data-quality test:
    naturally-occurring monetary amounts follow P(d) = log₁₀(1+1/d);
    fabricated or truncated columns don't): counts per leading digit
    of the exact integer cents, expected count = floor(10⁶·N·ln((d+1)/
    d)/ln(10)) with both lns the shared libm call over correctly-
    rounded IEEE divisions (the float-portability contract), and
    dev_ppm the integer deviation 10⁶·(10⁶·n − expected_q6) //
    (10⁶·N).

    Scale shape: a 9-cell per-batch digit-count combiner — leading
    digit via integer-to-string (portable in both engines) — folded
    driver-side; one map-only pass, zero all-to-alls.
    """
    import math

    from .readers import bounded_read_parquet

    ds = bounded_read_parquet("%s/orders.parquet" % sf_dir,
                              columns=["o_totalprice"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(100.0 * df["o_totalprice"].to_numpy(
            dtype="float64")).astype("int64")
        d = pd.Series(cents).astype(str).str[0].astype("int64")
        vc = d.value_counts()
        return pd.DataFrame({"digit": vc.index.astype("int64"),
                             "n": vc.to_numpy(dtype="int64")})

    h = (ds.map_batches(cells, batch_format="pandas").to_pandas()
         .groupby("digit", as_index=False)["n"].sum())
    total = int(h["n"].sum())
    assert 10**6 * total < (1 << 53), "rescale before the float fold"
    counts = {int(d): int(n) for d, n in zip(h["digit"], h["n"])}
    rows = []
    for d in range(1, 10):
        n = counts.get(d, 0)
        exp_q6 = math.floor((1000000.0 * total)
                            * (math.log((d + 1.0) / d)
                               / math.log(10.0)))
        num = 10**6 * (10**6 * n - exp_q6)
        den = 10**6 * total
        # DuckDB // truncates toward zero; Python floors — mirror trunc
        dev = -((-num) // den) if num < 0 else num // den
        rows.append((d, n, exp_q6, dev))
    return pd.DataFrame(rows, columns=["digit", "n", "expected_q6",
                                       "dev_ppm"]).astype("int64")


def bloom_semijoin(sf_dir: str, segment: str = "BUILDING",
                   m_bits: int = 4096, n_hashes: int = 2):
    """(n_orders, n_pass_bloom, n_true_match, n_false_positive) — the
    BLOOM SEMI-JOIN REDUCTION (Bloomjoin, Mackert & Lohman 1986): the
    small side (custkeys of the '%(seg)s' market segment) compresses
    to an ``m_bits``-bit Bloom filter shipped once; the big side
    (orders) is pruned map-side BEFORE any join shuffle would run —
    the classic trick that turns a distributed join's all-to-all into
    a broadcast + a filtered (much smaller) exchange. Emits the exact
    pruning ledger: bloom-pass count, true matches, and the filter's
    false positives (counted against the real key set, so the
    precision of the reduction is itself oracle-checked — Bloom
    guarantees NO false negatives, pinned by test).

    Scale shape: one dimension-side scan builds the filter (tiny),
    one map-only pass over orders with a 4-int per-batch combiner;
    zero all-to-alls.
    """ % {"seg": segment}
    import ray

    from .readers import bounded_read_parquet as _bread
    from .traindata import _bcast_get, _md5_u64

    cust = _bread("%s/customer.parquet" % sf_dir,
                  columns=["c_custkey", "c_mktsegment"]).to_pandas()
    keys = set(int(k) for k, s in zip(cust["c_custkey"],
                                      cust["c_mktsegment"])
               if s == segment)
    bits = np.zeros(m_bits, dtype=bool)
    for k in keys:
        for h in range(n_hashes):
            bits[_md5_u64("%d:ck%d" % (h, k)) % m_bits] = True
    ref = ray.put((np.packbits(bits), frozenset(keys)))

    orders = _bread("%s/orders.parquet" % sf_dir, columns=["o_custkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        packed, true_keys = _bcast_get(ref)
        b = np.unpackbits(packed).astype(bool)
        n = len(df)
        npass = ntrue = nfp = 0
        for ck in df["o_custkey"].astype("int64"):
            ck = int(ck)
            hit = all(b[_md5_u64("%d:ck%d" % (h, ck)) % m_bits]
                      for h in range(n_hashes))
            if hit:
                npass += 1
                if ck in true_keys:
                    ntrue += 1
                else:
                    nfp += 1
        return pd.DataFrame([(n, npass, ntrue, nfp)],
                            columns=["n_orders", "n_pass_bloom",
                                     "n_true_match",
                                     "n_false_positive"])

    p = orders.map_batches(partial, batch_format="pandas").to_pandas()
    return pd.DataFrame([p.sum().tolist()],
                        columns=list(p.columns)).astype("int64")


def coordinated_sample(sf_dir: str, mod: int = 20):
    """(n_orders, n_lineitems, n_joined, revenue_cents) — COORDINATED
    (join-preserving) sampling across tables (the join-synopsis
    principle, Gibbons et al.): orders AND lineitems are both sampled
    by the SAME key-hash rule md5(orderkey) % mod == 0, so the join
    of the samples IS the sample of the join — every sampled
    lineitem's order is present (referential completeness, pinned by
    test), unlike independent per-table Bernoulli sampling where a
    1/20 × 1/20 join survives at 1/400 and is referentially broken.
    The debugging/estimation substrate for 100 TB pipelines: run the
    full query shape on 5% of the join graph.

    Scale shape: two map-only hash-filtered scans (the sample rule
    needs no coordination beyond the shared hash), one combiner-fed
    orderkey co-group for the join counts; revenue exact cents.
    """
    import ray

    from .readers import bounded_read_parquet as _bread
    from .traindata import _md5_u64

    nparts = max(4, int(ray.cluster_resources().get("CPU", 8)))

    def keep(keys) -> np.ndarray:
        return np.array([_md5_u64("ok%d" % int(k)) % mod == 0
                         for k in keys], dtype=bool)

    orders = _bread("%s/orders.parquet" % sf_dir,
                    columns=["o_orderkey"])
    line = _bread("%s/lineitem.parquet" % sf_dir,
                  columns=["l_orderkey", "l_extendedprice"])

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].astype("int64")[keep(df["o_orderkey"])]
        out = pd.DataFrame({"k": k.to_numpy("int64"),
                            "n_l": np.int64(0),
                            "cents": np.int64(0),
                            "side": np.int8(0)})
        out["bucket"] = (pd.util.hash_pandas_object(
            out["k"], index=False) % nparts).astype("int32")
        return out

    def l_rows(df: pd.DataFrame) -> pd.DataFrame:
        m = keep(df["l_orderkey"])
        d = df[m]
        cents = np.floor(d["l_extendedprice"].to_numpy("float64")
                         * 100 + 0.5).astype("int64")
        g = pd.DataFrame({"k": d["l_orderkey"].to_numpy("int64"),
                          "cents": cents}) \
            .groupby("k", as_index=False).agg(
                n_l=("cents", "size"), cents=("cents", "sum"))
        out = pd.DataFrame({"k": g["k"].astype("int64"),
                            "n_l": g["n_l"].astype("int64"),
                            "cents": g["cents"].astype("int64"),
                            "side": np.int8(1)})
        out["bucket"] = (pd.util.hash_pandas_object(
            out["k"], index=False) % nparts).astype("int32")
        return out

    u = orders.map_batches(o_rows, batch_format="pandas").union(
        line.map_batches(l_rows, batch_format="pandas"))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["side"] == 0]["k"].drop_duplicates()
        l = df[df["side"] == 1].groupby("k", as_index=False) \
            .agg(n_l=("n_l", "sum"), cents=("cents", "sum"))
        joined = l[l["k"].isin(set(o))]
        return pd.DataFrame([(
            len(o), int(l["n_l"].sum()), int(joined["n_l"].sum()),
            int(joined["cents"].sum()))],
            columns=["n_orders", "n_lineitems", "n_joined",
                     "revenue_cents"])

    p = (u.groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas())
    return pd.DataFrame([p.sum().tolist()],
                        columns=list(p.columns)).astype("int64")
