"""Relational aggregates over the TPC-H-ish tables — evidence that the
engine's groupby/aggregate machinery handles ordinary warehouse shapes,
with partial aggregation (combiner) before the shuffle.
"""

from __future__ import annotations

import pandas as pd


def lineitem_summary(sf_dir: str):
    """Pricing-summary-style aggregate (counts + date bounds + integral
    quantity sum) grouped by returnflag/linestatus."""
    import ray.data

    ds = ray.data.read_parquet(
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

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False).agg(
            n_rows=("n_rows", "sum"),
            sum_qty=("sum_qty", "sum"),
            min_ship=("min_ship", "min"),
            max_ship=("max_ship", "max"),
        )
        g["min_ship"] = g["min_ship"].dt.strftime("%Y-%m-%d")
        g["max_ship"] = g["max_ship"].dt.strftime("%Y-%m-%d")
        return g

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby(keys).map_groups(merge, batch_format="pandas")


def orders_by_customer_nation(sf_dir: str):
    """orders ⋈ customer ⋈ nation → orders per nation. The small side is
    the join output of two dimension tables; the fact join is a hash join
    (Dataset.join)."""
    import ray.data

    orders = ray.data.read_parquet("%s/orders.parquet" % sf_dir,
                                   columns=["o_orderkey", "o_custkey"])
    customer = ray.data.read_parquet("%s/customer.parquet" % sf_dir,
                                     columns=["c_custkey", "c_nationkey"])
    nation = ray.data.read_parquet("%s/nation.parquet" % sf_dir,
                                   columns=["n_nationkey", "n_name"])

    import ray

    nparts = max(2, min(8, int(ray.cluster_resources().get("CPU", 8)) // 2))
    joined = orders.join(customer, join_type="inner", num_partitions=nparts,
                         on=("o_custkey",), right_on=("c_custkey",))
    joined = joined.join(nation, join_type="inner", num_partitions=nparts,
                         on=("c_nationkey",), right_on=("n_nationkey",))
    out = joined.groupby("n_name").count()
    return out.map_batches(lambda df: df.rename(columns={"count()": "n_orders"}),
                           batch_format="pandas")
