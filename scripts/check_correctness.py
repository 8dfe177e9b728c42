"""Local mirror of the driver's correctness gate: run each queries() entry
and its oracle_sql() on the same sf dir, compare row count, column names and
an order-insensitive value hash.

Usage: python scripts/check_correctness.py [sf_dir] [query_name ...]
(with query names given, only those queries run)
"""

import hashlib
import sys

import duckdb
import pandas as pd


def to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    return pd.DataFrame(result)


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    rows = sorted(
        tuple("NULL" if pd.isna(v) else str(v) for v in row)
        for row in df.itertuples(index=False)
    )
    h = hashlib.sha256()
    for row in rows:
        h.update("\x1f".join(row).encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        unknown = only - set(qs)
        if unknown:
            raise SystemExit("unknown queries: %s" % sorted(unknown))
        qs = {k: v for k, v in qs.items() if k in only}

    con = duckdb.connect()
    for table in ["region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            "CREATE VIEW %s AS SELECT * FROM '%s/%s.parquet'" % (table, sf_dir, table))

    failures = 0
    for name, fn in qs.items():
        ours = to_df(fn(sf_dir))
        if name not in oracles:
            print("%-24s rows=%-8d (rows-only check, no oracle)" % (name, len(ours)))
            continue
        theirs = con.execute(oracles[name]).df()
        ok_rows = len(ours) == len(theirs)
        ok_cols = sorted(ours.columns) == sorted(theirs.columns)
        ok_hash = ok_cols and value_hash(ours) == value_hash(theirs)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print("%-24s rows=%d/%d cols=%s hash=%s → %s" % (
            name, len(ours), len(theirs), ok_cols, ok_hash, status))
        if not ok_hash and ok_cols:
            merged = ours.merge(theirs, how="outer", indicator=True)
            diff = merged[merged["_merge"] != "both"]
            print(diff.head(6).to_string())
    print("FAILURES:", failures)
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
