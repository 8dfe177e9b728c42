"""Shared parquet reader with a BOUNDED block count.

Ray's default read splitting targets parallelism, not block weight: a
small-SF table fans into dozens-to-hundreds of tiny blocks, and every
union → co-group exchange downstream pays per-block sort orchestration
that dwarfs the actual work (measured 47.6 s → 5.7 s on the 10-way
integrity_audit union, 14 s → 1.3 s on market_share, 3-4× across the
events ops at sf0.1/32). Sizing blocks to ≥ ~64k rows (from parquet
metadata, one driver-side footer read) and capping at 4·cluster-CPUs
keeps huge tables streaming while small ones stop shattering.

Directory / multi-file paths fall through to Ray's defaults (their
block counts already track file layout).
"""

from __future__ import annotations

import os


def bounded_read_parquet(path, min_blocks=None, **kw):
    """``min_blocks``: floor on the block count for COMPUTE-heavy
    per-row stages (shingling, minhash, edit-distance, codec work) —
    a 5k-row documents table otherwise lands in ONE block and the
    whole stage runs serially (adamic_adar measured 3.6 → 12.6 s when
    that happened). Pass "cpu" to floor at 2·cluster-CPUs (capped by
    the row count so tiny tables don't shatter); cheap columnar
    exchanges keep the default row-weight-only bound."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    if ("override_num_blocks" not in kw and isinstance(path, str)
            and os.path.isfile(path)):
        rows = pq.read_metadata(path).num_rows
        ncpu = max(4, int(ray.cluster_resources().get("CPU", 8)))
        blocks = max(1, min(4 * ncpu, rows // 65536 + 1))
        if min_blocks == "cpu":
            blocks = max(blocks, min(2 * ncpu, max(1, rows // 16)))
        kw["override_num_blocks"] = blocks
    return ray.data.read_parquet(path, **kw)


def compute_heavy_read_parquet(path, **kw):
    """bounded_read_parquet with the 2·CPU block floor — the default
    reader for modules whose per-row UDF work dominates."""
    return bounded_read_parquet(path, min_blocks="cpu", **kw)


def range_pruned_read(path, col: str, lo, hi, columns=None):
    """ZONE-MAP (row-group min/max statistics) pruned range scan over
    one file, a directory, or a file list: plan from footer METADATA
    only — a row group is touched iff its [min, max] zone for ``col``
    intersects [lo, hi] — then read each touched file in its own task
    and apply the exact residual filter, so pruning changes which
    bytes are read, never the answer. Layouts sorted or
    range-partitioned on ``col`` (sources.zonemap_pruned_read's
    writer) prune to a tiny fraction; unsorted layouts degrade to a
    full scan, never to a wrong answer; row groups whose footers lack
    statistics for ``col`` are read whole (conservative).

    ``columns`` — projection of the returned Dataset; ``col`` is read
    additionally when needed for the residual filter and dropped
    afterwards. The most recent plan is exposed as
    ``range_pruned_read.last_plan = ([(file, group), ...], total)``
    for minimality assertions.
    """
    import pyarrow.parquet as pq
    import ray.data

    if isinstance(path, str):
        if os.path.isdir(path):
            files = sorted(os.path.join(path, f)
                           for f in os.listdir(path)
                           if f.endswith(".parquet"))
        else:
            files = [path]
    else:
        files = sorted(path)

    touched, total = [], 0
    for fp in files:
        md = pq.read_metadata(fp)
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            st = None
            for c in range(rg.num_columns):
                cc = rg.column(c)
                if cc.path_in_schema == col:
                    st = cc.statistics
                    break
            total += 1
            if st is None or st.min is None or st.max is None:
                touched.append((fp, g))  # no stats → conservative
            elif st.min <= hi and st.max >= lo:
                touched.append((fp, g))
    range_pruned_read.last_plan = (touched, total)

    read_cols = None
    if columns is not None:
        read_cols = list(columns) + ([col] if col not in columns else [])

    if not touched:
        schema = pq.read_schema(files[0]) if files else None
        if schema is None:
            raise ValueError("range_pruned_read: no parquet files "
                             "under %r" % (path,))
        import pyarrow as pa

        empty = pa.table(
            {f.name: pa.array([], f.type)
             for f in schema
             if columns is None or f.name in columns})
        return ray.data.from_arrow(empty)

    plan: dict = {}
    for fp, g in touched:
        plan.setdefault(fp, []).append(g)
    items = [{"file": fp, "groups": gs} for fp, gs in sorted(plan.items())]

    def read_groups(batch):
        import pandas as pd

        outs = []
        for fp, groups in zip(batch["file"], batch["groups"]):
            f = pq.ParquetFile(fp)
            t = f.read_row_groups([int(g) for g in groups],
                                  columns=read_cols).to_pandas()
            t = t[(t[col] >= lo) & (t[col] <= hi)]
            if columns is not None:
                t = t[list(columns)]
            outs.append(t)
        return pd.concat(outs, ignore_index=True)

    return ray.data.from_items(
        items, override_num_blocks=len(items)).map_batches(
        read_groups, batch_format="pandas")
