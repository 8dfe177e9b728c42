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
