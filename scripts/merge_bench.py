"""Incremental-update bench: delta ingest + merge vs full rebuild.

The merge's scale claim (exchange.merge_canonical_graphs) is that a
standing graph absorbs a new crawl batch WITHOUT being reshuffled: the
base shards are read partition-local by the merge tasks and only the
delta crosses the object store. This script measures that claim at
headline scale — build a base graph from (1-f) of the corpus, then time
  (a) ingesting the remaining f as a delta run + merging it in, vs
  (b) rebuilding the full graph from scratch —
and verifies the merged output is row-identical to the rebuild.

At a real 100 TB base the gap widens with base size (rebuild is O(base +
delta), incremental is O(delta + base-rewrite-local); the base is never
range-exchanged again). Prints one JSON line.

Usage: python scripts/merge_bench.py [--pages 400000] [--delta-frac 0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=400000)
    ap.add_argument("--delta-frac", type=float, default=0.1)
    ap.add_argument("--keep-key", action="store_true",
                    help="persist tkey in the base shards so the merge "
                    "skips the per-shard re-key pass")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)

    from bench import ensure_corpus
    from kgx.config import PipelineConfig
    from kgx.exchange import merge_canonical_graphs, write_canonical_graph

    corpus = ensure_corpus(args.pages)
    files = sorted(os.path.join(corpus, f) for f in os.listdir(corpus)
                   if f.endswith(".parquet"))
    n_delta = max(1, int(len(files) * args.delta_frac))
    base_files, delta_files = files[:-n_delta], files[-n_delta:]
    cfg = PipelineConfig(include_altlabels=True)

    root = "/tmp/kgx_merge_bench"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    p = lambda name: os.path.join(root, name)  # noqa: E731

    t0 = time.time()
    base_man = write_canonical_graph(base_files, p("base"), cfg,
                                     keep_key=args.keep_key)
    t_base = time.time() - t0

    t0 = time.time()
    write_canonical_graph(delta_files, p("delta"), cfg)
    merged_man = merge_canonical_graphs(p("base"), p("delta"), p("merged"))
    t_incremental = time.time() - t0

    t0 = time.time()
    full_man = write_canonical_graph(files, p("full"), cfg)
    t_rebuild = time.time() - t0

    assert merged_man["rows"] == full_man["rows"], (
        "merge diverged from rebuild: %d vs %d"
        % (merged_man["rows"], full_man["rows"]))

    print(json.dumps({
        "metric": "incremental_update_vs_rebuild",
        "pages": args.pages,
        "delta_frac": args.delta_frac,
        "base_rows": base_man["rows"],
        "merged_rows": merged_man["rows"],
        "base_build_sec": round(t_base, 2),
        "incremental_sec": round(t_incremental, 2),
        "rebuild_sec": round(t_rebuild, 2),
        "speedup": round(t_rebuild / t_incremental, 2),
        "keep_key": args.keep_key,
        "copied_parts": merged_man.get("copied_parts", 0),
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
