"""Full map-chain host probe: the no-Ray comparator for the exchange's
map-wave scaling (the round-4 attribution, now a saved script).

``scaling_probe.py`` measures only the cache-hot extract+link kernel —
its workers re-parse one small in-memory batch, so it reports the
host's CPU ceiling, not the streaming ceiling. The map wave actually
STREAMS distinct pages: parquet read → fused extract+link → tkey
formation, all DRAM-bandwidth-bound. This probe runs that full chain
over equal per-worker file shards (weak scaling) with a pre-warmed
spawn pool and reports per-task mean/max seconds at two worker counts.
Compare its efficiency against the Ray map wave (manifest
``phase_sec.map_wave``): if the two agree, the 8→32 loss is the host,
not the engine.

Usage: python scripts/map_chain_probe.py [--workers 8,32]
       [--files-per-worker 4] [--corpus /tmp/kgx_corpus_v3_1200000]
"""

from __future__ import annotations

import argparse
import glob
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _warm(_):
    import pyarrow  # noqa: F401

    from kgx.pipeline import _FusedExtractLink  # noqa: F401

    return os.getpid()


def _task(files):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgx.canonicalize import _add_tkey_arrow
    from kgx.config import PipelineConfig
    from kgx.pipeline import _FusedExtractLink

    cfg = PipelineConfig(include_altlabels=True)
    fn = _FusedExtractLink(cfg)
    t0 = time.time()
    rows = 0
    for f in files:
        batch = pq.read_table(f, columns=["url", "html"])
        triples = fn(batch)
        keyed = _add_tkey_arrow(triples)
        rows += keyed.num_rows
    return rows, time.time() - t0


def measure(nworkers: int, files: list, per_worker: int):
    shards = [files[(i * per_worker) % len(files):][:per_worker]
              for i in range(nworkers)]
    with mp.get_context("spawn").Pool(nworkers) as pool:
        pool.map(_warm, range(nworkers))  # absorb import/startup cost
        t0 = time.time()
        res = pool.map(_task, shards)
        wall = time.time() - t0
    secs = [r[1] for r in res]
    rows = sum(r[0] for r in res)
    return {"wall": wall, "task_avg": sum(secs) / len(secs),
            "task_max": max(secs), "rows": rows,
            "rows_per_sec": rows / wall}


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--workers", default="8,32")
    parser.add_argument("--files-per-worker", type=int, default=4)
    parser.add_argument("--corpus",
                        default="/tmp/kgx_corpus_v3_1200000")
    args = parser.parse_args()
    files = sorted(glob.glob(os.path.join(args.corpus, "*.parquet")))
    if not files:
        print("no corpus at %s — run bench.py once to generate it"
              % args.corpus)
        return 1
    lo, hi = (int(x) for x in args.workers.split(","))
    out = {}
    for n in (lo, hi):
        m = measure(n, files, args.files_per_worker)
        out[n] = m
        print("workers=%d  wall=%.2fs  task_avg=%.2fs  task_max=%.2fs"
              "  rows/s=%.0f" % (n, m["wall"], m["task_avg"],
                                 m["task_max"], m["rows_per_sec"]),
              flush=True)
    # weak scaling: per-worker work is constant, so efficiency is the
    # ratio of aggregate throughputs over the ratio of worker counts
    eff = (out[hi]["rows_per_sec"] / out[lo]["rows_per_sec"]) / (hi / lo)
    print("host_map_chain_efficiency_%d_to_%d = %.3f" % (lo, hi, eff))
    print("per_task_degradation = +%.0f%%"
          % (100 * (out[hi]["task_avg"] / out[lo]["task_avg"] - 1)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
