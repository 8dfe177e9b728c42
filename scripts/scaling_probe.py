"""Host-scaling probe: separates engine scaling from host scaling.

Runs the pure extract+link kernel (no Ray — plain multiprocessing) on the
same synthetic pages at two worker counts and reports aggregate pages/s
at each plus the scaling efficiency. If THIS number is below the 0.8 bar,
the 8→32 gap measured through Ray is a property of the host (shared
memory bandwidth / virtualized CPU), not of the engine's orchestration —
on a real 4× multi-node cluster each node brings its own memory
controllers and object store, so the single-node pair under-reports.

Usage: python scripts/scaling_probe.py [--workers 8,32] [--pages-per-worker 15000]
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(args):
    """Parse+link a fixed batch of pages repeatedly; return (pages, secs)."""
    pages, seconds = args
    import pandas as pd
    import pyarrow as pa

    from kgx.config import PipelineConfig
    from kgx.pages import _synthetic_batch
    from kgx.pipeline import _FusedExtractLink

    cfg = PipelineConfig(include_altlabels=True, include_components=True,
                         include_webdewey=True)
    fn = _FusedExtractLink(cfg)
    df = _synthetic_batch(pd.DataFrame({"id": range(pages)}))
    batch = pa.Table.from_pandas(df)
    done = 0
    t0 = time.time()
    while time.time() - t0 < seconds:
        fn(batch)
        done += pages
    return done, time.time() - t0


def measure(nworkers: int, pages_per_call: int, seconds: float) -> float:
    with mp.get_context("spawn").Pool(nworkers) as pool:
        results = pool.map(_worker, [(pages_per_call, seconds)] * nworkers)
    total_pages = sum(r[0] for r in results)
    max_secs = max(r[1] for r in results)
    return total_pages / max_secs


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--workers", default="8,32")
    parser.add_argument("--pages-per-call", type=int, default=2000)
    parser.add_argument("--seconds", type=float, default=20.0)
    args = parser.parse_args()
    lo, hi = (int(x) for x in args.workers.split(","))

    out = {}
    for n in (lo, hi):
        rate = measure(n, args.pages_per_call, args.seconds)
        out[n] = rate
        print("workers=%d  pages/s=%.0f" % (n, rate), flush=True)
    eff = (out[hi] / out[lo]) / (hi / lo)
    print("host_scaling_efficiency_%d_to_%d = %.3f" % (lo, hi, eff))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
