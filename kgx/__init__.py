"""kgx — Ray-Data-native knowledge-graph construction.

Public surface:

- :func:`kgx.pipeline.build_graph` / :func:`kgx.pipeline.run_pipeline` —
  pages → canonical triple graph (the reference's ``process_records``
  equivalent, returning lazy Datasets).
- :func:`kgx.convert.record_to_triples` — the per-record kernel (the
  reference's ``process_record`` equivalent).
- :class:`kgx.config.PipelineConfig` — the option surface.
- :class:`kgx.vocab.Vocabularies` — the concept-scheme registry.
"""

__version__ = "0.1.0"

import os as _os

# One Ray worker owns one CPU slot: nested intra-process thread pools
# (polars' rayon pool, Arrow/BLAS via OMP) each sized to the whole host
# oversubscribe it N_workers × N_threads under a full task wave — measured
# 45% of 32-CPU headline throughput (BASELINE.md round 3, 531k → 776k
# triples/s). kgx is imported by every worker before its first lazy
# polars/arrow use, so pinning here covers tasks regardless of how the
# session was launched. setdefault: an explicit user override wins.
_os.environ.setdefault("POLARS_MAX_THREADS", "1")
_os.environ.setdefault("OMP_NUM_THREADS", "1")

from .config import PipelineConfig  # noqa: F401

__all__ = ["PipelineConfig", "__version__"]
