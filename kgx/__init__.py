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

from .config import PipelineConfig  # noqa: F401

__all__ = ["PipelineConfig", "__version__"]
