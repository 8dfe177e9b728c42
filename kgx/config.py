"""Pipeline configuration.

Mirrors the reference's options dict threaded through ``process_records``
(/root/reference/mc2skos/mc2skos.py:305-315) plus engine-level knobs for the
Ray Data execution (batch sizes, actor-pool sizing, dedup buckets).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass
class PipelineConfig:
    # --- semantic flags (reference parity) ---
    include_altlabels: bool = False
    exclude_notes: bool = False
    include_components: bool = False
    include_webdewey: bool = False
    skip_classification: bool = False
    skip_authority: bool = False
    expand: bool = False  # SKOS inference closure (mc2skos.py:192-196)
    # --skosify full cleanup (mc2skos.py:198-201, examples/skosify.cfg):
    # transitive broader closure → skos:broaderTransitive (+ inverse)
    skosify: bool = False
    skosify_narrower: bool = True
    # hierarchy-cycle removal + top-concept (orphan) repair — the
    # skosify.skosify cleanup actions beyond the closure (see
    # components.skos_repair for the deterministic order-free rule).
    # Opt-in: it can ADD topConceptOf/hasTopConcept triples, so the
    # closure-only default keeps Dataset↔exchange output parity.
    skosify_repair: bool = False

    # default-scheme override (mc2skos.py:261-265 / vocabularies.py:20-35)
    default_uri: Optional[str] = None       # --uri
    default_scheme: Optional[str] = None    # --scheme
    default_whitespace: Optional[str] = None  # --whitespace

    # extra vocabularies merged over the built-in registry
    extra_vocabularies: dict = field(default_factory=dict)

    # --- engine knobs ---
    extract_batch_size: int = 256
    link_batch_size: int = 1024
    link_concurrency: Optional[tuple] = None  # (min, max) actors; None = tasks
    dedup_buckets: Optional[int] = None  # None → sized from parallelism

    def semantic_options(self) -> dict:
        return {
            "include_altlabels": self.include_altlabels,
            "exclude_notes": self.exclude_notes,
            "include_components": self.include_components,
            "include_webdewey": self.include_webdewey,
            "skip_classification": self.skip_classification,
            "skip_authority": self.skip_authority,
            "expand": self.expand,
            "skosify": self.skosify,
            "skosify_repair": self.skosify_repair,
        }
