"""Pipeline composition: pages → extract → link → canonicalize → materialize.

The library surface mirrors the reference's ``process_records`` contract
(mc2skos.py:180-203) as functions returning lazy ``ray.data.Dataset``
pipelines — nothing materializes until a sink consumes the stream.
"""

from __future__ import annotations

from typing import Optional

from .canonicalize import canonicalize
from .config import PipelineConfig
from .extract import extract_records
from .link import link_records

ERROR_PRED = "kgx:error"


def build_triples(pages, config: Optional[PipelineConfig] = None):
    """Dataset[pages] → Dataset[triples] (with lineage url, errors included)."""
    config = config or PipelineConfig()
    records = extract_records(pages, config)
    return link_records(records, config)


def split_errors(triples):
    """Separate the data-error channel from real triples."""
    import pyarrow.compute as pc

    def keep_real(batch):
        return batch.filter(pc.not_equal(batch.column("pred"), ERROR_PRED))

    def keep_errors(batch):
        return batch.filter(pc.equal(batch.column("pred"), ERROR_PRED))

    real = triples.map_batches(keep_real, batch_format="pyarrow", zero_copy_batch=True)
    errors = triples.map_batches(keep_errors, batch_format="pyarrow", zero_copy_batch=True)
    return real, errors


def build_graph(pages, config: Optional[PipelineConfig] = None,
                include=None, num_buckets: Optional[int] = None):
    """Full pipeline: pages → canonical deduplicated graph dataset.

    ``include`` — optional extra graph Dataset(s) unioned in before dedup
    (the reference's ``--include`` RDF preload, mc2skos.py:284-288).
    """
    config = config or PipelineConfig()
    triples = build_triples(pages, config)
    real, _errors = split_errors(triples)
    if include is not None:
        includes = include if isinstance(include, (list, tuple)) else [include]
        import pyarrow as pa

        from .schemas import TRIPLES

        def widen(batch: pa.Table) -> pa.Table:
            cols = {f.name: (batch.column(f.name) if f.name in batch.column_names
                             else pa.nulls(len(batch), f.type))
                    for f in TRIPLES}
            if "url" not in batch.column_names:
                cols["url"] = pa.array([""] * len(batch), pa.string())
            return pa.Table.from_pydict(cols, schema=TRIPLES)

        for inc in includes:
            real = real.union(inc.map_batches(widen, batch_format="pyarrow"))
    return canonicalize(real, expand=config.expand,
                        num_buckets=num_buckets or config.dedup_buckets)
