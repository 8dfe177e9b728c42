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


class _FusedExtractLink:
    """Single physical stage: page html → parsed record → triples.

    Skips materializing the nested RECORDS Arrow table between the
    extract and link operators (the list<struct> columns are the most
    expensive conversion in the pipeline). The logical stages stay
    separately available (extract_records / link_records) for tests and
    for pipelines that checkpoint the record boundary.
    """

    def __init__(self, config: PipelineConfig):
        self.config = config
        self.key = "fused:" + repr(config)

    def __call__(self, batch):
        import pyarrow as pa
        import xml.etree.ElementTree as ET

        from . import marc
        from .convert import dispatch_record, emit_triples, is_public, resolve_scheme
        from .link import _LINKER_CACHE, LinkerActor
        from .marc import InvalidRecordError
        from .schemas import TRIPLES

        linker = _LINKER_CACHE.get(self.key)
        if linker is None:
            linker = LinkerActor(self.config)
            _LINKER_CACHE[self.key] = linker
        voc = linker.vocabularies
        config = self.config

        # columnar assembly: the map wave is the measured >90% of the
        # headline wall, so the output path builds 7 flat column lists
        # (from_pydict) instead of one dict per triple (from_pylist) —
        # less allocator churn per triple, which is exactly what the
        # 32-way map wave contends on
        c_url: list = []
        c_subj: list = []
        c_pred: list = []
        c_obj: list = []
        c_lit: list = []
        c_lang: list = []
        c_dt: list = []

        def error_row(url, msg):
            c_url.append(url)
            c_subj.append(url)
            c_pred.append(ERROR_PRED)
            c_obj.append(msg)
            c_lit.append(True)
            c_lang.append(None)
            c_dt.append(None)

        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        for url, html in zip(urls, htmls):
            if html is None:
                continue
            try:
                elements = list(marc.iter_records_from_xml(html))
            except ET.ParseError as exc:
                error_row(url, "xml parse error: %s" % exc)
                continue
            for elem in elements:
                try:
                    parsed = dispatch_record(marc.parse_record_element(elem), config)
                    if parsed is None:
                        continue
                    scheme = resolve_scheme(parsed, voc)
                    if not is_public(parsed):
                        continue
                    triples = emit_triples(parsed, scheme, voc, config)
                except InvalidRecordError as exc:
                    error_row(url, str(exc))
                    continue
                except Exception as exc:  # data-error contract: one malformed
                    # record must never fail the Ray task (extract.py catches
                    # broad Exception for the same reason)
                    error_row(url, "%s: %s" % (type(exc).__name__, exc))
                    continue
                for t in triples:
                    c_url.append(url)
                    c_subj.append(t["subj"])
                    c_pred.append(t["pred"])
                    c_obj.append(t["obj"])
                    c_lit.append(t["obj_is_literal"])
                    c_lang.append(t["obj_lang"])
                    c_dt.append(t["obj_datatype"])
        return pa.Table.from_pydict(
            {"url": c_url, "subj": c_subj, "pred": c_pred, "obj": c_obj,
             "obj_is_literal": c_lit, "obj_lang": c_lang,
             "obj_datatype": c_dt}, schema=TRIPLES)


def build_triples(pages, config: Optional[PipelineConfig] = None,
                  fused: bool = True):
    """Dataset[pages] → Dataset[triples] (with lineage url, errors included)."""
    config = config or PipelineConfig()
    if fused and config.link_concurrency is None:
        return pages.map_batches(
            _FusedExtractLink(config),
            batch_format="pyarrow",
            batch_size=config.extract_batch_size,
            zero_copy_batch=True,
        )
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


def _union_includes(real, include):
    """Union extra graph Dataset(s) (the reference's ``--include`` RDF
    preload, mc2skos.py:284-288) into the triple stream, widening them to
    the TRIPLES schema."""
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
    return real


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
        real = _union_includes(real, include)
    real = _apply_skosify(real, config)
    return canonicalize(real, expand=config.expand,
                        num_buckets=num_buckets or config.dedup_buckets)


def _apply_skosify(real, config: PipelineConfig):
    """--skosify cleanup (mc2skos.py:198-201): union the transitive
    broader-closure triples into the stream before the canonicalize
    shuffle, so the closure's dedup+sort rides the same range exchange.
    The stream is pinned once (spill-backed) because the iterative closure
    re-reads the broader edges each round.

    With ``config.skosify_repair``, the hierarchy repair pass
    (components.skos_repair: cycle-closing broader-edge removal +
    top-concept marking — the rest of skosify.skosify's checks) runs
    FIRST, so the closure never traverses a cycle."""
    if config.skosify_repair:
        from .components import skos_repair

        real = skos_repair(real)
    if not config.skosify:
        return real
    from .components import skos_transitive_triples

    real = real.materialize()
    closure = skos_transitive_triples(real, narrower=config.skosify_narrower)
    return real.union(closure)


def run_pipeline(pages, out_dir: str, config: Optional[PipelineConfig] = None,
                 include=None, fingerprint: Optional[str] = None,
                 checkpoint_triples: bool = True) -> dict:
    """End-to-end run with checkpointed output layout:

    ``out_dir/graph/``  — canonical sorted triples (partitioned Parquet +
                          ``_MANIFEST.json``; re-runs with the same
                          fingerprint skip completed partitions)
    ``out_dir/errors/`` — the data-error channel (url, message rows)
    ``_RUN.json``       — run-level metrics/lineage summary

    Returns the run summary dict. The graph and error channels are two
    consumers of one triple stream: by default (``checkpoint_triples=
    True``) the stream is materialized ONCE into the object store
    (spill-backed) so the extract stage executes a single time and both
    sinks read the same blocks; pass False to trade a second extract pass
    for zero pinned blocks when the extract stage is cheap.
    """
    import json
    import os

    from .materialize import materialize

    config = config or PipelineConfig()
    triples = build_triples(pages, config)
    if checkpoint_triples:
        triples = triples.materialize()
    real, errors = split_errors(triples)
    if include is not None:
        real = _union_includes(real, include)
    real = _apply_skosify(real, config)
    graph_ds = canonicalize(real, expand=config.expand,
                            num_buckets=config.dedup_buckets)

    manifest = materialize(graph_ds, os.path.join(out_dir, "graph"),
                           fingerprint=fingerprint,
                           config_dict=config.semantic_options())

    errors_path = os.path.join(out_dir, "errors")
    os.makedirs(errors_path, exist_ok=True)
    err_ds = errors.select_columns(["url", "obj"])
    err_count = 0
    if not manifest.get("skipped"):
        for f in os.listdir(errors_path):  # clear stale files from prior runs
            if f.endswith(".parquet"):
                os.unlink(os.path.join(errors_path, f))
        err_ds.write_parquet(errors_path)
        import pyarrow.parquet as pq

        for f in os.listdir(errors_path):
            if f.endswith(".parquet"):
                err_count += pq.read_metadata(
                    os.path.join(errors_path, f)).num_rows

    summary = {
        "fingerprint": fingerprint,
        "triples": manifest["rows"],
        "errors": err_count,
        "graph_partitions": len(manifest.get("partitions", [])),
        "resumed_skip": bool(manifest.get("skipped")),
        "config": config.semantic_options(),
    }
    with open(os.path.join(out_dir, "_RUN.json"), "w") as fp:
        json.dump(summary, fp, indent=2)
    return summary
