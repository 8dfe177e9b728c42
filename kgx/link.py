"""Stage 2 — link: records → triples via an actor pool.

The entity-linking stage is *stateful*: each actor holds the concept-scheme
registry (the reference's ``Vocabularies`` dict, vocabularies.py:10-83) plus
its memoized edition derivations and warn-once bookkeeping. The registry is
built ONCE per actor in ``__init__``; ``__call__`` resolves schemes, mints
URIs and flattens each record into triples (mc2skos.py:50-154 semantics).

Unresolvable-scheme records and dropped links go to the error/metrics
channel (``kind='error'`` rows are forwarded; dropped link counts are kept
per actor and flushed as ``kgx:droppedLink`` metric triples on a page with
url='' when ``emit_metrics`` is on).
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from .config import PipelineConfig
from .convert import emit_triples, is_public, resolve_scheme
from .marc import InvalidRecordError
from .schemas import TRIPLES
from .vocab import Vocabularies

_TRIPLE_FIELDS = [f.name for f in TRIPLES]


class LinkerActor:
    """Callable class for ``map_batches(LinkerActor, concurrency=N)``."""

    def __init__(self, config: Optional[PipelineConfig] = None):
        self.config = config or PipelineConfig()
        # registry built once per actor — the broadcast small side
        self.vocabularies = Vocabularies()
        for code, options in (self.config.extra_vocabularies or {}).items():
            from .vocab import ConceptScheme
            if isinstance(options, str):
                options = {"base_uri": options}
            self.vocabularies.entries[code] = ConceptScheme(
                options.get("kind"), code, options=options)
        self.vocabularies.set_default_scheme(
            generic=self.config.default_uri,
            scheme=self.config.default_scheme,
            whitespace=self.config.default_whitespace,
        )
        self.dropped_links = 0
        self.skipped_records = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out: List[dict] = []
        for parsed in rows:
            url = parsed.get("url")
            if parsed.get("kind") == "error":
                # forward data errors as kgx:error triples on the lineage page
                out.append({
                    "url": url, "subj": url or "", "pred": "kgx:error",
                    "obj": parsed.get("error") or "", "obj_is_literal": True,
                    "obj_lang": None, "obj_datatype": None,
                })
                continue
            try:
                scheme = resolve_scheme(parsed, self.vocabularies)
                if not is_public(parsed):
                    self.skipped_records += 1
                    continue
                dropped: List[dict] = []
                triples = emit_triples(parsed, scheme, self.vocabularies,
                                       self.config, dropped)
                self.dropped_links += len(dropped)
            except InvalidRecordError as exc:
                out.append({
                    "url": url, "subj": url or "", "pred": "kgx:error",
                    "obj": str(exc), "obj_is_literal": True,
                    "obj_lang": None, "obj_datatype": None,
                })
                continue
            except Exception as exc:  # error-channel contract: a malformed
                # record must not kill the job (see pipeline._FusedExtractLink)
                out.append({
                    "url": url, "subj": url or "", "pred": "kgx:error",
                    "obj": "%s: %s" % (type(exc).__name__, exc),
                    "obj_is_literal": True,
                    "obj_lang": None, "obj_datatype": None,
                })
                continue
            for t in triples:
                t["url"] = url
                out.append(t)
        return pa.Table.from_pylist(out, schema=TRIPLES)


# per-worker-process linker cache for the task-based path (the semantic
# equivalent of actor-pool __init__-once state, without reserving CPUs)
_LINKER_CACHE: dict = {}


class _LinkTask:
    """Picklable per-batch linker that rebuilds its state at most once per
    worker process (module-level cache keyed by config identity)."""

    def __init__(self, config: PipelineConfig):
        self.config = config
        self.key = repr(config)

    def __call__(self, batch: pa.Table) -> pa.Table:
        linker = _LINKER_CACHE.get(self.key)
        if linker is None:
            linker = LinkerActor(self.config)
            _LINKER_CACHE.clear()
            _LINKER_CACHE[self.key] = linker
        return linker(batch)


def link_records(records, config: Optional[PipelineConfig] = None,
                 concurrency=None, batch_size: Optional[int] = None):
    """Dataset[records] → Dataset[triples].

    Default: stateless Ray tasks with a per-worker-process registry cache.
    The registry is small (KBs), so tasks scale elastically across the
    whole cluster — an actor pool would RESERVE CPUs and cap the fused
    upstream stages' parallelism. Pass ``concurrency`` (or set
    ``config.link_concurrency``) to switch to an explicit actor pool for
    heavy per-actor state (vocab tries, ML models).
    """
    config = config or PipelineConfig()
    conc = concurrency or config.link_concurrency
    bs = batch_size or config.link_batch_size
    if conc is None:
        return records.map_batches(
            _LinkTask(config),
            batch_format="pyarrow",
            batch_size=bs,
            zero_copy_batch=True,
        )
    return records.map_batches(
        LinkerActor,
        fn_constructor_kwargs={"config": config},
        batch_format="pyarrow",
        batch_size=bs,
        zero_copy_batch=True,
        concurrency=conc,
    )
