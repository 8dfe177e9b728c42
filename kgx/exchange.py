"""Two-pass sort exchange with write-in-reduce (the flagship scale path).

``Dataset.sort`` cannot run the output write inside its reduce stage: the
sorted stream crosses the object store once more between the sort's merge
tasks and the downstream dedup+write tasks, and the sort's own map/merge
exchange adds further full-stream plasma traversals. On one shared-memory
node those traversals contend for the same memory bandwidth — the measured
cause of the 8→32 CPU scaling shortfall (BASELINE.md round 2).

This module is the documented raw-task escape hatch (SURVEY "custom
operators", rule c): it fuses the whole flagship pipeline

    read parquet → extract → link → tkey → range-partition   (M map tasks)
    fetch → sort → adjacent-dedup → write part file          (P reduce tasks)

so the triple stream crosses plasma exactly ONCE (map out / reduce in)
and the output write happens inside the reduce task. Semantics are
byte-identical to the Dataset path (``pipeline.build_graph`` →
``materialize``): same tkey construction (canonicalize._add_tkey_arrow),
same adjacent dedup (canonicalize._dedup_sorted_block), same global order
(part files are range partitions, sorted within; concatenation in part
order IS the global tkey order) — pinned by tests/test_exchange.py.

Partitioning assumptions (per the brief, stated explicitly):
- Range boundaries come from a pilot sample over a few corpus fragments.
  Sample error skews partition SIZES, never correctness: identical tkeys
  always co-locate (searchsorted is deterministic in the key).
- M×P intermediate objects: fine up to ~10^3 maps × ~10^3 partitions per
  exchange; at 100 TB coarsen map groups (more files per map) or chain
  two exchange rounds rather than inflating M×P.
- Resume/lineage: every finished partition appends a line to
  ``_partials.jsonl``; a re-run with the same fingerprint skips completed
  partitions' sort+write (the map stage re-streams — lineage recompute,
  the standard Spark/Ray trade: cheap map work is repeated, expensive
  sorted output is not).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from .canonicalize import _add_tkey_arrow, _dedup_sorted_block
from .config import PipelineConfig
from .pipeline import ERROR_PRED, _FusedExtractLink

_PAGE_COLUMNS = ["url", "html"]
_SAMPLE_PAGES = 3072  # pilot size: ~30k sampled keys at ~10 triples/page
_SKOS = "http://www.w3.org/2004/02/skos/core#"
# --skosify closure path switch: hierarchies at or below this take one
# driver-side path-doubling step (a concept hierarchy is one broader
# edge per concept — MBs); above it the closure runs fully distributed
# (_skosify_closure_slice_refs) and the driver never holds the pairs
_SKOSIFY_EDGE_CAP = 5_000_000

# low-cardinality payload columns (measured 11/3/3 distinct values vs
# ~70 B/row as plain strings = 35% of shuffle traffic): dictionary-encode
# for the map→reduce crossing, decode on the small deduped output
_DICT_COLS = ["pred", "obj_lang", "obj_datatype"]


def _dict_encode(tbl: pa.Table) -> pa.Table:
    # int8 indices: a per-batch dictionary never exceeds the ~16 distinct
    # predicates; concat unification in the reduce re-checks the bound
    dtype = pa.dictionary(pa.int8(), pa.string())
    for c in _DICT_COLS:
        i = tbl.schema.get_field_index(c)
        tbl = tbl.set_column(
            i, c, pc.dictionary_encode(tbl.column(c)).cast(dtype))
    return tbl


def _dict_decode(tbl: pa.Table) -> pa.Table:
    for c in _DICT_COLS:
        i = tbl.schema.get_field_index(c)
        if pa.types.is_dictionary(tbl.schema.field(c).type):
            tbl = tbl.set_column(i, c, pc.cast(tbl.column(c), pa.string()))
    return tbl


def _list_fragments(corpus) -> list:
    if isinstance(corpus, (list, tuple)):
        return sorted(corpus)
    return sorted(
        os.path.join(corpus, f) for f in os.listdir(corpus)
        if f.endswith(".parquet")
    )


def _keyed_tables(files: Sequence[str], config: PipelineConfig,
                  max_pages: Optional[int] = None):
    """Yield keyed triple tables (tkey + payload cols) for a fragment set.

    One fused pass: parquet batch → extract+link → drop error channel →
    tkey (canonicalize combiner, with the --expand closure folded in when
    configured). Batched reads bound the heap regardless of file size.
    """
    fused = _FusedExtractLink(config)
    seen = 0
    for path in files:
        pf = pq.ParquetFile(path)
        for rb in pf.iter_batches(batch_size=1024, columns=_PAGE_COLUMNS):
            tbl = pa.Table.from_batches([rb])
            if max_pages is not None and seen + tbl.num_rows > max_pages:
                tbl = tbl.slice(0, max_pages - seen)
            seen += tbl.num_rows
            triples = fused(tbl)
            real = triples.filter(
                pc.not_equal(triples.column("pred"), ERROR_PRED))
            errors = triples.filter(
                pc.equal(triples.column("pred"), ERROR_PRED))
            keyed = _dict_encode(_add_tkey_arrow(
                real.select(["subj", "pred", "obj", "obj_is_literal",
                             "obj_lang", "obj_datatype"]),
                expand=config.expand))
            broader = (real.filter(
                pc.equal(real.column("pred"), _SKOS + "broader"))
                .select(["subj", "obj"])
                if config.skosify else _empty_edges())
            yield keyed, errors.select(["url", "obj"]), broader
            if max_pages is not None and seen >= max_pages:
                return
        if max_pages is not None and seen >= max_pages:
            return


def _empty_edges() -> pa.Table:
    return pa.table({"subj": pa.array([], pa.string()),
                     "obj": pa.array([], pa.string())})


@ray.remote
def _sample_task(files: list, config: PipelineConfig, num_parts: int) -> list:
    """Pilot: extract sample pages, return P-1 tkey quantiles.

    The sample must scale with P, not stay fixed: at ~10 triples/page,
    P-1 boundaries cut from max(3072, 10·P) pages keep ≥ ~100 keys per
    partition, so quantile noise skews SIZES by a bounded factor
    instead of collapsing whole partitions. Capped at 200k pages — at
    that point the pilot is seconds of one task and fully overlapped
    by the map wave."""
    sample_pages = max(_SAMPLE_PAGES, min(200_000, 10 * num_parts))
    keys: list = []
    for keyed, _err, _bro in _keyed_tables(files, config,
                                           max_pages=sample_pages):
        keys.append(keyed.column("tkey").to_numpy(zero_copy_only=False))
    if not keys:
        return []
    arr = np.sort(np.concatenate(keys))
    return [arr[(len(arr) * i) // num_parts] for i in range(1, num_parts)]


def _empty_keyed_table() -> pa.Table:
    """Zero-row keyed table (post-tkey schema, subj embedded in the key)."""
    return _add_tkey_arrow(
        pa.table({"subj": pa.array([], pa.string()),
                  "pred": pa.array([], pa.string()),
                  "obj": pa.array([], pa.string()),
                  "obj_is_literal": pa.array([], pa.bool_()),
                  "obj_lang": pa.array([], pa.string()),
                  "obj_datatype": pa.array([], pa.string())}))


def _range_partition_slices(tbl: pa.Table, boundaries, num_parts: int) -> list:
    """Split a keyed table into num_parts contiguous range slices
    (searchsorted side="right" — the one deterministic routing rule every
    exchange path shares, so equal keys always co-locate)."""
    keys = tbl.column("tkey").to_numpy(zero_copy_only=False)
    part = (np.searchsorted(np.asarray(boundaries, dtype=object), keys,
                            side="right")
            if boundaries else np.zeros(len(keys), dtype=np.int64))
    order = np.argsort(part, kind="stable")
    tbl = tbl.take(pa.array(order))
    counts = np.bincount(part, minlength=num_parts)
    slices, off = [], 0
    for c in counts[:num_parts]:
        slices.append(tbl.slice(off, int(c)))
        off += int(c)
    return slices


def _empty_keyed_sorted() -> pa.Table:
    return pa.table({"pred": pa.array([], pa.string()),
                     "obj": pa.array([], pa.string()),
                     "obj_is_literal": pa.array([], pa.bool_()),
                     "obj_lang": pa.array([], pa.string()),
                     "obj_datatype": pa.array([], pa.string()),
                     "tkey": pa.array([], pa.binary())})


def _write_sorted_dedup(part_idx: int, out_dir: str, fmt: str,
                        tbl: pa.Table, keep_key: bool = False) -> dict:
    """Adjacent-dedup an ALREADY-SORTED keyed table and atomically write
    its shard (tmp + rename, so a killed run leaves no torn partition).
    ``keep_key`` persists the binary tkey column in the shard so a later
    merge/diff skips the polars re-key pass (the measured 62% of a
    merge's per-shard rewrite)."""
    if keep_key:
        tbl = tbl.append_column("tkey_keep", tbl.column("tkey"))
    out = _dict_decode(_dedup_sorted_block(tbl))
    if keep_key:
        out = out.rename_columns(
            ["tkey" if c == "tkey_keep" else c for c in out.column_names])
    ext = "parquet" if fmt == "parquet" else "nt"
    fname = "part-%05d.%s" % (part_idx, ext)
    tmp = os.path.join(out_dir, "." + fname + ".tmp")
    if fmt == "parquet":
        pq.write_table(out, tmp)
    else:
        from .materialize import nt_lines

        with open(tmp, "w") as fp:
            fp.write("".join(nt_lines(out.to_pandas())))
    os.replace(tmp, os.path.join(out_dir, fname))
    return {"part": part_idx, "file": fname, "rows": out.num_rows}


def _sort_dedup_write(part_idx: int, out_dir: str, fmt: str,
                      tables: list, keep_key: bool = False) -> dict:
    """Sort + adjacent-dedup one partition's tables and atomically write
    its shard. Shared by the bulk reduce and the incremental merge."""
    tables = [t for t in tables if t is not None and t.num_rows]
    if tables:
        # combine_chunks unifies the per-map dictionaries of the encoded
        # low-cardinality columns before the sort-take
        tbl = pa.concat_tables(tables).combine_chunks()
        tbl = tbl.take(pc.sort_indices(tbl.column("tkey")))
    else:
        tbl = _empty_keyed_sorted()
    return _write_sorted_dedup(part_idx, out_dir, fmt, tbl, keep_key)


@ray.remote
def _map_task(files: list, config: PipelineConfig, num_parts: int,
              boundaries_wrap: list):
    """Extract+link+key a fragment group, then range-partition it.

    Returns num_parts keyed slices + one error table. ``boundaries_wrap``
    is ``[ObjectRef]`` so the task starts extracting immediately and only
    blocks on the pilot sample when partitioning — the sample's latency
    fully overlaps the first map wave.
    """
    keyed_parts, err_parts, bro_parts = [], [], []
    for keyed, err, bro in _keyed_tables(files, config):
        keyed_parts.append(keyed)
        if err.num_rows:
            err_parts.append(err)
        if bro.num_rows:
            bro_parts.append(bro)
    if not keyed_parts:
        slices = [_dict_encode(_empty_keyed_table())] * num_parts
    else:
        tbl = pa.concat_tables(keyed_parts).combine_chunks()
        boundaries = ray.get(boundaries_wrap[0])
        slices = _range_partition_slices(tbl, boundaries, num_parts)
    errors = (pa.concat_tables(err_parts) if err_parts
              else pa.table({"url": pa.array([], pa.string()),
                             "obj": pa.array([], pa.string())}))
    broader = (pa.concat_tables(bro_parts) if bro_parts
               else _empty_edges())
    return (*slices, errors, broader)


@ray.remote
def _reduce_task(part_idx: int, out_dir: str, fmt: str, keep_key: bool,
                 *slices) -> dict:
    """Sort + adjacent-dedup one range partition and write its shard.

    The write happens HERE, inside the reduce — the sorted stream never
    re-enters the object store.
    """
    return _sort_dedup_write(part_idx, out_dir, fmt, list(slices),
                             keep_key=keep_key)


def _include_table(include, config: PipelineConfig):
    """--include RDF preload for the exchange engine: parse the (small)
    RDF files (format from extension — Turtle/NT/JSON-LD, rdfio.load_rdf)
    driver-side into ONE GRAPH-schema table. The caller
    keys it with the shared tkey construction and range-scatters it
    into the existing reduce sort+dedup — Dataset-engine parity with
    pipeline._union_includes running before canonicalize (reference:
    mc2skos.py:284-288). Accepts file paths or pre-built pa.Tables.

    Partitioning assumption: includes are vocabulary preloads (scheme
    skeletons, upper ontologies) — MBs against a TB corpus — so one
    driver-side parse is the right cost; the rows still dedup/sort in
    the distributed reduce, never on the driver.
    """
    if not include:
        return None
    from .rdfio import load_rdf

    items = include if isinstance(include, (list, tuple)) else [include]
    tables = []
    cols = ["subj", "pred", "obj", "obj_is_literal", "obj_lang",
            "obj_datatype"]
    for inc in items:
        if isinstance(inc, pa.Table):
            tables.append(inc.select(cols))
            continue
        trips = load_rdf(inc)
        tables.append(pa.table({
            "subj": pa.array([t[0] for t in trips], pa.string()),
            "pred": pa.array([t[1] for t in trips], pa.string()),
            "obj": pa.array([t[2] for t in trips], pa.string()),
            "obj_is_literal": pa.array([t[3] for t in trips], pa.bool_()),
            "obj_lang": pa.array([t[4] for t in trips], pa.string()),
            "obj_datatype": pa.array([t[5] for t in trips], pa.string()),
        }))
    out = pa.concat_tables(tables).combine_chunks()
    return out if out.num_rows else None


@ray.remote
def _route_table_task(tbl: pa.Table, boundaries: list, num_parts: int):
    """Range-partition one keyed table against a run's boundaries
    (the _route_delta_task rule for in-memory blocks)."""
    if tbl is None or tbl.num_rows == 0:
        return None if num_parts == 1 else tuple([None] * num_parts)
    slices = _range_partition_slices(tbl, boundaries, num_parts)
    slices = [s if s.num_rows else None for s in slices]
    return slices[0] if num_parts == 1 else tuple(slices)


def _closure_triples_table(pairs: "pd.DataFrame",
                           config: PipelineConfig) -> pa.Table:
    """(a, b) closure pairs → keyed+encoded broaderTransitive (and,
    per config, narrowerTransitive) triple table."""
    subj = list(pairs["a"])
    obj = list(pairs["b"])
    pred = [_SKOS + "broaderTransitive"] * len(pairs)
    if config.skosify_narrower:
        subj += list(pairs["b"])
        obj += list(pairs["a"])
        pred += [_SKOS + "narrowerTransitive"] * len(pairs)
    n = len(subj)
    tbl = pa.table({
        "subj": pa.array(subj, pa.string()),
        "pred": pa.array(pred, pa.string()),
        "obj": pa.array(obj, pa.string()),
        "obj_is_literal": pa.array([False] * n, pa.bool_()),
        "obj_lang": pa.nulls(n, pa.string()),
        "obj_datatype": pa.nulls(n, pa.string())})
    return _dict_encode(_add_tkey_arrow(tbl, expand=config.expand))


def _skosify_closure_slice_refs(broader_tables: list, boundaries: list,
                                num_parts: int,
                                config: PipelineConfig) -> list:
    """DISTRIBUTED --skosify closure for hierarchies past the driver
    cap: the broader edges become a Dataset, components.transitive_
    closure runs its bucketed path-doubling loop, and every closure
    block is keyed and range-scattered by a task — the driver never
    holds the pair set. Returns per-partition LISTS of slice refs."""
    import pandas as pd
    import ray.data

    from .components import transitive_closure

    edges = ray.data.from_arrow(broader_tables).map_batches(
        lambda df: pd.DataFrame({"a": df["subj"].astype(str),
                                 "b": df["obj"].astype(str)}),
        batch_format="pandas")
    closure = transitive_closure(edges)

    def keyed_blocks(df: pd.DataFrame):
        return _closure_triples_table(df, config)

    keyed = closure.map_batches(keyed_blocks, batch_format="pandas")
    out: list = [[] for _ in range(num_parts)]
    for block_ref in keyed.to_arrow_refs():
        rets = _route_table_task.options(
            num_returns=num_parts if num_parts > 1 else 1).remote(
            block_ref, boundaries, num_parts)
        if num_parts == 1:
            out[0].append(rets)
        else:
            for p in range(num_parts):
                out[p].append(rets[p])
    return out


def _skosify_closure_slices(broader_tables: list, boundaries: list,
                            num_parts: int,
                            config: PipelineConfig) -> list:
    """--skosify on the exchange engine: transitive-close the collected
    ``skos:broader`` edges (mc2skos.py:198-201 / examples/skosify.cfg
    semantics — broaderTransitive plus, with skosify_narrower, the
    inverse narrowerTransitive), key the new triples with the SAME tkey
    construction as the map wave, and range-partition them against the
    run's boundaries so they ride the existing reduce sort+dedup —
    byte-identical to the Dataset engine's pre-canonicalize union
    (pipeline._apply_skosify), pinned by test_exchange.py.

    Partitioning assumption (stated per the custom-operator rule): the
    concept HIERARCHY is tiny relative to the page corpus — one broader
    edge per concept, ~10^5-10^6 for real vocabularies — so the closure
    is one driver-side path-doubling step (log2(depth) rounds) on this
    path; hierarchies past _SKOSIFY_EDGE_CAP take the fully distributed
    twin (_skosify_closure_slice_refs). Either way the closure OUTPUT
    scatters into the distributed reduce, never onto the driver's
    output path.
    """
    import pandas as pd

    if broader_tables:
        e = pa.concat_tables(broader_tables).to_pandas()
        p = pd.DataFrame({"a": e["subj"].astype(str),
                          "b": e["obj"].astype(str)}).drop_duplicates()
    else:
        p = pd.DataFrame({"a": pd.Series([], dtype="object"),
                          "b": pd.Series([], dtype="object")})
    for _ in range(64):
        step = p.merge(p, left_on="b", right_on="a", suffixes=("", "_r"))
        step = pd.DataFrame({"a": step["a"], "b": step["b_r"]})
        new = pd.concat([p, step], ignore_index=True).drop_duplicates()
        if len(new) == len(p):
            break
        p = new
    keyed = _closure_triples_table(p, config)
    return _range_partition_slices(keyed, boundaries, num_parts)


def _load_partials(path: str, fingerprint) -> dict:
    """Completed-partition registry from a prior interrupted run."""
    done = {}
    if fingerprint is None or not os.path.isfile(path):
        return done
    with open(path) as fp:
        for line in fp:
            try:
                rec = json.loads(line)
            except ValueError:
                continue  # torn final line from a killed run
            if rec.get("fingerprint") == fingerprint:
                done[rec["part"]] = rec
    return done


def write_canonical_graph(corpus, out_dir: str,
                          config: Optional[PipelineConfig] = None,
                          num_parts: Optional[int] = None,
                          map_tasks: Optional[int] = None,
                          fingerprint: Optional[str] = None,
                          fmt: str = "parquet",
                          keep_key: bool = False,
                          include=None,
                          skosify_edge_cap: int = _SKOSIFY_EDGE_CAP) -> dict:
    """pages parquet → canonical sorted graph shards, in two passes.

    ``corpus`` — a directory of page parquet fragments (or a file list).
    ``fmt`` — "parquet" or "ntriples" (shards concatenate byte-identically
    to materialize.write_ntriples(graph, sort=False)).
    ``keep_key`` — persist the binary tkey column in the parquet shards
    (a standing graph that expects incremental merges should set this:
    merge then skips the per-shard re-key pass entirely).

    Returns the manifest dict (same shape as materialize.materialize, plus
    per-partition lineage). Resume: with the same ``fingerprint``, a
    complete manifest skips the whole run; otherwise partitions recorded
    in ``_partials.jsonl`` skip their sort+write.
    """
    config = config or PipelineConfig()
    if keep_key and fmt != "parquet":
        raise ValueError("keep_key requires fmt='parquet'")
    if config.skosify_repair:
        raise ValueError(
            "write_canonical_graph does not implement skosify_repair "
            "(the cycle-drop/top-concept pass can add and remove rows "
            "after the map wave keyed them). Run the Dataset engine, "
            "or repair the written graph with components.skos_repair "
            "as a post-pass.")
    files = _list_fragments(corpus)
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    if fingerprint is not None and os.path.isfile(manifest_path):
        with open(manifest_path) as fp:
            existing = json.load(fp)
        if existing.get("fingerprint") == fingerprint and existing.get("complete"):
            existing["skipped"] = True
            return existing

    partials_path = os.path.join(out_dir, "_partials.jsonl")
    done = _load_partials(partials_path, fingerprint)
    ext = ".parquet" if fmt == "parquet" else ".nt"
    done = {p: rec for p, rec in done.items()
            if os.path.isfile(os.path.join(out_dir, rec["file"]))}
    # stale shards from a prior different-fingerprint run must not be
    # swept into this manifest
    keep = {rec["file"] for rec in done.values()}
    for f in os.listdir(out_dir):
        if f.endswith(ext) and f not in keep:
            os.unlink(os.path.join(out_dir, f))

    import time

    t0 = time.time()
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    if num_parts is not None:
        P = num_parts
    else:
        # partition count must track DATA size, not just cluster size:
        # at 100 TB a CPU-only default would write multi-TB shards. One
        # partition per ~512 MB of input pages (triples ≈ pages bytes
        # within ~2x on this extraction) keeps shards
        # sort-in-memory-able and compaction-free for typical runs;
        # compact_canonical_graph re-splits if merge chains grow them.
        in_bytes = sum(os.path.getsize(f) for f in files)
        P = max(16, 2 * ncpu, in_bytes // (512 << 20))
    # 4 tasks per CPU: late-binding over ~4 waves absorbs the per-task
    # jitter a 2-wave schedule pays straight into the wall (measured
    # ~4% on the 1.2M-page map wave at both 8 and 32 CPUs; the probe
    # shows a 28% straggler spread across equal static shards at 32)
    M = max(1, min(map_tasks or max(8, 4 * ncpu), len(files)))
    groups = [files[i::M] for i in range(M)]

    # pilot over a few evenly-spaced fragments (first-fragment-only would
    # inherit any generation-order bias in the corpus layout)
    stride = max(1, len(files) // 4)
    boundaries_ref = _sample_task.remote(files[::stride][:4], config, P)

    slice_refs: list = [[] for _ in range(P)]
    err_refs, broader_refs = [], []
    for g in groups:
        rets = _map_task.options(num_returns=P + 2).remote(
            g, config, P, [boundaries_ref])
        for p in range(P):
            slice_refs[p].append(rets[p])
        err_refs.append(rets[P])
        broader_refs.append(rets[P + 1])

    inc_tbl = _include_table(include, config)
    if inc_tbl is not None or config.skosify:
        boundaries_eager = ray.get(boundaries_ref)
    if inc_tbl is not None:
        # --include preload scatters into the same range partitions as
        # the map wave; dedup against extracted triples happens in the
        # shared reduce (Dataset parity: union before canonicalize)
        keyed_inc = _dict_encode(_add_tkey_arrow(inc_tbl,
                                                 expand=config.expand))
        for p_idx, s in enumerate(_range_partition_slices(
                keyed_inc, boundaries_eager, P)):
            if s.num_rows:
                slice_refs[p_idx].append(ray.put(s))
    if config.skosify:
        # the closure needs every map's broader edges, so this gather IS
        # the end of the map wave; the closure triples then scatter into
        # the same range partitions and the reduces stay untouched. The
        # non-skosify path keeps its fully pipelined reduce submission.
        btables = [t for t in ray.get(broader_refs) if t.num_rows]
        if inc_tbl is not None:
            # Dataset parity: includes union in BEFORE the skosify pass,
            # so their broader edges feed the closure too
            inc_bro = inc_tbl.filter(pc.equal(
                inc_tbl.column("pred"),
                _SKOS + "broader")).select(["subj", "obj"])
            if inc_bro.num_rows:
                btables.append(inc_bro)
        n_edges = sum(t.num_rows for t in btables)
        if n_edges > skosify_edge_cap:
            # hierarchy past the driver cap: fully distributed closure
            # (components.transitive_closure) + per-block scatter tasks
            for p_idx, refs in enumerate(_skosify_closure_slice_refs(
                    btables, boundaries_eager, P, config)):
                slice_refs[p_idx].extend(refs)
        else:
            for p_idx, s in enumerate(_skosify_closure_slices(
                    btables, boundaries_eager, P, config)):
                if s.num_rows:
                    slice_refs[p_idx].append(ray.put(s))

    pending = {}
    for p in range(P):
        if p in done:
            continue
        pending[_reduce_task.remote(p, out_dir, fmt, keep_key,
                                    *slice_refs[p])] = p

    # phase observability (manifest only): the error tables return with
    # the map tasks, so waiting on them timestamps the map wave without
    # delaying the already-submitted reduces
    err_tables = [t for t in ray.get(err_refs) if t.num_rows]
    t_maps_done = time.time()

    parts = dict(done)
    with open(partials_path, "a") as plog:
        refs = list(pending)
        while refs:
            ready, refs = ray.wait(refs, num_returns=1)
            rec = ray.get(ready[0])
            rec["fingerprint"] = fingerprint
            plog.write(json.dumps(rec) + "\n")
            plog.flush()
            parts[rec["part"]] = rec

    t_reduce_done = time.time()
    # maps are done by now, so the pilot result is long available: record
    # the range boundaries so merge_canonical_graphs can route a delta
    # run into these partitions without re-sampling (and so merges chain)
    boundaries = ray.get(boundaries_ref)
    n_errors = 0
    if err_tables:
        err = pa.concat_tables(err_tables)
        n_errors = err.num_rows
        pq.write_table(err, os.path.join(out_dir, "_errors.parquet"))

    ordered = [parts[p] for p in sorted(parts)]
    manifest = {
        "fingerprint": fingerprint,
        "complete": True,
        "rows": sum(r["rows"] for r in ordered),
        "partitions": [{"file": r["file"], "rows": r["rows"]}
                       for r in ordered],
        "errors": n_errors,
        "resumed_parts": len(done),
        "boundaries_hex": [bytes(b).hex() for b in boundaries],
        # tkey embeds a polars struct hash; a merge must re-derive the
        # IDENTICAL keys, so stamp the version for merge to verify
        "polars_version": __import__("polars").__version__,
        "tkey_format": 2,
        "keep_key": keep_key,
        "phase_sec": {"map_wave": round(t_maps_done - t0, 3),
                      "reduce_tail": round(t_reduce_done - t_maps_done, 3)},
        "config": config.semantic_options(),
        "include": [os.path.basename(p) if isinstance(p, str) else "<table>"
                    for p in (include if isinstance(include, (list, tuple))
                              else [include] if include is not None else [])],
        "engine": "exchange",
        "skipped": False,
    }
    with open(manifest_path, "w") as fp:
        json.dump(manifest, fp, indent=2)
    return manifest


# ---------------------------------------------------------------------------
# Incremental merge (LSM-style compaction of two canonical runs)
# ---------------------------------------------------------------------------

def _rekey_shard(tbl: pa.Table) -> pa.Table:
    """Keyed view of a graph shard: reuse the persisted tkey column when
    the run was written with ``keep_key=True`` (free), else recompute it
    (tkey is a pure function of the triple — canonicalize._add_tkey_arrow
    — but the polars struct hash is the measured 62% of a merge's
    per-shard rewrite, which is exactly what keep_key buys back)."""
    if "tkey" in tbl.column_names:
        # cast to the exact schema the polars re-key path emits, so mixed
        # keep_key / re-keyed tables concat cleanly (parquet roundtrips
        # the dict-decoded columns as string, polars emits large_string)
        keyed = pa.schema([("pred", pa.large_string()),
                           ("obj", pa.large_string()),
                           ("obj_is_literal", pa.bool_()),
                           ("obj_lang", pa.large_string()),
                           ("obj_datatype", pa.large_string()),
                           ("tkey", pa.binary())])
        return tbl.select([f.name for f in keyed]).cast(keyed)
    from .canonicalize import _KEY_COLS

    return _add_tkey_arrow(tbl.select(_KEY_COLS), expand=False)


@ray.remote
def _route_delta_task(files: list, boundaries: list, num_parts: int):
    """Read delta graph shards, re-key, and range-partition them against
    the BASE run's boundaries (same searchsorted rule as the original
    write — _range_partition_slices — so equal keys land in the same
    partition they would have). Returns the single table when
    num_parts == 1 (num_returns=1 cannot unpack a tuple)."""
    tables = [_rekey_shard(pq.read_table(f)) for f in files]
    tbl = pa.concat_tables(tables).combine_chunks() if tables else None
    if tbl is None or tbl.num_rows == 0:
        return None if num_parts == 1 else tuple([None] * num_parts)
    slices = _range_partition_slices(tbl, boundaries, num_parts)
    slices = [s if s.num_rows else None for s in slices]
    return slices[0] if num_parts == 1 else tuple(slices)


def _merge_sorted(base: pa.Table, delta: pa.Table) -> pa.Table:
    """Interleave two tkey-SORTED keyed tables into one sorted table via
    numpy searchsorted — O(n) take instead of an O(n log n) re-sort of
    the (large) base side. Equal keys place the delta row first; the
    adjacent-dedup downstream keeps one (identical tkey ⟹ identical
    triple, so the winner is irrelevant)."""
    bkeys = base.column("tkey").to_numpy(zero_copy_only=False)
    dkeys = delta.column("tkey").to_numpy(zero_copy_only=False)
    nb, nd = len(bkeys), len(dkeys)
    pos = np.searchsorted(bkeys, dkeys, side="left")
    didx = pos + np.arange(nd)
    order = np.empty(nb + nd, dtype=np.int64)
    mask = np.ones(nb + nd, dtype=bool)
    mask[didx] = False
    order[didx] = nb + np.arange(nd)
    order[mask] = np.arange(nb)
    both = pa.concat_tables([base, delta]).combine_chunks()
    return both.take(pa.array(order))


@ray.remote
def _merge_task(part_idx: int, base_file: Optional[str], out_dir: str,
                keep_key: bool, *delta_slices) -> dict:
    """Merge one range partition: the base shard is read LOCALLY (never
    shuffled), delta slices arrive via plasma; adjacent-dedup + atomic
    write, exactly like _reduce_task.

    Two structural savings over a naive rewrite: (1) LSM fast path — a
    partition with ZERO delta rows byte-copies its base shard, so
    sparse/localized deltas pay only for partitions they touch; (2) the
    base shard is already tkey-sorted, so only the (small) delta side is
    sorted and the two interleave in O(n) (_merge_sorted) instead of
    re-sorting the whole partition."""
    deltas = [s for s in delta_slices if s is not None and s.num_rows]
    if not deltas and base_file is not None:
        import shutil as _shutil

        fname = "part-%05d.parquet" % part_idx
        tmp = os.path.join(out_dir, "." + fname + ".tmp")
        _shutil.copyfile(base_file, tmp)
        os.replace(tmp, os.path.join(out_dir, fname))
        return {"part": part_idx, "file": fname,
                "rows": pq.read_metadata(base_file).num_rows,
                "copied": True}
    base = None
    if base_file is not None:
        b = pq.read_table(base_file)
        if b.num_rows:
            base = _rekey_shard(b)  # free when the run persisted tkey
            if "tkey" not in b.column_names:
                # the polars re-key dedups with unique(keep="any"), which
                # may reorder — restore the sortedness _merge_sorted needs
                # (a keep_key shard keeps its on-disk order, no re-sort)
                base = base.take(pc.sort_indices(base.column("tkey")))
    delta = None
    if deltas:
        delta = pa.concat_tables(deltas).combine_chunks()
        delta = delta.take(pc.sort_indices(delta.column("tkey")))
    if base is not None and delta is not None:
        merged = _merge_sorted(base, delta)
    else:
        merged = (base if base is not None else
                  delta if delta is not None else _empty_keyed_sorted())
    return _write_sorted_dedup(part_idx, out_dir, "parquet", merged,
                               keep_key=keep_key)


def _load_run_manifests(a_dir: str, a_name: str, b_dir: str, b_name: str):
    """Shared preconditions for two-run operations (merge, diff): both
    runs parquet, same semantic config, same polars version as this
    cluster (tkey re-derivation must be bit-identical), and the first run
    must carry recorded range boundaries."""
    with open(os.path.join(a_dir, "_MANIFEST.json")) as fp:
        a_man = json.load(fp)
    with open(os.path.join(b_dir, "_MANIFEST.json")) as fp:
        b_man = json.load(fp)
    if a_man.get("config") != b_man.get("config"):
        raise ValueError(
            "cannot combine runs with different semantic options: %r vs %r"
            % (a_man.get("config"), b_man.get("config")))
    if "boundaries_hex" not in a_man:
        raise ValueError("%s manifest has no recorded range boundaries "
                         "(re-run write_canonical_graph to record them)"
                         % a_name)
    cur = __import__("polars").__version__
    for man, name in ((a_man, a_name), (b_man, b_name)):
        if any(not r["file"].endswith(".parquet")
               for r in man["partitions"]):
            raise ValueError(
                "%s run was not written with fmt='parquet' — two-run ops "
                "read parquet shards only" % name)
        ver = man.get("polars_version")
        if ver is not None and ver != cur:
            raise ValueError(
                "%s run was written under polars %s but this cluster runs "
                "%s — tkey hashes are not reproducible across versions; "
                "rebuild the run or pin polars" % (name, ver, cur))
        fmtv = man.get("tkey_format", 1)
        if fmtv != 2:
            raise ValueError(
                "%s run uses tkey format %s but this build writes format "
                "2 (A-case subject folded into the sort key) — identical "
                "triples would key differently across the merge; rebuild "
                "the run" % (name, fmtv))
    return a_man, b_man


def _route_run(run_dir: str, man: dict, boundaries, P: int) -> list:
    """Fan a run's shards through _route_delta_task against another run's
    boundaries; returns per-partition lists of slice refs."""
    files = [os.path.join(run_dir, r["file"])
             for r in man["partitions"] if r["rows"]]
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    D = max(1, min(2 * ncpu, len(files))) if files else 0
    groups = [files[i::D] for i in range(D)]
    slice_refs: list = [[] for _ in range(P)]
    for g in groups:
        rets = _route_delta_task.options(num_returns=P).remote(
            g, boundaries, P)
        if P == 1:
            rets = [rets]
        for p in range(P):
            slice_refs[p].append(rets[p])
    return slice_refs


def merge_canonical_graphs(base_dir: str, delta_dir: str, out_dir: str,
                           fingerprint: Optional[str] = None) -> dict:
    """Merge a delta canonical run into a base run WITHOUT re-sorting the
    base — the incremental-update path (new crawl batch into a standing
    100 TB graph).

    Both inputs are ``write_canonical_graph(..., fmt="parquet")`` outputs:
    range-partitioned, sorted within partitions, deduped within runs.
    Identical tkey ⟹ identical triple (the key embeds a 128-bit hash of
    the full triple), so a per-partition merge + adjacent-dedup of the two
    runs IS the canonical graph of the combined corpus: row-identical to a
    full rebuild (pinned by tests/test_exchange.py).

    Cost shape: the base graph crosses plasma ZERO times (each merge task
    reads its own base shard from storage), the delta crosses once
    (route → merge). At a 100 TB base with a small delta this is the
    difference between an incremental update and a full re-shuffle.
    Output partitioning reuses the base boundaries (recorded in the base
    manifest), so merges chain: merged output is itself a valid base.
    Skewed deltas concentrate into few partitions by design — rebuild
    (re-sample) when a partition's shard grows past ~2× the target size,
    the standard LSM compaction trigger.

    Resume: same fingerprint + ``_partials.jsonl`` protocol as
    write_canonical_graph.
    """
    # the stale-shard sweep below deletes every *.parquet in out_dir not
    # claimed by a resumable partial — merging in place would destroy an
    # input before its tasks read it
    out_abs = os.path.abspath(out_dir)
    if out_abs in (os.path.abspath(base_dir), os.path.abspath(delta_dir)):
        raise ValueError(
            "out_dir must differ from base_dir and delta_dir "
            "(write to a new directory, then swap)")
    base_man, delta_man = _load_run_manifests(base_dir, "base",
                                              delta_dir, "delta")
    boundaries = [bytes.fromhex(h) for h in base_man["boundaries_hex"]]
    P = len(base_man["partitions"])

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    if fingerprint is not None and os.path.isfile(manifest_path):
        with open(manifest_path) as fp:
            existing = json.load(fp)
        if existing.get("fingerprint") == fingerprint and existing.get("complete"):
            existing["skipped"] = True
            return existing
    partials_path = os.path.join(out_dir, "_partials.jsonl")
    done = _load_partials(partials_path, fingerprint)
    done = {p: rec for p, rec in done.items()
            if os.path.isfile(os.path.join(out_dir, rec["file"]))}
    keep = {rec["file"] for rec in done.values()}
    for f in os.listdir(out_dir):
        if f.endswith(".parquet") and f not in keep:
            os.unlink(os.path.join(out_dir, f))

    todo = [p for p in range(P) if p not in done]
    # a fully-resumed merge (todo empty) must not pay the delta
    # read+rekey wave
    slice_refs = (_route_run(delta_dir, delta_man, boundaries, P)
                  if todo else [[] for _ in range(P)])

    # output schema follows the base: a keep_key base stays keep_key so
    # merge chains stay rekey-free
    keep_key = bool(base_man.get("keep_key"))
    pending = {}
    for p in todo:
        bf = os.path.join(base_dir, base_man["partitions"][p]["file"])
        pending[_merge_task.remote(p, bf, out_dir, keep_key,
                                   *slice_refs[p])] = p

    parts = dict(done)
    with open(partials_path, "a") as plog:
        refs = list(pending)
        while refs:
            ready, refs = ray.wait(refs, num_returns=1)
            rec = ray.get(ready[0])
            rec["fingerprint"] = fingerprint
            plog.write(json.dumps(rec) + "\n")
            plog.flush()
            parts[rec["part"]] = rec

    ordered = [parts[p] for p in sorted(parts)]
    manifest = {
        "fingerprint": fingerprint,
        "complete": True,
        "rows": sum(r["rows"] for r in ordered),
        "partitions": [{"file": r["file"], "rows": r["rows"]}
                       for r in ordered],
        # error lineage: counts sum; the _errors.parquet files stay with
        # the input runs (reachable via merged_from)
        "errors": (int(base_man.get("errors", 0))
                   + int(delta_man.get("errors", 0))),
        "resumed_parts": len(done),
        "copied_parts": sum(1 for r in ordered if r.get("copied")),
        "boundaries_hex": base_man["boundaries_hex"],
        "polars_version": __import__("polars").__version__,
        "tkey_format": 2,
        "keep_key": keep_key,
        "config": base_man.get("config"),
        "engine": "exchange-merge",
        "merged_from": [os.path.abspath(base_dir), os.path.abspath(delta_dir)],
        "skipped": False,
    }
    with open(manifest_path, "w") as fp:
        json.dump(manifest, fp, indent=2)
    return manifest


# ---------------------------------------------------------------------------
# Graph diff (set difference of two canonical runs)
# ---------------------------------------------------------------------------

@ray.remote
def _diff_task(part_idx: int, a_file: str, *b_slices) -> pa.Table:
    """Symmetric difference of one range partition: A's shard read
    locally, B's routed slices from plasma; anti-join on tkey both ways.
    Row uniqueness within each run makes the tkey anti-join exact."""
    a = _rekey_shard(pq.read_table(a_file))
    bt = [s for s in b_slices if s is not None and s.num_rows]
    b = pa.concat_tables(bt).combine_chunks() if bt else None

    def _finish(t: pa.Table, side: str) -> pa.Table:
        # rows are unique, so the adjacent-dedup inside is a no-op — this
        # only strips tkey and reconstructs subj
        t = _dedup_sorted_block(t)
        return t.append_column(
            "side", pa.array([side] * t.num_rows, pa.string()))

    if b is None or b.num_rows == 0:
        return pa.concat_tables([_finish(a, "A"), _finish(a.slice(0, 0), "B")])
    a_keys = a.column("tkey").combine_chunks()
    b_keys = b.column("tkey").combine_chunks()
    a_only = a.filter(pc.invert(pc.is_in(a_keys, value_set=b_keys)))
    b_only = b.filter(pc.invert(pc.is_in(b_keys, value_set=a_keys)))
    return pa.concat_tables([_finish(a_only, "A"), _finish(b_only, "B")])


def diff_canonical_graphs(a_dir: str, b_dir: str):
    """Set difference of two canonical runs as a Ray Dataset with a
    ``side`` column ('A' = triple only in a_dir, 'B' = only in b_dir) —
    the audit/regression primitive that pairs with
    ``merge_canonical_graphs`` (what changed between two crawls, did a
    code change alter the graph, is a merge equivalent to its rebuild).

    Cost shape mirrors the merge: A is read partition-local (never
    shuffled), B crosses plasma once, routed by A's recorded boundaries;
    the per-partition anti-join is exact because tkey embeds a 128-bit
    hash of the full triple and each run's rows are unique.
    """
    a_man, b_man = _load_run_manifests(a_dir, "A", b_dir, "B")
    boundaries = [bytes.fromhex(h) for h in a_man["boundaries_hex"]]
    P = len(a_man["partitions"])
    slice_refs = _route_run(b_dir, b_man, boundaries, P)
    refs = []
    for p in range(P):
        af = os.path.join(a_dir, a_man["partitions"][p]["file"])
        refs.append(_diff_task.remote(p, af, *slice_refs[p]))
    import ray.data

    return ray.data.from_arrow_refs(refs)


# ---------------------------------------------------------------------------
# Compaction (bound partition sizes across unbounded merge chains)
# ---------------------------------------------------------------------------

@ray.remote
def _split_task(path: str, k: int) -> list:
    """Split one sorted keep_key shard into k even-row pieces, written
    atomically next to it. Returns per-piece file/rows/last-key (the new
    range boundaries). The original file is NOT deleted here — the driver
    removes it only after the updated manifest is durable."""
    tbl = pq.read_table(path)
    n = tbl.num_rows
    out_dir = os.path.dirname(path)
    stem = os.path.basename(path)[:-len(".parquet")]
    pieces, start = [], 0
    for j in range(k):
        end = (n * (j + 1)) // k
        piece = tbl.slice(start, end - start)
        fname = "%s.c%02d.parquet" % (stem, j)
        tmp = os.path.join(out_dir, "." + fname + ".tmp")
        pq.write_table(piece, tmp)
        os.replace(tmp, os.path.join(out_dir, fname))
        pieces.append({
            "file": fname, "rows": piece.num_rows,
            "last_key_hex": piece.column("tkey")[piece.num_rows - 1]
            .as_py().hex()})
        start = end
    return pieces


def repair_canonical_graph(run_dir: str, out_dir: str,
                           fingerprint: Optional[str] = None) -> dict:
    """Skosify hierarchy REPAIR as a post-pass over a WRITTEN canonical
    graph — the exchange-engine route to ``skosify_repair`` (the
    exchange itself refuses the flag: repair adds/removes rows after
    the map wave keyed them). Reads the run's parquet shards, applies
    ``components.skos_repair`` (order-free intra-SCC broader-edge drop
    + top-concept marking), and re-canonicalizes into ``out_dir`` via
    the standard sorted materialize with a manifest — so the result is
    a first-class canonical graph again (mergeable, diffable,
    resumable). Triple-SET parity with the Dataset engine running
    ``skosify_repair=True`` in-pipeline is pinned by test: repair
    commutes with canonicalize because the drop rule keys on triple
    content only and the added marks dedup identically.
    """
    import ray.data

    from .components import skos_repair
    from .materialize import materialize

    with open(os.path.join(run_dir, "_MANIFEST.json")) as fp:
        man = json.load(fp)
    shards = [os.path.join(run_dir, p["file"])
              for p in man["partitions"] if p["rows"]]
    cols = ["subj", "pred", "obj", "obj_is_literal", "obj_lang",
            "obj_datatype"]
    graph = ray.data.read_parquet(shards, columns=cols)
    repaired = skos_repair(graph)
    # repair can re-introduce duplicates (added marks may already
    # exist); one content-keyed dedup pass restores set semantics
    # before the sorted write
    from .canonicalize import canonicalize

    return materialize(canonicalize(repaired), out_dir,
                       fingerprint=fingerprint,
                       config_dict={"repaired_from": run_dir})


def compact_canonical_graph(run_dir: str, max_rows: int) -> dict:
    """Split every partition whose shard exceeds ``max_rows`` into
    ceil(rows/max_rows) even pieces, in place — the LSM compaction
    trigger that bounds partition sizes across unbounded merge chains
    (skewed deltas concentrate rows into few partitions; this restores
    balance without touching the rest of the graph).

    Requires a ``keep_key=True`` run: the new range boundaries are the
    stored sort keys at the split points, so no re-key and no shuffle —
    each oversized shard is rewritten locally, every other shard is
    untouched on disk. Global order is preserved (pieces are contiguous
    row ranges of a sorted shard) and future merges route by the updated
    boundaries exactly as before. Crash-safe ordering: pieces are written
    first, the manifest flips second, originals are deleted last — at any
    interruption the on-disk manifest references only complete files.
    """
    manifest_path = os.path.join(run_dir, "_MANIFEST.json")
    with open(manifest_path) as fp:
        man = json.load(fp)
    if not man.get("keep_key"):
        raise ValueError("compaction requires a keep_key=True run "
                         "(boundaries come from the stored sort key)")
    parts = man["partitions"]
    boundaries = list(man["boundaries_hex"])
    oversized = [(i, r) for i, r in enumerate(parts)
                 if r["rows"] > max_rows]
    if not oversized:
        man["compacted_parts"] = 0
        return man

    refs = {i: _split_task.remote(
        os.path.join(run_dir, r["file"]),
        -(-r["rows"] // max_rows)) for i, r in oversized}
    pieces = {i: ray.get(ref) for i, ref in refs.items()}

    new_parts, new_bounds = [], []
    for i, r in enumerate(parts):
        if i in pieces:
            ps = pieces[i]
            new_parts.extend({"file": p["file"], "rows": p["rows"]}
                             for p in ps)
            # boundary after each piece except the last, whose upper
            # bound is the partition's original one
            new_bounds.extend(p["last_key_hex"] for p in ps[:-1])
        else:
            new_parts.append(r)
        if i < len(parts) - 1:
            new_bounds.append(boundaries[i])

    man["partitions"] = new_parts
    man["boundaries_hex"] = new_bounds
    man["compacted_parts"] = len(oversized)
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as fp:
        json.dump(man, fp, indent=2)
    os.replace(tmp, manifest_path)
    for i, r in oversized:
        os.unlink(os.path.join(run_dir, r["file"]))
    return man


def ingest_corpus_batched(corpus, out_root: str,
                          config: Optional[PipelineConfig] = None,
                          files_per_batch: int = 256,
                          num_parts: Optional[int] = None,
                          fingerprint: Optional[str] = None,
                          compact_max_rows: Optional[int] = None) -> dict:
    """Ingest a corpus as a CHAIN of bounded exchange runs + LSM merges
    — the documented 100 TB answer to the single exchange's M×P object
    blow-up (module docstring: "coarsen map groups or chain rounds").
    Each batch of ``files_per_batch`` fragments runs its own
    write_canonical_graph (M×P bounded by construction, per-partition
    resume inside the batch), then merges into the standing graph —
    the base shards never re-shuffle, so total cost is
    O(corpus + n_batches · base-rewrite-local), and a crash resumes at
    batch granularity via per-batch fingerprints.

    Layout under ``out_root``: ``runs/batch-%04d`` (delta runs,
    removable after merge), ``graph-a`` / ``graph-b`` (the standing
    graph alternates; ``_CURRENT`` names the live one). Returns the
    final standing-graph manifest (plus ``batches``).

    ``compact_max_rows``: when set, partitions that outgrow it after a
    merge are re-split in place before the next batch (the LSM
    compaction trigger), so merge chains of any length keep bounded
    shards.
    """
    import shutil

    config = config or PipelineConfig()
    if config.skosify:
        # per-batch closure would miss broader chains that span batches
        # (batch graphs close only their own hierarchy; the merge does
        # not re-close) — silently under-closed output is worse than an
        # error. Run skosify in one exchange, the Dataset engine, or as
        # a post-pass over the standing graph.
        raise ValueError(
            "ingest_corpus_batched cannot apply --skosify per batch: "
            "the transitive closure must see the WHOLE hierarchy. "
            "Run write_canonical_graph (single run) or the Dataset "
            "engine with skosify instead.")
    files = _list_fragments(corpus)
    if not files:
        raise ValueError(
            "ingest_corpus_batched: no parquet fragments found under %r "
            "— nothing to ingest" % (corpus,))
    batches = [files[i:i + files_per_batch]
               for i in range(0, len(files), files_per_batch)]
    os.makedirs(out_root, exist_ok=True)
    cur_path = os.path.join(out_root, "_CURRENT")

    def fp(tag):
        return None if fingerprint is None else "%s/%s" % (fingerprint, tag)

    live = None
    done_batches = 0
    # resume: trust _CURRENT only if it names a complete manifest chain
    if fingerprint is not None and os.path.isfile(cur_path):
        with open(cur_path) as f:
            rec = json.loads(f.read())
        if rec.get("fingerprint") == fingerprint:
            live = rec["live"]
            done_batches = rec["batches"]

    for bi in range(done_batches, len(batches)):
        run_dir = os.path.join(out_root, "runs", "batch-%04d" % bi)
        write_canonical_graph(batches[bi], run_dir, config,
                              num_parts=num_parts,
                              fingerprint=fp("batch-%d" % bi),
                              keep_key=True)
        if live is None:
            live = "graph-a"
            shutil.rmtree(os.path.join(out_root, live),
                          ignore_errors=True)
            shutil.copytree(run_dir, os.path.join(out_root, live))
        else:
            nxt = "graph-b" if live == "graph-a" else "graph-a"
            shutil.rmtree(os.path.join(out_root, nxt), ignore_errors=True)
            merge_canonical_graphs(os.path.join(out_root, live), run_dir,
                                   os.path.join(out_root, nxt),
                                   fingerprint=fp("merge-%d" % bi))
            live = nxt
        if compact_max_rows is not None:
            compact_canonical_graph(os.path.join(out_root, live),
                                    max_rows=compact_max_rows)
        tmp = cur_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps({"fingerprint": fingerprint, "live": live,
                                "batches": bi + 1}))
        os.replace(tmp, cur_path)

    with open(os.path.join(out_root, live, "_MANIFEST.json")) as f:
        man = json.load(f)
    man["live_dir"] = os.path.join(out_root, live)
    man["batches"] = len(batches)
    return man
