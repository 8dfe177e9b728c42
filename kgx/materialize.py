"""Stage 4 — materialize: deterministic sort, partitioned output, manifests.

- sort-key computation reproduces the reference's OrderedTurtleSerializer
  sorters (mc2skos.py:336-344): table numbers → ``C{t}--{n}``, schedule
  numbers → ``B{n}``, fallback → ``A{uri}``; we apply them per-triple (the
  reference sorts per concept block — documented divergence: triples from
  one subject still end up adjacent because the key is subject-derived).
- output is partitioned Parquet (one directory per run, many files) plus a
  ``_MANIFEST.json`` recording input fingerprint, per-file row counts and
  the pipeline config — the checkpoint/resume + lineage unit (north rule).
- serializers: N-Triples (streaming via iter_batches), Turtle and
  JSKOS-style NDJSON (grouped per concept with the bucket+local-groupby
  pattern) for reference-format parity (mc2skos.py:332-358).
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_SORTERS = [
    (re.compile(r"/([0-9A-Z\-]+)--([0-9.\-;:]+)/e"), lambda m: "C{}--{}".format(m.group(1), m.group(2))),
    (re.compile(r"/([0-9.\-;:]+)/e"), lambda m: "B" + m.group(1)),
    (re.compile(r"^(.+)$"), lambda m: "A" + m.group(1)),
]


def sort_key(uri: str) -> str:
    """URI → deterministic global sort key (parity: mc2skos.py:340-344)."""
    for pattern, fmt in _SORTERS:
        m = pattern.search(uri)
        if m:
            return fmt(m)
    return uri


def sort_key_series(subj: pd.Series) -> pd.Series:
    """Vectorized sort_key over a subject column (same 3-sorter rule)."""
    import numpy as np

    m1 = subj.str.extract(r"/([0-9A-Z\-]+)--([0-9.\-;:]+)/e", expand=True)
    m2 = subj.str.extract(r"/([0-9.\-;:]+)/e", expand=True)
    k1 = "C" + m1[0].fillna("") + "--" + m1[1].fillna("")
    k2 = "B" + m2[0].fillna("")
    k3 = "A" + subj
    return pd.Series(
        np.where(m1[0].notna(), k1, np.where(m2[0].notna(), k2, k3)),
        index=subj.index,
    )


def _add_sort_key(df: pd.DataFrame) -> pd.DataFrame:
    return df.assign(sort_key=sort_key_series(df["subj"]))


def sorted_graph(graph):
    """Range-partitioned global sort by the serializer key."""
    return graph.map_batches(_add_sort_key, batch_format="pandas").sort(
        ["sort_key", "subj", "pred", "obj"]
    )


class _preserve_order:
    """Context manager: force deterministic block order on the consuming
    execution. Ray's streaming executor may otherwise deliver post-sort
    blocks out of order to iter_batches (DataContext.execution_options
    .preserve_order defaults to False), which would break the
    OrderedTurtleSerializer-parity guarantee of the .ttl/.nt writers."""

    def __enter__(self):
        import ray.data

        self.ctx = ray.data.DataContext.get_current()
        self.prev = self.ctx.execution_options.preserve_order
        self.ctx.execution_options.preserve_order = True
        return self

    def __exit__(self, *exc):
        self.ctx.execution_options.preserve_order = self.prev
        return False


def materialize(graph, path: str, fingerprint: Optional[str] = None,
                sort: bool = False, config_dict: Optional[dict] = None) -> dict:
    """Write the graph as partitioned Parquet + _MANIFEST.json.

    ``canonicalize`` output is already globally ordered (dedup and the
    output sort share one range shuffle), so ``sort`` defaults to False;
    pass True for graphs from other sources. Returns the manifest dict.
    If a complete manifest with the same fingerprint already exists, the
    write is skipped (resume semantics).
    """
    manifest_path = os.path.join(path, "_MANIFEST.json")
    if fingerprint is not None and os.path.isfile(manifest_path):
        with open(manifest_path) as fp:
            existing = json.load(fp)
        if existing.get("fingerprint") == fingerprint and existing.get("complete"):
            existing["skipped"] = True
            return existing

    # not resuming: stale parquet from a prior (different-fingerprint) run
    # would otherwise be swept into the manifest below
    if os.path.isdir(path):
        for f in os.listdir(path):
            if f.endswith(".parquet"):
                os.unlink(os.path.join(path, f))

    ds = sorted_graph(graph) if sort else graph
    t0 = time.time()
    ds.write_parquet(path)

    files = sorted(
        f for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    partitions = []
    total_rows = 0
    for f in files:
        meta = pq.read_metadata(os.path.join(path, f))
        partitions.append({"file": f, "rows": meta.num_rows})
        total_rows += meta.num_rows
    manifest = {
        "fingerprint": fingerprint,
        "complete": True,
        "rows": total_rows,
        "partitions": partitions,
        "wall_clock_sec": time.time() - t0,
        "config": config_dict or {},
        "skipped": False,
    }
    with open(manifest_path, "w") as fp:
        json.dump(manifest, fp, indent=2)
    return manifest


# ---------------------------------------------------------------------------
# Reference-format serializers
# ---------------------------------------------------------------------------

def _term_nt(value, is_literal, lang, datatype):
    if not is_literal:
        if value.startswith("_:"):
            return value
        return "<%s>" % value
    escaped = (value.replace("\\", "\\\\").replace('"', '\\"')
               .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))
    if lang:
        return '"%s"@%s' % (escaped, lang)
    if datatype:
        return '"%s"^^<%s>' % (escaped, datatype)
    return '"%s"' % escaped


def nt_lines(batch: pd.DataFrame) -> list:
    """One N-Triples line per row of a graph batch (shared by the
    driver-streaming writer below and the exchange reduce-side writer).
    Vectorized (pandas str kernels, no Python row loop) — byte-identical
    to the per-row ``_term_nt`` formatting, pinned by
    tests/test_pipeline.py::test_nt_lines_vectorized_parity."""
    if batch.empty:
        return []
    subj = batch["subj"].astype(str)
    subj = np.where(subj.str.startswith("_:"), subj, "<" + subj + ">")

    obj = batch["obj"].astype(str)
    lang = batch["obj_lang"]
    dt = batch["obj_datatype"]
    is_lit = batch["obj_is_literal"].astype(bool)

    escaped = (obj.str.replace("\\", "\\\\", regex=False)
               .str.replace('"', '\\"', regex=False)
               .str.replace("\n", "\\n", regex=False)
               .str.replace("\r", "\\r", regex=False)
               .str.replace("\t", "\\t", regex=False))
    has_lang = is_lit & lang.notna() & (lang != "")
    has_dt = is_lit & ~has_lang & dt.notna() & (dt != "")
    lit_plain = '"' + escaped + '"'
    term = np.where(
        ~is_lit,
        np.where(obj.str.startswith("_:"), obj, "<" + obj + ">"),
        np.where(has_lang, lit_plain + "@" + lang.fillna("").astype(str),
                 np.where(has_dt,
                          lit_plain + "^^<" + dt.fillna("").astype(str) + ">",
                          lit_plain)),
    )
    out = subj + " <" + batch["pred"].astype(str) + "> " + term + " .\n"
    return list(out)


def write_ntriples(graph, fileobj, sort: bool = True) -> int:
    """Stream the graph to an N-Triples file (no driver materialization)."""
    ds = sorted_graph(graph) if sort else graph
    n = 0
    with _preserve_order():
        for batch in ds.iter_batches(batch_format="pandas", batch_size=8192):
            lines = nt_lines(batch)
            n += len(lines)
            fileobj.write("".join(lines))
    return n


_PREFIXES = {
    "http://www.w3.org/2004/02/skos/core#": "skos",
    "http://purl.org/dc/terms/": "dcterms",
    "http://www.w3.org/2002/07/owl#": "owl",
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#": "rdf",
    "http://www.w3.org/2001/XMLSchema#": "xsd",
    "http://data.ub.uio.no/webdewey-terms#": "wd",
    "http://www.loc.gov/mads/rdf/v1#": "mads",
}


def _qname(uri: str) -> str:
    for ns, pfx in _PREFIXES.items():
        if uri.startswith(ns):
            local = uri[len(ns):]
            if re.match(r"^[\w\-]+$", local):
                return "%s:%s" % (pfx, local)
    return "<%s>" % uri


def write_turtle(graph, fileobj, sort: bool = True) -> int:
    """Ordered Turtle output (parity: OrderedTurtleSerializer usage,
    mc2skos.py:332-346). Subject blocks come out in sort-key order because
    the stream is globally sorted; suitable for small/medium graphs."""
    for ns, pfx in sorted(_PREFIXES.items(), key=lambda kv: kv[1]):
        fileobj.write("@prefix %s: <%s> .\n" % (pfx, ns))
    fileobj.write("\n")
    ds = sorted_graph(graph) if sort else graph
    n = 0
    current = None

    def rows():
        with _preserve_order():
            for batch in ds.iter_batches(batch_format="pandas", batch_size=8192):
                yield from batch.itertuples(index=False)

    for row in rows():
        if row.subj != current:
            if current is not None:
                fileobj.write(" .\n\n")
            subj = row.subj if row.subj.startswith("_:") else "<%s>" % row.subj
            fileobj.write("%s" % subj)
            current = row.subj
            first = True
        else:
            fileobj.write(" ;")
        pred = "a" if row.pred.endswith("22-rdf-syntax-ns#type") else _qname(row.pred)
        if row.obj_is_literal:
            if row.obj_datatype and row.obj_datatype.endswith("#boolean"):
                obj = row.obj
            else:
                obj = _term_nt(row.obj, True, row.obj_lang, None)
                if row.obj_datatype:
                    obj = '"%s"^^%s' % (row.obj.replace('"', '\\"'), _qname(row.obj_datatype))
        else:
            obj = row.obj if row.obj.startswith("_:") else _qname(row.obj)
        fileobj.write("\n    %s %s" % (pred, obj))
        n += 1
    if current is not None:
        fileobj.write(" .\n")
    return n


# JSKOS shapes (parity: the reference's jskos-context.json framing,
# mc2skos.py:348-358): language-mapped label properties, uri-object sets
# for relations, plain lists for notation/identifier, scalar dates
_JSKOS_LANG_MAP = {"prefLabel"}          # {lang: value}
_JSKOS_LANG_LIST = {"altLabel", "hiddenLabel", "definition", "note",
                    "editorialNote", "scopeNote", "historyNote",
                    "changeNote", "example"}
_JSKOS_SCALAR = {"created", "modified", "issued"}  # no @set container
# context keys that rename the predicate's local name (jskos-context.json)
_JSKOS_RENAME = {
    "broaderTransitive": "ancestors",
    "hasTopConcept": "topConcepts",
    "componentList": "memberList",
}


def _group_json(df: pd.DataFrame, with_context: bool = True) -> pd.DataFrame:
    """Assemble one JSKOS-style JSON object per subject. Runs inside a
    hash bucket so per-subject grouping is node-local."""
    docs = []
    for subj, g in df.groupby("subj", sort=True):
        obj: dict = {"uri": subj}
        if with_context:
            obj["@context"] = "https://gbv.github.io/jskos/context.json"
        for row in g.itertuples(index=False):
            key = row.pred.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
            key = _JSKOS_RENAME.get(key, key)
            if key == "type":
                obj.setdefault("type", []).append(row.obj)
            elif row.obj_is_literal:
                lang = row.obj_lang or "und"
                if key in _JSKOS_LANG_MAP:
                    obj.setdefault(key, {})[lang] = row.obj
                elif key in _JSKOS_LANG_LIST:
                    obj.setdefault(key, {}).setdefault(lang, []).append(row.obj)
                elif key in _JSKOS_SCALAR:
                    obj[key] = row.obj
                else:
                    obj.setdefault(key, []).append(row.obj)
            else:
                obj.setdefault(key, []).append({"uri": row.obj})
        # deterministic member order inside language lists and uri sets
        for key in _JSKOS_LANG_LIST:
            if key in obj:
                obj[key] = {k: sorted(v) for k, v in obj[key].items()}
        for key, val in obj.items():
            if isinstance(val, list) and val and isinstance(val[0], dict):
                obj[key] = sorted(val, key=lambda d: d["uri"])
        docs.append({"subj": subj, "json": json.dumps(obj, sort_keys=True)})
    return pd.DataFrame(docs, columns=["subj", "json"])


def group_concepts_json(graph, num_buckets: int = 64, with_context: bool = True):
    """Dataset[graph] → Dataset[{subj, json}] — one NDJSON doc per concept."""
    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(bucket=(pd.util.hash_pandas_object(df["subj"], index=False)
                                 % num_buckets).astype("int32"))

    ds = graph.map_batches(add_bucket, batch_format="pandas")
    return ds.groupby("bucket").map_groups(
        lambda df: _group_json(df.drop(columns=["bucket"]), with_context),
        batch_format="pandas")


def write_jskos(graph, fileobj, num_buckets: int = 64) -> int:
    """Single-document JSKOS output (the reference's ``jskos`` outformat,
    mc2skos.py:348-354): ``{"@context": ..., "@graph": [concepts...]}``,
    sorted keys, indent 2, concepts ordered by URI. The per-concept
    framing is shared with the NDJSON path (jskos-context.json shapes).

    Driver-side assembly by design — one JSON document is an inherently
    small-output format; use NDJSON or parquet for large graphs.
    """
    docs = group_concepts_json(graph, num_buckets, with_context=False).to_pandas()
    docs = docs.sort_values("subj")
    body = [json.loads(j) for j in docs["json"]]
    out = {"@context": "https://gbv.github.io/jskos/context.json"}
    if len(body) == 1:
        out.update(body[0])
    else:
        out["@graph"] = body
    fileobj.write(json.dumps(out, sort_keys=True, indent=2))
    return len(body)
