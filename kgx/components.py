"""Connected components / sameAs-chain resolution.

The north-star extension to the reference's exact dedup: resolve
``owl:sameAs`` / ``skos:exactMatch`` chains into canonical components via
iterative hash-partitioned label propagation (a distributed union-find).

Algorithm (hash-to-min with pointer jumping): every node starts with its
own id as label; each round a node adopts the minimum of its own label,
its neighbours' labels, and its label's label (path halving → O(log n)
rounds even on chains). All exchanges are reduce-side joins over
(key, value) int64 pairs — hash-bucket the key, co-group, pandas-merge
inside the bucket — so the loop relies only on groupby, not on the
experimental Dataset.join.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from .readers import bounded_read_parquet as _bread


def _nparts():
    import ray

    return max(4, int(ray.cluster_resources().get("CPU", 8)))


def _kv(ds, kcol: str, vcol: str):
    # dtype-preserving: works for int64 node ids and for string URIs alike
    return ds.map_batches(
        lambda df: pd.DataFrame({"k": df[kcol], "v": df[vcol]}),
        batch_format="pandas")


def _join_kv(a, b, nparts: int):
    """Reduce-side hash join of two (k, v) datasets → (k, va, vb)."""

    def bucketed(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "k": df["k"], "v": df["v"],
                "side": np.int8(side),
                "bucket": (pd.util.hash_pandas_object(df["k"], index=False)
                           % nparts).astype("int32"),
            })
        return fn

    u = (a.map_batches(bucketed(0), batch_format="pandas")
         .union(b.map_batches(bucketed(1), batch_format="pandas")))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        lhs = df[df["side"] == 0][["k", "v"]]
        rhs = df[df["side"] == 1][["k", "v"]]
        m = lhs.merge(rhs, on="k", suffixes=("_a", "_b"))
        return pd.DataFrame({"k": m["k"],
                             "va": m["v_a"],
                             "vb": m["v_b"]})

    return u.groupby("bucket").map_groups(merge, batch_format="pandas")


def _min_by_node(ds, nparts: int):
    """(node, label) → per-node minimum label, via bucketed local groupby."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # local combiner first — shrinks the shuffle
        df = df.groupby("node", as_index=False)["label"].min()
        return df.assign(bucket=(pd.util.hash_pandas_object(df["node"],
                                                            index=False)
                                 % nparts).astype("int32"))

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["label"].min()

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(reduce, batch_format="pandas"))


def _local_components(edges):
    """Single-task union-find over the whole edge list — the small-graph
    fast path. The distributed loop pays ~3 co-grouped shuffles per
    round; when the edge list fits one worker's heap (the common case
    even at corpus scale: only the duplicated fraction of documents
    appears in the pair graph), one task with path-compressed union-find
    answers in milliseconds. Union always attaches the larger root under
    the smaller, so every root is its component's minimum — the same
    contract as the distributed path."""

    def uf(df: pd.DataFrame) -> pd.DataFrame:
        parent: dict = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        a_arr = df["a"].to_numpy()
        b_arr = df["b"].to_numpy()
        for a, b in zip(a_arr, b_arr):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        nodes = set(map(int, a_arr)) | set(map(int, b_arr))
        out_n = sorted(nodes)
        return pd.DataFrame({
            "node": pd.Series(out_n, dtype="int64"),
            "component": pd.Series([find(n) for n in out_n], dtype="int64"),
        })

    return edges.repartition(1).map_batches(uf, batch_format="pandas",
                                            batch_size=None)


def connected_components(edges, max_iters: int = 20,
                         num_partitions: Optional[int] = None,
                         small_graph_threshold: int = 2_000_000):
    """Dataset[(a:int64, b:int64)] → Dataset[(node:int64, component:int64)].

    ``component`` is the minimum node id reachable through the edge set.
    Edge lists at or below ``small_graph_threshold`` take the single-task
    union-find fast path (pass 0 to force the distributed loop).
    """
    nparts = num_partitions or _nparts()
    edges = edges.materialize()
    if edges.count() <= small_graph_threshold:
        connected_components.last_rounds = 0  # local gate, no loop
        return _local_components(edges)

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.concat([df["a"], df["b"]]).unique()
        return pd.DataFrame({"node": pd.Series(nodes, dtype="int64"),
                             "label": pd.Series(nodes, dtype="int64")})

    labels = _min_by_node(
        edges.map_batches(init_labels, batch_format="pandas"), nparts)
    labels = labels.materialize()

    def tagged(ds, kcol, vcol, side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            k = df[kcol].astype("int64")
            return pd.DataFrame({
                "k": k, "v": df[vcol].astype("int64"),
                "side": np.int8(side),
                "bucket": (pd.util.hash_pandas_object(k, index=False)
                           % nparts).astype("int32"),
            })
        return ds.map_batches(fn, batch_format="pandas")

    def probe_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # side 0 = labels keyed by node; sides 1.. = probes whose v is the
        # destination node and whose k must match a labelled node
        build = df[df["side"] == 0][["k", "v"]]
        probes = df[df["side"] != 0][["k", "v"]]
        m = probes.merge(build, on="k", suffixes=("_dst", "_lbl"))
        return pd.DataFrame({"node": m["v_dst"].astype("int64"),
                             "label": m["v_lbl"].astype("int64")})

    prev_sum = None
    rounds = 0
    for _ in range(max_iters):
        # ONE co-grouped shuffle answers all three lookups against the
        # label table: neighbour messages through both edge directions and
        # the pointer-jumping chase (label of label → path halving)
        u = tagged(labels, "node", "label", 0).union(
            tagged(edges, "a", "b", 1),
            tagged(edges, "b", "a", 2),
            tagged(labels, "label", "node", 3),
        )
        messages = u.groupby("bucket").map_groups(
            probe_bucket, batch_format="pandas")
        labels = _min_by_node(labels.union(messages), nparts)
        # repartition: the shuffle's output block count compounds ~3× per
        # round otherwise (40 → 1288 blocks by round 3); materialize pins
        # the result so the next round's lineage starts flat
        labels = labels.repartition(nparts).materialize()

        rounds += 1
        total = labels.sum("label")
        if total == prev_sum:
            break
        prev_sum = total

    # observability for the skew tests: pointer jumping must keep this
    # O(log diameter), never O(diameter)
    connected_components.last_rounds = rounds
    return labels.map_batches(
        lambda df: df.rename(columns={"label": "component"}),
        batch_format="pandas")


def transitive_closure(edges, max_iters: int = 30,
                       num_partitions: Optional[int] = None,
                       small_graph_threshold: int = 2_000_000):
    """Dataset[(a, b)] → Dataset[(a, b)] of all pairs with a path a→…→b.

    Path-doubling iterate-until-fixpoint (the reference's ``--skosify``
    transitive-hierarchy cleanup, SURVEY A4, distributed): each round
    joins the current path set against ITSELF (a→b ⋈ b→c → a→c), so the
    reachable path length doubles per round — ``ceil(log2(depth))``
    rounds instead of ``depth``. All exchanges are reduce-side kv joins
    (hash-bucket co-group, no Dataset.join); the per-round ``count()`` is
    free because the path set is materialized.

    Edge lists at or below ``small_graph_threshold`` take a single-task
    pandas path-doubling gate (pass 0 to force the distributed loop) —
    the same gate as connected_components/pagerank/bfs/scc; pinned
    row-identical by test. The distributed rounds cost ~4 co-grouped
    exchanges each, pure orchestration below millions of edges
    (measured 15.2 → 2.8 s on kg_subtree_sizes at sf0.1/32).
    """
    import ray.data

    edges = edges.materialize()
    if edges.count() <= small_graph_threshold:
        p = edges.to_pandas().drop_duplicates(subset=["a", "b"])
        for _ in range(max_iters):
            step = p.merge(p, left_on="b", right_on="a",
                           suffixes=("", "_r"))
            step = pd.DataFrame({"a": step["a"], "b": step["b_r"]})
            new = (pd.concat([p, step], ignore_index=True)
                   .drop_duplicates(subset=["a", "b"]))
            if len(new) == len(p):
                break
            p = new
        return ray.data.from_pandas(p.reset_index(drop=True))

    nparts = num_partitions or _nparts()

    def dedup_pairs(ds):
        def add_part(df: pd.DataFrame) -> pd.DataFrame:
            df = df.drop_duplicates(subset=["a", "b"])
            pk = pd.util.hash_pandas_object(df[["a", "b"]], index=False)
            return df.assign(part=(pk % nparts).astype("int32"))

        return (ds.map_batches(add_part, batch_format="pandas")
                .groupby("part").map_groups(
                    lambda df: df.drop_duplicates(subset=["a", "b"])[["a", "b"]],
                    batch_format="pandas"))

    paths = dedup_pairs(edges).repartition(nparts).materialize()
    total = paths.count()
    for _ in range(max_iters):
        # paths (a, b) ⋈ paths (b, c) → (a, c): path length doubles
        step = _join_kv(_kv(paths, "b", "a"), _kv(paths, "a", "b"), nparts)
        step = step.map_batches(
            lambda df: pd.DataFrame({"a": df["va"], "b": df["vb"]}),
            batch_format="pandas")
        paths = dedup_pairs(paths.union(step)).repartition(nparts).materialize()
        new_total = paths.count()
        if new_total == total:
            break
        total = new_total
    return paths


def skos_transitive_triples(triples, num_partitions: Optional[int] = None,
                            narrower: bool = True):
    """``--skosify`` cleanup pass (reference: mc2skos.py:198-201 with
    examples/skosify.cfg ``transitive=True, narrower=True`` → skosify's
    ``infer.skos_transitive``): the transitive closure of ``skos:broader``
    emitted as ``skos:broaderTransitive`` (and, with ``narrower``, the
    inverse ``skos:narrowerTransitive``) triples.

    Input is a TRIPLES/GRAPH-schema Dataset; output is a TRIPLES-schema
    Dataset of the new closure triples (url='' lineage), ready to union
    into the stream before the canonicalize dedup+sort shuffle.
    """
    SKOS = "http://www.w3.org/2004/02/skos/core#"
    broader = SKOS + "broader"

    def edges_batch(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["pred"] == broader]
        return pd.DataFrame({"a": e["subj"].astype(str),
                             "b": e["obj"].astype(str)})

    closure = transitive_closure(
        triples.map_batches(edges_batch, batch_format="pandas"),
        num_partitions=num_partitions)

    def to_triples(df: pd.DataFrame):
        import pyarrow as pa

        from .schemas import TRIPLES

        subj = list(df["a"])
        obj = list(df["b"])
        pred = [SKOS + "broaderTransitive"] * len(df)
        if narrower:
            subj += list(df["b"])
            obj += list(df["a"])
            pred += [SKOS + "narrowerTransitive"] * len(df)
        n = len(subj)
        # Arrow output: the union downstream requires homogeneous block types
        return pa.Table.from_pydict({
            "url": pa.array([""] * n, pa.string()),
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(pred, pa.string()),
            "obj": pa.array(obj, pa.string()),
            "obj_is_literal": pa.array([False] * n, pa.bool_()),
            "obj_lang": pa.nulls(n, pa.string()),
            "obj_datatype": pa.nulls(n, pa.string()),
        }, schema=TRIPLES)

    return closure.map_batches(to_triples, batch_format="pandas")


def skos_repair(triples, num_partitions: Optional[int] = None,
                small_graph_threshold: int = 2_000_000,
                mark_top_concepts: bool = True):
    """HIERARCHY-CYCLE REMOVAL + TOP-CONCEPT (orphan) REPAIR — the two
    ``skosify.skosify`` cleanup actions beyond the transitive closure
    (the reference delegates to skosify, mc2skos.py:198-201, whose
    hierarchy check drops cycle-closing broader edges and whose
    mark-top-concepts step flags broader-less in-scheme concepts).

    Cycle rule (deterministic and ORDER-FREE — skosify's DFS drops a
    traversal-order-dependent back edge, which a distributed engine
    cannot reproduce): a ``skos:broader`` edge is dropped iff both
    endpoints lie in the same broader-graph SCC AND subj >= obj
    (string order). Within an SCC the kept edges all point
    string-increasing, so the remaining graph is acyclic; cross-SCC
    edges are never touched (the condensation is already a DAG);
    self-loops always drop. Acyclic inputs pass through unchanged —
    every SCC is a singleton, and a singleton's only intra-SCC edge
    would be a self-loop.

    Orphan rule: after the drop, every subject with a
    ``skos:inScheme`` edge, NO remaining broader edge and no existing
    ``skos:topConceptOf`` gains (c, topConceptOf, scheme) and
    (scheme, hasTopConcept, c).

    Scale shape: one SCC run over the broader edge set (scc_labels —
    single-task Kosaraju gate under ``small_graph_threshold``, the
    distributed elimination loop above it) plus three bucketed
    co-group exchanges (attach subj-label, attach obj-label, orphan
    anti-join), each keyed on a 64-bit content hash coarsened to
    ``nparts`` Ray groups. The node hash is internal only (SCC
    membership equality); the drop rule itself compares URI strings,
    so the SQL oracle replays it without the hash. Assumes no 64-bit
    hash collision between distinct URIs (birthday-safe below ~10^9
    distinct nodes).
    """
    import ray.data

    SKOS = "http://www.w3.org/2004/02/skos/core#"
    broader_p = SKOS + "broader"
    in_scheme_p = SKOS + "inScheme"
    top_of_p = SKOS + "topConceptOf"
    has_top_p = SKOS + "hasTopConcept"

    nparts = num_partitions or _nparts()
    triples = triples.materialize()
    cols = triples.schema().names

    def h64(s: pd.Series) -> np.ndarray:
        return pd.util.hash_pandas_object(
            s.astype(str), index=False).to_numpy("uint64") \
            .astype("int64")

    # ---- intra-SCC (cycle-closing) edge detection -------------------
    # small-graph gate (the connected_components/scc convention): a
    # broader edge list that fits one worker's heap resolves its SCCs
    # and drop pairs in a single local pass instead of paying the
    # scc_labels run + two label-attach co-groups below
    edge_pairs = triples.map_batches(
        lambda df: df.loc[df["pred"] == broader_p, ["subj", "obj"]],
        batch_format="pandas").materialize()
    if edge_pairs.count() <= small_graph_threshold:
        e = edge_pairs.to_pandas()
        ik = pd.concat([e["subj"], e["obj"]], ignore_index=True)
        codes, _ = pd.factorize(ik)
        half = len(e)
        loc = _kosaraju(pd.DataFrame({
            "src": codes[:half].astype("int64"),
            "dst": codes[half:].astype("int64")}))
        lab = dict(zip(loc["node"], loc["scc_id"]))
        same = np.array([lab.get(a, -1) == lab.get(b, -2)
                         for a, b in zip(codes[:half], codes[half:])],
                        dtype=bool)
        hit = e[same & (e["subj"] >= e["obj"]).to_numpy()]
        drops = hit.drop_duplicates()
        return _skos_repair_apply(triples, cols, drops, nparts,
                                  mark_top_concepts, h64)

    def edges_batch(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["pred"] == broader_p]
        return pd.DataFrame({"src": h64(e["subj"]), "dst": h64(e["obj"])})

    labels = scc_labels(
        triples.map_batches(edges_batch, batch_format="pandas"),
        small_graph_threshold=small_graph_threshold,
        num_partitions=nparts, id_col="node").materialize()

    # two uniform-schema co-groups attach subj- then obj-SCC labels to
    # the (subj, obj) edge key table; the resulting DROP-PAIR set is
    # anomaly-sized by construction (only edges inside actual cycles)
    # and broadcasts back as a map-side blacklist — a corpus where the
    # drop set rivals the corpus is corrupt beyond repair, asserted.
    FRAME = ["node", "scc", "side", "subj", "obj", "scc_s", "bucket"]

    def lab_frame(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        node = df["node"].astype("int64")
        return pd.DataFrame({
            "node": node.to_numpy(),
            "scc": df["scc_id"].astype("int64").to_numpy(),
            "side": np.full(n, 0, dtype="int8"),
            "subj": [""] * n, "obj": [""] * n,
            "scc_s": np.zeros(n, dtype="int64"),
            "bucket": (node % nparts).astype("int32").to_numpy()})[FRAME]

    def edge_frame(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["pred"] == broader_p]
        n = len(e)
        node = h64(e["subj"])
        return pd.DataFrame({
            "node": node,
            "scc": np.zeros(n, dtype="int64"),
            "side": np.full(n, 1, dtype="int8"),
            "subj": e["subj"].astype(str).to_numpy(),
            "obj": e["obj"].astype(str).to_numpy(),
            "scc_s": np.zeros(n, dtype="int64"),
            "bucket": (node % nparts).astype("int32")})[FRAME]

    def attach_subj(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["side"] == 0][["node", "scc"]]
        body = df[df["side"] == 1].drop(columns=["scc", "scc_s"])
        m = body.merge(lab, on="node", how="left")
        m["scc_s"] = m["scc"].fillna(-1).astype("int64")
        m["scc"] = np.int64(0)
        node = h64(m["obj"])  # re-key for the obj-label pass
        m["node"] = node
        m["bucket"] = (node % nparts).astype("int32")
        return m[FRAME]

    def attach_obj(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["side"] == 0][["node", "scc"]]
        body = df[df["side"] == 1].drop(columns=["scc"])
        m = body.merge(lab, on="node", how="left")
        scc_o = m["scc"].fillna(-2).astype("int64")
        hit = m[(m["scc_s"] == scc_o)
                & (m["subj"] >= m["obj"])]
        return hit[["subj", "obj"]].drop_duplicates()

    lab_ds = labels.map_batches(lab_frame, batch_format="pandas")
    pass1 = lab_ds.union(
        triples.map_batches(edge_frame, batch_format="pandas")) \
        .groupby("bucket").map_groups(attach_subj,
                                      batch_format="pandas")
    drops = lab_ds.union(pass1) \
        .groupby("bucket").map_groups(attach_obj,
                                      batch_format="pandas") \
        .to_pandas()
    return _skos_repair_apply(triples, cols, drops, nparts,
                              mark_top_concepts, h64)


def _skos_repair_apply(triples, cols, drops: pd.DataFrame, nparts: int,
                       mark_top_concepts: bool, h64):
    """Shared tail of ``skos_repair``: broadcast the drop-pair
    blacklist, filter the broader rows map-side, and (optionally) run
    the orphan-repair co-group."""
    SKOS = "http://www.w3.org/2004/02/skos/core#"
    broader_p = SKOS + "broader"
    in_scheme_p = SKOS + "inScheme"
    top_of_p = SKOS + "topConceptOf"
    has_top_p = SKOS + "hasTopConcept"

    assert len(drops) < 10_000_000, \
        "skos_repair: %d cycle-closing broader edges — the hierarchy " \
        "is not anomalously cyclic, it is mostly cycles; refusing to " \
        "broadcast a corpus-sized blacklist" % len(drops)
    drop_set = frozenset(zip(drops["subj"], drops["obj"]))

    def split_rest(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["pred"] != broader_p]

    rest_rows = triples.map_batches(split_rest, batch_format="pandas")

    def apply_drop(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["pred"] == broader_p]
        if not drop_set:
            return e[cols]
        keys = list(zip(e["subj"].astype(str), e["obj"].astype(str)))
        mask = np.array([k not in drop_set for k in keys], dtype=bool)
        return e.loc[mask, cols]

    kept_broader = triples.map_batches(apply_drop,
                                       batch_format="pandas") \
        .materialize()

    if not mark_top_concepts:
        return rest_rows.union(kept_broader)

    # orphan repair: inScheme subjects with no kept broader and no
    # existing topConceptOf
    def probe_rows(side: int, keep_obj: bool):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "subj": df["subj"].astype(str),
                "obj": df["obj"].astype(str) if keep_obj else "",
            })
            out["side"] = np.int8(side)
            out["bucket"] = (h64(out["subj"]) % nparts).astype("int32")
            return out
        return fn

    def filter_pred(p: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df[df["pred"] == p]
        return fn

    u = (triples.map_batches(filter_pred(in_scheme_p),
                             batch_format="pandas")
         .map_batches(probe_rows(0, True), batch_format="pandas")) \
        .union(kept_broader.map_batches(probe_rows(1, False),
                                        batch_format="pandas")) \
        .union(triples.map_batches(filter_pred(top_of_p),
                                   batch_format="pandas")
               .map_batches(probe_rows(2, False),
                            batch_format="pandas"))

    def orphan_triples(df: pd.DataFrame) -> pd.DataFrame:
        has_parent = set(df.loc[df["side"] == 1, "subj"])
        has_top = set(df.loc[df["side"] == 2, "subj"])
        sch = df[df["side"] == 0]
        orphan = sch[~sch["subj"].isin(has_parent)
                     & ~sch["subj"].isin(has_top)]
        n = len(orphan)
        out = pd.DataFrame({
            "subj": list(orphan["subj"]) + list(orphan["obj"]),
            "pred": [top_of_p] * n + [has_top_p] * n,
            "obj": list(orphan["obj"]) + list(orphan["subj"]),
        })
        out["obj_is_literal"] = False
        out["obj_lang"] = pd.Series([None] * 2 * n, dtype="object")
        out["obj_datatype"] = pd.Series([None] * 2 * n, dtype="object")
        if "url" in cols:
            out["url"] = ""
        return out[cols]

    added = u.groupby("bucket").map_groups(orphan_triples,
                                           batch_format="pandas")
    return rest_rows.union(kept_broader).union(added)


def broader_closure(sf_dir: str):
    """All (doc_id, ancestor) pairs under the documents broader-chain
    (parent = doc_id // 2), computed by distributed transitive closure.
    SQL oracle: recursive CTE."""
    import ray.data

    docs = ray.data.read_parquet("%s/documents.parquet" % sf_dir,
                                 columns=["doc_id"])

    def edges_batch(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["doc_id"] > 0]
        return pd.DataFrame({"a": d["doc_id"].astype("int64"),
                             "b": (d["doc_id"] // 2).astype("int64")})

    closure = transitive_closure(
        docs.map_batches(edges_batch, batch_format="pandas"))
    return closure.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["a"].astype("int64"),
                                 "ancestor": df["b"].astype("int64")}),
        batch_format="pandas")


def sameas_components(sf_dir: str):
    """Demo pipeline: documents of the same ``source`` are chained by
    consecutive doc_id (a deterministic sameAs-like edge set); the
    component id is therefore the source group's minimum doc_id.
    Returns (doc_id, component)."""
    import ray.data

    docs = ray.data.read_parquet("%s/documents.parquet" % sf_dir,
                                 columns=["doc_id", "source"])

    def chain_edges(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id")
        prev = df["doc_id"].shift(1)
        out = df[prev.notna()]
        return pd.DataFrame({"a": prev.dropna().astype("int64").values,
                             "b": out["doc_id"].astype("int64").values})

    edges = docs.groupby("source").map_groups(chain_edges, batch_format="pandas")
    comp = connected_components(edges)
    return comp.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["node"].astype("int64"),
                                 "component": df["component"].astype("int64")}),
        batch_format="pandas")


_PR_Q = 1 << 40  # rank mass quantum: ranks are int64 multiples of Q/N


def _local_pagerank(edges, num_nodes: int, iters: int, seeds=None):
    """Single-task vectorized PageRank — the small-graph fast path.
    Bit-identical to the distributed loop (same int64 floor arithmetic;
    np.add.at sums are exact integers, so order is irrelevant).
    ``seeds`` switches to PERSONALIZED PageRank: the restart mass (and
    the initial rank) concentrates on the seed set instead of spreading
    uniformly."""

    def run(df: pd.DataFrame) -> pd.DataFrame:
        src = df["src"].to_numpy(dtype=np.int64)
        dst = df["dst"].to_numpy(dtype=np.int64)
        deg = np.zeros(num_nodes, dtype=np.int64)
        np.add.at(deg, src, 1)
        assert deg.min() > 0, "pagerank: dangling node (no out-edges)"
        if seeds is None:
            base = np.full(num_nodes,
                           (15 * (_PR_Q // num_nodes)) // 100,
                           dtype=np.int64)
            r = np.full(num_nodes, _PR_Q // num_nodes, dtype=np.int64)
        else:
            sd = np.asarray(sorted(int(x) for x in seeds),
                            dtype=np.int64)
            share = _PR_Q // len(sd)
            base = np.zeros(num_nodes, dtype=np.int64)
            base[sd] = (15 * share) // 100
            r = np.zeros(num_nodes, dtype=np.int64)
            r[sd] = share
        for _ in range(iters):
            acc = np.zeros(num_nodes, dtype=np.int64)
            np.add.at(acc, dst, r[src] // deg[src])
            r = base + (85 * acc) // 100
        return pd.DataFrame({"node": np.arange(num_nodes, dtype=np.int64),
                             "rank_q": r})

    return edges.repartition(1).map_batches(run, batch_format="pandas",
                                            batch_size=None)


def pagerank_ranks(edges, num_nodes: int, iters: int = 8,
                   num_partitions: Optional[int] = None,
                   small_graph_threshold: int = 2_000_000,
                   seeds=None):
    """Dataset[(src:int64, dst:int64)] → Dataset[(node, rank_q)] —
    integer-quantized PageRank, damping 85/100, over nodes 0..num_nodes-1.

    All arithmetic is int64 floor division on non-negative values
    (contribution = rank // out-degree; new rank = base + 85·Σ // 100),
    so per-node sums are order-independent and the fixed-iteration
    DuckDB oracle reproduces every rank bit-for-bit — no float
    summation-order divergence. Every node needs ≥1 out-edge (no
    dangling mass; asserted per batch).

    Edge lists at or below ``small_graph_threshold`` take a single-task
    vectorized fast path (pass 0 to force the distributed loop): the
    distributed rounds cost ~2 co-grouped shuffles each, pure
    orchestration below millions of edges — the same gate
    ``connected_components`` uses.

    Scale shape (distributed path): out-degrees fold into the edge table
    via one bucketed count (combiner first), then the degree-annotated
    edge table is bucketed by hash(src) ONCE and materialized — each of
    the ``iters`` rounds re-ships only the rank vector (2 int64s per
    node) through (1) a src-bucket co-group producing per-batch
    pre-summed (dst, contrib) rows and (2) a dst-hash aggregate. The
    edge list — the big side at web scale — never re-shuffles.
    """
    import ray.data

    edges = edges.materialize()
    if edges.count() <= small_graph_threshold:
        return _local_pagerank(edges, num_nodes, iters, seeds=seeds)

    nparts = num_partitions or _nparts()

    def e_norm(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"src": df["src"].astype("int64"),
                            "dst": df["dst"].astype("int64")})
        out["bucket"] = (pd.util.hash_pandas_object(out["src"], index=False)
                         % nparts).astype("int32")
        return out

    # out-degree: per-batch combiner → bucketed sum (reuses the edge
    # buckets so the degree join below is a local merge per bucket)
    def local_deg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["bucket", "src"], as_index=False).size()
        return g.rename(columns={"size": "deg"})

    eb = edges.map_batches(e_norm, batch_format="pandas")
    deg = (eb.map_batches(local_deg, batch_format="pandas")
           .groupby("bucket").map_groups(
               lambda df: df.groupby(["bucket", "src"], as_index=False)
               ["deg"].sum(), batch_format="pandas"))

    def attach_deg(df: pd.DataFrame) -> pd.DataFrame:
        lhs = df[df["side"] == 0][["src", "dst", "bucket"]]
        rhs = df[df["side"] == 1][["src", "deg"]]
        m = lhs.merge(rhs, on="src")
        return m[["src", "dst", "deg", "bucket"]]

    def tag(side):
        # union() needs byte-identical schemas: fix column order + dtypes
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "src": df["src"].astype("int64"),
                "dst": (df["dst"] if "dst" in df else 0 * df["src"])
                .astype("int64"),
                "deg": (df["deg"] if "deg" in df else 0 * df["src"])
                .astype("int64"),
                "bucket": df["bucket"].astype("int32"),
                "side": np.int8(side),
            })
        return fn

    tagged_e = eb.map_batches(tag(0), batch_format="pandas")
    tagged_d = deg.map_batches(tag(1), batch_format="pandas")
    edge_tbl = (tagged_e.union(tagged_d).groupby("bucket")
                .map_groups(attach_deg, batch_format="pandas")
                .materialize())

    # seeds=None → classic uniform restart; else PERSONALIZED restart:
    # the seed set broadcasts via closure (PPR seeds are an entity
    # neighborhood — small by use-case, unlike the node universe)
    if seeds is None:
        base_uniform = (15 * (_PR_Q // num_nodes)) // 100
        seed_set = None
        seed_base = 0
        init_r = _PR_Q // num_nodes

        def init_rank(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": df["id"].astype("int64"),
                "r": np.int64(init_r)})
    else:
        seed_set = frozenset(int(x) for x in seeds)
        share = _PR_Q // len(seed_set)
        seed_base = (15 * share) // 100
        base_uniform = None

        def init_rank(df: pd.DataFrame) -> pd.DataFrame:
            nodes = df["id"].astype("int64")
            return pd.DataFrame({
                "node": nodes,
                "r": np.where(nodes.isin(seed_set), np.int64(share),
                              np.int64(0))})

    ranks = ray.data.range(num_nodes).map_batches(
        init_rank, batch_format="pandas")
    zeros = ray.data.range(num_nodes).map_batches(
        lambda df: pd.DataFrame({"dst": df["id"].astype("int64"),
                                 "c": np.int64(0)}),
        batch_format="pandas").materialize()

    def rank_tag(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"src": df["node"].astype("int64"),
                            "dst": np.int64(0),
                            "deg": df["r"].astype("int64")})  # r rides in deg
        out["bucket"] = (pd.util.hash_pandas_object(out["src"], index=False)
                         % nparts).astype("int32")
        return out.assign(side=np.int8(2))

    def contribs(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["side"] != 2]
        r = df[df["side"] == 2][["src", "deg"]].rename(columns={"deg": "r"})
        m = e.merge(r, on="src")
        assert len(m) == len(e), "pagerank: node without a rank row"
        out = pd.DataFrame({"dst": m["dst"],
                            "c": m["r"] // m["deg"]})
        # combiner: pre-sum per dst before the dst-hash shuffle
        return out.groupby("dst", as_index=False)["c"].sum()

    def dst_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            bucket=(pd.util.hash_pandas_object(df["dst"], index=False)
                    % nparts).astype("int32"))

    def new_rank(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("dst", as_index=False)["c"].sum()
        if seed_set is None:
            b = base_uniform
        else:
            b = np.where(g["dst"].astype("int64").isin(seed_set),
                         np.int64(seed_base), np.int64(0))
        return pd.DataFrame({
            "node": g["dst"].astype("int64"),
            "r": (b + (85 * g["c"]) // 100).astype("int64")})

    edge_sided = edge_tbl.map_batches(
        lambda df: df.assign(side=np.int8(0)), batch_format="pandas")
    for _ in range(iters):
        msgs = (edge_sided.union(
                    ranks.map_batches(rank_tag, batch_format="pandas"))
                .groupby("bucket")
                .map_groups(contribs, batch_format="pandas"))
        ranks = (msgs.union(zeros)
                 .map_batches(dst_bucket, batch_format="pandas")
                 .groupby("bucket")
                 .map_groups(new_rank, batch_format="pandas"))
        # pin lineage flat: chained co-group rounds otherwise compound
        # block counts and re-execute the whole prefix per round
        ranks = ranks.repartition(nparts).materialize()

    return ranks.map_batches(
        lambda df: df.rename(columns={"r": "rank_q"}), batch_format="pandas")


def pagerank(sf_dir: str, iters: int = 8):
    """(doc_id, rank_q) — PageRank over a deterministic two-rule edge set
    on documents: doc_id → doc_id // 2 (the broader chain) and
    doc_id → (doc_id² + 1) mod N (a scattering rule, so in-degrees vary).
    Every doc's edges derive from its own row, so the per-batch
    drop_duplicates is globally exact. SQL oracle: the same fixed-point
    arithmetic unrolled as one chain of CTEs (queries._pagerank_sql)."""
    import ray.data

    docs = ray.data.read_parquet("%s/documents.parquet" % sf_dir,
                                 columns=["doc_id"])
    n = docs.count()

    def edge_batch(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        tree = pd.DataFrame({"src": ids[ids > 0],
                             "dst": (ids[ids > 0] // 2)})
        scatter = pd.DataFrame({"src": ids, "dst": (ids * ids + 1) % n})
        return pd.concat([tree, scatter]).drop_duplicates()

    edges = docs.map_batches(edge_batch, batch_format="pandas")
    out = pagerank_ranks(edges, num_nodes=n, iters=iters)
    return out.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["node"].astype("int64"),
                                 "rank_q": df["rank_q"].astype("int64")}),
        batch_format="pandas")


def harmonic_centrality(sf_dir: str, sources=(0, 1, 2, 3),
                        small_graph_threshold: int = 2_000_000):
    """(doc_id, harm_q20) — SAMPLED HARMONIC CENTRALITY over the
    two-rule document graph: H_S(v) = Σ_{s∈S, 0<d(s,v)} ⌊2^20/d(s,v)⌋
    with d the directed BFS hop distance from each of |S| fixed sample
    sources (the Eppstein–Wang estimation scheme: exact centrality is
    all-sources BFS; a fixed sample gives the standard pivot
    estimator, and harmonic — unlike closeness — handles unreachable
    pairs by contributing 0 instead of ∞). Contributions are
    floor-quantized integers BEFORE the sum, so the oracle (one
    recursive min-distance CTE per source, the diameter_estimate
    machinery) hash-matches bit-for-bit.

    Scale shape: |S| ``bfs_levels`` traversals (edge table bucketed
    once per traversal, frontier-only shuffles; single-task gate under
    the threshold), then one hash(doc) bucket-sum of |S| node-sized
    contribution tables. Nodes unreached from every source surface
    with harm_q20 = 0 via the document spine.
    """
    import ray.data

    docs = _bread("%s/documents.parquet" % sf_dir,
                  columns=["doc_id"])
    n = docs.count()
    nparts = _nparts()

    def edge_batch(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        tree = pd.DataFrame({"src": ids[ids > 0],
                             "dst": (ids[ids > 0] // 2)})
        scatter = pd.DataFrame({"src": ids, "dst": (ids * ids + 1) % n})
        return pd.concat([tree, scatter]).drop_duplicates()

    edges = docs.map_batches(edge_batch,
                             batch_format="pandas").materialize()

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["dist"] > 0]
        out = pd.DataFrame({
            "doc_id": d["node"].astype("int64"),
            "c": (np.int64(1 << 20)
                  // d["dist"].astype("int64").to_numpy())})
        out["bucket"] = (out["doc_id"] % nparts).astype("int32")
        return out

    parts = None
    for s in sources:
        lev = bfs_levels(edges, [int(s)],
                         small_graph_threshold=small_graph_threshold)
        if not hasattr(lev, "map_batches"):
            lev = ray.data.from_pandas(lev)
        c = lev.map_batches(contrib, batch_format="pandas")
        parts = c if parts is None else parts.union(c)

    spine = docs.map_batches(
        lambda df: pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "c": np.int64(0),
            "bucket": (df["doc_id"].astype("int64")
                       % nparts).astype("int32")}),
        batch_format="pandas")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False)["c"].sum()
        return pd.DataFrame({"doc_id": g["doc_id"].astype("int64"),
                             "harm_q20": g["c"].astype("int64")})

    return parts.union(spine).groupby("bucket") \
        .map_groups(fold, batch_format="pandas")


def personalized_pagerank(sf_dir: str, iters: int = 8,
                          seed_mod: int = 101):
    """(doc_id, ppr_q) — PERSONALIZED PageRank over the same two-rule
    document graph as ``pagerank``, with the restart mass concentrated
    on the seed set {doc_id % seed_mod == 0} instead of uniform: the
    KG relatedness primitive (PPR from an entity's neighborhood ranks
    the graph by proximity to it — entity recommendation, related-
    concept panels, seed-expanded retrieval all start here; Jeh &
    Widom WWW 2003). Same integer-quantized fixed-iteration arithmetic
    as pagerank (int64 floor division throughout), so the unrolled-CTE
    SQL oracle reproduces every rank bit-for-bit.

    Scale shape: identical to pagerank_ranks (edge table bucketed
    once, rank vector re-ships per round) plus a broadcast seed set —
    PPR seeds are an entity neighborhood, small by use-case.
    """
    import ray.data

    docs = ray.data.read_parquet("%s/documents.parquet" % sf_dir,
                                 columns=["doc_id"])
    n = docs.count()
    seeds = np.arange(0, n, seed_mod, dtype=np.int64)

    def edge_batch(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        tree = pd.DataFrame({"src": ids[ids > 0],
                             "dst": (ids[ids > 0] // 2)})
        scatter = pd.DataFrame({"src": ids, "dst": (ids * ids + 1) % n})
        return pd.concat([tree, scatter]).drop_duplicates()

    edges = docs.map_batches(edge_batch, batch_format="pandas")
    out = pagerank_ranks(edges, num_nodes=n, iters=iters, seeds=seeds)
    return out.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["node"].astype("int64"),
                                 "ppr_q": df["rank_q"].astype("int64")}),
        batch_format="pandas")


def triangle_count(sf_dir: str, threshold: float = 0.8,
                   num_partitions: Optional[int] = None):
    """Single row (n_triangles,) — exact triangle count of the near-dup
    pair graph (``jaccard_pairs`` edges; dup clusters are near-cliques,
    so triangles measure cluster density). Degree-ordered wedge
    enumeration — the scale-correct distributed formulation: every
    triangle is counted exactly once at its minimum-(degree, node)
    vertex, and orienting edges toward the higher-degree endpoint bounds
    every node's out-degree by ~sqrt(|E|), so wedge generation never
    explodes at a hub the way naive neighbor-pairing does.

    Four bucketed exchanges over edge-sized rows (never node-state):
    by node (global degrees — a node's incident edges co-locate), by
    edge (merge the two degree halves, orient), by source (wedges from
    each node's bounded out-neighborhood), by candidate pair (wedge ∩
    edge existence). Partial counts sum in a one-row tail.
    """
    from .dedup import jaccard_pairs

    nparts = num_partitions or _nparts()
    pairs = jaccard_pairs(sf_dir, threshold, num_partitions=nparts)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        a = df["doc_id_a"].astype("int64")
        b = df["doc_id_b"].astype("int64")
        out = pd.DataFrame({
            "node": pd.concat([a, b], ignore_index=True),
            "other": pd.concat([b, a], ignore_index=True)})
        out["bucket"] = (pd.util.hash_pandas_object(out["node"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    def attach_deg(df: pd.DataFrame) -> pd.DataFrame:
        # every incident edge of a node hashes here, so the count is its
        # GLOBAL degree
        deg = df.groupby("node")["other"].transform("size")
        u = np.minimum(df["node"], df["other"])
        w = np.maximum(df["node"], df["other"])
        return pd.DataFrame({
            "u": u.astype("int64"), "w": w.astype("int64"),
            "node": df["node"].astype("int64"),
            "deg": deg.astype("int64"),
            "bucket": ((pd.util.hash_pandas_object(u, index=False)
                        * 31 + pd.util.hash_pandas_object(w, index=False))
                       % nparts).astype("int32")})

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        # two rows per edge (one per endpoint); merge them and point the
        # edge at the higher-(deg, node) end
        lhs = df[df["node"] == df["u"]]
        rhs = df[df["node"] == df["w"]][["u", "w", "deg"]]
        m = lhs.merge(rhs, on=["u", "w"], suffixes=("_u", "_w"))
        u_first = (m["deg_u"] < m["deg_w"]) | (
            (m["deg_u"] == m["deg_w"]) & (m["u"] < m["w"]))
        src = np.where(u_first, m["u"], m["w"])
        dst = np.where(u_first, m["w"], m["u"])
        return pd.DataFrame({
            "src": src.astype("int64"), "dst": dst.astype("int64"),
            "bucket": (pd.Series(src).pipe(
                pd.util.hash_pandas_object, index=False)
                % nparts).astype("int32")})

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        # wedge (u, w) per out-neighbor pair of each src (out-degree is
        # orientation-bounded, so the per-src loop body stays tiny);
        # oriented edges pass through as existence witnesses (kind=1)
        us, ws, kinds = [], [], []
        for _, g in df.groupby("src", sort=False):
            nb = np.sort(g["dst"].to_numpy())
            if len(nb) > 1:
                iu, iw = np.triu_indices(len(nb), k=1)
                us.append(nb[iu]); ws.append(nb[iw])
                kinds.append(np.zeros(len(iu), dtype=np.int8))
        eu = np.minimum(df["src"], df["dst"]).to_numpy()
        ew = np.maximum(df["src"], df["dst"]).to_numpy()
        us.append(eu); ws.append(ew)
        kinds.append(np.ones(len(eu), dtype=np.int8))
        u = np.concatenate(us); w = np.concatenate(ws)
        out = pd.DataFrame({"u": u.astype("int64"),
                            "w": w.astype("int64"),
                            "kind": np.concatenate(kinds)})
        out["bucket"] = ((pd.util.hash_pandas_object(out["u"], index=False)
                          * 31 + pd.util.hash_pandas_object(out["w"],
                                                            index=False))
                         % nparts).astype("int32")
        return out

    def close_wedges(df: pd.DataFrame) -> pd.DataFrame:
        wdg = df[df["kind"] == 0][["u", "w"]]
        edg = df[df["kind"] == 1][["u", "w"]].drop_duplicates()
        n = len(wdg.merge(edg, on=["u", "w"]))
        return pd.DataFrame({"partial": pd.Series([n], dtype="int64")})

    partials = (pairs.map_batches(explode, batch_format="pandas")
                .groupby("bucket").map_groups(attach_deg,
                                              batch_format="pandas")
                .groupby("bucket").map_groups(orient,
                                              batch_format="pandas")
                .groupby("bucket").map_groups(wedges,
                                              batch_format="pandas")
                .groupby("bucket").map_groups(close_wedges,
                                              batch_format="pandas"))

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n_triangles": pd.Series(
            [int(df["partial"].sum())], dtype="int64")})

    return partials.repartition(1).map_batches(total, batch_format="pandas")


def _edge_degrees(edges, nparts: int):
    """Dataset[(a, b)] → Dataset[(node, deg, bucket)] — global degrees
    via a per-batch value_counts combiner and one node-hash exchange."""

    def expl(df: pd.DataFrame) -> pd.DataFrame:
        vc = pd.concat([df["a"], df["b"]], ignore_index=True).value_counts()
        out = pd.DataFrame({"node": vc.index.astype("int64"),
                            "deg": vc.to_numpy(dtype="int64")})
        out["bucket"] = (pd.util.hash_pandas_object(out["node"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    def red(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False)["deg"].sum()
        return pd.DataFrame({"node": g["node"].astype("int64"),
                             "deg": g["deg"].astype("int64")})

    return (edges.map_batches(expl, batch_format="pandas")
            .groupby("bucket").map_groups(red, batch_format="pandas"))


def _local_kcore(edges, k: int, rounds: int):
    """Single-task fixed-round peel — the small-graph fast path (same
    rationale and gating as _local_components: only the near-duplicated
    fraction of a corpus appears in the pair graph)."""

    def peel(df: pd.DataFrame) -> pd.DataFrame:
        e = df[["a", "b"]].to_numpy(dtype="int64")
        for _ in range(rounds):
            if not len(e):
                break
            nodes, counts = np.unique(e.ravel(), return_counts=True)
            alive = set(nodes[counts >= k].tolist())
            keep = np.fromiter(
                ((int(x) in alive and int(y) in alive) for x, y in e),
                dtype=bool, count=len(e))
            if keep.all():
                break  # fixpoint — further rounds are identity
            e = e[keep]
        if not len(e):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "core_deg": pd.Series([], dtype="int64")})
        nodes, counts = np.unique(e.ravel(), return_counts=True)
        return pd.DataFrame({"doc_id": pd.Series(nodes, dtype="int64"),
                             "core_deg": pd.Series(counts, dtype="int64")})

    return edges.repartition(1).map_batches(peel, batch_format="pandas",
                                            batch_size=None)


def kcore(sf_dir: str, k: int = 2, rounds: int = 4, threshold: float = 0.8,
          num_partitions: Optional[int] = None,
          small_graph_threshold: int = 2_000_000):
    """(doc_id, core_deg) — fixed-round k-core peeling of the near-dup
    pair graph (``jaccard_pairs`` edges): ``rounds`` iterations of
    "drop every node with degree < k and the edges it carries", then the
    surviving nodes with their degree in the surviving subgraph. The
    k-core separates dense duplicate clusters from incidental pair
    noise (an isolated pair dies in round 1; a near-clique survives).
    Fixed-round semantics keep the SQL oracle static; the peel reaches
    its fixpoint well inside 4 rounds on near-clique dup graphs
    (early-exits when a round removes nothing, and the convergence test
    pins rounds vs rounds+1 equality).

    Scale shape: the edge list is the small side (only the duplicated
    fraction of the corpus), so a ≤ ``small_graph_threshold``-edge graph
    peels in ONE task; above it, each round is one degree exchange
    (value_counts combiner, node-hash buckets) plus two reduce-side
    semi-joins (survivor status onto each endpoint) — 3 bucketed
    all-to-alls per round over edge-sized rows, edges re-materialized
    per round so shuffle block counts don't compound. The two paths are
    pinned row-identical (tests/test_ops.py).
    """
    from .dedup import jaccard_pairs

    nparts = num_partitions or _nparts()
    pairs = jaccard_pairs(sf_dir, threshold, num_partitions=nparts)
    edges = pairs.map_batches(
        lambda df: pd.DataFrame({"a": df["doc_id_a"].astype("int64"),
                                 "b": df["doc_id_b"].astype("int64")}),
        batch_format="pandas").materialize()
    if edges.count() <= small_graph_threshold:
        return _local_kcore(edges, k, rounds)

    for _ in range(rounds):
        deg = _edge_degrees(edges, nparts)
        surv = deg.map_batches(
            lambda df, k=k: df.loc[df["deg"] >= k, ["node"]].assign(
                alive=np.int8(1)),
            batch_format="pandas")
        # semi-join survivor status onto endpoint a, then b
        ea = _join_kv(_kv(edges, "a", "b"), _kv(surv, "node", "alive"),
                      nparts)  # (k=a, va=b, vb=1) — dead a's drop out
        eb = _join_kv(
            ea.map_batches(lambda df: pd.DataFrame(
                {"k": df["va"], "v": df["k"]}), batch_format="pandas"),
            _kv(surv, "node", "alive"), nparts)
        edges = eb.map_batches(
            lambda df: pd.DataFrame({"a": df["va"].astype("int64"),
                                     "b": df["k"].astype("int64")}),
            batch_format="pandas").repartition(nparts).materialize()

    return _edge_degrees(edges, nparts).map_batches(
        lambda df: pd.DataFrame({"doc_id": df["node"].astype("int64"),
                                 "core_deg": df["deg"].astype("int64")}),
        batch_format="pandas")


def _local_labelprop(edges, rounds: int):
    """Single-task synchronous LPA — the small-graph fast path (same
    gating rationale as _local_components / _local_kcore)."""

    def run(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(dtype=np.int64)
        b = df["b"].to_numpy(dtype=np.int64)
        src = np.concatenate([a, b])
        nbr = np.concatenate([b, a])
        nodes = np.unique(src)
        lbl = pd.Series(nodes, index=nodes)
        for _ in range(rounds):
            d = pd.DataFrame({"node": src,
                              "lbl": lbl.loc[nbr].to_numpy()})
            cnt = d.groupby(["node", "lbl"], as_index=False).size()
            cnt = cnt.sort_values(["node", "size", "lbl"],
                                  ascending=[True, False, True],
                                  kind="mergesort")
            top = cnt.drop_duplicates("node", keep="first")
            new = pd.Series(top["lbl"].to_numpy(),
                            index=top["node"].to_numpy())
            if new.equals(lbl):
                break  # fixpoint — further rounds are identity
            lbl = new
        return pd.DataFrame({"doc_id": lbl.index.to_numpy(dtype=np.int64),
                             "label": lbl.to_numpy(dtype=np.int64)})

    return edges.repartition(1).map_batches(run, batch_format="pandas",
                                            batch_size=None)


def label_propagation(sf_dir: str, rounds: int = 4, threshold: float = 0.8,
                      num_partitions: Optional[int] = None,
                      small_graph_threshold: int = 2_000_000):
    """(doc_id, label) — deterministic synchronous label propagation
    (community detection) over the near-dup pair graph (``jaccard_pairs``
    edges, undirected). Every node starts labelled with its own doc_id;
    each of the ``rounds`` synchronous steps relabels every node with
    the MOST FREQUENT label among its neighbours, ties broken toward the
    smallest label. Near-clique duplicate clusters collapse onto their
    minimum doc_id within a couple of rounds; the fixed-round semantics
    keep the unrolled-CTE SQL oracle exact even before convergence (the
    engine early-exits only on an identity round, which is a no-op).

    Scale shape: the edge list is the small side (only the duplicated
    fraction of the corpus pairs up). At or below
    ``small_graph_threshold`` edges a single task iterates vectorized;
    above it the bidirectional edge table is bucketed by hash(neighbour)
    ONCE and materialized — each round re-ships only the label vector
    (2 int64s per node) through (1) a neighbour-bucket co-group that
    attaches labels and pre-counts (node, label) per batch and (2) a
    node-hash aggregate that sums partials and takes the per-node
    (count desc, label asc) argmax. Edges never re-shuffle, label
    lineage is repartitioned+pinned per round so block counts don't
    compound. Two paths pinned row-identical (tests).
    """
    from .dedup import jaccard_pairs

    nparts = num_partitions or _nparts()
    pairs = jaccard_pairs(sf_dir, threshold, num_partitions=nparts)
    edges = pairs.map_batches(
        lambda df: pd.DataFrame({"a": df["doc_id_a"].astype("int64"),
                                 "b": df["doc_id_b"].astype("int64")}),
        batch_format="pandas").materialize()
    if edges.count() <= small_graph_threshold:
        return _local_labelprop(edges, rounds)

    def bidir(df: pd.DataFrame) -> pd.DataFrame:
        src = pd.concat([df["a"], df["b"]], ignore_index=True)
        nbr = pd.concat([df["b"], df["a"]], ignore_index=True)
        out = pd.DataFrame({"src": src.astype("int64"),
                            "nbr": nbr.astype("int64"),
                            "side": np.int8(0)})
        out["bucket"] = (pd.util.hash_pandas_object(out["nbr"], index=False)
                         % nparts).astype("int32")
        return out

    edge_tbl = edges.map_batches(bidir, batch_format="pandas").materialize()

    # init: every endpoint labels itself (node list via the degree helper)
    labels = _edge_degrees(edges, nparts).map_batches(
        lambda df: pd.DataFrame({"node": df["node"].astype("int64"),
                                 "lbl": df["node"].astype("int64")}),
        batch_format="pandas")

    def lbl_tag(df: pd.DataFrame) -> pd.DataFrame:
        # labels ride the edge schema: src=node, nbr=lbl, side=1
        out = pd.DataFrame({"src": df["node"].astype("int64"),
                            "nbr": df["lbl"].astype("int64"),
                            "side": np.int8(1)})
        out["bucket"] = (pd.util.hash_pandas_object(out["src"], index=False)
                         % nparts).astype("int32")
        return out

    def attach_and_count(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["side"] == 0][["src", "nbr"]]
        l = df[df["side"] == 1][["src", "nbr"]].rename(
            columns={"src": "nbr_", "nbr": "lbl"})
        m = e.merge(l, left_on="nbr", right_on="nbr_")
        # combiner: partial (node, label) counts before the node shuffle
        g = m.groupby(["src", "lbl"], as_index=False).size()
        out = pd.DataFrame({"node": g["src"].astype("int64"),
                            "lbl": g["lbl"].astype("int64"),
                            "cnt": g["size"].astype("int64")})
        out["bucket"] = (pd.util.hash_pandas_object(out["node"], index=False)
                         % nparts).astype("int32")
        return out

    def vote(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["node", "lbl"], as_index=False)["cnt"].sum()
        g = g.sort_values(["node", "cnt", "lbl"],
                          ascending=[True, False, True], kind="mergesort")
        top = g.drop_duplicates("node", keep="first")
        return pd.DataFrame({"node": top["node"].astype("int64"),
                             "lbl": top["lbl"].astype("int64")})

    for _ in range(rounds):
        labels = (edge_tbl.union(
                      labels.map_batches(lbl_tag, batch_format="pandas"))
                  .groupby("bucket")
                  .map_groups(attach_and_count, batch_format="pandas")
                  .groupby("bucket")
                  .map_groups(vote, batch_format="pandas"))
        labels = labels.repartition(nparts).materialize()

    return labels.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["node"].astype("int64"),
                                 "label": df["lbl"].astype("int64")}),
        batch_format="pandas")


def clustering_coeff(sf_dir: str, threshold: float = 0.8,
                     num_partitions: Optional[int] = None,
                     small_edges_threshold: int = 2_000_000):
    """(node, deg, n_tri) — per-node triangle count and degree of the
    near-dup pair graph (``jaccard_pairs`` edges): the local clustering
    coefficient 2·n_tri / (deg·(deg−1)) divides out exactly from these
    integers, which hash portably (dup clusters are near-cliques, so a
    LOW coefficient flags noisy pair edges worth re-verifying).

    Same degree-ordered wedge enumeration as ``triangle_count`` — each
    triangle closes in exactly one grid bucket — but every wedge carries
    its APEX, so a closed wedge credits all three corners. Shuffles move
    edge-sized rows only: edges materialize once (bounded: pair rows),
    degrees come from the standard per-batch value_counts combiner, the
    wedge/close exchanges mirror triangle_count, and per-node triangle
    partials meet the degree rows in one final node-hash co-group.
    """
    from .dedup import jaccard_pairs

    nparts = num_partitions or _nparts()
    pairs = jaccard_pairs(sf_dir, threshold,
                          num_partitions=nparts).materialize()

    if pairs.count() < small_edges_threshold:
        # single-task gate (the transitive_closure/scc pattern): the six
        # chained exchanges below are pure orchestration at this edge
        # count, and every output is an exact integer — a direct local
        # triangle enumeration is row-identical by mathematical identity
        # (pinned in tests/test_ops.py)
        e = pairs.to_pandas()
        ea = e["doc_id_a"].to_numpy("int64")
        eb = e["doc_id_b"].to_numpy("int64")
        adj: dict = {}
        for x, y in zip(ea, eb):
            adj.setdefault(int(x), set()).add(int(y))
            adj.setdefault(int(y), set()).add(int(x))
        tri = {n: 0 for n in adj}
        for x, y in zip(ea, eb):
            x, y = (int(x), int(y)) if x < y else (int(y), int(x))
            for c in adj[x] & adj[y]:
                if c > y:  # each triangle once, at its sorted edge
                    tri[x] += 1
                    tri[y] += 1
                    tri[c] += 1
        nodes = sorted(adj)
        return pd.DataFrame({
            "node": pd.Series(nodes, dtype="int64"),
            "deg": pd.Series([len(adj[n]) for n in nodes],
                             dtype="int64"),
            "n_tri": pd.Series([tri[n] for n in nodes],
                               dtype="int64")})

    edges = pairs.map_batches(
        lambda df: pd.DataFrame({"a": df["doc_id_a"].astype("int64"),
                                 "b": df["doc_id_b"].astype("int64")}),
        batch_format="pandas")
    degrees = _edge_degrees(edges, nparts)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].astype("int64")
        b = df["b"].astype("int64")
        out = pd.DataFrame({
            "node": pd.concat([a, b], ignore_index=True),
            "other": pd.concat([b, a], ignore_index=True)})
        out["bucket"] = (pd.util.hash_pandas_object(out["node"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    def attach_deg(df: pd.DataFrame) -> pd.DataFrame:
        deg = df.groupby("node")["other"].transform("size")
        u = np.minimum(df["node"], df["other"])
        w = np.maximum(df["node"], df["other"])
        return pd.DataFrame({
            "u": u.astype("int64"), "w": w.astype("int64"),
            "node": df["node"].astype("int64"),
            "deg": deg.astype("int64"),
            "bucket": ((pd.util.hash_pandas_object(u, index=False)
                        * 31 + pd.util.hash_pandas_object(w, index=False))
                       % nparts).astype("int32")})

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        lhs = df[df["node"] == df["u"]]
        rhs = df[df["node"] == df["w"]][["u", "w", "deg"]]
        m = lhs.merge(rhs, on=["u", "w"], suffixes=("_u", "_w"))
        u_first = (m["deg_u"] < m["deg_w"]) | (
            (m["deg_u"] == m["deg_w"]) & (m["u"] < m["w"]))
        src = np.where(u_first, m["u"], m["w"])
        dst = np.where(u_first, m["w"], m["u"])
        return pd.DataFrame({
            "src": src.astype("int64"), "dst": dst.astype("int64"),
            "bucket": (pd.Series(src).pipe(
                pd.util.hash_pandas_object, index=False)
                % nparts).astype("int32")})

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        # wedge rows keep their apex (kind=0, apex=src); oriented edges
        # pass through as existence witnesses (kind=1, apex=-1)
        us, ws, aps, kinds = [], [], [], []
        for src, g in df.groupby("src", sort=False):
            nb = np.sort(g["dst"].to_numpy())
            if len(nb) > 1:
                iu, iw = np.triu_indices(len(nb), k=1)
                us.append(nb[iu]); ws.append(nb[iw])
                aps.append(np.full(len(iu), src, dtype=np.int64))
                kinds.append(np.zeros(len(iu), dtype=np.int8))
        eu = np.minimum(df["src"], df["dst"]).to_numpy()
        ew = np.maximum(df["src"], df["dst"]).to_numpy()
        us.append(eu); ws.append(ew)
        aps.append(np.full(len(eu), -1, dtype=np.int64))
        kinds.append(np.ones(len(eu), dtype=np.int8))
        u = np.concatenate(us); w = np.concatenate(ws)
        out = pd.DataFrame({"u": u.astype("int64"),
                            "w": w.astype("int64"),
                            "apex": np.concatenate(aps),
                            "kind": np.concatenate(kinds)})
        out["bucket"] = ((pd.util.hash_pandas_object(out["u"], index=False)
                          * 31 + pd.util.hash_pandas_object(out["w"],
                                                            index=False))
                         % nparts).astype("int32")
        return out

    def close_wedges(df: pd.DataFrame) -> pd.DataFrame:
        wdg = df[df["kind"] == 0][["u", "w", "apex"]]
        edg = df[df["kind"] == 1][["u", "w"]].drop_duplicates()
        m = wdg.merge(edg, on=["u", "w"])
        vc = pd.concat([m["apex"], m["u"], m["w"]],
                       ignore_index=True).value_counts()
        out = pd.DataFrame({"node": vc.index.astype("int64"),
                            "n_tri": vc.to_numpy(dtype="int64")})
        out["bucket"] = (pd.util.hash_pandas_object(out["node"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    tri = (edges.map_batches(explode, batch_format="pandas")
           .groupby("bucket").map_groups(attach_deg, batch_format="pandas")
           .groupby("bucket").map_groups(orient, batch_format="pandas")
           .groupby("bucket").map_groups(wedges, batch_format="pandas")
           .groupby("bucket").map_groups(close_wedges,
                                         batch_format="pandas"))

    # final node-hash co-group: triangle partials (kind=0) meet degree
    # rows (kind=1) — hash buckets match because both use the same key
    def tag_tri(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"].astype("int64"),
                             "val": df["n_tri"].astype("int64"),
                             "kind": np.zeros(len(df), dtype=np.int8),
                             "bucket": df["bucket"].astype("int32")})

    def tag_deg(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"node": df["node"].astype("int64"),
                            "val": df["deg"].astype("int64"),
                            "kind": np.ones(len(df), dtype=np.int8)})
        out["bucket"] = (pd.util.hash_pandas_object(out["node"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    def merge_node(df: pd.DataFrame) -> pd.DataFrame:
        deg = df[df["kind"] == 1][["node", "val"]].rename(
            columns={"val": "deg"})
        t = (df[df["kind"] == 0].groupby("node", as_index=False)["val"]
             .sum().rename(columns={"val": "n_tri"}))
        out = deg.merge(t, on="node", how="left")
        return pd.DataFrame({
            "node": out["node"].astype("int64"),
            "deg": out["deg"].astype("int64"),
            "n_tri": out["n_tri"].fillna(0).astype("int64")})

    both = (tri.map_batches(tag_tri, batch_format="pandas")
            .union(degrees.map_batches(tag_deg, batch_format="pandas")))
    return both.groupby("bucket").map_groups(merge_node,
                                             batch_format="pandas")


def degree_assortativity_sums(sf_dir: str, threshold: float = 0.8,
                              num_partitions: Optional[int] = None):
    """Single row (n_ends, s_d, s_dd, s_prod) — EXACT integer sufficient
    statistics of degree assortativity over the near-dup pair graph:
    summing over both orientations of every edge (so x- and y-marginals
    coincide), Pearson's r = (M·s_prod − s_d²) / (M·s_dd − s_d²) with
    M = n_ends = 2|E| divides out from these integers (positive r =
    dup-cluster cores attach to cores — the scale-free-vs-clustered
    diagnostic). Emitting the sums keeps the oracle hash bit-exact.

    Same shuffle shape as triangle_count's first two exchanges: edges
    explode to their endpoints (node-hash bucket → global degrees),
    halves re-meet in an edge-hash bucket where both endpoint degrees
    are known, and each partition emits ONE partial-sums row into a
    one-row reduce. Edge-sized rows only, never node-state tables.
    """
    from .dedup import jaccard_pairs

    nparts = num_partitions or _nparts()
    pairs = jaccard_pairs(sf_dir, threshold, num_partitions=nparts)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        a = df["doc_id_a"].astype("int64")
        b = df["doc_id_b"].astype("int64")
        out = pd.DataFrame({
            "node": pd.concat([a, b], ignore_index=True),
            "other": pd.concat([b, a], ignore_index=True)})
        out["bucket"] = (pd.util.hash_pandas_object(out["node"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    def attach_deg(df: pd.DataFrame) -> pd.DataFrame:
        deg = df.groupby("node")["other"].transform("size")
        u = np.minimum(df["node"], df["other"])
        w = np.maximum(df["node"], df["other"])
        return pd.DataFrame({
            "u": u.astype("int64"), "w": w.astype("int64"),
            "node": df["node"].astype("int64"),
            "deg": deg.astype("int64"),
            "bucket": ((pd.util.hash_pandas_object(u, index=False)
                        * 31 + pd.util.hash_pandas_object(w, index=False))
                       % nparts).astype("int32")})

    def edge_sums(df: pd.DataFrame) -> pd.DataFrame:
        lhs = df[df["node"] == df["u"]][["u", "w", "deg"]]
        rhs = df[df["node"] == df["w"]][["u", "w", "deg"]]
        m = lhs.merge(rhs, on=["u", "w"], suffixes=("_u", "_w"))
        du = m["deg_u"].to_numpy(dtype="int64")
        dw = m["deg_w"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "n_ends": pd.Series([2 * len(m)], dtype="int64"),
            "s_d": pd.Series([int(du.sum() + dw.sum())], dtype="int64"),
            "s_dd": pd.Series([int((du * du).sum() + (dw * dw).sum())],
                              dtype="int64"),
            "s_prod": pd.Series([int(2 * (du * dw).sum())],
                                dtype="int64")})

    partials = (pairs.map_batches(explode, batch_format="pandas")
                .groupby("bucket").map_groups(attach_deg,
                                              batch_format="pandas")
                .groupby("bucket").map_groups(edge_sums,
                                              batch_format="pandas"))

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            c: pd.Series([int(df[c].sum())], dtype="int64")
            for c in ("n_ends", "s_d", "s_dd", "s_prod")})

    return partials.repartition(1).map_batches(total,
                                               batch_format="pandas")


def msf_boruvka(sf_dir: str, threshold: float = 0.8,
                max_rounds: int = 12,
                num_partitions: Optional[int] = None,
                small_graph_threshold: int = 2_000_000):
    """(doc_id_a, doc_id_b, sim_q) — the MINIMUM SPANNING FOREST of the
    weighted near-dup graph (``jaccard_pairs_sim`` edges; weight 1−J,
    i.e. edges totally ordered by (sim_q DESC, a, b)): the backbone a
    dedup reviewer walks (each dup cluster reduced to its strongest
    acyclic skeleton) and the classic distributed-graph algorithm the
    engine was missing next to CC/PageRank/k-core/LPA. The total order
    makes the forest UNIQUE, so the oracle can verify it edge-by-edge
    with Kruskal's cut property: an edge belongs to the MSF iff its
    endpoints are NOT connected by strictly earlier-ranked edges.

    Distributed Borůvka, O(log V) rounds: each round attaches current
    component labels to the edge endpoints (two hash(node) co-group
    exchanges, labels default to self for never-merged nodes), keeps
    cross-component edges, picks every component's best incident edge
    (hash(comp)-bucketed min by the total order — one group per
    PARTITION, never per component), folds the chosen edges into the
    forest and recomputes labels via ``connected_components`` (the
    union-find fast path — one task — below 2M forest edges; the
    distributed loop beyond). With a consistent total order the chosen
    edge set is acyclic, the textbook Borůvka invariant.
    """
    import ray
    import ray.data

    from .dedup import jaccard_pairs_sim

    nparts = num_partitions or _nparts()
    edges = jaccard_pairs_sim(sf_dir, threshold,
                              num_partitions=nparts).materialize()

    def empty_out():
        return ray.data.from_pandas(pd.DataFrame({
            "doc_id_a": pd.Series([], dtype="int64"),
            "doc_id_b": pd.Series([], dtype="int64"),
            "sim_q": pd.Series([], dtype="int64")}))

    n_edges = edges.count()
    if n_edges == 0:
        return empty_out()

    cols = ["doc_id_a", "doc_id_b", "sim_q"]

    if n_edges <= small_graph_threshold:
        # single-task Kruskal fast path (the _local_components /
        # kcore discipline): the total order makes the MSF unique, so
        # this is pinned row-identical to the distributed rounds
        # (tests/test_ops.py); pass 0 to force the Borůvka loop
        def kruskal(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["sim_q", "doc_id_a", "doc_id_b"],
                                ascending=[False, True, True])
            parent: dict = {}

            def find(x: int) -> int:
                while parent.get(x, x) != x:
                    x = parent[x]
                return x

            keep = []
            for i, (a, b, _) in enumerate(
                    df[cols].itertuples(index=False)):
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
                    keep.append(i)
            return df.iloc[keep][cols].reset_index(drop=True)

        return edges.repartition(1).map_batches(
            kruskal, batch_format="pandas", batch_size=None)

    def attach(ds, key_col: str, out_col: str, labels, carry):
        """One hash(node) co-group: edge rows keyed by ``key_col`` meet
        label rows; missing labels default to the node itself. ``carry``
        names the edge columns to thread through (union requires the
        two sides to share one schema, so label rows pad them)."""

        def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
            out = df[carry].copy()
            out["k"] = df[key_col].astype("int64")
            out["lbl"] = np.int64(-1)
            out["side"] = np.int8(1)
            out["bucket"] = (pd.util.hash_pandas_object(
                out["k"], index=False) % nparts).astype("int32")
            return out

        def label_rows(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({c: np.int64(0) for c in carry},
                               index=df.index)
            out["k"] = df["node"].astype("int64")
            out["lbl"] = df["component"].astype("int64")
            out["side"] = np.int8(0)
            out["bucket"] = (pd.util.hash_pandas_object(
                out["k"], index=False) % nparts).astype("int32")
            return out

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            e = df[df["side"] == 1][carry + ["k"]]
            lab = df[df["side"] == 0][["k", "lbl"]]
            m = e.merge(lab, on="k", how="left")
            m[out_col] = m["lbl"].fillna(m["k"]).astype("int64")
            return m[carry + [out_col]]

        u = ds.map_batches(edge_rows, batch_format="pandas")
        if labels is not None:
            u = u.union(labels.map_batches(label_rows,
                                           batch_format="pandas"))
        return u.groupby("bucket").map_groups(merge,
                                              batch_format="pandas")

    def comp_min(df: pd.DataFrame) -> pd.DataFrame:
        best = (df.sort_values(["sim_q", "doc_id_a", "doc_id_b"],
                               ascending=[False, True, True])
                .groupby("comp", sort=False).head(1))
        return best[cols].astype("int64")

    mst = None
    labels = None
    for _ in range(max_rounds):
        ann = attach(attach(edges, "doc_id_a", "la", labels, cols),
                     "doc_id_b", "lb", labels, cols + ["la"])
        cross = ann.map_batches(
            lambda df: df[df["la"] != df["lb"]][cols + ["la", "lb"]],
            batch_format="pandas").materialize()
        if cross.count() == 0:
            break

        def explode_comp(df: pd.DataFrame) -> pd.DataFrame:
            both = pd.concat([
                df[cols].assign(comp=df["la"]),
                df[cols].assign(comp=df["lb"])], ignore_index=True)
            both["bucket"] = (pd.util.hash_pandas_object(
                both["comp"], index=False) % nparts).astype("int32")
            return both

        chosen = (cross.map_batches(explode_comp, batch_format="pandas")
                  .groupby("bucket").map_groups(comp_min,
                                                batch_format="pandas")
                  .map_batches(lambda df: df.drop_duplicates(cols),
                               batch_format="pandas"))
        mst = chosen if mst is None else mst.union(chosen)
        # global dedup of edges chosen by both endpoints' components:
        # bucket on the edge key, keep one copy
        mst = (mst.map_batches(
            lambda df: df.assign(bucket=(pd.util.hash_pandas_object(
                df["doc_id_a"] * 31 + df["doc_id_b"], index=False)
                % nparts).astype("int32")), batch_format="pandas")
            .groupby("bucket").map_groups(
                lambda df: df.drop_duplicates(cols)[cols],
                batch_format="pandas")).materialize()

        labels = connected_components(
            mst.map_batches(lambda df: pd.DataFrame({
                "a": df["doc_id_a"].astype("int64"),
                "b": df["doc_id_b"].astype("int64")}),
                batch_format="pandas"),
            num_partitions=nparts).materialize()

    return mst if mst is not None else empty_out()


def bfs_levels(edges, seeds, num_partitions: Optional[int] = None,
               small_graph_threshold: int = 2_000_000,
               max_rounds: int = 16):
    """Dataset[(src:int64, dst:int64)] + seed node list →
    Dataset[(node, dist)] — multi-source level-synchronous BFS hop
    distances (unreached nodes are absent). The caller symmetrizes if
    the traversal is undirected.

    Edge lists at or below ``small_graph_threshold`` take a single-task
    deque fast path (pass 0 to force the distributed loop) — the same
    gate as connected_components/pagerank_ranks; the two paths are
    pinned row-identical by test.

    Scale shape (distributed path): the edge table buckets on
    hash(src) ONCE and is materialized; each level re-ships only the
    frontier (1 int64 per newly-reached node) through (1) a src-bucket
    co-group emitting per-bucket-deduped neighbor candidates and (2) a
    hash(node) anti-join against the visited set, which stays
    partitioned and output-sized. Rounds = eccentricity of the seed
    set, each 2 exchanges of frontier-sized rows — the edge list never
    re-shuffles. Raises if ``max_rounds`` levels do not converge (the
    SQL oracle's walk bound must dominate the true eccentricity).
    """
    import ray.data

    edges = edges.materialize()
    if edges.count() <= small_graph_threshold:
        from collections import deque

        e = edges.to_pandas()
        adj: dict = {}
        for a, b in zip(e["src"].astype("int64"),
                        e["dst"].astype("int64")):
            adj.setdefault(int(a), []).append(int(b))
        dist = {int(s): 0 for s in seeds}
        q = deque(sorted(dist))
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        out = pd.DataFrame(sorted(dist.items()),
                           columns=["node", "dist"])
        return ray.data.from_pandas(
            pd.DataFrame({"node": out["node"].astype("int64"),
                          "dist": out["dist"].astype("int64")}))

    nparts = num_partitions or _nparts()

    def e_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"src": df["src"].astype("int64"),
                            "dst": df["dst"].astype("int64"),
                            "side": np.int8(0)})
        out["bucket"] = (pd.util.hash_pandas_object(out["src"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    eb = edges.map_batches(e_bucket, batch_format="pandas").materialize()

    def f_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"src": df["node"].astype("int64"),
                            "dst": np.int64(0), "side": np.int8(1)})
        out["bucket"] = (pd.util.hash_pandas_object(out["src"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        fr = df[df["side"] == 1][["src"]].drop_duplicates()
        e = df[df["side"] == 0]
        m = e.merge(fr, on="src")
        out = m[["dst"]].drop_duplicates()
        return pd.DataFrame({"node": out["dst"].astype("int64")})

    def v_bucket(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"node": df["node"].astype("int64"),
                                "dist": (df["dist"] if "dist" in df
                                         else 0 * df["node"])
                                .astype("int64"),
                                "side": np.int8(side)})
            out["bucket"] = (pd.util.hash_pandas_object(
                out["node"], index=False) % nparts).astype("int32")
            return out
        return fn

    import ray.data as rd

    dist = rd.from_pandas(pd.DataFrame({
        "node": pd.Series(sorted(int(s) for s in seeds),
                          dtype="int64"),
        "dist": np.int64(0)}))
    frontier = dist
    for r in range(1, max_rounds + 1):
        cand = (eb.union(frontier.map_batches(f_rows,
                                              batch_format="pandas"))
                .groupby("bucket").map_groups(expand,
                                              batch_format="pandas"))

        def unseen(df: pd.DataFrame, r=r) -> pd.DataFrame:
            seen = set(df.loc[df["side"] == 0, "node"])
            c = df[df["side"] == 1][["node"]].drop_duplicates()
            c = c[~c["node"].isin(seen)]
            return pd.DataFrame({"node": c["node"].astype("int64"),
                                 "dist": np.int64(r)})

        new = (dist.map_batches(v_bucket(0), batch_format="pandas")
               .union(cand.map_batches(
                   lambda df: df.assign(dist=np.int64(0)),
                   batch_format="pandas")
                   .map_batches(v_bucket(1), batch_format="pandas"))
               .groupby("bucket").map_groups(unseen,
                                             batch_format="pandas")
               .materialize())
        if new.count() == 0:
            return dist
        dist = dist.union(new).repartition(nparts).materialize()
        frontier = new
    raise RuntimeError("bfs_levels: no convergence in %d rounds"
                       % max_rounds)


def bfs_distances(sf_dir: str, seed_mod: int = 97, k: int = 5,
                  small_graph_threshold: int = 2_000_000):
    """(vec_id, dist) — multi-source BFS hop distance from the seed
    vectors (vec_id % seed_mod == 0) over the SYMMETRIZED exact k-NN
    graph: the graph-traversal primitive (label spreading, semantic
    neighborhoods, hub distance) composed on top of ``knn_graph``'s
    independently-oracled edge set.
    """
    import pyarrow.parquet as pq_

    from .simsearch import knn_graph

    edges = knn_graph(sf_dir, k=k).map_batches(
        lambda df: pd.concat([
            pd.DataFrame({"src": df["vec_id"].astype("int64"),
                          "dst": df["neighbor_id"].astype("int64")}),
            pd.DataFrame({"src": df["neighbor_id"].astype("int64"),
                          "dst": df["vec_id"].astype("int64")})],
            ignore_index=True),
        batch_format="pandas")
    ids = pq_.read_table("%s/embeddings.parquet" % sf_dir,
                         columns=["vec_id"]).column("vec_id").to_pylist()
    seeds = [v for v in ids if v % seed_mod == 0]
    out = bfs_levels(edges, seeds,
                     small_graph_threshold=small_graph_threshold)
    return out.map_batches(
        lambda df: pd.DataFrame({"vec_id": df["node"].astype("int64"),
                                 "dist": df["dist"].astype("int64")}),
        batch_format="pandas")


def bipartite_conflicts(sf_dir: str, seed_mod: int = 97, k: int = 5):
    """One row (n_edges, n_conflicts) — the odd-cycle diagnostic over
    the symmetrized k-NN graph: after a multi-source BFS 2-coloring
    (parity of the hop distance), every edge joining two SAME-parity
    reached nodes witnesses an odd cycle; n_conflicts = 0 iff the
    reached subgraph is bipartite. Composes ``bfs_distances`` (its own
    oracle is independently checked) with one map-side parity probe.

    Scale shape: the distance table is node-sized and broadcasts via
    ``ray.put`` into a per-worker cache; the undirected edge list
    streams map-only through the parity check with per-batch 2-int
    partials — no extra exchange beyond what the BFS already paid.
    Each undirected edge is counted once (a < b).
    """
    import pyarrow.parquet as pq_
    import ray

    from .simsearch import knn_graph
    from .traindata import _bcast_get

    # ONE knn_graph pass: the materialized edge set serves both the
    # BFS (symmetrized) and the parity probe (was computed twice —
    # 4.8 s → 2.6 s at sf0.1/32)
    edges = knn_graph(sf_dir, k=k).materialize()
    sym = edges.map_batches(
        lambda df: pd.concat([
            pd.DataFrame({"src": df["vec_id"].astype("int64"),
                          "dst": df["neighbor_id"].astype("int64")}),
            pd.DataFrame({"src": df["neighbor_id"].astype("int64"),
                          "dst": df["vec_id"].astype("int64")})],
            ignore_index=True),
        batch_format="pandas")
    ids = pq_.read_table("%s/embeddings.parquet" % sf_dir,
                         columns=["vec_id"]).column("vec_id").to_pylist()
    seeds = [v for v in ids if v % seed_mod == 0]
    dist = bfs_levels(sym, seeds).to_pandas()
    parity = dict(zip(dist["node"].astype("int64"),
                      (dist["dist"] % 2).astype("int64")))
    par_ref = ray.put(parity)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        par = _bcast_get(par_ref)
        a = np.minimum(df["vec_id"].to_numpy("int64"),
                       df["neighbor_id"].to_numpy("int64"))
        b = np.maximum(df["vec_id"].to_numpy("int64"),
                       df["neighbor_id"].to_numpy("int64"))
        t = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
        pa = t["a"].map(par)
        pb = t["b"].map(par)
        both = pa.notna() & pb.notna()
        conf = both & (pa == pb)
        return pd.DataFrame({"a": t["a"], "b": t["b"],
                             "conflict": conf.astype("int64")})

    # per-batch dedup above is only a combiner; the knn graph can emit
    # the same undirected edge from both endpoints in different
    # batches, so finish with one exact dedup over fixed-width keys
    t = edges.map_batches(probe, batch_format="pandas").to_pandas()
    t = t.drop_duplicates(subset=["a", "b"])
    return pd.DataFrame({
        "n_edges": pd.Series([len(t)], dtype="int64"),
        "n_conflicts": pd.Series([int(t["conflict"].sum())],
                                 dtype="int64")})


def _kosaraju(e: pd.DataFrame) -> pd.DataFrame:
    """Single-task iterative Kosaraju SCC over (src, dst) int64 edges.
    Returns (node, scc_id) with scc_id = min node id of the component.
    Deterministic: adjacency sorted, stack-based DFS."""
    nodes = sorted(set(e["src"]).union(e["dst"]))
    fwd: dict = {v: [] for v in nodes}
    rev: dict = {v: [] for v in nodes}
    for a, b in zip(e["src"], e["dst"]):
        fwd[int(a)].append(int(b))
        rev[int(b)].append(int(a))
    for v in nodes:
        fwd[v].sort()
        rev[v].sort()
    seen = set()
    order = []
    for s in nodes:
        if s in seen:
            continue
        stack = [(s, iter(fwd[s]))]
        seen.add(s)
        while stack:
            v, it = stack[-1]
            adv = False
            for w in it:
                if w not in seen:
                    seen.add(w)
                    stack.append((w, iter(fwd[w])))
                    adv = True
                    break
            if not adv:
                order.append(v)
                stack.pop()
    comp: dict = {}
    for s in reversed(order):
        if s in comp:
            continue
        members = []
        stack2 = [s]
        comp[s] = s
        while stack2:
            v = stack2.pop()
            members.append(v)
            for w in rev[v]:
                if w not in comp:
                    comp[w] = s
                    stack2.append(w)
        m = min(members)
        for v in members:
            comp[v] = m
    out = pd.DataFrame(sorted(comp.items()), columns=["node", "scc_id"])
    return out.astype({"node": "int64", "scc_id": "int64"})


def scc(sf_dir: str, k: int = 5,
        small_graph_threshold: int = 2_000_000,
        num_partitions: Optional[int] = None):
    """(vec_id, scc_id) — strongly connected components of the DIRECTED
    exact k-NN graph (edge u→v iff v is a top-k neighbor of u);
    scc_id = min member id, the deterministic canonical label.

    Edge lists at or below ``small_graph_threshold`` take a single-task
    iterative Kosaraju gate (pass 0 to force the distributed path); the
    two paths are pinned row-identical by test.

    Distributed path — forward–backward min-label elimination: each
    round computes F = min label able to REACH each node along forward
    edges and B = min label REACHABLE from it (two directed min-label
    propagations to fixpoint, each built from the same 2-exchange
    rounds as pagerank: edge table bucketed once per elimination round,
    label vector re-ships per propagation step); nodes with F == B form
    exactly the SCC of that label (the global minimum remaining node
    always qualifies, so every round retires ≥ 1 component — typically
    almost all of them in round one); assigned nodes and their edges
    drop out and the next round runs on the residue. The elimination
    loop's all-to-alls carry only node-sized label rows; the edge table
    re-buckets once per round on the shrinking residue.
    """
    import ray.data

    from .simsearch import knn_graph

    edges = knn_graph(sf_dir, k=k).map_batches(
        lambda df: pd.DataFrame({"src": df["vec_id"].astype("int64"),
                                 "dst": df["neighbor_id"]
                                 .astype("int64")}),
        batch_format="pandas").materialize()
    return scc_labels(edges, small_graph_threshold=small_graph_threshold,
                      num_partitions=num_partitions, id_col="vec_id")


def scc_labels(edges, small_graph_threshold: int = 2_000_000,
               num_partitions: Optional[int] = None,
               id_col: str = "node"):
    """Dataset[(src, dst)] → Dataset[(id_col, scc_id)] — the SCC engine
    behind ``scc``, reusable over any directed edge set (see scc's
    docstring for the elimination algorithm and cost shape)."""
    import ray.data

    edges = edges.materialize()
    if edges.count() <= small_graph_threshold:
        out = _kosaraju(edges.to_pandas())
        return ray.data.from_pandas(out.rename(
            columns={"node": id_col}))

    nparts = num_partitions or _nparts()

    # node universe: node-sized (the only driver-side artifact, same
    # class as bfs_distances' seed list / dist broadcast)
    uniq = (edges.map_batches(
        lambda df: pd.DataFrame({"node": pd.unique(
            np.concatenate([df["src"].to_numpy("int64"),
                            df["dst"].to_numpy("int64")]))}),
        batch_format="pandas").to_pandas())
    remaining = pd.DataFrame({
        "node": pd.Series(sorted(uniq["node"].unique()), dtype="int64")})
    assigned = []

    def minprop(ed, nodes: pd.DataFrame, forward: bool) -> pd.Series:
        src, dst = ("src", "dst") if forward else ("dst", "src")
        lbl = pd.Series(nodes["node"].to_numpy("int64"),
                        index=nodes["node"].to_numpy("int64"))
        cur = ray.data.from_pandas(pd.DataFrame({
            "node": lbl.index.to_numpy("int64"),
            "lbl": lbl.to_numpy("int64")}))
        while True:
            def tag_e(df: pd.DataFrame) -> pd.DataFrame:
                out = pd.DataFrame({
                    "key": df[src].astype("int64"),
                    "val": df[dst].astype("int64"),
                    "side": np.int8(0)})
                out["bucket"] = (pd.util.hash_pandas_object(
                    out["key"], index=False) % nparts).astype("int32")
                return out

            def tag_l(df: pd.DataFrame) -> pd.DataFrame:
                out = pd.DataFrame({
                    "key": df["node"].astype("int64"),
                    "val": df["lbl"].astype("int64"),
                    "side": np.int8(1)})
                out["bucket"] = (pd.util.hash_pandas_object(
                    out["key"], index=False) % nparts).astype("int32")
                return out

            def msgs(df: pd.DataFrame) -> pd.DataFrame:
                ee = df[df["side"] == 0][["key", "val"]]
                ll = df[df["side"] == 1][["key", "val"]] \
                    .rename(columns={"val": "lbl"})
                m = ee.merge(ll, on="key")
                g = m.groupby("val", as_index=False)["lbl"].min()
                return pd.DataFrame({"node": g["val"].astype("int64"),
                                     "lbl": g["lbl"].astype("int64")})

            def merge_min(df: pd.DataFrame) -> pd.DataFrame:
                g = df.groupby("node", as_index=False)["lbl"].min()
                return g

            def nb(df: pd.DataFrame) -> pd.DataFrame:
                return df.assign(bucket=(pd.util.hash_pandas_object(
                    df["node"], index=False) % nparts).astype("int32"))

            upd = (ed.map_batches(tag_e, batch_format="pandas")
                   .union(cur.map_batches(tag_l, batch_format="pandas"))
                   .groupby("bucket").map_groups(msgs,
                                                 batch_format="pandas"))
            new = (cur.union(upd)
                   .map_batches(nb, batch_format="pandas")
                   .groupby("bucket").map_groups(merge_min,
                                                 batch_format="pandas")
                   .repartition(nparts).materialize())
            new_pd = new.to_pandas().set_index("node")["lbl"]
            old = lbl.sort_index()
            new_s = new_pd.sort_index()
            if old.equals(new_s):
                return new_s
            lbl = new_s
            cur = ray.data.from_pandas(pd.DataFrame({
                "node": lbl.index.to_numpy("int64"),
                "lbl": lbl.to_numpy("int64")}))

    while len(remaining):
        rem_set = frozenset(int(v) for v in remaining["node"])

        def residue(df: pd.DataFrame, rem=rem_set) -> pd.DataFrame:
            return df[df["src"].isin(rem) & df["dst"].isin(rem)]

        sub = edges.map_batches(residue,
                                batch_format="pandas").materialize()
        F = minprop(sub, remaining, forward=True)
        B = minprop(sub, remaining, forward=False)
        done = F[F == B]
        got = pd.DataFrame({id_col: done.index.to_numpy("int64"),
                            "scc_id": done.to_numpy("int64")})
        assigned.append(got)
        remaining = remaining[~remaining["node"].isin(set(done.index))]
    out = (pd.concat(assigned, ignore_index=True)
           .sort_values(id_col).reset_index(drop=True))
    return ray.data.from_pandas(out)


def kg_subtree_sizes(sf_dir: str, num_partitions: Optional[int] = None):
    """(ancestor, n_descendants) — hierarchy aggregation over the KG
    broader chain: how many concepts sit (transitively) under each
    ancestor — the subtree-size / category-rollup query every taxonomy
    UI and coverage report needs. Composes the independently-oracled
    transitive closure with one combiner-fed count.

    Scale shape: the closure's (doc_id, ancestor) pairs pre-count per
    ancestor inside each batch (combiner), then one hash(ancestor)
    bucket co-group finishes — the exchange carries ancestor partials,
    never pairs; ancestor cardinality is node-sized, so no group holds
    more than its bucket share.
    """
    import ray

    nparts = num_partitions or _nparts()
    closure = broader_closure(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("ancestor", as_index=False).size()
        return pd.DataFrame({
            "ancestor": g["ancestor"].astype("int64"),
            "n": g["size"].astype("int64"),
            "bucket": (pd.util.hash_pandas_object(
                g["ancestor"].astype("int64"), index=False)
                % nparts).astype("int32")})

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("ancestor", as_index=False)["n"].sum()
        return pd.DataFrame({"ancestor": g["ancestor"].astype("int64"),
                             "n_descendants": g["n"].astype("int64")})

    return (closure.map_batches(partial, batch_format="pandas")
            .groupby("bucket").map_groups(reduce,
                                          batch_format="pandas"))


def adamic_adar(sf_dir: str, threshold: float = 0.8,
                num_partitions: Optional[int] = None):
    """(doc_id_a, doc_id_b, score_q) — Adamic–Adar link prediction
    over the near-dup pair graph (Adamic & Adar, Social Networks
    2003): for every NON-adjacent pair with at least one common
    neighbor, score = Σ_{x ∈ N(a)∩N(b)} 1/ln(deg x). Predicted links
    in a dup graph are pairs the pairwise verifier missed but the
    cluster structure implies — the classic link-prediction baseline.

    Integer contract: each apex contributes w_q(x) = 10¹² //
    floor(10⁶·ln(deg x)) — one shared-libm ln on an exact integer
    degree, then pure integer arithmetic, so DuckDB replays it
    bit-for-bit (apexes need deg ≥ 2 to form a wedge, so ln > 0).

    Scale shape: two bucketed exchanges over edge-sized rows. A
    node-hash exchange co-locates each node's full incident edge list
    (its GLOBAL neighborhood), so degree and neighbor pairs compute
    in place; wedges + pass-through existence witnesses then hash by
    candidate pair, where per-pair scores sum and adjacent pairs
    anti-join out. Per-apex work is O(deg²) — inherent to the score's
    definition; at dup-cluster degrees that is bounded, and a hub cap
    (sample the neighborhood) is the documented mitigation for
    power-law graphs.
    """
    from .dedup import jaccard_pairs

    nparts = num_partitions or _nparts()
    pairs = jaccard_pairs(sf_dir, threshold, num_partitions=nparts)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        a = df["doc_id_a"].astype("int64")
        b = df["doc_id_b"].astype("int64")
        out = pd.DataFrame({
            "node": pd.concat([a, b], ignore_index=True),
            "other": pd.concat([b, a], ignore_index=True)})
        out["bucket"] = (pd.util.hash_pandas_object(out["node"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        us, ws, wqs, kinds = [], [], [], []
        for _, g in df.groupby("node", sort=False):
            nb = np.sort(g["other"].to_numpy("int64"))
            if len(nb) > 1:
                wq = 10**12 // int(np.floor(1e6 * np.log(len(nb))))
                iu, iw = np.triu_indices(len(nb), k=1)
                us.append(nb[iu]); ws.append(nb[iw])
                wqs.append(np.full(len(iu), wq, dtype="int64"))
                kinds.append(np.zeros(len(iu), dtype=np.int8))
        eu = np.minimum(df["node"], df["other"]).to_numpy("int64")
        ew = np.maximum(df["node"], df["other"]).to_numpy("int64")
        us.append(eu); ws.append(ew)
        wqs.append(np.zeros(len(eu), dtype="int64"))
        kinds.append(np.ones(len(eu), dtype=np.int8))
        out = pd.DataFrame({
            "u": np.concatenate(us).astype("int64"),
            "w": np.concatenate(ws).astype("int64"),
            "wq": np.concatenate(wqs),
            "kind": np.concatenate(kinds)})
        out["bucket"] = ((pd.util.hash_pandas_object(out["u"],
                                                     index=False) * 31
                          + pd.util.hash_pandas_object(out["w"],
                                                       index=False))
                         % nparts).astype("int32")
        return out

    def score(df: pd.DataFrame) -> pd.DataFrame:
        wdg = df[df["kind"] == 0]
        edg = df[df["kind"] == 1][["u", "w"]].drop_duplicates()
        g = wdg.groupby(["u", "w"], as_index=False)["wq"].sum()
        m = g.merge(edg, on=["u", "w"], how="left", indicator=True)
        m = m[m["_merge"] == "left_only"]
        return pd.DataFrame({
            "doc_id_a": m["u"].astype("int64"),
            "doc_id_b": m["w"].astype("int64"),
            "score_q": m["wq"].astype("int64")})

    out = (pairs.map_batches(explode, batch_format="pandas")
           .groupby("bucket").map_groups(wedges, batch_format="pandas")
           .groupby("bucket").map_groups(score, batch_format="pandas")
           .to_pandas())
    return out.sort_values(["doc_id_a", "doc_id_b"]) \
        .reset_index(drop=True)


def hits_scores(sf_dir: str, iters: int = 3,
                num_partitions: Optional[int] = None,
                small_graph_threshold: int = 2_000_000):
    """(doc_id, hub_q, auth_q) — HITS (Kleinberg, JACM 1999) over the
    same deterministic two-rule directed edge set pagerank uses
    (doc → doc//2 tree rule, doc → (doc²+1) mod N scatter rule).
    Pure-integer fixed-point: h⁰ = 1; aʳ(i) = Σ_{j→i} hʳ⁻¹(j);
    hʳ(j) = Σ_{j→i} aʳ(i); absent sums are 0. No per-round
    normalization — with ``iters`` rounds magnitudes are bounded by
    (max in·out degree)^iters, asserted < 2⁶⁰ at runtime; a
    production run at web scale adds a uniform power-of-two
    right-shift per round (rank ORDER is shift-invariant, and the
    oracle would mirror the shift). Every value is an int64 sum of
    int64s, so the unrolled DuckDB oracle is bit-exact.

    Scale shape (distributed path): the edge table buckets ONCE per
    direction (hash(src) and hash(dst)) and materializes; each
    half-round ships only the score vector (2 int64s per node)
    through a tagged-union co-group + a bucket-sum — the edge list
    never re-shuffles (the pagerank pattern, both directions).
    Graphs ≤ ``small_graph_threshold`` edges take a single-task
    numpy gate pinned row-identical to the distributed loop.
    """
    import ray.data

    docs = ray.data.read_parquet("%s/documents.parquet" % sf_dir,
                                 columns=["doc_id"])
    n = docs.count()
    nparts = num_partitions or _nparts()

    def edge_batch(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        tree = pd.DataFrame({"src": ids[ids > 0],
                             "dst": (ids[ids > 0] // 2)})
        scatter = pd.DataFrame({"src": ids,
                                "dst": (ids * ids + 1) % n})
        return pd.concat([tree, scatter]).drop_duplicates()

    edges = docs.map_batches(edge_batch,
                             batch_format="pandas").materialize()

    def finish(hub: dict, auth: dict) -> pd.DataFrame:
        ids = sorted(set(docs.to_pandas()["doc_id"].astype(int)))
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "hub_q": pd.Series([hub.get(i, 0) for i in ids],
                               dtype="int64"),
            "auth_q": pd.Series([auth.get(i, 0) for i in ids],
                                dtype="int64")})

    if edges.count() <= small_graph_threshold:
        e = edges.to_pandas()
        src = e["src"].to_numpy("int64")
        dst = e["dst"].to_numpy("int64")
        h = {int(i): 1 for i in np.unique(np.concatenate([src, dst]))}
        a: dict = {}
        for _ in range(iters):
            contrib = np.array([h.get(int(s), 0) for s in src],
                               dtype="int64")
            a = pd.Series(contrib).groupby(pd.Series(dst)).sum() \
                .to_dict()
            back = np.array([a.get(int(d), 0) for d in dst],
                            dtype="int64")
            h = pd.Series(back).groupby(pd.Series(src)).sum() \
                .to_dict()
            assert max(max(h.values(), default=0),
                       max(a.values(), default=0)) < 2**60
        return finish({int(k): int(v) for k, v in h.items()},
                      {int(k): int(v) for k, v in a.items()})

    # distributed path: edge tables bucketed once per direction; the
    # score vectors stay DATASETS end-to-end (never driver state)
    def tag_edges(key):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"src": df["src"].astype("int64"),
                                "dst": df["dst"].astype("int64"),
                                "val": np.int64(0),
                                "side": np.int8(0)})
            out["bucket"] = (pd.util.hash_pandas_object(
                out[key], index=False) % nparts).astype("int32")
            return out
        return fn

    ebs = edges.map_batches(tag_edges("src"),
                            batch_format="pandas").materialize()
    ebd = edges.map_batches(tag_edges("dst"),
                            batch_format="pandas").materialize()

    def tag_vec(key):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"src": np.int64(0),
                                "dst": np.int64(0),
                                "val": df["val"].astype("int64"),
                                "side": np.int8(1)})
            out[key] = df["node"].astype("int64")
            out["bucket"] = (pd.util.hash_pandas_object(
                df["node"], index=False) % nparts).astype("int32")
            return out[["src", "dst", "val", "side", "bucket"]]
        return fn

    def gather(join_key, emit_key):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            e = df[df["side"] == 0][["src", "dst"]]
            v = df[df["side"] == 1][[join_key, "val"]] \
                .groupby(join_key, as_index=False)["val"].sum()
            m = e.merge(v, on=join_key, how="inner")
            g = m.groupby(emit_key, as_index=False)["val"].sum()
            out = pd.DataFrame({"node": g[emit_key].astype("int64"),
                                "val": g["val"].astype("int64")})
            out["bucket"] = (pd.util.hash_pandas_object(
                out["node"], index=False) % nparts).astype("int32")
            return out
        return fn

    def settle(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False)["val"].sum()
        assert g["val"].max() < 2**60
        return pd.DataFrame({"node": g["node"].astype("int64"),
                             "val": g["val"].astype("int64")})

    def half_round(eb, vec, join_key, emit_key):
        return (eb.union(vec.map_batches(tag_vec(join_key),
                                         batch_format="pandas"))
                .groupby("bucket")
                .map_groups(gather(join_key, emit_key),
                            batch_format="pandas")
                .groupby("bucket")
                .map_groups(settle, batch_format="pandas")
                .materialize())

    def init_nodes(df: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(np.concatenate([df["src"].to_numpy("int64"),
                                      df["dst"].to_numpy("int64")]))
        return pd.DataFrame({"node": u, "val": np.int64(1),
                             "bucket": (pd.util.hash_pandas_object(
                                 pd.Series(u), index=False)
                                 % nparts).astype("int32")})

    h = (edges.map_batches(init_nodes, batch_format="pandas")
         .groupby("bucket")
         .map_groups(lambda df: df[["node", "val"]].drop_duplicates(
             subset=["node"]), batch_format="pandas").materialize())
    a = None
    for _ in range(iters):
        a = half_round(ebs, h, "src", "dst")
        h = half_round(ebd, a, "dst", "src")
    hub = {int(r["node"]): int(r["val"])
           for _, r in h.to_pandas().iterrows()}
    auth = {int(r["node"]): int(r["val"])
            for _, r in a.to_pandas().iterrows()}
    return finish(hub, auth)



def kg_cycle_nodes(sf_dir: str,
                   num_partitions: Optional[int] = None,
                   small_graph_threshold: int = 2_000_000):
    """(doc_id,) — ontology consistency check: every node lying on a
    DIRECTED CYCLE of the deterministic two-rule edge set (the
    pagerank/HITS graph: doc → doc//2 and doc → (doc²+1) mod N — the
    scatter rule makes real cycles). A broader-style hierarchy must be
    a DAG; cycle membership is the graph-level integrity_audit. A node
    is cyclic iff its SCC has ≥ 2 members or it carries a self-loop —
    equivalently iff it can reach itself through ≥ 1 edge, which is
    what the recursive-CTE oracle replays.

    Scale shape: composes the reusable SCC engine (scc_labels — see
    scc for the elimination algorithm; single-task Kosaraju gate below
    2M edges) with a label-size count and a map-side self-loop probe;
    the extra work on top of SCC is one output-sized fold.
    """
    import ray.data

    docs = _bread("%s/documents.parquet" % sf_dir,
                  columns=["doc_id"])
    n = docs.count()

    def edge_batch(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        tree = pd.DataFrame({"src": ids[ids > 0],
                             "dst": (ids[ids > 0] // 2)})
        scatter = pd.DataFrame({"src": ids,
                                "dst": (ids * ids + 1) % n})
        return pd.concat([tree, scatter]).drop_duplicates()

    edges = docs.map_batches(edge_batch, batch_format="pandas")
    labels = scc_labels(edges,
                        small_graph_threshold=small_graph_threshold,
                        num_partitions=num_partitions,
                        id_col="doc_id").to_pandas()
    sizes = labels.groupby("scc_id")["doc_id"].transform("size")
    multi = set(labels.loc[sizes > 1, "doc_id"].astype(int))

    # self-loop probe on the node-sized label frame (labels already
    # cover every node of the edge set; an all-empty Dataset loses its
    # schema in to_pandas, so don't round-trip a usually-empty filter)
    ids = labels["doc_id"].astype("int64").to_numpy()
    hit = ((ids * ids + 1) % n == ids) | ((ids > 0)
                                          & (ids // 2 == ids))
    loops = set(int(i) for i in ids[hit])
    out = sorted(multi | loops)
    return pd.DataFrame({"doc_id": pd.Series(out, dtype="int64")})


def graph_random_walks(sf_dir: str, steps: int = 6, k: int = 5,
                       num_partitions: Optional[int] = None,
                       small_graph_threshold: int = 2_000_000):
    """(vec_id, path) — the DeepWalk/node2vec DATA-PREP stage
    (Perozzi et al. KDD 2014): one fixed-length random walk per node
    of the directed k-NN graph, emitted as an ordered path string —
    the "sentences" a skip-gram graph embedding trains on. The walk
    is DETERMINISTIC: at 0-based step t on node v the walk moves to
    sorted-neighbor index md5("start:t:v") % out-degree(v), so the
    SQL oracle replays every choice exactly (the md5-randomness
    contract every sketch here uses).

    Scale shape (distributed path): the adjacency buckets by
    hash(node) ONCE and materializes; each step ships only the
    walk frontier (one fixed-width row per start) through the
    adjacency co-group, picking the next hop vectorized per bucket;
    visited rows union at the end into one hash(start) co-group that
    assembles path strings. ≤ ``small_graph_threshold`` edges take a
    single-task dict walk pinned row-identical.
    """
    import ray.data

    from .traindata import _md5_u64
    from .simsearch import knn_graph

    nparts = num_partitions or _nparts()
    edges = knn_graph(sf_dir, k=k).map_batches(
        lambda df: pd.DataFrame({"src": df["vec_id"].astype("int64"),
                                 "dst": df["neighbor_id"]
                                 .astype("int64")}),
        batch_format="pandas").materialize()

    def assemble(rows: pd.DataFrame) -> pd.DataFrame:
        rows = rows.sort_values(["start", "step"])
        g = rows.groupby("start")["cur"].agg(
            lambda s: ">".join(str(int(x)) for x in s))
        return pd.DataFrame({"vec_id": g.index.astype("int64"),
                             "path": g.astype(str)}) \
            .reset_index(drop=True)

    if edges.count() <= small_graph_threshold:
        e = edges.to_pandas()
        adj = {int(v): np.sort(g["dst"].to_numpy("int64"))
               for v, g in e.groupby("src")}
        rows = []
        for start in sorted(adj):
            cur = start
            rows.append((start, 0, start))
            for t in range(steps):
                nb = adj.get(int(cur))
                if nb is None:
                    break
                cur = int(nb[_md5_u64("%d:%d:%d" % (start, t, cur))
                             % len(nb)])
                rows.append((start, t + 1, cur))
        return assemble(pd.DataFrame(rows,
                                     columns=["start", "step", "cur"]))

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"src": df["src"].astype("int64"),
                            "dst": df["dst"].astype("int64"),
                            "start": np.int64(-1),
                            "step": np.int64(-1)})
        out["bucket"] = (pd.util.hash_pandas_object(
            out["src"], index=False) % nparts).astype("int32")
        return out

    eb = edges.map_batches(tag_edges,
                           batch_format="pandas").materialize()

    def init_frontier(df: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(df["src"].to_numpy("int64"))
        return pd.DataFrame({"start": u, "cur": u,
                             "step": np.int64(0)})

    frontier = (edges.map_batches(init_frontier, batch_format="pandas")
                .map_batches(lambda df: df.drop_duplicates(
                    subset=["start"]), batch_format="pandas")
                .materialize())
    visited = [frontier.to_pandas().rename(columns={"cur": "cur"})]

    def tag_frontier(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"src": df["cur"].astype("int64"),
                            "dst": np.int64(-1),
                            "start": df["start"].astype("int64"),
                            "step": df["step"].astype("int64")})
        out["bucket"] = (pd.util.hash_pandas_object(
            out["src"], index=False) % nparts).astype("int32")
        return out

    def hop(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["start"] < 0][["src", "dst"]]
        f = df[df["start"] >= 0]
        if len(f) == 0 or len(e) == 0:
            return pd.DataFrame({
                "start": pd.Series([], dtype="int64"),
                "cur": pd.Series([], dtype="int64"),
                "step": pd.Series([], dtype="int64")})
        adj = {int(v): np.sort(g["dst"].to_numpy("int64"))
               for v, g in e.groupby("src")}
        starts, curs, stps = [], [], []
        for start, cur, t in zip(f["start"].to_numpy("int64"),
                                 f["src"].to_numpy("int64"),
                                 f["step"].to_numpy("int64")):
            nb = adj.get(int(cur))
            if nb is None:
                continue
            nxt = int(nb[_md5_u64("%d:%d:%d" % (start, t, cur))
                         % len(nb)])
            starts.append(int(start)); curs.append(nxt)
            stps.append(int(t) + 1)
        return pd.DataFrame({
            "start": pd.Series(starts, dtype="int64"),
            "cur": pd.Series(curs, dtype="int64"),
            "step": pd.Series(stps, dtype="int64")})

    cur = frontier
    for _ in range(steps):
        cur = (eb.union(cur.map_batches(tag_frontier,
                                        batch_format="pandas"))
               .groupby("bucket").map_groups(hop,
                                             batch_format="pandas")
               .materialize())
        visited.append(cur.to_pandas())

    return assemble(pd.concat(visited, ignore_index=True))


def sssp_weighted(sf_dir: str, seed_mod: int = 97, k: int = 5,
                  rounds: int = 8,
                  small_graph_threshold: int = 2_000_000,
                  num_partitions: Optional[int] = None):
    """(vec_id, dist) — multi-source WEIGHTED shortest-path distances
    (fixed-round synchronous Bellman-Ford) over the symmetrized exact
    k-NN graph, edge weight = the k-NN rank its owner assigned (an
    undirected edge contributes both orientations, each at its own
    rank; relaxation takes the min). Seeds are vec_id % ``seed_mod``
    == 0 at distance 0. All-integer, and the round count is part of
    the operator's definition — engine and oracle run the identical
    ``rounds`` synchronized relaxations, so distances replay
    bit-for-bat even where the walk has not yet converged (one
    relaxation reaches one more hop per round; 8 rounds cover this
    graph's seed eccentricity — asserted converged in tests).

    Scale shape (distributed path): the weighted edge table buckets
    on hash(src) ONCE and is materialized; each round ships only the
    node-sized (node, dist) vector through (1) the src-bucket
    co-group emitting per-bucket-min relax candidates and (2) a
    hash(node) min-fold against the previous vector — the
    pagerank/hits per-round pattern, 2 exchanges of fixed-width rows
    per round, the edge list never re-shuffles. Below
    ``small_graph_threshold`` edges a single-task gate runs the same
    synchronized rounds vectorized (np.minimum.at) — row-identical
    by integer exactness, pinned in tests.
    """
    import pyarrow.parquet as pq_
    import ray.data

    from .simsearch import knn_graph

    nparts = num_partitions or _nparts()
    edges = knn_graph(sf_dir, k=k).map_batches(
        lambda df: pd.concat([
            pd.DataFrame({"src": df["vec_id"].astype("int64"),
                          "dst": df["neighbor_id"].astype("int64"),
                          "w": df["rank"].astype("int64")}),
            pd.DataFrame({"src": df["neighbor_id"].astype("int64"),
                          "dst": df["vec_id"].astype("int64"),
                          "w": df["rank"].astype("int64")})],
            ignore_index=True),
        batch_format="pandas").materialize()
    ids = pq_.read_table("%s/embeddings.parquet" % sf_dir,
                         columns=["vec_id"]).column("vec_id").to_pylist()
    seeds = sorted(v for v in ids if v % seed_mod == 0)

    INF = 1 << 62
    if edges.count() <= small_graph_threshold:
        e = edges.to_pandas()
        src = e["src"].to_numpy("int64")
        dst = e["dst"].to_numpy("int64")
        w = e["w"].to_numpy("int64")
        nodes = np.unique(np.concatenate(
            [src, dst, np.array(seeds, dtype="int64")]))
        pos = {int(n): i for i, n in enumerate(nodes)}
        si = np.array([pos[int(x)] for x in src], dtype="int64")
        di = np.array([pos[int(x)] for x in dst], dtype="int64")
        dist = np.full(len(nodes), INF, dtype="int64")
        dist[[pos[int(s)] for s in seeds]] = 0
        for _ in range(rounds):
            cand = dist[si] + w  # INF+w stays far below overflow
            nxt = dist.copy()
            np.minimum.at(nxt, di, cand)
            dist = np.minimum(dist, nxt)
        reached = dist < INF
        return ray.data.from_pandas(pd.DataFrame({
            "vec_id": pd.Series(nodes[reached], dtype="int64"),
            "dist": pd.Series(dist[reached], dtype="int64")}))

    def e_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"src": df["src"].astype("int64"),
                            "dst": df["dst"].astype("int64"),
                            "w": df["w"].astype("int64"),
                            "side": np.int8(0)})
        out["bucket"] = (pd.util.hash_pandas_object(out["src"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    eb = edges.map_batches(e_bucket, batch_format="pandas").materialize()
    cur = pd.DataFrame({"node": pd.Series(seeds, dtype="int64"),
                        "dist": pd.Series([0] * len(seeds),
                                          dtype="int64")})
    cur_ds = ray.data.from_pandas(cur)

    def d_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"src": df["node"].astype("int64"),
                            "dst": np.int64(0),
                            "w": df["dist"].astype("int64"),
                            "side": np.int8(1)})
        out["bucket"] = (pd.util.hash_pandas_object(out["src"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    def relax(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["side"] == 1][["src", "w"]].rename(
            columns={"w": "dist"})
        e = df[df["side"] == 0]
        m = e.merge(d, on="src")
        if m.empty:
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "dist": pd.Series([], dtype="int64"),
                                 "kind": pd.Series([], dtype="int8")})
        m["nd"] = m["dist"] + m["w"]
        g = m.groupby("dst", as_index=False)["nd"].min()
        return pd.DataFrame({"node": g["dst"].astype("int64"),
                             "dist": g["nd"].astype("int64"),
                             "kind": np.int8(0)})

    def old_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"].astype("int64"),
                             "dist": df["dist"].astype("int64"),
                             "kind": np.int8(1)})

    def min_fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False)["dist"].min()
        return pd.DataFrame({"node": g["node"].astype("int64"),
                             "dist": g["dist"].astype("int64")})

    def n_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = (pd.util.hash_pandas_object(df["node"],
                                                   index=False)
                        % nparts).astype("int32")
        return df

    for _ in range(rounds):
        cand = (eb.union(cur_ds.map_batches(d_rows,
                                            batch_format="pandas"))
                .groupby("bucket").map_groups(relax,
                                              batch_format="pandas"))
        both = cand.union(cur_ds.map_batches(old_rows,
                                             batch_format="pandas"))
        # repartition: shuffle output block counts compound across the
        # union→groupby loop (the pagerank/components lesson)
        cur_ds = (both.map_batches(n_bucket, batch_format="pandas")
                  .groupby("bucket").map_groups(min_fold,
                                                batch_format="pandas")
                  .repartition(nparts).materialize())

    return cur_ds.map_batches(
        lambda df: pd.DataFrame({"vec_id": df["node"].astype("int64"),
                                 "dist": df["dist"].astype("int64")}),
        batch_format="pandas")


def _mis_prio(nodes: np.ndarray) -> np.ndarray:
    """Deterministic Luby priority per node: md5-u64('mis:'||node) >> 1
    (shifted into int64 so both engines compare signed); ties broken by
    node id in the comparison rule, never here."""
    from .traindata import _md5_u64

    return np.fromiter((_md5_u64("mis:%d" % n) >> 1 for n in nodes),
                       dtype=np.int64, count=len(nodes))


def _mis_round_local(status: dict, prio: dict, adj: dict) -> dict:
    """One synchronous two-phase Luby round (the exact rule the SQL
    oracle unrolls): an undecided node with an MIS neighbour is
    excluded; otherwise it enters the MIS iff no undecided neighbour
    beats it on (prio, node)."""
    out = {}
    for n, st in status.items():
        if st != 0:
            out[n] = st
            continue
        nbrs = adj[n]
        if any(status[v] == 1 for v in nbrs):
            out[n] = 2
        elif not any(status[v] == 0
                     and (prio[v], v) < (prio[n], n) for v in nbrs):
            out[n] = 1
        else:
            out[n] = 0
    return out


def luby_mis(sf_dir: str, rounds: int = 8, threshold: float = 0.8,
             num_partitions: Optional[int] = None,
             small_graph_threshold: int = 2_000_000):
    """(doc_id, status) — deterministic Luby MAXIMAL INDEPENDENT SET
    (Luby 1986, the canonical parallel symmetry-breaking primitive)
    over the near-dup pair graph: with fixed md5 priorities the
    synchronous rounds converge to the lexicographically-first MIS —
    the "keep a maximal non-conflicting subset" selection that
    near-dup survivorship, exam-question decontamination and parallel
    scheduling all reduce to. status 1 = in the MIS, 2 = excluded by
    an MIS neighbour (0 = still undecided if ``rounds`` was cut short
    — fixed-round semantics keep the oracle static; convergence by
    round 8 is pinned by test on this corpus, and MIS/exclusion
    decisions are final the moment they are made).

    Round rule (two-phase, identical in the SQL unroll): an undecided
    node with an MIS neighbour → excluded; otherwise it enters the
    MIS iff no undecided neighbour beats it on (md5-priority, node).

    Scale shape: ≤``small_graph_threshold``-edge graphs solve in ONE
    task (the kcore gate — the pair graph is the small, duplicated
    fraction of the corpus); above it each round is TWO bucketed
    co-groups over edge-sized fixed-width rows — attach neighbour
    status (per-batch combiner folds each node's partial
    any-MIS-nbr / min-undecided-(prio,nbr) so the second exchange
    carries node-sized partials), then merge with own status. Both
    paths pinned row-identical by test; priorities re-derive from
    md5 in-task, nothing ships.
    """
    from collections import defaultdict

    from .dedup import jaccard_pairs

    nparts = num_partitions or _nparts()
    pairs = jaccard_pairs(sf_dir, threshold, num_partitions=nparts)
    edges = pairs.map_batches(
        lambda df: pd.DataFrame({"a": df["doc_id_a"].astype("int64"),
                                 "b": df["doc_id_b"].astype("int64")}),
        batch_format="pandas").materialize()

    if edges.count() <= small_graph_threshold:
        e = edges.to_pandas()
        nodes = np.unique(np.concatenate([e["a"].to_numpy("int64"),
                                          e["b"].to_numpy("int64")]))
        prio = dict(zip(nodes.tolist(), _mis_prio(nodes).tolist()))
        adj = defaultdict(set)
        for a, b in zip(e["a"], e["b"]):
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
        status = {int(n): 0 for n in nodes}
        for _ in range(rounds):
            nxt = _mis_round_local(status, prio, adj)
            if nxt == status:
                break
            status = nxt
        return pd.DataFrame({
            "doc_id": pd.Series(sorted(status), dtype="int64"),
            "status": pd.Series([status[n] for n in sorted(status)],
                                dtype="int64")})

    # distributed: bidirectional adjacency bucketed by NBR once; per
    # round ship only the node-sized status vector
    def bidir(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "node": pd.concat([df["a"], df["b"]], ignore_index=True)
            .astype("int64"),
            "nbr": pd.concat([df["b"], df["a"]], ignore_index=True)
            .astype("int64")})
        out["status"] = np.int64(0)  # schema-aligns with status rows
        out["bucket"] = (pd.util.hash_pandas_object(out["nbr"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    adj_ds = edges.map_batches(bidir, batch_format="pandas").materialize()
    seeds = adj_ds.map_batches(
        lambda df: pd.DataFrame({"node": df["node"]})
        .drop_duplicates().assign(status=np.int64(0)),
        batch_format="pandas")
    # global dedup of node rows: one node-hash co-group
    statuses = _dedup_nodes(seeds, nparts).materialize()

    for _ in range(rounds):
        st_tag = statuses.map_batches(
            lambda df: pd.DataFrame({
                "node": np.int64(-1), "nbr": df["node"],
                "status": df["status"],
                "bucket": (pd.util.hash_pandas_object(
                    df["node"], index=False) % nparts).astype("int32")}),
            batch_format="pandas")

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            st = df[df["node"] == -1][["nbr", "status"]] \
                .rename(columns={"nbr": "n2", "status": "st_nbr"})
            ed = df[df["node"] != -1][["node", "nbr"]]
            m = ed.merge(st, left_on="nbr", right_on="n2")
            if m.empty:
                return pd.DataFrame({
                    "node": pd.Series([], dtype="int64"),
                    "any_mis": pd.Series([], dtype="int64"),
                    "has_und": pd.Series([], dtype="int64"),
                    "min_prio": pd.Series([], dtype="int64"),
                    "min_nbr": pd.Series([], dtype="int64"),
                    "bucket": pd.Series([], dtype="int32")})
            m = m.assign(prio=_mis_prio(m["nbr"].to_numpy("int64")))
            und = m[m["st_nbr"] == 0].sort_values(["prio", "nbr"])
            best = und.groupby("node", as_index=False).first()
            mis = (m.assign(is_mis=(m["st_nbr"] == 1).astype("int64"))
                   .groupby("node", as_index=False)["is_mis"].max())
            out = mis.merge(
                best[["node", "prio", "nbr"]], on="node", how="left")
            # NO int64-max sentinel: it would round-trip through the
            # merge's float64 NaN path and overflow to INT64_MIN —
            # carry an explicit has_und flag instead (fill 0 is exact)
            out["has_und"] = (~out["prio"].isna()).astype("int64")
            out["prio"] = out["prio"].fillna(0).astype("int64")
            out["nbr"] = out["nbr"].fillna(0).astype("int64")
            return pd.DataFrame({
                "node": out["node"].astype("int64"),
                "any_mis": out["is_mis"].astype("int64"),
                "has_und": out["has_und"],
                "min_prio": out["prio"], "min_nbr": out["nbr"],
                "bucket": (pd.util.hash_pandas_object(
                    out["node"], index=False) % nparts).astype("int32")})

        partials = (adj_ds.union(st_tag)
                    .groupby("bucket")
                    .map_groups(attach, batch_format="pandas"))

        st_side = statuses.map_batches(
            lambda df: pd.DataFrame({
                "node": df["node"], "any_mis": np.int64(-1),
                "has_und": np.int64(0),
                "min_prio": df["status"],  # carries own status
                "min_nbr": np.int64(-1),
                "bucket": (pd.util.hash_pandas_object(
                    df["node"], index=False) % nparts).astype("int32")}),
            batch_format="pandas")

        def decide(df: pd.DataFrame) -> pd.DataFrame:
            own = df[df["any_mis"] == -1][["node", "min_prio"]] \
                .rename(columns={"min_prio": "status"})
            pp = df[df["any_mis"] != -1]
            if len(pp):
                amax = pp.groupby("node", as_index=False).agg(
                    any_mis=("any_mis", "max"))
                und = pp[pp["has_und"] == 1] \
                    .sort_values(["min_prio", "min_nbr"])
                best = und.groupby("node", as_index=False).agg(
                    min_prio=("min_prio", "first"),
                    min_nbr=("min_nbr", "first"))
                m = (own.merge(amax, on="node", how="left")
                     .merge(best, on="node", how="left"))
            else:
                m = own.assign(any_mis=0, min_prio=np.nan, min_nbr=np.nan)
            m["any_mis"] = m["any_mis"].fillna(0).astype("int64")
            has_und = (~m["min_prio"].isna()).to_numpy()
            m["min_prio"] = m["min_prio"].fillna(0).astype("int64")
            m["min_nbr"] = m["min_nbr"].fillna(0).astype("int64")
            own_prio = _mis_prio(m["node"].to_numpy("int64"))
            undec = m["status"].to_numpy("int64") == 0
            excl = undec & (m["any_mis"].to_numpy("int64") == 1)
            beats = ~has_und | (
                (own_prio < m["min_prio"].to_numpy("int64"))
                | ((own_prio == m["min_prio"].to_numpy("int64"))
                   & (m["node"].to_numpy("int64")
                      < m["min_nbr"].to_numpy("int64"))))
            wins = undec & ~excl & beats
            st = m["status"].to_numpy("int64").copy()
            st[excl] = 2
            st[wins] = 1
            return pd.DataFrame({"node": m["node"].astype("int64"),
                                 "status": pd.Series(st, dtype="int64")})

        statuses = (partials.union(st_side)
                    .groupby("bucket")
                    .map_groups(decide, batch_format="pandas")
                    .repartition(nparts).materialize())

    return statuses.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["node"].astype("int64"),
                                 "status": df["status"].astype("int64")}),
        batch_format="pandas")


def _dedup_nodes(statuses, nparts: int):
    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["node", "status"]].copy()
        out["bucket"] = (pd.util.hash_pandas_object(out["node"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    return (statuses.map_batches(tag, batch_format="pandas")
            .groupby("bucket").map_groups(
                lambda df: df.drop_duplicates("node")[["node", "status"]],
                batch_format="pandas"))


def powerlaw_alpha(sf_dir: str, threshold: float = 0.8,
                   num_partitions: Optional[int] = None):
    """(n_nodes, s_q6, alpha_q6, d_max) — maximum-likelihood power-law
    exponent of the near-dup pair graph's degree distribution
    (Clauset, Shalizi & Newman 2009, eq. 3.1 with d_min = 1):
    α = 1 + n / Σᵢ ln dᵢ. Heavy-tailed degrees are the standard
    web/dup-graph diagnostic — α ≲ 2.5 signals hub-dominated
    duplication (one template swallowing the corpus) vs scattered
    pair noise. Exactness contract: the sum is quantized PER DISTINCT
    DEGREE (s_q6 = Σ_d cnt_d · floor(10⁶·ln d) — one shared-libm ln
    per degree value, integer-weighted, order-independent) and
    alpha_q6 = 10⁶ + (10¹²·n) // s_q6 in exact integers.

    Scale shape: degrees from the per-batch value_counts combiner +
    one node-hash exchange (_edge_degrees); the distinct-degree
    histogram is output-sized and folds driver-side.
    """
    import math

    from .dedup import jaccard_pairs

    nparts = num_partitions or _nparts()
    pairs = jaccard_pairs(sf_dir, threshold, num_partitions=nparts)
    edges = pairs.map_batches(
        lambda df: pd.DataFrame({"a": df["doc_id_a"].astype("int64"),
                                 "b": df["doc_id_b"].astype("int64")}),
        batch_format="pandas")
    deg = _edge_degrees(edges, nparts)
    hist = (deg.map_batches(
        lambda df: df.groupby("deg", as_index=False).size()
        .rename(columns={"size": "cnt"}), batch_format="pandas")
        .to_pandas().groupby("deg")["cnt"].sum())
    n = int(hist.sum())
    s_q6 = sum(int(c) * math.floor(1000000.0 * math.log(int(d)))
               for d, c in hist.items())
    alpha_q6 = 1000000 + (1000000000000 * n) // s_q6
    return pd.DataFrame(
        [(n, s_q6, alpha_q6, int(hist.index.max()))],
        columns=["n_nodes", "s_q6", "alpha_q6", "d_max"]).astype("int64")


def diameter_estimate(sf_dir: str, k: int = 5,
                      small_graph_threshold: int = 2_000_000):
    """(start_node, sweep1_ecc, far_node, sweep2_ecc) — DOUBLE-SWEEP
    diameter lower bound (Magnien, Latapy & Habib, JEA 2009) of the
    symmetrized exact k-NN graph: BFS from the minimum vec_id, hop to
    the farthest reached node (ties → min id), BFS again from there —
    the second eccentricity is the classical tight diameter estimate
    at two traversals' cost (exact diameter is all-pairs). The
    graph-metrology op (how many hops wide is the semantic graph)
    every embedding-space diagnostic starts with.

    Scale shape: two ``bfs_levels`` traversals (level-synchronous,
    frontier-only shuffles; single-task gate under the threshold)
    over knn_graph's independently-oracled edge set; only eccentricity
    scalars leave the second sweep.
    """
    import pyarrow.parquet as pq_

    from .simsearch import knn_graph

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        return pd.concat([
            pd.DataFrame({"src": df["vec_id"].astype("int64"),
                          "dst": df["neighbor_id"].astype("int64")}),
            pd.DataFrame({"src": df["neighbor_id"].astype("int64"),
                          "dst": df["vec_id"].astype("int64")})],
            ignore_index=True)

    edges = knn_graph(sf_dir, k=k).map_batches(
        sym, batch_format="pandas").materialize()
    ids = pq_.read_table("%s/embeddings.parquet" % sf_dir,
                         columns=["vec_id"]).column("vec_id").to_pylist()
    start = min(int(v) for v in ids)

    d1 = bfs_levels(edges, [start],
                    small_graph_threshold=small_graph_threshold)
    d1 = d1.to_pandas() if hasattr(d1, "to_pandas") else d1
    ecc1 = int(d1["dist"].max())
    far = int(d1.loc[d1["dist"] == ecc1, "node"].min())

    d2 = bfs_levels(edges, [far],
                    small_graph_threshold=small_graph_threshold)
    d2 = d2.to_pandas() if hasattr(d2, "to_pandas") else d2
    ecc2 = int(d2["dist"].max())
    return pd.DataFrame(
        [(start, ecc1, far, ecc2)],
        columns=["start_node", "sweep1_ecc", "far_node",
                 "sweep2_ecc"]).astype("int64")


def modularity_score(sf_dir: str, rounds: int = 4,
                     threshold: float = 0.8,
                     num_partitions: Optional[int] = None):
    """(n_communities, m_edges, q_num, q_den) — NEWMAN MODULARITY of
    the label-propagation communities over the near-dup pair graph
    (Newman & Girvan 2004): Q = Σ_c [e_c/m − (d_c/2m)²], kept EXACT
    by clearing denominators — q_num = Σ_c (4m·e_c − d_c²),
    q_den = 4m², Q = q_num/q_den. The community-quality evaluation
    that pairs with silhouette_eval's kmeans score: Q near 0 means
    the partition is no better than random edge placement, dense dup
    clusters push it toward 1.

    Scale shape: the LPA labels attach to both edge endpoints through
    the schema-preserving bucketed flag join (dedup._attach_flag);
    e_c and d_c fold from edge-sized partials into community-sized
    aggregates; the final algebra is output-sized driver bigints.
    """
    from .dedup import _attach_flag, jaccard_pairs

    nparts = num_partitions or _nparts()
    pairs = jaccard_pairs(sf_dir, threshold, num_partitions=nparts)
    edges = pairs.map_batches(
        lambda df: pd.DataFrame({"a": df["doc_id_a"].astype("int64"),
                                 "b": df["doc_id_b"].astype("int64")}),
        batch_format="pandas").materialize()
    lp = label_propagation(sf_dir, rounds=rounds, threshold=threshold,
                           num_partitions=nparts)
    lp = lp.to_pandas() if hasattr(lp, "to_pandas") else lp
    import ray.data
    labels = ray.data.from_pandas(pd.DataFrame({
        "node": lp["doc_id"].astype("int64"),
        "flag": lp["label"].astype("int64")}))

    e1 = _attach_flag(edges, labels, "a", "la", nparts, fill=-1)
    e2 = _attach_flag(e1, labels, "b", "lb", nparts,
                      fill=-1).to_pandas()
    assert (e2["la"] >= 0).all() and (e2["lb"] >= 0).all()
    m = len(e2)
    ec = (e2[e2["la"] == e2["lb"]].groupby("la").size())
    dc = pd.concat([e2["la"], e2["lb"]]).value_counts()
    q_num = sum(4 * m * int(ec.get(c, 0)) - int(d) * int(d)
                for c, d in dc.items())
    return pd.DataFrame(
        [(int(dc.index.nunique()), m, q_num, 4 * m * m)],
        columns=["n_communities", "m_edges", "q_num",
                 "q_den"]).astype("int64")


def _truss_support_local(e: np.ndarray) -> np.ndarray:
    """support[i] = number of triangles containing edge i (local)."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in e:
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))
    return np.fromiter(
        (len(adj[int(a)] & adj[int(b)]) for a, b in e),
        dtype=np.int64, count=len(e))


def ktruss(sf_dir: str, k: int = 4, rounds: int = 3,
           threshold: float = 0.8,
           num_partitions: Optional[int] = None,
           small_graph_threshold: int = 2_000_000):
    """(a, b, support) — fixed-round k-TRUSS peeling (Cohen 2008) of
    the near-dup pair graph: each round drops every edge in fewer
    than k−2 triangles, the EDGE-grade refinement of k-core that
    separates genuinely dense duplicate communities from chains of
    incidental pairs (a path survives any 2-core but no 4-truss).
    Output = surviving edges with their final triangle support;
    fixed-round semantics keep the oracle static, with the fixpoint
    reached well inside ``rounds`` on near-clique dup graphs (pinned
    by the rounds-vs-rounds+1 test).

    Scale shape: ≤``small_graph_threshold``-edge graphs peel in ONE
    task. Above it, each round computes per-edge support with the
    degree-ordered triangle enumeration (orient toward the
    higher-(degree, node) endpoint — every node's out-degree is
    bounded ~√E so wedge generation never explodes at a hub): wedge
    candidates meet oriented edges in ONE edge-key co-group, each
    found triangle credits its three edges, credits settle in a
    second edge-key exchange, and the peel is an edge semi-join.
    Both paths pinned row-identical by test.
    """
    from .dedup import jaccard_pairs

    nparts = num_partitions or _nparts()
    pairs = jaccard_pairs(sf_dir, threshold, num_partitions=nparts)
    edges = pairs.map_batches(
        lambda df: pd.DataFrame({"a": df["doc_id_a"].astype("int64"),
                                 "b": df["doc_id_b"].astype("int64")}),
        batch_format="pandas").materialize()

    if edges.count() <= small_graph_threshold:
        e = edges.to_pandas()[["a", "b"]].to_numpy("int64")
        for _ in range(rounds):
            if not len(e):
                break
            sup = _truss_support_local(e)
            keep = sup >= k - 2
            if keep.all():
                break
            e = e[keep]
        sup = (_truss_support_local(e) if len(e)
               else np.zeros(0, dtype=np.int64))
        return pd.DataFrame({
            "a": pd.Series(e[:, 0] if len(e) else [], dtype="int64"),
            "b": pd.Series(e[:, 1] if len(e) else [], dtype="int64"),
            "support": pd.Series(sup, dtype="int64")})

    cur = edges
    for rnd in range(rounds + 1):  # +1: final pass only computes support
        sup = _edge_support(cur, nparts)
        if rnd == rounds:
            return sup
        # repartition between rounds: shuffle output block counts
        # otherwise compound (144 blocks after one peel) and the next
        # support pass drowns in per-block orchestration — the
        # sssp/pagerank lesson, measured 5 s → 122 s per round
        cur = sup.map_batches(
            lambda df: df.loc[df["support"] >= k - 2, ["a", "b"]],
            batch_format="pandas").repartition(nparts).materialize()
    return sup


def _edge_support(edges, nparts: int):
    """Dataset[(a,b)] → Dataset[(a, b, support)] — per-edge triangle
    counts via degree-ordered wedge enumeration (each triangle found
    once, crediting its three edges)."""
    deg = _edge_degrees(edges, nparts)

    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["a", "b"]].copy()
        out["bucket"] = (pd.util.hash_pandas_object(
            out["a"], index=False) % nparts).astype("int32")
        return out

    def tag_deg(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"a": df["node"].astype("int64"),
                            "b": np.int64(-1),
                            "deg": df["deg"].astype("int64")})
        out["bucket"] = (pd.util.hash_pandas_object(
            out["a"], index=False) % nparts).astype("int32")
        return out

    def attach_a(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["b"] == -1][["a", "deg"]]
        e = df[df["b"] != -1][["a", "b"]]
        return e.merge(d, on="a").rename(columns={"deg": "da"})

    ea = (edges.map_batches(
        lambda df: df.assign(deg=np.int64(0)), batch_format="pandas")
        .map_batches(tag_edge, batch_format="pandas")
        .union(deg.map_batches(tag_deg, batch_format="pandas"))
        .groupby("bucket").map_groups(attach_a, batch_format="pandas"))

    def tag_edge_b(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["a", "b", "da"]].copy()
        out["bucket"] = (pd.util.hash_pandas_object(
            out["b"], index=False) % nparts).astype("int32")
        return out

    def tag_deg_b(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"a": np.int64(-1),
                            "b": df["node"].astype("int64"),
                            "da": df["deg"].astype("int64")})
        out["bucket"] = (pd.util.hash_pandas_object(
            out["b"], index=False) % nparts).astype("int32")
        return out

    def attach_b(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["a"] == -1][["b", "da"]].rename(columns={"da": "db"})
        e = df[df["a"] != -1][["a", "b", "da"]]
        return e.merge(d, on="b")

    eab = (ea.map_batches(tag_edge_b, batch_format="pandas")
           .union(deg.map_batches(tag_deg_b, batch_format="pandas"))
           .groupby("bucket").map_groups(attach_b,
                                         batch_format="pandas")
           .materialize())

    # orient each edge toward the higher-(deg, node) endpoint
    def orient(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy("int64")
        b = df["b"].to_numpy("int64")
        da = df["da"].to_numpy("int64")
        db = df["db"].to_numpy("int64")
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        out = pd.DataFrame({"src": src, "dst": dst})
        out["bucket"] = (pd.util.hash_pandas_object(
            out["src"], index=False) % nparts).astype("int32")
        return out

    oriented = eab.map_batches(orient,
                               batch_format="pandas").materialize()

    # wedges at each source: candidate closing pair (u, v) + apex
    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for src, g in df.groupby("src", sort=False):
            ds_ = np.sort(g["dst"].to_numpy("int64"))
            n = len(ds_)
            if n < 2:
                continue
            iu, iv = np.triu_indices(n, k=1)
            outs.append(pd.DataFrame({
                "u": ds_[iu], "v": ds_[iv],
                "apex": np.int64(src)}))
        if not outs:
            return pd.DataFrame({"u": pd.Series([], dtype="int64"),
                                 "v": pd.Series([], dtype="int64"),
                                 "apex": pd.Series([], dtype="int64"),
                                 "bucket": pd.Series([],
                                                     dtype="int32")})
        out = pd.concat(outs, ignore_index=True)
        out["bucket"] = (pd.util.hash_pandas_object(
            out["u"].astype(str) + ":" + out["v"].astype(str),
            index=False) % nparts).astype("int32")
        return out

    wedge_ds = oriented.groupby("bucket").map_groups(
        wedges, batch_format="pandas")

    # canonical (min, max) edge key rows for the closing-edge probe
    def edge_keys(df: pd.DataFrame) -> pd.DataFrame:
        a = np.minimum(df["src"], df["dst"]).astype("int64")
        b = np.maximum(df["src"], df["dst"]).astype("int64")
        out = pd.DataFrame({"u": a, "v": b, "apex": np.int64(-1)})
        out["bucket"] = (pd.util.hash_pandas_object(
            out["u"].astype(str) + ":" + out["v"].astype(str),
            index=False) % nparts).astype("int32")
        return out

    def close_and_credit(df: pd.DataFrame) -> pd.DataFrame:
        have = df[df["apex"] == -1][["u", "v"]].drop_duplicates()
        cand = df[df["apex"] != -1]
        m = cand.merge(have, on=["u", "v"])
        if m.empty:
            return pd.DataFrame({"ca": pd.Series([], dtype="int64"),
                                 "cb": pd.Series([], dtype="int64")})
        # credit all three edges of each triangle (canonical order)
        u = m["u"].to_numpy("int64")
        v = m["v"].to_numpy("int64")
        x = m["apex"].to_numpy("int64")
        ca = np.concatenate([u, np.minimum(x, u), np.minimum(x, v)])
        cb = np.concatenate([v, np.maximum(x, u), np.maximum(x, v)])
        return pd.DataFrame({"ca": ca, "cb": cb})

    credits = (wedge_ds.union(oriented.map_batches(
        edge_keys, batch_format="pandas"))
        .groupby("bucket").map_groups(close_and_credit,
                                      batch_format="pandas"))

    def credit_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["ca", "cb"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["bucket"] = (pd.util.hash_pandas_object(
            g["ca"].astype(str) + ":" + g["cb"].astype(str),
            index=False) % nparts).astype("int32")
        return g

    def edge_side(df: pd.DataFrame) -> pd.DataFrame:
        a = np.minimum(df["src"], df["dst"]).astype("int64")
        b = np.maximum(df["src"], df["dst"]).astype("int64")
        out = pd.DataFrame({"ca": a, "cb": b, "n": np.int64(0)})
        out["bucket"] = (pd.util.hash_pandas_object(
            out["ca"].astype(str) + ":" + out["cb"].astype(str),
            index=False) % nparts).astype("int32")
        return out

    def settle(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["ca", "cb"], as_index=False)["n"].sum()
        return pd.DataFrame({"a": g["ca"].astype("int64"),
                             "b": g["cb"].astype("int64"),
                             "support": g["n"].astype("int64")})

    return (credits.map_batches(credit_partial, batch_format="pandas")
            .union(oriented.map_batches(edge_side,
                                        batch_format="pandas"))
            .groupby("bucket").map_groups(settle,
                                          batch_format="pandas"))


def rich_club(sf_dir: str, ks=(2, 4, 8), threshold: float = 0.8,
              num_partitions: Optional[int] = None,
              small_graph_threshold: int = 2_000_000):
    """(k, n_rich, e_rich, phi_q6) — RICH-CLUB coefficients of the
    near-dup pair graph (Colizza et al., Nature Physics 2006): for
    each degree cutoff k, the edge density φ(k) = 2·E_k /
    (N_k·(N_k−1)) among nodes of degree > k — do the hubs wire to
    each other (template families sharing boilerplate) or spread
    across the corpus. Exact integers; φ trunc-quantized at 10⁶.

    Scale shape: one degree exchange (value_counts combiner); edge
    lists at or below ``small_graph_threshold`` fold in a single
    task (the shared graph-op gate — the pair graph is the corpus's
    duplicated fraction); above it each cutoff filters edge
    endpoints through two schema-preserving flag joins and E_k folds
    from edge-sized count partials. Both paths share the degree
    table; pinned identical by test.
    """
    from .dedup import _attach_flag, jaccard_pairs

    nparts = num_partitions or _nparts()
    pairs = jaccard_pairs(sf_dir, threshold, num_partitions=nparts)
    edges = pairs.map_batches(
        lambda df: pd.DataFrame({"a": df["doc_id_a"].astype("int64"),
                                 "b": df["doc_id_b"].astype("int64")}),
        batch_format="pandas").materialize()
    deg = _edge_degrees(edges, nparts).materialize()
    degp = deg.to_pandas()  # dimension-sized: one row per rich node
    da = dict(zip(degp["node"].astype(int), degp["deg"].astype(int)))
    rows = []
    small = edges.count() <= small_graph_threshold
    e = edges.to_pandas() if small else None
    for k in ks:
        rich = {v for v, d in da.items() if d > k}
        nk = len(rich)
        if small:
            ek = sum(1 for a, b in zip(e["a"].astype(int),
                                       e["b"].astype(int))
                     if a in rich and b in rich)
        else:
            flags = deg.map_batches(
                lambda df, k=k: pd.DataFrame(
                    {"node": df["node"].astype("int64"),
                     "flag": (df["deg"] > k).astype("int64")}),
                batch_format="pandas")
            e1 = _attach_flag(edges, flags, "a", "fa", nparts)
            e2 = _attach_flag(e1, flags, "b", "fb", nparts)
            ek = int(e2.map_batches(
                lambda df: pd.DataFrame({"n": [int(
                    ((df["fa"] == 1) & (df["fb"] == 1)).sum())]}),
                batch_format="pandas").to_pandas()["n"].sum())
        denom = nk * (nk - 1)
        phi = (1000000 * 2 * ek) // denom if denom else 0
        rows.append((k, nk, ek, phi))
    return pd.DataFrame(
        rows, columns=["k", "n_rich", "e_rich",
                       "phi_q6"]).astype("int64")
