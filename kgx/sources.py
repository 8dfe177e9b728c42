"""Source/sink format plumbing beyond Parquet: NDJSON and CSV.

The reference engine ingests exactly one wire format (MARCXML —
kgx/extract.py owns that path); a corpus pipeline additionally meets
line-delimited JSON and CSV drops. These operators prove the full
export → shard-files → re-ingest path on Ray Data's native readers
(``write_json``/``read_json``, ``write_csv``/``read_csv``: one shard
file per block, so the sink is partitioned and a re-run can resume per
shard), and verify LOSSLESSNESS per document with an md5 over the
round-tripped text — any escaping/quoting/dtype mangling in either
direction changes the digest and fails the DuckDB hash comparison.

Scale shape: both directions are map-only (no all-to-all anywhere);
the md5 check streams per batch. Scratch shards go under /tmp, one
directory per (format, sf), cleaned before each write so reruns are
hermetic.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import numpy as np
import pandas as pd

from .readers import bounded_read_parquet as _bread


def _roundtrip_dir(sf_dir: str, fmt: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return "/tmp/kgx_src_%s_%s" % (fmt, base)


def _digest_batch(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({
        "doc_id": df["doc_id"].astype("int64"),
        "lang": df["lang"].astype(str),
        "n_chars_rt": df["text"].str.len().astype("int64"),
        "text_md5": [hashlib.md5(t.encode("utf-8")).hexdigest()
                     for t in df["text"].astype(str)],
    })


def _export(sf_dir: str, fmt: str) -> str:
    import ray.data

    out = _roundtrip_dir(sf_dir, fmt)
    shutil.rmtree(out, ignore_errors=True)
    ds = _bread("%s/documents.parquet" % sf_dir,
                               columns=["doc_id", "text", "lang"])
    if fmt == "ndjson":
        ds.write_json(out)
    else:
        ds.write_csv(out)
    return out


def ndjson_roundtrip(sf_dir: str):
    """(doc_id, lang, n_chars_rt, text_md5) — documents exported to
    line-delimited JSON shards and re-ingested with
    ``ray.data.read_json``; the digest proves the NDJSON source/sink
    path byte-lossless per document."""
    import ray.data

    out = _export(sf_dir, "ndjson")
    return ray.data.read_json(out).map_batches(_digest_batch,
                                               batch_format="pandas")


def csv_roundtrip(sf_dir: str):
    """(doc_id, lang, n_chars_rt, text_md5) — documents exported to CSV
    shards and re-ingested with ``ray.data.read_csv`` (Arrow CSV:
    quoting handles embedded delimiters/newlines); digest as above."""
    import ray.data

    out = _export(sf_dir, "csv")
    return ray.data.read_csv(out).map_batches(_digest_batch,
                                              batch_format="pandas")


def arrow_ipc_roundtrip(sf_dir: str):
    """(doc_id, lang, n_chars_rt, text_md5) — documents exported to
    Arrow IPC (Feather v2) shard files and re-ingested: Ray Data has
    no native IPC reader, so the ingest side demonstrates the CUSTOM
    SOURCE pattern — ``read_binary_files`` streams whole shard files
    as bytes and a map-only decode (``pyarrow.ipc``) turns each into
    its batch, zero-copy from the buffer. Export is map-only too: each
    block writes one .arrow shard (partitioned, resumable — the same
    layout contract as the NDJSON/CSV sinks); shard names derive from
    the block's doc_id range, so reruns are hermetic.
    """
    import io

    import pyarrow as pa
    import pyarrow.ipc
    import ray.data

    out = _roundtrip_dir(sf_dir, "ipc")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    ds = _bread("%s/documents.parquet" % sf_dir,
                               columns=["doc_id", "text", "lang"])

    def write_shard(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_pylist()
        name = "shard-%020d-%020d.arrow" % (min(ids), max(ids))
        path = os.path.join(out, name)
        with pa.OSFile(path, "wb") as f:
            with pa.ipc.new_file(f, tbl.schema) as w:
                w.write_table(tbl)
        return pa.table({"path": [path],
                         "n": [tbl.num_rows]})

    manifest = ds.map_batches(write_shard,
                              batch_format="pyarrow").to_pandas()
    assert int(manifest["n"].sum()) > 0

    files = ray.data.read_binary_files(out)

    def decode(tbl: pa.Table) -> pd.DataFrame:
        frames = []
        for buf in tbl.column("bytes"):
            reader = pa.ipc.open_file(io.BytesIO(buf.as_py()))
            frames.append(reader.read_all().to_pandas())
        return _digest_batch(pd.concat(frames, ignore_index=True))

    return files.map_batches(decode, batch_format="pyarrow")


def partition_pruned_read(sf_dir: str, lang: str = "en"):
    """(doc_id, lang, n_chars_rt, text_md5) — hive-partitioned layout
    + partition PRUNING: export documents partitioned by ``lang``
    (``write_parquet(partition_cols=["lang"])`` → one directory per
    language), then re-read ONLY the requested language's partition
    directory. At 100 TB this is the difference between scanning the
    whole corpus and scanning 1/|langs| of it — the filter is applied
    by the FILESYSTEM LAYOUT (directory selection), not per row; no
    byte of any other partition is opened (asserted by test). The md5
    digest proves the partitioned sink round-trips losslessly.

    Scale shape: the export is map-only (each block writes its rows
    into per-partition files); the pruned read opens one directory.
    """
    import ray.data

    out = _roundtrip_dir(sf_dir, "hive")
    marker = os.path.join(out, "_DONE")
    if not os.path.isfile(marker):
        shutil.rmtree(out, ignore_errors=True)
        ds = _bread(
            "%s/documents.parquet" % sf_dir,
            columns=["doc_id", "lang", "text"])
        ds.write_parquet(out, partition_cols=["lang"])
        with open(marker, "w") as fp:
            fp.write("ok")

    part_dir = os.path.join(out, "lang=%s" % lang)
    pruned = _bread(part_dir)

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        # the partition column lives in the directory name, not the
        # files — reattach it from the requested partition
        df = df.assign(lang=lang)
        return _digest_batch(df)

    return pruned.map_batches(digest, batch_format="pandas")


def table_cdc_diff(sf_dir: str):
    """(op, doc_id) — snapshot CDC diff with change classification:
    compare corpus snapshot A (documents) against snapshot B (derived
    from A by deterministic md5 rules — id%10==0 rows deleted,
    id%10==1 rows edited, one new row per id%10==2 — exactly the kind
    of drop-over-drop delta an ELT pipeline reconciles) and classify
    every difference as added / removed / changed. The graph-level
    analogue (exchange.diff_canonical_graphs) diffs triples; this is
    the row-level primitive with UPDATE detection via content digest.

    Scale shape: both sides reduce to fixed-width (doc_id, digest)
    rows map-side — full text never crosses the exchange; ONE
    hash(doc_id) co-group classifies in place (A-only → removed,
    B-only → added, digest mismatch → changed).
    """
    import hashlib

    import numpy as np
    import ray
    import ray.data

    from .traindata import _md5_u64

    nparts = max(4, int(ray.cluster_resources().get("CPU", 8)))
    docs = _bread("%s/documents.parquet" % sf_dir,
                                 columns=["doc_id", "text"])

    def digest(texts) -> list:
        return [hashlib.md5(t.encode("utf-8")).hexdigest()
                for t in texts]

    def a_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["doc_id"].astype("int64")
        return pd.DataFrame({
            "k": k, "h": digest(df["text"].astype(str)),
            "side": np.int8(0),
            "bucket": (pd.util.hash_pandas_object(k, index=False)
                       % nparts).astype("int32")})

    def b_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        rule = np.array([_md5_u64("%d:cdc" % d) % 10 for d in ids],
                        dtype="int64")
        keep = df[rule != 0]
        krule = rule[rule != 0]
        texts = [t + " v2" if r == 1 else t
                 for t, r in zip(keep["text"].astype(str), krule)]
        base = pd.DataFrame({"k": keep["doc_id"].astype("int64"),
                             "h": digest(texts)})
        newdocs = ids[rule == 2]
        added = pd.DataFrame({
            "k": (newdocs + 1_000_000_000).astype("int64"),
            "h": digest(["added doc %d" % d for d in newdocs])})
        out = pd.concat([base, added], ignore_index=True)
        out["side"] = np.int8(1)
        out["bucket"] = (pd.util.hash_pandas_object(out["k"],
                                                    index=False)
                         % nparts).astype("int32")
        return out

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == 0][["k", "h"]]
        b = df[df["side"] == 1][["k", "h"]]
        m = a.merge(b, on="k", how="outer", suffixes=("_a", "_b"),
                    indicator=True)
        removed = m[m["_merge"] == "left_only"]["k"]
        added = m[m["_merge"] == "right_only"]["k"]
        changed = m[(m["_merge"] == "both")
                    & (m["h_a"] != m["h_b"])]["k"]
        return pd.DataFrame({
            "op": (["removed"] * len(removed) + ["added"] * len(added)
                   + ["changed"] * len(changed)),
            "doc_id": pd.concat([removed, added, changed],
                                ignore_index=True).astype("int64")})

    out = (docs.map_batches(a_rows, batch_format="pandas")
           .union(docs.map_batches(b_rows, batch_format="pandas"))
           .groupby("bucket").map_groups(classify,
                                         batch_format="pandas")
           .to_pandas())
    return out.sort_values(["op", "doc_id"]).reset_index(drop=True)


def gzip_ndjson_roundtrip(sf_dir: str):
    """(doc_id, lang, n_chars_rt, text_md5) — documents exported to
    GZIP-COMPRESSED NDJSON shards and re-ingested: the
    compressed-source pattern real crawls arrive in (WARC/WET files
    are gzip members). Export is map-only — each block writes one
    ``.jsonl.gz`` shard (mtime pinned to 0 so shard bytes are
    deterministic); ingest streams whole shards as bytes
    (``read_binary_files``) and a map-only decode decompresses +
    parses each — the same custom-source shape as
    ``arrow_ipc_roundtrip``, since Ray's JSON reader does not open
    gzip. The md5 digest proves the compressed path byte-lossless
    per document.
    """
    import gzip
    import io
    import json

    import pyarrow as pa
    import ray.data

    out = _roundtrip_dir(sf_dir, "gzndjson")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    ds = _bread("%s/documents.parquet" % sf_dir,
                columns=["doc_id", "text", "lang"])

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        name = "shard-%020d-%020d.jsonl.gz" % (ids.min(), ids.max())
        path = os.path.join(out, name)
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            for rec in df[["doc_id", "text", "lang"]].to_dict("records"):
                rec["doc_id"] = int(rec["doc_id"])
                gz.write((json.dumps(rec, sort_keys=True) + "\n")
                         .encode("utf-8"))
        with open(path, "wb") as f:
            f.write(buf.getvalue())
        return pd.DataFrame({"path": [path], "n": [len(df)]})

    manifest = ds.map_batches(write_shard,
                              batch_format="pandas").to_pandas()
    assert int(manifest["n"].sum()) > 0

    files = ray.data.read_binary_files(out)

    def decode(tbl: pa.Table) -> pd.DataFrame:
        rows = []
        for buf in tbl.column("bytes"):
            raw = buf.as_py()
            # Arrow's stream opener auto-decompresses by .gz extension
            # inside read_binary_files on some paths — detect the gzip
            # magic so both behaviors decode correctly
            if raw[:2] == b"\x1f\x8b":
                raw = gzip.decompress(raw)
            rows.extend(json.loads(line)
                        for line in raw.decode("utf-8").splitlines()
                        if line)
        return _digest_batch(pd.DataFrame(rows))

    return files.map_batches(decode, batch_format="pyarrow")


def bucketed_join(sf_dir: str, num_buckets: int = 16):
    """(custkey, nationkey, n_orders, sum_cents) — the STORAGE-LAYOUT
    co-partitioned join (Hive/Spark ``CLUSTERED BY ... INTO n
    BUCKETS``): customer and orders are both exported bucketed by
    ``custkey % num_buckets``, and the join then runs as one
    independent task per bucket reading the two ALIGNED bucket
    directories — ZERO exchange at query time. At 100 TB this moves
    the join's all-to-all out of every query and into the (one-time,
    map-only) layout write: the fact tables are shuffled once when
    written, never again, and bucket tasks scale embarrassingly.

    Scale shape: two map-only bucketed writes (write_parquet
    partition_cols — each block appends to its buckets' directories),
    then |buckets| independent read+join tasks, each touching only
    its own two directories. Orders pre-aggregate per custkey inside
    the bucket task; INNER semantics (customers with no orders drop —
    customer_order_counts is the LEFT variant).
    """
    import pyarrow.parquet as pq
    import ray.data

    out = _roundtrip_dir(sf_dir, "bucketed")
    marker = os.path.join(out, "_DONE")
    if not os.path.isfile(marker):
        shutil.rmtree(out, ignore_errors=True)

        def bkt(col):
            def fn(df: pd.DataFrame) -> pd.DataFrame:
                df = df.copy()
                df["bkt"] = (df[col].astype("int64")
                             % num_buckets).astype("int64")
                return df
            return fn

        cust = _bread("%s/customer.parquet" % sf_dir,
                      columns=["c_custkey", "c_nationkey"])
        cust.map_batches(bkt("c_custkey"), batch_format="pandas") \
            .write_parquet(os.path.join(out, "customer"),
                           partition_cols=["bkt"])
        orders = _bread("%s/orders.parquet" % sf_dir,
                        columns=["o_custkey", "o_totalprice"])
        orders.map_batches(bkt("o_custkey"), batch_format="pandas") \
            .write_parquet(os.path.join(out, "orders"),
                           partition_cols=["bkt"])
        with open(marker, "w") as fp:
            fp.write("ok")

    buckets = ray.data.from_items(
        [{"bkt": b} for b in range(num_buckets)])

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for b in df["bkt"]:
            cdir = os.path.join(out, "customer", "bkt=%d" % b)
            odir = os.path.join(out, "orders", "bkt=%d" % b)
            empty = pd.DataFrame({
                "custkey": pd.Series([], dtype="int64"),
                "nationkey": pd.Series([], dtype="int64"),
                "n_orders": pd.Series([], dtype="int64"),
                "sum_cents": pd.Series([], dtype="int64")})
            if not (os.path.isdir(cdir) and os.path.isdir(odir)):
                outs.append(empty)
                continue
            c = pq.read_table(cdir).to_pandas()
            o = pq.read_table(odir).to_pandas()
            o["cents"] = np.floor(
                o["o_totalprice"] * 100 + 0.5).astype("int64")
            agg = o.groupby("o_custkey", as_index=False).agg(
                n_orders=("cents", "size"), sum_cents=("cents", "sum"))
            m = c.merge(agg, left_on="c_custkey", right_on="o_custkey")
            outs.append(pd.DataFrame({
                "custkey": m["c_custkey"].astype("int64"),
                "nationkey": m["c_nationkey"].astype("int64"),
                "n_orders": m["n_orders"].astype("int64"),
                "sum_cents": m["sum_cents"].astype("int64")}))
        return pd.concat(outs, ignore_index=True)

    return buckets.map_batches(join_bucket, batch_format="pandas",
                               batch_size=1)


def zonemap_pruned_read(sf_dir: str, lo: int = 200, hi: int = 280,
                        rows_per_group: int = 64,
                        num_files: int = 8):
    """(doc_id, lang, n_chars_rt, text_md5) — ZONE-MAP (row-group
    min/max statistics) data skipping, the intra-file complement of
    ``partition_pruned_read``'s directory pruning: documents are laid
    out RANGE-PARTITIONED by ``n_chars`` into ``num_files`` files,
    each locally sorted with small parquet row groups, and a range
    predicate ``n_chars ∈ [lo, hi]`` is then served by opening ONLY
    the row groups whose [min, max] zone intersects the range — the
    footer statistics are the index. At 100 TB this is the standard
    warehouse trick (Snowflake micro-partitions, Parquet/ORC
    predicate pushdown): a sorted-layout column turns every range
    scan into a tiny fraction of I/O with no separate index structure.

    Scale shape: the layout write is two streaming passes — an exact
    bounded histogram of the zone column (per-batch ``value_counts``
    partials; rows bounded by DISTINCT lengths, not documents) picks
    the range boundaries, then each range partition sorts locally and
    writes ITS OWN file inside the partition task (nothing sorted or
    written on the driver). The pruned read plans from footer
    METADATA only (zone intersection over all files), then each
    touched file is read by its own task. The residual in-group
    filter is exact, so pruning never changes the answer — only which
    bytes are touched (asserted by test: the planner's group list is
    minimal for the layout).
    """
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from .readers import bounded_read_parquet as _bread

    out = _roundtrip_dir(sf_dir, "zonemap")
    marker = os.path.join(out, "_DONE")
    if not (os.path.isfile(marker)
            and _glob.glob(os.path.join(out, "part_*.parquet"))):
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        ds = _bread("%s/documents.parquet" % sf_dir,
                    columns=["doc_id", "lang", "n_chars", "text"])

        def len_partial(df: pd.DataFrame) -> pd.DataFrame:
            vc = df["n_chars"].value_counts()
            return pd.DataFrame({
                "n_chars": pd.Series(vc.index, dtype="int64").to_numpy(),
                "cnt": vc.to_numpy().astype("int64")})

        hist = (ds.map_batches(len_partial, batch_format="pandas")
                .to_pandas().groupby("n_chars")["cnt"].sum().sort_index())
        if len(hist):
            values = hist.index.to_numpy("int64")
            counts = hist.cumsum().to_numpy("int64")
            total_rows = int(counts[-1])
            cuts = np.array([total_rows * (i + 1) // num_files
                             for i in range(num_files - 1)], dtype="int64")
            bounds = values[np.searchsorted(counts, cuts, side="left")]

            def route(df: pd.DataFrame) -> pd.DataFrame:
                return df.assign(part=np.searchsorted(
                    bounds, df["n_chars"].to_numpy("int64"),
                    side="left").astype("int32"))

            def write_part(df: pd.DataFrame) -> pd.DataFrame:
                p = int(df["part"].iloc[0])
                t = df.sort_values(["n_chars", "doc_id"]) \
                    .drop(columns=["part"])
                pq.write_table(
                    pa.Table.from_pandas(t, preserve_index=False),
                    os.path.join(out, "part_%05d.parquet" % p),
                    row_group_size=rows_per_group)
                return pd.DataFrame({"part": [p], "rows": [len(t)]})

            (ds.map_batches(route, batch_format="pandas")
             .groupby("part")
             .map_groups(write_part, batch_format="pandas")
             .materialize())
        with open(marker, "w") as fp:
            fp.write("ok")

    from .readers import range_pruned_read

    pruned = range_pruned_read(out, "n_chars", lo, hi,
                               columns=["doc_id", "lang", "text"])
    touched, total = range_pruned_read.last_plan
    zonemap_pruned_read.last_plan = (
        [(os.path.basename(f), g) for f, g in touched], total)
    return pruned.map_batches(_digest_batch, batch_format="pandas")


def delta_dedup(sf_dir: str, num_buckets: int = 16):
    """(doc_id, is_dup, dup_of) — INCREMENTAL ingestion dedup: the odd
    doc_ids arrive as today's delta and are checked against a
    persistent BUCKETED digest index of the already-ingested base
    (even doc_ids) — the production crawl shape, where yesterday's
    corpus must never be rescanned to admit today's batch. The dedup
    key is md5 of the first five tokens (leading-boilerplate /
    URL-ish identity; exact-text keys are unique on this corpus). A
    delta doc is a duplicate iff some base doc or an EARLIER delta
    doc shares its key; dup_of is the minimum such doc_id (−1 when
    unique).

    Scale shape: the base index is written ONCE, bucketed by
    key-hash % num_buckets (the bucketed_join layout); each delta
    batch routes to its key buckets and every bucket task opens ONLY
    its own base directory — per-delta cost tracks the delta, not
    the corpus. Within-delta dedup resolves in the same bucket task
    (same key ⇒ same bucket).
    """
    import hashlib

    import pyarrow.parquet as pq

    from .traindata import _md5_u64

    out = _roundtrip_dir(sf_dir, "deltadedup")
    marker = os.path.join(out, "_DONE")

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        prefs = [" ".join(t.split(" ")[:5]) for t in df["text"]]
        keys = [hashlib.md5(p.encode("utf-8")).hexdigest()
                for p in prefs]
        # lists, not Series: a filtered df's index would misalign a
        # fresh RangeIndex Series into NaNs (the typo_pairs lesson)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy("int64"),
            "key": pd.Series(keys, dtype="object"),
            "bkt": pd.Series([_md5_u64(k) % num_buckets for k in keys],
                             dtype="int64")})

    ds = _bread("%s/documents.parquet" % sf_dir,
                columns=["doc_id", "text"])
    if not os.path.isfile(marker):
        shutil.rmtree(out, ignore_errors=True)
        base = ds.map_batches(
            lambda df: keyed(df[df["doc_id"] % 2 == 0]),
            batch_format="pandas")
        base.write_parquet(os.path.join(out, "base"),
                           partition_cols=["bkt"])
        with open(marker, "w") as fp:
            fp.write("ok")

    delta = ds.map_batches(
        lambda df: keyed(df[df["doc_id"] % 2 == 1]),
        batch_format="pandas")

    def check(df: pd.DataFrame) -> pd.DataFrame:
        bkt = int(df["bkt"].iloc[0])
        bdir = os.path.join(out, "base", "bkt=%d" % bkt)
        if os.path.isdir(bdir):
            base = pq.read_table(bdir).to_pandas()[["doc_id", "key"]]
        else:
            base = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "key": pd.Series([], dtype="object")})
        d = df.sort_values("doc_id").reset_index(drop=True)
        best: dict = {}
        for k, i in zip(base["key"], base["doc_id"].astype("int64")):
            if k not in best or i < best[k]:
                best[k] = int(i)
        out_dup, out_of = [], []
        for k, i in zip(d["key"], d["doc_id"].astype("int64")):
            hit = best.get(k)
            out_dup.append(1 if hit is not None else 0)
            out_of.append(hit if hit is not None else -1)
            # this delta doc now guards later same-key delta docs
            if k not in best or i < best[k]:
                best[k] = int(i)
        return pd.DataFrame({
            "doc_id": d["doc_id"].astype("int64"),
            "is_dup": pd.Series(out_dup, dtype="int64"),
            "dup_of": pd.Series(out_of, dtype="int64")})

    return delta.groupby("bkt").map_groups(check, batch_format="pandas")


def merkle_ranges(sf_dir: str, leaf_width: int = 8, fanout: int = 8):
    """(level, range_id, ck_a, ck_b, differs) — MERKLE RANGE-TREE set
    reconciliation (the Dynamo/Cassandra anti-entropy drill-down):
    both snapshots (A = documents; B = table_cdc_diff's derived
    delete/edit/insert snapshot) reduce to order-independent
    checksums per doc_id key range — leaves of ``leaf_width`` keys,
    parents of ``fanout`` leaves — and two replicas reconcile by
    comparing log-many checksums top-down, transferring rows only for
    leaf ranges that actually differ. Unchanged ranges are provably
    never flagged (checksums are functions of the row set; pinned by
    test against the row-level CDC truth).

    Scale shape: map-only — per-batch (level, range, side) partial
    sums of md5-u64 row checksums mod 2⁶³ (the table_checksums
    algebra), folded driver-side over the output-sized cell table;
    zero all-to-alls.
    """
    import hashlib

    from .traindata import _md5_u64

    M = 1 << 63
    docs = _bread("%s/documents.parquet" % sf_dir,
                  columns=["doc_id", "text"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        rows = []  # (level, range, side, partial)
        acc: dict = {}

        def add(k: int, h: str, side: int):
            c = _md5_u64("%d:%s" % (k, h)) % M
            leaf = k // leaf_width
            for level, rid in ((0, leaf), (1, leaf // fanout)):
                key = (level, rid, side)
                acc[key] = (acc.get(key, 0) + c) % M

        for d, t in zip(df["doc_id"].astype("int64"),
                        df["text"].astype(str)):
            d = int(d)
            h_a = hashlib.md5(t.encode("utf-8")).hexdigest()
            add(d, h_a, 0)
            r = _md5_u64("%d:mk" % d) % 100
            if r == 0:
                pass  # deleted in B
            elif r == 1:
                add(d, hashlib.md5((t + " v2").encode("utf-8"))
                    .hexdigest(), 1)
            else:
                add(d, h_a, 1)
            if r == 2:
                add(d + 1_000_000_000,
                    hashlib.md5(("added doc %d" % d).encode("utf-8"))
                    .hexdigest(), 1)
        out = pd.DataFrame(
            [(lv, rid, sd, pc) for (lv, rid, sd), pc in acc.items()],
            columns=["level", "range_id", "side", "partial"])
        return out.astype("int64")

    cell = (docs.map_batches(cells, batch_format="pandas").to_pandas()
            .groupby(["level", "range_id", "side"])["partial"]
            .apply(lambda s: int(sum(int(x) for x in s) % M))
            .reset_index())
    piv = cell.pivot_table(index=["level", "range_id"],
                           columns="side", values="partial",
                           fill_value=0, aggfunc="first").reset_index()
    ck_a = piv.get(0, pd.Series(0, index=piv.index)).astype("int64")
    ck_b = piv.get(1, pd.Series(0, index=piv.index)).astype("int64")
    return pd.DataFrame({
        "level": piv["level"].astype("int64"),
        "range_id": piv["range_id"].astype("int64"),
        "ck_a": ck_a, "ck_b": ck_b,
        "differs": (ck_a != ck_b).astype("int64")})


def zorder_values(sf_dir: str, bits: int = 10,
                  box=(100_000, 400_000, 200_000, 600_000)):
    """(doc_id, x, y, zval, in_box) — Z-ORDER (Morton) space-filling
    curve values over the deterministic 2-D point set
    (spatial_neighbor_pairs' md5 coordinates, rescaled to ``bits``
    bits per axis): zval interleaves the two coordinates' bits, the
    multi-dimensional LAYOUT key behind Databricks ZORDER BY /
    Iceberg sort orders — sorting by zval co-locates 2-D neighbors so
    a box predicate touches a small, nearly-contiguous zval range,
    where a 1-D sort scatters one axis completely (the locality win
    is pinned by test as rank-span contiguity). ``in_box`` flags the
    benchmark box query.

    Scale shape: map-only (the curve value is per-row arithmetic);
    the layout write + zonemap pruning composes with
    zonemap_pruned_read's machinery at 100 TB.
    """
    from .traindata import _md5_u64

    G = 1 << 20
    shift = 20 - bits
    x0, x1, y0, y1 = box
    ds = _bread("%s/documents.parquet" % sf_dir, columns=["doc_id"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        xs = np.array([_md5_u64("x:%d" % d) % G for d in ids],
                      dtype="int64")
        ys = np.array([_md5_u64("y:%d" % d) % G for d in ids],
                      dtype="int64")
        xb = xs >> shift
        yb = ys >> shift
        z = np.zeros(len(ids), dtype="int64")
        for i in range(bits):
            z |= (((xb >> i) & 1) << (2 * i)) \
                | (((yb >> i) & 1) << (2 * i + 1))
        return pd.DataFrame({
            "doc_id": ids.to_numpy("int64"),
            "x": xs, "y": ys,
            "zval": z,
            "in_box": (((xs >= x0) & (xs <= x1)
                        & (ys >= y0) & (ys <= y1))
                       .astype("int64"))})

    return ds.map_batches(fn, batch_format="pandas")
