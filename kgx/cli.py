"""Command-line driver (parity surface: the reference's ``mc2skos`` CLI,
/root/reference/mc2skos/mc2skos.py:206-330).

Inputs:  a MARCXML file (records split out to synthetic one-record pages),
         or a directory of pages parquet.
Outputs: .ttl (ordered Turtle), .nt (N-Triples), .ndjson (one JSON object
         per concept), or a parquet graph directory with manifest.

Owns its Ray session (guarded init) — library code never does.
"""

from __future__ import annotations

import argparse
import os
import sys


def _pages_from_xml_file(path: str):
    """Raw MARCXML ingest: one Dataset row per <record> element.

    The file is read once on the driver (records split out as bytes);
    the per-record XML parse happens distributed in the extract stage.
    For multi-GB inputs, convert to a pages parquet first.
    """
    import re

    import pyarrow as pa
    import ray.data

    from .schemas import PAGES

    with open(path, "rb") as fp:
        data = fp.read()
    # split on record boundaries without parsing the whole document
    chunks = re.findall(rb"<(?:\w+:)?record[\s>].*?</(?:\w+:)?record>", data,
                        re.DOTALL)
    # records inherit their namespace declarations from the collection
    # wrapper; re-wrap each chunk with the MARC namespace bound to the
    # default prefix and the two conventional ones
    wrap = (b'<c xmlns="http://www.loc.gov/MARC21/slim"'
            b' xmlns:mx="http://www.loc.gov/MARC21/slim"'
            b' xmlns:marc="http://www.loc.gov/MARC21/slim">%s</c>')
    rows = [
        {"url": "file://%s#%d" % (os.path.abspath(path), i),
         "warc_ts": None, "html": wrap % chunk, "text": None, "lang": None}
        for i, chunk in enumerate(chunks)
    ]
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=PAGES))


def _include_dataset(path: str):
    """--include RDF preload: parse a small RDF file (format from
    extension — Turtle/NT/JSON-LD) into triple rows."""
    import pyarrow as pa
    import ray.data

    from .rdfio import load_rdf
    from .schemas import GRAPH

    triples = load_rdf(path)
    rows = [
        {"subj": s, "pred": p, "obj": o, "obj_is_literal": lit,
         "obj_lang": lang, "obj_datatype": dt}
        for (s, p, o, lit, lang, dt) in triples
    ]
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=GRAPH))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="kgx", description="MARC21 Classification/Authority → SKOS, Ray-Data-native")
    parser.add_argument("infile", nargs="?", help="MARCXML file or pages parquet dir")
    parser.add_argument("outfile", nargs="?", help="output (.ttl/.nt/.ndjson or dir)")
    parser.add_argument("-o", "--outformat",
                        choices=["turtle", "nt", "ndjson", "jskos", "parquet"])
    parser.add_argument("--include", action="append", default=[],
                        help="RDF file(s) to merge before dedup "
                             "(format from extension: .ttl/.nt/.jsonld)")
    parser.add_argument("--uri", dest="base_uri", help="concept URI template override")
    parser.add_argument("--scheme", dest="scheme", help="scheme URI or registry code")
    parser.add_argument("--whitespace", dest="whitespace")
    parser.add_argument("--vocabularies", dest="vocab_file",
                        help="YAML vocabulary registry (reference format)")
    parser.add_argument("--altlabels", "--indexterms", dest="altlabels", action="store_true")
    parser.add_argument("--exclude_notes", action="store_true")
    parser.add_argument("--components", action="store_true")
    parser.add_argument("--webdewey", action="store_true")
    parser.add_argument("--skip-classification", dest="skip_classification", action="store_true")
    parser.add_argument("--skip-authority", dest="skip_authority", action="store_true")
    parser.add_argument("--expand", action="store_true")
    parser.add_argument("--skosify", action="store_true",
                        help="transitive broader-closure cleanup pass "
                             "(reference: skosify with examples/skosify.cfg)")
    parser.add_argument("--skosify-repair", dest="skosify_repair",
                        action="store_true",
                        help="with --skosify: also drop cycle-closing "
                             "broader edges and mark broader-less "
                             "in-scheme concepts as top concepts "
                             "(skosify's hierarchy checks; Dataset "
                             "engine only)")
    parser.add_argument("-l", "--list-schemes", dest="list_schemes", action="store_true")
    parser.add_argument("--engine", choices=["dataset", "exchange"],
                        default="dataset",
                        help="exchange = two-pass sort exchange for bulk "
                        "pages-dir runs (writes a sharded output dir; "
                        "parquet or nt)")
    args = parser.parse_args(argv)

    from .config import PipelineConfig
    from .vocab import Vocabularies, load_vocabularies_yaml

    extra = {}
    if args.vocab_file:
        extra = load_vocabularies_yaml(args.vocab_file)

    if args.list_schemes:
        voc = Vocabularies()
        voc.entries.update(Vocabularies(extra).entries if extra else {})
        print("Schemes:")
        for scheme in voc:
            print("- %s" % scheme)
        return 0

    if args.infile is None:
        parser.error("infile required")

    config = PipelineConfig(
        include_altlabels=args.altlabels,
        exclude_notes=args.exclude_notes,
        include_components=args.components,
        include_webdewey=args.webdewey,
        skip_classification=args.skip_classification,
        skip_authority=args.skip_authority,
        expand=args.expand,
        skosify=args.skosify,
        skosify_repair=args.skosify_repair,
        default_uri=args.base_uri,
        default_scheme=args.scheme,
        default_whitespace=args.whitespace,
        extra_vocabularies=extra,
    )

    outformat = args.outformat
    if not outformat and args.outfile:
        ext = args.outfile.rpartition(".")[-1]
        outformat = {"ttl": "turtle", "nt": "nt", "ndjson": "ndjson",
                     "json": "jskos"}.get(ext, "parquet")
    outformat = outformat or "turtle"

    import ray

    # the CLI owns a Ray session ONLY if none exists — an in-process
    # caller's (test's) session must survive this invocation. Honor
    # RAY_ADDRESS so `ray job submit` runs attach to the cluster the
    # job runtime points at instead of forcing a fresh local instance
    # (this sandbox presets RAY_ADDRESS=local, so behavior there is
    # unchanged).
    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)

    import ray.data

    from .materialize import (group_concepts_json, materialize, write_jskos,
                              write_ntriples, write_turtle)
    from .pipeline import build_graph

    if args.engine == "exchange":
        if not os.path.isdir(args.infile):
            parser.error("--engine exchange needs a pages parquet dir")
        if not args.outfile or args.outfile == "-":
            parser.error("--engine exchange writes a sharded output dir")
        if outformat not in ("parquet", "nt"):
            parser.error("--engine exchange writes parquet or nt shards")
        from .exchange import write_canonical_graph

        fmt = "parquet" if outformat == "parquet" else "ntriples"
        manifest = write_canonical_graph(args.infile, args.outfile, config,
                                         fmt=fmt,
                                         include=args.include or None)
        print("wrote %d triples to %s (%d partitions)"
              % (manifest["rows"], args.outfile,
                 len(manifest["partitions"])))
        if owns_ray:
            ray.shutdown()
        return 0

    if os.path.isdir(args.infile):
        pages = ray.data.read_parquet(args.infile)
    else:
        pages = _pages_from_xml_file(args.infile)

    include = [_include_dataset(p) for p in args.include] or None
    graph = build_graph(pages, config, include=include)

    if args.outfile and args.outfile != "-":
        if outformat == "parquet":
            manifest = materialize(graph, args.outfile)
            print("wrote %d triples to %s" % (manifest["rows"], args.outfile))
            if owns_ray:
                ray.shutdown()
            return 0
        out = open(args.outfile, "w", encoding="utf-8")
    else:
        out = sys.stdout

    if outformat == "turtle":
        write_turtle(graph, out, sort=False)
    elif outformat == "nt":
        write_ntriples(graph, out, sort=False)
    elif outformat == "ndjson":
        for batch in group_concepts_json(graph).iter_batches(batch_format="pandas"):
            for doc in batch["json"]:
                out.write(doc + "\n")
    elif outformat == "jskos":
        write_jskos(graph, out)

    if out is not sys.stdout:
        out.close()
    if owns_ray:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
