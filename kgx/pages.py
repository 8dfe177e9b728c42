"""Deterministic synthesis of Common-Crawl-style pages tables.

Two generators, both pure functions of their inputs (no wall-clock, no
global RNG), so every run — and the DuckDB oracle — sees identical data:

- ``pages_from_documents``: wraps each row of the driver's ``documents``
  table into a MARCXML authority record. The embedding is simple enough
  that the final triple set is expressible in ANSI SQL over ``documents``
  — this is the correctness oracle for extract→link→canonicalize.
- ``synthetic_pages``: a richer classification+authority corpus (153
  hierarchies, notes, mappings, 765 components, invalid records, skewed
  scheme membership) used by the benchmark and scale tests.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from xml.sax.saxutils import escape

import pandas as pd

from .marc import ISO639_1_TO_2B

DOC_SCHEME_CODE = "docs"
DOC_VOCABULARY = {
    DOC_SCHEME_CODE: {
        "kind": "authority",
        "concept": "http://example.org/doc/{control_number[3:]}",
        "scheme": "http://example.org/docs/",
    }
}

_EPOCH = datetime(2020, 1, 1)


def _doc_record_xml(doc_id: int, text: str, lang: str, source: str, n_chars: int) -> str:
    created = _EPOCH + timedelta(days=int(doc_id) % 365)
    lang2b = ISO639_1_TO_2B.get(lang, "eng")
    leader5 = "d" if doc_id % 10 == 0 else "n"
    f008 = created.strftime("%y%m%d") + "     z"  # [11] = 'z' → scheme via 040 $f
    parts = [
        '<record xmlns="http://www.loc.gov/MARC21/slim">',
        "<leader>00000%sz  a2200000n  4500</leader>" % leader5,
        '<controlfield tag="001">DOC%d</controlfield>' % doc_id,
        '<controlfield tag="008">%s</controlfield>' % f008,
        '<datafield tag="040" ind1=" " ind2=" ">'
        '<subfield code="b">%s</subfield><subfield code="f">%s</subfield>'
        "</datafield>" % (lang2b, DOC_SCHEME_CODE),
        '<datafield tag="150" ind1=" " ind2=" ">'
        '<subfield code="a">%s</subfield></datafield>' % escape(text),
        '<datafield tag="450" ind1=" " ind2=" ">'
        '<subfield code="a">%s</subfield><subfield code="x">%s</subfield>'
        "</datafield>" % (escape(source), lang),
        '<datafield tag="667" ind1=" " ind2=" ">'
        '<subfield code="a">chars %d</subfield></datafield>' % n_chars,
    ]
    if doc_id > 0:
        parts.append(
            '<datafield tag="550" ind1=" " ind2=" ">'
            '<subfield code="w">g</subfield>'
            '<subfield code="a">parent</subfield>'
            '<subfield code="0">DOC%d</subfield></datafield>' % (doc_id // 2)
        )
    parts.append("</record>")
    return "".join(parts)


def _documents_to_pages(df: pd.DataFrame) -> pd.DataFrame:
    htmls = []
    urls = []
    ts = []
    for row in df.itertuples(index=False):
        doc_id = int(row.doc_id)
        htmls.append(
            ("<html><body>"
             + _doc_record_xml(doc_id, row.text, row.lang, row.source, int(row.n_chars))
             + "</body></html>").encode("utf-8")
        )
        urls.append("https://example.org/doc/%d" % doc_id)
        ts.append(_EPOCH + timedelta(seconds=doc_id))
    return pd.DataFrame({
        "url": urls,
        "warc_ts": ts,
        "html": htmls,
        # the byte-identical extracted-text invariant: extraction must
        # recover exactly this string from html
        "text": df["text"].tolist(),
        "lang": df["lang"].tolist(),
    })


def pages_from_documents(sf_dir: str, override_num_blocks=None):
    """Dataset[documents] → Dataset[pages] (deterministic embed)."""
    import ray.data

    docs = ray.data.read_parquet(
        "%s/documents.parquet" % sf_dir,
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    return docs.map_batches(_documents_to_pages, batch_format="pandas")


# ---------------------------------------------------------------------------
# Synthetic benchmark corpus
# ---------------------------------------------------------------------------

_CAPTION_WORDS = [
    "Systems", "Theory", "Knowledge", "Languages", "History", "Analysis",
    "Methods", "Physics", "Chemistry", "Biology", "Computing", "Society",
    "Religion", "Arts", "Literature", "Geography", "Statistics", "Music",
]


def _cls_record_xml(i: int) -> str:
    """Deterministic ddc-style classification record for page index i."""
    top = i % 10
    mid = (i // 10) % 10
    leaf = (i // 100) % 10
    notation = "%d%d%d.%d" % (top, mid, leaf, i)
    parent = "%d%d%d" % (top, mid, leaf)
    caption = "%s %s %d" % (
        _CAPTION_WORDS[i % len(_CAPTION_WORDS)],
        _CAPTION_WORDS[(i * 7 + 3) % len(_CAPTION_WORDS)],
        i,
    )
    created = _EPOCH + timedelta(days=i % 365)
    f008 = created.strftime("%y%m%d") + ("abdaaaba" if i % 17 == 0 else "aaaaaaaa")
    parts = [
        '<record xmlns="http://www.loc.gov/MARC21/slim">',
        "<leader>00000nw  a2200000n  4500</leader>",
        '<controlfield tag="001">ocd%08d</controlfield>' % i,
        '<controlfield tag="008">%s</controlfield>' % f008,
        '<datafield tag="084" ind1="0" ind2=" ">'
        '<subfield code="a">ddc</subfield><subfield code="c">23no</subfield></datafield>',
        '<datafield tag="153" ind1=" " ind2=" ">'
        '<subfield code="a">%s</subfield><subfield code="e">%s</subfield>'
        '<subfield code="j">%s</subfield></datafield>' % (notation, parent, caption),
    ]
    if i % 3 == 0:
        parts.append(
            '<datafield tag="680" ind1="1" ind2=" ">'
            '<subfield code="i">Her:</subfield>'
            '<subfield code="t">tema %d</subfield>'
            '<subfield code="9">ess=nch</subfield></datafield>' % i
        )
    if i % 4 == 0:
        parts.append(
            '<datafield tag="750" ind1=" " ind2="0">'
            '<subfield code="a">Heading %d</subfield>'
            '<subfield code="0">sh%08d</subfield></datafield>' % (i, i)
        )
    if i % 5 == 0:
        # index term in an unknown vocabulary → dropped-link metrics channel
        parts.append(
            '<datafield tag="750" ind1=" " ind2="7">'
            '<subfield code="a">Term %d</subfield>'
            '<subfield code="0">(OCoLC-D)%08x</subfield>'
            '<subfield code="2">ddcri</subfield></datafield>' % (i, i * 2654435761 % 2**32)
        )
    if i % 7 == 0:
        parts.append(
            '<datafield tag="765" ind1="0" ind2=" ">'
            '<subfield code="b">%s</subfield>'
            '<subfield code="r">%d</subfield><subfield code="s">%02d</subfield>'
            '<subfield code="u">%s</subfield></datafield>' % (parent, top, i % 100, notation)
        )
    parts.append("</record>")
    return "".join(parts)


def _auth_record_xml(i: int) -> str:
    created = _EPOCH + timedelta(days=i % 365)
    f008 = created.strftime("%y%m%d") + "     z"
    parts = [
        '<record xmlns="http://www.loc.gov/MARC21/slim">',
        "<leader>00000nz  a2200000n  4500</leader>",
        '<controlfield tag="001">%d</controlfield>' % (1000000 + i),
        '<controlfield tag="008">%s</controlfield>' % f008,
        '<datafield tag="040" ind1=" " ind2=" ">'
        '<subfield code="b">ger</subfield><subfield code="f">gnd</subfield></datafield>',
        '<datafield tag="150" ind1=" " ind2=" ">'
        '<subfield code="a">Begriff %d</subfield></datafield>' % i,
        '<datafield tag="024" ind1="7" ind2=" ">'
        '<subfield code="a">Q%d</subfield>'
        '<subfield code="2">wikidata</subfield></datafield>' % i,
        '<datafield tag="550" ind1=" " ind2=" ">'
        '<subfield code="w">g</subfield><subfield code="a">Ober</subfield>'
        '<subfield code="0">%d</subfield></datafield>' % (1000000 + i // 2),
        "</record>",
    ]
    return "".join(parts)


def _synthetic_batch(batch: pd.DataFrame) -> pd.DataFrame:
    rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    for i in batch["id"].tolist():
        i = int(i)
        records = [_cls_record_xml(i)]
        if i % 9 == 0:
            records.append(_auth_record_xml(i))
        if i % 10 == 9 and i >= 9:
            # deliberate exact duplicate of an earlier page's record —
            # exercises cross-page dedup at a known ~10% rate
            records.append(_cls_record_xml(i - 9))
        if i % 50 == 0:  # invalid: bibliographic leader → error channel
            records.append(
                '<record xmlns="http://www.loc.gov/MARC21/slim">'
                "<leader>00000na  a2200000n  4500</leader>"
                '<controlfield tag="001">bib%d</controlfield></record>' % i
            )
        html = ("<html><body><main>"
                + "".join(records)
                + "</main></body></html>").encode("utf-8")
        rows["url"].append("https://example.org/page/%d" % i)
        rows["warc_ts"].append(_EPOCH + timedelta(seconds=i))
        rows["html"].append(html)
        rows["text"].append("")
        rows["lang"].append("nb")
    return pd.DataFrame(rows)


def synthetic_pages(n: int, override_num_blocks=None):
    """Deterministic synthetic benchmark corpus of n pages."""
    import ray
    import ray.data

    if override_num_blocks is None:
        # blocks proportional to the cluster so scheduling overhead stays
        # flat across cluster sizes (default range() blocking is static)
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        override_num_blocks = max(8, min(ncpu * 4, n // 250 or 1))
    ds = ray.data.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(_synthetic_batch, batch_format="pandas")
