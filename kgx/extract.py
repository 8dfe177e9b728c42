"""Stage 1 — extract: pages → parsed records.

A stateless ``map_batches`` transform over zero-copy Arrow page batches:
each page's ``html`` payload is scanned for MARCXML ``<record>`` elements,
each record is parsed once into the flat RECORDS schema (kernel in
``kgx.marc`` / ``kgx.convert``). Data-level failures (malformed XML,
invalid leaders, missing 153) become ``kind='error'`` rows — an explicit
error channel, distinct from Ray's infra-level task retries
(reference behavior: warn-and-continue loop, mc2skos.py:184-190).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import List, Optional

import pyarrow as pa

from . import marc
from .config import PipelineConfig
from .convert import dispatch_record
from .marc import InvalidRecordError
from .schemas import RECORDS

_RECORD_FIELDS = [f.name for f in RECORDS]


def _error_row(url: str, msg: str) -> dict:
    row = {name: None for name in _RECORD_FIELDS}
    row.update(url=url, kind="error", error=msg)
    return row


def _record_row(url: str, parsed: dict) -> dict:
    row = {name: parsed.get(name) for name in _RECORD_FIELDS}
    row["url"] = url
    row["error"] = None
    # per-url byte-identical text invariant: the extracted label text
    row["extracted_text"] = parsed.get("pref_label")
    return row


def extract_batch(batch: pa.Table, config: PipelineConfig) -> pa.Table:
    """pages batch → records batch (pure function, safe for Ray tasks)."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    rows: List[dict] = []
    for url, html in zip(urls, htmls):
        if html is None:
            continue
        try:
            elements = list(marc.iter_records_from_xml(html))
        except ET.ParseError as exc:
            rows.append(_error_row(url, "xml parse error: %s" % exc))
            continue
        for elem in elements:
            try:
                record = marc.parse_record_element(elem)
                parsed = dispatch_record(record, config)
            except InvalidRecordError as exc:
                rows.append(_error_row(url, str(exc)))
                continue
            except Exception as exc:  # data-shaped garbage must not kill the task
                rows.append(_error_row(url, "unexpected: %r" % exc))
                continue
            if parsed is None:  # skip_classification / skip_authority
                continue
            rows.append(_record_row(url, parsed))
    return pa.Table.from_pylist(rows, schema=RECORDS)


def extract_records(pages, config: Optional[PipelineConfig] = None,
                    batch_size: Optional[int] = None):
    """Dataset[pages] → Dataset[records]."""
    config = config or PipelineConfig()
    return pages.map_batches(
        lambda b: extract_batch(b, config),
        batch_format="pyarrow",
        batch_size=batch_size or config.extract_batch_size,
        zero_copy_batch=True,
    )
