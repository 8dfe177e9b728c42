"""Arrow schemas for the pipeline's stage boundaries.

pages → (extract) → records → (link) → triples → (canonicalize) → graph
"""

import pyarrow as pa

# Input: Common-Crawl-style web pages (BASELINE.json input_hint)
PAGES = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

_LINK = pa.struct([
    ("scheme_code", pa.string()),
    ("relation", pa.string()),
    ("control_number", pa.string()),
    ("object", pa.string()),
    ("collection", pa.string()),
    ("edition", pa.string()),
    ("direct_uri", pa.string()),
    ("tag", pa.string()),
])

_NOTE = pa.struct([("kind", pa.string()), ("text", pa.string())])
_WD = pa.struct([("key", pa.string()), ("value", pa.string())])

# Intermediate: parsed records (the reference's Record struct, record.py:39-58)
RECORDS = pa.schema([
    ("url", pa.string()),
    ("kind", pa.string()),  # classification | authority | error
    ("error", pa.string()),
    ("control_number", pa.string()),
    ("control_number_identifier", pa.string()),
    ("created", pa.timestamp("us")),
    ("modified", pa.timestamp("us")),
    ("lang", pa.string()),
    ("pref_label", pa.string()),
    ("alt_labels", pa.list_(pa.string())),
    ("notes", pa.list_(_NOTE)),
    ("webdewey", pa.list_(_WD)),
    ("components", pa.list_(pa.string())),
    ("record_type", pa.string()),
    ("number_type", pa.string()),
    ("display", pa.bool_()),
    ("synthesized", pa.bool_()),
    ("deprecated", pa.bool_()),
    ("is_top_concept", pa.bool_()),
    ("notation", pa.string()),
    ("table", pa.string()),
    ("parent_notation", pa.string()),
    ("scheme_code", pa.string()),
    ("scheme_edition", pa.string()),
    ("links", pa.list_(_LINK)),
    ("extracted_text", pa.string()),  # byte-identical per-url invariant
])

# Output: triples (url kept for lineage until canonicalize)
TRIPLES = pa.schema([
    ("url", pa.string()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("obj_is_literal", pa.bool_()),
    ("obj_lang", pa.string()),
    ("obj_datatype", pa.string()),
])

GRAPH = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("obj_is_literal", pa.bool_()),
    ("obj_lang", pa.string()),
    ("obj_datatype", pa.string()),
])
