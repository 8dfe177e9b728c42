"""Driver-facing query implementations.

Each function takes ``sf_dir`` and returns a Ray Dataset / pandas
DataFrame whose columns match the DuckDB oracle SQL in
``__ray_entry__.oracle_sql`` exactly (names and types), so the driver's
order-insensitive value-hash comparison holds.

Ray is assumed to be initialised by the caller (driver contract).
"""

from __future__ import annotations

import pandas as pd

from .canonicalize import SKOS
from .config import PipelineConfig
from .pages import DOC_VOCABULARY, pages_from_documents
from .pipeline import build_graph


def _doc_config(**overrides) -> PipelineConfig:
    base = dict(include_altlabels=True, extra_vocabularies=DOC_VOCABULARY)
    base.update(overrides)
    return PipelineConfig(**base)


def doc_graph(sf_dir: str, **overrides):
    pages = pages_from_documents(sf_dir)
    return build_graph(pages, _doc_config(**overrides))


def kg_triples(sf_dir: str):
    """Full extract→link→canonicalize run; the headline correctness query."""
    return doc_graph(sf_dir).select_columns(["subj", "pred", "obj", "obj_lang"])


def kg_pred_counts(sf_dir: str):
    """Triples per predicate (aggregation over the canonical graph)."""
    ds = doc_graph(sf_dir).groupby("pred").count()
    return ds.map_batches(lambda df: df.rename(columns={"count()": "n"}),
                          batch_format="pandas")


def kg_dedup(sf_dir: str):
    """Set semantics under duplicated input: the same pages streamed twice
    must yield the identical graph (parity: rdflib.Graph.add set semantics,
    mc2skos.py:183)."""
    pages = pages_from_documents(sf_dir).union(pages_from_documents(sf_dir))
    graph = build_graph(pages, _doc_config())
    ds = graph.groupby("pred").count()
    return ds.map_batches(lambda df: df.rename(columns={"count()": "n"}),
                          batch_format="pandas")


def kg_expand(sf_dir: str):
    """--expand inference closure: inverse narrower edges entailed by
    broader (parity: skosify.infer.skos_hierarchical, mc2skos.py:192-196)."""
    graph = doc_graph(sf_dir, expand=True)
    import pyarrow.compute as pc

    def narrower_only(batch):
        return batch.filter(pc.equal(batch.column("pred"), SKOS + "narrower"))

    return graph.map_batches(narrower_only, batch_format="pyarrow") \
        .select_columns(["subj", "pred", "obj"])


def kg_degree_histogram(sf_dir: str):
    """Distribution of per-subject triple counts (degree histogram) —
    exercises the two-level aggregation path."""
    graph = doc_graph(sf_dir)
    per_subj = graph.groupby("subj").count()
    hist = per_subj.map_batches(
        lambda df: df.rename(columns={"count()": "degree"}),
        batch_format="pandas",
    ).groupby("degree").count()
    return hist.map_batches(
        lambda df: df.rename(columns={"count()": "n_subjects"}),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# Oracle SQL — the shared triple-construction CTE over `documents`
# ---------------------------------------------------------------------------

# Reconstructs, in ANSI SQL, the exact triples the pipeline extracts from
# the deterministic MARCXML embed in kgx.pages.pages_from_documents.
TRIPLES_CTE = """
WITH docs AS (
  SELECT doc_id, text, lang, source, n_chars,
         'http://example.org/doc/' || doc_id AS uri,
         strftime(DATE '2020-01-01' + CAST(doc_id % 365 AS INTEGER), '%Y-%m-%d') AS created
  FROM documents
),
triples AS (
  SELECT uri AS subj, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
         'http://www.w3.org/2004/02/skos/core#Concept' AS obj, NULL AS obj_lang FROM docs
  UNION ALL
  SELECT uri, 'http://www.w3.org/2004/02/skos/core#inScheme',
         'http://example.org/docs/', NULL FROM docs
  UNION ALL
  SELECT uri, 'http://purl.org/dc/terms/created', created, NULL FROM docs
  UNION ALL
  SELECT uri, 'http://purl.org/dc/terms/identifier', 'DOC' || doc_id, NULL FROM docs
  UNION ALL
  SELECT uri, 'http://www.w3.org/2004/02/skos/core#prefLabel', text, lang FROM docs
  UNION ALL
  SELECT uri, 'http://www.w3.org/2004/02/skos/core#altLabel',
         source || '--' || lang, lang FROM docs
  UNION ALL
  SELECT uri, 'http://www.w3.org/2004/02/skos/core#editorialNote',
         'chars ' || n_chars, lang FROM docs
  UNION ALL
  SELECT uri, 'http://www.w3.org/2004/02/skos/core#broader',
         'http://example.org/doc/' || (doc_id // 2), NULL FROM docs WHERE doc_id > 0
  UNION ALL
  SELECT uri, 'http://www.w3.org/2002/07/owl#deprecated', 'true', NULL
  FROM docs WHERE doc_id % 10 = 0
)
"""

KG_ORACLES = {
    "kg_triples": TRIPLES_CTE + "SELECT subj, pred, obj, obj_lang FROM triples",
    "kg_pred_counts": TRIPLES_CTE + "SELECT pred, count(*) AS n FROM triples GROUP BY pred",
    "kg_dedup": TRIPLES_CTE + "SELECT pred, count(*) AS n FROM triples GROUP BY pred",
    "kg_expand": TRIPLES_CTE + (
        "SELECT obj AS subj, 'http://www.w3.org/2004/02/skos/core#narrower' AS pred, "
        "subj AS obj FROM triples "
        "WHERE pred = 'http://www.w3.org/2004/02/skos/core#broader'"
    ),
    "kg_degree_histogram": TRIPLES_CTE + (
        "SELECT degree, count(*) AS n_subjects FROM ("
        "  SELECT subj, count(*) AS degree FROM triples GROUP BY subj"
        ") GROUP BY degree"
    ),
}
