"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here may call ``ray.init``/``ray.shutdown``.

- ``entry()``    — flagship pipeline on /root/testdata/sf0.001.
- ``queries()``  — one callable per implemented operator/pipeline
  (SURVEY.md §2); each takes ``sf_dir`` and returns a Dataset /
  DataFrame / Table.
- ``oracle_sql()`` — equivalent DuckDB SQL over the same parquet
  tables for the SQL-expressible subset; omitted keys get a weaker
  rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: pages(documents) → extract → link → canonicalize."""
    from kgx import queries as q

    return q.kg_triples("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from kgx import queries as q

    return {
        "kg_triples": q.kg_triples,
        "kg_pred_counts": q.kg_pred_counts,
        "kg_dedup": q.kg_dedup,
        "kg_expand": q.kg_expand,
        "kg_degree_histogram": q.kg_degree_histogram,
    }


def oracle_sql() -> dict[str, str]:
    from kgx.queries import KG_ORACLES

    return dict(KG_ORACLES)
