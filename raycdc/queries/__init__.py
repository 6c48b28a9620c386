"""The general operator surface: one named query per implemented operator
family from SURVEY.md §2, each over the driver's testdata tables, plus the
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) and the flagship CDC replay.

``QUERIES`` maps name -> fn(sf_dir) -> Dataset|DataFrame|Table.
``ORACLE_SQL`` maps the SQL-expressible subset to DuckDB SQL over the same
parquet tables (views pre-registered by the driver). Column names match
between the two by construction.
"""

from __future__ import annotations

from raycdc.queries import (
    aggregates,
    analytics,
    ann,
    cdc,
    docs,
    events,
    graph,
    multimodal,
    neardup,
    scrub,
    sketches,
    tpch,
    tpch2,
    tpch3,
    traces,
)

_MODULES = [
    tpch, tpch2, tpch3, events, docs, neardup, ann, multimodal, cdc, aggregates,
    traces, sketches, analytics, scrub, graph,
]

QUERIES: dict = {}
ORACLE_SQL: dict = {}
for _m in _MODULES:
    QUERIES.update(_m.QUERIES)
    ORACLE_SQL.update(getattr(_m, "ORACLE_SQL", {}))
