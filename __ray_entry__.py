"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in raycdc) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship transcript CDC replay at sf0.001 (generated
  deterministic change log → raycdc engine → final lake table).
- ``queries()``: one entry per implemented operator/pipeline from
  SURVEY.md §2 + the training-data-pipeline operators (dedup, ANN, text
  analysis, multimodal plumbing, CDC replay).
- ``oracle_sql()``: DuckDB SQL for the SQL-expressible subset, column
  names matched to the Ray outputs.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from raycdc.queries.cdc import cdc_replay

    return cdc_replay("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from raycdc.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # the driver compares Ray vs SQL at sf0.01 — that tier's paths are
    # embedded in the replay-derived oracle templates
    return oracle_sql_for("/root/testdata/sf0.01")


def oracle_sql_for(sf_dir: str) -> dict[str, str]:
    """Oracle SQL with the replay-derived templates bound to ``sf_dir``.

    The CDC/aggregate/ANN oracles read the SAME generated change-log
    parquet (or deterministically-trained centroids) the Ray queries use,
    so their SQL embeds tier-specific paths; building here also ensures
    the log exists before the SQL runs. Preflight calls this with its own
    tier so sf0.001 smoke runs compare against sf0.001 oracles."""
    from raycdc.queries import ORACLE_SQL
    from raycdc.queries.aggregates import build_aggregate_oracle_sql
    from raycdc.queries.ann import build_ann_oracle_sql
    from raycdc.queries.cdc import build_cdc_oracle_sql
    from raycdc.queries.docs import build_docs_oracle_sql

    out = dict(ORACLE_SQL)
    out.update(build_cdc_oracle_sql(sf_dir))
    out.update(build_aggregate_oracle_sql(sf_dir))
    out.update(build_ann_oracle_sql(sf_dir))
    out.update(build_docs_oracle_sql(sf_dir))
    return out
