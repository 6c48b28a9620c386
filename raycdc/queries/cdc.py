"""CDC query entries: the flagship transcript replay (generated log →
engine → lake) and an events-table CDC apply whose final state is
SQL-checkable against DuckDB — the relational witness for the merge kernel.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

from raycdc import gen
from raycdc import merge as M
from raycdc import partition as P
from raycdc.engine import Engine
from raycdc.queries import common as C

# corpus size keyed by the sf directory name (no external data; generated
# deterministically under /tmp and cached by spec fingerprint)
_SPEC_BY_SF = {
    "sf0.001": dict(n_convs=500, mean_turns=8, n_epochs=4),
    "sf0.01": dict(n_convs=4000, mean_turns=10, n_epochs=6),
    "sf0.1": dict(n_convs=20000, mean_turns=12, n_epochs=8),
}


def _spec_for(sf_dir: str, **overrides) -> gen.GenSpec:
    base = _SPEC_BY_SF.get(os.path.basename(os.path.normpath(sf_dir)))
    if base is None:
        base = dict(n_convs=500, mean_turns=8, n_epochs=4)
    base = dict(base)
    base.update(overrides)
    return gen.GenSpec(seed=42, **base)


def _replay(sf_dir: str, salted: bool) -> "pd.DataFrame":
    spec = _spec_for(sf_dir, rollback_epochs=(1,))
    log_dir = gen.cached_change_log(spec)
    lake_dir = os.path.join(
        "/tmp/raycdc-lakes", f"{gen.spec_fingerprint(spec)}-{'s' if salted else 'h'}"
    )
    shutil.rmtree(lake_dir, ignore_errors=True)  # fresh deterministic replay
    with Engine(lake_dir, num_partitions=32, salted=salted) as eng:
        eng.apply_log(log_dir, epochs_per_round=2)
        return eng.read_lake_pandas()


def cdc_replay(sf_dir: str):
    """Flagship: full transcript CDC replay (insert/update/delete/dup +
    one reorg rollback) through the engine; returns the final lake table."""
    return _replay(sf_dir, salted=False)


def cdc_replay_salted(sf_dir: str):
    """Same replay through the salted skew path; must be identical."""
    return _replay(sf_dir, salted=True)


def cdc_conv_stats(sf_dir: str):
    """Derived aggregate over the replayed lake (the reference's
    `aggr_jobs` analog): per-conversation turn count / latest ts."""
    df = _replay(sf_dir, salted=False)
    agg = df.groupby("conv_id", as_index=False).agg(
        n_turns=("turn_idx", "size"),
        max_turn=("turn_idx", "max"),
        last_ts=("ts", "max"),
        max_cursor=("cursor", "max"),
    )
    return agg.sort_values("conv_id").reset_index(drop=True)


# -- events-as-changelog: SQL-checkable CDC apply --------------------------

TURN_MOD = 50


def cdc_apply_events(sf_dir: str):
    """Reinterpret the ``events`` table as a CDC change log — key
    ('u'+user_id, event_id % 50), cursor=event_id, 'error' events are
    deletes, everything else a full-row insert — and fold it with the SAME
    guarded-LWW merge kernel the lake engine uses
    (`raycdc.merge.merge_partition`). DuckDB expresses the result as a
    per-key arg-max, so the kernel is verified relationally end to end."""
    ds = C.read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "props"])
    payload = ["role", "text", "ts"]

    def to_changes(t: pa.Table) -> pa.Table:
        user = t.column("user_id").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        etype = t.column("event_type").to_numpy(zero_copy_only=False)
        conv = np.char.add("u", user.astype(str)).astype(object)
        out = pa.table(
            {
                "conv_id": pa.array(conv, pa.string()),
                "turn_idx": pa.array((eid % TURN_MOD).astype(np.int32)),
                "op": pa.array(
                    np.where(etype == "error", "delete", "insert"), pa.string()
                ),
                "role": t.column("event_type"),
                "text": t.column("props"),
                "ts": t.column("ts"),
                "cursor": pa.array(eid.astype(np.int64)),
                "seq": pa.array(np.zeros(len(eid), np.int32)),
            }
        )
        part = P.assign_part(conv, 16)
        return out.append_column("part", pa.array(part, pa.int32()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = M.merge_partition(None, g, payload)
        out = out[~out[M.DELETED_COL]]
        return out[["conv_id", "turn_idx", "role", "text", "ts", "cursor"]]

    return (
        ds.map_batches(to_changes, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
    )


CDC_APPLY_EVENTS_SQL = f"""
WITH ch AS (
    SELECT 'u' || CAST(user_id AS VARCHAR) AS conv_id,
           CAST(event_id % {TURN_MOD} AS INTEGER) AS turn_idx,
           CASE WHEN event_type = 'error' THEN 'delete' ELSE 'insert' END AS op,
           event_type AS role, props AS text, ts, event_id AS cursor
    FROM events
), ranked AS (
    SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY cursor DESC) AS rn
    FROM ch
)
SELECT conv_id, turn_idx, role, text, ts, cursor
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


QUERIES = {
    "cdc_replay": cdc_replay,
    "cdc_replay_salted": cdc_replay_salted,
    "cdc_conv_stats": cdc_conv_stats,
    "cdc_apply_events": cdc_apply_events,
}

ORACLE_SQL = {
    "cdc_apply_events": CDC_APPLY_EVENTS_SQL,
}
