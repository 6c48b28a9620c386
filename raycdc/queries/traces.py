"""Recursive trace flatten — the debug-trace reader analog.

The reference ingests ``debug_traceTransaction`` call trees and recursively
flattens nested ``calls`` arrays into rows keyed by trace address (the
root→leaf child-index path), e.g.
``indexer/domains/trace.py`` + ``indexer/jobs/export_traces_job.py`` in
/root/reference. raycdc re-expresses it Ray-Data-first:

  * stage 1 *builds* the nested call tree as a real Arrow
    ``list<struct<gas, op, calls: list<struct<gas, op>>>>`` column —
    vectorized offset arithmetic, deterministic from ``event_id`` (the
    sandbox has no RPC; the tree shape IS the oracle contract, so DuckDB
    can reproduce the flattening arithmetically);
  * stage 2 is the actual operator: a GENERIC level-by-level flatten over
    Arrow ListArray buffers — each level is one ``np.repeat`` over the
    list offsets plus one string-join for the path column; recursion depth
    is the only Python loop (bounded by tree depth, never by row count).

The flatten never touches Python rows: a 10^9-row trace table flattens as
a stream of ``map_batches`` over zero-copy Arrow buffers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raycdc.queries import common as C

# deterministic tree-shape contract (mirrored by the SQL oracle):
#   root:        gas = event_id % 1000 + 21000, op = event_type
#   children:    count = event_id % 3,
#                child j: gas = (event_id*7 + j) % 500, op = 'call'
#   grandchild:  exists iff (event_id + j) % 2 == 1 (always ordinal 0),
#                gas = (event_id*13 + j) % 250, op = 'staticcall'
_MAX_KIDS = 3


def _build_calls(eid: np.ndarray) -> pa.ListArray:
    """Vectorized synthesis of the nested calls column (list offsets +
    struct fields, no per-row Python)."""
    n = len(eid)
    c1 = (eid % _MAX_KIDS).astype(np.int64)
    off1 = np.zeros(n + 1, np.int64)
    np.cumsum(c1, out=off1[1:])
    parent1 = np.repeat(np.arange(n, dtype=np.int64), c1)
    child_j = np.arange(len(parent1), dtype=np.int64) - off1[:-1][parent1]
    e1 = eid[parent1]
    gas1 = (e1 * 7 + child_j) % 500
    op1 = pa.array(np.full(len(parent1), "call"), pa.string())

    c2 = ((e1 + child_j) % 2).astype(np.int64)
    off2 = np.zeros(len(parent1) + 1, np.int64)
    np.cumsum(c2, out=off2[1:])
    parent2 = np.repeat(np.arange(len(parent1), dtype=np.int64), c2)
    gas2 = (e1[parent2] * 13 + child_j[parent2]) % 250
    op2 = pa.array(np.full(len(parent2), "staticcall"), pa.string())
    leaf = pa.StructArray.from_arrays(
        [pa.array(gas2, pa.int64()), op2,
         pa.ListArray.from_arrays(
             np.zeros(len(parent2) + 1, np.int32),
             pa.StructArray.from_arrays(
                 [pa.array([], pa.int64()), pa.array([], pa.string())],
                 ["gas", "op"],
             ),
         )],
        ["gas", "op", "calls"],
    )
    grand = pa.ListArray.from_arrays(pa.array(off2, pa.int32()), leaf)
    child = pa.StructArray.from_arrays(
        [pa.array(gas1, pa.int64()), op1, grand], ["gas", "op", "calls"]
    )
    return pa.ListArray.from_arrays(pa.array(off1, pa.int32()), child)


def _flatten_level(
    calls: pa.ListArray, event: pa.Array, path: pa.Array | None
):
    """One flatten step: list<struct> → (child structs, repeated parent
    event ids, child paths). Pure offset arithmetic + one vectorized
    string join."""
    if calls.offset != 0 or not isinstance(calls, pa.ListArray):
        calls = calls.combine_chunks() if isinstance(calls, pa.ChunkedArray) else calls
    off = calls.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(off)
    total = int(off[-1] - off[0])
    pidx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    ordinal = np.arange(total, dtype=np.int64) + int(off[0]) - off[:-1][pidx]
    values = calls.flatten()
    ev = event.take(pa.array(pidx, pa.int64()))
    ord_str = pc.cast(pa.array(ordinal, pa.int64()), pa.string())
    if path is None:
        child_path = ord_str
    else:
        child_path = pc.binary_join_element_wise(
            path.take(pa.array(pidx, pa.int64())), ord_str, "."
        )
    return values, ev, child_path


def trace_flatten(sf_dir: str):
    """Flatten every event's synthesized call tree into one row per call,
    keyed by (event_id, depth, path) — the trace-address flattening of the
    reference's trace reader, streamed through map_batches."""
    ds = C.read(sf_dir, "events", ["event_id", "event_type"])

    def fn(t: pa.Table) -> pa.Table:
        eid_col = t.column("event_id")
        if isinstance(eid_col, pa.ChunkedArray):
            eid_col = eid_col.combine_chunks()
        eid = eid_col.to_numpy(zero_copy_only=False).astype(np.int64)
        root_gas = eid % 1000 + 21000

        outs = [pa.table({
            "event_id": eid_col,
            "depth": pa.array(np.zeros(len(eid), np.int32)),
            "path": pa.array(np.full(len(eid), ""), pa.string()),
            "gas": pa.array(root_gas, pa.int64()),
            "op": t.column("event_type"),
        })]

        calls, event, path, depth = _build_calls(eid), eid_col, None, 1
        while len(calls) and pc.list_value_length(calls).null_count < len(calls):
            values, ev, child_path = _flatten_level(calls, event, path)
            if not len(values):
                break
            outs.append(pa.table({
                "event_id": ev,
                "depth": pa.array(np.full(len(values), depth, np.int32)),
                "path": child_path,
                "gas": values.field("gas"),
                "op": values.field("op"),
            }))
            if values.type.num_fields < 3:
                break
            calls, event, path, depth = (
                values.field("calls"), ev, child_path, depth + 1
            )
        return pa.concat_tables(outs)

    return ds.map_batches(fn, batch_format="pyarrow")


TRACE_FLATTEN_SQL = """
WITH kids AS (SELECT unnest([0, 1, 2]) AS j)
SELECT event_id, 0 AS depth, '' AS path,
       event_id % 1000 + 21000 AS gas, event_type AS op
FROM events
UNION ALL
SELECT e.event_id, 1, CAST(k.j AS VARCHAR),
       (e.event_id * 7 + k.j) % 500, 'call'
FROM events e JOIN kids k ON k.j < e.event_id % 3
UNION ALL
SELECT e.event_id, 2, CAST(k.j AS VARCHAR) || '.0',
       (e.event_id * 13 + k.j) % 250, 'staticcall'
FROM events e JOIN kids k ON k.j < e.event_id % 3
WHERE (e.event_id + k.j) % 2 = 1
"""

def trace_depth_stats(sf_dir: str):
    """Tree analytics over the flattened trace stream: per (depth, op)
    node counts and gas totals — the call-tree profile report. Composes
    :func:`trace_flatten` (still a lazy Dataset — the flatten streams
    straight into the aggregation, nothing materializes) with per-batch
    partials over the BOUNDED (depth × op) grain; the driver folds
    O(grain × blocks) rows. All-integer."""
    import pandas as pd

    ds = trace_flatten(sf_dir)

    def partial(b: pa.Table) -> "pd.DataFrame":
        df = pd.DataFrame(
            {
                "depth": b.column("depth").to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "op": b.column("op").to_numpy(zero_copy_only=False),
                "n": np.int64(1),
                "sum_gas": b.column("gas").to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        return df.groupby(["depth", "op"], as_index=False).sum()

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["depth", "op"], as_index=False)
        .sum()
    )
    for c in ("depth", "n", "sum_gas"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["depth", "op"], kind="stable").reset_index(
        drop=True
    )


TRACE_DEPTH_STATS_SQL = f"""
WITH flat AS ({TRACE_FLATTEN_SQL})
SELECT CAST(depth AS BIGINT) AS depth, op,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(gas) AS BIGINT) AS sum_gas
FROM flat GROUP BY depth, op
ORDER BY depth, op
"""


QUERIES = {
    "trace_flatten": trace_flatten,
    "trace_depth_stats": trace_depth_stats,
}
ORACLE_SQL = {
    "trace_flatten": TRACE_FLATTEN_SQL,
    "trace_depth_stats": TRACE_DEPTH_STATS_SQL,
}
