"""Single-threaded reference reducer (the test oracle).

Applies the CDC semantics of FIXTURES.md §2 — the analog of the reference's
``INSERT ... ON CONFLICT (pk) DO UPDATE ... WHERE EXCLUDED.block_number >
tbl.block_number`` guarded upsert (``indexer/exporters/postgres_item_exporter.py:110-133``,
``common/models/current_token_balances.py:28-36`` in /root/reference) — by a
plain Python loop in stream order. Deliberately unoptimized: correctness gold
standard only.

Semantics per key ``(conv_id, turn_idx)``, events in stream order
(epoch asc, then (cursor, seq) asc within epoch):
  * an event applies iff ``(cursor, seq) > stored (cursor, seq)`` for its key
    (re-delivery of the exact last event is a no-op; stale duplicates lose);
  * ``insert`` replaces the whole row; ``update`` patches only its non-null
    payload columns (upsert-creates if the key is absent); ``delete`` removes
    the row but keeps the watermark (tombstone) so stale events cannot
    resurrect it;
  * ``rollback`` (reorg analog) discards the effects of all *earlier* events
    with ``cursor > rollback_to_cursor``; later events re-use that cursor
    range (the canonical chain).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

PAYLOAD = ["role", "text", "tool", "ts"]


def _stream_order(events: pd.DataFrame) -> pd.DataFrame:
    return events.sort_values(["epoch", "cursor", "seq"], kind="stable").reset_index(
        drop=True
    )


def resolve_rollbacks(events: pd.DataFrame) -> pd.DataFrame:
    """Return the effective (post-reorg) stream: for each rollback event,
    drop all earlier events with cursor > rollback_to_cursor, and drop the
    rollback rows themselves."""
    events = _stream_order(events)
    keep = pd.Series(True, index=events.index)
    is_rb = events["op"] == "rollback"
    for i in events.index[is_rb]:
        c = events.at[i, "rollback_to_cursor"]
        keep &= ~((events.index < i) & (events["cursor"] > c))
    keep &= ~is_rb
    return events[keep].reset_index(drop=True)


def replay(events: pd.DataFrame) -> pd.DataFrame:
    """Replay the full change stream; return the final lake table sorted by
    ``(conv_id, turn_idx)`` with the stored ``(cursor, seq)`` watermark."""
    events = resolve_rollbacks(events)
    payload_cols = [c for c in events.columns if c in PAYLOAD or c == "tool_meta"]
    state: dict = {}  # key -> dict(payload) | None (tombstone)
    marks: dict = {}  # key -> (cursor, seq)

    cols = events.to_dict("list")
    n = len(events)
    for i in range(n):
        op = cols["op"][i]
        key = (cols["conv_id"][i], cols["turn_idx"][i])
        mark = (cols["cursor"][i], cols["seq"][i])
        if key in marks and mark <= marks[key]:
            continue  # guarded LWW: stale or duplicate loses
        marks[key] = mark
        if op == "delete":
            state[key] = None
        elif op == "insert":
            state[key] = {c: cols[c][i] for c in payload_cols}
        elif op == "update":
            cur = state.get(key)
            if cur is None:
                cur = {c: None for c in payload_cols}
            else:
                cur = dict(cur)
            for c in payload_cols:
                v = cols[c][i]
                if v is not None and not (isinstance(v, float) and pd.isna(v)) and not (
                    v is pd.NaT
                ):
                    cur[c] = v
            state[key] = cur
        else:
            raise ValueError(f"unknown op {op!r}")

    rows = []
    for key in sorted(k for k, v in state.items() if v is not None):
        r = {"conv_id": key[0], "turn_idx": key[1]}
        r.update(state[key])
        r["cursor"], r["seq"] = marks[key]
        rows.append(r)
    out_cols = ["conv_id", "turn_idx"] + payload_cols + ["cursor", "seq"]
    out = pd.DataFrame(rows, columns=out_cols)
    out["turn_idx"] = out["turn_idx"].astype("int64")
    out["cursor"] = out["cursor"].astype("int64")
    out["seq"] = out["seq"].astype("int32")
    return out.reset_index(drop=True)


def replay_table(events: pa.Table) -> pd.DataFrame:
    return replay(events.to_pandas())
