"""Vectorized guarded-LWW sorted-merge kernel (pure Arrow/pandas, no Ray).

The Ray-Data-native replacement for the reference's PostgreSQL upsert
(``INSERT ... ON CONFLICT (pk) DO UPDATE SET ... WHERE EXCLUDED.block_number
> tbl.block_number``, ``indexer/exporters/postgres_item_exporter.py:110-133``
and ``common/models/current_token_balances.py:28-36`` in /root/reference) and
of its in-memory arg-max reducer ``distinct_collections_by_group``
(``indexer/utils/collection_utils.py:8-19``).

Algorithm (one partition, one commit round):
  1. Represent each existing lake row as a pseudo-event at its stored
     ``(cursor, seq)`` watermark — ``insert`` for live rows, ``delete`` for
     tombstones — with source-priority 0 so it sorts before a same-watermark
     re-delivered event.
  2. Union with the round's change events, sort by
     ``(key, cursor, seq, src)``, drop exact ``(key, cursor, seq)``
     re-deliveries (keep-first).
  3. Segment fold: ``insert``/``delete`` start a new segment (full replace /
     tombstone); ``update`` patches. Only each key's last segment survives.
     Per payload column the final value is the last non-null entry of the
     last segment (``update`` nulls mean "unchanged" — FIXTURES.md §2).
  4. A key is dead iff its last event is a ``delete``; dead keys persist as
     tombstone rows (``_deleted=true``) so stale duplicates can never
     resurrect them — the analog of Hemera's ``reorg`` flag + partial unique
     index (``common/models/blocks.py:42,64-77``).

Equivalent to the oracle's stream-order replay because fresh events arrive
in ``(cursor, seq)`` order and duplicates carry their original watermark
(stream contract in gen.py) — so "apply in stream order with guard" equals
"sort, dedup, fold".
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raycdc import schema as S

SYS_EVENT_COLS = {"op", "cursor", "seq", "epoch", "rollback_to_cursor"}
DELETED_COL = "_deleted"


def payload_columns(change_schema_names: list[str]) -> list[str]:
    return [
        c
        for c in change_schema_names
        if c not in SYS_EVENT_COLS and c not in S.KEY_COLS
    ]


def fragment_schema_for(change_schema: pa.Schema) -> pa.Schema:
    lake = S.lake_schema_for(change_schema)
    return lake.append(pa.field(DELETED_COL, pa.bool_()))


def _lake_as_events(fragment: pd.DataFrame, payload: list[str]) -> pd.DataFrame:
    """Step 1: existing fragment rows → pseudo-events at their watermark."""
    ev = fragment[S.KEY_COLS + payload + ["cursor", "seq"]].copy()
    ev["op"] = np.where(fragment[DELETED_COL].to_numpy(), "delete", "insert")
    ev["_src"] = np.int8(0)
    return ev


def merge_partition(
    fragment: pd.DataFrame | None,
    events: pd.DataFrame,
    payload: list[str],
    with_boundary: bool = False,
) -> pd.DataFrame:
    """Merge one partition's change events into its existing fragment.

    ``fragment``: current fragment rows (key + payload + cursor/seq +
    ``_deleted``) or None. ``events``: this round's change rows for the
    partition (op + key + payload + cursor/seq; rollbacks are handled a
    level above, in lake.py, never here). Returns the new fragment, sorted
    by ``(conv_id, turn_idx)`` — the stable-turn-ordering invariant.
    """
    ev = events[S.KEY_COLS + payload + ["cursor", "seq", "op"]].copy()
    ev["_src"] = np.int8(1)
    if fragment is not None and len(fragment):
        ev = pd.concat(
            [_lake_as_events(fragment, payload), ev], ignore_index=True
        )
    if len(ev) == 0:
        return _empty_fragment(payload)

    # sort by (conv_id, turn_idx, cursor, seq, src) WITHOUT an object-string
    # sort of every row: factorize conv_id (O(n) hashing), lexically rank
    # only the U unique ids, then one integer lexsort
    codes, uniques = pd.factorize(ev["conv_id"].to_numpy(), sort=False)
    lex_rank = np.empty(len(uniques), dtype=np.int64)
    lex_rank[np.argsort(uniques, kind="stable")] = np.arange(len(uniques))
    conv_key = lex_rank[codes]
    turn_a = ev["turn_idx"].to_numpy().astype(np.int64, copy=False)
    cursor_a = ev["cursor"].to_numpy().astype(np.int64, copy=False)
    seq_a = ev["seq"].to_numpy().astype(np.int64, copy=False)
    src_a = ev["_src"].to_numpy()
    order = np.lexsort((src_a, seq_a, cursor_a, turn_a, conv_key))
    ev = ev.iloc[order].reset_index(drop=True)
    conv_key, turn_a = conv_key[order], turn_a[order]
    cursor_a, seq_a = cursor_a[order], seq_a[order]

    # drop exact (key, cursor, seq) re-deliveries (keep first = lake/src-0)
    same = np.zeros(len(ev), dtype=bool)
    same[1:] = (
        (conv_key[1:] == conv_key[:-1])
        & (turn_a[1:] == turn_a[:-1])
        & (cursor_a[1:] == cursor_a[:-1])
        & (seq_a[1:] == seq_a[:-1])
    )
    if same.any():
        keep_mask = ~same
        ev = ev[keep_mask].reset_index(drop=True)
        conv_key, turn_a = conv_key[keep_mask], turn_a[keep_mask]

    n = len(ev)
    newkey = np.ones(n, dtype=bool)
    newkey[1:] = (conv_key[1:] != conv_key[:-1]) | (turn_a[1:] != turn_a[:-1])

    op = ev["op"].to_numpy()
    boundary = (op == "insert") | (op == "delete")
    bcum = np.cumsum(boundary)
    key_start = np.flatnonzero(newkey)
    counts = np.diff(np.append(key_start, n))
    start_base = np.where(key_start > 0, bcum[np.maximum(key_start - 1, 0)], 0)
    seg = bcum - np.repeat(start_base, counts)  # per-key boundary count incl. self
    key_end = np.append(key_start[1:], n) - 1
    keep = seg == np.repeat(seg[key_end], counts)  # last segment only

    ev2 = ev[keep].reset_index(drop=True)
    m = len(ev2)
    conv2 = conv_key[keep]
    turn2 = turn_a[keep]
    newkey2 = np.ones(m, dtype=bool)
    newkey2[1:] = (conv2[1:] != conv2[:-1]) | (turn2[1:] != turn2[:-1])
    key_id2 = np.cumsum(newkey2) - 1
    key_end2 = np.append(np.flatnonzero(newkey2)[1:], m) - 1

    # last positional row per key: watermark + aliveness
    last = ev2.iloc[key_end2].reset_index(drop=True)
    # last NON-NULL per payload column within the surviving segment
    pay = ev2.groupby(key_id2, sort=False)[payload].last().reset_index(drop=True)

    out = last[S.KEY_COLS + ["cursor", "seq"]].copy()
    for c in payload:
        out[c] = pay[c]
    out[DELETED_COL] = last["op"].to_numpy() == "delete"
    cols = S.KEY_COLS + payload + ["cursor", "seq", DELETED_COL]
    if with_boundary:
        # whether the surviving segment starts at an insert/delete boundary
        # (vs a patch-only run) — drives the delta op in the salted pre-fold
        out["_boundary"] = np.repeat(seg[key_end] >= 1, 1)
        cols = cols + ["_boundary"]
    out = out[cols]
    return out.reset_index(drop=True)


def _empty_fragment(payload: list[str]) -> pd.DataFrame:
    return pd.DataFrame(
        columns=S.KEY_COLS + payload + ["cursor", "seq", DELETED_COL]
    )


def rows_to_events(frag_df: pd.DataFrame) -> pd.DataFrame:
    """Fragment-shaped rows (full state + watermark + tombstone flag) →
    pseudo-events for a fold: live rows are ``insert``s, tombstones are
    ``delete``s, each at its stored watermark."""
    ev = frag_df.copy()
    ev["op"] = np.where(ev[DELETED_COL].to_numpy(dtype=bool), "delete", "insert")
    return ev.drop(columns=[DELETED_COL])


def fold_fragments(frames: list, payload: list[str]) -> pd.DataFrame | None:
    """Arg-max-by-(cursor, seq) fold of a partition's base + delta
    fragments (the log-structured read path). All rows are full-state
    upserts or tombstones, so the fold is pure LWW — no patch semantics."""
    frames = [f for f in frames if f is not None and len(f)]
    if not frames:
        return None
    ev = pd.concat([rows_to_events(f) for f in frames], ignore_index=True)
    return merge_partition(None, ev, payload)
