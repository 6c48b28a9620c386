"""Vectorized guarded-LWW sorted-merge kernel (pure Arrow/numpy, no Ray).

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

Implementation note (round 2): the kernel is Arrow-native end to end — sort
keys and segment arithmetic are numpy over zero-copy Arrow buffers, and each
output column is produced by exactly ONE ``Array.take`` on the concatenated
input (null take-indices yield nulls, which encodes "no non-null value in
the surviving segment"). No pandas object materialization anywhere in the
hot path; the pandas entry points below are thin wrappers for tests and the
non-headline map_groups paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from raycdc import partition as P
from raycdc import schema as S

SYS_EVENT_COLS = {"op", "cursor", "seq", "epoch", "rollback_to_cursor"}
DELETED_COL = "_deleted"

_OP_SET = pa.array(["insert", "update", "delete"])  # codes 0 / 1 / 2
_OP_UPDATE = 1
_OP_DELETE = 2


def payload_columns(
    change_schema_names: list[str], key_cols: list[str] | None = None
) -> list[str]:
    keys = set(key_cols if key_cols is not None else S.KEY_COLS)
    return [
        c
        for c in change_schema_names
        if c not in SYS_EVENT_COLS and c not in keys
    ]


def fragment_schema_for(
    change_schema: pa.Schema, key_cols: list[str] | None = None
) -> pa.Schema:
    lake = S.lake_schema_for(change_schema, key_cols=key_cols)
    return lake.append(pa.field(DELETED_COL, pa.bool_()))


def _np(col) -> np.ndarray:
    """Zero-copy-where-possible numpy view of an Arrow (Chunked)Array."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def _sort_codes(col) -> np.ndarray:
    """int64 codes order-isomorphic to the column values (for lexsort).
    Integers pass through; strings are dictionary-encoded (O(n) hashing)
    and only the U unique values are compared lexically."""
    if isinstance(col, pa.ChunkedArray):
        col = (
            col.chunk(0)
            if col.num_chunks == 1
            else pa.concat_arrays([c.cast(col.type) for c in col.chunks])
        )
    t = col.type
    if pa.types.is_integer(t):
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False
        )
    d = col.dictionary_encode()
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    # rank the U unique values with the Arrow sort kernel — no Python-object
    # materialization (UTF-8 byte order == code-point order, so the ranks
    # match a lexical sort)
    order = pc.sort_indices(d.dictionary).to_numpy(zero_copy_only=False)
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order))
    return rank[idx]


def _empty_fragment_table(
    like: pa.Schema, payload: list[str], key_cols: list[str]
) -> pa.Table:
    fields = [like.field(c) for c in key_cols + payload]
    fields.append(pa.field("cursor", like.field("cursor").type))
    fields.append(pa.field("seq", like.field("seq").type))
    fields.append(pa.field(DELETED_COL, pa.bool_()))
    return pa.schema(fields).empty_table()


def merge_partition_table(
    fragment: pa.Table | list | None,
    events: pa.Table,
    payload: list[str],
    key_cols: list[str] | None = None,
    with_boundary: bool = False,
) -> pa.Table:
    """Merge one partition's change events into its existing fragment —
    Arrow in, Arrow out.

    ``fragment``: current fragment rows (key + payload + cursor/seq +
    ``_deleted``), or a LIST of fragment runs (oldest → newest, the
    base+delta LSM layout), or None. Passing the runs directly fuses the
    LWW fragment fold and the event merge into ONE sort + segment pass:
    every run row is a full-state ``insert``/``delete`` pseudo-event, so
    the segment fold's "only the last segment survives" already computes
    fold-then-patch — ``merge(fold(runs), ev)`` row-for-row.
    ``events``: this round's change rows for the partition (op + key +
    payload + cursor/seq; rollbacks are handled a level above, in lake.py,
    never here). Extra columns (part/salt/epoch) are ignored. Returns the
    new fragment, sorted by the key columns — the stable-turn-ordering
    invariant.
    """
    key_cols = list(key_cols if key_cols is not None else S.KEY_COLS)
    cols = key_cols + payload + ["cursor", "seq", "op"]
    ev_t = events.select(cols)
    n_ev = ev_t.num_rows

    frames = fragment if isinstance(fragment, list) else [fragment]
    frames = [f for f in frames if f is not None and f.num_rows]
    if frames:
        frag_evs = []
        for f in frames:
            frag_op = pc.if_else(
                f.column(DELETED_COL), pa.scalar("delete"), pa.scalar("insert")
            )
            frag_evs.append(
                f.select(key_cols + payload + ["cursor", "seq"])
                .append_column("op", frag_op)
                .select(cols)
            )
        n_frag = sum(f.num_rows for f in frag_evs)
        tbl = pa.concat_tables(frag_evs + [ev_t], promote_options="permissive")
        src = np.concatenate(
            [np.zeros(n_frag, np.int8), np.ones(n_ev, np.int8)]
        )
    else:
        tbl = ev_t
        src = np.ones(n_ev, np.int8)

    n = tbl.num_rows
    if n == 0:
        return _empty_fragment_table(ev_t.schema, payload, key_cols)

    key_codes = [_sort_codes(tbl.column(k)) for k in key_cols]
    cursor_a = _np(tbl.column("cursor")).astype(np.int64, copy=False)
    seq_a = _np(tbl.column("seq")).astype(np.int64, copy=False)
    # lexsort: last key is most significant → (key..., cursor, seq, src)
    order = np.lexsort((src, seq_a, cursor_a, *reversed(key_codes)))

    keys_s = [k[order] for k in key_codes]
    cur_s, seq_s = cursor_a[order], seq_a[order]

    # drop exact (key, cursor, seq) re-deliveries (keep first = lake/src-0)
    same = np.zeros(n, dtype=bool)
    same[1:] = (cur_s[1:] == cur_s[:-1]) & (seq_s[1:] == seq_s[:-1])
    for k in keys_s:
        same[1:] &= k[1:] == k[:-1]
    dedup = ~same
    sel = order[dedup]  # row ids into tbl, key-sorted, deduped
    keys_d = [k[dedup] for k in keys_s]
    m1 = len(sel)

    newkey = np.ones(m1, dtype=bool)
    newkey[1:] = False
    for k in keys_d:
        newkey[1:] |= k[1:] != k[:-1]

    op_codes = pc.index_in(tbl.column("op"), value_set=_OP_SET)
    if pc.any(pc.is_null(op_codes)).as_py():
        # fail fast: an op outside {insert,update,delete} (e.g. a rollback
        # marker leaking past upstream filtering, or a null) would otherwise
        # astype to INT64_MIN and silently fold as a live insert
        bad = pc.unique(
            pc.filter(tbl.column("op"), pc.is_null(op_codes))
        ).to_pylist()
        raise ValueError(f"merge kernel got non-merge op(s): {bad!r}")
    op_full = _np(op_codes).astype(np.int64, copy=False)
    op_d = op_full[sel]

    # segment fold: insert/delete start a new segment; only each key's last
    # segment survives
    boundary = op_d != _OP_UPDATE
    bcum = np.cumsum(boundary)
    key_start = np.flatnonzero(newkey)
    counts = np.diff(np.append(key_start, m1))
    start_base = np.where(key_start > 0, bcum[np.maximum(key_start - 1, 0)], 0)
    seg = bcum - np.repeat(start_base, counts)  # per-key boundary count incl. self
    key_end = np.append(key_start[1:], m1) - 1
    keep = seg == np.repeat(seg[key_end], counts)  # last segment only

    sel2 = sel[keep]
    m = len(sel2)
    keys2 = [k[keep] for k in keys_d]
    newkey2 = np.ones(m, dtype=bool)
    newkey2[1:] = False
    for k in keys2:
        newkey2[1:] |= k[1:] != k[:-1]
    key_start2 = np.flatnonzero(newkey2)
    key_end2 = np.append(key_start2[1:], m) - 1
    last_idx = sel2[key_end2]  # last positional event per key (watermark row)
    last_take = pa.array(last_idx, pa.int64())

    out_cols: dict = {}
    for k in key_cols:
        out_cols[k] = tbl.column(k).take(last_take)
    # last NON-NULL per payload column within the surviving segment: one
    # reduceat over valid positions, one take with null indices
    arange_m = np.arange(m, dtype=np.int64)
    for c in payload:
        col = tbl.column(c)
        if col.null_count == 0:
            # no nulls anywhere → the last event's value IS the final value
            out_cols[c] = col.take(last_take)
            continue
        isnull = _np(pc.is_null(col))
        valid = ~isnull[sel2]
        pos = np.where(valid, arange_m, -1)
        last_valid = np.maximum.reduceat(pos, key_start2)
        final = np.where(last_valid >= 0, sel2[np.maximum(last_valid, 0)], -1)
        idx = pa.array(final, pa.int64(), mask=(final < 0))
        out_cols[c] = col.take(idx)
    out_cols["cursor"] = tbl.column("cursor").take(last_take)
    out_cols["seq"] = tbl.column("seq").take(last_take)
    out_cols[DELETED_COL] = pa.array(op_d[keep][key_end2] == _OP_DELETE)
    if with_boundary:
        # whether the surviving segment starts at an insert/delete boundary
        # (vs a patch-only run) — drives the delta op in the salted pre-fold
        out_cols["_boundary"] = pa.array(seg[key_end] >= 1)
    return pa.table(out_cols)


def fold_fragments_table(
    frames: list, payload: list[str], key_cols: list[str] | None = None
) -> pa.Table | None:
    """Arg-max-by-(cursor, seq) fold of a partition's base + delta
    fragments (the log-structured read path). All rows are full-state
    upserts or tombstones, so the fold is pure LWW — no patch semantics."""
    frames = [f for f in frames if f is not None and f.num_rows]
    if not frames:
        return None
    evs = []
    for f in frames:
        op = pc.if_else(
            f.column(DELETED_COL), pa.scalar("delete"), pa.scalar("insert")
        )
        evs.append(f.drop_columns([DELETED_COL]).append_column("op", op))
    ev = pa.concat_tables(evs, promote_options="permissive")
    return merge_partition_table(None, ev, payload, key_cols=key_cols)


def key_hash(tbl: pa.Table, key_cols: list[str]) -> np.ndarray:
    """uint64 hash of the key columns per row — the membership code for
    incremental (touched-keys-only) merging. Equal keys always hash equal;
    a cross-key collision only pulls an extra row into the touched subset
    (it folds to itself and, with an unchanged watermark, is filtered out
    of the delta write) — never a correctness issue."""
    h = np.zeros(tbl.num_rows, dtype=np.uint64)
    prime = np.uint64(1099511628211)
    for k in key_cols:
        col = tbl.column(k)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            v = (
                col.cast(pa.int64())
                .to_numpy(zero_copy_only=False)
                .astype(np.int64, copy=False)
                .view(np.uint64)
            )
        else:
            # fast Arrow-buffer suffix hash (raycdc.partition v2): a
            # cross-key collision is benign here (see above), so the
            # 16-byte-suffix weakening costs nothing
            v = P.hash_conv(col, 2)
        h = h * prime ^ v
    return h


# -- pandas entry points (tests / map_groups paths) -------------------------


def _empty_fragment(payload: list[str], key_cols: list[str] | None = None) -> pd.DataFrame:
    key_cols = list(key_cols if key_cols is not None else S.KEY_COLS)
    return pd.DataFrame(columns=key_cols + payload + ["cursor", "seq", DELETED_COL])


def merge_partition(
    fragment: pd.DataFrame | None,
    events: pd.DataFrame,
    payload: list[str],
    with_boundary: bool = False,
    key_cols: list[str] | None = None,
) -> pd.DataFrame:
    """pandas wrapper around :func:`merge_partition_table`."""
    frag_t = (
        pa.Table.from_pandas(fragment, preserve_index=False)
        if fragment is not None and len(fragment)
        else None
    )
    if len(events) == 0 and frag_t is None:
        return _empty_fragment(payload, key_cols)
    ev_t = pa.Table.from_pandas(events, preserve_index=False)
    out = merge_partition_table(
        frag_t, ev_t, payload, key_cols=key_cols, with_boundary=with_boundary
    )
    return out.to_pandas()


