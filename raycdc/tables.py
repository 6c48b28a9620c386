"""Multi-table lake: per-table (key columns, derivation, merge policy).

The reference maintains dozens of logical tables from one item stream, each
with its own primary key and upsert policy — the domain→model map built in
``common/converter/pg_converter.py:5-25`` and the per-table
``conflict_do_update``/``update_strategy`` application in
``indexer/exporters/postgres_item_exporter.py:37-58`` (/root/reference).

Here a :class:`TableSpec` names a logical table, its key columns, and an
optional vectorized ``derive`` transform that maps the PRIMARY change batch
(already normalized to the round's change schema) to this table's change
events. Derived events flow through the SAME partition→merger→fragment→
manifest machinery, so commit atomicity, rollback, undo-window and resume
cover every table at once (one round commits all tables or none).

Partition namespacing: table ``i`` owns global partitions
``[i*P, (i+1)*P)`` — one manifest, one undo buffer, zero schema changes to
the commit path.

Co-partitioning contract: a derived table's key must hash-partition by its
FIRST key column using the same ``assign_part`` as the primary, so a
derived row lands on the same merger pool (not necessarily the same actor).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
import pyarrow as pa

from raycdc import schema as S


@dataclass(frozen=True)
class TableSpec:
    """One logical lake table.

    ``derive`` is None for the primary table (identity). For derived
    tables it maps a normalized primary change batch (Arrow) to this
    table's change batch: columns = key_cols + payload + op/cursor/seq.
    It must be schema-stable (same output schema for any input batch,
    including empty) and row-wise independent (it runs per batch inside
    ``map_batches``)."""

    name: str
    key_cols: tuple
    derive: Callable | None = None
    # partition-assignment columns: defaults to (key_cols[0],). Set a longer
    # key PREFIX when the first key column is low-cardinality (index
    # attributes) — same merger co-location guarantee, no write skew.
    part_cols: tuple | None = None


PRIMARY = TableSpec(name="turns", key_cols=tuple(S.KEY_COLS), derive=None)


def _derive_conv_latest(batch: pa.Table) -> pa.Table:
    """Current-state exemplar (the reference's ``current_token_balances``
    analog, ``common/models/current_token_balances.py:28-36``): per
    conversation, the latest non-null value of every column across all its
    turn events, at the conversation's high-water (cursor, seq).

    Every event maps to an ``update`` keyed by conv_id alone — the merge
    kernel's last-non-null patch fold then maintains the current row
    incrementally. Deletes contribute only their watermark (null payload).
    """
    n = batch.num_rows
    cols: dict = {
        "op": pa.array(np.repeat("update", n), pa.string()),
        "conv_id": batch.column("conv_id"),
    }
    for f in batch.schema:
        if f.name in ("op", "conv_id", "part", "epoch", "rollback_to_cursor"):
            continue
        cols[f.name] = batch.column(f.name)
    return pa.table(cols)


def conv_latest() -> TableSpec:
    return TableSpec(
        name="conv_latest", key_cols=("conv_id",), derive=_derive_conv_latest
    )


def _derive_tool_index(batch: pa.Table) -> pa.Table:
    """Inverted-index exemplar (the reference's address-index tables,
    ``indexer/modules/custom/address_index/`` — per-entity index rows
    written in the same transaction as the primary): every canonical event
    carrying a non-empty ``tool`` maps to an index upsert keyed by
    ``(tool, conv_id, turn_idx)``, payload empty — the index stores keys +
    watermarks only.

    Index semantics are NON-COVERING and insert-only, like the reference's
    (whose indexed attributes are immutable chain facts): ``tool`` is an
    insert-time attribute of a turn, so entries never go stale; primary
    deletes don't retract index rows (consumers verify liveness against
    the primary — the standard secondary-index contract); reorg rollbacks
    DO remove index rows because the global undo buffer restores index
    partitions with everything else."""
    import pyarrow.compute as pc

    t = batch.column("tool")
    mask = pc.fill_null(
        pc.and_kleene(pc.is_valid(t), pc.not_equal(t, pa.scalar(""))), False
    )
    sub = batch.filter(mask)
    return pa.table(
        {
            "op": pa.array(np.repeat("insert", sub.num_rows), pa.string()),
            "tool": sub.column("tool"),
            "conv_id": sub.column("conv_id"),
            "turn_idx": sub.column("turn_idx"),
            "cursor": sub.column("cursor"),
            "seq": sub.column("seq"),
        }
    )


def tool_index() -> TableSpec:
    # partitioned by (tool, conv_id), not tool alone: tool has a handful of
    # distinct values, so hashing it alone would funnel every index write
    # into a few mergers at corpus scale; the longer prefix spreads writes
    # across the pool while still co-locating all rows of any full key.
    # Lookups by tool become a pruned scan of the (skinny) index table —
    # fragments are sorted by key, so tool==X prunes at row-group stats.
    return TableSpec(
        name="tool_index",
        key_cols=("tool", "conv_id", "turn_idx"),
        derive=_derive_tool_index,
        part_cols=("tool", "conv_id"),
    )


def _derive_text_fp(batch: pa.Table) -> pa.Table:
    """Content-fingerprint index exemplar: per live turn, the 64-bit
    SimHash of its CURRENT text — the near-duplicate signature index a
    100 TB dedup pipeline keeps FRESH incrementally instead of re-signing
    the corpus per run (the batch analog is ``queries/neardup.py``'s
    sign-once stage; the reference analog is the per-entity feature rows
    its custom modules commit alongside the primary,
    ``indexer/modules/custom/*``).

    Unlike the insert-only ``tool_index``, this index tracks a MUTABLE
    attribute, exercising the other two index-maintenance paths: a
    text-carrying event maps to an ``update`` whose recomputed fingerprint
    overwrites the stale one by watermark LWW; a ``delete`` passes through
    and tombstones the index row in the same commit; a patch that does NOT
    touch text contributes nothing (the standing fingerprint is still
    current). Novel payload columns (``simhash``) ride the raw-task ingest
    path, which keys each derived table on its own induced schema."""
    import pyarrow.compute as pc

    from raycdc import phash as H

    op = batch.column("op")
    conv_ok = pc.is_valid(batch.column("conv_id"))
    is_del = pc.and_kleene(pc.equal(op, "delete"), conv_ok)
    has_text = pc.and_kleene(pc.is_valid(batch.column("text")), conv_ok)
    sub = batch.filter(pc.fill_null(pc.or_kleene(is_del, has_text), False))

    del_mask = pc.equal(sub.column("op"), "delete").to_numpy(
        zero_copy_only=False
    )
    texts = sub.column("text").to_numpy(zero_copy_only=False)
    texts = np.where(del_mask, "", texts)  # deletes carry no payload
    sims = pa.array(H.simhash64(texts), pa.int64())
    return pa.table(
        {
            # text-carrying inserts/updates both fold as LWW patches
            "op": pc.if_else(
                pa.array(del_mask), pa.scalar("delete"), pa.scalar("update")
            ),
            "conv_id": sub.column("conv_id"),
            "turn_idx": sub.column("turn_idx"),
            "simhash": pc.if_else(pa.array(del_mask), pa.scalar(None, pa.int64()), sims),
            "cursor": sub.column("cursor"),
            "seq": sub.column("seq"),
        }
    )


def text_fp() -> TableSpec:
    return TableSpec(
        name="text_fp", key_cols=("conv_id", "turn_idx"), derive=_derive_text_fp
    )
