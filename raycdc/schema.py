"""Arrow schemas for the transcript lake and its change-event log.

Mirrors the reference's dual declaration of record shape (dataclass domain +
SQLAlchemy model, ``indexer/domain/__init__.py:38-71`` /
``common/models/__init__.py:27-38`` in /root/reference) collapsed into a
single Arrow schema per logical table. Schema evolution (column add /
int-widen) is Arrow-native via :func:`unify_schemas` + :func:`conform`,
replacing the reference's Alembic migrations
(``migrations/versions/20240708_tokens_table_add_column_block_number.py:23``).
"""

from __future__ import annotations

import pyarrow as pa

# The lake's target table (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Key + system columns. ``cursor`` is the block-number analog
# (monotone checkpointable position, reference
# ``indexer/utils/sync_recorder.py:19-100``); ``seq`` is the deterministic
# within-cursor tie-break (statement order in the reference's
# ``ON CONFLICT`` upsert, ``indexer/exporters/postgres_item_exporter.py:110-133``).
KEY_COLS = ["conv_id", "turn_idx"]
PAYLOAD_COLS = ["role", "text", "tool", "ts"]

# Change-event log schema (FIXTURES.md §2). One parquet file per epoch.
CHANGE_SCHEMA = pa.schema(
    [
        ("cursor", pa.int64()),
        ("seq", pa.int32()),
        ("epoch", pa.int64()),
        ("op", pa.string()),  # insert | update | delete | rollback
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("rollback_to_cursor", pa.int64()),
    ]
)

OPS = ("insert", "update", "delete", "rollback")


def lake_schema_for(
    change_schema: pa.Schema, key_cols: list[str] | None = None
) -> pa.Schema:
    """Lake row schema induced by a change schema: key + payload columns plus
    the stored ``(cursor, seq)`` watermark used by the guarded-LWW merge
    (analog of the reference's ``block_number`` guard column,
    ``common/models/current_token_balances.py:28-36``)."""
    keys = list(key_cols if key_cols is not None else KEY_COLS)
    fields = []
    for name in keys:
        fields.append(change_schema.field(name))
    for f in change_schema:
        if f.name in ("cursor", "seq", "epoch", "op", "rollback_to_cursor"):
            continue
        if f.name in keys:
            continue
        fields.append(f)
    fields.append(pa.field("cursor", pa.int64()))
    fields.append(pa.field("seq", pa.int32()))
    return pa.schema(fields)


BASE_LAKE_SCHEMA = lake_schema_for(CHANGE_SCHEMA)


def unify(a: pa.Schema, b: pa.Schema) -> pa.Schema:
    """Unify two schemas: union of columns; int widths widen (int32→int64).

    Column order: all of ``a``'s columns first (evolved in place), then any
    new columns from ``b`` appended — matching the reference's
    ``ADD COLUMN`` migrations which append.
    """
    fields = []
    for f in a:
        if f.name in b.names:
            g = b.field(f.name)
            fields.append(pa.field(f.name, _widen(f.type, g.type)))
        else:
            fields.append(f)
    for g in b:
        if g.name not in a.names:
            fields.append(g)
    return pa.schema(fields)


def _widen(t: pa.DataType, u: pa.DataType) -> pa.DataType:
    if t.equals(u):
        return t
    order = [pa.int8(), pa.int16(), pa.int32(), pa.int64()]
    if t in order and u in order:
        return order[max(order.index(t), order.index(u))]
    if pa.types.is_floating(t) or pa.types.is_floating(u):
        if (pa.types.is_floating(t) or t in order) and (pa.types.is_floating(u) or u in order):
            return pa.float64()
    raise TypeError(f"incompatible schema evolution: {t} vs {u}")


def conform(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast ``table`` to ``schema``: missing columns null-filled, int widths
    widened, column order normalized. The Arrow-native analog of the
    reference's converter layer (``common/models/__init__.py:45-78``)."""
    n = table.num_rows
    cols = []
    for f in schema:
        if f.name in table.column_names:
            col = table.column(f.name)
            if not col.type.equals(f.type):
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(cols, schema=schema)
