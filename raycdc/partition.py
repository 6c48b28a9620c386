"""Hash / salted partition assignment (vectorized, deterministic).

The shuffle key discipline of SURVEY.md §7.4: ONE partitioning key —
``hash(conv_id) % P`` — reused for every merge round so a conversation's
state lives in exactly one fragment (per-conv turn ordering then holds
per fragment for free). The salted variant spreads the *fold* work of hot
conversations over ``P × salt_factor`` sub-partitions by including
``turn_idx`` in the hash — every key still lands wholly in one sub-partition,
so the per-key fold stays complete (no cross-partition combiner needed).

Two hash versions, pinned PER LAKE in the manifest (``hash_version``) —
the assignment must be identical across every round of a lake's life, so
the function is a lake-format property, not an engine default:

  * v1 — ``pandas.util.hash_array`` over an object array. Stable, but the
    Arrow→object conversion plus per-string hashing was measured as the
    single largest CPU cost of the push path (~70 ms per 100k-row shard).
  * v2 (new lakes) — fixed-width suffix hash straight off the Arrow string
    buffers: the LAST ≤16 bytes of each value (independent per-position
    odd multipliers, wraparound uint64) mixed with the length, finished
    with a splitmix64-style avalanche. No object conversion, no per-string
    Python: 16 vectorized gathers over the whole column (measured ~3×
    faster than v1: 36 ms vs 113 ms per 200 k rows). Collisions (same
    16-byte suffix AND length) only cost partition balance, never
    correctness — the assignment is used solely to route whole keys to
    partitions.

Both are process/node/run-stable (no seeded ``hash()``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

HASH_VERSION_DEFAULT = 2
_SUFFIX = 16

def _mix(h: np.ndarray) -> np.ndarray:
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


# position-dependent odd multipliers: INDEPENDENT 64-bit constants (each a
# splitmix64 finalizer of its position, forced odd). They must not share a
# common factor — multiples of one constant would make the weighted byte
# sum collapse to (constant × small-integer), a few hundred distinct values
# over a sequential-ID corpus.
_MULT = _mix(
    (np.arange(1, _SUFFIX + 1, dtype=np.uint64))
    * np.uint64(0x9E3779B97F4A7C15)
) | np.uint64(1)
_LEN_MULT = np.uint64(0xC2B2AE3D27D4EB4F)


def _hash_v2_string(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):  # zero chunks
            col = pa.array([], pa.string())
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    buffers = col.buffers()
    offs = np.frombuffer(buffers[1], dtype=off_dtype)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] else np.zeros(
        0, np.uint8
    )
    starts, ends = offs[:-1], offs[1:]
    lens = ends - starts
    out = _LEN_MULT * lens.astype(np.uint64)
    if len(data) == 0:
        # all-empty/null column: the general path below would add the pad
        # contribution (byte 0 + 1) * _MULT[j] for EVERY suffix position —
        # a constant sum(_MULT) per element. Add it here too, or the hash
        # of '' depends on batch composition (and disagrees with the SQL
        # mirror, which always computes the mixed-batch value).
        return _mix(out + _MULT.sum(dtype=np.uint64))
    # pad with one zero byte: positions past a value's start gather the pad
    # and contribute a constant — a pure function of the value's LENGTH,
    # which the length term already encodes, so the hash stays a pure
    # function of the string.
    padded = np.concatenate([data, np.zeros(1, np.uint8)])
    pad_pos = np.int64(len(data))
    for j in range(_SUFFIX):
        idx = ends - 1 - j
        byte = padded[np.where(idx >= starts, idx, pad_pos)].astype(np.uint64)
        out += (byte + np.uint64(1)) * _MULT[j]
    return _mix(out)


def _hash_v2(vals) -> np.ndarray:
    """v2 over an Arrow column (string or integer) or a numpy array."""
    if isinstance(vals, (pa.Array, pa.ChunkedArray)):
        t = vals.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return _hash_v2_string(vals)
        if pa.types.is_integer(t):
            a = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
            if a.null_count:
                # null → float NaN → astype(uint64) is UNDEFINED and
                # platform-dependent; routing must be deterministic, so a
                # null key that reached the hash is a hard error (record
                # mode filters them out before assignment)
                raise ValueError("null integer key column in partition hash")
            return _mix(
                a.cast(pa.int64())
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
        vals = vals.to_numpy(zero_copy_only=False)
    v = np.asarray(vals)
    if v.dtype.kind in "iu":
        return _mix(v.astype(np.uint64))
    return _hash_v2_string(pa.array(v, pa.string()))


def hash_conv(conv_id, version: int = HASH_VERSION_DEFAULT) -> np.ndarray:
    if version == 1:
        if isinstance(conv_id, (pa.Array, pa.ChunkedArray)):
            conv_id = conv_id.to_numpy(zero_copy_only=False)
        return pd.util.hash_array(np.asarray(conv_id, dtype=object))
    return _hash_v2(conv_id)


def assign_part(
    conv_id, num_partitions: int, version: int = HASH_VERSION_DEFAULT
) -> np.ndarray:
    """Home partition: hash(conv_id) % P. Accepts an Arrow column
    (zero-conversion fast path) or a numpy array."""
    return (hash_conv(conv_id, version) % np.uint64(num_partitions)).astype(
        np.int32
    )


def assign_salted(
    conv_id,
    turn_idx,
    num_partitions: int,
    salt_factor: int,
    version: int = HASH_VERSION_DEFAULT,
) -> np.ndarray:
    """Salted sub-partition for the pre-fold stage: includes turn_idx so a
    key's events are never split across sub-partitions. (The pre-fold's
    stale-event watermark guard in ``engine._PreFold`` makes this path
    correct for arbitrary streams — no stream contract required.)"""
    if isinstance(turn_idx, (pa.Array, pa.ChunkedArray)):
        if turn_idx.null_count:
            raise ValueError("null turn_idx in salted partition assignment")
        turn_idx = turn_idx.to_numpy(zero_copy_only=False)
    ti = np.asarray(turn_idx)
    if ti.dtype.kind == "f" and np.isnan(ti).any():
        raise ValueError("null turn_idx in salted partition assignment")
    h = hash_conv(conv_id, version) * np.uint64(31) + ti.astype(np.uint64)
    return (h % np.uint64(num_partitions * salt_factor)).astype(np.int32)


def assign_part_cols(
    cols: list, num_partitions: int, version: int = HASH_VERSION_DEFAULT
) -> np.ndarray:
    """Partition id from one OR several key columns (mixed per-column
    hashes). Derived tables whose FIRST key column is low-cardinality (an
    index attribute like ``tool``: a handful of distinct values) would
    concentrate every write on a handful of mergers if partitioned by it
    alone; spreading by a longer key PREFIX removes the write skew while
    keeping all rows of any full key co-located (every row of a key shares
    every prefix column's value). Reads by the first column alone then
    become a pruned scan over the table's partitions instead of one
    partition — see ``Engine.read_key``."""
    if len(cols) == 1:
        return assign_part(cols[0], num_partitions, version)
    h = None
    for c in cols:
        hc = hash_conv(c, version)
        h = hc if h is None else h * np.uint64(1000003) + hc
    return (h % np.uint64(num_partitions)).astype(np.int32)


# -- SQL mirror of hash v2 (oracle support) ---------------------------------

_W64 = 1 << 64
_W32 = 1 << 32


def _sql_mulmod(a_expr: str, b: int) -> str:
    """``(a·b) mod 2^64`` in DuckDB with INT128 intermediates: split ``a``
    into 32-bit halves so every product stays under 2^97."""
    return (
        f"(((({a_expr}) % {_W32}) * CAST({b} AS HUGEINT) + "
        f"((((({a_expr}) // {_W32}) * CAST({b} AS HUGEINT)) % {_W32})"
        f" * {_W32})) % {_W64})"
    )


def _sql_xorshift(h: str, s: int) -> str:
    return f"CAST(xor(CAST({h} AS UBIGINT), CAST({h} AS UBIGINT) >> {s}) AS HUGEINT)"


def sql_hash_v2_query(inner_sql: str, col: str, out: str = "_h") -> str:
    """Wrap ``inner_sql`` in a CTE chain that appends column ``out`` = the
    v2 hash of string column ``col`` — bit-identical to :func:`hash_conv`
    (version 2) for ASCII values (``substr``/``ord`` are character-based;
    the engine's keys are ASCII by construction). Each avalanche stage is
    its own SELECT so the byte-sum expression is evaluated once, not
    duplicated exponentially through the xor stages."""
    terms = " + ".join(
        f"(CASE WHEN length({col}) > {j} THEN"
        f" ord(substr({col}, length({col}) - {j}, 1)) ELSE 0 END + 1)"
        f" * CAST({int(_MULT[j])} AS HUGEINT)"
        for j in range(_SUFFIX)
    )
    len_term = _sql_mulmod(f"CAST(length({col}) AS HUGEINT)", int(_LEN_MULT))
    return f"""
SELECT * REPLACE (CAST(xor(CAST({out} AS UBIGINT),
                           CAST({out} AS UBIGINT) >> 33) AS HUGEINT) AS {out})
FROM (
  SELECT * REPLACE ({_sql_mulmod(out, 0xC4CEB9FE1A85EC53)} AS {out})
  FROM (
    SELECT * REPLACE ({_sql_xorshift(out, 33)} AS {out})
    FROM (
      SELECT * REPLACE ({_sql_mulmod(out, 0xFF51AFD7ED558CCD)} AS {out})
      FROM (
        SELECT * REPLACE ({_sql_xorshift(out, 33)} AS {out})
        FROM (
          SELECT *, ({len_term} + {terms}) % {_W64} AS {out}
          FROM ({inner_sql})
        )
      )
    )
  )
)
"""
