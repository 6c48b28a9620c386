"""Scalar/vectorized utility functions — parity for the reference's
``common/utils/format_utils.py:10-91`` (hex↔bytes↔int, snake-case) and
``common/models/__init__.py:57-58`` (epoch seconds → timestamp), expressed
as batch-level vectorized kernels (never per-row Python in a hot stage).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def int_to_hex(values: np.ndarray, prefix: bool = True) -> np.ndarray:
    """Vectorized int64 -> lowercase hex string (``0x…`` like the
    reference's hex fields)."""
    out = np.empty(len(values), dtype=object)
    p = "0x" if prefix else ""
    for i, v in enumerate(np.asarray(values)):
        out[i] = f"{p}{int(v):x}"
    return out


def hex_to_int(values) -> np.ndarray:
    """hex string (with/without 0x) -> int64 (``hex_str_to_int`` analog,
    format_utils.py:17-24)."""
    return np.array([int(str(v), 16) if v not in (None, "") else 0 for v in values],
                    dtype=np.int64)


def hex_to_bytes(values) -> list:
    """hex string -> bytes (``hex_str_to_bytes`` analog)."""
    out = []
    for v in values:
        if v in (None, ""):
            out.append(b"")
            continue
        s = str(v)[2:] if str(v).startswith("0x") else str(v)
        out.append(bytes.fromhex(s if len(s) % 2 == 0 else "0" + s))
    return out


def bytes_to_hex(values, prefix: bool = True) -> list:
    p = "0x" if prefix else ""
    return [p + bytes(v).hex() if v is not None else None for v in values]


def int_to_bytes32(values) -> list:
    """int -> 32-byte big-endian (the converter's uint256 packing,
    common/models/__init__.py:62-65)."""
    return [int(v).to_bytes(32, "big") for v in values]


_SNAKE_RE1 = re.compile(r"(.)([A-Z][a-z]+)")
_SNAKE_RE2 = re.compile(r"([a-z0-9])([A-Z])")


def to_snake_case(name: str) -> str:
    """CamelCase -> snake_case (format_utils.py:81-91)."""
    return _SNAKE_RE2.sub(r"\1_\2", _SNAKE_RE1.sub(r"\1_\2", name)).lower()


def epoch_seconds_to_timestamp(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """epoch seconds (int) -> timestamp[us] (converter ``to_datetime``
    analog), as a pyarrow compute cast."""
    us = pc.multiply(pc.cast(col, pa.int64()), pa.scalar(1_000_000, pa.int64()))
    return pc.cast(us, pa.timestamp("us"))


def json_safe(obj):
    """Row/record -> JSON-serializable (``row_to_dict`` analog,
    format_utils.py:94-210): numpy scalars to python, timestamps to ISO,
    bytes to 0x-hex, nested dict/list recursed."""
    import datetime

    if isinstance(obj, dict):
        return {k: json_safe(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [json_safe(v) for v in obj]
    if isinstance(obj, (bytes, bytearray)):
        return "0x" + bytes(obj).hex()
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (pd.Timestamp, datetime.datetime)):
        return obj.isoformat()
    if obj is pd.NaT:
        return None
    return obj
