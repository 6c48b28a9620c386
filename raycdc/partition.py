"""Hash / salted partition assignment (vectorized, deterministic).

The shuffle key discipline of SURVEY.md §7.4: ONE partitioning key —
``hash(conv_id) % P`` — reused for every merge round so a conversation's
state lives in exactly one fragment (per-conv turn ordering then holds
per fragment for free). The salted variant spreads the *fold* work of hot
conversations over ``P × salt_factor`` sub-partitions by including
``turn_idx`` in the hash — every key still lands wholly in one sub-partition,
so the per-key fold stays complete (no cross-partition combiner needed).

Uses ``pandas.util.hash_array`` (64-bit, process-independent — unlike
Python's seeded ``hash``) so partition assignment is stable across workers,
nodes and runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def hash_conv(conv_id: np.ndarray) -> np.ndarray:
    return pd.util.hash_array(np.asarray(conv_id, dtype=object))


def assign_part(conv_id: np.ndarray, num_partitions: int) -> np.ndarray:
    """Home partition: hash(conv_id) % P."""
    return (hash_conv(conv_id) % np.uint64(num_partitions)).astype(np.int32)


def assign_salted(
    conv_id: np.ndarray, turn_idx: np.ndarray, num_partitions: int, salt_factor: int
) -> np.ndarray:
    """Salted sub-partition for the pre-fold stage: includes turn_idx so a
    key's events are never split across sub-partitions.

    PARTITIONING ASSUMPTION (stream contract, gen.py): at-least-once
    duplicates are re-emitted within the same commit round as the original.
    The pre-fold collapses a key's events without seeing the lake watermark,
    which is only equivalent to the guarded stream-order fold when no stale
    cross-round duplicate shares a round with fresh events for the same key.
    The unsalted path has no such assumption.
    """
    h = hash_conv(conv_id) * np.uint64(31) + np.asarray(turn_idx).astype(np.uint64)
    return (h % np.uint64(num_partitions * salt_factor)).astype(np.int32)
