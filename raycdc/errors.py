"""Buffered error recorder: collect per-row failures to a parquet side
channel instead of failing the pipeline — the analog of the reference's
``ExceptionRecorder`` (``indexer/utils/exception_recorder.py:11-72``
in /root/reference: buffer per-item errors, flush to file at batch end)
and of its FAST mode that logs-and-continues.

Usage: ``Engine(..., error_policy="record")`` makes the normalize stage
divert malformed change rows (unknown op, null key) into
``<lake_root>/errors/<round_id>-<digest>.parquet`` and keep going; the
default ``"fail"`` keeps the reference's strict crash-the-batch behavior
(``indexer/executors/batch_work_executor.py:120-137``).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ERROR_DIR = "errors"

# the one valid-op value set — shared with engine.py's strict-mode check so
# record mode and fail mode can never disagree about what is malformed
VALID_OPS = ("insert", "update", "delete")


def split_bad_rows(batch: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(good, bad): bad = unknown op OR null key column."""
    ok = pc.is_in(
        batch.column("op"), value_set=pa.array(list(VALID_OPS))
    )
    ok = pc.and_(ok, pc.invert(pc.is_null(batch.column("conv_id"))))
    ok = pc.and_(ok, pc.invert(pc.is_null(batch.column("turn_idx"))))
    ok = pc.fill_null(ok, False)
    return batch.filter(ok), batch.filter(pc.invert(ok))


def record_bad_rows(lake_root: str, round_id: str, bad: pa.Table, reason: str) -> str:
    """Write one error parquet (idempotent name: digest of the offending
    keys) under the lake's ``errors/`` dir; returns the path."""
    os.makedirs(os.path.join(lake_root, ERROR_DIR), exist_ok=True)
    digest = hashlib.sha1(
        (round_id + "|" + reason + "|" + str(bad.num_rows) + "|"
         + str(bad.column("cursor").slice(0, 64).to_pylist())).encode()
    ).hexdigest()[:12]
    bad = bad.append_column(
        "error_reason", pa.array([reason] * bad.num_rows, pa.string())
    )
    path = os.path.join(lake_root, ERROR_DIR, f"{round_id}-{digest}.parquet")
    tmp = path + ".tmp"
    pq.write_table(bad, tmp)
    os.replace(tmp, path)
    return path


def read_errors(lake_root: str):
    """All recorded error rows as a Dataset (empty list -> None).

    Delivery semantics are AT-LEAST-ONCE, like any dead-letter channel: a
    round that fails mid-push and is retried (possibly re-split, possibly
    under a narrower adaptive round id) may re-record the same bad rows
    under a different file name. Rows cannot be deduplicated here without
    breaking the oracle contract (at-least-once DUPLICATE events in the
    log are distinct occurrences sharing (cursor, seq)), so consumers that
    need exactly-once must dedup on their own identity columns."""
    import glob

    import ray.data

    paths = sorted(glob.glob(os.path.join(lake_root, ERROR_DIR, "*.parquet")))
    if not paths:
        return None
    return ray.data.read_parquet(paths)
