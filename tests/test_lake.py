"""Lake-level regression tests for the session-11 review findings — pure
manifest/fragment mechanics, no Ray session needed. Each test mirrors a
CONFIRMED failure repro: branch history retention, stale-handle manifest
overwrite, reshard-barrier cursor resolution, in-place compaction path
collision, and the merge kernel's unknown-op guard."""
from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raycdc.lake import Lake  # noqa: E402


def _frag(lake: Lake, part: int, round_id: str, kind: str = "base",
          rows: int = 3) -> str:
    path = lake.fragment_abspath(part, round_id, kind)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(
        pa.table({"conv_id": [f"c{i}" for i in range(rows)],
                  "turn_idx": list(range(rows))}),
        path,
    )
    return path


def _commit(lake: Lake, round_id: str, cursor_hi: int, parts: list,
            kinds: dict | None = None) -> None:
    touched = []
    for p in parts:
        kind = (kinds or {}).get(p, "base")
        _frag(lake, p, round_id, kind)
        touched.append((p, kind))
    lake.commit_round(
        round_id, epochs=[cursor_hi], cursor_lo=cursor_hi, cursor_hi=cursor_hi,
        touched_parts=touched,
        schema=pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int64())]),
        metrics={},
    )


def test_branch_serves_carried_tags_and_inherited_rollback(tmp_path):
    """A branch must retain enough per-partition history to serve every
    carried-over tag and a within-window rollback — keeping only the live
    chain made tagged snapshots read empty and rollback delete the
    branch's only base."""
    src = Lake(str(tmp_path / "src"), num_partitions=2, undo_window=8)
    _commit(src, "r1", 10, [0])
    _commit(src, "r2", 20, [0], kinds={0: "delta"})
    _commit(src, "r3", 30, [0])  # new base supersedes r1+r2 on the LIVE chain
    src.tag("t", "r2")

    dest = str(tmp_path / "br")
    src.branch(dest)
    br = Lake(dest)
    assert br.round_for_tag("t") == "r2"
    # the tagged snapshot must reconstruct (base r1 + delta r2), not be {}
    snap = br.state_map_as_of("r2")
    assert snap and snap[0]["base"] is not None
    assert os.path.exists(snap[0]["base"])
    for d in snap[0]["deltas"]:
        assert os.path.exists(d)
    # a within-window rollback on the branch keeps data (base r1 survives)
    br.drop_tag("t")
    br.rollback(20)
    live = br.live_state_map()
    assert live and live[0]["base"] is not None
    assert os.path.exists(live[0]["base"])


def test_stale_lake_handle_write_raises(tmp_path):
    """Two same-process handles both pass the flock via the registry; a
    write through the STALE one must raise instead of silently dropping
    the other handle's committed rounds (last-writer-wins manifest)."""
    root = str(tmp_path / "lake")
    a = Lake(root, num_partitions=2)
    _commit(a, "r1", 10, [0])
    b = Lake(root)  # loads manifest containing r1
    _commit(a, "r2", 20, [0])  # a advances; b is now stale
    with pytest.raises(RuntimeError, match="stale Lake handle"):
        _commit(b, "r3", 30, [1])
    # on-disk ledger still has both of a's rounds
    assert {r["round_id"] for r in Lake(root).manifest["committed_rounds"]} == {
        "r1", "r2"
    }


def test_cursor_boundary_prefers_post_reshard_round(tmp_path):
    """A reshard barrier round duplicates the previous head's cursor_hi;
    cursor-addressed resolution must pick the barrier round (the live
    layout), not the pre-reshard one — else the head is unreachable."""
    lake = Lake(str(tmp_path / "lake"), num_partitions=2)
    _commit(lake, "r1", 10, [0])
    _commit(lake, "r2", 20, [0])
    new_files = [_frag(lake, p, "rs") for p in range(4)]
    assert all(os.path.exists(f) for f in new_files)
    lake.commit_reshard(4, list(range(4)), "rs")
    assert lake.round_id_at_cursor(20) == "rs"
    # rollback to the head boundary is a no-op on the ledger, not an error
    lake.rollback(20)
    assert lake.manifest["committed_rounds"][-1]["round_id"] == "rs"


def test_compaction_in_place_path_not_deleted(tmp_path):
    """commit_compaction appends a base at the LAST round's path; if the
    superseded version already lived at that exact path, post-swap GC must
    not delete the (still live) file."""
    lake = Lake(str(tmp_path / "lake"), num_partitions=2, undo_window=1)
    _commit(lake, "r1", 10, [0])
    live_path = lake.fragment_abspath(0, "r1", "base")
    # rewrite in place (state-equivalent) and commit the compaction
    _frag(lake, 0, "r1", "base", rows=3)
    lake.commit_compaction([0])
    assert os.path.exists(live_path), "live compacted fragment was reaped"
    pq.read_table(live_path)  # still readable


def test_merge_rejects_unknown_op():
    """An op outside {insert,update,delete} must raise, not silently fold
    as an insert (null index_in → INT64_MIN under astype)."""
    from raycdc import merge as M

    tbl = pa.table(
        {
            "op": ["insert", "rollback"],
            "conv_id": ["a", "a"],
            "turn_idx": pa.array([0, 1], pa.int32()),
            "role": ["user", "user"],
            "text": ["x", "y"],
            "tool": ["", ""],
            "ts": pa.array([0, 0], pa.timestamp("us")),
            "cursor": pa.array([1, 2], pa.int64()),
            "seq": pa.array([0, 0], pa.int32()),
        }
    )
    with pytest.raises(ValueError, match="non-merge op"):
        M.merge_partition_table(None, tbl, payload=["role", "text", "tool", "ts"])
