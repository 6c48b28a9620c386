"""Micro-fixture unit tests for the LWW sorted-merge kernel (FIXTURES.md §4)
plus a randomized merge-vs-oracle equivalence check. Pure pandas, no Ray —
mirrors the reference's golden-value extractor tests
(`indexer/tests/domain/test_token_transfers.py:10-39`)."""

import numpy as np
import pandas as pd
import pytest

from raycdc import gen, oracle
from raycdc.merge import DELETED_COL, merge_partition, payload_columns
from raycdc.schema import CHANGE_SCHEMA

PAYLOAD = payload_columns([f.name for f in CHANGE_SCHEMA])


def ev(op, conv, turn, cursor, seq, **payload):
    row = {
        "op": op,
        "conv_id": conv,
        "turn_idx": turn,
        "cursor": cursor,
        "seq": seq,
        "role": None,
        "text": None,
        "tool": None,
        "ts": pd.NaT,
    }
    row.update(payload)
    return row


def run(events, fragment=None):
    df = pd.DataFrame(events)
    return merge_partition(fragment, df, PAYLOAD)


def live(frag):
    return frag[~frag[DELETED_COL]].reset_index(drop=True)


def test_insert_then_update_patch():
    out = run(
        [
            ev("insert", "c1", 0, 1, 0, role="user", text="a", tool="", ts=pd.Timestamp("2024-01-01")),
            ev("update", "c1", 0, 2, 0, text="b"),
        ]
    )
    row = live(out).iloc[0]
    assert row["text"] == "b"
    assert row["role"] == "user"  # null in update = unchanged
    assert (row["cursor"], row["seq"]) == (2, 0)


def test_lww_tie_break_seq():
    out = run(
        [
            ev("insert", "c1", 0, 1, 0, text="a"),
            ev("update", "c1", 0, 5, 1, text="hi-seq"),
            ev("update", "c1", 0, 5, 0, text="lo-seq"),
        ]
    )
    assert live(out).iloc[0]["text"] == "hi-seq"


def test_guarded_upsert_stale_loses():
    """Update with lower cursor than stored must be a no-op
    (EXCLUDED.block_number > current.block_number analog)."""
    frag = run([ev("insert", "c1", 0, 10, 0, text="new", role="user")])
    out = run([ev("update", "c1", 0, 5, 0, text="old", role="sys")], fragment=frag)
    row = live(out).iloc[0]
    assert row["text"] == "new" and row["role"] == "user"
    assert row["cursor"] == 10


def test_stale_dup_mixed_with_fresh():
    """Stale duplicate + fresh patch in the same round: only the fresh
    event applies."""
    frag = run([ev("insert", "c1", 0, 10, 0, text="new", role="user")])
    out = run(
        [
            ev("update", "c1", 0, 5, 0, text="old"),
            ev("update", "c1", 0, 12, 0, role="assistant"),
        ],
        fragment=frag,
    )
    row = live(out).iloc[0]
    assert row["text"] == "new" and row["role"] == "assistant"
    assert row["cursor"] == 12


def test_delete_then_insert():
    out = run(
        [
            ev("insert", "c1", 0, 1, 0, text="a"),
            ev("delete", "c1", 0, 2, 0),
            ev("insert", "c1", 0, 3, 0, text="b"),
        ]
    )
    assert len(live(out)) == 1
    assert live(out).iloc[0]["text"] == "b"


def test_delete_tombstone_blocks_stale_resurrection():
    frag = run(
        [
            ev("insert", "c1", 0, 1, 0, text="a"),
            ev("delete", "c1", 0, 9, 0),
        ]
    )
    assert len(live(frag)) == 0 and len(frag) == 1  # tombstone persisted
    out = run([ev("insert", "c1", 0, 5, 0, text="zombie")], fragment=frag)
    assert len(live(out)) == 0


def test_update_after_delete_recreates():
    out = run(
        [
            ev("insert", "c1", 0, 1, 0, text="a", role="user"),
            ev("delete", "c1", 0, 2, 0),
            ev("update", "c1", 0, 3, 0, text="b"),
        ]
    )
    row = live(out).iloc[0]
    assert row["text"] == "b"
    assert row["role"] is None or pd.isna(row["role"])  # not inherited across delete


def test_exact_duplicate_idempotent():
    e = ev("insert", "c1", 0, 4, 1, text="x")
    out = run([e, dict(e)])
    assert len(out) == 1
    frag = run([e])
    out2 = run([dict(e)], fragment=frag)
    pd.testing.assert_frame_equal(out2, frag)


def test_output_sorted_by_key_regardless_of_arrival():
    out = run(
        [
            ev("insert", "c2", 1, 1, 0, text="c2t1"),
            ev("insert", "c1", 5, 1, 1, text="c1t5"),
            ev("insert", "c1", 0, 1, 2, text="c1t0"),
            ev("insert", "c2", 0, 1, 3, text="c2t0"),
        ]
    )
    keys = list(zip(out["conv_id"], out["turn_idx"]))
    assert keys == sorted(keys)


@pytest.mark.parametrize("n_rounds", [1, 3])
def test_randomized_oracle_equivalence(n_rounds):
    """Apply a generated stream in rounds through merge_partition (single
    partition) and compare the final live table with the oracle replay."""
    spec = gen.GenSpec(seed=7, n_convs=60, mean_turns=6, n_epochs=n_rounds * 2)
    events = gen.generate_events(spec)
    expect = oracle.replay(events)

    frag = None
    epochs = sorted(events["epoch"].unique())
    for i in range(0, len(epochs), 2):
        batch = events[events["epoch"].isin(epochs[i : i + 2])]
        frag = merge_partition(frag, batch, PAYLOAD)

    got = live(frag)[["conv_id", "turn_idx"] + PAYLOAD + ["cursor", "seq"]].copy()
    got["turn_idx"] = got["turn_idx"].astype("int64")
    got["cursor"] = got["cursor"].astype("int64")
    got["seq"] = got["seq"].astype("int32")
    got = got.reset_index(drop=True)
    expect = expect[got.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)
