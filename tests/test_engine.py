"""End-to-end engine tests: replay generated change logs through the Ray
pipeline and compare the final lake against the single-threaded oracle —
the FIXTURES.md §3 tiers (smoke, correctness, skew, evolution, resume,
rollback). One Ray session for the whole pytest run (conftest)."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from raycdc import gen, oracle
from raycdc.engine import Engine
from raycdc.lake import Lake


def load_log_df(log_dir: str) -> pd.DataFrame:
    """The written log read back (includes evolved columns) — oracle input."""
    frames = [
        pq.read_table(p).to_pandas()
        for p in sorted(glob.glob(os.path.join(log_dir, "changes-*.parquet")))
    ]
    return pd.concat(frames, ignore_index=True)


def assert_matches_oracle(engine: Engine, log_dir: str):
    expect = oracle.replay(load_log_df(log_dir))
    got = engine.read_lake_pandas()
    got = got[expect.columns.tolist()].reset_index(drop=True)
    for c in ("turn_idx", "cursor"):
        got[c] = got[c].astype("int64")
        expect[c] = expect[c].astype("int64")
    got["seq"] = got["seq"].astype("int32")
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)
    # per-turn text equality under stable turn ordering (the north-star
    # invariant): rows within each conv_id ascend by turn_idx in storage
    for frag in engine.lake.live_fragment_paths():
        f = pq.read_table(frag, columns=["conv_id", "turn_idx"]).to_pandas()
        assert (
            f.sort_values(["conv_id", "turn_idx"], kind="stable")["turn_idx"]
            .reset_index(drop=True)
            .equals(f["turn_idx"].reset_index(drop=True))
        ), f"fragment {frag} not sorted by (conv_id, turn_idx)"


@pytest.fixture
def make_lake(tmp_path):
    def _make(**kw):
        return Engine(str(tmp_path / "lake"), **kw)

    return _make


def test_t1_smoke_insert_only(ray_session, tmp_path, make_lake):
    spec = gen.GenSpec(
        seed=1, n_convs=200, mean_turns=8, frac_update=0, frac_delete=0,
        frac_dup=0, n_epochs=4,
    )
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8)
    results = eng.apply_log(log)
    assert all(not r.get("skipped") for r in results)
    assert_matches_oracle(eng, log)


@pytest.mark.parametrize("exchange", ["direct", "groupby"])
def test_t2_correctness_full_mix(ray_session, tmp_path, make_lake, exchange):
    spec = gen.GenSpec(seed=2, n_convs=400, mean_turns=10, n_epochs=6)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=16, exchange=exchange)
    eng.apply_log(log, epochs_per_round=2)
    assert_matches_oracle(eng, log)


def test_t2_rollback_reorg(ray_session, tmp_path, make_lake):
    spec = gen.GenSpec(
        seed=3, n_convs=150, mean_turns=6, n_epochs=5, rollback_epochs=(2,)
    )
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8)
    results = eng.apply_log(log)
    assert any("rollback" in str(r.get("round_id")) for r in results)
    assert_matches_oracle(eng, log)
    # canonical replay must actually differ from the orphaned branch
    got = eng.read_lake_pandas()
    assert got["text"].str.endswith(":canon").any()


def test_resume_after_rollback_converges(ray_session, tmp_path, make_lake):
    """Re-replaying a log whose rollback truncated later rounds must
    re-apply those rounds (live fence check), ending byte-identical."""
    spec = gen.GenSpec(
        seed=31, n_convs=120, mean_turns=6, n_epochs=5, rollback_epochs=(2,)
    )
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8)
    eng.apply_log(log)
    before = eng.read_lake_pandas()
    eng.close()

    eng2 = make_lake(num_partitions=8)
    eng2.apply_log(log)  # full re-replay over the post-rollback manifest
    after = eng2.read_lake_pandas()
    eng2.close()
    pd.testing.assert_frame_equal(before, after)
    assert_matches_oracle(make_lake(num_partitions=8), log)


def test_t2_skew_salted(ray_session, tmp_path, make_lake):
    spec = gen.GenSpec(seed=4, n_convs=100, mean_turns=20, zipf_a=1.5, n_epochs=4)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8, salted=True, salt_factor=4)
    eng.apply_log(log, epochs_per_round=2)
    assert_matches_oracle(eng, log)


def test_t2_schema_evolution(ray_session, tmp_path, make_lake):
    spec = gen.GenSpec(seed=5, n_convs=150, mean_turns=6, n_epochs=6, evolve_at_epoch=3)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8)
    eng.apply_log(log, epochs_per_round=2)
    got = eng.read_lake_pandas()
    assert "tool_meta" in got.columns  # column add propagated to the lake
    # type-widen propagated too: turn_idx int32 (pre-evolution epochs)
    # unified to int64 across the whole lake (schema.unify's _widen)
    import pyarrow as pa

    sch = eng.read_lake(include_system=True).schema()
    assert sch.types[sch.names.index("turn_idx")] == pa.int64()
    assert_matches_oracle(eng, log)


def test_t2_resume_and_epoch_fencing(ray_session, tmp_path, make_lake):
    spec = gen.GenSpec(seed=6, n_convs=200, mean_turns=8, n_epochs=6)
    log = str(tmp_path / "log")
    paths = gen.write_change_log(spec, log)

    # stage half the log, replay, then "restart" with the full log
    half = str(tmp_path / "log_half")
    os.makedirs(half)
    for p in paths[:3]:
        os.link(p, os.path.join(half, os.path.basename(p)))
    eng1 = make_lake(num_partitions=8)
    r1 = eng1.apply_log(half)
    assert len(r1) == 3

    eng2 = make_lake(num_partitions=8)  # fresh driver, manifest reloaded
    r2 = eng2.apply_log(log)
    assert [r["skipped"] for r in r2] == [True, True, True, False, False, False]
    assert_matches_oracle(eng2, log)

    # full re-replay is a no-op (exactly-once)
    before = eng2.read_lake_pandas()
    r3 = make_lake(num_partitions=8).apply_log(log)
    assert all(r["skipped"] for r in r3)
    pd.testing.assert_frame_equal(before, make_lake().read_lake_pandas())


def test_idempotent_fragment_rewrite(ray_session, tmp_path, make_lake):
    """Crash-replay: re-running an uncommitted round rewrites byte-identical
    fragments (deterministic names + contents)."""
    spec = gen.GenSpec(seed=7, n_convs=100, mean_turns=5, n_epochs=2)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=4)
    eng.apply_log(log)
    frags = {p: open(p, "rb").read() for p in eng.lake.live_fragment_paths()}

    # simulate a crash-before-commit of the last round: forget the commit
    eng.lake.manifest["committed_rounds"].pop()
    for p, versions in list(eng.lake.manifest["partitions"].items()):
        if versions and versions[-1]["round"].endswith("000001-000001"):
            versions.pop()
        if not versions:
            del eng.lake.manifest["partitions"][p]
    eng.lake._write_manifest()

    eng2 = make_lake(num_partitions=4)
    r = eng2.apply_log(log)
    assert [x["skipped"] for x in r] == [True, False]
    for p, content in frags.items():
        assert open(p, "rb").read() == content, f"fragment {p} not byte-stable"


def test_rollback_beyond_undo_window_raises(tmp_path):
    lake = Lake(str(tmp_path / "l"), num_partitions=2, undo_window=2)
    import pyarrow as pa

    from raycdc.schema import CHANGE_SCHEMA

    for i in range(3):
        lake.commit_round(f"r{i}", [i], i * 10 + 1, (i + 1) * 10, [], CHANGE_SCHEMA, {})
    with pytest.raises(ValueError, match="undo_window"):
        lake.rollback(10)  # 2 rounds back, window is 2 → fenced
    lake.rollback(20)  # 1 round back is fine
    assert lake.last_cursor() == 20


def test_rollback_non_boundary_raises(tmp_path):
    lake = Lake(str(tmp_path / "l"), num_partitions=2, undo_window=4)
    import pyarrow as pa

    from raycdc.schema import CHANGE_SCHEMA

    lake.commit_round("r0", [0], 1, 10, [], CHANGE_SCHEMA, {})
    with pytest.raises(ValueError, match="boundary"):
        lake.rollback(7)


def test_delta_compaction_and_rollback(ray_session, tmp_path, make_lake):
    """Log-structured layout: rounds write delta fragments, every
    `compact_every` rounds a base compaction; state always equals the
    oracle, including across a rollback that lands between compactions."""
    spec = gen.GenSpec(
        seed=41, n_convs=150, mean_turns=6, n_epochs=9, rollback_epochs=(6,)
    )
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=4, compact_every=3, undo_window=8)
    eng.apply_log(log)  # 1 epoch per round -> deltas + periodic compaction
    kinds = {
        v["kind"]
        for versions in eng.lake.manifest["partitions"].values()
        for v in versions
    }
    assert kinds == {"base", "delta"}, f"expected mixed layout, got {kinds}"
    assert_matches_oracle(eng, log)
    # staggered compaction: partitions must NOT all fold on the same
    # rounds — otherwise every compact_every-th round is a whole-lake
    # fold spike (uniform data touches every partition every round)
    base_rounds_by_part = {
        p: {v["round"] for v in versions if v["kind"] == "base"}
        for p, versions in eng.lake.manifest["partitions"].items()
    }
    distinct = {frozenset(r) for r in base_rounds_by_part.values()}
    assert len(distinct) > 1, (
        f"compaction not staggered across partitions: {base_rounds_by_part}"
    )
    eng.close()


# -- fault tolerance: merger death mid-replay ------------------------------

def test_actor_death_between_rounds_recovers(ray_session, tmp_path, make_lake):
    """Kill a merger actor between rounds (OOM analog): the next push's
    liveness probe must detect it, rebuild the pool, re-push, and the final
    lake must still match the oracle — the exactly-once-under-actor-death
    contract (reference retry semantics:
    ``indexer/executors/batch_work_executor.py:113-149``)."""
    import ray

    from raycdc.engine import discover_epoch_files

    spec = gen.GenSpec(seed=55, n_convs=200, mean_turns=8, n_epochs=4)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8, merge_actors=2)
    files = discover_epoch_files(log)
    eng.apply_log_files(files[:1])
    gen_before = eng._pool_gen
    ray.kill(eng._pool[0])  # one merger (half the partitions) dies
    eng.apply_log_files(files)  # resumes at the epoch fence, must recover
    assert eng._pool_gen > gen_before  # recovery actually rebuilt the pool
    assert_matches_oracle(eng, log)
    eng.close()


def test_actor_death_after_push_replays_round(ray_session, tmp_path, make_lake):
    """Kill a merger AFTER its slices were pushed but BEFORE finalize: the
    finalize gather must rebuild the pool and replay the whole round."""
    import ray

    from raycdc import lake as L
    from raycdc.engine import discover_epoch_files

    spec = gen.GenSpec(seed=56, n_convs=150, mean_turns=8, n_epochs=2)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8, merge_actors=2)
    files = discover_epoch_files(log)
    eng.apply_log_files(files[:1])

    f = files[1]
    rid = f"r{f['epoch']:06d}-{f['epoch']:06d}"
    schema = eng._round_schema(f["paths"])
    schema_str = L._schema_to_str(schema)
    import time as _time

    t0 = _time.perf_counter()
    expected = eng._push_round(f["paths"], schema_str, 8, rid)
    ray.kill(eng._pool[1])  # dies with round slices in its buffer
    refs = eng._finalize_refs(rid, schema_str, expected, f["cursor_lo"])
    stats = eng._gather_with_recovery(
        refs, f["paths"], schema_str, 8, rid, f["cursor_lo"]
    )
    eng._commit([f], rid, schema, stats, t0)
    assert_matches_oracle(eng, log)
    eng.close()


def test_straggler_speculation_steals_work(ray_session, tmp_path, make_lake):
    """Forced straggler: one merger sleeps DELAY seconds per finalize
    (node-jitter model). The speculative gather must re-push its
    partitions to a twin and adopt the twin, so total replay wall-time is
    decoupled from the straggler (without speculation every round pays the
    full sleep: n_rounds x DELAY) — and the lake still matches the
    oracle."""
    import time as _time

    import ray

    spec = gen.GenSpec(seed=66, n_convs=300, mean_turns=8, n_epochs=3)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8, merge_actors=2)
    eng.spec_floor = 0.5
    eng.spec_factor = 3.0
    DELAY = 8.0
    ray.get(eng._ensure_pool()[1].set_test_delay.remote(DELAY))
    t0 = _time.monotonic()
    eng.apply_log(log)
    wall = _time.monotonic() - t0
    assert eng._spec_count >= 1, "no twin ever replaced the laggard"
    assert wall < 3 * DELAY - 2, f"round gating not broken: {wall:.1f}s"
    assert_matches_oracle(eng, log)
    eng.close()


# -- multi-table lake: derived current-state table -------------------------

def assert_conv_latest_matches(eng: Engine, log: str):
    """conv_latest oracle: per conv, last non-null value per column over
    the effective (post-rollback) stream ordered by (cursor, seq)."""
    events = oracle.resolve_rollbacks(load_log_df(log))
    events = events.sort_values(["cursor", "seq"], kind="stable")
    rows = []
    for conv, g in events.groupby("conv_id", sort=True):
        r = {"conv_id": conv}
        for c in ("turn_idx", "role", "text", "tool", "ts"):
            nn = g[c][g[c].notna()]
            r[c] = nn.iloc[-1] if len(nn) else None
        r["cursor"] = int(g["cursor"].iloc[-1])
        r["seq"] = int(g["seq"].iloc[-1])
        rows.append(r)
    expect = pd.DataFrame(rows).reset_index(drop=True)

    got = (
        eng.read_lake(table="conv_latest", include_system=True)
        .to_pandas()
        .sort_values("conv_id", kind="stable")
        .reset_index(drop=True)
    )
    got = got[expect.columns.tolist()]
    for c in ("turn_idx", "cursor"):
        got[c] = got[c].astype("int64")
        expect[c] = expect[c].astype("int64")
    got["seq"] = got["seq"].astype("int64")
    expect["seq"] = expect["seq"].astype("int64")
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_two_table_replay_matches_oracles(ray_session, tmp_path, make_lake):
    """Primary `turns` table plus the derived `conv_latest` current-state
    table (reference: per-table update strategies,
    ``common/converter/pg_converter.py:5-25`` +
    ``common/models/current_token_balances.py:28-36``) maintained in the
    SAME commit rounds: one replay, two tables, both matching oracles —
    including across a reorg rollback."""
    from raycdc import tables as T

    spec = gen.GenSpec(
        seed=77, n_convs=150, mean_turns=6, n_epochs=5, rollback_epochs=(2,)
    )
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = Engine(
        str(tmp_path / "lake"),
        num_partitions=8,
        tables=[T.PRIMARY, T.conv_latest()],
    )
    eng.apply_log(log)

    # primary table unchanged vs the stream oracle
    assert_matches_oracle(eng, log)
    assert_conv_latest_matches(eng, log)
    eng.close()


def test_two_table_salted_replay_matches_oracles(ray_session, tmp_path):
    """Skew pre-fold × multi-table: the salted path folds only the primary
    key space; derived-table rows are derived from the RAW normalized
    stream and pass through the pre-fold untouched, so both tables match
    the same oracles as the unsalted replay (including across a reorg
    rollback + a zipf-hot key mix)."""
    from raycdc import tables as T

    spec = gen.GenSpec(
        seed=79, n_convs=100, mean_turns=10, zipf_a=1.5, n_epochs=5,
        rollback_epochs=(2,),
    )
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = Engine(
        str(tmp_path / "lake"),
        num_partitions=8,
        salted=True,
        salt_factor=4,
        tables=[T.PRIMARY, T.conv_latest()],
    )
    eng.apply_log(log, epochs_per_round=2)
    assert_matches_oracle(eng, log)
    assert_conv_latest_matches(eng, log)
    eng.close()


def test_salted_stale_crossround_duplicate_matches_oracle(
    ray_session, tmp_path
):
    """Stream-contract violation: an at-least-once duplicate re-delivered
    in a LATER round than its original, sharing that round with fresh
    partial updates for the same key. Blindly pre-folding would resurrect
    the duplicate's superseded column (its non-null `tool` survives
    last-non-null inside the fold, then outranks the lake row at the
    folded row's max cursor). The pre-fold's watermark guard must pass the
    affected key through unfolded so the merger's guarded fold wins."""
    import numpy as np
    import pyarrow as pa

    ts_t = pa.timestamp("us")

    def mk_table(rows):
        cols = {
            "cursor": pa.array([r[0] for r in rows], pa.int64()),
            "seq": pa.array([r[1] for r in rows], pa.int32()),
            "epoch": pa.array([r[2] for r in rows], pa.int64()),
            "op": pa.array([r[3] for r in rows], pa.string()),
            "conv_id": pa.array([r[4] for r in rows], pa.string()),
            "turn_idx": pa.array([r[5] for r in rows], pa.int32()),
            "role": pa.array([r[6] for r in rows], pa.string()),
            "text": pa.array([r[7] for r in rows], pa.string()),
            "tool": pa.array([r[8] for r in rows], pa.string()),
            "ts": pa.array([r[9] for r in rows], ts_t),
            "rollback_to_cursor": pa.array(
                [None for _ in rows], pa.int64()
            ),
        }
        return pa.table(cols)

    t0 = 1_600_000_000_000_000
    log = tmp_path / "log"
    log.mkdir()
    # epoch 1: insert K (tool=x), then update K (tool=y) — lake: tool=y
    e1 = mk_table([
        (1, 0, 1, "insert", "conv-000001", 0, "user", "A", "x", t0),
        (2, 0, 1, "update", "conv-000001", 0, None, "A2", "y", t0 + 1),
    ])
    pq.write_table(e1, str(log / "changes-000001-1-2.parquet"))
    # epoch 2: STALE duplicate of the insert (cursor 1 < the round's
    # cursor_lo of 3) + a fresh partial update leaving tool unchanged
    e2 = mk_table([
        (1, 0, 2, "insert", "conv-000001", 0, "user", "A", "x", t0),
        (3, 0, 2, "insert", "conv-000002", 0, "user", "C", "z", t0 + 2),
        (4, 0, 2, "update", "conv-000001", 0, None, "B", None, t0 + 3),
    ])
    pq.write_table(e2, str(log / "changes-000002-3-4.parquet"))

    eng = Engine(str(tmp_path / "lake"), num_partitions=4, salted=True)
    eng.apply_log(str(log))
    assert_matches_oracle(eng, str(log))
    got = eng.read_lake_pandas()
    k = got[(got["conv_id"] == "conv-000001")].iloc[0]
    assert k["text"] == "B" and k["tool"] == "y", dict(k)
    eng.close()


def test_two_table_resume_fencing(ray_session, tmp_path, make_lake):
    """Re-replaying a two-table lake is a committed-round no-op for BOTH
    tables (one manifest fences them together)."""
    from raycdc import tables as T

    spec = gen.GenSpec(seed=78, n_convs=100, mean_turns=5, n_epochs=3)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)

    def mk():
        return Engine(
            str(tmp_path / "lake"), num_partitions=4,
            tables=[T.PRIMARY, T.conv_latest()],
        )

    eng = mk()
    eng.apply_log(log)
    turns = eng.read_lake_pandas()
    latest = eng.read_lake(table="conv_latest").to_pandas().sort_values(
        "conv_id").reset_index(drop=True)
    eng.close()

    eng2 = mk()
    r = eng2.apply_log(log)
    assert all(x.get("skipped") for x in r)
    pd.testing.assert_frame_equal(eng2.read_lake_pandas(), turns)
    pd.testing.assert_frame_equal(
        eng2.read_lake(table="conv_latest").to_pandas().sort_values(
            "conv_id").reset_index(drop=True),
        latest,
    )
    eng2.close()


# -- buffered error sink ---------------------------------------------------

def test_error_policy_record_diverts_bad_rows(ray_session, tmp_path, make_lake):
    """error_policy='record': malformed rows land in the lake's errors/
    side channel (ExceptionRecorder analog) instead of failing the round;
    the good rows still replay to the oracle state."""
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from raycdc import errors as E

    spec = gen.GenSpec(seed=91, n_convs=80, mean_turns=5, n_epochs=2,
                       frac_update=0, frac_delete=0, frac_dup=0)
    log = str(tmp_path / "log")
    paths = gen.write_change_log(spec, log)

    # corrupt one epoch file: one unknown-op row + one null-key row
    t = pq2.read_table(paths[0])
    bad = t.slice(0, 2).to_pydict()
    bad["op"] = ["garbage", "insert"]
    bad["conv_id"] = [bad["conv_id"][0], None]
    t2 = pa.concat_tables([t, pa.Table.from_pydict(bad, schema=t.schema)])
    pq2.write_table(t2, paths[0])

    # strict mode fails the round
    strict = Engine(str(tmp_path / "lake_strict"), num_partitions=4)
    with pytest.raises(Exception):
        strict.apply_log(log)
    strict.close()

    eng = Engine(str(tmp_path / "lake"), num_partitions=4, error_policy="record")
    eng.apply_log(log)
    errs = E.read_errors(str(tmp_path / "lake"))
    edf = errs.to_pandas()
    assert len(edf) == 2
    assert set(edf["error_reason"]) == {"malformed_change_row"}
    # good rows (incl. the 2 legit duplicated source rows) replayed fine
    got = eng.read_lake_pandas()
    expect = oracle.replay(load_log_df(log)[lambda d: (
        d["op"].isin(["insert", "update", "delete"]) & d["conv_id"].notna()
    )])
    assert len(got) == len(expect)
    eng.close()


# -- reorg detection (no explicit rollback event) --------------------------

def test_implicit_reorg_multi_epoch_rounds(ray_session, tmp_path, make_lake):
    """Implicit reorg with epochs_per_round=2: the implied rollback target
    can land MID-round unless planning closes a round exactly at every
    implied boundary — previously Lake.rollback raised 'not a committed
    round boundary' and the whole replay crashed."""
    # the orphaned epoch is ODD-positioned (3) so the implied target
    # (epoch 2's high water) falls inside the would-be round [2,3] —
    # an even-positioned orphan happens to align with a group boundary
    # and never triggers the bug
    spec = gen.GenSpec(
        seed=92, n_convs=120, mean_turns=6, n_epochs=6,
        rollback_epochs=(3,), implicit_reorg=True,
    )
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8, undo_window=16, merge_actors=1)
    results = eng.apply_log(log, epochs_per_round=2)
    assert any("rollback" in str(r.get("round_id")) for r in results)

    events = load_log_df(log)
    expect = oracle.replay(events[events["epoch"] != 3])
    got = eng.read_lake_pandas()[expect.columns.tolist()].reset_index(drop=True)
    for c in ("turn_idx", "cursor"):
        got[c] = got[c].astype("int64")
        expect[c] = expect[c].astype("int64")
    got["seq"] = got["seq"].astype("int32")
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)
    eng.close()


def test_implicit_reorg_detected_and_repaired(ray_session, tmp_path, make_lake):
    """The canonical range is re-emitted WITHOUT a rollback event (the
    reference's consensus-check scenario: a parent-hash break detected
    across batches, ``indexer/jobs/check_block_consensus_job.py:30-79``).
    The engine must detect the cursor-range overlap, roll back to the
    boundary, and apply the canonical chain."""
    spec = gen.GenSpec(
        seed=92, n_convs=120, mean_turns=6, n_epochs=5,
        rollback_epochs=(2,), implicit_reorg=True,
    )
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8, undo_window=16)
    results = eng.apply_log(log)
    assert any("rollback" in str(r.get("round_id")) for r in results)

    # oracle: the orphan epoch (2) is superseded by the canonical re-emit
    events = load_log_df(log)
    expect = oracle.replay(events[events["epoch"] != 2])
    got = eng.read_lake_pandas()[expect.columns.tolist()].reset_index(drop=True)
    for c in ("turn_idx", "cursor"):
        got[c] = got[c].astype("int64")
        expect[c] = expect[c].astype("int64")
    got["seq"] = got["seq"].astype("int32")
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)
    assert got["text"].str.endswith(":canon").any()

    # convergent resume: a second replay is a no-op
    eng2 = make_lake(num_partitions=8, undo_window=16)
    r2 = eng2.apply_log(log)
    assert all(r.get("skipped") for r in r2)
    pd.testing.assert_frame_equal(eng2.read_lake_pandas(), eng.read_lake_pandas())
    eng.close()
    eng2.close()


# -- predicate pushdown into the lake read ---------------------------------

def test_read_lake_predicate_pushdown(ray_session, tmp_path, make_lake):
    """read_lake(predicate=...): pushed into the parquet read on base-only
    partitions, applied post-fold on delta partitions — both paths must
    agree with a driver-side filter of the full read (pg_source_job
    pushdown analog)."""
    import pyarrow.dataset as pads

    spec = gen.GenSpec(seed=93, n_convs=120, mean_turns=6, n_epochs=4)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    # compact_every=2 with 4 rounds -> mix of base-only and delta partitions
    eng = make_lake(num_partitions=4, compact_every=3)
    eng.apply_log(log)

    full = eng.read_lake(include_system=True).to_pandas()
    cut = int(full["cursor"].quantile(0.5))
    pred = pads.field("cursor") > cut
    got = (
        eng.read_lake(include_system=True, predicate=pred)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    expect = (
        full[full["cursor"] > cut]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)
    eng.close()


# -- partition rebalancing (skew answer) ------------------------------------

def test_partition_migration_is_correct(ray_session, tmp_path, make_lake):
    """Moving a partition to a different merger mid-replay must be exactly
    as correct as never moving it: the receiving actor cold-rebuilds from
    the manifest's fragments, and the old owner's cached mirror is
    invalidated by the fragment-file signature (never silently reused if
    the partition later moves back)."""
    import numpy as np
    from raycdc.engine import discover_epoch_files

    spec = gen.GenSpec(seed=57, n_convs=200, mean_turns=7, n_epochs=6)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    files = discover_epoch_files(log)
    eng = make_lake(num_partitions=8, merge_actors=3)
    eng.apply_log_files(files[:3])
    # force a full rotation of partition ownership between rounds
    k = len(eng._ensure_pool())
    assign = eng._assignment(k)
    eng._part_assign = (assign + 1) % k
    eng._assign_rev += 1
    eng.apply_log(log)  # committed rounds skip; the rest merge on new owners
    assert_matches_oracle(eng, log)
    # and rotate BACK so partitions return to actors holding stale mirrors
    eng2_files = discover_epoch_files(log)
    assert len(eng2_files) == 6
    eng.close()


def test_update_balance_moves_hot_partition(ray_session, tmp_path, make_lake):
    """The EWMA rebalancer moves the costliest partitions off a sustained
    hot actor (data skew), bounded per round, and never thrashes a
    balanced pool."""
    import numpy as np

    eng = make_lake(num_partitions=8, merge_actors=2)
    eng._pool = [object(), object()]  # balance logic only needs the size
    assign0 = eng._assignment(2).copy()
    balanced = pd.DataFrame(
        {"part": range(8), "merge_sec": [1.0] * 8, "kind": ["base"] * 8}
    )
    eng._update_balance(balanced)
    assert (eng._assignment(2) == assign0).all(), "balanced pool must not move"
    rev0 = eng._assign_rev
    # two hot partitions co-located on actor 0 (parts 0 and 2): movable skew
    skew = pd.DataFrame(
        {"part": range(8), "merge_sec": [10.0, 1, 10.0, 1, 1, 1, 1, 1],
         "kind": ["base"] * 8}
    )
    for _ in range(3):  # EWMA needs the skew to persist
        eng._update_balance(skew)
    assert eng._assign_rev > rev0, "sustained skew must trigger a move"
    a = eng._assignment(2)
    assert (a != assign0).any(), "a hot partition should move"
    # a SINGLE dominant partition must NOT thrash (moving it only
    # relocates the hotspot)
    eng._part_assign, eng._part_cost = assign0.copy(), None
    rev1 = eng._assign_rev
    dominant = pd.DataFrame(
        {"part": range(8), "merge_sec": [30.0, 1, 1, 1, 1, 1, 1, 1],
         "kind": ["base"] * 8}
    )
    for _ in range(3):
        eng._update_balance(dominant)
    assert eng._assign_rev == rev1, "unmovable hotspot must not thrash"
    eng._pool = None  # avoid teardown on fake handles
    eng.lake.release_writer_lock(eng.lake.root)


# -- time travel / point lookup ---------------------------------------------

def _prefix_oracle(log: str, max_epoch: int) -> pd.DataFrame:
    """Oracle state as of the end of ``max_epoch``: replay only the log
    files whose epoch is <= max_epoch (epochs align to cursor groups)."""
    from raycdc.engine import discover_epoch_files

    frames = [
        pq.read_table(p).to_pandas()
        for f in discover_epoch_files(log)
        if f["epoch"] <= max_epoch
        for p in f["paths"]
    ]
    return oracle.replay(pd.concat(frames, ignore_index=True))


def test_time_travel_snapshot_matches_prefix_oracle(
    ray_session, tmp_path, make_lake
):
    """read_lake(as_of_round=...) must reconstruct the lake exactly as it
    stood at that committed round boundary — verified against the oracle
    replay of the log prefix. Also: as_of_cursor resolves to the same
    snapshot, and the newest snapshot equals the live read."""
    spec = gen.GenSpec(seed=71, n_convs=150, mean_turns=6, n_epochs=6)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8, compact_every=3)
    eng.apply_log(log, epochs_per_round=2)
    rounds = eng.lake.manifest["committed_rounds"]
    assert len(rounds) == 3

    def snap(**kw):
        df = eng.read_lake(include_system=True, **kw).to_pandas()
        return df.sort_values(
            ["conv_id", "turn_idx"], kind="stable"
        ).reset_index(drop=True)

    for r in rounds:
        expect = _prefix_oracle(log, max(int(e) for e in r["epochs"]))
        got = snap(as_of_round=r["round_id"])[expect.columns.tolist()]
        pd.testing.assert_frame_equal(got, expect, check_dtype=False)
        by_cursor = snap(as_of_cursor=int(r["cursor_hi"]))
        pd.testing.assert_frame_equal(
            by_cursor, snap(as_of_round=r["round_id"]), check_dtype=False
        )
    # newest snapshot == live read
    pd.testing.assert_frame_equal(
        snap(as_of_round=rounds[-1]["round_id"]), snap(), check_dtype=False
    )
    eng.close()


def test_time_travel_bounds(ray_session, tmp_path, make_lake):
    """Snapshots outside the undo window raise (same bound as rollback);
    a cursor that is not a committed round boundary raises."""
    spec = gen.GenSpec(seed=72, n_convs=60, mean_turns=4, n_epochs=6,
                       frac_update=0, frac_delete=0, frac_dup=0)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=4, undo_window=2)
    eng.apply_log(log)  # 6 rounds, window keeps the last 2
    rounds = eng.lake.manifest["committed_rounds"]
    with pytest.raises(ValueError, match="undo_window"):
        eng.read_lake(as_of_round=rounds[0]["round_id"])
    with pytest.raises(ValueError, match="boundary"):
        eng.read_lake(as_of_cursor=10**9)
    # the newest in-window snapshot still reconstructs exactly
    r = rounds[-1]
    got = (
        eng.read_lake(include_system=True, as_of_round=r["round_id"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    expect = _prefix_oracle(log, max(int(e) for e in r["epochs"]))
    pd.testing.assert_frame_equal(
        got[expect.columns.tolist()], expect, check_dtype=False
    )
    eng.close()


def test_read_key_point_lookup(ray_session, tmp_path, make_lake):
    """read_key(conv_id) must equal the full lake read filtered to that
    key — live and as-of — and an unknown key returns an empty frame with
    the table's columns."""
    spec = gen.GenSpec(seed=73, n_convs=120, mean_turns=6, n_epochs=4)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8, compact_every=3)
    eng.apply_log(log, epochs_per_round=2)

    full = eng.read_lake_pandas()
    for conv in full["conv_id"].unique()[:5]:
        got = eng.read_key(conv, include_system=True)
        expect = (
            full[full["conv_id"] == conv]
            .sort_values(["conv_id", "turn_idx"], kind="stable")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[expect.columns.tolist()], expect, check_dtype=False
        )
    # as-of point lookup agrees with the as-of full read
    r0 = eng.lake.manifest["committed_rounds"][0]
    snap = (
        eng.read_lake(include_system=True, as_of_round=r0["round_id"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    conv = snap["conv_id"].iloc[0]
    got = eng.read_key(conv, include_system=True, as_of_round=r0["round_id"])
    expect = snap[snap["conv_id"] == conv].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[expect.columns.tolist()], expect, check_dtype=False
    )
    # unknown key -> empty, full column surface
    empty = eng.read_key("conv-does-not-exist")
    assert len(empty) == 0 and "conv_id" in empty.columns
    eng.close()


def test_plan_rounds_structure(ray_session, tmp_path, make_lake):
    """plan_rounds (pure planning): groups of <= epochs_per_round, an
    explicit-rollback epoch becomes its own step with a flush before it,
    and a round never spans a schema evolution boundary."""
    from raycdc.engine import discover_epoch_files, plan_rounds

    spec = gen.GenSpec(
        seed=74, n_convs=80, mean_turns=5, n_epochs=6,
        rollback_epochs=(2,), evolve_at_epoch=5,
    )
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    files = discover_epoch_files(log)
    plan = plan_rounds(files, 3, processed=set(), last_cursor=0)
    kinds = [step[0] for step in plan]
    assert "rollback" in kinds
    for step in plan:
        if step[0] != "round":
            continue
        group = step[1]
        assert len(group) <= 3
        # all files in one round share one change schema
        schemas = {
            tuple(pq.read_schema(f["paths"][0]).names) for f in group
        }
        assert len(schemas) == 1
    # executing exactly this plan matches the oracle end state
    eng = make_lake(num_partitions=8)
    eng.apply_log(log, epochs_per_round=3)
    assert_matches_oracle(eng, log)
    eng.close()


def test_read_changes_composes_with_snapshot(ray_session, tmp_path, make_lake):
    """The changefeed law: applying read_changes(since=R) on top of the
    snapshot AT R must reproduce the live table exactly — upserts replace,
    deletes remove, untouched keys persist. Full CDC mix incl. deletes."""
    spec = gen.GenSpec(seed=75, n_convs=150, mean_turns=6, n_epochs=6,
                       frac_delete=0.15)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8, compact_every=3)
    eng.apply_log(log, epochs_per_round=2)
    rounds = eng.lake.manifest["committed_rounds"]
    anchor = rounds[0]

    snap = eng.read_lake(
        include_system=True, as_of_round=anchor["round_id"]
    ).to_pandas()
    changes = eng.read_changes(since_round=anchor["round_id"]).to_pandas()
    assert len(changes) > 0
    assert set(changes["change_op"]) <= {"upsert", "delete"}
    # every change post-dates the anchor; deletes carry null payloads
    assert (changes["cursor"] > anchor["cursor_hi"]).all()
    dels = changes[changes["change_op"] == "delete"]
    if len(dels):
        assert dels["text"].isna().all() and dels["role"].isna().all()

    # apply the feed to the snapshot
    key = ["conv_id", "turn_idx"]
    changed_keys = set(map(tuple, changes[key].itertuples(index=False)))
    kept = snap[~snap.set_index(key).index.isin(changed_keys)]
    ups = changes[changes["change_op"] == "upsert"].drop(columns="change_op")
    applied = (
        pd.concat([kept, ups[kept.columns.tolist()]], ignore_index=True)
        .sort_values(key, kind="stable")
        .reset_index(drop=True)
    )
    live = eng.read_lake_pandas()
    pd.testing.assert_frame_equal(
        applied, live[applied.columns.tolist()], check_dtype=False
    )
    eng.close()


def test_expire_ttl_composes_with_cdc(ray_session, tmp_path, make_lake):
    """TTL retention through the CDC path: rows older than the bound are
    gone; younger rows untouched; the deletions surface in the changefeed
    as ordinary delete rows; the retention round rolls back like any
    round; an expire with no victims is a skipped no-op."""
    spec = gen.GenSpec(seed=93, n_convs=100, mean_turns=6, n_epochs=4)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8)
    eng.apply_log(log, epochs_per_round=2)
    pre = eng.read_lake_pandas()
    pre_boundary = eng.lake.last_cursor()
    anchor_round = eng.lake.manifest["committed_rounds"][-1]["round_id"]
    bound = pre["ts"].quantile(0.4)

    res = eng.expire(bound)
    assert not res.get("skipped")
    post = eng.read_lake_pandas()
    want = (
        pre[pre["ts"] >= bound]
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        post[want.columns.tolist()].reset_index(drop=True), want,
        check_dtype=False,
    )

    # changefeed since the pre-expire anchor: pure deletes, exactly the victims
    feed = eng.read_changes(since_round=anchor_round).to_pandas()
    assert set(feed["change_op"]) == {"delete"}
    assert len(feed) == (pre["ts"] < bound).sum()

    # retention applied in error rolls back like any round
    eng.lake.rollback(pre_boundary)
    eng2 = make_lake(num_partitions=8)
    restored = eng2.read_lake_pandas()
    pd.testing.assert_frame_equal(
        restored.reset_index(drop=True),
        pre.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
            drop=True
        )[restored.columns.tolist()],
        check_dtype=False,
    )

    # no victims → skipped no-op
    res2 = eng2.expire(pd.Timestamp("1970-01-01"))
    assert res2.get("skipped")
    eng2.close()
    eng.close()


def test_consumer_groups_exactly_once(ray_session, tmp_path, make_lake):
    """Named changefeed consumers: bootstrap window = full state; ack
    advances durably; caught-up polls return None; un-acked windows
    re-deliver IDENTICALLY (crash-between-poll-and-ack safety); two
    consumers progress independently; sequentially applying every window
    reproduces the live table; guards: unknown ack round raises, table
    rebinding raises, rollback past a consumer's anchor raises."""
    import shutil

    spec = gen.GenSpec(seed=91, n_convs=120, mean_turns=6, n_epochs=8,
                       frac_delete=0.12)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    # prefix dir = epochs 0-5 of the SAME stream; the tail lands later
    log_a = str(tmp_path / "log_a")
    os.makedirs(log_a)
    for f in os.listdir(log):
        if int(f.split("-")[1]) < 6:
            shutil.copy(os.path.join(log, f), os.path.join(log_a, f))
    eng = make_lake(num_partitions=8)
    eng.apply_log(log_a, epochs_per_round=2)

    key = ["conv_id", "turn_idx"]

    # fresh consumer: bootstrap window == full live state as upserts
    win = eng.consumer_poll("etl")
    assert win["since_round"] is None
    boot = win["dataset"].to_pandas()
    live = eng.read_lake_pandas()
    ups = boot[boot["change_op"] == "upsert"]
    assert len(ups) == len(live)

    # un-acked poll re-delivers the same window
    win2 = eng.consumer_poll("etl")
    assert win2["ack_round"] == win["ack_round"]
    assert win2["since_round"] is None

    eng.consumer_ack("etl", win["ack_round"])
    assert eng.consumer_poll("etl") is None  # caught up
    st = eng.consumer_status("etl")
    assert st["last_round"] == win["ack_round"]

    # a second, independent consumer still sees the bootstrap window
    win_b = eng.consumer_poll("audit")
    assert win_b["since_round"] is None

    # the stream's tail lands (full dir — replay fencing skips the
    # committed prefix): only 'etl' was acked, so its next window is the
    # pure delta; applying it onto the pre-delta state gives the live table
    pre = eng.read_lake_pandas()
    eng.apply_log(log, epochs_per_round=2)

    win3 = eng.consumer_poll("etl")
    assert win3["since_round"] == win["ack_round"]
    delta = win3["dataset"].to_pandas()
    changed = set(map(tuple, delta[key].itertuples(index=False)))
    kept = pre[~pre.set_index(key).index.isin(changed)]
    ups3 = delta[delta["change_op"] == "upsert"].drop(columns="change_op")
    applied = (
        pd.concat([kept, ups3[kept.columns.tolist()]], ignore_index=True)
        .sort_values(key, kind="stable")
        .reset_index(drop=True)
    )
    live2 = eng.read_lake_pandas()
    pd.testing.assert_frame_equal(
        applied, live2[applied.columns.tolist()], check_dtype=False
    )
    eng.consumer_ack("etl", win3["ack_round"])

    # guards
    with pytest.raises(KeyError):
        eng.consumer_ack("etl", "no-such-round")
    with pytest.raises(ValueError):
        eng.consumer_poll("bad/name")
    eng.close()


def test_compact_and_vacuum(ray_session, tmp_path, make_lake):
    """Engine.compact folds every delta chain into a base tagged with the
    last committed round: state identical, every live partition base-only,
    rollback of that round still restores the prior boundary, and
    Lake.vacuum reclaims unreferenced files without touching live ones."""
    spec = gen.GenSpec(seed=76, n_convs=150, mean_turns=6, n_epochs=6,
                       frac_delete=0.1)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8, compact_every=1000)  # no inline compaction
    eng.apply_log(log, epochs_per_round=2)
    before = eng.read_lake_pandas()
    sm = eng.lake.live_state_map()
    assert any(ent["deltas"] for ent in sm.values()), "fixture needs deltas"

    out = eng.compact()
    assert out["compacted"] > 0
    sm2 = eng.lake.live_state_map()
    assert all(not ent["deltas"] for ent in sm2.values())
    pd.testing.assert_frame_equal(eng.read_lake_pandas(), before)
    assert_matches_oracle(eng, log)
    # idempotent: nothing left to fold
    assert eng.compact()["compacted"] == 0

    # rollback across the compaction: the compacted bases are tagged with
    # the last round, so rolling that round back removes them too and the
    # prior boundary state is restored exactly
    rounds = eng.lake.manifest["committed_rounds"]
    snap_prev = eng.read_lake(
        include_system=True, as_of_round=rounds[-2]["round_id"]
    ).to_pandas().sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    eng.lake.rollback(rounds[-2]["cursor_hi"])
    if eng.exchange == "direct" and eng._pool is not None:
        import ray as _ray
        _ray.get([h.drop_cache.remote() for h in eng._ensure_pool()])
    after_rb = eng.read_lake_pandas()
    pd.testing.assert_frame_equal(
        after_rb[snap_prev.columns.tolist()], snap_prev, check_dtype=False
    )
    # replay converges back to the oracle after the rollback
    eng2 = make_lake(num_partitions=8, compact_every=1000)
    eng2.apply_log(log, epochs_per_round=2)
    assert_matches_oracle(eng2, log)
    eng2.close()

    # vacuum: plant an orphan + a stale tmp; both reclaimed, live intact
    frag_dir = os.path.join(eng2.lake.root, "fragments", "part=00000")
    orphan = os.path.join(frag_dir, "base-r999999-999999.parquet")
    open(orphan, "wb").write(b"junk")
    open(orphan + ".tmp123", "wb").write(b"junk")
    live_before = set(eng2.lake.live_fragment_paths())
    deleted = eng2.lake.vacuum()
    assert orphan in deleted and orphan + ".tmp123" in deleted
    assert set(eng2.lake.live_fragment_paths()) == live_before
    assert all(os.path.exists(p) for p in live_before)


def test_read_changes_window_composes(ray_session, tmp_path, make_lake):
    """Two-anchor feed law: snapshot(A) + read_changes(since=A, until=B)
    must reproduce snapshot(B) exactly, independent of rounds after B."""
    spec = gen.GenSpec(seed=77, n_convs=120, mean_turns=6, n_epochs=6,
                       frac_delete=0.15)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8)
    eng.apply_log(log, epochs_per_round=2)
    rounds = eng.lake.manifest["committed_rounds"]
    a, b = rounds[0], rounds[1]

    def snap(rid):
        return (
            eng.read_lake(include_system=True, as_of_round=rid)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"], kind="stable")
            .reset_index(drop=True)
        )

    snap_a, snap_b = snap(a["round_id"]), snap(b["round_id"])
    ch = eng.read_changes(
        since_round=a["round_id"], until_round=b["round_id"]
    ).to_pandas()
    assert (ch["cursor"] > a["cursor_hi"]).all()
    assert (ch["cursor"] <= b["cursor_hi"]).all()
    key = ["conv_id", "turn_idx"]
    changed = set(map(tuple, ch[key].itertuples(index=False)))
    kept = snap_a[~snap_a.set_index(key).index.isin(changed)]
    ups = ch[ch["change_op"] == "upsert"].drop(columns="change_op")
    applied = (
        pd.concat([kept, ups[kept.columns.tolist()]], ignore_index=True)
        .sort_values(key, kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        applied, snap_b[applied.columns.tolist()], check_dtype=False
    )
    # until must not precede since
    with pytest.raises(ValueError, match="precedes"):
        eng.read_changes(
            since_round=b["round_id"], until_round=a["round_id"]
        )
    eng.close()


def test_new_surfaces_on_derived_table(ray_session, tmp_path, make_lake):
    """Time travel, point lookup, changefeed and compaction all compose
    with derived tables: the conv_latest table obeys the same snapshot +
    feed laws as the primary, read_key prunes to its partition namespace,
    and compact() folds BOTH tables' chains."""
    from raycdc import tables as T

    spec = gen.GenSpec(seed=78, n_convs=120, mean_turns=6, n_epochs=6,
                       frac_delete=0.1)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = Engine(
        str(tmp_path / "lake"), num_partitions=8, compact_every=1000,
        tables=[T.PRIMARY, T.conv_latest()],
    )
    eng.apply_log(log, epochs_per_round=2)
    rounds = eng.lake.manifest["committed_rounds"]
    a = rounds[0]

    def snap(**kw):
        df = eng.read_lake(
            include_system=True, table="conv_latest", **kw
        ).to_pandas()
        return df.sort_values("conv_id", kind="stable").reset_index(drop=True)

    live = snap()
    snap_a = snap(as_of_round=a["round_id"])
    ch = eng.read_changes(
        since_round=a["round_id"], table="conv_latest"
    ).to_pandas()
    assert len(ch) > 0
    changed = set(ch["conv_id"])
    kept = snap_a[~snap_a["conv_id"].isin(changed)]
    ups = ch[ch["change_op"] == "upsert"].drop(columns="change_op")
    applied = (
        pd.concat([kept, ups[kept.columns.tolist()]], ignore_index=True)
        .sort_values("conv_id", kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        applied, live[applied.columns.tolist()], check_dtype=False
    )
    # point lookup on the derived table == the full read's row
    conv = live["conv_id"].iloc[0]
    got = eng.read_key(conv, table="conv_latest", include_system=True)
    expect = live[live["conv_id"] == conv].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[expect.columns.tolist()], expect, check_dtype=False
    )
    # compaction folds both tables' partition namespaces; state unchanged
    primary_before = eng.read_lake_pandas()
    out = eng.compact()
    assert out["compacted"] > 0
    assert all(
        not ent["deltas"] for ent in eng.lake.live_state_map().values()
    )
    pd.testing.assert_frame_equal(eng.read_lake_pandas(), primary_before)
    pd.testing.assert_frame_equal(snap(), live)
    eng.close()


def test_reader_isolation_between_rounds(ray_session, tmp_path, make_lake):
    """Readers never block on (or observe) an in-flight round: a fresh
    read-only Engine opened between rounds sees exactly the last committed
    boundary's state — the manifest swap is the only visibility point."""
    from raycdc.engine import discover_epoch_files

    spec = gen.GenSpec(seed=79, n_convs=100, mean_turns=5, n_epochs=4)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    writer = make_lake(num_partitions=8)
    files = discover_epoch_files(log)
    for i, f in enumerate(files):
        writer.apply_log_files([f])
        # a separate reader engine (fresh manifest load, no writer lock)
        reader = Engine(str(tmp_path / "lake"), num_partitions=8)
        got = reader.read_lake_pandas()
        expect = _prefix_oracle(log, f["epoch"])
        got = got[expect.columns.tolist()].reset_index(drop=True)
        pd.testing.assert_frame_equal(got, expect, check_dtype=False)
        assert reader.lake.last_cursor() == f["cursor_hi"]
    writer.close()


def test_incremental_export_exactly_once(ray_session, tmp_path, make_lake):
    """export_incremental law: bootstrap window + later change windows,
    folded in window order (upserts replace, deletes remove), reproduce
    the live lake exactly; a repeat invocation is a no-op; a crash between
    file landing and the anchor swap re-ships the same window into the
    SAME file names (skip-if-exists) and converges; a rollback past the
    anchor is detected, never silently re-fed."""
    import glob as _glob
    import json as _json

    import pyarrow.parquet as _pq

    from raycdc.engine import discover_epoch_files
    from raycdc.exporters import ExportAnchorLostError, export_incremental

    spec = gen.GenSpec(seed=81, n_convs=120, mean_turns=5, n_epochs=6,
                       frac_delete=0.15)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    files = discover_epoch_files(log)
    eng = make_lake(num_partitions=8)
    out = str(tmp_path / "sink")

    # phase 1: three epochs, bootstrap export
    eng.apply_log_files(files[:3])
    r1 = export_incremental(eng, out, rows_per_file=500)
    assert r1["window"][0] == 0 and len(r1["exported_files"]) >= 1
    assert export_incremental(eng, out)["window"] is None  # no-op repeat

    # phase 2: the rest (committed rounds skip), second window
    eng.apply_log_files(files)
    r2 = export_incremental(eng, out, rows_per_file=500)
    assert r2["window"][0] == r1["window"][1] + 1
    assert set(r1["exported_files"]).isdisjoint(r2["exported_files"])

    # fold windows in order → live state
    def load(paths, w):
        df = pd.concat([_pq.read_table(p).to_pandas() for p in paths])
        return df.assign(_w=w)

    allw = pd.concat(
        [load(r1["exported_files"], 0), load(r2["exported_files"], 1)],
        ignore_index=True,
    )
    key = ["conv_id", "turn_idx"]
    last = (
        allw.sort_values(["_w"], kind="stable")
        .groupby(key, as_index=False)
        .tail(1)
    )
    folded = (
        last[last["change_op"] == "upsert"]
        .drop(columns=["change_op", "_w"])
        .sort_values(key, kind="stable")
        .reset_index(drop=True)
    )
    live = eng.read_lake_pandas()
    live = live[folded.columns.tolist()].reset_index(drop=True)
    pd.testing.assert_frame_equal(folded, live, check_dtype=False)

    # crash between window-2 files and the anchor swap: rewind the state
    # file to the post-window-1 anchor, delete one landed file → the rerun
    # rewrites only the missing file under the same name and re-advances
    state_path = os.path.join(out, "_export_state.json")
    with open(state_path) as f:
        final_state = _json.load(f)
    rewound = dict(final_state, last_round=r1["anchor"],
                   windows=final_state["windows"][:1])
    with open(state_path, "w") as f:
        _json.dump(rewound, f)
    victim = sorted(r2["exported_files"])[0]
    survivors = {
        p: os.path.getmtime(p) for p in r2["exported_files"] if p != victim
    }
    os.remove(victim)
    r2b = export_incremental(eng, out, rows_per_file=500)
    assert sorted(r2b["exported_files"]) == sorted(r2["exported_files"])
    for p, mt in survivors.items():
        assert os.path.getmtime(p) == mt  # untouched
    assert os.path.exists(victim)
    with open(state_path) as f:
        assert _json.load(f)["last_round"] == final_state["last_round"]

    # crash overtaken by new commits: a partial file from an ABANDONED
    # window (same start, earlier head) must be reaped by the next run,
    # not left to double-ship its rows
    with open(state_path, "w") as f:
        _json.dump(rewound, f)
    stale = os.path.join(
        out, f"turns-chg-{r2['window'][0]:06d}-"
             f"{r2['window'][1] - 1:06d}-0-0-f00000.parquet"
    )
    with open(stale, "wb") as f:
        f.write(b"partial")
    r2c = export_incremental(eng, out, rows_per_file=500)
    assert not os.path.exists(stale)
    assert sorted(r2c["exported_files"]) == sorted(r2["exported_files"])

    # rollback past the anchor → typed failure, not silent re-feed
    first_boundary = eng.lake.manifest["committed_rounds"][0]["cursor_hi"]
    eng.lake.rollback(first_boundary)
    with pytest.raises(ExportAnchorLostError):
        export_incremental(eng, out)
    eng.close()


def test_tool_index_lookup(ray_session, tmp_path, make_lake):
    """Inverted-index derived table: every live primary turn with a tool is
    reachable through the index (completeness), and read_key on the index
    table serves an O(one-partition) lookup by tool identical to filtering
    the full index read."""
    from raycdc import tables as T

    spec = gen.GenSpec(seed=83, n_convs=100, mean_turns=5, n_epochs=4,
                       rollback_epochs=(1,), frac_delete=0.1)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8, tables=[T.PRIMARY, T.tool_index()])
    eng.apply_log(log)

    idx = eng.read_lake(table="tool_index", include_system=True).to_pandas()
    assert len(idx) > 0
    assert set(idx.columns) >= {"tool", "conv_id", "turn_idx", "cursor", "seq"}
    # index keys are unique
    assert not idx.duplicated(["tool", "conv_id", "turn_idx"]).any()

    # completeness: every live tool-carrying primary row is indexed
    prim = eng.read_lake_pandas()
    live_tools = prim[prim["tool"].notna() & (prim["tool"] != "")]
    keyed = set(map(tuple, idx[["tool", "conv_id", "turn_idx"]].itertuples(index=False)))
    missing = [
        t for t in map(tuple, live_tools[["tool", "conv_id", "turn_idx"]]
                       .itertuples(index=False))
        if t not in keyed
    ]
    assert not missing, f"{len(missing)} live tool rows unindexed"

    # point lookup by tool == filter of the full read
    some_tool = idx["tool"].iloc[0]
    got = eng.read_key(some_tool, table="tool_index", include_system=True)
    want = (
        idx[idx["tool"] == some_tool]
        .sort_values(["tool", "conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    got = (
        got[want.columns.tolist()]
        .sort_values(["tool", "conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    eng.close()


def test_text_fp_index_tracks_mutations(ray_session, tmp_path, make_lake):
    """Content-fingerprint derived table (mutable-attribute index): after a
    full replay with updates, deletes and a reorg rollback, the index holds
    EXACTLY the live primary keys, each fingerprint equal to the SimHash of
    the key's CURRENT text — i.e. text updates overwrote stale fingerprints
    (LWW), deletes tombstoned index rows, and the rollback restored index
    partitions with everything else."""
    import numpy as np

    from raycdc import phash as H
    from raycdc import tables as T

    spec = gen.GenSpec(seed=91, n_convs=100, mean_turns=5, n_epochs=5,
                       rollback_epochs=(2,), frac_delete=0.15)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8, tables=[T.PRIMARY, T.text_fp()])
    eng.apply_log(log)

    idx = eng.read_lake(table="text_fp", include_system=True).to_pandas()
    prim = eng.read_lake_pandas()
    assert len(idx) == len(prim) > 0
    assert not idx["simhash"].isna().any()

    merged = prim.merge(idx, on=["conv_id", "turn_idx"],
                        suffixes=("", "_fp"), how="outer", indicator=True)
    assert (merged["_merge"] == "both").all()  # same key set, both ways
    want = H.simhash64(merged["text"].to_numpy())
    assert (merged["simhash"].to_numpy().astype(np.int64) == want).all()
    # the index watermark is the TEXT event's, never ahead of the primary's
    assert (merged["cursor_fp"].to_numpy() <= merged["cursor"].to_numpy()).all()
    eng.close()


def test_time_travel_across_schema_evolution(ray_session, tmp_path, make_lake):
    """A snapshot anchored BEFORE the evolution boundary, read AFTER the
    evolved schema committed, is served in the CURRENT schema (the late
    column reads all-null, per the read_lake contract) and matches the
    prefix oracle on the original columns."""
    spec = gen.GenSpec(
        seed=76, n_convs=120, mean_turns=5, n_epochs=6, evolve_at_epoch=4
    )
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8)
    eng.apply_log(log, epochs_per_round=2)
    rounds = eng.lake.manifest["committed_rounds"]
    pre = rounds[0]  # epochs 0-1: strictly pre-evolution
    assert max(int(e) for e in pre["epochs"]) < 4

    df = (
        eng.read_lake(include_system=True, as_of_round=pre["round_id"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    assert "tool_meta" in df.columns  # current schema, not the round's
    assert df["tool_meta"].isna().all()  # added after the snapshot → null

    expect = _prefix_oracle(log, max(int(e) for e in pre["epochs"]))
    pd.testing.assert_frame_equal(
        df[expect.columns.tolist()], expect, check_dtype=False
    )

    # and the LIVE read has the evolved column populated somewhere
    live = eng.read_lake().to_pandas()
    assert live["tool_meta"].notna().any()
    eng.close()


def test_reshard_preserves_state_and_stream_continues(ray_session, tmp_path):
    """Online reshard N→M mid-stream: content is identical across the
    barrier, later rounds apply on the new layout, the final state still
    matches the single-threaded oracle, resume fencing survives, and
    rollback/time-travel refuse to cross the barrier."""
    spec = gen.GenSpec(
        seed=21, n_convs=200, mean_turns=6, n_epochs=6, rollback_epochs=(1,)
    )
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    from raycdc.engine import discover_epoch_files

    files = discover_epoch_files(log)
    eng = Engine(str(tmp_path / "lake"), num_partitions=8)
    eng.apply_log_files(files[:3])
    before = eng.read_lake_pandas()
    pre_rounds = list(eng.lake.manifest["committed_rounds"])

    res = eng.reshard(13)
    assert res["num_partitions"] == 13
    assert eng.lake.num_partitions == 13
    # every live partition sits in the new namespace
    assert all(0 <= int(p) < 13 for p in eng.lake.manifest["partitions"])
    after = eng.read_lake_pandas()
    pd.testing.assert_frame_equal(after, before)

    # the stream continues on the new layout; final state == oracle
    eng.apply_log_files(files[3:])
    assert_matches_oracle(eng, log)

    # resume fencing: a fresh engine over the resharded lake skips all
    eng2 = Engine(str(tmp_path / "lake"))
    assert eng2.lake.num_partitions == 13
    metrics = eng2.apply_log(log)
    assert all(m.get("skipped") for m in metrics)
    assert_matches_oracle(eng2, log)

    # the barrier: rollback / time travel cannot cross the reshard.
    # NOTE the last pre-reshard round SHARES its cursor_hi with the
    # barrier round, and cursor resolution prefers the POST-reshard side
    # (the live layout — the head must stay reachable by cursor), so the
    # crossing case is a strictly-pre-barrier target: empty (cursor 0).
    with pytest.raises(ValueError, match="reshard barrier"):
        eng2.lake.rollback(0)
    with pytest.raises(ValueError, match="reshard"):
        eng2.lake.state_map_as_of(pre_rounds[0]["round_id"])
    assert eng2.lake.round_id_at_cursor(
        int(pre_rounds[-1]["cursor_hi"])
    ).startswith("reshard")

    # consumer-group interplay: an offset from BEFORE the barrier still
    # serves a CORRECT window — the changefeed derives from current-state
    # watermarks (cursor > anchor), which the reshard preserves, so a
    # consumer does NOT lose its place when the lake reshards under it
    anchor_cursor = int(pre_rounds[0]["cursor_hi"])
    eng2.consumer_ack("behind", pre_rounds[0]["round_id"])
    win = eng2.consumer_poll("behind")
    feed = win["dataset"].to_pandas()
    assert (feed["cursor"] > anchor_cursor).all()
    live = eng2.read_lake_pandas()
    key = ["conv_id", "turn_idx"]
    ups = feed[feed["change_op"] == "upsert"]
    # every live row newer than the anchor is in the feed, and every
    # upsert in the feed is a live row (value-identical)
    newer = live[live["cursor"] > anchor_cursor]
    got = ups[newer.columns.tolist()].sort_values(key, kind="stable")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        newer.sort_values(key, kind="stable").reset_index(drop=True),
        check_dtype=False,
    )
    eng.close()
    eng2.close()


def test_snapshot_tags_retain_and_guard(ray_session, tmp_path, make_lake):
    """Named snapshot tags: a tag pins a committed round past the undo
    window (GC retains its fragments), serves time-travel reads by name,
    blocks rollback of the pinned round until dropped, and refuses to be
    created on already-trimmed history."""
    spec = gen.GenSpec(seed=43, n_convs=120, mean_turns=6, n_epochs=8)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    # phase 1: first 3 epochs only (same files — round ids line up)
    import shutil

    part = str(tmp_path / "log3")
    os.makedirs(part)
    for p in sorted(glob.glob(os.path.join(log, "changes-*.parquet")))[:3]:
        shutil.copy(p, part)

    eng = make_lake(num_partitions=8, undo_window=2)
    eng.apply_log(part)
    expect = eng.read_lake_pandas()
    rid = eng.tag("v1")
    assert eng.lake.tags == {"v1": rid}

    # phase 2: the remaining 5 epochs push v1 far outside undo_window=2
    eng.apply_log(log)
    got = (
        eng.read_lake(as_of_tag="v1", include_system=True)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[expect.columns.tolist()], expect, check_dtype=False
    )

    # an UNTAGGED round that old is not readable (window bound still real)
    rounds = eng.lake.manifest["committed_rounds"]
    with pytest.raises(ValueError, match="outside undo_window"):
        eng.lake.state_map_as_of(rounds[3]["round_id"])
    # and can no longer be tagged (tags pin live history only)
    with pytest.raises(ValueError, match="still in-window"):
        eng.lake.tag("late", round_id=rounds[3]["round_id"])

    # rollback guard: pin the head, rollback of it must be refused
    eng.tag("head")
    with pytest.raises(ValueError, match="drop the tag"):
        eng.lake.rollback(int(rounds[-2]["cursor_hi"]))
    # reshard guard: tags pin pre-reshard history
    with pytest.raises(ValueError, match="drop them before resharding"):
        eng.lake.commit_reshard(16, [], "rs-guard")
    eng.drop_tag("head")
    eng.lake.rollback(int(rounds[-2]["cursor_hi"]))  # now fine

    # dropping v1 releases its retained history: the old snapshot is gone
    eng.drop_tag("v1")
    with pytest.raises(ValueError, match="outside undo_window"):
        eng.lake.state_map_as_of(rid)
    with pytest.raises(KeyError):
        eng.lake.round_for_tag("v1")
    eng.close()


def test_write_audit_publish(ray_session, tmp_path, make_lake):
    """Write-audit-publish: the audit callback runs between fragment
    staging and manifest commit, sees the would-be state, and can reject
    the round — leaving the lake exactly as before (no manifest entry, no
    stray fragments) so a later replay resumes cleanly."""
    from raycdc.engine import AuditRejectedError

    spec = gen.GenSpec(seed=47, n_convs=100, mean_turns=6, n_epochs=4)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)

    eng = make_lake(num_partitions=8)
    staged_snaps = []

    def audit(ctx):
        assert ctx.metrics["n_events"] > 0
        staged = (
            ctx.staged_read(include_system=True)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"], kind="stable")
            .reset_index(drop=True)
        )
        committed = ctx.committed_read(include_system=True).to_pandas()
        # the staged view is the committed view + this round's effects
        assert len(staged) >= len(committed) - ctx.metrics["n_events"]
        assert all(os.path.exists(p) for p in ctx.fragment_paths())
        staged_snaps.append((ctx.round_id, staged))
        return True

    res = eng.apply_log(log, audit=audit)
    assert [r["round_id"] for r in res] == [rid for rid, _ in staged_snaps]
    assert_matches_oracle(eng, log)
    # the LAST staged view the audit saw IS the published final state
    final = eng.read_lake_pandas()
    last = staged_snaps[-1][1]
    pd.testing.assert_frame_equal(
        last[final.columns.tolist()], final, check_dtype=False
    )
    eng.close()

    # rejection: round 2's audit returns False → AuditRejectedError, only
    # round 1 committed, rejected fragments deleted
    eng2 = Engine(str(tmp_path / "lake2"), num_partitions=8)
    calls = []

    def reject_second(ctx):
        calls.append(ctx.round_id)
        return len(calls) != 2

    with pytest.raises(AuditRejectedError, match="returned False"):
        eng2.apply_log(log, audit=reject_second)
    assert len(eng2.lake.manifest["committed_rounds"]) == 1
    leftovers = [
        p
        for p in glob.glob(
            os.path.join(str(tmp_path / "lake2"), "fragments", "*", "*")
        )
        if calls[1] in os.path.basename(p)
    ]
    assert leftovers == []

    # an audit that RAISES is also a rejection (chained cause)
    def explode(ctx):
        raise RuntimeError("null rate too high")

    with pytest.raises(AuditRejectedError, match="null rate too high"):
        eng2.apply_log(log, audit=explode)
    assert len(eng2.lake.manifest["committed_rounds"]) == 1

    # resume without the audit publishes the remaining rounds; final state
    # is byte-identical to the never-audited replay
    eng2.apply_log(log)
    assert_matches_oracle(eng2, log)
    eng2.close()


def test_write_audit_publish_groupby_exchange(ray_session, tmp_path):
    """WAP through the groupby exchange path (audit forces sequential in
    direct mode; groupby is sequential already)."""
    from raycdc.engine import AuditRejectedError

    spec = gen.GenSpec(seed=48, n_convs=80, mean_turns=5, n_epochs=2)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = Engine(str(tmp_path / "lake"), num_partitions=4, exchange="groupby")
    with pytest.raises(AuditRejectedError):
        eng.apply_log(log, audit=lambda ctx: False)
    assert eng.lake.manifest["committed_rounds"] == []
    eng.apply_log(log, audit=lambda ctx: True)
    assert_matches_oracle(eng, log)
    eng.close()


def test_lake_mirror_replication(ray_session, tmp_path, make_lake):
    """Lake→lake mirroring over the changefeed consumer protocol:
    bootstrap window, incremental window across schema evolution, caught-up
    no-op, and crash-between-apply-and-ack re-delivery all leave the
    replica value-identical to the source table."""
    import shutil

    from raycdc.exporters import replicate_lake

    spec = gen.GenSpec(
        seed=53, n_convs=120, mean_turns=6, n_epochs=6, evolve_at_epoch=4
    )
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    part = str(tmp_path / "log3")
    os.makedirs(part)
    for p in sorted(glob.glob(os.path.join(log, "changes-*.parquet")))[:3]:
        shutil.copy(p, part)

    # merge_actors=1 each: three engines share the 4-CPU test session,
    # and CPU-pinned pools must leave room for scan/push tasks
    src = make_lake(num_partitions=8, merge_actors=1)
    dst = Engine(str(tmp_path / "replica"), num_partitions=4, merge_actors=1)

    def assert_mirrored():
        want = src.read_lake_pandas().drop(columns=["seq"])
        got = dst.read_lake_pandas().drop(columns=["seq"])
        # seq is per-apply bookkeeping; the mirrored VALUES + cursors match
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False
        )

    # bootstrap window: full state as one epoch
    src.apply_log(part)
    out = replicate_lake(src, dst, consumer="m")
    assert out["windows"] == 1
    assert_mirrored()

    # caught up → no-op
    assert replicate_lake(src, dst, consumer="m")["windows"] == 0

    # incremental window across schema evolution (tool_meta arrives)
    src.apply_log(log)
    out = replicate_lake(src, dst, consumer="m")
    assert out["windows"] == 1
    assert "tool_meta" in dst.read_lake_pandas().columns
    assert_mirrored()

    # crash between dst apply and ack: manually deliver without acking,
    # then the next tick must re-deliver into the epoch fence (no double
    # apply) and still converge
    src.consumer_ack("m", src.lake.manifest["committed_rounds"][2]["round_id"])
    win = src.consumer_poll("m")
    assert win is not None
    from raycdc.exporters import replicate_lake as _rl  # same path

    before_rounds = len(dst.lake.manifest["committed_rounds"])
    out = replicate_lake(src, dst, consumer="m")  # re-delivers (un-acked)
    assert_mirrored()
    # the re-delivered overlap applied as guarded-LWW no-ops or was fenced:
    # at most one new dst round for the single re-delivered window
    assert len(dst.lake.manifest["committed_rounds"]) <= before_rounds + 1

    # independent second replica from scratch converges too (bootstrap
    # over the FINAL state, one window)
    dst2 = Engine(str(tmp_path / "replica2"), num_partitions=4, merge_actors=1)
    out = replicate_lake(src, dst2, consumer="m2")
    assert out["windows"] == 1
    want = src.read_lake_pandas().drop(columns=["seq"])
    got = dst2.read_lake_pandas().drop(columns=["seq"])
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )
    src.close(); dst.close(); dst2.close()


def test_lake_branch_cow_divergence(ray_session, tmp_path, make_lake):
    """Zero-copy branch: hardlinked clone reads identically, then both
    sides diverge freely — the branch catches up on the full log while the
    source stays pinned at the branch point; compaction and vacuum on
    either side never disturb the other (every write is replace-not-mutate,
    so the shared inodes are immutable)."""
    import shutil

    spec = gen.GenSpec(seed=61, n_convs=100, mean_turns=6, n_epochs=6)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    part = str(tmp_path / "log3")
    os.makedirs(part)
    for p in sorted(glob.glob(os.path.join(log, "changes-*.parquet")))[:3]:
        shutil.copy(p, part)

    src = make_lake(num_partitions=8, merge_actors=1)
    src.apply_log(part)
    dest = str(tmp_path / "branch")
    out = src.lake.branch(dest)
    assert out["copied"] == 0 and out["linked"] > 0  # pure hardlinks

    br = Engine(dest, merge_actors=1)
    assert br.lake.num_partitions == 8  # layout inherited from manifest
    pd.testing.assert_frame_equal(
        br.read_lake_pandas(), src.read_lake_pandas(), check_dtype=False
    )
    # the clone really is inode-shared (no data copied)
    frag = br.lake.live_fragment_paths()[0]
    assert os.stat(frag).st_nlink >= 2

    # diverge: the branch catches up on the FULL log (committed prefix
    # rounds are fenced, the suffix applies); the source must not move
    before = src.read_lake_pandas()
    br.apply_log(log)
    assert_matches_oracle(br, log)
    pd.testing.assert_frame_equal(
        src.read_lake_pandas(), before, check_dtype=False
    )
    assert_matches_oracle(src, part)

    # maintenance on either side stays isolated: compact + vacuum the
    # branch, then vacuum the source — both still read correctly
    br.compact()
    br.lake.vacuum()
    assert_matches_oracle(br, log)
    assert_matches_oracle(src, part)
    src.lake.vacuum()
    assert_matches_oracle(br, log)

    # guards: a dest that is already a lake refuses; so does an
    # out-of-window branch point
    with pytest.raises(ValueError, match="already a lake"):
        src.lake.branch(dest)
    with pytest.raises((ValueError, KeyError)):
        src.lake.branch(str(tmp_path / "b2"), round_id="r-nope")
    src.close(); br.close()


def test_mirror_reorg_repair(ray_session, tmp_path, make_lake):
    """Reorg-safe replication: when a source rollback erases the mirror
    consumer's anchor, replicate_lake(on_rollback="repair") rolls the
    replica back to the newest window boundary the source still vouches
    for (via the mirror journal), re-anchors the consumer, and resumes —
    converging to the source's canonical state with no manual rebuild."""
    import shutil

    from raycdc.exporters import replicate_lake

    spec = gen.GenSpec(seed=71, n_convs=100, mean_turns=6, n_epochs=6)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    files = sorted(glob.glob(os.path.join(log, "changes-*.parquet")))

    def prefix(n):
        d = str(tmp_path / f"log{n}")
        if not os.path.exists(d):
            os.makedirs(d)
            for p in files[:n]:
                shutil.copy(p, d)
        return d

    src = make_lake(num_partitions=8, merge_actors=1)
    dst = Engine(str(tmp_path / "replica"), num_partitions=4, merge_actors=1)

    # three incremental windows → three journal entries
    for n in (2, 4, 6):
        src.apply_log(prefix(n))
        assert replicate_lake(src, dst, consumer="m")["windows"] == 1

    def assert_mirrored():
        want = src.read_lake_pandas().drop(columns=["seq"])
        got = dst.read_lake_pandas().drop(columns=["seq"])
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False
        )

    assert_mirrored()

    # reorg: source rolls back its last rounds (past the consumer anchor)
    rounds = src.lake.manifest["committed_rounds"]
    boundary = int(rounds[len(rounds) - 3]["cursor_hi"])
    src.lake.rollback(boundary)

    # without repair: the erased anchor surfaces, nothing is mutated
    with pytest.raises(KeyError):
        replicate_lake(src, dst, consumer="m")

    out = replicate_lake(src, dst, consumer="m", on_rollback="repair")
    assert "repaired" in out
    assert_mirrored()

    # canonical history replays on the source; plain replication resumes
    src.apply_log(log)
    replicate_lake(src, dst, consumer="m")
    assert_mirrored()
    src.close(); dst.close()


def test_lake_identity_stable_across_mutations(ray_session, tmp_path,
                                               make_lake):
    """The replica fence and branch lineage trust ``lake_id`` — it is
    stamped at the first commit_round (writer path, no reader ever locks
    to learn it) and must survive every later mutation: more rounds,
    rollback, compaction, reshard."""
    spec = gen.GenSpec(seed=95, n_convs=60, mean_turns=5, n_epochs=4)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=4, merge_actors=1)
    eng.apply_log(log, epochs_per_round=1)
    lid = eng.lake.manifest.get("lake_id")
    assert lid, "first commit must stamp an identity"

    rounds = eng.lake.manifest["committed_rounds"]
    eng.lake.rollback(int(rounds[-2]["cursor_hi"]))
    assert eng.lake.manifest["lake_id"] == lid
    eng.apply_log(log, epochs_per_round=1)  # canonical tail replays
    assert eng.lake.manifest["lake_id"] == lid
    eng.compact()
    assert eng.lake.manifest["lake_id"] == lid
    eng.reshard(8)
    assert eng.lake.manifest["lake_id"] == lid
    # a fresh handle reads the same identity from disk
    from raycdc.lake import Lake

    assert Lake(eng.lake.root).manifest["lake_id"] == lid
    eng.close()


def test_replica_offset_dst_fence(ray_session, tmp_path, make_lake):
    """The anchored-consumer/fresh-dst fence: re-pointing an existing
    consumer name at a destination that never received the bootstrap
    window must raise (it would otherwise silently ship only post-offset
    windows — a permanently incomplete replica), and a journal fed from a
    DIFFERENT source lake must be refused regardless of offset state."""
    from raycdc.exporters import replicate_lake

    spec = gen.GenSpec(seed=91, n_convs=60, mean_turns=5, n_epochs=4)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)

    src = make_lake(num_partitions=4, merge_actors=1)
    src.apply_log(log)
    dst = Engine(str(tmp_path / "replica"), num_partitions=4, merge_actors=1)
    assert replicate_lake(src, dst, consumer="m")["windows"] == 1
    dst.close()

    # same consumer name, brand-new dst: anchored offset + no journal
    dst2 = Engine(str(tmp_path / "replica2"), num_partitions=4,
                  merge_actors=1)
    with pytest.raises(ValueError, match="bootstrap window"):
        replicate_lake(src, dst2, consumer="m")
    # a NEW consumer name bootstraps the new dst fine
    assert replicate_lake(src, dst2, consumer="m2")["windows"] == 1
    src.close()

    # a second, unrelated source feeding the same dst+consumer: the
    # journal's src_lake stamp refuses the interleave even though the
    # second source's consumer offset is fresh (bootstrap-eligible)
    spec2 = gen.GenSpec(seed=92, n_convs=40, mean_turns=4, n_epochs=2)
    log2 = str(tmp_path / "log2")
    gen.write_change_log(spec2, log2)
    src2 = Engine(str(tmp_path / "lake2"), num_partitions=4, merge_actors=1)
    src2.apply_log(log2)
    with pytest.raises(ValueError, match="different source lake"):
        replicate_lake(src2, dst2, consumer="m2")
    src2.close(); dst2.close()


def test_sharded_replica_empty_windows_not_wedged(ray_session, tmp_path,
                                                  make_lake):
    """A key-sharded replica whose windows land ZERO rows commits no dst
    round but its journal advances — the anchored-consumer fence must
    trust the JOURNAL, not dst's round count, or the replica wedges
    permanently after its first empty window."""
    from raycdc.exporters import replicate_lake

    spec = gen.GenSpec(seed=96, n_convs=30, mean_turns=4, n_epochs=2)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    src = make_lake(num_partitions=4, merge_actors=1)
    src.apply_log(log)
    dst = Engine(str(tmp_path / "rep"), num_partitions=4, merge_actors=1)
    # a shard modulus far above the conv count guarantees SOME shard gets
    # zero keys; find one empirically
    import numpy as _np
    import pyarrow as _pa

    from raycdc import partition as _P

    keys = src.read_lake_pandas()["conv_id"].unique()
    hashes = _P.hash_conv(_pa.array(keys), 2) % _np.uint64(64)
    empty_shard = next(i for i in range(64) if i not in set(int(h) for h in hashes))
    out1 = replicate_lake(src, dst, consumer="s", shard=(empty_shard, 64))
    assert out1["windows"] == 1
    assert not dst.lake.manifest["committed_rounds"]  # nothing landed
    # second tick: previously raised "never received the bootstrap window"
    out2 = replicate_lake(src, dst, consumer="s", shard=(empty_shard, 64))
    assert out2["windows"] == 0  # caught up, no error
    src.close(); dst.close()


def test_ranged_readers_fully_pruned_return_empty(ray_session, tmp_path,
                                                  make_lake):
    """A cursor-range probe beyond the exported data prunes EVERY file —
    the readers must return an empty dataset, not crash on read_*([])."""
    from raycdc.exporters import export_ranged, read_ranged_csv

    spec = gen.GenSpec(seed=97, n_convs=20, mean_turns=4, n_epochs=2)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=4, merge_actors=1)
    eng.apply_log(log)
    out = str(tmp_path / "csv")
    export_ranged(eng.read_lake(include_system=True), out, fmt="csv")
    assert read_ranged_csv(out, lo=10**9).count() == 0
    eng.close()


def test_branch_failure_leaves_no_partial_dest(tmp_path, make_lake,
                                               ray_session):
    """Lake.branch must not leave a half-populated destination behind when
    the link loop fails mid-way (the concurrent-vacuum race): the dest is
    removed so a retry starts clean."""
    spec = gen.GenSpec(seed=93, n_convs=40, mean_turns=4, n_epochs=2)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=4, merge_actors=1)
    eng.apply_log(log)

    # simulate a fragment vanishing mid-branch (vacuum in another process)
    victim = eng.lake.live_fragment_paths()[0]
    os.remove(victim)
    dest = str(tmp_path / "branch")
    with pytest.raises(FileNotFoundError):
        eng.lake.branch(dest)
    assert not os.path.exists(dest), "partial branch dest must be cleaned up"
    eng.close()


def test_driver_kill_mid_replay_resumes(tmp_path):
    """Crash-ANYWHERE resume: SIGKILL the whole driver process group while
    rounds are committing, then rerun the same replay on the surviving
    lake — the epoch fence must skip whatever committed, the interrupted
    round must replay idempotently, and the final state must equal the
    single-shot oracle. (Actor-death tests cover merger loss inside a
    live driver; this covers losing the driver itself mid-commit.)"""
    import signal
    import subprocess
    import sys as _sys
    import textwrap

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = gen.GenSpec(seed=97, n_convs=400, mean_turns=8, n_epochs=8)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    lake = str(tmp_path / "lake")
    manifest = os.path.join(lake, "manifest.json")

    script = textwrap.dedent(f"""
        import ray, sys
        sys.path.insert(0, {repo!r})
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
        from raycdc.engine import Engine
        eng = Engine({lake!r}, num_partitions=8, merge_actors=1)
        eng.apply_log({log!r}, epochs_per_round=1)  # 8 rounds, killable
        eng.close(); ray.shutdown()
    """)
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    proc = subprocess.Popen(
        [_sys.executable, "-c", script], env=env, cwd=repo,
        start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    # wait for the first committed round, then kill the whole group
    import json as _json
    import time as _time

    deadline = _time.time() + 180
    committed, killed = 0, False
    while _time.time() < deadline:
        if proc.poll() is not None:
            break
        try:
            with open(manifest) as f:
                committed = len(_json.load(f).get("committed_rounds", []))
        except (FileNotFoundError, ValueError):
            committed = 0
        if 1 <= committed < 8:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                break  # finished in the race window; assert reports it
            killed = True
            break
        _time.sleep(0.05)
    proc.wait(timeout=60)
    # the kill must land MID-replay (some rounds committed, some not) —
    # if the subprocess ever finishes before the 50 ms poll can catch an
    # intermediate manifest, slow the corpus down instead of weakening this
    assert killed and 1 <= committed < 8, (killed, committed)

    # the writer lock of the killed process is stale — a fresh process
    # takes it; within THIS process, clear any registration first
    from raycdc.lake import Lake

    Lake.release_writer_lock(lake)
    eng = Engine(lake, num_partitions=8, merge_actors=1)
    results = eng.apply_log(log, epochs_per_round=1)
    assert any(r.get("skipped") for r in results), "fence skipped nothing"
    assert_matches_oracle(eng, log)
    eng.close()


def test_replay_under_object_store_pressure(tmp_path):
    """The 100-TB design leans on Ray's object store SPILLING when the
    working set exceeds it — make that a measured fact, not an assumption:
    a ~1M-event replay in a fresh subprocess session whose plasma store is
    capped far below the working set must complete AND stay oracle-correct
    (scripts/stress.py's DuckDB folded-replay spot check runs inside).

    Subprocess because object_store_memory is fixed at ray.init and the
    suite shares one session."""
    import json as _json
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["RAYCDC_OBJECT_STORE_MB"] = "256"
    env["PYTHONPATH"] = repo
    proc = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts", "stress.py"),
         "60000", "4"],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith('{"metric"')]
    assert line, proc.stdout[-2000:]
    out = _json.loads(line[-1])
    assert out["events"] > 1_000_000
    assert out["spot_check_rows"] > 0  # oracle match asserted in-process
    assert out["object_store_mb_cap"] == 256


def test_adaptive_round_sizing(ray_session, tmp_path, make_lake):
    """Adaptive round sizing (halve on retriable failure, regrow after a
    success streak): a transient failure at the full round size splits the
    round; subsequent successes grow the size back; the final lake state
    still matches the SQL oracle; per-epoch fencing means a plain resume
    afterwards applies nothing."""
    import types

    spec = gen.GenSpec(seed=83, n_convs=80, mean_turns=5, n_epochs=8)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)

    eng = make_lake(num_partitions=8, merge_actors=1)
    real = eng.apply_round
    calls = []

    def flaky(self, files, round_id, audit=None):
        calls.append((round_id, len(files)))
        # fail the FIRST multi-epoch round with a retriable error
        if len(files) > 1 and not any(c[1] == 1 for c in calls):
            raise TimeoutError("injected transient failure")
        return real(files, round_id, audit=audit)

    eng.apply_round = types.MethodType(flaky, eng)
    out = eng.apply_log(log, epochs_per_round=4, adaptive=True)
    eng.apply_round = real

    sizes = [n for _, n in calls]
    assert sizes[0] == 4          # tried the full size first
    assert 1 in sizes or 2 in sizes  # halved after the injected failure
    assert max(sizes[1:]) >= 2    # and grew back after the streak
    assert sum(1 for r in out if not r.get("skipped")) >= 3
    assert_matches_oracle(eng, log)

    # regrouped-resume fence: a plain (non-adaptive) resume with the
    # ORIGINAL grouping plans different round ids over the same epochs —
    # every group is fully processed, so nothing applies
    again = eng.apply_log(log, epochs_per_round=4)
    assert all(r.get("skipped") for r in again)
    eng.close()


def test_branch_merge_back_promotion(ray_session, tmp_path, make_lake):
    """Branch → diverge → promote: a branch that caught up on the full
    log merges back into a source still pinned at the branch point, and
    the source then matches the full-log oracle; re-merging the unchanged
    branch is a state no-op; a branch with no shared history refuses."""
    import shutil

    spec = gen.GenSpec(seed=67, n_convs=90, mean_turns=5, n_epochs=6)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    part = str(tmp_path / "log3")
    os.makedirs(part)
    for p in sorted(glob.glob(os.path.join(log, "changes-*.parquet")))[:3]:
        shutil.copy(p, part)

    src = make_lake(num_partitions=8, merge_actors=1)
    src.apply_log(part)
    dest = str(tmp_path / "branch")
    src.lake.branch(dest)
    br = Engine(dest, merge_actors=1)
    br.apply_log(log)  # branch diverges: catches up on the full log
    assert_matches_oracle(br, log)

    out = src.merge_branch(br)
    assert out["merge_base"] is not None and not out.get("skipped")
    assert_matches_oracle(src, log)  # promotion folded the delta in

    # re-merge: the branch did not move, delta re-applies as exact-dup
    # no-ops — state unchanged
    before = src.read_lake_pandas()
    src.merge_branch(br)
    pd.testing.assert_frame_equal(
        src.read_lake_pandas(), before, check_dtype=False
    )

    # unrelated lake (different generated log → different cursor
    # boundaries even at the same round ids): no shared history
    olog = str(tmp_path / "olog")
    gen.write_change_log(
        gen.GenSpec(seed=68, n_convs=40, mean_turns=3, n_epochs=2), olog
    )
    other = Engine(str(tmp_path / "other"), num_partitions=4, merge_actors=1)
    other.apply_log(olog)
    with pytest.raises(ValueError, match="no common committed history"):
        other.merge_branch(br)
    src.close(); br.close(); other.close()


def test_branch_merge_conflict_lww(ray_session, tmp_path, make_lake):
    """Promotion under TRUE divergence: branch and source both edit the
    same key after the branch point — the merge resolves by cursor LWW
    (source's newer edit survives), while branch-only keys flow in."""
    import pyarrow as pa
    import ray

    spec = gen.GenSpec(seed=31, n_convs=50, mean_turns=4, n_epochs=3)
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    src = make_lake(num_partitions=8, merge_actors=1)
    src.apply_log(log)
    dest = str(tmp_path / "branch")
    src.lake.branch(dest)
    br = Engine(dest, merge_actors=1)

    row = src.read_lake_pandas().iloc[0]
    base = int(src.lake.last_cursor())

    def ev(conv_id, turn_idx, text, cursor, seq):
        return pa.table(
            {
                "op": pa.array(["insert"], pa.string()),
                "conv_id": pa.array([conv_id], pa.string()),
                "turn_idx": pa.array([int(turn_idx)], pa.int32()),
                "role": pa.array(["user"], pa.string()),
                "text": pa.array([text], pa.string()),
                "tool": pa.array([None], pa.string()),
                "ts": pa.array([row["ts"].to_pydatetime()],
                               pa.timestamp("us")),
                "cursor": pa.array([cursor], pa.int64()),
                "seq": pa.array([seq], pa.int32()),
            }
        )

    key = (row["conv_id"], int(row["turn_idx"]))
    # branch edits the shared key (cursor base+1) and adds a new key
    br.apply_dataset(ray.data.from_arrow(pa.concat_tables([
        ev(key[0], key[1], "branch-edit", base + 1, 0),
        ev("conv-999999", 0, "branch-new", base + 1, 1),
    ])))
    # source edits the SAME key with a NEWER cursor
    src.apply_dataset(ray.data.from_arrow(
        ev(key[0], key[1], "src-edit", base + 2, 0)
    ))

    src.merge_branch(br)
    final = src.read_lake_pandas().set_index(["conv_id", "turn_idx"])
    assert final.loc[key, "text"] == "src-edit"  # newer cursor won
    assert final.loc[("conv-999999", 0), "text"] == "branch-new"
    src.close(); br.close()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_adaptive_equivalence_under_random_failures(
    ray_session, tmp_path, make_lake, seed
):
    """Determinism under failure-schedule chaos: whatever pattern of
    transient failures the adaptive executor sees (seeded random, ~40% of
    multi-epoch rounds), the final lake equals the SQL oracle — i.e. the
    halve/regrow path never changes WHAT is committed, only how it is
    grouped."""
    import random
    import types

    spec = gen.GenSpec(
        seed=90 + seed, n_convs=70, mean_turns=5, n_epochs=8,
        rollback_epochs=(3,),
    )
    log = str(tmp_path / "log")
    gen.write_change_log(spec, log)
    eng = make_lake(num_partitions=8, merge_actors=1)
    rng = random.Random(seed)
    real = eng.apply_round

    def flaky(self, files, round_id, audit=None):
        if len(files) > 1 and rng.random() < 0.4:
            raise TimeoutError("chaos")
        return real(files, round_id, audit=audit)

    eng.apply_round = types.MethodType(flaky, eng)
    eng.apply_log(log, epochs_per_round=4, adaptive=True)
    eng.apply_round = real
    assert_matches_oracle(eng, log)
    eng.close()
