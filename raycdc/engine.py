"""The Ray CDC pipeline: change-log Parquet → normalized Arrow batches →
hash-partitioned actor exchange → incremental sorted-merge → committed
lake round.

Replaces the reference's JobScheduler + StreamController + PostgresItemExporter
triple (``indexer/controller/stream_controller.py:50-161``,
``indexer/controller/scheduler/job_scheduler.py:260-300``,
``indexer/exporters/postgres_item_exporter.py:37-133`` in /root/reference).

Default ("direct") exchange, per commit round:

    _push_shard tasks (one per epoch shard file)   # parallel raw Ray tasks:
      read → normalize/evolve → derive tables       #   zero-copy Arrow slices
      → owner-contiguous slices → MergerActor pool  #   fire-and-forget sends
    MergerActor.finalize_round (per actor)          # count barrier, then per
      touched-keys incremental merge vs cached runs #   partition: O(round),
      → base/delta fragment write (tmp+rename)      #   not O(lake)
    driver commits the manifest                     # epoch fence, one writer

Why not ``groupby(part).map_groups`` for the exchange: a micro-batch CDC
round is latency-sensitive and Ray Data's general sort/hash shuffle costs
seconds of fixed sampling/barrier work per round (measured); the fallback
``exchange="groupby"`` path (also used by the salted skew pre-fold) keeps
that shape for generality. Rounds pipeline: push of round N+1 overlaps the
pool's finalize of round N; commit is the only barrier. Merger death is
detected (push liveness probe / finalize gather) and the round replayed on
a rebuilt pool — deterministic fragment names make replay idempotent.

Rounds are groups of ``epochs_per_round`` epoch files (Hemera's
``--block-batch-size`` analog); a rollback epoch forces a barrier and is
applied as a manifest restore from the undo buffer; an uncommitted epoch
whose cursor range re-enters applied territory triggers implicit reorg
DETECTION (consensus-check analog).

NOTE: never calls ``ray.init`` — the caller owns the Ray session.
"""

from __future__ import annotations

import glob
import json
import os
import re
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from raycdc import lake as L
from raycdc import merge as M
from raycdc import partition as P
from raycdc import schema as S

_FILE_RE = re.compile(r"changes-(\d+)-(\d+)-(\d+)(?:-s(\d+))?\.parquet$")


class AuditRejectedError(RuntimeError):
    """A write-audit-publish audit rejected a staged round. Nothing was
    committed: the staged fragment files were deleted and merger caches
    dropped, so a later replay of the same round starts clean."""


class AuditContext:
    """What a write-audit-publish ``audit`` callback sees for one staged
    round. The round's fragments are ON DISK but the manifest does not
    reference them yet — the natural stage/publish gap of the
    manifest-swap commit (the reference's two-phase export-then-checkpoint,
    ``indexer/controller/stream_controller.py:96-120`` in /root/reference;
    Iceberg's WAP pattern). ``metrics`` carries the round's counters
    (n_events, n_rows, n_live, touched_parts, wall_sec);
    :meth:`staged_read` returns the WOULD-BE published table state,
    :meth:`committed_read` the still-live one — audits diff the two.

    Contract: the audit runs on the DRIVER between fragment write and
    manifest commit; return False or raise to reject (the engine raises
    :class:`AuditRejectedError` and discards the staged fragments), any
    other return publishes."""

    def __init__(self, engine, round_id, files, schema, staged_parts, metrics):
        self._engine = engine
        self.round_id = round_id
        self.files = files
        self._schema = schema
        self._staged_parts = staged_parts  # [(part, kind)] as written
        self.metrics = metrics

    def fragment_paths(self) -> list:
        """Absolute paths of this round's staged fragment files."""
        return [
            self._engine.lake.fragment_abspath(p, self.round_id, k)
            for p, k in self._staged_parts
        ]

    def committed_read(self, **kw):
        """The live (pre-publish) table state — ``Engine.read_lake``."""
        return self._engine.read_lake(**kw)

    def staged_read(self, table=None, columns=None, include_system=False):
        """The table state AS IF this round were published: the committed
        partition map overlaid with the round's staged fragments, served
        through the same per-partition fold as any delta-bearing read."""
        eng = self._engine
        t_idx = eng._table_index(table)
        nparts = eng.lake.num_partitions
        prange = (t_idx * nparts, (t_idx + 1) * nparts)
        sm = eng.lake.live_state_map(prange)
        staged_in_range = []
        for p, kind in self._staged_parts:
            if not (prange[0] <= int(p) < prange[1]):
                continue
            frag = eng.lake.fragment_abspath(int(p), self.round_id, kind)
            staged_in_range.append(frag)
            if kind == "base":
                sm[int(p)] = {"base": frag, "deltas": []}
            else:
                ent = sm.get(int(p)) or {"base": None, "deltas": []}
                sm[int(p)] = {
                    "base": ent["base"],
                    "deltas": list(ent["deltas"]) + [frag],
                }
        schema = self._schema if t_idx == 0 else eng._table_schema(t_idx)
        if schema is None and staged_in_range:
            # first-ever round of a derived table: no manifest schema yet.
            # Fragment files carry part AND the _deleted tombstone flag;
            # both must be stripped to reconstruct the change schema, else
            # fragment_schema_for appends a SECOND _deleted downstream and
            # the fold crashes on the duplicate column.
            schema = pa.schema(
                [
                    f
                    for f in pq.read_schema(staged_in_range[0])
                    if f.name not in ("part", M.DELETED_COL)
                ]
            )
        key_cols = list(eng.tables[t_idx].key_cols)
        return eng._read_lake_folded(sm, schema, columns, include_system, key_cols)


def _limit_arrow_threads(n: int = 2) -> None:
    """Cap Arrow's per-process thread pools inside Ray workers/actors.
    Every Ray worker process otherwise spawns an arrow pool sized to ALL
    machine cores — 19 merger actors × 32 arrow threads oversubscribes a
    32-core node ~20× and was measured inflating per-op wall times ~5-10×
    at high parallelism. Each worker has 1 logical CPU; give it that."""
    try:
        if pa.cpu_count() > n:
            pa.set_cpu_count(n)
        if pa.io_thread_count() > n:
            pa.set_io_thread_count(n)
    except Exception:
        pass


def discover_epoch_files(log_dir: str) -> list[dict]:
    """Parse ``changes-{epoch}-{lo}-{hi}[-sNN].parquet`` names and group
    shards per epoch; file-level range pruning straight from the filename,
    like the reference's CSV source
    (``indexer/jobs/source_job/csv_source_job.py:34-108``)."""
    epochs: dict = {}
    for path in sorted(glob.glob(os.path.join(log_dir, "changes-*.parquet"))):
        m = _FILE_RE.search(path)
        if not m:
            continue
        e = int(m.group(1))
        ent = epochs.setdefault(
            e,
            {"epoch": e, "paths": [], "cursor_lo": 1 << 62, "cursor_hi": 0},
        )
        ent["paths"].append(path)
        ent["cursor_lo"] = min(ent["cursor_lo"], int(m.group(2)))
        ent["cursor_hi"] = max(ent["cursor_hi"], int(m.group(3)))
    return [epochs[e] for e in sorted(epochs)]


# sniff memo: log shard files are immutable once published (atomic rename),
# so (path, size, mtime_ns) fully keys the answer. Without this, the
# column-scan fallback below runs over the WHOLE ready prefix on every
# stream.follow re-plan: "delete" < "rollback" < "update" lexicographically,
# so any mixed-op row group's stats are inconclusive — i.e. almost all of
# them — degrading the "footer-only" sniff to O(total log rows) per poll.
_ROLLBACK_SNIFF_MEMO: dict = {}


def _file_has_rollback(path: str) -> bool:
    """Cheap rollback sniff: memoized per immutable file; parquet column
    statistics on ``op`` first (footer-only read), column scan only when
    stats are inconclusive."""
    try:
        st_f = os.stat(path)
        memo_key = (path, st_f.st_size, st_f.st_mtime_ns)
    except OSError:
        memo_key = None
    if memo_key is not None and memo_key in _ROLLBACK_SNIFF_MEMO:
        return _ROLLBACK_SNIFF_MEMO[memo_key]
    out = _file_has_rollback_uncached(path)
    if memo_key is not None:
        _ROLLBACK_SNIFF_MEMO[memo_key] = out
    return out


def _file_has_rollback_uncached(path: str) -> bool:
    f = pq.ParquetFile(path)
    idx = f.schema_arrow.get_field_index("op")
    conclusive = True
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            conclusive = False
            break
        if st.min <= "rollback" <= st.max:
            conclusive = False  # possible hit → must scan
            break
    if conclusive:
        return False
    ops = f.read(columns=["op"]).column("op")
    import pyarrow.compute as pc

    return pc.any(pc.equal(ops, "rollback")).as_py()


def _read_rollback_cursor(paths) -> int:
    """Rollback target cursor from an epoch's shard file(s). Detection
    scans EVERY shard, so extraction must too — a rollback row sitting in
    a later shard would otherwise raise IndexError."""
    if isinstance(paths, str):
        paths = [paths]
    for path in paths:
        t = pq.read_table(path, columns=["op", "rollback_to_cursor"])
        df = t.to_pandas()
        vals = df.loc[df["op"] == "rollback", "rollback_to_cursor"]
        if len(vals):
            return int(vals.iloc[0])
    raise ValueError(f"no rollback row in {paths!r}")


def plan_rounds(
    files: list[dict],
    epochs_per_round: int,
    processed: set,
    last_cursor: int,
) -> list[tuple]:
    """Turn an ordered list of discovered epoch entries into an execution
    plan of ``("round", group, round_id)`` and ``("rollback", target, epoch)``
    steps — pure metadata planning (footer reads only), separated from
    execution so the stream controller and tests can inspect plans.

    Planning rules:

    - an epoch carrying an explicit rollback event becomes its own
      ``("rollback", target_cursor, epoch)`` step, and a round flush is
      forced before it (a rollback target must be a committed round
      boundary — mirrors Hemera rolling back whole block ranges);
    - implicit reorg DETECTION (the reference's parent-hash consensus
      check, ``indexer/controller/stream_controller.py`` +
      ``indexer/jobs/check_block_consensus_job.py:30-79``): a fresh epoch
      whose cursor range re-enters already-applied territory is a
      re-emitted canonical chain without an explicit rollback event — the
      rollback it implies is injected. ``sim_hi`` tracks the high-water
      cursor as the plan would leave it;
    - schema evolution forces a round boundary: a round's files share one
      change schema (the evolved schema commits with its round);
    - groups close at ``epochs_per_round`` or at a rollback target cursor
      (so the target lands exactly on a round boundary).
    """
    rollback_epochs = {
        f["epoch"]
        for f in files
        if any(_file_has_rollback(p) for p in f["paths"])
    }
    explicit_targets = {
        f["epoch"]: _read_rollback_cursor(f["paths"])
        for f in files
        if f["epoch"] in rollback_epochs
    }
    rollback_targets = set(explicit_targets.values())
    # Pre-pass: IMPLIED (implicit-reorg) rollback targets. The grouping
    # rule below closes rounds at every rollback target so each target is
    # a committed round boundary when its rollback executes — an implied
    # target landing mid-round (epochs_per_round >= 2) would otherwise
    # make Lake.rollback raise "not a committed round boundary" and halt
    # the replay. The simulation mirrors the main loop's sim_hi exactly.
    sim = last_cursor
    for f in files:
        if f["epoch"] in rollback_epochs:
            sim = min(sim, explicit_targets[f["epoch"]])
            continue
        if f["epoch"] not in processed and f["cursor_lo"] <= sim:
            rollback_targets.add(f["cursor_lo"] - 1)
            sim = f["cursor_lo"] - 1
        sim = max(sim, f["cursor_hi"])
    plan: list = []
    group: list[dict] = []

    def flush():
        if group:
            rid = f"r{group[0]['epoch']:06d}-{group[-1]['epoch']:06d}"
            plan.append(("round", list(group), rid))
            group.clear()

    sim_hi = last_cursor
    for f in files:
        if f["epoch"] in rollback_epochs:
            flush()
            target = explicit_targets[f["epoch"]]
            plan.append(("rollback", target, f["epoch"]))
            sim_hi = min(sim_hi, target)
            continue
        if f["epoch"] not in processed and f["cursor_lo"] <= sim_hi:
            flush()
            plan.append(("rollback", f["cursor_lo"] - 1, f["epoch"]))
            sim_hi = f["cursor_lo"] - 1
        if group and not pq.read_schema(f["paths"][0]).equals(
            pq.read_schema(group[0]["paths"][0])
        ):
            flush()
        group.append(f)
        sim_hi = max(sim_hi, f["cursor_hi"])
        if len(group) >= epochs_per_round or f["cursor_hi"] in rollback_targets:
            flush()
    flush()
    return plan


class _Normalize:
    """Stateless per-batch transform: conform every batch to the round's
    unified change schema (schema evolution is per batch, not per epoch —
    SURVEY.md §7.5.6) and assign the home partition.

    ``error_policy="record"`` diverts malformed rows to the lake's buffered
    error sink (raycdc.errors) instead of failing the round — the
    reference's ExceptionRecorder/FAST-mode behavior."""

    def __init__(
        self,
        schema_str: str,
        num_partitions: int,
        error_policy: str = "fail",
        lake_root: str | None = None,
        round_id: str = "",
        tables: list | None = None,
        hash_version: int = P.HASH_VERSION_DEFAULT,
    ):
        self.schema = L._schema_from_str(schema_str)
        self.num_partitions = num_partitions
        self.error_policy = error_policy
        self.lake_root = lake_root
        self.round_id = round_id
        self.hash_version = hash_version
        # Dataset-path multi-table fan-out: derived tables' change rows are
        # emitted inline (conformed to the SAME round schema so the union
        # is one homogeneous Dataset), namespaced at parts [i*P, (i+1)*P).
        # The raw-task path derives in _push_shard instead.
        self.tables = tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from raycdc import errors as E

        if self.error_policy == "record":
            batch, bad = E.split_bad_rows(batch)
            if bad.num_rows:
                E.record_bad_rows(
                    self.lake_root, self.round_id, bad, "malformed_change_row"
                )
        else:
            from raycdc.errors import VALID_OPS

            ok = pc.is_in(
                batch.column("op"),
                value_set=pa.array(list(VALID_OPS)),
            )
            if not pc.all(ok).as_py():
                bad = batch.filter(pc.invert(ok)).column("op").to_pylist()[:3]
                raise ValueError(f"unexpected op(s) in merge round: {bad}")
        batch = S.conform(batch, self.schema)
        part = P.assign_part(
            batch.column("conv_id"), self.num_partitions, self.hash_version
        )
        batch = batch.append_column("part", pa.array(part, pa.int32()))
        if not self.tables or len(self.tables) <= 1:
            return batch
        # derive from the RAW normalized batch, never from pre-folded
        # deltas: a folded turn row carries its whole-round last-non-null
        # columns at the round's max cursor, which re-orders cross-turn
        # patch precedence in column-timeline tables like conv_latest
        # (e.g. turn A's insert-filled column at A's late cursor would
        # outrank turn B's later genuine write)
        outs = [batch]
        for t_idx, spec in enumerate(self.tables[1:], start=1):
            d = S.conform(spec.derive(batch), self.schema)
            pcols = spec.part_cols or (spec.key_cols[0],)
            dpart = (
                P.assign_part_cols(
                    [d.column(c) for c in pcols],
                    self.num_partitions,
                    self.hash_version,
                )
                + t_idx * self.num_partitions
            )
            outs.append(d.append_column("part", pa.array(dpart, pa.int32())))
        return pa.concat_tables(outs, promote_options="permissive")


class MergeWorker:
    """Actor-pool merge stage: one call merges one partition's events into
    its live fragment and writes the round's new fragment (tmp+rename).
    Constructed once per round per actor — fragment map, schemas and payload
    columns are set up in ``__init__`` (once per actor), not per group."""

    def __init__(
        self,
        live_map: dict,
        lake_root: str,
        round_id: str,
        schema_str: str,
        num_partitions: int,
        table_keys: dict | None = None,
    ):
        self.live_map = live_map
        self.lake_root = lake_root
        self.round_id = round_id
        self.change_schema = L._schema_from_str(schema_str)
        self.num_partitions = num_partitions
        # per logical table (part // P): key columns → payload + fragment
        # schema. All Dataset-path rows are conformed to the ROUND schema
        # (see _Normalize fan-out), so each table's payload is the round
        # schema minus its own keys and the system columns.
        if not table_keys:
            table_keys = {0: tuple(S.KEY_COLS)}
        names = [f.name for f in self.change_schema]
        self.per_table = {
            t: (
                list(keys),
                M.payload_columns(names, key_cols=list(keys)),
                M.fragment_schema_for(self.change_schema, key_cols=list(keys)),
            )
            for t, keys in table_keys.items()
        }

    def _frag_path(self, part: int) -> str:
        return os.path.join(
            self.lake_root,
            L.FRAGMENT_DIR,
            f"part={part:05d}",
            f"base-{self.round_id}.parquet",
        )

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        part = int(group.column("part")[0].as_py())
        t_idx = part // self.num_partitions
        key_cols, payload, frag_schema = self.per_table[t_idx]

        ent = self.live_map.get(part) or {"base": None, "deltas": []}
        frames = [
            S.conform(pq.read_table(p), frag_schema)
            for p in ([ent["base"]] if ent["base"] else []) + list(ent["deltas"])
        ]
        state = M.fold_fragments_table(frames, payload, key_cols=key_cols)

        t0 = time.perf_counter()
        out = M.merge_partition_table(state, group, payload, key_cols=key_cols)
        merged_sec = time.perf_counter() - t0

        out_tbl = S.conform(out, frag_schema)
        path = self._frag_path(part)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(out_tbl, tmp)
        os.replace(tmp, path)

        n_live = out_tbl.num_rows - int(
            pc.sum(out_tbl.column(M.DELETED_COL)).as_py() or 0
        )
        max_cursor = (
            int(pc.max(out_tbl.column("cursor")).as_py()) if out_tbl.num_rows else 0
        )
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "kind": pa.array(["base"], pa.string()),  # groupby path compacts
                "n_events": pa.array([group.num_rows], pa.int64()),
                "n_rows": pa.array([out_tbl.num_rows], pa.int64()),
                "n_live": pa.array([n_live], pa.int64()),
                "max_cursor": pa.array([max_cursor], pa.int64()),
                "merge_sec": pa.array([merged_sec], pa.float64()),
            }
        )


def _barrier_timeout() -> float:
    """Finalize count-barrier timeout (seconds). Env-tunable because the
    right value is a HOST property, not an engine one: this VM's shared
    hypervisor throttles memory bandwidth 4-5x under sibling load (see
    scripts/hostgauge.py), and a fixed 60 s that is generous on a quiet
    host starves on a degraded one. A barrier TimeoutError is retriable
    (_gather_with_recovery replays the round), so the default stays tight;
    CI/drivers on known-slow hosts raise RAYCDC_BARRIER_TIMEOUT instead of
    paying a retry."""
    return float(os.environ.get("RAYCDC_BARRIER_TIMEOUT", "120"))


# num_cpus=1: mergers respect the session's CPU budget (the N-vs-4N
# scaling evidence is only honest if the pool is bounded by num_cpus).
# max_concurrency=2: one thread can buffer round N+1's slices while the
# other merges round N (round pipelining); buffers are round-keyed so the
# two never touch the same state.
@ray.remote(num_cpus=1, max_restarts=0, max_concurrency=2)
class MergerActor:
    """Persistent stateful merger: owns partitions {p : p % K == actor_id}
    across ALL rounds (the north star's "stateful actor-pool merger").

    Per round it receives its partitions' change slices directly from the
    normalize ``map_batches`` stage (zero-copy Arrow through the object
    store — no sort/shuffle barrier), then sorted-merges each owned
    partition against its live fragment and writes the round's fragments.

    Why not ``groupby(part).map_groups``: a micro-batch CDC round is
    latency-sensitive; Ray Data's general sort/hash shuffle costs multiple
    seconds of fixed sampling/barrier/actor-startup per round (measured),
    dwarfing the sub-second merge compute. A fixed-partition bucket
    exchange needs none of that. The Dataset API still carries the scan +
    normalize; this actor is the "stateful stage" the Dataset feeds.

    Exactly-once under retries: a re-executed push task re-sends identical
    event slices; the merge kernel drops exact ``(key, cursor, seq)``
    re-deliveries, so duplicated pushes are harmless. An actor death fails
    the round before commit; the engine recreates the pool and replays the
    round (fragment writes are deterministic → idempotent).

    Fragment cache: keeps its partitions' last-written fragments in memory
    up to ``cache_bytes`` (LRU), avoiding a Parquet read-back per round —
    the analog of the reference's in-process token cache
    (``indexer/controller/scheduler/job_scheduler.py:98-111``). Evicted or
    invalidated (rollback) partitions fall back to reading the manifest's
    live fragment file.
    """

    def __init__(self, actor_id: int, lake_root: str, cache_bytes: int):
        _limit_arrow_threads()
        self.actor_id = actor_id
        self.lake_root = lake_root
        self.cache_bytes = cache_bytes
        self.buf: dict = {}  # round_id -> list of event tables (arrow)
        self.cache: dict = {}  # part -> pa.Table (live fragment)
        self.cache_order: list = []
        self._finalized: set = set()  # round ids already merged

    def add_events(self, round_id: str, tbl: pa.Table, table_idx: int = 0) -> int:
        if round_id in self._finalized:
            # a late duplicate slice (Ray-retried push landing after the
            # finalize quiescent window) must not RECREATE buf[round_id]:
            # nothing would ever pop it again — an unbounded leak on a
            # long-lived stream. Duplicates are idempotent by the merge
            # kernel's (key, cursor, seq) dedup, so dropping is safe.
            return 0
        r = self.buf.setdefault(round_id, {})  # round -> {table_idx: [tables]}
        r.setdefault(table_idx, []).append(tbl)  # append: GIL-atomic
        return tbl.num_rows

    def _slices(self, round_id: str) -> int:
        return sum(len(v) for v in self.buf.get(round_id, {}).values())

    def ping(self) -> bool:
        """Liveness probe: a dead actor raises RayActorError immediately,
        turning a silent lost-slice push into fast round replay."""
        return True

    def set_test_delay(self, sec: float) -> None:
        """Test hook: straggler injection — sleep this long at the start of
        every finalize merge phase (models node-level jitter)."""
        self._test_delay = float(sec)

    def drop_cache(self) -> None:
        self.cache.clear()
        self.cache_order.clear()
        getattr(self, "_cache_sizes", {}).clear()
        self.buf.clear()
        # a rollback legitimately REPLAYS previously-finalized round ids
        # (deterministic names) on the same actors — forget them so the
        # late-duplicate guard in add_events doesn't drop the replay
        self._finalized.clear()

    def _cache_put(self, part: int, entry: tuple, nbytes: int) -> None:
        self.cache[part] = entry
        self._cache_sizes = getattr(self, "_cache_sizes", {})
        self._cache_sizes[part] = nbytes
        if part in self.cache_order:
            self.cache_order.remove(part)
        self.cache_order.append(part)
        total = sum(self._cache_sizes.values())
        while total > self.cache_bytes and len(self.cache_order) > 1:
            old = self.cache_order.pop(0)
            total -= self._cache_sizes.pop(old)
            del self.cache[old]

    def finalize_round(
        self,
        round_id: str,
        schema_str: str,
        live_map: dict,
        expected_slices: int = -1,
        round_cursor_lo: int = 0,
        compact_every: int = 8,
        barrier_timeout: float = 60.0,
        tables_meta: dict | None = None,
    ) -> pd.DataFrame:
        import pyarrow.parquet as pq

        if expected_slices >= 0:
            # count barrier: push tasks fire-and-forget their slices (a
            # per-batch ack would serialize push behind this actor's merge
            # thread — measured as the pipeline critical path). Delivery
            # from live workers is reliable, so wait until the reported
            # slice count landed, then require a short quiescent window so
            # in-flight duplicates from a retried push task settle too
            # (duplicates themselves are dropped by the merge kernel's
            # exact (key, cursor, seq) dedup; strict per-batch acks remain
            # the fallback for exchange paths that can't assume this).
            deadline = time.monotonic() + barrier_timeout
            while self._slices(round_id) < expected_slices:
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"round {round_id}: {self._slices(round_id)}"
                        f"/{expected_slices} slices after {barrier_timeout}s"
                    )
                time.sleep(0.002)
            stable_since, count = time.monotonic(), self._slices(round_id)
            while time.monotonic() - stable_since < 0.05:
                time.sleep(0.01)
                now = self._slices(round_id)
                if now != count:
                    stable_since, count = time.monotonic(), now

        import pyarrow.compute as pc

        if getattr(self, "_test_delay", 0):
            time.sleep(self._test_delay)

        if tables_meta is None:
            tables_meta = {0: (schema_str, ("conv_id", "turn_idx"))}

        stats_rows = []
        round_buf = self.buf.pop(round_id, {})
        self._finalized.add(round_id)
        for t_idx in sorted(round_buf):
            bufs = round_buf[t_idx]
            if not bufs:
                continue
            t_schema_str, key_cols = tables_meta[t_idx]
            key_cols = list(key_cols)
            change_schema = L._schema_from_str(t_schema_str)
            payload = M.payload_columns(
                [f.name for f in change_schema], key_cols=key_cols
            )
            frag_schema = M.fragment_schema_for(change_schema, key_cols=key_cols)
            schema_key = t_schema_str
            # Arrow-native part grouping: one stable argsort + take, then
            # zero-copy contiguous slices per partition (no pandas anywhere
            # on the hot path — pandas object churn was the measured 2-4×
            # slowdown on 16M-event runs in round 1)
            events = pa.concat_tables(bufs, promote_options="permissive")
            part_np = events.column("part").to_numpy(zero_copy_only=False)
            order = np.argsort(part_np, kind="stable")
            events = events.take(pa.array(order, pa.int64()))
            part_sorted = part_np[order]
            uniq_parts, starts = np.unique(part_sorted, return_index=True)
            bounds = np.append(starts, len(part_sorted))

            for i, part in enumerate(uniq_parts):
                part = int(part)
                group = events.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
                ent = live_map.get(part) or {"base": None, "deltas": []}
                live_files = (
                    [ent["base"]] if ent["base"] else []
                ) + list(ent["deltas"])
                # the manifest's fragment list IS the cache validity token:
                # if this partition was merged by another actor since (a
                # rebalance move, a speculative twin adoption) or rolled
                # back, the cached mirror no longer matches the on-disk
                # layout and must be rebuilt — never silently reused
                exp_sig = tuple(os.path.basename(p) for p in live_files)
                # cache = list of RUNS (tbl, key_codes): the in-memory LSM
                # mirror of the base+delta fragment layout. Delta rounds
                # merge ONLY the keys this round touches (isin on cached
                # int codes — no string gather over untouched state), so
                # per-round work is O(round + touched), not O(lake).
                cached = self.cache.get(part)
                if cached is not None and cached[1] != exp_sig:
                    cached = None  # stale mirror: cold rebuild below
                if cached is not None and cached[0] == schema_key:
                    runs = cached[2]
                elif cached is not None:
                    # schema evolved: re-conform tables; key codes unchanged
                    runs = [
                        (S.conform(t, frag_schema), codes)
                        for t, codes in cached[2]
                    ]
                else:
                    # cold rebuild: load base + deltas as runs
                    runs = []
                    for p in live_files:
                        t = S.conform(pq.read_table(p), frag_schema)
                        runs.append((t, M.key_hash(t, key_cols)))

                # log-structured write policy: per-round DELTA (only rows
                # this round touched -> O(round) write volume), full BASE on
                # first write and every `compact_every` rounds (compaction).
                # The compaction phase is STAGGERED by partition id: with a
                # uniform touch pattern every partition would otherwise hit
                # the threshold on the same round, turning each
                # compact_every-th round into a whole-lake fold spike;
                # phase-shifting folds ~P/compact_every partitions per
                # round instead, so round latency stays uniform.
                n_deltas = len(ent["deltas"])
                kind = (
                    "delta"
                    if ent["base"] is not None
                    and (n_deltas + 1 + part) % compact_every != 0
                    else "base"
                )

                t0 = time.perf_counter()
                if kind == "base":
                    # compaction: fused fold-of-all-runs + event merge —
                    # ONE sort/segment pass (see merge_partition_table)
                    out = M.merge_partition_table(
                        [t for t, _ in runs], group, payload, key_cols=key_cols
                    )
                    write_tbl = S.conform(out, frag_schema)
                    runs = [(write_tbl, M.key_hash(write_tbl, key_cols))]
                else:
                    ev_codes = np.unique(M.key_hash(group, key_cols))
                    subsets = []
                    for t, codes in runs:
                        mask = np.isin(codes, ev_codes)
                        if mask.any():
                            subsets.append(t.filter(pa.array(mask)))
                    out = M.merge_partition_table(
                        subsets, group, payload, key_cols=key_cols
                    )
                    full = S.conform(out, frag_schema)
                    # rows whose watermark predates the round were touched
                    # by stale/duplicate events only — already in older
                    # fragments, excluded from the delta
                    write_tbl = full.filter(
                        pc.greater_equal(
                            full.column("cursor"), pa.scalar(round_cursor_lo)
                        )
                    )
                    # the new run IS the delta fragment (stale-only touches
                    # stay represented by earlier runs) — in-memory runs
                    # mirror the on-disk base+delta layout exactly, so a
                    # cache eviction rebuilds identical state
                    runs = runs + [(write_tbl, M.key_hash(write_tbl, key_cols))]
                merge_sec = time.perf_counter() - t0

                path = os.path.join(
                    self.lake_root,
                    L.FRAGMENT_DIR,
                    f"part={part:05d}",
                    f"{kind}-{round_id}.parquet",
                )
                os.makedirs(os.path.dirname(path), exist_ok=True)
                # pid-suffixed: a speculative twin merging the same
                # partitions writes identical content to the same target —
                # distinct tmp names keep the atomic renames independent
                tmp = path + f".tmp{self.actor_id}-{os.getpid()}"
                pq.write_table(write_tbl, tmp)
                os.replace(tmp, path)
                # charge the cache for every resident run (real Arrow size)
                new_sig = (
                    (os.path.basename(path),)
                    if kind == "base"
                    else exp_sig + (os.path.basename(path),)
                )
                self._cache_put(
                    part,
                    (schema_key, new_sig, runs),
                    sum(t.nbytes + codes.nbytes for t, codes in runs),
                )
                n_live = write_tbl.num_rows - int(
                    pc.sum(write_tbl.column(M.DELETED_COL)).as_py() or 0
                )
                stats_rows.append(
                    {
                        "part": part,
                        "kind": kind,
                        "n_events": group.num_rows,
                        "n_rows": write_tbl.num_rows,
                        "n_live": n_live,
                        "max_cursor": (
                            int(pc.max(write_tbl.column("cursor")).as_py())
                            if write_tbl.num_rows
                            else 0
                        ),
                        "merge_sec": merge_sec,
                    }
                )
        return pd.DataFrame(
            stats_rows,
            columns=[
                "part", "kind", "n_events", "n_rows", "n_live",
                "max_cursor", "merge_sec",
            ],
        )


class _PreFold:
    """Optional skew combiner: complete per-key fold inside a salted
    sub-partition, emitting one delta event per key.

    Two classes of rows bypass the fold and pass through unchanged (the
    merger's guarded stream-order fold handles them correctly):

    - STALE-TOUCHED KEYS — the round-1 stream contract ("at-least-once
      duplicates are re-emitted within the same round") is now ENFORCED,
      not assumed: any key with an event whose cursor predates the round's
      ``cursor_lo`` watermark is a cross-round re-delivery. Folding such a
      key blindly can resurrect a superseded column value (the stale
      event's non-null column survives last-non-null inside the fold, then
      outranks the lake row because the folded row carries the round's max
      cursor). Passing those keys through unfolded keeps the per-event
      cursors visible to the merger's watermark guard, so a
      contract-violating stream still converges to the oracle.
    - DERIVED-TABLE ROWS (``part >= num_partitions``) — their fold
      semantics are per-table (key set, patch policy), owned by the merge
      stage, not this primary-keyed combiner.
    """

    def __init__(
        self,
        schema_str: str,
        num_partitions: int,
        cursor_lo: int = 0,
        hash_version: int = P.HASH_VERSION_DEFAULT,
    ):
        schema = L._schema_from_str(schema_str)
        self.payload = M.payload_columns([f.name for f in schema])
        self.num_partitions = num_partitions
        self.cursor_lo = int(cursor_lo)
        self.hash_version = hash_version
        # canonical output order (must be identical for every group: fold
        # output and passthrough projection concat into one Dataset)
        self.out_cols = (
            list(S.KEY_COLS) + self.payload + ["cursor", "seq", "op", "part"]
        )

    def _fold(self, group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        folded = M.merge_partition_table(
            None, group, self.payload, with_boundary=True
        )
        op = pc.if_else(
            folded.column(M.DELETED_COL),
            pa.scalar("delete"),
            pc.if_else(
                folded.column("_boundary"), pa.scalar("insert"), pa.scalar("update")
            ),
        )
        out = folded.drop_columns([M.DELETED_COL, "_boundary"]).append_column(
            "op", op
        )
        # a salt group spans many conversations → recompute each key's home
        part = P.assign_part(
            out.column("conv_id"), self.num_partitions, self.hash_version
        )
        return out.append_column("part", pa.array(part, pa.int32()))

    def __call__(self, group: pa.Table) -> pa.Table:
        part0 = group.column("part")[0].as_py()
        if part0 is not None and int(part0) >= self.num_partitions:
            # derived-table salt group (single part by construction)
            return group.select(self.out_cols)

        cur = group.column("cursor").to_numpy(zero_copy_only=False)
        stale = cur < self.cursor_lo
        if self.cursor_lo <= 0 or not stale.any():
            return self._fold(group).select(self.out_cols)

        # split rows by KEY: a key touched by any stale event passes
        # through whole (fold-vs-passthrough must never split one key)
        keys = pd.MultiIndex.from_arrays(
            [group.column(c).to_pandas() for c in S.KEY_COLS]
        )
        codes = keys.factorize()[0]
        stale_key = np.zeros(codes.max() + 1, dtype=bool)
        stale_key[codes[stale]] = True
        row_pass = stale_key[codes]
        parts = [group.filter(pa.array(row_pass)).select(self.out_cols)]
        clean = group.filter(pa.array(~row_pass))
        if clean.num_rows:
            parts.append(self._fold(clean).select(self.out_cols))
        return pa.concat_tables(parts, promote_options="permissive")


@ray.remote
def _push_shard(
    path: str,
    schema_str: str,
    nparts: int,
    round_id: str,
    ctx,
    error_policy: str,
    lake_root: str,
    hash_version: int = P.HASH_VERSION_DEFAULT,
    only_actor: int | None = None,
    override_handle=None,
) -> list:
    """One epoch shard file → normalized + derived change batches →
    owner-contiguous slices fire-and-forgotten into the merger pool.
    Returns the list of actor ids sent to (one entry per slice) for the
    finalize count barrier.

    ``only_actor`` restricts sends to one owner (speculative straggler
    re-push: re-derive just that actor's slices); ``override_handle``
    redirects those sends to a replacement actor not (yet) in the pool."""
    _limit_arrow_threads()
    # broadcast once per pool revision (ray.put): actor handles, derived
    # table specs, and the partition→actor assignment (rebalanced between
    # rounds off per-partition merge-cost EWMAs)
    handles, specs, assign = ctx
    if override_handle is not None:
        handles = list(handles)
        handles[only_actor] = override_handle
    batch = pq.read_table(path)
    batch = _Normalize(
        schema_str, nparts, error_policy, lake_root, round_id,
        hash_version=hash_version,
    )(batch)
    k = len(handles)
    sent: list = []

    def send(tbl: pa.Table, t_idx: int) -> None:
        part = tbl.column("part").to_numpy(zero_copy_only=False)
        # derived tables live at parts [t*P, (t+1)*P): the same actor owns
        # primary partition p and every table's partition p
        owner = assign[part % nparts]
        # one O(rows) gather, then zero-copy contiguous slices per owner
        order = np.argsort(owner, kind="stable")
        tbl = tbl.take(pa.array(order))
        sorted_owner = owner[order]
        bounds = np.searchsorted(sorted_owner, np.arange(k + 1))
        targets = range(k) if only_actor is None else (only_actor,)
        for a in targets:
            lo, hi = int(bounds[a]), int(bounds[a + 1])
            if hi > lo:
                # fire-and-forget; the finalize count barrier syncs
                handles[a].add_events.remote(
                    round_id, tbl.slice(lo, hi - lo), t_idx
                )
                sent.append(a)

    send(batch, 0)
    for t_idx, spec in enumerate(specs[1:], start=1):
        d = spec.derive(batch)
        pcols = spec.part_cols or (spec.key_cols[0],)
        dpart = (
            P.assign_part_cols(
                [d.column(c) for c in pcols], nparts, hash_version
            )
            + t_idx * nparts
        )
        send(d.append_column("part", pa.array(dpart, pa.int32())), t_idx)
    return sent


class Engine:
    """Driver-side CDC engine over one lake directory."""

    def __init__(
        self,
        lake_root: str,
        num_partitions: int = 64,
        undo_window: int = 8,
        merge_concurrency=None,
        salted: bool = False,
        salt_factor: int = 4,
        exchange: str = "direct",
        merge_actors: int | None = None,
        cache_bytes: int = 1 << 30,
        compact_every: int = 8,
        tables: list | None = None,
        error_policy: str = "fail",
        progress: bool = False,
    ):
        from raycdc import tables as T

        self.lake = L.Lake(lake_root, num_partitions, undo_window)
        self.merge_concurrency = merge_concurrency
        self.salted = salted
        self.salt_factor = salt_factor
        # logical tables: tables[0] is the primary (identity); the rest are
        # derived per-batch from the primary change stream (raycdc.tables)
        self.tables = list(tables) if tables else [T.PRIMARY]
        if self.tables[0].derive is not None:
            raise ValueError("tables[0] must be the primary (derive=None)")
        # "direct": persistent merger actors fed straight from map_batches
        # (fast micro-batch path); "groupby": groupby(part).map_groups
        # (general path, always used when salted pre-fold is on)
        self.exchange = "groupby" if salted else exchange
        self.merge_actors = merge_actors
        self.cache_bytes = cache_bytes
        self.compact_every = compact_every
        self.error_policy = error_policy
        self.progress = progress or bool(os.environ.get("RAYCDC_PROGRESS"))
        self.max_round_retries = 2
        self._pool: list | None = None
        self._pool_gen = 0  # bumped by _rebuild_pool (failure recovery)
        # speculative straggler re-execution (see _gather_speculative): once
        # most actors have finished a round's merge, a laggard's partitions
        # are re-pushed to a fresh twin actor and the first finisher wins
        self.speculative = True
        self.spec_floor = float(os.environ.get("RAYCDC_SPEC_FLOOR", "3.0"))
        self.spec_factor = float(os.environ.get("RAYCDC_SPEC_FACTOR", "4.0"))
        self._spec_count = 0  # pool membership revision (spec adoptions)
        self._recently_replaced: list[int] = []
        # partition→actor rebalancing (skew answer, complementing the
        # speculative twins' jitter answer): per-partition merge-cost EWMAs
        # drive assignment moves between rounds; the merger's fragment-file
        # cache signature makes a moved partition cold-rebuild, never reuse
        # a stale mirror
        self.rebalance = True
        self._part_assign: np.ndarray | None = None
        self._part_cost: np.ndarray | None = None
        self._assign_rev = 0

    # -- persistent merger pool (direct exchange) -------------------------

    def _ensure_pool(self) -> list:
        if self._pool is None:
            if self.merge_actors is None:
                cpus = int(ray.cluster_resources().get("CPU", 8))
                # ~60% of the node merges; the rest reads/normalizes/pushes
                self.merge_actors = max(1, min(self.lake.num_partitions, int(cpus * 0.6)))
            # named actors keyed by the lake root: every Engine over the same
            # lake shares ONE merger set (single-writer discipline; also
            # prevents pool-per-Engine CPU exhaustion in shared sessions).
            # The generation suffix changes after a failure rebuild so a new
            # pool never races the dying one for the actor names.
            import hashlib

            tag = hashlib.sha1(os.path.abspath(self.lake.root).encode()).hexdigest()[:10]
            self._pool = [
                MergerActor.options(
                    name=f"raycdc-merger-{tag}-g{self._pool_gen}-{i}",
                    get_if_exists=True,
                ).remote(i, self.lake.root, self.cache_bytes)
                for i in range(self.merge_actors)
            ]
        return self._pool

    def _rebuild_pool(self) -> list:
        """Failure recovery: kill the survivors, start a fresh generation.
        The new actors have cold caches — they rebuild from the manifest's
        committed fragments, which is exactly the crash-consistent state."""
        self._teardown_pool()
        self._pool_gen += 1
        return self._ensure_pool()

    def warmup(self, sample_path: str | None = None) -> None:
        """Pre-start the merger pool and compile a trivial Dataset pipeline
        (bench: excluded from steady-state throughput, like a cluster's
        actors/workers being resident before the stream starts)."""
        handles = self._ensure_pool()
        ray.get([h.drop_cache.remote() for h in handles])
        if sample_path:
            ray.data.read_parquet(sample_path).map_batches(
                lambda t: t, batch_format="pyarrow"
            ).count()

    def _teardown_pool(self) -> None:
        if self._pool is not None:
            for h in self._pool:
                ray.kill(h)
            self._pool = None

    def close(self) -> None:
        """Release the merger pool's CPU reservations. Call when done with
        an Engine while the Ray session lives on (several concurrently-open
        engines on a small node can otherwise starve the scan tasks)."""
        self._teardown_pool()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # -- schema -----------------------------------------------------------

    def _round_schema(self, paths: list[str], base: pa.Schema | None = None) -> pa.Schema:
        schema = base if base is not None else self.lake.schema
        for p in paths:
            fs = pq.read_schema(p)
            fs = pa.schema([f for f in fs if f.name != "part"])
            schema = fs if schema is None else S.unify(schema, fs)
        return schema

    # -- one commit round --------------------------------------------------

    def apply_round(self, files: list[dict], round_id: str, audit=None) -> dict:
        orphans = self.lake.orphaned_epochs()
        if round_id in self.lake.committed_round_ids() or (
            orphans and all(f["epoch"] in orphans for f in files)
        ):
            return {"round_id": round_id, "skipped": True}  # epoch fence
        # regrouped-resume fence: a restart may plan DIFFERENT round ids
        # over the same epochs (epochs_per_round changed, or a prior
        # adaptive run split rounds) — if every epoch in this group is
        # already round-committed or orphaned, the work is done regardless
        # of grouping. NOT processed_epochs(): that set also counts
        # rollback-TRIGGER epochs, whose canonical data (the implicit-reorg
        # re-emit) must still apply after its injected rollback.
        # Partially-done groups fall through and re-apply; the merge
        # kernel's exact (key, cursor, seq) dedup makes that idempotent.
        done = {
            int(e)
            for r in self.lake.manifest["committed_rounds"]
            for e in r["epochs"]
        } | orphans
        if all(f["epoch"] in done for f in files):
            return {"round_id": round_id, "skipped": True}

        paths = [p for f in files for p in f["paths"]]
        schema = self._round_schema(paths)
        schema_str = L._schema_to_str(schema)
        nparts = self.lake.num_partitions
        t0 = time.perf_counter()

        if self.exchange == "direct":
            lo = min(f["cursor_lo"] for f in files)
            stats = self._run_direct(paths, schema_str, nparts, round_id, lo)
            return self._commit(files, round_id, schema, stats, t0, audit=audit)

        # Dataset-path constraint (tables.py documents it; ENFORCE it): the
        # groupby exchange conforms derived batches to the PRIMARY round
        # schema so the union is homogeneous — a derived table introducing
        # NOVEL payload columns (e.g. a fingerprint) would have them
        # silently nulled. Those tables need the direct exchange.
        if len(self.tables) > 1:
            meta = self._tables_meta(schema_str)
            primary_names = set(schema.names)
            for i, spec_t in enumerate(self.tables[1:], start=1):
                extra = [
                    n
                    for n in L._schema_from_str(meta[i][0]).names
                    if n not in primary_names
                ]
                if extra:
                    raise ValueError(
                        f"derived table {spec_t.name!r} introduces column(s) "
                        f"{extra} not in the primary schema — the "
                        f"'{self.exchange}' exchange would silently null "
                        "them; use exchange='direct' for this table set"
                    )
        ds = ray.data.read_parquet(paths)
        ds = ds.map_batches(
            _Normalize(
                schema_str, nparts, self.error_policy, self.lake.root,
                round_id, self.tables, hash_version=self.lake.hash_version,
            ),
            batch_format="pyarrow",
        )
        if self.salted:
            lo = min(f["cursor_lo"] for f in files)
            salted_ds = ds.map_batches(
                _salt_batch_fn(nparts, self.salt_factor, self.lake.hash_version),
                batch_format="pyarrow",
            )
            ds = salted_ds.groupby("salt").map_groups(
                _PreFold,
                fn_constructor_args=(schema_str, nparts, lo, self.lake.hash_version),
                batch_format="pyarrow",
                concurrency=self.merge_concurrency or (1, 16),
            )

        stats_ds = ds.groupby("part").map_groups(
            MergeWorker,
            fn_constructor_args=(
                self.lake.live_state_map(),
                self.lake.root,
                round_id,
                schema_str,
                nparts,
                {i: tuple(t.key_cols) for i, t in enumerate(self.tables)},
            ),
            batch_format="pyarrow",
            concurrency=self.merge_concurrency or (1, 16),
        )
        stats = stats_ds.to_pandas()  # ≤ P rows
        if os.environ.get("RAYCDC_STATS"):
            print(stats_ds.stats())
        return self._commit(files, round_id, schema, stats, t0, audit=audit)

    def _run_direct(
        self, paths: list, schema_str: str, nparts: int, round_id: str, cursor_lo: int
    ) -> pd.DataFrame:
        expected = self._push_round(paths, schema_str, nparts, round_id)
        t_fin = time.perf_counter()
        refs = self._finalize_refs(round_id, schema_str, expected, cursor_lo)
        stats = self._gather_with_recovery(
            refs, paths, schema_str, nparts, round_id, cursor_lo, expected
        )
        self._update_balance(stats)
        if os.environ.get("RAYCDC_STATS"):
            print(
                f"[direct] finalize={time.perf_counter() - t_fin:.2f}s "
                f"merge_total={stats['merge_sec'].sum():.2f}s "
                f"actors={len(self._pool)}"
            )
        return stats

    @staticmethod
    def _failure_is_retriable(exc: BaseException) -> bool:
        """Retriable = an actor/worker died or a push barrier starved (its
        slices died with an actor). Application errors (bad data, bugs)
        re-raise immediately — the reference's retriable/crashable taxonomy
        (``common/utils/exception_control.py``,
        ``indexer/executors/batch_work_executor.py:113-149``)."""
        if isinstance(exc, (ray.exceptions.RayActorError, TimeoutError)):
            return True
        if isinstance(exc, ray.exceptions.RayTaskError):
            cause = getattr(exc, "cause", None)
            return isinstance(
                cause, (TimeoutError, ray.exceptions.RayActorError)
            )
        return False

    def _gather_with_recovery(
        self,
        refs: list,
        paths: list,
        schema_str: str,
        nparts: int,
        round_id: str,
        cursor_lo: int,
        expected: dict | None = None,
    ) -> pd.DataFrame:
        """Gather the per-actor merges (speculatively re-executing
        stragglers, see ``_gather_speculative``); on merger death, rebuild
        the pool and replay the WHOLE round (exactly-once holds because
        nothing is committed yet and fragment writes are deterministic
        filenames — replaying rewrites identical files)."""
        for attempt in range(self.max_round_retries + 1):
            try:
                if self.speculative and expected is not None and len(refs) > 1:
                    parts = self._gather_speculative(
                        refs, paths, schema_str, round_id, cursor_lo, expected
                    )
                else:
                    parts = ray.get(refs)
                # drop actors that merged nothing this round (every
                # partition empty — e.g. a key-sharded feed): their empty
                # frames would poison concat's dtype inference (object
                # "part" column → IndexError in _update_balance)
                parts = [p for p in parts if p is not None and len(p)]
                if not parts:
                    return pd.DataFrame(
                        {
                            "part": pd.Series(dtype="int64"),
                            "n_rows": pd.Series(dtype="int64"),
                            "n_live": pd.Series(dtype="int64"),
                            "merge_sec": pd.Series(dtype="float64"),
                        }
                    )
                return pd.concat(parts, ignore_index=True)
            except Exception as e:
                if attempt >= self.max_round_retries or not self._failure_is_retriable(e):
                    raise
                if os.environ.get("RAYCDC_STATS"):
                    print(f"[recover] round {round_id} attempt {attempt}: {e!r}")
                self._rebuild_pool()
                expected = self._push_round(paths, schema_str, nparts, round_id)
                refs = self._finalize_refs(round_id, schema_str, expected, cursor_lo)

    def _spawn_spec_twin(self, actor_id: int):
        """A fresh merger for one actor slot, outside the named pool (the
        name carries the spec revision so it never collides)."""
        import hashlib

        tag = hashlib.sha1(os.path.abspath(self.lake.root).encode()).hexdigest()[:10]
        return MergerActor.options(
            name=f"raycdc-merger-{tag}-g{self._pool_gen}-s{self._spec_count}-{actor_id}",
            get_if_exists=True,
        ).remote(actor_id, self.lake.root, self.cache_bytes)

    def _gather_speculative(
        self,
        refs: list,
        paths: list,
        schema_str: str,
        round_id: str,
        cursor_lo: int,
        expected: dict,
    ) -> list:
        """Straggler-proof round gather. The count barrier otherwise makes
        every round as slow as the slowest of K mergers — node-level jitter
        on a real cluster (and sibling-VM load here) turns one laggard into
        whole-round latency. Once most actors have reported, any actor
        still running past ``spec_factor ×`` the median finish time gets a
        speculative twin: its slices are re-derived from the round's source
        shards and pushed only to the twin, which merges the same
        partitions (fragment writes are deterministic + atomically renamed,
        so twin and original racing is harmless). First finisher wins; if
        the twin wins it REPLACES the laggard in the pool (the laggard is
        killed so a late finalize can never race a future round's cache
        state) and the adoption is recorded so a pipelined in-flight push
        re-targets just that slot."""
        n = len(refs)
        pending = dict(enumerate(refs))  # actor_id -> original ref
        spec: dict = {}  # actor_id -> (twin_handle, twin_ref)
        out: dict = {}
        durations: dict = {}
        t0 = time.monotonic()
        tables_meta = None

        while pending or any(i not in out for i in spec):
            entries = [(i, r, False) for i, r in pending.items()] + [
                (i, s[1], True) for i, s in spec.items() if i not in out
            ]
            if not entries:
                break
            ready, _ = ray.wait([e[1] for e in entries], num_returns=1, timeout=0.2)
            now = time.monotonic()
            for ref in ready:
                i, _, from_spec = next(e for e in entries if e[1] == ref)
                try:
                    res = ray.get(ref)
                except Exception as exc:
                    if from_spec:
                        # twin died/failed: forget it, keep the original
                        spec.pop(i, None)
                        continue
                    if i in spec and self._failure_is_retriable(exc):
                        # original died but a twin is racing: drop the
                        # original and let the twin decide the slot
                        pending.pop(i, None)
                        continue
                    # a NON-retriable application error (bad data, logic
                    # bug) must surface now — the twin will deterministically
                    # fail the same way, and swallowing it here would burn
                    # round retries and report a misleading timeout
                    raise
                if i in out:
                    continue
                out[i] = res
                durations[i] = now - t0
                pending.pop(i, None)
                if from_spec:
                    self._adopt_twin(i, spec[i][0])
                elif i in spec:
                    ray.kill(spec[i][0])
                    spec.pop(i, None)

            # launch twins for laggards once at least half have reported
            if (
                len(out) >= max(1, n // 2)
                and any(i not in spec for i in pending)
            ):
                med = float(np.median(list(durations.values())))
                cutoff = max(self.spec_floor, self.spec_factor * med)
                if now - t0 > cutoff:
                    if tables_meta is None:
                        tables_meta = self._tables_meta(schema_str)
                        live_map = self.lake.live_state_map()
                    for i in [i for i in pending if i not in spec]:
                        twin = self._spawn_spec_twin(i)
                        cnt = self._spec_repush(
                            paths, schema_str, round_id, i, twin
                        )
                        twin_ref = twin.finalize_round.remote(
                            round_id, schema_str, live_map, cnt,
                            int(cursor_lo), self.compact_every,
                            _barrier_timeout(), tables_meta,
                        )
                        spec[i] = (twin, twin_ref)
                        if os.environ.get("RAYCDC_STATS"):
                            print(
                                f"[spec] round {round_id}: twin for actor {i} "
                                f"after {now - t0:.2f}s (median {med:.2f}s)"
                            )
        missing = set(range(n)) - set(out)
        if missing:
            # both the original and its twin died — retriable round replay
            raise TimeoutError(
                f"round {round_id}: mergers {sorted(missing)} lost"
            )
        return [out[i] for i in sorted(out)]

    def _adopt_twin(self, actor_id: int, twin) -> None:
        """The twin won the race: it becomes the slot's merger (warm cache —
        it just merged the slot's partitions); the laggard is killed."""
        old = self._pool[actor_id]
        self._pool[actor_id] = twin
        self._spec_count += 1
        self._recently_replaced.append(actor_id)
        try:
            ray.kill(old)
        except Exception:
            pass

    def _spec_repush(
        self, paths: list, schema_str: str, round_id: str,
        actor_id: int, twin,
    ) -> int:
        """Re-derive ONE actor's slices for a round from the source shards
        and push them to its speculative twin. Returns the slice count (the
        twin's finalize barrier target)."""
        refs = [
            _push_shard.remote(
                p, schema_str, self.lake.num_partitions, round_id,
                self._push_ctx_ref, self.error_policy, self.lake.root,
                self.lake.hash_version, actor_id, twin,
            )
            for p in paths
        ]
        return sum(len(sent) for sent in ray.get(refs))

    def _push_round(
        self, paths: list, schema_str: str, nparts: int, round_id: str,
        _retries: int = 2, only_actor: int | None = None,
    ) -> dict:
        """Scan + normalize + bucket-exchange one round's events into the
        merger pool: one raw Ray task per epoch shard file (read →
        normalize → derive → owner-sliced actor sends). Raw tasks, not a
        Dataset: the exchange already bypasses the Dataset shuffle, and the
        per-round Dataset launch/drain (~0.5-1 s) was pure fixed cost on
        the round critical path. Memory stays bounded by shard size ×
        concurrent tasks (shards are written ≤100k rows)."""
        handles = self._ensure_pool()
        # broadcast (handles, table specs) ONCE per pool revision: the
        # per-task submission then carries only small scalars, not a fresh
        # serialization of 19 actor handles per shard per round. Revision =
        # (rebuild generation, speculative adoptions) — any membership
        # change invalidates the broadcast handle list.
        rev = (self._pool_gen, self._spec_count, self._assign_rev)
        if (
            getattr(self, "_push_ctx_ref", None) is None
            or getattr(self, "_push_ctx_rev", None) != rev
        ):
            self._push_ctx_ref = ray.put(
                (handles, self.tables, self._assignment(len(handles)))
            )
            self._push_ctx_rev = rev
        error_policy, lake_root = self.error_policy, self.lake.root

        t_push = time.perf_counter()
        refs = [
            _push_shard.remote(
                p, schema_str, nparts, round_id, self._push_ctx_ref,
                error_policy, lake_root, self.lake.hash_version, only_actor,
            )
            for p in paths
        ]
        expected: dict = {}
        for sent in ray.get(refs):
            for a in sent:
                expected[a] = expected.get(a, 0) + 1
        # fast liveness probe: a merger that died during the push took its
        # buffered slices with it — rebuild and re-push NOW instead of
        # letting the finalize count barrier time out. The probe is an
        # OPTIMIZATION: on a throttled host a merger deep in the previous
        # round's merge answers late (actors serve serially), so a probe
        # timeout is INCONCLUSIVE, not a death — fall through and let the
        # finalize barrier + _gather_with_recovery catch genuinely dead
        # actors (the r03 suite flake was exactly this GetTimeoutError
        # surfacing as a failure on a 4-5x slowed hypervisor).
        try:
            ray.get(
                [h.ping.remote() for h in handles],
                timeout=float(os.environ.get("RAYCDC_PING_TIMEOUT", "30")),
            )
        except ray.exceptions.GetTimeoutError:
            if os.environ.get("RAYCDC_STATS"):
                print(f"[direct] round {round_id}: liveness probe timed out "
                      "(busy host?) — deferring to the finalize barrier")
        except ray.exceptions.RayActorError:
            if _retries <= 0:
                raise
            self._rebuild_pool()
            return self._push_round(
                paths, schema_str, nparts, round_id,
                _retries=_retries - 1, only_actor=only_actor,
            )
        if os.environ.get("RAYCDC_STATS"):
            print(f"[direct] push={time.perf_counter() - t_push:.2f}s")
        return expected

    def _assignment(self, k: int) -> np.ndarray:
        """Current partition→actor-slot map (length ``num_partitions``);
        defaults to the modular spread and persists across pool rebuilds
        (slots are positional, so a rebuilt pool inherits the balance)."""
        P_ = self.lake.num_partitions
        if (
            self._part_assign is None
            or len(self._part_assign) != P_
            or (k and int(self._part_assign.max(initial=0)) >= k)
        ):
            self._part_assign = (np.arange(P_, dtype=np.int64) % max(k, 1))
        return self._part_assign

    def _update_balance(self, stats) -> None:
        """Rebalance partition ownership from this round's per-partition
        merge times. Skewed partitions (hot keys, fatter state) make the
        count barrier wait on one overloaded merger every round; moving a
        few of its costliest partitions to the lightest actor bounds that.
        Moves are EWMA-damped and capped per round so the cold-rebuild cost
        of a move (the receiving actor re-reads the partition's fragments
        once) stays amortized."""
        if (
            not self.rebalance
            or self._pool is None
            or len(self._pool) < 2
            or stats is None
            or not len(stats)
        ):
            return
        k = len(self._pool)
        P_ = self.lake.num_partitions
        assign = self._assignment(k)
        home = stats["part"].to_numpy() % P_  # derived parts fold into home
        cost = np.zeros(P_)
        np.add.at(cost, home, stats["merge_sec"].to_numpy())
        if self._part_cost is None or len(self._part_cost) != P_:
            self._part_cost = cost
        else:
            self._part_cost = 0.5 * self._part_cost + 0.5 * cost
        actor_cost = np.zeros(k)
        np.add.at(actor_cost, assign, self._part_cost)
        mean = float(actor_cost.mean())
        if mean <= 0 or actor_cost.max() <= 1.3 * mean:
            return
        donor = int(actor_cost.argmax())
        donor_parts = np.flatnonzero(assign == donor)
        move_cap = max(1, P_ // (4 * k))
        moved = 0
        for p in donor_parts[np.argsort(self._part_cost[donor_parts])[::-1]]:
            if moved >= move_cap or actor_cost[donor] <= 1.1 * mean:
                break
            recip = int(actor_cost.argmin())
            c = float(self._part_cost[p])
            if max(actor_cost[donor] - c, actor_cost[recip] + c) >= actor_cost[donor]:
                break  # the move would just relocate the hotspot
            assign[int(p)] = recip
            actor_cost[donor] -= c
            actor_cost[recip] += c
            moved += 1
        if moved:
            self._assign_rev += 1
            if os.environ.get("RAYCDC_STATS"):
                print(f"[rebalance] moved {moved} partition(s) off actor {donor}")

    def _tables_meta(self, schema_str: str) -> dict:
        """Per-table (change schema, key cols) for one round: the derived
        schemas are induced by running each spec's derive on an empty batch
        of the round's primary schema (schema evolution therefore flows
        through to derived tables automatically)."""
        meta = {0: (schema_str, tuple(self.tables[0].key_cols))}
        if len(self.tables) > 1:
            schema = L._schema_from_str(schema_str)
            empty = S.conform(schema.empty_table(), schema).append_column(
                "part", pa.array([], pa.int32())
            )
            for i, spec in enumerate(self.tables[1:], start=1):
                d_schema = spec.derive(empty).schema
                meta[i] = (L._schema_to_str(d_schema), tuple(spec.key_cols))
        return meta

    def _finalize_refs(
        self, round_id: str, schema_str: str, expected: dict, cursor_lo: int
    ) -> list:
        """Launch (don't wait) the per-actor merges for a pushed round."""
        live_map = self.lake.live_state_map()
        tables_meta = self._tables_meta(schema_str)
        return [
            h.finalize_round.remote(
                round_id,
                schema_str,
                live_map,
                int(expected.get(i, 0)),
                int(cursor_lo),
                self.compact_every,
                _barrier_timeout(),
                tables_meta,
            )
            for i, h in enumerate(self._ensure_pool())
        ]

    def _commit(self, files, round_id, schema, stats, t0, audit=None) -> dict:
        wall = time.perf_counter() - t0
        if os.environ.get("RAYCDC_STATS") and len(stats):
            print("merge_sec per part: total",
                  round(stats["merge_sec"].sum(), 2), "max",
                  round(stats["merge_sec"].max(), 3))
        # source-event count from the PRIMARY table's stats rows only —
        # derived tables re-emit each event in their own part namespace
        # ([i*P, (i+1)*P)), and summing across tables would count every
        # source event once per table. (Salted groupby rounds count
        # post-fold deltas, not raw source events: the pre-fold collapses
        # a key's events before the merge stage sees them.)
        if len(stats):
            primary = stats[stats["part"] < self.lake.num_partitions]
            n_events = int(primary["n_events"].sum())
        else:
            n_events = 0
        if self.progress:
            # live per-round progress (reference ProgressLogger analog,
            # ``indexer/utils/progress_logger.py:22-65``): one line per
            # commit, not just post-hoc manifest metrics
            print(
                f"[raycdc] {round_id}: {n_events} events, "
                f"{int(stats['n_live'].sum()) if len(stats) else 0} live rows, "
                f"{len(stats)} parts, {wall:.2f}s "
                f"({n_events / wall if wall > 0 else 0:,.0f} ev/s), "
                f"cursor≤{max((f['cursor_hi'] for f in files), default=0)}",
                flush=True,
            )

        metrics = {
            "n_events": n_events,
            "n_rows": int(stats["n_rows"].sum()) if len(stats) else 0,
            "n_live": int(stats["n_live"].sum()) if len(stats) else 0,
            "touched_parts": len(stats),
            "wall_sec": wall,
            "events_per_sec": n_events / wall if wall > 0 else 0.0,
        }
        touched = (
            sorted(
                (int(p), str(k))
                for p, k in zip(
                    stats["part"], stats.get("kind", ["base"] * len(stats))
                )
            )
            if len(stats)
            else []
        )
        if audit is not None:
            # write-audit-publish: fragments are staged on disk, manifest
            # untouched — the audit gates the publish (commit_round)
            ctx = AuditContext(self, round_id, files, schema, touched, metrics)
            try:
                verdict = audit(ctx)
            except Exception as exc:
                self._abort_staged(round_id, touched)
                raise AuditRejectedError(
                    f"audit of round {round_id} raised: {exc}"
                ) from exc
            if verdict is False:
                self._abort_staged(round_id, touched)
                raise AuditRejectedError(
                    f"audit of round {round_id} returned False"
                )
        self.lake.commit_round(
            round_id=round_id,
            epochs=[f["epoch"] for f in files],
            cursor_lo=min(f["cursor_lo"] for f in files),
            cursor_hi=max(f["cursor_hi"] for f in files),
            touched_parts=touched,
            schema=schema,
            metrics=metrics,
        )
        return {"round_id": round_id, "skipped": False, **metrics}

    def _abort_staged(self, round_id: str, touched: list) -> None:
        """Discard a staged (audit-rejected) round: delete its fragment
        files and drop merger caches that may mirror them. Exactly-once is
        preserved — nothing reached the manifest, and fragment names are
        deterministic, so a later replay of the same round rewrites
        identical files from scratch."""
        for p, kind in touched:
            path = self.lake.fragment_abspath(int(p), round_id, kind)
            if os.path.exists(path):
                os.remove(path)
        if self.exchange == "direct":
            ray.get([h.drop_cache.remote() for h in self._ensure_pool()])

    # -- full log replay ---------------------------------------------------

    def apply_log(
        self,
        log_dir: str,
        epochs_per_round: int = 1,
        audit=None,
        adaptive: bool = False,
    ) -> list[dict]:
        """Replay every epoch file under ``log_dir`` in commit rounds.
        Already-committed rounds are skipped (resume); rollback epochs are
        barriers applied via the undo buffer. Resume contract: use the same
        ``epochs_per_round`` across restarts (round ids derive from epoch
        groups).

        ``audit`` (optional) enables WRITE-AUDIT-PUBLISH: after each
        round's fragments are staged and before its manifest commit, the
        callback runs with an :class:`AuditContext`; returning False or
        raising rejects the round (fragments discarded, replay stops with
        :class:`AuditRejectedError`). Auditing forces the sequential
        executor — round N+1 must not be merged speculatively on top of a
        round the audit may still reject."""
        return self.apply_log_files(
            discover_epoch_files(log_dir),
            epochs_per_round=epochs_per_round,
            audit=audit,
            adaptive=adaptive,
        )

    def apply_dataset(self, ds, epoch: int | None = None, audit=None) -> dict:
        """CDC-apply an in-flight change-event Dataset (columns: op,
        conv_id, turn_idx, cursor, seq + payload) as ONE epoch — the
        ``lake://`` sink of the exporter factory (the reference's
        ``PostgresItemExporter.export_items`` upsert entry point,
        ``indexer/exporters/postgres_item_exporter.py:37-58``). The
        Dataset is staged as parquet shard files by parallel Ray tasks
        (never the driver), renamed into the epoch-file naming contract,
        then merged through the normal round path — so commit atomicity,
        epoch fencing and rollback cover sink writes too."""
        import uuid

        if epoch is None:
            epoch = max(self.lake.processed_epochs(), default=0) + 1
        stage = os.path.join(
            self.lake.root, "_staging", f"e{epoch:06d}-{uuid.uuid4().hex[:8]}"
        )
        ds.write_parquet(stage)
        paths, lo, hi = [], 1 << 62, 0
        for i, p in enumerate(sorted(glob.glob(os.path.join(stage, "*.parquet")))):
            f = pq.ParquetFile(p)
            idx = f.schema_arrow.get_field_index("cursor")
            f_lo, f_hi = 1 << 62, 0
            for rg in range(f.metadata.num_row_groups):
                st = f.metadata.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    c = f.read_row_group(rg, columns=["cursor"]).column("cursor")
                    import pyarrow.compute as pc

                    st_min, st_max = pc.min(c).as_py(), pc.max(c).as_py()
                else:
                    st_min, st_max = st.min, st.max
                f_lo, f_hi = min(f_lo, st_min), max(f_hi, st_max)
            if f.metadata.num_rows == 0:
                os.remove(p)
                continue
            dst = os.path.join(
                stage, f"changes-{epoch:06d}-{f_lo}-{f_hi}-s{i:02d}.parquet"
            )
            os.replace(p, dst)
            paths.append(dst)
            lo, hi = min(lo, f_lo), max(hi, f_hi)
        if not paths:
            return {"round_id": f"r{epoch:06d}-{epoch:06d}", "skipped": True}
        files = [
            {"epoch": epoch, "paths": paths, "cursor_lo": lo, "cursor_hi": hi}
        ]
        return self.apply_round(files, f"r{epoch:06d}-{epoch:06d}", audit=audit)

    def apply_log_files(
        self,
        files: list[dict],
        epochs_per_round: int = 1,
        audit=None,
        adaptive: bool = False,
    ) -> list[dict]:
        """Replay an explicit (ordered) list of discovered epoch entries —
        the unit the stream controller feeds (raycdc.stream.follow).

        ``adaptive=True`` enables ADAPTIVE ROUND SIZING (the reference's
        ``indexer/executors/batch_work_executor.py:65-111`` halve-on-error
        / cool-down-regrow controller, re-expressed over commit rounds):
        a round that still fails after the internal gather retries is
        split in half and retried at the smaller size; after three
        consecutive successes the size doubles back toward
        ``epochs_per_round``. Safe under resume because fencing is
        PER-EPOCH (``processed_epochs``), not per round id — a restart
        with different grouping skips exactly the committed epochs.
        Adaptive implies the sequential executor (no round pipelining)."""
        plan = plan_rounds(
            files,
            epochs_per_round,
            processed=self.lake.processed_epochs(),
            last_cursor=self.lake.last_cursor(),
        )

        if adaptive:
            return self._execute_plan_adaptive(
                plan, epochs_per_round, audit=audit
            )
        if self.exchange == "direct" and audit is None:
            return self._execute_plan_pipelined(plan)
        return self._execute_plan_sequential(plan, audit=audit)

    def _adaptive_failure_is_retriable(self, exc) -> bool:
        """Halving helps when the failure scales with round volume:
        resource exhaustion, plus everything the gather path already
        deems transient."""
        if self._failure_is_retriable(exc):
            return True
        names = {"OutOfMemoryError", "ObjectStoreFullError", "OutOfDiskError"}
        if type(exc).__name__ in names:
            return True
        cause = getattr(exc, "cause", None)
        return cause is not None and type(cause).__name__ in names

    def _execute_plan_adaptive(
        self, plan: list, epochs_per_round: int, audit=None
    ) -> list[dict]:
        results: list = []
        cur = max(1, int(epochs_per_round))
        streak = 0
        for item in plan:
            if item[0] == "rollback":
                results.append(self._rollback(item[1], item[2]))
                continue
            group = item[1]
            i = 0
            while i < len(group):
                sub = group[i : i + cur]
                rid = f"r{sub[0]['epoch']:06d}-{sub[-1]['epoch']:06d}"
                try:
                    results.append(self.apply_round(sub, rid, audit=audit))
                except Exception as e:
                    if len(sub) == 1 or not self._adaptive_failure_is_retriable(e):
                        raise
                    cur = max(1, cur // 2)
                    streak = 0
                    if os.environ.get("RAYCDC_STATS"):
                        print(f"[adaptive] {rid}: {type(e).__name__} → "
                              f"epochs_per_round={cur}")
                    continue  # retry the SAME position at the smaller size
                i += len(sub)
                streak += 1
                if streak >= 3 and cur < epochs_per_round:
                    cur = min(epochs_per_round, cur * 2)
                    streak = 0
        return results

    def _rollback(self, to_cursor: int, epoch: int) -> dict:
        if epoch in self.lake.applied_rollback_epochs():
            # fence: this reorg was already applied — re-applying it would
            # truncate the canonical replay rounds committed after it
            return {
                "round_id": f"rollback@{epoch}",
                "rollback_to": to_cursor,
                "skipped": True,
            }
        self.lake.rollback(to_cursor, rollback_epoch=epoch)
        if self.exchange == "direct":
            # cached fragments may predate the restore point. Ensure the
            # pool FIRST: the named get_if_exists actors are shared per
            # lake root, so even if THIS engine hasn't touched them yet, a
            # prior un-closed engine's actors may be alive with in-memory
            # runs mirroring the just-deleted fragments — they must be
            # dropped unconditionally, not only when self._pool is set
            ray.get([h.drop_cache.remote() for h in self._ensure_pool()])
        return {"round_id": f"rollback@{epoch}", "rollback_to": to_cursor}

    def _execute_plan_sequential(self, plan: list, audit=None) -> list[dict]:
        results = []
        for item in plan:
            if item[0] == "rollback":
                results.append(self._rollback(item[1], item[2]))
            else:
                results.append(self.apply_round(item[1], item[2], audit=audit))
        return results

    def _execute_plan_pipelined(self, plan: list) -> list[dict]:
        """Direct-exchange executor with round pipelining: while the merger
        pool finalizes round N, the scan/normalize/push tasks (disjoint
        CPUs) already stream round N+1 into round-keyed actor buffers — the
        Ray-native analog of the reference's mpire block-range overlap
        (``indexer/controller/stream_controller.py:45-48,96-100``). The
        manifest commit stays strictly sequential (single-writer fence);
        a rollback drains the pipeline first (barrier)."""
        results: list = []
        pending = None  # (files, round_id, schema, t0, refs, paths, schema_str, lo, expected)
        prev_schema = self.lake.schema

        def finish_pending():
            nonlocal pending
            if pending is None:
                return
            files_p, rid, schema, t0, refs, paths_p, schema_str_p, lo_p, exp_p = pending
            stats = self._gather_with_recovery(
                refs, paths_p, schema_str_p, self.lake.num_partitions, rid,
                lo_p, exp_p,
            )
            # EWMA rebalance runs on the FLAGSHIP pipelined path too, not
            # only the sequential apply_round path — skew handling must
            # live where apply_log/stream.follow actually execute
            self._update_balance(stats)
            results.append(self._commit(files_p, rid, schema, stats, t0))
            pending = None

        for item in plan:
            if item[0] == "rollback":
                finish_pending()
                results.append(self._rollback(item[1], item[2]))
                prev_schema = self.lake.schema
                continue
            _, files_g, rid = item
            # fence checked LIVE (not a start-of-replay snapshot): a replayed
            # rollback truncates later rounds from the manifest, and those
            # must then be re-applied, not skipped. Epochs orphaned by an
            # ALREADY-APPLIED rollback are also skipped: their effects were
            # intentionally discarded (re-applying them is a guarded-LWW
            # no-op, but skipping keeps the manifest's round list canonical).
            orphans = self.lake.orphaned_epochs()
            if rid in self.lake.committed_round_ids() or (
                orphans and all(f["epoch"] in orphans for f in files_g)
            ):
                results.append({"round_id": rid, "skipped": True})
                continue
            # regrouped-resume fence (see apply_round): different round ids
            # over fully round-committed/orphaned epochs are done work —
            # rollback-trigger epochs excluded (their canonical re-emit
            # data must still apply)
            done = {
                int(e)
                for r in self.lake.manifest["committed_rounds"]
                for e in r["epochs"]
            } | orphans
            if all(f["epoch"] in done for f in files_g):
                results.append({"round_id": rid, "skipped": True})
                continue
            paths = [p for f in files_g for p in f["paths"]]
            schema = self._round_schema(paths, base=prev_schema)
            prev_schema = schema
            schema_str = L._schema_to_str(schema)
            t0 = time.perf_counter()
            expected = self._push_round(paths, schema_str, self.lake.num_partitions, rid)
            gen_at_push = self._pool_gen
            self._recently_replaced = []
            finish_pending()  # waits on round N-1 merges that ran during push
            if self._pool_gen != gen_at_push:
                # recovery replaced the pool while this round's slices were
                # in the dead actors' buffers — re-push to the new pool
                expected = self._push_round(
                    paths, schema_str, self.lake.num_partitions, rid
                )
            elif self._recently_replaced:
                # a speculative twin replaced a laggard while this round's
                # slices sat in the laggard's buffer — re-derive and re-push
                # JUST that slot (other actors keep their buffered slices)
                for i in sorted(set(self._recently_replaced)):
                    e2 = self._push_round(
                        paths, schema_str, self.lake.num_partitions, rid,
                        only_actor=i,
                    )
                    expected[i] = e2.get(i, 0)
            lo = min(f["cursor_lo"] for f in files_g)
            pending = (
                files_g,
                rid,
                schema,
                t0,
                self._finalize_refs(rid, schema_str, expected, lo),
                paths,
                schema_str,
                lo,
                expected,
            )
        finish_pending()
        return results

    # -- reads -------------------------------------------------------------

    def _table_index(self, table: str | None) -> int:
        if table is None:
            return 0
        for i, s in enumerate(self.tables):
            if s.name == table:
                return i
        raise KeyError(f"unknown lake table {table!r}")

    def _table_schema(self, t_idx: int) -> pa.Schema | None:
        base = self.lake.schema
        if t_idx == 0 or base is None:
            return base
        meta = self._tables_meta(L._schema_to_str(base))
        return L._schema_from_str(meta[t_idx][0])

    def read_lake(self, columns=None, include_system: bool = False,
                  table: str | None = None, predicate=None,
                  as_of_cursor: int | None = None,
                  as_of_round: str | None = None,
                  as_of_tag: str | None = None):
        """A lake table as a Dataset of live rows (tombstones and system
        columns dropped unless requested). ``table`` selects a logical
        table (default: the primary).

        ``as_of_cursor`` / ``as_of_round`` / ``as_of_tag`` select a
        TIME-TRAVEL snapshot:
        the table state as of a committed round boundary (cursor = the
        round's high watermark — the same boundary resolution rollback
        uses). Snapshots are served from the manifest's per-partition
        version history, so they are bounded by the same ``undo_window``
        that bounds rollback; older snapshots raise. Snapshot reads always
        go through the per-partition fold (a snapshot base may have
        in-window deltas stacked on it) and use the CURRENT table schema —
        columns added after the snapshot read as null.

        ``predicate`` is a ``pyarrow.dataset`` expression. On base-only
        partitions it is pushed INTO the parquet read (row groups that
        cannot match never leave storage — the reference's
        ``pg_source_job`` predicate pushdown,
        ``indexer/jobs/source_job/pg_source_job.py:73-176``); on
        partitions with outstanding deltas it is applied AFTER the
        per-partition fold (filtering before the fold could resurrect a
        superseded row version).

        Base-only partitions stream straight from their fragments (already
        sorted by the table's key columns); partitions with outstanding
        deltas go through the per-partition arg-max fold (log-structured
        read path) inside map_batches."""
        t_idx = self._table_index(table)
        nparts = self.lake.num_partitions
        prange = (t_idx * nparts, (t_idx + 1) * nparts)
        if as_of_tag is not None:
            as_of_round = self.lake.round_for_tag(as_of_tag)
        if as_of_cursor is not None:
            as_of_round = self.lake.round_id_at_cursor(as_of_cursor)
        if as_of_round is not None:
            state_map = self.lake.state_map_as_of(as_of_round, prange)
        else:
            state_map = self.lake.live_state_map(prange)
        schema = self._table_schema(t_idx)
        key_cols = list(self.tables[t_idx].key_cols)
        needs_fold = as_of_round is not None or any(
            ent["deltas"] for ent in state_map.values()
        )
        if needs_fold and schema is not None:
            return self._read_lake_folded(
                state_map, schema, columns, include_system, key_cols, predicate
            )
        paths = self.lake.live_fragment_paths(prange)
        if not paths:
            schema = schema or S.CHANGE_SCHEMA
            empty = pa.Table.from_arrays(
                [], schema=pa.schema([])
            )
            return ray.data.from_arrow(
                S.conform(empty, M.fragment_schema_for(schema, key_cols=key_cols))
            )
        import pyarrow.compute as pc

        ds = ray.data.read_parquet(paths, filter=predicate)

        def _live(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column(M.DELETED_COL), False))
            drop = [M.DELETED_COL] + ([] if include_system else ["cursor", "seq"])
            # "part" is hive-partitioning inference from part=NNNNN dirs,
            # not a stored column — keep the lake surface clean
            drop += [c for c in ("part",) if c in t.column_names]
            return t.drop_columns(drop)

        ds = ds.map_batches(_live, batch_format="pyarrow")
        if columns:
            ds = ds.select_columns(columns)
        return ds

    def _read_lake_folded(
        self, state_map, schema, columns, include_system, key_cols=None,
        predicate=None,
    ):
        key_cols = list(key_cols if key_cols is not None else S.KEY_COLS)
        schema_str = L._schema_to_str(schema)
        items = [
            {
                "part": p,
                "files": ([ent["base"]] if ent["base"] else []) + list(ent["deltas"]),
            }
            for p, ent in sorted(state_map.items())
        ]

        def fold_batch(b: pd.DataFrame) -> pa.Table:
            import pyarrow.compute as pc

            sch = L._schema_from_str(schema_str)
            fs = M.fragment_schema_for(sch, key_cols=key_cols)
            pay = M.payload_columns([f.name for f in sch], key_cols=key_cols)
            keep = (
                key_cols + pay + (["cursor", "seq"] if include_system else [])
            )
            outs = []
            for files in b["files"]:
                frames = [S.conform(pq.read_table(p), fs) for p in files]
                st = M.fold_fragments_table(frames, pay, key_cols=key_cols)
                if st is None or not st.num_rows:
                    continue
                st = st.filter(pc.invert(st.column(M.DELETED_COL)))
                if predicate is not None:
                    st = st.filter(predicate)  # post-fold: version-safe
                outs.append(st.select(keep))
            if not outs:
                return pa.schema([fs.field(c) for c in keep]).empty_table()
            return pa.concat_tables(outs, promote_options="permissive")

        ds = ray.data.from_items(items).map_batches(
            fold_batch, batch_format="pandas", batch_size=1
        )
        if columns:
            ds = ds.select_columns(columns)
        return ds

    def tag(self, name: str, cursor: int | None = None) -> str:
        """Pin a named snapshot tag at a committed cursor boundary
        (default: the current head). Read it back with
        ``read_lake(as_of_tag=name)``. See :meth:`raycdc.lake.Lake.tag`."""
        return self.lake.tag(name, cursor=cursor)

    def drop_tag(self, name: str) -> None:
        self.lake.drop_tag(name)

    def read_lake_pandas(self) -> pd.DataFrame:
        """Driver-side full materialization — tests/small lakes only."""
        df = self.read_lake(include_system=True).to_pandas()
        return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
            drop=True
        )

    def read_key(
        self,
        key,
        table: str | None = None,
        include_system: bool = False,
        as_of_cursor: int | None = None,
        as_of_round: str | None = None,
    ) -> pd.DataFrame:
        """Point lookup: the live (or snapshot) rows of ONE entity key,
        reading exactly one partition's fragments — the partition-pruned
        "current state of entity X" path (the reference serves this from a
        PostgreSQL primary-key index; here the lake's hash layout IS the
        index). Work is O(one partition), independent of lake size:
        ``hash(key) % P`` names the home partition, parquet row-group
        predicate pushdown prunes within its fragments, and the per-key
        fold runs on just the matching rows. Driver-side by design — a
        point lookup returns a handful of rows.

        Tables partitioned by a LONGER key prefix (``TableSpec.part_cols``,
        used when the first key column is low-cardinality, e.g. the tool
        index) can't name one home partition from the first column alone;
        for those the lookup degrades gracefully to a pruned scan of the
        table's partitions — row-group predicate pushdown (fragments are
        key-sorted, first column leading) keeps the read near the matching
        rows, and the table itself is skinny by design."""
        t_idx = self._table_index(table)
        nparts = self.lake.num_partitions
        spec_pcols = self.tables[t_idx].part_cols
        if spec_pcols is None or len(spec_pcols) == 1:
            home = int(
                P.assign_part(
                    np.asarray([key], dtype=object), nparts,
                    self.lake.hash_version,
                )[0]
            )
            prange = (t_idx * nparts + home, t_idx * nparts + home + 1)
        else:
            prange = (t_idx * nparts, (t_idx + 1) * nparts)
        if as_of_cursor is not None:
            as_of_round = self.lake.round_id_at_cursor(as_of_cursor)
        if as_of_round is not None:
            sm = self.lake.state_map_as_of(as_of_round, prange)
        else:
            sm = self.lake.live_state_map(prange)
        schema = self._table_schema(t_idx)
        key_cols = list(self.tables[t_idx].key_cols)
        sys_cols = ["cursor", "seq"] if include_system else []
        if schema is None:
            cols = key_cols + sys_cols
            return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
        fs = M.fragment_schema_for(schema, key_cols=key_cols)
        pay = M.payload_columns([f.name for f in schema], key_cols=key_cols)
        files = [
            f
            for ent in sm.values()
            for f in ([ent["base"]] if ent["base"] else []) + list(ent["deltas"])
        ]
        if not files:
            cols = key_cols + pay + sys_cols
            return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
        frames = [
            S.conform(
                pq.read_table(p, filters=[(key_cols[0], "==", key)]), fs
            )
            for p in files
        ]
        st = M.fold_fragments_table(frames, pay, key_cols=key_cols)
        if st is None or not st.num_rows:
            cols = key_cols + pay + sys_cols
            return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
        import pyarrow.compute as pc

        st = st.filter(pc.invert(st.column(M.DELETED_COL)))
        keep = key_cols + pay + sys_cols
        df = st.select(keep).to_pandas()
        return df.sort_values(key_cols, kind="stable").reset_index(drop=True)

    def merge_branch(self, branch) -> dict:
        """PROMOTE a diverged branch back into this lake (the write-side
        completion of :meth:`raycdc.lake.Lake.branch` — LakeFS merge /
        the WAP pattern at branch granularity: branch, validate on the
        branch, then fold its net effect back). The merge unit is the
        branch's CHANGEFEED since the two ledgers' common prefix — the
        net row-level delta of everything the branch did after the
        branch point — applied here as ONE epoch through the normal
        round path, so commit atomicity, fencing and rollback cover the
        promotion. Conflict semantics are the engine's guarded LWW: a
        row both sides touched resolves by (cursor, seq) arg-max,
        deterministically (a source row updated after the branch point
        with a higher cursor survives the merge; branch deletes arrive
        as tombstones). Re-merging an unchanged branch is a state no-op
        (exact (key, cursor, seq) re-deliveries dedup in the fold).
        Returns the apply metrics plus ``merge_base``; raises if the two
        lakes share no committed history."""
        import pyarrow.compute as pc

        # identity by recorded LINEAGE, never ledger coincidence: round
        # ids and cursor boundaries are deterministic per epoch numbering,
        # so unrelated lakes can collide on both
        my_id = self.lake.manifest.get("lake_id")
        if not my_id or branch.lake.manifest.get("branched_from") != my_id:
            raise ValueError(
                "merge_branch: no common committed history — the lake is "
                "not a recorded branch of this one (Lake.branch stamps "
                "lineage; merge into the branch's parent)"
            )
        base = branch.lake.manifest["branch_base"]
        self.lake.round_position(base)  # KeyError if rolled away here
        b = branch.lake.manifest["committed_rounds"]
        if b and b[-1]["round_id"] == base:
            return {"merge_base": base, "skipped": True}

        def to_events(t: pa.Table) -> pa.Table:
            op = pc.if_else(
                pc.equal(t.column("change_op"), pa.scalar("delete")),
                pa.scalar("delete"),
                pa.scalar("insert"),
            )
            return t.drop_columns(["change_op"]).append_column("op", op)

        feed = branch.read_changes(since_round=base)
        res = self.apply_dataset(
            feed.map_batches(to_events, batch_format="pyarrow")
        )
        res["merge_base"] = base
        return res

    def read_changes(
        self,
        since_round: str | None = None,
        since_cursor: int | None = None,
        table: str | None = None,
        until_round: str | None = None,
        until_cursor: int | None = None,
    ):
        """Change data feed: the NET row-level delta committed after the
        anchor round — one row per key whose stored watermark post-dates
        the anchor's high cursor, tagged ``change_op`` = ``upsert`` (the
        current value) or ``delete`` (tombstoned now; payload columns
        null). The Delta/Iceberg CDF analog of the reference's incremental
        export jobs (``indexer/controller/stream_controller.py`` feeding
        downstream sinks only what changed).

        Net semantics: intermediate versions between the anchor and now are
        not re-materialized (the lake stores the arg-max fold, not the
        event log — replay the change log itself for full history). A key
        inserted AND deleted after the anchor still emits a ``delete`` row
        (its tombstone is newer than the anchor).

        ``until_round`` / ``until_cursor`` bound the feed at a LATER
        committed round instead of the live state — the two-anchor window
        variant (changes committed in (since, until]), served from the
        snapshot at ``until`` and therefore bounded by the undo window
        like any snapshot; the open-ended form has no such bound (its
        filter runs on the CURRENT state's watermarks).

        Scale shape: partitions with no fragment committed after the
        anchor (and, for the window form, at or before ``until``) are
        pruned from the scan via the manifest alone, so cost is
        O(changed partitions), not O(lake)."""
        t_idx = self._table_index(table)
        nparts = self.lake.num_partitions
        prange = (t_idx * nparts, (t_idx + 1) * nparts)
        if since_cursor is not None:
            since_round = self.lake.round_id_at_cursor(since_cursor)
        if until_cursor is not None:
            until_round = self.lake.round_id_at_cursor(until_cursor)
        rounds = self.lake.manifest["committed_rounds"]
        if since_round is None:
            # bootstrap anchor "before everything": the feed emits the full
            # current (or as-of-until) state as upserts plus standing
            # tombstones as deletes — the first run of an incremental sink
            idx = -1
            anchor_cursor = -1
        else:
            idx = self.lake.round_position(since_round)
            anchor_cursor = int(rounds[idx]["cursor_hi"])
        if until_round is not None:
            u_idx = self.lake.round_position(until_round)
            if u_idx < idx:
                raise ValueError(
                    f"until round {until_round!r} precedes since round "
                    f"{since_round!r}"
                )
            after = {r["round_id"] for r in rounds[idx + 1 : u_idx + 1]}
            base_map = self.lake.state_map_as_of(until_round, prange)
        else:
            after = {r["round_id"] for r in rounds[idx + 1 :]}
            base_map = self.lake.live_state_map(prange)
        schema = self._table_schema(t_idx)
        key_cols = list(self.tables[t_idx].key_cols)
        touched = {
            int(p)
            for p, versions in self.lake.manifest["partitions"].items()
            if any(v["round"] in after for v in versions)
        }
        state_map = {
            p: ent for p, ent in base_map.items() if p in touched
        }
        if schema is None or not state_map:
            fs = M.fragment_schema_for(
                schema or S.CHANGE_SCHEMA, key_cols=key_cols
            )
            pay = M.payload_columns(
                [f.name for f in (schema or S.CHANGE_SCHEMA)],
                key_cols=key_cols,
            )
            keep = key_cols + pay + ["cursor", "seq"]
            empty = pa.schema(
                [fs.field(c) for c in keep]
                + [pa.field("change_op", pa.string())]
            ).empty_table()
            return ray.data.from_arrow(empty)
        schema_str = L._schema_to_str(schema)
        items = [
            {
                "part": p,
                "files": ([ent["base"]] if ent["base"] else [])
                + list(ent["deltas"]),
            }
            for p, ent in sorted(state_map.items())
        ]

        def change_batch(b: pd.DataFrame) -> pa.Table:
            import pyarrow.compute as pc

            sch = L._schema_from_str(schema_str)
            fs = M.fragment_schema_for(sch, key_cols=key_cols)
            pay = M.payload_columns([f.name for f in sch], key_cols=key_cols)
            keep = key_cols + pay + ["cursor", "seq"]
            out_schema = pa.schema(
                [fs.field(c) for c in keep]
                + [pa.field("change_op", pa.string())]
            )
            outs = []
            for files in b["files"]:
                frames = [S.conform(pq.read_table(p), fs) for p in files]
                st = M.fold_fragments_table(frames, pay, key_cols=key_cols)
                if st is None or not st.num_rows:
                    continue
                st = st.filter(
                    pc.greater(st.column("cursor"), pa.scalar(anchor_cursor))
                )
                if not st.num_rows:
                    continue
                deleted = st.column(M.DELETED_COL)
                for c in pay:
                    i = st.schema.get_field_index(c)
                    col = st.column(c)
                    st = st.set_column(
                        i, c,
                        pc.if_else(deleted, pa.scalar(None, col.type), col),
                    )
                op = pc.if_else(
                    deleted, pa.scalar("delete"), pa.scalar("upsert")
                )
                outs.append(st.select(keep).append_column("change_op", op))
            if not outs:
                return out_schema.empty_table()
            return pa.concat_tables(outs, promote_options="permissive")

        return ray.data.from_items(items).map_batches(
            change_batch, batch_format="pandas", batch_size=1
        )

    def expire(self, before_ts) -> dict:
        """TTL retention: tombstone every live primary-table row whose
        ``ts`` is older than ``before_ts`` — THROUGH the normal CDC path
        (one synthetic delete epoch at a fresh cursor), not a rewrite.
        That buys every engine invariant for free: the deletions surface
        in changefeeds/consumer groups as ordinary ``delete`` rows,
        guarded LWW makes them win over any stored watermark (the fresh
        cursor is > every committed one) while later real updates still
        beat them, derived tables refresh through their normal
        derivation, and a retention run applied in error ROLLS BACK like
        any round within the undo window. Victims are found with the
        ts predicate PUSHED into the fragment scan; the delete batch is
        O(victims), written by parallel tasks (apply_dataset), never the
        driver. Storage is reclaimed by the usual compact/vacuum cadence
        (tombstones fold into bases and age out of the undo window).

        Reference analog: ExportReorgJob's ranged delete+rewrite
        (``indexer/exporters/postgres_item_exporter.py:110-133``) — here
        expressed as first-class change events."""
        import pyarrow.dataset as pads

        from raycdc import schema as S

        bound = pd.Timestamp(before_ts).as_unit("us").to_datetime64()
        cur = int(self.lake.last_cursor()) + 1
        epoch = max(self.lake.processed_epochs(), default=0) + 1
        victims = self.read_lake(
            columns=["conv_id", "turn_idx", "ts"],
            predicate=pads.field("ts") < pa.scalar(bound, pa.timestamp("us")),
        )

        def to_deletes(t: pa.Table) -> pa.Table:
            n = t.num_rows
            ev = pa.table(
                {
                    "cursor": pa.array(np.full(n, cur, np.int64)),
                    "seq": pa.array(np.zeros(n, np.int64)),
                    "epoch": pa.array(np.full(n, epoch, np.int64)),
                    "op": pa.array(np.full(n, "delete", dtype=object)),
                    "conv_id": t.column("conv_id"),
                    "turn_idx": t.column("turn_idx"),
                }
            )
            return S.conform(ev, S.CHANGE_SCHEMA)

        res = self.apply_dataset(
            victims.map_batches(to_deletes, batch_format="pyarrow"),
            epoch=epoch,
        )
        res["expired_before"] = str(pd.Timestamp(before_ts))
        return res

    # -- changefeed consumer groups (named durable offsets) ----------------

    def _consumer_path(self, name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"bad consumer name {name!r}")
        d = os.path.join(self.lake.root, "consumers")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{name}.json")

    def consumer_status(self, name: str) -> dict:
        """The named consumer's durable offset state (fresh consumers have
        ``last_round is None`` — their next poll is the bootstrap window)."""
        path = self._consumer_path(name)
        if not os.path.exists(path):
            return {"name": name, "last_round": None, "table": None}
        with open(path) as f:
            st = json.load(f)
        st["name"] = name
        return st

    def consumer_reset(self, name: str) -> None:
        """Forget the named consumer's offset entirely — its next poll is
        the bootstrap window again. The recovery of last resort after a
        rollback erased every round the consumer ever anchored on (the
        sink must first be rolled back to empty or rebuilt: a bootstrap
        window re-upserts current state but cannot delete rows the sink
        applied from undone history)."""
        path = self._consumer_path(name)
        if os.path.exists(path):
            os.remove(path)

    def consumer_poll(self, name: str, table: str | None = None):
        """Next unconsumed changefeed window for a named consumer — the
        Kafka-consumer-group analog over the lake's changefeed (the
        reference's downstream sinks each track their own synced block
        range, ``indexer/controller/stream_controller.py``). Returns
        ``None`` when the consumer is caught up, else a dict with the
        window ``dataset`` (the two-anchor :meth:`read_changes` in
        ``(last_round, head]`` — PINNED at the head committed at poll
        time, so rounds landing mid-consumption never smear the window)
        and the ``ack_round`` to pass to :meth:`consumer_ack` after the
        sink durably applied it. Crash between poll and ack re-delivers
        the SAME window (net-delta windows are idempotent to re-apply —
        at-least-once delivery, exactly-once effect). Each consumer's
        offset is independent; polling takes no writer lock.

        A consumer whose anchor was erased by a rollback (its round is no
        longer committed) raises KeyError — reset it by deleting its state
        file or acking a live round."""
        t_idx = self._table_index(table)
        tbl = self.tables[t_idx].name
        st = self.consumer_status(name)
        if st["table"] not in (None, tbl):
            raise ValueError(
                f"consumer {name!r} is bound to table {st['table']!r}, "
                f"not {tbl!r} — one consumer per feed"
            )
        rounds = self.lake.manifest["committed_rounds"]
        if not rounds:
            return None
        head = rounds[-1]["round_id"]
        last = st["last_round"]
        if last == head:
            return None
        if last is not None:
            self.lake.round_position(last)  # KeyError if rolled away
        ds = self.read_changes(
            since_round=last, until_round=head, table=table
        )
        return {
            "dataset": ds,
            "since_round": last,
            "ack_round": head,
            "table": tbl,
        }

    def consumer_ack(
        self, name: str, ack_round: str, table: str | None = None
    ) -> dict:
        """Durably advance the named consumer to ``ack_round`` (must be a
        committed round — acking an unknown round raises instead of
        corrupting the offset). Atomic replace; re-acking the same round
        is a no-op, so sink retries are safe."""
        t_idx = self._table_index(table)
        tbl = self.tables[t_idx].name
        st = self.consumer_status(name)
        if st["table"] not in (None, tbl):
            raise ValueError(
                f"consumer {name!r} is bound to table {st['table']!r}, "
                f"not {tbl!r}"
            )
        self.lake.round_position(ack_round)
        path = self._consumer_path(name)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"last_round": ack_round, "table": tbl}, f)
        os.replace(tmp, path)
        return {"name": name, "last_round": ack_round, "table": tbl}

    def reshard(self, new_nparts: int) -> dict:
        """Online reshard N→M partitions — the operational answer when a
        lake outgrows (or over-shards) its partition count (Kafka
        repartition / Hudi clustering analog; the reference re-runs whole
        block ranges to re-layout,
        ``indexer/controller/reorg_controller.py``). Two-stage direct
        exchange in raw Ray tasks (maintenance work the Dataset API has no
        reason to express): stage 1 folds each OLD partition's fragment
        chain once — TOMBSTONES PRESERVED, so guarded-LWW protection
        against late stale updates survives the move — and slices it by
        the new hash; slices travel as object-store refs (spillable,
        never driver-held). Stage 2 writes one sorted base per NEW
        partition (keys are disjoint across old partitions, so concat
        needs no re-fold). The manifest then swaps atomically via
        :meth:`raycdc.lake.Lake.commit_reshard`: a zero-event barrier
        round — resumable replay fencing is untouched, but rollback and
        time travel cannot cross it (the old layout's files are gone).
        Merger pool and rebalance state reset (they are sized/keyed to
        the old layout)."""
        self.lake.ensure_writer_lock()
        if len(self.tables) > 1:
            raise NotImplementedError(
                "reshard currently supports primary-only lakes"
            )
        rounds = self.lake.manifest["committed_rounds"]
        if not rounds:
            raise ValueError("reshard needs at least one committed round")
        new_nparts = int(new_nparts)
        schema = self._table_schema(0)
        if schema is None:
            raise ValueError("reshard needs a non-empty lake schema")
        round_id = f"reshard-{len(rounds):06d}"
        key_cols = list(self.tables[0].key_cols)
        schema_str = L._schema_to_str(schema)
        state = self.lake.live_state_map((0, self.lake.num_partitions))
        shard_refs = [
            _reshard_partition.remote(
                ([ent["base"]] if ent["base"] else []) + list(ent["deltas"]),
                schema_str,
                key_cols,
                new_nparts,
                self.lake.hash_version,
            )
            for _, ent in sorted(state.items())
        ]
        by_new: dict[int, list] = {}
        for slices in ray.get(shard_refs):
            for p, ref in slices.items():
                by_new.setdefault(int(p), []).append(ref)
        writers = [
            _write_reshard_partition.remote(
                refs,
                schema_str,
                key_cols,
                self.lake.fragment_abspath(p, round_id, "base"),
            )
            for p, refs in sorted(by_new.items())
        ]
        rows = ray.get(writers)
        self.lake.commit_reshard(new_nparts, sorted(by_new), round_id)
        self._teardown_pool()
        self._part_assign = None
        self._part_cost = None
        # the broadcast push context carries the OLD-width assignment —
        # bump the revision so the next round re-broadcasts (same cache-key
        # discipline as rebalance moves)
        self._assign_rev += 1
        self._push_ctx_ref = None
        return {
            "round_id": round_id,
            "new_partitions": len(by_new),
            "num_partitions": new_nparts,
            "rows_moved": int(sum(rows)),
        }

    def compact(self) -> dict:
        """Force-fold every partition's outstanding delta chain into a
        fresh base fragment — the maintenance OPTIMIZE (the scheduled
        counterpart of the inline staggered compaction; the reference's
        batch fix/maintenance jobs). Each new base is tagged with the LAST
        committed round (a state-equivalent rewrite at an existing
        boundary), so rollback/snapshot/fencing semantics are untouched
        and rolling back that round deletes the compacted bases with it.

        Distributed: one raw Ray task per delta-bearing partition (fold +
        atomic rename — maintenance work the Dataset API has no reason to
        express); the manifest commit is a single driver-side swap after
        every file is in place. Deterministic output: a crash before the
        commit leaves orphans that a re-run rewrites byte-identically (and
        ``Lake.vacuum`` can reclaim). Merger caches are invalidated the
        same way rollback does; the fragment-signature check makes stale
        reuse impossible even without it."""
        rounds = self.lake.manifest["committed_rounds"]
        if not rounds:
            return {"compacted": 0}
        round_id = rounds[-1]["round_id"]
        todo = {
            p: ent
            for p, ent in self.lake.live_state_map().items()
            if ent["deltas"]
        }
        if not todo:
            return {"compacted": 0, "round_id": round_id}
        nparts = self.lake.num_partitions
        meta = {}
        for p in todo:
            t_idx = p // nparts
            if t_idx not in meta:
                meta[t_idx] = (
                    L._schema_to_str(self._table_schema(t_idx)),
                    list(self.tables[t_idx].key_cols),
                )
        refs = [
            _compact_partition.remote(
                ([ent["base"]] if ent["base"] else []) + list(ent["deltas"]),
                *meta[p // nparts],
                self.lake.fragment_abspath(p, round_id, "base"),
            )
            for p, ent in sorted(todo.items())
        ]
        ray.get(refs)
        self.lake.commit_compaction(sorted(todo))
        if self.exchange == "direct":
            ray.get([h.drop_cache.remote() for h in self._ensure_pool()])
        return {"compacted": len(todo), "round_id": round_id}


@ray.remote(num_cpus=1)
def _reshard_partition(
    files: list, schema_str: str, key_cols: list, new_nparts: int,
    hash_version: int,
) -> dict:
    """Fold one OLD partition (tombstones kept) and slice by the new hash.
    Returns {new_part: ObjectRef(slice table)} — data stays in the object
    store, only refs reach the driver."""
    _limit_arrow_threads()
    sch = L._schema_from_str(schema_str)
    fs = M.fragment_schema_for(sch, key_cols=key_cols)
    pay = M.payload_columns([f.name for f in sch], key_cols=key_cols)
    frames = [S.conform(pq.read_table(p), fs) for p in files]
    st = M.fold_fragments_table(frames, pay, key_cols=key_cols)
    if st is None or not st.num_rows:
        return {}
    part = P.assign_part(st.column("conv_id"), new_nparts, hash_version)
    return {
        int(p): ray.put(st.filter(pa.array(part == p)))
        for p in np.unique(part)
    }


@ray.remote(num_cpus=1)
def _write_reshard_partition(
    refs: list, schema_str: str, key_cols: list, dst: str
) -> int:
    """Concatenate one NEW partition's slices (disjoint keys — no fold
    needed), sort by key, atomically install the base fragment."""
    _limit_arrow_threads()
    sch = L._schema_from_str(schema_str)
    fs = M.fragment_schema_for(sch, key_cols=key_cols)
    tbls = [S.conform(t, fs) for t in ray.get(list(refs))]
    st = pa.concat_tables(tbls, promote_options="permissive")
    st = S.conform(st, fs).sort_by([(k, "ascending") for k in key_cols])
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = dst + f".tmp{os.getpid()}"
    pq.write_table(st, tmp)
    os.replace(tmp, dst)
    return st.num_rows


@ray.remote(num_cpus=1)
def _compact_partition(
    files: list, schema_str: str, key_cols: list, dst: str
) -> str:
    """Fold one partition's fragment chain and atomically install the new
    base. Deterministic content (same inputs → same bytes), pid-suffixed
    tmp for independent atomic renames on re-runs."""
    _limit_arrow_threads()
    sch = L._schema_from_str(schema_str)
    fs = M.fragment_schema_for(sch, key_cols=key_cols)
    pay = M.payload_columns([f.name for f in sch], key_cols=key_cols)
    frames = [S.conform(pq.read_table(p), fs) for p in files]
    st = M.fold_fragments_table(frames, pay, key_cols=key_cols)
    if st is None:
        st = fs.empty_table()
    st = S.conform(st, fs).sort_by([(k, "ascending") for k in key_cols])
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = dst + f".tmp{os.getpid()}"
    pq.write_table(st, tmp)
    os.replace(tmp, dst)
    return dst


def _salt_batch_fn(
    num_partitions: int,
    salt_factor: int,
    hash_version: int = P.HASH_VERSION_DEFAULT,
):
    def add_salt(batch: pa.Table) -> pa.Table:
        salt = P.assign_salted(
            batch.column("conv_id"),
            batch.column("turn_idx"),
            num_partitions,
            salt_factor,
            hash_version,
        )
        part = batch.column("part").to_numpy(zero_copy_only=False)
        derived = part >= num_partitions
        if derived.any():
            # derived-table rows get one salt per derived PART, in a range
            # disjoint from the primary salt space — the pre-fold then sees
            # pure derived groups and passes them through untouched
            salt = np.where(
                derived, num_partitions * salt_factor + part - num_partitions, salt
            )
        return batch.append_column(
            "salt", pa.array(salt.astype(np.int32), pa.int32())
        )

    return add_salt
