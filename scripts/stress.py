"""Order-of-magnitude stress tier for the CDC replay path.

The bench tier (sf0.1) replays ~8M events; the 10^10-event design point is
argued from the engine's O(round + touched-keys) per-round work. This
script measures ONE decade of that headroom directly: a ~80M-event
deterministic change log (same generator shape as the bench tier, 10x the
conversations) replayed end-to-end at full parallelism, with

  * wall time + sustained events/sec,
  * peak memory (sum RSS over the driver + every Ray worker process,
    sampled at 2 Hz, plus peak /dev/shm usage = object store + tmpfs
    lake), demonstrating the streaming executor stays memory-bounded
    when the log is 10x the bench tier,
  * an oracle spot check: K sampled conversations' final state compared
    against the DuckDB folded replay of just those conversations (the
    rollback rows are retained globally — reorg resolution is the one
    non-per-key part of the semantics).

Usage::

    python scripts/stress.py [n_convs] [cpus] [zipf_a]
    # defaults 4_800_000, 32, 1.1 (zipf_a=2.2 = extreme hot-conv skew)

Prints one JSON line; record the result in BASELINE.md.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONVS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_800_000
NCPU = int(sys.argv[2]) if len(sys.argv) > 2 else 32
ZIPF_A = float(sys.argv[3]) if len(sys.argv) > 3 else 1.1  # 2.2 = extreme skew
N_SPOT = 16


class RssTracker(threading.Thread):
    """Peak of (sum of RSS over this session's processes) and /dev/shm use.

    Worker RSS overcounts shared object-store pages (each mapper counts
    them), so the reported peak is CONSERVATIVE — real usage is lower."""

    def __init__(self):
        super().__init__(daemon=True)
        import psutil

        self._ps = psutil
        self.peak_rss = 0
        self.peak_one = 0  # largest single process (bounds per-worker heap)
        self.peak_shm = 0
        self._halt = threading.Event()

    def _sample(self) -> None:
        total = one = 0
        for p in self._ps.process_iter(["name", "memory_info"]):
            try:
                name = p.info["name"] or ""
                if p.pid == os.getpid() or name.startswith(
                    ("ray::", "raylet", "plasma", "default_worker")
                ):
                    mi = p.info["memory_info"]
                    if mi is None:  # zombie / access-denied under attrs=
                        continue
                    total += mi.rss
                    one = max(one, mi.rss)
            except Exception:  # racing process exits must not kill sampling
                continue
        self.peak_rss = max(self.peak_rss, total)
        self.peak_one = max(self.peak_one, one)
        u = shutil.disk_usage("/dev/shm")
        self.peak_shm = max(self.peak_shm, u.used)

    def run(self) -> None:
        while not self._halt.is_set():
            self._sample()
            self._halt.wait(0.5)

    def stop(self) -> None:
        self._halt.set()
        self.join(timeout=5)


def spot_check(eng, log_dir: str, spec) -> int:
    """Compare K sampled conversations' replayed state vs the DuckDB
    folded-replay oracle restricted to those conversations (+ all rollback
    rows, which are global). Returns the number of rows compared."""
    import duckdb
    import pandas as pd

    from raycdc.queries.cdc import CDC_REPLAY_SQL_TEMPLATE

    # deterministic spread across the conv space (includes hot low ids
    # under the zipf skew and cold tail ids). Key format mirrors the
    # generator exactly: utf8_lpad(conv, 6) — a MINIMUM of 6 digits, wider
    # convs keep their natural width (so {:06d} is the right formatter).
    step = max(1, spec.n_convs // N_SPOT)
    keys = [f"conv-{i * step:06d}" for i in range(N_SPOT)]

    inlist = ", ".join(f"'{k}'" for k in keys)
    where = f" WHERE conv_id IN ({inlist}) OR op = 'rollback'"
    sql = CDC_REPLAY_SQL_TEMPLATE.format(
        path=os.path.join(log_dir, "changes-*.parquet"), where=where
    )
    want = duckdb.connect().execute(sql).df()
    want = want.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
        drop=True
    )

    frames = [eng.read_key(k, include_system=True) for k in keys]
    got = pd.concat(frames, ignore_index=True)
    got = got[want.columns.tolist()]
    got = got.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
        drop=True
    )
    for c in ("turn_idx", "cursor", "seq"):
        got[c] = got[c].astype("int64")
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0
    return len(got)


def main() -> int:
    import ray

    # RAYCDC_OBJECT_STORE_MB caps the plasma store — the object-store
    # pressure harness (tests drive this to prove the replay completes and
    # stays correct when the working set must SPILL rather than fit)
    store_mb = int(os.environ.get("RAYCDC_OBJECT_STORE_MB", "0"))
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NCPU,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            **(
                {"object_store_memory": store_mb * 2**20}
                if store_mb
                else {}
            ),
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raycdc import gen
    from raycdc.engine import Engine

    spec = gen.GenSpec(
        seed=77, n_convs=N_CONVS, mean_turns=12, n_epochs=8, frac_dup=0.02,
        zipf_a=ZIPF_A,
    )
    t0 = time.perf_counter()
    log_dir = gen.cached_change_log(spec)
    gen_sec = round(time.perf_counter() - t0, 1)
    log_bytes = sum(
        os.path.getsize(os.path.join(log_dir, f)) for f in os.listdir(log_dir)
    )

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    lake_dir = f"{scratch}/raycdc-stress/lake-{gen.spec_fingerprint(spec)}-{NCPU}"
    shutil.rmtree(lake_dir, ignore_errors=True)

    tracker = RssTracker()
    tracker.start()
    eng = Engine(
        lake_dir, num_partitions=128, merge_concurrency=(2, max(4, NCPU))
    )
    t0 = time.perf_counter()
    rounds = eng.apply_log(log_dir, epochs_per_round=2)
    replay_sec = round(time.perf_counter() - t0, 2)
    tracker.stop()

    n_events = sum(r.get("n_events", 0) for r in rounds)
    live = eng.read_lake().count()
    spot_rows = spot_check(eng, log_dir, spec)
    eng.close()

    spilled_mb = None
    try:
        import re

        from ray._private.internal_api import memory_summary

        m = re.search(
            r"Spilled (\d+) MiB", memory_summary(stats_only=True)
        )
        spilled_mb = int(m.group(1)) if m else 0
    except Exception:
        pass

    out = {
        "metric": "stress_replay",
        "n_convs": N_CONVS,
        "events": n_events,
        "sec": replay_sec,
        "events_per_sec": round(n_events / replay_sec, 1),
        "rounds": len(rounds),
        "live_rows": live,
        "peak_rss_gb": round(tracker.peak_rss / 2**30, 2),
        "peak_one_proc_gb": round(tracker.peak_one / 2**30, 2),
        "peak_shm_gb": round(tracker.peak_shm / 2**30, 2),
        "gen_sec": gen_sec,
        "log_gb": round(log_bytes / 2**30, 2),
        "spot_check_rows": spot_rows,
        "num_cpus": NCPU,
        "zipf_a": ZIPF_A,
        "object_store_mb_cap": store_mb or None,
        "spilled_mb": spilled_mb,
    }
    print(json.dumps(out))
    shutil.rmtree(lake_dir, ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
