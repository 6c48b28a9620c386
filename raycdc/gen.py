"""Deterministic synthetic change-event-log generator.

Replaces the reference's "end-to-end job runs against live RPC at pinned
block numbers" test inputs (``indexer/tests/jobs/test_export_blocks_job.py:14-33``
in /root/reference) with seeded synthetic CDC streams over the transcript
schema (FIXTURES.md). Fully vectorized (numpy/pandas) so bench-scale logs
generate quickly.

Stream contract (documented; the engine's salted path relies on it):
  * ``cursor`` is assigned from stream position and is monotone
    non-decreasing for *fresh* events; ``seq`` breaks ties within a cursor.
  * At-least-once duplicates are re-emissions of an earlier event carrying
    the event's ORIGINAL ``(cursor, seq, payload)``; duplicates are re-emitted
    within the same epoch as the original (a retried producer re-sends its
    in-flight batch — the analog of Hemera re-running a block range,
    ``indexer/controller/stream_controller.py:123-153``).
  * ``rollback`` events appear as single-event epochs and target a committed
    epoch boundary cursor (Hemera reorgs whole blocks,
    ``indexer/controller/reorg_controller.py:28-93``); the rolled-back cursor
    range is then re-emitted with different payloads (the "canonical chain").
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raycdc.schema import CHANGE_SCHEMA

CURSOR_GROUP = 4  # events per cursor value (multiple statements per "block")
_BASE_TS = np.int64(1_700_000_000_000_000)  # 2023-11-14 UTC, microseconds


@dataclass
class GenSpec:
    """Knobs for one synthetic corpus (FIXTURES.md §3 tiers)."""

    seed: int = 42
    n_convs: int = 1000
    mean_turns: int = 12
    frac_update: float = 0.20
    frac_delete: float = 0.07
    frac_dup: float = 0.03
    n_epochs: int = 4
    zipf_a: float = 1.1  # conv popularity skew for updates/deletes
    rollback_epochs: tuple = ()  # epochs whose effects get rolled back + replayed
    # implicit reorg: the orphaned range is re-emitted WITHOUT an explicit
    # rollback event — the consumer must DETECT the overlap (the reference's
    # parent-hash consensus check, indexer/jobs/check_block_consensus_job.py)
    implicit_reorg: bool = False
    evolve_at_epoch: int | None = None  # epochs >= this add tool_meta + widen turn_idx
    shard_rows: int = 100_000  # rows per epoch shard file (read parallelism)
    roles: tuple = ("user", "assistant", "system", "tool")
    tools: tuple = ("search", "code", "browser", "calc")


def _text_col(conv: np.ndarray, turn: np.ndarray, version: np.ndarray, rng) -> pd.Series:
    """Deterministic text: ``{conv}:{turn}:{digest}`` padded to a seeded
    length in [50, 400). Content is a pure function of (conv, turn, version)."""
    base = (
        pd.Series(conv).astype(str)
        + ":"
        + pd.Series(turn).astype(str)
        + ":v"
        + pd.Series(version).astype(str)
    )
    digest = pd.util.hash_array((conv.astype(np.int64) * 1_000_003 + turn) * 31 + version)
    pad_len = (digest % 350 + 50).astype(np.int64)
    filler = "x" * 512
    return base + ":" + pd.Series([filler[:n] for n in pad_len])


def _conv_ids(conv_num: np.ndarray) -> pd.Series:
    return "conv-" + pd.Series(conv_num).astype(str).str.zfill(6)


def generate_events(spec: GenSpec) -> pd.DataFrame:
    """Build the full event stream as a DataFrame in stream order, with
    ``cursor``/``seq``/``epoch`` assigned. Rollback construction included."""
    rng = np.random.default_rng(spec.seed)

    # -- base inserts: conv c has turns 0..T_c-1
    turns_per_conv = 1 + rng.geometric(1.0 / spec.mean_turns, size=spec.n_convs)
    conv_of_insert = np.repeat(np.arange(spec.n_convs), turns_per_conv)
    turn_of_insert = np.concatenate([np.arange(t) for t in turns_per_conv]).astype(np.int64)
    n_ins = len(conv_of_insert)

    # -- updates/deletes target existing keys, Zipf-skewed over conversations
    n_upd = int(n_ins * spec.frac_update)
    n_del = int(n_ins * spec.frac_delete)
    weights = 1.0 / np.arange(1, spec.n_convs + 1) ** spec.zipf_a
    weights /= weights.sum()
    tgt_conv = rng.choice(spec.n_convs, size=n_upd + n_del, p=weights)
    tgt_turn = (rng.random(n_upd + n_del) * turns_per_conv[tgt_conv]).astype(np.int64)

    conv = np.concatenate([conv_of_insert, tgt_conv])
    turn = np.concatenate([turn_of_insert, tgt_turn])
    op = np.concatenate(
        [
            np.full(n_ins, "insert"),
            np.full(n_upd, "update"),
            np.full(n_del, "delete"),
        ]
    )
    # stream placement: inserts early-ish, mutations later-ish (so most
    # mutations hit existing keys; upsert semantics cover the rest)
    u = np.concatenate(
        [
            rng.random(n_ins) * 0.7,
            0.2 + rng.random(n_upd + n_del) * 0.8,
        ]
    )
    order = np.argsort(u, kind="stable")
    conv, turn, op = conv[order], turn[order], op[order]
    n = len(conv)

    version = np.zeros(n, dtype=np.int64)
    is_upd = op == "update"
    # version of an update = 1 + how many updates to the same key came before
    df_v = pd.DataFrame({"c": conv, "t": turn, "i": np.arange(n)})
    upd_rank = df_v[is_upd].groupby(["c", "t"]).cumcount() + 1
    version[np.flatnonzero(is_upd)] = upd_rank.to_numpy()

    role = np.asarray(spec.roles)[turn % len(spec.roles)]
    tool = np.where(
        role == "tool", np.asarray(spec.tools)[(conv + turn) % len(spec.tools)], ""
    )
    text = _text_col(conv, turn, version, rng)
    ts = pd.to_datetime(
        _BASE_TS + conv.astype(np.int64) * 3_600_000_000 + turn * 60_000_000 + version,
        unit="us",
    )

    df = pd.DataFrame(
        {
            "op": op,
            "conv_id": _conv_ids(conv),
            "turn_idx": turn.astype(np.int32),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
        }
    )
    # deletes carry no payload; updates set a random subset (nulls = unchanged)
    del_mask = (df["op"] == "delete").to_numpy()
    for c in ("role", "text", "tool", "ts"):
        df.loc[del_mask, c] = None
    upd_mask = (df["op"] == "update").to_numpy()
    keep_role = rng.random(n) < 0.3
    keep_tool = rng.random(n) < 0.2
    df.loc[upd_mask & ~keep_role, "role"] = None
    df.loc[upd_mask & ~keep_tool, "tool"] = None  # text/ts always set on update

    # -- cursor / seq / epoch from stream position
    pos = np.arange(n)
    df["cursor"] = (pos // CURSOR_GROUP + 1).astype(np.int64)
    df["seq"] = (pos % CURSOR_GROUP).astype(np.int32)
    # epoch boundaries MUST align to cursor-group boundaries: a rollback
    # targets a cursor, and a cursor split across two epochs would make
    # "state as of cursor c" ambiguous (Hemera reorgs whole blocks)
    per_epoch = -(-n // spec.n_epochs)
    per_epoch += (-per_epoch) % CURSOR_GROUP
    df["epoch"] = (pos // per_epoch).astype(np.int64)
    df["rollback_to_cursor"] = pd.array([None] * n, dtype="Int64")

    # -- at-least-once duplicates: re-emit originals later in the SAME epoch
    n_dup = int(n * spec.frac_dup)
    if n_dup:
        src = rng.choice(n, size=n_dup, replace=False)
        dups = df.iloc[src].copy()
        # place each dup at the end of its epoch (stream order within the
        # epoch file is by (cursor, seq) anyway; position only affects split)
        df = (
            pd.concat([df, dups], ignore_index=True)
            .sort_values(["epoch", "cursor", "seq"], kind="stable")
            .reset_index(drop=True)
        )

    # -- reorg construction: for each rollback epoch r, emit
    #    [epoch r orphaned] [rollback epoch] [epoch replay with new payload]
    if spec.rollback_epochs:
        out_parts = []
        next_epoch = 0
        for e in range(spec.n_epochs):
            part = df[df["epoch"] == e].copy()
            part["epoch"] = next_epoch
            out_parts.append(part)
            next_epoch += 1
            if e in spec.rollback_epochs:
                prev_max_cursor = int(
                    df.loc[df["epoch"] < e, "cursor"].max() if e > 0 else 0
                )
                if not spec.implicit_reorg:
                    rb = pd.DataFrame(
                        {
                            "op": ["rollback"],
                            "conv_id": [None],
                            "turn_idx": pd.array([None], dtype="Int32"),
                            "role": [None],
                            "text": [None],
                            "tool": [None],
                            "ts": [pd.NaT],
                            "cursor": [int(part["cursor"].max())],
                            "seq": np.int32(0),
                            "epoch": [next_epoch],
                            "rollback_to_cursor": pd.array([prev_max_cursor], dtype="Int64"),
                        }
                    )
                    out_parts.append(rb)
                    next_epoch += 1
                replay = part.copy()
                replay["epoch"] = next_epoch
                repl_mask = replay["text"].notna().to_numpy()
                replay.loc[repl_mask, "text"] = replay.loc[repl_mask, "text"] + ":canon"
                out_parts.append(replay)
                next_epoch += 1
        df = pd.concat(out_parts, ignore_index=True)

    return df


def _epoch_table(part: pd.DataFrame, evolved: bool, rng) -> pa.Table:
    part = part.sort_values(["cursor", "seq"], kind="stable")
    tbl = pa.Table.from_pandas(part, preserve_index=False)
    tbl = tbl.select([f.name for f in CHANGE_SCHEMA])
    tbl = tbl.cast(CHANGE_SCHEMA)
    if evolved:
        # schema evolution: widen turn_idx int32→int64, add tool_meta:string
        idx = tbl.schema.get_field_index("turn_idx")
        tbl = tbl.set_column(
            idx, pa.field("turn_idx", pa.int64()), tbl.column("turn_idx").cast(pa.int64())
        )
        meta = pa.array(
            [
                None if t is None or t == "" else f"meta:{t}"
                for t in tbl.column("tool").to_pylist()
            ],
            pa.string(),
        )
        tbl = tbl.append_column("tool_meta", meta)
    return tbl


def write_change_log(spec: GenSpec, out_dir: str) -> list[str]:
    """Write each epoch as cursor-ranged shard files:
    ``changes-{epoch:06d}-{cursor_lo}-{cursor_hi}[-sNN].parquet`` (mirrors
    the reference's block-ranged file naming,
    ``indexer/exporters/csv_file_item_exporter.py:45-112``; sharding mirrors
    a real log's many files per commit range and gives the scan its read
    parallelism). Returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    df = generate_events(spec)
    rng = np.random.default_rng(spec.seed + 1)
    paths = []
    for e, part in df.groupby("epoch", sort=True):
        evolved = spec.evolve_at_epoch is not None and e >= spec.evolve_at_epoch
        tbl = _epoch_table(part, evolved, rng)
        n_shards = max(1, -(-tbl.num_rows // spec.shard_rows))
        for s in range(n_shards):
            shard = tbl.slice(s * spec.shard_rows, spec.shard_rows)
            lo = shard.column("cursor")[0].as_py()
            hi = shard.column("cursor")[shard.num_rows - 1].as_py()
            suffix = f"-s{s:02d}" if n_shards > 1 else ""
            path = os.path.join(
                out_dir, f"changes-{int(e):06d}-{lo}-{hi}{suffix}.parquet"
            )
            pq.write_table(shard, path)
            paths.append(path)
    return paths


GEN_VERSION = 2  # bump when generation semantics change (invalidates caches)


def spec_fingerprint(spec: GenSpec) -> str:
    return hashlib.sha256(f"v{GEN_VERSION}:{spec!r}".encode()).hexdigest()[:16]


def cached_change_log(spec: GenSpec, root: str = "/tmp/raycdc-gen") -> str:
    """Generate-once cache keyed by the spec (bench reuses inputs)."""
    out_dir = os.path.join(root, spec_fingerprint(spec))
    done = os.path.join(out_dir, "_DONE")
    if not os.path.exists(done):
        write_change_log(spec, out_dir)
        with open(done, "w") as f:
            f.write(repr(spec))
    return out_dir
