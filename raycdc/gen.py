"""Deterministic synthetic change-event-log generator.

Replaces the reference's "end-to-end job runs against live RPC at pinned
block numbers" test inputs (``indexer/tests/jobs/test_export_blocks_job.py:14-33``
in /root/reference) with seeded synthetic CDC streams over the transcript
schema (FIXTURES.md).

Architecture (v3): all ORDERING work (stream placement, versioning,
duplicates, reorg construction, epoch/cursor assignment) happens on a
numeric core — int columns only, so the 10^7-10^8-event bench corpora sort
and shuffle at numpy speed — and the payload strings are materialized
per-epoch at write time with Arrow kernels (compact UTF-8, C loops; numpy
unicode would be UTF-32 and pandas object strings were measured at
~31 µs/event end-to-end).

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
    With ``implicit_reorg`` the rollback event itself is omitted — the
    consumer must DETECT the overlap (consensus-check analog).
"""

from __future__ import annotations

import hashlib
import os
import shutil
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from raycdc.schema import CHANGE_SCHEMA

CURSOR_GROUP = 4  # events per cursor value (multiple statements per "block")
_BASE_TS = np.int64(1_700_000_000_000_000)  # 2023-11-14 UTC, microseconds

_OPS = np.asarray(["insert", "update", "delete", "rollback"], dtype=object)
_N_PADS = 16  # quantized text padding lengths (50..380 chars)
_PADS = ["x" * (50 + 22 * i) for i in range(_N_PADS)]


@dataclass
class GenSpec:
    """Knobs for one synthetic corpus (FIXTURES.md §3 tiers)."""

    seed: int = 42
    n_convs: int = 1000
    mean_turns: int = 12
    frac_update: float = 0.20
    frac_delete: float = 0.07
    frac_dup: float = 0.03
    # content duplication (distinct from at-least-once EVENT dups above):
    # every conv c with c % content_dup_every == 1 mirrors the TEXT of conv
    # c-1 (same turn/version → identical payload), planting real duplicate
    # content for fingerprint-index consumers; 0 = off (texts stay a pure
    # injective function of the key)
    content_dup_every: int = 0
    n_epochs: int = 4
    zipf_a: float = 1.1  # conv popularity skew for updates/deletes
    rollback_epochs: tuple = ()  # epochs whose effects get rolled back + replayed
    # implicit reorg: the orphaned range is re-emitted WITHOUT an explicit
    # rollback event — the consumer must DETECT the overlap (the reference's
    # parent-hash consensus check, indexer/jobs/check_block_consensus_job.py)
    implicit_reorg: bool = False
    evolve_at_epoch: int | None = None  # epochs >= this add tool_meta + widen turn_idx
    # planted malformed change rows (dead-letter fixtures): with k > 0,
    # data rows where cursor % 2k == 0 get an unknown op ("corrupt") and
    # rows where cursor % 2k == k get a NULL conv_id key — a pure function
    # of the cursor, so the engine's error channel and the SQL oracle
    # derive the SAME bad set from the same log. Rollback markers are
    # never corrupted. 0 = off.
    bad_row_every: int = 0
    shard_rows: int = 100_000  # rows per epoch shard file (read parallelism)
    roles: tuple = ("user", "assistant", "system", "tool")
    tools: tuple = ("search", "code", "browser", "calc")


# -- numeric core -----------------------------------------------------------


def _numeric_events(spec: GenSpec) -> pd.DataFrame:
    """The full event stream as NUMERIC columns in stream order:
    conv / turn / version / opc (0=ins 1=upd 2=del 3=rollback) /
    keep_role / keep_tool / canon / cursor / seq / epoch / rbc."""
    rng = np.random.default_rng(spec.seed)

    # -- base inserts: conv c has turns 0..T_c-1
    turns_per_conv = 1 + rng.geometric(1.0 / spec.mean_turns, size=spec.n_convs)
    conv_of_insert = np.repeat(
        np.arange(spec.n_convs, dtype=np.int64), turns_per_conv
    )
    total = int(turns_per_conv.sum())
    # turn index within conv: arange minus each conv's start offset
    starts = np.repeat(
        np.concatenate(([0], np.cumsum(turns_per_conv)[:-1])), turns_per_conv
    )
    turn_of_insert = np.arange(total, dtype=np.int64) - starts
    n_ins = total

    # -- updates/deletes target existing keys, Zipf-skewed over conversations
    n_upd = int(n_ins * spec.frac_update)
    n_del = int(n_ins * spec.frac_delete)
    weights = 1.0 / np.arange(1, spec.n_convs + 1) ** spec.zipf_a
    weights /= weights.sum()
    tgt_conv = rng.choice(spec.n_convs, size=n_upd + n_del, p=weights)
    tgt_turn = (rng.random(n_upd + n_del) * turns_per_conv[tgt_conv]).astype(
        np.int64
    )

    conv = np.concatenate([conv_of_insert, tgt_conv])
    turn = np.concatenate([turn_of_insert, tgt_turn])
    opc = np.concatenate(
        [
            np.zeros(n_ins, np.int8),
            np.ones(n_upd, np.int8),
            np.full(n_del, 2, np.int8),
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
    conv, turn, opc = conv[order], turn[order], opc[order]
    n = len(conv)

    # version of an update = 1 + how many updates to the same key came
    # before (stream order) — numpy rank-within-key, no pandas groupby
    version = np.zeros(n, dtype=np.int32)
    upd_idx = np.flatnonzero(opc == 1)
    if len(upd_idx):
        key = conv[upd_idx] * np.int64(1 << 32) + turn[upd_idx]
        o = np.argsort(key, kind="stable")
        ks = key[o]
        newk = np.ones(len(ks), dtype=bool)
        newk[1:] = ks[1:] != ks[:-1]
        gstart = np.flatnonzero(newk)
        counts = np.diff(np.append(gstart, len(ks)))
        pos = np.arange(len(ks)) - np.repeat(gstart, counts)
        v = np.empty(len(ks), np.int32)
        v[o] = pos.astype(np.int32) + 1
        version[upd_idx] = v

    keep_role = rng.random(n) < 0.3  # update patch masks (nulls = unchanged)
    keep_tool = rng.random(n) < 0.2

    pos = np.arange(n)
    cursor = (pos // CURSOR_GROUP + 1).astype(np.int64)
    seq = (pos % CURSOR_GROUP).astype(np.int32)
    # epoch boundaries MUST align to cursor-group boundaries: a rollback
    # targets a cursor, and a cursor split across two epochs would make
    # "state as of cursor c" ambiguous (Hemera reorgs whole blocks)
    per_epoch = -(-n // spec.n_epochs)
    per_epoch += (-per_epoch) % CURSOR_GROUP
    epoch = (pos // per_epoch).astype(np.int64)

    df = pd.DataFrame(
        {
            "conv": conv,
            "turn": turn,
            "version": version,
            "opc": opc,
            "keep_role": keep_role,
            "keep_tool": keep_tool,
            "canon": np.zeros(n, np.int8),
            "cursor": cursor,
            "seq": seq,
            "epoch": epoch,
            "rbc": np.full(n, -1, np.int64),
        }
    )

    # -- at-least-once duplicates: re-emit originals later in the SAME epoch
    n_dup = int(n * spec.frac_dup)
    if n_dup:
        src = rng.choice(n, size=n_dup, replace=False)
        df = pd.concat([df, df.iloc[src]], ignore_index=True)
        o = np.lexsort(
            (df["seq"].to_numpy(), df["cursor"].to_numpy(), df["epoch"].to_numpy())
        )
        df = df.iloc[o].reset_index(drop=True)

    # -- reorg construction: for each rollback epoch r, emit
    #    [epoch r orphaned] [rollback epoch] [epoch replay, canon payload]
    if spec.rollback_epochs:
        out_parts = []
        next_epoch = 0
        epoch_np = df["epoch"].to_numpy()
        for e in range(spec.n_epochs):
            part = df[epoch_np == e].copy()
            part["epoch"] = next_epoch
            out_parts.append(part)
            next_epoch += 1
            if e in spec.rollback_epochs:
                prev_max_cursor = int(
                    df.loc[epoch_np < e, "cursor"].max() if e > 0 else 0
                )
                if not spec.implicit_reorg:
                    rb = pd.DataFrame(
                        {
                            "conv": [-1], "turn": [-1], "version": [0],
                            "opc": np.int8(3), "keep_role": [False],
                            "keep_tool": [False], "canon": np.int8(0),
                            "cursor": [int(part["cursor"].max())],
                            "seq": np.int32(0), "epoch": [next_epoch],
                            "rbc": [prev_max_cursor],
                        }
                    )
                    out_parts.append(rb)
                    next_epoch += 1
                replay = part.copy()
                replay["epoch"] = next_epoch
                replay["canon"] = np.int8(1)
                out_parts.append(replay)
                next_epoch += 1
        df = pd.concat(out_parts, ignore_index=True)

    return df


# -- payload materialization (Arrow kernels) --------------------------------


def _materialize_table(spec: GenSpec, num: pd.DataFrame) -> pa.Table:
    """Numeric rows → change-event Arrow table (CHANGE_SCHEMA order/type).
    All string building is Arrow compute (UTF-8, C kernels)."""
    n = len(num)
    conv = num["conv"].to_numpy()
    turn = num["turn"].to_numpy()
    version = num["version"].to_numpy()
    opc = num["opc"].to_numpy()
    canon = num["canon"].to_numpy().astype(bool)
    keep_role = num["keep_role"].to_numpy()
    keep_tool = num["keep_tool"].to_numpy()
    is_rb = opc == 3
    is_del = opc == 2
    is_upd = opc == 1
    nulls = pa.nulls(n, pa.string())

    op = pa.DictionaryArray.from_arrays(
        pa.array(opc.astype(np.int8)), pa.array(_OPS, pa.string())
    ).cast(pa.string())

    conv_digits = pc.utf8_lpad(
        pc.cast(pa.array(np.maximum(conv, 0)), pa.string()), 6, padding="0"
    )
    conv_id = pc.binary_join_element_wise("conv-", conv_digits, "")
    conv_id = pc.if_else(pa.array(is_rb), nulls, conv_id)

    # role/tool from small lookup tables
    role_idx = (turn % len(spec.roles)).astype(np.int8)
    role = pa.DictionaryArray.from_arrays(
        pa.array(role_idx), pa.array(list(spec.roles), pa.string())
    ).cast(pa.string())
    tool_idx = ((conv + turn) % len(spec.tools)).astype(np.int8)
    tool_full = pa.DictionaryArray.from_arrays(
        pa.array(tool_idx), pa.array(list(spec.tools), pa.string())
    ).cast(pa.string())
    is_tool_role = role_idx == (
        spec.roles.index("tool") if "tool" in spec.roles else -1
    )
    tool = pc.if_else(pa.array(is_tool_role), tool_full, pa.scalar(""))

    # deterministic text: {conv}:{turn}:v{version}:{pad}[:canon] — content a
    # pure function of (conv, turn, version); pad length from a quantized
    # digest bucket. With content_dup_every, selected convs BORROW their
    # donor's conv in the text (identical payload where turn/version/canon
    # align) while conv_id keeps the real key — planted content dups.
    text_conv = conv
    if spec.content_dup_every:
        text_conv = conv.copy()
        m = (conv > 0) & (conv % spec.content_dup_every == 1)
        text_conv[m] = conv[m] - 1
    digest = pd.util.hash_array(
        (text_conv.astype(np.int64) * 1_000_003 + turn) * 31 + version
    )
    pad_idx = (digest % _N_PADS).astype(np.int8)
    pad = pa.DictionaryArray.from_arrays(
        pa.array(pad_idx), pa.array(_PADS, pa.string())
    ).cast(pa.string())
    ver_s = pc.binary_join_element_wise(
        "v", pc.cast(pa.array(version), pa.string()), ""
    )
    text = pc.binary_join_element_wise(
        pc.cast(pa.array(text_conv), pa.string()),
        pc.cast(pa.array(turn), pa.string()),
        ver_s,
        pad,
        ":",
    )
    text = pc.if_else(
        pa.array(canon),
        pc.binary_join_element_wise(text, "canon", ":"),
        text,
    )

    ts_us = _BASE_TS + conv * 3_600_000_000 + turn * 60_000_000 + version
    ts = pa.array(ts_us).cast(pa.timestamp("us"))

    # null rules: deletes carry no payload; updates set a random subset
    # (nulls = unchanged; text/ts always set on update); rollbacks carry
    # only the target cursor
    void = pa.array(is_del | is_rb)
    role = pc.if_else(pc.or_(pa.array(is_upd & ~keep_role), void), nulls, role)
    tool = pc.if_else(pc.or_(pa.array(is_upd & ~keep_tool), void), nulls, tool)
    text = pc.if_else(void, nulls, text)
    ts = pc.if_else(void, pa.nulls(n, pa.timestamp("us")), ts)

    if spec.bad_row_every:
        mod = num["cursor"].to_numpy() % (2 * spec.bad_row_every)
        op = pc.if_else(
            pa.array((mod == 0) & ~is_rb), pa.scalar("corrupt"), op
        )
        conv_id = pc.if_else(
            pa.array((mod == spec.bad_row_every) & ~is_rb), nulls, conv_id
        )

    rbc_np = num["rbc"].to_numpy()
    rbc = pa.array(rbc_np, pa.int64(), mask=(rbc_np < 0))
    turn_arr = pa.array(
        turn.astype(np.int32), pa.int32(), mask=is_rb
    )

    return pa.table(
        {
            "cursor": pa.array(num["cursor"].to_numpy(), pa.int64()),
            "seq": pa.array(num["seq"].to_numpy(), pa.int32()),
            "epoch": pa.array(num["epoch"].to_numpy(), pa.int64()),
            "op": op,
            "conv_id": conv_id,
            "turn_idx": turn_arr,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
            "rollback_to_cursor": rbc,
        }
    ).cast(CHANGE_SCHEMA)


def generate_events(spec: GenSpec) -> pd.DataFrame:
    """Full materialized event stream as a DataFrame in stream order
    (tests / oracle input). Bench-scale writers should use
    :func:`write_change_log`, which materializes per epoch."""
    return _materialize_table(spec, _numeric_events(spec)).to_pandas()


def _epoch_table(tbl: pa.Table, evolved: bool) -> pa.Table:
    if evolved:
        # schema evolution: widen turn_idx int32→int64, add tool_meta:string
        idx = tbl.schema.get_field_index("turn_idx")
        tbl = tbl.set_column(
            idx, pa.field("turn_idx", pa.int64()), tbl.column("turn_idx").cast(pa.int64())
        )
        tool = tbl.column("tool")
        meta = pc.if_else(
            pc.or_kleene(
                pc.is_null(tool), pc.equal(tool, pa.scalar(""))
            ),
            pa.nulls(tbl.num_rows, pa.string()),
            pc.binary_join_element_wise("meta:", tool.combine_chunks(), ""),
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
    num = _numeric_events(spec)
    paths = []
    epoch_np = num["epoch"].to_numpy()
    for e in np.unique(epoch_np):
        part = num[epoch_np == e]
        o = np.lexsort((part["seq"].to_numpy(), part["cursor"].to_numpy()))
        part = part.iloc[o]
        evolved = spec.evolve_at_epoch is not None and e >= spec.evolve_at_epoch
        # materialize text PER SHARD, not per epoch: a stress-tier epoch's
        # text column would overflow Arrow's 2 GiB string-offset limit in
        # one array. Shard boundaries are unchanged, so file contents are
        # byte-identical to whole-epoch materialization.
        n_shards = max(1, -(-len(part) // spec.shard_rows))
        for s in range(n_shards):
            chunk = part.iloc[s * spec.shard_rows : (s + 1) * spec.shard_rows]
            shard = _epoch_table(_materialize_table(spec, chunk), evolved)
            lo = shard.column("cursor")[0].as_py()
            hi = shard.column("cursor")[shard.num_rows - 1].as_py()
            suffix = f"-s{s:02d}" if n_shards > 1 else ""
            path = os.path.join(
                out_dir, f"changes-{int(e):06d}-{lo}-{hi}{suffix}.parquet"
            )
            pq.write_table(shard, path)
            paths.append(path)
    return paths


GEN_VERSION = 3  # bump when generation semantics change (invalidates caches)


def spec_fingerprint(spec: GenSpec) -> str:
    return hashlib.sha256(f"v{GEN_VERSION}:{spec!r}".encode()).hexdigest()[:16]


def cached_change_log(spec: GenSpec, root: str = "/tmp/raycdc-gen") -> str:
    """Generate-once cache keyed by the spec (bench reuses inputs).

    Publication is ATOMIC (generate into a PID-unique staging dir, then one
    ``os.rename`` into place) so concurrent processes sharing the cache
    (pytest + preflight + bench on one box) never observe, or write into, a
    half-generated log; the rename loser discards its redundant copy."""
    out_dir = os.path.join(root, spec_fingerprint(spec))
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    stage = f"{out_dir}.stage-{os.getpid()}"
    shutil.rmtree(stage, ignore_errors=True)
    write_change_log(spec, stage)
    with open(os.path.join(stage, "_DONE"), "w") as f:
        f.write(repr(spec))
    return atomic_publish(stage, out_dir)


def atomic_publish(stage: str, out_dir: str) -> str:
    """Publish a fully-built staging dir (must already contain ``_DONE``)
    to ``out_dir`` with one atomic ``os.rename``, safely under concurrent
    builders and readers sharing the cache root (pytest + preflight + bench
    on one box). The rename loser discards its redundant copy; a suspect
    leftover without ``_DONE`` is moved aside atomically — never rmtree'd in
    place, which could delete a complete copy published between check and
    removal — re-inspected, and restored if it turns out complete."""
    done = os.path.join(out_dir, "_DONE")
    for _ in range(2):
        try:
            os.rename(stage, out_dir)
            return out_dir
        except OSError:
            if os.path.exists(done):  # concurrent builder won the race
                shutil.rmtree(stage, ignore_errors=True)
                return out_dir
            trash = f"{out_dir}.trash-{os.getpid()}"
            try:
                os.rename(out_dir, trash)
            except FileNotFoundError:
                continue  # vanished (another cleaner); just retry publish
            if os.path.exists(os.path.join(trash, "_DONE")):
                # raced with a completed publish — restore it (or, if yet
                # another complete copy landed meanwhile, keep that one)
                try:
                    os.rename(trash, out_dir)
                except OSError:
                    shutil.rmtree(trash, ignore_errors=True)
                shutil.rmtree(stage, ignore_errors=True)
                return out_dir
            shutil.rmtree(trash, ignore_errors=True)  # genuine crash debris
    raise RuntimeError(f"could not publish staged dir at {out_dir}")
