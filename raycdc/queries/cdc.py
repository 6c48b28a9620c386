"""CDC query entries: the flagship transcript replay (generated log →
engine → lake) and an events-table CDC apply whose final state is
SQL-checkable against DuckDB — the relational witness for the merge kernel.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

from raycdc import gen
from raycdc import merge as M
from raycdc import partition as P
from raycdc.engine import Engine
from raycdc.queries import common as C

# corpus size keyed by the sf directory name (no external data; generated
# deterministically under /tmp and cached by spec fingerprint)
_SPEC_BY_SF = {
    "sf0.001": dict(n_convs=500, mean_turns=8, n_epochs=4),
    "sf0.01": dict(n_convs=4000, mean_turns=10, n_epochs=6),
    "sf0.1": dict(n_convs=20000, mean_turns=12, n_epochs=8),
}


def _spec_for(sf_dir: str, **overrides) -> gen.GenSpec:
    base = _SPEC_BY_SF.get(os.path.basename(os.path.normpath(sf_dir)))
    if base is None:
        base = dict(n_convs=500, mean_turns=8, n_epochs=4)
    base = dict(base)
    # plant content duplicates (~10% of convs mirror a donor's text) so the
    # fingerprint index has real duplicate groups to serve
    # (cdc_neardup_candidates); every oracle reads the same generated log,
    # so the whole CDC family stays self-consistent
    base.setdefault("content_dup_every", 10)
    base.update(overrides)
    return gen.GenSpec(seed=42, **base)


def _scratch_lake(spec: gen.GenSpec, tag: str) -> str:
    """Per-process scratch lake root for a query replay. The dir is wiped
    and rebuilt fresh on every call, so a stable name buys nothing — and a
    PID-unique name keeps concurrent processes (pytest + preflight + bench
    on one box) from rmtree-ing each other's half-replayed lake."""
    return os.path.join(
        "/tmp/raycdc-lakes",
        f"{gen.spec_fingerprint(spec)}-{tag}-p{os.getpid()}",
    )


# process-level replay memo: the replay is DETERMINISTIC per
# (spec fingerprint, variant), so the 8 CDC queries that each need the
# replayed lake share ONE replay instead of wiping and rebuilding it per
# query — the r03 driver pass burned its budget on ~8 identical replays
# and never reached query modules 6-12 (VERDICT r3, "what's wrong #4").
# PID-unique lake dirs + the writer lock make per-process reuse safe.
_ENGINE_MEMO: dict[tuple, Engine] = {}

# partition count of every memoized query lake; the cdc_partition_stats
# oracle bakes this into its SQL (`% _MEMO_NPARTS`), so both sides must
# read the same constant
_MEMO_NPARTS = 32


def _memo_engine(
    sf_dir: str,
    tag: str,
    *,
    salted: bool = False,
    tables=None,
    spec_overrides: dict | None = None,
    engine_kwargs: dict | None = None,
) -> Engine:
    """Replay the sf tier's generated change log into a /tmp lake ONCE per
    process per variant and return the (closed, read-only) Engine; the lake
    is then consumed as a streaming Dataset via ``read_lake`` — never
    materialized driver-side by the callers."""
    spec = _spec_for(sf_dir, rollback_epochs=(1,), **(spec_overrides or {}))
    key = (gen.spec_fingerprint(spec), tag)
    eng = _ENGINE_MEMO.get(key)
    if eng is not None:
        return eng
    log_dir = gen.cached_change_log(spec)
    lake_dir = _scratch_lake(spec, tag)
    shutil.rmtree(lake_dir, ignore_errors=True)  # fresh deterministic replay
    kwargs = {"tables": tables} if tables is not None else {}
    kwargs.update(engine_kwargs or {})
    eng = Engine(lake_dir, num_partitions=_MEMO_NPARTS, salted=salted, **kwargs)
    eng.apply_log(log_dir, epochs_per_round=2)
    eng.close()  # release merger CPUs; the read path doesn't need the pool
    _ENGINE_MEMO[key] = eng
    return eng


def _replayed_engine(sf_dir: str, salted: bool) -> Engine:
    return _memo_engine(sf_dir, "s" if salted else "h", salted=salted)


def _replay(sf_dir: str, salted: bool) -> "pd.DataFrame":
    return _replayed_engine(sf_dir, salted).read_lake_pandas()


def cdc_replay(sf_dir: str):
    """Flagship: full transcript CDC replay (insert/update/delete/dup +
    one reorg rollback) through the engine; returns the final lake table.
    (The driver hashes the result, so this one query returns the full lake
    as a DataFrame; every derived query streams via ``read_lake``.)"""
    return _replay(sf_dir, salted=False)


def cdc_replay_salted(sf_dir: str):
    """Same replay through the salted skew path; must be identical."""
    return _replay(sf_dir, salted=True)


def _evolve_epoch(sf_dir: str) -> int:
    """Evolution point for the schema-evolution replay: halfway through the
    tier's epochs, so the log is a genuine mixed-schema stream (old-schema
    shards before it, widened + extended shards after)."""
    return _spec_for(sf_dir).n_epochs // 2


def cdc_schema_evolution(sf_dir: str):
    """Driver witness for the schema-evolution pillar: replay a change log
    whose LATER epochs widen ``turn_idx`` int32→int64 and add a
    ``tool_meta: string`` column mid-stream (``gen._epoch_table``). The
    engine unifies schemas Arrow-natively (``schema.evolve``): the lake
    manifest's schema commits with the round that first saw the new shape,
    old fragments are conformed at read (missing column → nulls, narrow
    ints widened), and the per-column last-non-null fold applies to the
    new column exactly as to the original ones. Reference analog: the
    Alembic add-column migration applied to a live table
    (``migrations/versions/20240708_tokens_table_add_column_block_number.py``).
    The oracle replays the SAME mixed-schema log in DuckDB via
    ``union_by_name`` — final table state must match bit-for-bit."""
    eng = _memo_engine(
        sf_dir, "ev", spec_overrides={"evolve_at_epoch": _evolve_epoch(sf_dir)}
    )
    return eng.read_lake_pandas()


# every 2*37th data event gets an unknown op, every other 37th a NULL key —
# a pure function of the cursor (gen.GenSpec.bad_row_every), so the SQL
# oracle derives the identical bad set from the same log files
_DL_BAD_EVERY = 37


def cdc_dead_letter(sf_dir: str):
    """Dead-letter channel as a first-class observable: replay a log with
    planted malformed change rows (unknown op / NULL key) under
    ``error_policy="record"`` — the normalize stage diverts bad rows to the
    lake's ``errors/`` parquet side channel (idempotent per-round file
    names) and the replay completes on the good rows. Returns the diverted
    rows. Reference analog: the buffered ExceptionRecorder + FAST mode's
    log-and-continue (``indexer/utils/exception_recorder.py:11-72``,
    ``indexer/executors/batch_work_executor.py:120-137``). The side channel
    survives reorg rollbacks (an orphaned round's bad rows stay recorded),
    so the oracle is simply every malformed data row in the log — verified
    to hold ACROSS this spec's rollback epoch."""
    from raycdc import errors as E

    eng = _memo_engine(
        sf_dir, "dl",
        spec_overrides={"bad_row_every": _DL_BAD_EVERY},
        engine_kwargs={"error_policy": "record"},
    )
    ds = E.read_errors(eng.lake.root)
    assert ds is not None, "dead-letter spec plants bad rows; none recorded"

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t.column("conv_id").cast(pa.string()),
                "turn_idx": t.column("turn_idx").cast(pa.int64()),
                "op": t.column("op").cast(pa.string()),
                "cursor": t.column("cursor").cast(pa.int64()),
                "error_reason": t.column("error_reason").cast(pa.string()),
            }
        )

    return ds.map_batches(proj, batch_format="pyarrow")


def cdc_partition_stats(sf_dir: str):
    """Per-partition lineage/metrics observable of the replayed lake:
    ``(partition, n_rows, n_convs, max_cursor)`` — the "per-partition
    cursor + checkpoint" surface an operator watches (the reference's
    per-range sync-record monitoring,
    ``indexer/controller/dispatcher/base_dispatcher.py`` +
    ``common/services/failure_recorder.py``). Fully oracle-checked: the
    v2 routing hash has an exact DuckDB mirror
    (``partition.sql_hash_v2_query``), so the SQL recomputes each key's
    home partition bit-for-bit. Scale shape: per-batch fold to
    (partition, conv) partials, one bounded shuffle, 32-row output."""
    eng = _replayed_engine(sf_dir, salted=False)
    hv = eng.lake.hash_version
    assert hv == 2, "oracle mirrors hash v2 only"
    nparts = eng.lake.num_partitions
    assert nparts == _MEMO_NPARTS, "oracle bakes _MEMO_NPARTS into its SQL"

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["partition"] = P.assign_part(
            b["conv_id"].to_numpy(), nparts, hv
        ).astype("int64")
        out = b.groupby(["partition", "conv_id"], as_index=False).agg(
            n=("cursor", "size"), max_cursor=("cursor", "max")
        )
        return out

    def fin(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("partition", as_index=False).agg(
            n_rows=("n", "sum"),
            n_convs=("conv_id", "nunique"),
            max_cursor=("max_cursor", "max"),
        )
        for c in ("n_rows", "n_convs", "max_cursor"):
            out[c] = out[c].astype("int64")
        return out[["partition", "n_rows", "n_convs", "max_cursor"]]

    ds = eng.read_lake(columns=["conv_id", "cursor"], include_system=True)
    partials = ds.map_batches(partial, batch_format="pandas")
    return C.by_partition(partials, "partition", fin)


def cdc_cascade(sf_dir: str):
    """Replication-loop witness: lake A's CHANGEFEED, re-ingested into a
    SECOND lake with a different partition layout, must reproduce A
    bit-for-bit — the Debezium-style property that the feed is a complete
    replication stream, and the reference's stream-controller → downstream
    sink loop (``indexer/controller/stream_controller.py``) closed end to
    end. Two windows exercise composition: a bootstrap feed to the mid
    snapshot (round -2), then the (mid, live] window — each feed row is a
    FULL folded row with its original (cursor, seq), so applying them as
    LWW inserts/deletes reproduces A's payload AND system columns. B uses
    8 partitions vs A's 32: the result is layout-independent by
    construction, and the oracle is the SAME replay SQL as ``cdc_replay``."""
    import pyarrow.compute as pc

    spec = _spec_for(sf_dir, rollback_epochs=(1,))
    key = (gen.spec_fingerprint(spec), "casc")
    eng_b = _ENGINE_MEMO.get(key)
    if eng_b is None:
        eng_a = _replayed_engine(sf_dir, salted=False)
        mid_round, _ = _snapshot_round_epoch(sf_dir)

        def to_changes(t: pa.Table) -> pa.Table:
            op = pc.if_else(
                pc.equal(t.column("change_op"), pa.scalar("delete")),
                pa.scalar("delete"),
                pa.scalar("insert"),
            )
            return t.drop_columns(["change_op"]).append_column("op", op)

        lake_b = _scratch_lake(spec, "casc")
        shutil.rmtree(lake_b, ignore_errors=True)
        eng_b = Engine(lake_b, num_partitions=8)
        for epoch, feed in (
            (1, eng_a.read_changes(until_round=mid_round)),
            (2, eng_a.read_changes(since_round=mid_round)),
        ):
            eng_b.apply_dataset(
                feed.map_batches(to_changes, batch_format="pyarrow"),
                epoch=epoch,
            )
        eng_b.close()
        _ENGINE_MEMO[key] = eng_b
    return eng_b.read_lake_pandas()


def cdc_mirror(sf_dir: str):
    """Lake→lake mirroring through the changefeed CONSUMER-GROUP protocol
    (:func:`raycdc.exporters.replicate_lake`): a named durable consumer
    polls the source's net-delta windows and applies each as ONE
    deterministic epoch on the replica (epoch = src ledger position, so
    re-delivery lands in the replica's epoch fence — exactly-once effect).
    vs ``cdc_cascade`` (manual two-window feed re-ingest) this drives the
    full production loop: poll → apply → ack, caught-up no-op, and the
    replayed tick after a dropped ack. Feed rows are FULL folded rows with
    their original (cursor, seq), applied as full-state inserts (null means
    null — update's patch semantics would resurrect stale replica values),
    so the replica must equal the source bit-for-bit: the oracle is the
    SAME replay SQL as ``cdc_replay``. Reference analog: the stream
    controller's per-sink synced block ranges
    (``indexer/controller/stream_controller.py``)."""
    from raycdc.exporters import replicate_lake

    spec = _spec_for(sf_dir, rollback_epochs=(1,))
    key = (gen.spec_fingerprint(spec), "mirror")
    eng_b = _ENGINE_MEMO.get(key)
    if eng_b is None:
        eng_a = _replayed_engine(sf_dir, salted=False)
        lake_b = _scratch_lake(spec, "mirror")
        shutil.rmtree(lake_b, ignore_errors=True)
        eng_b = Engine(lake_b, num_partitions=8)
        out = replicate_lake(eng_a, eng_b, consumer="mirror-q")
        assert out["windows"] == 1, out
        # caught-up tick is a no-op (the consumer offset is durable)
        assert replicate_lake(eng_a, eng_b, consumer="mirror-q")["windows"] == 0
        # dropped-ack probe: rewind the consumer to the first committed
        # round and tick again — the re-delivered overlap must be absorbed
        # by the epoch fence / idempotent re-apply, leaving state unchanged
        first = eng_a.lake.manifest["committed_rounds"][0]["round_id"]
        eng_a.consumer_ack("mirror-q", first)
        replicate_lake(eng_a, eng_b, consumer="mirror-q")
        eng_b.close()
        _ENGINE_MEMO[key] = eng_b
    return eng_b.read_lake_pandas()


_MIRROR_SHARDS = 2


def cdc_mirror_sharded(sf_dir: str):
    """Key-sharded replica FAN-OUT: :func:`raycdc.exporters.replicate_lake`
    with ``shard=(i, N)`` feeds N independent replicas, each holding only
    the keys whose v2 hash lands in its shard — the Postgres
    logical-replication publication / Kafka partitioned-topic pattern, on
    the same exactly-once consumer protocol as ``cdc_mirror``. The filter
    is on the KEY (never the payload), so delete rows (payload nulled)
    route with the upserts they tombstone and the shards partition the
    source exactly. Result: the union of all replica reads tagged with the
    shard id; the oracle recomputes the SAME v2 hash in SQL
    (``partition.sql_hash_v2_query``) over the replay fold — checking both
    completeness (union = source) and exact routing (shard = hash % N)."""
    from raycdc.exporters import replicate_lake

    spec = _spec_for(sf_dir, rollback_epochs=(1,))
    eng_a = _replayed_engine(sf_dir, salted=False)
    parts = []
    for i in range(_MIRROR_SHARDS):
        key = (gen.spec_fingerprint(spec), f"shard{i}")
        eng_i = _ENGINE_MEMO.get(key)
        if eng_i is None:
            lake_i = _scratch_lake(spec, f"shard{i}")
            shutil.rmtree(lake_i, ignore_errors=True)
            eng_i = Engine(lake_i, num_partitions=4)
            replicate_lake(
                eng_a, eng_i, consumer=f"shard-q{i}",
                shard=(i, _MIRROR_SHARDS),
            )
            eng_i.close()
            _ENGINE_MEMO[key] = eng_i
        df = eng_i.read_lake_pandas()
        df["shard"] = np.int64(i)
        parts.append(df)
    return pd.concat(parts, ignore_index=True)


def _mirror_sharded_sql(replay: str) -> str:
    hashed = P.sql_hash_v2_query(f"SELECT * FROM ({replay})", "conv_id")
    return (
        f"SELECT * EXCLUDE (_h), CAST(_h % {_MIRROR_SHARDS} AS BIGINT)"
        f" AS shard\nFROM ({hashed})"
    )


def cdc_consolidate(sf_dir: str):
    """Multi-source FAN-IN (:func:`raycdc.exporters.consolidate_lakes`):
    two independent source lakes (the plain and the salted replay — bit-
    identical by the engine's own contract, which makes the oracle exact)
    mirror into ONE destination table under disjoint key namespaces
    ``a/…`` / ``b/…`` with per-source consumers and epoch namespaces.
    The oracle is the replay fold UNION ALL'd once per prefix — checking
    that consolidation preserves every source row, key-namespaces exactly,
    and never cross-contaminates LWW between sources."""
    from raycdc.exporters import consolidate_lakes

    spec = _spec_for(sf_dir, rollback_epochs=(1,))
    key = (gen.spec_fingerprint(spec), "fanin")
    eng_c = _ENGINE_MEMO.get(key)
    if eng_c is None:
        sources = {
            "a": _replayed_engine(sf_dir, salted=False),
            "b": _replayed_engine(sf_dir, salted=True),
        }
        dest = _scratch_lake(spec, "fanin")
        shutil.rmtree(dest, ignore_errors=True)
        eng_c = Engine(dest, num_partitions=8)
        out = consolidate_lakes(sources, eng_c)
        assert {k: v["windows"] for k, v in out.items()} == {"a": 1, "b": 1}
        # incremental semantics: a caught-up re-run consolidates nothing
        out2 = consolidate_lakes(sources, eng_c)
        assert all(v["windows"] == 0 for v in out2.values())
        eng_c.close()
        _ENGINE_MEMO[key] = eng_c
    return eng_c.read_lake_pandas()


def _consolidate_sql(replay: str) -> str:
    cols = "turn_idx, role, text, tool, ts, cursor, seq"
    return (
        f"WITH replay AS ({replay})\n"
        f"SELECT 'a/' || conv_id AS conv_id, {cols} FROM replay\n"
        f"UNION ALL\n"
        f"SELECT 'b/' || conv_id AS conv_id, {cols} FROM replay"
    )


# line-dedup pack key: conv number (< 2^20 at every tier) × 2^20 + turn_idx
_LINE_PACK = 1 << 20


def cdc_line_dedup(sf_dir: str):
    """LINE-level corpus dedup over the assembled conversation corpus —
    the CCNet preprocessing step (Wenzek et al., arXiv 1911.00359 §4.1;
    also RefinedWeb, arXiv 2306.01116): every document line survives ONLY
    at its first corpus occurrence; later identical lines (the generated
    log plants ~10% mirrored-content conversations, plus short repeated
    turns) are dropped, and each document is reassembled from its
    surviving lines. Here document = live conversation, line =
    ``role: text`` per turn, first = minimum (conv number, turn_idx)
    pack — an int64, so the winner rule is identical in both engines.

    Scale shape (100 TB): NO join and no driver gather — two bounded
    shuffles of the corpus, each followed by one vectorized kernel:
    (1) partition by H(line) (``phash`` — SQL-expressible, collisions
    identical both sides), sort (h, pack), keep each hash's first row;
    (2) partition by conv_id, lexsort, per-group C-speed ``str.join``
    (the ``cdc_conv_text`` reassembly pattern). Reference analog: the
    content-hash dedup scattered through the reference's custom modules
    (``indexer/modules/custom/*`` fingerprint jobs), recast as the
    LLM-corpus line dedup."""
    from raycdc import phash as H

    eng = _replayed_engine(sf_dir, salted=False)
    ds = eng.read_lake(columns=["conv_id", "turn_idx", "role", "text"])

    def line_rows(b: pd.DataFrame) -> pd.DataFrame:
        line = (
            b["role"].fillna("").astype(str)
            + ": "
            + b["text"].fillna("").astype(str)
        )
        conv = b["conv_id"].astype(str)
        num = conv.str.slice(5).astype("int64").to_numpy()
        pack = num * _LINE_PACK + b["turn_idx"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "conv_id": conv.to_numpy(dtype=object),
                "turn_idx": b["turn_idx"].to_numpy().astype("int64"),
                "line": line.to_numpy(dtype=object),
                "h": H.poly_hash(line.to_numpy()).astype(np.int64),
                "pack": pack,
            }
        )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return g.drop(columns=["h", "pack"])
        d = g.sort_values(["h", "pack"], kind="stable")
        hh = d["h"].to_numpy()
        first = np.ones(len(d), bool)
        first[1:] = hh[1:] != hh[:-1]
        return d[first].drop(columns=["h", "pack"])

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "conv_id": pd.Series(dtype=object),
                    "n_kept": pd.Series(dtype="int64"),
                    "kept_chars": pd.Series(dtype="int64"),
                    "doc": pd.Series(dtype=object),
                }
            )
        d = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        key = d["conv_id"].to_numpy()
        grp = d["line"].groupby(key)
        doc = grp.agg("\n".join)
        # per-line char counts vectorized BEFORE the group fold (only the
        # join itself has no array kernel)
        nch = d["line"].str.len().groupby(key).sum()
        return pd.DataFrame(
            {
                "conv_id": doc.index.to_numpy(dtype=object),
                "n_kept": grp.size().to_numpy().astype("int64"),
                "kept_chars": nch.to_numpy().astype("int64"),
                "doc": doc.to_numpy(dtype=object),
            }
        )

    rows = ds.map_batches(line_rows, batch_format="pandas")
    kept = C.by_partition(rows, "h", keep_first)
    return C.by_partition(kept, "conv_id", assemble)


def _line_dedup_sql(replay: str) -> str:
    from raycdc import phash as H

    h = H.sql_poly("line")
    return f"""
WITH replay AS ({replay}),
lines AS (
  SELECT conv_id, turn_idx,
         coalesce(role, '') || ': ' || coalesce(text, '') AS line,
         CAST(substr(conv_id, 6) AS BIGINT) * {_LINE_PACK} + turn_idx AS pack
  FROM replay
), hashed AS (
  SELECT conv_id, turn_idx, line, pack, {h} AS h FROM lines
), firsts AS (
  SELECT h, min(pack) AS p0 FROM hashed GROUP BY h
), kept AS (
  SELECT hashed.conv_id, hashed.turn_idx, hashed.line
  FROM hashed JOIN firsts ON hashed.h = firsts.h AND hashed.pack = firsts.p0
)
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(length(line)) AS BIGINT) AS kept_chars,
       string_agg(line, chr(10) ORDER BY turn_idx) AS doc
FROM kept GROUP BY conv_id
"""


def _derived_engine(sf_dir: str) -> Engine:
    """ONE four-table replay shared by every derived-index query
    (current-state, inverted index, fingerprint index): the reference
    maintains dozens of logical tables from one item stream in the same
    transaction (``indexer/exporters/postgres_item_exporter.py``); here one
    replay commits all four atomically per round — and one memoized lake
    serves three queries (the r03 driver budget lesson)."""
    from raycdc import tables as T

    return _memo_engine(
        sf_dir,
        "dx",
        tables=[T.PRIMARY, T.conv_latest(), T.tool_index(), T.text_fp()],
    )


def cdc_conv_latest(sf_dir: str):
    """Multi-table replay: the derived ``conv_latest`` current-state table
    (key = conv_id, per-column last-non-null fold) maintained incrementally
    in the same commit rounds as the primary — the reference's
    ``current_*`` table pattern (``common/models/current_token_balances.py``)."""
    return _derived_engine(sf_dir).read_lake(
        table="conv_latest", include_system=True
    )


def cdc_tool_index(sf_dir: str):
    """Two-table replay with the ``tool_index`` inverted-index table (the
    reference's address-index pattern: per-entity index rows committed in
    the same transaction as the primary): every canonical tool-carrying
    event upserts ``(tool, conv_id, turn_idx)`` with its watermark; reorg
    rollback removes index rows with everything else. Returns the final
    index — key columns + high watermark; liveness of the indexed turn is
    the primary's business (non-covering index contract)."""
    eng = _derived_engine(sf_dir)
    ds = eng.read_lake(
        table="tool_index",
        include_system=True,
        columns=["tool", "conv_id", "turn_idx", "cursor", "seq"],
    )

    def cast(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("cursor")
        t = t.set_column(i, "cursor", t.column("cursor").cast(pa.int64()))
        return t

    return ds.map_batches(cast, batch_format="pyarrow")


def cdc_fingerprint_index(sf_dir: str):
    """Incrementally-maintained content-fingerprint (near-dup signature)
    index: per live turn, the SimHash64 of its CURRENT text plus the
    watermark of the event that set it — the ``text_fp`` derived table
    (``raycdc/tables.py``), kept fresh by the SAME commit rounds as the
    primary: text updates overwrite the fingerprint by LWW, deletes
    tombstone the index row, reorg rollbacks restore it with everything
    else. At 100 TB this is how the near-dup family
    (``queries/neardup.py``) stays incremental: dedup candidate scans read
    this skinny index, never re-sign the corpus. (On this synthetic corpus
    text is a pure function of the key, so duplicate GROUPS are empty by
    construction — ``dedup_simhash`` on the documents table is the
    group-consumer witness; this query verifies the maintenance.)"""
    eng = _derived_engine(sf_dir)
    ds = eng.read_lake(
        table="text_fp",
        include_system=True,
        columns=["conv_id", "turn_idx", "simhash", "cursor", "seq"],
    )

    def cast(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("cursor")
        return t.set_column(i, "cursor", t.column("cursor").cast(pa.int64()))

    return ds.map_batches(cast, batch_format="pyarrow")


def cdc_neardup_candidates(sf_dir: str):
    """THE CONSUMER of the fingerprint index: near-dup candidate groups over
    the CURRENT lake state, computed from the skinny CDC-maintained
    ``text_fp`` table alone — the corpus text column is never read, never
    re-signed. Groups = live turns sharing a SimHash64 (exact-dup content
    plus any signature collisions — candidates by construction, both sides
    compute them identically); output is every member of a group with >1
    member, tagged with its group size. One bounded-partition pass keyed on
    the signature (``C.by_partition``): at 100 TB this is a shuffle of the
    INDEX (16 B/row), not the corpus — the whole point of maintaining the
    index incrementally."""
    eng = _derived_engine(sf_dir)
    ds = eng.read_lake(
        table="text_fp", columns=["conv_id", "turn_idx", "simhash"]
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["n_members"] = (
            g.groupby("simhash")["conv_id"].transform("size").astype("int64")
        )
        out = g[g["n_members"] > 1]
        return out[["simhash", "n_members", "conv_id", "turn_idx"]]

    return C.by_partition(ds, "simhash", kernel)


def cdc_neardup_delta(sf_dir: str):
    """INCREMENTAL near-dup maintenance: candidate groups TOUCHED since the
    mid-replay anchor — the per-round work a 100 TB dedup pipeline actually
    does between full sweeps. Two delta-shaped passes over the fingerprint
    index (never the corpus): (1) collect the DISTINCT signatures whose
    fingerprint was (re)set after the anchor — O(delta) driver state,
    broadcast once; (2) one filter pass keeps only members of those
    signatures (numpy ``isin`` against the broadcast set, no shuffle), and
    a bounded-partition count over the MATCHED subset (delta-sized) keeps
    groups with >1 live member. Members are tagged ``is_dirty`` (set after
    the anchor) so the consumer can tell the new arrival from the standing
    content it collided with. Deletes after the anchor tombstone their
    index row and simply leave the group (net-state semantics, same as the
    changefeed)."""
    _, anchor_cursor = _snapshot_round_cursor(sf_dir)
    eng = _derived_engine(sf_dir)

    def read_fp():
        return eng.read_lake(
            table="text_fp",
            include_system=True,
            columns=["conv_id", "turn_idx", "simhash", "cursor"],
        )

    # pass 1: delta-sized distinct dirty signatures
    def _dirty_sigs(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.greater(t.column("cursor").cast(pa.int64()), anchor_cursor)
        return pa.table({"simhash": pc.unique(t.filter(keep).column("simhash"))})

    dirty = np.unique(
        np.concatenate(
            [
                b.column("simhash").to_numpy(zero_copy_only=False)
                for b in read_fp()
                .map_batches(_dirty_sigs, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")
            ]
            + [np.array([], np.int64)]
        )
    )
    import ray

    ref = ray.put(dirty)  # sorted by np.unique — searchsorted-ready

    # pass 2: members of dirty signatures only (broadcast semi-join, no
    # shuffle), then group sizes over the delta-sized match set
    def match(b: pd.DataFrame) -> pd.DataFrame:
        import ray as _r

        d = _r.get(ref)
        sig = b["simhash"].to_numpy()
        pos = np.searchsorted(d, sig)
        pos[pos >= len(d)] = 0
        hit = len(d) > 0
        keep = (d[pos] == sig) if hit else np.zeros(len(b), bool)
        out = b[keep]
        return pd.DataFrame(
            {
                "simhash": out["simhash"].to_numpy(),
                "conv_id": out["conv_id"].to_numpy(),
                "turn_idx": out["turn_idx"].to_numpy(),
                "is_dirty": (
                    out["cursor"].to_numpy().astype(np.int64) > anchor_cursor
                ).astype(np.int64),
            }
        )

    matched = read_fp().map_batches(match, batch_format="pandas")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["n_members"] = (
            g.groupby("simhash")["conv_id"].transform("size").astype("int64")
        )
        return g[g["n_members"] > 1][
            ["simhash", "n_members", "conv_id", "turn_idx", "is_dirty"]
        ]

    return C.by_partition(matched, "simhash", kernel)


def _conv_stats_ds(eng: Engine, as_of_round: str | None = None):
    """Per-conversation stats over the lake (optionally a snapshot):
    distributed groupby, integer widths pinned to the oracle's BIGINTs."""
    from ray.data.aggregate import Count, Max

    ds = eng.read_lake(
        columns=["conv_id", "turn_idx", "ts", "cursor"], include_system=True,
        as_of_round=as_of_round,
    )
    agg = ds.groupby("conv_id").aggregate(
        Count(alias_name="n_turns"),
        Max("turn_idx", alias_name="max_turn"),
        Max("ts", alias_name="last_ts"),
        Max("cursor", alias_name="max_cursor"),
    )

    def cast(t: pa.Table) -> pa.Table:
        for c in ("n_turns", "max_turn", "max_cursor"):
            i = t.schema.get_field_index(c)
            t = t.set_column(i, c, t.column(c).cast(pa.int64()))
        return t

    return agg.map_batches(cast, batch_format="pyarrow")


def cdc_conv_stats(sf_dir: str):
    """Derived aggregate over the replayed lake (the reference's
    `aggr_jobs` analog): per-conversation turn count / latest ts —
    distributed groupby over the lake Dataset, not driver pandas."""
    eng = _replayed_engine(sf_dir, salted=False)
    return _conv_stats_ds(eng)


def cdc_conv_text(sf_dir: str):
    """Flatten each live conversation into ONE training document —
    ``role: text`` lines joined in turn order — the transcript→corpus
    assembly step every LLM pipeline runs between the CDC lake and
    tokenization. Distributed shape: conv-keyed ``by_partition`` (all
    turns of a conversation co-locate; conv_id is near-unique so the
    bounded-partition fold, not a per-group map_groups), one pandas
    kernel per partition: lexsort, vectorized line build, and a per-group
    ``str.join`` (string concatenation has no array kernel — the join
    itself is C; only the group iteration is Python, O(convs/partition)).
    Parity: the reference's per-entity document assembly
    (indexer/modules/custom/deep_flow/* aggregation exports)."""
    eng = _replayed_engine(sf_dir, salted=False)
    ds = eng.read_lake(columns=["conv_id", "turn_idx", "role", "text"])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        # role can be NULL on patch-only keys: empty-string it explicitly
        # (SQL || would null the whole line and string_agg would DROP it)
        line = (
            d["role"].fillna("").astype(str)
            + ": "
            + d["text"].fillna("").astype(str)
        )
        grp = line.groupby(d["conv_id"].to_numpy())
        doc = grp.agg("\n".join)
        n = grp.size()
        out = pd.DataFrame(
            {
                "conv_id": doc.index.to_numpy(dtype=object),
                "doc": doc.to_numpy(dtype=object),
            }
        )
        out["n_turns"] = n.to_numpy().astype("int64")
        out["n_chars"] = out["doc"].str.len().astype("int64")
        return out

    return C.by_partition(ds, "conv_id", kernel)


def cdc_turn_pairs(sf_dir: str):
    """(prompt, response) pair extraction: every live ``user`` turn whose
    NEXT live turn in the conversation is an ``assistant`` turn — the
    SFT-pair mining step over the transcript lake (delete events punch
    holes, so "next live turn" is a LEAD over surviving rows, not
    turn_idx+1). Distributed shape: conv-keyed ``by_partition``, one
    fully vectorized kernel per partition — lexsort, shifted arrays with
    a conv-boundary mask, one boolean gather. Zero per-row Python."""
    eng = _replayed_engine(sf_dir, salted=False)
    ds = eng.read_lake(columns=["conv_id", "turn_idx", "role", "text"])

    _EMPTY = pd.DataFrame(
        {
            "conv_id": pd.Series(dtype=object),
            "prompt_turn": pd.Series(dtype="int64"),
            "prompt": pd.Series(dtype=object),
            "response_turn": pd.Series(dtype="int64"),
            "response": pd.Series(dtype=object),
        }
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return _EMPTY
        d = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        conv = d["conv_id"].to_numpy(dtype=object)
        role = d["role"].to_numpy(dtype=object)
        text = d["text"].to_numpy(dtype=object)
        turn = d["turn_idx"].to_numpy().astype(np.int64)
        same = np.zeros(len(d), bool)
        same[:-1] = conv[:-1] == conv[1:]  # next row is same conversation
        m = same & (role == "user")
        m[:-1] &= role[1:] == "assistant"
        idx = np.flatnonzero(m)
        return pd.DataFrame(
            {
                "conv_id": conv[idx],
                "prompt_turn": turn[idx],
                "prompt": text[idx],
                "response_turn": turn[idx + 1],
                "response": text[idx + 1],
            }
        )

    return C.by_partition(ds, "conv_id", kernel)


CDC_CONV_TEXT_SQL_TEMPLATE = """
WITH replay AS ({replay}), lines AS (
  SELECT conv_id, turn_idx,
         COALESCE(role, '') || ': ' || COALESCE(text, '') AS line
  FROM replay
)
SELECT conv_id,
       string_agg(line, chr(10) ORDER BY turn_idx) AS doc,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(length(string_agg(line, chr(10) ORDER BY turn_idx)) AS BIGINT)
           AS n_chars
FROM lines GROUP BY conv_id
"""

CDC_TURN_PAIRS_SQL_TEMPLATE = """
WITH replay AS ({replay}), w AS (
  SELECT conv_id, turn_idx, role, text,
         lead(role) OVER win AS nrole,
         lead(text) OVER win AS ntext,
         lead(turn_idx) OVER win AS nturn
  FROM replay WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS prompt_turn, text AS prompt,
       CAST(nturn AS BIGINT) AS response_turn, ntext AS response
FROM w WHERE role = 'user' AND nrole = 'assistant'
"""


def cdc_incremental_stats(sf_dir: str):
    """Incremental view maintenance of the conv-stats aggregate: given the
    stats table as it was MATERIALIZED at the anchor round, refresh it by
    recomputing only the conversations the changefeed marks dirty —
    untouched groups are carried over, dirty groups are re-aggregated from
    the live lake with the conv_id set PUSHED INTO the parquet read. The
    result must hash-match the full recompute (same oracle SQL as
    ``cdc_conv_stats``) — the reference's incremental ``aggr_jobs``
    pattern (``indexer/aggr_jobs/aggr_job_scheduler.py:10-26``) done
    without rescanning the lake.

    Scale shape: the dirty-key set is O(one refresh interval's touched
    keys) — the same bound the merger pool already holds per round — and
    is broadcast once (ray.put) to the filter stages; everything else
    streams. (The anchor table itself is built via a snapshot read here
    only because the benchmark starts cold; a real deployment reads the
    previously written stats parquet.)"""
    import pyarrow.compute as pc

    import ray as _ray

    round_id, _ = _snapshot_round_cursor(sf_dir)
    eng = _replayed_engine(sf_dir, salted=False)

    # the "previously materialized" table (scaffolding for the benchmark)
    base = _conv_stats_ds(eng, as_of_round=round_id)

    # dirty groups since the anchor (net feed: upserts + deletes);
    # per-block Arrow unique, then a driver-side set of the survivors
    def _uniq(t: pa.Table) -> pa.Table:
        return pa.table({"conv_id": pc.unique(t.column("conv_id"))})

    dirty = sorted(
        {
            r["conv_id"]
            for r in eng.read_changes(since_round=round_id)
            .map_batches(_uniq, batch_format="pyarrow")
            .take_all()
        }
    )
    if not dirty:
        return base
    dirty_ref = _ray.put(pa.array(dirty, pa.string()))

    def drop_dirty(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.invert(pc.is_in(t.column("conv_id"), value_set=_ray.get(dirty_ref)))
        )

    kept = base.map_batches(drop_dirty, batch_format="pyarrow")
    # recompute ONLY dirty conversations, pruned at the parquet read
    refreshed = _conv_stats_ds_filtered(eng, dirty)
    return kept.union(refreshed)


def _conv_stats_ds_filtered(eng: Engine, conv_ids: list):
    """conv-stats restricted to ``conv_ids`` via read-level predicate."""
    import pyarrow.dataset as pads
    from ray.data.aggregate import Count, Max

    pred = pads.field("conv_id").isin(conv_ids)
    ds = eng.read_lake(
        columns=["conv_id", "turn_idx", "ts", "cursor"], include_system=True,
        predicate=pred,
    )
    agg = ds.groupby("conv_id").aggregate(
        Count(alias_name="n_turns"),
        Max("turn_idx", alias_name="max_turn"),
        Max("ts", alias_name="last_ts"),
        Max("cursor", alias_name="max_cursor"),
    )

    def cast(t: pa.Table) -> pa.Table:
        for c in ("n_turns", "max_turn", "max_cursor"):
            i = t.schema.get_field_index(c)
            t = t.set_column(i, c, t.column(c).cast(pa.int64()))
        return t

    return agg.map_batches(cast, batch_format="pyarrow")


# -- incrementally maintained join view ---------------------------------------

_JOIN_VIEW_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int64()),
        ("role", pa.string()),
        ("conv_n_turns", pa.int64()),
        ("conv_last_ts", pa.timestamp("us")),
    ]
)


def _join_view_ds(eng: Engine, as_of_round: str | None = None, predicate=None):
    """Turn-grain enrichment view: each live turn joined to its
    conversation's current aggregate (turn count, last activity). The
    fact side and the dim side derive from the SAME bounded partition —
    one co-location shuffle on conv_id, a vectorized grouped transform,
    no ``Dataset.join`` (q7's rationale: sparse sides at small scale make
    empty hash-join partitions near-certain). The trailing conform pins
    the Arrow schema so an EMPTY refresh side survives ``union`` (the
    r03 neardup failure class)."""

    ds = eng.read_lake(
        columns=["conv_id", "turn_idx", "role", "ts"],
        as_of_round=as_of_round,
        predicate=predicate,
    )

    def enrich(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("conv_id", sort=False)
        return pd.DataFrame(
            {
                "conv_id": g["conv_id"].astype(object),
                "turn_idx": g["turn_idx"].astype("int64"),
                "role": g["role"].astype(object),
                "conv_n_turns": grp["turn_idx"].transform("size").astype("int64"),
                "conv_last_ts": grp["ts"].transform("max"),
            }
        )

    def conform(t: pa.Table) -> pa.Table:
        return t.select(_JOIN_VIEW_SCHEMA.names).cast(_JOIN_VIEW_SCHEMA)

    return C.by_partition(ds, "conv_id", enrich).map_batches(
        conform, batch_format="pyarrow"
    )


def cdc_join_view(sf_dir: str):
    """Incrementally maintained JOIN VIEW at turn grain: every live turn
    enriched with its conversation's CURRENT aggregate (n_turns, last ts)
    — the fact × derived-dim join a serving layer keeps fresh next to the
    base table (reference analog: the per-entity index/detail rows its
    custom modules commit alongside ``current_*`` aggregates in one
    transaction, ``indexer/modules/custom/address_index/``).

    Delta rule: both join sides key on conv_id, so EITHER side changing
    dirties exactly that conversation — the general bilinear delta
    (ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB) collapses to ONE key-pruned recompute pass
    because the sides are co-partitioned on the join key. Untouched view
    rows carry over from the anchor materialization; the refresh reads
    only dirty conversations via read-level predicate pushdown, and a
    conversation going fully dead (all turns deleted) vanishes because
    carry-over drops its rows and the recompute returns none. Must
    hash-match the full recompute (the oracle joins over the complete
    replay)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    import ray as _ray

    round_id, _ = _snapshot_round_cursor(sf_dir)
    eng = _replayed_engine(sf_dir, salted=False)
    base = _join_view_ds(eng, as_of_round=round_id)

    def _uniq(t: pa.Table) -> pa.Table:
        return pa.table({"conv_id": pc.unique(t.column("conv_id"))})

    dirty = sorted(
        {
            r["conv_id"]
            for r in eng.read_changes(since_round=round_id)
            .map_batches(_uniq, batch_format="pyarrow")
            .take_all()
        }
    )
    if not dirty:
        return base
    dirty_ref = _ray.put(pa.array(dirty, pa.string()))

    def drop_dirty(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.invert(
                pc.is_in(t.column("conv_id"), value_set=_ray.get(dirty_ref))
            )
        )

    kept = base.map_batches(drop_dirty, batch_format="pyarrow")
    refreshed = _join_view_ds(
        eng, predicate=pads.field("conv_id").isin(dirty)
    )
    return kept.union(refreshed)


def _snapshot_round_epoch(sf_dir: str) -> tuple[str, int]:
    """The deterministic mid-replay snapshot anchor shared by the Ray query
    and its SQL oracle: the second-to-last committed round of the tier's
    replay plan and the max epoch it covers. Pure metadata planning
    (``plan_rounds`` reads only parquet footers), so both sides agree
    without running the engine."""
    from raycdc.engine import discover_epoch_files, plan_rounds

    spec = _spec_for(sf_dir, rollback_epochs=(1,))
    log_dir = gen.cached_change_log(spec)
    files = discover_epoch_files(log_dir)
    rounds = [s for s in plan_rounds(files, 2, set(), 0) if s[0] == "round"]
    _, group, round_id = rounds[-2]
    return round_id, max(f["epoch"] for f in group)


def _snapshot_round_cursor(sf_dir: str) -> tuple[str, int]:
    """Same anchor round as :func:`_snapshot_round_epoch`, but returning
    its high-water CURSOR (the changefeed filter both sides share)."""
    round_id, _, cursor_hi = _plan_round_at(sf_dir, -2)
    return round_id, cursor_hi


def _plan_round_at(sf_dir: str, pos: int) -> tuple[str, int, int]:
    """(round_id, max_epoch, cursor_hi) of the tier replay plan's round at
    position ``pos`` — the shared deterministic anchor resolver (pure
    footer-only planning on both the Ray and the SQL side)."""
    from raycdc.engine import discover_epoch_files, plan_rounds

    spec = _spec_for(sf_dir, rollback_epochs=(1,))
    log_dir = gen.cached_change_log(spec)
    files = discover_epoch_files(log_dir)
    rounds = [s for s in plan_rounds(files, 2, set(), 0) if s[0] == "round"]
    _, group, round_id = rounds[pos]
    return (
        round_id,
        max(f["epoch"] for f in group),
        max(f["cursor_hi"] for f in group),
    )


def cdc_time_travel(sf_dir: str):
    """Time travel: replay the full log, then read the lake AS OF a
    historical committed round boundary (the second-to-last round) — the
    snapshot is reconstructed from the manifest's per-partition version
    history (base + deltas as of that round), bounded by the same
    ``undo_window`` that bounds rollback. The Iceberg/Delta-style
    snapshot-read analog of the reference's block-height-anchored reads."""
    round_id, _ = _snapshot_round_epoch(sf_dir)
    eng = _replayed_engine(sf_dir, salted=False)
    df = eng.read_lake(include_system=True, as_of_round=round_id).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
        drop=True
    )


def cdc_branch(sf_dir: str):
    """Zero-copy writable BRANCH (``Lake.branch`` — LakeFS/Nessie branch,
    Delta shallow-clone): hardlink-clone the replayed lake at the same
    historical round boundary ``cdc_time_travel`` reads, open the clone as
    an independent lake, and return ITS live state — which must equal the
    prefix replay (the time-travel oracle). No fragment data is copied
    (inode-shared hardlinks); copy-on-write holds because every engine
    fragment write is tmp + ``os.replace``. Divergence/COW isolation is
    pinned in ``tests/test_engine.py::test_lake_branch_cow_divergence``."""
    round_id, _ = _snapshot_round_epoch(sf_dir)
    eng = _replayed_engine(sf_dir, salted=False)
    spec = _spec_for(sf_dir, rollback_epochs=(1,))
    key = (gen.spec_fingerprint(spec), "branch")
    eng_b = _ENGINE_MEMO.get(key)
    if eng_b is None:
        dest = _scratch_lake(spec, "branch")
        shutil.rmtree(dest, ignore_errors=True)
        out = eng.lake.branch(dest, round_id=round_id)
        assert out["copied"] == 0, out  # same fs → pure hardlinks
        eng_b = Engine(dest)
        eng_b.close()
        _ENGINE_MEMO[key] = eng_b
    df = eng_b.read_lake(include_system=True).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
        drop=True
    )


def cdc_branch_promote(sf_dir: str):
    """Branch → diverge → PROMOTE, end to end as a driver contract: a
    source lake replays only the log PREFIX (the same historical boundary
    ``cdc_time_travel`` reads), a zero-copy branch of it catches up on
    the FULL log, and :meth:`Engine.merge_branch` folds the branch's net
    delta back through one atomic round — after which the promoted
    source must equal the full replay (the ``cdc_replay`` oracle). This
    exercises lineage stamping, the changefeed-since-base delta, and
    guarded-LWW promotion in one row."""
    round_id, _ = _snapshot_round_epoch(sf_dir)
    spec = _spec_for(sf_dir, rollback_epochs=(1,))
    key = (gen.spec_fingerprint(spec), "promote")
    eng = _ENGINE_MEMO.get(key)
    if eng is None:
        # source at PREFIX state = zero-copy branch of the memoized full
        # replay AT the snapshot round (hardlinks — no prefix re-replay);
        # the promotion branch then only applies the log SUFFIX (epoch
        # fencing skips the inherited prefix)
        full = _replayed_engine(sf_dir, salted=False)
        log_dir = gen.cached_change_log(spec)
        lake = _scratch_lake(spec, "promote")
        bdir = lake + "-br"
        shutil.rmtree(lake, ignore_errors=True)
        shutil.rmtree(bdir, ignore_errors=True)
        full.lake.branch(lake, round_id=round_id)
        eng = Engine(lake)
        assert eng.lake.manifest["committed_rounds"][-1]["round_id"] == round_id
        eng.lake.branch(bdir)
        eng.close()  # one CPU-pinned merger pool at a time
        br = Engine(bdir)
        br.apply_log(log_dir, epochs_per_round=2)
        br.close()
        out = eng.merge_branch(br)  # read-only on br; eng pool re-ensures
        assert out["merge_base"] == round_id and not out.get("skipped")
        eng.close()
        _ENGINE_MEMO[key] = eng
    return eng.read_lake_pandas()


# point-lookup key sample: deterministic spread over the tier's conv space
_LOOKUP_FRACS = (0, 1, 3, 7, 9)


def _lookup_keys(sf_dir: str) -> list[str]:
    n = _spec_for(sf_dir).n_convs
    return [f"conv-{min(i * n // 10, n - 1):06d}" for i in _LOOKUP_FRACS]


def cdc_changefeed(sf_dir: str):
    """Change data feed: after the full replay, the NET row-level delta
    committed after the mid-replay anchor round — current values tagged
    ``upsert``, tombstoned keys tagged ``delete`` with null payloads.
    Only partitions with post-anchor fragments are scanned (manifest
    pruning), so cost tracks the delta, not the lake."""
    round_id, _ = _snapshot_round_cursor(sf_dir)
    eng = _replayed_engine(sf_dir, salted=False)
    df = eng.read_changes(since_round=round_id).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
        drop=True
    )


def cdc_changefeed_latest(sf_dir: str):
    """Change data feed of a DERIVED table: the ``conv_latest``
    current-state rows whose watermark post-dates the mid-replay anchor —
    the downstream-sync story composed with incremental view maintenance
    (the reference's ``current_*`` tables feeding consumers only what
    changed). All rows are upserts by construction (every primary event
    maps to a patch of its conversation's current row; the spec never
    tombstones), and the same manifest pruning applies: only partitions
    of the DERIVED table with post-anchor fragments are scanned."""
    round_id, _ = _snapshot_round_cursor(sf_dir)
    eng = _derived_engine(sf_dir)
    ds = eng.read_changes(since_round=round_id, table="conv_latest")

    def cast(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("turn_idx")
        return t.set_column(
            i, pa.field("turn_idx", pa.int32()),
            t.column("turn_idx").cast(pa.int32()),
        )

    df = ds.map_batches(cast, batch_format="pyarrow").to_pandas()
    return df.sort_values("conv_id", kind="stable").reset_index(drop=True)


def cdc_changefeed_window(sf_dir: str):
    """Two-anchor change data feed: the NET delta committed in
    ``(first round, second-to-last round]`` — served from the snapshot at
    the upper anchor, so the feed is exactly what a consumer syncing from
    boundary A to boundary B would apply, independent of anything
    committed later."""
    lo_round, _, _ = _plan_round_at(sf_dir, 0)
    hi_round, _, _ = _plan_round_at(sf_dir, -2)
    eng = _replayed_engine(sf_dir, salted=False)
    df = eng.read_changes(
        since_round=lo_round, until_round=hi_round
    ).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
        drop=True
    )


def cdc_read_key(sf_dir: str):
    """Point lookups: the current state of five sampled conversations via
    ``Engine.read_key`` — each lookup touches exactly ONE partition's
    fragments (hash(key) names the home partition; parquet row-group
    predicate pushdown prunes within it), the lake's answer to the
    reference serving ``current_*`` rows from a PostgreSQL PK index."""
    eng = _replayed_engine(sf_dir, salted=False)
    frames = [
        eng.read_key(k, include_system=True) for k in _lookup_keys(sf_dir)
    ]
    df = pd.concat(frames, ignore_index=True)
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
        drop=True
    )


def cdc_snapshot_diff(sf_dir: str):
    """Snapshot-to-snapshot table diff: every key whose USER-VISIBLE payload
    (role/text/tool/ts) differs between the mid-replay anchor snapshot and
    the live table, tagged ``insert`` / ``delete`` / ``update`` with old and
    new values side by side — the "what changed between version A and B"
    audit read (Delta CDF `table_changes` analog; the reference answers it
    by re-running an export job over the block range,
    ``indexer/controller/stream_controller.py``).

    Scale shape: cost tracks the DELTA, not the lake. The changefeed (a
    superset of payload-changed keys — any payload change bumps the stored
    watermark, and no reorg crosses this window) names the candidate keys
    and carries the NEW values; old values are read from the anchor
    snapshot with the candidate conv set PUSHED INTO the parquet read.
    The two delta-sized sides co-shuffle by conv_id into bounded
    partitions (tagged union — no ``Dataset.join``, whose empty-block
    schema loss broke neardup at 32 CPUs in r03) and ONE vectorized merge
    kernel per partition classifies and filters. Nothing corpus-sized
    touches the driver; the conv-id set is O(one window's touched keys),
    the same bound the merger pool holds per round."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from raycdc import schema as S

    lo_round, _ = _snapshot_round_cursor(sf_dir)
    eng = _replayed_engine(sf_dir, salted=False)

    feed = eng.read_changes(since_round=lo_round)

    def _uniq(t: pa.Table) -> pa.Table:
        return pa.table({"conv_id": pc.unique(t.column("conv_id"))})

    dirty = sorted(
        {
            r["conv_id"]
            for r in feed.map_batches(_uniq, batch_format="pyarrow").take_all()
        }
    )
    payload = ["role", "text", "tool", "ts"]
    old = eng.read_lake(
        columns=["conv_id", "turn_idx", *payload],
        as_of_round=lo_round,
        predicate=pads.field("conv_id").isin(dirty) if dirty else None,
    )

    side_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
            ("change_op", pa.string()),
            ("side", pa.int8()),
        ]
    )

    # explicit-schema Arrow out of BOTH mappers: empty blocks keep their
    # schema through the shuffle (the r03 neardup lesson, VERDICT r3 #1)
    def tag_old(t: pa.Table) -> pa.Table:
        t = t.append_column("side", pa.array(np.zeros(len(t), np.int8)))
        return S.conform(t, side_schema)

    def tag_new(t: pa.Table) -> pa.Table:
        t = t.append_column("side", pa.array(np.ones(len(t), np.int8)))
        return S.conform(t, side_schema)

    both = old.map_batches(tag_old, batch_format="pyarrow").union(
        feed.map_batches(tag_new, batch_format="pyarrow")
    )

    def _ne(a: pd.Series, b: pd.Series) -> pd.Series:
        # NULL-safe inequality (IS DISTINCT FROM): both-null compares equal
        return (a != b) & ~(a.isna() & b.isna())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        nw = g[g["side"] == 1]
        o = g[g["side"] == 0][["conv_id", "turn_idx", *payload]]
        m = nw.merge(
            o, on=["conv_id", "turn_idx"], how="left",
            suffixes=("_new", "_old"), indicator=True,
        )
        in_old = (m["_merge"] == "both").to_numpy()
        is_del = (m["change_op"] == "delete").to_numpy()
        differs = np.zeros(len(m), bool)
        for c in payload:
            differs |= _ne(m[f"{c}_new"], m[f"{c}_old"]).to_numpy()
        # delete without an old row = inserted+deleted inside the window
        # (no-op at both boundaries); upsert with equal payload = watermark-
        # only motion (e.g. a patch re-asserting current values) — neither
        # is a snapshot-visible change
        keep = np.where(is_del, in_old, ~in_old | differs)
        kind = np.where(is_del, "delete", np.where(in_old, "update", "insert"))
        out = pd.DataFrame(
            {
                "conv_id": m["conv_id"],
                "turn_idx": m["turn_idx"].astype("int32"),
                "kind": kind,
                "old_role": m["role_old"],
                "new_role": m["role_new"],
                "old_text": m["text_old"],
                "new_text": m["text_new"],
                "old_tool": m["tool_old"],
                "new_tool": m["tool_new"],
                "old_ts": m["ts_old"],
                "new_ts": m["ts_new"],
            }
        )
        return out[keep]

    return C.by_partition(both, "conv_id", kernel)


def cdc_column_diff(sf_dir: str):
    """Column-level change attribution: for every UPDATE in the snapshot
    diff, WHICH payload columns changed (canonical comma-joined list in
    fixed role,text,tool,ts order) — the column-lineage feed downstream
    cache-invalidation / selective-reindex consumers need (only text
    changes dirty a text index). Composes the still-lazy
    :func:`cdc_snapshot_diff` stream with one vectorized kernel: the four
    NULL-safe inequality masks pack into a 4-bit code and a 16-entry
    lookup maps code → column list — no per-row string building."""
    payload = ["role", "text", "tool", "ts"]
    lut = np.array(
        [
            ",".join(c for j, c in enumerate(payload) if code & (1 << j))
            for code in range(16)
        ],
        dtype=object,
    )
    diff = cdc_snapshot_diff(sf_dir)

    _EMPTY = pd.DataFrame(
        {
            "conv_id": pd.Series(dtype=object),
            "turn_idx": pd.Series(dtype="int64"),
            "changed_cols": pd.Series(dtype=object),
        }
    )

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "kind" not in b.columns:
            return _EMPTY
        u = b[b["kind"] == "update"]
        if not len(u):
            return _EMPTY
        code = np.zeros(len(u), np.int64)
        for j, c in enumerate(payload):
            o, n = u[f"old_{c}"], u[f"new_{c}"]
            ne = ((o != n) & ~(o.isna() & n.isna())).to_numpy()
            code |= ne.astype(np.int64) << j
        return pd.DataFrame(
            {
                "conv_id": u["conv_id"].to_numpy(dtype=object),
                "turn_idx": u["turn_idx"].astype("int64").to_numpy(),
                "changed_cols": lut[code],
            }
        )

    out = diff.map_batches(kernel, batch_format="pandas").to_pandas()
    if len(out) == 0:
        return _EMPTY
    return out.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
        drop=True
    )


CDC_COLUMN_DIFF_SQL_TEMPLATE = """
WITH d AS ({snapshot_diff})
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       concat_ws(',',
         CASE WHEN old_role IS DISTINCT FROM new_role THEN 'role' END,
         CASE WHEN old_text IS DISTINCT FROM new_text THEN 'text' END,
         CASE WHEN old_tool IS DISTINCT FROM new_tool THEN 'tool' END,
         CASE WHEN old_ts   IS DISTINCT FROM new_ts   THEN 'ts'   END)
           AS changed_cols
FROM d WHERE kind = 'update'
ORDER BY conv_id, turn_idx
"""


# open-interval sentinel for the SCD2 history (avoids a nullable BIGINT,
# which DuckDB's .df() surfaces as float64 and pandas as Int64 — the
# canonical compare would then coerce differently on the two sides)
_SCD2_OPEN = -1


def cdc_history_scd2(sf_dir: str):
    """SCD Type-2 history table derived straight from the change log: one
    row per surviving VERSION of each ``(conv_id, turn_idx)`` key, payload
    folded cumulatively with the engine's patch semantics (update nulls =
    "unchanged", insert/delete restart the segment), validity interval =
    ``[valid_from, valid_to)`` in composite-watermark time (open intervals
    carry the ``-1`` sentinel + ``is_current``). Reorg-orphaned events
    never produce versions; exact duplicate re-deliveries collapse to one.

    The reference keeps only current state (LWW upsert into PG,
    ``indexer/exporters/postgres_item_exporter.py``) — history is exactly
    what its block-range re-export jobs reconstruct on demand; here it is
    one declarative derivation over the same log the engine replays.

    Scale shape: rollback markers are O(reorgs) — read driver-side with
    predicate pushdown, folded to a suffix-min table, shipped by closure
    (a handful of ints). The stream then resolves per batch with k tiny
    vectorized comparisons (k = #rollbacks), and the per-key fold runs as
    ONE pandas kernel per bounded hash partition (`C.by_partition`) —
    sort + cumsum segmenting + GroupBy.ffill, no per-row Python, no
    corpus-sized driver state. Output is event-sized, streamed."""
    return _scd2_history(sf_dir)


def _log_files(sf_dir: str) -> list[str]:
    spec = _spec_for(sf_dir, rollback_epochs=(1,))
    log_glob = gen.cached_change_log(spec)
    return sorted(
        os.path.join(log_glob, f)
        for f in os.listdir(log_glob)
        if f.startswith("changes-") and f.endswith(".parquet")
    )


def _scd2_history(sf_dir: str, conv_keys: np.ndarray | None = None):
    """Shared SCD2 derivation; ``conv_keys`` (sorted) restricts the stream
    to those keys per batch BEFORE the shuffle (broadcast semi-join)."""
    import pyarrow.dataset as pads
    import ray

    files = _log_files(sf_dir)

    # rollback markers: tiny by construction (one per reorg). Predicate
    # pushdown keeps this a footer+filtered scan, and stream order
    # (epoch, cursor, seq) suffix-min gives each marker the lowest
    # rollback target at-or-after it — the same rb_floor the SQL oracle's
    # backward-running MIN window computes.
    rb = (
        pads.dataset(files)
        .to_table(
            columns=["epoch", "cursor", "seq", "rollback_to_cursor"],
            filter=pads.field("op") == "rollback",
        )
        .to_pandas()
        .sort_values(["epoch", "cursor", "seq"], kind="stable")
    )
    rb_e = rb["epoch"].to_numpy(np.int64)
    rb_c = rb["cursor"].to_numpy(np.int64)
    rb_s = rb["seq"].to_numpy(np.int64)
    rb_floor = np.minimum.accumulate(
        rb["rollback_to_cursor"].to_numpy(np.int64)[::-1]
    )[::-1]

    cols = [
        "op", "conv_id", "turn_idx", "role", "text", "tool", "ts",
        "cursor", "seq", "epoch",
    ]
    logs = ray.data.read_parquet(files, columns=cols)

    keys_ref = None
    if conv_keys is not None:
        keys_ref = ray.put(np.sort(np.asarray(conv_keys, dtype=object)))

    def resolve(b: pd.DataFrame) -> pd.DataFrame:
        """Drop rollback markers and reorg-orphaned events; stamp wm."""
        b = b[b["op"] != "rollback"]
        if keys_ref is not None:
            import ray as _r

            keys = _r.get(keys_ref)
            cid = b["conv_id"].to_numpy(dtype=object)
            pos = np.searchsorted(keys, cid)
            pos[pos >= len(keys)] = 0
            hit = (keys[pos] == cid) if len(keys) else np.zeros(len(b), bool)
            b = b[hit]
        e = b["epoch"].to_numpy(np.int64)
        c = b["cursor"].to_numpy(np.int64)
        s = b["seq"].to_numpy(np.int64)
        if len(rb_e):
            # idx of the first rollback at-or-after each event in stream
            # order = count of rollbacks strictly before it (k tiny)
            idx = np.zeros(len(b), np.int64)
            for j in range(len(rb_e)):
                before = (rb_e[j] < e) | (
                    (rb_e[j] == e)
                    & ((rb_c[j] < c) | ((rb_c[j] == c) & (rb_s[j] < s)))
                )
                idx += before
            floor = np.where(
                idx < len(rb_e), rb_floor[np.minimum(idx, len(rb_e) - 1)],
                np.iinfo(np.int64).max,
            )
            b = b[c <= floor]
        out = b[["conv_id", "turn_idx", "role", "text", "tool", "ts", "op"]]
        out = out.copy()
        out["wm"] = (
            b["cursor"].to_numpy(np.int64) * _WM
            + b["seq"].to_numpy(np.int64)
        )
        return out

    eff = logs.map_batches(resolve, batch_format="pandas")
    return C.by_partition(eff, "conv_id", _scd2_kernel)


_SCD2_PAYLOAD = ["role", "text", "tool", "ts"]


def _scd2_kernel(g: pd.DataFrame) -> pd.DataFrame:
    """Whole-partition SCD2 fold (all rows of a key co-located): input is
    effective events (conv_id, turn_idx, payload..., op, wm); output one
    version row per surviving event. Pure + deterministic — property-
    tested against a row-by-row reference in test_property.py."""
    pay = _SCD2_PAYLOAD
    g = g.sort_values(["conv_id", "turn_idx", "wm"], kind="stable")
    # exact re-deliveries carry identical payloads: one version each
    g = g.drop_duplicates(["conv_id", "turn_idx", "wm"], keep="first")
    new_key = (
        g["conv_id"].ne(g["conv_id"].shift())
        | g["turn_idx"].ne(g["turn_idx"].shift())
    ).to_numpy()
    reset = g["op"].isin(("insert", "delete")).to_numpy()
    # segment id: insert/delete (and any key start — orphan patches
    # before the first insert fold together, as in the replay's
    # seg_start IS NULL branch) opens a new patch-fold segment
    seg = np.cumsum(new_key | reset)
    g = g.copy()
    g[pay] = g[pay].groupby(seg).ffill()  # cumulative last-non-null
    kid = np.cumsum(new_key)
    wm = g["wm"].to_numpy()
    nxt_same = np.roll(kid, -1) == kid
    nxt_same[-1:] = False
    valid_to = np.where(nxt_same, np.roll(wm, -1), _SCD2_OPEN)
    starts = np.flatnonzero(new_key)
    ver = (
        np.arange(len(g), dtype=np.int64)
        - np.repeat(starts, np.diff(starts, append=len(g)))
        + 1
    )
    return pd.DataFrame(
        {
            "conv_id": g["conv_id"].to_numpy(),
            "turn_idx": g["turn_idx"].to_numpy().astype("int32"),
            "ver": ver.astype("int64"),
            "ver_op": g["op"].to_numpy(),
            "role": g["role"].to_numpy(),
            "text": g["text"].to_numpy(),
            "tool": g["tool"].to_numpy(),
            "ts": g["ts"].to_numpy(),
            "valid_from": wm.astype("int64"),
            "valid_to": valid_to.astype("int64"),
            "is_current": (
                ~nxt_same & (g["op"].to_numpy() != "delete")
            ).astype("int64"),
        }
    )


def cdc_round_ledger(sf_dir: str):
    """The commit ledger — one row per COMMITTED round with its epoch
    count, cursor range and applied-event count: the reference's
    sync-record observability (each synced block range recorded by
    ``indexer/controller/stream_controller.py``), here read straight from
    the manifest (O(rounds) metadata, no data IO). Rounds undone by the
    reorg rollback must be ABSENT — the oracle recomputes the survivor
    set from the pure plan and counts each round's events from the raw
    log, so the ledger's lineage (not just the table state) is
    driver-checked."""
    eng = _replayed_engine(sf_dir, salted=False)
    rows = eng.lake.manifest["committed_rounds"]
    return pd.DataFrame(
        {
            "round_id": [r["round_id"] for r in rows],
            "n_epochs": np.array([len(r["epochs"]) for r in rows], np.int64),
            "cursor_lo": np.array([r["cursor_lo"] for r in rows], np.int64),
            "cursor_hi": np.array([r["cursor_hi"] for r in rows], np.int64),
            "n_events": np.array(
                [r["metrics"]["n_events"] for r in rows], np.int64
            ),
        }
    )


def _surviving_plan_rounds(sf_dir: str):
    """Committed-round survivor set from the PURE plan (footer metadata
    only): walk the plan in order; a rollback step undoes every earlier
    round whose cursor range exceeds its target."""
    from raycdc.engine import discover_epoch_files, plan_rounds

    spec = _spec_for(sf_dir, rollback_epochs=(1,))
    files = discover_epoch_files(gen.cached_change_log(spec))
    out = []
    for s in plan_rounds(files, 2, set(), 0):
        if s[0] == "round":
            _, group, round_id = s
            out.append(
                {
                    "round_id": round_id,
                    "epochs": sorted(f["epoch"] for f in group),
                    "cursor_lo": min(f["cursor_lo"] for f in group),
                    "cursor_hi": max(f["cursor_hi"] for f in group),
                }
            )
        elif s[0] == "rollback":
            to_cursor = s[1]
            out = [r for r in out if r["cursor_hi"] <= to_cursor]
    return out


def _round_ledger_sql(sf_dir: str, path: str) -> str:
    plan = _surviving_plan_rounds(sf_dir)
    pairs = ", ".join(
        f"('{r['round_id']}', {e})" for r in plan for e in r["epochs"]
    )
    meta = ", ".join(
        f"('{r['round_id']}', {len(r['epochs'])}, "
        f"{r['cursor_lo']}, {r['cursor_hi']})"
        for r in plan
    )
    return f"""
WITH plan(round_id, epoch) AS (VALUES {pairs}),
meta(round_id, n_epochs, cursor_lo, cursor_hi) AS (VALUES {meta}),
cnt AS (
    SELECT p.round_id, count(*) AS n_events
    FROM read_parquet('{path}') r JOIN plan p ON r.epoch = p.epoch
    WHERE r.op <> 'rollback'
    GROUP BY p.round_id
)
SELECT m.round_id, CAST(m.n_epochs AS BIGINT) AS n_epochs,
       CAST(m.cursor_lo AS BIGINT) AS cursor_lo,
       CAST(m.cursor_hi AS BIGINT) AS cursor_hi,
       CAST(c.n_events AS BIGINT) AS n_events
FROM meta m JOIN cnt c USING (round_id)
"""


def cdc_history_scd2_delta(sf_dir: str):
    """Incremental SCD2 maintenance: the history rows a refresh after the
    mid-replay anchor would APPEND (versions opened post-anchor) or CLOSE
    (previously-open intervals whose ``valid_to`` was set by a post-anchor
    event) — the per-interval work of keeping a history table current
    without re-deriving the corpus.

    Scale shape: pass 1 finds the dirty conv set from the POST-ANCHOR log
    shards only — the ``changes-{epoch}-{lo}-{hi}`` filename ranges prune
    the file list before any IO, then a predicate-pushdown scan collects
    O(window) distinct keys. Pass 2 re-derives per-key history ONLY for
    dirty keys: the key set broadcasts once (``ray.put``) and filters each
    batch via ``searchsorted`` BEFORE the shuffle, so the bounded-partition
    fold runs over delta-sized input. (Like `cdc_snapshot_diff`, assumes no
    reorg crosses the anchor — the generator's rollback epoch precedes it;
    a crossing rollback widens the dirty set via the undo window.)"""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    _, anchor = _snapshot_round_cursor(sf_dir)
    files = _log_files(sf_dir)

    def _hi(path: str) -> int:
        # changes-{epoch:06d}-{lo}-{hi}[-sNN].parquet
        return int(os.path.basename(path).split("-")[3].split(".")[0])

    post = [f for f in files if _hi(f) > anchor]
    dirty_tbl = pads.dataset(post).to_table(
        columns=["conv_id"],
        filter=(pads.field("cursor") > anchor)
        & (pads.field("op") != "rollback"),
    )
    dirty = np.sort(
        pc.unique(dirty_tbl.column("conv_id")).to_numpy(zero_copy_only=False)
    )

    hist = _scd2_history(sf_dir, conv_keys=dirty)

    def delta_only(b: pd.DataFrame) -> pd.DataFrame:
        vf = b["valid_from"].to_numpy() // _WM > anchor
        vt = b["valid_to"].to_numpy()
        closed = (vt != _SCD2_OPEN) & (vt // _WM > anchor)
        return b[vf | closed]

    return hist.map_batches(delta_only, batch_format="pandas")


# as-of probe anchors: first, second-to-last and last committed rounds of
# the tier's replay plan (pure footer-only planning, shared with the SQL)
_ASOF_POSITIONS = (0, -2, -1)


def _asof_probe_wms(sf_dir: str) -> list[int]:
    """Probe watermarks: end-of-round boundaries in composite-watermark
    time ((cursor_hi+1)·WM − 1 includes every seq at cursor_hi)."""
    return sorted(
        {
            (_plan_round_at(sf_dir, pos)[2] + 1) * _WM - 1
            for pos in _ASOF_POSITIONS
        }
    )


def cdc_scd2_asof(sf_dir: str):
    """Batched point-in-time lookups against the versioned history: for a
    deterministic probe set (the tier's lookup keys × three committed
    round boundaries), the version of each (conv_id, turn_idx) that was
    valid at each probe watermark — the "what did this dimension row look
    like when the fact happened" as-of class that SCD2 tables exist to
    serve.

    Scale shape: the history derivation is RESTRICTED to the probe keys
    before its shuffle (the ``_scd2_history(conv_keys=...)`` broadcast
    semi-join — probe-sized input, not corpus-sized), then every batch
    resolves ALL probe watermarks with k vectorized interval tests
    (k = #probes, constant). Delete-versions resolve to absent, open
    intervals carry the −1 sentinel. Contrast ``cdc_time_travel`` (full
    snapshot via manifest version history) — this path never touches the
    lake at all, it serves point-in-time from the derived history table."""
    keys = np.array(sorted(_lookup_keys(sf_dir)), dtype=object)
    wms = _asof_probe_wms(sf_dir)
    hist = _scd2_history(sf_dir, conv_keys=keys)

    def resolve(b: pd.DataFrame) -> pd.DataFrame:
        vf = b["valid_from"].to_numpy(np.int64)
        vt = b["valid_to"].to_numpy(np.int64)
        alive = b["ver_op"].to_numpy(dtype=object) != "delete"
        outs = []
        for w in wms:
            m = alive & (vf <= w) & ((vt == _SCD2_OPEN) | (vt > w))
            sub = b.loc[
                m, ["conv_id", "turn_idx", "ver", "role", "text", "tool", "ts"]
            ].copy()
            sub.insert(0, "probe_wm", np.full(int(m.sum()), w, np.int64))
            outs.append(sub)
        return pd.concat(outs, ignore_index=True)

    df = hist.map_batches(resolve, batch_format="pandas").to_pandas()
    return df.sort_values(
        ["probe_wm", "conv_id", "turn_idx"], kind="stable"
    ).reset_index(drop=True)


CDC_SNAPSHOT_DIFF_SQL_TEMPLATE = """
WITH lo AS ({lo_replay}), hi AS ({hi_replay})
SELECT COALESCE(lo.conv_id, hi.conv_id) AS conv_id,
       CAST(COALESCE(lo.turn_idx, hi.turn_idx) AS INTEGER) AS turn_idx,
       CASE WHEN lo.conv_id IS NULL THEN 'insert'
            WHEN hi.conv_id IS NULL THEN 'delete'
            ELSE 'update' END AS kind,
       lo.role AS old_role, hi.role AS new_role,
       lo.text AS old_text, hi.text AS new_text,
       lo.tool AS old_tool, hi.tool AS new_tool,
       lo.ts AS old_ts, hi.ts AS new_ts
FROM lo FULL OUTER JOIN hi
  ON lo.conv_id = hi.conv_id AND lo.turn_idx = hi.turn_idx
WHERE lo.conv_id IS NULL OR hi.conv_id IS NULL
   OR lo.role IS DISTINCT FROM hi.role
   OR lo.text IS DISTINCT FROM hi.text
   OR lo.tool IS DISTINCT FROM hi.tool
   OR lo.ts   IS DISTINCT FROM hi.ts
"""


# -- events-as-changelog: SQL-checkable CDC apply --------------------------

TURN_MOD = 50


def cdc_apply_events(sf_dir: str):
    """Reinterpret the ``events`` table as a CDC change log — key
    ('u'+user_id, event_id % 50), cursor=event_id, 'error' events are
    deletes, everything else a full-row insert — and fold it with the SAME
    guarded-LWW merge kernel the lake engine uses
    (`raycdc.merge.merge_partition`). DuckDB expresses the result as a
    per-key arg-max, so the kernel is verified relationally end to end."""
    ds = C.read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "props"])
    payload = ["role", "text", "ts"]

    def to_changes(t: pa.Table) -> pa.Table:
        user = t.column("user_id").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        etype = t.column("event_type").to_numpy(zero_copy_only=False)
        conv = np.char.add("u", user.astype(str)).astype(object)
        out = pa.table(
            {
                "conv_id": pa.array(conv, pa.string()),
                "turn_idx": pa.array((eid % TURN_MOD).astype(np.int32)),
                "op": pa.array(
                    np.where(etype == "error", "delete", "insert"), pa.string()
                ),
                "role": t.column("event_type"),
                "text": t.column("props"),
                "ts": t.column("ts"),
                "cursor": pa.array(eid.astype(np.int64)),
                "seq": pa.array(np.zeros(len(eid), np.int32)),
            }
        )
        part = P.assign_part(conv, 16)
        return out.append_column("part", pa.array(part, pa.int32()))

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("ts", pa.timestamp("us")),
            ("cursor", pa.int64()),
        ]
    )

    def fold(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from raycdc import schema as S

        out = M.merge_partition_table(None, g, payload)
        out = out.filter(pc.invert(out.column(M.DELETED_COL)))
        # fixed output schema per group: an all-null column must not drift
        # the block schema (the round-1 RefBundle-schema warning source)
        return S.conform(out, out_schema)

    return (
        ds.map_batches(to_changes, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
    )


CDC_APPLY_EVENTS_SQL = f"""
WITH ch AS (
    SELECT 'u' || CAST(user_id AS VARCHAR) AS conv_id,
           CAST(event_id % {TURN_MOD} AS INTEGER) AS turn_idx,
           CASE WHEN event_type = 'error' THEN 'delete' ELSE 'insert' END AS op,
           event_type AS role, props AS text, ts, event_id AS cursor
    FROM events
), ranked AS (
    SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY cursor DESC) AS rn
    FROM ch
)
SELECT conv_id, turn_idx, role, text, ts, cursor
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


# -- DuckDB oracle for the full replay (rollbacks + guarded LWW + patch
# -- semantics as window functions over the generated change log) ----------

# composite watermark: seq < CURSOR_GROUP (=4), 1e6 is safely larger
_WM = 1_000_000

# shared CTE prefix: raw stream -> reorg-resolved effective events with a
# composite watermark (reused by the replay, conv_latest and aggregate
# oracles)
_EFF_CTES = f"""
raw AS (
    SELECT op, conv_id, turn_idx, role, text, tool, ts, cursor, seq, epoch,
           rollback_to_cursor
    FROM read_parquet('{{path}}')
), ordered AS (
    SELECT *,
        MIN(CASE WHEN op = 'rollback' THEN rollback_to_cursor END) OVER (
            ORDER BY epoch, cursor, seq
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rb_floor
    FROM raw
), eff AS (
    SELECT conv_id, turn_idx, role, text, tool, ts, op,
           cursor * {_WM} + seq AS wm
    FROM ordered
    WHERE op <> 'rollback' AND (rb_floor IS NULL OR cursor <= rb_floor)
)
"""

CONV_LATEST_SQL_TEMPLATE = f"""
WITH {_EFF_CTES}
SELECT conv_id,
    CAST(arg_max(turn_idx, wm) FILTER (WHERE turn_idx IS NOT NULL) AS INTEGER) AS turn_idx,
    arg_max(role, wm) FILTER (WHERE role IS NOT NULL) AS role,
    arg_max(text, wm) FILTER (WHERE text IS NOT NULL) AS text,
    arg_max(tool, wm) FILTER (WHERE tool IS NOT NULL) AS tool,
    arg_max(ts, wm)   FILTER (WHERE ts IS NOT NULL)   AS ts,
    CAST(max(wm) // {_WM} AS BIGINT) AS cursor,
    CAST(max(wm) % {_WM} AS INTEGER) AS seq
FROM eff GROUP BY conv_id
"""

# SCD2 oracle: the replay's segment fold as CUMULATIVE window functions —
# one version row per surviving effective event, payload ffilled within the
# (key, seg) partition, interval closed by the key's next event
CDC_HISTORY_SCD2_SQL_TEMPLATE = f"""
WITH {_EFF_CTES}, dedup AS (
    SELECT DISTINCT conv_id, turn_idx, role, text, tool, ts, op, wm FROM eff
), segged AS (
    SELECT *, count(*) FILTER (WHERE op IN ('insert', 'delete')) OVER (
        PARTITION BY conv_id, turn_idx ORDER BY wm
        ROWS UNBOUNDED PRECEDING) AS seg
    FROM dedup
), folded AS (
    SELECT conv_id, turn_idx, wm, op,
        last_value(role IGNORE NULLS) OVER w AS role,
        last_value(text IGNORE NULLS) OVER w AS text,
        last_value(tool IGNORE NULLS) OVER w AS tool,
        last_value(ts IGNORE NULLS)   OVER w AS ts
    FROM segged
    WINDOW w AS (PARTITION BY conv_id, turn_idx, seg ORDER BY wm
                 ROWS UNBOUNDED PRECEDING)
), vers AS (
    SELECT *,
        CAST(row_number() OVER wk AS BIGINT) AS ver,
        lead(wm) OVER wk AS valid_to_wm
    FROM folded
    WINDOW wk AS (PARTITION BY conv_id, turn_idx ORDER BY wm)
)
SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx, ver, op AS ver_op,
       role, text, tool, ts,
       CAST(wm AS BIGINT) AS valid_from,
       CAST(COALESCE(valid_to_wm, {_SCD2_OPEN}) AS BIGINT) AS valid_to,
       CAST((valid_to_wm IS NULL AND op <> 'delete') AS BIGINT) AS is_current
FROM vers
"""


# the replay's full CTE chain (raw → reorg-resolved → segmented → folded),
# shared by the final-state replay and the changefeed (which keeps deletes);
# the evolved variant reads a MIXED-schema log (union_by_name fills the
# late-added tool_meta with NULL for old shards and unifies the widened
# turn_idx to BIGINT) and folds the new column like any other payload.
def _folded_ctes_sql(evolved: bool = False) -> str:
    pay = "role, text, tool, tool_meta, ts" if evolved else "role, text, tool, ts"
    read_opts = ", union_by_name=true" if evolved else ""
    fold_meta = (
        "        arg_max(tool_meta, wm) FILTER (WHERE tool_meta IS NOT NULL)"
        " AS tool_meta,\n"
        if evolved
        else ""
    )
    return f"""
WITH raw AS (
    SELECT op, conv_id, turn_idx, {pay}, cursor, seq, epoch,
           rollback_to_cursor
    FROM read_parquet('{{path}}'{read_opts}){{where}}
), ordered AS (
    -- reorg resolution: an event is orphaned iff ANY LATER rollback (in
    -- stream order) targets a cursor below it. rb_floor = running min of
    -- rollback targets over the remaining stream.
    SELECT *,
        MIN(CASE WHEN op = 'rollback' THEN rollback_to_cursor END) OVER (
            ORDER BY epoch, cursor, seq
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rb_floor
    FROM raw
), eff AS (
    SELECT conv_id, turn_idx, {pay}, op,
           cursor * {_WM} + seq AS wm
    FROM ordered
    WHERE op <> 'rollback' AND (rb_floor IS NULL OR cursor <= rb_floor)
), segged AS (
    -- insert/delete start a new segment; only each key's LAST segment
    -- survives (insert replaces the whole row, delete tombstones it)
    SELECT *,
        MAX(CASE WHEN op IN ('insert', 'delete') THEN wm END) OVER (
            PARTITION BY conv_id, turn_idx) AS seg_start
    FROM eff
), seg AS (
    SELECT * FROM segged WHERE seg_start IS NULL OR wm >= seg_start
), folded AS (
    -- per payload column: last NON-NULL value in the surviving segment
    -- (update nulls mean "unchanged"); exact (key, cursor, seq)
    -- re-deliveries carry identical payloads so arg_max needs no dedup
    SELECT conv_id, turn_idx,
        arg_max(role, wm) FILTER (WHERE role IS NOT NULL) AS role,
        arg_max(text, wm) FILTER (WHERE text IS NOT NULL) AS text,
        arg_max(tool, wm) FILTER (WHERE tool IS NOT NULL) AS tool,
{fold_meta}        arg_max(ts, wm)   FILTER (WHERE ts IS NOT NULL)   AS ts,
        max(wm) AS last_wm,
        arg_max(op, wm) AS last_op
    FROM seg GROUP BY conv_id, turn_idx
)
"""


_FOLDED_CTES = _folded_ctes_sql()

CDC_REPLAY_SQL_TEMPLATE = (
    _FOLDED_CTES
    + f"""
SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx, role, text, tool, ts,
       CAST(last_wm // {_WM} AS BIGINT) AS cursor,
       CAST(last_wm % {_WM} AS INTEGER) AS seq
FROM folded WHERE last_op <> 'delete'
"""
)

# evolved-schema replay: turn_idx is BIGINT post-widen, tool_meta appears
CDC_EVOLVED_REPLAY_SQL_TEMPLATE = (
    _folded_ctes_sql(evolved=True)
    + f"""
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role, text, tool,
       tool_meta, ts,
       CAST(last_wm // {_WM} AS BIGINT) AS cursor,
       CAST(last_wm % {_WM} AS INTEGER) AS seq
FROM folded WHERE last_op <> 'delete'
"""
)

# changefeed: every key whose final watermark post-dates the anchor cursor;
# deletes survive (tagged, payload nulled) instead of being dropped
CDC_CHANGEFEED_SQL_TEMPLATE = (
    _FOLDED_CTES
    + f"""
SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx,
       CASE WHEN last_op = 'delete' THEN NULL ELSE role END AS role,
       CASE WHEN last_op = 'delete' THEN NULL ELSE text END AS text,
       CASE WHEN last_op = 'delete' THEN NULL ELSE tool END AS tool,
       CASE WHEN last_op = 'delete' THEN NULL ELSE ts END AS ts,
       CAST(last_wm // {_WM} AS BIGINT) AS cursor,
       CAST(last_wm % {_WM} AS INTEGER) AS seq,
       CASE WHEN last_op = 'delete' THEN 'delete' ELSE 'upsert' END AS change_op
FROM folded WHERE last_wm // {_WM} > {{anchor_cursor}}
"""
)

# inverted index: per canonical tool-carrying event (rollback-resolved
# `eff` CTE), the max watermark per (tool, conv_id, turn_idx) — deletes
# never retract (non-covering index), orphaned epochs never appear
CDC_TOOL_INDEX_SQL_TEMPLATE = (
    _FOLDED_CTES
    + f"""
SELECT tool, conv_id, CAST(turn_idx AS INTEGER) AS turn_idx,
       CAST(max(wm) // {_WM} AS BIGINT) AS cursor,
       CAST(max(wm) % {_WM} AS INTEGER) AS seq
FROM eff
WHERE tool IS NOT NULL AND tool <> ''
GROUP BY tool, conv_id, turn_idx
"""
)

# fingerprint index: per live key, the SimHash of the last text-SETTING
# event's text and THAT event's watermark (later text-less patches bump the
# primary watermark but not the index — the fingerprint is still current).
# Segment restriction is immaterial for text: every segment starter carries
# text, so the global text LWW equals the surviving-segment one.
def _fingerprint_sql(path: str) -> str:
    from raycdc import textkit as TK
    from raycdc.queries.neardup import simhash_sig_cte

    return (
        _FOLDED_CTES.format(path=path, where="")
        + f""", fp AS (
    SELECT conv_id, turn_idx,
        arg_max(text, wm) FILTER (WHERE text IS NOT NULL) AS text,
        max(wm) FILTER (WHERE text IS NOT NULL) AS text_wm,
        arg_max(op, wm) AS last_op
    FROM seg GROUP BY conv_id, turn_idx
), toks AS (
    SELECT conv_id, turn_idx, text_wm, {TK.toks_sql('text')} AS t
    FROM fp WHERE last_op <> 'delete'
), {simhash_sig_cte('conv_id, turn_idx, text_wm')[1:]}
SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx, simhash,
       CAST(text_wm // {_WM} AS BIGINT) AS cursor,
       CAST(text_wm % {_WM} AS INTEGER) AS seq
FROM sig
"""
    )


# join view: full-recompute formulation — the incremental path must match
CDC_JOIN_VIEW_SQL_TEMPLATE = """
WITH replay AS ({replay}),
agg AS (
    SELECT conv_id, CAST(count(*) AS BIGINT) AS conv_n_turns,
           max(ts) AS conv_last_ts
    FROM replay GROUP BY conv_id
)
SELECT r.conv_id, CAST(r.turn_idx AS BIGINT) AS turn_idx, r.role,
       a.conv_n_turns, a.conv_last_ts
FROM replay r JOIN agg a USING (conv_id)
"""


CDC_CONV_STATS_SQL_TEMPLATE = """
WITH replay AS ({replay})
SELECT conv_id,
       count(*) AS n_turns,
       CAST(max(turn_idx) AS BIGINT) AS max_turn,
       max(ts) AS last_ts,
       CAST(max(cursor) AS BIGINT) AS max_cursor
FROM replay GROUP BY conv_id
"""


def build_cdc_oracle_sql(sf_dir: str) -> dict[str, str]:
    """DuckDB oracles for the replay queries at ``sf_dir``'s tier. The SQL
    reads the SAME generated change-log parquet the Ray queries replay
    (path embedded), so this also GENERATES the log if absent — the SQL
    must be runnable the moment it is handed out."""
    spec = _spec_for(sf_dir, rollback_epochs=(1,))
    log_dir = gen.cached_change_log(spec)
    path = os.path.join(log_dir, "changes-*.parquet")
    # the dead-letter variant replays its OWN log (bad rows planted)
    dl_spec = _spec_for(
        sf_dir, rollback_epochs=(1,), bad_row_every=_DL_BAD_EVERY
    )
    dl_path = os.path.join(gen.cached_change_log(dl_spec), "changes-*.parquet")
    replay = CDC_REPLAY_SQL_TEMPLATE.format(path=path, where="")
    # time travel: the snapshot at a committed round boundary is exactly the
    # replay of the log prefix up to that round's last epoch (plan_rounds is
    # deterministic, so both sides pick the same round)
    _, max_epoch = _snapshot_round_epoch(sf_dir)
    time_travel = CDC_REPLAY_SQL_TEMPLATE.format(
        path=path, where=f" WHERE epoch <= {max_epoch}"
    )
    keys = ", ".join(f"'{k}'" for k in _lookup_keys(sf_dir))
    read_key = (
        f"WITH replay AS ({replay})\n"
        f"SELECT * FROM replay WHERE conv_id IN ({keys})"
    )
    _, anchor_cursor = _snapshot_round_cursor(sf_dir)
    changefeed = CDC_CHANGEFEED_SQL_TEMPLATE.format(
        path=path, where="", anchor_cursor=anchor_cursor
    )
    # window feed: prefix replay to the upper anchor, filter past the lower
    _, _, lo_cursor = _plan_round_at(sf_dir, 0)
    _, hi_epoch, _ = _plan_round_at(sf_dir, -2)
    changefeed_window = CDC_CHANGEFEED_SQL_TEMPLATE.format(
        path=path,
        where=f" WHERE epoch <= {hi_epoch}",
        anchor_cursor=lo_cursor,
    )
    # snapshot diff: anchor snapshot (prefix replay) vs live (full replay),
    # full outer join on the key, NULL-safe payload-difference filter
    snapshot_diff = CDC_SNAPSHOT_DIFF_SQL_TEMPLATE.format(
        lo_replay=time_travel, hi_replay=replay
    )
    # schema evolution replays ITS OWN log variant (later epochs evolved);
    # the SQL reads that variant's cached path with union_by_name
    ev_spec = _spec_for(
        sf_dir, rollback_epochs=(1,), evolve_at_epoch=_evolve_epoch(sf_dir)
    )
    ev_path = os.path.join(gen.cached_change_log(ev_spec), "changes-*.parquet")
    return {
        "cdc_replay": replay,
        "cdc_window_dedup": CDC_WINDOW_DEDUP_SQL_TEMPLATE.format(
            path=path, w=WINDOW_DEDUP_W
        ),
        "cdc_replay_salted": replay,  # salted path must be bit-identical
        "cdc_cascade": replay,  # feed-replicated copy must equal the source
        "cdc_mirror": replay,  # consumer-protocol replica must equal the source
        "cdc_line_dedup": _line_dedup_sql(replay),
        "cdc_mirror_sharded": _mirror_sharded_sql(replay),
        "cdc_consolidate": _consolidate_sql(replay),
        "cdc_branch": time_travel,
        "cdc_branch_promote": replay,
        "cdc_schema_evolution": CDC_EVOLVED_REPLAY_SQL_TEMPLATE.format(
            path=ev_path, where=""
        ),
        "cdc_snapshot_diff": snapshot_diff,
        # per-partition stats: recompute each live key's home partition in
        # SQL with the exact v2-hash mirror and aggregate per partition
        "cdc_partition_stats": (
            f"SELECT CAST(_h % {_MEMO_NPARTS} AS BIGINT) AS partition,\n"
            f"       CAST(count(*) AS BIGINT) AS n_rows,\n"
            f"       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,\n"
            f"       CAST(max(cursor) AS BIGINT) AS max_cursor\n"
            f"FROM ({P.sql_hash_v2_query(replay, 'conv_id')})\n"
            f"GROUP BY 1"
        ),
        "cdc_conv_stats": CDC_CONV_STATS_SQL_TEMPLATE.format(replay=replay),
        "cdc_conv_text": CDC_CONV_TEXT_SQL_TEMPLATE.format(replay=replay),
        "cdc_turn_pairs": CDC_TURN_PAIRS_SQL_TEMPLATE.format(replay=replay),
        "cdc_column_diff": CDC_COLUMN_DIFF_SQL_TEMPLATE.format(
            snapshot_diff=snapshot_diff
        ),
        "cdc_conv_latest": CONV_LATEST_SQL_TEMPLATE.format(path=path),
        "cdc_tool_index": CDC_TOOL_INDEX_SQL_TEMPLATE.format(path=path, where=""),
        "cdc_fingerprint_index": _fingerprint_sql(path),
        # group the fingerprint index by signature, keep groups of >1:
        # identical window both sides (the index IS the replayed state)
        "cdc_neardup_candidates": (
            f"WITH fpidx AS ({_fingerprint_sql(path)})\n"
            "SELECT simhash,\n"
            "       CAST(count(*) OVER (PARTITION BY simhash) AS BIGINT)\n"
            "           AS n_members,\n"
            "       conv_id, turn_idx\n"
            "FROM fpidx\n"
            "QUALIFY n_members > 1"
        ),
        # delta variant: restrict to signatures touched after the anchor,
        # tag members set after it (same anchor resolver as the changefeed)
        "cdc_neardup_delta": (
            f"WITH fpidx AS ({_fingerprint_sql(path)}),\n"
            "dirty AS (SELECT DISTINCT simhash FROM fpidx\n"
            f"          WHERE cursor > {anchor_cursor}),\n"
            "m AS (SELECT f.simhash, f.conv_id, f.turn_idx,\n"
            f"             CAST(f.cursor > {anchor_cursor} AS BIGINT)"
            " AS is_dirty\n"
            "      FROM fpidx f JOIN dirty d USING (simhash))\n"
            "SELECT simhash,\n"
            "       CAST(count(*) OVER (PARTITION BY simhash) AS BIGINT)\n"
            "           AS n_members,\n"
            "       conv_id, turn_idx, is_dirty\n"
            "FROM m\n"
            "QUALIFY n_members > 1"
        ),
        # derived-table feed: current-state rows whose watermark post-dates
        # the anchor; upserts only (the spec never tombstones)
        "cdc_changefeed_latest": (
            f"WITH cl AS ({CONV_LATEST_SQL_TEMPLATE.format(path=path)})\n"
            "SELECT conv_id, turn_idx, role, text, tool, ts, cursor, seq,\n"
            "       'upsert' AS change_op\n"
            f"FROM cl WHERE cursor > {anchor_cursor}"
        ),
        "cdc_round_ledger": _round_ledger_sql(sf_dir, path),
        "cdc_history_scd2": CDC_HISTORY_SCD2_SQL_TEMPLATE.format(path=path),
        # delta = full history restricted to post-anchor opens/closes; the
        # incremental path must reproduce it bit-for-bit
        "cdc_history_scd2_delta": (
            "WITH h AS ("
            + CDC_HISTORY_SCD2_SQL_TEMPLATE.format(path=path)
            + f""")
SELECT * FROM h
WHERE valid_from // {_WM} > {anchor_cursor}
   OR (valid_to <> {_SCD2_OPEN} AND valid_to // {_WM} > {anchor_cursor})"""
        ),
        # as-of probes: interval-join the probe watermarks to the history
        # CTE (same template), delete-versions excluded
        "cdc_scd2_asof": (
            "WITH h AS ("
            + CDC_HISTORY_SCD2_SQL_TEMPLATE.format(path=path)
            + "),\np AS (SELECT * FROM (VALUES "
            + ", ".join(f"({w})" for w in _asof_probe_wms(sf_dir))
            + ") t(probe_wm))\n"
            "SELECT CAST(probe_wm AS BIGINT) AS probe_wm, conv_id, turn_idx,\n"
            "       ver, role, text, tool, ts\n"
            "FROM p JOIN h ON valid_from <= probe_wm\n"
            f"            AND (valid_to = {_SCD2_OPEN} OR valid_to > probe_wm)\n"
            "WHERE conv_id IN ("
            + ", ".join(f"'{k}'" for k in sorted(_lookup_keys(sf_dir)))
            + ") AND ver_op <> 'delete'"
        ),
        "cdc_time_travel": time_travel,
        "cdc_read_key": read_key,
        "cdc_changefeed": changefeed,
        "cdc_changefeed_window": changefeed_window,
        # incremental refresh must equal the full recompute bit-for-bit
        "cdc_incremental_stats": CDC_CONV_STATS_SQL_TEMPLATE.format(
            replay=replay
        ),
        # incremental refresh must equal the full-join recompute bit-for-bit
        "cdc_join_view": CDC_JOIN_VIEW_SQL_TEMPLATE.format(replay=replay),
        # dead letter: the bad set is a pure function of the log, so the
        # oracle selects every malformed DATA row from the dead-letter
        # spec's own log files (rollback markers excluded — they are a
        # plan-level step, never normalized data)
        "cdc_dead_letter": (
            "SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, op,\n"
            "       CAST(cursor AS BIGINT) AS cursor,\n"
            "       'malformed_change_row' AS error_reason\n"
            f"FROM read_parquet('{dl_path}', union_by_name=true)\n"
            "WHERE op <> 'rollback'\n"
            "  AND (op NOT IN ('insert','update','delete')\n"
            "       OR conv_id IS NULL OR turn_idx IS NULL)"
        ),
    }


# -- streaming-window dedup over the change stream ---------------------------

WINDOW_DEDUP_W = 100  # TTL in cursor units: state an online dedup would hold


def cdc_window_dedup(sf_dir: str):
    """Streaming dedup with TTL'd state — the pre-ingest duplicate filter
    a CDC pipeline runs on the wire: an event is a duplicate iff an
    earlier event with IDENTICAL text arrived within the last
    WINDOW_DEDUP_W cursor units. Output one row per flagged event with
    the (cursor, seq) of the event it duplicates.

    This is the task brief's "streaming window" custom operator: an
    online implementation holds a content-hash → last-seen-cursor map
    and evicts entries older than W (state is O(events per W window),
    BOUNDED — never the full history); this derivation computes the same
    predicate over the stream log. Only the NEAREST predecessor matters
    (same text, latest earlier arrival): if it is outside the window,
    every older one is too — so the kernel is one sorted-neighbor
    compare, not a range self-join.

    Shape: filter-pushed log scan (only insert/update rows with text
    leave storage) → ONE bounded-partition shuffle keyed by text (all
    rows of a text co-locate; ``C.by_partition`` is the state shard) →
    vectorized prev-row compare. Raw stream semantics: later-rolled-back
    events are included by design — the wire filter sees them arrive.

    Determinism: stream order within a text group is (cursor, seq,
    conv_id, turn_idx) — (cursor, seq) alone ties across conversations
    in the same round. Exact re-deliveries (full-row duplicates) yield
    identical output rows whichever of the pair sorts first, so the
    result multiset is stable; the SQL oracle orders by the same key."""
    import ray

    files = _log_files(sf_dir)
    import pyarrow.dataset as pads

    logs = ray.data.read_parquet(
        files,
        columns=["conv_id", "turn_idx", "text", "cursor", "seq"],
        filter=(
            pads.field("op").isin(["insert", "update"])
            & ~pads.field("text").is_null()
        ),
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(
            ["text", "cursor", "seq", "conv_id", "turn_idx"], kind="stable"
        )
        t = d["text"].to_numpy(dtype=object)
        c = d["cursor"].to_numpy(np.int64)
        s = d["seq"].to_numpy(np.int64)
        same = np.zeros(len(d), bool)
        if len(d) > 1:
            same[1:] = t[1:] == t[:-1]
        gap_ok = np.zeros(len(d), bool)
        if len(d) > 1:
            gap_ok[1:] = (c[1:] - c[:-1]) <= WINDOW_DEDUP_W
        m = same & gap_ok
        prev = np.flatnonzero(m) - 1
        return pd.DataFrame(
            {
                "conv_id": d["conv_id"].to_numpy(dtype=object)[m],
                "turn_idx": d["turn_idx"].to_numpy(np.int64)[m],
                "cursor": c[m],
                "seq": s[m],
                "dup_of_cursor": c[prev],
                "dup_of_seq": s[prev],
            }
        )

    return C.by_partition(logs, "text", kernel)


CDC_WINDOW_DEDUP_SQL_TEMPLATE = """
WITH ev AS (
  SELECT conv_id, turn_idx, text, cursor, seq
  FROM read_parquet('{path}')
  WHERE op IN ('insert', 'update') AND text IS NOT NULL
), lagged AS (
  SELECT conv_id, turn_idx, cursor, seq,
         lag(cursor) OVER w AS pc, lag(seq) OVER w AS ps
  FROM ev
  WINDOW w AS (PARTITION BY text ORDER BY cursor, seq, conv_id, turn_idx)
)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       CAST(cursor AS BIGINT) AS cursor, CAST(seq AS BIGINT) AS seq,
       CAST(pc AS BIGINT) AS dup_of_cursor, CAST(ps AS BIGINT) AS dup_of_seq
FROM lagged
WHERE pc IS NOT NULL AND cursor - pc <= {w}
"""


QUERIES = {
    "cdc_replay": cdc_replay,
    "cdc_window_dedup": cdc_window_dedup,
    "cdc_replay_salted": cdc_replay_salted,
    "cdc_schema_evolution": cdc_schema_evolution,
    "cdc_dead_letter": cdc_dead_letter,
    "cdc_partition_stats": cdc_partition_stats,
    "cdc_cascade": cdc_cascade,
    "cdc_mirror": cdc_mirror,
    "cdc_line_dedup": cdc_line_dedup,
    "cdc_mirror_sharded": cdc_mirror_sharded,
    "cdc_consolidate": cdc_consolidate,
    "cdc_conv_stats": cdc_conv_stats,
    "cdc_conv_latest": cdc_conv_latest,
    "cdc_tool_index": cdc_tool_index,
    "cdc_fingerprint_index": cdc_fingerprint_index,
    "cdc_neardup_candidates": cdc_neardup_candidates,
    "cdc_neardup_delta": cdc_neardup_delta,
    "cdc_apply_events": cdc_apply_events,
    "cdc_history_scd2": cdc_history_scd2,
    "cdc_history_scd2_delta": cdc_history_scd2_delta,
    "cdc_scd2_asof": cdc_scd2_asof,
    "cdc_round_ledger": cdc_round_ledger,
    "cdc_time_travel": cdc_time_travel,
    "cdc_branch": cdc_branch,
    "cdc_branch_promote": cdc_branch_promote,
    "cdc_read_key": cdc_read_key,
    "cdc_changefeed": cdc_changefeed,
    "cdc_changefeed_window": cdc_changefeed_window,
    "cdc_changefeed_latest": cdc_changefeed_latest,
    "cdc_incremental_stats": cdc_incremental_stats,
    "cdc_join_view": cdc_join_view,
    "cdc_snapshot_diff": cdc_snapshot_diff,
    "cdc_conv_text": cdc_conv_text,
    "cdc_turn_pairs": cdc_turn_pairs,
    "cdc_column_diff": cdc_column_diff,
}

ORACLE_SQL = {
    "cdc_apply_events": CDC_APPLY_EVENTS_SQL,
}
