"""File exporters: write the lake (or any Dataset) as cursor-ranged CSV /
JSON / Parquet file sets — the analog of the reference's
``CSVFileItemExporter`` / ``JSONFileItemExporter``
(``indexer/exporters/csv_file_item_exporter.py:18-122``,
``json_file_item_exporter.py:18-121`` in /root/reference): sort by the
range key, split into files of ``rows_per_file`` rows, name each file
``{table}-{lo}-{hi}.{ext}`` so re-exports are idempotent and consumers can
range-prune on filenames. A ``console`` exporter (``ds.show`` analog) and a
``void`` exporter complete the reference's exporter factory surface
(``indexer/exporters/item_exporter.py:9-79``)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq


def _write(tbl: pa.Table, path: str, fmt: str) -> None:
    if fmt == "csv":
        with pa.OSFile(path, "wb") as f:  # explicit truncate
            pacsv.write_csv(tbl, f)
    elif fmt == "json":
        # date_unit="us": the default (ms) silently truncates microseconds,
        # breaking JSONL round-trip fidelity vs the lake's timestamp[us]
        tbl.to_pandas().to_json(
            path, orient="records", lines=True, date_format="iso",
            date_unit="us",
        )
    elif fmt == "parquet":
        pq.write_table(tbl, path)
    elif fmt == "orc":
        from pyarrow import orc as _orc

        _orc.write_table(tbl, path)
    elif fmt == "ipc":
        import pyarrow.feather as _ft

        # Arrow IPC / Feather v2: the zero-copy interchange format —
        # mmap-able by any Arrow runtime with no decode step
        _ft.write_feather(tbl, path, compression="zstd")
    else:
        raise ValueError(f"unknown export format {fmt!r}")


def export_ranged(
    ds,
    out_dir: str,
    table: str = "transcripts",
    fmt: str = "csv",
    range_key: str = "cursor",
    rows_per_file: int = 100_000,
    resume: bool = False,
    sort_keys: list[str] | None = None,
) -> list[str]:
    """Deterministic ranged file export, written by PARALLEL Ray tasks.

    Sorts by ``sort_keys`` (default ``[range_key]``; the reference sorts by
    block number before splitting, ``csv_file_item_exporter.py:46-49``),
    splits the sorted Dataset's blocks into exact ``rows_per_file`` row
    windows by METADATA (block row counts — no row ever passes through the
    driver), and writes one file per window as an independent Ray task.
    Files are named ``{table}-{lo}-{hi}-f{idx}.{ext}``: the actual key
    range for filename range-pruning plus the global file index, which
    makes names unique and deterministic — re-running a failed export
    rewrites identical files (idempotent). With ``resume=True``, windows
    whose file already landed are SKIPPED outright (the atomic tmp→rename
    write means an existing file is complete by construction), so a
    restarted export pays only for the missing windows' fetch+write — the
    brief's resumable-output contract.

    ``resume`` correctness caveat: skipping a landed window is only sound
    when the sort order is TOTAL — with ties in ``sort_keys`` a rerun may
    permute rows across a window boundary, duplicating/dropping rows
    around a skipped file. Pass enough ``sort_keys`` to break ties
    (``export_incremental`` sorts by the watermark + key columns)."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    # Block row counts come from the sorted Dataset's OWN block metadata —
    # no block is ever shipped to a counting task (nor to the driver).
    sorted_ds = ds.sort(sort_keys or [range_key])
    block_refs: list = []
    sizes: list[int] = []
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            block_refs.append(ref)
            sizes.append(int(meta.num_rows))

    @ray.remote
    def _write_window(
        path_prefix: str, fmt: str, range_key: str, file_idx: int,
        skip: int, take: int, *blocks: pa.Table,
    ) -> str:
        # internal blocks may be pandas (upstream stage format) — convert
        tables = [
            b if isinstance(b, pa.Table) else pa.Table.from_pandas(b)
            for b in blocks
        ]
        t = pa.concat_tables(tables, promote_options="permissive").slice(
            skip, take
        )
        lo = t.column(range_key)[0].as_py()
        hi = t.column(range_key)[t.num_rows - 1].as_py()
        path = f"{path_prefix}-{lo}-{hi}-f{file_idx:05d}.{fmt}"
        tmp = path + ".tmp"
        _write(t, tmp, fmt)
        os.replace(tmp, path)
        return path

    offsets = [0]
    for s in sizes:
        offsets.append(offsets[-1] + s)
    total = offsets[-1]
    if total == 0:
        return []

    import bisect
    import glob as _glob
    import re as _re

    prefix = os.path.join(out_dir, table)
    done: dict[int, str] = {}
    if resume:
        pat = _re.compile(
            _re.escape(table) + r"-\d+-\d+-f(\d{5})\." + _re.escape(fmt) + r"$"
        )
        for p in _glob.glob(f"{prefix}-*-f*.{fmt}"):
            m = pat.search(os.path.basename(p))
            if m:
                done[int(m.group(1))] = p
    futs = []
    paths: list[str | None] = []
    n_files = -(-total // rows_per_file)
    for f in range(n_files):
        if f in done:
            paths.append(done[f])
            continue
        start = f * rows_per_file
        stop = min(start + rows_per_file, total)
        b0 = bisect.bisect_right(offsets, start) - 1
        b1 = bisect.bisect_left(offsets, stop, lo=b0)  # exclusive block end
        blocks = [block_refs[i] for i in range(b0, max(b1, b0 + 1))]
        paths.append(None)
        futs.append(
            _write_window.remote(
                prefix, fmt, range_key, f, start - offsets[b0], stop - start,
                *blocks,
            )
        )
    written = iter(ray.get(futs))
    return [p if p is not None else next(written) for p in paths]


def read_ranged_csv(paths_or_dir, lo: int | None = None, hi: int | None = None):
    """CSV source with filename range pruning (``CSVSourceJob`` analog,
    ``indexer/jobs/source_job/csv_source_job.py:34-108``): skip files whose
    ``-lo-hi.`` range cannot intersect [lo, hi], then row-filter exactly."""
    import glob as _glob
    import re

    import ray.data

    if isinstance(paths_or_dir, str) and os.path.isdir(paths_or_dir):
        paths = sorted(_glob.glob(os.path.join(paths_or_dir, "*.csv")))
    else:
        paths = list(paths_or_dir)
    rng = re.compile(r"-(\d+)-(\d+)(?:-[pf]\d+)?\.csv$")
    kept = []
    for p in paths:
        m = rng.search(p)
        if m and lo is not None and int(m.group(2)) < lo:
            continue
        if m and hi is not None and int(m.group(1)) > hi:
            continue
        kept.append(p)
    if not kept:
        # every file pruned: a past-the-data range probe is a normal
        # query and must yield 0 rows, not read_*([])'s ValueError
        return ray.data.from_items([])
    ds = ray.data.read_csv(kept)
    if lo is not None or hi is not None:
        import pyarrow.compute as pc

        def rowfilter(t: pa.Table) -> pa.Table:
            m = pa.array([True] * t.num_rows)
            if lo is not None:
                m = pc.and_(m, pc.greater_equal(t.column("cursor"), lo))
            if hi is not None:
                m = pc.and_(m, pc.less_equal(t.column("cursor"), hi))
            return t.filter(m)

        ds = ds.map_batches(rowfilter, batch_format="pyarrow")
    return ds


def read_ranged_json(
    paths_or_dir,
    lo: int | None = None,
    hi: int | None = None,
    parse_ts: list[str] | None = None,
):
    """JSONL source with the same filename range pruning as
    :func:`read_ranged_csv` (the reference's file-source family,
    ``indexer/jobs/source_job/csv_source_job.py:34-108``, JSON variant):
    skip files whose ``-lo-hi.`` range cannot intersect [lo, hi], then
    row-filter exactly. ``parse_ts`` casts the named ISO-string columns
    back to ``timestamp[us]`` so a JSONL round trip is value-identical to
    the lake (the JSON exporter serializes timestamps as ISO strings)."""
    import glob as _glob
    import re

    import ray.data

    if isinstance(paths_or_dir, str) and os.path.isdir(paths_or_dir):
        paths = sorted(_glob.glob(os.path.join(paths_or_dir, "*.json")))
    else:
        paths = list(paths_or_dir)
    rng = re.compile(r"-(\d+)-(\d+)(?:-[pf]\d+)?\.json$")
    kept = []
    for p in paths:
        m = rng.search(p)
        if m and lo is not None and int(m.group(2)) < lo:
            continue
        if m and hi is not None and int(m.group(1)) > hi:
            continue
        kept.append(p)
    if not kept:
        # every file pruned: a past-the-data range probe is a normal
        # query and must yield 0 rows, not read_*([])'s ValueError
        return ray.data.from_items([])
    ds = ray.data.read_json(kept)
    if lo is not None or hi is not None or parse_ts:
        import pyarrow.compute as pc

        def fix(t: pa.Table) -> pa.Table:
            for c in parse_ts or []:
                if c in t.column_names and pa.types.is_string(
                    t.schema.field(c).type
                ):
                    idx = t.column_names.index(c)
                    # Arrow's cast parses ISO 8601 natively (strptime's %f
                    # is not portable across Arrow builds)
                    t = t.set_column(
                        idx, c, pc.cast(t.column(c), pa.timestamp("us"))
                    )
            m = pa.array([True] * t.num_rows)
            if lo is not None:
                m = pc.and_(m, pc.greater_equal(t.column("cursor"), lo))
            if hi is not None:
                m = pc.and_(m, pc.less_equal(t.column("cursor"), hi))
            return t.filter(m)

        ds = ds.map_batches(fix, batch_format="pyarrow")
    return ds


def read_ranged_orc(paths_or_dir, lo: int | None = None, hi: int | None = None):
    """ORC source with the family's filename range pruning. Ray Data ships
    no ORC reader, so this uses the DOCUMENTED extension point — a
    ``FileBasedDatasource`` subclass whose ``_read_stream`` hands each
    file's Arrow table straight off ``pyarrow.orc`` (zero-copy into the
    block store, one task per file like the built-in readers) — rather
    than a driver-side loop."""
    import glob as _glob
    import re

    import ray.data
    from ray.data.datasource import FileBasedDatasource

    if isinstance(paths_or_dir, str) and os.path.isdir(paths_or_dir):
        paths = sorted(_glob.glob(os.path.join(paths_or_dir, "*.orc")))
    else:
        paths = list(paths_or_dir)
    rng = re.compile(r"-(\d+)-(\d+)(?:-[pf]\d+)?\.orc$")
    kept = []
    for p in paths:
        m = rng.search(p)
        if m and lo is not None and int(m.group(2)) < lo:
            continue
        if m and hi is not None and int(m.group(1)) > hi:
            continue
        kept.append(p)

    class _ORCSource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["orc"]

        def _read_stream(self, f, path):
            from pyarrow import orc as _orc

            # the datasource hands a STREAMING file; ORC needs random
            # access (footer-directed) — buffer one file (files are
            # rows_per_file-bounded by construction) and read zero-copy
            yield _orc.ORCFile(pa.BufferReader(f.read())).read()

    if not kept:
        # every file pruned: a past-the-data range probe is a normal
        # query and must yield 0 rows, not read_*([])'s ValueError
        return ray.data.from_items([])
    ds = ray.data.read_datasource(_ORCSource(kept))
    if lo is not None or hi is not None:
        import pyarrow.compute as pc

        def rowfilter(t: pa.Table) -> pa.Table:
            m = pa.array([True] * t.num_rows)
            if lo is not None:
                m = pc.and_(m, pc.greater_equal(t.column("cursor"), lo))
            if hi is not None:
                m = pc.and_(m, pc.less_equal(t.column("cursor"), hi))
            return t.filter(m)

        ds = ds.map_batches(rowfilter, batch_format="pyarrow")
    return ds


def export_console(ds, limit: int = 20) -> int:
    """Console exporter (``console_item_exporter`` analog)."""
    rows = ds.take(limit)
    for r in rows:
        print(r)
    return len(rows)


def export_void(ds) -> int:
    """Void exporter: consume and drop (``base_exporter`` analog)."""
    return ds.count()


# -- multi-sink URI factory -------------------------------------------------


def create_item_exporter(output: str, **config):
    """One output URI → an exporter callable ``(ds) -> result``. The
    URI-scheme dispatch of the reference's exporter factory
    (``indexer/exporters/item_exporter.py:14-61`` in /root/reference):

    - ``console`` (or empty) → print a head sample
    - ``void`` → consume and drop
    - ``jsonfile://DIR`` / ``csvfile://DIR`` / ``parquetfile://DIR`` /
      ``orcfile://DIR`` → ranged file export into DIR (``table``/
      ``range_key``/``rows_per_file`` from ``config``)
    - ``lake://DIR`` → CDC-apply into the Parquet lake at DIR (the
      ``postgres`` sink analog): the Dataset is staged as one epoch of
      insert events and merged through :class:`raycdc.engine.Engine`
    """
    out = (output or "console").strip()
    if out == "console":
        return lambda ds: export_console(ds, limit=config.get("limit", 20))
    if out == "void":
        return export_void
    for scheme, fmt in (
        ("jsonfile://", "json"),
        ("csvfile://", "csv"),
        ("parquetfile://", "parquet"),
        ("orcfile://", "orc"),
        ("ipcfile://", "ipc"),
    ):
        if out.startswith(scheme):
            target = out[len(scheme):]
            return lambda ds, _t=target, _f=fmt: export_ranged(
                ds,
                _t,
                table=config.get("table", "transcripts"),
                fmt=_f,
                range_key=config.get("range_key", "cursor"),
                rows_per_file=config.get("rows_per_file", 100_000),
            )
    if out.startswith("lake://"):
        target = out[len("lake://"):]

        def to_lake(ds, _t=target):
            from raycdc.engine import Engine

            eng = Engine(
                _t, num_partitions=config.get("num_partitions", 16)
            )
            try:
                return eng.apply_dataset(ds)
            finally:
                eng.close()

        return to_lake
    raise ValueError(f"unable to determine exporter type for {output!r}")


def create_item_exporters(outputs: str | None, **config) -> list:
    """Comma-separated multi-sink list → exporter callables
    (``item_exporter.py:9-12``). ``export_multi`` fans one Dataset out to
    all of them."""
    if not outputs:
        return [create_item_exporter("console", **config)]
    return [
        create_item_exporter(o.strip(), **config)
        for o in outputs.split(",")
        if o.strip()
    ]


def export_multi(ds, outputs: str | None, **config) -> list:
    """Fan one Dataset out to every configured sink, in order. The
    Dataset is lazy; each sink triggers its own execution, so sinks are
    independent (a failing sink does not corrupt the others' output)."""
    return [fn(ds) for fn in create_item_exporters(outputs, **config)]


# -- incremental changefeed export (exactly-once downstream sink) ------------

_STATE_FILE = "_export_state.json"


class ExportAnchorLostError(RuntimeError):
    """The recorded export anchor round is no longer committed (a rollback
    removed it). The downstream copy may contain rows the lake has rolled
    back — re-bootstrap the sink (fresh out_dir / delete the state file)."""


class ExportTableMismatchError(RuntimeError):
    """The out_dir's export state belongs to a DIFFERENT table. An anchor
    is per-feed: inheriting another table's anchor silently skips the new
    table's entire pre-anchor history. Use a separate out_dir per feed."""


def export_incremental(
    engine,
    out_dir: str,
    table: str | None = None,
    fmt: str = "parquet",
    rows_per_file: int = 100_000,
) -> dict:
    """Exactly-once incremental export: each invocation ships ONLY the
    changefeed window since the previous invocation's anchor round to
    cursor-ranged files, then atomically advances the anchor — the
    reference's stream-controller → downstream-sink feed
    (``indexer/controller/stream_controller.py`` exporting each synced
    block range exactly once) re-expressed over the lake's committed-round
    ledger.

    Mechanics per run: anchor = ``{out_dir}/_export_state.json`` (absent →
    bootstrap: the full current state as upserts + standing tombstones as
    deletes); window = ``Engine.read_changes(anchor, head)`` where head is
    the latest committed round — a DETERMINISTIC dataset (both ends are
    committed boundaries, so a retry re-derives byte-identical rows);
    files land via :func:`export_ranged` with ``resume=True`` under a
    window-unique table prefix ``{table}-chg-{from}-{to}``; the state file
    is swapped tmp→rename only after every file is durable.

    Crash matrix: die before any file → nothing changed; die mid-files →
    rerun re-exports the same window, ``resume`` skips landed files
    (deterministic names + atomic per-file rename mean an existing file is
    complete); die between last file and state swap → rerun rewrites
    nothing (all files skip) and then advances the anchor. The anchor
    itself is the exactly-once fence — no window is ever shipped twice.

    If a rollback removed the anchor round from the committed ledger the
    downstream copy may hold rolled-back rows; that is detected (the
    anchor is absent from the ledger) and raised as
    :class:`ExportAnchorLostError` rather than silently re-feeding."""
    import json

    lake = engine.lake
    rounds = lake.manifest["committed_rounds"]
    os.makedirs(out_dir, exist_ok=True)
    state_path = os.path.join(out_dir, _STATE_FILE)
    # resolve through the engine's table registry (as consumer_poll/ack
    # do): labeling the default feed by a name the table does NOT have
    # would make table=None and table='<primary>' look like two different
    # feeds and trip ExportTableMismatchError on the second call
    tbl = engine.tables[engine._table_index(table)].name
    state = {"last_round": None, "windows": [], "table": tbl}
    if os.path.exists(state_path):
        with open(state_path) as f:
            state = json.load(f)
    # the anchor is PER-FEED: a state file written for another table must
    # never be inherited (it would skip this table's pre-anchor history)
    recorded_tbl = state.get("table", tbl)
    if recorded_tbl != tbl:
        raise ExportTableMismatchError(
            f"out_dir {out_dir!r} holds the export state of table "
            f"{recorded_tbl!r}, not {tbl!r}; use a separate out_dir per feed"
        )
    anchor = state["last_round"]
    if anchor is not None and anchor not in {r["round_id"] for r in rounds}:
        raise ExportAnchorLostError(
            f"anchor round {anchor!r} is no longer committed (rolled back); "
            f"re-bootstrap the sink"
        )
    if not rounds or (anchor is not None and rounds[-1]["round_id"] == anchor):
        return {"exported_files": [], "window": None, "anchor": anchor}
    head = rounds[-1]["round_id"]
    lo_idx = -1 if anchor is None else lake.round_position(anchor)
    hi_idx = lake.round_position(head)
    feed = engine.read_changes(
        since_round=anchor, until_round=head, table=table
    )
    prefix = f"{tbl}-chg-{lo_idx + 1:06d}-{hi_idx:06d}"
    # reap orphans: a crashed run that was overtaken by NEW commits left
    # partial files under a prefix that will never be completed or
    # recorded — anything from this window start that is neither a
    # recorded window nor the prefix about to be (re)written ships the
    # same rows twice downstream if left behind
    recorded = tuple(w["prefix"] for w in state["windows"])
    stale = f"{tbl}-chg-{lo_idx + 1:06d}-"
    for f in os.listdir(out_dir):
        if (
            f.startswith(stale)
            and not f.startswith(prefix)
            and not f.startswith(recorded or ("\0",))
        ):
            os.remove(os.path.join(out_dir, f))
    # total sort order (watermark + key) so a crash-rerun reproduces the
    # exact row→file assignment and resume can skip landed files safely
    key_cols = list(engine.tables[engine._table_index(table)].key_cols)
    files = export_ranged(
        feed, out_dir, table=prefix, fmt=fmt,
        rows_per_file=rows_per_file, resume=True,
        sort_keys=["cursor", "seq", *key_cols],
    )
    new_state = {
        "last_round": head,
        "table": tbl,
        "windows": state["windows"]
        + [{"from_idx": lo_idx + 1, "to_idx": hi_idx, "round": head,
            "prefix": prefix, "n_files": len(files)}],
    }
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(new_state, f)
    os.replace(tmp, state_path)
    return {"exported_files": files, "window": (lo_idx + 1, hi_idx),
            "anchor": head}


def read_ranged_ipc(paths_or_dir, lo: int | None = None, hi: int | None = None):
    """Arrow IPC (Feather v2) source with the family's filename range
    pruning — completes the sink/source pairing for the interchange
    format. Same documented ``FileBasedDatasource`` extension point as
    the ORC reader: one Ray read task per kept file, the table handed
    zero-copy into the block store."""
    import glob as _glob
    import re

    import ray.data
    from ray.data.datasource import FileBasedDatasource

    if isinstance(paths_or_dir, str) and os.path.isdir(paths_or_dir):
        paths = sorted(_glob.glob(os.path.join(paths_or_dir, "*.ipc")))
    else:
        paths = list(paths_or_dir)
    rng = re.compile(r"-(\d+)-(\d+)(?:-[pf]\d+)?\.ipc$")
    kept = []
    for p in paths:
        m = rng.search(p)
        if m and lo is not None and int(m.group(2)) < lo:
            continue
        if m and hi is not None and int(m.group(1)) > hi:
            continue
        kept.append(p)

    class _IPCSource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["ipc"]

        def _read_stream(self, f, path):
            import pyarrow.feather as _ft

            # feather needs random access (footer-directed); buffer one
            # file (files are rows_per_file-bounded by the exporter)
            yield _ft.read_table(pa.BufferReader(f.read()))

    if not kept:
        # every file pruned: a past-the-data range probe is a normal
        # query and must yield 0 rows, not read_*([])'s ValueError
        return ray.data.from_items([])
    ds = ray.data.read_datasource(_IPCSource(kept))
    if lo is not None or hi is not None:
        import pyarrow.compute as pc

        def rowfilter(t: pa.Table) -> pa.Table:
            m = pa.array([True] * t.num_rows)
            if lo is not None:
                m = pc.and_(m, pc.greater_equal(t.column("cursor"), lo))
            if hi is not None:
                m = pc.and_(m, pc.less_equal(t.column("cursor"), hi))
            return t.filter(m)

        ds = ds.map_batches(rowfilter, batch_format="pyarrow")
    return ds


# -- lake→lake mirroring (changefeed-fed replica, exactly-once effect) --------


def _mirror_journal_path(dst, consumer: str) -> str:
    return os.path.join(dst.lake.root, f"_mirror_{consumer}.json")


def _mirror_journal(dst, consumer: str) -> list:
    path = _mirror_journal_path(dst, consumer)
    if not os.path.exists(path):
        return []
    import json

    with open(path) as f:
        return json.load(f)


def _mirror_journal_write(dst, consumer: str, entries: list) -> None:
    import json

    path = _mirror_journal_path(dst, consumer)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(entries, f)
    os.replace(tmp, path)


def _repair_replica(src, dst, consumer: str, table: str | None = None) -> dict:
    """Reorg repair for a mirrored replica: the consumer's anchor round was
    erased by a source rollback, so every replica epoch derived from an
    undone window must be rolled back too. The mirror journal maps each
    replica epoch to the src round it was cut at; an entry is still VALID
    iff that src round is still committed AT THE SAME LEDGER POSITION
    (round ids are deterministic per epoch range, so same id + same
    position ⇒ same content in this engine's immutable-log model). The
    replica rolls back to the newest valid entry's boundary and the
    consumer re-anchors there; with no valid entry, the replica rolls
    back to EMPTY and the consumer resets to bootstrap (a bootstrap
    window upserts current state but cannot delete undone rows — hence
    empty-first). Bounded by the replica's undo window like any
    rollback; a deeper repair needs a fresh replica."""
    valid_epoch, valid_round = 0, None
    for ent in _mirror_journal(dst, consumer):
        try:
            pos = src.lake.round_position(ent["src_round"])
        except KeyError:
            break
        if ent.get("base", 0) + pos + 1 != ent["epoch"]:
            break
        valid_epoch, valid_round = ent["epoch"], ent["src_round"]
    # replica round ids are r{epoch:06d}-{epoch:06d}; find the boundary
    to_cursor = 0
    for r in dst.lake.manifest["committed_rounds"]:
        try:
            e = int(r["round_id"].split("-", 1)[0][1:])
        except ValueError:  # non-mirror round (e.g. a prior rollback@N)
            continue
        if e <= valid_epoch:
            to_cursor = int(r["cursor_hi"])
    dst.lake.rollback(to_cursor)
    if valid_round is None:
        src.consumer_reset(consumer)
    else:
        # keep the consumer's table binding: acking without `table` would
        # raise for a feed bound to a non-primary table — AFTER the replica
        # rollback already ran, wedging repair permanently
        src.consumer_ack(consumer, valid_round, table=table)
    journal = [
        e for e in _mirror_journal(dst, consumer) if e["epoch"] <= valid_epoch
    ]
    _mirror_journal_write(dst, consumer, journal)
    return {"repaired_to_epoch": valid_epoch, "anchor": valid_round}


def replicate_lake(
    src,
    dst,
    consumer: str = "mirror",
    table: str | None = None,
    shard: tuple[int, int] | None = None,
    on_rollback: str = "raise",
    key_prefix: str | None = None,
    epoch_base: int = 0,
) -> dict:
    """Mirror one lake table into ANOTHER lake via the changefeed consumer
    protocol — the full CDC composition: upstream change log → src lake →
    net-delta changefeed → dst lake upsert apply (the reference's
    multi-sink fan-out of synced block ranges,
    ``indexer/controller/stream_controller.py`` in /root/reference, with a
    second lake as the sink).

    Each tick ships the consumer's next window as ONE dst epoch whose
    number is the src head's ledger position + 1 — deterministic across
    retries — so three independent fences stack into exactly-once EFFECT
    under crash-anywhere:

    - crash before dst commit → nothing changed; re-poll re-derives the
      byte-identical window (both anchors are committed rounds);
    - crash between dst commit and ack → re-delivery hits dst's epoch
      fence (same window → same epoch → skipped) or, if src advanced
      meanwhile, the wider window's overlap re-applies as guarded-LWW
      no-ops (net-delta windows are idempotent);
    - re-acking is a no-op.

    A consumer whose anchor was rolled away raises (consumer_poll's
    KeyError) — roll the replica back to the matching boundary or
    re-bootstrap it; mirroring never silently re-feeds undone rows.
    Schema evolution flows through: the feed carries the src table's
    current schema and dst unifies Arrow-natively on apply.

    ``shard=(i, n)`` makes this a KEY-SHARDED publication: the replica
    receives only rows whose key hash lands in shard ``i`` of ``n``
    (Postgres logical-replication publication / Kafka topic-partition
    fan-out). The predicate is on the KEY — never the payload — so
    deletes (payload nulled) route to the same replica as the upserts
    they tombstone, and the N shard replicas partition the source
    exactly. The hash is the engine's v2 key hash, so shard routing is
    SQL-checkable via :func:`raycdc.partition.sql_hash_v2_query`.

    ``on_rollback="repair"`` turns a rolled-away anchor (consumer_poll's
    KeyError) into automatic reorg recovery via :func:`_repair_replica`:
    the replica rolls back to the newest window boundary the source still
    vouches for, the consumer re-anchors there, and replication resumes —
    the reference's reorg-then-resync loop
    (``indexer/controller/reorg_controller.py``) closed over a replica.

    ``key_prefix`` / ``epoch_base`` make this one leg of a FAN-IN
    (:func:`consolidate_lakes`): keys are namespaced ``{prefix}{key}`` so
    N sources share one destination table with disjoint key spaces, and
    epochs are offset per source so round ids never collide. The shard
    filter, when combined, applies to the SOURCE key (routing stays
    aligned with the source's own partitioning).

    Returns {"windows": n_applied, "results": [apply metrics...],
    "repaired": repair info when a reorg repair ran}.
    """
    import numpy as np
    import pyarrow.compute as pc

    from raycdc import partition as _P

    if on_rollback == "repair" and epoch_base:
        raise ValueError(
            "on_rollback='repair' is unsupported for consolidated "
            "(epoch_base) replicas: a replica rollback is a global cursor "
            "boundary and would undo OTHER sources' rounds too — repair "
            "each source into its own replica, or rebuild the fan-in"
        )
    key_col = src.tables[src._table_index(table)].key_cols[0]

    # Offset/destination consistency fence: the consumer offset is durable
    # on the SOURCE lake keyed only by name, so re-pointing an anchored
    # consumer at a fresh (or different) dst would silently skip the
    # bootstrap window and ship only post-offset deltas — a permanently
    # incomplete replica. An anchored consumer must find a dst that this
    # consumer's journal says was fed from THIS source.
    st = src.consumer_status(consumer)
    journal0 = _mirror_journal(dst, consumer)
    # READ-ONLY identity: replication must never take the source's writer
    # lock (consumer_poll/ack are lock-free by contract — a mirror of a
    # lake another process is actively streaming must keep working). Lakes
    # written by this engine are stamped at first commit_round; an
    # unstamped (legacy/empty) source simply skips the cross-source check.
    src_id = src.lake.manifest.get("lake_id")
    stale = [
        e.get("src_lake")
        for e in journal0
        if e.get("src_lake") is not None
        and src_id is not None
        and e.get("src_lake") != src_id
    ]
    if stale:
        raise ValueError(
            f"destination mirror journal for consumer {consumer!r} was fed "
            f"from a different source lake ({stale[-1]} != {src_id}) — "
            "refusing to interleave feeds; use a distinct consumer/replica "
            "per source"
        )
    # The journal, not dst's round count, is the delivery record: a
    # sharded replica can legitimately receive only EMPTY windows (no key
    # hashes to its shard), committing no dst round while the journal
    # advances — requiring committed rounds here would wedge it forever.
    if st.get("last_round") is not None and not journal0:
        raise ValueError(
            f"consumer {consumer!r} is anchored at {st['last_round']!r} "
            "on the source, but the destination lake has no mirror "
            "journal for it — this dst never received the bootstrap "
            "window. Use a new consumer name for a new replica, or "
            "consumer_reset() after destroying the old one."
        )

    applied = []
    repaired = None
    while True:
        try:
            win = src.consumer_poll(consumer, table=table)
        except KeyError:
            if on_rollback != "repair" or repaired is not None:
                raise
            repaired = _repair_replica(src, dst, consumer, table=table)
            continue
        if win is None:
            break
        epoch = epoch_base + src.lake.round_position(win["ack_round"]) + 1
        rid = f"r{epoch:06d}-{epoch:06d}"

        def journal(e=epoch, rnd=win["ack_round"]):
            ents = [
                x for x in _mirror_journal(dst, consumer) if x["epoch"] < e
            ]
            ent = {"epoch": e, "src_round": rnd, "base": epoch_base}
            sid = src.lake.manifest.get("lake_id")
            if sid is not None:  # read-only: never stamp a foreign lake
                ent["src_lake"] = sid
            ents.append(ent)
            _mirror_journal_write(dst, consumer, ents)

        if rid in dst.lake.committed_round_ids():
            # Same-epoch does NOT always mean same-window: a src rollback
            # truncates the ledger suffix and a recommit REUSES the ledger
            # position, so this committed dst epoch may hold rolled-back
            # rows from a different src round. The journal knows which src
            # round cut this epoch — a mismatch means stale data, which
            # must be repaired (or surfaced), never silently skip-and-ack.
            ent = next(
                (
                    e
                    for e in _mirror_journal(dst, consumer)
                    if e["epoch"] == epoch
                ),
                None,
            )
            if ent is not None and ent.get("src_round") != win["ack_round"]:
                if on_rollback == "repair" and repaired is None:
                    repaired = _repair_replica(src, dst, consumer, table=table)
                    continue
                raise ValueError(
                    f"replica epoch {epoch} was cut at src round "
                    f"{ent.get('src_round')!r} but the source's ledger now "
                    f"has {win['ack_round']!r} at that position — a src "
                    "rollback reused the position; rerun with "
                    "on_rollback='repair' to roll the replica back and "
                    "resync"
                )
            # true crash-between-commit-and-ack replay: already applied
            journal()
            src.consumer_ack(consumer, win["ack_round"], table=table)
            continue

        def to_events(t):
            import pyarrow as _pa

            # Feed rows are FULL row images, so non-deletes must apply as
            # "insert" (full-state replace — starts a new merge segment),
            # NOT "update": update's null-means-unchanged patch semantics
            # would resurrect stale replica values wherever the source's
            # current value is genuinely null.
            op = pc.if_else(
                pc.equal(t.column("change_op"), _pa.scalar("delete")),
                _pa.scalar("delete"),
                _pa.scalar("insert"),
            )
            t = t.drop_columns(["change_op"]).append_column("op", op)
            if shard is not None:
                i, n = shard
                keep = (
                    _P.hash_conv(t.column(key_col), 2) % np.uint64(n)
                ) == np.uint64(i)
                t = t.filter(pa.array(keep))
            if key_prefix is not None:
                col = pc.binary_join_element_wise(
                    _pa.scalar(key_prefix),
                    pc.cast(t.column(key_col), _pa.string()),
                    "",
                )
                t = t.set_column(
                    t.schema.get_field_index(key_col), key_col, col
                )
            return t

        res = dst.apply_dataset(
            win["dataset"].map_batches(to_events, batch_format="pyarrow"),
            epoch=epoch,
        )
        applied.append(res)
        journal()
        src.consumer_ack(consumer, win["ack_round"], table=table)
    out = {"windows": len(applied), "results": applied}
    if repaired is not None:
        out["repaired"] = repaired
    return out


# epoch namespace width per fan-in source: round ids from different
# sources can never collide below 10^6 rounds per source
_FANIN_EPOCH_SPAN = 1_000_000


def consolidate_lakes(sources: dict, dst, consumer: str = "fanin") -> dict:
    """Multi-source FAN-IN: mirror N independent source lakes into ONE
    destination table — the consolidated analytics lake over per-domain
    CDC feeds (the reference's one-deployment-per-chain model,
    ``indexer/controller/stream_controller.py``, folded into a single
    queryable store). Each source gets its own durable consumer, a key
    namespace ``{name}/{key}`` (disjoint key spaces ⇒ per-key LWW never
    compares cursors ACROSS sources, so unrelated upstream cursor clocks
    coexist safely), and an epoch namespace (``_FANIN_EPOCH_SPAN`` per
    source, sorted-name order) so replica round ids never collide.
    Exactly-once per leg exactly as :func:`replicate_lake`. Incremental:
    re-running consolidates only each source's new windows."""
    # Per-source epoch bases are PERSISTED in the destination: deriving
    # them from the current call's sorted position would shift every later
    # source's namespace when a source is added — colliding its round ids
    # with another source's already-committed rounds, which the epoch
    # fence would then silently skip-and-ack (data loss).
    import json as _json

    bases_path = os.path.join(dst.lake.root, f"_fanin_{consumer}_bases.json")
    bases: dict = {}
    if os.path.exists(bases_path):
        with open(bases_path) as fh:
            bases = _json.load(fh)
    changed = False
    for name in sorted(sources):
        if "/" in name:
            raise ValueError(f"source name {name!r} must not contain '/'")
        if name not in bases:
            nxt = max([0] + list(bases.values())) + _FANIN_EPOCH_SPAN
            bases[name] = nxt
            changed = True
    if changed:
        tmp = f"{bases_path}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            _json.dump(bases, fh)
        os.replace(tmp, bases_path)

    out = {}
    for name in sorted(sources):
        out[name] = replicate_lake(
            sources[name],
            dst,
            consumer=f"{consumer}-{name}",
            key_prefix=f"{name}/",
            epoch_base=bases[name],
        )
    return out
