"""CLI entry points: ``python -m raycdc <command>``.

Mirrors the reference's ``hemera.py`` command surface
(``cli/stream.py:160-229`` — source/output URIs, batch sizing, start/end
position, sync-recorder resume; ``cli/reorg.py:86-93`` — bounded repair)
on the Ray engine:

  stream    tail a change-log directory and apply new epochs as they land
  replay    apply a complete change-log directory once (backfill)
  export    write a lake table as ranged CSV/JSON/Parquet files
  rollback  restore the lake to a committed cursor boundary
  show      print lake state summary (manifest, rounds, metrics)

The CLI owns the Ray session (guarded init, local by default); the library
never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus is not None:
            kw["num_cpus"] = num_cpus
        ray.init(address="local", **kw)


def _engine(args):
    from raycdc.engine import Engine

    tables = None
    if getattr(args, "with_conv_latest", False):
        from raycdc import tables as T

        tables = [T.PRIMARY, T.conv_latest()]
    return Engine(
        args.lake,
        num_partitions=args.partitions,
        undo_window=args.undo_window,
        salted=getattr(args, "salted", False),
        tables=tables,
    )


def _load_audit(spec: str | None):
    """Resolve a ``module:function`` dotted path to the WAP audit callable
    (the CLI face of ``Engine.apply_log(audit=...)``)."""
    if not spec:
        return None
    import importlib

    mod, _, fn = spec.partition(":")
    if not fn:
        raise SystemExit(f"--audit wants module:function, got {spec!r}")
    return getattr(importlib.import_module(mod), fn)


def cmd_replay(args) -> int:
    _init_ray(args.num_cpus)
    eng = _engine(args)
    results = eng.apply_log(
        args.log_dir,
        epochs_per_round=args.epochs_per_round,
        audit=_load_audit(getattr(args, "audit", None)),
        adaptive=getattr(args, "adaptive", False),
    )
    for r in results:
        print(json.dumps({k: v for k, v in r.items() if k != "touched_parts"},
                         default=str))
    applied = [r for r in results if not r.get("skipped")]
    print(json.dumps({
        "rounds_applied": len(applied),
        "events": sum(r.get("n_events", 0) for r in applied),
        "last_cursor": eng.lake.last_cursor(),
    }))
    eng.close()
    return 0


def cmd_stream(args) -> int:
    from raycdc.stream import follow

    _init_ray(args.num_cpus)
    # try/finally: follow() raising must still release both engines'
    # CPU-pinned merger pools (concurrent open engines starve scan tasks)
    eng = _engine(args)
    replica = None
    try:
        if getattr(args, "mirror", None):
            from raycdc.engine import Engine

            replica = Engine(args.mirror, num_partitions=args.mirror_partitions)
        results = follow(
            eng,
            args.log_dir,
            epochs_per_round=args.epochs_per_round,
            delay_epochs=args.delay,
            period_seconds=args.period,
            max_idle_polls=args.max_idle_polls,
            max_rounds=args.max_rounds,
            mirror_to=replica,
        )
        print(json.dumps({
            "rounds_applied": len(results),
            "last_cursor": eng.lake.last_cursor(),
        }))
    finally:
        # nested: a replica.close() failure must not skip eng.close()
        try:
            if replica is not None:
                replica.close()
        finally:
            eng.close()
    return 0


def cmd_export(args) -> int:
    import sys

    from raycdc.exporters import export_multi, export_ranged

    if not getattr(args, "output", None) and not args.out_dir:
        print("export: provide OUT_DIR or --output", file=sys.stderr)
        return 2
    _init_ray(args.num_cpus)
    eng = _engine(args)
    ds = eng.read_lake(
        include_system=True, table=args.table,
        as_of_cursor=getattr(args, "as_of_cursor", None),
    )
    if getattr(args, "output", None):
        # multi-sink URI list (reference --output factory,
        # indexer/exporters/item_exporter.py:9-79), e.g.
        # "console,csvfile:///tmp/c,jsonfile:///tmp/j"
        results = export_multi(
            ds,
            args.output,
            table=args.table or "transcripts",
            rows_per_file=args.rows_per_file,
        )
        print(json.dumps({"sinks": len(results), "output": args.output}))
    else:
        paths = export_ranged(
            ds,
            args.out_dir,
            table=args.table or "transcripts",
            fmt=args.format,
            rows_per_file=args.rows_per_file,
            resume=args.resume,
        )
        print(json.dumps({"files": len(paths), "out_dir": args.out_dir}))
    eng.close()
    return 0


def cmd_aggregate(args) -> int:
    """Materialize the derived daily + cumulative aggregate tables from an
    existing lake (the reference's ``aggregates`` CLI / aggr_job_scheduler,
    ``indexer/aggr_jobs/aggr_job_scheduler.py:10-26``)."""
    import os

    from raycdc.queries.aggregates import (
        conv_cumulative_from_daily,
        conv_daily_from_engine,
    )

    _init_ray(args.num_cpus)
    eng = _engine(args)
    daily = conv_daily_from_engine(eng)
    daily.write_parquet(os.path.join(args.out_dir, "conv_daily_stats"))
    # re-derive for the second consumer: Datasets are lazy and single-use
    cum = conv_cumulative_from_daily(conv_daily_from_engine(eng))
    cum.write_parquet(os.path.join(args.out_dir, "conv_cumulative_stats"))
    print(json.dumps({
        "out_dir": args.out_dir,
        "tables": ["conv_daily_stats", "conv_cumulative_stats"],
    }))
    eng.close()
    return 0


def cmd_changes(args) -> int:
    """Export (or print) the change data feed since a committed cursor —
    the incremental-sync surface downstream consumers poll instead of
    re-reading the whole lake."""
    import os

    import pyarrow.parquet as pq

    _init_ray(args.num_cpus)
    eng = _engine(args)
    ds = eng.read_changes(since_cursor=args.since_cursor, table=args.table)
    if args.out_dir:
        ds.write_parquet(args.out_dir)
        rows = sum(
            pq.ParquetFile(os.path.join(args.out_dir, f)).metadata.num_rows
            for f in os.listdir(args.out_dir)
            if f.endswith(".parquet")
        )
        print(json.dumps({"out_dir": args.out_dir, "rows": rows}))
    else:
        for row in ds.limit(args.limit).take_all():
            print(json.dumps(row, default=str))
    eng.close()
    return 0


def cmd_export_changes(args) -> int:
    """Exactly-once incremental export: ship the changefeed window since
    the previous invocation's anchor (state file in OUT_DIR), advance the
    anchor atomically. Run it on a schedule to keep a downstream copy in
    sync without ever re-reading the lake."""
    from raycdc.exporters import export_incremental

    _init_ray(args.num_cpus)
    eng = _engine(args)
    res = export_incremental(
        eng, args.out_dir, table=args.table, fmt=args.format,
        rows_per_file=args.rows_per_file,
    )
    print(json.dumps({
        "out_dir": args.out_dir,
        "files": len(res["exported_files"]),
        "window": res["window"],
        "anchor": res["anchor"],
    }))
    eng.close()
    return 0


def cmd_consume(args) -> int:
    """Poll the named consumer group's next changefeed window, optionally
    sink it via an exporter URI, and (``--ack``) durably advance the
    offset only after the sink returned — crash anywhere re-delivers the
    same idempotent window next run (at-least-once delivery, exactly-once
    effect). Independent consumers each track their own offset."""
    _init_ray(args.num_cpus)
    eng = _engine(args)
    win = eng.consumer_poll(args.name, table=args.table)
    if win is None:
        print(json.dumps({"name": args.name, "caught_up": True,
                          **{k: v for k, v in eng.consumer_status(args.name).items()
                             if k != "name"}}))
        eng.close()
        return 0
    if args.output:
        from raycdc.exporters import export_multi

        export_multi(win["dataset"], args.output, table=f"feed-{args.name}")
        rows = None
    else:
        rows = win["dataset"].count()
    out = {"name": args.name, "since": win["since_round"],
           "ack_round": win["ack_round"]}
    if rows is not None:
        out["rows"] = rows
    if args.ack:
        eng.consumer_ack(args.name, win["ack_round"], table=args.table)
        out["acked"] = True
    print(json.dumps(out))
    eng.close()
    return 0


def cmd_expire(args) -> int:
    """Retention as change events: deletions ride the normal round path
    (changefeed-visible, LWW-guarded, rollback-able)."""
    _init_ray(args.num_cpus)
    eng = _engine(args)
    res = eng.expire(args.before_ts)
    print(json.dumps(res, default=str))
    eng.close()
    return 0


def cmd_lookup(args) -> int:
    """Point lookup of one entity key — driver-side only (the lake's hash
    layout is the index; no Ray session needed)."""
    eng = _engine(args)
    df = eng.read_key(
        args.key, table=args.table, include_system=True,
        as_of_cursor=args.as_of_cursor,
    )
    for row in df.to_dict("records"):
        print(json.dumps(row, default=str))
    eng.close()
    return 0


def cmd_rollback(args) -> int:
    # pure manifest surgery — no Ray needed (reorg_controller analog)
    from raycdc.lake import Lake

    lake = Lake(args.lake)
    before = lake.last_cursor()
    lake.rollback(args.to_cursor)
    print(json.dumps({"rolled_back_from": before, "now_at": lake.last_cursor()}))
    return 0


def cmd_mirror(args) -> int:
    """Replicate a lake into a second lake via the changefeed consumer
    protocol (exactly-once effect; see exporters.replicate_lake)."""
    _init_ray(args.num_cpus)
    from raycdc.engine import Engine
    from raycdc.exporters import replicate_lake

    shard = None
    if args.shard:
        i, n = args.shard.split("/")
        shard = (int(i), int(n))
    with _engine(args) as src, Engine(
        args.dest, num_partitions=args.dest_partitions
    ) as dst:
        out = replicate_lake(src, dst, consumer=args.name, shard=shard)
        print(json.dumps({
            "windows": out["windows"],
            "dst_last_cursor": dst.lake.last_cursor(),
            "dst_rounds": len(dst.lake.manifest["committed_rounds"]),
        }))
    return 0


def cmd_branch(args) -> int:
    # pure manifest surgery + hardlinks — no Ray needed
    from raycdc.lake import Lake

    lake = Lake(args.lake)
    out = lake.branch(args.dest, round_id=args.round, tag=args.tag)
    print(json.dumps(out))
    return 0


def cmd_merge_branch(args) -> int:
    _init_ray(args.num_cpus)
    from raycdc.engine import Engine

    with _engine(args) as src, Engine(args.branch) as br:
        out = src.merge_branch(br)
        print(json.dumps({k: v for k, v in out.items() if k != "touched_parts"},
                         default=str))
    return 0


def cmd_tag(args) -> int:
    # pure manifest surgery — no Ray needed (named snapshot refs)
    from raycdc.lake import Lake

    lake = Lake(args.lake)
    if args.list or args.name is None:
        print(json.dumps(lake.tags))
        return 0
    if args.drop:
        lake.drop_tag(args.name)
        print(json.dumps({"dropped": args.name}))
        return 0
    rid = lake.tag(args.name, cursor=args.cursor)
    print(json.dumps({"tag": args.name, "round_id": rid}))
    return 0


def cmd_compact(args) -> int:
    """Force-fold all outstanding delta chains into fresh bases (the
    maintenance OPTIMIZE), then vacuum crash orphans."""
    _init_ray(args.num_cpus)
    eng = _engine(args)
    out = eng.compact()
    out["vacuumed"] = len(eng.lake.vacuum())
    print(json.dumps(out))
    eng.close()
    return 0


def cmd_reshard(args) -> int:
    """Online reshard the lake to a new partition count (atomic barrier
    commit; rollback/time-travel cannot cross it)."""
    _init_ray(args.num_cpus)
    eng = _engine(args)
    out = eng.reshard(args.to_partitions)
    print(json.dumps(out))
    eng.close()
    return 0


def cmd_vacuum(args) -> int:
    # driver-side file walk — no Ray needed
    from raycdc.lake import Lake

    lake = Lake(args.lake)
    deleted = lake.vacuum()
    print(json.dumps({"vacuumed": len(deleted)}))
    return 0


def cmd_show(args) -> int:
    from raycdc.lake import Lake

    import glob
    import os

    lake = Lake(args.lake)
    rounds = lake.manifest["committed_rounds"]
    consumers = {}
    for p in glob.glob(os.path.join(args.lake, "consumers", "*.json")):
        with open(p) as f:
            st = json.load(f)
        consumers[os.path.basename(p)[:-5]] = st.get("last_round")
    out = {
        "num_partitions": lake.num_partitions,
        "committed_rounds": len(rounds),
        "last_cursor": lake.last_cursor(),
        "applied_rollbacks": len(lake.manifest.get("applied_rollbacks", [])),
        "live_fragments": len(lake.live_fragment_paths()),
        "schema": [f.name for f in lake.schema] if lake.schema else None,
        "tags": lake.tags,
        "consumers": consumers,
        "recent_rounds": [
            {"round_id": r["round_id"], "cursor_hi": r["cursor_hi"],
             "events": r["metrics"].get("n_events")}
            for r in rounds[-5:]
        ],
    }
    # branch lineage, when this lake was created by Lake.branch
    for k in ("lake_id", "branched_from", "branch_base"):
        if lake.manifest.get(k):
            out[k] = lake.manifest[k]
    print(json.dumps(out))
    return 0


def _common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--lake", required=True, help="lake directory")
    p.add_argument("--partitions", type=int, default=64)
    p.add_argument("--undo-window", type=int, default=8)
    p.add_argument("--num-cpus", type=int, default=None)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="raycdc")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("replay", help="apply a complete change log (backfill)")
    _common(p)
    p.add_argument("log_dir")
    p.add_argument("--epochs-per-round", type=int, default=1)
    p.add_argument("--salted", action="store_true", help="skew pre-fold path")
    p.add_argument("--with-conv-latest", action="store_true",
                   help="also maintain the derived conv_latest table")
    p.add_argument("--audit", default=None, metavar="MODULE:FUNCTION",
                   help="write-audit-publish gate run before each commit")
    p.add_argument("--adaptive", action="store_true",
                   help="halve round size on retriable failure, regrow "
                        "after a success streak")
    p.set_defaults(fn=cmd_replay)

    p = sub.add_parser("stream", help="tail a change-log dir (follow loop)")
    _common(p)
    p.add_argument("log_dir")
    p.add_argument("--epochs-per-round", type=int, default=1)
    p.add_argument("--delay", type=int, default=0,
                   help="confirmation delay in epochs (chain-head - delay)")
    p.add_argument("--period", type=float, default=0.5, help="poll seconds")
    p.add_argument("--max-idle-polls", type=int, default=3)
    p.add_argument("--max-rounds", type=int, default=None)
    p.add_argument("--with-conv-latest", action="store_true")
    p.add_argument("--mirror", default=None,
                   help="replica lake kept synced per applied batch")
    p.add_argument("--mirror-partitions", type=int, default=16)
    p.set_defaults(fn=cmd_stream)

    p = sub.add_parser("export", help="ranged file export of a lake table")
    _common(p)
    p.add_argument("out_dir", nargs="?", default=None)
    p.add_argument("--format", choices=["csv", "json", "parquet"], default="csv")
    p.add_argument("--rows-per-file", type=int, default=100_000)
    p.add_argument("--table", default=None, help="logical table (default primary)")
    p.add_argument(
        "--output", default=None,
        help="comma-separated multi-sink URI list "
        "(console | void | csvfile://DIR | jsonfile://DIR | "
        "parquetfile://DIR | lake://DIR); overrides out_dir/--format",
    )
    p.add_argument("--as-of-cursor", type=int, default=None,
                   help="export a time-travel snapshot at this committed "
                   "round boundary instead of the live state")
    p.add_argument("--resume", action="store_true",
                   help="skip windows whose output file already landed")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("changes", help="change data feed since a cursor")
    _common(p)
    p.add_argument("--since-cursor", type=int, required=True,
                   help="committed round boundary the feed starts after")
    p.add_argument("--table", default=None)
    p.add_argument("--out-dir", default=None,
                   help="write the feed as parquet (default: print rows)")
    p.add_argument("--limit", type=int, default=20,
                   help="max rows to print without --out-dir")
    p.set_defaults(fn=cmd_changes)

    p = sub.add_parser(
        "export-changes",
        help="exactly-once incremental export (anchor-fenced changefeed windows)",
    )
    _common(p)
    p.add_argument("out_dir")
    p.add_argument("--table", default=None)
    p.add_argument("--format", default="parquet",
                   choices=["csv", "json", "parquet"])
    p.add_argument("--rows-per-file", type=int, default=100_000)
    p.set_defaults(fn=cmd_export_changes)

    p = sub.add_parser(
        "consume",
        help="poll a named consumer group's next changefeed window",
    )
    _common(p)
    p.add_argument("--name", required=True, help="consumer group name")
    p.add_argument("--table", default=None)
    p.add_argument("--output", default=None,
                   help="exporter URI(s) to sink the window (default: count)")
    p.add_argument("--ack", action="store_true",
                   help="advance the durable offset after the sink returns")
    p.set_defaults(fn=cmd_consume)

    p = sub.add_parser("lookup", help="point lookup of one entity key")
    _common(p)
    p.add_argument("key")
    p.add_argument("--table", default=None)
    p.add_argument("--as-of-cursor", type=int, default=None)
    p.set_defaults(fn=cmd_lookup)

    p = sub.add_parser("aggregate", help="materialize derived aggregate tables")
    _common(p)
    p.add_argument("out_dir")
    p.set_defaults(fn=cmd_aggregate)

    p = sub.add_parser("mirror", help="replicate this lake into another lake")
    _common(p)
    p.add_argument("--dest", required=True, help="destination lake directory")
    p.add_argument("--dest-partitions", type=int, default=16)
    p.add_argument("--name", default="mirror", help="consumer-group name")
    p.add_argument("--shard", help="I/N key-hash shard publication")
    p.set_defaults(fn=cmd_mirror)

    p = sub.add_parser(
        "branch", help="zero-copy writable branch at a round/tag"
    )
    p.add_argument("--lake", required=True, help="source lake directory")
    p.add_argument("--dest", required=True, help="branch destination")
    p.add_argument("--round", help="branch point round id (default: head)")
    p.add_argument("--tag", help="branch at a named snapshot tag")
    p.set_defaults(fn=cmd_branch)

    p = sub.add_parser(
        "merge-branch", help="promote a branch's net delta back into its parent"
    )
    _common(p)
    p.add_argument("--branch", required=True, help="branch lake directory")
    p.set_defaults(fn=cmd_merge_branch)

    p = sub.add_parser("tag", help="manage named snapshot tags")
    p.add_argument("--lake", required=True, help="lake directory")
    p.add_argument("name", nargs="?", help="tag name (omit with --list)")
    p.add_argument("--cursor", type=int, default=None,
                   help="pin at this committed cursor boundary (default: head)")
    p.add_argument("--drop", action="store_true", help="remove the tag")
    p.add_argument("--list", action="store_true", help="print all tags")
    p.set_defaults(fn=cmd_tag)

    p = sub.add_parser("compact", help="fold all delta chains into bases")
    _common(p)
    p.add_argument("--with-conv-latest", action="store_true")
    p.set_defaults(fn=cmd_compact)

    p = sub.add_parser("reshard", help="online reshard to a new partition count")
    _common(p)
    p.add_argument("--to-partitions", type=int, required=True)
    p.set_defaults(fn=cmd_reshard)

    p = sub.add_parser(
        "expire", help="TTL retention: tombstone rows older than a timestamp"
    )
    _common(p)
    p.add_argument("--before-ts", required=True,
                   help="ISO timestamp; live rows with ts earlier are deleted")
    p.set_defaults(fn=cmd_expire)

    p = sub.add_parser("vacuum", help="delete unreferenced fragment files")
    p.add_argument("--lake", required=True)
    p.set_defaults(fn=cmd_vacuum)

    p = sub.add_parser("rollback", help="restore lake to a cursor boundary")
    p.add_argument("--lake", required=True)
    p.add_argument("to_cursor", type=int)
    p.set_defaults(fn=cmd_rollback)

    p = sub.add_parser("show", help="lake state summary")
    p.add_argument("--lake", required=True)
    p.set_defaults(fn=cmd_show)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
