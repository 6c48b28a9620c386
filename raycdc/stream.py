"""Stream controller: tail a change-log directory and apply new epochs as
they land — the analog of the reference's forever-loop
``StreamController.action`` (``indexer/controller/stream_controller.py:50-112``
in /root/reference): compute the watermark, apply the new range, commit the
cursor, sleep when idle.

Our watermark = the newest complete epoch on disk minus ``delay_epochs``
(the reference's ``target = chain_head - delay``,
``stream_controller.py:158-161``); the cursor checkpoint is the lake
manifest (``sync_recorder`` analog), so a restarted ``follow`` resumes
exactly where the last commit fenced.
"""

from __future__ import annotations

import time

from raycdc.engine import Engine, discover_epoch_files


def follow(
    engine: Engine,
    log_dir: str,
    epochs_per_round: int = 1,
    delay_epochs: int = 0,
    period_seconds: float = 0.5,
    max_idle_polls: int = 3,
    max_rounds: int | None = None,
    adaptive: bool = False,
    mirror_to: Engine | None = None,
    mirror_consumer: str = "stream-mirror",
) -> list[dict]:
    """Poll ``log_dir`` for new epoch files and apply them in commit rounds.

    Returns after ``max_idle_polls`` consecutive polls with no new work
    (a bounded stand-in for the reference's run-forever loop so tests and
    batch callers terminate), or after ``max_rounds`` applied rounds.

    ``adaptive=True`` puts the round width under the
    :class:`raycdc.adaptive.AdaptiveBatcher` policy (the reference
    executor's halve-on-retriable / cool-down-regrow): a round that dies
    with a timeout-shaped error halves the next attempt's
    ``epochs_per_round`` instead of retrying the same too-big unit of
    work forever; the manifest fence makes the retry exact — committed
    rounds skip, the failed round's epochs re-apply idempotently in the
    narrower rounds.

    ``mirror_to`` keeps a REPLICA lake continuously synced: after every
    applied batch (and once more before returning) the changefeed
    consumer protocol ships the new windows into the replica
    (:func:`raycdc.exporters.replicate_lake` with
    ``on_rollback="repair"`` — a stream reorg that erases the consumer
    anchor auto-repairs the replica and resumes). This closes the full
    production loop: upstream log → lake → downstream replica, all
    exactly-once.
    """
    def mirror_tick():
        if mirror_to is not None:
            from raycdc.exporters import replicate_lake

            replicate_lake(
                engine, mirror_to, consumer=mirror_consumer,
                on_rollback="repair",
            )

    batcher = None
    if adaptive:
        from raycdc.adaptive import AdaptiveBatcher

        batcher = AdaptiveBatcher(size=epochs_per_round)
    results: list = []
    idle = 0
    while idle < max_idle_polls:
        files = discover_epoch_files(log_dir)
        head = len(files) - delay_epochs  # watermark: confirmed epochs only
        ready = files[:head] if head > 0 else []
        # pending work = any ready epoch the manifest doesn't account for:
        # committed with a round, applied as a rollback, or orphaned by one.
        # (Round ids can span several epochs and rollback epochs never
        # commit a round id, so matching per-epoch round ids would loop
        # forever — the manifest's epoch ledger is the real fence.)
        done = engine.lake.processed_epochs()
        new = [f for f in ready if f["epoch"] not in done]
        if not new:
            idle += 1
            time.sleep(period_seconds)
            continue
        # apply_log handles fencing/rollbacks; restrict to the watermark by
        # applying only the ready prefix (epoch files are append-only)
        if batcher is not None:
            # rounds that COMMIT inside a failing apply call must still be
            # reported (the retry sees them as skipped and they'd vanish
            # from results/max_rounds accounting) — recover them from the
            # ledger, which records every committed round with its metrics
            pre_ids = engine.lake.committed_round_ids()
            try:
                batch = engine.apply_log_files(
                    ready, epochs_per_round=batcher.size
                )
            except BaseException as exc:  # noqa: BLE001 - policy classifies
                if not batcher.failure(exc):
                    raise
                for r in engine.lake.manifest["committed_rounds"]:
                    if r["round_id"] not in pre_ids:
                        results.append(
                            {
                                "round_id": r["round_id"],
                                "skipped": False,
                                "n_events": r.get("metrics", {}).get(
                                    "n_events", 0
                                ),
                            }
                        )
                continue  # retry the poll with the halved round width
            batcher.success()
        else:
            batch = engine.apply_log_files(ready, epochs_per_round=epochs_per_round)
        applied = [r for r in batch if not r.get("skipped")]
        results.extend(applied)
        if not applied:
            # belt-and-suspenders: everything fenced → count as an idle poll
            # so a ledger gap can never spin the loop
            idle += 1
            time.sleep(period_seconds)
            continue
        mirror_tick()
        idle = 0
        if max_rounds is not None and len(results) >= max_rounds:
            break
    mirror_tick()
    return results
