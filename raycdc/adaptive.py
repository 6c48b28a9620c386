"""Adaptive batch sizing: halve on retriable failure, regrow after a
cool-down of consecutive successes.

The analog of the reference's ``BatchWorkExecutor`` resize policy
(``indexer/executors/batch_work_executor.py:65-111`` in /root/reference:
on a retriable RPC error the work-batch size halves and the item retries;
after a stretch of clean batches the size doubles back toward the cap).
Ray already covers the *retry* half of that design (task retries + block
splitting), but nothing in Ray resizes the UNIT OF WORK itself — on a
throttled host or flaky source, a too-large commit round keeps timing out
no matter how often it retries. This controller owns that knob.

Used by :func:`raycdc.stream.follow` (``adaptive=True``) to size
``epochs_per_round``: a round that dies with a retriable error (e.g. the
actor-barrier ``GetTimeoutError`` seen on 4-5×-throttled hosts) halves
the next attempt's round width; the manifest fence makes the retry exact
(committed rounds skip, the failed round's epochs re-apply idempotently).
The policy object is engine-agnostic — any loop that picks a batch size
per attempt can drive it.
"""

from __future__ import annotations

import time


def _default_retriable() -> tuple:
    """Timeout-shaped errors: the class a smaller batch can actually fix.
    Ray's GetTimeoutError is included only when ray is importable (the
    policy itself has no ray dependency)."""
    types: list = [TimeoutError]
    try:
        import ray.exceptions as rex

        types.append(rex.GetTimeoutError)
    except Exception:  # pragma: no cover - ray always present in this repo
        pass
    return tuple(types)


class AdaptiveBatcher:
    """Multiplicative-decrease / cool-down-increase batch-size policy.

    * ``failure(exc)``: if ``exc`` is retriable, halve ``size`` (never
      below ``floor``), reset the success streak, and return True (caller
      retries); a non-retriable exc returns False (caller re-raises).
    * ``success()``: after ``cooldown`` consecutive successes, double
      ``size`` (never above ``cap``) and restart the streak — growth is
      deliberately slower than shrinkage (AIMD-flavored: one bad round
      halves, ``cooldown`` good rounds re-double).
    * ``give_up`` caps consecutive retriable failures AT THE FLOOR — a
      floor-sized batch that still times out is not a sizing problem, and
      an unbounded retry loop would mask it.
    """

    def __init__(
        self,
        size: int,
        floor: int = 1,
        cap: int | None = None,
        cooldown: int = 3,
        give_up: int = 5,
        retriable: tuple | None = None,
    ):
        if size < 1 or floor < 1 or size < floor:
            raise ValueError("need size >= floor >= 1")
        if cap is not None and cap < size:
            raise ValueError("need cap >= size (cap is the hard ceiling)")
        self.size = size
        self.floor = floor
        self.cap = cap if cap is not None else size
        self.cooldown = max(1, cooldown)
        self.give_up = max(1, give_up)
        self.retriable = retriable if retriable is not None else _default_retriable()
        self._streak = 0
        self._floor_failures = 0
        self.history: list[tuple[str, int]] = []  # (event, size-after) audit

    def failure(self, exc: BaseException) -> bool:
        if not isinstance(exc, self.retriable):
            return False
        self._streak = 0
        if self.size > self.floor:
            self.size = max(self.floor, self.size // 2)
            self._floor_failures = 0
            self.history.append(("halve", self.size))
        else:
            self._floor_failures += 1
            if self._floor_failures >= self.give_up:
                return False  # floor-sized batches keep dying: surface it
            # width did NOT change: record a floor-stall retry, not a halve
            self.history.append(("floor_retry", self.size))
        return True

    def success(self) -> None:
        self._floor_failures = 0
        self._streak += 1
        if self._streak >= self.cooldown and self.size < self.cap:
            self.size = min(self.cap, self.size * 2)
            self._streak = 0
            self.history.append(("regrow", self.size))

    def run(self, fn, *args, **kwargs):
        """Drive ``fn(batch_size=self.size, ...)`` until it succeeds or the
        policy gives up; applies the resize bookkeeping around each attempt.
        ``fn`` must be idempotent w.r.t. partial progress (the lake's
        manifest fence provides exactly that for commit rounds)."""
        while True:
            try:
                out = fn(self.size, *args, **kwargs)
            except BaseException as exc:  # noqa: BLE001 - classified below
                if not self.failure(exc):
                    raise
                time.sleep(0)  # yield; real backoff is the smaller batch
                continue
            self.success()
            return out
