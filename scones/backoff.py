"""Exponential backoff + the batch supervisor (daemon) loop.

The reference runs as a daemon that retries failed work forever with a
doubling, capped backoff and keeps polling for new input when idle
(supervisor.go:94-162 reader loop, supervisor.go:166-231 send loop,
exponential_backoff.go:7-38).  Here the unit of retry is a whole
snapshot run: a snapshot that fails anywhere before the lineage commit
left no committed state (the write is an idempotent overwrite of the
same ``snapshot_id=N`` directory and admission replans the same input
files), so "retry forever with backoff" composes with the existing
effectively-once machinery instead of needing a chunk requeue channel.

Doubling semantics are pinned by the reference's own golden test
(exponential_backoff_test.go:8-53: min=1 max=10 → 1, 2, 4, 8, 10, 10;
reset → 1) in tests/test_backoff_daemon.py.
"""

from __future__ import annotations

import threading
import time
from typing import Callable

# the reference's retry constants (supervisor.go:101, 171)
RETRY_MIN_SEC = 0.050
RETRY_MAX_SEC = 5.0


class ExponentialBackoff:
    """Doubling backoff with a cap (exponential_backoff.go:7-38).

    ``next()`` returns the minimum on first use, then doubles up to the
    maximum; ``reset()`` re-arms it.  Mirrors the reference's Current /
    Next / Reset surface so its golden test replays verbatim.
    """

    def __init__(self, minimum: float, maximum: float) -> None:
        self.minimum = float(minimum)
        self.maximum = float(maximum)
        self._current = 0.0

    def current(self) -> float:
        if self._current == 0.0:
            self._current = self.minimum
        return self._current

    def next(self) -> float:
        if self._current == 0.0:
            self._current = self.minimum
        else:
            self._current = min(self._current * 2.0, self.maximum)
        return self._current

    def reset(self) -> None:
        self._current = 0.0


def run_daemon(
    spark,
    cfg,
    run_fn: Callable | None = None,
    poll_min_sec: float = 1.0,
    poll_max_sec: float = 10.0,
    retry_min_sec: float = RETRY_MIN_SEC,
    retry_max_sec: float = RETRY_MAX_SEC,
    max_snapshots: int | None = None,
    max_iterations: int | None = None,
    sleep_fn: Callable[[float], None] = time.sleep,
    stop_event: threading.Event | None = None,
    on_event: Callable[[dict], None] | None = None,
) -> list[dict]:
    """Supervise snapshot runs until stopped (the reference's daemon loop).

    Per iteration:
      * run one snapshot (``run_fn(spark, cfg)``, default
        :func:`scones.pipeline.run_snapshot`);
      * failure → sleep ``retry`` backoff and try again, forever
        (supervisor.go:191-209 "failed to send chunk / retrying" —
        admission replans the exact same uncommitted inputs);
      * success → reset both backoffs (supervisor.go:211 backoff.Reset);
      * nothing new → sleep ``poll`` backoff (supervisor.go:155-161
        "no lines available to send / backing off").

    Drain is graceful: ``stop_event`` is only checked between snapshot
    attempts, so an in-flight snapshot always finishes (and commits or
    leaves no state) before exit — the SIGTERM contract the streaming
    daemon already has (scones/streaming.py).

    ``max_snapshots`` / ``max_iterations`` bound the loop for tests and
    one-shot-ish invocations; both default to unbounded like the
    reference.  Returns the summaries of committed snapshots.
    """
    if run_fn is None:
        from .pipeline import run_snapshot

        run_fn = run_snapshot

    retry = ExponentialBackoff(retry_min_sec, retry_max_sec)
    poll = ExponentialBackoff(poll_min_sec, poll_max_sec)
    done: list[dict] = []
    iterations = 0
    while True:
        if stop_event is not None and stop_event.is_set():
            break
        if max_iterations is not None and iterations >= max_iterations:
            break
        iterations += 1
        try:
            summary = run_fn(spark, cfg)
        except Exception as exc:  # retry forever, like the reference
            delay = retry.next()
            if on_event is not None:
                on_event({"event": "retry", "delay_sec": delay, "error": repr(exc)})
            sleep_fn(delay)
            continue
        if summary.get("snapshot_id") is None:
            delay = poll.next()
            if on_event is not None:
                on_event({"event": "idle", "delay_sec": delay})
            sleep_fn(delay)
            continue
        retry.reset()
        poll.reset()
        done.append(summary)
        if on_event is not None:
            on_event({"event": "snapshot", "summary": summary})
        if max_snapshots is not None and len(done) >= max_snapshots:
            break
    return done
