"""Scheduled dimension reload (A15, loader_schedule.rb + the Rufus cron
wiring in jdbc_static.rb:189-204).

The reference runs one worker thread on a Rufus cron line with second
resolution (scan frequency 0.3 s for seconds-cron, else 2.5 s). Here the
schedule is either a plain interval (``<n>s|m|h``, a convenience the
reference lacks) or any 5/6-field cron line parsed by
:mod:`logstash_filter_jdbc_static_spark.plans.cron` — ranges, lists,
steps, names, optional leading seconds field and trailing timezone —
with next-fire-time computation replacing Rufus' polling matcher. The
semantics that matter (reload counter increments, lookups keep serving a
consistent snapshot during reload, new snapshot visible after swap) live
in refresh.py and are what the reload spec asserts
(spec/filters/jdbc_static_spec.rb:141-158).
"""

from __future__ import annotations

import logging
import re
import threading
import time
from datetime import datetime, timezone

logger = logging.getLogger("logstash_filter_jdbc_static_spark")

from logstash_filter_jdbc_static_spark.plans.cron import CronLine
from logstash_filter_jdbc_static_spark.plans.refresh import DimensionStore

_EVERY_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(s|sec|m|min|h)\s*$", re.IGNORECASE)


def _exc_text() -> str:
    import traceback

    return traceback.format_exc(limit=1).strip().splitlines()[-1]


def parse_schedule(expr: str) -> float | CronLine:
    """``<n>s|m|h`` -> interval seconds; anything else must be a valid
    5/6-field cron line -> CronLine (loader_schedule.rb:24-46).

    Satisfiability is proven at parse time: a line that parses but can
    never fire ("0 0 31 2 *", Feb 31) raises HERE, in validation, not
    later inside the reload thread where the failure would silently
    stop all refreshes."""
    m = _EVERY_RE.match(expr)
    if m:
        mult = {"s": 1, "sec": 1, "m": 60, "min": 60, "h": 3600}[m.group(2).lower()]
        return float(m.group(1)) * mult
    cl = CronLine.parse(expr.strip())
    try:
        cl.next_fire(_now(cl))
    except ValueError as e:
        raise ValueError(f"The loader_schedule option is invalid: {e}") from e
    return cl


def _now(cl: CronLine) -> datetime:
    """Rufus evaluates timezone-less cron lines in the scheduler's LOCAL
    zone; only a line with an explicit zone token is evaluated there.
    datetime.now() (naive local) matches CronLine's naive arithmetic;
    a tz-carrying line gets an aware instant it converts itself."""
    if cl.tz is not None:
        return datetime.now(timezone.utc)
    return datetime.now()


class RepeatingLoadRunner:
    """== RepeatingLoadRunner + scheduler thread: initial_load now, then
    repeated_load per schedule tick until stop().

    For cron schedules the thread sleeps until the computed next fire
    time, waking at most every ``frequency_hint()`` seconds so stop()
    stays responsive (the same bound Rufus' scan loop gives the
    reference, loader_schedule.rb:30-37)."""

    def __init__(self, store: DimensionStore, schedule: str):
        self.store = store
        self.schedule = parse_schedule(schedule)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # Floor between ticks: a wait that computes as <= 0 (clock skew, a
    # DST edge the cron normalization missed) must NEVER busy-loop
    # refresh() against the remote DB.
    MIN_WAIT_S = 0.05

    def _next_wait(self) -> float:
        if isinstance(self.schedule, CronLine):
            now = _now(self.schedule)
            wait = (self.schedule.next_fire(now) - now).total_seconds()
            return max(wait, self.MIN_WAIT_S)
        return max(float(self.schedule), self.MIN_WAIT_S)

    def start(self) -> None:
        self.store.initial_load()

        def loop() -> None:
            while True:
                try:
                    wait = self._next_wait()
                except Exception:  # pragma: no cover - guarded at parse
                    # Surface a scheduler failure instead of dying with a
                    # stderr-only traceback while the pipeline silently
                    # serves an ever-staler snapshot.
                    logger.exception("reload scheduler died computing next fire")
                    self.store.last_errors["__scheduler__"] = (
                        "scheduler stopped: " + _exc_text()
                    )
                    return
                # Sleep in small slices so stop() interrupts promptly.
                # The deadline is recomputed from the monotonic clock each
                # wake-up — decrementing by the nominal slice would
                # accumulate timer error over a long wait (a nightly fire
                # waits through ~34k slices).
                slice_s = (
                    self.schedule.frequency_hint()
                    if isinstance(self.schedule, CronLine)
                    else wait
                )
                deadline = time.monotonic() + wait
                while (remaining := deadline - time.monotonic()) > 0:
                    if self._stop.wait(min(remaining, slice_s)):
                        return
                try:
                    self.store.refresh()
                except Exception as e:
                    # refresh() swallows per-loader failures itself; an
                    # unexpected error here must not kill the scheduler
                    # — record it and hope the next tick works
                    # (read_write_database.rb:88-90's contract).
                    logger.exception("scheduled reload failed; keeping snapshot")
                    self.store.last_errors["__scheduler__"] = str(e)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)

    @property
    def reload_count(self) -> int:
        return self.store.reload_count
