"""Scheduled dimension reload (A15, loader_schedule.rb + the Rufus cron
wiring in jdbc_static.rb:189-204).

The reference runs one worker thread on a cron line with second
resolution (scan frequency 0.3 s for seconds-cron, else 2.5 s). Here the
scheduler is a thin interval thread around DimensionStore.refresh() —
the semantics that matter (reload counter increments, lookups keep
serving a consistent snapshot during reload, new snapshot visible after
swap) live in refresh.py and are what the reload spec asserts
(spec/filters/jdbc_static_spec.rb:141-158).
"""

from __future__ import annotations

import re
import threading

from logstash_filter_jdbc_static_spark.plans.refresh import DimensionStore

_EVERY_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(s|sec|m|min|h)\s*$", re.IGNORECASE)
_CRON_SECONDS_RE = re.compile(r"^\*/(\d+)(\s+\*){4,5}$")


def parse_schedule(expr: str) -> float:
    """Accepts '<n>s|m|h' or the seconds-resolution cron shape the
    reference's specs use ('*/10 * * * * *', loader_schedule 6-field) and
    returns the interval in seconds."""
    m = _EVERY_RE.match(expr)
    if m:
        mult = {"s": 1, "sec": 1, "m": 60, "min": 60, "h": 3600}[m.group(2).lower()]
        return float(m.group(1)) * mult
    m = _CRON_SECONDS_RE.match(expr.strip())
    if m:
        return float(m.group(1))
    raise ValueError(f"unsupported schedule expression: {expr!r}")


class RepeatingLoadRunner:
    """== RepeatingLoadRunner + scheduler thread: initial_load now, then
    repeated_load per tick until stop()."""

    def __init__(self, store: DimensionStore, schedule: str):
        self.store = store
        self.interval = parse_schedule(schedule)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        self.store.initial_load()

        def loop() -> None:
            while not self._stop.wait(self.interval):
                self.store.refresh()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)

    @property
    def reload_count(self) -> int:
        return self.store.reload_count
