"""Cron-line parsing + next-fire-time computation (A15).

The reference accepts any Rufus::Scheduler::CronLine for
``loader_schedule`` (loader_schedule.rb:24-46, jdbc_static.rb:80-85):
5-field vixie cron (``min hour dom month dow``), the 6-field variant
with a LEADING seconds field (``sec min hour dom month dow`` — the shape
its specs use, ``*/10 * * * * *``), month/weekday names, ranges, steps,
lists, and an optional trailing timezone token. This module reimplements
that surface on the stdlib (re + datetime + zoneinfo) — no scheduler
dependency — exposing ``CronLine.next_fire(after)`` for the reload
thread.

Semantics mirrored from vixie cron / Rufus:
- day-of-month and day-of-week combine with OR when BOTH are
  restricted, AND otherwise (the classic crontab(5) rule).
- ``*/n`` == ``first-last/n``; ranges may wrap (``fri-mon``).
- Sunday is both 0 and 7.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timedelta

_MONTH_NAMES = {
    name: i + 1
    for i, name in enumerate(
        "jan feb mar apr may jun jul aug sep oct nov dec".split()
    )
}
_DOW_NAMES = {
    name: i for i, name in enumerate("sun mon tue wed thu fri sat".split())
}

_FIELD_BOUNDS = {
    "second": (0, 59),
    "minute": (0, 59),
    "hour": (0, 23),
    "dom": (1, 31),
    "month": (1, 12),
    "dow": (0, 7),
}


def _resolve_token(tok: str, field: str) -> int:
    tok = tok.strip().lower()
    if field == "month" and tok in _MONTH_NAMES:
        return _MONTH_NAMES[tok]
    if field == "dow" and tok in _DOW_NAMES:
        return _DOW_NAMES[tok]
    if not re.fullmatch(r"\d+", tok):
        raise ValueError(f"invalid {field} token {tok!r}")
    return int(tok)


def _parse_field(spec: str, field: str) -> frozenset[int] | None:
    """None == unrestricted (``*``); otherwise the allowed value set."""
    lo, hi = _FIELD_BOUNDS[field]
    if spec == "*":
        return None
    values: set[int] = set()
    for part in spec.split(","):
        if not part:
            raise ValueError(f"empty element in {field} field {spec!r}")
        step = 1
        if "/" in part:
            rng, step_s = part.split("/", 1)
            if not re.fullmatch(r"\d+", step_s) or int(step_s) == 0:
                raise ValueError(f"invalid step in {field} field {part!r}")
            step = int(step_s)
        else:
            rng = part
        if rng == "*" or rng == "":
            start, end = lo, hi
        elif "-" in rng:
            a, b = rng.split("-", 1)
            start, end = _resolve_token(a, field), _resolve_token(b, field)
        else:
            start = end = _resolve_token(rng, field)
            if "/" in part:  # "5/15" == "5-last/15" (vixie extension)
                end = hi
        for v in (start, end):
            if not (lo <= v <= hi):
                raise ValueError(
                    f"{field} value {v} out of range {lo}..{hi} in {spec!r}"
                )
        if start <= end:
            span = list(range(start, end + 1))
        else:  # wrapping range, e.g. fri-mon, 22-2
            span = list(range(start, hi + 1)) + list(range(lo, end + 1))
        values.update(span[::step])
    if field == "dow" and 7 in values:
        values.add(0)  # sunday is 0 and 7
        values.discard(7)
    return frozenset(values)


def _maybe_zone(token: str):
    """A trailing timezone token (Rufus allows e.g. 'Europe/Berlin',
    'UTC'). Returns a tzinfo or None if the token isn't a zone."""
    if re.fullmatch(r"[A-Za-z_]+(/[A-Za-z_+\-0-9]+)+|UTC|GMT", token):
        try:
            from zoneinfo import ZoneInfo

            return ZoneInfo(token)
        except Exception:
            return None
    return None


@dataclass(frozen=True)
class CronLine:
    """Parsed cron line; field sets of allowed values (None == any)."""

    seconds: frozenset[int] | None
    minutes: frozenset[int] | None
    hours: frozenset[int] | None
    days: frozenset[int] | None
    months: frozenset[int] | None
    weekdays: frozenset[int] | None
    tz: object | None = None
    source: str = ""

    @classmethod
    def parse(cls, expr: str) -> "CronLine":
        if not isinstance(expr, str):
            raise ValueError("The loader_schedule option must be a string")
        tokens = expr.split()
        tz = None
        if tokens and (zone := _maybe_zone(tokens[-1])) is not None:
            tz = zone
            tokens = tokens[:-1]
        if len(tokens) == 5:
            tokens = ["0", *tokens]  # fire at second 0, like Rufus
            seconds_given = False
        elif len(tokens) == 6:
            seconds_given = True
        else:
            raise ValueError(
                f"The loader_schedule option is invalid: {expr!r} "
                "(expected 5 or 6 cron fields)"
            )
        fields = ("second", "minute", "hour", "dom", "month", "dow")
        try:
            sec, minute, hour, dom, month, dow = (
                _parse_field(t, f) for t, f in zip(tokens, fields)
            )
        except ValueError as e:
            raise ValueError(f"The loader_schedule option is invalid: {e}") from e
        if not seconds_given:
            sec = frozenset({0})
        return cls(sec, minute, hour, dom, month, dow, tz, expr)

    # -- matching ------------------------------------------------------
    def _day_matches(self, dt: datetime) -> bool:
        """crontab(5): if both dom and dow are restricted, EITHER may
        match; if one is '*', the other alone decides."""
        dom_ok = self.days is None or dt.day in self.days
        dow_ok = self.weekdays is None or (dt.isoweekday() % 7) in self.weekdays
        if self.days is not None and self.weekdays is not None:
            return dom_ok or dow_ok
        return dom_ok and dow_ok

    def matches(self, dt: datetime) -> bool:
        if self.tz is not None:
            dt = dt.astimezone(self.tz) if dt.tzinfo else dt
        return (
            (self.months is None or dt.month in self.months)
            and self._day_matches(dt)
            and (self.hours is None or dt.hour in self.hours)
            and (self.minutes is None or dt.minute in self.minutes)
            and (self.seconds is None or dt.second in self.seconds)
        )

    # -- next fire -----------------------------------------------------
    def _candidates(self, t: datetime):
        """Wall-clock instants matching the fields, ascending, starting
        at ``t``. Walks day-by-day on the date fields, then the allowed
        (hour, minute, second) grid — bounded (4 years covers any
        reachable month/dom/dow combo)."""
        secs = sorted(self.seconds) if self.seconds is not None else range(60)
        mins = sorted(self.minutes) if self.minutes is not None else range(60)
        hrs = sorted(self.hours) if self.hours is not None else range(24)
        day = t.date()
        for _ in range(366 * 4 + 1):
            d = datetime(day.year, day.month, day.day, tzinfo=t.tzinfo)
            if (self.months is None or d.month in self.months) and self._day_matches(d):
                floor = t if d.date() == t.date() else d
                for h in hrs:
                    if h < floor.hour:
                        continue
                    for m in mins:
                        if h == floor.hour and m < floor.minute:
                            continue
                        for s in secs:
                            if (
                                h == floor.hour
                                and m == floor.minute
                                and s < floor.second
                            ):
                                continue
                            yield d.replace(hour=h, minute=m, second=s)
            day = day + timedelta(days=1)

    def next_fire(self, after: datetime) -> datetime:
        """Earliest matching instant strictly after ``after``.

        Timezone-qualified lines get real DST normalization (the Rufus
        behavior the round-2 advisor flagged): each wall-clock candidate
        is validated on the UTC axis, because naive field replacement is
        wrong in both DST transitions —

        - fall-back repeated hour: vixie-cron semantics (crontab(5)) —
          a line firing at most once per hour runs ONCE in the repeated
          hour (only the first, fold=0, occurrence of each wall time
          counts; the fold=1 recurrence is never returned, so it cannot
          re-fire and the computed wait stays positive). A line firing
          more than once per hour follows the wall clock and so runs
          through BOTH passes of the repeated hour.
        - spring-forward gap: a nonexistent wall time (detected by the
          astimezone round-trip changing the wall clock) is skipped —
          the job fires at the line's next real occurrence.
        """
        aware = self.tz is not None and after.tzinfo is not None
        if aware:
            after = after.astimezone(self.tz)
        t = (after + timedelta(seconds=1)).replace(microsecond=0)
        from datetime import timezone as _tzmod

        utc = _tzmod.utc
        after_utc = after.astimezone(utc) if aware else None
        # crontab(5) DST rule: only lines firing >1x/hour follow the
        # wall clock through a repeated hour; others fire once per match.
        n_min = len(self.minutes) if self.minutes is not None else 60
        n_sec = len(self.seconds) if self.seconds is not None else 60
        multi_per_hour = n_min * n_sec > 1
        found: datetime | None = None
        for cand in self._candidates(t):
            if not aware:
                return cand
            for fold in (0, 1):
                c = cand.replace(fold=fold)
                c_utc = c.astimezone(utc)
                # nonexistent wall time: converting back changes the clock
                back = c_utc.astimezone(self.tz)
                if back.replace(tzinfo=None, fold=0) != c.replace(tzinfo=None, fold=0):
                    break  # spring-forward gap — skip this candidate
                if c_utc > after_utc:
                    found = c
                    break
                if not multi_per_hour:
                    break  # run-once line: the fold=1 recurrence never fires
                if c_utc == cand.replace(fold=1).astimezone(utc):
                    break  # unambiguous time: fold=1 adds nothing
            if found is not None:
                break
        if not aware:
            raise ValueError(
                f"cron line {self.source!r} never fires (unsatisfiable fields)"
            )
        # Second pass of a fall-back repeated hour (wall-clock lines
        # only): when ``after`` sits in the FIRST (fold=0) reading,
        # wall-clock times already behind it recur — their fold=1
        # instants may precede the forward scan's result on the UTC axis.
        delta = abs(
            after.replace(fold=1).utcoffset() - after.replace(fold=0).utcoffset()
        )
        if multi_per_hour and after.fold == 0 and delta:
            start = (after - delta).replace(microsecond=0)
            for cand in self._candidates(start):
                if cand.replace(tzinfo=None) > t.replace(tzinfo=None):
                    break  # forward scan already covered from t on
                c = cand.replace(fold=1)
                c_utc = c.astimezone(utc)
                if c_utc == cand.replace(fold=0).astimezone(utc):
                    continue  # unambiguous — not in the repeated window
                if c_utc > after_utc and (
                    found is None or c_utc < found.astimezone(utc)
                ):
                    found = c
                    break  # candidates ascend: the first hit is minimal
        if found is not None:
            return found
        raise ValueError(
            f"cron line {self.source!r} never fires (unsatisfiable fields)"
        )

    def frequency_hint(self) -> float:
        """Rufus' scan frequency heuristic (loader_schedule.rb:30-37):
        0.3 s when only seconds are restricted, else 2.5 s. Used as the
        stop-responsiveness bound for the reload thread's wait loop."""
        only_seconds = (
            self.seconds is not None
            and self.minutes is None
            and self.hours is None
            and self.days is None
            and self.months is None
            and self.weekdays is None
        )
        return 0.3 if only_seconds else 2.5
