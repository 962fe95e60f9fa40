"""filter_matched common options + scheduled reload runner."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from logstash_filter_jdbc_static_spark.operators.matched import (
    apply_matched_options,
)
from logstash_filter_jdbc_static_spark.operators.processor import LookupEnricher
from logstash_filter_jdbc_static_spark.plans.refresh import DimensionStore
from logstash_filter_jdbc_static_spark.plans.schedule import (
    RepeatingLoadRunner,
    parse_schedule,
)
from logstash_filter_jdbc_static_spark.sources.transcripts import (
    SERVERS_SCHEMA,
    servers_df,
)
from logstash_filter_jdbc_static_spark.spec import (
    LoaderSpec,
    LocalDbObject,
    PipelineSpec,
)


class TestMatchedOptions:
    def _enriched(self, spark, ip):
        spec = PipelineSpec(
            lookups=[
                {
                    "id": "server",
                    "query": "SELECT name, location FROM servers WHERE ip = :ip",
                    "parameters": {"ip": "ip"},
                }
            ]
        )
        enricher = LookupEnricher(spec, {"servers": servers_df(spark)})
        fact = spark.createDataFrame(
            [("c1", 1, ip)], "conv_id string, turn_idx int, ip string"
        )
        return enricher.apply(fact)

    def test_add_field_hoists_nested_on_matched(self, spark):
        # docs/index.asciidoc:127-131: add_field => { server_name =>
        #   "%{[server][0][name]}" } applied because event matched
        out = apply_matched_options(
            self._enriched(spark, "10.2.1.1"),
            add_field={"server_name": "%{[server][0][name]}",
                       "label": "at %{[server][0][location]}!"},
        )
        row = out.collect()[0]
        assert row["server_name"] == "nyc-server-1"
        assert row["label"] == "at NYC-5-2-8!"

    def test_add_field_skipped_when_unmatched(self, spark):
        out = apply_matched_options(
            self._enriched(spark, None),
            add_field={"server_name": "%{[server][0][name]}"},
        )
        row = out.collect()[0]
        assert row["matched"] is False
        assert row["server_name"] is None

    def test_remove_field_on_matched(self, spark):
        out = apply_matched_options(
            self._enriched(spark, "10.2.1.1"), remove_field=["ip"]
        )
        assert out.collect()[0]["ip"] is None


class TestSchedule:
    def test_parse(self):
        from logstash_filter_jdbc_static_spark.plans.cron import CronLine

        assert parse_schedule("2s") == 2.0
        assert parse_schedule("5 min") == 300.0
        cl = parse_schedule("*/10 * * * * *")
        assert isinstance(cl, CronLine)
        assert cl.seconds == frozenset(range(0, 60, 10))


class TestCronLine:
    """General cron parsing (loader_schedule.rb:24-46 accepts any Rufus
    cron line): 5/6-field, ranges, lists, steps, names, timezone."""

    def _next(self, expr, after_iso):
        from datetime import datetime

        from logstash_filter_jdbc_static_spark.plans.cron import CronLine

        return CronLine.parse(expr).next_fire(
            datetime.fromisoformat(after_iso)
        ).isoformat()

    def test_nightly_at_2am(self):
        # "reload nightly at 2am" — the shape round 1 rejected
        assert self._next("0 2 * * *", "2026-08-17T01:00:00") == "2026-08-17T02:00:00"
        assert self._next("0 2 * * *", "2026-08-17T03:00:00") == "2026-08-18T02:00:00"
        # strictly-after: a fire AT 02:00 schedules the next day
        assert self._next("0 2 * * *", "2026-08-17T02:00:00") == "2026-08-18T02:00:00"

    def test_lists_ranges_steps_names(self):
        assert self._next("0 0 1,15 * *", "2026-08-17T00:00:00") == "2026-09-01T00:00:00"
        # business hours every 2h starting 9, weekdays only
        assert self._next("30 9-17/2 * * mon-fri", "2026-08-14T17:00:00") == (
            "2026-08-14T17:30:00"  # friday 17:30 still fires
        )
        assert self._next("30 9-17/2 * * mon-fri", "2026-08-14T17:31:00") == (
            "2026-08-17T09:30:00"  # next is monday 09:30
        )
        assert self._next("0 0 * * sun", "2026-08-17T00:00:00") == "2026-08-23T00:00:00"
        assert self._next("0 0 1 jan *", "2026-08-17T00:00:00") == "2027-01-01T00:00:00"

    def test_dom_dow_or_rule(self):
        # both restricted => OR (crontab(5)): fires on the 13th AND on fridays
        nxt = self._next("0 0 13 * fri", "2026-09-09T00:00:00")
        assert nxt == "2026-09-11T00:00:00"  # friday the 11th, before the 13th
        nxt2 = self._next("0 0 13 * fri", "2026-09-11T00:00:00")
        assert nxt2 == "2026-09-13T00:00:00"  # then the 13th (a sunday)

    def test_six_field_seconds(self):
        assert self._next("*/10 * * * * *", "2026-08-17T00:00:04") == (
            "2026-08-17T00:00:10"
        )
        assert self._next("*/10 * * * * *", "2026-08-17T00:00:55") == (
            "2026-08-17T00:01:00"
        )

    def test_timezone_token(self):
        from datetime import datetime, timezone

        from logstash_filter_jdbc_static_spark.plans.cron import CronLine

        cl = CronLine.parse("0 2 * * * Europe/Berlin")
        # 2am Berlin in August (CEST, UTC+2) == midnight UTC
        nxt = cl.next_fire(datetime(2026, 8, 17, 22, 0, tzinfo=timezone.utc))
        assert nxt.utcoffset().total_seconds() == 7200
        assert nxt.hour == 2
        assert nxt.astimezone(timezone.utc).hour == 0

    def test_next_fire_agrees_with_matches_scan(self):
        """Property: next_fire(after) returns the FIRST instant t > after
        with matches(t), verified against a brute-force second-by-second
        scan for a spread of cron shapes and start instants."""
        from datetime import datetime, timedelta

        from logstash_filter_jdbc_static_spark.plans.cron import CronLine

        lines = [
            "*/10 * * * * *",
            "0,30 */5 * * * *",
            "0 2 * * *",
            "30 9-17/2 * * mon-fri",
            "0 0 13 * fri",
            "15 3 1,15 jan,jul *",
            "*/7 * * 29 2 *",  # leap-day seconds cron
        ]
        starts = [
            datetime(2026, 8, 17, 1, 59, 58),
            datetime(2026, 12, 31, 23, 59, 59),
            datetime(2028, 2, 28, 23, 0, 0),  # leap year boundary
        ]
        def day_ok(cl, d):
            # independent reimplementation of the crontab(5) dom/dow rule
            dom = cl.days is None or d.day in cl.days
            dow = cl.weekdays is None or (d.isoweekday() % 7) in cl.weekdays
            if cl.days is not None and cl.weekdays is not None:
                return dom or dow
            return dom and dow

        def brute(cl, start):
            t0 = (start + timedelta(seconds=1)).replace(microsecond=0)
            day = t0.date()
            step = 1 if cl.seconds != frozenset({0}) else 60
            for _ in range(366 * 4 + 2):
                d = datetime(day.year, day.month, day.day)
                if (cl.months is None or d.month in cl.months) and day_ok(cl, d):
                    t = t0 if day == t0.date() else d
                    if step == 60 and t.second != 0:
                        t = t.replace(second=0) + timedelta(minutes=1)
                    end = d + timedelta(days=1)
                    while t < end:
                        if cl.matches(t):
                            return t
                        t += timedelta(seconds=step)
                day += timedelta(days=1)
            return None

        for expr in lines:
            cl = CronLine.parse(expr)
            for start in starts:
                got = cl.next_fire(start)
                scanned = brute(cl, start)
                assert scanned is not None, (expr, start)
                assert got == scanned, (expr, start, got, scanned)

    def test_invalid_lines_raise_reference_message(self):
        import pytest as _pytest

        from logstash_filter_jdbc_static_spark.plans.cron import CronLine

        for bad in ("99 * * * *", "* * *", "0 2 * * * * *", "a b c d e"):
            with _pytest.raises(ValueError, match="loader_schedule option is invalid"):
                CronLine.parse(bad)
        with _pytest.raises(ValueError, match="must be a string"):
            CronLine.parse(None)

    def test_repeating_runner_reloads(self, spark):
        # ≅ jdbc_static_spec.rb:141-158 without wall-clock cron precision
        calls = {"n": 0}

        def fetch():
            calls["n"] += 1
            return spark.createDataFrame(
                [("10.1.1.1", f"v{calls['n']}", "L")], SERVERS_SCHEMA
            )

        store = DimensionStore(
            spark,
            [LocalDbObject({"name": "servers",
                            "columns": [["ip", "varchar(64)"],
                                        ["name", "varchar(64)"],
                                        ["location", "varchar(64)"]]})],
            [(LoaderSpec({"local_table": "servers", "query": "q"}), fetch)],
        )
        runner = RepeatingLoadRunner(store, "0.2s")
        runner.start()
        try:
            deadline = time.time() + 20
            while runner.reload_count < 3 and time.time() < deadline:
                time.sleep(0.1)
        finally:
            runner.stop()
        assert runner.reload_count >= 3
        names = [r["name"] for r in store.dims()["servers"].collect()]
        assert names == [f"v{calls['n']}"]  # lookups see the newest snapshot

    def test_cron_runner_reloads(self, spark):
        """A real cron line drives the refresh (jdbc_static_spec.rb:141-158
        reload contract; every-second cron keeps the test fast)."""
        calls = {"n": 0}

        def fetch():
            calls["n"] += 1
            return spark.createDataFrame(
                [("10.1.1.1", f"v{calls['n']}", "L")], SERVERS_SCHEMA
            )

        store = DimensionStore(
            spark,
            [LocalDbObject({"name": "servers",
                            "columns": [["ip", "varchar(64)"],
                                        ["name", "varchar(64)"],
                                        ["location", "varchar(64)"]]})],
            [(LoaderSpec({"local_table": "servers", "query": "q"}), fetch)],
        )
        runner = RepeatingLoadRunner(store, "* * * * * *")
        runner.start()
        try:
            deadline = time.time() + 20
            while runner.reload_count < 2 and time.time() < deadline:
                time.sleep(0.1)
        finally:
            runner.stop()
        assert runner.reload_count >= 2  # initial load + >=1 cron reload
        names = [r["name"] for r in store.dims()["servers"].collect()]
        assert names == [f"v{calls['n']}"]


class TestCronDst:
    """DST normalization on timezone-qualified lines (round-2 ADVICE
    item 1): candidates are validated on the UTC axis, so the fall-back
    repeated hour can never return an instant EARLIER than 'now' (the
    negative-wait busy-loop), and spring-forward gaps skip to the next
    real occurrence. Europe/Berlin 2026: spring-forward 2026-03-29
    02:00->03:00, fall-back 2026-10-25 03:00->02:00."""

    def _fire_utc(self, expr, after_utc_iso):
        from datetime import datetime, timezone

        from logstash_filter_jdbc_static_spark.plans.cron import CronLine

        after = datetime.fromisoformat(after_utc_iso).replace(
            tzinfo=timezone.utc
        )
        return (
            CronLine.parse(expr)
            .next_fire(after)
            .astimezone(timezone.utc)
            .isoformat()
        )

    def test_fallback_second_pass_never_before_now(self):
        # now = 02:10 CET (second pass of the repeated hour, 01:10Z).
        # Naive field replacement returns 02:30 fold=0 (CEST) = 00:30Z —
        # 40 minutes in the PAST (the busy-loop bug). A run-once daily
        # line already fired wall 02:30 on the first pass (00:30Z), so
        # the next fire is TOMORROW's 02:30 CET (vixie run-once rule).
        assert self._fire_utc("30 2 * * * Europe/Berlin", "2026-10-25T01:10:00") == (
            "2026-10-26T01:30:00+00:00"
        )

    def test_fallback_run_once_line_fires_once_not_twice(self):
        """Chaining next_fire across the fall-back day: a daily
        fixed-time line fires exactly once on 2026-10-25 (at the FIRST
        occurrence of wall 02:30), never again inside the repeated hour
        (the round-3 review's double-fire finding)."""
        from datetime import datetime, timezone

        from logstash_filter_jdbc_static_spark.plans.cron import CronLine

        cl = CronLine.parse("30 2 * * * Europe/Berlin")
        fires = []
        cur = datetime(2026, 10, 24, 12, 0, tzinfo=timezone.utc)
        for _ in range(3):
            cur = cl.next_fire(cur).astimezone(timezone.utc)
            fires.append(cur.isoformat())
        assert fires == [
            "2026-10-25T00:30:00+00:00",  # wall 02:30 CEST (first pass)
            "2026-10-26T01:30:00+00:00",  # next day, 02:30 CET
            "2026-10-27T01:30:00+00:00",
        ]

    def test_fallback_subhourly_line_follows_wall_clock(self):
        """crontab(5): a line firing >1x/hour runs through BOTH passes
        of the repeated hour — chaining across the transition visits
        wall 02:45 CEST, 02:00 CET (second pass), 02:15 CET."""
        from datetime import datetime, timezone

        from logstash_filter_jdbc_static_spark.plans.cron import CronLine

        cl = CronLine.parse("*/15 * * * * Europe/Berlin")
        fires = []
        cur = datetime(2026, 10, 25, 0, 40, tzinfo=timezone.utc)  # 02:40 CEST
        for _ in range(3):
            cur = cl.next_fire(cur).astimezone(timezone.utc)
            fires.append(cur.isoformat())
        assert fires == [
            "2026-10-25T00:45:00+00:00",  # 02:45 CEST
            "2026-10-25T01:00:00+00:00",  # 02:00 CET (second pass)
            "2026-10-25T01:15:00+00:00",  # 02:15 CET
        ]

    def test_fallback_first_pass_finds_repeated_hour(self):
        # now = 02:50 CEST (first pass, 00:50Z). The next quarter-hour on
        # the UTC axis is wall 02:00 CET (second pass) = 01:00Z, NOT
        # wall 03:00 (= 02:00Z).
        assert self._fire_utc("*/15 * * * * Europe/Berlin", "2026-10-25T00:50:00") == (
            "2026-10-25T01:00:00+00:00"
        )

    def test_spring_forward_gap_skips_to_next_real_occurrence(self):
        # 02:30 Berlin does not exist on 2026-03-29; fire at the next
        # real 02:30 (CEST, -2h offset) the following day.
        assert self._fire_utc("30 2 * * * Europe/Berlin", "2026-03-29T00:00:00") == (
            "2026-03-30T00:30:00+00:00"
        )

    def test_plain_days_unaffected(self):
        assert self._fire_utc("30 2 * * * Europe/Berlin", "2026-08-17T22:00:00") == (
            "2026-08-18T00:30:00+00:00"
        )

    def test_next_wait_is_clamped_non_negative(self):
        from logstash_filter_jdbc_static_spark.plans.schedule import (
            RepeatingLoadRunner,
        )

        r = RepeatingLoadRunner(store=None, schedule="0.001s")
        assert r._next_wait() >= r.MIN_WAIT_S
        r2 = RepeatingLoadRunner(store=None, schedule="0 2 * * * Europe/Berlin")
        assert r2._next_wait() >= r2.MIN_WAIT_S
