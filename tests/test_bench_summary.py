"""The driver's tail capture is ~2.2 KB and BENCH_r04.json came back
``parsed: null`` because bench.py printed one giant JSON line (round-4
verdict #1). These tests pin the new output contract: the final printed
line is a compact summary that always fits the tail window, with the
full per-run arrays relegated to BENCH_DETAIL.json."""

import json

import bench


def _fake_result() -> dict:
    q10 = {
        name: {
            "cold_s": 1.234,
            "median_s": 1.234,
            "runs_s": [1.1, 1.2, 1.234, 1.3, 1.4],
            "spread_pct": 12.3,
        }
        for name in bench.HEADLINE
    }
    return {
        "metric": "headline_queries_total_time",
        "value": 123.456,
        "unit": "sec",
        "queries": {name: 1.234 for name in bench.HEADLINE},
        "sf": 0.1,
        "cpus": 32,
        "rows_materialized": 123456789,
        "headline_10x": {"total_median_s": 20.978, "queries": q10},
        "flagship_scale": {
            "n_turns": 20_000_000,
            "all_runs_s": [4.9, 4.0, 4.6, 5.0, 5.9],
            "steady_runs_s": [4.6, 5.0, 5.9],
            "median_s": 5.995,
            "turns_per_sec": 3336113,
            "spread_pct": 21.6,
            "host_ceiling": {
                "ctl_runs_s": [2.5, 2.6, 2.7, 2.8, 2.9],
                "ctl_median_s": 2.712,
                "ctl_spread_pct": 8.1,
            },
        },
        "scaling": {
            "n_turns": 20_000_000,
            "parallelism": {
                "8": {"seconds": 21.1, "turns_per_sec": 948323,
                      "ctl_seconds": 10.4},
                "32": {"seconds": 5.9, "turns_per_sec": 3372681,
                       "ctl_seconds": 2.9},
            },
            "speedup": 3.556,
            "scaling_efficiency": 0.889,
            "ctl_scaling_efficiency": 0.897,
            "normalized_efficiency": 0.991,
        },
    }


class TestCompactSummary:
    def test_fits_tail_window(self):
        line = json.dumps(bench.compact_summary(_fake_result()),
                          separators=(",", ":"))
        # hard driver constraint with margin: tail window is ~2.2 KB
        assert len(line) < 2000, len(line)

    def test_summary_carries_the_ab_numbers(self):
        s = bench.compact_summary(_fake_result())
        assert s["metric"] == "headline_10x_total_median_s"
        assert s["unit"] == "sec"
        # per-query 10x medians: the round-over-round A/B instrument
        assert set(s["queries"]) == set(bench.HEADLINE)
        assert all(isinstance(v, float) for v in s["queries"].values())
        assert s["flagship"]["ctl_median_s"] == 2.712
        assert s["scaling"]["norm_eff"] == 0.991
        assert s["detail"] == "BENCH_DETAIL.json"

    def test_scaling_error_is_passed_through(self):
        res = _fake_result()
        res["scaling"] = {"err": "boom"}
        s = bench.compact_summary(res)
        assert s["scaling"] == {"err": "boom"}

    def test_no_scaling_section_when_skipped(self):
        res = _fake_result()
        del res["scaling"]
        assert "scaling" not in bench.compact_summary(res)
