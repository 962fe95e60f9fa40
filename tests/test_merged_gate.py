"""The merged gate rows join their part queries FULL OUTER on the
natural key with per-part membership markers (round-4 verdict #6).
These tests prove the construction catches what the previous INNER
join could mask: a part bug that adds/removes rows at keys its sibling
parts don't cover."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from logstash_filter_jdbc_static_spark import queries as Q

Q.queries()  # load part modules BEFORE queries_merged (registration order)
from logstash_filter_jdbc_static_spark import queries_merged as M  # noqa: E402


@pytest.fixture
def scratch_registry():
    """Run _merge against throwaway part registrations, then restore
    the global registry (the driver-facing 50-entry contract must not
    see test entries)."""
    added: list[str] = []

    def reg(name, sql, fn):
        Q.QUERIES[name] = fn
        Q.ORACLES[name] = sql
        added.append(name)

    yield reg, added
    for name in added:
        Q.QUERIES.pop(name, None)
        Q.ORACLES.pop(name, None)
        M.CONSOLIDATED.pop(name, None)


def _mk_parts(spark, scratch, buggy: bool):
    """Two parts keyed by region r_regionkey (0..4). The 'buggy'
    variant makes part B silently DROP key 4 — the membership-bug
    shape an inner join hides (key 4 vanishes from the joined result
    on BOTH engines identically)."""
    reg, _ = scratch
    b_cap = "WHERE r_regionkey < 4" if buggy else ""

    def part_a(spark, sf_dir):
        return (
            spark.read.parquet(f"{sf_dir}/region.parquet")
            .select("r_regionkey", F.length("r_name").alias("name_len"))
        )

    def part_b(spark, sf_dir):
        df = spark.read.parquet(f"{sf_dir}/region.parquet")
        if buggy:
            df = df.filter(F.col("r_regionkey") < 4)
        return df.select(
            "r_regionkey", F.upper(F.col("r_name")).alias("uname")
        )

    reg("canary_a",
        "SELECT r_regionkey, CAST(length(r_name) AS INTEGER) AS name_len "
        "FROM region", part_a)
    reg("canary_b",
        f"SELECT r_regionkey, upper(r_name) AS uname FROM region {b_cap}",
        part_b)
    M._merge(
        "canary_merged", ["r_regionkey"],
        [("canary_a", [("name_len", "name_len")]),
         ("canary_b", [("uname", "uname")])],
    )
    return Q.QUERIES["canary_merged"], Q.ORACLES["canary_merged"]


def _duck(sql: str, sf_dir: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW region AS SELECT * FROM '{sf_dir}/region.parquet'"
    )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, sorted(map(tuple, cur.fetchall()))


SF_DIR = "/root/testdata/sf0.001"


class TestOuterJoinMergedGate:
    def test_membership_bug_surfaces_with_markers(self, spark, scratch_registry):
        fn, sql = _mk_parts(spark, scratch_registry, buggy=True)
        out = fn(spark, SF_DIR).orderBy("r_regionkey").collect()
        # the dropped key is STILL a row — NULL-padded, marker FALSE
        assert len(out) == 5
        row4 = out[4]
        assert row4["r_regionkey"] == 4
        assert row4["uname"] is None and row4["in_p1"] is False
        assert row4["name_len"] is not None and row4["in_p0"] is True
        # and the composed DuckDB oracle shows the identical shape, so
        # a one-engine membership bug becomes a hash mismatch
        cols, drows = _duck(sql, SF_DIR)
        assert set(cols) == set(out[0].asDict())
        spark_sorted = sorted(tuple(r[c] for c in cols) for r in out)
        assert spark_sorted == drows

    def test_inner_join_would_have_masked_it(self, spark, scratch_registry):
        fn, _ = _mk_parts(spark, scratch_registry, buggy=True)
        # what the pre-round-5 inner join would have produced: key 4
        # gone entirely — 4 rows, no trace of the bug
        reg, _ = scratch_registry
        a = Q.QUERIES["canary_a"](spark, SF_DIR)
        b = Q.QUERIES["canary_b"](spark, SF_DIR)
        inner = a.join(b, ["r_regionkey"])
        assert inner.count() == 4
        assert fn(spark, SF_DIR).count() == 5

    def test_clean_parts_all_markers_true(self, spark, scratch_registry):
        fn, sql = _mk_parts(spark, scratch_registry, buggy=False)
        out = fn(spark, SF_DIR).collect()
        assert len(out) == 5
        assert all(r["in_p0"] and r["in_p1"] for r in out)
        cols, drows = _duck(sql, SF_DIR)
        spark_sorted = sorted(tuple(r[c] for c in cols) for r in out)
        assert spark_sorted == drows
