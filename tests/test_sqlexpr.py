"""Scalar-expression lookup SQL (round-3 verdict #2): arithmetic,
COALESCE and searched CASE in projections and predicate left-hand
sides. Parser shapes, golden end-to-end runs on every physical path,
and property-based Spark-vs-row-oracle equivalence."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from logstash_filter_jdbc_static_spark import oracle
from logstash_filter_jdbc_static_spark.operators import sqlexpr
from logstash_filter_jdbc_static_spark.operators.lookup import (
    CompiledLookup,
    parse_lookup_query,
)
from logstash_filter_jdbc_static_spark.operators.processor import LookupEnricher
from logstash_filter_jdbc_static_spark.spec import PipelineSpec, ValidationError


class TestExprParser:
    def test_arithmetic_predicate_lhs_becomes_computed_column(self):
        q = parse_lookup_query(
            "SELECT name FROM items WHERE price * qty > :limit"
        )
        ((p,),) = (q.disjuncts,)
        (pred,) = p
        assert pred.dim_column == "__expr0" and pred.op == ">"
        (name, ast) = q.computed[0]
        assert name == "__expr0"
        assert ast == sqlexpr.Bin("*", sqlexpr.Col("price"), sqlexpr.Col("qty"))

    def test_computed_equality_keeps_equi_path(self):
        q = parse_lookup_query("SELECT a FROM t WHERE (hour + 1) * 2 = :h")
        assert q.is_pure_equi

    def test_projection_and_where_share_one_computed_column(self):
        q = parse_lookup_query(
            "SELECT price*qty AS total FROM t WHERE price * qty = :n"
        )
        assert len(q.computed) == 1
        (pred,) = q.disjuncts[0]
        assert q.projection == [(q.computed[0][0], "total")]
        assert pred.dim_column == q.computed[0][0]

    def test_precedence_mul_before_add(self):
        q = parse_lookup_query("SELECT a + b * c AS x FROM t")
        (_, ast) = q.computed[0]
        assert ast == sqlexpr.Bin(
            "+", sqlexpr.Col("a"),
            sqlexpr.Bin("*", sqlexpr.Col("b"), sqlexpr.Col("c")),
        )

    def test_unary_minus_folds_into_literal(self):
        q = parse_lookup_query("SELECT a - -1 AS x FROM t")
        (_, ast) = q.computed[0]
        assert ast == sqlexpr.Bin("-", sqlexpr.Col("a"), sqlexpr.Lit(-1))

    def test_case_and_coalesce_projections(self):
        q = parse_lookup_query(
            "SELECT coalesce(name, '?') AS n, "
            "CASE WHEN price > 10 THEN 'hi' WHEN price IS NULL THEN 'na' "
            "ELSE 'lo' END AS band FROM items WHERE id = :i"
        )
        assert [a for _, a in q.projection] == ["n", "band"]
        assert len(q.computed) == 2
        assert q.is_pure_equi

    def test_concat_and_substr(self):
        q = parse_lookup_query(
            "SELECT substr(name, 1, 3) || '-' || upper(cat) AS tag FROM t"
        )
        assert len(q.computed) == 1

    def test_qualified_columns_in_expressions_resolve(self):
        q = parse_lookup_query(
            "SELECT t.price * t.qty AS total FROM t WHERE t.id = :i"
        )
        (_, ast) = q.computed[0]
        assert sqlexpr.columns(ast) == {"price", "qty"}

    @pytest.mark.parametrize(
        ("bad", "msg"),
        [
            ("SELECT a*b FROM t", "requires an AS alias"),
            ("SELECT a FROM t WHERE x + :p = 3", "inside\\s+an expression"),
            # NOTE: sum(a*b) is a legal aggregate-over-expression since
            # round 4 (test_lookup_rhs.py::TestAggregateExpressions);
            # an aggregate INSIDE a scalar expression is still rejected
            ("SELECT 1 + sum(a*b) AS s FROM t", "aggregate sum"),
            # simple CASE is accepted since round 5 (desugars to
            # searched); a CASE with neither scrutinee nor WHEN is not
            ("SELECT CASE END AS c FROM t", "unexpected keyword"),
            ("SELECT CASE WHEN a THEN 1 END AS c FROM t", "comparison in"),
            ("SELECT nosuch(a) AS c FROM t", "unknown function"),
            ("SELECT coalesce(a) AS c FROM t", "argument"),
            ("SELECT a FROM t, u", "expected table name|unsupported lookup FROM"),
        ],
    )
    def test_malformed_expressions_raise(self, bad, msg):
        with pytest.raises(ValidationError, match=msg):
            parse_lookup_query(bad)

    def test_expressions_accepted_in_join_queries_since_round5(self):
        # rounds 3-4 rejected these; build_join_dim now maps the
        # expression's qualified columns onto the derived dim's flat
        # names (tests/test_lookup_join.py::TestJoinExpressions)
        q = parse_lookup_query(
            "SELECT a.x * 2 AS d FROM a JOIN b ON a.k = b.k "
            "WHERE a.k = :k"
        )
        (name, ast) = q.computed[0]
        assert q.projection == [(name, "d")]
        assert sqlexpr.columns(ast) == {"a.x"}  # qualified until flat rewrite

    def test_expressions_accepted_in_having(self):
        # round-5 latest: expression LHS in HAVING registers as a
        # payload-level having_exprs entry (TestHavingExpressionLhs in
        # test_lookup_rhs.py has the value-level coverage)
        q = parse_lookup_query(
            "SELECT cat AS cat, count(*) AS n FROM t GROUP BY cat "
            "HAVING n + 1 > 2"
        )
        (name, _ast), = q.having_exprs
        (p,) = q.having[0]
        assert p.dim_column == name

    def test_select_star_with_where_expression_hides_synthetic(self, spark):
        dim = spark.createDataFrame(
            [(1, 2), (3, 4)], "a: int, b: int"
        )
        cl = CompiledLookup(
            PipelineSpec(
                lookups=[{
                    "id": "x",
                    "query": "SELECT * FROM t WHERE a + b = :s",
                    "parameters": {"s": "s"},
                }]
            ).lookups[0],
            dim,
        )
        assert [a for _, a in cl.out_fields] == ["a", "b"]

    def test_unknown_expression_column_raises_at_compile(self, spark):
        dim = spark.createDataFrame([(1,)], "a: int")
        with pytest.raises(ValidationError, match="unknown column"):
            CompiledLookup(
                PipelineSpec(
                    lookups=[{
                        "id": "x",
                        "query": "SELECT a + zz AS s FROM t WHERE a = :a",
                        "parameters": {"a": "a"},
                    }]
                ).lookups[0],
                dim,
            )


DIM_ROWS = [
    (1, "a", 10, 3),
    (2, "b", 5, 4),
    (3, None, 7, 2),
    (20, "c", 2, 1),
]
DIM_SCHEMA = "id: int, name: string, price: int, qty: int"

ENGINES = [
    {},
    {"inline_threshold": 0},
    {"inline_threshold": 0, "pattern_strategy": "shuffle_map"},
]


@pytest.mark.parametrize("kw", ENGINES)
class TestExprGolden:
    def _run(self, spark, kw, query, facts, schema, params):
        spec = PipelineSpec(
            lookups=[{"id": "x", "query": query, "parameters": params}]
        )
        dim = spark.createDataFrame(DIM_ROWS, DIM_SCHEMA)
        enr = LookupEnricher(spec, {"items": dim}, **kw)
        out = enr.apply(spark.createDataFrame(facts, schema))
        return {
            r[0]: None if r["x"] is None else [d.asDict() for d in r["x"]]
            for r in out.select(out.columns[0], "x").collect()
        }

    def test_arith_case_coalesce_all_paths(self, spark, kw):
        got = self._run(
            spark, kw,
            "SELECT coalesce(name,'?') AS n, price*qty AS total, "
            "CASE WHEN price > 6 THEN 'hi' ELSE 'lo' END AS band "
            "FROM items WHERE price * qty = :limit",
            [(30,), (20,), (14,), (999,)], "lim: int", {"limit": "lim"},
        )
        assert got == {
            30: [{"n": "a", "total": 30, "band": "hi"}],
            20: [{"n": "b", "total": 20, "band": "lo"}],
            14: [{"n": "?", "total": 14, "band": "hi"}],
            999: [],
        }

    def test_division_and_null_propagation(self, spark, kw):
        # price/qty is SQL float division; NULL name propagates through
        # '||' (concat) to a NULL payload field
        got = self._run(
            spark, kw,
            "SELECT price / qty AS ratio, name || '!' AS bang "
            "FROM items WHERE id = :i",
            [(3,), (2,)], "i: int", {"i": "i"},
        )
        assert got == {
            3: [{"ratio": 3.5, "bang": None}],
            2: [{"ratio": 1.25, "bang": "b!"}],
        }

    def test_static_expression_filter_rides_dim_side(self, spark, kw):
        # parameter-free expression predicate: pure dim filter
        got = self._run(
            spark, kw,
            "SELECT id FROM items WHERE price + qty > 8 AND id = :i",
            [(1,), (20,)], "i: int", {"i": "i"},
        )
        assert got == {1: [{"id": 1}], 20: []}

    def test_case_with_order_by_alias(self, spark, kw):
        # ORDER BY a computed alias resolves through alias->synthetic src
        got = self._run(
            spark, kw,
            "SELECT name, mod(id, 2) AS par FROM items "
            "WHERE id < :hi ORDER BY par DESC, name ASC",
            [(4,)], "hi: int", {"hi": "hi"},
        )
        assert got == {
            4: [
                {"name": "a", "par": 1},
                {"name": None, "par": 1},
                {"name": "b", "par": 0},
            ]
        }


FACT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("n", T.IntegerType(), True),
    ]
)
NDIM_SCHEMA = T.StructType(
    [
        T.StructField("price", T.IntegerType(), True),
        T.StructField("qty", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
    ]
)

EXPR_TEMPLATES = [
    ("SELECT name FROM items WHERE price * qty = :n", ["name"]),
    ("SELECT name FROM items WHERE price + qty > 3 AND price - 1 = :n", ["name"]),
    ("SELECT coalesce(name, '?') AS nm, price + qty AS t FROM items "
     "WHERE abs(price - qty) = :n", ["nm", "t"]),
    ("SELECT CASE WHEN price >= qty THEN 'ge' WHEN price IS NULL THEN 'na' "
     "ELSE 'lt' END AS band FROM items WHERE mod(price, 3) = :n", ["band"]),
    ("SELECT name || '-' || name AS dbl FROM items "
     "WHERE length(coalesce(name, '')) + price = :n", ["dbl"]),
    # round-5 widening: CAST + nullif/replace/instr ...
    ("SELECT cast(price AS varchar(8)) || '/' || "
     "coalesce(nullif(name, 'a'), '-') AS tag FROM items "
     "WHERE instr(coalesce(name, ''), 'b') + price = :n", ["tag"]),
    ("SELECT replace(coalesce(name, 'aa'), 'a', 'z') AS rz FROM items "
     "WHERE cast(price * 2 AS bigint) = :n", ["rz"]),
    # ... and [NOT] EXISTS / correlated [NOT] IN subqueries (the
    # hypothesis dims carry NULL prices/qtys/names, so the 3-valued
    # membership and empty-group corners are exercised for real)
    # (first projected field stays STRING-typed: the harness's
    # default_hash writes a string default into it)
    ("SELECT name FROM items WHERE price = :n AND EXISTS "
     "(SELECT 1 FROM items i2 WHERE i2.name = items.name AND i2.qty >= 2)",
     ["name"]),
    ("SELECT name, price FROM items WHERE qty = :n AND NOT EXISTS "
     "(SELECT 1 FROM items i2 WHERE i2.name = items.name AND i2.price > 2)",
     ["name", "price"]),
    ("SELECT name, price FROM items WHERE qty = :n AND price IN "
     "(SELECT i2.qty FROM items i2 WHERE i2.name = items.name)",
     ["name", "price"]),
    ("SELECT name, price FROM items WHERE qty = :n AND price NOT IN "
     "(SELECT i2.qty FROM items i2 WHERE i2.name = items.name)",
     ["name", "price"]),
    # inequality correlation in EXISTS: per-group extremum rewrite
    # (Spark) vs direct row evaluation (oracle) must agree under NULLs
    ("SELECT name, price FROM items WHERE qty = :n AND EXISTS "
     "(SELECT 1 FROM items i2 WHERE i2.name = items.name "
     "AND i2.price > items.price)", ["name", "price"]),
    ("SELECT name, qty FROM items WHERE price = :n AND NOT EXISTS "
     "(SELECT 1 FROM items i2 WHERE items.qty < i2.qty)",
     ["name", "qty"]),
    # LIKE / BETWEEN / IN inside CASE conditions (round 5)
    ("SELECT CASE WHEN name LIKE 'b%' THEN 'B' "
     "WHEN price BETWEEN 2 AND 3 THEN 'mid' "
     "WHEN qty NOT IN (1, 2) THEN 'many' ELSE 'rest' END AS band "
     "FROM items WHERE coalesce(price, 0) = :n", ["band"]),
    # simple CASE (round 5): NULL scrutinee falls to ELSE on both engines
    ("SELECT CASE name WHEN 'a' THEN 'A' WHEN 'bb' THEN 'B' "
     "ELSE '?' END AS t FROM items WHERE coalesce(qty, 0) = :n", ["t"]),
    # scalar subqueries in the PROJECTION (round 5): correlated ->
    # per-group aggregate column (NULL-keyed rows correlate to no
    # group), uncorrelated -> one snapshot literal
    ("SELECT name, (SELECT max(i2.price) FROM items i2 "
     "WHERE i2.name = items.name) AS mp FROM items WHERE qty = :n",
     ["name", "mp"]),
    ("SELECT name, (SELECT count(*) FROM items WHERE price >= 2) AS n2, "
     "(SELECT avg(i2.qty) FROM items i2 WHERE i2.name = items.name) AS aq "
     "FROM items WHERE price = :n", ["name", "n2", "aq"]),
    # Derby numeric built-ins (round 5); transcendentals are round()ed
    # — the JVM and C libm may differ in the final ulp (contract note)
    ("SELECT name, round(degrees(atan2(qty, price)), 6) AS ang, "
     "sign(price - qty) AS sg FROM items "
     "WHERE coalesce(price, 0) = :n", ["name", "ang", "sg"]),
    ("SELECT name, round(ln(price - 2), 6) AS l, "
     "round(sqrt(qty), 6) AS s FROM items "
     "WHERE coalesce(qty, 0) = :n", ["name", "l", "s"]),
    # uncorrelated scalar subquery as a HAVING comparand (round 5):
    # resolved to one snapshot literal, HAVING compiles unchanged
    ("SELECT name, count(*) AS c FROM items WHERE price = :n "
     "GROUP BY name HAVING c <= (SELECT count(*) FROM items "
     "WHERE qty >= 2)", ["name", "c"]),
]

nfacts = st.lists(
    st.tuples(st.sampled_from([0, 1, 2, 3, 4, 6, 9, 12, None])),
    min_size=1, max_size=10,
)
ndims = st.lists(
    st.tuples(
        st.sampled_from([1, 2, 3, 4, None]),
        st.sampled_from([1, 2, 3, None]),
        st.sampled_from(["a", "bb", None]),
    ),
    min_size=0, max_size=8,
)
engine_cfg = st.sampled_from(
    [None, (0, "broadcast_map"), (0, "shuffle_map")]
)


@pytest.mark.slow
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    facts=nfacts,
    dims=ndims,
    template=st.sampled_from(EXPR_TEMPLATES),
    default=st.booleans(),
    engine=engine_cfg,
)
def test_expression_lookups_match_row_at_a_time_oracle(
    spark, facts, dims, template, default, engine
):
    query, fields = template
    lookup: dict = {
        "id": "x",
        "query": query,
        "parameters": {"n": "n"},
    }
    if default:
        lookup["default_hash"] = {fields[0]: "dflt"}
    spec = PipelineSpec(lookups=[lookup])
    spec2 = PipelineSpec(lookups=[dict(lookup)])

    fact_data = [(f"c{i}", i, v[0]) for i, v in enumerate(facts)]
    fact_df = spark.createDataFrame(fact_data, FACT_SCHEMA)
    dim_df = spark.createDataFrame(dims, NDIM_SCHEMA)

    kw = {}
    if engine is not None:
        kw = {"inline_threshold": engine[0], "pattern_strategy": engine[1]}
    enricher = LookupEnricher(spec, {"items": dim_df}, **kw)
    got = {
        r["turn_idx"]: (
            None if r["x"] is None else sorted(
                tuple("\x00N" if d[f] is None else str(d[f]) for f in fields)
                for d in r["x"]
            ),
            list(r["tags"]),
            r["matched"],
        )
        for r in enricher.apply(fact_df).collect()
    }

    tables = {
        "items": [
            {"price": p, "qty": q, "name": nm} for p, q, nm in dims
        ]
    }
    exp = {}
    for conv_id, turn_idx, nval in fact_data:
        event = {"conv_id": conv_id, "turn_idx": turn_idx}
        if nval is not None:
            event["n"] = nval
        oracle.enhance(event, spec2, tables)
        exp[turn_idx] = (
            None if event.get("x") is None else sorted(
                # the row oracle copies default_hash verbatim (keys absent ==
                # NULL in Spark's typed struct), hence .get
                tuple(
                    "\x00N" if d.get(f) is None else str(d.get(f))
                    for f in fields
                )
                for d in event["x"]
            ),
            event["tags"],
            event["matched"],
        )
    assert got == exp


class TestCaseConditionShapes:
    """Round-5: LIKE / IN / BETWEEN inside CASE WHEN conditions (Derby
    runs them verbatim; the closed grammar now accepts them)."""

    def test_parser_shapes(self):
        q = parse_lookup_query(
            "SELECT CASE WHEN name LIKE 'a%' THEN 1 "
            "WHEN qty NOT IN (1, 3) THEN 2 "
            "WHEN price BETWEEN 2 AND 5 THEN 3 ELSE 0 END AS b FROM t"
        )
        (_, ast) = q.computed[0]
        (c1, _), (c2, _), (c3, _) = ast.whens
        assert c1 == sqlexpr.LikeTest(sqlexpr.Col("name"), "a%", False)
        assert c2 == sqlexpr.InList(
            sqlexpr.Col("qty"), (sqlexpr.Lit(1), sqlexpr.Lit(3)), True
        )
        assert c3 == sqlexpr.RangeTest(
            sqlexpr.Col("price"), sqlexpr.Lit(2), sqlexpr.Lit(5), False
        )

    def test_like_pattern_must_be_literal(self):
        with pytest.raises(ValidationError, match="string literal pattern"):
            parse_lookup_query(
                "SELECT CASE WHEN a LIKE b THEN 1 ELSE 0 END AS x FROM t"
            )

    @pytest.mark.parametrize("kw", ENGINES)
    def test_golden_case_conditions(self, spark, kw):
        # DIM_ROWS: (1,'a',10,3) (2,'b',5,4) (3,NULL,7,2) (20,'c',2,1)
        spec = PipelineSpec(
            lookups=[{
                "id": "x",
                "query": (
                    "SELECT CASE WHEN name LIKE 'a%' THEN 'A' "
                    "WHEN price BETWEEN 3 AND 6 THEN 'mid' "
                    "WHEN qty IN (1, 2) THEN 'few' "
                    "ELSE 'rest' END AS band FROM items WHERE id = :i"
                ),
                "parameters": {"i": "i"},
            }]
        )
        dim = spark.createDataFrame(DIM_ROWS, DIM_SCHEMA)
        enr = LookupEnricher(spec, {"items": dim}, **kw)
        out = enr.apply(spark.createDataFrame([(1,), (2,), (3,), (20,)], "i: int"))
        got = {r["i"]: [d["band"] for d in r["x"]] for r in out.collect()}
        # id 3: NULL name -> LIKE unknown, price 7 out of range, qty 2 in
        assert got == {
            1: ["A"], 2: ["mid"], 3: ["few"], 20: ["few"],
        }


class TestSimpleCase:
    def test_desugars_to_searched(self):
        q = parse_lookup_query(
            "SELECT CASE plan WHEN 'basic' THEN 1 WHEN 'pro' THEN 2 "
            "ELSE 0 END AS tier FROM t"
        )
        (_, ast) = q.computed[0]
        assert ast == sqlexpr.Case(
            (
                (sqlexpr.Cmp("=", sqlexpr.Col("plan"), sqlexpr.Lit("basic")),
                 sqlexpr.Lit(1)),
                (sqlexpr.Cmp("=", sqlexpr.Col("plan"), sqlexpr.Lit("pro")),
                 sqlexpr.Lit(2)),
            ),
            sqlexpr.Lit(0),
        )

    def test_scrutinee_may_be_an_expression(self):
        q = parse_lookup_query(
            "SELECT CASE mod(id, 2) WHEN 0 THEN 'even' ELSE 'odd' END "
            "AS par FROM t"
        )
        (_, ast) = q.computed[0]
        (cond, _), = ast.whens
        assert cond == sqlexpr.Cmp(
            "=", sqlexpr.Func("mod", (sqlexpr.Col("id"), sqlexpr.Lit(2))),
            sqlexpr.Lit(0),
        )

    def test_missing_when_raises(self):
        with pytest.raises(ValidationError, match="expected WHEN in CASE"):
            parse_lookup_query("SELECT CASE plan THEN 1 END AS x FROM t")

    @pytest.mark.parametrize("kw", ENGINES)
    def test_golden_null_scrutinee_falls_to_else(self, spark, kw):
        # DIM_ROWS id 3 has NULL name: NULL = 'a' is unknown -> ELSE
        spec = PipelineSpec(
            lookups=[{
                "id": "x",
                "query": ("SELECT CASE name WHEN 'a' THEN 'A' "
                          "WHEN 'b' THEN 'B' ELSE '?' END AS t "
                          "FROM items WHERE id = :i"),
                "parameters": {"i": "i"},
            }]
        )
        dim = spark.createDataFrame(DIM_ROWS, DIM_SCHEMA)
        enr = LookupEnricher(spec, {"items": dim}, **kw)
        out = enr.apply(spark.createDataFrame([(1,), (2,), (3,)], "i: int"))
        got = {r["i"]: [d["t"] for d in r["x"]] for r in out.collect()}
        assert got == {1: ["A"], 2: ["B"], 3: ["?"]}


class TestDerbyMathFunctions:
    """Round-5: Derby's numeric built-in surface (SQRT/EXP/LN/LOG10,
    trig + hyperbolic + COT, DEGREES/RADIANS, SIGN, ATAN2) — compiled
    to the same-named pyspark functions; the row evaluator mirrors
    Spark's corner semantics pinned empirically: LN/LOG10 of a
    non-positive is NULL, SQRT/ASIN/ACOS out of domain is NaN, COT(0)
    is +inf, SIGN returns DOUBLE."""

    EXPRS = [
        "sqrt(price)",
        "sqrt(price - 3)",          # -2..1: NaN branch
        "round(exp(sign(qty - 2)), 6)",
        "ln(price - 2)",            # -1..2: NULL-log branch
        "log10(qty)",
        "round(degrees(atan2(qty, price)), 6)",
        "round(sin(price) + cos(qty) + tan(price), 6)",
        "round(asin(price - 3) + atan(qty), 6)",  # asin domain edges
        "round(sinh(sign(price)) + cosh(1) + tanh(qty), 6)",
        "round(cot(price), 6)",
        "radians(qty * 90)",
    ]

    def test_spark_matches_row_eval_over_full_domain(self, spark):
        import itertools

        from pyspark.sql import functions as F

        from logstash_filter_jdbc_static_spark.operators import (
            sqlexpr as X,
        )
        from logstash_filter_jdbc_static_spark.operators.lookup import (
            _tokenize_where,
        )

        rows = [
            {"price": p, "qty": q}
            for p, q in itertools.product(
                [1, 2, 3, 4, None], [1, 2, 3, None]
            )
        ]
        df = spark.createDataFrame(
            [(r["price"], r["qty"]) for r in rows],
            "price: int, qty: int",
        )
        asts = []
        for e in self.EXPRS:
            toks = _tokenize_where(e)
            ep = X.ExprParser(toks, 0, resolve_col=lambda n: n)
            ast = ep.parse()
            assert ep.i == len(toks), e
            asts.append(ast)
        got = df.select(
            *[
                X.compile_expr(a).alias(f"e{i}")
                for i, a in enumerate(asts)
            ]
        ).collect()
        for row, spark_row in zip(rows, got):
            for i, (e, a) in enumerate(zip(self.EXPRS, asts)):
                sv = spark_row[f"e{i}"]
                pv = X.eval_expr(a, row)
                if sv is None or pv is None:
                    assert sv is None and pv is None, (e, row, sv, pv)
                elif isinstance(sv, float) and sv != sv:  # NaN
                    assert pv != pv, (e, row, sv, pv)
                elif isinstance(sv, float):
                    # JVM Math.* and C libm may differ in the final
                    # ulp on transcendentals (seen live: exp(1.0));
                    # the contract tells users to round() projected
                    # transcendentals, and all these EXPRS do — the
                    # tolerance here only covers a HALF-UP tie flip
                    # ON that last ulp
                    import math as _m

                    assert sv == pv or _m.isclose(
                        sv, pv, rel_tol=1e-12, abs_tol=1e-12
                    ), (e, row, sv, pv)
                else:
                    assert sv == pv, (e, row, sv, pv)

    def test_wrong_arity_rejected(self):
        from logstash_filter_jdbc_static_spark.operators import (
            sqlexpr as X,
        )
        from logstash_filter_jdbc_static_spark.operators.lookup import (
            _tokenize_where,
        )

        with pytest.raises(ValidationError):
            X.ExprParser(
                _tokenize_where("atan2(price)"), 0,
                resolve_col=lambda n: n,
            ).parse()


class TestDateFuncs:
    """Derby's date/time extraction built-ins (round-5 late):
    YEAR/MONTH/DAY/HOUR/MINUTE/SECOND — Derby has no EXTRACT, these
    ARE its extraction surface. Spark semantics pinned live where the
    engines differ: HOUR/MINUTE/SECOND of a DATE is 0 (implicit
    midnight; Derby raises), SECOND truncates the fraction; all
    return INTEGER."""

    EXPRS = [
        "year(d)",
        "month(d)",
        "day(d)",
        "hour(ts)",
        "minute(ts)",
        "second(ts)",
        "hour(d)",                      # DATE -> 0 (Spark semantics)
        "minute(d) + second(d)",        # both 0
        "year(d) * 100 + month(d)",     # composition with arithmetic
        "case when day(d) > 15 then 'late' else 'early' end",
        "year(ts) - year(d)",
    ]

    def test_spark_matches_row_eval_over_dates(self, spark):
        import datetime

        from logstash_filter_jdbc_static_spark.operators import (
            sqlexpr as X,
        )
        from logstash_filter_jdbc_static_spark.operators.lookup import (
            _tokenize_where,
        )

        dates = [
            datetime.date(2024, 2, 29),   # leap day
            datetime.date(1999, 12, 31),
            datetime.date(2001, 1, 1),
            None,
        ]
        stamps = [
            datetime.datetime(2023, 7, 4, 15, 30, 45, 678000),  # frac
            datetime.datetime(2024, 1, 1, 0, 0, 0),
            datetime.datetime(1970, 6, 15, 23, 59, 59),
            None,
        ]
        rows = [
            {"d": d, "ts": ts} for d in dates for ts in stamps
        ]
        df = spark.createDataFrame(
            [(r["d"], r["ts"]) for r in rows], "d: date, ts: timestamp"
        )
        asts = []
        for e in self.EXPRS:
            toks = _tokenize_where(e)
            ep = X.ExprParser(toks, 0, resolve_col=lambda n: n)
            ast = ep.parse()
            assert ep.i == len(toks), e
            asts.append(ast)
        got = df.select(
            *[X.compile_expr(a).alias(f"e{i}") for i, a in enumerate(asts)]
        ).collect()
        for row, spark_row in zip(rows, got):
            for i, (e, a) in enumerate(zip(self.EXPRS, asts)):
                sv = spark_row[f"e{i}"]
                pv = X.eval_expr(a, row)
                assert sv == pv, (e, row, sv, pv)


class TestConversionFunctions:
    """Derby's conversion FUNCTIONS (round-5 latest): DATE, TIMESTAMP,
    INTEGER, BIGINT, SMALLINT, DOUBLE, VARCHAR — function-spelled
    CASTs, desugared to Cast nodes at parse (legality pinned natively
    in test_jdbc_derby.py). CHAR() is deliberately NOT mapped: Derby
    right-pads it to a fixed width, which a plain string cast cannot
    mirror."""

    def test_parse_desugars_to_cast(self):
        toks_of = __import__(
            "logstash_filter_jdbc_static_spark.operators.lookup",
            fromlist=["_tokenize_where"],
        )._tokenize_where
        ep = sqlexpr.ExprParser(
            toks_of("INTEGER(price) + BIGINT(qty)"), 0,
            resolve_col=lambda n: n,
        )
        ast = ep.parse()
        assert ast == sqlexpr.Bin(
            "+",
            sqlexpr.Cast(sqlexpr.Col("price"), "int"),
            sqlexpr.Cast(sqlexpr.Col("qty"), "bigint"),
        )

    def test_char_not_mapped(self):
        toks_of = __import__(
            "logstash_filter_jdbc_static_spark.operators.lookup",
            fromlist=["_tokenize_where"],
        )._tokenize_where
        with pytest.raises(ValidationError, match="unknown function"):
            sqlexpr.ExprParser(
                toks_of("CHAR(price)"), 0, resolve_col=lambda n: n
            ).parse()

    EXPRS = [
        "DATE('2024-02-29')",
        "TIMESTAMP('2024-03-01 15:30:45')",
        "DATE(ts)",                      # timestamp -> its date part
        "INTEGER('42') + 1",
        "INTEGER(d2) * 2",               # double -> truncates (Spark/Derby)
        "BIGINT(n) * 1000000",
        "SMALLINT(n) - 1",
        "DOUBLE(n) / 4",
        "VARCHAR(s) || '!'",
        "year(DATE(ts))",                # composition with extraction
    ]

    def test_spark_matches_row_eval(self, spark):
        import datetime

        from logstash_filter_jdbc_static_spark.operators.lookup import (
            _tokenize_where,
        )

        rows = [
            {"ts": datetime.datetime(2023, 7, 4, 15, 30, 45),
             "n": 7, "d2": 2.9, "s": "ab"},
            {"ts": datetime.datetime(2024, 2, 29, 0, 0, 0),
             "n": -3, "d2": -2.9, "s": ""},
            {"ts": None, "n": None, "d2": None, "s": None},
        ]
        df = spark.createDataFrame(
            [(r["ts"], r["n"], r["d2"], r["s"]) for r in rows],
            "ts: timestamp, n: int, d2: double, s: string",
        )
        asts = []
        for e in self.EXPRS:
            toks = _tokenize_where(e)
            ep = sqlexpr.ExprParser(toks, 0, resolve_col=lambda n: n)
            ast = ep.parse()
            assert ep.i == len(toks), e
            asts.append(ast)
        got = df.select(
            *[
                sqlexpr.compile_expr(a).alias(f"e{i}")
                for i, a in enumerate(asts)
            ]
        ).collect()
        for row, spark_row in zip(rows, got):
            for i, (e, a) in enumerate(zip(self.EXPRS, asts)):
                sv = spark_row[f"e{i}"]
                pv = sqlexpr.eval_expr(a, row)
                assert sv == pv, (e, row, sv, pv)

    def test_conversion_in_lookup_all_paths(self, spark):
        dim = spark.createDataFrame(
            [("t1", "10"), ("t1", "4"), ("t2", "7")],
            "tool string, price_s string",
        )
        spec = PipelineSpec(
            lookups=[
                {
                    "id": "x",
                    "query": (
                        "SELECT INTEGER(price_s) AS p FROM d "
                        "WHERE tool = :tool AND INTEGER(price_s) > 5"
                    ),
                    "parameters": {"tool": "tool"},
                }
            ]
        )
        fact = spark.createDataFrame(
            [("c0", 0, "t1"), ("c1", 1, "t2"), ("c2", 2, "t9")],
            "conv_id string, turn_idx int, tool string",
        )
        for kw in (
            {},
            {"inline_threshold": 0, "pattern_strategy": "broadcast_map"},
            {"inline_threshold": 0, "pattern_strategy": "shuffle_map"},
        ):
            out = LookupEnricher(spec, {"d": dim}, **kw).apply(fact)
            got = {
                r["turn_idx"]: (
                    None if r["x"] is None
                    else sorted(d["p"] for d in r["x"])
                )
                for r in out.collect()
            }
            assert got == {0: [10], 1: [7], 2: []}, (kw, got)

    def test_param_inside_conversion(self, spark):
        # cross-feature: a param INSIDE a conversion function is a
        # param_expr (the Derby-faithful CAST spelling has the same
        # shape — test_jdbc_derby.py pins the LONG VARCHAR quirk)
        q = parse_lookup_query(
            "SELECT a FROM t WHERE n = INTEGER(:x) + 1"
        )
        (p,) = q.disjuncts[0]
        assert p.terms[0].kind == "param_expr"
        assert p.param_names == ["x"]


class TestFullTrimSyntax:
    """Derby's full ``TRIM([BOTH|LEADING|TRAILING] [char] FROM expr)``
    (Derby ref manual; round-5 latest). The trim character is pinned
    to a SINGLE-CHAR string literal at parse: Derby raises on longer
    ones at runtime while Spark/DuckDB trim a character SET, so the
    restriction keeps the engines agreeing by construction. Compiled
    as an anchored regexp_replace with a \\Q..\\E-quoted char."""

    @staticmethod
    def _parse(text):
        from logstash_filter_jdbc_static_spark.operators.lookup import (
            _tokenize_where,
        )

        return sqlexpr.ExprParser(
            _tokenize_where(text), 0, resolve_col=lambda n: n
        ).parse()

    def test_parse_shapes(self):
        ast = self._parse("TRIM(BOTH 'x' FROM name)")
        assert ast == sqlexpr.Func(
            "trim_both", (sqlexpr.Col("name"), sqlexpr.Lit("x"))
        )
        ast = self._parse("TRIM(LEADING '.' FROM name)")
        assert ast.name == "trim_leading"
        ast = self._parse("TRIM(TRAILING FROM name)")
        assert ast == sqlexpr.Func(
            "trim_trailing", (sqlexpr.Col("name"), sqlexpr.Lit(" "))
        )
        # char defaulting and FROM-less plain forms
        ast = self._parse("TRIM('x' FROM name)")
        assert ast.name == "trim_both"
        ast = self._parse("TRIM(name)")
        assert ast == sqlexpr.Func("trim", (sqlexpr.Col("name"),))
        ast = self._parse("TRIM('  padded  ')")
        assert ast == sqlexpr.Func("trim", (sqlexpr.Lit("  padded  "),))

    def test_multichar_trim_char_rejected(self):
        with pytest.raises(ValidationError, match="single-character"):
            self._parse("TRIM(BOTH 'xy' FROM name)")

    def test_eval_matches_python_semantics(self):
        row = {"name": "xxv1xx"}
        for text, exp in [
            ("TRIM(BOTH 'x' FROM name)", "v1"),
            ("TRIM(LEADING 'x' FROM name)", "v1xx"),
            ("TRIM(TRAILING 'x' FROM name)", "xxv1"),
        ]:
            ast = self._parse(text)
            assert sqlexpr.eval_expr(ast, row) == exp
        # NULL propagates
        ast = self._parse("TRIM(BOTH 'x' FROM name)")
        assert sqlexpr.eval_expr(ast, {"name": None}) is None

    def test_lookup_end_to_end_all_modes(self, spark):
        rows = [
            ("k1", "xxv1xx"), ("k2", "..v2"), ("k3", "v3.."),
            ("k1", " v4 "), ("k9", ".x."),
        ]
        dims = {"s": spark.createDataFrame(rows, "ip string, name string")}
        tables = {"s": [{"ip": i, "name": n} for i, n in rows]}
        for q in [
            "SELECT TRIM(BOTH 'x' FROM name) AS t FROM s WHERE ip = :ip",
            "SELECT TRIM(LEADING '.' FROM name) AS t FROM s WHERE ip = :ip",
            "SELECT TRIM(TRAILING '.' FROM name) AS t FROM s "
            "WHERE ip = :ip",
            "SELECT TRIM(BOTH FROM name) AS t FROM s WHERE ip = :ip",
            "SELECT name AS t FROM s "
            "WHERE TRIM(BOTH 'x' FROM name) = 'v1' AND ip = :ip",
            # a regex METACHAR as the trim char (the \\Q..\\E quoting)
            "SELECT TRIM(BOTH '.' FROM name) AS t FROM s WHERE ip = :ip",
        ]:
            lookup = {"id": "u", "query": q, "parameters": {"ip": "ip"}}
            facts = spark.createDataFrame(
                [("k1",), ("k2",), ("k3",), ("k9",)], "ip: string"
            )
            out = LookupEnricher(
                PipelineSpec(lookups=[dict(lookup)]), dims
            ).apply(facts)
            got = {
                r["ip"]: [d["t"] for d in r["u"]] for r in out.collect()
            }
            for ip in ("k1", "k2", "k3", "k9"):
                ev = {"ip": ip}
                oracle.enhance(
                    ev, PipelineSpec(lookups=[dict(lookup)]), tables
                )
                exp = [d["t"] for d in ev["u"]]
                assert got[ip] == exp, (q, ip, got[ip], exp)
