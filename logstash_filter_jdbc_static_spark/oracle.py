"""Row-at-a-time pure-Python reference implementation of the lookup
semantics (lookup.rb:83-104) — the third, independent oracle used by
property-based tests: Spark (set-oriented) vs this (per-event, like the
JRuby original) must agree row-for-row.
"""

from __future__ import annotations

import functools
import re
from typing import Any

from logstash_filter_jdbc_static_spark.operators.lookup import (
    SetOpGroup,
    _remap_having_aliases,
    _split_setop_raw,
    extract_derived_tables,
    has_subqueries,
    parse_lookup_query,
    parse_setop_tree,
    split_union_tail,
    strip_outer_parens,
)
from logstash_filter_jdbc_static_spark.operators.sqlexpr import (
    Lit,
    eval_expr,
    subst_params,
)
from logstash_filter_jdbc_static_spark.spec import (
    LookupSpec,
    PipelineSpec,
    is_sprintf,
)

_SPRINTF_SPLIT = re.compile(r"(%\{[^}]+\})")
_FIELD_REF = re.compile(r"\[([^\]]+)\]")


def _get_field(event: dict, ref: str) -> Any:
    segments = _FIELD_REF.findall(ref) or [ref]
    cur: Any = event
    for seg in segments:
        if not isinstance(cur, dict) or seg not in cur:
            return None
        cur = cur[seg]
    return cur


def _bind(event: dict, binding: str) -> tuple[Any, bool]:
    """Returns (value, valid) per Getfier/Sprintfier semantics."""
    if is_sprintf(binding):
        out = []
        for part in _SPRINTF_SPLIT.split(binding):
            if part.startswith("%{") and part.endswith("}"):
                v = _get_field(event, part[2:-1])
                if v is None:
                    return None, False  # sprintf found no field
                out.append(str(v))
            else:
                out.append(part)
        return "".join(out), True
    v = _get_field(event, binding)
    if v is None or isinstance(v, (dict, list)):
        return None, False  # nil/Hash/Array invalid (lookup.rb:28-35)
    return v, True


def _like(value: str, pattern: str, escape: str | None = None) -> bool:
    """SQL LIKE with optional ESCAPE (round-5 latest): an escaped
    wildcard/escape char matches literally; a trailing lone escape
    matches itself (the compiled side's documented superset of
    Derby's 22025 error)."""
    rx = "^"
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if escape is not None and ch == escape and i + 1 < len(pattern):
            rx += re.escape(pattern[i + 1])
            i += 2
            continue
        if ch == "%":
            rx += ".*"
        elif ch == "_":
            rx += "."
        else:
            rx += re.escape(ch)
        i += 1
    rx += "$"
    return re.match(rx, value) is not None


_LHS_FUNCS = {
    # the string funcs cast-through like Spark's implicit cast-to-string
    "lower": lambda v: str(v).lower(),
    "upper": lambda v: str(v).upper(),
    "trim": lambda v: str(v).strip(),
    "ltrim": lambda v: str(v).lstrip(),
    "rtrim": lambda v: str(v).rstrip(),
    "length": lambda v: len(str(v)),
    "abs": abs,
}


def _coerce_pair(lhs, rhs):
    """Mirror Spark's implicit numeric<->string comparison coercion: a
    str compared against an int/float is cast numerically; a failed
    cast compares as no-match (null semantics). Approximate — exotic
    cross-type pairs should not appear in lookup configs."""
    if isinstance(lhs, str) and isinstance(rhs, (int, float)) and not isinstance(rhs, bool):
        try:
            return float(lhs), float(rhs)
        except ValueError:
            return None, rhs
    if isinstance(rhs, str) and isinstance(lhs, (int, float)) and not isinstance(lhs, bool):
        try:
            return float(lhs), float(rhs)
        except ValueError:
            return lhs, None
    return lhs, rhs


def _pred_match(p, row: dict, params: dict) -> bool:
    """One predicate under SQL three-valued semantics collapsed to a
    filter boolean (NULL comparisons -> row dropped), mirroring what
    Derby/Spark/DuckDB filters all do."""
    lhs = row.get(p.dim_column)
    if lhs is not None and p.func:
        lhs = _LHS_FUNCS[p.func](lhs)
    if p.op == "is null":
        return lhs is None
    if p.op == "is not null":
        return lhs is not None
    vals = []
    for t in p.terms:
        if t.kind == "param":
            vals.append(params[t.value])
        elif t.kind == "column":
            # static dim-side comparand (a = b + 1) / HAVING alias rhs:
            # read the other field off the same row
            vals.append(row.get(t.value))
        elif t.kind == "column_set":
            # nested correlated IN/quantified (round-5 latest): the
            # row carries its per-row value LIST — expand it as the
            # comparison set (NULLs kept for exact 3VL)
            vals.extend(dict.fromkeys(row.get(t.value) or []))
        elif t.kind == "param_expr":
            # fact-side param expression (round-5 latest): substitute
            # the event's bound values, then evaluate — the mirror of
            # the compiled subst_params(-> bound Column) path
            vals.append(
                eval_expr(
                    subst_params(t.value, lambda n: Lit(params[n])), {}
                )
            )
        elif t.kind == "mixed_expr":
            # mixed dim+param expression (round-5 latest: a = b + :k):
            # params substitute as literals, dim columns read off THIS
            # row — the mirror of the compiled theta-probe evaluation
            vals.append(
                eval_expr(
                    subst_params(t.value, lambda n: Lit(params[n])), row
                )
            )
        else:
            vals.append(t.value)
    if p.op in ("in", "not in") and not vals:
        # empty IN-subquery set: IN () FALSE, NOT IN () TRUE — decided
        # before the NULL-lhs check (no comparisons happen)
        return p.op == "not in"
    if p.op.endswith((" all", " any")) and not vals:
        # quantified comparison over the empty set: ALL vacuously TRUE,
        # ANY FALSE — likewise decided even for a NULL lhs
        return p.op.endswith(" all")
    if lhs is None:
        return False

    # Three-valued comparison helpers: None == SQL NULL (failed numeric
    # coercion, mirroring Spark's NULL-yielding cast). NULL must stay
    # NULL through negated ops — 'abc' <> 5 is NULL (row dropped), NOT
    # "abc didn't equal 5". Collapsing to False before the negation
    # would flip dropped rows into matches.
    def eq3(v) -> bool | None:
        left, right = _coerce_pair(lhs, v)
        if left is None or right is None:
            return None
        return left == right

    def ordered3(v, op_fn) -> bool | None:
        left, right = _coerce_pair(lhs, v)
        if left is None or right is None:
            return None
        return op_fn(left, right)

    if p.op.endswith((" all", " any")):
        # quantified comparison (non-empty set; NULL lhs already
        # dropped above): ALL matches iff every comparison is TRUE —
        # any FALSE or UNKNOWN (NULL value / failed coercion) drops;
        # ANY matches iff some comparison is TRUE
        base, quant = p.op.split(" ")
        cmp_of = {
            "=": eq3,
            "<>": lambda v: (lambda e: None if e is None else not e)(
                eq3(v)
            ),
            "<": lambda v: ordered3(v, lambda a, b: a < b),
            "<=": lambda v: ordered3(v, lambda a, b: a <= b),
            ">": lambda v: ordered3(v, lambda a, b: a > b),
            ">=": lambda v: ordered3(v, lambda a, b: a >= b),
        }[base]
        cmps = [None if v is None else cmp_of(v) for v in vals]
        if quant == "all":
            return all(c is True for c in cmps)
        return any(c is True for c in cmps)
    if p.op == "=":
        return vals[0] is not None and eq3(vals[0]) is True
    if p.op == "<>":
        return vals[0] is not None and eq3(vals[0]) is False
    if p.op == "like":
        return vals[0] is not None and _like(
            str(lhs), str(vals[0]), p.like_escape
        )
    if p.op == "not like":
        return vals[0] is not None and not _like(
            str(lhs), str(vals[0]), p.like_escape
        )
    if p.op == "in":
        return any(v is not None and eq3(v) is True for v in vals)
    if p.op == "not in":
        # x NOT IN (..) is a conjunction of <>; any NULL comparison
        # (NULL term or failed coercion) makes it NULL -> no match
        if any(v is None for v in vals):
            return False
        cmps = [eq3(v) for v in vals]
        return all(c is False for c in cmps)
    if p.op in ("between", "not between"):
        lo, hi = vals
        if lo is None or hi is None:
            return False
        ge_lo = ordered3(lo, lambda a, b: a >= b)
        le_hi = ordered3(hi, lambda a, b: a <= b)
        if p.op == "between":
            return ge_lo is True and le_hi is True
        # NOT BETWEEN under 3VL: NULL comparand -> NULL unless the
        # other bound already decides TRUE (x < lo OR x > hi)
        if ge_lo is False or le_hi is False:
            return True
        if ge_lo is None or le_hi is None:
            return False
        return False
    if vals[0] is None:
        return False
    if p.op == "<":
        return ordered3(vals[0], lambda a, b: a < b) is True
    if p.op == ">":
        return ordered3(vals[0], lambda a, b: a > b) is True
    if p.op == "<=":
        return ordered3(vals[0], lambda a, b: a <= b) is True
    return ordered3(vals[0], lambda a, b: a >= b) is True


def _payload_sort_key(r: dict) -> list:
    """Mirror of Spark's ``sort_array`` struct ordering for the default
    (no ORDER BY) payload contract: field-wise ascending with NULL as
    the SMALLEST value (verified against Spark 4: a null field sorts
    before every non-null value)."""
    return [(v is not None, v) for v in r.values()]


def _payload_cmp(order_by):
    """Comparator over PAYLOAD rows (alias-keyed dicts) for grouped/
    aggregate ORDER BY: named keys under Derby's result-order semantics
    (NULL sorts as the LARGEST value — nulls last ASC, nulls first
    DESC), then an all-field tiebreak in payload order under the same
    convention — the mirror of the compiled ``_order_comparator`` over
    payload-shaped elements."""

    def cmp(a: dict, b: dict) -> int:
        for col, asc in order_by:
            ka, kb = a.get(col), b.get(col)
            if ka is None and kb is None:
                c = 0
            elif ka is None:
                c = 1
            elif kb is None:
                c = -1
            else:
                c = -1 if ka < kb else (1 if ka > kb else 0)
            if not asc:
                c = -c
            if c:
                return c
        ta = [(v is None, v if v is not None else 0) for v in a.values()]
        tb = [(v is None, v if v is not None else 0) for v in b.values()]
        return -1 if ta < tb else (1 if ta > tb else 0)

    return cmp


def _matched_cmp(order_by):
    """Comparator over (dim row, projected row) pairs for plain-row
    ORDER BY: keys read off the DIM row (ORDER BY columns need not be
    projected), Derby result-order semantics (NULL largest),
    full-projected-payload tiebreak — the mirror of the compiled
    ``_order_comparator``."""

    def cmp(a, b):
        for col, asc in order_by:
            ka, kb = a[0].get(col), b[0].get(col)
            if ka is None and kb is None:
                c = 0
            elif ka is None:
                c = 1
            elif kb is None:
                c = -1
            else:
                c = -1 if ka < kb else (1 if ka > kb else 0)
            if not asc:
                c = -c
            if c:
                return c
        ta = [(v is None, v) for v in a[1].values()]
        tb = [(v is None, v) for v in b[1].values()]
        return -1 if ta < tb else (1 if ta > tb else 0)

    return cmp


def _slice_rows(rows: list[dict], q) -> list[dict]:
    """OFFSET/LIMIT slice of already-ordered payload rows (SQL clause
    order: after HAVING and ORDER BY)."""
    start = q.offset or 0
    if q.limit is not None:
        return rows[start:start + q.limit]
    if start:
        return rows[start:]
    return rows


def _corr_eq_vals(a, b) -> bool:
    left, right = _coerce_pair(a, b)
    return left is not None and right is not None and left == right


_CMP_OF = {
    "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
}


def _corr_ineq_vals(ineq, s: dict, r: dict) -> bool:
    """Inequality-correlation match (round-5 latest): every
    ``sub_col <op> outer_col`` triple must hold; a NULL on either
    side compares unknown -> no match (SQL 3VL)."""
    for sc, op, oc in ineq:
        left, right = _coerce_pair(s.get(sc), r.get(oc))
        if left is None or right is None or not _CMP_OF[op](left, right):
            return False
    return True


def _sub_rows(sq, tables: dict[str, list[dict]], _depth: int = 0) -> list[dict]:
    """The subquery's source rows — computed columns materialized,
    static WHERE applied, nested subqueries resolved (uncorrelated ->
    literal; correlated to THIS scope -> a per-row ``__nsq*`` value,
    the mirror of the compiled per-group join onto the sub frame,
    round-5 latest)."""
    from logstash_filter_jdbc_static_spark.operators.lookup import (
        _Predicate,
        _Term,
    )

    if _depth > 8:
        raise ValueError("lookup subquery: nesting deeper than 8 levels")
    rows = tables[sq.table]
    if sq.computed:
        rows = [
            {**r, **{n: eval_expr(a, r) for n, a in sq.computed}}
            for r in rows
        ]
    state = {"rows": rows, "n": 0}

    def _per_row_group(inner, rr: dict) -> list:
        """Matching inner-subquery rows for ONE enclosing-frame row
        (nested EXISTS/IN/scalar, round-5 latest) — equality AND
        inequality correlations, both against the ENCLOSING row."""
        sub = _sub_rows(inner, tables, _depth + 1)
        return [
            s
            for s in sub
            if all(
                _corr_eq_vals(s.get(sc), rr.get(oc))
                for sc, oc in inner.corr
            )
            and _corr_ineq_vals(inner.ineq, s, rr)
        ]

    def _outer_exprs_applied(inner, r: dict) -> dict:
        rr = dict(r)
        for oe_name, ast in inner.outer_exprs:
            if oe_name not in rr:
                rr[oe_name] = eval_expr(ast, rr)
        return rr

    def fix(p):
        if not any(t.kind == "subquery" for t in p.terms):
            return p
        if p.op in ("exists", "not exists"):
            # nested [NOT] EXISTS (round-5 latest): a per-row boolean
            # flag — the row-at-a-time twin of the compiled semi-join
            # flag on the enclosing sub frame
            inner = p.terms[0].value
            name = f"__nsqx{state['n']}"
            state["n"] += 1
            new_rows = []
            for r in state["rows"]:
                rr = _outer_exprs_applied(inner, r)
                rr[name] = bool(_per_row_group(inner, rr))
                new_rows.append(rr)
            state["rows"] = new_rows
            return _Predicate(
                name, "=", [_Term("literal", p.op == "exists")]
            )
        if (
            len(p.terms) == 1
            and p.terms[0].kind == "subquery"
            and p.terms[0].value.func == "__values"
        ):
            inner = p.terms[0].value
            if inner.corr:
                # nested correlated [NOT] IN / quantified (round-5
                # latest): per-row value LIST column — _pred_match
                # reads a "column" term holding a list as the expanded
                # value set (same 3VL as the literal expansion)
                name = f"__nsqv{state['n']}"
                state["n"] += 1
                new_rows = []
                for r in state["rows"]:
                    rr = _outer_exprs_applied(inner, r)
                    rr[name] = [
                        s.get(inner.col)
                        for s in _per_row_group(inner, rr)
                    ]
                    new_rows.append(rr)
                state["rows"] = new_rows
                return _Predicate(
                    p.dim_column, p.op, [_Term("column_set", name)],
                    func=p.func,
                )
            vals = list(
                dict.fromkeys(
                    s.get(inner.col)
                    for s in _sub_rows(inner, tables, _depth + 1)
                )
            )
            return _Predicate(
                p.dim_column,
                p.op,
                [_Term("literal", v) for v in vals],
                func=p.func,
            )
        terms = []
        for t in p.terms:
            if t.kind != "subquery":
                terms.append(t)
                continue
            inner = t.value
            if not inner.corr and not inner.ineq:
                terms.append(
                    _Term(
                        "literal",
                        _eval_subquery_rows(inner, tables, _depth + 1),
                    )
                )
                continue
            name = f"__nsq{state['n']}"
            state["n"] += 1
            sub = _sub_rows(inner, tables, _depth + 1)
            new_rows = []
            for r in state["rows"]:
                rr = _outer_exprs_applied(inner, r)
                grp = [
                    s
                    for s in sub
                    if all(
                        _corr_eq_vals(s.get(sc), rr.get(oc))
                        for sc, oc in inner.corr
                    )
                    and _corr_ineq_vals(inner.ineq, s, rr)
                ]
                rr[name] = _agg_rows(inner, grp)
                new_rows.append(rr)
            state["rows"] = new_rows
            terms.append(_Term("column", name))
        return _Predicate(p.dim_column, p.op, terms, func=p.func)

    where = [[fix(p) for p in d] for d in sq.where]
    rows = state["rows"]
    if where:
        rows = [
            r
            for r in rows
            if any(all(_pred_match(p, r, {}) for p in d) for d in where)
        ]
    return rows


def _agg_rows(sq, rows: list[dict]):
    """SQL aggregate semantics over the matched sub rows."""
    if sq.func == "count" and sq.col is None:
        return len(rows)
    vals = [r.get(sq.col) for r in rows]
    nonnull = [v for v in vals if v is not None]
    if sq.func == "count":
        return len(nonnull)
    if sq.func == "count_distinct":
        return len(set(nonnull))
    if not nonnull:
        return None  # SQL: sum/avg/min/max over empty or all-NULL -> NULL
    if sq.func == "sum":
        return sum(nonnull)
    if sq.func == "avg":
        return sum(nonnull) / len(nonnull)
    if sq.func == "sum_distinct":
        return sum(set(nonnull))
    if sq.func == "avg_distinct":
        d = set(nonnull)
        return sum(d) / len(d)
    return min(nonnull) if sq.func == "min" else max(nonnull)


def _eval_subquery_rows(sq, tables: dict[str, list[dict]], _depth: int = 0):
    """Row-at-a-time twin of lookup._eval_subquery: one scalar from an
    UNCORRELATED aggregate subquery over the dict-row tables."""
    if sq.corr:
        raise ValueError(
            "lookup subquery: correlated subqueries cannot nest"
        )
    if sq.func == "__values":
        raise ValueError("lookup subquery: IN-subqueries cannot nest")
    return _agg_rows(sq, _sub_rows(sq, tables, _depth))


def _resolve_subqueries_rows(
    q, tables: dict[str, list[dict]], probe_rows: list[dict]
):
    """Oracle-side resolve_subqueries_with_dim: uncorrelated subquery
    terms become literals; correlated ones become synthetic columns on
    the probed rows — each row gets the aggregate over the sub rows
    matching its correlation keys (the row-at-a-time mirror of the
    compiled per-group left join). Returns (query, probe rows)."""
    import dataclasses

    from logstash_filter_jdbc_static_spark.operators.lookup import (
        _Predicate,
        _Term,
    )

    state = {"rows": probe_rows, "cache": []}

    def corr_eq(a, b) -> bool:
        left, right = _coerce_pair(a, b)
        return left is not None and right is not None and left == right

    _CMP = {
        "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
    }

    def ineq_match(sq, s: dict, r: dict) -> bool:
        for sc, op, oc in sq.ineq:
            left, right = _coerce_pair(s.get(sc), r.get(oc))
            if left is None or right is None:
                return False  # NULL comparison is unknown -> no match
            if not _CMP[op](left, right):
                return False
        return True

    def ensure_outer_rows(sq) -> None:
        """Row-at-a-time twin of the compiled ensure_outer_cols: the
        subquery's OUTER-side correlation expressions evaluate onto
        each probe row before any correlation match reads them."""
        for name, ast in sq.outer_exprs:
            if state["rows"] and name in state["rows"][0]:
                continue
            state["rows"] = [
                {**r, name: eval_expr(ast, r)} for r in state["rows"]
            ]

    def term_of(t):
        sq = t.value
        if sq.param_corr or sq.param_theta:
            # parameterized subquery (round-5 latest): its value binds
            # per EVENT — deferred to _resolve_param_subqueries_rows,
            # which runs after param binding
            return t
        if not sq.corr and not sq.ineq:
            return _Term("literal", _eval_subquery_rows(sq, tables))
        for k, name in state["cache"]:
            if k == sq:
                return _Term("column", name)
        ensure_outer_rows(sq)
        name = f"__sq_corr{len(state['cache'])}"
        sub = _sub_rows(sq, tables)
        state["rows"] = [
            {
                **r,
                name: _agg_rows(
                    sq,
                    [
                        s
                        for s in sub
                        if all(
                            corr_eq(s.get(sc), r.get(oc))
                            for sc, oc in sq.corr
                        )
                        and ineq_match(sq, s, r)
                    ],
                ),
            }
            for r in state["rows"]
        ]
        state["cache"].append((sq, name))
        return _Term("column", name)

    def _lhs_of(p, r: dict):
        lhs = r.get(p.dim_column)
        if lhs is not None and p.func:
            lhs = _LHS_FUNCS[p.func](lhs)
        return lhs

    def exists_col_of(sq) -> str:
        """Row-at-a-time twin of lookup.exists_col_of: a boolean
        synthetic column per probe row (constant when uncorrelated;
        inequality correlations evaluated directly per row — the
        compiled side's per-group extremum rewrite must agree)."""
        for k, name in state["cache"]:
            if k == ("exists", sq):
                return name
        ensure_outer_rows(sq)
        name = f"__sq_exists{len(state['cache'])}"
        sub = _sub_rows(sq, tables)
        cmp_of = {
            "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
            ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
        }

        def ineq_ok(s, r) -> bool:
            for sc, op, oc in sq.ineq:
                left, right = _coerce_pair(s.get(sc), r.get(oc))
                if left is None or right is None:
                    return False  # NULL comparison is unknown -> no witness
                if not cmp_of[op](left, right):
                    return False
            return True

        if not sq.corr and not sq.ineq:
            flag = bool(sub)
            state["rows"] = [{**r, name: flag} for r in state["rows"]]
        else:
            state["rows"] = [
                {
                    **r,
                    name: any(
                        all(
                            corr_eq(s.get(sc), r.get(oc))
                            for sc, oc in sq.corr
                        )
                        and ineq_ok(s, r)
                        for s in sub
                    ),
                }
                for r in state["rows"]
            ]
        state["cache"].append((("exists", sq), name))
        return name

    def corr_in_col_of(p) -> str:
        """Row-at-a-time twin of lookup.in_group_cols_of, collapsed to
        the final filter boolean per probe row (the Spark side keeps
        set/had-null/count columns and compiles the ``in_set`` op; the
        semantics here must match _pred_column_condition's)."""
        sq = p.terms[0].value
        key = ("corr_in", sq, p.dim_column, p.func, p.op)
        for k, name in state["cache"]:
            if k == key:
                return name
        ensure_outer_rows(sq)
        name = f"__sq_in{len(state['cache'])}"
        sub = _sub_rows(sq, tables)
        new_rows = []
        for r in state["rows"]:
            grp = [
                s.get(sq.col)
                for s in sub
                if all(corr_eq(s.get(sc), r.get(oc)) for sc, oc in sq.corr)
                and ineq_match(sq, s, r)
            ]
            nonnull = [v for v in grp if v is not None]
            has_null = len(nonnull) < len(grp)
            lhs = _lhs_of(p, r)

            def eq(v, lhs=lhs):
                left, right = _coerce_pair(lhs, v)
                return left is not None and right is not None and left == right

            member = lhs is not None and any(eq(v) for v in nonnull)
            if p.op == "in":
                flag = member
            else:  # not in: TRUE iff empty group, else no NULLs + no match
                flag = not grp or (
                    lhs is not None and not has_null and not member
                )
            new_rows.append({**r, name: flag})
        state["rows"] = new_rows
        state["cache"].append((key, name))
        return name

    def quant_col_of(p) -> str:
        """Row-at-a-time twin of the compiled correlated quantified
        comparison (``{cmp} {all|any}_set`` on set/had-null/count
        columns), collapsed to the final filter boolean per probe
        row."""
        sq = p.terms[0].value
        key = ("quant", sq, p.dim_column, p.func, p.op)
        for k, name in state["cache"]:
            if k == key:
                return name
        ensure_outer_rows(sq)
        name = f"__sq_q{len(state['cache'])}"
        base, quant = p.op.split(" ")
        new_rows = []
        sub = _sub_rows(sq, tables)
        for r in state["rows"]:
            grp = [
                s.get(sq.col)
                for s in sub
                if all(corr_eq(s.get(sc), r.get(oc)) for sc, oc in sq.corr)
                and ineq_match(sq, s, r)
            ]
            nonnull = [v for v in grp if v is not None]
            has_null = len(nonnull) < len(grp)
            lhs = _lhs_of(p, r)

            def cmp3(v, lhs=lhs):
                left, right = _coerce_pair(lhs, v)
                if left is None or right is None:
                    return None
                return {
                    "=": left == right, "<>": left != right,
                    "<": left < right, "<=": left <= right,
                    ">": left > right, ">=": left >= right,
                }[base]

            if quant == "all":
                # empty group vacuously TRUE; else every comparison
                # TRUE with nothing UNKNOWN (NULL lhs / NULL value)
                flag = not grp or (
                    lhs is not None
                    and not has_null
                    and all(cmp3(v) is True for v in nonnull)
                )
            else:
                flag = any(cmp3(v) is True for v in nonnull)
            new_rows.append({**r, name: flag})
        state["rows"] = new_rows
        state["cache"].append((key, name))
        return name

    # correlated HAVING subqueries (round-5 latest): the mirror of the
    # compiled hidden ``max(__sq_corrN) AS __hsq{k}`` aggregate — the
    # per-row correlated value rides into the GROUP row via a hidden
    # aggregate, read by the HAVING predicate, stripped by _group_rows
    hidden_aggs: list[tuple[str, str, str]] = []

    def having_set_col_of(sq) -> str:
        """Correlated [NOT] IN / quantified subquery in HAVING
        (round-5 latest, group keys validated by the compile): the
        group's raw value LIST rides into the group row as a hidden
        ``__hsq*`` max carrier (group-constant — every row in a group
        shares the correlation key values, so the per-row lists are
        identical); the predicate then expands it per GROUP row via a
        ``column_set`` term, same 3VL as the literal expansion."""
        key = ("having_set", sq)
        for k, name in state["cache"]:
            if k == key:
                return name
        ensure_outer_rows(sq)
        src = f"__sq_hset{len(state['cache'])}"
        sub = _sub_rows(sq, tables)
        state["rows"] = [
            {
                **r,
                src: [
                    s.get(sq.col)
                    for s in sub
                    if all(
                        corr_eq(s.get(sc), r.get(oc))
                        for sc, oc in sq.corr
                    )
                    and ineq_match(sq, s, r)
                ],
            }
            for r in state["rows"]
        ]
        name = f"__hsq{len(hidden_aggs)}"
        hidden_aggs.append((src, "max", name))
        state["cache"].append((key, name))
        return name

    def having_term_of(t):
        sq = t.value
        if not sq.corr and not sq.ineq:
            return term_of(t)
        base = term_of(t)  # attaches __sq_corrN to the probe rows
        for c0, _f0, n0 in hidden_aggs:
            if c0 == base.value:
                return _Term("column", n0)
        name = f"__hsq{len(hidden_aggs)}"
        hidden_aggs.append((base.value, "max", name))
        return _Term("column", name)

    def fix_pred(p, in_having: bool = False):
        if not any(t.kind == "subquery" for t in p.terms):
            return p
        if p.op in ("exists", "not exists"):
            if p.terms[0].value.param_corr or p.terms[0].value.param_theta:
                # params-only EXISTS in HAVING (round-5 latest): binds
                # per EVENT — deferred to the per-event resolver
                return p
            name = exists_col_of(p.terms[0].value)
            if in_having:
                # HAVING [NOT] EXISTS (round-5 latest): the
                # group-constant flag rides into the payload as a
                # hidden max aggregate, the compiled __hsq mirror
                for c0, _f0, n0 in hidden_aggs:
                    if c0 == name:
                        return _Predicate(
                            n0, "=", [_Term("literal", p.op == "exists")]
                        )
                hn = f"__hsq{len(hidden_aggs)}"
                hidden_aggs.append((name, "max", hn))
                return _Predicate(
                    hn, "=", [_Term("literal", p.op == "exists")]
                )
            return _Predicate(name, "=", [_Term("literal", p.op == "exists")])
        if (
            p.op.endswith((" all", " any"))
            and len(p.terms) == 1
            and p.terms[0].kind == "subquery"
            and p.terms[0].value.func == "__values"
        ):
            sq = p.terms[0].value
            if sq.param_corr or sq.param_theta:
                # parameterized: binds per EVENT — deferred to
                # _resolve_param_subqueries_rows, after param binding
                return p
            if sq.corr or sq.ineq:
                if in_having:
                    # round-5 latest: the per-group value list rides
                    # as a hidden max carrier into the group row
                    name = having_set_col_of(sq)
                    return _Predicate(
                        p.dim_column, p.op,
                        [_Term("column_set", name)], func=p.func,
                    )
                name = quant_col_of(p)
                return _Predicate(name, "=", [_Term("literal", True)])
            vals = list(
                dict.fromkeys(r.get(sq.col) for r in _sub_rows(sq, tables))
            )
            return _Predicate(
                p.dim_column,
                p.op,
                [_Term("literal", v) for v in vals],
                func=p.func,
            )
        if (
            p.op in ("in", "not in")
            and len(p.terms) == 1
            and p.terms[0].kind == "subquery"
            and p.terms[0].value.func == "__values"
        ):
            sq = p.terms[0].value
            if sq.param_corr or sq.param_theta:
                # parameterized: deferred to the per-event resolver
                return p
            if sq.corr or sq.ineq:
                if in_having:
                    # round-5 latest: same hidden-carrier mirror as
                    # the quantified HAVING branch
                    name = having_set_col_of(sq)
                    return _Predicate(
                        p.dim_column, p.op,
                        [_Term("column_set", name)], func=p.func,
                    )
                name = corr_in_col_of(p)
                return _Predicate(name, "=", [_Term("literal", True)])
            vals = list(
                dict.fromkeys(r.get(sq.col) for r in _sub_rows(sq, tables))
            )
            return _Predicate(
                p.dim_column,
                p.op,
                [_Term("literal", v) for v in vals],
                func=p.func,
            )
        tf = having_term_of if in_having else term_of
        return _Predicate(
            p.dim_column,
            p.op,
            [tf(t) if t.kind == "subquery" else t for t in p.terms],
            func=p.func,
            like_escape=p.like_escape,
        )

    def fix_tree(node):
        if node[0] == "pred":
            return ("pred", fix_pred(node[1]))
        return (node[0], [fix_tree(c) for c in node[1]])

    # projection scalar subqueries (round-5): each ``__psq{n}`` becomes
    # a per-row column — the row-at-a-time mirror of the compiled
    # typed-literal / per-group-aggregate dim column
    psq_lit: dict[str, object] = {}
    psq_deferred: list[tuple[str, object]] = []
    for name, sq in q.proj_subqueries:
        if sq.param_corr or sq.param_theta:
            # parameterized: binds per EVENT — deferred to
            # _resolve_param_subqueries_rows, after param binding
            psq_deferred.append((name, sq))
        elif not sq.corr and not sq.ineq:
            v = _eval_subquery_rows(sq, tables)
            state["rows"] = [{**r, name: v} for r in state["rows"]]
            psq_lit[name] = v
        else:
            ensure_outer_rows(sq)
            sub = _sub_rows(sq, tables)
            state["rows"] = [
                {
                    **r,
                    name: _agg_rows(
                        sq,
                        [
                            s
                            for s in sub
                            if all(
                                corr_eq(s.get(sc), r.get(oc))
                                for sc, oc in sq.corr
                            )
                            and ineq_match(sq, s, r)
                        ],
                    ),
                }
                for r in state["rows"]
            ]
    new_disjuncts = [[fix_pred(p) for p in d] for d in q.disjuncts]
    new_tree = None if q.where_tree is None else fix_tree(q.where_tree)
    new_having = tuple(
        tuple(fix_pred(p, in_having=True) for p in d) for d in q.having
    )
    q = dataclasses.replace(
        q,
        disjuncts=new_disjuncts,
        where_tree=new_tree,
        having=new_having,
        aggregates=q.aggregates
        + tuple((f, c, n) for c, f, n in hidden_aggs),
        proj_subqueries=tuple(psq_deferred),
        # GLOBAL-aggregate empty-set overrides, the twin of the
        # compiled resolution's agg_empty (max(__psq) over zero rows
        # must still carry the subquery's value)
        agg_empty=tuple(
            (alias, psq_lit[col])
            for _f, col, alias in q.aggregates
            if col in psq_lit and not q.group_by
        ),
    )
    return q, state["rows"]


def _resolve_param_subqueries_rows(
    q, tables: dict[str, list[dict]], params: dict,
    table: list[dict] | None = None,
):
    """Row-at-a-time twin of CompiledLookup._attach_param_subs: each
    PARAMETERIZED subquery term evaluates with THIS event's bound
    param values (exactly Derby re-executing the prepared subquery per
    event, lookup.rb:131-147) and substitutes a literal. A
    parameterized PROJECTION subquery (round-5 latest) attaches its
    per-event value as a ``__psq{n}`` column on ``table`` — the twin
    of the compiled post-stage overlay. Runs after param binding,
    before _match_rows; returns ``(q, table)``."""
    import dataclasses

    from logstash_filter_jdbc_static_spark.operators.lookup import (
        _Predicate,
        _Term,
    )

    def pv(term):
        if term.kind == "param":
            return params.get(term.value)
        # param_expr over params + literals only: substitute the bound
        # values and fold — mirrors the compiled fact-side substitution
        return eval_expr(
            subst_params(term.value, lambda n: Lit(params.get(n))), {}
        )

    def _grp(sq):
        rows = _sub_rows(sq, tables)
        if sq.param_theta:
            # THETA shape (round-5 final): evaluate the full DNF per
            # (event params, sub row) pair — the row-at-a-time twin of
            # the compiled probe-time distinct-tuple frame. NESTED
            # subquery terms resolve FIRST, once per event: param-free
            # to snapshot literals, parameterized ones recursively
            # through THIS event's bindings (the twin of the compiled
            # per-tuple pseudo-param columns).
            def fix_nested(p):
                if not any(t.kind == "subquery" for t in p.terms):
                    return p
                terms = []
                for t in p.terms:
                    if t.kind != "subquery":
                        terms.append(t)
                    elif t.value.param_corr or t.value.param_theta:
                        terms.append(
                            _Term(
                                "literal",
                                _agg_rows(t.value, _grp(t.value)),
                            )
                        )
                    else:
                        terms.append(
                            _Term(
                                "literal",
                                _eval_subquery_rows(t.value, tables),
                            )
                        )
                return _Predicate(
                    p.dim_column, p.op, terms,
                    func=p.func, like_escape=p.like_escape,
                )

            dnf = [
                [fix_nested(p) for p in dj] for dj in sq.param_theta
            ]
            return [
                s
                for s in rows
                if any(
                    all(_pred_match(p, s, params) for p in dj)
                    for dj in dnf
                )
            ]
        return [
            s
            for s in rows
            if all(
                _corr_eq_vals(s.get(sc), pv(pt))
                for sc, pt in sq.param_corr
            )
        ]

    def term_of(t):
        if t.kind != "subquery" or not (
            t.value.param_corr or t.value.param_theta
        ):
            return t
        sq = t.value
        return _Term("literal", _agg_rows(sq, _grp(sq)))

    def fix_pred(p):
        if not any(
            t.kind == "subquery"
            and (t.value.param_corr or t.value.param_theta)
            for t in p.terms
        ):
            return p
        sq0 = p.terms[0].value
        if p.op in ("exists", "not exists"):
            # params-only EXISTS in HAVING (round-5 latest): evaluate
            # THIS event's param group and fold to a constant — the
            # row-at-a-time twin of the compiled per-event count
            # carrier compare. ``__no_such_column`` is never a real
            # field, so ``is [not] null`` encodes TRUE/FALSE.
            grp = _grp(sq0)
            hit = bool(grp) == (p.op == "exists")
            return _Predicate(
                "__no_such_column",
                "is null" if hit else "is not null",
                [],
            )
        if (
            len(p.terms) == 1
            and p.terms[0].kind == "subquery"
            and sq0.func == "__values"
        ):
            # PARAMETERIZED [NOT] IN / quantified subquery (round-5
            # latest): expand THIS event's param group to a literal
            # value list — the distinct collect keeps its one NULL, so
            # 3VL falls out of _pred_match exactly like the
            # uncorrelated expansion
            vals = list(
                dict.fromkeys(s.get(sq0.col) for s in _grp(sq0))
            )
            return _Predicate(
                p.dim_column,
                p.op,
                [_Term("literal", v) for v in vals],
                func=p.func,
            )
        return _Predicate(
            p.dim_column, p.op, [term_of(t) for t in p.terms],
            func=p.func, like_escape=p.like_escape,
        )

    def fix_tree(node):
        if node[0] == "pred":
            return ("pred", fix_pred(node[1]))
        return (node[0], [fix_tree(c) for c in node[1]])

    psq_vals: dict[str, object] = {}
    for name, sq in q.proj_subqueries:
        v = _agg_rows(sq, _grp(sq))
        psq_vals[name] = v
        table = [{**r, name: v} for r in (table or [])]
    return (
        dataclasses.replace(
            q,
            disjuncts=[[fix_pred(p) for p in d] for d in q.disjuncts],
            where_tree=(
                None if q.where_tree is None else fix_tree(q.where_tree)
            ),
            # PARAMETERIZED HAVING subqueries (round-5 latest): the
            # per-event literal substitutes exactly like a WHERE
            # comparand (the compiled side rides a hidden overlaid
            # ``__hsq*`` carrier instead)
            having=tuple(
                tuple(fix_pred(p) for p in d) for d in q.having
            ),
            # GLOBAL-aggregate + parameterized projection subquery
            # (round-5 latest): the empty-set aggregate row carries
            # THIS event's value — the twin of the compiled in-stage
            # substitution
            agg_empty=q.agg_empty
            + tuple(
                (alias, psq_vals[col])
                for _f, col, alias in q.aggregates
                if col in psq_vals and not q.group_by
            ),
            proj_subqueries=(),
        ),
        table,
    )


def _has_param_subqueries(q) -> bool:
    from logstash_filter_jdbc_static_spark.operators.lookup import (
        _pred_terms,
    )

    return any(
        t.kind == "subquery"
        and (t.value.param_corr or t.value.param_theta)
        for p in _pred_terms(q)
        for t in p.terms
    ) or any(
        sq.param_corr or sq.param_theta
        for _, sq in q.proj_subqueries
    )


def _match_rows(q, table: list[dict], params: dict) -> list[tuple[dict, dict]]:
    """WHERE-match + project one parsed (non-union) query over dict
    rows: returns (raw row, projected row) pairs. Dim-side computed
    expressions materialize as synthetic columns exactly like
    CompiledLookup does on the dim frame (never in SELECT * output)."""
    synth = {n for n, _ in q.computed}
    if q.computed:
        table = [
            {**row, **{n: eval_expr(a, row) for n, a in q.computed}}
            for row in table
        ]

    def _tree_match(node, row: dict) -> bool:
        if node[0] == "pred":
            return _pred_match(node[1], row, params)
        if node[0] == "and":
            return all(_tree_match(c, row) for c in node[1])
        return any(_tree_match(c, row) for c in node[1])

    matched: list[tuple[dict, dict]] = []
    for row in table:
        if q.where_tree is not None:
            # DNF overflow: evaluate the un-normalized boolean tree
            match = _tree_match(q.where_tree, row)
        else:
            # DNF: any disjunct fully matching admits the row
            # ([] == no WHERE)
            match = not q.disjuncts
            for disjunct in q.disjuncts:
                if all(_pred_match(p, row, params) for p in disjunct):
                    match = True
                    break
        if match:
            fields = (
                [
                    (f, f)
                    for f in row.keys()
                    if f not in synth
                    and not f.startswith(("__sq_", "__psq"))
                ]
                if q.projection is None
                else q.projection
            )
            matched.append((row, {alias: row.get(src) for src, alias in fields}))
    return matched


def _agg_over_rows(aggregates, rows_raw: list[dict], empty=()) -> dict:
    """SQL aggregate projection over already-matched rows (shared by
    run_lookup and the derived-table materializer). ``empty`` =
    ParsedQuery.agg_empty — (alias, literal) overrides for projected-
    subquery carriers, applied over a ZERO-row match set (SQL
    evaluates the subquery even then)."""
    row_out: dict = {}
    overlay = dict(empty) if not rows_raw else {}
    for func, col, alias in aggregates:
        if func == "count" and col is None:
            row_out[alias] = len(rows_raw)
            continue
        vals = [r.get(col) for r in rows_raw]
        vals = [v for v in vals if v is not None]
        if func == "count":
            row_out[alias] = len(vals)
        elif func == "count_distinct":
            row_out[alias] = len(set(vals))
        elif not vals:
            row_out[alias] = None
        elif func == "min":
            row_out[alias] = min(vals)
        elif func == "max":
            row_out[alias] = max(vals)
        elif func == "sum":
            row_out[alias] = sum(vals)
        elif func == "sum_distinct":
            row_out[alias] = sum(set(vals))
        elif func == "avg_distinct":
            d = set(vals)
            row_out[alias] = sum(float(v) for v in d) / len(d)
        else:  # avg
            row_out[alias] = sum(float(v) for v in vals) / len(vals)
        if alias in overlay:
            row_out[alias] = overlay[alias]
    return row_out


def _group_rows(q, matched: list[tuple[dict, dict]], params: dict) -> list[dict]:
    """GROUP BY payload rows over matched (raw, projected) pairs: one
    row per distinct group-key tuple (projected keys then aggregates,
    like the compiled payload struct), HAVING-filtered. Shared by
    run_lookup and the set-op branch evaluator."""
    groups: dict[tuple, list[dict]] = {}
    for r, _ in matched:
        groups.setdefault(tuple(r.get(c) for c in q.group_by), []).append(r)
    grows = []
    for _key, rs in groups.items():
        # read projected key values off a group member row, not off
        # the group_by-keyed dict: projection and GROUP BY may use
        # different (qualified vs bare) spellings of one column in
        # join mode, and _join_rows rows carry both spellings
        d = {alias: rs[0].get(src) for src, alias in (q.projection or [])}
        d.update(_agg_over_rows(q.aggregates, rs))
        # expression LHS in HAVING (round-5 latest): evaluate each
        # payload-level expression onto the group row for the filter —
        # :params (round-5 final) substitute the event's bound values
        for hx_name, hx_ast in q.having_exprs:
            d[hx_name] = eval_expr(
                subst_params(hx_ast, lambda n: Lit(params[n])), d
            )
        grows.append(d)
    if q.having:
        # HAVING predicates reference payload aliases, so the group
        # row dict doubles as the predicate's "row"
        grows = [
            g
            for g in grows
            if any(
                all(_pred_match(p, g, params) for p in disjunct)
                for disjunct in q.having
            )
        ]
    if q.having_exprs:
        hx_names = {n for n, _ in q.having_exprs}
        grows = [
            {k: v for k, v in g.items() if k not in hx_names}
            for g in grows
        ]
    return grows


def _strip_hidden(rows: list[dict]) -> list[dict]:
    """Drop the hidden ``__hsq*`` correlated-HAVING carriers (mirror of
    the compiled _shape_raw strip). Callers strip at the same point the
    compiled side does: after the collect-order sort (which runs over
    the INTERNAL struct, hidden fields as trailing tiebreak), before
    any grouped-tail sort (whose keys are public aliases)."""
    if not any(k.startswith("__hsq") for g in rows[:1] for k in g):
        return rows
    return [
        {k: v for k, v in g.items() if not k.startswith("__hsq")}
        for g in rows
    ]


def _derived_rows(
    inner: str, tables: dict[str, list[dict]],
    cols: tuple[str, ...] | None = None,
) -> list[dict]:
    """Row-at-a-time twin of lookup.materialize_derived: evaluate a
    derived table's inner SELECT (static WHERE, expressions, joins,
    aggregates + GROUP BY + static HAVING, DISTINCT, nested derived
    tables, set ops, ordered top-N) or inline VALUES table against the
    dict-row tables, once per enhance call. The Spark compile enforces
    the rejections (params inside, bare-branch tails, LIMIT without
    ORDER BY); this twin just evaluates the accepted surface. ``cols``
    renames the output positionally."""
    import re as _re

    if _re.match(r"\s*values\b", inner, _re.IGNORECASE):
        from logstash_filter_jdbc_static_spark.operators.lookup import (
            _parse_values_rows,
        )

        rows = _parse_values_rows(inner)
        return [dict(zip(cols or (), r)) for r in rows]
    inner2, nested = extract_derived_tables(inner)
    if nested:
        tables = dict(tables)
        for name, sub, sub_cols in nested:
            tables[name] = _derived_rows(sub, tables, sub_cols)
        inner = inner2
    parts, joints = _split_setop_raw(inner)
    if len(parts) > 1:
        rows = _derived_rows_setop(parts, joints, tables)
        if cols is not None:
            rows = [dict(zip(cols, r.values())) for r in rows]
        return rows
    q = parse_lookup_query(inner)
    table = _join_rows(q, tables) if q.joins else tables[q.table]
    if has_subqueries(q) or q.proj_subqueries:
        q, table = _resolve_subqueries_rows(q, tables, table)
    matched = _match_rows(q, table, {})
    if q.aggregates and not q.group_by:
        return [_agg_over_rows(q.aggregates, [r for r, _ in matched],
                                q.agg_empty)]
    if q.group_by:
        groups: dict[tuple, list[dict]] = {}
        for r, _ in matched:
            groups.setdefault(
                tuple(r.get(c) for c in q.group_by), []
            ).append(r)
        rows = []
        for _, rs in groups.items():
            d = {alias: rs[0].get(src) for src, alias in (q.projection or [])}
            d.update(_agg_over_rows(q.aggregates, rs))
            # expression LHS in HAVING (round-5 latest)
            for hx_name, hx_ast in q.having_exprs:
                d[hx_name] = eval_expr(hx_ast, d)
            rows.append(d)
        if q.having:
            # static inside a derived table (params rejected at compile)
            rows = [
                g for g in rows
                if any(
                    all(_pred_match(p, g, {}) for p in disjunct)
                    for disjunct in q.having
                )
            ]
        if q.having_exprs:
            hx_names = {n for n, _ in q.having_exprs}
            rows = [
                {k: v for k, v in g.items() if k not in hx_names}
                for g in rows
            ]
    else:
        rows = [proj for _, proj in matched]
    if q.distinct or (q.group_by and not q.aggregates):
        seen: set = set()
        uniq = []
        for r in rows:
            key = tuple(sorted(r.items(), key=lambda kv: kv[0]))
            if key not in seen:
                seen.add(key)
                uniq.append(r)
        rows = uniq
    rows = _rows_topn(rows, q.order_by, q.limit, q.offset)
    if cols is not None:
        # positional rename (dicts preserve projection insertion order)
        rows = [dict(zip(cols, r.values())) for r in rows]
    return rows


def _rows_topn(
    rows: list[dict], order_by: tuple, limit: int | None,
    offset: int | None,
) -> list[dict]:
    """Ordered top-N row selection: mirror of lookup._derived_topn —
    Derby key order (ASC nulls last, DESC nulls first) with the
    all-other-columns NULL-first ASC tiebreak, via stable sorts in
    reverse priority."""
    if limit is None and offset is None:
        return rows
    keys = [c for c, _ in order_by]
    if rows:
        tiebreak = [c for c in rows[0] if c not in keys]
        rows.sort(
            key=lambda r: [
                (r.get(c) is not None,
                 r.get(c) if r.get(c) is not None else 0)
                for c in tiebreak
            ]
        )
    for c, asc in reversed(order_by):
        rows.sort(
            key=lambda r, cc=c: (
                r.get(cc) is None,
                r.get(cc) if r.get(cc) is not None else 0,
            ),
            reverse=not asc,
        )
    start = offset or 0
    return (
        rows[start:start + limit] if limit is not None
        else rows[start:]
    )


def _derived_rows_setop(
    parts: list[str], joints: list[tuple[str, bool]],
    tables: dict[str, list[dict]],
) -> list[dict]:
    """Row twin of lookup._materialize_derived_setop: evaluate each
    branch (recursively — a parenthesized branch may itself be a
    set-op group), align positionally to the left operand's keys, and
    combine with SQL set semantics — NULL is not distinct from NULL,
    plain ops de-duplicate, ALL variants are multisets (EXCEPT ALL
    removes one occurrence per right-side row, INTERSECT ALL keeps the
    minimum count) — INTERSECT binding tighter than UNION/EXCEPT, then
    left-to-right; finally the trailing ordered top-N. The Spark
    compile enforces the rejections (bare-branch tails, arity, LIMIT
    without ORDER BY); this twin just evaluates the accepted surface.
    Key names: output dicts carry branch 1's keys when branch 1
    produced rows (as on Spark, where the schema is static); an EMPTY
    branch 1 falls back to the first non-empty operand's keys — gated
    queries and templates use branches with agreeing aliases, where
    the fallback is identical."""
    from collections import Counter

    parts, order_by, limit, offset = split_union_tail(parts)
    branch_rows: list[list[dict]] = []
    for p in parts:
        stripped = strip_outer_parens(p)
        if re.match(r"\s*values\b", stripped, re.IGNORECASE):
            from logstash_filter_jdbc_static_spark.operators.lookup import (
                _parse_values_rows,
            )

            vrows = _parse_values_rows(stripped)
            branch_rows.append(
                [
                    {f"c{i}": v for i, v in enumerate(r)}
                    for r in vrows
                ]
            )
        else:
            branch_rows.append(_derived_rows(stripped, tables))

    def _key(r: dict) -> tuple:
        return tuple(r.values())

    def _dedup(rows: list[dict]) -> list[dict]:
        seen, out = set(), []
        for r in rows:
            k = _key(r)
            if k not in seen:
                seen.add(k)
                out.append(r)
        return out

    def _combine(
        a: list[dict], b: list[dict], op: str, all_: bool
    ) -> list[dict]:
        if a:
            keys0 = list(a[0].keys())
            b = [dict(zip(keys0, r.values())) for r in b]
        if op == "union":
            out = a + b
            return out if all_ else _dedup(out)
        bc = Counter(_key(r) for r in b)
        if op == "except":
            if all_:
                out = []
                for r in a:
                    k = _key(r)
                    if bc[k] > 0:
                        bc[k] -= 1
                    else:
                        out.append(r)
                return out
            return [r for r in _dedup(a) if _key(r) not in bc]
        if all_:
            out = []
            for r in a:
                k = _key(r)
                if bc[k] > 0:
                    bc[k] -= 1
                    out.append(r)
            return out
        return [r for r in _dedup(a) if _key(r) in bc]

    vals = list(branch_rows)
    ops = list(joints)
    i = 0
    while i < len(ops):
        # SQL precedence: INTERSECT binds tighter — reduce its runs
        # first, then fold left-to-right
        if ops[i][0] == "intersect":
            op, all_ = ops.pop(i)
            vals[i] = _combine(vals[i], vals.pop(i + 1), op, all_)
        else:
            i += 1
    rows = vals[0]
    for (op, all_), b in zip(ops, vals[1:]):
        rows = _combine(rows, b, op, all_)
    return _rows_topn(rows, order_by, limit, offset)


def _run_union(
    event: dict, spec: LookupSpec, texts: list[str], tree: SetOpGroup,
    table: list[dict], tables: dict[str, list[dict]] | None,
) -> tuple[bool, list[str]]:
    """Set-op twin of run_lookup (UNION [ALL] / EXCEPT [ALL] /
    INTERSECT [ALL], mixed under SQL precedence — INTERSECT binds
    tighter, then left-to-right, parenthesized groups explicit):
    per-leaf match+project with the shared bindings, then fold the
    joint tree — plain joints with SQL set semantics (distinct result,
    NULL not distinct from NULL), ALL variants as exact multisets
    (EXCEPT ALL removes one occurrence per right row, INTERSECT ALL
    keeps the minimum count); group tails shape before the enclosing
    joint, the root tail after the fold (Derby result order, NULL
    largest), then the usual default/tags outcome."""
    import dataclasses

    bindings = (
        {f"p{i}": v for i, v in enumerate(spec.prepared_parameters)}
        if spec.prepared_parameters is not None
        else dict(spec.parameters or {})
    )
    params: dict[str, Any] = {}
    valid = True
    for name, binding in bindings.items():
        v, ok = _bind(event, binding)
        params[name] = v
        valid = valid and ok
    tags: list[str] = []
    if not valid:
        tags.extend(spec.tag_on_failure)
        return False, tags
    aliases0: list[str] | None = None
    branch_rows: list[list[dict]] = []
    for text in texts:
        q = parse_lookup_query(strip_outer_parens(text))
        full = [a for _, a in (q.projection or [])] + [
            a for _, _, a in q.aggregates
        ]
        if aliases0 is None:
            aliases0 = full
        else:
            np_ = len(q.projection or [])
            ren = {o: n for o, n in zip(full, aliases0) if o != n}
            q = dataclasses.replace(
                q,
                projection=[
                    (src, a0)
                    for (src, _), a0 in zip(
                        q.projection or [], aliases0[:np_]
                    )
                ],
                aggregates=tuple(
                    (f, c, a0)
                    for (f, c, _), a0 in zip(q.aggregates, aliases0[np_:])
                ),
                having=_remap_having_aliases(q.having, ren)
                if ren
                else q.having,
            )
        branch_table = (
            _join_rows(q, tables)
            if q.joins and tables is not None
            else (tables[q.table] if tables is not None else table)
        )
        if has_subqueries(q):
            q, branch_table = _resolve_subqueries_rows(
                q,
                tables if tables is not None else {q.table: table},
                branch_table,
            )
        if _has_param_subqueries(q):
            q, branch_table = _resolve_param_subqueries_rows(
                q,
                tables if tables is not None else {q.table: table},
                params,
                branch_table,
            )
        matched = _match_rows(q, branch_table, params)
        # a PARENTHESIZED branch may carry its own ORDER BY/LIMIT/
        # OFFSET tail (round-5 latest; Derby-legal): the branch's
        # ordered top-N shapes BEFORE the set operation combines rows
        btail = (
            q.order_by or q.limit is not None or q.offset is not None
        )
        if q.group_by:
            rows_b = _group_rows(q, matched, params)
            if btail:
                if q.order_by:
                    rows_b = _strip_hidden(rows_b)
                    rows_b.sort(
                        key=functools.cmp_to_key(_payload_cmp(q.order_by))
                    )
                else:
                    rows_b.sort(key=_payload_sort_key)
                    rows_b = _strip_hidden(rows_b)
                rows_b = _slice_rows(rows_b, q)
            else:
                rows_b = _strip_hidden(rows_b)
        elif q.aggregates:
            # one row even over an empty match set, exactly SQL
            rows_b = [_agg_over_rows(q.aggregates, [r for r, _ in matched],
                                     q.agg_empty)]
            if btail:
                rows_b = _slice_rows(rows_b, q)
        else:
            if q.order_by:
                matched.sort(
                    key=functools.cmp_to_key(_matched_cmp(q.order_by))
                )
                rows_b = [proj for _, proj in matched]
            elif btail:
                # tail without ORDER BY: slice over the deterministic
                # default-contract order (mirrors _assemble_payload)
                rows_b = sorted(
                    (proj for _, proj in matched), key=_payload_sort_key
                )
            else:
                rows_b = [proj for _, proj in matched]
            if q.distinct:
                seen_b: set = set()
                uniq_b = []
                for r in rows_b:
                    kb = tuple(sorted(r.items(), key=lambda kv: kv[0]))
                    if kb not in seen_b:
                        seen_b.add(kb)
                        uniq_b.append(r)
                rows_b = uniq_b
            if btail:
                rows_b = _slice_rows(rows_b, q)
        branch_rows.append(rows_b)

    def _key(r: dict) -> tuple:
        return tuple(sorted(r.items(), key=lambda kv: kv[0]))

    def _distinct(rs: list[dict]) -> list[dict]:
        seen: set = set()
        uniq = []
        for r in rs:
            k = _key(r)
            if k not in seen:
                seen.add(k)
                uniq.append(r)
        return uniq

    from collections import Counter

    def _combine(
        a: list[dict], b: list[dict], op: str, all_: bool
    ) -> list[dict]:
        if op == "union":
            out = a + b
            return out if all_ else _distinct(out)
        bc = Counter(_key(r) for r in b)
        if op == "except":
            if all_:
                out = []
                for r in a:
                    k = _key(r)
                    if bc[k] > 0:
                        bc[k] -= 1
                    else:
                        out.append(r)
                return out
            return [r for r in _distinct(a) if _key(r) not in bc]
        if all_:
            out = []
            for r in a:
                k = _key(r)
                if bc[k] > 0:
                    bc[k] -= 1
                    out.append(r)
            return out
        return [r for r in _distinct(a) if _key(r) in bc]

    def _shape(
        rows: list[dict], order: tuple,
        limit: int | None, offset: int | None,
    ) -> list[dict]:
        # default-contract sort first, then stable re-sorts by each
        # ORDER BY key, least significant first (the compiled side's
        # comparator tiebreak). NULL sorts LARGEST (Derby): ASC puts
        # NULLs last, DESC first. Then the OFFSET/LIMIT slice.
        rows = sorted(rows, key=_payload_sort_key)
        for col, asc in reversed(order):
            rows.sort(
                key=lambda r, c=col: (
                    r.get(c) is None,
                    r.get(c) if r.get(c) is not None else 0,
                ),
                reverse=not asc,
            )
        start = offset or 0
        return rows[start:] if limit is None else rows[start:start + limit]

    def _fold(node: SetOpGroup) -> list[dict]:
        vals = [
            branch_rows[ch] if isinstance(ch, int) else _fold(ch)
            for ch in node.children
        ]
        ops = list(node.joints)
        i = 0
        while i < len(ops):
            # SQL precedence: INTERSECT [ALL] binds tighter
            if ops[i][0] == "intersect":
                op, all_ = ops.pop(i)
                vals[i] = _combine(vals[i], vals.pop(i + 1), op, all_)
            else:
                i += 1
        rows = vals[0]
        for (op, all_), b in zip(ops, vals[1:]):
            rows = _combine(rows, b, op, all_)
        if node is not tree and node.has_tail():
            rows = _shape(rows, node.order_by, node.limit, node.offset)
        return rows

    rows = _shape(_fold(tree), tree.order_by, tree.limit, tree.offset)
    if not rows and spec.use_default:
        event[spec.target] = [dict(spec.default_hash)]
        tags.extend(spec.tag_on_default_use)
        return True, tags
    event[spec.target] = rows
    return True, tags


def run_lookup(
    event: dict, spec: LookupSpec, table: list[dict],
    tables: dict[str, list[dict]] | None = None,
) -> tuple[bool, list[str]]:
    """Executes one lookup against `event` in place (sets spec.target).
    Returns (ok, tags_appended). ``tables`` supplies the full local
    table dict for scalar-subquery resolution (defaults to just the
    probed table)."""
    texts, tree = parse_setop_tree(spec.query)
    if tree is not None:
        return _run_union(event, spec, texts, tree, table, tables)
    q = parse_lookup_query(spec.query)
    if has_subqueries(q):
        q, table = _resolve_subqueries_rows(
            q, tables if tables is not None else {q.table: table}, table
        )
    bindings = (
        {f"p{i}": v for i, v in enumerate(spec.prepared_parameters)}
        if spec.prepared_parameters is not None
        else dict(spec.parameters or {})
    )
    params: dict[str, Any] = {}
    valid = True
    for name, binding in bindings.items():
        v, ok = _bind(event, binding)
        params[name] = v
        valid = valid and ok
    tags: list[str] = []
    if not valid:
        tags.extend(spec.tag_on_failure)
        return False, tags
    if _has_param_subqueries(q):
        q, table = _resolve_param_subqueries_rows(
            q, tables if tables is not None else {q.table: table},
            params, table,
        )
    matched = _match_rows(q, table, params)

    def _agg_over(rows_raw: list[dict]) -> dict:
        return _agg_over_rows(q.aggregates, rows_raw, q.agg_empty)

    if q.group_by:
        # one payload row per distinct group-key tuple among the
        # matches (projected keys then aggregates, like the compiled
        # payload struct); zero groups on an empty match set, so the
        # post-shape default CAN fire below
        grows = _group_rows(q, matched, params)
        if q.order_by:
            # grouped top-N (round-5 latest): ORDER BY names payload
            # aliases; Derby result order (NULL largest) + all-field
            # tiebreak — the mirror of the compiled payload comparator
            # (which runs post-strip, over the PUBLIC fields)
            grows = _strip_hidden(grows)
            grows.sort(key=functools.cmp_to_key(_payload_cmp(q.order_by)))
        else:
            # collect-order sort over the INTERNAL rows (hidden
            # trailing tiebreak), then strip — the compiled
            # sort_array-then-_shape_raw order
            grows.sort(key=_payload_sort_key)
            grows = _strip_hidden(grows)
        grows = _slice_rows(grows, q)
        if not grows and spec.use_default:
            event[spec.target] = [dict(spec.default_hash)]
            tags.extend(spec.tag_on_default_use)
            return True, tags
        event[spec.target] = grows
        return True, tags

    if q.aggregates:
        # aggregate projection: exactly one payload row, even over an
        # empty match set (count 0 / NULL); ORDER BY is a no-op over
        # the single row, but OFFSET can empty the result set — Derby
        # then returns zero rows and the default CAN fire (round-5)
        rows = _slice_rows([_agg_over([r for r, _ in matched])], q)
        if not rows and spec.use_default:
            event[spec.target] = [dict(spec.default_hash)]
            tags.extend(spec.tag_on_default_use)
            return True, tags
        event[spec.target] = rows
        return True, tags

    if q.order_by:
        # ORDER BY under Derby result-order semantics (NULL largest),
        # full-payload tiebreak — the mirror of _order_comparator
        matched.sort(key=functools.cmp_to_key(_matched_cmp(q.order_by)))
        rows = [proj for _, proj in matched]
    else:
        # deterministic ordering to mirror sort_array(collect_list(...)),
        # including its nulls-first struct-field ordering
        rows = sorted((proj for _, proj in matched), key=_payload_sort_key)
    if q.distinct:
        # dedupe projected rows, first occurrence wins (payload order)
        seen: set = set()
        uniq = []
        for r in rows:
            key = tuple(sorted(r.items(), key=lambda kv: kv[0]))
            if key not in seen:
                seen.add(key)
                uniq.append(r)
        rows = uniq
    start = q.offset or 0
    if q.limit is not None:
        rows = rows[start:start + q.limit]
    elif start:
        rows = rows[start:]
    if not rows and spec.use_default:
        # default fires on the POST-shape payload (Derby returns the
        # already-offset/limited result set; an OFFSET past the matches
        # yields zero rows and the reference's empty?-branch runs) —
        # mirrors the compiled path's size-after-assembly check
        event[spec.target] = [dict(spec.default_hash)]
        tags.extend(spec.tag_on_default_use)
        return True, tags
    event[spec.target] = rows
    return True, tags


def _join_rows(q, tables: dict[str, list[dict]]) -> list[dict]:
    """Materialize a multi-table lookup's joined relation row-at-a-time
    (nested loops — tables are property-test sized), independent of the
    Spark build_join_dim implementation. Rows carry every column under
    its qualified name (``alias.col``) plus the bare name when exactly
    one relation owns it, so run_lookup's src/predicate resolution works
    unchanged on either reference style."""
    alias_map = {q.base_alias: q.table, **{j.alias: j.table for j in q.joins}}
    cols: dict[str, set] = {}
    for a, t in alias_map.items():
        colsets = [set(r) for r in tables[t]]
        cols[a] = set().union(*colsets) if colsets else set()
    rows = [{(q.base_alias, k): v for k, v in r.items()} for r in tables[q.table]]
    for j in q.joins:
        right_rows = [{(j.alias, k): v for k, v in r.items()} for r in tables[j.table]]
        nxt: list[dict] = []
        for lr in rows:
            matched = False
            for rr in right_rows:
                def val(qual, col):
                    if qual is None:  # literal ON operand
                        return col
                    return rr.get((qual, col)) if qual == j.alias else lr.get((qual, col))

                def on_match(lq, lc, op, rq, rc) -> bool:
                    left, right = _coerce_pair(val(lq, lc), val(rq, rc))
                    if left is None or right is None:
                        return False  # SQL: NULL comparison -> no match
                    return {
                        "=": left == right, "<>": left != right,
                        "<": left < right, ">": left > right,
                        "<=": left <= right, ">=": left >= right,
                    }[op]

                if all(on_match(*cond) for cond in j.on):
                    nxt.append({**lr, **rr})
                    matched = True
            if not matched and j.how == "left":
                nxt.append({**lr, **{(j.alias, c): None for c in cols[j.alias]}})
        rows = nxt
    owners: dict[str, set] = {}
    for a, cs in cols.items():
        for c in cs:
            owners.setdefault(c, set()).add(a)
    out = []
    for r in rows:
        d: dict = {}
        for (a, c), v in r.items():
            d[f"{a}.{c}"] = v
            if len(owners[c]) == 1:
                d[c] = v
        out.append(d)
    return out


def enhance(event: dict, spec: PipelineSpec, tables: dict[str, list[dict]]) -> dict:
    """LookupProcessor#enhance + matched gate, one event at a time."""
    tags: list[str] = list(event.get("tags", []))
    matched = True
    for lk in spec.lookups:
        # derived tables materialize once per enhance into synthetic
        # table names (the mirror of LookupEnricher's snapshot-time
        # materialize_derived)
        new_q, derived = extract_derived_tables(lk.query)
        tbls = tables
        if derived:
            import copy

            lk = copy.copy(lk)
            lk.query = new_q
            tbls = dict(tables)
            for dt_name, dt_inner, dt_cols in derived:
                tbls[dt_name] = _derived_rows(dt_inner, tables, dt_cols)
        leaves, _tree = parse_setop_tree(lk.query)
        if len(leaves) > 1:
            # set op: run_lookup resolves each leaf's table itself
            q = parse_lookup_query(strip_outer_parens(leaves[0]))
            table = tbls[q.table] if not q.joins else []
        else:
            q = parse_lookup_query(lk.query)
            table = _join_rows(q, tbls) if q.joins else tbls[q.table]
        ok, new_tags = run_lookup(event, lk, table, tables=tbls)
        for t in new_tags:
            if t not in tags:
                tags.append(t)
        matched = matched and ok
    event["tags"] = tags
    event["matched"] = matched
    return event
