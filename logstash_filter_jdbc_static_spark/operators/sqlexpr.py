"""Dim-side scalar SQL expressions for lookup queries.

The reference hands lookup SQL verbatim to Derby
(lib/logstash/filters/jdbc/lookup.rb:131-147), so arithmetic
(``WHERE price * qty > :limit``), ``COALESCE``, and searched ``CASE``
projections are legal lookup configs there. This module parses those
scalar expressions from the shared lookup token stream and compiles
them BOTH ways:

- :func:`compile_expr` -> a pyspark ``Column`` evaluated **dim-side
  only** (expressions never see event fields or :params), so every
  physical lookup path works unchanged: the parser materializes each
  expression as a synthetic dim column and rewrites the query to a
  plain column reference. A param-keyed equality on a computed column
  therefore keeps the broadcast-hash equi path — the same
  computed-key machinery ``lower(ip) = :ip`` already rides.
- :func:`eval_expr` -> the same semantics row-at-a-time over Python
  dicts, for the property-test oracle (SQL three-valued logic: NULL
  propagates through arithmetic/comparisons, CASE skips NULL
  conditions, COALESCE takes the first non-NULL).

Supported surface (the closed-grammar contract, COVERAGE.md):
``+ - * /`` (SQL float division), ``||`` string concat, unary minus,
scalar functions lower/upper/trim/ltrim/rtrim/length/abs/coalesce/
mod/substr/floor/ceil/round/nullif/replace/instr, ``CAST(expr AS
type)`` over the local-DDL type surface (round-4 verdict #3 — the
docs tell users to cast remote columns to match local schemas,
docs/index.asciidoc:455-458), searched ``CASE WHEN <cond> THEN <expr>
... [ELSE <expr>] END`` plus simple ``CASE x WHEN v THEN r ... END``
(desugared to searched) where ``<cond>`` combines comparisons,
``IS [NOT] NULL``, ``[NOT] LIKE 'pat'``, ``[NOT] IN (items)`` and
``[NOT] BETWEEN lo AND hi`` with AND/OR/NOT. Parameters are rejected
inside expressions by default — a caller that can evaluate them
FACT-side (the predicate-RHS parser, round-5 latest) passes
``resolve_param`` and gets :class:`Param` leaves back, substituted
via :func:`subst_params` before compile/eval.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, functions as F

from logstash_filter_jdbc_static_spark.spec import ValidationError

# ---------------------------------------------------------------- AST

@dataclass(frozen=True)
class Col:
    name: str


@dataclass(frozen=True)
class Lit:
    value: object  # str | int | float


@dataclass(frozen=True)
class Param:
    """A bound ``:name``/``?`` placeholder inside an expression
    (round-5 latest). Only parsed when the caller supplies
    ``resolve_param`` — predicate RHS expressions, which evaluate
    FACT-side per event (``price > :lim * 2``). Substituted before
    compile/eval via :func:`subst_params`: the compiled path swaps in
    the bound event Column, the row oracle swaps in a ``Lit`` of the
    event's value."""

    name: str


@dataclass(frozen=True)
class Bin:
    op: str  # '+', '-', '*', '/', '||'
    left: object
    right: object


@dataclass(frozen=True)
class Neg:
    operand: object


@dataclass(frozen=True)
class Func:
    name: str
    args: tuple


@dataclass(frozen=True)
class Case:
    whens: tuple  # of (cond, expr)
    otherwise: object | None


@dataclass(frozen=True)
class Cast:
    """``CAST(expr AS type)`` — the docs-recommended shape for aligning
    remote column types with local schemas (docs/index.asciidoc:455-458).
    ``type_str`` is the normalized Derby type string (``int``,
    ``decimal(10,2)``, ``varchar(64)``); the Spark side maps it through
    the same schema.derby_type_to_spark used for local table DDL.
    Documented divergence (COVERAGE.md): float->int CAST truncates
    (Spark/Derby, SQL standard); DuckDB rounds."""

    operand: object
    type_str: str


# conditions (inside CASE WHEN only)

@dataclass(frozen=True)
class Cmp:
    op: str  # '=', '<>', '<', '>', '<=', '>='
    left: object
    right: object


@dataclass(frozen=True)
class NullTest:
    operand: object
    negated: bool


@dataclass(frozen=True)
class LikeTest:
    """``expr [NOT] LIKE 'pattern'`` inside a CASE condition — Derby
    runs it verbatim (lookup.rb:131-147). The pattern is a literal
    (parameterized patterns belong to predicate right-hand sides)."""

    operand: object
    pattern: str
    negated: bool


@dataclass(frozen=True)
class InList:
    """``expr [NOT] IN (lit, ...)`` inside a CASE condition."""

    operand: object
    items: tuple  # of expression ASTs (constant-foldable or columns)
    negated: bool


@dataclass(frozen=True)
class RangeTest:
    """``expr [NOT] BETWEEN lo AND hi`` inside a CASE condition."""

    operand: object
    lo: object
    hi: object
    negated: bool


@dataclass(frozen=True)
class BoolOp:
    op: str  # 'and' | 'or'
    parts: tuple


@dataclass(frozen=True)
class NotOp:
    operand: object


# arity: None == variadic (>= min_args)
_FUNCS: dict[str, tuple[int, int | None]] = {
    "lower": (1, 1),
    "upper": (1, 1),
    "trim": (1, 1),
    "ltrim": (1, 1),
    "rtrim": (1, 1),
    "length": (1, 1),
    "abs": (1, 1),
    "floor": (1, 1),
    "ceil": (1, 1),
    "ceiling": (1, 1),
    "round": (1, 2),
    "mod": (2, 2),
    "substr": (2, 3),
    "substring": (2, 3),
    "coalesce": (2, None),
    "nullif": (2, 2),
    "replace": (3, 3),
    "instr": (2, 2),
    # Derby's own canonical spellings (Derby ref manual): UCASE/LCASE,
    # CHAR_LENGTH/CHARACTER_LENGTH, LOCATE(substr, str) — real
    # reference configs use these names, so the grammar accepts them
    # and normalizes to the shared implementations at parse time.
    "ucase": (1, 1),
    "lcase": (1, 1),
    "char_length": (1, 1),
    "character_length": (1, 1),
    "locate": (2, 2),
    # Derby's numeric built-in surface (Derby ref manual §built-in
    # functions; round-5): each compiles to the same-named pyspark
    # function; Spark semantics where they differ from Derby (SIGN
    # returns DOUBLE, LN/LOG10 of a non-positive is NULL rather than
    # an error, SQRT/ASIN/ACOS out of domain is NaN) — documented in
    # COVERAGE.md.
    "sqrt": (1, 1),
    "exp": (1, 1),
    "ln": (1, 1),
    "log10": (1, 1),
    "sin": (1, 1),
    "cos": (1, 1),
    "tan": (1, 1),
    "asin": (1, 1),
    "acos": (1, 1),
    "atan": (1, 1),
    "atan2": (2, 2),
    "sinh": (1, 1),
    "cosh": (1, 1),
    "tanh": (1, 1),
    "cot": (1, 1),
    "degrees": (1, 1),
    "radians": (1, 1),
    "sign": (1, 1),
    # Derby's date/time extraction built-ins (Derby ref manual —
    # Derby has no EXTRACT; these ARE its extraction surface). All
    # return INTEGER on both engines. Spark semantics where they
    # differ: HOUR/MINUTE/SECOND of a DATE is 0 (implicit midnight
    # timestamp; Derby raises), SECOND truncates the fraction.
    "year": (1, 1),
    "month": (1, 1),
    "day": (1, 1),
    "hour": (1, 1),
    "minute": (1, 1),
    "second": (1, 1),
}

# parse-time canonicalization: alias -> (name, arg permutation)
_FUNC_ALIASES: dict[str, tuple[str, tuple[int, ...]]] = {
    "ucase": ("upper", (0,)),
    "lcase": ("lower", (0,)),
    "char_length": ("length", (0,)),
    "character_length": ("length", (0,)),
    "locate": ("instr", (1, 0)),  # LOCATE(sub, s) == INSTR(s, sub)
}

# Derby's conversion FUNCTIONS (Derby ref manual: DATE, TIMESTAMP,
# INTEGER, BIGINT, SMALLINT, DOUBLE, VARCHAR) — function-spelled CASTs,
# desugared to Cast nodes at parse (round-5 latest; legality pinned
# natively in test_jdbc_derby.py). Accepted as a slight superset:
# Derby's per-function argument-type matrix (e.g. VARCHAR only takes
# character operands) is not re-validated — the CAST semantics apply.
# CHAR() is NOT mapped: Derby right-pads it to a fixed width, which a
# plain string cast cannot mirror (use CAST(x AS CHAR(n)) explicitly).
_CONVERSION_FUNCS: dict[str, str] = {
    "date": "date",
    "timestamp": "timestamp",
    "integer": "int",
    "int": "int",
    "bigint": "bigint",
    "smallint": "smallint",
    "double": "double",
    "varchar": "varchar",
}

# CAST targets: the Derby type surface local DDL already accepts,
# minus binary/lob (no sensible text-protocol literal to cast from).
_CAST_BASES = frozenset(
    ("int", "integer", "smallint", "tinyint", "bigint", "long",
     "double", "float", "real", "decimal", "numeric",
     "varchar", "char", "string", "date", "timestamp", "boolean")
)

_AGG_NAMES = ("count", "sum", "min", "max", "avg")

_CMP_OPS = ("=", "<>", "<", ">", "<=", ">=")


def is_simple_column(ast) -> str | None:
    """The parsed expression is just a bare column -> its name."""
    return ast.name if isinstance(ast, Col) else None


def single_func_column(ast) -> tuple[str, str] | None:
    """``func(col)`` for a 1-arg scalar function -> (func, col); the
    legacy ``_LHS_FUNCS`` predicate shape keeps its dedicated
    representation (and its pinned behavior/tests)."""
    if (
        isinstance(ast, Func)
        and len(ast.args) == 1
        and isinstance(ast.args[0], Col)
        and ast.name in ("lower", "upper", "trim", "ltrim", "rtrim", "length", "abs")
    ):
        return ast.name, ast.args[0].name
    return None


def map_columns(ast, fn):
    """Rebuild the expression with every column name passed through
    ``fn`` — used to apply qualifier resolution AFTER parsing, for
    clauses (GROUP BY / ORDER BY tails) parsed before the FROM scope
    is known."""
    if isinstance(ast, Col):
        return Col(fn(ast.name))
    if isinstance(ast, (Lit, Param)):
        return ast
    if isinstance(ast, Bin):
        return Bin(ast.op, map_columns(ast.left, fn), map_columns(ast.right, fn))
    if isinstance(ast, Cmp):
        return Cmp(ast.op, map_columns(ast.left, fn), map_columns(ast.right, fn))
    if isinstance(ast, Neg):
        return Neg(map_columns(ast.operand, fn))
    if isinstance(ast, NotOp):
        return NotOp(map_columns(ast.operand, fn))
    if isinstance(ast, NullTest):
        return NullTest(map_columns(ast.operand, fn), ast.negated)
    if isinstance(ast, LikeTest):
        return LikeTest(map_columns(ast.operand, fn), ast.pattern, ast.negated)
    if isinstance(ast, InList):
        return InList(
            map_columns(ast.operand, fn),
            tuple(map_columns(i, fn) for i in ast.items),
            ast.negated,
        )
    if isinstance(ast, RangeTest):
        return RangeTest(
            map_columns(ast.operand, fn),
            map_columns(ast.lo, fn),
            map_columns(ast.hi, fn),
            ast.negated,
        )
    if isinstance(ast, Func):
        return Func(ast.name, tuple(map_columns(a, fn) for a in ast.args))
    if isinstance(ast, Cast):
        return Cast(map_columns(ast.operand, fn), ast.type_str)
    if isinstance(ast, BoolOp):
        return BoolOp(ast.op, tuple(map_columns(p, fn) for p in ast.parts))
    if isinstance(ast, Case):
        return Case(
            tuple(
                (map_columns(c, fn), map_columns(e, fn))
                for c, e in ast.whens
            ),
            None if ast.otherwise is None else map_columns(ast.otherwise, fn),
        )
    raise TypeError(f"unknown expression node {ast!r}")


def params_of(ast) -> list[str]:
    """Every :class:`Param` name in the expression, first-use order,
    deduplicated — drives binding validation and the map-probe's
    distinct-tuple key order exactly like plain param terms."""
    out: list[str] = []

    def walk(node) -> None:
        if isinstance(node, Param):
            if node.name not in out:
                out.append(node.name)
            return
        if isinstance(node, (Col, Lit)) or node is None:
            return
        if isinstance(node, (Bin, Cmp)):
            walk(node.left), walk(node.right)
        elif isinstance(node, (Neg, NotOp, Cast, NullTest, LikeTest)):
            walk(node.operand)
        elif isinstance(node, InList):
            walk(node.operand)
            for i in node.items:
                walk(i)
        elif isinstance(node, RangeTest):
            walk(node.operand), walk(node.lo), walk(node.hi)
        elif isinstance(node, Func):
            for a in node.args:
                walk(a)
        elif isinstance(node, BoolOp):
            for p in node.parts:
                walk(p)
        elif isinstance(node, Case):
            for c, e in node.whens:
                walk(c), walk(e)
            walk(node.otherwise)
        else:
            raise TypeError(f"unknown expression node {node!r}")

    walk(ast)
    return out


def subst_params(ast, fn):
    """Rebuild the expression with every :class:`Param` replaced by
    ``fn(name)`` — a pyspark ``Column`` (compiled path; compile_expr
    passes raw Columns through) or a :class:`Lit` (row oracle)."""
    if isinstance(ast, Param):
        return fn(ast.name)
    if isinstance(ast, (Col, Lit)):
        return ast
    if isinstance(ast, Bin):
        return Bin(ast.op, subst_params(ast.left, fn), subst_params(ast.right, fn))
    if isinstance(ast, Cmp):
        return Cmp(ast.op, subst_params(ast.left, fn), subst_params(ast.right, fn))
    if isinstance(ast, Neg):
        return Neg(subst_params(ast.operand, fn))
    if isinstance(ast, NotOp):
        return NotOp(subst_params(ast.operand, fn))
    if isinstance(ast, NullTest):
        return NullTest(subst_params(ast.operand, fn), ast.negated)
    if isinstance(ast, LikeTest):
        return LikeTest(subst_params(ast.operand, fn), ast.pattern, ast.negated)
    if isinstance(ast, InList):
        return InList(
            subst_params(ast.operand, fn),
            tuple(subst_params(i, fn) for i in ast.items),
            ast.negated,
        )
    if isinstance(ast, RangeTest):
        return RangeTest(
            subst_params(ast.operand, fn),
            subst_params(ast.lo, fn),
            subst_params(ast.hi, fn),
            ast.negated,
        )
    if isinstance(ast, Func):
        return Func(ast.name, tuple(subst_params(a, fn) for a in ast.args))
    if isinstance(ast, Cast):
        return Cast(subst_params(ast.operand, fn), ast.type_str)
    if isinstance(ast, BoolOp):
        return BoolOp(ast.op, tuple(subst_params(p, fn) for p in ast.parts))
    if isinstance(ast, Case):
        return Case(
            tuple(
                (subst_params(c, fn), subst_params(e, fn))
                for c, e in ast.whens
            ),
            None if ast.otherwise is None else subst_params(ast.otherwise, fn),
        )
    raise TypeError(f"unknown expression node {ast!r}")


def subst_columns(ast, fn):
    """Rebuild the expression with every :class:`Col` replaced by
    ``fn(name)`` — a pyspark ``Column`` for scopes where a dim column
    is not ``F.col``-addressable (an inline array element's field, the
    broadcast dim struct of the map probe). Runs AFTER
    :func:`subst_params`, so raw Columns already substituted for params
    pass through untouched."""
    if isinstance(ast, Column):
        return ast
    if isinstance(ast, Col):
        return fn(ast.name)
    if isinstance(ast, (Lit, Param)):
        return ast
    if isinstance(ast, Bin):
        return Bin(ast.op, subst_columns(ast.left, fn), subst_columns(ast.right, fn))
    if isinstance(ast, Cmp):
        return Cmp(ast.op, subst_columns(ast.left, fn), subst_columns(ast.right, fn))
    if isinstance(ast, Neg):
        return Neg(subst_columns(ast.operand, fn))
    if isinstance(ast, NotOp):
        return NotOp(subst_columns(ast.operand, fn))
    if isinstance(ast, NullTest):
        return NullTest(subst_columns(ast.operand, fn), ast.negated)
    if isinstance(ast, LikeTest):
        return LikeTest(subst_columns(ast.operand, fn), ast.pattern, ast.negated)
    if isinstance(ast, InList):
        return InList(
            subst_columns(ast.operand, fn),
            tuple(subst_columns(i, fn) for i in ast.items),
            ast.negated,
        )
    if isinstance(ast, RangeTest):
        return RangeTest(
            subst_columns(ast.operand, fn),
            subst_columns(ast.lo, fn),
            subst_columns(ast.hi, fn),
            ast.negated,
        )
    if isinstance(ast, Func):
        return Func(ast.name, tuple(subst_columns(a, fn) for a in ast.args))
    if isinstance(ast, Cast):
        return Cast(subst_columns(ast.operand, fn), ast.type_str)
    if isinstance(ast, BoolOp):
        return BoolOp(ast.op, tuple(subst_columns(p, fn) for p in ast.parts))
    if isinstance(ast, Case):
        return Case(
            tuple(
                (subst_columns(c, fn), subst_columns(e, fn))
                for c, e in ast.whens
            ),
            None if ast.otherwise is None else subst_columns(ast.otherwise, fn),
        )
    raise TypeError(f"unknown expression node {ast!r}")


def columns(ast) -> set[str]:
    """Every column name referenced by the expression."""
    if isinstance(ast, Col):
        return {ast.name}
    if isinstance(ast, (Lit, Param)):
        return set()
    if isinstance(ast, (Bin, Cmp)):
        return columns(ast.left) | columns(ast.right)
    if isinstance(ast, (Neg, NotOp, Cast)):
        return columns(ast.operand)
    if isinstance(ast, (NullTest, LikeTest)):
        return columns(ast.operand)
    if isinstance(ast, InList):
        out = columns(ast.operand)
        for i in ast.items:
            out |= columns(i)
        return out
    if isinstance(ast, RangeTest):
        return columns(ast.operand) | columns(ast.lo) | columns(ast.hi)
    if isinstance(ast, Func):
        out: set[str] = set()
        for a in ast.args:
            out |= columns(a)
        return out
    if isinstance(ast, BoolOp):
        out = set()
        for p in ast.parts:
            out |= columns(p)
        return out
    if isinstance(ast, Case):
        out = set()
        for c, e in ast.whens:
            out |= columns(c) | columns(e)
        if ast.otherwise is not None:
            out |= columns(ast.otherwise)
        return out
    raise TypeError(f"unknown expression node {ast!r}")


# ------------------------------------------------------------- parser

class ExprParser:
    """Recursive-descent scalar-expression parser over the lookup
    token stream (``_tokenize_where`` tokens). Precedence, loosest to
    tightest: ``||``, then ``+ -``, then ``* /``, then unary minus.

    Instantiated at a position INSIDE a larger token list (the WHERE
    parser hands over mid-stream); ``parse()`` returns the AST and
    leaves ``self.i`` at the first token it did not consume, so the
    caller resumes with the predicate operator.

    ``resolve_col`` canonicalizes qualified names (the caller's
    qualifier-strip rule); params/placeholders raise unless the caller
    passes ``resolve_param`` (a ``(token_kind, token_text) -> name``
    callback — the predicate-RHS parser, which evaluates the resulting
    :class:`Param` leaves fact-side and owns the ``?`` positional
    counter). Everywhere else expressions stay dim-static by contract.
    """

    def __init__(self, tokens, i=0, resolve_col=None, resolve_param=None):
        self.tokens = tokens
        self.i = i
        self.resolve_col = resolve_col or (lambda name: name)
        self.resolve_param = resolve_param

    # -- cursor helpers
    def _peek(self):
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def _peek_word(self):
        t = self._peek()
        return t[1].lower() if t and t[0] == "word" else None

    def _next(self):
        t = self._peek()
        if t is None:
            raise ValidationError(
                ["unsupported lookup expression: unexpected end of input"]
            )
        self.i += 1
        return t

    def _expect(self, kind: str, what: str):
        t = self._next()
        if t[0] != kind:
            raise ValidationError(
                [f"unsupported lookup expression: expected {what}, got {t[1]!r}"]
            )
        return t

    def _expect_word(self, *words: str):
        t = self._next()
        if t[0] != "word" or t[1].lower() not in words:
            raise ValidationError(
                [f"unsupported lookup expression: expected "
                 f"{'/'.join(w.upper() for w in words)}, got {t[1]!r}"]
            )
        return t[1].lower()

    # -- expression grammar
    def parse(self):
        return self._concat()

    def _concat(self):
        node = self._addsub()
        while True:
            t = self._peek()
            if t and t[0] == "arith" and t[1] == "||":
                self._next()
                node = Bin("||", node, self._addsub())
            else:
                return node

    def _addsub(self):
        node = self._muldiv()
        while True:
            t = self._peek()
            if t and t[0] == "arith" and t[1] in ("+", "-"):
                self._next()
                node = Bin(t[1], node, self._muldiv())
            else:
                return node

    def _muldiv(self):
        node = self._unary()
        while True:
            t = self._peek()
            if t and t[0] == "arith" and t[1] in ("*", "/"):
                self._next()
                node = Bin(t[1], node, self._unary())
            else:
                return node

    def _unary(self):
        t = self._peek()
        if t and t[0] == "arith" and t[1] == "-":
            self._next()
            operand = self._unary()
            if isinstance(operand, Lit) and isinstance(operand.value, (int, float)):
                return Lit(-operand.value)
            return Neg(operand)
        return self._primary()

    def _primary(self):
        kind, text = self._next()
        if kind == "number":
            is_float = "." in text or "e" in text or "E" in text
            return Lit(float(text) if is_float else int(text))
        if kind == "string":
            return Lit(text[1:-1].replace("''", "'"))
        if kind in ("param", "qmark"):
            if self.resolve_param is None:
                raise ValidationError(
                    [f"unsupported lookup expression: parameter {text!r} "
                     f"inside an expression (expressions here are evaluated "
                     f"dim-side; parameters may appear in predicate "
                     f"right-hand-side expressions, which evaluate "
                     f"fact-side)"]
                )
            return Param(self.resolve_param(kind, text))
        if kind == "lparen":
            node = self.parse()
            self._expect("rparen", "')'")
            return node
        if kind == "word":
            w = text.lower()
            if w == "case":
                return self._case()
            nxt = self._peek()
            if nxt and nxt[0] == "lparen" and "." not in text:
                if w == "cast":
                    return self._cast()
                if w == "trim":
                    full = self._trim_full()
                    if full is not None:
                        return full
                    # plain TRIM(expr) falls through to the generic path
                if w in _AGG_NAMES:
                    raise ValidationError(
                        [f"unsupported lookup expression: aggregate {w}(...) "
                         f"inside a scalar expression (aggregates appear as "
                         f"whole projection items: {w}(col) AS alias)"]
                    )
                if w in _CONVERSION_FUNCS:
                    # Derby conversion function: a function-spelled CAST
                    self._next()  # (
                    arg = self.parse()
                    self._expect("rparen", "')'")
                    return Cast(arg, _CONVERSION_FUNCS[w])
                if w not in _FUNCS:
                    raise ValidationError(
                        [f"unsupported lookup expression: unknown function "
                         f"{text!r} (supported: "
                         f"{', '.join(sorted(_FUNCS))}, and the Derby "
                         f"conversion functions "
                         f"{', '.join(sorted(_CONVERSION_FUNCS))})"]
                    )
                self._next()  # (
                args = [self.parse()]
                while True:
                    t = self._next()
                    if t[0] == "rparen":
                        break
                    if t[0] != "comma":
                        raise ValidationError(
                            [f"unsupported lookup expression: unclosed "
                             f"{w}(...) — expected ',' or ')', got {t[1]!r}"]
                        )
                    args.append(self.parse())
                lo, hi = _FUNCS[w]
                if len(args) < lo or (hi is not None and len(args) > hi):
                    arity = str(lo) if hi == lo else f"{lo}..{hi or 'n'}"
                    raise ValidationError(
                        [f"unsupported lookup expression: {w}() takes "
                         f"{arity} argument(s), got {len(args)}"]
                    )
                if w in _FUNC_ALIASES:
                    w, perm = _FUNC_ALIASES[w]
                    args = [args[i] for i in perm]
                return Func(w, tuple(args))
            if w in ("null", "and", "or", "not", "when", "then", "else", "end", "is"):
                raise ValidationError(
                    [f"unsupported lookup expression: unexpected keyword "
                     f"{text!r}"]
                )
            return Col(self.resolve_col(text))
        raise ValidationError(
            [f"unsupported lookup expression: unexpected token {text!r}"]
        )

    def _trim_full(self):
        """Derby's full TRIM syntax (Derby ref manual, round-5 latest):
        ``TRIM([BOTH|LEADING|TRAILING] [char] FROM expr)`` — the TRIM
        word is consumed, the '(' is peeked but not. Returns None when
        the parens hold a plain expression (``TRIM(expr)`` — the
        generic one-arg path handles it). The trim character must be a
        SINGLE-CHARACTER string literal: Derby raises at runtime on
        longer ones, while Spark/DuckDB trim a character SET — pinning
        the literal at parse keeps the engines agreeing by
        construction; it defaults to a space, as SQL."""
        # lookahead without consuming: the '(' then the shape inside
        save = self.i
        self._next()  # (
        mode = None
        t = self._peek()
        if t and t[0] == "word" and t[1].lower() in (
            "both", "leading", "trailing"
        ):
            mode = t[1].lower()
            self._next()
        char = " "
        t = self._peek()
        if t and t[0] == "string":
            nxt = self.tokens[self.i + 1] if self.i + 1 < len(self.tokens) else None
            if nxt and nxt[0] == "word" and nxt[1].lower() == "from":
                raw = t[1][1:-1].replace("''", "'")
                if len(raw) != 1:
                    raise ValidationError(
                        [f"unsupported lookup expression: TRIM character "
                         f"{raw!r} must be a single-character string "
                         f"literal (Derby raises on longer ones at "
                         f"runtime)"]
                    )
                char = raw
                self._next()  # the literal
                self._next()  # FROM
            elif mode is not None:
                raise ValidationError(
                    ["unsupported lookup expression: TRIM(<type> <char> "
                     "FROM expr) — expected FROM after the trim "
                     "character"]
                )
            else:
                # TRIM('x') — a plain one-arg trim of a literal
                self.i = save
                return None
        elif t and t[0] == "word" and t[1].lower() == "from":
            if mode is None:
                # a column literally named "from" cannot appear here
                # (reserved); treat as the FROM separator with the
                # default BOTH + space — Derby's TRIM(FROM x) is not
                # legal, so require an explicit type
                raise ValidationError(
                    ["unsupported lookup expression: TRIM(FROM expr) "
                     "needs an explicit BOTH/LEADING/TRAILING"]
                )
            self._next()  # FROM
        elif mode is None:
            # plain TRIM(expr)
            self.i = save
            return None
        else:
            raise ValidationError(
                ["unsupported lookup expression: TRIM(BOTH|LEADING|"
                 "TRAILING [char] FROM expr) — expected a trim "
                 "character or FROM"]
            )
        arg = self.parse()
        self._expect("rparen", "')'")
        return Func(f"trim_{mode or 'both'}", (arg, Lit(char)))

    def _cast(self):
        """``CAST(expr AS type)`` — the CAST word is consumed, the '('
        is at the cursor. The type grammar mirrors local-DDL column
        types: base word (``DOUBLE PRECISION`` folds to ``double``),
        optional ``(n)`` / ``(p,s)`` parameters."""
        self._next()  # (
        operand = self.parse()
        self._expect_word("as")
        t = self._next()
        if t[0] != "word":
            raise ValidationError(
                [f"unsupported lookup expression: expected a type name "
                 f"after CAST(... AS, got {t[1]!r}"]
            )
        base = t[1].lower()
        if base == "double" and self._peek_word() == "precision":
            self._next()
        if base not in _CAST_BASES:
            raise ValidationError(
                [f"unsupported lookup expression: CAST to {t[1]!r} "
                 f"(supported: {', '.join(sorted(_CAST_BASES))})"]
            )
        params: list[str] = []
        nt = self._peek()
        if nt and nt[0] == "lparen":
            self._next()
            while True:
                pt = self._next()
                if pt[0] != "number" or "." in pt[1]:
                    raise ValidationError(
                        [f"unsupported lookup expression: CAST type "
                         f"parameter must be an integer, got {pt[1]!r}"]
                    )
                params.append(pt[1])
                sep = self._next()
                if sep[0] == "rparen":
                    break
                if sep[0] != "comma":
                    raise ValidationError(
                        [f"unsupported lookup expression: expected ',' or "
                         f"')' in CAST type, got {sep[1]!r}"]
                    )
        if params and base not in ("decimal", "numeric", "varchar", "char"):
            raise ValidationError(
                [f"unsupported lookup expression: type {base!r} takes no "
                 f"parameters in CAST"]
            )
        if len(params) > (2 if base in ("decimal", "numeric") else 1):
            raise ValidationError(
                [f"unsupported lookup expression: too many parameters for "
                 f"CAST type {base!r}"]
            )
        type_str = base + (f"({','.join(params)})" if params else "")
        from logstash_filter_jdbc_static_spark.schema import derby_type_to_spark

        try:
            derby_type_to_spark(type_str)
        except ValueError as e:
            raise ValidationError(
                [f"unsupported lookup expression: {e}"]
            )
        self._expect("rparen", "')'")
        return Cast(operand, type_str)

    def _case(self):
        """Searched CASE, or simple CASE desugared to it (already
        consumed the CASE word). Simple ``CASE x WHEN v THEN r ... END``
        is Derby-legal and equivalent to ``CASE WHEN x = v THEN r ...``
        — including the NULL corner: a NULL scrutinee matches no WHEN
        (x = v is unknown) and falls to ELSE/NULL on both forms."""
        operand = None
        if self._peek_word() != "when":
            operand = self.parse()  # simple CASE scrutinee
            if self._peek_word() != "when":
                got = self._peek()
                raise ValidationError(
                    [f"unsupported lookup expression: expected WHEN in "
                     f"CASE, got {(got[1] if got else 'end of input')!r}"]
                )
        whens = []
        while self._peek_word() == "when":
            self._next()
            if operand is None:
                cond = self._cond_or()
            else:
                cond = Cmp("=", operand, self.parse())
            self._expect_word("then")
            whens.append((cond, self.parse()))
        otherwise = None
        if self._peek_word() == "else":
            self._next()
            otherwise = self.parse()
        self._expect_word("end")
        return Case(tuple(whens), otherwise)

    # -- condition grammar (CASE WHEN only)
    def _cond_or(self):
        parts = [self._cond_and()]
        while self._peek_word() == "or":
            self._next()
            parts.append(self._cond_and())
        return parts[0] if len(parts) == 1 else BoolOp("or", tuple(parts))

    def _cond_and(self):
        parts = [self._cond_not()]
        while self._peek_word() == "and":
            self._next()
            parts.append(self._cond_not())
        return parts[0] if len(parts) == 1 else BoolOp("and", tuple(parts))

    def _cond_not(self):
        if self._peek_word() == "not":
            self._next()
            return NotOp(self._cond_not())
        t = self._peek()
        if t and t[0] == "lparen":
            # '(' may open a parenthesized condition OR a parenthesized
            # arithmetic lhs: try the condition first, fall back to a
            # comparison whose expression grammar owns the paren
            save = self.i
            try:
                self._next()
                node = self._cond_or()
                self._expect("rparen", "')'")
                return node
            except ValidationError:
                self.i = save
        return self._cmp()

    def _cmp(self):
        left = self.parse()
        t = self._peek()
        if t and t[0] == "op":
            self._next()
            op = "<>" if t[1] == "!=" else t[1]
            return Cmp(op, left, self.parse())
        w = self._peek_word()
        if w == "is":
            self._next()
            negated = False
            if self._peek_word() == "not":
                self._next()
                negated = True
            self._expect_word("null")
            return NullTest(left, negated)
        # [NOT] LIKE / IN (literals) / BETWEEN — Derby accepts them
        # inside CASE conditions and runs the SQL verbatim
        negated = False
        if w == "not":
            nxt = (
                self.tokens[self.i + 1]
                if self.i + 1 < len(self.tokens) else None
            )
            if nxt and nxt[0] == "word" and nxt[1].lower() in (
                "like", "in", "between"
            ):
                self._next()
                negated = True
                w = self._peek_word()
        if w == "like":
            self._next()
            pt = self._next()
            if pt[0] != "string":
                raise ValidationError(
                    [f"unsupported lookup expression: LIKE in CASE takes "
                     f"a string literal pattern, got {pt[1]!r}"]
                )
            return LikeTest(left, pt[1][1:-1].replace("''", "'"), negated)
        if w == "in":
            self._next()
            self._expect("lparen", "'('")
            items = [self.parse()]
            while True:
                t2 = self._next()
                if t2[0] == "rparen":
                    break
                if t2[0] != "comma":
                    raise ValidationError(
                        [f"unsupported lookup expression: expected ',' or "
                         f"')' in CASE IN list, got {t2[1]!r}"]
                    )
                items.append(self.parse())
            return InList(left, tuple(items), negated)
        if w == "between":
            self._next()
            lo = self.parse()  # the expression grammar never consumes AND
            self._expect_word("and")
            hi = self.parse()
            return RangeTest(left, lo, hi, negated)
        got = t[1] if t else "end of input"
        raise ValidationError(
            [f"unsupported lookup expression: expected a comparison in "
             f"CASE WHEN, got {got!r}"]
        )


# ---------------------------------------------------- Spark compiler

def compile_expr(ast) -> Column:
    """AST -> pyspark Column (dim-side; no params by construction).

    Division follows Spark/DuckDB float-division semantics (Derby
    truncates int/int — documented divergence in the COVERAGE.md
    contract)."""
    if isinstance(ast, Column):
        # a pre-substituted Param operand (subst_params with a bound
        # event Column) — already compiled, pass through
        return ast
    if isinstance(ast, Param):
        raise TypeError(
            f"unresolved parameter :{ast.name} at compile — callers "
            f"substitute bound Columns via subst_params first"
        )
    if isinstance(ast, Col):
        return F.col(ast.name)
    if isinstance(ast, Lit):
        return F.lit(ast.value)
    if isinstance(ast, Neg):
        return -compile_expr(ast.operand)
    if isinstance(ast, Bin):
        left, right = compile_expr(ast.left), compile_expr(ast.right)
        if ast.op == "+":
            return left + right
        if ast.op == "-":
            return left - right
        if ast.op == "*":
            return left * right
        if ast.op == "/":
            return left / right
        return F.concat(left, right)  # '||' (NULL-propagating, as SQL)
    if isinstance(ast, Cast):
        from logstash_filter_jdbc_static_spark.schema import derby_type_to_spark

        return compile_expr(ast.operand).cast(derby_type_to_spark(ast.type_str))
    if isinstance(ast, Func):
        args = [compile_expr(a) for a in ast.args]
        name = ast.name
        if name == "coalesce":
            return F.coalesce(*args)
        if name == "nullif":
            return F.nullif(args[0], args[1])
        if name == "replace":
            return F.replace(args[0], args[1], args[2])
        if name == "instr":
            return F.instr(args[0], args[1])
        if name == "mod":
            return args[0] % args[1]
        if name in ("trim_both", "trim_leading", "trim_trailing"):
            # Derby's full TRIM syntax; the char is a pinned
            # single-char literal, regex-quoted (\Q..\E) so metachars
            # trim literally. regexp_replace keeps NULL -> NULL.
            c = ast.args[1].value  # guaranteed Lit by the parser
            quoted = f"(?:\\Q{c}\\E)"
            if name == "trim_both":
                pat = f"^{quoted}+|{quoted}+$"
            elif name == "trim_leading":
                pat = f"^{quoted}+"
            else:
                pat = f"{quoted}+$"
            return F.regexp_replace(args[0], F.lit(pat), F.lit(""))
        if name in ("substr", "substring"):
            return F.substring(args[0], args[1], *(args[2:] or []))
        if name in ("ceil", "ceiling"):
            return F.ceil(args[0])
        if name == "round":
            return F.round(*args)
        return getattr(F, name)(*args)
    if isinstance(ast, Case):
        expr = None
        for cond, val in ast.whens:
            c, v = _compile_cond(cond), compile_expr(val)
            expr = F.when(c, v) if expr is None else expr.when(c, v)
        if ast.otherwise is not None:
            expr = expr.otherwise(compile_expr(ast.otherwise))
        return expr
    raise TypeError(f"unknown expression node {ast!r}")


def _compile_cond(ast) -> Column:
    if isinstance(ast, Cmp):
        left, right = compile_expr(ast.left), compile_expr(ast.right)
        return {
            "=": left == right,
            "<>": left != right,
            "<": left < right,
            ">": left > right,
            "<=": left <= right,
            ">=": left >= right,
        }[ast.op]
    if isinstance(ast, NullTest):
        col = compile_expr(ast.operand)
        return col.isNotNull() if ast.negated else col.isNull()
    if isinstance(ast, LikeTest):
        cond = compile_expr(ast.operand).like(ast.pattern)
        return ~cond if ast.negated else cond
    if isinstance(ast, InList):
        col = compile_expr(ast.operand)
        cond = None
        for item in ast.items:
            piece = col == compile_expr(item)
            cond = piece if cond is None else (cond | piece)
        return ~cond if ast.negated else cond
    if isinstance(ast, RangeTest):
        col = compile_expr(ast.operand)
        cond = (col >= compile_expr(ast.lo)) & (col <= compile_expr(ast.hi))
        return ~cond if ast.negated else cond
    if isinstance(ast, BoolOp):
        parts = [_compile_cond(p) for p in ast.parts]
        out = parts[0]
        for p in parts[1:]:
            out = (out & p) if ast.op == "and" else (out | p)
        return out
    if isinstance(ast, NotOp):
        return ~_compile_cond(ast.operand)
    raise TypeError(f"unknown condition node {ast!r}")


# ------------------------------------------------- Python evaluator

def eval_expr(ast, row: dict):
    """Row-at-a-time evaluation with SQL NULL semantics, for the
    property-test oracle (oracle.py pre-materializes computed columns
    on its dict rows with this)."""
    if isinstance(ast, Param):
        raise TypeError(
            f"unresolved parameter :{ast.name} at eval — callers "
            f"substitute Lit(bound value) via subst_params first"
        )
    if isinstance(ast, Col):
        return row.get(ast.name)
    if isinstance(ast, Lit):
        return ast.value
    if isinstance(ast, Neg):
        v = eval_expr(ast.operand, row)
        return None if v is None else -v
    if isinstance(ast, Bin):
        left = eval_expr(ast.left, row)
        right = eval_expr(ast.right, row)
        if left is None or right is None:
            return None
        if ast.op == "+":
            return left + right
        if ast.op == "-":
            return left - right
        if ast.op == "*":
            return left * right
        if ast.op == "/":
            return left / right
        return f"{left}{right}"  # '||'
    if isinstance(ast, Cast):
        return _eval_cast(eval_expr(ast.operand, row), ast.type_str)
    if isinstance(ast, Func):
        args = [eval_expr(a, row) for a in ast.args]
        name = ast.name
        if name == "coalesce":
            for a in args:
                if a is not None:
                    return a
            return None
        if name == "nullif":
            # NULLIF(a, b): NULL when a = b; a otherwise (a NULL b, or
            # b NULL, makes the comparison unknown -> returns a)
            a, b = args
            return None if (a is not None and b is not None and a == b) else a
        if any(a is None for a in args):
            return None
        if name == "lower":
            return args[0].lower()
        if name == "upper":
            return args[0].upper()
        if name == "trim":
            return args[0].strip()
        if name == "ltrim":
            return args[0].lstrip()
        if name == "rtrim":
            return args[0].rstrip()
        if name == "length":
            return len(args[0])
        if name == "abs":
            return abs(args[0])
        if name == "floor":
            return math.floor(args[0])
        if name in ("ceil", "ceiling"):
            return math.ceil(args[0])
        if name == "round":
            # Spark ROUND of NaN/±inf is the value itself (round-5:
            # math functions can produce them)
            if isinstance(args[0], float) and not math.isfinite(args[0]):
                return args[0]
            # Spark rounds HALF_UP; Python's round() is HALF_EVEN
            d = args[1] if len(args) > 1 else 0
            q = 10 ** d
            v = args[0] * q
            r = math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)
            return r / q if d > 0 else int(r)
        if name == "mod":
            # Spark % follows the dividend sign, like Python math.fmod
            r = math.fmod(args[0], args[1])
            return int(r) if isinstance(args[0], int) and isinstance(args[1], int) else r
        if name == "replace":
            s, search, repl = args
            # Spark/DuckDB: an empty search string is a no-op (Python's
            # str.replace would interleave `repl` everywhere)
            return s if search == "" else s.replace(search, repl)
        if name == "instr":
            # 1-based position of the first occurrence; 0 when absent
            return args[0].find(args[1]) + 1
        if name in ("trim_both", "trim_leading", "trim_trailing"):
            s, c = args
            if name == "trim_both":
                return s.strip(c)
            return s.lstrip(c) if name == "trim_leading" else s.rstrip(c)
        if name in ("year", "month", "day", "hour", "minute", "second"):
            import datetime

            v = args[0]
            if isinstance(v, str):
                v = (
                    datetime.datetime.fromisoformat(v)
                    if (" " in v or "T" in v)
                    else datetime.date.fromisoformat(v)
                )
            if name in ("year", "month", "day"):
                return getattr(v, name)
            # Spark: HOUR/MINUTE/SECOND of a DATE is 0 (implicit
            # midnight); SECOND truncates the fraction
            if not isinstance(v, datetime.datetime):
                return 0
            return getattr(v, name)
        if name in _MATH_EVAL:
            return _MATH_EVAL[name](*[float(a) for a in args])
        if name in ("substr", "substring"):
            s, pos = args[0], args[1]
            ln = args[2] if len(args) > 2 else None
            # SQL 1-based; pos 0 behaves like 1 in Spark
            start = max(pos - 1, 0) if pos > 0 else max(len(s) + pos, 0) if pos < 0 else 0
            end = len(s) if ln is None else min(start + max(ln, 0), len(s))
            if pos < 0 and ln is not None:
                end = min(max(len(s) + pos, 0) + max(ln, 0), len(s))
            return s[start:end]
        raise TypeError(f"unknown function {name!r}")
    if isinstance(ast, Case):
        for cond, val in ast.whens:
            if _eval_cond(cond, row) is True:
                return eval_expr(val, row)
        return None if ast.otherwise is None else eval_expr(ast.otherwise, row)
    raise TypeError(f"unknown expression node {ast!r}")


def _nan_on_domain(fn):
    """Spark returns NaN where Python math raises (sqrt(-1), asin(2))."""
    def g(*a):
        try:
            return fn(*a)
        except ValueError:
            return float("nan")
    return g


def _null_log(fn):
    """Spark LN/LOG10 of a non-positive value is NULL, not an error."""
    def g(x):
        return None if x <= 0 else fn(x)
    return g


# row-at-a-time twins of the Derby/Spark numeric functions — Spark
# semantics pinned empirically (see compile_expr; NULL args already
# short-circuit above)
_MATH_EVAL = {
    "sqrt": _nan_on_domain(math.sqrt),
    "exp": math.exp,
    "ln": _null_log(math.log),
    "log10": _null_log(math.log10),
    "sin": math.sin,
    "cos": math.cos,
    "tan": math.tan,
    "asin": _nan_on_domain(math.asin),
    "acos": _nan_on_domain(math.acos),
    "atan": math.atan,
    "atan2": math.atan2,
    "sinh": math.sinh,
    "cosh": math.cosh,
    "tanh": math.tanh,
    # Spark COT(0) is +inf (1/tan); math has no cot
    "cot": lambda x: 1.0 / math.tan(x) if math.tan(x) != 0 else float("inf"),
    "degrees": math.degrees,
    "radians": math.radians,
    # Spark SIGN/SIGNUM returns DOUBLE (Derby returns INTEGER — Spark
    # semantics win here, as for division)
    "sign": lambda x: float((x > 0) - (x < 0)),
}


def _eval_cast(v, type_str: str):
    """Row-at-a-time CAST with Spark/Derby semantics (ANSI: malformed
    string casts raise, float->int truncates toward zero, decimal
    rounds HALF_UP). NULL passes through every cast."""
    import datetime
    import decimal
    import re as _re

    if v is None:
        return None
    base = type_str.split("(")[0]
    if base in ("int", "integer", "smallint", "tinyint", "bigint", "long"):
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, str):
            return int(v.strip())  # raises on malformed, like ANSI
        if isinstance(v, decimal.Decimal):
            return int(v.to_integral_value(rounding=decimal.ROUND_DOWN))
        return int(v)  # float truncates toward zero (Spark/Derby; DuckDB rounds)
    if base in ("double", "float", "real"):
        return float(v)
    if base in ("decimal", "numeric"):
        m = _re.match(r"^[a-z]+\((\d+)(?:,(\d+))?\)$", type_str)
        scale = int(m.group(2) or 0) if m else 0
        return decimal.Decimal(str(v)).quantize(
            decimal.Decimal(1).scaleb(-scale), rounding=decimal.ROUND_HALF_UP
        )
    if base in ("varchar", "char", "string"):
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, datetime.datetime):
            return v.strftime("%Y-%m-%d %H:%M:%S")
        if isinstance(v, datetime.date):
            return v.isoformat()
        return str(v)
    if base == "date":
        if isinstance(v, datetime.datetime):
            return v.date()
        if isinstance(v, datetime.date):
            return v
        return datetime.date.fromisoformat(str(v).strip())
    if base == "timestamp":
        if isinstance(v, datetime.datetime):
            return v
        if isinstance(v, datetime.date):
            return datetime.datetime(v.year, v.month, v.day)
        return datetime.datetime.fromisoformat(str(v).strip())
    if base == "boolean":
        if isinstance(v, bool):
            return v
        if isinstance(v, str):
            s = v.strip().lower()
            if s in ("true", "t", "yes", "y", "1"):
                return True
            if s in ("false", "f", "no", "n", "0"):
                return False
            raise ValueError(f"cannot cast {v!r} to boolean")
        return bool(v)
    raise TypeError(f"unknown CAST target {type_str!r}")


def _like_match(value: str, pattern: str) -> bool:
    """SQL LIKE for the row evaluator: % = any run, _ = one char,
    everything else literal, full-string anchored (Derby semantics)."""
    import re as _re

    rx = "".join(
        ".*" if ch == "%" else "." if ch == "_" else _re.escape(ch)
        for ch in pattern
    )
    return _re.fullmatch(rx, value, flags=_re.DOTALL) is not None


def _eval_cond(ast, row):
    """SQL three-valued logic: returns True, False, or None."""
    if isinstance(ast, Cmp):
        left = eval_expr(ast.left, row)
        right = eval_expr(ast.right, row)
        if left is None or right is None:
            return None
        if ast.op == "=":
            return left == right
        if ast.op == "<>":
            return left != right
        if ast.op == "<":
            return left < right
        if ast.op == ">":
            return left > right
        if ast.op == "<=":
            return left <= right
        return left >= right
    if isinstance(ast, NullTest):
        v = eval_expr(ast.operand, row)
        return (v is not None) if ast.negated else (v is None)
    if isinstance(ast, LikeTest):
        v = eval_expr(ast.operand, row)
        if v is None:
            return None
        res = _like_match(str(v), ast.pattern)
        return (not res) if ast.negated else res
    if isinstance(ast, InList):
        v = eval_expr(ast.operand, row)
        if v is None:
            return None
        vals = [eval_expr(i, row) for i in ast.items]
        if any(x is not None and x == v for x in vals):
            res: bool | None = True
        elif any(x is None for x in vals):
            res = None  # no match but a NULL member: unknown
        else:
            res = False
        if res is None:
            return None
        return (not res) if ast.negated else res
    if isinstance(ast, RangeTest):
        v = eval_expr(ast.operand, row)
        lo = eval_expr(ast.lo, row)
        hi = eval_expr(ast.hi, row)
        if v is None or lo is None or hi is None:
            return None
        res = lo <= v <= hi
        return (not res) if ast.negated else res
    if isinstance(ast, BoolOp):
        vals = [_eval_cond(p, row) for p in ast.parts]
        if ast.op == "and":
            if any(v is False for v in vals):
                return False
            return None if any(v is None for v in vals) else True
        if any(v is True for v in vals):
            return True
        return None if any(v is None for v in vals) else False
    if isinstance(ast, NotOp):
        v = _eval_cond(ast.operand, row)
        return None if v is None else (not v)
    raise TypeError(f"unknown condition node {ast!r}")
