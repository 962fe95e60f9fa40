"""The core enrichment operator: cached-dimension lookup as Spark joins.

Reference semantics being reproduced (all cited file:line into
/root/reference/lib/logstash/filters/jdbc/):

- A5 point/pattern lookup: per event, bind fields into lookup SQL, run
  against local Derby, collect all rows as array of hashes
  (lookup.rb:83-104, 131-156, 158-183).
- A6 named :param binding via Getfier (direct field) / Sprintfier
  (%{...} template) (lookup.rb:9-35, 198-200).
- A7 prepared ? positional binding (lookup.rb:106-115, 224-235).
- A8 invalid parameters: sprintf found no field, or field is
  nil/Hash/Array (lookup.rb:14-21, 28-35); SQL errors mark failed
  (lookup.rb:148-152).
- A9 tag_on_failure (lookup.rb:88-91, 119-123), A10 default_hash +
  tag_on_default_use on valid-but-empty (lookup.rb:93-99, 125-129),
  A11 target write as deep-cloned array-of-hashes (lookup.rb:144-147,
  185-188), A12 sequential multi-lookup with all-valid => matched
  (lookup_processor.rb:46-48, jdbc_static.rb:154-157).

Spark-first physical design (NOT a port of the Derby execution path):

- **Equi lookups** (``WHERE k = :p [AND k2 = :p2]``): the dimension is
  pre-grouped by join key into one ``array<struct>`` row per key, then
  LEFT-joined with an explicit ``F.broadcast`` hint.  The fact side never
  shuffles, never fans out, and needs no regroup — this is the 100 TB
  path.  The dim-side groupBy is bounded by ``max_rows`` (loader.rb:73).
- **Pattern/theta lookups** (``WHERE k LIKE :p``, other non-equi ops):
  if the dim is small (<= ``inline_threshold`` rows) the whole dimension
  is inlined as a literal array-of-structs expression and the lookup
  becomes ``F.filter(dim_array, r -> predicate)`` — a pure projection
  inside whole-stage codegen, zero joins, zero shuffles.  Larger dims
  are probed per DISTINCT parameter tuple: the slim tuple projection is
  ``distinct()``-ed (the only shuffle, a few small columns), theta-joined
  once against the broadcast dim, aggregated into a tuple->payload map,
  and the map is broadcast back onto the untouched fact with a null-safe
  hash join.  The fact side never shuffles and never fans out, and the
  theta probe runs |distinct tuples| x |dim| times instead of
  |fact| x |dim| — the decisive ratio at 10^12 turns, where parameter
  tuples come from low-cardinality fields (tool/server names).  The BNLJ
  cost stays bounded by ``max_rows`` exactly as the reference's Derby
  table scan is; ``pattern_strategy="shuffle_map"`` covers the
  adversarial near-unique-tuple case (map too big to broadcast) by
  joining the map back on its shuffle keys instead.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F, types as T

from logstash_filter_jdbc_static_spark.spec import (
    LookupSpec,
    ValidationError,
    is_sprintf,
)

DEFAULT_INLINE_THRESHOLD = 1024

_FIELD_REF_RE = re.compile(r"\[([^\]]+)\]")
_SPRINTF_SPLIT_RE = re.compile(r"(%\{[^}]+\})")

def _resolve_field_path(ref: str, schema: T.StructType) -> tuple[Column | None, bool]:
    """Resolve a Logstash field reference (``[a][b]`` or plain ``a``) to a
    Column against a fixed fact schema.

    Returns (column, exists). Nested segments traverse structs
    (``getField``) and maps (``getItem``) — the MapType column plays the
    role of the event's dynamic fields (lookup.rb:29).
    """
    segments = _FIELD_REF_RE.findall(ref) or [ref]
    head, rest = segments[0], segments[1:]
    dtype: T.DataType | None = None
    for f in schema.fields:
        if f.name == head:
            dtype = f.dataType
            break
    if dtype is None:
        return None, False
    col = F.col(head)
    for seg in rest:
        if isinstance(dtype, T.StructType):
            names = {f.name: f.dataType for f in dtype.fields}
            if seg not in names:
                return None, False
            col = col.getField(seg)
            dtype = names[seg]
        elif isinstance(dtype, T.MapType):
            col = col.getItem(seg)
            dtype = dtype.valueType
        else:
            return None, False
    return col, True


@dataclass
class BoundParam:
    """A lookup parameter bound to the event/fact schema.

    ``value``: the derived key column; ``valid``: per-row validity
    predicate (A8); ``static_invalid``: known-at-compile-time failure
    (sprintf referencing a missing field, lookup.rb:14-21, or a
    Hash/Array-typed field, lookup.rb:28-35).
    """

    name: str
    value: Column
    valid: Column
    static_invalid: bool = False


def bind_param(binding: str, schema: T.StructType, name: str) -> BoundParam:
    """Getfier / Sprintfier dispatch (lookup.rb:198-200)."""
    if is_sprintf(binding):
        # Sprintfier: interleave literal text with field values
        # (lookup.rb:9-21). Any missing/null field => param invalid.
        parts = [p for p in _SPRINTF_SPLIT_RE.split(binding) if p != ""]
        cols: list[Column] = []
        valid = F.lit(True)
        static_invalid = False
        for part in parts:
            if part.startswith("%{") and part.endswith("}"):
                ref = part[2:-1]
                col, exists = _resolve_field_path(ref, schema)
                if not exists:
                    static_invalid = True
                    cols.append(F.lit(None).cast("string"))
                else:
                    cols.append(col.cast("string"))
                    valid = valid & col.isNotNull()
            else:
                cols.append(F.lit(part))
        value = F.concat(*cols) if len(cols) > 1 else cols[0]
        if static_invalid:
            valid = F.lit(False)
        return BoundParam(name, value, valid, static_invalid)
    # Getfier: direct event.get (lookup.rb:23-35). nil/Hash/Array invalid.
    col, exists = _resolve_field_path(binding, schema)
    if not exists:
        return BoundParam(name, F.lit(None).cast("string"), F.lit(False), True)
    dtype = None
    segments = _FIELD_REF_RE.findall(binding) or [binding]
    cur: T.DataType = schema
    ok = True
    for seg in segments:
        if isinstance(cur, T.StructType):
            match = [f.dataType for f in cur.fields if f.name == seg]
            if not match:
                ok = False
                break
            cur = match[0]
        elif isinstance(cur, T.MapType):
            cur = cur.valueType
        else:
            ok = False
            break
    dtype = cur if ok else None
    if isinstance(dtype, (T.MapType, T.ArrayType, T.StructType)):
        # "Field <x> is of unsupported type" — always invalid (lookup.rb:28-35)
        return BoundParam(name, F.lit(None).cast("string"), F.lit(False), True)
    return BoundParam(name, col, col.isNotNull(), False)


@dataclass
class _Predicate:
    dim_column: str
    op: str  # '=', 'like', '>', ...
    param: str | None  # placeholder name; None when rhs is a literal
    literal: str | None = None


@dataclass
class ParsedQuery:
    projection: list[tuple[str, str]] | None  # (source, alias); None == SELECT *
    table: str
    predicates: list[_Predicate] = field(default_factory=list)

    @property
    def is_pure_equi(self) -> bool:
        return all(p.op == "=" and p.param is not None for p in self.predicates)


_QUERY_RE = re.compile(
    r"^\s*select\s+(?P<proj>.+?)\s+from\s+(?P<table>[A-Za-z_][\w.]*)"
    r"(?:\s+where\s+(?P<where>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_PRED_RE = re.compile(
    r"^\s*(?P<col>[A-Za-z_][\w]*)\s*(?P<op>=|<>|!=|<=|>=|<|>|like)\s*(?P<rhs>.+?)\s*$",
    re.IGNORECASE,
)


def parse_lookup_query(query: str) -> ParsedQuery:
    """Parse the SQL shapes the reference's docs+specs exercise
    (SURVEY 2B): projection with aliases or ``*``, single table, optional
    conjunctive WHERE of ``col <op> (:name | ? | literal)``.
    """
    m = _QUERY_RE.match(query)
    if not m:
        raise ValidationError([f"unsupported lookup query shape: {query!r}"])
    proj_raw = m.group("proj").strip()
    projection: list[tuple[str, str]] | None
    if proj_raw == "*":
        projection = None
    else:
        projection = []
        for item in proj_raw.split(","):
            parts = re.split(r"\s+as\s+", item.strip(), flags=re.IGNORECASE)
            if len(parts) == 2:
                projection.append((parts[0].strip(), parts[1].strip()))
            else:
                projection.append((item.strip(), item.strip()))
    predicates: list[_Predicate] = []
    where = m.group("where")
    positional = 0
    if where:
        for clause in re.split(r"\s+and\s+", where, flags=re.IGNORECASE):
            pm = _PRED_RE.match(clause)
            if not pm:
                raise ValidationError([f"unsupported lookup predicate: {clause!r}"])
            rhs = pm.group("rhs").strip()
            op = pm.group("op").lower()
            if rhs == "?":
                predicates.append(_Predicate(pm.group("col"), op, f"p{positional}"))
                positional += 1
            elif rhs.startswith(":"):
                predicates.append(_Predicate(pm.group("col"), op, rhs[1:]))
            elif rhs.startswith("'") and rhs.endswith("'"):
                predicates.append(
                    _Predicate(pm.group("col"), op, None, rhs[1:-1].replace("''", "'"))
                )
            else:
                raise ValidationError([f"unsupported lookup predicate rhs: {rhs!r}"])
    return ParsedQuery(projection, m.group("table"), predicates)


class CompiledLookup:
    """One lookup compiled against a dimension DataFrame.

    Produces, when applied to a fact DataFrame:
      - ``<target>``: array<struct> payload column (A11) — null when the
        lookup failed (target untouched in the reference), ``[]`` on
        valid-but-empty without default (spec/filters/jdbc_static_spec.rb:98-105),
        ``[default_hash]`` on miss with default (A10)
      - ``__<id>_ok``: the boolean the lookup returns (A12's matched gate)
      - ``__<id>_failed`` / ``__<id>_default_used``: tag drivers
    """

    def __init__(
        self,
        spec: LookupSpec,
        dim_df: DataFrame,
        inline_threshold: int = DEFAULT_INLINE_THRESHOLD,
        row_key: list[str] = ("conv_id", "turn_idx"),
        dim_rows: int | None = None,
        pattern_strategy: str = "broadcast_map",
    ):
        spec.raise_if_invalid()
        self.spec = spec
        self.query = parse_lookup_query(spec.query)
        self.dim_df = dim_df
        self.inline_threshold = inline_threshold
        self.row_key = list(row_key)
        if pattern_strategy not in ("broadcast_map", "shuffle_map"):
            raise ValidationError(
                [f"lookup '{spec.id}': unknown pattern_strategy "
                 f"{pattern_strategy!r} (broadcast_map | shuffle_map)"]
            )
        self.pattern_strategy = pattern_strategy
        if dim_rows is not None:
            # The A2 guard (fetch_with_guard) already counted the pinned
            # snapshot; reuse it instead of re-firing an eager count()
            # during plan construction.
            self._dim_count_cache = dim_rows
        # Resolve projection against the dim schema.
        dim_fields = {f.name: f.dataType for f in dim_df.schema.fields}
        if self.query.projection is None:
            self.out_fields = [(f.name, f.name) for f in dim_df.schema.fields]
        else:
            for src, _ in self.query.projection:
                if src not in dim_fields:
                    raise ValidationError(
                        [f"lookup '{spec.id}': column '{src}' not in table '{self.query.table}'"]
                    )
            self.out_fields = list(self.query.projection)
        for p in self.query.predicates:
            if p.dim_column not in dim_fields:
                raise ValidationError(
                    [f"lookup '{spec.id}': predicate column '{p.dim_column}' "
                     f"not in table '{self.query.table}'"]
                )
        # Map placeholder name -> event binding string.
        if spec.prepared_parameters is not None:
            self.bindings = {f"p{i}": v for i, v in enumerate(spec.prepared_parameters)}
        else:
            self.bindings = dict(spec.parameters or {})
        needed = [p.param for p in self.query.predicates if p.param is not None]
        missing = [n for n in needed if n not in self.bindings]
        if missing:
            raise ValidationError(
                [f"lookup '{spec.id}': no binding for placeholder(s) {missing}"]
            )
        self._payload_struct = self._payload_struct_type()
        self._default_array = self._build_default_array()

    # ---- payload/result shapes -------------------------------------
    def _payload_struct_type(self) -> T.StructType:
        dim_fields = {f.name: f.dataType for f in self.dim_df.schema.fields}
        return T.StructType(
            [T.StructField(alias, dim_fields[src], True) for src, alias in self.out_fields]
        )

    def _build_default_array(self) -> Column | None:
        """[default_hash] payload (lookup.rb:239-245, 93-99)."""
        if not self.spec.use_default:
            return None
        dh = self.spec.default_hash or {}
        aliases = [a for _, a in self.out_fields]
        unknown = [k for k in dh if k not in aliases]
        if unknown:
            raise ValidationError(
                [f"lookup '{self.spec.id}': default_hash keys {unknown} are not "
                 f"in the lookup projection {aliases}"]
            )
        cols = []
        for (src, alias), fld in zip(self.out_fields, self._payload_struct.fields):
            if alias in dh:
                cols.append(F.lit(dh[alias]).cast(fld.dataType).alias(alias))
            else:
                cols.append(F.lit(None).cast(fld.dataType).alias(alias))
        return F.array(F.struct(*cols))

    # ---- physical strategies ----------------------------------------
    def _grouped_dim(self) -> tuple[DataFrame, list[str]]:
        """Equi path: dim grouped by key -> one array<struct> per key."""
        key_cols = []
        dim = self.dim_df
        for i, p in enumerate(self.query.predicates):
            if p.param is not None:
                key_cols.append((f"__k{i}", p.dim_column))
            else:
                dim = dim.filter(F.col(p.dim_column) == F.lit(p.literal))
        payload = F.struct(
            *[F.col(src).alias(alias) for src, alias in self.out_fields]
        )
        keys = [F.col(src).alias(k) for k, src in key_cols]
        grouped = (
            dim.groupBy(*keys)
            .agg(F.sort_array(F.collect_list(payload)).alias("__payload"))
        )
        return grouped, [k for k, _ in key_cols]

    def _param_cols(self, schema: T.StructType) -> dict[str, BoundParam]:
        return {
            name: bind_param(binding, schema, name)
            for name, binding in self.bindings.items()
        }

    def _validity(self, params: dict[str, BoundParam]) -> Column:
        if not params:
            return F.lit(True)
        valid = F.lit(True)
        for bp in params.values():
            valid = valid & bp.valid
        return valid

    def apply(self, fact: DataFrame) -> DataFrame:
        """Enrich ``fact`` with this lookup's target + status columns."""
        params = self._param_cols(fact.schema)
        valid = self._validity(params)
        sid = self.spec.id
        ok_col, failed_col, default_col = (
            f"__{sid}_ok", f"__{sid}_failed", f"__{sid}_default_used",
        )
        if self.query.is_pure_equi and self.query.predicates:
            enriched = self._apply_equi(fact, params)
        elif self.inline_threshold > 0 and self._dim_count() <= self.inline_threshold:
            # threshold 0 pins the map-probe path WITHOUT paying the
            # eager dim count the comparison would otherwise need
            enriched = self._apply_inline(fact, params)
        else:
            enriched = self._apply_bnlj(fact, params)
        # Outcome logic (lookup.rb:83-104): invalid => failed, target
        # untouched; valid+empty+default => default payload + default tag;
        # valid otherwise => payload ([] when empty, no default).
        raw = F.col("__raw_payload")
        empty = raw.isNull() | (F.size(raw) == 0)
        target_expr = (
            F.when(~valid, F.lit(None).cast(T.ArrayType(self._payload_struct)))
            .when(
                empty,
                self._default_array
                if self._default_array is not None
                else F.array().cast(T.ArrayType(self._payload_struct)),
            )
            .otherwise(raw)
        )
        return (
            enriched.withColumn(self.spec.target, target_expr)
            .withColumn(failed_col, ~valid)
            .withColumn(default_col, valid & empty & F.lit(self.spec.use_default))
            .withColumn(ok_col, valid)
            .drop("__raw_payload")
        )

    def _dim_count(self) -> int:
        if not hasattr(self, "_dim_count_cache"):
            self._dim_count_cache = self.dim_df.count()
        return self._dim_count_cache

    def _apply_equi(self, fact: DataFrame, params: dict[str, BoundParam]) -> DataFrame:
        """Broadcast hash equi-join against the key-grouped dim — the
        index-backed point lookup (db_object.rb:19) done set-at-a-time."""
        grouped, key_names = self._grouped_dim()
        with_keys = fact
        conds = []
        for i, p in enumerate(self.query.predicates):
            if p.param is None:
                continue
            bp = params[p.param]
            kc = f"__fk_{self.spec.id}_{i}"
            with_keys = with_keys.withColumn(kc, bp.value)
            conds.append(F.col(kc).eqNullSafe(grouped[f"__k{i}"]))
        cond = conds[0]
        for c in conds[1:]:
            cond = cond & c
        joined = with_keys.join(F.broadcast(grouped), cond, "left")
        drop_cols = [f"__k{i}" for i in range(len(self.query.predicates))
                     if self.query.predicates[i].param is not None]
        drop_cols += [c for c in with_keys.columns if c.startswith(f"__fk_{self.spec.id}_")]
        return joined.withColumnRenamed("__payload", "__raw_payload").drop(*drop_cols)

    def _dim_literal_array(self) -> Column:
        """Inline the (small) dim as a literal array<struct> expression."""
        rows = self.dim_df.collect()
        structs = []
        dim_fields = [(f.name, f.dataType) for f in self.dim_df.schema.fields]
        for r in rows:
            structs.append(
                F.struct(
                    *[F.lit(r[n]).cast(dt).alias(n) for n, dt in dim_fields]
                )
            )
        if not structs:
            return F.array().cast(
                T.ArrayType(T.StructType(
                    [T.StructField(n, dt, True) for n, dt in dim_fields]
                ))
            )
        return F.array(*structs)

    def _row_predicate(self, row: Column, rhs_cols: list[Column]) -> Column:
        """Predicate over one inlined dim row; ``rhs_cols`` holds one
        pre-staged rhs per predicate (LIKE patterns already compiled to
        anchored regexes — see _apply_inline)."""
        cond = F.lit(True)
        for p, rhs in zip(self.query.predicates, rhs_cols):
            lhs = row.getField(p.dim_column)
            if p.op == "=":
                c = lhs == rhs
            elif p.op == "like":
                c = F.rlike(lhs, rhs)
            elif p.op in ("<>", "!="):
                c = lhs != rhs
            elif p.op == "<":
                c = lhs < rhs
            elif p.op == ">":
                c = lhs > rhs
            elif p.op == "<=":
                c = lhs <= rhs
            else:
                c = lhs >= rhs
            cond = cond & c
        return cond

    def _project_struct(self, row: Column) -> Column:
        return F.struct(
            *[row.getField(src).alias(alias) for src, alias in self.out_fields]
        )

    def _apply_inline(self, fact: DataFrame, params: dict[str, BoundParam]) -> DataFrame:
        """Small-dim theta lookup as a pure projection: filter a literal
        array-of-structs — no join, no shuffle, stays in codegen.

        Every predicate rhs is staged into a column FIRST: non-lambda
        subtrees inside higher-order-function lambdas are re-evaluated
        per array element, so an inlined Sprintfier/LIKE-regex derivation
        would otherwise run dim_count times per row (the same trap as the
        19x shingle slowdown fixed in dedup.py). LIKE patterns are
        compiled to their anchored regex once per row here, leaving only
        the rlike probe per dim element."""
        sid = self.spec.id
        staged = fact
        rhs_cols: list[Column] = []
        tmp: list[str] = []
        for i, p in enumerate(self.query.predicates):
            if p.param is None:
                lit = F.lit(p.literal)
                # literal LIKE patterns compile here (constant-folded)
                rhs_cols.append(_like_regex(lit) if p.op == "like" else lit)
                continue
            val = params[p.param].value
            if p.op == "like":
                val = _like_regex(val)
            c = f"__pv_{sid}_{i}"
            staged = staged.withColumn(c, val)
            tmp.append(c)
            rhs_cols.append(F.col(c))
        arr = self._dim_literal_array()
        matched = F.filter(arr, lambda r: self._row_predicate(r, rhs_cols))
        payload = F.sort_array(F.transform(matched, self._project_struct))
        return staged.withColumn("__raw_payload", payload).drop(*tmp)

    def _apply_bnlj(self, fact: DataFrame, params: dict[str, BoundParam]) -> DataFrame:
        """Large-dim theta lookup, probed per DISTINCT parameter tuple.

        The naive shape — BNLJ every fact row against the dim, then
        regroup the fan-out — shuffles the whole fact (every column) on
        the hot path; at 10^12 turns that regroup is the single most
        expensive operation in the job. Instead:

        1. derive the parameter tuple per fact row (narrow projection);
        2. ``distinct()`` the slim tuple projection — the only shuffle,
           and it carries just the few key columns;
        3. theta-join the distinct tuples against the broadcast dim and
           aggregate matches into one sorted payload array per tuple
           (probe cost |tuples| x |dim| instead of |fact| x |dim|);
        4. map the tuple->payload table back onto the untouched fact with
           a null-safe broadcast hash join — no fact shuffle, no fan-out
           (the map has exactly one row per tuple, including the
           all-null tuple from invalid params).

        ``pattern_strategy="shuffle_map"`` swaps step 4's broadcast for a
        plain shuffle join — for the adversarial case where tuples are
        near-unique per row and the map outgrows broadcast. That path
        DOES shuffle the fact once, hashpartitioned on the tuple keys
        (both join sides exchange); what it still avoids vs the old
        regroup is the fan-out (one map row per tuple, so no
        first()-per-column re-aggregation) and the |fact| x |dim| probe.
        Only broadcast_map keeps the fact fully shuffle-free."""
        sid = self.spec.id
        with_keys = fact
        fk_names: list[str] = []   # staged tuple cols on the fact
        mk_names: list[str] = []   # same tuple cols on the map side
        like_idx: set[int] = set()
        for i, p in enumerate(self.query.predicates):
            if p.param is None:
                continue
            fk = f"__fk_{sid}_{i}"
            # Stage the RAW parameter value: the fact side only needs the
            # tuple for distinct() + the equality map-back, so the
            # LIKE->regex rewrite runs once per DISTINCT tuple on the map
            # side (a few rows) instead of per fact row, and the join key
            # stays the short raw value rather than the expanded regex.
            if p.op == "like":
                like_idx.add(i)
            with_keys = with_keys.withColumn(fk, params[p.param].value)
            fk_names.append(fk)
            mk_names.append(f"__mk_{sid}_{i}")

        dim_alias = f"__dim_{sid}"
        dim = self.dim_df.select(
            F.struct(*[F.col(f.name) for f in self.dim_df.schema.fields]).alias(
                dim_alias
            )
        )

        def probe_cond(rhs_for) -> Column:
            cond = F.lit(True)
            for i, p in enumerate(self.query.predicates):
                lhs = F.col(dim_alias).getField(p.dim_column)
                if p.param is not None:
                    rhs = rhs_for(i)
                elif p.op == "like":
                    # literal pattern: compile here; Catalyst constant-folds
                    rhs = _like_regex(F.lit(p.literal))
                else:
                    rhs = F.lit(p.literal)
                if p.op == "like":
                    c = F.rlike(lhs, rhs)  # rhs pre-compiled
                elif p.op == "=":
                    c = lhs == rhs
                elif p.op in ("<>", "!="):
                    c = lhs != rhs
                elif p.op == "<":
                    c = lhs < rhs
                elif p.op == ">":
                    c = lhs > rhs
                elif p.op == "<=":
                    c = lhs <= rhs
                else:
                    c = lhs >= rhs
                cond = cond & c
            return cond

        payload_arr = F.sort_array(
            F.filter(
                F.collect_list(
                    F.when(
                        F.col(dim_alias).isNotNull(),
                        self._project_struct(F.col(dim_alias)),
                    )
                ),
                lambda x: x.isNotNull(),
            )
        )
        if fk_names:
            tuples = with_keys.select(
                *[F.col(f).alias(m) for f, m in zip(fk_names, mk_names)]
            ).distinct()
            # Materialize the compiled regex as a COLUMN on the tuple
            # frame (once per distinct tuple) — an inline rewrite in the
            # join condition would re-run per (tuple, dim) pair.
            tuples = tuples.select(
                "*",
                *[
                    _like_regex(F.col(f"__mk_{sid}_{i}")).alias(f"__rx_{sid}_{i}")
                    for i in sorted(like_idx)
                ],
            )
            probed = tuples.join(
                F.broadcast(dim),
                probe_cond(
                    lambda i: F.col(f"__rx_{sid}_{i}")
                    if i in like_idx
                    else F.col(f"__mk_{sid}_{i}")
                ),
                "left",
            )
            key_payload = probed.groupBy(*mk_names).agg(
                payload_arr.alias("__raw_payload")
            )
            back = F.lit(True)
            for f, m in zip(fk_names, mk_names):
                back = back & F.col(f).eqNullSafe(F.col(m))
            if self.pattern_strategy == "broadcast_map":
                key_payload = F.broadcast(key_payload)
            joined = with_keys.join(key_payload, back, "left")
            return joined.drop(*fk_names, *mk_names)
        # No bound parameters: every fact row shares ONE payload (the dim
        # filtered by the literal predicates) — aggregate it to a single
        # row and broadcast-cross-join it on.
        single = (
            dim.filter(probe_cond(lambda i: None))
            .agg(payload_arr.alias("__raw_payload"))
        )
        return with_keys.crossJoin(F.broadcast(single))


def _like_regex(pattern: Column) -> Column:
    """Compile a SQL-LIKE pattern column to an anchored regex: % -> .*,
    _ -> . (with regex-quoting of the rest). Column.like() requires a
    literal pattern, so dynamic patterns go through rlike; the attested
    suffix/prefix shapes (`%X`, `X%`, spec/filters/jdbc_static_spec.rb:
    21-22,85) stay inside codegen."""
    quoted = F.regexp_replace(pattern, r"([\\^$.|?*+()\[\]{}])", r"\\$1")
    return F.concat(
        F.lit("^"),
        F.regexp_replace(F.regexp_replace(quoted, "%", ".*"), "_", "."),
        F.lit("$"),
    )

