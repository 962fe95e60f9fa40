"""Multi-lookup composition == LookupProcessor#enhance
(lookup_processor.rb:46-48) + the plugin's matched gate
(jdbc_static.rb:154-157).

All lookups are applied "sequentially" in spec order — in Spark that is a
chain of narrow enrichments over one DataFrame, compiled into a single
Catalyst plan. Tags are appended (never overwritten, dedup like
LogStash::Event#tag) in lookup order: per-lookup failure tags, then
default-use tags (lookup.rb:119-129).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from logstash_filter_jdbc_static_spark.operators.lookup import (
    DEFAULT_INLINE_THRESHOLD,
    CompiledLookup,
)
from logstash_filter_jdbc_static_spark.spec import PipelineSpec, ValidationError

MATCHED_COL = "matched"
TAGS_COL = "tags"


class LookupEnricher:
    """Compiles every lookup in a PipelineSpec against its dimension
    DataFrame and applies them as one chained transformation."""

    def __init__(
        self,
        spec: PipelineSpec,
        dims: dict[str, DataFrame],
        inline_threshold: int = DEFAULT_INLINE_THRESHOLD,
        row_key: tuple[str, ...] = ("conv_id", "turn_idx"),
    ):
        self.spec = spec
        self.compiled: list[CompiledLookup] = []
        for lk in spec.lookups:
            from logstash_filter_jdbc_static_spark.operators.lookup import (
                parse_lookup_query,
            )

            table = parse_lookup_query(lk.query).table
            if table not in dims:
                raise ValidationError(
                    [f"lookup '{lk.id}' references unknown local table '{table}'"]
                )
            self.compiled.append(
                CompiledLookup(lk, dims[table], inline_threshold, row_key)
            )

    def apply(self, fact: DataFrame, drop_status: bool = True) -> DataFrame:
        df = fact
        if TAGS_COL not in df.columns:
            df = df.withColumn(TAGS_COL, F.array().cast(T.ArrayType(T.StringType())))
        status_cols: list[str] = []
        ok_cols: list[str] = []
        for cl in self.compiled:
            df = cl.apply(df)
            sid = cl.spec.id
            failed, default_used, ok = (
                f"__{sid}_failed", f"__{sid}_default_used", f"__{sid}_ok",
            )
            # tag ordering: failure tags then default tags, per lookup
            # (lookup.rb:88-99 calls tag_failure / tag_default in sequence)
            tags = F.col(TAGS_COL)
            if cl.spec.tag_on_failure:
                tags = F.when(
                    F.col(failed),
                    F.array_union(tags, F.array(*[F.lit(t) for t in cl.spec.tag_on_failure])),
                ).otherwise(tags)
            if cl.spec.tag_on_default_use:
                tags = F.when(
                    F.col(default_used),
                    F.array_union(
                        tags, F.array(*[F.lit(t) for t in cl.spec.tag_on_default_use])
                    ),
                ).otherwise(tags)
            df = df.withColumn(TAGS_COL, tags)
            status_cols += [failed, default_used]
            ok_cols.append(ok)
        matched = F.lit(True)
        for c in ok_cols:
            matched = matched & F.col(c)
        df = df.withColumn(MATCHED_COL, matched)
        if drop_status:
            df = df.drop(*status_cols, *ok_cols)
        return df
