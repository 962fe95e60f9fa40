"""Sequence packing: group documents into fixed token-budget packs —
the pretraining-data step that turns a curated corpus into
training-sequence bins (each pack's token total <= budget).

Spark shape: greedy first-fit is inherently sequential, so it runs
per-SHARD — a deterministic hash shard of bounded size — inside
``applyInPandas`` (Arrow batches, no per-row Python). Shards pack in
parallel across the cluster; the only shuffle is the groupBy(shard).
Packing quality is per-shard greedy (the industry-standard
approximation); a doc larger than the budget gets a pack of its own.

Determinism: shard = xxhash64(doc_id) % n_shards, fill order = doc_id
ascending within the shard — same input, same packs, any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("pack_id", T.LongType(), False),
    ]
)


def pack_documents(
    df: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    n_shards: int = 64,
    shard_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, shard, pack_id): greedy first-fit packing of
    each shard's docs (doc_id order) into packs of <= ``budget`` tokens.
    pack_id is globally unique: shard * 2^32 + local pack index.

    ``shard_col``: use an existing int column as the shard instead of
    the default xxhash64 shard — any deterministic bounded-cardinality
    expression works (the packing is per-shard greedy either way); a
    portable shard (e.g. ``doc_id % n``) makes the whole operator
    cross-engine checkable, since greedy first-fit is expressible as a
    recursive CTE over the same shard/fill order."""
    import pandas as pd

    shard_expr = (
        F.col(shard_col).cast("int")
        if shard_col is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    )
    sharded = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(token_col).cast("long").alias("n_tokens"),
        shard_expr.alias("shard"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        shard = int(pdf["shard"].iloc[0])
        base = shard << 32
        pack_ids = []
        fill, local = 0, 0
        for tok in pdf["n_tokens"]:
            t = min(int(tok), budget)
            if fill > 0 and fill + t > budget:
                local += 1
                fill = 0
            pack_ids.append(base + local)
            fill += t
        pdf["pack_id"] = pack_ids
        return pdf[["doc_id", "n_tokens", "shard", "pack_id"]]

    return sharded.groupBy("shard").applyInPandas(pack, schema=PACKED_SCHEMA)


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-pack fill statistics (the packing-efficiency report)."""
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.least(F.col("n_tokens"), F.lit(budget))).alias("n_tokens_capped"),
        F.sum("n_tokens").alias("n_tokens_raw"),
    )
