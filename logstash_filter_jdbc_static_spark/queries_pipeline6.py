"""Sixth wave of gated queries: cluster-level dedup resolution and the
deterministic training-export shuffle — the two steps that turn the
near-dup PAIR detectors (queries_data) into an end-to-end curation
output a training pipeline can consume.

1. ``dedup_near_dup_clusters`` — connected components over the verified
   MinHash near-dup pairs + per-cluster canonical (min id) keep
   decision. Spark side: iterative hash-min label propagation
   (operators/dedup.connected_components); oracle side: DuckDB
   recursive-CTE transitive closure — the same fixpoint reached two
   entirely different ways.
2. ``documents_global_shuffle`` — seeded deterministic global shuffle:
   every document gets a shard (md5-derived, engine-portable nibble
   arithmetic) and a position within its shard. This is the standard
   "shuffle the corpus before training" export step; shard count maps
   to output file count at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from logstash_filter_jdbc_static_spark.operators import dedup as D
from logstash_filter_jdbc_static_spark.operators.processor import LookupEnricher
from logstash_filter_jdbc_static_spark.queries import register
from logstash_filter_jdbc_static_spark.queries_data import (
    _BAND_ROWS,
    _CORPUS_CTE,
    _N_PERM,
    _SHINGLE_K,
    _THRESH,
    _jaccard_pair_select,
    _lsh_pair_ctes,
    _shingles_cte,
    dedup_corpus,
)
from logstash_filter_jdbc_static_spark.sources.registry import load_table_split
from logstash_filter_jdbc_static_spark.sources.transcripts import (
    TRANSCRIPTS_CTE,
    load_transcripts,
    with_ctes,
)
from logstash_filter_jdbc_static_spark.spec import PipelineSpec

# ------------------------------------------------------------------
# 1. Near-dup cluster resolution: pairs -> components -> keep/drop.
#    The reference has no dedup at all; this is the LLM-data-pipeline
#    surface (SURVEY build plan) completed to a decision per document.
# ------------------------------------------------------------------

_CLUSTERS_SQL = (
    "WITH RECURSIVE "
    + _CORPUS_CTE
    + ",\n"
    + _shingles_cte("corpus")
    + ",\n"
    + ",\n".join(_lsh_pair_ctes())
    + ",\njpairs AS ("
    + _jaccard_pair_select()
    + """),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM jpairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM jpairs
),
reach(id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.id = e.dst
),
comp AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id)
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
       CAST(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM comp
"""
)


@register("dedup_near_dup_clusters", _CLUSTERS_SQL)
def dedup_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per document in any verified near-dup pair: its cluster
    (connected component, labeled by the component's min doc_id), the
    cluster size, and keep=1 on the canonical member only. Downstream
    curation anti-joins keep=0 ids out of the corpus."""
    pairs = D.minhash_lsh_dedup(
        dedup_corpus(spark, sf_dir),
        threshold=_THRESH,
        n_perm=_N_PERM,
        band_rows=_BAND_ROWS,
        shingle_k=_SHINGLE_K,
    ).select("id_a", "id_b")
    comp = D.connected_components(pairs)
    w = Window.partitionBy("cluster_id")
    return (
        comp.select(F.col("id").alias("doc_id"), "cluster_id")
        .withColumn("cluster_size", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn("keep", (F.col("doc_id") == F.col("cluster_id")).cast("int"))
    )


# ------------------------------------------------------------------
# 2. Deterministic global shuffle for training export. Portable shard
#    derivation: first 4 hex nibbles of md5(seed || doc_id) -> 0..65535
#    via explicit ascii arithmetic (identical integer math in Spark and
#    DuckDB; no engine-specific hash), mod n_shards. In-shard position
#    = rank by (full md5, doc_id). Scale shape: ONE shuffle partitioned
#    by shard + per-shard sort — exactly the physical plan of
#    df.repartition("shard").sortWithinPartitions(...) writing one file
#    per shard; n_shards is the output-file-count knob (raise it so
#    each shard fits an executor's sort buffer at 100 TB).
# ------------------------------------------------------------------

# ------------------------------------------------------------------
# 3. Multi-table lookup SQL: the dims are pre-joined once per snapshot
#    (build_join_dim) and the event-side probe stays on the key-grouped
#    broadcast-hash path — reference parity for lookup configs that
#    join local db_objects (Derby executes them verbatim,
#    lookup.rb:131-147). nkey spans 0..29 against 25 nations so misses
#    (empty payload) are exercised too.
# ------------------------------------------------------------------


@register(
    "lookup_join_dims",
    with_ctes(
        TRANSCRIPTS_CTE,
        body="""
        SELECT t.conv_id, t.turn_idx, t.nkey,
               CASE WHEN g.n_nationkey IS NULL THEN 0 ELSE 1 END AS n_matches,
               g.nation AS nation, g.region AS region
        FROM (SELECT conv_id, turn_idx, CAST(turn_idx % 30 AS BIGINT) AS nkey
              FROM transcripts) t
        LEFT JOIN (SELECT n.n_nationkey, n.n_name AS nation, r.r_name AS region
                   FROM nation n JOIN region r
                     ON n.n_regionkey = r.r_regionkey) g
          ON g.n_nationkey = t.nkey
        """,
    ),
)
def lookup_join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_transcripts(spark, sf_dir).withColumn(
        "nkey", (F.col("turn_idx") % 30).cast("long")
    )
    spec = PipelineSpec(
        lookups=[
            {
                "id": "geo",
                "query": (
                    "SELECT n.n_name AS nation, r.r_name AS region "
                    "FROM nation n JOIN region r "
                    "ON n.n_regionkey = r.r_regionkey "
                    "WHERE n.n_nationkey = :k"
                ),
                "parameters": {"k": "nkey"},
            }
        ]
    )
    dims = {
        "nation": load_table_split(spark, sf_dir, "nation"),
        "region": load_table_split(spark, sf_dir, "region"),
    }
    out = LookupEnricher(spec, dims).apply(t)
    return out.select(
        "conv_id",
        "turn_idx",
        "nkey",
        F.size("geo").cast("int").alias("n_matches"),
        F.get(F.col("geo"), 0).getField("nation").alias("nation"),
        F.get(F.col("geo"), 0).getField("region").alias("region"),
    )


_SHUFFLE_SEED = "42"
_N_SHARDS = 16


def _nib_sql(i: int) -> str:
    c = f"substr(h, {i}, 1)"
    return (
        f"(CASE WHEN {c} BETWEEN '0' AND '9' THEN ascii({c}) - 48 "
        f"ELSE ascii({c}) - 87 END)"
    )


_GLOBAL_SHUFFLE_SQL = f"""
WITH h AS (
  SELECT doc_id, md5('{_SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
sharded AS (
  SELECT doc_id, h,
         ({_nib_sql(1)} * 4096 + {_nib_sql(2)} * 256
          + {_nib_sql(3)} * 16 + {_nib_sql(4)}) % {_N_SHARDS} AS shard
  FROM h
)
SELECT doc_id, CAST(shard AS INTEGER) AS shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT)
         AS pos
FROM sharded
"""


def _nib(h, i: int):
    c = F.substring(h, i, 1)
    return F.ascii(c) - F.when(c.between("0", "9"), F.lit(48)).otherwise(F.lit(87))


@register("documents_global_shuffle", _GLOBAL_SHUFFLE_SQL)
def documents_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table_split(spark, sf_dir, "documents").select("doc_id")
    h = F.md5(F.concat(F.lit(_SHUFFLE_SEED + ":"), F.col("doc_id").cast("string")))
    sharded = docs.select(
        "doc_id",
        h.alias("h"),
    ).withColumn(
        "shard",
        (
            (_nib(F.col("h"), 1) * 4096 + _nib(F.col("h"), 2) * 256
             + _nib(F.col("h"), 3) * 16 + _nib(F.col("h"), 4)) % _N_SHARDS
        ).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return sharded.select(
        "doc_id", "shard", F.row_number().over(w).cast("long").alias("pos")
    )
