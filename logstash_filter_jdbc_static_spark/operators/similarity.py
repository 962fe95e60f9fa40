"""Similarity search over an embedding column (array<float>).

- Brute-force cosine top-k: the exactness baseline. Query set is small
  => broadcast it; each fact partition scores its rows against all
  queries locally (no shuffle of the corpus), then a per-query top-k via
  window. At 100 TB the corpus side streams; only candidate rows
  (corpus_size/queries * k) reach the final shuffle.
- Random-hyperplane LSH buckets: the scale path — a pure projection
  computing a sign-bit bucket per vector; ANN = equi-join on bucket.
  Hyperplane components are derived from md5 (data-independent,
  engine-portable).

Dot products use F.zip_with + F.aggregate (JVM codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

_ODD_NIBBLES = ["1", "3", "5", "7", "9", "b", "d", "f"]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per query vector: top-k corpus neighbors by cosine (excluding the
    query row itself). Deterministic tiebreak (sim desc, neighbor id asc).
    Returns (query_id, neighbor_id, rank, cos_sim)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def hyperplane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random component in [-7.5, 7.5]: first hex
    nibble of md5('<plane>:<dim>'). Same formula is inlined in the DuckDB
    oracle; no RNG, no seed state."""
    import hashlib

    h = hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()
    return int(h[0], 16) - 7.5


def lsh_bucket(
    vec_col: Column, n_planes: int = 8, n_dims: int = 64
) -> Column:
    """Sign-bit bucket string over n_planes random hyperplanes."""
    bits = []
    for p in range(n_planes):
        coeffs = F.array(
            *[F.lit(hyperplane_component(p, d)) for d in range(n_dims)]
        )
        proj = dot(vec_col, coeffs)
        bits.append(F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def ann_lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_dims: int = 64,
) -> DataFrame:
    """(vec_id, bucket) — candidate generation for ANN: vectors sharing a
    bucket are near-duplicate candidates; verify with cosine."""
    return df.select(
        F.col(id_col),
        lsh_bucket(F.col(vec_col), n_planes, n_dims).alias("bucket"),
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its ``n_probe``
    nearest centroids (broadcast the centroid list; top-P cosine,
    deterministic tiebreak by centroid id). At scale this is the
    partitioning step — the corpus is clustered by its single nearest
    cell (n_probe=1) and queries probe their top-P cells (n_probe=P),
    the standard recall/latency knob of a production IVF index."""
    c = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("c_vec")
    )
    scored = df.select(F.col(id_col), F.col(vec_col)).join(F.broadcast(c))
    w = Window.partitionBy(id_col).orderBy(
        F.col("c_sim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("c_sim", cosine(F.col(vec_col), F.col("c_vec")))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_probe)
        .select(id_col, "centroid_id", vec_col)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """IVF search: queries score corpus vectors in their ``n_probe``
    nearest cells. Returns (query_id, neighbor_id, rank, cos_sim) —
    approximate: recall rises with n_probe, exactly as a production IVF
    index. Each corpus vector lives in exactly one cell and probed cells
    are distinct, so no pair dedup is needed."""
    cells = ivf_assign(corpus, centroids, id_col, vec_col)
    q_cells = ivf_assign(queries, centroids, id_col, vec_col, n_probe).select(
        F.col(id_col).alias("query_id"),
        F.col("centroid_id"),
        F.col(vec_col).alias("q_vec"),
    )
    c_cells = cells.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("centroid_id"),
        F.col(vec_col).alias("c_vec"),
    )
    scored = (
        c_cells.join(F.broadcast(q_cells), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cos_sim")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_dims: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup: LSH-bucket candidates verified by exact
    cosine >= threshold. Returns (id_a, id_b, cos_sim)."""
    b = ann_lsh_buckets(df, id_col, vec_col, n_planes, n_dims)
    v = df.select(F.col(id_col), F.col(vec_col))
    a_side = b.alias("ba").join(v.alias("va"), id_col).select(
        F.col(id_col).alias("id_a"), F.col("bucket"), F.col(vec_col).alias("vec_a")
    )
    b_side = b.alias("bb").join(v.alias("vb"), id_col).select(
        F.col(id_col).alias("id_b"), F.col("bucket"), F.col(vec_col).alias("vec_b")
    )
    return (
        a_side.join(b_side, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
        .distinct()
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    n_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[tuple[int, list[float]]], list[float]]:
    """Spherical k-means (Lloyd) — the training step that turns the IVF
    index from a fixed-subset quantizer into a learned one. Iterative
    algorithm done Spark-shaped: the driver holds ONLY the k centroids
    (k * n_dims floats); each iteration is one broadcast-join assignment
    over the corpus (``ivf_assign``) plus a per-dimension mean
    (posexplode -> avg -> regroup) — no corpus data ever reaches the
    driver, so iterations cost O(corpus) cluster work and O(k*d) driver
    memory regardless of scale.

    Deterministic up to floating-point aggregation order: init = the k
    lowest-id vectors; assignment ties break by centroid id
    (ivf_assign); empty clusters keep their previous centroid. The mean
    update uses F.avg, whose partial-merge order is partition-dependent,
    so centroid coordinates are reproducible only for a fixed
    partitioning (same session/parallelism — what the tests pin); a
    vector lying within an ulp of two centroids could flip across
    differently-partitioned runs.

    Returns (final assignment df, centroids, mean-similarity history).
    """
    spark = df.sparkSession
    schema = f"{id_col} bigint, {vec_col} array<double>"
    init = df.orderBy(id_col).limit(k).select(vec_col).collect()
    cents: list[tuple[int, list[float]]] = [
        (i, [float(x) for x in r[vec_col]]) for i, r in enumerate(init)
    ]
    history: list[float] = []
    for _ in range(n_iters):
        c_df = spark.createDataFrame(cents, schema)
        assigned = ivf_assign(df, c_df, id_col, vec_col)
        with_sim = assigned.join(
            F.broadcast(
                c_df.select(
                    F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("c_vec")
                )
            ),
            "centroid_id",
        ).withColumn("sim", cosine(F.col(vec_col), F.col("c_vec")))
        # ONE job computes both the quality metric and the new means.
        upd = (
            with_sim.select(
                "centroid_id", "sim", F.posexplode(F.col(vec_col))
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg("col").alias("m"), F.avg("sim").alias("s"), F.count("*").alias("n"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.getField("m"),
                ).alias("vec"),
                F.first("s").alias("mean_sim"),
                F.first("n").alias("n_members"),
            )
            .collect()
        )
        by_id = {r["centroid_id"]: [float(x) for x in r["vec"]] for r in upd}
        total = sum(r["n_members"] for r in upd)
        history.append(
            float(sum(r["mean_sim"] * r["n_members"] for r in upd) / max(total, 1))
        )
        cents = [(cid, by_id.get(cid, vec)) for cid, vec in cents]
    final = ivf_assign(df, spark.createDataFrame(cents, schema), id_col, vec_col)
    return final.select(id_col, "centroid_id"), cents, history
