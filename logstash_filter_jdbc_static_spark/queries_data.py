"""Training-data operator queries (dedup / similarity / text analysis)
over the driver's documents + embeddings tables, each with a DuckDB
oracle generated from the same constants so both engines compute
bit-identical hashes/ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from logstash_filter_jdbc_static_spark.operators import dedup as D
from logstash_filter_jdbc_static_spark.operators import similarity as S
from logstash_filter_jdbc_static_spark.operators import text as X
from logstash_filter_jdbc_static_spark.queries import register
from logstash_filter_jdbc_static_spark.sources.registry import load_table_split

# ------------------------------------------------------------ helpers

_LANGS = sorted(X.LANG_MARKERS)


def _sql_score(lang: str) -> str:
    pat = r"\b(" + "|".join(X.LANG_MARKERS[lang]) + r")\b"
    return f"len(regexp_extract_all(lower(text), '{pat}', 0))"


def _sql_lang_case() -> str:
    greatest = "greatest(" + ", ".join(f"s_{l}" for l in _LANGS) + ")"
    whens = "\n".join(
        f"WHEN s_{l} = {greatest} THEN '{l}'" for l in _LANGS
    )
    return f"CASE WHEN {greatest} = 0 THEN 'und' {whens} END"


_STOP_PAT = r"\b(" + "|".join(X.STOPWORDS) + r")\b"
_SUBWORD_PAT = r"[A-Za-z]{1,4}|\d|[^\sA-Za-z\d]"
_PUNCT_CLASS = r"[^.,;:!?''\"()-]"  # '' = escaped quote inside SQL literal

_TEXT_ANALYSIS_SQL = f"""
WITH scored AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok,
         {", ".join(f"{_sql_score(l)} AS s_{l}" for l in _LANGS)}
  FROM documents
)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '{_SUBWORD_PAT}', 0)) AS BIGINT) AS n_subword_tokens,
       {_sql_lang_case()} AS detected_lang,
       length(regexp_replace(text, '{_PUNCT_CLASS}', '', 'g'))
         / greatest(length(text), 1) AS punct_ratio,
       len(regexp_extract_all(lower(text), '{_STOP_PAT}', 0))
         / greatest(n_tok, 1) AS stopword_ratio,
       ((CASE WHEN n_tok BETWEEN 10 AND 10000 THEN 1 ELSE 0 END)
        + (CASE WHEN length(regexp_replace(text, '{_PUNCT_CLASS}', '', 'g'))
                     / greatest(length(text), 1) <= 0.2 THEN 1 ELSE 0 END)
        + (CASE WHEN len(regexp_extract_all(lower(text), '{_STOP_PAT}', 0))
                     / greatest(n_tok, 1) >= 0.01 THEN 1 ELSE 0 END)
        + (CASE WHEN length(regexp_replace(text, '\\s+', '', 'g')) / greatest(n_tok, 1)
                     BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END)) / 4.0 AS quality_score,
       substr(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), 1, 16) AS fingerprint
FROM scored
"""


_ANALYZE_CACHE: dict[tuple[str, str], DataFrame] = {}


def _safe_unpersist(df: DataFrame) -> None:
    """Evicted entries can belong to an already-stopped session (the
    module dict spans applicationIds); unpersisting through a dead
    context raises — swallow it, the stopped context freed the blocks
    anyway."""
    try:
        df.unpersist(False)
    except Exception:
        pass


def analyzed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analyzed documents table, memoized per (session, sf_dir): the 8
    marker/stopword/punct regex scans are the expensive part of BOTH
    text_analysis and the curation pipeline — one cached staging pass
    serves every downstream consumer in a session (same pattern as the
    transcripts cache; at warehouse scale this is a materialized staging
    table, not an in-memory cache)."""
    # applicationId is unique per context (id() can be reused by CPython
    # after GC, resurrecting a frame bound to a dead session). Eviction
    # unpersists (non-blocking): Spark's CacheManager holds a strong
    # reference to every .cache()d plan, so a dropped Python reference
    # alone leaks the cached blocks for the session's lifetime; an
    # earlier caller still holding the evicted frame stays CORRECT and
    # merely recomputes.
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _ANALYZE_CACHE:
        docs = load_table_split(spark, sf_dir, "documents")
        # prune BEFORE caching: raw `text` dominates row size and no
        # consumer reads it — keeping it would make the cache mostly
        # dead weight and evict far earlier at larger corpora
        _ANALYZE_CACHE[key] = X.analyze(docs).select(
            "doc_id", "source", "n_tokens", "n_subword_tokens",
            "detected_lang", "punct_ratio", "stopword_ratio",
            "quality_score", "fingerprint",
        ).cache()
        if len(_ANALYZE_CACHE) > 4:
            _safe_unpersist(_ANALYZE_CACHE.pop(next(iter(_ANALYZE_CACHE))))
    return _ANALYZE_CACHE[key]


@register("text_analysis", _TEXT_ANALYSIS_SQL)
def text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analyzed_documents(spark, sf_dir).select(
        "doc_id", "n_tokens", "n_subword_tokens", "detected_lang",
        "punct_ratio", "stopword_ratio", "quality_score", "fingerprint",
    )


# ------------------------------------------------------- dedup corpus
#
# The driver's documents table has no duplicates, so dedup queries run on
# a derived corpus with deterministic injected duplicates:
# - every 50th doc re-appended with extra whitespace (exact dup after
#   normalization)
# - every 25th doc re-appended with its last 5 tokens dropped (near dup,
#   jaccard ~0.9)

_CORPUS_CTE = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, ' ' || text || '  ' FROM documents WHERE doc_id % 50 = 0
  UNION ALL
  SELECT doc_id + 2000000,
         array_to_string(string_split_regex(trim(text), '\\s+')[
           1 : greatest(len(string_split_regex(trim(text), '\\s+')) - 5, 1)], ' ')
  FROM documents WHERE doc_id % 25 = 0
)
"""


_CORPUS_CACHE: dict[tuple[str, str], DataFrame] = {}


def dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived dedup corpus, cached: leaving the 3-branch union +
    slice/split lineage under the LSH signature expressions blows the
    generated code past the codegen limit (interpreted fallback measured
    ~30x slower); materializing the corpus keeps every downstream stage
    in whole-stage codegen."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _CORPUS_CACHE:
        return _CORPUS_CACHE[key]
    docs = load_table_split(spark, sf_dir, "documents").select("doc_id", "text")
    ws_dups = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit(" "), F.col("text"), F.lit("  ")).alias("text"),
    )
    toks = F.split(F.trim(F.col("text")), r"\s+")
    near_dups = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.array_join(
            F.slice(toks, 1, F.greatest(F.size(toks) - 5, F.lit(1))), " "
        ).alias("text"),
    )
    corpus = docs.unionAll(ws_dups).unionAll(near_dups).cache()
    _CORPUS_CACHE[key] = corpus
    if len(_CORPUS_CACHE) > 4:
        _safe_unpersist(_CORPUS_CACHE.pop(next(iter(_CORPUS_CACHE))))
    return corpus


# -------------------------------------------------------- exact dedup

_DEDUP_EXACT_SQL = f"""
WITH {_CORPUS_CTE}
SELECT substr(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), 1, 16) AS fingerprint,
       min(doc_id) AS canonical_id,
       count(*) AS n_docs
FROM corpus
GROUP BY 1
HAVING count(*) > 1
"""


@register("dedup_exact", _DEDUP_EXACT_SQL)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.dedup_exact(dedup_corpus(spark, sf_dir))


# ------------------------------------------------------- minhash LSH

_N_PERM, _BAND_ROWS, _SHINGLE_K, _THRESH = 8, 2, 3, 0.7


def _shingles_cte(source: str) -> str:
    return f"""
toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM {source}
),
sh AS (
  SELECT doc_id,
         list_transform(
           range(1, greatest(len(tk) - {_SHINGLE_K - 1}, 1) + 1),
           i -> concat_ws(' ', {", ".join(f"tk[i+{j}]" for j in range(_SHINGLE_K))})
         ) AS shingles
  FROM toks
)
"""


_SHINGLES_CTE = _shingles_cte("documents")

_SIG_COLS = ", ".join(
    f"list_aggregate(list_transform(shingles, s -> md5('{p}:' || s)), 'min') AS mh{p}"
    for p in range(_N_PERM)
)
_N_BANDS = _N_PERM // _BAND_ROWS
_BAND_STRUCTS = ", ".join(
    "{'band_idx': %d, 'band_key': %s}"
    % (b, " || '|' || ".join(f"mh{b * _BAND_ROWS + r}" for r in range(_BAND_ROWS)))
    for b in range(_N_BANDS)
)

def _lsh_pair_ctes(max_bucket: int = 1000) -> list[str]:
    """The LSH candidate-pair CTE chain over an ``sh(doc_id, shingles)``
    CTE: signature -> band explode -> bucket cap -> distinct pairs.
    Shared by the documents and conversation near-dup oracles so the
    banding parameters cannot silently diverge between them."""
    return [
        f"sig AS (SELECT doc_id, {_SIG_COLS} FROM sh)",
        f"""bands AS (
  SELECT doc_id, b.band_idx AS band_idx, b.band_key AS band_key
  FROM sig, unnest([{_BAND_STRUCTS}]) AS t(b)
)""",
        f"""capped AS (
  SELECT * FROM bands
  QUALIFY count(*) OVER (PARTITION BY band_idx, band_key) <= {max_bucket}
)""",
        """pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM capped a JOIN capped b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)""",
    ]


def _jaccard_pair_select(a_alias: str = "id_a", b_alias: str = "id_b") -> str:
    """Jaccard verification over the ``pairs`` CTE (DuckDB restates the
    expression in WHERE; no alias reuse there)."""
    j = (
        "len(list_distinct(list_intersect(list_distinct(sa.shingles), list_distinct(sb.shingles))))"
        "\n         / greatest(len(list_distinct(list_concat(list_distinct(sa.shingles), list_distinct(sb.shingles)))), 1)"
    )
    return f"""
SELECT id_a AS {a_alias}, id_b AS {b_alias},
       {j}
         AS jaccard
FROM pairs
JOIN sh sa ON sa.doc_id = id_a
JOIN sh sb ON sb.doc_id = id_b
WHERE {j}
      >= {_THRESH}
"""


_MINHASH_LSH_SQL = (
    f"WITH {_CORPUS_CTE},\n{_shingles_cte('corpus')},\n"
    + ",\n".join(_lsh_pair_ctes())
    + _jaccard_pair_select()
)


@register("dedup_minhash_lsh", _MINHASH_LSH_SQL)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_dedup(
        dedup_corpus(spark, sf_dir), threshold=_THRESH, n_perm=_N_PERM,
        band_rows=_BAND_ROWS, shingle_k=_SHINGLE_K,
    )


# ----------------------------------------------------------- simhash

_SIM_BITS = D.SIMHASH_BITS
_SIMHASH_BIT_SQL = " || ".join(
    "(CASE WHEN list_sum(list_transform(tk, t -> CASE WHEN substr(md5(t), %d, 1) IN (%s) "
    "THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END)"
    % (j + 1, ", ".join(f"'{c}'" for c in D._ODD_NIBBLES))
    for j in range(_SIM_BITS)
)

_SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents
)
SELECT doc_id, {_SIMHASH_BIT_SQL} AS simhash
FROM toks
"""


@register("dedup_simhash", _SIMHASH_SQL)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table_split(spark, sf_dir, "documents")
    staged = docs.select("doc_id", X.tokens("text").alias("__toks"))
    return staged.select(
        "doc_id", D.simhash(tokens_col=F.col("__toks")).alias("simhash")
    )


# ------------------------------------------------- n-gram jaccard

_NGRAM_JACCARD_SQL = f"""
WITH {_SHINGLES_CTE}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       len(list_distinct(list_intersect(list_distinct(a.shingles), list_distinct(b.shingles))))
         / greatest(len(list_distinct(list_concat(list_distinct(a.shingles), list_distinct(b.shingles)))), 1)
         AS jaccard
FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
"""


@register("ngram_jaccard_adjacent", _NGRAM_JACCARD_SQL)
def ngram_jaccard_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise n-gram Jaccard on a deterministic pair set (adjacent ids):
    exercises the verification operator independently of LSH recall."""
    docs = load_table_split(spark, sf_dir, "documents")
    sh = D.shingled(docs, "doc_id", "text", _SHINGLE_K)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        a.join(b, F.col("id_b") == F.col("id_a") + 1)
        .select("id_a", "id_b", D.jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
    )


# ------------------------------------------------- cosine top-k ANN

_TOPK_K, _N_QUERIES = 5, 8

_COSINE_TOPK_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
q AS (SELECT vec_id AS query_id, vec AS q_vec FROM v WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.q_vec, c.vec)
           / (sqrt(list_dot_product(q.q_vec, q.q_vec)) * sqrt(list_dot_product(c.vec, c.vec)))
           AS cos_sim
  FROM q JOIN v c ON c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank,
       cos_sim
FROM scored
QUALIFY rank <= {_TOPK_K}
"""


@register("ann_cosine_topk", _COSINE_TOPK_SQL)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table_split(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk(emb, queries, k=_TOPK_K).withColumn(
        "rank", F.col("rank").cast("int")
    )


# ---------------------------------------------- IVF top-k (scale ANN)

_IVF_CENTROID_MOD, _IVF_K, _IVF_N_QUERIES = 97, 5, 8

_IVF_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
cen AS (SELECT vec_id AS centroid_id, vec AS c_vec FROM v WHERE vec_id % {_IVF_CENTROID_MOD} = 0),
assigned AS (
  SELECT vec_id, centroid_id, vec FROM (
    SELECT v.vec_id, cen.centroid_id, v.vec,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_dot_product(v.vec, cen.c_vec)
                      / (sqrt(list_dot_product(v.vec, v.vec)) * sqrt(list_dot_product(cen.c_vec, cen.c_vec)))
                      DESC, cen.centroid_id) AS rn
    FROM v CROSS JOIN cen) t
  WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, centroid_id, vec AS q_vec FROM assigned WHERE vec_id < {_IVF_N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, centroid_id, vec AS c_vec FROM assigned),
scored AS (
  SELECT q.query_id, c.neighbor_id,
         list_dot_product(q.q_vec, c.c_vec)
           / (sqrt(list_dot_product(q.q_vec, q.q_vec)) * sqrt(list_dot_product(c.c_vec, c.c_vec)))
           AS cos_sim
  FROM c JOIN q ON c.centroid_id = q.centroid_id AND c.neighbor_id <> q.query_id
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank,
       cos_sim
FROM scored
QUALIFY rank <= {_IVF_K}
"""


@register("ann_ivf_topk", _IVF_SQL)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF single-probe ANN: deterministic centroid subset, cell
    assignment by argmax cosine, search within the query's cell."""
    emb = load_table_split(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    centroids = emb.filter(F.col("vec_id") % _IVF_CENTROID_MOD == 0)
    queries = emb.filter(F.col("vec_id") < _IVF_N_QUERIES)
    return S.ivf_topk(emb, queries, centroids, k=_IVF_K)


# ------------------------------------- embedding near-dup (LSH + cos)

_ND_PLANES, _ND_DIMS, _ND_THRESH = 4, 64, 0.35


def _plane_list_sql(p: int) -> str:
    coeffs = ", ".join(
        str(S.hyperplane_component(p, d)) for d in range(_ND_DIMS)
    )
    return f"[{coeffs}]::DOUBLE[]"


_ND_BUCKET_SQL = " || ".join(
    f"(CASE WHEN list_dot_product(vec, {_plane_list_sql(p)}) > 0 THEN '1' ELSE '0' END)"
    for p in range(_ND_PLANES)
)

_NEAR_DUP_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
bk AS (SELECT vec_id, vec, {_ND_BUCKET_SQL} AS bucket FROM v)
SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
       list_dot_product(a.vec, b.vec)
         / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec)))
         AS cos_sim
FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_dot_product(a.vec, b.vec)
        / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec)))
      >= {_ND_THRESH}
"""


@register("embedding_near_dup", _NEAR_DUP_SQL)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table_split(spark, sf_dir, "embeddings")
    return S.embedding_near_dup_pairs(
        emb, threshold=_ND_THRESH, n_planes=_ND_PLANES, n_dims=_ND_DIMS
    )


# ----------------------------------- IVF multi-probe (recall knob)

_IVF_N_PROBE = 3

_IVF_MULTIPROBE_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
cen AS (SELECT vec_id AS centroid_id, vec AS c_vec FROM v WHERE vec_id % {_IVF_CENTROID_MOD} = 0),
ranked AS (
  SELECT v.vec_id, cen.centroid_id, v.vec,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY list_dot_product(v.vec, cen.c_vec)
                    / (sqrt(list_dot_product(v.vec, v.vec)) * sqrt(list_dot_product(cen.c_vec, cen.c_vec)))
                    DESC, cen.centroid_id) AS rn
  FROM v CROSS JOIN cen
),
assigned AS (SELECT vec_id, centroid_id, vec FROM ranked WHERE rn = 1),
q AS (SELECT vec_id AS query_id, centroid_id, vec AS q_vec
      FROM ranked WHERE rn <= {_IVF_N_PROBE} AND vec_id < {_IVF_N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, centroid_id, vec AS c_vec FROM assigned),
scored AS (
  SELECT q.query_id, c.neighbor_id,
         list_dot_product(q.q_vec, c.c_vec)
           / (sqrt(list_dot_product(q.q_vec, q.q_vec)) * sqrt(list_dot_product(c.c_vec, c.c_vec)))
           AS cos_sim
  FROM c JOIN q ON c.centroid_id = q.centroid_id AND c.neighbor_id <> q.query_id
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank,
       cos_sim
FROM scored
QUALIFY rank <= {_IVF_K}
"""


@register("ann_ivf_multiprobe", _IVF_MULTIPROBE_SQL)
def ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF multi-probe ANN: queries search their 3 nearest cells — the
    standard recall/latency knob (recall rises vs single-probe at 3x the
    probed fraction of the corpus)."""
    emb = load_table_split(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    centroids = emb.filter(F.col("vec_id") % _IVF_CENTROID_MOD == 0)
    queries = emb.filter(F.col("vec_id") < _IVF_N_QUERIES)
    return S.ivf_topk(emb, queries, centroids, k=_IVF_K, n_probe=_IVF_N_PROBE)


# ----------------------------- IVF at scale (10k clustered corpus)
#
# The parquet embeddings table is 2k rows at sf0.1 (200 at sf0.01), too
# small to pin the quantizer's SCALE behavior. This variant runs the
# identical ivf_topk operator over a 10,000-vector deterministic
# clustered corpus both engines synthesize from integers: 64 lattice
# cluster centers plus small per-vector noise, every term a ratio of
# exact small ints so the float64 arithmetic (and left-to-right dot
# product fold) is bit-identical in Spark and DuckDB. Cluster structure
# makes the one-representative-per-cluster quantizer (vec_id < 64)
# honest: recall vs brute force is asserted >= 0.9 in tests.

_S10K_N, _S10K_D, _S10K_C, _S10K_NQ = 10_000, 32, 64, 8


def synth_clustered_embeddings(
    spark: SparkSession, n: int = _S10K_N, d: int = _S10K_D, c: int = _S10K_C
) -> DataFrame:
    """(vec_id, embedding double[d]) — n vectors in c lattice clusters."""
    dseq = F.sequence(F.lit(0), F.lit(d - 1))

    def comp(dd):
        center = (((F.col("vec_id") % c) * 7919 + dd * 104729) % 211 - 105) / 105.0
        noise = ((F.col("vec_id") * 2654435761 + dd * 40503) % 1000 - 500) / 5000.0
        return center + noise

    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.transform(dseq, comp).alias("embedding")
    )


def _s10k_vec_sql(id_col: str = "id") -> str:
    return (
        f"list_transform(range(0, {_S10K_D}), d -> "
        f"((({id_col} % {_S10K_C}) * 7919 + d * 104729) % 211 - 105) / 105.0"
        f" + (({id_col} * 2654435761 + d * 40503) % 1000 - 500) / 5000.0)"
    )


_S10K_SQL = f"""
WITH v AS (
  SELECT id AS vec_id, {_s10k_vec_sql("id")} AS vec
  FROM range(0, {_S10K_N}) t(id)
),
cen AS (SELECT vec_id AS centroid_id, vec AS c_vec FROM v WHERE vec_id < {_S10K_C}),
ranked AS (
  SELECT v.vec_id, cen.centroid_id, v.vec,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY list_dot_product(v.vec, cen.c_vec)
                    / (sqrt(list_dot_product(v.vec, v.vec)) * sqrt(list_dot_product(cen.c_vec, cen.c_vec)))
                    DESC, cen.centroid_id) AS rn
  FROM v CROSS JOIN cen
),
assigned AS (SELECT vec_id, centroid_id, vec FROM ranked WHERE rn = 1),
q AS (SELECT vec_id - {_S10K_C} AS query_id, centroid_id, vec AS q_vec
      FROM ranked
      WHERE rn <= {_IVF_N_PROBE} AND vec_id >= {_S10K_C} AND vec_id < {_S10K_C + _S10K_NQ}),
c AS (SELECT vec_id AS neighbor_id, centroid_id, vec AS c_vec FROM assigned),
scored AS (
  SELECT q.query_id, c.neighbor_id,
         list_dot_product(q.q_vec, c.c_vec)
           / (sqrt(list_dot_product(q.q_vec, q.q_vec)) * sqrt(list_dot_product(c.c_vec, c.c_vec)))
           AS cos_sim
  FROM c JOIN q ON c.centroid_id = q.centroid_id AND c.neighbor_id <> q.query_id
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank,
       cos_sim
FROM scored
QUALIFY rank <= {_IVF_K}
"""


@register("ann_ivf_scale10k", _S10K_SQL)
def ann_ivf_scale10k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF multi-probe over the 10k synthetic clustered corpus (sf_dir
    unused: the corpus is fixed-size by design — the point is pinning
    quantizer behavior at >=10k vectors under the driver gate)."""
    corpus = synth_clustered_embeddings(spark)
    centroids = corpus.filter(F.col("vec_id") < _S10K_C)
    queries = corpus.filter(
        (F.col("vec_id") >= _S10K_C) & (F.col("vec_id") < _S10K_C + _S10K_NQ)
    ).select((F.col("vec_id") - _S10K_C).alias("vec_id"), "embedding")
    return S.ivf_topk(corpus, queries, centroids, k=_IVF_K, n_probe=_IVF_N_PROBE)


# ---------------------------------------------------- PII redaction
#
# Regex scrub of emails / IPv4s / long digit runs — the pre-training
# privacy pass. Pure regexp_replace chain (JVM codegen, zero shuffle);
# the oracle runs the identical patterns through DuckDB's RE2 with the
# same sequential order (emails first so their domains can't leak into
# the digit-run class).

_REDACT_SQL = """
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
         '\\b\\d{7,}\\b', '<NUM>', 'g') AS redacted,
       CAST(len(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', ' ', 'g'),
         '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(
         regexp_replace(
           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', ' ', 'g'),
           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', ' ', 'g'),
         '\\b\\d{7,}\\b')) AS BIGINT) AS n_digits
FROM documents
"""


@register("documents_redact_pii", _REDACT_SQL)
def documents_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table_split(spark, sf_dir, "documents").select("doc_id", "text")
    counts = X.redaction_counts("text")
    return docs.select(
        "doc_id",
        X.redact_pii("text").alias("redacted"),
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ipv4"),
        counts["digits"].alias("n_digits"),
    )


# ------------------------------------------------- repetition quality
#
# Gopher-style repetition filters: duplicate-line fraction and the most
# frequent token's share. Spark computes both inside one row's array
# expressions (sorted-run fold, no explode/shuffle); the oracle is free
# to unnest + group since it only runs at test scale.

_REPETITION_SQL = """
WITH lines AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                     l -> l <> '') AS ls
  FROM documents
),
toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(trim(text), '\\s+') END AS tk
  FROM documents
),
top AS (
  SELECT doc_id, max(c) AS max_c FROM (
    SELECT doc_id, t, count(*) AS c
    FROM (SELECT doc_id, unnest(tk) AS t FROM toks) GROUP BY doc_id, t
  ) GROUP BY doc_id
)
SELECT l.doc_id,
       CAST(len(l.ls) AS BIGINT) AS n_lines,
       CASE WHEN len(l.ls) <= 1 THEN 0.0
            ELSE 1.0 - len(list_distinct(l.ls)) / len(l.ls) END AS dup_line_frac,
       CASE WHEN len(t.tk) = 0 THEN 0.0
            ELSE coalesce(top.max_c, 0) / len(t.tk) END AS top_token_share
FROM lines l
JOIN toks t USING (doc_id)
LEFT JOIN top USING (doc_id)
"""


@register("documents_repetition_stats", _REPETITION_SQL)
def documents_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table_split(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        F.size(X.lines("text")).cast("long").alias("n_lines"),
        X.dup_line_fraction("text").alias("dup_line_frac"),
        X.top_token_share("text").alias("top_token_share"),
    )
