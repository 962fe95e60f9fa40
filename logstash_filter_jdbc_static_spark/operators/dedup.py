"""Deduplication operators: exact (hash-groupBy), MinHash+LSH,
SimHash, and n-gram Jaccard verification.

Engine-portability contract: every hash is built from md5 hex strings
(identical in Spark and DuckDB), minima over hashes are lexicographic
string minima, so an independent SQL engine reproduces signatures and
candidate pairs exactly.

Scale notes (the 100 TB shape):
- exact dedup: one shuffle on the 16-hex fingerprint (well distributed);
  map-side partial agg applies.
- MinHash+LSH: signature computation is a pure projection (no shuffle);
  banding explodes each doc into `n_bands` rows and shuffles on the band
  key — the classic shingle->minhash->band->bucket-join. Bucket joins
  are self-joins on band buckets, so skew comes only from giant buckets
  (near-identical boilerplate); cap bucket size before pairing.
- SimHash: pure projection; near-dup candidates group by the signature
  (or rotated bands of it for hamming<=k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from logstash_filter_jdbc_static_spark.operators.text import doc_fingerprint, tokens

DEFAULT_N_PERM = 8
DEFAULT_BAND_ROWS = 2  # 8 perms / 2 rows = 4 bands


# ------------------------------------------------------------- exact

def dedup_exact(df: DataFrame, id_col: str = "doc_id", col: str = "text") -> DataFrame:
    """Exact duplicate groups by normalized-content fingerprint: canonical
    doc = min id; emits only groups with >1 member."""
    return (
        df.select(F.col(id_col), doc_fingerprint(col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ----------------------------------------------------------- minhash

def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-word shingles from a token ARRAY COLUMN. The tokens must be a
    bound attribute (not the split() expression itself): non-lambda
    subexpressions inside higher-order-function lambdas are re-evaluated
    per element, so inlining split() here costs 3*k regex tokenizations
    per shingle (measured 19x slower end-to-end)."""
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    # try_element_at: out-of-range tail positions (docs shorter than k)
    # yield NULL, which concat_ws skips — same semantics as the oracle's
    # concat_ws over out-of-range list indexes.
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(toks, (i + j).cast("int")) for j in range(k)]
        ),
    )


def word_shingles(col: str = "text", k: int = 3) -> Column:
    """k-word shingles directly from a text column — convenience form for
    single-use expressions; multi-use plans should stage tokens/shingles
    through projections (see shingled())."""
    return shingles_from_tokens(tokens(col), k)


def shingled(df: DataFrame, id_col: str = "doc_id", col: str = "text",
             k: int = 3) -> DataFrame:
    """(id, shingles) staged through two projections so Catalyst keeps
    tokenization and shingle construction evaluated once per row
    (CollapseProject won't re-inline multi-referenced non-cheap exprs)."""
    toksdf = df.select(F.col(id_col), tokens(col).alias("__toks"))
    return toksdf.select(
        F.col(id_col), shingles_from_tokens(F.col("__toks"), k).alias("shingles")
    )


def minhash_signature(shingle_col: Column, n_perm: int = DEFAULT_N_PERM) -> list[Column]:
    """n_perm minhashes: permutation p = lexicographic min of
    md5('<p>:' || shingle). Distinct docs with equal shingle sets get
    equal signatures; Jaccard-similar sets collide per-band with the
    standard LSH probability."""
    def _perm_hash(p: int):
        # closure factory (a `p=p` default would make the lambda 2-ary and
        # pyspark would pass the array index as p)
        return lambda s: F.md5(F.concat(F.lit(f"{p}:"), s))

    return [
        F.array_min(F.transform(shingle_col, _perm_hash(p))).alias(f"mh{p}")
        for p in range(n_perm)
    ]


def minhash_bands(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    n_perm: int = DEFAULT_N_PERM,
    band_rows: int = DEFAULT_BAND_ROWS,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, band_idx, band_key) — one row per doc per band."""
    sig = shingled(df, id_col, col, shingle_k).select(
        F.col(id_col),
        *minhash_signature(F.col("shingles"), n_perm),
    )
    n_bands = n_perm // band_rows
    bands = []
    for b in range(n_bands):
        key = F.concat_ws(
            "|", *[F.col(f"mh{b * band_rows + r}") for r in range(band_rows)]
        )
        bands.append(F.struct(F.lit(b).alias("band_idx"), key.alias("band_key")))
    return sig.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("band")
    ).select(id_col, F.col("band.band_idx"), F.col("band.band_key"))


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    n_perm: int = DEFAULT_N_PERM,
    band_rows: int = DEFAULT_BAND_ROWS,
    shingle_k: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any LSH band.
    Buckets larger than max_bucket (boilerplate explosions — the skew
    hazard at scale) are dropped, as production near-dup pipelines do."""
    bands = minhash_bands(df, id_col, col, n_perm, band_rows, shingle_k)
    sized = bands.withColumn(
        "bucket_n",
        F.count(F.lit(1)).over(Window.partitionBy("band_idx", "band_key")),
    ).filter(F.col("bucket_n") <= max_bucket)
    # Materialize before the self-join: otherwise Catalyst inlines the
    # full signature expression tree into BOTH join sides (measured 20x
    # slower from codegen blowup + double evaluation). At warehouse scale
    # this is the "write signatures to a table" step of any LSH pipeline.
    sized = sized.cache()
    a = sized.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_key"
    )
    b = sized.select(
        F.col(id_col).alias("id_b"), "band_idx", "band_key"
    )
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard(shingles_a: Column, shingles_b: Column) -> Column:
    sa, sb = F.array_distinct(shingles_a), F.array_distinct(shingles_b)
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(F.array_union(sa, sb))
    return inter / F.greatest(union, F.lit(1))


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    threshold: float = 0.7,
    **kwargs,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates verified by exact n-gram
    Jaccard >= threshold. Returns (id_a, id_b, jaccard)."""
    shingle_k = kwargs.get("shingle_k", 3)
    pairs = lsh_candidate_pairs(df, id_col, col, **kwargs)
    # cache: the shingle array feeds both sides of the verification join
    docs = shingled(df, id_col, col, shingle_k).cache()
    a = docs.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = docs.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ----------------------------------------------------------- simhash

SIMHASH_BITS = 16
_ODD_NIBBLES = ["1", "3", "5", "7", "9", "b", "d", "f"]


def simhash(
    col: str = "text",
    n_bits: int = SIMHASH_BITS,
    tokens_col: Column | None = None,
) -> Column:
    """Portable SimHash: bit j = sign of sum over tokens of +1/-1 taken
    from the LSB of nibble j of md5(token) (odd hex digit => +1).
    Emitted as a bit-string so both engines agree on representation.
    DuckDB twin: sum(CASE WHEN substr(md5(t), j+1, 1) IN ('1','3',...)
    THEN 1 ELSE -1 END) over unnested tokens."""
    # pass a staged token attribute for multi-use plans: each of the
    # n_bits aggregates re-evaluates its array argument otherwise
    toks = tokens_col if tokens_col is not None else tokens(col)

    def _step(j: int):
        # closure factory: a `j=j` default arg would make pyspark treat
        # the lambda as 3-ary and reject it
        def f(acc: Column, t: Column) -> Column:
            return acc + F.when(
                F.substring(F.md5(t), j + 1, 1).isin(_ODD_NIBBLES), F.lit(1)
            ).otherwise(F.lit(-1))

        return f

    bits = []
    for j in range(n_bits):
        contrib = F.aggregate(toks, F.lit(0), _step(j))
        bits.append(F.when(contrib > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    the standard partial-overlap / decontamination primitive): hash
    every k-word gram (rolling hash stand-in: md5 prefix, engine-
    portable), then keep the minimum hash of every ``window`` of
    consecutive gram hashes. Guarantees any shared run of >= k+window-1
    words contributes a shared fingerprint. Returns exploded
    (id, fingerprint) rows — all native column ops, zero shuffles.

    Docs shorter than k words yield no fingerprints; docs with fewer
    than ``window`` grams yield the single global-min fingerprint.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(toks)
    # guard: F.sequence(1, stop) DESCENDS when stop < 1 — never build it
    grams = F.when(
        n >= F.lit(k),
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.substring(
                F.md5(F.array_join(F.slice(toks, i, k), " ")), 1, 8
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = df.select(F.col(id_col), grams.alias("__grams"))
    m = F.size(F.col("__grams"))
    fps = (
        F.when(m == 0, F.array().cast("array<string>"))
        .when(m < F.lit(window), F.array(F.array_min(F.col("__grams"))))
        .otherwise(
            F.transform(
                F.sequence(F.lit(1), m - F.lit(window - 1)),
                lambda j: F.array_min(F.slice(F.col("__grams"), j, window)),
            )
        )
    )
    return staged.select(
        id_col, F.explode(F.array_distinct(fps)).alias("fingerprint")
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    min_shared: int = 3,
    df_cap: int = 20,
) -> DataFrame:
    """Document pairs sharing >= min_shared winnow fingerprints.
    ONE shuffle (hash on fingerprint); fingerprints occurring in more
    than ``df_cap`` docs are dropped before pairing (the standard
    document-frequency cut — a boilerplate k-gram shared by thousands of
    docs would otherwise fan out quadratically at corpus scale)."""
    fps = winnow_fingerprints(df, id_col, text_col, k, window)
    w = Window.partitionBy("fingerprint")
    rare = fps.withColumn("__df", F.count(F.lit(1)).over(w)).filter(
        F.col("__df") <= df_cap
    )
    a = rare.select(F.col(id_col).alias("id_a"), "fingerprint")
    b = rare.select(F.col(id_col).alias("id_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve duplicate PAIRS into duplicate CLUSTERS: (id, cluster_id)
    for every id appearing in ``pairs``, where cluster_id is the minimum
    id in the id's connected component. Completes the dedup pipeline —
    near-dup pairs alone don't say which docs to keep; the per-cluster
    canonical (min id) does.

    Hash-min label propagation: every node starts labeled with its own
    id; each round a node takes the minimum label among itself and its
    neighbors; fixpoint when no label changes. Rounds needed = graph
    diameter, which for dup clusters is small (most are pairs/triangles).

    Scale shape: the component membership is never materialized on the
    driver — each round is one edge-list join + min-aggregation (two
    bounded shuffles on the edge partitioning); labels are
    localCheckpoint'd per round to truncate the iterative lineage.
    Convergence is detected from a 1-row changed-label count computed
    in the same pass (exact for ANY orderable id type — numeric, string
    — unlike a numeric label checksum, which is NULL-blind for
    non-numeric ids). ``max_iter`` bounds pathological chain graphs;
    real dup clusters converge in 2-4 rounds.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionAll(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id")
    ).localCheckpoint(eager=True)
    n_changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_label = F.least(
            labels["label"], F.coalesce(F.col("nmin"), labels["label"])
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .select(
                labels["id"],
                new_label.alias("label"),
                # labels only ever decrease, so < is "changed"
                (new_label < labels["label"]).cast("int").alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = new_labels.agg(F.sum("_chg").alias("n")).collect()[0]["n"]
        labels = new_labels.drop("_chg")
        if not n_changed:
            break
    if n_changed:
        # Fail loud, not silent (the _to_dnf convention): a chain longer
        # than max_iter rounds would otherwise return partially-merged
        # cluster ids as if converged, and every downstream canonical-keep
        # decision on the affected component would be wrong.
        raise RuntimeError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds ({n_changed} labels still changing); the "
            f"duplicate graph has a component with diameter > {max_iter} — "
            f"raise max_iter"
        )
    return labels.select("id", F.col("label").alias("cluster_id"))
