"""Training-data operator tests: dedup, similarity, text analysis."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F, types as T

from logstash_filter_jdbc_static_spark.operators import dedup as D
from logstash_filter_jdbc_static_spark.operators import similarity as S
from logstash_filter_jdbc_static_spark.operators import text as X

DOC_SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog in the park"),
        (2, "the  quick brown fox jumps over the lazy dog in the park "),  # ws dup of 1
        (3, "the quick brown fox jumps over the lazy dog in the"),  # near dup of 1
        (4, "completely different content about spark and data engines here"),
        (5, "der hund und die katze und der vogel und nicht das haus"),
    ]
    return spark.createDataFrame(rows, DOC_SCHEMA)


class TestText:
    def test_token_count(self, spark, docs):
        got = {r["doc_id"]: r["n"] for r in docs.select("doc_id", X.token_count().alias("n")).collect()}
        assert got[1] == 12
        assert got[3] == 11

    def test_lang_id(self, spark, docs):
        got = {r["doc_id"]: r["l"] for r in docs.select("doc_id", X.lang_id().alias("l")).collect()}
        assert got[1] == "en"
        assert got[5] == "de"

    def test_fingerprint_normalizes_whitespace(self, spark, docs):
        got = {r["doc_id"]: r["f"] for r in docs.select("doc_id", X.doc_fingerprint().alias("f")).collect()}
        assert got[1] == got[2]
        assert got[1] != got[3]

    def test_quality_score_range(self, spark, docs):
        for r in docs.select(X.quality_score().alias("q")).collect():
            assert 0.0 <= r["q"] <= 1.0


class TestDedup:
    def test_exact(self, spark, docs):
        groups = D.dedup_exact(docs).collect()
        assert len(groups) == 1
        assert groups[0]["canonical_id"] == 1
        assert groups[0]["n_docs"] == 2

    def test_minhash_lsh_finds_near_dups(self, spark, docs):
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in D.minhash_lsh_dedup(docs, threshold=0.5).collect()
        }
        assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # identical shingles
        assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
        assert all(4 not in p and 5 not in p for p in pairs)

    def test_simhash_similar_docs_close(self, spark, docs):
        sh = {r["doc_id"]: r["s"] for r in docs.select("doc_id", D.simhash().alias("s")).collect()}
        def ham(a, b):
            return sum(x != y for x, y in zip(a, b))
        assert sh[1] == sh[2]
        assert ham(sh[1], sh[3]) <= ham(sh[1], sh[4])

    def test_jaccard_bounds(self, spark, docs):
        sh = docs.select("doc_id", D.word_shingles().alias("s"))
        a = sh.select(F.col("doc_id").alias("ia"), F.col("s").alias("sa"))
        b = sh.select(F.col("doc_id").alias("ib"), F.col("s").alias("sb"))
        out = a.crossJoin(b).select(D.jaccard(F.col("sa"), F.col("sb")).alias("j")).collect()
        assert all(0.0 <= r["j"] <= 1.0 for r in out)


VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),   # close to 1
        (3, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 1
        (4, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 1
    ]
    return spark.createDataFrame(rows, VEC_SCHEMA)


class TestSimilarity:
    def test_cosine_values(self, spark, vectors):
        a = vectors.filter("vec_id = 1").select(F.col("embedding").alias("a"))
        out = (
            a.crossJoin(vectors.select("vec_id", F.col("embedding").alias("b")))
            .select("vec_id", S.cosine(F.col("a"), F.col("b")).alias("c"))
            .collect()
        )
        got = {r["vec_id"]: r["c"] for r in out}
        assert got[1] == pytest.approx(1.0)
        assert got[3] == pytest.approx(0.0, abs=1e-12)
        assert got[4] == pytest.approx(-1.0)

    def test_topk_order_and_exclusion(self, spark, vectors):
        out = S.cosine_topk(vectors, vectors.filter("vec_id = 1"), k=2).collect()
        by_rank = sorted(out, key=lambda r: r["rank"])
        assert [r["neighbor_id"] for r in by_rank] == [2, 3]
        assert all(r["query_id"] == 1 for r in out)

    def test_lsh_bucket_deterministic(self, spark, vectors):
        b1 = {r["vec_id"]: r["bucket"] for r in S.ann_lsh_buckets(vectors, n_dims=4).collect()}
        b2 = {r["vec_id"]: r["bucket"] for r in S.ann_lsh_buckets(vectors, n_dims=4).collect()}
        assert b1 == b2
        assert len(b1[1]) == 8
        # opposite vectors land in complementary buckets
        assert all(x != y for x, y in zip(b1[1], b1[4]))

    def test_near_dup_pairs(self, spark, vectors):
        pairs = S.embedding_near_dup_pairs(vectors, threshold=0.9, n_dims=4).collect()
        assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
        assert pairs[0]["cos_sim"] > 0.99


class TestIvfRecall:
    def test_multiprobe_beats_single_probe(self, spark):
        """The recall/latency knob must actually buy recall: probing 3
        cells recovers strictly more of the brute-force top-k than one."""
        from logstash_filter_jdbc_static_spark.queries import queries
        from logstash_filter_jdbc_static_spark.queries_data import (
            ann_ivf_multiprobe,
            ann_ivf_topk,
        )

        sf = "/root/testdata/sf0.001"
        qs = queries()
        bf = {(r.query_id, r.neighbor_id) for r in qs["ann_cosine_topk"](spark, sf).collect()}
        one = {(r.query_id, r.neighbor_id) for r in ann_ivf_topk(spark, sf).collect()}
        multi = {(r.query_id, r.neighbor_id) for r in ann_ivf_multiprobe(spark, sf).collect()}
        r1 = len(bf & one) / len(bf)
        r3 = len(bf & multi) / len(bf)
        assert r3 > r1, (r1, r3)
        assert r3 >= 0.5, (r1, r3)

    def test_scale10k_recall_ge_090(self, spark):
        """Quantizer behavior at >=10k vectors (round-3 verdict #7): on
        the clustered 10k corpus, multi-probe IVF must recover >=90% of
        the brute-force top-k, and never less than single-probe."""
        from pyspark.sql import functions as F

        from logstash_filter_jdbc_static_spark.operators import similarity as S
        from logstash_filter_jdbc_static_spark.queries_data import (
            _IVF_K,
            _S10K_C,
            _S10K_NQ,
            ann_ivf_scale10k,
            synth_clustered_embeddings,
        )

        corpus = synth_clustered_embeddings(spark)
        queries = corpus.filter(
            (F.col("vec_id") >= _S10K_C) & (F.col("vec_id") < _S10K_C + _S10K_NQ)
        ).select((F.col("vec_id") - _S10K_C).alias("vec_id"), "embedding")
        centroids = corpus.filter(F.col("vec_id") < _S10K_C)
        bf = {
            (r.query_id, r.neighbor_id)
            for r in S.cosine_topk(corpus, queries, k=_IVF_K).collect()
        }
        single = {
            (r.query_id, r.neighbor_id)
            for r in S.ivf_topk(corpus, queries, centroids, k=_IVF_K).collect()
        }
        multi = {
            (r.query_id, r.neighbor_id)
            for r in ann_ivf_scale10k(spark, "unused").collect()
        }
        r1 = len(bf & single) / len(bf)
        rm = len(bf & multi) / len(bf)
        assert rm >= 0.9, (r1, rm)
        assert rm >= r1, (r1, rm)


class TestRedaction:
    def test_patterns_and_ordering(self, spark):
        from logstash_filter_jdbc_static_spark.operators import text as X
        from pyspark.sql import functions as F

        rows = [
            (1, "mail a.user+tag@example.co.uk now"),
            (2, "from 10.1.2.3 to 255.255.255.255"),
            (3, "acct 12345678 ref 999999"),  # only the 8-digit run redacts
            (4, "user99@host123.example.com and 192.168.0.1 and 87654321"),
            (5, "clean text, nothing to scrub"),
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        counts = X.redaction_counts("text")
        out = {
            r["doc_id"]: r
            for r in df.select(
                "doc_id",
                X.redact_pii("text").alias("red"),
                counts["email"].alias("e"),
                counts["ipv4"].alias("i"),
                counts["digits"].alias("d"),
            ).collect()
        }
        assert out[1]["red"] == "mail <EMAIL> now" and out[1]["e"] == 1
        assert out[2]["red"] == "from <IP> to <IP>" and out[2]["i"] == 2
        assert out[3]["red"] == "acct <NUM> ref 999999"
        assert (out[3]["e"], out[3]["i"], out[3]["d"]) == (0, 0, 1)
        # email digits/domains must NOT leak into the ip/digit classes
        assert out[4]["red"] == "<EMAIL> and <IP> and <NUM>"
        assert (out[4]["e"], out[4]["i"], out[4]["d"]) == (1, 1, 1)
        assert out[5]["red"] == rows[4][1]


class TestRepetition:
    def test_dup_lines_and_top_token(self, spark):
        from logstash_filter_jdbc_static_spark.operators import text as X
        from pyspark.sql import functions as F

        rows = [
            (1, "a b c\na b c\nx y z"),      # 3 lines, 1 dup
            (2, "one line only"),            # single line -> 0.0
            (3, ""),                         # empty -> 0.0 / 0.0
            (4, "go go go stop"),            # top token 'go' 3/4
            (5, "l\n\n  \nl"),               # blank lines ignored, dup 'l'
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        out = {
            r["doc_id"]: r
            for r in df.select(
                "doc_id",
                F.size(X.lines("text")).alias("n"),
                X.dup_line_fraction("text").alias("dl"),
                X.top_token_share("text").alias("tt"),
            ).collect()
        }
        assert out[1]["n"] == 3 and abs(out[1]["dl"] - (1 - 2 / 3)) < 1e-9
        assert out[2]["dl"] == 0.0
        assert out[3]["dl"] == 0.0 and out[3]["tt"] == 0.0
        assert abs(out[4]["tt"] - 0.75) < 1e-9
        assert out[5]["n"] == 2 and abs(out[5]["dl"] - 0.5) < 1e-9
