"""Semantic tests for sparse lexical retrieval (BM25 top-k)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ilogtail_spark.dataops import retrieval

DOCS = [
    (0, "spark shuffle join broadcast join"),
    (1, "spark window aggregate"),
    (2, "the cat sat on the mat"),
    (3, "join join join join join"),
    (4, "broadcast variables in spark"),
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def queries_df(spark, rows):
    return spark.createDataFrame(rows, "query_id long, qtext string")


def _bm25(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


class TestBM25:
    def test_ranking_and_scores(self, spark):
        docs = docs_df(spark)
        q = queries_df(spark, [(100, "spark join")])
        out = retrieval.bm25_topk(docs, q, k=10).collect()
        by_doc = {r["doc_id"]: r for r in out}
        # docs 2 has neither term -> absent
        assert 2 not in by_doc
        assert set(by_doc) == {0, 1, 3, 4}
        # ranks are 1..4 and ordered by score desc
        ranked = sorted(out, key=lambda r: r["rank"])
        scores = [r["score_micro"] for r in ranked]
        assert scores == sorted(scores, reverse=True)
        # hand-computed score for doc 1 ("spark" tf=1, dl=3):
        n, avgdl = 5, (5 + 3 + 6 + 5 + 4) / 5
        expected = _bm25(tf=1, df=3, n=n, dl=3, avgdl=avgdl)
        assert by_doc[1]["score_micro"] == math.floor(expected * 1_000_000)
        # doc 0 matches both terms -> must outrank doc 1 (one term, same idf class)
        assert by_doc[0]["score_micro"] > by_doc[1]["score_micro"]

    def test_k_truncates_per_query(self, spark):
        docs = docs_df(spark)
        q = queries_df(spark, [(1, "spark"), (2, "join mat")])
        out = retrieval.bm25_topk(docs, q, k=1).collect()
        assert len(out) == 2
        assert all(r["rank"] == 1 for r in out)

    def test_query_term_absent_from_corpus(self, spark):
        docs = docs_df(spark)
        q = queries_df(spark, [(7, "zzz qqq")])
        assert retrieval.bm25_topk(docs, q).count() == 0

    def test_duplicate_query_terms_count_once(self, spark):
        docs = docs_df(spark)
        q1 = queries_df(spark, [(1, "spark spark spark")])
        q2 = queries_df(spark, [(1, "spark")])
        r1 = {(r["doc_id"], r["score_micro"]) for r in retrieval.bm25_topk(docs, q1).collect()}
        r2 = {(r["doc_id"], r["score_micro"]) for r in retrieval.bm25_topk(docs, q2).collect()}
        assert r1 == r2

    def test_tie_breaks_on_doc_id(self, spark):
        docs = spark.createDataFrame(
            [(10, "same text"), (11, "same text")], "doc_id long, text string"
        )
        q = queries_df(spark, [(1, "same")])
        out = sorted(retrieval.bm25_topk(docs, q).collect(), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in out] == [10, 11]

    def test_scores_invariant_across_parallelism(self, spark):
        # the contract behind quantize-per-term-BEFORE-sum: a bigint
        # sum is order-independent, so scores and ranks are identical
        # no matter how the posting stream is partitioned (the analog
        # of running at N vs 4N executors). Tie-heavy fixture: many
        # docs share text, several terms contribute per doc.
        rows = [
            (i, ["spark join shuffle broadcast",
                 "spark spark join window",
                 "join broadcast window sort",
                 "shuffle sort spark broadcast join window"][i % 4])
            for i in range(200)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        q = queries_df(
            spark, [(1, "spark join window"), (2, "broadcast shuffle sort")]
        )
        old = spark.conf.get("spark.sql.shuffle.partitions")
        results = []
        try:
            for npart in (2, 16):
                spark.conf.set("spark.sql.shuffle.partitions", str(npart))
                out = retrieval.bm25_topk(
                    docs.repartition(npart), q, k=50
                ).collect()
                results.append(
                    sorted(tuple(r) for r in out)
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        assert results[0] == results[1]
