"""Semantic tests for sparse lexical retrieval (BM25 top-k)."""

from __future__ import annotations

import math

import pytest
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


class TestEvalAtK:
    def _frames(self, spark):
        # q1: rel doc 10 at rank 2 of 3; q2: nothing relevant
        # retrieved; q3: judged but never retrieved
        results = spark.createDataFrame(
            [
                (1, 11, 1), (1, 10, 2), (1, 12, 3),
                (2, 20, 1), (2, 21, 2),
            ],
            "query_id bigint, doc_id bigint, rank int",
        )
        qrels = spark.createDataFrame(
            [(1, 10), (1, 99), (2, 77), (3, 30)],
            "query_id bigint, doc_id bigint",
        )
        return results, qrels

    def test_metrics(self, spark):
        from ilogtail_spark.dataops import retrieval

        results, qrels = self._frames(spark)
        out = {
            r["query_id"]: r.asDict()
            for r in retrieval.eval_at_k(results, qrels, k=3).collect()
        }
        assert set(out) == {1, 2, 3}
        q1 = out[1]
        assert (q1["n_rel"], q1["n_rel_at_k"]) == (2, 1)
        assert q1["p_at_k_micro"] == 1_000_000 // 3
        assert q1["recall_at_k_micro"] == 500_000
        assert (q1["first_rel_rank"], q1["mrr_nano"]) == (2, 500_000_000)
        q2 = out[2]
        assert (q2["n_rel_at_k"], q2["mrr_nano"]) == (0, 0)
        assert q2["first_rel_rank"] is None
        q3 = out[3]  # judged, never retrieved -> all zero
        assert (q3["n_rel"], q3["n_rel_at_k"], q3["p_at_k_micro"]) == (1, 0, 0)

    def test_rank_cut_and_validation(self, spark):
        from ilogtail_spark.dataops import retrieval

        results, qrels = self._frames(spark)
        # k=1 drops the rank-2 hit for q1
        out = {
            r["query_id"]: r.asDict()
            for r in retrieval.eval_at_k(results, qrels, k=1).collect()
        }
        assert out[1]["n_rel_at_k"] == 0
        with pytest.raises(ValueError, match="k must be"):
            retrieval.eval_at_k(results, qrels, k=0)

    def test_no_judgments_recall_undefined(self, spark):
        from ilogtail_spark.dataops import retrieval

        results = spark.createDataFrame(
            [(9, 1, 1)], "query_id bigint, doc_id bigint, rank int"
        )
        qrels = results.filter(F.lit(False)).select("query_id", "doc_id")
        out = retrieval.eval_at_k(results, qrels, k=3).collect()
        assert out[0]["n_rel"] == 0
        assert out[0]["recall_at_k_micro"] is None


class TestEvalAtKReviewRegressions:
    def test_duplicate_result_rows_collapse(self, spark):
        from ilogtail_spark.dataops import retrieval

        results = spark.createDataFrame(
            [(1, 10, 2), (1, 10, 4), (1, 11, 1)],
            "query_id bigint, doc_id bigint, rank int",
        )
        qrels = spark.createDataFrame(
            [(1, 10)], "query_id bigint, doc_id bigint"
        )
        out = retrieval.eval_at_k(results, qrels, k=5).collect()[0]
        # doc 10 counted once at its best rank, recall capped at 1.0
        assert out["n_rel_at_k"] == 1
        assert out["recall_at_k_micro"] == 1_000_000
        assert (out["first_rel_rank"], out["mrr_nano"]) == (2, 500_000_000)

    def test_query_beyond_cut_still_reported(self, spark):
        from ilogtail_spark.dataops import retrieval

        results = spark.createDataFrame(
            [(5, 1, 11)], "query_id bigint, doc_id bigint, rank int"
        )
        qrels = results.filter(F.lit(False)).select("query_id", "doc_id")
        out = retrieval.eval_at_k(results, qrels, k=10).collect()
        assert len(out) == 1
        assert (out[0]["query_id"], out[0]["p_at_k_micro"]) == (5, 0)


class TestNdcgAtK:
    def _frames(self, spark, results, qrels):
        r = spark.createDataFrame(
            results, "query_id long, doc_id long, rank long")
        q = spark.createDataFrame(qrels, "query_id long, doc_id long")
        return r, q

    def test_weights_table(self):
        w, p = retrieval.dcg_weights(3)
        assert w == [1_000_000, 630_930, 500_000]
        assert p == [1_000_000, 1_630_930, 2_130_930]
        import pytest as _pt
        with _pt.raises(ValueError):
            retrieval.dcg_weights(0)

    def test_position_aware_and_edges(self, spark):
        results = [
            (1, 10, 1), (1, 20, 2), (1, 30, 3),   # rel at ranks 2, 3
            (3, 40, 1),                            # no judgments
            (4, 50, 1),                            # perfect ranking
        ]
        qrels = [(1, 20), (1, 30), (2, 60), (4, 50)]
        r, q = self._frames(spark, results, qrels)
        out = {x["query_id"]: x
               for x in retrieval.ndcg_at_k(r, q, k=3).collect()}
        one = out[1]
        assert one["dcg_micro"] == 630_930 + 500_000
        assert one["idcg_micro"] == 1_630_930
        assert one["ndcg_micro"] == (1_130_930 * 10**6) // 1_630_930
        # judged but nothing retrieved: zero, not missing
        two = out[2]
        assert two["dcg_micro"] == 0 and two["ndcg_micro"] == 0
        # no judgments: undefined, not zero
        three = out[3]
        assert three["n_rel"] == 0 and three["ndcg_micro"] is None
        # perfect single-hit ranking scores exactly 1.0
        assert out[4]["ndcg_micro"] == 1_000_000

    def test_duplicate_results_collapse_to_best_rank(self, spark):
        r, q = self._frames(
            spark, [(1, 10, 3), (1, 10, 1)], [(1, 10)])
        out = retrieval.ndcg_at_k(r, q, k=3).collect()[0]
        assert out["dcg_micro"] == 1_000_000
        assert out["ndcg_micro"] == 1_000_000

    def test_idcg_caps_at_k(self, spark):
        # 5 relevant docs, k=3: ideal list only has 3 slots
        qrels = [(1, d) for d in range(5)]
        r, q = self._frames(spark, [(1, 0, 1)], qrels)
        out = retrieval.ndcg_at_k(r, q, k=3).collect()[0]
        assert out["n_rel"] == 5
        assert out["idcg_micro"] == 2_130_930
