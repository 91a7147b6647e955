"""textstats.quality_score passthrough-mode tests (the scan-side
filter form used by corpus.prep_report)."""

from __future__ import annotations

from ilogtail_spark.dataops import textstats


class TestQualityPassthrough:
    def test_passthrough_keeps_columns_and_matches_default(self, spark):
        df = spark.createDataFrame(
            [(1, "the quick brown fox and the lazy dog", "web"),
             (2, "zz", "crawl")],
            "doc_id long, text string, source string",
        )
        plain = {
            r["doc_id"]: r["quality_score_micro"]
            for r in textstats.quality_score(df).collect()
        }
        thru = textstats.quality_score(df, passthrough=True)
        assert set(thru.columns) == {
            "doc_id", "text", "source", "n_tokens", "punct_ratio",
            "stopword_ratio", "distinct_ratio", "quality_score_micro",
        }
        n_tok = {r["doc_id"]: r["n_tokens"] for r in thru.collect()}
        assert n_tok == {1: 8, 2: 1}
        got = {r["doc_id"]: r for r in thru.collect()}
        assert {k: v["quality_score_micro"] for k, v in got.items()} == plain
        assert got[1]["source"] == "web" and got[2]["text"] == "zz"
