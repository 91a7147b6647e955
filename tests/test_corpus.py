"""Semantic tests for corpus-level pipeline operators: benchmark
decontamination, duplicate-window stats, deterministic sampling, and
token-budget shard packing (distributed prefix sum)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ilogtail_spark.dataops import corpus

DOCS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta"),
    (1, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 0
    (2, "alpha beta gamma delta NINE ten eleven twelve"),  # shares a prefix
    (3, "one two three four five six seven eight nine ten"),
    (4, "short doc"),
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


class TestContamination:
    def test_overlap_vs_benchmark(self, spark):
        df = docs_df(spark)
        bench = df.filter(F.col("doc_id") == 0).select("doc_id", "text")
        out = {
            r["doc_id"]: r
            for r in corpus.contamination_stats(df, bench, n=4).collect()
        }
        assert len(out) == 5  # every doc present, zero-overlap included
        # docs 0 and 1 are identical to the benchmark doc -> fully contaminated
        assert out[0]["contaminated"] and out[1]["contaminated"]
        assert out[0]["n_contaminated"] == out[0]["n_ngrams"] > 0
        # doc 2 shares exactly one 4-gram prefix window
        assert out[2]["n_contaminated"] == 1 and out[2]["contaminated"]
        # doc 3 shares nothing; doc 4 is shorter than n
        assert out[3]["n_contaminated"] == 0 and not out[3]["contaminated"]
        assert out[4]["n_ngrams"] == 0 and not out[4]["contaminated"]

    def test_empty_benchmark(self, spark):
        df = docs_df(spark)
        bench = df.filter(F.lit(False))
        out = corpus.contamination_stats(df, bench, n=4).collect()
        assert all(not r["contaminated"] for r in out)


class TestDupWindows:
    def test_fractions(self, spark):
        out = {
            r["doc_id"]: r
            for r in corpus.dup_window_stats(docs_df(spark), k=4).collect()
        }
        # identical docs 0/1: every window duplicated
        assert out[0]["dup_frac_micro"] == 1_000_000
        assert out[1]["dup_frac_micro"] == 1_000_000
        # doc 2: exactly its first window (alpha beta gamma delta) is shared
        assert out[2]["n_dup_windows"] == 1
        assert 0 < out[2]["dup_frac_micro"] < 1_000_000
        # doc 3 shares nothing; doc 4 has no windows at all
        assert out[3]["n_dup_windows"] == 0 and out[3]["dup_frac_micro"] == 0
        assert out[4]["n_windows"] == 0 and out[4]["dup_frac_micro"] == 0

    def test_distinct_windows_within_doc(self, spark):
        # a doc repeating its own window does NOT self-count as dup
        df = spark.createDataFrame(
            [(0, "a b c d a b c d"), (1, "x y z w")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r for r in corpus.dup_window_stats(df, k=4).collect()
        }
        assert out[0]["n_dup_windows"] == 0


class TestDeterministicSample:
    def test_reproducible_and_partition_independent(self, spark):
        ids = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        keep = corpus.deterministic_keep(F.col("doc_id"), 0.3)
        a = sorted(r["doc_id"] for r in ids.filter(keep).collect())
        b = sorted(
            r["doc_id"]
            for r in ids.repartition(7).filter(keep).collect()
        )
        assert a == b  # same rows regardless of partitioning
        assert 0.2 < len(a) / 2000 < 0.4  # rate roughly honored

    def test_rate_edges(self, spark):
        ids = spark.range(0, 100).withColumnRenamed("id", "doc_id")
        assert ids.filter(corpus.deterministic_keep(F.col("doc_id"), 1.0)).count() == 100
        assert ids.filter(corpus.deterministic_keep(F.col("doc_id"), 0.0)).count() == 0

    def test_salt_gives_independent_draw(self, spark):
        ids = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"] for r in ids.filter(
            corpus.deterministic_keep(F.col("doc_id"), 0.5, salt="a")).collect()}
        b = {r["doc_id"] for r in ids.filter(
            corpus.deterministic_keep(F.col("doc_id"), 0.5, salt="b")).collect()}
        assert a != b
        overlap = len(a & b) / 2000
        assert 0.15 < overlap < 0.35  # ~0.25 if independent

    def test_tiered_rates(self, spark):
        df = spark.range(0, 4000).withColumnRenamed("id", "doc_id").withColumn(
            "q", (F.col("doc_id") % 2 == 0)
        )
        out = corpus.quality_tiered_sample(
            df, [(F.col("q"), 1.0)], default_rate=0.1
        )
        rows = out.collect()
        hi = sum(1 for r in rows if r["q"])
        lo = sum(1 for r in rows if not r["q"])
        assert hi == 2000  # rate-1.0 tier keeps everything
        assert 100 < lo < 350


class TestPacking:
    def test_prefix_sum_matches_serial(self, spark):
        df = spark.createDataFrame(
            [(i, (i * 7) % 13 + 1) for i in range(500)], "doc_id long, v long"
        )
        out = corpus.global_prefix_sum(df, "doc_id", "v", num_partitions=8)
        got = {r["doc_id"]: r["cum"] for r in out.collect()}
        acc = 0
        for i in range(500):
            acc += (i * 7) % 13 + 1
            assert got[i] == acc

    def test_prefix_sum_broadcast_offset_path(self, spark, monkeypatch):
        # above _OFFSET_CASE_MAX partitions the offset apply switches
        # from a literal CASE chain to a broadcast join — force the
        # switch low and check exact values + the join strategy
        monkeypatch.setattr(corpus, "_OFFSET_CASE_MAX", 2)
        df = spark.createDataFrame(
            [(i, (i * 7) % 13 + 1) for i in range(500)], "doc_id long, v long"
        )
        out = corpus.global_prefix_sum(df, "doc_id", "v", num_partitions=8)
        from tests.test_plans import formatted

        assert "BroadcastHashJoin" in formatted(out)
        got = {r["doc_id"]: r["cum"] for r in out.collect()}
        acc = 0
        for i in range(500):
            acc += (i * 7) % 13 + 1
            assert got[i] == acc

    def test_pack_shards(self, spark):
        df = spark.createDataFrame(
            [(i, " ".join(["w"] * 10)) for i in range(100)],
            "doc_id long, text string",
        )
        out = corpus.pack_token_budget(df, budget=250, num_partitions=4)
        rows = {r["doc_id"]: r["shard_id"] for r in out.collect()}
        # 10 tokens/doc, 250-token budget -> 25 docs per shard, in id order
        for i in range(100):
            assert rows[i] == i // 25

    def test_pack_stable_under_partitioning(self, spark):
        df = spark.createDataFrame(
            [(i, " ".join(["w"] * (i % 9 + 1))) for i in range(300)],
            "doc_id long, text string",
        )
        a = {r["doc_id"]: r["shard_id"]
             for r in corpus.pack_token_budget(df, 100, num_partitions=3).collect()}
        b = {r["doc_id"]: r["shard_id"]
             for r in corpus.pack_token_budget(
                 df.repartition(11), 100, num_partitions=7).collect()}
        assert a == b


class TestImportanceScores:
    def test_target_like_docs_score_higher(self, spark):
        rows = [
            (0, "machine learning models train on data"),
            (1, "machine learning models train on data"),
            (2, "cooking recipes with butter and flour"),
            (3, "football scores league table results"),
            (4, "machine learning data pipelines"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        target = df.filter(F.col("doc_id") == 0)
        out = {
            r["doc_id"]: r for r in corpus.importance_scores(df, target).collect()
        }
        assert len(out) == 5
        # docs sharing the target's vocabulary outrank unrelated ones
        assert out[1]["logratio_micro"] > out[2]["logratio_micro"]
        assert out[4]["logratio_micro"] > out[3]["logratio_micro"]
        # identical docs get identical scores (0 is the target, 1 its dup)
        assert out[0]["logratio_micro"] == out[1]["logratio_micro"]

    def test_feature_count_is_unigrams_plus_bigrams(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c"), (1, "solo"), (2, "")], "doc_id long, text string"
        )
        target = df.filter(F.col("doc_id") == 0)
        out = {
            r["doc_id"]: r for r in corpus.importance_scores(df, target).collect()
        }
        assert out[0]["n_features"] == 5  # 3 unigrams + 2 bigrams
        assert out[1]["n_features"] == 1
        assert out[2]["n_features"] == 0 and out[2]["logratio_micro"] == 0

    def test_deterministic_across_partitionings(self, spark):
        rows = [(i, f"w{i % 7} w{i % 3} common token stream") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        target = df.filter(F.col("doc_id") % 5 == 0)
        a = corpus.importance_scores(df.repartition(1), target).collect()
        b = corpus.importance_scores(df.repartition(13), target).collect()
        assert {tuple(r) for r in a} == {tuple(r) for r in b}


class TestReviewRegressions:
    def test_contamination_accepts_text_only_benchmark(self, spark):
        df = docs_df(spark)
        bench = spark.createDataFrame(
            [("alpha beta gamma delta epsilon zeta eta theta",)], "text string"
        )
        out = {
            r["doc_id"]: r
            for r in corpus.contamination_stats(df, bench, n=4).collect()
        }
        assert out[0]["contaminated"] and out[1]["contaminated"]
        assert not out[3]["contaminated"]

    def test_importance_scores_cover_empty_docs_without_df_rescan(self, spark):
        df = spark.createDataFrame(
            [(0, "a b"), (1, "")], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: r
            for r in corpus.importance_scores(df, df.limit(1)).collect()
        }
        assert set(out) == {0, 1}
        assert out[1]["n_features"] == 0 and out[1]["logratio_micro"] == 0


class TestSpanRemoval:
    def test_shared_span_removed_from_all_occurrences(self, spark):
        df = spark.createDataFrame(
            [
                (0, "alpha beta gamma delta unique tail zero"),
                (1, "start one alpha beta gamma delta other words"),
                (2, "totally unrelated text with no overlap here"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in corpus.remove_duplicate_spans(df, k=4).collect()
        }
        # "alpha beta gamma delta" occurs in docs 0 and 1 -> removed from both
        assert out[0]["cleaned"] == "unique tail zero"
        assert out[1]["cleaned"] == "start one other words"
        assert out[0]["n_removed"] == 4 and out[1]["n_removed"] == 4
        assert out[2]["cleaned"] == "totally unrelated text with no overlap here"
        assert out[2]["n_removed"] == 0

    def test_intra_doc_repetition_untouched(self, spark):
        df = spark.createDataFrame(
            [
                (0, "loop loop loop loop loop loop loop loop"),
                (1, "something else entirely different here now"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in corpus.remove_duplicate_spans(df, k=4).collect()
        }
        assert out[0]["n_removed"] == 0  # repeated only within one doc

    def test_short_doc_untouched(self, spark):
        df = spark.createDataFrame(
            [(0, "tiny doc"), (1, "tiny doc")], "doc_id long, text string"
        )
        out = corpus.remove_duplicate_spans(df, k=4).collect()
        assert all(r["n_removed"] == 0 and r["cleaned"] == "tiny doc" for r in out)

    def test_overlapping_windows_union_coverage(self, spark):
        # two docs share a 6-token run; with k=4 the covered positions
        # are the UNION of the three overlapping windows, not 3*k
        shared = "a b c d e f"
        df = spark.createDataFrame(
            [(0, f"{shared} x1 y1 z1"), (1, f"p q {shared} r s")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in corpus.remove_duplicate_spans(df, k=4).collect()
        }
        assert out[0]["n_removed"] == 6
        assert out[0]["cleaned"] == "x1 y1 z1"
        assert out[1]["cleaned"] == "p q r s"


class TestBlocklistAndMixture:
    def test_blocklist_any_hit_drops(self, spark):
        df = spark.createDataFrame(
            [
                (0, "clean text here"),
                (1, "contains BadWord inside"),
                (2, "badword badword twice"),
            ],
            "doc_id long, text string",
        )
        kept = corpus.token_blocklist_filter(df, ["badword"]).collect()
        assert sorted(r["doc_id"] for r in kept) == [0]
        kept1 = corpus.token_blocklist_filter(df, ["badword"], max_hits=1)
        assert sorted(r["doc_id"] for r in kept1.collect()) == [0, 1]

    def test_mixture_report_counts_corpus_wide_dups(self, spark):
        df = spark.createDataFrame(
            [
                (0, "shared boilerplate", "web"),
                (1, "shared boilerplate", "books"),
                (2, "unique one", "web"),
            ],
            "doc_id long, text string, source string",
        )
        out = {r["source"]: r for r in corpus.mixture_report(df).collect()}
        # the dup pair spans sources: BOTH buckets count it
        assert out["web"]["n_dup_docs"] == 1
        assert out["books"]["n_dup_docs"] == 1
        assert out["web"]["n_docs"] == 2 and out["web"]["n_tokens"] == 4


class TestSpanRemovalEdges:
    def test_fully_covered_doc_yields_empty_cleaned(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c d"), (1, "a b c d"), (2, "other words here now")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in corpus.remove_duplicate_spans(df, k=4).collect()
        }
        assert out[0]["cleaned"] == "" and out[0]["n_removed"] == 4
        assert out[1]["cleaned"] == "" and out[1]["n_removed"] == 4
        assert out[2]["n_removed"] == 0

    def test_mixture_report_keeps_null_text_docs(self, spark):
        df = spark.createDataFrame(
            [(0, "a b", "web"), (1, None, "web")],
            "doc_id long, text string, source string",
        )
        out = corpus.mixture_report(df).collect()
        assert out[0]["n_docs"] == 2 and out[0]["n_tokens"] == 2


class TestChunkWindows:
    def test_windows_overlap_and_tail(self, spark):
        # 10 tokens, window 4, stride 3 -> starts 0,3,6,9
        df = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(10)))],
            "doc_id long, text string",
        )
        out = sorted(
            corpus.chunk_windows(df, window=4, stride=3).collect(),
            key=lambda r: r["chunk_idx"],
        )
        assert [(r["chunk_idx"], r["start_tok"], r["n_tokens"]) for r in out] == [
            (0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 9, 1)
        ]
        import hashlib

        assert out[1]["chunk_md5"] == hashlib.md5(b"t3 t4 t5 t6").hexdigest()
        assert out[3]["chunk_md5"] == hashlib.md5(b"t9").hexdigest()

    def test_short_doc_one_full_cover_chunk(self, spark):
        df = spark.createDataFrame(
            [(1, "a b"), (2, "only")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in corpus.chunk_windows(df, 128, 64).collect()}
        assert out[1]["chunk_idx"] == 0 and out[1]["n_tokens"] == 2
        assert out[2]["n_tokens"] == 1

    def test_empty_and_null_docs_yield_no_chunks(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "   ")], "doc_id long, text string"
        )
        assert corpus.chunk_windows(df).count() == 0

    def test_rejects_nonpositive_params(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            corpus.chunk_windows(df, window=0)
        with _pytest.raises(ValueError):
            corpus.chunk_windows(df, stride=0)


class TestChunkDedup:
    def test_boilerplate_collapses_keep_min(self, spark):
        # the same 4-token license header opens docs 1, 2 and 5; with
        # window=stride=4 it is chunk 0 of each — one survivor (the
        # lowest doc_id), dup_count carries the corpus-wide repetition
        header = "apache license version two"
        df = spark.createDataFrame(
            [
                (5, header + " body five"),
                (1, header + " body one extra"),
                (2, header + " different tail"),
                (3, "entirely fresh words here"),
            ],
            "doc_id long, text string",
        )
        out = corpus.chunk_dedup(df, window=4, stride=4).collect()
        by_digest = {}
        for r in out:
            by_digest.setdefault(r["chunk_md5"], []).append(r)
        import hashlib

        hdr_md5 = hashlib.md5(header.encode()).hexdigest()
        assert len(by_digest[hdr_md5]) == 1
        keeper = by_digest[hdr_md5][0]
        assert keeper["doc_id"] == 1 and keeper["chunk_idx"] == 0
        assert keeper["dup_count"] == 3
        # every digest appears exactly once and unique chunks carry 1
        assert all(len(v) == 1 for v in by_digest.values())
        fresh_md5 = hashlib.md5(b"entirely fresh words here").hexdigest()
        assert by_digest[fresh_md5][0]["dup_count"] == 1

    def test_within_doc_repeat_dedups(self, spark):
        # a doc repeating the same window internally keeps the lowest
        # chunk_idx occurrence
        df = spark.createDataFrame(
            [(7, "x y x y x y")], "doc_id long, text string"
        )
        out = corpus.chunk_dedup(df, window=2, stride=2).collect()
        assert len(out) == 1
        assert out[0]["chunk_idx"] == 0 and out[0]["dup_count"] == 3


class TestRebalanceMixture:
    DOCS = [
        # src a: 3 docs x 4 tokens = 12 tokens
        (0, "one two three four", "a"),
        (1, "five six seven eight", "a"),
        (2, "nine ten eleven twelve", "a"),
        # src b: 2 docs x 5 tokens = 10 tokens
        (3, "b one b two b", "b"),
        (4, "b three b four b", "b"),
        # src c: 1 doc, weight omitted from targets -> dropped
        (5, "c tokens never kept", "c"),
    ]

    @staticmethod
    def _expected(targets, budget, salt=""):
        import hashlib
        import re

        toks = {
            i: len([t for t in re.split(r"\s+", txt) if t])
            for i, txt, _ in TestRebalanceMixture.DOCS
        }
        tot = {}
        for i, _, s in TestRebalanceMixture.DOCS:
            tot[s] = tot.get(s, 0) + toks[i]
        d = corpus._REBALANCE_HEX_DIGITS
        kept = []
        for i, _, s in TestRebalanceMixture.DOCS:
            tgt = budget * targets.get(s, 0) // 1_000_000
            if tgt >= tot[s]:
                kept.append(i)
                continue
            thr = format(tgt * 16**d // tot[s], f"0{d}x")
            draw = hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:d]
            if draw < thr:
                kept.append(i)
        return sorted(kept)

    def df(self, spark):
        return spark.createDataFrame(
            self.DOCS, "doc_id long, text string, source string"
        )

    def test_matches_integer_threshold_math(self, spark):
        targets = {"a": 300_000, "b": 200_000}
        out = corpus.rebalance_mixture(
            self.df(spark), targets, token_budget=20, salt="s"
        )
        got = sorted(r["doc_id"] for r in out.select("doc_id").collect())
        assert got == self._expected(targets, 20, salt="s")

    def test_overweight_source_kept_whole_and_absent_dropped(self, spark):
        targets = {"a": 1_000_000}  # 20-token budget >= src a's 12
        out = corpus.rebalance_mixture(
            self.df(spark), targets, token_budget=20
        )
        got = sorted(r["doc_id"] for r in out.select("doc_id").collect())
        assert got == [0, 1, 2]  # all of a, none of b or c

    def test_reproducible_across_partitionings(self, spark):
        targets = {"a": 500_000, "b": 500_000}
        base = self.df(spark)
        a = corpus.rebalance_mixture(base, targets, token_budget=10)
        b = corpus.rebalance_mixture(
            base.repartition(7, "doc_id"), targets, token_budget=10
        )
        assert sorted(r["doc_id"] for r in a.collect()) == sorted(
            r["doc_id"] for r in b.collect()
        )

    def test_passes_all_columns_through(self, spark):
        out = corpus.rebalance_mixture(
            self.df(spark), {"a": 1_000_000}, token_budget=100
        )
        assert set(out.columns) == {"doc_id", "text", "source"}


class TestDecontaminateFilter:
    def test_contaminated_doc_dropped_rows_intact(self, spark):
        bench = spark.createDataFrame(
            [(100, "the secret eval answer is forty two")],
            "doc_id long, text string",
        )
        docs = spark.createDataFrame(
            [
                (1, "prefix the secret eval answer is forty two suffix", "keepme"),
                (2, "totally unrelated training document text here", "x"),
                (3, "short doc", "y"),  # < n tokens: never contaminated
            ],
            "doc_id long, text string, extra string",
        )
        out = corpus.decontaminate_filter(docs, bench, n=5)
        rows = {r["doc_id"]: r for r in out.collect()}
        assert set(rows) == {2, 3}
        assert rows[2]["extra"] == "x"  # full rows survive

    def test_max_hits_threshold(self, spark):
        bench = spark.createDataFrame(
            [(0, "alpha beta gamma delta epsilon")], "doc_id long, text string"
        )
        doc = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta")],
            "doc_id long, text string",
        )
        # the doc shares exactly 2 distinct 5-grams with the benchmark?
        # no — one ('alpha..epsilon'); with max_hits=1 it survives
        assert corpus.decontaminate_filter(doc, bench, n=5).count() == 0
        assert (
            corpus.decontaminate_filter(doc, bench, n=5, max_hits=1).count() == 1
        )


class TestAssignSplits:
    SPLITS = {"train": 900_000, "val": 50_000, "test": 50_000}

    def test_matches_reference_draw_and_is_exhaustive(self, spark):
        df = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(400)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["split"]
            for r in corpus.assign_splits(df, self.SPLITS).collect()
        }
        import hashlib

        def expect(i: int) -> str:
            draw = hashlib.md5(str(i).encode()).hexdigest()[:8]
            cum = 0
            names = list(self.SPLITS)
            for name in names[:-1]:
                cum += self.SPLITS[name]
                if draw < format(cum * 16**8 // 1_000_000, "08x"):
                    return name
            return names[-1]

        assert got == {i: expect(i) for i in range(400)}
        # every row assigned; majority split dominates at these shares
        assert set(got.values()) <= set(self.SPLITS)
        assert sum(1 for v in got.values() if v == "train") > 300

    def test_key_col_keeps_families_together(self, spark):
        rows = [(i, f"fam{i % 7}") for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, family string")
        out = corpus.assign_splits(
            df, self.SPLITS, key_col="family"
        ).collect()
        by_family: dict[str, set] = {}
        for r in out:
            by_family.setdefault(r["family"], set()).add(r["split"])
        assert all(len(s) == 1 for s in by_family.values())

    def test_null_key_falls_back_to_id(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, "k")], "doc_id long, family string"
        )
        out = corpus.assign_splits(df, self.SPLITS, key_col="family")
        assert out.filter(F.col("split").isNull()).count() == 0

    def test_bad_shares_rejected(self, spark):
        df = spark.createDataFrame([(1,)], "doc_id long")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="sum to 1,000,000"):
            corpus.assign_splits(df, {"train": 1})
        with _pytest.raises(ValueError, match="non-negative"):
            corpus.assign_splits(
                df, {"a": -1, "b": 1_000_001}
            )


class TestSnapshotDiff:
    def test_all_statuses(self, spark):
        old = spark.createDataFrame(
            [(1, "same"), (2, "will change"), (3, "will vanish")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(1, "same"), (2, "changed!"), (4, "brand new")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r for r in corpus.snapshot_diff(old, new).collect()
        }
        assert set(out) == {2, 3, 4}
        assert out[2]["status"] == "changed"
        assert out[2]["old_md5"] is not None and out[2]["new_md5"] is not None
        assert out[3]["status"] == "removed" and out[3]["new_md5"] is None
        assert out[4]["status"] == "added" and out[4]["old_md5"] is None

    def test_include_unchanged(self, spark):
        old = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        out = corpus.snapshot_diff(old, old, include_unchanged=True).collect()
        assert len(out) == 1 and out[0]["status"] == "unchanged"
        assert corpus.snapshot_diff(old, old).count() == 0


class TestSourceQuotaSample:
    @staticmethod
    def _brute(rows, quota):
        import hashlib

        draws = {
            i: hashlib.md5(str(i).encode()).hexdigest()[:8]
            for i, _ in rows
        }
        by_src: dict = {}
        for i, s in rows:
            by_src.setdefault(s, []).append(i)
        keep = set()
        for s, ids in by_src.items():
            ids.sort(key=lambda i: (draws[i], i))
            keep.update(ids[:quota])
        return keep

    def test_matches_window_semantics(self, spark):
        rows = [(i, f"s{i % 4}") for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        got = {
            r["doc_id"]
            for r in corpus.source_quota_sample(
                df, quota=10, prefilter_factor=2
            ).collect()
        }
        assert got == self._brute(rows, 10)

    def test_small_sources_kept_whole_and_null_group(self, spark):
        rows = [(1, "a"), (2, "a"), (3, None), (4, None), (5, None)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = corpus.source_quota_sample(df, quota=3)
        assert out.count() == 5  # both groups under quota
        got = {
            r["doc_id"]
            for r in corpus.source_quota_sample(df, quota=2).collect()
        }
        assert got == self._brute(rows, 2)

    def test_shortfall_fallback_is_exact(self, spark):
        # adversarial fixture: one source whose 20 members all draw in
        # the TOP quarter of the hash space, so a factor-1 prefilter
        # (threshold = half the space) catches zero candidates and the
        # exactness guard must refill
        import hashlib

        high = [
            i
            for i in range(20000)
            if hashlib.md5(str(i).encode()).hexdigest()[:8] >= "c0000000"
        ][:20]
        assert len(high) == 20
        rows = [(i, "hot") for i in high]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        got = {
            r["doc_id"]
            for r in corpus.source_quota_sample(
                df, quota=10, prefilter_factor=1
            ).collect()
        }
        assert got == self._brute(rows, 10)
        assert len(got) == 10

    def test_bad_args(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="quota"):
            corpus.source_quota_sample(df, quota=0)
        with _pytest.raises(ValueError, match="prefilter_factor"):
            corpus.source_quota_sample(df, quota=1, prefilter_factor=0)


class TestPrepReport:
    SPLITS = {"train": 900_000, "val": 50_000, "test": 50_000}

    def test_dedup_fires_and_report_shape(self, spark):
        base = [
            (i, f"high quality document with the and of to is that for {i} "
                 * 3, "web")
            for i in range(20)
        ]
        dups = [(i + 1000, t, s) for (i, t, s) in base[:5]]
        # junk scores exactly 500_000 (punct part 250k + distinct part
        # 250k; fails the length band and has no stopwords)
        junk = [(500, "x", "web")]
        df = spark.createDataFrame(
            base + dups + junk, "doc_id long, text string, source string"
        )
        out = corpus.prep_report(df, self.SPLITS, min_quality_micro=600_000)
        rows = out.collect()
        # duplicates collapse: 20 unique texts survive dedup; junk is
        # quality-filtered; every survivor has a split
        assert sum(r["n_docs"] for r in rows) == 20
        assert all(r["split"] in self.SPLITS for r in rows)
        assert all(r["n_tokens"] > 0 for r in rows)

    def test_quality_threshold_filters(self, spark):
        df = spark.createDataFrame(
            [(1, "short", "a")], "doc_id long, text string, source string"
        )
        assert corpus.prep_report(
            df, self.SPLITS, min_quality_micro=999_999
        ).count() == 0


class TestDropDuplicateLines:
    def test_first_occurrence_survives_globally(self, spark):
        df = spark.createDataFrame(
            [
                (1, "alpha beta\ncommon footer\nunique one"),
                (2, "common footer\nunique two"),
                (3, "unique three\ncommon footer"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in corpus.drop_duplicate_lines(df).collect()
        }
        # footer survives only in doc 1 (its first (id, pos) occurrence)
        assert out[1]["cleaned"] == "alpha beta\ncommon footer\nunique one"
        assert out[1]["n_removed"] == 0
        assert out[2]["cleaned"] == "unique two" and out[2]["n_removed"] == 1
        assert out[3]["cleaned"] == "unique three" and out[3]["n_removed"] == 1
        assert out[2]["n_lines"] == 2 and out[3]["n_lines"] == 2

    def test_within_doc_duplicates_collapse(self, spark):
        df = spark.createDataFrame(
            [(1, "same\nsame\nsame")], "doc_id long, text string"
        )
        row = corpus.drop_duplicate_lines(df).collect()[0]
        assert row["cleaned"] == "same" and row["n_removed"] == 2

    def test_short_lines_pass_through(self, spark):
        df = spark.createDataFrame(
            [(1, "a\n\nb"), (2, "a\n\nb")], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: r
            for r in corpus.drop_duplicate_lines(
                df, min_line_chars=2
            ).collect()
        }
        # every line is under 2 chars -> passthrough, nothing deduped
        assert out[1]["cleaned"] == "a\n\nb" and out[1]["n_removed"] == 0
        assert out[2]["cleaned"] == "a\n\nb" and out[2]["n_removed"] == 0

    def test_trim_defines_identity(self, spark):
        df = spark.createDataFrame(
            [(1, "hello world"), (2, "  hello world  ")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["n_removed"]
            for r in corpus.drop_duplicate_lines(df).collect()
        }
        assert out == {1: 0, 2: 1}


class TestReviewRegressionsR5:
    def test_assign_splits_trailing_zero_share(self, spark):
        # cum hits 1e6 before the last split -> threshold must be the
        # keep-all sentinel, not the 9-char '100000000' (which broke
        # the 8-char lexicographic compare and leaked ~15/16 of rows
        # into the zero-share split)
        df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        out = corpus.assign_splits(
            df, {"a": 950_000, "b": 50_000, "zero": 0}
        )
        counts = {
            r["split"]: r["cnt"]
            for r in out.groupBy("split").agg(
                F.count("*").alias("cnt")
            ).collect()
        }
        assert counts.get("zero", 0) == 0
        assert counts.get("a", 0) > 400  # ~95%
        # degenerate single-split-takes-all with a zero tail
        out2 = corpus.assign_splits(df, {"all": 1_000_000, "none": 0})
        assert out2.filter(F.col("split") != "all").count() == 0

    def test_snapshot_diff_null_text(self, spark):
        old = spark.createDataFrame(
            [(1, None), (2, None), (3, "x")], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(2, "now real"), (3, "x")], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: r["status"]
            for r in corpus.snapshot_diff(old, new).collect()
        }
        # doc 1 (NULL text, absent from new) is REMOVED, not 'added';
        # doc 2 (NULL -> text) is CHANGED; doc 3 unchanged (filtered)
        assert out == {1: "removed", 2: "changed"}
        both_null = corpus.snapshot_diff(
            spark.createDataFrame([(9, None)], "doc_id long, text string"),
            spark.createDataFrame([(9, None)], "doc_id long, text string"),
            include_unchanged=True,
        ).collect()
        assert both_null[0]["status"] == "unchanged"

    def test_line_dedup_null_text(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, "keep me")], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: r for r in corpus.drop_duplicate_lines(df).collect()
        }
        assert out[1]["n_lines"] == 0 and out[1]["n_removed"] == 0
        assert out[1]["cleaned"] is None
        assert out[2]["cleaned"] == "keep me"


class TestDistinctiveTerms:
    def test_rare_term_outranks_common(self, spark):
        rows = [
            (1, "a", "zebra common common"),
            (2, "a", "common word"),
            (3, "b", "common word other"),
            (4, "b", "common common common"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        out = corpus.distinctive_terms(df, top_k=1).collect()
        top = {r["source"]: r for r in out}
        # 'zebra': tf=1, df=1 -> idf 4e6, score 4e6 beats
        # 'common' (tf=3, df=4 -> 3e6) and 'word' (tf=1, df=2 -> 2e6)
        assert top["a"]["term"] == "zebra"
        assert top["a"]["score"] == 4_000_000
        assert top["a"]["doc_freq"] == 1 and top["a"]["idf_micro"] == 4_000_000

    def test_tie_breaks_by_term_and_bad_k(self, spark):
        df = spark.createDataFrame(
            [(1, "s", "bb aa")], "doc_id long, source string, text string"
        )
        [r] = corpus.distinctive_terms(df, top_k=1).collect()
        assert r["term"] == "aa"  # equal scores -> term ascending
        with pytest.raises(ValueError, match="top_k"):
            corpus.distinctive_terms(df, top_k=0)


class TestCollocations:
    def test_lift_math_and_order(self, spark):
        # bigrams of "a b a b": (a,b) (b,a) (a,b) -> N=3
        df = spark.createDataFrame(
            [(1, "a b a b")], "doc_id long, text string"
        )
        rows = corpus.collocations(df, min_count=1, top_k=10).collect()
        got = {(r["w1"], r["w2"]): r for r in rows}
        ab = got[("a", "b")]
        assert ab["pair_count"] == 2 and ab["c1"] == 2 and ab["c2"] == 2
        assert ab["lift_micro"] == 3 * 2 * 1_000_000 // (2 * 2)
        ba = got[("b", "a")]
        assert ba["lift_micro"] == 3 * 1 * 1_000_000 // (2 * 2)
        # descending lift order
        lifts = [r["lift_micro"] for r in rows]
        assert lifts == sorted(lifts, reverse=True)

    def test_min_count_prunes_hapax_pairs(self, spark):
        df = spark.createDataFrame(
            [(1, "rare pair"), (2, "hot dog hot dog hot dog hot dog hot dog")],
            "doc_id long, text string",
        )
        rows = corpus.collocations(df, min_count=5, top_k=10).collect()
        keys = {(r["w1"], r["w2"]) for r in rows}
        assert ("rare", "pair") not in keys
        assert ("hot", "dog") in keys

    def test_lowercased_and_validation(self, spark):
        import pytest
        df = spark.createDataFrame(
            [(1, "Foo Bar foo bar")], "doc_id long, text string"
        )
        rows = corpus.collocations(df, min_count=2, top_k=5).collect()
        assert {(r["w1"], r["w2"]) for r in rows} == {("foo", "bar")}
        with pytest.raises(ValueError, match="min_count"):
            corpus.collocations(df, min_count=0)
        with pytest.raises(ValueError, match="top_k"):
            corpus.collocations(df, top_k=0)


class TestCrossSourceDups:
    def test_pairwise_counts_and_null_handling(self, spark):
        rows = [
            (1, "x", "s1"), (2, "x", "s2"),      # shared across s1/s2
            (3, "y", "s1"),                        # unique to s1
            (4, None, "s2"), (5, None, "s3"),     # NULL text == '' both sides
            (6, "z", None),                        # NULL source excluded
            (7, "x", "s1"),                        # dup within s1: DISTINCT
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        got = {(r["source_a"], r["source_b"]): r["n_shared"]
               for r in corpus.cross_source_dups(df).collect()}
        assert got == {("s1", "s2"): 1, ("s2", "s3"): 1}

    def test_three_way_overlap_counts_each_pair(self, spark):
        df = spark.createDataFrame(
            [(1, "t", "a"), (2, "t", "b"), (3, "t", "c")],
            "doc_id long, text string, source string",
        )
        got = {(r["source_a"], r["source_b"]): r["n_shared"]
               for r in corpus.cross_source_dups(df).collect()}
        assert got == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1}


class TestLengthHistogram:
    def test_power_of_two_buckets(self, spark):
        rows = [
            (1, "", "s1"),          # bucket 0
            (2, "x", "s1"),         # len 1 -> bucket 1 [1, 1]
            (3, "xx", "s1"),        # len 2 -> bucket 2 [2, 3]
            (4, "xxx", "s1"),       # len 3 -> bucket 2
            (5, "x" * 8, "s2"),     # len 8 -> bucket 4 [8, 15]
            (6, None, None),        # NULL text/source
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        got = {(r["source"], r["bucket"]): r for r in
               corpus.length_histogram(df).collect()}
        assert got[("s1", 0)]["n_docs"] == 1
        assert got[("s1", 1)]["lo_chars"] == 1
        assert got[("s1", 2)]["n_docs"] == 2
        assert (got[("s1", 2)]["lo_chars"], got[("s1", 2)]["hi_chars"]) == (2, 3)
        assert (got[("s2", 4)]["lo_chars"], got[("s2", 4)]["hi_chars"]) == (8, 15)
        # NULL source stays a NULL slice (joins onto mixture_report)
        assert got[(None, 0)]["n_docs"] == 1


class TestSplitLeakage:
    SPLITS = {"train": 900_000, "val": 50_000, "test": 50_000}

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_exact_clones_cross_splits(self, spark):
        # clone each doc under id+1000 — identical text shares every
        # LSH band, so each (i, i+1000) pair is a guaranteed candidate;
        # brute-force the expected cross-split pair set via split_expr
        base = "the quick brown fox jumps over the lazy dog number"
        rows = []
        for i in range(40):
            rows.append((i, f"{base} {i} alpha beta gamma delta"))
            rows.append((i + 1000, f"{base} {i} alpha beta gamma delta"))
        df = self._docs(spark, rows)
        out = {
            (r["split_a"], r["split_b"]): (r["n_pairs"], r["n_docs"])
            for r in corpus.split_leakage(df, self.SPLITS).collect()
        }
        # independent expectation: evaluate the same split draw per id
        splits = {
            r["doc_id"]: r["split"]
            for r in corpus.assign_splits(df, self.SPLITS).collect()
        }
        expected: dict[tuple[str, str], list[tuple[int, int]]] = {}
        for i in range(40):
            sa, sb = splits[i], splits[i + 1000]
            if sa != sb:
                key = (min(sa, sb), max(sa, sb))
                expected.setdefault(key, []).append((i, i + 1000))
        # the shared base sentence makes some DISTINCT docs near-dups
        # too, so out may carry extra cross-split keys beyond the
        # guaranteed clone pairs — expected must be a subset
        assert set(expected) <= set(out)
        for key, pairs in expected.items():
            n_pairs, n_docs = out[key]
            # every expected clone pair must be counted (candidate
            # generation may add near-dup pairs between distinct docs,
            # but identical clones are guaranteed candidates)
            assert n_pairs >= len(pairs)
            assert n_docs >= len({d for p in pairs for d in p})

    def test_no_leak_when_single_split_dominates(self, spark):
        # all mass in one split -> no pair can cross
        rows = [(i, "same text for everyone here") for i in range(10)]
        df = self._docs(spark, rows)
        out = corpus.split_leakage(df, {"train": 1_000_000}).collect()
        assert out == []

    def test_share_validation(self, spark):
        df = self._docs(spark, [(1, "a b c d e")])
        with pytest.raises(ValueError, match="1,000,000"):
            corpus.split_leakage(df, {"train": 1})


class TestSplitExpr:
    def test_matches_assign_splits(self, spark):
        # the factored expression and assign_splits must agree row-for-row
        splits = {"train": 900_000, "val": 50_000, "test": 50_000}
        df = spark.createDataFrame(
            [(i,) for i in range(200)], "doc_id bigint"
        )
        a = corpus.assign_splits(df, splits)
        b = df.withColumn(
            "split2", corpus.split_expr(F.col("doc_id").cast("string"), splits)
        )
        joined = a.join(b, "doc_id")
        assert joined.filter(F.col("split") != F.col("split2")).count() == 0


class TestSnapshotDrift:
    def test_per_source_deltas(self, spark):
        old = spark.createDataFrame(
            [
                (1, "web", "a b c"),
                (2, "web", "d e"),
                (3, "books", "x y z w"),
                (4, "gone", "only here"),
            ],
            "doc_id bigint, source string, text string",
        )
        new = spark.createDataFrame(
            [
                (1, "web", "a b c d"),       # +1 token
                (3, "books", "x y"),          # -2 tokens
                (5, "fresh", None),           # new source, NULL text
            ],
            "doc_id bigint, source string, text string",
        )
        out = {
            r["source"]: r.asDict()
            for r in corpus.snapshot_drift(old, new).collect()
        }
        assert set(out) == {"web", "books", "gone", "fresh"}
        web = out["web"]
        assert (web["n_docs_old"], web["n_docs_new"], web["doc_delta"]) == (2, 1, -1)
        assert (web["tokens_old"], web["tokens_new"], web["token_delta"]) == (5, 4, -1)
        assert web["mean_tokens_old_micro"] == 5 * 1_000_000 // 2
        assert web["mean_tokens_new_micro"] == 4 * 1_000_000
        gone = out["gone"]
        assert (gone["n_docs_new"], gone["tokens_new"]) == (0, 0)
        assert gone["mean_tokens_new_micro"] is None
        fresh = out["fresh"]
        assert (fresh["n_docs_old"], fresh["n_docs_new"]) == (0, 1)
        assert fresh["tokens_new"] == 0  # NULL text counts 0 tokens
        assert fresh["mean_tokens_old_micro"] is None
        assert fresh["mean_tokens_new_micro"] == 0


class TestDupRateBySource:
    def test_rates(self, spark):
        rows = [
            (1, "web", "a"), (2, "web", "a"), (3, "web", "b"),
            (4, "books", "x"),
            (5, "nulls", None), (6, "nulls", None), (7, "nulls", "y"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
        out = {
            r["source"]: r.asDict()
            for r in corpus.dup_rate_by_source(df).collect()
        }
        web = out["web"]
        assert (web["n_docs"], web["n_distinct"], web["n_dup_docs"]) == (3, 2, 1)
        assert web["dup_rate_micro"] == 1_000_000 // 3
        assert out["books"]["dup_rate_micro"] == 0
        # NULL texts form ONE group: 2 NULLs + 'y' -> 2 distinct, 1 dup
        nl = out["nulls"]
        assert (nl["n_distinct"], nl["n_dup_docs"]) == (2, 1)


class TestLanguageMixBySource:
    def test_shares_within_source(self, spark):
        de = "der Hund und die Katze sind nicht mit einem Ball von den Kindern"
        en = "the cat and the dog are not with a ball from the children today"
        rows = [
            (1, "web", en), (2, "web", en), (3, "web", de),
            (4, "books", de),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
        out = {
            (r["source"], r["lang"]): r.asDict()
            for r in corpus.language_mix_by_source(df).collect()
        }
        assert out[("web", "en")]["n_docs"] == 2
        assert out[("web", "en")]["share_micro"] == 2_000_000 // 3
        assert out[("web", "de")]["share_micro"] == 1_000_000 // 3
        assert out[("books", "de")]["share_micro"] == 1_000_000


class TestCanaryScan:
    def test_occurrence_counts(self, spark):
        canary = "CANARY-1234"
        rows = [
            (1, f"intro {canary} middle {canary} end"),  # 2 occurrences
            (2, f"only one {canary}"),
            (3, "clean doc"),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "id bigint, text string")
        out = corpus.canary_scan(df, [canary, "OTHER-X"]).collect()
        assert len(out) == 1
        r = out[0]
        assert r["canary"] == canary
        assert r["n_docs"] == 2 and r["n_hits"] == 3 and r["first_doc"] == 1

    def test_multiple_canaries_and_overlap_free_counting(self, spark):
        rows = [(1, "aaaa"), (2, "ab ab")]
        df = spark.createDataFrame(rows, "id bigint, text string")
        out = {r["canary"]: r.asDict()
               for r in corpus.canary_scan(df, ["aa", "ab"]).collect()}
        # replace-based counting is non-overlapping: 'aaaa' has 2 'aa'
        assert out["aa"]["n_hits"] == 2 and out["aa"]["n_docs"] == 1
        assert out["ab"]["n_hits"] == 2 and out["ab"]["n_docs"] == 1

    def test_validates(self, spark):
        df = spark.createDataFrame([(1, "x")], "id bigint, text string")
        with pytest.raises(ValueError, match="non-empty"):
            corpus.canary_scan(df, [])
        with pytest.raises(ValueError, match="empty canary"):
            corpus.canary_scan(df, ["ok", ""])
        with pytest.raises(ValueError, match="duplicate"):
            corpus.canary_scan(df, ["x", "x"])
        with pytest.raises(ValueError, match="missing columns"):
            corpus.canary_scan(df.select("id"), ["x"])


class TestPackingEfficiency:
    def test_even_corpus_fills_exactly(self, spark):
        df = spark.createDataFrame(
            [(i, " ".join(["w"] * 10)) for i in range(100)],
            "doc_id long, text string",
        )
        out = sorted(
            corpus.packing_efficiency(df, budget=250).collect(),
            key=lambda r: r["shard_id"],
        )
        assert [r["shard_id"] for r in out] == [0, 1, 2, 3]
        for r in out:
            assert r["n_docs"] == 25
            assert r["n_tokens"] == 250
            assert r["fill_micro"] == 1_000_000
            assert r["overflow_tokens"] == 0
        assert [r["is_last"] for r in out] == [False, False, False, True]

    def test_overflow_and_underfull_tail(self, spark):
        # 3 docs of 7 tokens, budget 10: doc0+doc1 start in shard 0
        # (cum-before 0 and 7), doc2 starts at 14 -> shard 1
        df = spark.createDataFrame(
            [(i, " ".join(["w"] * 7)) for i in range(3)],
            "doc_id long, text string",
        )
        out = {r["shard_id"]: r
               for r in corpus.packing_efficiency(df, budget=10).collect()}
        assert out[0]["n_tokens"] == 14 and out[0]["overflow_tokens"] == 4
        assert out[0]["fill_micro"] == 1_400_000
        assert out[1]["n_tokens"] == 7 and out[1]["overflow_tokens"] == -3
        assert out[1]["is_last"] is True

    def test_validation(self, spark):
        df = spark.createDataFrame([], "doc_id long, text string")
        with pytest.raises(ValueError, match="budget"):
            corpus.packing_efficiency(df, budget=0)


class TestNoveltyCurve:
    SCHEMA = "doc_id long, text string"

    def test_first_owner_wins(self, spark):
        from ilogtail_spark.dataops import corpus
        rows = [
            (1, "a b c d"),          # shingles: abc, bcd -> both novel
            (2, "a b c x"),          # abc seen, bcx novel
            (3, "a b c d"),          # all seen
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = {r["doc_id"]: r for r in corpus.novelty_curve(df).collect()}
        assert (out[1]["n_shingles"], out[1]["n_novel"]) == (2, 2)
        assert out[1]["novelty_micro"] == 1_000_000
        assert (out[2]["n_shingles"], out[2]["n_novel"]) == (2, 1)
        assert out[2]["novelty_micro"] == 500_000
        assert (out[3]["n_novel"], out[3]["n_seen_before"]) == (0, 2)

    def test_short_docs_emit_no_row(self, spark):
        from ilogtail_spark.dataops import corpus
        df = spark.createDataFrame([(1, "a b"), (2, None)], self.SCHEMA)
        assert corpus.novelty_curve(df).count() == 0

    def test_within_doc_repeats_count_once(self, spark):
        from ilogtail_spark.dataops import corpus
        df = spark.createDataFrame([(1, "a b c a b c a b c")], self.SCHEMA)
        r = corpus.novelty_curve(df).collect()[0]
        # distinct shingles of the 9-token text: abc, bca, cab
        assert r["n_shingles"] == 3
        assert r["n_novel"] == 3

    def test_validation(self, spark):
        from ilogtail_spark.dataops import corpus
        df = spark.createDataFrame([], self.SCHEMA)
        with pytest.raises(ValueError, match="missing"):
            corpus.novelty_curve(df, text_col="nope")
        with pytest.raises(ValueError, match="shingle_n"):
            corpus.novelty_curve(df, shingle_n=0)

    def test_parallelism_invariant(self, spark):
        from ilogtail_spark.dataops import corpus
        rows = [(i, "w%d w%d w%d w%d" % (i % 7, (i + 1) % 7, (i + 2) % 7,
                                         (i + 3) % 7))
                for i in range(40)]
        df = spark.createDataFrame(rows, self.SCHEMA)
        one = sorted(map(tuple, corpus.novelty_curve(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, corpus.novelty_curve(
            df.repartition(7)).collect()))
        assert one == par


class TestLicenseScan:
    SCHEMA = "doc_id long, text string, source string"

    def test_classes_and_any_flag(self, spark):
        from ilogtail_spark.dataops import corpus
        rows = [
            (1, "plain text", "s"),
            (2, "Copyright 2020 Acme. All rights reserved.", "s"),
            (3, "released under the GNU General Public License", "s"),
            (4, "this is CONFIDENTIAL and proprietary", "s"),
            (5, "dual: Creative Commons AND copyright notice", "s"),
            (6, None, "s"),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        r = corpus.license_scan(df).collect()[0]
        assert r["n_docs"] == 6
        assert r["copyright_docs"] == 2      # docs 2 and 5
        assert r["cc_docs"] == 1
        assert r["gpl_docs"] == 1
        assert r["confidential_docs"] == 1
        assert r["flagged_docs"] == 4        # doc 5 counts once
        assert r["flagged_micro"] == 666_666

    def test_gpl_word_boundary(self, spark):
        from ilogtail_spark.dataops import corpus
        df = spark.createDataFrame(
            [(1, "the gplv3 acronym alone", "s"),
             (2, "licensed as GPL today", "s")], self.SCHEMA)
        r = corpus.license_scan(df).collect()[0]
        assert r["gpl_docs"] == 1            # \bgpl\b: doc 2 only

    def test_validation(self, spark):
        from ilogtail_spark.dataops import corpus
        df = spark.createDataFrame([], self.SCHEMA)
        with pytest.raises(ValueError, match="missing"):
            corpus.license_scan(df, source_col="nope")
        with pytest.raises(ValueError, match="at least one"):
            corpus.license_scan(df, classes=[])

    def test_parallelism_invariant(self, spark):
        from ilogtail_spark.dataops import corpus
        rows = [(i, "copyright x" if i % 3 == 0 else "plain",
                 "s%d" % (i % 4)) for i in range(40)]
        df = spark.createDataFrame(rows, self.SCHEMA)
        one = sorted(map(tuple, corpus.license_scan(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, corpus.license_scan(
            df.repartition(7)).collect()))
        assert one == par


class TestSourceOverlap:
    SCHEMA = "source string, text string"

    def test_jaccard_and_min_df(self, spark):
        from ilogtail_spark.dataops import corpus as _c
        rows = [
            ("a", "red blue green"), ("a", "red blue"),
            ("b", "red blue yellow"), ("b", "red blue yellow"),
            ("c", "purple"),  ("c", "purple"),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = {(r["source_a"], r["source_b"]): r
               for r in _c.source_overlap(df, min_df=2).collect()}
        ab = out[("a", "b")]
        # min_df=2 vocab: a={red,blue}, b={red,blue,yellow}, c={purple}
        assert (ab["vocab_a"], ab["vocab_b"], ab["n_shared"]) == (2, 3, 2)
        assert ab["jaccard_micro"] == 2 * 1_000_000 // 3
        assert ("a", "c") not in out  # disjoint pair emits no row

    def test_duplicate_tokens_in_doc_count_once(self, spark):
        from ilogtail_spark.dataops import corpus as _c
        rows = [("a", "x x x"), ("b", "x")]
        out = _c.source_overlap(
            spark.createDataFrame(rows, self.SCHEMA), min_df=1).collect()
        assert len(out) == 1 and out[0]["n_shared"] == 1
        assert out[0]["jaccard_micro"] == 1_000_000

    def test_validates(self, spark):
        from ilogtail_spark.dataops import corpus as _c
        import pytest as _pt
        df = spark.createDataFrame([("a", "x")], self.SCHEMA)
        with _pt.raises(ValueError, match="min_df"):
            _c.source_overlap(df, min_df=0)
        with _pt.raises(ValueError, match="missing columns"):
            _c.source_overlap(df, source_col="nope")


class TestVocabGrowth:
    SCHEMA = "doc_id long, text string"

    def test_curve_and_prefix_math(self, spark):
        from ilogtail_spark.dataops import corpus as _c
        rows = [(1, "a b"), (2, "a c"), (3, "a b"), (4, "d")]
        out = {r["step"]: r for r in _c.vocab_growth(
            spark.createDataFrame(rows, self.SCHEMA), n_steps=2).collect()}
        # step 1 = first 2 docs: tokens {a,b,c} all first seen there
        one = out[1]
        assert one["n_docs_prefix"] == 2
        assert one["new_tokens"] == 3 and one["vocab_size"] == 3
        # step 2 = all 4 docs: only 'd' is new
        two = out[2]
        assert two["n_docs_prefix"] == 4
        assert two["new_tokens"] == 1 and two["vocab_size"] == 4

    def test_non_divisible_checkpoint_mapping(self, spark):
        # 3 docs over 2 steps: prefix(1) = ceil(3/2) = 2 docs, so a
        # token first seen in doc 2 belongs to step 1 (the regime
        # where ceil(rank*steps/n) would mis-assign it to step 2)
        from ilogtail_spark.dataops import corpus as _c
        rows = [(1, "a"), (2, "b"), (3, "a")]
        out = {r["step"]: r for r in _c.vocab_growth(
            spark.createDataFrame(rows, self.SCHEMA), n_steps=2).collect()}
        assert out[1]["n_docs_prefix"] == 2
        assert out[1]["new_tokens"] == 2 and out[1]["vocab_size"] == 2
        assert out[2]["new_tokens"] == 0 and out[2]["vocab_size"] == 2

    def test_empty_steps_zero_and_validates(self, spark):
        from ilogtail_spark.dataops import corpus as _c
        import pytest as _pt
        rows = [(1, "x"), (2, "x"), (3, "x")]
        out = {r["step"]: r for r in _c.vocab_growth(
            spark.createDataFrame(rows, self.SCHEMA), n_steps=3).collect()}
        assert out[1]["vocab_size"] == 1
        assert out[2]["new_tokens"] == 0 and out[3]["vocab_size"] == 1
        # ceil prefix math: 3 docs over 3 steps -> 1, 2, 3
        assert [out[s]["n_docs_prefix"] for s in (1, 2, 3)] == [1, 2, 3]
        with _pt.raises(ValueError, match="n_steps"):
            _c.vocab_growth(
                spark.createDataFrame(rows, self.SCHEMA), n_steps=1)
        with _pt.raises(ValueError, match="no usable"):
            _c.vocab_growth(
                spark.createDataFrame([], self.SCHEMA), n_steps=2)
