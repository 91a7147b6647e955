"""conversation_integrity / sft_pairs unit tests (transcripts-shape
structural operators)."""

from __future__ import annotations

import pytest

from ilogtail_spark.dataops import conversations

SCHEMA = "conv_id string, turn_idx int, role string, text string"


class TestConversationIntegrity:
    def test_defect_counts(self, spark):
        rows = [
            # c1: clean 4-turn conversation (tool after assistant)
            ("c1", 0, "user", "q"),
            ("c1", 1, "assistant", "a"),
            ("c1", 2, "tool", "t"),
            ("c1", 3, "assistant", "a2"),
            # c2: dup idx 1, gap at 2 (jumps to 3), user-user repeat,
            #     orphan tool at 0 (no preceding assistant)
            ("c2", 0, "tool", "t"),
            ("c2", 1, "user", "q"),
            ("c2", 1, "user", "q2"),
            ("c2", 3, "assistant", "a"),
            # c3: starts at 5 — otherwise clean
            ("c3", 5, "user", "q"),
            ("c3", 6, "assistant", "a"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {
            r["conv_id"]: r.asDict()
            for r in conversations.conversation_integrity(df).collect()
        }
        c1 = out["c1"]
        assert (c1["n_dup_idx"], c1["n_gap_idx"], c1["n_role_repeats"],
                c1["n_orphan_tool"]) == (0, 0, 0, 0)
        assert c1["is_clean"] is True
        c2 = out["c2"]
        assert c2["n_turns"] == 4
        assert c2["n_dup_idx"] == 1          # two rows at idx 1
        assert c2["n_gap_idx"] == 1          # idx 2 missing in [0, 3]
        assert c2["n_role_repeats"] == 1     # user followed by user
        assert c2["n_orphan_tool"] == 1      # tool at idx 0
        assert c2["is_clean"] is False
        c3 = out["c3"]
        assert (c3["n_dup_idx"], c3["n_gap_idx"]) == (0, 0)
        assert c3["min_idx"] == 5
        assert c3["is_clean"] is False       # doesn't start at 0

    def test_tie_order_deterministic(self, spark):
        # equal (idx, role) rows: lag sequence must not depend on
        # physical order — same counts at different parallelism
        rows = [("c", 0, "user", "a"), ("c", 0, "user", "b"),
                ("c", 1, "assistant", "x")]
        df = spark.createDataFrame(rows, SCHEMA)
        one = conversations.conversation_integrity(
            df.coalesce(1)).collect()[0]
        par = conversations.conversation_integrity(
            df.repartition(4)).collect()[0]
        assert one.asDict() == par.asDict()
        assert one["n_dup_idx"] == 1 and one["n_role_repeats"] == 1

    def test_missing_column_raises(self, spark):
        df = spark.createDataFrame([("c", 0)], "conv_id string, turn_idx int")
        with pytest.raises(ValueError, match="missing columns"):
            conversations.conversation_integrity(df)


class TestSftPairs:
    def test_adjacent_pairs_only(self, spark):
        rows = [
            ("c1", 0, "user", "q1"),
            ("c1", 1, "assistant", "a1"),     # pair (0, 1)
            ("c1", 2, "user", "q2"),
            ("c1", 3, "tool", "t"),           # user -> tool: no pair
            ("c1", 4, "assistant", "a2"),
            # c2: user at 0, assistant at 2 (gap) — adjacent_only drops it
            ("c2", 0, "user", "q"),
            ("c2", 2, "assistant", "a"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = conversations.sft_pairs(df).collect()
        assert [(r["conv_id"], r["prompt_idx"], r["response_idx"])
                for r in out] == [("c1", 0, 1)]
        assert out[0]["prompt_chars"] == 2 and out[0]["response_chars"] == 2
        # md5 of the actual text, computed scan-side
        import hashlib
        assert out[0]["prompt_md5"] == hashlib.md5(b"q1").hexdigest()

        loose = conversations.sft_pairs(df, adjacent_only=False).collect()
        assert [(r["conv_id"], r["prompt_idx"], r["response_idx"])
                for r in loose] == [("c1", 0, 1), ("c2", 0, 2)]

    def test_null_text_pair_survives_with_null_digest(self, spark):
        rows = [("c", 0, "user", None), ("c", 1, "assistant", "a")]
        df = spark.createDataFrame(rows, SCHEMA)
        out = conversations.sft_pairs(df).collect()
        assert len(out) == 1
        assert out[0]["prompt_md5"] is None
        assert out[0]["prompt_chars"] is None

    def test_text_never_in_output(self, spark):
        df = spark.createDataFrame([("c", 0, "user", "q")], SCHEMA)
        cols = conversations.sft_pairs(df).columns
        assert "text" not in cols


class TestReviewRegressions:
    def test_single_turn_conversation_is_clean_zero_repeats(self, spark):
        # lag(role) is NULL on the only turn: repeats must be 0, not NULL
        df = spark.createDataFrame([("solo", 0, "user", "hi")], SCHEMA)
        r = conversations.conversation_integrity(df).collect()[0]
        assert r["n_role_repeats"] == 0
        assert r["is_clean"] is True

    def test_all_null_idx_gap_is_zero_not_null(self, spark):
        df = spark.createDataFrame(
            [("c", None, "user", "a"), ("c", None, "assistant", "b")], SCHEMA
        )
        r = conversations.conversation_integrity(df).collect()[0]
        assert r["n_gap_idx"] == 0          # not NULL
        assert r["n_dup_idx"] == 2          # corruption counted here
        assert r["min_idx"] is None
        assert r["is_clean"] is False

    def test_dup_idx_pair_digest_deterministic(self, spark):
        # two user turns tied at (idx, role) with different text: the
        # emitted prompt digest must not depend on physical row order
        a = [("c", 0, "user", "AAAA"), ("c", 0, "user", "BBBB"),
             ("c", 1, "assistant", "x")]
        da = spark.createDataFrame(a, SCHEMA)
        db = spark.createDataFrame(list(reversed(a)), SCHEMA)
        ra = [r.asDict() for r in conversations.sft_pairs(da).collect()]
        rb = [r.asDict() for r in conversations.sft_pairs(db).collect()]
        assert ra == rb


class TestConversationDedup:
    def test_exact_clone_collapses_offset_indices_do_not_matter(self, spark):
        rows = [
            ("a", 0, "user", "q"), ("a", 1, "assistant", "r"),
            # b = exact clone of a with renumbered indices (idx offset)
            ("b", 5, "user", "q"), ("b", 6, "assistant", "r"),
            # c differs in one turn's text
            ("c", 0, "user", "q"), ("c", 1, "assistant", "DIFFERENT"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {r["conv_id"]: r.asDict()
               for r in conversations.conversation_dedup(df).collect()}
        assert out["a"]["conv_md5"] == out["b"]["conv_md5"]
        assert out["a"]["dup_count"] == 2 and out["b"]["dup_count"] == 2
        assert out["a"]["keep"] is True and out["b"]["keep"] is False
        assert out["c"]["dup_count"] == 1 and out["c"]["keep"] is True
        assert out["c"]["conv_md5"] != out["a"]["conv_md5"]

    def test_order_matters_and_null_text_is_stable(self, spark):
        rows = [
            ("a", 0, "user", "x"), ("a", 1, "assistant", "y"),
            ("b", 0, "user", "y"), ("b", 1, "assistant", "x"),  # swapped
            ("n1", 0, "user", None), ("n2", 0, "user", None),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {r["conv_id"]: r.asDict()
               for r in conversations.conversation_dedup(df).collect()}
        assert out["a"]["conv_md5"] != out["b"]["conv_md5"]
        # NULL-text conversations still get a digest and collapse
        assert out["n1"]["conv_md5"] == out["n2"]["conv_md5"]
        assert out["n1"]["keep"] is True and out["n2"]["keep"] is False

    def test_parallelism_invariant(self, spark):
        rows = [("c%d" % (i % 3), i // 3, "user", "t%d" % (i % 6))
                for i in range(12)]
        df = spark.createDataFrame(rows, SCHEMA)
        one = sorted(map(tuple, conversations.conversation_dedup(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, conversations.conversation_dedup(
            df.repartition(7)).collect()))
        assert one == par


class TestConversationShinglePairs:
    def _mk(self, spark, edit_turn=None):
        base = [("a", i, "user" if i % 2 == 0 else "assistant", "t%d" % i)
                for i in range(8)]
        clone = [("b", i, r, ("REGEN" if i == edit_turn else t))
                 for (_, i, r, t) in base]
        other = [("z", i, "user", "zzz%d" % i) for i in range(8)]
        return spark.createDataFrame(base + clone + other, SCHEMA)

    def test_edited_clone_pairs_unrelated_does_not(self, spark):
        df = self._mk(spark, edit_turn=0)
        out = conversations.conversation_shingle_pairs(
            df, threshold=0.5).collect()
        assert [(r["a"], r["b"]) for r in out] == [("a", "b")]
        # 8 turns, k=3 -> 6 windows each; editing turn 0 kills 1 window
        # on each side: inter=5, union=7 -> 5/7
        assert abs(out[0]["jaccard"] - 5 / 7) < 1e-6   # round(…, 6) output

    def test_exact_clone_jaccard_one(self, spark):
        df = self._mk(spark, edit_turn=None)
        out = conversations.conversation_shingle_pairs(
            df, threshold=0.99).collect()
        assert len(out) == 1 and out[0]["jaccard"] == 1.0

    def test_short_conversations_never_pair(self, spark):
        rows = [("a", 0, "user", "x"), ("a", 1, "assistant", "y"),
                ("b", 0, "user", "x"), ("b", 1, "assistant", "y")]
        df = spark.createDataFrame(rows, SCHEMA)
        assert conversations.conversation_shingle_pairs(
            df, shingle_k=3, threshold=0.0).count() == 0

    def test_max_df_caps_boilerplate_shingle(self, spark):
        # every conversation shares one identical 3-turn prefix: with
        # max_df=2 that hot shingle is dropped, so the unrelated tails
        # produce no pairs
        rows = []
        for c in ("a", "b", "c"):
            rows += [(c, 0, "system", "S"), (c, 1, "user", "U"),
                     (c, 2, "assistant", "A"),
                     (c, 3, "user", "tail-" + c)]
        df = spark.createDataFrame(rows, SCHEMA)
        dense = conversations.conversation_shingle_pairs(
            df, threshold=0.01).count()
        capped = conversations.conversation_shingle_pairs(
            df, threshold=0.01, max_df=2).count()
        assert dense > 0 and capped == 0


class TestTrimToContext:
    def test_keeps_suffix_that_fits(self, spark):
        # token counts per turn: 2, 2, 2, 2 -> budget 5 keeps last 2
        rows = [("c", i, "user", "w w") for i in range(4)]
        df = spark.createDataFrame(rows, SCHEMA)
        out = conversations.trim_to_context(df, max_tokens=5).collect()
        assert sorted(r["turn_idx"] for r in out) == [2, 3]
        assert all(r["n_tokens"] == 2 for r in out)

    def test_overlong_final_turn_emits_nothing(self, spark):
        rows = [("c", 0, "user", "a b c d e f")]
        df = spark.createDataFrame(rows, SCHEMA)
        assert conversations.trim_to_context(df, max_tokens=3).count() == 0

    def test_exact_budget_boundary_inclusive(self, spark):
        rows = [("c", 0, "user", "a b"), ("c", 1, "assistant", "x y z")]
        df = spark.createDataFrame(rows, SCHEMA)
        out = conversations.trim_to_context(df, max_tokens=5).collect()
        assert sorted(r["turn_idx"] for r in out) == [0, 1]

    def test_bad_budget_raises(self, spark):
        df = spark.createDataFrame([("c", 0, "user", "x")], SCHEMA)
        with pytest.raises(ValueError, match="max_tokens"):
            conversations.trim_to_context(df, max_tokens=0)

    def test_null_text_counts_zero_tokens(self, spark):
        rows = [("c", 0, "user", "a b c"), ("c", 1, "assistant", None)]
        df = spark.createDataFrame(rows, SCHEMA)
        out = conversations.trim_to_context(df, max_tokens=3).collect()
        assert sorted(r["turn_idx"] for r in out) == [0, 1]
        assert {r["turn_idx"]: r["n_tokens"] for r in out}[1] == 0


class TestRoleStats:
    def test_counts_and_exact_micro_mean(self, spark):
        rows = [
            ("c1", 0, "user", "a b"),          # 2 tokens, 3 chars
            ("c1", 1, "assistant", "xyz"),     # 1 token, 3 chars
            ("c2", 0, "user", "hello"),        # 1 token, 5 chars
            ("c2", 1, None, None),             # NULL role -> '', 0 chars
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {r["role"]: r.asDict()
               for r in conversations.role_stats(df).collect()}
        u = out["user"]
        assert (u["n_turns"], u["n_convs"], u["tokens_total"],
                u["chars_total"]) == (2, 2, 3, 8)
        assert u["avg_turn_chars_micro"] == 8 * 1_000_000 // 2
        assert out[""]["n_turns"] == 1 and out[""]["chars_total"] == 0
        assert out["assistant"]["avg_turn_chars_micro"] == 3_000_000


class TestPackConversations:
    def test_conversation_atomic_assignment(self, spark):
        # conv token totals in conv_id order: a=4, b=4, c=4; budget 6:
        # cums 4, 8, 12 -> starts 0, 4, 8 -> shards 0, 0, 1
        rows = []
        for c in ("a", "b", "c"):
            rows += [(c, 0, "user", "w w"), (c, 1, "assistant", "w w")]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {r["conv_id"]: r.asDict()
               for r in conversations.pack_conversations(df, budget=6).collect()}
        assert all(out[c]["n_tokens"] == 4 for c in "abc")
        assert (out["a"]["shard_id"], out["b"]["shard_id"],
                out["c"]["shard_id"]) == (0, 0, 1)

    def test_partitioning_invariant(self, spark):
        rows = [("c%02d" % i, j, "user", "w " * (i % 5 + 1))
                for i in range(20) for j in range(3)]
        df = spark.createDataFrame(rows, SCHEMA)
        one = sorted(map(tuple, conversations.pack_conversations(
            df.coalesce(1), budget=25, num_partitions=1).collect()))
        par = sorted(map(tuple, conversations.pack_conversations(
            df.repartition(9), budget=25, num_partitions=7).collect()))
        assert one == par

    def test_bad_budget_raises(self, spark):
        df = spark.createDataFrame([("c", 0, "user", "x")], SCHEMA)
        with pytest.raises(ValueError, match="budget"):
            conversations.pack_conversations(df, budget=0)

    def test_null_idx_order_engine_stable(self, spark):
        # NULL turn_idx coalesces to -1 in the running-sum order (the
        # _ordered_turn_seq sentinel): the NULL turn is the OLDEST, so
        # with budget 2 only the idx-1 turn survives
        rows = [("c", None, "user", "a"), ("c", 1, "assistant", "b c")]
        df = spark.createDataFrame(rows, SCHEMA)
        out = conversations.trim_to_context(df, max_tokens=2).collect()
        assert [(r["turn_idx"], r["n_tokens"]) for r in out] == [(1, 2)]


class TestConversationQualityGate:
    GOOD = ("the quick brown fox jumps over the lazy dog and it was very "
            "good to see the result of this long sentence here")

    def test_gate_semantics(self, spark):
        rows = [
            # k1: 2 turns, good assistant text -> keep
            ("k1", 0, "user", "hi"),
            ("k1", 1, "assistant", self.GOOD),
            # d1: assistant text is degenerate symbols -> drop
            ("d1", 0, "user", "hi"),
            ("d1", 1, "assistant", "!!!! ???? ####"),
            # d2: single turn -> drop (min_turns)
            ("d2", 0, "assistant", self.GOOD),
            # d3: no assistant turn -> drop, NULL average
            ("d3", 0, "user", "hi"),
            ("d3", 1, "tool", self.GOOD),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {r["conv_id"]: r.asDict()
               for r in conversations.conversation_quality_gate(
                   df, min_avg_assistant_quality_micro=400_000).collect()}
        assert out["k1"]["keep"] is True
        assert out["d1"]["keep"] is False
        assert out["d2"]["keep"] is False and out["d2"]["n_turns"] == 1
        assert out["d3"]["keep"] is False
        assert out["d3"]["avg_assistant_quality_micro"] is None
        assert out["d3"]["n_assistant"] == 0

    def test_exact_integer_mean(self, spark):
        # two assistant turns with different scores: mean must be the
        # exact floor(sum/2), not a float round
        rows = [("c", 0, "assistant", self.GOOD),
                ("c", 1, "assistant", "x")]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.conversation_quality_gate(df).collect()[0]
        from ilogtail_spark.dataops.textstats import quality_score
        scores = [
            x["quality_score_micro"]
            for x in quality_score(
                df.selectExpr("text", "turn_idx as doc_id"), id_col="doc_id"
            ).collect()
        ]
        assert r["avg_assistant_quality_micro"] == sum(scores) // 2

    def test_null_text_scores_as_empty(self, spark):
        rows = [("c", 0, "user", "q"), ("c", 1, "assistant", None)]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.conversation_quality_gate(df).collect()[0]
        # empty string: len 0 (no len part), punct 0 <= 200k -> 250000
        assert r["avg_assistant_quality_micro"] == 250_000
        assert r["keep"] is False

    def test_min_turns_validation(self, spark):
        df = spark.createDataFrame([("c", 0, "user", "x")], SCHEMA)
        with pytest.raises(ValueError, match="min_turns"):
            conversations.conversation_quality_gate(df, min_turns=0)


class TestRepeatedTurnStats:
    def test_counts_and_runs(self, spark):
        rows = [
            # c1: identical assistant turn repeated 3x -> 2 repeat
            # pairs, max_run 3
            ("c1", 0, "user", "q"),
            ("c1", 1, "assistant", "same"),
            ("c1", 2, "assistant", "same"),
            ("c1", 3, "assistant", "same"),
            ("c1", 4, "user", "q2"),
            # c2: same role adjacent but DIFFERENT text -> no repeat
            ("c2", 0, "user", "a"), ("c2", 1, "user", "b"),
            # c3: same text adjacent but different role -> no repeat
            ("c3", 0, "user", "x"), ("c3", 1, "assistant", "x"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {r["conv_id"]: r.asDict()
               for r in conversations.repeated_turn_stats(df).collect()}
        assert out["c1"]["n_repeat_pairs"] == 2
        assert out["c1"]["max_run"] == 3
        assert out["c1"]["has_repeats"] is True and out["c1"]["n_turns"] == 5
        for c in ("c2", "c3"):
            assert out[c]["n_repeat_pairs"] == 0
            assert out[c]["max_run"] == 1
            assert out[c]["has_repeats"] is False

    def test_parallelism_invariant(self, spark):
        rows = [("c", i, "user", "t%d" % (i % 2)) for i in range(10)]
        rows += [("c", 5, "user", "t1")]  # duplicated (idx, role, text)
        df = spark.createDataFrame(rows, SCHEMA)
        one = sorted(map(tuple, conversations.repeated_turn_stats(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, conversations.repeated_turn_stats(
            df.repartition(5)).collect()))
        assert one == par

    def test_null_text_repeats_detected(self, spark):
        rows = [("c", 0, "user", None), ("c", 1, "user", None)]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.repeated_turn_stats(df).collect()[0]
        assert r["n_repeat_pairs"] == 1 and r["max_run"] == 2


class TestConversationPiiReport:
    def test_type_counts_and_user_attribution(self, spark):
        rows = [
            ("c1", 0, "user", "mail me at a.b@example.com"),
            ("c1", 1, "assistant", "sure, noted a.b@example.com"),
            ("c1", 2, "user", "also call 555-123-4567"),
            ("c2", 0, "user", "nothing here"),
            ("c2", 1, "assistant", "host is 10.0.0.1 ssn 123-45-6789"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {r["conv_id"]: r.asDict()
               for r in conversations.conversation_pii_report(df).collect()}
        c1 = out["c1"]
        assert (c1["n_emails"], c1["n_phones"]) == (2, 1)
        assert c1["n_pii_turns"] == 3 and c1["n_pii_user_turns"] == 2
        assert c1["has_pii"] is True
        c2 = out["c2"]
        assert (c2["n_ssns"], c2["n_ips"]) == (1, 1)
        assert c2["n_pii_turns"] == 1 and c2["n_pii_user_turns"] == 0
        assert c2["has_pii"] is True

    def test_clean_conversation_and_null_text(self, spark):
        rows = [("c", 0, "user", "hello"), ("c", 1, "assistant", None)]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.conversation_pii_report(df).collect()[0]
        assert r["has_pii"] is False
        assert (r["n_emails"], r["n_phones"], r["n_ssns"], r["n_ips"],
                r["n_pii_turns"]) == (0, 0, 0, 0, 0)


class TestResponseLatency:
    def _t(self, spark, rows):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        data = [
            (c, i, r, base + dt.timedelta(seconds=s))
            for (c, i, r, s) in rows
        ]
        return spark.createDataFrame(
            data, "conv_id bigint, turn_idx bigint, role string, ts timestamp"
        )

    def test_latency_against_most_recent_user_turn(self, spark):
        df = self._t(spark, [
            (1, 0, "system", 0),
            (1, 1, "user", 10),
            (1, 2, "assistant", 13),     # 3s after turn 1
            (1, 3, "user", 20),
            (1, 4, "tool", 24),
            (1, 5, "assistant", 27),     # 7s after turn 3 (tool skipped)
        ])
        [r] = conversations.response_latency(df).collect()
        assert (r["n_turns"], r["n_responses"]) == (6, 2)
        assert r["avg_latency_us"] == 5_000_000
        assert r["max_latency_us"] == 7_000_000

    def test_opener_and_empty_conversations(self, spark):
        df = self._t(spark, [
            (1, 0, "assistant", 5),   # no prior user turn: no latency
            (1, 1, "user", 10),
            (2, 0, "user", 0),        # never answered
        ])
        out = {r["conv_id"]: r for r in
               conversations.response_latency(df).collect()}
        assert out[1]["n_responses"] == 0
        assert out[1]["avg_latency_us"] is None
        assert out[1]["max_latency_us"] is None
        assert out[2]["n_turns"] == 1 and out[2]["n_responses"] == 0

    def test_negative_latency_reported_not_clamped(self, spark):
        # clock-skewed transcript: assistant ts precedes the user's
        df = self._t(spark, [
            (1, 0, "user", 100),
            (1, 1, "assistant", 97),
        ])
        [r] = conversations.response_latency(df).collect()
        assert r["avg_latency_us"] == -3_000_000

    def test_missing_column_raises(self, spark):
        df = spark.createDataFrame([(1,)], "conv_id bigint")
        with pytest.raises(ValueError, match="response_latency"):
            conversations.response_latency(df)


class TestLanguageMix:
    def test_majority_minority_and_tiebreak(self, spark):
        en = "the and is of to this"
        de = "der und ist nicht von zu"
        rows = (
            [(1, en), (1, en), (1, de)]      # en majority, mixed
            + [(2, "{} 42")]                  # unknown only
            + [(3, en), (3, de)]              # 1-1 tie -> 'de' (asc)
        )
        df = spark.createDataFrame(rows, "conv_id bigint, text string")
        out = {r["conv_id"]: r for r in
               conversations.language_mix(df).collect()}
        assert out[1]["majority_lang"] == "en"
        assert out[1]["majority_share_micro"] == 666_666
        assert out[1]["is_mixed"] is True and out[1]["n_langs"] == 2
        assert out[2]["majority_lang"] == "unknown"
        assert out[2]["is_mixed"] is False
        assert out[2]["majority_share_micro"] == 1_000_000
        # count tie breaks by language ascending, deterministically
        assert out[3]["majority_lang"] == "de"
        assert out[3]["majority_share_micro"] == 500_000

    def test_missing_column_raises(self, spark):
        df = spark.createDataFrame([(1,)], "conv_id bigint")
        with pytest.raises(ValueError, match="language_mix"):
            conversations.language_mix(df)


class TestRefusalStats:
    def test_counts_rate_and_role_gate(self, spark):
        rows = [
            (1, "user", "please do X"),
            (1, "assistant", "Sure, here is X"),
            (1, "assistant", "I cannot help with that"),
            (1, "assistant", "I'm unable to continue"),
            # refusal phrasing on a USER turn must not count
            (2, "user", "i cannot believe this"),
            (2, "assistant", "ok"),
            (3, "user", "no assistant here"),
        ]
        df = spark.createDataFrame(
            rows, "conv_id bigint, role string, text string"
        )
        out = {r["conv_id"]: r for r in
               conversations.refusal_stats(df).collect()}
        assert out[1]["n_assistant"] == 3 and out[1]["n_refusals"] == 2
        assert out[1]["refusal_rate_micro"] == 666_666
        assert out[1]["has_refusal"] is True
        assert out[2]["n_refusals"] == 0 and out[2]["has_refusal"] is False
        # zero assistant turns: rate is NULL (0/0), not 0
        assert out[3]["n_assistant"] == 0
        assert out[3]["refusal_rate_micro"] is None

    def test_curly_apostrophe_matches(self, spark):
        df = spark.createDataFrame(
            [(1, "assistant", "I can’t do that")],
            "conv_id bigint, role string, text string",
        )
        [r] = conversations.refusal_stats(df).collect()
        assert r["n_refusals"] == 1

    def test_null_role_counts_zero_not_null(self, spark):
        df = spark.createDataFrame(
            [(1, None, "I cannot help with that")],
            "conv_id bigint, role string, text string",
        )
        [r] = conversations.refusal_stats(df).collect()
        assert r["n_assistant"] == 0 and r["n_refusals"] == 0
        assert r["has_refusal"] is False


class TestToolStats:
    def test_counts_shares_and_means(self, spark):
        rows = [
            (1, "search"), (1, "search"), (1, "code"),
            (2, "search"), (2, None), (3, None),
        ]
        df = spark.createDataFrame(rows, "conv_id bigint, tool string")
        out = {r["tool"]: r for r in
               conversations.tool_stats(df).collect()}
        assert set(out) == {"search", "code"}
        assert out["search"]["n_calls"] == 3
        assert out["search"]["n_convs"] == 2
        assert out["search"]["share_micro"] == 750_000
        assert out["search"]["calls_per_conv_micro"] == 1_500_000
        assert out["code"]["n_calls"] == 1 and out["code"]["n_convs"] == 1

    def test_missing_column_raises(self, spark):
        df = spark.createDataFrame([(1,)], "conv_id bigint")
        with pytest.raises(ValueError, match="tool_stats"):
            conversations.tool_stats(df)


class TestConversationPrep:
    GOOD = ("the quick brown fox jumps over the lazy dog and then some "
            "more of this and that is for with was this good answer")

    def test_each_gate_attributes_its_drop(self, spark):
        rows = [
            # conv 1: clean — passes everything
            (1, 0, "user", "please help with the thing"),
            (1, 1, "assistant", self.GOOD),
            # conv 2: exact content clone of conv 1 -> dedup drop only
            (2, 0, "user", "please help with the thing"),
            (2, 1, "assistant", self.GOOD),
            # conv 3: refusal on the assistant turn
            (3, 0, "user", "please help with the thing"),
            (3, 1, "assistant", self.GOOD + " but I cannot help with that"),
            # conv 4: PII in a user turn
            (4, 0, "user", "my ssn is 123-45-6789 please help"),
            (4, 1, "assistant", self.GOOD),
            # conv 5: single turn -> quality gate (min_turns)
            (5, 0, "assistant", self.GOOD),
        ]
        df = spark.createDataFrame(
            rows, "conv_id bigint, turn_idx bigint, role string, text string"
        )
        out = {r["conv_id"]: r for r in
               conversations.conversation_prep(df).collect()}
        assert out[1]["keep"] is True
        assert out[2]["keep_dedup"] is False and out[2]["keep"] is False
        assert out[2]["keep_quality"] is True  # drop attributed to dedup
        assert out[3]["has_refusal"] is True and out[3]["keep"] is False
        assert out[4]["has_pii"] is True and out[4]["keep"] is False
        assert out[5]["keep_quality"] is False and out[5]["keep"] is False

    def test_renumbered_clone_still_dedups(self, spark):
        rows = [
            (1, 0, "user", "aaa"), (1, 1, "assistant", "bbb"),
            # same content, shifted turn indices
            (2, 10, "user", "aaa"), (2, 11, "assistant", "bbb"),
        ]
        df = spark.createDataFrame(
            rows, "conv_id bigint, turn_idx bigint, role string, text string"
        )
        out = {r["conv_id"]: r["keep_dedup"] for r in
               conversations.conversation_prep(df).collect()}
        assert out == {1: True, 2: False}

    def test_bad_min_turns(self, spark):
        df = spark.createDataFrame(
            [(1, 0, "user", "x")],
            "conv_id bigint, turn_idx bigint, role string, text string",
        )
        with pytest.raises(ValueError, match="min_turns"):
            conversations.conversation_prep(df, min_turns=0)


class TestResponseLatencyTurns:
    def _t(self, spark, rows):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        data = [
            (c, i, r, base + dt.timedelta(seconds=s), tool)
            for (c, i, r, s, tool) in rows
        ]
        return spark.createDataFrame(
            data,
            "conv_id bigint, turn_idx bigint, role string,"
            " ts timestamp, tool string",
        )

    def test_per_turn_rows_match_aggregate_semantics(self, spark):
        df = self._t(spark, [
            (1, 0, "system", 0, None),
            (1, 1, "user", 10, None),
            (1, 2, "assistant", 13, "search"),   # 3s
            (1, 3, "user", 20, None),
            (1, 4, "tool", 24, None),
            (1, 5, "assistant", 27, "code"),     # 7s, tool turn skipped
            (2, 0, "assistant", 5, "search"),    # opener: no row
        ])
        rows = conversations.response_latency_turns(
            df, keep_cols=("tool",)
        ).collect()
        got = {(r["conv_id"], r["turn_idx"]): (r["latency_us"], r["tool"])
               for r in rows}
        assert got == {
            (1, 2): (3_000_000, "search"),
            (1, 5): (7_000_000, "code"),
        }
        # consistency with the per-conversation aggregate
        [agg] = conversations.response_latency(
            df.filter("conv_id = 1")
        ).collect()
        lats = [v[0] for k, v in got.items() if k[0] == 1]
        assert agg.avg_latency_us == sum(lats) // len(lats)

    def test_negative_latency_and_missing_column(self, spark):
        df = self._t(spark, [
            (1, 0, "user", 100, None),
            (1, 1, "assistant", 97, None),
        ])
        [r] = conversations.response_latency_turns(df).collect()
        assert r["latency_us"] == -3_000_000
        assert set(r.asDict()) == {"conv_id", "turn_idx", "latency_us"}
        with pytest.raises(ValueError, match="response_latency_turns"):
            conversations.response_latency_turns(
                df, keep_cols=("no_such_col",)
            )


class TestPrefixReport:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "conv_id bigint, turn_idx bigint, role string, text string"
        )

    def test_shared_head_and_divergence(self, spark):
        rows = [
            (1, 0, "user", "sys"), (1, 1, "assistant", "hi"),
            (1, 2, "user", "q1"),
            (2, 0, "user", "sys"), (2, 1, "assistant", "hi"),
            (2, 2, "user", "q2"),
            (3, 0, "user", "other"),
        ]
        got = {r["conv_id"]: r for r in
               conversations.prefix_report(self._df(spark, rows)).collect()}
        assert (got[1]["shared_depth"], got[1]["share_count"]) == (2, 2)
        assert (got[2]["shared_depth"], got[2]["share_count"]) == (2, 2)
        assert (got[3]["shared_depth"], got[3]["share_count"]) == (0, 0)
        assert got[3]["n_turns"] == 1

    def test_full_clone_shares_full_depth(self, spark):
        rows = [
            (1, 0, "user", "a"), (1, 1, "assistant", "b"),
            (2, 5, "user", "a"), (2, 6, "assistant", "b"),  # renumbered
            (3, 0, "user", "a"),  # shares only depth 1
        ]
        got = {r["conv_id"]: r for r in
               conversations.prefix_report(self._df(spark, rows)).collect()}
        assert got[1]["shared_depth"] == 2 and got[1]["share_count"] == 2
        assert got[2]["shared_depth"] == 2
        # conv 3 shares the depth-1 prefix with BOTH others
        assert got[3]["shared_depth"] == 1 and got[3]["share_count"] == 3

    def test_max_depth_cap_and_validation(self, spark):
        rows = [(c, i, "user", f"t{i}") for c in (1, 2) for i in range(5)]
        got = {r["conv_id"]: r for r in
               conversations.prefix_report(
                   self._df(spark, rows), max_depth=3).collect()}
        assert got[1]["shared_depth"] == 3  # capped below the true 5
        with pytest.raises(ValueError, match="max_depth"):
            conversations.prefix_report(self._df(spark, rows), max_depth=0)


class TestToolChains:
    SCHEMA = "conv_id string, turn_idx int, role string, tool string"

    def test_chain_fold_and_counts(self, spark):
        rows = [
            ("c1", 0, "user", None),
            ("c1", 1, "tool", "search"),
            ("c1", 2, "tool", "fetch"),
            ("c1", 3, "assistant", None),
            # c2 runs the same chain as c1
            ("c2", 0, "tool", "search"),
            ("c2", 5, "tool", "fetch"),
            # c3: single-tool chain; out-of-order insertion exercises
            # the array_sort (turn 4 listed before turn 2)
            ("c3", 4, "tool", "calc"),
            ("c3", 2, "tool", "search"),
            # c4: no tool calls at all -> not a tool-using conversation
            ("c4", 0, "user", None),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = {
            r["chain"]: r.asDict()
            for r in conversations.tool_chains(df).collect()
        }
        assert set(out) == {"search>fetch", "search>calc"}
        sf = out["search>fetch"]
        assert (sf["chain_len"], sf["n_convs"]) == (2, 2)
        # 2 of 3 tool-using conversations
        assert sf["share_micro"] == 2 * 1_000_000 // 3
        sc = out["search>calc"]
        assert (sc["chain_len"], sc["n_convs"]) == (2, 1)
        assert sc["share_micro"] == 1_000_000 // 3

    def test_min_convs_prunes_singletons(self, spark):
        rows = [
            ("c1", 0, "tool", "a"),
            ("c2", 0, "tool", "a"),
            ("c3", 0, "tool", "b"),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = conversations.tool_chains(df, min_convs=2).collect()
        assert [r["chain"] for r in out] == ["a"]

    def test_order_tie_resolves_by_tool_name(self, spark):
        # duplicate turn_idx: struct sort falls back to the tool name,
        # so the chain is deterministic on every partitioning
        rows = [("c1", 1, "tool", "zeta"), ("c1", 1, "tool", "alpha")]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = conversations.tool_chains(df).collect()
        assert out[0]["chain"] == "alpha>zeta"

    def test_validation(self, spark):
        df = spark.createDataFrame([("c1", 0, "tool", "a")], self.SCHEMA)
        with pytest.raises(ValueError, match="min_convs"):
            conversations.tool_chains(df, min_convs=0)
        with pytest.raises(ValueError, match="tool_chains"):
            conversations.tool_chains(df.drop("tool"))


class TestRepeatedResponses:
    def test_cross_conv_boilerplate(self, spark):
        canned = "I cannot help with that."
        rows = [
            ("c1", 0, "user", canned),  # user turn never counts
            ("c1", 1, "assistant", canned),
            ("c2", 1, "assistant", canned),
            ("c2", 3, "assistant", canned),  # same conv twice
            ("c3", 1, "assistant", "unique answer"),
            ("c4", 1, "assistant", None),  # NULL text ignored
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = conversations.repeated_response_report(df).collect()
        assert len(out) == 1
        r = out[0]
        assert r["snippet"] == canned
        assert (r["n_turns"], r["n_convs"], r["first_conv"]) == (3, 2, "c1")

    def test_min_convs_and_snippet_len(self, spark):
        rows = [
            ("c1", 0, "assistant", "x" * 100),
            ("c2", 0, "assistant", "x" * 100),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = conversations.repeated_response_report(
            df, min_convs=3
        ).collect()
        assert out == []
        out = conversations.repeated_response_report(
            df, min_convs=2, snippet_len=10
        ).collect()
        assert out[0]["snippet"] == "x" * 10


class TestContextOverflow:
    def test_overflow_boundary_and_counts(self, spark):
        rows = [
            # c1: 3 turns of 2 tokens each; budget 6 -> exactly fits
            ("c1", 0, "user", "a b"),
            ("c1", 1, "assistant", "c d"),
            ("c1", 2, "user", "e f"),
            # c2: same but one extra turn -> overflows at idx 3
            ("c2", 0, "user", "a b"),
            ("c2", 1, "assistant", "c d"),
            ("c2", 2, "user", "e f"),
            ("c2", 3, "assistant", "g h"),
            # c3: single huge turn overflows immediately; NULL-text
            # turn counts 0 tokens
            ("c3", 0, "user", "t " * 10),
            ("c3", 1, "assistant", None),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {
            r["conv_id"]: r.asDict()
            for r in conversations.context_overflow_report(
                df, max_tokens=6
            ).collect()
        }
        c1 = out["c1"]
        assert (c1["n_turns"], c1["total_tokens"]) == (3, 6)
        assert c1["fits"] is True
        assert c1["first_overflow_idx"] is None
        assert c1["n_turns_over"] == 0
        c2 = out["c2"]
        assert c2["fits"] is False
        assert (c2["first_overflow_idx"], c2["n_turns_over"]) == (3, 1)
        c3 = out["c3"]
        assert (c3["first_overflow_idx"], c3["n_turns_over"]) == (0, 2)
        assert c3["total_tokens"] == 10

    def test_validation(self, spark):
        df = spark.createDataFrame([("c1", 0, "user", "x")], SCHEMA)
        with pytest.raises(ValueError, match="max_tokens"):
            conversations.context_overflow_report(df, max_tokens=0)


class TestDropRepeatedResponses:
    def test_first_occurrence_kept(self, spark):
        canned = "I cannot help with that."
        rows = [
            ("c1", 0, "user", canned),       # non-assistant: always kept
            ("c1", 1, "assistant", canned),  # first occurrence -> kept
            ("c1", 2, "assistant", canned),  # within-conv repeat -> dropped
            ("c2", 0, "assistant", canned),  # cross-conv repeat -> dropped
            ("c2", 1, "assistant", "unique"),
            ("c2", 2, "assistant", None),    # NULL text: kept
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        kept = {
            (r["conv_id"], r["turn_idx"])
            for r in conversations.drop_repeated_responses(df).collect()
        }
        assert kept == {("c1", 0), ("c1", 1), ("c2", 1), ("c2", 2)}

    def test_role_parameter(self, spark):
        rows = [
            ("c1", 0, "user", "hi"),
            ("c2", 0, "user", "hi"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        kept = {
            (r["conv_id"], r["turn_idx"])
            for r in conversations.drop_repeated_responses(
                df, role="user"
            ).collect()
        }
        assert kept == {("c1", 0)}


class TestTurnPositionStats:
    def test_buckets_and_means(self, spark):
        # one conversation, 10 turns: turn i has i+1 tokens; with 10
        # buckets each turn is its own bucket
        rows = [
            ("c1", i, "assistant" if i % 2 else "user", " ".join(["w"] * (i + 1)))
            for i in range(10)
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {
            (r["role"], r["bucket"]): r.asDict()
            for r in conversations.turn_position_stats(df).collect()
        }
        assert len(out) == 10
        assert out[("user", 0)]["total_tokens"] == 1
        assert out[("assistant", 9)]["total_tokens"] == 10
        assert out[("assistant", 9)]["mean_tokens_micro"] == 10_000_000

    def test_bucket_range_exact(self, spark):
        # 3 turns into 10 buckets: rn*10 div 3 -> 0, 3, 6 (never 10)
        rows = [("c1", i, "user", "x") for i in range(3)]
        df = spark.createDataFrame(rows, SCHEMA)
        buckets = sorted(
            r["bucket"]
            for r in conversations.turn_position_stats(df).collect()
        )
        assert buckets == [0, 3, 6]

    def test_validation(self, spark):
        df = spark.createDataFrame([("c1", 0, "user", "x")], SCHEMA)
        with pytest.raises(ValueError, match="n_buckets"):
            conversations.turn_position_stats(df, n_buckets=0)


class TestContextOverflowNullIdx:
    def test_null_idx_never_reports_sentinel(self, spark):
        # the NULL-idx turn orders first (10 tokens, overflowing the
        # budget immediately); the reported first_overflow_idx must be
        # the smallest REAL overflowing index, never the internal -1
        rows = [
            ("c1", None, "user", " ".join(["w"] * 10)),
            ("c1", 0, "assistant", "a b"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = conversations.context_overflow_report(df, max_tokens=5).collect()[0]
        assert out["fits"] is False
        assert out["first_overflow_idx"] == 0
        assert out["n_turns_over"] == 2


class TestFlowShapes:
    def test_shapes_and_truncation(self, spark):
        rows = (
            [("c1", i, ["user", "assistant"][i % 2], "x") for i in range(4)]
            + [("c2", i, ["user", "assistant"][i % 2], "x") for i in range(4)]
            + [("c3", i, "user", "x") for i in range(14)]  # deep, truncated
            + [("c4", 0, None, "x")]  # NULL role -> '?'
        )
        df = spark.createDataFrame(rows, SCHEMA)
        out = {
            r["flow"]: r.asDict()
            for r in conversations.flow_shapes(df).collect()
        }
        assert set(out) == {"uaua", "uuuuuuuuuuuu+", "?"}
        assert out["uaua"]["n_convs"] == 2
        assert out["uaua"]["share_micro"] == 2_000_000 // 4
        assert out["uuuuuuuuuuuu+"]["n_convs"] == 1

    def test_validation(self, spark):
        df = spark.createDataFrame([("c1", 0, "user", "x")], SCHEMA)
        with pytest.raises(ValueError, match="max_depth"):
            conversations.flow_shapes(df, max_depth=0)


class TestIdentityLeaks:
    def test_role_gate_and_rate(self, spark):
        rows = [
            ("c1", 0, "user", "As an AI I wonder"),      # user never counts
            ("c1", 1, "assistant", "As an AI language model, I cannot."),
            ("c1", 2, "assistant", "here is the answer"),
            ("c2", 0, "assistant", "i was trained by a team"),
            ("c3", 0, "user", "no assistant turns here"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {
            r["conv_id"]: r.asDict()
            for r in conversations.identity_leak_stats(df).collect()
        }
        c1 = out["c1"]
        assert (c1["n_assistant"], c1["n_identity"]) == (2, 1)
        assert c1["identity_rate_micro"] == 500_000
        assert c1["has_identity"] is True
        assert out["c2"]["identity_rate_micro"] == 1_000_000
        c3 = out["c3"]
        assert c3["n_assistant"] == 0
        assert c3["identity_rate_micro"] is None  # 0/0 undefined
        assert c3["has_identity"] is False

    def test_boundary_no_false_positives(self, spark):
        # substrings inside larger words must not match (review fix)
        rows = [
            ("c1", 0, "assistant", "dummy training data is fine"),
            ("c1", 1, "assistant", "BERT was a language model"),
            ("c1", 2, "assistant", "Mimi was trained by her coach"),
            ("c1", 3, "assistant", "we hired an aide yesterday"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = conversations.identity_leak_stats(df).collect()[0]
        assert out["n_identity"] == 0 and out["has_identity"] is False


class TestPreferencePairs:
    def test_divergent_assistant_pair_found(self, spark):
        rows = [
            # a/b: same 2-turn prefix, divergent assistant turn 2
            ("a", 0, "user", "hi"),
            ("a", 1, "assistant", "hello"),
            ("a", 2, "user", "explain x"),
            ("a", 3, "assistant", "answer ONE"),
            ("b", 0, "user", "hi"),
            ("b", 1, "assistant", "hello"),
            ("b", 2, "user", "explain x"),
            ("b", 3, "assistant", "answer TWO"),
            # c: shares only the depth-1 prefix with a/b, diverges at a
            # USER turn -> never a preference pair
            ("c", 0, "user", "hi"),
            ("c", 1, "user", "different question"),
            # d: exact clone of a -> no divergence anywhere
            ("d", 0, "user", "hi"),
            ("d", 1, "assistant", "hello"),
            ("d", 2, "user", "explain x"),
            ("d", 3, "assistant", "answer ONE"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {
            (r["conv_a"], r["conv_b"]): r.asDict()
            for r in conversations.preference_pairs(df).collect()
        }
        # a-b and b-d diverge at the depth-3 assistant turn; a-d are
        # identical (deepest shared prefix's next turns are EQUAL) so
        # no pair; c never pairs (user divergence)
        assert ("a", "b") in out and ("b", "d") in out
        assert ("a", "d") not in out
        assert all("c" not in k for k in out)
        p = out[("a", "b")]
        assert p["prefix_depth"] == 3
        assert (p["a_turn_idx"], p["b_turn_idx"]) == (3, 3)

    def test_hot_prefix_cap(self, spark):
        # 5 conversations sharing a prefix, divergent assistant turns:
        # with max_prefix_group=3 the group is dropped entirely
        rows = []
        for c in range(5):
            rows += [
                (f"c{c}", 0, "user", "same prompt"),
                (f"c{c}", 1, "assistant", f"answer {c}"),
            ]
        df = spark.createDataFrame(rows, SCHEMA)
        assert (
            conversations.preference_pairs(df, max_prefix_group=3).count()
            == 0
        )
        # uncapped-enough: all 10 pairs appear
        assert (
            conversations.preference_pairs(df, max_prefix_group=10).count()
            == 10
        )

    def test_validation(self, spark):
        df = spark.createDataFrame([("a", 0, "user", "x")], SCHEMA)
        with pytest.raises(ValueError, match="max_depth"):
            conversations.preference_pairs(df, max_depth=0)
        with pytest.raises(ValueError, match="max_prefix_group"):
            conversations.preference_pairs(df, max_prefix_group=1)


class TestToolLoops:
    TSCHEMA = "conv_id string, turn_idx int, tool string"

    def test_runs_and_loops(self, spark):
        rows = [
            # c1: search x3 (loop), fetch x1, search x2 -> max_run 3,
            # one loop run at loop_min=3, 2 distinct tools
            ("c1", 0, "search"), ("c1", 1, "search"), ("c1", 2, "search"),
            ("c1", 3, "fetch"), ("c1", 4, "search"), ("c1", 5, "search"),
            # c2: alternating, no loop
            ("c2", 0, "a"), ("c2", 1, "b"), ("c2", 2, "a"),
        ]
        df = spark.createDataFrame(rows, self.TSCHEMA)
        out = {r["conv_id"]: r.asDict()
               for r in conversations.tool_loops(df, loop_min=3).collect()}
        assert out["c1"]["n_tool_turns"] == 6
        assert out["c1"]["n_distinct_tools"] == 2
        assert out["c1"]["max_tool_run"] == 3
        assert out["c1"]["n_loop_runs"] == 1
        assert out["c1"]["has_loop"] is True
        assert out["c2"]["max_tool_run"] == 1
        assert out["c2"]["n_loop_runs"] == 0
        assert out["c2"]["has_loop"] is False

    def test_null_and_empty_tools_skipped(self, spark):
        # chat turns between tool calls do not break the run
        rows = [("c", 0, "x"), ("c", 1, None), ("c", 2, ""), ("c", 3, "x")]
        df = spark.createDataFrame(rows, self.TSCHEMA)
        r = conversations.tool_loops(df, loop_min=2).collect()[0]
        assert r["n_tool_turns"] == 2 and r["max_tool_run"] == 2
        assert r["has_loop"] is True

    def test_conversation_without_tools_absent(self, spark):
        rows = [("c", 0, None)]
        df = spark.createDataFrame(rows, self.TSCHEMA)
        assert conversations.tool_loops(df).count() == 0

    def test_loop_min_validated(self, spark):
        df = spark.createDataFrame([("c", 0, "x")], self.TSCHEMA)
        with pytest.raises(ValueError, match="loop_min"):
            conversations.tool_loops(df, loop_min=1)

    def test_parallelism_invariant(self, spark):
        rows = [("c%d" % (i % 3), i, "t%d" % (i % 2)) for i in range(30)]
        df = spark.createDataFrame(rows, self.TSCHEMA)
        one = sorted(map(tuple,
                         conversations.tool_loops(df.coalesce(1)).collect()))
        par = sorted(map(tuple,
                         conversations.tool_loops(
                             df.repartition(7)).collect()))
        assert one == par


class TestCompletionStats:
    def test_ends_assistant_vs_abandoned(self, spark):
        rows = [
            ("c1", 0, "user", "q"), ("c1", 1, "assistant", "a"),
            ("c2", 0, "user", "q"), ("c2", 1, "assistant", "a"),
            ("c2", 2, "user", "follow-up?"), ("c2", 3, "tool", "r"),
            ("c3", 0, "user", "never answered"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {r["conv_id"]: r.asDict()
               for r in conversations.completion_stats(df).collect()}
        assert out["c1"]["ends_assistant"] is True
        assert out["c1"]["abandoned"] is False
        assert out["c1"]["trailing_dangling"] == 0
        assert out["c1"]["last_role"] == "assistant"
        assert out["c2"]["abandoned"] is True
        assert out["c2"]["last_role"] == "tool"
        assert out["c2"]["last_turn_idx"] == 3
        assert out["c2"]["trailing_dangling"] == 2
        assert out["c3"]["trailing_dangling"] == 1
        assert out["c3"]["n_turns"] == 1

    def test_null_idx_and_role(self, spark):
        # NULL idx coalesces to -1 (sorts first), NULL role to ''
        rows = [("c", None, None, "x"), ("c", 0, "assistant", "a")]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.completion_stats(df).collect()[0]
        assert r["last_role"] == "assistant" and r["abandoned"] is False

    def test_tie_broken_by_role(self, spark):
        # duplicate last idx: struct max picks the greater role string
        rows = [("c", 1, "assistant", "a"), ("c", 1, "user", "u")]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.completion_stats(df).collect()[0]
        assert r["last_role"] == "user" and r["trailing_dangling"] == 1

    def test_parallelism_invariant(self, spark):
        rows = [("c%d" % (i % 4), i,
                 "assistant" if i % 3 else "user", "t") for i in range(40)]
        df = spark.createDataFrame(rows, SCHEMA)
        one = sorted(map(tuple, conversations.completion_stats(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, conversations.completion_stats(
            df.repartition(9)).collect()))
        assert one == par


class TestEchoStats:
    def test_containment_math(self, spark):
        rows = [
            # full echo: assistant repeats every user token (plus more)
            ("c1", 0, "user", "alpha beta gamma"),
            ("c1", 1, "assistant", "alpha beta gamma and more words"),
            # partial echo 1/3
            ("c1", 2, "user", "one two three"),
            ("c1", 3, "assistant", "two unrelated reply"),
            # non-adjacent user->assistant (gap) is NOT a pair
            ("c2", 0, "user", "x y"),
            ("c2", 2, "assistant", "x y"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {r["conv_id"]: r.asDict()
               for r in conversations.echo_stats(df).collect()}
        assert out["c1"]["n_pairs"] == 2
        assert out["c1"]["max_echo_micro"] == 1_000_000
        # pair scores are 1_000_000 and 333_333 -> floor avg 666_666
        assert out["c1"]["avg_echo_micro"] == 666_666
        assert out["c1"]["n_echoed"] == 1 and out["c1"]["has_echo"] is True
        assert "c2" not in out  # gap pair excluded -> no pairs -> no row

    def test_case_insensitive_and_dedup(self, spark):
        # repeated user tokens count once; case-folded match
        rows = [
            ("c", 0, "user", "Foo foo FOO bar"),
            ("c", 1, "assistant", "foo something"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.echo_stats(df).collect()[0]
        # distinct user tokens {foo, bar}; hit {foo} -> 500000
        assert r["max_echo_micro"] == 500_000

    def test_empty_user_turn_scores_zero(self, spark):
        rows = [
            ("c", 0, "user", "   "),
            ("c", 1, "assistant", "whatever"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.echo_stats(df).collect()[0]
        assert r["n_pairs"] == 1 and r["max_echo_micro"] == 0
        assert r["has_echo"] is False

    def test_max_tokens_cap(self, spark):
        # cap applies AFTER sorting, so it keeps the lexicographically
        # first tokens deterministically
        rows = [
            ("c", 0, "user", "a b c d"),
            ("c", 1, "assistant", "c d"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        full = conversations.echo_stats(df).collect()[0]
        assert full["max_echo_micro"] == 500_000
        capped = conversations.echo_stats(df, max_tokens=2).collect()[0]
        # user toks capped to {a, b}; assistant toks {c, d} -> 0 hits
        assert capped["max_echo_micro"] == 0

    def test_parallelism_invariant(self, spark):
        rows = [
            ("c%d" % (i % 4), i // 4 * 2 + j, role, "tok%d w%d" % (i % 5, j))
            for i in range(40)
            for j, role in enumerate(["user", "assistant"])
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        one = sorted(map(tuple,
                         conversations.echo_stats(df.coalesce(1)).collect()))
        par = sorted(map(tuple,
                         conversations.echo_stats(
                             df.repartition(7)).collect()))
        assert one == par


class TestTruncationStats:
    def test_flags(self, spark):
        rows = [
            ("c", 0, "assistant", "All done."),            # clean
            ("c", 1, "assistant", "It stops abruptly"),    # no terminal
            ("c", 2, "assistant", "code: ```py x = 1"),    # odd fence (+no term)
            ("c", 3, "assistant", "And then..."),          # ellipsis
            ("c", 4, "assistant", 'He said "it works.'),   # odd quote
            ("c", 5, "user", "never counted"),             # wrong role
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.truncation_stats(df).collect()[0]
        assert r["n_assistant"] == 5
        assert r["n_no_terminal"] == 2
        assert r["n_odd_fence"] == 1
        assert r["n_ellipsis"] == 1
        assert r["n_odd_quote"] == 1
        assert r["n_suspect"] == 4
        assert r["suspect_ratio_micro"] == 800_000
        assert r["has_suspect"] is True

    def test_balanced_fences_and_quotes_clean(self, spark):
        rows = [
            ("c", 0, "assistant", 'He said "done" and left: ```x``` ok.'),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.truncation_stats(df).collect()[0]
        assert r["n_suspect"] == 0 and r["has_suspect"] is False

    def test_trailing_whitespace_rtrimmed(self, spark):
        rows = [("c", 0, "assistant", "Finished.   \n\t")]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.truncation_stats(df).collect()[0]
        assert r["n_no_terminal"] == 0

    def test_empty_and_null_text_not_flagged(self, spark):
        rows = [("c", 0, "assistant", ""), ("c", 1, "assistant", None)]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.truncation_stats(df).collect()[0]
        assert r["n_assistant"] == 2 and r["n_suspect"] == 0

    def test_no_assistant_turns_no_row(self, spark):
        rows = [("c", 0, "user", "hi")]
        df = spark.createDataFrame(rows, SCHEMA)
        assert conversations.truncation_stats(df).count() == 0

    def test_parallelism_invariant(self, spark):
        texts = ["Done.", "cut", "x ```", "y...", 'z "q']
        rows = [("c%d" % (i % 3), i, "assistant", texts[i % 5])
                for i in range(30)]
        df = spark.createDataFrame(rows, SCHEMA)
        one = sorted(map(tuple, conversations.truncation_stats(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, conversations.truncation_stats(
            df.repartition(7)).collect()))
        assert one == par


class TestTopUserPrompts:
    def test_normalized_grouping_and_order(self, spark):
        rows = [
            ("c1", 0, "user", "Reset my password?"),
            ("c1", 2, "user", "reset my password!!"),
            ("c2", 0, "user", "Reset my password?"),
            ("c2", 2, "user", "weather today"),
            ("c3", 0, "user", "weather today"),
            ("c3", 1, "assistant", "Reset my password?"),  # wrong role
            ("c3", 2, "user", None),                        # skipped
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = conversations.top_user_prompts(df, k=10).collect()
        assert [r["n_turns"] for r in out] == [3, 2]
        top = out[0]
        assert top["n_convs"] == 2
        assert top["min_chars"] == 18 and top["max_chars"] == 19
        assert top["first_conv"] == "c1"

    def test_k_cut_deterministic(self, spark):
        rows = [("c", i, "user", f"q{i}") for i in range(10)]
        df = spark.createDataFrame(rows, SCHEMA)
        # all singletons: the cut must be by md5 ascending
        got = [r["prompt_md5"]
               for r in conversations.top_user_prompts(df, k=3).collect()]
        assert got == sorted(got) and len(got) == 3

    def test_raw_mode(self, spark):
        rows = [
            ("c", 0, "user", "Hi!"),
            ("c", 1, "user", "hi"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        assert conversations.top_user_prompts(df, k=9).count() == 1
        assert (
            conversations.top_user_prompts(df, k=9, normalize=False).count()
            == 2
        )

    def test_k_validated(self, spark):
        df = spark.createDataFrame([("c", 0, "user", "x")], SCHEMA)
        with pytest.raises(ValueError, match="k must be"):
            conversations.top_user_prompts(df, k=0)


class TestSystemPromptCensus:
    def test_census_shares_and_first_turn(self, spark):
        rows = [
            ("c1", 0, "system", "You are A."),
            ("c1", 5, "system", "late override ignored"),
            ("c2", 0, "system", "You are A."),
            ("c3", 0, "system", "You are B."),
            ("c4", 0, "user", "no system turn"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = conversations.system_prompt_census(df).collect()
        assert [r["n_convs"] for r in out] == [2, 1]
        top = out[0]
        assert top["n_chars"] == 10
        assert top["share_micro"] == 666_666
        assert top["first_conv"] == "c1"
        assert out[1]["share_micro"] == 333_333

    def test_first_by_index_not_row_order(self, spark):
        rows = [
            ("c", 7, "system", "later"),
            ("c", 2, "system", "earlier"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = conversations.system_prompt_census(df).collect()
        assert len(out) == 1 and out[0]["n_chars"] == len("earlier")

    def test_no_system_turns_empty(self, spark):
        df = spark.createDataFrame([("c", 0, "user", "x")], SCHEMA)
        assert conversations.system_prompt_census(df).count() == 0

    def test_parallelism_invariant(self, spark):
        rows = [("c%d" % i, 0, "system", "p%d" % (i % 3))
                for i in range(30)]
        df = spark.createDataFrame(rows, SCHEMA)
        one = sorted(map(tuple, conversations.system_prompt_census(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, conversations.system_prompt_census(
            df.repartition(7)).collect()))
        assert one == par


class TestCostReport:
    def test_replay_billing(self, spark):
        rows = [
            ("c", 0, "system", "sys prompt here"),        # 3 tokens
            ("c", 1, "user", "hi there"),                 # 2 tokens
            ("c", 2, "assistant", "hello you two"),       # 3 tokens
            ("c", 3, "user", "bye"),                      # 1 token
            ("c", 4, "assistant", "farewell"),            # 1 token
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.cost_report(df).collect()[0]
        assert r["n_turns"] == 5
        assert r["prompt_tokens"] == 6
        assert r["completion_tokens"] == 4
        # turn 2 sees 5 before it; turn 4 sees 5+3+1 = 9
        assert r["replay_prompt_tokens"] == 14
        # 14 * 3000 div 1000 + 4 * 15000 div 1000 = 42 + 60
        assert r["cost_micro"] == 102

    def test_floor_is_per_component(self, spark):
        df = spark.createDataFrame(
            [("c", 0, "user", "a"), ("c", 1, "assistant", "b")], SCHEMA)
        r = conversations.cost_report(
            df, rate_in_micro_per_1k=1, rate_out_micro_per_1k=999
        ).collect()[0]
        # replay 1 * 1 div 1000 = 0; completion 1 * 999 div 1000 = 0
        assert r["cost_micro"] == 0

    def test_parallelism_invariant(self, spark):
        rows = [("c%d" % (i % 5), i % 9,
                 "assistant" if i % 2 else "user", "w " * (i % 4))
                for i in range(40)]
        df = spark.createDataFrame(rows, SCHEMA)
        one = sorted(map(tuple, conversations.cost_report(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, conversations.cost_report(
            df.repartition(7)).collect()))
        assert one == par


class TestBranchingStats:
    def test_detects_regenerated_slot(self, spark):
        rows = [
            ("c", 0, "user", "q"),
            ("c", 1, "assistant", "answer v1"),
            ("c", 1, "assistant", "answer v2"),   # regenerated sibling
            ("c", 1, "assistant", "answer v1"),   # exact dup of v1
            ("c", 2, "user", "ok"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.branching_stats(df).collect()[0]
        assert r["n_slots"] == 3
        assert r["n_messages"] == 4     # v1 dup collapses
        assert r["n_branch_points"] == 1
        assert r["max_siblings"] == 2
        assert r["has_branches"] is True

    def test_same_idx_different_role_not_a_branch(self, spark):
        rows = [("c", 0, "user", "x"), ("c", 0, "tool", "y")]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.branching_stats(df).collect()[0]
        assert r["n_branch_points"] == 0 and r["has_branches"] is False

    def test_parallelism_invariant(self, spark):
        rows = [("c%d" % (i % 4), i % 3, "assistant", "t%d" % (i % 5))
                for i in range(40)]
        df = spark.createDataFrame(rows, SCHEMA)
        one = sorted(map(tuple, conversations.branching_stats(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, conversations.branching_stats(
            df.repartition(7)).collect()))
        assert one == par


class TestRephraseReport:
    def test_near_and_exact_pairs(self, spark):
        rows = [
            ("c", 0, "user", "how do I reset my password"),
            ("c", 1, "assistant", "click forgot password"),
            ("c", 2, "user", "how can I reset my password"),   # near
            ("c", 3, "user", "how can I reset my password"),   # exact
            ("c", 4, "user", "completely different topic xyz"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.rephrase_report(df).collect()[0]
        assert r["n_role_turns"] == 4
        assert r["n_pairs"] == 3
        # pair1: dist('do'->'can') = 3 over maxlen 27 -> 888888;
        # pair2: dist 0 -> 1e6; pair3 well below the 0.6 threshold
        assert r["n_rephrases"] == 2
        assert r["n_exact_repeats"] == 1
        assert r["max_sim_micro"] == 1_000_000

    def test_both_empty_pair_is_identical(self, spark):
        rows = [("c", 0, "user", ""), ("c", 1, "user", "")]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.rephrase_report(df).collect()[0]
        assert r["max_sim_micro"] == 1_000_000
        assert r["n_exact_repeats"] == 1

    def test_single_turn_conversations_filtered(self, spark):
        rows = [("a", 0, "user", "x"), ("b", 0, "user", "y")]
        df = spark.createDataFrame(rows, SCHEMA)
        assert conversations.rephrase_report(df).count() == 0

    def test_cap_bounds_comparison(self, spark):
        # identical 4-char prefixes, divergence after max_chars
        rows = [("c", 0, "user", "abcdXXXX"), ("c", 1, "user", "abcdYYYY")]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.rephrase_report(df, max_chars=4).collect()[0]
        assert r["n_exact_repeats"] == 1

    def test_validation(self, spark):
        df = spark.createDataFrame([], SCHEMA)
        with pytest.raises(ValueError, match="max_chars"):
            conversations.rephrase_report(df, max_chars=0)
        with pytest.raises(ValueError, match="sim_threshold"):
            conversations.rephrase_report(df, sim_threshold_micro=2_000_000)

    def test_parallelism_invariant(self, spark):
        rows = [("c%d" % (i % 5), i, "user", "msg %d common tail" % (i % 7))
                for i in range(60)]
        df = spark.createDataFrame(rows, SCHEMA)
        one = sorted(map(tuple, conversations.rephrase_report(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, conversations.rephrase_report(
            df.repartition(7)).collect()))
        assert one == par


class TestLossMaskSpans:
    def test_offsets_and_mask(self, spark):
        rows = [
            ("c", 0, "user", "hello"),        # len 5  -> [0, 5)
            ("c", 1, "assistant", "hi!"),     # len 3  -> [6, 9)
            ("c", 2, "user", None),           # len 0  -> [10, 10)
            ("c", 3, "assistant", "bye"),     # len 3  -> [11, 14)
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {r["turn_idx"]: r
               for r in conversations.loss_mask_spans(df).collect()}
        assert (out[0]["start_off"], out[0]["end_off"]) == (0, 5)
        assert (out[1]["start_off"], out[1]["end_off"]) == (6, 9)
        assert (out[2]["start_off"], out[2]["end_off"]) == (10, 10)
        assert (out[3]["start_off"], out[3]["end_off"]) == (11, 14)
        assert [out[i]["masked"] for i in range(4)] == [
            False, True, False, True]

    def test_sep_len_zero_packs_tight(self, spark):
        rows = [("c", 0, "user", "ab"), ("c", 1, "assistant", "cd")]
        df = spark.createDataFrame(rows, SCHEMA)
        out = sorted(
            (r["start_off"], r["end_off"])
            for r in conversations.loss_mask_spans(df, sep_len=0).collect()
        )
        assert out == [(0, 2), (2, 4)]

    def test_spans_match_packed_text(self, spark):
        # the span table must index correctly into the join of the
        # turn texts with a 1-char separator in the same order
        rows = [("c", 0, "user", "aa"), ("c", 1, "assistant", "bbb"),
                ("c", 2, "user", "c")]
        df = spark.createDataFrame(rows, SCHEMA)
        packed = "aa|bbb|c"
        texts = {0: "aa", 1: "bbb", 2: "c"}
        for r in conversations.loss_mask_spans(df).collect():
            assert packed[r["start_off"]:r["end_off"]] == texts[r["turn_idx"]]

    def test_validation(self, spark):
        df = spark.createDataFrame([], SCHEMA)
        with pytest.raises(ValueError, match="sep_len"):
            conversations.loss_mask_spans(df, sep_len=-1)

    def test_parallelism_invariant(self, spark):
        rows = [("c%d" % (i % 4), i % 6,
                 "assistant" if i % 2 else "user", "t" * (i % 9))
                for i in range(48)]
        df = spark.createDataFrame(rows, SCHEMA)
        one = sorted(map(tuple, conversations.loss_mask_spans(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, conversations.loss_mask_spans(
            df.repartition(7)).collect()))
        assert one == par


class TestResolutionStats:
    def test_outcomes(self, spark):
        rows = [
            # resolved: last user turn says thanks
            ("a", 0, "user", "how do I do X"),
            ("a", 1, "assistant", "like this"),
            ("a", 2, "user", "thanks, that works now"),
            # unresolved: last user turn negative
            ("b", 0, "user", "it crashes"),
            ("b", 1, "assistant", "try Y"),
            ("b", 2, "user", "still not working"),
            # unknown: no markers in the last user turn
            ("c", 0, "user", "what about Z"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {r["conv_id"]: r
               for r in conversations.resolution_stats(df).collect()}
        assert out["a"]["outcome"] == "resolved"
        assert out["a"]["n_pos_turns"] == 1
        assert out["b"]["outcome"] == "unresolved"
        assert out["c"]["outcome"] == "unknown"

    def test_negative_wins_ties(self, spark):
        rows = [("a", 0, "user", "Thanks, but still not working")]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.resolution_stats(df).collect()[0]
        assert r["outcome"] == "unresolved"
        assert (r["n_pos_turns"], r["n_neg_turns"]) == (1, 1)

    def test_verdict_reads_last_turn_only(self, spark):
        rows = [
            ("a", 0, "user", "thanks, solved"),
            ("a", 1, "user", "actually a new question"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        r = conversations.resolution_stats(df).collect()[0]
        assert r["outcome"] == "unknown"
        assert r["n_pos_turns"] == 1

    def test_no_user_turns_no_row(self, spark):
        df = spark.createDataFrame(
            [("a", 0, "assistant", "hello")], SCHEMA)
        assert conversations.resolution_stats(df).count() == 0

    def test_parallelism_invariant(self, spark):
        texts = ["thanks a lot", "still broken", "hmm", "works now"]
        rows = [("c%d" % (i % 5), i, "user", texts[i % 4])
                for i in range(40)]
        df = spark.createDataFrame(rows, SCHEMA)
        one = sorted(map(tuple, conversations.resolution_stats(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, conversations.resolution_stats(
            df.repartition(7)).collect()))
        assert one == par


class TestMarkdownCensus:
    SCHEMA = "conv_id long, role string, text string"

    def test_counts_all_marker_families(self, spark):
        rows = [
            (1, "assistant",
             "intro\n```py\nx=1\n```\n- a\n- b\n# H\nsee [d](u) [e](v)"),
            (1, "assistant", "plain prose, no markers"),
            (1, "user", "- user bullets never counted"),
            (2, "assistant", "``` dangling fence only"),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = {r["conv_id"]: r
               for r in conversations.markdown_census(df).collect()}
        r1 = out[1]
        assert r1["n_turns"] == 2 and r1["n_md_turns"] == 1
        assert r1["n_code_blocks"] == 1
        assert r1["n_bullet_lines"] == 2
        assert r1["n_heading_lines"] == 1
        assert r1["n_links"] == 2
        r2 = out[2]  # one marker floors to zero blocks, not an md turn
        assert r2["n_code_blocks"] == 0 and r2["n_md_turns"] == 0

    def test_no_role_turns_no_row_and_null_text(self, spark):
        rows = [(1, "user", "- x"), (2, "assistant", None)]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = {r["conv_id"]: r
               for r in conversations.markdown_census(df).collect()}
        assert set(out) == {2}
        assert out[2]["n_turns"] == 1 and out[2]["n_md_turns"] == 0

    def test_bullet_needs_dash_space_prefix(self, spark):
        # "-x" and mid-line " - " are not bullet LINES; "#x" is a heading
        rows = [(1, "assistant", "-x\nno - here\n#x")]
        df = spark.createDataFrame(rows, self.SCHEMA)
        r = conversations.markdown_census(df).collect()[0]
        assert r["n_bullet_lines"] == 0 and r["n_heading_lines"] == 1

    def test_validates(self, spark):
        df = spark.createDataFrame([(1,)], "conv_id long")
        with pytest.raises(ValueError, match="markdown_census"):
            conversations.markdown_census(df)


class TestTurnBalance:
    SCHEMA = "conv_id long, turn_idx long, role string, text string"

    def test_shares_and_alternation(self, spark):
        rows = [
            (1, 0, "user", "hi"),            # 2 chars
            (1, 1, "assistant", "hello!"),   # 6 chars
            (1, 2, "user", "bye"),           # 3 chars
            (1, 3, "tool", "ignored chars"),
            (2, 0, "assistant", "monologue"),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = {r["conv_id"]: r
               for r in conversations.turn_balance(df).collect()}
        one = out[1]
        assert (one["n_turns"], one["n_user_turns"],
                one["n_assistant_turns"]) == (4, 2, 1)
        assert (one["user_chars"], one["assistant_chars"]) == (5, 6)
        assert one["assistant_char_share_micro"] == 6 * 1_000_000 // 11
        # all 3 adjacent pairs alternate (tool counts in the chain)
        assert one["alternation_micro"] == 1_000_000
        two = out[2]  # single turn: alternation undefined
        assert two["alternation_micro"] is None
        assert two["assistant_char_share_micro"] == 1_000_000

    def test_same_role_run_and_null_text(self, spark):
        rows = [(1, 0, "user", "aa"), (1, 1, "user", None),
                (1, 2, "assistant", "bb")]
        r = conversations.turn_balance(
            spark.createDataFrame(rows, self.SCHEMA)).collect()[0]
        assert r["user_chars"] == 2        # NULL text counts zero
        assert r["alternation_micro"] == 500_000   # 1 of 2 pairs

    def test_zero_chars_share_null(self, spark):
        rows = [(1, 0, "tool", "x"), (1, 1, "system", "y")]
        r = conversations.turn_balance(
            spark.createDataFrame(rows, self.SCHEMA)).collect()[0]
        assert r["assistant_char_share_micro"] is None

    def test_validates(self, spark):
        with pytest.raises(ValueError, match="turn_balance"):
            conversations.turn_balance(
                spark.createDataFrame([(1,)], "conv_id long"))
