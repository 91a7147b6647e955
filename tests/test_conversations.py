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
