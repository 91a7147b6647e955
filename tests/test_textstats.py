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


class TestLexicalDiversity:
    def test_ttr_and_hapax_math(self, spark):
        df = spark.createDataFrame(
            [(1, "a b A c"), (2, None), (3, "")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in
               textstats.lexical_diversity(df).collect()}
        # doc 1: tokens [a, b, a, c] -> 4 tokens, 3 types, hapax {b, c}
        assert got[1]["n_tokens"] == 4 and got[1]["n_types"] == 3
        assert got[1]["ttr_micro"] == 3 * 1_000_000 // 4
        assert got[1]["n_hapax"] == 2
        assert got[1]["hapax_ratio_micro"] == 2 * 1_000_000 // 3
        # NULL and empty text: all-zero rows, never NULL
        for d in (2, 3):
            assert (got[d]["n_tokens"], got[d]["n_types"],
                    got[d]["ttr_micro"], got[d]["n_hapax"],
                    got[d]["hapax_ratio_micro"]) == (0, 0, 0, 0, 0)

    def test_all_repeated_vs_all_unique(self, spark):
        df = spark.createDataFrame(
            [(1, "x x x x"), (2, "p q r s")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in
               textstats.lexical_diversity(df).collect()}
        assert got[1]["n_types"] == 1 and got[1]["n_hapax"] == 0
        assert got[1]["hapax_ratio_micro"] == 0
        assert got[2]["ttr_micro"] == 1_000_000
        assert got[2]["hapax_ratio_micro"] == 1_000_000


class TestWinnowFingerprints:
    def _expected(self, text, k, w):
        import hashlib
        g = len(text) - k + 1
        if g < 1:
            return set()
        hp = [(hashlib.md5(text[i:i + k].encode()).hexdigest(), i + 1)
              for i in range(g)]
        n_windows = max(g - w + 1, min(g, 1))
        sel = {min(hp[s:s + w]) for s in range(n_windows)}
        return {(pos, fp) for fp, pos in sel}

    def test_matches_reference_selection(self, spark):
        text = "abracadabra zebra"
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        got = {(r["pos"], r["fp"]) for r in
               textstats.winnow_fingerprints(df, k=3, w=4).collect()}
        assert got == self._expected(text, 3, 4)

    def test_shared_substring_guarantee(self, spark):
        # any shared substring of length >= w + k - 1 must yield at
        # least one shared fingerprint (SIGMOD 2003 theorem)
        k, w = 3, 4
        shared = "the-common-core!"  # len 16 >= 6
        df = spark.createDataFrame(
            [(1, "XXXX" + shared + "YYYYYY"), (2, "qq" + shared + "zz")],
            "doc_id long, text string",
        )
        rows = textstats.winnow_fingerprints(df, k=k, w=w).collect()
        fps = {1: set(), 2: set()}
        for r in rows:
            fps[r["doc_id"]].add(r["fp"])
        assert fps[1] & fps[2]

    def test_short_docs_and_validation(self, spark):
        import pytest
        df = spark.createDataFrame(
            [(1, "ab"), (2, "abc"), (3, None)],
            "doc_id long, text string",
        )
        rows = textstats.winnow_fingerprints(df, k=3, w=4).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert 1 not in by_doc and 3 not in by_doc  # shorter than k
        assert len(by_doc[2]) == 1 and by_doc[2][0]["pos"] == 1
        with pytest.raises(ValueError, match="winnow"):
            textstats.winnow_fingerprints(df, k=0, w=4)


class TestEncodingFlags:
    def test_counts_and_keep(self, spark):
        rows = [
            (1, "clean text."),
            (2, None),
            (3, "bad � twice �"),
            (4, "bell \x07 and del \x7f but tab \t ok"),
            (5, "mojibake Ã© and â€™"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in
               textstats.encoding_flags(df).collect()}
        assert got[1]["keep"] == 1 and got[2]["keep"] == 1
        assert got[3]["n_replacement"] == 2 and got[3]["keep"] == 0
        assert got[4]["n_control"] == 2 and got[4]["keep"] == 0
        assert got[5]["n_mojibake"] == 2 and got[5]["keep"] == 0
        # tab/LF/CR never count as control
        df2 = spark.createDataFrame(
            [(1, "a\tb\nc\rd")], "doc_id long, text string"
        )
        [r] = textstats.encoding_flags(df2).collect()
        assert r["n_control"] == 0 and r["keep"] == 1


class TestReadability:
    def test_flesch_math(self, spark):
        df = spark.createDataFrame(
            [(1, "The cat sat. It was happy!"), (2, ""), (3, "no period")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in textstats.readability(df).collect()}
        # doc 1: 6 words, 2 sentences, 7 vowel groups
        assert (got[1]["n_words"], got[1]["n_sentences"],
                got[1]["n_syllables"]) == (6, 2, 7)
        assert got[1]["flesch_micro"] == (
            206_835_000 - (1_015_000 * 6) // 2 - (84_600_000 * 7) // 6
        )
        assert 2 in got  # empty text still emits a row
        assert (got[2]["n_words"], got[2]["flesch_micro"]) == (0, 0)
        # sentence floor: no terminal punctuation still scores
        assert got[3]["n_sentences"] == 1


class TestScriptMix:
    def test_mixed_script_doc(self, spark):
        from ilogtail_spark.dataops import textstats
        df = spark.createDataFrame(
            [(1, "Hello 世界 123 Привет!"),
             (2, ""), (3, None)],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: r
               for r in textstats.script_mix(df).collect()}
        r1 = out[1]
        assert r1["n_chars"] == 20
        assert r1["latin_micro"] == 250_000      # 5/20
        assert r1["digit_micro"] == 150_000      # 3/20
        assert r1["space_micro"] == 150_000      # 3/20
        assert r1["cjk_micro"] == 100_000        # 2/20
        assert r1["cyrillic_micro"] == 300_000   # 6/20
        assert r1["other_micro"] == 50_000       # the '!'
        for d in (2, 3):
            assert out[d]["n_chars"] == 0
            assert out[d]["latin_micro"] is None
            assert out[d]["other_micro"] is None

    def test_shares_are_independent_floors(self, spark):
        from ilogtail_spark.dataops import textstats
        # 3 latin / 7 chars: floor-micro, not rounded
        df = spark.createDataFrame(
            [(1, "abc 123")], "doc_id bigint, text string")
        r = textstats.script_mix(df).collect()[0]
        assert r["latin_micro"] == 428_571
        assert r["digit_micro"] == 428_571
        assert r["space_micro"] == 142_857
        assert r["other_micro"] == 0
