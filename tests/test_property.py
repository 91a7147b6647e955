"""Randomized differential tests: the Column-expression engines vs
independent pure-Python oracles over a seeded diverse corpus (one
Spark job per property, row-wise comparison). Catches expression-
semantics drift (regex anchoring, split edge cases, overflow
policies) that hand-picked vectors miss."""

from __future__ import annotations

import random
import re

from ilogtail_spark.plans.pipeline import compile_processors
from tests.helpers import events_df, fields_of

SEED = 20260817


def corpus(n: int = 200) -> list[str]:
    rng = random.Random(SEED)
    alphabet = "ab1|,:\t \"'x."
    out = []
    for i in range(n):
        ln = rng.randint(0, 24)
        out.append("".join(rng.choice(alphabet) for _ in range(ln)))
    # targeted edge shapes
    out += [
        "", "|", "||", "a|", "|a", "a|b|c|d|e", '"a|b"|c', '""|x',
        "k:v", ":v", "k:", "k:v\tx", "\t", "a::b", "1,2,3", ",",
        "a,b,", '"unclosed', "a\nb", " leading", "trailing ",
    ]
    return out


class TestRegexDifferential:
    def test_expr_engine_matches_python_re(self, spark):
        pattern = r"(\w+)[|,](\d+)"
        keys = ["w", "d"]
        rows = [{"content": c} for c in corpus()]
        got = fields_of(
            compile_processors(
                [
                    {
                        "Type": "processor_regex",
                        "Regex": pattern,
                        "Keys": keys,
                        "KeepSource": True,
                    }
                ]
            )(events_df(spark, rows))
        )
        pat = re.compile("(?s)" + pattern)
        for inp, out in zip(corpus(), got):
            m = pat.search(inp)
            expected = {"content": inp}
            if m:
                expected["w"], expected["d"] = m.group(1), m.group(2)
            assert out == expected, f"input={inp!r}"

    def test_full_match_flag(self, spark):
        pattern = r"(\w+),(\d+)"
        rows = [{"content": c} for c in corpus()]
        got = fields_of(
            compile_processors(
                [
                    {
                        "Type": "processor_regex",
                        "Regex": pattern,
                        "Keys": ["w", "d"],
                        "FullMatch": True,
                        "KeepSource": True,
                    }
                ]
            )(events_df(spark, rows))
        )
        pat = re.compile("(?s)" + pattern)
        for inp, out in zip(corpus(), got):
            m = pat.fullmatch(inp)
            expected = {"content": inp}
            if m:
                expected["w"], expected["d"] = m.group(1), m.group(2)
            assert out == expected, f"input={inp!r}"


class TestSplitStringDifferential:
    def test_expr_matches_go_splitn_semantics(self, spark):
        sep, keys = "|", ["a", "b", "c"]
        rows = [{"content": c} for c in corpus()]
        got = fields_of(
            compile_processors(
                [
                    {
                        "Type": "processor_split_string",
                        "SourceKey": "content",
                        "SplitSep": sep,
                        "SplitKeys": keys,
                        "PreserveOthers": True,
                        "KeepSource": False,
                    }
                ]
            )(events_df(spark, rows))
        )
        for inp, out in zip(corpus(), got):
            # Go: strings.SplitN(value, sep, len(keys)+1)
            parts = inp.split(sep)
            head = parts[: len(keys)]
            expected = {}
            for k, v in zip(keys, head):
                expected[k] = v
            if len(parts) > len(keys):
                expected["_split_preserve_"] = sep.join(parts[len(keys):])
            assert out == expected, f"input={inp!r}"


class TestDelimiterDifferential:
    def test_extend_overflow(self, spark):
        sep, keys = ",", ["a", "b"]
        rows = [{"content": c} for c in corpus()]
        got = fields_of(
            compile_processors(
                [
                    {
                        "Type": "processor_parse_delimiter_native",
                        "SourceKey": "content",
                        "Separator": sep,
                        "Keys": keys,
                        "OverflowedFieldsTreatment": "extend",
                        "KeepingSourceWhenParseSucceed": False,
                        "KeepingSourceWhenParseFail": False,
                    }
                ]
            )(events_df(spark, rows))
        )
        for inp, out in zip(corpus(), got):
            parts = inp.split(sep)
            expected = {}
            for k, v in zip(keys, parts):
                expected[k] = v
            for j, v in enumerate(parts[len(keys):]):
                if j >= 16:  # MaxExtendKeys
                    break
                expected[f"__column{len(keys) + j}__"] = v
            assert out == expected, f"input={inp!r}"


class TestKeyValueDifferential:
    def test_matches_reference_loop(self, spark):
        """The pandas stage is exercised through Spark; the oracle is
        a SECOND, independent re-implementation (regex-free split
        walk) of key_value_splitter.go:98-143."""
        rows = [{"content": c} for c in corpus()]
        got = fields_of(
            compile_processors(
                [
                    {
                        "Type": "processor_split_key_value",
                        "SourceKey": "content",
                        "Delimiter": "\t",
                        "Separator": ":",
                        "KeepSource": False,
                    }
                ]
            )(events_df(spark, rows))
        )

        def oracle(content: str) -> dict:
            out: dict = {}
            empty_i = nosep_i = 0
            for pair in content.split("\t"):
                pos = pair.find(":")
                if pos == -1:
                    out[f"no_separator_key_{nosep_i}"] = pair
                    nosep_i += 1
                else:
                    key = pair[:pos] or f"empty_key_{empty_i}"
                    if not pair[:pos]:
                        empty_i += 1
                    out[key] = pair[pos + 1 :]
            return out

        for inp, out in zip(corpus(), got):
            assert out == oracle(inp), f"input={inp!r}"


class TestJaccardDifferential:
    def test_matches_bruteforce(self, spark):
        from ilogtail_spark.dataops import dedup

        rng = random.Random(SEED)
        vocab = ["the", "fox", "dog", "jumps", "spark", "row", "data"]
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 15))))
            for i in range(20)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r["a"], r["b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(df, threshold=0.01).collect()
        }

        def shingles(t: str) -> set:
            w = t.split()
            return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

        for i, (ida, ta) in enumerate(docs):
            for idb, tb in docs[i + 1 :]:
                sa, sb = shingles(ta), shingles(tb)
                inter = len(sa & sb)
                if not sa or not sb or inter == 0:
                    assert (ida, idb) not in got
                    continue
                expected = round(inter / len(sa | sb), 6)
                if expected >= 0.01:
                    assert abs(got[(ida, idb)] - expected) < 1e-9, (ida, idb)


class TestTokenBucketProperty:
    """Documented batch-vs-streaming divergence bound
    (streaming/stream.py token_bucket_admit docstring): in any window
    of T seconds the token bucket admits at most burst + rate*T, so the
    batch operator's per-bucket cap is always an upper bound."""

    def test_window_bound_random_streams(self):
        rng = random.Random(7)
        from ilogtail_spark.streaming.stream import token_bucket_admit

        for trial in range(50):
            rate = rng.choice([0.1, 0.25, 0.5, 1.0, 2.0])
            burst = rng.randint(1, 5)
            # bursty arrivals: clusters + gaps
            t, times = 0.0, []
            for _ in range(rng.randint(1, 200)):
                t += rng.choice([0.01, 0.1, 0.5, 2.0, 30.0]) * rng.random()
                times.append(t)
            flags, _, _ = token_bucket_admit(times, rate, burst)
            admitted = [t for t, f in zip(times, flags) if f]
            for T in (1.0, 10.0, 60.0):
                cap = burst + rate * T + 1e-9
                for i, start in enumerate(admitted):
                    in_win = sum(1 for x in admitted[i:] if x < start + T)
                    assert in_win <= cap, (trial, rate, burst, T, in_win)

    def test_batch_cap_upper_bounds_streaming(self):
        """Same stream through the batch bucket-cap analog: per minute
        bucket, batch admits min(n, L); with L = burst + 60*rate the
        streaming admissions per bucket never exceed the batch cap."""
        rng = random.Random(11)
        from ilogtail_spark.streaming.stream import token_bucket_admit

        rate, burst = 0.25, 3
        L = burst + int(60 * rate)
        t, times = 0.0, []
        for _ in range(500):
            t += rng.choice([0.05, 0.3, 1.5, 20.0]) * rng.random()
            times.append(t)
        flags, _, _ = token_bucket_admit(times, rate, burst)
        buckets: dict[int, int] = {}
        for x, f in zip(times, flags):
            if f:
                b = int(x // 60)
                buckets[b] = buckets.get(b, 0) + 1
        assert all(n <= L for n in buckets.values())

    def test_state_carry_across_batches(self):
        """Splitting a stream into micro-batches with carried state is
        identical to one pass — exactly the stateful operator's resume
        contract."""
        from ilogtail_spark.streaming.stream import token_bucket_admit

        rng = random.Random(3)
        t, times = 0.0, []
        for _ in range(300):
            t += rng.random()
            times.append(t)
        one, _, _ = token_bucket_admit(times, 0.5, 2)
        split, tokens, last = [], None, None
        for i in range(0, len(times), 37):
            f, tokens, last = token_bucket_admit(
                times[i : i + 37], 0.5, 2, tokens, last
            )
            split.extend(f)
        assert one == split


class TestSPLDifferential:
    """Randomized differential: SPL where/extend over random field
    data must agree with the equivalent hand-built DataFrame ops."""

    def test_rewrite_roundtrip_random_exprs(self):
        """Random well-formed comparison expressions: the rewriter must
        wrap exactly the bare identifiers, never literals/keywords."""
        from ilogtail_spark.operators.spl import rewrite_field_refs

        rng = random.Random(23)
        fields = ["status", "ms", "route_2", "k"]
        for _ in range(300):
            f1 = rng.choice(fields)
            lit = rng.choice(["'a b'", "42", "1e3", "0xFF", "1.5", "'x|y'"])
            op = rng.choice(["=", ">", "<=", "<>", "like", "rlike"])
            expr = f"{f1} {op} {lit}"
            out = rewrite_field_refs(expr)
            assert out == f"fields['{f1}'] {op} {lit}", (expr, out)

    def test_where_differential_against_filter(self, spark):
        from ilogtail_spark.plans.pipeline import compile_processors
        from tests.helpers import events_df, fields_of

        rng = random.Random(31)
        rows = [
            {"content": f"r{i}", "st": str(rng.randint(0, 5)), "ms": str(rng.randint(0, 99))}
            for i in range(60)
        ]
        df = events_df(spark, rows)
        for _ in range(5):
            st = rng.randint(0, 5)
            ms = rng.randint(0, 99)
            script = f"* | where st = '{st}' and cast(ms as int) > {ms}"
            got = fields_of(
                compile_processors([{"Type": "processor_spl", "Script": script}])(df)
            )
            want = [r for r in rows if r["st"] == str(st) and int(r["ms"]) > ms]
            assert sorted((r["content"] for r in got)) == sorted(
                (r["content"] for r in want)
            ), script

    def test_unsupported_commands_fail_cleanly(self):
        import pytest

        from ilogtail_spark.operators.spl import SPLCompileError, compile_spl

        rng = random.Random(5)
        for _ in range(20):
            junk = "".join(rng.choice("abcdefgh -|,") for _ in range(18))
            script = "* | " + junk
            try:
                compile_spl(script)
            except SPLCompileError:
                pass  # clean, typed failure — never a crash elsewhere
            except ValueError:
                pass  # limit/int parse errors are also clean


class TestTextOpsDifferential:
    def test_unquote_roundtrip(self, spark):
        """escape(s) -> unquote == s for random strings including
        backslashes, quotes, control chars and NUL bytes (one Spark
        job over the whole corpus)."""
        rng = random.Random(SEED + 1)
        alphabet = 'ab\\"\n\t\r\x00 xy'
        originals = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 20)))
            for _ in range(120)
        ]

        def escape(s: str) -> str:
            body = (
                s.replace("\\", "\\\\")
                .replace('"', '\\"')
                .replace("\n", "\\n")
                .replace("\t", "\\t")
                .replace("\r", "\\r")
            )
            return f'"{body}"'

        rows = [{"v": escape(s)} for s in originals]
        got = fields_of(
            compile_processors(
                [
                    {
                        "Type": "processor_string_replace",
                        "SourceKey": "v",
                        "Method": "unquote",
                    }
                ]
            )(events_df(spark, rows))
        )
        for orig, out in zip(originals, got):
            assert out["v"] == orig, f"original={orig!r}"

    def test_repetition_stats_differential(self, spark):
        from ilogtail_spark.dataops import textstats

        rng = random.Random(SEED + 2)
        words = ["aa", "bb", "cc", "dd"]
        docs = []
        for i in range(60):
            n_lines = rng.randint(1, 5)
            lines = [
                " ".join(rng.choice(words) for _ in range(rng.randint(0, 6)))
                for _ in range(n_lines)
            ]
            docs.append((i, "\n".join(lines)))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r["doc_id"]: r for r in textstats.repetition_stats(df).collect()}
        for i, text in docs:
            lines = [x for x in text.split("\n") if x != ""]
            toks = [t for t in re.split(r"\s+", text) if t != ""]
            bis = [
                f"{toks[j]} {toks[j + 1]}" for j in range(len(toks) - 1)
            ] if len(toks) >= 2 else []
            nl, dl = len(lines), len(set(lines))
            nb, db = len(bis), len(set(bis))
            topb = max((bis.count(b) for b in set(bis)), default=0)
            r = got[i]
            assert r["dup_line_frac_micro"] == (nl - dl) * 1_000_000 // max(nl, 1)
            assert r["top_bigram_frac_micro"] == topb * 1_000_000 // max(nb, 1)
            assert r["dup_bigram_frac_micro"] == (nb - db) * 1_000_000 // max(nb, 1)

    def test_drop_boilerplate_differential(self, spark):
        from ilogtail_spark.dataops import textstats

        rng = random.Random(SEED + 3)
        common = ["banner one", "banner two"]
        docs = []
        for i in range(50):
            lines = []
            for _ in range(rng.randint(1, 6)):
                if rng.random() < 0.4:
                    lines.append(rng.choice(common))
                else:
                    lines.append(f"unique {i} {rng.randint(0, 9)}")
            docs.append((i, "\n".join(lines)))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        max_df = 5
        got = {
            r["doc_id"]: r["text"]
            for r in textstats.drop_boilerplate_lines(df, max_line_df=max_df).collect()
        }
        # python oracle: line df over distinct (doc, line), then filter
        from collections import Counter

        dfc: Counter = Counter()
        for _, text in docs:
            for ln in {x for x in text.split("\n") if len(x) >= 1}:
                dfc[ln] += 1
        hot = {ln for ln, c in dfc.items() if c > max_df}
        for i, text in docs:
            want = "\n".join(
                x for x in text.split("\n") if not (len(x) >= 1 and x in hot)
            )
            assert got[i] == want, (i, text)

    def test_vocab_topk_differential(self, spark):
        from collections import Counter

        from ilogtail_spark.dataops import textstats

        rng = random.Random(SEED + 4)
        words = ["w%d" % k for k in range(12)]
        docs = [
            (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 15))))
            for i in range(40)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = [tuple(r) for r in textstats.vocab_topk(df, k=8).collect()]
        tc: Counter = Counter()
        dc: Counter = Counter()
        for _, text in docs:
            toks = [t for t in text.split() if t]
            tc.update(toks)
            dc.update(set(toks))
        want = sorted(
            ((t, tc[t], dc[t]) for t in tc), key=lambda x: (-x[1], x[0])
        )[:8]
        assert got == want


class TestChunkWindowsDifferential:
    def test_chunks_match_python_oracle_and_cover_all_tokens(self, spark):
        """Randomized corpora: every chunk row matches a pure-Python
        re-derivation (starts, sizes, digests), and the window set
        covers every token index at least once."""
        import hashlib

        from ilogtail_spark.dataops import corpus as corpus_ops

        rng = random.Random(SEED + 1)
        rows = []
        for i in range(150):
            n = rng.randint(0, 40)
            words = [f"w{rng.randint(0, 30)}" for _ in range(n)]
            # inject irregular whitespace shapes
            sep = rng.choice([" ", "  ", " \t ", "\n"])
            rows.append((i, sep.join(words)))
        rows += [(900, ""), (901, None), (902, "solo"), (903, " x  y \n z ")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for window, stride in ((5, 3), (8, 8), (3, 7)):
            got = {}
            for r in corpus_ops.chunk_windows(df, window, stride).collect():
                got.setdefault(r["doc_id"], []).append(
                    (r["chunk_idx"], r["start_tok"], r["n_tokens"], r["chunk_md5"])
                )
            for doc_id, text in rows:
                toks = text.split() if text else []
                exp = []
                for idx, s in enumerate(range(0, len(toks), stride)):
                    piece = toks[s : s + window]
                    exp.append(
                        (idx, s, len(piece),
                         hashlib.md5(" ".join(piece).encode()).hexdigest())
                    )
                assert sorted(got.get(doc_id, [])) == exp, (doc_id, window, stride)
                if stride <= window:
                    # full coverage holds only for overlapping/tiling
                    # strides; stride > window is the SAMPLED-windows
                    # mode and leaves gaps by design
                    covered = set()
                    for _, s, k, _h in exp:
                        covered.update(range(s, s + k))
                    assert covered == set(range(len(toks)))


class TestNormalizeProperties:
    def test_idempotent_and_python_differential(self, spark):
        # normalize(normalize(x)) == normalize(x) — the confluence
        # property that makes normalized digests stable across
        # re-ingestion; differential vs an independent python oracle
        import re as _re

        from pyspark.sql import functions as F

        from ilogtail_spark.dataops.dedup import normalize_expr

        rows = [(i, s) for i, s in enumerate(corpus())] + [
            (1000, "Hello,  WORLD!!"),
            (1001, "«Собака» — и кошка…"),
            (1002, "tabs\tand\nnewlines  here"),
        ]
        df = spark.createDataFrame(rows, "i long, t string")
        once = df.select("i", normalize_expr(F.col("t")).alias("n1"))
        twice = once.select(
            "i", "n1", normalize_expr(F.col("n1")).alias("n2")
        )
        got = {r["i"]: (r["n1"], r["n2"]) for r in twice.collect()}
        pat = _re.compile(r"[^\w]+|_+", _re.UNICODE)  # \w minus _ ~ \p{L}\p{N}
        for i, s in rows:
            n1, n2 = got[i]
            assert n1 == n2, f"not idempotent on {s!r}"
            expected = pat.sub(" ", s.lower()).strip()
            # collapse runs the python side may have left (sub of
            # adjacent matches already yields single spaces, but
            # boundary-adjacent matches can stack)
            expected = _re.sub(r" +", " ", expected)
            assert n1 == expected, f"mismatch on {s!r}: {n1!r} vs {expected!r}"


class TestSplitExprProperties:
    def test_total_coverage_and_rates(self, spark):
        # every row gets exactly one split, and realized rates track
        # the micro shares (law of large numbers at 20k draws)
        from pyspark.sql import functions as F

        from ilogtail_spark.dataops import corpus as corpus_ops

        splits = {"train": 800_000, "val": 150_000, "test": 50_000}
        ids = spark.range(0, 20_000).withColumnRenamed("id", "doc_id")
        out = corpus_ops.assign_splits(ids, splits)
        counts = {
            r["split"]: r["n"]
            for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        assert sum(counts.values()) == 20_000
        assert set(counts) == {"train", "val", "test"}
        for name, share in splits.items():
            rate = counts[name] / 20_000
            assert abs(rate - share / 1e6) < 0.02, (name, rate)


class TestChainPartitioningInvariance:
    def test_tool_chains_partition_independent(self, spark):
        from ilogtail_spark.dataops import conversations

        rng = random.Random(SEED)
        rows = []
        for c in range(60):
            for i in range(rng.randint(0, 8)):
                rows.append(
                    (f"c{c}", i, "tool", f"t{rng.randint(0, 4)}")
                )
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, tool string"
        )
        a = sorted(
            tuple(r)
            for r in conversations.tool_chains(df.repartition(2)).collect()
        )
        b = sorted(
            tuple(r)
            for r in conversations.tool_chains(df.repartition(17)).collect()
        )
        assert a == b
