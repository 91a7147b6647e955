"""Text analysis: token counting, quality scoring, language ID,
document fingerprinting. All pure Column expressions — scan-side,
codegen'd, zero Python in the hot path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.dataops.dedup import shingles_from_tokens, tokens_col

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
]

# a BPE-ish subword token proxy: runs of letters, runs of digits, or a
# single non-alnum non-space char each count as one token
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_bpe_tokens, avg_token_len)."""
    toks = tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    n_bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0))
    total_len = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(total_len / F.greatest(n_tok, F.lit(1)), 6).alias("avg_token_len"),
    )


def vocab_topk(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    lowercase: bool = True,
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary statistics: the top-k terms by total count
    with document frequency — the first thing a tokenizer/quality
    audit asks of a new training corpus.

    Scale shape: ONE corpus scan and tokenization (the previous form
    scanned and tokenized twice). The tokens explode once with the
    row's id; a first hash aggregate on (term, id) collapses per-doc
    counts map-side — its exchange carries one row per DISTINCT
    (term, doc) — and a second aggregate on (term) sums counts and
    row-counts document frequency over the already-tiny first output.
    The final top-k is a global ORDER BY LIMIT k, which Spark
    executes as per-partition top-k + driver merge of k rows
    (TakeOrderedAndProject), not a full sort. Ties break
    lexicographically so the result is deterministic on any engine.
    """
    t = F.col(text_col)
    toks = tokens_col(F.lower(t) if lowercase else t)
    id_expr = (
        F.col("doc_id") if "doc_id" in df.columns
        else F.monotonically_increasing_id()
    )
    per_doc = (
        df.select(id_expr.alias("__id__"), F.explode(toks).alias("term"))
        .groupBy("term", "__id__")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per_doc.groupBy("term")
        .agg(
            F.sum("n").cast("long").alias("term_count"),
            F.count(F.lit(1)).alias("doc_freq"),
        )
        .filter(F.col("term_count") >= min_count)
        .orderBy(F.col("term_count").desc(), F.col("term").asc())
        .limit(k)
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition signals (the filters
    that catch boilerplate/spam pages a dedup pass misses because the
    repetition is INSIDE one document):

    * ``dup_line_frac_micro``  — fraction of newline-separated lines
      that are duplicates of an earlier line;
    * ``top_bigram_frac_micro`` — fraction of all word bigrams taken
      by the single most frequent bigram;
    * ``dup_bigram_frac_micro`` — fraction of bigram occurrences that
      are repeats (1 - distinct/total).

    All three are floor fixed-point micro integers (same rationale as
    quality_score: bit-identical across engines, no float-tie drift).
    Pure scan-side expressions over the token/line arrays — zero
    shuffle, zero Python. NULL text counts as empty (all three stats
    0), matching the explicit NULL guards in gopher_flags /
    quality_score / mixture_report — extraction-failure NULL rows get
    flags, not NULLs."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    mega = F.lit(1_000_000).cast("long")
    feat = df.select(
        F.col(id_col),
        F.filter(F.split(t, r"\n"), lambda x: x != "").alias("__lines__"),
        tokens_col(t).alias("__toks__"),
    )
    feat = feat.select(
        F.col(id_col),
        F.size("__lines__").alias("__nl__"),
        F.size(F.array_distinct(F.col("__lines__"))).alias("__dl__"),
        shingles_from_tokens(F.col("__toks__"), 2).alias("__bi__"),
    )
    # most frequent bigram's count via sort + longest-equal-run fold:
    # O(n log n) per doc, NOT the O(distinct x total) nested scan a
    # per-distinct count would cost on long documents
    run_best = F.aggregate(
        F.array_sort(F.col("__bi__")),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    feat = feat.select(
        F.col(id_col),
        F.col("__nl__"),
        F.col("__dl__"),
        F.size("__bi__").alias("__nb__"),
        F.size(F.array_distinct(F.col("__bi__"))).alias("__db__"),
        run_best.alias("__topb__"),
    )
    dup_line = F.floor(
        (F.col("__nl__") - F.col("__dl__")) * mega / F.greatest(F.col("__nl__"), F.lit(1))
    )
    top_bi = F.floor(
        F.coalesce(F.col("__topb__"), F.lit(0)) * mega
        / F.greatest(F.col("__nb__"), F.lit(1))
    )
    dup_bi = F.floor(
        (F.col("__nb__") - F.col("__db__")) * mega / F.greatest(F.col("__nb__"), F.lit(1))
    )
    return feat.select(
        F.col(id_col),
        dup_line.cast("long").alias("dup_line_frac_micro"),
        top_bi.cast("long").alias("top_bigram_frac_micro"),
        dup_bi.cast("long").alias("dup_bigram_frac_micro"),
    )


def drop_boilerplate_lines(
    df: DataFrame,
    max_line_df: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 1,
) -> DataFrame:
    """C4-style corpus-level boilerplate line removal: a line occurring
    in MORE than ``max_line_df`` distinct documents (cookie banners,
    nav text, license footers) is deleted from every document; the
    per-document line order of the survivors is preserved. Lines
    shorter than ``min_chars`` are kept as-is (they carry format, not
    boilerplate). Returns (id, text) with the rebuilt text.

    Scale shape: lines explode scan-side with their position; the
    document-frequency aggregate shuffles (line-digest) pairs —
    16-byte digests, never documents — and the hot-line set joins back
    as a left_anti (AQE broadcasts it when small, which it is: only
    lines with df > threshold). Reassembly is one groupBy(id) of
    (pos, line) structs with array_sort inside the aggregate, so the
    rebuild is order-stable under any partitioning."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("__pos__", "__line__"),
    )
    eligible = lines.filter(F.length("__line__") >= min_chars).select(
        F.col(id_col), F.md5(F.col("__line__")).alias("__lh__")
    )
    hot = (
        eligible.distinct()
        .groupBy("__lh__")
        .agg(F.count(F.lit(1)).alias("__df__"))
        .filter(F.col("__df__") > max_line_df)
        .select("__lh__")
    )
    kept = lines.join(
        hot,
        (F.md5(F.col("__line__")) == F.col("__lh__"))
        & (F.length("__line__") >= min_chars),
        "left_anti",
    )
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("__pos__"), F.col("__line__"))
                        )
                    ),
                    lambda s: s["__line__"],
                ),
                "\n",
            ).alias(text_col)
        )
    )
    # docs whose every line was boilerplate keep an empty text row
    return df.select(id_col).join(rebuilt, id_col, "left").select(
        F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: bool = False,
) -> DataFrame:
    """Heuristic quality features + a composite score, length band,
    punctuation ratio, stopword ratio, repetition (distinct/total
    tokens) — the shape of a C4/Gopher-style quality filter, kept
    deterministic and engine-portable.

    The composite is emitted in FIXED POINT (micro-units, BIGINT
    ``quality_score_micro`` in [0, 1_000_000]): a float weighted sum
    can land on a decimal .5 tie where Spark's HALF_UP round and
    DuckDB/IEEE double rounding disagree by 1 ulp. All micro ratios
    are floor(num * 1e6 / den) — exact in binary doubles for any
    realistic doc length — and the /4 weights are powers of two, so
    every engine computes bit-identical integers.

    ``passthrough=True`` keeps every input column alongside the four
    outputs plus ``n_tokens`` (already computed for the ratios) — the
    filter-in-a-pipeline form: downstream can apply
    ``quality_score_micro >= thr`` as a scan-side predicate with no
    join back to the corpus (the features remain one projection)."""
    t = F.col(text_col)
    toks = tokens_col(t)
    lead: list[Column] = (
        [df[c] for c in df.columns] if passthrough else [F.col(id_col)]
    )
    # materialize the expensive counters ONCE: each feeds both a ratio
    # and a micro column, and inlined they'd run twice per row (the
    # regexp_replace + the stopword filter + array_distinct dominate)
    feat = df.select(
        *lead,
        F.length(t).alias("__n__"),
        F.size(toks).alias("__ntok__"),
        F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", "")).alias("__punct__"),
        F.size(F.filter(toks, lambda x: F.lower(x).isin(EN_STOPWORDS))).alias(
            "__stop__"
        ),
        F.size(F.array_distinct(toks)).alias("__dist__"),
    )
    n = F.col("__n__")
    n_tok = F.col("__ntok__")
    punct = F.col("__punct__")
    stop_hits = F.col("__stop__")
    n_distinct = F.col("__dist__")
    mega = F.lit(1_000_000).cast("long")  # long: int*int would overflow at ~2k chars
    punct_micro = F.floor(punct * mega / F.greatest(n, F.lit(1)))
    stop_micro = F.floor(stop_hits * mega / F.greatest(n_tok, F.lit(1)))
    distinct_micro = F.floor(n_distinct * mega / F.greatest(n_tok, F.lit(1)))
    len_part = F.when((n >= 50) & (n <= 10000), F.lit(250_000)).otherwise(F.lit(0))
    punct_part = F.when(punct_micro <= 200_000, F.lit(250_000)).otherwise(F.lit(0))
    stop_part = F.floor(F.least(stop_micro * 10, F.lit(1_000_000)) / 4)
    distinct_part = F.floor(distinct_micro / 4)
    score_micro = (len_part + punct_part + stop_part + distinct_part).cast("long")
    out_lead = df.columns if passthrough else [id_col]
    # passthrough mode also exposes the token count already computed
    # for the ratios — downstream report stages would otherwise run
    # the tokenizer (the dominant cost here) a second time per doc
    extra = (
        [n_tok.cast("bigint").alias("n_tokens")] if passthrough else []
    )
    return feat.select(
        *[F.col(c) for c in out_lead],
        *extra,
        F.round(punct / F.greatest(n, F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_tok, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(n_distinct / F.greatest(n_tok, F.lit(1)), 6).alias("distinct_ratio"),
        score_micro.alias("quality_score_micro"),
    )


# Marker function words per Latin-script language — short, frequent,
# and distinctive enough that argmax over hit counts separates these
# languages reliably on sentence-sized text. Order matters: it is the
# deterministic argmax tie-break (first listed wins).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "for", "with", "was", "this"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "von", "zu", "den"],
    "fr": ["le", "les", "est", "dans", "pour", "que", "une", "des", "du", "pas", "sur", "avec"],
    "es": ["el", "los", "las", "es", "por", "para", "una", "del", "se", "como", "pero", "más"],
    "pt": ["os", "as", "um", "uma", "não", "para", "do", "da", "dos", "com", "mais", "ser"],
}

# Non-Latin scripts are identified by character-block ratio (integer
# arithmetic: count*100 >= pct*len, bit-identical on any engine).
# Kana is checked BEFORE Han: Japanese text mixes both, so any
# meaningful kana presence outvotes the Han block.
SCRIPT_RANGES: list[tuple[str, str, int]] = [
    ("ja", "぀-ヿ", 15),  # hiragana + katakana
    ("zh", "一-鿿", 30),  # CJK unified ideographs
    ("ko", "가-힯", 30),  # hangul syllables
    ("ru", "Ѐ-ӿ", 30),  # cyrillic
    ("ar", "؀-ۿ", 30),  # arabic
]

# minimum marker hits for a Latin-language call; below it -> 'unknown'
LANG_MIN_HITS = 2


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Multi-language heuristic ID -> 'en'|'de'|'fr'|'es'|'pt'|'zh'|
    'ja'|'ko'|'ru'|'ar'|'unknown'.

    Two expression-only signals, zero Python, zero shuffle:
    1. script-block character ratios for the non-Latin scripts
       (checked first, kana before Han);
    2. marker-function-word hit counts per Latin language, argmax
       with the greatest>=compare chain in LANG_MARKERS order, gated
       by LANG_MIN_HITS.

    All comparisons are integer (count*100 vs pct*len; hit counts),
    so the DuckDB oracle reproduces every decision bit-identically.
    A fastText-style trained model is the production swap-in; the
    operator contract — a deterministic per-doc label usable as a
    filter/groupBy key — is identical."""
    t = F.col(text_col)
    # materialize tokens + per-signal counters once (CollapseProject
    # will not inline a multiply-referenced non-cheap expression)
    feat = df.select(
        F.col(id_col),
        F.length(t).alias("__nch__"),
        F.transform(tokens_col(t), lambda x: F.lower(x)).alias("__w__"),
        *[
            F.size(F.regexp_extract_all(t, F.lit(f"[{rng}]"), 0)).alias(
                f"__sc_{lang}__"
            )
            for lang, rng, _ in SCRIPT_RANGES
        ],
    )
    def _marker_hits(words: list[str]) -> Column:
        # NB: the predicate must be a ONE-argument lambda — pyspark
        # reads a second parameter (even a defaulted one) as a request
        # for the element-index column
        return F.size(F.filter(F.col("__w__"), lambda x: x.isin(words)))

    feat = feat.select(
        F.col(id_col),
        F.col("__nch__"),
        *[F.col(f"__sc_{lang}__") for lang, _, _ in SCRIPT_RANGES],
        *[
            _marker_hits(words).alias(f"__s_{lang}__")
            for lang, words in LANG_MARKERS.items()
        ],
    )
    best = F.greatest(*[F.col(f"__s_{lang}__") for lang in LANG_MARKERS])
    latin = F.lit("unknown")
    for lang in reversed(list(LANG_MARKERS)):  # first listed wins ties
        latin = F.when(F.col(f"__s_{lang}__") == best, F.lit(lang)).otherwise(latin)
    pred = F.when(best >= LANG_MIN_HITS, latin).otherwise(F.lit("unknown"))
    for lang, _, pct in reversed(SCRIPT_RANGES):  # scripts outrank markers
        pred = F.when(
            F.col(f"__sc_{lang}__") * 100
            >= pct * F.greatest(F.col("__nch__"), F.lit(1)),
            F.lit(lang),
        ).otherwise(pred)
    return feat.select(F.col(id_col), pred.alias("lang_pred"))


def lang_id_oracle_sql(table: str = "documents", text_expr: str = "text") -> str:
    """DuckDB SQL mirroring :func:`lang_id` decision-for-decision —
    generated from the SAME marker/script tables so the two engines
    cannot drift."""

    def sql_quote(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    marker_counts = ",\n             ".join(
        f"len(list_filter(w, x -> x IN ({', '.join(sql_quote(m) for m in words)})))"
        f" AS s_{lang}"
        for lang, words in LANG_MARKERS.items()
    )
    script_counts = ",\n             ".join(
        f"len(regexp_extract_all(t, '[{rng}]')) AS sc_{lang}"
        for lang, rng, _ in SCRIPT_RANGES
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_MARKERS) + ")"
    latin_chain = " ".join(
        f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in LANG_MARKERS
    )
    script_chain = " ".join(
        f"WHEN sc_{lang} * 100 >= {pct} * greatest(nch, 1) THEN '{lang}'"
        for lang, _, pct in SCRIPT_RANGES
    )
    return f"""
    WITH src AS (
      SELECT doc_id, {text_expr} AS t FROM {table}
    ), feat AS (
      SELECT doc_id,
             length(t) AS nch,
             {script_counts},
             list_transform(
               list_filter(string_split_regex(t, '\\s+'), x -> x <> ''),
               x -> lower(x)) AS w,
             t
      FROM src
    ), scored AS (
      SELECT doc_id, nch,
             {", ".join(f"sc_{lang}" for lang, _, _ in SCRIPT_RANGES)},
             {marker_counts}
      FROM feat
    )
    SELECT doc_id,
           CASE {script_chain}
                WHEN {best} >= {LANG_MIN_HITS} THEN (CASE {latin_chain} END)
                ELSE 'unknown' END AS lang_pred
    FROM scored
    """


# PII surface patterns — deliberately simple, engine-portable regexes
# (the operator contract is the per-doc flag columns; a production
# deployment swaps in its compliance team's pattern pack)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"(?:\+?[0-9]{1,3}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"
SSN_RE = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
IP_RE = r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}"


def pii_count_cols(t: Column) -> tuple[Column, Column, Column, Column]:
    """(emails, phones, ssns, ips) match-count Columns over a text
    Column — the ONE builder both the per-doc ``pii_flags`` and the
    per-conversation ``conversations.conversation_pii_report`` compile,
    so swapping the pattern pack (or the extraction expression) can
    never desynchronize the two reports."""

    def n(pattern: str) -> Column:
        return F.size(F.regexp_extract_all(t, F.lit(pattern), 0))

    return n(EMAIL_RE), n(PHONE_RE), n(SSN_RE), n(IP_RE)


def pii_flags(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc PII indicators for training-data filtering: counts of
    email / phone / SSN-shaped / IP-shaped matches plus an aggregate
    ``has_pii`` flag. Pure scan-side expressions (one regexp pass per
    pattern); pairs with processor_desensitize for the redaction side
    of the same policy."""
    emails, phones, ssns, ips = pii_count_cols(F.col(text_col))
    return df.select(
        F.col(id_col),
        emails.alias("n_emails"),
        phones.alias("n_phones"),
        ssns.alias("n_ssns"),
        ips.alias("n_ips"),
        ((emails + phones + ssns + ips) > 0).cast("int").alias("has_pii"),
    )


# (pattern, placeholder) in APPLICATION ORDER — email first (it
# contains dot-runs an IP pattern could later chew on), then the
# dash-shaped numbers from most to least specific, IPs last. The
# placeholders contain no digits or '@', so a later pattern can never
# match inside an earlier replacement.
PII_REDACTIONS: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (SSN_RE, "<SSN>"),
    (PHONE_RE, "<PHONE>"),
    (IP_RE, "<IP>"),
]


def pii_redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact PII in place — the rewrite side of the policy whose
    detection side is :func:`pii_flags` (and whose event-pipeline
    twin is processor_desensitize, reference
    plugins/processor/desensitize/processor_desensitize.go): emails,
    SSN-shaped and phone-shaped numbers, and IPv4 literals become
    typed placeholders, applied as a fixed chain of global
    regexp_replace passes (order documented on PII_REDACTIONS).

    Returns (id, text, n_redacted) with ``text_col`` REPLACED by the
    redacted form; ``n_redacted`` counts pattern matches on the
    ORIGINAL text (pre-redaction, same expressions as pii_flags), so
    flag-then-redact pipelines see consistent numbers. Pure scan-side
    expressions — four regexp passes inside WholeStageCodegen, no
    Python, no shuffle; at 100 TB this is a free rider on whatever
    scan already reads the text."""
    t = F.col(text_col)
    red = t
    n_total: Column = F.lit(0)
    for pattern, placeholder in PII_REDACTIONS:
        n_total = n_total + F.size(F.regexp_extract_all(t, F.lit(pattern), 0))
        red = F.regexp_replace(red, pattern, placeholder)
    others = [c for c in df.columns if c not in (id_col, text_col)]
    return df.select(
        F.col(id_col),
        red.alias(text_col),
        n_total.cast("bigint").alias("n_redacted"),
        *others,
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical-form fingerprint (the classic key-collision method):
    md5 of the sorted distinct lowercase tokens. Word-order- and
    duplication-insensitive near-dup key; one expression, groupable."""
    toks = tokens_col(F.lower(F.col(text_col)))
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return df.select(F.col(id_col), F.md5(canon).alias("fingerprint"))


def unigram_lm_scores(
    df: DataFrame,
    ref: DataFrame | None = None,
    vocab_size: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unigram language-model scoring — the CCNet-style "perplexity
    under a reference-domain LM" quality signal (Wenzek et al. 2020
    use a 5-gram KenLM; the unigram form keeps the same contract —
    score every document by how surprising its tokens are under a
    model fit on ``ref`` — while staying exactly computable in any
    engine). Documents scoring far above the corpus-typical
    cross-entropy are gibberish/boilerplate candidates; far below are
    degenerate repetition. Feed ``ce_micro`` into
    ``corpus.quality_tiered_sample`` tiers for the actual filtering.

    Model: the top-``vocab_size`` lowercased whitespace tokens of
    ``ref`` (count desc, token asc — deterministic ties) form the
    vocabulary; everything else is one OOV class. Add-one smoothing
    over the V+1 classes:

        p(t in vocab) = (c(t) + 1) / (T + V + 1)
        p(OOV)        = (T − Σ_vocab c + 1) / (T + V + 1)

    Returns (id, n_tokens, n_oov, sum_cost_micro, ce_micro): per-token
    costs −ln p quantized to integer micro-nats BEFORE the document
    summation (the importance_scores trick), so doc scores are integer
    sums with no float addition-order divergence; ``ce_micro`` =
    floor(sum/n) is the per-token cross-entropy. Zero-token documents
    return all zeros.

    Scale shape at 100 TB: ``ref`` is a domain sample (small by
    definition) but even a corpus-sized ref costs one token hash
    aggregate; the vocab is top-V via TakeOrderedAndProject (per-
    partition top-V + driver merge of V rows, never a full sort), and
    the weight table is ≤ V rows — broadcast into the scoring join,
    so hot stopword tokens hit a broadcast hash join (no shuffle-join
    skew on "the"). The corpus side explodes once and its only
    exchange is the per-id (int, int) partial aggregate. The LM
    totals (T, V, Σ_vocab c) are TWO driver-side rows — same
    tiny-aggregate collect as the IVF centroids — folded into literal
    cost expressions, so the smoothing denominators are constants
    after codegen (the vstat/tot self-join a pure-DataFrame form
    would need trips the analyzer's ambiguity check anyway).
    """
    ref = ref if ref is not None else df
    cnt = (
        ref.select(F.explode(tokens_col(F.lower(F.col(text_col)))).alias("__t__"))
        .groupBy("__t__")
        .agg(F.count(F.lit(1)).alias("__c__"))
    )
    cnt = cnt.localCheckpoint(eager=False)  # one ref scan for vocab AND totals
    vocab = cnt.orderBy(F.col("__c__").desc(), F.col("__t__").asc()).limit(
        vocab_size
    )
    t_total = cnt.agg(F.coalesce(F.sum("__c__"), F.lit(0))).collect()[0][0]
    v_count, v_sum = vocab.agg(
        F.count(F.lit(1)), F.coalesce(F.sum("__c__"), F.lit(0))
    ).collect()[0]
    denom = float(t_total + v_count + 1)
    import math

    oov_cost = int(
        math.floor(-math.log((t_total - v_sum + 1) / denom) * 1_000_000)
    )
    weights = vocab.select(
        "__t__",
        F.floor(-F.log((F.col("__c__") + F.lit(1.0)) / F.lit(denom)) * 1_000_000)
        .cast("bigint")
        .alias("__w__"),
    )
    toks = df.select(
        F.col(id_col),
        F.explode_outer(tokens_col(F.lower(F.col(text_col)))).alias("__t__"),
    )
    scored = (
        toks.join(F.broadcast(weights), "__t__", "left")
        .groupBy(id_col)
        .agg(
            F.count("__t__").alias("n_tokens"),
            F.sum(
                F.when(F.col("__t__").isNotNull() & F.col("__w__").isNull(), 1)
                .otherwise(0)
            ).cast("bigint").alias("n_oov"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("__t__").isNotNull(),
                        F.coalesce(F.col("__w__"), F.lit(oov_cost)),
                    )
                ),
                F.lit(0),
            ).cast("bigint").alias("sum_cost_micro"),
        )
    )
    return scored.select(
        F.col(id_col),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "n_oov",
        "sum_cost_micro",
        F.floor(
            F.col("sum_cost_micro") / F.greatest(F.col("n_tokens"), F.lit(1))
        ).cast("bigint").alias("ce_micro"),
    )


# The word-level rule set from Gopher (Rae et al. 2021, table A1) —
# the line/repetition rules of the same table live in
# ``repetition_stats`` / ``drop_boilerplate_lines``; join the three
# outputs on the id to apply the full battery.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_symbol_pct: int = 10,
    min_alpha_pct: int = 80,
    min_stop_hits: int = 2,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Gopher-style word-level quality rules as one scan-side pass:
    per document, a 0/1 flag per fired rule plus the composite
    ``keep``. Every ratio threshold is evaluated by INTEGER
    cross-multiplication (``100 * n_alpha < pct * n_words``) — no
    division, no floats, so any engine computes identical flags and
    the rule battery stays inside whole-stage codegen.

    Rules: token-count band, mean-word-length band (via total word
    chars vs bounds x n), symbol-to-word ratio (`#` and `...`),
    alphabetic-word fraction, and distinct-stopword minimum.

    Scale shape: pure expressions over one scan — zero shuffles, no
    Python; compose with ``repetition_stats`` (its own single-shuffle
    aggregate) for the full Gopher battery.
    """
    stopwords = stopwords or GOPHER_STOPWORDS
    # NULL text counts as empty (flags must be 0/1, never NULL) —
    # same guard as quality_score/mixture_report, mirrored in oracles
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens_col(t)
    stop_arr = F.array(*[F.lit(w) for w in stopwords])
    feat = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("__nw__"),
        F.coalesce(
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
            ),
            F.lit(0).cast("long"),
        ).alias("__wlen__"),
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
        .cast("long")
        .alias("__alpha__"),
        (
            (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit(""))))
            + F.floor(
                (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit(""))))
                / F.lit(3)
            )
        ).cast("long").alias("__sym__"),
        F.size(F.array_intersect(F.transform(toks, F.lower), stop_arr))
        .cast("long")
        .alias("__stop__"),
    )
    nw = F.col("__nw__")
    flag_len = ((nw < min_tokens) | (nw > max_tokens)).cast("long")
    flag_wlen = (
        (F.col("__wlen__") < min_mean_word_len * nw)
        | (F.col("__wlen__") > max_mean_word_len * nw)
    ).cast("long")
    flag_sym = (F.col("__sym__") * 100 > max_symbol_pct * nw).cast("long")
    flag_alpha = (F.col("__alpha__") * 100 < min_alpha_pct * nw).cast("long")
    flag_stop = (F.col("__stop__") < min_stop_hits).cast("long")
    total = flag_len + flag_wlen + flag_sym + flag_alpha + flag_stop
    return feat.select(
        F.col(id_col),
        nw.alias("n_tokens"),
        flag_len.alias("flag_token_count"),
        flag_wlen.alias("flag_mean_word_len"),
        flag_sym.alias("flag_symbol_ratio"),
        flag_alpha.alias("flag_alpha_ratio"),
        flag_stop.alias("flag_stopwords"),
        (total == 0).cast("long").alias("keep"),
    )


def lexical_diversity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document lexical-diversity card — type/token ratio and
    hapax-legomenon share, the vocabulary-richness signals quality
    pipelines use alongside the Gopher rules (low TTR = template spam
    or stutter; near-1.0 TTR on a long doc = word-salad/gibberish).

    Columns: n_tokens, n_types (distinct lowercased tokens),
    ttr_micro (n_types*1e6 div n_tokens), n_hapax (types occurring
    exactly once), hapax_ratio_micro (n_hapax*1e6 div n_types). Floor
    fixed-point micro integers (the quality_score rationale: integer
    div is bit-identical on every engine); empty/NULL text reports
    all-zero, matching the flags-not-NULLs convention of
    repetition_stats / gopher_flags.

    Scale shape: pure scan-side array expressions — zero shuffle,
    zero Python. Hapax counting is O(n log n) per document: sort the
    token array once, then a token is a hapax iff it differs from
    BOTH sorted neighbors (the repetition_stats sort+run idiom, not
    the O(types x tokens) nested-membership scan).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    feat = df.select(
        F.col(id_col),
        F.array_sort(F.transform(tokens_col(t), F.lower)).alias("__srt__"),
    )
    n = F.size("__srt__")
    # guard: Spark's sequence(1, 0) yields [1, 0] (a DESCENDING
    # ramp), not an empty array — never build the index sequence for
    # an empty document
    srt = F.col("__srt__")
    hapax = F.when(n == 0, F.lit(0)).otherwise(
        F.size(
            F.filter(
                F.sequence(F.lit(1), n),
                lambda i: (
                    (i == 1)
                    | (F.try_element_at(srt, i) != F.try_element_at(srt, i - 1))
                )
                & (
                    (i == n)
                    | (F.try_element_at(srt, i) != F.try_element_at(srt, i + 1))
                ),
            )
        )
    )
    out = feat.select(
        F.col(id_col),
        n.cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(srt)).cast("bigint").alias("n_types"),
        hapax.cast("bigint").alias("n_hapax"),
    )
    return out.select(
        id_col,
        "n_tokens",
        "n_types",
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("bigint"))
        .otherwise(F.expr("n_types * 1000000 div n_tokens"))
        .alias("ttr_micro"),
        "n_hapax",
        F.when(F.col("n_types") == 0, F.lit(0).cast("bigint"))
        .otherwise(F.expr("n_hapax * 1000000 div n_types"))
        .alias("hapax_ratio_micro"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every character ``k``-gram
    of the document, slide a window of ``w`` consecutive hashes, and
    select each window's minimum — guaranteeing any shared substring
    of length >= w + k - 1 between two documents yields at least one
    shared selected fingerprint, with only ~2/(w+1) of the grams kept.
    The local-sampling robustness that a plain rolling-hash
    fingerprint (text_fingerprint) lacks: an edit far from a match
    can shift which grams a modulo-sampler keeps, but never which
    window-minima a distant region selects.

    Determinism: the window minimum is the (md5-hex asc, position
    asc) struct minimum — leftmost of equal-hash grams — so every
    engine selects the identical set (the reference MOSS picks the
    RIGHTMOST minimum; either choice satisfies the guarantee, ours
    keeps the oracle a plain ``min``). Documents shorter than one
    full window still emit their global minimum gram (>= 1 gram), so
    short-but-identical docs remain matchable; docs shorter than
    ``k`` characters emit nothing.

    Returns (id, pos, fp) rows — 1-based gram position and the md5
    hex of the k-gram — DISTINCT per document (adjacent windows
    usually select the same gram; the dedup is the whole point of
    winnowing). Scale shape: pure scan-side array expressions, zero
    shuffle, zero Python; per-doc cost O(len * w) expression work —
    keep w small (the paper's operating points are single digits).
    Downstream near-dup joins should treat fp like a shingle digest
    (inverted index + hot-fp cap, the ngram_jaccard plan).
    """
    if k < 1 or w < 1:
        raise ValueError(f"winnow_fingerprints: k and w must be >= 1, got k={k} w={w}")
    t = F.coalesce(F.col(text_col), F.lit(""))
    g = F.length(t) - k + 1  # number of k-grams
    grams = F.when(g >= 1, F.transform(
        F.sequence(F.lit(1), F.greatest(g, F.lit(1))),
        lambda i: F.struct(
            F.md5(F.substring(t, i, F.lit(k))).alias("fp"),
            i.cast("bigint").alias("pos"),
        ),
    )).otherwise(F.expr("array()").cast("array<struct<fp:string,pos:bigint>>"))
    feat = df.select(F.col(id_col), grams.alias("__hp__"))
    ng = F.size("__hp__")
    hp = F.col("__hp__")
    # window starts: 1..ng-w+1 (or the single whole-array window when
    # 1 <= ng < w); the sequence guard again — never sequence(1, <1>0)
    n_windows = F.greatest(ng - w + 1, F.least(ng, F.lit(1)))
    sel = F.when(ng == 0, F.expr("array()").cast(
        "array<struct<fp:string,pos:bigint>>"
    )).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_windows),
                lambda s: F.array_min(F.slice(hp, s, F.lit(w))),
            )
        )
    )
    out = feat.select(F.col(id_col), F.explode(sel).alias("__sel__"))
    return out.select(
        F.col(id_col),
        F.col("__sel__.pos").alias("pos"),
        F.col("__sel__.fp").alias("fp"),
    )


# classic UTF-8-decoded-as-Latin-1 artifacts ("Ã©" for é, "â€™" for
# ’, "Â°" for °, …) — all printable, none contains a control byte
MOJIBAKE_SEQS = (
    "Ã©", "Ã¨", "Ã¡", "Ã³", "Ãº", "Ã±", "Ã§", "Ã¼", "Ã¶", "Ã¤",
    "â€™", "â€œ", "â€“", "â€”", "Â«", "Â»", "Â°",
)
# C0 controls except \t \n \r, plus DEL — the bytes that should never
# appear in extracted text
_CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def encoding_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document encoding-anomaly card — the CCNet-style "was this
    text decoded correctly?" quality gate. Three independent signals:

    - ``n_replacement``: U+FFFD replacement characters (a decoder
      already gave up there);
    - ``n_control``: C0 control characters other than tab/LF/CR, plus
      DEL — bytes no extracted text should contain (binary spill,
      terminal escapes);
    - ``n_mojibake``: occurrences of the classic
      UTF-8-read-as-Latin-1 double-decode artifacts (``MOJIBAKE_SEQS``:
      'Ã©' for é, 'â€™' for the curly apostrophe, …) — text that
      DECODED cleanly but through the wrong codec, which replacement
      counting can never see.

    ``keep`` is 1 iff all three are zero (flags-not-NULLs, all-zero
    on empty/NULL text — the gopher_flags convention). Counts are
    exact: the replacement count is the length-difference trick
    (length(s) - length(replace(s, U+FFFD, ''))), the other two are
    regex match counts over fixed literal/class patterns that RE2
    and Java regex read identically.

    Scale shape: pure scan-side expressions — zero shuffle, zero
    Python; composes with quality_score/gopher_flags into one
    projection. Real pipelines tune MOJIBAKE_SEQS per corpus; the
    bank here is the stable documented default.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    moji_pat = "|".join(re.escape(s) for s in MOJIBAKE_SEQS)
    n_repl = (F.length(t) - F.length(F.replace(t, F.lit("�"), F.lit("")))).cast(
        "bigint"
    )
    n_ctrl = F.regexp_count(t, F.lit(_CONTROL_CLASS)).cast("bigint")
    n_moji = F.regexp_count(t, F.lit(moji_pat)).cast("bigint")
    return df.select(
        F.col(id_col),
        n_repl.alias("n_replacement"),
        n_ctrl.alias("n_control"),
        n_moji.alias("n_mojibake"),
        ((n_repl == 0) & (n_ctrl == 0) & (n_moji == 0))
        .cast("long")
        .alias("keep"),
    )


def readability(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Flesch reading-ease score in exact fixed-point
    micros — the classic readability quality signal (very low =
    legalese/spam walls, implausibly high on long docs = token soup).

    Heuristics, stated so both engines compute bit-identically:
    words = whitespace tokens; sentences = runs of [.!?] (floored at
    1 so headline-only docs score); syllables = [aeiouy]+ vowel
    groups in the lowercased text (whitespace/punctuation already
    break groups at word boundaries). Score:

      flesch_micro = 206_835_000
                     - (1_015_000 * words)     div sentences
                     - (84_600_000 * syllables) div words

    i.e. Flesch's 206.835 - 1.015*(W/S) - 84.6*(Sy/W), scaled 1e6
    with the numerators multiplied BEFORE the floor div so no
    precision is lost to intermediate truncation (the quality_score
    rationale). Can be negative on pathological text — reported, not
    clamped. Empty/NULL text reports all-zero.

    Scale shape: pure scan-side regex-count expressions — zero
    shuffle, zero Python.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.size(tokens_col(t)).cast("bigint")
    sentences = F.greatest(
        F.regexp_count(t, F.lit(r"[.!?]+")).cast("bigint"), F.lit(1).cast("bigint")
    )
    syllables = F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+")).cast("bigint")
    feat = df.select(
        F.col(id_col),
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
    )
    return feat.select(
        id_col,
        "n_words",
        F.when(F.col("n_words") == 0, F.lit(0).cast("bigint"))
        .otherwise(F.col("n_sentences"))
        .alias("n_sentences"),
        "n_syllables",
        F.when(F.col("n_words") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.lit(206_835_000).cast("bigint")
            - F.expr("(1015000 * n_words) div n_sentences")
            - F.expr("(84600000 * n_syllables) div n_words")
        )
        .alias("flesch_micro"),
    )


# script classes counted by script_mix: explicit char classes valid in
# BOTH Java regex (Spark) and RE2 (DuckDB) — the literal CJK/Cyrillic
# range chars avoid the \uXXXX-vs-\x{XXXX} dialect split, and the
# explicit whitespace class dodges the \s definition drift between
# engines
SCRIPT_CLASSES = [
    ("latin", "[A-Za-z]"),
    ("digit", "[0-9]"),
    ("space", "[ \t\n\r\f]"),
    ("cjk", "[一-鿿]"),
    ("cyrillic", "[Ѐ-ӿ]"),
]


def script_mix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unicode-script composition card — what fraction of each
    document is Latin letters, digits, whitespace, CJK, Cyrillic, or
    other. The mixed-script / wrong-script detector that catches
    mojibake, script-spoofed spam, and mislabeled-language documents
    before they reach lang_id (which assumes one dominant script).

    Per document: n_chars (codepoints) and floor-micro shares
    latin_micro / digit_micro / space_micro / cjk_micro /
    cyrillic_micro / other_micro (other = codepoints matching none of
    the classes, counted exactly — not a residual of floored shares,
    so the seven columns are each independently exact). Empty or NULL
    text reports n_chars 0 and NULL shares.

    Scale shape: pure scan-side Column expressions — each class count
    is ``length(text) - length(regexp_replace(text, class, ''))``,
    whole-stage-codegen string work with zero shuffles; the classes
    live in :data:`SCRIPT_CLASSES` so the oracle uses the identical
    patterns.
    """
    t = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    n = F.length(t)
    counts = {
        name: n - F.length(F.regexp_replace(t, pat, ""))
        for name, pat in SCRIPT_CLASSES
    }
    other = n - sum(counts.values())
    names = [name for name, _ in SCRIPT_CLASSES] + ["other"]
    step = df.select(
        F.col(id_col),
        n.cast("bigint").alias("n_chars"),
        *[counts[name].cast("bigint").alias(f"__{name}__")
          for name, _ in SCRIPT_CLASSES],
        other.cast("bigint").alias("__other__"),
    )

    def micro(name: str) -> Column:
        # exact floor-micro: integer `div`, never float divide; NULL
        # when the document is empty
        return F.expr(
            f"CASE WHEN n_chars > 0 THEN __{name}__ * 1000000 "
            "div n_chars END"
        ).cast("bigint")

    return step.select(
        F.col(id_col),
        "n_chars",
        *[micro(name).alias(f"{name}_micro") for name in names],
    )
