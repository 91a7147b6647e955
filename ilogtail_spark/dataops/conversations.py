"""Conversation-structure operators over the transcripts shape
``(conv_id, turn_idx, role, text, ...)`` — the north-star payload.

The reference pipeline ships transcripts as opaque log lines; once the
parse stages recover (conv_id, turn_idx, role), the questions a
training-data pipeline asks are STRUCTURAL: is every conversation's
turn index contiguous, do roles alternate sanely, which adjacent
(user -> assistant) turn pairs are extractable as SFT examples.
Reference analog: the aggregator stage's per-source event ordering
guarantee (core/pipeline/queue/ExactlyOnceQueueManager.h:30-70 keeps
per-source order so downstream consumers can reason about sequence) —
here the sequence check itself becomes a first-class operator.

Scale shape (both operators): ONE shuffle on conv_id. The window and
the aggregate share the same partitioning, and text NEVER enters the
shuffle — ``sft_pairs`` digests/measures it scan-side and ships only
(digest, chars) through the window; callers re-attach text by
(conv_id, turn_idx) key join against the source scan when they
actually need it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ilogtail_spark.dataops.dedup import tokens_col


def _require(df: DataFrame, cols: list[str], op: str) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"{op}: input is missing columns {missing}")


def _ordered_turn_seq(
    df: DataFrame,
    conv_col: str,
    idx_col: str,
    role_col: str,
    text_col: str,
) -> DataFrame:
    """(conv_id, n_turns, __seq__) where __seq__ is the conversation's
    turns as a SORTED array of (idx, role, text-md5) structs.

    The text is digested scan-side — only 32-hex digests ride the
    conv_id exchange. NULL turn_idx coalesces to -1 and NULL text
    digests to '' BEFORE the sort, so element order (and everything
    derived from it) is deterministic on every engine regardless of
    NULL-ordering defaults. array_sort on structs compares fields
    left-to-right: (idx, role, digest) — the same total order the
    integrity/SFT windows use, with the digest tiebreak."""
    slim = df.select(
        F.col(conv_col).alias("conv_id"),
        F.coalesce(F.col(idx_col).cast("bigint"), F.lit(-1)).alias("__idx__"),
        F.coalesce(F.col(role_col), F.lit("")).alias("__role__"),
        F.coalesce(F.md5(F.col(text_col).cast("string")), F.lit("")).alias(
            "__d__"
        ),
    )
    return slim.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.array_sort(
            F.collect_list(F.struct("__idx__", "__role__", "__d__"))
        ).alias("__seq__"),
    )


def _seq_signature(seq_col: Column) -> Column:
    """The conversation content digest over a sorted ``__seq__`` array
    of (idx, role, text-digest) structs: md5 of the '|'-joined
    'role:digest' items — idx orders the sequence but never enters the
    digest (renumbered clones still collapse). The ONE builder for
    this recipe, shared by conversation_digests / conversation_dedup
    and conversation_prep so their keep sets can never desynchronize.
    """
    return F.md5(
        F.array_join(
            F.transform(
                seq_col,
                lambda x: F.concat_ws(":", x["__role__"], x["__d__"]),
            ),
            "|",
        )
    )


def conversation_digests(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """(conv_id, n_turns, conv_md5): one content digest per
    conversation — the md5 of the ORDERED (role, text-digest) turn
    sequence. Two conversations with the same turns in the same order
    share a digest even when their absolute turn_idx values are offset
    (idx orders the sequence but does not enter the digest): replayed
    or re-ingested conversations whose indices were renumbered still
    collapse.

    Scale: text digests scan-side (~50 B/turn through the ONE conv_id
    exchange); the digest itself is one codegen expression over the
    collected struct array.
    """
    _require(df, [conv_col, idx_col, role_col, text_col],
             "conversation_digests")
    agg = _ordered_turn_seq(df, conv_col, idx_col, role_col, text_col)
    return agg.select(
        "conv_id",
        "n_turns",
        _seq_signature(F.col("__seq__")).alias("conv_md5"),
    )


def conversation_dedup(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Exact CONVERSATION-level dedup: one row per conversation with
    its content digest, the duplicate-group size, and ``keep`` (true
    for the lowest conv_id of each group) — the transcripts twin of
    ``dedup.exact_dedup``, where the unit of duplication is the whole
    ordered conversation rather than one document. Re-ingested or
    replayed sessions (same turns, new conv_id / renumbered indices)
    are the duplicates this catches.

    Scale: two narrow exchanges — conv_id (digests, ~50 B/turn) then
    conv_md5 (ONE 32-hex row per conversation). row_number and the
    group count share the conv_md5 partitioning, so the second
    exchange happens once. Turn text never shuffles.
    """
    digs = conversation_digests(df, conv_col, idx_col, role_col, text_col)
    wo = Window.partitionBy("conv_md5").orderBy("conv_id")
    wa = Window.partitionBy("conv_md5")
    return digs.select(
        "conv_id",
        "conv_md5",
        "n_turns",
        F.count(F.lit(1)).over(wa).cast("bigint").alias("dup_count"),
        (F.row_number().over(wo) == 1).alias("keep"),
    )


def conversation_shingle_pairs(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """NEAR-duplicate conversation pairs (a, b, jaccard): exact
    Jaccard over each conversation's set of turn-window shingles — a
    shingle is the digest of ``shingle_k`` CONSECUTIVE turns'
    (role, text-md5) strings. Conversations that differ by an inserted
    / edited turn still share most windows, so this catches the
    "same session, one regenerated answer" near-dups that
    whole-conversation digests miss. Conversations with fewer than
    ``shingle_k`` turns emit no shingles and never pair.

    Scale: the shingle universe is built from turn DIGESTS (text never
    shuffles), the pair join is the same inverted-index shape as
    ``dedup.ngram_jaccard_pairs`` — explode, equi-join on shingle,
    count — and ``max_df`` caps hot shingles (a boilerplate system
    prompt shared by every conversation would otherwise be a quadratic
    key) with the same undercount-only semantics.
    """
    from ilogtail_spark.dataops.dedup import jaccard_from_exploded

    sh = conversation_shingles(
        df, conv_col, idx_col, role_col, text_col, shingle_k
    )
    return jaccard_from_exploded(
        sh, "conv_id", threshold=threshold, max_df=max_df
    )


def conversation_shingles(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """DISTINCT (conv_id, s) turn-window shingle digests — the element
    universe ``conversation_shingle_pairs`` feeds to the inverted-index
    join, exposed for scale audits (shingle document frequencies bound
    the join's pair count: sum over shingles of df*(df-1)/2)."""
    agg = _ordered_turn_seq(df, conv_col, idx_col, role_col, text_col)
    toks = F.transform(
        F.col("__seq__"),
        lambda x: F.concat_ws(":", x["__role__"], x["__d__"]),
    )
    agg = agg.select("conv_id", toks.alias("__t__"))
    # guard: sequence(0, size-k) with size < k would generate a
    # DESCENDING range (Spark defaults step to -1), not an empty one
    win_idx = F.when(
        F.size("__t__") >= shingle_k,
        F.sequence(F.lit(0), F.size("__t__") - shingle_k),
    ).otherwise(F.array().cast("array<int>"))
    return agg.select(
        "conv_id",
        F.explode(
            F.transform(
                win_idx,
                lambda i: F.md5(
                    F.array_join(F.slice(F.col("__t__"), i + 1, shingle_k), "|")
                ),
            )
        ).alias("s"),
    ).distinct()


def trim_to_context(
    df: DataFrame,
    max_tokens: int,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Context-window trim: keep each conversation's LAST turns whose
    cumulative whitespace-token count fits ``max_tokens`` — the
    "drop the oldest turns until the transcript fits the model's
    context" step of chat-model training prep. A turn is kept iff the
    token total of it plus every LATER turn is <= the budget; if even
    the final turn alone exceeds the budget the conversation emits no
    rows (an over-long single turn is a length-filter problem, not a
    trimming problem — compose with corpus_length_outliers upstream).

    Returns the kept-turn INDEX (conv_id, turn_idx, role, n_tokens) —
    callers re-attach text by (conv_id, turn_idx) key join, the same
    text-stays-out-of-the-shuffle contract as ``sft_pairs``.

    Scale: ONE conv_id exchange; the reverse running sum is a
    rows-frame window (O(1) state per task); token counting and the
    keep filter are codegen expressions.
    """
    _require(df, [conv_col, idx_col, role_col, text_col], "trim_to_context")
    if max_tokens <= 0:
        raise ValueError(f"trim_to_context: max_tokens must be > 0, got {max_tokens}")
    slim = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).cast("bigint").alias("__idx__"),
        F.col(role_col).alias("__role__"),
        F.coalesce(F.md5(F.col(text_col).cast("string")), F.lit("")).alias(
            "__d__"
        ),
        F.size(tokens_col(F.coalesce(F.col(text_col).cast("string"), F.lit(""))))
        .cast("bigint")
        .alias("n_tokens"),
    )
    # NULL idx/role coalesce to the same -1/'' sentinels
    # _ordered_turn_seq uses, so the running-sum order (and therefore
    # which turns fit the budget) never depends on an engine's
    # NULL-ordering default
    w = (
        Window.partitionBy("conv_id")
        .orderBy(
            F.coalesce(F.col("__idx__"), F.lit(-1)).desc(),
            F.coalesce(F.col("__role__"), F.lit("")).desc(),
            F.col("__d__").desc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        slim.withColumn("__rev__", F.sum("n_tokens").over(w))
        .filter(F.col("__rev__") <= max_tokens)
        .select(
            "conv_id",
            F.col("__idx__").alias("turn_idx"),
            F.col("__role__").alias("role"),
            "n_tokens",
        )
    )


def context_overflow_report(
    df: DataFrame,
    max_tokens: int,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Context-budget planning card — the measurement companion of
    :func:`trim_to_context`: running FORWARD through each
    conversation, where does the cumulative whitespace-token count
    first exceed ``max_tokens``, and how many turns lie past that
    point? Trimming answers "make it fit"; this answers "how much
    would trimming cost" — the report that picks the context length
    (or the chunking strategy) before committing an SFT corpus build.

    Output: one row per conversation — (conv_id, n_turns,
    total_tokens, first_overflow_idx, n_turns_over, fits) where
    first_overflow_idx is the turn index at which the running total
    first crosses the budget (NULL when the whole conversation fits,
    and then fits = true and n_turns_over = 0).

    Determinism: the running sum orders by (idx, role, text digest)
    with the same NULL sentinels as trim_to_context, so tied indices
    accumulate identically on every engine and partitioning.

    Scale shape: ONE conv_id exchange shared by the rows-frame running
    sum and the per-conversation aggregate; token counting is a
    scan-side expression; text never shuffles (the digest tiebreak
    ships 32 hex chars).
    """
    _require(
        df, [conv_col, idx_col, role_col, text_col], "context_overflow_report"
    )
    if max_tokens <= 0:
        raise ValueError(
            f"context_overflow_report: max_tokens must be > 0, got {max_tokens}"
        )
    slim = df.select(
        F.col(conv_col).alias("conv_id"),
        F.coalesce(F.col(idx_col).cast("bigint"), F.lit(-1)).alias("__idx__"),
        # the RAW index is what the report quotes — the -1 ordering
        # sentinel must not leak into first_overflow_idx (NULL-idx
        # turns order first and are excluded from the reported index)
        F.col(idx_col).cast("bigint").alias("__ridx__"),
        F.coalesce(F.col(role_col), F.lit("")).alias("__role__"),
        F.coalesce(F.md5(F.col(text_col).cast("string")), F.lit("")).alias(
            "__d__"
        ),
        F.size(
            tokens_col(F.coalesce(F.col(text_col).cast("string"), F.lit("")))
        )
        .cast("bigint")
        .alias("__n__"),
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy("__idx__", "__role__", "__d__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = slim.withColumn("__cum__", F.sum("__n__").over(w))
    over = F.col("__cum__") > max_tokens
    return cum.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum("__n__").cast("bigint").alias("total_tokens"),
        F.min(F.when(over, F.col("__ridx__"))).alias("first_overflow_idx"),
        F.sum(F.when(over, 1).otherwise(0)).cast("bigint").alias("n_turns_over"),
        (F.max(F.when(over, 1).otherwise(0)) == 0).alias("fits"),
    )


def role_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Per-role corpus card over a transcripts table: one row per role
    with turn count, distinct conversations, total whitespace tokens,
    total chars, and the mean turn length in integer micro-chars
    (exact on every engine — no float division). The "is the
    assistant share of this corpus sane?" summary read before
    training-mix decisions.

    Scale: counts and sums are partial-aggregated map-side; the output
    is one row per role — broadcastable anywhere downstream. NULL text
    counts as an empty turn, NULL role groups under ''.
    """
    _require(df, [conv_col, role_col, text_col], "role_stats")
    txt = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    out = df.select(
        F.coalesce(F.col(role_col), F.lit("")).alias("role"),
        F.col(conv_col).alias("__conv__"),
        F.size(tokens_col(txt)).cast("bigint").alias("__tok__"),
        F.length(txt).cast("bigint").alias("__ch__"),
    ).groupBy("role").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("__conv__").alias("n_convs"),
        F.sum("__tok__").alias("tokens_total"),
        F.sum("__ch__").alias("chars_total"),
    )
    return out.select(
        "role",
        "n_turns",
        "n_convs",
        "tokens_total",
        "chars_total",
        # exact integer `div` over a DECIMAL(38,0) product (the
        # hotkey_stats share_micro pattern) — no float rounding drift
        F.expr(
            "CAST(CAST(chars_total AS DECIMAL(38,0)) * 1000000 div n_turns"
            " AS BIGINT)"
        ).alias("avg_turn_chars_micro"),
    )


def pack_conversations(
    df: DataFrame,
    budget: int,
    conv_col: str = "conv_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Conversation-ATOMIC shard packing: assign whole conversations
    (in conv_id order) to fixed-token-budget training shards — the
    transcripts variant of ``corpus.pack_token_budget`` where the unit
    that must never split across shards is the conversation, not the
    document. A conversation lands in the shard where its first token
    falls: shard_id = floor((cum_tokens - n_tokens) / budget).

    Returns (conv_id, n_tokens, shard_id), n_tokens = the
    conversation's total whitespace tokens. Scale: one conv_id
    aggregate collapses turns to a (conv, count) row, then the
    two-phase distributed prefix sum from ``corpus.global_prefix_sum``
    — no single-partition global window at any size.
    """
    from ilogtail_spark.dataops.corpus import global_prefix_sum

    _require(df, [conv_col, text_col], "pack_conversations")
    if budget <= 0:
        raise ValueError(f"pack_conversations: budget must be > 0, got {budget}")
    counted = df.groupBy(F.col(conv_col).alias("conv_id")).agg(
        F.sum(
            F.size(
                tokens_col(F.coalesce(F.col(text_col).cast("string"), F.lit("")))
            ).cast("bigint")
        ).alias("n_tokens")
    )
    cum = global_prefix_sum(
        counted, "conv_id", "n_tokens", out_col="__cum__",
        num_partitions=num_partitions,
    )
    return cum.select(
        "conv_id",
        "n_tokens",
        F.floor((F.col("__cum__") - F.col("n_tokens")) / F.lit(budget))
        .cast("bigint")
        .alias("shard_id"),
    )


def conversation_integrity(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    tool_role: str = "tool",
    responder_role: str = "assistant",
) -> DataFrame:
    """Per-conversation structural-integrity report.

    For each conversation, counts the defects a transcripts ingest
    must surface before the data is trainable:

      * ``n_dup_idx``  — turns sharing a turn_idx (n_turns − distinct)
      * ``n_gap_idx``  — missing indices inside [min_idx, max_idx]
      * ``n_role_repeats`` — turns whose role equals the previous
        turn's role (broken alternation)
      * ``n_orphan_tool``  — ``tool_role`` turns NOT preceded by a
        ``responder_role`` turn (a tool result with no tool call)

    plus ``n_turns``, ``min_idx``/``max_idx``, and ``is_clean``
    (every defect count zero AND the conversation starts at idx 0).
    NULL turn_idx rows count as defects in ``n_dup_idx``
    (count_distinct ignores NULL); a conversation whose idx values
    are ALL NULL reports NULL min/max with ``n_gap_idx`` 0 — its
    corruption is already fully counted in ``n_dup_idx`` — and is
    never clean.

    Ordering inside a conversation is (turn_idx, role): turn_idx ties
    are real data defects, and sorting ties by role makes the
    lag(role) sequence deterministic — rows with equal (idx, role)
    are interchangeable for role-sequence purposes.

    Scale: ONE hash exchange on conv_col, shared by the lag window
    and the final aggregate (same key); everything else is codegen
    expressions over (conv, idx, role) — text is never read.
    """
    _require(df, [conv_col, idx_col, role_col], "conversation_integrity")
    w = Window.partitionBy("conv_id").orderBy("__idx__", "__role__")
    flags = (
        df.select(
            F.col(conv_col).alias("conv_id"),
            F.col(idx_col).cast("bigint").alias("__idx__"),
            F.col(role_col).alias("__role__"),
        )
        .withColumn("__prev__", F.lag("__role__").over(w))
        .select(
            "conv_id",
            "__idx__",
            # coalesce: a conversation's FIRST turn (prev NULL) is not a
            # repeat — without it a single-turn conversation sums an
            # all-NULL group and reports NULL instead of 0
            F.coalesce(
                F.col("__role__") == F.col("__prev__"), F.lit(False)
            ).alias("__rep__"),
            (
                (F.col("__role__") == tool_role)
                & (F.coalesce(F.col("__prev__"), F.lit("")) != responder_role)
            ).alias("__orph__"),
        )
    )
    out = flags.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("__idx__").alias("__nd__"),
        F.min("__idx__").alias("min_idx"),
        F.max("__idx__").alias("max_idx"),
        F.sum(F.col("__rep__").cast("bigint")).alias("n_role_repeats"),
        F.sum(F.col("__orph__").cast("bigint")).alias("n_orphan_tool"),
    )
    n_dup = (F.col("n_turns") - F.col("__nd__")).cast("bigint")
    # coalesce: an all-NULL-idx conversation has NULL min/max — its
    # corruption is already fully counted in n_dup_idx (= n_turns),
    # and a NULL gap count would silently drop it from sum()/filter()
    n_gap = F.coalesce(
        (F.col("max_idx") - F.col("min_idx") + 1 - F.col("__nd__")).cast(
            "bigint"
        ),
        F.lit(0).cast("bigint"),
    )
    return (
        out.select(
            "conv_id",
            "n_turns",
            "min_idx",
            "max_idx",
            n_dup.alias("n_dup_idx"),
            n_gap.alias("n_gap_idx"),
            "n_role_repeats",
            "n_orphan_tool",
        )
        .withColumn(
            "is_clean",
            (F.col("n_dup_idx") == 0)
            & (F.col("n_gap_idx") == 0)
            & (F.col("n_role_repeats") == 0)
            & (F.col("n_orphan_tool") == 0)
            & (F.col("min_idx") == 0),
        )
    )


def sft_pairs(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    prompt_role: str = "user",
    response_role: str = "assistant",
    adjacent_only: bool = True,
) -> DataFrame:
    """Extract (prompt -> response) adjacent turn pairs — the SFT
    example index every instruction-tuning prep pipeline builds from
    raw transcripts.

    A pair is a ``prompt_role`` turn whose NEXT turn (by turn_idx
    within the conversation) has ``response_role``; with
    ``adjacent_only`` the next turn must sit at exactly idx+1 (a gap
    between prompt and response disqualifies the pair — the missing
    turn could be anything). Output is one row per pair:
    (conv_id, prompt_idx, response_idx, prompt_md5, response_md5,
    prompt_chars, response_chars), ordered by (conv_id, prompt_idx).

    Text stays OUT of the pair index: the text column is digested and
    measured scan-side and only (md5, chars) ride through the window
    shuffle, so at 100 TB the exchange carries ~50 bytes/turn
    regardless of turn length. Callers join the index back to the
    source by (conv_id, turn_idx) — a key join against the original
    scan — when they materialize the actual pair text.

    Scale: ONE hash exchange on conv_col; lead() window; filter and
    projection in codegen. NULL text digests to NULL (the pair row
    still appears — filtering NULL-text pairs is the caller's policy
    decision, visible via prompt_chars/response_chars being NULL).
    """
    _require(df, [conv_col, idx_col, role_col, text_col], "sft_pairs")
    slim = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).cast("bigint").alias("__idx__"),
        F.col(role_col).alias("__role__"),
        F.md5(F.col(text_col).cast("string")).alias("__md5__"),
        F.length(F.col(text_col).cast("string"))
        .cast("bigint")
        .alias("__chars__"),
    )
    # __md5__ as the final tiebreaker: duplicate (idx, role) rows with
    # DIFFERENT text would otherwise make lead() — and therefore the
    # emitted digests — depend on physical row order
    wt = Window.partitionBy("conv_id").orderBy(
        "__idx__", "__role__", "__md5__"
    )
    nxt = slim.select(
        "conv_id",
        "__idx__",
        "__role__",
        "__md5__",
        "__chars__",
        F.lead("__idx__").over(wt).alias("__nidx__"),
        F.lead("__role__").over(wt).alias("__nrole__"),
        F.lead("__md5__").over(wt).alias("__nmd5__"),
        F.lead("__chars__").over(wt).alias("__nchars__"),
    )
    cond: Column = (F.col("__role__") == prompt_role) & (
        F.col("__nrole__") == response_role
    )
    if adjacent_only:
        cond = cond & (F.col("__nidx__") == F.col("__idx__") + 1)
    return (
        nxt.filter(cond)
        .select(
            "conv_id",
            F.col("__idx__").alias("prompt_idx"),
            F.col("__nidx__").alias("response_idx"),
            F.col("__md5__").alias("prompt_md5"),
            F.col("__nmd5__").alias("response_md5"),
            F.col("__chars__").alias("prompt_chars"),
            F.col("__nchars__").alias("response_chars"),
        )
        .orderBy("conv_id", "prompt_idx")
    )


def conversation_quality_gate(
    df: DataFrame,
    min_turns: int = 2,
    min_avg_assistant_quality_micro: int = 300_000,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    assistant_role: str = "assistant",
) -> DataFrame:
    """Conversation-level quality gate for chat-model training prep:
    score every turn with the corpus quality heuristic
    (``textstats.quality_score`` — length band / punctuation /
    stopword / repetition, exact fixed-point micro units) and keep a
    conversation iff it has at least ``min_turns`` turns, at least one
    ``assistant_role`` turn, and the assistant turns' MEAN quality
    clears the threshold — low-effort or degenerate assistant text is
    what poisons SFT corpora, so the gate reads the assistant side
    specifically.

    Returns one row per conversation: (conv_id, n_turns, n_assistant,
    avg_assistant_quality_micro, keep). The mean is exact integer
    floor(sum/n) (`div`), so every engine raises the identical keep
    set. NULL text scores as the empty string.

    Scale: turn scoring is the same one-projection scan stage
    quality_score compiles everywhere else (text never shuffles —
    only (conv_id, role-flag, score) reaches the ONE conv_id
    aggregate); the output is one row per conversation.
    """
    from ilogtail_spark.dataops.textstats import quality_score

    _require(df, [conv_col, role_col, text_col], "conversation_quality_gate")
    if min_turns < 1:
        raise ValueError(
            f"conversation_quality_gate: min_turns must be >= 1, got {min_turns}"
        )
    slim = df.select(
        F.col(conv_col).alias("conv_id"),
        (F.col(role_col) == assistant_role).alias("__a__"),
        F.coalesce(F.col(text_col).cast("string"), F.lit("")).alias("__txt__"),
    )
    scored = quality_score(slim, text_col="__txt__", passthrough=True).select(
        "conv_id", "__a__", "quality_score_micro"
    )
    agg = scored.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.when(F.col("__a__"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_assistant"),
        F.sum(F.when(F.col("__a__"), F.col("quality_score_micro")))
        .alias("__sq__"),
    )
    avg_q = F.expr("__sq__ div n_assistant")
    return agg.select(
        "conv_id",
        "n_turns",
        "n_assistant",
        avg_q.alias("avg_assistant_quality_micro"),
        (
            (F.col("n_turns") >= min_turns)
            & (F.col("n_assistant") >= 1)
            & (avg_q >= min_avg_assistant_quality_micro)
        ).alias("keep"),
    )


def repeated_turn_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Retry-artifact report: per conversation, how many ADJACENT turn
    pairs are identical in (role, text) — the "client retried and the
    same assistant message landed twice" defect exact conversation
    dedup cannot see (the duplicate is INSIDE one conversation) — plus
    the longest run of identical consecutive turns. Complements
    ``conversation_integrity``: that counts same-ROLE adjacency
    (speaker-alternation), this counts same-CONTENT adjacency.

    Returns (conv_id, n_turns, n_repeat_pairs, max_run, has_repeats);
    max_run is 1 for a conversation with no repeats. Adjacency uses
    the canonical engine-stable order (coalesced idx, role, digest).

    Scale: text is digested scan-side; the lag window, the
    run-grouping running sum, and both aggregate levels all partition
    by conv_id, so ONE exchange feeds the whole report (the
    sessionize lag-flag-sum core over turns instead of events).
    """
    _require(df, [conv_col, idx_col, role_col, text_col],
             "repeated_turn_stats")
    slim = df.select(
        F.col(conv_col).alias("conv_id"),
        F.coalesce(F.col(idx_col).cast("bigint"), F.lit(-1)).alias("__idx__"),
        F.coalesce(F.col(role_col), F.lit("")).alias("__role__"),
        F.coalesce(F.md5(F.col(text_col).cast("string")), F.lit("")).alias(
            "__d__"
        ),
    )
    order = [F.col("__idx__"), F.col("__role__"), F.col("__d__")]
    w = Window.partitionBy("conv_id").orderBy(*order)
    wrun = (
        Window.partitionBy("conv_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = slim.withColumn(
        "__rep__",
        F.coalesce(
            (F.col("__role__") == F.lag("__role__").over(w))
            & (F.col("__d__") == F.lag("__d__").over(w)),
            F.lit(False),
        ),
    ).withColumn(
        # a new run starts wherever __rep__ is false; the running count
        # of starts is the run id
        "__run__",
        F.sum(F.when(F.col("__rep__"), 0).otherwise(1)).over(wrun),
    )
    # within a run every row but the first is a repeat pair, so
    # repeat pairs = n_turns - run count and has_repeats = max_run > 1
    # — run lengths carry all the information
    per_run = flagged.groupBy("conv_id", "__run__").agg(
        F.count(F.lit(1)).alias("__len__"),
    )
    return per_run.groupBy("conv_id").agg(
        F.sum("__len__").cast("bigint").alias("n_turns"),
        (F.sum("__len__") - F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_repeat_pairs"),
        F.max("__len__").cast("bigint").alias("max_run"),
        (F.max("__len__") > 1).alias("has_repeats"),
    )


def conversation_pii_report(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    user_role: str = "user",
) -> DataFrame:
    """Conversation-level PII exposure report: per conversation, total
    email / phone / SSN / IP-shaped matches across all turns, how many
    turns contain any PII, how many USER turns do (the side that
    actually leaks personal data into a training corpus — assistant
    echoes are downstream of those), and a ``has_pii`` flag. The
    conversation-granularity companion of ``textstats.pii_flags``
    (drop or re-route whole conversations, not single turns) —
    compose with ``textstats.pii_redact`` on the kept set.

    Scale: the four regexp counters are the same scan-side expressions
    pii_flags compiles; only (conv_id, user-flag, four small ints)
    reach the ONE conv_id aggregate. NULL text counts zero matches.
    """
    from ilogtail_spark.dataops.textstats import pii_count_cols

    _require(df, [conv_col, role_col, text_col], "conversation_pii_report")
    t = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    emails, phones, ssns, ips = pii_count_cols(t)
    slim = df.select(
        F.col(conv_col).alias("conv_id"),
        (F.col(role_col) == user_role).alias("__u__"),
        emails.alias("__em__"),
        phones.alias("__ph__"),
        ssns.alias("__ss__"),
        ips.alias("__ip__"),
    ).withColumn(
        "__any__",
        (F.col("__em__") + F.col("__ph__") + F.col("__ss__") + F.col("__ip__"))
        > 0,
    )
    return slim.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum("__em__").cast("bigint").alias("n_emails"),
        F.sum("__ph__").cast("bigint").alias("n_phones"),
        F.sum("__ss__").cast("bigint").alias("n_ssns"),
        F.sum("__ip__").cast("bigint").alias("n_ips"),
        F.sum(F.when(F.col("__any__"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pii_turns"),
        F.sum(F.when(F.col("__any__") & F.col("__u__"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pii_user_turns"),
        F.max(F.col("__any__")).alias("has_pii"),
    )


def _latency_col(
    conv_col: str,
    idx_col: str,
    role_col: str,
    ts_col: str,
    user_role: str,
    assistant_role: str,
) -> Column:
    """Per-turn assistant response latency in exact epoch micros —
    the shared window core of response_latency /
    response_latency_turns. NULL on every non-assistant turn and on
    assistant turns with no strictly-prior user turn.

    TIMESTAMP_NTZ (the parquet default here) has no unix_micros; the
    cast maps it through the session timezone, which get_spark pins
    to UTC — the same naive-as-UTC reading DuckDB's epoch_us applies,
    so the micros (and their differences) are exact."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(idx_col), F.col(ts_col), F.col(role_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior_user_us = F.last(
        F.when(F.col(role_col) == user_role, us), ignorenulls=True
    ).over(w)
    return F.when(
        (F.col(role_col) == assistant_role) & prior_user_us.isNotNull(),
        us - prior_user_us,
    )


def response_latency_turns(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
    user_role: str = "user",
    assistant_role: str = "assistant",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The per-turn form of ``response_latency``: one row per
    latency-bearing assistant turn — (conv_id, turn_idx, latency_us)
    plus any ``keep_cols`` (e.g. the assistant turn's ``tool``
    column) — for distributional analysis the per-conversation means
    hide. The canonical composition is per-tool/per-model latency
    percentiles via ``analytics.grouped_quantiles`` (a p99 regression
    on one tool disappears inside a whole-corpus average; the
    per-turn rows are what the SLO report needs).

    Same semantics as response_latency (most recent strictly-prior
    user turn under the stable turn order, exact BIGINT epoch-micro
    subtraction, negative latencies reported not clamped); assistant
    turns before any user turn emit no row.

    Scale shape: ONE exchange on conv_col for the running-last
    window, O(1) task state; the latency filter streams out of the
    window — no aggregate, no second shuffle. Text never enters the
    plan (select only the key/ts/role columns plus keep_cols).
    """
    _require(
        df,
        [conv_col, idx_col, role_col, ts_col, *keep_cols],
        "response_latency_turns",
    )
    lat = _latency_col(
        conv_col, idx_col, role_col, ts_col, user_role, assistant_role
    )
    return (
        df.select(
            F.col(conv_col).alias("conv_id"),
            F.col(idx_col).alias("turn_idx"),
            *[F.col(c) for c in keep_cols],
            lat.cast("bigint").alias("latency_us"),
        )
        .filter(F.col("latency_us").isNotNull())
    )


def response_latency(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
    user_role: str = "user",
    assistant_role: str = "assistant",
) -> DataFrame:
    """Per-conversation assistant response latency — "how long after
    the user's message did the assistant reply?", the conversation
    twin of a log pipeline's end-to-end lag metric (reference analog:
    the flusher send-latency counters in
    core/monitor/MetricConstants.h — here latency is measured INSIDE
    the payload, between turns, not around the transport).

    For each assistant turn, latency is measured against the MOST
    RECENT strictly-prior user turn in the stable turn order
    (``idx_col``, then ``ts_col``/``role_col`` as deterministic
    tiebreaks); assistant turns before any user turn (system-prompt
    openers) carry no latency. Returns one row per conversation:
    n_turns, n_responses (latency-bearing assistant turns),
    avg_latency_us (exact integer micro mean), max_latency_us.
    Timestamps subtract as epoch microseconds — exact BIGINT on
    every engine, no float seconds. A clock-skewed transcript can
    yield negative latencies; they are reported, not clamped (hiding
    them would mask the data defect this report exists to surface).

    Scale shape: ONE exchange on conv_id; the prior-user-ts window
    (running ``last`` over a rows frame) and the final aggregate
    share that partitioning, and O(1) state per task — no
    per-conversation sort buffer beyond the window's frame row.
    Text never enters the plan.
    """
    _require(
        df, [conv_col, idx_col, role_col, ts_col], "response_latency"
    )
    lat = _latency_col(
        conv_col, idx_col, role_col, ts_col, user_role, assistant_role
    )
    return (
        df.select(F.col(conv_col).alias("conv_id"), lat.alias("__lat__"))
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_turns"),
            F.count("__lat__").cast("bigint").alias("n_responses"),
            # exact integer micro mean: BIGINT sum div BIGINT count
            # (NULL when the conversation has no responses)
            F.expr("sum(__lat__) div count(__lat__)")
            .cast("bigint")
            .alias("avg_latency_us"),
            F.max("__lat__").cast("bigint").alias("max_latency_us"),
        )
    )


def language_mix(
    df: DataFrame,
    conv_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-conversation language mixture — "which language is this
    conversation in, and is it code-switching?": every turn gets the
    expression-only ``textstats.lang_id`` label, then one row per
    conversation reports n_turns, n_langs (distinct per-turn labels,
    'unknown' included — short acks land there and that IS mixture
    the curator must see), the majority language with its exact
    integer micro share, and is_mixed (more than one label). The
    conversation-granularity companion of ``lang_id`` for corpora
    where the SELECTION unit is the conversation: a mixed or
    majority-'unknown' conversation is a different curation decision
    than a mixed document.

    Tie-break: the majority language is the (count DESC, lang ASC)
    winner — encoded as ``min(struct(-n, lang))`` so every engine
    picks the identical label with no argmax nondeterminism.

    Scale shape: per-turn labeling is scan-side expressions (zero
    Python); the first aggregate collapses to (conv_id, lang) counts
    map-side, the second to one row per conversation — both
    exchanges carry label-sized rows, text never shuffles.
    """
    from ilogtail_spark.dataops.textstats import lang_id

    _require(df, [conv_col, text_col], "language_mix")
    labeled = lang_id(
        df.select(F.col(conv_col), F.col(text_col)),
        text_col=text_col,
        id_col=conv_col,
    )
    counts = labeled.groupBy(
        F.col(conv_col).alias("conv_id"), "lang_pred"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__n__"))
    agg = counts.groupBy("conv_id").agg(
        F.sum("__n__").cast("bigint").alias("n_turns"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        F.min(
            F.struct(
                (-F.col("__n__")).alias("neg_n"),
                F.col("lang_pred").alias("lang"),
            )
        ).alias("__m__"),
    )
    return agg.select(
        "conv_id",
        "n_turns",
        "n_langs",
        F.col("__m__.lang").alias("majority_lang"),
        F.expr(
            "CAST(-__m__.neg_n AS DECIMAL(38,0)) * 1000000 div n_turns"
        )
        .cast("bigint")
        .alias("majority_share_micro"),
        (F.col("n_langs") > 1).alias("is_mixed"),
    )


# Heuristic refusal surface patterns — deliberately simple,
# engine-portable regex (the (?i) flag and the quote class work
# identically in Java regex and RE2). The operator contract is the
# per-conversation counters; a production deployment swaps in a
# trained refusal classifier exactly as lang_id swaps in fastText.
REFUSAL_RE = (
    r"(?i)\b(i cannot|i can['’]t|i am unable to|"
    r"i['’]m unable to|i won['’]t be able to|"
    r"i must decline)\b"
)


def refusal_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    assistant_role: str = "assistant",
) -> DataFrame:
    """Per-conversation assistant refusal report — the SFT-curation
    signal behind "is this conversation teaching the model to refuse
    everything?": per conversation, assistant turns, assistant turns
    containing a refusal surface form (:data:`REFUSAL_RE`), the exact
    integer refusal rate over assistant turns, and has_refusal. A
    high-refusal conversation is a different curation decision than a
    refusal TURN — drop/reweight the whole unit, which is why this
    aggregates at conversation granularity (the pii_report pattern).

    Scale: the refusal flag is one scan-side regexp; the ONE conv_id
    aggregate carries (conv_id, two small ints). NULL text never
    matches. Conversations with zero assistant turns report NULL
    refusal_rate_micro (0/0), not 0 — absence of evidence.
    """
    _require(df, [conv_col, role_col, text_col], "refusal_stats")
    # eqNullSafe: a NULL role is "not the assistant" (0), not SQL
    # NULL — plain == would propagate NULL through the sums and make
    # has_refusal NULL-poisoned for the whole conversation
    is_a = F.col(role_col).eqNullSafe(F.lit(assistant_role))
    hit = is_a & F.coalesce(F.col(text_col), F.lit("")).rlike(REFUSAL_RE)
    slim = df.select(
        F.col(conv_col).alias("conv_id"),
        is_a.cast("int").alias("__a__"),
        hit.cast("int").alias("__r__"),
    )
    return (
        slim.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_turns"),
            F.sum("__a__").cast("bigint").alias("n_assistant"),
            F.sum("__r__").cast("bigint").alias("n_refusals"),
        )
        .select(
            "conv_id",
            "n_turns",
            "n_assistant",
            "n_refusals",
            # exact micro rate; NULL when the conversation has no
            # assistant turns — nullif because ANSI mode raises on a
            # non-NULL 0 div 0 (DuckDB's // returns NULL either way)
            F.expr(
                "CAST(n_refusals AS DECIMAL(38,0)) * 1000000 "
                "div nullif(n_assistant, 0)"
            )
            .cast("bigint")
            .alias("refusal_rate_micro"),
            (F.col("n_refusals") > 0).alias("has_refusal"),
        )
    )


# the whole alternation is boundary-wrapped (the REFUSAL_RE
# convention): without it, 'dummy training data' would match
# 'my training data' and 'BERT was a language model' would match
# 'as a language model'
IDENTITY_RE = (
    r"(?i)\b(as an ai|as a language model|i am an ai|"
    r"i['’]m an ai|i was trained by|my training data|"
    r"i do(?: not|n['’]t) have personal)\b"
)


def identity_leak_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    assistant_role: str = "assistant",
) -> DataFrame:
    """Per-conversation assistant identity-statement report — the SFT
    hygiene signal behind "is this transcript teaching the model to
    announce itself?": assistant turns matching the generic
    self-reference surface bank (:data:`IDENTITY_RE` — "as an AI",
    "as a language model", "I was trained by", ...). Distillation and
    SFT pipelines scrub or downsample these turns so the student
    model doesn't parrot the teacher's boilerplate persona; this card
    sizes the problem per conversation, the refusal_stats shape
    applied to identity leakage. The bank is deliberately simple and
    engine-portable; a production deployment swaps in its own pattern
    pack (or a trained classifier) behind the same contract.

    Output: (conv_id, n_turns, n_assistant, n_identity,
    identity_rate_micro, has_identity) — the rate is exact micro over
    assistant turns, NULL when the conversation has none.

    Scale: one scan-side regexp flag; ONE conv_id aggregate carrying
    two small ints. NULL text never matches; a NULL role is "not the
    assistant".
    """
    _require(df, [conv_col, role_col, text_col], "identity_leak_stats")
    is_a = F.col(role_col).eqNullSafe(F.lit(assistant_role))
    hit = is_a & F.coalesce(F.col(text_col), F.lit("")).rlike(IDENTITY_RE)
    slim = df.select(
        F.col(conv_col).alias("conv_id"),
        is_a.cast("int").alias("__a__"),
        hit.cast("int").alias("__i__"),
    )
    return (
        slim.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_turns"),
            F.sum("__a__").cast("bigint").alias("n_assistant"),
            F.sum("__i__").cast("bigint").alias("n_identity"),
        )
        .select(
            "conv_id",
            "n_turns",
            "n_assistant",
            "n_identity",
            F.expr(
                "CAST(CAST(n_identity AS DECIMAL(38,0)) * 1000000 "
                "div nullif(n_assistant, 0) AS BIGINT)"
            ).alias("identity_rate_micro"),
            (F.col("n_identity") > 0).alias("has_identity"),
        )
    )


def tool_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-tool usage report over agent transcripts — "which tools do
    conversations actually call, and how hard?": for each distinct
    value of the transcript's ``tool`` column (the north-star schema
    carries one per turn; NULL = no tool call), the total call count,
    its exact micro share of all tool calls, how many conversations
    used it, and the exact mean calls per using conversation. The
    tool-dimension companion of role_stats; compose with
    ``analytics.transition_counts(state_col=tool)`` for call chains.

    Scale shape: one partial-aggregated groupBy on (tool, conv)
    collapses turns map-side, the second on tool is
    tool-vocabulary-sized; the grand total broadcasts back as a
    single row (the hotkey_stats idiom). Text never enters the plan.
    """
    _require(df, [conv_col, tool_col], "tool_stats")
    calls = df.filter(F.col(tool_col).isNotNull()).select(
        F.col(tool_col).alias("tool"), F.col(conv_col).alias("__c__")
    )
    per_conv = calls.groupBy("tool", "__c__").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n__")
    )
    per_tool = per_conv.groupBy("tool").agg(
        F.sum("__n__").cast("bigint").alias("n_calls"),
        F.count(F.lit(1)).cast("bigint").alias("n_convs"),
    )
    total = per_tool.agg(F.sum("n_calls").alias("__total__"))
    return (
        per_tool.join(F.broadcast(total))
        .select(
            "tool",
            "n_calls",
            F.expr(
                "CAST(n_calls AS DECIMAL(38,0)) * 1000000 div __total__"
            )
            .cast("bigint")
            .alias("share_micro"),
            "n_convs",
            F.expr(
                "CAST(n_calls AS DECIMAL(38,0)) * 1000000 div n_convs"
            )
            .cast("bigint")
            .alias("calls_per_conv_micro"),
        )
    )


def preference_pairs(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    max_depth: int = 64,
    max_prefix_group: int = 50,
    assistant_role: str = "assistant",
) -> DataFrame:
    """Preference-pair mining for DPO/RLHF data prep: find pairs of
    conversations that share an identical turn prefix and then
    DIVERGE at an assistant turn — the "same context, two different
    responses" structure that regenerated answers, A/B-served
    replies, and edited sessions leave in a transcript corpus. Each
    mined pair is a raw preference candidate: the shared prefix is
    the prompt context, the two divergent assistant turns are the
    response pair (labeling which is preferred is the caller's
    problem — this operator finds the structure).

    For each conversation pair the DEEPEST shared prefix is used, and
    the pair is emitted only when the next turn after it exists on
    both sides, differs, and is an assistant turn in both. Returns
    (conv_a, conv_b, prefix_depth, a_turn_idx, b_turn_idx) with
    conv_a < conv_b; response text re-attaches by (conv, turn_idx)
    key join, the trim_to_context contract.

    ``max_prefix_group`` drops prefix-sharing groups larger than that
    before the pair join (the max_band_bucket convention): a shared
    system prompt is a quadratic key shared by millions of sessions,
    and pairs glued ONLY by boilerplate are not preference signal.
    Prefixes are probed to ``max_depth`` as in prefix_report.

    Scale shape: the same digest algebra as prefix_report — turns
    fold once per conversation on the conv exchange (text digests
    scan-side), prefix signatures and each depth's NEXT-turn triple
    explode scan-side, the group cap is one digest-only aggregate,
    and the self-join runs within capped (depth, sig) buckets only.
    Pair reduction is one (conv_a, conv_b) aggregate taking the
    max-depth struct. Transcript text never shuffles.
    """
    if max_depth < 1:
        raise ValueError(
            f"preference_pairs: max_depth must be >= 1, got {max_depth}"
        )
    if max_prefix_group < 2:
        raise ValueError(
            "preference_pairs: max_prefix_group must be >= 2, got "
            f"{max_prefix_group}"
        )
    _require(
        df, [conv_col, idx_col, role_col, text_col], "preference_pairs"
    )
    agg = _ordered_turn_seq(df, conv_col, idx_col, role_col, text_col)
    items = F.transform(
        F.col("__seq__"),
        lambda x: F.concat_ws(":", x["__role__"], x["__d__"]),
    )
    folded = agg.select(
        "conv_id",
        F.col("n_turns").cast("bigint").alias("n_turns"),
        items.alias("__items__"),
        F.col("__seq__").alias("__sq__"),
    )
    # probe depths 1..min(n_turns - 1, max_depth): a usable prefix
    # must leave at least one following turn to diverge on
    depth_n = F.least(F.col("n_turns") - 1, F.lit(max_depth)).cast("int")
    prefixes = F.when(
        depth_n >= 1,
        F.transform(
            F.sequence(F.lit(1), depth_n),
            lambda i: F.struct(
                i.cast("bigint").alias("depth"),
                F.md5(
                    F.array_join(F.slice(F.col("__items__"), 1, i), "|")
                ).alias("sig"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<depth:bigint,sig:string>>"))
    pref = (
        folded.select(
            "conv_id", "__sq__", F.explode(prefixes).alias("__p__")
        )
        .select(
            "conv_id",
            F.col("__p__.depth").alias("depth"),
            F.col("__p__.sig").alias("sig"),
            F.element_at(
                F.col("__sq__"), (F.col("__p__.depth") + 1).cast("int")
            ).alias("__next__"),
        )
        .select(
            "conv_id",
            "depth",
            "sig",
            F.col("__next__.__idx__").alias("nidx"),
            F.col("__next__.__role__").alias("nrole"),
            F.col("__next__.__d__").alias("nd"),
        )
    )
    ok = (
        pref.groupBy("depth", "sig")
        .agg(F.count(F.lit(1)).alias("__cnt__"))
        .filter(
            (F.col("__cnt__") >= 2) & (F.col("__cnt__") <= max_prefix_group)
        )
        .select("depth", "sig")
    )
    capped = pref.join(ok, ["depth", "sig"])
    left = capped.alias("l")
    right = capped.alias("r")
    pairs = left.join(
        right,
        (F.col("l.depth") == F.col("r.depth"))
        & (F.col("l.sig") == F.col("r.sig"))
        & (F.col("l.conv_id") < F.col("r.conv_id")),
    ).select(
        F.col("l.conv_id").alias("conv_a"),
        F.col("r.conv_id").alias("conv_b"),
        F.struct(
            F.col("l.depth").alias("depth"),
            F.col("l.nidx").alias("a_idx"),
            F.col("l.nrole").alias("a_role"),
            F.col("l.nd").alias("a_d"),
            F.col("r.nidx").alias("b_idx"),
            F.col("r.nrole").alias("b_role"),
            F.col("r.nd").alias("b_d"),
        ).alias("__s__"),
    )
    # one row per (pair, depth), so the struct max picks the deepest
    # shared prefix with its divergence triple attached
    best = pairs.groupBy("conv_a", "conv_b").agg(F.max("__s__").alias("__s__"))
    return best.filter(
        (F.col("__s__.a_role") == assistant_role)
        & (F.col("__s__.b_role") == assistant_role)
        & (F.col("__s__.a_d") != F.col("__s__.b_d"))
    ).select(
        "conv_a",
        "conv_b",
        F.col("__s__.depth").alias("prefix_depth"),
        F.col("__s__.a_idx").alias("a_turn_idx"),
        F.col("__s__.b_idx").alias("b_turn_idx"),
    )


def tool_chains(
    df: DataFrame,
    conv_col: str = "conv_id",
    tool_col: str = "tool",
    order_col: str = "turn_idx",
    min_convs: int = 1,
) -> DataFrame:
    """Tool-call CHAIN report over agent transcripts — "what sequences
    of tools do agents actually run?": fold each conversation's
    non-NULL ``tool`` values in turn order into one ``a>b>c`` chain
    string, then count how many conversations execute each distinct
    chain. Where :func:`tool_stats` counts calls per tool and
    ``analytics.transition_counts`` gives first-order edges, this is
    the full-path view — the report that surfaces degenerate agent
    loops (``search>search>search>...``) and the dominant workflows
    worth caching. ``min_convs`` prunes singleton chains from the
    report.

    Output: (chain, chain_len, n_convs, share_micro) where share is
    the exact integer micro fraction of tool-using conversations.
    Rows group on (chain, chain_len) — if a tool NAME contains the
    '>' delimiter, two different workflows can render to the same
    chain string, and the length keeps them separate rows.

    Determinism: the per-conversation fold is array_sort over
    (order, tool) structs, so ties on the order column resolve by
    tool name identically on every engine and partitioning.

    Scale shape: one conv-keyed aggregate collapses turns to a chain
    per conversation (tool names are short enums; the chain string is
    bounded by the conversation's tool-call count — the same
    bounded-string shuffle as log-template mining); the chain
    dictionary aggregate is partial-aggregated, and the grand total
    broadcasts back as one row (the hotkey_stats idiom). Transcript
    TEXT never enters the plan.
    """
    _require(df, [conv_col, tool_col, order_col], "tool_chains")
    if min_convs < 1:
        raise ValueError(f"min_convs must be >= 1 (got {min_convs})")
    calls = df.filter(F.col(tool_col).isNotNull()).select(
        F.col(conv_col).alias("__c__"),
        F.struct(
            F.col(order_col).alias("i"), F.col(tool_col).alias("t")
        ).alias("__s__"),
    )
    per_conv = calls.groupBy("__c__").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("__s__")), lambda x: x["t"]
            ),
            ">",
        ).alias("chain"),
        F.count(F.lit(1)).cast("bigint").alias("chain_len"),
    )
    # group on (chain, chain_len), not chain alone: a tool NAME
    # containing the '>' delimiter can render two different workflows
    # to the same chain string, and the length keeps them distinct
    # rows instead of silently merging them
    per_chain = per_conv.groupBy("chain", "chain_len").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_convs"),
    )
    # the grand total (tool-using conversations) derives from the
    # chain DICTIONARY, not a second pass over the turns — the
    # broadcast side shares the per-conv subtree up to the chain
    # exchange instead of re-deriving the full window pipeline
    total = per_chain.agg(F.sum("n_convs").alias("__total__"))
    return (
        per_chain.filter(F.col("n_convs") >= min_convs)
        .join(F.broadcast(total))
        .select(
            "chain",
            "chain_len",
            "n_convs",
            F.expr("CAST(n_convs AS DECIMAL(38,0)) * 1000000 div __total__")
            .cast("bigint")
            .alias("share_micro"),
        )
    )


def repeated_response_report(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    role: str = "assistant",
    min_convs: int = 2,
    snippet_len: int = 60,
) -> DataFrame:
    """Cross-conversation boilerplate-response report: assistant turns
    whose EXACT text recurs in ``min_convs`` or more distinct
    conversations. Whole-conversation dedup (conversation_dedup) and
    adjacent-retry detection (repeated_turn_stats) can't see this —
    the canned answer ("As an AI...", a templated apology, a cached
    tool summary) hides inside otherwise-unique conversations, and in
    SFT corpora it teaches the model to over-produce the template.
    This is the report that sizes the problem before a turn-level
    drop/downsample decision.

    Output: one row per repeated response digest — (text_md5, snippet,
    n_turns, n_convs, first_conv), where snippet is the first
    ``snippet_len`` characters (all texts in a digest group are
    identical, so min() of the prefix IS the prefix) and first_conv
    the smallest conversation id carrying it.

    Scale shape: turns collapse to (32-hex digest, conv id,
    bounded-length snippet) at the scan; ONE partial-aggregated
    groupBy on the digest (the distinct-conv count is the standard
    two-phase expand); full turn text never shuffles. Output is
    bounded by the number of genuinely repeated responses.
    """
    _require(df, [conv_col, role_col, text_col], "repeated_response_report")
    if min_convs < 1:
        raise ValueError(f"min_convs must be >= 1 (got {min_convs})")
    turns = df.filter(
        (F.col(role_col) == role) & F.col(text_col).isNotNull()
    ).select(
        F.md5(F.col(text_col)).alias("text_md5"),
        F.substring(F.col(text_col), 1, snippet_len).alias("__snip__"),
        F.col(conv_col).alias("__c__"),
    )
    return (
        turns.groupBy("text_md5")
        .agg(
            F.min("__snip__").alias("snippet"),
            F.count(F.lit(1)).cast("bigint").alias("n_turns"),
            F.countDistinct("__c__").cast("bigint").alias("n_convs"),
            F.min("__c__").alias("first_conv"),
        )
        .filter(F.col("n_convs") >= min_convs)
    )


def flow_shapes(
    df: DataFrame,
    max_depth: int = 12,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    min_convs: int = 1,
) -> DataFrame:
    """Conversation flow-shape dictionary: fold each conversation's
    first ``max_depth`` role INITIALS (in turn order, lowercased first
    character; NULL role → '?') into a compact shape string like
    ``uauat`` — with a trailing ``+`` when the conversation continues
    past the probe depth — and count conversations per shape. This is
    the structure census of a transcript corpus: what share follows
    the canonical user/assistant alternation, where the tool-heavy
    loops live, which shapes are scraper artifacts (``uuuu+``) worth
    a filter. The opening shape is probed because SFT formatting
    breaks there first; compose with transition_counts for the
    order-1 view and tool_chains for full tool paths.

    Output: (flow, n_convs, share_micro) — share over ALL
    conversations, exact micro. ``min_convs`` prunes rare shapes.

    Determinism: the fold sorts (idx, role) structs, so tied indices
    order by role name identically everywhere.

    Scale shape: one conv-keyed aggregate folds turns to a
    <= max_depth+1-char string (role initials only — text never
    enters the plan); the shape dictionary aggregate is bounded by
    the distinct opening shapes; the grand total broadcasts back off
    the dictionary (the tool_chains idiom).
    """
    _require(df, [conv_col, idx_col, role_col], "flow_shapes")
    if max_depth <= 0:
        raise ValueError(
            f"flow_shapes: max_depth must be > 0, got {max_depth}"
        )
    if min_convs < 1:
        raise ValueError(f"min_convs must be >= 1 (got {min_convs})")
    initial = F.coalesce(
        F.lower(F.substring(F.col(role_col), 1, 1)), F.lit("?")
    )
    turns = df.select(
        F.col(conv_col).alias("__c__"),
        F.struct(
            F.coalesce(F.col(idx_col).cast("bigint"), F.lit(-1)).alias("i"),
            F.coalesce(F.col(role_col), F.lit("")).alias("r"),
            initial.alias("x"),
        ).alias("__s__"),
    )
    per_conv = turns.groupBy("__c__").agg(
        F.concat(
            F.array_join(
                F.transform(
                    F.slice(F.array_sort(F.collect_list("__s__")), 1, max_depth),
                    lambda s: s["x"],
                ),
                "",
            ),
            F.when(F.count(F.lit(1)) > max_depth, F.lit("+")).otherwise(
                F.lit("")
            ),
        ).alias("flow"),
    )
    per_flow = per_conv.groupBy("flow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_convs")
    )
    total = per_flow.agg(F.sum("n_convs").alias("__total__"))
    return (
        per_flow.filter(F.col("n_convs") >= min_convs)
        .join(F.broadcast(total))
        .select(
            "flow",
            "n_convs",
            F.expr("CAST(n_convs AS DECIMAL(38,0)) * 1000000 div __total__")
            .cast("bigint")
            .alias("share_micro"),
        )
    )


def drop_repeated_responses(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    role: str = "assistant",
) -> DataFrame:
    """Rewrite twin of :func:`repeated_response_report`: keep the
    FIRST occurrence (ordered by conversation id, turn index) of each
    exact ``role``-turn text and drop every later repeat — within and
    across conversations. This is the action the report sizes: canned
    assistant answers surviving once instead of thousands of times
    stops an SFT run from over-weighting the template. Turns of other
    roles (and NULL-text turns) always keep.

    Returns the kept-turn INDEX (conv_id, turn_idx, role) — callers
    re-attach text by key join, the trim_to_context contract.

    Scale shape: only target-role turns enter the digest window
    (partitioned by the 32-hex text digest — repeats of one answer
    co-locate, everything else is singleton partitions); other turns
    pass through scan-side. Text never shuffles.
    """
    _require(
        df, [conv_col, idx_col, role_col, text_col], "drop_repeated_responses"
    )
    slim = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).cast("bigint").alias("turn_idx"),
        F.col(role_col).alias("role"),
        F.when(
            F.col(role_col).eqNullSafe(role) & F.col(text_col).isNotNull(),
            F.md5(F.col(text_col)),
        ).alias("__d__"),
    )
    target = slim.filter(F.col("__d__").isNotNull())
    rest = slim.filter(F.col("__d__").isNull()).select(
        "conv_id", "turn_idx", "role"
    )
    w = Window.partitionBy("__d__").orderBy(
        F.col("conv_id"),
        F.coalesce(F.col("turn_idx"), F.lit(-1)),
        F.coalesce(F.col("role"), F.lit("")),
    )
    kept = (
        target.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select("conv_id", "turn_idx", "role")
    )
    return kept.unionByName(rest)


def turn_position_stats(
    df: DataFrame,
    n_buckets: int = 10,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Turn-position profile — "how do conversations evolve with
    depth?": each turn lands in one of ``n_buckets`` equal-width
    position buckets (bucket = rank * n_buckets div conv_length, so
    bucket 0 is the opening and bucket n-1 the close), and the card
    reports per (role, bucket) the turn count, total tokens, and
    exact integer mean tokens per turn. This surfaces the
    answers-get-shorter-with-depth drift, where refusals cluster, and
    whether tool calls front-load — the depth dimension the flat
    role_stats card integrates out.

    Output: (role, bucket, n_turns, total_tokens, mean_tokens_micro);
    NULL roles report under '' (the _ordered_turn_seq sentinel).

    Determinism: rank orders by (idx, role, text digest) with the
    usual sentinels, so ties bucket identically on every engine.

    Scale shape: ONE conv_id exchange shared by the two windows (rank
    and conversation length); the aggregate output is bounded by
    roles x n_buckets. Text never shuffles.
    """
    _require(
        df, [conv_col, idx_col, role_col, text_col], "turn_position_stats"
    )
    if n_buckets <= 0:
        raise ValueError(
            f"turn_position_stats: n_buckets must be > 0, got {n_buckets}"
        )
    slim = df.select(
        F.col(conv_col).alias("conv_id"),
        F.coalesce(F.col(idx_col).cast("bigint"), F.lit(-1)).alias("__idx__"),
        F.coalesce(F.col(role_col), F.lit("")).alias("role"),
        F.coalesce(F.md5(F.col(text_col).cast("string")), F.lit("")).alias(
            "__d__"
        ),
        F.size(
            tokens_col(F.coalesce(F.col(text_col).cast("string"), F.lit("")))
        )
        .cast("bigint")
        .alias("__n__"),
    )
    order = Window.partitionBy("conv_id").orderBy("__idx__", "role", "__d__")
    whole = Window.partitionBy("conv_id")
    ranked = slim.select(
        "role",
        "__n__",
        (F.row_number().over(order) - 1).cast("bigint").alias("__rn__"),
        F.count(F.lit(1)).over(whole).cast("bigint").alias("__nt__"),
    )
    # rn in [0, nt-1] => rn * B div nt in [0, B-1] exactly
    bucketed = ranked.select(
        "role",
        "__n__",
        F.expr(f"__rn__ * {n_buckets} div __nt__")
        .cast("bigint")
        .alias("bucket"),
    )
    return bucketed.groupBy("role", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum("__n__").cast("bigint").alias("total_tokens"),
        F.expr(
            "CAST(CAST(sum(__n__) AS DECIMAL(38,0)) * 1000000 "
            "div count(*) AS BIGINT)"
        ).alias("mean_tokens_micro"),
    )


def conversation_prep(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    min_turns: int = 2,
    min_avg_assistant_quality_micro: int = 300_000,
    assistant_role: str = "assistant",
) -> DataFrame:
    """The composed end-to-end conversation-prep pipeline — the
    transcripts twin of ``corpus.prep_report``: one keep/drop decision
    per conversation from four gates at once — exact conversation
    dedup (lowest conv_id of each content-duplicate group survives),
    the assistant-quality gate, the PII gate, and the refusal gate.
    Returns one row per conversation: (conv_id, n_turns, n_assistant,
    avg_assistant_quality_micro, keep_dedup, keep_quality, has_pii,
    has_refusal, keep) with keep = all four gates passing; the
    per-gate flags stay visible so a curation report can attribute
    every drop.

    Why composed rather than four separate runs: every per-turn
    signal (quality score, PII counters, refusal flag, content
    digest) is a scan-side expression over the SAME text column, so
    one projection computes them all and the text is read ONCE.
    Turn text never shuffles — the ONE conv_id exchange carries
    (idx, role, digest, score, three flag ints) per turn, and the
    dedup group resolution is a second, conversation-count-sized
    exchange on conv_md5.

    Gate semantics are exactly the standalone operators':
    conversation_dedup's renumbering-invariant digest (idx orders,
    never enters), conversation_quality_gate's exact integer
    assistant mean, conversation_pii_report's has_pii,
    refusal_stats' role-gated surface match. NULL text scores as
    empty; a NULL role is not the assistant.
    """
    from ilogtail_spark.dataops.textstats import pii_count_cols, quality_score

    _require(
        df, [conv_col, idx_col, role_col, text_col], "conversation_prep"
    )
    if min_turns < 1:
        raise ValueError(
            f"conversation_prep: min_turns must be >= 1, got {min_turns}"
        )
    txt = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    slim = df.select(
        F.col(conv_col).alias("conv_id"),
        F.coalesce(F.col(idx_col).cast("bigint"), F.lit(-1)).alias("__idx__"),
        F.coalesce(F.col(role_col), F.lit("")).alias("__role__"),
        F.col(role_col).eqNullSafe(F.lit(assistant_role)).alias("__a__"),
        txt.alias("__txt__"),
        F.coalesce(F.md5(F.col(text_col).cast("string")), F.lit("")).alias(
            "__d__"
        ),
    )
    scored = quality_score(slim, text_col="__txt__", passthrough=True)
    em, ph, ss, ip = pii_count_cols(F.col("__txt__"))
    per_turn = scored.select(
        "conv_id",
        "__idx__",
        "__role__",
        "__a__",
        "__d__",
        "quality_score_micro",
        ((em + ph + ss + ip) > 0).cast("int").alias("__pii__"),
        (
            F.col("__a__") & F.col("__txt__").rlike(REFUSAL_RE)
        ).cast("int").alias("__ref__"),
    )
    agg = per_turn.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum(F.col("__a__").cast("int")).cast("bigint").alias("n_assistant"),
        F.sum(F.when(F.col("__a__"), F.col("quality_score_micro"))).alias(
            "__sq__"
        ),
        (F.max("__pii__") == 1).alias("has_pii"),
        (F.max("__ref__") == 1).alias("has_refusal"),
        F.array_sort(
            F.collect_list(F.struct("__idx__", "__role__", "__d__"))
        ).alias("__seq__"),
    )
    with_sig = agg.withColumn(
        "__md5__", _seq_signature(F.col("__seq__"))
    ).drop("__seq__")
    keep_dedup = (
        F.row_number().over(
            Window.partitionBy("__md5__").orderBy("conv_id")
        )
        == 1
    )
    avg_q = F.expr("__sq__ div n_assistant")
    keep_quality = (
        (F.col("n_turns") >= min_turns)
        & (F.col("n_assistant") >= 1)
        & (avg_q >= min_avg_assistant_quality_micro)
    )
    out = with_sig.select(
        "conv_id",
        "n_turns",
        "n_assistant",
        avg_q.alias("avg_assistant_quality_micro"),
        keep_dedup.alias("keep_dedup"),
        keep_quality.alias("keep_quality"),
        "has_pii",
        "has_refusal",
    )
    return out.withColumn(
        "keep",
        F.col("keep_dedup")
        & F.col("keep_quality")
        & ~F.col("has_pii")
        & ~F.col("has_refusal"),
    )


def prefix_report(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    max_depth: int = 64,
) -> DataFrame:
    """Shared-prefix report: for every conversation, the deepest turn
    prefix it shares with at least one OTHER conversation — the
    "how much of this corpus is the same system prompt + few-shot
    header?" card. SFT corpora built from one agent harness share
    long identical prefixes across millions of sessions; that mass
    skews token-level dedup stats, wastes packing budget, and is
    exactly what prefix-caching at train/serve time exploits. The
    whole-conversation digest (conversation_dedup) only catches
    FULL clones; this catches the shared head.

    Returns (conv_id, n_turns, shared_depth, share_count):
    shared_depth = the largest d such that the conversation's first
    d turns (in the stable (idx, role, digest) order, digested by
    the _seq_signature recipe over the prefix) are identical to
    some other conversation's first d turns; 0 when no prefix is
    shared. share_count = how many conversations (including this
    one) share that depth-d prefix; 0 when shared_depth = 0.
    Depths are probed only to ``max_depth`` (finite by default —
    the hot-cap convention: prefix hashing is O(depth^2) bytes per
    conversation, and a shared header deeper than 64 turns is
    answered just as decisively by shared_depth = 64).

    Scale shape: turns fold to per-conversation digest arrays on the
    conv_id exchange (text digests scan-side — 32-hex digests only
    ride the operator's exchanges). Prefix signatures explode
    scan-side off the folded array (<= max_depth rows per
    conversation, each a (depth, md5) pair). The (depth, sig) group
    count — pruned to >= 2 sharers — LEFT-joins back onto the prefix
    rows, and ONE conv_id aggregate takes the deepest matched
    (depth, count) struct, so the fold subtree is evaluated exactly
    twice (count build + probe), never a third time for a
    join-back: the per-conversation answer falls out of the probe
    side itself.
    """
    if max_depth < 1:
        raise ValueError(
            f"prefix_report: max_depth must be >= 1, got {max_depth}"
        )
    _require(df, [conv_col, idx_col, role_col, text_col], "prefix_report")
    agg = _ordered_turn_seq(df, conv_col, idx_col, role_col, text_col)
    items = F.transform(
        F.col("__seq__"),
        lambda x: F.concat_ws(":", x["__role__"], x["__d__"]),
    )
    # materialize the items array ONCE per conversation — inlining the
    # transform inside the per-depth lambda would rebuild it at every
    # probed depth (the shingles_from_tokens lesson: computed
    # expressions re-evaluate per reference)
    folded = agg.select(
        "conv_id",
        F.col("n_turns").cast("bigint").alias("n_turns"),
        items.alias("__items__"),
    )
    depth_n = F.least(F.col("n_turns"), F.lit(max_depth)).cast("int")
    prefixes = F.transform(
        F.sequence(F.lit(1), depth_n),
        lambda i: F.struct(
            i.cast("bigint").alias("depth"),
            F.md5(
                F.array_join(F.slice(F.col("__items__"), 1, i), "|")
            ).alias("sig"),
        ),
    )
    convs = folded.select("conv_id", "n_turns", prefixes.alias("__pref__"))
    pref = convs.select(
        "conv_id", "n_turns", F.explode("__pref__").alias("__p__")
    ).select(
        "conv_id",
        "n_turns",
        F.col("__p__.depth").alias("depth"),
        F.col("__p__.sig").alias("sig"),
    )
    counts = (
        pref.groupBy("depth", "sig")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__cnt__"))
        .filter(F.col("__cnt__") >= 2)
    )
    joined = pref.join(counts, ["depth", "sig"], "left")
    # deepest matched prefix as a (depth, count) struct max — depth is
    # unique per conversation so the struct order is total; unmatched
    # rows are NULL and max ignores them
    best = F.max(
        F.when(
            F.col("__cnt__").isNotNull(),
            F.struct(F.col("depth"), F.col("__cnt__")),
        )
    ).alias("__best__")
    return (
        joined.groupBy("conv_id")
        .agg(F.max("n_turns").alias("n_turns"), best)
        .select(
            "conv_id",
            "n_turns",
            F.coalesce(F.col("__best__.depth"), F.lit(0))
            .cast("bigint")
            .alias("shared_depth"),
            F.coalesce(F.col("__best__.__cnt__"), F.lit(0))
            .cast("bigint")
            .alias("share_count"),
        )
    )


def tool_loops(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    tool_col: str = "tool",
    loop_min: int = 3,
) -> DataFrame:
    """Stuck-agent report: per conversation, the longest consecutive
    run of the SAME tool and how many runs reach ``loop_min`` calls —
    the "agent keeps re-invoking the same tool without progress"
    defect. The tool sequence is taken over tool-bearing turns only
    (NULL/empty tool turns — plain dialogue — are skipped, so a loop
    interrupted only by chat still counts as one run).

    Returns (conv_id, n_tool_turns, n_distinct_tools, max_tool_run,
    n_loop_runs, has_loop) — has_loop = max_tool_run >= loop_min.

    Scale: only (conv_id, idx, tool) survive the scan; the lag window,
    the run-grouping running sum, and both aggregate levels all
    partition by conv_id, so ONE exchange feeds the report (the
    ``repeated_turn_stats`` lag-flag-sum core applied to the tool
    column). Reference analog: the self-monitor's plugin-level retry
    counters (core/monitor/metric_constants/PluginMetrics.cpp) — here
    the retry artifact is detected from the data itself.
    """
    _require(df, [conv_col, idx_col, tool_col], "tool_loops")
    if loop_min < 2:
        raise ValueError("tool_loops: loop_min must be >= 2")
    slim = df.select(
        F.col(conv_col).alias("conv_id"),
        F.coalesce(F.col(idx_col).cast("bigint"), F.lit(-1)).alias("__idx__"),
        F.col(tool_col).cast("string").alias("__tool__"),
    ).filter(F.col("__tool__").isNotNull() & (F.col("__tool__") != ""))
    order = [F.col("__idx__"), F.col("__tool__")]
    w = Window.partitionBy("conv_id").orderBy(*order)
    wrun = (
        Window.partitionBy("conv_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = (
        slim.withColumn(
            "__same__",
            F.coalesce(
                F.col("__tool__") == F.lag("__tool__").over(w), F.lit(False)
            ),
        )
        .withColumn(
            "__run__",
            F.sum(F.when(F.col("__same__"), 0).otherwise(1)).over(wrun),
        )
        .groupBy("conv_id", "__run__")
        # every row in a run shares one tool, so min == the run's tool
        .agg(
            F.count(F.lit(1)).alias("__len__"),
            F.min("__tool__").alias("__tool__"),
        )
    )
    return runs.groupBy("conv_id").agg(
        F.sum("__len__").cast("bigint").alias("n_tool_turns"),
        F.countDistinct("__tool__").cast("bigint").alias("n_distinct_tools"),
        F.max("__len__").cast("bigint").alias("max_tool_run"),
        F.sum(
            F.when(F.col("__len__") >= loop_min, 1).otherwise(0)
        ).cast("bigint").alias("n_loop_runs"),
        (F.max("__len__") >= loop_min).alias("has_loop"),
    )


def completion_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    assistant_role: str = "assistant",
) -> DataFrame:
    """Conversation-completion report: does each conversation END with
    an assistant turn, and how many dangling non-assistant turns trail
    the last assistant response. A conversation whose final turn is a
    user question (or an unanswered tool result) is an ABANDONED
    sample — SFT extraction would silently drop its tail, and serving
    logs with many of these indicate client-side timeouts.

    Returns (conv_id, n_turns, last_turn_idx, last_role,
    ends_assistant, trailing_dangling, abandoned); trailing_dangling
    counts the maximal suffix of non-assistant turns (0 when the
    conversation ends with the assistant), and abandoned = NOT
    ends_assistant.

    Scale: only (conv_id, idx, role) survive the scan. The last turn
    is a struct max — an ordinary aggregate, no window — and the
    trailing count comes from a reverse running sum of assistant
    flags; both partition by conv_id, so ONE exchange feeds the
    report. Ties on (idx, role) are broken by the struct order, which
    both engines share.
    """
    _require(df, [conv_col, idx_col, role_col], "completion_stats")
    slim = df.select(
        F.col(conv_col).alias("conv_id"),
        F.coalesce(F.col(idx_col).cast("bigint"), F.lit(-1)).alias("__idx__"),
        F.coalesce(F.col(role_col), F.lit("")).alias("__role__"),
    )
    wdesc = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("__idx__").desc(), F.col("__role__").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_asst = F.when(F.col("__role__") == assistant_role, 1).otherwise(0)
    tail = slim.withColumn("__seen_asst__", F.sum(is_asst).over(wdesc))
    return (
        tail.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_turns"),
            F.max(F.struct("__idx__", "__role__")).alias("__last__"),
            F.sum(F.when(F.col("__seen_asst__") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("trailing_dangling"),
        )
        .select(
            "conv_id",
            "n_turns",
            F.col("__last__.__idx__").alias("last_turn_idx"),
            F.col("__last__.__role__").alias("last_role"),
            (F.col("__last__.__role__") == assistant_role).alias(
                "ends_assistant"
            ),
            "trailing_dangling",
            (F.col("__last__.__role__") != assistant_role).alias("abandoned"),
        )
    )


def echo_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    prompt_role: str = "user",
    response_role: str = "assistant",
    echo_threshold_micro: int = 600_000,
    max_tokens: int | None = None,
) -> DataFrame:
    """Prompt-echo (parroting) report: for every adjacent
    (user -> assistant) pair, how much of the user's vocabulary the
    assistant merely repeats back. echo = |distinct(user tokens) AND
    distinct(assistant tokens)| * 1e6 div |distinct(user tokens)|
    (token = lowercased whitespace word, the ``tokens_col`` family).
    High-echo responses are low-information SFT targets — the model
    learns to restate the question — so prep pipelines gate on this
    exactly like they gate on boilerplate responses.

    Output is one row per conversation: (conv_id, n_pairs,
    max_echo_micro, avg_echo_micro, n_echoed, has_echo) where
    n_echoed counts pairs with echo >= ``echo_threshold_micro`` and
    avg is the floor-micro mean over pairs (0 when n_pairs = 0 never
    occurs — conversations without any pair emit no row, matching
    sft_pairs' universe). A user turn with ZERO tokens scores 0 (no
    vocabulary to echo), not NULL.

    Scale shape: ONE hash exchange on conv_col, shared by the lead()
    window and the final aggregate. Unlike sft_pairs this exchange
    carries the per-turn sorted distinct token ARRAY, not a digest —
    set intersection is irreducible, the two sets must meet in one
    task. The payload is bounded by per-turn distinct vocabulary
    (<= turn length, typically far less), and ``max_tokens`` truncates
    the sorted array to a hard cap when turns are pathological
    (cap applied AFTER sort, so it is deterministic and the oracle
    can mirror it). Intersection/size run scan-side after the window.

    Reference analog: the repeated-content heuristics in the
    reference's quality stages operate per-event; the pairwise twin
    here is what the transcripts shape makes possible.
    """
    _require(df, [conv_col, idx_col, role_col, text_col], "echo_stats")
    toks = F.array_sort(
        F.array_distinct(
            F.transform(
                tokens_col(F.coalesce(F.col(text_col).cast("string"), F.lit(""))),
                F.lower,
            )
        )
    )
    if max_tokens is not None:
        toks = F.slice(toks, 1, int(max_tokens))
    slim = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).cast("bigint").alias("__idx__"),
        F.col(role_col).alias("__role__"),
        toks.alias("__toks__"),
    )
    # deterministic tiebreak for duplicate (idx, role) rows: the token
    # array itself (sorted arrays compare element-wise on both engines
    # only as a last resort — a digest keeps the comparator cheap)
    slim = slim.withColumn("__tb__", F.md5(F.to_json(F.col("__toks__"))))
    wt = Window.partitionBy("conv_id").orderBy("__idx__", "__role__", "__tb__")
    nxt = slim.select(
        "conv_id",
        "__idx__",
        "__role__",
        "__toks__",
        F.lead("__idx__").over(wt).alias("__nidx__"),
        F.lead("__role__").over(wt).alias("__nrole__"),
        F.lead("__toks__").over(wt).alias("__ntoks__"),
    )
    pairs = nxt.filter(
        (F.col("__role__") == prompt_role)
        & (F.col("__nrole__") == response_role)
        & (F.col("__nidx__") == F.col("__idx__") + 1)
    )
    # floor-micro via integer div (never float division — the
    # quality_score bit-parity rationale)
    scored = pairs.select(
        "conv_id",
        F.size("__toks__").cast("bigint").alias("__nu__"),
        F.size(F.array_intersect("__toks__", "__ntoks__"))
        .cast("bigint")
        .alias("__nh__"),
    ).select(
        "conv_id",
        F.when(F.col("__nu__") == 0, F.lit(0).cast("bigint"))
        .otherwise(F.expr("__nh__ * 1000000 div __nu__"))
        .alias("__echo__"),
    )
    return (
        scored.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.max("__echo__").cast("bigint").alias("max_echo_micro"),
            F.sum("__echo__").cast("bigint").alias("__sum__"),
            F.sum(
                F.when(
                    F.col("__echo__") >= echo_threshold_micro, 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_echoed"),
        )
        .select(
            "conv_id",
            "n_pairs",
            "max_echo_micro",
            F.expr("__sum__ div n_pairs").alias("avg_echo_micro"),
            "n_echoed",
            (F.col("n_echoed") > 0).alias("has_echo"),
        )
    )


# character class accepted as a "finished" final character: sentence
# terminators plus closing quotes/brackets/backtick (a fenced block's
# closing ``` ends with a backtick)
_TERMINAL_CHARS = ".!?\"')]}`"


def truncation_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    assistant_role: str = "assistant",
) -> DataFrame:
    """Cut-off / malformed-ending detector over assistant responses —
    the SFT hygiene card for context-window truncation and streaming
    aborts. Four per-turn flags, all scan-side:

    - no_terminal: text with trailing whitespace removed (regexp
      ``\\s+$`` strip — plain rtrim only strips spaces, not \\n/\\t)
      is non-empty and its last character
      is not a sentence terminator / closing quote / bracket /
      backtick (``_TERMINAL_CHARS``) — mid-sentence cut.
    - odd_fence: an odd number of \\`\\`\\` fences — an unclosed code
      block (count via the replace-length identity, no regex).
    - ellipsis: rtrimmed text ends with '...' — a trailing-off
      response (the '…' codepoint is normalized to '...' upstream by
      parse stages; only the ASCII form is tested here).
    - odd_quote: an odd number of '"' characters — an unterminated
      quotation.

    Output per conversation: n_assistant, n_no_terminal, n_odd_fence,
    n_ellipsis, n_odd_quote, n_suspect (turns with ANY flag),
    suspect_ratio_micro (floor), has_suspect. Conversations with zero
    assistant turns emit no row (nothing to report on).

    Scale: flags are pure string expressions in codegen; the ONLY
    shuffle is the partial+final aggregate on conv_col, carrying six
    counters per conversation. Text never shuffles.
    """
    _require(df, [conv_col, role_col, text_col], "truncation_stats")
    t = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    trimmed = F.regexp_replace(t, r"\s+$", "")
    last = F.right(trimmed, F.lit(1))
    no_terminal = (trimmed != "") & (
        ~last.isin(*[c for c in _TERMINAL_CHARS])
    )
    n_fences = (F.length(t) - F.length(F.replace(t, F.lit("```")))) / 3
    odd_fence = (n_fences.cast("bigint") % 2) == 1
    ellipsis = F.endswith(trimmed, F.lit("..."))
    n_quotes = F.length(t) - F.length(F.replace(t, F.lit('"')))
    odd_quote = (n_quotes.cast("bigint") % 2) == 1
    flags = df.filter(F.col(role_col) == assistant_role).select(
        F.col(conv_col).alias("conv_id"),
        no_terminal.cast("long").alias("__no_term__"),
        odd_fence.cast("long").alias("__fence__"),
        ellipsis.cast("long").alias("__ell__"),
        odd_quote.cast("long").alias("__quote__"),
    )
    suspect = (
        (F.col("__no_term__") + F.col("__fence__") + F.col("__ell__")
         + F.col("__quote__")) > 0
    ).cast("long")
    agg = flags.withColumn("__suspect__", suspect).groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assistant"),
        F.sum("__no_term__").cast("bigint").alias("n_no_terminal"),
        F.sum("__fence__").cast("bigint").alias("n_odd_fence"),
        F.sum("__ell__").cast("bigint").alias("n_ellipsis"),
        F.sum("__quote__").cast("bigint").alias("n_odd_quote"),
        F.sum("__suspect__").cast("bigint").alias("n_suspect"),
    )
    return agg.select(
        "conv_id",
        "n_assistant",
        "n_no_terminal",
        "n_odd_fence",
        "n_ellipsis",
        "n_odd_quote",
        "n_suspect",
        F.expr("n_suspect * 1000000 div n_assistant").alias(
            "suspect_ratio_micro"
        ),
        (F.col("n_suspect") > 0).alias("has_suspect"),
    )


def top_user_prompts(
    df: DataFrame,
    k: int = 20,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    prompt_role: str = "user",
    normalize: bool = True,
) -> DataFrame:
    """FAQ mining: the ``k`` most frequent user prompts across the
    corpus, grouped by md5 of the C4-style normalized form
    (``dedup.normalize_expr`` — case / punctuation / whitespace
    variants of the same question count as one prompt; pass
    ``normalize=False`` for byte-exact grouping). The canned-question
    census drives cache design, intent routing, and eval-set
    decontamination (the most-asked prompts are exactly the ones that
    leak into benchmarks).

    Output: (prompt_md5, n_turns, n_convs, min_chars, max_chars,
    first_conv), ordered by (n_turns DESC, prompt_md5 ASC) — a total
    order, so the LIMIT cut is deterministic — with char bounds
    measured on the RAW text (the spread shows how much the variants
    differ). NULL-text turns are skipped (nothing to mine).

    Scale shape: text digests at the scan; the shuffle carries
    (digest, conv_id, chars). The distinct-conversation count is the
    standard two-phase distinct aggregate on the digest key, and the
    top-k cut is TakeOrderedAndProject — no global sort materializes.
    """
    from ilogtail_spark.dataops.dedup import normalize_expr

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    _require(df, [conv_col, role_col, text_col], "top_user_prompts")
    t = F.col(text_col).cast("string")
    keyed = (
        df.filter((F.col(role_col) == prompt_role) & t.isNotNull())
        .select(
            F.md5(normalize_expr(t) if normalize else t).alias("prompt_md5"),
            F.col(conv_col).alias("__conv__"),
            F.length(t).cast("bigint").alias("__ch__"),
        )
    )
    return (
        keyed.groupBy("prompt_md5")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_turns"),
            F.countDistinct("__conv__").cast("bigint").alias("n_convs"),
            F.min("__ch__").alias("min_chars"),
            F.max("__ch__").alias("max_chars"),
            F.min("__conv__").alias("first_conv"),
        )
        .orderBy(F.col("n_turns").desc(), F.col("prompt_md5").asc())
        .limit(k)
    )


def system_prompt_census(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    system_role: str = "system",
) -> DataFrame:
    """System-prompt census: how many distinct system prompts the
    corpus contains and how conversations distribute over them — the
    'how many templates is this dataset really' question that decides
    whether shared-prefix dedup (``prefix_report`` /
    ``preference_pairs``' hot-prefix cap) matters, and which personas
    dominate an SFT mix.

    Each conversation contributes its FIRST system turn (min turn_idx
    among ``system_role`` turns, digest as tiebreak for duplicate
    indices); conversations without one contribute nothing. Groups
    key on md5 of the raw text. Output: (prompt_md5, n_convs,
    n_chars, share_micro, first_conv) ordered by (n_convs DESC,
    prompt_md5 ASC); share_micro is the floor-micro share of
    system-bearing conversations, so shares sum to <= 1e6 exactly.

    Scale shape: text digests at the scan; the per-conversation
    struct-min is an ordinary aggregate on conv_col (no window), and
    the census is a second aggregate on the digest — both combiner-
    fed. The share window runs over the CENSUS table (one row per
    distinct prompt), so its single partition is bounded by template
    cardinality, not conversations.
    """
    _require(
        df, [conv_col, idx_col, role_col, text_col], "system_prompt_census"
    )
    t = F.col(text_col).cast("string")
    firsts = (
        df.filter(F.col(role_col) == system_role)
        .select(
            F.col(conv_col).alias("__conv__"),
            F.struct(
                F.col(idx_col).cast("bigint").alias("idx"),
                F.md5(t).alias("d"),
                F.length(t).cast("bigint").alias("ch"),
            ).alias("__s__"),
        )
        .groupBy("__conv__")
        .agg(F.min("__s__").alias("__first__"))
    )
    census = firsts.groupBy(
        F.col("__first__.d").alias("prompt_md5")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_convs"),
        F.min("__first__.ch").alias("n_chars"),
        F.min("__conv__").alias("first_conv"),
    )
    wall = Window.partitionBy()
    return (
        census.withColumn(
            "__tot__", F.sum("n_convs").over(wall)
        )
        .select(
            "prompt_md5",
            "n_convs",
            "n_chars",
            F.expr("n_convs * 1000000 div __tot__").alias("share_micro"),
            "first_conv",
        )
        .orderBy(F.col("n_convs").desc(), F.col("prompt_md5").asc())
    )


def cost_report(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    rate_in_micro_per_1k: int = 3_000,
    rate_out_micro_per_1k: int = 15_000,
    assistant_role: str = "assistant",
) -> DataFrame:
    """Per-conversation API-cost card with CONTEXT REPLAY: every
    assistant turn is billed for all tokens that preceded it (chat
    APIs re-send the whole history each call), so a conversation's
    prompt bill grows quadratically with its length — the number this
    report exists to surface before the invoice does.

    Per conversation: n_turns, prompt_tokens (whitespace tokens in
    non-assistant turns — the single-pass lower bound), completion_
    tokens (assistant turns), replay_prompt_tokens (sum over
    assistant turns of ALL tokens before that turn in canonical
    order — what the API actually charges as input), and cost_micro =
    replay_prompt_tokens * rate_in div 1000 + completion_tokens *
    rate_out div 1000 (two independent floors — the DEFINITION, so
    engines agree bit-for-bit; rates are micro-currency per 1k
    tokens). Canonical turn order is (idx, role, text digest), the
    same engine-stable tiebreak as repeated_turn_stats.

    Scale shape: token counts are scan-side; ONE exchange on conv_id
    feeds both the replay running-sum window and the final aggregate;
    the 128-bit DECIMAL products keep cost exact past 10^31
    token-micro units.
    """
    _require(df, [conv_col, idx_col, role_col, text_col], "cost_report")
    from ilogtail_spark.dataops.dedup import tokens_col

    t = F.col(text_col).cast("string")
    slim = df.select(
        F.col(conv_col).alias("conv_id"),
        F.coalesce(F.col(idx_col).cast("bigint"), F.lit(-1)).alias(
            "__idx__"
        ),
        F.coalesce(F.col(role_col), F.lit("")).alias("__role__"),
        F.coalesce(F.md5(t), F.lit("")).alias("__d__"),
        F.size(tokens_col(F.coalesce(t, F.lit("")))).cast("bigint").alias(
            "__tok__"
        ),
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy("__idx__", "__role__", "__d__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_a = F.col("__role__") == assistant_role
    flagged = slim.withColumn(
        "__before__", F.coalesce(F.sum("__tok__").over(w), F.lit(0))
    )
    agg = flagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum(F.when(~is_a, F.col("__tok__")).otherwise(0))
        .cast("bigint")
        .alias("prompt_tokens"),
        F.sum(F.when(is_a, F.col("__tok__")).otherwise(0))
        .cast("bigint")
        .alias("completion_tokens"),
        F.sum(F.when(is_a, F.col("__before__")).otherwise(0))
        .cast("bigint")
        .alias("replay_prompt_tokens"),
    )
    return agg.withColumn(
        "cost_micro",
        F.expr(
            "CAST(CAST(replay_prompt_tokens AS DECIMAL(38,0)) * "
            f"{int(rate_in_micro_per_1k)} div 1000 + "
            "CAST(completion_tokens AS DECIMAL(38,0)) * "
            f"{int(rate_out_micro_per_1k)} div 1000 AS BIGINT)"
        ),
    )


def branching_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Regeneration/branching report: per conversation, how many turn
    SLOTS hold more than one distinct message — the export artifact a
    "regenerate response" or edited-and-resent turn leaves behind
    (several rows sharing one (turn_idx, role) with different text).
    The sibling rows silently double training data if the exporter is
    trusted blindly; repeated_turn_stats cannot see them because the
    siblings are identical in POSITION, not adjacent in content.

    Per conversation: n_slots (distinct (turn_idx, role) positions),
    n_messages (distinct (turn_idx, role, digest) variants — exact
    duplicates of one variant count once), n_branch_points (slots
    with >= 2 variants), max_siblings (most variants in one slot),
    has_branches.

    Scale shape: text digests at the scan; the variant set collapses
    map-side via a distinct on (conv, idx, role, digest) — the only
    row-volume shuffle, keyed on all four columns so even a mega-
    conversation spreads across tasks — then two combiner-fed
    aggregates (per-slot variant count, per-conversation rollup) over
    the successively smaller slot and partial tables. On input
    already clustered by conversation (the usual transcript shape)
    Catalyst satisfies all three distributions from the upstream
    exchange and the whole report rides it.
    """
    _require(df, [conv_col, idx_col, role_col, text_col],
             "branching_stats")
    variants = df.select(
        F.col(conv_col).alias("conv_id"),
        F.coalesce(F.col(idx_col).cast("bigint"), F.lit(-1)).alias(
            "__idx__"
        ),
        F.coalesce(F.col(role_col), F.lit("")).alias("__role__"),
        F.coalesce(F.md5(F.col(text_col).cast("string")), F.lit(""))
        .alias("__d__"),
    ).distinct()
    slots = variants.groupBy("conv_id", "__idx__", "__role__").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nv__")
    )
    return slots.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_slots"),
        F.sum("__nv__").cast("bigint").alias("n_messages"),
        F.sum(F.when(F.col("__nv__") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_branch_points"),
        F.max("__nv__").cast("bigint").alias("max_siblings"),
        (F.max("__nv__") >= 2).alias("has_branches"),
    )


def rephrase_report(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    role: str = "user",
    max_chars: int = 200,
    sim_threshold_micro: int = 600_000,
) -> DataFrame:
    """User-retry (rephrase) report: per conversation, how similar
    consecutive turns OF ONE ROLE are — the "user asked the same
    thing again, slightly reworded" signal. repeated_turn_stats
    catches EXACT adjacent repeats; this catches the near-misses
    ("how do I reset my password" -> "how can I reset my password")
    that mean the previous answer did not land. In SFT curation,
    high-rephrase conversations are the ones whose assistant turns
    should NOT be up-weighted.

    Similarity per consecutive same-role pair is Levenshtein over
    the first ``max_chars`` characters, normalized to floor micros:
    sim = (maxlen - dist) * 1e6 div maxlen, with both-empty pairs
    defined as 1e6 (identical). The edit distance runs JVM-side
    (``F.levenshtein`` — codegen, no Python), and the same function
    exists verbatim in DuckDB, so the oracle shares the math.

    Output per conversation with >= 2 such turns: (conv_id,
    n_role_turns, n_pairs, n_rephrases [sim >= threshold],
    n_exact_repeats [dist == 0], max_sim_micro).

    Scale shape: ONE exchange on conv_id feeds the lag window and
    the rollup. The shuffle payload is the CAPPED prefix (max_chars
    chars, default 200) plus a digest for tie ordering — the one
    conversations-module shuffle that carries any text, bounded by
    design and documented here; raise max_chars knowingly.
    """
    _require(df, [conv_col, idx_col, role_col, text_col],
             "rephrase_report")
    if max_chars < 1:
        raise ValueError(
            f"rephrase_report: max_chars must be >= 1, got {max_chars}"
        )
    if not 0 <= sim_threshold_micro <= 1_000_000:
        raise ValueError(
            "rephrase_report: sim_threshold_micro must be in [0, 1e6], "
            f"got {sim_threshold_micro}"
        )
    slim = df.filter(F.col(role_col) == role).select(
        F.col(conv_col).alias("conv_id"),
        F.coalesce(F.col(idx_col).cast("bigint"), F.lit(-1)).alias("__idx__"),
        F.coalesce(F.md5(F.col(text_col).cast("string")), F.lit("")).alias(
            "__d__"
        ),
        F.substring(
            F.coalesce(F.col(text_col), F.lit("")), 1, max_chars
        ).alias("__s__"),
    )
    w = Window.partitionBy("conv_id").orderBy("__idx__", "__d__")
    paired = slim.withColumn("__prev__", F.lag("__s__").over(w))
    scored = paired.select(
        "conv_id",
        F.when(F.col("__prev__").isNull(), None)
        .otherwise(F.levenshtein("__s__", "__prev__"))
        .cast("bigint")
        .alias("__dist__"),
        F.greatest(F.length("__s__"), F.length("__prev__"))
        .cast("bigint")
        .alias("__ml__"),
    )
    sim = F.when(F.col("__dist__").isNull(), None).otherwise(
        F.when(F.col("__ml__") == 0, F.lit(1_000_000)).otherwise(
            F.expr("(__ml__ - __dist__) * 1000000 div __ml__")
        )
    )
    agg = (
        scored.withColumn("__sim__", sim)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_role_turns"),
            F.count("__sim__").cast("bigint").alias("n_pairs"),
            F.sum(
                F.when(
                    F.col("__sim__") >= sim_threshold_micro, 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_rephrases"),
            F.sum(F.when(F.col("__dist__") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact_repeats"),
            F.max("__sim__").cast("bigint").alias("max_sim_micro"),
        )
        .filter(F.col("n_pairs") > 0)
    )
    return agg


def loss_mask_spans(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep_len: int = 1,
    mask_role: str = "assistant",
) -> DataFrame:
    """Trainer-facing loss-mask span table: when a conversation's
    turns are concatenated (in the canonical engine-stable order,
    ``sep_len`` separator characters between turns) into one training
    sample, which character span does each turn occupy and is it a
    LOSS span (the role being trained on, default assistant) or a
    context span? This is the offsets file every SFT tokenizer
    consumes next to the packed text — computing it here means the
    packer never re-scans the corpus to find span boundaries.

    Output, one row per turn: (conv_id, turn_idx, role, start_off,
    end_off [exclusive, = start + turn length], masked [True = LOSS
    span], text_md5 [joins the span back to its turn without moving
    text]). NULL text counts as length 0; offsets are chars, not
    bytes — swap in octet_length upstream for byte-addressed
    tokenizers.

    Scale shape: text collapses to (length, digest) at the scan; ONE
    exchange on conv_id drives the running-sum window, and the output
    adds two longs per turn. The packed text itself never shuffles —
    this table only makes sense against a packer that concatenates
    turns in the SAME canonical order the repo's conversation
    operators all share (coalesced idx, then role, then text digest —
    the _ordered_turn_seq order), with ``sep_len`` separator chars
    between turns; the span-vs-packed-text identity under that
    contract is pinned in test. A packer concatenating in raw input
    order instead would mis-index conversations with duplicate or
    NULL turn_idx.
    """
    _require(df, [conv_col, idx_col, role_col, text_col],
             "loss_mask_spans")
    if sep_len < 0:
        raise ValueError(
            f"loss_mask_spans: sep_len must be >= 0, got {sep_len}"
        )
    slim = df.select(
        F.col(conv_col).alias("conv_id"),
        F.coalesce(F.col(idx_col).cast("bigint"), F.lit(-1)).alias("__idx__"),
        F.coalesce(F.col(role_col), F.lit("")).alias("role"),
        F.coalesce(F.md5(F.col(text_col).cast("string")), F.lit("")).alias(
            "text_md5"
        ),
        F.coalesce(F.length(F.col(text_col)), F.lit(0))
        .cast("bigint")
        .alias("__len__"),
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy("__idx__", "role", "text_md5")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(
        F.sum(F.col("__len__") + F.lit(int(sep_len))).over(w), F.lit(0)
    )
    return slim.select(
        "conv_id",
        F.col("__idx__").alias("turn_idx"),
        "role",
        start.cast("bigint").alias("start_off"),
        (start + F.col("__len__")).cast("bigint").alias("end_off"),
        (F.col("role") == mask_role).alias("masked"),
        "text_md5",
    )


RESOLUTION_POS_RE = (
    "(?i)(thanks|thank you|that works|works now|perfect|solved|resolved)"
)
RESOLUTION_NEG_RE = (
    "(?i)(still not|still doesn't|still broken|not working|"
    "doesn't work|same error|no luck)"
)


def resolution_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    role: str = "user",
    pos_pattern: str = RESOLUTION_POS_RE,
    neg_pattern: str = RESOLUTION_NEG_RE,
) -> DataFrame:
    """Conversation-outcome card: did the user walk away satisfied?
    Structure-based hygiene (completion_stats' dangling-turn report)
    cannot tell "resolved" from "gave up" — this reads the CONTENT of
    the user's turns for closure markers instead. Positive markers
    ("thanks", "that works", "solved") and negative markers ("still
    not working", "same error") are matched per user turn scan-side;
    the verdict comes from the LAST user turn, with negative winning
    ties ("thanks, but still broken" is unresolved — politeness is
    not closure).

    Output per conversation with >= 1 ``role`` turn: (conv_id,
    n_user_turns, n_pos_turns, n_neg_turns, outcome) where outcome is
    'unresolved' (last user turn negative), 'resolved' (positive),
    else 'unknown'. The default patterns are deliberately simple
    alternations (same semantics under Java regex and RE2, shared
    with the DuckDB oracle) — swap in product-specific markers via
    the parameters; a trained classifier slots in the same way the
    textstats lang-id heuristic documents.

    Scale shape: both regexes collapse each turn to two booleans at
    the scan; ONE exchange on conv_id feeds the last-turn window and
    the rollup, and no text survives past the scan projection.
    """
    _require(df, [conv_col, idx_col, role_col, text_col],
             "resolution_stats")
    turns = df.filter(F.col(role_col) == role).select(
        F.col(conv_col).alias("conv_id"),
        F.coalesce(F.col(idx_col).cast("bigint"), F.lit(-1)).alias("__idx__"),
        F.coalesce(F.md5(F.col(text_col).cast("string")), F.lit("")).alias(
            "__d__"
        ),
        F.coalesce(F.col(text_col), F.lit(""))
        .rlike(pos_pattern)
        .alias("__pos__"),
        F.coalesce(F.col(text_col), F.lit(""))
        .rlike(neg_pattern)
        .alias("__neg__"),
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.col("__idx__").desc(), F.col("__d__").desc()
    )
    ranked = turns.withColumn("__rn__", F.row_number().over(w))
    return ranked.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_user_turns"),
        F.sum(F.when(F.col("__pos__"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos_turns"),
        F.sum(F.when(F.col("__neg__"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_neg_turns"),
        F.max(
            F.when(
                F.col("__rn__") == 1,
                F.when(F.col("__neg__"), "unresolved")
                .when(F.col("__pos__"), "resolved")
                .otherwise("unknown"),
            )
        ).alias("outcome"),
    )


def markdown_census(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    role: str = "assistant",
) -> DataFrame:
    """Formatting census over one role's turns (default: assistant
    responses) — the training-mixture question "how much of this
    corpus is code / structured markdown vs plain prose?" that
    decides sampling weights before SFT packing. Counts four marker
    families per conversation:

    - ``n_code_blocks``: fenced code blocks — triple-backtick marker
      count // 2, so an unclosed trailing fence (truncation_stats'
      signal) is NOT a block here;
    - ``n_bullet_lines``: lines starting ``"- "``;
    - ``n_heading_lines``: lines starting ``"#"``;
    - ``n_links``: ``](`` occurrences (the markdown link/image pivot);

    plus n_turns (the role's turns) and n_md_turns (turns with any
    marker). Every count is the replace-length identity or a
    line-prefix filter — integer codegen expressions with no regex,
    so Java/RE2/DuckDB can't diverge on syntax. Conversations with
    zero ``role`` turns emit no row.

    Scale shape: each turn collapses to five small integers at the
    scan (text never shuffles); ONE combiner-fed hash aggregate on
    conv_id is the only exchange. A trained code-detector slots in
    the same way the lang-id heuristic documents.
    """
    _require(df, [conv_col, role_col, text_col], "markdown_census")
    t = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    fence_markers = (
        F.length(t) - F.length(F.replace(t, F.lit("```"), F.lit("")))
    ) / F.lit(3)
    lines = F.split(t, "\n")
    bullets = F.size(
        F.filter(lines, lambda x: F.substring(x, 1, 2) == F.lit("- "))
    )
    headings = F.size(
        F.filter(lines, lambda x: F.substring(x, 1, 1) == F.lit("#"))
    )
    links = (
        F.length(t) - F.length(F.replace(t, F.lit("]("), F.lit("")))
    ) / F.lit(2)
    turns = df.filter(F.col(role_col) == role).select(
        F.col(conv_col).alias("conv_id"),
        (fence_markers.cast("bigint") / F.lit(2))
        .cast("bigint")
        .alias("__blocks__"),
        bullets.cast("bigint").alias("__bullets__"),
        headings.cast("bigint").alias("__headings__"),
        links.cast("bigint").alias("__links__"),
    )
    any_md = (
        (F.col("__blocks__") > 0)
        | (F.col("__bullets__") > 0)
        | (F.col("__headings__") > 0)
        | (F.col("__links__") > 0)
    )
    return turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum(F.when(any_md, 1).otherwise(0)).cast("bigint").alias(
            "n_md_turns"
        ),
        F.sum("__blocks__").cast("bigint").alias("n_code_blocks"),
        F.sum("__bullets__").cast("bigint").alias("n_bullet_lines"),
        F.sum("__headings__").cast("bigint").alias("n_heading_lines"),
        F.sum("__links__").cast("bigint").alias("n_links"),
    )


def turn_balance(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    user_role: str = "user",
    assistant_role: str = "assistant",
) -> DataFrame:
    """Per-conversation structural balance card: who does the talking,
    and does the dialog actually alternate? role_stats answers these
    for the CORPUS; training-mix filters need them per conversation
    ("drop assistant monologues", "drop interrogation transcripts
    where the user never gets an answer"). Content quality is
    conversation_quality_gate's job — this reads only structure.

    Output per conversation: (conv_id, n_turns, n_user_turns,
    n_assistant_turns, user_chars, assistant_chars,
    assistant_char_share_micro [assistant chars / (user + assistant
    chars), NULL when both are zero], alternation_micro [share of
    consecutive-turn pairs, in (idx, role, text-digest) order, whose
    roles differ; NULL for single-turn conversations]). All
    floor-micro integer divisions; NULL text counts zero chars;
    roles outside the two named ones count toward n_turns and the
    alternation chain but neither char sum.

    Scale shape: each turn collapses to (conv_id, idx, role-class,
    chars, digest) at the scan; the lag window and the rollup share
    ONE conv_id exchange; text never shuffles (the digest is only
    the deterministic tie-break, the loss_mask ordering contract).
    """
    _require(df, [conv_col, idx_col, role_col, text_col], "turn_balance")
    t = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    slim = df.select(
        F.col(conv_col).alias("conv_id"),
        F.coalesce(F.col(idx_col).cast("bigint"), F.lit(-1)).alias("__idx__"),
        F.coalesce(F.col(role_col), F.lit("")).alias("__role__"),
        F.length(t).cast("bigint").alias("__ch__"),
        F.md5(t).alias("__d__"),
    )
    w = Window.partitionBy("conv_id").orderBy("__idx__", "__role__", "__d__")
    lagged = slim.withColumn("__prev_role__", F.lag("__role__").over(w))
    agg = lagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum(F.when(F.col("__role__") == user_role, 1).otherwise(0))
        .cast("bigint")
        .alias("n_user_turns"),
        F.sum(F.when(F.col("__role__") == assistant_role, 1).otherwise(0))
        .cast("bigint")
        .alias("n_assistant_turns"),
        F.sum(
            F.when(F.col("__role__") == user_role, F.col("__ch__")).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("user_chars"),
        F.sum(
            F.when(
                F.col("__role__") == assistant_role, F.col("__ch__")
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("assistant_chars"),
        F.sum(
            F.when(
                F.col("__prev_role__").isNotNull()
                & (F.col("__role__") != F.col("__prev_role__")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("__alt__"),
    )
    return agg.select(
        "conv_id",
        "n_turns",
        "n_user_turns",
        "n_assistant_turns",
        "user_chars",
        "assistant_chars",
        F.when(
            F.col("user_chars") + F.col("assistant_chars") > 0,
            F.expr(
                "assistant_chars * 1000000 div (user_chars + assistant_chars)"
            ),
        )
        .cast("bigint")
        .alias("assistant_char_share_micro"),
        F.when(
            F.col("n_turns") > 1,
            F.expr("__alt__ * 1000000 div (n_turns - 1)"),
        )
        .cast("bigint")
        .alias("alternation_micro"),
    )
