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


def _require(df: DataFrame, cols: list[str], op: str) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"{op}: input is missing columns {missing}")


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
