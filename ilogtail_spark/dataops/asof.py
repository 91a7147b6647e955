"""As-of (nearest-prior) join — the time-series enrichment join
Spark's DataFrame API lacks as a primitive (pandas ``merge_asof``,
QuestDB/DuckDB ``ASOF JOIN``, kdb ``aj``): for every left event,
attach the latest right row with the same key whose timestamp is at
or before the event's.

The textbook distributed implementation is NOT a range join (which
plans a pair-explosion or a broadcast nested loop): both sides are
UNIONED into one narrow stream and a single running ``last(payload,
ignorenulls=True)`` window per key carries each right row forward to
every later left row. Scale shape at 100 TB:

* ONE shuffle total, on the join key — both sides partition once and
  stream through one sort; no pair join, no per-row probe structure.
* State per task is O(1): the window carries exactly one payload
  struct (the current as-of candidate) regardless of history length.
* The right payload rides as a struct so adding columns never adds
  plan nodes or extra windows.
* Hot-key caveat (same as sessionization): one key with billions of
  rows serializes into a task — bound by time bucket first (join on
  (key, day) with a per-day seed row) when a key can exceed a task.

Tie semantics match DuckDB ``ASOF JOIN`` on ``l.ts >= r.ts`` with a
deterministic winner among equal right timestamps: the payload struct
orders lexicographically by ``right_cols``, so at one timestamp the
GREATEST payload wins — pass a unique id as ``right_cols[0]`` to pin
the choice (mirrored in oracles by a keep-max dedup CTE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    tolerance_seconds: float | None = None,
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``prefix+ts_col``
    (the matched right timestamp) and ``prefix+c`` for each payload
    column ``c`` in ``right_cols`` — NULL when no right row at or
    before the event exists (or none within ``tolerance_seconds``).

    ``strict=True`` matches strictly-earlier right rows only
    (``l.ts > r.ts``). Right rows with a NULL key or NULL timestamp
    can never be "the latest prior state" and are dropped from the
    match stream (SQL equality semantics: NULL keys match nothing);
    left rows always survive, with NULL as-of columns when
    unmatchable.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts_col)]
    lcols = list(left.columns)

    rp = right.filter(F.col(on).isNotNull() & F.col(ts_col).isNotNull()).select(
        F.col(on).alias("__k__"),
        F.col(ts_col).alias("__ts__"),
        F.struct(
            F.col(ts_col).alias("__mts__"),
            *[F.col(c).alias(c) for c in right_cols],
        ).alias("__rp__"),
    )
    rp_type = rp.schema["__rp__"].dataType

    lp = left.select(
        F.col(on).alias("__k__"),
        F.col(ts_col).alias("__ts__"),
        F.lit(None).cast(rp_type).alias("__rp__"),
        F.struct(*[F.col(c) for c in lcols]).alias("__lp__"),
        F.lit(1).alias("__side__"),
    )
    lp_type = lp.schema["__lp__"].dataType
    # inclusive: right rows sort BEFORE left rows at an equal
    # timestamp (side 0 < 1) so ``last`` sees them; strict: after
    # (side 2 > 1) so the window up to the left row excludes them.
    r2 = rp.select(
        "__k__",
        "__ts__",
        "__rp__",
        F.lit(None).cast(lp_type).alias("__lp__"),
        F.lit(2 if strict else 0).alias("__side__"),
    )

    w = (
        Window.partitionBy("__k__")
        .orderBy(
            F.col("__ts__").asc_nulls_first(),
            F.col("__side__").asc(),
            F.col("__rp__").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = lp.unionByName(r2).withColumn(
        "__m__", F.last("__rp__", ignorenulls=True).over(w)
    )

    matched: Column = F.col("__m__")
    if tolerance_seconds is not None:
        horizon_us = int(tolerance_seconds * 1_000_000)
        within = (
            F.unix_micros(matched["__mts__"].cast("timestamp"))
            >= F.unix_micros(F.col("__ts__").cast("timestamp")) - horizon_us
        )
        matched = F.when(within, matched)

    return m.filter(F.col("__side__") == 1).select(
        *[F.col("__lp__")[c].alias(c) for c in lcols],
        matched["__mts__"].alias(prefix + ts_col),
        *[matched[c].alias(prefix + c) for c in right_cols],
    )
