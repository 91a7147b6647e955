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
  rows serializes into a task. ``bucket_seconds`` bounds it: the
  stream joins on (key, time-bucket) instead, and a per-bucket SEED
  row carries the last prior state across bucket boundaries — the
  result is IDENTICAL to the unbucketed join (parity is test-pinned
  and the registry query shares the plain DuckDB ASOF oracle), but
  the per-task window state is one bucket of one key, so a hot key
  spreads over #buckets tasks instead of serializing into one.

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
    bucket_seconds: int | None = None,
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

    ``bucket_seconds`` (e.g. 86400 for daily) switches to the
    skew-safe plan: windows partition on (key, bucket) and seed rows
    carry the latest prior right state into each bucket, so no task
    ever sorts more than one bucket of one key. Results are identical
    to the unbucketed join — use it whenever a single key's row count
    can exceed a task (the hot-conversation regime).
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

    order = [
        F.col("__ts__").asc_nulls_first(),
        F.col("__side__").asc(),
        F.col("__rp__").asc_nulls_first(),
    ]
    if bucket_seconds is None:
        w = (
            Window.partitionBy("__k__")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        m = lp.unionByName(r2).withColumn(
            "__m__", F.last("__rp__", ignorenulls=True).over(w)
        )
    else:
        # skew-safe variant: window per (key, bucket); per-bucket SEED
        # rows carry the latest prior right state across boundaries.
        # The payload struct leads with the right timestamp, so
        # max(__rp__) IS the running-last winner — per bucket, and
        # across buckets (later buckets strictly dominate on ts).
        bucket_us = int(bucket_seconds) * 1_000_000
        ts_type = rp.schema["__ts__"].dataType

        def b_of(ts: Column) -> Column:
            return F.floor(
                F.unix_micros(ts.cast("timestamp")) / F.lit(bucket_us)
            )

        rb = r2.withColumn("__b__", b_of(F.col("__ts__")))
        lb = lp.withColumn("__b__", b_of(F.col("__ts__")))
        cand = rb.groupBy("__k__", "__b__").agg(F.max("__rp__").alias("__c__"))
        allb = (
            lb.select("__k__", "__b__")
            .distinct()
            .unionByName(cand.select("__k__", "__b__"))
            .distinct()
        )
        # running max over STRICTLY EARLIER buckets — a per-key window
        # again, but over the per-bucket candidate rows (cardinality =
        # active buckets per key, e.g. days), never the event stream
        wseed = (
            Window.partitionBy("__k__")
            .orderBy(F.col("__b__").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        seeds = (
            allb.join(cand, ["__k__", "__b__"], "left")
            .withColumn("__carry__", F.max("__c__").over(wseed))
            .where(F.col("__carry__").isNotNull())
            .select(
                "__k__",
                F.lit(None).cast(ts_type).alias("__ts__"),
                F.col("__carry__").alias("__rp__"),
                F.lit(None).cast(lp_type).alias("__lp__"),
                F.lit(-1).alias("__side__"),
                "__b__",
            )
        )
        w = (
            Window.partitionBy("__k__", "__b__")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        m = (
            lb.unionByName(rb)
            .unionByName(seeds)
            .withColumn("__m__", F.last("__rp__", ignorenulls=True).over(w))
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
