"""Event sessionization — the gap-based session assignment every
log-analytics stack exposes (SLS/Splunk `transaction`, BigQuery
sessionize, Flink session windows), batch form.

A session is a maximal run of one user's events where consecutive
events are ≤ ``gap_seconds`` apart. Implemented as the classic
two-window composition:

    lag(ts) over (user, ts)  ->  is_new_session flag
    sum(flag) over (user, ts rows unbounded preceding)  ->  ordinal

Scale shape at 100 TB: ONE shuffle, on the user key (both windows
share the same partitioning, Catalyst plans a single Exchange + one
Sort; verified in PLANS.md). State per task is O(1) — running
windows stream through sorted rows, nothing is buffered per user.
Hot-key caveat: a single user with billions of events serializes
into one task — :func:`sessionize_bounded` bounds the partition to
(user, day) so a hot key spreads over #days tasks (sessions then
never span the boundary — the BigQuery-sessionize / daily-rollup
semantics), or pre-split synthetic actors upstream with the
pipeline's skew salting ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str | None = None,
) -> DataFrame:
    """Append ``session_ordinal`` (1-based per user) and
    ``session_id`` (``"<user>:<ordinal>"``) to every event.

    ``order_col``: unique tie-break for simultaneous events (defaults
    to ``ts`` only — pass the event id when timestamps collide, so
    session assignment is deterministic).

    Events with a NULL timestamp cannot be placed in any session:
    they come back with NULL ``session_ordinal``/``session_id``
    instead of silently shifting the numbering of the user's real
    sessions (and instead of diverging between engines on NULL sort
    order). The gap compare runs on microseconds, so sub-second
    timestamps are exact.
    """
    sessioned = _sessionize_valid(df, gap_seconds, user_col, ts_col, order_col)
    unplaceable = (
        df.where(F.col(ts_col).isNull())
        .withColumn("session_ordinal", F.lit(None).cast("long"))
        .withColumn("session_id", F.lit(None).cast("string"))
    )
    return sessioned.unionByName(unplaceable)


def _sessionize_valid(
    df: DataFrame,
    gap_seconds: int,
    user_col: str,
    ts_col: str,
    order_col: str | None,
    extra_partition_cols: tuple[str, ...] = (),
    id_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Session assignment over the non-null-timestamp rows only — the
    ONE lag/flag/running-sum core shared by :func:`sessionize` and
    :func:`sessionize_bounded` (``extra_partition_cols`` adds the
    bucket key; ``id_cols`` are the session_id prefix components)."""
    valid = df.where(F.col(ts_col).isNotNull())
    order = [F.col(ts_col).asc()] + (
        [F.col(order_col).asc()] if order_col else []
    )
    parts = [F.col(user_col)] + [F.col(c) for c in extra_partition_cols]
    w = Window.partitionBy(*parts).orderBy(*order)
    # parquet TIMESTAMP may load as NTZ, which cannot cast to long
    # directly — route through a zoned timestamp (session tz is UTC)
    epoch_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(epoch_us).over(w)
    new_sess = F.when(
        prev_us.isNull() | (epoch_us - prev_us > gap_seconds * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(*parts).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_ord = valid.withColumn("session_ordinal", F.sum(new_sess).over(run))
    id_cols = id_cols or (user_col,)
    return with_ord.withColumn(
        "session_id",
        F.concat_ws(
            ":",
            *[F.col(c).cast("string") for c in id_cols],
            F.col("session_ordinal"),
        ),
    )


def sessionize_bounded(
    df: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str | None = None,
    bound_seconds: int = 86_400,
) -> DataFrame:
    """Day-bounded (generally: ``bound_seconds``-bounded) session
    assignment — the skew-safe twin of :func:`sessionize` for the
    hot-key regime where one user's events can exceed a task.

    Windows partition on (user, bucket) where bucket =
    floor(epoch / bound_seconds), so the per-task sort is one bucket
    of one user. SEMANTICS DIFFER from the unbounded form by design:
    a session never spans a bucket boundary (an event stream running
    past UTC midnight starts a new session) — the daily-session
    contract of BigQuery sessionize / batch rollup jobs, where the
    boundary split is the point, not a defect. Appends
    ``session_bucket`` (the bucket ordinal, day number for the
    default), ``session_ordinal`` (1-based per user+bucket) and
    ``session_id`` (``"<user>:<bucket>:<ordinal>"``). NULL-timestamp
    events get NULL session columns, as in :func:`sessionize`.
    """
    epoch_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket = F.floor(epoch_us / F.lit(int(bound_seconds) * 1_000_000))
    bucketed = df.withColumn("session_bucket", bucket)
    sessioned = _sessionize_valid(
        bucketed,
        gap_seconds,
        user_col,
        ts_col,
        order_col,
        extra_partition_cols=("session_bucket",),
        id_cols=(user_col, "session_bucket"),
    )
    unplaceable = (
        bucketed.where(F.col(ts_col).isNull())  # session_bucket already NULL
        .withColumn("session_ordinal", F.lit(None).cast("long"))
        .withColumn("session_id", F.lit(None).cast("string"))
    )
    return sessioned.unionByName(unplaceable)


def session_stats(
    df: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str | None = None,
) -> DataFrame:
    """One row per session: (user, session_ordinal, n_events,
    started_at, ended_at, duration_sec). NULL-timestamp events belong
    to no session and are excluded. ``duration_sec`` is in whole
    seconds (floored epoch difference). The aggregate reuses the
    sessionize shuffle partitioning (user key prefix), so Catalyst
    plans no second Exchange for the groupBy."""
    s = _sessionize_valid(df, gap_seconds, user_col, ts_col, order_col)
    return s.groupBy(user_col, "session_ordinal").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("started_at"),
        F.max(ts_col).alias("ended_at"),
        (
            F.max(F.col(ts_col).cast("timestamp").cast("long"))
            - F.min(F.col(ts_col).cast("timestamp").cast("long"))
        ).alias("duration_sec"),
    )
