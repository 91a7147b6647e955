"""Exact distributional analytics over the events table — the
latency/value percentile report every log-analytics stack exposes
(SLS `approx_percentile`, Splunk `perc<N>`, Prometheus quantiles),
built EXACT and engine-reproducible instead of sketch-approximate.

Reference analog: iLogtail ships value distributions to SLS and the
percentile math happens server-side (closed); the self-monitor
counters (`core/monitor/MetricManager.h`) track only sums/counts.
Here the percentile itself is a first-class distributed operator.

Why nearest-rank (not interpolated): the nearest-rank percentile
(smallest value whose cumulative count reaches ceil(q * n)) is a
SELECTION — every engine that sorts the same totally-ordered values
returns the identical row, so DuckDB/Spark/anything agree bit-for-bit
with no floating interpolation-order drift. Interpolated quantiles
(Spark `percentile`, DuckDB `quantile_cont`) disagree in the last
ulp because the lerp is algebraically rearranged between engines.

Scale shape: the naive form is a full sort per group (one mega-group
= one task, the same failure sessionize_bounded exists for). This
implementation is the count-aggregation selection instead:

    (group, value) -> count            # narrow shuffle, combiner-fed
    cumsum over DISTINCT values        # per-group sort of the
                                       # VALUE DOMAIN, not the rows
    pick min value with cum >= k(q)    # scan of the distinct set

The wide state is bounded by distinct values per group, not row
count — for latencies/sizes (bounded-cardinality domains) that is
thousands of rows per group regardless of whether the group has 10^4
or 10^11 events. Row data never sorts globally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_quantiles(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    qs_micro: tuple[int, ...] = (500_000, 900_000, 990_000),
    out_value: str = "q_value",
) -> DataFrame:
    """Exact nearest-rank percentiles of ``value_col`` per group.

    ``qs_micro`` lists quantiles in MICRO units (parts per 1,000,000;
    500_000 = p50) — integer so the rank arithmetic k = ceil(q * n)
    is exact BIGINT on every engine. Returns one row per (group, q):
    (group, q_micro, n, q_value) where q_value is the smallest value
    whose cumulative count >= k (ties collapse naturally: equal
    values share one (group, value) count row). NULL values are
    excluded from the distribution (SQL aggregate convention); groups
    whose values are all NULL disappear.

    k = ceil(q_micro * n / 1e6) computed as (q_micro * n + 999_999)
    DIV 1_000_000, clamped to >= 1 so q_micro = 0 means the minimum.
    """
    if not qs_micro:
        raise ValueError("qs_micro must be non-empty")
    if any(q < 0 or q > 1_000_000 for q in qs_micro):
        raise ValueError("quantiles are micro units in [0, 1_000_000]")
    g, v = F.col(group_col), F.col(value_col)
    counts = (
        df.filter(v.isNotNull())
        .groupBy(g.alias("__g__"), v.alias("__v__"))
        .agg(F.count("*").alias("__c__"))
    )
    wcum = (
        Window.partitionBy("__g__")
        .orderBy("__v__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("__g__")
    cum = counts.withColumn("__cum__", F.sum("__c__").over(wcum)).withColumn(
        "__n__", F.sum("__c__").over(wn)
    )
    qs = F.explode(
        F.array(*[F.lit(int(q)).cast("bigint") for q in qs_micro])
    ).alias("q_micro")
    expanded = cum.select("*", qs)
    # integer ceil-div, no float: (a + 999_999) DIV 1_000_000 stays in
    # BIGINT (q_micro * n <= 1e6 * 1e12 overflows only past 9.2e18 /
    # 1e6 = 9.2e12 rows per group)
    k = F.greatest(
        F.lit(1).cast("bigint"),
        F.expr("(q_micro * __n__ + 999999) DIV 1000000"),
    )
    hit = expanded.filter(
        (F.col("__cum__") >= k) & ((F.col("__cum__") - F.col("__c__")) < k)
    )
    return hit.select(
        F.col("__g__").alias(group_col),
        F.col("q_micro"),
        F.col("__n__").alias("n"),
        F.col("__v__").alias(out_value),
    )


def _funnel_levels(
    df: DataFrame,
    steps: list[str],
    user_col: str,
    type_col: str,
    ts_expr: Column,
) -> list[DataFrame]:
    """Shared strict-sequence funnel levels: level k is the
    one-row-per-user (user, time) frame of each user's FIRST step-k
    event strictly after their level-(k-1) time. ``ts_expr`` is the
    ordering expression (raw timestamp for funnel_report, epoch
    micros for funnel_latency) — ONE construction for both cards so
    conversion membership can never drift between them. Later steps
    re-join the SINGLE-STEP event slice against the previous level
    (a single min per step cannot answer "first AFTER t_{k-1}" when
    events interleave); every post-shuffle frame is (user, time)."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct")
    narrow = df.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("__u__"),
        F.col(type_col).alias("__s__"),
        ts_expr.alias("__t__"),
    )
    levels: list[DataFrame] = [
        narrow.filter(F.col("__s__") == steps[0])
        .groupBy("__u__")
        .agg(F.min("__t__").alias("__r__"))
    ]
    for k in range(1, len(steps)):
        step_events = narrow.filter(F.col("__s__") == steps[k]).select(
            "__u__", "__t__"
        )
        levels.append(
            step_events.join(levels[k - 1], "__u__")
            .filter(F.col("__t__") > F.col("__r__"))
            .groupBy("__u__")
            .agg(F.min("__t__").alias("__r__"))
        )
    return levels


def funnel_report(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel analysis — "how many users reached step k IN
    ORDER?" (view → click → purchase), the conversion report every
    event-analytics stack exposes (SLS/BigQuery funnel SQL, Amplitude
    funnels). A user converts through step k if there exist events
    e_1 < e_2 < ... < e_k (strictly increasing timestamps) with the
    step types in order; classic strict-sequence semantics.

    Returns one row per step: (step_idx, step, n_users,
    conversion_micro) where conversion_micro is the exact integer
    share of step-1 users who reached this step (floor(n_k * 1e6 /
    n_1); 1_000_000 for step 1 itself, 0 when nobody entered).

    Scale shape: a narrow pre-projection keeps only funnel-step
    events as (user, step, ts); level k is "min event time of step k
    strictly after the user's level-(k-1) time", computed by joining
    the SINGLE-STEP event slice against the previous level's
    one-row-per-user frame — every post-shuffle frame is (user, ts).
    Raw events shuffle once per step they participate in (each event
    belongs to exactly one step slice), there is no window over the
    raw stream and no per-user sort, and the final report aggregate
    runs over |steps| x |users| tag rows collapsed map-side.
    """
    levels = _funnel_levels(df, steps, user_col, type_col, F.col(ts_col))
    tagged = levels[0].select(
        F.lit(1).alias("step_idx"), F.col("__u__")
    )
    for k in range(1, len(steps)):
        tagged = tagged.unionByName(
            levels[k].select(F.lit(k + 1).alias("step_idx"), F.col("__u__"))
        )
    counts = tagged.groupBy("step_idx").agg(F.count("*").alias("n_users"))
    names = df.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step_idx int, step string"
    )
    full = names.join(counts, "step_idx", "left").withColumn(
        "n_users", F.coalesce(F.col("n_users"), F.lit(0)).cast("bigint")
    )
    n1 = F.max(F.when(F.col("step_idx") == 1, F.col("n_users"))).over(
        Window.partitionBy()
    )
    return (
        full.withColumn("__n1__", n1)
        .withColumn(
            "conversion_micro",
            # integer DIV: exact at any count (float division could
            # land a hair under an integer and floor one off)
            F.expr(
                "CAST(CASE WHEN __n1__ > 0"
                " THEN (n_users * 1000000) DIV __n1__"
                " ELSE 0 END AS BIGINT)"
            ),
        )
        .select("step_idx", "step", "n_users", "conversion_micro")
        .orderBy("step_idx")
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention — "of the users whose FIRST event fell in
    period P, how many were active in P+k?" — the second standard
    event-analytics report next to :func:`funnel_report`.

    ``period`` is ``"day"`` or ``"week"`` (date_trunc buckets; weeks
    start Monday, Spark and DuckDB agree on ISO truncation). Returns
    (cohort, offset, n_users, retention_micro) where cohort is the
    truncated first-activity period, offset counts periods since the
    cohort period (0 = the cohort period itself, always 1_000_000
    micro by construction), and retention_micro is the exact integer
    share of the cohort still active (n_k * 1e6 DIV cohort_size).

    Scale shape: the raw stream collapses to DISTINCT (user, period)
    at the first aggregate (map-side combined — the narrow frame is
    bounded by users x active-periods, not events); first-activity
    is one more min-aggregate on that frame; the join back is
    co-keyed on user (one co-partitioned narrow join); the report
    aggregate and the cohort-size window run over (cohort, offset)
    cells — tiny. Raw events shuffle exactly once.
    """
    if period not in ("day", "week"):
        raise ValueError(f"period must be 'day' or 'week' (got {period!r})")
    per = F.date_trunc(period, F.col(ts_col))
    activity = (
        df.filter(F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("__u__"), per.alias("__p__"))
        .distinct()
    )
    cohorts = activity.groupBy("__u__").agg(F.min("__p__").alias("__c__"))
    joined = activity.join(cohorts, "__u__")
    div = 7 if period == "week" else 1
    offset = F.expr(
        f"CAST(datediff(CAST(__p__ AS DATE), CAST(__c__ AS DATE))"
        f" DIV {div} AS INT)"
    )
    cells = (
        joined.select(F.col("__c__").alias("cohort"), offset.alias("offset"))
        .groupBy("cohort", "offset")
        .agg(F.count("*").alias("n_users"))  # (user, period) is distinct
    )
    size = F.max(F.when(F.col("offset") == 0, F.col("n_users"))).over(
        Window.partitionBy("cohort")
    )
    return (
        cells.withColumn("__size__", size)
        .withColumn(
            "retention_micro",
            F.expr("CAST((n_users * 1000000) DIV __size__ AS BIGINT)"),
        )
        .select(
            # yyyy-MM-dd STRING, not DATE: pandas/Arrow bridges render
            # dates as midnight timestamps, so a string is the only
            # type every engine and compare layer prints identically
            F.date_format(F.col("cohort"), "yyyy-MM-dd").alias("cohort"),
            "offset",
            "n_users",
            "retention_micro",
        )
        .orderBy("cohort", "offset")
    )


# dense-axis buckets generated per explode row in gapfill_counts —
# bounds the per-row array allocation regardless of span width
_GAPFILL_CHUNK = 8192

# date_trunc units Spark actually recognizes (others return NULL)
_TRUNC_UNITS = {
    "year", "yyyy", "yy", "quarter", "month", "mon", "mm", "week",
    "day", "dd", "hour", "minute", "second", "millisecond",
    "microsecond",
}


def rate_spikes(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "hour",
    trailing: int = 24,
    factor_micro: int = 3_000_000,
    min_trailing: int = 3,
) -> DataFrame:
    """Event-rate spike report — "this hour's count is more than
    factor x its trailing average" per event type, the alert rule
    behind every log-volume anomaly monitor (SLS alerting, Datadog
    monitors). Statistical z-scores need stddev floats that engines
    disagree on in the last ulp; the factor-over-trailing-mean rule is
    EXACT INTEGER math (count * trailing_n * 1e6 > factor_micro *
    trailing_sum) so any engine raises the identical alerts.

    Per (type, bucket): (event_type, bucket_ts, n_events, trailing_n,
    trailing_sum, is_spike). The trailing window is the previous
    ``trailing`` OBSERVED buckets of that type (rows, not wall-clock:
    empty buckets don't produce rows — at log volume a silent hour is
    itself an anomaly, a different monitor). Buckets with fewer than
    ``min_trailing`` observed predecessors never flag (cold start).

    Scale shape: the raw stream collapses to (type, bucket) counts in
    ONE partial+final aggregate; the trailing window walks per-type
    bucket rows — thousands per type-year, regardless of event
    volume. Raw events shuffle zero times (map-side partials only
    feed the tiny aggregate exchange).
    """
    if trailing < 1:
        raise ValueError("trailing must be >= 1")
    if bucket.lower() not in _TRUNC_UNITS:
        # Spark's date_trunc silently yields NULL for unknown units —
        # every row would collapse into one (type, NULL) bucket
        raise ValueError(
            f"bucket must be one of {sorted(_TRUNC_UNITS)}, got {bucket!r}"
        )
    counts = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(
            F.col(type_col).alias("event_type"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
        )
        .agg(F.count("*").alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(-trailing, -1)
    )
    out = counts.withColumn(
        "trailing_n", F.count("n_events").over(w)
    ).withColumn(
        "trailing_sum",
        F.coalesce(F.sum("n_events").over(w), F.lit(0)).cast("bigint"),
    )
    is_spike = (F.col("trailing_n") >= min_trailing) & (
        F.col("n_events") * F.col("trailing_n") * F.lit(1_000_000)
        > F.lit(factor_micro) * F.col("trailing_sum")
    )
    return out.select(
        "event_type",
        "bucket_ts",
        "n_events",
        F.col("trailing_n").cast("bigint").alias("trailing_n"),
        "trailing_sum",
        is_spike.alias("is_spike"),
    )


def gapfill_counts(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    max_buckets: int | None = 2_000_000,
) -> DataFrame:
    """Dense per-(type, bucket) event counts with ZERO-FILLED gaps —
    the resample/gap-fill step every telemetry store exposes (PromQL
    range vectors, SLS time-series fill, Timescale time_bucket_gapfill).
    Sparse aggregates silently skip empty buckets, which breaks
    moving averages, rate math, and "silent hour" alerting downstream;
    this emits one row per bucket between each type's first and last
    event, count 0 where nothing happened.

    Returns (event_type, bucket_ts, n_events) — bucket_ts is the
    truncated bucket start; NULL timestamps are excluded.

    Scale shape: the event stream collapses to sparse (type, bucket)
    counts in ONE partial+final aggregate; fillers are then generated
    from each counts row's gap to its predecessor (one ``lag`` window
    per type over BUCKET rows) — ONE raw scan, ONE tiny window
    shuffle, NO join, and no second aggregate over raw events (a
    separate min/max-span branch would re-scan the input: column
    pruning makes the two counts subtrees differ, so Spark cannot
    reuse the exchange — measured, not guessed). Filler buckets
    explode in chunks of at most ``_GAPFILL_CHUNK`` so no single row
    materializes a gap-sized array. ``max_buckets`` bounds any SINGLE
    gap and fails the job LOUDLY instead of flooding it — one corrupt
    epoch-0 row in a 2026 dataset at minute buckets would otherwise
    quietly emit ~29M filler rows; pass None to uncap.
    """
    if bucket_seconds < 1:
        raise ValueError("bucket_seconds must be >= 1")
    step = int(bucket_seconds)
    chunk = _GAPFILL_CHUNK
    b = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / step).cast("bigint") * step
    )
    counts = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.col(type_col).alias("event_type"), b.alias("__bs__"))
        .agg(F.count("*").alias("__n__"))
    )
    w = Window.partitionBy("event_type").orderBy("__bs__")
    # fillers strictly between this bucket and its predecessor
    gap_n = F.coalesce(
        F.expr(f"(__bs__ - __prev__) div {step}") - F.lit(1),
        F.lit(0).cast("bigint"),
    )
    if max_buckets is not None:
        gap_n = F.when(
            gap_n > int(max_buckets),
            F.raise_error(
                F.format_string(
                    "gapfill_counts: type %s has a %s-bucket gap "
                    f"(> max_buckets={int(max_buckets)}) — corrupt "
                    "timestamp or too-fine bucket_seconds; pass "
                    "max_buckets=None to uncap",
                    F.col("event_type").cast("string"),
                    gap_n.cast("string"),
                )
            ).cast("bigint"),
        ).otherwise(gap_n)
    # chunk axis: filler chunks [0..(gap-1) div chunk], plus -1 = the
    # observed row itself (so every counts row survives the explode);
    # __gap__ feeds it, keeping the guard load-bearing in the plan
    chunks = F.concat(
        F.when(
            F.col("__gap__") > 0,
            F.sequence(
                F.lit(0).cast("bigint"),
                F.expr(f"(__gap__ - 1) div {chunk}"),
            ),
        ).otherwise(F.expr("array()").cast("array<bigint>")),
        F.array(F.lit(-1).cast("bigint")),
    )
    self_row = F.array(
        F.struct(
            F.col("__bs__").alias("b"), F.col("__n__").alias("n")
        )
    )
    filler_chunk = F.transform(
        F.sequence(
            F.col("__prev__") + (F.col("__c__") * chunk + 1) * step,
            F.col("__prev__")
            + F.least(
                F.col("__gap__"), (F.col("__c__") + 1) * F.lit(chunk)
            )
            * step,
            F.lit(step).cast("bigint"),
        ),
        lambda x: F.struct(
            x.alias("b"), F.lit(0).cast("bigint").alias("n")
        ),
    )
    return (
        counts.withColumn("__prev__", F.lag("__bs__").over(w))
        .withColumn("__gap__", gap_n)
        .withColumn("__c__", F.explode(chunks))
        .select(
            "event_type",
            F.explode(
                F.when(F.col("__c__") == -1, self_row).otherwise(filler_chunk)
            ).alias("__r__"),
        )
        .select(
            "event_type",
            F.col("__r__.b").cast("timestamp").alias("bucket_ts"),
            F.col("__r__.n").alias("n_events"),
        )
        .orderBy("event_type", "bucket_ts")
    )


def interval_join(
    points: DataFrame,
    ranges: DataFrame,
    point_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    keys: tuple[str, ...] = (),
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval equi-bucket join: pair every point row with
    every range row whose half-open window [start_ts, end_ts) contains
    the point's timestamp (and whose ``keys`` columns match) — the
    "which events happened during this incident / deploy / session
    window" primitive. Spark has no native range join (the inequality
    condition alone plans a cartesian BroadcastNestedLoopJoin), so
    this implements the standard bucketed decomposition:

      * points get ONE bucket each: floor(epoch / bucket_seconds)
      * each range EXPLODES over the buckets its window covers
      * equi-join on (keys..., bucket), then the exact
        start <= ts < end residual filter refines inside codegen

    Correct by construction without a distinct: a point's single
    bucket meets each range exactly once (the range covers any bucket
    at most once). Cost scales with range-length/bucket_seconds
    replication on the RANGE side only — size bucket_seconds near the
    typical window length so most ranges explode to 1-2 rows; the
    point side (the big side at 100 TB) never replicates, and both
    sides shuffle on (keys, bucket), so a hot key is diluted across
    its time axis rather than landing in one task.

    Rows with NULL timestamps/bounds and ranges with end <= start
    cannot match by definition and are dropped. Point columns keep
    their names; range columns arrive under ``r_`` prefixes to avoid
    collisions.
    """
    if bucket_seconds <= 0:
        raise ValueError(
            f"interval_join: bucket_seconds must be > 0, got {bucket_seconds}"
        )
    # exact integer MICROSECOND epoch on both sides: unix_timestamp
    # truncates to seconds, which would shift a sub-second point or
    # range boundary across a bucket edge. unix_micros only takes
    # TIMESTAMP — the ltz cast is a no-op there and pins NTZ columns
    # to the session zone (both sides get the same base, so bucket
    # alignment is unaffected)
    def _us(c: Column) -> Column:
        return F.unix_micros(c.cast("timestamp_ltz"))

    bucket_us = int(bucket_seconds) * 1_000_000
    pb = points.filter(F.col(point_ts).isNotNull()).withColumn(
        "__b__",
        F.floor(_us(F.col(point_ts)) / F.lit(bucket_us)).cast("bigint"),
    )
    rngs = ranges.select(
        *[F.col(c).alias(f"r_{c}") for c in ranges.columns]
    ).filter(
        F.col(f"r_{start_ts}").isNotNull()
        & F.col(f"r_{end_ts}").isNotNull()
        & (F.col(f"r_{end_ts}") > F.col(f"r_{start_ts}"))
    )
    # half-open window: the end-instant bucket is only needed when the
    # window extends INTO it (end not on the bucket boundary) — the
    # last covered instant is end - 1 microsecond, so floor((end_us -
    # 1) / bucket_us) keeps boundary ranges from exploding one bucket
    # wide of their coverage while sub-second ends still probe the
    # bucket they reach into
    eus = _us(F.col(f"r_{end_ts}"))
    rb = rngs.withColumn(
        "__b__",
        F.explode(
            F.sequence(
                F.floor(
                    _us(F.col(f"r_{start_ts}")) / F.lit(bucket_us)
                ).cast("bigint"),
                F.floor((eus - 1) / F.lit(bucket_us)).cast("bigint"),
            )
        ),
    )
    cond = pb["__b__"] == rb["__b__"]
    for k in keys:
        cond = cond & (pb[k] == rb[f"r_{k}"])
    residual = (pb[point_ts] >= rb[f"r_{start_ts}"]) & (
        pb[point_ts] < rb[f"r_{end_ts}"]
    )
    out = pb.join(rb, cond & residual, "inner")
    return out.select(
        *[pb[c] for c in points.columns],
        *[rb[f"r_{c}"] for c in ranges.columns],
    )


def _validate_window_alignment(
    op: str, window_seconds: int, slide_seconds: int
) -> None:
    """Shared window/slide validation for the hopping-window
    operators: positive durations and the exact-alignment rule
    (window a multiple of slide => every event lands in exactly
    window/slide windows, engine-portable integer math)."""
    if window_seconds <= 0 or slide_seconds <= 0:
        raise ValueError(
            f"{op}: window_seconds and slide_seconds must be > 0, "
            f"got {window_seconds}/{slide_seconds}"
        )
    if window_seconds % slide_seconds != 0:
        raise ValueError(
            f"{op}: window_seconds must be a multiple of "
            f"slide_seconds, got {window_seconds} % {slide_seconds} != 0"
        )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    window_seconds: int = 3600,
    slide_seconds: int = 900,
) -> DataFrame:
    """Hopping-window (sliding) counts per key: one row per
    (keys..., window) for every epoch-aligned window of
    ``window_seconds`` that advances by ``slide_seconds`` — the
    PromQL `rate()` / `increase()`-over-range-vector shape, and the
    exact batch twin of a Structured Streaming
    ``groupBy(window(...)).count()``. Each event lands in
    window/slide consecutive windows; only windows with at least one
    event appear (compose with gapfill_counts for a dense axis).

    window_seconds must be a multiple of slide_seconds: under that
    alignment every event belongs to EXACTLY window/slide windows
    (no partial-edge windows), which keeps the semantics
    engine-portable in exact integer microsecond math.

    Scale: Spark's TimeWindow expansion replicates each row
    window/slide times scan-side, but partial aggregation collapses
    to (keys, window) counts BEFORE the exchange — the shuffle
    carries one row per observed (key, window), never per event.
    Replication factor is the explicit window/slide knob.
    """
    _validate_window_alignment(
        "sliding_counts", window_seconds, slide_seconds
    )
    win = F.window(
        F.col(ts_col), f"{window_seconds} seconds", f"{slide_seconds} seconds"
    )
    return (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(*[F.col(k) for k in key_cols], win.alias("__w__"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            *key_cols,
            F.col("__w__.start").alias("window_start"),
            F.col("__w__.end").alias("window_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# log-template mining (Drain/Spell-style, by deterministic masking)
# ---------------------------------------------------------------------------

# ordered most-specific-first: a UUID contains hex runs and digits, an
# IPv4 contains digits, a 0x-literal contains digits — each later mask
# must not fire inside an earlier mask's placeholder (placeholders are
# digit-free, so the chain is confluent). Patterns are restricted to
# the syntax subset Java regex and RE2/DuckDB agree on (\b, \d,
# classes, bounded repeats — no lookaround, no backrefs) so the DuckDB
# oracle can run the IDENTICAL chain.
TEMPLATE_MASKS: tuple[tuple[str, str], ...] = (
    (
        r"\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
        r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\b",
        "<UUID>",
    ),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b0[xX][0-9a-fA-F]+\b", "<HEX>"),
    (r"\d+", "<NUM>"),
)


def mask_template(col: Column) -> Column:
    """The template of a log line: variable fields (uuids, IPv4s, hex
    literals, numbers) masked to typed placeholders. A pure chain of
    ``regexp_replace`` expressions — scan-side, codegen, zero Python.
    """
    out = col
    for pat, rep in TEMPLATE_MASKS:
        out = F.regexp_replace(out, pat, rep)
    return out


def template_masks_sql(expr: str) -> str:
    """The DuckDB-side mirror of :func:`mask_template` over ``expr``
    — the same ordered mask chain, so template strings can never
    desynchronize between the engines."""
    out = expr
    for pat, rep in TEMPLATE_MASKS:
        pat_sql = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{pat_sql}', '{rep}', 'g')"
    return out


def log_templates(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
) -> DataFrame:
    """Log-template mining — the "what KINDS of lines is this service
    emitting?" report behind Drain/Spell/LogMine and every
    log-clustering UI (SLS LogReduce, Datadog log patterns). Each
    line's variable fields are masked to typed placeholders
    (:data:`TEMPLATE_MASKS`) and identical templates aggregate to one
    row: (template, n_events, share_micro[, first_ts, last_ts]).

    Masking-based template extraction is deterministic (unlike
    similarity-threshold clustering) so the report is bit-identical
    on every engine and every partitioning — the property the DuckDB
    oracle checks.

    Reference analog: iLogtail ships raw lines and LogReduce
    clusters server-side (closed); here the template report is a
    first-class distributed operator.

    Scale shape: masking is scan-side codegen; partial aggregation
    collapses to one row per (template) BEFORE the single exchange,
    so the shuffle carries the template dictionary (bounded by code
    sites in the emitting software — thousands), never the lines.
    The grand total for share_micro re-aggregates those rows and
    broadcast-joins back as one row. NULL text masks to no template
    and is dropped (SQL aggregate convention).
    """
    t = F.col(text_col)
    masked = df.filter(t.isNotNull()).select(
        mask_template(t).alias("template"),
        *( [F.col(ts_col).alias("__ts__")] if ts_col else [] ),
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_events")]
    if ts_col:
        aggs += [
            F.min("__ts__").alias("first_ts"),
            F.max("__ts__").alias("last_ts"),
        ]
    counts = masked.groupBy("template").agg(*aggs)
    total = counts.agg(F.sum("n_events").alias("__total__"))
    share = (
        F.expr("CAST(n_events AS DECIMAL(38,0)) * 1000000 div __total__")
        .cast("bigint")
        .alias("share_micro")
    )
    out_cols = ["template", "n_events", share] + (
        ["first_ts", "last_ts"] if ts_col else []
    )
    return counts.join(F.broadcast(total)).select(*out_cols)


def template_drift(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Log-template drift between two snapshots — "what changed in
    our logs after the deploy": every masked template's count on both
    sides, with NEW templates (first failure modes), VANISHED ones
    (removed code paths — or silenced errors), and exact integer
    growth for the survivors. This is the diff view of
    :func:`log_templates`, the same way profile_diff is column_profile
    diffed; the pair (new templates ∪ vanished templates) is the
    standard post-deploy triage list.

    Output: (template, n_old, n_new, delta, status, growth_micro)
    where status ∈ (new, vanished, changed, stable) and growth_micro
    = n_new * 1e6 div n_old (NULL for new/vanished).

    Scale shape: each side is mask-at-scan + one partial-aggregated
    count per template (the shared :func:`mask_template` core — no
    share/total machinery, so no extra joins); the diff join runs
    over the two template dictionaries (code-site bounded), never the
    lines.
    """

    def counts(df: DataFrame, alias: str) -> DataFrame:
        t = F.col(text_col)
        return (
            df.filter(t.isNotNull())
            .select(mask_template(t).alias("template"))
            .groupBy("template")
            .agg(F.count(F.lit(1)).cast("bigint").alias(alias))
        )

    j = counts(old, "n_old").join(
        counts(new, "n_new"), "template", "full_outer"
    )
    n_old = F.coalesce(F.col("n_old"), F.lit(0)).cast("bigint")
    n_new = F.coalesce(F.col("n_new"), F.lit(0)).cast("bigint")
    return j.select(
        "template",
        n_old.alias("n_old"),
        n_new.alias("n_new"),
        (n_new - n_old).alias("delta"),
        F.when(n_old == 0, "new")
        .when(n_new == 0, "vanished")
        .when(n_new != n_old, "changed")
        .otherwise("stable")
        .alias("status"),
        F.when(
            (n_old > 0) & (n_new > 0),
            F.expr(
                "CAST(CAST(n_new AS DECIMAL(38,0)) * 1000000 "
                "div n_old AS BIGINT)"
            ),
        ).alias("growth_micro"),
    )


def rare_templates(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    max_count: int | None = 10,
    max_share_micro: int | None = None,
) -> DataFrame:
    """Rare-template report — the anomaly-surfacing half of template
    mining: templates seen at most ``max_count`` times and/or (when
    ``max_share_micro`` is set) holding at most that share of all
    lines. A template that has appeared twice ever is a new failure
    mode or a deploy regression; the high-frequency bulk is the
    operator's noise floor. ``max_count`` is an absolute rarity bar
    (alerting: "seen < 10 times"); ``max_share_micro`` is the
    scale-independent form (the same report at sf0.01 and at 100 TB —
    a fixed absolute count stops selecting anything once volume
    grows). Either may be None; at least one must be set. Pure
    composition over :func:`log_templates` — the filter runs on the
    aggregated template dictionary, adding zero shuffles.
    """
    if max_count is None and max_share_micro is None:
        raise ValueError(
            "rare_templates: set max_count and/or max_share_micro"
        )
    if max_count is not None and max_count < 0:
        raise ValueError(
            f"rare_templates: max_count must be >= 0, got {max_count}"
        )
    if max_share_micro is not None and max_share_micro < 0:
        raise ValueError(
            "rare_templates: max_share_micro must be >= 0, got "
            f"{max_share_micro}"
        )
    out = log_templates(df, text_col=text_col, ts_col=ts_col)
    keep = F.lit(True)
    if max_count is not None:
        keep = keep & (F.col("n_events") <= max_count)
    if max_share_micro is not None:
        keep = keep & (F.col("share_micro") <= max_share_micro)
    return out.filter(keep)


# ---------------------------------------------------------------------------
# state-transition (Markov bigram) counts
# ---------------------------------------------------------------------------

START_STATE = "<START>"


def transition_counts(
    df: DataFrame,
    key_col: str,
    order_cols: tuple[str, ...],
    state_col: str,
    include_start: bool = True,
    start_state: str = START_STATE,
) -> DataFrame:
    """First-order transition matrix of ``state_col`` within each
    ``key_col`` sequence — "what follows what": role bigrams over a
    conversation (user→assistant→user... and the protocol-violating
    assistant→assistant), event-type flows per user, tool-call
    chains per agent session. Returns one row per (prev_state,
    state): n BIGINT transitions and out_share_micro, the exact
    integer row-normalized share of transitions LEAVING prev_state
    (the Markov transition probability in micro units).

    Each sequence's first state transitions from ``start_state``
    (default :data:`START_STATE`) when ``include_start`` (so
    initial-state frequencies are part of the matrix); with
    ``include_start=False`` first states emit no row. NULL states
    participate as the empty string so a NULL never silently drops a
    transition edge. Caveat: a GENUINE state value equal to
    ``start_state`` would merge its outgoing edges with the synthetic
    sequence-start edges — if '<START>' can occur in your data, pass
    a sentinel that cannot (or ``include_start=False``).

    Scale shape: ONE exchange on key_col for the lag window (reused
    if the input is already partitioned by key — the conversation
    operators' shared exchange contract), then a partial-aggregated
    groupBy on the (prev, state) pair; the wide state after the
    second exchange is bounded by |states|^2, not rows. The
    out_share_micro window runs over those aggregated pairs grouped
    by prev_state — vocabulary-sized, never row-sized.
    """
    if not order_cols:
        raise ValueError("transition_counts: order_cols must be non-empty")
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    s = F.coalesce(F.col(state_col).cast("string"), F.lit(""))
    prev = F.lag(s).over(w)
    prev = (
        F.coalesce(prev, F.lit(start_state))
        if include_start
        else prev
    )
    pairs = df.select(prev.alias("prev_state"), s.alias("state"))
    if not include_start:
        pairs = pairs.filter(F.col("prev_state").isNotNull())
    counts = pairs.groupBy("prev_state", "state").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wrow = Window.partitionBy("prev_state")
    return counts.withColumn(
        "__out_total__", F.sum("n").over(wrow)
    ).select(
        "prev_state",
        "state",
        "n",
        # exact integer `div` over a DECIMAL(38,0) product (the
        # hotkey_stats idiom): no float rounding, no BIGINT wrap past
        # 9.2e12 transitions per prev_state; DuckDB's HUGEINT computes
        # the identical 128-bit value
        F.expr("CAST(n AS DECIMAL(38,0)) * 1000000 div __out_total__")
        .cast("bigint")
        .alias("out_share_micro"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch — deterministic
# ---------------------------------------------------------------------------

# 2^60: the hash domain size for the 15-hex-char md5 prefix
_KMV_DOMAIN = 1 << 60


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Approximate distinct count per group via a K-minimum-values
    sketch (Bar-Yossef et al. 2002) — the cardinality estimator for
    when exact count-distinct's shuffle is the bottleneck, built
    DETERMINISTIC: the "random" hash is the 15-hex-char md5 prefix
    (60 bits, lexicographic hex order == numeric order), so the same
    input yields the bit-identical estimate on every engine and every
    partitioning — unlike approx_count_distinct(HLL++), whose merge
    order varies, this sketch is oracle-checkable.

    Estimator: with the k smallest distinct hash values, the k-th
    smallest h_k estimates density — est = (k-1) * 2^60 div h_k,
    computed in exact 128-bit integer math. Groups holding fewer than
    k distinct values report their EXACT count (``is_exact`` = true);
    expected relative error above that is ~1/sqrt(k-2) (6% at k=256).
    NULL values are excluded (count-distinct convention).

    Returns (group, n_sketch, est_distinct, is_exact).

    Scale shape: values collapse to DISTINCT (group, 8-byte-hash)
    rows map-side (the same partial aggregation any count-distinct
    pays — but the shuffle then carries hashes, never values), and
    the row_number <= k filter triggers Spark's WindowGroupLimit:
    every map task forwards at most k hashes per group it saw, so
    the per-group sort is bounded by k * num_partitions, not by the
    group's distinct-value domain. The sketch rows (k per group) are
    the ONLY wide state.
    """
    if k < 2:
        raise ValueError(f"kmv_distinct: k must be >= 2, got {k}")
    g, v = F.col(group_col), F.col(value_col)
    # the hex prefix becomes a BIGINT at the scan (fixed-width
    # lowercase hex orders identically to its numeric value), so the
    # shuffle carries an 8-byte hash, not a 15-char string
    d = (
        df.filter(v.isNotNull())
        .select(
            g.alias("__g__"),
            F.expr(
                "CAST(conv(substring(md5(CAST("
                f"{value_col} AS STRING)), 1, 15), 16, 10) AS BIGINT)"
            ).alias("__h__"),
        )
        .distinct()
    )
    rn = F.row_number().over(
        Window.partitionBy("__g__").orderBy("__h__")
    )
    kept = d.withColumn("__rn__", rn).filter(F.col("__rn__") <= k)
    agg = kept.groupBy("__g__").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sketch"),
        F.max("__h__").alias("__hk__"),
    )
    est = F.when(F.col("n_sketch") < k, F.col("n_sketch")).otherwise(
        F.expr(
            f"CAST({k - 1} AS DECIMAL(38,0)) * {_KMV_DOMAIN} div "
            "greatest(__hk__, 1)"
        ).cast("bigint")
    )
    return agg.select(
        F.col("__g__").alias(group_col),
        "n_sketch",
        est.alias("est_distinct"),
        (F.col("n_sketch") < k).alias("is_exact"),
    )


def active_users(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    key_cols: tuple[str, ...] = (),
    window_days: int = 7,
) -> DataFrame:
    """Rolling active-user counts — one row per (keys..., day) with
    dau (distinct users that day) and rolling_au (distinct users in
    the trailing ``window_days`` ending that day): the DAU/WAU/MAU
    report every product-analytics stack exposes. Only days with at
    least one event appear (compose with gapfill_counts for a dense
    axis).

    Distinct counts do NOT merge across days (a user active twice is
    one user), so the rolling count cannot reuse daily partials: each
    event instead lands in the ``window_days`` window-ending days it
    contributes to, and distinctness collapses per (keys, end-day,
    user) BEFORE counting. Exact by construction on every engine —
    the engine-portable twin of a sliding count-distinct. For
    month-scale windows over 10^12 events, swap the exact core for
    :func:`kmv_distinct` per (keys, end-day) bucket — same plan
    shape, sketch-sized state.

    Scale shape: events collapse to DISTINCT (keys, user, day) at the
    first aggregate — the shuffle is bounded by users x active-days,
    not events. The window replication (sequence/explode over
    window_days end-days) runs on those collapsed rows, and the
    second distinct collapses map-side again before the final count.
    """
    if window_days < 1:
        raise ValueError(
            f"active_users: window_days must be >= 1, got {window_days}"
        )
    keys = [F.col(k) for k in key_cols]
    day = F.to_date(F.col(ts_col))
    # distinct (keys, user, active-day): the only event-scale pass
    daily = (
        df.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .select(*keys, F.col(user_col).alias("__u__"), day.alias("__d__"))
        .distinct()
    )
    dau = daily.groupBy(*key_cols, "__d__").agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    # each active day contributes to window_days trailing windows
    ends = daily.select(
        *key_cols,
        "__u__",
        F.explode(
            F.sequence(
                F.col("__d__"),
                F.date_add(F.col("__d__"), window_days - 1),
            )
        ).alias("__e__"),
    ).distinct()
    rolling = ends.groupBy(*key_cols, "__e__").agg(
        F.count(F.lit(1)).cast("bigint").alias("rolling_au")
    )
    cond = [dau[k] == rolling[k] for k in key_cols] + [
        dau["__d__"] == rolling["__e__"]
    ]
    out = dau.join(rolling, cond, "inner")
    return out.select(
        *[dau[k] for k in key_cols],
        dau["__d__"].alias("day"),
        "dau",
        "rolling_au",
    )


def sliding_distinct(
    df: DataFrame,
    ts_col: str = "ts",
    entity_col: str = "user_id",
    key_cols: tuple[str, ...] = (),
    window_seconds: int = 3600,
    slide_seconds: int = 900,
) -> DataFrame:
    """Hopping-window DISTINCT-entity counts per key — "how many
    distinct users hit this endpoint in each sliding hour?", the
    sub-day sibling of :func:`active_users` and the distinct twin of
    :func:`sliding_counts`. One row per (keys..., window) holding
    n_distinct; only windows with at least one event appear.

    Distinct does not merge across slides (the reason this cannot be
    built from per-slide partials): each event lands in its
    window/slide covering windows and distinctness collapses per
    (keys, window, entity) BEFORE counting — exact on every engine.
    NULL entities are excluded (count-distinct convention); the same
    window/slide alignment rule as sliding_counts applies.

    Scale shape: the TimeWindow Expand replicates rows scan-side
    (factor = window/slide, the explicit knob), but the FIRST
    aggregate collapses to distinct (keys, window, entity) map-side —
    the shuffle carries one row per distinct entity per covering
    window, and the second aggregate's wide state is (keys, window)
    counts. For month-over-minute ratios where even the distinct set
    is too wide, swap the exact core for :func:`kmv_distinct` per
    (keys, window) — same plan shape, sketch-sized state.
    """
    _validate_window_alignment(
        "sliding_distinct", window_seconds, slide_seconds
    )
    win = F.window(
        F.col(ts_col), f"{window_seconds} seconds", f"{slide_seconds} seconds"
    )
    distinct = (
        df.filter(F.col(ts_col).isNotNull() & F.col(entity_col).isNotNull())
        .select(
            *[F.col(k) for k in key_cols],
            win.alias("__w__"),
            F.col(entity_col).alias("__e__"),
        )
        .distinct()
    )
    return (
        distinct.groupBy(*key_cols, "__w__")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_distinct"))
        .select(
            *key_cols,
            F.col("__w__.start").alias("window_start"),
            F.col("__w__.end").alias("window_end"),
            "n_distinct",
        )
    )


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Data-card column profiler: one row per column with
    (column, n_rows, n_null, n_distinct, min_value, max_value) —
    the "what is actually in this table?" summary that fronts every
    ingest: null-rate regressions, cardinality blowups, and
    out-of-domain min/max land here before any operator runs.

    Values are profiled THROUGH a cast to string (so one schema fits
    every column type and min/max compare identically on every
    engine — Spark and DuckDB both order strings by codepoint).
    Callers profiling timestamp/float columns should note the
    min/max are therefore lexicographic over the rendered form;
    for bigint/string columns (the usual profile targets) rendering
    is injective and the caveat is moot. NULLs never enter
    n_distinct or min/max (both engines agree).

    Scale shape: ONE pass — a single global aggregate computes every
    column's counters; the per-column rows are a driver-free stack
    (explode of a literal-sized struct array) over that one
    aggregated row. The exact multi-column count(DISTINCT) compiles
    to Spark's Expand strategy — the scan is replicated once per
    profiled column INSIDE the map stage, so the shuffle carries
    per-column partial states, not data rows. For very wide tables
    (hundreds of columns) swap n_distinct to the KMV sketch
    (kmv_distinct) column-by-column; the exact form is the oracle-
    parity default.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("column_profile: cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"column_profile: missing columns {missing}")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n__")]
    for i, c in enumerate(cols):
        sc = F.col(c).cast("string")
        aggs += [
            F.count(sc).cast("bigint").alias(f"__nn_{i}"),
            F.countDistinct(sc).cast("bigint").alias(f"__nd_{i}"),
            F.min(sc).alias(f"__mn_{i}"),
            F.max(sc).alias(f"__mx_{i}"),
        ]
    one = df.agg(*aggs)
    stacked = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n__").alias("n_rows"),
                (F.col("__n__") - F.col(f"__nn_{i}")).alias("n_null"),
                F.col(f"__nd_{i}").alias("n_distinct"),
                F.col(f"__mn_{i}").alias("min_value"),
                F.col(f"__mx_{i}").alias("max_value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return one.select(F.explode(stacked).alias("__r__")).select(
        "__r__.column",
        "__r__.n_rows",
        "__r__.n_null",
        "__r__.n_distinct",
        "__r__.min_value",
        "__r__.max_value",
    )


def grouped_quantile_diff(
    old: DataFrame,
    new: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    qs_micro: tuple[int, ...] = (500_000, 900_000, 990_000),
) -> DataFrame:
    """Quantile drift between two snapshots — :func:`grouped_quantiles`
    run on both sides and compared per (group, quantile): the
    latency-SLO / value-distribution companion of
    :func:`profile_diff` (which sees nulls and cardinality but not
    distribution shape). A p99 that doubled between deploys lands
    here as one row. Pure composition — zero new quantile logic, so
    the exact nearest-rank semantics (and engine reproducibility)
    are inherited.

    Output: (group, q_micro, n_old, n_new, q_value_old, q_value_new,
    q_delta); counts coalesce to 0 for a side the group is absent
    from, values/delta stay NULL there.

    Scale shape: two count-aggregation quantile passes (each collapses
    rows to (group, value, count) map-side) and a join over
    groups x quantiles rows.
    """
    qo = grouped_quantiles(old, group_col, value_col, qs_micro).select(
        group_col,
        "q_micro",
        F.col("n").alias("n_old"),
        F.col("q_value").alias("q_value_old"),
    )
    qn = grouped_quantiles(new, group_col, value_col, qs_micro).select(
        group_col,
        "q_micro",
        F.col("n").alias("n_new"),
        F.col("q_value").alias("q_value_new"),
    )
    j = qo.join(qn, [group_col, "q_micro"], "full_outer")
    return j.select(
        group_col,
        "q_micro",
        F.coalesce(F.col("n_old"), F.lit(0)).cast("bigint").alias("n_old"),
        F.coalesce(F.col("n_new"), F.lit(0)).cast("bigint").alias("n_new"),
        "q_value_old",
        "q_value_new",
        (F.col("q_value_new") - F.col("q_value_old")).alias("q_delta"),
    )


def profile_diff(
    old: DataFrame, new: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """Schema/statistics drift card between two snapshots of a table —
    :func:`column_profile` run on both sides and compared per column.
    This is the check an ingest pipeline runs when a source format
    changes under it: null-rate regressions (an extractor started
    dropping a field), cardinality blowups (an id column started
    carrying session tokens), and domain shifts (min/max moved) all
    land here before any downstream operator misbehaves.

    ``cols`` defaults to the columns the two frames SHARE (ordered as
    in ``old``); pass an explicit list to force an error when a
    profiled column is missing from either side.

    Output: one row per column — (column, n_rows_old, n_rows_new,
    n_null_old, n_null_new, null_delta, n_distinct_old,
    n_distinct_new, distinct_delta, min_changed, max_changed), where
    the changed flags are null-safe inequality over the rendered
    min/max.

    Scale shape: two one-pass profile aggregates (each is the single
    global aggregate + literal-stack explode of column_profile) and a
    column-cardinality join — nothing here scales with row count
    beyond the two scans.
    """
    if cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        if not shared:
            raise ValueError("profile_diff: the frames share no columns")
        cols = shared
    po = column_profile(old, cols).select(
        "column",
        F.col("n_rows").alias("n_rows_old"),
        F.col("n_null").alias("n_null_old"),
        F.col("n_distinct").alias("n_distinct_old"),
        F.col("min_value").alias("__mn_old__"),
        F.col("max_value").alias("__mx_old__"),
    )
    pn = column_profile(new, cols).select(
        "column",
        F.col("n_rows").alias("n_rows_new"),
        F.col("n_null").alias("n_null_new"),
        F.col("n_distinct").alias("n_distinct_new"),
        F.col("min_value").alias("__mn_new__"),
        F.col("max_value").alias("__mx_new__"),
    )
    return po.join(pn, "column").select(
        "column",
        "n_rows_old",
        "n_rows_new",
        "n_null_old",
        "n_null_new",
        (F.col("n_null_new") - F.col("n_null_old")).alias("null_delta"),
        "n_distinct_old",
        "n_distinct_new",
        (F.col("n_distinct_new") - F.col("n_distinct_old")).alias(
            "distinct_delta"
        ),
        (~F.col("__mn_old__").eqNullSafe(F.col("__mn_new__"))).alias(
            "min_changed"
        ),
        (~F.col("__mx_old__").eqNullSafe(F.col("__mx_new__"))).alias(
            "max_changed"
        ),
    )


def outage_windows(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    min_gap_seconds: int = 3600,
) -> DataFrame:
    """Silence-gap (outage) detection: per key, every interval between
    consecutive events that exceeds ``min_gap_seconds`` — the
    monitoring question behind the reference's file-tail liveness
    alarms (a source that stops emitting is indistinguishable from a
    healthy-but-quiet one until the gap length crosses a threshold).
    Complements ``gapfill_counts`` (which FILLS small gaps for
    plotting) by REPORTING the large ones.

    Returns (key, gap_start, gap_end, gap_sec) — one row per
    threshold-crossing gap, gap_start/gap_end being the bounding
    event timestamps. Rows with NULL key or ts are dropped.

    Scale: only (key, ts) survive the scan; the lag window and the
    post-window filter share ONE exchange on key, and the output is
    bounded by the number of long gaps, not the event count. Ties on
    ts are order-ambiguous but harmless: equal timestamps yield a
    zero-length gap wherever they land, and the pair bridging a tie
    group has the same gap length whichever tied row borders it.
    """
    if min_gap_seconds <= 0:
        raise ValueError("outage_windows: min_gap_seconds must be > 0")
    missing = [c for c in (key_col, ts_col) if c not in df.columns]
    if missing:
        raise ValueError(f"outage_windows: missing columns {missing}")
    slim = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("timestamp").alias("__ts__"),
    ).filter(F.col("key").isNotNull() & F.col("__ts__").isNotNull())
    w = Window.partitionBy("key").orderBy("__ts__")
    gapped = slim.withColumn("__prev__", F.lag("__ts__").over(w)).withColumn(
        "gap_sec",
        (
            F.unix_timestamp("__ts__") - F.unix_timestamp("__prev__")
        ).cast("bigint"),
    )
    return gapped.filter(F.col("gap_sec") >= min_gap_seconds).select(
        "key",
        F.col("__prev__").alias("gap_start"),
        F.col("__ts__").alias("gap_end"),
        "gap_sec",
    )


def concentration_report(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    top_k: int = 10,
) -> DataFrame:
    """Per-group key-concentration card — how dominated each event
    type is by its hottest keys. The skew question behind every
    partitioning decision in this repo (salting thresholds, AQE skew
    joins, the shardhash aggregator): BEFORE picking a strategy you
    measure whether the top key owns 2% or 80% of the group.

    Output per ``type_col`` value: n_events, n_keys (distinct),
    top1_share_micro, topk_share_micro (share owned by the ``top_k``
    hottest keys), n_keys_half (the minimum number of hottest keys
    that together cover >= 50% of events — the 'how many tenants is
    half the traffic' number). Shares are floor-micro integers; key
    rank order is (count DESC, key ASC), a total order, so every
    number is engine-reproducible.

    Scale shape: stage 1 is a combiner-fed count on (type, key) —
    the only pass over raw rows. Stage 2 windows + aggregates over
    the per-key COUNT table, partitioned by type: the sort cost is
    per-type distinct-key cardinality, not event count (the
    grouped_quantiles value-domain argument). Both stage-2 steps
    share one exchange on type.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    counts = (
        df.select(
            F.col(type_col).alias("gtype"),
            F.col(key_col).cast("string").alias("__key__"),
        )
        .groupBy("gtype", "__key__")
        .agg(F.count(F.lit(1)).alias("__n__"))
    )
    w = Window.partitionBy("gtype").orderBy(
        F.col("__n__").desc(), F.col("__key__").asc()
    )
    ranked = counts.select(
        "gtype",
        "__n__",
        F.row_number().over(w).alias("__rank__"),
        F.sum("__n__")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("__cum__"),
        F.sum("__n__")
        .over(Window.partitionBy("gtype"))
        .alias("__tot__"),
    )
    agg = ranked.groupBy("gtype").agg(
        F.sum("__n__").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max(F.when(F.col("__rank__") == 1, F.col("__n__")))
        .cast("bigint")
        .alias("__top1__"),
        F.sum(F.when(F.col("__rank__") <= top_k, F.col("__n__")).otherwise(0))
        .cast("bigint")
        .alias("__topk__"),
        F.min(
            F.when(
                F.col("__cum__") * 2 >= F.col("__tot__"), F.col("__rank__")
            )
        )
        .cast("bigint")
        .alias("n_keys_half"),
    )
    return agg.select(
        F.col("gtype").alias(type_col),
        "n_events",
        "n_keys",
        F.expr("__top1__ * 1000000 div n_events").alias("top1_share_micro"),
        F.expr("__topk__ * 1000000 div n_events").alias(
            f"top{top_k}_share_micro"
        ),
        "n_keys_half",
    )


def slo_burn(
    df: DataFrame,
    error_types: list[str] | tuple[str, ...] = ("error",),
    type_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "hour",
    slo_error_micro: int = 10_000,
    window_buckets: int = 6,
    group_col: str | None = None,
) -> DataFrame:
    """Error-budget burn-rate card — the SRE alert rule ("the error
    ratio over the trailing N hours exceeds the SLO target")
    popularized by the Google SRE workbook's multiwindow burn alerts.
    All math is exact integer: per-bucket error ratios are floor-micro
    ints, the burn factor is ``win_err_micro * 1e6 div
    slo_error_micro`` (a two-step floor — the metric's DEFINITION, so
    every engine and the oracle agree bit-for-bit; win_err_micro <=
    1e6 keeps the product far from bigint overflow at any scale).

    Per bucket (optionally per ``group_col``): n_total, n_errors,
    err_micro, win_total / win_errors / win_err_micro over the
    trailing ``window_buckets`` OBSERVED buckets (rows, inclusive of
    the current one; empty buckets produce no rows — silence is
    outage_windows' job), burn_micro, and is_burning (burn_micro >=
    1e6, i.e. the windowed error ratio is over target).

    Scale shape: raw events collapse to per-bucket (total, error)
    counts in ONE combiner-fed aggregate — the only pass over rows.
    The trailing window then walks the AGGREGATED bucket table:
    without ``group_col`` that is a single global series (bounded by
    wall-clock — ~9k rows per hourly year), so the single-partition
    window is a non-issue by cardinality; pass ``group_col`` (tenant,
    service) to shard the series when you need per-key budgets.
    """
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    if slo_error_micro < 1:
        raise ValueError("slo_error_micro must be >= 1")
    if bucket.lower() not in _TRUNC_UNITS:
        raise ValueError(
            f"bucket must be one of {sorted(_TRUNC_UNITS)}, got {bucket!r}"
        )
    err = F.col(type_col).isin(*list(error_types)).cast("long")
    gcols = [F.col(group_col).alias("group_key")] if group_col else []
    counts = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(
            *gcols,
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(err).cast("bigint").alias("n_errors"),
        )
    )
    w = (
        (
            Window.partitionBy("group_key")
            if group_col
            else Window.partitionBy()
        )
        .orderBy("bucket_ts")
        .rowsBetween(-(window_buckets - 1), 0)
    )
    out = counts.select(
        *(["group_key"] if group_col else []),
        "bucket_ts",
        "n_total",
        "n_errors",
        F.expr("n_errors * 1000000 div n_total").alias("err_micro"),
        F.sum("n_total").over(w).cast("bigint").alias("win_total"),
        F.sum("n_errors").over(w).cast("bigint").alias("win_errors"),
    )
    out = out.withColumn(
        "win_err_micro", F.expr("win_errors * 1000000 div win_total")
    ).withColumn(
        "burn_micro",
        F.expr(f"win_err_micro * 1000000 div {int(slo_error_micro)}"),
    )
    return out.withColumn("is_burning", F.col("burn_micro") >= 1_000_000)


def seasonal_profile(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str | None = None,
) -> DataFrame:
    """Day-of-week x hour-of-day load heatmap — the capacity-planning
    card ("what does a normal Tuesday 14:00 look like") behind every
    traffic-seasonality dashboard. The day-of-week is computed with
    pure integer epoch-day arithmetic, ``(epoch_day + 4) mod 7`` with
    0 = Sunday (day 0 = 1970-01-01 was a Thursday), so every engine
    agrees without touching locale-dependent dayofweek builtins
    (Spark counts Sunday=1, DuckDB Sunday=0 — the classic off-by-one
    oracle trap).

    Per (dow, hour) cell (optionally per ``group_col``): n_events,
    n_days (distinct calendar dates observed in the cell — the
    denominator that makes short capture windows comparable),
    per_day_micro (n_events * 1e6 div n_days: average events per
    observed day, floor-micro), share_micro (cell share of all
    events). Rows with NULL timestamps are excluded.

    Scale shape: ONE combiner-fed aggregate over raw rows keyed on
    (dow, hour, date) — at most 168 x observed-days groups — then a
    168-row rollup; the share window runs over the 168-row heatmap,
    never the events. The heavy work is the scan itself.
    """
    gcols = [F.col(group_col).alias("group_key")] if group_col else []
    dow = F.pmod(
        F.datediff(F.col(ts_col).cast("date"), F.lit("1970-01-01")) + 4,
        F.lit(7),
    ).cast("int")
    cells = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(
            *gcols,
            dow.alias("dow"),
            F.hour(F.col(ts_col)).alias("hour"),
            F.col(ts_col).cast("date").alias("__d__"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n__"))
        .groupBy(*(["group_key"] if group_col else []), "dow", "hour")
        .agg(
            F.sum("__n__").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
        )
    )
    wall = (
        Window.partitionBy("group_key")
        if group_col
        else Window.partitionBy()
    )
    return cells.withColumn(
        "__tot__", F.sum("n_events").over(wall)
    ).select(
        *(["group_key"] if group_col else []),
        "dow",
        "hour",
        "n_events",
        "n_days",
        F.expr("n_events * 1000000 div n_days").alias("per_day_micro"),
        F.expr("n_events * 1000000 div __tot__").alias("share_micro"),
    )


def first_seen_curve(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "day",
) -> DataFrame:
    """New-vs-returning curve — per bucket: how many distinct keys
    were active, how many appeared for the FIRST time ever, and the
    cumulative distinct-key count. The growth card every product /
    fleet dashboard opens with ("daily actives, split new vs
    returning"), and the operational twin of a log pipeline's
    first-seen host census.

    Output per bucket_ts: n_active (distinct keys), n_new (keys whose
    earliest bucket is this one), n_returning (= n_active - n_new),
    cum_keys (running sum of n_new — the exact cumulative distinct).
    Buckets are OBSERVED buckets only. NULL keys/timestamps excluded.

    Scale shape: raw rows collapse map-side to distinct (key, bucket)
    pairs — the only row-volume shuffle, keyed on both columns so no
    hot-key task. First-seen is then a per-key min over the PAIR
    table, and both counts are combiner-fed aggregates on bucket_ts.
    The cumulative window walks the bucket table (bounded by
    wall-clock, not volume).
    """
    if bucket.lower() not in _TRUNC_UNITS:
        raise ValueError(
            f"bucket must be one of {sorted(_TRUNC_UNITS)}, got {bucket!r}"
        )
    pairs = (
        df.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("__k__"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
        )
        .distinct()
    )
    active = pairs.groupBy("bucket_ts").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active")
    )
    new = (
        pairs.groupBy("__k__")
        .agg(F.min("bucket_ts").alias("bucket_ts"))
        .groupBy("bucket_ts")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_new"))
    )
    curve = active.join(new, "bucket_ts", "left").select(
        "bucket_ts",
        "n_active",
        F.coalesce(F.col("n_new"), F.lit(0)).cast("bigint").alias("n_new"),
    )
    w = (
        Window.partitionBy()
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return curve.select(
        "bucket_ts",
        "n_active",
        "n_new",
        (F.col("n_active") - F.col("n_new")).alias("n_returning"),
        F.sum("n_new").over(w).cast("bigint").alias("cum_keys"),
    )


def cooccurrence_report(
    df: DataFrame,
    type_col: str = "event_type",
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "hour",
) -> DataFrame:
    """Event-type co-occurrence — which types show up TOGETHER in the
    same (key, bucket) cell, the "what else fires when this error
    fires" triage card (the batch analog of alert-correlation rules).

    A cell is one (key, time-bucket) pair that saw a type at least
    once. For every unordered type pair a < b: n_both (cells holding
    both), n_a / n_b (cells holding each), and jaccard_micro =
    n_both * 1e6 div (n_a + n_b - n_both) — exact floor-micro set
    similarity of the two types' cell sets. Ordered by n_both DESC,
    then (type_a, type_b). NULL types/keys/timestamps excluded.

    Scale shape: raw rows collapse in ONE combiner-fed collect_set
    aggregate keyed on (key, bucket) — the only row-volume shuffle
    (a naive cells-self-join would rescan and reshuffle the input
    once per join leg). Each cell's sorted type set then expands
    SCAN-SIDE to its C(T, 2) unordered pairs plus T unary markers
    (T = types in that cell — type cardinality, not row count), and
    one tiny aggregate over those items yields pair and per-type cell
    counts together; the count table (<= T^2 rows) is lazily
    localCheckpointed so the pair rows and the two broadcast per-type
    legs reuse it instead of recomputing the scan.
    """
    if bucket.lower() not in _TRUNC_UNITS:
        raise ValueError(
            f"bucket must be one of {sorted(_TRUNC_UNITS)}, got {bucket!r}"
        )
    t = F.col(type_col).cast("string")
    cellsets = (
        df.filter(
            F.col(ts_col).isNotNull()
            & F.col(key_col).isNotNull()
            & t.isNotNull()
        )
        .groupBy(
            F.col(key_col).alias("__k__"),
            F.date_trunc(bucket, F.col(ts_col)).alias("__b__"),
        )
        .agg(F.sort_array(F.collect_set(t)).alias("__ts__"))
    )
    # per cell: unordered pairs (a < b holds — the set is sorted) and
    # one (a, NULL) marker per type, so a single groupBy counts both
    items = cellsets.select(
        F.explode(
            F.expr(
                "concat("
                " flatten(transform(__ts__, (x, i) ->"
                "  transform(slice(__ts__, i + 2, size(__ts__)),"
                "   y -> struct(x AS a, y AS b)))),"
                " transform(__ts__, x ->"
                "  struct(x AS a, CAST(NULL AS STRING) AS b)))"
            )
        ).alias("__i__")
    )
    counts = (
        items.groupBy(
            F.col("__i__.a").alias("type_a"),
            F.col("__i__.b").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)
    )
    both = counts.filter(F.col("type_b").isNotNull()).withColumnRenamed(
        "n", "n_both"
    )
    per_type = counts.filter(F.col("type_b").isNull()).select(
        F.col("type_a").alias("__t__"), F.col("n").alias("__n__")
    )
    na = F.broadcast(
        per_type.select(
            F.col("__t__").alias("type_a"), F.col("__n__").alias("n_a")
        )
    )
    nb = F.broadcast(
        per_type.select(
            F.col("__t__").alias("type_b"), F.col("__n__").alias("n_b")
        )
    )
    return (
        both.join(na, "type_a")
        .join(nb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.expr("n_both * 1000000 div (n_a + n_b - n_both)").alias(
                "jaccard_micro"
            ),
        )
        .orderBy(F.col("n_both").desc(), "type_a", "type_b")
    )


def burstiness_report(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    min_events: int = 3,
) -> DataFrame:
    """Per-key inter-arrival burstiness — is this key's traffic
    steady (heartbeat), Poisson (organic), or bursty (retry storm,
    scraper)? The classifier is the squared coefficient of variation
    of consecutive gaps: cv2 < 1 regular, ~ 1 Poisson, >> 1 bursty
    (Goh & Barabasi's burstiness measure without its square root, so
    the math stays exact integer).

    Per key with at least ``min_events`` events (>= 2 gaps): n_events,
    span_ms (first to last), mean_gap_ms (floor), and cv2_micro =
    (n_gaps * sum(gap^2) - sum(gap)^2) * 1e6 div sum(gap)^2 — the
    population variance over mean^2 in exact DECIMAL(38,0) math
    (gaps in ms: n * sum_sq <= n * span^2 stays under 10^38 up to
    ~10^10 events per key-year). Keys whose events all share one
    timestamp (sum = 0) report cv2_micro NULL. Gap multiset depends
    only on sorted timestamps, so ties need no tiebreak column.

    Scale shape: ONE shuffle on key_col; the per-key sort is each
    key's own events (the sessionize-style bound — shard upstream by
    day first if a single key can exceed a task); gap moments then
    collapse in the same aggregate. Output is one row per key.
    """
    if min_events < 3:
        raise ValueError(
            f"burstiness_report: min_events must be >= 3, got {min_events}"
        )
    w = Window.partitionBy("__k__").orderBy("__ms__")
    gaps = (
        df.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("__k__"),
            # unix_millis only takes TIMESTAMP — the ltz cast is a
            # no-op there and pins NTZ columns to the session zone
            # (UTC per session.py; all outputs are gap DIFFERENCES,
            # so a constant zone offset cancels regardless)
            F.unix_millis(F.col(ts_col).cast("timestamp_ltz")).alias(
                "__ms__"
            ),
        )
        .withColumn("__gap__", F.col("__ms__") - F.lag("__ms__").over(w))
    )
    agg = (
        gaps.groupBy("__k__")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (F.max("__ms__") - F.min("__ms__")).alias("span_ms"),
            F.sum("__gap__").cast("decimal(38,0)").alias("__s__"),
            F.sum(
                F.col("__gap__").cast("decimal(38,0)")
                * F.col("__gap__").cast("decimal(38,0)")
            ).alias("__s2__"),
            F.count("__gap__").cast("bigint").alias("__ng__"),
        )
        .filter(F.col("n_events") >= min_events)
    )
    return agg.select(
        F.col("__k__").alias(key_col),
        "n_events",
        "span_ms",
        F.expr("CAST(__s__ div __ng__ AS BIGINT)").alias("mean_gap_ms"),
        F.expr(
            "CASE WHEN __s__ = 0 THEN NULL ELSE CAST("
            "(__ng__ * __s2__ - __s__ * __s__) * 1000000 div "
            "(__s__ * __s__) AS BIGINT) END"
        ).alias("cv2_micro"),
    )


def retry_storms(
    df: DataFrame,
    identity_cols: list[str] | None = None,  # None -> (user_id, event_type)
    ts_col: str = "ts",
    window_sec: int = 600,
    min_run: int = 3,
) -> DataFrame:
    """Duplicate-delivery / retry-storm detection: per identity key
    (the column set that makes two rows "the same delivery" — e.g.
    (user_id, event_type), or a payload digest), find maximal chains
    of consecutive rows where every inter-arrival gap is at most
    ``window_sec``. Every row after a chain's head is a RETRY; a
    chain of at least ``min_run`` rows is a STORM. This is the
    at-least-once-delivery hygiene card behind every collector
    pipeline: the reference's sender retries on throttling
    (`core/plugin/flusher/sls/FlusherSLS.h` send-retry/backoff), so
    the table downstream always carries some duplicate deliveries —
    this measures whether they are background noise or a storm.

    Output, one row per identity key with at least one retry:
    identity cols, n_rows, n_runs (maximal chains, singletons
    included), n_retries (= n_rows - n_runs), n_storms (chains with
    >= min_run rows), max_run (longest chain), retry_share_micro
    (floor micro share of rows that are retries). Rows with NULL ts
    are dropped; tied timestamps are safe: equal ts permute only
    inside a zero-gap group, and the multiset of adjacent gaps —
    hence every count here — is permutation-invariant.

    Scale shape: only identity cols + one epoch-seconds long survive
    the scan. ONE exchange on the identity hash: the lag window, the
    run-id running sum, the (identity, run) collapse, and the final
    per-identity aggregate all reuse it (hash(identity) co-locates
    the superset key (identity, run), so EnsureRequirements inserts
    no second shuffle — asserted in PLANS.md). Per-task sort state
    is one identity's rows; identities are delivery keys, orders of
    magnitude finer than a tenant, so no salting is needed. Output
    is bounded by the number of retrying identities.
    """
    if identity_cols is None:
        identity_cols = ["user_id", "event_type"]
    if not identity_cols:
        raise ValueError(
            "retry_storms: identity_cols must name at least one column "
            "(got an empty list)"
        )
    if window_sec <= 0:
        raise ValueError("retry_storms: window_sec must be > 0")
    if min_run < 2:
        raise ValueError(f"retry_storms: min_run must be >= 2, got {min_run}")
    missing = [c for c in (*identity_cols, ts_col) if c not in df.columns]
    if missing:
        raise ValueError(f"retry_storms: missing columns {missing}")
    slim = df.filter(F.col(ts_col).isNotNull()).select(
        *identity_cols,
        # micros, not unix_timestamp: second-floor truncation would
        # make a 600.4s gap compare as 600 and flip the flag between
        # engines; the ltz cast pins NTZ columns to the session UTC
        # (gaps are differences, so the zone offset cancels anyway)
        F.unix_micros(F.col(ts_col).cast("timestamp_ltz")).alias("__s__"),
    )
    w = Window.partitionBy(*identity_cols).orderBy("__s__")
    flagged = slim.withColumn(
        "__head__",
        F.when(
            (F.col("__s__") - F.lag("__s__").over(w))
            <= F.lit(int(window_sec) * 1_000_000),
            F.lit(0),
        ).otherwise(F.lit(1)),
    ).withColumn(
        "__run__",
        F.sum("__head__").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = flagged.groupBy(*identity_cols, "__run__").agg(
        F.count(F.lit(1)).cast("bigint").alias("__len__")
    )
    agg = (
        runs.groupBy(*identity_cols)
        .agg(
            F.sum("__len__").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_runs"),
            F.sum(
                F.when(F.col("__len__") >= min_run, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_storms"),
            F.max("__len__").cast("bigint").alias("max_run"),
        )
        .filter(F.col("n_rows") > F.col("n_runs"))
    )
    return agg.select(
        *identity_cols,
        "n_rows",
        "n_runs",
        (F.col("n_rows") - F.col("n_runs")).cast("bigint").alias("n_retries"),
        "n_storms",
        "max_run",
        F.expr("(n_rows - n_runs) * 1000000 div n_rows").alias(
            "retry_share_micro"
        ),
    )


JSON_KEY_RE = '"([^"]+)"\\s*:'


def json_key_census(
    df: DataFrame,
    type_col: str = "event_type",
    json_col: str = "props",
) -> DataFrame:
    """Schema-drift census over a semi-structured payload column: for
    each (type, top-level-ish JSON key) pair, how many rows of that
    type carry the key and what presence share that is. The hygiene
    card you read BEFORE writing a parse config — the reference's
    processor_json expands whatever keys arrive
    (`plugins/processor/json/processor_json.go` ExpandJSON) and a
    producer that starts emitting a new key silently widens every
    downstream row; this census is how that drift gets noticed.
    Compose with profile_diff/template_drift for the when.

    Keys are lifted with one regexp (`"([^\"]+)"\\s*:` — every quoted
    string immediately followed by a colon, so nested keys count
    too; that is deliberate: drift in nested payloads matters as
    much) and de-duplicated per row, so n_rows counts ROWS carrying
    the key, not occurrences. NULL payloads simply contribute no
    keys but still count toward the type's row total.

    Output: (type_col, key, n_rows, n_type_rows, presence_micro),
    one row per observed (type, key).

    Scale shape: the regexp + array_distinct run scan-side; only
    (type, key) pairs shuffle into a combiner-fed count, and the
    per-type row totals are a second tiny aggregate broadcast back
    onto the census — payload text never leaves the scan. Output is
    bounded by the observed key vocabulary, not the row count.
    """
    missing = [c for c in (type_col, json_col) if c not in df.columns]
    if missing:
        raise ValueError(f"json_key_census: missing columns {missing}")
    totals = df.groupBy(F.col(type_col).alias("__t__")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_type_rows")
    )
    census = (
        df.select(
            F.col(type_col).alias("__t__"),
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(
                        F.coalesce(F.col(json_col), F.lit("")),
                        F.lit(JSON_KEY_RE),
                        1,
                    )
                )
            ).alias("key"),
        )
        .groupBy("__t__", "key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
    return census.join(F.broadcast(totals), "__t__").select(
        F.col("__t__").alias(type_col),
        "key",
        "n_rows",
        "n_type_rows",
        F.expr("n_rows * 1000000 div n_type_rows").alias("presence_micro"),
    )


def top_per_group(
    df: DataFrame,
    group_col: str = "event_type",
    key_col: str = "user_id",
    n: int = 3,
) -> DataFrame:
    """Named top-N keys per group — concentration_report says HOW
    skewed each group is; this names WHO: per ``group_col`` value,
    the ``n`` hottest ``key_col`` values with their counts, ranks,
    and floor-micro group shares. The per-sink companion of the
    global hotkey_stats (plans/skew.py) and the card a router/salting
    decision reads after concentration_report flags a group.

    Output: (group_col, rank [1-based], key, n_rows, share_micro),
    rank order (count DESC, key ASC) — a total order, so every engine
    returns the identical rows. NULL keys count like any other value
    (rendered as NULL); NULL groups form their own group.

    Scale shape: stage 1 is the combiner-fed (group, key) count —
    the only pass over raw rows. Stage 2 ranks the count-reduced key
    table per group: the rank window and the group-total window share
    ONE exchange on group, and the filter keeps n rows per group, so
    output is n * |groups|. A single mega-group's distinct-key table
    sorts in one task — that table is already count-collapsed, the
    same value-domain bound grouped_quantiles rides.
    """
    if n < 1:
        raise ValueError(f"top_per_group: n must be >= 1, got {n}")
    missing = [c for c in (group_col, key_col) if c not in df.columns]
    if missing:
        raise ValueError(f"top_per_group: missing columns {missing}")
    counts = (
        df.select(
            F.col(group_col).alias("__g__"),
            F.col(key_col).cast("string").alias("key"),
        )
        .groupBy("__g__", "key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
    wr = Window.partitionBy("__g__").orderBy(
        F.col("n_rows").desc(), F.col("key").asc_nulls_last()
    )
    ranked = counts.select(
        "__g__",
        "key",
        "n_rows",
        F.row_number().over(wr).alias("rank"),
        F.sum("n_rows").over(Window.partitionBy("__g__")).alias("__tot__"),
    )
    return ranked.filter(F.col("rank") <= n).select(
        F.col("__g__").alias(group_col),
        F.col("rank").cast("bigint").alias("rank"),
        "key",
        "n_rows",
        F.expr("n_rows * 1000000 div __tot__").alias("share_micro"),
    )


def trend_report(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Per-key traffic-trend card: the exact least-squares slope of
    per-bucket row counts over the bucket index — "whose volume is
    rising?" triage that a point-in-time spike detector
    (rate_spikes) cannot answer. slope = (n*Sxy - Sx*Sy) /
    (n*Sxx - Sx^2) over (x = absolute bucket index = epoch div
    bucket_seconds, y = bucket count); the slope is shift-invariant,
    so absolute indices keep the math one-pass with no per-key min
    subtraction, and every product stays exact in DECIMAL(38,0).

    Reported as slope_micro_per_bucket = (1e6 * num) div den.
    Negative slopes make the rounding mode load-bearing: Spark's
    `div` and DuckDB's INTEGER `//` both truncate toward zero
    (verified: `(-7)//2 = -3` in DuckDB, same as Spark `div`; with
    FLOAT operands DuckDB's `//` returns the plain quotient `-3.5`
    instead, so keep every operand integer). The all-integer
    pipeline here is therefore bit-identical across engines on
    falling trends — exactly the half you page on. Keys with fewer
    than 2 distinct buckets emit no row (a single point has no
    trend). Output: (key, n_buckets, n_rows,
    slope_micro_per_bucket).

    Scale shape: stage 1 is the combiner-fed (key, bucket) count;
    stage 2 collapses each key's bucket series into five moments in
    one aggregate. State per key is O(1); the bucket table is
    time-bounded (one row per key-bucket), never row-scale.
    """
    if bucket_seconds <= 0:
        raise ValueError("trend_report: bucket_seconds must be > 0")
    missing = [c for c in (key_col, ts_col) if c not in df.columns]
    if missing:
        raise ValueError(f"trend_report: missing columns {missing}")
    per_bucket = (
        df.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.unix_micros(F.col(ts_col).cast("timestamp_ltz")).alias(
                "__us__"
            ),
        )
        .select(
            "key",
            # integer div end-to-end (no double rounding at bucket
            # boundaries); micros are non-negative in-domain so div
            # == floor here
            F.expr(f"__us__ div {int(bucket_seconds) * 1_000_000}").alias(
                "__x__"
            ),
        )
        .groupBy("key", "__x__")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__y__"))
    )
    d = "cast(__x__ as decimal(38,0))"
    dy = "cast(__y__ as decimal(38,0))"
    moments = per_bucket.groupBy("key").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n__"),
        F.expr(f"sum({d})").cast("decimal(38,0)").alias("__sx__"),
        F.expr(f"sum({dy})").cast("decimal(38,0)").alias("__sy__"),
        F.expr(f"sum({d} * {dy})").cast("decimal(38,0)").alias("__sxy__"),
        F.expr(f"sum({d} * {d})").cast("decimal(38,0)").alias("__sxx__"),
    )
    return (
        moments.filter(F.col("__n__") >= 2)
        .withColumn(
            "__num__",
            F.expr("(__n__ * __sxy__ - __sx__ * __sy__) * 1000000"),
        )
        .withColumn("__den__", F.expr("__n__ * __sxx__ - __sx__ * __sx__"))
        .select(
            F.col("key").alias(key_col),
            F.col("__n__").cast("bigint").alias("n_buckets"),
            F.col("__sy__").cast("bigint").alias("n_rows"),
            # den > 0 for >= 2 distinct buckets; truncating div
            # matches the oracle's integer `//` on negatives
            F.expr("CAST(__num__ div __den__ AS BIGINT)").alias(
                "slope_micro_per_bucket"
            ),
        )
    )


def referential_audit(
    df: DataFrame,
    dim: DataFrame,
    fk_col: str = "user_id",
    pk_col: str = "c_custkey",
    type_col: str = "event_type",
) -> DataFrame:
    """Enrich-miss (referential-integrity) audit: per event type, how
    many rows carry a foreign key with NO match in the dimension
    table. Every broadcast-enrich stage in this repo (dict_map,
    lookup_join, geoip) has a fill/missing policy — this is the card
    that MEASURES the miss rate before you pick one, and the alarm
    when an upstream id-space change (new tenant prefix, truncated
    key) silently turns an enrich stage into a no-op. Reference
    analog: processor_dict_map rows that match nothing keep their
    fields untouched (plugins/processor/dictmap) — invisible unless
    counted.

    NULL foreign keys count as orphans (they match nothing — the
    miss policy fires on them identically); n_orphan_keys counts
    DISTINCT non-null orphan key values, so n_orphans >>
    n_orphan_keys means few bad keys at high volume (fix upstream)
    while n_orphans ~ n_orphan_keys means a diffuse id-space drift.

    Output per type: (type_col, n_rows, n_orphans, orphan_micro,
    n_orphan_keys).

    Scale shape: the dimension collapses to its DISTINCT key column
    and BROADCASTS — the fact table never shuffles for the join; the
    per-type rollup is the only hash exchange, carrying (type, flag,
    key). The two-phase distinct count on orphan keys is the
    standard countDistinct expansion on the count-reduced side.
    """
    missing = [c for c in (fk_col, type_col) if c not in df.columns]
    if missing:
        raise ValueError(f"referential_audit: missing columns {missing}")
    if pk_col not in dim.columns:
        raise ValueError(
            f"referential_audit: dimension is missing column {pk_col}"
        )
    keys = dim.select(F.col(pk_col).alias("__pk__")).distinct()
    joined = df.select(
        F.col(type_col).alias("__t__"), F.col(fk_col).alias("__fk__")
    ).join(
        F.broadcast(keys),
        F.col("__fk__") == F.col("__pk__"),
        "left",
    )
    agg = joined.groupBy("__t__").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("__pk__").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_orphans"),
        F.countDistinct(
            F.when(F.col("__pk__").isNull(), F.col("__fk__"))
        )
        .cast("bigint")
        .alias("n_orphan_keys"),
    )
    return agg.select(
        F.col("__t__").alias(type_col),
        "n_rows",
        "n_orphans",
        F.expr("n_orphans * 1000000 div n_rows").alias("orphan_micro"),
        "n_orphan_keys",
    )


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """K-anonymity card over a quasi-identifier column set: before a
    table (or a training corpus derived from it) leaves the
    pipeline, how many rows sit in QI-groups smaller than ``k`` —
    i.e. are re-identifiable by joining the quasi-identifiers
    against an outside dataset? The release-hygiene companion of the
    PII scanners (text_pii_flags finds identifiers IN the text; this
    measures identifiability OF the row set).

    NULLs in QI columns group together (a NULL zip is itself a
    bucket). Output is ONE row: (n_rows, n_groups, n_small_groups
    [size < k], n_small_rows, small_rows_micro, min_group,
    max_group) — the decision numbers for generalize/suppress.

    Scale shape: one combiner-fed count on the QI tuple (the only
    raw-row pass), then a single global rollup over the GROUP-SIZE
    table — the wide state is the distinct-QI cardinality, never row
    count. The final aggregate is one row; no data joins back, so
    nothing row-scale moves twice.
    """
    if k < 2:
        raise ValueError(f"k_anonymity_report: k must be >= 2, got {k}")
    if not qi_cols:
        raise ValueError(
            "k_anonymity_report: qi_cols must name at least one column"
        )
    missing = [c for c in qi_cols if c not in df.columns]
    if missing:
        raise ValueError(f"k_anonymity_report: missing columns {missing}")
    sizes = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n__")
    )
    return sizes.agg(
        F.sum("__n__").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("__n__") < k, 1).otherwise(0))
        .cast("bigint")
        .alias("n_small_groups"),
        F.sum(F.when(F.col("__n__") < k, F.col("__n__")).otherwise(0))
        .cast("bigint")
        .alias("n_small_rows"),
        F.min("__n__").cast("bigint").alias("min_group"),
        F.max("__n__").cast("bigint").alias("max_group"),
    ).select(
        "n_rows",
        "n_groups",
        "n_small_groups",
        "n_small_rows",
        F.expr("n_small_rows * 1000000 div n_rows").alias(
            "small_rows_micro"
        ),
        "min_group",
        "max_group",
    )


def mttr_report(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    error_value: str = "error",
    order_col: str = "event_id",
) -> DataFrame:
    """Incident-recovery (MTTR) card per identity key: an incident
    OPENS at an error event whose previous event (in (ts, order)
    order) was not an error — consecutive errors extend the same
    incident, they don't open new ones — and CLOSES at the first
    subsequent non-error event (the recovery signal). The ops
    question behind the reference's alarm/self-monitor counters
    (`core/monitor/AlarmManager.h` tracks error counts; operators
    triage with "how long until it RECOVERED"): retry_storms finds
    duplicate deliveries, outage_windows finds silence — this
    measures time-to-heal.

    Output per key with >= 1 incident: (key, n_incidents,
    n_recovered, n_open [incidents never followed by a non-error
    event], mean_ttr_us, max_ttr_us). TTR is exact epoch-microsecond
    arithmetic (a 600.4 s recovery never second-floors — the
    retry_storms lesson) and mean_ttr_us is integer `div` over the
    recovered incidents (NULL when none recovered), so every number
    is engine-reproducible. Rows with NULL key/ts are dropped;
    ``order_col`` breaks ts ties into a total order on both engines.

    Scale shape: only (key, ts, order, is_error) survive the scan.
    The open-flag lag window, the reverse running-min recovery
    window, and the final rollup all partition on key — ONE hash
    exchange on key feeds all three (the two window sorts reuse the
    exchange; the aggregate is combiner-fed above it). State per
    task is O(1) per window frame; output is bounded by keys with
    incidents, never row count.
    """
    missing = [
        c for c in (key_col, ts_col, type_col, order_col)
        if c not in df.columns
    ]
    if missing:
        raise ValueError(f"mttr_report: missing columns {missing}")
    slim = df.select(
        F.col(key_col).alias("key"),
        F.unix_micros(F.col(ts_col).cast("timestamp_ltz")).alias("__us__"),
        F.col(order_col).alias("__ord__"),
        (F.col(type_col) == error_value).alias("__err__"),
    ).filter(F.col("key").isNotNull() & F.col("__us__").isNotNull())
    w = Window.partitionBy("key").orderBy("__us__", "__ord__")
    w_rev = (
        Window.partitionBy("key")
        .orderBy(F.col("__us__").desc(), F.col("__ord__").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = slim.withColumn("__prev_err__", F.lag("__err__").over(w)).withColumn(
        "__rec_us__",
        F.min(F.when(~F.col("__err__"), F.col("__us__"))).over(w_rev),
    )
    incidents = marked.filter(
        F.col("__err__")
        & (F.col("__prev_err__").isNull() | ~F.col("__prev_err__"))
    ).select(
        "key",
        F.col("__us__").alias("__open__"),
        F.col("__rec_us__").alias("__rec__"),
    )
    return (
        incidents.groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_incidents"),
            F.count("__rec__").cast("bigint").alias("n_recovered"),
            (F.count(F.lit(1)) - F.count("__rec__"))
            .cast("bigint")
            .alias("n_open"),
            F.sum(F.col("__rec__") - F.col("__open__"))
            .cast("bigint")
            .alias("__sum_ttr__"),
            F.max(F.col("__rec__") - F.col("__open__"))
            .cast("bigint")
            .alias("max_ttr_us"),
        )
        .select(
            "key",
            "n_incidents",
            "n_recovered",
            "n_open",
            F.when(
                F.col("n_recovered") > 0,
                F.expr("__sum_ttr__ div n_recovered"),
            )
            .cast("bigint")
            .alias("mean_ttr_us"),
            "max_ttr_us",
        )
    )


def changepoint_report(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Per-key level-shift (change-point) card: the bucket boundary
    that maximizes |mean rate before − mean rate after| over the
    key's per-bucket counts — the "WHEN did this source's volume
    step?" triage that trend_report (gradual slope) and rate_spikes
    (single-bucket z-score) both miss. A config rollout that doubles
    a source's log rate shows up as the argmax boundary with
    before/after rates attached.

    For each key, buckets PRESENT in the data are ordered and every
    split point r (2..B) is scored: shift = |floor-micro
    mean(buckets < r) − floor-micro mean(buckets >= r)|. The best
    split (shift DESC, earliest bucket ASC — a total order) is
    reported as (key, n_buckets, n_rows, split_ts [first bucket of
    the AFTER regime], rate_before_micro, rate_after_micro,
    shift_micro). Rates are events-per-present-bucket in floor-micro
    integers; empty buckets are absent from the mean (gapfill_counts
    is the dense-grid view), which is the right denominator for
    bursty sources. All arithmetic is DECIMAL(38,0) products with
    truncating `div` (the trend_report parity rules), so both
    engines agree bit-for-bit. Keys with < 2 present buckets emit no
    row.

    Scale shape: stage 1 is the combiner-fed (key, bucket) count —
    the only raw-row pass. Stage 2 windows over the bucket table
    partition on key (cumsum, totals, argmax all share ONE
    count-reduced exchange); state is one bucket row per key-bucket,
    time-bounded, never row-scale.
    """
    if bucket_seconds <= 0:
        raise ValueError("changepoint_report: bucket_seconds must be > 0")
    missing = [c for c in (key_col, ts_col) if c not in df.columns]
    if missing:
        raise ValueError(f"changepoint_report: missing columns {missing}")
    per_bucket = (
        df.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.expr(
                f"unix_micros(cast({ts_col} as timestamp_ltz)) div "
                f"{int(bucket_seconds) * 1_000_000}"
            ).alias("__x__"),
        )
        .filter(F.col("key").isNotNull())
        .groupBy("key", "__x__")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__y__"))
    )
    wo = Window.partitionBy("key").orderBy("__x__")
    wall = Window.partitionBy("key")
    scored = (
        per_bucket.withColumn("__rn__", F.row_number().over(wo))
        .withColumn(
            "__cum__",
            F.sum("__y__").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("__B__", F.count(F.lit(1)).over(wall))
        .withColumn("__S__", F.sum("__y__").over(wall))
        .filter((F.col("__rn__") >= 2) & (F.col("__B__") >= 2))
        .withColumn("__cumprev__", F.col("__cum__") - F.col("__y__"))
        .withColumn(
            "__before__",
            F.expr(
                "cast(__cumprev__ as decimal(38,0)) * 1000000 div "
                "cast(__rn__ - 1 as decimal(38,0))"
            ),
        )
        .withColumn(
            "__after__",
            F.expr(
                "cast(__S__ - __cumprev__ as decimal(38,0)) * 1000000 div "
                "cast(__B__ - __rn__ + 1 as decimal(38,0))"
            ),
        )
        .withColumn("__shift__", F.abs(F.col("__before__") - F.col("__after__")))
    )
    pick = Window.partitionBy("key").orderBy(
        F.col("__shift__").desc(), F.col("__x__").asc()
    )
    return (
        scored.withColumn("__pick__", F.row_number().over(pick))
        .filter(F.col("__pick__") == 1)
        .select(
            "key",
            F.col("__B__").cast("bigint").alias("n_buckets"),
            F.col("__S__").cast("bigint").alias("n_rows"),
            F.timestamp_micros(
                F.col("__x__") * int(bucket_seconds) * 1_000_000
            ).alias("split_ts"),
            F.col("__before__").cast("bigint").alias("rate_before_micro"),
            F.col("__after__").cast("bigint").alias("rate_after_micro"),
            F.col("__shift__").cast("bigint").alias("shift_micro"),
        )
    )


def diversity_report(
    df: DataFrame,
    group_col: str = "event_type",
    key_col: str = "user_id",
) -> DataFrame:
    """Gini–Simpson diversity card per group: 1 − Σ(n_i/N)² over the
    group's key distribution — the probability two random rows come
    from DIFFERENT keys — plus the inverse-Simpson "effective number
    of keys". The corpus-mixing / skew counterpart of
    concentration_report: concentration names how much the top keys
    own, diversity compresses the WHOLE distribution into one number
    a mixture rebalancer can target ("source X looks like 3.2
    effective tenants, source Y like 900").

    Both numbers are exact rationals evaluated in DECIMAL(38,0):
    simpson_micro = ((N² − Σn_i²) · 1e6) div N², and
    effective_keys_micro = (N² · 1e6) div Σn_i² (1e6 = one key's
    worth). No ln/entropy variant on purpose — Shannon needs libm
    logs whose last-ulp drift breaks cross-engine floor parity;
    Simpson is a polynomial, so DuckDB HUGEINT and Spark DECIMAL
    agree bit-for-bit. NULL keys form their own bucket (the
    k_anonymity rule). Output per group: (gtype, n_rows, n_keys,
    simpson_micro, effective_keys_micro).

    Scale shape: one combiner-fed (group, key) count is the only
    raw-row pass; the moment collapse aggregates the count table
    with O(1) state per group. At 10^12 rows N² ≈ 10^24 — inside
    DECIMAL(38,0)/HUGEINT range, which is why the products are not
    BIGINT.
    """
    missing = [c for c in (group_col, key_col) if c not in df.columns]
    if missing:
        raise ValueError(f"diversity_report: missing columns {missing}")
    counts = df.groupBy(
        F.col(group_col).alias("gtype"), F.col(key_col).alias("__k__")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__n__"))
    moments = counts.groupBy("gtype").agg(
        F.sum("__n__").cast("decimal(38,0)").alias("__N__"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.expr(
            "sum(cast(__n__ as decimal(38,0)) * cast(__n__ as decimal(38,0)))"
        )
        .cast("decimal(38,0)")
        .alias("__sum2__"),
    )
    return moments.select(
        "gtype",
        F.col("__N__").cast("bigint").alias("n_rows"),
        "n_keys",
        F.expr(
            "cast((__N__ * __N__ - __sum2__) * 1000000 div (__N__ * __N__) "
            "as bigint)"
        ).alias("simpson_micro"),
        F.expr(
            "cast(__N__ * __N__ * 1000000 div __sum2__ as bigint)"
        ).alias("effective_keys_micro"),
    )


def l_diversity_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """L-diversity card — k_anonymity_report's second axis: a QI
    group can be large (k-anonymous) and still leak, if every row in
    it shares the same SENSITIVE value ("all five people in that
    zip+age bucket have the same diagnosis" — the homogeneity
    attack). Per QI group this measures the number of DISTINCT
    sensitive values; groups below ``l`` are weak.

    Output is ONE row: (n_rows, n_groups, n_weak_groups [distinct
    sensitive < l], n_weak_rows, weak_rows_micro, min_l, max_l).
    NULL QI values form their own bucket (the k_anonymity rule);
    NULL sensitive values do NOT count as a diversity value (a
    group of all-NULL sensitives has l = 0 — unknown is not
    diverse), matching COUNT(DISTINCT) on both engines.

    Scale shape: one combiner-fed (QI, sensitive) count collapses
    the raw rows — the widest state is distinct (QI, sensitive)
    pairs; the per-group (n, l) reduction and the single-row rollup
    both aggregate already-reduced tables. No row-scale data moves
    twice, and the two-phase distinct never expands: it is an exact
    aggregate over the pair table.
    """
    if l < 2:
        raise ValueError(f"l_diversity_report: l must be >= 2, got {l}")
    if not qi_cols:
        raise ValueError(
            "l_diversity_report: qi_cols must name at least one column"
        )
    missing = [c for c in [*qi_cols, sensitive_col] if c not in df.columns]
    if missing:
        raise ValueError(f"l_diversity_report: missing columns {missing}")
    pairs = df.groupBy(
        *qi_cols, F.col(sensitive_col).alias("__s__")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__n__"))
    groups = pairs.groupBy(*qi_cols).agg(
        F.sum("__n__").cast("bigint").alias("__rows__"),
        F.count(F.when(F.col("__s__").isNotNull(), 1))
        .cast("bigint")
        .alias("__l__"),
    )
    return groups.agg(
        F.sum("__rows__").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("__l__") < l, 1).otherwise(0))
        .cast("bigint")
        .alias("n_weak_groups"),
        F.sum(F.when(F.col("__l__") < l, F.col("__rows__")).otherwise(0))
        .cast("bigint")
        .alias("n_weak_rows"),
        F.min("__l__").cast("bigint").alias("min_l"),
        F.max("__l__").cast("bigint").alias("max_l"),
    ).select(
        "n_rows",
        "n_groups",
        "n_weak_groups",
        "n_weak_rows",
        F.expr("n_weak_rows * 1000000 div n_rows").alias("weak_rows_micro"),
        "min_l",
        "max_l",
    )


def apdex_report(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 10.0,
) -> DataFrame:
    """Apdex card per key: the SRE satisfaction ratio over a latency
    column — satisfied (value <= T), tolerating (T < value <= 4T),
    frustrated (the rest) — collapsed to apdex_milli = 1000 * (sat +
    tol/2) / n, computed as (2*sat + tol) * 500 div n so the number
    is an exact integer on both engines (no float half-weights). The
    "is it fast ENOUGH" companion of grouped_quantiles: a quantile
    tells you the p95, Apdex tells you what share of users noticed.

    NULL values are excluded from n (unknown latency is not
    frustration). Output per key: (key, n, n_satisfied,
    n_tolerating, n_frustrated, apdex_milli). Keys with zero
    non-NULL values emit no row.

    Scale shape: three CASE counters in ONE combiner-fed aggregate —
    the only exchange carries four counters per key, O(1) state,
    no window, no value-domain sort (the cheapest of the latency
    cards by construction).
    """
    if threshold <= 0:
        raise ValueError(
            f"apdex_report: threshold must be > 0, got {threshold}"
        )
    missing = [c for c in (key_col, value_col) if c not in df.columns]
    if missing:
        raise ValueError(f"apdex_report: missing columns {missing}")
    v = F.col(value_col)
    agg = (
        df.filter(v.isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(v <= threshold, 1).otherwise(0))
            .cast("bigint")
            .alias("n_satisfied"),
            F.sum(
                F.when((v > threshold) & (v <= 4 * threshold), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_tolerating"),
        )
    )
    return agg.select(
        "key",
        "n",
        "n_satisfied",
        "n_tolerating",
        (F.col("n") - F.col("n_satisfied") - F.col("n_tolerating"))
        .cast("bigint")
        .alias("n_frustrated"),
        F.expr("(2 * n_satisfied + n_tolerating) * 500 div n").alias(
            "apdex_milli"
        ),
    )


def exp_histogram(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    scale: int = 1_000_000,
) -> DataFrame:
    """Exponential (power-of-two) value histogram per key — the
    Prometheus/OTel-native-histogram shape: one bucket per log2 band
    of the scaled value, carrying count/min/max. The O(1)-state
    distribution card: grouped_quantiles pays a per-group sort of
    the value DOMAIN for exact percentiles; this pays nothing but a
    (key, bucket) count and still answers "what order of magnitude
    are the latencies, and how heavy is each band?" — the right
    first look before choosing quantile parameters at 100 TB.

    Buckets: the value is scaled to an integer v = floor(value *
    scale); bucket = bit_length(v) for v >= 1 (i.e. bucket b spans
    [2^(b-1), 2^b) in scaled units), bucket 0 holds v = 0, bucket -1
    holds negative values (timings should not be negative — the
    band is a data-quality tripwire, not a histogram). bit_length
    is string-free integer math on both engines (Spark ``bin()``
    length, DuckDB ``bit_length``-equivalent via log-free formula),
    so bucket edges can never drift. NULL values are dropped.

    Output per (key, bucket): (key, bucket, lo_scaled [inclusive
    band floor, NULL for the negative band], n, min_scaled,
    max_scaled), ordered by the caller.

    Scale shape: bucketing is a scan-side expression; ONE
    combiner-fed (key, bucket) aggregate is the only exchange, and
    its cardinality is keys x ~64 buckets regardless of row count.
    """
    if scale <= 0:
        raise ValueError(f"exp_histogram: scale must be > 0, got {scale}")
    missing = [c for c in (key_col, value_col) if c not in df.columns]
    if missing:
        raise ValueError(f"exp_histogram: missing columns {missing}")
    v = F.floor(F.col(value_col) * F.lit(scale)).cast("bigint")
    bucket = (
        F.when(v < 0, F.lit(-1))
        .when(v == 0, F.lit(0))
        .otherwise(F.length(F.expr(f"bin(floor({value_col} * {scale}))")))
        .cast("int")
    )
    out = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            bucket.alias("bucket"),
            v.alias("__v__"),
        )
        .groupBy("key", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("__v__").cast("bigint").alias("min_scaled"),
            F.max("__v__").cast("bigint").alias("max_scaled"),
        )
    )
    return out.select(
        "key",
        "bucket",
        F.when(
            F.col("bucket") > 0,
            F.expr("shiftleft(cast(1 as bigint), bucket - 1)"),
        )
        .when(F.col("bucket") == 0, F.lit(0))
        .cast("bigint")
        .alias("lo_scaled"),
        "n",
        "min_scaled",
        "max_scaled",
    )


def mad_outliers(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    k: int = 5,
    min_mad: int = 1,
) -> DataFrame:
    """Robust (median/MAD) outlier buckets per key: flag buckets whose
    count deviates from the key's MEDIAN bucket count by more than
    ``k`` x the median absolute deviation — the
    robust-statistics twin of rate_spikes. The trailing-mean rule
    reacts to the recent past (and a slow ramp drags its baseline
    up); median/MAD judge against the key's WHOLE distribution and
    shrug off the outliers themselves (50% breakdown point), so a
    handful of insane buckets can't hide each other — the
    distributional "which hours were abnormal, period" card.

    Both medians are exact nearest-rank selections (value at rank
    ceil(B/2) of the sorted values — the grouped_quantiles
    rationale: selections are engine-reproducible, interpolations
    are not), deviations are |y − med| integers, and the flag rule
    is dev > k · max(MAD, ``min_mad``) in pure integer math —
    ``min_mad`` floors the scale so a key whose typical bucket is
    perfectly constant (MAD 0) flags real deviations instead of
    everything. Only flagged buckets are emitted: (key, bucket_ts,
    n_events, median, mad).

    Scale shape: the raw stream collapses to (key, bucket) counts in
    one combiner-fed aggregate; the two rank selections and the flag
    filter are windows over the bucket table, ALL partitioned on key
    — one count-reduced exchange, per-key state bounded by the
    key's bucket count (time-bounded, never row-scale).
    """
    if bucket_seconds <= 0:
        raise ValueError("mad_outliers: bucket_seconds must be > 0")
    if k < 1:
        raise ValueError(f"mad_outliers: k must be >= 1, got {k}")
    if min_mad < 1:
        raise ValueError(f"mad_outliers: min_mad must be >= 1, got {min_mad}")
    missing = [c for c in (key_col, ts_col) if c not in df.columns]
    if missing:
        raise ValueError(f"mad_outliers: missing columns {missing}")
    per_bucket = (
        df.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.expr(
                f"unix_micros(cast({ts_col} as timestamp_ltz)) div "
                f"{int(bucket_seconds) * 1_000_000}"
            ).alias("__x__"),
        )
        .filter(F.col("key").isNotNull())
        .groupBy("key", "__x__")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__y__"))
    )
    wall = Window.partitionBy("key")
    w_by_y = Window.partitionBy("key").orderBy("__y__", "__x__")
    with_med = (
        per_bucket.withColumn("__B__", F.count(F.lit(1)).over(wall))
        .withColumn("__ry__", F.row_number().over(w_by_y))
        .withColumn(
            "__med__",
            F.max(
                F.when(
                    F.col("__ry__") == F.ceil(F.col("__B__") / 2),
                    F.col("__y__"),
                )
            ).over(wall),
        )
        .withColumn("__dev__", F.abs(F.col("__y__") - F.col("__med__")))
    )
    w_by_dev = Window.partitionBy("key").orderBy("__dev__", "__x__")
    with_mad = with_med.withColumn(
        "__rd__", F.row_number().over(w_by_dev)
    ).withColumn(
        "__mad__",
        F.max(
            F.when(
                F.col("__rd__") == F.ceil(F.col("__B__") / 2),
                F.col("__dev__"),
            )
        ).over(wall),
    )
    return with_mad.filter(
        F.col("__dev__")
        > k * F.greatest(F.col("__mad__"), F.lit(int(min_mad)))
    ).select(
        "key",
        F.timestamp_micros(
            F.col("__x__") * int(bucket_seconds) * 1_000_000
        ).alias("bucket_ts"),
        F.col("__y__").alias("n_events"),
        F.col("__med__").alias("median"),
        F.col("__mad__").alias("mad"),
    )


def funnel_latency(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Funnel STEP-LATENCY card — funnel_report counts who converted;
    this measures how long each conversion step took. For every user
    who reached step k (same strict-sequence semantics: the first
    step-k event strictly after their step-(k-1) time), the step's
    gap is t_k − t_{k−1} in exact epoch micros; per step the card
    reports the converted count, the nearest-rank MEDIAN gap, and
    the max gap — the "users convert, but the click→purchase leg
    takes 40 minutes" number that decides where to spend funnel
    work.

    Output: one row per step 2..K — (step_idx, step, n_users,
    median_gap_us, max_gap_us). Steps nobody reached emit a zero row
    with NULL gaps. Median is the value at rank ceil(n/2) of the
    sorted gaps (ties broken by user id for a total order — the
    selection is value-identical regardless), so every engine
    reports the same microsecond.

    Scale shape: reuses funnel_report's level construction — each
    level is a one-row-per-user (user, ts) frame built by joining a
    single-step event slice against the previous level; gaps join
    two one-row-per-user frames. The median windows partition on
    step_idx (|steps| groups) over the converted-user table — the
    per-step sort is user-cardinality-bounded; at extreme user
    counts swap in grouped_quantiles' value-domain form. Raw events
    never see a window.
    """
    missing = [
        c for c in (user_col, type_col, ts_col) if c not in df.columns
    ]
    if missing:
        raise ValueError(f"funnel_latency: missing columns {missing}")
    levels = _funnel_levels(
        df,
        steps,
        user_col,
        type_col,
        F.unix_micros(F.col(ts_col).cast("timestamp_ltz")),
    )
    gaps = None
    for k in range(1, len(steps)):
        g = (
            levels[k]
            .join(
                levels[k - 1].select(
                    "__u__", F.col("__r__").alias("__prev__")
                ),
                "__u__",
            )
            .select(
                F.lit(k + 1).alias("step_idx"),
                "__u__",
                (F.col("__r__") - F.col("__prev__")).alias("__gap__"),
            )
        )
        gaps = g if gaps is None else gaps.unionByName(g)
    wall = Window.partitionBy("step_idx")
    w_rank = Window.partitionBy("step_idx").orderBy("__gap__", "__u__")
    per_step = (
        gaps.withColumn("__n__", F.count(F.lit(1)).over(wall))
        .withColumn("__rn__", F.row_number().over(w_rank))
        .groupBy("step_idx")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.max(
                F.when(
                    F.col("__rn__") == F.ceil(F.col("__n__") / 2),
                    F.col("__gap__"),
                )
            )
            .cast("bigint")
            .alias("median_gap_us"),
            F.max("__gap__").cast("bigint").alias("max_gap_us"),
        )
    )
    names = df.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps) if i >= 1],
        "step_idx int, step string",
    )
    return (
        names.join(per_step, "step_idx", "left")
        .select(
            "step_idx",
            "step",
            F.coalesce(F.col("n_users"), F.lit(0))
            .cast("bigint")
            .alias("n_users"),
            F.col("median_gap_us").cast("bigint").alias("median_gap_us"),
            F.col("max_gap_us").cast("bigint").alias("max_gap_us"),
        )
        .orderBy("step_idx")
    )


def attribution_report(
    df: DataFrame,
    conversion_type: str = "purchase",
    touch_types: list[str] | None = None,  # None -> ["click", "view"]
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
    lookback_sec: int = 86_400,
) -> DataFrame:
    """Last-touch attribution card: every conversion event is credited
    to the user's LATEST preceding touch event (strictly before in
    (ts, order) order, within ``lookback_sec``); conversions with no
    in-window touch credit the 'direct' channel. The marketing-
    analytics question behind funnel_report's strict sequence —
    funnels count ordered journeys, attribution answers "which
    channel gets credit for each conversion, and how stale was the
    touch?".

    Output: one row per channel (each touch type that earned credit,
    plus 'direct') — (channel, n_conversions, share_micro,
    median_gap_us, max_gap_us); gaps are exact epoch micros from
    touch to conversion, nearest-rank medians, NULL for 'direct'.

    Scale shape: the asof union trick — touches and conversions
    union into one frame and a running last-touch struct (max over a
    rows-preceding frame of a (us, ord, channel) struct — max picks
    the latest (ts, ord), O(1) window state) attributes every
    conversion in ONE pass; one hash exchange on user feeds the
    window, and the channel rollup aggregates |channels| + 1 groups.
    No per-conversion join, no per-user sort beyond the shared
    window sort.
    """
    if touch_types is None:
        touch_types = ["click", "view"]
    if not touch_types:
        raise ValueError(
            "attribution_report: touch_types must name at least one type"
        )
    if conversion_type in touch_types:
        raise ValueError(
            "attribution_report: conversion_type cannot also be a touch type"
        )
    if lookback_sec <= 0:
        raise ValueError("attribution_report: lookback_sec must be > 0")
    missing = [
        c
        for c in (user_col, type_col, ts_col, order_col)
        if c not in df.columns
    ]
    if missing:
        raise ValueError(f"attribution_report: missing columns {missing}")
    slim = (
        df.filter(
            F.col(type_col).isin([conversion_type, *touch_types])
            & F.col(ts_col).isNotNull()
            & F.col(user_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("__u__"),
            F.col(type_col).alias("__t__"),
            F.unix_micros(F.col(ts_col).cast("timestamp_ltz")).alias(
                "__us__"
            ),
            F.col(order_col).cast("bigint").alias("__ord__"),
        )
    )
    w = (
        Window.partitionBy("__u__")
        .orderBy("__us__", "__ord__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # the running last-touch is a MAX over a fixed-width sortable
    # string '<us+2^62:020d>|<ord+2^62:020d>|<channel>' rather than
    # a struct: string max is defined identically on every engine,
    # struct comparison is not a portable contract. The 2^62 offset
    # keeps the encoding order-preserving for NEGATIVE micros/order
    # ids too (pre-1970 timestamps would otherwise lpad as
    # '0000…-123', break string order, and silently mis-credit
    # 'direct'); |us| and |ord| < 2^62 covers every realistic
    # domain and the offset sum still fits 20 digits.
    _OFF = 1 << 62
    touch_key = F.when(
        F.col("__t__") != conversion_type,
        F.concat(
            F.lpad((F.col("__us__") + _OFF).cast("string"), 20, "0"),
            F.lit("|"),
            F.lpad((F.col("__ord__") + _OFF).cast("string"), 20, "0"),
            F.lit("|"),
            F.col("__t__"),
        ),
    )
    last_us = F.substring(F.col("__last__"), 1, 20).cast("bigint") - F.lit(
        _OFF
    )
    in_window = F.col("__last__").isNotNull() & (
        F.col("__us__") - last_us <= int(lookback_sec) * 1_000_000
    )
    attributed = (
        slim.withColumn("__last__", F.max(touch_key).over(w))
        .filter(F.col("__t__") == conversion_type)
        .select(
            "__u__",
            "__us__",
            F.when(in_window, F.expr("substring(__last__, 43)"))
            .otherwise(F.lit("direct"))
            .alias("channel"),
            F.when(in_window, F.col("__us__") - last_us).alias("__gap__"),
        )
    )
    wall = Window.partitionBy("channel")
    w_rank = Window.partitionBy("channel").orderBy(
        "__gap__", "__u__", "__us__"
    )
    per_channel = (
        attributed.withColumn(
            "__n__", F.count(F.col("__gap__")).over(wall)
        )
        .withColumn("__rn__", F.row_number().over(w_rank))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
            F.max(
                F.when(
                    F.col("__gap__").isNotNull()
                    & (
                        F.col("__rn__")
                        == F.ceil(F.col("__n__") / 2)
                    ),
                    F.col("__gap__"),
                )
            )
            .cast("bigint")
            .alias("median_gap_us"),
            F.max("__gap__").cast("bigint").alias("max_gap_us"),
        )
    )
    total = attributed.agg(
        F.count(F.lit(1)).cast("bigint").alias("__tot__")
    )
    return per_channel.crossJoin(F.broadcast(total)).select(
        "channel",
        "n_conversions",
        F.expr("n_conversions * 1000000 div __tot__").alias("share_micro"),
        "median_gap_us",
        "max_gap_us",
    )


def gap_histogram(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Inter-arrival-gap histogram per key, in power-of-two
    microsecond bands — the measurement that should SET every
    window threshold this repo's other operators take as input:
    sessionize's gap, outage_windows' min_gap, retry_storms'
    window_sec, mad_outliers' bucket size are all guesses until you
    look at the actual gap distribution, and this card is that look
    at O(keys x 64) output rows.

    Per (key, bucket): (key, bucket, lo_us [inclusive band floor,
    2^(bucket-1); 0 for the zero-gap band], n, min_gap_us,
    max_gap_us). Buckets use the exp_histogram bit-length rule —
    integer-only band edges, identical on every engine. Gaps are
    exact epoch-micro differences between consecutive events in
    (ts, order) order; the first event of each key has no gap and
    contributes nothing; NULL key/ts rows are dropped.

    Scale shape: ONE hash exchange on key feeds the lag window;
    bucketing is a scan-side expression above it and the (key,
    bucket) aggregate is combiner-fed on the SAME partitioning (no
    second exchange). Output cardinality is keys x ~64 bands
    regardless of row count.
    """
    missing = [
        c for c in (key_col, ts_col, order_col) if c not in df.columns
    ]
    if missing:
        raise ValueError(f"gap_histogram: missing columns {missing}")
    slim = df.select(
        F.col(key_col).alias("key"),
        F.unix_micros(F.col(ts_col).cast("timestamp_ltz")).alias("__us__"),
        F.col(order_col).alias("__ord__"),
    ).filter(F.col("key").isNotNull() & F.col("__us__").isNotNull())
    w = Window.partitionBy("key").orderBy("__us__", "__ord__")
    gapped = slim.withColumn(
        "__gap__", F.col("__us__") - F.lag("__us__").over(w)
    ).filter(F.col("__gap__").isNotNull())
    bucket = (
        F.when(F.col("__gap__") == 0, F.lit(0))
        .otherwise(F.length(F.expr("bin(__gap__)")))
        .cast("int")
    )
    out = (
        gapped.select("key", bucket.alias("bucket"), "__gap__")
        .groupBy("key", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("__gap__").cast("bigint").alias("min_gap_us"),
            F.max("__gap__").cast("bigint").alias("max_gap_us"),
        )
    )
    return out.select(
        "key",
        "bucket",
        F.when(
            F.col("bucket") > 0,
            F.expr("shiftleft(cast(1 as bigint), bucket - 1)"),
        )
        .when(F.col("bucket") == 0, F.lit(0))
        .cast("bigint")
        .alias("lo_us"),
        "n",
        "min_gap_us",
        "max_gap_us",
    )


def user_lifetime(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user lifecycle card: first/last seen, lifetime, active
    days, and events per active day — the user-grain table
    cohort_retention's cohort-grain matrix aggregates away (a
    retention cell says "40% came back in week 3"; churn triage
    needs WHICH users went quiet and how dense their activity was
    while alive). One combiner-fed aggregate; the per-day distinct
    rides the same groupBy as an exact count over (user, day) pairs.

    Output per user: (user_id, n_events, first_us, last_us,
    lifetime_sec [floor-second, the outage_windows arithmetic],
    active_days [distinct UTC dates], events_per_day_micro
    [n·1e6 div active_days]). NULL user/ts rows are dropped.

    Scale shape: one exchange on user carrying five counters plus
    the two-phase distinct-day expand over (user, day) — day
    cardinality per user is time-bounded, so the distinct never
    sees row-scale state. Output is one row per user.
    """
    missing = [c for c in (user_col, ts_col) if c not in df.columns]
    if missing:
        raise ValueError(f"user_lifetime: missing columns {missing}")
    slim = df.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp_ltz")).alias("__us__"),
        F.to_date(F.col(ts_col).cast("timestamp_ltz")).alias("__day__"),
    ).filter(F.col("user_id").isNotNull() & F.col("__us__").isNotNull())
    agg = slim.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("__us__").cast("bigint").alias("first_us"),
        F.max("__us__").cast("bigint").alias("last_us"),
        F.countDistinct("__day__").cast("bigint").alias("active_days"),
    )
    return agg.select(
        "user_id",
        "n_events",
        "first_us",
        "last_us",
        F.expr("last_us div 1000000 - first_us div 1000000")
        .cast("bigint")
        .alias("lifetime_sec"),
        "active_days",
        F.expr("n_events * 1000000 div active_days").alias(
            "events_per_day_micro"
        ),
    )
