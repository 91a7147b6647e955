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

from pyspark.sql import DataFrame, Window
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
