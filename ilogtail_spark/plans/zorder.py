"""Z-order (Morton) clustering for multi-dimension file skipping,
plus the audit that MEASURES what the layout buys.

At 100 TB the cheapest query is the one that never reads a file:
parquet/Iceberg row groups carry per-column min/max, and the planner
prunes groups whose range excludes the predicate. A table sorted by
ingestion time prunes beautifully on ts and not at all on user_id;
sorting by user_id inverts the problem. Z-ORDERING interleaves the
bits of both dimensions so files stay narrow in EVERY interleaved
dimension at once — the layout trick behind Delta/Iceberg OPTIMIZE
ZORDER BY, rebuilt here as plain Spark expressions (reference analog:
iLogtail's at-rest shard key is single-dimension —
`plugins/flusher/kafka/flusher_kafka_v2.go` hash partitioning; the
multi-dim layout question appears as soon as the store is columnar).

Everything is exact integer math shared verbatim with the DuckDB
oracle: dimension values normalize to a 2^bits grid with floor
division over the GLOBAL min/max (two scalars, driver-side — the
bounded-collect contract), the Morton value is a constant-folded sum
of shift-and-mask terms, and the audit reports per-file min/max SPANS
— the exact quantity range pruning reads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def morton_interleave(xb: Column, yb: Column, bits: int) -> Column:
    """Morton (Z-curve) value of two ``bits``-wide non-negative
    integer columns: x's bit i lands at position 2i+1, y's at 2i.
    Unrolled into 2*bits shift-and-mask terms — a fixed-size
    expression tree inside whole-stage codegen, no UDF, no loop at
    runtime."""
    if not 1 <= bits <= 31:
        raise ValueError(f"morton_interleave: bits must be in 1..31, got {bits}")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + F.shiftleft(
            F.shiftright(xb.cast("bigint"), i).bitwiseAND(F.lit(1)),
            2 * i + 1,
        ) + F.shiftleft(
            F.shiftright(yb.cast("bigint"), i).bitwiseAND(F.lit(1)),
            2 * i,
        )
    return z


def grid_bucket(col_name: str, lo: int, hi: int, bits: int) -> Column:
    """Scale an integer column (by name) into the [0, 2^bits) grid
    with pure integer arithmetic: floor((x - lo) * (2^bits - 1) /
    (hi - lo)). ``lo``/``hi`` are the global min/max (Python ints —
    literals in the plan). A degenerate dimension (hi == lo) maps
    to 0."""
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("bigint")
    top = (1 << bits) - 1
    # DECIMAL(38,0) product, not BIGINT: a wide-domain dimension
    # (epoch micros spanning decades x a 16-bit grid) overflows long
    # — the changepoint/trend/diversity product rule applies here too
    return F.expr(
        f"cast(cast(({col_name} - {lo}) as decimal(38,0)) * {top} "
        f"div cast({span} as decimal(38,0)) as bigint)"
    )


def zorder_audit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_files: int = 64,
    bits: int = 16,
) -> DataFrame:
    """Layout-effectiveness audit: split the table into ``n_files``
    equal row groups under TWO candidate layouts — natural x-order
    (the single-column sort a time-ordered ingest produces) and
    Z-order on (x, y) — and report, per layout and dimension, the
    mean per-file grid span. The span IS the pruning story: a point
    predicate on dimension d reads the files whose [min, max] span
    contains it, so expected files touched = sum(spans) / grid; a
    layout with avg_span_micro = 1e6 keeps every file full-width in
    that dimension (zero pruning), 1e6/n_files is the single-sort
    optimum.

    Output: one row per (layout, dim) — (layout ['natural'|'zorder'],
    dim [x_col|y_col], n_files, avg_span_micro) where avg_span_micro
    = floor(1e6 * Σ(max_b − min_b + 1) / (n_files · 2^bits)) over
    the per-file grid-bucket min/max. Exact integers end-to-end;
    rows with NULL in either dimension are dropped (they carry no
    range-pruning information).

    Scale shape: global min/max per dimension are ONE two-scalar
    aggregate (driver literals); bucketing and the Morton value are
    scan-side codegen expressions; each layout costs one total sort
    (ntile over a global order — at real scale this is the
    repartitionByRange + local-sort write path, same movement); the
    audit aggregate is n_files x 2 rows per layout. Use the audit at
    a SAMPLE of the table to choose a layout before rewriting 100 TB.
    """
    if n_files < 2:
        raise ValueError(f"zorder_audit: n_files must be >= 2, got {n_files}")
    if not 1 <= bits <= 31:
        raise ValueError(f"zorder_audit: bits must be in 1..31, got {bits}")
    missing = [c for c in (x_col, y_col) if c not in df.columns]
    if missing:
        raise ValueError(f"zorder_audit: missing columns {missing}")
    slim = df.select(
        F.col(x_col).cast("bigint").alias("__x__"),
        F.col(y_col).cast("bigint").alias("__y__"),
    ).filter(F.col("__x__").isNotNull() & F.col("__y__").isNotNull())
    lo_x, hi_x, lo_y, hi_y = slim.agg(
        F.min("__x__"), F.max("__x__"), F.min("__y__"), F.max("__y__")
    ).collect()[0]
    if lo_x is None:
        raise ValueError("zorder_audit: no rows with both dimensions set")
    xb = grid_bucket("__x__", int(lo_x), int(hi_x), bits)
    yb = grid_bucket("__y__", int(lo_y), int(hi_y), bits)
    bucketed = slim.select(
        xb.alias("__xb__"),
        yb.alias("__yb__"),
    ).withColumn("__z__", morton_interleave(F.col("__xb__"), F.col("__yb__"), bits))

    grid = 1 << bits
    out = None
    for layout, order in (
        ("natural", [F.col("__xb__"), F.col("__yb__")]),
        ("zorder", [F.col("__z__"), F.col("__xb__"), F.col("__yb__")]),
    ):
        w = Window.orderBy(*order)
        files = bucketed.withColumn("__f__", F.ntile(n_files).over(w))
        spans = files.groupBy("__f__").agg(
            (F.max("__xb__") - F.min("__xb__") + 1).alias("__sx__"),
            (F.max("__yb__") - F.min("__yb__") + 1).alias("__sy__"),
        )
        per_dim = spans.agg(
            F.sum("__sx__").cast("bigint").alias("__tx__"),
            F.sum("__sy__").cast("bigint").alias("__ty__"),
            F.count(F.lit(1)).cast("bigint").alias("__nf__"),
        ).select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit(layout).alias("layout"),
                        F.lit(x_col).alias("dim"),
                        F.col("__nf__").alias("n_files"),
                        F.expr(f"__tx__ * 1000000 div (__nf__ * {grid})")
                        .cast("bigint")
                        .alias("avg_span_micro"),
                    ),
                    F.struct(
                        F.lit(layout).alias("layout"),
                        F.lit(y_col).alias("dim"),
                        F.col("__nf__").alias("n_files"),
                        F.expr(f"__ty__ * 1000000 div (__nf__ * {grid})")
                        .cast("bigint")
                        .alias("avg_span_micro"),
                    ),
                )
            ).alias("r")
        ).select("r.*")
        out = per_dim if out is None else out.unionByName(per_dim)
    return out
