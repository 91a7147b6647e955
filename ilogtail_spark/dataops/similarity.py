"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — the exact baseline: broadcast the query
  set, one pass over the corpus, per-partition top-k via window.
* LSH-bucketed ANN — the scale path: deterministic random-hyperplane
  buckets (hyperplane components derived from md5, so any engine
  reproduces them); search only the query's bucket.

Scale story: brute force is O(corpus x queries) but shuffle-free
until the final top-k (window over query_id — partition count =
|queries|); LSH prunes the corpus side to one bucket per probe, and
bucket assignment is scan-side expression work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def with_double_vec(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """float -> double once up front: all arithmetic in float64 so the
    result is bit-identical to any IEEE engine evaluating in the same
    (sequential) order."""
    return df.withColumn(
        "__vec__", F.transform(F.col(vec_col), lambda x: x.cast("double"))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self
    excluded). ``queries`` is broadcast — the corpus never shuffles;
    the only exchange is the final per-query window."""
    c = with_double_vec(corpus, vec_col).select(
        F.col(id_col).alias("nbr_id"), F.col("__vec__").alias("cv")
    )
    q = with_double_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("__vec__").alias("qv")
    )
    joined = c.join(F.broadcast(q), F.col("nbr_id") != F.col("query_id"))
    cos = _dot(F.col("cv"), F.col("qv")) / (
        _norm(F.col("cv")) * _norm(F.col("qv"))
    )
    scored = joined.withColumn("cos", cos)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("nbr_id").asc()
    )
    out = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "nbr_id", F.col("rk").alias("rk"), "cos")
    )
    if round_to is not None:
        out = out.withColumn("cos", F.round(F.col("cos"), round_to))
    return out


def hyperplane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in
    [-1000, 1000]: derived from md5(f'{plane},{dim}') — computed on
    the driver and embedded as a literal, so any engine (and the
    DuckDB oracle) reproduces the identical planes."""
    import hashlib

    h = int(hashlib.md5(f"{plane},{dim}".encode()).hexdigest()[:8], 16)
    return float(h % 2001 - 1000)


def lsh_bucket(
    df: DataFrame,
    dim: int,
    num_planes: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append ``bucket``: the sign-bit string of ``num_planes``
    hyperplane projections. Scan-side expression, no shuffle; the
    planes are literal constants (no per-row hashing)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    df = df.withColumn("__vec__", v)
    bits = []
    for p in range(num_planes):
        proj = F.lit(0.0)
        for d in range(dim):
            proj = proj + F.try_element_at(F.col("__vec__"), F.lit(d + 1)) * F.lit(
                hyperplane_component(p, d)
            )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.withColumn("bucket", F.concat(*bits)).drop("__vec__")


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the
    query's LSH bucket. Recall improves with multi-probe (not needed
    for the correctness surface); cost drops ~2^num_planes-fold."""
    cb = lsh_bucket(corpus, dim, num_planes, vec_col)
    qb = lsh_bucket(queries, dim, num_planes, vec_col)
    c = with_double_vec(cb, vec_col).select(
        F.col(id_col).alias("nbr_id"), F.col("bucket"), F.col("__vec__").alias("cv")
    )
    q = with_double_vec(qb, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("bucket").alias("qbucket"),
        F.col("__vec__").alias("qv"),
    )
    joined = c.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("nbr_id") != F.col("query_id")),
    )
    cos = _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv")))
    # rank on the UNROUNDED score (round only for presentation) so tie
    # ordering matches any engine computing the same doubles
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos_raw__").desc(), F.col("nbr_id").asc()
    )
    return (
        joined.withColumn("__cos_raw__", cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id", "nbr_id", "rk", F.round(F.col("__cos_raw__"), 6).alias("cos")
        )
    )
