"""Partitioning / skew handling.

Reference analogs:
  * aggregator_shardhash — shard = xxhash64(concat(key values,
    connector)) % ShardCount (power of two <= 512)
    (plugins/aggregator/shardhash/aggregator_shardhash.go:67-85,
    157-161). Spark's built-in ``F.xxhash64`` is the same xxhash64
    function but its seed is FIXED at 42 (the reference uses seed 0),
    so shard MEMBERSHIP can never match aggregator_shardhash's; the
    distribution contract — uniform spread over a power-of-two shard
    count — is what the operator is for and is identical. The
    ``seed`` parameter below only perturbs the hash INPUT (an extra
    hashed column), it does not re-seed xxhash64.
  * aggregator_context — per-source ordering
    (plugins/aggregator/context/aggregator_context.go:44-62) ->
    repartition(conv_id) + sortWithinPartitions.

Skew: conversation traffic is Zipf-distributed (BASELINE.json: hot
conversations at 10^12-turn scale). A plain ``repartition(conv_id)``
sends a hot conversation to ONE task. ``salted_repartition`` splits
each conversation across ``salt_buckets`` sub-partitions; operations
that don't need conversation co-location (parse, filter, route,
sink write) use it freely, and per-conversation aggregates do a
two-phase aggregate (partial per salt, final merge) — the classic
salting pattern AQE's skew-join handling complements.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shardhash(
    df: DataFrame,
    keys: list[str],
    shard_count: int = 32,
    connector: str = "_",
    seed: int = 42,
    shard_col: str = "__shard__",
) -> DataFrame:
    """Append the shard id column and repartition by it: the
    aggregator_shardhash analog. shard_count must be a power of two
    <= 512 (reference constraint, kept). ``seed`` is hashed as an
    extra input column (Spark's xxhash64 seed itself is fixed at 42
    and cannot be changed), so it varies the shard assignment but
    cannot reproduce the reference's seed-0 membership — see module
    docstring."""
    if shard_count <= 0 or shard_count > 512 or shard_count & (shard_count - 1):
        raise ValueError("ShardCount must be a power of two in (0, 512]")
    concat = F.concat_ws(connector, *[F.col(k).cast("string") for k in keys])
    shard = F.pmod(F.xxhash64(F.lit(seed), concat), F.lit(shard_count))
    return df.withColumn(shard_col, shard).repartition(shard_count, F.col(shard_col))


def salt_col(key: Column, salt_buckets: int) -> Column:
    """Deterministic per-row salt derived from row identity would
    defeat dedup of a key; instead spread by a hash of secondary
    identity (turn_idx) so the same (conv, turn) always lands in the
    same bucket — idempotent across retries."""
    return F.pmod(F.xxhash64(key, F.col("turn_idx")), F.lit(salt_buckets))


def salted_repartition(
    df: DataFrame,
    key: str = "conv_id",
    salt_buckets: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Repartition on (key, salt) so a hot key spreads over
    ``salt_buckets`` tasks instead of one."""
    salted = df.withColumn("__salt__", salt_col(F.col(key), salt_buckets))
    if partitions:
        out = salted.repartition(partitions, F.col(key), F.col("__salt__"))
    else:
        out = salted.repartition(F.col(key), F.col("__salt__"))
    return out.drop("__salt__")


def salted_count(
    df: DataFrame,
    key: str = "conv_id",
    salt_buckets: int = 8,
    count_alias: str = "n",
) -> DataFrame:
    """Two-phase skew-safe per-key count: partial count per
    (key, salt) — map-side combine keeps hot-key partials small —
    then final merge per key. Identical result to groupBy(key).count()
    with the hot key's work spread over salt_buckets reducers."""
    salted = df.withColumn("__salt__", salt_col(F.col(key), salt_buckets))
    partial = salted.groupBy(key, "__salt__").agg(
        F.count(F.lit(1)).alias("__partial__")
    )
    return partial.groupBy(key).agg(F.sum("__partial__").alias(count_alias))


def stable_turn_order(df: DataFrame, conv_col: str = "conv_id", idx_col: str = "turn_idx") -> DataFrame:
    """aggregator_context analog: co-locate a conversation and order
    its turns — repartition + sortWithinPartitions, NO global sort
    (a total order across 10^12 turns is never needed; per-sink files
    are conversation-contiguous which is the observable contract)."""
    return df.repartition(F.col(conv_col)).sortWithinPartitions(conv_col, idx_col)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
    salt_src: list[str] | None = None,
) -> DataFrame:
    """Skew-safe equi join for the regime AQE's skew split does not
    cover: salt the big/skewed LEFT side per row and replicate the
    RIGHT side across every salt value, joining on (key, salt) — one
    hot key's rows spread over ``salt_buckets`` tasks instead of
    serializing into one.

    When to use which join strategy at 100 TB:
    * tiny dim -> broadcast (plans/pipeline, dict_map);
    * skewed SMJ -> AQE skew-join split (on by default in session.py)
      handles it at runtime for sort-merge plans;
    * mid-size right side + pathologically hot left keys (the
      power-law user/conversation) -> THIS: replication costs
      |right| x salt_buckets rows, bounded and chosen by the caller,
      and the left side still shuffles exactly once.

    ``salt_src``: columns giving per-ROW identity for the left salt
    (default: all left columns). Must not be only the key itself — a
    key-derived salt sends the hot key to one bucket again. Results
    are identical to ``left.join(right, on, how)`` for 'inner' and
    'left' (each left row sees exactly the one replicated copy of
    each matching right row that carries its salt).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' only")
    src = [F.col(c) for c in (salt_src or left.columns)]
    l_salted = left.withColumn(
        "__salt__", F.pmod(F.xxhash64(*src), F.lit(salt_buckets))
    )
    r_salted = right.withColumn(
        "__salt__",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return l_salted.join(r_salted, [on, "__salt__"], how).drop("__salt__")


def hotkey_stats(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
    hot_share_micro: int = 100_000,
) -> DataFrame:
    """Heavy-hitter report for a key column — the measurement step
    that decides WHETHER the skew machinery above is needed: the
    top-``top_k`` keys by row count, each with its share of the total
    in integer micro units and an ``is_hot`` flag at
    ``hot_share_micro`` (default 10%). Run it on conv_id/user_id
    before choosing between plain repartition, salted_join, and
    AQE — a key whose share exceeds ~1/num_partitions is the one that
    serializes a task.

    Scale shape: ONE partial-aggregated groupBy on the key (the same
    shuffle any per-key count pays); the grand total re-aggregates
    the per-key counts (digest-sized input, no second scan) and
    broadcast-joins back as a single row; top-k is sort+limit —
    Catalyst plans TakeOrderedAndProject, so only k rows per
    partition ever move. Ties break by key ascending so the report is
    deterministic across partitionings.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").alias("__total__"))
    return (
        counts.join(F.broadcast(total))
        .select(
            "key",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            # exact integer `div` over a DECIMAL(38,0) product, not
            # floor(float /): no last-ulp rounding hazard, and the
            # widened product cannot wrap BIGINT even when one key
            # holds > 9.2e12 rows (n * 1e6 passes 2^63 right in the
            # ultra-hot regime this report exists to flag). DuckDB's
            # HUGEINT computes the identical 128-bit value.
            F.expr("CAST(n_rows AS DECIMAL(38,0)) * 1000000 div __total__")
            .cast("bigint")
            .alias("share_micro"),
        )
        .withColumn(
            "is_hot",
            (F.col("share_micro") >= hot_share_micro).cast("int"),
        )
        .orderBy(F.col("n_rows").desc(), F.col("key").asc())
        .limit(top_k)
    )
