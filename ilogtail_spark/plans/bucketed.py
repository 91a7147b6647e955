"""Bucketed tables — shuffle elimination persisted at rest.

The reference co-locates related records by hashing a partition key
at WRITE time (kafka flusher `HashKeys` partitioning,
`aggregator_shardhash`'s xxhash-mod shard routing): every consumer
then finds all rows for one key in one shard and never re-partitions.
The Spark-native analog is table bucketing: `bucketBy(n, key)` hashes
each row to one of n bucket files per write task, records the spec in
the catalog, and every later scan exposes `HashPartitioning(key, n)`
to Catalyst — so joins and aggregations ON THE BUCKET KEY plan with
ZERO Exchange on the bucketed side.

Why this is the 100 TB design: a fact table is written once and
joined thousands of times. An unbucketed join shuffles 100 TB per
query; a bucketed join shuffles it once at write (where the write was
shuffling anyway) and never again. Both sides bucketed with the same
key and bucket count co-locate: the join is a zero-exchange
sort-merge over aligned bucket files — at 1000 executors each task
reads bucket i of both tables, no network at all.

Sizing: buckets are the unit of join parallelism — pick
`num_buckets` so one bucket of the BIG table is 100-500 MB
(e.g. 100 TB / 256 MB ≈ 400k buckets). Too few buckets caps
parallelism; too many makes small files. Bucket counts must match
across tables meant to co-join (or differ by a power-of-two factor
with `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def create_bucket_db(spark: SparkSession, prefix: str = "ilogtail_buckets") -> str:
    """Create a uniquely-named database over a fresh temp location —
    concurrent harness processes (driver + mirror) must never write
    the same warehouse path."""
    loc = tempfile.mkdtemp(prefix=prefix + "_")
    db = f"{prefix}_{uuid.uuid4().hex[:12]}"
    spark.sql(f"CREATE DATABASE {db} LOCATION '{loc}'")
    return db


def drop_bucket_db(spark: SparkSession, db: str) -> None:
    """Drop a bucket database AND its temp warehouse directory —
    pair with create_bucket_db so repeated invocations (driver
    scoreboard, mirror, audits) never accumulate table copies.

    The rmtree only fires when the reported location is under the
    system temp dir (where create_bucket_db puts it): calling this on
    a pre-existing database must never delete a real warehouse
    directory — the catalog DROP alone is the safe degraded path."""
    loc = (
        spark.sql(f"DESCRIBE DATABASE {db}")
        .filter(F.col("info_name") == "Location")
        .collect()
    )
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    if loc:
        _rmtree_if_tempdir(loc[0]["info_value"].removeprefix("file:"))


def _rmtree_if_tempdir(path: str) -> None:
    """rmtree ``path`` ONLY when it lives under the system temp dir
    (where create_bucket_db puts warehouses). Leftovers can survive
    the catalog DROP (e.g. a crashed prior run's stale metastore
    entry), but a real warehouse directory must never be deleted by
    this cleanup — outside tempdir the catalog drop alone is the safe
    degraded path."""
    import os
    import shutil

    real = os.path.realpath(path)
    tmp = os.path.realpath(tempfile.gettempdir())
    if real.startswith(tmp + os.sep):
        shutil.rmtree(real, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    sort: bool = True,
    align_write: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and per-bucket sorted) table.

    ``align_write`` repartitions by the bucket expression first so
    each write task holds exactly one bucket's rows — one file per
    bucket, which is what lets a later sort-merge join trust the
    per-bucket sort order and skip its Sort as well. (Without it,
    every task writes a sliver of every bucket: correct, but
    many-files-per-bucket forces a re-sort at read.)
    """
    src = df.repartition(num_buckets, F.col(key)) if align_write else df
    writer = src.write.format("parquet").mode("overwrite").bucketBy(
        num_buckets, key
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket keys — Catalyst
    sees matching HashPartitioning output from both scans and plans
    the join with no Exchange (assert via ``n_exchanges``)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)


def selected_buckets(df: DataFrame) -> tuple[int, int] | None:
    """(selected, total) bucket counts from the executed plan's scan —
    an equality filter on the bucket key prunes the scan to the ONE
    matching bucket file per table (point lookups over 100 TB read
    1/num_buckets of the data with zero index structures). Requires a
    bucketed scan: set
    ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false``
    for filter-only queries, since the planner otherwise falls back
    to a plain file scan when no exchange is saved. Returns None when
    the scan is not bucketed."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    return (int(m.group(1)), int(m.group(2))) if m else None


def n_exchanges(df: DataFrame) -> int:
    """Shuffle Exchange nodes in the executed plan — 0 for a
    genuinely co-located join. Counts EVERY shuffle distribution
    (hash, range, single-partition, …), excluding broadcast
    exchanges and reused references to already-counted ones."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange", plan))
