"""SparkSession factory with pipeline-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ilogtail_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the log pipeline.

    Local mode is a stand-in for a multi-executor cluster: we still
    size shuffle partitions to cores and enable AQE so the same plan
    holds at 1000-executor scale (where ``shuffle_partitions`` would
    be set to 2-3x total cores and AQE coalesces the rest).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    cores = _master_cores(master)
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # map_concat(old, parsed) must let later parses win, matching the
        # reference's "insert or overwrite content" semantics
        # (plugins/processor/regex/regex.go:105-129 appends; reads use
        # the last value for a repeated key).
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _master_cores(master: str) -> int:
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 8
        try:
            return int(inner)
        except ValueError:
            return 8
    if master.startswith("local-cluster["):
        # local-cluster[numWorkers,coresPerWorker,memPerWorkerMB]
        try:
            workers, cores, _mem = master[len("local-cluster[") : -1].split(",")
            return int(workers) * int(cores)
        except ValueError:
            return 8
    return 32
