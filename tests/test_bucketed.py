"""Bucketed tables: zero-exchange co-located joins and bucket-key
aggregation, plus result parity with the unbucketed plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ilogtail_spark.plans import bucketed as B

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    db = B.create_bucket_db(spark, prefix="ilogtail_buckets_test")
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    B.write_bucketed(orders, f"{db}.orders_b", "o_orderkey", 4)
    B.write_bucketed(li, f"{db}.lineitem_b", "l_orderkey", 4)
    return db, orders, li


class TestColocatedJoin:
    def test_join_has_zero_exchanges(self, spark, tables):
        db, _, _ = tables
        j = B.colocated_join(
            spark, f"{db}.orders_b", f"{db}.lineitem_b",
            "o_orderkey", "l_orderkey",
        )
        j.count()
        assert B.n_exchanges(j) == 0

    def test_smj_without_shuffle_or_sort(self, spark, tables):
        # pin the sort-merge strategy (at real scale neither side
        # broadcasts): still zero exchanges, and the per-bucket sort
        # order written by sortBy lets SMJ skip its Sort too
        db, _, _ = tables
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = B.colocated_join(
                spark, f"{db}.orders_b", f"{db}.lineitem_b",
                "o_orderkey", "l_orderkey",
            )
            j.count()
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert B.n_exchanges(j) == 0
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_bucket_key_aggregate_has_zero_exchanges(self, spark, tables):
        db, _, _ = tables
        agg = (
            spark.table(f"{db}.lineitem_b")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        agg.count()
        assert B.n_exchanges(agg) == 0

    def test_result_parity_with_unbucketed_join(self, spark, tables):
        db, orders, li = tables
        bucketed = (
            B.colocated_join(
                spark, f"{db}.orders_b", f"{db}.lineitem_b",
                "o_orderkey", "l_orderkey",
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plain = (
            orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, bucketed.collect())) == sorted(
            map(tuple, plain.collect())
        )

    def test_bucket_pruning_on_key_filter(self, spark, tables):
        # a point filter on the bucket key must scan ONE bucket file
        db, _, _ = tables
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        try:
            q = spark.table(f"{db}.orders_b").filter(F.col("o_orderkey") == 7)
            assert B.selected_buckets(q) == (1, 4)
        finally:
            spark.conf.unset(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled"
            )

    def test_one_file_per_bucket(self, spark, tables):
        # align_write repartitions by the bucket expression: each
        # bucket's rows land in ONE task, so one file per bucket
        db, _, _ = tables
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {db}.lineitem_b")
            .filter(F.col("col_name") == "Location")
            .collect()[0]["data_type"]
        )
        import os

        path = loc.removeprefix("file:")
        files = [f for f in os.listdir(path) if f.startswith("part-")]
        assert len(files) == 4


class TestDbLifecycle:
    def test_rmtree_guard_refuses_paths_outside_tempdir(self, spark):
        # the cleanup rmtree is only safe for create_bucket_db's
        # tempdir locations; anything else (a real warehouse dir)
        # must survive untouched
        import os
        import shutil
        import tempfile
        import uuid

        keep = os.path.join(os.getcwd(), f".bucket_guard_{uuid.uuid4().hex[:8]}")
        os.makedirs(keep)
        try:
            B._rmtree_if_tempdir(keep)
            assert os.path.isdir(keep)  # refused — outside tempdir
        finally:
            shutil.rmtree(keep, ignore_errors=True)
        gone = tempfile.mkdtemp(prefix="bucket_guard_")
        B._rmtree_if_tempdir(gone)
        assert not os.path.exists(gone)  # allowed — under tempdir

    def test_drop_removes_tempdir_warehouse(self, spark):
        import os

        db = B.create_bucket_db(spark, prefix="ilogtail_buckets_guard")
        loc = (
            spark.sql(f"DESCRIBE DATABASE {db}")
            .filter(F.col("info_name") == "Location")
            .collect()[0]["info_value"]
            .removeprefix("file:")
        )
        assert os.path.isdir(loc)
        B.drop_bucket_db(spark, db)
        assert not os.path.exists(loc)
