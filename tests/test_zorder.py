"""Z-order layout audit unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ilogtail_spark.plans.zorder import (
    grid_bucket,
    morton_interleave,
    zorder_audit,
)


class TestMorton:
    def test_interleave_known_values(self, spark):
        df = spark.createDataFrame([(3, 1), (0, 0), (2, 2)], "x long, y long")
        out = [
            r["z"]
            for r in df.select(
                morton_interleave(F.col("x"), F.col("y"), 2).alias("z")
            ).collect()
        ]
        # x=0b11,y=0b01 -> bits x0@1, y0@0, x1@3, y1@2 -> 0b1011 = 11
        assert out == [11, 0, 12]  # x=2,y=2 -> 0b1100

    def test_validates_bits(self):
        with pytest.raises(ValueError, match="bits"):
            morton_interleave(F.lit(1), F.lit(1), 0)


class TestGridBucket:
    def test_edges_and_degenerate(self, spark):
        df = spark.createDataFrame([(0,), (50,), (100,)], "v long")
        out = [
            r["b"]
            for r in df.select(
                grid_bucket("v", 0, 100, 8).alias("b")
            ).collect()
        ]
        assert out[0] == 0 and out[2] == 255 and 0 < out[1] < 255
        deg = df.select(grid_bucket("v", 7, 7, 8).alias("b")).collect()
        assert all(r["b"] == 0 for r in deg)


class TestZorderAudit:
    def test_zorder_beats_single_sort_on_second_dim(self, spark):
        # a full 32x32 grid of (x, y) points: natural x-sort leaves
        # every file full-width in y; z-order keeps both dims narrow
        rows = [(x, y) for x in range(32) for y in range(32)]
        df = spark.createDataFrame(rows, "a long, b long")
        out = {(r["layout"], r["dim"]): r["avg_span_micro"]
               for r in zorder_audit(df, "a", "b", n_files=16, bits=5).collect()}
        assert out[("natural", "b")] == 1_000_000       # no pruning
        assert out[("zorder", "b")] < 500_000           # real pruning
        assert out[("zorder", "a")] < 500_000
        # and the single-sort dim is near its optimum under natural
        assert out[("natural", "a")] <= 125_000

    def test_null_rows_dropped_and_validates(self, spark):
        df = spark.createDataFrame(
            [(1, None), (None, 1)], "a long, b long")
        with pytest.raises(ValueError, match="no rows"):
            zorder_audit(df, "a", "b")
        with pytest.raises(ValueError, match="n_files"):
            zorder_audit(df, "a", "b", n_files=1)
        with pytest.raises(ValueError, match="missing columns"):
            zorder_audit(df, "a", "nope")


class TestGridBucketWideDomain:
    def test_no_overflow_on_epoch_micro_spans(self, spark):
        # ~50 years of epoch micros: span * 65535 would overflow
        # BIGINT — the DECIMAL(38,0) product must stay exact
        lo, hi = 1_000_000_000_000_000, 2_600_000_000_000_000
        df = spark.createDataFrame([(lo,), ((lo + hi) // 2,), (hi,)],
                                   "v long")
        out = [r["b"] for r in df.select(
            grid_bucket("v", lo, hi, 16).alias("b")).collect()]
        assert out[0] == 0 and out[2] == 65535
        assert abs(out[1] - 32767) <= 1

    def test_audit_runs_on_timestamp_scale_dims(self, spark):
        rows = [(1_000_000_000_000_000 + i * 10**12, i % 7)
                for i in range(64)]
        df = spark.createDataFrame(rows, "t long, u long")
        out = zorder_audit(df, "t", "u", n_files=4, bits=16).collect()
        assert len(out) == 4
