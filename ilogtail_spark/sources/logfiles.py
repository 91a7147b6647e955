"""File log source — the ``input_file`` / ``input_static_file``
analog (core/plugin/input/InputFile.h:47-50,
core/file_server/FileDiscoveryOptions.h:115-166): glob discovery,
line split, optional multiline merge, per-file provenance.

Two read modes:

* ``mode='lines'`` (default; the scale path): ``spark.read.text`` —
  splittable, massively parallel; each row carries
  ``__source_file__`` (input_file_name). Line numbers are assigned
  per file with a window, which shuffles once on the file name —
  acceptable because a single log file is the reference's own unit of
  ordered processing.
* ``mode='wholetext'``: one row per file, then posexplode of the
  line split — exact offsets with no shuffle, for bounded file sizes
  (the InputStaticFile one-shot job shape).

Discovery excludes and depth limits (ExcludeFilePaths,
MaxDirSearchDepth) are glob concerns handled by the caller's path
pattern, as in Spark generally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ilogtail_spark.model import FIELDS_TYPE


def read_log_files(
    spark: SparkSession,
    path: str,
    mode: str = "lines",
    encoding: str = "UTF-8",
) -> DataFrame:
    """Returns events: (``__source_file__``, ``__line__`` long,
    fields{content}, tags{}) — one per physical line."""
    if mode == "wholetext":
        df = spark.read.option("wholetext", True).text(path)
        df = df.select(
            F.input_file_name().alias("__source_file__"),
            F.posexplode(F.split(F.col("value"), "\n")).alias("__line__", "line"),
        )
        # drop a trailing empty line from a final newline
        df = df.filter(~((F.col("line") == "") & (F.col("__line__") > 0)))
    elif mode == "lines":
        df = spark.read.text(path).select(
            F.input_file_name().alias("__source_file__"),
            F.col("value").alias("line"),
            F.monotonically_increasing_id().alias("__mid__"),
        )
        w = Window.partitionBy("__source_file__").orderBy("__mid__")
        df = df.withColumn("__line__", F.row_number().over(w) - 1).drop("__mid__")
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return df.select(
        "__source_file__",
        F.col("__line__").cast("long"),
        F.map_filter(
            F.create_map(F.lit("content"), F.col("line")),
            lambda k, v: v.isNotNull(),
        ).alias("fields"),
        F.create_map().cast(FIELDS_TYPE).alias("tags"),
    )
