"""Test helpers: literal event frames (the analog of the reference's
plugins/test helpers, e.g. test.CreateLogs("content", ...))."""

from __future__ import annotations

from pyspark.sql import functions as F

from ilogtail_spark.model import FIELDS_TYPE


def events_df(spark, rows: list[dict], tags: list[dict] | None = None):
    """rows: list of fields dicts -> DataFrame(fields, tags)."""
    tags = tags or [{} for _ in rows]
    data = list(zip(rows, tags))
    return spark.createDataFrame(
        data, "fields map<string,string>, tags map<string,string>"
    )


def fields_of(df) -> list[dict]:
    return [dict(r["fields"]) for r in df.select("fields").collect()]


def one(df) -> dict:
    out = fields_of(df)
    assert len(out) == 1, f"expected 1 row, got {len(out)}"
    return out[0]
