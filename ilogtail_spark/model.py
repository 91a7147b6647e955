"""Canonical schemas and event-model helpers.

Reference data model (SURVEY.md §1): a pipeline event is an open
string->string map (``Log.Contents``, pkg/models/logs.go:19-32) with
the raw line under reserved key ``content``
(pkg/models/common.go:40-41); events travel in groups carrying
string->string tags (pkg/models/pipeline.go:37-59).

Spark mapping: one DataFrame row per event.
  * ``fields map<string,string>``  == Log.Contents
  * ``tags   map<string,string>``  == group tags (__topic__ etc.)
  * identity/order columns stay top-level (conv_id, turn_idx, ts) so
    Catalyst prunes/pushes/shuffles on real columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Reserved key for the raw payload (BodyKey/ContentKey,
# pkg/models/common.go:40-41).
CONTENT_KEY = "content"

FIELDS_COL = "fields"
TAGS_COL = "tags"

# BASELINE.json input_hint: the primary input table.
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Columns kept top-level when a transcripts table becomes an event
# stream (identity + ordering + event time).
TRANSCRIPT_ID_COLS = ["conv_id", "turn_idx", "ts"]

FIELDS_TYPE = T.MapType(T.StringType(), T.StringType())


def to_events(
    df: DataFrame,
    content_col: str = "text",
    field_cols: list[str] | None = None,
    id_cols: list[str] | None = None,
    tags: dict[str, str] | None = None,
    keep_field_cols: bool = True,
) -> DataFrame:
    """Wrap a typed table as an event stream.

    ``content_col`` becomes ``fields['content']``; each of
    ``field_cols`` becomes ``fields[name]`` (stringified, null
    entries omitted — the reference's map simply lacks absent keys).
    ``id_cols`` stay top-level.

    ``keep_field_cols`` (default) ALSO keeps the field columns
    top-level: once processors rebuild the ``fields`` map, any
    ``fields[k]`` read downstream (router predicate, aggregate key)
    re-evaluates the entire map-construction expression tree under
    Catalyst's projection collapse — a routed+aggregated plan would
    run the parse regexes several extra times per row. Top-level
    copies cost a few pointer-width columns and keep those reads
    O(1); router and aggregates prefer them automatically.
    """
    if id_cols is None:
        id_cols = [c for c in TRANSCRIPT_ID_COLS if c in df.columns]
    if field_cols is None:
        field_cols = [c for c in df.columns if c not in id_cols and c != content_col]

    entries = [(CONTENT_KEY, F.col(content_col).cast("string"))]
    entries += [(c, F.col(c).cast("string")) for c in field_cols]
    # map_filter drops null values: an absent key, not a null entry.
    kv: list[Column] = []
    for k, v in entries:
        kv += [F.lit(k), v]
    fields = F.map_filter(F.create_map(*kv), lambda k, v: v.isNotNull())

    tag_kv: list[Column] = []
    for k, v in (tags or {}).items():
        tag_kv += [F.lit(k), F.lit(v)]
    tags_col = (
        F.create_map(*tag_kv) if tag_kv else F.create_map().cast(FIELDS_TYPE)
    )

    extra = (
        [F.col(c).cast("string").alias(c) for c in field_cols if c not in id_cols]
        if keep_field_cols
        else []
    )
    return df.select(
        *[F.col(c) for c in id_cols],
        *extra,
        fields.alias(FIELDS_COL),
        tags_col.alias(TAGS_COL),
    )


def event_field(df: DataFrame, key: str) -> Column:
    """Read an event field, preferring a top-level column of the same
    name (cheap) over the ``fields`` map entry (re-evaluates the map
    construction under projection collapse)."""
    return F.col(key) if key in df.columns else F.col(FIELDS_COL).getItem(key)


def field(key: str) -> Column:
    """fields['key'] (null when absent — like map lookup miss)."""
    return F.col(FIELDS_COL).getItem(key)


def tag(key: str) -> Column:
    return F.col(TAGS_COL).getItem(key)


def with_fields(fields_expr: Column) -> Column:
    return fields_expr.alias(FIELDS_COL)


def map_merge(base: Column, extra: Column) -> Column:
    """map_concat with LAST_WIN dedup (session conf) — later keys
    overwrite, matching processor insert-or-overwrite semantics."""
    return F.map_concat(base, extra)


def map_drop_keys(m: Column, keys: list[str]) -> Column:
    arr = F.array(*[F.lit(k) for k in keys])
    return F.map_filter(m, lambda k, v: ~F.array_contains(arr, k))


def map_pick_keys(m: Column, keys: list[str]) -> Column:
    arr = F.array(*[F.lit(k) for k in keys])
    return F.map_filter(m, lambda k, v: F.array_contains(arr, k))


def stable_order(df: DataFrame) -> DataFrame:
    """Stable turn ordering within a conversation: the analog of
    aggregator_context's per-source arrival order
    (plugins/aggregator/context/aggregator_context.go:44-62).

    At cluster scale this is a repartition on conv_id (co-locate a
    conversation) + an intra-partition sort — no global sort.
    """
    return df.repartition("conv_id").sortWithinPartitions("conv_id", "turn_idx")
