"""Content routing to sinks.

Two reference semantics, both supported (SURVEY.md §2.7):

* ``first_match`` — Go aggregator_logstore_router
  (plugins/aggregator/logstorerouter/aggregator_router.go:97-136):
  ``RouterRegex[i]`` must FULL-match (anchored both ends) the value of
  ``SourceKey``; first match wins -> ``RouterLogstore[i]``; miss ->
  default logstore unless ``DropDisMatch``; missing key -> default/
  drop. Spark: one ordered ``when`` chain producing a ``__sink__``
  column — ordered evaluation == first-match, single pass, no UDF.

* ``multicast`` — C++ Router (core/collection_pipeline/route/
  Router.cpp:50-82, Condition.cpp:62-107): each flusher carries an
  optional Match condition; a row is COPIED to every matching sink.
  Spark: build an array of matching sink names and ``explode`` it —
  still a single pass; the copy the C++ core performs per extra sink
  becomes the explode fan-out.

The routed frame carries ``__sink__`` (and optional ``__topic__``)
as REAL COLUMNS so the sink write can ``partitionBy`` them: routing
1000 sinks costs one shuffle-free pass, not 1000 scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.model import FIELDS_COL, TAGS_COL
from ilogtail_spark.functions.fmtstr import compile_fmtstr

SINK_COL = "__sink__"
TOPIC_COL = "__topic__"


def _full_match(v: Column, pattern: str) -> Column:
    return v.isNotNull() & v.rlike("(?s)\\A(?:" + pattern + ")\\z")


def match_condition(cond: dict | None) -> Column:
    """Per-flusher Match (core/collection_pipeline/route/Condition.cpp):
    Type=tag  -> tags[Key] == Value
    Type=field-> full-regex on fields[Key] (our extension: the Go
                 router's per-field predicate as a flusher condition)
    Type=expr -> boolean tree (shared with processor_filter_native)
    None      -> always matches (Router.cpp: unmatched flushers receive all)
    """
    if not cond:
        return F.lit(True)
    t = cond.get("Type", "tag")
    if t == "tag":
        v = F.col(TAGS_COL).getItem(cond["Key"])
        return v.isNotNull() & (v == F.lit(cond["Value"]))
    if t == "field":
        return _full_match(F.col(FIELDS_COL).getItem(cond["Key"]), cond["Value"])
    if t == "expr":
        from ilogtail_spark.operators.filters import compile_condition_tree

        return compile_condition_tree(cond["Exp"], F.col(FIELDS_COL))
    raise ValueError(f"unknown Match Type {t!r}")


def route(df: DataFrame, router: dict, flushers: list[dict]) -> DataFrame:
    """Attach __sink__ (one row per (event, receiving sink))."""
    mode = (router or {}).get("Mode", "first_match")
    if mode == "first_match":
        routed = _route_first_match(df, router)
    elif mode == "multicast":
        routed = _route_multicast(df, flushers)
    else:
        raise ValueError(f"unknown router mode {mode!r}")

    # dynamic per-sink topic columns (pkg/fmtstr)
    topic_cases = None
    for fl in flushers:
        if fl.get("Topic"):
            cond = F.col(SINK_COL) == F.lit(fl["Name"])
            expr = compile_fmtstr(fl["Topic"])
            topic_cases = (
                F.when(cond, expr)
                if topic_cases is None
                else topic_cases.when(cond, expr)
            )
    if topic_cases is not None:
        routed = routed.withColumn(TOPIC_COL, topic_cases.otherwise(F.lit("")))
    return routed


def _route_first_match(df: DataFrame, router: dict) -> DataFrame:
    src = router.get("SourceKey", "role")
    regexes = router.get("RouterRegex", [])
    stores = router.get("RouterLogstore", [])
    if len(regexes) != len(stores):
        raise ValueError("RouterRegex and RouterLogstore must align")
    default = router.get("DefaultLogstore", "sink_default")
    drop_dismatch = router.get("DropDisMatch", False)

    from ilogtail_spark.model import event_field

    v = event_field(df, src)
    expr = None
    for pat, store in zip(regexes, stores):
        c = _full_match(v, pat)
        expr = F.when(c, F.lit(store)) if expr is None else expr.when(c, F.lit(store))
    if expr is None:
        sink = F.lit(default)
    else:
        sink = expr.otherwise(F.lit(None) if drop_dismatch else F.lit(default))
    routed = df.withColumn(SINK_COL, sink)
    if drop_dismatch:
        routed = routed.filter(F.col(SINK_COL).isNotNull())
    return routed


def _route_multicast(df: DataFrame, flushers: list[dict]) -> DataFrame:
    if not flushers:
        raise ValueError("multicast routing needs flusher configs")
    arr = F.array(
        *[
            F.when(match_condition(fl.get("Match")), F.lit(fl["Name"]))
            for fl in flushers
        ]
    )
    matched = F.filter(arr, lambda x: x.isNotNull())
    # rows matching no sink are discarded (Router.cpp routes to none)
    out = df.withColumn(SINK_COL, F.explode(matched))

    # Match.DiscardingTag (Condition.cpp:109-111, :184-188): the COPY
    # delivered to a tag-matched flusher drops the matched tag —
    # post-explode each copy knows its sink, so the drop is a
    # conditional map_filter on that copy only
    def drop_key(key: str):
        # factory: Spark counts lambda params, so a default-arg capture
        # would be treated as a 3-arg lambda
        return lambda k, _v: k != F.lit(key)

    discard_expr = None
    for fl in flushers:
        m = fl.get("Match") or {}
        if m.get("Type", "tag") == "tag" and m.get("DiscardingTag"):
            cond = F.col(SINK_COL) == F.lit(fl["Name"])
            stripped = F.map_filter(F.col(TAGS_COL), drop_key(m["Key"]))
            discard_expr = (
                F.when(cond, stripped)
                if discard_expr is None
                else discard_expr.when(cond, stripped)
            )
    if discard_expr is not None:
        out = out.withColumn(
            TAGS_COL, discard_expr.otherwise(F.col(TAGS_COL))
        )
    return out
