"""Prometheus metric processors: exposition-text parsing and
relabeling.

Reference: ``core/plugin/processor/inner/ProcessorPromParseMetricNative
.cpp:27-67`` (TextParser over raw scrape lines -> metric events with a
``__name__`` tag) and ``ProcessorPromRelabelMetricNative.cpp`` /
``core/prometheus/labels/Relabel.cpp:147-230`` (the standard
Prometheus relabel_configs actions applied to the label set).

Spark mapping: a metric event is a row ``(name, labels
map<string,string>, value double, ts_ms long)``; parsing is one regex
pass + label-pair extraction, relabeling is a chain of map
transformations — all Column expressions, scan-side, no Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import ClassVar

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.model import CONTENT_KEY, FIELDS_COL
from ilogtail_spark.operators.base import Processor, register

# exposition line: name{labels} value [timestamp-ms]
# \A/\z anchors (the repo convention): Java's $ also matches before a
# trailing newline, which would let stray terminators slip through
_LINE_RE = (
    r"\A([a-zA-Z_:][a-zA-Z0-9_:]*)"  # 1: metric name
    r"(?:\s*\{(.*)\})?"  # 2: label body (greedy — values may hold '}')
    r"[ \t]+(\S+)"  # 3: value
    r"(?:[ \t]+(-?\d+))?"  # 4: optional timestamp (ms)
    r"[ \t]*\z"
)
_LABEL_PAIR = r'([a-zA-Z_][a-zA-Z0-9_]*)\s*=\s*"((?:[^"\\]|\\.)*)"'


def _unescape_label(v: Column) -> Column:
    """Prometheus label-value escapes: \\\\  \\"  \\n — the shared
    one-pass tokenizing scan (functions/strings.py)."""
    from ilogtail_spark.functions.strings import unescape_scan

    return unescape_scan(v, {'\\"': '"', "\\\\": "\\", "\\n": "\n"})


def _parse_value(v: Column) -> Column:
    """Prometheus sample values incl. +Inf/-Inf/NaN spellings."""
    return (
        F.when(v.isin("+Inf", "Inf"), F.lit(float("inf")))
        .when(v == "-Inf", F.lit(float("-inf")))
        .when(v.isin("NaN", "nan"), F.lit(float("nan")))
        .otherwise(v.try_cast("double"))
    )


# the full label body must be EXACTLY a comma-separated pair list
# (optional trailing comma) — a body with an unquoted or malformed
# pair rejects the whole line, as the reference TextParser does
_BODY_RE = rf"\A\s*(?:{_LABEL_PAIR}(?:\s*,\s*{_LABEL_PAIR})*\s*,?)?\s*\z"


def prom_parse(
    df: DataFrame,
    text_col: str = "text",
    default_ts_ms: int | None = None,
    keep_cols: bool = False,
    out_cols: tuple[str, str, str, str] = ("name", "labels", "value", "ts_ms"),
) -> DataFrame:
    """Parse one exposition-format line per row into ``(name, labels,
    value, ts_ms)``. Comment (#) and blank lines, lines whose value
    does not parse, and lines with a malformed label body are dropped
    — the TextParser contract (ParseLine returns false -> no event).
    ``__name__`` joins the label map, mirroring
    ProcessorPromParseMetricNative.cpp:64 SetTag(NAME).
    ``keep_cols=True`` appends the four metric columns instead of
    replacing the frame (the processor surface needs the event's
    other columns to survive); pass ``out_cols`` to rename the four
    outputs when the input frame already has a column named ``name``/
    ``labels``/``value``/``ts_ms`` — appending a duplicate name would
    fail the query at analysis with an ambiguous-reference error.

    Regex cost: the line pattern runs ONCE per row (a single
    regexp_replace rewriting the match into a \\x01-delimited
    canonical form + one validating rlike), not once per capture
    group. A raw \\x01 byte in a scrape line is treated as malformed
    input (control bytes in label values must arrive escaped)."""
    t = F.trim(F.col(text_col))
    sep = "\x01"
    okline = t.rlike(_LINE_RE) & ~t.contains(sep) & ~t.startswith("#")
    canon = F.regexp_replace(t, _LINE_RE, f"$1{sep}$2{sep}$3{sep}$4")
    parts = F.split(canon, sep, 4)
    name = F.element_at(parts, 1)
    body = F.try_element_at(parts, F.lit(2))
    raw_val = F.try_element_at(parts, F.lit(3))
    ts = F.try_element_at(parts, F.lit(4))
    keys = F.regexp_extract_all(body, F.lit(_LABEL_PAIR), 1)
    vals = F.transform(
        F.regexp_extract_all(body, F.lit(_LABEL_PAIR), 2), _unescape_label
    )
    labels = F.map_concat(
        F.map_from_arrays(keys, vals),
        F.create_map(F.lit("__name__"), name),
    )
    value = _parse_value(raw_val)
    ts_ms = F.when(ts != "", ts.cast("long")).otherwise(
        F.lit(default_ts_ms).cast("long")
    )
    ok = okline & value.isNotNull() & body.rlike(_BODY_RE)
    base = df.filter(F.coalesce(ok, F.lit(False)))
    cols = [
        name.alias(out_cols[0]),
        labels.alias(out_cols[1]),
        value.alias(out_cols[2]),
        ts_ms.alias(out_cols[3]),
    ]
    if keep_cols:
        return base.select("*", *cols)
    return base.select(*cols)


def _src_value(labels: Column, source_labels: list[str], sep: str) -> Column:
    """concat of the source label values joined by ``sep`` — a missing
    label contributes the empty string (Prometheus semantics)."""
    parts = [
        F.coalesce(labels.getItem(sl), F.lit("")) for sl in source_labels
    ]
    return F.concat_ws(sep, *parts) if parts else F.lit("")


def _full(regex: str) -> str:
    # \A/\z, not ^/$: Java's $ also matches before a final newline, so
    # ^/$ would spuriously full-match values ending in \n (verified)
    return "(?s)\\A(?:" + regex + ")\\z"


def relabel(
    df: DataFrame,
    configs: list[dict],
    labels_col: str = "labels",
) -> DataFrame:
    """Apply a Prometheus relabel_configs chain to the label map.
    Supported actions (Relabel.cpp:147-230): replace (with $1..$n
    group substitution; an EMPTY expansion deletes the target label),
    keep, drop, keepequal, dropequal, lowercase, uppercase, labelmap,
    labeldrop, labelkeep. Config keys use the Prometheus spelling:
    source_labels, separator (default ';'), regex (default '(.*)'),
    target_label, replacement (default '$1'), action (default
    'replace'). hashmod is not implemented (aggregator_shardhash is
    the engine's sharding primitive) and raises."""
    labels = F.col(labels_col)
    for cfg in configs:
        action = cfg.get("action", "replace").lower()
        sep = cfg.get("separator", ";")
        regex = cfg.get("regex", "(.*)")
        replacement = cfg.get("replacement", "$1")
        src = _src_value(labels, cfg.get("source_labels", []), sep)
        matches = src.rlike(_full(regex))
        if action == "replace":
            target = cfg["target_label"]
            new_val = F.regexp_replace(src, _full(regex), replacement)
            with_target = F.map_concat(
                F.map_filter(labels, lambda k, _: k != F.lit(target)),
                F.create_map(F.lit(target), new_val),
            )
            without_target = F.map_filter(
                labels, lambda k, _: k != F.lit(target)
            )
            new_labels = F.when(
                matches & (new_val != ""), with_target
            ).when(matches, without_target).otherwise(labels)
            df = df.withColumn(labels_col, new_labels)
        elif action in ("keep", "drop"):
            df = df.filter(matches if action == "keep" else ~matches)
        elif action in ("keepequal", "dropequal"):
            target_val = F.coalesce(
                labels.getItem(cfg["target_label"]), F.lit("")
            )
            eq = src == target_val
            df = df.filter(eq if action == "keepequal" else ~eq)
        elif action in ("lowercase", "uppercase"):
            target = cfg["target_label"]
            val = F.lower(src) if action == "lowercase" else F.upper(src)
            without_target = F.map_filter(
                labels, lambda k, _: k != F.lit(target)
            )
            # empty value deletes the target — Builder.Set("") deletes
            # in Prometheus; same contract the replace action honors
            df = df.withColumn(
                labels_col,
                F.when(
                    val != "",
                    F.map_concat(
                        without_target, F.create_map(F.lit(target), val)
                    ),
                ).otherwise(without_target),
            )
        elif action == "labelmap":
            # every label whose NAME matches contributes a renamed
            # copy; map_concat under LAST_WIN (session default) lets
            # a renamed key overwrite an existing one — Prometheus
            # labelmap semantics
            mapped = F.map_filter(labels, lambda k, _: k.rlike(_full(regex)))
            renamed = F.transform_keys(
                mapped,
                lambda k, _: F.regexp_replace(k, _full(regex), replacement),
            )
            df = df.withColumn(labels_col, F.map_concat(labels, renamed))
        elif action in ("labeldrop", "labelkeep"):
            if action == "labeldrop":
                pred = lambda k, _: ~k.rlike(_full(regex))  # noqa: E731
            else:
                pred = lambda k, _: k.rlike(_full(regex))  # noqa: E731
            df = df.withColumn(labels_col, F.map_filter(labels, pred))
        else:
            raise ValueError(f"unsupported relabel action {action!r}")
    return df


@register
@dataclass
class ProcessorPromParseMetric(Processor):
    """processor_prom_parse_metric_native: parse the event's SourceKey
    exposition line into metric fields (__name__, label set flattened
    with a ``label_`` prefix into the fields map, value, optional
    timestamp); unparseable lines are dropped."""

    TYPE: ClassVar[str] = "processor_prom_parse_metric"
    CHANGES_CARDINALITY: ClassVar[bool] = True

    SourceKey: str = CONTENT_KEY

    def apply(self, df: DataFrame) -> DataFrame:
        fields = F.col(FIELDS_COL)
        v = fields.getItem(self.SourceKey)
        # reserved __-prefixed output names: the event frame's fields
        # map can legitimately carry columns named name/labels/value/
        # ts_ms (e.g. a prior extract stage) — colliding appended
        # columns would make every later reference ambiguous
        out = ("__pp_name__", "__pp_labels__", "__pp_value__", "__pp_ts_ms__")
        parsed = prom_parse(
            df.withColumn("__line__", v), "__line__", keep_cols=True,
            out_cols=out,
        )
        # metric-event fields: labels FIRST, reserved keys LAST — under
        # the session's LAST_WIN map dedup a label literally named
        # 'value' or '__time_ms__' must not clobber the sample. Every
        # other column (tags, id/mirror cols) survives untouched.
        new_fields = F.map_concat(
            F.map_filter(
                F.col(out[1]), lambda k, _: k != F.lit("__name__")
            ),
            F.create_map(
                F.lit("__name__"), F.col(out[0]),
                F.lit("value"), F.col(out[2]).cast("string"),
            ),
            F.when(
                F.col(out[3]).isNotNull(),
                F.create_map(
                    F.lit("__time_ms__"), F.col(out[3]).cast("string")
                ),
            ).otherwise(F.create_map().cast("map<string,string>")),
        )
        return parsed.withColumn(FIELDS_COL, new_fields).drop("__line__", *out)
