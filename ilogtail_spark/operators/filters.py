"""Filter processors (predicates) — SURVEY.md §2.4.

All compile to boolean Column expressions (never UDFs): Catalyst can
push them toward the scan, and at 100 TB a filter that prunes before
the expensive parse stages is the single biggest lever — the analog
of the reference's early-drop when a processor empties the batch
(pluginmanager/plugin_runner_v1.go:260-263).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import ClassVar

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.model import FIELDS_COL
from ilogtail_spark.operators.base import (
    FieldsProcessor,
    FilterProcessor,
    Processor,
    build,
    register,
)


def _contains_match(fields: Column, key: str, pattern: str) -> Column:
    """Go regexp.MatchString == find-anywhere; null-safe (missing key
    never matches)."""
    v = fields.getItem(key)
    return v.isNotNull() & v.rlike(pattern)


@register
@dataclass
class ProcessorFilterRegex(FilterProcessor):
    """processor_filter_regex
    (plugins/processor/filter/regex/processor_filter_regex.go:78-110):
    keep a row iff every Include[key] regex matches fields[key]
    (missing key => drop) and no Exclude[key] regex matches
    (missing key => no effect).
    """

    TYPE: ClassVar[str] = "processor_filter_regex"

    Include: dict = dc_field(default_factory=dict)
    Exclude: dict = dc_field(default_factory=dict)

    def predicate(self, fields: Column) -> Column:
        pred = F.lit(True)
        for k, pat in self.Include.items():
            pred = pred & _contains_match(fields, k, pat)
        for k, pat in self.Exclude.items():
            pred = pred & ~_contains_match(fields, k, pat)
        return pred


@register
@dataclass
class ProcessorFilterKeyRegex(FilterProcessor):
    """processor_filter_key_regex
    (plugins/processor/filter/keyregex/processor_filter_key_regex.go:73-96):
    keep iff every Include regex matches at least one KEY NAME and no
    Exclude regex matches any key name.
    """

    TYPE: ClassVar[str] = "processor_filter_key_regex"

    Include: list = dc_field(default_factory=list)
    Exclude: list = dc_field(default_factory=list)

    def predicate(self, fields: Column) -> Column:
        keys = F.map_keys(fields)
        pred = F.lit(True)
        for pat in self.Include:
            pred = pred & F.exists(keys, lambda k: k.rlike(pat))
        for pat in self.Exclude:
            pred = pred & ~F.exists(keys, lambda k: k.rlike(pat))
        return pred


def compile_condition_tree(node: dict, fields: Column) -> Column:
    """Boolean expression tree of the native filter
    (core/plugin/processor/ProcessorFilterNative.h:27-98):
    leaves are {"key": k, "exp": regex}; inner nodes
    {"operator": and|or|not, "operands": [...]}. Compiles 1:1 to
    Column & | ~ rlike — the case where Spark's expression algebra IS
    the reference's execution model.
    """
    if "key" in node:
        return _contains_match(fields, node["key"], node["exp"])
    op = node["operator"].lower()
    operands = [compile_condition_tree(c, fields) for c in node["operands"]]
    if op == "and":
        out = operands[0]
        for o in operands[1:]:
            out = out & o
        return out
    if op == "or":
        out = operands[0]
        for o in operands[1:]:
            out = out | o
        return out
    if op == "not":
        if len(operands) != 1:
            raise ValueError("not takes exactly one operand")
        return ~operands[0]
    raise ValueError(f"unknown operator {op!r}")


@register
@dataclass
class ProcessorFilterNative(FilterProcessor):
    """processor_filter_regex_native: either a flat Include map (like
    the Go filter) or a ConditionExp boolean tree
    (core/plugin/processor/ProcessorFilterNative.cpp,
    ParseExpressionFromJSON)."""

    TYPE: ClassVar[str] = "processor_filter_native"

    Include: dict = dc_field(default_factory=dict)
    ConditionExp: dict | None = None
    DiscardingNonUTF8: bool = False  # accepted, no-op (Spark strings are UTF-8)

    def predicate(self, fields: Column) -> Column:
        if self.ConditionExp is not None:
            return compile_condition_tree(self.ConditionExp, fields)
        pred = F.lit(True)
        for k, pat in self.Include.items():
            pred = pred & _contains_match(fields, k, pat)
        return pred


def _case_predicate(case: dict, fields: Column) -> Column:
    rel = (case.get("RelationOperator") or "equals").lower()
    logical = (case.get("LogicalOperator") or "and").lower()
    conds: list[Column] = []
    for k, val in (case.get("FieldConditions") or {}).items():
        v = fields.getItem(k)
        if rel == "regexp":
            c = v.rlike(val)
        elif rel == "contains":
            c = v.contains(val)
        elif rel == "startwith":
            c = v.startswith(val)
        else:  # equals (also the fallback for unknown operators)
            c = v == F.lit(val)
        conds.append(v.isNotNull() & c)
    if not conds:
        return F.lit(True)
    out = conds[0]
    for c in conds[1:]:
        out = (out | c) if logical == "or" else (out & c)
    return out


@register
@dataclass
class ProcessorFieldsWithCondition(Processor):
    """processor_fields_with_condition
    (plugins/processor/fieldswithcondition/processor_fields_with_condition.go:43-130):
    switch/case — the FIRST matching Case triggers its Actions
    (processor_add_fields / processor_drop); rows matching no case are
    dropped iff DropIfNotMatchCondition.

    Spark mapping: one chained ``when`` expression per action slot —
    first-match == ordered when evaluation.
    """

    TYPE: ClassVar[str] = "processor_fields_with_condition"
    CHANGES_CARDINALITY: ClassVar[bool] = True

    DropIfNotMatchCondition: bool = False
    Switch: list = dc_field(default_factory=list)

    def apply(self, df: DataFrame) -> DataFrame:
        fields = F.col(FIELDS_COL)
        preds = [_case_predicate(c.get("Case", {}), fields) for c in self.Switch]

        # fields after each branch's actions
        branch_fields: list[Column] = []
        for cond in self.Switch:
            cur = fields
            for action in cond.get("Actions", []):
                a = dict(action)
                a_type = a.pop("Type")
                if a_type == "processor_add_fields":
                    proc = build({"Type": "processor_add_fields", **a})
                elif a_type == "processor_drop":
                    proc = build({"Type": "processor_drop", **a})
                else:
                    raise ValueError(f"unsupported action {a_type!r}")
                cur = proc.fields_expr(cur)
            branch_fields.append(cur)

        expr = None
        for p, bf in zip(preds, branch_fields):
            expr = F.when(p, bf) if expr is None else expr.when(p, bf)
        if expr is None:
            expr = fields
        else:
            expr = expr.otherwise(fields)
        df = df.withColumn(FIELDS_COL, expr)

        if self.DropIfNotMatchCondition and preds:
            keep = preds[0]
            for p in preds[1:]:
                keep = keep | p
            df = df.filter(keep)
        return df


@register
@dataclass
class ProcessorTimestampFilterNative(FilterProcessor):
    """processor_timestamp_filter_native
    (core/plugin/processor/ProcessorTimestampFilterNative.cpp): drop
    events outside [StartTime, ExpireTime]. Operates on the top-level
    ``ts`` column so it pushes down to the parquet/Iceberg scan
    (partition pruning on ts at cluster scale).
    """

    TYPE: ClassVar[str] = "processor_timestamp_filter_native"

    StartTime: str | None = None
    ExpireTime: str | None = None
    TimeColumn: str = "ts"

    def predicate(self, fields: Column) -> Column:  # unused
        raise NotImplementedError

    def apply(self, df: DataFrame) -> DataFrame:
        c = F.col(self.TimeColumn)
        pred = F.lit(True)
        if self.StartTime is not None:
            pred = pred & (c >= F.to_timestamp(F.lit(self.StartTime)))
        if self.ExpireTime is not None:
            pred = pred & (c <= F.to_timestamp(F.lit(self.ExpireTime)))
        return df.filter(pred)


@register
@dataclass
class ProcessorRateLimit(Processor):
    """processor_rate_limit (plugins/processor/ratelimit/...go:26-33):
    token-bucket "N/s|m|h" per distinct combination of Fields values.

    Batch analog (DOCUMENTED DIVERGENCE, SURVEY §7.2e): wall-clock
    token refill has no order-free batch meaning, so we cap to N rows
    per (field-combo, time bucket) using row_number over
    (fields..., time_bucket) ordered by (ts, conv_id, turn_idx) —
    deterministic, and equals the token bucket when arrivals are
    uniform within the bucket.
    """

    TYPE: ClassVar[str] = "processor_rate_limit"
    CHANGES_CARDINALITY: ClassVar[bool] = True

    Fields: list = dc_field(default_factory=list)
    Limit: str = "100/s"
    TimeColumn: str = "ts"
    OrderColumns: tuple = ("ts", "conv_id", "turn_idx")

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import Window as W

        n_str, _, unit = self.Limit.partition("/")
        n = int(n_str)
        unit_secs = {"s": 1, "m": 60, "h": 3600}[unit or "s"]
        bucket = (F.unix_timestamp(F.col(self.TimeColumn)) / unit_secs).cast("long")
        fields = F.col(FIELDS_COL)
        keys = [fields.getItem(k) for k in self.Fields]
        order = [F.col(c) for c in self.OrderColumns if c in df.columns]
        w = W.partitionBy(bucket, *keys).orderBy(*order)
        return (
            df.withColumn("__rl_rn__", F.row_number().over(w))
            .filter(F.col("__rl_rn__") <= n)
            .drop("__rl_rn__")
        )


@register
@dataclass
class ProcessorDefault(Processor):
    """processor_default — identity passthrough
    (plugins/processor/defaultone/processor_default.go)."""

    TYPE: ClassVar[str] = "processor_default"

    def apply(self, df: DataFrame) -> DataFrame:
        return df
