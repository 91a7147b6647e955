"""Cardinality-changing and event-shape operators: line split,
multiline merge, log->metric conversion, encryption, host/cloud tags.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import ClassVar

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ilogtail_spark.model import CONTENT_KEY, FIELDS_COL, TAGS_COL
from ilogtail_spark.operators.base import FieldsProcessor, Processor, register


@register
@dataclass
class ProcessorSplitLogString(Processor):
    """processor_split_log_string
    (plugins/processor/split/logstring/split_log_string.go:29-37;
    native twin ProcessorSplitLogStringNative.h:32-34): split one
    event's SplitKey on SplitSep into N events — 1 log -> N logs.
    Spark: explode(split(...)) — cardinality change, keeps all other
    columns. NoSplitKeyError/PreserveOthers: rows without the key pass
    through unchanged."""

    TYPE: ClassVar[str] = "processor_split_log_string"
    CHANGES_CARDINALITY: ClassVar[bool] = True

    SplitKey: str = CONTENT_KEY
    SplitSep: str = "\n"
    KeepHangingLineSep: bool = False  # accepted; trailing sep yields "" parts dropped below

    def apply(self, df: DataFrame) -> DataFrame:
        import re as _re

        fields = F.col(FIELDS_COL)
        v = fields.getItem(self.SplitKey)
        parts = F.split(v, _re.escape(self.SplitSep), -1)
        if not self.KeepHangingLineSep:
            parts = F.filter(parts, lambda p: p != "")
        # rows lacking the key keep one copy with fields untouched
        parts = F.when(v.isNotNull(), parts).otherwise(F.array(F.lit(None).cast("string")))
        out = df.withColumn("__part__", F.explode(parts))
        new_fields = F.when(
            F.col("__part__").isNotNull(),
            F.map_concat(
                F.map_filter(fields, lambda k, _: k != F.lit(self.SplitKey)),
                F.create_map(F.lit(self.SplitKey), F.col("__part__")),
            ),
        ).otherwise(fields)
        return out.withColumn(FIELDS_COL, new_fields).drop("__part__")


@register
@dataclass
class ProcessorSplitLogRegex(Processor):
    """processor_split_log_regex
    (plugins/processor/split/logregex/split_log_regex.go:56-101
    SplitLog, :103-138 ProcessLogs): split ONE event whose SplitKey
    value holds embedded newlines into N events at every line that
    FULL-matches SplitRegex — the within-value twin of the multiline
    merge (a matching line starts a new event; preceding lines stay
    with the previous one).

    Faithful edge semantics (traced against the Go scanner):
    * a matching FIRST line emits nothing (no empty leading event) —
      it starts the first segment;
    * an unmatched leading run becomes its own first segment;
    * a trailing ``\\n`` stays on the LAST segment (the remainder is
      taken as a raw substring there);
    * rows without the key: kept unchanged when PreserveOthers, else
      dropped (NoKeyError only warns in the reference);
    * PreserveOthers=False keeps ONLY the split key in the output
      fields map (ProcessLogs copies other contents only when set).

    Spark mapping — pure expressions, no Python: split to a line
    array, cut positions = indices >= 1 whose line full-matches
    (excluding the phantom empty element a trailing newline leaves),
    segments = zip_with over boundary pairs slicing the line array,
    posexplode into rows."""

    TYPE: ClassVar[str] = "processor_split_log_regex"
    CHANGES_CARDINALITY: ClassVar[bool] = True

    SplitKey: str = CONTENT_KEY
    SplitRegex: str = ".*"
    PreserveOthers: bool = False
    NoKeyError: bool = False  # accepted; the reference only warns

    def apply(self, df: DataFrame) -> DataFrame:
        fields = F.col(FIELDS_COL)
        v = fields.getItem(self.SplitKey)
        lines = F.split(v, r"\n", -1)
        n = F.size(lines)
        ends_nl = v.endswith("\n")
        full = "(?s)\\A(?:" + self.SplitRegex + ")\\z"

        def is_cut(i: Column) -> Column:
            line = F.try_element_at(lines, (i + 1).cast("int"))
            phantom_tail = ends_nl & (i == n - 1)
            return (i >= 1) & ~phantom_tail & line.rlike(full)

        idx = F.sequence(F.lit(0), n - 1)
        cuts = F.filter(idx, is_cut)
        starts = F.concat(F.array(F.lit(0)), cuts)
        seg_ends = F.concat(cuts, F.array(n))
        events = F.zip_with(
            starts,
            seg_ends,
            lambda s, e: F.array_join(
                F.slice(lines, (s + 1).cast("int"), (e - s).cast("int")), "\n"
            ),
        )
        events = F.when(v.isNotNull(), events).otherwise(
            F.array(F.lit(None).cast("string"))
        )
        out = df.withColumn("__seg__", F.explode(events))
        if self.PreserveOthers:
            others = F.map_filter(fields, lambda k, _: k != F.lit(self.SplitKey))
            new_fields = F.when(
                F.col("__seg__").isNotNull(),
                F.map_concat(
                    others, F.create_map(F.lit(self.SplitKey), F.col("__seg__"))
                ),
            ).otherwise(fields)
        else:
            # only the split key survives; keyless rows are dropped
            out = out.filter(F.col("__seg__").isNotNull())
            new_fields = F.create_map(
                F.lit(self.SplitKey), F.col("__seg__")
            )
        return out.withColumn(FIELDS_COL, new_fields).drop("__seg__")


@register
@dataclass
class ProcessorParseContainerLog(Processor):
    """processor_parse_container_log_native
    (core/plugin/processor/inner/ProcessorParseContainerLogNative.cpp:
    176-258 containerd text, :464-523 docker json): normalize
    container runtime stdout formats into ``_time_`` / ``_source_`` /
    ``content`` fields.

    * ``containerd_text``: ``<time> <stdout|stderr> [P |F ]<content>``
      — the single-char partial/full tag counts only when followed by
      a space; ``P`` additionally sets the ``P`` flag field (empty
      value) that the multiline merge consumes
      (ProcessorMergeMultilineLogNative.cpp:32 PartLogFlag="P");
      content is NOT newline-trimmed.
    * ``docker_json-file``: ``{"log":...,"stream":...,"time":...}`` —
      content's one trailing ``\\n`` is trimmed.

    Both: a malformed line (missing delimiters / invalid source) is
    kept unparsed or dropped per ``KeepingSourceWhenParseFail``;
    ``IgnoringStdout``/``IgnoringStderr`` drop by source. All pure
    Column expressions (split + get_json_object), scan-side."""

    TYPE: ClassVar[str] = "processor_parse_container_log"
    CHANGES_CARDINALITY: ClassVar[bool] = True  # ignore/drop paths

    SourceKey: str = CONTENT_KEY
    Mode: str = "containerd_text"  # containerd_text | docker_json-file
    IgnoringStdout: bool = False
    IgnoringStderr: bool = False
    KeepingSourceWhenParseFail: bool = False

    def apply(self, df: DataFrame) -> DataFrame:
        fields = F.col(FIELDS_COL)
        v = fields.getItem(self.SourceKey)
        if self.Mode == "docker_json-file":
            time_v = F.get_json_object(v, "$.time")
            source_v = F.get_json_object(v, "$.stream")
            raw_log = F.get_json_object(v, "$.log")
            # \n\z, not \n$: Java's $ also matches BEFORE a final
            # newline, so '\n$' would strip two trailing newlines; the
            # reference trims exactly one
            content = F.regexp_replace(raw_log, r"\n\z", "")
            partial = F.lit(False)
            ok = (
                time_v.isNotNull()
                & raw_log.isNotNull()
                & source_v.isin("stdout", "stderr")
            )
        elif self.Mode == "containerd_text":
            # limit-3 split: the LAST element is the raw remainder
            # (spaces preserved) — exactly the substring after the
            # second delimiter
            parts = F.split(v, " ", 3)
            time_v = F.element_at(parts, 1)
            source_v = F.try_element_at(parts, F.lit(2))
            rest = F.try_element_at(parts, F.lit(3))
            tag = F.substring(rest, 1, 2)
            has_tag = tag.isin("P ", "F ")
            content = F.when(has_tag, F.substring(rest, 3, 1 << 30)).otherwise(rest)
            partial = has_tag & (F.substring(rest, 1, 1) == "P")
            ok = (F.size(parts) >= 3) & source_v.isin("stdout", "stderr")
        else:
            raise ValueError(f"unknown Mode {self.Mode!r}")

        # null-safe: a null source value (missing key / no delimiters)
        # must read as parse-FAILURE, not filter-eating null. The flag
        # is MATERIALIZED as a column: after fields is replaced below,
        # re-evaluating the expression would parse the parsed output.
        ok_expr = F.coalesce(ok, F.lit(False))
        drop_by_source = (
            (F.lit(self.IgnoringStdout) & (source_v == "stdout"))
            | (F.lit(self.IgnoringStderr) & (source_v == "stderr"))
        )
        out = df.filter(~(ok_expr & drop_by_source)).withColumn(
            "__ok__", ok_expr
        )
        ok = F.col("__ok__")
        parsed = F.map_concat(
            F.map_filter(
                fields,
                lambda k, _: (k != F.lit(self.SourceKey))
                & (k != F.lit("_time_"))
                & (k != F.lit("_source_"))
                & (k != F.lit("P")),
            ),
            F.map_from_arrays(
                # the P slot's key AND value are null together on
                # non-partial rows, so both filters stay aligned; the
                # other values coalesce to '' because Spark evaluates
                # this branch even for rows the `ok` guard rejects
                F.filter(
                    F.array(
                        F.lit("_time_"),
                        F.lit("_source_"),
                        F.when(partial, F.lit("P")),
                        F.lit(CONTENT_KEY),
                    ),
                    lambda x: x.isNotNull(),
                ),
                F.filter(
                    F.array(
                        F.coalesce(time_v, F.lit("")),
                        F.coalesce(source_v, F.lit("")),
                        F.when(partial, F.lit("")),
                        F.coalesce(content, F.lit("")),
                    ),
                    lambda x: x.isNotNull(),
                ),
            ),
        )
        new_fields = F.when(ok, parsed).otherwise(fields)
        out = out.withColumn(FIELDS_COL, new_fields)
        if not self.KeepingSourceWhenParseFail:
            out = out.filter(ok)
        return out.drop("__ok__")


@register
@dataclass
class ProcessorMergeMultilineLog(Processor):
    """processor_merge_multiline_log_native
    (core/plugin/processor/inner/ProcessorMergeMultilineLogNative.h:29,
    core/file_server/MultilineOptions.h:31-44): merge physical lines
    into logical events by StartPattern (a new event begins at each
    matching line); lines before the first start follow
    UnmatchedContentTreatment (discard | single_line).

    Spark: a running sum of is_start over a window ordered by
    (OrderColumns) within each SourceGroup partition assigns the
    logical-event id; groupBy(group, event_id) + concat_ws joins the
    lines. The window shuffles once on the group column — at scale the
    group is the file/conversation, so state never crosses groups.
    """

    TYPE: ClassVar[str] = "processor_merge_multiline_log"
    CHANGES_CARDINALITY: ClassVar[bool] = True

    StartPattern: str = ""
    MergeSep: str = "\n"
    SourceKey: str = CONTENT_KEY
    GroupColumns: list = dc_field(default_factory=lambda: ["conv_id"])
    OrderColumns: list = dc_field(default_factory=lambda: ["turn_idx"])
    UnmatchedContentTreatment: str = "single_line"  # discard | single_line
    # Scale-guard EXTENSION (not in the reference, whose size cap lives
    # in the file reader's buffer): split a logical event after this
    # many physical lines so one pathological event cannot become an
    # unbounded collect_list in a single task. None = unbounded
    # (reference semantics).
    MaxMergeLines: int | None = None

    def apply(self, df: DataFrame) -> DataFrame:
        fields = F.col(FIELDS_COL)
        v = fields.getItem(self.SourceKey)
        is_start = v.rlike("(?s)\\A(?:" + self.StartPattern + ")").cast("int")
        w = (
            Window.partitionBy(*[F.col(c) for c in self.GroupColumns])
            .orderBy(*[F.col(c) for c in self.OrderColumns])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        df = df.withColumn("__evt__", F.sum(is_start).over(w))
        if self.MaxMergeLines:
            # chunk index within the logical event, computed with the
            # SAME window partitioning (one exchange+sort serves every
            # window here): line rank minus the rank of the event's
            # START line, integer-divided by the cap. The chunk id
            # rides in __evt__'s fractional identity via a second
            # group key so downstream groupBy splits oversize events.
            w_rank = Window.partitionBy(
                *[F.col(c) for c in self.GroupColumns]
            ).orderBy(*[F.col(c) for c in self.OrderColumns])
            rn = F.row_number().over(w_rank)
            start_rn = F.max(F.when(is_start == 1, rn)).over(w)
            within = rn - F.coalesce(start_rn, rn)
            df = df.withColumn(
                "__chunk__", F.floor(within / F.lit(self.MaxMergeLines)).cast("long")
            )
        else:
            df = df.withColumn("__chunk__", F.lit(0).cast("long"))
        if self.UnmatchedContentTreatment == "discard":
            df = df.filter(F.col("__evt__") > 0)
        else:
            # single_line (ProcessorMergeMultilineLogNative.cpp:353-380,
            # SINGLE_LINE): each line BEFORE the first StartPattern match
            # is its own single-line event, not one concatenated blob.
            # Give every running-sum-0 row a unique negative event id so
            # the downstream groupBy yields singleton groups; same
            # window partitioning, so no extra shuffle.
            w_rn = Window.partitionBy(
                *[F.col(c) for c in self.GroupColumns]
            ).orderBy(*[F.col(c) for c in self.OrderColumns])
            df = df.withColumn(
                "__evt__",
                F.when(F.col("__evt__") > 0, F.col("__evt__")).otherwise(
                    -F.row_number().over(w_rn).cast("long")
                ),
            )
        # order INSIDE the aggregate: collect (order cols, line) structs
        # and array_sort them — deterministic under any shuffle, and the
        # groupBy is the only exchange (a pre-repartition on the group
        # columns alone would NOT satisfy the (group, __evt__) hash
        # partitioning and would just add a second shuffle)
        line_struct = F.struct(
            *[F.col(c).alias(f"__o{i}__") for i, c in enumerate(self.OrderColumns)],
            v.alias("__line__"),
        )
        other_cols = [
            c
            for c in df.columns
            if c not in (*self.GroupColumns, "__evt__", "__chunk__", FIELDS_COL)
        ]
        order_key = F.struct(*[F.col(o) for o in self.OrderColumns])
        grouped = df.groupBy(*self.GroupColumns, "__evt__", "__chunk__").agg(
            F.array_sort(F.collect_list(line_struct)).alias("__lines__"),
            # min_by: first row's value under the order key (works for
            # non-orderable value types like the tags map)
            *[F.min_by(F.col(c), order_key).alias(c) for c in other_cols],
            F.min_by(fields, order_key).alias("__first_fields__"),
        )
        merged = F.array_join(
            F.transform(F.col("__lines__"), lambda x: x["__line__"]), self.MergeSep
        )
        merged_fields = F.map_concat(
            F.map_filter(F.col("__first_fields__"), lambda k, _: k != F.lit(self.SourceKey)),
            F.create_map(F.lit(self.SourceKey), merged),
        )
        # __evt__ (1-based logical-event index within the group) stays
        # as an output column: it is the merge's provenance id.
        # __chunk__ stays only when MaxMergeLines split an event.
        out = grouped.withColumn(FIELDS_COL, merged_fields).drop(
            "__lines__", "__first_fields__"
        )
        if not self.MaxMergeLines:
            out = out.drop("__chunk__")
        return out


@register
@dataclass
class ProcessorLogToSlsMetric(Processor):
    """processor_log_to_sls_metric
    (plugins/processor/logtoslsmetric/processor_log_to_sls_metric.go:
    32-43,46-52): convert a log event into metric events — one output
    row per MetricValues (nameField -> valueField) entry with
    ``__name__``, ``__labels__`` (sorted ``k#$#v`` pairs joined with
    ``|``), ``__time_nano__``, ``__value__``. Labels from
    MetricLabelKeys (field refs) + CustomMetricLabels (constants).

    Spark: build an array of metric structs and explode — N metrics
    per row in one pass, no UDF."""

    TYPE: ClassVar[str] = "processor_log_to_sls_metric"
    CHANGES_CARDINALITY: ClassVar[bool] = True

    MetricTimeKey: str = ""
    MetricLabelKeys: list = dc_field(default_factory=list)
    MetricValues: dict = dc_field(default_factory=dict)
    CustomMetricLabels: dict = dc_field(default_factory=dict)
    IgnoreError: bool = False
    TimeColumn: str = "ts"

    def apply(self, df: DataFrame) -> DataFrame:
        fields = F.col(FIELDS_COL)
        label_pairs: list[tuple[str, Column]] = [
            (k, fields.getItem(k)) for k in self.MetricLabelKeys
        ] + [(k, F.lit(str(v))) for k, v in self.CustomMetricLabels.items()]
        label_pairs.sort(key=lambda kv: kv[0])
        labels = F.concat_ws(
            "|", *[F.concat(F.lit(k), F.lit("#$#"), v) for k, v in label_pairs]
        )
        if self.MetricTimeKey:
            t = fields.getItem(self.MetricTimeKey).try_cast("long")
            # unix s/ms/us/ns -> ns by magnitude
            time_nano = (
                F.when(t < F.lit(10_000_000_000), t * 1_000_000_000)
                .when(t < F.lit(10_000_000_000_000), t * 1_000_000)
                .when(t < F.lit(10_000_000_000_000_000), t * 1_000)
                .otherwise(t)
            )
        else:
            time_nano = (
                F.unix_timestamp(F.col(self.TimeColumn)).cast("long") * 1_000_000_000
            )
        metrics = [
            F.struct(
                F.lit(name).alias("__name__"),
                # try_cast: ANSI mode must not abort the job on one bad
                # value — the reference alarms and drops the metric
                fields.getItem(value_key).try_cast("double").alias("__value__"),
            )
            for name, value_key in sorted(self.MetricValues.items())
        ]
        out = df.withColumn("__m__", F.explode(F.array(*metrics)))
        out = out.select(
            *[c for c in df.columns if c != FIELDS_COL],
            F.col("__m__.__name__").alias("__name__"),
            labels.alias("__labels__"),
            time_nano.cast("string").alias("__time_nano__"),
            F.col("__m__.__value__").alias("__value__"),
        )
        # invalid (non-numeric) values are dropped, the reference alarms
        return out.filter(F.col("__value__").isNotNull())


@register
@dataclass
class AggregatorContentValueGroup(Processor):
    """aggregator_content_value_group
    (plugins/aggregator/contentvaluegroup/aggregator_content_value_group.go:
    66-120): group events by the VALUES of GroupKeys; each group's k/v
    is stamped onto the group tags. In the batch model grouping is a
    write-side ``partitionBy`` concern; the observable effect — tags
    carrying the group identity — is a map_concat from fields."""

    TYPE: ClassVar[str] = "aggregator_content_value_group"

    GroupKeys: list = dc_field(default_factory=list)
    EnableShardHash: bool = False
    ShardCount: int = 32

    def apply(self, df: DataFrame) -> DataFrame:
        fields = F.col(FIELDS_COL)
        kv: list[Column] = []
        for k in self.GroupKeys:
            kv += [F.lit(k), F.coalesce(fields.getItem(k), F.lit(""))]
        out = df.withColumn(
            TAGS_COL, F.map_concat(F.col(TAGS_COL), F.create_map(*kv))
        )
        if self.EnableShardHash:
            from ilogtail_spark.plans.skew import shardhash

            # shard on the group identity (aggregator_shardhash analog)
            out = out.withColumn(
                "__gk__",
                F.concat_ws("_", *[F.coalesce(fields.getItem(k), F.lit("")) for k in self.GroupKeys]),
            )
            out = shardhash(out, ["__gk__"], self.ShardCount).drop("__gk__")
        return out


@register
@dataclass
class ProcessorEncrypt(FieldsProcessor):
    """processor_encrypt
    (plugins/processor/encrypt/processor_encrypt.go:41-64): AES-CBC
    encrypt the listed SourceKeys (hex output); on missing key the
    value is left absent. Spark builtin ``aes_encrypt`` (3.3+) with an
    explicit IV keeps the result deterministic."""

    TYPE: ClassVar[str] = "processor_encrypt"

    SourceKeys: list = dc_field(default_factory=list)
    EncryptionParameters: dict = dc_field(default_factory=dict)
    KeepSourceIfError: bool = True

    def fields_expr(self, fields: Column) -> Column:
        key = self.EncryptionParameters.get("Key", "0" * 32)
        iv = self.EncryptionParameters.get("IV", "0" * 32)
        out = fields
        for k in self.SourceKeys:
            v = fields.getItem(k)
            enc = F.hex(
                F.aes_encrypt(
                    v.cast("binary"),
                    F.unhex(F.lit(key)),
                    F.lit("CBC"),
                    F.lit("PKCS"),
                    F.unhex(F.lit(iv)),
                )
            )
            out = F.when(
                v.isNotNull(), F.map_concat(out, F.create_map(F.lit(k), enc))
            ).otherwise(out)
        return out


@register
@dataclass
class ProcessorCloudMeta(FieldsProcessor):
    """processor_cloud_meta (plugins/processor/cloudmeta/cloud_meta.go:
    33-43): attach platform metadata as constant fields, resolved ON
    THE DRIVER at plan-build time (hostname stands in for cloud
    instance metadata in this environment)."""

    TYPE: ClassVar[str] = "processor_cloud_meta"

    Metadata: list = dc_field(default_factory=lambda: ["__cloud_instance_id__", "__cloud_region__"])
    RenameMetadata: dict = dc_field(default_factory=dict)

    def _resolve(self) -> dict[str, str]:
        import os
        import socket

        known = {
            "__cloud_instance_id__": socket.gethostname(),
            "__cloud_region__": os.environ.get("CLOUD_REGION", "local"),
            "__cloud_zone__": os.environ.get("CLOUD_ZONE", "local-a"),
        }
        out = {}
        for m in self.Metadata:
            val = known.get(m, "")
            out[self.RenameMetadata.get(m, m)] = val
        return out

    def fields_expr(self, fields: Column) -> Column:
        kv: list[Column] = []
        for k, v in self._resolve().items():
            kv += [F.lit(k), F.lit(v)]
        return F.map_concat(fields, F.create_map(*kv))


@register
@dataclass
class ProcessorTagNative(Processor):
    """processor_tag_native
    (core/plugin/processor/inner/ProcessorTagNative.h:41): append
    host/env tags to the GROUP TAGS (not fields); PipelineMetaTagKey
    renames the default tag keys."""

    TYPE: ClassVar[str] = "processor_tag_native"

    Tags: dict = dc_field(default_factory=dict)
    AddHostTags: bool = True
    PipelineMetaTagKey: dict = dc_field(default_factory=dict)

    def apply(self, df: DataFrame) -> DataFrame:
        import socket

        tags = dict(self.Tags)
        if self.AddHostTags:
            host_key = self.PipelineMetaTagKey.get("HOST_NAME", "__hostname__")
            tags.setdefault(host_key, socket.gethostname())
        kv: list[Column] = []
        for k, v in tags.items():
            kv += [F.lit(k), F.lit(str(v))]
        if not kv:
            return df
        return df.withColumn(
            TAGS_COL, F.map_concat(F.col(TAGS_COL), F.create_map(*kv))
        )
