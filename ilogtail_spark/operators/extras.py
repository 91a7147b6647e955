"""Remaining SURVEY.md §2 operators: Apsara parse, GeoIP range
enrich, OTel reshapes, aggregator aliases, SLS output record format.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import ClassVar

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.model import CONTENT_KEY, FIELDS_COL, TAGS_COL
from ilogtail_spark.operators.base import Processor, register


@register
@dataclass
class ProcessorParseApsaraNative(Processor):
    """processor_parse_apsara_native
    (core/plugin/processor/ProcessorParseApsaraNative.cpp:126-234
    parse, :428-470 base-field naming): Alibaba Apsara log lines —
    leading ``[yyyy-MM-dd HH:mm:ss.ffffff]`` timestamp, then
    tab-separated base fields ``[LEVEL]`` -> ``__LEVEL__``,
    ``[thread]`` -> ``__THREAD__``, ``[file:line]`` ->
    ``__FILE__``/``__LINE__``, then ``k:v`` pairs; emits ``microtime``
    and sets the event time.

    Spark mapping: regexp_extract for the bracketed header + a
    str_to_map over the k:v tail — all Column expressions.
    """

    TYPE: ClassVar[str] = "processor_parse_apsara_native"

    SourceKey: str = CONTENT_KEY
    Timezone: str = ""
    KeepingSourceWhenParseFail: bool = True
    KeepingSourceWhenParseSucceed: bool = False
    TimeColumn: str = "ts"

    _HEAD = (
        r"^\[(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(?:\.\d+)?)\]"
        r"(?:\t\[(\w+)\])?(?:\t\[(\d+)\])?(?:\t\[([^:\]]+):(\d+)\])?"
    )

    def apply(self, df: DataFrame) -> DataFrame:
        fields = F.col(FIELDS_COL)
        v = fields.getItem(self.SourceKey)
        # the _HEAD engine runs ONCE on the (possibly long) line: the
        # whole matched header is materialized through a temp column —
        # CollapseProject won't inline a multiply-referenced non-cheap
        # expression, so the 5 group extracts below run against the
        # short header string, not the full line (previously the same
        # pattern executed 6x per row on the full value)
        df = df.withColumn("__h__", F.regexp_extract(v, self._HEAD, 0))
        h = F.col("__h__")
        matched = v.isNotNull() & (h != "")
        df = df.withColumn("__tstr__", F.regexp_extract(h, self._HEAD, 1))
        tstr = F.col("__tstr__")
        df = df.withColumn(
            "__pts__",
            F.coalesce(
                F.try_to_timestamp(tstr, F.lit("yyyy-MM-dd HH:mm:ss.SSSSSS")),
                F.try_to_timestamp(tstr, F.lit("yyyy-MM-dd HH:mm:ss.SSS")),
                F.try_to_timestamp(tstr, F.lit("yyyy-MM-dd HH:mm:ss")),
            ),
        )
        parsed_ts = F.col("__pts__")
        # timestamp -> decimal keeps the sub-second fraction
        # (unix_timestamp would truncate to whole seconds)
        microtime = (
            (parsed_ts.cast("decimal(26,6)") * 1_000_000)
            .cast("long")
            .cast("string")
        )
        base_kv: list[Column] = [
            F.lit("microtime"),
            microtime,
            F.lit("__LEVEL__"),
            F.regexp_extract(h, self._HEAD, 2),
            F.lit("__THREAD__"),
            F.regexp_extract(h, self._HEAD, 3),
            F.lit("__FILE__"),
            F.regexp_extract(h, self._HEAD, 4),
            F.lit("__LINE__"),
            F.regexp_extract(h, self._HEAD, 5),
        ]
        base = F.map_filter(
            F.create_map(*base_kv), lambda k, x: x.isNotNull() & (x != "")
        )
        # k:v tail after the bracketed header: plain substring past the
        # matched header (plus its trailing tab) — no second regex pass
        rest = F.substring(v, F.length(h) + 1, F.lit(2_147_483_647))
        tail = F.when(
            rest.startswith("\t"), F.substring(rest, 2, 2_147_483_647)
        ).otherwise(rest)
        kv_map = F.when(
            tail.contains(":"),
            F.str_to_map(tail, F.lit("\t"), F.lit(":")),
        ).otherwise(F.create_map().cast("map<string,string>"))
        # drop tail entries without a separator (str_to_map maps them to null)
        kv_map = F.map_filter(kv_map, lambda k, x: x.isNotNull())

        without_src = F.map_filter(fields, lambda k, _: k != F.lit(self.SourceKey))
        ok_base = fields if self.KeepingSourceWhenParseSucceed else without_src
        fail_base = fields if self.KeepingSourceWhenParseFail else without_src
        new_fields = F.when(
            matched, F.map_concat(ok_base, base, kv_map)
        ).otherwise(fail_base)
        # set the event time FIRST: the expressions reference the
        # fields map, so they must resolve against the ORIGINAL column
        # (after the fields rewrite drops the source key, `matched`
        # would silently evaluate false)
        out = df
        if self.TimeColumn in df.columns:
            out = out.withColumn(
                self.TimeColumn,
                F.when(matched, F.coalesce(parsed_ts, F.col(self.TimeColumn))).otherwise(
                    F.col(self.TimeColumn)
                ),
            )
        return out.withColumn(FIELDS_COL, new_fields).drop(
            "__h__", "__tstr__", "__pts__"
        )


@register
@dataclass
class ProcessorGeoIP(Processor):
    """processor_geoip (plugins/processor/geoip/processor_geoip.go:
    35-45): look an IP field up in a range table -> city / province /
    country (/ isp / coords) fields.

    Spark mapping: the MaxMind mmdb becomes a RANGE DIMENSION table
    ``(net_start long, net_end long, city, province, country, isp)``.
    A naive ``BETWEEN`` join is a broadcast nested loop (O(n x m));
    instead each dim row is EXPLODED per /16 prefix it spans and the
    join becomes prefix-EQUI + range filter — a broadcast HASH join,
    the standard IP-range join trick at scale.
    """

    TYPE: ClassVar[str] = "processor_geoip"

    SourceKey: str = "ip"
    DimPath: str = ""
    AttachColumns: list = dc_field(default_factory=lambda: ["city", "province", "country"])
    NoKeyError: bool = False
    KeepSource: bool = True

    @staticmethod
    def ip_to_long(ip: Column) -> Column:
        parts = F.split(ip, r"\.")
        return (
            F.try_element_at(parts, F.lit(1)).cast("long") * 16777216
            + F.try_element_at(parts, F.lit(2)).cast("long") * 65536
            + F.try_element_at(parts, F.lit(3)).cast("long") * 256
            + F.try_element_at(parts, F.lit(4)).cast("long")
        )

    def apply(self, df: DataFrame) -> DataFrame:
        from ilogtail_spark.model import event_field

        spark = df.sparkSession
        dim = spark.read.parquet(self.DimPath)
        # explode each range across the /16 prefixes it covers
        dim = dim.withColumn(
            "__p16__",
            F.explode(
                F.sequence(
                    (F.col("net_start") / 65536).cast("long"),
                    (F.col("net_end") / 65536).cast("long"),
                )
            ),
        )
        ip_long = self.ip_to_long(event_field(df, self.SourceKey))
        fact = df.withColumn("__ip_long__", ip_long).withColumn(
            "__p16__", (F.col("__ip_long__") / 65536).cast("long")
        )
        joined = fact.join(
            F.broadcast(dim),
            (fact["__p16__"] == dim["__p16__"])
            & (F.col("__ip_long__") >= F.col("net_start"))
            & (F.col("__ip_long__") <= F.col("net_end")),
            "left",
        )
        kv: list[Column] = []
        for c in self.AttachColumns:
            kv += [F.lit(c), F.col(c).cast("string")]
        attached = F.map_filter(F.create_map(*kv), lambda k, x: x.isNotNull())
        out = joined.withColumn(
            FIELDS_COL, F.map_concat(F.col(FIELDS_COL), attached)
        )
        drop = ["__ip_long__", "net_start", "net_end", *self.AttachColumns]
        out = out.drop(*drop)
        # both sides carried __p16__; drop both
        return out.drop("__p16__")


@register
@dataclass
class ProcessorOtelMetric(Processor):
    """processor_otel_metric (plugins/processor/otel/*.go): reshape
    log events into OTel-style metric rows — ``metric_name``,
    ``attributes`` (map), ``time_unix_nano``, ``value``. One output
    row per MetricValues entry (explode), mirroring
    processor_log_to_sls_metric with OTel field names."""

    TYPE: ClassVar[str] = "processor_otel_metric"
    CHANGES_CARDINALITY: ClassVar[bool] = True

    MetricValues: dict = dc_field(default_factory=dict)
    AttributeKeys: list = dc_field(default_factory=list)
    TimeColumn: str = "ts"

    def apply(self, df: DataFrame) -> DataFrame:
        fields = F.col(FIELDS_COL)
        kv: list[Column] = []
        for k in self.AttributeKeys:
            kv += [F.lit(k), fields.getItem(k)]
        attrs = F.map_filter(F.create_map(*kv), lambda k, x: x.isNotNull())
        metrics = [
            F.struct(
                F.lit(name).alias("metric_name"),
                fields.getItem(value_key).try_cast("double").alias("value"),
            )
            for name, value_key in sorted(self.MetricValues.items())
        ]
        t_nano = F.unix_timestamp(F.col(self.TimeColumn)).cast("long") * 1_000_000_000
        out = df.withColumn("__m__", F.explode(F.array(*metrics)))
        return out.select(
            *[c for c in df.columns if c != FIELDS_COL],
            F.col("__m__.metric_name").alias("metric_name"),
            attrs.alias("attributes"),
            t_nano.alias("time_unix_nano"),
            F.col("__m__.value").alias("value"),
        ).filter(F.col("value").isNotNull())


@register
@dataclass
class ProcessorOtelTrace(Processor):
    """processor_otel_trace (plugins/processor/otel/*.go): reshape log
    events into OTel span rows: trace_id/span_id (from fields or
    deterministic md5 of identity columns), name, start/end
    time_unix_nano, attributes."""

    TYPE: ClassVar[str] = "processor_otel_trace"
    CHANGES_CARDINALITY: ClassVar[bool] = True

    TraceIDKey: str = "trace_id"
    SpanIDKey: str = "span_id"
    NameKey: str = "span_name"
    DurationMsKey: str = ""
    AttributeKeys: list = dc_field(default_factory=list)
    TimeColumn: str = "ts"

    def apply(self, df: DataFrame) -> DataFrame:
        fields = F.col(FIELDS_COL)
        ident = [c for c in ("conv_id", "turn_idx", "event_id") if c in df.columns]
        fallback = F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in ident])) if ident else F.md5(F.lit("span"))
        trace_id = F.coalesce(fields.getItem(self.TraceIDKey), fallback)
        span_id = F.coalesce(
            fields.getItem(self.SpanIDKey), F.substring(fallback, 1, 16)
        )
        start = F.unix_timestamp(F.col(self.TimeColumn)).cast("long") * 1_000_000_000
        dur_ns = (
            fields.getItem(self.DurationMsKey).try_cast("long") * 1_000_000
            if self.DurationMsKey
            else F.lit(0).cast("long")
        )
        kv: list[Column] = []
        for k in self.AttributeKeys:
            kv += [F.lit(k), fields.getItem(k)]
        attrs = F.map_filter(F.create_map(*kv), lambda k, x: x.isNotNull())
        return df.select(
            *[c for c in df.columns if c != FIELDS_COL],
            trace_id.alias("trace_id"),
            span_id.alias("span_id"),
            F.coalesce(fields.getItem(self.NameKey), F.lit("span")).alias("name"),
            start.alias("start_time_unix_nano"),
            (start + F.coalesce(dur_ns, F.lit(0))).alias("end_time_unix_nano"),
            attrs.alias("attributes"),
        )


@register
@dataclass
class AggregatorContext(Processor):
    """aggregator_context / aggregator_default
    (plugins/aggregator/context/aggregator_context.go:44-62,
    aggregator_default.go:26): per-source (conversation) grouping with
    preserved arrival order — the stable turn ordering repartition."""

    TYPE: ClassVar[str] = "aggregator_context"

    GroupColumn: str = "conv_id"
    OrderColumn: str = "turn_idx"

    def apply(self, df: DataFrame) -> DataFrame:
        from ilogtail_spark.plans.skew import stable_turn_order

        return stable_turn_order(df, self.GroupColumn, self.OrderColumn)


@register
@dataclass
class AggregatorBase(Processor):
    """aggregator_base
    (plugins/aggregator/baseagg/aggregator_base.go:26-137): size/count
    packing into LogGroups with a ``__pack_id__`` tag. Packing is not
    semantically observable in the batch model (only routed counts
    are); the pack-id tag is stamped per task so provenance survives,
    and file sizing is a write option (maxRecordsPerFile)."""

    TYPE: ClassVar[str] = "aggregator_base"

    MaxLogCount: int = 1024  # accepted; maps to write-side file sizing

    def apply(self, df: DataFrame) -> DataFrame:
        pack = F.concat_ws(
            "-",
            F.lit("pack"),
            F.spark_partition_id().cast("string"),
        )
        return df.withColumn(
            TAGS_COL,
            F.map_concat(F.col(TAGS_COL), F.create_map(F.lit("__pack_id__"), pack)),
        )


@register
@dataclass
class AggregatorMetadataGroup(Processor):
    """aggregator_metadata_group (v2)
    (plugins/aggregator/metadatagroup/aggregator_metadata_group.go:
    170-178): group by TAG/metadata values — the tags-side twin of
    content_value_group."""

    TYPE: ClassVar[str] = "aggregator_metadata_group"

    GroupMetadataKeys: list = dc_field(default_factory=list)

    def apply(self, df: DataFrame) -> DataFrame:
        tags = F.col(TAGS_COL)
        kv: list[Column] = []
        for k in self.GroupMetadataKeys:
            kv += [F.lit(k), F.coalesce(tags.getItem(k), F.lit(""))]
        return df.withColumn(TAGS_COL, F.map_concat(tags, F.create_map(*kv)))


@register
@dataclass
class AggregatorOpenTelemetry(Processor):
    """aggregator_opentelemetry
    (plugins/aggregator/opentelemetry/aggregator_opentelemetry.go:
    96-106): route each log to the metrics / traces / logs logstore
    by its content COUNT — OTLP metric records carry <= 5 contents,
    spans >= 19, logs sit in between; empty-content logs are silently
    dropped (Add returns without routing).

    Spark mapping: a sink-column projection (same contract as the
    logstore router) — the LogGroup size/count packing behind it is
    aggregator_base + write-side file sizing. Scan-side, no
    shuffle."""

    TYPE: ClassVar[str] = "aggregator_opentelemetry"
    CHANGES_CARDINALITY: ClassVar[bool] = True  # empty-content drop

    MetricsLogstore: str = "otlp-metrics"
    TraceLogstore: str = "otlp-traces"
    LogLogstore: str = "otlp-logs"

    def apply(self, df: DataFrame) -> DataFrame:
        from ilogtail_spark.plans.router import SINK_COL

        n = F.size(F.col(FIELDS_COL))
        sink = (
            F.when(n <= 5, F.lit(self.MetricsLogstore))
            .when(n >= 19, F.lit(self.TraceLogstore))
            .otherwise(F.lit(self.LogLogstore))
        )
        return df.filter(n > 0).withColumn(SINK_COL, sink)


@register
@dataclass
class AggregatorSkywalking(Processor):
    """aggregator_skywalking
    (plugins/aggregator/skywalking/aggregator_skywalking.go:94-112):
    route by the signal's signature content key — ``__name__`` ->
    metrics, ``links`` -> traces, ``otlp.name`` -> logs,
    unrecognized -> logs (the reference warns and defaults);
    empty-content logs are dropped.

    Divergence note: the reference switches on the FIRST content's
    key (protocol.Log.Contents is an ordered list); the Spark event's
    fields map is unordered, so routing is by key PRESENCE with the
    same precedence order — identical for well-formed skywalking
    payloads, where exactly one signature key exists."""

    TYPE: ClassVar[str] = "aggregator_skywalking"
    CHANGES_CARDINALITY: ClassVar[bool] = True  # empty-content drop

    MetricsLogstore: str = "skywalking-metrics"
    TraceLogstore: str = "skywalking-traces"
    LogLogstore: str = "skywalking-logs"

    def apply(self, df: DataFrame) -> DataFrame:
        from ilogtail_spark.plans.router import SINK_COL

        fields = F.col(FIELDS_COL)
        # otlp.name (recognized log) and unrecognized both route to
        # LogLogstore — in the reference they differ only by a logged
        # warning, so one fallback branch covers both
        sink = (
            F.when(
                F.map_contains_key(fields, "__name__"), F.lit(self.MetricsLogstore)
            )
            .when(F.map_contains_key(fields, "links"), F.lit(self.TraceLogstore))
            .otherwise(F.lit(self.LogLogstore))
        )
        return df.filter(F.size(fields) > 0).withColumn(SINK_COL, sink)


def to_sls_record(df: DataFrame, flatten: bool = False) -> DataFrame:
    """Output record format of the reference's converter
    (pkg/protocol/converter/converter.go:29-41,
    custom_single_log.go:25-62): ``custom_single`` = one JSON object
    ``{"time": <unix sec>, "contents": {...}, "tags": {...}}``;
    ``flatten`` merges contents+tags to top level
    (custom_single_flatten)."""
    time_col = (
        F.unix_timestamp(F.col("ts")).cast("long")
        if "ts" in df.columns
        else F.lit(0).cast("long")
    )
    if flatten:
        merged = F.map_concat(F.col(FIELDS_COL), F.col(TAGS_COL))
        return df.select(
            time_col.alias("time"), F.to_json(merged).alias("record")
        )
    rec = F.to_json(
        F.struct(
            time_col.alias("time"),
            F.col(FIELDS_COL).alias("contents"),
            F.col(TAGS_COL).alias("tags"),
        )
    )
    return df.select(time_col.alias("time"), rec.alias("record"))
