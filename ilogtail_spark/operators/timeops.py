"""Time parsing processors — SURVEY.md §2.5.

strptime / Go-layout formats are translated ONCE on the driver to
Java DateTimeFormatter patterns, then applied with built-in
``to_timestamp`` / ``date_format`` Column expressions (JVM, codegen;
Catalyst constant-folds the format).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import ClassVar

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.model import FIELDS_COL
from ilogtail_spark.operators.base import FieldsProcessor, Processor, register

# strptime -> Java DateTimeFormatter translation
# (reference: plugins/processor/strptime/strptime.go uses C strptime;
#  core/plugin/processor/ProcessorParseTimestampNative.cpp:183-194
#  adds %f fractional seconds)
_STRPTIME_TO_JAVA = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%e": "d",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%3f": "SSS",
    "%6f": "SSSSSS",
    "%b": "MMM",
    "%B": "MMMM",
    "%a": "EEE",
    "%A": "EEEE",
    "%p": "a",
    "%j": "DDD",
    "%z": "Z",
    "%Z": "zzz",
    "%s": "epoch",  # special-cased below
    "%%": "%",
}


def strptime_to_java(fmt: str) -> str:
    out: list[str] = []
    i = 0
    lit: list[str] = []

    def flush_lit():
        if lit:
            text = "".join(lit)
            if any(c.isalpha() for c in text):
                out.append("'" + text.replace("'", "''") + "'")
            else:
                out.append(text)
            lit.clear()

    while i < len(fmt):
        c = fmt[i]
        if c == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            if tok == "%3" or tok == "%6":
                tok = fmt[i : i + 3]
            java = _STRPTIME_TO_JAVA.get(tok)
            if java is None:
                raise ValueError(f"unsupported strptime token {tok!r} in {fmt!r}")
            flush_lit()
            out.append(java)
            i += len(tok)
        else:
            lit.append(c)
            i += 1
    flush_lit()
    return "".join(out)


# Go reference-time layout fragments -> Java
# (processor_gotime parses Go layouts like "2006-01-02 15:04:05")
_GO_TO_JAVA = [
    ("2006", "yyyy"),
    ("01", "MM"),
    ("02", "dd"),
    ("15", "HH"),
    ("03", "hh"),
    ("04", "mm"),
    ("05", "ss"),
    (".000000", ".SSSSSS"),
    (".000", ".SSS"),
    ("Jan", "MMM"),
    ("Mon", "EEE"),
    ("PM", "a"),
    ("-0700", "Z"),
    ("Z07:00", "XXX"),
    ("MST", "zzz"),
    ("06", "yy"),
]


def golayout_to_java(layout: str) -> str:
    out = layout
    for go, java in _GO_TO_JAVA:
        out = out.replace(go, java)
    return out


def _set_event_time(
    df: DataFrame, parsed: Column, time_col: str, keep_on_fail: bool = True
) -> DataFrame:
    if time_col in df.columns and keep_on_fail:
        parsed = F.coalesce(parsed, F.col(time_col))
    return df.withColumn(time_col, parsed)


@register
@dataclass
class ProcessorStrptime(Processor):
    """processor_strptime (plugins/processor/strptime/strptime.go:59-72):
    parse fields[SourceKey] with a strptime Format -> event time
    (top-level ``ts``); UTC offset adjust; EnablePreciseTimestamp
    emits the epoch-milli/micro value under PreciseTimestampKey."""

    TYPE: ClassVar[str] = "processor_strptime"

    SourceKey: str = "time"
    Format: str = "%Y-%m-%d %H:%M:%S"
    AdjustUTCOffset: bool = False
    UTCOffset: int = 0  # seconds
    AlarmIfFail: bool = True
    KeepSource: bool = True
    EnablePreciseTimestamp: bool = False
    PreciseTimestampKey: str = "precise_timestamp"
    PreciseTimestampUnit: str = "ms"  # ms | us
    TimeColumn: str = "ts"

    def apply(self, df: DataFrame) -> DataFrame:
        v = F.col(FIELDS_COL).getItem(self.SourceKey)
        if self.Format == "%s":
            # reference truncates to the first 10 chars before parsing
            # (strptime.go processLog: value[0:10]) so a 13-digit
            # epoch-millis value parses as its SECONDS prefix, not a
            # far-future timestamp — mirror that exactly
            parsed = F.to_timestamp(
                F.timestamp_seconds(F.substring(v, 1, 10).try_cast("long"))
            )
        else:
            java_fmt = strptime_to_java(self.Format)
            parsed = F.try_to_timestamp(v, F.lit(java_fmt))
        if self.AdjustUTCOffset:
            parsed = parsed - F.make_interval(secs=F.lit(self.UTCOffset))
        df = _set_event_time(df, parsed, self.TimeColumn)
        if self.EnablePreciseTimestamp:
            mult = 1_000 if self.PreciseTimestampUnit == "ms" else 1_000_000
            precise = (
                (F.unix_timestamp(F.col(self.TimeColumn)).cast("decimal(20,6)") * mult)
                .cast("long")
                .cast("string")
            )
            df = df.withColumn(
                FIELDS_COL,
                F.map_concat(
                    F.col(FIELDS_COL),
                    F.create_map(F.lit(self.PreciseTimestampKey), precise),
                ),
            )
        if not self.KeepSource:
            df = df.withColumn(
                FIELDS_COL,
                F.map_filter(
                    F.col(FIELDS_COL), lambda k, _: k != F.lit(self.SourceKey)
                ),
            )
        return df


@register
@dataclass
class ProcessorGotime(Processor):
    """processor_gotime (plugins/processor/gotime/processor_gotime.go:34-51):
    parse fields[SourceKey] with a Go layout (or fixed patterns
    seconds/milliseconds/microseconds) and re-format to DestKey with
    DestFormat; SetTime additionally sets the event time."""

    TYPE: ClassVar[str] = "processor_gotime"

    SourceKey: str = ""
    SourceFormat: str = "2006-01-02 15:04:05"
    DestKey: str = ""
    DestFormat: str = "2006-01-02 15:04:05"
    SourceLocation: int = 0  # hours offset; 0 == machine/UTC here
    DestLocation: int = 0
    SetTime: bool = True
    KeepSource: bool = True
    NoKeyError: bool = True
    AlarmIfFail: bool = True
    TimeColumn: str = "ts"

    _FIXED = {"seconds": 1, "milliseconds": 1_000, "microseconds": 1_000_000}

    def apply(self, df: DataFrame) -> DataFrame:
        v = F.col(FIELDS_COL).getItem(self.SourceKey)
        if self.SourceFormat in self._FIXED:
            div = self._FIXED[self.SourceFormat]
            parsed = F.timestamp_seconds(
                (v.try_cast("decimal(26,6)") / div).cast("decimal(26,6)")
            )
        else:
            parsed = F.try_to_timestamp(
                v, F.lit(golayout_to_java(self.SourceFormat))
            )
        parsed = parsed + F.make_interval(
            hours=F.lit(self.DestLocation - self.SourceLocation)
        )
        # event time FIRST: parsed references fields[SourceKey], which a
        # DestKey==SourceKey in-place reformat below would overwrite
        if self.SetTime:
            df = _set_event_time(df, parsed, self.TimeColumn)
        if self.DestKey:
            if self.DestFormat in self._FIXED:
                mult = self._FIXED[self.DestFormat]
                dest = (
                    (F.unix_timestamp(parsed).cast("decimal(26,6)") * mult)
                    .cast("long")
                    .cast("string")
                )
            else:
                dest = F.date_format(parsed, golayout_to_java(self.DestFormat))
            df = df.withColumn(
                FIELDS_COL,
                F.when(
                    dest.isNotNull(),
                    F.map_concat(
                        F.col(FIELDS_COL), F.create_map(F.lit(self.DestKey), dest)
                    ),
                ).otherwise(F.col(FIELDS_COL)),
            )
        if not self.KeepSource:
            df = df.withColumn(
                FIELDS_COL,
                F.map_filter(
                    F.col(FIELDS_COL), lambda k, _: k != F.lit(self.SourceKey)
                ),
            )
        return df


@register
@dataclass
class ProcessorParseTimestampNative(Processor):
    """processor_parse_timestamp_native
    (core/plugin/processor/ProcessorParseTimestampNative.h:23-36):
    strptime incl. %f fraction, SourceTimezone (GMT+/-HH:MM), sets the
    event time; same engine as ProcessorStrptime."""

    TYPE: ClassVar[str] = "processor_parse_timestamp_native"

    SourceKey: str = "time"
    SourceFormat: str = "%Y-%m-%d %H:%M:%S"
    SourceTimezone: str = ""  # e.g. GMT+08:00
    SourceYear: int | None = None
    TimeColumn: str = "ts"

    def apply(self, df: DataFrame) -> DataFrame:
        v = F.col(FIELDS_COL).getItem(self.SourceKey)
        java_fmt = strptime_to_java(self.SourceFormat)
        parsed = F.try_to_timestamp(v, F.lit(java_fmt))
        if self.SourceTimezone:
            tz = self.SourceTimezone.replace("GMT", "")
            if tz:
                sign = 1 if tz[0] == "+" else -1
                hh, _, mm = tz[1:].partition(":")
                secs = sign * (int(hh) * 3600 + int(mm or 0) * 60)
                parsed = parsed - F.make_interval(secs=F.lit(secs))
        return _set_event_time(df, parsed, self.TimeColumn)
