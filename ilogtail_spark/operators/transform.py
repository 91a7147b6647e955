"""Field transform processors — SURVEY.md §2.3.

Every operator here is a pure Column expression over the ``fields``
map (JVM-side, codegen'd, fused by Catalyst into one projection).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field as dc_field
from typing import Callable, ClassVar

from pyspark.sql import Column
from pyspark.sql import functions as F

from ilogtail_spark.model import map_drop_keys, map_pick_keys
from ilogtail_spark.operators.base import (
    FieldsProcessor,
    PandasFieldsProcessor,
    register,
)
from ilogtail_spark.functions.recache import compile_cached


@register
@dataclass
class ProcessorRename(FieldsProcessor):
    """processor_rename
    (plugins/processor/rename/processor_rename.go:26-105): rename
    SourceKeys[i] -> DestKeys[i]; keys not present are left alone
    (NoKeyError only alarms). Same-name pairs are skipped at init.
    """

    TYPE: ClassVar[str] = "processor_rename"

    SourceKeys: list = dc_field(default_factory=list)
    DestKeys: list = dc_field(default_factory=list)
    NoKeyError: bool = False

    def __post_init__(self):
        if len(self.SourceKeys) != len(self.DestKeys):
            raise ValueError("SourceKeys and DestKeys must have equal length")
        self._mapping = {
            s: d for s, d in zip(self.SourceKeys, self.DestKeys) if s != d
        }

    def fields_expr(self, fields: Column) -> Column:
        if not self._mapping:
            return fields

        def rewrite(k: Column, v: Column) -> Column:
            out = None
            for s, d in self._mapping.items():
                out = (
                    F.when(k == F.lit(s), F.lit(d))
                    if out is None
                    else out.when(k == F.lit(s), F.lit(d))
                )
            return out.otherwise(k)

        return F.transform_keys(fields, rewrite)


@register
@dataclass
class ProcessorAddFields(FieldsProcessor):
    """processor_add_fields
    (plugins/processor/addfields/processor_add_fields.go:26-30):
    insert constant pairs; IgnoreIfExist keeps an existing value.
    """

    TYPE: ClassVar[str] = "processor_add_fields"

    Fields: dict = dc_field(default_factory=dict)
    IgnoreIfExist: bool = False

    def fields_expr(self, fields: Column) -> Column:
        if not self.Fields:
            return fields
        kv: list[Column] = []
        for k, v in self.Fields.items():
            kv += [F.lit(k), F.lit(str(v))]
        const = F.create_map(*kv)
        if self.IgnoreIfExist:
            # existing keys win: only add the missing ones
            missing = F.map_filter(const, lambda k, _: fields[k].isNull())
            return F.map_concat(fields, missing)
        return F.map_concat(fields, const)  # LAST_WIN => new values win


@register
@dataclass
class ProcessorDrop(FieldsProcessor):
    """processor_drop (plugins/processor/drop/processor_drop.go:24-64)."""

    TYPE: ClassVar[str] = "processor_drop"

    DropKeys: list = dc_field(default_factory=list)

    def fields_expr(self, fields: Column) -> Column:
        return map_drop_keys(fields, self.DropKeys) if self.DropKeys else fields


@register
@dataclass
class ProcessorPickKey(FieldsProcessor):
    """processor_pick_key
    (plugins/processor/pickkey/processor_pick_key.go:26-37): keep-list
    Include wins over deny-list Exclude (reference applies Include
    when both set).
    """

    TYPE: ClassVar[str] = "processor_pick_key"

    Include: list = dc_field(default_factory=list)
    Exclude: list = dc_field(default_factory=list)

    def fields_expr(self, fields: Column) -> Column:
        if self.Include:
            return map_pick_keys(fields, self.Include)
        if self.Exclude:
            return map_drop_keys(fields, self.Exclude)
        return fields


@register
@dataclass
class ProcessorDropLastKey(FieldsProcessor):
    """processor_drop_last_key
    (plugins/processor/droplastkey/processor_drop_last_key.go:26-34):
    drop DropKey only when ALL Include keys are present — i.e. drop
    the raw line once parsing demonstrably succeeded.
    """

    TYPE: ClassVar[str] = "processor_drop_last_key"

    DropKey: str = ""
    Include: list = dc_field(default_factory=list)

    def fields_expr(self, fields: Column) -> Column:
        present = F.lit(True)
        for k in self.Include:
            present = present & fields.getItem(k).isNotNull()
        return F.when(present, map_drop_keys(fields, [self.DropKey])).otherwise(
            fields
        )


@register
@dataclass
class ProcessorAppender(FieldsProcessor):
    """processor_appender
    (plugins/processor/appender/processor_appender.go:31-46): append
    Value to fields[Key] (create when absent). Platform template vars
    ({{__ip__}}, {{$ENV}}) are expanded ON THE DRIVER at plan-build
    time — the reference does the same once at Init.
    """

    TYPE: ClassVar[str] = "processor_appender"

    Key: str = ""
    Value: str = ""
    SortLabels: bool = False

    def fields_expr(self, fields: Column) -> Column:
        import os
        import socket

        val = self.Value
        if "{{" in val:
            val = val.replace("{{__hostname__}}", socket.gethostname())
            # {{$VAR}} env expansion
            import re as _re

            val = _re.sub(
                r"\{\{\$(\w+)\}\}", lambda m: os.environ.get(m.group(1), ""), val
            )
        appended = F.concat(
            F.coalesce(fields.getItem(self.Key), F.lit("")), F.lit(val)
        )
        if self.SortLabels:
            appended = F.array_join(
                F.array_sort(F.split(appended, r"\|")), "|"
            )
        return F.map_concat(fields, F.create_map(F.lit(self.Key), appended))


@register
@dataclass
class ProcessorPackJson(FieldsProcessor):
    """processor_packjson
    (plugins/processor/packjson/processor_packjson.go:26-33): pack
    SourceKeys into one JSON object under DestKey. Missing source
    keys are omitted (AlarmIfIncomplete only alarms). Keys are
    emitted sorted, matching Go json.Marshal's sorted map keys.
    """

    TYPE: ClassVar[str] = "processor_packjson"

    SourceKeys: list = dc_field(default_factory=list)
    DestKey: str = "packed"
    KeepSource: bool = True
    AlarmIfIncomplete: bool = False

    def fields_expr(self, fields: Column) -> Column:
        cols = [
            fields.getItem(k).alias(k) for k in sorted(self.SourceKeys)
        ]
        packed = F.to_json(F.struct(*cols))  # null fields omitted
        out = F.map_concat(fields, F.create_map(F.lit(self.DestKey), packed))
        if not self.KeepSource:
            out = map_drop_keys(out, [k for k in self.SourceKeys if k != self.DestKey])
        return out


@register
@dataclass
class ProcessorMD5(FieldsProcessor):
    """processor_md5 (plugins/processor/md5/processor_md5.go:26-32)."""

    TYPE: ClassVar[str] = "processor_md5"

    SourceKey: str = ""
    MD5Key: str = ""

    def fields_expr(self, fields: Column) -> Column:
        v = fields.getItem(self.SourceKey)
        return F.when(
            v.isNotNull(),
            F.map_concat(fields, F.create_map(F.lit(self.MD5Key), F.md5(v))),
        ).otherwise(fields)


@register
@dataclass
class ProcessorBase64Encoding(FieldsProcessor):
    """processor_base64_encoding
    (plugins/processor/base64/encoding/...go:25-31)."""

    TYPE: ClassVar[str] = "processor_base64_encoding"

    SourceKey: str = ""
    NewKey: str = ""

    def fields_expr(self, fields: Column) -> Column:
        v = fields.getItem(self.SourceKey)
        enc = F.base64(v.cast("binary"))
        return F.when(
            v.isNotNull(),
            F.map_concat(fields, F.create_map(F.lit(self.NewKey), enc)),
        ).otherwise(fields)


@register
@dataclass
class ProcessorBase64Decoding(FieldsProcessor):
    """processor_base64_decoding
    (plugins/processor/base64/decoding/...go)."""

    TYPE: ClassVar[str] = "processor_base64_decoding"

    SourceKey: str = ""
    NewKey: str = ""

    def fields_expr(self, fields: Column) -> Column:
        v = fields.getItem(self.SourceKey)
        dec = F.unbase64(v).cast("string")
        return F.when(
            v.isNotNull(),
            F.map_concat(fields, F.create_map(F.lit(self.NewKey), dec)),
        ).otherwise(fields)


@register
@dataclass
class ProcessorStringReplace(FieldsProcessor):
    """processor_string_replace
    (plugins/processor/stringreplace/processor_string_replace.go:41-54):
    Method regex|const|unquote on SourceKey, result to DestKey (else
    in-place).
    """

    TYPE: ClassVar[str] = "processor_string_replace"

    SourceKey: str = ""
    Method: str = "const"
    Match: str = ""
    ReplaceString: str = ""
    DestKey: str = ""

    def fields_expr(self, fields: Column) -> Column:
        v = fields.getItem(self.SourceKey)
        if self.Method == "regex":
            out = F.regexp_replace(v, self.Match, self.ReplaceString)
        elif self.Method == "const":
            out = F.replace(v, F.lit(self.Match), F.lit(self.ReplaceString))
        elif self.Method == "unquote":
            # strip one layer of quotes, then the shared one-pass
            # tokenizing unescape (functions/strings.py — no sentinel,
            # each input char consumed by exactly one token)
            from ilogtail_spark.functions.strings import unescape_scan

            inner = F.regexp_replace(v, r'(?s)^"(.*)"$', "$1")
            out = unescape_scan(
                inner,
                {
                    "\\\\": "\\",
                    "\\n": "\n",
                    "\\t": "\t",
                    "\\r": "\r",
                    '\\"': '"',
                },
            )
        else:
            raise ValueError(f"unknown Method {self.Method!r}")
        dest = self.DestKey or self.SourceKey
        return F.when(
            v.isNotNull(),
            F.map_concat(fields, F.create_map(F.lit(dest), out)),
        ).otherwise(fields)


@register
@dataclass
class ProcessorDesensitize(FieldsProcessor):
    """processor_desensitize
    (plugins/processor/desensitize/processor_desensitize.go:34-48,146-184)
    and native twin ProcessorDesensitizeNative.cpp.

    Match=full: replace the whole value with ReplaceString (Method=
    const) or its md5 (Method=md5). Match=regex: RegexBegin locates
    the start, RegexContent the span immediately after it to replace;
    the scan repeats along the value.

    Spark mapping: full -> lit/md5; regex+const -> regexp_replace on
    ``(begin)(content)`` keeping group 1; regex+md5 needs a per-match
    digest -> fusable pandas stage (ProcessorDesensitizePandas).
    """

    TYPE: ClassVar[str] = "processor_desensitize"

    SourceKey: str = ""
    Method: str = "const"  # const | md5
    Match: str = "full"  # full | regex
    ReplaceString: str = "********"
    RegexBegin: str = ""
    RegexContent: str = ""

    def fields_expr(self, fields: Column) -> Column:
        v = fields.getItem(self.SourceKey)
        if self.Match == "full":
            out = F.md5(v) if self.Method == "md5" else F.lit(self.ReplaceString)
        else:
            if self.Method == "md5":
                raise ValueError(
                    "regex+md5 needs the pandas engine: use "
                    "processor_desensitize_pandas"
                )
            pat = f"({self.RegexBegin})(?:{self.RegexContent})"
            out = F.regexp_replace(v, pat, "$1" + self.ReplaceString)
        return F.when(
            v.isNotNull(),
            F.map_concat(fields, F.create_map(F.lit(self.SourceKey), out)),
        ).otherwise(fields)


@register
@dataclass
class ProcessorDesensitizePandas(PandasFieldsProcessor):
    """Exact scan-replace loop incl. Method=md5 per matched span
    (processor_desensitize.go:146-184). Per-record regex timeout
    (processor_desensitize.go:158-168) enforced via the ``regex``
    module when present: a timed-out scan leaves the remainder of the
    value unmasked, like the reference's timeout-and-alarm path."""

    TYPE: ClassVar[str] = "processor_desensitize_pandas"

    SourceKey: str = ""
    Method: str = "const"
    Match: str = "full"
    ReplaceString: str = "********"
    RegexBegin: str = ""
    RegexContent: str = ""
    TimeoutMilliSeconds: int = 100

    def make_fn(self) -> Callable[[dict], dict | None]:
        from ilogtail_spark.functions.recache import (
            HAS_REGEX_MODULE,
            match_bounded,
            pattern_may_backtrack,
            search_bounded,
        )

        src = self.SourceKey
        method = self.Method
        match = self.Match
        repl = self.ReplaceString
        begin_pat = self.RegexBegin
        content_pat = self.RegexContent
        # bounded engine only when the patterns can actually blow up
        # (the static nested-quantifier check) — it costs ~3x per scan
        timeout_sec = (
            self.TimeoutMilliSeconds / 1000.0
            if self.TimeoutMilliSeconds
            and HAS_REGEX_MODULE
            and (
                pattern_may_backtrack(begin_pat)
                or pattern_may_backtrack(content_pat)
            )
            else None
        )
        use_regex_mod = timeout_sec is not None

        def fn(d: dict) -> dict:
            val = d.get(src)
            if val is None:
                return d
            if match == "full":
                new = (
                    hashlib.md5(val.encode()).hexdigest()
                    if method == "md5"
                    else repl
                )
            else:
                begin = compile_cached(begin_pat, prefer_regex_module=use_regex_mod)
                content = compile_cached(
                    content_pat, prefer_regex_module=use_regex_mod
                )
                out = []
                pos = 0
                while pos < len(val):
                    mb = search_bounded(begin, val, pos, timeout_sec)
                    if mb is None:
                        break
                    mc = match_bounded(content, val, mb.end(), timeout_sec)
                    if mc is None:
                        out.append(val[pos : mb.end()])
                        pos = mb.end()
                        continue
                    span = val[mc.start() : mc.end()]
                    rep = (
                        hashlib.md5(span.encode()).hexdigest()
                        if method == "md5"
                        else repl
                    )
                    out.append(val[pos : mb.end()])
                    out.append(rep)
                    pos = mc.end()
                out.append(val[pos:])
                new = "".join(out)
            d = dict(d)
            d[src] = new
            return d

        return fn
