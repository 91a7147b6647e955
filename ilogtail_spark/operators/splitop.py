"""Delimiter / CSV / key-value / anchor extraction processors.

SURVEY.md §2.2. Column-expression engines wherever semantics allow
(split + element_at, str_to_map — JVM, codegen); quote-aware state
machines run as fusable pandas stages.
"""

from __future__ import annotations

import csv
import io
from dataclasses import dataclass, field as dc_field
from typing import Callable, ClassVar

from pyspark.sql import Column
from pyspark.sql import functions as F

from ilogtail_spark.model import CONTENT_KEY
from ilogtail_spark.operators.base import (
    FieldsProcessor,
    PandasFieldsProcessor,
    register,
)

PRESERVE_KEY = "_split_preserve_"


def _split_char_plain(value: str, sep: str, keys: list[str], preserve: bool) -> dict:
    """processor_split_char without quotes
    (plugins/processor/split/char/split_char.go:132-146): walk the
    value emitting a field per separator; overflow past the last key
    goes to _split_preserve_ when PreserveOthers; a final partial
    value fills the next key."""
    out: dict = {}
    key_idx = 0
    last = 0
    i = 0
    n = len(value)
    while i < n:
        if value[i] == sep:
            if key_idx < len(keys):
                out[keys[key_idx]] = value[last:i]
                key_idx += 1
                last = i + 1
                if key_idx >= len(keys) and i != n - 1:
                    if preserve:
                        out[PRESERVE_KEY] = value[i + 1 :]
                    return out
            else:
                break
        i += 1
    if key_idx < len(keys) and last < n:
        out[keys[key_idx]] = value[last:]
    return out


def _split_char_quoted(
    value: str, sep: str, quote: str, keys: list[str], preserve: bool
) -> dict | None:
    """Quote state machine (split_char.go:69-131): a quoted value ends
    at value-end or before a separator; doubled quote escapes; a quote
    followed by anything else is an error -> parse fails (None)."""
    out: dict = {}
    key_idx = 0
    last = 0
    i = 0
    n = len(value)
    while key_idx < len(keys) and i < n:
        c = value[i]
        if c == sep:
            out[keys[key_idx]] = ""
            key_idx += 1
            last = i + 1
            i += 1
        elif c == quote:
            i += 1
            buf: list[str] = []
            closed = False
            while i < n:
                if value[i] == quote:
                    if i == n - 1 or value[i + 1] == sep:
                        i += 1
                        out[keys[key_idx]] = "".join(buf)
                        key_idx += 1
                        last = i + 1
                        i += 1
                        closed = True
                        break
                    if value[i + 1] == quote:
                        i += 1
                        buf.append(value[i])
                        i += 1
                    else:
                        return None  # no continue quote -> parse error
                else:
                    buf.append(value[i])
                    i += 1
            if not closed and i >= n:
                break
        else:
            nxt = value.find(sep, i)
            if nxt >= 0:
                out[keys[key_idx]] = value[i:nxt]
                key_idx += 1
                last = nxt + 1
                i = last
            else:
                break
    if key_idx >= len(keys) and last < n and preserve:
        out[PRESERVE_KEY] = value[last:]
        last = n
    if key_idx < len(keys) and last < n:
        out[keys[key_idx]] = value[last:]
        key_idx += 1
    return out


@register
@dataclass
class ProcessorSplitChar(PandasFieldsProcessor):
    """processor_split_char (plugins/processor/split/char/split_char.go:34-160)."""

    TYPE: ClassVar[str] = "processor_split_char"

    SourceKey: str = CONTENT_KEY
    SplitSep: str = ""
    SplitKeys: list = dc_field(default_factory=list)
    Quote: str = ""
    QuoteFlag: bool = False
    PreserveOthers: bool = False
    NoKeyError: bool = False
    NoMatchError: bool = False
    KeepSource: bool = False
    KeepSourceIfParseError: bool = True

    def __post_init__(self):
        if len(self.SplitSep) != 1:
            raise ValueError("split char plugin only supports a single-char sep")
        if self.QuoteFlag and len(self.Quote) != 1:
            raise ValueError("QuoteFlag requires a single-char Quote")

    def make_fn(self) -> Callable[[dict], dict | None]:
        src = self.SourceKey
        sep = self.SplitSep
        quote = self.Quote
        quoted = self.QuoteFlag
        keys = list(self.SplitKeys)
        preserve = self.PreserveOthers
        keep_src = self.KeepSource
        keep_on_err = self.KeepSourceIfParseError

        def fn(d: dict) -> dict:
            val = d.get(src)
            if val is None:
                return d
            if not keys:
                parsed: dict | None = {PRESERVE_KEY: val} if preserve else {}
            elif quoted:
                parsed = _split_char_quoted(val, sep, quote, keys, preserve)
            else:
                parsed = _split_char_plain(val, sep, keys, preserve)
            ok = parsed is not None
            if (ok and not keep_src) or (not ok and not (keep_src or keep_on_err)):
                d = {k: v for k, v in d.items() if k != src}
            else:
                d = dict(d)
            if parsed:
                d.update(parsed)
            return d

        return fn


@register
@dataclass
class ProcessorSplitString(FieldsProcessor):
    """processor_split_string
    (plugins/processor/split/string/split_string.go:33-101): SplitN on
    a multi-char separator; overflow -> _split_preserve_ or expanded
    ``ExpandKeyPrefix{i}`` keys. Pure Column expressions
    (split/slice/element_at — JVM, codegen)."""

    TYPE: ClassVar[str] = "processor_split_string"

    SourceKey: str = CONTENT_KEY
    SplitSep: str = "\n"
    SplitKeys: list = dc_field(default_factory=list)
    PreserveOthers: bool = False
    ExpandOthers: bool = False
    ExpandKeyPrefix: str = ""
    NoKeyError: bool = False
    NoMatchError: bool = False
    KeepSource: bool = False

    def fields_expr(self, fields: Column) -> Column:
        v = fields.getItem(self.SourceKey)
        sep_lit = F.lit(self.SplitSep)
        # literal split (not regex): use split with quoted pattern
        import re as _re

        parts = F.split(v, _re.escape(self.SplitSep), -1)
        n = F.size(parts)
        keys = list(self.SplitKeys)
        kv: list[Column] = []
        for i, k in enumerate(keys):
            kv += [F.lit(k), F.try_element_at(parts, F.lit(i + 1))]
        if not keys:
            if self.PreserveOthers and not self.ExpandOthers:
                kv += [F.lit(PRESERVE_KEY), v]
        parsed = (
            F.map_filter(F.create_map(*kv), lambda k, x: x.isNotNull())
            if kv
            else F.create_map().cast("map<string,string>")
        )
        if keys and self.PreserveOthers and not self.ExpandOthers:
            # overflow = original tail after len(keys) splits (SplitN
            # with N=len+1 keeps separators inside the last chunk)
            tail = F.array_join(
                F.slice(parts, len(keys) + 1, F.greatest(n - len(keys), F.lit(0))),
                self.SplitSep,
            )
            parsed = F.when(
                n > len(keys),
                F.map_concat(parsed, F.create_map(F.lit(PRESERVE_KEY), tail)),
            ).otherwise(parsed)
        if self.ExpandOthers:
            # expanded overflow keys ExpandKeyPrefix1..k — bounded by a
            # config cap since Column maps need static width
            max_extra = 16
            extra_kv: list[Column] = []
            for j in range(1, max_extra + 1):
                extra_kv += [
                    F.lit(f"{self.ExpandKeyPrefix}{j}"),
                    F.try_element_at(parts, F.lit(len(keys) + j)),
                ]
            extras = F.map_filter(
                F.create_map(*extra_kv), lambda k, x: x.isNotNull()
            )
            parsed = F.map_concat(parsed, extras)
        base = fields
        if not self.KeepSource:
            base = F.map_filter(fields, lambda k, _: k != F.lit(self.SourceKey))
        return F.when(v.isNotNull(), F.map_concat(base, parsed)).otherwise(fields)


@register
@dataclass
class ProcessorCSV(PandasFieldsProcessor):
    """processor_csv (plugins/processor/csv/processor_csv.go:30-43):
    RFC-4180 decode of one field into SplitKeys; TrimLeadingSpace;
    overflow either kept raw under ``_decode_preserve_`` or expanded
    as ``ExpandKeyPrefix{i}``. Python csv module == Go encoding/csv
    for the RFC-4180 subset."""

    TYPE: ClassVar[str] = "processor_csv"

    SourceKey: str = CONTENT_KEY
    SplitKeys: list = dc_field(default_factory=list)
    SplitSep: str = ","
    TrimLeadingSpace: bool = False
    PreserveOthers: bool = False
    ExpandOthers: bool = False
    ExpandKeyPrefix: str = ""
    KeepSource: bool = False
    NoKeyError: bool = False

    def make_fn(self) -> Callable[[dict], dict | None]:
        src = self.SourceKey
        keys = list(self.SplitKeys)
        sep = self.SplitSep
        trim = self.TrimLeadingSpace
        preserve = self.PreserveOthers
        expand = self.ExpandOthers
        prefix = self.ExpandKeyPrefix
        keep_src = self.KeepSource

        def fn(d: dict) -> dict:
            val = d.get(src)
            if val is None:
                return d
            try:
                row = next(
                    csv.reader(
                        io.StringIO(val),
                        delimiter=sep,
                        skipinitialspace=trim,
                    ),
                    [],
                )
            except csv.Error:
                row = []
            if not keep_src:
                d = {k: v for k, v in d.items() if k != src}
            else:
                d = dict(d)
            for i, k in enumerate(keys):
                if i < len(row):
                    d[k] = row[i]
            if len(row) > len(keys):
                rest = row[len(keys) :]
                if expand:
                    for j, x in enumerate(rest):
                        d[f"{prefix}{j + 1}"] = x
                elif preserve:
                    d["_decode_preserve_"] = sep.join(rest)
            return d

        return fn


@register
@dataclass
class ProcessorParseDelimiterNative(FieldsProcessor):
    """processor_parse_delimiter_native
    (core/plugin/processor/ProcessorParseDelimiterNative.h:28-74):
    delimiter parse with overflow policy — EXTEND appends
    ``__column{i}__`` overflow keys, KEEP packs the overflow raw into
    the last key, DISCARD drops it; AllowingShortenedFields permits
    fewer columns than keys. Column-expression engine (split +
    element_at; no quoting in this fast path — quoted data goes
    through processor_csv)."""

    TYPE: ClassVar[str] = "processor_parse_delimiter_native"

    SourceKey: str = CONTENT_KEY
    Separator: str = ","
    Keys: list = dc_field(default_factory=list)
    OverflowedFieldsTreatment: str = "extend"  # extend | keep | discard
    AllowingShortenedFields: bool = True
    KeepingSourceWhenParseFail: bool = True
    KeepingSourceWhenParseSucceed: bool = False
    MaxExtendKeys: int = 16

    def fields_expr(self, fields: Column) -> Column:
        import re as _re

        v = fields.getItem(self.SourceKey)
        parts = F.split(v, _re.escape(self.Separator), -1)
        n = F.size(parts)
        keys = list(self.Keys)
        kv: list[Column] = []
        for i, k in enumerate(keys[:-1] if keys else []):
            kv += [F.lit(k), F.try_element_at(parts, F.lit(i + 1))]
        if keys:
            last = F.try_element_at(parts, F.lit(len(keys)))
            if self.OverflowedFieldsTreatment == "keep":
                tail = F.array_join(
                    F.slice(parts, len(keys), F.greatest(n - len(keys) + 1, F.lit(0))),
                    self.Separator,
                )
                last = F.when(n > len(keys), tail).otherwise(last)
            kv += [F.lit(keys[-1]), last]
        parsed = F.map_filter(F.create_map(*kv), lambda k, x: x.isNotNull())
        if self.OverflowedFieldsTreatment == "extend" and keys:
            extra_kv: list[Column] = []
            for j in range(1, self.MaxExtendKeys + 1):
                extra_kv += [
                    F.lit(f"__column{len(keys) + j - 1}__"),
                    F.try_element_at(parts, F.lit(len(keys) + j)),
                ]
            parsed = F.map_concat(
                parsed,
                F.map_filter(F.create_map(*extra_kv), lambda k, x: x.isNotNull()),
            )
        ok = v.isNotNull() & (
            (n >= len(keys)) if not self.AllowingShortenedFields else F.lit(True)
        )
        without_src = F.map_filter(fields, lambda k, _: k != F.lit(self.SourceKey))
        ok_base = fields if self.KeepingSourceWhenParseSucceed else without_src
        fail_base = fields if self.KeepingSourceWhenParseFail else without_src
        return F.when(ok, F.map_concat(ok_base, parsed)).otherwise(fail_base)


def split_key_value_plain(
    content: str,
    delimiter: str,
    separator: str,
    quote: str,
    discard_no_sep: bool,
    empty_key_prefix: str,
    no_sep_prefix: str,
) -> dict:
    """processor_split_key_value core loop
    (plugins/processor/split/keyvalue/key_value_splitter.go:98-143):
    scan delimiter-separated pairs; quote-aware pair re-scan when a
    pair opens a quote that the delimiter cut short; empty keys ->
    ``empty_key_N``; separator-less pairs -> ``no_separator_key_N``
    (or discarded); surrounding quotes stripped from values."""
    out: dict = {}
    empty_i = 0
    nosep_i = 0

    def get_value(value: str) -> str:
        lq = len(quote)
        if lq and len(value) >= 2 * lq and value.startswith(quote) and value.endswith(quote):
            return value[lq:-lq]
        return value

    while True:
        d_idx = content.find(delimiter)
        pair = content if d_idx == -1 else content[:d_idx]

        # quote-aware re-scan: the pair opened a quoted value the
        # delimiter cut short -> extend to the closing quote
        if (
            d_idx >= 0
            and quote
            and not pair.endswith(quote)
            and (pair.find(separator + quote) > 0 or pair.startswith(quote))
        ):
            close = content.find(quote, d_idx + 1)
            while close != -1 and close + 1 < len(content) and content[close + 1] == quote:
                close = content.find(quote, close + 2)
            if close >= 0:
                d_idx = close + len(quote)
                pair = content[:d_idx]

        pos = pair.find(separator)
        if pos == -1:
            if not discard_no_sep:
                out[f"{no_sep_prefix}{nosep_i}"] = get_value(pair)
                nosep_i += 1
        else:
            key = pair[:pos]
            value = get_value(pair[pos + len(separator) :])
            if not key:
                key = f"{empty_key_prefix}{empty_i}"
                empty_i += 1
            out[key] = value
        if d_idx == -1 or d_idx + len(delimiter) > len(content):
            break
        content = content[d_idx + len(delimiter) :]
    return out


@register
@dataclass
class ProcessorSplitKeyValue(PandasFieldsProcessor):
    TYPE: ClassVar[str] = "processor_split_key_value"

    SourceKey: str = CONTENT_KEY
    Delimiter: str = "\t"
    Separator: str = ":"
    KeepSource: bool = False
    EmptyKeyPrefix: str = "empty_key_"
    NoSeparatorKeyPrefix: str = "no_separator_key_"
    Quote: str = ""
    DiscardWhenSeparatorNotFound: bool = False
    ErrIfSourceKeyNotFound: bool = False
    ErrIfSeparatorNotFound: bool = False
    ErrIfKeyIsEmpty: bool = False

    def make_fn(self) -> Callable[[dict], dict | None]:
        src = self.SourceKey
        keep = self.KeepSource
        args = (
            self.Delimiter,
            self.Separator,
            self.Quote,
            self.DiscardWhenSeparatorNotFound,
            self.EmptyKeyPrefix,
            self.NoSeparatorKeyPrefix,
        )

        def fn(d: dict) -> dict:
            val = d.get(src)
            if val is None:
                return d
            if not keep:
                d = {k: v for k, v in d.items() if k != src}
            else:
                d = dict(d)
            d.update(split_key_value_plain(val, *args))
            return d

        return fn

    def as_expr(self):
        """Fast path when Quote is unset and no fallback keys can
        occur: ``str_to_map`` (JVM). Provided for plan authors who
        know their data is clean."""
        import re as _re

        v_src, delim, sep = self.SourceKey, self.Delimiter, self.Separator

        def expr(fields: Column) -> Column:
            v = fields.getItem(v_src)
            parsed = F.str_to_map(v, F.lit(_re.escape(delim)), F.lit(_re.escape(sep)))
            base = fields
            if not self.KeepSource:
                base = F.map_filter(fields, lambda k, _: k != F.lit(v_src))
            return F.when(v.isNotNull(), F.map_concat(base, parsed)).otherwise(fields)

        return expr


@register
@dataclass
class ProcessorAnchor(PandasFieldsProcessor):
    """processor_anchor (plugins/processor/anchor/anchor.go:46-67):
    per Anchors[] entry, extract the substring between Start and Stop
    (Start=="" anchors value start; Stop=="" runs to value end) into
    FieldName; FieldType json expands the extracted substring like
    processor_json (connector "_", ExpandDepth, MaxExpandDepth)."""

    TYPE: ClassVar[str] = "processor_anchor"

    SourceKey: str = CONTENT_KEY
    Anchors: list = dc_field(default_factory=list)
    NoAnchorError: bool = False
    NoKeyError: bool = False
    KeepSource: bool = True

    def make_fn(self) -> Callable[[dict], dict | None]:
        from ilogtail_spark.operators.jsonop import _loads, flatten_json

        src = self.SourceKey
        keep = self.KeepSource
        anchors = [dict(a) for a in self.Anchors]

        def fn(d: dict) -> dict:
            val = d.get(src)
            if val is None:
                return d
            if not keep:
                d = {k: v for k, v in d.items() if k != src}
            else:
                d = dict(d)
            for a in anchors:
                start = a.get("Start", "")
                stop = a.get("Stop", "")
                begin = 0
                if start:
                    i = val.find(start)
                    if i == -1:
                        continue
                    begin = i + len(start)
                if stop:
                    j = val.find(stop, begin)
                    if j == -1:
                        continue
                else:
                    j = len(val)
                sub = val[begin:j]
                name = a.get("FieldName", "")
                if a.get("FieldType") == "json":
                    try:
                        parsed = _loads(sub)
                        if isinstance(parsed, dict):
                            d.update(
                                flatten_json(
                                    parsed,
                                    max_depth=int(a.get("ExpandDepth", 0)),
                                    pre_key=name,
                                )
                            )
                            continue
                    except (ValueError, TypeError):
                        pass
                    d[name] = sub
                else:
                    d[name] = sub
            return d

        return fn
