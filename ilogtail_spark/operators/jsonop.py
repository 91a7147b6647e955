"""processor_json — dynamic JSON flatten into the fields map.

Reference: plugins/processor/json/processor_json.go
  * config :29-42 + defaults :104-117 (ExpandConnector="_",
    KeepSource=true, KeepSourceIfParseError=true, ExpandDepth=0 =
    unlimited);
  * flatten callbacks :141-201 — objects recurse building
    ``preKey + connector + key`` (connector OMITTED at depth 1 only
    when IgnoreFirstConnector; with the default empty preKey this
    yields a LEADING connector, faithfully kept); arrays expand to
    ``key[i]`` only when ExpandArray, else serialize raw; at max
    depth substructures serialize raw; Prefix prepends to every
    emitted key; UseSourceKeyAsPrefix seeds preKey with SourceKey.

Spark mapping: the schema is dynamic per record, so ``from_json``
(fixed schema) can't express it — this is a fusable pandas stage.
For known-shape JSON prefer ``processor_json_expr`` below
(``get_json_object`` -> JVM-side, codegen).

Divergence (documented): un-expanded substructures are re-serialized
compactly (``json.dumps`` separators ``(',', ':')``), so inputs with
non-compact whitespace normalize; the reference slices the original
byte span.
"""

from __future__ import annotations

import json
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


class _RawNum(str):
    """Numeric token kept as its original text (the reference slices
    raw bytes, so 5.0 must stay "5.0")."""


def _loads(text: str):
    return json.loads(text, parse_int=_RawNum, parse_float=_RawNum)


def _ser(v) -> str:
    """Compact serialize preserving raw numeric tokens."""
    if isinstance(v, _RawNum):
        return str(v)
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if v is True:
        return "true"
    if v is False:
        return "false"
    if v is None:
        return "null"
    if isinstance(v, dict):
        return "{" + ",".join(f"{json.dumps(k, ensure_ascii=False)}:{_ser(x)}" for k, x in v.items()) + "}"
    if isinstance(v, list):
        return "[" + ",".join(_ser(x) for x in v) + "]"
    return str(v)


def _dump(v) -> str:
    """Scalar/leaf emission: strings unquoted, substructures compact."""
    if isinstance(v, _RawNum):
        return str(v)
    if isinstance(v, str):
        return v
    if v is True:
        return "true"
    if v is False:
        return "false"
    if v is None:
        return "null"
    return _ser(v)


def flatten_json(
    obj: dict,
    connector: str = "_",
    max_depth: int = 0,
    prefix: str = "",
    pre_key: str = "",
    ignore_first_connector: bool = False,
    expand_array: bool = False,
) -> dict:
    """Iterative port of the flatten semantics above; returns the
    emitted (key -> string value) pairs."""
    out: dict = {}

    def conn(depth: int) -> str:
        if depth == 1 and ignore_first_connector:
            return ""
        return connector

    def walk(value, key: str, pre: str, depth: int):
        new_key = pre + conn(depth) + key
        if isinstance(value, dict):
            if depth == max_depth:
                out[prefix + new_key] = _dump(value)
                return
            for k, v in value.items():
                walk(v, k, new_key, depth + 1)
        elif isinstance(value, list):
            if not expand_array or depth == max_depth:
                out[prefix + new_key] = _dump(value)
                return
            for i, v in enumerate(value):
                # arrays re-enter at the SAME depth with key[i]
                # (flattenArray builds newKey then delegates)
                if isinstance(v, dict):
                    walk(v, f"{key}[{i}]", pre, depth)
                else:
                    out[prefix + pre + conn(depth) + f"{key}[{i}]"] = _dump(v)
        else:
            out[prefix + new_key] = _dump(value)

    for k, v in obj.items():
        walk(v, k, pre_key, 1)
    return out


@register
@dataclass
class ProcessorJSON(PandasFieldsProcessor):
    TYPE: ClassVar[str] = "processor_json"

    SourceKey: str = CONTENT_KEY
    NoKeyError: bool = True
    ExpandDepth: int = 0
    ExpandConnector: str = "_"
    Prefix: str = ""
    KeepSource: bool = True
    KeepSourceIfParseError: bool = True
    UseSourceKeyAsPrefix: bool = False
    IgnoreFirstConnector: bool = False
    ExpandArray: bool = False

    def make_fn(self) -> Callable[[dict], dict | None]:
        src = self.SourceKey
        keep = self.KeepSource
        keep_on_err = self.KeepSourceIfParseError
        kw = dict(
            connector=self.ExpandConnector,
            max_depth=self.ExpandDepth,
            prefix=self.Prefix,
            ignore_first_connector=self.IgnoreFirstConnector,
            expand_array=self.ExpandArray,
        )
        use_src_prefix = self.UseSourceKeyAsPrefix

        def fn(d: dict) -> dict:
            val = d.get(src)
            if val is None:
                return d
            parsed = None
            err = False
            try:
                parsed = _loads(val)
                if not isinstance(parsed, dict):
                    err = True
            except (ValueError, TypeError):
                err = True
            if not (keep or (keep_on_err and err)):
                d = {k: v for k, v in d.items() if k != src}
            else:
                d = dict(d)
            if not err:
                d.update(
                    flatten_json(parsed, pre_key=src if use_src_prefix else "", **kw)
                )
            return d

        return fn


@register
@dataclass
class ProcessorJSONExpr(FieldsProcessor):
    """Fast path for KNOWN key paths: ``Paths`` maps output key ->
    JSONPath (``$.a.b``); compiles to ``get_json_object`` Column
    expressions (JVM, codegen) — use when the JSON shape is stable,
    the 100 TB-scan-friendly variant of processor_json."""

    TYPE: ClassVar[str] = "processor_json_expr"

    SourceKey: str = CONTENT_KEY
    Paths: dict = dc_field(default_factory=dict)
    KeepSource: bool = True

    def fields_expr(self, fields: Column) -> Column:
        v = fields.getItem(self.SourceKey)
        kv: list[Column] = []
        for out_key, path in self.Paths.items():
            kv += [F.lit(out_key), F.get_json_object(v, path)]
        parsed = F.map_filter(F.create_map(*kv), lambda k, x: x.isNotNull())
        base = fields
        if not self.KeepSource:
            base = F.map_filter(fields, lambda k, _: k != F.lit(self.SourceKey))
        return F.map_concat(base, parsed)
