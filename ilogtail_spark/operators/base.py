"""Processor protocol + registry.

The reference registers plugins in global registries keyed by type
name (``pipeline.Processors["processor_regex"] = ...``,
plugins/processor/regex/regex.go:131-139); a pipeline config is an
ordered list of ``{Type: ..., <params>}`` dicts. We mirror that:
``build({"Type": "processor_regex", "Regex": ...})`` returns a
Processor whose ``apply(df)`` is a DataFrame->DataFrame stage.

Three execution flavors:

* ``FieldsProcessor`` — pure Column expression over the ``fields``
  map (JVM-side, whole-stage codegen; chained withColumns collapse
  into a single projection under Catalyst — the free fusion path).
* ``FilterProcessor`` — a boolean Column; ``apply`` = ``df.filter``.
  Emitted as early as config order allows so Catalyst can push it.
* ``PandasFieldsProcessor`` — a python ``dict -> dict | None``
  transform for semantics Column exprs can't express (grok pattern
  loops, dynamic JSON flatten, quote-aware splitting). The pipeline
  compiler FUSES consecutive pandas stages into ONE Arrow pass
  (see plans/pipeline.py) so a chain of N python stages costs one
  serialization round-trip, the analog of the reference running the
  whole processor chain over a batch in one thread
  (pluginmanager/plugin_runner_v1.go:240-263).
"""

from __future__ import annotations

from dataclasses import dataclass, fields as dc_fields
from typing import Callable, ClassVar

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.model import FIELDS_COL

PROCESSORS: dict[str, type["Processor"]] = {}


def register(cls: type["Processor"]) -> type["Processor"]:
    PROCESSORS[cls.TYPE] = cls
    return cls


def build(config: dict) -> "Processor":
    cfg = dict(config)
    type_name = cfg.pop("Type")
    try:
        cls = PROCESSORS[type_name]
    except KeyError:
        raise ValueError(f"unknown processor type: {type_name!r}") from None
    known = {f.name for f in dc_fields(cls)}
    unknown = set(cfg) - known
    if unknown:
        raise ValueError(f"{type_name}: unknown config keys {sorted(unknown)}")
    return cls(**cfg)


@dataclass
class Processor:
    TYPE: ClassVar[str] = ""
    # True when apply() can change the row count (filters, explodes,
    # merges) — drives where the self-monitor stage counters observe
    CHANGES_CARDINALITY: ClassVar[bool] = False

    def apply(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError


@dataclass
class FieldsProcessor(Processor):
    """Map-only transform expressible as a Column expression."""

    def fields_expr(self, fields: Column) -> Column:
        raise NotImplementedError

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumn(FIELDS_COL, self.fields_expr(F.col(FIELDS_COL)))


@dataclass
class FilterProcessor(Processor):
    """Row predicate; apply == df.filter(predicate)."""

    CHANGES_CARDINALITY: ClassVar[bool] = True

    def predicate(self, fields: Column) -> Column:
        raise NotImplementedError

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(self.predicate(F.col(FIELDS_COL)))


@dataclass
class PandasFieldsProcessor(Processor):
    """Python transform over the fields dict. ``make_fn`` must return
    a PICKLABLE closure (no SparkSession/DataFrame captures); heavy
    state (compiled regexes) is built lazily inside via module-level
    caches keyed by pattern text, so each executor compiles once and
    reuses across Arrow batches — the analog of compile-at-Init
    (plugins/processor/regex/regex.go:57).
    """

    def make_fn(self) -> Callable[[dict], dict | None]:
        raise NotImplementedError

    def apply(self, df: DataFrame) -> DataFrame:
        from ilogtail_spark.plans.pipeline import apply_pandas_chain

        return apply_pandas_chain(df, [self.make_fn()])
