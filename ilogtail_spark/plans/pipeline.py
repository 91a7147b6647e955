"""Pipeline compiler: ordered processor configs -> one DataFrame plan.

The reference runs a config's processors sequentially over each
batch (CollectionPipeline.cpp:419-451; plugin_runner_v1.go:240-263).
Here the "run" is plan construction: every expression stage becomes a
Column projection (Catalyst collapses adjacent projections — free
fusion + whole-stage codegen), and consecutive pandas stages are
fused into ONE Arrow round-trip so the chain costs a single
serialize/deserialize no matter how many python processors it holds
(the analog of the zero-copy in-batch chain the C++ core gets from
its StringView arena, core/models/PipelineEventGroup.h:82-84).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.model import FIELDS_COL, FIELDS_TYPE
from ilogtail_spark.operators.base import (
    PandasFieldsProcessor,
    Processor,
    build,
)

RowFn = Callable[[dict], "dict | None"]


def _as_dict(v) -> dict | None:
    """Arrow MapType arrives in pandas as list[(k, v)] (or dict with
    some pyarrow configs); normalize."""
    if v is None:
        return None
    if isinstance(v, dict):
        return dict(v)
    return dict(v)


def fuse(fns: list[RowFn]) -> RowFn:
    if len(fns) == 1:
        return fns[0]

    def chained(d: dict) -> dict | None:
        for fn in fns:
            d = fn(d)
            if d is None:
                return None
        return d

    return chained


def apply_pandas_chain(df: DataFrame, fns: list[RowFn]) -> DataFrame:
    """Run fused python processors over the fields map in one Arrow
    pass. A stage returning None drops the event (a processor may
    empty the batch, plugin_runner_v1.go:260-263) — encoded as a null
    map then filtered.
    """
    chained = fuse(fns)

    @F.pandas_udf(FIELDS_TYPE)
    def _chain(s: pd.Series) -> pd.Series:
        out = []
        for v in s:
            d = _as_dict(v)
            out.append(None if d is None else chained(d))
        return pd.Series(out, dtype=object)

    df = df.withColumn(FIELDS_COL, _chain(F.col(FIELDS_COL)))
    return df.filter(F.col(FIELDS_COL).isNotNull())


def compile_processors(
    configs: Iterable[dict | Processor],
    stage_observer: "StageObserver | None" = None,
) -> Callable[[DataFrame], DataFrame]:
    """Compile an ordered processor list into a single df->df stage.

    Consecutive PandasFieldsProcessors are fused; everything else is
    applied in order (expression stages collapse under Catalyst).

    ``stage_observer`` inserts a ``df.observe`` count after every
    row-count-changing stage (filters, explodes, merges) — the
    self-monitor in/out/discarded counters
    (pkg/selfmonitor/metrics_constants_plugin.go:38-41) collected for
    free when the sink action runs, no extra pass.
    """
    procs: list[Processor] = [
        p if isinstance(p, Processor) else build(p) for p in configs
    ]

    def run(df: DataFrame) -> DataFrame:
        pending: list[RowFn] = []

        def flush(d: DataFrame) -> DataFrame:
            nonlocal pending
            if pending:
                d = apply_pandas_chain(d, pending)
                pending = []
                if stage_observer is not None:
                    d = stage_observer.observe(d, "pandas_chain")
            return d

        if stage_observer is not None:
            df = stage_observer.observe(df, "input")
        for p in procs:
            if isinstance(p, PandasFieldsProcessor):
                pending.append(p.make_fn())
            else:
                df = flush(df)
                df = p.apply(df)
                if stage_observer is not None and p.CHANGES_CARDINALITY:
                    df = stage_observer.observe(df, p.TYPE)
        return flush(df)

    return run


class StageObserver:
    """Collects per-stage row counters via ``df.observe`` — the
    metrics materialize when the FIRST action on the observed frame
    completes; ``collect()`` then returns
    ``{stage: {"out_events_total": n, "discarded_events_total": d}}``
    with discards derived from consecutive counts."""

    def __init__(self) -> None:
        from pyspark.sql import Observation

        self._obs: list[tuple[str, Observation]] = []
        self._Observation = Observation

    def observe(self, df: DataFrame, stage: str) -> DataFrame:
        ob = self._Observation()
        name = f"{stage}#{len(self._obs)}"
        self._obs.append((name, ob))
        return df.observe(ob, F.count(F.lit(1)).alias("n"))

    def collect(self) -> dict:
        out: dict = {}
        prev: int | None = None
        for name, ob in self._obs:
            n = ob.get["n"]
            entry = {"out_events_total": n}
            if prev is not None:
                entry["discarded_events_total"] = prev - n
            out[name] = entry
            prev = n
        return out


@dataclass
class Pipeline:
    """A full collection pipeline: processors -> router -> sinks.

    Mirrors the reference's YAML surface:
        processors: [{Type: processor_regex, ...}, ...]
        router:     {Mode: first_match|multicast, ...}
        flushers:   [{Name: sink_a, Match: ..., ...}, ...]
    """

    processors: list = dc_field(default_factory=list)
    router: dict | None = None
    flushers: list = dc_field(default_factory=list)

    def transform(
        self, df: DataFrame, stage_observer: StageObserver | None = None
    ) -> DataFrame:
        return compile_processors(self.processors, stage_observer)(df)

    def route(self, df: DataFrame, stage_observer: StageObserver | None = None):
        from ilogtail_spark.plans.router import route

        df = self.transform(df, stage_observer)
        routed = route(df, self.router or {}, self.flushers)
        if stage_observer is not None:
            routed = stage_observer.observe(routed, "router")
        return routed
