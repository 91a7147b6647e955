"""Multi-pipeline execution over ONE input scan — the reference
agent's core operating mode re-expressed for Spark.

iLogtail runs MANY collection configs in one process; an input can
feed several pipelines at once (pluginmanager/plugin_manager.go
LogstoreConfigs map; core/collection_pipeline/CollectionPipelineManager.h
keeps a name->pipeline map and dispatches every event group to each
matching pipeline). The naive Spark translation — one job per config
— re-reads the source M times: at 100 TB that is M full scans.

Here the scan is paid ONCE: the (projected) input is persisted, every
pipeline transforms the SAME cached relation (processor chains differ
per config, including cardinality-changing ones — each branch is an
independent plan over the in-memory relation), each branch is tagged
with its config name, and the tagged branches union into ONE write
partitioned by (config, sink). Storage level defaults to
MEMORY_AND_DISK so a cache partition that doesn't fit spills instead
of silently re-scanning parquet (re-scan is exactly what this module
exists to avoid; at cluster scale size executor storage memory for
the projected input, not the raw table) — ``run_pipelines``'s
``storage_level`` parameter picks DISK_ONLY / serialized residence or
opts out of the persist entirely (M re-scans) when a second on-disk
copy of the input is the wrong trade.

Plan shape (asserted in PLANS.md): ONE parquet scan (the cache
materialization), M InMemoryTableScan branches, zero extra shuffles
beyond what each pipeline itself plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.plans.pipeline import Pipeline

# reserved internal name, same convention as router.SINK_COL — a data
# column literally named "config" must never collide with the tag
CONFIG_COL = "__config__"


def run_pipelines(
    events: DataFrame,
    pipelines: dict[str, Pipeline],
    storage_level: str | None = "MEMORY_AND_DISK",
) -> DataFrame:
    """Route ``events`` through every named pipeline over one scan.

    Returns the union of all routed frames with a ``config`` column
    (the pipeline name) prepended — write it once with
    ``partitionBy(config, sink)`` for the per-(config, sink) layout,
    or aggregate per (config, sink) for routed-row counters. Column
    sets may differ per pipeline (processors add fields); the union
    is by name with missing columns NULL-filled.

    ``storage_level`` picks the one-scan mechanism's cost point — the
    100 TB tradeoff is persist-once vs M re-scans:

    - ``"MEMORY_AND_DISK"`` (default): the input is persisted and
      every branch reads the cached relation; a partition that does
      not fit executor memory spills. At full-table scale this is
      effectively a second on-disk copy of the (projected) input —
      size storage for the projection, not the raw table.
    - ``"DISK_ONLY"`` / ``"MEMORY_ONLY"`` / any
      ``pyspark.StorageLevel`` attribute name: same mechanism, chosen
      residence (``DISK_ONLY`` when executor memory is the scarce
      resource and one serialized disk copy beats M scans).
    - ``None``: no persist at all — each of the M pipelines re-scans
      the source. Correct answers, M scan costs; the right choice
      only when the source scan is cheaper than materializing a copy
      (heavily pruned scans, tiny M, or no spare disk).

    When persisting, the persisted frame IS the ``events`` object
    passed in (even when a reserved ``__config__`` column has to be
    dropped — the drop is a projection OVER the cached relation), so
    the documented release contract ``events.unpersist()`` always
    targets the live cache entry.
    """
    if not pipelines:
        raise ValueError("run_pipelines requires at least one pipeline")
    if storage_level is not None:
        from pyspark import StorageLevel

        if isinstance(storage_level, str):
            resolved = getattr(StorageLevel, storage_level, None)
            # class attrs that aren't levels (methods, dunders) must
            # fail HERE with the descriptive message, not later inside
            # persist() with an opaque Py4J error
            if not isinstance(resolved, StorageLevel):
                raise ValueError(
                    f"unknown storage_level {storage_level!r}: expected a "
                    "pyspark.StorageLevel attribute name (MEMORY_AND_DISK, "
                    "DISK_ONLY, ...) or None for no persist"
                )
            storage_level = resolved
        events = events.persist(storage_level)
    # __config__ is reserved: an input column by that name would make
    # every later reference ambiguous (AMBIGUOUS_REFERENCE at analysis).
    # Dropped AFTER the persist so the cached plan is the caller's
    # frame and the projection still hits the cache.
    base = events.drop(CONFIG_COL) if CONFIG_COL in events.columns else events
    branches = []
    for name, pipe in pipelines.items():
        routed = pipe.route(base)
        branches.append(
            routed.select(F.lit(name).alias(CONFIG_COL), "*")
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b, allowMissingColumns=True)
    return out


def _resolve_sink_col(df: DataFrame) -> str:
    from ilogtail_spark.plans.router import SINK_COL

    return "sink" if "sink" in df.columns else SINK_COL


def sink_counts(multi_routed: DataFrame) -> dict[tuple[str, str], int]:
    """Per-(config, sink) routed-row counts — the multi-config analog
    of the reference's per-logstore counters (one aggregate job).
    Accepts the internal frame (``__sink__``) or the storage-boundary
    renamed one (``sink``)."""
    sink_col = _resolve_sink_col(multi_routed)
    rows = (
        multi_routed.groupBy(CONFIG_COL, sink_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {(r[CONFIG_COL], r[sink_col]): r["n"] for r in rows}
