"""Lookup enrichment — processor_dict_map / processor_geoip analogs.

The north-star "enrich" stage (BASELINE.json): attach lookup metadata
via a BROADCAST join so the 100 TB fact side never shuffles.
"""

from __future__ import annotations

import csv
from dataclasses import dataclass, field as dc_field
from typing import ClassVar

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.model import FIELDS_COL
from ilogtail_spark.operators.base import Processor, register


@register
@dataclass
class ProcessorDictMap(Processor):
    """processor_dict_map
    (plugins/processor/dictmap/processor_dict_map.go:30-41 config,
    :137-187 mode/missing handling, :95-135 CSV load).

    Exact observable semantics (quirks preserved):
      * DestKey empty or == SourceKey -> map IN PLACE; a dict hit
        always overwrites regardless of Mode (processLog returns
        straight after the in-place set).
      * distinct DestKey + dict hit: DestKey present -> Mode
        ``overwrite`` replaces it, ``fill`` keeps it; DestKey absent
        -> inserted with the mapped value.
      * source value NOT in dict -> row untouched (HandleMissing does
        NOT apply here).
      * SourceKey ABSENT + HandleMissing -> DestKey gets ``Missing``
        (subject to the same fill/overwrite rule when it exists).

    Spark mapping: a broadcast LEFT join against the dict as a 2-col
    DataFrame, then Column expressions rebuild the fields map. The
    fact side stays shuffle-free; the dim side is a broadcast hash
    relation on every executor — the scale path for dicts far past
    the reference's MaxDictSize=1000 in-process map.
    """

    TYPE: ClassVar[str] = "processor_dict_map"

    SourceKey: str = ""
    DestKey: str = ""
    MapDict: dict = dc_field(default_factory=dict)
    DictFilePath: str = ""
    HandleMissing: bool = False
    Missing: str = "Unknown"
    Mode: str = "overwrite"  # overwrite | fill
    MaxDictSize: int = 1000

    def __post_init__(self):
        if not self.SourceKey:
            raise ValueError("processor_dict_map: SourceKey required")
        if self.Mode not in ("overwrite", "fill"):
            raise ValueError(f"invalid Mode {self.Mode!r}")
        if self.DictFilePath:
            d: dict[str, str] = {}
            with open(self.DictFilePath, newline="") as fh:
                for i, row in enumerate(csv.reader(fh)):
                    if i >= self.MaxDictSize:
                        break
                    if len(row) != 2:
                        raise ValueError(f"illegal dict row {i + 1}: {row!r}")
                    if row[0] in d and d[row[0]] != row[1]:
                        raise ValueError(f"dict key redefined: {row[0]!r}")
                    d[row[0]] = row[1]
            self._dict = d
        else:
            if not self.MapDict:
                raise ValueError("processor_dict_map: need MapDict or DictFilePath")
            self._dict = {str(k): str(v) for k, v in self.MapDict.items()}
        self._in_place = not self.DestKey or self.DestKey == self.SourceKey

    def apply(self, df: DataFrame) -> DataFrame:
        from ilogtail_spark.model import event_field

        spark = df.sparkSession
        dim = spark.createDataFrame(
            list(self._dict.items()), "__dict_k__ string, __dict_v__ string"
        )
        # join key prefers the top-level mirror column (to_events keeps
        # field_cols top-level): reading fields[k] here would re-run
        # the whole upstream map construction per row
        src_val = event_field(df, self.SourceKey)
        joined = df.join(
            F.broadcast(dim), src_val == F.col("__dict_k__"), "left"
        )
        fields = F.col(FIELDS_COL)
        hit = F.col("__dict_v__").isNotNull()
        dest = self.DestKey if not self._in_place else self.SourceKey
        dest_val = fields.getItem(dest)

        if self._in_place:
            new_fields = F.when(
                src_val.isNotNull() & hit,
                F.map_concat(
                    fields, F.create_map(F.lit(dest), F.col("__dict_v__"))
                ),
            ).otherwise(fields)
        else:
            mapped = F.col("__dict_v__")
            # dict hit: overwrite always sets; fill sets only when absent
            set_on_hit = (
                F.when(dest_val.isNull(), mapped).otherwise(
                    mapped if self.Mode == "overwrite" else dest_val
                )
            )
            branch_hit = F.map_concat(
                fields, F.create_map(F.lit(dest), set_on_hit)
            )
            new_fields = F.when(src_val.isNotNull() & hit, branch_hit).otherwise(
                fields
            )
            if self.HandleMissing:
                set_on_missing = F.when(dest_val.isNull(), F.lit(self.Missing)).otherwise(
                    F.lit(self.Missing) if self.Mode == "overwrite" else dest_val
                )
                branch_missing = F.map_concat(
                    fields, F.create_map(F.lit(dest), set_on_missing)
                )
                new_fields = (
                    F.when(src_val.isNotNull() & hit, branch_hit)
                    .when(src_val.isNull(), branch_missing)
                    .otherwise(fields)
                )
        if self._in_place and self.HandleMissing:
            branch_missing = F.map_concat(
                fields, F.create_map(F.lit(dest), F.lit(self.Missing))
            )
            new_fields = (
                F.when(src_val.isNotNull() & hit, new_fields)
                .when(src_val.isNull(), branch_missing)
                .otherwise(fields)
            )
        return joined.withColumn(FIELDS_COL, new_fields).drop(
            "__dict_k__", "__dict_v__"
        )


@register
@dataclass
class ProcessorLookupJoin(Processor):
    """General broadcast-join enrich over a dimension parquet/table:
    the scale-path generalization of dict_map (and the shape of
    processor_geoip's range lookup when KeyColumn is an equality
    key). Attaches ``AttachColumns`` of the dim as fields, joined on
    fields[SourceKey] == dim[KeyColumn]."""

    TYPE: ClassVar[str] = "processor_lookup_join"

    SourceKey: str = ""
    DimPath: str = ""
    KeyColumn: str = ""
    AttachColumns: list = dc_field(default_factory=list)
    Missing: str = ""
    HandleMissing: bool = False

    def apply(self, df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        dim = spark.read.parquet(self.DimPath).select(
            F.col(self.KeyColumn).cast("string").alias("__lk_k__"),
            *[F.col(c).cast("string").alias(f"__lk_{c}__") for c in self.AttachColumns],
        )
        src_val = F.col(FIELDS_COL).getItem(self.SourceKey)
        joined = df.join(F.broadcast(dim), src_val == F.col("__lk_k__"), "left")
        kv: list[Column] = []
        for c in self.AttachColumns:
            v = F.col(f"__lk_{c}__")
            if self.HandleMissing:
                v = F.coalesce(v, F.lit(self.Missing))
            kv += [F.lit(c), v]
        attached = F.map_filter(F.create_map(*kv), lambda k, v: v.isNotNull())
        return joined.withColumn(
            FIELDS_COL, F.map_concat(F.col(FIELDS_COL), attached)
        ).drop("__lk_k__", *[f"__lk_{c}__" for c in self.AttachColumns])
