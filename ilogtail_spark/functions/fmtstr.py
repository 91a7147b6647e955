"""Dynamic sink-name format strings (pkg/fmtstr/format_topic.go).

The reference lets flushers compute per-record topics/indices from
fields and tags: ``"app-%{content.service}"``, ``"%{tag.__hostname__}"``,
``"${ENV_VAR}"`` (kafka flusher_kafka_v2.go:233-245, ES dynamic index
flusher_elasticsearch.go:155-174).

Spark mapping: compile the format string ONCE on the driver into a
``concat`` Column expression; env vars resolve at plan-build time.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from ilogtail_spark.model import FIELDS_COL, TAGS_COL

_TOKEN = re.compile(r"%\{(content|tag|field)\.([^}]+)\}|\$\{(\w+)\}")


def compile_fmtstr(fmt: str) -> Column:
    parts: list[Column] = []
    pos = 0
    for m in _TOKEN.finditer(fmt):
        if m.start() > pos:
            parts.append(F.lit(fmt[pos : m.start()]))
        if m.group(3) is not None:  # ${ENV}
            parts.append(F.lit(os.environ.get(m.group(3), "")))
        else:
            kind, key = m.group(1), m.group(2)
            col = (
                F.col(TAGS_COL).getItem(key)
                if kind == "tag"
                else F.col(FIELDS_COL).getItem(key)
            )
            parts.append(F.coalesce(col, F.lit("")))
        pos = m.end()
    if pos < len(fmt):
        parts.append(F.lit(fmt[pos:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts) if len(parts) > 1 else parts[0]
