"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``ilogtail_spark.entryq`` (query registry) — one
``queries()`` entry per implemented operator from SURVEY.md §2, each
with a DuckDB oracle in ``oracle_sql()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ilogtail_spark.entryq import entry_query

    return entry_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import ilogtail_spark.entryq_data  # noqa: F401 — registers dataops queries
    import ilogtail_spark.entryq_ops  # noqa: F401 — registers operator-coverage queries
    from ilogtail_spark.entryq import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    import ilogtail_spark.entryq_data  # noqa: F401
    import ilogtail_spark.entryq_ops  # noqa: F401
    from ilogtail_spark.entryq import ORACLES

    return dict(ORACLES)
