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


# Round-4 rotation (the driver samples the FIRST 50 in dict order).
# Priority: (1) the 5 queries never driver-checked in any round
# (mirror-green r01-r03); (2) queries whose code or output changed
# this round (bm25 micro-quantization, simhash nbits=64 default,
# repetition NULL guard, prefix-sum broadcast offsets, prom out-col
# aliasing, similarity cache keying, bucket-db lifecycle) plus the
# five NEW round-4 queries (asof_prior_error_daily, sessionize_daily,
# corpus_chunk_windows, multi_pipeline_counts, dedup_semantic);
# (3) r03-unsampled queries in registration order (driver-green in
# r01/r02, mirror-green r03) until the cut is full. Everything out of
# the cut stays covered by tools/correctness_mirror.py.
_FRONT = [
    "desensitize_md5_span", "fmtstr_topic", "otel_trace",
    "parse_timestamp_tz", "split_string_expand",
    "retrieval_bm25_topk", "dedup_simhash", "dedup_simhash_candidates",
    "text_repetition", "corpus_pack_shards",
    "asof_prior_error", "asof_prior_error_daily", "sessionize_daily",
    "corpus_chunk_windows", "multi_pipeline_counts", "dedup_semantic",
    "prom_parse_metrics", "prom_relabel_chain",
    "sim_ann_lsh_topk", "bucketed_colocated_join",
    "regex_parse", "filter_regex", "filter_condition_tree",
    "router_first_match", "router_multicast",
    "transform_fields", "fields_with_condition",
    "rate_limit", "desensitize", "e2e_sink_hourly_counts",
    "grok_parse", "json_flatten",
    "split_csv", "split_key_value", "split_delimiter",
    "strptime_time", "gotime_reformat",
    "dict_map_enrich", "lookup_join_enrich", "transform_pack_append",
    "split_log_string", "merge_multiline", "log_to_metric",
    "skew_salted_count", "encrypt_roundtrip", "apsara_parse",
    "geoip_enrich", "otel_metric", "sls_record_format",
    "dedup_exact",
]


def _ordered(d: dict) -> dict:
    front = {k: d[k] for k in _FRONT if k in d}
    return {**front, **{k: v for k, v in d.items() if k not in front}}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import ilogtail_spark.entryq_data  # noqa: F401 — registers dataops queries
    import ilogtail_spark.entryq_ops  # noqa: F401 — registers operator-coverage queries
    from ilogtail_spark.entryq import QUERIES

    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    import ilogtail_spark.entryq_data  # noqa: F401
    import ilogtail_spark.entryq_ops  # noqa: F401
    from ilogtail_spark.entryq import ORACLES

    return dict(ORACLES)
