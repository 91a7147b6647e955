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


# Round-5 rotation (the driver samples the FIRST 50 in dict order).
# Priority: (1) the ten queries ADDED in round 5's final session
# (log templates, rare templates, type/role transitions, response
# latency, language mix, streaming new-template detector, KMV
# distinct, active users, refusal report) — never driver-checked;
# (2) earlier round-5 additions and code-touched queries;
# (3) the r02-latest batch — keeps every query's external record
# <= 2 rounds old; (4) r04-unsampled (r03-latest) queries until the
# cut is full. Everything past the front-50 cut (including the ten
# r03-latest fills the new queries displaced) stays covered by
# tools/correctness_mirror.py.
_FRONT = [
    # round-5 new queries first (never driver-checked), then the
    # r04-unsampled rotation ordered oldest-driver-check first
    "events_mttr", "conv_markdown_census",
    "events_changepoints", "events_diversity",
    "retrieval_ndcg", "events_l_diversity",
    "streaming_outage_windows", "events_apdex", "events_exp_histogram",
    "events_mad_outliers", "conv_turn_balance", "dedup_bloom_audit",
    "events_funnel_latency", "corpus_source_overlap",
    "plans_zorder_audit", "events_attribution", "events_gap_histogram",
    "corpus_vocab_growth", "dedup_cluster_reps", "events_user_lifetime",
    "events_retry_storms", "events_key_census",
    "conv_rephrase", "conv_loss_mask",
    "conv_resolution", "corpus_novelty",
    "events_top_users", "events_trend",
    "streaming_retry_storms", "events_enrich_miss",
    "events_k_anonymity", "corpus_license_scan",
    "events_slo_burn", "conv_system_prompts",
    "events_seasonal_profile", "events_first_seen",
    "events_cooccurrence", "events_burstiness",
    "text_script_mix", "conv_cost_report", "conv_branching",
    "corpus_packing_efficiency",
    "conv_echo_stats", "conv_truncated", "conv_faq_topk",
    "events_concentration",
    "conv_tool_loops", "conv_abandoned", "events_outage_windows",
    "corpus_canary_scan",
    "conv_tool_chains", "conv_repeated_responses", "corpus_split_leakage",
    "dedup_minhash_calibration", "corpus_snapshot_drift",
    "conv_context_overflow", "events_profile_diff", "retrieval_eval_at_k",
    "conv_response_dedup", "conv_position_stats", "events_quantile_drift",
    "corpus_dup_rate", "sim_hard_negatives", "conv_flow_shapes",
    "dedup_normalized", "corpus_lang_mix", "conv_identity_leaks",
    "events_template_drift", "conv_preference_pairs",
    "text_lexical_diversity", "text_winnow_fingerprints",
    "corpus_collocations", "corpus_cross_source_dups",
    "conv_latency_quantiles",
    "conv_prefix_report", "text_encoding_flags", "text_readability",
    "events_column_profile", "dedup_cluster_histogram",
    "corpus_length_histogram",
    "events_log_templates", "events_rare_templates",
    "events_type_transitions", "conv_role_transitions",
    "conv_response_latency", "conv_lang_mix", "streaming_new_templates",
    "events_kmv_distinct", "events_active_users", "conv_refusal_stats",
    "conv_tool_stats", "conv_prep_report",
    "events_sliding_distinct", "corpus_distinctive_terms",
    "conv_dedup", "conv_near_pairs", "conv_window_trim",
    "conv_role_stats", "conv_pack_shards", "events_error_context",
    "events_sliding_counts", "conv_quality_gate",
    "conv_repeated_turns", "conv_pii_report",
    "conv_integrity_report", "conv_sft_pairs",
    "corpus_split_assign", "corpus_snapshot_diff",
    "sim_cosine_topk_quantized", "corpus_source_quota",
    "events_value_quantiles", "retrieval_hybrid_rrf",
    "corpus_prep_report", "corpus_line_dedup", "events_funnel",
    "events_cohort_retention", "corpus_token_quantiles",
    "events_rate_spikes", "corpus_length_outliers",
    "streaming_rate_spikes", "events_gapfill_hourly",
    # text_quality code changed this round (passthrough param)
    "text_quality",
    "dedup_minhash_incremental", "corpus_mixture_rebalance",
    "text_pii_redact", "events_hotkeys",
    "corpus_decontaminate_filter", "sim_cluster_report",
    "corpus_chunk_dedup",
    "dedup_semantic", "sim_ann_lsh_topk", "multi_pipeline_counts",
    "dedup_minhash_sig", "dedup_minhash_pairs", "dedup_jaccard",
    "dedup_exact_keep", "dedup_cluster_ids", "dedup_near_filter",
    "sim_cosine_topk", "sim_ann_multiprobe", "sim_ann_ivf_topk",
    "dedup_embedding_cosine", "sim_lsh_buckets",
    "text_token_stats", "text_lang_id",
    "text_pii_flags", "text_fingerprint", "multimodal_features",
    "dedup_embedding_banded", "text_drop_boilerplate", "text_vocab_topk",
    "multimodal_frames", "multimodal_resize",
    "corpus_decontaminate", "corpus_dup_windows", "corpus_quality_sample",
    "corpus_importance_scores", "url_normalize", "url_dedup_filter",
    "sessionize_events", "session_stats", "dedup_incremental",
    "text_unigram_lm", "corpus_span_removal", "streaming_sessionize",
    "corpus_badwords_filter", "corpus_mixture_report", "text_gopher_flags",
    "salted_skew_join", "split_char_quoted", "anchor_extract",
    "transform_drop_b64", "string_replace_unquote", "filter_key_regex",
    "aggregators_pack_tags", "aggregator_otel_route",
    "aggregator_skywalking_route",
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
