"""Physical-plan regression guards: the load-bearing properties from
tools/explain_audit.py asserted in pytest so a plan regression fails
the suite, not just the manually-run audit."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_shuffles(plan: str) -> int:
    return len(re.findall(r"(?<!Broadcast)Exchange \(\d+\)", plan))


def test_enrich_is_broadcast_join(spark):
    from ilogtail_spark.entryq import QUERIES

    p = formatted(QUERIES["dict_map_enrich"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_routed_pipeline_shuffle_free(spark):
    from ilogtail_spark.benchflow import enriched_pipeline
    from ilogtail_spark.model import to_events

    ev = to_events(
        spark.read.parquet(f"{SF_DIR}/events.parquet").withColumnRenamed(
            "props", "text"
        )
    )
    p = formatted(enriched_pipeline().route(ev))
    assert n_shuffles(p) == 0, "parse->enrich->route must not shuffle"


def test_lsh_bucket_plan_constant_in_dim(spark):
    from ilogtail_spark.dataops import similarity

    df = spark.createDataFrame(
        [(0, [1.0] * 512)], "vec_id long, embedding array<float>"
    )
    q = similarity.lsh_bucket(df, dim=512, num_planes=16)
    opt = q._jdf.queryExecution().optimizedPlan().toString()
    assert len(opt) < 120_000, "plane matrix must fold to one literal"
    assert "[511]" not in opt, "no unrolled per-component expressions"


def test_simhash_two_aggregates_only(spark):
    from ilogtail_spark.dataops import dedup

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    opt = (
        dedup.simhash_expr(docs, nbits=64)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert opt.count("aggregate(") == 2, "one vote pass + one reduction"


def test_neardup_join_is_equi_not_nested_loop(spark):
    from ilogtail_spark.dataops import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    p = formatted(similarity.embedding_neardup_pairs(emb, dim=64, threshold=0.3))
    assert "NestedLoop" not in p
    assert "HashJoin" in p or "SortMergeJoin" in p


def test_filter_pushdown_reaches_scan(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    p = formatted(ev.filter(F.col("event_type") == "error").select("event_id"))
    assert "PushedFilters" in p
    assert "event_type" in p.split("PushedFilters")[1][:200]
