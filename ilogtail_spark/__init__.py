"""ilogtail_spark — a PySpark-native log/telemetry pipeline engine.

A from-scratch reimplementation of the analytics capabilities of
iLogtail/LoongCollector (reference: sunym1991/ilogtail) as idiomatic
Spark DataFrame stages:

    sources -> processors (parse/transform/filter) -> router -> sinks
                                                   -> per-sink aggregates
                                                   -> lineage/metrics

Design notes
------------
* The unit of data is a DataFrame row = one pipeline event (one
  conversation turn, one log line).  Event content lives in a
  ``fields: map<string,string>`` column — the exact analog of the
  reference's ``Log.Contents`` open key->value map
  (pkg/models/logs.go:19-32); the raw payload is under the reserved
  key ``content`` (pkg/models/common.go:40-41).
* Identity / ordering / partitioning columns (``conv_id``,
  ``turn_idx``, ``ts``) stay top-level so Catalyst can prune, push
  down, and shuffle on real columns.
* Processors compile to Column expressions (JVM-side, whole-stage
  codegen) wherever the semantics allow; pandas/Arrow UDFs are used
  only where they genuinely cannot (grok multi-pattern loops, dynamic
  JSON flatten, quote-aware splitting) and consecutive Python stages
  are fused into a single Arrow pass.
"""

from ilogtail_spark.session import get_spark  # noqa: F401
from ilogtail_spark.plans.pipeline import Pipeline, compile_processors  # noqa: F401

__version__ = "0.1.0"
