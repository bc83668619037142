"""PromQL on Spark: parser + DataFrame-pipeline evaluator.

The reference plans PromQL via custom DataFusion extension nodes
(src/query/src/promql/planner.rs + src/promql/src/extension_plan/); here the
same semantics compile to declarative DataFrame plans: step-grid explosion,
single-shuffle grouped aggregates, and label joins (SURVEY.md §2.9).
"""

from greptimedb_spark.promql.parser import parse_promql
from greptimedb_spark.promql.engine import PromQLEngine, MetricTable

__all__ = ["parse_promql", "PromQLEngine", "MetricTable"]
