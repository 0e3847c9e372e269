"""mini_feature_store_spark — a PySpark-native feature-store analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``Wendyddw/mini-feature-store`` (batch feature backfill, leakage-safe
point-in-time join, online snapshot sync) as an idiomatic PySpark library,
plus large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Design rules (see SURVEY.md §4):
- DataFrame/SQL only; the logical plan is declared, Catalyst plans physically.
- No driver-side collect() in any pipeline hot path.
- Every operator is written for a 1000-executor / 100 TB cluster and merely
  *tested* on local mode: broadcast small sides, one shuffle per logical
  repartition, range-frame windows instead of fan-out joins.
"""

__version__ = "0.1.0"

from mini_feature_store_spark.session import get_spark  # noqa: F401
