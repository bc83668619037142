"""greptimedb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of GreptimeDB (reference: GreptimeTeam/greptimedb).

Architecture (Spark-first, not a port):
- Tables are Parquet-backed DataFrames carrying GreptimeDB's semantic column
  model (tags / time index / fields, SURVEY.md §1.1) in table metadata.
- Merge semantics (last-row / last-non-null upsert, reference
  src/mito2/src/read/dedup.rs) are logical dedup views, not an LSM tree.
- The RANGE SQL extension, PromQL, the log-query DSL and flows are compiled to
  declarative DataFrame plans so Catalyst/AQE pick physical strategies.
"""

from greptimedb_spark.session import get_spark
from greptimedb_spark.catalog import Catalog, TableMeta

__version__ = "0.1.0"

__all__ = ["get_spark", "Catalog", "TableMeta", "__version__"]
