"""connemara-spark: a PySpark-native CDC consolidation & analytics engine.

A brand-new engine with the query / data-processing capabilities of the
reference system (peopledoc/connemara — a PostgreSQL logical-replication
consolidation pipeline), re-expressed Spark-first:

- CDC event transport + parsing      -> ``connemara_spark.events``
- engine catalog (pg_catalog analog) -> ``connemara_spark.catalog``
- CDC apply (latest-wins fold+merge) -> ``connemara_spark.operators.apply``
- snapshot / basebackup analog       -> ``connemara_spark.sources.snapshot``
- DDL split/classify/rewrite         -> ``connemara_spark.ddl``
- Structured Streaming driver        -> ``connemara_spark.streaming``
- large-scale data-pipeline ops      -> ``connemara_spark.operators.{dedup,similarity,text}``

Everything is built on the public PySpark DataFrame/SQL API; no UDFs on the
hot path (higher-order functions + window/groupBy reductions only).
"""

from connemara_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
