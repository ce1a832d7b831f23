"""Sources: snapshot bootstrap (basebackup analog), JDBC parallel scan."""

from connemara_spark.sources.snapshot import (
    restore_schema_script,
    snapshot_from_jdbc,
    snapshot_from_parquet,
    spark_schema_to_specs,
)

__all__ = [
    "restore_schema_script",
    "snapshot_from_jdbc",
    "snapshot_from_parquet",
    "spark_schema_to_specs",
]
