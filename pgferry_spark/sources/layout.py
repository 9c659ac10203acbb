"""Physical-layout helpers: bucketing and partitioned writes.

At 100 TB, the cheapest shuffle is the one you already did at write time:

* ``write_bucketed`` persists a table hash-bucketed on its join/group key —
  two tables bucketed the same way join with NO exchange on either side
  (verified by the no-Exchange plan assertion in tests/test_layout.py).
  This is the Spark-native analogue of the co-located chunk layout the
  reference gets implicitly from range-chunked PK order.
* ``write_partitioned`` does directory-style partition pruning for
  low-cardinality filter keys (date, tenant, event_type): a filtered read
  touches only matching directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str | list[str],
    num_buckets: int = 32,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (bucketing requires saveAsTable).

    ``sort_by`` additionally sorts within buckets, enabling merge-join
    without a sort step and better min/max row-group pruning.
    """
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *keys)
    if sort_by:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sorts)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet write: filters on ``partition_cols``
    prune whole directories at planning time (PartitionFilters in the scan)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the executed plan — the metric the
    bucketing tests assert on."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
