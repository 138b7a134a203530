"""Batch ingestion pipeline — the reference's job1 re-expressed
(job1-DDL_Load_Data_Spark_Iceberg.py:120-351), Spark-first and bug-fixed.

Reference flow (SURVEY.md §3.1): session → CSV loads with header+inferSchema
→ emptiness validation (twice per table, via df.rdd.isEmpty) → Iceberg DDL →
``mode("overwrite").saveAsTable`` writes. Two defects not replicated here:

1. §1.3 schema clobber: overwrite-saveAsTable on a v2 catalog replaces the
   DDL-declared schema/partition spec with the CSV-inferred one. Fix:
   explicit StructType at read time + writeTo().append()/overwritePartitions()
   (Iceberg) or bucketBy saveAsTable (fallback) so the declared layout wins.
2. Name drift: source key ``medals_matches_players`` (job1:139) vs DDL table
   ``medal_matches_players`` (job1:241). Canonical: the plural form.

Without the Iceberg runtime (this container), the same pipeline lands in
Hive-style bucketed parquet tables: bucket(16, match_id) becomes
``bucketBy(16, "match_id")`` — joins across the three fact tables then plan
with no shuffle Exchange, the property README.md:18 wants (asserted in
tests/test_plans.py).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession

from .plans.ddl import bootcamp_ddls, execute_ddls
from .schemas import BOOTCAMP_PARTITIONING, BOOTCAMP_SCHEMAS
from .session import iceberg_available
from .sources.readers import read_csv, validate_all_or_raise
from .sources.writers import write_bucketed_table

logger = logging.getLogger(__name__)


def load_bootcamp_csvs(spark: SparkSession, data_files: dict[str, str]) -> dict[str, DataFrame]:
    """Load the five bootcamp CSVs with explicit schemas (job1:128-165
    semantics, inference removed) and validate once each, all-or-abort
    (job1:167-177)."""
    dfs: dict[str, DataFrame] = {}
    for name, path in data_files.items():
        schema = BOOTCAMP_SCHEMAS[name]
        dfs[name] = read_csv(spark, path, schema, alias=name)
        logger.info("loaded %s from %s", name, path)
    validate_all_or_raise(dict(dfs))
    return dfs


def run_ingestion(
    spark: SparkSession,
    data_files: dict[str, str],
    *,
    namespace: str = "bootcamp",
    n_buckets: int = 16,
) -> None:
    """End-to-end ingestion (job1 main(), job1:120-351).

    Iceberg runtime present → DDL with bucket/identity transforms +
    writeTo().append(). Otherwise → bucketed/plain parquet tables in the
    session catalog with the same physical co-location.
    """
    dfs = load_bootcamp_csvs(spark, data_files)
    use_iceberg = iceberg_available(spark)
    if use_iceberg:
        execute_ddls(spark, bootcamp_ddls(namespace), namespace=namespace)
        for name, df in dfs.items():
            df.writeTo(f"{namespace}.{name}").append()
            logger.info("wrote %s.%s (iceberg)", namespace, name)
        return
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {namespace}")
    for name, df in dfs.items():
        table = f"{namespace}.{name}"
        if BOOTCAMP_PARTITIONING[name].startswith("bucket("):
            write_bucketed_table(
                df, table, bucket_cols=["match_id"], n_buckets=n_buckets
            )
        else:
            df.write.mode("overwrite").format("parquet").saveAsTable(table)
        logger.info("wrote %s (parquet%s)", table, ", bucketed" if "bucket" in BOOTCAMP_PARTITIONING[name] else "")
