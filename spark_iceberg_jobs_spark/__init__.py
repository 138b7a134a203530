"""spark_iceberg_jobs_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``tarikbelattar/spark-iceberg-jobs`` (a PySpark + Apache
Iceberg ingestion/analytics assignment over Halo telemetry; see
/root/reference/README.md:13-26 and job1-DDL_Load_Data_Spark_Iceberg.py),
extended with LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Layout
------
- ``session``    : SparkSession factory with scale-aware defaults
- ``schemas``    : explicit StructTypes (fixture tables + bootcamp tables)
- ``sources``    : readers (parquet/csv w/ explicit schema), validation, writers
- ``plans``      : Iceberg DDL builder, layout lab, plan-shape introspection
- ``operators``  : joins, aggregations, windows, set ops, dedup, similarity,
                   text analysis, multimodal, event analytics
- ``functions``  : column-level helpers (vector math, text, hashing)
- ``streaming``  : Structured Streaming variants of the event operators
- ``queries``    : named query registry consumed by ``__spark_entry__``
"""

__version__ = "0.1.0"
