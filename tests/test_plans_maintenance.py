"""Upsert/merge and parquet-compaction operators (plans/maintenance.py).

These predate the query-tier maintenance family (queries/maintenance.py,
tested in test_maintenance.py): merge_upsert is the batch kernel behind the
streaming foreachBatch lake sink, compact_parquet the physical small-file
rewrite. Restored here after the tier tests took over the old filename.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_iceberg_jobs_spark.plans.maintenance import compact_parquet, merge_upsert


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    merged = {r.id: (r.name, r.v) for r in merge_upsert(target, updates, key="id").collect()}
    assert merged == {
        1: ("a", 10.0),
        2: ("b2", 21.0),  # matched → replaced
        3: ("c", 30.0),
        4: ("d", 40.0),  # unmatched → inserted
    }


def test_merge_upsert_idempotent(spark):
    target = spark.range(10).withColumn("v", F.col("id") * 2)
    updates = spark.range(3).withColumn("v", F.col("id") * 100)
    once = merge_upsert(target, updates, key="id")
    twice = merge_upsert(once, updates, key="id")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_compact_parquet(spark, tmp_path):
    path = str(tmp_path / "frag")
    # fragment: 40 files of ~25 rows
    spark.range(1000).withColumn("v", F.col("id") % 7).repartition(40).write.parquet(path)
    before, after = compact_parquet(spark, path, target_rows_per_file=500)
    assert before == 40
    assert after == 2
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.agg(F.sum("id")).first()[0] == 999 * 1000 // 2
