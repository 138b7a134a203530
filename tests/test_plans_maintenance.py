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


def test_execute_binpack_round_trip(spark, tmp_path):
    """VERDICT r7 item 4: the binpack PLAN executes on the parquet
    fallback. A scratch orders table written one-file-per-month is
    rewritten into the planner's bins; the executed layout must carry
    exactly one file per bin, match the planner's bin count, respect the
    overflow bound (planned bin bytes < target + max input file), and be
    row-for-row equal to the source."""
    from spark_iceberg_jobs_spark.plans.maintenance import execute_binpack
    from spark_iceberg_jobs_spark.sources.readers import read_fixture

    src_dir = str(tmp_path / "orders_small_files")
    out_dir = str(tmp_path / "orders_binpacked")
    orders = read_fixture(spark, "/root/testdata/sf0.001", "orders").withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    )
    # one small file per month: repartition by the partition column first
    # so each month lands in one task -> exactly one file per month dir
    orders.repartition("month").write.partitionBy("month").parquet(src_dir)

    import os

    n_src_files = sum(
        1 for r, _d, fs in os.walk(src_dir) for f in fs if f.endswith(".parquet")
    )
    sizes = [
        os.stat(os.path.join(r, f)).st_size
        for r, _d, fs in os.walk(src_dir)
        for f in fs
        if f.endswith(".parquet")
    ]
    target = 4 * (sum(sizes) // n_src_files)  # ~4 source files per bin
    report = execute_binpack(spark, src_dir, out_dir, target_bytes=target)

    assert report["files_before"] == n_src_files
    # one output file per bin (bin ids may have gaps when a file spans
    # multiple targets — iterate the planned ids, not range(n_bins))
    assert report["files_after"] == report["n_bins"]
    for b in report["planned_bins"]:
        bin_dir = os.path.join(out_dir, f"part_bin={b}")
        n = sum(
            1 for r, _d, fs in os.walk(bin_dir) for f in fs if f.endswith(".parquet")
        )
        assert n == 1, f"bin {b}: {n} files"
    # planner counts match the executed inventory
    assert sum(v["n_files"] for v in report["planned_bins"].values()) == n_src_files
    # greedy running-sum overflow bound: a bin exceeds the target by at
    # most one file
    for v in report["planned_bins"].values():
        assert v["bytes"] < target + report["max_input_file_bytes"]
    assert report["n_bins"] < n_src_files, "compaction must reduce file count"

    # row-for-row equality (month column rides along as partition value)
    before = spark.read.parquet(src_dir).select("o_orderkey", "o_totalprice", "month")
    after = spark.read.parquet(out_dir).select("o_orderkey", "o_totalprice", "month")
    assert before.count() == after.count()
    assert before.exceptAll(after).isEmpty() and after.exceptAll(before).isEmpty()


def test_plan_binpack_rule_matches_query_planner(spark):
    """plan_binpack and maintenance_compaction_bins implement the SAME
    greedy rule: feeding the query planner's per-day file model into
    plan_binpack reproduces its bins exactly."""
    from spark_iceberg_jobs_spark.plans.maintenance import plan_binpack
    from spark_iceberg_jobs_spark.queries.maintenance import (
        _COMPACT_TARGET,
        maintenance_compaction_bins,
    )
    from spark_iceberg_jobs_spark.sources.readers import read_fixture

    sf = "/root/testdata/sf0.001"
    orders = read_fixture(spark, sf, "orders")
    files = (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"))
        .agg((F.count("*") * 128).alias("b"))
        .collect()
    )
    # the query planner packs within each year partition; replay per year
    got: dict[tuple[int, int], int] = {}
    for year in sorted({r["d"][:4] for r in files}):
        inv = [(r["d"], r["b"]) for r in files if r["d"].startswith(year)]
        for b, _day, _sz in plan_binpack(inv, _COMPACT_TARGET):
            got[(int(year), b)] = got.get((int(year), b), 0) + 1
    want = {
        (r["part_year"], r["bin_id"]): r["n_files"]
        for r in maintenance_compaction_bins(spark, sf).collect()
    }
    assert got == want
