"""Iceberg-runtime probe (VERDICT r1 item 6).

The reference's tables are ``USING iceberg`` (job1:184-275); this container
ships no ``iceberg-spark-runtime`` jar and has no network to resolve one, so
the engine runs its Hive ``bucketBy(16)`` parquet fallback (asserted
shuffle-free in test_plans.py). This module makes the gap VISIBLE: it probes
for a usable runtime and either skips loudly or actually exercises the
Iceberg DDL + storage-partitioned-join path in a fresh JVM.
"""

from __future__ import annotations

import glob
import os
import socket
import subprocess
import sys
import textwrap

import pytest

_JAR_PATTERNS = [
    os.path.expanduser("~/.ivy2/jars/*iceberg-spark-runtime*.jar"),
    os.path.expanduser("~/.ivy2.5.2/jars/*iceberg-spark-runtime*.jar"),
    "/opt/**/*iceberg-spark-runtime*.jar",
    os.environ.get("ICEBERG_JAR", ""),
]


def _find_runtime_jar() -> str | None:
    for pat in _JAR_PATTERNS:
        if not pat:
            continue
        hits = glob.glob(pat, recursive=True)
        if hits:
            return sorted(hits)[-1]
    # also check the pyspark distribution's own jars dir
    import pyspark

    hits = glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "*iceberg*.jar"))
    return sorted(hits)[-1] if hits else None


def _maven_reachable() -> bool:
    try:
        socket.create_connection(("repo1.maven.org", 443), timeout=2).close()
        return True
    except OSError:
        return False


def test_iceberg_spj_bucket_join_or_skip(tmp_path):
    """If an iceberg-spark-runtime jar is available (locally or resolvable
    from Maven), create a bucketed Iceberg table pair with session.SPJ_CONFS
    and assert the bucket join runs with ZERO shuffle Exchange (true SPJ).
    Otherwise skip with an explicit environment reason — never silently."""
    jar = _find_runtime_jar()
    if jar is None and not _maven_reachable():
        pytest.skip(
            "iceberg-spark-runtime jar not on disk and Maven unreachable "
            "(no network in this container) — Iceberg SPJ path is "
            "environment-blocked; Hive bucketBy fallback is asserted in "
            "test_plans.py::test_bucketed_join_has_no_shuffle_exchange"
        )
    # Fresh JVM: jars must be on the classpath at JVM start, and the shared
    # session fixture has already started one without them.
    conf_line = (
        f'.config("spark.jars", {jar!r})'
        if jar
        else '.config("spark.jars.packages", "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0")'
    )
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
        from pyspark.sql import SparkSession
        from spark_iceberg_jobs_spark.session import SPJ_CONFS, iceberg_available
        from spark_iceberg_jobs_spark.plans.explain import count_shuffle_exchanges

        b = (SparkSession.builder.master("local[4]").appName("iceberg-probe")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.autoBroadcastJoinThreshold", "-1")
             .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
             .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
             .config("spark.sql.catalog.local.type", "hadoop")
             .config("spark.sql.catalog.local.warehouse", {str(tmp_path / "wh")!r})
             .config("spark.sql.extensions",
                     "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
             {conf_line})
        for k, v in SPJ_CONFS.items():
            b = b.config(k, v)
        spark = b.getOrCreate()
        assert iceberg_available(spark), "runtime jar did not load"
        spark.sql("CREATE TABLE local.db.a (k BIGINT, v BIGINT) USING iceberg "
                  "PARTITIONED BY (bucket(16, k))")
        spark.sql("CREATE TABLE local.db.b (k BIGINT, w BIGINT) USING iceberg "
                  "PARTITIONED BY (bucket(16, k))")
        spark.range(0, 10000).selectExpr("id AS k", "id * 2 AS v").writeTo("local.db.a").append()
        spark.range(0, 10000).selectExpr("id AS k", "id * 3 AS w").writeTo("local.db.b").append()
        j = spark.table("local.db.a").join(spark.table("local.db.b"), "k")
        n = count_shuffle_exchanges(j)
        assert n == 0, f"expected storage-partitioned join with 0 shuffles, got {{n}}"
        assert j.count() == 10000
        print("SPJ-OK")
        spark.stop()
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0 and "SPJ-OK" in proc.stdout, (
        proc.stdout[-2000:] + proc.stderr[-2000:]
    )
