"""SparkSession factory with scale-aware defaults.

The reference builds its session with a bare ``SparkSession.builder
.appName(...).getOrCreate()`` (job1-DDL_Load_Data_Spark_Iceberg.py:106-108)
and layers one manual physical knob on top for the analytics job:
``spark.sql.autoBroadcastJoinThreshold = -1`` (README.md:16) so that join
strategy is explicit.

This factory bakes in the settings we want on a real cluster:

- **AQE on** (coalesce shuffle partitions, skew-join splitting): at 100 TB
  the static ``shuffle.partitions`` is always wrong for some stage; AQE
  re-plans from runtime stats.
- **Arrow on** for any pandas exchange (the multimodal/similarity Pandas
  UDFs move batches, not rows).
- **UTC session timezone** so timestamp semantics are stable across the
  driver, executors, and the DuckDB oracle.
- **Shuffle partitions** default to ``max(cores, 32)`` locally (the
  docstring previously claimed 2x cores — review finding, r8: the code
  is the benched truth, the doc was wrong); on a 1000-executor cluster
  you would size this to ~2-3x total cores and let AQE coalesce down.
  Exposed as a parameter.
- Optional **Iceberg catalog** wiring (the runtime jar is not bundled in
  this environment; ``enable_iceberg`` is a no-op with a warning unless the
  jar is on the classpath — every query in this repo runs on plain parquet
  so correctness never depends on Iceberg, per SURVEY.md §7.2 M2 risk note).

Known session-wide side effect: the first events-fixture read sets
``spark.sql.legacy.parquet.nanosAsLong=true`` for the REST OF THE SESSION
(sources/readers.read_fixture) — subsequent nanos-timestamp parquet reads
come back as raw longs. It cannot be scoped per-read because the scan
re-reads the conf at execution time (restoring it makes lazy consumers
throw PARQUET_TYPE_ILLEGAL).
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import SparkSession

logger = logging.getLogger(__name__)

#: Confs that enable Iceberg's storage-partitioned join (SPJ) so that the
#: reference's bucket-join (README.md:18; bucket(16, match_id) DDL at
#: job1:224,239,248) runs with **no Exchange**. Off by default in Spark;
#: harmless when no v2 bucketed source is present.
SPJ_CONFS: dict[str, str] = {
    "spark.sql.sources.v2.bucketing.enabled": "true",
    "spark.sql.sources.v2.bucketing.pushPartValues.enabled": "true",
    "spark.sql.requireAllClusterKeysForCoPartition": "false",
    "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled": "true",
}


def default_parallelism() -> int:
    """Local parallelism: honor the driver's SPARK_GRAFT_CPUS, else all cores."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 4


def get_spark(
    app_name: str = "spark-iceberg-jobs-spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    disable_auto_broadcast: bool = False,
    enable_iceberg: bool = False,
    warehouse: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with the engine's defaults.

    Parameters
    ----------
    disable_auto_broadcast:
        Reproduces README.md:16 (``autoBroadcastJoinThreshold=-1``) so the
        only broadcasts are the explicit ``F.broadcast`` hints (README.md:17).
        Keep False in production — AQE's runtime-size broadcast decisions are
        usually right.
    enable_iceberg:
        Wire a local hadoop-type Iceberg catalog named ``local`` plus the SPJ
        confs. Requires ``iceberg-spark-runtime`` on the classpath.
    """
    cores = default_parallelism()
    if master is None:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(32, cores)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Spark's 10MB auto-broadcast default is conservative; with multi-GB
        # executors a 64MB dimension is far cheaper to broadcast than to
        # shuffle a fact against (measured ~25% on the join suite here).
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
    )
    if disable_auto_broadcast:
        b = b.config("spark.sql.autoBroadcastJoinThreshold", "-1").config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
    if enable_iceberg:
        warehouse = warehouse or os.path.join(os.getcwd(), "spark-warehouse", "iceberg")
        b = (
            b.config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.local.type", "hadoop")
            .config("spark.sql.catalog.local.warehouse", warehouse)
            .config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
        )
        for k, v in SPJ_CONFS.items():
            b = b.config(k, v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)

    spark = b.getOrCreate()
    if enable_iceberg and not iceberg_available(spark):
        # the module docstring promises this warning (review finding, r8:
        # it was never emitted): Spark silently skips a missing extensions
        # class, and the first `local.*` query would otherwise fail later
        # with an opaque ClassNotFoundException
        logger.warning(
            "enable_iceberg=True but iceberg-spark-runtime is not on the "
            "classpath: the 'local' catalog confs are set but inert, and "
            "catalog queries will fail"
        )
    return spark


def iceberg_available(spark: SparkSession) -> bool:
    """True if the Iceberg Spark runtime is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def stop(spark: SparkSession) -> None:
    """Tear down the session (reference: job1:345-351)."""
    try:
        spark.stop()
    except Exception:  # pragma: no cover - best effort, mirrors job1:349-351
        logger.exception("error stopping SparkSession")
