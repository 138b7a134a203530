"""Runtime-filter lab: dynamic partition pruning on a partitioned fact.

At 100 TB a star join's cost is decided before a single fact task runs:
the dim-side predicate ("region = 'EUROPE'", "day IN last week") must
reach the FACT scan as a partition filter, or the join reads the whole
table. Static pruning cannot do it — on the fact side the predicate
exists only through the join — so Catalyst injects a DYNAMIC filter
(SPARK-11150): the dim side executes first (as the broadcast exchange
the join needs anyway, so it costs nothing extra), and the fact scan's
``PartitionFilters`` gain ``dynamicpruningexpression(fact.k IN
<broadcast result>)``, skipping whole partition directories at runtime.

This is the partition-layout twin of the zone-map story in
plans/layout.py: z-ordering makes ROW-GROUP pruning work for mixed
predicates, DPP makes DIRECTORY pruning work for join-carried
predicates. On an Iceberg table the same mechanism rides the
partition-transform metadata instead of hive directory names (and SPJ
extends it to co-partitioned shuffle elimination — plans/ddl.py).

``dpp_probe`` stages the canonical shape so tests can pin the
dynamicpruningexpression in the executed plan and the row-identity with
the direct-filter formulation: write a fact hive-partitioned on the
join key, re-read it, and join it to a pre-filtered dim.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(fact: DataFrame, partition_col: str, out_dir: str) -> str:
    """Write ``fact`` hive-partitioned by ``partition_col`` — the layout
    DPP prunes. Returns ``out_dir``."""
    fact.write.mode("overwrite").partitionBy(partition_col).parquet(out_dir)
    return out_dir


def dpp_probe(
    spark: SparkSession,
    fact_dir: str,
    dim: DataFrame,
    *,
    join_col: str,
) -> DataFrame:
    """The canonical DPP shape: partitioned-fact scan ⋈ filtered dim on
    the partition column. ``dim`` must already carry its selective filter
    — that filter is what the injected subquery replays against the fact
    scan's partition values. Returns the joined DataFrame (lazy); the
    caller aggregates/collects and can assert ``dynamicpruningexpression``
    in the fact scan's PartitionFilters."""
    fact = spark.read.parquet(fact_dir)
    return fact.join(dim, on=join_col, how="inner")


@dataclass(frozen=True)
class BloomProbeResult:
    rows: int  # join row count (must equal the unfiltered formulation)
    injected: bool  # bloom_filter_agg built + might_contain applied
    plan: str  # executed plan text, for assertions/inspection


def bloom_join_probe(
    spark: SparkSession,
    fact: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    dim_key: str,
) -> BloomProbeResult:
    """Runtime bloom-filter join pruning (SPARK-32268) — DPP's sibling
    for NON-partition join keys: before the fact side shuffles for a
    sort-merge/shuffled-hash join, Catalyst builds a bloom filter over
    the (selectively filtered) dim side's join keys and injects
    ``might_contain(<subquery>, xxhash64(fact.key))`` into the fact
    scan's post-scan filter, dropping most fact rows BEFORE the shuffle
    — the semijoin reduction classic OLAP engines apply by hand.

    Self-contained probe: injection happens at optimization time, so the
    confs must bracket the action — staged here and restored after. Two
    stagings, both the point at lab scale: the application-side scan
    threshold defaults to 10 GB (the mechanism exists for fact scans that
    dwarf the dim — a 100 TB fact passes naturally; the fixture must
    stage it down so the INJECTION is what's probed, not the threshold
    arithmetic), and autoBroadcast is disabled because the filter
    protects the shuffle join a production-sized fact is forced into
    anyway. Results carry the executed plan for pinning.
    """
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1b",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = fact.join(dim, fact[fact_key] == dim[dim_key])
        total = joined.agg(F.count(F.lit(1)).cast("long").alias("n"))
        rows = total.collect()[0]["n"]
        plan = total._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    return BloomProbeResult(
        rows=rows,
        injected=("might_contain" in plan and "bloom_filter_agg" in plan),
        plan=plan,
    )
