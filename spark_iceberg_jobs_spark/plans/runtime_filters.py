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

from pyspark.sql import DataFrame, SparkSession


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
