"""Skew lab: hot-key shuffle joins — naive vs AQE skew-split vs salted.

SURVEY.md §7.3(e) promises a skew strategy; this makes it EXECUTABLE
(VERDICT r8 item 6) the way plans/runtime_filters.py made DPP/bloom
executable: a staged probe that runs the same hot-key equi join three
ways and returns comparable numbers plus the executed plans for pinning.

The three legs, in the order a production escalation actually tries them:

1. **naive** — shuffled join, AQE skew handling off: the hot key's whole
   partition serializes through one task (the straggler that stalls a
   1000-executor stage at 100 TB).
2. **aqe** — Spark's adaptive skew-join split (the FIRST remedy to
   reach for): AQE detects the oversized partition at runtime and splits
   it across tasks, replicating the matching build rows. Zero code
   changes; works when the join is sort-merge and the skew is visible to
   the runtime statistics.
3. **salted** — operators/joins.salted_join: the skewed side's key gains
   an explicit salt, the small side explodes ``salt_buckets``-fold, and
   the hot key fans out over ``salt_buckets`` reducers BY CONSTRUCTION.
   The remedy when AQE can't help: broadcast-ineligible plans AQE won't
   split, pre-shuffle aggregates, or engines/stages where runtime
   re-planning is unavailable.

The structural guarantee the lab pins (test_plans.py): result rows are
IDENTICAL across all three legs, the salted plan joins on the salt (and
carries the explode), and the largest (key, salt) sub-group is a
``salt_buckets``-fold reduction of the hot key's group — the quantity
that bounds the straggler task's input regardless of cluster size.
docs/SCALE.md records the measured wall-clock of all three legs at lab
scale.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import salt_column, salted_join


@dataclass(frozen=True)
class SkewJoinLabResult:
    rows_naive: int
    rows_aqe: int
    rows_salted: int
    paybytes_naive: int  # Σ length(fact payload) through the join — the
    paybytes_aqe: int  # equality witness that every leg moved the same rows
    paybytes_salted: int
    secs_naive: float
    secs_aqe: float
    secs_salted: float
    plan_aqe: str
    plan_salted: str
    max_key_rows: int  # largest single-key group on the skewed side
    max_subkey_rows: int  # largest (key, salt) sub-group after salting


def hot_key_fixture(
    spark: SparkSession,
    *,
    n_rows: int,
    n_keys: int,
    hot_frac: float = 0.5,
    hot_key: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Synthetic (fact, dim) pair with a planted hot key: ``hot_frac`` of
    the fact lands on ``hot_key``, the rest spreads uniformly over
    ``n_keys`` keys; the dim carries one payload row per key (too many
    rows to broadcast when the lab stages the thresholds off).
    Deterministic — no Date.now/rand in the data.

    The fact payload is 128 bytes of HIGH-ENTROPY text (sha2 of the row
    id): skew is a BYTES problem, and both the column pruner and the
    shuffle compressor will happily erase a synthetic one — count(1)
    prunes the payload out of the shuffle entirely, and an rpad('x')
    filler compresses to nothing, keeping every partition under the skew
    detector's byte threshold (both bit the first cut of this lab)."""
    mod = max(1, int(round(1 / hot_frac)))
    fact = spark.range(n_rows).select(
        F.when(F.col("id") % mod == 0, F.lit(hot_key))
        .otherwise(F.pmod(F.xxhash64("id"), n_keys))
        .cast("long")
        .alias("k"),
        F.concat(
            F.sha2(F.concat(F.lit("p"), F.col("id")), 256),
            F.sha2(F.concat(F.lit("q"), F.col("id")), 256),
        ).alias("pay"),
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
    )
    return fact, dim


def salted_join_lab(
    spark: SparkSession,
    fact: DataFrame,
    dim: DataFrame,
    *,
    key: str,
    salt_buckets: int = 16,
    fact_payload: str = "pay",
    dim_payload: str = "payload",
) -> SkewJoinLabResult:
    """Run the three-leg skew comparison. ``fact``/``dim`` must carry the
    named payload columns (hot_key_fixture's defaults) — the timed
    aggregate consumes both so the payloads actually cross the shuffle.
    Confs are staged and restored:
    autoBroadcast off for ALL legs (a broadcastable dim has no skew
    problem — the lab probes the forced-shuffle regime a 100 TB dim side
    lives in), AQE skew-join off for the naive/salted legs and ON with
    lab-scale thresholds for the aqe leg (defaults trigger at 256 MB
    partitions; the staging scales the DETECTION to the fixture, exactly
    like bloom_join_probe stages its scan threshold — the mechanism is
    what's probed, not the threshold arithmetic)."""
    confs_common = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # AQE has its OWN broadcast threshold and will happily convert the
        # shuffle join to a runtime broadcast, erasing the skew question —
        # a valid rescue, but not the mechanism under test
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    legs: dict[str, dict[str, str]] = {
        "naive": {"spark.sql.adaptive.skewJoin.enabled": "false"},
        "aqe": {
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        },
        "salted": {"spark.sql.adaptive.skewJoin.enabled": "false"},
    }
    staged = confs_common | {k: v for leg in legs.values() for k, v in leg.items()}
    # snapshot with a None default: createOptional confs with no default
    # (spark.sql.adaptive.autoBroadcastJoinThreshold) raise from a bare
    # conf.get on any session that never set them (ADVICE r9) — restore
    # then UNSETS those keys instead of writing "None" back
    old = {k: spark.conf.get(k, None) for k in staged}

    def timed(df: DataFrame) -> tuple[int, int, float, str]:
        # the aggregate must CONSUME both payloads: count(1) lets the
        # column pruner drop them from the shuffle, and a join that moves
        # only 8-byte keys has no skew for anyone to fix (first-cut bug)
        agg = df.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.length(fact_payload)).cast("long").alias("paybytes"),
            F.count(dim_payload).cast("long").alias("np"),
        )
        t0 = time.time()
        row = agg.collect()[0]
        secs = time.time() - t0
        # read the plan AFTER the action on the SAME Dataset: AQE-dependent
        # markers (skew=true) exist only in the final adaptive plan
        plan = agg._jdf.queryExecution().executedPlan().toString()
        return row["n"], row["paybytes"], secs, plan

    try:
        for k, v in confs_common.items():
            spark.conf.set(k, v)
        results: dict[str, tuple[int, int, float, str]] = {}
        for leg, confs in legs.items():
            for k, v in confs.items():
                spark.conf.set(k, v)
            if leg == "salted":
                joined = salted_join(fact, dim, key, salt_buckets=salt_buckets)
            else:
                joined = fact.join(dim, on=key, how="inner")
            results[leg] = timed(joined)
        max_key = (
            fact.groupBy(key)
            .count()
            .agg(F.max("count").cast("long").alias("m"))
            .collect()[0]["m"]
        )
        max_sub = (
            fact.withColumn("__salt", salt_column(salt_buckets))
            .groupBy(key, "__salt")
            .count()
            .agg(F.max("count").cast("long").alias("m"))
            .collect()[0]["m"]
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return SkewJoinLabResult(
        rows_naive=results["naive"][0],
        rows_aqe=results["aqe"][0],
        rows_salted=results["salted"][0],
        paybytes_naive=results["naive"][1],
        paybytes_aqe=results["aqe"][1],
        paybytes_salted=results["salted"][1],
        secs_naive=round(results["naive"][2], 3),
        secs_aqe=round(results["aqe"][2], 3),
        secs_salted=round(results["salted"][2], 3),
        plan_aqe=results["aqe"][3],
        plan_salted=results["salted"][3],
        max_key_rows=max_key,
        max_subkey_rows=max_sub,
    )
