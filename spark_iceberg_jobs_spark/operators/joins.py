"""Join operators (SURVEY.md §2.2, J1-J4).

The reference's analytics spec (README.md:16-18) demands three join
behaviors, all re-expressed here Spark-first:

- J1: auto-broadcast disabled so strategy is explicit — a *session* conf
  (session.get_spark(disable_auto_broadcast=True)), not an operator.
- J2: explicit broadcast hash join of small dimensions into a fact
  (README.md:17) — ``broadcast_dim_join``.
- J3: shuffle-free co-partitioned fact-fact join, the Spark analogue of the
  Iceberg bucket(16) layout (README.md:18, job1:224,239,248) —
  ``copartitioned_join`` (both sides repartitioned once on the key; the
  join itself then reuses that exchange) and Hive ``bucketBy`` tables via
  sources.writers.write_bucketed_table (zero Exchange, asserted in tests).
- J4: generic multiway equi joins (README.md:19-23) — plain ``df.join``.

Scale notes (100 TB): broadcast the ≤~100 MB side always (dimension tables);
for fact-fact joins prefer a persistent bucket layout so repeated joins never
shuffle; for ad-hoc joins let AQE pick skew-splits. Skewed hot keys: salt the
build side (``salted_join``).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame,
    dims: dict[str, DataFrame] | list[tuple[DataFrame, str | list[str]]],
    *,
    how: str = "inner",
) -> DataFrame:
    """Join a fact to one or more small dimensions with explicit broadcast
    hints (README.md:17) — e.g. medals/maps in the reference, nation/region
    on the fixture schema.

    ``dims`` maps join-key → dimension DataFrame (or a list of (dim, keys)
    pairs). Produces BroadcastHashJoinExec even when the session disables
    auto-broadcast (the hint wins over the threshold).
    """
    pairs: list[tuple[DataFrame, str | list[str]]]
    if isinstance(dims, dict):
        pairs = [(dim, key) for key, dim in dims.items()]
    else:
        pairs = list(dims)
    out = fact
    for dim, keys in pairs:
        out = out.join(F.broadcast(dim), on=keys, how=how)
    return out


def copartitioned_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    how: str = "inner",
    num_partitions: int | None = None,
) -> DataFrame:
    """Fact-fact equi join with both sides explicitly hash-partitioned on the
    join key — the DataFrame analogue of the reference's bucket(16,match_id)
    join (README.md:18).

    In a single plan Spark would shuffle both sides anyway; the value of the
    explicit repartition is *reuse*: downstream joins/aggs on the same key
    piggyback on one exchange. For a truly shuffle-free join across jobs,
    persist both sides with write_bucketed_table and join the tables.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if num_partitions:
        left = left.repartition(num_partitions, *keys)
        right = right.repartition(num_partitions, *keys)
    else:
        left = left.repartition(*keys)
        right = right.repartition(*keys)
    return left.join(right, on=on, how=how)


def multiway_join(
    dfs: list[DataFrame],
    on: str | list[str],
    *,
    how: str = "inner",
) -> DataFrame:
    """n-way equi join on a shared key (J4; README.md:19-23 query shapes)."""
    return reduce(lambda a, b: a.join(b, on=on, how=how), dfs)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join: salt the skewed side's key into
    ``salt_buckets`` subkeys and explode the other side to match.

    At 100 TB a handful of hot keys (the reference's popular ``match_id``s,
    a crawl's top domains) can stall a stage; salting fans each hot key out
    over ``salt_buckets`` reducers. Prefer AQE skew-join first; salt when a
    single key exceeds what one task can hold.
    """
    salted_l = skewed.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    salted_r = small.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_l.join(salted_r, on=[on, "__salt"], how=how)
    return out.drop("__salt")
