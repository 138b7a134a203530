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

from pyspark.sql import DataFrame, Window
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    strict: bool = True,
    how: str = "inner",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (``<`` when strict) per key — an operator Spark
    lacks natively, built as the classic union + ordered-window sweep.

    Mechanics: tag and union both inputs, sort each key's timeline once
    (ts, then tag so equal timestamps resolve strictness), and carry the
    last-seen right-side attributes forward with ``last(ignorenulls)``.
    One shuffle + one sort, O(n log n) — never the per-left-row subquery
    rescan a naive formulation costs. ``how="inner"`` (default) drops
    left rows with no prior match; ``how="left"`` keeps them with null
    ``asof_*`` columns (DuckDB's ASOF LEFT JOIN semantics).

    Scale note: both sides shuffle once on the key; skew = hot keys, same
    remedies as any join. State per key during the sort-merge is one row.
    """
    # Ordering is (ts, tag) ascending: under strict semantics an equal-ts
    # right row must sort AFTER the left row (invisible to last()); under
    # inclusive semantics it must sort BEFORE it.
    tag_left, tag_right = (0, 1) if strict else (1, 0)
    lcols = [c for c in left.columns if c not in (on, left_ts)]
    # The carried right attributes travel as ONE nullable struct: per-column
    # last(ignorenulls) calls would each skip nulls independently and could
    # stitch together attributes from DIFFERENT right rows whenever a
    # carried column is null; the struct is atomic, so the match is always
    # one real row (and its nullness is the match indicator).
    r_struct = F.struct(*[F.col(c).alias(c) for c in right_cols])
    null_struct = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols) + ">"
    )
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(tag_left).alias("_tag"),
        *[F.col(c) for c in lcols],
        null_struct.alias("_r"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(tag_right).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        r_struct.alias("_r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # Tie-break equal-timestamp RIGHT rows by the carried struct so the
    # winner is deterministic (last = greatest tuple). Left/right never tie
    # with each other here — the tag already separates them.
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_tag", "_r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        on,
        "_ts",
        "_tag",
        *lcols,
        F.last("_r", ignorenulls=True).over(w).alias("_m"),
    )
    out = filled.filter(F.col("_tag") == tag_left).select(
        on,
        F.col("_ts").alias(left_ts),
        *lcols,
        "_m",
    )
    if how == "inner":
        # inner as-of: no prior right row → null struct → dropped
        out = out.filter(F.col("_m").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out.select(
        on,
        left_ts,
        *lcols,
        *[F.col(f"_m.{c}").alias(f"asof_{c}") for c in right_cols],
    )


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_es: str,
    right_es: str,
    max_gap_sec: int,
) -> DataFrame:
    """Range join — right rows within ``(left_es, left_es + max_gap_sec]``
    of a left row, same key — via time-band bucketing.

    A naive range join is an equi join on the key plus a post-filter whose
    matched-row count explodes with key cardinality skew. Banding quantizes
    the right side into gap-width buckets and joins each left row to exactly
    two buckets (its own and the next), then applies the exact predicate:
    join fan-out is bounded by rows-per-bucket, the filter is codegen'd, and
    the plan is a plain shuffled equi join on (key, bucket).
    """
    # floor division, NOT cast-truncation: cast("long") truncates toward
    # zero, so pre-1970 (negative) epochs would round the two sides into
    # misaligned buckets and silently drop matching pairs (ADVICE r1)
    r = right.withColumn("_bucket", F.floor(F.col(right_es) / max_gap_sec).cast("long"))
    l_binned = left.withColumn(
        "_bucket",
        F.explode(
            F.array(
                F.floor(F.col(left_es) / max_gap_sec).cast("long"),
                F.floor(F.col(left_es) / max_gap_sec).cast("long") + 1,
            )
        ),
    )
    joined = l_binned.join(r, on=[on, "_bucket"])
    return joined.filter(
        (F.col(right_es) > F.col(left_es))
        & (F.col(right_es) <= F.col(left_es) + max_gap_sec)
    ).drop("_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_sec: int = 3600,
) -> DataFrame:
    """Interval overlap join — all (left, right) pairs whose CLOSED
    intervals intersect: ``l.start <= r.end AND r.start <= l.end``.

    The naive form is a full cross product with a post-filter. Banding
    instead explodes EACH side into the fixed-width time buckets its
    interval covers (``sequence(floor(start/w), floor(end/w))`` — fan-out
    bounded by interval length / width + 1), equi-joins on the bucket, and
    re-checks the exact predicate. A pair that shares several buckets is
    emitted exactly once by keeping only the FIRST shared bucket — the one
    holding the overlap's start, ``floor(max(l_start, r_start)/w)``, which
    both sides' bucket lists provably contain (floor is monotone, so it
    equals ``greatest(floor(l_start/w), floor(r_start/w))``). Unlike a
    full-row ``dropDuplicates``, this preserves legitimately duplicate
    input rows: two identical intervals on either side yield two output
    pairs, exactly matching cross-product-plus-filter semantics. Plan: two
    bounded explodes + ONE shuffled equi join on the bucket key — the same
    scale discipline as banded_range_join, with bucket width the
    skew/fan-out dial (set it near the typical interval length), and no
    post-join dedup shuffle at all.

    Precondition: ``start <= end`` on both sides (closed, well-formed
    intervals). Malformed rows (end < start) are dropped — ``sequence``
    with end < start would otherwise emit a DESCENDING bucket list (pure
    fan-out waste), and an empty interval has no overlap semantics here.
    """
    lb = left.filter(F.col(left_start) <= F.col(left_end)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(left_start) / bucket_sec).cast("long"),
                F.floor(F.col(left_end) / bucket_sec).cast("long"),
            )
        ),
    )
    rb = right.filter(F.col(right_start) <= F.col(right_end)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / bucket_sec).cast("long"),
                F.floor(F.col(right_end) / bucket_sec).cast("long"),
            )
        ),
    )
    joined = lb.join(rb, "_bucket").filter(
        (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
        # first-shared-bucket: dedupe multi-bucket pairs without a shuffle
        & (
            F.col("_bucket")
            == F.greatest(
                F.floor(F.col(left_start) / bucket_sec).cast("long"),
                F.floor(F.col(right_start) / bucket_sec).cast("long"),
            )
        )
    )
    return joined.drop("_bucket")


def salt_column(salt_buckets: int) -> F.Column:
    """The salt assignment shared by salted_join and the skew lab
    (plans/skew.py): uniform over ``[0, salt_buckets)``, deterministic
    per partition layout (seeded rand), independent of the join key — a
    hot key's rows scatter across all ``salt_buckets`` sub-keys."""
    return (F.rand(seed=42) * salt_buckets).cast("int")


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

    Right-preserving joins are rejected: the small side is exploded
    ``salt_buckets``-fold, so an unmatched right row would be emitted once
    per salt value.
    """
    if how in ("right", "rightouter", "right_outer", "full", "outer", "fullouter", "full_outer"):
        raise ValueError(f"salted_join cannot preserve the exploded right side (how={how!r})")
    salted_l = skewed.withColumn("__salt", salt_column(salt_buckets))
    salted_r = small.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_l.join(salted_r, on=[on, "__salt"], how=how)
    return out.drop("__salt")
