"""Aggregation operators (SURVEY.md §2.3, A1-A4 + general helpers).

The reference's four analytics questions (README.md:19-23) are all
"group → aggregate → top-1" shapes over the fact⋈dim join tree. Spark turns
each into partial (map-side) + final HashAggregateExec pairs automatically,
and ``orderBy(desc).limit(k)`` into TakeOrderedAndProjectExec — a per-
partition top-k + driver merge, never a global sort. These helpers keep that
shape declarative and add the determinism the DuckDB oracle requires
(stable tie-breakers; see SURVEY.md §5).

Scale notes (100 TB): group-by keys here are mid-cardinality (players,
playlists, maps → customers, priorities, regions) so hash agg partials
shrink data ~1000x before the shuffle; top-k never collects more than k rows
to the driver. For ultra-high-cardinality keys consider two-level agg
(pre-agg on (key, salt) then re-agg) — Spark's partial agg already gives the
first level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_by_agg(
    df: DataFrame,
    group_cols: list[str],
    agg_col: Column,
    metric_name: str,
    *,
    k: int = 1,
    ascending: bool = False,
) -> DataFrame:
    """Group, aggregate, return the top-k groups by the aggregate.

    Deterministic: ties broken by the group columns ascending, so the DuckDB
    oracle's order-insensitive hash matches run-to-run (SURVEY.md §5).
    Physical plan: HashAggregate(partial) → Exchange → HashAggregate(final)
    → TakeOrderedAndProject.
    """
    metric = F.col(metric_name)
    order = [metric.asc() if ascending else metric.desc()]
    order += [F.col(c).asc() for c in group_cols]
    return df.groupBy(*group_cols).agg(agg_col.alias(metric_name)).orderBy(*order).limit(k)


def avg_metric_per_key(
    df: DataFrame, key: str, metric: str, *, k: int = 1, exact_decimal: bool = False
) -> DataFrame:
    """A1 shape — "which player averages the most kills per game"
    (README.md:20) — group-by + avg + top-1.

    ``exact_decimal`` computes the mean as an exact DECIMAL(18,2) sum cast
    to double over the count — order-independent across Spark task
    schedules (functions/money.py; VERDICT r4 item 1). Use for the 2-decimal
    fixture money/quantity columns."""
    if exact_decimal:
        from ..functions.money import money_avg

        agg = money_avg(metric, scale=4)
    else:
        agg = F.round(F.avg(metric), 4)
    return top_k_by_agg(df, [key], agg, f"avg_{metric}", k=k)


def distinct_count_per_key(df: DataFrame, key: str, id_col: str, *, k: int = 1) -> DataFrame:
    """A2/A3 shape — "which playlist/map gets played the most"
    (README.md:21-22). Counts **distinct** ids because post-join row counts
    are inflated (SURVEY.md §2.3 note)."""
    return top_k_by_agg(df, [key], F.countDistinct(id_col), f"n_{id_col}", k=k)


def profile_numeric_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Data-quality profile of numeric columns in one scan: per column the
    row/null/distinct counts and min/max/avg — the cheap pre-flight check
    before pointing a 100 TB pipeline at a table. One wide aggregate (no
    per-column scans), reshaped long via an inline stack."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
            F.round(F.avg(c), 4).alias(f"{c}__avg"),
        ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_v"),
            F.col(f"{c}__max").alias("max_v"),
            F.col(f"{c}__avg").alias("avg_v"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def filtered_sum_per_key(
    df: DataFrame,
    predicate: Column,
    key: str,
    metric: str,
    *,
    k: int = 1,
) -> DataFrame:
    """A4 shape — "which map do players get the most Killing Spree medals on"
    (README.md:23) — filter a dim attribute, sum a fact measure per key.

    The predicate is applied *before* the aggregation so Catalyst pushes it
    into the scan (check PushedFilters in .explain)."""
    return top_k_by_agg(df.filter(predicate), [key], F.sum(metric), f"sum_{metric}", k=k)


def filtered_exact_sum_per_key(
    df: DataFrame,
    predicate: Column,
    key: str,
    metric: str,
    *,
    k: int = 1,
) -> DataFrame:
    """A4 shape with an order-independent DECIMAL sum (functions/money.py)
    for 2-decimal fixture measures, surfaced as double."""
    from ..functions.money import money

    agg = F.sum(money(metric)).cast("double")
    return top_k_by_agg(df.filter(predicate), [key], agg, f"sum_{metric}", k=k)


def grouped_ols_trend(
    df: DataFrame,
    *,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    min_rows: int = 2,
) -> DataFrame:
    """Per-group least-squares trend (slope, intercept, r2, n) via
    ``applyInPandas`` — the grouped-map Arrow tier: each group's rows
    arrive as ONE pandas DataFrame, numpy does the fit, one row comes back.

    Scale notes: applyInPandas shuffles each whole group to a single task,
    which is exactly right for many-small-groups model fitting (per-entity
    trends over millions of entities) and exactly wrong for a handful of
    giant groups — OLS has a closed form over five sufficient statistics
    (n, Σx, Σy, Σxy, Σx²), so huge groups should use the pure-JVM
    partial+final aggregation instead (``tests/test_operators.py``
    cross-checks this operator against that formulation). Groups below
    ``min_rows`` are dropped (a 1-point fit is undefined).
    """
    import numpy as np
    import pandas as pd  # noqa: F401  (Arrow batches arrive as pandas)

    out_fields = ", ".join(f"{c} string" for c in key_cols)
    schema = f"{out_fields}, n long, slope double, intercept double, r2 double"

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) < min_rows:
            return pdf.iloc[0:0][key_cols].assign(n=0, slope=0.0, intercept=0.0, r2=0.0)
        x = pdf[x_col].to_numpy(dtype="float64")
        y = pdf[y_col].to_numpy(dtype="float64")
        xm, ym = x.mean(), y.mean()
        sxx = ((x - xm) ** 2).sum()
        sxy = ((x - xm) * (y - ym)).sum()
        syy = ((y - ym) ** 2).sum()
        slope = sxy / sxx if sxx else 0.0
        intercept = ym - slope * xm
        r2 = (sxy * sxy) / (sxx * syy) if sxx and syy else 0.0
        head = {c: [str(pdf[c].iloc[0])] for c in key_cols}
        return pd.DataFrame(
            {**head, "n": [len(pdf)], "slope": [slope], "intercept": [intercept], "r2": [r2]}
        )

    return df.groupBy(*key_cols).applyInPandas(fit, schema=schema)


def skew_profile(df: DataFrame, key: str, *, k: int = 5) -> DataFrame:
    """Hot-key profile for a prospective join/agg key: the top-k keys by
    row count with their share of all rows and their multiple of the mean
    per-key count — the pre-flight diagnostic that decides between a plain
    shuffle join, a broadcast, or salting (operators/joins.salted_join).

    Scale: one partial+final count shuffle on the key; the per-key counts
    are persisted (scoped — post-agg, |keys| rows) because both the global
    stats and the top-k consume them (Spark shares no subplans, so an
    unpersisted lineage would scan the fact twice); the stats re-aggregate
    to one broadcast row; the top-k is TakeOrderedAndProject. Nothing
    driver-side beyond k rows.
    """
    from ..functions.cache import scoped_persist

    per_key = scoped_persist(df.groupBy(key).agg(F.count("*").alias("cnt")))
    stats = per_key.agg(
        F.avg("cnt").alias("avg_cnt"), F.sum("cnt").cast("double").alias("total")
    )
    return (
        per_key.crossJoin(F.broadcast(stats))
        .select(
            key,
            "cnt",
            F.round(F.col("cnt") / F.col("total") * 100, 4).alias("pct_of_rows"),
            F.round(F.col("cnt") / F.col("avg_cnt"), 3).alias("x_avg"),
        )
        .orderBy(F.desc("cnt"), F.asc(key))
        .limit(k)
    )


def _cms_cells(key: str, depth: int):
    """The (r, b) cell coordinates a key hashes into — ONE definition shared
    by cms_sketch and cms_estimate (and mirrored in the oracle SQL): if the
    salt format or bucket width ever drifted between the two, the join
    would silently produce plausible-looking nonsense."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    F.substring(
                        F.md5(F.concat(F.lit(f"cms:{r}:"), F.col(key))), 1, 2
                    ).alias("b"),
                )
                for r in range(depth)
            ]
        )
    )


def cms_sketch(df: DataFrame, key: str, *, depth: int = 4) -> DataFrame:
    """Count-min sketch over a key column: ``depth`` independent hash rows
    of 256 buckets each (bucket = first hex byte of a row-salted md5 — no
    numeric conversion, so a SQL oracle replays it verbatim). Returns
    (r, b, cnt) counters.

    Scale: the canonical fixed-memory frequency summary — the counter
    table is depth x 256 rows REGARDLESS of corpus size or key
    cardinality, built in one pass with map-side partial counts; rows
    explode JVM-side (array+explode, no Python). Counters from shards/
    streams merge by summing (r, b) cells.
    """
    return (
        df.select(_cms_cells(key, depth).alias("rb"))
        .select(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .groupBy("r", "b")
        .agg(F.count("*").alias("cnt"))
        # the sketch carries its depth so cms_estimate can fail loud on a
        # mismatched probe depth instead of silently estimating 0
        .withColumn("depth", F.lit(depth))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame, key: str, *, depth: int = 4) -> DataFrame:
    """Point-estimate each probe key's frequency from a cms_sketch: the MIN
    over the depth counters the key hashes into. Estimates are upper
    bounds (est >= true count, overcount from collisions only).

    An EMPTY cell counts as 0 (probe-side LEFT join + coalesce), so a key
    absent from the sketched corpus estimates as 0 — canonical count-min
    semantics; an inner join would silently drop such keys or inflate
    their min over only collided cells.

    Scale: probes x depth is tiny; the sketch side is depth x 256 rows —
    the join never touches the original corpus.
    """
    pr = probes.select(F.col(key), _cms_cells(key, depth).alias("rb")).select(
        key, F.col("rb.r").alias("r"), F.col("rb.b").alias("b")
    )
    cell_cnt = F.when(
        F.col("depth").isNotNull() & (F.col("depth") != F.lit(depth)),
        F.raise_error(
            F.lit(f"cms_estimate depth={depth} does not match the sketch's depth")
        ).cast("long"),
    ).otherwise(F.coalesce(F.col("cnt"), F.lit(0)))
    return (
        pr.join(F.broadcast(sketch), ["r", "b"], "left_outer")
        .groupBy(key)
        .agg(F.min(cell_cnt).cast("long").alias("est_n"))
    )


def _hll_reg_rho(key: str, *, m: int = 64):
    """(register, rho) columns for one key under the portable HLL hashing:
    register = first md5 hex byte mod m; rho = 1 + leading zero BITS of the
    52-bit value in hex digits 3..15, derived from the leading-'0' run plus
    the first nonzero digit's high-bit position — pure string/CASE math
    that a SQL oracle replays verbatim (no numeric base conversion).
    Formats are load-bearing for sketch/oracle agreement, like _cms_cells.
    """
    h = F.md5(F.concat(F.lit("hll:"), F.col(key).cast("string")))
    reg = (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % m).alias("reg")
    s13 = F.substring(h, 3, 13)
    lz = F.length(F.regexp_extract(s13, "^0*", 0))
    first = s13.substr(lz + F.lit(1), F.lit(1))
    extra = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = (
        F.when(lz == 13, F.lit(53)).otherwise(lz * 4 + extra + 1).cast("int").alias("rho")
    )
    return reg, rho


def hll_registers(df: DataFrame, key: str, group: str, *, m: int = 64) -> DataFrame:
    """Portable HyperLogLog registers per group: (group, reg, r) with
    r = MAX(rho) — the canonical mergeable distinct sketch, md5-hashed so
    any SQL engine recomputes it bit-for-bit (contrast core.py's
    approx_distinct_custkeys, which exposes Spark's built-in HLL++ only
    through a tolerance predicate because its sketch is implementation-
    internal).

    Scale: ONE pass; the groupBy partially aggregates map-side, so the
    exchange carries at most |groups| x m rows regardless of corpus size
    or key cardinality — the fixed-memory property that replaces exact
    countDistinct's full shuffle of distinct values at 100 TB. Registers
    from shards or streaming micro-batches merge by MAX on (group, reg).
    """
    if m < 1 or 256 % m != 0:
        # register = first md5 byte mod m: uniform only when m divides 256
        raise ValueError(f"m must divide 256 evenly, got {m}")
    reg, rho = _hll_reg_rho(key, m=m)
    return (
        df.select(F.col(group), reg, rho)
        .groupBy(group, "reg")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(registers: DataFrame, group: str, *, m: int = 64) -> DataFrame:
    """Distinct-count estimate from hll_registers: the raw HLL harmonic
    mean alpha_m * m^2 / Z, with Z summing 2^-r over present registers
    plus 1.0 per absent (zero) register. Every term 2^-r is an EXACT
    power of two (1.0 / shiftleft(1L, r) — integer shift, exact division),
    so Z is deterministic across engines and summation orders, and the
    final division is a single correctly-rounded IEEE op — no libm in the
    hash-verified path (the standard small/large-range LOG corrections are
    deliberately omitted: alpha is exact arithmetic, ln() is not).
    Emits (group, n_regs_set, hll_est)."""
    alpha = 0.7213 / (1 + 1.079 / m)
    return (
        registers.groupBy(group)
        .agg(
            F.count("*").cast("long").alias("n_regs_set"),
            F.sum(F.expr("1.0 / shiftleft(cast(1 as bigint), r)")).alias("_z_set"),
        )
        .select(
            group,
            "n_regs_set",
            F.round(
                F.lit(alpha) * m * m / (F.col("_z_set") + (m - F.col("n_regs_set"))), 4
            ).alias("hll_est"),
        )
    )


def kmv_sketches(df: DataFrame, key: str, group: str, *, k: int = 256) -> DataFrame:
    """K-minimum-values sketch per group: the k lexicographically smallest
    md5 hashes of the group's distinct keys — (group, h, rnk). The KMV
    complement to hll_registers: registers estimate cardinality, KMV
    additionally supports SET ALGEBRA (union/intersection/Jaccard between
    groups) because the sketch retains comparable hash samples.

    Portable by the same rule as every sketch here: h = md5('kmv:'||key),
    ordered as a hex STRING — no numeric conversion anywhere in the
    sketch, so a SQL oracle replays it byte-for-byte. Scale: one distinct
    pass, then a per-group top-k rank — at extreme group counts the rank
    is a bounded window per group; the sketch output is |groups| x k rows
    regardless of corpus size, and sketches merge by re-ranking unioned
    hashes (used by kmv_pairwise_overlap below).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    hashed = df.select(
        F.col(group), F.md5(F.concat(F.lit("kmv:"), F.col(key).cast("string"))).alias("h")
    ).distinct()
    w = Window.partitionBy(group).orderBy("h")
    return (
        hashed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(group, "h", "rnk")
    )


def kmv_pairwise_overlap(sketches: DataFrame, group: str, *, k: int = 256) -> DataFrame:
    """Estimate union size and Jaccard for every unordered pair of groups
    from their KMV sketches ALONE (no return to the raw data): merge the
    two hash samples, keep the k smallest of the union, read the union
    estimate (k-1)/h_(k) from the k-th normalized hash (exact count when
    the merged sample never fills k), and the Jaccard estimate from the
    fraction of the merged sample present in both sketches. Emits
    (grp_a, grp_b, kmv_common, jaccard_est, est_union, est_intersection).

    Scale: the pairwise stage is |groups|^2 x k rows of 32-char strings —
    sketch-sized, never data-sized; everything downstream of kmv_sketches
    runs on sketches regardless of corpus scale, which is the operational
    point of KMV set algebra (cross-source overlap matrices without
    cross-source shuffles). Hash->number conversion happens only at the
    estimator: first 8 hex digits / 2^32, one exact IEEE division, so the
    estimates hash-verify cross-engine.
    """
    s = sketches.select(F.col(group).alias("g"), "h")
    gs = s.select("g").distinct()
    pairs = gs.select(F.col("g").alias("grp_a")).join(
        gs.select(F.col("g").alias("grp_b")), F.col("grp_a") < F.col("grp_b")
    )
    ha = pairs.join(
        s.select(F.col("g").alias("grp_a"), "h"), "grp_a"
    ).select("grp_a", "grp_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    hb = pairs.join(
        s.select(F.col("g").alias("grp_b"), "h"), "grp_b"
    ).select("grp_a", "grp_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        ha.unionByName(hb)
        .groupBy("grp_a", "grp_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("grp_a", "grp_b").orderBy("h")
    kept = merged.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
    hk_norm = F.conv(F.substring(F.max("h"), 1, 8), 16, 10).cast("double") / F.lit(
        float(1 << 32)
    )
    agg = kept.groupBy("grp_a", "grp_b").agg(
        F.count("*").alias("n_sample"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("kmv_common"),
        hk_norm.alias("_hk"),
    )
    est_union = F.when(
        F.col("n_sample") < k, F.col("n_sample").cast("double")
    ).otherwise(F.round((k - 1) / F.col("_hk"), 4))
    return agg.select(
        "grp_a",
        "grp_b",
        "kmv_common",
        F.round(F.col("kmv_common") / F.col("n_sample"), 4).alias("jaccard_est"),
        est_union.alias("est_union"),
        F.round(F.col("kmv_common") / F.col("n_sample") * est_union, 4).alias(
            "est_intersection"
        ),
    )


def histogram_sketch(
    df: DataFrame, col: str, group: str, *, lo: float, hi: float, bins: int
) -> DataFrame:
    """Fixed-bin histogram per group: (group, bin, cnt) with equal-width
    bins over [lo, hi) and clamped tails — the deterministic quantile
    sketch (contrast percentile_approx's t-digest, whose internals are
    implementation-defined and can only be oracle-checked through a
    tolerance flag). One pass, map-side partial counts; the exchange
    carries at most |groups| x bins rows at any corpus size, and
    histograms from shards/streams merge by summing (group, bin)."""
    if bins < 1 or not hi > lo:
        raise ValueError(f"need bins >= 1 and hi > lo, got bins={bins}, [{lo}, {hi})")
    width = (hi - lo) / bins
    b = F.least(
        F.greatest(F.floor((F.col(col) - lo) / width), F.lit(0)), F.lit(bins - 1)
    ).cast("long")
    return (
        df.select(F.col(group), b.alias("bin"))
        .groupBy(group, "bin")
        .agg(F.count("*").alias("cnt"))
    )


def histogram_quantile(
    hist: DataFrame, group: str, q: float, *, lo: float, hi: float, bins: int
) -> DataFrame:
    """Quantile estimate from a histogram_sketch by linear interpolation
    WITHIN the target bin: find the first bin whose cumulative count
    reaches q * total, then walk q's remaining mass through it. Every
    input is an integer count, so the estimate is pure deterministic IEEE
    arithmetic — the whole sketch+estimator chain hash-verifies
    cross-engine. Emits (group, n_rows, est)."""
    width = (hi - lo) / bins
    wcum = Window.partitionBy(group).orderBy("bin")
    wall = Window.partitionBy(group)
    h = (
        hist.withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("total", F.sum("cnt").over(wall))
        .withColumn("target", F.lit(q) * F.col("total"))
    )
    cand = h.filter(F.col("cum").cast("double") >= F.col("target"))
    first = F.row_number().over(Window.partitionBy(group).orderBy("bin"))
    est = (
        F.lit(lo)
        + F.col("bin") * width
        + width
        * (F.col("target") - (F.col("cum") - F.col("cnt")).cast("double"))
        / F.col("cnt").cast("double")
    )
    return (
        cand.withColumn("_rn", first)
        .filter(F.col("_rn") == 1)
        .select(group, F.col("total").cast("long").alias("n_rows"), est.alias("est"))
    )
