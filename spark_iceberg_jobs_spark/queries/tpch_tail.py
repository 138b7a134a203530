"""TPC-H long-tail query shapes — the 13 dialect patterns core.py doesn't cover.

core.py carries q1/q3/q4/q5/q6/q7/q10/q14/q18; this module completes the
TPC-H pattern set (q2/q8/q9/q11/q12/q13/q15/q16/q17/q19/q20/q21/q22) on the
driver's fixture schema. The fixtures have no ``partsupp`` table and omit
several TPC-H columns (commitdate/receiptdate/shipmode/phone/container/
supplycost), so each query is a *shape-faithful adaptation*: the relational
pattern that makes the query interesting — correlated-min subquery, two-role
dimension join, scalar-subquery HAVING, EXISTS/NOT-EXISTS pairs, NOT IN,
OR-of-ANDs pushdown, histogram-of-counts — is preserved exactly; only the
literals and the supply-cost proxy change. Each docstring names the pattern
and the 100 TB plan shape.

Float discipline (SURVEY.md §7.3c): aggregates that cross the oracle boundary
are ROUND()ed identically on both sides; equality joins on computed doubles
(q2 min-cost, q15 max-revenue) compare values produced by identical IEEE
operations on identical inputs inside EACH engine, so they are
engine-deterministic even though the two engines' sums may differ in ulps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cache import scoped_persist
from ..functions.money import SQL_REVENUE as SQL_REV
from ..functions.money import dec_sum, fast_money_sum, money, revenue_dec
from ..sources.readers import load_tables
from . import QuerySpec


def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# Q2: correlated-min subquery (min-cost supplier per part)
# --------------------------------------------------------------------------


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) offering the
    minimum supply cost — a correlated-min subquery decorrelated into a
    grouped-min + equality join.

    Supply cost proxy (no partsupp table): MIN(l_extendedprice/l_quantity)
    per (part, supplier) over lineitem.

    Scale: ONE pass over the fact — the per-(part,supplier) grouped-min
    shuffles once, then the per-part min is a window PARTITIONED BY
    l_partkey over the (already small) grouped rows. A groupBy-then-join
    decorrelation would recompute the base aggregation for each consumer
    (Spark does not share CTEs the way DuckDB does); the window form
    computes it once. Dims broadcast; no unpartitioned frame anywhere.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation", "region")
    persupp = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = persupp.withColumn("min_cost", F.min("supply_cost").over(w)).filter(
        F.col("supply_cost") == F.col("min_cost")
    )
    europe_nations = t["nation"].join(
        F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return (
        best.join(
            F.broadcast(t["part"].filter(F.col("p_type") == "LARGE")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(europe_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("supply_cost", 4).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


Q2_ORACLE = """
WITH persupp AS (
    SELECT l_partkey, l_suppkey,
           MIN(l_extendedprice / l_quantity) AS supply_cost
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
best AS (
    SELECT * FROM (
        SELECT persupp.*,
               MIN(supply_cost) OVER (PARTITION BY l_partkey) AS min_cost
        FROM persupp
    ) WHERE supply_cost = min_cost
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       ROUND(supply_cost, 4) AS supply_cost
FROM best
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_type = 'LARGE' AND r_name = 'EUROPE'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# Q8: two-role dimension join (national market share)
# --------------------------------------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: nation plays two roles (customer's and supplier's),
    joined twice under different aliases; market share is a conditional-sum
    ratio per year.

    NATION_6's share of ECONOMY-part revenue delivered into AMERICA during
    1996-1997.

    Scale: both nation roles and part are broadcast; the two fact joins
    (lineitem⋈orders, ⋈customer) shuffle on their keys; the final agg has
    |years| groups. Scan-bound, as Q8 should be.
    """
    t = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "part", "nation", "region"
    )
    cust_nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cust_nationkey"))
    )
    supp_nation = t["nation"].select(
        F.col("n_nationkey").alias("supp_nationkey"), F.col("n_name").alias("supp_nation")
    )
    rev = revenue_dec()
    zero = F.lit(0).cast("decimal(18,2)")
    num = F.sum(F.when(F.col("supp_nation") == "NATION_6", rev).otherwise(zero))
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "ECONOMY")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") <= F.lit("1997-12-31"))
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nations), F.col("c_nationkey") == F.col("cust_nationkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("supp_nationkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(num.cast("double") / F.sum(rev).cast("double"), 4).alias(
                "mkt_share"
            )
        )
        .orderBy("o_year")
    )


Q8_ORACLE = f"""
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       ROUND(CAST(SUM(CASE WHEN n2.n_name = 'NATION_6'
                      THEN {SQL_REV} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM({SQL_REV}) AS DOUBLE), 4) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY'
  AND r_name = 'AMERICA'
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY o_year
ORDER BY o_year
"""


# --------------------------------------------------------------------------
# Q9: product-type profit by nation and year
# --------------------------------------------------------------------------


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: LIKE-filtered part dimension, profit expression
    combining fact and dimension columns, grouped by (nation, year).

    Supply-cost proxy (no partsupp): 0.5 * p_retailprice per unit, so
    amount = revenue - 0.5 * p_retailprice * l_quantity.

    Scale: part filtered by LIKE then broadcast; supplier-nation broadcast;
    one fact shuffle for orders (for the year), final agg |nations|×|years|
    groups.
    """
    t = load_tables(spark, sf_dir, "lineitem", "orders", "supplier", "part", "nation")
    # Narrow decimal(12,2) casts keep the three-factor product inside
    # precision 38 (no Spark precision-loss truncation); fixture money
    # values are < 1e10 so the casts are lossless.
    m12 = lambda c: F.col(c).cast("decimal(12,2)")  # noqa: E731
    half = F.lit("0.5").cast("decimal(2,1)")
    rev = m12("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - m12("l_discount"))
    amount = rev - half * (m12("p_retailprice") * m12("l_quantity"))
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("%red%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dec_sum(amount).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_ORACLE = """
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))
                 - CAST(0.5 AS DECIMAL(2,1)) * (CAST(p_retailprice AS DECIMAL(12,2))
                   * CAST(l_quantity AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


# --------------------------------------------------------------------------
# Q11: scalar-subquery HAVING (important stock identification)
# --------------------------------------------------------------------------


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value vs a fraction of the global total —
    a scalar subquery in the HAVING clause.

    Stock-value proxy (no partsupp): SUM(l_extendedprice * l_quantity) per
    part, restricted to suppliers in EUROPE nations.

    Scale: one shuffle on l_partkey with map-side partials; the per-part
    result is persisted (scoped — it is |parts| rows, post-agg) because it
    feeds TWO consumers (the global average and the filter) and Spark would
    otherwise re-scan the fact for each; the average is one broadcast row.
    The threshold is 2× the MEAN per-part value rather than TPC-H's fixed
    fraction of the total: a fixed fraction selects a constant number of
    parts regardless of corpus size (TPC-H itself rescales it by 1/SF),
    while a mean multiple keeps the query's selectivity stable at any
    scale.
    """
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation", "region")
    europe_supps = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    per_part = scoped_persist(
        t["lineitem"]
        .join(F.broadcast(europe_supps), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(money("l_extendedprice") * money("l_quantity")).alias("sv_dec")
        )
    )
    total = per_part.agg(
        (F.sum("sv_dec").cast("double") / F.count(F.lit(1))).alias("avg_value")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("sv_dec").cast("double") > 2.0 * F.col("avg_value"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("sv_dec", 2).cast("double").alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), "p_partkey")
    )


Q11_ORACLE = """
WITH per_part AS (
    SELECT l_partkey,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2))) AS sv_dec
    FROM lineitem
    WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE')
    GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(ROUND(sv_dec, 2) AS DOUBLE) AS stock_value
FROM per_part
WHERE CAST(sv_dec AS DOUBLE) > 2.0 * (SELECT CAST(SUM(sv_dec) AS DOUBLE) / COUNT(*)
                                      FROM per_part)
ORDER BY CAST(ROUND(sv_dec, 2) AS DOUBLE) DESC, p_partkey
"""


# --------------------------------------------------------------------------
# Q12: CASE-bucketed conditional counts (shipping-delay classes)
# --------------------------------------------------------------------------


def q12_shipping_delay_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + CASE-WHEN bucketing + conditional counts.

    Shipmode proxy (column absent): delay class SLOW/FAST by whether the
    lineitem shipped >60 days after the order date; counts split by
    urgent-vs-other order priority, 1997 shipments only.

    Scale: the date filter pushes to the lineitem scan; one shuffle join on
    orderkey (AQE-planned); 2-group final agg.
    """
    t = load_tables(spark, sf_dir, "lineitem", "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "delay_class",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                F.lit("SLOW"),
            ).otherwise(F.lit("FAST")),
        )
        .groupBy("delay_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("delay_class")
    )


Q12_ORACLE = """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
            THEN 'SLOW' ELSE 'FAST' END AS delay_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY delay_class
ORDER BY delay_class
"""


# --------------------------------------------------------------------------
# Q13: histogram of per-key counts (customer order distribution)
# --------------------------------------------------------------------------


def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join, per-customer order count (nulls
    count as zero), then a second aggregation over the counts — a
    histogram-of-counts.

    Scale: two shuffles by construction (counts keyed by custkey, histogram
    keyed by count) — the second input is |customers| rows of two longs, and
    the histogram agg is map-side-combinable down to |distinct counts|.
    """
    t = load_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer
    LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
# Q15: argmax vs a scalar subquery (top supplier by quarterly revenue)
# --------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a revenue view per supplier over one quarter, then
    select the supplier(s) whose revenue equals the global max — scalar
    subquery equality, returning all ties.

    Scale: per-supplier agg shuffles on suppkey, persisted (scoped — it is
    |suppliers| rows, post-agg) because both the max and the filter consume
    it and Spark would otherwise scan the fact twice; the max re-aggregates
    it to one broadcast row.

    Determinism (ADVICE r2): the equality runs on revenue ROUNDED to cents
    BEFORE the max — each engine's sum is exact within itself, but Spark
    and DuckDB accumulate doubles in different orders, so two suppliers
    within ulp of each other could otherwise flip membership between
    engines at a new scale factor. Cent-rounding compares values ~13
    orders of magnitude above ulp noise; suppliers tied at the cent are
    returned by BOTH engines identically.
    """
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    revenue = scoped_persist(
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(fast_money_sum(_revenue()).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_ORACLE = """
WITH revenue AS (
    -- exact decimal sum, cent-rounded BEFORE the max, mirroring the Spark
    -- side: the equality compares identical doubles in both engines
    SELECT l_suppkey,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
               AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q16: NOT IN exclusion + count-distinct per group
# --------------------------------------------------------------------------


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN subquery excluding flagged suppliers, then
    COUNT(DISTINCT supplier) per part attribute group.

    Complaint-supplier proxy (no s_comment): s_acctbal < 0.

    Scale: the exclusion list is tiny and broadcast as an anti join; the
    distinct-count shuffles (brand, type, size, suppkey) with partial
    distinct before the final count — never a global distinct.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(
            F.broadcast(
                t["part"].filter(
                    (F.col("p_brand") != "Brand#1")
                    & (F.col("p_type") != "PROMO")
                    & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Q17: correlated average subquery (small-quantity revenue)
# --------------------------------------------------------------------------


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated AVG subquery — lineitems whose quantity is
    below 20% of the average quantity for their part, revenue / 7 years.

    Scale: decorrelated into an AVG window PARTITIONED BY l_partkey over the
    brand-pruned lineitems — ONE scan, ONE shuffle (a groupBy-avg joined
    back would recompute the pruned scan for each consumer). The brand
    filter restricts the *outer* side only; the inner average is over all
    lineitems of those parts, so the window input is partkey-pruned via a
    broadcast semi join before aggregating — never a full-corpus agg for an
    85-part brand.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part")
    brand_parts = t["part"].filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    li = t["lineitem"].join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("qty_threshold", 0.2 * F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum(money("l_extendedprice")).cast("double") / 7.0, 2).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_lineitems"),
        )
    )


Q17_ORACLE = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2)
           AS avg_yearly,
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN part ON l.l_partkey = p_partkey
WHERE p_brand = 'Brand#3'
  AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


# --------------------------------------------------------------------------
# Q19: disjunctive multi-predicate join (OR-of-ANDs pushdown)
# --------------------------------------------------------------------------


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a join whose predicate is an OR of three AND-groups
    mixing fact and dimension columns — the canonical test that the planner
    extracts the common join key and pushes the per-table residuals down.

    Scale: Catalyst factors l_partkey = p_partkey out of the disjunction
    (join key), pushes the p_brand/p_size union filter into the broadcast
    part build side and the l_quantity range union into the lineitem scan.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            dec_sum(revenue_dec()).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


Q19_ORACLE = f"""
SELECT CAST(ROUND(SUM({SQL_REV}), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------------------
# Q20: nested IN subqueries (concentrated shippers of a part family)
# --------------------------------------------------------------------------


def q20_concentrated_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries — suppliers qualified by a
    correlated aggregate over a LIKE-selected part family, then filtered by
    nation membership.

    Availqty proxy (no partsupp): a supplier qualifies when its 1997
    shipped quantity of 'small%' parts exceeds 18% of its all-time shipped
    quantity of those parts (1997 is one of ~6.6 fixture years, so 18% means
    "concentrated in 1997 above baseline").

    Determinism (ADVICE r2, resolved by inspection): l_quantity is
    integer-valued in the fixtures (verified: zero non-integral rows at
    sf0.1), so both SUMs are EXACT doubles regardless of accumulation
    order, and 0.18 * total_qty is one identical IEEE multiply in both
    engines — the threshold compare cannot flip across engines or scale
    factors while quantities stay integral below 2^53.

    Scale: the part family is broadcast-semi-joined into the fact, then the
    all-time and 1997 quantities are a SINGLE conditional aggregation — one
    scan, one suppkey shuffle; the two-subquery formulation the oracle runs
    would scan the pruned fact twice and join the results. The AFRICA
    supplier filter is a broadcast semi join at the end.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation", "region")
    small_parts = t["part"].filter(F.col("p_name").like("small%")).select("p_partkey")
    li = t["lineitem"].join(
        F.broadcast(small_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    in_97 = (F.col("l_shipdate") >= F.lit("1997-01-01")) & (
        F.col("l_shipdate") < F.lit("1998-01-01")
    )
    qualified = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            F.sum(F.when(in_97, F.col("l_quantity")).otherwise(0.0)).alias("qty_97"),
        )
        .filter(F.col("qty_97") > 0.18 * F.col("total_qty"))
        .select("l_suppkey")
    )
    africa_nations = t["nation"].join(
        F.broadcast(t["region"].filter(F.col("r_name") == "AFRICA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return (
        t["supplier"]
        .join(F.broadcast(qualified), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(africa_nations), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_ORACLE = """
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
    WITH li AS (
        SELECT * FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    )
    SELECT t.l_suppkey
    FROM (SELECT l_suppkey, SUM(l_quantity) AS total_qty FROM li GROUP BY l_suppkey) t
    JOIN (SELECT l_suppkey, SUM(l_quantity) AS qty_97 FROM li
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey) y ON t.l_suppkey = y.l_suppkey
    WHERE y.qty_97 > 0.18 * t.total_qty
)
AND s_nationkey IN (
    SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AFRICA')
ORDER BY s_name
"""


# --------------------------------------------------------------------------
# Q21: EXISTS + NOT EXISTS pair (suppliers who kept orders waiting)
# --------------------------------------------------------------------------


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the hardest subquery pattern — an EXISTS (another
    supplier contributed to the order) and a NOT EXISTS (no OTHER supplier
    was late) against the same fact, per candidate row.

    Late proxy (no receipt/commit dates): shipped >1000 days after order.

    Scale: the EXISTS/NOT-EXISTS pair decorrelates into per-order supplier
    sets — ``collect_set`` windows PARTITIONED BY orderkey — so ONE
    orderkey-keyed exchange (reused from the orders join, which partitions
    on the same key) feeds both probes, and the fact is scanned ONCE. A
    semi+anti-join formulation would recompute the lineitem⋈orders join
    for each of its three roles (Spark does not share subplans the way
    DuckDB shares CTEs). A candidate is late with ≥2 suppliers in the
    order and exactly 1 late supplier (itself, since the row is late).
    Per-order supplier sets are bounded by order width, so the window
    state is small.
    """
    t = load_tables(spark, sf_dir, "lineitem", "orders", "supplier", "nation", "region")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 1000 DAYS")
    f_orders = t["orders"].filter(F.col("o_orderstatus") == "F")
    li = (
        t["lineitem"]
        .join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", late.alias("is_late"))
    )
    w = Window.partitionBy("l_orderkey")
    cand = (
        li.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .filter(F.col("is_late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    asia_nations = t["nation"].join(
        F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return (
        cand.join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 1000 DAY
  AND s_nationkey IN (
      SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 1000 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# --------------------------------------------------------------------------
# Q22: anti join + scalar subquery (dormant high-balance customers)
# --------------------------------------------------------------------------


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers above the average positive account balance
    (scalar subquery) with no recent orders (NOT EXISTS → anti join),
    grouped by a derived code.

    Adaptations: every fixture customer has ≥1 order, so "never ordered"
    becomes "no order since 2001-01-01" (the TPC-H intent — dormancy); the
    phone country code (column absent) becomes c_nationkey % 7.

    Scale: the scalar average is one broadcast row; the anti join keys on
    custkey against the date-filtered orders projection; final agg has ≤7
    groups.
    """
    t = load_tables(spark, sf_dir, "customer", "orders")
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(money("c_acctbal")).cast("double") / F.count("c_acctbal")).alias(
                "avg_bal"
            )
        )
    )
    recent = t["orders"].filter(F.col("o_orderdate") >= F.lit("2001-01-01")).select("o_custkey")
    return (
        t["customer"]
        .withColumn("cntrycode", (F.col("c_nationkey") % 7).cast("long"))
        .filter(F.col("cntrycode").isin(1, 2, 3, 4, 5))
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(money("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_ORACLE = """
SELECT CAST(c_nationkey % 7 AS BIGINT) AS cntrycode,
       COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_nationkey % 7 IN (1, 2, 3, 4, 5)
  AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                          / COUNT(c_acctbal)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY cntrycode
ORDER BY cntrycode
"""


QUERIES: dict[str, QuerySpec] = {
    "q2_min_cost_supplier": QuerySpec(q2_min_cost_supplier, Q2_ORACLE),
    "q8_market_share": QuerySpec(q8_market_share, Q8_ORACLE),
    "q9_product_type_profit": QuerySpec(q9_product_type_profit, Q9_ORACLE),
    "q11_important_stock": QuerySpec(q11_important_stock, Q11_ORACLE),
    "q12_shipping_delay_classes": QuerySpec(q12_shipping_delay_classes, Q12_ORACLE),
    "q13_customer_order_distribution": QuerySpec(
        q13_customer_order_distribution, Q13_ORACLE
    ),
    "q15_top_supplier": QuerySpec(q15_top_supplier, Q15_ORACLE),
    "q16_part_supplier_counts": QuerySpec(q16_part_supplier_counts, Q16_ORACLE),
    "q17_small_quantity_revenue": QuerySpec(q17_small_quantity_revenue, Q17_ORACLE),
    "q19_disjunctive_revenue": QuerySpec(q19_disjunctive_revenue, Q19_ORACLE),
    "q20_concentrated_shippers": QuerySpec(q20_concentrated_shippers, Q20_ORACLE),
    "q21_waiting_suppliers": QuerySpec(q21_waiting_suppliers, Q21_ORACLE, headline=True),
    "q22_dormant_customers": QuerySpec(q22_dormant_customers, Q22_ORACLE),
}
