"""Event-analytics queries (EXTENSION X6) with DuckDB oracles.

Window starts / durations are emitted as epoch-second BIGINTs on both sides
so timestamp precision (parquet ns vs Spark µs) and timezone never enter the
comparison. DuckDB's EPOCH() returns a DOUBLE with fractional seconds, hence
the CAST(FLOOR(...) AS BIGINT) mirroring Spark's unix_timestamp floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import money, money_sum
from ..operators.events import running_agg, sessionize, sliding_window_agg, tumbling_window_agg
from ..sources.readers import read_fixture
from . import QuerySpec


def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window event counts and value sums per event type."""
    events = read_fixture(spark, sf_dir, "events")
    return tumbling_window_agg(events, duration="1 hour", group_extra=["event_type"])


TUMBLING_ORACLE = """
SELECT CAST(EPOCH(DATE_TRUNC('hour', ts)) AS BIGINT) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1h long, every 30min): each event counts in 2 windows."""
    events = read_fixture(spark, sf_dir, "events")
    return sliding_window_agg(events, duration_sec=3600, slide_sec=1800)


SLIDING_ORACLE = """
WITH grid AS (
    SELECT *,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) // 1800 * 1800 AS g
    FROM events
), expanded AS (
    SELECT UNNEST([g, g - 1800]) AS window_start, value
    FROM grid
)
SELECT window_start, COUNT(*) AS n_events, CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
FROM expanded
GROUP BY window_start
"""


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30-min inactivity) per user."""
    events = read_fixture(spark, sf_dir, "events")
    return sessionize(events, gap_sec=1800)


SESSION_ORACLE = """
WITH e AS (
    SELECT user_id, event_id, value,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS es,
           ts
    FROM events
), gaps AS (
    SELECT *,
           CASE WHEN es - LAG(es) OVER (PARTITION BY user_id ORDER BY DATE_TRUNC('microsecond', ts), event_id) > 1800
                  OR LAG(es) OVER (PARTITION BY user_id ORDER BY DATE_TRUNC('microsecond', ts), event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM e
), ids AS (
    SELECT *,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY DATE_TRUNC('microsecond', ts), event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM gaps
)
-- windowed SUM yields DuckDB HUGEINT which pandas fetches as float64 and the
-- driver stringifies as '3.0' vs Spark's BIGINT '3' — cast to match Spark
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       COUNT(*) AS n_events,
       MAX(es) - MIN(es) AS duration_sec,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS session_value
FROM ids
GROUP BY user_id, session_seq
"""


def events_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running total of event value."""
    events = read_fixture(spark, sf_dir, "events")
    return running_agg(events)


RUNNING_ORACLE = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id ORDER BY DATE_TRUNC('microsecond', ts), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_value
FROM events
"""


def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull the integer out of the ``props`` JSON
    string with a regex (JVM-side regexp_extract, no Python UDF) and
    aggregate it per event type."""
    events = read_fixture(spark, sf_dir, "events")
    return (
        events.withColumn(
            "k", F.expr(r"try_cast(regexp_extract(props, '(\\d+)', 1) AS BIGINT)")
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


PROPS_ORACLE = """
SELECT event_type,
       CAST(SUM(TRY_CAST(REGEXP_EXTRACT(props, '(\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def events_top_purchasers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter one event type, rank users by total value, top 10."""
    events = read_fixture(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(money_sum("value").alias("purchase_value"))
        .orderBy(F.desc("purchase_value"), F.asc("user_id"))
        .limit(10)
    )


TOP_PURCHASERS_ORACLE = """
SELECT user_id, CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS purchase_value
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id
ORDER BY purchase_value DESC, user_id
LIMIT 10
"""


def events_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operator Spark lacks natively): each purchase matched to
    the same user's most recent strictly-earlier click. Microsecond epoch
    on both sides so Spark's union-window sweep and DuckDB's native ASOF
    JOIN resolve identical winners."""
    from ..operators.joins import asof_join

    ev = read_fixture(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id"), us.alias("p_us")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", us.alias("c_us"), F.col("value").alias("click_value")
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="p_us",
        right_ts="c_us",
        right_cols=["c_us", "click_value"],
        strict=True,
    )
    return out.select(
        "event_id",
        "user_id",
        F.expr("p_us DIV 1000000").alias("purchase_es"),
        F.expr("asof_c_us DIV 1000000").alias("click_es"),
        F.expr("(p_us - asof_c_us) DIV 1000000").alias("gap_sec"),
        F.col("asof_click_value").alias("click_value"),
    )


ASOF_ORACLE = """
WITH e AS (
    SELECT event_id, user_id, event_type, value, EPOCH_US(ts) AS us FROM events
), p AS (
    SELECT event_id, user_id, us AS p_us FROM e WHERE event_type = 'purchase'
), c AS (
    SELECT user_id, us AS c_us, value AS click_value FROM e WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id,
       p.p_us // 1000000 AS purchase_es,
       c.c_us // 1000000 AS click_es,
       (p.p_us - c.c_us) // 1000000 AS gap_sec,
       c.click_value
FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.p_us > c.c_us
"""


def events_range_join_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via time-band bucketing: all events within one hour after
    a signup by the same user, aggregated per follow-up type."""
    from ..operators.joins import banded_range_join

    ev = read_fixture(spark, sf_dir, "events")
    es = F.unix_timestamp("ts")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("signup_id"), es.alias("s_es")
    )
    follows = ev.select(
        "user_id",
        F.col("event_id").alias("follow_id"),
        F.col("event_type"),
        "value",
        es.alias("f_es"),
    )
    pairs = banded_range_join(
        signups, follows, on="user_id", left_es="s_es", right_es="f_es", max_gap_sec=3600
    )
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count("*").alias("n_followups"),
            F.countDistinct("signup_id").alias("n_signups"),
            money_sum("value").alias("sum_value"),
        )
        .orderBy("event_type")
    )


RANGE_JOIN_ORACLE = """
WITH e AS (
    SELECT event_id, user_id, event_type, value,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS es
    FROM events
), s AS (
    SELECT event_id AS signup_id, user_id, es AS s_es FROM e WHERE event_type = 'signup'
), f AS (
    SELECT event_id AS follow_id, user_id, event_type, value, es AS f_es FROM e
)
SELECT f.event_type,
       COUNT(*) AS n_followups,
       COUNT(DISTINCT s.signup_id) AS n_signups,
       CAST(ROUND(SUM(CAST(f.value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
FROM s JOIN f ON s.user_id = f.user_id
             AND f.f_es > s.s_es AND f.f_es <= s.s_es + 3600
GROUP BY f.event_type
ORDER BY f.event_type
"""


def events_pivot_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts as one column per event type (explicit
    value list — never let pivot scan for distinct values at scale)."""
    ev = read_fixture(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, [f"{t}" for t in types])
        .select("user_id", *[F.col(t).alias(f"n_{t}") for t in types])
    )


PIVOT_ORACLE = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events
GROUP BY user_id
"""


def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window operator (gap-closing windows) — the
    built-in twin of the manual lag/cumsum sessionize: same 30-min-gap
    semantics, one groupBy, no explicit window functions. Verified against
    the manual formulation's oracle (session start = min event second)."""
    ev = read_fixture(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            money_sum("value").alias("session_value"),
            F.unix_timestamp(F.min("ts")).alias("start_es"),
        )
        .select("user_id", "start_es", "n_events", "session_value")
    )


SESSION_NATIVE_ORACLE = """
-- session_window merges while the µs-precision gap is <= 30min (verified
-- empirically: an exactly-1800s gap merges, 1800s+1µs splits), so the gap
-- test here runs on EPOCH_US, not floor-seconds
WITH e AS (
    SELECT user_id, event_id, value,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS es,
           EPOCH_US(ts) AS us, ts
    FROM events
), gaps AS (
    SELECT *,
           CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000
                  OR LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM e
), ids AS (
    SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM gaps
)
SELECT user_id, MIN(es) AS start_es, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS session_value
FROM ids
GROUP BY user_id, session_seq
"""


def events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line concurrency: the peak number of simultaneously-active
    sessions per hour. Sessions (30-min gap) become +1/-1 boundary events;
    a running sum ordered by (time, delta) is the live count — ends sort
    before starts at the same second so touching sessions don't
    double-count. Per-hour MAX over the running count is deterministic even
    with tied timestamps (the partial-sum multiset is order-free within a
    tie group).

    Scale design (VERDICT r1 item 3): the sweep is partitioned by DAY — each
    day's boundary points prefix-sum independently in parallel, then a
    carry-in offset (the cumulative net delta of all PRIOR days) shifts each
    day's local count to the global count. Prefix sums are associative, so
    carry_in(day) + local_running == global running sum, exactly. The only
    unpartitioned window left runs over the per-day totals table — ONE ROW
    PER DAY (~36k rows per century), not per boundary point — and the
    offsets join back by broadcast. Hours nest inside days, so the per-hour
    MAX grouping is unaffected by partition boundaries. The remaining 100 TB
    cost driver is the sessionization window, which is already
    user-partitioned; the spans table would be persisted there to avoid the
    two-branch recompute (points feed both the sweep and the day totals)."""
    from pyspark.sql import Window

    ev = read_fixture(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp("ts")
    with_gap = ev.withColumn(
        "_new",
        F.when(
            (epoch - F.lag(epoch).over(w)).isNull()
            | ((epoch - F.lag(epoch).over(w)) > 1800),
            1,
        ).otherwise(0),
    )
    with_id = with_gap.withColumn(
        "session_seq", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    spans = with_id.groupBy("user_id", "session_seq").agg(
        F.min(epoch).alias("start_es"), F.max(epoch).alias("end_es")
    )
    points = (
        spans.select(F.col("start_es").alias("es"), F.lit(1).alias("delta"))
        .unionByName(spans.select(F.col("end_es").alias("es"), F.lit(-1).alias("delta")))
        .withColumn("day", F.floor(F.col("es") / 86400))
    )
    # per-day local prefix sum — parallel across days
    wday = Window.partitionBy("day").orderBy("es", "delta").rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = points.withColumn("local_live", F.sum("delta").over(wday))
    # carry-in = net delta of all strictly-prior days (tiny: one row per day)
    wcarry = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        points.groupBy("day")
        .agg(F.sum("delta").alias("day_total"))
        .withColumn("carry_in", F.coalesce(F.sum("day_total").over(wcarry), F.lit(0)))
        .select("day", "carry_in")
    )
    running = local.join(F.broadcast(offsets), "day").withColumn(
        "live", F.col("local_live") + F.col("carry_in")
    )
    return (
        running.groupBy((F.expr("es DIV 3600") * 3600).alias("hour_start"))
        .agg(F.max("live").alias("max_concurrent"))
        .orderBy("hour_start")
    )


CONCURRENCY_ORACLE = """
WITH e AS (
    SELECT user_id, event_id,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS es, ts
    FROM events
), gaps AS (
    SELECT *,
           CASE WHEN es - LAG(es) OVER (PARTITION BY user_id ORDER BY DATE_TRUNC('microsecond', ts), event_id) > 1800
                  OR LAG(es) OVER (PARTITION BY user_id ORDER BY DATE_TRUNC('microsecond', ts), event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM e
), ids AS (
    SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY DATE_TRUNC('microsecond', ts), event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM gaps
), spans AS (
    SELECT user_id, session_seq, MIN(es) AS start_es, MAX(es) AS end_es
    FROM ids GROUP BY user_id, session_seq
), points AS (
    SELECT start_es AS es, 1 AS delta FROM spans
    UNION ALL
    SELECT end_es, -1 FROM spans
), running AS (
    SELECT es, delta,
           SUM(delta) OVER (ORDER BY es, delta ROWS UNBOUNDED PRECEDING) AS live
    FROM points
)
-- live is a windowed SUM (DuckDB HUGEINT → float64 in pandas) — cast so the
-- driver's stringified hash sees BIGINT '3', matching Spark
SELECT es // 3600 * 3600 AS hour_start, CAST(MAX(live) AS BIGINT) AS max_concurrent
FROM running
GROUP BY 1
ORDER BY 1
"""


def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical rollup: one pass producing day-level,
    (day, hour)-level, and grand-total aggregates via ROLLUP over derived
    time buckets — the continuous-aggregate table a time-series store
    maintains, computed as a single grouping-sets aggregation."""
    ev = read_fixture(spark, sf_dir, "events")
    es = F.unix_timestamp("ts")
    day = (es / 86400).cast("long")
    hour = (es / 3600).cast("long") % 24
    return (
        ev.withColumn("day_num", day)
        .withColumn("hour_of_day", hour)
        .rollup("day_num", "hour_of_day")
        .agg(
            F.count("*").alias("n_events"),
            money_sum("value").alias("sum_value"),
        )
    )


TIME_ROLLUP_ORACLE = """
WITH e AS (
    SELECT CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) // 86400 AS day_num,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) // 3600 % 24 AS hour_of_day,
           value
    FROM events
)
SELECT day_num, hour_of_day, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
FROM e
GROUP BY ROLLUP (day_num, hour_of_day)
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: of all users, how many ever signed up, how many of
    those clicked after their first signup, and how many of those purchased
    after their first post-signup click.

    One lazy Spark action (VERDICT r2 item 4 — was a 4-action driver-side
    chain rebuilding the events scan per stage): three chained conditional
    MINs over the SAME user-partitioned window (one exchange, no sort —
    unordered whole-partition frames), a per-user rollup, a single global
    conditional-count aggregate, and a ``stack`` unpivot to the 4 stage
    rows. Scales as one shuffle on user_id regardless of event volume."""
    from pyspark.sql import Window

    ev = read_fixture(spark, sf_dir, "events")
    es = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t_signup", F.min(F.when(F.col("event_type") == "signup", es)).over(w)
        )
        .withColumn(
            "t_click",
            F.min(
                F.when((F.col("event_type") == "click") & (es > F.col("t_signup")), es)
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (es > F.col("t_click")), es
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("t_signup").alias("t_signup"),
        F.min("t_click").alias("t_click"),
        F.min("t_purchase").alias("t_purchase"),
    )
    counts = per_user.agg(
        F.count("*").alias("n_all"),
        F.count("t_signup").alias("n_signup"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
    )
    return counts.select(
        F.expr(
            "stack(4, '1_all_users', n_all, '2_signed_up', n_signup, "
            "'3_clicked_after_signup', n_click, '4_purchased_after_click', n_purchase) "
            "AS (stage, n_users)"
        )
    )


FUNNEL_ORACLE = """
WITH e AS (
    SELECT user_id, event_type,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS es
    FROM events
), s AS (
    SELECT user_id, MIN(CASE WHEN event_type = 'signup' THEN es END) AS t_signup
    FROM e GROUP BY user_id
), c AS (
    SELECT e.user_id, MIN(es) AS t_click
    FROM e JOIN s ON e.user_id = s.user_id
    WHERE event_type = 'click' AND es > t_signup
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, MIN(es) AS t_purchase
    FROM e JOIN c ON e.user_id = c.user_id
    WHERE event_type = 'purchase' AND es > t_click
    GROUP BY e.user_id
)
SELECT '1_all_users' AS stage, COUNT(DISTINCT user_id) AS n_users FROM e
UNION ALL
SELECT '2_signed_up', COUNT(*) FROM s WHERE t_signup IS NOT NULL
UNION ALL
SELECT '3_clicked_after_signup', COUNT(*) FROM c
UNION ALL
SELECT '4_purchased_after_click', COUNT(*) FROM p
"""


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, distinct
    active users per (cohort_day, day_offset). Two aggregations + one
    broadcastable join — the standard retention triangle."""
    ev = read_fixture(spark, sf_dir, "events")
    day = (F.unix_timestamp("ts") / 86400).cast("long")
    cohorts = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    return (
        ev.select("user_id", day.alias("active_day"))
        .distinct()
        .join(F.broadcast(cohorts), "user_id")
        .groupBy("cohort_day", (F.col("active_day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


RETENTION_ORACLE = """
WITH e AS (
    SELECT user_id,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) // 86400 AS active_day
    FROM events
), cohorts AS (
    SELECT user_id, MIN(active_day) AS cohort_day FROM e GROUP BY user_id
), activity AS (
    SELECT DISTINCT user_id, active_day FROM e
)
SELECT cohort_day, active_day - cohort_day AS day_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM activity a JOIN cohorts c ON a.user_id = c.user_id
GROUP BY cohort_day, day_offset
"""


def streaming_tumbling_hourly_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming twin of events_tumbling_hourly: file-source
    stream → watermarked windows → AvailableNow trigger → memory sink.
    Bounded input ⇒ identical result, so it shares the same DuckDB oracle —
    a streaming pipeline verified against plain SQL."""
    from ..streaming.events_stream import streaming_tumbling_hourly

    return streaming_tumbling_hourly(spark, sf_dir)


def streaming_sliding_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_sliding_1h_30m (shared oracle)."""
    from ..streaming.events_stream import streaming_sliding_1h_30m

    return streaming_sliding_1h_30m(spark, sf_dir)


def streaming_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: every event delivered TWICE (self-union
    simulating at-least-once redelivery), restored to exactly-once by
    watermarked dropDuplicatesWithinWatermark state, then summarized per
    event type. The oracle aggregates the original events — equality proves
    the duplicates were fully removed."""
    from ..streaming.events_stream import streaming_dedup_redelivery

    deduped = streaming_dedup_redelivery(spark, sf_dir)
    return (
        deduped.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            money_sum("value").alias("total_value"),
        )
        .orderBy("event_type")
    )


STREAMING_DEDUP_ORACLE = """
SELECT event_type, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def streaming_purchase_click_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (the canonical streaming
    enrichment): purchases joined to the same user's clicks from the
    preceding hour, both sides streaming with 2h watermarks bounding click
    state, drained with AvailableNow, then summarized per purchase. Bounded
    input ⇒ equal to the batch interval join the oracle runs."""
    from ..streaming.events_stream import (
        run_available_now,
        stream_events,
        stream_stream_purchase_click_join,
    )

    joined = run_available_now(
        stream_stream_purchase_click_join(stream_events(spark, sf_dir), max_gap_sec=3600),
        query_name="ss_join_oracle",
        output_mode="append",
    )
    return (
        joined.groupBy("purchase_id", "user_id")
        .agg(
            F.count("*").alias("n_clicks"),
            money_sum("click_value").alias("click_total"),
        )
        .orderBy("purchase_id")
    )


STREAMING_JOIN_ORACLE = """
WITH p AS (
    SELECT event_id AS purchase_id, user_id, ts AS p_ts
    FROM events WHERE event_type = 'purchase'
), c AS (
    SELECT user_id, ts AS c_ts, value AS click_value
    FROM events WHERE event_type = 'click'
)
SELECT purchase_id, p.user_id AS user_id,
       COUNT(*) AS n_clicks,
       CAST(ROUND(SUM(CAST(click_value AS DECIMAL(18,2))), 2) AS DOUBLE) AS click_total
FROM p JOIN c
  ON p.user_id = c.user_id
 AND c.c_ts <  p.p_ts
 AND c.c_ts >= p.p_ts - INTERVAL 3600 SECOND
GROUP BY purchase_id, p.user_id
ORDER BY purchase_id
"""


QUERIES: dict[str, QuerySpec] = {
    "events_tumbling_hourly": QuerySpec(events_tumbling_hourly, TUMBLING_ORACLE, headline=True),
    "streaming_tumbling_hourly": QuerySpec(streaming_tumbling_hourly_query, TUMBLING_ORACLE),
    "streaming_sliding_1h_30m": QuerySpec(streaming_sliding_query, SLIDING_ORACLE),
    "streaming_dedup_redelivery": QuerySpec(streaming_dedup_query, STREAMING_DEDUP_ORACLE),
    "events_asof_purchase_click": QuerySpec(
        events_asof_purchase_click, ASOF_ORACLE, headline=True
    ),
    "events_range_join_followups": QuerySpec(events_range_join_followups, RANGE_JOIN_ORACLE),
    "events_pivot_type_counts": QuerySpec(events_pivot_type_counts, PIVOT_ORACLE),
    "events_max_concurrency": QuerySpec(events_max_concurrency, CONCURRENCY_ORACLE),
    "events_funnel": QuerySpec(events_funnel, FUNNEL_ORACLE),
    "events_time_rollup": QuerySpec(events_time_rollup, TIME_ROLLUP_ORACLE),
    "events_retention_cohorts": QuerySpec(events_retention_cohorts, RETENTION_ORACLE),
    "events_sliding_1h_30m": QuerySpec(events_sliding_1h_30m, SLIDING_ORACLE),
    "events_session_window_native": QuerySpec(
        events_session_window_native, SESSION_NATIVE_ORACLE
    ),
    "events_sessionization": QuerySpec(events_sessionization, SESSION_ORACLE, headline=True),
    "events_running_value": QuerySpec(events_running_value, RUNNING_ORACLE),
    "events_props_extract": QuerySpec(events_props_extract, PROPS_ORACLE),
    "events_top_purchasers": QuerySpec(events_top_purchasers, TOP_PURCHASERS_ORACLE),
}

def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's VARIANT type:
    ``parse_json`` once into a variant column, then typed path access with
    ``try_variant_get`` — the modern engine-native path for schema-on-read
    JSON (binary-encoded, no per-query re-parse, pushdown-friendly),
    versus events_props_extract's regex approach. Same aggregation, so the
    two queries cross-check each other through their shared oracle shape."""
    events = read_fixture(spark, sf_dir, "events")
    return (
        events.withColumn("v", F.parse_json("props"))
        .withColumn("k", F.try_variant_get("v", "$.k", "bigint"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("*").alias("n_events"),
            F.count("k").alias("n_with_k"),
        )
        .orderBy("event_type")
    )


PROPS_VARIANT_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n_events,
       COUNT(CAST(props::JSON ->> 'k' AS BIGINT)) AS n_with_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


#: Verified like QUERIES but kept OUT of the driver's 50-entry correctness
#: window (queries/__init__._merged head) — llm (32) + events (17) + the
#: flagship core query fill it exactly; tools/verify_local.py covers these
#: every round.
def streaming_upsert_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming lake-sink path under the oracle: a streaming per-user
    aggregation (update mode) drains through foreachBatch + MERGE-upsert
    into a parquet target (rename-aside swap, crash-recoverable), then the
    TABLE is read back and compared against the batch aggregate — verifying
    end-to-end that micro-batch upserts converge to exactly the batch
    answer. The target is a fresh per-run temp dir (a fixed shared path
    would let concurrent verify runs delete each other's state between the
    rename-swap and the read-back)."""
    import atexit
    import shutil
    import tempfile

    from ..streaming.events_stream import foreach_batch_upsert_sink, stream_events

    root = tempfile.mkdtemp(prefix="spark_graft_upsert_")
    # the returned DataFrame lazily reads the target, so removal must wait
    # until process exit — without this every verify/bench run leaked a dir
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    target = root + "/user_totals"
    agg = (
        stream_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            money_sum("value").alias("total_value"),
        )
    )
    foreach_batch_upsert_sink(agg, target_path=target, key="user_id")
    return spark.read.parquet(target).orderBy("user_id")


STREAMING_UPSERT_ORACLE = """
SELECT user_id, COUNT(*) AS n_events, CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def streaming_stateful_sessions_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful streaming operator (applyInPandasWithState
    per-user session state machine, streaming/events_stream.sessionize_stream)
    under the full hash oracle. With NoTimeout semantics a session is
    emitted exactly when a successor event from the same user arrives past
    the gap — so on bounded input the emitted set is deterministic and
    SQL-expressible: every session EXCEPT each user's last. The oracle
    replays the batch sessionization and drops the per-user max session_seq
    row; equality proves the streaming state machine (state carry, gap
    close, per-batch sort) reproduces batch semantics event-for-event."""
    from ..streaming.events_stream import (
        run_available_now,
        sessionize_stream,
        stream_events,
    )

    out = run_available_now(
        sessionize_stream(stream_events(spark, sf_dir), gap_sec=1800),
        query_name="stateful_sessions_oracle",
        output_mode="append",
    )
    return out.orderBy("user_id", "session_start_es")


STATEFUL_SESSIONS_ORACLE = """
WITH e AS (
    SELECT user_id, event_id, value,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS es,
           ts
    FROM events
), gaps AS (
    SELECT *,
           CASE WHEN es - LAG(es) OVER (PARTITION BY user_id ORDER BY DATE_TRUNC('microsecond', ts), event_id) > 1800
                  OR LAG(es) OVER (PARTITION BY user_id ORDER BY DATE_TRUNC('microsecond', ts), event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM e
), ids AS (
    SELECT *,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY DATE_TRUNC('microsecond', ts), event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM gaps
), sess AS (
    SELECT user_id, session_seq,
           MIN(es) AS session_start_es,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS session_value
    FROM ids
    GROUP BY user_id, session_seq
)
-- NoTimeout: only sessions closed by a successor event are emitted — each
-- user's final session stays in state and never leaves the operator
SELECT user_id, session_start_es, n_events, session_value
FROM sess
QUALIFY session_seq < MAX(session_seq) OVER (PARTITION BY user_id)
ORDER BY user_id, session_start_es
"""


def events_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog distinct-user estimate per event type, next to
    the exact count (operators/aggs.hll_registers/hll_estimate): the
    registers are md5-derived, so unlike the built-in approx_count_distinct
    (oracled only through a tolerance predicate) the SKETCH ITSELF is
    hash-verified — the oracle rebuilds every register from hex-digit math
    and reproduces the estimate to the rounded digit. One pass + a
    |types| x 64-row exchange; the exact countDistinct rides the same scan
    for the accuracy column."""
    from ..operators.aggs import hll_estimate, hll_registers

    ev = read_fixture(spark, sf_dir, "events")
    regs = hll_registers(ev, "user_id", "event_type")
    est = hll_estimate(regs, "event_type")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        exact.join(est, "event_type")
        .select("event_type", "exact_users", "n_regs_set", "hll_est")
        .orderBy("event_type")
    )


def _hll_oracle_sql(m: int = 64) -> str:
    alpha = 0.7213 / (1 + 1.079 / m)
    hexd = "0123456789abcdef"
    return f"""
WITH h AS (
    SELECT event_type, user_id,
           MD5('hll:' || CAST(user_id AS VARCHAR)) AS hh
    FROM events
), lzx AS (
    SELECT event_type, hh,
           LENGTH(REGEXP_EXTRACT(SUBSTR(hh, 3, 13), '^0*')) AS lz
    FROM h
), rr AS (
    SELECT event_type,
           ((STRPOS('{hexd}', SUBSTR(hh, 1, 1)) - 1) * 16
            + (STRPOS('{hexd}', SUBSTR(hh, 2, 1)) - 1)) % {m} AS reg,
           CASE WHEN lz = 13 THEN 53
                ELSE lz * 4
                     + CASE SUBSTR(hh, 2 + lz + 1, 1)
                           WHEN '1' THEN 3
                           WHEN '2' THEN 2 WHEN '3' THEN 2
                           WHEN '4' THEN 1 WHEN '5' THEN 1
                           WHEN '6' THEN 1 WHEN '7' THEN 1
                           ELSE 0 END
                     + 1
           END AS rho
    FROM lzx
), regs AS (
    SELECT event_type, reg, MAX(rho) AS r
    FROM rr GROUP BY event_type, reg
), est AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_regs_set,
           SUM(CAST(1.0 AS DOUBLE) / (CAST(1 AS BIGINT) << r)) AS z_set
    FROM regs GROUP BY event_type
)
SELECT e.event_type,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS exact_users,
       est.n_regs_set,
       ROUND(CAST({alpha!r} AS DOUBLE) * {m} * {m}
             / (est.z_set + ({m} - est.n_regs_set)), 4) AS hll_est
FROM events e JOIN est ON e.event_type = est.event_type
GROUP BY e.event_type, est.n_regs_set, est.z_set
ORDER BY e.event_type
"""


HLL_ORACLE = _hll_oracle_sql()


def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA drift/spike monitoring over the daily event-volume series —
    the data-quality watchdog a production ingest runs per source: for
    each event type, the zero-seeded exponentially weighted moving average
    s_t = alpha * sum_{i<=t} (1-alpha)^(t-i) x_i (alpha=0.1) plus the
    spike ratio of today's count against yesterday's smoothed level.

    The recursion is re-expressed as ONE cumulative window: s_t =
    alpha * 0.9^t * cumsum(x_i * 0.9^-i) — no driver loop, no UDF, and
    the prefix-sum form is exactly what a SQL oracle replays. Scale: the
    daily rollup is the only data-sized shuffle; the window then runs
    over |types| x |days| rows. Exponents are bounded by the series
    length, so the 0.9^-i rescaling cannot overflow on any realistic
    retention window (documented contract: days <= ~3000)."""
    ev = read_fixture(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("day")
    rn = F.row_number().over(w)
    d = daily.withColumn("rn", rn)
    cum = (
        F.sum(F.col("n_events") * F.pow(F.lit(0.9), -F.col("rn"))).over(
            Window.partitionBy("event_type").orderBy("rn")
        )
    )
    d = d.withColumn("ewma", F.lit(0.1) * F.pow(F.lit(0.9), F.col("rn")) * cum)
    prev = F.lag("ewma").over(Window.partitionBy("event_type").orderBy("rn"))
    return (
        d.withColumn("ewma_prev", prev)
        .select(
            "event_type",
            "day",
            "n_events",
            F.round("ewma_prev", 4).alias("ewma_prev"),
            F.round(F.col("n_events") / F.col("ewma_prev"), 4).alias("spike_ratio"),
        )
        .orderBy("event_type", "day")
    )


EWMA_ORACLE = """
WITH daily AS (
    SELECT event_type, STRFTIME(ts, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type, STRFTIME(ts, '%Y-%m-%d')
), idx AS (
    SELECT event_type, day, n_events,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
    FROM daily
), smoothed AS (
    SELECT event_type, day, n_events, rn,
           0.1 * POWER(0.9, rn)
               * SUM(n_events * POWER(0.9, -rn))
                 OVER (PARTITION BY event_type ORDER BY rn) AS ewma
    FROM idx
)
SELECT event_type, day, n_events,
       ROUND(LAG(ewma) OVER (PARTITION BY event_type ORDER BY rn), 4) AS ewma_prev,
       ROUND(n_events / LAG(ewma) OVER (PARTITION BY event_type ORDER BY rn), 4)
           AS spike_ratio
FROM smoothed
ORDER BY event_type, day
"""


def sketch_kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix from KMV sketches (operators/aggs
    .kmv_sketches/kmv_pairwise_overlap): for every pair of event types,
    estimate the union size, Jaccard, and intersection of their user sets
    from 256-hash sketches — the set-algebra sketch HLL cannot do. The
    exact pairwise intersection rides along as the accuracy column
    (data-sized, fine at fixture scale; production reads the sketch
    columns only). The sketch is md5-ordered hex strings, so the oracle
    replays sample membership and estimators exactly."""
    from ..operators.aggs import kmv_pairwise_overlap, kmv_sketches

    ev = read_fixture(spark, sf_dir, "events")
    sk = kmv_sketches(ev, "user_id", "event_type", k=256)
    overlap = kmv_pairwise_overlap(sk, "event_type", k=256)
    du = ev.select("event_type", "user_id").distinct()
    ex = (
        du.alias("x")
        .join(
            du.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("grp_a"), F.col("y.event_type").alias("grp_b")
        )
        .agg(F.count("*").cast("long").alias("exact_common"))
    )
    return (
        overlap.join(ex, ["grp_a", "grp_b"], "left_outer")
        .select(
            "grp_a",
            "grp_b",
            "kmv_common",
            "jaccard_est",
            "est_union",
            "est_intersection",
            F.coalesce(F.col("exact_common"), F.lit(0)).cast("long").alias("exact_common"),
        )
        .orderBy("grp_a", "grp_b")
    )


def _kmv_oracle_sql(k: int = 256) -> str:
    hexd = "0123456789abcdef"
    hex32 = " + ".join(
        f"(STRPOS('{hexd}', SUBSTR(MAX(h), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    est_union = (
        f"CASE WHEN n_sample < {k} THEN CAST(n_sample AS DOUBLE) "
        f"ELSE ROUND({k - 1} / hk, 4) END"
    )
    return f"""
WITH du AS (
    SELECT DISTINCT event_type AS g, user_id FROM events
), hashed AS (
    SELECT g, MD5('kmv:' || CAST(user_id AS VARCHAR)) AS h FROM du
), sk AS (
    SELECT g, h FROM (
        SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rnk
        FROM hashed
    ) WHERE rnk <= {k}
), gs AS (
    SELECT DISTINCT g FROM sk
), pairs AS (
    SELECT a.g AS grp_a, b.g AS grp_b FROM gs a JOIN gs b ON a.g < b.g
), m AS (
    SELECT p.grp_a, p.grp_b, s.h,
           MAX(CASE WHEN s.g = p.grp_a THEN 1 ELSE 0 END) AS in_a,
           MAX(CASE WHEN s.g = p.grp_b THEN 1 ELSE 0 END) AS in_b
    FROM pairs p JOIN sk s ON s.g IN (p.grp_a, p.grp_b)
    GROUP BY p.grp_a, p.grp_b, s.h
), kept AS (
    SELECT * FROM (
        SELECT m.*, ROW_NUMBER() OVER (PARTITION BY grp_a, grp_b ORDER BY h) AS rnk
        FROM m
    ) WHERE rnk <= {k}
), agg AS (
    SELECT grp_a, grp_b, COUNT(*) AS n_sample,
           CAST(SUM(in_a * in_b) AS BIGINT) AS kmv_common,
           ({hex32}) / 4294967296.0 AS hk
    FROM kept GROUP BY grp_a, grp_b
), ex AS (
    SELECT a.g AS grp_a, b.g AS grp_b, CAST(COUNT(*) AS BIGINT) AS exact_common
    FROM du a JOIN du b ON a.user_id = b.user_id AND a.g < b.g
    GROUP BY a.g, b.g
)
SELECT agg.grp_a, agg.grp_b, kmv_common,
       ROUND(CAST(kmv_common AS DOUBLE) / n_sample, 4) AS jaccard_est,
       {est_union} AS est_union,
       ROUND(CAST(kmv_common AS DOUBLE) / n_sample * ({est_union}), 4)
           AS est_intersection,
       CAST(COALESCE(ex.exact_common, 0) AS BIGINT) AS exact_common
FROM agg LEFT JOIN ex ON agg.grp_a = ex.grp_a AND agg.grp_b = ex.grp_b
ORDER BY agg.grp_a, agg.grp_b
"""


KMV_ORACLE = _kmv_oracle_sql()


def streaming_tws_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime totals through the Spark 4
    ``transformWithStateInPandas`` API (streaming/events_stream
    .user_totals_tws): declared ValueState per user, updated-row emission
    per micro-batch, drained with AvailableNow. Over the bounded fixture
    each user emits exactly once, so the custom stateful operator equals
    the batch per-user aggregate — which is its full hash oracle."""
    from ..streaming.events_stream import (
        run_available_now,
        stream_events,
        user_totals_tws,
    )

    out = run_available_now(
        user_totals_tws(stream_events(spark, sf_dir)), output_mode="update"
    )
    return out.orderBy("user_id")


def streaming_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE SKETCH AS STREAMING STATE: the HLL registers ride a
    plain watermarked streaming aggregation — per (day, register) the
    running MAX(rho) is exactly the sketch merge operation, so streaming
    distinct-count needs no custom stateful operator, just groupBy+max
    over the register projection (state = |days| x 64 rows, bounded by
    the watermark). The drained registers finalize to the estimate with
    the same libm-free arithmetic as the batch tier, and the oracle is
    the batch HLL over the same days — streaming-equals-batch, the
    sketch way."""
    from ..operators.aggs import hll_estimate
    from ..operators.aggs import _hll_reg_rho
    from ..streaming.events_stream import run_available_now, stream_events

    ev = stream_events(spark, sf_dir)
    reg, rho = _hll_reg_rho("user_id")
    regs = (
        ev.withWatermark("ts", "48 hours")
        .select(F.date_format("ts", "yyyy-MM-dd").alias("day"), reg, rho)
        .groupBy("day", "reg")
        .agg(F.max("rho").alias("r"))
    )
    drained = run_available_now(regs, output_mode="complete")
    return hll_estimate(drained, "day").orderBy("day")


STREAMING_HLL_ORACLE = """
WITH h AS (
    SELECT STRFTIME(ts, '%Y-%m-%d') AS day, user_id,
           MD5('hll:' || CAST(user_id AS VARCHAR)) AS hh
    FROM events
), lzx AS (
    SELECT day, hh,
           LENGTH(REGEXP_EXTRACT(SUBSTR(hh, 3, 13), '^0*')) AS lz
    FROM h
), rr AS (
    SELECT day,
           ((STRPOS('0123456789abcdef', SUBSTR(hh, 1, 1)) - 1) * 16
            + (STRPOS('0123456789abcdef', SUBSTR(hh, 2, 1)) - 1)) % 64 AS reg,
           CASE WHEN lz = 13 THEN 53
                ELSE lz * 4
                     + CASE SUBSTR(hh, 2 + lz + 1, 1)
                           WHEN '1' THEN 3
                           WHEN '2' THEN 2 WHEN '3' THEN 2
                           WHEN '4' THEN 1 WHEN '5' THEN 1
                           WHEN '6' THEN 1 WHEN '7' THEN 1
                           ELSE 0 END
                     + 1
           END AS rho
    FROM lzx
), regs AS (
    SELECT day, reg, MAX(rho) AS r
    FROM rr GROUP BY day, reg
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_regs_set,
       ROUND(CAST({alpha!r} AS DOUBLE) * 64 * 64
             / (SUM(CAST(1.0 AS DOUBLE) / (CAST(1 AS BIGINT) << r))
                + (64 - COUNT(*))), 4) AS hll_est
FROM regs
GROUP BY day
ORDER BY day
""".replace("{alpha!r}", repr(0.7213 / (1 + 1.079 / 64)))


TWS_TOTALS_ORACLE = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value,
       MAX(value) AS max_value,
       CAST(MIN(EPOCH(DATE_TRUNC('second', ts))) AS BIGINT) AS first_es,
       CAST(MAX(EPOCH(DATE_TRUNC('second', ts))) AS BIGINT) AS last_es
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly detection — the drift watchdog EWMA can't
    be: each (event_type, day, hour)'s event count is z-scored against the
    SAME HOUR-OF-DAY's distribution for that type (the diurnal baseline),
    surfacing the 20 most anomalous hours. Complements events_ewma_daily:
    EWMA tracks level drift, the seasonal z-score catches
    wrong-for-this-hour spikes a moving average smooths over.

    Scale: one data-sized aggregation to hourly counts, then windows over
    |types| x |days| x 24 rows — the rollup IS the reduction. The mean and
    std come from explicit integer moments (Σx, Σx² of integer counts are
    exact in double regardless of order; Spark's stddev_pop is a
    Welford-style running update whose per-row divisions are
    order-sensitive), so both engines derive z from identical doubles;
    ranking uses the rounded z with full key tie-break."""
    ev = read_fixture(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.expr("unix_timestamp(ts) DIV 86400").alias("day_num"),
        F.expr("unix_timestamp(ts) DIV 3600 % 24").alias("hour_of_day"),
    ).agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("event_type", "hour_of_day")
    cnt = F.count(F.lit(1)).over(w)
    mean = F.sum("n_events").over(w).cast("double") / cnt
    e2 = (
        F.sum(F.col("n_events") * F.col("n_events")).over(w).cast("double") / cnt
    )
    scored = (
        hourly.withColumn("_mean", mean)
        .withColumn("_std", F.sqrt(e2 - mean * mean))
        .filter(F.col("_std") > 0)
        .select(
            "event_type",
            "day_num",
            "hour_of_day",
            "n_events",
            F.round("_mean", 4).alias("slot_mean"),
            F.round(
                (F.col("n_events") - F.col("_mean")) / F.col("_std"), 4
            ).alias("z"),
        )
    )
    return scored.orderBy(
        F.desc(F.abs(F.col("z"))), "event_type", "day_num", "hour_of_day"
    ).limit(20)


HOURLY_ANOMALY_ORACLE = """
WITH hourly AS (
    SELECT event_type,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) // 86400 AS day_num,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) // 3600 % 24 AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1, 2, 3
), scored AS (
    SELECT event_type, day_num, hour_of_day, n_events,
           CAST(SUM(n_events) OVER w AS DOUBLE) / COUNT(*) OVER w AS _mean,
           SQRT(CAST(SUM(n_events * n_events) OVER w AS DOUBLE) / COUNT(*) OVER w
                - (CAST(SUM(n_events) OVER w AS DOUBLE) / COUNT(*) OVER w)
                  * (CAST(SUM(n_events) OVER w AS DOUBLE) / COUNT(*) OVER w)) AS _std
    FROM hourly
    WINDOW w AS (PARTITION BY event_type, hour_of_day)
)
SELECT event_type, day_num, hour_of_day, n_events,
       ROUND(_mean, 4) AS slot_mean,
       ROUND((n_events - _mean) / _std, 4) AS z
FROM scored
WHERE _std > 0
ORDER BY ABS(ROUND((n_events - _mean) / _std, 4)) DESC, event_type, day_num, hour_of_day
LIMIT 20
"""


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: the 10 most common 3-step event-type
    sequences across all users (consecutive events in each user's
    timeline) — the funnel-discovery complement to events_funnel's fixed
    funnel. One user-partitioned window (two leads share the sort), a
    path-keyed count, and a TakeOrderedAndProject top-10 with full
    lexicographic tie-break."""
    ev = read_fixture(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.select(
            F.col("event_type").alias("step1"),
            F.lead("event_type", 1).over(w).alias("step2"),
            F.lead("event_type", 2).over(w).alias("step3"),
        )
        .filter(F.col("step3").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count("*").alias("n_paths"))
    )
    return paths.orderBy(
        F.desc("n_paths"), "step1", "step2", "step3"
    ).limit(10)


TOP_PATHS_ORACLE = """
WITH seq AS (
    SELECT event_type AS step1,
           LEAD(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY DATE_TRUNC('microsecond', ts), event_id) AS step2,
           LEAD(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY DATE_TRUNC('microsecond', ts), event_id) AS step3
    FROM events
)
SELECT step1, step2, step3, COUNT(*) AS n_paths
FROM seq
WHERE step3 IS NOT NULL
GROUP BY step1, step2, step3
ORDER BY n_paths DESC, step1, step2, step3
LIMIT 10
"""


def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting — the product-analytics staple: per day,
    active users, NEW users (first-ever activity), returning users, and
    the cumulative registered-user curve. One distinct pass + a per-user
    min (both partial-aggregated), then windows over one row per day.
    Scale: the only data-sized shuffles are the (user, day) distinct and
    the per-user first-day min; everything after runs on |days| rows."""
    ev = read_fixture(spark, sf_dir, "events")
    day = (F.unix_timestamp("ts") / 86400).cast("long")
    activity = ev.select("user_id", day.alias("day_num")).distinct()
    firsts = activity.groupBy("user_id").agg(F.min("day_num").alias("first_day"))
    daily = (
        activity.join(firsts, "user_id")
        .groupBy("day_num")
        .agg(
            F.count("*").alias("n_active"),
            F.sum(
                F.when(F.col("first_day") == F.col("day_num"), 1).otherwise(0)
            ).alias("n_new"),
        )
        .withColumn("n_returning", F.col("n_active") - F.col("n_new"))
    )
    w = Window.orderBy("day_num").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.withColumn("cumulative_users", F.sum("n_new").over(w))
        .select(
            "day_num",
            "n_active",
            "n_new",
            "n_returning",
            F.col("cumulative_users").cast("long").alias("cumulative_users"),
        )
        .orderBy("day_num")
    )


GROWTH_ORACLE = """
WITH activity AS (
    SELECT DISTINCT user_id,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) // 86400 AS day_num
    FROM events
), firsts AS (
    SELECT user_id, MIN(day_num) AS first_day FROM activity GROUP BY user_id
), daily AS (
    SELECT a.day_num,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN f.first_day = a.day_num THEN 1 ELSE 0 END) AS BIGINT) AS n_new
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY a.day_num
)
SELECT day_num, n_active, n_new,
       n_active - n_new AS n_returning,
       CAST(SUM(n_new) OVER (ORDER BY day_num ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cumulative_users
FROM daily
ORDER BY day_num
"""


def events_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (day-of-week × hour-of-day) activity heatmap — the first chart
    on every product dashboard: event counts and distinct users per
    weekday/hour cell (epoch-derived DOW, 0 = Thursday 1970-01-01,
    engine-neutral by construction — named via a literal map both
    engines share). One aggregation, 168 output rows."""
    ev = read_fixture(spark, sf_dir, "events")
    dow = F.expr("unix_timestamp(ts) DIV 86400 % 7")
    hour = F.expr("unix_timestamp(ts) DIV 3600 % 24")
    return (
        ev.groupBy(dow.alias("dow_idx"), hour.alias("hour_of_day"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("dow_idx", "hour_of_day")
    )


HEATMAP_ORACLE = """
SELECT CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) // 86400 % 7 AS dow_idx,
       CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) // 3600 % 24 AS hour_of_day,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: every purchase's value is credited
    to the hour-of-day of the same user's most recent preceding click
    (the as-of join — marketing's default attribution model), plus an
    'unattributed' bucket for purchases with no prior click. One as-of
    join (the verified union-sweep operator) + a 25-group aggregate;
    DuckDB's native ASOF JOIN replays the credit assignment."""
    from ..operators.joins import asof_join

    ev = read_fixture(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id"), us.alias("p_us"), F.col("value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", us.alias("c_us")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="p_us",
        right_ts="c_us",
        right_cols=["c_us"],
        strict=True,
        how="left",
    )
    bucket = F.when(
        F.col("asof_c_us").isNull(), F.lit(-1)
    ).otherwise(F.expr("asof_c_us DIV 1000000 DIV 3600 % 24"))
    return (
        joined.groupBy(bucket.cast("long").alias("click_hour"))
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            money_sum("value").alias("attributed_value"),
        )
        .orderBy("click_hour")
    )


ATTRIBUTION_ORACLE = """
WITH e AS (
    SELECT event_id, user_id, event_type, value, EPOCH_US(ts) AS us FROM events
), p AS (
    SELECT event_id, user_id, us AS p_us, value FROM e WHERE event_type = 'purchase'
), c AS (
    SELECT user_id, us AS c_us FROM e WHERE event_type = 'click'
), j AS (
    SELECT p.value, c.c_us
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.p_us > c.c_us
)
SELECT CASE WHEN c_us IS NULL THEN -1
            ELSE c_us // 1000000 // 3600 % 24 END AS click_hour,
       COUNT(*) AS n_purchases,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS attributed_value
FROM j
GROUP BY 1
ORDER BY 1
"""


def events_attribution_u_shaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution — the other
    standard marketing model next to last-touch: every purchase's value
    splits across ALL of the same user's clicks in the 24h lookback
    (40% first touch, 40% last touch, 20% spread over the middle;
    1 touch → 100%, 2 touches → 50/50), credited to each click's
    hour-of-day, with an 'unattributed' −1 bucket for purchases with no
    click in the window.

    Scale shape: the (click, purchase) pairs come from the verified
    banded range join — fan-out bounded by rows-per-24h-bucket, never a
    per-user cross product over full histories (the lookback bound IS
    the skew control for whale users); the position weights are windows
    PARTITIONED BY the purchase, so state is one purchase's touch list.
    Tie safety (VERDICT r4 item 4): the rank order is fully deterministic
    — clicks tie-break on their own event id (``c_id``) in BOTH engines,
    so each ROW's credit (not just the bucket sum) replays identically
    even for same-second clicks straddling the 40/20 boundary. Credit
    sums are quantized to the 1e-6 grid and accumulated in DECIMAL, so
    the bucket totals are order-independent (functions/money.py)."""
    from pyspark.sql import Window

    from ..functions.money import quantized
    from ..operators.joins import banded_range_join

    ev = read_fixture(spark, sf_dir, "events")
    es = F.unix_timestamp("ts")
    lookback = 86400  # 24h
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", es.alias("p_s"), "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("c_id"), es.alias("c_s")
    )
    pairs = banded_range_join(
        clicks,
        purchases,
        on="user_id",
        left_es="c_s",
        right_es="p_s",
        max_gap_sec=lookback,
    )
    wn = Window.partitionBy("event_id")
    wr = Window.partitionBy("event_id").orderBy("c_s", "c_id")
    weighted = pairs.withColumn("n", F.count("*").over(wn)).withColumn(
        "rn", F.row_number().over(wr)
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    credited = weighted.select(
        F.expr("c_s DIV 3600 % 24").cast("long").alias("click_hour"),
        quantized(F.col("value") * credit, 6).alias("credit"),
    )
    unattributed = purchases.join(
        pairs.select("event_id"), "event_id", "left_anti"
    ).select(
        F.lit(-1).cast("long").alias("click_hour"),
        quantized(F.col("value"), 6).alias("credit"),
    )
    return (
        credited.unionByName(unattributed)
        .groupBy("click_hour")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.round(F.sum("credit"), 2).cast("double").alias("attributed_value"),
        )
        .orderBy("click_hour")
    )


U_SHAPED_ORACLE = """
WITH e AS (
    SELECT event_id, user_id, event_type, value,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS s
    FROM events
), p AS (
    SELECT event_id, user_id, s AS p_s, value FROM e WHERE event_type = 'purchase'
), c AS (
    SELECT event_id AS c_id, user_id, s AS c_s FROM e WHERE event_type = 'click'
), pairs AS (
    SELECT p.event_id, p.value, c.c_s, c.c_id
    FROM p JOIN c ON p.user_id = c.user_id
     AND p.p_s > c.c_s AND p.p_s <= c.c_s + 86400
), w AS (
    SELECT *,
           COUNT(*) OVER (PARTITION BY event_id) AS n,
           ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY c_s, c_id) AS rn
    FROM pairs
), credited AS (
    SELECT c_s // 3600 % 24 AS click_hour,
           CAST(ROUND(value * (CASE WHEN n = 1 THEN CAST(1.0 AS DOUBLE)
                         WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
                         WHEN rn = 1 OR rn = n THEN CAST(0.4 AS DOUBLE)
                         ELSE CAST(0.2 AS DOUBLE) / (n - 2) END), 6)
                AS DECIMAL(28,6)) AS credit
    FROM w
), unattributed AS (
    SELECT CAST(-1 AS BIGINT) AS click_hour,
           CAST(ROUND(value, 6) AS DECIMAL(28,6)) AS credit
    FROM p
    WHERE NOT EXISTS (SELECT 1 FROM pairs WHERE pairs.event_id = p.event_id)
)
SELECT click_hour,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(ROUND(SUM(credit), 2) AS DOUBLE) AS attributed_value
FROM (SELECT * FROM credited UNION ALL SELECT * FROM unattributed)
GROUP BY click_hour
ORDER BY click_hour
"""


def streaming_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join — the enrichment form the stream-stream and
    batch joins don't cover: a live event stream broadcast-joined to a
    slowly-changing user dimension (spend tier: total historical value
    above/below the P75 threshold, computed batch-side), then aggregated
    per (tier, event_type). This is the canonical serving enrichment —
    dimension in memory, facts streaming past it; Spark re-plans the
    static side per micro-batch, so a dimension refresh is picked up
    without restarting the query. Bounded input (AvailableNow) ⇒ equals
    the batch join, which is what the oracle replays.

    Scale shape: the dimension is |users| rows (broadcast); stream state
    is |tiers|x|types| running aggregates — no per-key explosion; the
    threshold is one exact-percentile aggregate."""
    from ..functions.cache import scoped_persist
    from ..functions.money import money
    from ..streaming.events_stream import run_available_now, stream_events

    ev = read_fixture(spark, sf_dir, "events")
    # per_user feeds the threshold aggregate AND the dim projection —
    # persist or the batch rollup scan runs twice (review finding, r5)
    per_user = scoped_persist(
        ev.groupBy("user_id").agg(
            F.sum(money("value")).cast("double").alias("tot")
        )
    )
    th = per_user.agg(F.percentile("tot", F.lit(0.75)).alias("p75"))
    dim = per_user.crossJoin(F.broadcast(th)).select(
        "user_id",
        F.when(F.col("tot") > F.col("p75"), "high").otherwise("standard").alias(
            "tier"
        ),
    )
    stream = stream_events(spark, sf_dir)
    agg = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy("tier", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            money_sum("value").alias("sum_value"),
        )
    )
    out = run_available_now(agg, output_mode="complete")
    return out.orderBy("tier", "event_type")


STREAMING_STATIC_ENRICHMENT_ORACLE = """
WITH per_user AS (
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS tot
    FROM events GROUP BY user_id
), th AS (
    SELECT QUANTILE_CONT(tot, 0.75) AS p75 FROM per_user
), dim AS (
    SELECT user_id,
           CASE WHEN tot > p75 THEN 'high' ELSE 'standard' END AS tier
    FROM per_user, th
)
SELECT tier, event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
FROM events e JOIN dim d ON e.user_id = d.user_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


def events_session_incident_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval OVERLAP join — the relational pattern range/as-of joins
    don't cover: two interval sets (user sessions vs system 'hot hours' —
    hours whose event volume exceeds the corpus P90) matched on
    ``a.start <= b.end AND b.start <= a.end``, answering "how much of each
    user's session time ran during load incidents". Per user: session
    count, sessions touching ≥1 hot hour, and total overlapped seconds;
    top-20 by overlap. All arithmetic is exact integer seconds.

    Scale shape (operators/joins.interval_overlap_join): each side
    explodes into the hour buckets its interval covers (session fan-out
    bounded by duration/1h + 1), ONE shuffled equi join on the bucket —
    never a cross product (plan-linted); the hot-hour side is tiny by
    construction (P90 filter) and the session table is scope-persisted
    because the total-count aggregate and the join both consume it."""
    from ..functions.cache import scoped_persist
    from ..operators.joins import interval_overlap_join

    ev = read_fixture(spark, sf_dir, "events")
    es = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = es - F.lag(es).over(w)
    marked = ev.withColumn(
        "_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    with_id = marked.withColumn(
        "session_seq",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sessions = scoped_persist(
        with_id.groupBy("user_id", "session_seq").agg(
            F.min(es).alias("s_start"), F.max(es).alias("s_end")
        )
    )
    hourly = ev.groupBy(F.floor(es / 3600).cast("long").alias("hour")).agg(
        F.count("*").alias("n")
    )
    th = hourly.agg(F.percentile("n", F.lit(0.9)).alias("p90"))
    hot = (
        hourly.crossJoin(F.broadcast(th))
        .filter(F.col("n") > F.col("p90"))
        .select(
            (F.col("hour") * 3600).alias("h_start"),
            (F.col("hour") * 3600 + 3599).alias("h_end"),
        )
    )
    pairs = interval_overlap_join(
        sessions,
        hot,
        left_start="s_start",
        left_end="s_end",
        right_start="h_start",
        right_end="h_end",
        bucket_sec=3600,
    )
    per_user_hot = (
        pairs.select(
            "user_id",
            "session_seq",
            (
                F.least("s_end", "h_end") - F.greatest("s_start", "h_start") + 1
            ).alias("osec"),
        )
        .groupBy("user_id")
        .agg(
            F.countDistinct("session_seq").alias("n_hot_sessions"),
            F.sum("osec").cast("long").alias("overlap_sec"),
        )
    )
    totals = sessions.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_sessions")
    )
    return (
        totals.join(per_user_hot, "user_id")
        .select("user_id", "n_sessions", "n_hot_sessions", "overlap_sec")
        .orderBy(F.desc("overlap_sec"), "user_id")
        .limit(20)
    )


SESSION_INCIDENT_OVERLAP_ORACLE = """
WITH e AS (
    SELECT user_id, event_id,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS es,
           ts
    FROM events
), gaps AS (
    SELECT *,
           CASE WHEN es - LAG(es) OVER (PARTITION BY user_id ORDER BY DATE_TRUNC('microsecond', ts), event_id) > 1800
                  OR LAG(es) OVER (PARTITION BY user_id ORDER BY DATE_TRUNC('microsecond', ts), event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM e
), ids AS (
    SELECT *,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY DATE_TRUNC('microsecond', ts), event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM gaps
), sessions AS (
    SELECT user_id, session_seq, MIN(es) AS s_start, MAX(es) AS s_end
    FROM ids GROUP BY user_id, session_seq
), hourly AS (
    SELECT es // 3600 AS hour, COUNT(*) AS n FROM e GROUP BY 1
), th AS (
    SELECT QUANTILE_CONT(n, 0.9) AS p90 FROM hourly
), hot AS (
    SELECT hour * 3600 AS h_start, hour * 3600 + 3599 AS h_end
    FROM hourly, th WHERE n > p90
), pairs AS (
    SELECT s.user_id, s.session_seq,
           LEAST(s.s_end, h.h_end) - GREATEST(s.s_start, h.h_start) + 1 AS osec
    FROM sessions s JOIN hot h
      ON s.s_start <= h.h_end AND h.h_start <= s.s_end
), per_user_hot AS (
    SELECT user_id,
           COUNT(DISTINCT session_seq) AS n_hot_sessions,
           CAST(SUM(osec) AS BIGINT) AS overlap_sec
    FROM pairs GROUP BY user_id
), totals AS (
    SELECT user_id, COUNT(*) AS n_sessions FROM sessions GROUP BY user_id
)
SELECT t.user_id, t.n_sessions, p.n_hot_sessions, p.overlap_sec
FROM totals t JOIN per_user_hot p ON t.user_id = p.user_id
ORDER BY p.overlap_sec DESC, t.user_id
LIMIT 20
"""


def events_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration of activity: what share of all events comes
    from the heaviest users (above the P90 / P99 per-user volume
    thresholds) — the 80/20 diagnostic behind rate limiting, whale
    analysis, and skew planning. Deliberately WINDOW-FREE at scale: the
    per-user rollup is the only data-sized shuffle; thresholds come from
    one exact-percentile aggregate (deterministic interpolation over
    integer counts) and shares from one conditional sum against the
    broadcast thresholds — no global rank over |users| rows."""
    from ..functions.cache import scoped_persist

    ev = read_fixture(spark, sf_dir, "events")
    per_user = scoped_persist(
        ev.groupBy("user_id").agg(F.count("*").alias("n"))
    )
    pct = F.percentile("n", F.lit([0.9, 0.99]))
    th = per_user.agg(
        F.element_at(pct, 1).alias("p90"), F.element_at(pct, 2).alias("p99")
    )
    return (
        per_user.crossJoin(F.broadcast(th))
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("n").cast("long").alias("n_events"),
            F.round(F.max("p90"), 2).alias("p90_threshold"),
            F.round(F.max("p99"), 2).alias("p99_threshold"),
            F.round(
                F.sum(F.when(F.col("n") > F.col("p90"), F.col("n")).otherwise(0))
                / F.sum("n"),
                4,
            ).alias("share_above_p90"),
            F.round(
                F.sum(F.when(F.col("n") > F.col("p99"), F.col("n")).otherwise(0))
                / F.sum("n"),
                4,
            ).alias("share_above_p99"),
        )
    )


PARETO_ORACLE = """
WITH per_user AS (
    SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
), th AS (
    SELECT QUANTILE_CONT(n, 0.9) AS p90, QUANTILE_CONT(n, 0.99) AS p99
    FROM per_user
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(n) AS BIGINT) AS n_events,
       ROUND(MAX(p90), 2) AS p90_threshold,
       ROUND(MAX(p99), 2) AS p99_threshold,
       ROUND(SUM(CASE WHEN n > p90 THEN n ELSE 0 END) / CAST(SUM(n) AS DOUBLE), 4)
           AS share_above_p90,
       ROUND(SUM(CASE WHEN n > p99 THEN n ELSE 0 END) / CAST(SUM(n) AS DOUBLE), 4)
           AS share_above_p99
FROM per_user, th
"""


def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained funnel: signup → first click WITHIN 72h of the
    signup → first purchase WITHIN 72h of that click — the conversion
    window every growth team applies (the untimed events_funnel counts a
    purchase months later as converted; this one doesn't). Identical
    single-job shape to events_funnel — chained conditional MINs over
    ONE user-partitioned unordered frame, a per-user rollup, one global
    conditional-count aggregate, stack-unpivoted — with the window
    predicate folded into each stage's eligibility condition."""
    ev = read_fixture(spark, sf_dir, "events")
    es = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id")
    lim = 72 * 3600
    staged = (
        ev.withColumn(
            "t_signup", F.min(F.when(F.col("event_type") == "signup", es)).over(w)
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (es > F.col("t_signup"))
                    & (es <= F.col("t_signup") + lim),
                    es,
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (es > F.col("t_click"))
                    & (es <= F.col("t_click") + lim),
                    es,
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("t_signup").alias("t_signup"),
        F.min("t_click").alias("t_click"),
        F.min("t_purchase").alias("t_purchase"),
    )
    counts = per_user.agg(
        F.count("*").alias("n_all"),
        F.count("t_signup").alias("n_signup"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
    )
    return counts.select(
        F.expr(
            "stack(4, '1_all_users', n_all, '2_signed_up', n_signup, "
            "'3_clicked_72h', n_click, '4_purchased_72h', n_purchase) "
            "AS (stage, n_users)"
        )
    )


FUNNEL_WINDOWED_ORACLE = """
WITH e AS (
    SELECT user_id, event_type,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS es
    FROM events
), s AS (
    SELECT user_id, MIN(CASE WHEN event_type = 'signup' THEN es END) AS t_signup
    FROM e GROUP BY user_id
), c AS (
    SELECT e.user_id, MIN(es) AS t_click
    FROM e JOIN s ON e.user_id = s.user_id
    WHERE event_type = 'click' AND es > t_signup AND es <= t_signup + 259200
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, MIN(es) AS t_purchase
    FROM e JOIN c ON e.user_id = c.user_id
    WHERE event_type = 'purchase' AND es > t_click AND es <= t_click + 259200
    GROUP BY e.user_id
)
SELECT '1_all_users' AS stage, COUNT(DISTINCT user_id) AS n_users FROM e
UNION ALL
SELECT '2_signed_up', COUNT(*) FROM s WHERE t_signup IS NOT NULL
UNION ALL
SELECT '3_clicked_72h', COUNT(*) FROM c
UNION ALL
SELECT '4_purchased_72h', COUNT(*) FROM p
"""


def events_stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stickiness (DAU/WAU) per day — the engagement ratio product teams
    track: daily active users over trailing-7-day active users, both
    exact. One (user, day) distinct pass feeds BOTH sides; the trailing
    window is the same broadcast day-range join as the rolling-HLL
    query's exact column (days are few; the distinct pass is the only
    data-sized work). A ratio near 1 = the same users every day; near
    1/7 = fully churning audience."""
    from ..functions.cache import scoped_persist

    ev = read_fixture(spark, sf_dir, "events")
    day = F.expr("unix_timestamp(ts) DIV 86400")
    activity = scoped_persist(ev.select("user_id", day.alias("day_num")).distinct())
    dau = activity.groupBy("day_num").agg(F.countDistinct("user_id").alias("dau"))
    days = activity.select("day_num").distinct()
    wau = (
        activity.join(
            F.broadcast(days.select(F.col("day_num").alias("d"))),
            (F.col("day_num") >= F.col("d") - 6) & (F.col("day_num") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau.day_num == wau.d)
        .select(
            "day_num",
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 4).alias("stickiness"),
        )
        .orderBy("day_num")
    )


STICKINESS_ORACLE = """
WITH activity AS (
    SELECT DISTINCT user_id,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) // 86400 AS day_num
    FROM events
), dau AS (
    SELECT day_num, COUNT(DISTINCT user_id) AS dau FROM activity GROUP BY day_num
), days AS (
    SELECT DISTINCT day_num FROM activity
), wau AS (
    SELECT d.day_num AS d, COUNT(DISTINCT a.user_id) AS wau
    FROM days d JOIN activity a
      ON a.day_num >= d.day_num - 6 AND a.day_num <= d.day_num
    GROUP BY d.day_num
)
SELECT dau.day_num, dau.dau, wau.wau,
       ROUND(CAST(dau.dau AS DOUBLE) / wau.wau, 4) AS stickiness
FROM dau JOIN wau ON dau.day_num = wau.d
ORDER BY dau.day_num
"""


def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for every user who signed up and
    later purchased, the latency from FIRST signup to FIRST subsequent
    purchase, summarized as count / mean / exact median / P90 — the
    metric that turns events_funnel's counts into 'how long does the
    funnel take'. Two conditional MINs over one user-partitioned
    unordered frame (a single exchange, the funnel pattern), then a
    one-group quantile aggregate on integer seconds."""
    ev = read_fixture(spark, sf_dir, "events")
    es = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id")
    staged = ev.withColumn(
        "t_signup", F.min(F.when(F.col("event_type") == "signup", es)).over(w)
    ).withColumn(
        "t_purchase",
        F.min(
            F.when((F.col("event_type") == "purchase") & (es > F.col("t_signup")), es)
        ).over(w),
    )
    lat = (
        staged.groupBy("user_id")
        .agg((F.min("t_purchase") - F.min("t_signup")).alias("latency_sec"))
        .filter(F.col("latency_sec").isNotNull())
    )
    pct = F.percentile("latency_sec", F.lit([0.5, 0.9]))
    return lat.agg(
        F.count("*").cast("long").alias("n_converted"),
        # latency_sec is an exact integer: sum exactly, divide once.
        F.round(F.sum("latency_sec").cast("double") / F.count("latency_sec"), 2).alias(
            "mean_sec"
        ),
        F.round(F.element_at(pct, 1), 2).alias("p50_sec"),
        F.round(F.element_at(pct, 2), 2).alias("p90_sec"),
    )


CONVERSION_LATENCY_ORACLE = """
WITH e AS (
    SELECT user_id, event_type,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS es
    FROM events
), s AS (
    SELECT user_id, MIN(CASE WHEN event_type = 'signup' THEN es END) AS t_signup
    FROM e GROUP BY user_id
), p AS (
    SELECT e.user_id, MIN(es) AS t_purchase
    FROM e JOIN s ON e.user_id = s.user_id
    WHERE event_type = 'purchase' AND es > t_signup
    GROUP BY e.user_id
), lat AS (
    SELECT p.t_purchase - s.t_signup AS latency_sec
    FROM p JOIN s ON p.user_id = s.user_id
)
SELECT COUNT(*) AS n_converted,
       ROUND(CAST(SUM(latency_sec) AS DOUBLE) / COUNT(latency_sec), 2) AS mean_sec,
       ROUND(QUANTILE_CONT(latency_sec, 0.5), 2) AS p50_sec,
       ROUND(QUANTILE_CONT(latency_sec, 0.9), 2) AS p90_sec
FROM lat
"""


def integrity_id_continuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key continuity audit across the id-bearing fixture
    tables: per table, the id range, row count, duplicate-id count, and
    the number of MISSING ids in [min, max] — the dropped-batch detector
    for ingest pipelines (a re-run that skipped a file shows up as a
    contiguous hole; a double-run as duplicates). Pure aggregates —
    expected span minus distinct count — so the check is one scan per
    table regardless of scale, no windows, no self-joins."""
    out = None
    for table, id_col in (("events", "event_id"), ("documents", "doc_id"), ("orders", "o_orderkey")):
        t = read_fixture(spark, sf_dir, table)
        row = t.agg(
            F.lit(table).alias("table_name"),
            F.min(id_col).cast("long").alias("min_id"),
            F.max(id_col).cast("long").alias("max_id"),
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct(id_col).alias("n_distinct"),
        ).select(
            "table_name",
            "min_id",
            "max_id",
            "n_rows",
            (F.col("n_rows") - F.col("n_distinct")).alias("n_duplicate_ids"),
            (F.col("max_id") - F.col("min_id") + 1 - F.col("n_distinct")).alias(
                "n_missing_ids"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("table_name")


CONTINUITY_ORACLE = """
WITH per_table AS (
    SELECT 'events' AS table_name, CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id,
           COUNT(*) AS n_rows, COUNT(DISTINCT event_id) AS n_distinct
    FROM events
    UNION ALL
    SELECT 'documents', CAST(MIN(doc_id) AS BIGINT), CAST(MAX(doc_id) AS BIGINT),
           COUNT(*), COUNT(DISTINCT doc_id)
    FROM documents
    UNION ALL
    SELECT 'orders', CAST(MIN(o_orderkey) AS BIGINT), CAST(MAX(o_orderkey) AS BIGINT),
           COUNT(*), COUNT(DISTINCT o_orderkey)
    FROM orders
)
SELECT table_name, min_id, max_id, n_rows,
       CAST(n_rows - n_distinct AS BIGINT) AS n_duplicate_ids,
       CAST(max_id - min_id + 1 - n_distinct AS BIGINT) AS n_missing_ids
FROM per_table
ORDER BY table_name
"""


def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars — the canonical financial/sensor downsample: per
    (event type, hour), the opening value (first by event time), high,
    low, close (last), event count, and summed volume. First/last
    resolve through ONE (type, hour)-partitioned sort shared by the
    row_number and the partition count (close = rn == n), with event_id
    breaking timestamp ties so bars are deterministic under concurrent
    events — the property exchange feeds actually require."""
    ev = read_fixture(spark, sf_dir, "events")
    hour = (F.expr("unix_timestamp(ts) DIV 3600") * 3600).alias("hour_start")
    w = Window.partitionBy("event_type", "hour_start").orderBy("ts", "event_id")
    marked = (
        ev.select("event_type", hour, "ts", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("event_type", "hour_start")))
    )
    return (
        marked.groupBy("event_type", "hour_start")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn") == F.col("n"), F.col("value"))).alias("close"),
            F.count("*").alias("n_events"),
            money_sum("value").alias("volume"),
        )
        .orderBy("event_type", "hour_start")
    )


OHLC_ORACLE = """
WITH marked AS (
    SELECT event_type,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) // 3600 * 3600 AS hour_start,
           value,
           ROW_NUMBER() OVER (PARTITION BY event_type,
               CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) // 3600
               ORDER BY DATE_TRUNC('microsecond', ts), event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type,
               CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) // 3600) AS n
    FROM events
)
SELECT event_type, hour_start,
       MAX(CASE WHEN rn = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn = n THEN value END) AS close,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS volume
FROM marked
GROUP BY event_type, hour_start
ORDER BY event_type, hour_start
"""


def events_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event type (TWAP — the financial /
    sensor-data aggregate): each observation holds until the user's next
    event (step-function interpolation via a user-partitioned lead), and
    values average weighted by holding duration — a plain AVG
    overcounts bursts, TWAP doesn't. Closed intervals only (each user's
    last observation has no duration); integer-second durations keep the
    weighted sums deterministic under rounding. One window + one small
    aggregate."""
    ev = read_fixture(spark, sf_dir, "events")
    es = F.unix_timestamp("ts")
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    held = (
        ev.withColumn("dur", F.lead(es).over(w) - es)
        .filter(F.col("dur").isNotNull() & (F.col("dur") > 0))
        .select("event_type", "value", "dur")
    )
    return (
        held.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_intervals"),
            F.sum("dur").cast("long").alias("total_sec"),
            # value*dur stays on the 2-decimal grid (integer seconds), so
            # the weighted sum is decimal-exact; one double division after.
            F.round(
                F.sum(money("value") * F.col("dur").cast("decimal(10,0)")).cast(
                    "double"
                )
                / F.sum("dur"),
                4,
            ).alias("twap_value"),
            F.round(F.sum(money("value")).cast("double") / F.count("value"), 4).alias(
                "plain_avg"
            ),
        )
        .orderBy("event_type")
    )


TWAP_ORACLE = """
WITH held AS (
    SELECT event_type, value,
           LEAD(CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT))
               OVER (PARTITION BY event_type, user_id
                     ORDER BY DATE_TRUNC('microsecond', ts), event_id)
           - CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS dur
    FROM events
)
SELECT event_type,
       COUNT(*) AS n_intervals,
       CAST(SUM(dur) AS BIGINT) AS total_sec,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(dur AS DECIMAL(10,0)))
                  AS DOUBLE) / SUM(dur), 4) AS twap_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value), 4)
           AS plain_avg
FROM held
WHERE dur IS NOT NULL AND dur > 0
GROUP BY event_type
ORDER BY event_type
"""


def events_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day through HLL REGISTER ALGEBRA:
    the per-day sketches (64 md5 registers, one groupBy) merge across the
    trailing window as MAX(rho) OVER a RANGE frame per register — sketch
    union IS max, so the rolling distinct count needs no re-scan of the
    raw events per window, just |days| x 64 register rows. THE reason
    mergeable sketches exist: exact rolling distinct must touch every
    (user, day) pair in every window. The day x register grid comes from
    an explode projection (no join); the exact answer rides along at
    fixture scale as the accuracy column. The estimator is the libm-free
    exact-arithmetic form, so the estimate itself hash-verifies."""
    from ..operators.aggs import _hll_reg_rho, hll_estimate

    ev = read_fixture(spark, sf_dir, "events")
    day = F.expr("unix_timestamp(ts) DIV 86400")
    reg, rho = _hll_reg_rho("user_id")
    regs = (
        ev.select(day.alias("day_num"), reg, rho)
        .groupBy("day_num", "reg")
        .agg(F.max("rho").alias("r_day"))
    )
    days = regs.select("day_num").distinct()
    grid = days.select(
        "day_num", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("reg")
    )
    full = grid.join(regs, ["day_num", "reg"], "left_outer")
    w = Window.partitionBy("reg").orderBy("day_num").rangeBetween(-6, 0)
    merged = (
        full.withColumn("r", F.max("r_day").over(w))
        .filter(F.col("r").isNotNull())
        .select("day_num", "reg", "r")
    )
    est = hll_estimate(merged, "day_num")
    activity = ev.select("user_id", day.alias("day_num")).distinct()
    exact = (
        activity.join(
            F.broadcast(days.select(F.col("day_num").alias("d"))),
            (F.col("day_num") >= F.col("d") - 6) & (F.col("day_num") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return (
        est.join(exact, est.day_num == exact.d)
        .select("day_num", "exact_users", "n_regs_set", "hll_est")
        .orderBy("day_num")
    )


ROLLING_HLL_ORACLE = """
WITH rr AS (
    SELECT CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) // 86400 AS day_num,
           ((STRPOS('0123456789abcdef', SUBSTR(hh, 1, 1)) - 1) * 16
            + (STRPOS('0123456789abcdef', SUBSTR(hh, 2, 1)) - 1)) % 64 AS reg,
           CASE WHEN LENGTH(REGEXP_EXTRACT(SUBSTR(hh, 3, 13), '^0*')) = 13 THEN 53
                ELSE LENGTH(REGEXP_EXTRACT(SUBSTR(hh, 3, 13), '^0*')) * 4
                     + CASE SUBSTR(hh, 2 + LENGTH(REGEXP_EXTRACT(SUBSTR(hh, 3, 13), '^0*')) + 1, 1)
                           WHEN '1' THEN 3
                           WHEN '2' THEN 2 WHEN '3' THEN 2
                           WHEN '4' THEN 1 WHEN '5' THEN 1
                           WHEN '6' THEN 1 WHEN '7' THEN 1
                           ELSE 0 END
                     + 1
           END AS rho
    FROM (SELECT ts, MD5('hll:' || CAST(user_id AS VARCHAR)) AS hh FROM events)
), regs AS (
    SELECT day_num, reg, MAX(rho) AS r_day FROM rr GROUP BY day_num, reg
), days AS (
    SELECT DISTINCT day_num FROM regs
), grid AS (
    SELECT day_num, CAST(g AS INT) AS reg
    FROM days, UNNEST(RANGE(0, 64)) AS t(g)
), merged AS (
    SELECT day_num, reg,
           MAX(r_day) OVER (PARTITION BY reg ORDER BY day_num
                            RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS r
    FROM grid LEFT JOIN regs USING (day_num, reg)
), est AS (
    SELECT day_num,
           CAST(COUNT(*) AS BIGINT) AS n_regs_set,
           ROUND(CAST({alpha!r} AS DOUBLE) * 64 * 64
                 / (SUM(CAST(1.0 AS DOUBLE) / (CAST(1 AS BIGINT) << r))
                    + (64 - COUNT(*))), 4) AS hll_est
    FROM merged
    WHERE r IS NOT NULL
    GROUP BY day_num
), activity AS (
    SELECT DISTINCT user_id,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) // 86400 AS day_num
    FROM events
), exact AS (
    SELECT d.day_num AS d, COUNT(DISTINCT a.user_id) AS exact_users
    FROM days d JOIN activity a
      ON a.day_num >= d.day_num - 6 AND a.day_num <= d.day_num
    GROUP BY d.day_num
)
SELECT est.day_num, exact.exact_users, est.n_regs_set, est.hll_est
FROM est JOIN exact ON est.day_num = exact.d
ORDER BY est.day_num
""".replace("{alpha!r}", repr(0.7213 / (1 + 1.079 / 64)))


def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type: consecutive gaps
    within each user's own timeline (user-partitioned lag — sequences
    never mix across users), summarized as count / mean / exact median
    and P90 — the burstiness profile that sizes session gaps and
    watermark horizons from data instead of folklore. Exact percentiles
    on integer seconds (F.percentile ↔ QUANTILE_CONT, the verified
    interpolation pairing); at 100 TB you'd switch to the t-digest
    sketch and accept epsilon."""
    ev = read_fixture(spark, sf_dir, "events")
    es = F.unix_timestamp("ts")
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    gaps = (
        ev.withColumn("gap", es - F.lag(es).over(w))
        .filter(F.col("gap").isNotNull())
        .select("event_type", "gap")
    )
    pct = F.percentile("gap", F.lit([0.5, 0.9]))
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            F.round(F.sum("gap").cast("double") / F.count("gap"), 2).alias(
                "mean_gap_sec"
            ),
            F.round(F.element_at(pct, 1), 2).alias("p50_gap_sec"),
            F.round(F.element_at(pct, 2), 2).alias("p90_gap_sec"),
        )
        .orderBy("event_type")
    )


INTERARRIVAL_ORACLE = """
WITH gaps AS (
    SELECT event_type,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT)
           - LAG(CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT))
             OVER (PARTITION BY event_type, user_id
                   ORDER BY DATE_TRUNC('microsecond', ts), event_id) AS gap
    FROM events
)
SELECT event_type,
       COUNT(*) AS n_gaps,
       ROUND(CAST(SUM(gap) AS DOUBLE) / COUNT(gap), 2) AS mean_gap_sec,
       ROUND(QUANTILE_CONT(gap, 0.5), 2) AS p50_gap_sec,
       ROUND(QUANTILE_CONT(gap, 0.9), 2) AS p90_gap_sec
FROM gaps
WHERE gap IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


def events_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection per event type over the daily volume
    series: the split day minimizing the two-segment squared error (the
    exact 1-changepoint least-squares fit — the building block of binary
    segmentation) plus the variance-reduction ratio against the flat
    single-mean fit: the monitoring question 'did this stream's level
    SHIFT, and when?'.

    The corpus collapses to one row per (type, day) FIRST; the candidate
    split × day product then runs over that tiny rollup (|days|² per
    type), so the data-sized work is one aggregation regardless of event
    volume. Determinism: each segment's SSE uses the closed form
    Σx² − (Σx)²/n over EXACT INTEGER sums, so both engines evaluate the
    identical few IEEE ops — bit-equal doubles, no summation-order ulp
    at all; the per-type argmin tie-breaks on split_day."""
    ev = read_fixture(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.expr("unix_timestamp(ts) DIV 86400").alias("day_num")
    ).agg(F.count("*").alias("x"))
    splits = daily.select("event_type", F.col("day_num").alias("split_day"))
    left = F.col("day_num") < F.col("split_day")
    seg = (
        daily.join(splits, "event_type")
        .groupBy("event_type", "split_day")
        .agg(
            F.sum(F.when(left, 1).otherwise(0)).alias("n_l"),
            F.sum(F.when(left, F.col("x")).otherwise(0)).alias("sx_l"),
            F.sum(F.when(left, F.col("x") * F.col("x")).otherwise(0)).alias("sxx_l"),
            F.sum(F.when(~left, 1).otherwise(0)).alias("n_r"),
            F.sum(F.when(~left, F.col("x")).otherwise(0)).alias("sx_r"),
            F.sum(F.when(~left, F.col("x") * F.col("x")).otherwise(0)).alias("sxx_r"),
        )
        .filter((F.col("n_l") > 0) & (F.col("n_r") > 0))
    )
    sse_split = (
        F.col("sxx_l") - F.col("sx_l") * F.col("sx_l") / F.col("n_l")
    ) + (F.col("sxx_r") - F.col("sx_r") * F.col("sx_r") / F.col("n_r"))
    n_t = F.col("n_l") + F.col("n_r")
    sx_t = F.col("sx_l") + F.col("sx_r")
    sxx_t = F.col("sxx_l") + F.col("sxx_r")
    sse_flat = sxx_t - sx_t * sx_t / n_t
    scored = seg.select(
        "event_type",
        "split_day",
        F.round(sse_split, 4).alias("sse_split"),
        F.round(sse_flat, 4).alias("sse_flat"),
        F.round(F.lit(1.0) - sse_split / sse_flat, 4).alias("var_reduction"),
        F.round(F.col("sx_l") / F.col("n_l"), 4).alias("mean_before"),
        F.round(F.col("sx_r") / F.col("n_r"), 4).alias("mean_after"),
    )
    w = Window.partitionBy("event_type").orderBy("sse_split", "split_day")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("event_type")
    )


CHANGEPOINT_ORACLE = """
WITH daily AS (
    SELECT event_type,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) // 86400 AS day_num,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1, 2
), seg AS (
    SELECT d.event_type, s.day_num AS split_day,
           SUM(CASE WHEN d.day_num < s.day_num THEN 1 ELSE 0 END) AS n_l,
           SUM(CASE WHEN d.day_num < s.day_num THEN d.x ELSE 0 END) AS sx_l,
           SUM(CASE WHEN d.day_num < s.day_num THEN d.x * d.x ELSE 0 END) AS sxx_l,
           SUM(CASE WHEN d.day_num >= s.day_num THEN 1 ELSE 0 END) AS n_r,
           SUM(CASE WHEN d.day_num >= s.day_num THEN d.x ELSE 0 END) AS sx_r,
           SUM(CASE WHEN d.day_num >= s.day_num THEN d.x * d.x ELSE 0 END) AS sxx_r
    FROM daily d JOIN daily s ON d.event_type = s.event_type
    GROUP BY 1, 2
), scored AS (
    SELECT event_type, split_day,
           ROUND((sxx_l - CAST(sx_l * sx_l AS DOUBLE) / n_l)
                 + (sxx_r - CAST(sx_r * sx_r AS DOUBLE) / n_r), 4) AS sse_split,
           ROUND((sxx_l + sxx_r)
                 - CAST((sx_l + sx_r) * (sx_l + sx_r) AS DOUBLE) / (n_l + n_r), 4)
               AS sse_flat,
           ROUND(1.0 - ((sxx_l - CAST(sx_l * sx_l AS DOUBLE) / n_l)
                        + (sxx_r - CAST(sx_r * sx_r AS DOUBLE) / n_r))
                 / ((sxx_l + sxx_r)
                    - CAST((sx_l + sx_r) * (sx_l + sx_r) AS DOUBLE) / (n_l + n_r)), 4)
               AS var_reduction,
           ROUND(CAST(sx_l AS DOUBLE) / n_l, 4) AS mean_before,
           ROUND(CAST(sx_r AS DOUBLE) / n_r, 4) AS mean_after
    FROM seg
    WHERE n_l > 0 AND n_r > 0
)
SELECT event_type, split_day, sse_split, sse_flat, var_reduction,
       mean_before, mean_after
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY sse_split, split_day) AS rn
    FROM scored
)
WHERE rn = 1
ORDER BY event_type
"""


def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental continuous-aggregate maintenance, batch-side: the head
    of the day range is treated as the MATERIALIZED base (aggregated once,
    never rescanned); the tail arrives as a delta batch, is aggregated
    alone, and the two partial tables merge by re-aggregation — count and
    raw sum are mergeable state, so merge(base, delta) == full recompute,
    which is exactly what the oracle computes from scratch. The batch twin
    of the streaming foreachBatch MERGE-upsert sink; at 100 TB the base
    would be day-partitioned parquet and the merge touches only the delta
    days' partitions. Rounding happens ONLY after the merge; partials are
    exact DECIMAL sums (functions/money.py), so merge == recompute holds
    bit-for-bit, not just to rounding tolerance."""
    ev = read_fixture(spark, sf_dir, "events")
    day = F.expr("unix_timestamp(ts) DIV 86400")
    # 19750 = 2024-01-28; fixture events span days 19723-19752, so the
    # base covers the first 27 days and the delta the final 3.
    split_day = 19750

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(day.alias("day_num"), "event_type").agg(
            F.count("*").alias("n_events"), F.sum(money("value")).alias("sum_value")
        )

    base = rollup(ev.filter(day < split_day))
    delta = rollup(ev.filter(day >= split_day))
    return (
        base.unionByName(delta)
        .groupBy("day_num", "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.round(F.sum("sum_value"), 2).cast("double").alias("sum_value"),
        )
        .orderBy("day_num", "event_type")
    )


INCR_MERGE_ORACLE = """
SELECT CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) // 86400 AS day_num,
       event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def streaming_trending_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming trending leaderboard: watermarked hourly counts per event
    type accumulate in the stream (ranking is not streamable —
    row_number needs the closed window), then the drained windows rank
    top-3 per hour in one batch window pass. The standard two-phase
    shape for 'trending now' over an unbounded source; bounded input ⇒
    equals the batch hourly ranking, which is the oracle."""
    from ..streaming.events_stream import run_available_now, stream_events

    ev = stream_events(spark, sf_dir)
    counts = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    # complete mode: the watermark never closes the final ~2h of windows on
    # a bounded drain, so append would drop them; complete emits the whole
    # result table at termination
    drained = run_available_now(
        counts, query_name="trending_types_oracle", output_mode="complete"
    )
    rw = Window.partitionBy("window_start").orderBy(F.desc("n_events"), "event_type")
    return (
        drained.withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= 3)
        .orderBy("window_start", "rnk")
    )


TRENDING_ORACLE = """
WITH hourly AS (
    SELECT CAST(EPOCH(DATE_TRUNC('hour', ts)) AS BIGINT) AS window_start,
           event_type, COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
)
SELECT window_start, event_type, n_events,
       CAST(rnk AS INT) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                                 ORDER BY n_events DESC, event_type) AS rnk
    FROM hourly
)
WHERE rnk <= 3
ORDER BY window_start, rnk
"""


def events_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity between event types: for every type pair,
    the user co-occurrence count and the LIFT
    P(both) / (P(a)·P(b)) — "users who do X also do Y", the association
    measure behind cross-sell and feature-adoption analyses. The
    per-user distinct pass collapses the corpus first; the pair
    self-join then runs over |users| × |types-per-user| rows with a
    |types|²-row output — the reduction comes before the quadratic step,
    never after. Lift > 1 = positive association."""
    from ..functions.cache import scoped_persist

    ev = read_fixture(spark, sf_dir, "events")
    du = scoped_persist(ev.select("user_id", "event_type").distinct())
    # count users off the cached distinct frame, not a second events scan
    n_users = du.select("user_id").distinct().count()
    per_type = du.groupBy("event_type").agg(F.count("*").alias("n_type"))
    both = (
        du.alias("a")
        .join(
            du.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"), F.col("b.event_type").alias("type_b")
        )
        .agg(F.count("*").alias("n_both"))
    )
    return (
        both.join(
            F.broadcast(per_type.withColumnRenamed("event_type", "type_a")), "type_a"
        )
        .withColumnRenamed("n_type", "n_a")
        .join(
            F.broadcast(per_type.withColumnRenamed("event_type", "type_b")), "type_b"
        )
        .withColumnRenamed("n_type", "n_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                (F.col("n_both") * F.lit(float(n_users)))
                / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


AFFINITY_ORACLE = """
WITH du AS (
    SELECT DISTINCT user_id, event_type FROM events
), n AS (
    SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users FROM events
), per_type AS (
    SELECT event_type, COUNT(*) AS n_type FROM du GROUP BY event_type
), co AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
    FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT type_a, type_b, n_both,
       ROUND(n_both * n.n_users / (pa.n_type * pb.n_type), 4) AS lift
FROM co
JOIN per_type pa ON co.type_a = pa.event_type
JOIN per_type pb ON co.type_b = pb.event_type
CROSS JOIN n
ORDER BY type_a, type_b
"""


EXTRA_QUERIES: dict[str, QuerySpec] = {
    "events_hourly_anomalies": QuerySpec(events_hourly_anomalies, HOURLY_ANOMALY_ORACLE),
    "events_top_paths": QuerySpec(events_top_paths, TOP_PATHS_ORACLE),
    "events_growth_accounting": QuerySpec(events_growth_accounting, GROWTH_ORACLE),
    "events_type_affinity": QuerySpec(events_type_affinity, AFFINITY_ORACLE),
    "streaming_trending_types": QuerySpec(streaming_trending_types, TRENDING_ORACLE),
    "rollup_incremental_merge": QuerySpec(rollup_incremental_merge, INCR_MERGE_ORACLE),
    "events_changepoint_daily": QuerySpec(events_changepoint_daily, CHANGEPOINT_ORACLE),
    "events_interarrival_stats": QuerySpec(events_interarrival_stats, INTERARRIVAL_ORACLE),
    "events_rolling_distinct_hll": QuerySpec(
        events_rolling_distinct_hll, ROLLING_HLL_ORACLE
    ),
    "events_time_weighted_value": QuerySpec(
        events_time_weighted_value, TWAP_ORACLE
    ),
    "events_ohlc_hourly": QuerySpec(events_ohlc_hourly, OHLC_ORACLE),
    "integrity_id_continuity": QuerySpec(integrity_id_continuity, CONTINUITY_ORACLE),
    "events_conversion_latency": QuerySpec(
        events_conversion_latency, CONVERSION_LATENCY_ORACLE
    ),
    "events_stickiness_dau_wau": QuerySpec(events_stickiness_dau_wau, STICKINESS_ORACLE),
    "events_funnel_windowed": QuerySpec(events_funnel_windowed, FUNNEL_WINDOWED_ORACLE),
    "streaming_static_enrichment": QuerySpec(
        streaming_static_enrichment, STREAMING_STATIC_ENRICHMENT_ORACLE
    ),
    "events_session_incident_overlap": QuerySpec(
        events_session_incident_overlap, SESSION_INCIDENT_OVERLAP_ORACLE
    ),
    "events_pareto_concentration": QuerySpec(
        events_pareto_concentration, PARETO_ORACLE
    ),
    "events_attribution_last_touch": QuerySpec(
        events_attribution_last_touch, ATTRIBUTION_ORACLE
    ),
    "events_attribution_u_shaped": QuerySpec(
        events_attribution_u_shaped, U_SHAPED_ORACLE
    ),
    "events_activity_heatmap": QuerySpec(events_activity_heatmap, HEATMAP_ORACLE),
    "events_hll_distinct_users": QuerySpec(events_hll_distinct_users, HLL_ORACLE),
    "events_ewma_daily": QuerySpec(events_ewma_daily, EWMA_ORACLE),
    "sketch_kmv_user_overlap": QuerySpec(sketch_kmv_user_overlap, KMV_ORACLE),
    "streaming_hll_daily_users": QuerySpec(
        streaming_hll_daily_users, STREAMING_HLL_ORACLE
    ),
    # streaming_tws_user_totals (transformWithStateInPandas) is NOT
    # registered: the API's Python<->JVM state protocol needs protobuf,
    # absent from this container (ModuleNotFoundError: google) — same
    # env-block class as the Iceberg runtime jar. The operator exists
    # (streaming/events_stream.user_totals_tws) with its oracle below;
    # tests/test_streaming.py probes the environment and skips loudly,
    # flipping to a full equivalence check the day protobuf ships.
    "streaming_stateful_sessions": QuerySpec(
        streaming_stateful_sessions_query, STATEFUL_SESSIONS_ORACLE
    ),
    "streaming_purchase_click_join": QuerySpec(
        streaming_purchase_click_join_query, STREAMING_JOIN_ORACLE
    ),
    "events_props_variant": QuerySpec(events_props_variant, PROPS_VARIANT_ORACLE),
    "streaming_upsert_user_totals": QuerySpec(
        streaming_upsert_user_totals, STREAMING_UPSERT_ORACLE
    ),
}
