"""Named query registry — the single source of truth for __spark_entry__.

Each entry pairs a PySpark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL oracle string for DuckDB (or ``None`` for ops DuckDB
cannot express, which get a rows-only check; as of round 2 every registered
query has an oracle — the sketch tier via portable md5-based hashing).

Registration is decentralized: each module in this package exposes
``QUERIES: dict[str, QuerySpec]`` and is merged here.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable SQL, or None → rows-only check
    headline: bool = False  # included in bench.py timings


# The driver's correctness gate scores only the FIRST 50 registry entries,
# so registry order is a coverage decision. Rotation history:
#   r1: core tier scored (llm/events rode outside — VERDICT r1 item 2).
#   r2: llm (32) + events (17) + flagship filled the window; all 49 new
#       entries came back green (2 oracle-typing bugs, fixed this round).
#   r3 (VERDICT r2 item 3): rotate the never-driver-scored tpch_tail (13)
#       and ml (4) tiers INTO the window, keep the whole events tier (the
#       two fixed queries must be re-scored as regression proof) plus
#       flagship, and retain one llm representative per operator family
#       (15). The 17 llm entries rotated out are r2-driver-green and stay
#       re-verified every round by tools/verify_local.py.
#   r4 (VERDICT r3 item 1): 45 never-driver-scored entries — the round-3
#       retrieval/serving, corpus-forensics, PQ-ANN, ML-fit, sketch,
#       governance, and business-analytics tiers — plus 5 regression
#       representatives spanning the three prior windows. Everything
#       rotated out stays re-verified per round by tools/verify_local.py
#       (committed as VERIFY_sf0.01.json / VERIFY_sf0.1.json).
#   r5 (VERDICT r4 item 3): the remaining never-driver-scored backlog —
#       post-r4-sweep additions (retrieval_query_expansion,
#       sim_dim_truncation_recall, events_attribution_u_shaped), the r3
#       business-analytics/events/forensics tail, this round's
#       text_bm25_incremental — plus every float-determinism-converted
#       query that had never been scored. Keeps: cohort_ltv_by_first_year
#       (the r4 flake, now DECIMAL-exact — item 1's regression proof) and
#       four converted prior-window representatives.
DRIVER_WINDOW = 50

_R5_REGRESSION_KEEPS = [
    "cohort_ltv_by_first_year",  # THE r4 flake; decimal-exact since r5
    "customer_rfm_segments",  # converted spend chain; r4 driver-green
    "flagship_revenue_topk",  # converted revenue sum; r1+r3+r4 green
    "q9_product_type_profit",  # converted 3-factor decimal profit; r4 green
    "q1_pricing_summary",  # widest converted aggregate row; r1 green
]

_R5_NEW_WINDOW = [
    # post-r4-sweep additions (shipped unverified-by-artifact in r4)
    "retrieval_query_expansion",
    "sim_dim_truncation_recall",
    "events_attribution_u_shaped",
    # never-scored retrieval / text
    "retrieval_mmr_rerank",
    "text_bigram_logprob",
    "text_bm25_incremental",  # new this round (r4 item 7)
    "text_char_entropy",
    "text_novelty_by_source",
    "text_code_switching",
    "text_distinctive_terms",
    # never-scored business analytics (float-determinism converts)
    "scd2_point_in_time_revenue",
    "nation_trade_corridors",
    "supplier_delivery_sla",
    "orders_backlog_aging",
    "part_substitutes",
    "part_price_dispersion",
    "aqp_sample_estimate_revenue",
    "stats_trimmed_mean_by_priority",
    "udaf_weighted_avg_price",
    "window_trailing_spend_range",
    # never-scored events tier
    "events_attribution_last_touch",
    "events_ohlc_hourly",
    "events_time_weighted_value",
    "events_hourly_anomalies",
    "events_interarrival_stats",
    "events_conversion_latency",
    "rollup_incremental_merge",
    "streaming_upsert_user_totals",
    # never-scored forensics / embeddings / sampling
    "dedup_source_flows",
    "graph_dup_triangles",
    "drift_ks_length",
    "split_leakage_safe",
    "embedding_dim_stats",
    "embedding_outliers",
    "mine_hard_negatives",
    # never-scored core/relational tail
    "grouped_trend_by_nation",
    "stringagg_types_by_brand",
    "skew_profile_lineitem_suppkey",
    "approx_percentiles_quality",
    "setops_except_all",
    "join_null_safe_segments",
    "lateral_top_order_per_customer",
    "join_full_outer_nation_activity",
    "source_python_datasource_agg",
    "page_orders_keyset",
]


def _merged() -> dict[str, QuerySpec]:
    from . import core, events, llm, ml, tpch_tail  # local import to avoid cycles

    pool: dict[str, QuerySpec] = {}
    for mod in (core, llm, events, ml, tpch_tail):
        # EXTRA_QUERIES: verified like QUERIES, but never head-eligible
        for queries in (mod.QUERIES, getattr(mod, "EXTRA_QUERIES", {})):
            dup = pool.keys() & queries.keys()
            if dup:
                raise ValueError(f"duplicate query names: {sorted(dup)}")
            pool.update(queries)

    head = _R5_NEW_WINDOW + _R5_REGRESSION_KEEPS
    missing = [n for n in head if n not in pool]
    if missing:
        raise ValueError(f"window entries not in pool: {missing}")
    if len(head) != len(set(head)):
        raise ValueError("duplicate names in driver-window head")
    if len(head) > DRIVER_WINDOW:
        raise ValueError(
            f"curated head ({len(head)}) overflows the {DRIVER_WINDOW}-entry driver window"
        )

    out = {n: pool[n] for n in head}
    out.update({n: s for n, s in pool.items() if n not in out})
    return out


def registry() -> dict[str, QuerySpec]:
    return _merged()
