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
DRIVER_WINDOW = 50

# Five prior-driver-green representatives stay in-window as regression
# proof — one per major prior-window family (flagship/core joins, events,
# TPC-H tail, dedup, ANN).
_R4_REGRESSION_KEEPS = [
    "flagship_revenue_topk",  # r1+r3 driver-green; broadcast-join flagship
    "events_funnel",  # events-tier machinery (windows, sessionless ordering)
    "q9_product_type_profit",  # widest tpch_tail multiway join
    "dedup_minhash_lsh",  # shared shingle/minhash machinery
    "sim_ivf_kmeans_topk",  # kmeans + IVF ANN machinery
]

# Never-driver-scored round-3 tiers rotated into the r4 window.
_R4_NEW_WINDOW = [
    # retrieval / serving
    "pipeline_rag_retrieval",
    "text_bm25_topk",
    "pipeline_hybrid_retrieval",
    "retrieval_rank_fusion",
    # corpus forensics / dedup completions
    "dedup_repeated_substrings",
    "dedup_tfidf_cosine",
    "decontaminate_bloom_prefilter",
    "decontaminate_semantic",
    "dedup_semantic",
    "dedup_cascade_waterfall",
    "dedup_cluster_keep_best",
    "dedup_embedding_cosine_bucketed_auto",
    # PQ / ANN completions
    "sim_pq_adc_topk",
    "sim_ivfpq_adc_topk",
    "sim_ann_recall_ivf",
    # ML fits with replay oracles
    "ml_logreg_language",
    "ml_logreg_crossval",
    "ml_logreg_calibration",
    "ml_ols_price_model",
    # sketches
    "events_hll_distinct_users",
    "events_rolling_distinct_hll",
    "sketch_kmv_user_overlap",
    "sketch_cms_heavy_hitters",
    "sketch_histogram_median",
    "streaming_hll_daily_users",
    # governance / audits
    "audit_provenance_fingerprint",
    "quality_rule_violations",
    "integrity_fk_orphans",
    "integrity_id_continuity",
    "report_dataset_card",
    # business analytics
    "customer_rfm_segments",
    "cohort_ltv_by_first_year",
    "basket_part_pairs",
    "scd2_customer_priority",
    "window_analytics_showcase",
    "grouping_sets_order_stats",
    "timeseries_gap_filled_monthly",
    "pivot_revenue_by_priority",
    # text-tier completions (incl. the r4 sample-fit BPE rework)
    "text_bpe_merges",
    "text_heaps_law",
    "text_zipf_slope",
    "text_unigram_logprob",
    # pipelines / multimodal / streaming-state
    "pipeline_pretraining_corpus",
    "multimodal_image_resize",
    "streaming_stateful_sessions",
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

    head = _R4_NEW_WINDOW + _R4_REGRESSION_KEEPS
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
