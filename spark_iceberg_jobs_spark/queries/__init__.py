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
#   r6 (VERDICT r5 item 1): the FINAL rotation — all 38 remaining
#       never-driver-scored entries (the 12 round-5 additions plus the
#       r3/r4 multimodal / sampling / events-monitoring tail; computed as
#       registry keys minus the union of CORRECTNESS_r01–r05 keys) plus
#       12 regression keeps spanning every prior window. Green r6 means
#       the cross-round driver-scored union covers the whole registry.
#       Keeps bias toward THIS round's code changes: the fast_money_sum
#       decimal-finish consumers (flagship, q3, q10, q15), the chunked
#       udaf_weighted_avg_price, and the reworked BM25 index pair.
DRIVER_WINDOW = 50

_R6_REGRESSION_KEEPS = [
    "cohort_ltv_by_first_year",  # THE r4 flake; decimal-exact since r5
    "flagship_revenue_topk",  # r1..r5 green; fast_money_sum finish changed r6
    "q1_pricing_summary",  # r1+r5; widest money aggregate row
    "q3_shipping_priority",  # r1; fast_money_sum finish changed r6
    "q10_returned_items",  # r1; fast_money_sum finish changed r6
    "q15_top_supplier",  # r3; fast_money_sum finish changed r6
    "udaf_weighted_avg_price",  # r5; overflow-chunked reduction changed r6
    "text_bm25_incremental",  # r5; index artifact reworked r6 (item 3)
    "text_bm25_topk",  # r4; shares _bm25_rank with the reworked index
    "q9_product_type_profit",  # r3+r4+r5; decimal profit representative
    "dedup_minhash_lsh",  # r2 window representative (dedup tier)
    "retrieval_mmr_rerank",  # r5; dense serving-tier representative
]

_R6_NEW_WINDOW = [
    # round-5 additions, never driver-scored
    "mixture_token_budget_epochs",
    "curriculum_quality_phases",
    "retrieval_known_item_mrr",
    "pii_detect_redact",
    "drift_js_tokens",
    "dedup_minhash_quality",
    "dataset_shard_balance",
    "text_tokenizer_fertility",
    "quality_repetition_topgram",
    "sim_ivf_incremental_topk",
    "events_session_incident_overlap",
    "streaming_static_enrichment",
    # r3/r4 multimodal tail
    "multimodal_audio_features",
    "multimodal_frame_sample",
    "multimodal_image_entropy",
    "multimodal_image_histogram",
    # r3/r4 sampling / dataset-assembly tail
    "sample_k_per_group",
    "sample_weighted_reservoir",
    "snapshot_diff_by_lang",
    # r3/r4 events-monitoring tail
    "events_activity_heatmap",
    "events_changepoint_daily",
    "events_ewma_daily",
    "events_funnel_windowed",
    "events_growth_accounting",
    "events_pareto_concentration",
    "events_props_variant",
    "events_stickiness_dau_wau",
    "events_top_paths",
    "events_type_affinity",
    "streaming_purchase_click_join",
    "streaming_trending_types",
    # r3/r4 text / quality / drift / alignment tail
    "align_mutual_nearest",
    "cluster_topic_labels",
    "drift_psi_length",
    "quality_outliers_mad",
    "text_bpe_compression",
    "text_chunk_overlap",
    "text_diversity_distinct_n",
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

    head = _R6_NEW_WINDOW + _R6_REGRESSION_KEEPS
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
