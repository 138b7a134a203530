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
#       12 regression keeps spanning every prior window. Green r6 meant
#       the cross-round driver-scored union covers the whole registry —
#       which CORRECTNESS_r06 confirmed (50/50; union = 233/233).
#       Correction (VERDICT r6 item 2): the r6 keep comments claimed the
#       BM25 index artifact was "reworked r6" — it was not; that work
#       (term-bucketed posting tables) actually landed in ROUND 7.
#   r7+ POST-ROTATION POLICY (VERDICT r6 item 6): with zero never-scored
#       entries left, each round's window is composed as
#         (a) permanent keeps: flagship_revenue_topk and
#             cohort_ltv_by_first_year (the r4 flake) — every round;
#         (b) every query whose plan changed since its last driver
#             verdict (this round: the BM25 index rework touches
#             text_bm25_topk/_incremental, retrieval_known_item_mrr,
#             pipeline_hybrid_retrieval, retrieval_rank_fusion; the
#             persisted-IVF rework touches sim_ivf_incremental_topk; the
#             UDAF chunk-order fix touches udaf_weighted_avg_price);
#         (c) the STALEST driver verdicts, oldest round first,
#             alphabetical within a round, until the window fills —
#             for r7 that is all 35 r1-scored entries (including
#             layout_compression_lab and approx_distinct_custkeys, whose
#             only driver rows are pre-oracle r1 "no_oracle" — VERDICT r6
#             item 5: this gives them their first driver HASH verdicts)
#             plus as many of the 17 r2-scored entries as fit.
#         (d) entries ADDED to the registry after the completed rotation
#             (never driver-scored by construction) — they must ride the
#             current window for their first verdict, displacing the
#             newest stale tier first (this round: the 6-query lakehouse
#             maintenance tier displaced all 6 r2-stale slots the window
#             originally carried).
#       Staleness is evaluated against the artifacts that existed at
#       composition time (CORRECTNESS_r01..r06) so the test pinning this
#       window cannot be invalidated by the round's own artifact — the
#       exact failure mode of the retired r6 disjointness assert.
#   r8 window (the documented policy, staleness frozen at r01–r07):
#       keeps + plan-changed (minor compaction + pmod bucket fix on the
#       two incremental-index serves; the three streaming entries whose
#       aggregation arithmetic the late-r8 determinism fixes changed) +
#       the 6 new entries (MOR, the two compaction legs, SCD2, MV
#       refresh, time travel) + ALL 17 r2-stale entries + the 20 oldest
#       r3-stale, alphabetical. CORRECTNESS_r08: 50/50 green.
#   r9 window (staleness frozen at r01–r08): keeps + plan-changed
#       (mv_incremental_refresh — its delta batch is now DERIVED from
#       the incremental append scan instead of a modulo split, VERDICT
#       r8 item 1) + 4 new entries (maintenance_incremental_scan, the
#       CDF-style snapshot-range read; cdc_changelog_diff, the row-level
#       CDF view; maintenance_rollback_plan; maintenance_partition_
#       evolution) + the remaining 22 r3-stale entries (frozen-artifact
#       truth; the r8 comments' "21"/"23" counts were both wrong —
#       ADVICE r8 item 4) + the 20 oldest r4-stale entries, alphabetical
#       within each round (the 3 extra new entries displaced the newest
#       three r4 slots, which lead r10's refresh tier). 50/50 green
#       (CORRECTNESS_r09).
#   r10 window (staleness frozen at r01–r09): keeps + plan-changed
#       (mv_incremental_refresh — the base partials are now a PUBLISHED
#       artifact and the warm delta scan carries a pushed snapshot-
#       boundary predicate, VERDICT r9 item 1) + the new entries
#       (cdc_changelog_rows, VERDICT r9 item 6; maintenance_delete_plan;
#       the executed lakehouse verb tier) + the REMAINING r4-stale
#       entries + the
#       alphabetically-oldest r5-stale entries to fill. Tier COUNTS are
#       deliberately not written here: three consecutive rounds of
#       hand-written counts drifted from the lists (VERDICT r9 item 3),
#       so test_driver_window_r10_policy now computes every tier's
#       expected membership from the frozen r01–r09 artifacts and
#       asserts the lists below match — the artifacts own the numbers.
#       CORRECTNESS_r10: 50/50 green.
#   r11 window (staleness frozen at r01–r10): keeps + plan-changed
#       (lake_cow_delete — delete_where's NULL-aware classification and
#       null-keeping survivor filter, ADVICE r10 #1; lake_branch_wap —
#       fast_forward now runs the locked ancestry gate, ADVICE r10 #3/#4)
#       + the 5 new entries (lake_fold_gate_serve, VERDICT r10 item 1;
#       lake_changelog_delta, item 5; lake_maintenance_window, item 6;
#       lake_update_where, the executed CoW UPDATE verb;
#       lake_add_files_import, the copy-free migrate-in-place) +
#       ALL remaining r5-stale entries + the alphabetically-oldest
#       r6-stale entries filling to 50. Tier membership is computed from
#       the frozen artifacts by test_driver_window_r11_policy — no
#       hand-written counts, same machine-owned arithmetic as r10.
#   r12 window (staleness frozen at r01–r11): keeps + plan-changed
#       (lake_skipping_scan / lake_zorder_box_scan — scan_range/scan_box
#       now route through the two-level plan_scan_auto dispatch, VERDICT
#       r11 item 3; lake_bloom_point_lookup — bloom planning now runs
#       off the version-checked sidecar alone and the lookup gained the
#       parquet-manifest large-table path; lake_maintenance_window —
#       incremental_feed gained the bootstrap/resume live-delete guards
#       and metadata-skip kind, ADVICE r11; lake_add_files_import —
#       add_files gained type validation + the in-lock dup re-check,
#       ADVICE r11) + the new entries (lake_dv_serve, VERDICT r11 item
#       1; lake_merge_mor, item 2; lake_gc_orphans, item 4;
#       lake_spj_bucketed_join, item 5) + ALL remaining r6-stale entries
#       + the alphabetically-oldest r7-stale entries filling to 50.
#       Tier membership is computed from the frozen artifacts by
#       test_driver_window_r12_policy — machine-owned, as since r10.
#   r13 window (staleness frozen at r01–r12): keeps + plan-changed
#       (every lakehouse entry whose underlying verb code changed this
#       round — the SPJ broadcast valve + DV composition, the write-path
#       two-level classification behind DELETE/UPDATE/MERGE both
#       flavors, the GC lock/debris/job-union rework, the DV sidecar
#       consolidation branch, the fold-pressure job dispatch, and the
#       DV-aware scan planners behind lake_skipping_scan /
#       lake_zorder_box_scan) + the new entries (lake_spj_factfact_join,
#       VERDICT r12 item 1; lake_spj_dv_join + lake_skipping_dv_scan,
#       item 3; lake_feed_visible_bootstrap, item 6) +
#       the alphabetically-oldest r7-stale entries filling to 50 (the
#       r6 tier was emptied by r12 — asserted). Tier membership is
#       computed from the frozen artifacts by
#       test_driver_window_r13_policy — machine-owned, as since r10.
#   r14 window (staleness frozen at r01–r13): keeps + plan-changed
#       (every lakehouse entry whose underlying verb code changed this
#       round — the base+delta manifest commit path behind
#       DELETE/UPDATE/MERGE/DV, the raw-manifest feed/changelog walks,
#       the SPJ read_bucket restructure + memory-denominated broadcast
#       budget, the two-phase GC lock scope, the binpack helper) + the
#       new entries (lake_delta_manifest_verbs, VERDICT r13 item 1;
#       lake_spj_eqdelete_join, item 5; lake_rebucket_imported, ADVICE
#       r13) + the 9-entry r7 remainder and the alphabetically-oldest
#       r8-stale entries filling to 50. Tier membership is computed
#       from the frozen artifacts by test_driver_window_r14_policy —
#       machine-owned, as since r10.
DRIVER_WINDOW = 50

_R14_PERMANENT_KEEPS = [
    "flagship_revenue_topk",  # README.md:17 headline; r1..r13 green
    "cohort_ltv_by_first_year",  # THE r4 flake; decimal-exact since r5
]

_R14_CHANGED = [
    # executed verbs materially changed this round (VERDICT r13 items
    # 1/2/5 + ADVICE r13) — they ride for a fresh verdict even though
    # last scored green in r13
    "lake_spj_bucketed_join",  # read_bucket restructure (eq/seq-aware)
    "lake_spj_dv_join",  # same restructure on the DV-composed path
    "lake_spj_factfact_join",  # memory-denominated broadcast budget
    "lake_cow_delete",  # delete_where -> _commit_update delta dispatch
    "lake_update_where",  # update_where -> _commit_update delta dispatch
    "lake_merge_into",  # delta commit + checkpoint release
    "lake_merge_mor",  # same two changes on the MOR twin
    "lake_dv_serve",  # delete_positions_dv -> delta commit
    "lake_changelog_dv",  # DV verb delta commit + chain-routed changelog
    "lake_feed_visible_bootstrap",  # raw-manifest feed walk + expire pre-pass
    "lake_changelog_delta",  # changelog_table -> header/plan entries
    "lake_stream_commits",  # commit_delta_paths reads the delta record
    "lake_maintenance_window",  # incremental_feed walk + expire pre-pass
    "lake_gc_orphans",  # two-phase lock scope + chain-aware union
    "lake_compact_roundtrip",  # shared binpack helper extraction
    # r14 OPTIMIZATION round: plans changed by the measured optimization
    # pass (OPTIMIZATION_r14.md) — they ride for a fresh verdict
    "retrieval_mmr_rerank",  # per-round persist + broadcast picked sets
    "dedup_embedding_cosine_bucketed",  # within-bucket applyInPandas scoring
    "dedup_embedding_cosine_bucketed_auto",  # same + pre-filter sig persist
    "sim_lsh_topk",  # SRP sig UDF no longer optimizer-duplicated
    "dedup_semantic",  # within-cell applyInPandas scoring
    "text_bm25_topk",  # query-term-sized idf aggregate
    "pipeline_pretraining_corpus",  # persisted keepers id set
    "pipeline_corpus_curation",  # persisted keepers id set
]

_R14_NEW = [
    # never driver-scored, must ride per Invariant 1
    "lake_delta_manifest_verbs",  # the r14 O(delta) commit regime
    "lake_rebucket_imported",  # ADVICE r13: the explicit re-bucket escape
    "lake_spj_eqdelete_join",  # VERDICT r13 item 5: bucket-key eq deletes
]

_R14_STALE_REFRESH = [
    # the artifact-computed staleness order: the r7 remainder (8 entries
    # once text_bm25_topk moved to the plan-changed tier), then the
    # alphabetically-oldest r8-stale entries filling the window
    # (membership asserted from the frozen r01-r13 artifacts; the r14
    # optimization pass moved 8 plan-changed entries into _R14_CHANGED,
    # displacing the 8 newest stale-refresh slots per policy — changed
    # outranks stale)
    "sort_global_topk",
    "sql_interface_revenue",
    "stats_moments_by_flag",
    "subquery_above_nation_avg",
    "udaf_weighted_avg_price",
    "window_lag_order_gaps",
    "window_running_order_total",
    "window_top3_orders_per_customer",
    "cdc_scd2_history",
    "cluster_kmeans_embeddings",
    "corpus_cluster_profile",
    "decontaminate_eval_overlap",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_incremental_batch",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "embedding_quantization_error",
    "events_asof_purchase_click",
    "events_max_concurrency",
    "events_pivot_type_counts",
]

def _merged() -> dict[str, QuerySpec]:
    from . import (  # local import to avoid cycles
        core,
        events,
        lakehouse,
        llm,
        maintenance,
        ml,
        tpch_tail,
    )

    pool: dict[str, QuerySpec] = {}
    for mod in (core, llm, events, ml, tpch_tail, maintenance, lakehouse):
        # EXTRA_QUERIES: verified like QUERIES, but never head-eligible
        for queries in (mod.QUERIES, getattr(mod, "EXTRA_QUERIES", {})):
            dup = pool.keys() & queries.keys()
            if dup:
                raise ValueError(f"duplicate query names: {sorted(dup)}")
            pool.update(queries)

    head = _R14_PERMANENT_KEEPS + _R14_CHANGED + _R14_NEW + _R14_STALE_REFRESH
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
