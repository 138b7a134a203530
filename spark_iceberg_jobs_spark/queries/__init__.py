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
#       keeps + plan-changed (the minor-compaction rework + ADVICE pmod
#       bucket fix touch the two incremental-index serves; the late-r8
#       streaming determinism fixes touch the three streaming entries
#       whose aggregation arithmetic changed) + the 6 new entries
#       (mor_equality_deletes, the two compaction legs, SCD2, MV
#       refresh, time travel) + ALL 17 r2-stale entries + the 20 oldest
#       r3-stale, alphabetical (the new + changed entries displaced the
#       six newest stale slots, which lead the r9 refresh tier).
DRIVER_WINDOW = 50

_R8_PERMANENT_KEEPS = [
    "flagship_revenue_topk",  # README.md:17 headline; r1..r7 green
    "cohort_ltv_by_first_year",  # THE r4 flake; decimal-exact since r5
]

_R8_CHANGED = [
    # minor compaction (VERDICT r7 item 3) reworked the segment-serve
    # section of both incremental indexes, and the ADVICE r7 pmod bucket
    # fix bumped the BM25 artifact salts (bm25idx-v3/bm25delta-v3):
    "text_bm25_incremental",
    "sim_ivf_incremental_topk",
    # late-r8 review fixes changed these queries' AGGREGATION ARITHMETIC
    # (exact-DECIMAL money sums replacing round(sum(double)) — the r5
    # conversion had missed the streaming twins — and the stateful
    # sessionizer's cross-chunk global sort + integer-cent fold), so they
    # ride per policy. The round's value-identical mechanical rewrites
    # (run_available_now materialization, the events-ts floor-division
    # fix — identity on every fixture timestamp, schema derivation) are
    # instead covered by the full 245/245 re-verification at both SFs;
    # the window already carries 12 events-family entries as that
    # family's representatives.
    "streaming_tumbling_hourly",
    "streaming_sliding_1h_30m",
    "streaming_stateful_sessions",
]

_R8_NEW = [
    # entries added after the completed rotation — never driver-scored,
    # must ride the current window per Invariant 1 (they displace the
    # newest stale slots: the last THREE alphabetical r3 entries —
    # multimodal_audio_decode, multimodal_image_decode,
    # pipeline_corpus_curation — lead r9's refresh tier instead)
    "mor_equality_deletes",  # the Iceberg v2 MOR read path (operators/mor.py)
    "text_bm25_compacted",  # compaction ≡ segments ≡ rebuild, driver-pinned
    "sim_ivf_compacted_topk",
    "cdc_scd2_history",  # SCD Type 2 validity intervals (MERGE's other half)
    "mv_incremental_refresh",  # exact partial-aggregate MV fold-in
    "maintenance_time_travel",  # AS-OF file-set reconstruction (read side)
]

_R8_STALE_REFRESH = [
    # all 17 entries whose last driver verdict is round 2
    "dedup_embedding_cosine",
    "embedding_quantization_error",
    "graph_pagerank_suppliers",
    "multimodal_payload_features",
    "pack_sequences_stats",
    "sim_centroid_per_label",
    "split_train_val_test",
    "stratified_sample_by_lang",
    "text_bigram_pmi",
    "text_edit_distance_probe",
    "text_fingerprints",
    "text_lang_profile",
    "text_language_id",
    "text_quality_by_source",
    "text_repetition_stats",
    "text_token_counts",
    "text_top_terms",
    # the 23 oldest r3-scored entries (alphabetical; r3 has 44 — the
    # remaining 21, starting with the three displaced by _R8_NEW, lead
    # the r9 refresh tier)
    "cluster_kmeans_embeddings",
    "corpus_cluster_profile",
    "decontaminate_eval_overlap",
    "dedup_clusters",
    "dedup_embedding_cosine_bucketed",
    "dedup_exact",
    "dedup_incremental_batch",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "events_asof_purchase_click",
    "events_max_concurrency",
    "events_pivot_type_counts",
    "events_props_extract",
    "events_range_join_followups",
    "events_retention_cohorts",
    "events_running_value",
    "events_session_window_native",
    "events_sessionization",
    "events_sliding_1h_30m",
    "events_time_rollup",
]


def _merged() -> dict[str, QuerySpec]:
    from . import core, events, llm, maintenance, ml, tpch_tail  # local import to avoid cycles

    pool: dict[str, QuerySpec] = {}
    for mod in (core, llm, events, ml, tpch_tail, maintenance):
        # EXTRA_QUERIES: verified like QUERIES, but never head-eligible
        for queries in (mod.QUERIES, getattr(mod, "EXTRA_QUERIES", {})):
            dup = pool.keys() & queries.keys()
            if dup:
                raise ValueError(f"duplicate query names: {sorted(dup)}")
            pool.update(queries)

    head = _R8_PERMANENT_KEEPS + _R8_CHANGED + _R8_NEW + _R8_STALE_REFRESH
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
