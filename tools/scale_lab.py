"""Scaling-law lab: measure how the curation-tier operators scale with
corpus size, locally, before anyone pays for a cluster.

Builds x{K} replicas of the sf0.1 documents/embeddings tables under
/tmp/scale_lab (replicas are MUTATED — token order rotated per replica,
embedding vectors perturbed per replica — so near-dup structure stays
realistic instead of every doc gaining K exact twins, which would grow
pair outputs quadratically by construction and measure the wrong thing).
Then times each probe operator at every scale and reports the fitted
scaling exponent alpha where t ~ n^alpha (alpha ≈ 1 is linear; the
shuffle-keyed designs should all sit near 1; an alpha ≥ 1.5 is a scale
bug).

Usage: python tools/scale_lab.py [max_scale] [op ...]
       (max_scale from {4, 16, 64, 256}, default 16; 256 exists for the
       serving tier — rag_retrieval/bm25 — whose posting-list boundedness
       is the claim under test at depth, VERDICT r3 item 5)

Timing noise on a busy box is real; exponents are computed min-of-2 per
point and only the largest-scale pair matters for the verdict.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_iceberg_jobs_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
LAB = "/tmp/scale_lab"
SCALES = (1, 4, 16, 64, 256)


def build(spark, scale: int) -> str:
    out = f"{LAB}/x{scale}"
    if os.path.exists(f"{out}/_OK"):
        return out
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    n_emb = emb.agg(F.max("vec_id")).first()[0] + 1
    reps = spark.range(scale).withColumnRenamed("id", "rep")
    # every 3rd token gets a replica-specific salt: ~all 3-gram shingles of
    # a replica differ from every other replica's (a rotation was tried
    # first and is NOT enough — it only breaks shingles at the seam, so all
    # K replicas stayed mutual near-dups and pair outputs grew K²-fold)
    toks = F.split("text", " ")
    d = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(
                F.concat_ws(
                    " ",
                    F.transform(
                        toks,
                        lambda t, i: F.when(
                            i % 3 == 0, F.concat(t, F.lit("r"), F.col("rep"))
                        ).otherwise(t),
                    ),
                )
            )
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    # perturb each replica's vector HARD (O(1) magnitude per dim) and PER
    # VECTOR (the phase depends on vec_id, not only on (rep, dim) — a
    # replica-constant shift was tried first and collapsed each replica
    # into a handful of SRP buckets, manufacturing pathological skew):
    # replicas land in genuinely different cosine neighborhoods, so bucket
    # occupancy grows the way a real corpus' does, not as near-dup twins
    e = (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("rep") * n_emb).alias("vec_id"),
            F.transform(
                "embedding",
                lambda v, i: F.when(F.col("rep") == 0, v).otherwise(
                    v
                    + F.sin(
                        i.cast("double") * 1.7
                        + F.col("rep") * 2.3
                        + F.col("vec_id").cast("double") * 0.6180339887
                    )
                ),
            ).cast("array<float>").alias("embedding"),
            "label",
        )
    )
    d.repartition(max(1, scale)).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    e.repartition(max(1, scale)).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    open(f"{out}/_OK", "w").close()
    return out


def build_tpch(spark, scale: int) -> str:
    """Replicate the sf0.1 TPC-H facts (lineitem, orders) x{scale} with
    orderkeys remapped per replica — order count grows, per-order line
    structure is preserved — while parts/suppliers/customers stay FIXED
    (dims don't grow with fact volume), so per-part and per-supplier group
    cardinalities deepen the way a growing fact's do. Dims are copied
    verbatim so the real query functions run unchanged against the lab
    dir."""
    out = f"{LAB}/x{scale}"
    if os.path.exists(f"{out}/_OK_TPCH"):
        return out
    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    n_ord = orders.agg(F.max("o_orderkey")).first()[0] + 1
    reps = spark.range(scale).withColumnRenamed("id", "rep")
    o = orders.crossJoin(F.broadcast(reps)).select(
        (F.col("o_orderkey") + F.col("rep") * n_ord).alias("o_orderkey"),
        *[c for c in orders.columns if c != "o_orderkey"],
    )
    l = li.crossJoin(F.broadcast(reps)).select(
        (F.col("l_orderkey") + F.col("rep") * n_ord).alias("l_orderkey"),
        *[c for c in li.columns if c != "l_orderkey"],
    )
    o.repartition(max(1, scale)).write.mode("overwrite").parquet(f"{out}/orders.parquet")
    l.repartition(max(1, scale)).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    for dim in ("part", "supplier", "nation", "region", "customer"):
        spark.read.parquet(f"{BASE}/{dim}.parquet").write.mode("overwrite").parquet(
            f"{out}/{dim}.parquet"
        )
    open(f"{out}/_OK_TPCH", "w").close()
    return out


def build_events(spark, scale: int) -> str:
    """Replicate the sf0.1 events x{scale} with user_ids remapped per
    replica — the user population grows, per-user session structure is
    preserved, and every replica lands in the SAME 30-day window, so the
    hot hours stay hot and deepen x{scale}: exactly the bucket-fanout x
    hot-hour-skew interaction the interval-overlap probe measures
    (VERDICT r6 item 4). event_ids are remapped too (they tie-break the
    sessionization window sort)."""
    out = f"{LAB}/x{scale}"
    if os.path.exists(f"{out}/_OK_EVENTS"):
        return out
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    n_user = ev.agg(F.max("user_id")).first()[0] + 1
    n_eid = ev.agg(F.max("event_id")).first()[0] + 1
    reps = spark.range(scale).withColumnRenamed("id", "rep")
    e = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("event_id") + F.col("rep") * n_eid).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("rep") * n_user).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    e.repartition(max(1, scale)).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )
    open(f"{out}/_OK_EVENTS", "w").close()
    return out


def _interval_overlap_probe(s, d):
    from spark_iceberg_jobs_spark.queries.events import (
        events_session_incident_overlap,
    )

    build_events(s, int(os.path.basename(d)[1:]))
    return events_session_incident_overlap(s, d)


def _maintenance_probe(qname, builder):
    """Maintenance-tier probe riding a self-built fact replica (build_tpch
    for orders/lineitem probes, build_events for the CDC merge)."""

    def run(s, d):
        from spark_iceberg_jobs_spark.queries import maintenance

        builder(s, int(os.path.basename(d)[1:]))
        return getattr(maintenance, qname)(s, d)

    return run


def _lakehouse_probe(qname, builder):
    """Executed-lakehouse-tier probe: first invocation per scaled
    fingerprint BUILDS the file-grain artifact (create + the executed
    verb); min-of-2 reps measures the WARM serve — the steady-state cost
    claim (pruned band read / post-commit aggregate / commit-log fold)."""

    def run(s, d):
        from spark_iceberg_jobs_spark.queries import lakehouse

        builder(s, int(os.path.basename(d)[1:]))
        return getattr(lakehouse, qname)(s, d)

    return run


def probes():
    from spark_iceberg_jobs_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        ngram_contamination,
    )
    from spark_iceberg_jobs_spark.operators.similarity import lsh_topk, srp_dedup_pairs
    from spark_iceberg_jobs_spark.operators.splits import pack_sequences
    from spark_iceberg_jobs_spark.operators.text import quality_scores, repetition_stats
    from spark_iceberg_jobs_spark.sources.readers import read_jsonl  # noqa: F401

    def _docs(spark, d):
        return spark.read.parquet(f"{d}/documents.parquet")

    def _emb(spark, d):
        return spark.read.parquet(f"{d}/embeddings.parquet")

    return {
        "dedup_exact": lambda s, d: exact_dedup(_docs(s, d)),
        "dedup_minhash_lsh": lambda s, d: minhash_lsh_pairs(_docs(s, d), portable=False),
        "decontaminate": lambda s, d: ngram_contamination(
            _docs(s, d).filter(F.col("doc_id") % 8 != 0),
            _docs(s, d).filter(F.col("doc_id") % 8 == 0).limit(500),
            n=5,
        ),
        "repetition_stats": lambda s, d: repetition_stats(_docs(s, d)),
        "quality_scores": lambda s, d: quality_scores(_docs(s, d)),
        "pack_sequences": lambda s, d: pack_sequences(
            _docs(s, d), budget=512, shard_col="lang"
        )
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.max("chunk_id").alias("chunks")),
        # production config: auto-sized planes + hot-bucket cap (the fixture
        # embeddings are label-clustered, so replication grows each cluster
        # and uncapped bucket self-joins go quadratic — measured 3.25e9
        # candidate pairs at 64x without the cap, 7.9e6 with it)
        "srp_dedup_pairs": lambda s, d: srp_dedup_pairs(_emb(s, d), max_bucket_rows=512),
        "srp_ann_topk": lambda s, d: lsh_topk(
            _emb(s, d), _emb(s, d).filter(F.col("vec_id") < 10), k=5
        ),
        # 2 fit rounds + final assignment stats; each round is a scan
        # (projection-only assignment) + a k x dim partial-mean shuffle,
        # so the expected shape is linear in corpus size
        "kmeans_fit_assign": _kmeans_probe,
        # 1-to-N codegen expansion: linear in corpus bytes by construction
        "chunk_overlap": lambda s, d: __import__(
            "spark_iceberg_jobs_spark.operators.text", fromlist=["chunk_with_overlap"]
        ).chunk_with_overlap(_docs(s, d), chunk_tokens=16, overlap=4)
        .groupBy()
        .agg(F.count("*").alias("n_chunks")),
        # the single-scan subquery decorrelations (tpch_tail): window-min
        # over grouped rows, partkey-pruned window-avg, per-order
        # collect_set windows — all should be linear in fact volume
        "tpch_q2_mincost": _tpch_probe("q2_min_cost_supplier"),
        "tpch_q17_smallqty": _tpch_probe("q17_small_quantity_revenue"),
        "tpch_q21_waiting": _tpch_probe("q21_waiting_suppliers"),
        # IVF-PQ end-to-end (fit 1+1 rounds, encode, ADC top-5): every fit
        # round and the encode are single scans; serving joins the encoded
        # corpus against 10 broadcast probes — expected linear
        "ivfpq_serve": _ivfpq_probe,
        # persisted-IVF serving (round 7): rep 1 fits + persists the
        # cell-partitioned index, rep 2 (the min) pays only delta
        # assignment + the probed-cells partition read — the warm slope
        # should track the DELTA (10% of corpus) + candidate rescoring,
        # not the base fit
        "ivf_incremental": lambda s, d: __import__(
            "spark_iceberg_jobs_spark.queries.ml",
            fromlist=["sim_ivf_incremental_topk"],
        ).sim_ivf_incremental_topk(s, d),
        # fixed k with the hot-cell cap: production scales k ~ n/const to
        # hold cell occupancy (and with it the n²/k pair work) constant;
        # here the cap is the guard against replica-clustered cells going
        # quadratic, same role as srp_dedup_pairs' max_bucket_rows
        "semantic_dedup": _semdedup_probe,
        # bloom build is bounded by the eval side (fixed 500 docs), train
        # membership is a projection, the confirm join sees survivors only
        "bloom_decontaminate": lambda s, d: __import__(
            "spark_iceberg_jobs_spark.operators.dedup", fromlist=["bloom_contamination"]
        ).bloom_contamination(
            _docs(s, d).filter(F.col("doc_id") % 8 != 0),
            _docs(s, d).filter(F.col("doc_id") % 8 == 0).limit(500),
            n=5,
            bits=1 << 19,
        ),
        # sketch builds: one distinct pass + bounded per-group state — the
        # exchanges carry |groups| x m (HLL) / |groups| x k (KMV) rows
        "hll_registers": lambda s, d: __import__(
            "spark_iceberg_jobs_spark.operators.aggs", fromlist=["hll_registers"]
        ).hll_registers(_docs(s, d), "doc_id", "lang"),
        "kmv_overlap": _kmv_probe,
        # fixed-window ExactSubstr pass: gram census shuffle is linear in
        # token volume; hot grams collapse to count rows (partial aggs)
        "repeated_substrings": lambda s, d: __import__(
            "spark_iceberg_jobs_spark.operators.dedup", fromlist=["repeated_ngram_spans"]
        ).repeated_ngram_spans(_docs(s, d), window=10),
        # inverted-index sparse cosine join: pair work is Sigma_term df^2,
        # so the df cap IS the scale control (high-df terms carry ~zero idf
        # weight — dropping them from candidate generation is the prefix
        # filter); uncapped on this tiny-vocab corpus it would go quadratic
        # by construction
        "tfidf_cosine": lambda s, d: __import__(
            "spark_iceberg_jobs_spark.operators.dedup", fromlist=["tfidf_cosine_pairs"]
        ).tfidf_cosine_pairs(_docs(s, d), threshold=0.9, max_term_df=256),
        # per-char explode + (doc, char) count: linear in corpus bytes
        "char_entropy": lambda s, d: __import__(
            "spark_iceberg_jobs_spark.operators.text", fromlist=["char_entropy"]
        ).char_entropy(_docs(s, d)),
        # 3 GD rounds: each is one scan + a 3-double exchange — expected
        # linear with size-invariant round overhead
        "logreg_fit": _logreg_probe,
        # BM25 serving: posting-list join bounded by the 3 query docs'
        # terms; index build linear in corpus tokens
        "bm25_topk": lambda s, d: __import__(
            "spark_iceberg_jobs_spark.queries.llm", fromlist=["text_bm25_topk"]
        ).text_bm25_topk(s, d),
        # incremental-index serving (round-5): rep 1 builds + persists the
        # base artifact, rep 2 (the min) reuses it and pays ONLY delta
        # indexing + partial merge + rank — the claim is that the warm
        # path's cost tracks the DELTA (10% of corpus) plus the
        # posting-bounded rank, i.e. ~1/10th of bm25_topk's rebuild slope
        "bm25_incremental": lambda s, d: __import__(
            "spark_iceberg_jobs_spark.queries.llm", fromlist=["text_bm25_incremental"]
        ).text_bm25_incremental(s, d),
        # minor compaction (round-8): rep 1 folds delta→base into the
        # compacted artifact (segment reads only — never the corpus),
        # rep 2 (the min) serves from ONE segment — the claim under test
        # is that post-compaction serve time returns to the base-only
        # floor (vs bm25_incremental's two-segment serve at the same
        # scale), i.e. compaction is what stops serve cost growing with
        # the segment list
        "bm25_compacted": lambda s, d: __import__(
            "spark_iceberg_jobs_spark.queries.llm", fromlist=["text_bm25_compacted"]
        ).text_bm25_compacted(s, d),
        "ivf_compacted": lambda s, d: __import__(
            "spark_iceberg_jobs_spark.queries.ml",
            fromlist=["sim_ivf_compacted_topk"],
        ).sim_ivf_compacted_topk(s, d),
        # RAG capstone: chunk expansion (codegen) + chunk-index build
        # (term-keyed) + 3-query retrieval — linear index cost dominates
        "rag_retrieval": lambda s, d: __import__(
            "spark_iceberg_jobs_spark.queries.llm", fromlist=["pipeline_rag_retrieval"]
        ).pipeline_rag_retrieval(s, d),
        # interval-overlap join (round-6 rework): both sides explode into
        # hour buckets, one equi join, first-shared-bucket dedup filter —
        # replicas deepen the SAME hot hours, so per-bucket rows grow
        # linearly on both sides and the join output grows linearly (the
        # P90 hot-hour side stays bounded by 720 hours)
        "interval_overlap": _interval_overlap_probe,
        # round-5 ops: PII sweep is one JVM-regex scan + |sources| agg —
        # expected cleanly linear in corpus bytes
        "pii_scan": lambda s, d: __import__(
            "spark_iceberg_jobs_spark.queries.llm", fromlist=["pii_detect_redact"]
        ).pii_detect_redact(s, d),
        # top-bigram repetition: explode to (doc, bigram) + two partial
        # aggs — shuffle carries distinct bigrams per doc, linear expected
        "repetition_topgram": lambda s, d: __import__(
            "spark_iceberg_jobs_spark.queries.llm",
            fromlist=["quality_repetition_topgram"],
        ).quality_repetition_topgram(s, d),
        # JS drift: explode + vocab-semi-join counts; the top-K vocab and
        # |sources|xK grid are size-invariant, so the token census is the
        # only data-sized stage
        "drift_js": lambda s, d: __import__(
            "spark_iceberg_jobs_spark.queries.llm", fromlist=["drift_js_tokens"]
        ).drift_js_tokens(s, d),
        # lakehouse maintenance tier (round 7): each collapses the fact to
        # file/partition grain in its FIRST aggregate, so everything after
        # the scan is metadata-sized — expected alpha ~1 set by the scan.
        # build_tpch deepens rows per day/month while the date window (and
        # with it the simulated file/partition inventory) stays fixed —
        # exactly how a growing table behaves under a fixed partition spec.
        "zorder_lab": _maintenance_probe("layout_zorder_lab", build_tpch),
        "compaction_bins": _maintenance_probe(
            "maintenance_compaction_bins", build_tpch
        ),
        # CDC merge is the tier's only row-grain shuffle (latest-wins
        # window keyed by user_id); build_events grows the user population
        # x{scale} with per-user history preserved, so state size grows
        # linearly with the changelog
        "cdc_merge": _maintenance_probe("cdc_merge_latest", build_events),
        # expire_snapshots / remove_orphan_files planners: the commit log
        # (one snapshot per order day) is FIXED size under build_tpch —
        # replicas deepen per-day bytes, not the date window — so past the
        # shared day-grain aggregate (persisted once per query) both plans
        # are constant-size metadata; expected alpha set by the one scan
        "snapshot_expiry": _maintenance_probe(
            "maintenance_snapshot_expiry", build_tpch
        ),
        "orphan_files": _maintenance_probe("maintenance_orphan_files", build_tpch),
        # partition-health audit: one month-grain aggregate of lineitem +
        # a broadcast 1-row mean — completes the tier's measurement
        "partition_health": _maintenance_probe(
            "maintenance_partition_health", build_tpch
        ),
        # round-9 lifecycle legs: all commit-log-grain after the shared
        # day-grain aggregate (expected flat-to-scan, like expiry/orphans)
        "incremental_scan": _maintenance_probe(
            "maintenance_incremental_scan", build_tpch
        ),
        "rollback_plan": _maintenance_probe("maintenance_rollback_plan", build_tpch),
        # r10 DELETE classifier: commit-log-grain after the shared
        # day-grain aggregate (expected flat, like the other planners)
        "delete_plan": _maintenance_probe("maintenance_delete_plan", build_tpch),
        "partition_evolution": _maintenance_probe(
            "maintenance_partition_evolution", build_tpch
        ),
        # rewired r9: delta derived from the incremental scan — one fact
        # scan for partials + the persisted day-grain commit log
        "mv_refresh": _maintenance_probe("mv_incremental_refresh", build_tpch),
        # row-grain CDF diff: ONE user_id shuffle with conditional
        # struct-MAX partials — the tier's only data-sized r9 stage;
        # build_events grows users x{scale} with history preserved
        "changelog_diff": _maintenance_probe("cdc_changelog_diff", build_events),
        # r10 row-grain variant: same one-shuffle states kernel + a
        # TakeOrderedAndProject top-k (per-partition heads + k-row driver
        # merge) — expected to track changelog_diff point for point
        "changelog_rows": _maintenance_probe("cdc_changelog_rows", build_events),
        # r10 executed lakehouse verbs (queries/lakehouse.py): warm-serve
        # scaling — skipping scan reads the fixed ~10% band (linear in
        # band bytes, with files_read/files_total ~constant); delete and
        # merge serves aggregate the post-commit table; stream-commits
        # folds the 3 per-commit partials (linear in events)
        "lake_skipping": _lakehouse_probe("lake_skipping_scan", build_tpch),
        "lake_cow_delete": _lakehouse_probe("lake_cow_delete", build_tpch),
        "lake_merge": _lakehouse_probe("lake_merge_into", build_tpch),
        "lake_stream": _lakehouse_probe("lake_stream_commits", build_events),
        # MOR serve: the anti-join read path over (delete seq > data seq);
        # schema serve: cross-generation per-seq projection union; bloom:
        # O(probes) point read; compact: post-rewrite clustered scan
        "lake_mor": _lakehouse_probe("lake_mor_delete", build_tpch),
        "lake_schema": _lakehouse_probe("lake_schema_evolution", build_tpch),
        "lake_bloom": _lakehouse_probe("lake_bloom_point_lookup", build_tpch),
        "lake_compact": _lakehouse_probe("lake_compact_roundtrip", build_tpch),
        # spec-evolution cross-spec band scan; z-order 2-D box probe
        "lake_spec": _lakehouse_probe("lake_spec_evolution_scan", build_tpch),
        "lake_zorder": _lakehouse_probe("lake_zorder_box_scan", build_tpch),
        # position-delete MOR serve: file+ordinal anti join
        "lake_pos": _lakehouse_probe("lake_pos_delete", build_tpch),
        # r11: the fold-gate serve is the FOLDED twin of lake_pos — same
        # delete volume, but the write path folded past the 0.018
        # threshold, so the serve is a pure data scan (the flat family
        # lake_pos's unfolded anti join departs from at depth)
        "lake_fold_gate": _lakehouse_probe("lake_fold_gate_serve", build_tpch),
        # manifest-delta CDF: reads only changed files, diff via exceptAll
        # over the delta rows (linear in changed bytes)
        "lake_cdf_delta": _lakehouse_probe("lake_changelog_delta", build_tpch),
        # compact → expire → incremental consume: bootstrap + delta folds
        "lake_maint_window": _lakehouse_probe("lake_maintenance_window", build_events),
        # executed CoW UPDATE: post-commit clustered aggregate (flat family)
        "lake_update": _lakehouse_probe("lake_update_where", build_tpch),
        # r12 deletion vectors: four UNFOLDED ~1% delete commits merged
        # into per-file vectors — the serve must stay in the flat family
        # WITHOUT any fold (the structural fix for lake_pos's tail)
        "lake_dv": _lakehouse_probe("lake_dv_serve", build_tpch),
        # r12 MOR MERGE serve: post-merge MOR read (eqdelete anti join)
        "lake_merge_mor": _lakehouse_probe("lake_merge_mor", build_tpch),
        # r12 storage-partitioned join: bucket-aligned manifest pairing,
        # zero fact-side shuffle (expected linear in joined bytes)
        "lake_spj": _lakehouse_probe("lake_spj_bucketed_join", build_tpch),
        # r12 orphan GC: post-GC clustered aggregate (flat family)
        "lake_gc": _lakehouse_probe("lake_gc_orphans", build_tpch),
        # r13 fact⋈fact SPJ under the broadcast valve: BOTH sides grow
        # with scale (lineitem ⋈ orders — the reference's shared
        # bucket(16, match_id) shape), broadcast_max_bytes=0 so every
        # bucket is a bucket-scoped SORT-MERGE join (spillable —
        # shuffle_hash was measured fatal at 64×). Expected linear
        # in joined bytes with FLAT broadcast memory (zero) — the r12
        # design would have pushed ~orders' bytes through the driver.
        "lake_spj_ff": _lakehouse_probe("lake_spj_factfact_join", build_tpch),
        # r13 SPJ ∘ DV: dv'd bucket files pay the file-local probe inside
        # the aligned per-bucket join (probe side grows; dim fixed)
        "lake_spj_dv": _lakehouse_probe("lake_spj_dv_join", build_tpch),
        # r14 O(delta) commit regime: build runs the full verb history as
        # manifest deltas (threshold 0 in the build); serve resolves the
        # chain through the parquet manifest table (expected flat serve —
        # the commit-cost story is the synthetic-manifest lab in
        # SCALE.md §Round-14, which this probe does not repeat)
        "lake_delta": _lakehouse_probe("lake_delta_manifest_verbs", build_tpch),
        # r14 bucket-key equality deletes through the SPJ: seq-gated
        # anti join inside each per-bucket scan (probe side grows)
        "lake_spj_eq": _lakehouse_probe("lake_spj_eqdelete_join", build_tpch),
    }


def _ivfpq_probe(s, d):
    from spark_iceberg_jobs_spark.operators.similarity import (
        ivfpq_adc_topk,
        kmeans_fit,
        pq_fit,
        residuals,
    )

    emb = s.read.parquet(f"{d}/embeddings.parquet")
    cents = kmeans_fit(emb, k=8, iterations=1)
    res = residuals(emb, cents)
    books = pq_fit(res, m=4, k=8, iterations=1, dim=64, id_col="vid", vec_col="res")
    probes_df = emb.filter(F.col("vec_id") < 10)
    return ivfpq_adc_topk(emb, probes_df, cents, books, k=5, nprobe=3)


def _semdedup_probe(s, d):
    from spark_iceberg_jobs_spark.operators.dedup import semantic_dedup
    from spark_iceberg_jobs_spark.operators.similarity import kmeans_fit

    emb = s.read.parquet(f"{d}/embeddings.parquet")
    cents = kmeans_fit(emb, k=8, iterations=1)
    return semantic_dedup(emb, cents, threshold=0.42, max_cell_rows=2048)


def _logreg_probe(s, d):
    from spark_iceberg_jobs_spark.functions.texts import normalize, tokens
    from spark_iceberg_jobs_spark.operators.regression import logreg_fit, logreg_predict

    docs = s.read.parquet(f"{d}/documents.parquet")
    feats = docs.select(
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        (F.col("n_chars") / 300.0).alias("x1"),
        (F.size(tokens(normalize("text"))) / 50.0).alias("x2"),
    )
    w = logreg_fit(feats, label_col="y", feature_cols=["x1", "x2"], iterations=3)
    return feats.agg(F.avg(logreg_predict(feats, w, ["x1", "x2"])).alias("mean_pred"))


def _kmv_probe(s, d):
    from spark_iceberg_jobs_spark.operators.aggs import (
        kmv_pairwise_overlap,
        kmv_sketches,
    )

    docs = s.read.parquet(f"{d}/documents.parquet")
    return kmv_pairwise_overlap(kmv_sketches(docs, "doc_id", "lang"), "lang")


def _tpch_probe(qname):
    def run(s, d):
        from spark_iceberg_jobs_spark.queries import tpch_tail

        build_tpch(s, int(os.path.basename(d)[1:]))
        return getattr(tpch_tail, qname)(s, d)

    return run


def _kmeans_probe(s, d):
    from spark_iceberg_jobs_spark.functions.vectors import as_double
    from spark_iceberg_jobs_spark.operators.similarity import assign_cells, kmeans_fit

    emb = s.read.parquet(f"{d}/embeddings.parquet")
    cents = kmeans_fit(emb, k=8, iterations=2)
    e = emb.select(F.col("vec_id").alias("cid"), as_double("embedding").alias("v"))
    return assign_cells(e, cents).groupBy("cell").count()


def run_probe(spark, fn, d) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn(spark, d).count()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    max_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    only = set(sys.argv[2:])
    scales = [s for s in SCALES if s <= max_scale]
    spark = get_spark("scale-lab")
    selected = [n for n in probes() if not only or n in only]
    # the documents/embeddings replica build is the lab's most expensive
    # step — skip it when every selected probe builds its own tables
    # (tpch_* via build_tpch, interval_overlap via build_events)
    self_building = (
        "interval_overlap",
        "zorder_lab",
        "compaction_bins",
        "cdc_merge",
        "snapshot_expiry",
        "orphan_files",
        "partition_health",
        "incremental_scan",
        "rollback_plan",
        "delete_plan",
        "partition_evolution",
        "mv_refresh",
        "changelog_diff",
        "changelog_rows",
        "lake_skipping",
        "lake_cow_delete",
        "lake_merge",
        "lake_stream",
        "lake_mor",
        "lake_schema",
        "lake_bloom",
        "lake_compact",
        "lake_spec",
        "lake_zorder",
        "lake_pos",
        "lake_fold_gate",
        "lake_cdf_delta",
        "lake_maint_window",
        "lake_update",
        "lake_dv",
        "lake_merge_mor",
        "lake_spj",
        "lake_gc",
        "lake_spj_ff",
        "lake_spj_dv",
        "lake_delta",
        "lake_spj_eq",
    )
    needs_corpus = any(
        not n.startswith("tpch_") and n not in self_building for n in selected
    )
    dirs = {s: (build(spark, s) if needs_corpus else f"{LAB}/x{s}") for s in scales}
    results = {}
    for name, fn in probes().items():
        if name not in selected:
            continue
        times = {}
        for s in scales:
            times[s] = round(run_probe(spark, fn, dirs[s]), 3)
        lo, hi = scales[0], scales[-1]
        alpha = math.log(max(times[hi], 1e-3) / max(times[lo], 1e-3)) / math.log(hi / lo)
        results[name] = {"times": times, "alpha": round(alpha, 2)}
        print(json.dumps({"op": name, **results[name]}), flush=True)
    worst = max(results.values(), key=lambda r: r["alpha"])["alpha"] if results else 0
    print(json.dumps({"metric": "scale_lab", "worst_alpha": worst, "scales": scales}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
