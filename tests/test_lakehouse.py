"""Registry-level pins for the executed lakehouse verb tier
(queries/lakehouse.py): the value correctness is the DuckDB oracle's job
(verify sweep / driver); here we pin the FILE-GRAIN claims — that the
skipping scan actually skips, that the DELETE actually split into
metadata drops + one CoW rewrite, that the MERGE actually rewrote only
match-bearing files — by reading the published artifacts' manifests."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from spark_iceberg_jobs_spark.queries.lakehouse import (
    _BAND_HI_FRAC,
    _BAND_LO_FRAC,
    _LAKE_DELETE_AGE_DAYS,
    lake_cow_delete,
    lake_merge_into,
    lake_skipping_scan,
)
from spark_iceberg_jobs_spark.sources import filetable as ft


def _published_dir(prefix: str, sf_dir: str, source: str, salt: str) -> str:
    from spark_iceberg_jobs_spark.functions.artifacts import (
        artifact_path,
        content_fingerprint,
    )

    return artifact_path(prefix, content_fingerprint(f"{sf_dir}/{source}.parquet", salt=salt))


def test_skipping_scan_reads_band_fraction_of_files(spark, sf_dir):
    lake_skipping_scan(spark, sf_dir).collect()  # ensure artifact exists
    td = _published_dir("lakescan_", sf_dir, "lineitem", "lakescan-v1")
    man = ft.read_manifest(td)
    lo = min(dt.date.fromisoformat(e["stats"]["ship_dt"][0]) for e in man["entries"])
    hi = max(dt.date.fromisoformat(e["stats"]["ship_dt"][1]) for e in man["entries"])
    span = (hi - lo).days
    b_lo = lo + dt.timedelta(days=int(span * _BAND_LO_FRAC))
    b_hi = lo + dt.timedelta(days=int(span * _BAND_HI_FRAC))
    plan = ft.plan_scan(td, "ship_dt", b_lo, b_hi)
    # a ~10% band over range-clustered files must skip the large majority
    assert plan["files_total"] >= 40
    assert plan["files_read"] <= plan["files_total"] * 0.25, plan
    assert plan["files_skipped"] >= plan["files_total"] * 0.75, plan


def test_cow_delete_commit_split_metadata_vs_rewrite(spark, sf_dir):
    lake_cow_delete(spark, sf_dir).collect()
    td = _published_dir("lakedel_", sf_dir, "orders", "lakedel-v1")
    # v1 = create, v2 = the executed DELETE
    assert ft.read_manifest(td, 1)["operation"] == "create"
    man = ft.read_manifest(td)
    assert man["version"] == 2 and man["operation"] == "delete"
    s = man["summary"]
    # a 200-day retention cutoff over a multi-year corpus: most files
    # drop by pure metadata, AT MOST ONE range-clustered file straddles
    assert s["files_dropped_metadata"] >= 20
    assert s["files_rewritten"] <= 1
    assert s["rows_deleted"] > 0
    # executed result honors the predicate exactly
    before = ft.read_manifest(td, 1)
    hi = max(dt.date.fromisoformat(e["stats"]["order_dt"][1]) for e in before["entries"])
    cutoff = hi - dt.timedelta(days=_LAKE_DELETE_AGE_DAYS)
    served = ft.read_table(spark, td)
    assert served.filter(F.col("order_dt") <= F.lit(cutoff)).count() == 0
    n_before = sum(e["rows"] for e in before["entries"])
    assert served.count() == n_before - s["rows_deleted"]


def test_cow_delete_executed_commit_equals_bounds_prediction(spark, sf_dir):
    """The planner-vs-executor consistency claim: predict the commit from
    the PRE-delete manifest with maintenance_delete_plan's rule (full
    cover → metadata drop, straddle → rewrite, else untouched) and
    assert the executed summary agrees exactly."""
    lake_cow_delete(spark, sf_dir).collect()
    td = _published_dir("lakedel_", sf_dir, "orders", "lakedel-v1")
    before = ft.read_manifest(td, 1)["entries"]
    spans = [
        (
            dt.date.fromisoformat(e["stats"]["order_dt"][0]),
            dt.date.fromisoformat(e["stats"]["order_dt"][1]),
        )
        for e in before
    ]
    hi = max(b for _a, b in spans)
    cutoff = hi - dt.timedelta(days=_LAKE_DELETE_AGE_DAYS)
    pred_drop = sum(1 for _a, b in spans if b <= cutoff)
    pred_rewrite = sum(1 for a, b in spans if a <= cutoff < b)
    pred_keep = len(spans) - pred_drop - pred_rewrite
    s = ft.read_manifest(td)["summary"]
    assert s["files_dropped_metadata"] == pred_drop
    assert s["files_rewritten"] == pred_rewrite
    assert s["files_untouched"] == pred_keep


def test_merge_into_rewrites_only_match_bearing_files(spark, sf_dir):
    lake_merge_into(spark, sf_dir).collect()
    td = _published_dir("lakemrg_", sf_dir, "customer", "lakemrg-v2")
    man = ft.read_manifest(td)
    assert man["operation"] == "merge"
    s = man["summary"]
    # the matched band is the LOW quarter of the keyspace: the rewrite
    # must be file-scoped, not table-wide
    assert 1 <= s["files_rewritten"] <= s["files_candidates"]
    assert s["files_untouched"] >= s["files_rewritten"]
    assert s["rows_inserted"] > 0 and s["rows_deleted"] > 0
    # untouched files carried over from v1 with identical paths
    v1_paths = {e["path"] for e in ft.read_manifest(td, 1)["entries"]}
    cur_paths = {e["path"] for e in man["entries"]}
    assert len(v1_paths & cur_paths) == s["files_untouched"]
    # every NEWACCT insert landed above the original keyspace
    served = ft.read_table(spark, td)
    max_v1 = max(
        int(e["stats"]["c_custkey"][1]) for e in ft.read_manifest(td, 1)["entries"]
    )
    new_min = (
        served.filter(F.col("c_mktsegment") == "NEWACCT")
        .agg(F.min("c_custkey").alias("m"))
        .collect()[0]["m"]
    )
    assert new_min is not None and new_min > max_v1


def test_stream_commits_deltas_partition_the_table(spark, sf_dir):
    from spark_iceberg_jobs_spark.queries.lakehouse import lake_stream_commits

    lake_stream_commits(spark, sf_dir).collect()
    td = _published_dir("lakestr_", sf_dir, "events", "lakestr-v1")
    cur = ft.current_manifest_version(td)
    assert cur == 3, "create + two appends"
    deltas = [ft.commit_delta_paths(td, v) for v in range(1, cur + 1)]
    flat = [p for d in deltas for p in d]
    assert all(deltas), "every commit added files"
    assert len(flat) == len(set(flat)), "commit deltas must be disjoint"
    live = {e["path"] for e in ft.read_manifest(td)["entries"]}
    import os as _os

    assert {_os.path.relpath(p, td) for p in flat} == live, (
        "append-only history: union of deltas == current snapshot"
    )


def test_stream_commits_readstream_arrival_equals_batch(spark, sf_dir):
    """The true Structured Streaming leg: a parquet file-stream source
    over the table's data directory (availableNow) must see exactly the
    committed rows — arrival-order consumption and commit-log
    consumption agree on an append-only table."""
    from spark_iceberg_jobs_spark.queries.lakehouse import lake_stream_commits
    from spark_iceberg_jobs_spark.streaming.events_stream import run_available_now

    lake_stream_commits(spark, sf_dir).collect()
    td = _published_dir("lakestr_", sf_dir, "events", "lakestr-v1")
    batch = ft.read_table(spark, td)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(f"{td}/data/*")
    )
    agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))
    got = {
        r["event_type"]: r["n"]
        for r in run_available_now(agg, output_mode="complete").collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in batch.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_bloom_point_lookup_prunes_unclustered_key(spark, sf_dir):
    from spark_iceberg_jobs_spark.queries.lakehouse import (
        _BLOOM_N_PROBES,
        lake_bloom_point_lookup,
    )

    lake_bloom_point_lookup(spark, sf_dir).collect()
    td = _published_dir("lakept_", sf_dir, "orders", "lakept-v1")
    man = ft.read_manifest(td)
    # zone maps are USELESS here: date-clustered files each span (nearly)
    # the whole o_orderkey range, so a key-range plan_scan keeps ~all files
    lo = min(int(e["stats"]["o_orderkey"][0]) for e in man["entries"])
    hi = max(int(e["stats"]["o_orderkey"][1]) for e in man["entries"])
    probes = [
        lo + (i * (hi - lo)) // (_BLOOM_N_PROBES + 1)
        for i in range(1, _BLOOM_N_PROBES + 1)
    ]
    zone = ft.plan_scan(td, "o_orderkey", probes[0], probes[0])
    assert zone["files_read"] >= zone["files_total"] * 0.8, (
        "precondition: the clustered column's zone maps cannot prune this key"
    )
    # the bloom CAN: at most #probes true files + false-positive slack
    plan = ft.plan_bloom_lookup(td, "o_orderkey", probes)
    assert plan["files_total"] >= 30
    assert plan["files_read"] <= _BLOOM_N_PROBES + 5, plan
    # soundness: the pruned read returns exactly the probe rows
    found = ft.point_lookup(spark, td, "o_orderkey", probes)
    keys = sorted(r["o_orderkey"] for r in found.collect())
    assert keys == sorted(set(probes)), "bloom pruning must never lose a row"


def test_bloom_index_stale_after_commit_raises(spark, sf_dir, tmp_path):
    import pytest as _pytest

    td = str(tmp_path / "pt")
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    ft.create_table(df, td, stats_cols=["k"], cluster_by="k", n_files=4)
    ft.build_bloom_index(spark, td, "k", bits=1 << 12)
    assert ft.plan_bloom_lookup(td, "k", [5])["files_read"] >= 1
    ft.append_table(
        spark.range(1000, 1010).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        ),
        td,
        n_files=1,
    )
    with _pytest.raises(ValueError, match="stale|rebuild"):
        ft.plan_bloom_lookup(td, "k", [5])


def test_spec_evolution_scan_generation_accounting(spark, sf_dir):
    from spark_iceberg_jobs_spark.queries.lakehouse import lake_spec_evolution_scan

    lake_spec_evolution_scan(spark, sf_dir).collect()
    td = _published_dir("lakespec_", sf_dir, "orders", "lakespec-v1")
    man = ft.read_manifest(td)
    gen1 = [e for e in man["entries"] if e["stats"].get("o_custkey") is None]
    gen2 = [e for e in man["entries"] if e["stats"].get("o_custkey") is not None]
    assert gen1 and gen2, "both spec generations must be live"
    plan = ft.plan_scan(td, "o_custkey", 0, 10)
    # every old-spec file is (conservatively) read; the band prunes
    # almost all new-spec files
    assert plan["files_read"] >= len(gen1)
    assert plan["files_skipped"] >= len(gen2) - 3, plan


def test_zorder_box_scan_prunes_both_dimensions(spark, sf_dir):
    import datetime as _dtt

    from spark_iceberg_jobs_spark.queries.lakehouse import (
        _ZBOX_HI_FRAC,
        _ZBOX_KEY_FRACTION,
        _ZBOX_LO_FRAC,
        lake_zorder_box_scan,
    )

    lake_zorder_box_scan(spark, sf_dir).collect()
    td = _published_dir("lakez_", sf_dir, "orders", "lakez-v1")
    man = ft.read_manifest(td)
    assert man["operation"] == "rewrite-layout"
    # natural layout (v1) could not prune the custkey dimension: every
    # date-clustered file spans (nearly) the whole keyspace — shown by
    # the ABSENCE of custkey bounds there (spec collected dates only)
    v1 = ft.read_manifest(td, 1)
    assert "o_custkey" not in v1["stats_types"]
    max_key = max(int(e["stats"]["o_custkey"][1]) for e in man["entries"])
    lo = min(_dtt.date.fromisoformat(e["stats"]["order_dt"][0]) for e in man["entries"])
    hi = max(_dtt.date.fromisoformat(e["stats"]["order_dt"][1]) for e in man["entries"])
    span = (hi - lo).days
    box = {
        "o_custkey": (0, max_key // _ZBOX_KEY_FRACTION),
        "order_dt": (
            lo + _dtt.timedelta(days=int(span * _ZBOX_LO_FRAC)),
            lo + _dtt.timedelta(days=int(span * _ZBOX_HI_FRAC)),
        ),
    }
    plan = ft.plan_scan_box(td, box)
    # ~1/6 x ~1/5 box over z-ordered files: must beat EITHER single
    # dimension's best-case pruning (1/6 of files)
    assert plan["files_total"] >= 20
    assert plan["files_read"] < plan["files_total"] / 2, plan
    # soundness: pruned box result equals the full-scan filter
    got = ft.scan_box(spark, td, box).count()
    full = ft.read_table(spark, td)
    want = full.filter(
        (F.col("o_custkey") >= 0)
        & (F.col("o_custkey") <= box["o_custkey"][1])
        & (F.col("order_dt") >= F.lit(box["order_dt"][0]))
        & (F.col("order_dt") <= F.lit(box["order_dt"][1]))
    ).count()
    assert got == want


def test_skipping_scan_pushes_band_predicate_into_parquet(spark, sf_dir):
    """Two-level skipping: manifest pruning picks the files AND the same
    literal band predicate reaches the parquet scan (PushedFilters), so
    row groups inside surviving files prune too."""
    import datetime as dtt

    lake_skipping_scan(spark, sf_dir).collect()
    td = _published_dir("lakescan_", sf_dir, "lineitem", "lakescan-v1")
    df = ft.scan_range(
        spark, td, "ship_dt", dtt.date(1996, 1, 1), dtt.date(1996, 6, 30)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(ship_dt" in plan and "LessThanOrEqual(ship_dt" in plan


def test_fold_gate_fires_at_predicted_commits_and_drains(spark, sf_dir, tmp_path):
    """VERDICT r10 item 1 — the write path consults fold_pressure after
    every delete commit: four ~1% position-delete commits against the
    0.018 threshold fire the fold at commits 2 and 4 exactly (ratio
    0.01 / 0.02 / ~0.0102 / ~0.0204), the table ends with ZERO live
    delete files, the commit history records exactly two fold-deletes
    replace commits, and visibility equals the exact predicate
    complement throughout."""
    from spark_iceberg_jobs_spark.queries.lakehouse import (
        _FOLD_GATE_MODULUS,
        _FOLD_GATE_SLICES,
        _FOLD_GATE_THRESHOLD,
    )

    td = str(tmp_path / "foldgate")
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("order_dt", F.to_date("o_orderdate"))
        .select("o_orderkey", "order_dt", "o_totalprice")
    )
    ft.create_table(
        orders, td, stats_cols=["order_dt"], cluster_by="order_dt", n_files=8
    )
    summaries = []
    for i in range(_FOLD_GATE_SLICES):
        summaries.append(
            ft.delete_positions_mor(
                spark,
                td,
                F.col("o_orderkey") % _FOLD_GATE_MODULUS == i,
                auto_fold_threshold=_FOLD_GATE_THRESHOLD,
            )
        )
    # the gate was CONSULTED on every commit and fired on 2 and 4 only
    assert all("fold_ratio" in s and "folded" in s for s in summaries)
    assert [s["folded"] for s in summaries] == [False, True, False, True]
    assert all("fold_summary" in s for s in summaries if s["folded"])
    # drained: the published state carries no live delete files, so the
    # serve is a pure data scan (the flat-family plan)
    data, eqs, poss, dvs = ft._split_entries(ft.read_manifest(td))
    assert not eqs and not poss and data
    ops = [ft.read_manifest(td, v)["operation"] for v in ft._manifest_versions(td)]
    assert ops.count("fold-deletes") == 2
    got = ft.read_table(spark, td).count()
    want = orders.filter(
        F.col("o_orderkey") % _FOLD_GATE_MODULUS >= _FOLD_GATE_SLICES
    ).count()
    assert got == want


def test_maintenance_window_feed_shape_and_naive_double_count(spark, sf_dir, tmp_path):
    """VERDICT r10 item 6 planted test: after compact → expire → append,
    the incremental feed bootstraps from the oldest retained snapshot,
    skips the compaction (replace) commit, and consumes the later
    append's delta — seeing every row exactly once. The NAIVE consumer
    that also ingests the replace commit's file delta double-counts the
    compacted rows; the wrong rule is demonstrably wrong here."""
    td = str(tmp_path / "mw")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    ft.create_table(
        ev.filter(F.col("event_id") % 4 == 0),
        td,
        stats_cols=["event_id"],
        cluster_by="event_id",
        n_files=4,
    )
    for rem in (1, 2):
        ft.append_table(ev.filter(F.col("event_id") % 4 == rem), td, n_files=4)
    total = sum(e["bytes"] for e in ft.read_manifest(td)["entries"])
    ft.compact_table(spark, td, target_bytes=total // 3 + 1)
    ft.append_table(ev.filter(F.col("event_id") % 4 == 3), td, n_files=4)
    ft.expire_table(td, keep_last=3)
    assert ft._manifest_versions(td) == [3, 4, 5], "expiry dropped the early history"

    feed = ft.incremental_feed(td)
    assert [b["kind"] for b in feed] == ["bootstrap", "replace-skip", "delta"]
    assert [b["operation"] for b in feed] == ["append", "compact", "append"]
    assert feed[1]["paths"] == [], "the replace commit must contribute no batch"

    correct = sum(
        spark.read.parquet(*b["paths"]).count() for b in feed if b["paths"]
    )
    want = ev.count()
    assert correct == want, "exactly-once: feed total equals the table"
    # the naive rule: also ingest the compaction commit's file delta
    compact_delta = [
        os.path.join(td, e["path"])
        for e in ft.read_manifest(td, 4)["entries"]
        if e["path"] not in {x["path"] for x in ft.read_manifest(td, 3)["entries"]}
    ]
    assert compact_delta, "compaction did rewrite files"
    naive = correct + spark.read.parquet(*compact_delta).count()
    assert naive > want, "the naive consumer double-counts the compacted rows"


def test_incremental_feed_raises_on_content_changing_rewrites(spark, tmp_path):
    """A delete commit removes rows; an append-only feed cannot express
    that — the feed must fail loudly, steering to changelog_table."""
    import pytest as _pytest

    td = str(tmp_path / "mwdel")
    df = spark.createDataFrame([(i, i % 3) for i in range(100)], "k long, g long")
    ft.create_table(df, td, stats_cols=["k"], cluster_by="k", n_files=4)
    ft.delete_where(spark, td, "k", 10)
    with _pytest.raises(ValueError, match="changelog_table"):
        ft.incremental_feed(td)


def test_spj_factfact_plan_has_no_broadcast_exchange(spark, sf_dir):
    """r13 valve pin at the registry level: the fact⋈fact SPJ plans with
    ZERO BroadcastExchange (the driver-memory scale-killer VERDICT r12
    named) — every bucket is a bucket-scoped shuffled-hash join."""
    from spark_iceberg_jobs_spark.queries.lakehouse import lake_spj_factfact_join

    df = lake_spj_factfact_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan, "the valve must suppress every broadcast"
    assert "SortMergeJoin" in plan  # spillable — shuffle_hash measured fatal at 64x
    assert df.count() > 0


def test_spj_dv_join_no_fact_shuffle_and_no_deleted_key(spark, sf_dir):
    """r13 DV-composition pin: the DV-carrying bucketed join keeps
    bucket alignment (no Exchange hashpartitioning below the agg) and
    serves no deleted order — checked at the JOIN output, not the agg."""
    from spark_iceberg_jobs_spark.queries.lakehouse import lake_spj_dv_join

    lake_spj_dv_join(spark, sf_dir).collect()  # ensure artifact exists
    root = _published_dir("lakespjdv_", sf_dir, "orders", "lakespjdv-v1")
    j = ft.storage_partitioned_join(
        spark,
        os.path.join(root, "orders_b"),
        os.path.join(root, "cust_b"),
        on=("o_custkey", "c_custkey"),
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    n_deleted = j.filter(F.col("o_orderkey") % 50 < 3).count()
    assert n_deleted == 0, "a dv'd row must never survive into the join output"
    man = ft.read_manifest(os.path.join(root, "orders_b"))
    assert any(e.get("kind") == "dv" for e in man["entries"]), (
        "the build must have left the vectors LIVE (no fold)"
    )
