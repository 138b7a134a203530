"""Semantics tests for the lakehouse table-maintenance tier.

The registry smoke + DuckDB oracle comparison cover end-to-end equality;
these tests pin the PROPERTIES each operator promises — the bin-packing
overflow bound, zone-map pruning actually winning under z-order, the
partition-health invariants, and the CDC latest-wins/tombstone rules on a
planted changelog.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from spark_iceberg_jobs_spark.queries.maintenance import (
    _COMPACT_TARGET,
    _ROW_BYTES,
    cdc_materialize,
    layout_zorder_lab,
    maintenance_compaction_bins,
    maintenance_partition_health,
)
from spark_iceberg_jobs_spark.sources.readers import read_fixture


def test_compaction_bins_pack_property(spark, sf_dir):
    """Running-sum binpack: bins are contiguous per partition, cover every
    file exactly once, and only the bin's LAST file may push it past the
    target (overflow bounded by one file)."""
    bins = maintenance_compaction_bins(spark, sf_dir).collect()
    orders = read_fixture(spark, sf_dir, "orders")
    n_days = orders.select(F.date_format("o_orderdate", "yyyy-MM-dd")).distinct().count()
    assert sum(r.n_files for r in bins) == n_days
    total = orders.count() * _ROW_BYTES
    assert sum(r.total_bytes for r in bins) == total
    by_year: dict[int, list] = {}
    for r in bins:
        by_year.setdefault(r.part_year, []).append(r)
    for year, rows in by_year.items():
        ids = sorted(r.bin_id for r in rows)
        assert ids == list(range(len(ids))), f"bins not contiguous in {year}"
        # bound: a bin holds < target before its last file joined, and a
        # single day-file is at most max_file bytes
        max_file = max(r.total_bytes for r in rows)  # conservative bound
        for r in rows:
            assert r.total_bytes < _COMPACT_TARGET + max_file
        # date ranges must not interleave across consecutive bins
        ordered = sorted(rows, key=lambda r: r.bin_id)
        for a, b in zip(ordered, ordered[1:]):
            assert a.last_day <= b.first_day


def test_zorder_prunes_natural_does_not(spark, sf_dir):
    rows = {r.layout: r for r in layout_zorder_lab(spark, sf_dir).collect()}
    assert set(rows) == {"natural", "zorder"}
    nat, zo = rows["natural"], rows["zorder"]
    # identical query answer under both layouts
    assert nat.rows_matched == zo.rows_matched
    # z-order must actually prune; natural order's zone maps straddle the box
    assert zo.skip_ratio > nat.skip_ratio
    assert zo.files_scanned < zo.n_files
    # both box edges are Morton-block aligned (blocks 4..7 x 2..5), so a
    # z-file outside those 16 blocks has a provably disjoint zone map
    assert zo.files_scanned <= 16
    assert zo.rows_matched > 0


def test_partition_health_invariants(spark, sf_dir):
    rows = maintenance_partition_health(spark, sf_dir).collect()
    li_count = read_fixture(spark, sf_dir, "lineitem").count()
    assert sum(r.n_rows for r in rows) == li_count
    for r in rows:
        assert r.n_files >= 1
        assert 0 < r.fill_ratio <= 1.0
        assert r.part_bytes == r.n_rows * _ROW_BYTES
        assert r.needs_attention == (r.fill_ratio < 0.5 or r.skew_vs_mean > 2.0)


def test_cdc_materialize_planted_changelog(spark):
    """Latest-wins + tombstone semantics on a hand-built changelog:
    upsert-then-delete dies, delete-then-upsert lives, ts ties break by
    event_id (higher wins)."""
    t = datetime.datetime
    ev = spark.createDataFrame(
        [
            # user 1: purchase then LATER error -> tombstoned
            (1, t(2024, 1, 1, 10), 10, "purchase", 50.0, "{}"),
            (2, t(2024, 1, 2, 10), 10, "error", None, "{}"),
            # user 2: error then LATER click -> resurrected, live
            (3, t(2024, 1, 1, 10), 20, "error", None, "{}"),
            (4, t(2024, 1, 2, 10), 20, "click", 1.0, "{}"),
            # user 3: ts tie -> higher event_id (view) wins
            (5, t(2024, 1, 1, 10), 30, "purchase", 9.0, "{}"),
            (6, t(2024, 1, 1, 10), 30, "view", 2.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = {r.user_id: r for r in cdc_materialize(ev).collect()}
    assert len(out) == 3
    assert out[10].event_type == "error" and out[10].live is False
    assert out[20].event_type == "click" and out[20].live is True
    assert out[30].event_type == "view" and out[30].event_id == 6


def _snaps_df(spark, days):
    """(dt, month, file_bytes) commit-log frame from a list of dates."""
    rows = [
        (d, d.strftime("%Y-%m"), (i + 1) * 100)
        for i, d in enumerate(sorted(days))
    ]
    return spark.createDataFrame(rows, "dt date, month string, file_bytes long")


_PLANTED_DAYS = [
    datetime.date(2023, 1, 1),
    datetime.date(2023, 1, 15),
    datetime.date(2023, 1, 31),
    datetime.date(2023, 2, 10),
    datetime.date(2023, 2, 28),
    datetime.date(2023, 3, 5),
    datetime.date(2023, 3, 20),
]


def _expected_expiry(days, retain_last, max_age_days):
    """Pure-python replica of snapshot_expiry_classify's rules."""
    days = sorted(days)
    max_dt, min_dt = days[-1], days[0]
    desc = sorted(days, reverse=True)
    nth = desc[retain_last - 1] if retain_last <= len(desc) else min_dt
    keep_from = min(max_dt - datetime.timedelta(days=max_age_days), nth)
    max_month = max_dt.strftime("%Y-%m")
    last_in_month = {}
    for d in days:
        m = d.strftime("%Y-%m")
        last_in_month[m] = max(last_in_month.get(m, d), d)
    out = {}
    for d in days:
        m = d.strftime("%Y-%m")
        superseded = m < max_month
        out[d] = (
            d < keep_from,
            superseded,
            superseded and last_in_month[m] < keep_from,
        )
    return keep_from, out


def test_snapshot_expiry_planted_retain_last_binds(spark):
    """retain_last is a FLOOR: with retain_last=4 the age rule alone
    (max_age=10d) would expire 2023-02-10, but the 4th-newest snapshot IS
    02-10, so keep_from moves back and exactly 4 snapshots survive.
    February is superseded but NOT reclaimable (its last snapshot 02-28 is
    retained); January is fully reclaimable."""
    from spark_iceberg_jobs_spark.queries.maintenance import snapshot_expiry_classify

    got = {
        r.dt: (r.expired, r.superseded, r.reclaimable)
        for r in snapshot_expiry_classify(
            _snaps_df(spark, _PLANTED_DAYS), retain_last=4, max_age_days=10
        ).collect()
    }
    keep_from, want = _expected_expiry(_PLANTED_DAYS, 4, 10)
    assert keep_from == datetime.date(2023, 2, 10)  # retain-last, not age
    assert got == want
    assert sum(not e for e, _, _ in got.values()) == 4  # exactly retain_last kept
    feb = [got[d] for d in _PLANTED_DAYS if d.month == 2]
    assert all(s and not r for _, s, r in feb), "Feb superseded, not reclaimable"
    jan = [got[d] for d in _PLANTED_DAYS if d.month == 1]
    assert all(e and s and r for e, s, r in jan), "Jan expired + reclaimable"
    mar = [got[d] for d in _PLANTED_DAYS if d.month == 3]
    assert all(not s and not r for _, s, r in mar), "current month never superseded"


def test_snapshot_expiry_planted_age_binds_and_small_log(spark):
    """With a generous retain_last the age rule binds; and when the log is
    smaller than retain_last the nth-newest scalar is NULL and every
    snapshot is retained (the coalesce-to-min_dt path)."""
    from spark_iceberg_jobs_spark.queries.maintenance import snapshot_expiry_classify

    got = {
        r.dt: (r.expired, r.superseded, r.reclaimable)
        for r in snapshot_expiry_classify(
            _snaps_df(spark, _PLANTED_DAYS), retain_last=2, max_age_days=30
        ).collect()
    }
    keep_from, want = _expected_expiry(_PLANTED_DAYS, 2, 30)
    assert keep_from == datetime.date(2023, 2, 18)  # age rule (03-20 - 30d)
    assert got == want
    assert [d for d, (e, _, _) in sorted(got.items()) if e] == [
        datetime.date(2023, 1, 1),
        datetime.date(2023, 1, 15),
        datetime.date(2023, 1, 31),
        datetime.date(2023, 2, 10),
    ]
    # small-log path: retain_last exceeds the commit count -> keep all
    tiny = {
        r.dt: r.expired
        for r in snapshot_expiry_classify(
            _snaps_df(spark, _PLANTED_DAYS[:3]), retain_last=99, max_age_days=1
        ).collect()
    }
    assert not any(tiny.values()), "nth-newest NULL must retain everything"


def test_orphan_files_planted(spark):
    """Orphans are exactly the dailies whose EVERY covering snapshot the
    retention rule expires (post-expire_snapshots reachability): with
    retain_last=4 / max_age=10d, keep_from = 2023-02-10, so January's
    dailies are unpinned but February's stay referenced (Feb's last
    snapshot 02-28 survives). Monthlies and current-month dailies are
    always referenced; the grace gate (inclusive at the cutoff day) holds
    back young orphans."""
    from spark_iceberg_jobs_spark.queries.maintenance import orphan_files_classify

    cls = orphan_files_classify(
        _snaps_df(spark, _PLANTED_DAYS), grace_days=60, retain_last=4, max_age_days=10
    )
    rows = {r.path: r for r in cls.collect()}
    dailies = {p for p in rows if p.startswith("data/d-")}
    monthlies = {p for p in rows if p.startswith("data/m-")}
    assert monthlies == {"data/m-2023-01.parquet", "data/m-2023-02.parquet"}
    assert len(dailies) == len(_PLANTED_DAYS)
    # referenced: both monthlies, the retained-snapshot months' dailies,
    # and the current month's dailies
    assert all(not rows[p].orphan for p in monthlies)
    for dd in ("02-10", "02-28", "03-05", "03-20"):
        assert not rows[f"data/d-2023-{dd}.parquet"].orphan
    orphans = {p for p, r in rows.items() if r.orphan}
    assert orphans == {
        "data/d-2023-01-01.parquet",
        "data/d-2023-01-15.parquet",
        "data/d-2023-01-31.parquet",
    }
    # grace 60d from max 2023-03-20 -> cutoff 2023-01-19: 01-31 too young
    deletable = {p for p, r in rows.items() if r.deletable}
    assert deletable == orphans - {"data/d-2023-01-31.parquet"}
    # boundary is INCLUSIVE: grace 48d -> cutoff exactly 2023-01-31
    cls48 = orphan_files_classify(
        _snaps_df(spark, _PLANTED_DAYS), grace_days=48, retain_last=4, max_age_days=10
    )
    deletable48 = {r.path for r in cls48.collect() if r.deletable}
    assert deletable48 == orphans
    # monthly bytes = sum of that month's dailies
    jan_daily_bytes = sum(
        rows[f"data/d-2023-01-{dd:02d}.parquet"].file_bytes for dd in (1, 15, 31)
    )
    assert rows["data/m-2023-01.parquet"].file_bytes == jan_daily_bytes


def test_expiry_orphan_fixture_consistency(spark, sf_dir):
    """The two planners compose: remove_orphan_files runs after
    expire_snapshots, so on the shared commit-log model (same retention
    constants) the orphan set must EQUAL expiry's reclaimable set — the
    files whose every covering snapshot the retention rule expires —
    byte-for-byte, per year."""
    from spark_iceberg_jobs_spark.queries.maintenance import (
        maintenance_orphan_files,
        maintenance_snapshot_expiry,
    )

    exp = {r.part_year: r for r in maintenance_snapshot_expiry(spark, sf_dir).collect()}
    orp = {r.part_year: r for r in maintenance_orphan_files(spark, sf_dir).collect()}
    assert set(exp) == set(orp)
    for y in exp:
        assert orp[y].n_orphans == exp[y].n_files_reclaimable
        assert orp[y].orphan_bytes == exp[y].reclaim_bytes
        assert orp[y].n_deletable <= orp[y].n_orphans
        # every file the model lists is still pinned or already orphaned
        assert orp[y].n_orphans <= exp[y].n_files_superseded
        # listing = dailies + monthly rollups, so counts reconcile
        assert orp[y].n_listed >= exp[y].n_snapshots


def test_procedure_calls_render_and_link_to_planners(spark, sf_dir):
    """The CALL builders render Iceberg's documented procedure syntax
    from the SAME constants the planners use: expire_snapshots at the
    planners' keep_from, remove_orphan_files at the grace cutoff,
    binpack at the compaction target."""
    from spark_iceberg_jobs_spark.plans.procedures import maintenance_calls
    from spark_iceberg_jobs_spark.queries.maintenance import (
        _COMPACT_TARGET,
        _RETAIN_LAST,
        snapshot_expiry_classify,
        _daily_files,
    )

    calls = maintenance_calls(spark, sf_dir, table="bootcamp.orders")
    assert set(calls) == {
        "expire_snapshots",
        "remove_orphan_files",
        "rewrite_data_files",
        "rewrite_manifests",
    }
    # keep_from linkage: the rendered older_than equals the boundary the
    # expiry planner classifies against — the earliest RETAINED snapshot
    # is >= it and the latest EXPIRED one is < it
    cls = snapshot_expiry_classify(_daily_files(spark, sf_dir)).collect()
    retained_min = min(r.dt for r in cls if not r.expired)
    expired_max = max(r.dt for r in cls if r.expired)
    ts = calls["expire_snapshots"].split("TIMESTAMP '")[1].split("'")[0]
    keep_from = ts.split(" ")[0]
    assert str(expired_max) < keep_from <= str(retained_min)
    assert f"retain_last => {_RETAIN_LAST})" in calls["expire_snapshots"]
    assert calls["expire_snapshots"].startswith(
        "CALL spark_catalog.system.expire_snapshots(table => 'bootcamp.orders', "
    )
    assert "dry_run => true" in calls["remove_orphan_files"]
    assert (
        f"map('target-file-size-bytes', '{_COMPACT_TARGET}')"
        in calls["rewrite_data_files"]
    )
    assert "strategy => 'binpack'" in calls["rewrite_data_files"]
    assert calls["rewrite_manifests"] == (
        "CALL spark_catalog.system.rewrite_manifests(table => 'bootcamp.orders')"
    )


def test_procedure_call_guards():
    """Identifier/literal guards reject anything that is not a plain
    dotted name or a well-formed timestamp; the where clause escapes
    single quotes rather than trusting the caller."""
    import pytest

    from spark_iceberg_jobs_spark.plans.procedures import (
        expire_snapshots_call,
        remove_orphan_files_call,
        rewrite_data_files_call,
    )

    with pytest.raises(ValueError, match="identifier"):
        expire_snapshots_call(
            "db.t; DROP TABLE x", older_than="2024-01-01", retain_last=3
        )
    with pytest.raises(ValueError, match="identifier"):
        remove_orphan_files_call("db.t", older_than="2024-01-01", catalog="c'--")
    with pytest.raises(ValueError, match="timestamp"):
        expire_snapshots_call("db.t", older_than="not-a-date", retain_last=3)
    with pytest.raises(ValueError, match="retain_last"):
        expire_snapshots_call("db.t", older_than="2024-01-01", retain_last=0)
    with pytest.raises(ValueError, match="positive"):
        rewrite_data_files_call("db.t", target_file_size_bytes=0)
    got = rewrite_data_files_call(
        "db.t", target_file_size_bytes=512, where="year = '1995'"
    )
    assert "where => 'year = ''1995'''" in got


def test_procedure_execute_gates_loudly(spark):
    """Without the Iceberg runtime, execute_calls must raise up-front —
    never half-run a maintenance pass (mirrors execute_ddls). With a
    runtime present this test would need a real catalog target instead."""
    import pytest

    from spark_iceberg_jobs_spark.plans.procedures import execute_calls
    from spark_iceberg_jobs_spark.session import iceberg_available

    if iceberg_available(spark):
        pytest.skip("iceberg runtime present: execution path needs a real catalog")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        execute_calls(spark, {"noop": "CALL spark_catalog.system.rewrite_manifests(table => 'x')"})


def test_mor_equality_deletes_semantics(spark):
    """Iceberg v2 MOR read semantics on a planted snapshot: equality
    deletes drop EVERY matching base row (duplicate delete rows are
    idempotent, unknown keys are no-ops, extra delete-file columns are
    ignored), and appends — data files with a higher sequence number than
    the deletes — are served verbatim, so delete-then-reinsert
    resurrects the key."""
    from spark_iceberg_jobs_spark.operators.mor import mor_read_equality_deletes

    base = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "b", 20),
            (2, "b2", 21),  # same key twice: both must die
            (3, "c", 30),
            (4, "d", 40),
        ],
        "k int, payload string, v int",
    )
    deletes = spark.createDataFrame(
        [(2, "x"), (2, "x"), (4, "y"), (99, "z")],  # dup, and unknown 99
        "k int, junk string",
    )
    appends = spark.createDataFrame(
        [(4, "d-reborn", 41), (5, "e", 50)], "k int, payload string, v int"
    )
    got = sorted(
        tuple(r)
        for r in mor_read_equality_deletes(
            base, deletes, appends, key_cols=["k"]
        ).collect()
    )
    assert got == [
        (1, "a", 10),
        (3, "c", 30),
        (4, "d-reborn", 41),  # higher sequence number: delete cannot touch it
        (5, "e", 50),
    ]
    # no appends → just the anti join
    live = sorted(
        tuple(r)
        for r in mor_read_equality_deletes(base, deletes, key_cols=["k"]).collect()
    )
    assert live == [(1, "a", 10), (3, "c", 30)]


def test_mor_equality_deletes_multi_column_key(spark):
    """Multi-column equality deletes match on the full key tuple, not on
    any single column."""
    from spark_iceberg_jobs_spark.operators.mor import mor_read_equality_deletes

    base = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0), (2, "x", 3.0)], "a int, b string, v double"
    )
    deletes = spark.createDataFrame([(1, "x")], "a int, b string")
    got = sorted(
        tuple(r)
        for r in mor_read_equality_deletes(base, deletes, key_cols=["a", "b"]).collect()
    )
    assert got == [(1, "y", 2.0), (2, "x", 3.0)]


def test_mor_read_plan_is_broadcast_anti_join(spark, sf_dir):
    """The MOR read at fixture scale: base = orders, delete file = a
    derived key set, appends = corrected rows. The plan must be ONE
    broadcast left-anti hash join on the delete keys (delete files are
    small between compactions) plus the append union — no Cartesian, no
    nested loop."""
    from spark_iceberg_jobs_spark.operators.mor import mor_read_equality_deletes
    from spark_iceberg_jobs_spark.sources.readers import read_fixture

    orders = read_fixture(spark, sf_dir, "orders")
    deletes = orders.filter(F.col("o_orderkey") % 13 == 5).select("o_orderkey")
    appends = orders.filter(F.col("o_orderkey") % 26 == 5).withColumn(
        "o_orderpriority", F.lit("1-URGENT")
    )
    live = mor_read_equality_deletes(
        orders, deletes, appends, key_cols=["o_orderkey"]
    )
    agg = live.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # replay the MOR semantics row-exactly in plain python
    okeys = [r["o_orderkey"] for r in orders.select("o_orderkey").collect()]
    status = {
        r["o_orderkey"]: r["o_orderstatus"]
        for r in orders.select("o_orderkey", "o_orderstatus").collect()
    }
    from collections import Counter

    live_keys = [k for k in okeys if k % 13 != 5] + [k for k in okeys if k % 26 == 5]
    want_n = Counter(status[k] for k in live_keys)
    want_sum = Counter()
    for k in live_keys:
        want_sum[status[k]] += k
    got = {r["o_orderstatus"]: (r["n_orders"], r["key_sum"]) for r in agg.collect()}
    assert got == {s: (want_n[s], want_sum[s]) for s in want_n}


def test_mor_equality_deletes_null_safe_keys(spark):
    """Iceberg compares equality-delete values null-safely: a delete row
    with a null key column must delete the null-keyed base rows (a plain
    equi join is null-rejecting and would leave them undeletable), and a
    null-keyed base row survives when no null delete exists."""
    from spark_iceberg_jobs_spark.operators.mor import mor_read_equality_deletes

    base = spark.createDataFrame(
        [(1, "a"), (None, "null-1"), (None, "null-2"), (2, "b")],
        "k int, payload string",
    )
    with_null_delete = spark.createDataFrame([(None,), (2,)], "k int")
    got = sorted(
        [
            (r["k"], r["payload"])
            for r in mor_read_equality_deletes(
                base, with_null_delete, key_cols=["k"]
            ).collect()
        ],
        key=repr,
    )
    assert got == [(1, "a")]
    without_null_delete = spark.createDataFrame([(2,)], "k int")
    kept = sorted(
        [
            (r["k"], r["payload"])
            for r in mor_read_equality_deletes(
                base, without_null_delete, key_cols=["k"]
            ).collect()
        ],
        key=repr,
    )
    assert kept == [(1, "a"), (None, "null-1"), (None, "null-2")]


def test_mor_equality_deletes_dotted_key_column(spark):
    """ADVICE r7: key columns whose NAMES contain dots (or backticks) must
    resolve as literal names, not nested-field paths — the old
    F.col("alias.name") interpolation misparsed them."""
    from spark_iceberg_jobs_spark.operators.mor import mor_read_equality_deletes

    base = spark.createDataFrame([(1, "a"), (2, "b")], ["the.key", "payload"])
    deletes = spark.createDataFrame([(2,)], ["the.key"])
    got = [
        tuple(r)
        for r in mor_read_equality_deletes(
            base, deletes, key_cols=["the.key"]
        ).collect()
    ]
    assert got == [(1, "a")]


def test_procedure_guards_reject_trailing_newline():
    """ADVICE r7: $-anchored regexes match before a trailing newline, so
    'tbl\\n' validated and the newline landed inside the rendered CALL
    text. fullmatch closes that."""
    import pytest

    from spark_iceberg_jobs_spark.plans.procedures import expire_snapshots_call

    with pytest.raises(ValueError, match="identifier"):
        expire_snapshots_call("db.t\n", older_than="2024-01-01", retain_last=3)
    with pytest.raises(ValueError, match="timestamp"):
        expire_snapshots_call("db.t", older_than="2024-01-01\n", retain_last=3)


def test_time_travel_planted_commit_log(spark, monkeypatch):
    """Hand-computable SPARSE commit log for maintenance_time_travel,
    asof = max(dt) - 200 = 2024-06-03. The load-bearing case (review
    finding, round 8): May's compacting commit is June 15 — AFTER the
    as-of snapshot — so at as-of May must serve its TWO daily files, not
    a compacted one (supersession follows commits, not calendar
    position). Jan/Mar are compacted at as-of (a later-month commit
    precedes it), June's daily postdates the snapshot, Dec doesn't exist
    yet. Now: Jan/Mar/May/Jun compacted, Dec serves its two dailies."""
    import datetime

    import spark_iceberg_jobs_spark.queries.maintenance as m

    days = {
        datetime.date(2024, 1, 5): 2,
        datetime.date(2024, 1, 20): 1,
        datetime.date(2024, 3, 10): 1,
        datetime.date(2024, 5, 1): 1,
        datetime.date(2024, 5, 2): 1,
        datetime.date(2024, 6, 15): 3,
        datetime.date(2024, 12, 1): 1,
        datetime.date(2024, 12, 20): 1,
    }
    rows = [(d,) for d, n in days.items() for _ in range(n)]
    orders = spark.createDataFrame(rows, "o_orderdate date")
    monkeypatch.setattr(m, "read_fixture", lambda s, sf, t: orders)
    got = [tuple(r) for r in m.maintenance_time_travel(spark, "x").collect()]
    # asof: Jan compacted (384B, sup=Mar-10) + Mar compacted (128B,
    # sup=May-01) + May's 2 dailies (256B, sup=Jun-15 > asof) = 4 files
    # now: Jan+Mar+May+Jun compacted (4) + Dec's 2 dailies = 6 files
    assert got == [(2024, 4, 768, 6, 1408)]


# ---------------------------------------------------------------------------
# Round-9 adversarial-fixture program (VERDICT r8 item 3): each planted
# test names the plausible WRONG rule it kills, so a replay oracle that
# hash-pins shared arithmetic can never green that rule silently.
# ---------------------------------------------------------------------------


def test_incremental_scan_skips_rewrites_inside_range(spark):
    """CDF semantics on a sparse log: the range (2024-01-31, 2024-02-28]
    contains the 2024-02-03 commit, which appends its own 70-byte daily
    AND performs January's compaction (sup_dt(Jan) = 2024-02-03). The
    incremental append scan must emit ONLY the daily; the 150-byte
    January monthly rewrite is reported by rewrites_in_range, never
    added. WRONG RULE KILLED: "emit every file written by commits in the
    range" — it would re-emit the 150-byte rewrite (bytes_added 220),
    double-counting rows that already existed at the range start."""
    from spark_iceberg_jobs_spark.queries.maintenance import (
        incremental_append_scan,
        rewrites_in_range,
    )

    daily = _snaps_df(
        spark,
        [
            datetime.date(2024, 1, 5),
            datetime.date(2024, 1, 20),
            datetime.date(2024, 2, 3),
            datetime.date(2024, 3, 10),
        ],
    )
    bounds = spark.createDataFrame(
        [(datetime.date(2024, 1, 31), datetime.date(2024, 2, 28))],
        "lo_dt date, hi_dt date",
    )
    adds = [tuple(r) for r in incremental_append_scan(daily, bounds).collect()]
    assert adds == [(datetime.date(2024, 2, 3), "2024-02", 300)]
    rews = [tuple(r) for r in rewrites_in_range(daily, bounds).collect()]
    # January's two dailies (100 + 200 planted bytes) fold into one
    # skipped rewrite performed by the in-range 2024-02-03 commit
    assert rews == [("2024-01", 300, datetime.date(2024, 2, 3))]
    # range ending before the compaction commit: nothing is rewritten yet
    early = spark.createDataFrame(
        [(datetime.date(2024, 1, 1), datetime.date(2024, 1, 31))],
        "lo_dt date, hi_dt date",
    )
    assert rewrites_in_range(daily, early).count() == 0
    assert incremental_append_scan(daily, early).count() == 2


def test_mv_merge_partials_union_not_join(spark):
    """A month present ONLY in the delta must appear, a base-only month
    must pass through, and a month BOTH touch must sum. WRONG RULES
    KILLED: join-shaped merge (drops base-only 2023-10 or delta-only
    2024-01) and delta-overwrites-base (loses 2023-12's base partial)."""
    from decimal import Decimal

    from spark_iceberg_jobs_spark.queries.maintenance import merge_mv_partials

    schema = "order_month string, n_orders long, rev_dec decimal(18,2)"
    base = spark.createDataFrame(
        [("2023-10", 2, Decimal("3.00")), ("2023-12", 1, Decimal("32.00"))], schema
    )
    delta = spark.createDataFrame(
        [("2023-12", 1, Decimal("64.00")), ("2024-01", 1, Decimal("4.00"))], schema
    )
    got = {
        r.order_month: (r.n_orders, r.rev_merged)
        for r in merge_mv_partials(base, delta).collect()
    }
    assert got == {
        "2023-10": (2, Decimal("3.00")),
        "2023-12": (2, Decimal("96.00")),
        "2024-01": (1, Decimal("4.00")),
    }


def test_mv_refresh_delta_derived_from_snapshot_range(spark, tmp_path):
    """End-to-end on a planted log: the delta batch is DERIVED from the
    incremental scan of (max_dt - 90d, max_dt] — 2023-12 straddles the
    snapshot (12-01 in base, 12-25 in delta) and 2024-01..03 exist ONLY
    in the delta. The merged MV must equal the full recompute. WRONG
    RULES KILLED: a merge that drops either side's exclusive months, and
    a delta that re-reads rewritten (compacted) files — the delta read
    consumes exactly the scan's appended-file list. The planted log is a
    real parquet fixture dir (r10: the base partials run the full
    artifact lifecycle, which fingerprints the source files on disk)."""
    import spark_iceberg_jobs_spark.queries.maintenance as m

    rows = [
        (datetime.datetime(2023, 10, 1), 1.00),
        (datetime.datetime(2023, 10, 15), 2.00),
        (datetime.datetime(2023, 12, 1), 32.00),   # base side of the straddle
        (datetime.datetime(2023, 12, 25), 64.00),  # delta side (within 90d)
        (datetime.datetime(2024, 1, 1), 4.00),
        (datetime.datetime(2024, 2, 20), 8.00),
        (datetime.datetime(2024, 3, 5), 16.00),    # max_dt -> lo_dt = 2023-12-06
    ]
    orders = spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")
    orders.coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))
    want = [
        ("2023-10", 2, 3.0),
        ("2023-12", 2, 96.0),
        ("2024-01", 1, 4.0),
        ("2024-02", 1, 8.0),
        ("2024-03", 1, 16.0),
    ]
    # run TWICE: cold (builds + publishes the base-partials artifact) and
    # warm (serves the stored partials) must agree exactly
    for _ in range(2):
        got = [tuple(r) for r in m.mv_incremental_refresh(spark, str(tmp_path)).collect()]
        assert got == want


def test_mv_base_partials_artifact_and_pruned_warm_refresh(spark):
    """VERDICT r9 item 1 (the one measured data-grain scale tail): the
    warm refresh must serve the base partials from the PUBLISHED
    artifact and scan ZERO pre-snapshot orders rows. Plan pins on the
    warm run's executed plan:

    - a scan over the mv_base_ artifact appears (the stored partials);
    - the ONLY orders scan that reads fact payload (o_totalprice) caps
      its read at the snapshot boundary via a pushed-down
      ``o_orderdate >=`` literal — pre-snapshot rows never leave parquet;
    - the remaining orders scans are the commit-log model's day-grain
      metadata walk: single-column (o_orderdate only), never payload.
    """
    import spark_iceberg_jobs_spark.queries.maintenance as m

    sf = "/root/testdata/sf0.001"
    m.mv_incremental_refresh(spark, sf).collect()  # cold: build + publish
    warm = m.mv_incremental_refresh(spark, sf)
    warm.collect()
    plan = warm._jdf.queryExecution().executedPlan().toString()

    assert "/tmp/mv_base_" in plan, "warm refresh must read the published partials"
    fact_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln
        and "orders.parquet" in ln
        and "o_totalprice" in ln.split("FileScan parquet", 1)[1].split("]", 1)[0]
    ]
    assert fact_scans, "the delta read must scan the orders fact"
    for ln in fact_scans:
        assert "o_orderdate#" in ln and ">=" in ln, (
            f"fact scan missing the pushed snapshot-boundary filter: {ln[:200]}"
        )
    meta_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln
        and "orders.parquet" in ln
        and ln not in fact_scans
    ]
    for ln in meta_scans:
        cols = ln.split("FileScan parquet", 1)[1].split("]", 1)[0]
        assert "o_totalprice" not in cols and "o_custkey" not in cols, (
            f"metadata walk must stay single-column: {ln[:200]}"
        )


def test_scd2_two_changes_in_same_timestamp(spark, monkeypatch):
    """Two changes of one key in the SAME timestamp must order by
    event_id: version 'a' (id 1) closes at its own open instant (dwell
    0), 'b' (id 2) closes 10s later, 'c' stays current. WRONG RULE
    KILLED: ordering the lead() window by ts alone — with a tie it may
    close either version against the other, flipping the 10s dwell
    between 'a' and 'b' run to run (nondeterministic history)."""
    import spark_iceberg_jobs_spark.queries.maintenance as m

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    ev = spark.createDataFrame(
        [
            (1, t0, 7, "a"),
            (2, t0, 7, "b"),
            (3, t0 + datetime.timedelta(seconds=10), 7, "c"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    monkeypatch.setattr(m, "read_fixture", lambda s, sf, t: ev)
    got = {r.event_type: tuple(r)[1:] for r in m.cdc_scd2_history(spark, "x").collect()}
    assert got == {
        "a": (1, 0, 0),
        "b": (1, 0, 10_000_000),
        "c": (1, 1, 0),
    }


def test_expiry_boundary_commit_at_keep_from_survives(spark):
    """A commit EXACTLY at the retention cutoff survives: keep_from =
    max(2023-03-01) - 50d = 2023-01-10, which is itself a commit —
    expire_snapshots keeps snapshots at/after the cutoff. WRONG RULE
    KILLED: ``dt <= keep_from`` (expiring the boundary commit), which on
    the dense fixture is indistinguishable because no commit lands
    exactly on the cutoff."""
    from spark_iceberg_jobs_spark.queries.maintenance import snapshot_expiry_classify

    days = [
        datetime.date(2023, 1, 1),
        datetime.date(2023, 1, 10),
        datetime.date(2023, 3, 1),
    ]
    got = {
        r.dt: r.expired
        for r in snapshot_expiry_classify(
            _snaps_df(spark, days), retain_last=1, max_age_days=50
        ).collect()
    }
    assert got == {
        datetime.date(2023, 1, 1): True,
        datetime.date(2023, 1, 10): False,  # boundary commit survives
        datetime.date(2023, 3, 1): False,
    }


def test_orphan_month_closing_exactly_at_keep_from_stays_referenced(spark):
    """A superseded month whose LAST snapshot sits exactly at keep_from
    (2023-01-10 with retain_last=1 / max_age=50) keeps every daily
    referenced — its covering snapshot survives expiry. WRONG RULES
    KILLED: "superseded implies orphan" (January and February are both
    superseded, yet nothing is orphaned) and a strict
    ``month_last_dt > keep_from`` reference rule (which would orphan
    January's dailies)."""
    from spark_iceberg_jobs_spark.queries.maintenance import orphan_files_classify

    days = [
        datetime.date(2023, 1, 5),
        datetime.date(2023, 1, 10),
        datetime.date(2023, 2, 20),
        datetime.date(2023, 3, 1),
    ]
    cls = orphan_files_classify(
        _snaps_df(spark, days), grace_days=0, retain_last=1, max_age_days=50
    )
    rows = {r.path: r for r in cls.collect()}
    assert {p for p in rows if p.startswith("data/m-")} == {
        "data/m-2023-01.parquet",
        "data/m-2023-02.parquet",
    }, "Jan and Feb are superseded (compacted) months"
    assert not any(r.orphan for r in rows.values())


def test_mor_delete_sequence_tie_spares_same_commit_data(spark):
    """Iceberg v2 sequence rule: an equality delete applies to data files
    with sequence number STRICTLY LESS than its own — a data file whose
    sequence TIES the delete's was written by the same commit (the
    single-commit MERGE upsert: delete old row + write replacement under
    one sequence number) and must survive. WRONG RULE KILLED: ``<=``,
    which deletes the replacement row of exactly that commit."""
    from spark_iceberg_jobs_spark.operators.mor import mor_apply_deletes_by_sequence

    data = spark.createDataFrame(
        [
            (1, "old-1", 1),
            (2, "old-2", 1),
            (2, "replacement-2", 2),  # same commit as the delete (tie)
            (3, "newer-3", 3),
        ],
        "k int, payload string, seq int",
    )
    deletes = spark.createDataFrame([(2,), (3,)], "k int")
    got = sorted(
        (r.k, r.payload)
        for r in mor_apply_deletes_by_sequence(
            data, deletes, key_cols=["k"], seq_col="seq", delete_seq=2
        ).collect()
    )
    assert got == [
        (1, "old-1"),            # seq 1 < 2, key not deleted
        (2, "replacement-2"),    # tie: same-commit replacement survives
        (3, "newer-3"),          # seq 3 > 2: delete cannot reach forward
    ]


def test_rollback_restores_dailies_of_late_compacted_month(spark):
    """rollback_to_snapshot(R) on a sparse log where R = 2024-02-10 falls
    BETWEEN February's last daily (02-03) and the commit that compacts
    February (March 10): rollback must remove Feb's monthly rewrite and
    RESTORE its daily — at R the compaction had not happened yet, even
    though February is calendar-complete before R. WRONG RULE KILLED:
    calendar-position supersession ("months before R's month were already
    compacted at R"), the exact bug class the r8 time-travel review
    caught — it would report Feb as unchanged. Jan (compacted 02-03 <= R)
    really is unchanged; March's post-R daily is removed."""
    import datetime as dt

    from spark_iceberg_jobs_spark.queries.maintenance import rollback_classify

    daily = _snaps_df(
        spark,
        [
            dt.date(2024, 1, 5),
            dt.date(2024, 1, 20),
            dt.date(2024, 2, 3),
            dt.date(2024, 3, 10),
        ],
    )
    bounds = spark.createDataFrame([(dt.date(2024, 2, 10),)], "rb_dt date")
    got = {
        r.month: (r.n_removed, r.bytes_removed, r.n_restored, r.bytes_restored)
        for r in rollback_classify(daily, bounds).collect()
    }
    assert got == {
        "2024-01": (0, 0, 0, 0),      # compacted before R: same file both sides
        "2024-02": (1, 300, 1, 300),  # monthly removed, pre-R daily restored
        "2024-03": (1, 400, 0, 0),    # post-R daily unreferenced
    }


def test_changelog_diff_planted_insert_update_delete(spark, monkeypatch):
    """Row-level CDF semantics on a planted changelog (cutoff = max ts -
    7d = 2024-01-23): update keeps the POST state, delete reports the
    PRE state, tombstone-then-reinsert is an INSERT (not an update), and
    keys unchanged since A — or dead at both snapshots — emit nothing.
    WRONG RULES KILLED: an inner-join diff (drops user 3, which has no A
    state), and treating any key present at both snapshots as an update
    regardless of event identity (would emit user 5)."""
    import datetime as dt

    import spark_iceberg_jobs_spark.queries.maintenance as m

    t = dt.datetime
    ev = spark.createDataFrame(
        [
            # user 1: update (pre purchase -> post click)
            (1, t(2024, 1, 10), 1, "purchase", 5.0),
            (2, t(2024, 1, 28), 1, "click", 1.0),
            # user 2: delete (pre view -> post tombstone)
            (3, t(2024, 1, 11), 2, "view", 2.0),
            (4, t(2024, 1, 29), 2, "error", None),
            # user 3: insert (no pre state)
            (5, t(2024, 1, 29), 3, "purchase", 7.0),
            # user 4: insert via resurrection (pre tombstone -> post purchase)
            (6, t(2024, 1, 12), 4, "error", None),
            (7, t(2024, 1, 30), 4, "purchase", 3.0),
            # user 5: unchanged (same last event at both snapshots)
            (8, t(2024, 1, 13), 5, "purchase", 4.0),
            # user 6: dead at both snapshots -> nothing
            (9, t(2024, 1, 14), 6, "error", None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    monkeypatch.setattr(m, "read_fixture", lambda s, sf, t_: ev)
    got = {
        (r.change_type, r.last_event_type): (r.n_keys, r.total_value)
        for r in m.cdc_changelog_diff(spark, "x").collect()
    }
    assert got == {
        ("insert", "purchase"): (2, 10.0),
        ("update", "click"): (1, 1.0),
        ("delete", "view"): (1, 2.0),
    }


def test_partition_evolution_old_spec_prunes_at_month_grain(spark):
    """Files written before the spec evolution keep the OLD (month) spec:
    a spec-0 file whose day is OUTSIDE the probe but whose month overlaps
    it MUST scan (its month partition can hold in-probe rows — it is the
    false positive the evolution exists to remove). WRONG RULE KILLED:
    pruning old files by exact day as if they carried the new spec —
    it would skip the 2024-02-10 file. Spec-1 files prune exactly."""
    import datetime as dt

    from spark_iceberg_jobs_spark.queries.maintenance import (
        partition_evolution_classify,
    )

    daily = _snaps_df(
        spark,
        [
            dt.date(2024, 1, 10),  # spec 0, month disjoint from probe -> skip
            dt.date(2024, 2, 10),  # spec 0, month overlaps, day outside -> FP scan
            dt.date(2024, 2, 25),  # spec 1, in probe -> exact scan
            dt.date(2024, 3, 10),  # spec 1, outside -> skip
        ],
    )
    bounds = spark.createDataFrame(
        [(dt.date(2024, 2, 15), dt.date(2024, 2, 20), dt.date(2024, 3, 5))],
        "evo_dt date, probe_lo date, probe_hi date",
    )
    got = {
        (r.spec, r.dt): (r.scanned, r.false_positive)
        for r in partition_evolution_classify(daily, bounds).collect()
    }
    assert got == {
        (0, dt.date(2024, 1, 10)): (False, False),
        (0, dt.date(2024, 2, 10)): (True, True),  # the load-bearing case
        (1, dt.date(2024, 2, 25)): (True, False),
        (1, dt.date(2024, 3, 10)): (False, False),
    }


def test_delete_plan_observed_bounds_not_calendar_and_daily_atomicity(spark):
    """Planted commit log for the DELETE classifier (r10). WRONG RULES
    KILLED: (a) classifying the monthly rewrite file by its CALENDAR
    month end instead of its OBSERVED last day — 2024-01's data ends
    Jan 8, so a Jan 20 cutoff fully covers the file (metadata drop); the
    calendar rule (last_day(Jan)=Jan 31 > Jan 20) would misclassify it
    as a rewrite; (b) rewriting DAILY files the cutoff splits mid-month
    — dailies are atomic at day grain (drop or keep, never rewrite).

    Log: Dec/Jan/Feb compacted (monthly files; sup_dt = first commit of
    a later month), Mar never compacted (dailies live)."""
    import spark_iceberg_jobs_spark.queries.maintenance as m

    days = [
        ("2023-12-05", 10), ("2023-12-28", 20),
        ("2024-01-05", 1), ("2024-01-08", 2),      # sparse: ends Jan 8
        ("2024-02-01", 4), ("2024-02-20", 8),
        ("2024-03-01", 16), ("2024-03-10", 32), ("2024-03-30", 64),
    ]
    daily = spark.createDataFrame(
        [
            (datetime.date.fromisoformat(d), d[:7], n * 128)
            for d, n in days
        ],
        "dt date, month string, file_bytes long",
    )

    def classify(cutoff):
        bounds = spark.createDataFrame(
            [(datetime.date.fromisoformat(cutoff),)], "del_dt date"
        )
        return {
            r.month: (
                r.n_dropped, r.bytes_dropped, r.n_rewritten,
                r.rows_deleted, r.rows_kept, r.n_untouched,
            )
            for r in m.delete_plan_classify(daily, bounds).collect()
        }

    # cutoff INSIDE January, after its last observed day: the kill case —
    # Jan's monthly file is a METADATA DROP, never a rewrite
    got = classify("2024-01-20")
    assert got == {
        "2023-12": (1, 3840, 0, 0, 0, 0),
        "2024-01": (1, 384, 0, 0, 0, 0),   # calendar rule would rewrite
        "2024-02": (0, 0, 0, 0, 0, 1),
        "2024-03": (0, 0, 0, 0, 0, 3),
    }

    # cutoff straddling February's observed span: exactly one rewrite,
    # with exact deleted/kept row counts
    got = classify("2024-02-10")
    assert got == {
        "2023-12": (1, 3840, 0, 0, 0, 0),
        "2024-01": (1, 384, 0, 0, 0, 0),
        "2024-02": (0, 0, 1, 4, 8, 0),
        "2024-03": (0, 0, 0, 0, 0, 3),
    }

    # cutoff splitting the UNCOMPACTED month: dailies drop atomically,
    # zero rewrites (kill case b)
    got = classify("2024-03-15")
    assert got == {
        "2023-12": (1, 3840, 0, 0, 0, 0),
        "2024-01": (1, 384, 0, 0, 0, 0),
        "2024-02": (1, 1536, 0, 0, 0, 0),
        "2024-03": (2, 6144, 0, 0, 0, 1),
    }


def test_r10_procedure_renderers_guard_and_text():
    import pytest as _pytest

    from spark_iceberg_jobs_spark.plans.procedures import (
        fast_forward_call,
        rewrite_position_delete_files_call,
        rollback_to_snapshot_call,
    )

    assert rewrite_position_delete_files_call("db.t") == (
        "CALL spark_catalog.system.rewrite_position_delete_files(table => 'db.t')"
    )
    assert rollback_to_snapshot_call("db.t", 42) == (
        "CALL spark_catalog.system.rollback_to_snapshot(table => 'db.t', "
        "snapshot_id => 42)"
    )
    assert fast_forward_call("db.t", "audit") == (
        "CALL spark_catalog.system.fast_forward(table => 'db.t', "
        "branch => 'main', to => 'audit')"
    )
    with _pytest.raises(ValueError):
        rollback_to_snapshot_call("db.t", -1)
    with _pytest.raises(ValueError):
        fast_forward_call("db.t", "bad branch;drop")
