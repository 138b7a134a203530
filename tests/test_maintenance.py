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
