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
