"""functions/artifacts.py — the persisted-index lifecycle (round 7)."""

from __future__ import annotations

import os
import time

from spark_iceberg_jobs_spark.functions import artifacts


def test_content_fingerprint_covers_directory_parts(tmp_path):
    """The r6 ADVICE gap: a directory-layout parquet must change key when
    ANY part file changes — os.stat of the dir inode catches neither."""
    d = tmp_path / "table.parquet"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"aaaa")
    (d / "part-1.parquet").write_bytes(b"bbbb")
    k1 = artifacts.content_fingerprint(str(d), salt="v2")
    (d / "part-1.parquet").write_bytes(b"bbbbcc")  # size change
    k2 = artifacts.content_fingerprint(str(d), salt="v2")
    assert k1 != k2
    (d / "part-2.parquet").write_bytes(b"dd")  # part addition
    k3 = artifacts.content_fingerprint(str(d), salt="v2")
    assert k3 not in (k1, k2)
    # salt versions the FORMAT
    assert artifacts.content_fingerprint(str(d), salt="v3") != k3
    # single-file sources keep working
    f = tmp_path / "single.parquet"
    f.write_bytes(b"zz")
    assert len(artifacts.content_fingerprint(str(f))) == 12


def test_fingerprint_walk_order_independent(tmp_path):
    d = tmp_path / "t"
    sub = d / "bucket=1"
    sub.mkdir(parents=True)
    (d / "a").write_bytes(b"1")
    (sub / "b").write_bytes(b"2")
    assert artifacts.content_fingerprint(str(d)) == artifacts.content_fingerprint(str(d))


def test_sweep_removes_expired_and_orphaned_staging(monkeypatch, tmp_path):
    monkeypatch.setattr(artifacts, "ARTIFACT_ROOT", str(tmp_path))
    old = tmp_path / "testidx_old"
    old.mkdir()
    os.utime(old, (time.time() - 48 * 3600, time.time() - 48 * 3600))
    fresh = tmp_path / "testidx_fresh"
    fresh.mkdir()
    # staging dir owned by a pid that cannot exist
    orphan = tmp_path / "testidx_x.staging.99999999"
    orphan.mkdir()
    # staging dir owned by THIS live process: must survive
    ours = tmp_path / f"testidx_y.staging.{os.getpid()}"
    ours.mkdir()
    removed = artifacts.sweep_stale("testidx_", ttl_hours=12)
    assert removed == 2
    assert not old.exists() and not orphan.exists()
    assert fresh.exists() and ours.exists()


def test_publish_atomic_loser_discards(tmp_path):
    final = tmp_path / "idx"
    s1 = tmp_path / "idx.staging.1"
    s2 = tmp_path / "idx.staging.2"
    s1.mkdir()
    (s1 / "_OK").touch()
    s2.mkdir()
    (s2 / "_OK").touch()
    artifacts.publish_atomic(str(s1), str(final))
    assert artifacts.is_published(str(final))
    artifacts.publish_atomic(str(s2), str(final))  # loser
    assert artifacts.is_published(str(final))
    assert not s2.exists()
