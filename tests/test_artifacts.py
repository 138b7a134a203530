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


def test_publish_atomic_recovers_wedged_unpublished_dir(tmp_path):
    """Review finding (r7): a half-deleted final dir without _OK must not
    wedge the key forever — publish removes the corpse and retries."""
    final = tmp_path / "idx"
    final.mkdir()
    (final / "leftover-part.parquet").write_bytes(b"x")  # corpse, no _OK
    s = tmp_path / "idx.staging.1"
    s.mkdir()
    (s / "_OK").touch()
    (s / "data").write_bytes(b"y")
    artifacts.publish_atomic(str(s), str(final))
    assert artifacts.is_published(str(final))
    assert (final / "data").exists()
    assert not (final / "leftover-part.parquet").exists()


def test_sweep_spares_kept_keys(monkeypatch, tmp_path):
    """Review finding (r7): the CURRENT fingerprint's artifact survives
    the TTL sweep even when old by mtime."""
    monkeypatch.setattr(artifacts, "ARTIFACT_ROOT", str(tmp_path))
    cur = tmp_path / "kidx_current"
    cur.mkdir()
    old_ts = time.time() - 48 * 3600
    os.utime(cur, (old_ts, old_ts))
    stale = tmp_path / "kidx_stale"
    stale.mkdir()
    os.utime(stale, (old_ts, old_ts))
    removed = artifacts.sweep_stale("kidx_", ttl_hours=12, keep={"kidx_current"})
    assert removed == 1
    assert cur.exists() and not stale.exists()


def test_fingerprint_subsecond_rewrite_flips_key(tmp_path):
    """Review finding (r7): ns-resolution mtimes — a same-size rewrite
    within one second must change the key."""
    f = tmp_path / "t.parquet"
    f.write_bytes(b"abcd")
    os.utime(f, ns=(1_000_000_000_000_000_000, 1_700_000_000_123_000_000))
    k1 = artifacts.content_fingerprint(str(f))
    os.utime(f, ns=(1_000_000_000_000_000_000, 1_700_000_000_456_000_000))
    k2 = artifacts.content_fingerprint(str(f))
    assert k1 != k2
