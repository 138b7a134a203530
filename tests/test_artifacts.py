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


def test_sweep_spares_recently_served_artifact(monkeypatch, tmp_path):
    """ADVICE r7 / VERDICT r7 item 5: every warm serve refreshes the
    artifact DIR's mtime (touch_served, called inside
    ensure_published_version), so a continuously-served artifact never
    ages past the TTL and cannot be evicted under a live reader even by a
    sweep whose keep set names a DIFFERENT key. The _OK marker's mtime —
    the published-instance identity — must stay untouched by the serve."""
    monkeypatch.setattr(artifacts, "ARTIFACT_ROOT", str(tmp_path))
    served = tmp_path / "kidx_served"
    served.mkdir()
    (served / "_OK").touch()
    old_ts = time.time() - 48 * 3600
    os.utime(served / "_OK", (old_ts, old_ts))
    os.utime(served, (old_ts, old_ts))
    ok_ver_before = os.stat(served / "_OK").st_mtime_ns

    v = artifacts.ensure_published_version(
        str(served), lambda: (_ for _ in ()).throw(AssertionError("no rebuild"))
    )
    assert v == ok_ver_before, "serve must not disturb the instance identity"
    assert os.stat(served / "_OK").st_mtime_ns == ok_ver_before
    # another corpus's sweep (keep names only its own key) now spares it
    removed = artifacts.sweep_stale("kidx_", ttl_hours=12, keep={"kidx_other"})
    assert removed == 0 and served.exists()


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


def test_ensure_published_version_builds_then_stamps(tmp_path):
    """Absent artifact → build runs exactly once and the instance version
    (the _OK marker's mtime_ns) comes back; present artifact → build is
    not called again and the version is stable."""
    final = tmp_path / "seg_a"
    calls = []

    def build():
        calls.append(1)
        final.mkdir()
        (final / "_OK").touch()

    v1 = artifacts.ensure_published_version(str(final), build)
    v2 = artifacts.ensure_published_version(str(final), build)
    assert calls == [1] and v1 == v2 == os.stat(final / "_OK").st_mtime_ns


def test_ensure_published_version_retries_swept_artifact(monkeypatch, tmp_path):
    """Review finding (late r7): a concurrent process's TTL sweep can
    delete the artifact between the existence check and the stat; one
    rebuild round must restore it instead of crashing the serve."""
    final = tmp_path / "seg_b"

    def build():
        final.mkdir(exist_ok=True)
        (final / "_OK").touch()

    build()
    real = artifacts.published_version
    raised = []

    def flaky(d):
        if not raised:
            raised.append(1)
            # simulate the sweep landing between is_published and the stat
            (final / "_OK").unlink()
            final.rmdir()
            return real(d)  # raises FileNotFoundError (an OSError)
        return real(d)

    monkeypatch.setattr(artifacts, "published_version", flaky)
    v = artifacts.ensure_published_version(str(final), build)
    assert v == os.stat(final / "_OK").st_mtime_ns


def test_meta_cache_bounds_and_drops_foreign_session_scans(tmp_path):
    """The serving cache is LRU-bounded at EXACTLY max_entries (review
    finding: evict-before-insert held one extra and thrashed the oldest
    key's own payload), the accessed key can never evict itself, and
    reader tuples bound to a session other than the live one are dropped
    eagerly while plain-data payloads survive."""
    sess_a, sess_b = object(), object()
    cache: dict[str, dict] = {}
    m1 = artifacts.meta_cache(cache, "k1", sess_a, max_entries=2)
    m1["stats"] = (1, 2)
    m1["scans"] = (sess_a, (7,), "reader")
    # same session: scans survive, same entry object returned
    assert artifacts.meta_cache(cache, "k1", sess_a, max_entries=2) is m1
    assert "scans" in m1
    # another session: k1's reader tuple is dropped, plain data stays
    artifacts.meta_cache(cache, "k2", sess_b, max_entries=2)
    assert "scans" not in m1 and m1["stats"] == (1, 2)
    # LRU: re-accessing k1 refreshes it, so k2 (now oldest) is evicted
    assert artifacts.meta_cache(cache, "k1", sess_b, max_entries=2) is m1
    artifacts.meta_cache(cache, "k3", sess_b, max_entries=2)
    assert set(cache) == {"k1", "k3"} and len(cache) == 2
    # the hot key keeps its payload through repeated access at the bound
    assert artifacts.meta_cache(cache, "k1", sess_b, max_entries=2)["stats"] == (1, 2)


def test_cached_readers_rebuild_on_session_or_version(tmp_path):
    """Readers rebuild exactly when the session or the artifact instance
    changes — otherwise the resolved tuple is served from the cache."""
    sess_a, sess_b = object(), object()
    builds = []

    def build():
        builds.append(1)
        return (f"reader{len(builds)}",)

    meta: dict = {}
    (r1,) = artifacts.cached_readers(meta, sess_a, (1, 1), build)
    (r2,) = artifacts.cached_readers(meta, sess_a, (1, 1), build)
    assert r1 == r2 == "reader1" and len(builds) == 1
    (r3,) = artifacts.cached_readers(meta, sess_a, (1, 2), build)  # rebuild
    assert r3 == "reader2"
    (r4,) = artifacts.cached_readers(meta, sess_b, (1, 2), build)  # rebuild
    assert r4 == "reader3" and len(builds) == 3


def test_multi_path_fingerprint_disambiguates_sources(tmp_path):
    """Review finding (r8): entries are tagged with their source index,
    so swapping file metadata BETWEEN sources must change the key."""
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    (a / "x").write_bytes(b"1234567890")
    (b / "x").write_bytes(b"12345678901234567890")
    ts = (1_000_000_000_000_000_000, 1_700_000_000_000_000_000)
    for f in (a / "x", b / "x"):
        os.utime(f, ns=ts)
    k1 = artifacts.content_fingerprint(str(a), str(b))
    # swap the sizes between sources
    (a / "x").write_bytes(b"12345678901234567890")
    (b / "x").write_bytes(b"1234567890")
    for f in (a / "x", b / "x"):
        os.utime(f, ns=ts)
    k2 = artifacts.content_fingerprint(str(a), str(b))
    assert k1 != k2


def test_content_fingerprints_single_walk_matches_per_salt(tmp_path):
    """The multi-salt helper must produce exactly the per-salt keys."""
    f = tmp_path / "t.parquet"
    f.write_bytes(b"abc")
    multi = artifacts.content_fingerprints(str(f), salts=("s1", "s2"))
    assert multi["s1"] == artifacts.content_fingerprint(str(f), salt="s1")
    assert multi["s2"] == artifacts.content_fingerprint(str(f), salt="s2")
    assert multi["s1"] != multi["s2"]


def test_sweep_unlinks_prefix_matching_regular_file(monkeypatch, tmp_path):
    """Review finding (r8): rmtree(ignore_errors=True) on a regular FILE
    silently does nothing — the sweep must unlink files and count only
    entries actually removed."""
    monkeypatch.setattr(artifacts, "ARTIFACT_ROOT", str(tmp_path))
    stray = tmp_path / "kidx_stray.log"
    stray.write_text("x")
    old_ts = time.time() - 48 * 3600
    os.utime(stray, (old_ts, old_ts))
    removed = artifacts.sweep_stale("kidx_", ttl_hours=12)
    assert removed == 1 and not stray.exists()


def test_publish_recovery_claims_dead_holders_lock_file(tmp_path):
    """Corpse recovery is serialized by a kernel flock (ADVICE r8 — the
    O_EXCL file + mtime-age takeover had a TOCTOU between two waiters).
    A lock FILE left by a dead holder carries no flock, so recovery
    acquires immediately — no staleness age to outwait — and the sidecar
    file deliberately persists (unlinking would split waiters across
    inodes)."""
    final = tmp_path / "seg_lock"
    # wedged corpse: dir exists but is not published
    final.mkdir()
    (final / "junk").write_text("corpse")
    lock = tmp_path / "seg_lock.recovery.lock"
    lock.touch()  # dead holder's leftover: file exists, flock released
    old_ts = time.time() - 120
    os.utime(lock, (old_ts, old_ts))

    staging = tmp_path / "seg_lock.staging.1"
    staging.mkdir()
    (staging / "_OK").touch()
    (staging / "data").write_text("good")
    artifacts.publish_atomic(str(staging), str(final))
    assert artifacts.is_published(str(final))
    assert (final / "data").read_text() == "good"
    assert not staging.exists()


def test_publish_recovery_yields_to_live_lock_holder_that_publishes(tmp_path):
    """A HELD flock (live holder) makes the second recoverer wait; when
    the holder's publish lands, the waiter discards its staging instead
    of touching the published artifact."""
    import fcntl
    import threading

    final = tmp_path / "seg_lock2"
    final.mkdir()
    (final / "junk").write_text("corpse")
    lock = tmp_path / "seg_lock2.recovery.lock"
    fd = os.open(str(lock), os.O_CREAT | os.O_WRONLY)
    fcntl.flock(fd, fcntl.LOCK_EX)  # live holder mid-recovery

    staging = tmp_path / "seg_lock2.staging.9"
    staging.mkdir()
    (staging / "data").write_text("loser")

    def holder_publishes():
        time.sleep(0.3)
        import shutil

        shutil.rmtree(final)
        final.mkdir()
        (final / "data").write_text("winner")
        (final / "_OK").touch()
        os.close(fd)  # release the flock

    t = threading.Thread(target=holder_publishes)
    t.start()
    artifacts.publish_atomic(str(staging), str(final))
    t.join()
    assert (final / "data").read_text() == "winner"
    assert not staging.exists()


def test_sweep_never_unlinks_recovery_lock_sidecars(monkeypatch, tmp_path):
    """flock sidecars persist by design; a TTL sweep removing one would
    hand a newcomer a fresh inode while a waiter holds the old one."""
    monkeypatch.setattr(artifacts, "ARTIFACT_ROOT", str(tmp_path))
    lock = tmp_path / "kidx_seg.recovery.lock"
    lock.touch()
    old_ts = time.time() - 48 * 3600
    os.utime(lock, (old_ts, old_ts))
    removed = artifacts.sweep_stale("kidx_", ttl_hours=12)
    assert removed == 0 and lock.exists()


def test_swap_publish_replaces_restores_and_recovers(tmp_path):
    """The shared replaceable-table swap (review finding r8): fresh
    publish, replace, restore-on-failed-swap, and crash recovery of a
    stranded .swap_old dir."""
    final = tmp_path / "tbl"

    def mk(name, content):
        d = tmp_path / name
        d.mkdir()
        (d / "data").write_text(content)
        return d

    # fresh publish = one rename
    artifacts.swap_publish(str(mk("s1", "v1")), str(final))
    assert (final / "data").read_text() == "v1"
    # replace
    artifacts.swap_publish(str(mk("s2", "v2")), str(final))
    assert (final / "data").read_text() == "v2"
    assert not any(".swap_old." in n for n in os.listdir(tmp_path))
    # failed swap (staging vanished) restores the previous publish
    ghost = tmp_path / "ghost"
    try:
        artifacts.swap_publish(str(ghost), str(final))
    except OSError:
        pass
    assert (final / "data").read_text() == "v2", "previous publish restored"
    # crash recovery: simulate a kill between the two renames — the table
    # stranded at .swap_old.<dead pid>, final missing
    stranded = tmp_path / "tbl.swap_old.999999999"
    os.rename(final, stranded)
    artifacts.swap_publish(str(mk("s3", "v3")), str(final))
    assert (final / "data").read_text() == "v3"
    assert not any(".swap_old." in n for n in os.listdir(tmp_path))


def test_swap_publish_entry_recovery_without_new_publish(tmp_path):
    """Entry-time recovery restores the NEWEST stranded swap_old when the
    final dir is missing, then the new staging replaces it normally."""
    final = tmp_path / "t2"
    old1 = tmp_path / "t2.swap_old.111111111"
    old1.mkdir()
    (old1 / "data").write_text("older")
    os.utime(old1, (time.time() - 100, time.time() - 100))
    old2 = tmp_path / "t2.swap_old.222222222"
    old2.mkdir()
    (old2 / "data").write_text("newer")

    staging = tmp_path / "s"
    staging.mkdir()
    (staging / "data").write_text("incoming")
    artifacts.swap_publish(str(staging), str(final))
    # the newer stray was restored, then replaced by the incoming batch;
    # the older dead stray was dropped
    assert (final / "data").read_text() == "incoming"
    assert not any(".swap_old." in n for n in os.listdir(tmp_path))


def test_publish_recovery_two_concurrent_recoverers_one_winner(tmp_path):
    """The race the flock redesign exists to close (ADVICE r8): two
    recoverers hit the same wedged corpse CONCURRENTLY, repeatedly.
    Exactly one staging must win, the loser's staging must be discarded,
    the published artifact must be complete (never a half-deleted dir —
    the failure mode of the old unlink-takeover TOCTOU), and nothing
    deadlocks or leaks staging/tmp dirs."""
    import threading

    for rnd in range(5):
        final = tmp_path / f"seg_race_{rnd}"
        final.mkdir()
        (final / "junk").write_text("corpse")  # wedged: no _OK

        stagings = []
        for i in (1, 2):
            st = tmp_path / f"seg_race_{rnd}.staging.{i}"
            st.mkdir()
            (st / "_OK").touch()
            (st / "data").write_text(f"writer-{i}")
            stagings.append(str(st))

        errs = []

        def publish(st):
            try:
                artifacts.publish_atomic(st, str(final))
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=publish, args=(s,)) for s in stagings]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=30)
            assert not t.is_alive(), "publish_atomic deadlocked"
        assert not errs, errs
        assert artifacts.is_published(str(final))
        content = (final / "data").read_text()
        assert content in ("writer-1", "writer-2")
        assert not (final / "junk").exists(), "corpse must be fully replaced"
        # both stagings consumed (winner renamed, loser discarded)
        assert not any(
            p.exists() for p in map(__import__("pathlib").Path, stagings)
        )
