"""Persisted index-artifact lifecycle: fingerprint, publish, evict.

Serving-tier operators (incremental BM25, incremental IVF) persist fitted
index tables under /tmp so repeated serving runs pay only the delta
fold-in, never a corpus rescan. This module owns the three lifecycle
concerns those artifacts share (round-6 VERDICT items 2-3; the r5/r6
ADVICE on ``os.stat`` fingerprints):

- **Content fingerprint** — an artifact must be keyed by the CONTENT of
  its source dataset, not a single ``os.stat``. A parquet source is a
  file here but a directory of part files everywhere else (the normal
  Spark output layout); fingerprinting one ``stat`` of the directory
  inode captures neither part additions nor rewrites.
  ``content_fingerprint`` walks every regular file under each source
  path and hashes the sorted (relative path, size, mtime) triples —
  O(#files) stat calls, no data reads, and any part-level change flips
  the key.
- **Atomic publish** — builds land in a process-unique staging dir and
  publish via ``os.rename``; concurrent first callers (bench + verify)
  race safely and the loser discards its staging dir.
- **TTL eviction** — /tmp artifacts previously accumulated forever. Each
  build sweeps sibling artifacts (same prefix) whose mtime is older than
  the TTL, plus orphaned ``.staging.*`` dirs from dead processes. The
  sweep lists one directory — bounded housekeeping, not a scan.

At 100 TB the same lifecycle maps onto a real table format: fingerprint →
source snapshot id, publish → atomic catalog swap, TTL → snapshot
expiry/orphan-file cleanup (Iceberg's ``expire_snapshots``).
"""

from __future__ import annotations

import fcntl
import hashlib
import os
import shutil
import time

ARTIFACT_ROOT = "/tmp"
DEFAULT_TTL_HOURS = 12.0


def _raise_walk_error(err: OSError) -> None:
    """os.walk swallows directory-listing errors by default (onerror=None)
    — a transient EACCES/EIO would silently TRUNCATE the inventory, the
    truncated inventory can reproduce a pre-append key, and the stale
    artifact would be served as current (review finding, r8). Fingerprint
    failures must be loud."""
    raise err


def _inventory(paths: tuple[str, ...]) -> str:
    """Sorted, source-index-tagged file inventory of ``paths``.

    Tagged with the source's index so multi-path fingerprints cannot
    collide when file metadata is swapped BETWEEN sources (review
    finding, r8). One retry on FileNotFoundError: a concurrent rewrite
    (Spark overwrite deleting part files mid-walk) settles by the second
    pass; a truncated inventory is never returned."""
    for attempt in (0, 1):
        try:
            entries: list[str] = []
            for i, path in enumerate(paths):
                if os.path.isfile(path):
                    st = os.stat(path)
                    # mtime at ns resolution: a same-size in-place rewrite
                    # within one second must still flip the key (review
                    # finding, r7)
                    entries.append(
                        f"{i}:{os.path.basename(path)}|{st.st_size}|{st.st_mtime_ns}"
                    )
                else:
                    for root, _dirs, files in os.walk(
                        path, onerror=_raise_walk_error
                    ):
                        for name in files:
                            full = os.path.join(root, name)
                            st = os.stat(full)
                            rel = os.path.relpath(full, path)
                            entries.append(
                                f"{i}:{rel}|{st.st_size}|{st.st_mtime_ns}"
                            )
            entries.sort()
            return "\n".join(entries)
        except FileNotFoundError:
            if attempt:
                raise
    raise AssertionError("unreachable")


def content_fingerprint(*paths: str, salt: str = "") -> str:
    """Stable 12-hex-digit key over the full file inventory of ``paths``.

    Handles single-file and directory-layout parquet identically: every
    regular file's (source index, relative path, size, mtime)
    contributes, sorted, so the key is independent of walk order.
    ``salt`` versions the artifact FORMAT — bump it when the layout
    changes so old artifacts are orphaned (and TTL-swept) instead of
    misread. For several salted keys over the SAME sources use
    ``content_fingerprints`` — one inventory walk instead of one per
    salt."""
    return content_fingerprints(*paths, salts=(salt,))[salt]


def content_fingerprints(*paths: str, salts: tuple[str, ...]) -> dict[str, str]:
    """Fingerprint the same sources under several salts with ONE
    inventory walk (a serve that keys base + delta + compacted segments
    otherwise stats the whole source tree once per salt)."""
    tail = "||" + _inventory(paths) + "||" + "|".join(sorted(paths))
    return {
        s: hashlib.md5((s + tail).encode()).hexdigest()[:12] for s in salts
    }


def artifact_path(prefix: str, key: str) -> str:
    """Compose an artifact dir under ARTIFACT_ROOT. Call sites must not
    hardcode the root: sweep_stale lists ARTIFACT_ROOT, and a hardcoded
    "/tmp/..." at the call site silently decouples eviction from the
    real artifact locations the moment the root moves (review finding,
    r8)."""
    return os.path.join(ARTIFACT_ROOT, f"{prefix}{key}")


def sweep_stale(
    prefix: str,
    *,
    ttl_hours: float = DEFAULT_TTL_HOURS,
    keep: set[str] | None = None,
) -> int:
    """Remove artifact dirs ``{ARTIFACT_ROOT}/{prefix}*`` older than the
    TTL, and any orphaned staging dirs regardless of age when their
    owning pid is gone. ``keep`` names dirs that must survive regardless
    of age — callers pass the key(s) currently derivable from live
    sources, so an old-but-still-current artifact is never evicted out
    from under a serving path (review finding, r7). Returns the number
    of dirs removed. Errors are swallowed per-dir (a concurrent sweep
    may win the race)."""
    removed = 0
    now = time.time()
    try:
        names = os.listdir(ARTIFACT_ROOT)
    except OSError:
        return 0
    for name in names:
        if not name.startswith(prefix) or name in (keep or ()):
            continue
        if name.endswith(".recovery.lock"):
            # flock sidecars are never unlinked (publish_atomic): removing
            # one would hand a newcomer a fresh inode while a waiter still
            # holds the old one — two concurrent "holders"
            continue
        full = os.path.join(ARTIFACT_ROOT, name)
        try:
            if ".staging." in name:
                pid = name.rsplit(".staging.", 1)[1]
                stale_staging = not (pid.isdigit() and _pid_alive(int(pid)))
                if stale_staging or now - os.stat(full).st_mtime > ttl_hours * 3600:
                    removed += _remove_entry(full)
            elif now - os.stat(full).st_mtime > ttl_hours * 3600:
                removed += _remove_entry(full)
        except OSError:
            continue
    return removed


def _pid_alive(pid: int) -> bool:
    """Portable liveness probe — os.kill(pid, 0) instead of /proc (which
    exists only on Linux; elsewhere every live builder's staging dir
    would classify as orphaned and be deleted mid-build — review
    finding, r8). EPERM means the pid exists under another user."""
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _remove_entry(full: str) -> int:
    """Remove a swept entry — rmtree for dirs, unlink otherwise
    (rmtree(ignore_errors=True) on a regular FILE silently does nothing,
    so a prefix-matching stray file was never evicted AND was counted as
    removed on every sweep — review finding, r8). Returns 1 only when
    the entry is actually gone, so the sweep count is honest."""
    if os.path.isdir(full):
        shutil.rmtree(full, ignore_errors=True)
    else:
        try:
            os.unlink(full)
        except OSError:
            pass
    return 0 if os.path.exists(full) else 1


def dir_bytes(path: str) -> int:
    """Total bytes of regular files under ``path`` — the driver-side
    segment-size metadata the minor-compaction trigger compares
    (delta/base size ratio). A table format reads this from manifest
    metadata; either way it is O(#files) stats, no data reads."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for name in files:
            try:
                total += os.stat(os.path.join(root, name)).st_size
            except OSError:
                continue
    return total


def staging_dir(final_dir: str) -> str:
    """Process-unique staging path beside the final artifact dir."""
    return f"{final_dir}.staging.{os.getpid()}"


def publish_atomic(staging: str, final_dir: str) -> None:
    """Atomically publish ``staging`` as ``final_dir``. Three outcomes:

    - rename succeeds: we published.
    - rename fails AND ``final_dir`` is published (has ``_OK``): another
      process won the race — discard our staging, use the winner's.
    - rename fails and ``final_dir`` is NOT published: a corpse (e.g. an
      interrupted sweep deleted ``_OK`` but not the dir) is wedging the
      key — remove it and retry once; re-raise if the retry fails, since
      silently reading a half-deleted artifact would serve wrong results
      (review finding, r7).
    """
    try:
        os.rename(staging, final_dir)
        return
    except OSError:
        pass
    # Corpse recovery is SERIALIZED with a kernel flock on a sidecar file
    # (review finding, r8; redesigned per ADVICE r8 — the previous O_EXCL
    # lock FILE plus 30s-mtime orphan takeover had a TOCTOU: two waiters
    # could both judge the same lock stale, and the slower unlink removed
    # the faster claimant's freshly created lock, re-admitting the
    # two-concurrent-recoverers race; its 10 s wait budget was also
    # shorter than the 30 s takeover age, wedging the key when a holder
    # died young). flock has neither problem: the lock dies WITH its
    # holder (no staleness heuristic, no takeover, no unlink), and
    # because the sidecar file is never unlinked every claimant locks the
    # same inode. Non-holders poll is_published while waiting so a
    # successful recovery releases them early. The residual window vs a
    # NORMAL first publish (which never takes the lock) is the
    # filesystem-instant between the under-lock check and the rmtree — a
    # real table format closes even that with a catalog commit.
    lock = f"{final_dir}.recovery.lock"
    try:
        fd = os.open(lock, os.O_CREAT | os.O_WRONLY, 0o644)
    except OSError:
        # can't even open the sidecar (ENOSPC/EACCES): don't leak staging
        shutil.rmtree(staging, ignore_errors=True)
        raise
    try:
        try:
            for _ in range(600):  # bounded: ~60 s of a LIVE slow holder
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                # BlockingIOError ONLY: contention is the one retryable case
                # — a real flock failure (ENOLCK, EBADF) must surface, not
                # spin the full budget and raise a misleading "held too long"
                except BlockingIOError:
                    if is_published(final_dir):  # the holder's publish landed
                        shutil.rmtree(staging, ignore_errors=True)
                        return
                    time.sleep(0.1)
            else:
                raise OSError(f"recovery lock {lock!r} held too long")
            if is_published(final_dir):  # re-check under the lock
                shutil.rmtree(staging, ignore_errors=True)
                return
            shutil.rmtree(final_dir, ignore_errors=True)
            try:
                os.rename(staging, final_dir)
            except OSError:
                if is_published(final_dir):  # lost to a normal publish — fine
                    shutil.rmtree(staging, ignore_errors=True)
                    return
                raise
        except BaseException:
            # EVERY failure path discards staging — including non-retryable
            # flock errors (ENOLCK/EBADF), which previously propagated with
            # the staging dir left to linger until a TTL sweep (ADVICE r9)
            shutil.rmtree(staging, ignore_errors=True)
            raise
    finally:
        # close() releases the flock; the sidecar FILE stays in place by
        # design (unlinking would let a waiter holding the old inode and a
        # newcomer on a fresh one both "acquire")
        os.close(fd)


def swap_publish(staging: str, final_dir: str) -> None:
    """Publish a REPLACEABLE table directory (single writer per path):
    fresh targets get one atomic rename; existing targets get a
    rename-aside swap (old → ``.swap_old.<pid>``, staging → final, drop
    old) with the previous publish RESTORED when the swap fails — never
    destroyed. Distinct from ``publish_atomic``, which serves
    KEYED-IMMUTABLE artifacts: there a re-publish under the same key
    rightly discards the newcomer, which is exactly wrong for a table
    that must replace (review finding, r8 — wap_write_parquet and
    compact_parquet each hand-rolled this and had diverged).

    Crash recovery (review finding, r8): a kill between the two renames
    strands the table at ``.swap_old.<pid>`` with final_dir missing; on
    entry, that state is repaired by restoring the newest stray, and
    strays whose owning pid is dead are dropped. The reader-visible gap
    between the two renames is inherent to a path-based table — a real
    lake replaces this whole function with a metadata commit.

    On any failure the staging directory is removed and the error
    re-raised, so callers never leak staging trees."""
    parent = os.path.dirname(final_dir) or "."
    base = os.path.basename(final_dir)
    try:
        strays = [
            n
            for n in os.listdir(parent)
            if n.startswith(f"{base}.swap_old.")
        ]
    except OSError:
        strays = []
    if strays and not os.path.exists(final_dir):
        newest = max(
            strays,
            key=lambda n: os.stat(os.path.join(parent, n)).st_mtime,
        )
        try:
            os.rename(os.path.join(parent, newest), final_dir)
            strays.remove(newest)
        except OSError:
            pass
    for n in strays:
        pid = n.rsplit(".swap_old.", 1)[1]
        if not (pid.isdigit() and _pid_alive(int(pid))):
            shutil.rmtree(os.path.join(parent, n), ignore_errors=True)
    bak = f"{final_dir}.swap_old.{os.getpid()}"
    had_old = os.path.exists(final_dir)
    try:
        if had_old:
            os.rename(final_dir, bak)
        os.rename(staging, final_dir)
    except OSError:
        if had_old and not os.path.exists(final_dir):
            try:
                os.rename(bak, final_dir)  # restore the previous publish
            except OSError:
                pass
        shutil.rmtree(staging, ignore_errors=True)
        raise
    if had_old:
        shutil.rmtree(bak, ignore_errors=True)


def is_published(final_dir: str) -> bool:
    return os.path.exists(os.path.join(final_dir, "_OK"))


def touch_served(final_dir: str) -> None:
    """Refresh the artifact DIR's mtime on every warm serve (ADVICE r7 /
    VERDICT r7 item 5): sweep_stale ages artifacts on the dir mtime, so a
    continuously-serving artifact can no longer age past the TTL and be
    evicted under a live reader by a concurrent build's sweep — eviction
    of a live key becomes impossible rather than retried. The ``_OK``
    marker's mtime — the published-INSTANCE identity consumed by
    published_version / cached_readers — is deliberately left untouched."""
    try:
        os.utime(final_dir)
    except OSError:
        pass


def published_version(final_dir: str) -> int:
    """Identity of the published artifact INSTANCE — the ``_OK`` marker's
    mtime_ns. A delete + rebuild lands new part files under the same
    fingerprint key, so any cached resolved reader (whose file index
    pinned the old part names) must be invalidated; callers stamp their
    caches with this and rebuild on mismatch."""
    return os.stat(os.path.join(final_dir, "_OK")).st_mtime_ns


def ensure_published_version(final_dir: str, build) -> int:
    """Build-if-absent, then return the published instance version — with
    ONE retry when a concurrent process's TTL sweep deletes the artifact
    between the existence check and the stat (concurrent callers are a
    supported case — see publish_atomic; a sweeping process keeps only
    ITS current key, so another corpus's old-but-current artifact can be
    evicted under a live reader; one rebuild round restores it)."""
    for attempt in (0, 1):
        if not is_published(final_dir):
            build()
        try:
            ver = published_version(final_dir)
            touch_served(final_dir)  # live artifacts never age past the TTL
            return ver
        except FileNotFoundError:
            # the only error the documented sweep race produces; any other
            # OSError (EACCES, EIO) must surface, not trigger a rebuild
            if attempt:
                raise
    raise AssertionError("unreachable")


def meta_cache(cache: dict[str, dict], key: str, spark, *, max_entries: int = 8) -> dict:
    """Bounded per-fingerprint serving-cache entry (true LRU eviction —
    the accessed key re-inserts at the end; docstring previously said
    FIFO, stale since the r7 fix).

    Entries hold plain-data payloads (collected index stats — session-free,
    valid across rebuilds because a same-key rebuild is deterministic) plus
    optionally a ``scans`` reader tuple from cached_readers. Reader tuples
    bound to a session OTHER than ``spark`` are dropped eagerly, so cycling
    sessions cannot accumulate plans pinned to stopped JVM state."""
    for m in cache.values():
        sc = m.get("scans")
        if sc is not None and sc[0] is not spark:
            m.pop("scans", None)
    # LRU: re-insert the accessed key at the end, THEN bound — the hot
    # key can never evict itself, and the cache holds exactly
    # max_entries (review finding: evict-before-insert held
    # max_entries+1 and thrashed the oldest key's own payload)
    entry = cache.pop(key, None)
    if entry is None:
        entry = {}
    cache[key] = entry
    while len(cache) > max_entries:
        cache.pop(next(iter(cache)))
    return entry


def cached_readers(meta: dict, spark, versions: tuple, build):
    """Resolved readers per (fingerprint entry, session, artifact
    instance) — the catalog-style file-index cache (Spark's own
    CatalogFileIndex plays this role for a real table). Re-resolution
    costs ~0.5 s/serve of pure driver overhead on immutable segments; the
    session identity check guards a restarted session, and ``versions``
    (the segments' published_version tuple) invalidates on a delete +
    rebuild landing new part files under the same key."""
    cached = meta.get("scans")
    if cached is None or cached[0] is not spark or cached[1] != versions:
        cached = (spark, versions, *build())
        meta["scans"] = cached
    return cached[2:]


def backfill_empty_partitioned(spark, schema, out_dir: str) -> None:
    """A dynamic-partition write of ZERO rows emits no part files at all,
    and a later read of the published segment then fails schema inference
    (UNABLE_TO_INFER_SCHEMA) — permanently, since the ``_OK`` marker makes
    the broken artifact durable. When that happens, land one empty
    schema-bearing file with the partition column INLINE: the segment
    then reads as a normal empty parquet with the same column set, and
    unionByName coerces it against the partition-inferred sibling."""
    for _root, _dirs, files in os.walk(out_dir):
        if any(f.endswith(".parquet") for f in files):
            return
    spark.createDataFrame([], schema).repartition(1).write.mode(
        "overwrite"
    ).parquet(out_dir)
