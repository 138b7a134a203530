"""Property-based tests (hypothesis) for the custom operators.

Each property cross-checks a distributed implementation against either an
algebraic invariant or a naive single-process reference on small generated
inputs. Example counts are kept low: every example costs Spark jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from spark_iceberg_jobs_spark.operators.dedup import exact_dedup
from spark_iceberg_jobs_spark.operators.events import sessionize
from spark_iceberg_jobs_spark.operators.joins import asof_join, banded_range_join

SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

texts = st.lists(
    st.text(alphabet="ab ", min_size=1, max_size=12).map(lambda s: s.strip() or "a"),
    min_size=1,
    max_size=12,
)


@SETTINGS
@given(texts)
def test_exact_dedup_partitions_the_input(spark, docs):
    """Dedup groups partition the input: copies sum to the row count, and
    dedup of the keepers is a fixed point."""
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    groups = exact_dedup(df).collect()
    assert sum(g.n_copies for g in groups) == len(docs)
    keepers = spark.createDataFrame(
        [(g.keeper_id, docs[g.keeper_id]) for g in groups], "doc_id long, text string"
    )
    again = exact_dedup(keepers).collect()
    assert len(again) == len(groups)
    assert all(g.n_copies == 1 for g in again)


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        st.integers(min_value=0, max_value=10_000),  # epoch seconds
        st.floats(min_value=0, max_value=100, allow_nan=False),
    ),
    min_size=1,
    max_size=25,
)


@SETTINGS
@given(events_strategy)
def test_sessionize_conservation(spark, rows):
    """Sessions partition each user's events; durations are non-negative and
    bounded by the user's time span."""
    data = [
        (i, user, es, float(round(v, 2))) for i, (user, es, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, es long, value double"
    ).withColumn("ts", F.timestamp_seconds("es"))
    sessions = sessionize(df, gap_sec=600).collect()
    assert sum(s.n_events for s in sessions) == len(rows)
    per_user_span = {}
    for _, user, es, _v in data:
        lo, hi = per_user_span.get(user, (es, es))
        per_user_span[user] = (min(lo, es), max(hi, es))
    for s in sessions:
        lo, hi = per_user_span[s.user_id]
        assert 0 <= s.duration_sec <= hi - lo


asof_strategy = st.tuples(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=1, max_size=12
    ),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100), st.integers(0, 9)),
        min_size=1,
        max_size=12,
    ),
    st.booleans(),
)


range_strategy = st.tuples(
    st.lists(st.tuples(st.integers(0, 2), st.integers(-50, 50)), min_size=1, max_size=10),
    st.lists(st.tuples(st.integers(0, 2), st.integers(-50, 50)), min_size=1, max_size=10),
    st.integers(min_value=1, max_value=20),
)


@SETTINGS
@given(range_strategy)
def test_banded_range_join_matches_naive(spark, data):
    """Band-bucketed range join == naive inequality scan, including
    bucket-boundary cases (small integer timestamps collide with bucket
    edges by design) and NEGATIVE epochs (pre-1970 — bucketing must be
    floor division, not cast-truncation; ADVICE r1)."""
    lrows, rrows, gap = data
    left = spark.createDataFrame(
        [(i, k, es) for i, (k, es) in enumerate(lrows)], "lid long, k long, les long"
    )
    right = spark.createDataFrame(
        [(j, k, es) for j, (k, es) in enumerate(rrows)], "rid long, k long, res long"
    )
    got = {
        (r.lid, r.rid)
        for r in banded_range_join(
            left, right, on="k", left_es="les", right_es="res", max_gap_sec=gap
        ).collect()
    }
    expected = {
        (i, j)
        for i, (lk, les) in enumerate(lrows)
        for j, (rk, res) in enumerate(rrows)
        if lk == rk and les < res <= les + gap
    }
    assert got == expected


@SETTINGS
@given(asof_strategy)
def test_asof_join_matches_naive(spark, data):
    """Distributed as-of join == naive per-row max-scan, both strictness
    modes, including equal-timestamp edge cases (generated integer
    timestamps collide often by design)."""
    lrows, rrows, strict = data
    left = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(lrows)], "lid long, k long, lts long"
    )
    right = spark.createDataFrame(
        [(k, ts, v) for k, ts, v in rrows], "k long, rts long, rv long"
    )
    got = {
        (r.lid, r.asof_rts, r.asof_rv)
        for r in asof_join(
            left,
            right,
            on="k",
            left_ts="lts",
            right_ts="rts",
            right_cols=["rts", "rv"],
            strict=strict,
        ).collect()
    }
    expected = set()
    for i, (k, lts) in enumerate(lrows):
        cands = [
            (rts, rv)
            for (rk, rts, rv) in rrows
            if rk == k and (rts < lts if strict else rts <= lts)
        ]
        if cands:
            # the sweep tie-breaks equal-ts right rows by carried columns:
            # winner = greatest (rts, rv) tuple
            best_ts, best_rv = max(cands)
            expected.add((i, best_ts, best_rv))
    assert got == expected


pairs = st.lists(
    st.tuples(st.integers(0, (1 << 10) - 1), st.integers(0, (1 << 10) - 1)),
    min_size=1,
    max_size=30,
    unique=True,
)


@given(pairs)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_zorder_key_matches_python_morton_reference(spark, ps):
    """plans/layout.zorder_key must compute the exact Morton interleave: the
    JVM shift/and/or expression agrees with a plain-Python bit-interleave
    reference on arbitrary in-range pairs (and is therefore a bijection)."""
    from spark_iceberg_jobs_spark.plans.layout import zorder_key

    def morton(a: int, b: int, bits: int = 10) -> int:
        k = 0
        for i in range(bits):
            k |= ((a >> i) & 1) << (2 * i)
            k |= ((b >> i) & 1) << (2 * i + 1)
        return k

    df = spark.createDataFrame(ps, "a long, b long")
    got = {
        (r.a, r.b): r.k
        for r in df.withColumn("k", zorder_key("a", "b", bits=10)).collect()
    }
    assert got == {(a, b): morton(a, b) for a, b in ps}


ids = st.lists(st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=40)


@SETTINGS
@given(ids)
def test_hll_reg_rho_matches_python_reference(spark, keys):
    """The Spark-side HLL hashing (string/CASE math over md5 hex) must
    agree with a direct Python bit-level reference: register = first hex
    byte mod 64; rho = 1 + number of leading zero bits of the 52-bit value
    in hex digits 3..15 (53 when all zero)."""
    import hashlib

    from spark_iceberg_jobs_spark.operators.aggs import _hll_reg_rho

    def ref(k: int) -> tuple[int, int]:
        h = hashlib.md5(f"hll:{k}".encode()).hexdigest()
        reg = int(h[:2], 16) % 64
        w = int(h[2:15], 16)  # 13 hex digits = 52 bits
        if w == 0:
            return reg, 53
        rho = 52 - w.bit_length() + 1
        return reg, rho

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    reg, rho = _hll_reg_rho("k")
    got = {
        r.k: (r.reg, r.rho)
        for r in df.select("k", reg, rho).collect()
    }
    for k in set(keys):
        assert got[k] == ref(k), (k, got[k], ref(k))


@SETTINGS
@given(ids)
def test_bloom_positions_match_python_reference(spark, keys):
    """_bloom_positions (conv of the first 8 salted-md5 hex digits, mod
    bits) must agree with the direct Python int(h[:8], 16) reference for
    every hash index — the property the oracle replay relies on."""
    import hashlib

    from spark_iceberg_jobs_spark.operators.dedup import _bloom_positions

    bits, hashes = 1 << 13, 3
    df = spark.createDataFrame([(str(k),) for k in keys], "s string")
    cols = _bloom_positions(F.col("s"), bits=bits, hashes=hashes)
    rows = df.select("s", *[c.alias(f"p{j}") for j, c in enumerate(cols)]).collect()
    for r in rows:
        for j in range(hashes):
            h = hashlib.md5(f"bf{j}:{r.s}".encode()).hexdigest()
            assert r[f"p{j}"] == int(h[:8], 16) % bits


@SETTINGS
@given(texts)
def test_repeated_ngram_spans_matches_naive(spark, docs):
    """The distributed ExactSubstr pass equals a naive single-process
    reference: same affected docs, same merged duplicated-token counts;
    dup_tokens never exceeds n_tokens."""
    from spark_iceberg_jobs_spark.operators.dedup import repeated_ngram_spans

    W = 2
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_dup_spans, r.dup_tokens, r.n_tokens)
        for r in repeated_ngram_spans(df, window=W, min_count=2).collect()
    }

    # naive reference: census of all W-token windows, merged per doc
    toks = {i: d.split() for i, d in enumerate(docs)}
    census: dict[tuple, int] = {}
    for ts in toks.values():
        for j in range(len(ts) - W + 1):
            g = tuple(ts[j : j + W])
            census[g] = census.get(g, 0) + 1
    want = {}
    for i, ts in toks.items():
        spans = [
            (j, j + W)
            for j in range(len(ts) - W + 1)
            if census[tuple(ts[j : j + W])] >= 2
        ]
        if not spans:
            continue
        merged = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        want[i] = (len(merged), sum(e - s for s, e in merged), len(ts))
    assert got == want
    for n_spans, dup, total in got.values():
        assert 0 < dup <= total and n_spans >= 1


@SETTINGS
@given(texts)
def test_tfidf_cosine_bounds_and_symmetry(spark, docs):
    """TF-IDF cosine of unit vectors is bounded by 1 (+ float dust), every
    pair is ordered doc_a < doc_b, and identical texts score exactly 1."""
    from spark_iceberg_jobs_spark.operators.dedup import tfidf_cosine_pairs

    # plant one exact duplicate pair
    docs = list(docs) + [docs[0]]
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    rows = tfidf_cosine_pairs(df, threshold=0.01).collect()
    for r in rows:
        assert r.doc_a < r.doc_b
        assert r.cos_sim <= 1.0 + 1e-9
    dup_pair = [r for r in rows if r.doc_a == 0 and r.doc_b == len(docs) - 1]
    # the planted duplicate must be found unless doc 0's every term has
    # idf 0 (i.e. appears in all docs) — then its weight vector is empty
    if dup_pair:
        assert dup_pair[0].cos_sim == 1.0


# --- snapshot retention / orphan reachability ------------------------------

_retention_days = st.lists(
    st.dates(
        min_value=__import__("datetime").date(2020, 1, 1),
        max_value=__import__("datetime").date(2024, 12, 28),
    ),
    min_size=1,
    max_size=32,
    unique=True,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(days=_retention_days, retain_last=st.integers(1, 40), max_age=st.integers(0, 500))
def test_retention_planners_match_python_reference(spark, days, retain_last, max_age):
    """Both maintenance planners against the naive reference on random
    commit logs: expiry flags match rule-by-rule, exactly
    min-floored-retain_last snapshots survive, and the orphan set is
    EXACTLY the reclaimable dailies (post-expiry reachability) — monthly
    rollups and retained-month dailies are never orphaned."""
    from test_maintenance import _expected_expiry, _snaps_df

    from spark_iceberg_jobs_spark.queries.maintenance import (
        orphan_files_classify,
        snapshot_expiry_classify,
    )

    keep_from, want = _expected_expiry(days, retain_last, max_age)
    got = {
        r.dt: (r.expired, r.superseded, r.reclaimable)
        for r in snapshot_expiry_classify(
            _snaps_df(spark, days), retain_last=retain_last, max_age_days=max_age
        ).collect()
    }
    assert got == want
    n_retained = sum(not e for e, _, _ in got.values())
    assert n_retained >= min(retain_last, len(days))
    assert n_retained == sum(1 for d in days if d >= keep_from)

    orphan_rows = orphan_files_classify(
        _snaps_df(spark, days),
        grace_days=0,
        retain_last=retain_last,
        max_age_days=max_age,
    ).collect()
    orphans = {r.path for r in orphan_rows if r.orphan}
    want_orphans = {
        f"data/d-{d.isoformat()}.parquet" for d, (_, _, rec) in want.items() if rec
    }
    assert orphans == want_orphans
    assert not any(r.orphan for r in orphan_rows if r.kind == "monthly")
    # grace_days=0: every orphan is at/past the cutoff -> deletable
    assert all(r.deletable for r in orphan_rows if r.orphan)


# --- compaction binpack ------------------------------------------------------

_binpack_files = st.lists(
    st.tuples(
        st.dates(
            min_value=__import__("datetime").date(2022, 1, 1),
            max_value=__import__("datetime").date(2023, 12, 28),
        ),
        st.integers(1, 4_000),  # file bytes: from tiny to multi-bin
    ),
    min_size=1,
    max_size=24,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(files=_binpack_files)
def test_compaction_binpack_matches_python_reference(spark, files):
    """The running-sum binpack on random file inventories vs a naive
    per-partition greedy replica: identical (year, bin) totals, full
    coverage, contiguous bins, and the one-file overflow bound."""
    from spark_iceberg_jobs_spark.queries.maintenance import _COMPACT_TARGET

    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [(d.isoformat(), b, d.year) for d, b in files],
        "file_day string, file_bytes long, part_year long",
    )
    w = (
        Window.partitionBy("part_year")
        .orderBy("file_day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("file_bytes").over(w), F.lit(0))
    got = {
        (r.part_year, r.bin_id): (r.n_files, r.total_bytes)
        for r in df.withColumn(
            "bin_id", F.floor(cum_before / _COMPACT_TARGET).cast("long")
        )
        .groupBy("part_year", "bin_id")
        .agg(F.count("*").alias("n_files"), F.sum("file_bytes").alias("total_bytes"))
        .collect()
    }
    # naive replica: per year in day order, file joins bin cum_before//target
    want: dict[tuple[int, int], list[int]] = {}
    by_year: dict[int, list[tuple[str, int]]] = {}
    for d, b in sorted(files):
        by_year.setdefault(d.year, []).append((d.isoformat(), b))
    for year, fs in by_year.items():
        cum = 0
        for _, b in fs:
            k = (year, cum // _COMPACT_TARGET)
            n, t = want.get(k, (0, 0))
            want[k] = (n + 1, t + b)
            cum += b
    assert got == want
    max_file = max(b for _, b in files)
    for year, fs in by_year.items():
        ids = sorted(bid for (y, bid) in got if y == year)
        assert ids == list(range(len(ids))), "bins must be contiguous from 0"
        for (y, bid), (n, t) in got.items():
            if y == year:
                assert t < _COMPACT_TARGET + max_file, "overflow bound: one file max"


# --- CDC latest-wins materialization ----------------------------------------

_cdc_events = st.lists(
    st.tuples(
        st.integers(0, 5),  # user_id: few users -> deep per-key histories
        st.integers(0, 3),  # ts slot: coarse -> frequent (ts, event_id) ties
        st.sampled_from(["purchase", "click", "view", "error"]),
        st.floats(0, 100, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=_cdc_events)
def test_cdc_materialize_matches_python_reference(spark, rows):
    """cdc_materialize vs a naive dict replay on random changelogs with
    planted ts ties: one row per user, latest by (ts, event_id) with
    event_id breaking ties, live == (last event is not the tombstone)."""
    import datetime as _dt

    from spark_iceberg_jobs_spark.queries.maintenance import cdc_materialize

    data = [
        (i, _dt.datetime(2024, 1, 1) + _dt.timedelta(hours=slot), uid, typ, float(v), "{}")
        for i, (uid, slot, typ, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {
        r.user_id: (r.event_id, r.event_type, r.live)
        for r in cdc_materialize(df).collect()
    }
    want = {}
    for eid, ts, uid, typ, _v, _p in data:
        cur = want.get(uid)
        if cur is None or (ts, eid) > (cur[0], cur[1]):
            want[uid] = (ts, eid, typ)
    want = {u: (eid, typ, typ != "error") for u, (ts, eid, typ) in want.items()}
    assert got == want


# ---------------------------------------------------------------------------
# plan_binpack (round 8): pure-python greedy rule — no Spark per example
# ---------------------------------------------------------------------------

_binpack_inventory = st.lists(
    st.tuples(
        st.text(alphabet="abcdef", min_size=1, max_size=6),  # path
        st.integers(min_value=0, max_value=5_000),  # bytes
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@settings(max_examples=200, deadline=None)
@given(inv=_binpack_inventory, target=st.integers(min_value=1, max_value=4_000))
def test_plan_binpack_invariants(inv, target):
    """The greedy running-sum rule's invariants, for any inventory:
    partition (every file in exactly one bin), path-order contiguity
    (bin ids are non-decreasing over the sorted inventory, starting at
    0 with no gaps), and the overflow bound (every bin's bytes < target
    + its largest file; a bin overflows by at most its last member)."""
    from spark_iceberg_jobs_spark.plans.maintenance import plan_binpack

    plan = plan_binpack(inv, target)
    assert sorted(p for _b, p, _s in plan) == sorted(p for p, _s in inv)
    bins = [b for b, _p, _s in plan]
    # bin ids are non-decreasing over the sorted inventory and start at 0;
    # they may legitimately SKIP ids — a file larger than k targets jumps
    # the running sum past k bin boundaries (hypothesis found the gap case
    # immediately: [('a', 2), ('b', 0)] at target 1 → bins [0, 2])
    assert bins == sorted(bins) and (not bins or bins[0] == 0)
    per_bin: dict[int, list[int]] = {}
    for b, _p, s in plan:
        per_bin.setdefault(b, []).append(s)
    for b, sizes in per_bin.items():
        # a bin's bytes-before-its-last-file fit under the target
        assert sum(sizes) - sizes[-1] < target or len(sizes) == 1
        assert sum(sizes) < target + max(sizes) or sum(sizes) == 0


def test_scd2_dwell_conservation(spark):
    """SCD2 identity on the real fixture: summed CLOSED dwell across all
    event types equals Σ_users (last_ts − first_ts) — validity intervals
    tile each user's history exactly, no gap and no overlap."""
    from spark_iceberg_jobs_spark.queries.maintenance import cdc_scd2_history

    sf = "/root/testdata/sf0.001"
    from spark_iceberg_jobs_spark.sources.readers import read_fixture

    got = sum(
        r["closed_dwell_us"]
        for r in cdc_scd2_history(spark, sf).collect()
    )
    # read_fixture, not a raw parquet read: the raw reader yields
    # TIMESTAMP_NTZ, which unix_micros rejects
    ev = read_fixture(spark, sf, "events")
    spans = (
        ev.groupBy("user_id")
        .agg(
            (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias("span")
        )
        .agg(F.sum("span").alias("total"))
        .first()
    )
    assert got == spans["total"]


# --- r9 snapshot-lifecycle kernels vs a python commit-model replica ---------

_lifecycle_days = st.lists(
    st.dates(
        min_value=__import__("datetime").date(2022, 1, 1),
        max_value=__import__("datetime").date(2023, 12, 28),
    ),
    min_size=1,
    max_size=14,
    unique=True,
)
_any_day = st.dates(
    min_value=__import__("datetime").date(2021, 11, 1),
    max_value=__import__("datetime").date(2024, 2, 1),
)


def _live_files(days_bytes, r):
    """Python replica of the commit model's live file set at snapshot R:
    month M serves its single compacted monthly file iff the commit that
    compacts it (the first commit of any LATER month) is <= R, else its
    dailies with dt <= R. Within-month dailies always precede later
    months' commits, so a compacted-at-R month never has post-R dailies."""
    months: dict[str, list] = {}
    for d in sorted(days_bytes):
        months.setdefault(d.strftime("%Y-%m"), []).append(d)
    mkeys = sorted(months)
    out = {}
    for i, m in enumerate(mkeys):
        later_firsts = [min(months[m2]) for m2 in mkeys[i + 1 :]]
        sup = min(later_firsts) if later_firsts else None
        if sup is not None and sup <= r:
            out[(m, f"m-{m}")] = sum(days_bytes[d] for d in months[m])
        else:
            for d in months[m]:
                if d <= r:
                    out[(m, f"d-{d.isoformat()}")] = days_bytes[d]
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(days=_lifecycle_days, rb=_any_day)
def test_rollback_plan_is_exactly_the_live_set_diff(spark, days, rb):
    """rollback_to_snapshot(R)'s plan on random sparse logs must equal the
    set difference of the python replica's live file sets: removed =
    live(now) − live(R), restored = live(R) − live(now), per month, in
    both counts and bytes. This is the cross-kernel identity that ties
    the rollback planner to the time-travel read model — a wrong
    supersession rule in either breaks the equality."""
    import datetime as dt

    from test_maintenance import _snaps_df

    from spark_iceberg_jobs_spark.queries.maintenance import rollback_classify

    days = sorted(days)
    days_bytes = {d: (i + 1) * 100 for i, d in enumerate(days)}  # _snaps_df rule
    live_now = _live_files(days_bytes, max(days))
    live_r = _live_files(days_bytes, rb)
    want: dict[str, list] = {}
    for (m, path), b in live_now.items():
        if (m, path) not in live_r:
            e = want.setdefault(m, [0, 0, 0, 0])
            e[0] += 1
            e[1] += b
    for (m, path), b in live_r.items():
        if (m, path) not in live_now:
            e = want.setdefault(m, [0, 0, 0, 0])
            e[2] += 1
            e[3] += b

    bounds = spark.createDataFrame([(rb,)], "rb_dt date")
    got = {
        r.month: [r.n_removed, r.bytes_removed, r.n_restored, r.bytes_restored]
        for r in rollback_classify(_snaps_df(spark, days), bounds).collect()
        if (r.n_removed, r.n_restored) != (0, 0)
    }
    assert got == want
    # conservation: |live(R)| == |live(now)| − removed + restored
    n_rem = sum(v[0] for v in got.values())
    n_res = sum(v[2] for v in got.values())
    assert len(live_r) == len(live_now) - n_rem + n_res


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(days=_lifecycle_days, cuts=st.tuples(_any_day, _any_day, _any_day))
def test_incremental_scan_additivity_and_python_reference(spark, days, cuts):
    """Incremental reads compose: adds(A,B] ⊎ adds(B,C] == adds(A,C] and
    the same for skipped rewrites (the ranges partition the commit
    stream, so a changelog consumer reading in two hops sees exactly the
    one-hop result — Iceberg's incremental-scan contract). Both legs also
    match the python replica directly."""
    from test_maintenance import _snaps_df

    from spark_iceberg_jobs_spark.queries.maintenance import (
        incremental_append_scan,
        rewrites_in_range,
    )

    a, b, c = sorted(cuts)
    days = sorted(days)
    days_bytes = {d: (i + 1) * 100 for i, d in enumerate(days)}
    daily = _snaps_df(spark, days)

    def run(lo, hi):
        bounds = spark.createDataFrame([(lo, hi)], "lo_dt date, hi_dt date")
        adds = {
            r.dt: r.file_bytes
            for r in incremental_append_scan(daily, bounds).collect()
        }
        rews = {
            r.month: (r.mon_bytes, r.sup_dt)
            for r in rewrites_in_range(daily, bounds).collect()
        }
        return adds, rews

    adds_ab, rews_ab = run(a, b)
    adds_bc, rews_bc = run(b, c)
    adds_ac, rews_ac = run(a, c)
    assert set(adds_ab) & set(adds_bc) == set()
    assert {**adds_ab, **adds_bc} == adds_ac
    assert set(rews_ab) & set(rews_bc) == set()
    assert {**rews_ab, **rews_bc} == rews_ac
    # python reference for the one-hop read
    assert adds_ac == {d: days_bytes[d] for d in days if a < d <= c}
    months: dict[str, list] = {}
    for d in days:
        months.setdefault(d.strftime("%Y-%m"), []).append(d)
    mkeys = sorted(months)
    want_rews = {}
    for i, m in enumerate(mkeys):
        later = [min(months[m2]) for m2 in mkeys[i + 1 :]]
        sup = min(later) if later else None
        if sup is not None and a < sup <= c:
            want_rews[m] = (sum(days_bytes[d] for d in months[m]), sup)
    assert rews_ac == want_rews


_changelog_events = st.lists(
    st.tuples(
        st.integers(0, 4),  # user_id
        st.integers(0, 9 * 86400),  # offset seconds within a 10-day span
        st.sampled_from(["click", "view", "purchase", "error"]),
        st.integers(0, 10_000),  # value in cents
    ),
    min_size=1,
    max_size=24,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=_changelog_events)
def test_changelog_diff_matches_python_replay(spark, rows, monkeypatch):
    """cdc_changelog_diff on random changelogs vs a python replica of the
    two-snapshot latest-wins diff (cutoff = max ts − 7d, ties broken by
    event_id, tombstone = 'error', values exact cents). Conservation: the
    diff emits each changed key exactly once, and unchanged/dead-at-both
    keys never appear."""
    import datetime as dt

    import spark_iceberg_jobs_spark.queries.maintenance as m

    t0 = dt.datetime(2024, 1, 1)
    ev_rows = [
        (eid, t0 + dt.timedelta(seconds=off), uid, typ, None if typ == "error" else cents / 100.0)
        for eid, (uid, off, typ, cents) in enumerate(rows)
    ]
    ev = spark.createDataFrame(
        ev_rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    monkeypatch.setattr(m, "read_fixture", lambda s, sf, t_: ev)
    got = {
        (r.change_type, r.last_event_type): (r.n_keys, r.total_value)
        for r in m.cdc_changelog_diff(spark, "x").collect()
    }

    cutoff = max(r[1] for r in ev_rows) - dt.timedelta(days=7)
    agg: dict[tuple, list] = {}
    changed_keys = 0
    for uid in {r[2] for r in ev_rows}:
        mine = [r for r in ev_rows if r[2] == uid]
        b = max(mine, key=lambda r: (r[1], r[0]))
        pre = [r for r in mine if r[1] <= cutoff]
        a = max(pre, key=lambda r: (r[1], r[0])) if pre else None
        a_live = a is not None and a[3] != "error"
        b_live = b[3] != "error"
        if not a_live and b_live:
            ct = "insert"
        elif a_live and not b_live:
            ct = "delete"
        elif a_live and b_live and a[0] != b[0]:
            ct = "update"
        else:
            continue
        changed_keys += 1
        last_type = b[3] if b_live else a[3]
        val = b[4] if b_live else a[4]
        e = agg.setdefault((ct, last_type), [0, 0])
        e[0] += 1
        e[1] += int(round((val or 0.0) * 100))
    want = {k: (n, round(cents / 100.0, 2)) for k, (n, cents) in agg.items()}
    # counts exactly; sums in exact cents — a Spark NULL sum means every
    # contributing value was NULL (tombstone-kept pre-values), i.e. 0 cents
    assert {k: v[0] for k, v in got.items()} == {k: v[0] for k, v in want.items()}
    for k, (_n, s) in got.items():
        if s is None:
            assert want[k][1] == 0.0, (k, want[k])
        else:
            assert abs(s - want[k][1]) < 1e-9, (k, s, want[k])
    assert sum(v[0] for v in got.values()) == changed_keys


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(days=_lifecycle_days, cutoff=_any_day)
def test_delete_plan_is_predicate_x_live_set(spark, days, cutoff):
    """delete_plan_classify on random sparse logs must equal the python
    replica's live-file set intersected with the predicate ``dt <=
    cutoff``: a live monthly file whose OBSERVED span is fully covered
    drops by metadata, a straddled one rewrites with exact deleted/kept
    row counts, dailies drop atomically — tying the DELETE planner to the
    same commit-model replica as rollback/time-travel (a wrong
    supersession or coverage rule in either breaks the equality).
    Conservation: dropped + rewritten + untouched == |live files|."""
    import datetime as dt

    from spark_iceberg_jobs_spark.queries.maintenance import (
        _ROW_BYTES,
        delete_plan_classify,
    )

    days = sorted(days)
    days_bytes = {d: (i + 1) * _ROW_BYTES for i, d in enumerate(days)}
    daily = spark.createDataFrame(
        [(d, d.strftime("%Y-%m"), days_bytes[d]) for d in days],
        "dt date, month string, file_bytes long",
    )
    live_now = _live_files(days_bytes, max(days))

    want: dict[str, list[int]] = {}
    by_month: dict[str, list] = {}
    for d in days:
        by_month.setdefault(d.strftime("%Y-%m"), []).append(d)
    for (mth, path), b in live_now.items():
        e = want.setdefault(mth, [0, 0, 0, 0, 0, 0])
        if path.startswith("m-"):
            lo, hi = min(by_month[mth]), max(by_month[mth])
            if hi <= cutoff:
                e[0] += 1
                e[1] += b
            elif lo <= cutoff:
                e[2] += 1
                delb = sum(days_bytes[d] for d in by_month[mth] if d <= cutoff)
                e[3] += delb // _ROW_BYTES
                e[4] += (b - delb) // _ROW_BYTES
            else:
                e[5] += 1
        else:
            d = dt.date.fromisoformat(path[2:])
            if d <= cutoff:
                e[0] += 1
                e[1] += b
            else:
                e[5] += 1

    bounds = spark.createDataFrame([(cutoff,)], "del_dt date")
    got = {
        r.month: [
            r.n_dropped, r.bytes_dropped, r.n_rewritten,
            r.rows_deleted, r.rows_kept, r.n_untouched,
        ]
        for r in delete_plan_classify(daily, bounds).collect()
    }
    assert got == want
    n_live = len(live_now)
    assert (
        sum(v[0] + v[2] + v[5] for v in got.values()) == n_live
    ), "dropped + rewritten + untouched must partition the live set"


# ---------------------------------------------------------------------------
# filetable commit-sequence property (round 10): any legal sequence of
# table verbs serves exactly the rows a trivial Python replica holds
# ---------------------------------------------------------------------------

_ft_rows = st.lists(
    st.tuples(st.integers(0, 19), st.integers(0, 99)), min_size=1, max_size=8
)
_ft_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), _ft_rows),
        st.tuples(st.just("cow_delete"), st.integers(0, 99)),
        st.tuples(st.just("mor_delete"), st.lists(st.integers(0, 19), min_size=1, max_size=4)),
        st.tuples(st.just("pos_delete"), st.integers(0, 99)),
        st.tuples(st.just("dv_delete"), st.integers(0, 99)),
        st.tuples(
            st.just("merge_mor"),
            st.lists(
                st.tuples(st.integers(0, 25), st.integers(200, 299)),
                min_size=1, max_size=4, unique_by=lambda t: t[0],
            ),
        ),
        st.tuples(st.just("update"), st.integers(0, 99)),
        st.tuples(st.just("fold"), st.none()),
        st.tuples(st.just("compact"), st.none()),
        st.tuples(st.just("relayout"), st.none()),
    ),
    max_size=5,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=_ft_rows, ops=_ft_ops)
def test_filetable_verb_sequences_match_python_replica(spark, tmp_path_factory, seed, ops):
    """Oracle-independent cross-verb consistency: run a random legal
    sequence of commits (append / CoW delete / MOR equality delete /
    MOR position delete / DV delete / MOR merge upsert / fold / compact) against a file-grain table AND
    a 10-line Python
    replica of row state; the served rows must be the replica's multiset
    at every step. MOR semantics in the replica: a delete removes
    matching CURRENT rows only — a later append re-adds (the seq rule);
    fold/compact are replica no-ops (layout-only). The CoW-verbs-require-
    fold protocol is part of the model: the driver folds first when
    deletes are live, exactly what the guard enforces."""
    from spark_iceberg_jobs_spark.sources import filetable as ft

    td = str(tmp_path_factory.mktemp("ftprop") / "t")
    mk = lambda rows: spark.createDataFrame(rows, "k long, d long")
    ft.create_table(mk(seed), td, stats_cols=["d"], cluster_by="d", n_files=2)
    replica = list(seed)

    def deletes_live():
        return any(
            e.get("kind", "data") != "data"
            for e in ft.read_manifest(td)["entries"]
        )

    def eq_pos_live():
        # r13: file-local DVs COMPOSE with compaction (folded inline per
        # rewritten bin); only cross-file eq/pos deletes force the fold
        return any(
            e.get("kind") in ("eqdelete", "posdelete")
            for e in ft.read_manifest(td)["entries"]
        )

    for op, arg in ops:
        if op == "append":
            ft.append_table(mk(arg), td, n_files=1)
            replica.extend(arg)
        elif op == "cow_delete":
            if deletes_live():
                ft.fold_deletes(spark, td)
            ft.delete_where(spark, td, "d", arg)
            replica = [(k, d) for k, d in replica if d > arg]
        elif op == "mor_delete":
            ft.delete_keys_mor(
                spark, td, "k", spark.createDataFrame([(k,) for k in arg], "k long")
            )
            replica = [(k, d) for k, d in replica if k not in set(arg)]
        elif op == "pos_delete":
            from pyspark.sql import functions as _F

            ft.delete_positions_mor(spark, td, _F.col("d") >= arg)
            replica = [(k, d) for k, d in replica if d < arg]
        elif op == "dv_delete":
            from pyspark.sql import functions as _F

            # deletion-vector flavor: same semantics as pos_delete,
            # different physical plan (merged per-file vectors)
            ft.delete_positions_dv(spark, td, _F.col("d") >= arg)
            replica = [(k, d) for k, d in replica if d < arg]
        elif op == "merge_mor":
            from pyspark.sql import functions as _F

            # MOR MERGE upsert: every matched row's d takes the source
            # value (multiplicity preserved); unmatched keys insert.
            # Stacks against whatever MOR state is live — no fold.
            src = spark.createDataFrame(arg, "mk long, md long")
            ft.merge_into_mor(
                spark, td, src, on=("k", "mk"),
                when_matched_update={"d": _F.col("s.md")},
                when_not_matched_insert={
                    "k": _F.col("s.mk"), "d": _F.col("s.md")
                },
            )
            m = dict(arg)
            present = {k for k, _d in replica}
            replica = [(k, m.get(k, d)) for k, d in replica]
            replica += [(k, d) for k, d in arg if k not in present]
        elif op == "update":
            from pyspark.sql import functions as _F

            if deletes_live():
                ft.fold_deletes(spark, td)
            ft.update_where(spark, td, "d", arg, {"k": _F.col("k") + 100})
            replica = [(k + 100 if d <= arg else k, d) for k, d in replica]
        elif op == "fold":
            ft.fold_deletes(spark, td)
        elif op == "compact":
            if eq_pos_live():
                ft.fold_deletes(spark, td)
            # live DVs ride through: rewritten bins fold them inline,
            # untouched files carry them (replica no-op either way)
            ft.compact_table(spark, td, target_bytes=1 << 16)
        elif op == "relayout":
            from pyspark.sql import functions as _F

            # full rewrite folds EVERY live delete flavor inline (r13) —
            # never pre-fold; visible rows are the replica's either way
            ft.rewrite_layout(
                spark, td, cluster_expr=_F.col("d"), stats_cols=["d"], n_files=2
            )
        got = sorted((r["k"], r["d"]) for r in ft.read_table(spark, td).collect())
        assert got == sorted(replica), f"diverged after {op}"


_bloom_vals = st.lists(st.integers(0, 400), min_size=5, max_size=40)
_bloom_probes = st.lists(st.integers(0, 500), min_size=1, max_size=8)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=_bloom_vals, probes=_bloom_probes)
def test_filetable_bloom_lookup_never_loses_rows(spark, tmp_path_factory, vals, probes):
    """Bloom soundness property: for ANY table contents and ANY probe
    set (present or absent), the bloom-pruned point lookup returns
    exactly the rows an exact filter does — false positives only ever
    cost a read, false negatives are impossible."""
    from spark_iceberg_jobs_spark.sources import filetable as ft

    td = str(tmp_path_factory.mktemp("bloomprop") / "t")
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "rid long, v long"
    )
    ft.create_table(df, td, stats_cols=["rid"], cluster_by="rid", n_files=3)
    ft.build_bloom_index(spark, td, "v", bits=1 << 10)
    got = sorted(
        (r["rid"], r["v"])
        for r in ft.point_lookup(spark, td, "v", probes).collect()
    )
    want = sorted((i, v) for i, v in enumerate(vals) if v in set(probes))
    assert got == want


# ---------------------------------------------------------------------------
# schema-evolution property: random evolution histories resolve by field id
# ---------------------------------------------------------------------------

_evo_ops = st.lists(
    st.one_of(
        st.tuples(st.just("add"), st.integers(0, 3)),
        st.tuples(st.just("rename"), st.integers(0, 5)),
        st.tuples(st.just("drop"), st.integers(0, 5)),
        st.tuples(st.just("append"), st.integers(1, 4)),
    ),
    max_size=6,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=_evo_ops)
def test_filetable_schema_evolution_matches_id_keyed_replica(
    spark, tmp_path_factory, ops
):
    """Any legal sequence of add/rename/drop/append resolves reads by
    FIELD ID exactly like a Python replica that stores rows as
    {field_id: value}: renamed columns keep their values, added columns
    backfill None for older rows, dropped columns vanish — across every
    generation in one frame."""
    from spark_iceberg_jobs_spark.sources import filetable as ft

    td = str(tmp_path_factory.mktemp("evoprop") / "t")
    df = spark.createDataFrame([(0, 100), (1, 101)], "d long, v long")
    ft.create_table(df, td, stats_cols=["d"], cluster_by="d", n_files=1)
    # replica: field registry by id + rows as {id: value}
    fields = {1: "d", 2: "v"}  # id -> current name (matches create order)
    next_id = 3
    rows = [{1: 0, 2: 100}, {1: 1, 2: 101}]
    next_d = 10

    for op, arg in ops:
        names = list(fields.values())
        if op == "add":
            name = f"c{next_id}"
            ft.add_column(td, name, "long")
            fields[next_id] = name
            next_id += 1
        elif op == "rename":
            # never rename the stats column 'd' (scan planning key)
            cands = [i for i, n in fields.items() if n != "d"]
            if not cands:
                continue
            fid = cands[arg % len(cands)]
            new = f"r{fid}_{arg}"
            if new in fields.values():
                continue
            ft.rename_column(td, fields[fid], new)
            fields[fid] = new
        elif op == "drop":
            cands = [i for i, n in fields.items() if n != "d"]
            if not cands:
                continue
            fid = cands[arg % len(cands)]
            ft.drop_column(td, fields[fid])
            del fields[fid]
        elif op == "append":
            batch_rows = []
            for j in range(arg):
                r = {fid: next_d * 1000 + j * 7 + fid for fid in fields}
                r[1] = next_d + j  # keep the stats col sane/unique
                batch_rows.append(r)
            next_d += arg
            data = [tuple(r[fid] for fid in fields) for r in batch_rows]
            ddl = ", ".join(f"{n} long" for n in fields.values())
            ft.append_table(spark.createDataFrame(data, ddl), td, n_files=1)
            rows.extend(batch_rows)

    served = ft.read_table(spark, td)
    assert list(served.columns) == list(fields.values())
    got = sorted(
        tuple(r[n] for n in fields.values()) for r in served.collect()
    )
    want = sorted(tuple(r.get(fid) for fid in fields) for r in rows)
    assert got == want


# ---------------------------------------------------------------------------
# r11 manifest-delta changelog + incremental-feed properties: both new
# surfaces replay against the same style of trivial Python replica
# ---------------------------------------------------------------------------

_cdf_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), _ft_rows),
        st.tuples(st.just("cow_delete"), st.integers(0, 99)),
        st.tuples(st.just("cow_update"), st.integers(0, 99)),
        st.tuples(st.just("import"), _ft_rows),
        st.tuples(st.just("compact"), st.none()),
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=_ft_rows, ops=_cdf_ops)
def test_changelog_table_matches_replica_snapshot_diffs(
    spark, tmp_path_factory, seed, ops
):
    """Manifest-delta CDF property: for ANY commit history of appends /
    CoW deletes / compactions and ANY version pair (i, j), the
    changelog equals the multiset difference of the replica's snapshots
    — inserts = snap(j) ∖ snap(i), deletes = snap(i) ∖ snap(j) — even
    though only the delta files were read. Compaction commits must
    contribute NOTHING to any changelog that spans them (rows are
    invariant), which is exactly what the added∖removed cancellation
    guarantees and a lineage-tracking bug would break."""
    from collections import Counter

    from spark_iceberg_jobs_spark.sources import filetable as ft

    import os as _os

    td = str(tmp_path_factory.mktemp("cdfprop") / "t")
    mk = lambda rows: spark.createDataFrame(rows, "k long, d long")
    ft.create_table(mk(seed), td, stats_cols=["d"], cluster_by="d", n_files=2)
    snaps = {1: Counter(seed)}
    replica = list(seed)
    v = 1
    for i, (op, arg) in enumerate(ops):
        if op == "append":
            ft.append_table(mk(arg), td, n_files=1)
            replica = replica + list(arg)
        elif op == "cow_delete":
            ft.delete_where(spark, td, "d", arg)
            replica = [(k, d) for k, d in replica if d > arg]
        elif op == "cow_update":
            from pyspark.sql import functions as _F

            ft.update_where(spark, td, "d", arg, {"k": _F.col("k") + 1000})
            replica = [(k + 1000 if d <= arg else k, d) for k, d in replica]
        elif op == "import":
            sub = _os.path.join("data", f"imp{i}")
            mk(arg).coalesce(1).write.parquet(_os.path.join(td, sub))
            ft.add_files(spark, td, sub)
            replica = replica + list(arg)
        else:
            ft.compact_table(spark, td, target_bytes=1 << 16)
        v += 1
        snaps[v] = Counter(replica)
    pairs = [(1, v)] + ([(2, v), (1, 2)] if v > 2 else [])
    for i, j in pairs:
        ch = ft.changelog_table(spark, td, i, j).collect()
        got_ins = Counter((r["k"], r["d"]) for r in ch if r["_change_type"] == "insert")
        got_del = Counter((r["k"], r["d"]) for r in ch if r["_change_type"] == "delete")
        assert got_ins == snaps[j] - snaps[i], f"inserts diverge for {(i, j)}"
        assert got_del == snaps[i] - snaps[j], f"deletes diverge for {(i, j)}"


_feed_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), _ft_rows),
        st.tuples(st.just("import"), _ft_rows),
        st.tuples(st.just("compact"), st.none()),
    ),
    min_size=1,
    max_size=5,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=_ft_rows, ops=_feed_ops, keep=st.integers(1, 3))
def test_incremental_feed_exactly_once_under_expiry(
    spark, tmp_path_factory, seed, ops, keep
):
    """Incremental-feed property: for ANY append/compact history and ANY
    retention depth, bootstrap + deltas (replace commits skipped) yield
    every live row EXACTLY once — the multiset union of the consumed
    batches equals the final table, never more (double-count), never
    less (lost batch)."""
    from collections import Counter

    from spark_iceberg_jobs_spark.sources import filetable as ft

    import os as _os

    td = str(tmp_path_factory.mktemp("feedprop") / "t")
    mk = lambda rows: spark.createDataFrame(rows, "k long, d long")
    ft.create_table(mk(seed), td, stats_cols=["d"], cluster_by="d", n_files=2)
    replica = list(seed)
    for i, (op, arg) in enumerate(ops):
        if op == "append":
            ft.append_table(mk(arg), td, n_files=1)
            replica = replica + list(arg)
        elif op == "import":
            sub = _os.path.join("data", f"imp{i}")
            mk(arg).coalesce(1).write.parquet(_os.path.join(td, sub))
            ft.add_files(spark, td, sub)
            replica = replica + list(arg)
        else:
            ft.compact_table(spark, td, target_bytes=1 << 16)
    ft.expire_table(td, keep_last=keep)

    def ingest(batches):
        c = Counter()
        for batch in batches:
            for r in (
                spark.read.parquet(*batch["paths"]).collect() if batch["paths"] else []
            ):
                c[(r["k"], r["d"])] += 1
        return c

    feed = ft.incremental_feed(td)
    assert ingest(feed) == Counter(replica), "feed must be exactly-once"
    # checkpointed resume at EVERY split point: prefix ⊎ resume == table
    for i in range(len(feed)):
        ckpt = feed[i]["version"]
        resumed = ft.incremental_feed(td, since_version=ckpt)
        assert [b["version"] for b in resumed] == [
            b["version"] for b in feed[i + 1 :]
        ], f"resume at {ckpt} must continue the same chain"
        assert ingest(feed[: i + 1]) + ingest(resumed) == Counter(replica), (
            f"cross-session exactly-once broken at checkpoint {ckpt}"
        )


_spj_left = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 999)), min_size=1, max_size=30
)
_spj_right = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 9)),
    min_size=1,
    max_size=12,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=_spj_left, right=_spj_right, n_buckets=st.integers(2, 6))
def test_storage_partitioned_join_matches_plain_join(
    spark, tmp_path_factory, left, right, n_buckets
):
    """For ANY contents and ANY shared bucket count, the bucket-aligned
    manifest join returns exactly the rows of a plain shuffled inner
    join — multiplicities included (both sides may repeat keys)."""
    from spark_iceberg_jobs_spark.sources import filetable as ft

    base = tmp_path_factory.mktemp("spjprop")
    ta, tb = str(base / "a"), str(base / "b")
    a = spark.createDataFrame(left, "k long, v long")
    b = spark.createDataFrame(right, "k2 long, w long")
    ft.create_table(a, ta, stats_cols=["v"], bucket_by=("k", n_buckets))
    ft.create_table(b, tb, stats_cols=["w"], bucket_by=("k2", n_buckets))
    got = sorted(
        (r["k"], r["v"], r["w"])
        for r in ft.storage_partitioned_join(spark, ta, tb, on=("k", "k2")).collect()
    )
    rm = {}
    for k, w in right:
        rm.setdefault(k, []).append(w)
    want = sorted((k, v, w) for k, v in left for w in rm.get(k, []))
    assert got == want
