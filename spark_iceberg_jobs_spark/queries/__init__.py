"""Named query registry — the single source of truth for __spark_entry__.

Each entry pairs a PySpark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL oracle string for DuckDB (or ``None`` for ops DuckDB
cannot express, which get a rows-only check; as of round 2 every registered
query has an oracle — the sketch tier via portable md5-based hashing).

Registration is decentralized: each module in this package exposes
``QUERIES: dict[str, QuerySpec]`` and is merged here.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable SQL, or None → rows-only check
    headline: bool = False  # included in bench.py timings


# The driver's correctness gate scores only the FIRST 50 registry entries,
# so registry order is a coverage decision (VERDICT r1 item 2): the whole
# LLM-pipeline tier and the whole events/streaming tier go first — in round
# 1 they rode entirely outside the window — then as many core queries as fit,
# highest-distinct-physical-pattern first. The core long-tail (driver-
# verified green in round 1, re-verified every round by tools/
# verify_local.py) rides after the window.
DRIVER_WINDOW = 50

_CORE_PRIORITY = [
    "flagship_revenue_topk",  # broadcast dims + AQE SMJ + TakeOrdered
    "q1_pricing_summary",  # wide partial+final aggregation
    "q3_shipping_priority",  # multiway equi join
    "copartitioned_join_agg",  # bucketed shuffle-free join
    "salted_join_agg",  # skew-salted join
    "pandas_udf_revenue",  # Arrow pandas-UDF path
    "a1_top_customer_by_avg_quantity",  # reference README analytics
    "a2_top_orderpriority",
    "a3_top_region_by_orders",
    "a4_brand_quantity_by_nation",
    "window_top3_orders_per_customer",  # partitioned ranking window
    "sort_global_topk",  # TakeOrderedAndProject
]


def _merged() -> dict[str, QuerySpec]:
    from . import core, events, llm, ml, tpch_tail  # local import to avoid cycles

    pool: dict[str, QuerySpec] = {}
    for mod in (core, llm, events, ml, tpch_tail):
        # EXTRA_QUERIES: verified like QUERIES, but never head-eligible
        for queries in (mod.QUERIES, getattr(mod, "EXTRA_QUERIES", {})):
            dup = pool.keys() & queries.keys()
            if dup:
                raise ValueError(f"duplicate query names: {sorted(dup)}")
            pool.update(queries)

    head = list(llm.QUERIES) + list(events.QUERIES)
    slots = DRIVER_WINDOW - len(head)
    if slots < 0:
        raise ValueError(f"llm+events tiers ({len(head)}) overflow the {DRIVER_WINDOW}-entry driver window")
    head += [n for n in _CORE_PRIORITY if n in pool][:slots]

    out = {n: pool[n] for n in head}
    out.update({n: s for n, s in pool.items() if n not in out})
    return out


def registry() -> dict[str, QuerySpec]:
    return _merged()
