"""Named query registry — the single source of truth for __spark_entry__.

Each entry pairs a PySpark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL oracle string for DuckDB (or ``None`` for ops DuckDB
cannot express — LSH, streaming — which get a rows-only check).

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


def _merged() -> dict[str, QuerySpec]:
    from . import core, events, llm  # local import to avoid cycles

    out: dict[str, QuerySpec] = {}
    for mod in (core, llm, events):
        dup = out.keys() & mod.QUERIES.keys()
        if dup:
            raise ValueError(f"duplicate query names: {sorted(dup)}")
        out.update(mod.QUERIES)
    return out


def registry() -> dict[str, QuerySpec]:
    return _merged()
