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
# so registry order is a coverage decision. Rotation history:
#   r1: core tier scored (llm/events rode outside — VERDICT r1 item 2).
#   r2: llm (32) + events (17) + flagship filled the window; all 49 new
#       entries came back green (2 oracle-typing bugs, fixed this round).
#   r3 (VERDICT r2 item 3): rotate the never-driver-scored tpch_tail (13)
#       and ml (4) tiers INTO the window, keep the whole events tier (the
#       two fixed queries must be re-scored as regression proof) plus
#       flagship, and retain one llm representative per operator family
#       (15). The 17 llm entries rotated out are r2-driver-green and stay
#       re-verified every round by tools/verify_local.py.
DRIVER_WINDOW = 50

# One representative per LLM-pipeline operator family stays in-window so a
# regression in any family's shared machinery is still driver-visible.
_LLM_WINDOW_KEEPS = [
    "pipeline_corpus_curation",  # quality gate + dedup + anti-join composite
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",  # pointer-jumping connected components
    "dedup_embedding_cosine_bucketed",  # SRP-bucketed embedding near-dup
    "decontaminate_eval_overlap",
    "dedup_incremental_batch",
    "sim_bruteforce_topk",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "text_tfidf_top_terms",  # shared tokenize/explode/agg machinery
    "multimodal_image_decode",
    "multimodal_audio_decode",
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

    head = (
        list(events.QUERIES)
        + list(tpch_tail.QUERIES)
        + list(ml.QUERIES)
        + ["flagship_revenue_topk"]
        + _LLM_WINDOW_KEEPS
    )
    missing = [n for n in head if n not in pool]
    if missing:
        raise ValueError(f"window entries not in pool: {missing}")
    if len(head) != len(set(head)):
        raise ValueError("duplicate names in driver-window head")
    if len(head) > DRIVER_WINDOW:
        raise ValueError(
            f"curated head ({len(head)}) overflows the {DRIVER_WINDOW}-entry driver window"
        )

    out = {n: pool[n] for n in head}
    out.update({n: s for n, s in pool.items() if n not in out})
    return out


def registry() -> dict[str, QuerySpec]:
    return _merged()
