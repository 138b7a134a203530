"""Iterative graph algorithms over edge DataFrames.

Two fixpoint families live in this package: label propagation (connected
components, operators/dedup.py — min-label with pointer jumping) and the
numeric fixpoint here (PageRank). Both use the one pattern where Spark
needs a bounded DRIVER-SIDE loop; every round is a shuffle-keyed
join+groupBy, so per-round cost is O(edges) and rounds are a small
constant — nothing is ever collected to the driver.

Scale notes:
- The edge list is persisted once (it feeds every round) and the rank
  table is localCheckpoint'ed per round: iterative self-reference
  otherwise compounds the logical plan each iteration, blowing up
  analysis time long before data does.
- A FIXED iteration count (rather than convergence detection) keeps the
  operator deterministic and SQL-replayable: the DuckDB oracle unrolls
  the same k rounds as chained CTEs and must agree to the rounding digit.

Reference parity: the reference repo has no graph operators (its surface is
CSV→Iceberg ingestion, job1; README.md:13-26); this extends the
LLM-pipeline tier the driver brief mandates (entity-influence weighting for
source curation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cache import release, scoped_persist


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank on an UNDIRECTED graph (edges are symmetrized, so every
    node has out-degree ≥ 1 — no dangling-mass correction needed).

    Uses the damped per-node form r' = (1-d) + d·Σ_in r/deg with r₀ = 1,
    a fixed ``iterations`` count, and full double precision until the
    caller rounds — identical to the unrolled-CTE oracle replay.
    Returns (node, rank).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    sym = scoped_persist(
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    )
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    # (src, dst, deg_src) is loop-invariant: build it once, persist it once
    out = scoped_persist(sym.join(deg, "src"))
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("r"))
    for _ in range(iterations):
        contrib = (
            out.join(ranks, out.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("deg")).alias("mass"))
        )
        ranks = (
            contrib.select(
                F.col("dst").alias("node"),
                (F.lit(1.0 - damping) + F.lit(damping) * F.col("mass")).alias("r"),
            )
            # truncate lineage each round — the plan would otherwise nest
            # one join+agg deeper per iteration
            .localCheckpoint()
        )
    release(sym)
    release(out)  # ranks is checkpointed — nothing re-reads these caches
    return ranks.select("node", F.col("r").alias("rank"))
