"""Iterative gradient-descent model fitting as Spark dataflow.

``logreg_fit`` is the distributed-training primitive the closed-form OLS
query (queries/ml.ml_ols_price_model) cannot cover: models whose loss has no
closed form train by synchronous full-batch gradient descent — the
map-reduce formulation every parameter-server/allreduce trainer degenerates
to at one model replica. Per round: the current weights are embedded as
LITERALS in a single aggregation (one scan, partial-aggregated map-side, an
exchange of one row of d doubles), the driver applies the update, repeat.
Nothing driver-side ever exceeds d doubles, and the per-round plan is a
scan + HashAggregate — no joins, no windows, no Python in the hot path.

Determinism contract (what makes the fit DuckDB-replayable): the link is
the RATIONAL fast sigmoid sigma(z) = 0.5 * (1 + z / (1 + |z|)) — algebraic
in +,*,/,abs, so both engines evaluate it bit-identically (libm exp()
differs in last-ulp across implementations, which 5 amplification rounds
could surface); iteration count and learning rate are FIXED; weights start
at zero. The oracle unrolls the same rounds as chained MATERIALIZED CTEs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fast_sigmoid(z: Column) -> Column:
    """sigma(z) = 0.5 * (1 + z / (1 + |z|)) — the rational sigmoid.

    Monotone, bounded to (0, 1), sigma(0) = 0.5, and exactly reproducible
    in any engine with IEEE doubles (no transcendental calls).
    """
    return F.lit(0.5) * (F.lit(1.0) + z / (F.lit(1.0) + F.abs(z)))


def logreg_fit(
    features: DataFrame,
    *,
    label_col: str,
    feature_cols: list[str],
    iterations: int = 5,
    lr: float = 1.0,
) -> list[float]:
    """Full-batch gradient-descent logistic regression (fast-sigmoid link).

    ``features`` must carry a 0/1 ``label_col`` and double ``feature_cols``
    (pre-scaled to O(1) magnitude — GD conditioning is the caller's job).
    Returns ``[bias, w_1, ..., w_d]``.

    Each round computes grad_j = AVG((sigma(z) - y) * x_j) for every
    feature plus the bias in ONE aggregation with the current weights as
    literals — the same driver-resident-parameters pattern as
    similarity.kmeans_fit, with a d+1-double exchange per round.
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    if not feature_cols:
        raise ValueError("need at least one feature column")
    if lr <= 0.0:
        raise ValueError(f"lr must be > 0, got {lr}")
    d = len(feature_cols)
    w = [0.0] * (d + 1)  # [bias, w_1, ..., w_d]
    for _ in range(iterations):
        z = F.lit(w[0])
        for j, c in enumerate(feature_cols):
            z = z + F.lit(w[j + 1]) * F.col(c)
        resid = fast_sigmoid(z) - F.col(label_col)
        aggs = [F.avg(resid).alias("g0")] + [
            F.avg(resid * F.col(c)).alias(f"g{j + 1}")
            for j, c in enumerate(feature_cols)
        ]
        row = features.agg(*aggs).collect()[0]
        w = [w[j] - lr * row[f"g{j}"] for j in range(d + 1)]
    return w


def logreg_predict(features: DataFrame, w: list[float], feature_cols: list[str]) -> Column:
    """The fitted model's probability column over ``features``."""
    z = F.lit(w[0])
    for j, c in enumerate(feature_cols):
        z = z + F.lit(w[j + 1]) * F.col(c)
    return fast_sigmoid(z)
