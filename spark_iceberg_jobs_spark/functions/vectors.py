"""Vector math over ``array<float|double>`` columns (X3/X5).

All pure Spark higher-order functions (zip_with / aggregate) — JVM-side,
no Python round-trips, and a deterministic left-to-right fold so results are
reproducible and comparable to a sequential oracle.

Scale path: these expressions are fine for brute-force scoring of millions of
candidates; for billions, bucket candidates first (LSH — operators/similarity
.lsh_bucket_signature) or pre-reduce with an IVF-style coarse quantizer, then
apply these within buckets. If profiling shows the fold dominating, swap in a
vectorized Pandas UDF (numpy dot over Arrow batches) with identical semantics.
"""

from __future__ import annotations

import pandas as pd  # module scope: pandas_udf resolves pd.Series type hints

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as a sequential double fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero vectors (returns NULL)."""
    d = norm(a) * norm(b)
    return F.when(d != 0, dot(a, b) / d)


_COSINE_ARROW = None


def cosine_arrow(a: Column, b: Column) -> Column:
    """Arrow-vectorized cosine for HIGH-VOLUME pairwise scoring.

    The HOF fold above runs interpreted (no whole-stage codegen) — fine for
    thousands of scores, dominant at millions (measured ~20x slower than
    this numpy path on the SRP candidate stream). Each Arrow batch converts
    to a dense (batch, dim) float64 matrix and scores with vectorized
    numpy; per-row math is independent of batch/partition boundaries, so
    results are deterministic run-to-run. Built lazily so importing this
    module never constructs UDF state before a session exists.
    """
    global _COSINE_ARROW
    if _COSINE_ARROW is None:
        import numpy as np

        @F.pandas_udf("double")
        def _cos(xs: pd.Series, ys: pd.Series) -> pd.Series:
            if len(xs) == 0:
                return pd.Series([], dtype="float64")
            A = np.asarray(xs.tolist(), dtype=np.float64)
            B = np.asarray(ys.tolist(), dtype=np.float64)
            dots = (A * B).sum(axis=1)
            d = np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
            out = np.where(d != 0, dots / np.where(d == 0, 1.0, d), np.nan)
            return pd.Series(out)

        # The function IS pure; the flag is an optimizer hint. Without it,
        # CollapseProject substitutes the UDF call into every consumer —
        # a filter + a projection on the score spawns TWO ArrowEvalPython
        # nodes scoring every candidate twice (observed in the SRP plan).
        _COSINE_ARROW = _cos.asNondeterministic()
    return _COSINE_ARROW(a, b)
