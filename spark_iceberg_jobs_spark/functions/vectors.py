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
