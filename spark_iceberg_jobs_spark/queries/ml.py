"""Clustering tier — iterative ML fitting as Spark dataflow, DuckDB-replayable.

``cluster_kmeans_embeddings`` runs the full Lloyd's loop
(operators/similarity.kmeans_fit): md5-seeded init → fixed rounds of
(projection-only assignment, narrow per-dim-mean update) → final assignment
stats. The oracle unrolls the SAME rounds as chained CTEs in exploded
(vec_id, dim, val) space — seeding order, argmin tie-breaks, and means all
replay bit-compatibly, so the driver hash-verifies an *iterative ML fit*
end-to-end, like queries/llm.py does for PageRank.

This module rides OUTSIDE the driver's 50-entry correctness window (the
llm + events tiers fill it — queries/__init__.py); tools/verify_local.py
covers it every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import as_double
from ..operators.similarity import assign_cells, kmeans_fit
from ..sources.readers import read_fixture
from . import QuerySpec

_K = 8
_ITERATIONS = 3
_DIM = 64


def cluster_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means cluster profile of the embeddings corpus: per cell, the
    member count and mean squared distance to the fitted centroid.

    Scale: each of the 3 fit rounds is one scan (literal-centroid argmin
    projection) + one k x dim partial-mean shuffle; the final stats pass is
    the same scan + a k-group aggregate. Nothing driver-side ever exceeds
    k x dim doubles.
    """
    emb = read_fixture(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, k=_K, iterations=_ITERATIONS, dim=_DIM)
    e = emb.select(F.col("vec_id").alias("cid"), as_double("embedding").alias("v"))
    return (
        assign_cells(e, cents)
        .groupBy("cell")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("dist"), 4).alias("mean_sq_dist"),
        )
        .orderBy("cell")
    )


def _kmeans_oracle_sql(k: int = _K, iterations: int = _ITERATIONS) -> str:
    """Unrolled-CTE replay of kmeans_fit + the final assignment stats.

    Round r: d{r} = squared-L2 of every (vector, cell) pair against c{r-1}
    in exploded space; a{r} = argmin with (dist, cell) tie-break — identical
    to assign_cells's array_min over (d, i) structs; c{r} = per-(cell, dim)
    member means. The final stats aggregate a{iterations+1}.
    """
    rounds = []
    for r in range(1, iterations + 2):
        rounds.append(
            f"""d{r} AS (
    SELECT e.vec_id, c.cell,
           SUM((e.val - c.cval) * (e.val - c.cval)) AS dist
    FROM ev e JOIN c{r - 1} c ON e.dim = c.dim
    GROUP BY e.vec_id, c.cell
), a{r} AS (
    SELECT vec_id, cell, dist FROM (
        SELECT vec_id, cell, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cell) AS rn
        FROM d{r}
    ) WHERE rn = 1
)"""
        )
        if r <= iterations:
            rounds.append(
                f"""c{r} AS (
    SELECT a.cell, e.dim, AVG(e.val) AS cval
    FROM a{r} a JOIN ev e ON a.vec_id = e.vec_id
    GROUP BY a.cell, e.dim
)"""
            )
    chain = ",\n".join(rounds)
    return f"""
WITH ev AS (
    SELECT vec_id,
           UNNEST(CAST(embedding AS DOUBLE[])) AS val,
           GENERATE_SUBSCRIPTS(CAST(embedding AS DOUBLE[]), 1) AS dim
    FROM embeddings
), init AS (
    SELECT vec_id, rn - 1 AS cell FROM (
        SELECT vec_id,
               ROW_NUMBER() OVER (ORDER BY MD5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM embeddings
    ) WHERE rn <= {k}
), c0 AS (
    SELECT i.cell, e.dim, e.val AS cval
    FROM init i JOIN ev e ON i.vec_id = e.vec_id
),
{chain}
SELECT cell, COUNT(*) AS n_vectors, ROUND(AVG(dist), 4) AS mean_sq_dist
FROM a{iterations + 1}
GROUP BY cell
ORDER BY cell
"""


KMEANS_ORACLE = _kmeans_oracle_sql()


QUERIES: dict[str, QuerySpec] = {
    "cluster_kmeans_embeddings": QuerySpec(cluster_kmeans_embeddings, KMEANS_ORACLE),
}
