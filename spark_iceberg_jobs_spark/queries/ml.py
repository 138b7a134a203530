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


def _kmeans_chain(k: int, iterations: int, *, extra_assign: bool) -> str:
    """The WITH-body CTE chain replaying kmeans_fit in exploded space.

    Round r: d{r} = squared-L2 of every (vector, cell) pair against c{r-1};
    a{r} = argmin with (dist, cell) tie-break — identical to assign_cells's
    array_min over (d, i) structs; c{r} = per-(cell, dim) member means.
    ``extra_assign`` appends round iterations+1's d/a pair (the final
    assignment against the fitted centroids) without a further update.
    """
    rounds = []
    last = iterations + 1 if extra_assign else iterations
    for r in range(1, last + 1):
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
    return f"""ev AS (
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
{chain}"""


def _kmeans_oracle_sql(k: int = _K, iterations: int = _ITERATIONS) -> str:
    """kmeans_fit replay + final assignment stats."""
    return f"""
WITH {_kmeans_chain(k, iterations, extra_assign=True)}
SELECT cell, COUNT(*) AS n_vectors, ROUND(AVG(dist), 4) AS mean_sq_dist
FROM a{iterations + 1}
GROUP BY cell
ORDER BY cell
"""


KMEANS_ORACLE = _kmeans_oracle_sql()


def sim_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION ANN path end-to-end: k-means-fitted centroids feeding
    IVF search (ivf_topk's ``centroids`` parameter) — coarse-quantize the
    corpus by fitted cell, search each probe in its nprobe nearest cells,
    exact-cosine rerank. Hash-verified: the oracle replays the k-means fit
    AND the IVF search. Scale shape is ivf_topk's (corpus scored once
    against broadcast centroids; per-probe work bounded by nprobe cells)
    on top of kmeans_fit's (projection-only assignment rounds)."""
    from ..operators.similarity import centroids_df, ivf_topk

    emb = read_fixture(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, k=_K, iterations=_ITERATIONS, dim=_DIM)
    probes = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(
        emb, probes, k=5, nprobe=3, centroids=centroids_df(spark, cents)
    )


def _ivf_kmeans_oracle_sql(k: int = _K, iterations: int = _ITERATIONS, nprobe: int = 3) -> str:
    """kmeans_fit replay → centroid arrays → the same IVF search replay as
    SIM_IVF_ORACLE (queries/llm.py), cosine ranking with (sim, id)
    tie-breaks."""
    return f"""
WITH {_kmeans_chain(k, iterations, extra_assign=False)},
cent AS (
    SELECT cell, LIST(cval ORDER BY dim) AS centv
    FROM c{iterations} GROUP BY cell
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
corpus_scored AS (
    SELECT e.vec_id, c.cell,
           LIST_INNER_PRODUCT(e.v, c.centv)
           / (SQRT(LIST_INNER_PRODUCT(e.v, e.v))
              * SQRT(LIST_INNER_PRODUCT(c.centv, c.centv))) AS csim
    FROM e CROSS JOIN cent c
),
assigned AS (
    SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS r
        FROM corpus_scored
    ) WHERE r = 1
),
probe_cells AS (
    SELECT vec_id AS probe_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS r
        FROM corpus_scored WHERE vec_id < 10
    ) WHERE r <= {nprobe}
),
cands AS (
    SELECT pc.probe_id, a.vec_id AS neighbor_id
    FROM assigned a JOIN probe_cells pc ON a.cell = pc.cell
    WHERE a.vec_id <> pc.probe_id
    GROUP BY 1, 2
),
scored AS (
    SELECT cd.probe_id, cd.neighbor_id,
           LIST_INNER_PRODUCT(ep.v, ec.v)
           / (SQRT(LIST_INNER_PRODUCT(ep.v, ep.v))
              * SQRT(LIST_INNER_PRODUCT(ec.v, ec.v))) AS sim
    FROM cands cd
    JOIN e ep ON ep.vec_id = cd.probe_id
    JOIN e ec ON ec.vec_id = cd.neighbor_id
),
ranked AS (
    SELECT probe_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY probe_id
                              ORDER BY sim DESC, neighbor_id) AS rnk,
           sim
    FROM scored
)
SELECT probe_id, neighbor_id, rnk, ROUND(sim, 4) AS sim
FROM ranked
WHERE rnk <= 5
"""


IVF_KMEANS_ORACLE = _ivf_kmeans_oracle_sql()


QUERIES: dict[str, QuerySpec] = {
    "cluster_kmeans_embeddings": QuerySpec(cluster_kmeans_embeddings, KMEANS_ORACLE),
    "sim_ivf_kmeans_topk": QuerySpec(sim_ivf_kmeans_topk, IVF_KMEANS_ORACLE),
}
