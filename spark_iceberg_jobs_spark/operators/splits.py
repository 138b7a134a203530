"""Deterministic dataset splitting, sampling, and sequence packing
(training-data pipeline ops).

A 100 TB training corpus needs its train/val/test assignment to be a pure
FUNCTION of the record key — never a random() call (irreproducible, changes
on retry/backfill) and never a global sort/shuffle (a split is a stateless
row-local decision). Both operators here hash the key with md5 and compare a
fixed-width hex prefix against precomputed thresholds:

- one md5 per row, codegen'd JVM-side, zero shuffles — the split/sample is
  a narrow projection/filter that fuses into whatever scan feeds it;
- adding data later never reassigns existing rows (stability under append);
- the same assignment is recomputable in ANY engine with md5 (DuckDB
  oracle replays it bit-for-bit — same portability trick as the LSH tier).

Reference parity: the reference repo has no splitting ops (its surface is
ingestion; README.md:13-26); these extend the LLM-pipeline tier the driver
brief mandates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.texts import token_count

_PREFIX_LEN = 8  # 8 hex chars = 32 bits: rate resolution ~2.3e-10, plenty


def _hex_threshold(rate: float) -> str:
    """Largest 8-hex-digit string such that a uniform hash prefix is below
    it with probability ``rate`` (exact at 1/2^32 granularity)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(int(rate * (1 << 32)), "08x")


def _hash_prefix(key: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string"))), 1, _PREFIX_LEN)


def assign_split(
    df: DataFrame,
    *,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Attach a deterministic split label: each row lands in a split with
    probability proportional to its weight, decided solely by
    md5(salt:key) — reproducible across runs, engines, and appends.

    ``weights`` preserves insertion order; cumulative thresholds are
    precomputed driver-side so the row expression is a single hash + a
    CASE over string comparisons (whole-stage codegen, no shuffle).
    """
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    h = _hash_prefix(F.col(key_col), salt)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = h < F.lit(_hex_threshold(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return df.withColumn(out_col, last if expr is None else expr.otherwise(last))


def stratified_sample(
    df: DataFrame,
    *,
    key_col: str,
    rates: dict[str, float] | float,
    stratum_col: str | None = None,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic (repeatable) sample: keep a row iff its md5(salt:key)
    prefix falls under the stratum's rate threshold.

    ``rates`` is either a single rate or a per-stratum dict (strata absent
    from the dict are dropped — explicit is better than accidental 100%).
    Unlike ``df.sample()``, the decision is a pure function of the key: the
    sample is stable across retries, engines, and appended data, which is
    what a reproducible training-data pipeline needs.
    """
    h = _hash_prefix(F.col(key_col), salt)
    if isinstance(rates, dict):
        if stratum_col is None:
            raise ValueError("stratum_col is required when rates is a dict")
        cond = F.lit(False)
        for stratum, rate in rates.items():
            cond = cond | (
                (F.col(stratum_col) == F.lit(stratum)) & (h < F.lit(_hex_threshold(rate)))
            )
        return df.filter(cond)
    return df.filter(h < F.lit(_hex_threshold(float(rates))))


def pack_sequences(
    documents: DataFrame,
    *,
    budget: int,
    shard_col: str,
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing (the standard LLM pretraining
    step): documents are concatenated in ``order_col`` order WITHIN each
    ``shard_col`` shard and cut into chunks of ``budget`` tokens; each doc
    is labeled with the chunk its first token lands in.

    Scale shape: the running token offset is a window cumsum PARTITIONED BY
    the shard — never a global unpartitioned sort (real pipelines pack
    within language/source/date shards precisely so the operation
    parallelizes). Chunk identity is (shard, chunk_id). Deterministic given
    the ordering column, so the assignment is SQL-replayable: DuckDB's
    SUM() OVER (PARTITION BY shard ORDER BY ...) reproduces it exactly.

    Returns the documents with ``n_tokens``, ``token_offset`` (tokens
    before this doc in its shard) and ``chunk_id`` attached.
    """
    if budget <= 0:
        raise ValueError(f"token budget must be positive, got {budget}")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        documents.withColumn("n_tokens", token_count(text_col))
        .withColumn("token_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("chunk_id", F.floor(F.col("token_offset") / budget).cast("long"))
    )
