"""Table-maintenance operators: upsert/merge and small-file compaction.

The reference's only write strategy is full overwrite (job1:295-335). A real
lake needs incremental maintenance; these are the parquet-path versions of
what Iceberg's MERGE INTO and rewrite_data_files do, with the same
semantics, so the pipeline upgrades transparently when the runtime jar is
present.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    *,
    key: str | list[str],
) -> DataFrame:
    """MERGE semantics (matched → replace with update, unmatched → insert):
    returns the merged relation.

    Implemented as updates ∪ (target anti-join updates) — two narrow passes,
    one shuffle each on the key, no row-by-row driver logic. With Iceberg
    this becomes ``MERGE INTO`` (copy-on-write or merge-on-read); the
    dataflow shape is identical. Updates must be unique per key.
    """
    keys = [key] if isinstance(key, str) else list(key)
    surviving = target.join(updates.select(*keys), on=keys, how="left_anti")
    return surviving.unionByName(updates)


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_rows_per_file: int,
    sort_within: list[str] | None = None,
) -> tuple[int, int]:
    """Small-file compaction: rewrite a parquet directory into ~uniform
    files (Iceberg: rewrite_data_files / binpack). Returns (files_before,
    files_after).

    Small files are the classic lake pathology — per-file open/footer costs
    dominate scans. Rewrite = one round-robin repartition sized from the
    actual row count; optional sort restores encoding-friendly layout
    (README.md:24-25's point, applied at maintenance time).
    """

    def count_files(p: str) -> int:
        return sum(
            1 for _r, _d, files in os.walk(p) for f in files if f.endswith(".parquet")
        )

    df = spark.read.parquet(path)
    n_rows = df.count()
    before = count_files(path)
    n_files = max(1, -(-n_rows // target_rows_per_file))
    shaped = df.repartition(n_files)
    if sort_within:
        shaped = shaped.sortWithinPartitions(*sort_within)
    import shutil

    tmp = path.rstrip("/") + "__compacting"
    try:
        shaped.write.mode("overwrite").parquet(tmp)
        # rename-aside swap (real lakes do this via metadata commit): the
        # original stays recoverable at __old until the new tree is in place
        bak = path.rstrip("/") + "__old"
        os.rename(path, bak)
        os.rename(tmp, path)
        shutil.rmtree(bak)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return before, count_files(path)
