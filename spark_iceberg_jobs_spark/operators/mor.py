"""Merge-on-read with equality deletes — the Iceberg v2 read path.

The maintenance tier plans the WRITE side of a lakehouse table's
lifecycle (compaction bins, snapshot expiry, orphan files, CDC merge —
queries/maintenance.py); this operator is the READ side that makes
row-level deletes cheap between compactions. An Iceberg v2 reader
applies each equality-delete file to data files with a LOWER data
sequence number — rows whose delete-key columns match any delete row are
dropped from the base scan — and data files written AFTER the delete
(higher sequence number) are served untouched, so a re-insert of a
deleted key survives. Reference: the job1 tables are ``USING iceberg``
candidates (job1-DDL_Load_Data_Spark_Iceberg.py:186-274); their
row-level delete/update path under Spark executes exactly this plan.

Spark-first shape: ONE left-anti equi join on the delete key columns,
broadcast while the delete set is small (the common case between
compactions — delete files accumulate only since the last
rewrite_data_files), then ``unionByName`` for the newer appends. At
100 TB the anti join moves delete KEYS only, never payload rows; when a
table outruns the broadcast threshold AQE falls back to a shuffled anti
join on the same key, and ``maintenance_compaction_bins`` (the
rewrite_data_files planner) is the pressure valve that folds
accumulated deletes back into data files and restores the pure scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quote(name: str) -> str:
    """Backtick-quote a column NAME so dataset-bound ``df[...]`` resolution
    never misparses dots as nested-field paths (embedded backticks escaped
    by doubling)."""
    return f"`{name.replace('`', '``')}`"


def mor_read_equality_deletes(
    base: DataFrame,
    deletes: DataFrame,
    appends: DataFrame | None = None,
    *,
    key_cols: list[str],
    broadcast_deletes: bool = True,
) -> DataFrame:
    """Serve the live rows of a MOR table snapshot.

    - ``base``: the data files the delete files apply to (lower data
      sequence number).
    - ``deletes``: the equality-delete files — any extra columns beyond
      ``key_cols`` are ignored, duplicate delete rows are idempotent,
      keys absent from ``base`` are no-ops, and key values are compared
      NULL-SAFELY (a null delete key deletes the null-keyed base rows —
      Iceberg compares equality-delete values with null equality, which
      a plain equi join would silently drop).
    - ``appends``: data files newer than every delete (higher sequence
      number) — served verbatim, even when their keys are in the delete
      set (delete-then-reinsert must resurrect the row).

    ``broadcast_deletes=False`` drops the hint for delete sets known to
    outrun the broadcast threshold; the join key is unchanged, so AQE
    plans the same anti join as a shuffle.
    """
    keys = deletes.select(*[deletes[_quote(c)] for c in key_cols]).distinct()
    if broadcast_deletes:
        keys = F.broadcast(keys)
    # null-safe (<=>) join condition: Iceberg equality deletes match null
    # key values; a name-list equi join is null-rejecting and would leave
    # null-keyed rows undeletable. <=> remains a valid hash-join key, so
    # the plan is still a (broadcast) hash LeftAnti.
    #
    # Columns are referenced via df[`name`] on the two aliased frames, not
    # string-interpolated F.col("alias.name") paths (ADVICE r7): a key
    # column whose NAME contains a dot would misparse as a nested path.
    # The backtick quoting keeps dataset-bound resolution exact for any
    # column name (embedded backticks escaped by doubling).
    b, d = base.alias("__mor_base"), keys.alias("__mor_deletes")
    cond = None
    for c in key_cols:
        term = b[_quote(c)].eqNullSafe(d[_quote(c)])
        cond = term if cond is None else cond & term
    live = b.join(d, cond, "left_anti")
    return live.unionByName(appends) if appends is not None else live


def mor_apply_deletes_by_sequence(
    data: DataFrame,
    deletes: DataFrame,
    *,
    key_cols: list[str],
    seq_col: str,
    delete_seq: int,
    broadcast_deletes: bool = True,
) -> DataFrame:
    """Sequence-aware MOR read: split ``data`` by the Iceberg v2 rule —
    an equality delete applies to data files whose data sequence number
    is STRICTLY LESS than the delete's own (Iceberg spec: "equality
    delete files are applied to data files with a sequence number less
    than the delete file's"). A data file whose sequence number TIES the
    delete's was written by the SAME commit and is NOT affected — the
    rule that makes single-commit MERGE upserts work, where one commit
    writes both the equality delete for the old row and the replacement
    row under one sequence number. The plausible wrong rule (``<=``)
    would kill the replacement row of exactly that commit; the planted
    sequence-tie test pins the difference.

    Scale: one filter split (no extra shuffle) feeding the same
    broadcast-anti-join read as mor_read_equality_deletes."""
    base = data.filter(F.col(seq_col) < delete_seq)
    appends = data.filter(F.col(seq_col) >= delete_seq)
    return mor_read_equality_deletes(
        base,
        deletes,
        appends,
        key_cols=key_cols,
        broadcast_deletes=broadcast_deletes,
    )
