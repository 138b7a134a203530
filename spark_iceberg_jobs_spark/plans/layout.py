"""File-layout lab (reference O2: README.md:24-25).

The reference's final exercise: write the joined/aggregated output under
different ``sortWithinPartitions`` orderings and compare on-disk size —
low-cardinality sort-first columns compress best (run-length/dictionary
encoding in Parquet), README.md:25's hint.

``compare_sort_layouts`` runs that experiment for any DataFrame: writes one
parquet tree per candidate ordering, measures bytes on disk, reports. At
100 TB this is exactly how you'd tune an Iceberg table's write order
(sort-order metadata + rewrite_data_files); the measurement loop is the
same, reading ``<table>.files`` instead of walking a directory.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class LayoutResult:
    ordering: tuple[str, ...]
    n_files: int
    total_bytes: int


def _dir_parquet_bytes(path: str) -> tuple[int, int]:
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compare_sort_layouts(
    df: DataFrame,
    orderings: list[list[str]],
    *,
    base_dir: str | None = None,
    keep: bool = False,
) -> list[LayoutResult]:
    """Write ``df`` once per ordering (plus the unsorted baseline as ``[]``)
    and measure parquet bytes. Returns results sorted smallest-first."""
    base = base_dir or tempfile.mkdtemp(prefix="layout_lab_")
    results = []
    try:
        for ordering in orderings:
            out = os.path.join(base, "_".join(ordering) or "unsorted")
            shaped = df.sortWithinPartitions(*ordering) if ordering else df
            shaped.write.mode("overwrite").parquet(out)
            n, total = _dir_parquet_bytes(out)
            results.append(LayoutResult(tuple(ordering), n, total))
    finally:
        if not keep:
            shutil.rmtree(base, ignore_errors=True)
    return sorted(results, key=lambda r: r.total_bytes)


def zorder_key(a, b, *, bits: int = 16):
    """Z-order (Morton) key for two non-negative int columns already scaled
    to ``[0, 2^bits)``: bit i of ``a`` lands at position 2i, bit i of ``b``
    at 2i+1, so sorting by the key interleaves both dimensions — files/row
    groups get BOUNDED ranges on BOTH columns instead of tight-on-first /
    full-range-on-second, which is what lets min/max pruning work for
    predicates on either column. Pure bit arithmetic (shift/and/or terms),
    whole-stage-codegen'd; the 100 TB use is an Iceberg/Delta-style
    multi-dimension clustered rewrite where neither column dominates the
    query mix.
    """
    from pyspark.sql import functions as F

    ac = a if not isinstance(a, str) else F.col(a)
    bc = b if not isinstance(b, str) else F.col(b)
    ac, bc = ac.cast("long"), bc.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key
            .bitwiseOR(F.shiftleft(F.shiftrightunsigned(ac, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftrightunsigned(bc, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    # Inputs outside [0, 2^bits) would silently alias onto another cell and
    # destroy the clustering property the key exists for — fail loud instead
    # (one AND+compare per row; negative values trip the same high-bit test).
    hi = F.lit(-(1 << bits))  # two's-complement ~((1 << bits) - 1)
    out_of_range = (ac.bitwiseAND(hi) != 0) | (bc.bitwiseAND(hi) != 0)
    return F.when(
        out_of_range,
        F.raise_error(
            F.format_string(
                f"zorder_key input outside [0, 2^{bits}): a=%s b=%s", ac, bc
            )
        ),
    ).otherwise(key)
