"""MERGE commit-cost lab: copy-on-write vs merge-on-read at scale
(VERDICT r11 item 2's measured reading).

The workload is CoW's worst case and MOR's design case: a FIXED-size
source (~2,000 keys) spread uniformly across the whole keyspace, so
every data file of the growing target contains matches. CoW must
rewrite every match-bearing file — commit cost grows with TABLE bytes
even though the edit is constant-size; MOR commits one equality-delete
file plus the re-appended rows — commit cost stays O(source) at any
scale. Both verbs produce the same visible rows (equality asserted at
1x; the twin-table test in test_filetable pins it in CI).

Usage: python tools/merge_cost_lab.py [max_scale]   (default 64; 256 for the spread)

Prints one JSON line per scale: target rows, CoW/MOR commit seconds,
files rewritten vs appended — the numbers SCALE.md §Round-12 records.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_iceberg_jobs_spark.session import get_spark
from spark_iceberg_jobs_spark.sources import filetable as ft
from tools.scale_lab import LAB, build_tpch

N_SOURCE = 2_000
N_FILES = 32


def run(spark, scale: int) -> dict:
    d = build_tpch(spark, scale)
    orders = spark.read.parquet(f"{d}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("double").alias("o_totalprice")
    )
    n_rows = orders.count()
    step = max(1, n_rows // N_SOURCE)
    src = (
        orders.filter(F.col("o_orderkey") % step == 0)
        .select(F.col("o_orderkey").alias("k"))
        .limit(N_SOURCE)
        .withColumn("delta", F.lit(7.5))
    )
    src = src.persist()
    n_src = src.count()
    out = {"scale": scale, "target_rows": n_rows, "source_keys": n_src}
    results = {}
    for mode, verb in (("cow", ft.merge_into), ("mor", ft.merge_into_mor)):
        td = f"{LAB}/mergecost_x{scale}_{mode}"
        shutil.rmtree(td, ignore_errors=True)
        ft.create_table(
            orders, td, stats_cols=["o_orderkey"],
            cluster_by="o_orderkey", n_files=N_FILES,
        )
        t0 = time.time()
        summary = verb(
            spark, td, src, on=("o_orderkey", "k"),
            when_matched_update={
                "o_totalprice": F.col("t.o_totalprice") + F.col("s.delta")
            },
        )
        out[f"{mode}_commit_s"] = round(time.time() - t0, 2)
        out[f"{mode}_files_rewritten"] = summary["files_rewritten"]
        out[f"{mode}_files_added"] = summary.get("files_added", 0)
        results[mode] = td
    if scale == 1:
        a = sorted(map(tuple, ft.read_table(spark, results["cow"]).collect()))
        b = sorted(map(tuple, ft.read_table(spark, results["mor"]).collect()))
        assert a == b, "CoW and MOR MERGE diverged"
        out["rows_equal"] = True
    for td in results.values():
        shutil.rmtree(td, ignore_errors=True)
    src.unpersist()
    return out


def main() -> int:
    max_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spark = get_spark("merge-cost-lab")
    for scale in (1, 16, 64, 256):
        if scale > max_scale:
            break
        print(json.dumps(run(spark, scale)), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
