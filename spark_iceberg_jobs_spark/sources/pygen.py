"""Custom Python Data Source (Spark 4 DataSource API) — a deterministic
synthetic events generator.

The Spark 4 Python DataSource API is the sanctioned way to plug a custom
source into the DataFrame reader (``spark.dataSource.register`` +
``spark.read.format(name)``) with REAL parallelism: ``partitions()``
declares the split set and each ``read(partition)`` runs as its own task —
unlike a driver-side createDataFrame, generation scales with the cluster.

Rows are pure md5 functions of the row index, so (a) any partitioning of
the index range yields the same dataset — repartitioning the source is
semantically free, and (b) a SQL engine can replay the generator exactly
(DuckDB oracle in queries/core.py: RANGE + md5 hex-digit math), which
makes a CUSTOM PYTHON SOURCE hash-verifiable end to end.

Use cases this stands in for: load generators, API/paginated-feed
readers, and synthetic benchmark tables — anything where the source is
an algorithm, not files.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("view", "click", "purchase", "refund", "share")


def gen_row(i: int) -> tuple[int, int, str, int]:
    """The generator contract, shared by every partition and mirrored in
    the SQL oracle: all fields are hex-digit functions of md5('gen:'||i)."""
    h = hashlib.md5(f"gen:{i}".encode()).hexdigest()
    user = int(h[0:4], 16) % 997
    etype = EVENT_TYPES[int(h[4], 16) % 5]
    value = int(h[5:9], 16) % 1000
    return (i, user, etype, value)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)
    .option("partitions", P).load()``"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value bigint"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("rows", 10000))
        self.parts = int(options.get("partitions", 8))
        if self.n < 0 or self.parts < 1:
            raise ValueError(f"need rows >= 0 and partitions >= 1, got {options}")

    def partitions(self):
        # contiguous index ranges — each becomes one Spark task
        return [InputPartition(p) for p in range(self.parts)]

    def read(self, partition):
        p = partition.value
        lo = p * self.n // self.parts
        hi = (p + 1) * self.n // self.parts
        for i in range(lo, hi):
            yield gen_row(i)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is allowed)."""
    spark.dataSource.register(SyntheticEventsDataSource)
