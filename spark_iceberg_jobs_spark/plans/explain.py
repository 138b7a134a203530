"""Plan-shape introspection — physical-plan assertions for tests (SURVEY.md
§5.3) and for eyeballing whether a query got the plan it deserves.

The reference's whole pedagogical point (README.md:16-18) is *which physical
join appears*: BroadcastHashJoin for the hinted dims even with
autoBroadcast disabled, and a bucket join with no shuffle Exchange. These
helpers make that checkable in CI rather than by eye.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (post-AQE where applicable) as a string."""
    return df._jdf.queryExecution().explainString(  # type: ignore[union-attr]
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # type: ignore[union-attr]
            "formatted"
        )
    )


def executed_plan(df: DataFrame) -> str:
    """Simple-mode executed plan string."""
    return df._jdf.queryExecution().executedPlan().toString()  # type: ignore[union-attr]


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def count_shuffle_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the plan (broadcast exchanges
    excluded — those are the cheap kind)."""
    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line and "Reused" not in line
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan nodes — empty string if the
    source got nothing pushed down."""
    plan = formatted_plan(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)
