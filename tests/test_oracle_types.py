"""Dtype-kind parity sweep over every oracle (VERDICT r2 item 2).

The driver fetches BOTH engines' results through pandas and hashes the
stringified cells. An oracle column that arrives as float64 while the Spark
result is int64 therefore hashes ``'3.0'`` vs ``'3'`` and fails even when the
values are identical — the round-2 trap: DuckDB windowed SUMs over integers
return HUGEINT, which ``fetchdf`` downgrades to float64.

This sweep catches the whole class mechanically, for all oracles at once,
without executing the Spark side: the Spark result schema fixes the expected
pandas dtype kind exactly (modulo nullable-int columns, where BOTH engines'
pandas fetch floats — driver-safe, tolerated below). Deliberately removing
the ``CAST(... AS BIGINT)`` from e.g. PIVOT_ORACLE makes this fail.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from spark_iceberg_jobs_spark.queries import registry

REG = registry()
ORACLED = sorted(name for name, spec in REG.items() if spec.oracle)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Queries whose construction runs real Spark actions (streaming drains,
# iterative fits, multi-action funnels) — building their DataFrame just for
# the schema would re-execute them; the cheap lazy-build path below skips
# them and they stay covered by tools/verify_local.py's runtime kind check.
_EAGER_BUILD_PREFIXES = ("streaming_",)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _expected_kinds(dt: T.DataType) -> set[str]:
    """Pandas dtype kinds a non-null Spark column of this type produces."""
    if isinstance(dt, _INTEGRAL):
        return {"i", "u"}
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return {"f"}
    if isinstance(dt, T.DecimalType):
        # Spark toPandas yields object-dtype Decimals; the driver's str() of
        # Decimal('3.00') is '3.00', which no DuckDB fetch reproduces — so a
        # Decimal output column is itself a parity bug; flag loudly.
        return set()
    if isinstance(dt, T.BooleanType):
        return {"b"}
    if isinstance(dt, T.TimestampType):
        return {"M"}
    return {"O"}


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_dtypes_kind_match_spark_schema(spark, sf_dir, duck, name):
    spec = REG[name]
    if name.startswith(_EAGER_BUILD_PREFIXES):
        pytest.skip("eager-build query; runtime kinds checked by verify_local")
    sdf = spec.fn(spark, sf_dir)  # lazy — schema only, no job
    odf = duck.execute(spec.oracle).fetchdf()
    expected = {f.name: _expected_kinds(f.dataType) for f in sdf.schema.fields}
    assert sorted(odf.columns) == sorted(expected), (
        f"{name}: oracle columns {sorted(odf.columns)} != spark {sorted(expected)}"
    )
    for col in odf.columns:
        kinds = expected[col]
        okind = odf[col].dtype.kind
        if okind == "f" and kinds == {"i", "u"} and odf[col].isna().any():
            # Nullable-int: pandas floats the fetch on BOTH engines, so the
            # driver's stringified cells still agree ('3.0' vs '3.0').
            continue
        if okind == "O" and kinds == {"b"}:
            continue  # nullable bool fetches as object on both engines
        assert okind in kinds, (
            f"{name}.{col}: oracle pandas kind '{okind}' vs spark-implied "
            f"{sorted(kinds)} — HUGEINT/DECIMAL leak? str() of these cells "
            "will differ between engines under the driver hash"
        )
