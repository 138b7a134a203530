"""Readers/validation (reference S1/S8 semantics — job1:33-88, done right)."""

from __future__ import annotations

import pytest

from pyspark.sql.types import LongType, StringType, StructField, StructType, TimestampType

from spark_iceberg_jobs_spark.schemas import FIXTURE_SCHEMAS, FIXTURE_TABLES
from spark_iceberg_jobs_spark.sources.readers import (
    load_tables,
    read_csv,
    read_fixture,
    validate_all_or_raise,
    validate_dataframe,
)


def test_all_fixture_tables_readable(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    assert set(t) == set(FIXTURE_TABLES)
    for name, df in t.items():
        assert df.count() > 0, name


def test_fixture_schemas_match_disk(spark, sf_dir):
    """Schemas in schemas.py are the documented contract — verify against
    the actual parquet footers (events.ts intentionally differs: we
    normalize ns → µs timestamp)."""
    for name in FIXTURE_TABLES:
        df = read_fixture(spark, sf_dir, name)
        expected = FIXTURE_SCHEMAS[name]
        got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        want = {f.name: f.dataType.simpleString() for f in expected.fields}
        assert got == want, name


def test_events_ts_is_microsecond_timestamp(spark, sf_dir):
    df = read_fixture(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    row = df.orderBy("event_id").first()
    assert row.ts.year == 2024


def test_read_fixture_unknown_table(spark, sf_dir):
    with pytest.raises(KeyError):
        read_fixture(spark, sf_dir, "nope")


def test_read_csv_requires_schema_or_optin(spark, tmp_path):
    p = str(tmp_path / "x.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,x\n2,y\n")
    with pytest.raises(ValueError):
        read_csv(spark, p)
    schema = StructType([StructField("a", LongType()), StructField("b", StringType())])
    df = read_csv(spark, p, schema)
    assert df.schema == schema
    assert df.count() == 2
    inferred = read_csv(spark, p, infer_schema=True)
    assert inferred.count() == 2


def test_validation_gate(spark):
    good = spark.range(3)
    empty = spark.range(0)
    assert validate_dataframe(good, "good")
    assert not validate_dataframe(empty, "empty")
    assert not validate_dataframe(None, "none")
    with pytest.raises(ValueError, match="empty"):
        validate_all_or_raise({"good": good, "empty": empty})
    validate_all_or_raise({"good": good})
