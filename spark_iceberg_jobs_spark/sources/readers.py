"""Readers + input validation.

Reference behaviors re-expressed (SURVEY.md §2.1):

- S1 CSV scan (job1:33-67): the reference uses header + ``inferSchema``
  (job1:52-54). Inference launches a full sampling job over executors before
  any user action and yields data-dependent types; here the schema is an
  explicit ``StructType`` argument and inference is opt-in.
- S8 emptiness probe (job1:69-88): the reference calls ``df.rdd.isEmpty()``
  (job1:83) — an RDD conversion that defeats codegen — and runs it twice per
  table (job1:168-173). We use ``df.isEmpty()`` once.

Scale note: all fixture reads are plain ``spark.read.parquet`` — columnar,
vectorized, split by ``spark.sql.files.maxPartitionBytes``; filters/projections
push into the scan via Catalyst so these helpers never materialize anything.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType, TimestampNTZType, TimestampType

from ..schemas import FIXTURE_TABLES

logger = logging.getLogger(__name__)


def read_fixture(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver fixture table (TESTDATA.md) as a DataFrame.

    ``events.ts`` is normalized to a session-zoned ``TimestampType``
    whatever the parquet file stores:

    - TIMESTAMP(MICROS), not UTC-adjusted (current driver fixtures) → Spark
      reads ``TIMESTAMP_NTZ``; with the session zone pinned UTC below, a
      cast to ``TimestampType`` is value-identity and restores the type the
      event-time operators (``unix_micros``, watermarks) require.
    - TIMESTAMP(NANOS) (round-1 fixtures), which Spark's reader rejects
      outright: read as nanosecond long (``legacy.parquet.nanosAsLong``) and
      truncate to µs. Truncation only moves *down* within the same
      second/window bucket, so windowing, epoch-second math, and ordering
      (tie-broken by event_id) are unaffected.

    SESSION-WIDE SIDE EFFECT (deliberate — ADVICE r1): ``nanosAsLong`` stays
    set for the session's lifetime after the first events read. It cannot be
    scoped set/read/restore around the read because the parquet scan
    re-reads the conf at EXECUTION time — restoring it before a lazy
    consumer materializes makes the scan throw PARQUET_TYPE_ILLEGAL
    (verified empirically on Spark 4.1). Consequence: any OTHER
    nanos-timestamp parquet read in the same session also comes back as
    long; callers who need TimestampType must convert as done here. The
    session factory documents the same flag (session.py).
    """
    if name not in FIXTURE_TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {FIXTURE_TABLES}")
    # Timestamp math (unix_timestamp on the NTZ order/ship dates) must mean
    # the same thing in this session as in the DuckDB oracle (naive == UTC),
    # regardless of who created the session — pin it here, not only in our
    # own session factory.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to a session-zoned TimestampType
    whatever encoding the fixture generation used — the ONE dispatch shared
    by the batch reader above and the stream reader
    (streaming/events_stream.py), so the two can never drift:

    - nanosecond INT64 surfaced as long (via nanosAsLong) → truncate to µs;
    - TIMESTAMP_NTZ (µs) → zone-dependent cast (callers pin the session
      zone to UTC first);
    - already TimestampType → unchanged.
    """
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # FLOOR division, not DIV (truncation toward zero): a pre-1970
        # negative nanos value must round DOWN into the earlier µs, or it
        # moves forward across second/window boundaries (review finding,
        # r8 — the same defect class banded_range_join fixed with F.floor
        # in r1). floor(ts/1000.0) is unsafe (ns epochs exceed 2^53), so
        # subtract the non-negative pmod remainder first — exact integer
        # arithmetic, identical to DIV for ts >= 0 (all driver fixtures).
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) DIV 1000"))
        )
    if isinstance(ts_type, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast(TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read several fixture tables at once: ``t = load_tables(spark, d, "orders", ...)``."""
    use = names or FIXTURE_TABLES
    return {n: read_fixture(spark, sf_dir, n) for n in use}


def read_table(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "parquet",
    schema: StructType | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Format-generic reader (parquet/json/orc/csv). JSON requires an
    explicit schema in this engine — schema inference over 100 TB of JSON is
    a full extra pass; the reference's inferSchema habit (job1:53) stops at
    the CSV door."""
    fmt = fmt.lower()
    if fmt == "json" and schema is None:
        raise ValueError("JSON reads require an explicit schema (inference = extra full pass)")
    reader = spark.read
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.format(fmt).load(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    *,
    header: bool = True,
    infer_schema: bool = False,
    alias: str | None = None,
) -> DataFrame:
    """CSV reader (reference S1, job1:50-56) with explicit-schema default.

    ``infer_schema=True`` reproduces the reference's sampling behavior for
    exploration; production paths must pass ``schema`` (SURVEY.md §1.3).
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    else:
        raise ValueError("pass an explicit schema, or opt in with infer_schema=True")
    df = reader.csv(path)
    return df.alias(alias) if alias else df


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
    alias: str | None = None,
) -> DataFrame:
    """Newline-delimited JSON reader — the arrival format of scraped text
    corpora (one document object per line).

    Schema is REQUIRED: inference is a full extra pass over the input
    before the real read, unaffordable at corpus scale. JSONL (unlike
    multiline JSON) is splittable, so a single huge file still fans out to
    one task per input block.

    ``mode``: PERMISSIVE (malformed lines become all-null rows, captured in
    ``corrupt_col`` if given), DROPMALFORMED, or FAILFAST. Extends the
    reference's CSV-only source surface (S1, job1:50-56) — same
    explicit-schema discipline, new format.
    """
    if mode not in ("PERMISSIVE", "DROPMALFORMED", "FAILFAST"):
        raise ValueError(f"unknown JSON parse mode: {mode}")
    reader = spark.read.option("mode", mode)
    if corrupt_col is not None:
        from pyspark.sql.types import StringType, StructField

        if corrupt_col not in schema.fieldNames():
            # copy before extending: StructType.add MUTATES self, so the
            # bare add would permanently append the corrupt column to the
            # CALLER'S schema object (review finding, r8 — a module-level
            # schema constant would silently grow a trailing field)
            schema = StructType(
                list(schema.fields) + [StructField(corrupt_col, StringType())]
            )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    df = reader.schema(schema).json(path)
    return df.alias(alias) if alias else df


def read_binary_files(
    spark: SparkSession,
    path: str,
    *,
    pattern: str | None = None,
    recursive: bool = False,
    alias: str | None = None,
) -> DataFrame:
    """Directory-of-blobs source (Spark's built-in ``binaryFile``) — the
    arrival format of raw multimodal corpora: each image/audio/video file
    becomes one row of (path, modificationTime, length, content binary),
    feeding operators/multimodal.py's decode/feature tier directly (the
    ``content`` column IS the opaque binary payload that tier consumes).

    ``pattern`` is a pathGlobFilter (e.g. ``*.pgm``) applied at LISTING
    time — non-matching blobs are never opened; ``recursive`` descends
    partition-style subtrees. Scale notes: the source is
    one-row-per-file, so it is the right tool for millions of modest
    blobs; shard multi-GB archives upstream (tar/parquet-packed) because
    one file = one row = one task's memory. Column pruning applies —
    selecting only ``path``/``length`` never reads file contents."""
    reader = spark.read.format("binaryFile")
    if pattern is not None:
        reader = reader.option("pathGlobFilter", pattern)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    return df.alias(alias) if alias else df


def read_xml(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    *,
    row_tag: str,
    infer_schema: bool = False,
    alias: str | None = None,
) -> DataFrame:
    """XML corpus reader (Spark 4 built-in ``xml`` source — the donated
    spark-xml): one row per ``row_tag`` element. Wikipedia/patent/PubMed
    style corpora arrive as giant XML; this is their ingestion leg.

    Same explicit-schema posture as read_csv: inference costs a full
    extra pass over the input (and XML inference is the most expensive
    of all the text formats), so production paths pass ``schema`` and
    exploration opts in with ``infer_schema=True``."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    elif not infer_schema:
        raise ValueError("pass an explicit schema, or opt in with infer_schema=True")
    df = reader.load(path)
    return df.alias(alias) if alias else df


def avro_available(spark: SparkSession) -> bool:
    """True when the external spark-avro module is on the classpath.
    Avro is Spark-supported but ships as a SEPARATE jar
    (org.apache.spark:spark-avro); this container does not carry it, so
    the reader below gates loudly and the probe test skips — the same
    posture as the Iceberg runtime (session.iceberg_available)."""
    # Probe ACTUAL data-source resolution: neither a lazy _jvm
    # package-path access (never fails) nor Class.forName (this distro
    # ships the class in the assembly WITHOUT registering the source)
    # answers the real question. A load of a nonexistent path classifies
    # cleanly, and on the ERROR CONDITION rather than message text
    # (review finding, r8 — wording varies across versions): a PRESENT
    # source fails with the stable PATH_NOT_FOUND; anything else
    # (FAILED_TO_FIND_DATA_SOURCE, the _LEGACY_ERROR_TEMP_1139 this
    # distro emits, or future variants) means the source did not
    # resolve — defaulting to "unavailable" keeps the loud gate and can
    # never silently pass a raw analysis error through.
    try:
        spark.read.format("avro").schema("probe int").load(
            "/nonexistent/__avro_probe__"
        )
        return True
    except Exception as e:  # noqa: BLE001 - classify the analysis error
        cond = getattr(e, "getCondition", lambda: None)()
        return cond == "PATH_NOT_FOUND"


def read_avro(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    *,
    alias: str | None = None,
) -> DataFrame:
    """Avro reader — the row-oriented interchange format Kafka pipelines
    land. Gated on ``avro_available`` with a LOUD error (never a silent
    empty frame); flips live the day the spark-avro jar ships, like the
    Iceberg DDL path."""
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro module not on the classpath: add "
            "org.apache.spark:spark-avro_2.13 to spark.jars.packages"
        )
    reader = spark.read.format("avro")
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(path)
    return df.alias(alias) if alias else df


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    *,
    alias: str | None = None,
) -> DataFrame:
    """ORC reader — the other columnar lake format (warehouses migrating
    from Hive arrive with ORC, not parquet). Self-describing like parquet,
    so the schema is optional; passing one enforces the contract (extra /
    missing columns fail at analysis instead of downstream). Same
    pushdown/pruning properties as the parquet path: predicates and column
    pruning reach the ORC stripe reader (asserted in test_sources)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.orc(path)
    return df.alias(alias) if alias else df


def validate_dataframe(df: DataFrame | None, description: str) -> bool:
    """Reject None/empty inputs (reference S8 semantics, job1:69-88).

    Single ``isEmpty`` probe (scans at most one partition) instead of the
    reference's double ``rdd.isEmpty()`` round-trips.
    """
    if df is None:
        logger.error("DataFrame %s is None", description)
        return False
    if df.isEmpty():
        logger.error("DataFrame %s is empty", description)
        return False
    return True


def validate_all_or_raise(dfs: dict[str, DataFrame | None]) -> None:
    """All-or-abort gate (job1:171-177): any invalid input fails the run."""
    bad = [name for name, df in dfs.items() if not validate_dataframe(df, name)]
    if bad:
        raise ValueError(f"invalid input DataFrames: {bad}")
