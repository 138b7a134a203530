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


def test_read_jsonl_modes_and_corrupt_capture(spark, tmp_path):
    """JSONL corpus ingestion: good lines parse against the explicit
    schema; a malformed line is captured (PERMISSIVE + corrupt_col),
    dropped (DROPMALFORMED), or fatal (FAILFAST)."""
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    from spark_iceberg_jobs_spark.sources.readers import read_jsonl

    p = str(tmp_path / "docs.jsonl")
    with open(p, "w") as f:
        f.write('{"doc_id": 1, "text": "hello world"}\n')
        f.write('{"doc_id": 2, "text": "second doc"}\n')
        f.write("{not json at all\n")
    schema = StructType([StructField("doc_id", LongType()), StructField("text", StringType())])

    kept = read_jsonl(spark, p, schema, mode="DROPMALFORMED")
    assert [r.doc_id for r in kept.orderBy("doc_id").collect()] == [1, 2]

    tagged = read_jsonl(spark, p, schema, corrupt_col="_bad")
    rows = tagged.orderBy("doc_id").collect()
    assert len(rows) == 3
    bad = [r for r in rows if r._bad is not None]
    assert len(bad) == 1 and bad[0].doc_id is None and "not json" in bad[0]._bad

    with pytest.raises(Exception):
        read_jsonl(spark, p, schema, mode="FAILFAST").collect()
    with pytest.raises(ValueError):
        read_jsonl(spark, p, schema, mode="YOLO")


def test_json_orc_roundtrip(spark, sf_dir, tmp_path):
    """Format-generic read/write: parquet fixture → ORC and JSON → identical
    rows back (JSON with explicit schema; timestamps excluded — JSON's ISO
    text round-trip is exercised via the string projection)."""
    from pyspark.sql import functions as F

    from spark_iceberg_jobs_spark.sources.readers import read_table
    from spark_iceberg_jobs_spark.sources.writers import write_table

    nation = read_fixture(spark, sf_dir, "nation")
    orc_path = str(tmp_path / "nation_orc")
    json_path = str(tmp_path / "nation_json")
    write_table(nation, orc_path, fmt="orc")
    write_table(nation, json_path, fmt="json")

    orc_back = read_table(spark, orc_path, fmt="orc")
    json_back = read_table(
        spark, json_path, fmt="json", schema=FIXTURE_SCHEMAS["nation"]
    )
    expected = sorted(map(tuple, nation.collect()))
    assert sorted(map(tuple, orc_back.collect())) == expected
    assert sorted(map(tuple, json_back.collect())) == expected
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, json_path, fmt="json")


def test_validation_gate(spark):
    good = spark.range(3)
    empty = spark.range(0)
    assert validate_dataframe(good, "good")
    assert not validate_dataframe(empty, "empty")
    assert not validate_dataframe(None, "none")
    with pytest.raises(ValueError, match="empty"):
        validate_all_or_raise({"good": good, "empty": empty})
    validate_all_or_raise({"good": good})


def test_observation_metrics_ride_the_ingest_scan(spark, sf_dir):
    """df.observe(): pipeline health metrics (row count, null keys, value
    bounds) collected DURING the normal action — no second scan, the
    production pattern for ingest monitoring (vs a separate validation
    pass). The observed numbers must agree with a direct aggregation."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from spark_iceberg_jobs_spark.sources.readers import read_fixture

    orders = read_fixture(spark, sf_dir, "orders")
    obs = Observation("ingest_health")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("null_keys"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
    n = observed.count()  # the one action both consumes rows and fills obs
    got = obs.get
    assert got["n_rows"] == n
    assert got["null_keys"] == 0
    [direct] = orders.agg(F.round(F.max("o_totalprice"), 2)).collect()
    assert got["max_price"] == direct[0]


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC source parity: parquet fixture -> ORC -> read back identical;
    predicate + projection reach the ORC scan (PushedFilters / narrow
    ReadSchema) just like the parquet path."""
    from spark_iceberg_jobs_spark.sources.readers import read_fixture, read_orc

    docs = read_fixture(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_orc")
    docs.write.orc(out)
    back = read_orc(spark, out, docs.schema)
    assert back.count() == docs.count()
    assert sorted(back.columns) == sorted(docs.columns)
    a = sorted(r.doc_id for r in docs.select("doc_id").collect())
    b = sorted(r.doc_id for r in back.select("doc_id").collect())
    assert a == b

    narrow = back.filter(back.n_chars > 100).select("doc_id", "n_chars")
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "n_chars" in plan and "text" not in plan.split("ReadSchema")[-1], plan
    assert "PushedFilters: [" in plan, plan


def test_python_datasource_partitions_and_determinism(spark):
    """The custom Python data source must expose REAL input partitions
    (one task per declared split) and generate identical rows regardless
    of the partition count (index-pure generator)."""
    from spark_iceberg_jobs_spark.sources.pygen import register

    register(spark)

    def load(parts):
        return (
            spark.read.format("synthetic_events")
            .option("rows", 1000)
            .option("partitions", parts)
            .load()
        )

    df8 = load(8)
    assert df8.rdd.getNumPartitions() == 8
    rows8 = sorted(map(tuple, df8.collect()))
    rows3 = sorted(map(tuple, load(3).collect()))
    assert rows8 == rows3 and len(rows8) == 1000


def test_wap_write_publishes_only_after_audits(spark, tmp_path):
    """Write-Audit-Publish: audits run against the STAGED files; a failing
    or erroring audit discards the staging and leaves the table path
    unobservable, a passing run publishes atomically."""
    import os

    import pytest

    from spark_iceberg_jobs_spark.sources.writers import wap_write_parquet

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", -1.0), (3, "c", 20.0)],
        "id long, k string, v double",
    )
    final = str(tmp_path / "wap_table")

    # audit failure (negative value present) -> no publish, staging gone
    with pytest.raises(ValueError, match="audit #1 failed"):
        wap_write_parquet(
            df,
            final,
            audits=[
                lambda s: s.count() == 3,
                lambda s: s.filter("v < 0").isEmpty(),
            ],
        )
    assert not os.path.exists(final)
    assert not any(".staging." in n for n in os.listdir(tmp_path))

    # erroring audit must fail loudly, not pass silently
    with pytest.raises(ValueError, match="audit #0 errored"):
        wap_write_parquet(df, final, audits=[lambda s: s.select("nope").count()])
    assert not os.path.exists(final)

    # clean batch publishes; the audit saw the staged files, and readers
    # see exactly the written rows
    clean = df.filter("v >= 0")
    out = wap_write_parquet(
        clean,
        final,
        audits=[lambda s: s.count() == 2, lambda s: s.filter("v < 0").isEmpty()],
    )
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got == [(1, "a", 10.0), (3, "c", 20.0)]
    assert not any(".staging." in n for n in os.listdir(tmp_path))

    # RE-publish replaces the table (rename-aside swap, review finding:
    # the first cut routed through publish_atomic, whose corpse-recovery
    # rmtree'd the live publish and whose _OK convention would have
    # discarded the new batch)
    batch2 = spark.createDataFrame([(9, "z", 1.0)], "id long, k string, v double")
    wap_write_parquet(batch2, final, audits=[lambda s: s.count() == 1])
    got2 = [tuple(r) for r in spark.read.parquet(final).collect()]
    assert got2 == [(9, "z", 1.0)]
    # a FAILED re-publish attempt leaves the previous table intact
    with pytest.raises(ValueError, match="audit #0 failed"):
        wap_write_parquet(df, final, audits=[lambda s: False])
    assert [tuple(r) for r in spark.read.parquet(final).collect()] == [(9, "z", 1.0)]
    # FALSY non-bool returns fail too (review finding: numpy.bool_(False)
    # is not the False singleton and an `is False` check published the
    # failing batch)
    import numpy as np

    with pytest.raises(ValueError, match="audit #0 failed"):
        wap_write_parquet(
            df, final, audits=[lambda s: np.bool_(s.filter("v < 0").isEmpty())]
        )
    assert [tuple(r) for r in spark.read.parquet(final).collect()] == [(9, "z", 1.0)]
    leftovers = [
        n for n in os.listdir(tmp_path) if ".staging." in n or ".swap_old." in n
    ]
    assert leftovers == []


def test_read_binary_files_blob_ingestion_feeds_decode(spark, tmp_path):
    """binaryFile source: each blob is one (path, length, content) row;
    pathGlobFilter prunes at LISTING time; selecting metadata only never
    reads contents (column pruning). The content column feeds the
    multimodal decode tier directly — a real PGM written as a loose file
    round-trips through read_binary_files -> decode_image pixel-exactly."""
    from pyspark.sql import functions as F

    from spark_iceberg_jobs_spark.operators.multimodal import decode_image
    from spark_iceberg_jobs_spark.sources.readers import read_binary_files

    blob_dir = tmp_path / "blobs"
    blob_dir.mkdir()
    raster = bytes(range(256))  # 16x16, every gray level once
    (blob_dir / "img_7.pgm").write_bytes(b"P5\n16 16\n255\n" + raster)
    (blob_dir / "ignore.txt").write_bytes(b"not an image")

    blobs = read_binary_files(spark, str(blob_dir), pattern="*.pgm")
    rows = blobs.select("path", "length").collect()
    assert len(rows) == 1 and rows[0]["path"].endswith("img_7.pgm")
    assert rows[0]["length"] == len(b"P5\n16 16\n255\n" + raster)

    mm = blobs.select(
        F.regexp_extract(F.element_at(F.split("path", "/"), -1), r"img_(\d+)", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    got = decode_image(mm).collect()
    assert [tuple(r) for r in got] == [(7, 16, 16, 127.5, 0, 255)]


def test_read_xml_explicit_schema(spark, tmp_path):
    """Spark 4 built-in XML source: one row per rowTag element, explicit
    schema required (inference is opt-in, mirroring read_csv)."""
    import pytest
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from spark_iceberg_jobs_spark.sources.readers import read_xml

    xml = tmp_path / "corpus.xml"
    xml.write_text(
        "<docs>"
        "<doc><doc_id>1</doc_id><text>alpha beta</text></doc>"
        "<doc><doc_id>2</doc_id><text>gamma</text></doc>"
        "</docs>"
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    got = sorted(
        tuple(r) for r in read_xml(spark, str(xml), schema, row_tag="doc").collect()
    )
    assert got == [(1, "alpha beta"), (2, "gamma")]
    with pytest.raises(ValueError, match="explicit schema"):
        read_xml(spark, str(xml), row_tag="doc")
    # inference opt-in works for exploration
    inferred = read_xml(spark, str(xml), row_tag="doc", infer_schema=True)
    assert inferred.count() == 2


def test_read_avro_gates_loudly_or_roundtrips(spark, tmp_path):
    """Avro ships as a separate jar; absent -> loud RuntimeError (never a
    silent empty frame), present -> roundtrip. The skip flips green the
    day the spark-avro jar ships (same posture as the Iceberg runtime)."""
    import pytest

    from spark_iceberg_jobs_spark.sources.readers import avro_available, read_avro

    if not avro_available(spark):
        with pytest.raises(RuntimeError, match="spark-avro"):
            read_avro(spark, str(tmp_path / "nope"))
        pytest.skip("spark-avro module absent in this container")
    out = str(tmp_path / "t.avro")
    spark.range(5).write.format("avro").save(out)
    assert read_avro(spark, out).count() == 5


def test_versioned_table_commit_rollback_branch_expire(spark, tmp_path):
    """The version-hint commit protocol (the EXECUTED twin of
    maintenance_rollback_plan): commits are immutable version dirs with
    an atomically repointed hint; rollback is one hint replace (no data
    moves) and old versions stay readable; a commit AFTER a rollback
    branches forward to max+1, never reusing the rolled-over version
    (the Iceberg rollback_to_snapshot + append shape); a torn/crashed
    commit leaves the previous version current; expiry keeps the current
    and newest versions."""
    import os

    from spark_iceberg_jobs_spark.sources.writers import (
        current_version,
        expire_versions,
        read_current_version,
        rollback_version,
        versioned_write,
    )

    tbl = str(tmp_path / "tbl")

    def frame(tag):
        return spark.createDataFrame([(1, tag)], "k int, tag string")

    def current_tag():
        return read_current_version(spark, tbl).collect()[0].tag

    assert versioned_write(frame("a"), tbl) == 1
    assert versioned_write(frame("b"), tbl) == 2
    assert current_version(tbl) == 2 and current_tag() == "b"

    # rollback: hint repoints, data untouched, v2 still on disk
    assert rollback_version(tbl, 1) == 1
    assert current_tag() == "a"
    assert os.path.isdir(os.path.join(tbl, "v000002"))
    import pytest

    with pytest.raises(ValueError, match="does not exist"):
        rollback_version(tbl, 99)

    # commit after rollback branches FORWARD (never reuses v2)
    assert versioned_write(frame("c"), tbl) == 3
    assert current_tag() == "c"

    # crash simulation: a new version dir written but hint never
    # repointed (and no commit marker — audits never ran) — readers stay
    # on the committed version, and rollback REFUSES to serve the torn
    # dir as current (ADVICE r9: unaudited data must never become
    # current via rollback)
    frame("torn").write.mode("overwrite").parquet(os.path.join(tbl, "v000004"))
    assert current_version(tbl) == 3 and current_tag() == "c"
    with pytest.raises(ValueError, match="never committed"):
        rollback_version(tbl, 4)

    # a stale hint tmp from a dead writer is inert
    with open(os.path.join(tbl, "version-hint.text.tmp.999"), "w") as f:
        f.write("4")
    assert current_version(tbl) == 3

    # expiry keeps current + newest, reclaims the rest
    removed = expire_versions(tbl, keep_last=2)
    assert removed == [1, 2]
    assert current_version(tbl) == 3 and current_tag() == "c"

    # hint pointing at a reclaimed dir must fail loudly, not serve
    # another version
    expire_versions(tbl, keep_last=0)  # keeps only current (3); torn v4 goes
    assert not os.path.isdir(os.path.join(tbl, "v000004"))
    with open(os.path.join(tbl, "version-hint.text"), "w") as f:
        f.write("2")
    with pytest.raises(ValueError, match="missing directory"):
        current_version(tbl)


def test_versioned_write_audits_gate_the_repoint(spark, tmp_path):
    """WAP over the version protocol: the unreferenced version dir is the
    audit branch — a failing (or numpy-falsy, or raising) audit tears the
    new version down and the hint never moves; a passing audit set
    commits. The failed attempt's version number is reused by the next
    commit only if its dir was fully removed (it is)."""
    import numpy as np
    import pytest

    from spark_iceberg_jobs_spark.sources.writers import (
        current_version,
        read_current_version,
        versioned_write,
    )

    tbl = str(tmp_path / "tbl")
    f1 = spark.createDataFrame([(1, "good")], "k int, tag string")
    assert versioned_write(f1, tbl, audits=[lambda d: d.count() == 1]) == 1

    bad = spark.createDataFrame([(2, "bad")], "k int, tag string")
    with pytest.raises(ValueError, match="audit #0 failed"):
        versioned_write(bad, tbl, audits=[lambda d: np.bool_(False)])
    with pytest.raises(ValueError, match="audit #0 errored"):
        versioned_write(bad, tbl, audits=[lambda d: 1 / 0])
    assert current_version(tbl) == 1
    assert read_current_version(spark, tbl).collect()[0].tag == "good"

    # assert-style audit (returns None) passes; table advances
    assert versioned_write(bad, tbl, audits=[lambda d: None]) == 2
    assert read_current_version(spark, tbl).collect()[0].tag == "bad"


def test_versioned_mor_upsert_and_rollback_integration(spark, tmp_path):
    """The storage protocol and the MOR read path compose into the full
    lakehouse loop: v1 = base table; v2 = the MOR-served state of an
    equality-delete + re-insert batch (audited commit — the audit is the
    WAP gate on the branch); rollback to v1 restores the pre-delete
    state byte-for-byte; a post-rollback commit branches to v3."""
    from spark_iceberg_jobs_spark.operators.mor import mor_read_equality_deletes
    from spark_iceberg_jobs_spark.sources.writers import (
        read_current_version,
        rollback_version,
        versioned_write,
    )

    tbl = str(tmp_path / "users")
    base = spark.createDataFrame(
        [(1, "alice", 10), (2, "bob", 20), (3, "carol", 30)],
        "uid int, name string, score int",
    )
    assert versioned_write(base, tbl) == 1

    # GDPR-style: delete uid 2, re-insert uid 3 with a corrected score
    deletes = spark.createDataFrame([(2,), (3,)], "uid int")
    appends = spark.createDataFrame([(3, "carol", 35)], "uid int, name string, score int")
    served = mor_read_equality_deletes(
        read_current_version(spark, tbl), deletes, appends, key_cols=["uid"]
    )
    assert versioned_write(served, tbl, audits=[lambda d: d.count() > 0]) == 2

    now = {(r.uid, r.name, r.score) for r in read_current_version(spark, tbl).collect()}
    assert now == {(1, "alice", 10), (3, "carol", 35)}

    rollback_version(tbl, 1)
    before = {
        (r.uid, r.name, r.score) for r in read_current_version(spark, tbl).collect()
    }
    assert before == {(1, "alice", 10), (2, "bob", 20), (3, "carol", 30)}

    assert versioned_write(appends, tbl) == 3  # branches forward past v2


def test_versioned_write_two_concurrent_writers_distinct_versions(spark, tmp_path):
    """The CAS claim (VERDICT r9 item 5): two writers committing to the
    same table path CONCURRENTLY must land in distinct versions — the
    mkdir O_EXCL claim makes computing the same next version impossible
    — and both committed version dirs must be complete and readable.
    The hint resolves to whichever repoint landed last (os.replace is
    atomic), never a torn state."""
    import threading

    from spark_iceberg_jobs_spark.sources.writers import (
        committed_versions,
        current_version,
        read_current_version,
        versioned_write,
    )

    tbl = str(tmp_path / "race_tbl")
    committed: list[int] = []
    errs: list[Exception] = []
    barrier = threading.Barrier(2)

    def writer(tag):
        df = spark.createDataFrame([(1, tag)], "k int, tag string")
        try:
            barrier.wait(timeout=30)
            committed.append(versioned_write(df, tbl))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    for rnd in range(3):
        committed.clear()
        errs.clear()
        ts = [
            threading.Thread(target=writer, args=(f"w{i}_{rnd}",)) for i in (1, 2)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
            assert not t.is_alive(), "versioned_write deadlocked"
        assert not errs, errs
        assert len(set(committed)) == 2, f"writers shared a version: {committed}"
        assert set(committed) <= set(committed_versions(tbl))
        assert current_version(tbl) in committed
        # the served table is exactly ONE writer's batch, intact
        assert read_current_version(spark, tbl).count() == 1


def test_versioned_refs_tag_branch_lifecycle(spark, tmp_path):
    """Named refs over the version protocol (VERDICT r9 item 7, Iceberg
    branch/tag semantics): a tagged version SURVIVES expiry until the
    tag drops; a branch rolls back without moving main; tags are
    immutable (create-twice raises); refs only ever pin COMMITTED
    versions."""
    import os

    import pytest

    from spark_iceberg_jobs_spark.sources.writers import (
        create_branch,
        create_tag,
        current_version,
        drop_ref,
        expire_versions,
        list_refs,
        read_ref,
        rollback_branch,
        versioned_write,
    )

    tbl = str(tmp_path / "reft")

    def frame(tag):
        return spark.createDataFrame([(1, tag)], "k int, tag string")

    for t in ("a", "b", "c", "d"):
        versioned_write(frame(t), tbl)
    assert current_version(tbl) == 4

    # tag v1 (an audit snapshot), branch "audit" at v3
    assert create_tag(tbl, "release-1", 1) == 1
    assert create_branch(tbl, "audit", 3) == 3
    assert list_refs(tbl) == {"tag.release-1": 1, "branch.audit": 3}
    with pytest.raises(ValueError, match="already exists"):
        create_tag(tbl, "release-1", 2)  # tags are immutable

    # expiry: keep_last=1 would normally keep only {4}; the tag pins v1
    # and the branch pins v3 — both survive, v2 goes
    removed = expire_versions(tbl, keep_last=1)
    assert removed == [2]
    assert read_ref(spark, tbl, "tag", "release-1").collect()[0].tag == "a"
    assert read_ref(spark, tbl, "branch", "audit").collect()[0].tag == "c"

    # branch rollback: audit moves 3 → 1 while MAIN stays at 4
    assert rollback_branch(tbl, "audit", 1) == 1
    assert read_ref(spark, tbl, "branch", "audit").collect()[0].tag == "a"
    assert current_version(tbl) == 4

    # refs gate on the commit marker: a torn dir cannot be tagged or
    # branched (same rule as rollback_version)
    frame("torn").write.mode("overwrite").parquet(os.path.join(tbl, "v000009"))
    with pytest.raises(ValueError, match="not a committed version"):
        create_tag(tbl, "bad", 9)
    with pytest.raises(ValueError, match="not committed"):
        create_branch(tbl, "bad", 9)
    with pytest.raises(ValueError, match="not a committed version"):
        rollback_branch(tbl, "audit", 9)

    # default branch point = current main
    assert create_branch(tbl, "wip") == 4

    # v3 was released the moment audit moved off it; dropping the tag and
    # the audit branch releases v1 too — the next expiry reclaims both
    # (the torn v9 orphan survives only as the newest version)
    drop_ref(tbl, "tag", "release-1")
    with pytest.raises(ValueError, match="does not exist"):
        drop_ref(tbl, "tag", "release-1")
    drop_ref(tbl, "branch", "audit")
    removed = expire_versions(tbl, keep_last=1)
    assert removed == [1, 3]  # v9 kept: it is the newest (keep_last=1)

    # a ref whose version dir was reclaimed out from under it (hand-built
    # here) must fail loudly on read, never serve another version
    with open(os.path.join(tbl, "refs", "branch.stale"), "w") as f:
        f.write("3")
    with pytest.raises(ValueError, match="directory is missing"):
        read_ref(spark, tbl, "branch", "stale")


def test_rollback_accepts_committed_but_unreferenced_version(spark, tmp_path):
    """A crash BETWEEN the commit marker and the repoint leaves a
    committed-but-never-current version; it passed its audits, so
    rollback (roll-FORWARD here) may serve it — the marker, not hint
    history, is the gate."""
    import os
    import shutil

    from spark_iceberg_jobs_spark.sources.writers import (
        current_version,
        read_current_version,
        rollback_version,
        versioned_write,
    )

    tbl = str(tmp_path / "fwd")
    versioned_write(spark.createDataFrame([(1, "base")], "k int, tag string"), tbl)

    # simulate marker-then-crash: commit v2 normally, then rewind the
    # hint file to v1 (as if the repoint never happened)
    versioned_write(spark.createDataFrame([(2, "next")], "k int, tag string"), tbl)
    hint = os.path.join(tbl, "version-hint.text")
    with open(hint + ".t", "w") as f:
        f.write("1")
    shutil.move(hint + ".t", hint)
    assert current_version(tbl) == 1

    assert rollback_version(tbl, 2) == 2  # marker present → servable
    assert read_current_version(spark, tbl).collect()[0].tag == "next"


def test_branch_wap_flow_and_fast_forward(spark, tmp_path):
    """Branch-scoped WAP (Iceberg's spark.wap.branch): a batch commits on
    the 'audit' branch — version dir + commit marker land, the branch ref
    moves — while MAIN's readers see nothing; audits run against the
    branch read; fast_forward publishes the branch head to main in one
    atomic hint replace. A second fast_forward of a missing branch, and
    of a hand-torn branch ref, both fail loudly."""
    import os

    import pytest

    from spark_iceberg_jobs_spark.sources.writers import (
        current_version,
        fast_forward,
        read_current_version,
        read_ref,
        versioned_write,
    )

    tbl = str(tmp_path / "wapb")
    versioned_write(spark.createDataFrame([(1, "live")], "k int, tag string"), tbl)
    assert current_version(tbl) == 1

    # stage on the branch: main must not move
    staged = spark.createDataFrame([(2, "staged")], "k int, tag string")
    v = versioned_write(staged, tbl, branch="audit")
    assert v == 2
    assert current_version(tbl) == 1, "main must not see the branch commit"
    assert read_current_version(spark, tbl).collect()[0].tag == "live"

    # audit against the BRANCH read (what was written is what is audited)
    branch_df = read_ref(spark, tbl, "branch", "audit")
    assert branch_df.collect()[0].tag == "staged"

    # publish: main adopts the branch head
    assert fast_forward(tbl, "audit") == 2
    assert current_version(tbl) == 2
    assert read_current_version(spark, tbl).collect()[0].tag == "staged"

    with pytest.raises(ValueError, match="does not exist"):
        fast_forward(tbl, "nope")
    # a branch ref pointing at an uncommitted version must not publish
    with open(os.path.join(tbl, "refs", "branch.torn"), "w") as f:
        f.write("9")
    os.mkdir(os.path.join(tbl, "v000009"))  # claimed, never committed
    with pytest.raises(ValueError, match="uncommitted"):
        fast_forward(tbl, "torn")


def test_version_history_metadata_table(spark, tmp_path):
    """version_history = the snapshots/history metadata table: one row
    per version dir with commit status, currency, and data-file stats;
    protocol files (_VERSION_COMMITTED, _SUCCESS, CRCs) never count as
    data files."""
    import os

    from spark_iceberg_jobs_spark.sources.writers import (
        rollback_version,
        version_history,
        versioned_write,
    )

    tbl = str(tmp_path / "hist")
    versioned_write(spark.createDataFrame([(1,)], "k int"), tbl)
    versioned_write(spark.createDataFrame([(2,), (3,)], "k int"), tbl)
    os.mkdir(os.path.join(tbl, "v000003"))  # torn claim: never committed
    rollback_version(tbl, 1)

    h = {r.version: r for r in version_history(spark, tbl).collect()}
    assert set(h) == {1, 2, 3}
    assert h[1].committed and h[1].is_current
    assert h[2].committed and not h[2].is_current
    assert not h[3].committed and not h[3].is_current
    assert h[1].n_data_files >= 1 and h[1].data_bytes > 0
    assert h[3].n_data_files == 0 and h[3].data_bytes == 0


def test_changelog_between_versions_multiset(spark, tmp_path):
    """Executed row-level CDF between two committed versions: an update
    is a delete+insert pair, duplicates diff with MULTISET semantics
    (one extra copy -> one changelog row), and uncommitted endpoints are
    rejected."""
    import os

    import pytest

    from spark_iceberg_jobs_spark.sources.writers import (
        changelog_between_versions,
        versioned_write,
    )

    tbl = str(tmp_path / "cdf")
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b"), (3, "c")], "k int, val string"
    )
    v2 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "C"), (4, "d")], "k int, val string"
    )
    versioned_write(v1, tbl)
    versioned_write(v2, tbl)

    ch = sorted(
        (r.k, r.val, r._change_type)
        for r in changelog_between_versions(spark, tbl, 1, 2).collect()
    )
    assert ch == [
        (2, "b", "delete"),   # one of the two duplicate copies went away
        (3, "C", "insert"),   # the update pair...
        (3, "c", "delete"),
        (4, "d", "insert"),
    ]

    os.mkdir(os.path.join(tbl, "v000007"))
    with pytest.raises(ValueError, match="not committed"):
        changelog_between_versions(spark, tbl, 1, 7)


def test_full_lakehouse_loop_wap_cdf_rollback_integration(spark, tmp_path):
    """The executed verbs compose into the complete lakehouse loop:
    v1 base -> MOR upsert staged on a WAP branch (main blind) -> audit on
    the branch read -> fast_forward publishes -> the executed row-level
    CDF between v1 and v2 is EXACTLY the upsert's delta (update = delete+
    insert pair, GDPR delete = bare delete) -> tag v1, rollback main to
    it, and the tagged pre-upsert state survives an aggressive expiry
    while the branch still serves v2."""
    from spark_iceberg_jobs_spark.operators.mor import mor_read_equality_deletes
    from spark_iceberg_jobs_spark.sources.writers import (
        changelog_between_versions,
        create_tag,
        current_version,
        expire_versions,
        fast_forward,
        read_current_version,
        read_ref,
        rollback_version,
        versioned_write,
    )

    tbl = str(tmp_path / "loop")
    base = spark.createDataFrame(
        [(1, "alice", 10), (2, "bob", 20), (3, "carol", 30)],
        "uid int, name string, score int",
    )
    assert versioned_write(base, tbl) == 1

    # stage the MOR-served upsert on the audit branch; main stays at v1
    deletes = spark.createDataFrame([(2,), (3,)], "uid int")
    appends = spark.createDataFrame(
        [(3, "carol", 35)], "uid int, name string, score int"
    )
    served = mor_read_equality_deletes(
        read_current_version(spark, tbl), deletes, appends, key_cols=["uid"]
    )
    assert versioned_write(served, tbl, branch="audit") == 2
    assert current_version(tbl) == 1

    # audit the branch read, then publish
    audit_rows = {tuple(r) for r in read_ref(spark, tbl, "branch", "audit").collect()}
    assert audit_rows == {(1, "alice", 10), (3, "carol", 35)}
    assert fast_forward(tbl, "audit") == 2

    # the executed CDF between the two committed versions IS the upsert
    ch = sorted(
        (r.uid, r.name, r.score, r._change_type)
        for r in changelog_between_versions(spark, tbl, 1, 2).collect()
    )
    assert ch == [
        (2, "bob", 20, "delete"),       # GDPR delete: bare delete
        (3, "carol", 30, "delete"),     # update pair...
        (3, "carol", 35, "insert"),
    ]

    # tag the pre-upsert state, roll main back to it, expire aggressively:
    # the tag pins v1, the branch still serves v2
    create_tag(tbl, "pre-upsert", 1)
    rollback_version(tbl, 1)
    removed = expire_versions(tbl, keep_last=1)
    assert removed == []  # v1 current+tagged, v2 newest+branch-pinned
    assert {tuple(r) for r in read_ref(spark, tbl, "tag", "pre-upsert").collect()} == {
        (1, "alice", 10),
        (2, "bob", 20),
        (3, "carol", 30),
    }
    assert {tuple(r) for r in read_ref(spark, tbl, "branch", "audit").collect()} == {
        (1, "alice", 10),
        (3, "carol", 35),
    }
