"""Ingestion pipeline parity (reference job1) on synthesized CSVs."""

from __future__ import annotations

import pytest

from spark_iceberg_jobs_spark.ingest import load_bootcamp_csvs, run_ingestion
from spark_iceberg_jobs_spark.plans.explain import count_shuffle_exchanges
from spark_iceberg_jobs_spark.schemas import BOOTCAMP_SCHEMAS


@pytest.fixture(scope="module")
def bootcamp_csvs(tmp_path_factory):
    """Tiny deterministic bootcamp CSVs (FIXTURES.md §B synthesis
    constraints: shared match_ids, low-cardinality playlist/map ids, a
    'Killing Spree' medal)."""
    d = tmp_path_factory.mktemp("bootcamp_csv")
    matches = d / "matches.csv"
    match_details = d / "match_details.csv"
    mmp = d / "medals_matches_players.csv"
    maps_f = d / "maps.csv"
    medals = d / "medals.csv"

    maps_f.write_text("mapid,name,description\nm1,Alpine,snow\nm2,Truth,remake\n")
    medals.write_text(
        "medal_id,sprite_uri,sprite_left,sprite_top,sprite_sheet_width,"
        "sprite_sheet_height,sprite_width,sprite_height,classification,"
        "description,name,difficulty\n"
        "1,u,0,0,10,10,1,1,kill,desc,Killing Spree,3\n"
        "2,u,0,0,10,10,1,1,style,desc,Perfect Kill,2\n"
    )
    matches.write_text(
        "match_id,mapid,is_team_game,playlist_id,game_variant_id,is_match_over,"
        "completion_date,match_duration,game_mode,map_variant_id\n"
        + "".join(
            f"match{i},m{i % 2 + 1},true,p{i % 2},gv,true,"
            f"2024-01-0{i % 9 + 1}T00:00:00.000Z,PT10M,slayer,mv\n"
            for i in range(8)
        )
    )
    header = ",".join(f.name for f in BOOTCAMP_SCHEMAS["match_details"].fields)
    rows = "".join(
        f"match{i},player{j}," + ",".join(["1"] * 15) + ",true,PT1M,"
        + f"{10 + i + j},3,100.5,50,2,25.0,1,0,0,12.5,80.0,2,7,3,1,{(i + j) % 2},1\n"
        for i in range(8)
        for j in range(2)
    )
    match_details.write_text(header + "\n" + rows)
    mmp.write_text(
        "match_id,player_gamertag,medal_id,count\n"
        + "".join(
            f"match{i},player{j},{(i + j) % 2 + 1},{i + 1}\n"
            for i in range(8)
            for j in range(2)
        )
    )
    return {
        "match_details": str(match_details),
        "matches": str(matches),
        "medals_matches_players": str(mmp),
        "maps": str(maps_f),
        "medals": str(medals),
    }


def test_load_with_explicit_schemas(spark, bootcamp_csvs):
    dfs = load_bootcamp_csvs(spark, bootcamp_csvs)
    assert dfs["matches"].schema == BOOTCAMP_SCHEMAS["matches"]
    assert dfs["match_details"].count() == 16
    row = dfs["matches"].orderBy("match_id").first()
    assert row.completion_date.year == 2024  # TIMESTAMP parsed, not string


def test_run_ingestion_bucketed_fallback(spark, bootcamp_csvs):
    run_ingestion(spark, bootcamp_csvs, namespace="bootcamp", n_buckets=4)
    for name in BOOTCAMP_SCHEMAS:
        assert spark.table(f"bootcamp.{name}").count() > 0, name

    # declared schema survives the write (the §1.3 bug is fixed)
    got = spark.table("bootcamp.matches").schema
    assert {f.name: f.dataType.simpleString() for f in got} == {
        f.name: f.dataType.simpleString() for f in BOOTCAMP_SCHEMAS["matches"].fields
    }

    # the three fact tables join on match_id with no shuffle (README.md:18)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = (
            spark.table("bootcamp.match_details")
            .select("match_id", "player_gamertag", "player_total_kills")
            .join(spark.table("bootcamp.matches").select("match_id", "mapid"), "match_id")
            .join(
                spark.table("bootcamp.medals_matches_players").select(
                    "match_id", "medal_id", "count"
                ),
                "match_id",
            )
        )
        assert count_shuffle_exchanges(j) == 0
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_readme_analytics_on_bootcamp_tables(spark, bootcamp_csvs):
    """The four README questions (README.md:19-23) run on the ingested
    tables with the expected winners."""
    from pyspark.sql import functions as F

    from spark_iceberg_jobs_spark.operators.aggs import (
        avg_metric_per_key,
        distinct_count_per_key,
        filtered_sum_per_key,
    )

    run_ingestion(spark, bootcamp_csvs, namespace="bootcamp2", n_buckets=4)
    md = spark.table("bootcamp2.match_details")
    matches = spark.table("bootcamp2.matches")
    mmp = spark.table("bootcamp2.medals_matches_players")
    maps_t = spark.table("bootcamp2.maps")
    medals = spark.table("bootcamp2.medals")

    # A1: which player averages the most kills
    a1 = avg_metric_per_key(md, "player_gamertag", "player_total_kills").first()
    assert a1.player_gamertag == "player1"

    # A2: which playlist is played most (countDistinct match_id)
    a2 = distinct_count_per_key(matches, "playlist_id", "match_id").first()
    assert a2.n_match_id == 4

    # A3: which map is played most
    a3 = distinct_count_per_key(
        matches.join(F.broadcast(maps_t), "mapid"), "name", "match_id"
    ).first()
    assert a3.n_match_id == 4

    # A4: which map gets the most Killing Spree medals
    joined = (
        mmp.join(F.broadcast(medals), "medal_id")
        .join(matches.select("match_id", "mapid"), "match_id")
        .join(F.broadcast(maps_t.withColumnRenamed("name", "map_name")), "mapid")
    )
    a4 = filtered_sum_per_key(
        joined, F.col("name") == "Killing Spree", "map_name", "count"
    ).first()
    assert a4.map_name in {"Alpine", "Truth"}
    assert a4.sum_count > 0
