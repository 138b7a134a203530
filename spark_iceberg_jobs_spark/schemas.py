"""Explicit StructType schemas.

The reference reads CSV with ``inferSchema=true`` (job1:53) *and* declares a
fixed DDL schema (job1:184-275), never reconciling the two — its
``mode("overwrite").saveAsTable`` can clobber the declared schema with the
inferred one (SURVEY.md §1.3). This engine's rule: **schemas are explicit at
read time**; inference is opt-in for exploration only.

Two families:

- ``FIXTURE_SCHEMAS``: the driver's TPC-H-ish parquet tables
  (/root/testdata/sf*/; FIXTURES.md §A) — used by every query.
- ``BOOTCAMP_SCHEMAS``: the reference's five Iceberg tables
  (job1:185-274; FIXTURES.md §B) — used by the ingestion/DDL parity layer.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)


def _st(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])  # type: ignore[arg-type]


# --------------------------------------------------------------------------
# A. Driver fixture tables (FIXTURES.md §A, verified against parquet footers)
# --------------------------------------------------------------------------

FIXTURE_SCHEMAS: dict[str, StructType] = {
    "region": _st(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _st(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _st(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _st(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _st(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _st(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        # parquet timestamp[ms], not UTC-adjusted → Spark 4 reads TIMESTAMP_NTZ
        ("o_orderdate", TimestampNTZType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _st(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampNTZType()),
    ),
    "events": _st(
        ("event_id", LongType()),
        ("ts", TimestampType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _st(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _st(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}

FIXTURE_TABLES: tuple[str, ...] = tuple(FIXTURE_SCHEMAS)


# --------------------------------------------------------------------------
# B. Reference bootcamp tables (Iceberg DDL job1:185-274; FIXTURES.md §B).
#    Canonical name is the plural `medals_matches_players` (the reference's
#    DDL drops the "s" — job1:241 vs job1:139; see SURVEY.md §1.3).
# --------------------------------------------------------------------------

MATCH_DETAILS = _st(
    ("match_id", StringType()),
    ("player_gamertag", StringType()),
    ("previous_spartan_rank", IntegerType()),
    ("spartan_rank", IntegerType()),
    ("previous_total_xp", IntegerType()),
    ("total_xp", IntegerType()),
    ("previous_csr_tier", IntegerType()),
    ("previous_csr_designation", IntegerType()),
    ("previous_csr", IntegerType()),
    ("previous_csr_percent_to_next_tier", IntegerType()),
    ("previous_csr_rank", IntegerType()),
    ("current_csr_tier", IntegerType()),
    ("current_csr_designation", IntegerType()),
    ("current_csr", IntegerType()),
    ("current_csr_percent_to_next_tier", IntegerType()),
    ("current_csr_rank", IntegerType()),
    ("player_rank_on_team", IntegerType()),
    ("player_finished", BooleanType()),
    ("player_average_life", StringType()),
    ("player_total_kills", IntegerType()),
    ("player_total_headshots", IntegerType()),
    ("player_total_weapon_damage", DoubleType()),
    ("player_total_shots_landed", IntegerType()),
    ("player_total_melee_kills", IntegerType()),
    ("player_total_melee_damage", DoubleType()),
    ("player_total_assassinations", IntegerType()),
    ("player_total_ground_pound_kills", IntegerType()),
    ("player_total_shoulder_bash_kills", IntegerType()),
    ("player_total_grenade_damage", DoubleType()),
    ("player_total_power_weapon_damage", DoubleType()),
    ("player_total_power_weapon_grabs", IntegerType()),
    ("player_total_deaths", IntegerType()),
    ("player_total_assists", IntegerType()),
    ("player_total_grenade_kills", IntegerType()),
    ("did_win", IntegerType()),
    ("team_id", IntegerType()),
)

MATCHES = _st(
    ("match_id", StringType()),
    ("mapid", StringType()),
    ("is_team_game", BooleanType()),
    ("playlist_id", StringType()),
    ("game_variant_id", StringType()),
    ("is_match_over", BooleanType()),
    ("completion_date", TimestampType()),
    ("match_duration", StringType()),
    ("game_mode", StringType()),
    ("map_variant_id", StringType()),
)

MEDALS_MATCHES_PLAYERS = _st(
    ("match_id", StringType()),
    ("player_gamertag", StringType()),
    ("medal_id", LongType()),
    ("count", IntegerType()),
)

MAPS = _st(
    ("mapid", StringType()),
    ("name", StringType()),
    ("description", StringType()),
)

MEDALS = _st(
    ("medal_id", LongType()),
    ("sprite_uri", StringType()),
    ("sprite_left", IntegerType()),
    ("sprite_top", IntegerType()),
    ("sprite_sheet_width", IntegerType()),
    ("sprite_sheet_height", IntegerType()),
    ("sprite_width", IntegerType()),
    ("sprite_height", IntegerType()),
    ("classification", StringType()),
    ("description", StringType()),
    ("name", StringType()),
    ("difficulty", IntegerType()),
)

BOOTCAMP_SCHEMAS: dict[str, StructType] = {
    "match_details": MATCH_DETAILS,
    "matches": MATCHES,
    "medals_matches_players": MEDALS_MATCHES_PLAYERS,
    "maps": MAPS,
    "medals": MEDALS,
}

#: Partition spec per bootcamp table (job1:224,239,248,256,273).
BOOTCAMP_PARTITIONING: dict[str, str] = {
    "match_details": "bucket(16, match_id)",
    "matches": "bucket(16, match_id)",
    "medals_matches_players": "bucket(16, match_id)",
    "maps": "mapid",
    "medals": "medal_id",
}
