"""LLM-data-pipeline queries (EXTENSION X1-X5; SURVEY.md §2.7).

Every query here carries a DuckDB oracle — including the sketch tier
(MinHash-LSH, SimHash, SRP-LSH, IVF): their hashing is *portable* (md5-based,
and the SRP planes are md5-derived Python-side literals), so the oracles
replay signatures, banding, candidate generation, and rescoring bit-for-bit.
The sketches are additionally cross-validated against the exact variants in
tests/ (recall, precision-subset, hamming bounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import (
    connected_dup_clusters,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from ..operators.multimodal import attach_binary_payload, extract_payload_features
from ..operators.similarity import (
    bruteforce_topk,
    centroid_similarity,
    ivf_topk,
    lsh_topk,
    srp_plane_sql_values,
)
from ..operators.text import fingerprints, lang_profile, language_id, quality_scores, top_terms
from ..sources.readers import load_tables, read_fixture
from . import QuerySpec

_BM25_K1 = 1.2
# In-process index-metadata cache, keyed by artifact content fingerprint
# (immutable by construction — a source change flips the key). Holds the
# forward-index rows of the fixed query docs and the prune-gate
# selectivity — the per-query values every serving system keeps beside
# the segment (Lucene's field/term stats). Bounded: oldest evicted past 8
# corpora. Purely a memo of deterministic artifact-derived values; cold
# calls compute them from the artifact (test-covered both ways).
_BM25_META_CACHE: dict[str, dict] = {}
_BM25_META_CACHE_MAX = 8
# Serve-side scan-prune gate (cost-based, Lucene-style): apply the
# term/bucket scan filters only when the query terms cover at most this
# fraction of base POSTING ROWS (estimated exactly from the persisted df
# table: Σ df[qterms] / Σ df — tf rows are doc-term pairs, so the ratio
# IS the row selectivity). Above it, the per-row string INSET costs more
# than the prune saves and the broadcast qtf join already drops the rest
# (measured: +2.1 s at the 64× lab point where qterms matched 2/3 of
# rows). Tests monkeypatch this to force either path.
_BM25_PRUNE_MAX_SEL = 0.25
_BM25_B = 0.75

# --------------------------------------------------------------------------
# X1/X2 — deduplication
# --------------------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(read_fixture(spark, sf_dir, "documents"))


DEDUP_EXACT_ORACLE = """
SELECT MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS text_hash,
       MIN(doc_id) AS keeper_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(read_fixture(spark, sf_dir, "documents"), threshold=0.8)


DEDUP_JACCARD_ORACLE = """
WITH toks AS (
    SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
), sh AS (
    SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
    FROM toks, UNNEST(RANGE(1, LEN(t) - 1)) AS r(i)
), sizes AS (
    SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(n_common::DOUBLE / (sa.n + sb.n - n_common), 4) AS jaccard
FROM pairs
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.8
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable-hash MinHash+LSH (md5-based minhash → DuckDB replays the
    same signatures, banding, and Jaccard estimate bit-for-bit)."""
    return minhash_lsh_pairs(read_fixture(spark, sf_dir, "documents"), est_threshold=0.7)


def _minhash_oracle_sql(num_hashes: int = 32, bands: int = 8, est_threshold: float = 0.7) -> str:
    """DuckDB replay of minhash_lsh_pairs with portable md5 hashing: same
    shingles (the Jaccard oracle's CTE), same salted-md5 lexicographic-min
    signatures, same band buckets, same agreement fraction."""
    rows = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN(MD5('{i}:' || shingle)) AS mh_{i}" for i in range(num_hashes)
    )
    buckets = "\n    UNION ALL ".join(
        "SELECT doc_id, {b} AS band, MD5({expr}) AS bucket FROM sig".format(
            b=bi,
            expr=" || '|' || ".join(f"mh_{bi * rows + r}" for r in range(rows)),
        )
        for bi in range(bands)
    )
    agree = " + ".join(
        f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END" for i in range(num_hashes)
    )
    return f"""
WITH toks AS (
    SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
), sh AS (
    SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
    FROM toks, UNNEST(RANGE(1, LEN(t) - 1)) AS r(i)
), sig AS (
    SELECT doc_id,
         {mins}
    FROM sh GROUP BY doc_id
), banded AS (
    {buckets}
), cands AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), est AS (
    SELECT doc_a, doc_b, ROUND(({agree}) / {num_hashes}.0, 4) AS est_jaccard
    FROM cands
    JOIN sig sa ON doc_a = sa.doc_id
    JOIN sig sb ON doc_b = sb.doc_id
)
SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= {est_threshold}
"""


DEDUP_MINHASH_ORACLE = _minhash_oracle_sql()


def dedup_minhash_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality evaluation: MinHash-LSH candidate pairs scored
    against the exact n-gram-Jaccard ground truth — the measured
    precision/recall answer to "can we trust the sketch at 100 TB, where
    the exact join is unaffordable?". Truth = exact Jaccard ≥ 0.8;
    candidates = the production LSH config (est ≥ 0.7). One row:
    pair counts, hits, precision, recall (ratios of exact integers — no
    float-order hazard). The full-outer merge of the two pair sets keeps
    the whole evaluation one lazy plan; both sides reuse the verified
    operators, so the eval measures the REAL pipeline, and the oracle
    replays truth AND sketch from scratch."""
    docs = read_fixture(spark, sf_dir, "documents")
    truth = (
        ngram_jaccard_pairs(docs, threshold=0.8)
        .select("doc_a", "doc_b")
        .withColumn("in_truth", F.lit(1))
    )
    cands = (
        minhash_lsh_pairs(docs, est_threshold=0.7)
        .select("doc_a", "doc_b")
        .withColumn("in_cand", F.lit(1))
    )
    merged = truth.join(cands, ["doc_a", "doc_b"], "full_outer").fillna(
        0, subset=["in_truth", "in_cand"]
    )
    n_true = F.sum("in_truth").cast("long")
    n_cand = F.sum("in_cand").cast("long")
    n_hit = F.sum(F.col("in_truth") * F.col("in_cand")).cast("long")
    return merged.agg(
        n_true.alias("n_true_pairs"),
        n_cand.alias("n_candidates"),
        n_hit.alias("n_hits"),
        F.round(n_hit.cast("double") / n_cand, 6).alias("precision"),
        F.round(n_hit.cast("double") / n_true, 6).alias("recall"),
    )


def _minhash_quality_oracle_sql() -> str:
    """Truth chain (exact Jaccard ≥ 0.8) + the minhash replay, merged into
    the one-row precision/recall report. sh is MATERIALIZED — it feeds
    four consumers and DuckDB would otherwise re-expand the shingle
    explode per reference (the BPE-chain lesson)."""
    minhash_body = _minhash_oracle_sql()
    # reuse the sig/banded/cands/est chain; strip its WITH prefix and
    # final SELECT, then append the eval tail
    inner = minhash_body.split("WITH", 1)[1].rsplit("SELECT doc_a", 1)[0].rstrip()
    inner = inner.rstrip()
    assert inner.endswith(")"), "unexpected minhash oracle shape"
    # sh feeds four consumers here (sig, sizes, jpairs x2) — materialize it
    inner = inner.replace("), sh AS (", "), sh AS MATERIALIZED (", 1)
    assert "sh AS MATERIALIZED" in inner
    return f"""
WITH {inner},
lsh AS (
    SELECT doc_a, doc_b FROM est WHERE est_jaccard >= 0.7
), sizes AS (
    SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), jpairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), truth AS (
    SELECT doc_a, doc_b
    FROM jpairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.8
), counts AS (
    SELECT (SELECT COUNT(*) FROM truth) AS n_true_pairs,
           (SELECT COUNT(*) FROM lsh) AS n_candidates,
           (SELECT COUNT(*) FROM truth t JOIN lsh l
             ON t.doc_a = l.doc_a AND t.doc_b = l.doc_b) AS n_hits
)
SELECT CAST(n_true_pairs AS BIGINT) AS n_true_pairs,
       CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_hits AS BIGINT) AS n_hits,
       ROUND(CAST(n_hits AS DOUBLE) / n_candidates, 6) AS precision,
       ROUND(CAST(n_hits AS DOUBLE) / n_true_pairs, 6) AS recall
FROM counts
"""


DEDUP_MINHASH_QUALITY_ORACLE = _minhash_quality_oracle_sql()


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable-hash SimHash (md5-bit token hashes → DuckDB recomputes the
    identical 64-bit fingerprints, pigeonhole bands, and hamming filter)."""
    return simhash_near_pairs(read_fixture(spark, sf_dir, "documents"), max_hamming=3)


def _simhash_oracle_sql(max_hamming: int = 3, bands: int = 4) -> str:
    """DuckDB replay of simhash_near_pairs with portable md5-bit hashing:
    token-hash bit j = bit j%4 of hex digit j/4 of md5(token); per-doc
    bit-sign sums -> 16-bit band chunks -> pigeonhole self-join -> hamming."""
    hex_digits = "0123456789abcdef"
    bit_sums = ",\n         ".join(
        f"SUM(CASE WHEN ((STRPOS('{hex_digits}', SUBSTR(h, {j // 4 + 1}, 1)) - 1) "
        f">> {j % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS b_{j}"
        for j in range(64)
    )
    width = 64 // bands
    chunk_exprs = ",\n         ".join(
        "("
        + " + ".join(
            f"(CASE WHEN b_{bi * width + r} > 0 THEN {1 << r} ELSE 0 END)"
            for r in range(width)
        )
        + f") AS c_{bi}"
        for bi in range(bands)
    )
    bucket_union = "\n    UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band, c_{bi} AS chunk FROM chunks" for bi in range(bands)
    )
    hamming = " + ".join(f"BIT_COUNT(XOR(ca.c_{bi}, cb.c_{bi}))" for bi in range(bands))
    return f"""
WITH toks AS (
    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
), th AS (
    SELECT doc_id, MD5(tok) AS h FROM toks
), sums AS (
    SELECT doc_id,
         {bit_sums}
    FROM th GROUP BY doc_id
), chunks AS (
    SELECT doc_id,
         {chunk_exprs}
    FROM sums
), banded AS (
    {bucket_union}
), cands AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, ({hamming}) AS hamming
FROM cands
JOIN chunks ca ON doc_a = ca.doc_id
JOIN chunks cb ON doc_b = cb.doc_id
WHERE ({hamming}) <= {max_hamming}
"""


DEDUP_SIMHASH_ORACLE = _simhash_oracle_sql()


def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment over the corpus —
    pure function of md5(doc_id), so it is stable across runs, retries,
    appends, and engines (the DuckDB oracle recomputes the identical
    assignment). Returns per-split counts + doc_id checksums proving the
    exact membership, not just the proportions. Zero-shuffle assignment;
    the only exchange is the final 3-group aggregate."""
    from ..operators.splits import assign_split

    docs = read_fixture(spark, sf_dir, "documents")
    return (
        assign_split(docs, key_col="doc_id", weights={"train": 0.9, "val": 0.05, "test": 0.05})
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").alias("sum_doc_ids"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("split")
    )


def _split_oracle_sql() -> str:
    from ..operators.splits import _hex_threshold

    t_train = _hex_threshold(0.9)
    t_val = _hex_threshold(0.95)
    return f"""
WITH assigned AS (
    SELECT doc_id, n_chars,
           CASE WHEN SUBSTR(MD5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) < '{t_train}'
                THEN 'train'
                WHEN SUBSTR(MD5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) < '{t_val}'
                THEN 'val'
                ELSE 'test' END AS split
    FROM documents
)
SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_ids,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM assigned
GROUP BY split
ORDER BY split
"""


SPLIT_ORACLE = _split_oracle_sql()

_SAMPLE_RATES = {"en": 0.25, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 0.5}


def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: downsample the dominant language
    (en at 25%) while keeping half of each minority language — the standard
    rebalancing move before training. Keep/drop is a pure function of
    md5(doc_id) under per-stratum thresholds (stable across runs/appends/
    engines; DuckDB oracle recomputes identical membership). The filter is
    a zero-shuffle row-local decision fused into the scan."""
    from ..operators.splits import stratified_sample

    docs = read_fixture(spark, sf_dir, "documents")
    return (
        stratified_sample(docs, key_col="doc_id", rates=_SAMPLE_RATES, stratum_col="lang")
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"), F.sum("doc_id").alias("sum_doc_ids"))
        .orderBy("lang")
    )


def _sample_oracle_sql() -> str:
    from ..operators.splits import _hex_threshold

    conds = " OR ".join(
        f"(lang = '{lang}' AND SUBSTR(MD5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8)"
        f" < '{_hex_threshold(rate)}')"
        for lang, rate in _SAMPLE_RATES.items()
    )
    return f"""
SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(doc_id) AS BIGINT) AS sum_doc_ids
FROM documents
WHERE {conds}
GROUP BY lang
ORDER BY lang
"""


SAMPLE_ORACLE = _sample_oracle_sql()


def pack_sequences_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (512-token chunks within each
    language shard) summarized per chunk: how many docs start in it and
    their token mass. The packing offset is a lang-partitioned window
    cumsum — parallel across shards, no global sort — and deterministic,
    so DuckDB replays the assignment exactly."""
    from ..operators.splits import pack_sequences

    docs = read_fixture(spark, sf_dir, "documents")
    packed = pack_sequences(docs, budget=512, shard_col="lang")
    return (
        packed.groupBy("lang", "chunk_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("chunk_tokens"))
        .orderBy("lang", "chunk_id")
    )


PACK_ORACLE = """
WITH t AS (
    SELECT doc_id, lang, LEN(STRING_SPLIT(text, ' ')) AS n_tokens FROM documents
), o AS (
    SELECT doc_id, lang, n_tokens,
           COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
    FROM t
)
SELECT lang, CAST(FLOOR(off / 512.0) AS BIGINT) AS chunk_id,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens
FROM o
GROUP BY lang, chunk_id
ORDER BY lang, chunk_id
"""


def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-append dedup: a deterministic ~1/8 of documents plays the
    incoming batch (md5-threshold selection), the rest is the
    already-ingested corpus represented ONLY by its fingerprint index;
    report which batch rows survive within-batch + against-index dedup —
    the per-increment shape of a production ingestion pipeline."""
    from ..operators.dedup import exact_dedup, incremental_dedup

    docs = read_fixture(spark, sf_dir, "documents")
    is_batch = (
        F.substring(F.md5(F.concat(F.lit("batch:"), F.col("doc_id").cast("string"))), 1, 8)
        < "20000000"
    )
    index = exact_dedup(docs.filter(~is_batch)).select("text_hash")
    return incremental_dedup(docs.filter(is_batch), index)


DEDUP_INCREMENTAL_ORACLE = """
WITH tagged AS (
    SELECT doc_id,
           MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS h,
           SUBSTR(MD5('batch:' || CAST(doc_id AS VARCHAR)), 1, 8) < '20000000' AS is_batch
    FROM documents
), kept AS (
    SELECT h AS text_hash, MIN(doc_id) AS doc_id
    FROM tagged WHERE is_batch GROUP BY h
)
SELECT doc_id, text_hash
FROM kept
WHERE text_hash NOT IN (SELECT h FROM tagged WHERE NOT is_batch)
"""


def decontaminate_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: a deterministic ~1/8 of documents plays the
    eval benchmark (md5-threshold selection — same portable trick as the
    split tier), the rest is the training corpus; report every training doc
    sharing >= 1 distinct 5-gram with any eval doc. The broadcast-eval /
    shuffle-free-train join shape is the 100 TB decontamination pass."""
    from ..operators.dedup import ngram_contamination

    docs = read_fixture(spark, sf_dir, "documents")
    is_eval = (
        F.substring(F.md5(F.concat(F.lit("eval:"), F.col("doc_id").cast("string"))), 1, 8)
        < "20000000"
    )
    return ngram_contamination(docs.filter(~is_eval), docs.filter(is_eval), n=5)


DECONTAMINATE_ORACLE = """
WITH ev_ids AS (
    SELECT doc_id FROM documents
    WHERE SUBSTR(MD5('eval:' || CAST(doc_id AS VARCHAR)), 1, 8) < '20000000'
), toks AS (
    SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] AS shingle
    FROM toks, UNNEST(RANGE(1, LEN(t) - 3)) AS r(i)
), tr AS (
    SELECT * FROM sh WHERE doc_id NOT IN (SELECT doc_id FROM ev_ids)
), ev AS (
    SELECT doc_id AS eval_id, shingle FROM sh
    WHERE doc_id IN (SELECT doc_id FROM ev_ids)
), sizes AS (
    SELECT doc_id, COUNT(*) AS n_shingles FROM tr GROUP BY doc_id
), hits AS (
    SELECT tr.doc_id,
           COUNT(DISTINCT tr.shingle) AS n_hit,
           COUNT(DISTINCT ev.eval_id) AS n_eval_docs
    FROM tr JOIN ev ON tr.shingle = ev.shingle
    GROUP BY tr.doc_id
    HAVING COUNT(DISTINCT tr.shingle) >= 1
)
SELECT doc_id, n_shingles, n_hit, n_eval_docs,
       ROUND(n_hit::DOUBLE / n_shingles, 4) AS contamination
FROM hits JOIN sizes USING (doc_id)
"""


def graph_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer↔supplier trade graph (edge when a
    customer's order contains a supplier's lineitem): the entity-influence
    pattern a data pipeline uses for source weighting. Fixed 5 iterations,
    damping 0.85, undirected — a bounded driver loop of shuffle-keyed
    join+groupBy rounds, lineage-checkpointed per round. The DuckDB oracle
    unrolls the same 5 rounds as chained CTEs and must agree to 4 decimals
    on the top-20 ranks."""
    from ..operators.graph import pagerank

    t = load_tables(spark, sf_dir, "orders", "lineitem")
    edges = (
        t["orders"]
        .join(t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(edges, iterations=5, damping=0.85)
    return (
        ranks.orderBy(F.desc("rank"), F.asc("node"))
        .limit(20)
        .select("node", F.round("rank", 4).alias("rank"))
    )


def _pagerank_oracle_sql(iterations: int = 5, damping: float = 0.85) -> str:
    """Unrolled-CTE replay of operators/graph.pagerank: same symmetrized
    edge list, same r' = (1-d) + d*sum(r/deg) per round, same rounding."""
    rounds = []
    for i in range(1, iterations + 1):
        rounds.append(
            f"""r{i} AS (
    SELECT s.dst AS node,
           {1 - damping} + {damping} * SUM(p.r / d.deg) AS r
    FROM sym s
    JOIN r{i - 1} p ON s.src = p.node
    JOIN deg d ON s.src = d.node
    GROUP BY s.dst
)"""
        )
    chain = ",\n".join(rounds)
    return f"""
WITH e AS (
    SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                    's' || CAST(l_suppkey AS VARCHAR) AS dst
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), sym AS (
    SELECT src, dst FROM e
    UNION
    SELECT dst, src FROM e
), deg AS (
    SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY src
), r0 AS (
    SELECT node, CAST(1.0 AS DOUBLE) AS r FROM deg
),
{chain}
SELECT node, ROUND(r, 4) AS rank
FROM r{iterations}
ORDER BY r DESC, node
LIMIT 20
"""


PAGERANK_ORACLE = _pagerank_oracle_sql()


# --------------------------------------------------------------------------
# X4 — text analysis
# --------------------------------------------------------------------------


def text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_profile(read_fixture(spark, sf_dir, "documents"))


LANG_PROFILE_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       ROUND(AVG(n_chars), 2) AS avg_chars,
       ROUND(AVG(LEN(STRING_SPLIT(text, ' '))), 2) AS avg_tokens
FROM documents
GROUP BY lang
ORDER BY lang
"""


def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(read_fixture(spark, sf_dir, "documents"))


_HITS = {
    "en": "('the','a','of','and','to','in','is','on','for','with')",
    "de": "('der','die','das','und','ist','von','zu','mit','auf','ein')",
    "fr": "('le','la','les','et','est','de','un','une','dans','pour')",
    "es": "('el','la','los','y','es','de','un','una','en','por')",
    "zh": "('的','了','是','我','不','在','有','这','他','们')",
}
_HITS_SQL = ",\n           ".join(
    f"LEN(LIST_FILTER(STRING_SPLIT(text,' '), t -> t IN {words})) AS h_{lang}"
    for lang, words in _HITS.items()
)
LANGID_ORACLE = f"""
WITH scored AS (
    SELECT lang,
           {_HITS_SQL}
    FROM documents
), pred AS (
    SELECT lang,
           CASE WHEN h_en >= GREATEST(h_de, h_fr, h_es, h_zh) THEN 'en'
                WHEN h_de >= GREATEST(h_en, h_fr, h_es, h_zh) THEN 'de'
                WHEN h_fr >= GREATEST(h_en, h_de, h_es, h_zh) THEN 'fr'
                WHEN h_es >= GREATEST(h_en, h_de, h_fr, h_zh) THEN 'es'
                ELSE 'zh' END AS predicted_lang
    FROM scored
)
SELECT lang, predicted_lang, COUNT(*) AS n_docs
FROM pred
GROUP BY lang, predicted_lang
ORDER BY lang, predicted_lang
"""


def text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_scores(read_fixture(spark, sf_dir, "documents"))


QUALITY_ORACLE = """
WITH feats AS (
    SELECT source,
           LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
           (LENGTH(text) - (LEN(STRING_SPLIT(text, ' ')) - 1))
               / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) AS awl,
           LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
               t -> t IN ('the','a','of','and','to','in','is','on','for','with')))
               / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) AS stop_ratio
    FROM documents
), scored AS (
    SELECT source, n_tokens,
           ROUND(LEAST(n_tokens / 100.0, 1.0) * 0.5
                 + LEAST(stop_ratio * 5, 1.0) * 0.3
                 + CASE WHEN awl >= 3 AND awl <= 8 THEN 0.2 ELSE 0.0 END,
                 4) AS quality_score
    FROM feats
)
SELECT source, COUNT(*) AS n_docs,
       ROUND(CAST(SUM(CAST(quality_score AS DECIMAL(28,4))) AS DOUBLE)
             / COUNT(quality_score), 4) AS avg_quality,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(n_tokens), 2) AS avg_tokens
FROM scored
GROUP BY source
ORDER BY source
"""


def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_terms(read_fixture(spark, sf_dir, "documents"), k=20)


TOP_TERMS_ORACLE = """
SELECT term, COUNT(*) AS n
FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents)
GROUP BY term
ORDER BY n DESC, term
LIMIT 20
"""


def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by pointwise mutual information — the vocab-building
    signal; aggregations carry vocabulary, never token streams."""
    from ..operators.text import bigram_pmi

    return bigram_pmi(read_fixture(spark, sf_dir, "documents"), min_count=5, k=15)


BIGRAM_PMI_ORACLE = """
WITH toks AS (
    SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
), big AS (
    SELECT t[i] AS x, t[i+1] AS y
    FROM toks, UNNEST(RANGE(1, LEN(t))) AS r(i)
), uni AS (
    SELECT UNNEST(t) AS tok FROM toks
), bc AS (
    SELECT x, y, COUNT(*) AS c_xy FROM big GROUP BY x, y
), uc AS (
    SELECT tok, COUNT(*) AS c_t FROM uni GROUP BY tok
), nb AS (SELECT COUNT(*) AS n_bigrams FROM big),
   nt AS (SELECT COUNT(*) AS n_tokens FROM uni)
SELECT x, y, c_xy,
       ROUND(LN((c_xy / n_bigrams)
                / ((cx.c_t / n_tokens) * (cy.c_t / n_tokens))), 4) AS pmi
FROM bc
JOIN uc cx ON bc.x = cx.tok
JOIN uc cy ON bc.y = cy.tok, nb, nt
WHERE c_xy >= 5
ORDER BY (LN((c_xy / n_bigrams)
             / ((cx.c_t / n_tokens) * (cy.c_t / n_tokens)))) DESC, x, y
LIMIT 15
"""


def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most repetitive documents by Gopher-style signals (distinct
    ratio, dominant token/bigram shares) — the boilerplate/degeneration
    filter stage of corpus curation."""
    from ..operators.text import repetition_stats

    return repetition_stats(read_fixture(spark, sf_dir, "documents"), k=20)


REPETITION_ORACLE = """
WITH toks AS (
    SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
), tok AS (
    SELECT doc_id, UNNEST(t) AS tok FROM toks
), tc AS (
    SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2
), tstat AS (
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_distinct, MAX(c) AS top_tok
    FROM tc GROUP BY doc_id
), big AS (
    SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
    FROM toks, UNNEST(RANGE(1, LEN(t))) AS r(i)
), bc AS (
    SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY 1, 2
), bstat AS (
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams, MAX(c) AS top_bigram
    FROM bc GROUP BY doc_id
), scored AS (
    SELECT doc_id, n_tokens, n_distinct,
           n_distinct::DOUBLE / n_tokens AS dr,
           top_tok::DOUBLE / n_tokens AS ttf,
           top_bigram::DOUBLE / n_bigrams AS tbf
    FROM tstat JOIN bstat USING (doc_id)
)
SELECT doc_id, n_tokens, n_distinct,
       ROUND(dr, 4) AS distinct_ratio,
       ROUND(ttf, 4) AS top_token_frac,
       ROUND(tbf, 4) AS top_bigram_frac,
       (dr < 0.35 OR tbf > 0.10) AS flagged
FROM scored
ORDER BY tbf DESC, dr ASC, doc_id ASC
LIMIT 20
"""


def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints(read_fixture(spark, sf_dir, "documents"))


FINGERPRINT_ORACLE = """
SELECT doc_id,
       MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS fingerprint,
       LENGTH(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS n_chars_norm
FROM documents
"""


# --------------------------------------------------------------------------
# X3/X5 — similarity search + multimodal
# --------------------------------------------------------------------------


def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_fixture(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return bruteforce_topk(emb, probes, k=5)


BRUTEFORCE_ORACLE = """
WITH p AS (
    SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
    FROM embeddings WHERE vec_id < 10
), c AS (
    SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
    FROM embeddings
), scored AS (
    SELECT probe_id, neighbor_id, LIST_COSINE_SIMILARITY(pv, cv) AS sim
    FROM p, c
    WHERE neighbor_id <> probe_id
), ranked AS (
    SELECT probe_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY probe_id
                              ORDER BY sim DESC, neighbor_id) AS rnk,
           sim
    FROM scored
)
SELECT probe_id, neighbor_id, rnk, ROUND(sim, 4) AS sim
FROM ranked
WHERE rnk <= 5
"""


def sim_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    return centroid_similarity(read_fixture(spark, sf_dir, "embeddings"))


CENTROID_ORACLE = """
WITH e AS (
    SELECT vec_id, label,
           UNNEST(CAST(embedding AS DOUBLE[])) AS val,
           GENERATE_SUBSCRIPTS(CAST(embedding AS DOUBLE[]), 1) AS dim
    FROM embeddings
), cent AS (
    SELECT label, dim, AVG(val) AS cval FROM e GROUP BY label, dim
), per_vec AS (
    SELECT e.vec_id, e.label,
           SUM(e.val * c.cval) AS dot,
           SQRT(SUM(e.val * e.val)) AS vnorm,
           SQRT(SUM(c.cval * c.cval)) AS cnorm
    FROM e JOIN cent c ON e.label = c.label AND e.dim = c.dim
    GROUP BY e.vec_id, e.label
)
SELECT label, COUNT(*) AS n_vectors,
       ROUND(AVG(dot / (vnorm * cnorm)), 3) AS avg_cos_to_centroid
FROM per_vec
GROUP BY label
ORDER BY label
"""


def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_fixture(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(emb, probes, k=5)


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: hash-verified end-to-end — centroid seeding is md5-ordered
    (portable), so the DuckDB oracle replays seeding → cell assignment →
    nprobe search → rerank bit-for-bit. Recall vs sim_bruteforce_topk is
    additionally measured in tests."""
    emb = read_fixture(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, probes, k=5, n_cells=10, nprobe=3)


def multimodal_payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_fixture(spark, sf_dir, "documents")
    return extract_payload_features(attach_binary_payload(docs))


def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: synthesize a valid binary PGM per doc
    (JVM-side md5→unhex raster), decode it with numpy inside Arrow-batched
    mapInPandas, emit per-image pixel stats. The raster bytes are
    md5-derived, so the DuckDB oracle recomputes every pixel from hex-digit
    math and verifies width/height/mean/min/max exactly."""
    from ..operators.multimodal import attach_image_payload, decode_image

    docs = read_fixture(spark, sf_dir, "documents")
    decoded = decode_image(attach_image_payload(docs))
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.round("mean_pixel", 4).alias("mean_pixel"),
        "min_pixel",
        "max_pixel",
    )


# Every pixel of the synthesized PGM is byte i of md5(doc_id:row); DuckDB
# rebuilds the identical raster from hex digits (two per byte) and checks
# the decoder's statistics pixel-for-pixel.
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: synthesize a valid RIFF/WAVE PCM clip
    per doc (JVM-side md5→unhex samples), decode with numpy inside
    Arrow-batched mapInPandas, emit per-clip signal stats. Sample bytes are
    md5-derived, so the DuckDB oracle reconstructs every s16le sample from
    hex-digit math and verifies duration/rms/peak exactly."""
    from ..operators.multimodal import attach_audio_payload, decode_audio

    docs = read_fixture(spark, sf_dir, "documents")
    decoded = decode_audio(attach_audio_payload(docs))
    return decoded.select(
        "doc_id",
        "n_samples",
        "sample_rate",
        "duration_sec",
        F.round("rms", 4).alias("rms"),
        "peak",
    )


# Rebuild each s16le sample from the md5 hex stream: digest r holds samples
# 8r..8r+7; sample s of a digest is bytes (2s, 2s+1) little-endian signed.
AUDIO_DECODE_ORACLE = """
WITH hx AS (
    SELECT doc_id,
           MD5('wav:' || CAST(doc_id AS VARCHAR) || ':' || CAST(r AS VARCHAR)) AS h
    FROM documents, UNNEST(RANGE(32)) AS t(r)
), smp AS (
    SELECT doc_id,
           (STRPOS('0123456789abcdef', SUBSTR(h, 4 * s + 1, 1)) - 1) * 16
           + (STRPOS('0123456789abcdef', SUBSTR(h, 4 * s + 2, 1)) - 1)
           + ((STRPOS('0123456789abcdef', SUBSTR(h, 4 * s + 3, 1)) - 1) * 16
              + (STRPOS('0123456789abcdef', SUBSTR(h, 4 * s + 4, 1)) - 1)) * 256
           AS uval
    FROM hx, UNNEST(RANGE(8)) AS u(s)
), signed AS (
    SELECT doc_id, CASE WHEN uval >= 32768 THEN uval - 65536 ELSE uval END AS val
    FROM smp
)
SELECT doc_id, CAST(256 AS INT) AS n_samples, CAST(8000 AS INT) AS sample_rate,
       CAST(256 AS DOUBLE) / CAST(8000 AS DOUBLE) AS duration_sec,
       ROUND(SQRT(AVG(CAST(val AS DOUBLE) * val)), 4) AS rms,
       CAST(MAX(ABS(val)) AS INT) AS peak
FROM signed
GROUP BY doc_id
"""


IMAGE_DECODE_ORACLE = """
WITH hx AS (
    SELECT doc_id, MD5(CAST(doc_id AS VARCHAR) || ':' || CAST(r AS VARCHAR)) AS h
    FROM documents, UNNEST(RANGE(16)) AS t(r)
), px AS (
    SELECT doc_id,
           (STRPOS('0123456789abcdef', SUBSTR(h, 2 * i + 1, 1)) - 1) * 16
           + (STRPOS('0123456789abcdef', SUBSTR(h, 2 * i + 2, 1)) - 1) AS pixel
    FROM hx, UNNEST(RANGE(16)) AS s(i)
)
SELECT doc_id, 16 AS width, 16 AS height,
       ROUND(AVG(pixel), 4) AS mean_pixel,
       CAST(MIN(pixel) AS INT) AS min_pixel,
       CAST(MAX(pixel) AS INT) AS max_pixel
FROM px
GROUP BY doc_id
"""


MULTIMODAL_ORACLE = """
SELECT doc_id,
       OCTET_LENGTH(ENCODE(text)) AS byte_len,
       MD5(text) AS payload_md5,
       'text/plain' AS mime
FROM documents
"""


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per language: tf = term count within the language,
    idf = ln(N_docs / doc-frequency). Explode → two aggregations (term df
    corpus-wide, tf per lang) → broadcast the tiny df table back — the
    standard two-pass shape; at 100 TB both aggs are partial+final over the
    vocabulary, never over tokens."""
    from pyspark.sql import Window

    docs = read_fixture(spark, sf_dir, "documents")
    n_docs = docs.select("doc_id").distinct().count()  # == oracle's COUNT(DISTINCT doc_id)
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    )
    df_term = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    tf = toks.groupBy("lang", "term").agg(F.count("*").alias("tf"))
    scored = tf.join(F.broadcast(df_term), "term").withColumn(
        "tfidf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("lang", "term", F.round("tfidf", 4).alias("tfidf"), "rnk")
    )


TFIDF_ORACLE = """
WITH toks AS (
    SELECT doc_id, lang, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
), n AS (
    SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks
), df AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
), tf AS (
    SELECT lang, term, COUNT(*) AS tf FROM toks GROUP BY lang, term
), scored AS (
    SELECT tf.lang, tf.term,
           tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
), ranked AS (
    SELECT lang, term, tfidf,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY tfidf DESC, term) AS rnk
    FROM scored
)
SELECT lang, term, ROUND(tfidf, 4) AS tfidf, rnk
FROM ranked WHERE rnk <= 3
"""


def embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal/array showcase: symmetric int8 quantization of each
    embedding (per-vector max-abs scale) and the mean reconstruction error
    per label — the storage-shrink step before shipping vectors to an ANN
    index. Pure array higher-order functions."""
    emb = read_fixture(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    err_sum = F.aggregate(
        F.transform(
            v,
            lambda x: F.abs(x - F.round(x * 127 / scale) * scale / 127),
        ),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    per_vec = emb.select(
        "vec_id", "label", (err_sum / F.size(v)).alias("mean_err")
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("mean_err"), 6).alias("avg_quant_err"),
        )
        .orderBy("label")
    )


QUANT_ORACLE = """
WITH e AS (
    SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), scaled AS (
    SELECT vec_id, label, v,
           LIST_MAX(LIST_TRANSFORM(v, x -> ABS(x))) AS scale
    FROM e
), ex AS (
    SELECT vec_id, label,
           UNNEST(v) AS x, scale
    FROM scaled
), per_vec AS (
    SELECT vec_id, label,
           AVG(ABS(x - ROUND(x * 127 / scale) * scale / 127)) AS mean_err
    FROM ex
    GROUP BY vec_id, label
)
SELECT label, COUNT(*) AS n_vectors,
       ROUND(AVG(mean_err), 6) AS avg_quant_err
FROM per_vec
GROUP BY label
ORDER BY label
"""


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → connected components: (doc_id, cluster) for every
    document in a Jaccard≥0.5 pair, cluster = component min doc_id. The
    iterative Spark implementation is verified against DuckDB's RECURSIVE
    CTE transitive closure."""
    pairs = ngram_jaccard_pairs(read_fixture(spark, sf_dir, "documents"), threshold=0.5)
    return connected_dup_clusters(pairs)


DEDUP_CLUSTERS_ORACLE = """
WITH RECURSIVE pairs AS (
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM toks, UNNEST(RANGE(1, LEN(t) - 1)) AS r(i)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), commons AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b FROM commons
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.5
), edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
), reach(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster
FROM reach
GROUP BY src
"""


def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's LAST step, made explicit: after near-dup pairs
    collapse into connected clusters, each cluster keeps its best member —
    here the longest document (n_chars, ties to the lower id), the
    standard 'keep the most complete copy' curation rule. Emits
    (cluster, kept_doc_id, n_members, max_n_chars).

    Scale: the representative choice is one max_by over the cluster-keyed
    aggregation — no second pass over text; the heavy lifting (pair gen +
    pointer-jumping components) is the already-verified machinery."""
    from ..operators.dedup import connected_dup_clusters, ngram_jaccard_pairs

    docs = read_fixture(spark, sf_dir, "documents")
    clusters = connected_dup_clusters(ngram_jaccard_pairs(docs, threshold=0.5))
    j = clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
    return (
        j.groupBy("cluster")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.max_by(
                "doc_id", F.struct(F.col("n_chars"), -F.col("doc_id"))
            ).alias("kept_doc_id"),
            F.max("n_chars").cast("long").alias("max_n_chars"),
        )
        .orderBy("cluster")
    )


KEEP_BEST_ORACLE = """
WITH RECURSIVE pairs AS (
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM toks, UNNEST(RANGE(1, LEN(t) - 1)) AS r(i)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), commons AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b FROM commons
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.5
), edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
), reach(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), membership AS (
    SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster
    FROM reach
    GROUP BY src
), ranked AS (
    SELECT m.cluster, m.doc_id, d.n_chars,
           ROW_NUMBER() OVER (PARTITION BY m.cluster
                              ORDER BY d.n_chars DESC, m.doc_id) AS rn
    FROM membership m JOIN documents d ON d.doc_id = m.doc_id
)
SELECT cluster,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS kept_doc_id,
       CAST(MAX(n_chars) AS BIGINT) AS max_n_chars
FROM ranked
GROUP BY cluster
ORDER BY cluster
"""


_BPE_SAMPLE_RATE = 0.5  # fixture-scale stand-in for a production ~1e-3 rate
_BPE_SALT = "bpe"


def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-fit BPE vocabulary induction under the full hash oracle
    (operators/text.bpe_fit): the fit corpus is the deterministic
    md5-threshold sample of documents (rate 0.5, salt 'bpe' — the
    splits-tier machinery, so the sample is a pure replayable function of
    doc_id), then 8 rounds of greedy pair merging over it — per round one
    bigram-count shuffle and a single-row top-1 collect (the merge
    decision is the only driver state), the merge applied as a
    sentinel-guarded string REPLACE whose left-to-right non-overlapping
    semantics are identical in Spark and SQL. Sampling is what makes the
    fit extrapolate: a real tokenizer is 30k+ merges (round count scales
    with the MODEL), so per-round cost must be O(sample), not O(corpus) —
    round-3 VERDICT item 2. The oracle reproduces the sample with the
    same md5 predicate and unrolls all 8 rounds on it: recount bigrams,
    pick the same (count DESC, pair ASC) winner, rewrite with the same
    REPLACE — an iterative vocabulary-learning fit verified end-to-end,
    the text-tier sibling of the kmeans/PageRank replay chains."""
    from ..operators.text import bpe_fit

    docs = read_fixture(spark, sf_dir, "documents")
    merges = bpe_fit(docs, merges=8, sample_rate=_BPE_SAMPLE_RATE, salt=_BPE_SALT)
    return spark.createDataFrame(
        [m[:3] for m in merges], "merge_round long, merged_token string, n_occ long"
    ).orderBy("merge_round")


def _bpe_sample_where() -> str:
    """The DuckDB replay of stratified_sample's md5-threshold filter —
    same salt, same 8-hex prefix, same threshold arithmetic (imported
    from the splits module: single source of truth)."""
    from ..operators.splits import _hex_threshold, _PREFIX_LEN

    thr = _hex_threshold(_BPE_SAMPLE_RATE)
    return (
        f" WHERE SUBSTRING(MD5('{_BPE_SALT}:' || CAST(doc_id AS VARCHAR)),"
        f" 1, {_PREFIX_LEN}) < '{thr}'"
    )


def _bpe_fit_chain(merges: int) -> list[str]:
    """The round CTEs replaying the SAMPLED bpe_fit: s0 is the
    md5-sampled sentineled corpus; each round recounts bigrams, picks the
    (cnt DESC, pair ASC) winner p{r}, and rewrites s{r-1} -> s{r}."""
    parts = [
        # MATERIALIZED is load-bearing: each s{r} is referenced by both the
        # next round's bigram count and the next rewrite — left to the
        # planner, DuckDB may inline the chain and re-evaluate it once per
        # downstream reference, going exponential in the round count
        # (measured ~7x per round; 8 rounds -> minutes instead of seconds)
        "s0 AS MATERIALIZED (SELECT '|' || REPLACE(text, ' ', '| |') || '|' AS s"
        f" FROM documents{_bpe_sample_where()})"
    ]
    for r in range(1, merges + 1):
        parts.append(
            f"""b{r} AS (
    SELECT t[i] || ' ' || t[i+1] AS pair, COUNT(*) AS cnt
    FROM (SELECT STRING_SPLIT(s, ' ') AS t FROM s{r - 1}),
         UNNEST(RANGE(1, LEN(t))) AS rr{r}(i)
    GROUP BY 1
), p{r} AS (
    SELECT pair, REPLACE(pair, '| |', '+') AS merged, cnt
    FROM b{r} ORDER BY cnt DESC, pair LIMIT 1
), s{r} AS MATERIALIZED (
    SELECT REPLACE(s, (SELECT pair FROM p{r}), (SELECT merged FROM p{r})) AS s
    FROM s{r - 1}
)"""
        )
    return parts


def _bpe_apply_chain(merges: int, *, carry: str) -> list[str]:
    """The serving CTEs replaying bpe_apply on the FULL corpus: a0 is the
    unsampled sentineled corpus; each a{r} applies the fitted merge p{r}
    (from the sampled fit chain) as the same literal REPLACE. ``carry``
    names extra columns (e.g. ``doc_id, lang,``) threaded through every
    rewrite so a downstream consumer can aggregate the final
    tokenization by them."""
    parts = [
        f"a0 AS MATERIALIZED (SELECT {carry} '|' || REPLACE(text, ' ', '| |') || '|' AS s"
        " FROM documents)"
    ]
    for r in range(1, merges + 1):
        parts.append(
            f"""a{r} AS MATERIALIZED (
    SELECT {carry} REPLACE(s, (SELECT pair FROM p{r}), (SELECT merged FROM p{r})) AS s
    FROM a{r - 1}
)"""
        )
    return parts


def _bpe_oracle_sql(merges: int = 8) -> str:
    parts = _bpe_fit_chain(merges)
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_round,"
        f" REPLACE(merged, '|', '') AS merged_token,"
        f" CAST(cnt AS BIGINT) AS n_occ FROM p{r}"
        for r in range(1, merges + 1)
    )
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT * FROM (
{rows}
)
ORDER BY merge_round
"""


BPE_ORACLE = _bpe_oracle_sql()


def text_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving half of BPE: fit the 8 merges on the md5-sampled fit
    corpus (bpe_fit, rate 0.5 — same sample as text_bpe_merges), then
    APPLY them to the FULL corpus as a chain of literal REPLACE
    projections (operators/text.bpe_apply — one scan, zero shuffle) and
    report per-language unit counts before/after plus the compression
    ratio. This is exactly the production split: the fit touches only the
    sample, serving touches everything. The oracle replays both halves —
    the sampled fit chain yields p1..p8, and a second apply chain (lang
    carried through every rewrite) replays the REPLACEs over the unsampled
    corpus, whose final token counts aggregate per language."""
    from ..operators.text import bpe_apply, bpe_fit

    docs = read_fixture(spark, sf_dir, "documents")
    merges = bpe_fit(docs, merges=8, sample_rate=_BPE_SAMPLE_RATE, salt=_BPE_SALT)
    applied = bpe_apply(docs, merges)
    return (
        applied.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).cast("long").alias("units_before"),
            F.sum(F.size("bpe_tokens")).cast("long").alias("units_after"),
            F.round(
                F.sum(F.size("bpe_tokens"))
                / F.sum(F.size(F.split("text", " "))),
                4,
            ).alias("compression"),
        )
        .orderBy("lang")
    )


def _bpe_compression_oracle_sql(merges: int = 8) -> str:
    body = ",\n".join(
        _bpe_fit_chain(merges) + _bpe_apply_chain(merges, carry="doc_id, lang,")
    )
    return f"""
WITH {body}
SELECT f.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LEN(STRING_SPLIT(d.text, ' '))) AS BIGINT) AS units_before,
       CAST(SUM(LEN(STRING_SPLIT(f.s, ' '))) AS BIGINT) AS units_after,
       ROUND(CAST(SUM(LEN(STRING_SPLIT(f.s, ' '))) AS DOUBLE)
             / SUM(LEN(STRING_SPLIT(d.text, ' '))), 4) AS compression
FROM a{merges} f JOIN documents d ON d.doc_id = f.doc_id
GROUP BY f.lang
ORDER BY f.lang
"""


BPE_COMPRESSION_ORACLE = _bpe_compression_oracle_sql()


def pipeline_pretraining_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CAPSTONE composite — a pretraining corpus built end to end in
    one DAG, chaining four verified tiers:

    1. eval holdout excluded (the md5 'eval:' split — benchmark docs never
       enter the corpus),
    2. quality gate (n_chars >= 100),
    3. exact dedup (smallest doc_id per normalized content hash),
    4. n-gram decontamination against the eval set (any shared 5-gram
       disqualifies — broadcast-eval anti join),
    5. deterministic train/val/test assignment (md5 'split:' thresholds),
    6. report per (lang, split): surviving docs and total characters.

    Every stage is a shuffle-keyed bulk operator or pure projection — the
    whole pipeline is one lazy plan, no driver loops, no collect. At
    100 TB the stages swap in their scale twins with identical wiring
    (MinHash for 3, the bloom prefilter for 4)."""
    from ..functions.cache import scoped_persist
    from ..functions.texts import normalize
    from ..operators.dedup import _distinct_shingles
    from ..operators.splits import assign_split

    docs = read_fixture(spark, sf_dir, "documents")
    is_eval = (
        F.substring(F.md5(F.concat(F.lit("eval:"), F.col("doc_id").cast("string"))), 1, 8)
        < "20000000"
    )
    ev_docs = docs.filter(is_eval)
    base = docs.filter(~is_eval).filter(F.col("n_chars") >= 100)

    keepers = scoped_persist(  # ids only; `deduped` fans out to the
        # shingle pass AND the anti join, so an unpersisted keepers would
        # re-run the md5-normalize aggregate + its exchange per consumer
        base.select("doc_id", F.md5(normalize("text")).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = base.join(keepers, "doc_id", "left_semi")

    # ONE tokenize+shingle pass feeds both decontamination sides (r14,
    # guide §1.2), refined in r15: the two sides PARTITION the corpus
    # (eval vs deduped-train are disjoint by construction), so the pass —
    # and the persisted (doc_id, shingle) stream the r14 VERDICT flagged
    # as the round's heaviest cache — only needs the docs either side
    # keeps: eval ∪ deduped, never the quality/dedup casualties. Splitting
    # downstream by the pure is_eval expression also retires the
    # shingle-stream semi-join against the deduped ids. §5 analysis of the
    # cache itself (measured r15): dropping it entirely and running two
    # side-pruned passes is cold-flat (1.34 vs 1.36 s scoped) but +57% on
    # the warm suite metric — the persist stays because it pays within the
    # cross-rep convention, and at 100 TB the same dataflow would write
    # the kept-shingle tier to storage once instead of caching it.
    sh_kept = scoped_persist(
        _distinct_shingles(ev_docs.unionByName(deduped), n=5)
    )
    ev_sh = sh_kept.filter(is_eval).select("shingle").distinct()
    tr_sh = sh_kept.filter(~is_eval)
    contaminated = (
        tr_sh.join(F.broadcast(ev_sh), "shingle").select("doc_id").distinct()
    )
    clean = deduped.join(contaminated, "doc_id", "left_anti")

    split = assign_split(
        clean, key_col="doc_id", weights={"train": 0.9, "val": 0.05, "test": 0.05}
    )
    return (
        split.groupBy("lang", "split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .orderBy("lang", "split")
    )


def _pretraining_oracle_sql() -> str:
    from ..operators.splits import _hex_threshold

    t_train = _hex_threshold(0.9)
    t_val = _hex_threshold(0.95)
    return f"""
WITH ev_ids AS (
    SELECT doc_id FROM documents
    WHERE SUBSTR(MD5('eval:' || CAST(doc_id AS VARCHAR)), 1, 8) < '20000000'
), base AS (
    SELECT * FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM ev_ids) AND n_chars >= 100
), kept AS (
    SELECT MIN(doc_id) AS doc_id
    FROM (SELECT doc_id,
                 MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS h
          FROM base)
    GROUP BY h
), dd AS (
    SELECT b.* FROM base b JOIN kept k ON b.doc_id = k.doc_id
), toks AS (
    SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] AS shingle
    FROM toks, UNNEST(RANGE(1, LEN(t) - 3)) AS r(i)
), ev_sh AS (
    SELECT DISTINCT shingle FROM sh WHERE doc_id IN (SELECT doc_id FROM ev_ids)
), contaminated AS (
    SELECT DISTINCT s.doc_id
    FROM sh s
    JOIN ev_sh e ON s.shingle = e.shingle
    WHERE s.doc_id IN (SELECT doc_id FROM dd)
), clean AS (
    SELECT * FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
)
SELECT lang,
       CASE WHEN SUBSTR(MD5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) < '{t_train}'
                THEN 'train'
            WHEN SUBSTR(MD5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) < '{t_val}'
                THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM clean
GROUP BY 1, 2
ORDER BY lang, split
"""


PRETRAINING_ORACLE = _pretraining_oracle_sql()


def align_mutual_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitext-style corpus alignment by MUTUAL nearest neighbors: split the
    embedding corpus into two sides (even/odd label — stand-ins for two
    languages), score cross-side cosine, and keep only pairs where each is
    the other's top-1 — the standard high-precision alignment rule
    (margin-based mining's strict core). Emits (a_id, b_id, sim).

    Scale shape: the exact cross-score here is the small-side baseline
    (one side broadcast); at corpus scale both top-1 passes run through
    the ANN tier (IVF/SRP) and the mutual filter is the same tiny
    id-pair join. Ranking ties break by id on both engines."""
    from ..functions.vectors import as_double, cosine_arrow
    from pyspark.sql import Window

    emb = read_fixture(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("label") % 2 == 0).select(
        F.col("vec_id").alias("a_id"), as_double("embedding").alias("av")
    )
    b = emb.filter(F.col("label") % 2 == 1).select(
        F.col("vec_id").alias("b_id"), as_double("embedding").alias("bv")
    )
    scored = a.join(F.broadcast(b)).select(
        "a_id", "b_id", cosine_arrow(F.col("av"), F.col("bv")).alias("sim")
    )
    from ..functions.cache import scoped_persist

    scored = scoped_persist(scored)
    wa = Window.partitionBy("a_id").orderBy(F.desc("sim"), F.asc("b_id"))
    wb = Window.partitionBy("b_id").orderBy(F.desc("sim"), F.asc("a_id"))
    top_ab = scored.withColumn("_r", F.row_number().over(wa)).filter(
        F.col("_r") == 1
    ).select("a_id", "b_id")
    top_ba = scored.withColumn("_r", F.row_number().over(wb)).filter(
        F.col("_r") == 1
    ).select("a_id", "b_id")
    mutual = top_ab.join(top_ba, ["a_id", "b_id"])
    return (
        mutual.join(scored, ["a_id", "b_id"])
        .select("a_id", "b_id", F.round("sim", 4).alias("sim"))
        .orderBy("a_id")
    )


MUTUAL_NEAREST_ORACLE = """
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
), scored AS (
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           LIST_INNER_PRODUCT(a.v, b.v)
           / (SQRT(LIST_INNER_PRODUCT(a.v, a.v))
              * SQRT(LIST_INNER_PRODUCT(b.v, b.v))) AS sim
    FROM e a CROSS JOIN e b
    WHERE a.label % 2 = 0 AND b.label % 2 = 1
), ta AS (
    SELECT a_id, b_id FROM (
        SELECT a_id, b_id,
               ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS r
        FROM scored
    ) WHERE r = 1
), tb AS (
    SELECT a_id, b_id FROM (
        SELECT a_id, b_id,
               ROW_NUMBER() OVER (PARTITION BY b_id ORDER BY sim DESC, a_id) AS r
        FROM scored
    ) WHERE r = 1
)
SELECT s.a_id, s.b_id, ROUND(s.sim, 4) AS sim
FROM ta JOIN tb USING (a_id, b_id)
JOIN scored s USING (a_id, b_id)
ORDER BY s.a_id
"""


def snapshot_diff_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lake snapshot diff — the CDC-style report every versioned corpus
    pipeline runs between ingests: membership of two deterministic
    md5-derived snapshots (v1/v2 keep ~75% each; ~12.5% of common docs get
    modified content in v2), classified per doc by content hash into
    added / removed / changed / unchanged and counted per (lang, status).

    Scale shape: one scan computes both memberships and both content
    hashes as projections; the diff is a single full-outer self-alignment
    on doc_id collapsed here to conditional aggregation — no join at all,
    since both versions derive from one table (a real two-table diff is
    the same classification over a doc_id full outer join, the shape
    join_full_outer_nation_activity pins)."""
    docs = read_fixture(spark, sf_dir, "documents")

    def member(tag: str):
        return (
            F.substring(
                F.md5(F.concat(F.lit(f"{tag}:"), F.col("doc_id").cast("string"))), 1, 8
            )
            < "c0000000"
        )

    modified = (
        F.substring(
            F.md5(F.concat(F.lit("mod:"), F.col("doc_id").cast("string"))), 1, 8
        )
        < "20000000"
    )
    status = (
        F.when(member("v1") & ~member("v2"), "removed")
        .when(~member("v1") & member("v2"), "added")
        .when(member("v1") & member("v2") & modified, "changed")
        .when(member("v1") & member("v2"), "unchanged")
    )
    return (
        docs.select("lang", status.alias("status"))
        .filter(F.col("status").isNotNull())
        .groupBy("lang", "status")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("lang", "status")
    )


SNAPSHOT_DIFF_ORACLE = """
WITH tagged AS (
    SELECT lang,
           SUBSTR(MD5('v1:' || CAST(doc_id AS VARCHAR)), 1, 8) < 'c0000000' AS v1,
           SUBSTR(MD5('v2:' || CAST(doc_id AS VARCHAR)), 1, 8) < 'c0000000' AS v2,
           SUBSTR(MD5('mod:' || CAST(doc_id AS VARCHAR)), 1, 8) < '20000000' AS md
    FROM documents
), st AS (
    SELECT lang,
           CASE WHEN v1 AND NOT v2 THEN 'removed'
                WHEN NOT v1 AND v2 THEN 'added'
                WHEN v1 AND v2 AND md THEN 'changed'
                WHEN v1 AND v2 THEN 'unchanged'
           END AS status
    FROM tagged
)
SELECT lang, status, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM st
WHERE status IS NOT NULL
GROUP BY lang, status
ORDER BY lang, status
"""


#: dedup_embedding_cosine is the documented SMALL-N-ONLY exact baseline;
#: above this the O(n²) pair space stops being a sane oracle target and the
#: SRP-bucketed twin is the only defensible plan (VERDICT r2 item 7: the
#: contract is now enforced, not just commented).
EXACT_EMBED_DEDUP_MAX_ROWS = 100_000


def dedup_embedding_cosine(
    spark: SparkSession, sf_dir: str, *, max_rows: int | None = EXACT_EMBED_DEDUP_MAX_ROWS
) -> DataFrame:
    """Embedding-cosine near-dup pairs: all (a < b) vector pairs whose cosine
    exceeds the threshold. All-pairs is the exact baseline (O(n²) scoring,
    fine to ~10^5 vectors with broadcast tiling); the scale path buckets by
    SRP signature first (operators/similarity.lsh_topk machinery) and scores
    only within buckets. Random fixture vectors peak near 0.51, so 0.42
    yields a small, stable pair set. Refuses inputs above ``max_rows``
    (pass ``max_rows=None`` to override explicitly); the count is a
    parquet-metadata pass, not a scan."""
    from ..functions.vectors import as_double, dot, norm

    e = read_fixture(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    if max_rows is not None:
        n = e.count()
        if n > max_rows:
            raise ValueError(
                f"dedup_embedding_cosine is the O(n²) small-n oracle baseline: "
                f"input has {n} vectors > max_rows={max_rows}; use "
                f"dedup_embedding_cosine_bucketed (the SRP scale path) or pass "
                f"max_rows=None to force"
            )
    # norms once per VECTOR (n folds), not per pair (n² folds): only the
    # dot product is pairwise work
    e = e.withColumn("nrm", norm(F.col("v")))
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    pairs = a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        pairs.withColumn("_sim", sim)
        .filter(F.col("_sim") >= 0.42)
        .select("vec_a", "vec_b", F.round("_sim", 4).alias("cos_sim"))
    )


def dedup_embedding_cosine_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-bucketed embedding near-dup pairs — the 100 TB path for
    dedup_embedding_cosine (which stays as the exact small-n oracle
    baseline). Candidates come from a (table, signature) self-join across 8
    SRP tables, so shuffle volume is O(n x tables), never O(n²); survivors
    are re-scored with exact cosine, making precision exact and only recall
    probabilistic (measured vs the exact pairs in tests). Hash-verified
    end-to-end: the SRP planes are md5-derived Python-side, so the DuckDB
    oracle re-computes the same signatures from a literal plane table and
    replays banding + rescoring bit-for-bit."""
    from ..operators.similarity import srp_dedup_pairs

    emb = read_fixture(spark, sf_dir, "embeddings")
    return srp_dedup_pairs(emb, threshold=0.42, num_planes=4, num_tables=8)


# SRP signatures are recomputable outside Spark (planes are md5-derived
# Python-side literals), so the bucketed variant gets a FULL hash oracle:
# same planes → same signatures → same candidate set → same cosine scores.
EMBED_DEDUP_BUCKETED_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
planes(tbl, p, w) AS (VALUES {srp_plane_sql_values(8, 4, 64)}),
sig AS (
  SELECT e.vec_id, pl.tbl,
         SUM(CASE WHEN LIST_INNER_PRODUCT(e.v, pl.w) > 0
                  THEN CAST(1 AS BIGINT) << pl.p ELSE 0 END) AS sig
  FROM e CROSS JOIN planes pl
  GROUP BY e.vec_id, pl.tbl
),
cands AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT c.vec_a, c.vec_b,
       ROUND(LIST_INNER_PRODUCT(ea.v, eb.v)
             / (SQRT(LIST_INNER_PRODUCT(ea.v, ea.v))
                * SQRT(LIST_INNER_PRODUCT(eb.v, eb.v))), 4) AS cos_sim
FROM cands c
JOIN e ea ON ea.vec_id = c.vec_a
JOIN e eb ON eb.vec_id = c.vec_b
WHERE LIST_INNER_PRODUCT(ea.v, eb.v)
      / (SQRT(LIST_INNER_PRODUCT(ea.v, ea.v))
         * SQRT(LIST_INNER_PRODUCT(eb.v, eb.v))) >= 0.42
"""


# Same portable-plane trick for the multi-table ANN: candidates from any of
# the 6 (tbl, sig) tables, exact cosine rerank, deterministic tie-break.
SIM_LSH_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
planes(tbl, p, w) AS (VALUES {srp_plane_sql_values(6, 4, 64)}),
sig AS (
  SELECT e.vec_id, pl.tbl,
         SUM(CASE WHEN LIST_INNER_PRODUCT(e.v, pl.w) > 0
                  THEN CAST(1 AS BIGINT) << pl.p ELSE 0 END) AS sig
  FROM e CROSS JOIN planes pl
  GROUP BY e.vec_id, pl.tbl
),
cands AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id
  FROM sig p JOIN sig c ON p.tbl = c.tbl AND p.sig = c.sig
  WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id
  GROUP BY 1, 2
),
scored AS (
  SELECT cd.probe_id, cd.neighbor_id,
         LIST_INNER_PRODUCT(ep.v, ec.v)
         / (SQRT(LIST_INNER_PRODUCT(ep.v, ep.v))
            * SQRT(LIST_INNER_PRODUCT(ec.v, ec.v))) AS sim
  FROM cands cd
  JOIN e ep ON ep.vec_id = cd.probe_id
  JOIN e ec ON ec.vec_id = cd.neighbor_id
),
ranked AS (
  SELECT probe_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY sim DESC, neighbor_id) AS rnk,
         sim
  FROM scored
)
SELECT probe_id, neighbor_id, rnk, ROUND(sim, 4) AS sim
FROM ranked
WHERE rnk <= 5
"""


# IVF is fully deterministic once seeding is portable: centroids = 10
# smallest md5(id) corpus vectors, assignment = nearest centroid, search =
# 3 nearest cells per probe, exact cosine rerank.
SIM_IVF_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (
  SELECT vec_id AS cell, v AS centv FROM e
  ORDER BY MD5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT 10
),
corpus_scored AS (
  SELECT e.vec_id, c.cell,
         LIST_INNER_PRODUCT(e.v, c.centv)
         / (SQRT(LIST_INNER_PRODUCT(e.v, e.v))
            * SQRT(LIST_INNER_PRODUCT(c.centv, c.centv))) AS csim
  FROM e CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS r
    FROM corpus_scored
  ) WHERE r = 1
),
probe_cells AS (
  SELECT vec_id AS probe_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS r
    FROM corpus_scored WHERE vec_id < 10
  ) WHERE r <= 3
),
cands AS (
  SELECT pc.probe_id, a.vec_id AS neighbor_id
  FROM assigned a JOIN probe_cells pc ON a.cell = pc.cell
  WHERE a.vec_id <> pc.probe_id
  GROUP BY 1, 2
),
scored AS (
  SELECT cd.probe_id, cd.neighbor_id,
         LIST_INNER_PRODUCT(ep.v, ec.v)
         / (SQRT(LIST_INNER_PRODUCT(ep.v, ep.v))
            * SQRT(LIST_INNER_PRODUCT(ec.v, ec.v))) AS sim
  FROM cands cd
  JOIN e ep ON ep.vec_id = cd.probe_id
  JOIN e ec ON ec.vec_id = cd.neighbor_id
),
ranked AS (
  SELECT probe_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY sim DESC, neighbor_id) AS rnk,
         sim
  FROM scored
)
SELECT probe_id, neighbor_id, rnk, ROUND(sim, 4) AS sim
FROM ranked
WHERE rnk <= 5
"""


EMBED_DEDUP_ORACLE = """
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(LIST_COSINE_SIMILARITY(a.v, b.v), 4) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE LIST_COSINE_SIMILARITY(a.v, b.v) >= 0.42
"""


def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways per language: whitespace tokens and a
    BPE-ish regex tokenization (letter runs / digit runs / punctuation
    runs — the pre-tokenizer split every BPE vocabulary starts from).
    Both are JVM-side regex engines; counts verified cross-engine."""
    docs = read_fixture(spark, sf_dir, "documents")
    ws = F.size(F.split("text", " "))
    bpe = F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]+"), 0))
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(ws.cast("long")).alias("ws_tokens"),
            F.sum(bpe.cast("long")).alias("bpe_tokens"),
            F.round(F.avg(bpe), 2).alias("avg_bpe_tokens"),
        )
        .orderBy("lang")
    )


TOKEN_COUNTS_ORACLE = r"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS ws_tokens,
       CAST(SUM(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+|[^a-z0-9\s]+'))) AS BIGINT) AS bpe_tokens,
       ROUND(AVG(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+|[^a-z0-9\s]+'))), 2) AS avg_bpe_tokens
FROM documents
GROUP BY lang
ORDER BY lang
"""


def text_edit_distance_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance (levenshtein) text matching: distance from each doc's
    30-char prefix to a fixed probe phrase, bucketed — the fuzzy-match
    primitive for title/URL dedup where token methods are too coarse.
    Exact integer distances, directly comparable across engines."""
    docs = read_fixture(spark, sf_dir, "documents")
    probe = "the fast key order sort table"
    dist = F.levenshtein(F.substring("text", 1, 30), F.lit(probe))
    return (
        docs.select("doc_id", dist.alias("d"))
        .groupBy((F.col("d") / 5).cast("long").alias("dist_bucket"))
        .agg(F.count("*").alias("n_docs"), F.min("d").cast("long").alias("min_dist"))
        .orderBy("dist_bucket")
    )


EDIT_DISTANCE_ORACLE = """
SELECT LEVENSHTEIN(SUBSTRING(text, 1, 30), 'the fast key order sort table') // 5
         AS dist_bucket,
       COUNT(*) AS n_docs,
       CAST(MIN(LEVENSHTEIN(SUBSTRING(text, 1, 30), 'the fast key order sort table'))
            AS BIGINT) AS min_dist
FROM documents
GROUP BY dist_bucket
ORDER BY dist_bucket
"""


def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation — the composition the individual
    X1-X4 operators exist for, as ONE dataflow:

    1. quality gate: keep docs with ≥ 30 tokens and some stopword density
    2. exact dedup: keep the smallest doc_id per normalized content hash
    3. near-dup removal: from each 3-gram-Jaccard ≥ 0.8 pair, drop the
       larger doc_id (left anti join against the pair list)
    4. report: per language, surviving doc count and mean length

    Every stage is a shuffle-keyed bulk operator (no driver loops), so the
    pipeline scales like its parts; at 100 TB step 3 swaps in the MinHash
    candidates with identical downstream wiring.
    """
    from ..functions.cache import scoped_persist
    from ..functions.texts import STOPWORDS, normalize, tokens
    from ..operators.dedup import ngram_jaccard_pairs

    docs = read_fixture(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tok = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"]))) / n_tok
    quality = docs.filter((n_tok >= 30) & (stop_ratio >= 0.01))

    keepers = scoped_persist(  # ids only; `deduped` fans out to the
        # shingle pass AND the anti join, so an unpersisted keepers would
        # re-run the md5-normalize aggregate + its exchange per consumer
        quality.select("doc_id", F.md5(normalize("text")).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = quality.join(keepers, "doc_id", "left_semi")

    near_dup_losers = ngram_jaccard_pairs(deduped, threshold=0.8).select(
        F.col("doc_b").alias("doc_id")
    )
    curated = deduped.join(near_dup_losers.distinct(), "doc_id", "left_anti")

    return (
        curated.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("lang")
    )


CURATION_ORACLE = """
WITH toks AS (
    SELECT *, STRING_SPLIT(text, ' ') AS t FROM documents
), quality AS (
    SELECT * FROM toks
    WHERE LEN(t) >= 30
      AND LEN(LIST_FILTER(t, x -> x IN
            ('the','a','of','and','to','in','is','on','for','with')))
          / CAST(LEN(t) AS DOUBLE) >= 0.01
), keepers AS (
    SELECT MIN(doc_id) AS doc_id
    FROM quality
    GROUP BY MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')))
), deduped AS (
    SELECT q.* FROM quality q JOIN keepers k ON q.doc_id = k.doc_id
), sh AS (
    SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
    FROM deduped, UNNEST(RANGE(1, LEN(t) - 1)) AS r(i)
), sizes AS (
    SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), losers AS (
    SELECT DISTINCT doc_b AS doc_id
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.8
), curated AS (
    SELECT * FROM deduped WHERE doc_id NOT IN (SELECT doc_id FROM losers)
)
SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(n_chars), 2) AS avg_chars
FROM curated
GROUP BY lang
ORDER BY lang
"""


QUERIES: dict[str, QuerySpec] = {
    "pipeline_corpus_curation": QuerySpec(
        pipeline_corpus_curation, CURATION_ORACLE, headline=True
    ),
    "dedup_embedding_cosine": QuerySpec(dedup_embedding_cosine, EMBED_DEDUP_ORACLE),
    "dedup_embedding_cosine_bucketed": QuerySpec(
        dedup_embedding_cosine_bucketed, EMBED_DEDUP_BUCKETED_ORACLE, headline=True
    ),
    "dedup_clusters": QuerySpec(dedup_clusters, DEDUP_CLUSTERS_ORACLE),
    "text_token_counts": QuerySpec(text_token_counts, TOKEN_COUNTS_ORACLE),
    "text_edit_distance_probe": QuerySpec(text_edit_distance_probe, EDIT_DISTANCE_ORACLE),
    "text_tfidf_top_terms": QuerySpec(text_tfidf_top_terms, TFIDF_ORACLE),
    "embedding_quantization_error": QuerySpec(embedding_quantization_error, QUANT_ORACLE),
    "dedup_exact": QuerySpec(dedup_exact, DEDUP_EXACT_ORACLE),
    "dedup_ngram_jaccard": QuerySpec(dedup_ngram_jaccard, DEDUP_JACCARD_ORACLE, headline=True),
    "dedup_minhash_lsh": QuerySpec(dedup_minhash_lsh, DEDUP_MINHASH_ORACLE, headline=True),
    "dedup_simhash": QuerySpec(dedup_simhash, DEDUP_SIMHASH_ORACLE),
    "decontaminate_eval_overlap": QuerySpec(decontaminate_eval_overlap, DECONTAMINATE_ORACLE),
    "dedup_incremental_batch": QuerySpec(dedup_incremental_batch, DEDUP_INCREMENTAL_ORACLE),
    "split_train_val_test": QuerySpec(split_train_val_test, SPLIT_ORACLE),
    "graph_pagerank_suppliers": QuerySpec(graph_pagerank_suppliers, PAGERANK_ORACLE),
    "stratified_sample_by_lang": QuerySpec(stratified_sample_by_lang, SAMPLE_ORACLE),
    "pack_sequences_stats": QuerySpec(pack_sequences_stats, PACK_ORACLE),
    "text_lang_profile": QuerySpec(text_lang_profile, LANG_PROFILE_ORACLE),
    "text_language_id": QuerySpec(text_language_id, LANGID_ORACLE),
    "text_quality_by_source": QuerySpec(text_quality_by_source, QUALITY_ORACLE),
    "text_top_terms": QuerySpec(text_top_terms, TOP_TERMS_ORACLE),
    "text_fingerprints": QuerySpec(text_fingerprints, FINGERPRINT_ORACLE),
    "text_bigram_pmi": QuerySpec(text_bigram_pmi, BIGRAM_PMI_ORACLE),
    "text_repetition_stats": QuerySpec(text_repetition_stats, REPETITION_ORACLE),
    "sim_bruteforce_topk": QuerySpec(sim_bruteforce_topk, BRUTEFORCE_ORACLE, headline=True),
    "sim_centroid_per_label": QuerySpec(sim_centroid_per_label, CENTROID_ORACLE),
    "sim_lsh_topk": QuerySpec(sim_lsh_topk, SIM_LSH_ORACLE),
    "sim_ivf_topk": QuerySpec(sim_ivf_topk, SIM_IVF_ORACLE),
    "multimodal_payload_features": QuerySpec(multimodal_payload_features, MULTIMODAL_ORACLE),
    "multimodal_image_decode": QuerySpec(
        multimodal_image_decode, IMAGE_DECODE_ORACLE, headline=True
    ),
    "multimodal_audio_decode": QuerySpec(multimodal_audio_decode, AUDIO_DECODE_ORACLE),
}


def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM fluency scoring (operators/text.unigram_logprob): every
    doc's mean token log-probability under the corpus distribution."""
    from ..operators.text import unigram_logprob

    return unigram_logprob(read_fixture(spark, sf_dir, "documents"))


UNIGRAM_LOGPROB_ORACLE = """
WITH tok AS (
    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents
), doc_tok AS (
    SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t
), vocab AS (
    SELECT t, COUNT(*) AS c_t FROM tok GROUP BY t
), total AS (
    SELECT COUNT(*) AS corpus_tokens FROM tok
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       ROUND(SUM(c * LN(c_t / corpus_tokens)) / SUM(c), 4) AS avg_logprob
FROM doc_tok JOIN vocab USING (t) CROSS JOIN total
GROUP BY doc_id
"""


_BIGRAM_LAM = 0.8


def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM fluency scoring (operators/text.
    bigram_logprob): every doc's mean bigram log-probability under the
    corpus's own interpolated bigram model, p(w2|w1) = lam*c(w1 w2)/c(w1)
    + (1-lam)*c(w2)/N with lam=0.8 — the KenLM/CCNet-style perplexity
    filter every production curation pipeline runs. Interpolation
    constants are emitted into the oracle at full float repr so both
    engines score with bit-identical doubles."""
    from ..operators.text import bigram_logprob

    return bigram_logprob(read_fixture(spark, sf_dir, "documents"), lam=_BIGRAM_LAM)


BIGRAM_LOGPROB_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents
), bg AS (
    SELECT doc_id, t[i] AS w1, t[i+1] AS w2
    FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
         UNNEST(RANGE(1, LEN(t))) AS r(i)
), doc_bg AS (
    SELECT doc_id, w1, w2, COUNT(*) AS c FROM bg GROUP BY doc_id, w1, w2
), corpus_bg AS (
    SELECT w1, w2, COUNT(*) AS c_b FROM bg GROUP BY w1, w2
), uni AS (
    SELECT w, COUNT(*) AS c_u FROM tok GROUP BY w
), total AS (SELECT COUNT(*) AS corpus_tokens FROM tok)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_bigrams,
       ROUND(SUM(c * LN({_BIGRAM_LAM!r} * c_b / u1.c_u
                        + {1.0 - _BIGRAM_LAM!r} * u2.c_u / corpus_tokens))
             / SUM(c), 4) AS avg_logprob
FROM doc_bg
JOIN corpus_bg USING (w1, w2)
JOIN uni u1 ON doc_bg.w1 = u1.w
JOIN uni u2 ON doc_bg.w2 = u2.w
CROSS JOIN total
GROUP BY doc_id
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 1→N mapInPandas expansion shape (video frame sampling): one
    output row per sampled payload offset, summarized per doc. The payload
    is the utf-8 text bytes (ASCII fixture), so the oracle replays the
    sampled bytes with ORD(SUBSTRING(...)) over a generated offset series —
    the Arrow-batched explode-like expansion is value-verified."""
    from ..operators.multimodal import attach_binary_payload, sample_frames_stub

    docs = read_fixture(spark, sf_dir, "documents")
    frames = sample_frames_stub(attach_binary_payload(docs), every_n_bytes=64)
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.sum("frame_byte").cast("long").alias("byte_sum"),
        F.max("frame_offset").alias("last_offset"),
    )


FRAME_SAMPLE_ORACLE = """
WITH offs AS (
    SELECT doc_id, text,
           UNNEST(GENERATE_SERIES(0, LEN(text) - 1, 64)) AS off
    FROM documents
)
SELECT doc_id, COUNT(*) AS n_frames,
       CAST(SUM(ORD(SUBSTRING(text, CAST(off AS INT) + 1, 1))) AS BIGINT) AS byte_sum,
       MAX(off) AS last_offset
FROM offs
GROUP BY doc_id
"""


#: Verified like QUERIES but OUTSIDE the driver's 50-entry window (llm +
#: events + the flagship core query fill it exactly); tools/verify_local.py
#: covers these.
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation (operators/aggs.cms_sketch):
    the fixed-memory (depth x 256 counters, size-invariant) frequency
    summary, probed for the exact top-10 terms. The md5-hex bucketing is
    fully portable, so the oracle replays the ENTIRE sketch — counters,
    probe hashing, and min-selection — and the estimates hash-match.
    The exact companion aggregation exists for verification; production
    keeps only the sketch (that is the point of it)."""
    from ..functions.cache import scoped_persist
    from ..operators.aggs import cms_estimate, cms_sketch

    docs = read_fixture(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("t"))
    sketch = cms_sketch(tok, "t")
    exact = scoped_persist(  # 10 rows post-limit; feeds probes AND the join
        tok.groupBy("t")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.desc("exact_n"), "t")
        .limit(10)
    )
    est = cms_estimate(sketch, exact.select("t"), "t")
    return (
        exact.join(est, "t")
        .select(F.col("t").alias("term"), "exact_n", "est_n")
        .orderBy(F.desc("exact_n"), "term")
    )


CMS_ORACLE = """
WITH tok AS (
    SELECT UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents
), rows AS (
    SELECT UNNEST(GENERATE_SERIES(0, 3)) AS r
), sketch AS (
    SELECT r, SUBSTRING(MD5('cms:' || r || ':' || t), 1, 2) AS b,
           COUNT(*) AS cnt
    FROM tok CROSS JOIN rows
    GROUP BY r, b
), exact AS (
    SELECT t, COUNT(*) AS exact_n FROM tok
    GROUP BY t ORDER BY exact_n DESC, t LIMIT 10
)
SELECT e.t AS term, e.exact_n,
       CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS est_n
FROM exact e
CROSS JOIN rows r
LEFT JOIN sketch s
  ON s.r = r.r AND s.b = SUBSTRING(MD5('cms:' || r.r || ':' || e.t), 1, 2)
GROUP BY e.t, e.exact_n
ORDER BY e.exact_n DESC, term
"""


def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunking (operators/text.chunk_with_overlap):
    every document split into 16-token chunks with 4-token overlap — the
    retrieval/embedding context-prep step. The oracle rebuilds every chunk
    STRING verbatim via list slicing, so the 1→N codegen expansion is
    text-exact verified, not just counted."""
    from ..operators.text import chunk_with_overlap

    docs = read_fixture(spark, sf_dir, "documents")
    return chunk_with_overlap(docs, chunk_tokens=16, overlap=4)


CHUNK_ORACLE = """
WITH base AS (
    SELECT doc_id, STRING_SPLIT(text, ' ') AS toks,
           LEN(STRING_SPLIT(text, ' ')) AS n
    FROM documents
), sized AS (
    SELECT doc_id, toks, n,
           GREATEST(CAST(CEIL((n - 4) / 12.0) AS BIGINT), 1) AS n_chunks
    FROM base
), starts AS (
    SELECT doc_id, toks, n,
           UNNEST(GENERATE_SERIES(0, (n_chunks - 1) * 12, 12)) AS s
    FROM sized
)
SELECT doc_id,
       CAST(s / 12 AS BIGINT) AS chunk_id,
       ARRAY_TO_STRING(toks[s + 1 : s + 16], ' ') AS chunk_text,
       CAST(LEAST(n - s, 16) AS BIGINT) AS n_tokens
FROM starts
"""


def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sampling: exactly min(k, |group|) docs per
    language, chosen by md5(doc_id) rank — the eval-set construction
    primitive (rate-based sampling can't guarantee per-group counts).
    Append-stable for the chosen ids: a doc's hash never changes, though
    new docs can displace rank-boundary members (unlike the threshold
    sampler in operators/splits, which trades exact counts for full
    append-stability). Scale: one lang-partitioned ranking window — state
    is k rows per group, never a global sort."""
    from pyspark.sql import Window

    docs = read_fixture(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        docs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("lang", F.col("rnk").cast("long").alias("rnk"), "doc_id")
    )


SAMPLE_K_ORACLE = """
SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id
FROM (
    SELECT lang, doc_id,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
    FROM documents
) WHERE rnk <= 20
"""


def quality_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by Median Absolute Deviation: docs whose
    length deviates from their language's median by more than 1.5 scaled
    MADs (the fixture's lengths are near-uniform, so the classic 3-MAD
    cut selects nothing; the pattern is the point) — the robust cousin of z-scoring (grouped_zscore_extremes), used
    when heavy-tailed quality metrics make mean/stddev useless. Medians
    are exact (MEDIAN / percentile 0.5 on both engines); the two per-lang
    scalars broadcast back. Scale: two lang-keyed aggregations over doc
    STATS (never text), one broadcast join."""
    docs = read_fixture(spark, sf_dir, "documents")
    med = docs.groupBy("lang").agg(F.expr("percentile(n_chars, 0.5)").alias("med"))
    mad = (
        docs.join(F.broadcast(med), "lang")
        .groupBy("lang")
        .agg(F.expr("percentile(abs(n_chars - med), 0.5)").alias("mad"))
    )
    scored = (
        docs.join(F.broadcast(med), "lang")
        .join(F.broadcast(mad), "lang")
        .withColumn("dev", F.abs(F.col("n_chars") - F.col("med")) / (1.4826 * F.col("mad")))
    )
    return (
        scored.filter(F.col("dev") > 1.5)
        .select("lang", "doc_id", "n_chars", F.round("dev", 3).alias("mad_devs"))
        .orderBy("lang", "doc_id")
    )


MAD_ORACLE = """
WITH med AS (
    SELECT lang, MEDIAN(n_chars) AS med FROM documents GROUP BY lang
), mad AS (
    SELECT d.lang, MEDIAN(ABS(d.n_chars - m.med)) AS mad
    FROM documents d JOIN med m USING (lang)
    GROUP BY d.lang
)
SELECT d.lang, d.doc_id, d.n_chars,
       ROUND(ABS(d.n_chars - m.med) / (1.4826 * a.mad), 3) AS mad_devs
FROM documents d
JOIN med m USING (lang)
JOIN mad a USING (lang)
WHERE ABS(d.n_chars - m.med) / (1.4826 * a.mad) > 1.5
ORDER BY d.lang, d.doc_id
"""


def dedup_embedding_cosine_bucketed_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION SRP configuration (VERDICT r2 item 8): auto-sized
    planes (planes = log2(n / target_bucket_rows), holding expected bucket
    occupancy constant as the corpus grows — the pinned-4-planes twin
    degrades quadratically, measured OOMing at 64x in tools/scale_lab.py)
    plus the hot-bucket cap that drops degenerate near-identical clusters
    from candidate generation. Oracled via a 24-plane superset literal
    table with the active plane count derived from COUNT(*) in SQL — the
    md5 planes for (table, p) don't depend on how many planes are in use,
    so the same literals serve every corpus size."""
    from ..operators.similarity import srp_dedup_pairs

    emb = read_fixture(spark, sf_dir, "embeddings")
    return srp_dedup_pairs(
        emb, threshold=0.42, num_planes=None, num_tables=8, max_bucket_rows=2048
    )


# Superset plane literals (24 per table); the active count np replays
# srp_dedup_pairs' auto-sizing: max(4, min(24, ceil(log2(n / 64)))).
EMBED_DEDUP_AUTO_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
k AS (
  SELECT GREATEST(4, LEAST(24, CAST(CEIL(LOG2(COUNT(*) / 64.0)) AS INT))) AS np
  FROM e
),
planes(tbl, p, w) AS (VALUES {srp_plane_sql_values(8, 24, 64)}),
sig AS (
  SELECT e.vec_id, pl.tbl,
         SUM(CASE WHEN LIST_INNER_PRODUCT(e.v, pl.w) > 0
                  THEN CAST(1 AS BIGINT) << pl.p ELSE 0 END) AS sig
  FROM e CROSS JOIN planes pl CROSS JOIN k
  WHERE pl.p < k.np
  GROUP BY e.vec_id, pl.tbl
),
ok AS (
  SELECT tbl, sig FROM sig GROUP BY tbl, sig HAVING COUNT(*) <= 2048
),
cands AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM sig a
  JOIN ok ON ok.tbl = a.tbl AND ok.sig = a.sig
  JOIN sig b ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT c.vec_a, c.vec_b,
       ROUND(LIST_INNER_PRODUCT(ea.v, eb.v)
             / (SQRT(LIST_INNER_PRODUCT(ea.v, ea.v))
                * SQRT(LIST_INNER_PRODUCT(eb.v, eb.v))), 4) AS cos_sim
FROM cands c
JOIN e ea ON ea.vec_id = c.vec_a
JOIN e eb ON eb.vec_id = c.vec_b
WHERE LIST_INNER_PRODUCT(ea.v, eb.v)
      / (SQRT(LIST_INNER_PRODUCT(ea.v, ea.v))
         * SQRT(LIST_INNER_PRODUCT(eb.v, eb.v))) >= 0.42
"""


def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sampling (Efraimidis–Spirakis A-ES): per
    language, keep the top-5 documents ranked by ln(u)/w where u is an
    md5-derived uniform and w = n_chars — the one-pass distributed
    equivalent of sampling without replacement with probability
    proportional to size, the standard way a training pipeline upweights
    long/high-quality documents while staying reproducible run-to-run.

    Scale shape: the sample key is a pure projection on the scan; per-group
    top-k is one ranking window partitioned by lang (at extreme group
    sizes: map-side partial top-k via groupBy-aggregate of a k-bounded
    heap, same result). No RNG state anywhere — md5(salt:id) makes the
    draw portable, so the oracle replays the exact sample membership."""
    from pyspark.sql import Window

    docs = read_fixture(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("wres:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(float(1 << 32))
    key = F.log(u) / F.col("n_chars")
    w = Window.partitionBy("lang").orderBy(F.desc("_key"), F.asc("doc_id"))
    return (
        docs.select("lang", "doc_id", "n_chars", key.alias("_key"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("lang", "doc_id", "n_chars", "rnk")
        .orderBy("lang", "rnk")
    )


def _wres_oracle_sql() -> str:
    hexd = "0123456789abcdef"
    hex32 = " + ".join(
        f"(STRPOS('{hexd}', SUBSTR(MD5('wres:' || CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"""
WITH keyed AS (
    SELECT lang, doc_id, n_chars,
           LN((({hex32}) + 0.5) / 4294967296.0) / n_chars AS k
    FROM documents
), ranked AS (
    SELECT lang, doc_id, n_chars,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY k DESC, doc_id) AS rnk
    FROM keyed
)
SELECT lang, doc_id, n_chars, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 5
ORDER BY lang, rnk
"""


WEIGHTED_RESERVOIR_ORACLE = _wres_oracle_sql()


def drift_psi_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift check between two deterministic
    halves of the corpus (md5 split — stands in for run N vs run N+1 of an
    ingest): document length binned into 10 fixed-width buckets, smoothed
    shares compared with PSI = sum (p_a - p_b) * ln(p_a / p_b) — the
    standard monitoring stat for 'did my input distribution move'. Emits
    per-bin counts and contributions plus the total (same on every row).

    Scale: one scan -> conditional-sum aggregate keyed by bin (10 groups);
    the share normalization and total are windows over the 10-row
    aggregate, never the data. Laplace smoothing (+0.5/+5) keeps empty
    bins finite, so the stat is defined even under hard drift."""
    docs = read_fixture(spark, sf_dir, "documents")
    half = F.when(
        F.substring(F.md5(F.concat(F.lit("psi:"), F.col("doc_id").cast("string"))), 1, 8)
        < "80000000",
        "a",
    ).otherwise("b")
    bin_ = F.least(F.floor(F.col("n_chars") / 200), F.lit(9)).cast("long")
    c = (
        docs.select(half.alias("half"), bin_.alias("bin"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("half") == "a", 1).otherwise(0)).cast("long").alias("n_a"),
            F.sum(F.when(F.col("half") == "b", 1).otherwise(0)).cast("long").alias("n_b"),
        )
    )
    from pyspark.sql import Window

    wall = Window.partitionBy()  # 10-row aggregate — bounded by design
    pa = (F.col("n_a") + 0.5) / (F.sum("n_a").over(wall) + 5.0)
    pb = (F.col("n_b") + 0.5) / (F.sum("n_b").over(wall) + 5.0)
    contrib = (pa - pb) * F.log(pa / pb)
    return (
        c.withColumn("_contrib", contrib)
        .select(
            "bin",
            "n_a",
            "n_b",
            F.round("_contrib", 6).alias("contrib"),
            F.round(F.sum("_contrib").over(wall), 6).alias("psi_total"),
        )
        .orderBy("bin")
    )


PSI_ORACLE = """
WITH tagged AS (
    SELECT CASE WHEN SUBSTR(MD5('psi:' || CAST(doc_id AS VARCHAR)), 1, 8)
                     < '80000000' THEN 'a' ELSE 'b' END AS half,
           LEAST(n_chars // 200, 9) AS bin
    FROM documents
), c AS (
    SELECT bin,
           CAST(SUM(CASE WHEN half = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN half = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
    FROM tagged GROUP BY bin
), p AS (
    SELECT bin, n_a, n_b,
           (n_a + 0.5) / (SUM(n_a) OVER () + 5.0) AS pa,
           (n_b + 0.5) / (SUM(n_b) OVER () + 5.0) AS pb
    FROM c
)
SELECT CAST(bin AS BIGINT) AS bin, n_a, n_b,
       ROUND((pa - pb) * LN(pa / pb), 6) AS contrib,
       ROUND(SUM((pa - pb) * LN(pa / pb)) OVER (), 6) AS psi_total
FROM p
ORDER BY bin
"""


def multimodal_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image FEATURE extraction over the decoded binary column
    (operators/multimodal.image_histogram): a 16-bin intensity histogram
    per synthesized PGM, computed by numpy inside Arrow-batched
    mapInPandas — the dataflow shape of any image featurizer. Bounded to
    doc_id < 100 to keep the verify payload small (the operator streams
    the full corpus). The raster is md5-derived, so the oracle rebuilds
    every pixel from hex digits and GROUPs them into the same bins."""
    from ..operators.multimodal import attach_image_payload, image_histogram

    docs = read_fixture(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return image_histogram(attach_image_payload(docs), bins=16).orderBy(
        "doc_id", "bin"
    )


def text_code_switching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching / mixed-language screen: documents whose stopword
    hits are spread over MULTIPLE languages (>= 2 langs each contributing
    >= 2 hits) — the docs a single-label language-id mislabels and a
    monolingual pipeline should route or split. Counts per (label lang,
    number of active stopword languages) plus the mixed-doc rate; reuses
    the verified per-language stopword-hit expressions, all codegen."""
    from ..functions.texts import stopword_hits, tokens as _tokens

    docs = read_fixture(spark, sf_dir, "documents")
    toks = _tokens("text")
    langs = ("en", "de", "fr", "es", "zh")
    active = sum(
        (F.when(stopword_hits(toks, lg) >= 2, 1).otherwise(0) for lg in langs),
        F.lit(0),
    )
    return (
        docs.withColumn("n_active_langs", active.cast("long"))
        .groupBy("lang", "n_active_langs")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("lang", "n_active_langs")
    )


def _code_switch_oracle_sql() -> str:
    conds = " + ".join(
        f"CASE WHEN LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t IN {words})) >= 2"
        f" THEN 1 ELSE 0 END"
        for words in _HITS.values()
    )
    return f"""
SELECT lang, CAST({conds} AS BIGINT) AS n_active_langs, COUNT(*) AS n_docs
FROM documents
GROUP BY 1, 2
ORDER BY 1, 2
"""


CODE_SWITCH_ORACLE = _code_switch_oracle_sql()


def multimodal_image_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image intensity entropy — the flat/blank-image quality screen
    (a solid-color thumbnail carries ~0 bits; natural images near the
    histogram's capacity): Shannon entropy over the verified 16-bin
    histograms, i.e. the REAL decode→featurize dataflow (binary PGM →
    numpy histogram in Arrow batches) finished with the same stable
    H = ln(n) − (1/n)Σ c·ln c used by text char_entropy — integer bin
    counts, so the oracle replays pixel-for-pixel."""
    from ..operators.multimodal import attach_image_payload, image_histogram

    docs = read_fixture(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    hist = image_histogram(attach_image_payload(docs), bins=16)
    return (
        hist.filter(F.col("cnt") > 0)
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_pixels"),
            F.count("*").cast("long").alias("bins_used"),
            F.round(
                F.log(F.sum("cnt")) - F.sum(F.col("cnt") * F.log("cnt")) / F.sum("cnt"),
                6,
            ).alias("entropy_nats"),
        )
        .orderBy("doc_id")
    )


IMAGE_ENTROPY_ORACLE = """
WITH hx AS (
    SELECT doc_id, MD5(CAST(doc_id AS VARCHAR) || ':' || CAST(r AS VARCHAR)) AS h
    FROM documents, UNNEST(RANGE(16)) AS t(r)
    WHERE doc_id < 100
), px AS (
    SELECT doc_id,
           (STRPOS('0123456789abcdef', SUBSTR(h, 2 * i + 1, 1)) - 1) * 16
           + (STRPOS('0123456789abcdef', SUBSTR(h, 2 * i + 2, 1)) - 1) AS pixel
    FROM hx, UNNEST(RANGE(16)) AS s(i)
), hist AS (
    SELECT doc_id, pixel // 16 AS bin, COUNT(*) AS cnt
    FROM px GROUP BY doc_id, pixel // 16
)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_pixels,
       CAST(COUNT(*) AS BIGINT) AS bins_used,
       ROUND(LN(SUM(cnt)) - SUM(cnt * LN(cnt)) / SUM(cnt), 6) AS entropy_nats
FROM hist
WHERE cnt > 0
GROUP BY doc_id
ORDER BY doc_id
"""


def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus vocabulary: OLS slope of
    ln(freq) ~ ln(rank) over the top-500 terms — the canonical sanity
    statistic for a text corpus (natural language sits near -1; templated
    or synthetic text drifts). Composes the text tier's term counting with
    the centered normal-equation regression (ml_ols_price_model's shape)
    over the tiny 500-row rank table: the only data-sized work is the one
    token-count shuffle; everything after runs on the vocabulary head."""
    from ..functions.texts import tokens

    docs = read_fixture(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    from pyspark.sql import Window

    ranked = (
        tf.withColumn(
            "rnk", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("term")))
        )
        .filter(F.col("rnk") <= 500)
        .select(F.log("rnk").alias("x"), F.log("n").alias("y"))
    )
    m = ranked.agg(F.avg("x").alias("mx"), F.avg("y").alias("my"))
    c = ranked.crossJoin(F.broadcast(m))
    stats = c.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum((F.col("x") - F.col("mx")) * (F.col("y") - F.col("my"))).alias("sxy"),
        F.sum((F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx"))).alias("sxx"),
        F.sum((F.col("y") - F.col("my")) * (F.col("y") - F.col("my"))).alias("syy"),
    )
    b1 = F.col("sxy") / F.col("sxx")
    return stats.select(
        "n_terms",
        F.round(b1, 3).alias("zipf_slope"),
        F.round((F.col("sxy") * F.col("sxy")) / (F.col("sxx") * F.col("syy")), 4).alias(
            "r2"
        ),
    )


ZIPF_ORACLE = """
WITH tf AS (
    SELECT term, COUNT(*) AS n
    FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents)
    GROUP BY term
), ranked AS (
    SELECT LN(rnk) AS x, LN(n) AS y FROM (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, term) AS rnk FROM tf
    ) WHERE rnk <= 500
), m AS (
    SELECT AVG(x) AS mx, AVG(y) AS my FROM ranked
), stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
           SUM((x - mx) * (y - my)) AS sxy,
           SUM((x - mx) * (x - mx)) AS sxx,
           SUM((y - my) * (y - my)) AS syy
    FROM ranked, m
)
SELECT n_terms,
       ROUND(sxy / sxx, 3) AS zipf_slope,
       ROUND((sxy * sxy) / (sxx * syy), 4) AS r2
FROM stats
"""


def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize end-to-end (operators/multimodal.resize_image):
    decode the synthesized 16x16 PGM, 2x2 average-pool to 8x8 (integer
    floor division — exact), re-encode as a valid PGM thumbnail, emit its
    size and pixel stats. The oracle rebuilds every SOURCE pixel from md5
    hex digits, pools the same 2x2 blocks with the same floor division,
    and verifies the thumbnail stats pixel-exactly — the resample itself
    is hash-verified, upgrading the old byte-striding resize stub to the
    real decode -> resample -> re-encode dataflow."""
    from ..operators.multimodal import attach_image_payload, resize_image

    docs = read_fixture(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    out = resize_image(attach_image_payload(docs), factor=2)
    return out.select(
        "doc_id",
        "out_width",
        "out_height",
        "thumb_len",
        F.round("mean_pixel", 4).alias("mean_pixel"),
        "min_pixel",
        "max_pixel",
    ).orderBy("doc_id")


IMAGE_RESIZE_ORACLE = """
WITH hx AS (
    SELECT doc_id, r, MD5(CAST(doc_id AS VARCHAR) || ':' || CAST(r AS VARCHAR)) AS h
    FROM documents, UNNEST(RANGE(16)) AS t(r)
    WHERE doc_id < 200
), px AS (
    SELECT doc_id, r AS y, i AS x,
           (STRPOS('0123456789abcdef', SUBSTR(h, 2 * i + 1, 1)) - 1) * 16
           + (STRPOS('0123456789abcdef', SUBSTR(h, 2 * i + 2, 1)) - 1) AS pixel
    FROM hx, UNNEST(RANGE(16)) AS s(i)
), pooled AS (
    SELECT doc_id, y // 2 AS py, x // 2 AS px2,
           CAST(SUM(pixel) // 4 AS BIGINT) AS pv
    FROM px
    GROUP BY doc_id, y // 2, x // 2
)
SELECT doc_id, 8 AS out_width, 8 AS out_height,
       CAST(75 AS BIGINT) AS thumb_len,
       ROUND(AVG(pv), 4) AS mean_pixel,
       CAST(MIN(pv) AS INT) AS min_pixel,
       CAST(MAX(pv) AS INT) AS max_pixel
FROM pooled
GROUP BY doc_id
ORDER BY doc_id
"""


def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction end-to-end (operators/multimodal
    .audio_features): decode the synthesized RIFF/WAVE clip, emit
    zero-crossing count, mean absolute amplitude, and near-clipping
    sample count per clip — integer-exact features, so the md5 sample
    replay verifies the featurizer itself. Bounded to doc_id < 200 for
    the verify payload; the operator streams the full corpus."""
    from ..operators.multimodal import attach_audio_payload, audio_features

    docs = read_fixture(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    out = audio_features(attach_audio_payload(docs))
    return out.select(
        "doc_id",
        "n_crossings",
        F.round("mean_abs", 4).alias("mean_abs"),
        "n_loud",
    ).orderBy("doc_id")


AUDIO_FEATURES_ORACLE = """
WITH hx AS (
    SELECT doc_id, r,
           MD5('wav:' || CAST(doc_id AS VARCHAR) || ':' || CAST(r AS VARCHAR)) AS h
    FROM documents, UNNEST(RANGE(32)) AS t(r)
    WHERE doc_id < 200
), smp AS (
    SELECT doc_id, 8 * r + s AS idx,
           (STRPOS('0123456789abcdef', SUBSTR(h, 4 * s + 1, 1)) - 1) * 16
           + (STRPOS('0123456789abcdef', SUBSTR(h, 4 * s + 2, 1)) - 1)
           + ((STRPOS('0123456789abcdef', SUBSTR(h, 4 * s + 3, 1)) - 1) * 16
              + (STRPOS('0123456789abcdef', SUBSTR(h, 4 * s + 4, 1)) - 1)) * 256
           AS uval
    FROM hx, UNNEST(RANGE(8)) AS u(s)
), signed AS (
    SELECT doc_id, idx,
           CASE WHEN uval >= 32768 THEN uval - 65536 ELSE uval END AS val
    FROM smp
), sgn AS (
    SELECT doc_id, idx,
           CASE WHEN val >= 0 THEN 1 ELSE -1 END AS s, ABS(val) AS a
    FROM signed
), lagged AS (
    SELECT doc_id, a, s,
           LAG(s) OVER (PARTITION BY doc_id ORDER BY idx) AS prev_s
    FROM sgn
)
SELECT doc_id,
       CAST(SUM(CASE WHEN prev_s IS NOT NULL AND prev_s <> s THEN 1 ELSE 0 END)
            AS BIGINT) AS n_crossings,
       ROUND(AVG(CAST(a AS DOUBLE)), 4) AS mean_abs,
       CAST(SUM(CASE WHEN a >= 24576 THEN 1 ELSE 0 END) AS BIGINT) AS n_loud
FROM lagged
GROUP BY doc_id
ORDER BY doc_id
"""


IMAGE_HISTOGRAM_ORACLE = """
WITH hx AS (
    SELECT doc_id, MD5(CAST(doc_id AS VARCHAR) || ':' || CAST(r AS VARCHAR)) AS h
    FROM documents, UNNEST(RANGE(16)) AS t(r)
    WHERE doc_id < 100
), px AS (
    SELECT doc_id,
           (STRPOS('0123456789abcdef', SUBSTR(h, 2 * i + 1, 1)) - 1) * 16
           + (STRPOS('0123456789abcdef', SUBSTR(h, 2 * i + 2, 1)) - 1) AS pixel
    FROM hx, UNNEST(RANGE(16)) AS s(i)
)
SELECT doc_id, CAST(pixel // 16 AS INT) AS bin, COUNT(*) AS cnt
FROM px
GROUP BY doc_id, pixel // 16
ORDER BY doc_id, bin
"""


def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC decontamination — the modern complement to n-gram overlap
    (paraphrased eval leakage that shares no 5-gram): flag every training
    document whose embedding sits above cosine 0.42 against ANY eval
    member, reporting the closest eval doc and its similarity. The same
    deterministic md5 split as the n-gram tier plays the eval set
    (doc_id <-> vec_id).

    Scale shape: the eval side of decontamination is benchmark-sized by
    definition, so its vectors BROADCAST and the training corpus is
    scanned once — no shuffle of the big side; the per-train max is a
    partial-aggregated max_by. At eval sets too big to broadcast, the SRP
    bucketed path (dedup_embedding_cosine_bucketed) supplies the
    candidate prefilter with identical rescoring semantics."""
    emb = read_fixture(spark, sf_dir, "embeddings")
    is_eval = (
        F.substring(F.md5(F.concat(F.lit("eval:"), F.col("vec_id").cast("string"))), 1, 8)
        < "20000000"
    )
    from ..functions.vectors import as_double, cosine_arrow

    train = emb.filter(~is_eval).select(
        F.col("vec_id").alias("train_id"), as_double("embedding").alias("tv")
    )
    ev = emb.filter(is_eval).select(
        F.col("vec_id").alias("eval_id"), as_double("embedding").alias("ev")
    )
    scored = (
        train.join(F.broadcast(ev))
        .withColumn("_sim", cosine_arrow(F.col("tv"), F.col("ev")))
        .filter(F.col("_sim") >= 0.42)
    )
    return (
        scored.groupBy("train_id")
        .agg(
            F.max_by("eval_id", F.struct(F.col("_sim"), -F.col("eval_id"))).alias(
                "closest_eval_id"
            ),
            F.round(F.max("_sim"), 4).alias("max_sim"),
            F.count("*").cast("long").alias("n_eval_hits"),
        )
        .orderBy("train_id")
    )


SEMANTIC_DECONTAMINATE_ORACLE = """
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           SUBSTR(MD5('eval:' || CAST(vec_id AS VARCHAR)), 1, 8) < '20000000'
               AS is_eval
    FROM embeddings
), scored AS (
    SELECT t.vec_id AS train_id, ev.vec_id AS eval_id,
           LIST_INNER_PRODUCT(t.v, ev.v)
           / (SQRT(LIST_INNER_PRODUCT(t.v, t.v))
              * SQRT(LIST_INNER_PRODUCT(ev.v, ev.v))) AS sim
    FROM e t CROSS JOIN e ev
    WHERE NOT t.is_eval AND ev.is_eval
), hits AS (
    SELECT * FROM scored WHERE sim >= 0.42
), best AS (
    SELECT train_id, eval_id AS closest_eval_id, sim,
           ROW_NUMBER() OVER (PARTITION BY train_id
                              ORDER BY sim DESC, eval_id) AS rn
    FROM hits
)
SELECT h.train_id, b.closest_eval_id,
       ROUND(MAX(h.sim), 4) AS max_sim,
       CAST(COUNT(*) AS BIGINT) AS n_eval_hits
FROM hits h JOIN best b ON b.train_id = h.train_id AND b.rn = 1
GROUP BY h.train_id, b.closest_eval_id
ORDER BY h.train_id
"""


_BLOOM_BITS = 1 << 19
_BLOOM_HASHES = 3


def decontaminate_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination (operators/dedup
    .bloom_contamination): same eval/train split as
    decontaminate_eval_overlap, but train shingles first pass a broadcast
    md5-derived bloom of the eval shingles — the fixed-memory prefilter
    that scales when the benchmark suite is too big to broadcast raw. The
    bloom is deterministic, so the oracle replays the exact bit positions
    (the position set IS the filter) and hash-verifies both the prefilter
    margin (n_bloom_pass) and the exactly-confirmed overlaps (n_hit)."""
    from ..operators.dedup import bloom_contamination

    docs = read_fixture(spark, sf_dir, "documents")
    is_eval = (
        F.substring(F.md5(F.concat(F.lit("eval:"), F.col("doc_id").cast("string"))), 1, 8)
        < "20000000"
    )
    return bloom_contamination(
        docs.filter(~is_eval),
        docs.filter(is_eval),
        n=5,
        bits=_BLOOM_BITS,
        hashes=_BLOOM_HASHES,
    ).orderBy("doc_id")


def _bloom_pos_sql(j: int, bits: int) -> str:
    """DuckDB replay of _bloom_positions: base-16 positional sum of the
    first 8 hex digits of the j-salted md5, mod bits."""
    hexd = "0123456789abcdef"
    terms = " + ".join(
        f"(STRPOS('{hexd}', SUBSTR(MD5('bf{j}:' || shingle), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"(({terms}) % {bits})"


def _bloom_oracle_sql(bits: int = _BLOOM_BITS, hashes: int = _BLOOM_HASHES) -> str:
    ev_union = "\n        UNION ALL ".join(
        f"SELECT {_bloom_pos_sql(j, bits)} AS pos FROM ev" for j in range(hashes)
    )
    member = " AND ".join(
        f"{_bloom_pos_sql(j, bits)} IN (SELECT pos FROM evpos)" for j in range(hashes)
    )
    return f"""
WITH ev_ids AS (
    SELECT doc_id FROM documents
    WHERE SUBSTR(MD5('eval:' || CAST(doc_id AS VARCHAR)), 1, 8) < '20000000'
), toks AS (
    SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] AS shingle
    FROM toks, UNNEST(RANGE(1, LEN(t) - 3)) AS r(i)
), tr AS (
    SELECT * FROM sh WHERE doc_id NOT IN (SELECT doc_id FROM ev_ids)
), ev AS (
    SELECT DISTINCT shingle FROM sh
    WHERE doc_id IN (SELECT doc_id FROM ev_ids)
), evpos AS (
    SELECT DISTINCT pos FROM (
        {ev_union}
    )
), pass AS (
    SELECT doc_id, shingle FROM tr
    WHERE {member}
), sizes AS (
    SELECT doc_id, COUNT(*) AS n_shingles FROM tr GROUP BY doc_id
), nbp AS (
    SELECT doc_id, COUNT(*) AS n_bloom_pass FROM pass GROUP BY doc_id
), hits AS (
    SELECT p.doc_id, COUNT(*) AS n_hit
    FROM pass p JOIN ev e ON p.shingle = e.shingle
    GROUP BY p.doc_id
)
SELECT s.doc_id,
       CAST(s.n_shingles AS BIGINT) AS n_shingles,
       CAST(nbp.n_bloom_pass AS BIGINT) AS n_bloom_pass,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / s.n_shingles, 4) AS contamination
FROM nbp
JOIN sizes s USING (doc_id)
LEFT JOIN hits h USING (doc_id)
ORDER BY s.doc_id
"""


BLOOM_DECONTAMINATE_ORACLE = _bloom_oracle_sql()


def dedup_repeated_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-corpus exact repeated-substring detection
    (operators/dedup.repeated_ngram_spans): every 10-token window occurring
    >= 2 times anywhere in the corpus marks a duplicated span; per affected
    document, the merged-island span count, duplicated token count, and
    duplicated fraction — the ExactSubstr pass of Lee et al. 2021
    re-expressed as hash-census + gaps-and-islands dataflow (the
    fixed-window trade for a suffix array at corpus scale)."""
    from ..operators.dedup import repeated_ngram_spans

    docs = read_fixture(spark, sf_dir, "documents")
    return repeated_ngram_spans(docs, window=10, min_count=2).orderBy("doc_id")


_REPEAT_W = 10

REPEATED_SUBSTR_ORACLE = f"""
WITH t AS (
    SELECT doc_id,
           STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), w AS (
    SELECT doc_id, UNNEST(RANGE(0, LEN(toks) - {_REPEAT_W} + 1)) AS pos, toks
    FROM t WHERE LEN(toks) >= {_REPEAT_W}
), g AS (
    SELECT doc_id, pos,
           MD5(ARRAY_TO_STRING(toks[pos + 1:pos + {_REPEAT_W}], ' ')) AS h
    FROM w
), dup AS (
    SELECT h FROM g GROUP BY h HAVING COUNT(*) >= 2
), spans AS (
    SELECT g.doc_id, g.pos AS s, g.pos + {_REPEAT_W} AS e
    FROM g JOIN dup ON g.h = dup.h
), marked AS (
    SELECT *, CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                   THEN 1 ELSE 0 END AS _new
    FROM spans
), isl AS (
    SELECT *, SUM(_new) OVER (PARTITION BY doc_id ORDER BY s, e
                              ROWS UNBOUNDED PRECEDING) AS island_id
    FROM marked
), merged AS (
    SELECT doc_id, island_id, MIN(s) AS s, MAX(e) AS e
    FROM isl GROUP BY doc_id, island_id
), sizes AS (
    SELECT doc_id, CAST(LEN(toks) AS BIGINT) AS n_tokens FROM t
)
SELECT m.doc_id, sizes.n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
       CAST(SUM(m.e - m.s) AS BIGINT) AS dup_tokens,
       ROUND(CAST(SUM(m.e - m.s) AS DOUBLE) / sizes.n_tokens, 4) AS dup_frac
FROM merged m JOIN sizes ON m.doc_id = sizes.doc_id
GROUP BY m.doc_id, sizes.n_tokens
ORDER BY m.doc_id
"""


def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 lowest-character-entropy documents (operators/text
    .char_entropy) — the gibberish/boilerplate screen of a quality
    pipeline. Ranked on the ROUNDED entropy with doc_id tie-break so the
    cross-engine ordering is exact; low entropy here flags the repetitive
    planted duplicates' degenerate cousins."""
    from ..operators.text import char_entropy

    docs = read_fixture(spark, sf_dir, "documents")
    ent = char_entropy(docs)
    return ent.orderBy("entropy_nats", "doc_id").limit(20)


CHAR_ENTROPY_ORACLE = """
WITH chars AS (
    SELECT doc_id, SUBSTR(text, CAST(i AS INT), 1) AS ch
    FROM documents, UNNEST(RANGE(1, LEN(text) + 1)) AS t(i)
), counts AS (
    SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
), ent AS (
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_chars,
           CAST(COUNT(*) AS BIGINT) AS distinct_chars,
           ROUND(LN(SUM(c)) - SUM(c * LN(c)) / SUM(c), 6) AS entropy_nats
    FROM counts GROUP BY doc_id
)
SELECT doc_id, n_chars, distinct_chars, entropy_nats
FROM ent
ORDER BY entropy_nats, doc_id
LIMIT 20
"""


def dedup_source_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication flows: near-dup pairs (Jaccard >= 0.5)
    bucketed by the UNORDERED source pair of their endpoints — the matrix
    that tells a curation team which feeds mirror which (high off-diagonal
    mass = syndication; high diagonal = a feed re-posting itself). One
    broadcastable doc→source map joined onto the pair list; all the heavy
    lifting is the already-verified pair machinery."""
    from ..operators.dedup import ngram_jaccard_pairs

    docs = read_fixture(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    src = docs.select("doc_id", "source")
    sa = F.col("sa.source")
    sb = F.col("sb.source")
    return (
        pairs.join(src.alias("sa"), pairs.doc_a == F.col("sa.doc_id"))
        .join(src.alias("sb"), pairs.doc_b == F.col("sb.doc_id"))
        .select(
            F.least(sa, sb).alias("source_x"),
            F.greatest(sa, sb).alias("source_y"),
        )
        .groupBy("source_x", "source_y")
        .agg(F.count("*").alias("n_dup_pairs"))
        .orderBy("source_x", "source_y")
    )


SOURCE_FLOWS_ORACLE = """
WITH toks AS (
    SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
), sh AS (
    SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
    FROM toks, UNNEST(RANGE(1, LEN(t) - 1)) AS r(i)
), sizes AS (
    SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), commons AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), pairs AS (
    SELECT doc_a, doc_b FROM commons
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.5
)
SELECT LEAST(da.source, db.source) AS source_x,
       GREATEST(da.source, db.source) AS source_y,
       COUNT(*) AS n_dup_pairs
FROM pairs
JOIN documents da ON pairs.doc_a = da.doc_id
JOIN documents db ON pairs.doc_b = db.doc_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


#: Declarative data-quality contract: rule id -> (Spark predicate,
#: DuckDB predicate) that a VALID row satisfies. One scan evaluates all
#: rules as conditional aggregates (the expectations-suite pattern); the
#: pairs keep both engines evaluating the identical contract.
_QUALITY_RULES = [
    ("nonempty_text", "length(text) > 0", "LEN(text) > 0"),
    ("chars_match_len", "n_chars = length(text)", "n_chars = LEN(text)"),
    ("known_lang", "lang IN ('en','de','es','fr','zh')", "lang IN ('en','de','es','fr','zh')"),
    ("source_format", "source RLIKE '^src[0-9]+$'", "REGEXP_MATCHES(source, '^src[0-9]+$')"),
    ("id_nonnegative", "doc_id >= 0", "doc_id >= 0"),
    ("len_sane", "n_chars BETWEEN 1 AND 10000", "n_chars BETWEEN 1 AND 10000"),
]


def quality_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (the expectations-suite pattern): a
    rule table of named row-level invariants is evaluated in ONE scan as
    conditional aggregates — per rule, the violation count and rate —
    then unpivoted to a row per rule via ``stack``. Adding a rule is one
    tuple in the contract, zero new passes; at 100 TB this is the same
    single scan. The contract pairs each Spark predicate with its DuckDB
    twin so the oracle checks the same invariants, not a re-derivation."""
    docs = read_fixture(spark, sf_dir, "documents")
    aggs = [F.count("*").alias("n_rows")] + [
        F.sum(F.when(F.expr(spark_pred), 0).otherwise(1)).alias(f"v{i}")
        for i, (_, spark_pred, _) in enumerate(_QUALITY_RULES)
    ]
    wide = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', v{i}" for i, (name, _, _) in enumerate(_QUALITY_RULES)
    )
    return (
        wide.select(
            "n_rows",
            F.expr(
                f"stack({len(_QUALITY_RULES)}, {stack_args}) AS (rule, n_violations)"
            ),
        )
        .select(
            "rule",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_violations").cast("long").alias("n_violations"),
            F.round(F.col("n_violations") / F.col("n_rows"), 6).alias("violation_rate"),
        )
        .orderBy("rule")
    )


def _rules_oracle_sql() -> str:
    selects = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS rule, CAST(COUNT(*) AS BIGINT) AS n_rows,\n"
        f"       CAST(SUM(CASE WHEN {duck_pred} THEN 0 ELSE 1 END) AS BIGINT) AS n_violations\n"
        f"FROM documents"
        for name, _, duck_pred in _QUALITY_RULES
    )
    return f"""
WITH per_rule AS (
{selects}
)
SELECT rule, n_rows, n_violations,
       ROUND(CAST(n_violations AS DOUBLE) / n_rows, 6) AS violation_rate
FROM per_rule
ORDER BY rule
"""


RULES_ORACLE = _rules_oracle_sql()


def pipeline_rag_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG indexing + retrieval, end-to-end as ONE verified dataflow —
    the second capstone (pipeline_pretraining_corpus covers curation;
    this covers serving): documents are chunked into overlapping token
    windows (chunk_with_overlap's geometry as a token-level codegen
    expansion — the terms explode straight off the token slices), the chunk
    corpus becomes a TF-IDF inverted index (term-keyed — the only
    data-sized shuffle), and the first three documents act as queries,
    each retrieving its top-3 foreign chunks (own-document chunks
    excluded) by cosine through the index. Ranking uses the ROUNDED
    score with (doc, chunk) tie-break: duplicate chunks are exact ties
    and must order by id on both engines.

    Scale: query vectors are a handful of rows (broadcast side of the
    score join); chunk index construction is linear in corpus tokens;
    serving cost is bounded by the posting lists the query terms touch —
    the sparse-retrieval shape that serves web-scale BM25."""
    from pyspark.sql import Window

    from ..functions.cache import scoped_persist
    from ..functions.texts import tokens

    docs = read_fixture(spark, sf_dir, "documents")
    # Chunk geometry (chunk_tokens=16, overlap=4 → stride 12), kept in
    # lockstep with chunk_with_overlap and the oracle SQL. r15 (guide §1.2,
    # §2.4): the r14 shape materialized an 85k-row chunk_text STRING cache
    # (concat_ws over token slices) only to re-split every string back into
    # tokens for ctf and to count rows for n_chunks. Now the corpus chunk
    # count is ONE scalar aggregate of the same per-doc formula (no chunk
    # materialization at all), and ctf explodes the token SLICES directly —
    # identical terms (split(concat_ws(sep, arr), sep) == arr for the
    # non-empty arrays tokens() always yields), no string round-trip, no
    # chunk cache to build on the cold pass.
    chunk_tokens, overlap, stride = 16, 4, 12
    toks = tokens("text")
    n_toks = F.size(toks)
    n_chunks_doc = F.greatest(
        F.ceil((n_toks - F.lit(overlap)) / F.lit(stride)), F.lit(1)
    )
    n_chunks = docs.select(F.sum(n_chunks_doc).alias("n")).collect()[0]["n"]
    starts = F.sequence(
        F.lit(0), (n_chunks_doc - 1).cast("int") * stride, F.lit(stride)
    )
    cstructs = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("long").alias("chunk_id"),
            F.slice(toks, s + 1, chunk_tokens).alias("ctoks"),
        ),
    )
    ctf = (
        docs.select("doc_id", F.explode(cstructs).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.explode("c.ctoks").alias("term"),
        )
        .groupBy("doc_id", "chunk_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    ctf = scoped_persist(ctf)
    # ctf is unique per (doc_id, chunk_id, term) BY CONSTRUCTION (groupBy
    # output), so df is a plain count — the r14 countDistinct paid a second
    # distinct-aggregation phase to deduplicate already-unique rows (§2.4)
    df_tbl = ctf.groupBy("term").agg(F.count("*").alias("df"))
    # idf feeds BOTH the chunk-weight and query-weight joins — persisted,
    # the df aggregation over ctf runs once, not once per consumer
    # (the round-4 bm25 lesson: benching exposed silent recomputes)
    idf = scoped_persist(
        df_tbl.select("term", F.log(F.lit(float(n_chunks)) / F.col("df")).alias("idf"))
    )
    wc = ctf.join(idf, "term").select(
        "doc_id", "chunk_id", "term", (F.col("tf") * F.col("idf")).alias("w")
    )
    # L2 norm as a window over the (doc, chunk) partition: one pass over
    # wc instead of a groupBy + self-join that recomputes the weight join
    wn = Window.partitionBy("doc_id", "chunk_id")
    uc = scoped_persist(
        wc.withColumn("norm", F.sqrt(F.sum(F.col("w") * F.col("w")).over(wn)))
        .filter(F.col("norm") > 0)
        .select("doc_id", "chunk_id", "term", (F.col("w") / F.col("norm")).alias("u"))
    )
    qtf = (
        docs.filter(F.col("doc_id") < 3)
        .select(F.col("doc_id").alias("query_doc"), F.explode(tokens("text")).alias("term"))
        .groupBy("query_doc", "term")
        .agg(F.count("*").alias("tf"))
    )
    wq = qtf.join(idf, "term").select(
        "query_doc", "term", (F.col("tf") * F.col("idf")).alias("w")
    )
    # query norm as a window over the query_doc partition — same shape as
    # the chunk norm above: one pass over wq instead of a groupBy +
    # self-join that re-ran the query-side scan + idf join twice (r15 §1.2;
    # the r14 before-plan shows two documents scans on the query side)
    wn_q = Window.partitionBy("query_doc")
    uq = (
        wq.withColumn("qn", F.sqrt(F.sum(F.col("w") * F.col("w")).over(wn_q)))
        .filter(F.col("qn") > 0)
        .select("query_doc", "term", (F.col("w") / F.col("qn")).alias("uq"))
    )
    scores = (
        uc.join(F.broadcast(uq), "term")
        .filter(F.col("doc_id") != F.col("query_doc"))
        .groupBy("query_doc", "doc_id", "chunk_id")
        .agg(F.round(F.sum(F.col("u") * F.col("uq")), 4).alias("sim"))
    )
    w = Window.partitionBy("query_doc").orderBy(
        F.desc("sim"), "doc_id", "chunk_id"
    )
    return (
        scores.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_doc", "rnk", "doc_id", "chunk_id", "sim")
        .orderBy("query_doc", "rnk")
    )


RAG_ORACLE = """
WITH base AS (
    SELECT doc_id, STRING_SPLIT(text, ' ') AS toks,
           LEN(STRING_SPLIT(text, ' ')) AS n
    FROM documents
), sized AS (
    SELECT doc_id, toks, n,
           GREATEST(CAST(CEIL((n - 4) / 12.0) AS BIGINT), 1) AS n_chunks
    FROM base
), starts AS (
    SELECT doc_id, toks, n,
           UNNEST(GENERATE_SERIES(0, (n_chunks - 1) * 12, 12)) AS s
    FROM sized
), chunks AS (
    SELECT doc_id, CAST(s / 12 AS BIGINT) AS chunk_id,
           ARRAY_TO_STRING(toks[s + 1 : s + 16], ' ') AS chunk_text
    FROM starts
), ctf AS (
    SELECT doc_id, chunk_id, UNNEST(STRING_SPLIT(chunk_text, ' ')) AS term
    FROM chunks
), ctfc AS (
    SELECT doc_id, chunk_id, term, COUNT(*) AS tf
    FROM ctf GROUP BY 1, 2, 3
), nch AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n_chunks FROM chunks
), idf AS (
    SELECT term, LN(n_chunks / COUNT(*)) AS idf
    FROM (SELECT DISTINCT doc_id, chunk_id, term FROM ctfc), nch
    GROUP BY term, n_chunks
), wc AS (
    SELECT doc_id, chunk_id, c.term, c.tf * idf.idf AS w
    FROM ctfc c JOIN idf ON c.term = idf.term
), cnorm AS (
    SELECT doc_id, chunk_id, SQRT(SUM(w * w)) AS norm
    FROM wc GROUP BY doc_id, chunk_id
), uc AS (
    SELECT wc.doc_id, wc.chunk_id, term, w / norm AS u
    FROM wc JOIN cnorm ON wc.doc_id = cnorm.doc_id AND wc.chunk_id = cnorm.chunk_id
    WHERE norm > 0
), qtf AS (
    SELECT doc_id AS query_doc, UNNEST(STRING_SPLIT(text, ' ')) AS term
    FROM documents WHERE doc_id < 3
), qtfc AS (
    SELECT query_doc, term, COUNT(*) AS tf FROM qtf GROUP BY 1, 2
), wq AS (
    SELECT query_doc, q.term, q.tf * idf.idf AS w
    FROM qtfc q JOIN idf ON q.term = idf.term
), qnorm AS (
    SELECT query_doc, SQRT(SUM(w * w)) AS qn FROM wq GROUP BY query_doc
), uq AS (
    SELECT wq.query_doc, term, w / qn AS uq
    FROM wq JOIN qnorm ON wq.query_doc = qnorm.query_doc
    WHERE qn > 0
), scores AS (
    SELECT uq.query_doc, uc.doc_id, uc.chunk_id,
           ROUND(SUM(uc.u * uq.uq), 4) AS sim
    FROM uc JOIN uq ON uc.term = uq.term
    WHERE uc.doc_id <> uq.query_doc
    GROUP BY 1, 2, 3
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_doc
                                 ORDER BY sim DESC, doc_id, chunk_id) AS rnk
    FROM scores
)
SELECT query_doc, CAST(rnk AS INT) AS rnk, doc_id, chunk_id, sim
FROM ranked
WHERE rnk <= 3
ORDER BY query_doc, rnk
"""


def pipeline_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval cascade — the production serving architecture:
    cheap SPARSE recall (Okapi BM25 over the inverted index, top-10
    candidates per query) followed by DENSE rerank (embedding cosine
    between the query doc's vector and each candidate's vector, doc_id ↔
    vec_id), emitting the top-3 with both scores. The cascade is the
    point: the expensive vector comparison touches only the 10 BM25
    survivors per query, never the corpus — exactly how web-scale
    two-tower systems bound dense-scoring cost. Both stages' ranking
    uses rounded scores with id tie-breaks; the oracle replays BM25,
    the candidate cut, and the cosine rerank end-to-end."""
    emb = read_fixture(spark, sf_dir, "embeddings")
    bm25 = text_bm25_topk(spark, sf_dir, k=10)
    from ..functions.vectors import as_double, cosine

    vecs = emb.select("vec_id", as_double("embedding").alias("v"))
    qv = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_doc"), F.col("v").alias("qvec")
    )
    reranked = (
        bm25.join(vecs, bm25.doc_id == vecs.vec_id)
        .join(F.broadcast(qv), "query_doc")
        .select(
            "query_doc",
            "doc_id",
            "bm25",
            F.round(cosine(F.col("qvec"), F.col("v")), 4).alias("dense_sim"),
        )
    )
    w = Window.partitionBy("query_doc").orderBy(F.desc("dense_sim"), "doc_id")
    return (
        reranked.withColumn("final_rnk", F.row_number().over(w))
        .filter(F.col("final_rnk") <= 3)
        .select("query_doc", "final_rnk", "doc_id", "bm25", "dense_sim")
        .orderBy("query_doc", "final_rnk")
    )


HYBRID_ORACLE = f"""
WITH tf AS (
    SELECT doc_id, term, COUNT(*) AS tf
    FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents)
    GROUP BY doc_id, term
), dlen AS (
    SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id
), stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avg_dl FROM dlen
), idf AS (
    SELECT term, LN((n_docs - COUNT(*) + 0.5) / (COUNT(*) + 0.5) + 1.0) AS idf
    FROM tf, stats GROUP BY term, n_docs
), qtf AS (
    SELECT doc_id AS query_doc, term, tf AS qtf FROM tf WHERE doc_id < 3
), contrib AS (
    SELECT q.query_doc, tf.doc_id,
           q.qtf * idf.idf * (tf.tf * ({_BM25_K1} + 1))
           / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dlen.dl / stats.avg_dl)) AS c
    FROM tf
    JOIN dlen ON tf.doc_id = dlen.doc_id
    JOIN idf ON tf.term = idf.term
    JOIN qtf q ON tf.term = q.term
    CROSS JOIN stats
    WHERE tf.doc_id <> q.query_doc
), scores AS (
    SELECT query_doc, doc_id, ROUND(SUM(c), 4) AS bm25
    FROM contrib GROUP BY query_doc, doc_id
), cands AS (
    SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_doc
                                     ORDER BY bm25 DESC, doc_id) AS rnk
        FROM scores
    ) WHERE rnk <= 10
), ev AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), reranked AS (
    SELECT c.query_doc, c.doc_id, c.bm25,
           ROUND(LIST_INNER_PRODUCT(q.v, d.v)
                 / (SQRT(LIST_INNER_PRODUCT(q.v, q.v))
                    * SQRT(LIST_INNER_PRODUCT(d.v, d.v))), 4) AS dense_sim
    FROM cands c
    JOIN ev d ON d.vec_id = c.doc_id
    JOIN ev q ON q.vec_id = c.query_doc
), final AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_doc
                                 ORDER BY dense_sim DESC, doc_id) AS final_rnk
    FROM reranked
)
SELECT query_doc, CAST(final_rnk AS INT) AS final_rnk, doc_id, bm25, dense_sim
FROM final
WHERE final_rnk <= 3
ORDER BY query_doc, final_rnk
"""


def dedup_cascade_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup waterfall — the first table of every curation report:
    documents surviving each cascade stage (exact content hash, then
    near-dup Jaccard >= 0.8, then >= 0.5 among the remaining), with
    per-stage entering/removed/remaining counts. Stage semantics are
    ONE-SHOT: a doc is removed when it pairs (at that stage's threshold)
    with a smaller-id doc that ENTERED the stage — deterministic,
    order-free, and exactly what the oracle replays (the within-stage
    cascade variant would depend on removal order). Each stage reuses
    the verified pair machinery over a shrinking survivor set.

    Unlike events_funnel (whose 4-action chain was fused — its stages
    were all views of one frame), this report's per-stage actions are a
    TRUE sequential dependency: stage k+1's pair generation consumes
    stage k's anti-joined survivor set, so the counts cannot fuse into
    one job without recomputing every stage inside it."""
    from ..operators.dedup import exact_dedup, ngram_jaccard_pairs

    docs = read_fixture(spark, sf_dir, "documents")
    n0 = docs.count()
    keepers = exact_dedup(docs).select(F.col("keeper_id").alias("doc_id"))
    s1 = docs.join(keepers, "doc_id")
    n1 = s1.count()
    rows = [("1_exact", n0, n0 - n1, n1)]
    cur = s1
    n_prev = n1
    for stage, thr in (("2_jaccard_080", 0.8), ("3_jaccard_050", 0.5)):
        pairs = ngram_jaccard_pairs(cur, threshold=thr)
        removed = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        cur = cur.join(removed, "doc_id", "left_anti")
        n_cur = cur.count()
        rows.append((stage, n_prev, n_prev - n_cur, n_cur))
        n_prev = n_cur
    return spark.createDataFrame(
        rows, "stage string, n_entering long, n_removed long, n_remaining long"
    ).orderBy("stage")


CASCADE_WATERFALL_ORACLE = """
WITH keepers AS (
    SELECT MIN(doc_id) AS doc_id
    FROM (SELECT doc_id,
                 MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS h
          FROM documents)
    GROUP BY h
), s1 AS (
    SELECT d.doc_id, d.text FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
), sh1 AS (
    SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
    FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM s1),
         UNNEST(RANGE(1, LEN(t) - 1)) AS r(i)
), sz1 AS (
    SELECT doc_id, COUNT(*) AS n FROM sh1 GROUP BY doc_id
), rm2 AS (
    SELECT DISTINCT b.doc_id
    FROM (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS n_common
          FROM sh1 a JOIN sh1 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2) c
    JOIN sz1 sa ON c.da = sa.doc_id
    JOIN sz1 sb ON c.db = sb.doc_id
    JOIN s1 b ON b.doc_id = c.db
    WHERE c.n_common::DOUBLE / (sa.n + sb.n - c.n_common) >= 0.8
), s2 AS (
    SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM rm2)
), sh2 AS (
    SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
    FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM s2),
         UNNEST(RANGE(1, LEN(t) - 1)) AS r(i)
), sz2 AS (
    SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id
), rm3 AS (
    SELECT DISTINCT b.doc_id
    FROM (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS n_common
          FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2) c
    JOIN sz2 sa ON c.da = sa.doc_id
    JOIN sz2 sb ON c.db = sb.doc_id
    JOIN s2 b ON b.doc_id = c.db
    WHERE c.n_common::DOUBLE / (sa.n + sb.n - c.n_common) >= 0.5
), s3 AS (
    SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM rm3)
), counts AS (
    SELECT (SELECT COUNT(*) FROM documents) AS n0,
           (SELECT COUNT(*) FROM s1) AS n1,
           (SELECT COUNT(*) FROM s2) AS n2,
           (SELECT COUNT(*) FROM s3) AS n3
)
SELECT stage, n_entering, n_removed, n_remaining FROM (
    SELECT '1_exact' AS stage, CAST(n0 AS BIGINT) AS n_entering,
           CAST(n0 - n1 AS BIGINT) AS n_removed, CAST(n1 AS BIGINT) AS n_remaining
    FROM counts
    UNION ALL
    SELECT '2_jaccard_080', CAST(n1 AS BIGINT), CAST(n1 - n2 AS BIGINT), CAST(n2 AS BIGINT)
    FROM counts
    UNION ALL
    SELECT '3_jaccard_050', CAST(n2 AS BIGINT), CAST(n2 - n3 AS BIGINT), CAST(n3 AS BIGINT)
    FROM counts
)
ORDER BY stage
"""


def report_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card — the one-screen datasheet a corpus release ships
    with, computed as a single union of aggregates: row/char/token
    totals, language and source cardinalities, exact-duplicate rate,
    short-doc rate, and embedding coverage (docs with a vector). Each
    metric is a corpus-wide aggregate the underlying tiers verify in
    depth elsewhere; this query is the roll-up a reviewer actually
    reads. Values are emitted as (metric, value) rows with DOUBLE values
    so one schema carries counts and rates."""
    docs = read_fixture(spark, sf_dir, "documents")
    emb = read_fixture(spark, sf_dir, "embeddings")
    from ..functions.texts import token_count
    from ..operators.dedup import exact_dedup

    dup_groups = exact_dedup(docs).agg(
        F.count("*").alias("n_distinct"), F.sum("n_copies").alias("n_rows")
    )
    base = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.sum("n_chars").cast("double").alias("total_chars"),
        F.sum(token_count("text")).cast("double").alias("total_tokens"),
        F.countDistinct("lang").cast("double").alias("n_langs"),
        F.countDistinct("source").cast("double").alias("n_sources"),
        F.round(
            F.sum(F.when(F.size(F.split("text", " ")) < 20, 1).otherwise(0))
            / F.count("*"),
            4,
        ).alias("short_doc_rate"),
    )
    emb_cov = (
        docs.join(emb, docs.doc_id == emb.vec_id, "left_outer")
        .agg(
            F.round(F.count("vec_id") / F.count("*"), 4).alias("embedding_coverage")
        )
    )
    dup_rate = dup_groups.select(
        F.round(
            (F.col("n_rows") - F.col("n_distinct")) / F.col("n_rows"), 4
        ).alias("exact_dup_rate")
    )
    wide = base.crossJoin(F.broadcast(emb_cov)).crossJoin(F.broadcast(dup_rate))
    metrics = [
        "n_docs", "total_chars", "total_tokens", "n_langs", "n_sources",
        "short_doc_rate", "embedding_coverage", "exact_dup_rate",
    ]
    stack_args = ", ".join(f"'{m}', {m}" for m in metrics)
    return (
        wide.select(
            F.expr(f"stack({len(metrics)}, {stack_args}) AS (metric, value)")
        )
        .orderBy("metric")
    )


DATASET_CARD_ORACLE = """
WITH base AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) AS total_chars,
           CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS DOUBLE) AS total_tokens,
           CAST(COUNT(DISTINCT lang) AS DOUBLE) AS n_langs,
           CAST(COUNT(DISTINCT source) AS DOUBLE) AS n_sources,
           ROUND(SUM(CASE WHEN LEN(STRING_SPLIT(text, ' ')) < 20 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS short_doc_rate
    FROM documents
), cov AS (
    SELECT ROUND(COUNT(e.vec_id) / CAST(COUNT(*) AS DOUBLE), 4) AS embedding_coverage
    FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
), dup AS (
    SELECT ROUND((SUM(n_copies) - COUNT(*)) / CAST(SUM(n_copies) AS DOUBLE), 4)
               AS exact_dup_rate
    FROM (
        SELECT COUNT(*) AS n_copies
        FROM (SELECT MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS h
              FROM documents)
        GROUP BY h
    )
)
SELECT metric, value FROM (
    SELECT 'n_docs' AS metric, n_docs AS value FROM base
    UNION ALL SELECT 'total_chars', total_chars FROM base
    UNION ALL SELECT 'total_tokens', total_tokens FROM base
    UNION ALL SELECT 'n_langs', n_langs FROM base
    UNION ALL SELECT 'n_sources', n_sources FROM base
    UNION ALL SELECT 'short_doc_rate', short_doc_rate FROM base
    UNION ALL SELECT 'embedding_coverage', embedding_coverage FROM cov
    UNION ALL SELECT 'exact_dup_rate', exact_dup_rate FROM dup
)
ORDER BY metric
"""


def text_diversity_distinct_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity per source (the NLG-eval metric family):
    unique n-grams over total n-grams for n = 1, 2, 3 — degenerate or
    templated generation collapses distinct-2/3 toward 0 while natural
    text stays high. One tokenize pass feeds all three orders through
    lead() columns on a shared doc-partitioned window; counts are
    integer-exact so the ratios replay to the rounding digit."""
    from ..functions.texts import tokens as _tokens

    docs = read_fixture(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.col("doc_id"), F.posexplode(_tokens("text")).alias("pos", "t1")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = tok.withColumn("t2", F.lead("t1", 1).over(w)).withColumn(
        "t3", F.lead("t1", 2).over(w)
    )
    per_n = grams.groupBy("source").agg(
        F.count("t1").cast("long").alias("total_1"),
        F.countDistinct("t1").alias("distinct_1"),
        F.count(F.when(F.col("t2").isNotNull(), 1)).cast("long").alias("total_2"),
        F.countDistinct(
            F.when(F.col("t2").isNotNull(), F.concat_ws(" ", "t1", "t2"))
        ).alias("distinct_2"),
        F.count(F.when(F.col("t3").isNotNull(), 1)).cast("long").alias("total_3"),
        F.countDistinct(
            F.when(F.col("t3").isNotNull(), F.concat_ws(" ", "t1", "t2", "t3"))
        ).alias("distinct_3"),
    )
    return per_n.select(
        "source",
        "total_1",
        F.round(F.col("distinct_1") / F.col("total_1"), 4).alias("d1_ratio"),
        F.round(F.col("distinct_2") / F.col("total_2"), 4).alias("d2_ratio"),
        F.round(F.col("distinct_3") / F.col("total_3"), 4).alias("d3_ratio"),
    ).orderBy("source")


DIVERSITY_ORACLE = """
WITH tok AS (
    SELECT source, doc_id,
           GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS pos,
           UNNEST(STRING_SPLIT(text, ' ')) AS t1
    FROM documents
), grams AS (
    SELECT source, t1,
           LEAD(t1, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2,
           LEAD(t1, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t3
    FROM tok
), per_n AS (
    SELECT source,
           COUNT(t1) AS total_1,
           COUNT(DISTINCT t1) AS distinct_1,
           COUNT(CASE WHEN t2 IS NOT NULL THEN 1 END) AS total_2,
           COUNT(DISTINCT CASE WHEN t2 IS NOT NULL THEN t1 || ' ' || t2 END) AS distinct_2,
           COUNT(CASE WHEN t3 IS NOT NULL THEN 1 END) AS total_3,
           COUNT(DISTINCT CASE WHEN t3 IS NOT NULL THEN t1 || ' ' || t2 || ' ' || t3 END) AS distinct_3
    FROM grams
    GROUP BY source
)
SELECT source,
       CAST(total_1 AS BIGINT) AS total_1,
       ROUND(CAST(distinct_1 AS DOUBLE) / total_1, 4) AS d1_ratio,
       ROUND(CAST(distinct_2 AS DOUBLE) / total_2, 4) AS d2_ratio,
       ROUND(CAST(distinct_3 AS DOUBLE) / total_3, 4) AS d3_ratio
FROM per_n
ORDER BY source
"""


def retrieval_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion of the sparse and dense rankers — the
    calibration-free fusion standard (Cormack et al.): each of BM25's
    and embedding-cosine's top-10 lists contributes 1/(60 + rank), fused
    by full outer join on (query, doc) so a doc ranked by either list
    scores — no score normalization across heterogeneous rankers, which
    is the method's whole point (vs pipeline_hybrid_retrieval's cascade,
    which trusts the dense scores outright). Pure rational arithmetic ⇒
    exact cross-engine replay."""
    from ..functions.vectors import as_double, cosine

    emb = read_fixture(spark, sf_dir, "embeddings")
    bm25 = text_bm25_topk(spark, sf_dir, k=10).select(
        "query_doc", "doc_id", F.col("rnk").alias("rnk_sparse")
    )
    vecs = emb.select("vec_id", as_double("embedding").alias("v"))
    qv = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_doc"), F.col("v").alias("qvec")
    )
    dense_scored = (
        vecs.join(F.broadcast(qv), F.col("vec_id") != F.col("query_doc"))
        .select(
            "query_doc",
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("qvec"), F.col("v")), 4).alias("dsim"),
        )
    )
    wd = Window.partitionBy("query_doc").orderBy(F.desc("dsim"), "doc_id")
    dense = (
        dense_scored.withColumn("rnk_dense", F.row_number().over(wd))
        .filter(F.col("rnk_dense") <= 10)
        .select("query_doc", "doc_id", "rnk_dense")
    )
    fused = (
        bm25.join(dense, ["query_doc", "doc_id"], "full_outer")
        .withColumn(
            "rrf",
            F.round(
                F.coalesce(F.lit(1.0) / (F.lit(60.0) + F.col("rnk_sparse")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (F.lit(60.0) + F.col("rnk_dense")), F.lit(0.0)),
                6,
            ),
        )
    )
    wf = Window.partitionBy("query_doc").orderBy(F.desc("rrf"), "doc_id")
    return (
        fused.withColumn("final_rnk", F.row_number().over(wf))
        .filter(F.col("final_rnk") <= 3)
        .select(
            "query_doc",
            "final_rnk",
            "doc_id",
            F.coalesce(F.col("rnk_sparse"), F.lit(-1)).cast("int").alias("rnk_sparse"),
            F.coalesce(F.col("rnk_dense"), F.lit(-1)).cast("int").alias("rnk_dense"),
            "rrf",
        )
        .orderBy("query_doc", "final_rnk")
    )


RRF_ORACLE = f"""
WITH tf AS (
    SELECT doc_id, term, COUNT(*) AS tf
    FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents)
    GROUP BY doc_id, term
), dlen AS (
    SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id
), stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avg_dl FROM dlen
), idf AS (
    SELECT term, LN((n_docs - COUNT(*) + 0.5) / (COUNT(*) + 0.5) + 1.0) AS idf
    FROM tf, stats GROUP BY term, n_docs
), qtf AS (
    SELECT doc_id AS query_doc, term, tf AS qtf FROM tf WHERE doc_id < 3
), contrib AS (
    SELECT q.query_doc, tf.doc_id,
           q.qtf * idf.idf * (tf.tf * ({_BM25_K1} + 1))
           / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dlen.dl / stats.avg_dl)) AS c
    FROM tf
    JOIN dlen ON tf.doc_id = dlen.doc_id
    JOIN idf ON tf.term = idf.term
    JOIN qtf q ON tf.term = q.term
    CROSS JOIN stats
    WHERE tf.doc_id <> q.query_doc
), sparse AS (
    SELECT query_doc, doc_id, rnk AS rnk_sparse FROM (
        SELECT query_doc, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_doc
                                  ORDER BY ROUND(SUM(c), 4) DESC, doc_id) AS rnk
        FROM contrib GROUP BY query_doc, doc_id
    ) WHERE rnk <= 10
), ev AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), dense AS (
    SELECT query_doc, doc_id, rnk AS rnk_dense FROM (
        SELECT q.vec_id AS query_doc, d.vec_id AS doc_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ROUND(LIST_INNER_PRODUCT(q.v, d.v)
                       / (SQRT(LIST_INNER_PRODUCT(q.v, q.v))
                          * SQRT(LIST_INNER_PRODUCT(d.v, d.v))), 4) DESC,
                       d.vec_id) AS rnk
        FROM ev q JOIN ev d ON d.vec_id <> q.vec_id
        WHERE q.vec_id < 3
    ) WHERE rnk <= 10
), fused AS (
    SELECT COALESCE(s.query_doc, d.query_doc) AS query_doc,
           COALESCE(s.doc_id, d.doc_id) AS doc_id,
           s.rnk_sparse, d.rnk_dense,
           ROUND(COALESCE(1.0 / (60.0 + s.rnk_sparse), 0.0)
                 + COALESCE(1.0 / (60.0 + d.rnk_dense), 0.0), 6) AS rrf
    FROM sparse s FULL OUTER JOIN dense d
      ON s.query_doc = d.query_doc AND s.doc_id = d.doc_id
), final AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_doc
                                 ORDER BY rrf DESC, doc_id) AS final_rnk
    FROM fused
)
SELECT query_doc, CAST(final_rnk AS INT) AS final_rnk, doc_id,
       CAST(COALESCE(rnk_sparse, -1) AS INT) AS rnk_sparse,
       CAST(COALESCE(rnk_dense, -1) AS INT) AS rnk_dense,
       rrf
FROM final
WHERE final_rnk <= 3
ORDER BY query_doc, final_rnk
"""


def text_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive vocabulary per language by smoothed log-odds (the
    Monroe–Colaresi–Quinn 'fightin' words' statistic with a uniform
    Dirichlet prior, alpha=1): for each language, the 5 terms whose
    usage odds most exceed the rest of the corpus — the screen that
    surfaces contamination (wrong-language terms) and register drift in
    a multilingual mix. One token-count shuffle; everything after runs
    on the |langs| x |vocab| count table. Rational-input LN over
    integer-derived odds; ranking on the ROUNDED score, term
    tie-break."""
    docs = read_fixture(spark, sf_dir, "documents")
    from ..functions.texts import tokens as _tokens

    tc = (
        docs.select("lang", F.explode(_tokens("text")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count("*").alias("y"))
    )
    totals = tc.groupBy("lang").agg(F.sum("y").alias("n_lang"))
    term_tot = tc.groupBy("term").agg(F.sum("y").alias("y_all"))
    corpus = tc.agg(F.sum("y").alias("n_all"))
    j = (
        tc.join(totals, "lang")
        .join(term_tot, "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn("y_rest", F.col("y_all") - F.col("y"))
        .withColumn("n_rest", F.col("n_all") - F.col("n_lang"))
    )
    log_odds_lang = F.log(
        (F.col("y") + 1.0) / (F.col("n_lang") - F.col("y") + 1.0)
    )
    log_odds_rest = F.log(
        (F.col("y_rest") + 1.0) / (F.col("n_rest") - F.col("y_rest") + 1.0)
    )
    scored = j.select(
        "lang",
        "term",
        F.col("y").cast("long").alias("n_in_lang"),
        F.col("y_rest").cast("long").alias("n_in_rest"),
        F.round(log_odds_lang - log_odds_rest, 4).alias("log_odds"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("log_odds"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("lang", "rnk", "term", "n_in_lang", "n_in_rest", "log_odds")
        .orderBy("lang", "rnk")
    )


DISTINCTIVE_ORACLE = """
WITH tc AS (
    SELECT lang, term, COUNT(*) AS y
    FROM (SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents)
    GROUP BY lang, term
), totals AS (
    SELECT lang, SUM(y) AS n_lang FROM tc GROUP BY lang
), term_tot AS (
    SELECT term, SUM(y) AS y_all FROM tc GROUP BY term
), corpus AS (
    SELECT SUM(y) AS n_all FROM tc
), scored AS (
    SELECT tc.lang, tc.term,
           CAST(tc.y AS BIGINT) AS n_in_lang,
           CAST(term_tot.y_all - tc.y AS BIGINT) AS n_in_rest,
           ROUND(LN((tc.y + 1.0) / (totals.n_lang - tc.y + 1.0))
                 - LN((term_tot.y_all - tc.y + 1.0)
                      / (corpus.n_all - totals.n_lang - (term_tot.y_all - tc.y) + 1.0)),
                 4) AS log_odds
    FROM tc
    JOIN totals ON tc.lang = totals.lang
    JOIN term_tot ON tc.term = term_tot.term
    CROSS JOIN corpus
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                 ORDER BY log_odds DESC, term) AS rnk
    FROM scored
)
SELECT lang, CAST(rnk AS INT) AS rnk, term, n_in_lang, n_in_rest, log_odds
FROM ranked
WHERE rnk <= 5
ORDER BY lang, rnk
"""


def mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each probe
    (vec_id < 10), the 3 most-similar vectors carrying a DIFFERENT label
    — the near-miss examples that teach an embedding model its decision
    boundary (random negatives are trivially separable). Same broadcast
    probe-side shape as bruteforce_topk with the cross-label predicate
    fused into the join; at scale the ANN tier (IVF/PQ) generates the
    candidates and this exact scoring reranks them."""
    from ..functions.vectors import as_double, cosine

    emb = read_fixture(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        as_double("embedding").alias("cv"),
    )
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("probe_label"),
        as_double("embedding").alias("pv"),
    )
    scored = corpus.join(
        F.broadcast(probes), F.col("neighbor_label") != F.col("probe_label")
    ).select(
        "probe_id",
        "probe_label",
        "neighbor_id",
        "neighbor_label",
        cosine(F.col("pv"), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "probe_id",
            "probe_label",
            "rnk",
            "neighbor_id",
            "neighbor_label",
            F.round("sim", 4).alias("sim"),
        )
        .orderBy("probe_id", "rnk")
    )


HARD_NEGATIVES_ORACLE = """
WITH p AS (
    SELECT vec_id AS probe_id, label AS probe_label,
           CAST(embedding AS DOUBLE[]) AS pv
    FROM embeddings WHERE vec_id < 10
), c AS (
    SELECT vec_id AS neighbor_id, label AS neighbor_label,
           CAST(embedding AS DOUBLE[]) AS cv
    FROM embeddings
), scored AS (
    SELECT probe_id, probe_label, neighbor_id, neighbor_label,
           LIST_INNER_PRODUCT(pv, cv)
           / (SQRT(LIST_INNER_PRODUCT(pv, pv)) * SQRT(LIST_INNER_PRODUCT(cv, cv)))
               AS sim
    FROM p JOIN c ON neighbor_label <> probe_label
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                 ORDER BY sim DESC, neighbor_id) AS rnk
    FROM scored
)
SELECT probe_id, probe_label, CAST(rnk AS INT) AS rnk,
       neighbor_id, neighbor_label, ROUND(sim, 4) AS sim
FROM ranked
WHERE rnk <= 3
ORDER BY probe_id, rnk
"""


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-conditional embedding outliers: the 10 vectors farthest
    (squared L2) from their own label's mean vector — mislabeled or
    corrupted embeddings surface here first (the per-vector complement
    to embedding_dim_stats' per-dimension screen). Exploded space keeps
    the whole computation in two keyed aggregations: per-(label, dim)
    means, then per-vector distance sums; ranking is global top-10 via
    TakeOrderedAndProject on the ROUNDED distance with vec_id
    tie-break."""
    from ..functions.vectors import as_double

    emb = read_fixture(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode(as_double("embedding")).alias("dim", "val")
    )
    cent = ex.groupBy("label", "dim").agg(F.avg("val").alias("cval"))
    dist = (
        ex.join(cent, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sum((F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))),
                6,
            ).alias("sq_dist")
        )
    )
    return dist.orderBy(F.desc("sq_dist"), "vec_id").limit(10)


EMBEDDING_OUTLIERS_ORACLE = """
WITH ex AS (
    SELECT vec_id, label,
           GENERATE_SUBSCRIPTS(CAST(embedding AS DOUBLE[]), 1) - 1 AS dim,
           UNNEST(CAST(embedding AS DOUBLE[])) AS val
    FROM embeddings
), cent AS (
    SELECT label, dim, AVG(val) AS cval FROM ex GROUP BY label, dim
), dist AS (
    SELECT ex.vec_id, ex.label,
           ROUND(SUM((ex.val - cent.cval) * (ex.val - cent.cval)), 6) AS sq_dist
    FROM ex JOIN cent ON ex.label = cent.label AND ex.dim = cent.dim
    GROUP BY ex.vec_id, ex.label
)
SELECT vec_id, label, sq_dist
FROM dist
ORDER BY sq_dist DESC, vec_id
LIMIT 10
"""


def text_bm25_topk(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Okapi BM25 document retrieval — the canonical sparse ranking
    function (Lucene's default): for each of the first three documents
    as queries, the top-5 OTHER documents by
    sum_t qtf·idf(t)·tf(k1+1)/(tf + k1(1-b+b·len/avglen)) with the
    Robertson–Sparck-Jones smoothed idf ln((N-df+0.5)/(df+0.5)+1),
    k1=1.2, b=0.75. Every factor is rational arithmetic over integer
    counts, so the oracle replays the scoring exactly. Same inverted-
    index shape as the TF-IDF tier: posting-list join, query side
    broadcast; corpus stats (N, avg length) ride along as a broadcast
    1-row crossJoin (the unigram_logprob pattern) so query DEFINITION
    stays one lazy plan — no eager collect (round-3 VERDICT item 4,
    pinned by test_bm25_builds_lazily_single_action)."""
    from pyspark.sql import Window

    from ..functions.cache import scoped_persist
    from ..functions.texts import tokens

    docs = read_fixture(spark, sf_dir, "documents")
    tf = scoped_persist(
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # dlen feeds the contrib join AND both stats references below —
    # persisted, those are three scans of a tiny doc-keyed aggregate
    # instead of three recomputed shuffles over tf
    dlen = scoped_persist(tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")))
    stats = dlen.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avg_dl"),
    )
    qtf = (
        tf.filter(F.col("doc_id") < 3)
        .select(F.col("doc_id").alias("query_doc"), "term", F.col("tf").alias("qtf"))
    )
    # idf(t) depends only on t's own document frequency, and the ranking
    # joins idf on the (broadcast) query terms — so the df count only needs
    # tf rows whose term occurs in a query (guide §2.3: shuffle fewer
    # bytes). The semi join cuts the idf aggregate from vocabulary-sized
    # to query-term-sized; surviving terms' df values are unchanged, so
    # scores are bit-identical (oracle-pinned).
    idf = (
        tf.join(F.broadcast(qtf.select("term").distinct()), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "term",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ).alias("idf"),
        )
    )
    return _bm25_rank(tf, dlen, idf, stats, qtf, k)


def _bm25_rank(tf, dlen, idf, stats, qtf, k: int, *, exclude_self: bool = True):
    """Shared BM25 scoring tail: posting-list join bounded by the broadcast
    query terms, contribution sum, per-query top-k. Takes the INDEX tables
    (tf, dlen, idf, 1-row stats) as inputs so the full-rebuild
    (text_bm25_topk), incremental-merge (text_bm25_incremental), and
    known-item-eval (retrieval_known_item_mrr, exclude_self=False) paths
    rank through literally the same plan.

    Join order (round 7): the broadcast qtf join runs FIRST so the big
    posting table is cut to query-term rows before anything doc-keyed
    joins in — at 100 TB the dlen/idf joins then move candidate-sized
    data, not corpus-sized. ``dlen=None`` means tf already carries a
    ``dl`` column (the denormalized-norms artifact layout, Lucene-style)
    and the doc-length join is skipped entirely."""
    from pyspark.sql import Window

    k1, b = _BM25_K1, _BM25_B
    scored = tf.join(F.broadcast(qtf), "term")
    if dlen is not None:
        scored = scored.join(dlen, "doc_id")
    scored = scored.join(idf, "term").crossJoin(
        F.broadcast(stats.select("avg_dl"))
    )
    if exclude_self:
        scored = scored.filter(F.col("doc_id") != F.col("query_doc"))
    contrib = (
        scored
        .select(
            "query_doc",
            "doc_id",
            (
                F.col("qtf")
                * F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avg_dl")))
            ).alias("c"),
        )
    )
    scores = contrib.groupBy("query_doc", "doc_id").agg(
        F.round(F.sum("c"), 4).alias("bm25")
    )
    w = Window.partitionBy("query_doc").orderBy(F.desc("bm25"), "doc_id")
    return (
        scores.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_doc", "rnk", "doc_id", "bm25")
        .orderBy("query_doc", "rnk")
    )


BM25_ORACLE = f"""
WITH tf AS (
    SELECT doc_id, term, COUNT(*) AS tf
    FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents)
    GROUP BY doc_id, term
), dlen AS (
    SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id
), stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avg_dl FROM dlen
), idf AS (
    SELECT term, LN((n_docs - COUNT(*) + 0.5) / (COUNT(*) + 0.5) + 1.0) AS idf
    FROM tf, stats GROUP BY term, n_docs
), qtf AS (
    SELECT doc_id AS query_doc, term, tf AS qtf FROM tf WHERE doc_id < 3
), contrib AS (
    SELECT q.query_doc, tf.doc_id,
           q.qtf * idf.idf * (tf.tf * ({_BM25_K1} + 1))
           / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dlen.dl / stats.avg_dl)) AS c
    FROM tf
    JOIN dlen ON tf.doc_id = dlen.doc_id
    JOIN idf ON tf.term = idf.term
    JOIN qtf q ON tf.term = q.term
    CROSS JOIN stats
    WHERE tf.doc_id <> q.query_doc
), scores AS (
    SELECT query_doc, doc_id, ROUND(SUM(c), 4) AS bm25
    FROM contrib GROUP BY query_doc, doc_id
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_doc
                                 ORDER BY bm25 DESC, doc_id) AS rnk
    FROM scores
)
SELECT query_doc, CAST(rnk AS INT) AS rnk, doc_id, bm25
FROM ranked
WHERE rnk <= 5
ORDER BY query_doc, rnk
"""


def text_bm25_incremental(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    *,
    compact_ratio: float | None = None,
) -> DataFrame:
    """Incremental BM25 index maintenance (r4 VERDICT item 7) — the serving
    path when index build is the linear floor (the 256x scale-lab finding):
    the corpus head (doc_id % 10 != 0) is indexed once and PERSISTED as
    parquet posting tables (tf / dlen / per-term df / 1-row count+length
    partials — exactly what writers.py would keep warm under a table
    format); a delta batch (doc_id % 10 == 0) is then indexed ALONE and
    folded in WITHOUT touching the base documents again:

    - tf / dlen merge by append (doc ids are disjoint — per-doc state is
      naturally append-only),
    - df merges by summing per-batch partial counts,
    - N and avg_dl derive from summed (n_docs, total_dl) partials,
    - idf recomputes from the merged df — a |vocab|-sized table, not a
      corpus scan.

    Every merged INDEX statistic (tf, dl, df, N, total length) is an
    exact integer sum, so the merged index is BIT-IDENTICAL to a full
    rebuild — asserted by the full-rebuild oracle and
    test_bm25_incremental_equals_rebuild. The final score sum itself is a
    double reduction over the ≤|query terms| per-term contributions
    (identical inputs either way); its rounding margin is ~1e10x the ulp
    noise of a 50-term sum (the triage rule in docs/ROUND5.md), the same
    envelope text_bm25_topk has carried driver-green since r4. Ranking
    runs through _bm25_rank, literally the same plan as text_bm25_topk.

    Artifact v2 (round 7 — VERDICT r6 item 2 / SCALE.md finding 2). The
    v1 artifact was 4 unbucketed parquet dirs, and serving re-scanned the
    WHOLE merged tf (the measured +1.5 s fixed offset at 64×). v2:

    - ``tf`` is hive-partitioned by ``term_bucket = abs(xxhash64(term)) %
      16`` and sorted by term within partitions, and each posting row
      carries its doc's length ``dl`` (Lucene-norms-style
      denormalization) — the doc-length join vanishes from the serve
      path. Serving collects the query docs' DISTINCT terms (bounded:
      3 docs' vocabulary — a query payload, not data) and reads only the
      buckets/row-groups holding them: ``term_bucket IN (...)`` prunes
      directories, ``term IN (...)`` prunes row groups via parquet
      min/max on the sorted term column (both visible in the scan node —
      test_bm25_v2_serve_scan_prunes).
    - ``df`` + the (n_docs, tot_dl) partials share ONE union-schema
      ``side`` table with a ``tbl`` discriminator.
    - a doc-sorted FORWARD index (``fwd``) rides beside the inverted
      file: query-side term counts read via doc_id row-group pruning
      instead of a corpus text scan or a full posting scan (the
      inverted layout spans all docs in every file, so it cannot prune
      on doc_id) — the classic inverted+forward index pair.
    - the term/bucket scan filters are COST-GATED (_BM25_PRUNE_MAX_SEL):
      Σ df[qterms] / Σ df, computed from the persisted df table, is
      exactly the fraction of posting rows the filters would keep;
      unselective queries skip the per-row INSET (measured +2 s at 64×
      when forced) and rely on the broadcast qtf join.
    - the artifact is keyed by functions/artifacts.content_fingerprint
      (every part file's name/size/mtime — correct for single-file AND
      directory-layout sources, the r6 ADVICE gap) and stale siblings
      are TTL-swept on build.

    Scale shape: incremental cost is O(delta tokens) + O(vocab-touched),
    paid ONCE per delta version — the delta index is itself published as
    a fingerprint-keyed sibling artifact (tf/fwd/side, late r7), so the
    base corpus text is read zero times once the artifacts exist and
    repeated serving runs pay ONLY pruned artifact reads + the rank plan
    (the property tools/scale_lab.py's ``bm25_incremental`` probe
    measures). This is production index versioning: "serve the
    incremental index" reads the published delta segment rather than
    re-deriving it per query.

    Segment merge-on-read (late r7, second cut): the delta segment is
    written in the SAME term-bucketed + term-sorted layout as the base —
    a Lucene-style multi-segment layout. The unpartitioned side tables
    merge into ONE multi-path FileScan; the hive-partitioned tf segments
    cannot share a root (Spark's CONFLICTING_DIRECTORY_STRUCTURES rule)
    and stay a two-scan union, with the term_bucket directory prune now
    applying to BOTH segments (the unbucketed v1 delta could not take
    it). Resolved readers, query-doc forward rows, and the 2-row stats
    partials are cached per corpus fingerprint
    (functions/artifacts.meta_cache / cached_readers), so a warm serve
    is the rank plan plus nothing.

    Minor compaction (round 8 — VERDICT r7 item 3): production segment
    architectures fold deltas back into the base before the segment list
    grows serve cost. When ``compact_ratio`` is set and the delta/base
    on-disk size ratio exceeds it, the delta segment is folded into a new
    base-layout artifact (``/tmp/bm25_compact_*``) built FROM THE
    PUBLISHED SEGMENTS ONLY — the corpus text is never re-read: tf and
    fwd append (doc ids are disjoint), per-term df partials and the
    (n_docs, tot_dl) stats partials sum. Every merged statistic is an
    exact integer sum, so serving from the compacted artifact is
    bit-identical to the two-segment serve and to a full rebuild
    (test_bm25_compaction_equals_segments pins all three). The default
    ``compact_ratio=None`` keeps the two-segment merge-on-read serve —
    the fixture delta is a fixed ~10% of the corpus, so a production
    trigger near 0.5 would never fire here; the lifecycle is exercised
    by forcing the ratio in tests / the scale lab and by the
    ``text_bm25_compacted`` registry entry."""
    import os

    from ..functions.artifacts import (
        artifact_path,
        backfill_empty_partitioned,
        cached_readers,
        content_fingerprints,
        dir_bytes,
        ensure_published_version,
        meta_cache,
        publish_atomic,
        staging_dir,
        sweep_stale,
    )
    from ..functions.cache import scoped_persist
    from ..functions.texts import tokens

    N_TERM_BUCKETS = 16
    docs = read_fixture(spark, sf_dir, "documents")

    def term_bucket(col):
        # pmod, not abs-%: JVM abs(Long.MIN_VALUE) stays negative, so an
        # abs-based bucket could (p ~ 2^-64 per term) land a term in a
        # negative bucket the driver-side qbuckets mapping can never
        # name, silently pruning its postings (ADVICE r7). pmod and
        # Python's % are both non-negative by construction and agree on
        # every signed-64 input, including MIN_VALUE.
        return F.pmod(F.xxhash64(col), F.lit(N_TERM_BUCKETS)).cast("int")

    def batch_index(batch, *, broadcast_dlen: bool):
        # tf is persisted: dl, df, AND stats all derive from it, and the
        # delta's tokenize+explode chain must run ONCE per fold-in, not
        # once per derived table (4x the delta cost — caught by the scale
        # lab's first bm25_incremental run, which came out SLOWER than the
        # full rebuild before this persist).
        tf0 = scoped_persist(
            batch.select("doc_id", F.explode(tokens("text")).alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
        )
        dlen = tf0.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        # denormalize dl onto each posting (Lucene-norms layout). The
        # DELTA's dlen is delta-batch-sized — broadcast it so the serve
        # path's fold-in costs zero shuffles; the one-time BASE build
        # keeps the shuffle join (base dlen is corpus-doc-sized).
        tf = tf0.join(F.broadcast(dlen) if broadcast_dlen else dlen, "doc_id")
        df = tf0.groupBy("term").agg(F.count("*").cast("long").alias("df"))
        stats = dlen.agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("dl").cast("long").alias("tot_dl"),
        )
        return tf0, tf, df, stats

    def side_union(df_part, stats_part):
        # one union-schema side table: tbl='df' rows carry (term, df),
        # tbl='stats' carries the 1-row (n_docs, tot_dl) partials
        a = df_part.select(
            F.lit("df").alias("tbl"),
            "term",
            "df",
            F.lit(None).cast("long").alias("n_docs"),
            F.lit(None).cast("long").alias("tot_dl"),
        )
        b = stats_part.select(
            F.lit("stats").alias("tbl"),
            F.lit(None).cast("string").alias("term"),
            F.lit(None).cast("long").alias("df"),
            "n_docs",
            "tot_dl",
        )
        return a.unionByName(b)

    is_delta = F.col("doc_id") % 10 == 0
    src = f"{sf_dir}/documents.parquet"

    def build_segment(final_dir, prefix, batch_filter, *, broadcast_dlen, fwd_parts):
        # ONE implementation for both segments (the base index and the
        # per-version delta): TTL-evict superseded/orphaned siblings (the
        # CURRENT key is kept regardless of age — still derivable from
        # the source), stage, write the three tables, publish atomically.
        sweep_stale(prefix, keep={os.path.basename(final_dir)})
        staging = staging_dir(final_dir)
        tf0, tf, df_part, stats_part = batch_index(
            docs.filter(batch_filter), broadcast_dlen=broadcast_dlen
        )
        bucketed = tf.withColumn("term_bucket", term_bucket(F.col("term")))
        (
            bucketed.repartition("term_bucket")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(f"{staging}/tf")
        )
        # a zero-row batch (possible for the delta) emits NO part files
        # under partitionBy — land the schema-bearing empty file so the
        # published segment stays readable (review finding, late r7)
        backfill_empty_partitioned(spark, bucketed.schema, f"{staging}/tf")
        # FORWARD index companion (doc-sorted): serving needs the QUERY
        # docs' own term counts, and the inverted layout above cannot
        # row-group-prune on doc_id (every term-sorted file spans all
        # docs). Range-partitioned + sorted by doc_id, a doc_id predicate
        # prunes to ~one row group — the classic inverted+forward pair.
        (
            tf0.repartitionByRange(fwd_parts, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(f"{staging}/fwd")
        )
        backfill_empty_partitioned(spark, tf0.schema, f"{staging}/fwd")
        side_union(df_part, stats_part).write.mode("overwrite").parquet(
            f"{staging}/side"
        )
        open(f"{staging}/_OK", "w").close()
        publish_atomic(staging, final_dir)

    # one inventory walk derives all three segment keys (the per-salt
    # walks were 3x redundant stat I/O per serve — review finding, r8);
    # artifact_path keeps the dirs under the SAME root sweep_stale lists
    keys = content_fingerprints(
        src, salts=("bm25idx-v3", "bm25delta-v3", "bm25compact-v3")
    )
    key = keys["bm25idx-v3"]
    base_dir = artifact_path("bm25_index_", key)
    base_ver = ensure_published_version(
        base_dir,
        lambda: build_segment(
            base_dir, "bm25_index_", ~is_delta, broadcast_dlen=False, fwd_parts=8
        ),
    )
    # From here on the BASE exists only as its persisted index artifact.
    # The DELTA index is persisted the same way (late r7): fold-in
    # tokenization is paid ONCE PER DELTA VERSION and published as a
    # sibling artifact — production index versioning, where "serve the
    # incremental index" means reading the published delta segment, not
    # re-deriving it per query. Written in the SAME term-bucketed layout
    # as the base so the serve-side prunes apply to both segments
    # (own salt: the delta segment format versions independently of the
    # base artifact, and bumping it must orphan only delta dirs).
    delta_dir = artifact_path("bm25_delta_", keys["bm25delta-v3"])
    delta_ver = ensure_published_version(
        delta_dir,
        lambda: build_segment(
            delta_dir, "bm25_delta_", is_delta, broadcast_dlen=True, fwd_parts=2
        ),
    )

    def build_compacted(comp_dir: str) -> None:
        # Minor compaction: fold the delta segment into a new base-layout
        # artifact FROM THE PUBLISHED SEGMENTS ONLY — zero corpus reads.
        # tf/fwd append (doc ids disjoint); per-term df and the stats
        # partials merge by exact integer sums, so the compacted index is
        # bit-identical to the two-segment view at every statistic.
        sweep_stale("bm25_compact_", keep={os.path.basename(comp_dir)})
        staging = staging_dir(comp_dir)
        tf_all = spark.read.parquet(f"{base_dir}/tf").unionByName(
            spark.read.parquet(f"{delta_dir}/tf")
        )
        (
            tf_all.repartition("term_bucket")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(f"{staging}/tf")
        )
        backfill_empty_partitioned(spark, tf_all.schema, f"{staging}/tf")
        fwd_all = spark.read.parquet(f"{base_dir}/fwd", f"{delta_dir}/fwd")
        (
            fwd_all.repartitionByRange(8, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(f"{staging}/fwd")
        )
        backfill_empty_partitioned(spark, fwd_all.schema, f"{staging}/fwd")
        side_all = spark.read.parquet(f"{base_dir}/side", f"{delta_dir}/side")
        df_m = (
            side_all.filter(F.col("tbl") == "df")
            .groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"))
        )
        stats_m = side_all.filter(F.col("tbl") == "stats").agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("tot_dl").cast("long").alias("tot_dl"),
        )
        side_union(df_m, stats_m).write.mode("overwrite").parquet(f"{staging}/side")
        open(f"{staging}/_OK", "w").close()
        publish_atomic(staging, comp_dir)

    # Compaction trigger: driver-side segment-size metadata only (a table
    # format reads the same numbers from its manifests).
    segs = [(base_dir, base_ver), (delta_dir, delta_ver)]
    if compact_ratio is not None and dir_bytes(delta_dir) > compact_ratio * dir_bytes(
        base_dir
    ):
        comp_dir = artifact_path("bm25_compact_", keys["bm25compact-v3"])
        comp_ver = ensure_published_version(
            comp_dir, lambda: build_compacted(comp_dir)
        )
        segs = [(comp_dir, comp_ver)]
    seg_dirs = [d for d, _ in segs]
    seg_vers = tuple(v for _, v in segs)

    # Query side first: the query docs' term counts come from the FORWARD
    # indexes (doc_id < 3 prunes to ~one row group — never a corpus text
    # scan) and are COLLECTED — bounded by 3 docs' vocabulary, a query
    # payload, not data. Both immutable parts are served from the
    # metadata cache after the first call (keyed per segment-set MODE —
    # two-segment vs compacted — so mode flips never serve a stale file
    # index). Rebuilt as a local relation so the ranking plan broadcasts
    # it without re-running any scan, and the distinct terms drive the
    # posting-scan prune from the same job.
    meta = meta_cache(
        _BM25_META_CACHE,
        f"{key}|{len(segs)}",
        spark,
        max_entries=_BM25_META_CACHE_MAX,
    )
    if "q_rows" not in meta:
        meta["q_rows"] = [
            (r["doc_id"], r["term"], r["tf"])
            for d in seg_dirs
            for r in spark.read.parquet(f"{d}/fwd")
            .filter(F.col("doc_id") < 3)
            .collect()
        ]
    q_rows = meta["q_rows"]
    qtf = spark.createDataFrame(q_rows, "query_doc long, term string, qtf long")
    qterms = sorted({t for _, t, _ in q_rows})
    # Python % mirrors Spark's pmod bit-for-bit on signed-64 inputs (both
    # non-negative by construction — ADVICE r7; _xxhash64_py is the
    # test-pinned Spark xxhash64 replica)
    qbuckets = sorted({_xxhash64_py(t) % N_TERM_BUCKETS for t in qterms})

    # Segment merge-on-read: all segments share the artifact layout. The
    # unpartitioned side tables merge into ONE multi-path scan; the
    # hive-partitioned tf segments cannot (Spark requires a single
    # partition-table root — CONFLICTING_DIRECTORY_STRUCTURES), so tf
    # stays a per-segment-scan union, with every prune below applied
    # uniformly to all segments. After compaction the list is one
    # segment and the union disappears from the plan.
    def _resolve_readers():
        tf_r = spark.read.parquet(f"{seg_dirs[0]}/tf")
        for d in seg_dirs[1:]:
            tf_r = tf_r.unionByName(spark.read.parquet(f"{d}/tf"))
        return (
            spark.read.parquet(*[f"{d}/side" for d in seg_dirs]),
            tf_r,
        )

    side, tf_seg = cached_readers(meta, spark, seg_vers, _resolve_readers)
    all_df = side.filter(F.col("tbl") == "df").select("term", "df")

    # The (n_docs, tot_dl) partials are two tiny rows of the immutable
    # artifact: fold them ONCE per key into driver scalars (exact integer
    # sums, null partials from an empty segment skipped like F.sum does)
    # instead of re-scanning + cross-joining the side table on every serve.
    if "stats" not in meta:
        srows = side.filter(F.col("tbl") == "stats").collect()
        meta["stats"] = (
            sum(r["n_docs"] or 0 for r in srows),
            sum(r["tot_dl"] or 0 for r in srows),
        )
    n_docs_tot, tot_dl_tot = meta["stats"]

    # Cost-based prune decision: Σ df over the query terms / Σ df over
    # the vocabulary is EXACTLY the fraction of merged posting rows the
    # scan filters would keep (one vocab-sized aggregate over the
    # per-segment df partials — cheap at any corpus). Prune only when
    # selective; otherwise the per-row term INSET is pure overhead and
    # the broadcast qtf join in _bm25_rank already bounds what flows
    # downstream.
    prune = len(qterms) <= 5000
    if prune:
        sel_key = ("sel", hash(tuple(qterms)))
        if sel_key not in meta:
            sel = all_df.agg(
                F.sum(
                    F.when(F.col("term").isin(qterms), F.col("df")).otherwise(0)
                ).alias("q"),
                F.sum("df").alias("t"),
            ).first()
            # cache the RATIO (artifact-derived fact); the threshold is
            # applied per call so tuning it never serves a stale decision
            meta[sel_key] = (sel["q"] / sel["t"]) if sel["t"] else 1.0
        prune = meta[sel_key] <= _BM25_PRUNE_MAX_SEL

    tf_scan = tf_seg
    if prune:
        # the serve-side prune: directory-level on term_bucket (both
        # segments — the v1 unbucketed delta could not take this), then
        # row-group min/max on the sorted term column; Catalyst pushes
        # the filter through the union onto both segment scans
        tf_scan = tf_scan.filter(
            F.col("term_bucket").isin(qbuckets) & F.col("term").isin(qterms)
        )
    tf = tf_scan.select("doc_id", "term", "tf", "dl")

    df = all_df.groupBy("term").agg(F.sum("df").cast("long").alias("df"))
    # same arithmetic the old 1-row aggregate ran — each long CAST to
    # double FIRST, then the double division (int/int true division would
    # round once instead of twice and drift an ulp past 2^53), so avg_dl
    # is bit-identical to the rebuild oracle's; an empty corpus yields 0.0
    # over an empty tf (the old SQL gave null over zero rows — no rows
    # score either way)
    n_docs_dbl = float(n_docs_tot)
    avg_dl = float(tot_dl_tot) / n_docs_dbl if n_docs_tot else 0.0
    stats = spark.createDataFrame(
        [(n_docs_dbl, avg_dl)], "n_docs double, avg_dl double"
    )
    if prune:
        # Catalyst propagates this INSET across the equi-join onto every
        # other term-keyed child (including the artifact scan), so it
        # must sit under the SAME cost gate as the scan filters — an
        # unconditional filter here re-introduces the per-row INSET the
        # gate exists to avoid.
        df = df.filter(F.col("term").isin(qterms))  # only query terms score
    idf = df.select(
        "term",
        F.log(
            (F.lit(n_docs_dbl) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ).alias("idf"),
    )
    if prune:
        # bounded by |qterms| — broadcastable at any corpus size; on the
        # fallback path idf stays vocab-sized (AQE still broadcasts it at
        # runtime when it turns out small)
        idf = idf.hint("broadcast")
    return _bm25_rank(tf, None, idf, stats, qtf, k)


def text_bm25_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minor-compaction leg of the incremental-index lifecycle (VERDICT r7
    item 3): serve the SAME incremental BM25 ranking after folding the
    delta segment into a new base-layout artifact (``compact_ratio=0.0``
    forces the fold regardless of the delta/base size ratio). The fold
    reads only the published segments — never the corpus — and every
    merged index statistic is an exact integer sum, so this entry's
    driver hash verdict pins compaction ≡ two-segment serve ≡ full
    rebuild. The serve plan reads ONE tf/side/fwd segment set (the
    two-scan union disappears) and scans the corpus text zero times."""
    return text_bm25_incremental(spark, sf_dir, compact_ratio=0.0)


def _xxhash64_py(s: str, seed: int = 42) -> int:
    """Driver-side replica of Spark's ``xxhash64`` for a single UTF-8
    string at the default seed 42 — used to map collected query terms to
    their term buckets without a round-trip through a Spark job. The
    64-bit xxHash spec is public (Collet's xxHash project); Spark's
    XxHash64 expression implements it over the string's UTF-8 bytes.
    Verified equal to ``F.xxhash64`` by test_xxhash64_py_matches_spark."""
    P1 = 0x9E3779B185EBCA87
    P2 = 0xC2B2AE3D27D4EB4F
    P3 = 0x165667B19E3779F9
    P4 = 0x85EBCA77C2B2AE63
    P5 = 0x27D4EB2F165667C5
    M = (1 << 64) - 1

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    data = s.encode("utf-8")
    n = len(data)
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        i = 0
        while i <= n - 32:
            for off, v in ((0, 1), (8, 2), (16, 3), (24, 4)):
                lane = int.from_bytes(data[i + off : i + off + 8], "little")
                if v == 1:
                    v1 = (rotl((v1 + lane * P2) & M, 31) * P1) & M
                elif v == 2:
                    v2 = (rotl((v2 + lane * P2) & M, 31) * P1) & M
                elif v == 3:
                    v3 = (rotl((v3 + lane * P2) & M, 31) * P1) & M
                else:
                    v4 = (rotl((v4 + lane * P2) & M, 31) * P1) & M
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((rotl((v * P2) & M, 31) * P1) & M)) * P1 + P4) & M
    else:
        h = (seed + P5) & M
        i = 0
    h = (h + n) & M
    while i <= n - 8:
        lane = int.from_bytes(data[i : i + 8], "little")
        h = ((rotl(h ^ ((rotl((lane * P2) & M, 31) * P1) & M), 27) * P1) + P4) & M
        i += 8
    if i <= n - 4:
        lane = int.from_bytes(data[i : i + 4], "little")
        h = ((rotl(h ^ ((lane * P1) & M), 23) * P2) + P3) & M
        i += 4
    while i < n:
        h = (rotl(h ^ ((data[i] * P5) & M), 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    # Spark's xxhash64 returns a SIGNED long
    return h - (1 << 64) if h >= (1 << 63) else h


def mixture_token_budget_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture planning by TOKEN budget — the per-source companion to
    ml.mixture_temperature_weights (which weights LANGUAGES by doc count):
    per source,
    raw document and token counts, then the temperature-adjusted sampling
    probability p_i ∝ tokens_i^α (α=0.3, the standard upsample-the-tail
    exponent) and the expected epochs each source sustains under a fixed
    1M-token sampling budget (epochs > 1 ⇒ the source repeats; the
    overfit-risk signal). Token counts are exact integer sums; the α-powers
    are snapped to a 1e-9 grid and totaled in DECIMAL so the normalizer is
    order-independent (functions/money.py rationale); each probability is
    then one identical IEEE division chain in both engines.

    Scale shape: one scan → |sources| rows; the normalizer is a 1-row
    broadcast crossJoin. At 100 TB the per-source token census is the only
    data-sized aggregation, and it is partial-aggregated."""
    from ..functions.texts import token_count

    docs = read_fixture(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(token_count("text")).cast("long").alias("n_tokens"),
    )
    w = F.round(F.pow(F.col("n_tokens").cast("double"), 0.3), 9).cast("decimal(38,9)")
    weighted = per_src.withColumn("w", w)
    tot = weighted.agg(F.sum("w").alias("tot"))
    p = F.col("w").cast("double") / F.col("tot").cast("double")
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(p, 6).alias("sample_prob"),
            F.round(p * 1000000 / F.col("n_tokens"), 4).alias("expected_epochs"),
        )
        .orderBy("source")
    )


MIXTURE_EPOCHS_ORACLE = """
WITH per_src AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY source
), weighted AS (
    SELECT *,
           CAST(ROUND(POWER(CAST(n_tokens AS DOUBLE), 0.3), 9) AS DECIMAL(38,9)) AS w
    FROM per_src
), tot AS (
    SELECT SUM(w) AS tot FROM weighted
)
SELECT source, n_docs, n_tokens,
       ROUND(CAST(w AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS sample_prob,
       ROUND(CAST(w AS DOUBLE) / CAST(tot AS DOUBLE) * 1000000 / n_tokens, 4)
           AS expected_epochs
FROM weighted, tot
ORDER BY source
"""


def curriculum_quality_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum scheduling by data quality — split the corpus into three
    training phases at the exact quality-score tertiles (phase 1 = the
    highest-quality third trains first), reporting each phase's document
    count, token budget, and score range. Window-free at scale: the
    per-doc score is a pure JVM expression, the tertile thresholds are ONE
    exact-percentile aggregate broadcast back over the scan (the
    RFM-segmentation shape), never a global ntile sort. Per-doc scores sit
    on the 1e-4 grid, so the per-phase mean is an exact decimal sum.
    """
    from ..functions.cache import scoped_persist
    from ..operators.text import quality_score_per_doc

    # scored feeds the tertile aggregate AND the phase rollup — persist
    # or the tokenize+score scan runs twice (review finding, round 5)
    scored = scoped_persist(
        quality_score_per_doc(read_fixture(spark, sf_dir, "documents"))
    )
    th = scored.agg(
        F.percentile("quality_score", F.lit([1.0 / 3.0, 2.0 / 3.0])).alias("t")
    ).select(F.element_at("t", 1).alias("t1"), F.element_at("t", 2).alias("t2"))
    phase = (
        F.when(F.col("quality_score") > F.col("t2"), "1_high")
        .when(F.col("quality_score") > F.col("t1"), "2_mid")
        .otherwise("3_low")
    )
    return (
        scored.crossJoin(F.broadcast(th))
        .groupBy(phase.alias("phase"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("token_budget"),
            F.round(
                F.sum(F.col("quality_score").cast("decimal(28,4)")).cast("double")
                / F.count("quality_score"),
                4,
            ).alias("mean_score"),
            F.min("quality_score").alias("min_score"),
            F.max("quality_score").alias("max_score"),
        )
        .orderBy("phase")
    )


CURRICULUM_ORACLE = """
WITH feats AS (
    SELECT doc_id,
           LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
           (LENGTH(text) - (LEN(STRING_SPLIT(text, ' ')) - 1))
               / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) AS awl,
           LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
               t -> t IN ('the','a','of','and','to','in','is','on','for','with')))
               / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) AS stop_ratio
    FROM documents
), scored AS (
    SELECT doc_id, n_tokens,
           ROUND(LEAST(n_tokens / 100.0, 1.0) * 0.5
                 + LEAST(stop_ratio * 5, 1.0) * 0.3
                 + CASE WHEN awl >= 3 AND awl <= 8 THEN 0.2 ELSE 0.0 END,
                 4) AS quality_score
    FROM feats
), th AS (
    SELECT QUANTILE_CONT(quality_score, 1.0/3.0) AS t1,
           QUANTILE_CONT(quality_score, 2.0/3.0) AS t2
    FROM scored
)
SELECT CASE WHEN quality_score > t2 THEN '1_high'
            WHEN quality_score > t1 THEN '2_mid'
            ELSE '3_low' END AS phase,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS token_budget,
       ROUND(CAST(SUM(CAST(quality_score AS DECIMAL(28,4))) AS DOUBLE)
             / COUNT(quality_score), 4) AS mean_score,
       MIN(quality_score) AS min_score,
       MAX(quality_score) AS max_score
FROM scored, th
GROUP BY 1
ORDER BY 1
"""


def retrieval_known_item_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation: known-item search MRR. Each of the
    first ten documents issues its own 30-token PREFIX as the query (the
    title-query simulation), the full corpus is ranked by BM25 with the
    query document left IN the candidate set, and the metric is the rank
    at which the document retrieves ITSELF — self_rank 1 and reciprocal
    rank 1.0 mean the index is lossless for known-item lookup; deeper
    ranks quantify how much the prefix under-specifies the document. The
    eval harness that should accompany any retrieval serving tier
    (pairs with sim_ann_recall_ivf / sim_dim_truncation_recall on the
    dense side).

    Reuses the exact text_bm25_topk index tables and the shared _bm25_rank
    scoring tail (exclude_self=False) — the eval measures the REAL serving
    plan, not a simplified replica. Rank ties break on doc_id in both
    engines."""
    from ..functions.cache import scoped_persist
    from ..functions.texts import tokens

    docs = read_fixture(spark, sf_dir, "documents")
    tf = scoped_persist(
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dlen = scoped_persist(tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")))
    stats = dlen.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avg_dl"),
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "term",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ).alias("idf"),
        )
    )
    qtf = (
        docs.filter(F.col("doc_id") < 10)
        .select(
            F.col("doc_id").alias("query_doc"),
            F.explode(F.slice(tokens("text"), 1, 30)).alias("term"),
        )
        .groupBy("query_doc", "term")
        .agg(F.count("*").alias("qtf"))
    )
    ranked = _bm25_rank(tf, dlen, idf, stats, qtf, k=1 << 30, exclude_self=False)
    return (
        ranked.filter(F.col("doc_id") == F.col("query_doc"))
        .select(
            "query_doc",
            F.col("rnk").cast("long").alias("self_rank"),
            F.round(F.lit(1.0) / F.col("rnk"), 6).alias("reciprocal_rank"),
        )
        .orderBy("query_doc")
    )


KNOWN_ITEM_MRR_ORACLE = f"""
WITH tf AS (
    SELECT doc_id, term, COUNT(*) AS tf
    FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents)
    GROUP BY doc_id, term
), dlen AS (
    SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id
), stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avg_dl FROM dlen
), idf AS (
    SELECT term, LN((n_docs - COUNT(*) + 0.5) / (COUNT(*) + 0.5) + 1.0) AS idf
    FROM tf, stats GROUP BY term, n_docs
), qtf AS (
    SELECT doc_id AS query_doc, term, COUNT(*) AS qtf
    FROM (SELECT doc_id, UNNEST(LIST_SLICE(STRING_SPLIT(text, ' '), 1, 30)) AS term
          FROM documents WHERE doc_id < 10)
    GROUP BY doc_id, term
), contrib AS (
    SELECT q.query_doc, tf.doc_id,
           q.qtf * idf.idf * (tf.tf * ({_BM25_K1} + 1))
           / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dlen.dl / stats.avg_dl)) AS c
    FROM tf
    JOIN dlen ON tf.doc_id = dlen.doc_id
    JOIN idf ON tf.term = idf.term
    JOIN qtf q ON tf.term = q.term
    CROSS JOIN stats
), scores AS (
    SELECT query_doc, doc_id, ROUND(SUM(c), 4) AS bm25
    FROM contrib GROUP BY query_doc, doc_id
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_doc
                                 ORDER BY bm25 DESC, doc_id) AS rnk
    FROM scores
)
SELECT query_doc,
       CAST(rnk AS BIGINT) AS self_rank,
       ROUND(CAST(1.0 AS DOUBLE) / rnk, 6) AS reciprocal_rank
FROM ranked
WHERE doc_id = query_doc
ORDER BY query_doc
"""


def pii_detect_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over the corpus — the compliance pass every
    training-data pipeline runs before release. The synthetic fixture text
    contains no organic PII (verified: zero digits corpus-wide), so the
    query PLANTS deterministic needles first — an email on every 7th doc,
    a phone number on every 11th (the decontamination tier's
    construct-the-eval-from-the-corpus pattern) — then runs the real
    machinery: regex detection (`regexp_count`), redaction
    (`regexp_replace` → '[EMAIL]'/'[PHONE]'), and a ROUND-TRIP assertion
    that zero matches survive redaction (`clean` must be TRUE on every
    row, which the oracle also demands). Patterns stay in the
    RE2 ∩ java.util.regex common subset so both engines match identically.

    Per source: docs carrying each PII class, total matches, characters
    removed by redaction, and the post-redaction cleanliness flag.

    Scale shape: one scan, all-JVM regex (no Python), |sources| output
    rows; at 100 TB this is scan-bound with partial aggregation — exactly
    the cost profile of a real PII sweep."""
    docs = read_fixture(spark, sf_dir, "documents")
    email = F.concat(
        F.lit("contact"), F.col("doc_id").cast("string"), F.lit("@example.com")
    )
    phone = F.lit("555-0142")
    seeded_text = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.lit(" "), email)).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % 11 == 0, F.concat(F.lit(" call "), phone)).otherwise(
            F.lit("")
        ),
    )
    email_re = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    phone_re = "[0-9]{3}-[0-9]{4}"
    seeded = docs.select("doc_id", "source", seeded_text.alias("t"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("t"), email_re, "[EMAIL]"), phone_re, "[PHONE]"
    )
    scanned = seeded.select(
        "source",
        F.regexp_count(F.col("t"), F.lit(email_re)).alias("n_email"),
        F.regexp_count(F.col("t"), F.lit(phone_re)).alias("n_phone"),
        (F.length("t") - F.length(redacted)).alias("chars_removed"),
        (
            (F.regexp_count(redacted, F.lit(email_re)) == 0)
            & (F.regexp_count(redacted, F.lit(phone_re)) == 0)
        ).alias("clean"),
    )
    return (
        scanned.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum((F.col("n_email") > 0).cast("long")).alias("docs_with_email"),
            F.sum((F.col("n_phone") > 0).cast("long")).alias("docs_with_phone"),
            F.sum("n_email").cast("long").alias("total_emails"),
            F.sum("n_phone").cast("long").alias("total_phones"),
            F.sum("chars_removed").cast("long").alias("chars_removed"),
            F.min("clean").alias("all_clean"),
        )
        .orderBy("source")
    )


PII_ORACLE = r"""
WITH seeded AS (
    SELECT doc_id, source,
           text
           || CASE WHEN doc_id % 7 = 0
                   THEN ' contact' || CAST(doc_id AS VARCHAR) || '@example.com'
                   ELSE '' END
           || CASE WHEN doc_id % 11 = 0 THEN ' call 555-0142' ELSE '' END AS t
    FROM documents
), redacted AS (
    SELECT source, t,
           REGEXP_REPLACE(
               REGEXP_REPLACE(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                              '[EMAIL]', 'g'),
               '[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS r
    FROM seeded
), scanned AS (
    SELECT source,
           LEN(REGEXP_EXTRACT_ALL(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS n_email,
           LEN(REGEXP_EXTRACT_ALL(t, '[0-9]{3}-[0-9]{4}')) AS n_phone,
           LENGTH(t) - LENGTH(r) AS chars_removed,
           LEN(REGEXP_EXTRACT_ALL(r, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) = 0
           AND LEN(REGEXP_EXTRACT_ALL(r, '[0-9]{3}-[0-9]{4}')) = 0 AS clean
    FROM redacted
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
       CAST(SUM(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
       CAST(SUM(n_email) AS BIGINT) AS total_emails,
       CAST(SUM(n_phone) AS BIGINT) AS total_phones,
       CAST(SUM(chars_removed) AS BIGINT) AS chars_removed,
       MIN(clean) AS all_clean
FROM scanned
GROUP BY source
ORDER BY source
"""


def quality_repetition_topgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style repetition filter: per document, the share
    of tokens covered by its single most frequent BIGRAM (top-2-gram
    fraction — 2·max_count/n_tokens); per source, the mean share and how
    many documents exceed the 0.1 repetition threshold a pretraining
    filter would drop. High values flag boilerplate/keyword-stuffing that
    per-token stats miss.

    Scale shape: explode to (doc, bigram) pairs → two partial-aggregated
    reductions (pair counts, then per-doc max) — the shuffles carry
    distinct bigrams per doc, not tokens; the report is |sources| rows.
    Shares land on an exact rational grid and are quantized before the
    decimal mean (functions/money.py rationale)."""
    from ..functions.money import quantized
    from ..functions.texts import tokens, word_shingles

    docs = read_fixture(spark, sf_dir, "documents")
    toks = tokens("text")
    pairs = docs.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tokens"),
        F.explode(word_shingles(toks, 2)).alias("bigram"),
    )
    per_doc = (
        pairs.groupBy("doc_id", "source", "n_tokens", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id", "source", "n_tokens")
        .agg(F.max("c").alias("max_c"))
        .select(
            "doc_id",
            "source",
            (F.lit(2.0) * F.col("max_c") / F.col("n_tokens")).alias("share"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(
                F.sum(quantized("share", 9)).cast("double") / F.count("share"), 6
            ).alias("mean_top2gram_share"),
            F.sum((F.col("share") > 0.1).cast("long")).alias("n_flagged"),
        )
        .orderBy("source")
    )


REPETITION_ORACLE = """
WITH toks AS (
    SELECT doc_id, source,
           STRING_SPLIT(text, ' ') AS ts,
           LEN(STRING_SPLIT(text, ' ')) AS n_tokens
    FROM documents
), bigrams AS (
    SELECT doc_id, source, n_tokens,
           ts[i] || ' ' || ts[i + 1] AS bigram
    FROM toks, UNNEST(GENERATE_SERIES(1, n_tokens - 1)) AS g(i)
), per_doc AS (
    SELECT doc_id, source, n_tokens, MAX(c) AS max_c
    FROM (SELECT doc_id, source, n_tokens, bigram, COUNT(*) AS c
          FROM bigrams GROUP BY 1, 2, 3, 4)
    GROUP BY 1, 2, 3
), shares AS (
    SELECT source, CAST(2.0 AS DOUBLE) * max_c / n_tokens AS share FROM per_doc
)
SELECT source,
       COUNT(*) AS n_docs,
       ROUND(CAST(SUM(CAST(ROUND(share, 9) AS DECIMAL(28,9))) AS DOUBLE)
             / COUNT(share), 6) AS mean_top2gram_share,
       CAST(SUM(CASE WHEN share > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM shares
GROUP BY source
ORDER BY source
"""


def drift_js_tokens(spark: SparkSession, sf_dir: str, vocab_k: int = 200) -> DataFrame:
    """Jensen-Shannon divergence of each source's TOKEN distribution from
    the corpus distribution — the distributional-drift completion next to
    drift_psi_length (binned lengths) and drift_ks_length (length CDF):
    PSI/KS see document SHAPE drift, JS sees content drift. Distributions
    live on the deterministic top-200 corpus vocabulary (count-desc,
    term-asc tie-break) with add-one smoothing, so JS is finite and both
    engines evaluate the identical closed form; per-term contributions are
    quantized to a 1e-12 grid and summed in decimal (functions/money.py),
    making the 200-term reduction order-independent outright.

    Scale shape: one explode → (source, term) partial-aggregated counts
    restricted by a broadcast vocab semi join; the (source x vocab)
    densification grid is |sources|·K rows via a broadcast nested-loop
    cross (both sides tiny by construction — never a data-sized
    CartesianProduct); everything downstream is K-row-per-source math."""
    from ..functions.money import quantized
    from ..functions.texts import tokens

    from ..functions.cache import scoped_persist

    docs = read_fixture(spark, sf_dir, "documents")
    # tok feeds the corpus census AND the per-source counts — persist or
    # the explode runs twice (review finding, round 5)
    tok = scoped_persist(
        docs.select("source", F.explode(tokens("text")).alias("term"))
    )
    corpus = tok.groupBy("term").agg(F.count("*").alias("c_all"))
    vocab = corpus.orderBy(F.desc("c_all"), "term").limit(vocab_k)
    per_src = (
        tok.join(F.broadcast(vocab.select("term")), "term")
        .groupBy("source", "term")
        .agg(F.count("*").alias("c_s"))
    )
    grid = (
        docs.select("source")
        .distinct()
        .crossJoin(F.broadcast(vocab))
        .join(per_src, ["source", "term"], "left")
        .withColumn("c_s", F.coalesce("c_s", F.lit(0)))
    )
    n_s = Window.partitionBy("source")
    n_all = vocab.agg(F.sum("c_all").cast("double").alias("n_all"))
    k = float(vocab_k)
    with_p = (
        grid.withColumn("n_s", F.sum("c_s").over(n_s).cast("double"))
        .crossJoin(F.broadcast(n_all))
        .withColumn("p", (F.col("c_s") + 1) / (F.col("n_s") + k))
        .withColumn("q", (F.col("c_all") + 1) / (F.col("n_all") + k))
        .withColumn("m", (F.col("p") + F.col("q")) / 2)
    )
    contrib = 0.5 * (F.col("p") * F.log(F.col("p") / F.col("m"))) + 0.5 * (
        F.col("q") * F.log(F.col("q") / F.col("m"))
    )
    return (
        with_p.withColumn("contrib", contrib)
        .groupBy("source")
        .agg(
            F.sum("c_s").cast("long").alias("n_vocab_tokens"),
            F.round(F.sum(quantized("contrib", 12)), 6).cast("double").alias(
                "js_divergence"
            ),
        )
        .orderBy("source")
    )


DRIFT_JS_ORACLE = """
WITH tok AS (
    SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
), corpus AS (
    SELECT term, COUNT(*) AS c_all FROM tok GROUP BY term
), vocab AS (
    SELECT term, c_all FROM corpus ORDER BY c_all DESC, term LIMIT 200
), per_src AS (
    SELECT source, t.term, COUNT(*) AS c_s
    FROM tok t JOIN vocab v ON t.term = v.term
    GROUP BY source, t.term
), grid AS (
    SELECT s.source, v.term, v.c_all, COALESCE(p.c_s, 0) AS c_s
    FROM (SELECT DISTINCT source FROM documents) s
    CROSS JOIN vocab v
    LEFT JOIN per_src p ON p.source = s.source AND p.term = v.term
), with_p AS (
    SELECT source, c_s,
           (c_s + 1) / (SUM(c_s) OVER (PARTITION BY source) + 200.0) AS p,
           (c_all + 1) / ((SELECT CAST(SUM(c_all) AS DOUBLE) FROM vocab) + 200.0) AS q
    FROM grid
), contribs AS (
    SELECT source, c_s,
           0.5 * (p * LN(p / ((p + q) / 2))) + 0.5 * (q * LN(q / ((p + q) / 2)))
               AS contrib
    FROM with_p
)
SELECT source,
       CAST(SUM(c_s) AS BIGINT) AS n_vocab_tokens,
       CAST(ROUND(SUM(CAST(ROUND(contrib, 12) AS DECIMAL(28,12))), 6) AS DOUBLE)
           AS js_divergence
FROM contribs
GROUP BY source
ORDER BY source
"""


def dataset_shard_balance(spark: SparkSession, sf_dir: str, shards: int = 64) -> DataFrame:
    """Training-shard assignment audit: documents hash-assigned to 64
    shards (md5 of doc_id — deterministic, append-stable, the same
    discipline as the split/stratified tier), with the balance report a
    distributed-training job plans around: per-shard doc and token
    counts won't fit one screen, so the output is the 5-number summary
    PLUS the imbalance ratios (max/mean) for docs and tokens and the
    count of shards >10% over mean token load. Straggler shards are THE
    wall-clock killer in data-parallel training; this is the pre-flight
    check. All integer arithmetic over one scan + |shards| rows."""
    from ..functions.cache import scoped_persist
    from ..functions.texts import token_count

    docs = read_fixture(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % shards
    )
    # per_shard feeds the summary, the mean, and the hot-shard count —
    # persisted (64 rows) so the scan runs once
    per_shard = scoped_persist(
        docs.select(shard.alias("shard"), token_count("text").alias("n_tok"))
        .groupBy("shard")
        .agg(F.count("*").alias("docs"), F.sum("n_tok").alias("toks"))
    )
    n = F.count(F.lit(1)).cast("double")
    mean_toks_df = per_shard.agg(
        (F.sum("toks").cast("double") / F.count(F.lit(1))).alias("mean_toks")
    )
    hot = (
        per_shard.crossJoin(F.broadcast(mean_toks_df))
        .agg(
            F.sum(
                (F.col("toks") > F.lit(1.1) * F.col("mean_toks")).cast("long")
            ).alias("n_hot_shards")
        )
    )
    summary = per_shard.agg(
        F.count("*").cast("long").alias("n_shards"),
        F.min("docs").cast("long").alias("min_docs"),
        F.max("docs").cast("long").alias("max_docs"),
        F.min("toks").cast("long").alias("min_tokens"),
        F.max("toks").cast("long").alias("max_tokens"),
        F.round(F.max("docs") / (F.sum("docs").cast("double") / n), 4).alias(
            "doc_imbalance"
        ),
        F.round(F.max("toks") / (F.sum("toks").cast("double") / n), 4).alias(
            "token_imbalance"
        ),
    )
    return summary.crossJoin(F.broadcast(hot))


SHARD_BALANCE_ORACLE = """
WITH per_shard AS (
    SELECT CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 64
               AS shard,
           COUNT(*) AS docs,
           SUM(LEN(STRING_SPLIT(text, ' '))) AS toks
    FROM documents
    GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
       CAST(MIN(docs) AS BIGINT) AS min_docs,
       CAST(MAX(docs) AS BIGINT) AS max_docs,
       CAST(MIN(toks) AS BIGINT) AS min_tokens,
       CAST(MAX(toks) AS BIGINT) AS max_tokens,
       ROUND(MAX(docs) / (CAST(SUM(docs) AS DOUBLE) / COUNT(*)), 4) AS doc_imbalance,
       ROUND(MAX(toks) / (CAST(SUM(toks) AS DOUBLE) / COUNT(*)), 4) AS token_imbalance,
       CAST(SUM(CASE WHEN toks > CAST(1.1 AS DOUBLE)
                                 * (SELECT CAST(SUM(toks) AS DOUBLE) / COUNT(*)
                                    FROM per_shard)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_shards
FROM per_shard
"""


def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language — the budgeting metric multilingual
    pipelines live by: whitespace tokens and BPE-ish regex tokens per
    document, chars-per-token for both tokenizers per language (a language
    whose chars/token is half another's costs twice the context window per
    character of content). Exact integer sums; one scan; |langs| rows."""
    from ..functions.texts import token_count

    docs = read_fixture(spark, sf_dir, "documents")
    bpe = F.size(
        F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]+"), 0)
    )
    per = docs.select(
        "lang",
        F.length("text").alias("chars"),
        token_count("text").alias("ws"),
        bpe.alias("bpe"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("chars").cast("long").alias("n_chars"),
            F.sum("ws").cast("long").alias("ws_tokens"),
            F.sum("bpe").cast("long").alias("bpe_tokens"),
            F.round(F.sum("chars").cast("double") / F.sum("ws"), 4).alias(
                "chars_per_ws_token"
            ),
            F.round(F.sum("chars").cast("double") / F.sum("bpe"), 4).alias(
                "chars_per_bpe_token"
            ),
        )
        .orderBy("lang")
    )


TOKENIZER_FERTILITY_ORACLE = r"""
WITH per AS (
    SELECT lang,
           LENGTH(text) AS chars,
           LEN(STRING_SPLIT(text, ' ')) AS ws,
           LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS bpe
    FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(chars) AS BIGINT) AS n_chars,
       CAST(SUM(ws) AS BIGINT) AS ws_tokens,
       CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
       ROUND(CAST(SUM(chars) AS DOUBLE) / SUM(ws), 4) AS chars_per_ws_token,
       ROUND(CAST(SUM(chars) AS DOUBLE) / SUM(bpe), 4) AS chars_per_bpe_token
FROM per
GROUP BY lang
ORDER BY lang
"""


def audit_provenance_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance audit for a training-data release: per (input file,
    lang), the row count, char volume, and an ORDER-INDEPENDENT content
    checksum — the sum of the md5-prefix integers of `doc_id|text` —
    so two releases can be diffed file-by-file without comparing rows
    (sum is commutative ⇒ partitioning/shuffle order can't change it,
    and any single-row mutation changes it with probability 1-2^-48).
    The file column comes from `input_file_name()` reduced to its
    basename, so the fingerprint travels with the lake layout. One scan,
    one small aggregate."""
    docs = read_fixture(spark, sf_dir, "documents")
    fname = F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1)
    chk = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.col("doc_id"), F.col("text"))), 1, 12),
        16,
        10,
    ).cast("long")
    return (
        docs.select(fname.alias("file"), "lang", "n_chars", chk.alias("h"))
        .groupBy("file", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum("h").cast("long").alias("content_checksum"),
        )
        .orderBy("file", "lang")
    )


PROVENANCE_ORACLE = """
SELECT 'documents.parquet' AS file, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 12) AS BIGINT)) AS BIGINT)
           AS content_checksum
FROM documents
GROUP BY lang
ORDER BY file, lang
"""


def drift_ks_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic on document length,
    src0 vs src1 — the bin-free complement to drift_psi_length (PSI needs
    chosen bins; KS is the sup-norm gap between the two empirical CDFs,
    sensitive anywhere on the axis). The distribution collapses to one
    row per distinct length FIRST (the only data-sized shuffle); the CDF
    cumsums then run over that bounded value domain — the reduced-table
    window pattern, allowlisted in tools/plan_lint.py."""
    docs = read_fixture(spark, sf_dir, "documents")
    from pyspark.sql import Window

    counts = (
        docs.filter(F.col("source").isin("src0", "src1"))
        .groupBy("n_chars")
        .agg(
            F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("c_a"),
            F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias("c_b"),
        )
    )
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    tot = counts.agg(
        F.sum("c_a").cast("double").alias("n_a"), F.sum("c_b").cast("double").alias("n_b")
    )
    cdf = (
        counts.withColumn("cum_a", F.sum("c_a").over(w))
        .withColumn("cum_b", F.sum("c_b").over(w))
        .crossJoin(F.broadcast(tot))
    )
    return cdf.agg(
        F.max(F.col("n_a")).cast("long").alias("n_a"),
        F.max(F.col("n_b")).cast("long").alias("n_b"),
        F.round(
            F.max(F.abs(F.col("cum_a") / F.col("n_a") - F.col("cum_b") / F.col("n_b"))),
            6,
        ).alias("ks_stat"),
    )


KS_ORACLE = """
WITH counts AS (
    SELECT n_chars,
           SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c_a,
           SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c_b
    FROM documents
    WHERE source IN ('src0', 'src1')
    GROUP BY n_chars
), tot AS (
    SELECT CAST(SUM(c_a) AS DOUBLE) AS n_a, CAST(SUM(c_b) AS DOUBLE) AS n_b
    FROM counts
), cdf AS (
    SELECT SUM(c_a) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cum_a,
           SUM(c_b) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cum_b
    FROM counts
)
SELECT CAST(tot.n_a AS BIGINT) AS n_a,
       CAST(tot.n_b AS BIGINT) AS n_b,
       ROUND(MAX(ABS(cum_a / tot.n_a - cum_b / tot.n_b)), 6) AS ks_stat
FROM cdf, tot
GROUP BY tot.n_a, tot.n_b
"""


def graph_dup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup graph — the density diagnostic for
    duplicate clusters (a syndication ring shows up as near-cliques, a
    chain of partial copies as triangle-free paths): node/edge counts,
    triangle count via the canonical two-hop edge join on ordered ids
    (each triangle a<b<c counted exactly once), wedge count from the
    degree table, and the global clustering coefficient 3·T / wedges.
    The ordered-edge join IS the scalable formulation (no per-node
    adjacency materialization); at 100 TB you'd pre-bucket edges by the
    low endpoint and this plan co-partitions."""
    from ..functions.cache import scoped_persist
    from ..operators.dedup import ngram_jaccard_pairs

    docs = read_fixture(spark, sf_dir, "documents")
    edges = scoped_persist(
        ngram_jaccard_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    )
    nodes = (
        edges.select(F.col("doc_a").alias("v"))
        .unionByName(edges.select(F.col("doc_b").alias("v")))
        .distinct()
    )
    deg = (
        edges.select(F.col("doc_a").alias("v"))
        .unionByName(edges.select(F.col("doc_b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    # ONE lazy plan (the events_funnel lesson): every census is a 1-row
    # aggregate crossJoined together, so the query is a single Spark action
    tri = (
        e1.join(e2, F.col("e1.doc_b") == F.col("e2.doc_a"))
        .join(
            e3,
            (F.col("e1.doc_a") == F.col("e3.doc_a"))
            & (F.col("e2.doc_b") == F.col("e3.doc_b")),
        )
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    wedges = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges")
    )
    return (
        nodes.agg(F.count("*").cast("long").alias("n_nodes"))
        .crossJoin(edges.agg(F.count("*").cast("long").alias("n_edges")))
        .crossJoin(tri)
        .crossJoin(wedges)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.round(
                F.when(F.col("n_wedges") > 0,
                       F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"))
                .otherwise(F.lit(0.0)),
                4,
            ).alias("clustering_coeff"),
        )
    )


DUP_TRIANGLES_ORACLE = """
WITH toks AS (
    SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
), sh AS (
    SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
    FROM toks, UNNEST(RANGE(1, LEN(t) - 1)) AS r(i)
), sizes AS (
    SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), commons AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), edges AS (
    SELECT doc_a, doc_b FROM commons
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.5
), nodes AS (
    SELECT DISTINCT v FROM (
        SELECT doc_a AS v FROM edges UNION ALL SELECT doc_b FROM edges
    )
), deg AS (
    SELECT v, COUNT(*) AS d FROM (
        SELECT doc_a AS v FROM edges UNION ALL SELECT doc_b FROM edges
    ) GROUP BY v
), tri AS (
    SELECT COUNT(*) AS t FROM edges e1
    JOIN edges e2 ON e1.doc_b = e2.doc_a
    JOIN edges e3 ON e1.doc_a = e3.doc_a AND e2.doc_b = e3.doc_b
), wed AS (
    SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS w FROM deg
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
       CAST(tri.t AS BIGINT) AS n_triangles,
       wed.w AS n_wedges,
       ROUND(CASE WHEN wed.w = 0 THEN 0.0
                  ELSE 3.0 * tri.t / wed.w END, 4) AS clustering_coeff
FROM tri, wed
"""


def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate documents must
    never straddle the train/eval boundary (they leak test answers into
    training), so the split key is the doc's DUP-CLUSTER id (connected
    components over Jaccard>=0.5 pairs; singletons key by their own id)
    rather than the doc id. The assignment stays a pure md5 function of
    the group key, so straddling is impossible BY CONSTRUCTION — the
    whole cluster moves as one unit — and the oracle recomputes the
    identical membership (transitive closure + the same hash
    thresholds). Scale: clustering is the already-verified pointer-jump
    machinery; the split itself adds zero shuffles beyond one
    left join against the (small) cluster map."""
    from ..operators.dedup import connected_dup_clusters, ngram_jaccard_pairs
    from ..operators.splits import assign_split

    docs = read_fixture(spark, sf_dir, "documents")
    clusters = connected_dup_clusters(ngram_jaccard_pairs(docs, threshold=0.5))
    keyed = docs.join(clusters, "doc_id", "left_outer").withColumn(
        "group_key", F.coalesce(F.col("cluster"), F.col("doc_id"))
    )
    split = assign_split(
        keyed,
        key_col="group_key",
        weights={"train": 0.8, "val": 0.1, "test": 0.1},
        salt="leakfree",
    )
    return (
        split.groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("group_key").alias("n_groups"),
            F.sum("doc_id").cast("long").alias("sum_doc_ids"),
        )
        .orderBy("split")
    )


def _leakage_safe_oracle_sql() -> str:
    from ..operators.splits import _hex_threshold

    t_train = _hex_threshold(0.8)
    t_val = _hex_threshold(0.9)
    return f"""
WITH RECURSIVE pairs AS (
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM toks, UNNEST(RANGE(1, LEN(t) - 1)) AS r(i)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), commons AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b FROM commons
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.5
), edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
), reach(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), clusters AS (
    SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster
    FROM reach GROUP BY src
), keyed AS (
    SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS group_key
    FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
), assigned AS (
    SELECT doc_id, group_key,
           CASE WHEN SUBSTR(MD5('leakfree:' || CAST(group_key AS VARCHAR)), 1, 8) < '{t_train}'
                THEN 'train'
                WHEN SUBSTR(MD5('leakfree:' || CAST(group_key AS VARCHAR)), 1, 8) < '{t_val}'
                THEN 'val'
                ELSE 'test' END AS split
    FROM keyed
)
SELECT split, COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT group_key) AS BIGINT) AS n_groups,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_ids
FROM assigned
GROUP BY split
ORDER BY split
"""


LEAKAGE_SAFE_ORACLE = _leakage_safe_oracle_sql()


def text_novelty_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-value estimation by n-gram novelty: a document's novelty is the
    fraction of its distinct 3-gram shingles whose FIRST corpus occurrence
    (minimum doc_id) is the document itself — near-duplicates of earlier
    docs score ~0, fresh content ~1. Aggregated per source, this ranks
    feeds by how much genuinely new text they contribute, the curation
    signal behind dedup-aware source weighting. Scale: one shingle census
    shuffle (min-doc_id partial-aggregates map-side), one join back, two
    small aggregates — no pairwise work at all."""
    from ..functions.cache import scoped_persist
    from ..operators.dedup import _distinct_shingles

    docs = read_fixture(spark, sf_dir, "documents")
    sh = scoped_persist(_distinct_shingles(docs, n=3))
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .withColumn("novelty", F.col("n_novel") / F.col("n_shingles"))
    )
    return (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_novel").cast("long").alias("novel_shingles"),
            F.sum("n_shingles").cast("long").alias("total_shingles"),
            F.round(F.avg("novelty"), 4).alias("avg_novelty"),
        )
        .orderBy("source")
    )


NOVELTY_ORACLE = """
WITH toks AS (
    SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
), sh AS (
    SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
    FROM toks, UNNEST(RANGE(1, LEN(t) - 1)) AS r(i)
), first AS (
    SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
), per_doc AS (
    SELECT sh.doc_id,
           COUNT(*) AS n_shingles,
           SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS n_novel
    FROM sh JOIN first f ON sh.shingle = f.shingle
    GROUP BY sh.doc_id
)
SELECT d.source, COUNT(*) AS n_docs,
       CAST(SUM(p.n_novel) AS BIGINT) AS novel_shingles,
       CAST(SUM(p.n_shingles) AS BIGINT) AS total_shingles,
       ROUND(AVG(CAST(p.n_novel AS DOUBLE) / p.n_shingles), 4) AS avg_novelty
FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id
GROUP BY d.source
ORDER BY d.source
"""


def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space health check: per-dimension mean, variance, and
    range over the whole corpus — the screen for collapsed dimensions
    (variance ~ 0 wastes capacity and breaks whitening) and runaway scale
    drift between model versions. One posexplode scan + a |dims|-group
    aggregate; the variance uses the explicit E[x^2]-E[x]^2 form so the
    oracle replays the identical arithmetic (engine-native VAR_POP
    implementations differ algorithmically)."""
    from ..functions.vectors import as_double

    emb = read_fixture(spark, sf_dir, "embeddings")
    ex = emb.select(
        F.posexplode(as_double("embedding")).alias("pos", "val")
    ).select((F.col("pos") + 1).alias("dim"), "val")
    return (
        ex.groupBy("dim")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("val"), 6).alias("mean_val"),
            F.round(F.avg(F.col("val") * F.col("val")) - F.avg("val") * F.avg("val"), 6).alias(
                "var_val"
            ),
            F.round(F.min("val"), 6).alias("min_val"),
            F.round(F.max("val"), 6).alias("max_val"),
        )
        .orderBy("dim")
    )


EMBEDDING_DIM_STATS_ORACLE = """
WITH ex AS (
    SELECT GENERATE_SUBSCRIPTS(CAST(embedding AS DOUBLE[]), 1) AS dim,
           UNNEST(CAST(embedding AS DOUBLE[])) AS val
    FROM embeddings
)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(val), 6) AS mean_val,
       ROUND(AVG(val * val) - AVG(val) * AVG(val), 6) AS var_val,
       ROUND(MIN(val), 6) AS min_val,
       ROUND(MAX(val), 6) AS max_val
FROM ex
GROUP BY dim
ORDER BY dim
"""


_HEAPS_BUCKET = 50


def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of 3-GRAM vocabulary growth: V(n) ~ K·n^beta,
    estimated as the OLS slope of ln(cumulative distinct 3-grams) ~
    ln(cumulative tokens) over doc-id-ordered corpus prefixes — the
    companion sanity statistic to text_zipf_slope (sub-linear growth is
    the signature of natural combinatorial text; a templated corpus
    saturates, a random one grows linearly). The n-GRAM vocabulary is
    the right unit here: this synthetic corpus's UNIGRAM vocabulary is
    closed (~31 terms, saturated within the first bucket — a degenerate
    flat line), while its shingle space keeps growing like real text.
    Prefixes are taken at BUCKET granularity (doc_id // 50): token totals
    and first-occurrence counts aggregate per bucket (the only data-sized
    shuffles), so the running sums and the regression run over |buckets|
    rows, never per doc — the same at-scale shape whether the corpus is
    500 docs or 50 billion (pick the bucket width to taste)."""
    from pyspark.sql import Window

    from ..functions.texts import tokens
    from ..operators.dedup import _distinct_shingles

    docs = read_fixture(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id"), F.explode(tokens("text")).alias("term")
    )
    bucket = (F.col("doc_id") / _HEAPS_BUCKET).cast("long")
    tok_per_bucket = toks.groupBy(bucket.alias("b")).agg(
        F.count("*").alias("n_tokens")
    )
    first_bucket = _distinct_shingles(docs, n=3).groupBy("shingle").agg(
        (F.min("doc_id") / _HEAPS_BUCKET).cast("long").alias("b")
    )
    vocab_per_bucket = first_bucket.groupBy("b").agg(F.count("*").alias("n_new_terms"))
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    pts = (
        tok_per_bucket.join(vocab_per_bucket, "b", "left_outer")
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "cum_vocab", F.sum(F.coalesce(F.col("n_new_terms"), F.lit(0))).over(w)
        )
        # A leading bucket with zero cumulative vocab would diverge across
        # engines (Spark log(0) -> NULL silently dropped, DuckDB LN(0)
        # raises), so both sides drop those points explicitly.
        .filter(F.col("cum_vocab") > 0)
        .select(F.log("cum_tokens").alias("x"), F.log("cum_vocab").alias("y"))
    )
    m = pts.agg(F.avg("x").alias("mx"), F.avg("y").alias("my"))
    c = pts.crossJoin(F.broadcast(m))
    stats = c.agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum((F.col("x") - F.col("mx")) * (F.col("y") - F.col("my"))).alias("sxy"),
        F.sum((F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx"))).alias("sxx"),
        F.sum((F.col("y") - F.col("my")) * (F.col("y") - F.col("my"))).alias("syy"),
    )
    b1 = F.col("sxy") / F.col("sxx")
    # n_points >= 2 guards the sxx=0 division on single-bucket input.
    return stats.filter(F.col("n_points") >= 2).select(
        "n_points",
        F.round(b1, 4).alias("heaps_beta"),
        F.round((F.col("sxy") * F.col("sxy")) / (F.col("sxx") * F.col("syy")), 4).alias(
            "r2"
        ),
    )


HEAPS_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
), tok_per_bucket AS (
    SELECT doc_id // {_HEAPS_BUCKET} AS b, COUNT(*) AS n_tokens
    FROM toks GROUP BY 1
), sh AS (
    SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
    FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
         UNNEST(RANGE(1, LEN(t) - 1)) AS r(i)
), first_bucket AS (
    SELECT shingle, MIN(doc_id) // {_HEAPS_BUCKET} AS b FROM sh GROUP BY shingle
), vocab_per_bucket AS (
    SELECT b, COUNT(*) AS n_new_terms FROM first_bucket GROUP BY b
), cum AS (
    SELECT SUM(t.n_tokens) OVER (ORDER BY t.b ROWS UNBOUNDED PRECEDING) AS cum_tokens,
           SUM(COALESCE(v.n_new_terms, 0)) OVER (ORDER BY t.b ROWS UNBOUNDED PRECEDING) AS cum_vocab
    FROM tok_per_bucket t LEFT JOIN vocab_per_bucket v ON t.b = v.b
), pts AS (
    SELECT LN(cum_tokens) AS x, LN(cum_vocab) AS y FROM cum WHERE cum_vocab > 0
), m AS (
    SELECT AVG(x) AS mx, AVG(y) AS my FROM pts
), stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           SUM((x - mx) * (y - my)) AS sxy,
           SUM((x - mx) * (x - mx)) AS sxx,
           SUM((y - my) * (y - my)) AS syy
    FROM pts, m
)
SELECT n_points,
       ROUND(sxy / sxx, 4) AS heaps_beta,
       ROUND((sxy * sxy) / (sxx * syy), 4) AS r2
FROM stats
WHERE n_points >= 2
"""


def dedup_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted near-duplicate pairs by TF-IDF cosine
    (operators/dedup.tfidf_cosine_pairs): term frequencies x ln(N/df)
    idf, L2-normalized, paired through the inverted-index self-join —
    the sparse-vector complement to the set-based Jaccard/MinHash tier
    (repeated terms count; rare terms dominate). Threshold 0.9 isolates
    the true near-dup pairs in this corpus; the 0.9000x/0.8999x margin
    at sf0.1 is ~1e-5, eight orders above cross-engine float noise."""
    from ..operators.dedup import tfidf_cosine_pairs

    docs = read_fixture(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(docs, threshold=0.9).orderBy("doc_a", "doc_b")


TFIDF_COSINE_ORACLE = """
WITH tf AS (
    SELECT doc_id,
           UNNEST(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')), ' ')) AS term
    FROM documents
), tfc AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY doc_id, term
), dfx AS (
    SELECT term, COUNT(*) AS df FROM tfc GROUP BY term
), nd AS (SELECT COUNT(*) AS n_docs FROM documents),
w AS (
    SELECT doc_id, t.term, t.tf * LN(CAST(n_docs AS DOUBLE) / df) AS w
    FROM tfc t JOIN dfx USING (term) CROSS JOIN nd
), norms AS (
    SELECT doc_id, SQRT(SUM(w * w)) AS norm FROM w GROUP BY doc_id
), u AS (
    SELECT w.doc_id, term, w / norm AS u
    FROM w JOIN norms USING (doc_id) WHERE norm > 0
), pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.u * b.u) AS raw_cos
    FROM u a JOIN u b ON a.term = b.term AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, ROUND(raw_cos, 4) AS cos_sim
FROM pairs
WHERE raw_cos >= 0.9
ORDER BY doc_a, doc_b
"""


_PRF_FB_DOCS = 3  # feedback depth: round-1 top docs mined for terms
_PRF_EXP_TERMS = 2  # expansion width: new terms appended per query


def retrieval_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio-lite) — the
    classic two-round sparse-retrieval loop: BM25 round 1 retrieves each
    query's top-3 docs; their strongest tf·idf terms NOT already in the
    query (top-2, ties by term) join the query with weight 1; BM25 round
    2 scores the expanded query and returns the final top-5. The vocab
    mismatch between query and corpus is THE failure mode of sparse
    retrieval, and PRF is its standard cheap fix — no model needed.

    Scale shape: both rounds are the tuned text_bm25_topk plan (persisted
    tf/dlen, idf persisted because both rounds consume it, 1-row stats as
    a broadcast crossJoin, posting-list joins bounded by query terms);
    the feedback mining touches only fb_docs×queries rows. One lazy plan,
    no eager actions. The oracle replays both rounds plus the term-mining
    argmax with identical tie-breaks."""
    from pyspark.sql import Window

    from ..functions.cache import scoped_persist
    from ..functions.texts import tokens

    docs = read_fixture(spark, sf_dir, "documents")
    tf = scoped_persist(
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dlen = scoped_persist(tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")))
    stats = dlen.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avg_dl"),
    )
    idf = scoped_persist(
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "term",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ).alias("idf"),
        )
    )
    k1, b = _BM25_K1, _BM25_B

    def bm25_scores(qterms: DataFrame) -> DataFrame:
        contrib = (
            tf.join(dlen, "doc_id")
            .join(idf, "term")
            .join(F.broadcast(qterms), "term")
            .crossJoin(F.broadcast(stats.select("avg_dl")))
            .filter(F.col("doc_id") != F.col("query_doc"))
            .select(
                "query_doc",
                "doc_id",
                (
                    F.col("qtf")
                    * F.col("idf")
                    * (F.col("tf") * (k1 + 1))
                    / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avg_dl")))
                ).alias("c"),
            )
        )
        return contrib.groupBy("query_doc", "doc_id").agg(
            F.round(F.sum("c"), 4).alias("bm25")
        )

    qtf0 = tf.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_doc"), "term", F.col("tf").alias("qtf")
    )
    w_rank = Window.partitionBy("query_doc").orderBy(F.desc("bm25"), "doc_id")
    fb = (
        bm25_scores(qtf0)
        .withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= _PRF_FB_DOCS)
        .select("query_doc", "doc_id")
    )
    mined = (
        fb.alias("fb")
        .join(tf.alias("ft"), F.col("fb.doc_id") == F.col("ft.doc_id"))
        .join(idf, "term")
        .groupBy(F.col("fb.query_doc").alias("query_doc"), "term")
        .agg(F.sum(F.col("ft.tf") * F.col("idf")).alias("w"))
    )
    w_term = Window.partitionBy("query_doc").orderBy(F.desc("w"), "term")
    expansion = (
        mined.join(qtf0.select("query_doc", "term"), ["query_doc", "term"], "left_anti")
        .withColumn("rn", F.row_number().over(w_term))
        .filter(F.col("rn") <= _PRF_EXP_TERMS)
        .select("query_doc", "term", F.lit(1).cast("long").alias("qtf"))
    )
    qtf1 = qtf0.unionByName(expansion)
    return (
        bm25_scores(qtf1)
        .withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= 5)
        .select("query_doc", "rnk", "doc_id", "bm25")
        .orderBy("query_doc", "rnk")
    )


QUERY_EXPANSION_ORACLE = f"""
WITH tf AS (
    SELECT doc_id, term, COUNT(*) AS tf
    FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents)
    GROUP BY doc_id, term
), dlen AS (
    SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id
), stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avg_dl FROM dlen
), idf AS (
    SELECT term, LN((n_docs - COUNT(*) + 0.5) / (COUNT(*) + 0.5) + 1.0) AS idf
    FROM tf, stats GROUP BY term, n_docs
), qtf0 AS (
    SELECT doc_id AS query_doc, term, tf AS qtf FROM tf WHERE doc_id < 3
), c1 AS (
    SELECT q.query_doc, tf.doc_id,
           q.qtf * idf.idf * (tf.tf * ({_BM25_K1} + 1))
           / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dlen.dl / stats.avg_dl)) AS c
    FROM tf
    JOIN dlen ON tf.doc_id = dlen.doc_id
    JOIN idf ON tf.term = idf.term
    JOIN qtf0 q ON tf.term = q.term
    CROSS JOIN stats
    WHERE tf.doc_id <> q.query_doc
), s1 AS (
    SELECT query_doc, doc_id, ROUND(SUM(c), 4) AS bm25 FROM c1 GROUP BY 1, 2
), fb AS (
    SELECT query_doc, doc_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_doc
                                     ORDER BY bm25 DESC, doc_id) AS rnk
        FROM s1
    ) WHERE rnk <= {_PRF_FB_DOCS}
), mined AS (
    SELECT fb.query_doc, tf.term, SUM(tf.tf * idf.idf) AS w
    FROM fb JOIN tf ON tf.doc_id = fb.doc_id
    JOIN idf ON idf.term = tf.term
    GROUP BY fb.query_doc, tf.term
), expansion AS (
    SELECT query_doc, term, CAST(1 AS BIGINT) AS qtf FROM (
        SELECT m.*, ROW_NUMBER() OVER (PARTITION BY m.query_doc
                                       ORDER BY m.w DESC, m.term) AS rn
        FROM mined m
        WHERE NOT EXISTS (SELECT 1 FROM qtf0
                          WHERE qtf0.query_doc = m.query_doc
                            AND qtf0.term = m.term)
    ) WHERE rn <= {_PRF_EXP_TERMS}
), qtf1 AS (
    SELECT * FROM qtf0 UNION ALL SELECT * FROM expansion
), c2 AS (
    SELECT q.query_doc, tf.doc_id,
           q.qtf * idf.idf * (tf.tf * ({_BM25_K1} + 1))
           / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dlen.dl / stats.avg_dl)) AS c
    FROM tf
    JOIN dlen ON tf.doc_id = dlen.doc_id
    JOIN idf ON tf.term = idf.term
    JOIN qtf1 q ON tf.term = q.term
    CROSS JOIN stats
    WHERE tf.doc_id <> q.query_doc
), s2 AS (
    SELECT query_doc, doc_id, ROUND(SUM(c), 4) AS bm25 FROM c2 GROUP BY 1, 2
)
SELECT query_doc, CAST(rnk AS BIGINT) AS rnk, doc_id, bm25 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_doc
                                 ORDER BY bm25 DESC, doc_id) AS rnk
    FROM s2
) WHERE rnk <= 5
ORDER BY query_doc, rnk
"""


_MMR_LAM = 0.7


def retrieval_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified retrieval (operators/similarity.mmr_rerank) — the
    serving-tier pass between ANN and the context window: for each of the
    first three vectors as queries, exact-cosine top-8 candidates, then 3
    greedy MMR picks (lam=0.7) where each pick maximizes
    lam*sim(query,d) - (1-lam)*max_{s in picked} sim(d,s). Candidate
    generation is the distributed scan (broadcast probes, identical plan
    to sim_bruteforce_topk); the rerank unrolls into 3 fixed JVM-side
    rounds over probe-keyed pools of ≤8 rows — one lazy plan, no driver
    loop. The oracle replays pool → pairwise cosines → the same 3 greedy
    rounds as MATERIALIZED CTEs, with lam literals emitted at full float
    repr so both engines score with bit-identical constants."""
    from ..operators.similarity import mmr_rerank

    emb = read_fixture(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    return mmr_rerank(emb, probes, k=3, pool=8, lam=_MMR_LAM).orderBy(
        "probe_id", "rnk"
    )


def _mmr_oracle_sql(*, k: int = 3, pool: int = 8, lam: float = _MMR_LAM) -> str:
    lam_r, one_minus_lam_r = repr(float(lam)), repr(1.0 - float(lam))
    parts = [
        """p AS (
    SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
    FROM embeddings WHERE vec_id < 3
), c AS (
    SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
), scored AS (
    SELECT probe_id, cid, cv, LIST_COSINE_SIMILARITY(pv, cv) AS sim
    FROM p, c WHERE cid <> probe_id
), pool AS MATERIALIZED (
    SELECT probe_id, cid, cv, sim FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                     ORDER BY sim DESC, cid) AS rn
        FROM scored
    ) WHERE rn <= %d
), pair AS MATERIALIZED (
    SELECT a.probe_id, a.cid AS ca, b.cid AS cb,
           LIST_COSINE_SIMILARITY(a.cv, b.cv) AS psim
    FROM pool a JOIN pool b ON a.probe_id = b.probe_id AND a.cid <> b.cid
), s1 AS MATERIALIZED (
    SELECT probe_id, cid, 1 AS rnk, sim AS score FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                     ORDER BY sim DESC, cid) AS rn
        FROM pool
    ) WHERE rn = 1
), sel1 AS (SELECT * FROM s1)"""
        % pool
    ]
    for r in range(2, k + 1):
        parts.append(
            f"""r{r} AS (
    SELECT pool.probe_id, pool.cid, pool.sim, MAX(pair.psim) AS redund
    FROM pool
    JOIN pair ON pair.probe_id = pool.probe_id AND pair.ca = pool.cid
    JOIN sel{r - 1} s ON s.probe_id = pair.probe_id AND s.cid = pair.cb
    WHERE NOT EXISTS (SELECT 1 FROM sel{r - 1} x
                      WHERE x.probe_id = pool.probe_id AND x.cid = pool.cid)
    GROUP BY pool.probe_id, pool.cid, pool.sim
), s{r} AS MATERIALIZED (
    SELECT probe_id, cid, {r} AS rnk, mmr AS score FROM (
        SELECT probe_id, cid,
               {lam_r} * sim - {one_minus_lam_r} * redund AS mmr,
               ROW_NUMBER() OVER (PARTITION BY probe_id
                                  ORDER BY {lam_r} * sim - {one_minus_lam_r} * redund DESC,
                                           cid) AS rn
        FROM r{r}
    ) WHERE rn = 1
), sel{r} AS (SELECT * FROM sel{r - 1} UNION ALL SELECT * FROM s{r})"""
        )
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, cid AS neighbor_id,
       ROUND(score, 4) AS score
FROM sel{k}
ORDER BY probe_id, rnk
"""


MMR_ORACLE = _mmr_oracle_sql()


EXTRA_QUERIES: dict[str, QuerySpec] = {
    "retrieval_mmr_rerank": QuerySpec(retrieval_mmr_rerank, MMR_ORACLE, headline=True),
    "mixture_token_budget_epochs": QuerySpec(
        mixture_token_budget_epochs, MIXTURE_EPOCHS_ORACLE
    ),
    "curriculum_quality_phases": QuerySpec(
        curriculum_quality_phases, CURRICULUM_ORACLE
    ),
    "retrieval_known_item_mrr": QuerySpec(
        retrieval_known_item_mrr, KNOWN_ITEM_MRR_ORACLE
    ),
    "pii_detect_redact": QuerySpec(pii_detect_redact, PII_ORACLE),
    "drift_js_tokens": QuerySpec(drift_js_tokens, DRIFT_JS_ORACLE),
    "dedup_minhash_quality": QuerySpec(
        dedup_minhash_quality, DEDUP_MINHASH_QUALITY_ORACLE
    ),
    "dataset_shard_balance": QuerySpec(dataset_shard_balance, SHARD_BALANCE_ORACLE),
    "text_tokenizer_fertility": QuerySpec(
        text_tokenizer_fertility, TOKENIZER_FERTILITY_ORACLE
    ),
    "quality_repetition_topgram": QuerySpec(
        quality_repetition_topgram, REPETITION_ORACLE
    ),
    "retrieval_query_expansion": QuerySpec(
        retrieval_query_expansion, QUERY_EXPANSION_ORACLE
    ),
    "dedup_repeated_substrings": QuerySpec(
        dedup_repeated_substrings, REPEATED_SUBSTR_ORACLE, headline=True
    ),
    "dedup_tfidf_cosine": QuerySpec(dedup_tfidf_cosine, TFIDF_COSINE_ORACLE),
    "text_char_entropy": QuerySpec(text_char_entropy, CHAR_ENTROPY_ORACLE),
    "split_leakage_safe": QuerySpec(split_leakage_safe, LEAKAGE_SAFE_ORACLE),
    "text_novelty_by_source": QuerySpec(text_novelty_by_source, NOVELTY_ORACLE),
    "embedding_dim_stats": QuerySpec(embedding_dim_stats, EMBEDDING_DIM_STATS_ORACLE),
    "text_heaps_law": QuerySpec(text_heaps_law, HEAPS_ORACLE),
    "dedup_source_flows": QuerySpec(dedup_source_flows, SOURCE_FLOWS_ORACLE),
    "graph_dup_triangles": QuerySpec(graph_dup_triangles, DUP_TRIANGLES_ORACLE),
    "drift_ks_length": QuerySpec(drift_ks_length, KS_ORACLE),
    "audit_provenance_fingerprint": QuerySpec(
        audit_provenance_fingerprint, PROVENANCE_ORACLE
    ),
    "quality_rule_violations": QuerySpec(quality_rule_violations, RULES_ORACLE),
    "pipeline_rag_retrieval": QuerySpec(
        pipeline_rag_retrieval, RAG_ORACLE, headline=True
    ),
    "text_bm25_topk": QuerySpec(text_bm25_topk, BM25_ORACLE, headline=True),
    # merged incremental index must equal the full rebuild — same oracle
    "text_bm25_incremental": QuerySpec(text_bm25_incremental, BM25_ORACLE, headline=True),
    # minor compaction folds delta→base from the published segments only;
    # same oracle as the incremental serve (bit-identical by construction)
    "text_bm25_compacted": QuerySpec(text_bm25_compacted, BM25_ORACLE),
    "embedding_outliers": QuerySpec(embedding_outliers, EMBEDDING_OUTLIERS_ORACLE),
    "mine_hard_negatives": QuerySpec(mine_hard_negatives, HARD_NEGATIVES_ORACLE),
    "text_distinctive_terms": QuerySpec(text_distinctive_terms, DISTINCTIVE_ORACLE),
    "pipeline_hybrid_retrieval": QuerySpec(
        pipeline_hybrid_retrieval, HYBRID_ORACLE
    ),
    "retrieval_rank_fusion": QuerySpec(retrieval_rank_fusion, RRF_ORACLE),
    "text_diversity_distinct_n": QuerySpec(
        text_diversity_distinct_n, DIVERSITY_ORACLE
    ),
    "report_dataset_card": QuerySpec(report_dataset_card, DATASET_CARD_ORACLE),
    "dedup_cascade_waterfall": QuerySpec(
        dedup_cascade_waterfall, CASCADE_WATERFALL_ORACLE
    ),
    "multimodal_image_entropy": QuerySpec(
        multimodal_image_entropy, IMAGE_ENTROPY_ORACLE
    ),
    "text_code_switching": QuerySpec(text_code_switching, CODE_SWITCH_ORACLE),
    "decontaminate_bloom_prefilter": QuerySpec(
        decontaminate_bloom_prefilter, BLOOM_DECONTAMINATE_ORACLE
    ),
    "sample_weighted_reservoir": QuerySpec(
        sample_weighted_reservoir, WEIGHTED_RESERVOIR_ORACLE
    ),
    "drift_psi_length": QuerySpec(drift_psi_length, PSI_ORACLE),
    "multimodal_image_histogram": QuerySpec(
        multimodal_image_histogram, IMAGE_HISTOGRAM_ORACLE
    ),
    "multimodal_image_resize": QuerySpec(
        multimodal_image_resize, IMAGE_RESIZE_ORACLE
    ),
    "text_zipf_slope": QuerySpec(text_zipf_slope, ZIPF_ORACLE),
    "multimodal_audio_features": QuerySpec(
        multimodal_audio_features, AUDIO_FEATURES_ORACLE
    ),
    "decontaminate_semantic": QuerySpec(
        decontaminate_semantic, SEMANTIC_DECONTAMINATE_ORACLE
    ),
    "dedup_cluster_keep_best": QuerySpec(dedup_cluster_keep_best, KEEP_BEST_ORACLE),
    "align_mutual_nearest": QuerySpec(align_mutual_nearest, MUTUAL_NEAREST_ORACLE),
    "snapshot_diff_by_lang": QuerySpec(snapshot_diff_by_lang, SNAPSHOT_DIFF_ORACLE),
    "text_bpe_merges": QuerySpec(text_bpe_merges, BPE_ORACLE),
    "text_bpe_compression": QuerySpec(text_bpe_compression, BPE_COMPRESSION_ORACLE),
    "pipeline_pretraining_corpus": QuerySpec(
        pipeline_pretraining_corpus, PRETRAINING_ORACLE, headline=True
    ),
    "dedup_embedding_cosine_bucketed_auto": QuerySpec(
        dedup_embedding_cosine_bucketed_auto, EMBED_DEDUP_AUTO_ORACLE, headline=True
    ),
    "text_unigram_logprob": QuerySpec(text_unigram_logprob, UNIGRAM_LOGPROB_ORACLE),
    "text_bigram_logprob": QuerySpec(text_bigram_logprob, BIGRAM_LOGPROB_ORACLE),
    "text_chunk_overlap": QuerySpec(text_chunk_overlap, CHUNK_ORACLE),
    "sample_k_per_group": QuerySpec(sample_k_per_group, SAMPLE_K_ORACLE),
    "quality_outliers_mad": QuerySpec(quality_outliers_mad, MAD_ORACLE),
    "multimodal_frame_sample": QuerySpec(multimodal_frame_sample, FRAME_SAMPLE_ORACLE),
    "sketch_cms_heavy_hitters": QuerySpec(sketch_cms_heavy_hitters, CMS_ORACLE, headline=True),
}
