"""Text column helpers — all JVM-side expressions (no Python UDFs).

Built for the documents fixture (clean single-space lowercase text); the
normalizers make the same functions safe on messier corpora.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Small per-language stopword lists for the language-ID heuristic (X4).
#: Public knowledge (most-frequent function words per language).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "von", "zu", "mit", "auf", "ein"),
    "fr": ("le", "la", "les", "et", "est", "de", "un", "une", "dans", "pour"),
    "es": ("el", "la", "los", "y", "es", "de", "un", "una", "en", "por"),
    "zh": ("的", "了", "是", "我", "不", "在", "有", "这", "他", "们"),
}


def normalize(text: Column | str) -> Column:
    """Lowercase + collapse whitespace + trim — the canonical form used by
    hashing/dedup so trivial formatting differences never defeat a match."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization → array<string>."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-word shingles as strings: ["a b c", "b c d", ...].

    Pure expression (transform over an index sequence) so it runs inside
    whole-stage codegen; empty array when the doc has < n tokens.
    """
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    joined = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, joined).otherwise(F.array().cast("array<string>"))


def stopword_hits(toks: Column, lang: str) -> Column:
    """How many tokens are stopwords of ``lang``."""
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def predicted_lang(toks: Column, langs: tuple[str, ...] = ("en", "de", "fr", "es", "zh")) -> Column:
    """Greedy argmax over per-language stopword hits; fixed priority order
    breaks ties so the result is deterministic (first lang wins)."""
    hits = {lang: stopword_hits(toks, lang) for lang in langs}
    expr = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        cond = hits[lang] >= F.greatest(*[hits[o] for o in langs if o != lang])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr
