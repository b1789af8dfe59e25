"""Text-analysis functions for large-scale document pipelines.

Everything is built from JVM-side ``pyspark.sql.functions`` (regex,
higher-order array functions, md5) — no Python UDFs — so the whole
module stays inside whole-stage codegen and scales linearly with the
scan. These are the per-document building blocks the dedup operators
(``operators.dedup``) and the catalog's document queries compose.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: stopword sets per language for the language-ID heuristic. Small,
#: high-frequency function words; extend per deployment.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "los"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "de", "et", "est", "que", "un", "pour", "dans", "les"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "人"],
}

STOPWORDS_EN = LANG_STOPWORDS["en"]


def normalize_text(col: Column) -> Column:
    """Lowercase, collapse whitespace, trim — the canonical form used
    for fingerprinting and dedup."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize_text(col), " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """A BPE-flavored token estimate: word-piece-like segments
    obtained by splitting on whitespace AND on letter/digit/punct
    boundaries (e.g. ``spark2.0!`` → ``spark``, ``2``, ``.``, ``0``,
    ``!``). A cheap upper-bound proxy for subword vocabularies that
    needs no model file."""
    pieces = F.regexp_extract_all(
        normalize_text(col), F.lit(r"([a-z]+|[0-9]+|[^a-z0-9\s])"), 1
    )
    return F.size(pieces)


def shingles_of_tokens(toks: Column, n: int = 3) -> Column:
    """n-word shingles from an ALREADY-MATERIALIZED token array.

    Higher-order functions are interpreted (not codegen'd) and
    re-evaluate every non-lambda subtree of the lambda body once per
    element — so ``toks`` must be a projected column (or other cheap
    expression), never an inline ``split(regexp_replace(...))``
    chain, or the tokenization cost multiplies by the shingle count.
    Call sites project the token array first (Catalyst keeps a
    multi-referenced non-trivial projection as a real column)."""
    k = F.size(toks) - (n - 1)
    return F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def word_shingles(col: Column, n: int = 3) -> Column:
    """Array of n-word shingles (the dedup unit for MinHash /
    Jaccard). Documents shorter than ``n`` words yield their full
    token string as the single shingle.

    NOTE: inline form — fine for small inputs and tests; hot paths
    should project ``tokens(col)`` first and use
    :func:`shingles_of_tokens` (see its HOF re-evaluation caveat)."""
    return shingles_of_tokens(tokens(col), n)


def ngrams_of_norm(norm: Column, n: int = 8) -> Column:
    """Character n-grams from an ALREADY-MATERIALIZED normalized
    string (same HOF caveat as :func:`shingles_of_tokens`)."""
    k = F.length(norm) - (n - 1)
    return F.when(
        k >= 1,
        F.transform(F.sequence(F.lit(1), k), lambda i: F.substring(norm, i, n)),
    ).otherwise(F.array(norm))


def char_ngrams(col: Column, n: int = 8) -> Column:
    """Array of character n-grams of the normalized text (rolling
    fingerprint unit). Inline form — hot paths should project
    ``normalize_text(col)`` first and use :func:`ngrams_of_norm`."""
    return ngrams_of_norm(normalize_text(col), n)


def fingerprint(col: Column) -> Column:
    """Exact-dedup fingerprint: md5 of the normalized text. md5 is
    engine-portable (identical hex in Spark, DuckDB, Postgres), which
    keeps dedup results reproducible across systems."""
    return F.md5(normalize_text(col))


def winnow_fingerprint(col: Column, n: int = 8) -> Column:
    """Near-dup document sketch: the minimum md5 over the document's
    character n-grams (a 1-min-wise rolling-hash fingerprint — the
    winnowing idea with k=1). Equal sketches ⇒ the documents share
    their minimal n-gram. Inline form; hot paths project the
    normalized text and use ``array_min(transform(ngrams_of_norm(...),
    md5))`` over the materialized column."""
    return F.array_min(F.transform(char_ngrams(col, n), F.md5))


def stopword_count(col: Column, stopwords: list[str] | None = None) -> Column:
    words = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(words, t)))


def punct_ratio(col: Column) -> Column:
    norm = normalize_text(col)
    stripped = F.regexp_replace(norm, r"[.,;:!?'\"()\[\]-]", "")
    return (F.length(norm) - F.length(stripped)).cast("double") / F.nullif(
        F.length(norm).cast("double"), F.lit(0.0)
    )


def quality_score(col: Column) -> Column:
    """Composite document-quality heuristic in [0, 1]: rewards
    mid-length documents, a healthy stopword ratio, and low
    punctuation density — the standard cheap pre-filter in front of
    expensive pipeline stages."""
    n_tok = token_count(col).cast("double")
    stop_ratio = stopword_count(col).cast("double") / F.nullif(n_tok, F.lit(0.0))
    length_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_pen = F.least(
        F.coalesce(punct_ratio(col), F.lit(0.0)) * F.lit(5.0), F.lit(1.0)
    )
    stop_score = F.least(F.coalesce(stop_ratio, F.lit(0.0)) * F.lit(4.0), F.lit(1.0))
    return (
        F.lit(0.5) * length_score + F.lit(0.3) * stop_score
        - F.lit(0.2) * punct_pen
        + F.lit(0.2)
    )


def lang_scores_of_tokens(toks: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts over an ALREADY-MATERIALIZED
    token array (project ``tokens(col)`` first in hot paths — the
    same HOF re-evaluation caveat as :func:`shingles_of_tokens`)."""
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts (the n-gram-free language-ID
    heuristic: function words are the strongest cheap signal).
    Inline form — hot paths project the token array first."""
    return lang_scores_of_tokens(tokens(col))


def lang_id_from_scores(scores: dict[str, Column]) -> Column:
    """Argmax language from per-language score COLUMNS with the
    deterministic precedence order (en > es > de > fr > zh); 'und'
    when no stopword hits at all."""
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("und")
    for lang in reversed(langs):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def lang_id(col: Column) -> Column:
    """Argmax language with deterministic tie precedence. Inline
    form — hot paths project score columns and use
    :func:`lang_id_from_scores`."""
    return lang_id_from_scores(lang_scores(col))


def md5_bucket(col: Column, salt: str, m: int) -> Column:
    """Engine-portable uniform hash bucket in [0, m): the integer
    value of the first 8 md5 hex digits of ``salt || ':' || col``,
    mod ``m``. md5 hex is identical across Spark / DuckDB / Postgres
    (same property :func:`fingerprint` relies on), so bucket sets
    built by one engine can be probed by another — the primitive
    under the Bloom-style membership filter (q75). 8 hex digits =
    32 bits, exact in BIGINT on both engines."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + ":"), col)), 1, 8), 16, 10
        ).cast("long")
        % m
    )
