"""Text analysis operators for large-scale training-data pipelines.

All hot-path expressions are native Spark SQL functions (JVM-side,
codegen'd); nothing here drops to Python. Designed over the
``documents(doc_id, text, lang, source, n_chars)`` table shape but
parameterized by column name.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "quality_features",
    "quality_score",
    "lang_id",
    "fingerprint",
    "with_text_features",
]

# tiny deterministic stopword lists for the n-gram/lexicon language
# heuristic (public common-word lists)
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "es": ["el", "la", "de", "que", "los", "en", "un", "por", "con", "una"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "auf", "den"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "que", "pour", "qui"],
}


def _tokens(col: Column) -> Column:
    """Whitespace tokenization; empty string → empty array."""
    t = F.split(F.trim(col), r"\s+")
    return F.when(F.trim(col) == "", F.array().cast("array<string>")).otherwise(t)


def token_count(col) -> Column:
    """Whitespace token count (BPE-ish subword estimate ≈ chars/4 is
    exposed separately in quality_features)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(_tokens(c)).cast("long")


def quality_features(col) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio feature set."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("long")
    toks = _tokens(c)
    n_tokens = F.size(toks).cast("long")
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    en_stop = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, F.lower(t))))
    avg_tok_len = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_tokens_bpe_est": F.ceil(n_chars / 4.0).cast("long"),
        "punct_ratio": F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0),
        "upper_ratio": F.when(n_chars > 0, n_upper.cast("double") / n_chars).otherwise(0.0),
        "digit_ratio": F.when(n_chars > 0, n_digit.cast("double") / n_chars).otherwise(0.0),
        "stopword_ratio": F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(0.0),
        "avg_token_len": avg_tok_len,
    }


def quality_score(col) -> Column:
    """Composite [0,1] quality score: rewards natural length, stopword
    presence, and moderate punctuation. Deterministic, documented
    formula so it can be mirrored in an oracle."""
    f = quality_features(col)
    len_score = F.least(f["n_tokens"].cast("double") / 100.0, F.lit(1.0))
    stop_score = F.least(f["stopword_ratio"] * 5.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - f["punct_ratio"] * 3.0)
    return (0.4 * len_score + 0.4 * stop_score + 0.2 * punct_pen)


def lang_id(col) -> Column:
    """Stopword-lexicon language guess over {en,es,de,fr}; 'und' when no
    stopword hits. O(tokens × lexicon) inside codegen; for real
    pipelines swap in a fastText-style model via mapInPandas."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.transform(_tokens(c), lambda t: F.lower(t))
    scores = []
    for lang, words in _STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        scores.append((lang, F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))))
    best = F.lit("und")
    best_n = F.lit(0)
    for lang, n in scores:
        cond = n > best_n
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, n).otherwise(best_n)
    return best


def fingerprint(col) -> Column:
    """Document fingerprint: md5 of casefolded, punctuation-stripped,
    whitespace-collapsed text — stable across formatting variants and
    reproducible in any SQL engine (md5 is universal)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), r"[^\w\s]", ""), r"\s+", " "))
    return F.md5(norm)


def with_text_features(df: DataFrame, text_col: str = "text", prefix: str = "") -> DataFrame:
    """Append the full text-analysis feature set (one projection, no shuffle)."""
    feats = quality_features(text_col)
    out = df
    for name, expr in feats.items():
        out = out.withColumn(f"{prefix}{name}", expr)
    return (
        out.withColumn(f"{prefix}quality_score", quality_score(text_col))
        .withColumn(f"{prefix}lang_guess", lang_id(text_col))
        .withColumn(f"{prefix}fingerprint", fingerprint(text_col))
    )
