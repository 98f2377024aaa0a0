"""Text analysis operators — all native Spark expressions (Catalyst
codegen; zero Python in the hot path) with exact ANSI-SQL oracles.

* token_count        — whitespace tokens + a BPE-ish sub-token estimate
* quality_score      — length / punctuation / stopword-ratio features
* lang_id            — stopword-hit n-gram heuristic over 5 languages
* fingerprint        — md5 of whitespace-normalized lowercase text
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (deterministic heuristic)
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "with"],
    "de": ["der", "und", "die", "ist", "mit"],
    "fr": ["le", "et", "la", "est", "avec"],
    "es": ["el", "y", "la", "es", "con"],
    "zh": ["的", "和", "是", "了", "在"],
}
STOPWORDS_EN = ["the", "a", "of", "and", "is", "to", "in"]


def _tokens(col):
    return F.split(F.trim(col), r"\s+")


def token_count(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (≈ chars/4 per token, lower-bounded by the word count)."""
    toks = _tokens(F.col(text_col))
    return docs.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        F.greatest(
            F.size(toks),
            F.ceil(F.length(F.regexp_replace(F.col(text_col), r"\s+", "")) / F.lit(4)).cast("int"),
        ).cast("long").alias("n_subtokens"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality features + composite score.

    score = mean_token_len ∈ [2,12] scaled − stopword_ratio penalty,
    clipped to [0,1]; short docs (<20 tokens) penalized.
    """
    toks = _tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS_EN)))
    mean_tok = n_chars / F.greatest(n_tok, F.lit(1))
    stop_ratio = stop_hits / F.greatest(n_tok, F.lit(1))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[\p{L}\p{N}\s]", ""))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    score = (
        F.least(F.greatest((mean_tok - 2) / 10, F.lit(0.0)), F.lit(1.0)) * 0.5
        + (F.lit(1.0) - F.least(stop_ratio * 2, F.lit(1.0))) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0))) * 0.2
    )
    score = F.when(n_tok < 20, score * 0.5).otherwise(score)
    return docs.select(
        id_col,
        n_tok.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Predict language by stopword-marker hit counts (argmax, ties by
    language code order — deterministic)."""
    toks = _tokens(F.lower(F.col(text_col)))

    def _hits(words):
        # NB: a two-arg lambda would make F.filter pass the element
        # INDEX as the second argument; bind the word set via closure
        ws = tuple(words)
        return lambda t: t.isin(*ws)

    scores = [
        F.size(F.filter(toks, _hits(ws))).alias(f"s_{lang}")
        for lang, ws in LANG_MARKERS.items()
    ]
    scored = docs.select(id_col, *scores)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):  # earlier langs win ties
        pred = F.when(F.col(f"s_{lang}") == best, F.lit(lang)).otherwise(pred)
    return scored.select(id_col, pred.alias("lang_pred"))


# PII patterns shared by the Spark op and its SQL oracle twin: the
# subset of regex that Java's engine (leftmost-first backtracking) and
# RE2-family engines (leftmost-longest) match IDENTICALLY — character
# classes, bounded repetition, \b anchors; no alternation-order or
# greediness ambiguity, no lookaround, no backrefs.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "cc": r"\b\d{16}\b",
    "phone": r"\+\d{9,15}\b",
}
PII_ORDER = ("email", "ip", "cc", "phone")  # cc before phone: a 16-digit
# run must become [CC], never a phone tail


def pii_scrub(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Training-data PII redaction: replace emails / IPv4s / 16-digit
    card runs / international phone numbers with typed placeholders and
    count each category (counts on the ORIGINAL text, so they are
    independent of replacement order).  Pure native ``regexp_replace``/
    ``regexp_count`` chain — map-only, zero shuffle, codegen'd; at
    100 TB this is a free rider on whatever scan already reads the
    text column."""
    out = F.col(text_col)
    counts = [
        F.regexp_count(F.col(text_col), F.lit(PII_PATTERNS[k])).cast("long")
        .alias(f"n_{k}")
        for k in PII_ORDER
    ]
    for k in PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[k], f"[{k.upper()}]")
    return docs.select(id_col, *counts, out.alias("scrubbed"))


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 over lowercased, whitespace-collapsed
    text — identical in Spark and any SQL engine with md5()."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.select(id_col, F.md5(norm).alias("fingerprint"))
