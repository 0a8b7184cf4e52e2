"""Text-analysis operators for training-data pipelines (SURVEY.md §2 M3):
tokenization, quality scoring, language-ID heuristic, token counting,
document fingerprinting. All pure Column expressions (JVM-side, codegen)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EN_STOP = ["the", "a", "of", "to", "and", "in", "is", "for", "on", "with"]
FR_STOP = ["le", "la", "de", "et", "les", "des", "un", "une", "du", "en"]
ES_STOP = ["el", "la", "de", "y", "los", "las", "un", "una", "del", "en"]


def tokens_expr(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), "\\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens_expr(text)).cast("bigint")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: count of word/number/punctuation units — a regex
    approximation of subword segmentation for budgeting token costs.
    Unit class is Unicode ``\\p{L}\\p{N}`` (valid in both Java regex and
    RE2, so the oracle mirrors it): an ASCII-only ``[a-z0-9]`` class split
    every Arabic letter into its own unit, overstating Arabic/mixed
    documents' token budget by roughly their character count — useless for
    cross-language budget comparison in an Arabic-NLP engine."""
    # split BEFORE and AFTER every non-alnum char (lookahead + lookbehind)
    # so a punctuation char never glues to the following run — the oracle
    # counts via extraction ('[\\p{L}\\p{N}]+|[^\\p{L}\\p{N}\\s]'), and a
    # before-only split made "don't" 2 units vs the oracle's 3
    units = F.filter(
        F.split(
            F.lower(text),
            "(?=[^\\p{L}\\p{N}])|(?<=[^\\p{L}\\p{N}])|\\s+",
        ),
        lambda t: F.trim(t) != "",
    )
    return F.size(units).cast("bigint")


def _hit_count(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(words))).cast("bigint")


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    toks = tokens_expr(text)
    # `is not None`, not truthiness: an explicitly EMPTY stopword list
    # means "no stopwords" (ratio 0.0 everywhere), not "use English"
    words = stopwords if stopwords is not None else EN_STOP
    return F.round(
        _hit_count(toks, words) / F.greatest(F.size(toks), F.lit(1)), 6
    )


def mean_token_len(text: Column) -> Column:
    toks = tokens_expr(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), 6)


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: rewards moderate length, plausible mean
    token length, and some stopword mass (the classic Gopher-style cheap
    filters, public heuristics)."""
    toks = tokens_expr(text)
    n = F.size(toks)
    len_ok = F.when((n >= 10) & (n <= 1000), 1.0).otherwise(0.5)
    mtl = mean_token_len(text)
    mtl_ok = F.when((mtl >= 3) & (mtl <= 12), 1.0).otherwise(0.5)
    sw = stopword_ratio(text)
    sw_ok = F.when(sw >= 0.05, 1.0).otherwise(0.6)
    return F.round(len_ok * mtl_ok * sw_ok, 6)


def lang_id(text: Column) -> Column:
    """Stopword-vote language ID over {en,fr,es}; ties prefer en>fr>es."""
    toks = tokens_expr(text)
    en, fr, es = (
        _hit_count(toks, EN_STOP),
        _hit_count(toks, FR_STOP),
        _hit_count(toks, ES_STOP),
    )
    return (
        F.when((en >= fr) & (en >= es) & (en > 0), F.lit("en"))
        .when((fr >= es) & (fr > 0), F.lit("fr"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )


def fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint: md5 of the sorted distinct token
    set — bag-of-words identity, robust to word order (cheap near-dup key)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens_expr(text))), " "))
