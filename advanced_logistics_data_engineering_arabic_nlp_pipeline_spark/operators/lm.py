"""Corpus language-model scoring — the CCNet-style perplexity quality
signal (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data"): score each document by its cross-entropy
under a language model, then filter/bucket on the score. Production
CCNet uses a KenLM 5-gram; the distributed-shape version here is an
add-alpha-smoothed UNIGRAM model trained on the corpus itself (or any
reference corpus via the ``lm_stats=`` hook) — the model class is
deliberately simple so every step stays a DataFrame expression, but the
pipeline shape (train token stats → broadcast/join log-probs → per-doc
cross-entropy) is exactly what a KenLM-backed variant would distribute.

Scale shape:

- **Training is one explode + one groupBy** on the term key —
  combiner-friendly (a term's count is ONE reduce key), so the shuffle
  moves O(vocab) rows regardless of corpus size. The top-``vocab_size``
  cap bounds the model; everything past the cap scores through the
  single OOV class, so the log-prob table is a bounded artifact that
  broadcasts.
- **Scoring is explode → join(term) → per-doc sum.** With a bounded
  vocabulary the freq table broadcasts (no shuffle of the token rows at
  all); per-token log-probs round to 8 dp and sum through the decimal
  cast (functions/coercion.dsum), so a document's score is bit-stable
  across partitionings and engines.
- **Smoothing is add-alpha over V+1 classes** (the kept vocabulary plus
  one OOV bucket): ``logp(t) = ln((c_t + a) / (T + a*(V+1)))``, OOV gets
  ``c_t = 0``. Total mass T counts ALL corpus tokens (including capped
  ones) so the model is a proper distribution over the class set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.coercion import dsum
from .textanalysis import tokens_expr


def unigram_lm_stats(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int | None = None,
    alpha: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """Train the smoothed unigram model: returns ``(freqs, consts)`` —
    ``(term, logp)`` for the kept vocabulary and a one-row frame with
    ``(__total_tokens, __vocab, __oov_logp)``. ``vocab_size`` keeps the
    top-V terms by count (ties break on term — deterministic); ``None``
    keeps everything (OOV class still exists, for scoring unseen text).
    """
    toks = tokens_expr(F.col(text_col))
    counts = (
        docs.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    if vocab_size is not None:
        kept = counts.orderBy(F.desc("c"), "term").limit(vocab_size)
    else:
        kept = counts
    # T over ALL tokens (capped terms still carry probability mass into
    # the denominator); V = kept classes
    consts = counts.agg(
        F.sum("c").alias("__total_tokens")
    ).crossJoin(kept.agg(F.count("*").alias("__vocab")))
    denom = F.col("__total_tokens") + alpha * (F.col("__vocab") + 1.0)
    consts = consts.withColumn(
        "__oov_logp", F.round(F.log(F.lit(alpha) / denom), 8)
    )
    freqs = (
        kept.crossJoin(F.broadcast(consts.select("__total_tokens", "__vocab")))
        .withColumn(
            "logp",
            F.round(
                F.log(
                    (F.col("c") + alpha)
                    / (
                        F.col("__total_tokens")
                        + alpha * (F.col("__vocab") + 1.0)
                    )
                ),
                8,
            ),
        )
        .select("term", "logp")
    )
    return freqs, consts


def perplexity_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = None,
    alpha: float = 0.5,
    lm_stats: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Per-document cross-entropy + perplexity under the unigram model —
    ``(id, n_tokens, cross_entropy, perplexity)``; empty documents score
    NULL (no tokens to take a mean over) rather than a fake 0.

    ``lm_stats``: pass a prebuilt ``(freqs, consts)`` from
    :func:`unigram_lm_stats` to score against a REFERENCE corpus (the
    CCNet setup scores web text under a Wikipedia-trained model); when
    omitted the model trains on ``docs`` itself (self-perplexity — the
    repetition/outlier signal).

    Per-token log-probs are pre-rounded (8 dp) in the stats table, the
    per-doc sum goes through the decimal cast, and the outputs round to
    6 dp — reproducible at any parallelism, hash-stable cross-engine."""
    freqs, consts = (
        lm_stats
        if lm_stats is not None
        else unigram_lm_stats(docs, text_col, vocab_size, alpha)
    )
    toks = tokens_expr(F.col(text_col))
    term_rows = docs.select(F.col(id_col), F.explode(toks).alias("term"))
    scored = (
        term_rows.join(F.broadcast(freqs), "term", "left")
        .crossJoin(F.broadcast(consts.select("__oov_logp")))
        .select(
            F.col(id_col),
            F.coalesce(F.col("logp"), F.col("__oov_logp")).alias("__lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        dsum(F.col("__lp"), scale=8).alias("__sum_lp"),
    )
    ce = -F.col("__sum_lp") / F.col("n_tokens")
    out = docs.select(id_col).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
        F.round(ce, 6).alias("cross_entropy"),
        F.round(F.exp(ce), 6).alias("perplexity"),
    )
    return out
