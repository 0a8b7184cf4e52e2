"""Distributed byte-pair-encoding (BPE) subword tokenization.

Sennrich, Haddow & Birch 2016 ("Neural Machine Translation of Rare
Words with Subword Units"): learn a vocabulary of character-sequence
merges from corpus statistics, then segment text into subword units. An
LLM-data pipeline needs this twice — to BUDGET corpora in real tokens
(the M7 token_budget_mix / packing family consumes per-doc token
counts) and to pre-tokenize exports.

Spark-first shape, and why it scales:

- **Training never rescans the corpus.** The classic first step — a
  word-frequency table (``groupBy(word).count()``) — is the ONLY pass
  over the documents; every merge iteration works on that table, whose
  size is the corpus *vocabulary* (maybe 10⁷-10⁸ rows at 100 TB), not
  the corpus. Pair counting is an explode + combiner-friendly groupBy;
  the argmax pair is a one-row TakeOrdered collect; applying the merge
  is a pure left-fold Column expression (no UDF) rewriting only the
  symbol arrays. ``localCheckpoint`` truncates the per-iteration
  lineage so iteration t doesn't replay t-1's plan.
- **Encoding is the Arrow path with a word cache.** Applying 30k merge
  ranks per word is inherently iterative — the one place Python is
  sanctioned (mapInPandas, batch-columnar). Words repeat massively, so
  the encoder memoizes per-word segmentations per batch-partition; the
  merge table broadcasts as a plain rank dict.

Greedy semantics match the reference implementation exactly: one
training merge replaces non-overlapping occurrences left-to-right
(the fold does this by construction); encoding repeatedly applies the
LOWEST-rank applicable merge (ties impossible — ranks are unique).
Determinism: the argmax pair tie-breaks on (count desc, left, right),
so the learned merge sequence is a pure function of the corpus,
independent of partition layout (pinned by pytest).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textanalysis import tokens_expr

END = "</w>"  # end-of-word marker (Sennrich's separate final symbol)


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, freq)`` — the single corpus pass BPE training works on."""
    return (
        docs.select(F.explode(tokens_expr(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols(word: Column) -> Column:
    """word → [c₁, c₂, …, cₙ, </w>]."""
    return F.concat(F.split(word, ""), F.array(F.lit(END)))


def _pairs_expr(syms: Column) -> Column:
    """Adjacent symbol pairs as structs, [] for single-symbol words."""
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("left"),
                F.element_at(syms, i + 1).alias("right"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Replace adjacent (left, right) with left+right, greedy
    left-to-right non-overlapping — a pure aggregate fold, no UDF."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _train_bpe_driver(
    freqs: dict[str, int], n_merges: int, min_count: int
) -> list[tuple[str, str, int]]:
    """Exact same semantics as the distributed loop, on a collected
    word-frequency dict — the small-vocabulary fast path (the capped
    k-means-trainer discipline, operators/similarity.py). Tie-break
    parity note: Spark orders strings by UTF-8 bytes; Python compares
    code points; UTF-8 preserves code-point order, so ``min`` over
    ``(−count, left, right)`` agrees with the distributed TakeOrdered."""
    state = {w: list(w) + [END] for w in freqs}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in state.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (left, right), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((left, right, int(cnt)))
        merged = left + right
        for w, syms in state.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                else:
                    out.append(s)
            state[w] = out
    return merges


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
    words: DataFrame | None = None,
    max_driver_words: int | None = 200_000,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns ``[(left, right,
    pair_count_at_merge), …]`` in rank order. Stops early when the best
    remaining pair occurs fewer than ``min_count`` times (weighted by
    word frequency). ``words``: a precomputed :func:`word_freq_table`
    (e.g. persisted across vocab-size experiments).

    Mode selection (the adaptive literal-map / capped-k-means pattern):
    a vocabulary at or below ``max_driver_words`` collects once and
    trains on the driver — every merge iteration otherwise pays two
    cluster jobs of pure scheduling overhead at small scale. Above the
    cap (or with ``max_driver_words=None``) the loop runs distributed:
    pair counts via explode + combiner groupBy, argmax via a one-row
    TakeOrdered, the merge applied as a fold expression. Both modes
    compute the IDENTICAL merge sequence (pinned by pytest)."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    owns_words = words is None
    if owns_words:
        # persist: the mode fence's count and the subsequent read would
        # otherwise each re-run the full corpus scan+aggregation — the
        # single most expensive step of training, paid twice
        words = word_freq_table(docs, text_col).persist()
    try:
        if (
            max_driver_words is not None
            and words.limit(max_driver_words + 1).count() <= max_driver_words
        ):
            freqs = {r["word"]: int(r["freq"]) for r in words.collect()}
            return _train_bpe_driver(freqs, n_merges, min_count)
        return _train_bpe_distributed(words, n_merges, min_count)
    finally:
        if owns_words:
            words.unpersist()


def _train_bpe_distributed(
    words: DataFrame, n_merges: int, min_count: int
) -> list[tuple[str, str, int]]:
    state = words.select(
        _initial_symbols(F.col("word")).alias("syms"), F.col("freq")
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            best = (
                state.select(
                    F.explode(_pairs_expr(F.col("syms"))).alias("p"), "freq"
                )
                .groupBy("p.left", "p.right")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), "left", "right")
                .limit(1)
                .collect()
            )
            if not best or best[0]["cnt"] < min_count:
                break
            left, right, cnt = best[0]["left"], best[0]["right"], best[0]["cnt"]
            merges.append((left, right, int(cnt)))
            nxt = state.select(
                _merge_fold(F.col("syms"), left, right).alias("syms"), "freq"
            ).localCheckpoint(eager=True)
            state.unpersist()
            state = nxt
        return merges
    finally:
        state.unpersist()


def merge_table(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """The learned merges as a frame: (rank, left, right, merged, pair_count)."""
    rows = [
        (r, left, right, left + right, cnt)
        for r, (left, right, cnt) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, pair_count bigint"
    )


def save_bpe(spark, merges: list[tuple[str, str, int]], path: str) -> None:
    """Persist a trained merge table as a parquet artifact (build once /
    serve many — the BM25/ANN index-lifecycle discipline). Overwrite
    semantics: a rebuild replaces the artifact atomically enough for
    batch use; rank order is the contract, re-derived on load."""
    merge_table(spark, merges).write.mode("overwrite").parquet(path)


def load_bpe(spark, path: str) -> list[tuple[str, str, int]]:
    """Load a :func:`save_bpe` artifact back into rank-ordered merges —
    a one-time bounded read (vocabularies are 10⁴-10⁵ rows); encoders
    broadcast the rank dict from here."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    if [r["rank"] for r in rows] != list(range(len(rows))):
        raise ValueError(
            f"corrupt BPE artifact at {path}: ranks are not contiguous "
            "from 0 — retrain or re-save"
        )
    return [(r["left"], r["right"], int(r["pair_count"])) for r in rows]


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference greedy encoder: repeatedly merge the lowest-rank
    applicable pair (the standard BPE inference loop)."""
    syms = list(word) + [END]
    while len(syms) >= 2:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """``(id, bpe_tokens array<string>)`` — Arrow-batched mapInPandas
    with a per-partition word→segmentation memo (natural text repeats
    words heavily, so the iterative merge loop runs once per DISTINCT
    word per partition, not once per occurrence)."""
    ranks = {(left, right): r for r, (left, right, _) in enumerate(merges)}
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(ranks)
    base = docs.select(
        F.col(id_col).alias("id"),
        # NULL text = empty doc (the corpus-wide convention, same as the
        # BM25 avgdl paths): tokens_expr(NULL) is a NULL array, which
        # would arrive in pandas as None and crash the iteration
        F.coalesce(
            tokens_expr(F.col(text_col)), F.array().cast("array<string>")
        ).alias("__toks"),
    )
    id_type = base.schema["id"].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rk = bc.value
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for toks in pdf["__toks"]:
                enc: list[str] = []
                for w in toks:
                    seg = memo.get(w)
                    if seg is None:
                        seg = _encode_word(w, rk)
                        memo[w] = seg
                    enc.extend(seg)
                out.append(enc)
            yield pd.DataFrame({"id": pdf["id"], "bpe_tokens": out})

    return base.mapInPandas(
        run, f"id {id_type}, bpe_tokens array<string>"
    ).withColumnsRenamed({"id": id_col, "bpe_tokens": out_col})
