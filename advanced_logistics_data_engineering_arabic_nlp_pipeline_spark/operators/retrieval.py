"""BM25 full-text retrieval over a document corpus — the lexical
counterpart of the embedding similarity-search family (operators/
similarity.py): score documents against a term query with the classic
Okapi BM25 ranking function (Robertson & Zaragoza 2009, "The
Probabilistic Relevance Framework: BM25 and Beyond") and return the
top-k.

A training-data pipeline reaches for this constantly: "pull every
document about X for a targeted decontamination / eval-set build /
quality audit" is a lexical-ranking query, and at corpus scale it must
run as a scan-prune-aggregate, never a per-document loop.

Scale shape (the point of the design):

- **Prune before the shuffle.** Tokens are exploded and immediately
  filtered to the query's terms inside the same whole-stage-codegen
  span — non-matching tokens (the overwhelming mass; a query is a
  handful of terms against a 100 TB vocabulary) never leave the scan
  stage, so the only rows that shuffle are (doc, query-term) hits.
- **One corpus scan for the per-doc work.** Document length is computed
  next to the explode on the same scan; the (N, avgdl) corpus constants
  come from a separate aggregate-only pass whose plan prunes to the
  text column and map-side-combines to a single row, then broadcast —
  at production scale both constants and the per-term document
  frequencies belong in a precomputed stats table (one groupBy('term')
  over the corpus, refreshed with the corpus), which
  :func:`bm25_topk`'s ``term_stats=`` hook accepts.
- **IDF is the Lucene/trec_eval variant** ``ln(1 + (N - df + 0.5) /
  (df + 0.5))`` — monotone in rarity and never negative, so a
  stop-word-like query term degrades to ~0 contribution instead of
  penalizing documents (the classic BM25 negative-IDF footgun).

The reference engine has no retrieval surface; this is a
beyond-reference capability in the same family as the ANN operators
(SURVEY.md M2).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textanalysis import tokens_expr

# re.ASCII: Python's default \s is the Unicode class, Java's (the corpus
# side, tokens_expr) is ASCII-only — without the flag a query containing
# a non-breaking space splits differently from the document that holds
# the same bytes and the term never matches (r10 self-review)
_TOKEN_SPLIT = re.compile(r"\s+", re.ASCII)


def query_terms(query: str) -> list[str]:
    """The query-side tokenization — the SAME lowercase whitespace split
    the corpus side uses (:func:`..textanalysis.tokens_expr`, Java ASCII
    ``\\s``, matched here via ``re.ASCII``), deduped, order-preserving.
    Ranking is only meaningful when both sides share one tokenizer."""
    seen: dict[str, None] = {}
    for t in _TOKEN_SPLIT.split(query.lower()):
        if t:
            seen.setdefault(t, None)
    return list(seen)


def bm25_score_expr(
    tf: Column, dl: Column, idf: Column, avgdl: Column, k1: float, b: float
) -> Column:
    """Per-(doc, term) Okapi BM25 contribution: ``idf * tf*(k1+1) /
    (tf + k1*(1 - b + b*dl/avgdl))``. Pure arithmetic — stays inside
    whole-stage codegen."""
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def bm25_topk_batch(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    consts: DataFrame | None = None,
) -> DataFrame:
    """BM25 for a TABLE of queries in one pass — the production serve
    shape (the ANN operators' probe-set discipline applied to lexical
    retrieval): ``(query_id, id, score, n_matched)``, top-``k`` per
    query, deterministic ``(score DESC, id)`` order within each.

    Scale shape: the query side tokenizes with the SAME corpus
    expression (:func:`..textanalysis.tokens_expr` — one tokenizer by
    construction, no Python/Java \\s mismatch possible) and broadcasts
    its distinct ``(query_id, term)`` rows; the corpus explode joins
    that broadcast INSIDE the scan stage, so — exactly like the
    single-query isin prune — only tokens some query mentions survive
    to the shuffle. Document frequency is computed per TERM over the
    distinct (doc, term) hits (a corpus property — shared by every
    query that uses the term), and the final top-k is a window over
    ``query_id`` (the small side). Same round-6 + decimal-sum score
    determinism as :func:`bm25_topk`.

    Blank queries: a query whose text tokenizes to ZERO terms (empty /
    whitespace-only / NULL) produces no hit rows and is therefore ABSENT
    from the output — unlike :func:`bm25_topk`, which raises
    ``ValueError`` for the same input. The batch path stays lazy (no
    driver-side scan of the query table to pre-validate), so the
    omission is the documented contract; callers needing the single-path
    strictness can assert ``output.select(query_id).distinct()`` covers
    their query ids, or pre-filter with
    ``F.size(tokens_expr(col)) > 0``."""
    from pyspark.sql import Window

    from ..functions.coercion import dsum

    q_terms = queries.select(
        F.col(query_id_col),
        F.explode(
            F.array_distinct(tokens_expr(F.col(query_text_col)))
        ).alias("term"),
    )
    toks = tokens_expr(F.col(text_col))
    hits = docs.select(
        F.col(id_col),
        F.size(toks).alias("__dl"),
        F.explode(toks).alias("term"),
    ).join(F.broadcast(q_terms), "term")
    tf = hits.groupBy(query_id_col, id_col, "term", "__dl").agg(
        F.count("*").alias("tf")
    )
    # df is per TERM over distinct docs (query-independent): derive from
    # the pruned hits, deduped across queries sharing a term
    term_stats = (
        tf.select("term", id_col)
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df_docs"))
    )
    if consts is None:
        consts = docs.agg(
            F.count("*").alias("__n_docs"),
            # NULL text is an EMPTY document (length 0, counted) — the
            # durable index path's sum/count semantics; a bare avg(size)
            # SKIPS null sizes and scores the same corpus differently
            # depending on which path built the stats (r11 self-review)
            F.avg(F.coalesce(F.size(toks), F.lit(0))).alias("__avgdl"),
        )
    idf = F.log(
        1.0
        + (F.col("__n_docs") - F.col("df_docs") + 0.5)
        / (F.col("df_docs") + 0.5)
    )
    scored = (
        tf.join(F.broadcast(term_stats), "term")
        .crossJoin(F.broadcast(consts))
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.round(
                bm25_score_expr(
                    F.col("tf").cast("double"),
                    F.col("__dl").cast("double"),
                    idf,
                    F.col("__avgdl"),
                    k1,
                    b,
                ),
                6,
            ).alias("__contrib"),
        )
    )
    per_doc = scored.groupBy(query_id_col, id_col).agg(
        dsum(F.col("__contrib")).alias("score"),
        F.count("*").alias("n_matched"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        per_doc.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
        .orderBy(query_id_col, F.desc("score"), id_col)
    )


def _bm25_batch_stats(
    docs: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """One delta's index rows: ``(term, df_docs)`` + the MERGEABLE
    constants ``(__n_docs, __total_dl)`` — token-count SUM, not the
    average, so increments recompose the union's exact avgdl
    (``Σ total_dl / Σ n_docs``) without ever re-reading old batches'
    text."""
    toks = tokens_expr(F.col(text_col))
    exploded = docs.select(
        F.col(id_col), F.explode(F.array_distinct(toks)).alias("term")
    )
    term_stats = exploded.groupBy("term").agg(F.count("*").alias("df_docs"))
    consts = docs.agg(
        F.count("*").alias("__n_docs"),
        F.coalesce(F.sum(F.size(toks)), F.lit(0)).cast("bigint").alias(
            "__total_dl"
        ),
    )
    return term_stats, consts


def build_bm25_index(
    docs: DataFrame,
    path: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """The build-once-serve-many statistics for BM25 at corpus scale —
    ``(term_stats, consts)``: the full-vocabulary ``(term, df_docs)``
    document-frequency table and the one-row ``(__n_docs, __avgdl)``
    corpus constants. One explode + one groupBy over one corpus scan for
    the vocabulary (combiner-friendly: a term's count is one key), one
    aggregate-only scan for the constants.

    With ``path``, both land as parquet under the INCREMENTAL layout
    (``<path>/terms/batch=0``, ``<path>/consts/batch=0`` — per-batch
    ``(term, df_docs)`` deltas plus mergeable ``(__n_docs,
    __total_dl)`` totals, the exact_increment/neardup_increment index
    discipline) and the merged view is re-read via
    :func:`load_bm25_index` — the durable shape the ANN index lifecycle
    uses (similarity.build_pq_index): the corpus is scanned at BUILD
    time, never at serve time, serve-side term lookups prune the terms
    table by query term straight down to the parquet scan, and corpus
    growth appends deltas through :func:`bm25_index_add` instead of a
    full rebuild. A rebuild over an EXISTING index dir deletes the whole
    ``terms``/``consts`` trees first — batch=0 alone would silently merge
    with stale delta partitions from earlier :func:`bm25_index_add`
    calls, double-counting their documents (r11 self-review)."""
    if path is not None:
        spark = docs.sparkSession
        term_stats, consts = _bm25_batch_stats(docs, text_col, id_col)
        base = path.rstrip("/")
        jvm = spark._jvm
        fs_path = jvm.org.apache.hadoop.fs.Path(base)
        fs = fs_path.getFileSystem(spark._jsc.hadoopConfiguration())
        for sub in ("terms", "consts"):
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{base}/{sub}"), True)
        term_stats.write.mode("overwrite").parquet(f"{base}/terms/batch=0")
        consts.coalesce(1).write.mode("overwrite").parquet(
            f"{base}/consts/batch=0"
        )
        return load_bm25_index(spark, path)
    toks = tokens_expr(F.col(text_col))
    exploded = docs.select(
        F.col(id_col), F.explode(F.array_distinct(toks)).alias("term")
    )
    term_stats = exploded.groupBy("term").agg(F.count("*").alias("df_docs"))
    consts = docs.agg(
        F.count("*").alias("__n_docs"),
        F.avg(F.coalesce(F.size(toks), F.lit(0))).alias("__avgdl"),
    )
    return term_stats, consts


def bm25_index_add(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_id: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Append a corpus DELTA to a durable BM25 index — the lexical index
    joins the nightly-delta story (VERDICT r10 #3): new documents'
    ``(term, df_docs)`` counts and ``(__n_docs, __total_dl)`` totals land
    as ``batch=<id>`` partitions; :func:`load_bm25_index` SUMS across
    batches, which is exact because df and the avgdl numerator/denominator
    are all additive over DISJOINT document sets (the increment contract
    shared with the dedup increments: each document enters the index
    once — run the delta through exact_increment first if re-delivery is
    possible).

    Discipline mirrors :func:`~.curation.scrub_boilerplate_increment`:
    ``batch_id`` defaults past every id written in EITHER dir (a
    half-written batch is taken; re-run it explicitly to repair);
    explicit ``batch_id`` makes a re-run idempotent (per-batch overwrite).
    The two writes are not atomic — a crash between them leaves a batch
    that :func:`load_bm25_index` EXCLUDES (complete-in-both-dirs reads:
    serving with the terms half but not its doc mass would skew idf for
    every query) until the same delta re-runs with the same id. Single
    writer at a time per index. Returns the merged ``(term_stats,
    consts)`` view over the updated index."""
    from ..streaming.pipeline import _fs_batch_ids

    base = path.rstrip("/")
    terms_ids = set(_fs_batch_ids(docs.sparkSession, f"{base}/terms"))
    consts_ids = set(_fs_batch_ids(docs.sparkSession, f"{base}/consts"))
    if not (terms_ids | consts_ids) and _legacy_bm25_frames(
        docs.sparkSession, base
    ) is not None:
        # a pre-r11 flat artifact stores the already-divided __avgdl, not
        # the mergeable totals — appending to it would mix incompatible
        # constants; it stays readable (load_bm25_index) but not growable
        raise ValueError(
            f"{base!r} holds a legacy flat BM25 index (pre-incremental "
            "layout) — rebuild it once with build_bm25_index(path=...) "
            "to migrate, then append deltas"
        )
    if batch_id is None:
        batch_id = max(terms_ids | consts_ids, default=-1) + 1
    term_stats, consts = _bm25_batch_stats(docs, text_col, id_col)
    term_stats.write.mode("overwrite").parquet(
        f"{base}/terms/batch={batch_id}"
    )
    consts.coalesce(1).write.mode("overwrite").parquet(
        f"{base}/consts/batch={batch_id}"
    )
    return load_bm25_index(docs.sparkSession, path)


def _legacy_bm25_frames(
    spark, base: str
) -> tuple[DataFrame, DataFrame] | None:
    """Read a pre-r11 FLAT BM25 artifact (``<base>/terms`` /
    ``<base>/consts`` parquet files with the final ``(__n_docs,
    __avgdl)`` row, no ``batch=`` partitions) — returns None when the
    layout doesn't match. Keeps r10-built indexes readable after the
    incremental re-layout; they can't grow (see :func:`bm25_index_add`'s
    migration error) but they serve."""
    try:
        terms = spark.read.parquet(f"{base}/terms")
        consts = spark.read.parquet(f"{base}/consts")
    except Exception:
        return None
    if set(terms.columns) >= {"term", "df_docs"} and "__avgdl" in consts.columns:
        return terms, consts
    return None


def load_bm25_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Re-open a durable BM25 index as the merged ``(term_stats,
    consts)`` serve view: per-term df SUM over complete batches and the
    one-row ``(__n_docs, __avgdl)`` with avgdl recomposed from the summed
    totals. Only batches present in BOTH dirs are read (see
    :func:`bm25_index_add`). The per-term aggregation stays
    combiner-friendly and the serve path's term-prune filter still
    reaches the parquet scan (filter on ``term`` below the groupBy)."""
    from ..streaming.pipeline import _fs_batch_ids

    base = path.rstrip("/")
    complete = sorted(
        set(_fs_batch_ids(spark, f"{base}/terms"))
        & set(_fs_batch_ids(spark, f"{base}/consts"))
    )
    if not complete:
        legacy = _legacy_bm25_frames(spark, base)
        if legacy is not None:
            return legacy
        raise ValueError(
            f"no complete (terms + consts) batches under {base!r} — build "
            "the index with build_bm25_index(path=...) first"
        )
    terms = (
        spark.read.option("basePath", f"{base}/terms")
        .parquet(f"{base}/terms")
        .filter(F.col("batch").isin(complete))
        .groupBy("term")
        .agg(F.sum("df_docs").alias("df_docs"))
    )
    consts = (
        spark.read.option("basePath", f"{base}/consts")
        .parquet(f"{base}/consts")
        .filter(F.col("batch").isin(complete))
        .agg(
            F.sum("__n_docs").alias("__n_docs"),
            (
                F.sum("__total_dl").cast("double") / F.sum("__n_docs")
            ).alias("__avgdl"),
        )
    )
    return terms, consts


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    term_stats: DataFrame | None = None,
    consts: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25 — ``(id, score,
    n_matched)`` ordered best-first with a deterministic id tiebreak.

    ``term_stats`` / ``consts``: the precomputed corpus statistics from
    :func:`build_bm25_index` — the production path at 100 TB (build once
    per corpus version, serve many queries; the full-vocabulary stats
    table is pruned to the query's terms BEFORE the broadcast, a filter
    that pushes down to the parquet scan). When omitted, both are
    derived from ``docs`` in this call (df from the pruned explode,
    constants from an aggregate-only scan). The derived-df shortcut is
    EXACT because BM25's df counts only documents containing the term —
    which is precisely the set the pruned explode retains.

    Scoring: per-(doc, term) contributions via :func:`bm25_score_expr`
    summed per doc; ``n_matched`` (how many distinct query terms hit)
    comes free from the same aggregation. Contributions round to 6 dp
    and sum via the decimal cast, so the score is reproducible
    run-to-run and engine-to-engine regardless of partition order."""
    qterms = query_terms(query)
    if not qterms:
        raise ValueError("query tokenizes to zero terms")

    toks = tokens_expr(F.col(text_col))
    # one scan: doc length beside the explode; the isin filter runs in
    # the same codegen span as the explode, so only query-term hits
    # survive the stage
    hits = (
        docs.select(
            F.col(id_col),
            F.size(toks).alias("__dl"),
            F.explode(toks).alias("term"),
        )
        .where(F.col("term").isin(qterms))
    )
    tf = hits.groupBy(id_col, "term", "__dl").agg(F.count("*").alias("tf"))

    if term_stats is None:
        # tf is one row per (doc, term) — count(*) IS the document
        # frequency restricted to query terms, the only ones BM25 needs
        term_stats = tf.groupBy("term").agg(F.count("*").alias("df_docs"))
    else:
        # full-vocabulary stats table: prune to the query's terms BEFORE
        # broadcasting (the isin filter pushes down to the index scan)
        term_stats = term_stats.where(F.col("term").isin(qterms))

    if consts is None:
        consts = docs.agg(
            F.count("*").alias("__n_docs"),
            F.avg(F.coalesce(F.size(toks), F.lit(0))).alias("__avgdl"),
        )

    idf = F.log(
        1.0
        + (F.col("__n_docs") - F.col("df_docs") + 0.5)
        / (F.col("df_docs") + 0.5)
    )
    scored = (
        tf.join(F.broadcast(term_stats), "term")
        .crossJoin(F.broadcast(consts))
        .select(
            F.col(id_col),
            bm25_score_expr(
                F.col("tf").cast("double"),
                F.col("__dl").cast("double"),
                idf,
                F.col("__avgdl"),
                k1,
                b,
            ).alias("__contrib"),
        )
    )
    # per-term contributions round to 6 dp, then sum through the
    # decimal cast — exact and order-independent across partitions (the
    # repo's cross-engine float-sum discipline, functions/coercion.dsum)
    from ..functions.coercion import dsum

    return (
        scored.groupBy(id_col)
        .agg(
            dsum(F.round(F.col("__contrib"), 6)).alias("score"),
            F.count("*").alias("n_matched"),
        )
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Standard IR quality metrics at cutoff ``k`` — Recall@k, MRR@k and
    binary-gain nDCG@k (Järvelin & Kekäläinen 2002) — for a ranked result
    table against a relevance-judgment table, per query.

    ``results``: ``(query_col, id_col, rank_col)`` with rank 1 = best
    (the shape every retrieval operator here emits); ``qrels``:
    ``(query_col, id_col)`` relevant pairs. Output per query that HAS
    judgments: ``(query, n_rel, n_hits, recall, mrr, ndcg)`` round-6,
    zeros when nothing relevant was retrieved.

    Scale shape: one inner join of the rank-pruned results against the
    qrels (both shuffle on query+id — at evaluation scale these are
    top-k lists and bounded judgment sets, not corpora), two
    combiner-friendly groupBys, and the ideal-DCG denominator as a pure
    ``sequence`` fold (≤ k terms). DCG terms round to 8 dp and sum
    through the decimal cast; the fold sides are literal-order identical
    cross-engine — the repo's float discipline, so the metric table
    hash-matches its SQL mirror."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from ..functions.coercion import dsum

    q, d, r = query_col, id_col, rank_col
    judged = qrels.select(q, d).distinct()
    rel_counts = judged.groupBy(q).agg(F.count("*").alias("n_rel"))
    hits = (
        results.where(F.col(r) <= k)
        .join(judged, [q, d])
        .groupBy(q)
        .agg(
            F.count("*").alias("n_hits"),
            F.min(r).alias("__first"),
            dsum(
                F.round(1.0 / F.log2(F.col(r).cast("double") + 1.0), 8), 8
            ).alias("__dcg"),
        )
    )
    ideal_m = F.least(F.col("n_rel"), F.lit(k))
    idcg = F.aggregate(
        F.sequence(F.lit(1), ideal_m),
        F.lit(0.0),
        lambda acc, i: acc + F.round(1.0 / F.log2(i.cast("double") + 1.0), 8),
    )
    return (
        rel_counts.join(hits, q, "left")
        .select(
            q,
            "n_rel",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_rel"), 6
            ).alias("recall"),
            F.round(
                F.coalesce(1.0 / F.col("__first"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("__dcg"), F.lit(0.0)) / idcg, 6
            ).alias("ndcg"),
        )
        .orderBy(q)
    )


def rrf_fuse(
    ranked: list[tuple[str, DataFrame]],
    id_col: str = "doc_id",
    k: int = 10,
    k0: int = 60,
    query_col: str | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of two or
    more ranked retrieval lists — the standard way to combine lexical
    (:func:`bm25_topk`) and dense (operators/similarity) results into one
    hybrid ranking without score calibration.

    ``ranked``: ``[(name, df), ...]`` where each frame carries ``id_col``
    (+ ``query_col`` for the batched shape) and an integer ``rank``
    column, 1 = best. Output: the join keys, one ``{name}_rank`` column
    per input list (NULL where the document missed that list), the fused
    ``rrf_score = Σ 1/(k0 + rank)`` and the final ``rank``, top-``k``
    per query best-first with an id tiebreak.

    Scale shape: fusion is arithmetic over the *top-k lists*, not the
    corpus — each input is already ≤ fusion-depth rows per query, so the
    full-outer joins here touch k·|queries| rows no matter how big the
    corpus behind them is. Joining (rather than union + groupBy-sum)
    keeps the score a fixed-arity expression: the same literal sum of
    ``1/(k0+rank)`` terms on any engine and any partition order, no
    float-accumulation-order hazard. Per-list ranks must be deterministic
    (both component operators tiebreak on id), so the fused ranking is
    reproducible end to end.

    Beyond-reference capability (the reference engine has no retrieval
    surface), completing the M2 family: BM25 and ANN existed separately;
    production RAG/decontamination retrieval serves the fusion."""
    if len(ranked) < 2:
        raise ValueError("rrf_fuse needs at least two ranked lists")
    if k0 < 1:
        raise ValueError("k0 must be >= 1 (RRF dampening constant)")
    names = [name for name, _ in ranked]
    if len(set(names)) != len(names):
        raise ValueError(
            f"list names must be unique (got {names}) — they become the"
            " per-list rank column names"
        )
    keys = ([query_col] if query_col else []) + [id_col]

    def prep(name: str, df: DataFrame) -> DataFrame:
        missing = [c for c in keys + ["rank"] if c not in df.columns]
        if missing:
            raise ValueError(f"list '{name}' lacks columns {missing}")
        return df.select(*keys, F.col("rank").alias(f"{name}_rank"))

    fused = prep(*ranked[0])
    for name, df in ranked[1:]:
        fused = fused.join(prep(name, df), on=keys, how="full_outer")

    # fixed-arity sum: one term per list, 0.0 where the list missed the
    # doc — deterministic regardless of engine or partition order, then
    # rounded to 9 dp so the hash-compared value is exact cross-engine
    contribs = [
        F.coalesce(
            1.0 / (F.lit(float(k0)) + F.col(f"{name}_rank").cast("double")),
            F.lit(0.0),
        )
        for name, _ in ranked
    ]
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    fused = fused.withColumn("rrf_score", F.round(score, 9))

    w = Window.partitionBy(
        *([query_col] if query_col else [F.lit(1)])
    ).orderBy(F.desc("rrf_score"), id_col)
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            *keys,
            *[f"{name}_rank" for name, _ in ranked],
            "rrf_score",
            "rank",
        )
        .orderBy(*keys[:-1], "rank")
    )
