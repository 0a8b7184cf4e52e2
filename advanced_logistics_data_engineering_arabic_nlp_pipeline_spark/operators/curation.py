"""Corpus-curation operators a large-scale training-data pipeline needs on
top of dedup/similarity: PII redaction, repetition-based quality filtering
(Gopher/C4-style), and eval-set decontamination.

These are value-add operators beyond the reference's own surface (the brief's
LLM-data section); they run over the ``documents`` fixture and each has a
DuckDB oracle in plans/llmdata.py.

Scale shape, in order of appearance:

- PII redaction is pure JVM-side ``regexp_replace`` / ``regexp_count``
  expressions — no UDF, no shuffle, whole-stage-codegen friendly. The
  pattern set is deliberately written in the common Java-regex ∩ RE2
  subset (no lookarounds, no backrefs) so the DuckDB oracle runs the
  LITERAL same patterns.
- Repetition stats are SHUFFLE-FREE: per-doc top-gram mass is a sorted
  run-length scan (``array_sort`` + ``aggregate``, O(n log n) per row,
  JVM-side) instead of the explode → groupBy(doc, gram) → groupBy(doc)
  form, which moves a corpus-scale gram shuffle (per-doc distinct grams
  even after map-side combine). Both compute the same answer (pinned by a
  parity test) and TIE at sf1 local[32] (3.4 s vs 3.2 s — local shuffles
  are nearly free and HOF lambdas are interpreted); the shuffle-free plan
  is the default because on a network-bound cluster its cost stays a
  per-partition scan while the exploded form's shuffle grows with the
  corpus. (The naive ``transform(array_distinct(...))`` counting
  expression is NOT the alternative — it is O(distinct × len) per row and
  melts on a 100k-token document; the sorted-run trick is what makes the
  expression form viable.)
- Decontamination broadcasts the eval-set shingle dictionary (eval sets are
  small — thousands of docs — vs a 100 TB train corpus): the train side
  streams, never shuffles on the join key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingle_rows, shingles_expr, tokens_expr
from .textanalysis import token_count

# ── PII redaction ───────────────────────────────────────────────────────────
# Java-regex ∩ RE2 subset ONLY (both engines must match byte-for-byte):
# character classes, bounded quantifiers and \b — no lookarounds/backrefs.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+\d{9,15}"  # E.164-ish international form
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# (pattern, replacement) in application order. Email first: an address
# contains digits and dots that the later numeric patterns could otherwise
# chew on; counts are nevertheless computed per-pattern on the ORIGINAL
# text (documented contract, mirrored in the oracle).
PII_RULES: list[tuple[str, str]] = [
    (PII_EMAIL_RE, "<EMAIL>"),
    (PII_PHONE_RE, "<PHONE>"),
    (PII_IPV4_RE, "<IP>"),
]


def redact_pii_expr(text: Column) -> Column:
    """Sequentially redact every PII_RULES pattern. Pure expression chain —
    stays inside whole-stage codegen, no Python in the hot path."""
    out = text
    for pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts_exprs(text: Column) -> list[Column]:
    """Per-pattern match counts on the ORIGINAL text, aliased
    n_email / n_phone / n_ip (stable oracle column names)."""
    names = ["n_email", "n_phone", "n_ip"]
    return [
        F.regexp_count(text, F.lit(pat)).alias(name)
        for (pat, _), name in zip(PII_RULES, names)
    ]


def redact_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, redacted, n_email, n_phone, n_ip) per document."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        redact_pii_expr(t).alias("redacted"),
        *pii_counts_exprs(t),
    )


# ── Repetition / quality filtering (Gopher-style) ──────────────────────────

def ngrams_expr(text: Column, n: int) -> Column:
    """ALL word n-grams in order, duplicates preserved (contrast
    :func:`dedup.shingles_expr`, which distincts for set semantics — counts
    need multiplicity). Docs shorter than n tokens yield an empty array.
    Token array bound as a lambda variable so the split runs once per row;
    per-gram body is n unrolled O(1) ``element_at`` lookups, not an
    allocating ``slice`` (see shingles_expr's measured notes on both)."""
    return F.try_element_at(
        F.transform(
            F.array(tokens_expr(text)),
            lambda t: F.when(
                F.size(t) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - (n - 1)),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(t, i + j) for j in range(n)]
                    ),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
        F.lit(1),
    )


# Cutoffs sized against the sf0.01 fixture distribution (measured this
# round: distinct_ratio p5–p95 = 0.31–0.80 median 0.46; top_token_frac
# median 0.09 p95 0.16; top_bigram_frac median 0.033 p95 0.087) so BOTH
# keep outcomes occur at every SF — a filter that never fires is a vacuous
# oracle row. The *shape* follows Gopher's repetition rules (Rae et al.
# 2021, table A1: duplicate-n-gram fraction cutoffs); the constants are
# fixture-calibrated, tunable per-corpus in production.
REPETITION_MIN_DISTINCT_RATIO = 0.40
REPETITION_MAX_TOP_TOKEN_FRAC = 0.12
REPETITION_MAX_TOP_BIGRAM_FRAC = 0.06


def max_run_expr(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array<string> —
    i.e. the multiplicity of the most frequent element — as one
    ``aggregate`` pass (O(n), JVM-side). Empty array → 0. The accumulator
    types ``prev`` as string; other element types need a matching cast."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc repetition metrics + keep flag — one shuffle-free projection.

    Top-gram multiplicity = longest equal-adjacent run of the sorted gram
    array (:func:`max_run_expr`): O(n log n) per row, zero Exchange in the
    physical plan (machine-checked by pytest). At sf1 local[32] this TIES
    the exploded formulation (3.4 s vs 3.2 s, measured best-of-2 — local
    shuffles are nearly free); the reason it is the default is shuffle
    VOLUME at cluster scale: the exploded form ships ~per-doc-distinct
    gram rows (about half the corpus token stream here) across the
    network twice, this form ships nothing.

    Zero-token docs are dropped (matches the explode form, where they
    vanish from the aggregation, and the unnest-based oracle)."""
    idc = F.col(id_col)
    out = df.select(
        idc.alias("id"),
        F.array_sort(tokens_expr(F.col(text_col))).alias("__toks"),
        F.array_sort(ngrams_expr(F.col(text_col), 2)).alias("__bgs"),
    ).where(F.size("__toks") > 0)
    out = out.select(
        "id",
        F.size("__toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("__toks")).cast("long").alias("n_distinct"),
        max_run_expr(F.col("__toks")).alias("top_tok"),
        F.size("__bgs").cast("long").alias("n_bigrams"),
        max_run_expr(F.col("__bgs")).alias("top_bg"),
    )
    distinct_ratio = F.col("n_distinct") / F.col("n_tokens")
    top_token_frac = F.col("top_tok") / F.col("n_tokens")
    # a 0/1-token doc has no bigrams: try_divide(0, 0) → null → 0.0 (the
    # exploded form gets the null from its left join instead; under ANSI
    # mode a plain 0/0 here would throw DIVIDE_BY_ZERO)
    top_bigram_frac = F.coalesce(
        F.try_divide(F.col("top_bg"), F.col("n_bigrams")), F.lit(0.0)
    )
    return out.select(
        "id",
        "n_tokens",
        "n_distinct",
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(top_token_frac, 6).alias("top_token_frac"),
        F.round(top_bigram_frac, 6).alias("top_bigram_frac"),
        (
            (distinct_ratio >= REPETITION_MIN_DISTINCT_RATIO)
            & (top_token_frac <= REPETITION_MAX_TOP_TOKEN_FRAC)
            & (top_bigram_frac <= REPETITION_MAX_TOP_BIGRAM_FRAC)
        ).alias("keep"),
    )


def repetition_keep_expr(text: Column) -> Column:
    """:func:`repetition_stats`' keep flag as ONE Column — the form a
    streaming micro-batch (or any per-row gate) composes without joining
    the stats frame back to the batch (a second scan of the micro-batch
    frame, the double-scan trap). Same tokenizer, same cutoffs;
    equality with the frame form is pytested over fixture + edge docs.
    Zero-token / null docs gate to False (the frame form drops them — a
    gate must reject what the stats would not even score).

    The sorted token and bigram arrays are bound once in the tree (r14,
    textanalysis.bind_once): execution cost is unchanged (ProjectExec
    subexpression elimination already shared the duplicated subtrees —
    see bind_once's measured notes) but the analyzed tree carries one
    split+sort instead of six, which the composed gate plans re-optimize
    on every action."""
    from .textanalysis import bind_once

    bound = F.struct(
        F.array_sort(tokens_expr(text)).alias("t"),
        F.array_sort(ngrams_expr(text, 2)).alias("b"),
    )

    def keep(x: Column) -> Column:
        toks, bgs = x["t"], x["b"]
        n_tokens = F.size(toks).cast("long")
        distinct_ratio = F.size(F.array_distinct(toks)) / n_tokens
        top_token_frac = max_run_expr(toks) / n_tokens
        top_bigram_frac = F.coalesce(
            F.try_divide(max_run_expr(bgs), F.size(bgs).cast("long")),
            F.lit(0.0),
        )
        return F.coalesce(
            F.when(
                n_tokens > 0,
                (distinct_ratio >= REPETITION_MIN_DISTINCT_RATIO)
                & (top_token_frac <= REPETITION_MAX_TOP_TOKEN_FRAC)
                & (top_bigram_frac <= REPETITION_MAX_TOP_BIGRAM_FRAC),
            ),
            F.lit(False),
        )

    return bind_once(bound, keep)


def repetition_stats_exploded(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The explode → two-level-agg formulation of :func:`repetition_stats`,
    kept as the parity reference (tests pin equal output) and for corpora
    with degenerate single-huge-document rows where a per-row sort might
    exceed task memory. Ships ~per-doc-distinct gram rows through two
    shuffles — prefer repetition_stats on a real cluster."""
    idc = F.col(id_col)
    toks = df.select(idc.alias("id"), F.explode(tokens_expr(F.col(text_col))).alias("g"))
    tok_stats = (
        toks.groupBy("id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_tok"),
        )
    )
    bgs = df.select(
        idc.alias("id"), F.explode(ngrams_expr(F.col(text_col), 2)).alias("g")
    )
    bg_stats = (
        bgs.groupBy("id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bg"))
    )
    # left join: a 0/1-token doc has no bigrams; its bigram fraction is 0.
    joined = tok_stats.join(bg_stats, "id", "left")
    distinct_ratio = F.col("n_distinct") / F.col("n_tokens")
    top_token_frac = F.col("top_tok") / F.col("n_tokens")
    top_bigram_frac = F.coalesce(
        F.col("top_bg") / F.col("n_bigrams"), F.lit(0.0)
    )
    return joined.select(
        "id",
        "n_tokens",
        "n_distinct",
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(top_token_frac, 6).alias("top_token_frac"),
        F.round(top_bigram_frac, 6).alias("top_bigram_frac"),
        (
            (distinct_ratio >= REPETITION_MIN_DISTINCT_RATIO)
            & (top_token_frac <= REPETITION_MAX_TOP_TOKEN_FRAC)
            & (top_bigram_frac <= REPETITION_MAX_TOP_BIGRAM_FRAC)
        ).alias("keep"),
    )


# ── Sequence packing (concat-then-chunk) ───────────────────────────────────

def pack_sequences(
    df: DataFrame,
    text_col: str | None,
    id_col: str,
    max_len: int = 512,
    n_shards: int = 8,
    tokens_col: str | None = None,
) -> DataFrame:
    """GPT-style concat-then-chunk packing ledger: documents are laid
    end-to-end in a deterministic order and cut into fixed ``max_len``
    token windows; each doc's row records where its tokens land
    (start_offset within its shard stream, first/last chunk id, whether it
    spans a chunk boundary). This is the position bookkeeping a training
    export needs to materialize packed sequences without ever building
    them driver-side.

    Scale shape: a GLOBAL greedy pack is inherently sequential (every
    offset depends on every prior doc), so production packing shards
    first — ``shard = id % n_shards`` — and packs each shard's stream
    independently: the cumulative sum runs per shard
    (``Window.partitionBy(shard)``), giving n_shards-way parallelism and
    bounded per-task state instead of the single-partition funnel a bare
    ``Window.orderBy`` would create (Spark warns on exactly that plan).
    Chunk ids are globally unique via (shard, chunk_in_shard). At 100 TB,
    n_shards scales with the cluster; determinism holds because shard
    assignment and intra-shard order are pure functions of the id.

    Token counts use the whitespace tokenizer (textanalysis.token_count)
    so the ledger composes with the rest of the text stack — OR, when
    ``tokens_col`` names a pre-tokenized ``array<string>`` column (r12:
    e.g. operators/bpe.encode_bpe output), its length: the ledger then
    bookkeeps REAL tokenizer units, which is what a trainer's packing
    actually counts (``text_col`` is ignored in that mode). Null
    text/array occupies 0 tokens (clamped — non-ANSI ``size(null)`` is
    −1, which would DECREMENT every later offset in the shard)."""
    n_tok = (
        F.size(F.col(tokens_col)).cast("bigint")
        if tokens_col is not None
        else token_count(F.col(text_col))
    )
    d = df.select(
        F.col(id_col).alias("id"),
        F.greatest(F.coalesce(n_tok, F.lit(0)), F.lit(0)).alias("n_tok"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("long").alias("shard"),
    )
    # explicit ROWS frame: the default with orderBy is RANGE, under which
    # duplicate ids in a shard would share one cumulative value and
    # overlap their offset ranges (and diverge from the oracle's frame)
    w = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = (
        d.withColumn("end_off", F.sum("n_tok").over(w))
        .withColumn("start_offset", F.col("end_off") - F.col("n_tok"))
    )
    chunk_first = F.floor(F.col("start_offset") / max_len)
    # last token sits at end_off-1; empty docs occupy no tokens and are
    # pinned to their start chunk so first<=last always holds
    chunk_last = F.when(F.col("n_tok") == 0, chunk_first).otherwise(
        F.floor((F.col("end_off") - 1) / max_len)
    )
    return d.select(
        "id",
        "shard",
        "n_tok",
        "start_offset",
        chunk_first.alias("chunk_first"),
        chunk_last.alias("chunk_last"),
        (chunk_last > chunk_first).alias("spans_boundary"),
    )


def materialize_chunks(
    df: DataFrame,
    text_col: str | None,
    id_col: str,
    max_len: int = 512,
    n_shards: int = 8,
    carry: tuple[str, ...] = (),
    tokens_col: str | None = None,
) -> DataFrame:
    """Materialize the packed training windows :func:`pack_sequences` only
    bookkeeps (VERDICT r5 "Next round" #4): one row per (chunk, doc) SLICE
    — which of the doc's tokens land in that chunk and the slice text
    itself. Concatenating slices per chunk in ``pos_in_chunk`` order
    yields the fixed-``max_len`` training sequence; concatenating chunks
    per shard reconstructs the shard's token stream exactly
    (invariant-pytested).

    Scale shape: the same per-shard cumulative-sum window as the ledger
    (n_shards-way parallel, no global funnel), then a pure-expression
    explode of ``sequence(chunk_first, chunk_last)`` and an
    ``F.slice`` of the doc's token array — the token arrays never leave
    their partition and nothing is assembled driver-side. A doc
    contributes chunk_last−chunk_first+1 rows (usually 1-2); empty docs
    occupy no tokens and emit no slice.

    Columns: chunk_uid (globally unique: chunk_in_shard·n_shards+shard),
    shard, chunk_in_shard, id, token_start/token_end (half-open, within
    the DOC), pos_in_chunk (where the slice begins inside the chunk),
    chunk_text (the slice, space-joined lowercase whitespace tokens —
    the tokenizer the whole text stack shares), plus any ``carry``
    columns (per-doc metadata riding along — avoids re-joining the input
    subtree, which would recompute it).

    ``tokens_col`` (r12): chunk over a pre-tokenized ``array<string>``
    column instead of whitespace words — the BPE-token-aware export
    shape (VERDICT r11 Next-round #1): a trainer packs tokenizer UNITS,
    not words, so the 512-unit windows cut real token ids' worth of
    text. ``text_col`` is ignored in that mode; every offset/slice
    invariant holds over the provided units verbatim (chunk_text is the
    space-joined unit slice — with the ``</w>`` markers intact for BPE,
    so per-shard streams reconstruct losslessly)."""
    # A carry column named like an internal working column would be
    # silently shadowed mid-plan; one named like an output column would
    # produce duplicate/ambiguous columns downstream (ADVICE r6). Reject
    # at entry instead of emitting a corrupt frame.
    reserved = {
        "id", "shard", "chunk", "n_tok", "end_off", "start_offset",
        "__toks", "chunk_uid", "chunk_in_shard", "token_start",
        "token_end", "pos_in_chunk", "chunk_text",
    }
    bad = sorted(set(carry) & reserved)
    if bad:
        raise ValueError(
            f"carry columns {bad} collide with materialize_chunks'"
            f" internal/output column names {sorted(reserved)}; rename"
            f" them before chunking"
        )
    toks = (
        F.col(tokens_col)
        if tokens_col is not None
        else tokens_expr(F.col(text_col))
    )
    d = df.select(
        F.col(id_col).alias("id"),
        toks.alias("__toks"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("long").alias("shard"),
        *[F.col(c) for c in carry],
    ).withColumn(
        "n_tok",
        F.greatest(
            F.coalesce(F.size("__toks").cast("bigint"), F.lit(0)), F.lit(0)
        ),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = (
        d.withColumn("end_off", F.sum("n_tok").over(w))
        .withColumn("start_offset", F.col("end_off") - F.col("n_tok"))
        .filter(F.col("n_tok") > 0)
        .withColumn(
            "chunk",
            F.explode(
                F.sequence(
                    F.floor(F.col("start_offset") / max_len),
                    F.floor((F.col("end_off") - 1) / max_len),
                )
            ),
        )
    )
    tok_start = F.greatest(
        F.col("chunk") * max_len - F.col("start_offset"), F.lit(0)
    ).cast("long")
    tok_end = F.least(
        F.col("n_tok"), (F.col("chunk") + 1) * max_len - F.col("start_offset")
    ).cast("long")
    return d.select(
        (F.col("chunk") * n_shards + F.col("shard")).alias("chunk_uid"),
        "shard",
        F.col("chunk").alias("chunk_in_shard"),
        "id",
        tok_start.alias("token_start"),
        tok_end.alias("token_end"),
        F.greatest(F.col("start_offset") - F.col("chunk") * max_len, F.lit(0))
        .cast("long")
        .alias("pos_in_chunk"),
        F.array_join(
            F.slice(
                "__toks",
                (tok_start + 1).cast("int"),
                (tok_end - tok_start).cast("int"),
            ),
            " ",
        ).alias("chunk_text"),
        *[F.col(c) for c in carry],
    )


# ── Eval-set decontamination ────────────────────────────────────────────────

def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Flag training docs sharing any k-token shingle with the eval set.

    The standard pre-training hygiene step: an eval example leaking into the
    train corpus inflates benchmark scores. Shingling matches the dedup
    family (distinct k-grams, whole-text fallback for short docs) so the
    contamination definition composes with the Jaccard ledger.

    Scale shape: the eval shingle DICTIONARY is distinct-ed and broadcast —
    eval sets are small and bounded while train is the 100 TB side, so the
    train scan streams map-side with zero shuffle on the join key; the only
    shuffle is the per-doc count aggregation, keyed by doc id. Returns every
    train doc (left join): zero-hit docs carry n_contam = 0, contaminated =
    false."""
    ev = F.broadcast(
        eval_df.select(F.explode(shingles_expr(F.col(text_col), k)).alias("sh"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    tr = shingle_rows(train, text_col, id_col, k)
    hits = (
        tr.join(ev, "sh", "left")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_shingles"),
            # count(hit) counts non-null ⇒ matched shingles only
            F.count("hit").alias("n_contam"),
        )
    )
    return hits.select(
        "id",
        "n_shingles",
        "n_contam",
        F.round(F.col("n_contam") / F.col("n_shingles"), 6).alias("contam_frac"),
        (F.col("n_contam") > 0).alias("contaminated"),
    )


# ── boilerplate scrub (corpus-frequency segment removal) ────────────────────
# CCNet / RefinedWeb-style line-level dedup: a line (nav menu, cookie
# banner, footer) that appears in a large fraction of DOCUMENTS is template
# boilerplate, not content — remove the line, keep the document. This is
# the segment-granularity complement of the doc-level dedup family: exact
# dedup drops whole duplicate documents; this drops the duplicated PARTS
# of otherwise-unique documents.


def scrub_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    delim: str = "\n+",
    join_sep: str = "\n",
    min_doc_frac: float = 0.01,
    min_docs: int = 2,
    min_seg_chars: int = 1,
) -> DataFrame:
    r"""Remove segments (lines/paragraphs) that occur in too many documents.

    ``delim`` is a JAVA REGEX, not a literal (deliberate: the default
    ``\n+`` collapses blank-line runs; pass ``[.!?]\s*`` for a crude
    sentence-level scrub) — escape metacharacters for literal delimiters.

    A segment is dropped from every document when its normalized form
    (lower, whitespace-squeeze, trim) appears in at least
    ``max(min_docs, ceil(min_doc_frac * n_docs))`` DISTINCT documents;
    segments shorter than ``min_seg_chars`` after normalization are never
    counted and never dropped (an empty or one-char line is structure, not
    boilerplate — and because equal norms have equal length, a short
    segment can never collide with a dropped one, so the rebuild join
    needs no eligibility predicate). Surviving segments are rejoined in
    original order with ``join_sep`` (canonical separator: a ``\\n+`` run
    in the input becomes one ``\\n`` — documented normalization, mirrored
    by the oracle).

    Output: ``id_col``, scrubbed ``text_col`` (empty string when every
    segment was boilerplate — the quality gate downstream kills those),
    ``n_segs``, ``n_dropped``. Other input columns are not carried — join
    back on ``id_col`` (the frame is one row per input document, pinned
    by pytest).

    100 TB shape: segment occurrences shuffle as 16-byte md5 fingerprints,
    never as text — one (fp, doc) distinct + one map-side-combined count
    per fp; a boilerplate fp appearing in half the corpus is ONE count
    key (combiner-friendly), not a collected group. The corpus size
    reaches the threshold comparison as a broadcast one-row frame (no
    driver collect in the plan). The drop set joins back unhinted — it is
    data-dependent (#segments with df ≥ threshold is bounded by
    occurrences/threshold), so AQE picks broadcast when it is small and a
    shuffled join when it is not, the same discipline as the winnow hot
    set. Per-document segment reassembly is a collect_list bounded by the
    longest single document (the materialize_chunks bound), not by any
    corpus-wide key."""
    segs = _segment_frame(df, text_col, id_col, delim, min_seg_chars)
    total = df.select(F.count(F.lit(1)).alias("_n_docs"))
    drop_set = (
        _seg_df_counts(segs, id_col)
        .crossJoin(F.broadcast(total))
        .filter(F.col("_df") >= _boiler_threshold(min_docs, min_doc_frac, "_n_docs"))
        .select("_fp", F.lit(True).alias("_drop"))
    )
    return _reassemble(segs.join(drop_set, "_fp", "left"), text_col, id_col, join_sep)


def _segment_frame(
    df: DataFrame, text_col: str, id_col: str, delim: str, min_seg_chars: int
) -> DataFrame:
    """(id, _pos, _seg, _fp, _elig): one row per segment, fingerprinted on
    the normalized form (lower/trim/squeeze), eligibility by norm length."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    # squeeze FIRST (tab/CR/newline runs become one space), then the
    # space-only trim — trim-before-squeeze leaves a residual edge space
    # when a segment ends in \r (CRLF corpora) or \t, and the norm would
    # diverge from the DuckDB mirror and the documented contract (r8
    # review finding). The class is the ASCII subset shared by Java, RE2
    # and Python (\v\f deliberately excluded — Java \s ⊃ RE2 \s).
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("_seg")), "[ \t\n\r]+", " ")
    )
    return (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(text, delim)).alias("_pos", "_seg"),
        )
        .withColumn("_fp", F.md5(norm))
        .withColumn("_elig", F.length(norm) >= min_seg_chars)
    )


def _seg_df_counts(segs: DataFrame, id_col: str) -> DataFrame:
    """(_fp, _df): distinct-document frequency per eligible segment."""
    return (
        segs.filter(F.col("_elig"))
        .select("_fp", id_col)
        .distinct()
        .groupBy("_fp")
        .agg(F.count(F.lit(1)).alias("_df"))
    )


def _boiler_threshold(min_docs: int, min_doc_frac: float, n_docs_col: str):
    return F.greatest(
        F.lit(min_docs).cast("bigint"),
        F.ceil(F.lit(min_doc_frac) * F.col(n_docs_col)).cast("bigint"),
    )


def _reassemble(
    marked: DataFrame, text_col: str, id_col: str, join_sep: str
) -> DataFrame:
    """Rebuild one row per document from a segment frame carrying a
    nullable ``_drop`` flag: kept segments rejoin in original order."""
    kept_struct = F.when(
        F.col("_drop").isNull(), F.struct(F.col("_pos"), F.col("_seg"))
    )
    return marked.groupBy(id_col).agg(
        F.coalesce(
            F.array_join(
                F.transform(
                    # collect_list skips the null (dropped) entries;
                    # array_sort orders by _pos (first struct field)
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda x: x["_seg"],
                ),
                join_sep,
            ),
            F.lit(""),
        ).alias(text_col),
        F.count(F.lit(1)).alias("n_segs"),
        F.sum(F.when(F.col("_drop"), 1).otherwise(0)).alias("n_dropped"),
    )


def scrub_boilerplate_increment(
    df: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    batch_id: int | None = None,
    delim: str = "\n+",
    join_sep: str = "\n",
    min_doc_frac: float = 0.01,
    min_docs: int = 2,
    min_seg_chars: int = 1,
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """The "nightly delta" twin of :func:`scrub_boilerplate` over a durable
    segment-frequency index — scrub NEW documents against the document
    frequencies of everything processed so far, without re-reading the
    historical corpus, then register the delta's frequencies.

    Index layout (same partition discipline as the near-dup signature
    index, :func:`..operators.dedup.neardup_increment`):
    ``<index_dir>/segdf/batch=<id>`` holds the delta's (fingerprint,
    distinct-doc count) rows; ``<index_dir>/segmeta/batch=<id>`` one row
    with the delta's document count. Effective df for a delta segment =
    its delta count + the summed history counts; the threshold applies to
    the TOTAL document count (history + delta), so the frac semantics
    match a batch scrub over the accumulated corpus. Only O(distinct
    segments) count rows persist per batch — never text.

    SEMANTICS DIVERGENCE, by construction: already-returned documents are
    immutable, so a segment that crosses the threshold only starts
    dropping from LATER deltas — early documents keep boilerplate a
    whole-corpus batch re-scrub would remove (the greedy-vs-batch trade
    the streaming near-dup gate documents; pinned by
    test_scrub_increment_early_batch_divergence_documented). Run the
    batch scrub over the union when retroactive removal matters.

    ``batch_id`` defaults to one past every id the index considers taken
    — written batches in EITHER dir (a half-written batch is still taken)
    AND outstanding stream-epoch reservation markers in ``segdf`` (the
    run_stream_curation boilerplate stage's protocol — an id reserved by
    a crashed epoch must not be reallocated); passing it explicitly makes a
    re-run of the same delta idempotent (per-batch overwrite + strict
    below-``batch_id`` history reads). The two index writes are not
    atomic: a crash between them leaves a batch that later increments
    EXCLUDE from history (complete-in-both-dirs discipline — they keep
    working, slightly under-dropping) until the delta is re-run with the
    same ``batch_id``, which completes both dirs.
    Single writer at a time per index. Returns one row per delta document
    (``id_col``, scrubbed ``text_col``, ``n_segs``, ``n_dropped``),
    MATERIALIZED and left PERSISTED — loop callers must ``.unpersist()``
    each consumed result (the :func:`neardup_increment` contract).
    ``caches``: a caller-provided list the internally persisted frames
    are appended to AS they persist, so a failed call (index-write error,
    micro-batch retry) can never strand a cached frame — the streaming
    ``_curate`` discipline; without it, failures release the frames
    internally before re-raising."""
    from ..streaming.pipeline import _fs_batch_ids, _fs_index_listing

    spark = df.sparkSession
    seg_dir = index_dir.rstrip("/") + "/segdf"
    meta_dir = index_dir.rstrip("/") + "/segmeta"
    seg_batches, seg_markers = _fs_index_listing(spark, seg_dir)
    seg_ids = set(seg_batches)
    meta_ids = set(_fs_batch_ids(spark, meta_dir))
    if batch_id is None:
        # allocate past every id written in EITHER dir (a half-written
        # batch is still taken — re-run it explicitly to repair) AND past
        # stream-epoch reservations in segdf (the run_stream_curation
        # boilerplate stage's markers, exactly the neardup_increment
        # interop contract); one listing serves both needs
        batch_id = max(seg_ids | set(seg_markers) | meta_ids, default=-1) + 1

    own: list[DataFrame] = []
    track = caches if caches is not None else own
    segs = _segment_frame(df, text_col, id_col, delim, min_seg_chars)
    delta_counts = _seg_df_counts(segs, id_col).persist()
    track.append(delta_counts)

    # History = batches COMPLETE in both dirs (the two writes are not
    # atomic; a crash between them leaves a half-written batch whose
    # counts and doc total would disagree — reading it would either raise
    # on the missing dir or silently skew the frac threshold, r8 review
    # finding). Incomplete batches are excluded from history entirely —
    # the safe, under-dropping direction — and repaired by re-running the
    # same delta with the same batch_id (idempotent overwrite completes
    # both dirs).
    hist_ids = sorted(b for b in seg_ids & meta_ids if b < batch_id)
    if hist_ids:
        hist_df = (
            spark.read.option("basePath", seg_dir)
            .parquet(seg_dir)
            .filter(F.col("batch").isin(hist_ids))
            .groupBy("_fp")
            .agg(F.sum("_df").alias("_hdf"))
        )
        hist_docs = (
            spark.read.option("basePath", meta_dir)
            .parquet(meta_dir)
            .filter(F.col("batch").isin(hist_ids))
            .agg(F.coalesce(F.sum("n_docs"), F.lit(0)).alias("_n_hist"))
        )
        combined = delta_counts.join(hist_df, "_fp", "left").withColumn(
            "_tdf", F.col("_df") + F.coalesce(F.col("_hdf"), F.lit(0))
        )
    else:
        hist_docs = spark.range(1).select(F.lit(0).cast("bigint").alias("_n_hist"))
        combined = delta_counts.withColumn("_tdf", F.col("_df"))

    total = (
        df.select(F.count(F.lit(1)).alias("_n_delta"))
        .crossJoin(F.broadcast(hist_docs))
        .select((F.col("_n_delta") + F.col("_n_hist")).alias("_n_docs"))
    )
    drop_set = (
        combined.crossJoin(F.broadcast(total))
        .filter(F.col("_tdf") >= _boiler_threshold(min_docs, min_doc_frac, "_n_docs"))
        .select("_fp", F.lit(True).alias("_drop"))
    )
    out = _reassemble(
        segs.join(drop_set, "_fp", "left"), text_col, id_col, join_sep
    ).persist()
    track.append(out)
    try:
        delta_counts.write.mode("overwrite").parquet(f"{seg_dir}/batch={batch_id}")
        # The metadata row's n_docs is computed INSIDE the write job (r15
        # action trim — an eager out.count() used to precede the writes):
        # one aggregation over the persisted `out` both fills its cache
        # (the InMemoryTableScan materializes every partition it reads, so
        # the returned frame is still MATERIALIZED-and-pinned per the
        # contract) and yields the single n_docs row — one job fewer per
        # increment call and per stream epoch. Re-execution stays
        # history-stable: the history read filters batch.isin(hist_ids),
        # partition-pruning the dirs these writes create. The agg form is
        # pure JVM like the range(1-partition) form it replaces (the r13
        # profile finding about createDataFrame still applies).
        out.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs")
        ).write.mode("overwrite").parquet(f"{meta_dir}/batch={batch_id}")
    except BaseException:
        # standalone path: never strand a cached frame on a failed
        # increment (r8 review finding); caller-provided caches release
        # in the caller's finally instead
        if caches is None:
            for c in own:
                c.unpersist()
        raise
    delta_counts.unpersist()
    return out


# ── composed nightly-delta curation ──────────────────────────────────────────

def scrub_replace_join(
    df: DataFrame, scrubbed: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Replace ``df``'s text with the boilerplate-scrubbed form and DROP
    documents whose every segment was boilerplate (nothing left). The ONE
    definition both the streaming stage (pipeline._curate) and the batch
    composed pass (:func:`curate_increment`) apply — batch/stream parity
    here is by shared code, not by parallel copies a future edit could
    silently fork (r9 self-review #3)."""
    return df.drop(text_col).join(
        scrubbed.filter(F.length(F.col(text_col)) > 0).select(id_col, text_col),
        id_col,
        "inner",
    )


def eval_shingle_dict(eval_df: DataFrame, text_col: str, k: int) -> DataFrame:
    """The eval-set k-shingle dictionary (one distinct column ``sh``) the
    decontamination stage joins against — derived ONCE here for both the
    streaming pipeline (which persists it for the stream's lifetime) and
    :func:`curate_increment` (same single-definition parity rationale as
    :func:`scrub_replace_join`)."""
    return eval_df.select(
        F.explode(shingles_expr(F.col(text_col), k)).alias("sh")
    ).distinct()


def decontam_anti_join(
    df: DataFrame,
    ev_dict: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    min_hits: int = 1,
) -> DataFrame:
    """Drop documents sharing at least ``min_hits`` distinct k-shingles
    with the eval dictionary (``ev_dict``: one distinct-shingle column
    ``sh``, small — broadcast). Shared by the streaming decontam stage
    and :func:`curate_increment` (same single-definition rationale as
    :func:`scrub_replace_join`).

    ``min_hits=1`` (default) is the strictest published form — ANY
    shared shingle drops the doc, and the plan stays a semi-join +
    distinct (no counting). ``min_hits>1`` is the overlap-threshold
    variant real pipelines tune (a single shared trigram on a tiny
    vocabulary is often coincidence, not leakage): the per-doc DISTINCT
    matched-shingle count aggregates (combiner-friendly, keyed by doc
    id) and only docs at/above the threshold drop. Same broadcast
    shape either way — the train side never shuffles on the shingle
    key."""
    if min_hits < 1:
        raise ValueError("min_hits must be >= 1")
    matched = shingle_rows(df, text_col, id_col, k).join(
        F.broadcast(ev_dict), "sh", "semi"
    )
    if min_hits == 1:
        contaminated = matched.select(F.col("id").alias(id_col)).distinct()
    else:
        # shingle_rows emits DISTINCT shingles per doc, so a plain count
        # is the distinct-overlap count
        contaminated = (
            matched.groupBy("id")
            .agg(F.count("*").alias("__hits"))
            .filter(F.col("__hits") >= min_hits)
            .select(F.col("id").alias(id_col))
        )
    return df.join(contaminated, id_col, "anti")


def resolve_ann_index(spark, index, include_stream_adds: bool = True):
    """Accept a built :class:`...operators.similarity.PQIndex` /
    :class:`...operators.embeddings.OPQIndex` or a saved artifact PATH
    (:func:`...operators.similarity.save_pq_index` /
    :func:`...operators.embeddings.save_opq_index`) — the gate-wiring
    contract the classifier/LM gates use (``resolve_hashed_model`` /
    ``resolve_lm``): a stream restart loads the artifact instead of
    needing the building session alive. A path sniffs the OPQ marker
    first (an OPQ artifact CONTAINS a valid PQ artifact — loading it as
    plain PQ would silently serve unrotated queries against a rotated
    corpus, the featurizer-identity corruption the artifact exists to
    prevent), then dispatches on the ``meta`` kind row (``pq`` /
    ``ivfpq`` — the celled artifact, r14). The marker sniff is NARROW
    (ADVICE r13, :func:`..similarity._parquet_dir_exists`): only a
    genuinely missing marker falls through to the flat-index branch — a
    present but unreadable ``opq_meta`` raises instead of silently
    serving the rotated corpus unrotated."""
    if not isinstance(index, str):
        return index
    from .embeddings import load_opq_index
    from .similarity import _parquet_dir_exists, load_ivfpq_index, load_pq_index

    root = index.rstrip("/")
    if _parquet_dir_exists(spark, root + "/opq_meta"):
        return load_opq_index(
            spark, root, persist=True,
            include_stream_adds=include_stream_adds,
        )
    kind_rows = spark.read.parquet(root + "/meta").select("kind").collect()
    kind = kind_rows[0]["kind"] if len(kind_rows) == 1 else None
    if kind == "ivfpq":
        return load_ivfpq_index(
            spark, root, persist=True,
            include_stream_adds=include_stream_adds,
        )
    return load_pq_index(
        spark, root, persist=True, include_stream_adds=include_stream_adds
    )


def semantic_anti_join(
    df: DataFrame,
    index,
    embedding_col: str = "embedding",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    refine: int = 4,
    n_probe: int = 4,
) -> DataFrame:
    """Embedding (semantic) near-dup gate against a FROZEN PQ/OPQ/IVFPQ index
    (r13, VERDICT r12 Next-round #7): drop rows whose exact re-ranked
    cosine against any indexed neighbor reaches ``threshold``. The ONE
    definition both the streaming gate (``run_stream_curation``,
    ``semantic_threshold=``) and the batch composed pass
    (:func:`curate_increment`) apply — the scrub_replace_join
    single-definition parity rationale.

    Scale shape: the arriving rows are the QUERY side of the standard
    ADC serve (:func:`...operators.similarity.topk_pq` /
    :func:`...operators.embeddings.topk_opq` /
    :func:`...operators.similarity.topk_ivfpq`, k=1) — the batch/micro-
    batch broadcasts with its per-query LUTs while the compressed
    corpus streams; only the ×``refine`` shortlist touches full vectors
    for the exact re-rank, so the verdict is never an approximate score.
    That shape assumes the ARRIVING side is the small one — always true
    for a micro-batch, true for a nightly delta while it fits broadcast
    (delta rows × m×k×8 B of LUT). A delta beyond broadcast scale
    should gate in id-range slices (the anti-join composes across
    slices: drops are per-row decisions against a frozen index) — the
    honest 100 TB knob, documented rather than hidden.

    A flat PQ/OPQ index ADC-scans the ENTIRE compressed corpus per
    arriving row — fine while the index is small, but per-batch cost
    grows linearly with index size. An **IVFPQ index** (r14, VERDICT
    r13 #1) makes the consult CELLED: each arriving row probes its
    ``n_probe`` nearest coarse cells and ADC-scores only those cells'
    candidates (n_probe/n_cells of the corpus, the IVFADC serve shape
    of :func:`...operators.similarity.topk_ivfpq`), so per-batch cost
    scales with n_probe × cell size, not index size — the shape that
    holds at a 10⁹-vector index. Celling trades recall exactly as the
    standard IVFADC serve does (a true neighbor outside the probed
    cells is missed; the recall-floor pytest pins the gap vs the flat
    gate), and the threshold verdict still comes from the exact
    re-ranked cosine, never the approximate score.
    Rows with a NULL embedding pass through (nothing to judge — the
    text-space gates still apply). Rows whose id EQUALS an indexed id
    are never judged against themselves (the serve path's self-pair
    exclusion), which makes re-delivery of an already-indexed document
    a signature-gate concern, not a semantic-gate one.

    CONSULT-ONLY by design: the stream reads the index, it never writes
    it — registration of new keepers stays the nightly
    ``pq_index_add``/``build_*_index`` job's responsibility (frozen
    parameters, append-only, the documented ANN lifecycle). A gate that
    also registered per micro-batch would need the epoch-reservation
    protocol the signature index carries; that is the next frontier,
    not this one."""
    from .embeddings import OPQIndex, topk_opq
    from .similarity import IVFPQIndex, topk_ivfpq, topk_pq

    judged = df.filter(F.col(embedding_col).isNotNull()).select(
        F.col(id_col), F.col(embedding_col)
    )
    if isinstance(index, OPQIndex):
        top1 = topk_opq(
            judged, index, vec_col=embedding_col, id_col=id_col, k=1,
            refine=refine,
        )
    elif isinstance(index, IVFPQIndex):
        # prune_cells: the arriving rows' probed cells (bounded collect,
        # ≤ n_cells values) statically prune the index scan — on the
        # cell-partitioned durable layout only the probed cells' FILES
        # are read, which is what keeps per-batch cost flat while the
        # index grows (the r14 celled-consult contract)
        top1 = topk_ivfpq(
            judged, vec_col=embedding_col, id_col=id_col, k=1,
            refine=refine, n_probe=n_probe, index=index, prune_cells=True,
        )
    else:
        top1 = topk_pq(
            judged, vec_col=embedding_col, id_col=id_col, k=1,
            refine=refine, index=index,
        )
    near = (
        top1.filter(F.col("score") >= threshold)
        .select(F.col("query_id").alias(id_col))
    )
    return df.join(near, id_col, "anti")


def curate_increment(
    df: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str | None = None,
    *,
    quality_gate: float | None = None,
    boilerplate_min_doc_frac: float | None = None,
    boilerplate_min_docs: int = 2,
    substring_k: int | None = None,
    neardup_threshold: float | None = 0.6,
    neardup_k: int = 3,
    eval_df: DataFrame | None = None,
    decontam_k: int = 3,
    decontam_min_hits: int = 1,
    batch_id: int | None = None,
    materialize: bool = True,
    cc_checkpoint: str = "local",
    cc_checkpoint_dir: str | None = None,
    perplexity_max_ce: float | None = None,
    perplexity_lm: tuple[DataFrame, DataFrame] | str | None = None,
    classifier_min_score: float | None = None,
    classifier_model: DataFrame | str | None = None,
    classifier_n_buckets: int | None = None,
    classifier_seed: int = 0,
    semantic_threshold: float | None = None,
    semantic_index=None,
    embedding_col: str = "embedding",
    semantic_refine: int = 4,
    semantic_n_probe: int = 4,
) -> DataFrame:
    """The BATCH twin of ``run_stream_curation``'s full stack: curate one
    nightly delta against durable history without re-reading the corpus —
    quality gate (+ optional LM perplexity gate, ``perplexity_max_ce`` /
    ``perplexity_lm``, and optional model-based classifier gate,
    ``classifier_min_score`` / ``classifier_model`` /
    ``classifier_n_buckets`` — the stream's gate expressions verbatim, so
    the two shapes drop the same documents) → exact dedup (durable fingerprint index,
    :func:`..dedup.exact_increment`) → boilerplate scrub (durable
    segment-frequency index, :func:`scrub_boilerplate_increment`) →
    optional exact-substring span cut (``substring_k``, durable window-
    hash index, :func:`..dedup.substring_increment` — Lee et al. 2022
    ExactSubstr as a text-rewriting stage; a doc whose text was ALL
    duplicate spans drops like an all-boilerplate doc) → near-dup gate
    (durable signature index, :func:`..dedup.neardup_increment`) →
    eval-set decontamination → PII redaction, in exactly the stream's
    stage order (scrub and span-cut BEFORE near-dup so shared
    banners/passages can't false-near-dup documents with disjoint
    bodies; ALL stateless gates — quality, LM, classifier, repetition —
    BEFORE the dedup stages so a junk early arrival never becomes a
    keeper; the repetition gate joined that pass in r12).

    **Behavior change (r12), for configs with ``boilerplate_min_doc_frac``
    and/or ``substring_k`` enabled:** the always-on repetition gate now
    scores the RAW text, before the boilerplate scrub and ExactSubstr
    span cut. A document whose repetition comes entirely from boilerplate
    or duplicated spans those stages would have removed — previously
    scrubbed first, then kept — is now dropped outright (and its
    fingerprint never enters the durable index, so a later clean twin is
    admitted rather than deduped against a ghost). Kept-sets of existing
    scrub-enabled pipelines shift accordingly with no config change on
    their side; rerun the bootstrap if the pre-r12 selection must be
    reproduced. The trade is deliberate: gating pre-state is what keeps
    a repetitive early arrival from permanently claiming an exact/near-
    dup keeper slot (the r12 keeper-slot fix), and raw-text repetition
    scoring is the published-pipeline shape (Gopher/RefinedWeb).

    The point: an ingest pipeline alternates shapes over its life — a
    historical bootstrap, stream generations, nightly batch deltas — and
    every stage here shares its durable index layout (and id-reservation
    protocol) with the streaming stage of the same name under ONE
    ``index_dir`` root (``fps/`` ``segdf/`` ``segmeta/`` ``sigs/``), so
    batch and stream runs interleave against the same history. Pass
    ``neardup_index_dir=<index_dir>`` / ``boilerplate_index_dir=
    <index_dir>`` to ``run_stream_curation`` for the shared-history
    setup. (The stream's EXACT stage is watermark-bounded state-store
    dedup, so only the batch path consults ``fps/`` — a stream restart
    re-admitting a fingerprint from beyond its watermark is caught here
    on the next delta, the documented horizon difference.)

    ``batch_id=None`` lets each sub-index allocate independently (their
    histories differ when a stage was enabled mid-life); an explicit id
    makes a re-run of the same delta idempotent across ALL sub-indexes —
    only safe when this composed operator is the index root's sole
    writer. Returns the curated delta rows (original columns, scrubbed +
    redacted text). ``materialize`` here DIVERGES from the dedup-family
    contract since the r13 action trim (ADVICE r13):
    ``materialize=True`` (default) returns an UNPINNED, LAZY frame —
    zero cache residue, loop-safe forever, every durable index write
    above already flushed — but the caller's FIRST action recomputes
    the post-dedup tail (decontam anti-join, PII redaction, and the
    semantic consult when enabled) from the durable indexes' outputs,
    uncached. An index-seeding bootstrap that discards the return pays
    nothing; a caller that consumes the result more than once should
    pin it (``.persist()``/checkpoint) or pass ``materialize=False``,
    which returns an eagerly computed PERSISTED frame the caller
    releases. The recompute path shares
    :func:`..dedup.neardup_increment`'s cluster caveat (its CC pass
    localCheckpoints by default) — ``cc_checkpoint`` /
    ``cc_checkpoint_dir`` plumb through for cluster-grade lineage
    truncation."""
    from .dedup import exact_increment, neardup_increment
    from .textanalysis import quality_score

    caches: list[DataFrame] = []
    keep_pinned: DataFrame | None = None
    try:
        work = df
        if quality_gate is not None:
            work = work.filter(quality_score(F.col(text_col)) >= quality_gate)
        if perplexity_max_ce is not None:
            # the stream's LM gate (run_stream_curation), same slot, same
            # EXPRESSION — batch/stream parity by construction, like the
            # shared scrub/decontam helpers
            if perplexity_lm is None:
                raise ValueError(
                    "perplexity_max_ce needs perplexity_lm=(freqs, consts) "
                    "from operators.lm.unigram_lm_stats, or a save_lm "
                    "artifact path"
                )
            from .lm import collect_lm_expr_model, perplexity_ce_expr, resolve_lm

            _m, _oov = collect_lm_expr_model(
                *resolve_lm(df.sparkSession, perplexity_lm)
            )
            work = work.filter(
                perplexity_ce_expr(F.col(text_col), _m, _oov)
                <= perplexity_max_ce
            )
        if classifier_min_score is not None:
            # the stream's model-based quality gate (r11), same slot,
            # same literal-map expression — batch/stream parity by
            # construction, like the LM gate above. classifier_model may
            # be a saved artifact PATH (r12 — operators.classifier.
            # save_hashed_model): the build-once/serve-many shape a
            # nightly delta wants; n_buckets/seed then come from the
            # artifact's own featurizer identity.
            if classifier_model is None:
                raise ValueError(
                    "classifier_min_score needs classifier_model (the "
                    "trained (bucket, w) table from operators.classifier."
                    "train_logreg_hashed, or a save_hashed_model artifact"
                    " path) — plus classifier_n_buckets for the in-memory"
                    " form"
                )
            from .classifier import (
                collect_hashed_model,
                resolve_hashed_model,
                score_hashed_expr,
            )

            _cm, _cnb, _csd = resolve_hashed_model(
                df.sparkSession, classifier_model, classifier_n_buckets,
                classifier_seed,
            )
            _cw, _cb = collect_hashed_model(_cm)
            work = work.filter(
                score_hashed_expr(F.col(text_col), _cw, _cb, _cnb, _csd)
                >= classifier_min_score
            )
        # repetition joins the stateless pre-dedup gate pass (r12, in
        # lockstep with run_stream_curation): a repetitive doc must not
        # claim an exact-fingerprint or near-dup keeper slot — previously
        # it registered its fingerprint in the durable index and then
        # dropped at the late repetition stage, so a clean twin arriving
        # the NEXT night was deduped against a doc that never shipped
        # (permanent content loss). Gates on the RAW text (pre-scrub),
        # the published-pipeline shape. Catalyst folds the chained
        # filters into one predicate pass.
        work = work.where(repetition_keep_expr(F.col(text_col)))
        work = exact_increment(
            work,
            index_dir,
            text_col,
            id_col,
            ts_col,
            batch_id=batch_id,
            materialize=False,
            caches=caches,
        )
        if boilerplate_min_doc_frac is not None:
            scrubbed = scrub_boilerplate_increment(
                work,
                index_dir,
                text_col,
                id_col,
                batch_id=batch_id,
                min_doc_frac=boilerplate_min_doc_frac,
                min_docs=boilerplate_min_docs,
                caches=caches,
            )
            work = scrub_replace_join(work, scrubbed, text_col, id_col).persist()
            caches.append(work)
        if substring_k is not None:
            from .dedup import substring_increment

            cut = substring_increment(
                work,
                index_dir,
                text_col,
                id_col,
                k=substring_k,
                batch_id=batch_id,
                caches=caches,
            )
            # Only CUT documents take the rebuilt (token-stream) text —
            # an untouched doc keeps its ORIGINAL case/spacing/newlines
            # (r11 self-review: swapping every doc's text for the
            # normalized rebuild destroyed formatting corpus-wide the
            # moment the stage was enabled). Fully-cut docs (rebuild
            # empty) drop, like all-boilerplate docs.
            stats = cut.select(
                F.col(id_col),
                F.col("n_cut").alias("__sub_n_cut"),
                F.col(text_col).alias("__sub_text"),
            )
            work = (
                work.join(stats, id_col)
                .filter(
                    ~(
                        (F.col("__sub_n_cut") > 0)
                        & (F.length("__sub_text") == 0)
                    )
                )
                .withColumn(
                    text_col,
                    F.when(
                        F.col("__sub_n_cut") > 0, F.col("__sub_text")
                    ).otherwise(F.col(text_col)),
                )
                .drop("__sub_n_cut", "__sub_text")
                .persist()
            )
            caches.append(work)
        if neardup_threshold is not None:
            # materialize=False + caches: the pinned survivors frame and
            # any partial gate pins land in OUR list, released in finally
            # even if the gate fails mid-way (r9 self-review #1)
            work = neardup_increment(
                work,
                index_dir,
                text_col,
                id_col,
                ts_col,
                threshold=neardup_threshold,
                k=neardup_k,
                batch_id=batch_id,
                materialize=False,
                caches=caches,
                cc_checkpoint=cc_checkpoint,
                cc_checkpoint_dir=cc_checkpoint_dir,
            )
        out = work  # repetition gate moved into the pre-dedup pass (r12)
        if semantic_threshold is not None:
            # embedding near-dup vs a FROZEN PQ/OPQ index (r13) — the
            # stream's gate verbatim (shared semantic_anti_join), placed
            # with the dedup family: after the signature stages (which
            # own within-delta keeper selection), before decontam/PII.
            # Consult-only: registration of tonight's keepers into the
            # semantic index is the separate pq_index_add job.
            if semantic_index is None:
                raise ValueError(
                    "semantic_threshold needs semantic_index — a built "
                    "PQIndex/OPQIndex/IVFPQIndex or a save_pq_index/"
                    "save_opq_index/save_ivfpq_index artifact path"
                )
            if embedding_col not in df.columns:
                raise ValueError(
                    f"semantic_threshold needs an {embedding_col!r} "
                    "column in the delta schema (array<float|double>)"
                )
            _sem = resolve_ann_index(df.sparkSession, semantic_index)
            if isinstance(semantic_index, str):
                # path-loaded: the artifact load persisted the encoded
                # table for serve-many; release with our other caches
                caches.append(_sem.pq.encoded if hasattr(_sem, "pq") else _sem.encoded)
            out = semantic_anti_join(
                out, _sem, embedding_col, id_col, semantic_threshold,
                refine=semantic_refine, n_probe=semantic_n_probe,
            )
        if eval_df is not None:
            ev_dict = eval_shingle_dict(eval_df, text_col, decontam_k)
            out = decontam_anti_join(
                out, ev_dict, text_col, id_col, decontam_k,
                min_hits=decontam_min_hits,
            )
        out = out.withColumn(text_col, redact_pii_expr(F.col(text_col)))
        if materialize:
            # No eager count (r13 action trim): every durable-index write
            # above is its own action, already flushed by the time we get
            # here — the old count only pre-computed the post-dedup
            # decontam+PII tail, which an index-seeding bootstrap discards
            # outright (the registered query's shape). The returned frame
            # is unpinned and computes on the caller's first action; at
            # driver-union-find scale that recompute is self-contained,
            # and the cluster-grade re-execution caveat below is unchanged
            # from when the count ran (caches released before the caller's
            # action either way).
            return out
        # track the pin BEFORE the materializing count: if the count
        # raises (executor loss mid-compute), the finally below releases
        # it like any other cache — only a SUCCESSFUL pin is exempted
        # from release and handed to the caller (r9 self-review)
        out = out.persist()
        caches.append(out)
        out.count()
        keep_pinned = out
        return out
    finally:
        for c in caches:
            if c is not keep_pinned:
                c.unpersist()


# ── corpus snapshot diff (dataset-versioning audit) ──────────────────────────

def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Snapshot-to-snapshot corpus audit: what changed between two versions
    of a training corpus — ``(id, status)`` with status ``added`` (id only
    in the new snapshot), ``removed`` (only in the old), or ``changed``
    (present in both, content fingerprint differs). Unchanged documents
    drop out, so the artifact is O(churn), not O(corpus) — the record a
    dataset release ships so a consumer (or a retraining decision) can see
    exactly what moved between versions without diffing 100 TB of text.

    Identity is the content FINGERPRINT (md5 of the sorted distinct token
    set, :func:`..textanalysis.fingerprint`) — the same key the exact-dedup
    family and the curation ledger use, so "changed" means changed under
    the pipeline's own notion of content, not byte noise.

    Scale shape: each side reduces to ``(id, 16-byte fingerprint)`` BEFORE
    the single full-outer equi-join on id — the text never shuffles, and
    the join is AQE-plannable on both sides.

    NULL text is coalesced to ``''`` before fingerprinting (matching the
    SQL mirror's COALESCE) and presence is tested on explicit membership
    flags, not fingerprint nullness — a document whose text is NULL in a
    snapshot is still PRESENT in that snapshot (ADVICE r8: the previous
    ofp-isNull test reported an old-side NULL-text doc as 'added')."""
    from .textanalysis import fingerprint

    fp = lambda c: fingerprint(F.coalesce(c, F.lit("")))  # noqa: E731
    o = old.select(
        F.col(id_col).alias("id"),
        fp(F.col(text_col)).alias("ofp"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(id_col).alias("id"),
        fp(F.col(text_col)).alias("nfp"),
        F.lit(True).alias("__in_new"),
    )
    status = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(~F.col("ofp").eqNullSafe(F.col("nfp")), "changed")
    )
    return (
        o.join(n, "id", "full")
        .withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(F.col("id").alias(id_col), "status")
        .orderBy(id_col)
    )
