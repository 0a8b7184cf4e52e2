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


def bind_once(bound: Column, body) -> Column:
    """Evaluate ``body(x)`` with ``x = bound`` appearing ONCE in the
    expression tree — the transform-over-singleton binding (the
    ngrams_expr / location_pairs pattern). NULL propagation is unchanged:
    a NULL ``bound`` rides the singleton array into ``body`` exactly as
    the inline expression would.

    Measured honestly (r14, 100 k-row replicated-corpus isolation): the
    per-row EXECUTION cost of the unbound scorer family is the same —
    Spark 4.1's ProjectExec subexpression elimination already shares the
    duplicated token subtrees *within one operator* (the old "~8
    tokenizations" reading over-attributed). What binding still buys is a
    k×-smaller analyzed/optimized tree (quality_score shrinks ~6
    tokens_expr subtrees to 1 — less Catalyst and janino work per plan,
    which the composed increment/ledger plans pay on every action) and
    one canonical shape for the family. Sharing an expression ACROSS
    operators (a pushed filter + an output projection) is NOT covered by
    any CSE — that needs the Generate barrier
    (``functions.fence.compute_once``, measured 1.6–1.9× on exactly that
    shape at 100 k rows this round)."""
    return F.try_element_at(F.transform(F.array(bound), body), F.lit(1))


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


def _stop_ratio_toks(toks: Column, words: list[str]) -> Column:
    return F.round(
        _hit_count(toks, words) / F.greatest(F.size(toks), F.lit(1)), 6
    )


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    # `is not None`, not truthiness: an explicitly EMPTY stopword list
    # means "no stopwords" (ratio 0.0 everywhere), not "use English"
    words = stopwords if stopwords is not None else EN_STOP
    return bind_once(tokens_expr(text), lambda toks: _stop_ratio_toks(toks, words))


def _mean_token_len_toks(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), 6)


def mean_token_len(text: Column) -> Column:
    return bind_once(tokens_expr(text), _mean_token_len_toks)


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: rewards moderate length, plausible mean
    token length, and some stopword mass (the classic Gopher-style cheap
    filters, public heuristics). The token array is bound once
    (``bind_once``) — same execution cost, ~6× smaller expression tree;
    see bind_once's measured notes."""

    def score(toks: Column) -> Column:
        n = F.size(toks)
        len_ok = F.when((n >= 10) & (n <= 1000), 1.0).otherwise(0.5)
        mtl = _mean_token_len_toks(toks)
        mtl_ok = F.when((mtl >= 3) & (mtl <= 12), 1.0).otherwise(0.5)
        sw = _stop_ratio_toks(toks, EN_STOP)
        sw_ok = F.when(sw >= 0.05, 1.0).otherwise(0.6)
        return F.round(len_ok * mtl_ok * sw_ok, 6)

    return bind_once(tokens_expr(text), score)


def lang_id(text: Column) -> Column:
    """Stopword-vote language ID over {en,fr,es}; ties prefer en>fr>es."""

    def vote(toks: Column) -> Column:
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

    return bind_once(tokens_expr(text), vote)


# ── model-based language ID (char-n-gram profiles) ──────────────────────────
# The production shape behind the stopword-vote heuristic above (VERDICT
# r10 #4): train per-language character-n-gram profiles once, broadcast the
# bounded (lang, gram, logp) table, and score documents with a join + mean
# log-prob — the lm.py discipline applied to language classification
# (Cavnar & Trenkle 1994 n-gram text categorization, naive-Bayes scoring).

# deterministic seed corpus: public high-frequency function words per
# language — enough signal for the classifier's fixtures; production swaps
# in real per-language sample text via train_lang_profiles(seed_df=...)
LANG_PROFILE_SEED = {
    "en": "the of and to in is was he that it his her you for on are as"
    " with they be at one have this from had we she which or their",
    "es": "el la los las de y un una del en es que no se por para con su"
    " al lo como mas pero sus le ya o fue este ha si porque",
    "fr": "le la les de des et un une du en est il elle que qui ne pas"
    " pour dans ce cette au aux sur avec son ses mais ou nous vous",
    "de": "der die das und ist ein eine von den dem des im mit nicht sich"
    " auf für auch als an es er sie nach bei aus zu wird oder",
}

LANG_NGRAM_N = 3
LANG_NGRAM_ALPHA = 0.5


def _char_norm(text: Column) -> Column:
    """Lowercase + squeeze ASCII whitespace runs to one space + trim
    spaces — the winnow_normalize rule, so the gram stream is identical
    cross-engine (bare SQL trim strips Unicode Zs; spell the class).
    The vertical tab is spelled ``\\x0B``, NOT ``\\v``: in Java regex
    ``\\v`` is the vertical-whitespace CLASS (U+000B..U+000D, U+0085,
    U+2028, U+2029) while RE2/DuckDB's ``\\v`` is the single char — a
    U+2028 in web text would normalize on one engine only (r11
    self-review, verified live on both engines)."""
    return F.trim(
        F.regexp_replace(
            F.lower(F.coalesce(text, F.lit(""))), "[ \\t\\n\\r\\f\\x0B]+", " "
        )
    )


def char_ngrams_expr(text: Column, n: int = LANG_NGRAM_N) -> Column:
    """All overlapping character n-grams of the normalized text (empty
    array below n chars). The normalized string binds as a LAMBDA
    VARIABLE (``transform(array(norm), t -> …)``) so it is computed once
    per row — referencing it through the projection re-inlines the
    regexp_replace into every per-position substring (the shingles_expr
    lesson, operators/dedup.py:54)."""
    empty = F.array().cast("array<string>")
    return F.coalesce(
        F.try_element_at(
            F.transform(
                F.array(_char_norm(text)),
                lambda t: F.when(
                    F.length(t) >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.length(t) - (n - 1)),
                        lambda i: F.substring(t, i, n),
                    ),
                ).otherwise(empty),
            ),
            F.lit(1),
        ),
        empty,
    )


def lang_profile_seed_df(spark, seed: dict[str, str] | None = None):
    """The literal (lang, text) training frame for
    :func:`train_lang_profiles` — :data:`LANG_PROFILE_SEED` by default."""
    rows = sorted((seed or LANG_PROFILE_SEED).items())
    return spark.createDataFrame(rows, "lang string, text string")


def train_lang_profiles(
    seed_df, text_col: str = "text", n: int = LANG_NGRAM_N,
    alpha: float = LANG_NGRAM_ALPHA,
):
    """Train the per-language char-n-gram profiles: returns ``(profiles,
    consts)`` — ``(lang, gram, logp)`` add-alpha log-probs over each
    language's gram distribution and ``(lang, oov_logp)`` for grams
    unseen by that language (smoothing over V_lang + 1 classes, the
    unigram_lm_stats recipe per language). Both artifacts are bounded by
    the seed corpus (languages × their gram vocab), so scoring
    broadcasts them — the corpus side never shuffles on a content key."""
    grams = seed_df.select(
        "lang", F.explode(char_ngrams_expr(F.col(text_col), n)).alias("gram")
    )
    counts = grams.groupBy("lang", "gram").agg(F.count("*").alias("c"))
    consts = counts.groupBy("lang").agg(
        F.sum("c").alias("__t"), F.count("*").alias("__v")
    )
    denom = F.col("__t") + alpha * (F.col("__v") + 1.0)
    profiles = (
        counts.join(consts, "lang")
        .select(
            "lang",
            "gram",
            F.round(F.log((F.col("c") + alpha) / denom), 8).alias("logp"),
        )
    )
    oov = consts.select(
        "lang", F.round(F.log(F.lit(alpha) / denom), 8).alias("oov_logp")
    )
    return profiles, oov


def lang_id_ngram_scores(
    docs,
    profiles,
    oov,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = LANG_NGRAM_N,
):
    """Per-document language prediction under the trained profiles:
    ``(id_col, pred_lang, score)`` — score is the MEAN per-gram log-prob
    (length-normalized, so scores compare across documents), prediction
    is the argmax language with a deterministic lang tiebreak; documents
    with no grams predict ``unknown`` (score NULL).

    Scale shape: one corpus scan explodes (id, gram); the only joins are
    against the BROADCAST profile/oov tables; per-(doc, lang) partial
    sums reduce map-side; the doc×lang grid (langs is O(10)) comes from a
    broadcast cross join of the slim per-doc gram counts — the corpus
    text never shuffles. Determinism: round-8 log-probs, decimal sum,
    round-6 mean (the lm.py discipline)."""
    from pyspark.sql import Window

    from ..functions.coercion import dsum

    doc_grams = docs.select(
        F.col(id_col), F.explode(char_ngrams_expr(F.col(text_col), n)).alias("gram")
    )
    hits = (
        doc_grams.join(F.broadcast(profiles), "gram")
        .groupBy(id_col, "lang")
        .agg(dsum(F.col("logp"), scale=8).alias("__s"), F.count("*").alias("__h"))
    )
    base = docs.select(
        F.col(id_col),
        F.size(char_ngrams_expr(F.col(text_col), n)).cast("bigint").alias("__n"),
    ).crossJoin(F.broadcast(oov))
    scored = base.join(hits, [id_col, "lang"], "left").select(
        F.col(id_col),
        F.col("lang"),
        F.col("__n"),
        F.round(
            (
                F.coalesce(F.col("__s"), F.lit(0.0))
                + (F.col("__n") - F.coalesce(F.col("__h"), F.lit(0)))
                * F.col("oov_logp")
            )
            / F.greatest(F.col("__n"), F.lit(1)),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), "lang")
    best = scored.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") == 1
    )
    return best.select(
        F.col(id_col),
        F.when(F.col("__n") > 0, F.col("lang"))
        .otherwise(F.lit("unknown"))
        .alias("pred_lang"),
        F.when(F.col("__n") > 0, F.col("score")).alias("score"),
    )


def fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint: md5 of the sorted distinct token
    set — bag-of-words identity, robust to word order (cheap near-dup key)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens_expr(text))), " "))


# ── Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Appendix A1.1) ────────

# the eight required-stopword probes the published filter checks for
GOPHER_REQUIRED_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_signals(text: Column) -> list[Column]:
    """The per-document signal columns of the published Gopher quality
    filter — each a pure Column expression (no UDF; every signal stays
    inside whole-stage codegen, so the filter costs one projection over
    the corpus scan at any scale):

    - ``n_words``: whitespace token count
    - ``mean_word_len``: total token chars / n_words (round 6)
    - ``alpha_frac``: fraction of words containing ≥1 ASCII letter
      (round 6). Latin-script only, faithful to the English-centric
      published recipe: a non-Latin-script document (e.g. pure Arabic)
      scores 0 and always fails the default keep — for non-English
      corpora, lower ``min_alpha_frac`` or swap the probe for a Unicode
      letter class before gating.
    - ``hash_ratio`` / ``ellipsis_char_ratio``: (# of '#' chars) /
      n_words and (# of '...' occurrences) / n_words, each its own
      signal with its own 0.1 threshold — the paper applies the
      symbol-to-word bound to the two symbols SEPARATELY, not to their
      sum (round 6)
    - ``bullet_frac`` / ``ellipsis_frac``: fraction of non-empty lines
      starting with a bullet ('-' or '*') / ending with '...' (round 6)
    - ``stop_hits``: how many of the 8 required stopwords appear

    Divisors are ``greatest(·, 1)`` so empty documents yield zeros, not
    NULLs — an empty doc must FAIL the filter, not escape it. NULL text
    coalesces to ``''`` up front for the same reason: without it the
    stopword sum and char counts go NULL and the keep verdict is NULL
    instead of the documented fail (r10 self-review — the corpus_diff
    COALESCE discipline)."""
    text = F.coalesce(text, F.lit(""))
    toks = tokens_expr(text)
    n = F.size(toks)
    n1 = F.greatest(n, F.lit(1)).cast("double")
    total_chars = F.length(F.array_join(toks, ""))
    alpha_hits = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    hash_cnt = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ell_cnt = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / 3
    lines = F.filter(F.split(text, "\n"), lambda ln: F.trim(ln) != "")
    nl1 = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.startswith(F.ltrim(ln), F.lit("- "))
            | F.startswith(F.ltrim(ln), F.lit("* ")),
        )
    )
    ell_lines = F.size(
        F.filter(lines, lambda ln: F.endswith(F.rtrim(ln), F.lit("...")))
    )
    stop_hits = sum(
        (
            F.array_contains(toks, w).cast("int")
            for w in GOPHER_REQUIRED_STOPS
        ),
        F.lit(0),
    ).cast("bigint")
    return [
        n.cast("bigint").alias("n_words"),
        F.round(total_chars / n1, 6).alias("mean_word_len"),
        F.round(alpha_hits / n1, 6).alias("alpha_frac"),
        F.round(hash_cnt / n1, 6).alias("hash_ratio"),
        F.round(ell_cnt / n1, 6).alias("ellipsis_char_ratio"),
        F.round(bullet / nl1, 6).alias("bullet_frac"),
        F.round(ell_lines / nl1, 6).alias("ellipsis_frac"),
        stop_hits.alias("stop_hits"),
    ]


GOPHER_SIGNAL_NAMES = [
    "n_words", "mean_word_len", "alpha_frac", "hash_ratio",
    "ellipsis_char_ratio", "bullet_frac", "ellipsis_frac", "stop_hits",
]


def gopher_struct(text: Column) -> Column:
    """:func:`gopher_signals` as ONE struct column with the token and line
    arrays bound once per row (r14). The list form re-splits the text into
    tokens for five of the eight signal columns and into lines for three —
    the split regexes are HOF subtrees codegen CSE never shares. Field
    values are the list form's expressions verbatim (same rounding, same
    ``greatest`` guards), pinned equal by pytest. Consumers that project
    several fields should materialize the struct behind a
    ``functions.fence.compute_once`` fence first — an unfenced field
    reference re-evaluates the whole struct."""
    text = F.coalesce(text, F.lit(""))
    bound = F.struct(
        tokens_expr(text).alias("t"),
        F.filter(F.split(text, "\n"), lambda ln: F.trim(ln) != "").alias("l"),
    )

    def sig(b: Column) -> Column:
        toks, lines = b["t"], b["l"]
        n = F.size(toks)
        n1 = F.greatest(n, F.lit(1)).cast("double")
        total_chars = F.length(F.array_join(toks, ""))
        alpha_hits = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
        hash_cnt = F.length(text) - F.length(
            F.replace(text, F.lit("#"), F.lit(""))
        )
        ell_cnt = (
            F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
        ) / 3
        nl1 = F.greatest(F.size(lines), F.lit(1)).cast("double")
        bullet = F.size(
            F.filter(
                lines,
                lambda ln: F.startswith(F.ltrim(ln), F.lit("- "))
                | F.startswith(F.ltrim(ln), F.lit("* ")),
            )
        )
        ell_lines = F.size(
            F.filter(lines, lambda ln: F.endswith(F.rtrim(ln), F.lit("...")))
        )
        stop_hits = sum(
            (
                F.array_contains(toks, w).cast("int")
                for w in GOPHER_REQUIRED_STOPS
            ),
            F.lit(0),
        ).cast("bigint")
        return F.struct(
            n.cast("bigint").alias("n_words"),
            F.round(total_chars / n1, 6).alias("mean_word_len"),
            F.round(alpha_hits / n1, 6).alias("alpha_frac"),
            F.round(hash_cnt / n1, 6).alias("hash_ratio"),
            F.round(ell_cnt / n1, 6).alias("ellipsis_char_ratio"),
            F.round(bullet / nl1, 6).alias("bullet_frac"),
            F.round(ell_lines / nl1, 6).alias("ellipsis_frac"),
            stop_hits.alias("stop_hits"),
        )

    return bind_once(bound, sig)


def gopher_keep_expr(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_stop_hits: int = 2,
) -> Column:
    """The Gopher keep-decision over the ALREADY-PROJECTED signal columns
    (:func:`gopher_signals`) — the published thresholds as defaults,
    overridable per corpus. ``max_symbol_ratio`` bounds ``hash_ratio``
    AND ``ellipsis_char_ratio`` each on its own, as the paper specifies
    (one threshold, two independent symbol probes). Evaluated on the
    ROUNDED signals so the decision is reproducible from the emitted
    audit columns themselves (and hashes identically cross-engine)."""
    return (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("alpha_frac") >= min_alpha_frac)
        & (F.col("hash_ratio") <= max_symbol_ratio)
        & (F.col("ellipsis_char_ratio") <= max_symbol_ratio)
        & (F.col("bullet_frac") <= max_bullet_frac)
        & (F.col("ellipsis_frac") <= max_ellipsis_frac)
        & (F.col("stop_hits") >= min_stop_hits)
    )
