"""Deterministic training-data mixture operators: seeded hash sampling,
epoch shuffle-shards, token-budget mixing (SURVEY.md §2 M6 adjunct — the
"compose the training set" step between curation and export).

Why hash-seeded instead of ``rand()`` / ``sampleBy()``: a 100 TB mixture
must be REPRODUCIBLE — re-running the job (resume after failure, audit of
what a model trained on, ablation with one knob changed) has to select the
exact same documents regardless of cluster size, partition count, or task
scheduling order. Spark's ``rand(seed)`` is seeded PER PARTITION, so the
sample changes whenever the input layout does. Every operator here derives
its randomness as a pure projection of the ROW ITSELF::

    h60 = int(hex(md5("<salt>:<seed>:<id>"))[:15], 16)   # uniform 60-bit

which makes the sample (a) layout-independent, (b) re-runnable, and
(c) cross-engine checkable — the DuckDB oracles reproduce the arithmetic
bit-for-bit (integer thresholds precomputed in Python; no float crosses
the engine boundary on any keep/drop or ordering decision).

Scale shapes (100 TB):
- :func:`sample_mixture` is a FILTER — no shuffle, no sort, no state; it
  composes with partition pruning and pushes nothing to the driver.
  Contrast the systematic ``stratified_sample`` plan (row_number per
  stratum = per-stratum sort) — correct for small eval carve-outs,
  wasteful as the main mixture mechanism.
- :func:`epoch_shards` is ONE hash-partition shuffle + shard-local sort
  (never a global orderBy); shard count is the parallelism knob, and a new
  epoch = a new seed = a metadata-only recompute, not a materialized
  shuffled copy of the corpus.
- :func:`token_budget_mix` never sorts a whole mixture group in one
  partition (a dominant language is tens of TB at 100 TB): the running
  sum decomposes into per-hash-bucket offsets (a groups × 2^16 frame,
  broadcast) + within-bucket windows, bit-identical to the flat window
  (the DuckDB oracle mirrors the flat form and proves it). The greedy
  hash-order prefix makes the budget cut deterministic and incrementally
  extendable (raising a budget only ADDS documents — seed-stable).

Reference scope note: the reference pipeline (Main.py, cleaner_v6.py) has
no sampling/mixing stage — this family is part of the beyond-reference
LLM-training-data surface the build mandate lists alongside dedup and
similarity search.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textanalysis import token_count

# 60-bit hash space: 15 hex chars fit signed 64-bit exactly (2^60 - 1 max)
# and both Spark's conv(.,16,10) and DuckDB's ('0x'||.)::BIGINT decode them
# losslessly as integers — thresholds stay integral end to end.
HASH_SPACE = 16 ** 15


def hash60_expr(id_col: Column | str, seed: int, salt: str = "mix") -> Column:
    """Uniform deterministic 60-bit integer from ``(salt, seed, id)``.

    A pure projection (md5 + substring + base-16 decode): the same row
    always draws the same value, on any executor, any partition layout,
    any engine. Compare against ``int(rate * HASH_SPACE)`` for a seeded
    Bernoulli keep at ``rate`` — integer arithmetic only, so the DuckDB
    mirror ``('0x' || substr(md5(...), 1, 15))::BIGINT`` agrees exactly
    (parity pinned in tests/test_mixture.py and the LOCAL_ORACLES hash
    checks)."""
    key = F.concat_ws(
        ":", F.lit(salt), F.lit(str(int(seed))), F.col(id_col) if isinstance(id_col, str) else id_col
    )
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")


def _rate_threshold_expr(group_col: str, rates: dict[str, float], default_rate: float) -> Column:
    """Per-group integer keep-threshold as a literal CASE cascade (a tiny
    dict — broadcast-free, codegen-folded constants)."""
    expr = F.lit(int(default_rate * HASH_SPACE))
    for g, r in sorted(rates.items()):
        expr = F.when(F.col(group_col) == g, F.lit(int(r * HASH_SPACE))).otherwise(expr)
    return expr


def sample_mixture(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    seed: int,
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Seeded per-group Bernoulli sample: keep a row iff its 60-bit hash
    falls below ``rate(group) * HASH_SPACE``.

    The workhorse of training-data mixing ("2 parts web, 1 part code,
    0.1 part forums"): one pass, zero shuffles, layout-independent, and
    NESTED by construction — the keep set at rate 0.25 is a strict subset
    of the keep set at rate 0.5 under the same seed, so mixture ablations
    share documents instead of resampling the world. Groups absent from
    ``rates`` keep at ``default_rate`` (0 = drop, 1.0 = passthrough)."""
    h = hash60_expr(id_col, seed, salt="mixsample")
    return df.filter(h < _rate_threshold_expr(group_col, rates, default_rate))


def temperature_rates(
    weights: dict[str, float], alpha: float
) -> dict[str, float]:
    """Per-group keep-rates implementing temperature (``p^alpha``)
    resampling, the standard multilingual/domain reweighting: flatten a
    skewed corpus distribution toward uniform as ``alpha`` falls from 1.

    Given group weights ``w_g`` (docs, tokens, chars — the caller's
    choice of mass), the target distribution is ``q_g ∝ p_g^alpha`` with
    ``p_g = w_g / W``; a FILTER realizes it with per-group keep-rate
    ``r_g ∝ q_g / p_g = p_g^(alpha-1)``, max-normalized so the smallest
    group keeps everything (a filter can only DOWNSAMPLE — no duplication;
    upsampling is the trainer's epoch knob, not the corpus builder's).
    ``alpha=1`` → every rate 1 (identity); ``alpha=0`` → expected kept
    mass EQUAL per group (``w_min`` each). Rates are monotone in alpha
    (``r_g = (p_g/p_min)^(alpha-1)`` with ``p_g/p_min ≥ 1``), so keep
    sets under one seed are NESTED across alpha — ablations at several
    temperatures share documents by construction. Groups with weight 0
    are omitted (nothing to keep)."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    pos = {g: float(w) for g, w in weights.items() if w > 0}
    if not pos:
        return {}
    total = sum(pos.values())
    raw = {g: (w / total) ** (alpha - 1.0) for g, w in pos.items()}
    top = max(raw.values())
    return {g: r / top for g, r in raw.items()}


def temperature_mix(
    df: DataFrame,
    group_col: str,
    alpha: float,
    seed: int,
    id_col: str = "doc_id",
    weight_col: str | None = None,
    max_groups: int = 10_000,
) -> DataFrame:
    """Temperature-resample a corpus: aggregate per-group mass, derive
    :func:`temperature_rates`, apply :func:`sample_mixture` (same salt —
    ``temperature_mix`` IS ``sample_mixture`` with computed rates, so a
    manual ``sample_mixture`` call with the same rates/seed selects the
    identical documents).

    ``weight_col=None`` weights by document count; pass a column (chars,
    tokens) to flatten by that mass instead. The group-weight aggregate
    is collected to the driver — BOUNDED: groups are languages/domains/
    sources, O(100) at 100 TB; ``max_groups`` guards the collect and
    raises past it (the similarity-family collect discipline). The
    resample itself stays a zero-shuffle integer-hash filter."""
    agg = (
        F.count(F.lit(1)) if weight_col is None else F.sum(F.col(weight_col))
    ).alias("_w")
    grouped = df.groupBy(group_col).agg(agg)
    rows = grouped.limit(max_groups + 1).collect()
    if len(rows) > max_groups:
        raise ValueError(
            f"temperature_mix: > {max_groups} groups in {group_col!r}; "
            "this operator flattens coarse strata (languages, domains) — "
            "a high-cardinality column here is almost certainly a mistake"
        )
    if any(r[group_col] is None for r in rows):
        # a NULL group cannot be expressed by the rate cascade
        # (F.col == lit(g) never matches NULL): silently dropping unlabeled
        # documents at alpha=1 would break the identity contract, and a
        # None key crashes the threshold sort — make the preprocessing
        # decision explicit instead (r8 review finding, verified live)
        raise ValueError(
            f"temperature_mix: NULL values in group column {group_col!r}; "
            "fill unlabeled documents (e.g. F.coalesce(col, lit('unknown'))) "
            "or filter them before resampling"
        )
    weights = {r[group_col]: float(r["_w"]) for r in rows if r["_w"] is not None}
    rates = temperature_rates(weights, alpha)
    return sample_mixture(df, group_col, rates, seed, id_col=id_col, default_rate=0.0)


def epoch_shards(
    df: DataFrame,
    n_shards: int,
    seed: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic epoch shuffle: assign every row a shard and a dense
    position within its shard, both pure functions of ``(seed, id)``.

    A training run reads shard files in ``(shard, pos_in_shard)`` order and
    gets a reproducible global permutation WITHOUT a global sort: shard
    assignment is ``h % n_shards`` (hash-uniform, so shards balance to
    ~N/n_shards ± sqrt), and position is a shard-LOCAL rank over
    ``(h, id)`` — Spark executes one hash shuffle on ``shard`` plus an
    in-partition sort, never a total order over the corpus. A new epoch is
    a new seed: no shuffled copy of the data is ever materialized.

    Output: input columns + ``shard`` (int), ``pos_in_shard`` (0-based
    bigint). The ``(h, id)`` sort key is collision-proof: equal hashes
    (birthday-bound ~N²/2^61) fall back to the unique id, so the
    permutation is total and engine-independent."""
    h = hash60_expr(id_col, seed, salt="epoch")
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        df.withColumn("__h", h)
        .withColumn("shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int"))
        .withColumn("pos_in_shard", (F.row_number().over(w) - 1).cast("bigint"))
        .drop("__h")
    )


def quality_weighted_sample(
    df: DataFrame,
    score_col: str,
    bands: list[tuple[float, float]],
    seed: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-weighted retention (the FineWeb/DataComp soft-filter shape):
    keep probability is a monotone STEP function of a quality score — keep
    everything above the top band, downsample the middle, keep a trickle of
    the tail for robustness — instead of the hard gate's all-or-nothing
    cliff.

    ``bands`` is ``[(min_score, rate), ...]``: the highest ``min_score``
    at or below the row's score decides its rate; scores below every band
    drop. Rates become the usual Python-computed integer thresholds against
    the seeded 60-bit row hash (salt ``"qsample"``), so the draw is
    layout-independent, reproducible, and exactly mirrorable — no float
    ever crosses the keep/drop boundary (the score-to-band comparison is
    on an already-round-6 score both engines compute identically).

    Scale shape: a pure FILTER like :func:`sample_mixture` — zero shuffle,
    composes with partition pruning; the band CASE is a literal cascade
    codegen folds. Raising any band's rate only ADDS documents (same
    hash, higher threshold), so quality-mix ablations nest under one
    seed."""
    if not bands:
        raise ValueError("quality_weighted_sample: bands must be non-empty")
    for ms, rate in bands:
        if not (0.0 <= rate <= 1.0):
            raise ValueError(f"rate {rate} outside [0, 1] for band {ms}")
    if len({ms for ms, _ in bands}) != len(bands):
        raise ValueError("duplicate band min_scores")
    ordered = sorted(bands)
    rates_in_order = [r for _, r in ordered]
    if rates_in_order != sorted(rates_in_order):
        raise ValueError(
            "rates must be non-decreasing in min_score (the documented "
            f"monotone-step contract): got {ordered} — an inverted band "
            "downsamples BETTER documents harder, almost certainly a "
            "mis-ordered bands list"
        )
    # INVERTED step (r13, the quality_sample sf1 profile): the natural
    # form `hash < CASE(score ≥ ms_i → t_i)` references the score once
    # per band — and the caller's score is usually a heavy text
    # expression that predicate pushdown INLINES at every usage site
    # (CaseWhen branches are excluded from codegen subexpression
    # elimination, and the HOF-bearing score expression never codegens),
    # so the filter paid ~bands× the scoring cost (measured 3.9 s vs a
    # 0.76 s single scan at sf1). Because rates are validated
    # NON-DECREASING in min_score, the step is monotone and inverts
    # exactly: keep ⟺ score ≥ required_min(hash), where required_min is
    # a CASE over the CHEAP 60-bit hash (ascending thresholds, first
    # match = lowest qualifying band; hash ≥ top threshold → +inf →
    # drop). The score now appears ONCE in the predicate; NULL and
    # below-all-bands scores still drop (NULL/false ≥ comparison).
    # Keep-set equivalence: h < t_{i(q)} ⟺ q ≥ ms_{j(h)} with
    # i(q) = highest band ≤ q, j(h) = first threshold > h — both
    # directions follow from t monotone in ms (pinned exact in
    # tests/test_mixture.py).
    h = hash60_expr(id_col, seed, salt="qsample")
    required = F.lit(float("inf"))
    for ms, rate in sorted(bands, reverse=True):  # descending wrap ⇒
        # ascending evaluation: smallest threshold checked first
        required = F.when(
            h < F.lit(int(rate * HASH_SPACE)), F.lit(float(ms))
        ).otherwise(required)
    return df.filter(F.col(score_col) >= required)


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    seed: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    weight_col: str | None = None,
) -> DataFrame:
    """Per-shard delivery manifest for an :func:`epoch_shards` layout:
    ``(shard, n_docs, total_weight?, content_sig)`` — the verification
    record a 100 TB export ships alongside its shards.

    ``content_sig`` is the bit_xor of each document's 60-bit content hash
    (md5 of the text itself — content-addressed, no seed), so it is
    ORDER-INDEPENDENT: a consumer re-derives the same triple from whatever
    arrived, in whatever order, and compares. A missing or duplicated
    document changes ``n_docs`` and flips the xor; a corrupted byte changes
    the hash. xor (not sum) keeps the check closed over 64-bit ints in both
    engines — no overflow semantics to reconcile.

    Shard assignment reuses :func:`epoch_shards`' exact formula
    (``hash60(salt="epoch", seed, id) % n_shards``) so the manifest
    describes precisely the shards that operator emits — consistency is
    pinned by pytest, and the DuckDB mirror reproduces the arithmetic
    bit-for-bit.

    Scale shape: the text never shuffles — each document reduces to an
    8-byte hash + weight BEFORE the single groupBy(shard) exchange, and
    every aggregate (count, sum, bit_xor) combines map-side, so the
    shuffle moves O(n_shards) rows per partition."""
    content_h = F.conv(F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10).cast(
        "bigint"
    )
    shard = F.pmod(hash60_expr(id_col, seed, salt="epoch"), F.lit(n_shards)).cast(
        "int"
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).cast("bigint").alias("total_weight"))
    aggs.append(F.expr("bit_xor(__content_h)").alias("content_sig"))
    slim = [shard.alias("shard"), content_h.alias("__content_h")] + (
        [F.col(weight_col)] if weight_col is not None else []
    )
    return df.select(*slim).groupBy("shard").agg(*aggs).orderBy("shard")


def verify_manifest(
    received: DataFrame,
    manifest: DataFrame,
    n_shards: int,
    seed: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    weight_col: str | None = None,
) -> DataFrame:
    """The receiver side of the :func:`shard_manifest` protocol: recompute
    the manifest over what actually ARRIVED and compare per shard against
    the shipped record. Returns one row per shard in either frame:
    ``(shard, ok, docs_delta, sig_match)`` — ``ok`` iff counts, weight
    (when carried) and the xor content signature all agree; a shard
    present on one side only fails with nulls on the other, never drops
    out of the report.

    Same cost shape as the manifest itself (one slim scan of the received
    data, O(n_shards) comparison rows). The final full-outer comparison
    join runs over two already-aggregated O(n_shards) frames — broadcast
    is NOT legal for full-outer (Spark would have to fabricate the
    unmatched rows of the streamed side), so this is a trivially small
    shuffle join by design, not an oversight."""
    got = shard_manifest(
        received, n_shards, seed, id_col=id_col, text_col=text_col,
        weight_col=weight_col,
    )
    exp = manifest.select(
        F.col("shard"),
        F.col("n_docs").alias("exp_docs"),
        *([F.col("total_weight").alias("exp_weight")] if weight_col is not None else []),
        F.col("content_sig").alias("exp_sig"),
    )
    j = got.join(exp, "shard", "full")
    sig_match = F.col("content_sig").eqNullSafe(F.col("exp_sig"))
    ok = sig_match & F.col("n_docs").eqNullSafe(F.col("exp_docs"))
    if weight_col is not None:
        ok = ok & F.col("total_weight").eqNullSafe(F.col("exp_weight"))
    return j.select(
        "shard",
        ok.alias("ok"),
        (
            F.coalesce(F.col("n_docs"), F.lit(0))
            - F.coalesce(F.col("exp_docs"), F.lit(0))
        ).alias("docs_delta"),
        sig_match.alias("sig_match"),
    ).orderBy("shard")


def token_budget_mix(
    df: DataFrame,
    group_col: str,
    budgets: dict[str, int],
    seed: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    default_budget: int = 0,
    bucket_bits: int = 16,
    tokens_col: str | None = None,
) -> DataFrame:
    """Fill each mixture group to a TOKEN budget instead of a rate: order
    the group's documents by seeded hash and keep the longest prefix whose
    running token total stays within ``budgets[group]``.

    Rates under-deliver when document lengths differ across groups (0.5 of
    a short-doc group is far fewer tokens than 0.5 of a book corpus);
    training mixtures are specified in tokens. The greedy hash-order
    prefix is deterministic, layout-independent, and monotone in the
    budget (a bigger budget strictly extends the kept set under the same
    seed). One shuffle (partition by group), one running-sum window.

    Keep rule: a document is kept iff its group budget is positive AND the
    running total INCLUDING it is ≤ that budget — the first over-budget
    document and everything after it in hash order are dropped (no partial
    documents; groups with no budget entry get ``default_budget``). The
    explicit ``budget > 0`` leg makes a zero budget mean DROP THE GROUP
    unconditionally, matching :func:`sample_mixture`'s rate-0 semantics —
    without it a zero-TOKEN document (empty/whitespace text) satisfies
    ``cum_tok 0 ≤ 0`` and leaks through a zero-budget group (ADVICE r8).

    Scale shape — the naive plan is a running-sum window partitioned by
    ``group_col``, which at 100 TB puts an ENTIRE mixture group (tens of
    TB for a dominant language) into one partition for a single-executor
    sort. This implementation decomposes the identical cumulative sum in
    two levels instead:

    1. bucket every row by the TOP ``bucket_bits`` of its hash (monotone
       in hash order, so bucket order ≡ hash order), and aggregate
       per-(group, bucket) token sums — a frame of at most
       ``groups × 2^bucket_bits`` rows;
    2. a running sum over THAT tiny frame gives each bucket its
       tokens-before offset (broadcast back), and the within-bucket
       running sum windows over ``(group, bucket)`` — 2^bucket_bits times
       more partitions than the group alone, ~N/2^bucket_bits rows each.

    ``cum_tok`` decomposes exactly (bucket boundaries never split a hash
    tie: distinct buckets ⇒ distinct hashes), so the output is
    bit-identical to the flat window — the DuckDB oracle mirrors the FLAT
    formulation and the hash-parity check proves the decomposition.

    Output: ``id, group, n_tok, cum_tok`` (cum_tok = running total through
    this document, in hash order)."""
    h = hash60_expr(id_col, seed, salt="tokbudget")
    budget = F.lit(int(default_budget))
    for g, b in sorted(budgets.items()):
        budget = F.when(F.col(group_col) == g, F.lit(int(b))).otherwise(budget)
    # tokens_col (r12): budget in REAL tokenizer units — a pre-tokenized
    # array<string> column (e.g. operators/bpe.encode_bpe output) counts
    # instead of whitespace words; training mixtures are specified in
    # tokenizer tokens, and whitespace counts under-budget scripts that
    # fragment heavily under BPE. NULL array = 0 tokens (clamped), the
    # pack_sequences convention.
    n_tok = (
        F.greatest(
            F.coalesce(F.size(F.col(tokens_col)).cast("bigint"), F.lit(0)),
            F.lit(0),
        )
        if tokens_col is not None
        else token_count(F.col(text_col))
    )
    base = df.select(
        F.col(id_col),
        F.col(group_col),
        n_tok.alias("n_tok"),
        h.alias("__h"),
    ).withColumn(
        "__bkt", F.shiftright(F.col("__h"), 60 - bucket_bits).cast("int")
    )
    # level 1: per-(group, bucket) sums → tokens BEFORE each bucket.
    # The window partitions by group, but over ≤ 2^bucket_bits rows per
    # group, not the corpus — driver-scale-free and executor-tiny.
    wb = (
        Window.partitionBy(group_col)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy(group_col, "__bkt")
        .agg(F.sum("n_tok").alias("__bsum"))
        .withColumn("__before", F.coalesce(F.sum("__bsum").over(wb), F.lit(0)))
        .drop("__bsum")
    )
    # level 2: within-bucket running sum + the broadcast bucket offset
    wr = (
        Window.partitionBy(group_col, "__bkt")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.join(F.broadcast(offsets), [group_col, "__bkt"])
        .withColumn(
            "cum_tok",
            (F.col("__before") + F.sum("n_tok").over(wr)).cast("bigint"),
        )
        .filter((budget > F.lit(0)) & (F.col("cum_tok") <= budget))
        .drop("__h", "__bkt", "__before")
    )


def dataset_split(
    df: DataFrame,
    seed: int,
    id_col: str = "doc_id",
    val_frac: float = 0.05,
    test_frac: float = 0.05,
) -> DataFrame:
    """Deterministic train/val/test assignment: one ``split`` column from
    the seeded hash, integer-threshold semantics (test = lowest hashes,
    then val, rest train). Stability contract, stated precisely: with
    FIXED fractions the assignment is permanent (any re-run, any layout).
    Growing ``test_frac`` is monotone for TEST ONLY — a doc once in test
    stays in test, and the additions come from the old val band and the
    train docs just above it. The val band itself SHIFTS upward (its new
    members are former TRAIN docs the model may already have trained on),
    so freeze the fractions for the lifetime of a model line; grow
    ``test_frac`` only where former-train contamination of val is
    acceptable or val is re-carved anyway.

    The hash is salted differently from :func:`sample_mixture`, so
    sampling a mixture and splitting it are independent draws — a 10%
    mixture sample still splits 90/5/5, not correlated slices."""
    h = hash60_expr(id_col, seed, salt="split")
    t_test = int(test_frac * HASH_SPACE)
    t_val = int((test_frac + val_frac) * HASH_SPACE)
    return df.withColumn(
        "split",
        F.when(h < t_test, F.lit("test"))
        .when(h < t_val, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    stage_mins: list[float],
    n_shards: int,
    seed: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic curriculum schedule (easy-to-hard training order,
    Bengio et al. 2009): assign every row a ``stage`` from its score and
    a reproducible read position WITHIN the stage — without ever
    totally ordering the corpus.

    ``stage_mins`` is a strictly-descending list of score floors:
    stage 0 = rows scoring ≥ ``stage_mins[0]`` (the "easy"/cleanest
    tier a curriculum trains on first), stage k = rows scoring ≥
    ``stage_mins[k]`` but below every earlier floor, and rows below all
    floors land in the final stage ``len(stage_mins)``. A trainer reads
    stages in order; within a stage the order is the epoch-shard
    discipline (:func:`epoch_shards`): ``shard = h % n_shards`` and a
    ``(stage, shard)``-local rank over ``(h, id)`` — one hash shuffle,
    per-(stage, shard) in-partition sorts, parallelism = stages ×
    shards, never a global orderBy and never a whole stage sorted in a
    single partition. A new seed reshuffles within stages without
    touching the stage assignment (the curriculum is the score's, the
    shuffle is the seed's).

    Output: input columns + ``stage`` (int), ``shard`` (int),
    ``pos_in_shard`` (0-based bigint). Deterministic and
    layout-independent for the same reasons as the rest of the mixture
    family — every decision is integer arithmetic on the seeded 60-bit
    row hash or a comparison on the (round-6, engine-stable) score."""
    if list(stage_mins) != sorted(stage_mins, reverse=True) or len(
        set(stage_mins)
    ) != len(stage_mins):
        raise ValueError(
            f"stage_mins must be strictly descending, got {stage_mins}"
        )
    stage = F.lit(len(stage_mins))
    for k in range(len(stage_mins) - 1, -1, -1):
        stage = F.when(
            F.col(score_col) >= stage_mins[k], F.lit(k)
        ).otherwise(stage)
    h = hash60_expr(id_col, seed, salt="curriculum")
    w = Window.partitionBy("stage", "shard").orderBy("__h", id_col)
    return (
        df.withColumn("stage", stage.cast("int"))
        .withColumn("__h", h)
        .withColumn("shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int"))
        .withColumn("pos_in_shard", (F.row_number().over(w) - 1).cast("bigint"))
        .drop("__h")
    )


# ── DSIR importance resampling (Xie et al. 2023) ─────────────────────────────
# "Data Selection for Language Models via Importance Resampling": select raw
# documents whose hashed-n-gram feature distribution resembles a TARGET
# corpus — fit bag-of-hashed-ngrams models on target and raw, weight each
# raw doc by the per-occurrence log-ratio sum, then Gumbel top-k resample.
# Everything below is the mixture family's discipline applied to the paper:
# the feature hash is the seeded md5-60-bit projection (layout-independent,
# engine-mirrorable), the log-ratio table is a bounded n_buckets-row
# broadcast artifact, scoring is one scan + broadcast join + per-doc
# reduce, and the only "randomness" (the Gumbel noise) is a pure function
# of (seed, id) — the same selection on any cluster, any engine.

DSIR_N_BUCKETS = 256  # paper uses 10k; fixture corpora hash densely at 256
DSIR_ALPHA = 0.5


def dsir_bucket_rows(
    df: DataFrame,
    text_col: str,
    id_col: str | None = None,
    n_buckets: int = DSIR_N_BUCKETS,
    seed: int = 0,
) -> DataFrame:
    """(``id``?, ``bucket``) — one row per unigram AND bigram OCCURRENCE
    (multiplicity preserved: the paper's features are counts), hashed
    into ``n_buckets`` via the seeded 60-bit projection. One scan, one
    explode; nothing shuffles here."""
    from .curation import ngrams_expr
    from .textanalysis import tokens_expr

    grams = F.concat(
        tokens_expr(F.col(text_col)), ngrams_expr(F.col(text_col), 2)
    )
    cols = [F.col(id_col).alias("id")] if id_col is not None else []
    rows = df.select(*cols, F.explode(grams).alias("gram"))
    bucket = F.pmod(
        hash60_expr(F.col("gram"), seed, salt="dsir"), F.lit(n_buckets)
    ).cast("int")
    return rows.select(*(["id"] if id_col is not None else []), bucket.alias("bucket"))


def dsir_log_ratio_table(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    n_buckets: int = DSIR_N_BUCKETS,
    alpha: float = DSIR_ALPHA,
    seed: int = 0,
    raw_bucket_rows: DataFrame | None = None,
) -> DataFrame:
    """The bounded ``(bucket, lam)`` importance table: ``lam =
    ln(p_target(bucket)) − ln(p_raw(bucket))`` under add-alpha smoothing
    over the FULL bucket domain (``T + alpha·n_buckets`` mass), round-8.
    Built over the buckets observed in RAW (a raw document can only
    reference those, so the scoring join never misses); target counts
    left-join in with 0 for unseen buckets. Two combiner-friendly
    groupBys of O(n_buckets) keys — corpus size only affects the scan.
    ``raw_bucket_rows``: a precomputed :func:`dsir_bucket_rows` frame
    over ``raw`` (any extra columns ignored) — :func:`dsir_resample`
    passes its scoring frame so both sides share one derivation."""
    rb = (
        (
            raw_bucket_rows
            if raw_bucket_rows is not None
            else dsir_bucket_rows(raw, text_col, None, n_buckets, seed)
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("__cr"))
    )
    tb = (
        dsir_bucket_rows(target, text_col, None, n_buckets, seed)
        .groupBy("bucket")
        .agg(F.count("*").alias("__ct"))
    )
    tot = (
        rb.agg(F.sum("__cr").alias("__tr"))
        .crossJoin(tb.agg(F.coalesce(F.sum("__ct"), F.lit(0)).alias("__tt")))
    )
    return (
        rb.join(tb, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("__ct"), F.lit(0)) + alpha)
                    / (F.col("__tt") + alpha * n_buckets)
                )
                - F.log(
                    (F.col("__cr") + alpha) / (F.col("__tr") + alpha * n_buckets)
                ),
                8,
            ).alias("lam"),
        )
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_N_BUCKETS,
    alpha: float = DSIR_ALPHA,
    seed: int = 0,
) -> DataFrame:
    """DSIR selection: ``(id_col, log_weight, gumbel_key)`` — the top-``k``
    raw documents under Gumbel-top-k sampling ∝ importance weight (the
    paper's resampling step: ``key = log w + Gumbel(0,1)``, take the k
    largest — equivalent to sampling k docs without replacement with
    probability proportional to w).

    ``log w(doc) = Σ_occurrences lam(bucket)`` via one broadcast join of
    the bounded log-ratio table + a per-doc decimal-sum reduce; the
    Gumbel noise is ``−ln(−ln(u))`` with ``u = (hash60(seed, id) + 0.5)
    / HASH_SPACE`` — strictly inside (0, 1), per-row deterministic, so
    the selection is reproducible on any layout and mirrorable in SQL.
    The top-k is a TakeOrdered (orderBy + limit — never a global sort at
    scale); keys round to 6 dp with an id tiebreak so the boundary is
    engine-stable. Documents with zero tokens have no features and are
    not candidates (no rows).

    Cost shape, documented: the raw-side feature explode executes TWICE
    per action — once collapsing to the O(n_buckets) count table (the
    broadcast artifact must exist before scoring can start) and once
    under the scoring join. That is the uncached minimum; persisting the
    exploded features to skip the second pass is a corpus-sized cache —
    the caller's cluster-memory trade, not a default."""
    from ..functions.coercion import dsum

    occ = dsir_bucket_rows(raw, text_col, id_col, n_buckets, seed)
    lam = dsir_log_ratio_table(
        raw, target, text_col, n_buckets, alpha, seed, raw_bucket_rows=occ
    )
    logw = (
        occ.join(F.broadcast(lam), "bucket")
        .groupBy("id")
        .agg(dsum(F.col("lam"), scale=8).alias("__lw"))
    )
    u = (
        hash60_expr(F.col("id"), seed, salt="dsirg").cast("double") + 0.5
    ) / float(HASH_SPACE)
    key = F.round(F.col("__lw") + -F.log(-F.log(u)), 6)
    return (
        logw.select(
            F.col("id").alias(id_col),
            F.round(F.col("__lw"), 6).alias("log_weight"),
            key.alias("gumbel_key"),
        )
        .orderBy(F.desc("gumbel_key"), id_col)
        .limit(k)
    )
