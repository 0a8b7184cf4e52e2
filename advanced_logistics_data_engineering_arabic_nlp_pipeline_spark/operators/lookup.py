"""3-tier dictionary lookup — the "join" of this engine (SURVEY.md §2 E).

Per-token resolution cascade (cleaner_v6.py:180-208):

  tier 1  exact:      normalize(token) hit in the reverse index
  tier 2  containment: first longest-first boundary-guarded variant inside
                       normalize(token)
  tier 3  fuzzy:      token_sort_ratio ≥ 82 over all variants (len ≥ 3)
  retry:              strip operational prefix from the RAW token and run the
                      cascade again (cleaner_v6.py:236-243, 258-261)

Tiers 1-2 are pure Column expressions (map lookup + regexp_extract) — they
run JVM-side inside codegen and vectorize for free. Tier 3 is the engine's
only Python hot path: an Arrow-batched pandas UDF applied via the
distinct-resolve-join pattern (E4) — the Spark idiom for the reference's
``lru_cache`` insight: each *distinct* string is resolved exactly once, then
joined back. At 100 TB the distinct token set is orders of magnitude smaller
than the row count, and the resolved map is broadcast.

Fuzzy scoring mirrors rapidfuzz ``token_sort_ratio`` (public algorithm):
sort whitespace tokens, then Indel similarity = 2*LCS/(len_a+len_b) * 100.
Cutoff 82, min length 3, first-best tie-breaking in dictionary insertion
order (cleaner_v6.py:35-37, 198-208).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.arabic import normalize_arabic, strip_op_prefix
from ..sources.dictionary import build_variant_index, tier2_pattern, variant_map_expr

FUZZY_SCORE_CUTOFF = 82
FUZZY_MIN_LEN = 3


# ── Tiers 1-2: pure expressions ─────────────────────────────────────────────

def tier12_expr(norm: Column, index: dict[str, str] | None = None) -> Column:
    """Resolve an already-normalized token via exact map hit, else first
    boundary-guarded containment match. NULL on miss."""
    index = index if index is not None else build_variant_index()
    m = variant_map_expr(index)
    return F.coalesce(
        F.element_at(m, norm),
        F.element_at(m, F.regexp_extract(norm, tier2_pattern(index), 1)),
    )


def resolve_token_expr(token: Column, index: dict[str, str] | None = None) -> Column:
    """Full expression-only cascade (tiers 1-2 on the token, then on its
    op-prefix-stripped form). This is the oracle-checkable fast path; add
    tier-3 with :func:`resolve_tokens_fuzzy` on a tokens DataFrame."""
    index = index if index is not None else build_variant_index()
    stripped_raw = strip_op_prefix(token)
    return F.coalesce(
        tier12_expr(normalize_arabic(token), index),
        F.when(stripped_raw != "", tier12_expr(normalize_arabic(stripped_raw), index)),
    )


# ── Tier 3: fuzzy pandas UDF ────────────────────────────────────────────────

def _lcs_masks(a: str) -> tuple[dict[str, int], int]:
    """Per-character position bitmasks of ``a`` for the bit-parallel LCS
    kernel — built once per probe and reused across its whole candidate
    band (:func:`fuzzy_best_match`)."""
    masks: dict[str, int] = {}
    bit = 1
    for ca in a:
        masks[ca] = masks.get(ca, 0) | bit
        bit <<= 1
    return masks, len(a)


def _lcs_len_masked(masks: dict[str, int], la: int, b: str) -> int:
    """Bit-parallel LCS length (Allison–Dix 1986; Hyyrö's formulation):
    ``V`` holds one bit per position of ``a`` (1 = not yet matched); each
    character of ``b`` clears the positions a longest subsequence through
    it can claim via ``V = (V + u) | (V - u)`` with ``u = V & M[c]``. One
    O(1) big-int op per ``b`` character instead of the O(len_a) DP inner
    loop — exact LCS, identical to the rolling DP (pinned by the
    reference-DP property test), measured ~36× on the stress workload's
    20–35-char strings. Carries past bit ``la`` are harmless (they only
    propagate upward and ``M`` masks reads to the low bits); the final
    popcount masks them off."""
    if la == 0 or not b:
        return 0
    V = (1 << la) - 1
    get = masks.get
    for cb in b:
        u = V & get(cb, 0)
        if u:
            V = (V + u) | (V - u)
    return la - (V & ((1 << la) - 1)).bit_count()


def _lcs_len(a: str, b: str) -> int:
    """Longest-common-subsequence length (bit-parallel; r15 — was the
    O(len_a·len_b) rolling DP)."""
    if not a or not b:
        return 0
    masks, la = _lcs_masks(a)
    return _lcs_len_masked(masks, la, b)


def _ratio_sorted(a2: str, b2: str) -> float:
    """token_sort_ratio on already token-sorted, single-spaced strings."""
    total = len(a2) + len(b2)
    if total == 0:
        return 0.0
    return 200.0 * _lcs_len(a2, b2) / total


def token_sort_ratio(a: str, b: str) -> float:
    return _ratio_sorted(" ".join(sorted(a.split())), " ".join(sorted(b.split())))


@lru_cache(maxsize=32)
def _variant_block_tables(variants: tuple[str, ...]):
    """Per-dictionary precomputed blocking tables, LENGTH-SORTED: the
    argsort-by-length ``order``, sorted lengths ``lv`` (for a binary-search
    length window), token-sorted forms and 64-bin character-count vectors
    (ord & 63) both in length order."""
    sorted_forms = [" ".join(sorted(v.split())) for v in variants]
    lv = np.array([len(s) for s in sorted_forms], dtype=np.int32)
    order = np.argsort(lv, kind="stable").astype(np.int64)
    lv = lv[order]
    sorted_forms = [sorted_forms[i] for i in order]
    counts = np.zeros((len(variants), 64), dtype=np.int32)
    for i, s in enumerate(sorted_forms):
        for ch in s:
            counts[i, ord(ch) & 63] += 1
    return order, sorted_forms, lv, counts


def fuzzy_best_match(
    norm: str, variants: list[str], cutoff: float = FUZZY_SCORE_CUTOFF
) -> str | None:
    """extractOne semantics: best score ≥ cutoff; ties keep the earliest
    candidate (strictly-greater replacement — earliest in DICTIONARY
    order, which the length-sorted layout maps back to via ``order``).

    Two-stage lossless blocking:

    1. LENGTH WINDOW (binary search, O(log V)): score = 200·LCS/(la+lb)
       and LCS ≤ min(la, lb), so a variant can reach the cutoff only if
       cutoff·ln/(200−cutoff) ≤ lv ≤ ln·(200−cutoff)/cutoff. The variant
       table is pre-sorted by length, so two searchsorted calls restrict
       every later stage to the feasible length band — at a 100k-variant
       dictionary the O(V) per-string bound check the r4 verdict flagged
       becomes O(band) (VERDICT r4 "Next round" #7).
    2. CHARACTER-MULTISET bound on the band (numpy, lossless):
       LCS(a,b) ≤ Σ_c min(count_a(c), count_b(c)); a candidate whose
       shared character budget can't reach the cutoff skips the O(la·lb)
       DP. Counts hash into 64 bins (ord & 63) — a collision only
       OVERcounts the budget, so the prune stays lossless (property-tested
       against an unblocked reference). The multiset bound subsumes the
       length bound; the window exists to shrink the vectors it runs on."""
    order, sorted_forms, lv, vcounts = _variant_block_tables(tuple(variants))
    a2 = " ".join(sorted(norm.split()))
    ln = len(a2)
    # Below ~256 variants the window buys nothing (the vectorized multiset
    # bound over the whole table is already sub-µs) and its per-call
    # ceil/floor/searchsorted overhead measurably taxes the dominant
    # tiny-dictionary workload (+26%/probe on the 17-variant reference
    # dictionary, micro-benched r5). The multiset bound subsumes the
    # length bound, so skipping the window never changes the result.
    if cutoff > 0 and len(lv) >= 256:
        lo_len = int(np.ceil(cutoff * ln / (200.0 - cutoff)))
        hi_len = int(np.floor(ln * (200.0 - cutoff) / cutoff))
        lo = int(np.searchsorted(lv, lo_len, side="left"))
        hi = int(np.searchsorted(lv, hi_len, side="right"))
    else:
        lo, hi = 0, len(lv)
    if lo >= hi:
        return None
    c = np.zeros(64, dtype=np.int32)
    for ch in a2:
        c[ord(ch) & 63] += 1
    common = np.minimum(vcounts[lo:hi], c).sum(axis=1)
    denom = lv[lo:hi] + ln
    ok = np.nonzero((denom > 0) & (200.0 * common >= cutoff * denom))[0]
    best, best_score, best_pos = None, None, None
    # probe-side LCS bitmasks built ONCE per probe, reused across every
    # surviving candidate in the band (r15 — the bit-parallel kernel's
    # setup cost is O(len) dict inserts, the same order as one candidate
    # scan; amortizing it keeps the per-candidate cost at one big-int op
    # per character)
    a_masks, a_len = _lcs_masks(a2)
    for j in ok:
        i = lo + j
        b2 = sorted_forms[i]
        total = a_len + len(b2)
        s = (
            200.0 * _lcs_len_masked(a_masks, a_len, b2) / total
            if total
            else 0.0
        )
        pos = order[i]  # original dictionary position (tie-break order)
        if s >= cutoff and (
            best_score is None
            or s > best_score
            or (s == best_score and pos < best_pos)
        ):
            best, best_score, best_pos = variants[pos], s, pos
    return best


def fuzzy_lookup_udf(index: dict[str, str] | None = None, cutoff: float = FUZZY_SCORE_CUTOFF):
    """pandas UDF: normalized string → canonical (or None). Inputs shorter
    than FUZZY_MIN_LEN skip fuzzy entirely (cleaner_v6.py:36, 193-194).
    A per-batch memo mirrors the reference's lru_cache within each Arrow
    batch; cross-row dedupe is done by the distinct-resolve-join caller."""
    index = index if index is not None else build_variant_index()
    variants = list(index.keys())

    @pandas_udf("string")
    def _fuzzy(norms: pd.Series) -> pd.Series:
        @lru_cache(maxsize=8192)
        def one(norm: str | None) -> str | None:
            if not norm or len(norm) < FUZZY_MIN_LEN:
                return None
            m = fuzzy_best_match(norm, variants, cutoff)
            return index[m] if m is not None else None

        return norms.map(one)

    return _fuzzy


# ── E4: distinct-resolve-join over a tokens DataFrame ───────────────────────

# Resolved-mapping size below which the (token → canonical) map is collected
# and inlined as a literal map expression instead of broadcast-joined back.
# A literal map rides the serialized plan to executors exactly like a
# broadcast variable but skips two broadcast-exchange builds, two join
# nodes and the downstream re-aggregation shuffle — for the dominant
# workload shape (human-entered location strings: tens-to-hundreds of
# distinct resolvable tokens) the whole fuzzy cascade collapses into a
# zero-shuffle Column expression. The threshold is deliberately SMALL:
# Spark evaluates element_at on a map literal as a LINEAR scan
# (ArrayBasedMapData has no hash index), so per-row lookup cost is
# O(entries) — measured: a 59k-entry literal turned the all-unique stress
# case into minutes of string compares, where the broadcast hash join's
# O(1) probe took seconds. 512 entries × a few string equals is well under
# the cost of the tier-2 regex the row already paid; above that the
# broadcast-join path takes over (same asymptotics as any small-dim join).
MAPPING_LITERAL_MAX = 512


def _distinct_token_mapping(
    tokens_df: DataFrame,
    token_col: str,
    index: dict[str, str],
    cutoff: float,
) -> DataFrame:
    """(token → canonical) mapping for every *distinct* raw token of
    ``tokens_df``, full 3-tier cascade included; only resolved (non-null
    canonical) rows are kept. The cascade — the tier-1/2 normalize+regex
    expression chain, not just the fuzzy UDF — runs once per distinct raw
    token; the mapping stays small by construction because every entry
    fuzzy- or exact-matches a finite dictionary at cutoff ≥ 82.

    Cascade order matches the reference exactly: t1(tok), t2(tok), t3(tok),
    then — only if the raw op-prefix-stripped token is non-empty — t1, t2,
    t3 of the stripped form (cleaner_v6.py:180-208, 236-243)."""
    fuzzy = fuzzy_lookup_udf(index, cutoff)
    tok = F.col("__t")
    stripped = strip_op_prefix(tok)

    # Distinct first, sized second: the distinct shuffle output is tiny in
    # bytes, so AQE coalesces it to ~1 partition — which would run the
    # regex-heavy tier-1/2 chain and the fuzzy UDF single-threaded when the
    # distinct set is large (AQE sizes by bytes; this stage is CPU-bound
    # per row). But blind repartition(defaultParallelism) is just as wrong
    # at the other end: a handful of tokens spread over 32 partitions pays
    # 32-task dispatch on every downstream stage for ~1 row of work each
    # (measured as the dominant cost of trips_master_fuzzy — 32 distinct
    # texts at sf0.1). Count the distinct set (one tiny job on the cached
    # frame), then give each task ≥64 tokens.
    target = tokens_df.sparkSession.sparkContext.defaultParallelism
    distinct_toks = (
        tokens_df.select(F.col(token_col).alias("__t")).distinct().cache()
    )
    n_distinct = distinct_toks.count()
    cascade_parts = max(1, min(target, n_distinct // 64 + 1))
    d = (
        distinct_toks.repartition(cascade_parts)
        .withColumn("__norm", normalize_arabic(tok))
        .withColumn("__sraw", stripped)
        .withColumn("__snorm", normalize_arabic(stripped))
        .withColumn("__r12", tier12_expr(F.col("__norm"), index))
        .withColumn("__r12s", tier12_expr(F.col("__snorm"), index))
        # Materialize once: this frame feeds THREE consumers (the two miss
        # branches and the final mapping), and two of them are broadcast
        # builds — each broadcast executes its subtree independently, so
        # without a cut point the distinct + regex cascade (and below, the
        # fuzzy UDF) runs 3-4× per query (measured: the all-distinct stress
        # case spent ~8 of its 12 s on those re-executions). The cache is
        # filled EAGERLY below (after fz is defined): Spark submits
        # broadcast-exchange builds asynchronously, and concurrent subtree
        # executions do NOT share an unfilled lazy cache — event-log
        # profiling showed three simultaneous 1.9 s builds of this exact
        # subtree racing past the lazy cut point.
        .cache()
    )
    # Fuzzy only on the distinct unresolved normalized forms (a when()-
    # guarded UDF would still be evaluated for EVERY row — BatchEvalPython
    # computes UDF columns unconditionally — so the misses are filtered
    # into their own frame first). The Python stage's partition count
    # scales with the (already-paid) distinct count: a handful of tokens on
    # 32 partitions would spin up 32 Arrow workers to score ~1 string each —
    # worker dispatch, not scoring, dominates. ≥64 tokens per worker before
    # adding another.
    fuzzy_parts = cascade_parts
    miss_n = d.filter(F.col("__r12").isNull()).select(F.col("__norm").alias("__k"))
    miss_s = d.filter(
        F.col("__r12").isNull()
        & F.col("__r12s").isNull()
        & (F.col("__sraw") != "")
    ).select(F.col("__snorm").alias("__k"))
    fz = (
        miss_n.union(miss_s)
        .distinct()
        .repartition(fuzzy_parts)
        .withColumn("__fz", fuzzy(F.col("__k")))
        .filter(F.col("__fz").isNotNull())
        # Same reasoning: consumed by two broadcast builds (__fzn / __fzs)
        # whose subtrees would otherwise each re-run the fuzzy UDF.
        .cache()
    )
    # ONE eager fill for BOTH cut points (r14 action trim — this was a
    # d.count() then an fz.count()): the broadcast-race hazard the eager
    # fills guard against (Spark submits broadcast-exchange builds
    # asynchronously, and concurrent subtree executions do NOT share an
    # unfilled lazy cache — event-log profiling showed three simultaneous
    # 1.9 s builds of the same subtree racing past a lazy cut point) only
    # exists once the final mapping's broadcasts are submitted. This
    # count runs strictly BEFORE any broadcast build, is a single
    # synchronous job, and an InMemoryTableScan inside it materializes
    # every unfilled cache it reads — so one action fills d AND fz.
    fz.count()
    # distinct_toks fed only d; once d is materialized its blocks are dead
    # weight in a long-lived session (the service calls this per request).
    distinct_toks.unpersist()
    # keep a handle on the CACHED frame: d is about to be reassigned to the
    # joined plan, and unpersist() on that derived frame is a no-op — the
    # returned cache list must hold the frame .cache() was called on
    # (pre-r5 both paths leaked the cascade cache because of exactly this)
    d_cached = d
    d = (
        d.join(
            F.broadcast(fz.withColumnRenamed("__fz", "__fzn")),
            d["__norm"] == fz["__k"],
            "left",
        )
        .drop("__k")
        .join(
            F.broadcast(
                fz.withColumnRenamed("__fz", "__fzs").withColumnRenamed("__k", "__k2")
            ),
            F.col("__snorm") == F.col("__k2"),
            "left",
        )
        .drop("__k2")
    )
    cascade = F.coalesce(
        F.col("__r12"),
        F.col("__fzn"),
        F.when(
            F.col("__sraw") != "",
            F.coalesce(F.col("__r12s"), F.col("__fzs")),
        ),
    )
    mapping = d.select("__t", cascade.alias("__canonical")).filter(
        F.col("__canonical").isNotNull()
    )
    # hand the cut-point frames back so the caller can unpersist them the
    # moment the mapping no longer references them (the literal path): a
    # per-request service call must not leak cached blocks forever
    return mapping, [d_cached, fz]


def mapping_literal_probe(mapping: DataFrame) -> tuple[Column | None, bool]:
    """THE single literal-vs-join decision (both resolve_tokens_fuzzy and
    extract.with_all_locations_fuzzy go through here, so the threshold and
    null semantics have one source of truth): collect up to
    ``MAPPING_LITERAL_MAX + 1`` resolved entries; return
    ``(map literal or None-if-empty, True)`` when the literal path
    applies, else ``(None, False)`` for the broadcast-join path."""
    probe = mapping.limit(MAPPING_LITERAL_MAX + 1).collect()
    if len(probe) <= MAPPING_LITERAL_MAX:
        return canonical_map_literal(probe), True
    return None, False


def canonical_map_literal(mapping_rows: list) -> Column | None:
    """A collected (token → canonical) mapping as one literal MAP column —
    two py4j array literals total, never per-entry ``lit`` calls. None for
    an empty mapping (``map_from_arrays`` can't infer empty-array types)."""
    if not mapping_rows:
        return None
    keys = [r["__t"] for r in mapping_rows]
    vals = [r["__canonical"] for r in mapping_rows]
    return F.map_from_arrays(F.lit(keys), F.lit(vals))


def resolve_tokens_fuzzy(
    tokens_df: DataFrame,
    token_col: str = "token",
    out_col: str = "canonical",
    index: dict[str, str] | None = None,
    cutoff: float = FUZZY_SCORE_CUTOFF,
    caches_out: list | None = None,
) -> DataFrame:
    """Full 3-tier resolution of a token column, fuzzy included (see
    :func:`_distinct_token_mapping` for the cascade contract).

    The resolved mapping is applied back to the token rows adaptively:
    below ``MAPPING_LITERAL_MAX`` entries it is inlined as a literal map
    expression (zero joins, zero exchanges — the common human-entered-text
    shape); above, it is broadcast-joined (the general small-dim shape).
    Both paths are row-for-row identical: an unresolved or null token gets
    a null ``out_col``.

    ``caches_out``: on the broadcast-join path the returned plan still
    references the cascade's cached cut-point frames, so they cannot be
    unpersisted here; pass a list and the frames are appended for the
    caller to unpersist AFTER its terminal action (a long-lived service
    must not leak cached blocks per request — ADVICE r4). Without it the
    frames stay resident until evicted/cache-cleared."""
    index = index if index is not None else build_variant_index()
    mapping, caches = _distinct_token_mapping(tokens_df, token_col, index, cutoff)
    m, is_literal = mapping_literal_probe(mapping)
    if is_literal:
        # the literal carries the whole mapping; the cascade's cached cut
        # points are dead weight from here on — drop them (service calls
        # run this per request and must not accumulate blocks)
        for c in caches:
            c.unpersist()
        resolved = (
            F.element_at(m, F.col(token_col))
            if m is not None
            else F.lit(None).cast("string")
        )
        return tokens_df.withColumn(out_col, resolved)
    # join path: the returned plan still reads the cached frames, so they
    # stay resident until the caller's action completes / cache is cleared
    if caches_out is not None:
        caches_out.extend(caches)
    mapping = mapping.withColumnRenamed("__canonical", out_col)
    return tokens_df.join(
        F.broadcast(mapping), tokens_df[token_col] == mapping["__t"], "left"
    ).drop("__t")
