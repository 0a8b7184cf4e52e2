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

def _lcs_len(a: str, b: str) -> int:
    """Longest-common-subsequence length, O(len_a*len_b) rolling DP."""
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1]


def token_sort_ratio(a: str, b: str) -> float:
    a2 = " ".join(sorted(a.split()))
    b2 = " ".join(sorted(b.split()))
    total = len(a2) + len(b2)
    if total == 0:
        return 0.0
    return 200.0 * _lcs_len(a2, b2) / total


def fuzzy_best_match(
    norm: str, variants: list[str], cutoff: float = FUZZY_SCORE_CUTOFF
) -> str | None:
    """extractOne semantics: best score ≥ cutoff; ties keep the earliest
    candidate (strictly-greater replacement).

    Length blocking (lossless): score = 200·LCS/(la+lb) and LCS ≤ min(la,lb),
    so score ≥ cutoff requires min/max ≥ cutoff/(200-cutoff). Candidates
    outside that length window can never reach the cutoff and are skipped —
    at 100 TB dictionary sizes this is the first-stage prune the reference's
    survey flags as the tier-3 scaling risk (SURVEY.md §7 risk 1)."""
    best, best_score = None, None
    # effective (token-sorted, single-spaced) lengths — the strings the
    # ratio is actually computed on; raw lengths over-prune when the input
    # carries extra whitespace
    ln = len(" ".join(norm.split()))
    ratio_bound = cutoff / (200.0 - cutoff)
    for v in variants:
        lv = len(" ".join(v.split()))
        mn, mx = (ln, lv) if ln <= lv else (lv, ln)
        if mx > 0 and mn / mx < ratio_bound:
            continue
        s = token_sort_ratio(norm, v)
        if s >= cutoff and (best_score is None or s > best_score):
            best, best_score = v, s
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

def resolve_tokens_fuzzy(
    tokens_df: DataFrame,
    token_col: str = "token",
    out_col: str = "canonical",
    index: dict[str, str] | None = None,
    cutoff: float = FUZZY_SCORE_CUTOFF,
) -> DataFrame:
    """Full 3-tier resolution of a token column, fuzzy included.

    Cascade order matches the reference exactly: t1(tok), t2(tok), t3(tok),
    then — only if the raw op-prefix-stripped token is non-empty — t1, t2, t3
    of the stripped form. Fuzzy runs once per *distinct* unresolved
    normalized string, and the tiny resolved map is broadcast-joined back.
    """
    index = index if index is not None else build_variant_index()
    fuzzy = fuzzy_lookup_udf(index, cutoff)
    tok = F.col(token_col)
    stripped = strip_op_prefix(tok)

    df = (
        tokens_df.withColumn("__norm", normalize_arabic(tok))
        .withColumn("__sraw", stripped)
        .withColumn("__snorm", normalize_arabic(stripped))
        .withColumn("__r12", tier12_expr(F.col("__norm"), index))
        .withColumn("__r12s", tier12_expr(F.col("__snorm"), index))
    )

    # distinct normalized misses (token form and stripped form) → one fuzzy
    # evaluation each, then broadcast join back on the normalized string
    miss_n = df.filter(F.col("__r12").isNull()).select(F.col("__norm").alias("__k"))
    miss_s = df.filter(
        F.col("__r12").isNull()
        & F.col("__r12s").isNull()
        & (F.col("__sraw") != "")
    ).select(F.col("__snorm").alias("__k"))
    resolved = (
        miss_n.union(miss_s)
        .distinct()
        .withColumn("__fz", fuzzy(F.col("__k")))
        .filter(F.col("__fz").isNotNull())
    )

    df = (
        df.join(
            F.broadcast(resolved.withColumnRenamed("__fz", "__fzn")),
            df["__norm"] == resolved["__k"],
            "left",
        )
        .drop("__k")
        .join(
            F.broadcast(
                resolved.withColumnRenamed("__fz", "__fzs").withColumnRenamed("__k", "__k2")
            ),
            F.col("__snorm") == F.col("__k2"),
            "left",
        )
        .drop("__k2")
    )

    out = F.coalesce(
        F.col("__r12"),
        F.col("__fzn"),
        F.when(
            F.col("__sraw") != "",
            F.coalesce(F.col("__r12s"), F.col("__fzs")),
        ),
    )
    return df.withColumn(out_col, out).drop(
        "__norm", "__sraw", "__snorm", "__r12", "__r12s", "__fzn", "__fzs"
    )
