"""Join-strategy operators for skewed / non-equi workloads (SURVEY.md §4
"what Catalyst gives free" + §2 E2 alternative (b)).

- ``salted_join``: manual skew mitigation for when AQE's runtime skew split
  isn't available (e.g. the skewed side feeds a co-grouped operation). The
  fact side gets a deterministic salt from xxhash64 of its key+row identity;
  the dim side is exploded across all salts. Correctness is unchanged
  (equi-join on (key, salt) with dim replicated); hot keys spread over
  ``n_salts`` reducers.

- ``tier2_theta_join``: the dictionary containment tier as a true broadcast
  *non-equi* join — token CONTAINS variant with word boundaries — picking
  the longest matching variant per token via a window. Same longest-first
  invariant as the generated-alternation ``regexp_extract`` path
  (cleaner_v6.py:98-103), but scales to dictionaries too large to compile
  into one regex pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.arabic import WORDCH


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim on ``key`` with the fact side salted across ``n_salts``
    partitions per key. ``dim`` is replicated ×n_salts (keep it the small
    side). Deterministic across cluster layouts and reruns: the salt is
    xxhash64 of the row's *content* (all fact columns), never rand() or
    monotonically_increasing_id() (both depend on partition layout, so the
    reducer-skew distribution would differ run to run). Identical duplicate
    rows share a salt — acceptable: skew comes from hot *keys*, whose rows
    differ in payload columns and therefore spread."""
    salted_fact = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)).cast("int"),
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(salted_dim, [key, "__salt"], how).drop("__salt")


def tier2_theta_join(
    tokens: DataFrame,
    dim: DataFrame,
    norm_col: str = "norm",
    variant_col: str = "variant_norm",
    canonical_col: str = "canonical",
) -> DataFrame:
    """Containment lookup as a broadcast theta join: keep dim rows whose
    variant appears boundary-guarded inside the normalized token, then pick
    the longest variant (ties: lexicographic) per token row.

    Input ``tokens`` must carry a unique ``__tid`` row id. Output adds
    ``canonical`` (NULL when nothing matched)."""
    boundary_pat = F.concat(
        F.lit(f"(?:^|[^{WORDCH}])"),
        F.lit("\\Q"),
        F.col(variant_col),
        F.lit("\\E"),
        F.lit(f"(?:$|[^{WORDCH}])"),
    )
    matched = tokens.join(
        F.broadcast(dim),
        F.call_function("rlike", F.col(norm_col), boundary_pat),
        "left",
    )
    w = Window.partitionBy("__tid").orderBy(
        F.desc(F.length(F.col(variant_col))), F.asc(variant_col)
    )
    return (
        matched.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", variant_col)
    )
