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

import re

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
    differ in payload columns and therefore spread.

    Join types that preserve unmatched DIM rows are rejected: the dim side
    is exploded ×n_salts, so a right/full outer join would emit every
    unmatched dim row n_salts times — silently wrong counts."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti",
                   "semi", "anti", "cross"):
        raise ValueError(
            f"salted_join cannot express how={how!r}: the dim side is"
            f" replicated per salt, so unmatched dim rows would duplicate"
            f" ×{n_salts}. Use an unsalted join (AQE skew-join handles"
            f" moderate skew) for right/full outer semantics."
        )
    salted_fact = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)).cast("int"),
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(salted_dim, [key, "__salt"], how).drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Point-in-time (as-of) join: for every left row, attach the payload of
    the LATEST right row with the same ``key`` and ``right_ts <= left_ts``
    (NULLs when no such row) — the standard operator Spark lacks natively
    (SURVEY.md §2 I gap; DuckDB expresses it as ``ASOF LEFT JOIN``, which is
    the oracle mirror).

    Implementation is the union–window formulation, not a range join: tag
    both sides, union on (key, ts), and carry the payload forward as ONE
    packed struct with ``last(struct, ignorenulls=True)`` over a
    (key)-partitioned, (ts, side)-ordered running window; keep only left
    rows and unpack. Filling the struct (not each column independently)
    guarantees every payload column comes from the SAME matched right row —
    a per-column fill would silently backfill a NULL payload field from an
    older right row, diverging from ASOF semantics (the matched row's NULL
    must win). ONE shuffle on the key, sort within partitions, zero row
    amplification — a theta/range join would fan out
    |left|×|right-per-key| rows before picking the max. Skewed keys behave
    like any keyed window (salt upstream if one key dominates).

    Ties: a right row at exactly ``left_ts`` is visible (sorts before the
    left row), matching ASOF's ``>=``. Callers must pre-reduce duplicate
    (key, right_ts) rows (e.g. keep the max-payload row) — otherwise which
    duplicate wins is nondeterministic in BOTH engines."""
    lcols = left.columns
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in payload_cols],
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        *[F.col(c) for c in payload_cols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # right rows pack their payload into a non-null struct; left rows
    # contribute NULL (a bare struct of NULL fields is itself non-null, so
    # the when() guard is what makes ignorenulls skip left rows)
    packed = F.when(F.col("__side") == 0, F.struct(*payload_cols))
    filled = l.unionByName(r).select(
        "__side",
        *lcols,
        F.last(packed, ignorenulls=True).over(w).alias("__p"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__p.{c}").alias(c) for c in payload_cols]
    )


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
    # a variant containing the literal sequence \E would terminate the
    # \Q…\E quote early and compile the remainder as live regex — split
    # any embedded \E back out as quoted text (the standard \Q-escaping)
    safe_variant = F.regexp_replace(
        F.col(variant_col), re.escape("\\E"), "\\\\E\\\\\\\\E\\\\Q"
    )
    boundary_pat = F.concat(
        F.lit(f"(?:^|[^{WORDCH}])"),
        F.lit("\\Q"),
        safe_variant,
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


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_seconds: int,
) -> DataFrame:
    """Interval (range) join: pair every point row with every interval row
    sharing the ``on`` keys where ``start_ts <= point_ts < end_ts``
    (half-open). The second time-join operator Spark lacks natively
    (SURVEY.md §2 I gap; the sibling of :func:`asof_join`).

    Naive Spark planning of a BETWEEN predicate is a broadcast-nested-loop
    (O(|points|·|intervals|) per key). Instead both sides are bucketed into
    fixed ``bin_seconds`` time bins — intervals explode to one row per
    covered bin, points map to exactly one bin — turning the theta join into
    an EQUI-join on (keys, bin) that hash-shuffles and AQE-skew-splits like
    any other. The exact predicate then filters within the bin collisions.

    No dedup pass is needed: a point's bin is unique and an interval covers
    each bin at most once, so a (point, interval) match is produced exactly
    once. Bin truncation is monotonic, so a matching point's bin always lies
    in the interval's covered-bin range.

    Row amplification = interval_len/bin_seconds + 1 per interval row; pick
    ``bin_seconds`` near the typical interval length (amplification ≈ 2).
    At 100 TB the shuffle is keyed by (keys, bin): time-locality keeps bins
    balanced, and a hot key still splits across its bins.
    """
    p = points.withColumn(
        "__bin", F.floor(F.col(point_ts).cast("double") / bin_seconds).cast("long")
    )
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_ts).cast("double") / bin_seconds).cast("long"),
                F.floor(F.col(end_ts).cast("double") / bin_seconds).cast("long"),
            )
        ),
    )
    return (
        p.join(i, on + ["__bin"])
        .filter(
            (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
        )
        .drop("__bin")
    )
