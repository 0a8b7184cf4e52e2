"""Optimizer fence for expensive derived columns.

Catalyst shares NOTHING through an alias: ``CollapseProject`` inlines a
projected expression into every downstream usage site, and
``PushPredicateThroughNonJoin`` inlines it into filter predicates — so a
heavy text expression referenced by k consumers is evaluated k times per
row. Codegen subexpression elimination does not recover the cost for the
expressions that need it most: higher-order functions (``filter`` /
``aggregate`` / ``transform`` lambdas) are CodegenFallback and CaseWhen
branches are excluded from CSE outright. Measured on ``quality_sample``
at sf1: the band filter + output projection re-evaluated the quality
expression (internally ~8 tokenizations) on both sides of the plan —
4.2 s for what is a 0.8 s single scan.

The fence is the 1:1 Generate barrier already used by the NLP cascade
(operators/extract.py:161): ``explode(array(struct(<cols>)))`` computes
the expressions ONCE per row inside a Generate node; a predicate that
references a generator output cannot push below it, and projections
above reference plain attributes. Exactly row-preserving (the array has
one non-null struct element — NULL column values ride inside it), fully
deterministic, no caching/persist, and composes with column pruning
below the Generate.

Use it where ONE expensive expression feeds BOTH a filter and the output
(or several downstream expressions). Don't use it for cheap expressions:
the Generate node costs a per-row struct copy and splits the codegen
stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compute_once(df: DataFrame, cols: dict[str, Column]) -> DataFrame:
    """Append ``cols`` (name → expression) to ``df``, each computed
    exactly once per row behind a 1:1 Generate barrier. Equivalent to
    chained ``withColumn`` calls for NEW names; unlike ``withColumn``
    it refuses name collisions instead of replacing — the final select
    would otherwise carry duplicate/ambiguous columns into downstream
    resolution (ADVICE r13), and a fenced expression that references
    the column it shadows has no non-ambiguous meaning here."""
    if not cols:
        return df
    base = list(df.columns)
    if "__fence" in base:
        raise ValueError(
            "compute_once: input already has a '__fence' column — rename "
            "it first (the fence struct uses that name internally)"
        )
    clash = [n for n in cols if n in base]
    if clash:
        raise ValueError(
            f"compute_once: cols {clash} collide with existing columns — "
            "use new output names (select/rename the originals away first)"
        )
    fenced = df.select(
        *base,
        F.explode(
            F.array(F.struct(*[c.alias(n) for n, c in cols.items()]))
        ).alias("__fence"),
    )
    return fenced.select(
        *base, *[F.col(f"__fence.{n}").alias(n) for n in cols]
    )
