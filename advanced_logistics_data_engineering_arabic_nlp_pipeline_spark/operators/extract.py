"""Semantic extraction & classification (SURVEY.md §2 F1-F4).

Behavioral contract (cleaner_v6.py:223-320, Main.py:406-425), preserved
verbatim — including the reference's dead branch where any airport-regex hit
categorizes as 'Airport Transfer' unconditionally (cleaner_v6.py:284-288):
category parity requires keeping that quirk.

Two implementations of the location scan:

- ``extract_all_locations_expr``: pure Column expression (tiers 1-2).
  Zero-shuffle, whole-stage-codegen, SQL-mirrorable → the oracle-checked
  fast path and the default at scale.
- ``with_all_locations_fuzzy``: adds tier-3 fuzzy via posexplode →
  distinct-resolve-join (operators.lookup) → ordered re-aggregation.
  Costs one groupBy shuffle; used when fuzzy recall is worth it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.arabic import (
    is_admin,
    is_airport,
    is_nile,
    is_ops_only,
    is_round_trip,
    normalize_arabic,
    scrub_round_trip,
    title_first_two_words,
    tokenize_trip,
)

_DIGITS_ONLY = "^[0-9٠-٩]+$"


def extract_all_locations_expr(text: Column, index: dict[str, str] | None = None) -> Column:
    """F2 (cleaner_v6.py:248-266): round-trip scrub → tokenize → per-token
    cascade → order-preserving distinct canonicals. Empty array for null/''.

    ``array_distinct`` keeps first-occurrence order, matching the
    reference's ``if loc not in locations: locations.append(loc)``.

    Normalization is staged through per-token structs so each candidate
    form (token / op-prefix-stripped token) is normalized exactly once —
    HOF lambdas are interpreted without subexpression elimination, so the
    naive per-tier formulation would re-normalize per tier."""
    from ..functions.arabic import normalize_arabic, strip_op_prefix
    from ..operators.lookup import tier12_expr

    raw = F.trim(text.cast("string"))
    tokens = tokenize_trip(scrub_round_trip(raw))
    staged = F.transform(
        tokens,
        lambda t: F.struct(
            normalize_arabic(t).alias("n"),
            F.when(
                strip_op_prefix(t) != "", normalize_arabic(strip_op_prefix(t))
            ).alias("s"),
        ),
    )
    resolved = F.transform(
        staged,
        lambda x: F.coalesce(tier12_expr(x["n"], index), tier12_expr(x["s"], index)),
    )
    hits = F.array_distinct(F.filter(resolved, lambda x: x.isNotNull()))
    return F.when(text.isNull() | (raw == ""), F.array().cast("array<string>")).otherwise(hits)


def end_location_clean_expr(text: Column, locs: Column) -> Column:
    """F4's End_Location_Clean (Main.py:408-417): first detected location,
    else F1's guards/fallback (cleaner_v6.py:223-246). When the scan found
    anything, F1's first hit equals locs[0], so the fallback chain only
    engages on an empty scan."""
    raw = F.trim(text.cast("string"))
    return (
        F.when(F.size(locs) > 0, F.element_at(locs, 1))
        .when(text.isNull() | (raw == ""), F.lit("Undefined"))
        .when(raw.rlike(_DIGITS_ONLY) | (F.length(raw) < 2), F.lit("Unknown"))
        .otherwise(title_first_two_words(raw))
    )


def categorize_trip_type_expr(
    text: Column, locs: Column, norm: Column | None = None
) -> Column:
    """F3 cascade (cleaner_v6.py:268-320) as one ``when`` chain, order and
    dead-code semantics preserved:

    Undefined → Invalid Data → airport regex (always wins, :284-288) →
    admin (locs or regex) → 'Airport' in locs → round-trip regex on RAW →
    Nile (locs or keywords) → Special Operations (locs, or ops-only regex) →
    Multi-Destination (≥2 locs) → Standard Transfer.

    Pass a precomputed ``norm`` column when calling in a pipeline: CASE
    branches evaluate lazily, so an inline normalize would be recomputed
    once per reached regex condition."""
    raw = F.trim(text.cast("string"))
    if norm is None:
        norm = normalize_arabic(text)
    return (
        F.when(text.isNull() | (raw == ""), F.lit("Undefined"))
        .when(F.array_contains(locs, "Invalid Data"), F.lit("Invalid Data"))
        .when(is_airport(norm), F.lit("Airport Transfer"))
        .when(F.array_contains(locs, "Admin/Management"), F.lit("Admin/Management"))
        .when(is_admin(norm), F.lit("Admin/Management"))
        .when(F.array_contains(locs, "Airport"), F.lit("Airport Transfer"))
        .when(is_round_trip(raw), F.lit("Round Trip"))
        .when(F.array_contains(locs, "Nile Cruise") | is_nile(norm), F.lit("Nile Cruise"))
        .when(F.array_contains(locs, "Special Operations"), F.lit("Special Operations"))
        .when(is_ops_only(norm), F.lit("Special Operations"))
        .when(F.size(locs) >= 2, F.lit("Multi-Destination"))
        .otherwise(F.lit("Standard Transfer"))
    )


def with_nlp_enrichment(
    df: DataFrame,
    text_col: str,
    fuzzy: bool = False,
    index: dict[str, str] | None = None,
    locs_col: str = "locs",
    clean_col: str = "End_Location_Clean",
    type_col: str = "Trip_Type",
    caches_out: list | None = None,
) -> DataFrame:
    """F4's full NLP block (locs + clean location + trip type, Main.py:406-425)
    resolved once per *distinct* text, then joined back — the reference's
    lru_cache insight (cleaner_v6.py:37, 180) applied to the whole enrichment,
    not just the dictionary lookup. Every output is a pure function of the
    text, so per-distinct resolution is semantics-preserving.

    Scale: trip texts are short human-entered strings with heavy repetition,
    so the distinct side is orders of magnitude smaller than the fact side
    and AQE broadcast-converts the join-back; the regex-heavy NLP chain runs
    |distinct| times instead of |rows| times. If a workload ever has
    near-unique texts, inline ``extract_all_locations_expr`` instead (the
    expression path needs no shuffle at all)."""
    # Rebalance after the distinct: its output is small in bytes, so AQE
    # coalesces to ~1 partition, which would run the regex-heavy NLP chain
    # below single-threaded when the distinct side is large (the all-unique
    # stress shape). The moved data is just the text strings.
    texts = (
        df.select(F.col(text_col).alias("__txt"))
        .distinct()
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )
    if fuzzy:
        # caches_out threads through to the cascade's cut-point caches so
        # a long-lived caller (CleaningService does this) can unpersist
        # after its terminal action — without it, the broadcast-join path
        # (mapping > MAPPING_LITERAL_MAX) parks cached frames per request
        texts = with_all_locations_fuzzy(
            texts, "__txt", "__txt", locs_col, index, caches_out=caches_out
        )
    else:
        texts = texts.withColumn(
            locs_col, extract_all_locations_expr(F.col("__txt"), index)
        )
    # 1:1 Generate barrier: locs/norm feed many lazily-evaluated CASE
    # branches (no subexpression elimination), so block CollapseProject from
    # inlining the resolution chain into each branch
    texts = texts.withColumn("__norm", normalize_arabic(F.col("__txt")))
    texts = texts.select(
        "__txt",
        F.explode(F.array(F.struct(F.col(locs_col), F.col("__norm")))).alias("__b"),
    ).select(
        "__txt",
        F.col(f"__b.{locs_col}").alias(locs_col),
        F.col("__b.__norm").alias("__norm"),
    )
    texts = texts.withColumn(
        clean_col, end_location_clean_expr(F.col("__txt"), F.col(locs_col))
    )
    texts = texts.withColumn(
        type_col,
        categorize_trip_type_expr(
            F.col("__txt"), F.col(locs_col), norm=F.col("__norm")
        ),
    ).drop("__norm")
    return df.join(
        texts, df[text_col].eqNullSafe(texts["__txt"]), how="left"
    ).drop("__txt")


def with_all_locations_fuzzy(
    df: DataFrame,
    text_col: str,
    id_col: str,
    out_col: str = "all_locations_list",
    index: dict[str, str] | None = None,
    cutoff: float | None = None,
    caches_out: list | None = None,
) -> DataFrame:
    """F2 with tier-3 fuzzy: the full scan runs once per *distinct* text —
    the reference's lru_cache insight (cleaner_v6.py:37, 180) lifted to the
    text level — then the (text → locations) map joins back. Per distinct
    text: posexplode tokens → 3-tier resolve (distinct-fuzzy E4 inside) →
    ordered, order-preserving distinct re-aggregation.

    ``id_col`` is kept for API stability; resolution keys on the text
    itself. At 100 TB the distinct-text side is the small side and AQE
    broadcast-converts the join-back.

    Adaptive application (mirrors operators.lookup.resolve_tokens_fuzzy):
    once the distinct-token cascade has produced the (token → canonical)
    mapping, a mapping under ``MAPPING_LITERAL_MAX`` entries is inlined as
    a literal map and the whole scan becomes ONE zero-shuffle expression
    over ``df`` — identical in shape to the tier-1/2
    :func:`extract_all_locations_expr`, with fuzzy hits included in the
    map. (``df`` is the distinct-text frame when called from
    with_nlp_enrichment, so the per-row tokenize regex runs once per
    distinct text.) A larger mapping falls back to the explode →
    broadcast-join → ordered re-aggregation plan."""
    from .lookup import (
        FUZZY_SCORE_CUTOFF,
        _distinct_token_mapping,
        mapping_literal_probe,
    )
    from ..sources.dictionary import build_variant_index

    index = index if index is not None else build_variant_index()
    cutoff = cutoff if cutoff is not None else FUZZY_SCORE_CUTOFF
    texts = df.select(F.col(text_col).alias("__ftxt")).distinct()
    raw = F.trim(F.col("__ftxt").cast("string"))
    tokens = F.when(
        F.col("__ftxt").isNull() | (raw == ""), F.array().cast("array<string>")
    ).otherwise(tokenize_trip(scrub_round_trip(raw)))

    exploded = texts.select(F.col("__ftxt"), F.posexplode_outer(tokens).alias("__pos", "__tok"))
    mapping, caches = _distinct_token_mapping(exploded, "__tok", index, cutoff)
    m, is_literal = mapping_literal_probe(mapping)
    if is_literal:
        for c in caches:
            c.unpersist()
        draw = F.trim(F.col(text_col).cast("string"))
        if m is None:
            hits = F.array().cast("array<string>")
        else:
            dtoks = tokenize_trip(scrub_round_trip(draw))
            hits = F.array_distinct(
                F.filter(
                    F.transform(dtoks, lambda t: F.element_at(m, t)),
                    lambda x: x.isNotNull(),
                )
            )
        return df.withColumn(
            out_col,
            F.when(
                F.col(text_col).isNull() | (draw == ""),
                F.array().cast("array<string>"),
            ).otherwise(hits),
        )

    # join path: the plan references the cached cut points — hand them to
    # the caller for post-action unpersist (see lookup.resolve_tokens_fuzzy)
    if caches_out is not None:
        caches_out.extend(caches)
    resolved = exploded.join(
        F.broadcast(mapping.withColumnRenamed("__canonical", "__canon")),
        exploded["__tok"] == mapping["__t"],
        "left",
    ).drop("__t")
    rebuilt = (
        resolved.groupBy("__ftxt")
        .agg(
            F.array_distinct(
                F.filter(
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.when(
                                    F.col("__canon").isNotNull(),
                                    F.struct(F.col("__pos"), F.col("__canon").alias("loc")),
                                )
                            )
                        ),
                        lambda x: x["loc"],
                    ),
                    lambda x: x.isNotNull(),
                )
            ).alias(out_col)
        )
    )
    joined = df.join(
        rebuilt, df[text_col].eqNullSafe(rebuilt["__ftxt"]), how="left"
    ).drop("__ftxt")
    return joined.withColumn(
        out_col, F.coalesce(F.col(out_col), F.array().cast("array<string>"))
    )
