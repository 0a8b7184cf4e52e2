"""Properties of the deterministic mixture operators (operators/mixture.py)
that the DuckDB hash-parity checks can't express: layout independence,
seed nesting, budget monotonicity, maximality, and the zero-shuffle plan
shape of the sampling filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import (
    HASH_SPACE,
    dataset_split,
    epoch_shards,
    hash60_expr,
    sample_mixture,
    shard_manifest,
    token_budget_mix,
)
from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.sources.tables import (
    load_table,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


# ---------------------------------------------------------------- sampling


def test_sample_layout_independent(docs):
    """THE core property: the sample must not change with partition layout
    (Spark's rand(seed) fails this — it is seeded per partition)."""
    rates = {"en": 0.5, "zh": 0.3}
    a = _ids(sample_mixture(docs.repartition(3), "lang", rates, seed=42))
    b = _ids(sample_mixture(docs.repartition(11), "lang", rates, seed=42))
    c = _ids(sample_mixture(docs.coalesce(1), "lang", rates, seed=42))
    assert a == b == c and a, "sample varies with partition layout"


def test_sample_seed_sensitivity(docs):
    a = set(_ids(sample_mixture(docs, "lang", {"en": 0.5}, seed=1)))
    b = set(_ids(sample_mixture(docs, "lang", {"en": 0.5}, seed=2)))
    assert a != b, "different seeds drew the same sample"


def test_sample_rates_nest(docs):
    """Ablation property: under one seed, a lower rate's keep set is a
    strict subset of a higher rate's (shared-documents ablations)."""
    lo = set(_ids(sample_mixture(docs, "lang", {"en": 0.2}, seed=9)))
    hi = set(_ids(sample_mixture(docs, "lang", {"en": 0.6}, seed=9)))
    assert lo < hi


def test_sample_rate_accuracy_and_default_drop(docs):
    n_en = docs.filter(F.col("lang") == "en").count()
    kept = sample_mixture(docs, "lang", {"en": 0.5}, seed=4)
    n_kept = kept.count()
    assert kept.filter(F.col("lang") != "en").count() == 0, "default_rate=0 leaked"
    # binomial: mean n*p, sd sqrt(n*p*(1-p)); allow 4 sd
    mean, sd = n_en * 0.5, (n_en * 0.25) ** 0.5
    assert abs(n_kept - mean) <= 4 * sd, (n_kept, mean, sd)


def test_sample_plan_has_no_shuffle(docs):
    plan = sample_mixture(docs, "lang", {"en": 0.5}, seed=4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_hash60_range(docs):
    row = docs.select(hash60_expr("doc_id", seed=1).alias("h")).agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    ).collect()[0]
    assert 0 <= row["lo"] <= row["hi"] < HASH_SPACE


# ------------------------------------------------------------ epoch shards


def test_epoch_shards_partition_cover_and_dense_positions(docs):
    out = epoch_shards(docs.select("doc_id"), n_shards=8, seed=3).collect()
    n = docs.count()
    assert len(out) == n and len({r["doc_id"] for r in out}) == n
    by_shard: dict[int, list[int]] = {}
    for r in out:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), f"shard {shard} positions not dense"


def test_epoch_shards_new_seed_new_permutation(docs):
    base = docs.select("doc_id")
    a = {(r["doc_id"], r["shard"], r["pos_in_shard"]) for r in epoch_shards(base, 8, seed=1).collect()}
    b = {(r["doc_id"], r["shard"], r["pos_in_shard"]) for r in epoch_shards(base, 8, seed=2).collect()}
    assert a != b


def test_epoch_shards_layout_independent(docs):
    base = docs.select("doc_id")
    a = sorted(map(tuple, epoch_shards(base.repartition(3), 8, seed=5).collect()))
    b = sorted(map(tuple, epoch_shards(base.repartition(13), 8, seed=5).collect()))
    assert a == b


def test_epoch_shards_no_global_sort(docs):
    """The plan may sort WITHIN shard partitions but must not contain a
    global (total-order) sort — that is the whole scale point."""
    plan = (
        epoch_shards(docs.select("doc_id"), 8, seed=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan.lower(), plan


# -------------------------------------------------------- token budget mix


def test_token_budget_respected_and_maximal(docs):
    budgets = {"en": 300, "zh": 120}
    out = token_budget_mix(docs, "lang", budgets, seed=5)
    rows = out.collect()
    assert rows, "budget kept nothing — budgets too small for fixture"
    by_lang: dict[str, int] = {}
    for r in rows:
        by_lang[r["lang"]] = max(by_lang.get(r["lang"], 0), r["cum_tok"])
    for lang, cum in by_lang.items():
        assert cum <= budgets[lang], (lang, cum)
    # maximality: for each budgeted lang, the FIRST dropped doc in hash
    # order (if any doc was dropped) would have pushed cum past the budget
    h = hash60_expr("doc_id", 5, salt="tokbudget")
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.textanalysis import (
        token_count,
    )

    full = (
        docs.select("doc_id", "lang", token_count(F.col("text")).alias("n_tok"), h.alias("h"))
        .filter(F.col("lang").isin(*budgets))
        .collect()
    )
    kept_ids = {r["doc_id"] for r in rows}
    for lang, budget in budgets.items():
        ordered = sorted((r for r in full if r["lang"] == lang), key=lambda r: (r["h"], r["doc_id"]))
        cum = 0
        for r in ordered:
            cum += r["n_tok"]
            if cum <= budget:
                assert r["doc_id"] in kept_ids, (lang, r["doc_id"])
            else:
                assert r["doc_id"] not in kept_ids, (lang, r["doc_id"])
                break  # greedy prefix: everything after is dropped too


def test_token_budget_plan_shape(docs):
    """The scale contract: no mixture group ever sorts in one partition.
    The plan must contain NO global (range) sort, and the bucket-offset
    frame must come back as a broadcast, not a shuffled join."""
    plan = (
        token_budget_mix(docs, "lang", {"en": 300}, seed=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan.lower(), plan
    assert "BroadcastExchange" in plan, plan


def test_token_budget_bucket_bits_invariant(docs):
    """The two-level decomposition is exact for ANY bucket width: coarse
    (4-bit) and fine (16-bit) bucketing must produce identical output."""
    a = sorted(map(tuple, token_budget_mix(docs, "lang", {"en": 300, "zh": 120}, seed=5, bucket_bits=4).collect()))
    b = sorted(map(tuple, token_budget_mix(docs, "lang", {"en": 300, "zh": 120}, seed=5, bucket_bits=16).collect()))
    assert a == b


def test_token_budget_monotone_in_budget(docs):
    lo = {r["doc_id"] for r in token_budget_mix(docs, "lang", {"en": 200}, seed=5).collect()}
    hi = {r["doc_id"] for r in token_budget_mix(docs, "lang", {"en": 500}, seed=5).collect()}
    assert lo <= hi and lo != hi, "raising the budget must only ADD documents"


# ----------------------------------------------------- sharded export end-cap


def test_training_export_sharded_composition(spark, sf_dir):
    """Every chunk of the chunked export gets exactly one (epoch_shard,
    epoch_pos); positions are dense per shard at CHUNK granularity; no
    slice rows are gained or lost by the shard join."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.plans.llmdata import (
        training_export_chunks,
    )
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.plans.mixture import (
        EXPORT_SHARDS,
        training_export_sharded,
    )

    base_n = training_export_chunks(spark, sf_dir).count()
    out = training_export_sharded(spark, sf_dir).collect()
    assert len(out) == base_n, "shard join changed the slice-row count"
    per_chunk = {}
    for r in out:
        key = r["chunk_uid"]
        val = (r["epoch_shard"], r["epoch_pos"])
        assert per_chunk.setdefault(key, val) == val, f"chunk {key} got two assignments"
        assert 0 <= r["epoch_shard"] < EXPORT_SHARDS
    by_shard: dict[int, set[int]] = {}
    for shard, pos in per_chunk.values():
        by_shard.setdefault(shard, set()).add(pos)
    for shard, poss in by_shard.items():
        assert poss == set(range(len(poss))), f"shard {shard} positions not dense"


# ------------------------------------------------------------ dataset split


def test_dataset_split_partitions_corpus(docs):
    out = dataset_split(docs.select("doc_id"), seed=11)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    assert counts.get("train", 0) > counts.get("val", 0)


def test_dataset_split_growth_is_monotone(docs):
    """Growing test_frac MOVES docs into test without reshuffling the rest:
    the test set at 5% is a subset of the test set at 10%."""
    base = docs.select("doc_id")
    t5 = {r["doc_id"] for r in dataset_split(base, 11, test_frac=0.05).filter("split = 'test'").collect()}
    t10 = {r["doc_id"] for r in dataset_split(base, 11, test_frac=0.10).filter("split = 'test'").collect()}
    assert t5 <= t10


def test_split_independent_of_sampling(docs):
    """Different salts: sampling at 50% then splitting must not correlate —
    the sampled subset's split fractions stay ~90/5/5, not degenerate."""
    sampled = sample_mixture(docs, "lang", {"en": 1.0, "zh": 1.0, "es": 1.0, "de": 1.0, "fr": 1.0}, seed=11)
    # same seed as the split on purpose: only the salt differs
    out = dataset_split(sampled, seed=11)
    n = out.count()
    n_test = out.filter("split = 'test'").count()
    assert n == docs.count()
    # 5% +- generous binomial slack at fixture size
    mean, sd = n * 0.05, (n * 0.05 * 0.95) ** 0.5
    assert abs(n_test - mean) <= 4 * sd, (n_test, mean)


# ------------------------------------------------------- temperature mix


def test_temperature_rates_shape():
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import (
        temperature_rates,
    )

    w = {"en": 900.0, "fr": 90.0, "zh": 10.0}
    # alpha=1: identity
    assert temperature_rates(w, 1.0) == {"en": 1.0, "fr": 1.0, "zh": 1.0}
    # alpha=0: expected kept mass EQUAL per group (w_min each)
    r0 = temperature_rates(w, 0.0)
    masses = {g: w[g] * r0[g] for g in w}
    assert all(abs(m - 10.0) < 1e-9 for m in masses.values()), masses
    # alpha=0.5: proportional to sqrt(p) -> kept mass ratio sqrt(w)-shaped
    r5 = temperature_rates(w, 0.5)
    assert abs((w["en"] * r5["en"]) / (w["zh"] * r5["zh"]) - (900 / 10) ** 0.5) < 1e-9
    # zero-weight groups omitted; out-of-range alpha raises
    assert "x" not in temperature_rates({"x": 0.0, "y": 5.0}, 0.5)
    with pytest.raises(ValueError):
        temperature_rates(w, 1.5)


def test_temperature_mix_alpha1_identity(docs):
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import (
        temperature_mix,
    )

    kept = temperature_mix(docs, "lang", 1.0, seed=7)
    assert _ids(kept) == _ids(docs)


def test_temperature_mix_alpha0_uniform_mass(docs):
    """At alpha=0 every group's EXPECTED kept char mass equals the
    smallest group's total; check within binomial-ish slack."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import (
        temperature_mix,
    )

    w = {
        r["lang"]: r["w"]
        for r in docs.groupBy("lang").agg(F.sum("n_chars").alias("w")).collect()
    }
    w_min = min(w.values())
    kept = temperature_mix(docs, "lang", 0.0, seed=7, weight_col="n_chars")
    got = {
        r["lang"]: r["w"]
        for r in kept.groupBy("lang").agg(F.sum("n_chars").alias("w")).collect()
    }
    for g, target in w.items():
        # expected w_min; slack: 4 * sqrt(rate*(1-rate)*n_docs_g) * avg_chars
        # collapsed to a generous 60% relative band at fixture size
        assert abs(got.get(g, 0) - w_min) <= 0.6 * w_min + 4 * 300, (g, got.get(g), w_min)


def test_temperature_mix_nested_in_alpha(docs):
    """Rates are monotone in alpha, so keep sets under one seed nest:
    ablations at several temperatures share documents."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import (
        temperature_mix,
    )

    k3 = set(_ids(temperature_mix(docs, "lang", 0.3, seed=7, weight_col="n_chars")))
    k7 = set(_ids(temperature_mix(docs, "lang", 0.7, seed=7, weight_col="n_chars")))
    k10 = set(_ids(temperature_mix(docs, "lang", 1.0, seed=7, weight_col="n_chars")))
    assert k3 <= k7 <= k10
    assert len(k3) < len(k7) < len(k10)  # non-vacuous at fixture scale


def test_temperature_mix_layout_independent(docs):
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import (
        temperature_mix,
    )

    a = _ids(temperature_mix(docs.repartition(7), "lang", 0.5, seed=9))
    b = _ids(temperature_mix(docs.coalesce(1), "lang", 0.5, seed=9))
    assert a == b


def test_temperature_mix_max_groups_guard(docs):
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import (
        temperature_mix,
    )

    with pytest.raises(ValueError, match="groups"):
        temperature_mix(docs, "doc_id", 0.5, seed=7, max_groups=10)


def test_temperature_mix_duckdb_parity(spark, sf_dir):
    """The full cross-engine oracle, with the thresholds computed the way
    the operator computes them: DuckDB aggregates the group weights, the
    SAME temperature_rates turns them into integer thresholds, and the
    keep decision is the same 60-bit integer comparison on both engines —
    no float crosses the engine boundary (registry docstring contract:
    this test IS temperature_mix's oracle; the driver sees rows-only)."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import (
        temperature_rates,
    )
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.plans.mixture import (
        TEMP_ALPHA,
        TEMP_SEED,
        temperature_mix as temperature_mix_query,
    )
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import (
        HASH_SPACE as HS,
    )
    from tests.oracle_util import compare, duckdb_conn

    con = duckdb_conn(sf_dir)
    try:
        w = {
            g: float(x)
            for g, x in con.execute(
                "SELECT lang, SUM(n_chars) FROM documents GROUP BY lang"
            ).fetchall()
        }
        rates = temperature_rates(w, TEMP_ALPHA)
        whens = " ".join(
            f"WHEN '{g}' THEN {int(r * HS)}" for g, r in sorted(rates.items())
        )
        sql = f"""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE ('0x' || substr(md5('mixsample:{TEMP_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              < CASE lang {whens} ELSE 0 END
        ORDER BY doc_id
        """
        compare(temperature_mix_query(spark, sf_dir), con, sql)
    finally:
        con.close()


def test_temperature_mix_null_group_raises(spark):
    """NULL group labels can't ride the rate cascade (col == lit never
    matches NULL) — the operator must fail loudly with guidance instead
    of crashing on the threshold sort or silently dropping the rows."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import (
        temperature_mix,
    )

    df = spark.createDataFrame(
        [(1, "en"), (2, None), (3, "fr")], "doc_id long, lang string"
    )
    with pytest.raises(ValueError, match="NULL"):
        temperature_mix(df, "lang", 1.0, seed=7)


# ---------------------------------------------------------- shard manifest

def test_shard_manifest_consistent_with_epoch_shards(docs):
    """The manifest must describe exactly the shards epoch_shards emits:
    same seed/salt formula, so per-shard doc counts agree."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.plans.mixture import (
        N_SHARDS,
        SHARD_SEED,
    )

    man = {
        r["shard"]: r["n_docs"]
        for r in shard_manifest(docs, N_SHARDS, SHARD_SEED).collect()
    }
    direct = {
        r["shard"]: r["cnt"]
        for r in epoch_shards(docs.select("doc_id", "lang"), N_SHARDS, SHARD_SEED)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert man == direct
    assert sum(man.values()) == docs.count()


def test_shard_manifest_detects_tamper_and_loss(spark):
    """The verification semantics the manifest exists for: corrupting one
    document flips ONLY its shard's content_sig; dropping a document
    changes that shard's n_docs; untouched shards hash identically. The
    signature is order-independent (reversing arrival order changes
    nothing)."""
    rows = [(i, f"document body {i}", 10 + i) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    base = {
        r["shard"]: (r["n_docs"], r["total_weight"], r["content_sig"])
        for r in shard_manifest(df, 4, 3, weight_col="n_chars").collect()
    }

    # order independence: a reversed frame produces the identical manifest
    rev = spark.createDataFrame(list(reversed(rows)), df.schema)
    assert base == {
        r["shard"]: (r["n_docs"], r["total_weight"], r["content_sig"])
        for r in shard_manifest(rev, 4, 3, weight_col="n_chars").collect()
    }

    # tamper: one flipped byte in doc 7 changes exactly one shard's sig
    tampered = [(i, ("XX" if i == 7 else "") + t, n) for i, t, n in rows]
    tam = {
        r["shard"]: (r["n_docs"], r["total_weight"], r["content_sig"])
        for r in shard_manifest(
            spark.createDataFrame(tampered, df.schema), 4, 3, weight_col="n_chars"
        ).collect()
    }
    diff = {s for s in base if base[s][2] != tam[s][2]}
    assert len(diff) == 1
    assert all(base[s][0] == tam[s][0] for s in base)  # counts unchanged

    # loss: dropping doc 7 changes that same shard's n_docs
    lost = {
        r["shard"]: r["n_docs"]
        for r in shard_manifest(
            spark.createDataFrame([r for r in rows if r[0] != 7], df.schema),
            4,
            3,
            weight_col="n_chars",
        ).collect()
    }
    (shard7,) = diff
    assert lost[shard7] == base[shard7][0] - 1
    assert all(lost[s] == base[s][0] for s in base if s != shard7)


# ------------------------------------------------- quality-weighted sample

def test_quality_weighted_sample_exact_expected_set(spark):
    """The kept set equals the Python-side replication of the integer-hash
    draw exactly: per-row 60-bit md5 hash vs the band's integer threshold —
    no float, no statistics, bit-for-bit."""
    import hashlib

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import (
        quality_weighted_sample,
    )

    bands = [(0.99, 1.0), (0.5, 0.5), (0.0, 0.1)]
    # three score levels, 60 docs each
    rows = [(i, [1.0, 0.6, 0.3][i % 3]) for i in range(180)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    got = sorted(
        r["doc_id"]
        for r in quality_weighted_sample(df, "score", bands, seed=19).collect()
    )

    def h60(i):
        return int(
            hashlib.md5(f"qsample:19:{i}".encode()).hexdigest()[:15], 16
        )

    def rate(s):
        for ms, r in sorted(bands, reverse=True):
            if s >= ms:
                return r
        return 0.0

    want = sorted(
        i for i, s in rows if h60(i) < int(rate(s) * HASH_SPACE)
    )
    assert got == want
    # the top band keeps EVERYTHING at rate 1.0
    assert {i for i in got if i % 3 == 0} == {i for i in range(180) if i % 3 == 0}


def test_quality_weighted_sample_nests_in_rates(spark):
    """Raising a band's rate only ADDS documents (same hash, higher
    threshold) — quality-mix ablations share their kept sets."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import (
        quality_weighted_sample,
    )

    rows = [(i, [1.0, 0.6, 0.3][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    lo = {
        r["doc_id"]
        for r in quality_weighted_sample(
            df, "score", [(0.99, 1.0), (0.5, 0.3), (0.0, 0.05)], seed=19
        ).collect()
    }
    hi = {
        r["doc_id"]
        for r in quality_weighted_sample(
            df, "score", [(0.99, 1.0), (0.5, 0.6), (0.0, 0.2)], seed=19
        ).collect()
    }
    assert lo < hi


def test_quality_weighted_sample_validation(spark):
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import (
        quality_weighted_sample,
    )

    df = spark.createDataFrame([(1, 0.5)], "doc_id long, score double")
    with pytest.raises(ValueError, match="non-empty"):
        quality_weighted_sample(df, "score", [], seed=1)
    with pytest.raises(ValueError, match="outside"):
        quality_weighted_sample(df, "score", [(0.5, 1.5)], seed=1)
    with pytest.raises(ValueError, match="duplicate"):
        quality_weighted_sample(df, "score", [(0.5, 0.2), (0.5, 0.4)], seed=1)
    # inverted bands (better docs downsampled harder) violate the
    # documented monotone-step contract and must fail loudly
    with pytest.raises(ValueError, match="non-decreasing"):
        quality_weighted_sample(
            df, "score", [(0.9, 0.1), (0.5, 0.8)], seed=1
        )


def test_verify_manifest_full_protocol(spark):
    """Ship → verify round trip: intact delivery is all-ok; a tampered doc
    fails exactly its shard's sig_match with docs_delta 0; a lost doc
    shows docs_delta -1; a shard missing entirely from the delivery still
    appears in the report as failed."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import (
        shard_manifest,
        verify_manifest,
    )

    rows = [(i, f"document body {i}", 10 + i) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    man = shard_manifest(df, 4, 3, weight_col="n_chars")

    # intact
    rep = verify_manifest(df, man, 4, 3, weight_col="n_chars").collect()
    assert len(rep) == 4 and all(r["ok"] for r in rep)

    # tampered doc 7: its shard fails on sig only
    tam = spark.createDataFrame(
        [(i, ("XX" if i == 7 else "") + t, n) for i, t, n in rows], df.schema
    )
    rep = {r["shard"]: r for r in verify_manifest(
        tam, man, 4, 3, weight_col="n_chars").collect()}
    bad = [s for s, r in rep.items() if not r["ok"]]
    assert len(bad) == 1
    assert rep[bad[0]]["docs_delta"] == 0 and not rep[bad[0]]["sig_match"]

    # lost doc 7: same shard, docs_delta -1
    lost = spark.createDataFrame([r for r in rows if r[0] != 7], df.schema)
    rep = {r["shard"]: r for r in verify_manifest(
        lost, man, 4, 3, weight_col="n_chars").collect()}
    assert rep[bad[0]]["docs_delta"] == -1 and not rep[bad[0]]["ok"]

    # whole shard missing from the delivery: still reported, failed
    h60 = None
    import hashlib
    def shard_of(i):
        return int(hashlib.md5(f"epoch:3:{i}".encode()).hexdigest()[:15], 16) % 4
    keep_shards = {0, 1, 2}
    part = spark.createDataFrame(
        [r for r in rows if shard_of(r[0]) in keep_shards], df.schema
    )
    rep = {r["shard"]: r for r in verify_manifest(
        part, man, 4, 3, weight_col="n_chars").collect()}
    assert len(rep) == 4 and not rep[3]["ok"]


def test_registry_verify_manifest_flags_exactly_perturbed_shards(spark, sf_dir):
    """The registered receive-side query (plans/mixture.verify_manifest)
    perturbs two documents — one dropped, one corrupted — and the verdict
    rows must fail EXACTLY the shards those documents hash into, with the
    right failure shape: the dropped doc's shard shows docs_delta -1, the
    corrupted doc's shard shows docs_delta 0 with sig_match false (its
    n_chars metadata is untouched, so only the signature can catch it)."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.plans.mixture import (
        N_SHARDS,
        SHARD_SEED,
        VERIFY_CORRUPT_ID,
        VERIFY_DROP_ID,
        verify_manifest as vm_query,
    )

    import hashlib

    def shard_of(i: int) -> int:
        return (
            int(hashlib.md5(f"epoch:{SHARD_SEED}:{i}".encode()).hexdigest()[:15], 16)
            % N_SHARDS
        )

    s_drop, s_corrupt = shard_of(VERIFY_DROP_ID), shard_of(VERIFY_CORRUPT_ID)
    rep = {r["shard"]: r for r in vm_query(spark, sf_dir).collect()}
    bad = {s for s, r in rep.items() if not r["ok"]}
    assert bad == {s_drop, s_corrupt}
    assert rep[s_drop]["docs_delta"] == -1 and not rep[s_drop]["sig_match"]
    if s_corrupt != s_drop:
        assert rep[s_corrupt]["docs_delta"] == 0
    assert not rep[s_corrupt]["sig_match"]
    # every other shard intact
    for s, r in rep.items():
        if s not in bad:
            assert r["ok"] and r["sig_match"] and r["docs_delta"] == 0


def test_token_budget_zero_budget_drops_empty_docs(spark):
    """ADVICE r8: a zero-token document (empty/whitespace text) satisfies
    cum_tok 0 <= 0, so without the explicit budget > 0 leg it leaked
    through a zero-budget ('drop unlisted groups') mixture. Zero budget
    must now mean the GROUP is dropped unconditionally — matching
    sample_mixture's rate-0 semantics — while zero-token docs in a
    positive-budget group still pass (they cost nothing)."""
    df = spark.createDataFrame(
        [
            (1, "en", "alpha beta gamma"),
            (2, "en", ""),              # zero tokens, positive budget: kept
            (3, "xx", ""),              # zero tokens, ZERO budget: dropped
            (4, "xx", "   \t  "),       # whitespace-only, ZERO budget: dropped
            (5, "xx", "real words here"),  # positive tokens, zero budget: dropped
        ],
        "doc_id long, lang string, text string",
    )
    out = token_budget_mix(df, "lang", {"en": 100}, seed=5)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 2]


# ------------------------------------------------------- curriculum order


def _curriculum(df, **kw):
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import (
        curriculum_order,
    )

    return curriculum_order(df, **kw)


def test_curriculum_stage_assignment_and_dense_positions(docs):
    base = docs.select("doc_id", "n_chars")
    out = _curriculum(
        base, score_col="n_chars", stage_mins=[200.0, 120.0],
        n_shards=4, seed=9,
    ).collect()
    # stage follows the floors exactly
    for r in out:
        if r["n_chars"] >= 200:
            assert r["stage"] == 0
        elif r["n_chars"] >= 120:
            assert r["stage"] == 1
        else:
            assert r["stage"] == 2
    # positions are dense 0..k-1 within every (stage, shard) cell
    cells: dict = {}
    for r in out:
        cells.setdefault((r["stage"], r["shard"]), []).append(r["pos_in_shard"])
    for cell, poss in cells.items():
        assert sorted(poss) == list(range(len(poss))), cell
    # partition of the input: every row exactly once
    assert len(out) == base.count()


def test_curriculum_new_seed_reshuffles_within_stage_only(docs):
    base = docs.select("doc_id", "n_chars")
    kw = dict(score_col="n_chars", stage_mins=[200.0, 120.0], n_shards=4)
    a = {r["doc_id"]: (r["stage"], r["shard"], r["pos_in_shard"])
         for r in _curriculum(base, seed=1, **kw).collect()}
    b = {r["doc_id"]: (r["stage"], r["shard"], r["pos_in_shard"])
         for r in _curriculum(base, seed=2, **kw).collect()}
    # the curriculum (stage) is the score's: identical across seeds
    assert all(a[i][0] == b[i][0] for i in a)
    # the within-stage order is the seed's: it must move
    assert any(a[i][1:] != b[i][1:] for i in a)


def test_curriculum_no_global_sort_and_validation(docs):
    plan = (
        _curriculum(
            docs.select("doc_id", "n_chars"),
            score_col="n_chars", stage_mins=[200.0, 120.0],
            n_shards=4, seed=9,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan.lower(), plan
    with pytest.raises(ValueError, match="descending"):
        _curriculum(
            docs.select("doc_id", "n_chars"),
            score_col="n_chars", stage_mins=[120.0, 200.0],
            n_shards=4, seed=9,
        )


# ------------------------------------------------------------------- DSIR

def test_dsir_selection_layout_independent_and_nested(docs, spark):
    """The mixture-family core properties, applied to DSIR: the selected
    set must not change with partition layout, and top-k must NEST in
    top-k' for k < k' (Gumbel keys are per-row constants, so the ranking
    is global and stable)."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import dsir_resample

    tgt = docs.filter(F.col("source") == "src0")
    raw = docs.filter(F.col("source") != "src0")
    a = _ids(dsir_resample(raw, tgt, k=30, seed=7))
    b = _ids(dsir_resample(raw.repartition(17), tgt.coalesce(1), k=30, seed=7))
    assert a == b and len(a) == 30
    big = _ids(dsir_resample(raw, tgt, k=60, seed=7))
    assert set(a) <= set(big)


def test_dsir_weights_favor_target_like_docs(spark):
    """Semantic sanity on a constructed corpus: raw docs written in the
    target's vocabulary must out-weigh raw docs written in disjoint junk
    vocabulary (the paper's point — importance weights order docs by
    resemblance to the target distribution)."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import (
        dsir_log_ratio_table,
        dsir_resample,
    )

    tgt_text = "alpha beta gamma delta epsilon zeta eta theta"
    junk_text = "zork blap quux flim gnar wibble vex jolt"
    target = spark.createDataFrame(
        [(100 + i, tgt_text) for i in range(5)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(i, tgt_text) for i in range(10)]
        + [(50 + i, junk_text) for i in range(10)],
        "doc_id long, text string",
    )
    out = dsir_resample(raw, target, k=20, seed=3)
    w = {r["doc_id"]: r["log_weight"] for r in out.collect()}
    assert min(w[i] for i in range(10)) > max(w[50 + i] for i in range(10))
    # and the weights are what the lam table implies: every target-vocab
    # doc shares one weight, every junk doc another (identical texts)
    assert len({w[i] for i in range(10)}) == 1
    assert len({w[50 + i] for i in range(10)}) == 1
    lam = dsir_log_ratio_table(raw, target)
    assert lam.count() > 0


def test_dsir_rerun_identical_and_seed_moves_the_margin(docs):
    """Re-running under one seed reproduces the selection bit-for-bit
    (resume/audit property); a different seed re-rolls both the feature
    hash and the Gumbel noise, so the MARGINAL members change while the
    strongly-target-like core persists — sanity that the seed is wired
    through, without over-promising which docs move."""
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators.mixture import dsir_resample

    tgt = docs.filter(F.col("source") == "src0")
    raw = docs.filter(F.col("source") != "src0")
    a1 = [tuple(r) for r in dsir_resample(raw, tgt, k=50, seed=7).collect()]
    a2 = [tuple(r) for r in dsir_resample(raw, tgt, k=50, seed=7).collect()]
    assert a1 == a2 and len(a1) == 50
    b = [tuple(r) for r in dsir_resample(raw, tgt, k=50, seed=8).collect()]
    assert b != a1


def test_token_budget_mix_bpe_python_reference_parity(spark, sf_dir):
    """The r12 real-token budget (token_budget_mix(tokens_col=) over
    encode_bpe units) replayed exactly in Python: same md5-prefix hash
    order, same greedy whole-document prefix per language, budgets from
    BPE_TOKEN_BUDGETS — and the budgets demonstrably BIND (at least one
    language cuts mid-group) at the test SF."""
    import hashlib

    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.operators import bpe
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.plans.llmdata import (
        BPE_MIN_COUNT,
        BPE_N_MERGES,
    )
    from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark.plans.mixture import (
        BPE_TOKEN_BUDGETS,
        BUDGET_SEED,
        token_budget_mix_bpe,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe.train_bpe(docs, n_merges=BPE_N_MERGES, min_count=BPE_MIN_COUNT)
    enc = {
        r["doc_id"]: len(r["bpe_tokens"])
        for r in bpe.encode_bpe(docs, merges).collect()
    }
    langs = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}

    def h60(i):
        return int(
            hashlib.md5(f"tokbudget:{BUDGET_SEED}:{i}".encode()).hexdigest()[:15],
            16,
        )

    by_lang: dict = {}
    for d in enc:
        by_lang.setdefault(langs[d], []).append(d)
    want = {}
    for lang, ids in by_lang.items():
        budget = BPE_TOKEN_BUDGETS.get(lang, 0)
        if budget <= 0:
            continue
        cum = 0
        for d in sorted(ids, key=lambda i: (h60(i), i)):
            cum += enc[d]
            if cum > budget:
                break
            want[d] = (lang, enc[d], cum)

    got = {
        r["doc_id"]: (r["lang"], r["n_tok"], r["cum_tok"])
        for r in token_budget_mix_bpe(spark, sf_dir).collect()
    }
    assert got == want
    # budgets bind: some language kept a strict, non-empty prefix
    kept_by_lang: dict = {}
    for d, (lang, _, _) in want.items():
        kept_by_lang[lang] = kept_by_lang.get(lang, 0) + 1
    assert any(
        0 < kept_by_lang.get(lang, 0) < len(by_lang[lang])
        for lang in kept_by_lang
    )
    # es has no budget entry: the default-0 leg drops the whole group
    assert not any(lang == "es" for lang, _, _ in got.values())
