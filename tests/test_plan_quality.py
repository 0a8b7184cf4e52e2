"""Mechanical plan-quality gate over EVERY registry query (SURVEY.md §2 J:
expressions-first UDF policy; the 100 TB scale claims).

Grep-level audits ("no F.udf in the repo") miss regressions that creep in
through composition — a refactor that turns a broadcast cross join into a
CartesianProduct, or a pandas UDF that silently degrades to row-at-a-time
BatchEvalPython. This test reads the PHYSICAL plan of every registered
query and pins:

- no ``CartesianProduct`` node anywhere (the two documented exact twins
  use crossJoin(broadcast) → BroadcastNestedLoopJoin, and are row-count
  fenced besides);
- no ``BatchEvalPython`` (row-at-a-time Python UDF) — all Python must be
  Arrow-batched (``ArrowEvalPython`` / ``MapInPandas`` are the sanctioned
  nodes).
"""

from __future__ import annotations

import pytest

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark import registry

QUERIES = registry.all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_has_no_cartesian_or_row_python(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in plan (use a pandas UDF)"
    )


# Targeted plan pins for specific scale fixes — broader than the global
# gate, narrower than a full plan snapshot (which would be brittle).

@pytest.mark.parametrize(
    "name", ["doc_perplexity", "doc_perplexity_bigram"]
)
def test_perplexity_plans_have_no_sort_merge_join(name, spark, sf_dir):
    """r10 plan-audit fix: empty documents attach via a UNION of a pruned
    second scan, never a corpus-keyed join — a regression back to the
    docs-left-join-per_doc shape planned as a SortMergeJoin (a full
    shuffle of both corpus-sized sides at scale)."""
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, (
        f"{name}: corpus-keyed shuffle join crept back into the scorer"
    )


def test_bm25_stats_joins_are_broadcast(spark, sf_dir):
    """BM25's term-stats and constants must ride broadcasts — the serve
    path's scale story is 'only (doc, query-term) hits shuffle'."""
    df = QUERIES["bm25_search"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
