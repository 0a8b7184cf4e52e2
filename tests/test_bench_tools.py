"""Bench-tooling invariants (VERDICT r12 What's-wrong #2): merged bench
records must stay internally consistent — derived aggregates recomputed,
never min-merged. Pure-python, no Spark session."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from sf1_bench import _min_merge, _recompute_throughputs  # noqa: E402


def _stream_block(wall, rows_in):
    return {
        "curation_rows_per_sec": round(rows_in / wall, 1),
        "wall_sec": wall,
        "rows_in": rows_in,
        "rows_kept": 42,
        "n_batches": 7,
    }


def test_min_merge_keeps_streaming_blocks_coherent():
    """The r12 bug shape: run A has the better (smaller) wall, run B the
    smaller rows/s (because ITS wall was worse) — leaf-wise min used to
    pair B's rows/s with A's wall. After the fix every merged streaming
    block, including the nested full_stack, satisfies
    rows_per_sec ≡ rows_in / wall_sec."""
    run_a = {
        "queries": {"q1": 1.0},
        "streaming": {**_stream_block(10.0, 5000),
                      "full_stack": _stream_block(80.0, 5000)},
    }
    run_b = {
        "queries": {"q1": 2.0},
        "streaming": {**_stream_block(20.0, 5000),
                      "full_stack": _stream_block(120.0, 5000)},
    }
    merged = _min_merge([run_a, run_b])
    s = merged["streaming"]
    assert s["wall_sec"] == 10.0
    assert s["curation_rows_per_sec"] == round(5000 / 10.0, 1)
    fs = s["full_stack"]
    assert fs["wall_sec"] == 80.0
    assert fs["curation_rows_per_sec"] == round(5000 / 80.0, 1)
    # the plain-wall queries still min-merge and the total recomputes
    assert merged["queries"]["q1"] == 1.0


def test_recompute_throughputs_ignores_incomplete_blocks():
    """Blocks missing wall/rows (or with a zero wall) are left alone —
    the recompute only fires where the identity is well-defined."""
    node = {
        "curation_rows_per_sec": 99.9,
        "rows_in": 100,
        "nested": {"curation_rows_per_sec": 1.0, "rows_in": 10, "wall_sec": 0},
    }
    _recompute_throughputs(node)
    assert node["curation_rows_per_sec"] == 99.9
    assert node["nested"]["curation_rows_per_sec"] == 1.0


def test_min_merge_carries_calibration_sentinel():
    """The drift sentinel (r14): `calibration_sec` is a numeric leaf, so a
    merged record carries the FASTEST session's calibration — consistent
    with the per-query min discipline (each merged leaf is its best
    session's wall, and the sentinel calibrates best-session host speed).
    `vintage` stays the first run's string, untouched by the merge."""
    run_a = {"queries": {"q1": 2.0}, "calibration_sec": 1.40, "vintage": "aa"}
    run_b = {"queries": {"q1": 1.5}, "calibration_sec": 1.25, "vintage": "aa"}
    merged = _min_merge([run_a, run_b])
    assert merged["calibration_sec"] == 1.25
    assert merged["vintage"] == "aa"
    assert merged["merged_runs"] == 2
