"""Standing sf1 scale-proof cadence (VERDICT r4 "Next round" #4).

The sf0.1 bench alone missed both round-4 scale findings (the PQ per-query
encode accounting and the shingle-vocabulary saturation cliff) — only the
10× run surfaced them. This runner makes the sf1 record a per-round
refresh, not a one-off:

1. ensures sf1 fixtures exist (tools/gen_sf1.py → $SF1_DIR, default
   /tmp/sf1),
2. runs bench.py twice — once at sf1, once at sf0.1 with the SAME code —
   unless pre-captured JSON lines are supplied,
3. rewrites BENCH_sf1.json with per-query 10×-data scale ratios, the ANN
   build/serve split at both SFs, and a ``previous_round`` block diffing
   the ratios against the record it replaces (regressions > 1.3× listed
   first).

Observations are analysis, not measurement: the previous record's
``observations`` are carried under ``previous_round`` for reference and a
fresh ``observations`` list must be edited in by the round that runs this
(the tool seeds it with auto-detected ratio regressions).

Usage:
  python tools/sf1_bench.py [--sf1-json FILE] [--sf01-json FILE]
                            [--out BENCH_sf1.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.environ.get("SF1_DIR", "/tmp/sf1")
RATIO_REGRESSION = 1.3  # flag queries whose 10x-data ratio grew >30% vs prior


def _last_json_line(text: str) -> dict:
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit("no JSON line found in bench output")


def _min_merge(runs: list[dict]) -> dict:
    """Per-query min across independent bench runs: nested dicts of floats
    are min-merged leaf-wise over the UNION of keys (a query present in
    only one run keeps that run's value instead of vanishing); non-numeric
    fields keep the first run that has them. Derived aggregates are
    RECOMPUTED from the merged leaves — min-of-run-totals would not equal
    the sum of per-query mins, making the record internally inconsistent.
    A merged record states how many runs fed it."""
    def merge(srcs):
        keys = []
        for s in srcs:
            keys.extend(k for k in s if k not in keys)
        out = {}
        for key in keys:
            vals = [s[key] for s in srcs if key in s]
            if isinstance(vals[0], dict):
                out[key] = merge([v for v in vals if isinstance(v, dict)])
            elif (
                key not in ("reps", "sf")
                and all(isinstance(v, (int, float)) and not isinstance(v, bool)
                        for v in vals)
            ):
                out[key] = min(vals)
            else:
                out[key] = vals[0]
        return out

    out = merge([json.loads(json.dumps(r)) for r in runs])
    if "value" in out and "queries" in out:
        out["value"] = round(sum(out["queries"].values()), 3)
    if "subtotal_r1_queries" in out and "queries" in out:
        sys.path.insert(0, REPO)
        from bench import R1_SET

        out["subtotal_r1_queries"] = round(
            sum(v for n, v in out["queries"].items() if n in R1_SET), 3
        )
    _recompute_throughputs(out)
    out["merged_runs"] = len(runs)
    return out


def _recompute_throughputs(node) -> None:
    """Apply the derived-aggregates-are-RECOMPUTED rule to the streaming
    throughput leaves (VERDICT r12 What's-wrong): ``curation_rows_per_sec``
    is higher-is-better, so min-merging it pairs the WORST run's rows/s
    with the BEST run's wall — the r12 record said 235.8 rows/s next to
    wall_sec 116.04 over rows_in 50000 (= 431). Every merged block must
    satisfy rows_per_sec ≡ rows_in / wall_sec; recurse because the
    full_stack block nests inside the streaming block."""
    if not isinstance(node, dict):
        return
    if (
        "curation_rows_per_sec" in node
        and isinstance(node.get("rows_in"), (int, float))
        and isinstance(node.get("wall_sec"), (int, float))
        and node["wall_sec"] > 0
    ):
        node["curation_rows_per_sec"] = round(
            node["rows_in"] / node["wall_sec"], 1
        )
    for v in node.values():
        _recompute_throughputs(v)


def _run_bench(sf_dir: str) -> dict:
    env = {**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir}
    # sf1 legs spill through real disk, not tmpfs (r14, VERDICT r13 #3):
    # the r13 sf1 leg A died when a /dev/shm spill file vanished mid-run
    # (host tmpfs flake under memory pressure at the 10x shuffle volume).
    # sf0.1 legs keep the session default (tmpfs when roomy) — their
    # shuffle volume is MBs. Explicit SPARK_GRAFT_LOCAL_DIR still wins.
    if sf_dir == SF1_DIR:
        env.setdefault("SPARK_GRAFT_LOCAL_DIR", "/tmp")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    return _last_json_line(out.stdout)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf1-json", action="append",
        help="pre-captured sf1 bench JSON line file; repeatable — multiple "
             "runs are min-merged per query (each bench run is already "
             "best-of-2 interleaved passes; merging independent runs strips "
             "the host's multi-second stall windows, BASELINE.md 'Noise')",
    )
    ap.add_argument("--sf01-json", help="pre-captured sf0.1 bench JSON line file")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_sf1.json"))
    args = ap.parse_args()

    if not os.path.isdir(SF1_DIR) or not os.listdir(SF1_DIR):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "gen_sf1.py"), SF1_DIR],
            check=True,
        )

    prior = None
    if os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)

    if args.sf1_json:
        runs = []
        for p in args.sf1_json:
            with open(p) as f:
                runs.append(_last_json_line(f.read()))
        sf1 = _min_merge(runs)
    else:
        sf1 = _run_bench(SF1_DIR)
    if args.sf01_json:
        with open(args.sf01_json) as f:
            sf01 = _last_json_line(f.read())
    else:
        sf01 = _run_bench("/root/testdata/sf0.1")

    ratios = {
        n: round(sf1["queries"][n] / sf01["queries"][n], 2)
        for n in sf1["queries"]
        if n in sf01["queries"] and sf01["queries"][n] > 0
    }

    prev_block = None
    regressions = []
    if prior:
        prev_ratios = prior.get("scale_ratio_10x_data", {})
        delta = {
            n: {"prev": prev_ratios[n], "now": ratios[n]}
            for n in sorted(set(ratios) & set(prev_ratios))
        }
        regressions = sorted(
            (n for n, d in delta.items()
             if d["now"] > d["prev"] * RATIO_REGRESSION),
            key=lambda n: -delta[n]["now"] / max(delta[n]["prev"], 0.01),
        )
        prev_block = {
            "headline_total": prior.get("headline", {}).get("value"),
            "scale_ratio_10x_data": prev_ratios,
            "observations": prior.get("observations"),
            "ratio_regressions_gt_1p3x": regressions,
        }

    record = {
        "sf": 1,
        "generated_by": (
            "tools/sf1_bench.py over tools/gen_sf1.py fixtures "
            "(seed 20260814; relational tables replicated 10x with key "
            "offsets, documents/embeddings regenerated to observed sf0.1 "
            "statistics with Heaps-law vocabulary growth)"
        ),
        "spark": "local[32], same session config as bench.py at sf0.1",
        "headline": sf1,
        "sf01_reference_same_code": sf01,
        "scale_ratio_10x_data": ratios,
        "ann_split_sf1": sf1.get("ann_split"),
        "ann_split_sf01": sf01.get("ann_split"),
        "observations": [
            f"AUTO: ratio regressions >{RATIO_REGRESSION}x vs prior record: "
            f"{regressions or 'none'} — edit in this round's analysis."
        ],
    }
    if prev_block:
        record["previous_round"] = prev_block

    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}; regressions vs prior: {regressions or 'none'}")


if __name__ == "__main__":
    main()
