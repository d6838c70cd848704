"""Noise-robust wrapper around bench.py: run the full headline bench
N times (fresh JVM each run, like the driver does) and report min /
median / max / spread per query and for the total.

Why (VERDICT r5 item 4): single-run totals on this shared host swing
7.6 → 12.4 s with no code change; BENCH_r5 recorded a +19.6% "regression"
that idle-machine repeats did not reproduce. The min over N runs is the
contention-free estimate; the spread makes any regression claim
falsifiable from the repo alone. The table goes into RESULTS.md each
round.

Usage: python tools/bench_repeat.py [N] [--md]   (default N=5)
Prints one JSON line with the aggregate, or a markdown table with --md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def run_once(bench: str) -> dict:
    out = subprocess.run(
        [sys.executable, bench],
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(bench),
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in bench output:\n{out.stdout[-2000:]}")


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--md"]
    as_md = "--md" in sys.argv
    n = int(args[0]) if args else 5
    bench = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
    )

    runs = []
    for i in range(n):
        r = run_once(bench)
        runs.append(r)
        print(
            f"# run {i + 1}/{n}: total {r['value']}s", file=sys.stderr, flush=True
        )

    totals = [r["value"] for r in runs]
    names = list(runs[0]["queries"])
    per_q = {
        q: [r["queries"][q] for r in runs] for q in names
    }

    if as_md:
        print(f"| query | min | median | max | n={n} runs |")
        print("|---|---|---|---|---|")
        for q in names:
            v = per_q[q]
            print(
                f"| {q} | {min(v):.3f} | {statistics.median(v):.3f} "
                f"| {max(v):.3f} | |"
            )
        print(
            f"| **total** | **{min(totals):.3f}** | "
            f"**{statistics.median(totals):.3f}** | **{max(totals):.3f}** | |"
        )
    else:
        print(
            json.dumps(
                {
                    "metric": "headline_total_repeat",
                    "n_runs": n,
                    "min": min(totals),
                    "median": round(statistics.median(totals), 3),
                    "max": max(totals),
                    "stdev": round(statistics.stdev(totals), 3) if n > 1 else 0.0,
                    "sf": runs[0]["sf"],
                    "queries_min": {q: min(v) for q, v in per_q.items()},
                }
            )
        )


if __name__ == "__main__":
    main()
