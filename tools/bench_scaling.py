"""Two-cluster-size scaling evidence (north rule: N vs 4N, eff >= 0.8).

Runs the SAME index build at local[N] and local[4N] on the SAME input,
interleaved for several iterations (this sandbox has heavy noisy-neighbor
variance — interleaving pairs and taking the median ratio is the honest
estimator), and prints a summary JSON + markdown table.

Usage: python tools/bench_scaling.py [n_docs] [iters] [n_small] [tmpdir]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def run_leg(cpus: int, n_docs: int, tmpdir: str) -> dict:
    idx = f"{tmpdir}/esbulk_bench_index_{cpus}_{n_docs}"
    subprocess.run(["rm", "-rf", idx], check=True)
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_N_DOCS=str(n_docs),
        BENCH_MODE="build_only",
        BENCH_TMPDIR=tmpdir,
        # one timed build per leg: the interleaved-pairs median across
        # iters is the variance control here (bench.py's warmup still
        # runs, so JIT is amortized identically on both legs)
        BENCH_BUILD_RUNS="1",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True, text=True,
        timeout=1200,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_small = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    tmpdir = sys.argv[4] if len(sys.argv) > 4 else "/dev/shm/bench"
    os.makedirs(tmpdir, exist_ok=True)
    n_big = n_small * 4

    pairs = []
    for it in range(iters):
        small = run_leg(n_small, n_docs, tmpdir)
        big = run_leg(n_big, n_docs, tmpdir)
        ratio = big["build_docs_per_sec"] / small["build_docs_per_sec"]
        pairs.append((small, big, ratio))
        print(
            f"iter {it}: local[{n_small}] {small['build_docs_per_sec']} docs/s | "
            f"local[{n_big}] {big['build_docs_per_sec']} docs/s | "
            f"ratio {ratio:.2f}x eff {ratio / 4:.2f}",
            file=sys.stderr,
        )
    ratios = sorted(r for _, _, r in pairs)
    med = statistics.median(ratios)
    best_small = max(p[0]["build_docs_per_sec"] for p in pairs)
    best_big = max(p[1]["build_docs_per_sec"] for p in pairs)
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "iters": iters,
                "n_small": n_small,
                "n_big": n_big,
                "median_ratio": round(med, 3),
                "median_efficiency": round(med / 4, 3),
                "best_small_docs_per_sec": best_small,
                "best_big_docs_per_sec": best_big,
                "all_ratios": [round(r, 3) for r in ratios],
                "total_postings": pairs[0][0]["total_postings"],
            }
        )
    )


if __name__ == "__main__":
    main()
