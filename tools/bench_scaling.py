"""Scaling-efficiency evidence (north_rule): the same rollup pipeline on
the same input at two parallelism levels — ``local[8]`` (N) vs
``local[32]`` (4N), the sandbox stand-in for N vs 4N executor clusters —
reporting throughput at both and efficiency = tp(4N) / (4 · tp(N)).

Each level runs in its own JVM (subprocess) because a Spark master is
fixed per session.  Results → BENCH/scaling.json + BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [n_turns]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, n_turns: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "_scale_worker.py"), str(cpus), str(n_turns)],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
        timeout=3600,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main(n_turns: int = 4_000_000) -> dict:
    lo = run_level(8, n_turns)
    hi = run_level(32, n_turns)
    eff = hi["points_per_sec"] / (4 * lo["points_per_sec"])
    result = {
        "n_turns": n_turns,
        "N": lo,
        "4N": hi,
        "speedup": round(hi["points_per_sec"] / lo["points_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    bench_dir = os.path.join(REPO, "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)
    _write_baseline_md(result)
    print(json.dumps(result))
    return result


def _write_baseline_md(r: dict) -> None:
    lo, hi = r["N"], r["4N"]
    md = f"""# BENCH/BASELINE — measured results

## North-rule metric: rolled-up points/sec

Pipeline: read transcript parquet → 1m/1h/1d tier cascade across three
series dimensions (global / per-conv / per-tool), materialized with the
noop sink.  Input: deterministic synthetic transcript table
({r['n_turns']:,} turns, seed 42, Zipf-skewed conversations) — identical
bytes for both parallelism levels.  Steady-state (warmup pass excluded,
best of 2).

| parallelism | seconds | rolled-up points | points/sec | turns/sec |
|---|---|---|---|---|
| local[8]  (N)  | {lo['seconds']} | {lo['rolled_up_points']:,} | {lo['points_per_sec']:,} | {lo['turns_per_sec']:,} |
| local[32] (4N) | {hi['seconds']} | {hi['rolled_up_points']:,} | {hi['points_per_sec']:,} | {hi['turns_per_sec']:,} |

**Speedup (N → 4N): {r['speedup']}×  →  scaling efficiency {r['scaling_efficiency']}**
(target ≥ {r['target']}: {"PASS" if r['pass'] else "FAIL"})

Caveats: single-machine stand-in for an N- vs 4N-executor cluster
(driver instruction); `local[*]` threads share one memory subsystem, so
this measures shuffle/agg parallelism, not network scaling.  The same
job submits unchanged to a real cluster via
`spark-submit --py-files mq_to_db_spark.zip` (the session factory already
ships the package to executors).

Per-query timings at SF=0.1 are produced by `python bench.py`
(one-line JSON; the driver records them as BENCH_r{{N}}.json).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000)
