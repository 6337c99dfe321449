"""Subprocess worker for the scaling benchmark: one JVM per parallelism
level (Spark master is fixed at session creation).  Prints one JSON line.

The measured job is the engine's production shape (rollup_multidim): raw
scanned ONCE for all three series dimensions (grouping-sets agg → one
shuffle), finest tier persisted, coarser tiers cascaded from it.

Local-mode tuning mirrors what the defaults already do at cluster scale:
  * ``maxPartitionBytes=1m`` — the ~105 MB input must yield >3× cores
    input splits (a TB-scale table gets thousands of splits from the
    default 128 MB binning; a 105 MB bench input gets 1 — which starves
    every core but one);
  * ``advisoryPartitionSizeInBytes=2m`` — AQE otherwise coalesces the
    few-MB partial-agg shuffle into ~1 post-shuffle partition,
    serializing the final aggregation (at production shuffle volumes the
    64 MB default yields ample parallelism).

Usage: python tools/_scale_worker.py <cpus> <n_turns>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIMS = {"global": [], "conv": ["conv_id"], "tool": ["tool"]}


def main(cpus: int, n_turns: int) -> dict:
    from bench import _transcripts_path
    from mq_to_db_spark.operators.rollup import rollup_multidim
    from mq_to_db_spark.session import get_spark

    path = _transcripts_path(f"scale{n_turns}")
    if not os.path.exists(path):
        from mq_to_db_spark.fixtures.generator import write_transcripts_parquet

        write_transcripts_parquet(path, n_turns=n_turns, seed=42)

    extra = {
        "spark.sql.files.maxPartitionBytes": "1m",
        "spark.sql.files.openCostInBytes": "0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
    }
    # experiment hook: SCALE_EXTRA_CONF='{"spark.io.compression.codec":"zstd"}'
    extra.update(json.loads(os.environ.get("SCALE_EXTRA_CONF", "{}")))
    spark = get_spark(
        app_name=f"scale-local{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("SCALE_SHUFFLE_PARTITIONS", max(cpus, 32))),
        extra_conf=extra,
        # this host tariffs first-touch page-commit ~50-100× (see
        # BENCH/PROFILE.md §6) — pretouch the whole heap at JVM startup
        # so the timed passes below measure the pipeline, not page faults
        pretouch=True,
    )
    df = spark.read.parquet(path)

    def _noop(d):
        d.write.format("noop").mode("overwrite").save()

    def run_pipeline() -> float:
        # cascade tiers reuse the persisted finest tier (plan-keyed cache)
        # → raw read exactly once per pass.
        t0 = time.perf_counter()
        tiers = rollup_multidim(df, DIMS)
        m1 = tiers["1m"].persist()
        _noop(m1)
        h1 = tiers["1h"].persist()
        _noop(h1)
        _noop(tiers["1d"])
        secs = time.perf_counter() - t0
        m1.unpersist()
        h1.unpersist()
        return secs

    # points produced by one pipeline pass (counted once, outside timing)
    tiers = rollup_multidim(df, DIMS)
    points = sum(t.count() for t in tiers.values())

    run_pipeline()  # warmup: codegen compile + JIT
    secs = min(run_pipeline(), run_pipeline())  # steady state, best of 2
    return {
        "cpus": cpus,
        "n_turns": n_turns,
        "rolled_up_points": points,
        "seconds": round(secs, 3),
        "points_per_sec": round(points / secs, 1),
        "turns_per_sec": round(n_turns / secs, 1),
    }


if __name__ == "__main__":
    print(json.dumps(main(int(sys.argv[1]), int(sys.argv[2]))))
