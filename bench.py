"""Bench harness (driver contract + north-rule metric).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "headline_queries_total_sec", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": 0.1,
     "rolled_up_points": N, "rolled_up_points_per_sec": X,
     "turns_ingested": N, "turns_per_sec": X, "cpus": N}

The north-rule metric (rolled-up points/sec — turns ingested → tier-matched
aggregate points) is measured on the full engine pipeline over a
deterministic synthetic transcript table sized to the SF (~600k turns at
SF=0.1, seed 42), cached as parquet next to this file so every run (and
both sides of the N-vs-4N scaling comparison) reads identical bytes.
Results are materialized with the ``noop`` sink — executor-side full
materialization, no driver collect.

Scaling-efficiency evidence (two parallelism levels on the same input):
``python tools/bench_scaling.py`` → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
#: turns in the synthetic transcript table per unit SF (FIXTURES.md: sf0.1
#: ≈ 600k turns, matching the driver's sf0.1 sizing)
TURNS_PER_SF = 6_000_000


def _sf_of(sf_dir: str) -> float:
    name = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def _transcripts_path(sf: float) -> str:
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    return os.path.join(bench_dir, f"transcripts_sf{sf}.parquet")


def ensure_transcripts(sf: float) -> str:
    """Deterministic synthetic transcript table at SF, cached as parquet."""
    path = _transcripts_path(sf)
    if not os.path.exists(path):
        from mq_to_db_spark.fixtures.generator import write_transcripts_parquet

        write_transcripts_parquet(path, n_turns=int(sf * TURNS_PER_SF), seed=42)
    return path


def _materialize(df) -> int:
    """Force full execution executor-side; return output row count."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run(sf_dir: str = SF_DIR, cpus: int = CPUS, include_scaling_meta: bool = True) -> dict:
    from pyspark.sql import functions as F

    from mq_to_db_spark.operators.compression import decode_chunks, encode_chunks
    from mq_to_db_spark.operators.gapfill import gapfill
    from mq_to_db_spark.operators.rollup import rollup_tiers
    from mq_to_db_spark.session import get_spark

    try:
        # stamp host health BEFORE any measurement (and again at the end):
        # the round-3 episode healed mid-run, so a single end-of-run probe
        # can declare "healthy" numbers whose early phases were throttled
        from tools.probe_host import main as probe_host

        host_before = probe_host(mib=64, stat_seconds=1.0)
    except Exception as e:  # noqa: BLE001
        host_before = {"error": str(e)[:200]}

    sf = _sf_of(sf_dir)
    tr_path = ensure_transcripts(sf)

    spark = get_spark(
        app_name=f"bench-local{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            # local-bench analogue of the cluster defaults: a ~10-100 MB
            # input must still yield >cores splits (TB inputs get that from
            # 128 MB binning for free), and AQE must not coalesce the
            # few-MB partial-agg shuffle onto one core.
            "spark.sql.files.maxPartitionBytes": "1m",
            "spark.sql.files.openCostInBytes": "0",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
        },
    )
    import __spark_entry__ as entry

    # warmup: JVM/codegen/Arrow spin-up outside timed sections
    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    # warm queries against the smallest sibling fixture of the timed dir
    # (not a hardcoded path — $SPARK_GRAFT_SF_DIR may live elsewhere);
    # if none exists, warm against the timed dir itself (slower first
    # pass, still correct).
    WARM_DIR = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(WARM_DIR):
        print(f"# no warmup fixture at {WARM_DIR}; warming on {sf_dir}", file=sys.stderr)
        WARM_DIR = sf_dir

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        # best of 2 (cache cleared between): the host is a shared VM
        # whose slow windows last minutes — a single-shot time can read
        # 2× off; the min of two spaced runs damps that without hiding
        # real cost (each run is still a full recompute).
        t0 = time.perf_counter()
        out = fn()
        first = time.perf_counter() - t0
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn()
        timings[name] = round(min(first, time.perf_counter() - t0), 3)
        spark.catalog.clearCache()
        return out

    # -- north-rule pipeline: transcripts → validate → tier cascade --------
    transcripts = spark.read.parquet(tr_path)
    n_turns = transcripts.count()

    # warm the pipeline plans on a tiny input (codegen compile only)
    warm_tr = spark.read.parquet(ensure_transcripts(0.001))

    def _rollup_all(src):
        # production shape: raw scanned once for all 3 dimensions
        # (grouping-sets agg), coarser tiers cascaded from the persisted
        # finest tier — see rollup.rollup_multidim.
        from mq_to_db_spark.operators.rollup import rollup_multidim

        tiers = rollup_multidim(
            src, {"global": [], "conv": ["conv_id"], "tool": ["tool"]}
        )
        m1 = tiers["1m"].persist()
        total = m1.count()
        total += tiers["1h"].persist().count()
        total += tiers["1d"].count()
        for t in ("1m", "1h"):
            tiers[t].unpersist()
        return total

    _rollup_all(warm_tr)  # codegen compile outside the timed run
    points = timed("rollup_cascade_3dim", lambda: _rollup_all(transcripts))

    _materialize(gapfill(rollup_tiers(warm_tr, keys=[])["1h"], "1h"))  # warm
    tiers_global = rollup_tiers(transcripts, keys=[])
    timed("gapfill_1h", lambda: _materialize(gapfill(tiers_global["1h"], "1h")))

    def _codec(src):
        chunks = encode_chunks(src, value_col="text_len")
        return _materialize(decode_chunks(chunks))

    _codec(warm_tr)  # warm (Arrow + pandas-UDF worker spin-up)
    timed("codec_encode_decode", lambda: _codec(transcripts))

    # -- driver-table headline queries -------------------------------------
    # Each query is warmed at the small sibling fixture (codegen compile)
    # AND once at sf_dir itself: per-plan-instance one-time costs (JIT of
    # freshly generated classes, Arrow worker spin-up across all cores)
    # do NOT transfer from the small warmup — AQE coalesces its tiny
    # stages to ~1 partition, so e.g. only one Python worker gets
    # spawned.  The cache is cleared before the timed run (a repeated
    # identical plan would otherwise silently reuse the warm run's
    # persisted subtrees via logical-plan cache matching and measure
    # cache reads, not compute) — the timed number is honest
    # steady-state: full recompute, warm JVM.
    qs = entry.queries()
    for name in (
        "rollup_1h_value_stats",
        "rollup_1d_cascade",
        "gapfill_1h",
        "percentile_1h",
        "gauge_last_1h",
        "codec_roundtrip_agg",
        "dedup_exact",
        "minhash_pairs",
        "ann_cosine_topk",
        "embedding_neardup",
        "knn_join_lsh",
    ):
        key = f"q_{name}"
        _materialize(qs[name](spark, WARM_DIR))
        _materialize(qs[name](spark, sf_dir))  # absorb per-instance one-time costs
        spark.catalog.clearCache()  # timed run must recompute, not read caches
        timed(key, lambda n=name: _materialize(qs[n](spark, sf_dir)))
        spark.catalog.clearCache()

    # -- round-3 operator additions: timed the same way, but kept OUT of
    # the headline total so `value` stays comparable across BENCH_r{N}
    extended: dict[str, float] = {}

    def timed_ext(name, fn):
        t0 = time.perf_counter()
        fn()
        extended[name] = round(time.perf_counter() - t0, 3)

    for name in (
        "counter_increase",
        "downsample_ohlc",
        "quantile_sketch_1h",
        "rolling_stats_1h",
        "ewma_1h",
        "contamination",
        "repetition_features",
        "time_weighted_1h",
        "state_durations_1d",
        "concurrency_10m",
        "series_corr_1d",
        "uptime_1h",
        "twa_interp_1h",
        "lttb_1h",
        "cms_counts_1d",
        "pii_redact",
        "asof_fwd",
    ):
        key = f"q_{name}"
        _materialize(qs[name](spark, WARM_DIR))
        _materialize(qs[name](spark, sf_dir))
        spark.catalog.clearCache()
        timed_ext(key, lambda n=name: _materialize(qs[n](spark, sf_dir)))
        spark.catalog.clearCache()

    rollup_sec = timings["rollup_cascade_3dim"]
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "extended_queries": extended,
        "sf": sf,
        "cpus": cpus,
        "turns_ingested": int(n_turns),
        "rolled_up_points": int(points),
        "rolled_up_points_per_sec": round(points / rollup_sec, 1),
        "turns_per_sec": round(n_turns / rollup_sec, 1),
    }
    spark.stop()
    if include_scaling_meta:
        result.update(_scale_meta(cpus))
    # environment self-documentation: a fault-throttled host inflates
    # allocation-heavy phases 3-30x with no steal/idle signal — stamp
    # every bench JSON with before/after probes so readers can tell plan
    # regressions from host episodes (BENCH/PROFILE.md §5)
    result["host_before"] = host_before
    try:
        from tools.probe_host import main as probe_host

        result["host_after"] = probe_host(mib=64, stat_seconds=1.0)
    except Exception as e:  # noqa: BLE001
        result["host_after"] = {"error": str(e)[:200]}
    return result


#: the north-rule throughput input: 32M turns — large enough that fixed
#: job overhead (3 actions + persist) vanishes from the quotient, unlike
#: the ~600k-turn SF=0.1 headline above
SCALE_TURNS = 32_000_000


def _scale_meta(cpus: int) -> dict:
    """Primary north-rule numbers at 32M turns (VERDICT r02 #7: the
    SF=0.1 points/sec is overhead-dominated) + the recorded N→4N scaling
    evidence.  The 32M run happens in its own JVM (tools/_scale_worker —
    a Spark master is fixed per session) against the cached deterministic
    fixture; the scaling pair comes from BENCH/scaling.json
    (tools/bench_scaling.py — interleaved multi-JVM runs)."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    out: dict = {}
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "_scale_worker.py"),
             str(cpus), str(SCALE_TURNS)],
            capture_output=True, text=True, timeout=3600, cwd=repo,
        )
        if proc.returncode == 0:
            out["scale_32m"] = json.loads(proc.stdout.strip().splitlines()[-1])
        else:
            out["scale_32m"] = {"error": proc.stderr.strip().splitlines()[-1][:300]}
    except Exception as e:  # noqa: BLE001
        out["scale_32m"] = {"error": str(e)[:300]}
    try:
        with open(os.path.join(repo, "BENCH", "scaling.json")) as f:
            sc = json.load(f)
        out["scaling"] = {
            "n_turns": sc["n_turns"],
            "headline_pair": sc["headline_pair"],
            "speedup": sc["speedup"],
            "scaling_efficiency": sc["scaling_efficiency"],
            "pairs": sc["pairs"],
            "target": sc["target"],
            "pass": sc["pass"],
        }
    except Exception as e:  # noqa: BLE001
        out["scaling"] = {"error": str(e)[:300]}
    return out


if __name__ == "__main__":
    print(json.dumps(run()))
