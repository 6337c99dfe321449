"""A/B the round-3 bench conf (tiny maxPartitionBytes) on the regressed
headline sections — one JVM per arm so the conf actually applies.

Usage: python tools/ab_conf.py {tiny|default}
Prints one JSON line with per-section timings for the chosen arm.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARM = sys.argv[1] if len(sys.argv) > 1 else "tiny"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> dict:
    from mq_to_db_spark.operators.compression import decode_chunks, encode_chunks
    from mq_to_db_spark.operators.gapfill import gapfill
    from mq_to_db_spark.operators.rollup import rollup_multidim, rollup_tiers
    from mq_to_db_spark.session import get_spark

    import bench

    extra = {}
    if ARM == "tiny":
        extra = {
            "spark.sql.files.maxPartitionBytes": "1m",
            "spark.sql.files.openCostInBytes": "0",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
        }
    spark = get_spark(
        app_name=f"ab-{ARM}", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS, extra_conf=extra, pretouch=True,
    )
    tr_path = bench.ensure_transcripts(0.1)
    warm = spark.read.parquet(bench.ensure_transcripts(0.001))
    transcripts = spark.read.parquet(tr_path)

    def _rollup_all(src):
        tiers = rollup_multidim(src, {"global": [], "conv": ["conv_id"], "tool": ["tool"]})
        m1 = tiers["1m"].persist()
        total = m1.count()
        total += tiers["1h"].persist().count()
        total += tiers["1d"].count()
        for t in ("1m", "1h"):
            tiers[t].unpersist()
        return total

    def _mat(df):
        df.write.format("noop").mode("overwrite").save()

    def _codec(src):
        _mat(decode_chunks(encode_chunks(src, value_col="text_len")))

    out: dict = {"arm": ARM, "cpus": CPUS}
    sections = {
        "rollup_cascade_3dim": (_rollup_all, ),
        "gapfill_1h": (lambda src: _mat(gapfill(rollup_tiers(src, keys=[])["1h"], "1h")), ),
        "codec_encode_decode": (_codec, ),
    }
    for name, (fn,) in sections.items():
        fn(warm)  # codegen warm
        t0 = time.perf_counter(); fn(transcripts); first = time.perf_counter() - t0
        spark.catalog.clearCache()
        t0 = time.perf_counter(); fn(transcripts); second = time.perf_counter() - t0
        spark.catalog.clearCache()
        out[name] = round(min(first, second), 3)
        out[name + "_both"] = [round(first, 3), round(second, 3)]
    spark.stop()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
