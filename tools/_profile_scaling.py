"""Profiling worker: isolate which stage limits 8->32 thread scaling.

Usage: python tools/_profile_scaling.py <cpus> <n_turns> <variant>
Variants: scan | scan_nosplit | agg_conv | agg_global | full | full_once
Prints one JSON line {variant, cpus, seconds}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _noop(d):
    d.write.format("noop").mode("overwrite").save()


def main(cpus: int, n_turns: int, variant: str) -> dict:
    from bench import _transcripts_path
    from mq_to_db_spark.operators.rollup import (
        _merge_aggs,
        _partial_aggs,
        rollup_tiers,
        with_text_stats,
    )
    from mq_to_db_spark.session import get_spark

    path = _transcripts_path(f"scale{n_turns}")
    if not os.path.exists(path):
        from mq_to_db_spark.fixtures.generator import write_transcripts_parquet

        write_transcripts_parquet(path, n_turns=n_turns, seed=42)

    spark = get_spark(
        app_name=f"profile-{variant}-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "0",
        },
    )
    df = spark.read.parquet(path)

    def prep_nosplit(d):
        text_len = F.coalesce(F.length("text"), F.lit(0))
        trimmed = F.trim(F.col("text"))
        token_count = F.when(
            F.col("text").isNull() | (trimmed == ""), F.lit(0)
        ).otherwise(F.regexp_count(trimmed, F.lit(r"\s+")) + 1)
        return d.withColumn("text_len", text_len.cast("long")).withColumn(
            "token_count", token_count.cast("long")
        )

    def run():
        if variant == "scan":
            _noop(with_text_stats(df))
        elif variant == "scan_nosplit":
            _noop(prep_nosplit(df))
        elif variant == "agg_conv":
            prepped = with_text_stats(df).withColumn(
                "bucket_start", F.date_trunc("minute", F.col("ts"))
            )
            _noop(prepped.groupBy("bucket_start", "conv_id").agg(*_partial_aggs()))
        elif variant == "agg_global":
            prepped = with_text_stats(df).withColumn(
                "bucket_start", F.date_trunc("minute", F.col("ts"))
            )
            _noop(prepped.groupBy("bucket_start").agg(*_partial_aggs()))
        elif variant == "full":
            for keys in ([], ["conv_id"], ["tool"]):
                tiers = rollup_tiers(df, keys=keys)
                for t in tiers.values():
                    _noop(t)
        elif variant == "full_once":
            # single-pass: grouping sets over (bucket), (bucket,conv), (bucket,tool)
            prepped = prep_nosplit(df).withColumn(
                "bucket_start", F.date_trunc("minute", F.col("ts"))
            )
            m1 = prepped.groupingSets(
                [["bucket_start"], ["bucket_start", "conv_id"], ["bucket_start", "tool"]],
                "bucket_start",
                "conv_id",
                "tool",
            ).agg(*_partial_aggs())
            m1 = m1.persist()
            _noop(m1)
            h1 = (
                m1.withColumn("bucket_start", F.date_trunc("hour", "bucket_start"))
                .groupBy("bucket_start", "conv_id", "tool")
                .agg(*_merge_aggs())
                .persist()
            )
            _noop(h1)
            d1 = (
                h1.withColumn("bucket_start", F.date_trunc("day", "bucket_start"))
                .groupBy("bucket_start", "conv_id", "tool")
                .agg(*_merge_aggs())
            )
            _noop(d1)
            m1.unpersist()
            h1.unpersist()
        else:
            raise SystemExit(f"unknown variant {variant}")

    t0 = time.perf_counter()
    run()
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    run()
    s1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run()
    s2 = time.perf_counter() - t0
    return {
        "variant": variant,
        "cpus": cpus,
        "warm": round(warm, 2),
        "seconds": round(min(s1, s2), 3),
    }


if __name__ == "__main__":
    print(json.dumps(main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])))
