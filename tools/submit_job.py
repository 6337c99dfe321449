"""spark-submit entry point (north_rule: "run via spark-submit --py-files
on a multi-executor cluster").

Build the archive and submit:

    python tools/make_pyfiles_zip.py                 # → BENCH/mq_to_db_spark.zip
    spark-submit --master local[8] \\
        --py-files BENCH/mq_to_db_spark.zip \\
        tools/submit_job.py <input_parquet> <warehouse_dir>

On a real cluster only ``--master``/``--num-executors`` change (N vs 4N
for the scaling comparison); the job body is identical.  The script uses
ONLY the shipped archive (no repo on sys.path), proving the package is
self-contained for executors and driver alike.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main(input_path: str, warehouse: str) -> None:
    spark = SparkSession.builder.appName("mq_to_db_spark-submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from mq_to_db_spark.config import EngineConfig
    from mq_to_db_spark.plans.pipeline import RollupPipeline

    pipe = RollupPipeline(warehouse, EngineConfig())
    report = pipe.run(spark, spark.read.parquet(input_path))
    print("REPORT " + report.to_json())
    hourly = pipe.read_rollup(spark, "global", "1h")
    print("ROWS " + json.dumps({"global_1h": hourly.count()}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
