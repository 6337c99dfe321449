"""Bucketed table layout: shuffle-free co-located joins and aggs.

The north rule's partitioning clause ("bucketed by conv_id … to defuse
hot-conversation skew") has two halves: the WRITE-side layout and the
READ-side payoff.  This module is the payoff made testable on plain
parquet tables: write a table `bucketBy(n, key)` + `sortBy(key)` and
Spark's bucketed scan satisfies the join/agg distribution requirement
from the FILE LAYOUT — two tables bucketed the same way join with ZERO
Exchange on either side, and a groupBy on the bucket key aggregates
without a shuffle.  At 100 TB this is the difference between re-hashing
the corpus per join and reading it join-ready; it is the local-catalog
equivalent of the Iceberg `bucket(n, conv_id)` partition transform the
production write path declares (sources/iceberg.py).

Caveats encoded here rather than discovered in production:
  * both sides must have the SAME bucket count (Spark joins bucketed
    tables without shuffle only on equal counts, or one being a
    multiple with `spark.sql.bucketing.coalesceBucketsInJoin.enabled`);
  * bucketed writes must go through `saveAsTable` (the in-catalog
    metastore carries the bucket spec; a bare parquet path loses it);
  * one FILE per bucket per writer task — repartition by the bucket
    key first so small writes do not explode into tasks×buckets files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed", "assert_no_shuffle_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    key: str,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a bucketed (and bucket-sorted) managed parquet
    table — the layout whose scans satisfy hash-distribution on
    ``key`` for free."""
    w = (
        df.repartition(n_buckets, key)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def assert_no_shuffle_join(joined: DataFrame) -> str:
    """Return the physical plan of ``joined``, raising if it contains a
    SHUFFLE exchange (``Exchange hashpartitioning`` /
    ``ShuffleExchange``) — the executable proof that a
    bucketed-bucketed join is co-located.  A BroadcastExchange is NOT a
    shuffle (nothing repartitions) and passes.  (Used by tests and as a
    deployment sanity probe.)"""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan or "ShuffleExchange" in plan:
        raise AssertionError(
            "bucketed join plan contains a shuffle Exchange:\n" + plan[:4000]
        )
    return plan
