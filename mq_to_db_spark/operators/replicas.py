"""HA replica deduplication: one elected replica's samples per window.

The reference runs redundant consumers for availability (README.md
"scalable… horizontally" — multiple mq-to-db instances on one queue);
the metrics-plane analogue is Prometheus HA pairs, where two scrapers
emit the SAME logical series distinguished only by a ``replica`` label,
and the query layer (Thanos compact/query dedup, Cortex/Mimir HA
tracker) must collapse them to one stream or every count doubles.

This operator is the batch form of the Mimir *HA tracker* rule rather
than Thanos's online penalty walk: time is cut into tumbling election
windows, and per (series keys, window) ONE replica is elected — the one
with the most samples in that window (it saw the most complete stream),
ties broken by the lexicographically smallest replica id.  All of the
elected replica's samples pass through unchanged; the loser's are
dropped.  A replica that dies mid-range loses the following windows'
elections automatically, so coverage fails over at window granularity —
the same guarantee the HA tracker gives at its update interval.  The
election is a pure function of the input (count, then replica id), so
reruns and backfills elect identically — idempotent, replay-safe.

Scale design: the sample table is NEVER window-functioned.  Per-replica
counts are a ``groupBy`` with map-side partial aggregation (the shuffle
carries one partial row per (keys, window, replica), grid-sized, not
raw-sized); the election is a ``row_number() = 1`` over that tiny count
table; and the winners join back to the samples on the full
(keys, window, replica) equi-key — broadcast when the winner set fits
(the common case: it is one row per live series per window), sort-merge
otherwise, in which case the raw data shuffles exactly once.  Either way
this beats the two-full-data-exchange plan a pure window formulation
would cost.  Plan- and semantics-asserted in tests/test_subquery.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from mq_to_db_spark.operators.rollup import bucket_col


def elect_replicas(
    df: DataFrame,
    keys: list[str],
    replica_col: str = "replica",
    tier: str = "1h",
    ts_col: str = "ts",
) -> DataFrame:
    """The election table alone: one row per (keys, ``bucket_start``)
    naming the winning replica and its sample count ``n_samples`` —
    the HA-tracker audit view ("which scraper served which hour")."""
    keys = list(keys)
    if replica_col in keys:
        raise ValueError(f"replica_col {replica_col!r} cannot also be a series key")
    counts = (
        df.groupBy(
            *keys, bucket_col(tier, ts_col).alias("bucket_start"), replica_col
        )
        .agg(F.count(F.lit(1)).alias("n_samples"))
    )
    w = W.partitionBy(*keys, "bucket_start").orderBy(
        F.col("n_samples").desc(), F.col(replica_col).asc()
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_replicas(
    df: DataFrame,
    keys: list[str],
    replica_col: str = "replica",
    tier: str = "1h",
    ts_col: str = "ts",
    keep_replica: bool = True,
) -> DataFrame:
    """Keep only the elected replica's rows per (keys, ``tier`` window).

    Election: most samples in the window wins; ties go to the smallest
    ``replica_col`` value.  Output columns are the input's (minus
    ``replica_col`` when ``keep_replica`` is False — the usual shape
    handed to the rollup cascade, which must not group by a label the
    dedup just collapsed).
    """
    winners = elect_replicas(df, keys, replica_col, tier, ts_col).select(
        *keys, "bucket_start", replica_col
    )
    src = df.withColumn("_bucket", bucket_col(tier, ts_col))
    cond = (
        [src[k] == winners[k] for k in keys]
        + [src["_bucket"] == winners["bucket_start"]]
        + [src[replica_col] == winners[replica_col]]
    )
    joined = src.join(winners, on=cond, how="left_semi").drop("_bucket")
    return joined.drop(replica_col) if not keep_replica else joined


def lww_upsert(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    seq_col: str = "seq",
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """Last-write-wins point upsert — out-of-order ingest sanitation
    (the InfluxDB/QuestDB rule): when the same logical point
    ``(keys…, ts)`` arrives more than once (a replayed delivery batch, a
    late correction, an at-least-once queue redelivering — the exact
    duplicate class the reference's ack/requeue loop produces,
    internal/consumer/rmq/rmq.go), keep only the version with the
    highest ``seq_col`` (ingest sequence / batch id / arrival offset).
    ``tiebreak`` columns extend the version order when sequences can
    collide; the comparison is a struct max, so the winner is a total-
    order pick — idempotent and replay-safe by construction
    (re-upserting the winners is a no-op).

    ONE hash aggregation on ``(keys…, ts)`` — max_by over the version
    struct, map-side combined, no window, no join.  At 10^12 turns the
    shuffle carries one row per logical point, exactly the table's
    output size; a window formulation would sort every duplicate group
    instead.
    """
    version = F.struct(F.col(seq_col), *[F.col(t) for t in tiebreak])
    others = [
        c for c in df.columns
        if c not in {*keys, ts_col, seq_col, *tiebreak}
    ]
    picked = [
        F.max_by(F.col(c), version).alias(c)
        for c in [seq_col, *tiebreak, *others]
    ]
    return df.groupBy(*keys, ts_col).agg(*picked)
