"""Deterministic hash-based sampling and dataset splitting.

A training-data pipeline samples and splits corpora constantly
(hold-outs, ablations, mixture tuning), and at 100 TB the only sane
mechanism is a *content-addressed* decision: hash a stable id into a
uniform number and compare against literal thresholds.  No RNG state,
no shuffle, no driver coordination — the decision is a pure projection
that Catalyst pushes into the scan, every executor agrees on it, and
re-running the job (or running it on an overlapping delivery batch)
yields byte-identical membership.  ``df.sample()`` is unsuitable for
this: its per-partition RNG makes membership depend on partitioning.

The uniform source is the engine's DuckDB-reproducible 60-bit hash
(``conv(substring(md5(...),1,15),16,10)``, cf. functions/text
fingerprints): u ∈ [0, 2^60) with the seed mixed into the hashed
string, so every (seed, id) pair is an independent draw and the
contract oracles replay the exact membership in ANSI SQL.

Reference parity: the reference (christiangda/mq-to-db) has no sampling
plane — consumers forward every delivery (internal/consumer/rmq.go) —
so these operators extend the engine for its training-data mission
rather than mirroring a reference behavior.

Scale notes:
  * all three operators are pure narrow projections/filters — zero
    shuffles, zero joins; stratified rates are a literal CASE, not a
    rate-table join (a handful of strata is config, not data);
  * ``md5`` is JVM codegen (no Python); one hash per row regardless of
    how many thresholds consume it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^60 — the hash is 15 hex chars = 60 bits, uniform on [0, 2^60)
HASH_SPACE = 1 << 60


def hash_u60(id_col: str | Column, seed: int | str = 42) -> Column:
    """60-bit uniform hash of ``seed:id`` — the sampling coin.

    DuckDB replay: ``('0x' || substring(md5(seed || ':' || CAST(id AS
    VARCHAR)), 1, 15))::BIGINT`` (15 hex chars keep it inside a signed
    64-bit, cf. the fingerprint oracles in the driver contract).
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    key = F.concat_ws(":", F.lit(str(seed)), c.cast("string"))
    # NULL ids all hash the key "seed:" (concat_ws skips nulls) and so
    # sample/split together — ids are expected non-null (validate
    # upstream); kept total rather than null-propagating so a split
    # stays exhaustive even on dirty input.
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def _threshold(rate: float) -> int:
    """Integer threshold for P(u60 < t) = rate, exact in both engines."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return int(rate * HASH_SPACE)


def sample_bernoulli(
    df: DataFrame, id_col: str, rate: float, seed: int = 42
) -> DataFrame:
    """Keep each row independently with probability ``rate``.

    Deterministic in (seed, id): the same ids survive on any cluster,
    any partitioning, any day.  Pure filter — pushed to the scan.
    """
    return df.where(hash_u60(id_col, seed) < F.lit(_threshold(rate)))


def assign_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Partition rows into named splits (train/val/test by default).

    ``weights`` maps split name → probability mass; masses must sum to
    1 (±1e-9).  Each row lands in exactly one split via cumulative
    thresholds over the same 60-bit coin, so splits are disjoint,
    exhaustive, and stable under re-runs — the property a train/test
    split must have for a 100 TB corpus that is re-materialized
    incrementally (a document never migrates between splits).
    """
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = hash_u60(id_col, seed)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = u < F.lit(_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # last split takes the remainder — immune to float edge rounding
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def sample_stratified(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (e.g. per-language rates).

    ``rates`` maps stratum value → keep probability; strata not listed
    use ``default_rate``.  The rate table is configuration, not data,
    so it compiles to a literal CASE on the stratum column — no
    broadcast join, no shuffle, still one hash per row.
    """
    u = hash_u60(id_col, seed)
    expr = None
    for value, rate in rates.items():
        cond = F.col(stratum_col) == F.lit(value)
        t = F.lit(_threshold(rate))
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    expr = (
        F.lit(_threshold(default_rate))
        if expr is None
        else expr.otherwise(F.lit(_threshold(default_rate)))
    )
    return df.where(u < expr)


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int = 0,
    n_shards: int = 8,
    seed: int = 42,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global epoch shuffle + shard assignment — the
    training loader's "shuffle the corpus each epoch" primitive, as a
    reproducible dataset property instead of loader-local RNG.

    Every row gets a global shuffle position (its rank under the
    60-bit coin keyed by ``seed`` *and* ``epoch``), a round-robin
    ``shard`` (each shard is therefore a uniform 1/n sample, and shard
    sizes differ by at most 1 — no hash-mod imbalance), and ``pos`` =
    its read order within the shard.  Changing ``epoch`` re-permutes
    everything; re-running the same epoch is byte-identical, so a
    preempted training job resumes mid-epoch without replaying or
    skipping a single document.

    Scale: the global rank is NOT a single-partition window — it is the
    range-partitioned running count (operators/rangewin.py
    range_running_sum: width_bucket ranging over the hash extent, a
    per-bucket window at full parallelism, then a broadcast
    n_buckets-row prefix carry).  The hash is uniform on [0, 2^60), so
    the range buckets are balanced by construction — no skew cliff, no
    driver collect.  Ties (60-bit collisions) break on the id itself,
    keeping the order total and the replay exact.

    DuckDB replay (the contract oracle): ``row_number() OVER (ORDER BY
    ('0x' || substring(md5('{seed}e{epoch}:' || id), 1, 15))::BIGINT,
    id) - 1`` then ``% n_shards`` / ``// n_shards``.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from mq_to_db_spark.operators.rangewin import range_running_sum

    tagged = df.withColumn(
        "_u", hash_u60(id_col, seed=f"{seed}e{epoch}")
    ).withColumn("_one", F.lit(1).cast("long"))
    ranked = range_running_sum(
        tagged, "_u", "_one", tiebreak=(id_col,), out_col="_rank"
    )
    p0 = F.col("_rank") - F.lit(1)
    return (
        ranked.withColumn(shard_col, F.pmod(p0, F.lit(n_shards)).cast("int"))
        # integer `div`, not float `/` — exact past 2^53 ranks
        .withColumn(pos_col, F.expr(f"(_rank - 1) div {n_shards}"))
        .drop("_u", "_one", "_rank")
    )


def sample_mixture(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    alpha: float = 0.5,
    target_rows: float = 0.0,
    seed: int = 42,
    rate_col: str | None = None,
) -> DataFrame:
    """Temperature-based mixture sampling across domains — the standard
    multinomial re-weighting of multi-source training corpora
    (p_domain ∝ n_domain^α): α = 1 keeps natural proportions, α → 0
    flattens toward uniform-over-domains, upweighting rare sources.

    Each domain gets keep-rate ``r_d = min(1, C · n_d^(α−1))`` with
    ``C = target_rows / Σ_d n_d^α``, so expected output ≈ target_rows
    (less when clamping caps an upweighted domain at 1 — single pass, no
    iterative renormalization; callers wanting exact mass re-run with
    the shortfall).  Membership is the same content-addressed 60-bit
    coin as :func:`sample_bernoulli` — deterministic in (seed, id),
    partitioning-independent, DuckDB-replayable.

    Scale: ONE tiny domain-count agg (domain cardinality is config-like,
    thousands at most) + a broadcast rate join + the pure hash filter —
    the corpus streams once, no wide shuffle.  ``rate_col`` keeps the
    applied rate on surviving rows for audit.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0,1], got {alpha}")
    if target_rows <= 0:
        raise ValueError(f"target_rows must be positive, got {target_rows}")
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_nd"))
    norm = counts.agg(
        F.sum(F.pow(F.col("_nd").cast("double"), F.lit(alpha))).alias("_z")
    )
    rates = counts.crossJoin(F.broadcast(norm)).select(
        domain_col,
        F.least(
            F.lit(1.0),
            (F.lit(float(target_rows)) / F.col("_z"))
            * F.pow(F.col("_nd").cast("double"), F.lit(alpha - 1.0)),
        ).alias("_rate"),
    )
    u = hash_u60(id_col, seed)
    thr = F.floor(F.col("_rate") * F.lit(float(HASH_SPACE))).cast("long")
    kept = df.join(F.broadcast(rates), domain_col, "inner").where(u < thr)
    if rate_col:
        return kept.withColumnRenamed("_rate", rate_col)
    return kept.drop("_rate")
