"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — one narrow pass (zip_with dot
product, JVM-side) + ``ORDER BY LIMIT k`` which Spark executes as a
per-partition top-k + driver merge (TakeOrderedAndProject), never a full
sort.  Scale path: random-hyperplane LSH bucketing (Charikar) — probe
only matching buckets, with multi-probe on query-side sign flips to
recover recall.  An IVF-style variant partitions by nearest coarse
centroid.

All vector math is expression-level (``zip_with`` + ``aggregate``) —
vectorized by codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim_cols(a: Column, b: Column) -> Column:
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector — the
    exact baseline every ANN variant is measured against."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine_sim_cols(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def hyperplane_signature(vec: Column, n_planes: int = 16, seed: int = 13) -> Column:
    """LSH bucket id: sign pattern of dot products with ``n_planes``
    deterministic pseudo-random hyperplanes.

    The planes are generated *as an expression*: plane p, dim d weight =
    hash-derived uniform in [-1, 1) via xxhash64(seed, p, d) — identical
    on every executor, no broadcast needed, works for any vector length."""
    w = lambda p: F.transform(
        F.sequence(F.lit(0), F.size(vec) - 1),
        lambda d: (
            F.pmod(F.xxhash64(F.lit(seed), F.lit(p), d), F.lit(2_000_000)).cast("double")
            / F.lit(1_000_000.0)
            - F.lit(1.0)
        ),
    )
    bits = [
        F.when(dot(vec.cast("array<double>"), w(p)) >= 0, F.lit(1)).otherwise(F.lit(0))
        for p in range(n_planes)
    ]
    sig = F.lit(0)
    for b in bits:
        sig = sig * 2 + b
    return sig.cast("long")


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: hash the corpus once into hyperplane buckets,
    probe the query's bucket (± ``multiprobe`` single-bit flips), exact
    cosine within candidates only.

    At scale the bucketed corpus is a materialized table partitioned by
    ``sig``; the probe is then a partition-pruned scan."""
    import math

    hashed = df.withColumn("sig", hyperplane_signature(F.col(vec_col), n_planes))
    # compute query signature driver-side with the same hash recipe is
    # impossible without the JVM hash; instead compute it with a 1-row DF.
    spark = df.sparkSession
    qdf = spark.createDataFrame([(query_vec,)], schema=f"v array<double>")
    qsig = qdf.select(hyperplane_signature(F.col("v"), n_planes).alias("s")).collect()[0].s
    probes = {qsig} | {qsig ^ (1 << b) for b in range(n_planes) if multiprobe > 0}
    if multiprobe > 1:
        probes |= {
            qsig ^ (1 << b1) ^ (1 << b2)
            for b1 in range(n_planes)
            for b2 in range(b1 + 1, n_planes)
        }
    cand = hashed.filter(F.col("sig").isin(*probes))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(
            F.col(id_col),
            cosine_sim_cols(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def knn_join_brute(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    left_id: str = "id_l",
    right_id: str = "id_r",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-NN join (each left row → its k nearest right rows) — broadcast
    brute force, correct for a small right side; window top-k per left id."""
    from pyspark.sql import Window as W

    l = left.select(F.col(left_id).alias("lid"), F.col(vec_col).alias("lv"))
    r = right.select(F.col(right_id).alias("rid"), F.col(vec_col).alias("rv"))
    scored = l.crossJoin(F.broadcast(r)).withColumn(
        "cosine", cosine_sim_cols(F.col("lv").cast("array<double>"), F.col("rv").cast("array<double>"))
    )
    w = W.partitionBy("lid").orderBy(F.desc("cosine"), F.col("rid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lid", "rid", "cosine", "rank")
    )


def ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic coarse quantizer: the ``n_centroids`` corpus vectors
    with the smallest ``xxhash64(id)`` (hash-reservoir sampling — stable
    across partitionings and cluster sizes, no iterative k-means job).
    At 100 TB this is one cheap top-k over ids; refining with a few Lloyd
    iterations is an optional offline step that only changes the anchor
    list, not the search path."""
    rows = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .withColumn("_h", F.xxhash64(F.col(id_col).cast("string")))
        .orderBy("_h")
        .limit(n_centroids)
        .collect()
    )
    return [list(r.v) for r in rows]


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "list_id",
) -> DataFrame:
    """Assign each vector to its nearest (max-cosine) centroid — the
    inverted-list id.  Centroids are literal expressions (broadcast-free,
    identical on every executor); at scale the assigned table is
    partitioned by ``list_id`` so probes prune partitions."""
    v = F.col(vec_col).cast("array<double>")
    # greatest() over (cos, lid) structs = max-by-cosine with a
    # deterministic lid tie-break (struct comparison is field-ordered)
    scored = [
        F.struct(
            cosine_sim_cols(v, F.array(*[F.lit(float(x)) for x in c])).alias("cos"),
            F.lit(i).alias("lid"),
        )
        for i, c in enumerate(centroids)
    ]
    return df.withColumn(out_col, F.greatest(*scored)["lid"] if len(scored) > 1 else scored[0]["lid"])


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` inverted lists whose
    centroids are nearest the query; exact cosine within candidates.

    Recall/latency knob is ``nprobe`` (= n_centroids ⇒ exact brute
    force).  The centroid ranking for the query happens driver-side in
    numpy (centroid count is tiny by construction)."""
    import numpy as np

    if centroids is None:
        centroids = ivf_centroids(df, n_centroids, id_col, vec_col)
    c = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    cos = (c @ q) / (np.linalg.norm(c, axis=1) * np.linalg.norm(q) + 1e-300)
    probes = [int(i) for i in np.argsort(-cos)[:nprobe]]

    assigned = ivf_assign(df, centroids, vec_col)
    cand = assigned.filter(F.col("list_id").isin(probes))
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(
            F.col(id_col),
            cosine_sim_cols(F.col(vec_col).cast("array<double>"), qcol).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )
