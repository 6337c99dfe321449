"""Spherical k-means over embedding columns + SemDeDup semantic dedup.

SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication") removes documents whose
*meaning* duplicates another's even when no token overlaps: cluster the
embedding space cheaply, then compare pairs only WITHIN a cluster and
drop every member that has a sufficiently-cosine-similar lower-id
neighbor.  This is the semantic sibling of the lexical near-dup family
in operators/dedup.py (MinHash / SimHash / winnowing).

Spark-first shape:

  * **init** — the deterministic md5-rank corpus-vector quantizer
    already used by the IVF index (similarity.ivf_centroids): zero
    iterations of anything, identical on any cluster size, and
    integer-replayable by the DuckDB oracle.
  * **Lloyd refinement** (:func:`kmeans_fit`) — per iteration ONE
    assignment projection (the codegen/Arrow argmax of
    similarity.ivf_assign, centroids as broadcast-free literals) and
    ONE groupBy computing per-component means; k·dim doubles return to
    the driver between iterations (bounded metadata, the IVF-centroid
    precedent).  Means are rounded to ``round_to`` decimals so the
    distributed sum's order-dependent ulps cannot leak into the next
    iteration's assignments — the oracle replays the same rounding.
  * **dedup** (:func:`semdedup`) — self-join keyed on the cluster id:
    only (cluster, id, vec) ride the shuffle, pairs materialize ids
    only, and a vector is dropped iff a LOWER-id vector in the same
    cluster has cosine >= threshold (first-seen-survives, the same
    survivor rule as the lexical planes).  At 10^12 rows pick
    k ~ sqrt(n) so expected cluster size stays bounded; the pair stage
    is then O(n·avg_cluster) with no all-pairs blowup.

Reference analogue: the reference engine has no vector plane at all
(internal/storage delegates everything to PostgreSQL) — this operator
exists for the 100 TB training-data pipeline the engine fronts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mq_to_db_spark.operators.similarity import ivf_assign, ivf_centroids

__all__ = ["kmeans_fit", "kmeans_assign", "semdedup"]

# pair_backend="auto" switch point: largest cluster_size · dim that the
# grouped-Arrow pair stage may hold in one batch (~128 MB of float64).
# Above it the bit-identical streaming expr join takes over — the same
# bound-style guard as similarity.ivf_assign's codegen/Arrow switch.
ARROW_PAIR_ELEM_BOUND = 16_777_216


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> list[list[float]]:
    """``n_iter`` Lloyd iterations of spherical k-means (max-cosine
    assignment, arithmetic-mean update) from the md5-rank init.

    Returns the refined centroid list (k x dim python floats).  Empty
    clusters keep their previous centroid.  Each iteration is one
    narrow assignment + one aggregation over the input — no caching
    required, though callers looping many iterations should persist
    ``df`` themselves.
    """
    from pyspark import StorageLevel

    # one narrow projection, persisted across the iterations: every
    # Lloyd pass (and the init's hash top-k) otherwise re-runs the full
    # upstream (scan + any union/transform feeding the corpus) — the
    # dominant cost of the fit at sf0.1.  MEMORY_AND_DISK: at 10^12
    # rows the fit runs on a corpus sample anyway (k ~ sqrt(n) clusters
    # need no more than ~k·10^3 sample vectors to converge).
    vecs = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        cents = ivf_centroids(vecs, n_centroids=k, id_col=id_col, vec_col="_v")
        if not cents:
            return []
        dim = len(cents[0])
        for _ in range(n_iter):
            assigned = kmeans_assign(vecs, cents, vec_col="_v", out_col="_lid")
            # F.get (not [i]): ANSI-safe on NULL/short vectors — a row
            # missing position i contributes NULL, which avg skips,
            # exactly the oracle's unnest-with-position replay
            aggs = [
                F.round(F.avg(F.get(F.col("_v"), i)), round_to).alias(f"c{i}")
                for i in range(dim)
            ]
            rows = assigned.groupBy("_lid").agg(*aggs).collect()
            means = {r["_lid"]: [r[f"c{i}"] for i in range(dim)] for r in rows}
            cents = [means.get(i, cents[i]) for i in range(len(cents))]
        return cents
    finally:
        vecs.unpersist()


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
    use_udf: bool | None = True,
) -> DataFrame:
    """Max-cosine cluster assignment (ties -> highest cluster id, the
    ivf_assign struct-greatest convention).

    Defaults to ivf_assign's Arrow-UDF argmax (bit-identical to the
    expression path — test_ivf_assign_udf_parity): Lloyd iterations
    bake FRESH centroid literals into every assignment plan, so the
    expression path pays a full janino compile of a k×dim-literal tree
    per iteration — measured as ~5 s of the 8 s semdedup query at
    sf0.1, vs milliseconds of Arrow argmax compute."""
    return ivf_assign(
        df, centroids, vec_col=vec_col, out_col=out_col, use_udf=use_udf
    )


def _dropped_ids_expr(slim: DataFrame, threshold: float) -> DataFrame:
    """Pair stage, expression path: self-join on cluster, one fold dot
    per pair against precomputed norms.  Streaming memory, interpreted
    higher-order evaluation per pair."""
    from mq_to_db_spark.operators.similarity import dot

    l = slim.select(
        "cluster",
        F.col("_id").alias("_id_l"),
        F.col("_v").alias("_v_l"),
        F.col("_n").alias("_n_l"),
    )
    r = slim.select(
        "cluster",
        F.col("_id").alias("_id_r"),
        F.col("_v").alias("_v_r"),
        F.col("_n").alias("_n_r"),
    )
    pair_cos = F.try_divide(
        dot(F.col("_v_l"), F.col("_v_r")),
        F.col("_n_l") * F.col("_n_r"),
    )
    return (
        l.join(r, "cluster")
        .where(F.col("_id_l") < F.col("_id_r"))
        .where(pair_cos >= threshold)
        .select(F.col("_id_r").alias("_dropped"))
        .distinct()
    )


def _dropped_ids_arrow(slim: DataFrame, threshold: float) -> DataFrame:
    """Pair stage, Arrow path: one grouped batch per cluster; dots and
    norms are strict left-associated accumulator folds vectorized
    ACROSS pairs (seeded 0.0, column order 0..dim-1 — the exact
    association of ``F.aggregate``/:func:`_dropped_ids_expr`, the same
    bit-compatibility contract as similarity._ivf_assign_udf, parity-
    tested).  The j-axis is blocked so peak memory is O(n·block), not
    O(cluster²); rows with NULL or off-dimension vectors never drop
    and are never dropped (expr parity: their fold dot is NULL).
    Pairing is on STRICT id order (``id_i < id_j``, never positional),
    so duplicate ids cannot pair — expr parity again.  Ids must be
    integral (packed into an int64 array; :func:`semdedup` validates)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    thr = float(threshold)
    out_schema = T.StructType([T.StructField("_dropped", T.LongType())])

    def _pairs_same_dim(ids: np.ndarray, V: np.ndarray) -> np.ndarray:
        """Dropped ids among rows of ONE dimensionality (ids ascending).
        Strict-fold dots/norms; j-axis blocked for O(n·block) memory."""
        n, dim = V.shape
        acc = np.zeros(n, dtype=np.float64)
        for d in range(dim):
            acc += V[:, d] * V[:, d]
        norm = np.sqrt(acc)
        dropped = np.zeros(n, dtype=bool)
        B = 2048
        for j0 in range(1, n, B):
            j1 = min(j0 + B, n)
            Vb = V[j0:j1]
            dots = np.zeros((n, j1 - j0), dtype=np.float64)
            for d in range(dim):
                dots += V[:, d : d + 1] * Vb[:, d][None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / (norm[:, None] * norm[j0:j1][None, :])
            # pair on STRICT id order, not position: two rows sharing an
            # id must never pair (expr parity: `_id_l < _id_r` is strict)
            mask = ids[:, None] < ids[j0:j1][None, :]
            # NaN (0/0, zero-norm rows) compares False, like NULL cosine
            hit = np.greater_equal(
                cos, thr, where=~np.isnan(cos), out=np.zeros_like(mask)
            ) & mask
            dropped[j0:j1] |= hit.any(axis=0)
        return ids[dropped]

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id", kind="mergesort")
        vec_list = list(pdf["_v"])
        all_ids = pdf["_id"].to_numpy(dtype=np.int64)
        # expr parity: zip_with pads mismatched lengths with NULL, so a
        # pair's fold dot is non-NULL only for EQUAL-length vectors —
        # partition by length and pair within each subgroup
        lens = np.fromiter(
            (0 if v is None else len(v) for v in vec_list),
            dtype=np.int64,
            count=len(vec_list),
        )
        out: list[np.ndarray] = []
        for L in np.unique(lens):
            if L == 0:
                continue  # empty/NULL vecs: fold dot NULL, never pair
            sel = lens == L
            if int(sel.sum()) < 2:
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v, m in zip(vec_list, sel) if m]
            )
            out.append(_pairs_same_dim(all_ids[sel], V))
        if not out:
            return pd.DataFrame({"_dropped": pd.Series([], dtype="int64")})
        return pd.DataFrame({"_dropped": np.concatenate(out)})

    return (
        slim.select("cluster", "_id", "_v")
        .groupBy("cluster")
        .applyInPandas(pairs, out_schema)
    )


def semdedup(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    threshold: float = 0.85,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    pair_backend: str = "auto",
) -> DataFrame:
    """SemDeDup: (id, cluster, kept) for every input row.

    ``kept = false`` iff some lower-id row in the SAME cluster has a
    strictly lower id AND cosine >= ``threshold`` — deterministic
    first-seen-survives, no transitive closure needed (every member of
    a near-dup group except the minimum id sees the minimum id as its
    lower neighbor).  Rows sharing an id never pair (strict ``<`` on
    both backends).

    ``pair_backend``:

    * ``"auto"`` (default) — Arrow while the largest ``cluster_size ·
      dim`` fits :data:`ARROW_PAIR_ELEM_BOUND` AND the id column is
      integral; the streaming expr join otherwise (one tiny k-row agg
      over the persisted assignment decides).
    * ``"arrow"`` — one grouped batch per cluster, strict-fold numpy,
      ~6× the join path's pair throughput at sf0.1.  Requires an
      integral (byte/short/int/long) id column — ids ride an int64
      numpy array — and raises TypeError otherwise.
    * ``"expr"`` — the self-join; streaming memory for clusters that
      outgrow a worker's Arrow batch budget; any id type.

    Both backends are bit-identical (test_semcluster parity test).
    """
    cents = kmeans_fit(
        df, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col,
        round_to=round_to,
    )
    # persist: the assignment subtree (a k·dim-literal argmax over the
    # corpus) otherwise re-evaluates for BOTH pair-join sides and the
    # final kept-join — 3× the most expensive projection in the plan
    assigned = kmeans_assign(
        df, cents, vec_col=vec_col, out_col="cluster"
    ).persist()
    from mq_to_db_spark.operators.similarity import l2_norm

    # norms once per row (not once per pair) — bit-identical to
    # cosine_sim_cols(v_l, v_r): same fold expression, same values
    slim = assigned.select(
        "cluster",
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).withColumn("_n", l2_norm(F.col("_v")))
    integral_id = isinstance(
        assigned.schema[id_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    )
    if pair_backend == "auto":
        # the semcluster analogue of ivf_assign's codegen-bound switch:
        # the Arrow path groups a WHOLE cluster into one batch, so with
        # k≈√n a cluster can reach ~10⁶ vectors at 10^12 rows — hundreds
        # of MB per batch.  Size the decision on the actual largest
        # cluster (one tiny agg over the persisted assignment, k rows):
        # max_cluster_size · dim ≤ ARROW_PAIR_ELEM_BOUND (≈128 MB of
        # float64) stays Arrow; anything larger — or a non-integral id
        # column, which the Arrow path cannot represent — takes the
        # bit-identical streaming expr join.
        pair_backend = "arrow"
        if not integral_id:
            pair_backend = "expr"
        else:
            stats = assigned.groupBy("cluster").agg(
                F.count(F.lit(1)).alias("n"),
                F.max(F.size(vec_col)).alias("d"),
            ).agg(F.max(F.col("n") * F.col("d")).alias("m")).first()
            if stats is not None and (stats.m or 0) > ARROW_PAIR_ELEM_BOUND:
                pair_backend = "expr"
    if pair_backend == "arrow":
        if not integral_id:
            raise TypeError(
                f"pair_backend='arrow' packs ids into an int64 numpy "
                f"array, but column {id_col!r} has type "
                f"{assigned.schema[id_col].dataType.simpleString()!r} — "
                "use pair_backend='expr' (bit-identical) or 'auto'"
            )
        dropped = _dropped_ids_arrow(slim, threshold)
    elif pair_backend == "expr":
        dropped = _dropped_ids_expr(slim, threshold)
    else:
        raise ValueError(
            f"pair_backend must be auto|arrow|expr, got {pair_backend!r}"
        )
    return (
        assigned.join(
            dropped, assigned[id_col] == dropped["_dropped"], "left"
        )
        .select(
            id_col,
            "cluster",
            F.col("_dropped").isNull().alias("kept"),
        )
    )
