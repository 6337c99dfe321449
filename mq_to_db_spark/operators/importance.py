"""DSIR-style importance weighting and target-overlap scoring for
training-corpus selection (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling" — hashed n-gram bag
features, bucketed log-likelihood-ratio weights, Gumbel resampling).

The reference's dataflow ends at "store every message"; a training
pipeline at 10^12 turns must instead *choose* — this plane scores raw
documents by how target-like their hashed n-gram distribution is and
resamples toward the target.

Pipeline shape (all heavy steps are single hash aggregations over
narrow (id, bucket) rows; the bucket tables are ``buckets``-row
config-sized and broadcast):

  1. :func:`hashed_ngram_buckets` — lowercased whitespace tokens (the
     ``lexical_stats`` tokenizer, functions/text.py), n-grams joined
     by one space, bucketed by the content-addressed 60-bit md5 coin
     (``hash_u60`` — DuckDB-replayable) mod ``buckets``.  Pure array
     expressions; the explode carries (id, bucket) only.
  2. :func:`bucket_profile` — per-bucket BIGINT corpus counts.
  3. :func:`dsir_log_weights` — per-doc log importance weight
     ``Σ_b c_b · (ln p̂_target(b) − ln p̂_raw(b))`` with Laplace
     smoothing ``(count+1)/(N+B)``.  The Δ table is broadcast; the
     per-doc sum is a double fold (order-dependent in its last bits —
     documented; selection is threshold/rank-based, so last-bit noise
     is immaterial.  The CONTRACT therefore pins the integer-exact
     statistic below, and the float path is verified in pytest against
     a numpy replay).
  4. :func:`dsir_select` — Gumbel-top-k resampling: key =
     ``log_w + g`` with ``g = −ln(−ln u)``, ``u`` from the hash coin —
     deterministic in (seed, id), a sample WITHOUT replacement from
     the softmax of the weights (the Gumbel-max trick).
  5. :func:`target_overlap_topk` — the integer-exact sibling: score =
     ``Σ_b c_doc(b) · c_target(b)`` (a BIGINT inner product with the
     target bucket profile — unnormalized kernel similarity).  Exact
     partial aggregation, order-independent, hash-replayable: this is
     the contract surface for the whole feature pipeline.

Scale: tokens never shuffle as strings — hashing happens in the
projection, so every exchange carries (id, int bucket, count).
``buckets`` (default 8192) bounds profile/broadcast size regardless of
corpus size; doc×bucket rows are ≤ n_tokens per doc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mq_to_db_spark.operators.sampling import hash_u60

__all__ = [
    "hashed_ngram_buckets",
    "bucket_profile",
    "dsir_log_weights",
    "dsir_select",
    "target_overlap_topk",
]


def _tokens(text_col: str) -> Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )


def hashed_ngram_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    buckets: int = 8192,
    seed: int = 7,
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, bucket, c): BIGINT count of the doc's n-grams landing in
    each hashed bucket.  Docs with < n tokens emit no rows.

    ``hash_fn`` picks the bucket hash:

      * ``"md5"`` (default) — the content-addressed 60-bit coin
        (``hash_u60``), DuckDB-replayable character for character;
        the contract/oracle path.
      * ``"xxhash64"`` — Spark's native 64-bit hash (one JVM intrinsic
        per gram vs md5's digest-over-string): measurably cheaper on
        gram-heavy corpora, the 100 TB production path.  Bucket
        distribution quality is equivalent; only cross-engine
        replayability differs (DuckDB's hash() is a different
        function), so oracle-checked queries stay on md5.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(f"hash_fn must be md5 or xxhash64, got {hash_fn!r}")
    t = _tokens(text_col)
    # n-grams as a zip_with chain, NOT transform(sequence, i -> slice):
    # sub-expressions inside a higher-order-function lambda re-evaluate
    # PER ELEMENT, so slice(t, i, n) re-runs the whole tokenizer split
    # for every gram — O(L²) work per doc (measured 2× the query's
    # runtime at sf0.1).  zip_with evaluates both array arguments once
    # and zips elementwise: g ⊗ shift¹(t) ⊗ … ⊗ shiftⁿ⁻¹(t) is O(n·L).
    # Tail positions zip against null and null-propagate through concat
    # (never concat_ws, which skips nulls and would leave short grams),
    # then filter drops them — short docs come out naturally empty.
    grams = t
    for j in range(1, n):
        shifted = F.slice(t, j + 1, F.greatest(F.size(t) - j, F.lit(0)))
        grams = F.zip_with(
            grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
        )
    grams = F.filter(grams, lambda g: g.isNotNull())
    # explode of the (possibly empty) gram array drops short docs itself
    ex = df.select(F.col(id_col), F.explode(grams).alias("_g"))
    if hash_fn == "md5":
        bucket = (hash_u60(F.col("_g"), seed) % buckets).alias("bucket")
    else:
        bucket = F.pmod(
            F.xxhash64(F.lit(str(seed)), F.col("_g")), F.lit(buckets)
        ).alias("bucket")
    return (
        ex.select(id_col, bucket)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bucket_profile(counts: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Corpus bucket profile: (bucket, c_corpus) BIGINT totals."""
    return counts.groupBy("bucket").agg(F.sum("c").alias("c_corpus"))


def dsir_log_weights(
    raw_counts: DataFrame,
    target_profile: DataFrame,
    raw_profile: DataFrame,
    buckets: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc DSIR log importance weight over Laplace-smoothed bucket
    unigram models: ``log_w = Σ_b c_b·(ln p̂_t(b) − ln p̂_r(b))``.
    Both profiles broadcast (≤ ``buckets`` rows); one narrow join +
    one hash agg.  Double summation order caveat in the module doc."""
    nt = target_profile.agg(F.sum("c_corpus")).first()[0] or 0
    nr = raw_profile.agg(F.sum("c_corpus")).first()[0] or 0
    tp = target_profile.withColumnRenamed("c_corpus", "_ct")
    rp = raw_profile.withColumnRenamed("c_corpus", "_cr")
    delta = (
        tp.join(rp, "bucket", "full")
        .select(
            "bucket",
            (
                F.log((F.coalesce("_ct", F.lit(0)) + 1).cast("double") / F.lit(float(nt + buckets)))
                - F.log((F.coalesce("_cr", F.lit(0)) + 1).cast("double") / F.lit(float(nr + buckets)))
            ).alias("_delta"),
        )
    )
    return (
        raw_counts.join(F.broadcast(delta), "bucket", "left")
        .groupBy(id_col)
        .agg(F.sum(F.col("c") * F.coalesce("_delta", F.lit(0.0))).alias("log_w"))
    )


def dsir_select(
    weights: DataFrame,
    k: int,
    seed: int = 99,
    id_col: str = "doc_id",
    w_col: str = "log_w",
) -> DataFrame:
    """Gumbel-top-k resampling: keep the k docs with the largest
    ``log_w + Gumbel(seed, id)`` — an exact sample without replacement
    from ``softmax(log_w)`` (Gumbel-max trick), deterministic in
    (seed, id).  ``orderBy().limit()`` compiles to TakeOrdered — no
    global sort."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = (hash_u60(F.col(id_col), seed).cast("double") + 0.5) / F.lit(
        float(1 << 60)
    )  # (0, 1) strictly — +0.5 keeps log defined at both ends
    gumbel = -F.log(-F.log(u))
    return (
        weights.withColumn("_key", F.col(w_col) + gumbel)
        .orderBy(F.col("_key").desc(), F.col(id_col))
        .limit(k)
        .drop("_key")
    )


def target_overlap_topk(
    raw: DataFrame,
    target: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    buckets: int = 8192,
    seed: int = 7,
    hash_fn: str = "md5",
) -> DataFrame:
    """Integer-exact target-similarity ranking: top-``k`` raw docs by
    ``overlap = Σ_b c_doc(b)·c_target(b)`` (BIGINT inner product with
    the target's hashed-n-gram profile), ties broken by ``id_col``.
    The order-independent contract surface for the DSIR feature
    pipeline; the float log-ratio path refines the same features."""
    rc = hashed_ngram_buckets(raw, id_col, text_col, n, buckets, seed, hash_fn)
    tp = bucket_profile(
        hashed_ngram_buckets(target, id_col, text_col, n, buckets, seed, hash_fn),
        id_col,
    ).withColumnRenamed("c_corpus", "_ct")
    scored = (
        rc.join(F.broadcast(tp), "bucket", "inner")
        .groupBy(id_col)
        .agg(F.sum(F.col("c") * F.col("_ct")).alias("overlap"))
    )
    return scored.orderBy(F.col("overlap").desc(), F.col(id_col)).limit(k)
