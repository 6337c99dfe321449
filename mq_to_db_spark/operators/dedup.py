"""Deduplication operators for large-scale training-data pipelines.

Four strategies, fine → coarse, all shuffle-aware:

  * **exact** — hash-groupBy on a content fingerprint; one shuffle on the
    (high-cardinality, well-distributed) hash → no skew.
  * **MinHash + LSH** — word-shingle → H minhashes → band/bucket join.
    Candidate generation is an explode+self-join *on band buckets* (never
    all-pairs); verification re-computes exact Jaccard on candidates only.
    Classic Broder/Leskovec-Rajaraman-Ullman (MMDS ch.3) construction.
  * **SimHash** — 64-bit Charikar signature via one Arrow-vectorized
    pandas UDF (numpy bit-unpacking, no per-row Python); near-dups share
    signatures within small Hamming distance, found by pigeonhole band
    match on 4×16-bit chunks.
  * **n-gram Jaccard** — inverted-index pair generation (explode shingle →
    join on shingle → count shared) with document-frequency pruning so a
    stopword-shingle can't explode the join (the skew guard at 100 TB).

Hashes are md5-derived (not xxhash64) wherever a DuckDB oracle needs to
reproduce the value; xxhash64 where only self-consistency matters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mq_to_db_spark.functions.text import normalize_text

# -- exact --------------------------------------------------------------------


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest-id representative of each exact (normalized)
    duplicate class.  min_by avoids a window shuffle: single hash agg."""
    fp = F.md5(normalize_text(text_col))
    return (
        df.withColumn("_fp", fp)
        .groupBy("_fp")
        .agg(
            F.min_by(F.struct(*df.columns), F.col(id_col)).alias("_rep"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("_rep.*", "dup_count")
    )


# -- shingles + minhash -------------------------------------------------------


def word_shingles(col, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text (array<string>);
    shorter docs yield their single full-text shingle."""
    name = col if isinstance(col, str) else col._jc.toString()
    norm = (
        f"trim(regexp_replace(regexp_replace(lower({name}), '[^\\\\w\\\\s]', ' '), '\\\\s+', ' '))"
    )
    words = f"split({norm}, ' ')"
    return F.expr(
        f"array_distinct(CASE WHEN size({words}) < {n} THEN array({norm}) ELSE "
        f"transform(sequence(0, size({words}) - {n}), "
        f"i -> array_join(slice({words}, i + 1, {n}), ' ')) END)"
    )


def _md5_hash64(c: Column, seed: int) -> Column:
    """Deterministic 60-bit integer hash reproducible in DuckDB:
    first 15 hex chars of md5(seed || value)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}#"), c)), 1, 15), 16, 10).cast("long")


def minhash_signature(shingle_col: Column, n_hashes: int = 32) -> Column:
    """array<long> of per-seed min-hashes over the shingle set."""
    mins = [
        F.array_min(F.transform(shingle_col, lambda s, i=i: _md5_hash64(s, i)))
        for i in range(n_hashes)
    ]
    return F.array(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with exact Jaccard ≥ threshold.

    rows/bands tuned so the LSH S-curve midpoint ≈ threshold^(1/r).
    Verification computes exact Jaccard over the shingle sets of
    candidates only."""
    assert n_hashes % bands == 0
    r = n_hashes // bands
    base = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
        .withColumn("shingles", word_shingles("text", shingle_n))
        .filter(F.size("shingles") > 0)
        .withColumn("sig", minhash_signature(F.col("shingles"), n_hashes))
    )
    banded = base.select(
        "id",
        "shingles",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b AS band, array_join(slice(sig, b * {r} + 1, {r}), ',') AS key))"
            )
        ).alias("bk"),
    ).select("id", "shingles", "bk.band", "bk.key")
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cands.withColumn("jaccard", F.try_divide(inter, union))
        .filter(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_minhash(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.7, **kw
) -> DataFrame:
    """Drop near-duplicates: connected components approximated by
    keep-lowest-id-neighbor (one pass — adequate for dedup where clusters
    are small; exact CC would iterate)."""
    pairs = minhash_lsh_pairs(df, id_col, text_col, verify_threshold=threshold, **kw)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# -- n-gram Jaccard via inverted index ---------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Exact Jaccard pairs via inverted index: explode shingles, self-join
    on shingle, count shared, compute |A∩B| / (|A|+|B|-|A∩B|).

    ``max_doc_freq`` prunes shingles appearing in more than N docs before
    the self-join — the skew guard: a ubiquitous shingle would otherwise
    produce O(N²) candidate rows."""
    docs = (
        df.select(F.col(id_col).alias("id"), word_shingles(text_col, shingle_n).alias("sh"))
        .filter(F.size("sh") > 0)
        .withColumn("n_sh", F.size("sh"))
    )
    posting = docs.select("id", "n_sh", F.explode("sh").alias("shingle"))
    freq = posting.groupBy("shingle").count().filter(F.col("count") <= max_doc_freq)
    posting = posting.join(F.broadcast(freq.select("shingle")), "shingle")
    a = posting.alias("a")
    b = posting.alias("b")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                 F.col("a.n_sh").alias("na"), F.col("b.n_sh").alias("nb"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        shared.withColumn("jaccard", jac.cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# -- simhash ------------------------------------------------------------------


@F.pandas_udf(T.LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    """Charikar simhash over word tokens — vectorized per Arrow batch:
    token hashing via numpy polynomial rolling hash on codepoints, bit
    voting via unpackbits matrix sum."""
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if t is None or not isinstance(t, str) or not t.strip():
            continue
        words = pd.Series(t.lower().split())
        # vectorized 64-bit FNV-ish hash per word
        h = np.zeros(len(words), dtype=np.uint64)
        codes = words.map(lambda w: np.frombuffer(w.encode("utf-8"), dtype=np.uint8))
        maxlen = max(len(c) for c in codes)
        mat = np.zeros((len(words), maxlen), dtype=np.uint64)
        for j, c in enumerate(codes):
            mat[j, : len(c)] = c
        P = np.uint64(1099511628211)
        h = np.zeros(len(words), dtype=np.uint64)
        for col in range(maxlen):
            h = h * P + mat[:, col] + np.uint64(0x9E3779B97F4A7C15)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        sig = (np.where(votes >= 0, 1, 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
            dtype=np.uint64
        )
        out[i] = np.int64(sig.astype(np.int64))
    return pd.Series(out)


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(F.col(id_col).alias("id"), _simhash64(F.col(text_col)).alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Candidate pairs within Hamming distance ≤ max_hamming, via the
    pigeonhole trick: split 64 bits into 4 chunks of 16; any pair within
    distance 3 agrees exactly on ≥1 chunk → join per chunk, verify with
    bit_count(xor)."""
    sigs = simhash(df, id_col, text_col)
    chunks = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), c -> "
                "struct(c AS chunk, shiftright(simhash, c * 16) & 65535 AS key))"
            )
        ).alias("ck"),
    ).select("id", "simhash", "ck.chunk", "ck.key")
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, ["chunk", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# -- embedding near-dup -------------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95, n_planes: int = 16
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold; candidates
    from random-hyperplane LSH buckets (see similarity.py), verified with
    exact cosine."""
    from mq_to_db_spark.operators.similarity import cosine_sim_cols, hyperplane_signature

    sigs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).withColumn("sig", hyperplane_signature(F.col("vec"), n_planes))
    a, b = sigs.alias("a"), sigs.alias("b")
    cos = cosine_sim_cols(F.col("a.vec"), F.col("b.vec"))
    return (
        a.join(b, "sig")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
