"""Train/eval decontamination: n-gram overlap against a benchmark set.

A training corpus must not contain the evaluation benchmarks — the
standard check (GPT-3 §C / PaLM / Llama papers) flags a training document
when it shares at least ``min_hits`` distinct word n-grams with any eval
document.  The reference has no analogue (it forwards messages); this
extends the engine's training-data plane alongside dedup/sampling.

Scale design (corpus = 100 TB, eval = MB–GB — *radically* asymmetric):
  * eval n-grams become one DISTINCT set of **int64 hashes** (8 bytes per
    n-gram, no strings — the ``hashed_shingle_sets`` machinery shared
    with minhash/ngram-jaccard, dedup.py:62), then are **broadcast**: the
    corpus-side probe is a broadcast LEFT SEMI join inside the corpus
    scan stage — zero shuffle of corpus data;
  * per-doc hits aggregate on ``(doc id)`` over only the *matched*
    exploded rows (the semi-join prunes before the agg, so the exchange
    carries hits, not n-grams);
  * output is the per-doc hit count — callers anti-join ids against it
    to drop contaminated docs (ids only, never text, through the join).

With a multi-GB eval set, swap ``F.broadcast`` for a shuffle hash join by
passing ``broadcast_eval=False`` — same semantics, planner's choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mq_to_db_spark.operators.dedup import hashed_shingle_sets


def eval_ngram_set(
    eval_df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """(ngram: bigint) — the DISTINCT hashed word-n-gram set of the eval
    corpus (normalized text, sub-n-word docs contribute their whole-text
    shingle; dedup.hashed_shingle_sets semantics)."""
    return (
        hashed_shingle_sets(eval_df, id_col, text_col, n=n)
        .select(F.explode("shingles").alias("ngram"))
        .distinct()
    )


def contamination_hits(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """(id, n_hits) for corpus docs sharing ≥ ``min_hits`` distinct word
    n-grams with the eval set.  ``n_hits`` counts DISTINCT shared n-grams
    (a doc repeating one leaked n-gram 50× is 1 hit)."""
    evals = eval_ngram_set(eval_df, id_col, text_col, n=n)
    if broadcast_eval:
        evals = F.broadcast(evals)
    corpus_ngrams = hashed_shingle_sets(corpus, id_col, text_col, n=n).select(
        "id", F.explode("shingles").alias("ngram")
    )
    return (
        corpus_ngrams.join(evals, "ngram", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))  # shingles pre-distinct per doc
        .filter(F.col("n_hits") >= min_hits)
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Corpus minus contaminated docs: LEFT ANTI join on ids against
    ``contamination_hits`` (ids only through the join — doc payloads
    never shuffle)."""
    hits = contamination_hits(corpus, eval_df, id_col, text_col, n, min_hits)
    return corpus.join(
        F.broadcast(hits.select(F.col("id").alias(id_col))),
        id_col,
        "left_anti",
    )


# --------------------------------------------------------------------------
# Bloom-filter membership — the too-big-to-broadcast decontamination path
# --------------------------------------------------------------------------
#
# `contamination_hits` above broadcasts the eval set's raw n-gram keys —
# right up to the point the benchmark suite is tens of millions of
# documents and the key set no longer fits a broadcast.  The standard
# scale answer is a Bloom filter: k md5-coin hash positions in an m-bit
# array packed into 63-bit BIGINT words (bit 63 avoided so every mask
# stays positive in every engine).  The filter is m/63 rows of
# (word, bits) — a 100M-key filter at 1% fpr is ~120 MB of longs,
# broadcastable where the raw keys are not.  Membership is exact-on-
# negatives (a miss is PROOF the document is clean); positives carry the
# designed false-positive rate and get routed to the exact semi-join for
# confirmation — so the expensive path runs on ~fpr of the corpus.
#
# Determinism: positions ride hash_u60 (operators/sampling.py) with
# per-probe seeds, so the full construction — and therefore every false
# positive — replays bit-for-bit in ANSI SQL.


def bloom_build(
    eval_df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 4,
    seed: str = "bloom",
) -> DataFrame:
    """Bloom filter of the eval keys: ``(word, bits)`` rows, word =
    position // 63, bits = OR of ``1 << (position % 63)``.  ONE hash
    aggregation (map-side combined); output is ceil(m/63) rows max."""
    from mq_to_db_spark.operators.sampling import hash_u60

    probes = []
    for i in range(1, k + 1):
        pos = hash_u60(F.col(key_col), seed=f"{seed}{i}") % m_bits
        probes.append(
            F.struct(
                (pos / 63).cast("long").alias("word"),
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (pos % 63).cast("int")
                ).alias("mask"),
            )
        )
    return (
        eval_df.select(F.explode(F.array(*probes)).alias("p"))
        .groupBy(F.col("p.word").alias("word"))
        .agg(F.bit_or("p.mask").alias("bits"))
    )


def bloom_member(
    corpus: DataFrame,
    key_col: str,
    bloom: DataFrame,
    id_cols: list[str],
    m_bits: int = 1 << 20,
    k: int = 4,
    seed: str = "bloom",
) -> DataFrame:
    """Append ``bloom_hit`` per corpus row: TRUE iff ALL k probe bits
    are set.  The corpus explodes k (word, mask) probes, broadcast-
    hash-joins the filter words, and ANDs the per-probe tests back per
    id — the corpus never shuffles on anything but the final id group
    (and that exchange carries (id, bool) pairs only)."""
    from mq_to_db_spark.operators.sampling import hash_u60

    probes = []
    for i in range(1, k + 1):
        pos = hash_u60(F.col(key_col), seed=f"{seed}{i}") % m_bits
        probes.append(
            F.struct(
                (pos / 63).cast("long").alias("word"),
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (pos % 63).cast("int")
                ).alias("mask"),
            )
        )
    exploded = corpus.select(
        *id_cols, F.explode(F.array(*probes)).alias("p")
    ).select(*id_cols, "p.word", "p.mask")
    joined = exploded.join(F.broadcast(bloom), "word", "left")
    hit = (F.col("bits").isNotNull()) & (
        F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")
    )
    flags = joined.select(*id_cols, hit.alias("_hit")).groupBy(*id_cols).agg(
        F.bool_and("_hit").alias("bloom_hit")
    )
    return corpus.join(flags, id_cols, "left")
