"""Corpus n-gram language-model perplexity scoring over document tables.

The classic LLM-corpus quality signal (CCNet, Wenzek et al. 2020;
reused by CCNet's descendants RedPajama/RefinedWeb): score every
document by the perplexity of a small n-gram LM — low-perplexity text
is fluent/natural, high-perplexity text is boilerplate, gibberish, or
tables.  The published pipelines score against a pretrained
Wikipedia KenLM; this sandbox has no external model files, so the
engine trains the model ON THE CORPUS ITSELF (a self-perplexity pass —
the standard "how typical is this document of the corpus" variant used
for domain filtering), which keeps the whole computation inside the
engine and lets the DuckDB oracle replay it exactly.

Model: add-one (Laplace) smoothed bigram LM over the lowercased
``[^a-z0-9]+``-split token stream (the same tokenizer as the BM25 /
lexical-stats family, operators/ranking.py), with a ``<s>`` start
history per document and no end token:

  * ``c(h, w)``  — corpus count of bigram (history, word);
  * ``c(h)``     — corpus count of history h  (= Σ_w c(h, w));
  * ``V``        — corpus vocabulary size (distinct tokens);
  * ``p(w | h) = (c(h, w) + 1) / (c(h) + V)``;
  * ``logprob(doc) = Σ_i ln p(t_i | t_{i-1})`` summed IN POSITION
    ORDER (a fixed chain of double additions — an unordered float
    ``sum()`` would not be bit-reproducible across engines);
  * ``ppl(doc) = exp(-logprob / n_tokens)``.

Exactness: every ``ln`` argument is an exact BIGINT (+1 / +V) cast to
double, the per-document fold runs over the position-sorted term list
on both engines, and the contract surface carries the integer-exact
pieces (``n_tokens``, ``bigram_c_sum``, ``n_singletons``) alongside
the two rounded doubles — the same discipline as BM25's fixed-order
chain (operators/ranking.py) and the DSIR integer surface
(operators/importance.py).

Scale design (the 100 TB shape):
  * tokenize + bigram explode are NARROW (one scan of (id, text),
    whole-stage codegen);
  * the bigram count table aggregates with map-side partial combine —
    the exchange carries one (h, w, partial) row per distinct bigram
    per map task, NOT per occurrence;
  * history counts and V derive from the (already tiny relative to the
    corpus) bigram table, never from a second raw scan;
  * the count join-back shuffles on (h, w); stopword histories are the
    hot keys — AQE skew-join splits them (session.py enables AQE), and
    the join carries only (doc_id, pos, h, w) plus two BIGINTs;
  * the per-document fold is one ``collect_list`` group of
    O(doc tokens) structs — the same per-group buffer bound as the
    engine's quantile_over_time / packing operators.

Reference analogue: none in mq-to-db (SURVEY.md §2 C-plane is
metrics-only); this extends the training-data plane's quality-scoring
family (functions/text.py) with the corpus-statistics signal those
per-row features cannot see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mq_to_db_spark.operators.ranking import tokens_col

#: per-document sentence-start history token (never collides with the
#: tokenizer's [a-z0-9]+ output)
START = "<s>"


def bigram_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, pos, h, w)`` — one row per token position, 1-based, with
    its bigram history (``<s>`` at pos 1).  Empty-token docs drop."""
    toks = docs.select(
        F.col(id_col), tokens_col(text_col).alias("_t")
    ).where(F.size("_t") > 0)
    hist = F.concat(
        F.array(F.lit(START)), F.slice("_t", 1, F.size("_t") - 1)
    )
    return toks.select(
        id_col,
        F.posexplode(F.arrays_zip(hist.alias("h"), F.col("_t").alias("w"))),
    ).select(
        id_col,
        (F.col("pos") + 1).alias("pos"),
        F.col("col.h").alias("h"),
        F.col("col.w").alias("w"),
    )


def bigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document self-perplexity under the corpus bigram LM:
    ``(id, n_tokens, bigram_c_sum, n_singletons, logprob, ppl)``.

    Cache lifetime (ADVICE r04): the ``pairs``/``bc`` persists below
    feed the RETURNED lazy frame (unlike kmeans_fit, nothing is
    collected here), so they cannot be unpersisted inside this
    function — the caller owns them.  A long-lived session scoring
    many corpora should ``spark.catalog.clearCache()`` (or unpersist
    via the returned plan's references) between invocations; otherwise
    Spark's LRU eviction reclaims executor storage, but disk-spilled
    blocks linger until then."""
    from pyspark import StorageLevel

    # pairs feeds the count-table build AND the join probe side — two
    # plan branches; without a persist the tokenize+explode scan runs
    # once per branch.  MEMORY_AND_DISK: at corpus scale this is the
    # materialized token-position table every CCNet-style scorer keeps.
    pairs = bigram_pairs(docs, id_col=id_col, text_col=text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # bc is tiny (distinct bigrams) but feeds hc, vocab AND the join —
    # three branches, each of which would re-run the count aggregation
    bc = pairs.groupBy("h", "w").agg(F.count(F.lit(1)).alias("c")).persist()
    hc = bc.groupBy("h").agg(F.sum("c").alias("ch"))
    # V = distinct tokens; every token occurrence is some bigram's w,
    # so the (small) bigram table already carries the full vocabulary
    vocab = bc.agg(F.count_distinct("w").alias("v_size"))
    joined = (
        pairs.join(bc, ["h", "w"])
        .join(hc, ["h"])
        .crossJoin(F.broadcast(vocab))
    )
    per = joined.groupBy(id_col, "v_size").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("c").alias("bigram_c_sum"),
        F.count_if(F.col("c") == 1).alias("n_singletons"),
        F.collect_list(F.struct("pos", "c", "ch")).alias("_terms"),
    )
    logprob = F.aggregate(
        F.sort_array("_terms"),
        F.lit(0.0),
        lambda acc, x: acc
        + (
            F.log((x["c"] + 1).cast("double"))
            - F.log((x["ch"] + F.col("v_size")).cast("double"))
        ),
    )
    return per.select(
        id_col,
        "n_tokens",
        "bigram_c_sum",
        "n_singletons",
        logprob.alias("_lp"),
    ).select(
        id_col,
        "n_tokens",
        "bigram_c_sum",
        "n_singletons",
        F.round("_lp", 6).alias("logprob"),
        F.round(
            F.exp(-(F.col("_lp") / F.col("n_tokens").cast("double"))), 6
        ).alias("ppl"),
    )
