"""Corpus-statistics relevance ranking (BM25) over document tables.

A training-data pipeline at 100 TB keeps a lexical retrieval path next
to its embedding ANN (operators/similarity.py): BM25 needs no model,
catches exact-term matches embeddings blur, and is the standard first
stage of retrieval cascades (Robertson & Zaragoza 2009, "The
Probabilistic Relevance Framework: BM25 and Beyond").  This module
scores a LITERAL query against the corpus — the common shape for
eval-set retrieval, nearest-duplicate triage, and "find the documents
about X" curation passes.

Semantics (Lucene-variant BM25):
  * tokens = lowercased text split on ``[^a-z0-9]+``, empties dropped
    (the same tokenizer as functions/text.py's whitespace family, made
    engine-replayable);
  * ``dl`` = token count; ``avgdl`` = corpus mean dl;
  * per query term t: ``tf`` = occurrences of t in the doc,
    ``df`` = docs containing t,
    ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` (non-negative);
  * ``score = Σ_t idf_t * tf_t*(k1+1) / (tf_t + k1*(1 - b + b*dl/avgdl))``
    summed IN QUERY-TERM ORDER (a fixed chain of double additions, so
    the result is bit-identical across engines — a float ``sum()``
    over an unordered group would not be);
  * ``bm25_topk``: top-k by (score DESC, id ASC), zero-score docs
    dropped (no query term present).

Scale design: the corpus NEVER shuffles.  Query terms are literals, so
per-term tf is an array expression over the tokenized text (narrow,
whole-stage codegen); corpus stats (N, Σdl, per-term df) are ONE
single-row aggregate broadcast back via a cross join; top-k compiles
to TakeOrderedAndProject (per-partition heaps + driver merge — no
full-corpus sort, no exchange).  Cost is one scan of (id, text).

Reference analogue: none in mq-to-db (it delegates all relational
reads to PostgreSQL); this is part of the training-data plane the
engine adds (SURVEY.md §2, LLM-data operators).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the shared tokenizer pattern — keep in lockstep with the oracle
TOKEN_SPLIT = "[^a-z0-9]+"


def tokens_col(text_col: str = "text") -> Column:
    """Lowercase tokens of ``text_col``, empties removed."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda t: t != ""
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-doc BM25 score of a literal query: (id, dl, tf_*, score)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct (BM25 tf is per-term)")
    def _tf(term: str) -> Column:
        # single-arg lambda on purpose: a two-parameter callable (even
        # via default args) would be bound as (element, index)
        return F.size(F.filter(F.col("_toks"), lambda x: x == F.lit(term)))

    toks = docs.select(
        F.col(id_col),
        tokens_col(text_col).alias("_toks"),
    ).select(
        id_col,
        F.size("_toks").alias("dl"),
        *[_tf(t).alias(f"tf_{i}") for i, t in enumerate(query_terms)],
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.count_if(F.col(f"tf_{i}") > 0).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    # single-row corpus stats ride a broadcast nested loop, never a shuffle
    scored = toks.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
    score = None
    for i in range(len(query_terms)):
        tf = F.col(f"tf_{i}").cast("double")
        df_t = F.col(f"df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - df_t + F.lit(0.5)) / (df_t + F.lit(0.5))
        )
        term = idf * tf * F.lit(k1 + 1.0) / (tf + norm)
        score = term if score is None else score + term  # fixed-order chain
    return scored.select(
        id_col,
        "dl",
        *[F.col(f"tf_{i}") for i in range(len(query_terms))],
        score.alias("_score_raw"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k corpus docs for a literal query, deterministic ties by id."""
    scored = bm25_scores(
        docs, query_terms, id_col=id_col, text_col=text_col, k1=k1, b=b
    )
    return (
        scored.where(F.col("_score_raw") > 0)
        .orderBy(F.col("_score_raw").desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            "dl",
            *[F.col(f"tf_{i}") for i in range(len(query_terms))],
            F.round("_score_raw", 6).alias("score"),
        )
    )


def idf_table(n_docs: int, dfs: dict[str, int]) -> dict[str, float]:
    """Driver-side IDF helper for tests/notebooks (same formula)."""
    return {
        t: math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for t, df in dfs.items()
    }


# --------------------------------------------------------------------------
# Zipf rank-frequency fit — corpus-governance audit
# --------------------------------------------------------------------------


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Zipf's-law fit over the corpus token rank–frequency curve — the
    classic corpus-health audit: natural language sits near slope −1 on
    the log-log rank/frequency plot; boilerplate-heavy or synthetic
    corpora bend away from it (too flat = template spam, too steep =
    tiny effective vocabulary).  Reported alongside the per-document
    lexical_stats richness figures (this module / tests) as the
    corpus-LEVEL counterpart.

    Least squares of ``ln(freq)`` on ``ln(rank)`` over the ``top_n``
    most frequent tokens, ranked by ``(freq DESC, token ASC)`` so the
    ranking is a total order.  ONE row out:
    ``(vocab_size, total_tokens, n_fit, top_token, top_freq,
    zipf_slope, intercept, r2)``.

    Determinism: the five regression sums fold over the rank-sorted
    top-N array in ONE fixed-order ``aggregate`` (left-to-right double
    chain — the BM25/lm.py discipline), never an unordered SUM, so a
    SQL replay folding the same order agrees bit-for-bit.

    Scale design: token counts are ONE hash agg with map-side combine
    (the shuffle carries (token, partial) rows); vocab/total come from
    a second agg over that already-tiny table; the top-N is a
    ``TakeOrderedAndProject`` (per-partition heap + driver merge of
    top_n structs, never a global sort); the fold runs over a bounded
    top_n-element array on one row.
    """
    counts = (
        docs.select(F.explode(tokens_col(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    totals = counts.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("freq").alias("total_tokens"),
    )
    top = (
        counts.orderBy(F.col("freq").desc(), F.col("tok"))
        .limit(top_n)
        .agg(
            F.sort_array(
                F.collect_list(F.struct((-F.col("freq")).alias("nf"), "tok"))
            ).alias("_top")
        )
    )
    # fold state: (i, sx, sy, sxx, sxy, syy) — rank i is the position in
    # the sorted array, x = ln(i), y = ln(freq)
    zero = F.struct(
        F.lit(0).cast("long").alias("i"),
        *[F.lit(0.0).alias(c) for c in ("sx", "sy", "sxx", "sxy", "syy")],
    )

    def _step(acc, e):
        i = acc["i"] + 1
        x = F.log(i.cast("double"))
        y = F.log((-e["nf"]).cast("double"))
        return F.struct(
            i.alias("i"),
            (acc["sx"] + x).alias("sx"),
            (acc["sy"] + y).alias("sy"),
            (acc["sxx"] + x * x).alias("sxx"),
            (acc["sxy"] + x * y).alias("sxy"),
            (acc["syy"] + y * y).alias("syy"),
        )

    fitted = top.select(
        F.aggregate("_top", zero, _step).alias("_s"),
        F.element_at("_top", 1).alias("_t1"),
    )
    s = F.col("_s")
    n = s["i"].cast("double")
    cov = n * s["sxy"] - s["sx"] * s["sy"]
    varx = n * s["sxx"] - s["sx"] * s["sx"]
    vary = n * s["syy"] - s["sy"] * s["sy"]
    slope = cov / varx
    return fitted.crossJoin(F.broadcast(totals)).select(
        "vocab_size",
        "total_tokens",
        s["i"].alias("n_fit"),
        F.col("_t1")["tok"].alias("top_token"),
        (-F.col("_t1")["nf"]).cast("long").alias("top_freq"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((s["sy"] - slope * s["sx"]) / n, 6).alias("intercept"),
        F.round(cov * cov / (varx * vary), 6).alias("r2"),
    )


def top_vocab(docs: DataFrame, text_col: str = "text", top_v: int = 1000) -> list[str]:
    """The corpus' ``top_v`` most frequent tokens, ranked by
    ``(freq DESC, token ASC)`` — a DRIVER-SIDE list (bounded by the
    config-sized ``top_v``, the documented bounded-metadata collect
    class: same budget as IVF centroids / gap-fill spines)."""
    counts = (
        docs.select(F.explode(tokens_col(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    rows = counts.orderBy(F.col("freq").desc(), F.col("tok")).limit(top_v).collect()
    return [r.tok for r in rows]


def oov_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_v: int = 1000,
) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus top-V
    vocabulary — the cheap lexical-drift / gibberish screen (documents
    whose tokens mostly fall outside the corpus head are boilerplate,
    code, another language, or noise; CCNet and its descendants gate on
    exactly this before the LM-perplexity pass, operators/lm.py).

    Output: ``(id, n_tokens, n_oov, oov_rate)`` — two exact BIGINTs and
    one division; ``oov_rate`` NULL for token-less docs.

    Scale design: the vocabulary is ONE map-side-combined count agg +
    a TakeOrderedAndProject (per-partition heap, never a global sort),
    collected driver-side at the config-sized ``top_v`` bound; the scan
    pass is then a ZERO-shuffle projection — membership is
    ``array_contains`` against the broadcast literal array, no
    explode-and-join of the token stream."""
    vocab = top_vocab(docs, text_col=text_col, top_v=top_v)
    vocab_arr = F.array(*[F.lit(t) for t in vocab])
    toks = tokens_col(text_col)
    n_tokens = F.size(toks).cast("long")
    n_oov = F.size(
        F.filter(toks, lambda t: ~F.array_contains(vocab_arr, t))
    ).cast("long")
    return docs.select(
        id_col,
        n_tokens.alias("n_tokens"),
        n_oov.alias("n_oov"),
        F.when(
            n_tokens > 0,
            F.round(n_oov.cast("double") / n_tokens.cast("double"), 6),
        ).alias("oov_rate"),
    )


def heaps_curve(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps'-law vocabulary-growth curve — the corpus-health companion
    of :func:`zipf_fit`: cumulative distinct-vocabulary size vs
    cumulative token count, sampled at every document in ``id_col``
    order.  Natural corpora grow V(n) ≈ K·n^β with β ≈ 0.4-0.6; a
    curve that flattens early signals template spam / duplication, one
    that stays near-linear signals noise (every doc brings new junk
    tokens).

    Output per document: ``(id, n_tokens, cum_tokens, new_types,
    cum_types)`` — all exact BIGINTs.

    Scale design: per-token work collapses to ONE (token → min doc)
    hash agg (map-side combined — the shuffle carries one row per
    distinct token per map task, not per occurrence); both running
    sums ride a single window over the DOC table (one row per doc),
    partitioned... keyless, but over |docs| rows of three BIGINTs —
    range-partition via rangewin if the doc table itself is huge."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("tok")
    )
    per_doc = docs.select(
        F.col(id_col), F.size(tokens_col(text_col)).cast("long").alias("n_tokens")
    )
    first_seen = (
        toks.groupBy("tok")
        .agg(F.min(id_col).alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    from mq_to_db_spark.operators.rangewin import range_running_sums

    joined = per_doc.join(first_seen, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("new_types", F.lit(0)).cast("long").alias("new_types"),
    )
    cum2 = range_running_sums(
        joined, id_col, {"cum_tokens": "n_tokens", "cum_types": "new_types"}
    )
    return cum2.select(
        id_col,
        "n_tokens",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        "new_types",
        F.col("cum_types").cast("long").alias("cum_types"),
    )
