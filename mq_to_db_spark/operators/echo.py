"""Cross-turn repetition ("turn echo") over conversation transcripts.

An LLM-corpus quality signal the per-document features in
functions/text.py cannot see: a model (or a copy-pasting user) that
REPEATS its previous same-role turn.  Looping assistants produce
near-identical consecutive responses; transcripts with high cross-turn
echo are low-value training data (the within-turn analogue is Gopher's
repetition_features, functions/text.py:140; the corpus-level analogue
is the dedup plane).  Deployed pipelines measure this exactly as
n-gram overlap between adjacent turns — the same distinct-bigram
Jaccard/containment pair as the document-level `ngram_jaccard_pairs`
(operators/dedup.py:368), evaluated along the conversation axis
instead of across documents.

Semantics: for every turn that has a PREVIOUS turn of the same role in
its conversation (by ``turn_idx`` order), compare the DISTINCT word
bigram sets of the two texts (single-token/empty texts have 0 bigrams;
the unigram fallback is deliberately not taken — a one-word turn echoes
nothing):

    jaccard     = |A ∩ B| / |A ∪ B|        (0 when both empty)
    containment = |A ∩ B| / |A|            (how much of THIS turn is old)

Scale design:
  * tokenize + bigram build are pure array expressions (zip_with chain,
    NOT transform(sequence…) — see functions/text.py:207 for the
    measured O(len²) trap), whole-stage codegen;
  * ONE window shuffle on (conv, role) ordered by turn_idx carries the
    lag — the bigram arrays ride the shuffle once; no self-join (a
    turn-vs-previous-turn equi-join would shuffle the texts twice and
    re-sort);
  * set sizes are exact BIGINTs (array_distinct / array_intersect /
    array_union), so the contract surface is integer-exact plus two
    one-division doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from mq_to_db_spark.operators.ranking import tokens_col


def bigrams_col(text_col: str = "text", sep: str = " ") -> Column:
    """DISTINCT word bigrams of the tokenized text, as ``a b`` strings
    (sorted, so downstream set ops are order-stable)."""
    toks = tokens_col(text_col)
    tail = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(1)))
    grams = F.zip_with(
        toks, tail, lambda a, b: F.concat_ws(sep, a, b)
    )
    # zip_with pads the shorter side with NULL; concat_ws skips nulls,
    # leaving the bare last token — cut the tail position explicitly
    grams = F.when(
        F.size(toks) >= 2,
        F.slice(grams, 1, F.size(toks) - 1),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_sort(F.array_distinct(grams))


def turn_echo(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Per turn with a same-role predecessor: distinct-bigram overlap
    with that predecessor.  Output: ``(conv_id, turn_idx, role,
    n_grams, n_prev_grams, n_common, n_union, jaccard, containment)``.
    """
    w = W.partitionBy(conv_col, role_col).orderBy(order_col)
    grams = df.select(
        conv_col, order_col, role_col, bigrams_col(text_col).alias("_g")
    )
    paired = grams.withColumn("_pg", F.lag("_g").over(w)).where(
        F.col("_pg").isNotNull()
    )
    n = F.size("_g").cast("long")
    np_ = F.size("_pg").cast("long")
    nc = F.size(F.array_intersect("_g", "_pg")).cast("long")
    nu = F.size(F.array_union("_g", "_pg")).cast("long")
    return paired.select(
        conv_col,
        order_col,
        role_col,
        n.alias("n_grams"),
        np_.alias("n_prev_grams"),
        nc.alias("n_common"),
        nu.alias("n_union"),
        F.when(nu > 0, F.round(nc.cast("double") / nu.cast("double"), 6))
        .otherwise(F.lit(0.0))
        .alias("jaccard"),
        F.when(n > 0, F.round(nc.cast("double") / n.cast("double"), 6))
        .otherwise(F.lit(0.0))
        .alias("containment"),
    )
