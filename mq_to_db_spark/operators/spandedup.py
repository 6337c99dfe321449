"""Intra-document repeated-span removal — the within-document half of
Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better": when the SAME ``w``-token window recurs inside one document
(chat-log echo, templated paragraphs, copy-pasted stanzas), every
occurrence after the first is removed span-wise; the first occurrence
and all unique prose survive in original order.

Cross-document near-dup lives in operators/dedup.py (MinHash/SimHash)
and line recurrence in operators/linededup.py; this operator is the
sub-line, token-granular case those cannot express.

Semantics (``dedup_spans``):

  * tokens = whitespace split of ``text_col`` (empties dropped);
  * window start ``i`` is a *duplicate start* iff the hash of tokens
    ``[i, i+w)`` equals an earlier start's hash in the SAME document;
  * a token is removed iff it is covered by any duplicate start's
    span ``[i, i+w)``;
  * output ``text_dedup`` re-joins surviving tokens with single
    spaces, plus exact BIGINT ``n_tokens`` / ``n_removed`` audit
    columns.  Docs shorter than ``w`` tokens pass through untouched.

Execution shape (the hot path stays JVM + Arrow):

  1. gram hashes per start position as pure JVM expressions — the
     ``zip_with`` shift chain (NOT ``transform(sequence, slice)``,
     PROFILE.md §7) joined and hashed by the 60-bit md5 coin, so the
     DuckDB oracle replays every hash integer-exactly;
  2. ONE Arrow-batched ``pandas_udf`` turns each row's hash array into
     a keep mask — pure numpy per row (``np.unique(return_index)``
     finds first occurrences; span coverage is a diff-array cumsum,
     never a Python loop over tokens);
  3. the mask zips back against the token array in JVM expressions —
     no shuffle anywhere: the whole operator is a narrow projection,
     embarrassingly parallel over documents at any corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from mq_to_db_spark.operators.sampling import hash_u60

__all__ = ["dedup_spans"]

_SEED = 13


def _token_grams(t: Column, n: int) -> Column:
    """Space-joined token n-grams via the zip_with shift chain
    (one evaluation of ``t`` per shift — O(n·L), PROFILE.md §7);
    tail partials null-propagate through concat and are filtered."""
    grams = t
    for j in range(1, n):
        shifted = F.slice(t, j + 1, F.greatest(F.size(t) - j, F.lit(1)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(grams, lambda g: g.isNotNull())


def _keep_mask_udf():
    """Arrow UDF: window-start hash array (+ n_tokens, window) → token
    keep mask.  Row-granular numpy (the winnowing-UDF precedent):
    grams per doc are document-bounded, and everything inside a row is
    vectorized — no Python loop over tokens.  Built lazily so importing
    the module never requires an active SparkContext."""

    @pandas_udf("array<boolean>")
    def _keep_mask(hashes: pd.Series, meta: pd.DataFrame) -> pd.Series:
        out = []
        for h, n_tok, w in zip(hashes, meta["n"], meta["w"]):
            n_tok, w = int(n_tok), int(w)
            if h is None or len(h) == 0:
                out.append([True] * n_tok)
                continue
            hs = np.asarray(h, dtype=np.int64)
            # first occurrence index per distinct hash; later starts dup
            _, first_idx, inv = np.unique(
                hs, return_index=True, return_inverse=True
            )
            dup_starts = np.nonzero(np.arange(len(hs)) != first_idx[inv])[0]
            # span coverage as diff-array + cumsum: +1 at i, -1 at i+w
            diff = np.zeros(n_tok + 1, dtype=np.int64)
            np.add.at(diff, dup_starts, 1)
            np.add.at(diff, np.minimum(dup_starts + w, n_tok), -1)
            covered = np.cumsum(diff[:-1]) > 0
            out.append((~covered).tolist())
        return pd.Series(out)

    return _keep_mask


def dedup_spans(
    df: DataFrame,
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "text_dedup",
) -> DataFrame:
    """Append ``out_col`` (+ ``n_tokens``, ``n_removed``) with repeated
    ``window``-token spans removed (first occurrence kept)."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
    )
    staged = df.withColumn("_toks", toks).withColumn(
        "_gh",
        F.transform(
            _token_grams(F.col("_toks"), window),
            lambda g: hash_u60(g, _SEED),
        ),
    )
    masked = staged.withColumn(
        "_keep",
        _keep_mask_udf()(
            F.col("_gh"),
            F.struct(
                F.size("_toks").alias("n"), F.lit(window).alias("w")
            ),
        ),
    )
    surviving = F.filter(
        F.zip_with(
            F.col("_toks"), F.col("_keep"), lambda t, k: F.when(k, t)
        ),
        lambda t: t.isNotNull(),
    )
    return (
        masked.withColumn(out_col, F.array_join(surviving, " "))
        .withColumn("n_tokens", F.size("_toks").cast("long"))
        .withColumn(
            "n_removed",
            (F.size("_toks") - F.size(surviving)).cast("long"),
        )
        .drop("_toks", "_gh", "_keep")
    )
