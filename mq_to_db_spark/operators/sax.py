"""SAX — Symbolic Aggregate approXimation words per series window.

Lin, Keogh, Lonardi & Chiu, "A Symbolic Representation of Time Series"
(DMKD 2003): z-normalize a window, average into equal frames (PAA),
quantize each frame against N(0,1) breakpoints into a small alphabet.
The resulting "word" (e.g. ``bbacdd...``) is the classic index key for
motif discovery, whole-series clustering, and anomaly screens — the
symbolic sibling of this engine's numeric tiers, and the natural input
alphabet for :mod:`mq_to_db_spark.operators.cep` pattern matching
(symbolic motifs ARE regexes over SAX words).

The reference stores raw numeric payloads and leaves shape analysis to
downstream SQL (internal/storage/postgresql.go persists opaque rows);
SAX gives the rolled-up tier a shape-indexable form instead.

Here the PAA frame IS the tier bucket (hourly sums/counts in, one
symbol per bucket), so PAA needs no extra pass: the tier's exact
BIGINT ``sum_cents / n`` ratio is the frame mean — a single double
division of two exact integers, deterministic across engines.  Per
(keys, word-window) the values fold IN POSITION ORDER via
``aggregate`` for mean and variance (the lm_perplexity fixed-order
double-chain discipline), so the z-breakpoint comparisons — and hence
every symbol — replay bit-identically in the DuckDB oracle
(``list_reduce`` folds the same chain: its first-element seed equals
the ``0.0 + v1`` seed exactly in IEEE arithmetic).

Scale shape: ONE shuffle beyond the tier (the per-(keys, window)
collect); per-group state is the window's own bucket count (24 for
1h→1d words), never the corpus.  ZERO Python anywhere.

A degenerate window (std = 0) symbolizes as all-'d' under the strict
``<`` breakpoint chain — deterministic and engine-identical, noted so
readers don't expect 'b'/'c' midline symbols there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: N(0,1) quartile breakpoints — alphabet {a,b,c,d} (Lin et al. 2003,
#: Table 3, a=4).  Literal doubles so both engines compare against the
#: same constants.
BREAK = 0.6745


def sax_words(
    tier: DataFrame,
    keys: list[str],
    ts_col: str = "bucket_start",
    sum_col: str = "sum_cents",
    cnt_col: str = "n",
    window: str = "day",
) -> DataFrame:
    """One SAX word per (keys, ``window``) from an exact-integer tier.

    ``tier`` carries per-bucket exact BIGINT ``sum_col``/``cnt_col``;
    the frame value is their double ratio.  Returns
    ``keys..., window_start, sax_word, n_buckets``.
    """
    v = F.col(sum_col) / F.col(cnt_col)  # long/long -> double, exact inputs
    g = tier.groupBy(
        *keys, F.date_trunc(window, F.col(ts_col)).alias("window_start")
    ).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(ts_col).alias("h"), v.alias("v")))
        ).alias("_a")
    )
    vals = F.transform(F.col("_a"), lambda e: e["v"])
    n = F.size(F.col("_a"))
    mean = F.aggregate(vals, F.lit(0.0), lambda a, x: a + x) / n
    g = g.select(*keys, "window_start", vals.alias("_v"), mean.alias("_m"))
    sd = F.sqrt(
        F.aggregate(
            F.col("_v"),
            F.lit(0.0),
            lambda a, x: a + (x - F.col("_m")) * (x - F.col("_m")),
        )
        / F.size(F.col("_v"))
    )
    g = g.withColumn("_sd", sd)
    sym = F.transform(
        F.col("_v"),
        lambda x: F.when(x < F.col("_m") - F.lit(BREAK) * F.col("_sd"), "a")
        .when(x < F.col("_m"), "b")
        .when(x < F.col("_m") + F.lit(BREAK) * F.col("_sd"), "c")
        .otherwise("d"),
    )
    return g.select(
        *keys,
        "window_start",
        F.concat_ws("", sym).alias("sax_word"),
        F.size(F.col("_v")).cast("long").alias("n_buckets"),
    )
