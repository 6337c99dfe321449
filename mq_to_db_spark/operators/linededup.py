"""Line-level boilerplate removal — the C4 / RefinedWeb / Gopher
cleaning rule: a LINE that recurs across many documents (navigation
chrome, cookie banners, license footers, signature blocks) is
boilerplate and is stripped from every document that carries it, while
each document's unique prose survives with its original line order.

This is deduplication at a granularity between exact-document
(operators/dedup.py ``dedup_exact``) and fuzzy-document (MinHash): the
unit is the normalized line, the statistic is cross-document recurrence.

Pipeline (three narrow steps; the corpus text never rides a shuffle):

  1. ``line_stats`` — explode to (line_hash, doc) pairs, hash-agg to
     per-line distinct-document counts.  The exchange carries a 64-bit
     hash + id, not the line text.
  2. ``boilerplate_lines`` — lines with ``n_docs ≥ min_docs``.  Its
     size is bounded by construction (boilerplate is, definitionally,
     the small recurring head of the line distribution); ``max_lines``
     guards the collect.
  3. ``strip_boilerplate`` — the boilerplate hash set becomes a literal
     array in a PURE PROJECTION: each row filters its own line array by
     membership and re-joins with ``\\n``.  No second shuffle, no join
     — the same driver-side-bounded-literal shape as
     operators/contamination.py's n-gram set.

Matching is on the NORMALIZED line (lowercase, collapsed whitespace,
stripped punctuation — functions/text.py ``normalize_text``), so
"Cookie Policy." and "cookie policy" strip together, but the ORIGINAL
line text is what's removed/kept — cleaning must not rewrite prose.
Blank/whitespace-only lines are neither counted nor stripped.

Hash discipline: the 60-bit md5 coin (sampling.hash_u60 shape) so a
DuckDB oracle replays membership integer-exactly; collisions (~2⁻⁶⁰)
are the accepted dedup-family risk.

Reference analogue: the reject/dead-letter taxonomy
(internal/repository/messages.go) applied to sub-document content —
the engine drops the noise, keeps an auditable reason (the
boilerplate table itself).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mq_to_db_spark.functions.text import normalize_text
from mq_to_db_spark.operators.sampling import hash_u60

__all__ = ["line_stats", "boilerplate_lines", "strip_boilerplate"]

_SEED = 11


def _norm_line_hash(line: Column) -> Column:
    return hash_u60(normalize_text(line), _SEED)


def _lines(text_col: str) -> Column:
    return F.split(F.col(text_col), "\n")


def _is_blank(line: Column) -> Column:
    return F.trim(line) == F.lit("")


def line_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(line_hash, n_docs, n_total): distinct-document and total
    occurrence counts per normalized line across the corpus."""
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.filter(_lines(text_col), lambda l: ~_is_blank(l))).alias(
            "_line"
        ),
    ).select("_id", _norm_line_hash(F.col("_line")).alias("line_hash"))
    return ex.groupBy("line_hash").agg(
        F.count_distinct("_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_total"),
    )


def boilerplate_lines(
    df: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The audit table: line hashes recurring in ≥ ``min_docs`` distinct
    documents, with their counts."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    return line_stats(df, id_col, text_col).where(
        F.col("n_docs") >= min_docs
    )


def strip_boilerplate(
    df: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "text_clean",
    max_lines: int = 100_000,
) -> DataFrame:
    """Append ``out_col``: the document with its boilerplate lines
    removed (original text and line order preserved; blank lines kept —
    they carry formatting, not content).  Documents reduced to nothing
    keep an empty string, not NULL — the row survives for lineage.

    The boilerplate set is collected driver-side (bounded by
    ``max_lines`` — raises rather than silently ship an unbounded
    literal) and embedded as a literal hash array, so the strip itself
    is a pure projection over the corpus: zero shuffle, zero join.
    """
    bp = boilerplate_lines(df, min_docs, id_col, text_col)
    hashes = [r["line_hash"] for r in bp.select("line_hash").limit(max_lines + 1).collect()]
    if len(hashes) > max_lines:
        raise ValueError(
            f"boilerplate set exceeds max_lines={max_lines}; raise min_docs "
            "or max_lines (an unbounded literal would blow the plan)"
        )
    if not hashes:
        return df.withColumn(out_col, F.col(text_col))
    # isin over a literal list compiles to InSet above
    # spark.sql.optimizer.inSetConversionThreshold — an O(1) hash-set
    # probe per line, not array_contains' linear scan over the set
    member = sorted(hashes)
    kept = F.filter(
        _lines(text_col),
        lambda l: _is_blank(l) | ~_norm_line_hash(l).isin(member),
    )
    return df.withColumn(out_col, F.array_join(kept, "\n"))
