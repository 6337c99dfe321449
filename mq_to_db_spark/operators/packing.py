"""Sequence packing: next-fit token-budget bin assignment.

LLM pre-training concatenates documents into fixed-length context
windows ("packing"); the batch-side question is *which documents share
a window*.  Packing is inherently sequential — bin state resets when
the running token sum crosses the budget, which no closed-form window
expression computes — so the parallel unit must be an explicitly
bounded shard, not the whole corpus:

  * each document is hashed (the sampling plane's 60-bit coin,
    :func:`~mq_to_db_spark.operators.sampling.hash_u60`) into one of
    ``n_shards`` shards — deterministic, partition-independent;
  * within a shard documents are ordered by id and packed next-fit
    (greedy: append to the open bin unless it would overflow, then
    open a new bin; a document alone larger than the budget gets its
    own oversized bin, flagged downstream by ``doc_tokens > budget``);
  * shards pack in parallel via ``applyInPandas`` — one shuffle on the
    shard key, a numpy pass per shard.

At 100 TB, ``n_shards`` is the scale dial: pick shards ≈ several ×
cluster cores so each shard's (id, tokens) pairs — 16 bytes/doc, not
the text — fit comfortably in an executor; packing quality is
unaffected because windows never span shards by construction.  The
text itself is re-joined by id *after* assignment, so the sequential
stage moves only 8-byte ids and token counts.

Deterministic end-to-end ⇒ exact ANSI-SQL replay: the driver contract
reproduces the assignment in DuckDB with a recursive CTE that walks
each shard in id order carrying (fill, bin).

Reference parity: no counterpart in christiangda/mq-to-db (delivery
batches are transport framing, not token windows); part of the
engine's training-data plane.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mq_to_db_spark.operators.sampling import hash_u60

PACK_SCHEMA = (
    "id long, shard int, bin long, pos_in_bin int, doc_tokens long, bin_tokens long"
)


def next_fit_assign(tokens, budget: int) -> tuple[list[int], list[int]]:
    """Pure next-fit core: token counts (in final order) → parallel
    lists ``(bin, pos_in_bin)``.  Greedy: append to the open bin unless
    it would overflow, then open a new one; a document alone larger
    than the budget gets its own oversized bin.  Separated out so the
    sequential invariants are property-testable without a Spark job."""
    n = len(tokens)
    bins = [0] * n
    pos = [0] * n
    fill = 0
    b = -1
    p = 0
    for i in range(n):
        t = int(tokens[i])
        if b < 0 or fill + t > budget:
            b += 1
            fill = 0
            p = 0
        bins[i] = b
        pos[i] = p
        fill += t
        p += 1
    return bins, pos


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_shards: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Assign every document a ``(shard, bin)`` packing slot.

    Returns ``(id, shard, bin, pos_in_bin, doc_tokens, bin_tokens)``
    where ``bin`` is the 0-based next-fit bin within the shard (id
    order), ``pos_in_bin`` the document's 0-based position inside its
    bin, and ``bin_tokens`` the bin's total fill (every row of a bin
    carries the same value — the join-free way to filter under-full or
    oversized windows downstream).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")

    slim = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.pmod(hash_u60(id_col, seed), F.lit(n_shards)).cast("int").alias("shard"),
        F.coalesce(F.col(tokens_col).cast("long"), F.lit(0)).alias("doc_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        bins, pos = next_fit_assign(pdf["doc_tokens"].to_numpy(), budget)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        pdf["pos_in_bin"] = pd.Series(pos, dtype="int32")
        pdf["bin_tokens"] = pdf.groupby("bin")["doc_tokens"].transform("sum")
        return pdf[["id", "shard", "bin", "pos_in_bin", "doc_tokens", "bin_tokens"]]

    return (
        slim.groupBy("shard")
        .applyInPandas(_pack, schema=PACK_SCHEMA)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    seed: int = 42,
) -> None:
    """Deterministic sharded export — the training pipeline's last mile.

    Rows land in ``path/shard=K/`` with ``K = hash(id) % n_shards`` and
    are laid out *within* each shard in ascending hash order: a
    content-addressed global shuffle, so the training order is fully
    randomized w.r.t. any data attribute yet byte-reproducible across
    re-runs and clusters (unlike ``df.orderBy(rand())``).  Each shard
    value hashes to exactly one task under ``repartition(n_shards,
    shard)``, so every shard directory is written by a single task as
    one contiguous sorted run — no cross-file order ambiguity.

    At 100 TB pick ``n_shards`` for the target file size (total bytes /
    ~512 MB); the exchange moves each row once, and the per-task sort
    spills via Spark's external sorter if a shard exceeds memory.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = hash_u60(id_col, seed)
    out = (
        df.withColumn("shard", F.pmod(h, F.lit(n_shards)).cast("int"))
        .withColumn("_ord", h)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_ord")
        .drop("_ord")
    )
    out.write.partitionBy("shard").mode("overwrite").parquet(path)


def chunk_spans(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    window: int,
    stride: int | None = None,
) -> DataFrame:
    """Sliding context-window spans per document: one output row per
    chunk with ``(id, chunk_idx, start, end, chunk_len)``, where chunks
    start every ``stride`` tokens (default: ``window``, i.e. disjoint)
    and the last chunk clamps to the document end.

    The other half of the packing story: packing concatenates *short*
    docs into one window; chunking slices *long* docs across windows
    (overlapping when ``stride < window`` so no span of ``window -
    stride`` tokens is ever split across chunk boundaries unseen).

    Pure narrow op: ``sequence(0, n-1, stride)`` + ``explode`` — the
    span arithmetic is whole-stage codegen, there is no shuffle, and
    the expansion factor is bounded by ``ceil(n_tokens / stride)``.
    Zero-token docs produce no chunks.
    """
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    stride = window if stride is None else stride
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    n = F.col(n_tokens_col).cast("long")
    starts = F.sequence(F.lit(0).cast("long"), n - 1, F.lit(stride).cast("long"))
    out = (
        df.filter(n > 0)
        .select(
            F.col(id_col),
            F.posexplode(starts).alias("chunk_idx", "start"),
            n.alias("_n"),
        )
        .withColumn("end", F.least(F.col("start") + window, F.col("_n")))
        .withColumn("chunk_len", F.col("end") - F.col("start"))
        .drop("_n")
    )
    return out
