"""Complex-event-processing sequence patterns (MATCH_RECOGNIZE in batch).

The reference consumes one message at a time and applies a per-message
predicate (internal/consumer/consumer.go:9-13 — the consumer interface
delivers single deliveries; internal/messages/sql.go validates each in
isolation).  A CEP pattern generalizes that per-event predicate to a
*temporal* predicate over an ordered per-key event sequence — "a view,
then any number of clicks, then a purchase" — the Flink-CEP /
SQL MATCH_RECOGNIZE surface, here as one batch operator.

Semantics: each event maps to a single-character symbol; per key the
symbols concatenate in event order into one string; the pattern (a
regex over the symbol alphabet) is matched greedy, leftmost,
NON-overlapping — exactly MATCH_RECOGNIZE's ``AFTER MATCH SKIP PAST
LAST ROW`` with greedy quantifiers.  One output row per match carries
the key, the 1-based match ordinal, the matched symbol string, and the
order/timestamp columns of the match's first and last event.

Scale shape: ONE shuffle (the per-key collect), then pure JVM string
expressions — ZERO Python anywhere.  Match *positions* need no UDF:
``regexp_extract_all`` yields the matched substrings and ``split`` on
the same pattern yields the between-match segments (trailing empties
kept), so each match's character offset is a running sum over
``zip_with(gaps, matches)`` folded by ``aggregate`` — both functions
use the same engine, so the reconstruction is exact by construction.
Per-key state is O(events of that key): a conversation's own turn
count, never the corpus — the same bounded-state argument as
sessionize/holt_winters.  The per-key array rides ONE aggregation;
keys are the natural partition unit at 10^12 turns.

Exactness: greedy leftmost non-overlapping matching is deterministic,
and restricting patterns to the RE2-safe subset (no backreferences, no
lookaround) makes Java's and DuckDB's engines agree, so the whole
construction replays in SQL (``regexp_extract_all`` +
``string_split_regex`` + one window running-sum).

Patterns MUST be unable to match the empty string (a ``+``- or
literal-anchored pattern); empty matches would make the gap/match
interleave ambiguous.  Symbols MUST be single characters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def symbolize(
    mapping: dict[str, str],
    col: str | Column,
    default: str = ".",
) -> Column:
    """Map event labels to single-character symbols via one CASE chain.

    ``mapping`` is label -> symbol (each symbol exactly one char);
    unmapped labels get ``default``.  Pure codegen — a when-chain.
    """
    for sym in list(mapping.values()) + [default]:
        if len(sym) != 1:
            raise ValueError(f"symbols must be single characters, got {sym!r}")
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for label, sym in mapping.items():
        expr = (
            F.when(c == label, F.lit(sym))
            if expr is None
            else expr.when(c == label, F.lit(sym))
        )
    return (expr.otherwise(F.lit(default)) if expr is not None else F.lit(default))


def match_pattern(
    df: DataFrame,
    pattern: str,
    keys: list[str],
    sym_col: str = "sym",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Non-overlapping greedy regex matches over per-key symbol sequences.

    ``df`` must carry one single-character symbol per event in
    ``sym_col`` (see :func:`symbolize`) and a total per-key order in
    ``order_col``.  Returns one row per match:
    ``keys..., match_seq, match_syms, n_events, start_<order_col>,
    end_<order_col>, start_ts, end_ts``.

    The pattern must not match the empty string and must stay in the
    RE2-safe subset (no backreferences / lookaround) so the SQL oracle
    replays it on the same semantics.
    """
    # ONE shuffle: per-key event array in order (order_col leads the
    # struct, so sort_array's field-order comparison is the event order;
    # order_col is unique per key, making the sort total).
    evs = F.sort_array(
        F.collect_list(F.struct(F.col(order_col), F.col(ts_col), F.col(sym_col)))
    ).alias("_evs")
    g = df.groupBy(*keys).agg(evs)

    sym = F.concat_ws("", F.transform(F.col("_evs"), lambda e: e[sym_col]))
    g = g.select(
        *keys,
        "_evs",
        F.regexp_extract_all(sym, F.lit(f"({pattern})"), 1).alias("_ms"),
        F.split(sym, pattern, -1).alias("_gs"),
    ).where(F.size("_ms") > 0)

    # 0-based char offset of each match: fold the (gap, match) interleave
    # left-to-right, appending each match's start as it is reached.
    pairs = F.zip_with(
        F.slice(F.col("_gs"), 1, F.size(F.col("_ms"))),
        F.col("_ms"),
        lambda gp, m: F.struct(gp.alias("gap"), m.alias("m")),
    )
    starts = F.aggregate(
        pairs,
        F.struct(
            F.lit(0).alias("off"), F.array().cast("array<int>").alias("st")
        ),
        lambda acc, x: F.struct(
            (acc["off"] + F.length(x["gap"]) + F.length(x["m"])).alias("off"),
            F.array_append(acc["st"], acc["off"] + F.length(x["gap"])).alias(
                "st"
            ),
        ),
        lambda acc: acc["st"],
    )
    g = g.select(
        *keys,
        "_evs",
        F.posexplode(F.arrays_zip(starts.alias("s"), F.col("_ms").alias("m"))),
    )

    start1 = F.col("col.s") + 1  # element_at is 1-based
    end1 = F.col("col.s") + F.length("col.m")
    first = F.element_at(F.col("_evs"), start1)
    last = F.element_at(F.col("_evs"), end1)
    return g.select(
        *keys,
        (F.col("pos") + 1).cast("int").alias("match_seq"),
        F.col("col.m").alias("match_syms"),
        F.length("col.m").cast("long").alias("n_events"),
        first[order_col].alias(f"start_{order_col}"),
        last[order_col].alias(f"end_{order_col}"),
        first[ts_col].alias("start_ts"),
        last[ts_col].alias("end_ts"),
    )
