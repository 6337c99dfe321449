"""RollupPipeline — the engine's end-to-end job (SURVEY.md §3 EP2 analogue).

One batch run =
    read input → validate/side-output rejects → per-unit rollup cascade
    (1m→1h→1d; global / per-conv / per-tool dimensions) → partition-
    overwrite commit of every tier table → dead-letter append → lineage
    append → checkpoint markers.

Delivery semantics (the reference's ack/reject loop re-expressed, SURVEY.md
§1.3): the unit of work is a logical partition ``(conv_bucket, date)`` —
``conv_bucket = pmod(xxhash64(conv_id), B)`` is the Iceberg
``bucket(conv_id)`` analogue, ``date`` the ``days(ts)`` range partition.
A unit's checkpoint marker is written only **after** all tier commits for
the batch succeed (ack-after-durable-store, messages.go:131-148).  A rerun
after a crash reprocesses exactly the unmarked units; because tier writes
are partition overwrites keyed by the same unit, replays are idempotent —
at-least-once reprocessing + idempotent sink = effectively-once, the same
contract the reference gets from manual ack + DLX.

Scale notes (10^12 turns):
  * every tier table is *partitioned by (date, conv_bucket)* and stores
    **partials within the unit**; dimensions whose grain crosses units
    (global, per-tool) are finalized by a cheap re-aggregation at read
    time over tier-sized (not raw-sized) data — the classic partial/final
    split, so raw data is scanned exactly once per batch;
  * the rollup shuffle is preceded by an explicit repartition on
    (conv_bucket, date) so all dimensions of a unit aggregate from a
    co-located partition, and AQE handles residual skew;
  * filters on committed units are pushed into the scan
    (conv_bucket/date derive from input columns via deterministic
    expressions, so Catalyst prunes at the parquet level when the input
    is physically partitioned the same way).
"""

from __future__ import annotations

import datetime as dt
import json
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mq_to_db_spark.config import EngineConfig
from mq_to_db_spark.operators.gapfill import gapfill
from mq_to_db_spark.operators.rollup import AGG_COL_NAMES, _merge_aggs, with_text_stats
from mq_to_db_spark.operators.validate import with_reject_reason
from mq_to_db_spark.sources.store import LocalAtomicStore
from mq_to_db_spark.sources.tableio import TableIO

#: rollup dimensions materialized by the pipeline: name → series key cols
DIMENSIONS: dict[str, list[str]] = {
    "global": [],
    "conv": ["conv_id"],
    "tool": ["tool"],
}

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType()),
        T.StructField("partition_id", T.StringType()),
        T.StructField("conv_bucket", T.IntegerType()),
        T.StructField("date", T.DateType()),
        T.StructField("status", T.StringType()),
        T.StructField("n_in", T.LongType()),
        T.StructField("n_ok", T.LongType()),
        T.StructField("n_rejected", T.LongType()),
        T.StructField("committed_at", T.TimestampType()),
    ]
)


METRICS_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType()),
        T.StructField("n_units_total", T.LongType()),
        T.StructField("n_units_skipped", T.LongType()),
        T.StructField("n_in", T.LongType()),
        T.StructField("n_ok", T.LongType()),
        T.StructField("n_rejected", T.LongType()),
        T.StructField("points_written", T.MapType(T.StringType(), T.LongType())),
        T.StructField("seconds", T.DoubleType()),
        T.StructField("engine_version", T.StringType()),
        T.StructField("committed_at", T.TimestampType()),
    ]
)


@dataclass
class BatchReport:
    """Per-batch metrics — the analogue of the reference's Prometheus
    counter families (messages_total / ack / rejected,
    internal/metrics/metrics.go:136-183) plus wall-clock."""

    batch_id: str
    n_units_total: int = 0
    n_units_skipped: int = 0
    n_in: int = 0
    n_ok: int = 0
    n_rejected: int = 0
    points_written: dict = field(default_factory=dict)
    seconds: float = 0.0

    def to_json(self) -> str:
        return json.dumps(self.__dict__, default=str)


def unit_cols(df: DataFrame, conv_buckets: int) -> DataFrame:
    return df.withColumn(
        "conv_bucket",
        F.pmod(F.xxhash64("conv_id"), F.lit(conv_buckets)).cast("int"),
    ).withColumn("date", F.to_date("ts"))


class RollupPipeline:
    def __init__(
        self,
        work_dir: str,
        cfg: EngineConfig | None = None,
        table_factory=None,
        marker_store=None,
    ):
        """``table_factory(name, partition_cols) -> TableIO-like`` selects
        the storage backend: default is the parquet-emulated
        ``sources.tableio.TableIO``; pass a closure over
        ``sources.iceberg.IcebergTableIO`` (jar-gated) for a real Iceberg
        catalog.  ``marker_store`` is the AtomicStore holding checkpoint
        markers (default: local under ``work_dir/_checkpoints``) — the
        S3/HDFS plug point.  The pipeline touches storage ONLY through
        these two seams."""
        self.work_dir = work_dir
        self.cfg = cfg or EngineConfig()
        self.markers = marker_store or LocalAtomicStore(f"{work_dir}/_checkpoints")
        if table_factory is None:
            table_factory = lambda name, part=None: TableIO(  # noqa: E731
                f"{work_dir}/{name}", part
            )
        part = ["date", "conv_bucket"]
        self.tables: dict[str, TableIO] = {}
        for dim in DIMENSIONS:
            for tier in self.cfg.tiers:
                name = f"rollup_{dim}_{tier}"
                self.tables[name] = table_factory(name, part)
        self.dead_letter = table_factory("dead_letter", None)
        self.lineage = table_factory("lineage", None)
        self.metrics = table_factory("job_metrics", None)

    # -- checkpoint markers ---------------------------------------------------
    #
    # Two marker scopes:
    #   * global (batch/overwrite mode): a unit is acked once, forever —
    #     a redelivered batch skips it (units arrive whole per batch);
    #   * batch-scoped (streaming/append mode): the ack is per
    #     (micro-batch, unit) — a *recovery replay* of the same micro-batch
    #     skips, while a LATER micro-batch carrying more turns for the same
    #     unit appends fresh partials (read-side merge makes that exact).

    def _marker_key(self, conv_bucket: int, date: str, scope: str | None = None) -> str:
        prefix = f"{scope}__" if scope else ""
        return f"{prefix}{date}_b{conv_bucket:04d}.json"

    def committed_units(self, scope: str | None = None) -> set[tuple[int, str]]:
        out = set()
        for key in self.markers.list():
            if not key.endswith(".json"):
                continue
            stem = key[:-5]
            if scope is None:
                if "__" in stem:
                    continue  # batch-scoped markers belong to append mode
            else:
                if not stem.startswith(f"{scope}__"):
                    continue
                stem = stem.split("__", 1)[1]
            date, b = stem.rsplit("_b", 1)
            out.add((int(b), date))
        return out

    def _write_marker(
        self,
        conv_bucket: int,
        date: str,
        batch_id: str,
        stats: dict,
        scope: str | None = None,
    ):
        self.markers.write_text_atomic(
            self._marker_key(conv_bucket, date, scope),
            json.dumps({"batch_id": batch_id, "committed_at": time.time(), **stats}),
        )

    # -- per-operation bound ---------------------------------------------------

    def _commit(self, spark: SparkSession, fn, what: str):
        """Run one sink commit under the configured wall-clock bound
        (``cfg.max_query_timeout_sec`` — the reference's `maxQueryTimeOut`
        around every ExecContext, pgsql.go:86-96).  Unbounded when None
        (the default).  On deadline the commit's job group is cancelled
        and QueryTimeoutError propagates out of ``run`` BEFORE any ack
        marker is written, so redelivery replays the batch — the same
        at-least-once story as a reference statement timeout."""
        if self.cfg.max_query_timeout_sec is None:
            return fn()
        from .bounds import bounded_action

        return bounded_action(
            spark, fn, self.cfg.max_query_timeout_sec, description=what
        )

    # -- the batch job --------------------------------------------------------

    def run(
        self,
        spark: SparkSession,
        input_df: DataFrame,
        batch_id: str | None = None,
        fail_after_commit_of: str | None = None,
        mode: str = "overwrite",
    ) -> BatchReport:
        """Process one delivery batch.  ``fail_after_commit_of`` is a test
        hook: raise after committing the named tier table (simulates the
        crash-between-commit-and-ack window the resume test needs).

        ``mode="overwrite"`` (batch): units arrive whole; tier writes are
        partition overwrites, acks are global per unit.
        ``mode="append"`` (streaming micro-batches): a unit's turns may
        span batches, so tier writes APPEND per-batch partials (read-side
        merge keeps results exact) and acks are scoped to this batch_id —
        a recovery replay of the same micro-batch is a no-op EVEN when
        the crash landed between tier commits and the markers: every
        append consults the table's snapshot batch ledger
        (``TableIO.has_batch``) and skips tables this batch already
        reached, so no partial can be double-appended.  Later batches
        for the same unit (new batch_id) append normally."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"unknown mode {mode!r}")
        t0 = time.time()
        batch_id = batch_id or uuid.uuid4().hex[:12]
        scope = batch_id if mode == "append" else None
        cfg = self.cfg
        report = BatchReport(batch_id=batch_id)

        tagged = unit_cols(with_reject_reason(input_df), cfg.conv_buckets)

        # -- which units does this batch carry, and which are already done?
        units_df = tagged.groupBy("conv_bucket", "date").agg(
            F.count(F.lit(1)).alias("n_in"),
            F.count_if(F.col("reason").isNotNull()).alias("n_rejected"),
        )
        unit_rows = units_df.collect()
        units = {
            (r.conv_bucket, str(r.date)): (r.n_in, r.n_rejected)
            for r in unit_rows
            if r.conv_bucket is not None and r.date is not None
        }
        # rows whose unit cols are null (invalid rows) still go to the
        # dead letter; they belong to a synthetic unit (always rejected:
        # a null unit col implies a null conv_id or ts reject reason).
        n_unitless = sum(
            int(r.n_in)
            for r in unit_rows
            if r.conv_bucket is None or r.date is None
        )
        committed = self.committed_units(scope)
        todo = {u for u in units if u not in committed}
        report.n_units_total = len(units)
        report.n_units_skipped = len(units) - len(todo)

        if not todo:
            # all units already committed: a fully-skipped redelivery.
            # No data or lineage is written (nothing changed), and no
            # metrics row either — mirroring the reference, where a
            # redelivered-and-deduped message increments no storer
            # counters.  The returned report still records the skip.
            report.seconds = time.time() - t0
            return report

        todo_df = spark.createDataFrame(
            [(b, d) for b, d in sorted(todo)], schema="conv_bucket int, date string"
        ).withColumn("date", F.to_date("date"))
        # broadcast semi-join prunes committed units before any shuffle
        pending = tagged.join(F.broadcast(todo_df), ["conv_bucket", "date"], "left_semi")

        # Rows whose unit cols are null (null conv_id / null ts) never match
        # the semi-join; they belong to no unit but must still reach the
        # dead letter (at-least-once DLX — reruns may re-append them, as
        # broker redelivery would).
        unitless = tagged.filter(F.col("conv_bucket").isNull() | F.col("date").isNull())
        rejected = pending.filter(F.col("reason").isNotNull()).unionByName(unitless)
        valid = pending.filter(F.col("reason").isNull()).drop("reason")

        # Single-pass rollup: raw is scanned ONCE for every dimension
        # (grouping-sets agg, rollup_multidim) — one shuffle of partial
        # aggregates keyed by the full group, so hot (bucket, date) units
        # are already defused by map-side partial aggregation.  Each tier
        # is persisted (tier-sized, ≪ raw) and the next tier cascades from
        # it; dimension tables are cheap filters over the persisted frame.
        from mq_to_db_spark.operators.rollup import rollup_multidim

        all_keys = [k for keys in DIMENSIONS.values() for k in keys]
        tier_frames = rollup_multidim(
            with_text_stats(valid),
            DIMENSIONS,
            tiers=tuple(cfg.tiers),
            extra_group_cols=["conv_bucket", "date"],
        )

        points = {}
        persisted = []
        try:
            for tier in cfg.tiers:
                cur = tier_frames[tier].persist()
                persisted.append(cur)
                for dim, keys in DIMENSIONS.items():
                    sliced = cur.filter(F.col("dim") == dim)
                    if dim == "tool":
                        # the tool dimension tracks tool *usage*: non-tool
                        # turns (tool IS NULL) are not a series
                        sliced = sliced.filter(F.col("tool").isNotNull())
                    drop = ["dim", *[k for k in all_keys if k not in keys]]
                    out_df = sliced.drop(*dict.fromkeys(drop))
                    name = f"rollup_{dim}_{tier}"
                    if mode == "append":
                        # idempotent per (table, batch): a crash-window
                        # replay of this batch_id must not re-append a
                        # tier's partials (the read-side sum would
                        # double-count) — skip tables whose snapshot
                        # ledger already carries this batch_id.
                        if self.tables[name].has_batch(batch_id):
                            points[name] = 0
                            continue
                        snap = self._commit(
                            spark,
                            lambda d=out_df, n=name: self.tables[n].append(
                                d, summary={"batch_id": batch_id}
                            ),
                            f"append:{name}",
                        )
                    else:
                        snap = self._commit(
                            spark,
                            lambda d=out_df, n=name: self.tables[n].overwrite_partitions(
                                d, summary={"batch_id": batch_id}
                            ),
                            f"overwrite:{name}",
                        )
                    points[name] = len(snap.added_files)  # files committed
                    if fail_after_commit_of == name:
                        raise RuntimeError(f"injected failure after commit of {name}")
        finally:
            for p in persisted:
                p.unpersist()

        # dead letter (append — replays may duplicate rejects for units that
        # never reached the marker; dedup at read on (conv_id, turn_idx,
        # reason, batch) is the consumer's job, mirroring at-least-once DLX).
        # The reject count is derived from the already-collected unit stats
        # — a `rejected.count()` here would cost an extra full scan of the
        # tagged input on top of the append's own (2 extra raw scans/batch
        # at 10^12 turns).
        n_rej = sum(units[u][1] for u in todo) + n_unitless
        if n_rej and not self.dead_letter.has_batch(batch_id):
            self._commit(
                spark,
                lambda: self.dead_letter.append(
                    rejected.withColumn("batch_id", F.lit(batch_id)),
                    summary={"batch_id": batch_id},
                ),
                "append:dead_letter",
            )

        # lineage + markers — ack happens only now, after every commit.
        now = time.time()
        committed_ts = dt.datetime.fromtimestamp(now, dt.timezone.utc).replace(tzinfo=None)
        lineage_rows = [
            (
                batch_id,
                f"{d}_b{b:04d}",
                b,
                dt.date.fromisoformat(d),
                "committed",
                int(units[(b, d)][0]),
                int(units[(b, d)][0] - units[(b, d)][1]),
                int(units[(b, d)][1]),
                committed_ts,
            )
            for b, d in sorted(todo)
        ]
        if not self.lineage.has_batch(batch_id):
            self._commit(
                spark,
                lambda: self.lineage.append(
                    spark.createDataFrame(lineage_rows, schema=LINEAGE_SCHEMA),
                    summary={"batch_id": batch_id},
                ),
                "append:lineage",
            )
        # counter semantics mirror the reference's storer totals: every
        # consumed message counts, including unitless rejects (which have
        # no lineage row — they belong to no unit — but do reach the dead
        # letter and therefore the rejected counter)
        report.n_in = int(sum(units[u][0] for u in todo)) + n_unitless
        report.n_rejected = int(n_rej)
        report.n_ok = report.n_in - report.n_rejected
        report.points_written = points
        report.seconds = time.time() - t0

        # durable job metrics — the reference's Prometheus counter
        # families as a table row per batch (metrics.go:136-183 analogue).
        # Appended BEFORE the checkpoint markers, like lineage: the ack
        # (marker) must be last, or a crash in between leaves a committed
        # batch with no metrics row and the fully-skipped rerun would
        # never write one.
        from mq_to_db_spark import __version__

        if not self.metrics.has_batch(batch_id):
            metrics_df = spark.createDataFrame(
                [
                    (
                        batch_id,
                        report.n_units_total,
                        report.n_units_skipped,
                        report.n_in,
                        report.n_ok,
                        report.n_rejected,
                        {k: int(v) for k, v in points.items()},
                        float(report.seconds),
                        __version__,
                        committed_ts,
                    )
                ],
                schema=METRICS_SCHEMA,
            )
            self._commit(
                spark,
                lambda: self.metrics.append(
                    metrics_df, summary={"batch_id": batch_id}
                ),
                "append:job_metrics",
            )
        for b, d in sorted(todo):
            n_in, n_r = units[(b, d)]
            self._write_marker(
                b, d, batch_id, {"n_in": int(n_in), "n_rejected": int(n_r)}, scope
            )
        return report

    # -- read-side finalization ----------------------------------------------

    def read_rollup(
        self,
        spark: SparkSession,
        dim: str,
        tier: str,
        gap_filled: bool = False,
        start_date: dt.date | str | None = None,
        end_date: dt.date | str | None = None,
    ) -> DataFrame:
        """Final (cross-unit merged) rollup for a dimension/tier.

        The stored table holds per-unit partials; the final merge groups
        by (bucket_start, keys) over tier-sized data.  For dim="conv" the
        merge is a near-no-op (a conversation lives in one conv_bucket,
        but a 1h/1d bucket can span two dates only at day boundaries —
        still merged here for exactness).

        After :meth:`finalize` the current snapshot holds exactly one row
        per (bucket, series) — the read is then a plain scan+project (no
        Aggregate node), which is the whole point: without finalization a
        long-running streaming append accumulates one partial row per
        micro-batch and every dashboard read re-merges all of them.

        ``start_date`` / ``end_date`` (inclusive) cut on the ``date``
        partition column BEFORE the merge — a dashboard's "last 7 days"
        panel then reads 7 partition directories, not the table (the
        filter lands on the hive partition value, so Catalyst prunes at
        file-listing time)."""
        keys = DIMENSIONS[dim]
        tbl = self.tables[f"rollup_{dim}_{tier}"]
        df = tbl.read(spark)
        if start_date is not None:
            df = df.filter(F.col("date") >= F.lit(str(start_date)).cast("date"))
        if end_date is not None:
            df = df.filter(F.col("date") <= F.lit(str(end_date)).cast("date"))
        snap = tbl.snapshot()
        if snap is not None and (snap.summary or {}).get("finalized"):
            final = df.select("bucket_start", *keys, *AGG_COL_NAMES)
        else:
            final = df.groupBy("bucket_start", *keys).agg(*_merge_aggs())
        if gap_filled:
            final = gapfill(final, tier, keys, policy=self.cfg.gapfill_policy)
        return final

    def finalize(
        self,
        spark: SparkSession,
        dims: list[str] | None = None,
        tiers: list[str] | None = None,
        dates: list | None = None,
        vacuum: bool = False,
    ) -> dict[str, object]:
        """Collapse accumulated per-batch partials into ONE finalized row
        per (bucket, series) — the MERGE-INTO analogue for append /
        streaming mode (VERDICT r02 next-round #2).  Atomic + idempotent:
        each table is rewritten in a single ``overwrite_all`` snapshot
        whose summary carries ``finalized`` — :meth:`read_rollup` then
        skips the merge aggregate entirely; a later ``append`` snapshot
        (new micro-batch) clears the flag and the read-side merge
        resumes, so finalize can run on any cadence (e.g. hourly) while
        the stream keeps flowing.

        Partition columns are re-derived from the merged series: ``date =
        to_date(bucket_start)`` (exact — tier truncation never crosses a
        date) and ``conv_bucket`` from ``conv_id`` for the conv dimension
        (identical to ``unit_cols``); cross-bucket series (global / tool)
        collapse to bucket 0 — they no longer belong to a single ingest
        unit, and retention (the only consumer of the partition layout
        besides pruning) cuts on ``date`` alone.

        Scale note: the rewrite touches tier-sized data only (never raw) —
        at 100 TB raw a 1m tier is ~10⁻³ of it — and ``dates`` bounds it
        further: ``finalize(dates=[...])`` is the **incremental** variant
        that merges and atomically replaces ONLY the listed date
        partitions (``TableIO.overwrite_where`` — one snapshot, delete +
        add together; date-filtered reads are partition-pruned scans).
        A steady-state deployment finalizes yesterday's date once the
        stream's watermark passes midnight and never rewrites it again.
        Incremental runs don't set the ``finalized`` flag (older dates
        may still hold multiple partials), so reads keep the merging
        path — just over collapsed row counts.
        """
        if dates is not None:
            dvals = [
                d if isinstance(d, dt.date) else dt.date.fromisoformat(str(d))
                for d in dates
            ]
            dset = {d.isoformat() for d in dvals}
        out: dict[str, object] = {}
        for dim in dims or list(DIMENSIONS):
            keys = DIMENSIONS[dim]
            for tier in tiers or list(self.cfg.tiers):
                name = f"rollup_{dim}_{tier}"
                tbl = self.tables[name]
                if not tbl.exists():
                    continue
                src = tbl.read(spark)
                if dates is not None:
                    src = src.filter(F.col("date").isin(dvals))
                merged = (
                    src.groupBy("bucket_start", *keys)
                    .agg(*_merge_aggs())
                    .withColumn("date", F.to_date("bucket_start"))
                    .withColumn(
                        "conv_bucket",
                        F.pmod(F.xxhash64("conv_id"), F.lit(self.cfg.conv_buckets)).cast("int")
                        if dim == "conv"
                        else F.lit(0),
                    )
                )
                if dates is None:
                    out[name] = tbl.overwrite_all(merged, summary={"finalized": True})
                else:
                    out[name] = tbl.overwrite_where(
                        merged,
                        lambda pv, ds=dset: pv.get("date", "") in ds,
                        summary={"finalize_dates": sorted(dset)},
                    )
                if vacuum:
                    # reclaim the superseded partial files (two-phase, like
                    # Iceberg expire_snapshots: readers pinned to older
                    # snapshots stay valid until this runs)
                    tbl.vacuum()
        return out

    def invalidated_dates(
        self,
        dims: list[str] | None = None,
        tiers: list[str] | None = None,
    ) -> dict[str, list[str]]:
        """Per tier table: the ``date`` partitions whose logical content
        changed since that table's last finalize — the continuous-aggregate
        *invalidation log*, derived purely from the snapshot history
        (Iceberg-style incremental scan) with no side table to maintain.

        Walk the snapshot log forward from the last FULL finalize
        (``finalized`` summary — the global watermark; v0 if none):
        data-changing snapshots (appends / partition overwrites) mark
        every ``date=`` partition they add files under as dirty; a later
        *incremental* finalize (``finalize_dates`` summary) clears
        exactly the dates it merged; compaction rewrites
        (``compaction`` summary) move bytes, not rows, and mark nothing.
        Linear snapshot history makes this exact: a date is returned iff
        some row-changing commit touched it after the last finalize that
        covered it.

        A never-finalized table reports every date it holds — a cagg's
        first refresh materializes everything, which is the TimescaleDB
        semantic too.
        """
        from mq_to_db_spark.sources.tableio import partition_values

        out: dict[str, list[str]] = {}
        for dim in dims or list(DIMENSIONS):
            for tier in tiers or list(self.cfg.tiers):
                name = f"rollup_{dim}_{tier}"
                tbl = self.tables[name]
                if not tbl.exists():
                    continue
                cur = tbl.current_version()
                watermark = 0
                for v in range(cur, 0, -1):
                    s = tbl.snapshot(v)
                    if s and "finalized" in (s.summary or {}):
                        watermark = v
                        break
                dirty: set[str] = set()
                for v in range(watermark + 1, cur + 1):
                    s = tbl.snapshot(v)
                    if s is None:
                        continue
                    sm = s.summary or {}
                    if "finalize_dates" in sm:
                        dirty.difference_update(sm["finalize_dates"])
                        continue
                    if "compaction" in sm or "retention" in sm:
                        continue
                    for rel in s.added_files:
                        d = partition_values(rel).get("date")
                        if d:
                            dirty.add(d)
                if dirty:
                    out[name] = sorted(dirty)
        return out

    def refresh_invalidated(
        self, spark: SparkSession, vacuum: bool = False
    ) -> dict[str, list[str]]:
        """Refresh the continuous aggregates: incrementally re-finalize
        ONLY the date partitions invalidated since each table's last
        finalize (:meth:`invalidated_dates`), one atomic
        ``overwrite_where`` snapshot per table.  The finalize commit
        itself advances the invalidation watermark, so the operation is
        idempotent and crash-safe with no separate log to ack: killed
        between two tables, a rerun re-merges only the tables that never
        committed; run twice, the second pass sees no dirty dates and is
        a no-op.  This is the scheduled-cagg-refresh analogue — at 100 TB
        the steady-state cost is proportional to the *late* data's date
        spread, never to table size."""
        inv = self.invalidated_dates()
        for name, dates in inv.items():
            _, dim, tier = name.split("_", 2)
            self.finalize(
                spark, dims=[dim], tiers=[tier], dates=dates, vacuum=vacuum
            )
        return inv

    def compact(self, spark: SparkSession, min_files: int = 2) -> dict[str, int]:
        """Small-file hygiene across every engine table: rewrite each
        logical partition holding ≥ ``min_files`` data files into one
        (``TableIO.compact`` / Iceberg ``rewrite_data_files``).  Streaming
        append mode needs this on a cadence — each micro-batch adds its
        own files, and a month of 1-minute triggers is ~43k files per
        table without it.  Complements :meth:`finalize`: compact merges
        FILES (bytes layout), finalize merges ROWS (partials).  Returns
        files-rewritten per table (0 = nothing needed)."""
        out: dict[str, int] = {}
        for name, tbl in {
            **self.tables,
            "dead_letter": self.dead_letter,
            "lineage": self.lineage,
            "job_metrics": self.metrics,
        }.items():
            snap = tbl.compact(spark, min_files=min_files)
            out[name] = int((snap.summary or {}).get("compaction", 0)) if snap else 0
        return out

    # -- retention ------------------------------------------------------------

    def apply_retention(
        self,
        retention_days: dict[str, int],
        as_of: dt.date,
        vacuum: bool = False,
    ) -> dict[str, int]:
        """Tiered retention (the downsample-then-expire contract of a
        TSDB: raw/fine tiers age out first, coarse tiers live longest —
        the Prometheus scrape-tier retention ladder of SURVEY.md §2 C8
        made explicit).  ``retention_days`` maps tier → days kept; a tier
        absent from the map is kept forever.

        Expiry is a *metadata-only* partition drop per table
        (TableIO.delete_partitions on the ``date`` partition column — no
        data rewritten, O(partitions) driver work); pass ``vacuum=True``
        to also reclaim the bytes.  Returns files expired per table.
        """
        out: dict[str, int] = {}
        for tier, days in retention_days.items():
            if tier not in self.cfg.tiers:
                raise ValueError(f"unknown tier {tier!r}")
            cutoff = (as_of - dt.timedelta(days=days)).isoformat()
            for dim in DIMENSIONS:
                name = f"rollup_{dim}_{tier}"
                tbl = self.tables[name]
                snap = tbl.delete_partitions(
                    lambda pv, c=cutoff: pv.get("date", "") < c,
                    summary={"retention_cutoff": cutoff},
                )
                out[name] = len(snap.removed_files)
                if vacuum:
                    tbl.vacuum()
        return out

    def retention_report(
        self, retention_days: dict[str, int], as_of: dt.date
    ) -> dict[str, dict]:
        """Dry run of :meth:`apply_retention`: per tier table, the exact
        cutoff, the ``date`` partitions that would be dropped, and the
        file count — computed from snapshot metadata only (no data read,
        no commit).  The change-review step an operator runs before
        pointing a new retention ladder at a year of tiers; the
        subsequent ``apply_retention`` removes exactly these files
        (asserted by test)."""
        from mq_to_db_spark.sources.tableio import partition_values

        out: dict[str, dict] = {}
        for tier, days in retention_days.items():
            if tier not in self.cfg.tiers:
                raise ValueError(f"unknown tier {tier!r}")
            cutoff = (as_of - dt.timedelta(days=days)).isoformat()
            for dim in DIMENSIONS:
                name = f"rollup_{dim}_{tier}"
                tbl = self.tables[name]
                snap = tbl.snapshot()
                doomed = [
                    f
                    for f in (snap.all_files if snap else [])
                    if partition_values(f).get("date", "") < cutoff
                ]
                out[name] = {
                    "cutoff": cutoff,
                    "dates": sorted(
                        {partition_values(f).get("date", "") for f in doomed}
                    ),
                    "n_files": len(doomed),
                }
        return out

    def read_dead_letter(self, spark: SparkSession) -> DataFrame:
        return self.dead_letter.read(spark)

    def read_metrics(self, spark: SparkSession) -> DataFrame:
        return self.metrics.read(spark, schema=METRICS_SCHEMA)

    def read_lineage(self, spark: SparkSession) -> DataFrame:
        return self.lineage.read(spark, schema=LINEAGE_SCHEMA)
