"""TableIO — atomic-commit, snapshot-versioned Parquet tables.

The runtime has no Iceberg jar (SURVEY.md §7), so this is a thin seam
emulating the Iceberg semantics the engine's design depends on:

  * **atomic snapshot commit** — a commit is the atomic replacement of the
    ``_current`` version pointer (``os.replace``), after all data files are
    fully written; readers never observe a half-written table.  This is
    the engine's "broker ack": the reference acknowledges a message only
    after the store succeeds
    (/root/reference/internal/repository/messages.go:131-148); here a
    snapshot exists only after its files do.
  * **snapshot-range incremental reads** — each manifest records the files
    *added* by that snapshot, so ``read_incremental(from, to)`` scans only
    the delta (the AMQP prefetch-window / delivery-batch analogue,
    rmq.go:120-124).
  * **partition overwrite (MERGE-style idempotent upsert)** — a commit may
    atomically replace all files of a set of logical partitions; replaying
    the same batch yields byte-identical table state (effectively-once on
    top of at-least-once reruns).

On a real cluster this class is swapped for
``sources.iceberg.IcebergTableIO`` (same interface, jar-gated —
``df.writeTo(tbl).overwritePartitions()`` / snapshot-range reads) via
``RollupPipeline(table_factory=...)``; the pipeline only touches this
interface.  File moves use ``os.replace``
within one filesystem — on object storage the same scheme works with
copy+manifest (the manifest, not the directory listing, defines the
table, exactly as Iceberg does).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col as F_col

from mq_to_db_spark.sources.store import LocalAtomicStore


def partition_values(rel_path: str) -> dict[str, str]:
    """Hive partition values encoded in a file's directory path,
    e.g. ``date=2025-01-03/conv_bucket=7/part-0.parquet`` →
    ``{"date": "2025-01-03", "conv_bucket": "7"}``."""
    out: dict[str, str] = {}
    for part in rel_path.split(os.sep)[:-1]:
        if "=" in part:
            k, v = part.split("=", 1)
            out[k] = v
    return out


@dataclass
class Snapshot:
    version: int
    snapshot_id: str
    parent_id: str | None
    committed_at: float
    operation: str
    added_files: list[str]
    removed_files: list[str]
    all_files: list[str]
    summary: dict


class TableIO:
    """One versioned table rooted at ``path``."""

    def __init__(
        self,
        path: str,
        partition_cols: list[str] | None = None,
        store: LocalAtomicStore | None = None,
    ):
        """``store`` is the AtomicStore holding this table's metadata and
        data objects (default: a :class:`LocalAtomicStore` rooted at
        ``path``) — swap it for an object-store implementation without
        touching any table or pipeline logic."""
        self.path = path
        self.partition_cols = list(partition_cols or [])
        self.store = store or LocalAtomicStore(path)
        self.data_dir = self.store.uri("data")
        os.makedirs(self.data_dir, exist_ok=True)
        self._batch_ids: set[str] | None = None

    # -- snapshot bookkeeping -------------------------------------------------

    def current_version(self) -> int:
        if not self.store.exists("_current"):
            return 0
        return int(self.store.read_text("_current").strip())

    def snapshot(self, version: int | None = None) -> Snapshot | None:
        v = self.current_version() if version is None else version
        if v == 0:
            return None
        return Snapshot(**json.loads(self.store.read_text(f"_manifests/v{v:08d}.json")))

    def exists(self) -> bool:
        return self.current_version() > 0

    def batch_ids(self) -> set[str]:
        """Every ``batch_id`` recorded in a snapshot summary — the
        idempotent-append ledger (Iceberg analogue: scan snapshot
        summaries).  Lazily scanned once per TableIO instance, updated on
        each local commit."""
        if self._batch_ids is None:
            ids: set[str] = set()
            for v in range(1, self.current_version() + 1):
                s = self.snapshot(v)
                b = (s.summary or {}).get("batch_id") if s else None
                if b:
                    ids.add(b)
            self._batch_ids = ids
        return self._batch_ids

    def has_batch(self, batch_id: str) -> bool:
        """True when a committed snapshot already carries ``batch_id`` —
        the guard that makes per-batch appends idempotent under crash
        replay (a replayed micro-batch skips tables it already reached,
        closing the commit-then-crash-before-ack double-count window)."""
        return batch_id in self.batch_ids()

    # -- write paths ----------------------------------------------------------

    def _stage(self, df: DataFrame) -> tuple[str, list[str]]:
        """Write df to a staging dir; return (staging_root, relative files)."""
        stage = os.path.join(self.path, "_staging", uuid.uuid4().hex)
        writer = df.write.mode("overwrite")
        if self.partition_cols:
            writer = writer.partitionBy(*self.partition_cols)
        writer.parquet(stage)
        rels = []
        for root, _dirs, files in os.walk(stage):
            for fn in files:
                if fn.endswith(".parquet"):
                    rels.append(os.path.relpath(os.path.join(root, fn), stage))
        return stage, rels

    def _publish(self, stage: str, rels: list[str], prefix: str) -> list[str]:
        """Publish staged files into data/ under a unique prefix via the
        AtomicStore; return new relative paths (relative to data/)."""
        out = []
        for rel in rels:
            # keep partition dirs (they encode partition values), uniquify
            # the leaf name so concurrent/replayed commits never collide.
            d, leaf = os.path.split(rel)
            new_rel = os.path.join(d, f"{prefix}-{leaf}")
            self.store.publish_file(
                os.path.join(stage, rel), "data/" + new_rel.replace(os.sep, "/")
            )
            out.append(new_rel)
        shutil.rmtree(stage, ignore_errors=True)
        return out

    def _commit(self, operation: str, added: list[str], removed: list[str], summary: dict) -> Snapshot:
        parent = self.snapshot()
        prev_files = parent.all_files if parent else []
        removed_set = set(removed)
        all_files = [f for f in prev_files if f not in removed_set] + added
        v = (parent.version if parent else 0) + 1
        snap = Snapshot(
            version=v,
            snapshot_id=uuid.uuid4().hex,
            parent_id=parent.snapshot_id if parent else None,
            committed_at=time.time(),
            operation=operation,
            added_files=added,
            removed_files=removed,
            all_files=all_files,
            summary=summary,
        )
        self.store.write_text_atomic(f"_manifests/v{v:08d}.json", json.dumps(snap.__dict__))
        # the atomic commit point:
        self.store.write_text_atomic("_current", str(v))
        b = summary.get("batch_id")
        if b and self._batch_ids is not None:
            self._batch_ids.add(b)
        return snap

    def append(self, df: DataFrame, summary: dict | None = None) -> Snapshot:
        stage, rels = self._stage(df)
        added = self._publish(stage, rels, uuid.uuid4().hex[:8])
        return self._commit("append", added, [], summary or {})

    def overwrite_partitions(self, df: DataFrame, summary: dict | None = None) -> Snapshot:
        """Dynamic partition overwrite: atomically replace every logical
        partition present in ``df`` (Iceberg ``overwritePartitions``).
        Requires ``partition_cols``."""
        if not self.partition_cols:
            raise ValueError("overwrite_partitions requires partition_cols")
        stage, rels = self._stage(df)
        touched = {os.path.dirname(r) for r in rels}
        prev = self.snapshot()
        removed = (
            [f for f in prev.all_files if os.path.dirname(f) in touched] if prev else []
        )
        added = self._publish(stage, rels, uuid.uuid4().hex[:8])
        return self._commit("overwrite_partitions", added, removed, summary or {})

    def overwrite_all(self, df: DataFrame, summary: dict | None = None) -> Snapshot:
        stage, rels = self._stage(df)
        prev = self.snapshot()
        removed = list(prev.all_files) if prev else []
        added = self._publish(stage, rels, uuid.uuid4().hex[:8])
        return self._commit("overwrite_all", added, removed, summary or {})

    def overwrite_where(self, df, predicate, summary: dict | None = None) -> Snapshot:
        """Atomic replace-where (Iceberg ``overwrite(condition)``): ONE
        snapshot removes every file whose hive partition values match
        ``predicate`` (a ``dict[str, str] -> bool`` callable) AND adds
        ``df``'s files.  The caller guarantees ``df`` holds the full
        replacement row-set for the matched region — this is the
        incremental-finalization primitive (rewrite only the partitions
        whose partial count grew, not the whole table)."""
        stage, rels = self._stage(df)
        prev = self.snapshot()
        removed = (
            [f for f in prev.all_files if predicate(partition_values(f))]
            if prev
            else []
        )
        added = self._publish(stage, rels, uuid.uuid4().hex[:8])
        return self._commit("overwrite_where", added, removed, summary or {})

    def delete_partitions(self, predicate, summary: dict | None = None) -> Snapshot:
        """Metadata-only partition drop (retention expiry — the Iceberg
        ``DROP PARTITION`` / delete-where-on-partition-cols analogue):
        files whose hive partition values match ``predicate`` (a callable
        ``dict[str, str] -> bool``) leave the new snapshot; no data is
        rewritten or touched.  Physical bytes are reclaimed later by
        :meth:`vacuum` — the same two-phase shape as Iceberg
        ``expire_snapshots`` + orphan-file cleanup, so a reader pinned to
        an older snapshot keeps working until vacuum."""
        prev = self.snapshot()
        removed = (
            [f for f in prev.all_files if predicate(partition_values(f))]
            if prev
            else []
        )
        return self._commit("delete_partitions", [], removed, summary or {})

    def compact(self, spark: SparkSession, min_files: int = 2) -> Snapshot | None:
        """Rewrite every logical partition holding ≥ ``min_files`` data
        files into one file — the small-file compaction a streaming
        append workload needs (each micro-batch appends its own partial
        files; thousands of batches → thousands of tiny files per
        partition and scan-planning death at 100 TB).  The rewrite is a
        normal atomic snapshot commit: readers pinned to older snapshots
        keep working until :meth:`vacuum` (Iceberg's ``rewrite_data_files``
        contract).  Returns None when nothing needs compacting."""
        snap = self.snapshot()
        if snap is None:
            return None
        from collections import Counter

        per_part = Counter(os.path.dirname(f) for f in snap.all_files)
        doomed = {d for d, n in per_part.items() if n >= min_files}
        if not doomed:
            return None
        files = [f for f in snap.all_files if os.path.dirname(f) in doomed]
        df = self._read_files(spark, files)
        if self.partition_cols:
            # hash-partition on the partition cols → all rows of one
            # logical partition land in one task → one output file each
            df = df.repartition(*[F_col(c) for c in self.partition_cols])
            return self.overwrite_partitions(df, summary={"compaction": len(files)})
        # unpartitioned table: single-file rewrite of everything
        full = self._read_files(spark, snap.all_files).coalesce(1)
        return self.overwrite_all(full, summary={"compaction": len(snap.all_files)})

    def vacuum(self, keep_versions: int = 1) -> list[str]:
        """Physically delete data files unreferenced by the newest
        ``keep_versions`` snapshots; returns their relative paths.
        Time-travel to vacuumed snapshots is no longer valid (exactly
        Iceberg's ``expire_snapshots`` contract)."""
        cur = self.current_version()
        keep: set[str] = set()
        for v in range(max(1, cur - keep_versions + 1), cur + 1):
            s = self.snapshot(v)
            if s:
                keep.update(s.all_files)
        deleted = []
        for key in self.store.list("data"):
            rel = key[len("data/"):]
            if rel.endswith(".parquet") and rel not in keep:
                self.store.delete(key)
                deleted.append(rel)
        return deleted

    # -- read paths -----------------------------------------------------------

    def _read_files(self, spark: SparkSession, files: list[str], schema=None) -> DataFrame:
        if not files:
            if schema is None:
                raise ValueError("empty table and no schema given")
            return spark.createDataFrame([], schema=schema)
        paths = [os.path.join(self.data_dir, f) for f in files]
        reader = spark.read.option("basePath", self.data_dir)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(*paths)

    def read(self, spark: SparkSession, version: int | None = None, schema=None) -> DataFrame:
        """Scan the table at a snapshot (default: current).  Partition
        columns come back as real columns (hive-style dirs + basePath) so
        partition pruning works on them."""
        snap = self.snapshot(version)
        return self._read_files(spark, snap.all_files if snap else [], schema=schema)

    def read_incremental(
        self, spark: SparkSession, from_version: int, to_version: int | None = None, schema=None
    ) -> DataFrame:
        """Files *added* in (from_version, to_version] — the delivery-batch
        read.  Note: only valid across append snapshots (like Iceberg's
        incremental scan)."""
        to_v = self.current_version() if to_version is None else to_version
        files: list[str] = []
        for v in range(from_version + 1, to_v + 1):
            snap = self.snapshot(v)
            if snap.operation != "append":
                raise ValueError(
                    f"incremental read across non-append snapshot v{v} ({snap.operation})"
                )
            files.extend(snap.added_files)
        return self._read_files(spark, files, schema=schema)
