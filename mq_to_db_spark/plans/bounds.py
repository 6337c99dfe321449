"""Per-operation wall-clock bounds for Spark actions.

Reference analogue: every storage operation is wrapped in
``context.WithTimeout`` and the in-flight query is cancelled at the
deadline, with a timeout counter and a warning log
(/root/reference/internal/storage/pgsql/pgsql.go:86-96 ``ExecContext``,
:70-84 ``Ping``; config key ``maxQueryTimeOut``, config.go).

Spark has no context deadline on actions, so the idiomatic equivalent
is **job-group cancellation**: the action runs in a worker thread tagged
with a job group (``interruptOnCancel=True`` so executor task threads
get interrupted, not just descheduled), and the caller cancels the whole
group at the deadline.  This bounds every *distributed* phase of the
operation — scan, shuffle, sink commit — which is exactly what the
reference's statement timeout bounds on the PostgreSQL side.

Driver-side Python that never submits a job (or a hang *between* jobs)
is not interruptible this way; the bound still fires (the caller stops
waiting and raises), but the stuck thread is abandoned rather than
killed — the same failure mode as a Go goroutine blocked past its
context deadline.
"""

from __future__ import annotations

import threading
import uuid
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


class QueryTimeoutError(TimeoutError):
    """An operation exceeded its wall-clock bound and its Spark job
    group was cancelled (reference: ``context.DeadlineExceeded`` out of
    pgsql.go ExecContext/QueryContext)."""


@dataclass
class BoundsMetrics:
    """In-process counters mirroring the reference's Prometheus storage
    families (metrics.go: StorageExecTotal / StorageExecTimeOutTotal /
    StoragePingTotal / StoragePingTimeOutTotal).  Durable per-batch
    metrics live in the pipeline's ``job_metrics`` table; these cheap
    process-local counters exist for the health/ops surface."""

    exec_total: int = 0
    exec_timeout_total: int = 0
    ping_total: int = 0
    ping_timeout_total: int = 0
    last_timeout_group: str | None = None
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def _inc(self, attr: str, group: str | None = None):
        with self._lock:
            setattr(self, attr, getattr(self, attr) + 1)
            if group is not None:
                self.last_timeout_group = group


#: process-wide default counter set (callers may pass their own)
METRICS = BoundsMetrics()


def bounded_action(
    spark: SparkSession,
    fn,
    timeout_sec: float,
    description: str = "",
    metrics: BoundsMetrics | None = None,
    grace_sec: float = 5.0,
):
    """Run ``fn()`` (typically a Spark action) under a hard wall-clock
    bound; returns its result, or raises :class:`QueryTimeoutError`
    after cancelling the operation's job group.

    The worker thread tags itself with a unique job group before calling
    ``fn`` — with PySpark's pinned-thread mode (default since 3.2) the
    tag applies to that thread's JVM counterpart only, so concurrent
    operations on the same session are bounded independently.  On
    deadline the group is cancelled (``interruptOnCancel`` interrupts
    running task threads) and the worker is given ``grace_sec`` to
    unwind before the error is raised.
    """
    m = metrics or METRICS
    m._inc("exec_total")
    group = f"bounded-{uuid.uuid4().hex[:12]}"
    sc = spark.sparkContext
    holder: dict = {}

    def _work():
        sc.setJobGroup(group, description or group, interruptOnCancel=True)
        try:
            holder["result"] = fn()
        except BaseException as e:  # noqa: BLE001 — report through holder
            holder["error"] = e
        finally:
            # detach so a pooled/reused thread can't leak the group tag
            sc.setJobGroup("", "")

    t = threading.Thread(target=_work, name=group, daemon=True)
    t.start()
    t.join(timeout_sec)
    if t.is_alive():
        m._inc("exec_timeout_total", group)
        sc.cancelJobGroup(group)
        t.join(grace_sec)
        raise QueryTimeoutError(
            f"operation {description or group!r} exceeded {timeout_sec}s "
            "(job group cancelled)"
        )
    if "error" in holder:
        raise holder["error"]
    return holder["result"]


def bounded_ping(
    spark: SparkSession,
    timeout_sec: float = 5.0,
    metrics: BoundsMetrics | None = None,
) -> bool:
    """Health probe under a bound (reference pgsql.go:70-84 ``Ping`` with
    ``maxPingTimeOut``): returns True iff the session answers a trivial
    distributed action within ``timeout_sec``."""
    m = metrics or METRICS
    m._inc("ping_total")
    from mq_to_db_spark.version import health_check

    try:
        return bounded_action(
            spark, lambda: health_check(spark), timeout_sec,
            description="ping", metrics=BoundsMetrics(),  # don't double-count exec
        )
    except QueryTimeoutError:
        m._inc("ping_timeout_total")
        return False
