"""One-line-JSON host-health probe (BENCH/PROFILE.md §5).

Measures the three signals that distinguish "the plan is slow" from
"the host is sick", cheaply enough to run before/after any benchmark:

  * ``fault_us`` — mean cost of an anonymous minor page fault
    (first-touch over 256 MiB; healthy KVM ≈ 0.2-1 µs/page, the
    round-3 episode measured ~300 µs);
  * ``steal_pct`` / ``idle_pct`` — classic /proc/stat shares over a 2 s
    window (the episode showed 0 % steal — steal alone is NOT a
    sufficient health check);
  * ``compute_gops`` — tight single-core integer loop on resident
    memory (separates fault throttling from plain CPU slowness).

Usage: ``python tools/probe_host.py`` → one JSON line on stdout.
"""

from __future__ import annotations

import json
import time


def fault_probe(mib: int = 256) -> float:
    """Mean µs per 4 KiB first-touch fault over a fresh anonymous map."""
    import mmap

    n = mib * 1024 * 1024
    m = mmap.mmap(-1, n)
    t0 = time.perf_counter()
    step = 4096
    for off in range(0, n, step):
        m[off] = 1
    dt = time.perf_counter() - t0
    m.close()
    return dt / (n / step) * 1e6


def stat_window(seconds: float = 2.0) -> dict:
    def snap():
        with open("/proc/stat") as f:
            return list(map(int, f.readline().split()[1:9]))

    a = snap()
    time.sleep(seconds)
    b = snap()
    d = [y - x for x, y in zip(a, b)]
    tot = max(sum(d), 1)
    names = ["user", "nice", "sys", "idle", "iowait", "irq", "softirq", "steal"]
    return {f"{n}_pct": round(100 * v / tot, 2) for n, v in zip(names, d)}


def compute_probe(n: int = 20_000_000) -> float:
    """Integer ops/second on resident memory (GOPS), no allocation."""
    import numpy as np

    a = np.arange(n, dtype=np.int64)  # faulted once here, excluded below
    a.sum()
    t0 = time.perf_counter()
    s = 0
    for _ in range(5):
        s += int(a.sum())
    dt = time.perf_counter() - t0
    return round(5 * n / dt / 1e9, 3)


def main(mib: int = 256, stat_seconds: float = 2.0) -> dict:
    out = {"fault_us": round(fault_probe(mib), 3)}
    out.update(stat_window(stat_seconds))
    out["compute_gops"] = compute_probe()
    # two independent failure modes observed on this host class: fault
    # throttling (round-3 episode, ~700 µs/fault with normal compute) and
    # plain CPU throttling (healthy faults, ~7× slower tight loop) —
    # require both healthy before trusting benchmark numbers
    out["healthy"] = out["fault_us"] < 5.0 and out["compute_gops"] >= 0.6
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
