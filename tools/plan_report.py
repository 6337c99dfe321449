"""Per-query physical-plan audit over the ENTIRE driver contract.

tests/test_contract_plans.py gates the binary scale-killers
(CartesianProduct / un-whitelisted BroadcastNestedLoopJoin); this tool
records the GRADED plan-shape evidence the 100×-scale argument rests
on, as a committed artifact a reviewer can diff across rounds:

per query —
  * ``exchanges``      shuffle count (every one is a cluster-wide
                       repartition at 100 TB)
  * ``broadcasts``     broadcast exchanges (small-side joins — the
                       cheap kind)
  * ``sorts``          SortExec nodes (global sorts are the red flag;
                       most here are window-local)
  * ``python``         Arrow/Pandas UDF crossings (ArrowEvalPython /
                       FlatMapGroupsInPandas / MapInPandas…) — the
                       deliberate slow-path uses (codec, packing,
                       scans); row-at-a-time BatchEvalPython is
                       reported separately and should stay 0
  * ``codegen_spans``  WholeStageCodegen regions (wider = more of the
                       query fused JVM-side)
  * ``scans``          parquet file scans

Plans are ANALYZED only (no execution); shape is data-independent, so
sf0.001 keeps it fast.  Output: BENCH/PLAN_AUDIT.json (machine) and a
ranked console table (human).

Usage: python tools/plan_report.py [sf_dir] [json_out]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_COUNTERS = {
    "exchanges": r"Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition",
    "broadcasts": r"BroadcastExchange",
    "sorts": r"\bSort \[",
    "python_arrow": r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|FlatMapGroupsInPandasWithState",
    "python_row": r"BatchEvalPython",
    # executedPlan().toString() marks codegen'd operators "*(<span>) Op";
    # counted as DISTINCT span ids below (special-cased in main)
    "codegen_spans": r"__SPECIAL__",
    "scans": r"FileScan parquet|Scan ExistingRDD|LocalTableScan",
    "nested_loop": r"BroadcastNestedLoopJoin",
    "cartesian": r"CartesianProduct",
}


def main(sf_dir: str = "/root/testdata/sf0.001", json_out: str = "BENCH/PLAN_AUDIT.json") -> int:
    import __spark_entry__ as entry
    from mq_to_db_spark.session import get_spark

    # AQE off: an unexecuted AdaptiveSparkPlan hides the *(n) codegen
    # markers (and its final shape anyway only differs by coalescing);
    # the static plan is the honest pre-runtime shape to audit
    spark = get_spark(
        app_name="plan-audit",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    report: dict[str, dict] = {}
    for name, fn in entry.queries().items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            report[name] = {"error": str(e)[:200]}
            continue
        counts = {
            k: len(re.findall(rx, plan))
            for k, rx in _COUNTERS.items()
            if rx != r"__SPECIAL__"
        }
        counts["codegen_spans"] = len(set(re.findall(r"\*\((\d+)\)", plan)))
        report[name] = counts
    ok = {n: r for n, r in report.items() if "error" not in r}
    import subprocess

    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.strip()
    snap = {
        "what": (
            "physical-plan shape audit of every driver-contract query "
            "(analyzed, not executed; shape is data-independent) — the "
            "committed evidence behind the 100x-scale argument"
        ),
        "git_head": head,
        "n_queries": len(report),
        "totals": {
            k: sum(r.get(k, 0) for r in ok.values()) for k in _COUNTERS
        },
        "row_at_a_time_python_total": sum(r.get("python_row", 0) for r in ok.values()),
        "queries": report,
    }
    with open(json_out, "w") as f:
        json.dump(snap, f, indent=1)
    width = max(len(n) for n in report)
    print(f"{'query'.ljust(width)}  exch  bcast  sort  arrow  rowpy  wscg  scans")
    for n, r in sorted(ok.items(), key=lambda kv: -kv[1]["exchanges"]):
        print(
            f"{n.ljust(width)}  {r['exchanges']:4d}  {r['broadcasts']:5d}"
            f"  {r['sorts']:4d}  {r['python_arrow']:5d}  {r['python_row']:5d}"
            f"  {r['codegen_spans']:4d}  {r['scans']:5d}"
        )
    errs = {n: r for n, r in report.items() if "error" in r}
    for n, r in errs.items():
        print(f"ERROR {n}: {r['error']}")
    print(f"snapshot -> {json_out}")
    return len(errs)


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
