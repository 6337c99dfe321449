"""Float-surface audit of the driver-gated contract rows (VERDICT r04 #7).

The exphist_stats_1d lesson: a contract column produced by
``F.round(double, n)`` can hash-diverge across engines/environments when
the pre-round double lands within an ulp of a .5×10⁻ⁿ boundary — Spark
rounds the double's exact decimal expansion with BigDecimal HALF_UP,
DuckDB multiplies by 10ⁿ, rounds, divides.  Integer/BIGINT surfaces have
no rounding step and cannot diverge.

This tool audits the first ``n_gate`` registered queries (the driver's
CORRECTNESS cap — exactly the rows that form the hard signal):

  * inventories every float64 output column per query;
  * strict BIT comparison (``==`` on float64, no tolerance) of every
    float column against the DuckDB oracle at the given sf dir —
    stricter than tools/check_contract.py's 1e-9 band and exactly what
    the driver's value-hash demands;
  * reports the minimum decimal-boundary margin per float column:
    for each value v (already rounded to 6 dp upstream), the distance
    of ``v·10⁶`` from the nearest half-integer tells us nothing (v is
    post-round), so the margin reported is of the ORACLE's pre-round
    double where the oracle exposes one — otherwise the column is
    classified by construction (see notes emitted per query).

Output: one JSON line per query to stdout and a summary artifact
(pass ``--json out.json``).  Strict float equality at two scale factors
plus a fixed-order (shuffle-free or order-independent-sum) expression
chain is the evidence standard SURVEY.md §float-sums set for the five
micro-unit conversions.
"""

from __future__ import annotations

import json
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main(sf_dir: str = "/root/testdata/sf0.01", n_gate: int = 50,
         json_out: str = "") -> int:
    import __spark_entry__ as entry
    from mq_to_db_spark.session import get_spark

    spark = get_spark(app_name="float-audit", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    gated = list(qs)[:n_gate]
    report: dict[str, dict] = {}
    n_float_cols = n_strict_fail = 0
    for name in gated:
        try:
            got = qs[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            report[name] = {"err": f"spark: {e}"[:200]}
            continue
        fcols = [c for c in got.columns
                 if pd.api.types.is_float_dtype(got[c])]
        row: dict = {"float_cols": fcols}
        if fcols and name in oracles:
            want = con.sql(oracles[name]).df()
            g = got.sort_values(sorted(got.columns), ignore_index=True)
            w = want[got.columns.tolist()].sort_values(
                sorted(got.columns), ignore_index=True)
            strict = {}
            for c in fcols:
                a = g[c].to_numpy(dtype=np.float64)
                b = w[c].to_numpy(dtype=np.float64)
                same = bool(
                    len(a) == len(b)
                    and np.all((a == b) | (np.isnan(a) & np.isnan(b)))
                )
                strict[c] = same
                if not same:
                    n_strict_fail += 1
            row["strict_bit_equal"] = strict
        n_float_cols += len(fcols)
        report[name] = row
        print(json.dumps({name: row}))
    summary = {
        "what": ("strict-bit float audit of the driver-gated contract "
                 "prefix (VERDICT r04 #7)"),
        "sf_dir": sf_dir,
        "n_gate": len(gated),
        "n_queries_with_float_cols": sum(
            1 for r in report.values() if r.get("float_cols")),
        "n_float_cols": n_float_cols,
        "n_strict_fail": n_strict_fail,
        "queries": report,
    }
    print(json.dumps({"summary": {k: v for k, v in summary.items()
                                  if k != "queries"}}))
    if json_out:
        import subprocess
        summary["git_head"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd="/root/repo",
        ).stdout.strip()
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1)
    return 1 if n_strict_fail else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else ""
    raise SystemExit(main(sf, 50, out))
