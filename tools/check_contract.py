"""Local mirror of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark AND its ``oracle_sql()`` on
DuckDB at sf=0.01, compare row-count + schema-width + order-insensitive
values.  Usage: python tools/check_contract.py [sf_dir]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = pd.to_datetime(col).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(col):
            df[c] = col.astype("float64")
        elif pd.api.types.is_integer_dtype(col):
            df[c] = col.astype("int64")
        elif col.dtype == object or str(col.dtype) == "string":
            df[c] = col.astype(str).where(col.notna(), None)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    errs = []
    if len(got) != len(want):
        errs.append(f"rowcount {len(got)} != {len(want)}")
    if sorted(got.columns) != sorted(want.columns):
        errs.append(f"columns {sorted(got.columns)} != {sorted(want.columns)}")
        return errs
    g, w = normalize(got), normalize(want)
    if len(g) == len(w):
        for c in g.columns:
            a, b = g[c], w[c]
            if pd.api.types.is_float_dtype(a):
                bad = ~(
                    (a.isna() & b.isna())
                    | (a == b)
                    | ((a - b).abs() <= 1e-9 * (1 + b.abs()))
                )
            else:
                bad = ~((a.isna() & b.isna()) | (a.astype(object) == b.astype(object)))
            n_bad = int(bad.sum())
            if n_bad:
                i = bad.idxmax()
                errs.append(f"col {c}: {n_bad} mismatches, first: {a[i]!r} != {b[i]!r}")
    return errs


def main(
    sf_dir: str = "/root/testdata/sf0.01",
    only: str = "",
    json_out: str = "",
) -> int:
    """``only``: comma-separated query names — run just those (iteration).
    ``json_out``: also write a snapshot artifact (the committed evidence
    file covering the FULL contract, per ADVICE r03 — the driver's own
    CORRECTNESS file caps at ~50 rows)."""
    import __spark_entry__ as entry
    from mq_to_db_spark.session import get_spark

    spark = get_spark(app_name="contract-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    if only:
        wanted = {n.strip() for n in only.split(",") if n.strip()}
        qs = {n: f for n, f in qs.items() if n in wanted}
    n_fail = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            results[name] = {"exact": False, "err": f"spark: {e}"[:300]}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY  {name}: rows={len(got)} cols={len(got.columns)}")
            results[name] = {"exact": None, "rows": len(got), "rows_only": True}
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            results[name] = {"exact": False, "err": f"duckdb: {e}"[:300]}
            n_fail += 1
            continue
        errs = compare(name, got, want)
        if errs:
            n_fail += 1
            print(f"FAIL  {name}: " + "; ".join(errs[:4]))
            results[name] = {"exact": False, "rows": len(got), "err": "; ".join(errs[:4])[:300]}
        else:
            print(f"   OK  {name}: rows={len(got)}")
            results[name] = {"exact": True, "rows": len(got)}
    # smoke: entry()
    e = entry.entry(spark)
    print(f"entry(): rows={e.count()} schema={[f.name for f in e.schema.fields]}")
    if json_out:
        import json
        import subprocess

        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd="/root/repo",
        ).stdout.strip()
        snap = {
            "what": (
                "full local replay of the driver correctness gate "
                "(tools/check_contract.py) over ALL registered queries at "
                f"{sf_dir} — committed so the recorded artifact covers the "
                "complete contract even if the driver's file caps at ~50 "
                "rows (ADVICE r03)"
            ),
            "git_head": head,
            "n_queries": len(results),
            "n_exact": sum(1 for r in results.values() if r.get("exact")),
            "queries": results,
        }
        with open(json_out, "w") as f:
            json.dump(snap, f, indent=1)
        print(f"snapshot -> {json_out}")
    return n_fail


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
