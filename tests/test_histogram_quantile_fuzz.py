"""Fuzz `histogram_quantile` against a line-faithful port of Prometheus's
`bucketQuantile` (promql/quantile.go — the published algorithm the
reference's p90 dashboard panel evaluates).

Random bucket layouts (negative edges, missing buckets, all-inf mass,
single-bucket), q ∈ {0, 0.25, 0.5, 0.9, 0.99, 1}; all cases ride in one
DataFrame (one Spark job per q) so the fuzz stays fast.
"""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mq_to_db_spark.operators.rollup import histogram_quantile

INF = float("inf")


def prom_bucket_quantile(q: float, items: list[tuple[float, int]]) -> float:
    """Port of promql/quantile.go bucketQuantile over *non-cumulative*
    (le, n) rows; a missing +inf bucket is treated as present with 0
    observations (fixed_bucket_histogram omits empty buckets)."""
    if q < 0:
        return -INF
    if q > 1:
        return INF
    b = sorted(items)
    if not b or b[-1][0] != INF:
        b.append((INF, 0))
    # cumulative counts, Prometheus-style
    les = [le for le, _ in b]
    cums = []
    c = 0
    for _, n in b:
        c += n
        cums.append(c)
    if len(b) < 2:
        return math.nan
    observations = cums[-1]
    if observations == 0:
        return math.nan
    rank = q * observations
    # sort.Search over the finite buckets
    idx = len(b) - 1
    for i in range(len(b) - 1):
        if cums[i] >= rank:
            idx = i
            break
    if idx == len(b) - 1:
        return les[-2]
    if idx == 0 and les[0] <= 0:
        return les[0]
    bucket_start = 0.0
    bucket_end = les[idx]
    count = cums[idx]
    if idx > 0:
        bucket_start = les[idx - 1]
        count -= cums[idx - 1]
        rank -= cums[idx - 1]
    return bucket_start + (bucket_end - bucket_start) * (rank / count)


def _random_cases(n_cases: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for case in range(n_cases):
        kind = case % 5
        if kind == 4:
            # all mass in +inf
            edges, counts = [], []
            inf_n = int(rng.integers(1, 20))
        else:
            k = int(rng.integers(1, 8))
            lo = -50.0 if kind == 1 else 0.5  # kind 1: negative edges
            edges = sorted(set(np.round(rng.uniform(lo, 100.0, size=k), 3)))
            counts = [int(c) for c in rng.integers(0, 15, size=len(edges))]
            if sum(counts) == 0:
                counts[0] = 1
            inf_n = int(rng.integers(0, 10)) if kind != 2 else 0  # kind 2: no inf row
        for le, n in zip(edges, counts):
            if n > 0:  # fixed_bucket_histogram never emits empty buckets
                rows.append((case, float(le), n))
        if inf_n > 0:
            rows.append((case, INF, inf_n))
    return pd.DataFrame(rows, columns=["case", "le", "n"])


@pytest.mark.parametrize("q", [0.0, 0.25, 0.5, 0.9, 0.99, 1.0])
def test_histogram_quantile_matches_prometheus(spark, q):
    cases = _random_cases(80, seed=int(q * 1000) + 17)
    # bucket_start doubles as the case id (any orderable key works)
    df = spark.createDataFrame(
        cases.rename(columns={"case": "bucket_start"}),
        "bucket_start long, le double, n long",
    )
    got_rows = histogram_quantile(df, q).collect()
    got = {r.bucket_start: r[f"q{int(q * 100)}"] for r in got_rows}
    for case, grp in cases.groupby("case"):
        want = prom_bucket_quantile(q, list(zip(grp["le"], grp["n"])))
        have = got.get(case)
        if math.isnan(want):
            # engine convention: NaN → NULL (or row absent when total=0)
            assert have is None or (isinstance(have, float) and math.isnan(have)), (
                case,
                have,
            )
        else:
            assert have == pytest.approx(want, rel=1e-12, abs=1e-12), (
                case,
                have,
                want,
                list(zip(grp["le"], grp["n"])),
            )
