"""IcebergTableIO — jar-gated: the full suite runs only where an
``iceberg-spark-runtime`` jar and catalog are configured (no jar ships
in this sandbox, so CI here exercises the gate + interface shape and
skips the catalog round-trips, exactly as promised in SURVEY.md §7)."""

import pytest
from pyspark.sql import functions as F

from mq_to_db_spark.sources.iceberg import IcebergTableIO, iceberg_available


def test_gate_reports_absence_and_ctor_refuses(spark):
    if iceberg_available(spark):
        pytest.skip("Iceberg jar present; gate-absence test not applicable")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        IcebergTableIO(spark, "local.db.t", ["date"])


def test_interface_parity_with_tableio():
    """Every public method of the parquet TableIO exists on the Iceberg
    variant with a compatible signature — the pipeline swaps backends
    through this seam without code changes."""
    import inspect

    from mq_to_db_spark.sources.tableio import TableIO

    for name, member in inspect.getmembers(TableIO, predicate=inspect.isfunction):
        if name.startswith("_"):
            continue
        other = getattr(IcebergTableIO, name, None)
        assert other is not None, f"IcebergTableIO missing {name}"
        want = [
            p
            for p in inspect.signature(member).parameters
            if p not in ("self", "spark")
        ]
        have = [
            p
            for p in inspect.signature(other).parameters
            if p not in ("self", "spark")
        ]
        assert want == have, (name, want, have)


@pytest.fixture()
def iceberg_table(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("no iceberg-spark-runtime jar on the classpath")
    spark.conf.set("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", str(tmp_path / "wh"))
    return IcebergTableIO(spark, "it.db.t", ["date"])


def test_append_and_snapshot_roundtrip(spark, iceberg_table):
    df = spark.createDataFrame([("2025-01-01", 1)], "date string, v int")
    iceberg_table.append(df)
    iceberg_table.append(df.withColumn("v", F.lit(2)))
    assert iceberg_table.current_version() >= 2
    assert iceberg_table.read(spark).count() == 2
    inc = iceberg_table.read_incremental(spark, from_version=1)
    assert inc.count() == 1  # only the second append's rows


def test_overwrite_partitions_idempotent(spark, iceberg_table):
    df = spark.createDataFrame([("2025-01-02", 7)], "date string, v int")
    iceberg_table.overwrite_partitions(df)
    iceberg_table.overwrite_partitions(df)  # replay
    assert (
        iceberg_table.read(spark).filter("date = '2025-01-02'").count() == 1
    )
