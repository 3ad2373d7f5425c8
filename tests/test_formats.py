"""CSV/ORC roundtrips: values survive, explicit schemas type correctly,
and the ORC scan (columnar) pushes filters while CSV (row format) cannot."""

from __future__ import annotations

from pyspark.sql import functions as F

from cartography_spark.sources.formats import (
    csv_to_parquet,
    read_csv,
    read_orc,
    write_csv,
    write_orc,
)
from cartography_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def test_csv_roundtrip_with_schema(spark, tmp_path):
    nation = load_table(spark, SF_SMOKE, "nation")
    p = str(tmp_path / "nation_csv")
    write_csv(nation, p)
    back = read_csv(spark, p, schema="n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
    assert back.schema["n_nationkey"].dataType.simpleString() == "bigint"
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in nation.collect()
    )


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    p = str(tmp_path / "orders_orc")
    write_orc(orders, p)
    back = read_orc(spark, p)
    assert back.count() == orders.count()
    plan = (
        back.filter(F.col("o_custkey") == 7)
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,7)" in plan


def test_orc_partitioned_write_prunes(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "bucket", F.col("o_orderkey") % 4
    )
    p = str(tmp_path / "orders_part")
    write_orc(orders, p, partition_by=["bucket"])
    one = read_orc(spark, p).filter(F.col("bucket") == 2)
    files = one.select(F.input_file_name()).distinct().collect()
    assert all("bucket=2" in r[0] for r in files)  # partition pruning, not filtering


def test_csv_to_parquet_columnarization(spark, tmp_path):
    region = load_table(spark, SF_SMOKE, "region")
    csv_p, pq_p = str(tmp_path / "r_csv"), str(tmp_path / "r_pq")
    write_csv(region, csv_p)
    csv_to_parquet(spark, csv_p, pq_p, "r_regionkey BIGINT, r_name STRING")
    back = spark.read.parquet(pq_p)
    assert back.count() == region.count()
    assert dict(back.dtypes)["r_regionkey"] == "bigint"


def test_compact_parquet_small_files(spark, tmp_path, sf_dir):
    """64 tiny appended files compact into the expected even file count
    with the exact same rows."""
    from cartography_spark.sources.formats import compact_parquet
    from cartography_spark.sources.parquet import load_table

    frag = str(tmp_path / "frag")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(64).write.parquet(frag)
    assert len(spark.read.parquet(frag).inputFiles()) == 64

    out = str(tmp_path / "compact")
    n = orders.count()
    n_files = compact_parquet(spark, frag, out, target_rows_per_file=(n + 3) // 4)
    assert n_files == 4
    a = {tuple(r) for r in spark.read.parquet(out).collect()}
    b = {tuple(r) for r in orders.collect()}
    assert a == b
