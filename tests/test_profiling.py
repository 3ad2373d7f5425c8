"""Hand-checkable semantics for profiling, z-order, and BFS."""

from __future__ import annotations

from pyspark.sql import functions as F

from cartography_spark.operators.graph import bfs_distances
from cartography_spark.operators.profiling import profile_table, zorder_key, zorder_sql


def test_zorder_known_values(spark):
    # z(1,0)=1 (bit0 of x -> pos0), z(0,1)=2 (bit0 of y -> pos1),
    # z(3,3)=15, z(2,0)=4.
    df = spark.createDataFrame([(1, 0), (0, 1), (3, 3), (2, 0)], "x LONG, y LONG")
    got = [r.z for r in df.select(zorder_key("x", "y").alias("z")).collect()]
    assert got == [1, 2, 15, 4]


def test_zorder_sql_matches_column_form(spark):
    """The ANSI/DuckDB arithmetic form (what oracles run) must be
    bit-identical to the Spark column form."""
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame({"x": list(range(64)), "y": [(i * 7) % 100 for i in range(64)]})
    via_sql = duckdb.sql(
        f"SELECT {zorder_sql('x', 'y')} AS z FROM pdf ORDER BY x"
    ).fetchall()
    df = spark.createDataFrame(pdf.astype("int64"), "x LONG, y LONG")
    via_col = df.orderBy("x").select(zorder_key("x", "y").alias("z")).collect()
    assert [r[0] for r in via_sql] == [r.z for r in via_col]


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], "k LONG, s STRING"
    )
    prof = {r.col_name: r for r in profile_table(df, ["k"], ["s"]).collect()}
    assert prof["k"].n_nulls == 1 and prof["k"].n_distinct == 2
    assert prof["k"].min_num == 1.0 and prof["k"].max_num == 2.0
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2
    assert prof["s"].min_str == "a" and prof["s"].max_str == "b"


def test_bfs_levels_on_path(spark):
    # Directed path 1->2->3->4 plus shortcut 1->3: distances 0,1,1,2.
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (1, 3)], "src LONG, dst LONG")
    got = {r.node: r.distance for r in bfs_distances(e, source=1).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}


def test_bfs_depth_cap(spark):
    e = spark.createDataFrame([(i, i + 1) for i in range(10)], "src LONG, dst LONG")
    got = bfs_distances(e, source=0, max_depth=3).collect()
    assert max(r.distance for r in got) == 3 and len(got) == 4


def test_mad_outlier_hand_computed(spark):
    """Lower medians and the 3*MAD gate on a tiny group: values 1..5
    plus an extreme 1000 — the z-score would move with the outlier, the
    median/MAD threshold does not."""
    from cartography_spark.operators.profiling import mad_outlier_stats

    rows = [("A", v) for v in (1.0, 2.0, 3.0, 4.0, 5.0, 1000.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mad_outlier_stats(df, "g", "v").collect()[0]
    # cents: 100..500, 100000; lower median of 6 = 3rd value = 300
    # devs: 200,100,0,100,200,99700 -> sorted 0,100,100,200,200,99700; lower med = 100
    # 3*MAD = 300: only the 99700 deviation exceeds it
    assert (r.g, r.n, r.med_cents, r.mad_cents, r.n_outliers) == ("A", 6, 300, 100, 1)
