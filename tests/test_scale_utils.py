"""Scale utilities: salted join equivalence, bucketed join shuffle-freedom."""

from __future__ import annotations

from pyspark.sql import functions as F

from aind_smartspim_data_transformation_spark.operators.scale_utils import (
    read_bucketed_join,
    salted_join,
    write_bucketed,
)


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(o, "l_orderkey")
    salted = salted_join(li, o, "l_orderkey", n_salts=4)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    # one pathological key (90% of rows) + uniform tail
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(100).select(F.col("id").alias("k"), F.lit("dim").alias("tag"))
    out = salted_join(left, right, "k", n_salts=8)
    # hot key k=1 matched: 9000 rows survive exactly once each
    assert out.filter("k = 1").count() == 9_000
    assert out.count() == left.join(right, "k").count()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    try:
        write_bucketed(li, "t_li_bucketed", "l_orderkey", n_buckets=4)
        write_bucketed(o, "t_o_bucketed", "l_orderkey", n_buckets=4)
        joined = read_bucketed_join(
            spark, "t_li_bucketed", "t_o_bucketed", "l_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing carries the partitioning
        # and the result is the same as the plain join
        assert joined.count() == li.join(o, "l_orderkey").count()
    finally:
        # tables live in the session warehouse (./spark-warehouse under
        # the repo cwd) — drop them and remove the directory.
        import shutil
        from pathlib import Path

        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_o_bucketed")
        shutil.rmtree(Path("spark-warehouse"), ignore_errors=True)
