"""Parquet table loaders for the driver's synthetic star schema.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier
part orders lineitem events documents embeddings — one parquet each
under ``{sf_dir}/{name}.parquet``.

Plain ``spark.read.parquet`` is the whole source layer: Catalyst gets
predicate pushdown, column pruning and (on a partitioned layout)
partition pruning for free.  At 100 TB the same call reads a
date/key-partitioned parquet lake; nothing here changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should broadcast in joins.  At larger SF
# customer stops being broadcastable; region/nation always are.
DIM_TABLES = ("region", "nation", "supplier")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    reader rejects by default (PARQUET_TYPE_ILLEGAL).  Read nanos as long
    and truncate to microsecond timestamps — the same ns→µs truncation
    DuckDB applies, so oracle comparisons agree.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    # Integer division: ns epoch ≈ 1.7e18 exceeds double's 2^53 mantissa,
    # so a float divide here would corrupt the microsecond digit.
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL-authored plans)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
