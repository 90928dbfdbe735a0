"""Parquet sources for the driver testdata star schema (TESTDATA.md).

The testdata parquet stores timestamps as INT64 TIMESTAMP(NANOS), which
Spark's parquet reader rejects unless
``spark.sql.legacy.parquet.nanosAsLong=true`` (set by
:mod:`..session`). Tables whose nanos columns arrive as raw longs get an
explicit ``*_us`` microsecond column so timestamp logic matches DuckDB,
which truncates the same nanos to microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = [
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
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts arrives as raw nanos (long); expose microseconds + timestamp.
        # Integer div, NOT `/`: double division loses precision on
        # epoch-nano magnitudes (> 2^53) and lands a microsecond off.
        df = df.withColumn("ts_us", F.expr("ts div 1000")).withColumn(
            "ts_ts", F.timestamp_micros(F.col("ts_us"))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
