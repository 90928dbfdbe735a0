"""Salted-join correctness + partitioning shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from cir_duplicate_detector_spark.operators.skew import SALT_COL, salted_join


def test_salted_join_matches_plain_join(spark):
    # 50k rows, 90% on one hot key.
    skewed = spark.range(50_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
    )
    got = salted_join(skewed, dim, "k", num_salts=8)
    want = skewed.join(dim, "k")
    assert got.count() == want.count()
    assert (
        got.agg(F.sum("payload"), F.sum("dim_val")).collect()
        == want.agg(F.sum("payload"), F.sum("dim_val")).collect()
    )
    assert SALT_COL not in got.columns


def test_salted_join_partitions_by_key_and_salt(spark):
    skewed = spark.range(1000).select(
        F.lit(1).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(5).select(F.col("id").alias("k"))
    plan = (
        salted_join(skewed, dim, "k", num_salts=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # The join key must include the salt so the hot key spreads.
    assert SALT_COL in plan


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.range(10).select(F.col("id").alias("k"))
    right = spark.range(3).select(F.col("id").alias("k"), F.lit(1).alias("r"))
    got = salted_join(left, right, "k", num_salts=4, how="left")
    assert got.count() == 10
    assert got.where(F.col("r").isNull()).count() == 7
