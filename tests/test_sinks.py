"""Sink layout tests: partition pruning and shuffle-free bucketed joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from cir_duplicate_detector_spark.sources import sinks


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.range(1000).withColumn("bucket", (F.col("id") % 4).cast("int"))
    out = str(tmp_path / "part")
    sinks.write_partitioned(df, out, partition_by=("bucket",))
    back = spark.read.parquet(out)
    assert back.count() == 1000
    pruned = back.where(F.col("bucket") == 2)
    assert pruned.count() == 250
    # Partition filter must reach the scan as a partition filter, not a
    # data filter.
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    left = spark.range(10_000).withColumn("v", F.col("id") * 2)
    right = spark.range(10_000).withColumn("w", F.col("id") * 3)
    for name, df in (("bkt_left", left), ("bkt_right", right)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        sinks.write_bucketed(
            df, name, str(tmp_path / name), ("id",), 8, sort_cols=("id",)
        )
    l = sinks.read_table(spark, "bkt_left")
    r = sinks.read_table(spark, "bkt_right")
    joined = l.join(r, "id")
    assert joined.count() == 10_000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # Same bucketing on both sides: the join must not re-shuffle.
    assert "Exchange hashpartitioning" not in plan
