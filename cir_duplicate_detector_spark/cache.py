"""Deterministic lifetime control for materialized intermediates.

Iterative / multi-branch operators (`dedup.minhash_near_duplicates`,
`dedup.connected_components`) truncate lineage with ``localCheckpoint``.
The checkpoint blocks are reclaimed by Spark's ContextCleaner only when
the Python plan objects are garbage-collected, so a long-lived session
that invokes those operators repeatedly (a bench loop, a notebook)
accumulates storage blocks and the GC pressure bleeds into every
subsequent query (round-2 finding: timings inflated 3-30x).

:func:`materialize` is the single chokepoint those operators use to cut
lineage — it dispatches to driver-local or durable checkpointing — and
:func:`release_cached` frees everything a finished invocation left
behind (cached relations + every persisted RDD, which is where
``localCheckpoint`` blocks live).

Safety: ``release_cached`` unpersists ALL persisted RDDs in the
session. Call it only when no still-live DataFrame depends on a
truncated-lineage checkpoint (a localCheckpointed plan cannot recompute
its blocks). Between independent queries — the bench loop, a pipeline
stage boundary — that is exactly the right time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def materialize(
    df: DataFrame, checkpoint_dir: str | None = None
) -> DataFrame:
    """Cut lineage by materializing ``df`` once.

    ``checkpoint_dir=None`` → ``localCheckpoint`` (executor-local
    blocks; right for single-app sessions and iterative drivers).
    Otherwise → durable ``checkpoint`` to ``checkpoint_dir`` (survives
    executor loss; the right choice for long connected-components runs
    on a real cluster, where losing one executor's blocks would
    otherwise restart the whole iteration history).
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() != checkpoint_dir:
        sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)


def release_cached(spark: SparkSession, gc: bool = True) -> int:
    """Free every cached relation and persisted RDD (including
    ``localCheckpoint`` blocks) in the session; returns the number of
    RDDs unpersisted. With ``gc=True`` (default) also asks the JVM for
    a GC pass so freed blocks leave the old generation instead of
    lingering as pressure — a 1-3 s stop on a large heap, so tight
    loops may sweep with ``gc=False`` and trigger a full pass
    periodically.
    """
    spark.catalog.clearCache()
    sc = spark.sparkContext
    # py4j auto-converts the java.util.Map to a Python mapping whose
    # values are JavaRDD handles; snapshot before unpersisting.
    rdds = list(sc._jsc.getPersistentRDDs().values())
    for jrdd in rdds:
        jrdd.unpersist()
    if gc:
        sc._jvm.System.gc()
    return len(rdds)
