"""Lloyd k-means over an embedding column — the clustering primitive
behind corpus curation (topic balancing, SemDeDup-style semantic dedup
with LEARNED centroids instead of hashed ones, diversity sampling).

Engine-reproducible by construction, which is the hard part of putting
an iterative float algorithm behind a value-hash oracle:

* **Deterministic init**: the k seed centroids are the embeddings of
  the k vectors with the smallest seeded 60-bit hash (ties by vec_id)
  — a stable pseudo-random sample, no RNG state.
* **Assignment**: squared-L2 distance is a per-row sequential fold
  (``F.aggregate`` over ``zip_with`` == DuckDB ``list_sum`` over
  ``list_transform`` — the fold-order equivalence the knn oracles
  already pin). Argmin tie-breaks on the lower cluster id.
* **Centroid update**: the mean's SUM is the one place a naive
  implementation goes non-deterministic (shuffle reordering changes
  double accumulation order). Here it is a TWO-PHASE SORTED FOLD:
  members salt into ``KM_SALTS`` sub-buckets, each sub-bucket folds
  its values in vec_id order, then the per-salt partials fold in salt
  order — a fixed association tree, so the double result is identical
  on every engine and every partitioning, and per-task list state is
  bounded by members/(k·KM_SALTS), not by corpus size. (Same pattern
  as the KMV phase-1 bottom-k.) With the recommended k ≈ √N scaling
  the per-cell fold stays ~√N/KM_SALTS — bounded growth; a pipeline
  that does not need bit-reproducibility can swap phase 1 for a plain
  ``sum`` and keep the identical plan shape minus the sorts.

Iterations are a fixed, unrolled count (default 3): each round is one
broadcast-join assignment pass + one two-shuffle mean — no driver-side
loop state beyond plan construction, mirroring `dedup.connected_
components`' iterate-then-materialize discipline for longer runs.

Empty clusters (a centroid losing every member) simply drop out of the
next round's centroid table on both engines — deterministic, and with
hash-sampled seeds over real data essentially only reachable with
adversarial inputs.

Scale boundary: assignment is a broadcast cross join, so the centroid
table must fit executor memory — fine up to k ~ 10^5 (64-dim doubles ≈
50 MB). Past that (k ≈ √N at trillion-row corpora) the assignment pass
itself needs candidate pruning: run THIS operator on a hash-sampled
subset to learn coarse centroids, then assign the full corpus through
the IVF path (`similarity.ivf_*`) whose bucketed join never broadcasts
the fine centroids. The fold/mean machinery here is unchanged by that
composition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.text import hash60

KM_K = 8
KM_ITERS = 3
KM_SALTS = 16


def _sq_dist(e: Column, c: Column) -> Column:
    """Sequential-fold squared L2 — fold order matches DuckDB's
    ``list_sum(list_transform(...))`` bit for bit."""
    return F.aggregate(
        F.zip_with(e, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sorted_fold(items: Column, field: str) -> Column:
    """Fold ``struct`` array ``items`` (pre-sorted) summing ``field``
    sequentially — the deterministic double accumulator."""
    return F.aggregate(
        F.array_sort(items), F.lit(0.0), lambda acc, s: acc + s[field]
    )


def kmeans_assign(
    embs: DataFrame,
    k: int = KM_K,
    iters: int = KM_ITERS,
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iters`` Lloyd rounds; returns ``(vec_id, cluster, d)``
    with ``d`` the final squared distance to the assigned centroid."""
    e = embs.select(
        "vec_id", F.col(vec_col).cast("array<double>").alias("e")
    )
    h = hash60(F.col("vec_id").cast("string"), seed="km")
    # Distributed top-k for the seeds (TakeOrderedAndProject — each
    # partition contributes its local k, the driver merges k·parts
    # rows), NOT a global row_number window, which would funnel the
    # whole table through one task. The row_number that assigns
    # cluster ids then runs over the k-row seed set only.
    w_seed = Window.orderBy("h", "vec_id")
    cents = F.broadcast(
        e.withColumn("h", h)
        .orderBy("h", "vec_id")
        .limit(k)
        .withColumn("rn", F.row_number().over(w_seed))
        .select(
            (F.col("rn") - 1).cast("bigint").alias("cluster"),
            F.col("e").alias("c"),
        )
    )
    for _ in range(iters):
        scored = e.crossJoin(cents).select(
            "vec_id",
            "cluster",
            _sq_dist(F.col("e"), F.col("c")).alias("d"),
        )
        best = scored.groupBy("vec_id").agg(
            F.min(F.struct("d", "cluster")).alias("m")
        )
        members = e.join(
            best.select("vec_id", F.col("m.cluster").alias("cluster")),
            "vec_id",
        )
        pe = members.select(
            "vec_id", "cluster", F.posexplode("e").alias("pos", "val")
        )
        p1 = (
            pe.withColumn("salt", F.pmod(F.col("vec_id"), F.lit(KM_SALTS)))
            .groupBy("cluster", "pos", "salt")
            .agg(
                _sorted_fold(
                    F.collect_list(F.struct("vec_id", "val")), "val"
                ).alias("psum"),
                F.count("*").alias("pn"),
            )
        )
        p2 = p1.groupBy("cluster", "pos").agg(
            _sorted_fold(
                F.collect_list(F.struct("salt", "psum")), "psum"
            ).alias("s"),
            F.sum("pn").alias("n"),
        )
        cents = F.broadcast(
            p2.withColumn("cval", F.col("s") / F.col("n"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                    lambda s: s["cval"],
                ).alias("c")
            )
        )
    final = e.crossJoin(cents).select(
        "vec_id", "cluster", _sq_dist(F.col("e"), F.col("c")).alias("d")
    )
    return final.groupBy("vec_id").agg(
        F.min(F.struct("d", "cluster")).alias("m")
    ).select(
        "vec_id",
        F.col("m.cluster").alias("cluster"),
        F.col("m.d").alias("d"),
    )
