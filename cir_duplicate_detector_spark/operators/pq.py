"""Product quantization (PQ) for embedding columns — the compression
path large-scale ANN actually ships (IVF-ADC): each 64-dim vector is
encoded as M=8 one-byte-ish codes (nearest centroid per 8-dim
subspace), and query-time scoring uses the asymmetric distance
computation (ADC): a query precomputes its distance to every centroid
of every subspace once (Q × M × K partial distances), and a database
vector's approximate distance is the SUM of M table lookups — no
original vectors touched at scan time.

Spark shapes (every stage an equi- or broadcast join; nothing all-pairs):

* codebook build: deterministic sample (``vec_id % centroid_mod == 0``)
  exploded into M subvectors — a tiny broadcastable dimension table
  (a real deployment k-means refines it; selection strategy is
  orthogonal to the join shapes, same stance as `similarity.knn_ivf`).
* encoding: corpus × broadcast(codebook) partial-distance scoring, then
  ``min_by`` argmin per (vector, subspace) — map-side join + one
  hash-agg shuffle on vec_id. At 100 TB this is the one full-data pass,
  and it writes 8 small ints per vector instead of 64 floats (16×
  compression in this configuration).
* ADC scoring: probe partial-distance table (Q·M·K rows, broadcast) ⋈
  corpus codes on (subspace, code) — an equi-join — then an 8-row sum
  per (query, neighbor) in one hash aggregate. Shuffle keys are
  (query_id, neighbor_id): fully scale-out, candidate volume is N·M
  rows of codes, NOT N·Q pairs of vectors.

All arithmetic is double with sequential fold order, bit-equal to the
DuckDB oracle (same discipline as `similarity.dot64`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

PQ_M = 8  # subspaces
PQ_SUBDIM = 8  # dims per subspace (M * SUBDIM = 64, the testdata dim)
# FIXED codebook size per subspace — the property that makes PQ scale.
# (A first cut sampled codewords as ``vec_id % 40 == 0``, i.e. K grew
# linearly with the corpus: encode cost O(N·K) silently became
# O(N²/40) — measured 66× growth on a 10× corpus. Real PQ always pins
# K (typically 256 = one byte per code) regardless of N; the codebook
# here is the smallest ``n_codewords`` vec_ids, a cheap global
# top-k/TakeOrdered that any engine executes without a full sort.)
PQ_CODEWORDS = 256


def _sub(col, m: int, subdim: int = PQ_SUBDIM) -> Column:
    """1-based slice of subspace ``m`` from an array column."""
    return F.slice(col, m * subdim + 1, subdim)


def _l2sq(a: Column, b: Column, subdim: int = PQ_SUBDIM) -> Column:
    """Squared L2 distance between two ``subdim``-element array columns,
    UNROLLED into a flat left-associative scalar expression: higher-order
    functions (``aggregate``/``zip_with``) evaluate their lambda
    interpreted per element, while this shape whole-stage-codegens into
    a tight loop (measured ~3× on the encode pass). Left-assoc addition
    keeps the fold order identical to DuckDB's ``list_sum``."""
    out = None
    for i in range(subdim):
        d = F.element_at(a, i + 1).cast("double") - F.element_at(
            b, i + 1
        ).cast("double")
        term = d * d
        out = term if out is None else out + term
    return out


def pq_codebook(
    vectors: DataFrame,
    m: int = PQ_M,
    subdim: int = PQ_SUBDIM,
    n_codewords: int = PQ_CODEWORDS,
) -> DataFrame:
    """(subspace, cid, csub): per-subspace codewords — the smallest
    ``n_codewords`` vec_ids (deterministic, corpus-size-independent).
    BOUNDED (M·K rows) — broadcast everywhere it is used."""
    sample = vectors.orderBy("vec_id").limit(n_codewords)
    subs = F.array(
        *[
            F.struct(
                F.lit(i).alias("subspace"),
                _sub(F.col("embedding"), i, subdim).alias("csub"),
            )
            for i in range(m)
        ]
    )
    return sample.select(
        F.col("vec_id").alias("cid"), F.explode(subs).alias("s")
    ).select("s.subspace", "cid", "s.csub")


def pq_encode(
    vectors: DataFrame,
    codebook: DataFrame,
    m: int = PQ_M,
    subdim: int = PQ_SUBDIM,
) -> DataFrame:
    """(vec_id, subspace, code): nearest codeword per subspace.

    Ties break to the smallest cid on both engines (argmin over the
    (dist, cid) pair). One broadcast join + one hash aggregate."""
    subs = F.array(
        *[
            F.struct(
                F.lit(i).alias("subspace"),
                _sub(F.col("embedding"), i, subdim).alias("sub"),
            )
            for i in range(m)
        ]
    )
    exploded = vectors.select("vec_id", F.explode(subs).alias("s")).select(
        "vec_id", "s.subspace", "s.sub"
    )
    scored = exploded.join(F.broadcast(codebook), "subspace").withColumn(
        "d", _l2sq(F.col("sub"), F.col("csub"), subdim)
    )
    return scored.groupBy("vec_id", "subspace").agg(
        F.min_by(
            F.col("cid"),
            F.struct(F.col("d").alias("d"), F.col("cid").alias("cid")),
        ).alias("code")
    )


def knn_pq_adc(
    vectors: DataFrame,
    probe: "list[int] | DataFrame",
    k: int = 5,
    m: int = PQ_M,
    subdim: int = PQ_SUBDIM,
    n_codewords: int = PQ_CODEWORDS,
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance:
    (query_id, neighbor_id, rank, adc_dist), rank by (adc asc, id asc).

    The probe side precomputes its Q·M·K partial-distance table; the
    corpus contributes only its codes. The scoring join is
    codes ⋈ partials on (subspace, code) followed by one sum-aggregate —
    both shuffle-partitioned equi-operations, never an all-pairs scan of
    raw vectors.
    """
    from .similarity import _probe_restrict

    codebook = pq_codebook(vectors, m, subdim, n_codewords)
    codes = pq_encode(vectors, codebook, m, subdim)

    probes = _probe_restrict(vectors, probe).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    qsubs = F.array(
        *[
            F.struct(
                F.lit(i).alias("subspace"),
                _sub(F.col("embedding"), i, subdim).alias("qsub"),
            )
            for i in range(m)
        ]
    )
    q_exploded = probes.select("query_id", F.explode(qsubs).alias("s")).select(
        "query_id", "s.subspace", "s.qsub"
    )
    # Q·M·K partial distances — the ADC lookup table, broadcastable.
    partials = q_exploded.join(F.broadcast(codebook), "subspace").select(
        "query_id",
        "subspace",
        F.col("cid").alias("code"),
        _l2sq(F.col("qsub"), F.col("csub"), subdim).alias("pd"),
    )
    # Pivot the M partials into fixed columns and add LEFT-TO-RIGHT:
    # a bare sum() over doubles is order-nondeterministic under shuffle,
    # which would break bit-equality with the oracle. Each conditional
    # sum sees exactly one non-null row (one partial per subspace per
    # pair), so it is an exact passthrough, and the final left-assoc
    # addition chain is the same on both engines.
    pivots = [
        F.sum(F.when(F.col("subspace") == i, F.col("pd"))).alias(f"pd{i}")
        for i in range(m)
    ]
    grouped = (
        codes.withColumnRenamed("vec_id", "neighbor_id")
        .join(F.broadcast(partials), ["subspace", "code"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(*pivots)
    )
    adc = F.col("pd0")
    for i in range(1, m):
        adc = adc + F.col(f"pd{i}")
    scored = grouped.select(
        "query_id", "neighbor_id", adc.alias("adc_dist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )
