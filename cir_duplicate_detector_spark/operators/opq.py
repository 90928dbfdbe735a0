"""OPQ-lite: a sample-learned DIMENSION PERMUTATION that balances
per-subspace energy ahead of product quantization — the conditional
upgrade the IVF-PQ recall story has carried since round 9.

Full Optimized Product Quantization learns an arbitrary rotation R by
alternating SVD with codebook training (Ge et al., CVPR 2013); the
rotation's eigendecompositions are not bit-reproducible across
engines, which this repo treats as disqualifying for an oracle-checked
operator. As of round 13 the full rotation EXISTS here as a library
operator (:func:`learn_rotation` / :func:`apply_rotation`, bottom of
this module) with unit-test evidence in place of a value-hash row;
the oracle-checkable workhorse remains the PERMUTATION (a special
orthogonal matrix):
reassign dimensions to subspaces so each subspace carries a balanced
share of the corpus energy. When a few dimensions dominate, vanilla
PQ wastes whole subspaces on near-constant coordinates; balancing is
where most of OPQ's win comes from on skewed embeddings (the natural /
pre-rotation baseline in the OPQ paper's own ablation).

Everything here is engine-reproducible by the repo's established
discipline:

* **Energy** (per-dimension sum of squares over the deterministic
  ``vec_id % sample_mod`` sample) folds with the two-phase sorted fold
  (`kmeans._sorted_fold`): salt sub-buckets fold in vec_id order,
  per-salt partials fold in salt order — bit-equal doubles on any
  partitioning and on DuckDB.
* **Assignment** ranks dimensions by (energy DESC, pos ASC) and deals
  them to subspaces in SNAKE order (subspace ``within`` on even deal
  rounds, ``m-1-within`` on odd), so each subspace receives one
  dimension from each energy block — the balanced allocation.
* **Application** stays lazy and per-row: the permutation rides as a
  ONE-ROW broadcast array and vectors re-order through
  ``transform(sequence(...), i -> element_at(e, element_at(perm, i)))``
  — no collect, no driver round-trip, no shuffle.

On the synthetic testdata's ~isotropic unit vectors the permutation is
measured ~neutral (energies are flat — the registered `opq_balance`
diagnostic shows before/after ratios near 1), which is exactly why the
shipped IVF-PQ config does NOT wire it in: the recall sweeps showed
the candidate ceiling, not subspace allocation, binds on this corpus
(recall@5 0.91, `pq.IVFPQ_M` table). The conditional path stays one
line — permute vectors (and query residuals) with
:func:`apply_permutation` before `pq.pq_codebook_learned` /
`pq.pq_encode` — and the planted-skew unit test proves the machinery
does its job when a corpus finally needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .kmeans import KM_IVF_SAMPLE_MOD, KM_SALTS, _sorted_fold
from .pq import IVFPQ_M, IVFPQ_SUBDIM

OPQ_DIM = 64  # corpus embedding width (the oracles' range(1, 65))


def dim_energy(
    vectors: DataFrame,
    sample_mod: int = KM_IVF_SAMPLE_MOD,
    vec_col: str = "embedding",
) -> DataFrame:
    """(pos, energy): per-dimension sum of squares over the
    deterministic sample — 0-based ``pos``, two-phase sorted-fold
    doubles (bit-equal across engines/partitionings)."""
    e = vectors.select(
        "vec_id", F.col(vec_col).cast("array<double>").alias("e")
    )
    sample = e.where(F.col("vec_id") % sample_mod == 0)
    v2 = sample.select(
        "vec_id", F.posexplode("e").alias("pos", "val")
    ).select("vec_id", "pos", (F.col("val") * F.col("val")).alias("v2"))
    p1 = (
        v2.withColumn("salt", F.pmod(F.col("vec_id"), F.lit(KM_SALTS)))
        .groupBy("pos", "salt")
        .agg(
            _sorted_fold(
                F.collect_list(F.struct("vec_id", "v2")), "v2"
            ).alias("psum")
        )
    )
    return p1.groupBy("pos").agg(
        _sorted_fold(F.collect_list(F.struct("salt", "psum")), "psum").alias(
            "energy"
        )
    )


def _checked_energy(
    vectors: DataFrame,
    sample_mod: int,
    vec_col: str,
    energy: "DataFrame | None",
) -> DataFrame:
    """``energy=None`` → compute :func:`dim_energy`; otherwise validate
    and reuse the caller's prebuilt (pos, energy) frame — the round-15
    share that lets ``build_ivf_pq_index(opq="auto")`` evaluate the
    gate statistic AND learn the permutation from ONE energy
    aggregation instead of re-running the sample scan per consumer
    (guide §1.2). The schema guard is the ADVICE r14 prebuilt-table
    discipline: a mismatched artifact fails loudly at the boundary."""
    if energy is None:
        return dim_energy(vectors, sample_mod, vec_col)
    missing = {"pos", "energy"} - set(energy.columns)
    if missing:
        raise ValueError(
            "prebuilt energy frame must carry (pos, energy) columns; "
            f"missing {sorted(missing)} in {energy.columns}"
        )
    return energy


def opq_assignment(
    vectors: DataFrame,
    m: int = IVFPQ_M,
    subdim: int = IVFPQ_SUBDIM,
    sample_mod: int = KM_IVF_SAMPLE_MOD,
    vec_col: str = "embedding",
    energy: "DataFrame | None" = None,
) -> DataFrame:
    """(pos, energy, subspace, newpos): the balanced snake-deal of
    energy-ranked dimensions onto ``m`` subspaces. ``newpos =
    subspace·subdim + block`` is a bijection on 0..m·subdim−1 (each
    deal round fills one slot of every subspace). The rank window runs
    over the m·subdim-row energy frame only — never the corpus.
    ``energy`` (optional) supplies a prebuilt :func:`dim_energy` frame
    so multi-consumer builds aggregate the sample once."""
    en = _checked_energy(vectors, sample_mod, vec_col, energy)
    w = Window.orderBy(F.col("energy").desc(), F.col("pos").asc())
    r = F.row_number().over(w) - 1
    ranked = en.withColumn("r", r.cast("bigint"))
    block = (F.col("r") / m).cast("bigint")  # deal round, 0..subdim-1
    within = F.col("r") % m
    subspace = F.when(block % 2 == 0, within).otherwise(m - 1 - within)
    return (
        ranked.withColumn("subspace", subspace.cast("bigint"))
        .withColumn("block", block)
        .withColumn(
            "newpos",
            (F.col("subspace") * subdim + F.col("block")).cast("bigint"),
        )
        .select("pos", "energy", "subspace", "newpos")
    )


def opq_permutation(
    vectors: DataFrame,
    m: int = IVFPQ_M,
    subdim: int = IVFPQ_SUBDIM,
    sample_mod: int = KM_IVF_SAMPLE_MOD,
    vec_col: str = "embedding",
    energy: "DataFrame | None" = None,
) -> DataFrame:
    """ONE-ROW frame ``(perm: array<bigint>)``: 1-based source position
    for each destination slot (``perm[newpos+1] = pos+1``), ready for
    ``element_at``. Broadcastable by construction (m·subdim entries).
    ``energy`` (optional) reuses a prebuilt :func:`dim_energy` frame."""
    asg = opq_assignment(vectors, m, subdim, sample_mod, vec_col, energy)
    return asg.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("newpos", "pos"))),
            lambda s: s["pos"] + 1,
        ).alias("perm")
    )


def opq_subspace_imbalance(
    vectors: DataFrame,
    m: int = IVFPQ_M,
    subdim: int = IVFPQ_SUBDIM,
    sample_mod: int = KM_IVF_SAMPLE_MOD,
    vec_col: str = "embedding",
    energy: "DataFrame | None" = None,
) -> DataFrame:
    """ONE-ROW frame ``(e_max, e_min, ratio)``: per-subspace energy
    under PQ's IDENTITY dimension layout, rolled up to the max/min
    subspace and their ratio — the gate statistic
    ``build_ivf_pq_index(opq="auto")`` evaluates (round 13, VERDICT
    r12 item 5). On a balanced corpus ratio ≈ 1; when a few dimensions
    dominate, the subspace holding them dwarfs the rest and the ratio
    explodes (the skewed A/B corpus measures ≫ the 4× threshold).
    Sorted-fold doubles throughout, so the registered `opq_auto_gate`
    row is value-hash exact against DuckDB. ``energy`` (optional)
    reuses a prebuilt :func:`dim_energy` frame."""
    en = _checked_energy(vectors, sample_mod, vec_col, energy)
    sub = (F.col("pos") / subdim).cast("bigint")
    per_sub = (
        en.withColumn("subspace", sub)
        .groupBy("subspace")
        .agg(
            _sorted_fold(
                F.collect_list(F.struct("pos", "energy")), "energy"
            ).alias("e_sub")
        )
    )
    return per_sub.groupBy().agg(
        F.max("e_sub").alias("e_max"), F.min("e_sub").alias("e_min")
    ).select(
        "e_max",
        "e_min",
        (F.col("e_max") / F.col("e_min")).alias("ratio"),
    )


def apply_permutation(
    vectors: DataFrame,
    perm: DataFrame,
    vec_col: str = "embedding",
    d: int = OPQ_DIM,
) -> DataFrame:
    """Re-order ``vec_col`` by the one-row broadcast ``perm`` — a pure
    per-row projection (no shuffle, no Python): the conditional step a
    skew-regressed corpus slots in front of `pq.pq_codebook_learned` /
    `pq.pq_encode` (queries permute identically, refine-by-true-L2 is
    unaffected)."""
    out = vectors.crossJoin(F.broadcast(perm))
    permuted = F.transform(
        F.sequence(F.lit(1), F.lit(d)),
        lambda i: F.element_at(
            F.col(vec_col), F.element_at(F.col("perm"), i).cast("int")
        ),
    )
    # Fail loudly on a malformed permutation (ADVICE r11): if the
    # learning sample matched no vectors, `opq_permutation`'s global
    # agg yields one row with an EMPTY perm, and non-ANSI element_at
    # would silently turn every embedding into an array of NULLs.
    guarded = F.when(F.size("perm") == d, permuted).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"apply_permutation: perm length != d={d} (got "),
                F.size("perm").cast("string"),
                F.lit("); was the learning sample empty?"),
            )
        )
    )
    return out.withColumn(vec_col, guarded).drop("perm")


# ---------------------------------------------------------------------------
# Full OPQ rotation (round 13, VERDICT r12 stretch item 8).
#
# The permutation above is the oracle-checkable half of OPQ; the FULL
# method learns an arbitrary orthogonal rotation R by alternating
# per-subspace codebook training with an orthogonal-Procrustes update
# (Ge et al., CVPR 2013, "OPQ-NP"). The Procrustes step is an SVD —
# not bit-reproducible across engines — so the rotation is shipped as
# a LIBRARY OPERATOR with unit-test evidence (distortion trace,
# orthogonality, end-to-end index identity) rather than a registered
# value-hash row; the module docstring's stance stands, now with the
# capability present instead of scoped out.
#
# Scale posture: the learn collects a BOUNDED deterministic sample
# (the `pq.PQ_CODEWORDS` stance — smallest `sample` vec_ids of the
# mod-sample; constant size regardless of corpus), runs numpy on a
# ≤ sample×d matrix driver-side (milliseconds), and application is a
# per-row broadcast matrix multiply — the corpus pays one projection
# pass at build/probe time and nothing is ever all-pairs.
# ---------------------------------------------------------------------------

OPQ_ROT_SAMPLE = 512  # bounded driver-side learn sample (rows)
OPQ_ROT_ITERS = 8  # alternating codebook/Procrustes rounds
OPQ_ROT_CODEWORDS = 32  # per-subspace Lloyd k during the learn


def learn_rotation(
    vectors: DataFrame,
    m: int = IVFPQ_M,
    subdim: int = IVFPQ_SUBDIM,
    iters: int = OPQ_ROT_ITERS,
    n_codewords: int = OPQ_ROT_CODEWORDS,
    sample: int = OPQ_ROT_SAMPLE,
    sample_mod: int = KM_IVF_SAMPLE_MOD,
    vec_col: str = "embedding",
    return_trace: bool = False,
):
    """ONE-ROW frame ``(rot: array<array<double>>)``: a learned d×d
    orthogonal rotation, ``y = x @ R`` (``y[i] = Σ_j x[j]·R[j][i]``),
    minimizing PQ quantization distortion on the sample.

    OPQ-NP alternation, fully deterministic (no RNG anywhere):

    * R₀ = the balanced snake-deal permutation matrix (the same
      assignment rule as :func:`opq_assignment`, computed on the numpy
      sample) — the natural init per the OPQ paper's own ablation;
    * codebook step: per-subspace Lloyd on ``X @ R`` with centroids
      seeded from the first ``n_codewords`` sample rows in vec_id
      order (ties/empties keep their previous centroid);
    * rotation step: orthogonal Procrustes — SVD of ``Xᵀ X̂`` where
      ``X̂`` is the quantized reconstruction; ``R = U Vᵀ``.

    ``return_trace=True`` additionally returns the per-iteration mean
    squared distortion list (head = the permutation baseline), the
    evidence the A/B unit test pins.
    """
    import numpy as np

    spark = vectors.sparkSession
    d = m * subdim
    rows = (
        vectors.where(F.col("vec_id") % sample_mod == 0)
        .select("vec_id", F.col(vec_col).cast("array<double>").alias("e"))
        .orderBy("vec_id")
        .limit(sample)
        # Bounded ≤`sample` rows — a config constant, not a corpus
        # fraction; the FAISS-style host-side OPQ train.
        .collect()  # hygiene: allow-collect (bounded learn sample)
    )
    if not rows:
        raise ValueError(
            "learn_rotation: empty learning sample "
            f"(vec_id % {sample_mod} == 0 matched no rows)"
        )
    X = np.asarray([r["e"] for r in rows], dtype=np.float64)
    if X.shape[1] != d:
        raise ValueError(
            f"learn_rotation: vectors have {X.shape[1]} dims, config "
            f"m*subdim = {d}"
        )

    # R0: balanced permutation matrix from the snake-deal rule.
    energy = (X * X).sum(axis=0)
    order = sorted(range(d), key=lambda p: (-energy[p], p))
    R = np.zeros((d, d))
    for r, pos in enumerate(order):
        block, within = divmod(r, m)
        sub = within if block % 2 == 0 else m - 1 - within
        R[pos, sub * subdim + block] = 1.0

    def quantize(Z):
        """Per-subspace deterministic Lloyd; returns reconstruction."""
        Zhat = np.empty_like(Z)
        for s in range(m):
            blk = Z[:, s * subdim : (s + 1) * subdim]
            k = min(n_codewords, blk.shape[0])
            cents = blk[:k].copy()  # vec_id-order seed, no RNG
            for _ in range(2):
                d2 = ((blk[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
                a = d2.argmin(1)
                for c in range(k):
                    mask = a == c
                    if mask.any():
                        cents[c] = blk[mask].mean(0)
            d2 = ((blk[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            Zhat[:, s * subdim : (s + 1) * subdim] = cents[d2.argmin(1)]
        return Zhat

    trace = []
    for _ in range(iters):
        Z = X @ R
        Zhat = quantize(Z)
        trace.append(float(((Z - Zhat) ** 2).sum(1).mean()))
        U, _, Vt = np.linalg.svd(X.T @ Zhat)
        R = U @ Vt
    Z = X @ R
    trace.append(float(((Z - quantize(Z)) ** 2).sum(1).mean()))

    rot_df = spark.createDataFrame(
        [(R.tolist(),)], "rot array<array<double>>"
    )
    return (rot_df, trace) if return_trace else rot_df


def apply_rotation(
    vectors: DataFrame,
    rot: DataFrame,
    vec_col: str = "embedding",
    d: int = OPQ_DIM,
) -> DataFrame:
    """Project ``vec_col`` through the one-row broadcast rotation —
    ``y[i] = Σ_j x[j]·rot[j][i]`` (row-vector ``x @ R``), a pure
    per-row projection (no shuffle, no Python at run time). The
    zip_with/aggregate lambdas evaluate interpreted, so this is a
    build/probe-time pass, not a serving hot path — the same posture
    as `pq.pq_encode`'s one full-data pass."""
    out = vectors.crossJoin(F.broadcast(rot))
    x = F.col(vec_col).cast("array<double>")
    rotated = F.transform(
        F.sequence(F.lit(1), F.lit(d)),
        lambda i: F.aggregate(
            F.zip_with(
                x,
                F.col("rot"),
                lambda xj, rowj: xj * F.element_at(rowj, i),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    guarded = F.when(F.size("rot") == d, rotated).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"apply_rotation: rot is not {d}x{d} (got "),
                F.size("rot").cast("string"),
                F.lit(" rows); was the learning sample empty?"),
            )
        )
    )
    return out.withColumn(vec_col, guarded).drop("rot")
