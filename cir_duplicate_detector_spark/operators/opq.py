"""OPQ-lite: a sample-learned DIMENSION PERMUTATION that balances
per-subspace energy ahead of product quantization — the conditional
upgrade the IVF-PQ recall story has carried since round 9.

Full Optimized Product Quantization learns an arbitrary rotation R by
alternating SVD with codebook training (Ge et al., CVPR 2013); the
rotation's eigendecompositions are not bit-reproducible across
engines, which this repo treats as disqualifying for an oracle-checked
operator. The standard cheap variant — and the one the round-9/10
verdicts scoped — is a PERMUTATION (a special orthogonal matrix):
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


def opq_assignment(
    vectors: DataFrame,
    m: int = IVFPQ_M,
    subdim: int = IVFPQ_SUBDIM,
    sample_mod: int = KM_IVF_SAMPLE_MOD,
    vec_col: str = "embedding",
) -> DataFrame:
    """(pos, energy, subspace, newpos): the balanced snake-deal of
    energy-ranked dimensions onto ``m`` subspaces. ``newpos =
    subspace·subdim + block`` is a bijection on 0..m·subdim−1 (each
    deal round fills one slot of every subspace). The rank window runs
    over the m·subdim-row energy frame only — never the corpus."""
    en = dim_energy(vectors, sample_mod, vec_col)
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
) -> DataFrame:
    """ONE-ROW frame ``(perm: array<bigint>)``: 1-based source position
    for each destination slot (``perm[newpos+1] = pos+1``), ready for
    ``element_at``. Broadcastable by construction (m·subdim entries)."""
    asg = opq_assignment(vectors, m, subdim, sample_mod, vec_col)
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
) -> DataFrame:
    """ONE-ROW frame ``(e_max, e_min, ratio)``: per-subspace energy
    under PQ's IDENTITY dimension layout, rolled up to the max/min
    subspace and their ratio — the gate statistic
    ``build_ivf_pq_index(opq="auto")`` evaluates (round 13, VERDICT
    r12 item 5). On a balanced corpus ratio ≈ 1; when a few dimensions
    dominate, the subspace holding them dwarfs the rest and the ratio
    explodes (the skewed A/B corpus measures ≫ the 4× threshold).
    Sorted-fold doubles throughout, so the registered `opq_auto_gate`
    row is value-hash exact against DuckDB."""
    en = dim_energy(vectors, sample_mod, vec_col)
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
