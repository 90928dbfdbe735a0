"""Skew mitigation: salted equi-join.

AQE's skew-join splitting (enabled in ``session.RECOMMENDED_CONFS``)
handles most runtime skew; salting is the explicit tool for the cases
AQE cannot fix — a broadcast-ineligible build side whose single hot key
exceeds one task's memory. Salting trades key-cardinality for balance:
the skewed side scatters each key over ``num_salts`` sub-keys, the
other side replicates each row ``num_salts`` times, and the join runs
on ``(key, salt)`` — every sub-partition bounded at 1/num_salts of the
hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_COL = "__salt__"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed`` with ``other`` on column ``on``, scattering
    the skewed side over ``num_salts`` salted sub-keys.

    The salt is a deterministic hash of the skewed side's full row
    (``xxhash64`` over all columns), so repeated runs produce identical
    partitioning — no RNG, replay-safe. ``other`` is exploded
    ``num_salts``× which assumes it is the smaller side (the usual shape:
    a dimension too big to broadcast, a fact with hot keys).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted = skewed.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(num_salts)),
    )
    replicated = other.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<bigint>")),
    )
    return salted.join(replicated, [on, SALT_COL], how).drop(SALT_COL)
