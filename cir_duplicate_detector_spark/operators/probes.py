"""Probe-set normalization: ``indexes_to_check`` as list OR DataFrame.

The reference API takes a Python list (``url.py:42``, ``pdq_hash.py:99``)
and both operators here accept that unchanged — a small list embeds as a
plan literal, which is the cheapest shape for the reference's
interactive probe sizes. At cluster scale a probe set can itself be the
output of a query (millions of ids); a driver-side literal list then
bloats the plan and serializes through the driver. For that case both
operators also accept a DataFrame, which joins as a broadcast semi-join
— distributed end to end, no driver round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def probe_column_frame(probe: DataFrame) -> DataFrame:
    """Normalize a probe DataFrame to one distinct string ``index`` column.

    Accepts a frame with an ``index`` column, or any single-column frame
    (the column is taken as the probe ids).
    """
    if "index" in probe.columns:
        col = "index"
    elif len(probe.columns) == 1:
        col = probe.columns[0]
    else:
        raise ValueError(
            "probe DataFrame must have an `index` column or exactly one "
            f"column; got {probe.columns}"
        )
    return probe.select(
        F.col(col).cast("string").alias("index")
    ).dropDuplicates(["index"])
