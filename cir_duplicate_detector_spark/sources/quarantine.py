"""Shared quarantine-read core for the line-oriented text sources
(JSONL, CSV): one text scan, a parse EXPRESSION carrying a corrupt-
record column, and the (clean, quarantined) split.

Factored here so the quarantine contract — the bad-row predicate, the
corrupt-column handling, the schema-string parsing — has exactly one
implementation that both formats inherit (they previously drifted as
near-verbatim copies). The parse runs as an expression over a
``spark.read.text`` scan rather than the native json/csv sources for
one reason: Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction
forbids the pruned corrupt-only scan that a quarantine ``count()``
column-prunes down to, and the text scan keeps the raw line available
for the quarantine branch from the same single pass.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_lines_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    parse: Callable[[Column, T.StructType, dict], Column],
) -> tuple[DataFrame, DataFrame]:
    """Read newline-split records, parse each line with ``parse``
    (``from_json`` / ``from_csv`` shaped: (line, schema+corrupt,
    options) -> struct column), and split into ``(clean,
    quarantined)``. ``quarantined`` carries the raw offending line in
    ``_corrupt_record`` for triage.
    """
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    schema_with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    options = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    parsed = spark.read.text(path).select(
        parse(F.col("value"), schema_with_corrupt, options).alias("r"),
        F.col("value"),
    )
    bad = F.col(f"r.{CORRUPT_COL}").isNotNull() | F.col("r").isNull()
    clean = parsed.where(~bad).select(
        *[F.col(f"r.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantined = parsed.where(bad).select(F.col("value").alias(CORRUPT_COL))
    return clean, quarantined
