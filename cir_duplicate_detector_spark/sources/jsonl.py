"""JSONL (newline-delimited JSON) source/sink for document corpora.

JSONL is the de-facto interchange format for training-data pipelines
(one JSON object per line, splittable when uncompressed, streamable).
Spark's native json source handles it scan-parallel; what this module
adds is the contract a 100 TB ingest actually needs:

* **Explicit schema, never inference** — schema inference reads the
  data twice and silently widens types per batch; at scale the schema
  is a declared input.
* **Corrupt-record quarantine** — PERMISSIVE mode with a named
  ``_corrupt_record`` column, split into (clean, quarantined) so bad
  lines are counted and kept for triage instead of killing the job or
  vanishing (DROPMALFORMED).
* **Deterministic round-trip** — writer emits one JSON object per line
  with fields in schema order; reader restores column order from the
  declared schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def write_documents_jsonl(docs: DataFrame, path: str) -> None:
    """Write a corpus as JSONL (uncompressed — splittable; production
    would layer zstd per file)."""
    docs.write.mode("overwrite").json(path)


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL with a declared schema; returns ``(clean,
    quarantined)``. ``quarantined`` carries the raw offending line in
    ``_corrupt_record`` for triage. Scan-parallel: JSON lines split by
    newline, no shuffle."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    schema_with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    # Read LINES (text source, newline-splittable like the json source)
    # and parse with from_json carrying the corrupt-record column in the
    # struct. Parsing as an expression sidesteps Spark's
    # QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction on raw json scans
    # (column pruning reduces a quarantine count() to exactly the
    # forbidden corrupt-only scan) and keeps the raw line available for
    # triage from the same single pass.
    parsed = spark.read.text(path).select(
        F.from_json(
            F.col("value"),
            schema_with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("r"),
        F.col("value"),
    )
    bad = F.col(f"r.{CORRUPT_COL}").isNotNull() | F.col("r").isNull()
    clean = parsed.where(~bad).select(
        *[F.col(f"r.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantined = parsed.where(bad).select(F.col("value").alias(CORRUPT_COL))
    return clean, quarantined
