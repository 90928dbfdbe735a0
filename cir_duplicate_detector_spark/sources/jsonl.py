"""JSONL (newline-delimited JSON) source/sink for document corpora.

JSONL is the de-facto interchange format for training-data pipelines
(one JSON object per line, splittable when uncompressed, streamable).
Spark's native json source handles it scan-parallel; what this module
adds is the contract a 100 TB ingest actually needs (shared
implementation: ``sources.quarantine``):

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

from .quarantine import CORRUPT_COL, read_lines_with_quarantine

__all__ = ["CORRUPT_COL", "read_documents_jsonl", "write_documents_jsonl"]


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
    return read_lines_with_quarantine(
        spark, path, schema, lambda line, sc, opts: F.from_json(line, sc, opts)
    )
