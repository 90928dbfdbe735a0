"""CSV source/sink for document corpora — the second interchange
format (exports from labeling tools, spreadsheets, warehouse dumps).

Same ingest contract as ``sources.jsonl`` (shared implementation:
``sources.quarantine``):

* **Explicit schema, never inference** — inference costs an extra pass
  and widens types per batch; at scale the schema is a declared input.
* **Corrupt-record quarantine** — malformed lines are split out with
  the raw text preserved for triage, never dropped silently
  (DROPMALFORMED) and never fatal (FAILFAST).
* **Splittability caveat, documented**: CSV is only newline-splittable
  when fields contain no embedded newlines. ``multiLine=true`` parses
  them but makes each file a single non-parallel split — the wrong
  trade at 100 TB. This module therefore writes WITHOUT embedded
  newlines (callers must pre-escape, e.g. ``\\n`` → ``\\\\n``) and
  reads line-split. JSONL escapes newlines natively; prefer it when
  you control the format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from .quarantine import CORRUPT_COL, read_lines_with_quarantine

__all__ = ["CORRUPT_COL", "read_documents_csv", "write_documents_csv"]


def write_documents_csv(docs: DataFrame, path: str) -> None:
    """Write a corpus as headerless CSV (schema is declared on read;
    a header row would be indistinguishable from data in a
    multi-thousand-file directory and breaks concatenation).

    The no-embedded-newlines contract (module docstring) is ENFORCED,
    not assumed: any string cell carrying a newline fails the write
    loudly (round-5 advice — it previously surfaced only as a silent
    quarantine row on read-back). The guard is a scan-side predicate
    per string column, no extra pass."""
    for f in docs.schema.fields:
        if f.dataType.typeName() == "string":
            docs = docs.withColumn(
                f.name,
                F.when(
                    F.col(f.name).rlike("[\\n\\r]"),
                    F.raise_error(
                        F.concat(
                            F.lit(
                                f"write_documents_csv: column {f.name} "
                                "contains an embedded newline; pre-escape "
                                "it or use the JSONL sink: "
                            ),
                            F.col(f.name),
                        )
                    ),
                ).otherwise(F.col(f.name)),
            )
    docs.write.mode("overwrite").option("header", "false").csv(path)


def read_documents_csv(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> tuple[DataFrame, DataFrame]:
    """Read line-split CSV with a declared schema; returns ``(clean,
    quarantined)``. A row quarantines when it is structurally
    malformed (wrong arity, unparseable field for the declared type);
    the raw line rides along in ``_corrupt_record``."""
    return read_lines_with_quarantine(
        spark,
        path,
        schema,
        lambda line, sc, opts: F.from_csv(line, sc.simpleString(), opts),
    )
