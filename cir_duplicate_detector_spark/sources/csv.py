"""CSV source/sink for document corpora — the second interchange
format (exports from labeling tools, spreadsheets, warehouse dumps).

Same ingest contract as ``sources.jsonl``:

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

The reader parses lines via ``from_csv`` over a text scan (one pass,
scan-parallel) rather than the native csv source — identical rationale
to ``sources.jsonl``: Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN
restriction forbids the pruned corrupt-only scan a quarantine
``count()`` produces, and the text scan keeps the raw line available
for the quarantine branch from the same pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def write_documents_csv(docs: DataFrame, path: str) -> None:
    """Write a corpus as headerless CSV (schema is declared on read;
    a header row would be indistinguishable from data in a
    multi-thousand-file directory and breaks concatenation)."""
    docs.write.mode("overwrite").option("header", "false").csv(path)


def read_documents_csv(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> tuple[DataFrame, DataFrame]:
    """Read line-split CSV with a declared schema; returns ``(clean,
    quarantined)``. A row quarantines when it is structurally
    malformed (wrong arity, unparseable field for the declared type);
    the raw line rides along in ``_corrupt_record``."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    schema_with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = spark.read.text(path).select(
        F.from_csv(
            F.col("value"),
            schema_with_corrupt.simpleString(),
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
