"""Derived near-duplicate corpus over `documents` (both dialects).

The driver testdata has no duplicate texts (verified), so dedup
operators are exercised against a deterministically derived corpus:

* originals                        (doc_id)
* near-dup mutants: last 3 words dropped, for doc_id % 5 == 0
  (doc_id + 1_000_000) — word-3-gram Jaccard ≈ (s-3)/(s+... ) >> 0.5
* exact copies: unchanged text, for doc_id % 11 == 0
  (doc_id + 2_000_000)

Spark and DuckDB expressions are kept side by side; list_slice /
slice and regexp splits behave identically on this corpus (verified:
no double/leading/trailing whitespace in the testdata texts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def near_dup_corpus_sql(dialect: str) -> str:
    if dialect == "spark":
        words = "split(text, '\\\\s+')"
        mut = f"array_join(slice({words}, 1, greatest(size({words}) - 3, 1)), ' ')"
    elif dialect == "duckdb":
        words = "regexp_split_to_array(text, '\\s+')"
        mut = f"array_to_string(list_slice({words}, 1, greatest(len({words}) - 3, 1)), ' ')"
    else:
        raise ValueError(f"unknown dialect {dialect!r}")
    return f"""
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, {mut} AS text
    FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id, text AS text
    FROM documents WHERE doc_id % 11 = 0
    """


def derive_near_dup_corpus(documents: DataFrame) -> DataFrame:
    spark = documents.sparkSession
    documents.createOrReplaceTempView("documents")
    return spark.sql(near_dup_corpus_sql("spark"))
