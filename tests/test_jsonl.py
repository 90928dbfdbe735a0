"""JSONL source: schema-declared read, corrupt-record quarantine,
exact round-trip."""

from __future__ import annotations

import os

from cir_duplicate_detector_spark.sources.jsonl import (
    read_documents_jsonl,
    write_documents_jsonl,
)
from cir_duplicate_detector_spark.sources.tables import load_table

SCHEMA = "doc_id bigint, text string"


def test_jsonl_roundtrip_exact(spark, tmp_path):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "docs")
    write_documents_jsonl(docs, path)
    clean, bad = read_documents_jsonl(spark, path, SCHEMA)
    assert bad.count() == 0
    orig = {(r["doc_id"], r["text"]) for r in docs.collect()}
    back = {(r["doc_id"], r["text"]) for r in clean.collect()}
    assert orig == back


def test_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    path = str(tmp_path / "mixed")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.json"), "w") as f:
        f.write('{"doc_id": 1, "text": "good line"}\n')
        f.write("this is not json at all\n")
        f.write('{"doc_id": 2, "text": "another good one"}\n')
        f.write('{"doc_id": "NOT_A_NUMBER", "text": "type mismatch"}\n')
    clean, bad = read_documents_jsonl(spark, path, SCHEMA)
    got = {r["doc_id"] for r in clean.collect()}
    assert got == {1, 2}
    quarantined = [r["_corrupt_record"] for r in bad.collect()]
    assert len(quarantined) == 2
    assert any("not json" in q for q in quarantined)
    # The quarantined line is the RAW input, recoverable for triage.
    assert any("NOT_A_NUMBER" in q for q in quarantined)


def test_jsonl_text_with_newlines_survives(spark, tmp_path):
    rows = [(1, "line one\nline two\ttab"), (2, 'quotes " and \\ slash')]
    docs = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "escaped")
    write_documents_jsonl(docs, path)
    clean, bad = read_documents_jsonl(spark, path, SCHEMA)
    assert bad.count() == 0
    assert {(r["doc_id"], r["text"]) for r in clean.collect()} == set(rows)
