"""Hybrid retrieval (RRF fusion) semantics on a tiny synthetic corpus.

Pins the fusion rules the oracle parity check cannot localize: a
document ranked by BOTH stages outranks same-depth single-stage
documents, missing-stage ranks surface as NULL (never 0), the output
is bounded by topk, and ties break by doc_id.
"""

from __future__ import annotations

import math

from cir_duplicate_detector_spark.operators import retrieval


def _tiny(spark):
    # Corpus where doc 1 is BOTH a keyword hit and the probe's nearest
    # vector; doc 2 is keyword-only; doc 3 is vector-only.
    docs = spark.createDataFrame(
        [
            (1, "spark join spark join spark"),
            (2, "spark join"),
            (3, "unrelated words entirely here"),
            (4, "other filler text"),
        ],
        "doc_id bigint, text string",
    )
    e1 = [1.0, 0.0, 0.0, 0.0]
    e3 = [0.9, 0.1, 0.0, 0.0]
    far = [0.0, 0.0, 1.0, 0.0]
    vectors = spark.createDataFrame(
        [(0, e1), (1, e1), (3, e3), (4, far)],
        "vec_id bigint, embedding array<float>",
    )
    panel = spark.createDataFrame(
        [(7, "spark"), (7, "join")], "query_id bigint, term string"
    )
    probes = spark.createDataFrame(
        [(7, 0)], "query_id bigint, vec_id bigint"
    )
    return docs, vectors, panel, probes


def test_hybrid_rrf_fusion_semantics(spark):
    docs, vectors, panel, probes = _tiny(spark)
    out = retrieval.hybrid_search(
        docs, vectors, panel, probes, k_each=3, topk=4
    ).collect()
    assert [r.query_id for r in out] == [7] * len(out)
    by_doc = {r.doc_id: r for r in out}

    # Doc 1: top keyword hit AND nearest vector -> fused winner.
    both = by_doc[1]
    assert both.lex_rank is not None and both.sem_rank is not None
    assert both.rank == 1
    expected = 1.0 / (60 + both.lex_rank) + 1.0 / (60 + both.sem_rank)
    assert math.isclose(both.rrf_score, expected, rel_tol=0, abs_tol=0)

    # Doc 2 keyword-only: NULL sem_rank, single-term score.
    lex_only = by_doc[2]
    assert lex_only.sem_rank is None
    assert lex_only.rrf_score == 1.0 / (60 + lex_only.lex_rank)

    # Doc 3 vector-only: NULL lex_rank.
    sem_only = by_doc[3]
    assert sem_only.lex_rank is None
    assert sem_only.rrf_score == 1.0 / (60 + sem_only.sem_rank)

    # Fused winner strictly above every single-stage doc.
    assert both.rrf_score > lex_only.rrf_score
    assert both.rrf_score > sem_only.rrf_score


def test_hybrid_fused_recall_floor(spark):
    # The served hybrid's only approximation is its IVF-PQ semantic
    # stage; the fused ranking must stay close to the exact hybrid
    # (the test_ann_recall floor discipline — a refactor that hollows
    # out the probe map, the index serving path, or the fusion join
    # collapses this to ~0, not to 0.7). Measured: 1.0 per panel query
    # at sf0.001, 0.9 at sf0.1.
    from cir_duplicate_detector_spark.plans import ALL_QUERIES

    rows = ALL_QUERIES["hybrid_recall"][0](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 4  # one row per panel query
    for r in rows:
        assert r.n_exact == 10
        assert r.recall >= 0.7, (r.query_id, r.recall)


def test_hybrid_topk_bound_and_tiebreak(spark):
    docs, vectors, panel, probes = _tiny(spark)
    out = retrieval.hybrid_search(
        docs, vectors, panel, probes, k_each=3, topk=2
    ).collect()
    assert len(out) <= 2
    # Ranks are 1..n with no gaps, ordered by (score desc, doc_id asc).
    ranks = sorted(r.rank for r in out)
    assert ranks == list(range(1, len(out) + 1))
    ordered = sorted(out, key=lambda r: r.rank)
    for a, b in zip(ordered, ordered[1:]):
        assert (a.rrf_score, -a.doc_id) >= (b.rrf_score, -b.doc_id)
        if a.rrf_score == b.rrf_score:
            assert a.doc_id < b.doc_id
