"""Hybrid retrieval: BM25 lexical ranking and cosine semantic ranking
fused by reciprocal-rank fusion (RRF) — the standard production recipe
for corpus search over a training-data lake (keyword recall + semantic
recall, neither alone sufficient).

The reference engine (Centre-for-Information-Resilience/
cir-duplicate-detector) exposes no retrieval API; this module extends
the engine for the serving workloads a 100 TB corpus needs next to its
dedup operators: "find the documents matching these terms OR similar
to this vector", one ranked list out.

FUSION — RRF (Cormack, Clarke & Buettcher, SIGIR 2009): each ranked
list contributes ``1 / (rrf_k + rank)`` for every document it ranks;
a document's fused score is the sum of its contributions, missing
lists contribute 0. Rank-based fusion deliberately ignores the raw
scores (BM25 scores and cosines are not commensurable), so the fused
ordering is invariant to any monotone rescoring of either stage.

FLOAT DISCIPLINE — every contribution is ONE correctly-rounded double
division of exact integers (``1.0 / (rrf_k + rank)``; the denominator
is an exact small-integer sum), and the fused score is a FIXED
two-term addition (lexical first, semantic second — never a
collect-order fold), so scores are bit-reproducible across engines
and partitionings. Ties (common under RRF: two single-list documents
at the same rank tie exactly) break by doc_id, so the output ranking
is total and deterministic.

SCALE SHAPE — both stages are the engine's existing bounded plans:
the lexical stage is :func:`textops.bm25_search` (panel-broadcast
inverted index, per-query window top-k, never a corpus sort); the
semantic stage is cosine top-k against the embeddings relation
(:func:`similarity.knn_bruteforce` here — at serving scale the same
fusion composes unchanged over :func:`pq.knn_ivf_pq_refined`, since
RRF consumes only (query, doc, rank) triples). Fusion itself touches
at most ``2 * k_each`` rows PER QUERY: one equi-join of two tiny
ranked relations plus one per-query window — per-query work,
independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import knn_bruteforce
from .textops import bm25_search

HYBRID_RRF_K = 60  # the paper's constant; dampens top-rank dominance
HYBRID_K_EACH = 10  # per-stage candidate depth
HYBRID_TOPK = 10

# Fixed panel-query -> probe-vector mapping for the registered query:
# each BM25 panel query (textops.BM25_PANEL, query_ids 1-4) carries one
# corpus vector as its semantic side.
HYBRID_PROBES: list[tuple[int, int]] = [
    (1, 50),
    (2, 100),
    (3, 150),
    (4, 200),
]


def _rrf_contrib(rank_col: str, rrf_k: int):
    """``1 / (rrf_k + rank)`` as one correctly-rounded double division
    (denominator an exact integer sum); 0.0 when the stage did not
    rank the document."""
    return F.coalesce(
        F.lit(1.0) / (F.lit(rrf_k) + F.col(rank_col)),
        F.lit(0.0),
    )


def map_probe_ranks(knn_out: DataFrame, probes: DataFrame) -> DataFrame:
    """Map a kNN stage's output — whose ``query_id`` is the PROBE
    vec_id — back to the panel's query_id via the (query_id, vec_id)
    probe map, as the ``(query_id, doc_id, sem_rank)`` relation
    :func:`rrf_fuse` consumes. The probe map is a per-query literal
    frame, always broadcast."""
    pr = probes.select(
        F.col("query_id").alias("panel_qid"), F.col("vec_id")
    )
    return knn_out.join(
        F.broadcast(pr), knn_out["query_id"] == pr["vec_id"]
    ).select(
        F.col("panel_qid").alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("sem_rank"),
    )


def rrf_fuse(
    lex: DataFrame,
    sem: DataFrame,
    topk: int = HYBRID_TOPK,
    rrf_k: int = HYBRID_RRF_K,
) -> DataFrame:
    """Fuse two per-query rankings by RRF: ``lex`` carries
    ``(query_id, doc_id, lex_rank)``, ``sem`` carries ``(query_id,
    doc_id, sem_rank)``. Rank-only fusion — any ranking stage plugs in
    unchanged (exact brute-force, IVF-PQ serving path, a future
    cross-encoder re-rank), which is the point of the RRF shape.

    Output: ``(query_id, doc_id, lex_rank, sem_rank, rrf_score,
    rank)``; stage ranks are NULL where that stage did not rank the
    document; rank by (rrf_score desc, doc_id asc)."""
    # USING-style full outer join coalesces the key columns on both
    # engines; each side is at most (queries x k_each) rows.
    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer")
    scored = fused.withColumn(
        "rrf_score",
        _rrf_contrib("lex_rank", rrf_k) + _rrf_contrib("sem_rank", rrf_k),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= topk)
        .select(
            "query_id", "doc_id", "lex_rank", "sem_rank",
            "rrf_score", "rank",
        )
    )


def hybrid_search(
    docs: DataFrame,
    vectors: DataFrame,
    panel: DataFrame,
    probes: DataFrame,
    k_each: int = HYBRID_K_EACH,
    topk: int = HYBRID_TOPK,
    rrf_k: int = HYBRID_RRF_K,
) -> DataFrame:
    """Per-query top-``topk`` documents under RRF fusion of the BM25
    lexical ranking (``panel``: (query_id, term) rows over ``docs``)
    and the EXACT cosine semantic ranking (``probes``: (query_id,
    vec_id) rows — each query's probe vector — against ``vectors``).
    The exactness baseline; the serving-scale variant swaps the
    semantic stage only (see the registered ``hybrid_search_served``:
    refined IVF-PQ from the persisted index through the same
    :func:`rrf_fuse`).

    Output: ``(query_id, doc_id, lex_rank, sem_rank, rrf_score,
    rank)``; ``lex_rank`` / ``sem_rank`` are NULL when that stage did
    not rank the document within its top-``k_each``; rank by
    (rrf_score desc, doc_id asc). Document ids and vector ids share
    one id space (the corpus convention: embeddings.vec_id ==
    documents.doc_id).
    """
    lex = bm25_search(docs, panel, topk=k_each).select(
        "query_id", "doc_id", F.col("rank").alias("lex_rank")
    )
    knn = knn_bruteforce(
        vectors, probes.select("vec_id"), k=k_each
    )
    return rrf_fuse(
        lex, map_probe_ranks(knn, probes), topk=topk, rrf_k=rrf_k
    )
