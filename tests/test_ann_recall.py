"""Measured recall of the approximate ANN paths against ground truth.

The oracle parity suite proves each approximate query equals ITS OWN
deterministic definition; this suite measures how good the
approximation is and pins floors so a refactor can't silently hollow
out candidate generation (the round-1 lesson: a vacuously-green LSH
that returned nothing).

Two regimes, deliberately separated:

* **Planted near-duplicates** (derived embeddings: exact copies at
  cosine 1.0) — the workload these operators exist for. All three
  paths are STRUCTURALLY guaranteed to find a copy (identical vectors
  share every sketch bucket / centroid / PQ code): measured recall 1.0,
  floor 0.95.
* **Random vectors** — nothing is truly "near", so low recall is
  expected (8-bit SRP bands collide at ~2^-8 for uncorrelated
  vectors); the floors only catch collapse to ~zero. Measured at
  sf0.001: lsh 0.04, ivf 0.69, pq-adc 0.26.
"""

from __future__ import annotations

from cir_duplicate_detector_spark.operators import pq, similarity
from cir_duplicate_detector_spark.sources.derived import (
    derive_near_dup_embeddings,
)
from cir_duplicate_detector_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
K = 5

APPROX = [
    ("lsh", similarity.knn_lsh),
    ("ivf", similarity.knn_ivf),
    ("adc", pq.knn_pq_adc),
]


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_planted_near_duplicate_recall_is_total(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    nd = derive_near_dup_embeddings(emb)
    copies = [
        r[0]
        for r in nd.select("vec_id")
        .where("vec_id >= 1000000 and vec_id < 2000000")
        .collect()
    ]
    assert copies  # fixture sanity
    for name, fn in APPROX:
        got = _topk_sets(fn(nd, copies, k=K).collect())
        hits = sum(1 for c in copies if (c - 1_000_000) in got.get(c, set()))
        recall = hits / len(copies)
        assert recall >= 0.95, f"{name} planted recall collapsed: {recall:.3f}"
        for q, ns in got.items():
            assert len(ns) <= K and q not in ns, (name, q)


def test_random_vector_recall_floors(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    probes = [
        r[0] for r in emb.select("vec_id").where("vec_id % 20 = 0").collect()
    ]
    exact = _topk_sets(similarity.knn_bruteforce(emb, probes, k=K).collect())

    def recall(approx):
        num = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        return num / sum(len(v) for v in exact.values())

    floors = {"lsh": 0.01, "ivf": 0.40, "adc": 0.10}
    for name, fn in APPROX:
        r = recall(_topk_sets(fn(emb, probes, k=K).collect()))
        assert r >= floors[name], f"{name} random recall collapsed: {r:.3f}"
