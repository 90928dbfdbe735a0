"""Training-data pipeline extension queries:
decontamination (exact/fuzzy/semantic + report), boilerplate
removal/screen, DSIR weighting, BM25 search/route/index.

Split out of the monolithic ``extension_queries.py`` (round-10
modularity; VERDICT r9 item 6) with NO behavior change: same
callables, same oracle strings, same registry names.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from ..functions.text import hash60_sql
from ..operators import dedup, retrieval, similarity, textops
from ..sources.derived import (
    BLOOM_SPLIT_DUCK,
    BLOOM_SPLIT_SPARK,
    derive_near_dup_embeddings,
)
from ..sources.tables import load_table

from .ext_common import (
    _BAND_SELECTS,
    _DUCK_SHINGLES8,
    _DUCK_SHINGLE_SET,
    _DUCK_WORDS,
    _LANES,
    _ND,
    _ND_EMB,
    _docs_nd,
    _sql_kmeans_ivf_cells,
)


# Train/eval split over docs_nd for the decontamination screen. The rule
# mixes the derived-id band (div 1000000 ∈ {0,1,2}) into the digit so
# exact copies and near-dup mutants land on the OPPOSITE side of their
# original (a plain doc_id % 10 split strands every planted duplicate
# group on one side and the screen is vacuously empty): originals ending
# in 7, mutants of originals ending in 0, copies of originals ending in
# 3 go to eval — their counterparts stay in train.
_DECON_SPLIT = "(doc_id // 1000000 * 7 + doc_id) % 10"


_DECON_SPLIT_SPARK = "(doc_id div 1000000 * 7 + doc_id) % 10"


def q_decontaminate(spark, sf_dir):
    docs = _docs_nd(spark, sf_dir)
    split = F.expr(_DECON_SPLIT_SPARK)
    return textops.decontaminate(
        docs.where(split != 7), docs.where(split == 7)
    )


SQL_DECONTAMINATE = f"""
WITH docs_nd AS ({_ND}),
trg AS (
  SELECT DISTINCT doc_id, {hash60_sql('sh')} AS g FROM (
    SELECT doc_id, unnest({_DUCK_SHINGLES8}) AS sh
    FROM docs_nd WHERE {_DECON_SPLIT} <> 7
  )
),
evg AS (
  SELECT DISTINCT doc_id AS eval_id, {hash60_sql('sh')} AS g FROM (
    SELECT doc_id, unnest({_DUCK_SHINGLES8}) AS sh
    FROM docs_nd WHERE {_DECON_SPLIT} = 7
  )
),
hot AS (SELECT g FROM evg GROUP BY g HAVING count(*) > {dedup.DEFAULT_MAX_DF}),
evc AS (SELECT * FROM evg WHERE g NOT IN (SELECT g FROM hot))
SELECT t.doc_id,
       count(DISTINCT t.g) AS n_shared_grams,
       count(DISTINCT e.eval_id) AS n_eval_docs
FROM trg t JOIN evc e ON t.g = e.g
GROUP BY t.doc_id
"""


def q_boilerplate_removal(spark, sf_dir):
    """Cross-document boilerplate REMOVAL over the planted near-dup
    corpus (`textops.boilerplate_removal`, CCNet-style): 16-token
    non-overlapping spans whose exact content recurs in >= 2 distinct
    documents are dropped and each document is rebuilt from its
    surviving spans — exact copies and truncation mutants lose their
    shared spans, organic documents pass through whole. The output is
    the CLEANED corpus (doc_id, n_tokens, n_kept_tokens, clean_text),
    every input document present."""
    return textops.boilerplate_removal(_docs_nd(spark, sf_dir), min_docs=2)


def _sql_boilerplate_removal() -> str:
    w = textops.BOILER_TOKENS
    return f"""
WITH docs_nd AS ({_ND}),
wd AS (SELECT doc_id, {_DUCK_WORDS} AS ws FROM docs_nd),
st AS (
  SELECT doc_id, ws,
         unnest(range(1, greatest(len(ws), 1) + 1, {w})) AS start
  FROM wd
),
sp AS (
  SELECT doc_id, ((start - 1) // {w})::BIGINT AS win_id,
         array_to_string(list_slice(ws, start, start + {w} - 1), ' ')
           AS wtext,
         len(list_slice(ws, start, start + {w} - 1))::BIGINT AS wtok
  FROM st
),
common AS (
  SELECT md5(wtext) AS whash FROM sp
  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
),
kept AS (SELECT * FROM sp WHERE md5(wtext) NOT IN (SELECT whash FROM common)),
rb AS (
  SELECT doc_id, sum(wtok)::BIGINT AS n_kept_tokens,
         string_agg(wtext, ' ' ORDER BY win_id) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT wd.doc_id, len(wd.ws)::BIGINT AS n_tokens,
       coalesce(rb.n_kept_tokens, 0)::BIGINT AS n_kept_tokens,
       coalesce(rb.clean_text, '') AS clean_text
FROM wd LEFT JOIN rb USING (doc_id)
"""


def q_dsir_weights(spark, sf_dir):
    """DSIR-style importance weights over raw documents
    (`textops.dsir_weights`): hashed-unigram likelihood ratios score
    every document against the English slice as the TARGET corpus —
    the tilt-a-crawl-toward-a-domain selection step. Ratio form (one
    exact-integer-product division per bucket, sorted-fold sum), not
    log form — `ln` is not bit-reproducible across engines (same
    stance as tfidf's linear idf)."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.dsir_weights(docs, F.col("lang") == "en")


def _sql_dsir_weights() -> str:
    b = textops.DSIR_BUCKETS
    h = hash60_sql("t", "'dsir'")
    lw = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"
    return f"""
WITH tk AS (
  SELECT doc_id, it, {h} % {b} AS bucket
  FROM (
    SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS it,
           unnest({lw}) AS t
    FROM documents
  )
),
dc AS (
  SELECT doc_id, bucket, max(it) AS it, count(*)::BIGINT AS c
  FROM tk GROUP BY 1, 2
),
raw AS (SELECT bucket, sum(c)::BIGINT AS rc FROM dc GROUP BY 1),
tgt AS (SELECT bucket, sum(c)::BIGINT AS tc FROM dc WHERE it = 1 GROUP BY 1),
tot AS (
  SELECT sum(c)::BIGINT AS r_total,
         sum(CASE WHEN it = 1 THEN c ELSE 0 END)::BIGINT AS t_total
  FROM dc
),
ratios AS (
  SELECT raw.bucket,
         ((coalesce(tgt.tc, 0) + 1) * (tot.r_total + {b}))::DOUBLE
           / ((raw.rc + 1) * (tot.t_total + {b}))::DOUBLE AS r
  FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tot
),
sc AS (
  SELECT dc.doc_id, sum(dc.c)::BIGINT AS n_tokens,
         list_sum(list(dc.c::DOUBLE * ratios.r ORDER BY dc.bucket))
           AS dsir_weight
  FROM dc JOIN ratios USING (bucket) GROUP BY 1
)
SELECT d.doc_id, coalesce(sc.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(sc.dsir_weight, 0.0) AS dsir_weight
FROM documents d LEFT JOIN sc USING (doc_id)
"""


def q_bm25_search(spark, sf_dir):
    """Keyword retrieval (`textops.bm25_search`): the fixed 4-query
    term panel against the documents corpus, BM25-shaped scoring with
    the RATIONAL idf ``(N - df + 0.5)/(df + 0.5)`` (the log dropped
    for cross-engine bit-reproducibility — the tfidf linear-idf
    stance), per-query top-10 by (score desc, doc_id). The search
    capability next to the ANN family: terms in, ranked documents
    out."""
    panel = spark.createDataFrame(
        textops.BM25_PANEL, "query_id bigint, term string"
    )
    return textops.bm25_search(load_table(spark, sf_dir, "documents"), panel)


def _sql_bm25_search() -> str:
    k1 = textops.BM25_K1
    vals = ", ".join(f"({q}, '{t}')" for q, t in textops.BM25_PANEL)
    # Float literals forced to DOUBLE: DuckDB parses bare decimals as
    # DECIMAL, and exact-decimal arithmetic before the cast rounds
    # differently than double-from-the-start (tf * 2.2 diverges at
    # tf=3). repr() round-trips the exact doubles Spark uses.
    idf = "(((stats.n_docs - dfr.df) + 0.5::DOUBLE) / (dfr.df + 0.5::DOUBLE))"
    tfnorm = (
        f"((tf.tf * {k1 + 1.0!r}::DOUBLE) / (tf.tf + ({k1!r}::DOUBLE"
        f" * ({1.0 - textops.BM25_B!r}::DOUBLE + (({textops.BM25_B!r}::DOUBLE"
        " * dl.dl) / (stats.total_tokens / stats.n_docs))))))"
    )
    return f"""
WITH panel(query_id, term) AS (VALUES {vals}),
tk AS (SELECT doc_id, unnest({_DUCK_WORDS}) AS term FROM documents),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tk GROUP BY 1),
stats AS (
  SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_tokens
  FROM dl
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tk
  WHERE term IN (SELECT term FROM panel) GROUP BY 1, 2
),
dfr AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id, tf.term, {idf} * {tfnorm} AS s
  FROM tf JOIN dfr USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
),
agg AS (
  SELECT panel.query_id, sc.doc_id, count(*)::BIGINT AS n_terms_hit,
         list_sum(list(sc.s ORDER BY sc.term)) AS score
  FROM panel JOIN sc USING (term) GROUP BY 1, 2
)
SELECT query_id, doc_id, rank, n_terms_hit, score FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, doc_id
  )::BIGINT AS rank FROM agg
) WHERE rank <= {textops.BM25_TOPK}
"""


def q_hybrid_search(spark, sf_dir):
    """Hybrid retrieval (`retrieval.hybrid_search`): the BM25 panel's
    lexical top-10 and each query's probe-vector cosine top-10, fused
    by reciprocal-rank fusion (1/(60+rank), missing stage contributes
    0) — the production corpus-search recipe: keyword recall and
    semantic recall in ONE ranked list. Scores are fixed two-term
    double sums of exact-integer reciprocals, bit-reproducible; ties
    break by doc_id."""
    panel = spark.createDataFrame(
        textops.BM25_PANEL, "query_id bigint, term string"
    )
    probes = spark.createDataFrame(
        retrieval.HYBRID_PROBES, "query_id bigint, vec_id bigint"
    )
    return retrieval.hybrid_search(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
        panel,
        probes,
    )


def _sql_hybrid_search() -> str:
    # The lexical CTE reuses the bm25_search oracle verbatim, so the
    # two stay in lockstep by construction; the registered hybrid runs
    # both stages at their default depths.
    assert retrieval.HYBRID_K_EACH == textops.BM25_TOPK
    from .ext_ann import _DUCK_VEC_N

    probes_vals = ", ".join(
        f"({q}, {v})" for q, v in retrieval.HYBRID_PROBES
    )
    rrf_k = retrieval.HYBRID_RRF_K
    return f"""
WITH lex AS ({_sql_bm25_search()}),
n AS ({_DUCK_VEC_N}),
probes(query_id, vec_id) AS (VALUES {probes_vals}),
sem_scored AS (
  SELECT p.query_id, c.vec_id AS doc_id,
         list_sum(list_transform(range(1, 65), j -> q.e[j] * c.e[j]))
           / (q.nrm * c.nrm) AS cosine
  FROM probes p
  JOIN n q ON q.vec_id = p.vec_id
  CROSS JOIN n c
  WHERE c.vec_id <> p.vec_id
),
sem AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, doc_id
    )::BIGINT AS rank FROM sem_scored
  ) WHERE rank <= {retrieval.HYBRID_K_EACH}
),
fused AS (
  SELECT coalesce(l.query_id, s.query_id) AS query_id,
         coalesce(l.doc_id, s.doc_id) AS doc_id,
         l.lex_rank, s.sem_rank
  FROM (SELECT query_id, doc_id, rank AS lex_rank FROM lex) l
  FULL JOIN (SELECT query_id, doc_id, rank AS sem_rank FROM sem) s
    ON l.query_id = s.query_id AND l.doc_id = s.doc_id
),
scored AS (
  SELECT query_id, doc_id, lex_rank, sem_rank,
         coalesce(1.0::DOUBLE / ({rrf_k} + lex_rank), 0.0::DOUBLE)
       + coalesce(1.0::DOUBLE / ({rrf_k} + sem_rank), 0.0::DOUBLE)
           AS rrf_score
  FROM fused
)
SELECT query_id, doc_id, lex_rank, sem_rank, rrf_score, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY rrf_score DESC, doc_id
  )::BIGINT AS rank FROM scored
) WHERE rank <= {retrieval.HYBRID_TOPK}
"""


def q_hybrid_search_served(spark, sf_dir):
    """Hybrid retrieval ON THE SERVING PATH: the same RRF fusion as
    `hybrid_search`, with the semantic stage swapped from exact
    brute-force to the production two-stage ANN — refined IVF-PQ
    (`pq.knn_ivf_pq_from_index` + `pq.pq_refine`) served from the
    family-shared PERSISTED index (`_shared_ivfpq_index`: parquet-
    backed, corpus vectors touched only by the refine stage's
    refine·|probes| rows). Proves the claim `hybrid_search` makes in
    prose: rank-only fusion means the ANN serving path plugs into
    `retrieval.rrf_fuse` without touching the fusion plan — fused
    retrieval runs end to end from on-disk index artifacts."""
    from ..operators import pq
    from .ext_ann import PQ_REFINE, _shared_ivfpq_index

    panel = spark.createDataFrame(
        textops.BM25_PANEL, "query_id bigint, term string"
    )
    probes = spark.createDataFrame(
        retrieval.HYBRID_PROBES, "query_id bigint, vec_id bigint"
    )
    from ..cache import materialize

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = textops.bm25_search(
        docs, panel, topk=retrieval.HYBRID_K_EACH
    ).select("query_id", "doc_id", F.col("rank").alias("lex_rank"))
    # `pq_refine` references its shortlist twice (pair resolve + the
    # query-panel semi-join); materialize the narrow shortlist once so
    # the ADC probe subtree executes once, not per reference (round 15,
    # VERDICT r14 item 1 — the `_pq_recall_over` shortlist pattern;
    # measured min-of-3: sem stage 3.80 → 3.33 s at sf0.1, and the
    # declared plan drops the duplicated ADC subtree).
    short = materialize(
        pq.knn_ivf_pq_from_index(
            _shared_ivfpq_index(spark, sf_dir),
            emb,
            probes.select("vec_id"),
            k=PQ_REFINE,
        )
    )
    sem = retrieval.map_probe_ranks(
        pq.pq_refine(emb, short, k=retrieval.HYBRID_K_EACH), probes
    )
    return retrieval.rrf_fuse(lex, sem)


def _sql_hybrid_search_served() -> str:
    # Lexical CTE = the bm25_search oracle verbatim; semantic CTEs =
    # the knn_ivf_pq_refined oracle chain verbatim (probe relation
    # parametrized to the hybrid probe vectors), so the served hybrid
    # is oracle-locked to exactly the stages it composes.
    from .ext_ann import PQ_REFINE, _sql_ivf_pq_chain, _sql_refined

    probe_ids = ", ".join(str(v) for _, v in retrieval.HYBRID_PROBES)
    probes_vals = ", ".join(
        f"({q}, {v})" for q, v in retrieval.HYBRID_PROBES
    )
    rrf_k = retrieval.HYBRID_RRF_K
    chain = _sql_ivf_pq_chain(
        probes_body=(
            "SELECT vec_id AS query_id, e FROM n"
            f" WHERE vec_id IN ({probe_ids})"
        ),
        topk=PQ_REFINE,
    )
    return f"""
WITH lex AS ({_sql_bm25_search()}),
n AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
{chain}
{_sql_refined(retrieval.HYBRID_K_EACH)},
probemap(query_id, vec_id) AS (VALUES {probes_vals}),
sem AS (
  SELECT pm.query_id, r.neighbor_id AS doc_id, r.rank AS sem_rank
  FROM refined r JOIN probemap pm ON r.query_id = pm.vec_id
),
fused AS (
  SELECT coalesce(l.query_id, s.query_id) AS query_id,
         coalesce(l.doc_id, s.doc_id) AS doc_id,
         l.lex_rank, s.sem_rank
  FROM (SELECT query_id, doc_id, rank AS lex_rank FROM lex) l
  FULL JOIN sem s
    ON l.query_id = s.query_id AND l.doc_id = s.doc_id
),
scored AS (
  SELECT query_id, doc_id, lex_rank, sem_rank,
         coalesce(1.0::DOUBLE / ({rrf_k} + lex_rank), 0.0::DOUBLE)
       + coalesce(1.0::DOUBLE / ({rrf_k} + sem_rank), 0.0::DOUBLE)
           AS rrf_score
  FROM fused
)
SELECT query_id, doc_id, lex_rank, sem_rank, rrf_score, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY rrf_score DESC, doc_id
  )::BIGINT AS rank FROM scored
) WHERE rank <= {retrieval.HYBRID_TOPK}
"""


# Build-once IVF-PQ index over the INDEXED (even-id) half — the base
# index `hybrid_search_fresh` serves from while the odd-id wave arrives
# through the upsert path. Same posture as `_shared_ivfpq_index` (which
# indexes the FULL corpus and therefore cannot demo ingest).
_IVFPQ_EVEN_SHARED: dict[tuple, object] = {}


def _shared_ivfpq_even(spark, sf_dir):
    from ..cache import shared_artifact
    from ..operators import pq

    def build(d):
        emb = load_table(spark, sf_dir, "embeddings")
        built = pq.build_ivf_pq_index(emb.where("vec_id % 2 = 0"))
        pq.persist_ivf_pq_index(built, d)
        return pq.read_ivf_pq_index(spark, d)

    return shared_artifact(
        _IVFPQ_EVEN_SHARED, spark, sf_dir, "ivfpq_even_", build
    )


def q_hybrid_search_fresh(spark, sf_dir):
    """Hybrid retrieval OVER CONTINUOUS INGEST (round 12, VERDICT r11
    stretch item 8): the serving posture a live corpus search needs —
    both stages serve from STATIC persisted structures while a fresh
    wave (the odd-id half) becomes searchable without any relearn.

    * Lexical: every document (indexed + fresh) scores against the
      INDEXED half's background statistics (`bm25_index_stats` → the
      `bm25_route` single-aggregation expressions — the stale-idf
      approximation every percolation service runs between stat
      refreshes), then one per-query top-k window.
    * Semantic: the even-half persisted IVF-PQ index
      (`_shared_ivfpq_even`) plus the wave's `pq.ivf_pq_upsert`
      (assign to existing cells, residual-encode against the existing
      codebook — byte-identical expressions to the build tail) merged
      by pure relation union (`pq.merge_ivf_pq_index`); the standard
      probe path + exact refine run over the merged index, so fresh
      vectors are immediately retrievable.
    * Fusion: the same rank-only RRF as the rest of the family.

    The oracle checks the merge identity: a merged index equals a
    from-scratch build whose learn samples were restricted to the
    indexed half (`_sql_ivf_pq_chain(train_pred=...)`). A literal
    single-query streaming twin is impossible by construction (the
    semantic stage chains argmin + ADC ranking aggregations); the
    ingest-side pieces each ship one (`bm25_route_streaming`,
    `pq_codes_upsert_streaming`, `ivf_upsert_assign_streaming`)."""
    from pyspark.sql import Window

    from ..operators import pq
    from .ext_ann import PQ_REFINE

    panel = spark.createDataFrame(
        textops.BM25_PANEL, "query_id bigint, term string"
    )
    probes = spark.createDataFrame(
        retrieval.HYBRID_PROBES, "query_id bigint, vec_id bigint"
    )
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    stats, df_rel = textops.bm25_index_stats(
        docs.where("doc_id % 2 = 0"), panel
    )
    scores = textops.bm25_route(docs, panel, stats, df_rel)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    lex = (
        scores.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= retrieval.HYBRID_K_EACH)
        .select("query_id", "doc_id", F.col("rank").alias("lex_rank"))
    )
    from ..cache import materialize

    base = _shared_ivfpq_even(spark, sf_dir)
    a_new, c_new = pq.ivf_pq_upsert(base, emb.where("vec_id % 2 = 1"))
    merged = pq.merge_ivf_pq_index(base, a_new, c_new)
    # Same shortlist materialize as the served row (round 15, VERDICT
    # r14 item 1): here the de-duplicated subtree additionally carries
    # the wave upsert + merge, so the lazy form re-ran the whole
    # ingest path once per `pq_refine` reference.
    short = materialize(
        pq.knn_ivf_pq_from_index(
            merged, emb, probes.select("vec_id"), k=PQ_REFINE
        )
    )
    sem = retrieval.map_probe_ranks(
        pq.pq_refine(emb, short, k=retrieval.HYBRID_K_EACH), probes
    )
    return retrieval.rrf_fuse(lex, sem)


def _sql_hybrid_search_fresh() -> str:
    """Oracle: the bm25_route chain over ALL documents (stats from the
    even half) ranked per query, plus the IVF-PQ chain with its LEARN
    samples restricted to the even half (train_pred) — the from-scratch
    equivalent of base-build + upsert-merge — and the standard RRF
    tail."""
    from ..operators.kmeans import KM_IVF_SAMPLE_MOD
    from .ext_ann import PQ_REFINE, _sql_ivf_pq_chain, _sql_refined

    k1, b = textops.BM25_K1, textops.BM25_B
    vals = ", ".join(f"({q}, '{t}')" for q, t in textops.BM25_PANEL)
    idf = "(((n_docs - df) + 0.5::DOUBLE) / (df + 0.5::DOUBLE))"
    tfnorm = (
        f"((tf * {k1 + 1.0!r}::DOUBLE) / (tf + ({k1!r}::DOUBLE"
        f" * ({1.0 - b!r}::DOUBLE + (({b!r}::DOUBLE"
        " * dl) / (total_tokens / n_docs))))))"
    )
    probe_ids = ", ".join(str(v) for _, v in retrieval.HYBRID_PROBES)
    probes_vals = ", ".join(
        f"({q}, {v})" for q, v in retrieval.HYBRID_PROBES
    )
    rrf_k = retrieval.HYBRID_RRF_K
    k_each = retrieval.HYBRID_K_EACH
    chain = _sql_ivf_pq_chain(
        probes_body=(
            "SELECT vec_id AS query_id, e FROM n"
            f" WHERE vec_id IN ({probe_ids})"
        ),
        topk=PQ_REFINE,
        train_pred=f"vec_id % 2 = 0 AND vec_id % {KM_IVF_SAMPLE_MOD} = 0",
    )
    return f"""
WITH panel(query_id, term) AS (VALUES {vals}),
itk AS (
  SELECT doc_id, unnest({_DUCK_WORDS}) AS term FROM documents
  WHERE doc_id % 2 = 0
),
dli AS (SELECT doc_id, count(*)::BIGINT AS dl FROM itk GROUP BY 1),
stats AS (
  SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_tokens
  FROM dli
),
dfr AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM itk
  WHERE term IN (SELECT term FROM panel) GROUP BY 1
),
inc AS (SELECT doc_id, {_DUCK_WORDS} AS ws FROM documents),
pt AS (
  SELECT inc.doc_id, p.query_id, p.term,
         coalesce(dfr.df, 0)::BIGINT AS df,
         stats.n_docs, stats.total_tokens,
         len(list_filter(inc.ws, t -> t = p.term))::BIGINT AS tf,
         len(inc.ws)::BIGINT AS dl
  FROM inc CROSS JOIN panel p
  LEFT JOIN dfr ON dfr.term = p.term CROSS JOIN stats
),
lexsc AS (
  SELECT doc_id, query_id, list_sum(list({idf} * {tfnorm} ORDER BY term))
           AS score
  FROM pt WHERE tf > 0 GROUP BY 1, 2
),
lex AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id, row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, doc_id
    )::BIGINT AS rank FROM lexsc
  ) WHERE rank <= {k_each}
),
n AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
{chain}
{_sql_refined(k_each)},
probemap(query_id, vec_id) AS (VALUES {probes_vals}),
sem AS (
  SELECT pm.query_id, r.neighbor_id AS doc_id, r.rank AS sem_rank
  FROM refined r JOIN probemap pm ON r.query_id = pm.vec_id
),
fused AS (
  SELECT coalesce(l.query_id, s2.query_id) AS query_id,
         coalesce(l.doc_id, s2.doc_id) AS doc_id,
         l.lex_rank, s2.sem_rank
  FROM (SELECT query_id, doc_id, rank AS lex_rank FROM lex) l
  FULL JOIN sem s2
    ON l.query_id = s2.query_id AND l.doc_id = s2.doc_id
),
rrf_scored AS (
  SELECT query_id, doc_id, lex_rank, sem_rank,
         coalesce(1.0::DOUBLE / ({rrf_k} + lex_rank), 0.0::DOUBLE)
       + coalesce(1.0::DOUBLE / ({rrf_k} + sem_rank), 0.0::DOUBLE)
           AS rrf_score
  FROM fused
)
SELECT query_id, doc_id, lex_rank, sem_rank, rrf_score, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY rrf_score DESC, doc_id
  )::BIGINT AS rank FROM rrf_scored
) WHERE rank <= {retrieval.HYBRID_TOPK}
"""


# All-exact hybrid truth (exact BM25 over the full corpus + exact
# brute-force cosine, RRF-fused top-10), shared by `hybrid_recall` and
# `hybrid_fresh_recall` (VERDICT r12 item 3): both rows measure a
# serving variant against the SAME `q_hybrid_search` result, so the
# truth is computed once per (application, corpus dir) and served from
# parquet. The by-construction property is preserved — the builder
# CALLS the registered `q_hybrid_search`, so an edit to it still
# propagates to both diagnostics; bigint (query_id, doc_id) pairs
# round-trip parquet exactly. Each row's SERVING side stays on its own
# clock.
_HYBRID_TRUTH_SHARED: dict[tuple, object] = {}


def _shared_hybrid_truth(spark, sf_dir):
    from ..cache import shared_artifact

    def build(d):
        q_hybrid_search(spark, sf_dir).select(
            "query_id", "doc_id"
        ).write.parquet(f"{d}/truth.parquet")
        return spark.read.parquet(f"{d}/truth.parquet").alias(
            "hybrid_truth_shared"
        )

    return shared_artifact(
        _HYBRID_TRUTH_SHARED, spark, sf_dir, "hybrid_truth_", build
    )


# The SERVED/FRESH top-k consumed by the recall diagnostics, shared by
# the same contract as `_shared_hybrid_truth` (round 14, guide §1.2):
# each serving variant is ALREADY timed end-to-end by its own
# registered row (`hybrid_search_served`, `hybrid_search_fresh`), so
# the recall rows re-computing the identical serving stack measured
# pure duplication (~5-9 s/row). The builders CALL the registered
# query functions, so an edit to either variant still propagates to
# its diagnostic by construction, and bigint (query_id, doc_id) pairs
# round-trip parquet exactly — results identical to the inline form.
_HYBRID_SERVED_SHARED: dict[tuple, object] = {}
_HYBRID_FRESH_SHARED: dict[tuple, object] = {}


def _shared_hybrid_served(spark, sf_dir):
    from ..cache import shared_artifact

    def build(d):
        q_hybrid_search_served(spark, sf_dir).select(
            "query_id", "doc_id"
        ).write.parquet(f"{d}/served.parquet")
        return spark.read.parquet(f"{d}/served.parquet").alias(
            "hybrid_served_shared"
        )

    return shared_artifact(
        _HYBRID_SERVED_SHARED, spark, sf_dir, "hybrid_served_", build
    )


def _shared_hybrid_fresh(spark, sf_dir):
    from ..cache import shared_artifact

    def build(d):
        q_hybrid_search_fresh(spark, sf_dir).select(
            "query_id", "doc_id"
        ).write.parquet(f"{d}/fresh.parquet")
        return spark.read.parquet(f"{d}/fresh.parquet").alias(
            "hybrid_fresh_shared"
        )

    return shared_artifact(
        _HYBRID_FRESH_SHARED, spark, sf_dir, "hybrid_fresh_", build
    )


# The fuzzy screen's verdict pairs and the scrub's token accounting,
# each consumed by diagnostics that previously re-ran the full screen
# their own registered row already times end-to-end (round 14, guide
# §1.2 — the `_shared_hybrid_served` contract): the builders CALL the
# registered query functions, so an edit to either screen still
# propagates to every consumer by construction, and the persisted
# columns are exact integers (bigint id pairs / token counts) that
# round-trip parquet bit-exactly — results identical to the inline
# form. `decontaminate_fuzzy` / `decontaminate_scrub` themselves stay
# fully on their own clocks; memoization is per Spark application, so
# every bench invocation recomputes from the parquet inputs.
_FUZZY_SCREEN_SHARED: dict[tuple, object] = {}
_DECON_SCRUB_SHARED: dict[tuple, object] = {}


def _shared_fuzzy_screen(spark, sf_dir):
    from ..cache import shared_artifact

    def build(d):
        q_decontaminate_fuzzy(spark, sf_dir).select("a", "b").write.parquet(
            f"{d}/pairs.parquet"
        )
        return spark.read.parquet(f"{d}/pairs.parquet")

    return shared_artifact(
        _FUZZY_SCREEN_SHARED, spark, sf_dir, "fuzzy_screen_", build
    )


def _shared_decon_scrub(spark, sf_dir):
    from ..cache import shared_artifact

    def build(d):
        q_decontaminate_scrub(spark, sf_dir).select(
            "doc_id", "n_tokens", "n_kept_tokens"
        ).write.parquet(f"{d}/scrub.parquet")
        return spark.read.parquet(f"{d}/scrub.parquet")

    return shared_artifact(
        _DECON_SCRUB_SHARED, spark, sf_dir, "decon_scrub_", build
    )


def q_hybrid_recall(spark, sf_dir):
    """Recall of the SERVED hybrid vs the exact hybrid, per query —
    the self-measuring-diagnostic discipline (`pq_recall`,
    `ann_recall_*`, `minhash_recall`, `semantic_recall_learned`)
    applied to the new family: `hybrid_search_served`'s only
    approximation is its IVF-PQ semantic stage, and this row measures
    what that approximation costs THE FUSED RANKING (which is what a
    user consumes — per-stage recall rows already exist). recall =
    |exact top-10 ∩ served top-10| / |exact top-10|, one division of
    exact integers.

    Built by CALLING the two registered query functions, so the
    diagnostic measures exactly what ships BY CONSTRUCTION — an edit
    to either hybrid variant propagates here automatically (the
    `pq_recall`/`_sql_refined` sharing stance). The lexical stage is
    therefore computed on both sides; measured cost of that honesty:
    ~0.3 s at sf0.1. The exact side serves from the shared truth
    parquet (`_shared_hybrid_truth` — still built by calling
    `q_hybrid_search`, so the by-construction coupling holds). The
    SERVED side likewise serves from its shared parquet
    (`_shared_hybrid_served` — round 14: the serving stack is timed by
    the registered `hybrid_search_served` row itself; re-running it
    here measured pure duplication, and the builder still calls the
    registered function so the coupling holds)."""
    exact = _shared_hybrid_truth(spark, sf_dir)
    served = _shared_hybrid_served(spark, sf_dir)
    ex = exact.groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("n_exact")
    )
    hit = (
        exact.join(served, ["query_id", "doc_id"], "semi")
        .groupBy("query_id")
        .agg(F.count("*").cast("bigint").alias("n_hit"))
    )
    return (
        ex.join(hit, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_hit"), F.lit(0).cast("bigint")).alias(
                "n_hit"
            ),
            (
                F.coalesce(F.col("n_hit"), F.lit(0).cast("bigint"))
                / F.col("n_exact")
            ).alias("recall"),
        )
    )


def _sql_hybrid_recall() -> str:
    # Both hybrid oracles embed as scoped nested-WITH CTEs, so the
    # diagnostic measures exactly the two registered queries.
    return f"""
WITH exact_h AS ({_sql_hybrid_search()}),
served_h AS ({_sql_hybrid_search_served()}),
ex AS (
  SELECT query_id, count(*)::BIGINT AS n_exact FROM exact_h GROUP BY 1
),
hit AS (
  SELECT e.query_id, count(*)::BIGINT AS n_hit
  FROM exact_h e JOIN served_h s USING (query_id, doc_id)
  GROUP BY 1
)
SELECT ex.query_id, ex.n_exact,
       coalesce(hit.n_hit, 0)::BIGINT AS n_hit,
       coalesce(hit.n_hit, 0)::DOUBLE / ex.n_exact AS recall
FROM ex LEFT JOIN hit USING (query_id)
"""


def q_hybrid_fresh_recall(spark, sf_dir):
    """The self-measuring row for hybrid-over-ingest — the family
    discipline (`hybrid_recall`, `pq_recall`, `minhash_recall`)
    applied to `hybrid_search_fresh`'s TWO approximations at once:
    fresh documents score against STALE background statistics (idf
    from the indexed half) and fresh vectors carry residual codes from
    the indexed half's codebook. recall = per-query |exact hybrid
    top-10 ∩ fresh-serving hybrid top-10| / |exact top-10| against the
    all-exact `hybrid_search` truth (exact BM25 over the full corpus +
    exact brute-force cosine). Built by CALLING the two registered
    query functions, so an edit to either propagates here
    automatically (the exact side via the shared truth parquet —
    `_shared_hybrid_truth` calls `q_hybrid_search`). One division of
    exact integers per query. The FRESH side serves from its shared
    parquet (`_shared_hybrid_fresh` — round 14: the fresh-serving
    stack is timed end-to-end by the registered `hybrid_search_fresh`
    row itself; the builder calls the registered function, so the
    by-construction coupling holds)."""
    exact = _shared_hybrid_truth(spark, sf_dir)
    fresh = _shared_hybrid_fresh(spark, sf_dir)
    ex = exact.groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("n_exact")
    )
    hit = (
        exact.join(fresh, ["query_id", "doc_id"], "semi")
        .groupBy("query_id")
        .agg(F.count("*").cast("bigint").alias("n_hit"))
    )
    return (
        ex.join(hit, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_hit"), F.lit(0).cast("bigint")).alias(
                "n_hit"
            ),
            (
                F.coalesce(F.col("n_hit"), F.lit(0).cast("bigint"))
                / F.col("n_exact")
            ).alias("recall"),
        )
    )


def _sql_hybrid_fresh_recall() -> str:
    # Both hybrid oracles embed as scoped nested-WITH CTEs (the
    # hybrid_recall pattern), so the diagnostic measures exactly the
    # two registered queries.
    return f"""
WITH exact_h AS ({_sql_hybrid_search()}),
fresh_h AS ({_sql_hybrid_search_fresh()}),
ex AS (
  SELECT query_id, count(*)::BIGINT AS n_exact FROM exact_h GROUP BY 1
),
hit AS (
  SELECT e.query_id, count(*)::BIGINT AS n_hit
  FROM exact_h e JOIN fresh_h s USING (query_id, doc_id)
  GROUP BY 1
)
SELECT ex.query_id, ex.n_exact,
       coalesce(hit.n_hit, 0)::BIGINT AS n_hit,
       coalesce(hit.n_hit, 0)::DOUBLE / ex.n_exact AS recall
FROM ex LEFT JOIN hit USING (query_id)
"""


def q_bm25_route(spark, sf_dir):
    """BM25 percolation, batch form (`textops.bm25_route`): the fixed
    term panel STANDS as queries and documents arrive — the crawl-side
    topic-tagging direction of `bm25_search`. Corpus statistics come
    from the indexed half (doc_id % 2 == 0, `textops.bm25_index_
    stats`); the incoming half scores against them with per-term tf
    from a stateless array-filter projection and ONE per-(doc, query)
    fold — the single-aggregation shape the streaming twin runs
    unchanged."""
    panel = spark.createDataFrame(
        textops.BM25_PANEL, "query_id bigint, term string"
    )
    docs = load_table(spark, sf_dir, "documents")
    stats, df_rel = textops.bm25_index_stats(
        docs.where("doc_id % 2 = 0"), panel
    )
    return textops.bm25_route(
        docs.where("doc_id % 2 = 1"), panel, stats, df_rel
    )


def q_bm25_route_streaming(spark, sf_dir):
    """`streaming.windows.streaming_bm25_route`: the identical
    expressions with the incoming half arriving on a file stream —
    stateless tf projection, broadcast static panel/stats, one
    complete-mode aggregation."""
    from ..streaming.windows import streaming_bm25_route

    return streaming_bm25_route(spark, sf_dir)


def _sql_bm25_route() -> str:
    k1, b = textops.BM25_K1, textops.BM25_B
    vals = ", ".join(f"({q}, '{t}')" for q, t in textops.BM25_PANEL)
    idf = "(((n_docs - df) + 0.5::DOUBLE) / (df + 0.5::DOUBLE))"
    tfnorm = (
        f"((tf * {k1 + 1.0!r}::DOUBLE) / (tf + ({k1!r}::DOUBLE"
        f" * ({1.0 - b!r}::DOUBLE + (({b!r}::DOUBLE"
        " * dl) / (total_tokens / n_docs))))))"
    )
    return f"""
WITH panel(query_id, term) AS (VALUES {vals}),
itk AS (
  SELECT doc_id, unnest({_DUCK_WORDS}) AS term FROM documents
  WHERE doc_id % 2 = 0
),
dli AS (SELECT doc_id, count(*)::BIGINT AS dl FROM itk GROUP BY 1),
stats AS (
  SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_tokens
  FROM dli
),
dfr AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM itk
  WHERE term IN (SELECT term FROM panel) GROUP BY 1
),
inc AS (
  SELECT doc_id, {_DUCK_WORDS} AS ws FROM documents WHERE doc_id % 2 = 1
),
pt AS (
  SELECT inc.doc_id, p.query_id, p.term,
         coalesce(dfr.df, 0)::BIGINT AS df,
         stats.n_docs, stats.total_tokens,
         len(list_filter(inc.ws, t -> t = p.term))::BIGINT AS tf,
         len(inc.ws)::BIGINT AS dl
  FROM inc CROSS JOIN panel p
  LEFT JOIN dfr ON dfr.term = p.term CROSS JOIN stats
),
sc AS (
  SELECT doc_id, query_id, term, {idf} * {tfnorm} AS s
  FROM pt WHERE tf > 0
)
SELECT doc_id, query_id, count(*)::BIGINT AS n_terms_hit,
       list_sum(list(s ORDER BY term)) AS score
FROM sc GROUP BY 1, 2
"""


def q_bm25_index_roundtrip(spark, sf_dir):
    """The BM25 background statistics AS A PERSISTED INDEX: the scalar
    frame (N, Σdl) and the per-term document frequencies write to
    parquet and the incoming half routes purely from the re-read
    relations — the percolation service's restart path, completing the
    persisted-index rule (`ivf_index_roundtrip`, `lsh_index_roundtrip`)
    for the retrieval family. Output identical to `bm25_route`
    (round-trip identity) — one oracle string by the registry guard."""
    from ..cache import tracked_mkdtemp

    panel = spark.createDataFrame(
        textops.BM25_PANEL, "query_id bigint, term string"
    )
    docs = load_table(spark, sf_dir, "documents")
    stats, df_rel = textops.bm25_index_stats(
        docs.where("doc_id % 2 = 0"), panel
    )
    d = tracked_mkdtemp("bm25_index_")
    stats.write.mode("overwrite").parquet(f"{d}/stats")
    df_rel.write.mode("overwrite").parquet(f"{d}/df")
    return textops.bm25_route(
        docs.where("doc_id % 2 = 1"),
        panel,
        spark.read.parquet(f"{d}/stats"),
        spark.read.parquet(f"{d}/df"),
    )


# Eval slice for the fuzzy decontamination screen (on the nd corpus,
# so near-dup pairs straddle the split): doc_id % 13 == 7.
_FUZZY_EVAL_MOD, _FUZZY_EVAL_REM = 13, 7


def q_decontaminate_scrub(spark, sf_dir):
    """SURGICAL decontamination (`textops.decontaminate_scrub`): train
    documents REBUILT with their eval-contaminated spans removed — the
    fix, where the three decontamination screens only detect. Train
    spans are the boilerplate family's non-overlapping 16-token
    windows; the eval side indexes OVERLAPPING spans so any alignment
    matches. Same nd corpus and % 13 == 7 eval split as
    `decontaminate_fuzzy`, so the planted exact copies and truncation
    mutants straddling the split ARE the contamination scrubbed."""
    docs = _docs_nd(spark, sf_dir)
    pred = F.col("doc_id") % _FUZZY_EVAL_MOD == _FUZZY_EVAL_REM
    return textops.decontaminate_scrub(docs.where(~pred), docs.where(pred))


def q_decontaminate_fuzzy_canonical(spark, sf_dir):
    """`dedup.cross_corpus_near_duplicates_canonical`: the fuzzy screen
    behind an exact-dedup pre-pass — one representative per distinct
    train text runs the banded screen + exact verify, verdicts
    propagate back through the md5 digest join. Output identical to
    `decontaminate_fuzzy` (same text, same shingles, same jaccard) —
    one oracle string by the registry identity guard. The pipeline-
    ordering lever for the duplicate-heavy corpora decontamination
    meets first: the raw screen's verify prices candidate PAIRS, which
    grow superlinearly with duplication (18.1 s at the 10x replica);
    the pre-pass collapses duplicate families before pairs form."""
    docs = _docs_nd(spark, sf_dir)
    pred = F.col("doc_id") % _FUZZY_EVAL_MOD == _FUZZY_EVAL_REM
    return dedup.cross_corpus_near_duplicates_canonical(
        docs.where(~pred), docs.where(pred), threshold=0.5
    )


def q_decontaminate_scrub_streaming(spark, sf_dir):
    """`streaming.windows.streaming_decontaminate_scrub`: scrub at
    INGEST — the identical single-aggregation expressions with the
    train side arriving on a file stream; the eval span index is
    static, contamination flags ride a stream-static digest join into
    the one per-doc rebuild aggregation."""
    from ..streaming.windows import streaming_decontaminate_scrub

    return streaming_decontaminate_scrub(spark, sf_dir)


def _sql_decontaminate_scrub() -> str:
    w = textops.BOILER_TOKENS
    ev = f"doc_id % {_FUZZY_EVAL_MOD} = {_FUZZY_EVAL_REM}"
    return f"""
WITH docs_nd AS ({_ND}),
wd AS (SELECT doc_id, {_DUCK_WORDS} AS ws FROM docs_nd),
evsp AS (
  SELECT DISTINCT md5(array_to_string(
           list_slice(ws, start, start + {w} - 1), ' ')) AS whash
  FROM (
    -- token-less eval docs contribute nothing (textops.eval_span_index)
    SELECT ws,
           unnest(range(1, greatest(len(ws) - {w} + 1, 1) + 1)) AS start
    FROM wd WHERE {ev} AND len(ws) > 0
  )
),
st AS (
  SELECT doc_id, ws,
         unnest(range(1, greatest(len(ws), 1) + 1, {w})) AS start
  FROM wd WHERE NOT ({ev})
),
sp AS (
  SELECT doc_id, ((start - 1) // {w})::BIGINT AS win_id,
         array_to_string(list_slice(ws, start, start + {w} - 1), ' ')
           AS wtext,
         len(list_slice(ws, start, start + {w} - 1))::BIGINT AS wtok
  FROM st
),
kept AS (SELECT * FROM sp WHERE md5(wtext) NOT IN (SELECT whash FROM evsp)),
rb AS (
  SELECT doc_id, sum(wtok)::BIGINT AS n_kept_tokens,
         string_agg(wtext, ' ' ORDER BY win_id) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT wd.doc_id, len(wd.ws)::BIGINT AS n_tokens,
       coalesce(rb.n_kept_tokens, 0)::BIGINT AS n_kept_tokens,
       coalesce(rb.clean_text, '') AS clean_text
FROM wd LEFT JOIN rb USING (doc_id)
WHERE NOT ({ev})
"""


def q_decontaminate_fuzzy(spark, sf_dir):
    """FUZZY decontamination (`dedup.cross_corpus_near_duplicates`):
    training documents near-duplicating an eval document at 3-gram
    Jaccard >= 0.5 via the cross-corpus MinHash band join — catches the
    paraphrased/truncated contamination `decontaminate`'s exact-8-gram
    screen misses (the nd corpus's truncation mutants ARE that case).
    Split: doc_id % 13 == 7 is the eval side."""
    docs = _docs_nd(spark, sf_dir)
    pred = F.col("doc_id") % _FUZZY_EVAL_MOD == _FUZZY_EVAL_REM
    return dedup.cross_corpus_near_duplicates(
        docs.where(~pred), docs.where(pred), threshold=0.5
    )


SQL_DECONTAMINATE_FUZZY = f"""
WITH {_DUCK_SHINGLE_SET},
sigs AS (
  SELECT doc_id, {_LANES}
  FROM shh GROUP BY doc_id
),
bands AS (
  {_BAND_SELECTS}
),
bt AS (
  SELECT doc_id AS a, band_id, band_key FROM bands
  WHERE doc_id % {_FUZZY_EVAL_MOD} <> {_FUZZY_EVAL_REM}
),
be AS (
  SELECT doc_id AS b, band_id, band_key FROM bands
  WHERE doc_id % {_FUZZY_EVAL_MOD} = {_FUZZY_EVAL_REM}
),
cand AS (SELECT DISTINCT a, b FROM bt JOIN be USING (band_id, band_key)),
inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cand c
  JOIN shh x ON x.doc_id = c.a
  JOIN shh y ON y.doc_id = c.b AND y.sh_hash = x.sh_hash
  GROUP BY c.a, c.b
)
SELECT i2.a, i2.b, i2.i / (sa.n + sb.n - i2.i) AS jaccard
FROM inter i2
JOIN sizes sa ON sa.doc_id = i2.a
JOIN sizes sb ON sb.doc_id = i2.b
WHERE i2.i / (sa.n + sb.n - i2.i) >= 0.5
"""


def q_boilerplate_screen(spark, sf_dir):
    """Boilerplate SCREEN for continuous ingest
    (`textops.boilerplate_screen`): the existing split's span-digest
    index (span DF >= 2 WITHIN the indexed split,
    `textops.boilerplate_index`) probes incoming documents' spans
    through one equi-join + one aggregation — the decide-before-you-pay
    counts an ingest pipeline thresholds on, and the exact plan the
    streaming twin runs."""
    docs = _docs_nd(spark, sf_dir)
    split = F.expr(BLOOM_SPLIT_SPARK)
    idx = textops.boilerplate_index(docs.where(split == 0), min_docs=2)
    return textops.boilerplate_screen(docs.where(split == 1), idx)


def q_boilerplate_screen_streaming(spark, sf_dir):
    """`streaming.windows.streaming_boilerplate_screen`: the identical
    span screen with the incoming split arriving on a file stream —
    stateless span explode, stream-static index join, one aggregation.
    Shares the batch oracle by the registry twin guard."""
    from ..streaming.windows import streaming_boilerplate_screen

    return streaming_boilerplate_screen(spark, sf_dir)


def _sql_boilerplate_screen() -> str:
    w = textops.BOILER_TOKENS
    spans = f"""
  SELECT doc_id,
         md5(array_to_string(list_slice(ws, start, start + {w} - 1), ' '))
           AS whash,
         len(list_slice(ws, start, start + {w} - 1))::BIGINT AS wtok
  FROM (
    SELECT doc_id, ws,
           unnest(range(1, greatest(len(ws), 1) + 1, {w})) AS start
    FROM wsrc
  )"""
    return f"""
WITH docs_nd AS ({_ND}),
wsrc AS (
  SELECT doc_id, {_DUCK_WORDS} AS ws FROM docs_nd
),
isp AS ({spans.replace("FROM wsrc", f"FROM wsrc WHERE {BLOOM_SPLIT_DUCK} = 0")}),
idx AS (
  -- zero-token spans excluded from the index (textops.boilerplate_index)
  SELECT whash FROM isp WHERE wtok > 0
  GROUP BY whash HAVING count(DISTINCT doc_id) >= 2
),
osp AS ({spans.replace("FROM wsrc", f"FROM wsrc WHERE {BLOOM_SPLIT_DUCK} = 1")})
SELECT osp.doc_id,
       count(*)::BIGINT AS n_spans,
       sum(CASE WHEN idx.whash IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_boiler_spans,
       sum(osp.wtok)::BIGINT AS n_tokens,
       sum(CASE WHEN idx.whash IS NOT NULL THEN osp.wtok ELSE 0 END)::BIGINT
         AS n_boiler_tokens
FROM osp LEFT JOIN idx USING (whash)
GROUP BY osp.doc_id
"""


def q_dsir_score(spark, sf_dir):
    """Ingest-time DSIR scoring (`textops.dsir_score`): the
    likelihood-ratio table learns ONCE from the indexed half of the raw
    corpus (target = the English slice), incoming documents resolve
    per-token ratios through a broadcast join and fold in one
    position-ordered aggregation — the single-aggregation shape the
    streaming twin requires."""
    docs = load_table(spark, sf_dir, "documents")
    ratios, default = textops.dsir_bucket_ratios(
        docs.where("doc_id % 2 = 0"), F.col("lang") == "en"
    )
    return textops.dsir_score(docs.where("doc_id % 2 = 1"), ratios, default)


def q_dsir_score_streaming(spark, sf_dir):
    """`streaming.windows.streaming_dsir_score`: identical scoring with
    the incoming half on a file stream — static broadcast ratio table,
    stateless token explode, one aggregation. Shares the batch oracle
    by the registry twin guard."""
    from ..streaming.windows import streaming_dsir_score

    return streaming_dsir_score(spark, sf_dir)


def _sql_dsir_score() -> str:
    b = textops.DSIR_BUCKETS
    h = hash60_sql("t", "'dsir'")
    lw = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"
    return f"""
WITH itk AS (
  SELECT it, {h} % {b} AS bucket
  FROM (
    SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS it,
           unnest({lw}) AS t
    FROM documents WHERE doc_id % 2 = 0
  )
),
bc AS (
  SELECT bucket, count(*)::BIGINT AS rc,
         sum(it)::BIGINT AS tc
  FROM itk GROUP BY 1
),
tot AS (SELECT sum(rc)::BIGINT AS r_total, sum(tc)::BIGINT AS t_total FROM bc),
ratios AS (
  SELECT bc.bucket,
         ((bc.tc + 1) * (tot.r_total + {b}))::DOUBLE
           / ((bc.rc + 1) * (tot.t_total + {b}))::DOUBLE AS r
  FROM bc CROSS JOIN tot
),
dflt AS (
  SELECT (r_total + {b})::DOUBLE / (t_total + {b})::DOUBLE AS r_default
  FROM tot
),
otk AS (
  SELECT doc_id, pos, {hash60_sql("lw[pos]", "'dsir'")} % {b} AS bucket
  FROM (
    SELECT doc_id, lw, unnest(range(1, len(lw) + 1)) AS pos
    FROM (
      SELECT doc_id, {lw} AS lw FROM documents WHERE doc_id % 2 = 1
    )
  )
)
SELECT otk.doc_id, count(*)::BIGINT AS n_tokens,
       list_sum(list(coalesce(ratios.r, dflt.r_default) ORDER BY otk.pos))
         AS dsir_score
FROM otk LEFT JOIN ratios USING (bucket) CROSS JOIN dflt
GROUP BY otk.doc_id
"""


# Eval slice for the SEMANTIC decontamination screen, on the nd
# embedding corpus. Modulus 11 (not the fuzzy screen's 13): the
# planted offsets are +1000000 (≡1 mod 11) for exact copies and
# +2000000 (≡2 mod 11) for perturbations, so BOTH planted pair kinds
# straddle this split (under mod 13 the +2000000 offset is ≡2 with
# originals ≡0 — perturbed pairs would never cross).
_SEM_EVAL_MOD, _SEM_EVAL_REM = 11, 3

# Build-once TRAIN-side quantizer assignment shared by the semantic
# decontamination screen and its recall diagnostic (each previously
# re-learned the identical train-side quantizer — the re-learn pattern
# `_shared_ivfpq_index` closed for IVF-ADC). Parquet-backed so it
# survives `release_cached`; deterministic build → identical results.
_DECON_CELLS_SHARED: dict[tuple, object] = {}


def _shared_decon_cells(spark, sf_dir):
    from ..cache import shared_artifact
    from ..operators.kmeans import ivf_assign_from_index, ivf_quantizer

    def build(d):
        corpus = derive_near_dup_embeddings(
            load_table(spark, sf_dir, "embeddings")
        )
        pred = F.col("vec_id") % _SEM_EVAL_MOD == _SEM_EVAL_REM
        coarse, fine = ivf_quantizer(corpus.where(~pred))
        built = ivf_assign_from_index(coarse, fine, corpus).select(
            "vec_id", "coarse", "fine"
        )
        built.write.mode("overwrite").parquet(f"{d}/cells")
        return spark.read.parquet(f"{d}/cells")

    return shared_artifact(
        _DECON_CELLS_SHARED, spark, sf_dir, "decon_cells_", build
    )


def q_decontaminate_semantic(spark, sf_dir):
    """SEMANTIC decontamination (`similarity.semantic_cross_
    decontaminate`): train docs whose EMBEDDING is near an eval doc's
    (cosine >= 0.9 within the learned (coarse, fine) cells), closing
    the decontamination matrix — exact 8-grams (`decontaminate`),
    fuzzy Jaccard (`decontaminate_fuzzy`), and now meaning-level
    similarity for reworded contamination. The quantizer learns from
    the TRAIN side only and eval probes it through the serving path —
    the realistic index direction. Split: vec_id % 11 == 3 is eval."""
    corpus = derive_near_dup_embeddings(load_table(spark, sf_dir, "embeddings"))
    pred = F.col("vec_id") % _SEM_EVAL_MOD == _SEM_EVAL_REM
    return similarity.semantic_cross_decontaminate(
        corpus, pred, threshold=0.9,
        cells=_shared_decon_cells(spark, sf_dir),
    )


def _sql_decontaminate_semantic() -> str:
    not_eval = f"vec_id % {_SEM_EVAL_MOD} <> {_SEM_EVAL_REM}"
    cos = (
        "list_sum(list_transform(range(1, 65), j -> t.e[j] * v.e[j]))"
        " / (t.nrm * v.nrm)"
    )
    return f"""
WITH emb_nd AS ({_ND_EMB}),
n AS (SELECT vec_id, embedding AS e FROM emb_nd)
{_sql_kmeans_ivf_cells(not_eval)},
m AS (
  SELECT n.vec_id, n.e,
         sqrt(list_sum(list_transform(n.e, x -> x * x))) AS nrm,
         c.coarse, c.fine
  FROM n JOIN cells c USING (vec_id)
)
SELECT t.vec_id AS train_id, v.vec_id AS eval_id, t.coarse, t.fine,
       {cos} AS cosine
FROM m t JOIN m v ON t.coarse = v.coarse AND t.fine = v.fine
WHERE t.vec_id % {_SEM_EVAL_MOD} <> {_SEM_EVAL_REM}
  AND v.vec_id % {_SEM_EVAL_MOD} = {_SEM_EVAL_REM}
  AND {cos} >= 0.9
"""


def q_semantic_decon_recall(spark, sf_dir):
    """Recall of the `decontaminate_semantic` cell-restricted screen vs
    EXACT cross-corpus cosine truth — the same self-measuring rule as
    `fuzzy_decon_recall`: a miss is a (train, eval) pair split across
    (coarse, fine) cells, the SemDeDup blindness, now measured for the
    cross-corpus direction. Truth is exact cosine >= 0.9 over train ×
    a FIXED 32-doc eval panel (smallest seeded-hash eval vec_ids —
    the `pq_recall` discipline; truth over the full eval side would
    grow |train|·|eval|, quadratic at scale). One row per panel doc
    with >= 1 true contaminating pair: (eval_id, n_true, n_found,
    recall); found ⊆ truth by construction (the screen computes the
    same cosine, within cells), so recall is the only loss axis."""
    from ..functions.text import hash60
    from ..operators.similarity import dot64, norm64

    corpus = derive_near_dup_embeddings(load_table(spark, sf_dir, "embeddings"))
    pred = F.col("vec_id") % _SEM_EVAL_MOD == _SEM_EVAL_REM
    nn = corpus.select(
        "vec_id", "embedding", norm64(F.col("embedding")).alias("nrm")
    )
    panel = (
        nn.where(pred)
        .select(
            "vec_id",
            hash60(F.col("vec_id").cast("string"), seed="sdr").alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(32)
        .select("vec_id")
    )
    pv = nn.join(panel, "vec_id").select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("v_emb"),
        F.col("nrm").alias("v_nrm"),
    )
    t = nn.where(~pred).select(
        F.col("vec_id").alias("train_id"),
        F.col("embedding").alias("t_emb"),
        F.col("nrm").alias("t_nrm"),
    )
    cos = dot64(F.col("t_emb"), F.col("v_emb")) / (
        F.col("t_nrm") * F.col("v_nrm")
    )
    truth = (
        t.crossJoin(F.broadcast(pv))
        .where(cos >= 0.9)
        .select("train_id", "eval_id")
    )
    found = (
        similarity.semantic_cross_decontaminate(
            corpus, pred, threshold=0.9,
            cells=_shared_decon_cells(spark, sf_dir),
        )
        .join(panel.withColumnRenamed("vec_id", "eval_id"), "eval_id", "semi")
        .select("train_id", "eval_id", F.lit(1).alias("hit"))
    )
    return (
        truth.join(found, ["train_id", "eval_id"], "left")
        .groupBy("eval_id")
        .agg(
            F.count("*").alias("n_true"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_found"),
        )
        .select(
            "eval_id",
            "n_true",
            "n_found",
            (F.col("n_found") / F.col("n_true")).alias("recall"),
        )
    )


def _sql_semantic_decon_recall() -> str:
    not_eval = f"vec_id % {_SEM_EVAL_MOD} <> {_SEM_EVAL_REM}"
    h = hash60_sql("vec_id::VARCHAR", "'sdr'")
    cell_cos = (
        "list_sum(list_transform(range(1, 65), j -> t.e[j] * v.e[j]))"
        " / (t.nrm * v.nrm)"
    )
    return f"""
WITH emb_nd AS ({_ND_EMB}),
n AS (SELECT vec_id, embedding AS e FROM emb_nd)
{_sql_kmeans_ivf_cells(not_eval)},
nn AS (
  SELECT vec_id, e,
         sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM n
),
m AS (
  SELECT nn.vec_id, nn.e, nn.nrm, c.coarse, c.fine
  FROM nn JOIN cells c USING (vec_id)
),
found AS (
  SELECT t.vec_id AS train_id, v.vec_id AS eval_id
  FROM m t JOIN m v ON t.coarse = v.coarse AND t.fine = v.fine
  WHERE t.vec_id % {_SEM_EVAL_MOD} <> {_SEM_EVAL_REM}
    AND v.vec_id % {_SEM_EVAL_MOD} = {_SEM_EVAL_REM}
    AND {cell_cos} >= 0.9
),
panel AS (
  SELECT vec_id FROM n
  WHERE vec_id % {_SEM_EVAL_MOD} = {_SEM_EVAL_REM}
  ORDER BY {h}, vec_id LIMIT 32
),
truth AS (
  SELECT t.vec_id AS train_id, v.vec_id AS eval_id
  FROM nn t, nn v
  WHERE t.vec_id % {_SEM_EVAL_MOD} <> {_SEM_EVAL_REM}
    AND v.vec_id IN (SELECT vec_id FROM panel)
    AND {cell_cos} >= 0.9
)
SELECT truth.eval_id, count(*)::BIGINT AS n_true,
       sum(CASE WHEN found.train_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_found,
       sum(CASE WHEN found.train_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         / count(*) AS recall
FROM truth LEFT JOIN found USING (train_id, eval_id)
GROUP BY truth.eval_id
"""


def q_fuzzy_decon_recall(spark, sf_dir):
    """Recall of the `decontaminate_fuzzy` banded screen vs EXACT
    cross-corpus Jaccard truth — the self-measuring diagnostic every
    approximate index in this repo ships (`minhash_recall` /
    `ann_recall_*` / `pq_recall` pattern): truth = exact 3-gram
    Jaccard >= 0.5 pairs via the shingle inverted-index join (pairs
    sharing zero shingles have J = 0 and exit naturally) over train ×
    a FIXED 32-doc eval panel (smallest seeded-hash eval doc_ids —
    the `semantic_decon_recall` / `pq_recall` discipline, round 9:
    truth over the FULL eval side grew with |eval|, measured 3.2× at
    the 10× replica; the panel bounds the exact side to a constant
    number of probe documents at any corpus size). The found side is
    the SHIPPED full screen, restricted to the panel after the fact,
    so the diagnostic measures exactly the production operator — and
    it serves from the screen row's pair-shared parquet
    (`_shared_fuzzy_screen` — round 14, guide §1.2: the screen stack
    is timed end-to-end by the registered `decontaminate_fuzzy` row
    itself; re-running it here measured pure duplication, and the
    builder calls the registered function so the by-construction
    coupling holds). One row per panel doc with >= 1 true
    contaminating pair: (b, n_true, n_found, recall)."""
    from ..functions.text import hash60

    docs = _docs_nd(spark, sf_dir)
    pred = F.col("doc_id") % _FUZZY_EVAL_MOD == _FUZZY_EVAL_REM
    train, ev = docs.where(~pred), docs.where(pred)
    panel = (
        ev.select(
            "doc_id",
            hash60(F.col("doc_id").cast("string"), seed="fdr").alias("h"),
        )
        .orderBy("h", "doc_id")
        .limit(32)
        .select("doc_id")
    )
    ht = dedup.hashed_shingle_arrays(train)
    # Truth's eval side restricted BELOW the shingle explode: only the
    # 32 panel documents pay the exact inverted-index join.
    he = dedup.hashed_shingle_arrays(ev.join(F.broadcast(panel), "doc_id"))
    st = ht.select(F.col("doc_id").alias("a"), F.explode("hs").alias("sh"))
    se = he.select(F.col("doc_id").alias("b"), F.explode("hs").alias("sh"))
    sa = ht.select(F.col("doc_id").alias("a"), F.size("hs").alias("na"))
    sb = he.select(F.col("doc_id").alias("b"), F.size("hs").alias("nb"))
    inter = st.join(se, "sh").groupBy("a", "b").agg(F.count("*").alias("i"))
    truth = (
        inter.join(sa, "a")
        .join(sb, "b")
        .where(
            F.col("i") / (F.col("na") + F.col("nb") - F.col("i")) >= 0.5
        )
        .select("a", "b")
    )
    found = (
        _shared_fuzzy_screen(spark, sf_dir)
        .join(F.broadcast(panel.withColumnRenamed("doc_id", "b")), "b", "semi")
        .select("a", "b", F.lit(1).alias("hit"))
    )
    return (
        truth.join(found, ["a", "b"], "left")
        .groupBy("b")
        .agg(
            F.count("*").alias("n_true"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_found"),
        )
        .select(
            "b",
            "n_true",
            "n_found",
            (F.col("n_found") / F.col("n_true")).alias("recall"),
        )
    )


SQL_FUZZY_DECON_RECALL = f"""
WITH {_DUCK_SHINGLE_SET},
panel AS (
  SELECT doc_id FROM docs_nd
  WHERE doc_id % {_FUZZY_EVAL_MOD} = {_FUZZY_EVAL_REM}
  ORDER BY {hash60_sql("doc_id::VARCHAR", "'fdr'")}, doc_id LIMIT 32
),
sigs AS (
  SELECT doc_id, {_LANES}
  FROM shh GROUP BY doc_id
),
bands AS (
  {_BAND_SELECTS}
),
bt AS (
  SELECT doc_id AS a, band_id, band_key FROM bands
  WHERE doc_id % {_FUZZY_EVAL_MOD} <> {_FUZZY_EVAL_REM}
),
be AS (
  SELECT doc_id AS b, band_id, band_key FROM bands
  WHERE doc_id % {_FUZZY_EVAL_MOD} = {_FUZZY_EVAL_REM}
),
cand AS (SELECT DISTINCT a, b FROM bt JOIN be USING (band_id, band_key)),
finter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cand c
  JOIN shh x ON x.doc_id = c.a
  JOIN shh y ON y.doc_id = c.b AND y.sh_hash = x.sh_hash
  GROUP BY c.a, c.b
),
found AS (
  SELECT i2.a, i2.b
  FROM finter i2
  JOIN sizes sa ON sa.doc_id = i2.a
  JOIN sizes sb ON sb.doc_id = i2.b
  WHERE i2.i / (sa.n + sb.n - i2.i) >= 0.5
),
tinter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM shh x
  JOIN shh y ON y.sh_hash = x.sh_hash
  WHERE x.doc_id % {_FUZZY_EVAL_MOD} <> {_FUZZY_EVAL_REM}
    AND y.doc_id IN (SELECT doc_id FROM panel)
  GROUP BY 1, 2
),
truth AS (
  SELECT t.a, t.b
  FROM tinter t
  JOIN sizes sa ON sa.doc_id = t.a
  JOIN sizes sb ON sb.doc_id = t.b
  WHERE t.i / (sa.n + sb.n - t.i) >= 0.5
)
SELECT truth.b, count(*)::BIGINT AS n_true,
       sum(CASE WHEN found.a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_found,
       sum(CASE WHEN found.a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         / count(*) AS recall
FROM truth
LEFT JOIN found ON found.a = truth.a AND found.b = truth.b
GROUP BY truth.b
"""


def q_decontamination_report(spark, sf_dir):
    """The decontamination MATRIX as one per-train-doc report — the
    artifact a curation pipeline actually consumes before shipping a
    corpus: for every train document, the exact-8-gram screen's shared
    gram count (`textops.decontaminate`), the fuzzy MinHash screen's
    verdict (`dedup.cross_corpus_near_duplicates`), and the span
    scrub's token accounting (`textops.decontaminate_scrub`), all on
    the SAME eval split (doc_id % 13 == 7). Three screens, one left
    join each onto the scrub's every-doc spine — composition of
    registered operators, no new machinery. The fuzzy verdicts and the
    scrub spine serve from the pair-shared parquet of their OWN
    registered rows (`_shared_fuzzy_screen` / `_shared_decon_scrub` —
    round 14, guide §1.2: both stacks are already timed end-to-end by
    `decontaminate_fuzzy` / `decontaminate_scrub`; re-running them
    here measured pure duplication, and the builders call the
    registered functions so the coupling holds by construction). The
    exact 8-gram screen stays inline — its %13 split differs from the
    registered `decontaminate` row's split, so no registered row times
    this exact stack."""
    docs = _docs_nd(spark, sf_dir)
    pred = F.col("doc_id") % _FUZZY_EVAL_MOD == _FUZZY_EVAL_REM
    train, ev = docs.where(~pred), docs.where(pred)
    ex = textops.decontaminate(train, ev).select(
        "doc_id", "n_shared_grams"
    )
    fz = (
        _shared_fuzzy_screen(spark, sf_dir)
        .select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("fz", F.lit(True))
    )
    sc = _shared_decon_scrub(spark, sf_dir)
    return (
        sc.join(ex, "doc_id", "left")
        .join(fz, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_kept_tokens",
            F.coalesce(F.col("n_shared_grams"), F.lit(0))
            .cast("bigint")
            .alias("n_shared_grams"),
            F.coalesce(F.col("fz"), F.lit(False)).alias("fuzzy_hit"),
        )
    )


def _sql_decontamination_report() -> str:
    from ..operators import textops as _t

    w = _t.BOILER_TOKENS
    ev = f"doc_id % {_FUZZY_EVAL_MOD} = {_FUZZY_EVAL_REM}"
    return f"""
WITH {_DUCK_SHINGLE_SET},
-- exact 8-gram screen (SQL_DECONTAMINATE shape on the fuzzy split)
trg AS (
  SELECT DISTINCT doc_id, {hash60_sql('sh8')} AS g FROM (
    SELECT doc_id, unnest({_DUCK_SHINGLES8}) AS sh8
    FROM docs_nd WHERE NOT ({ev})
  )
),
evg AS (
  SELECT DISTINCT doc_id AS eval_id, {hash60_sql('sh8')} AS g FROM (
    SELECT doc_id, unnest({_DUCK_SHINGLES8}) AS sh8
    FROM docs_nd WHERE {ev}
  )
),
hot AS (SELECT g FROM evg GROUP BY g HAVING count(*) > {dedup.DEFAULT_MAX_DF}),
evc AS (SELECT * FROM evg WHERE g NOT IN (SELECT g FROM hot)),
ex AS (
  SELECT t.doc_id, count(DISTINCT t.g)::BIGINT AS n_shared_grams
  FROM trg t JOIN evc e ON t.g = e.g GROUP BY t.doc_id
),
-- fuzzy MinHash screen (SQL_DECONTAMINATE_FUZZY shape)
sigs AS (
  SELECT doc_id, {_LANES}
  FROM shh GROUP BY doc_id
),
bands AS (
  {_BAND_SELECTS}
),
bt AS (
  SELECT doc_id AS a, band_id, band_key FROM bands WHERE NOT ({ev})
),
be AS (
  SELECT doc_id AS b, band_id, band_key FROM bands WHERE {ev}
),
cand AS (SELECT DISTINCT a, b FROM bt JOIN be USING (band_id, band_key)),
finter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cand c
  JOIN shh x ON x.doc_id = c.a
  JOIN shh y ON y.doc_id = c.b AND y.sh_hash = x.sh_hash
  GROUP BY c.a, c.b
),
fz AS (
  SELECT DISTINCT i2.a AS doc_id
  FROM finter i2
  JOIN sizes sa ON sa.doc_id = i2.a
  JOIN sizes sb ON sb.doc_id = i2.b
  WHERE i2.i / (sa.n + sb.n - i2.i) >= 0.5
),
-- span scrub (the every-train-doc spine; _sql_decontaminate_scrub shape)
wd AS (SELECT doc_id, {_DUCK_WORDS} AS ws FROM docs_nd),
evsp AS (
  SELECT DISTINCT md5(array_to_string(
           list_slice(ws, start, start + {w} - 1), ' ')) AS whash
  FROM (
    SELECT ws,
           unnest(range(1, greatest(len(ws) - {w} + 1, 1) + 1)) AS start
    FROM wd WHERE {ev} AND len(ws) > 0
  )
),
st AS (
  SELECT doc_id, ws,
         unnest(range(1, greatest(len(ws), 1) + 1, {w})) AS start
  FROM wd WHERE NOT ({ev})
),
sp2 AS (
  SELECT doc_id,
         array_to_string(list_slice(ws, start, start + {w} - 1), ' ')
           AS wtext,
         len(list_slice(ws, start, start + {w} - 1))::BIGINT AS wtok
  FROM st
),
kept AS (SELECT * FROM sp2 WHERE md5(wtext) NOT IN (SELECT whash FROM evsp)),
rb AS (
  SELECT doc_id, sum(wtok)::BIGINT AS n_kept_tokens FROM kept GROUP BY doc_id
)
SELECT wd.doc_id, len(wd.ws)::BIGINT AS n_tokens,
       coalesce(rb.n_kept_tokens, 0)::BIGINT AS n_kept_tokens,
       coalesce(ex.n_shared_grams, 0)::BIGINT AS n_shared_grams,
       (fz.doc_id IS NOT NULL) AS fuzzy_hit
FROM wd
LEFT JOIN rb USING (doc_id)
LEFT JOIN ex USING (doc_id)
LEFT JOIN fz USING (doc_id)
WHERE NOT ({ev})
"""


def q_decon_cells_roundtrip(spark, sf_dir):
    """The TRAIN-side decontamination cell assignment AS A PERSISTED
    INDEX (round 11 — the companion row to `semantic_cells_roundtrip`,
    closing VERDICT r10 item 5 for the whole semantic-cell family):
    take the pair-shared (vec_id, coarse, fine) relation
    (`_shared_decon_cells` — quantizer learned from the train side
    only), WRITE it to parquet, READ it back, and run the semantic
    decontamination screen purely from the on-disk relation. Output
    identical to `decontaminate_semantic` (round-trip identity) — one
    oracle string by the registry guard."""
    from ..cache import tracked_mkdtemp

    corpus = derive_near_dup_embeddings(load_table(spark, sf_dir, "embeddings"))
    pred = F.col("vec_id") % _SEM_EVAL_MOD == _SEM_EVAL_REM
    cells = _shared_decon_cells(spark, sf_dir)
    d = tracked_mkdtemp("decon_cells_rt_")
    cells.write.mode("overwrite").parquet(f"{d}/cells")
    # Identity tag (round 15, ADVICE r14): the operator materializes
    # the member join, so a read-level alias would vanish behind the
    # checkpoint scan — tag the row's OUTPUT instead, keeping the
    # roundtrip's fingerprint distinct from the serving twin's.
    return similarity.semantic_cross_decontaminate(
        corpus,
        pred,
        threshold=0.9,
        cells=spark.read.parquet(f"{d}/cells"),
    ).alias("decon_cells_rt")


PIPELINE_QUERIES: dict[str, tuple] = {
    "decontamination_report": (
        q_decontamination_report,
        _sql_decontamination_report(),
    ),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "decontaminate_fuzzy": (q_decontaminate_fuzzy, SQL_DECONTAMINATE_FUZZY),
    "decontaminate_fuzzy_canonical": (
        q_decontaminate_fuzzy_canonical,
        SQL_DECONTAMINATE_FUZZY,
    ),
    "fuzzy_decon_recall": (q_fuzzy_decon_recall, SQL_FUZZY_DECON_RECALL),
    "decontaminate_semantic": (
        q_decontaminate_semantic,
        _sql_decontaminate_semantic(),
    ),
    "decon_cells_roundtrip": (
        q_decon_cells_roundtrip,
        _sql_decontaminate_semantic(),
    ),
    "semantic_decon_recall": (
        q_semantic_decon_recall,
        _sql_semantic_decon_recall(),
    ),
    "boilerplate_removal": (
        q_boilerplate_removal,
        _sql_boilerplate_removal(),
    ),
    "boilerplate_screen": (q_boilerplate_screen, _sql_boilerplate_screen()),
    "boilerplate_screen_streaming": (
        q_boilerplate_screen_streaming,
        _sql_boilerplate_screen(),
    ),
    "dsir_weights": (q_dsir_weights, _sql_dsir_weights()),
    "dsir_score": (q_dsir_score, _sql_dsir_score()),
    "dsir_score_streaming": (q_dsir_score_streaming, _sql_dsir_score()),
    "bm25_search": (q_bm25_search, _sql_bm25_search()),
    "hybrid_search": (q_hybrid_search, _sql_hybrid_search()),
    "hybrid_search_served": (
        q_hybrid_search_served,
        _sql_hybrid_search_served(),
    ),
    "hybrid_recall": (q_hybrid_recall, _sql_hybrid_recall()),
    "hybrid_search_fresh": (
        q_hybrid_search_fresh,
        _sql_hybrid_search_fresh(),
    ),
    "hybrid_fresh_recall": (
        q_hybrid_fresh_recall,
        _sql_hybrid_fresh_recall(),
    ),
    "bm25_route": (q_bm25_route, _sql_bm25_route()),
    "bm25_route_streaming": (q_bm25_route_streaming, _sql_bm25_route()),
    "bm25_index_roundtrip": (q_bm25_index_roundtrip, _sql_bm25_route()),
    "decontaminate_scrub": (
        q_decontaminate_scrub,
        _sql_decontaminate_scrub(),
    ),
    "decontaminate_scrub_streaming": (
        q_decontaminate_scrub_streaming,
        _sql_decontaminate_scrub(),
    ),
}
