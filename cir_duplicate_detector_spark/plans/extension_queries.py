"""Extension query registry: the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal, event
windows, analytics) bound to the driver testdata, each with a DuckDB
oracle wherever the semantics are SQL-expressible.

Floating-point discipline (everything here is checked by value-hash):
* money-like sums accumulate in DECIMAL (exact, order-independent) and
  cast to double at the end;
* ratios/similarities are single divisions of exact integers;
* cosine scores are sequential double folds, which Spark's aggregate()
  and DuckDB's list_sum() evaluate in the same order (verified).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import hash60_sql
from ..operators import dedup, events, multimodal, similarity, sketches, textops
from ..operators.skew import salted_join
from ..sources.derived import (
    BLOOM_SPLIT_DUCK,
    BLOOM_SPLIT_SPARK,
    PII_CORPUS_SQL,
    derive_near_dup_corpus,
    derive_near_dup_embeddings,
    derive_pii_corpus,
    near_dup_corpus_sql,
    near_dup_embeddings_sql,
)
from ..sources.tables import load_table
from ..streaming.windows import (
    streaming_exact_dedup,
    streaming_tumbling_window,
)

_ND = near_dup_corpus_sql("duckdb")

_DUCK_WORDS = "list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')"

# word-3-gram shingles (functions.text.word_shingles twin)
_DUCK_SHINGLES = f"""
CASE WHEN len({_DUCK_WORDS}) < 3 THEN [text]
     ELSE [array_to_string(list_slice({_DUCK_WORDS}, i, i + 2), ' ')
           for i in range(1, len({_DUCK_WORDS}) - 1)] END
"""


def _docs_nd(spark, sf_dir):
    return derive_near_dup_corpus(load_table(spark, sf_dir, "documents"))


# ------------------------------------------------------------------ dedup

def q_dedup_exact(spark, sf_dir):
    # `members` joined to a string: the driver's canonicalizer cannot
    # hash array cells (see plans.core_queries._joined).
    return dedup.exact_duplicates(_docs_nd(spark, sf_dir)).select(
        "text_hash",
        F.array_join(
            F.transform("members", lambda m: m.cast("string")), "|"
        ).alias("members"),
        "group_size",
    )


SQL_DEDUP_EXACT = f"""
WITH docs_nd AS ({_ND})
SELECT md5(text) AS text_hash,
       array_to_string(list_sort(list(doc_id)), '|') AS members,
       count(*) AS group_size
FROM docs_nd GROUP BY md5(text) HAVING count(*) > 1
"""


_DUCK_SHINGLE_SET = f"""
docs_nd AS ({_ND}),
sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id, unnest({_DUCK_SHINGLES}) AS sh FROM docs_nd
  )
),
shh AS (SELECT doc_id, {hash60_sql('sh')} AS sh_hash FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id)
"""


def q_dedup_minhash(spark, sf_dir):
    return dedup.minhash_near_duplicates(_docs_nd(spark, sf_dir), threshold=0.5)


def _lane_sql(j: int) -> str:
    a, b = dedup._lane_params(j)
    p = dedup.MINHASH_P
    return f"({a} * (sh_hash % {p}) + {b}) % {p}"


_LANES = ",\n    ".join(
    f"min({_lane_sql(j)}) AS m{j}" for j in range(dedup.MINHASH_K)
)
_BAND_ROWS = dedup.MINHASH_K // dedup.LSH_BANDS
_BAND_SELECTS = "\n  UNION ALL\n".join(
    f"""SELECT doc_id, {b} AS band_id, md5({" || ',' || ".join(
        f"cast(m{b * _BAND_ROWS + r} as string)" for r in range(_BAND_ROWS)
    )}) AS band_key FROM sigs"""
    for b in range(dedup.LSH_BANDS)
)

SQL_DEDUP_MINHASH = f"""
WITH {_DUCK_SHINGLE_SET},
sigs AS (
  SELECT doc_id, {_LANES}
  FROM shh GROUP BY doc_id
),
bands AS (
  {_BAND_SELECTS}
),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r USING (band_id, band_key)
  WHERE l.doc_id < r.doc_id
),
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


def q_dup_clusters(spark, sf_dir):
    """Transitive duplicate clusters: connected components over the
    MinHash near-dup pairs (reference semantics stop at pairwise lists,
    e.g. ``pdq_hash.py:48-65``; a curation pipeline needs the closure
    to keep exactly one document per group). Spark side is iterative
    min-label propagation (`operators.dedup.connected_components`);
    the oracle walks the same edges with a recursive CTE."""
    pairs = dedup.minhash_near_duplicates(
        _docs_nd(spark, sf_dir), threshold=0.5
    ).select("a", "b")
    cc = dedup.connected_components(pairs, check_every=2)  # duplicate graphs converge in 2-3 rounds; halve the count jobs
    sizes = cc.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "cluster_size",
    )


# Shared oracle CTE chain: MinHash LSH pairs -> recursive-CTE connected
# components. Used by dup_clusters and cluster_representatives.
_DUCK_CC_CTES = f"""{_DUCK_SHINGLE_SET},
sigs AS (
  SELECT doc_id, {_LANES}
  FROM shh GROUP BY doc_id
),
bands AS (
  {_BAND_SELECTS}
),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r USING (band_id, band_key)
  WHERE l.doc_id < r.doc_id
),
inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cand c
  JOIN shh x ON x.doc_id = c.a
  JOIN shh y ON y.doc_id = c.b AND y.sh_hash = x.sh_hash
  GROUP BY c.a, c.b
),
mh_pairs AS (
  SELECT i2.a, i2.b
  FROM inter i2
  JOIN sizes sa ON sa.doc_id = i2.a
  JOIN sizes sb ON sb.doc_id = i2.b
  WHERE i2.i / (sa.n + sb.n - i2.i) >= 0.5
),
dedges AS (
  SELECT a, b FROM mh_pairs UNION ALL SELECT b AS a, a AS b FROM mh_pairs
),
walk(node, label) AS (
  SELECT a, a FROM dedges
  UNION
  SELECT e.b, w.label FROM walk w JOIN dedges e ON e.a = w.node
),
cc AS (SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node)"""

SQL_DUP_CLUSTERS = f"""
WITH RECURSIVE {_DUCK_CC_CTES}
SELECT cc.doc_id, cc.cluster_id, s.n AS cluster_size
FROM cc
JOIN (SELECT cluster_id, count(*) AS n FROM cc GROUP BY cluster_id) s
  USING (cluster_id)
"""


def q_cluster_representatives(spark, sf_dir):
    """The end-to-end curation decision a training-data pipeline runs:
    near-dup pairs (MinHash+LSH) → transitive clusters (connected
    components) → ONE representative per cluster, chosen as the
    highest-quality member (composite `textops.quality_score_expr`,
    ties to the smallest doc_id). Output: one row per cluster with its
    representative, size, and the representative's quality.

    Scale shape: everything upstream is the already-audited
    banded-equi-join + label-propagation machinery; the selection adds
    one broadcast-sized join (cluster members × quality) and one window
    over cluster_id — both shuffle-partitioned on cluster keys. Quality
    doubles are computed with the identical fold order on both engines
    (bit-exact, like `text_quality`), so the argmax is deterministic
    cross-engine.
    """
    from pyspark.sql import Window

    docs = _docs_nd(spark, sf_dir)
    pairs = dedup.minhash_near_duplicates(docs, threshold=0.5).select("a", "b")
    cc = dedup.connected_components(pairs, check_every=2)  # duplicate graphs converge in 2-3 rounds; halve the count jobs
    members = cc.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    scored = members.join(
        docs.select("doc_id", textops.quality_score_expr().alias("q")),
        "doc_id",
    )
    w_rank = Window.partitionBy("cluster_id").orderBy(
        F.col("q").desc(), F.col("doc_id").asc()
    )
    w_all = Window.partitionBy("cluster_id")
    return (
        scored.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("cluster_size", F.count("*").over(w_all).cast("bigint"))
        .where(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_doc_id"),
            "cluster_size",
            F.col("q").alias("rep_quality"),
        )
    )


def _sql_cluster_representatives() -> str:
    return f"""
WITH RECURSIVE {_DUCK_CC_CTES},
q AS (
  SELECT doc_id,
         {_DUCK_QUALITY_EXPR} AS q
  FROM docs_nd
),
m AS (SELECT cc.doc_id, cc.cluster_id, q.q FROM cc JOIN q USING (doc_id)),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY cluster_id ORDER BY q DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY cluster_id)::BIGINT AS cluster_size
  FROM m
)
SELECT cluster_id, doc_id AS rep_doc_id, cluster_size, q AS rep_quality
FROM r WHERE rn = 1
"""


def _jaccard_scored(spark, sf_dir):
    """Shared probe-vs-corpus exact-Jaccard scoring over the df-capped
    shingle inverted index (consumed by the threshold filter and the
    top-k retrieval). Unlike `_containment_screen`, the index is NOT
    materialized here: an interleaved warm-JIT A/B measured no gain
    (3.30 s either way at sf0.1 — exchange reuse already covers the
    repeated references on this narrower two-column index), so the
    plan stays fully lazy."""
    docs = _docs_nd(spark, sf_dir)
    shingles = dedup.df_capped(
        dedup.shingle_sets(docs).select("doc_id", "sh_hash"), "sh_hash"
    )
    probes = shingles.where(
        (F.col("doc_id") % 50 == 0) & (F.col("doc_id") < 1_000_000)
    )
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        probes.select(F.col("doc_id").alias("a"), "sh_hash")
        .join(shingles.select(F.col("doc_id").alias("b"), "sh_hash"), "sh_hash")
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a"
        )
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
        .withColumn("jaccard", F.col("i") / (F.col("na") + F.col("nb") - F.col("i")))
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Probe-vs-corpus exact Jaccard via the shingle inverted index.
    The index is df-capped (``dedup.df_capped``) before the equi-join:
    a shingle shared by d docs emits O(d·probes) join rows, so hot
    boilerplate shingles are dropped like stop-words on both engines
    (similarity is computed over the capped shingle universe)."""
    return (
        _jaccard_scored(spark, sf_dir)
        .where(F.col("jaccard") >= 0.3)
        .select("a", "b", "jaccard")
    )


SQL_DEDUP_NGRAM_JACCARD = f"""
WITH {_DUCK_SHINGLE_SET},
shc AS (
  SELECT doc_id, sh_hash FROM shh
  QUALIFY count(*) OVER (PARTITION BY sh_hash) <= {dedup.DEFAULT_MAX_DF}
),
sizesc AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM shc x JOIN shc y ON y.sh_hash = x.sh_hash AND x.doc_id <> y.doc_id
  WHERE x.doc_id % 50 = 0 AND x.doc_id < 1000000
  GROUP BY x.doc_id, y.doc_id
)
SELECT i2.a, i2.b, i2.i / (sa.n + sb.n - i2.i) AS jaccard
FROM inter i2
JOIN sizesc sa ON sa.doc_id = i2.a
JOIN sizesc sb ON sb.doc_id = i2.b
WHERE i2.i / (sa.n + sb.n - i2.i) >= 0.3
"""


def q_doc_topk_similar(spark, sf_dir):
    """Query-by-document retrieval: for each probe document, the top-5
    most similar corpus documents by exact shingle Jaccard — the
    "find me near-duplicates of THIS doc" lookup an annotation/triage
    workflow runs (reference use case: given a flagged item, surface
    its variants). Same inverted-index equi-join as the Jaccard dedup
    pass (candidates = docs sharing ≥1 shingle hash, never all-pairs,
    df-capped so hot shingles can't cross-product the join); a
    per-probe window takes the top-k, ties to the smaller doc_id."""
    from pyspark.sql import Window

    scored = _jaccard_scored(spark, sf_dir)
    w = Window.partitionBy("a").orderBy(
        F.col("jaccard").desc(), F.col("b").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 5)
        .select("a", "b", "rank", "jaccard")
    )


SQL_DOC_TOPK_SIMILAR = f"""
WITH {_DUCK_SHINGLE_SET},
shc AS (
  SELECT doc_id, sh_hash FROM shh
  QUALIFY count(*) OVER (PARTITION BY sh_hash) <= {dedup.DEFAULT_MAX_DF}
),
sizesc AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM shc x JOIN shc y ON y.sh_hash = x.sh_hash AND x.doc_id <> y.doc_id
  WHERE x.doc_id % 50 = 0 AND x.doc_id < 1000000
  GROUP BY x.doc_id, y.doc_id
),
scored AS (
  SELECT i2.a, i2.b, i2.i / (sa.n + sb.n - i2.i) AS jaccard
  FROM inter i2
  JOIN sizesc sa ON sa.doc_id = i2.a
  JOIN sizesc sb ON sb.doc_id = i2.b
)
SELECT a, b, rank, jaccard FROM (
  SELECT *, row_number() OVER (
    PARTITION BY a ORDER BY jaccard DESC, b
  )::BIGINT AS rank FROM scored
) WHERE rank <= 5
"""


def _containment_screen(shingles):
    """Shared containment tail over a df-capped shingle index. The
    index feeds THREE subplans (probe side, probe sizes, corpus side);
    Spark recomputes uncached subtrees per reference (exchange reuse
    does not fire across the differing projections), so the index is
    materialized ONCE — interleaved warm-JIT A/B at sf0.1 measured
    5.95 → 4.72 s on the canonical variant (min-of-3 per arm, A/B/A/B
    order so JIT warm-up cannot masquerade as the gain)."""
    from ..cache import materialize

    shingles = materialize(shingles)
    probes = shingles.where(
        (F.col("doc_id") % 50 == 0) | (F.col("doc_id") >= 1_000_000)
    ).withColumnRenamed("doc_id", "a")
    sizes_a = probes.groupBy("a").agg(F.count("*").alias("na"))
    inter = (
        probes.join(
            shingles.withColumnRenamed("doc_id", "b"), "sh_hash"
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.join(F.broadcast(sizes_a), "a")
        .withColumn("containment", F.col("i") / F.col("na"))
        .where(F.col("containment") >= 0.8)
        .select("a", "b", "containment")
    )


def q_dedup_containment(spark, sf_dir):
    """Asymmetric set containment |A∩B|/|A| — catches documents fully
    embedded in larger ones, which symmetric Jaccard under-scores (the
    truncation mutants in the derived corpus are exactly this shape:
    containment(mutant ⊂ original) = 1.0). The shingle index is
    df-capped before the join (see q_dedup_ngram_jaccard)."""
    docs = _docs_nd(spark, sf_dir)
    return _containment_screen(
        dedup.df_capped(dedup.shingle_sets(docs), "sh_hash")
    )


SQL_DEDUP_CONTAINMENT = f"""
WITH {_DUCK_SHINGLE_SET},
shc AS (
  SELECT doc_id, sh_hash FROM shh
  QUALIFY count(*) OVER (PARTITION BY sh_hash) <= {dedup.DEFAULT_MAX_DF}
),
probes AS (
  SELECT doc_id AS a, sh_hash FROM shc
  WHERE doc_id % 50 = 0 OR doc_id >= 1000000
),
inter AS (
  SELECT p.a, s.doc_id AS b, count(*) AS i
  FROM probes p JOIN shc s ON s.sh_hash = p.sh_hash AND s.doc_id <> p.a
  GROUP BY p.a, s.doc_id
)
SELECT i2.a, i2.b, i2.i / sa.n AS containment
FROM inter i2
JOIN (SELECT a, count(*) AS n FROM probes GROUP BY a) sa ON sa.a = i2.a
WHERE i2.i / sa.n >= 0.8
"""


def q_dedup_containment_canonical(spark, sf_dir):
    """The containment screen BEHIND the exact-dedup pre-pass
    (`dedup.canonicalize_exact`) — the production ordering: exact
    copies collapse first (one md5 window), so duplicate groups never
    multiply the inverted-index join output quadratically. Measured on
    the 10x replica: 213 s raw -> 12.7 s composed (~17x)."""
    docs = dedup.canonicalize_exact(_docs_nd(spark, sf_dir))
    return _containment_screen(
        dedup.df_capped(dedup.shingle_sets(docs), "sh_hash")
    )


SQL_DEDUP_CONTAINMENT_CANONICAL = f"""
WITH docs_nd AS ({_ND}),
canon AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           min(doc_id) OVER (PARTITION BY md5(text)) AS canonical
    FROM docs_nd
  ) WHERE doc_id = canonical
),
sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id, unnest({_DUCK_SHINGLES}) AS sh FROM canon
  )
),
shh AS (SELECT doc_id, {hash60_sql('sh')} AS sh_hash FROM sh),
shc AS (
  SELECT doc_id, sh_hash FROM shh
  QUALIFY count(*) OVER (PARTITION BY sh_hash) <= {dedup.DEFAULT_MAX_DF}
),
probes AS (
  SELECT doc_id AS a, sh_hash FROM shc
  WHERE doc_id % 50 = 0 OR doc_id >= 1000000
),
inter AS (
  SELECT p.a, s.doc_id AS b, count(*) AS i
  FROM probes p JOIN shc s ON s.sh_hash = p.sh_hash AND s.doc_id <> p.a
  GROUP BY p.a, s.doc_id
)
SELECT i2.a, i2.b, i2.i / sa.n AS containment
FROM inter i2
JOIN (SELECT a, count(*) AS n FROM probes GROUP BY a) sa ON sa.a = i2.a
WHERE i2.i / sa.n >= 0.8
"""


def q_dedup_simhash(spark, sf_dir):
    return dedup.simhash_signatures(_docs_nd(spark, sf_dir))


_SIMHASH_VOTES = ",\n    ".join(
    f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN cnt ELSE -cnt END) AS b{i}"
    for i in range(dedup.SIMHASH_BITS)
)
_SIMHASH_BITS_EXPR = " + ".join(
    f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)"
    for i in range(dedup.SIMHASH_BITS)
)

SQL_DEDUP_SIMHASH = f"""
WITH docs_nd AS ({_ND}),
tok AS (
  SELECT doc_id, tok, count(*) AS cnt, {hash60_sql('tok')} AS h
  FROM (SELECT doc_id, unnest({_DUCK_WORDS}) AS tok FROM docs_nd)
  GROUP BY doc_id, tok
),
voted AS (
  SELECT doc_id, {_SIMHASH_VOTES}
  FROM tok GROUP BY doc_id
)
SELECT doc_id, ({_SIMHASH_BITS_EXPR})::BIGINT AS simhash FROM voted
"""


def q_dedup_simhash_pairs(spark, sf_dir):
    return dedup.simhash_near_duplicates(_docs_nd(spark, sf_dir), max_bits=3)


# Oracle is the brute-force self-join; the engine's banded candidate
# join must reproduce it exactly (pigeonhole: dist<=3 with 4x15-bit
# bands guarantees a shared band).
SQL_DEDUP_SIMHASH_PAIRS = f"""
WITH docs_nd AS ({_ND}),
tok AS (
  SELECT doc_id, tok, count(*) AS cnt, {hash60_sql('tok')} AS h
  FROM (SELECT doc_id, unnest({_DUCK_WORDS}) AS tok FROM docs_nd)
  GROUP BY doc_id, tok
),
voted AS (
  SELECT doc_id, {_SIMHASH_VOTES}
  FROM tok GROUP BY doc_id
),
sim AS (SELECT doc_id, ({_SIMHASH_BITS_EXPR})::BIGINT AS simhash FROM voted)
SELECT a.doc_id AS a, b.doc_id AS b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS dist
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def q_dedup_exact_normalized(spark, sf_dir):
    """Exact dedup AFTER text canonicalization (case / punctuation /
    whitespace) — catches trivially-reformatted duplicates byte-identity
    misses, at the same single-shuffle hash-agg cost."""
    return dedup.exact_duplicates_normalized(_docs_nd(spark, sf_dir)).select(
        "norm_hash",
        F.array_join(
            F.transform("members", lambda m: m.cast("string")), "|"
        ).alias("members"),
        "group_size",
    )


_DUCK_NORM_TEXT = (
    "trim(regexp_replace(regexp_replace(lower(text), "
    "'[.,;:!?''\"()\\[\\]{}<>]+', ' ', 'g'), '\\s+', ' ', 'g'))"
)

def q_dedup_exact_streaming(spark, sf_dir):
    return streaming_exact_dedup(spark, sf_dir)


# Digest/count projection of SQL_DEDUP_EXACT (the streaming form keeps
# per-digest state, not member lists — bounded state by construction).
SQL_DEDUP_EXACT_STREAMING = f"""
WITH docs_nd AS ({_ND})
SELECT md5(text) AS text_hash, count(*) AS group_size
FROM docs_nd GROUP BY 1 HAVING count(*) > 1
"""


SQL_DEDUP_EXACT_NORMALIZED = f"""
WITH docs_nd AS ({_ND})
SELECT md5({_DUCK_NORM_TEXT}) AS norm_hash,
       array_to_string(list_sort(list(doc_id)), '|') AS members,
       count(*) AS group_size
FROM docs_nd GROUP BY 1 HAVING count(*) > 1
"""


DOCS_JSONL_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def q_docs_jsonl_roundtrip(spark, sf_dir):
    """Second source format end-to-end: stage the documents table as
    JSONL (the training-data interchange format), read it back through
    the schema-declared quarantine reader (`sources.jsonl`), return the
    clean rows. The oracle is simply the documents table — equality IS
    the round-trip guarantee (types, unicode, embedded newlines all
    survive the JSON escape)."""
    import hashlib

    from ..sources.jsonl import read_documents_jsonl, write_documents_jsonl

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    stage = "/tmp/docs_jsonl_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    write_documents_jsonl(docs, stage)
    clean, _quarantined = read_documents_jsonl(spark, stage, DOCS_JSONL_SCHEMA)
    return clean


SQL_DOCS_JSONL_ROUNDTRIP = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""


def q_docs_csv_roundtrip(spark, sf_dir):
    """Third source format end-to-end: stage the documents table as
    headerless CSV, read it back through the schema-declared quarantine
    reader (`sources.csv`), return the clean rows. Oracle = the
    documents table; equality IS the round-trip guarantee (quoting,
    commas, unicode survive the CSV escape — embedded newlines are the
    documented non-goal, see the module docstring)."""
    import hashlib

    from ..sources.csv import read_documents_csv, write_documents_csv

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    stage = "/tmp/docs_csv_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    write_documents_csv(docs, stage)
    clean, _quarantined = read_documents_csv(spark, stage, DOCS_JSONL_SCHEMA)
    return clean


SQL_DOCS_CSV_ROUNDTRIP = SQL_DOCS_JSONL_ROUNDTRIP


def q_docs_orc_roundtrip(spark, sf_dir):
    """Third columnar interchange format end-to-end: stage the documents
    table as ORC (Spark-native, predicate-pushdown-capable like parquet
    — the format a warehouse-adjacent pipeline exchanges with Hive/Trino
    estates), read it back with the declared schema, return the rows.
    ORC is schema-carrying binary, so there is no corrupt-LINE
    quarantine concept (that is the JSONL/CSV readers' job); schema is
    still DECLARED on read — inference never runs. Oracle = the
    documents table; equality IS the round-trip guarantee."""
    import hashlib

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    stage = "/tmp/docs_orc_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    docs.write.mode("overwrite").orc(stage)
    return spark.read.schema(DOCS_JSONL_SCHEMA).orc(stage)


SQL_DOCS_ORC_ROUNDTRIP = SQL_DOCS_JSONL_ROUNDTRIP


def q_doc_chunks(spark, sf_dir):
    """Overlapping token-window chunking over raw documents — the
    pre-training tokenize/chunk scan (`textops.chunk_documents`).
    Zero-shuffle per-row work; output carries chunk digests."""
    return textops.chunk_documents(load_table(spark, sf_dir, "documents"))


def _sql_doc_chunks() -> str:
    c, s = textops.CHUNK_TOKENS, textops.CHUNK_STEP
    return f"""
WITH w AS (
  SELECT doc_id, {_DUCK_WORDS} AS ws FROM documents
),
st AS (
  SELECT doc_id, ws,
         unnest(range(1, greatest(len(ws), 1) + 1, {s})) AS chunk_start
  FROM w
)
SELECT doc_id,
       ((chunk_start - 1) // {s})::BIGINT AS chunk_id,
       chunk_start::BIGINT AS chunk_start,
       len(list_slice(ws, chunk_start, chunk_start + {c} - 1))::BIGINT
         AS n_chunk_tokens,
       md5(array_to_string(
         list_slice(ws, chunk_start, chunk_start + {c} - 1), ' '))
         AS chunk_hash
FROM st
"""


# Synthetic varied-domain URL over doc_id — ONE dialect-shared SQL
# expression (Spark `F.expr` and the DuckDB oracle use the identical
# string, so the fixture cannot drift): scheme variants, optional
# `www.`, 11 domains, optional `:8080` port, path, optional fragment.
_SYN_URL = (
    "(CASE doc_id % 3 WHEN 0 THEN '' WHEN 1 THEN 'https://' "
    "ELSE 'http://' END) "
    "|| (CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END) "
    "|| 'site' || cast(doc_id % 11 as string) || '.org' "
    "|| (CASE WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END) "
    "|| '/p/' || cast(doc_id % 23 as string) "
    "|| (CASE WHEN doc_id % 2 = 1 THEN '#f' || cast(doc_id as string) "
    "ELSE '' END)"
)


def q_url_domain_stats(spark, sf_dir):
    """Per-domain crawl-curation stats: how many URLs land on each
    registrable domain and how much intra-domain duplication
    (normalized-URL collisions) there is — the aggregation that drives
    per-domain sampling / blocking decisions in a crawl pipeline.
    One grouped aggregate; the count-distinct expands map-side."""
    from ..functions.url import normalize_url, url_domain

    docs = load_table(spark, sf_dir, "documents")
    u = F.expr(_SYN_URL)
    rows = docs.select(
        url_domain(u).alias("domain"),
        normalize_url(u).alias("base_url"),
    )
    return rows.groupBy("domain").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("base_url").alias("n_distinct"),
        (
            (F.count("*") - F.countDistinct("base_url")) / F.count("*")
        ).alias("dup_ratio"),
    )


def _sql_url_domain_stats() -> str:
    from ..functions.url import normalize_url_sql, url_domain_sql

    return f"""
WITH rows_u AS (
  SELECT {url_domain_sql(_SYN_URL)} AS domain,
         {normalize_url_sql(_SYN_URL)} AS base_url
  FROM documents
)
SELECT domain, count(*) AS n_urls,
       count(DISTINCT base_url) AS n_distinct,
       (count(*) - count(DISTINCT base_url)) / count(*) AS dup_ratio
FROM rows_u GROUP BY domain
"""


# ------------------------------------------------------- similarity search

def _knn_probe_df(spark, sf_dir):
    """Probe set as a DataFrame (every 20th vec_id) — rides the plan as
    a broadcast semi-join (`similarity._probe_restrict`), no driver-side
    ``collect()`` / ``isin`` literal that grows with scale factor.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id").where("vec_id % 20 = 0")


def q_knn_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.knn_bruteforce(emb, _knn_probe_df(spark, sf_dir), k=5)


# Shared ANN oracle fragments — SQL_KNN_BRUTEFORCE, SQL_KNN_LSH and
# SQL_ANN_RECALL_LSH are all composed from these, so the recall
# diagnostic measures EXACTLY the index the knn queries ship (a
# hand-kept copy could silently diverge and still oracle-validate).

_DUCK_VEC_N = """
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
"""

_DUCK_BF_SCORED = """
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, 65), j -> q.e[j] * c.e[j]))
           / (q.nrm * c.nrm) AS cosine
  FROM n q, n c
  WHERE q.vec_id % 20 = 0 AND q.vec_id <> c.vec_id
"""

SQL_KNN_BRUTEFORCE = f"""
WITH n AS ({_DUCK_VEC_N}),
scored AS ({_DUCK_BF_SCORED})
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
  )::BIGINT AS rank FROM scored
) WHERE rank <= 5
"""


def q_knn_lsh(spark, sf_dir):
    # Approximate by construction (bucket-local candidates), but fully
    # deterministic: the oracle replicates the SRP sketch bit-for-bit,
    # so even the approximate path is value-hash-checked.
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.knn_lsh(emb, _knn_probe_df(spark, sf_dir), k=5)


def _srp_planes_values(n_planes: int = similarity.N_PLANES) -> str:
    rows = []
    for p in range(n_planes):
        w = ", ".join(
            str(float(similarity.srp_weight(p, d))) for d in range(64)
        )
        rows.append(f"({p}, [{w}])")
    return ", ".join(rows)


# Shared CTE: per-vector SRP bucket, same fold order as the Spark side
# (list_sum over list_transform == aggregate over zip_with).
_DUCK_SRP_BUCKETED = f"""
n AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
),
planes AS (SELECT * FROM (VALUES {_srp_planes_values()}) t(p, w)),
nb AS (
  SELECT vec_id, e, nrm,
         sum(CASE WHEN list_sum(list_transform(range(1, 65), j -> e[j] * w[j])) > 0
                  THEN 1 << p ELSE 0 END)::BIGINT AS bucket
  FROM n CROSS JOIN planes
  GROUP BY vec_id, e, nrm
)
"""

# Banded twin of similarity.srp_band_buckets: plane p belongs to band
# p // BITS and contributes bit 1 << (p % BITS) to that band's bucket.
_LSH_N_PLANES = similarity.LSH_BANDS * similarity.LSH_BAND_BITS
_LSH_BITS = similarity.LSH_BAND_BITS

# Banded-SRP candidate generation + exact re-scoring, as a reusable
# CTE chain ending in `lsh_scored` (expects an `n` CTE in scope).
_DUCK_LSH_CANDS = f"""
planes AS (SELECT * FROM (VALUES {_srp_planes_values(_LSH_N_PLANES)}) t(p, w)),
nb AS (
  SELECT vec_id, e, nrm, p // {_LSH_BITS} AS band_id,
         sum(CASE WHEN list_sum(list_transform(range(1, 65), j -> e[j] * w[j])) > 0
                  THEN 1 << (p % {_LSH_BITS}) ELSE 0 END)::BIGINT AS bucket
  FROM n CROSS JOIN planes
  GROUP BY vec_id, e, nrm, p // {_LSH_BITS}
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM nb q JOIN nb c ON q.band_id = c.band_id AND q.bucket = c.bucket
  WHERE q.vec_id % 20 = 0 AND q.vec_id <> c.vec_id
),
lsh_scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         list_sum(list_transform(range(1, 65), j -> q.e[j] * c.e[j]))
           / (q.nrm * c.nrm) AS cosine
  FROM cand
  JOIN n q ON q.vec_id = cand.query_id
  JOIN n c ON c.vec_id = cand.neighbor_id
)"""

SQL_KNN_LSH = f"""
WITH n AS ({_DUCK_VEC_N}),
{_DUCK_LSH_CANDS}
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
  )::BIGINT AS rank FROM lsh_scored
) WHERE rank <= 5
"""


def q_ann_recall_lsh(spark, sf_dir):
    """Self-measuring ANN quality: recall@5 of the banded SRP-LSH path
    against the exact brute-force ranking, per probe — the "measure,
    don't guess" diagnostic a pipeline runs before trusting an
    approximate index (pytest pins recall FLOORS in
    `tests/test_ann_recall.py`; this exposes the same measurement as a
    driver-checked query). Both sides are deterministic, so per-probe
    recall is value-hash-checkable like any exact query.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    probes = _knn_probe_df(spark, sf_dir)
    bf = similarity.knn_bruteforce(emb, probes, k=5).select(
        "query_id", "neighbor_id"
    )
    lsh = similarity.knn_lsh(emb, probes, k=5).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        bf.join(lsh, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_true"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
        )
        .select(
            "query_id",
            "n_true",
            "n_hit",
            (F.col("n_hit") / F.col("n_true")).alias("recall"),
        )
    )


SQL_ANN_RECALL_LSH = f"""
WITH n AS ({_DUCK_VEC_N}),
bf_scored AS ({_DUCK_BF_SCORED}),
bf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
    ) AS rank FROM bf_scored
  ) WHERE rank <= 5
),
{_DUCK_LSH_CANDS},
lsh AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
    ) AS rank FROM lsh_scored
  ) WHERE rank <= 5
)
SELECT bf.query_id, count(*) AS n_true,
       sum(CASE WHEN lsh.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_hit,
       sum(CASE WHEN lsh.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         / count(*) AS recall
FROM bf LEFT JOIN lsh
  ON bf.query_id = lsh.query_id AND bf.neighbor_id = lsh.neighbor_id
GROUP BY bf.query_id
"""


def q_knn_pq_adc(spark, sf_dir):
    """PQ-ADC approximate kNN (`operators.pq`): 8×8-dim product
    quantization with a FIXED 256-codeword codebook per subspace
    (smallest vec_ids — corpus-size-independent, the property that
    keeps encode O(N·256) instead of the O(N²) a corpus-fraction sample
    degenerates to), ADC scoring via the (subspace, code) equi-join.
    Probe set = every 100th vec_id as a DataFrame (the ADC lookup table
    is Q·M·K rows and ships as a broadcast — scale the probe side by
    sharding queries, not by widening this table)."""
    from ..operators import pq

    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.select("vec_id").where("vec_id % 100 = 0")
    return pq.knn_pq_adc(emb, probe, k=5)


def _sql_knn_pq_adc() -> str:
    from ..operators import pq as _pq

    m, sd, kcw = _pq.PQ_M, _pq.PQ_SUBDIM, _pq.PQ_CODEWORDS
    pd_pivots = ", ".join(
        f"sum(CASE WHEN p.subspace = {i} THEN p.pd END) AS pd{i}"
        for i in range(m)
    )
    adc_sum = " + ".join(f"pd{i}" for i in range(m))
    l2 = (
        "list_sum(list_transform(range(1, {n}), "
        "j -> ({a}[s.m * {sd} + j] - {b}[s.m * {sd} + j]) "
        "* ({a}[s.m * {sd} + j] - {b}[s.m * {sd} + j])))"
    )
    return f"""
WITH n AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
subspaces AS (SELECT unnest(range(0, {m})) AS m),
cw AS (SELECT vec_id, e FROM n ORDER BY vec_id LIMIT {kcw}),
cdist AS (
  SELECT v.vec_id, s.m AS subspace, c.vec_id AS cid,
         {l2.format(n=sd + 1, sd=sd, a="v.e", b="c.e")} AS d
  FROM n v, subspaces s, cw c
),
codes AS (
  SELECT vec_id, subspace, cid AS code FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, subspace ORDER BY d, cid
    ) AS rn FROM cdist
  ) WHERE rn = 1
),
partials AS (
  SELECT q.vec_id AS query_id, s.m AS subspace, c.vec_id AS code,
         {l2.format(n=sd + 1, sd=sd, a="q.e", b="c.e")} AS pd
  FROM n q, subspaces s, cw c
  WHERE q.vec_id % 100 = 0
),
pairs AS (
  SELECT p.query_id, k.vec_id AS neighbor_id, {pd_pivots}
  FROM codes k
  JOIN partials p ON p.subspace = k.subspace AND p.code = k.code
  WHERE p.query_id <> k.vec_id
  GROUP BY 1, 2
),
adc AS (SELECT query_id, neighbor_id, {adc_sum} AS adc_dist FROM pairs)
SELECT query_id, neighbor_id, rank, adc_dist FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY adc_dist, neighbor_id
  )::BIGINT AS rank FROM adc
) WHERE rank <= 5
"""


def _sql_pq_lloyd(
    iters: int,
    salts: int,
    subdim: int,
    kcw: int,
    sub_src: str = "sub",
    seed_src: str = "n",
) -> str:
    """CTE chain ``pcent0 .. pcent{iters}`` learning per-subspace PQ
    codewords with ``iters`` GROUPED Lloyd rounds — the SQL twin of
    `operators.pq.pq_codebook_learned`. Expects open CTEs
    ``subspaces`` (m), ``{sub_src}`` (vec_id, subspace, sub — the
    TRAINING subvectors) and ``{seed_src}`` (vec_id, e — the seed
    relation; the operator's `train_mod` sampling maps to passing the
    sample CTE for both). Seeds = the deterministic smallest-``kcw``
    vec_ids (`pq_codebook`'s sample, cluster id = seed vec_id); every
    stage keys on (subspace, cid) — one aggregation tree for all M
    subspaces, mirroring the operator's single grouped job. Fold
    discipline is `_sql_kmeans_lloyd`'s: sequential list_sum
    distances, argmin ties to the smallest cid, two-phase sorted-fold
    means. Returned string starts with a comma (appends to an open
    WITH)."""
    l2 = (
        f"list_sum(list_transform(range(1, {subdim + 1}), "
        "j -> (v.sub[j] - c.csub[j]) * (v.sub[j] - c.csub[j])))"
    )
    parts = [
        f""",
pcent0 AS (
  SELECT sp.m AS subspace, c.vec_id AS cid,
         list_transform(range(1, {subdim + 1}),
                        j -> c.e[sp.m * {subdim} + j]) AS csub
  FROM (SELECT vec_id, e FROM {seed_src} ORDER BY vec_id LIMIT {kcw}) c,
       subspaces sp
)"""
    ]
    for i in range(iters):
        parts.append(
            f""",
pscore{i} AS (
  SELECT v.vec_id, v.subspace, c.cid, {l2} AS d
  FROM {sub_src} v JOIN pcent{i} c USING (subspace)
),
pbest{i} AS (
  SELECT vec_id, subspace, cid FROM (
    SELECT vec_id, subspace, cid,
           row_number() OVER (
             PARTITION BY vec_id, subspace ORDER BY d, cid
           ) AS rn
    FROM pscore{i}
  ) WHERE rn = 1
),
ppe{i} AS (
  SELECT s.vec_id, s.subspace, b.cid, j.j AS pos, s.sub[j.j] AS val
  FROM {sub_src} s JOIN pbest{i} b USING (vec_id, subspace)
  CROSS JOIN (SELECT unnest(range(1, {subdim + 1})) AS j) j
),
pp1_{i} AS (
  SELECT subspace, cid, pos, vec_id % {salts} AS salt,
         list_sum(list(val ORDER BY vec_id)) AS psum,
         count(*)::BIGINT AS pn
  FROM ppe{i} GROUP BY 1, 2, 3, 4
),
pp2_{i} AS (
  SELECT subspace, cid, pos,
         list_sum(list(psum ORDER BY salt)) AS sm,
         sum(pn)::BIGINT AS cnt
  FROM pp1_{i} GROUP BY 1, 2, 3
),
pcent{i + 1} AS (
  SELECT subspace, cid, list(sm / cnt ORDER BY pos) AS csub
  FROM pp2_{i} GROUP BY 1, 2
)"""
        )
    return "".join(parts)


def _sql_ivf_pq_chain(
    probes_body: str = "SELECT vec_id AS query_id, e FROM n"
    " WHERE vec_id % 100 = 0",
    topk: int = 5,
) -> str:
    """CTE chain (appends to an open WITH providing ``n``) ending in
    ``ivfpq`` = (query_id, neighbor_id, rank, adc_dist) — the SQL twin
    of `operators.pq.knn_ivf_pq` (RESIDUAL encoding: PQ quantizes
    ``v − centroid(cell(v))``, the query's ADC table is per probed
    cell), shared by the `knn_ivf_pq` oracle and the `pq_recall`
    diagnostic so the recall row measures EXACTLY the index the search
    query ships. ``probes_body`` parametrizes the probe relation (the
    search query scales probes with the corpus; the recall diagnostic
    pins a fixed-size panel)."""
    from ..operators import kmeans, pq as _pq

    m, sd, kcw = _pq.IVFPQ_M, _pq.IVFPQ_SUBDIM, _pq.PQ_CODEWORDS
    nprobe = _pq.IVFPQ_NPROBE
    cb_iters = _pq.PQ_LLOYD_ITERS
    iters, salts = kmeans.KM_ITERS, kmeans.KM_SALTS
    smod = kmeans.KM_IVF_SAMPLE_MOD
    dim = m * sd
    k_sqrt = "(SELECT greatest(2, CAST(floor(sqrt(count(*))) AS BIGINT)) FROM s)"
    pd_pivots = ", ".join(
        f"sum(CASE WHEN subspace = {i} THEN pd END) AS pd{i}"
        for i in range(m)
    )
    adc_sum = " + ".join(f"pd{i}" for i in range(m))
    probe_cell_dist = (
        f"list_sum(list_transform(range(1, {dim + 1}),"
        " j -> (p.e[j] - coarse.c[j]) * (p.e[j] - coarse.c[j])))"
    )
    code_l2 = (
        f"list_sum(list_transform(range(1, {sd + 1}),"
        " j -> (v.sub[j] - c.csub[j]) * (v.sub[j] - c.csub[j])))"
    )
    partial_l2 = (
        f"list_sum(list_transform(range(1, {sd + 1}),"
        f" j -> (q.e[c.subspace * {sd} + j] - c.csub[j])"
        f" * (q.e[c.subspace * {sd} + j] - c.csub[j])))"
    )
    return f""",
s AS (SELECT vec_id, e FROM n WHERE vec_id % {smod} = 0)
{_sql_kmeans_lloyd('s', k_sqrt, iters, salts)},
coarse AS (SELECT cluster AS coarse, c FROM cent{iters}),
assigned AS (
  SELECT vec_id, coarse FROM (
    SELECT n.vec_id, coarse.coarse,
           row_number() OVER (
             PARTITION BY n.vec_id ORDER BY {_KM_DIST}, coarse.coarse
           ) AS rn
    FROM n, coarse
  ) WHERE rn = 1
),
resid AS (
  SELECT n.vec_id,
         list_transform(range(1, {dim + 1}), j -> n.e[j] - co.c[j]) AS e
  FROM n JOIN assigned a USING (vec_id) JOIN coarse co USING (coarse)
),
rs AS (SELECT vec_id, e FROM resid WHERE vec_id % {smod} = 0),
probes AS ({probes_body}),
pcells AS (
  SELECT query_id, coarse FROM (
    SELECT p.query_id, coarse.coarse,
           row_number() OVER (
             PARTITION BY p.query_id
             ORDER BY {probe_cell_dist}, coarse.coarse
           ) AS rn
    FROM probes p, coarse
  ) WHERE rn <= {nprobe}
),
qresid AS (
  SELECT pc.query_id, pc.coarse,
         list_transform(range(1, {dim + 1}), j -> p.e[j] - co.c[j]) AS e
  FROM pcells pc JOIN probes p USING (query_id)
  JOIN coarse co USING (coarse)
),
subspaces AS (SELECT unnest(range(0, {m})) AS m),
sub AS (
  SELECT vec_id, sp.m AS subspace,
         list_transform(range(1, {sd + 1}), j -> e[sp.m * {sd} + j]) AS sub
  FROM resid, subspaces sp
),
tsub AS (SELECT * FROM sub WHERE vec_id % {smod} = 0)
{_sql_pq_lloyd(cb_iters, salts, sd, kcw, sub_src='tsub', seed_src='rs')},
codes AS (
  SELECT vec_id, subspace, cid AS code FROM (
    SELECT v.vec_id, v.subspace, c.cid,
           row_number() OVER (
             PARTITION BY v.vec_id, v.subspace ORDER BY {code_l2}, c.cid
           ) AS rn
    FROM sub v JOIN pcent{cb_iters} c USING (subspace)
  ) WHERE rn = 1
),
partials AS (
  SELECT q.query_id, q.coarse, c.subspace, c.cid AS code, {partial_l2} AS pd
  FROM qresid q, pcent{cb_iters} c
),
cand AS (
  SELECT pc.query_id, pc.coarse, a.vec_id AS neighbor_id
  FROM pcells pc JOIN assigned a USING (coarse)
  WHERE pc.query_id <> a.vec_id
),
prows AS (
  SELECT cd.query_id, cd.neighbor_id, k.subspace, pt.pd
  FROM cand cd
  JOIN codes k ON k.vec_id = cd.neighbor_id
  JOIN partials pt ON pt.query_id = cd.query_id AND pt.coarse = cd.coarse
    AND pt.subspace = k.subspace AND pt.code = k.code
),
ppairs AS (
  SELECT query_id, neighbor_id, {pd_pivots} FROM prows GROUP BY 1, 2
),
padc AS (
  SELECT query_id, neighbor_id, {adc_sum} AS adc_dist FROM ppairs
),
ivfpq AS (
  SELECT query_id, neighbor_id, rank, adc_dist FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY adc_dist, neighbor_id
    )::BIGINT AS rank FROM padc
  ) WHERE rank <= {topk}
)"""


def q_knn_ivf_pq(spark, sf_dir):
    """IVF-ADC in one query (`operators.pq.knn_ivf_pq`): Lloyd coarse
    quantizer (√-scaled k on the deterministic 1/4 sample) restricts
    candidates to the 16 nearest inverted lists per probe; a Lloyd-
    LEARNED per-subspace PQ codebook (16 subspaces × 256 codewords, 2
    grouped Lloyd rounds over the `pq_codebook` seeds) scores them by
    asymmetric distance over RESIDUALS (v − cell centroid — the
    standard IVF-ADC formulation; round 8) — the composed learned
    index real 100 TB ANN ships, with its measured recall registered
    alongside as `pq_recall` (config chosen by the measured sweeps in
    `pq.IVFPQ_M`'s comment: ADC recall 0.19 → 0.46)."""
    from ..operators import pq

    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.select("vec_id").where("vec_id % 100 = 0")
    return pq.knn_ivf_pq(emb, probe, k=5)


def _sql_knn_ivf_pq() -> str:
    return f"""
WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
{_sql_ivf_pq_chain()}
SELECT query_id, neighbor_id, rank, adc_dist FROM ivfpq
"""


# ADC shortlist size feeding the exact re-rank. 20 → 64 in round 9: the
# r8 verdict's sweep showed the candidate ceiling (not the encoding)
# bound refined recall at 0.62; with nprobe=16 the (16, 64) point
# measures refined recall@5 = 0.91 at flat latency (curve in
# `pq.IVFPQ_M`'s comment and COVERAGE.md).
PQ_REFINE = 64


def q_knn_ivf_pq_refined(spark, sf_dir):
    """Two-stage IVF-ADC retrieval (`operators.pq.knn_ivf_pq_refined`):
    the composed learned index shortlists 64 candidates per probe by
    asymmetric distance (codes only), then an exact re-rank over just
    those refine·|probes| original vectors keeps the final 5 — the
    production recipe that recovers most quantization loss without
    touching vectors at scan time (measured refined recall@5 0.91 vs
    0.46 raw ADC at the shipped nprobe=16/refine=64 point). Same
    corpus-scaled probes as `knn_ivf_pq`; `pq_recall` measures both
    stages."""
    from ..operators import pq

    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.select("vec_id").where("vec_id % 100 = 0")
    return pq.knn_ivf_pq_refined(emb, probe, k=5, refine=PQ_REFINE)


_SQL_L2_QC = (
    "list_sum(list_transform(range(1, 65),"
    " j -> (q.e[j] - c.e[j]) * (q.e[j] - c.e[j])))"
)


def _sql_refined(topk: int) -> str:
    """CTE chain appending the exact re-rank to an open WITH that ends
    in ``ivfpq`` (the ADC shortlist): ``refined`` = final top-``topk``
    by true squared-L2. Shared by the `knn_ivf_pq_refined` oracle and
    `pq_recall` so the recall row measures exactly the shipped query."""
    return f""",
rr AS (
  SELECT s.query_id, s.neighbor_id, {_SQL_L2_QC} AS l2sq
  FROM ivfpq s
  JOIN n q ON q.vec_id = s.query_id
  JOIN n c ON c.vec_id = s.neighbor_id
),
refined AS (
  SELECT query_id, neighbor_id, rank, l2sq FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY l2sq, neighbor_id
    )::BIGINT AS rank FROM rr
  ) WHERE rank <= {topk}
)"""


def _sql_knn_ivf_pq_refined() -> str:
    return f"""
WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
{_sql_ivf_pq_chain(topk=PQ_REFINE)}
{_sql_refined(5)}
SELECT query_id, neighbor_id, rank, l2sq FROM refined
"""


def q_pq_recall(spark, sf_dir):
    """Recall@5 of BOTH IVF-ADC stages vs EXACT squared-L2 — the metric
    ADC approximates: ``recall_adc`` for the raw ADC top-5 and
    ``recall_refined`` for the exact re-rank of the same 20-candidate
    shortlist, computed from ONE shared shortlist (the shortlist plan
    is materialized once; the ADC top-5 is its rank ≤ 5 prefix).
    Completes the self-measuring matrix (`ann_recall_lsh` /
    `ann_recall_ivf` / `semantic_recall_learned` / `minhash_recall`):
    every approximate index ships its own oracle-checked recall row,
    and the refined column shows what the re-rank stage buys.

    Probes are a FIXED-SIZE deterministic panel (the 32 smallest
    seeded-hash vec_ids — a distributed top-k, not a window), NOT the
    corpus-scaled ``% 100`` rule the search queries use: the exact
    side costs |panel|·N distances, so a corpus-growing probe count
    would make the diagnostic quadratic (measured 154 s at the 10×
    replica under ``% 100``; the panel keeps it linear — the same
    fixed-fraction discipline as `minhash_recall`'s probe sample)."""
    from ..cache import materialize
    from ..functions.text import hash60
    from ..operators import pq

    emb = load_table(spark, sf_dir, "embeddings")
    probe = (
        emb.select("vec_id", hash60(F.col("vec_id").cast("string"),
                                    seed="pqr").alias("h"))
        .orderBy("h", "vec_id")
        .limit(32)
        .select("vec_id")
    )
    bf = pq.knn_l2_bruteforce(emb, probe, k=5).select(
        "query_id", "neighbor_id"
    )
    short = materialize(pq.knn_ivf_pq(emb, probe, k=PQ_REFINE))
    adc = short.where(F.col("rank") <= 5).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit_adc")
    )
    ref = pq.pq_refine(emb, short, k=5).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit_ref")
    )
    return (
        bf.join(adc, ["query_id", "neighbor_id"], "left")
        .join(ref, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_true"),
            F.sum(F.coalesce(F.col("hit_adc"), F.lit(0))).alias("n_hit_adc"),
            F.sum(F.coalesce(F.col("hit_ref"), F.lit(0))).alias(
                "n_hit_refined"
            ),
        )
        .select(
            "query_id",
            "n_true",
            "n_hit_adc",
            (F.col("n_hit_adc") / F.col("n_true")).alias("recall_adc"),
            "n_hit_refined",
            (F.col("n_hit_refined") / F.col("n_true")).alias(
                "recall_refined"
            ),
        )
    )


def _sql_pq_recall() -> str:
    h = hash60_sql("vec_id::VARCHAR", "'pqr'")
    panel = f"SELECT vec_id, e FROM n ORDER BY {h}, vec_id LIMIT 32"
    return f"""
WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
{_sql_ivf_pq_chain(
    probes_body=f"SELECT vec_id AS query_id, e FROM ({panel})",
    topk=PQ_REFINE,
)}
{_sql_refined(5)},
adc AS (SELECT query_id, neighbor_id FROM ivfpq WHERE rank <= 5),
bfs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_SQL_L2_QC} AS l2sq
  FROM ({panel}) q, n c
  WHERE q.vec_id <> c.vec_id
),
bf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY l2sq, neighbor_id
    ) AS rank FROM bfs
  ) WHERE rank <= 5
)
SELECT bf.query_id, count(*) AS n_true,
       sum(CASE WHEN adc.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_hit_adc,
       sum(CASE WHEN adc.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         / count(*) AS recall_adc,
       sum(CASE WHEN refined.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_hit_refined,
       sum(CASE WHEN refined.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         / count(*) AS recall_refined
FROM bf
LEFT JOIN adc
  ON bf.query_id = adc.query_id AND bf.neighbor_id = adc.neighbor_id
LEFT JOIN refined
  ON bf.query_id = refined.query_id AND bf.neighbor_id = refined.neighbor_id
GROUP BY bf.query_id
"""


def q_knn_ivf(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.knn_ivf(emb, _knn_probe_df(spark, sf_dir), k=5)


def q_knn_ivf_learned(spark, sf_dir):
    """IVF search over LEARNED (Lloyd) centroids — `similarity.
    knn_ivf_learned`: same probe path as knn_cosine_ivf, centroids
    learned on the deterministic 1/4 sample instead of mod-sampled."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.knn_ivf_learned(emb, _knn_probe_df(spark, sf_dir), k=5)


def _sql_knn_ivf_learned() -> str:
    from ..operators import kmeans

    iters, salts = kmeans.KM_ITERS, kmeans.KM_SALTS
    # sqrt-scaled coarse k derived from the sample (kmeans.sqrt_sample_k twin)
    k = "(SELECT greatest(2, CAST(floor(sqrt(count(*))) AS BIGINT)) FROM s)"
    smod = kmeans.KM_IVF_SAMPLE_MOD
    return f"""
WITH nn AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
),
n AS (SELECT vec_id, e FROM nn),
s AS (SELECT vec_id, e FROM n WHERE vec_id % {smod} = 0)
{_sql_kmeans_lloyd('s', k, iters, salts)},
cent AS (
  SELECT cluster AS cid, c AS ce,
         sqrt(list_sum(list_transform(c, x -> x * x))) AS cnrm
  FROM cent{iters}
),
sc AS (
  SELECT nn.vec_id, nn.e, nn.nrm, cent.cid,
         list_sum(list_transform(range(1, 65), j -> nn.e[j] * cent.ce[j]))
           / (nn.nrm * cent.cnrm) AS ccos
  FROM nn CROSS JOIN cent
),
member AS (
  SELECT vec_id AS neighbor_id, e, nrm, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid)
              AS rn FROM sc
  ) WHERE rn = 1
),
probe_lists AS (
  SELECT vec_id AS query_id, e AS qe, nrm AS qnrm, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid)
              AS rn
    FROM sc WHERE vec_id % 20 = 0
  ) WHERE rn <= 3
),
scored AS (
  SELECT p.query_id, m.neighbor_id,
         list_sum(list_transform(range(1, 65), j -> p.qe[j] * m.e[j]))
           / (p.qnrm * m.nrm) AS cosine
  FROM probe_lists p JOIN member m USING (cid)
  WHERE p.query_id <> m.neighbor_id
)
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
  )::BIGINT AS rank FROM scored
) WHERE rank <= 5
"""


SQL_KNN_IVF = """
WITH n AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
),
cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n WHERE vec_id % 40 = 0),
sc AS (
  SELECT n.vec_id, n.e, n.nrm, c.cid,
         list_sum(list_transform(range(1, 65), j -> n.e[j] * c.ce[j]))
           / (n.nrm * c.cnrm) AS ccos
  FROM n CROSS JOIN cent c
),
member AS (
  SELECT vec_id AS neighbor_id, e, nrm, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid)
              AS rn FROM sc
  ) WHERE rn = 1
),
probe_lists AS (
  SELECT vec_id AS query_id, e AS qe, nrm AS qnrm, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid)
              AS rn
    FROM sc WHERE vec_id % 20 = 0
  ) WHERE rn <= 3
),
scored AS (
  SELECT p.query_id, m.neighbor_id,
         list_sum(list_transform(range(1, 65), j -> p.qe[j] * m.e[j]))
           / (p.qnrm * m.nrm) AS cosine
  FROM probe_lists p JOIN member m USING (cid)
  WHERE p.query_id <> m.neighbor_id
)
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
  )::BIGINT AS rank FROM scored
) WHERE rank <= 5
"""


def q_embedding_near_dup(spark, sf_dir):
    corpus = derive_near_dup_embeddings(load_table(spark, sf_dir, "embeddings"))
    return similarity.embedding_near_duplicates(corpus, threshold=0.95)


_ND_EMB = near_dup_embeddings_sql("duckdb")

SQL_EMBEDDING_NEAR_DUP = f"""
WITH emb_nd AS ({_ND_EMB}),
n AS (
  SELECT vec_id, embedding AS e,
         sqrt(list_sum(list_transform(embedding, x -> x * x))) AS nrm
  FROM emb_nd
),
planes AS (SELECT * FROM (VALUES {_srp_planes_values()}) t(p, w)),
nb AS (
  SELECT vec_id, e, nrm,
         sum(CASE WHEN list_sum(list_transform(range(1, 65), j -> e[j] * w[j])) > 0
                  THEN 1 << p ELSE 0 END)::BIGINT AS bucket
  FROM n CROSS JOIN planes
  GROUP BY vec_id, e, nrm
)
SELECT a.vec_id AS a, b.vec_id AS b,
       list_sum(list_transform(range(1, 65), j -> a.e[j] * b.e[j]))
         / (a.nrm * b.nrm) AS cosine
FROM nb a JOIN nb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_sum(list_transform(range(1, 65), j -> a.e[j] * b.e[j]))
        / (a.nrm * b.nrm) >= 0.95
"""


# ------------------------------------------------------------ text analysis

def q_text_quality(spark, sf_dir):
    return textops.text_quality(load_table(spark, sf_dir, "documents"))


_STOP_EN = textops.lang_pattern(textops.STOPWORDS_EN)

# THE oracle-side copy of `textops.quality_score_expr` (inline form
# over `text`). Every oracle needing the composite score interpolates
# this one string — the Spark side funnels through one
# quality_score_expr(), and hand-keeping several SQL copies
# IEEE-identical is exactly the drift this prevents.
_DUCK_QUALITY_EXPR = f"""0.4 * least(len(regexp_extract_all(text, '{_STOP_EN}'))
                     / len({_DUCK_WORDS}) * 4, 1.0)
         + 0.3 * least(cast(len({_DUCK_WORDS}) as double) / 100.0, 1.0)
         + 0.3 * (1.0 - least(len(regexp_extract_all(text, '[.,;:!?]'))
                              / length(text) * 10, 1.0))"""

SQL_TEXT_QUALITY = f"""
WITH t AS (
  SELECT doc_id,
         length(text)::BIGINT AS n_chars,
         len({_DUCK_WORDS})::BIGINT AS n_words,
         len(regexp_extract_all(text, '[.,;:!?]'))::BIGINT AS punct,
         len(regexp_extract_all(text, '{_STOP_EN}'))::BIGINT AS stop
  FROM documents
)
SELECT doc_id, n_chars, n_words,
       (n_chars - (n_words - 1)) / n_words AS avg_word_len,
       punct / n_chars AS punct_ratio,
       stop / n_words AS stopword_ratio,
       0.4 * least(stop / n_words * 4, 1.0)
       + 0.3 * least(cast(n_words as double) / 100.0, 1.0)
       + 0.3 * (1.0 - least(punct / n_chars * 10, 1.0)) AS quality_score
FROM t
"""


def q_token_count(spark, sf_dir):
    return textops.token_counts(load_table(spark, sf_dir, "documents"))


SQL_TOKEN_COUNT = f"""
SELECT doc_id,
       len({_DUCK_WORDS})::BIGINT AS n_tokens_ws,
       len(regexp_extract_all(text, '{textops.BPE_PATTERN}'))::BIGINT AS n_tokens_bpe
FROM documents
"""


def q_lang_id(spark, sf_dir):
    return textops.lang_id(load_table(spark, sf_dir, "documents"))


def _sql_lang_id() -> str:
    scores = {
        lang: f"len(regexp_extract_all(lower(text), '{textops.lang_pattern(ws)}'))::BIGINT"
        for lang, ws in textops.LANG_LEXICONS
    }
    score_cols = ",\n       ".join(
        f"{expr} AS score_{lang}" for lang, expr in scores.items()
    )
    langs = [lang for lang, _ in textops.LANG_LEXICONS]
    best = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    cascade = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN score_{l} = {best} THEN '{l}'" for l in langs
    ) + " END"
    return f"""
WITH s AS (
  SELECT doc_id, {score_cols}
  FROM documents
)
SELECT doc_id, {", ".join(f"score_{l}" for l in langs)}, {cascade} AS lang_pred
FROM s
"""


SQL_LANG_ID = _sql_lang_id()


def q_doc_fingerprint(spark, sf_dir):
    # Widen the single-file scan: the per-row shingle/md5 work is CPU-
    # dense and would otherwise run at the scan's file-split width.
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return textops.doc_fingerprint(docs)


SQL_DOC_FINGERPRINT = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id, unnest(
      CASE WHEN length(text) < 8 THEN [text]
           ELSE [substr(text, i, 8) for i in range(1, length(text) - 6)] END
    ) AS sh FROM documents
  )
),
h AS (SELECT doc_id, {hash60_sql('sh')} AS h FROM sh)
SELECT doc_id, fp_rank, h AS fp_hash FROM (
  SELECT doc_id, h,
         row_number() OVER (PARTITION BY doc_id ORDER BY h)::BIGINT AS fp_rank
  FROM h
) WHERE fp_rank <= 4
"""


def q_substring_dup(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return textops.substring_duplicates(docs)


SQL_SUBSTRING_DUP = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id, unnest(
      CASE WHEN length(text) < 8 THEN [text]
           ELSE [substr(text, i, 8) for i in range(1, length(text) - 6)] END
    ) AS sh FROM documents
  )
),
h AS (SELECT doc_id, {hash60_sql('sh')} AS h FROM sh),
fp AS (
  SELECT doc_id, h AS fp_hash FROM (
    SELECT doc_id, h,
           row_number() OVER (PARTITION BY doc_id ORDER BY h) AS fp_rank
    FROM h
  ) WHERE fp_rank <= 4
),
fpc AS (
  SELECT doc_id, fp_hash FROM fp
  QUALIFY count(*) OVER (PARTITION BY fp_hash) <= {dedup.DEFAULT_MAX_DF}
)
SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_shared
FROM fpc a JOIN fpc b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2
"""


def q_pii_redact(spark, sf_dir):
    """PII scrub over the planted-PII corpus (the raw synthetic texts
    carry none): per-doc entity counts + the fully redacted text."""
    return textops.pii_redact(
        derive_pii_corpus(load_table(spark, sf_dir, "documents"))
    )


def _sql_pii_redact() -> str:
    counts = ",\n       ".join(
        f"len(regexp_extract_all(text, '{pat}'))::BIGINT AS n_{name}s"
        for name, pat, _ in textops.PII_PATTERNS
    )
    red = "text"
    for _, pat, token in textops.PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return f"""
WITH pii AS ({PII_CORPUS_SQL})
SELECT doc_id,
       {counts},
       {red} AS redacted
FROM pii
"""


def q_ngram_topk(spark, sf_dir):
    """Most frequent word bigrams per language — corpus statistics for
    boilerplate discovery."""
    return textops.ngram_topk(load_table(spark, sf_dir, "documents"), n=2, k=5)


SQL_NGRAM_TOPK = f"""
WITH g AS (
  SELECT lang, unnest(
    CASE WHEN len({_DUCK_WORDS}) < 2 THEN [text]
         ELSE [array_to_string(list_slice({_DUCK_WORDS}, i, i + 1), ' ')
               for i in range(1, len({_DUCK_WORDS}))] END
  ) AS gram FROM documents
),
c AS (SELECT lang, gram, count(*) AS cnt FROM g GROUP BY lang, gram)
SELECT lang, gram, cnt, rank FROM (
  SELECT lang, gram, cnt,
         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, gram)::BIGINT
           AS rank
  FROM c
) WHERE rank <= 5
"""


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-language sampling (en 1/2, others 1/4) by a
    seeded content hash — reproducible across engines, unlike RNG-
    based df.sample."""
    return textops.stratified_sample(load_table(spark, sf_dir, "documents"))


_SAMPLE_HASH = hash60_sql("CAST(doc_id AS STRING)", "'sample'")

SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang FROM documents
WHERE CASE WHEN lang = 'en' THEN {_SAMPLE_HASH} % 2 = 0
           ELSE {_SAMPLE_HASH} % 4 = 0 END
"""


def _duck_fp_cte(src: str, prefix: str) -> str:
    """Bottom-4 fingerprint CTE pair over ``src`` (textops
    doc_fingerprint twin), names prefixed to allow two instances in
    one WITH list."""
    return f"""{prefix}sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id, unnest(
      CASE WHEN length(text) < 8 THEN [text]
           ELSE [substr(text, i, 8) for i in range(1, length(text) - 6)] END
    ) AS sh FROM {src}
  )
),
{prefix}fp AS (
  SELECT doc_id, fp_hash FROM (
    SELECT doc_id, {hash60_sql('sh')} AS fp_hash,
           row_number() OVER (
             PARTITION BY doc_id ORDER BY {hash60_sql('sh')}
           ) AS fp_rank
    FROM {prefix}sh
  ) WHERE fp_rank <= 4
)"""


def q_dedup_incremental(spark, sf_dir):
    """Incremental ingest dedup: a batch of derived mutants/copies
    (doc_id >= 1M, all rejectable) plus genuinely-new documents
    (reversed texts, +3M, all admissible) screened against the
    original corpus — exact md5 anti-join plus a bounded
    fingerprint-overlap near-dup screen. Non-vacuous by construction:
    the result is exactly the fresh docs."""
    docs = _docs_nd(spark, sf_dir)
    corpus = docs.where(F.col("doc_id") < 1_000_000)
    fresh = corpus.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        F.reverse("text").alias("text"),
    )
    batch = docs.where(F.col("doc_id") >= 1_000_000).unionByName(fresh)
    return dedup.incremental_dedup(corpus, batch)


SQL_DEDUP_INCREMENTAL = f"""
WITH docs_nd AS ({_ND}),
corpus AS (SELECT doc_id, text FROM docs_nd WHERE doc_id < 1000000),
batch AS (
  SELECT doc_id, text FROM docs_nd WHERE doc_id >= 1000000
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id, reverse(text) AS text
  FROM corpus WHERE doc_id % 7 = 0
),
surv AS (
  SELECT doc_id, text FROM batch
  WHERE md5(text) NOT IN (SELECT md5(text) FROM corpus)
),
{_duck_fp_cte("corpus", "c")},
{_duck_fp_cte("surv", "b")},
near AS (
  SELECT DISTINCT doc_id FROM (
    SELECT b.doc_id, c.doc_id AS cdoc, count(*) AS n
    FROM bfp b JOIN cfp c ON c.fp_hash = b.fp_hash
    GROUP BY 1, 2
  ) WHERE n >= 2
)
SELECT doc_id FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM near)
"""


CURATE_MIN_QUALITY = 0.5


def q_curate_corpus(spark, sf_dir):
    return textops.curate_corpus(
        _docs_nd(spark, sf_dir), min_quality=CURATE_MIN_QUALITY, language="en"
    )


def _sql_curate_corpus() -> str:
    langs = [lang for lang, _ in textops.LANG_LEXICONS]
    scores = {
        lang: f"len(regexp_extract_all(lower(text), '{textops.lang_pattern(ws)}'))::BIGINT"
        for lang, ws in textops.LANG_LEXICONS
    }
    best = "greatest(" + ", ".join(scores[l] for l in langs) + ")"
    cascade = (
        "CASE WHEN " + best + " = 0 THEN 'und' "
        + " ".join(f"WHEN {scores[l]} = {best} THEN '{l}'" for l in langs)
        + " END"
    )
    return f"""
WITH docs_nd AS ({_ND}),
t AS (
  SELECT doc_id,
         len({_DUCK_WORDS})::BIGINT AS n_tokens,
         {_DUCK_QUALITY_EXPR} AS quality_score,
         {cascade} AS lang_pred,
         min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
  FROM docs_nd
)
SELECT doc_id, n_tokens, quality_score
FROM t
WHERE doc_id = canonical_id AND lang_pred = 'en'
  AND quality_score >= {CURATE_MIN_QUALITY}
"""


# ------------------------------------------------------------- multimodal

def q_multimodal_features(spark, sf_dir):
    """Media-type-dispatched feature extraction over a MIXED corpus
    (`multimodal.extract_features`, round-8: `_fake_decode` retired):
    even doc_ids are framed as real 8x8 binary PPMs (`_ppm_media`) and
    get the perceptual ahash-derived feature over DECODED pixels; odd
    doc_ids stay opaque text payloads and get the md5 content-address —
    the dispatch is on the typed media_type column, exercising both
    codec paths in one driver-checked result."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.to_media(docs.where("doc_id % 2 = 1")).unionAll(
        _ppm_media(docs.where("doc_id % 2 = 0"))
    )
    return multimodal.extract_features(media)


# Image half is char-indexed like SQL_MULTIMODAL_IMAGE_AHASH, with the
# same loud ASCII assertion; its feature60 is the ahash bit string's
# first 60 bits as an integer (sum of 1<<(59-i) over set bits i<60).
# Opaque half: md5 content fingerprint, top 60 bits.
SQL_MULTIMODAL_FEATURES = """
WITH img AS (
  SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = len(text)
              THEN 'P6' || chr(10) || '8 8' || chr(10) || '255' || chr(10)
                   || rpad(substr(text, 1, 192), 192, ' ')
              ELSE error('SQL_MULTIMODAL_FEATURES: non-ASCII text (doc_id '
                         || doc_id || '); char-indexed oracle diverges '
                         || 'from the byte-decoding operator')
         END AS payload
  FROM documents WHERE doc_id % 2 = 0
),
px AS (
  SELECT doc_id, i,
         (ascii(substr(payload, 12 + 3 * i, 1))
          + ascii(substr(payload, 13 + 3 * i, 1))
          + ascii(substr(payload, 14 + 3 * i, 1))) // 3 AS gray
  FROM img CROSS JOIN (SELECT unnest(range(0, 64)) AS i) g
),
tot AS (SELECT doc_id, sum(gray)::BIGINT AS sg FROM px GROUP BY doc_id),
ifeat AS (
  SELECT px.doc_id,
         sum(CASE WHEN px.i < 60 AND gray * 64 > sg
                  THEN 1::BIGINT << (59 - px.i)::INT ELSE 0 END)::BIGINT
           AS feature60
  FROM px JOIN tot ON tot.doc_id = px.doc_id
  GROUP BY px.doc_id
)
SELECT i.doc_id,
       octet_length(encode(i.payload))::BIGINT AS n_bytes,
       md5(i.payload) AS content_md5,
       f.feature60
FROM img i JOIN ifeat f USING (doc_id)
UNION ALL
SELECT doc_id,
       octet_length(encode(text))::BIGINT AS n_bytes,
       md5(text) AS content_md5,
       ('0x' || substr(md5(text), 1, 15))::BIGINT AS feature60
FROM documents WHERE doc_id % 2 = 1
"""


def q_multimodal_audio(spark, sf_dir):
    """Audio-framing plumbing: overlapping PCM analysis windows with
    integer-exact energies over the payload column (stub decode —
    bytes as u8 samples; window math/schema/batch shape are real)."""
    media = multimodal.to_media(load_table(spark, sf_dir, "documents"))
    return multimodal.audio_energy_windows(media)


def _ppm_media(docs):
    """Documents framed as actual 8x8 binary PPMs: P6 header + each
    document's first 192 text bytes as the RGB raster (rpad-space to a
    full raster). Shared by the ahash and resize queries so both real
    codec paths decode the same images."""
    raster = F.rpad(F.substring("text", 1, 192), 192, " ")
    payload = F.encode(
        F.concat(F.lit("P6\n8 8\n255\n"), raster), "utf-8"
    )
    return docs.select(
        "doc_id",
        F.lit("image/x-portable-pixmap").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
    )


def q_multimodal_image_ahash(spark, sf_dir):
    """REAL image decode path (round-5 stretch item): each document is
    framed as an actual 8x8 binary PPM (`_ppm_media`), decoded by the
    pure-numpy PPM codec, and perceptually fingerprinted with an 8x8
    average hash over the DECODED PIXELS — the feature is a function of
    image content, not of payload bytes (a header comment changes the
    bytes but not the hash; pinned by unit test). One Arrow boundary,
    vectorized decode."""
    return multimodal.image_ahash_features(
        _ppm_media(load_table(spark, sf_dir, "documents"))
    )


# Char-indexed like SQL_MULTIMODAL_AUDIO, with the same loud ASCII
# assertion (chars == bytes only on ASCII text). gray = (r+g+b)//3 per
# pixel; bit rule gray*64 > sum(gray) — exact integers, no division.
SQL_MULTIMODAL_IMAGE_AHASH = """
WITH b AS (
  SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = len(text)
              THEN rpad(substr(text, 1, 192), 192, ' ')
              ELSE error('SQL_MULTIMODAL_IMAGE_AHASH: non-ASCII text (doc_id '
                         || doc_id || '); char-indexed oracle diverges '
                         || 'from the byte-decoding operator')
         END AS raster
  FROM documents
),
px AS (
  SELECT doc_id, i,
         (ascii(substr(raster, 3 * i + 1, 1))
          + ascii(substr(raster, 3 * i + 2, 1))
          + ascii(substr(raster, 3 * i + 3, 1))) // 3 AS gray
  FROM b CROSS JOIN (SELECT unnest(range(0, 64)) AS i) g
),
tot AS (SELECT doc_id, sum(gray)::BIGINT AS sg FROM px GROUP BY doc_id)
SELECT px.doc_id, 8::BIGINT AS width, 8::BIGINT AS height,
       string_agg(CASE WHEN gray * 64 > sg THEN '1' ELSE '0' END,
                  '' ORDER BY i) AS ahash_bits
FROM px JOIN tot ON tot.doc_id = px.doc_id
GROUP BY px.doc_id
"""


# The oracle indexes CHARACTERS while the operator decodes UTF-8
# BYTES; they agree only on pure-ASCII text, so the oracle ASSERTS
# ASCII per row (octet_length(encode(text)) = len(text) iff ASCII) and
# a future non-ASCII corpus fails LOUDLY here instead of silently
# hash-mismatching (round-5 advice). W=64 samples, hop 32; windows =
# ceil(n/hop); energy = sum of squares.
SQL_MULTIMODAL_AUDIO = """
WITH b AS (
  SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = len(text) THEN len(text)
              ELSE error('SQL_MULTIMODAL_AUDIO: non-ASCII text (doc_id '
                         || doc_id || '); the char-indexed oracle '
                         || 'diverges from the byte-decoding operator')
         END AS n,
         list_transform(range(1, len(text) + 1),
                        i -> ascii(substr(text, i, 1))::BIGINT) AS samples
  FROM documents
),
w AS (
  -- range(0, 0) is empty, so an empty document emits zero window
  -- rows — matching the operator's n_windows = 0 for n == 0.
  SELECT doc_id, n, samples, unnest(range(0, (n + 31) // 32)) AS k
  FROM b
)
SELECT doc_id, k AS window_no,
       least(64, n - k * 32)::BIGINT AS n_samples,
       list_sum(list_transform(list_slice(samples, k * 32 + 1, k * 32 + 64),
                               s -> s * s))::BIGINT AS energy_sq
FROM w
"""


# ----------------------------------------------------------------- events

def q_events_window(spark, sf_dir):
    return events.tumbling_window(load_table(spark, sf_dir, "events"))


SQL_EVENTS_WINDOW = f"""
SELECT (epoch_us(ts) // {events.HOUR_US}) * {events.HOUR_US} AS window_start_us,
       event_type,
       count(*) AS n_events,
       cast(sum(value::DECIMAL(18,2)) as double) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_events_window_streaming(spark, sf_dir):
    return streaming_tumbling_window(spark, sf_dir)


def q_events_sessionize(spark, sf_dir):
    return events.sessionize(load_table(spark, sf_dir, "events"))


SQL_EVENTS_SESSIONIZE = f"""
WITH e AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events
),
b AS (
  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w > {events.SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS boundary
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
s AS (
  SELECT *, sum(boundary) OVER (
    PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING
  )::BIGINT AS session_id FROM b
)
SELECT user_id, session_id,
       min(ts_us) AS session_start_us,
       max(ts_us) AS session_end_us,
       count(*) AS n_events,
       cast(sum(value::DECIMAL(18,2)) as double) AS sum_value
FROM s GROUP BY user_id, session_id
"""


def q_events_funnel(spark, sf_dir):
    """Staged conversion funnel view → click → purchase: a user reaches
    stage N when an event of that type occurs AT OR AFTER their stage
    N-1 entry time (first-touch semantics via conditional MIN chains).
    Three user-keyed aggregates and two user-keyed equi-joins: every
    shuffle is on user_id, so the stages co-partition and the join
    after the first agg is exchange-free on a cluster that reuses the
    partitioning. The analytic shape (ordered event progression) that
    SQL MATCH_RECOGNIZE engines special-case, expressed in plain
    relational algebra both engines execute identically."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_us"
    )
    v = (
        ev.where("event_type = 'view'")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("v_ts"))
    )
    c = (
        ev.where("event_type = 'click'")
        .join(v, "user_id")
        .where(F.col("ts_us") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("c_ts"))
    )
    p = (
        ev.where("event_type = 'purchase'")
        .join(c, "user_id")
        .where(F.col("ts_us") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("p_ts"))
    )
    staged = (
        v.select(F.lit("1_view").alias("stage"), "user_id")
        .unionAll(c.select(F.lit("2_click").alias("stage"), "user_id"))
        .unionAll(p.select(F.lit("3_purchase").alias("stage"), "user_id"))
    )
    return staged.groupBy("stage").agg(F.count("*").alias("n_users"))


SQL_EVENTS_FUNNEL = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
v AS (
  SELECT user_id, min(ts_us) AS v_ts FROM e
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts_us) AS c_ts
  FROM e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts_us >= v.v_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts_us) AS p_ts
  FROM e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts_us >= c.c_ts
  GROUP BY e.user_id
),
st AS (
  SELECT '1_view' AS stage, user_id FROM v
  UNION ALL SELECT '2_click', user_id FROM c
  UNION ALL SELECT '3_purchase', user_id FROM p
)
SELECT stage, count(*) AS n_users FROM st GROUP BY stage
"""


def q_events_json(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
    )


SQL_EVENTS_JSON = """
SELECT event_id, event_type, json_extract_string(props, '$.k')::BIGINT AS k_val
FROM events
"""


# -------------------------------------------------------------- analytics

def q_tpch_q1(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(12,2)")
    disc_price = dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(12,2)") + dec("l_tax"))
    out = (
        li.where(F.col("l_shipdate") <= F.lit("1998-06-30").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )
    return out.withColumn(
        "avg_qty", F.col("sum_qty") / F.col("count_order")
    ).withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       cast(sum(l_quantity::DECIMAL(12,2)) as double) AS sum_qty,
       cast(sum(l_extendedprice::DECIMAL(12,2)) as double) AS sum_base_price,
       cast(sum(l_extendedprice::DECIMAL(12,2)
                * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) as double)
         AS sum_disc_price,
       cast(sum(l_extendedprice::DECIMAL(12,2)
                * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2))
                * (1::DECIMAL(12,2) + l_tax::DECIMAL(12,2))) as double)
         AS sum_charge,
       count(*) AS count_order,
       cast(sum(l_quantity::DECIMAL(12,2)) as double) / count(*) AS avg_qty,
       cast(sum(l_extendedprice::DECIMAL(12,2)) as double) / count(*) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-06-30'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(12,2)")
    revenue = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - dec("l_discount")
    )
    cutoff = F.lit("1998-06-30").cast("timestamp_ntz")
    return (
        cust.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, cust.c_custkey == orders.o_custkey)
        .where(F.col("o_orderdate") < cutoff)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", F.col("o_orderdate").alias("o_orderdate_d"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


SQL_TPCH_Q3 = """
SELECT l_orderkey, o_orderdate AS o_orderdate_d,
       cast(sum(l_extendedprice::DECIMAL(12,2)
                * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) as double)
         AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-30'
  AND l_shipdate > TIMESTAMP '1998-06-30'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_tpch_q6(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(12,2)")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


SQL_TPCH_Q6 = """
SELECT cast(sum(l_extendedprice::DECIMAL(12,2) * l_discount::DECIMAL(12,2))
            as double) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_tpch_q5(spark, sf_dir):
    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    dec = lambda c: F.col(c).cast("decimal(12,2)")
    revenue = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - dec("l_discount")
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        # The c_nationkey = s_nationkey equality makes this the classic
        # "local supplier" join; supplier/nation/region are dimension
        # tables — Catalyst broadcasts them under the default threshold.
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


SQL_TPCH_Q5 = """
SELECT n_name,
       cast(sum(l_extendedprice::DECIMAL(12,2)
                * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) as double)
         AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""

def q_tpch_q5_skewed(spark, sf_dir):
    """tpch_q5 with the lineitem<-(orders x customer) join routed
    through ``skew.salted_join``.

    The physical-plan demonstration query for the explicit skew tool:
    at 100 TB a handful of mega-orders can make ``l_orderkey`` hot
    enough that one shuffle partition of the lineitem<-orders join
    dominates the stage, and the build side (orders x customer in the
    date window) is too big to broadcast — the exact case AQE skew
    splitting cannot always fix and ``salted_join`` is for. The salt
    scatters each hot l_orderkey over 8 sub-keys; results are
    IDENTICAL to tpch_q5, so the two queries share one oracle string
    (asserted in plans.__init__).
    """
    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    dec = lambda c: F.col(c).cast("decimal(12,2)")
    revenue = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - dec("l_discount")
    )
    ordc = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .select(F.col("o_orderkey").alias("okey"), "c_nationkey")
    )
    li = t["lineitem"].select(
        F.col("l_orderkey").alias("okey"),
        "l_suppkey", "l_extendedprice", "l_discount",
    )
    return (
        salted_join(li, ordc, on="okey", num_salts=8)
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


TPCH_Q18_QTY = 160


def q_tpch_q18(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    dec = lambda c: F.col(c).cast("decimal(12,2)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .where(F.col("qty") > TPCH_Q18_QTY)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").alias("o_orderdate_d"),
            "o_totalprice",
            F.col("qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


SQL_TPCH_Q18 = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate AS o_orderdate_d,
       o_totalprice, qty::DOUBLE AS sum_qty
FROM (
  SELECT l_orderkey, sum(l_quantity::DECIMAL(12,2)) AS qty
  FROM lineitem GROUP BY l_orderkey HAVING qty > {TPCH_Q18_QTY}
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q_rollup_orders(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_totalprice"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
    )


def q_corpus_stats_cube(spark, sf_dir):
    """Corpus composition report with CUBE(lang, source): doc counts,
    total characters, and mean doc length for every (lang, source)
    combination plus all three marginal groupings in ONE aggregate pass
    — the per-slice inventory a curation run reports before and after
    filtering. Mean = exact bigint sum / count, one double division, so
    both engines emit identical bits."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.cube("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars") / F.count("*")).alias("mean_chars"),
        F.grouping_id().cast("bigint").alias("gid"),
    )


SQL_CORPUS_STATS_CUBE = """
SELECT lang, source,
       count(*) AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       sum(n_chars) / count(*) AS mean_chars,
       GROUPING(lang, source)::BIGINT AS gid
FROM documents
GROUP BY CUBE (lang, source)
"""


SQL_ROLLUP_ORDERS = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       cast(sum(o_totalprice::DECIMAL(18,2)) as double) AS sum_totalprice,
       GROUPING(o_orderstatus, o_orderpriority)::BIGINT AS gid
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_events_asof(spark, sf_dir):
    """As-of (backward) join within the event stream: each click is
    annotated with the user's most recent prior purchase — expressed as
    an ignore-nulls running last_value in one window pass, the
    shuffle-minimal Spark formulation of an as-of join against the same
    stream.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_purchase = F.last(
        F.when(F.col("event_type") == "purchase", F.col("ts_us")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("last_purchase_ts_us", last_purchase)
        .where(F.col("event_type") == "click")
        .select(
            "user_id",
            "event_id",
            "ts_us",
            "last_purchase_ts_us",
            (F.col("ts_us") - F.col("last_purchase_ts_us")).alias(
                "since_purchase_us"
            ),
        )
    )


SQL_EVENTS_ASOF = """
SELECT user_id, event_id, ts_us, last_purchase_ts_us,
       ts_us - last_purchase_ts_us AS since_purchase_us
FROM (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         last_value(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS UNBOUNDED PRECEDING) AS last_purchase_ts_us
  FROM events
)
WHERE event_type = 'click'
"""


def q_events_sessionize_stateful(spark, sf_dir):
    from ..streaming.stateful import streaming_sessionize

    return streaming_sessionize(spark, sf_dir)


def q_multimodal_resize(spark, sf_dir):
    """REAL resize (round-6 verdict item 5, replacing the byte-
    truncation stub): each document's 8x8 PPM frame (`_ppm_media`, the
    same images the ahash query decodes) is decoded, box-filter
    downsampled 2x (per-channel integer-floor mean over 2x2 blocks —
    exact arithmetic, every output byte oracle-reproducible) and
    re-encoded as a 4x4 P6 payload, emitted as hex."""
    return multimodal.image_resize(
        _ppm_media(load_table(spark, sf_dir, "documents")), factor=2
    )


# The re-encoded payload is header + raster; the header is a constant
# for the fixed 8x8 -> 4x4 geometry, so the oracle prepends its hex and
# reconstructs the raster per output pixel: channel mean over the 2x2
# input block, input pixel (i, j) channel c at raster char 3*(i*8+j)+c+1
# (ASCII-asserted like the other char-indexed media oracles).
_RESIZE_HEADER_HEX = "P6\n4 4\n255\n".encode().hex()

_RESIZE_BLOCK_MEAN = (
    "("
    "ascii(substr(raster, 3 * ((2 * oi) * 8 + 2 * oj) + c + 1, 1)) + "
    "ascii(substr(raster, 3 * ((2 * oi) * 8 + 2 * oj + 1) + c + 1, 1)) + "
    "ascii(substr(raster, 3 * ((2 * oi + 1) * 8 + 2 * oj) + c + 1, 1)) + "
    "ascii(substr(raster, 3 * ((2 * oi + 1) * 8 + 2 * oj + 1) + c + 1, 1))"
    ") // 4"
)

SQL_MULTIMODAL_RESIZE = f"""
WITH b AS (
  SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = len(text)
              THEN rpad(substr(text, 1, 192), 192, ' ')
              ELSE error('SQL_MULTIMODAL_RESIZE: non-ASCII text (doc_id '
                         || doc_id || '); char-indexed oracle diverges '
                         || 'from the byte-decoding operator')
         END AS raster
  FROM documents
),
opx AS (
  SELECT doc_id, oi, oj, c, {_RESIZE_BLOCK_MEAN} AS v
  FROM b
  CROSS JOIN (SELECT unnest(range(0, 4)) AS oi) oi_t
  CROSS JOIN (SELECT unnest(range(0, 4)) AS oj) oj_t
  CROSS JOIN (SELECT unnest(range(0, 3)) AS c) ch_t
)
SELECT doc_id, 8::BIGINT AS orig_width, 8::BIGINT AS orig_height,
       4::BIGINT AS width, 4::BIGINT AS height,
       '{_RESIZE_HEADER_HEX}' ||
       string_agg(lower(lpad(hex(v), 2, '0')), '' ORDER BY oi, oj, c)
         AS resized_hex
FROM opx GROUP BY doc_id
"""


def q_multimodal_frames(spark, sf_dir):
    """REAL frame sampling (round-6 verdict item 5, replacing the text-
    slicing stub): each document becomes a concatenated-PPM "video" —
    one back-to-back 8x8 P6 frame per 192 text chars (last frame
    rpad-space) — and `multimodal.video_frame_ahash` parses the stream,
    keeps every 2nd frame, and fingerprints each kept frame's DECODED
    PIXELS with the shared integer average-hash rule."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    header = "P6\n8 8\n255\n"
    nf = F.ceil(F.length("text") / F.lit(192.0))
    frames = F.transform(
        F.sequence(F.lit(1), nf),
        lambda i: F.concat(
            F.lit(header),
            F.rpad(
                F.substring(F.col("text"), (i - 1) * 192 + 1, F.lit(192)),
                192,
                " ",
            ),
        ),
    )
    payload = F.encode(
        F.array_join(
            F.when(F.length("text") > 0, frames).otherwise(
                F.array().cast("array<string>")
            ),
            "",
        ),
        "utf-8",
    )
    media = docs.select(
        "doc_id",
        F.lit("video/x-ppm-stream").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
    )
    return multimodal.video_frame_ahash(media, stride=2)


# Same char-indexed reconstruction as the image oracles (ASCII-asserted):
# frame fno's raster is the document's chars [fno*192+1, fno*192+192]
# rpad-space; gray/bit rules identical to SQL_MULTIMODAL_IMAGE_AHASH,
# keyed by (doc_id, frame). range(0, 0) is empty, so an empty document
# emits zero frames, matching the operator's empty payload.
SQL_MULTIMODAL_FRAMES = """
WITH b AS (
  SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = len(text) THEN text
              ELSE error('SQL_MULTIMODAL_FRAMES: non-ASCII text (doc_id '
                         || doc_id || '); char-indexed oracle diverges '
                         || 'from the byte-decoding operator')
         END AS text,
         len(text) AS n
  FROM documents
),
sf AS (
  SELECT doc_id, fno,
         rpad(substr(text, fno * 192 + 1, 192), 192, ' ') AS raster
  FROM (
    SELECT doc_id, text, unnest(range(0, (n + 191) // 192)) AS fno FROM b
  ) WHERE fno % 2 = 0
),
px AS (
  SELECT doc_id, fno, i,
         (ascii(substr(raster, 3 * i + 1, 1))
          + ascii(substr(raster, 3 * i + 2, 1))
          + ascii(substr(raster, 3 * i + 3, 1))) // 3 AS gray
  FROM sf CROSS JOIN (SELECT unnest(range(0, 64)) AS i) g
),
tot AS (
  SELECT doc_id, fno, sum(gray)::BIGINT AS sg FROM px GROUP BY doc_id, fno
)
SELECT px.doc_id, px.fno AS frame_no, 8::BIGINT AS width,
       8::BIGINT AS height,
       string_agg(CASE WHEN gray * 64 > sg THEN '1' ELSE '0' END,
                  '' ORDER BY i) AS ahash_bits
FROM px JOIN tot ON tot.doc_id = px.doc_id AND tot.fno = px.fno
GROUP BY px.doc_id, px.fno
"""


def q_tpch_q10(spark, sf_dir):
    """Returned-item revenue ranking: 4-way join, quarter filter on
    orders, returnflag filter on lineitem, top 20 by revenue."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    dec = lambda c: F.col(c).cast("decimal(12,2)")
    revenue = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - dec("l_discount")
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_returnflag") == "R")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       cast(sum(l_extendedprice::DECIMAL(12,2)
                * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) as double)
         AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_tpch_q13(spark, sf_dir):
    """Order-count histogram (left outer join keeps zero-order
    customers) — double aggregation, the classic q13 shape."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").alias("custdist")
    )


SQL_TPCH_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q_tpch_q14(spark, sf_dir):
    """Promo revenue share — conditional aggregate ratio over a
    broadcast part join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dec = lambda c: F.col(c).cast("decimal(12,2)")
    rev = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - dec("l_discount")
    )
    joined = li.where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    ).join(part, F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast("decimal(12,2)")
                )
            ).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct")
    )


SQL_TPCH_Q14 = """
SELECT 100.0 * cast(sum(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice::DECIMAL(12,2)
                                  * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2))
                             ELSE 0::DECIMAL(12,2) END) as double)
       / cast(sum(l_extendedprice::DECIMAL(12,2)
                  * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) as double)
         AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


def q_tpch_q22_like(spark, sf_dir):
    """Lapsed wealthy customers: above-average balance, no order since
    2000 — scalar aggregate subquery + anti join, grouped by nation.
    The threshold is an exact decimal sum divided once in double, so
    the boundary comparison is bit-identical across engines.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    stats = cust.agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    wealthy = cust.crossJoin(F.broadcast(stats)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    lapsed = wealthy.join(
        orders, wealthy.c_custkey == orders.o_custkey, "anti"
    )
    return lapsed.groupBy("c_nationkey").agg(
        F.count("*").alias("n_custs"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_bal"),
    )


SQL_TPCH_Q22_LIKE = """
SELECT c_nationkey, count(*) AS n_custs,
       cast(sum(c_acctbal::DECIMAL(18,2)) as double) AS total_bal
FROM customer c
WHERE c_acctbal > (SELECT cast(sum(c_acctbal::DECIMAL(18,2)) as double)
                          / count(*) FROM customer)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""


def q_events_distinct_users(spark, sf_dir):
    """Exact distinct aggregation (expands to a two-phase plan)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


SQL_EVENTS_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
"""


def q_events_distinct_users_streaming(spark, sf_dir):
    from ..streaming.windows import streaming_distinct_users

    return streaming_distinct_users(spark, sf_dir)


SQL_EVENTS_DISTINCT_USERS_STREAMING = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def q_events_quantiles(spark, sf_dir):
    """Exact linear-interpolation percentiles per event type — Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the continuous
    quantile definition, so even interpolated values match bitwise.
    (``percentile_approx`` is the at-scale variant; it has no exact
    oracle, so the registered query is the exact form.)"""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.9)).alias("p90"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
    )


SQL_EVENTS_QUANTILES = """
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       quantile_cont(value, 0.99) AS p99,
       min(value) AS v_min,
       max(value) AS v_max
FROM events GROUP BY event_type
"""


def q_dup_overlap(spark, sf_dir):
    """Set operations over the two duplicate families: entries flagged
    by BOTH url and pdq, url-only, pdq-only.

    Physical shape: ONE full outer join on the unique index key (both
    family results emit one row per index), so each duplicate pipeline
    is computed exactly once — the intersect/except-all formulation ran
    the url and pdq subplans once per set-op branch (3× each; Spark does
    not share non-cached subplans)."""
    from ..operators.pdq import find_pdq_hash_duplicates
    from ..operators.url_dedup import find_url_duplicates
    from .core_queries import PDQ_THRESHOLD, _entries

    entries = _entries(spark, sf_dir)
    url_idx = find_url_duplicates(entries).select(
        "index", F.lit(True).alias("in_url")
    )
    pdq_idx = find_pdq_hash_duplicates(
        entries,
        pqd_hash_similarity_threshold=PDQ_THRESHOLD,
        duplicate_detection_method="auto",
        max_hex_len=64,
    ).select("index", F.lit(True).alias("in_pdq"))
    joined = url_idx.join(pdq_idx, "index", "full")
    family = (
        F.when(F.col("in_url") & F.col("in_pdq"), F.lit("both"))
        .when(F.col("in_url"), F.lit("url_only"))
        .otherwise(F.lit("pdq_only"))
    )
    return joined.select("index", family.alias("family"))


def _sql_dup_overlap() -> str:
    from .core_queries import SQL_URL_DUPLICATES, _duck_pdq_result

    return f"""
WITH u AS (SELECT "index" FROM ({SQL_URL_DUPLICATES})),
p AS (SELECT "index" FROM ({_duck_pdq_result("")}))
SELECT "index", 'both' AS family FROM (SELECT * FROM u INTERSECT SELECT * FROM p)
UNION ALL
SELECT "index", 'url_only' AS family FROM (SELECT * FROM u EXCEPT ALL SELECT * FROM p)
UNION ALL
SELECT "index", 'pdq_only' AS family FROM (SELECT * FROM p EXCEPT ALL SELECT * FROM u)
"""


def q_window_topn(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


SQL_WINDOW_TOPN = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         )::BIGINT AS rnk
  FROM orders
) WHERE rnk <= 3
"""


# --------------------------------------------------- more TPC-H-like shapes
# The testdata schemas are reduced TPC-H (no partsupp, l_shipmode,
# l_commitdate/l_receiptdate, p_container), so these are "-like"
# variants that preserve each query's OPERATOR shape — semi/anti joins
# with non-equi conditions, disjunctive pushdown, correlated scalar
# aggregates, two-sided nation-pair predicates — with predicates mapped
# onto the available columns.


def q_tpch_q4_like(spark, sf_dir):
    """Q4 shape: EXISTS semi-join with a correlated non-equi condition
    (late-shipped proxy for commitdate<receiptdate), priority counts."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    windowed = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    late = windowed.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


SQL_TPCH_Q4_LIKE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


def q_tpch_q7_like(spark, sf_dir):
    """Q7 shape: two-sided nation-pair predicate across supplier and
    customer nations, revenue by (supp_nation, cust_nation, year)."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("supplier", "lineitem", "orders", "customer", "nation")}
    dec = lambda c: F.col(c).cast("decimal(12,2)")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    revenue = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - dec("l_discount")
    )
    return (
        t["supplier"]
        .join(t["lineitem"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


SQL_TPCH_Q7_LIKE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate)::BIGINT AS l_year,
       cast(sum(l_extendedprice::DECIMAL(12,2)
                * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) as double)
         AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""


def q_tpch_q8_like(spark, sf_dir):
    """Q8 shape: market share of one supplier nation within a customer
    region for one part type — conditional-sum ratio per year."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("part", "supplier", "lineitem", "orders", "customer", "nation",
          "region")}
    dec = lambda c: F.col(c).cast("decimal(12,2)")
    n_cust = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    n_supp = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = (
        dec("l_extendedprice")
        * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
    )
    base = (
        t["part"].where(F.col("p_type") == "ECONOMY")
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(n_cust, F.col("c_nationkey") == F.col("cn_key"))
        .join(t["region"], F.col("cr_key") == F.col("r_regionkey"))
        .join(n_supp, F.col("s_nationkey") == F.col("sn_key"))
        .where(F.col("r_name") == "ASIA")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
    )
    nation_vol = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
            F.lit(0).cast("decimal(12,2)")
        )
    )
    return (
        base.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (nation_vol.cast("double") / F.sum(volume).cast("double")).alias(
                "mkt_share"
            )
        )
    )


SQL_TPCH_Q8_LIKE = """
SELECT year(o_orderdate)::BIGINT AS o_year,
       cast(sum(CASE WHEN ns.n_name = 'NATION_3'
                     THEN l_extendedprice::DECIMAL(12,2)
                          * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2))
                     ELSE 0::DECIMAL(12,2) END) as double)
       / cast(sum(l_extendedprice::DECIMAL(12,2)
                  * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) as double)
         AS mkt_share
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region ON nc.n_regionkey = r_regionkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


def q_tpch_q12_like(spark, sf_dir):
    """Q12 shape: join + two conditional counts split by order priority
    (l_returnflag stands in for the missing l_shipmode group key)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


SQL_TPCH_Q12_LIKE = """
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


def q_tpch_q17_like(spark, sf_dir):
    """Q17 shape: correlated scalar aggregate — lineitems under 20% of
    their part's average quantity. The correlated subquery becomes a
    per-part aggregate joined back (broadcast: one row per part)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dec = lambda c: F.col(c).cast("decimal(12,2)")
    # Per-part avg over EXACT integer-valued doubles: sum and count are
    # exact, so the division (and the 0.2 scale) is bit-identical on
    # both engines.
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        part.where(F.col("p_brand") == "Brand#23")
        .join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(avg_qty), F.col("p_partkey") == F.col("ap_key"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


SQL_TPCH_Q17_LIKE = """
SELECT cast(sum(l_extendedprice::DECIMAL(12,2)) as double) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
"""


def q_tpch_q19_like(spark, sf_dir):
    """Q19 shape: disjunction of conjunctive brand/size/quantity bands —
    the classic test that OR-of-ANDs predicates still prune and the
    part join broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dec = lambda c: F.col(c).cast("decimal(12,2)")
    bands = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - dec("l_discount")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .where(bands)
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


SQL_TPCH_Q19_LIKE = """
SELECT cast(sum(l_extendedprice::DECIMAL(12,2)
               * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) as double)
         AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


TPCH_Q21_LATE_DAYS = 60


def q_tpch_q21_like(spark, sf_dir):
    """Q21 shape: EXISTS + NOT EXISTS self-joins with non-equi
    correlated conditions — suppliers who were the SOLE late shipper
    (ship > order date + 60d) on multi-supplier orders."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("supplier", "lineitem", "orders", "nation")}
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {TPCH_Q21_LATE_DAYS} DAYS"
    )
    l1 = (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .where(late)
    )
    other = t["lineitem"].select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
        F.col("l_shipdate").alias("x_shipdate"),
    )
    exists_other = (F.col("x_orderkey") == F.col("l_orderkey")) & (
        F.col("x_suppkey") != F.col("l_suppkey")
    )
    late_other = exists_other & (
        F.col("x_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {TPCH_Q21_LATE_DAYS} DAYS")
    )
    return (
        l1.join(other, exists_other, "semi")
        .join(other, late_other, "anti")
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["nation"], F.col("n_nationkey") == F.col("s_nationkey"))
        .where(F.col("n_name") == "NATION_5")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


SQL_TPCH_Q21_LIKE = f"""
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_5'
  AND l1.l_shipdate > o_orderdate + INTERVAL {TPCH_Q21_LATE_DAYS} DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL {TPCH_Q21_LATE_DAYS} DAY
  )
GROUP BY s_name
"""


def q_tpch_q2_like(spark, sf_dir):
    """Q2 shape: minimum-cost supplier per part — a correlated scalar
    MIN decorrelated into an aggregate + equality join. The testdata
    has no partsupp table, so supplier offers derive from lineitem
    (min extended price per part/supplier). Dimension chain
    supplier-nation-region broadcasts; the price-equality join keys on
    exact DECIMAL so both engines agree bit-for-bit."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("part", "supplier", "nation", "region", "lineitem")}
    asia = (
        t["supplier"]
        .join(t["nation"], F.col("n_nationkey") == F.col("s_nationkey"))
        .join(t["region"], F.col("r_regionkey") == F.col("n_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        t["lineitem"]
        .join(F.broadcast(asia.select("s_suppkey")),
              F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice").cast("decimal(12,2)")).alias("price"))
    )
    best = offers.groupBy("l_partkey").agg(F.min("price").alias("best_price"))
    return (
        t["part"]
        .where(F.col("p_type") == "LARGE")
        .join(offers, F.col("l_partkey") == F.col("p_partkey"))
        .join(best, "l_partkey")
        .where(F.col("price") == F.col("best_price"))
        .join(F.broadcast(asia), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "p_partkey", "p_name", "s_name", "n_name", "s_acctbal",
            F.col("price").cast("double").alias("best_price"),
        )
    )


SQL_TPCH_Q2_LIKE = """
WITH asia AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'ASIA'
),
offers AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice::DECIMAL(12,2)) AS price
  FROM lineitem JOIN asia ON s_suppkey = l_suppkey
  GROUP BY l_partkey, l_suppkey
),
best AS (SELECT l_partkey, min(price) AS best_price FROM offers GROUP BY l_partkey)
SELECT p_partkey, p_name, s_name, n_name, s_acctbal,
       cast(o.price as double) AS best_price
FROM part
JOIN offers o ON o.l_partkey = p_partkey
JOIN best b ON b.l_partkey = o.l_partkey AND o.price = b.best_price
JOIN asia ON s_suppkey = o.l_suppkey
WHERE p_type = 'LARGE'
"""


def q_tpch_q9_like(spark, sf_dir):
    """Q9 shape: product-line profit by nation and order year — a
    five-way star join with a LIKE filter on the part dimension and a
    two-key aggregate. Profit drops the ps_supplycost term (no
    partsupp table)."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("lineitem", "part", "supplier", "orders", "nation")}
    dec = lambda c: F.col(c).cast("decimal(12,2)")
    profit = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - dec("l_discount")
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .where(F.col("p_name").contains("gear"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["nation"], F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


SQL_TPCH_Q9_LIKE = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       cast(sum(l_extendedprice::DECIMAL(12,2)
                * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) as double)
         AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, year(o_orderdate)
"""


def q_tpch_q11_like(spark, sf_dir):
    """Q11 shape: HAVING over a global scalar subquery — per-part
    inventory value for one nation's suppliers, kept only when above
    a fraction of the total. The fraction compare stays in exact
    DECIMAL (``value * 1000 > total``) so no float tie-break can
    diverge between engines; the scalar total rides a broadcast."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("lineitem", "supplier", "nation")}
    dec = lambda c: F.col(c).cast("decimal(12,2)")
    nat_supp = (
        t["supplier"]
        .join(t["nation"], F.col("n_nationkey") == F.col("s_nationkey"))
        .where(F.col("n_name") == "NATION_3")
        .select("s_suppkey")
    )
    val = (
        t["lineitem"]
        .join(F.broadcast(nat_supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice") * dec("l_quantity")).alias("value"))
    )
    total = val.agg(F.sum("value").alias("total"))
    return (
        val.join(F.broadcast(total))
        .where(F.col("value") * 1000 > F.col("total"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("value").cast("double").alias("value"),
        )
    )


SQL_TPCH_Q11_LIKE = """
WITH val AS (
  SELECT l_partkey,
         sum(l_extendedprice::DECIMAL(12,2) * l_quantity::DECIMAL(12,2))
           AS value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey AS ps_partkey, cast(value as double) AS value
FROM val WHERE value * 1000 > (SELECT sum(value) FROM val)
"""


def q_tpch_q15_like(spark, sf_dir):
    """Q15 shape: top supplier by quarterly revenue — MAX over a
    derived view, matched back by exact-DECIMAL equality (the classic
    argmax-without-window formulation)."""
    t = {n: load_table(spark, sf_dir, n) for n in ("lineitem", "supplier")}
    dec = lambda c: F.col(c).cast("decimal(12,2)")
    revenue = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                dec("l_extendedprice")
                * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
            ).alias("total_revenue")
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        t["supplier"]
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select(
            "s_suppkey", "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


SQL_TPCH_Q15_LIKE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(l_extendedprice::DECIMAL(12,2)
             * (1::DECIMAL(12,2) - l_discount::DECIMAL(12,2)))
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, cast(total_revenue as double) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


def q_tpch_q16_like(spark, sf_dir):
    """Q16 shape: distinct-supplier counts per part attribute triple
    with a NOT IN exclusion list (suppliers in arrears stand in for
    the reference's complaint pattern; s_suppkey is non-null so the
    anti-join is NOT IN-equivalent). Exclusion list broadcasts."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("lineitem", "part", "supplier")}
    bad = t["supplier"].where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .where(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin([1, 5, 9, 13, 17, 21, 25, 29])
        )
        .join(F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_TPCH_Q16_LIKE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q_tpch_q20_like(spark, sf_dir):
    """Q20 shape: nested semi-join chain — ASIA suppliers who shipped
    a meaningful volume (HAVING sum(qty) > 40) of any 'small%' part
    during 1997. l_quantity is integral, so the double sum is
    order-independent-exact. (Thresholds chosen non-vacuous at every
    test scale: 1 row at sf0.001, 17 at sf0.01.)"""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("lineitem", "part", "supplier", "nation", "region")}
    shipped = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    small = t["part"].where(F.col("p_name").startswith("small")).select("p_partkey")
    qualifying = (
        shipped.join(F.broadcast(small), F.col("p_partkey") == F.col("l_partkey"))
        .where(F.col("qty") > 40)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(t["nation"], F.col("n_nationkey") == F.col("s_nationkey"))
        .join(t["region"], F.col("r_regionkey") == F.col("n_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "semi")
        .select("s_suppkey", "s_name")
    )


SQL_TPCH_Q20_LIKE = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 40
  )
"""


# ------------------------------------------------- round-4 pipeline ops

# Train/eval split over docs_nd for the decontamination screen. The rule
# mixes the derived-id band (div 1000000 ∈ {0,1,2}) into the digit so
# exact copies and near-dup mutants land on the OPPOSITE side of their
# original (a plain doc_id % 10 split strands every planted duplicate
# group on one side and the screen is vacuously empty): originals ending
# in 7, mutants of originals ending in 0, copies of originals ending in
# 3 go to eval — their counterparts stay in train.
_DECON_SPLIT = "(doc_id // 1000000 * 7 + doc_id) % 10"
_DECON_SPLIT_SPARK = "(doc_id div 1000000 * 7 + doc_id) % 10"

# word-8-gram shingles (functions.text.word_shingles n=8 twin)
_DUCK_SHINGLES8 = f"""
CASE WHEN len({_DUCK_WORDS}) < 8 THEN [text]
     ELSE [array_to_string(list_slice({_DUCK_WORDS}, i, i + 7), ' ')
           for i in range(1, len({_DUCK_WORDS}) - 6)] END
"""


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


def q_semantic_dedup(spark, sf_dir):
    corpus = derive_near_dup_embeddings(load_table(spark, sf_dir, "embeddings"))
    return similarity.semantic_near_duplicates(corpus, threshold=0.9)


SQL_SEMANTIC_DEDUP = f"""
WITH emb_nd AS ({_ND_EMB}),
n AS (
  SELECT vec_id, embedding AS e,
         sqrt(list_sum(list_transform(embedding, x -> x * x))) AS nrm
  FROM emb_nd
),
-- sqrt-scaled centroid sampling: greatest(2, floor(sqrt(N))) is the
-- oracle twin of similarity.sqrt_centroid_mod (isqrt == floor(sqrt)
-- at any testable N).
cmod AS (
  SELECT greatest(2, CAST(floor(sqrt(count(*))) AS BIGINT)) AS m FROM n
),
cent AS (
  SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n
  WHERE vec_id % (SELECT m FROM cmod) = 0
),
sc AS (
  SELECT n.vec_id, n.e, n.nrm, c.cid,
         list_sum(list_transform(range(1, 65), j -> n.e[j] * c.ce[j]))
           / (n.nrm * c.cnrm) AS ccos
  FROM n CROSS JOIN cent c
),
member AS (
  SELECT vec_id, e, nrm, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid)
              AS rn FROM sc
  ) WHERE rn = 1
)
SELECT a.vec_id AS a, b.vec_id AS b, a.cid AS cid,
       list_sum(list_transform(range(1, 65), j -> a.e[j] * b.e[j]))
         / (a.nrm * b.nrm) AS cosine
FROM member a JOIN member b ON a.cid = b.cid AND a.vec_id < b.vec_id
WHERE list_sum(list_transform(range(1, 65), j -> a.e[j] * b.e[j]))
        / (a.nrm * b.nrm) >= 0.9
"""


def _sem_probe_pred(col):
    """Deterministic 5% probe sample of ORIGINAL vectors for
    `semantic_recall_learned` (< 1e6 excludes the derived copy bands)."""
    return (col % 20 == 0) & (col < 1_000_000)


def q_semantic_recall_learned(spark, sf_dir):
    """Per-probe recall of `semantic_dedup_learned` vs EXACT cosine
    truth (cos ≥ 0.9 over the same corpus) — the learned quantizer's
    own entry in the self-measuring diagnostic matrix (`ann_recall_lsh`
    / `ann_recall_ivf` / `minhash_recall`): a miss is a pair split
    across (coarse, fine) cells, isolating exactly the blindness the
    SemDeDup trade accepts. Truth is probe-restricted (every 20th
    original vector) with the probe side broadcast against the
    streaming corpus — the bounded asymmetric scan, same posture as the
    other recall diagnostics; production uses a fixed probe sample."""
    corpus = derive_near_dup_embeddings(load_table(spark, sf_dir, "embeddings"))
    nn = corpus.select(
        "vec_id",
        "embedding",
        similarity.norm64(F.col("embedding")).alias("nrm"),
    )
    probes = nn.where(_sem_probe_pred(F.col("vec_id"))).select(
        F.col("vec_id").alias("p"),
        F.col("embedding").alias("p_emb"),
        F.col("nrm").alias("p_nrm"),
    )
    cos = similarity.dot64(F.col("p_emb"), F.col("embedding")) / (
        F.col("p_nrm") * F.col("nrm")
    )
    truth = (
        nn.crossJoin(F.broadcast(probes))
        .where(F.col("p") != F.col("vec_id"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= 0.9)
        .select("p", F.col("vec_id").alias("o"))
    )
    found = similarity.semantic_near_duplicates_learned(
        corpus, threshold=0.9, probe_pred=_sem_probe_pred
    ).select("a", "b", F.lit(1).alias("hit"))
    keyed = truth.select(
        "p", F.least("p", "o").alias("a"), F.greatest("p", "o").alias("b")
    )
    return (
        keyed.join(found, ["a", "b"], "left")
        .groupBy("p")
        .agg(
            F.count("*").alias("n_true"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_found"),
        )
        .select(
            F.col("p").alias("probe_id"),
            "n_true",
            "n_found",
            (F.col("n_found") / F.col("n_true")).alias("recall"),
        )
    )


def _sql_semantic_recall_learned() -> str:
    cos_ab = (
        "list_sum(list_transform(range(1, 65), j -> a.e[j] * b.e[j]))"
        " / (a.nrm * b.nrm)"
    )
    cos_pc = (
        "list_sum(list_transform(range(1, 65), j -> p.e[j] * c.e[j]))"
        " / (p.nrm * c.nrm)"
    )
    return f"""
WITH emb_nd AS ({_ND_EMB}),
n AS (SELECT vec_id, embedding AS e FROM emb_nd)
{_sql_kmeans_ivf_cells()},
m AS (
  SELECT n.vec_id, n.e,
         sqrt(list_sum(list_transform(n.e, x -> x * x))) AS nrm,
         c.coarse, c.fine
  FROM n JOIN cells c USING (vec_id)
),
found AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM m a JOIN m b
    ON a.coarse = b.coarse AND a.fine = b.fine AND a.vec_id < b.vec_id
  WHERE {cos_ab} >= 0.9
),
nn AS (
  SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM n
),
truth AS (
  SELECT p.vec_id AS p, c.vec_id AS o
  FROM nn p, nn c
  WHERE p.vec_id % 20 = 0 AND p.vec_id < 1000000
    AND p.vec_id <> c.vec_id AND {cos_pc} >= 0.9
)
SELECT t.p AS probe_id, count(*) AS n_true,
       sum(CASE WHEN f.a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_found,
       sum(CASE WHEN f.a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT / count(*)
         AS recall
FROM truth t LEFT JOIN found f
  ON f.a = least(t.p, t.o) AND f.b = greatest(t.p, t.o)
GROUP BY t.p
"""


def q_distinct_kmv(spark, sf_dir):
    return sketches.kmv_distinct_tokens(load_table(spark, sf_dir, "documents"))


SQL_DISTINCT_KMV = f"""
WITH toks AS (
  SELECT DISTINCT lang, {hash60_sql('tok', "'kmv'")} AS h FROM (
    SELECT lang, unnest({_DUCK_WORDS}) AS tok FROM documents
  )
),
bottom AS (
  SELECT lang, h,
         row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
  FROM toks
)
SELECT lang, count(*) AS n_kept, max(h) AS kth_hash,
       CASE WHEN count(*) < {sketches.KMV_K} THEN count(*)::DOUBLE
            ELSE {float(sketches.KMV_K - 1) * sketches.HASH_SPACE!r}::DOUBLE
                 / max(h)::DOUBLE END AS est_distinct
FROM bottom WHERE rn <= {sketches.KMV_K} GROUP BY lang
"""

# Existing/incoming split for the Bloom screen — shared with the
# streaming twin via sources.derived so the two cannot drift (the
# rationale for the div-2000000 band mix lives there).
_BLOOM_SPLIT = BLOOM_SPLIT_DUCK
_BLOOM_SPLIT_SPARK = BLOOM_SPLIT_SPARK


def q_bloom_dedup(spark, sf_dir):
    docs = _docs_nd(spark, sf_dir)
    split = F.expr(_BLOOM_SPLIT_SPARK)
    return dedup.bloom_filter_dedup(
        docs.where(split == 0), docs.where(split == 1)
    )


def q_bloom_dedup_streaming(spark, sf_dir):
    from ..streaming.windows import streaming_bloom_dedup

    return streaming_bloom_dedup(spark, sf_dir)


SQL_BLOOM_DEDUP = f"""
WITH docs_nd AS ({_ND}),
ex AS (
  SELECT DISTINCT md5(text) AS key FROM docs_nd WHERE {_BLOOM_SPLIT} = 0
),
bits AS (
  SELECT DISTINCT {hash60_sql('key', "'bloom' || j::VARCHAR")} % {dedup.BLOOM_M}
         AS bit
  FROM ex CROSS JOIN range({dedup.BLOOM_K}) t(j)
),
inc AS (
  SELECT doc_id, md5(text) AS key FROM docs_nd WHERE {_BLOOM_SPLIT} = 1
),
pos AS (
  SELECT doc_id, key,
         {hash60_sql('key', "'bloom' || j::VARCHAR")} % {dedup.BLOOM_M} AS bit
  FROM inc CROSS JOIN range({dedup.BLOOM_K}) t(j)
),
hit AS (
  SELECT doc_id, key,
         bool_and(bit IN (SELECT bit FROM bits)) AS bloom_hit
  FROM pos GROUP BY doc_id, key
)
SELECT h.doc_id, h.bloom_hit, (e.key IS NOT NULL) AS is_dup
FROM hit h LEFT JOIN ex e ON e.key = h.key
"""


def q_dedup_lsh_screen(spark, sf_dir):
    """MinHash-LSH membership screen (batch form): existing split's
    distinct band index probed by the incoming split's per-row
    signatures — the NEAR-dup analogue of `bloom_dedup`, the screen a
    continuous-ingest pipeline runs before pricing the exact verify."""
    docs = _docs_nd(spark, sf_dir)
    split = F.expr(_BLOOM_SPLIT_SPARK)
    return dedup.lsh_screen(docs.where(split == 0), docs.where(split == 1))


def q_dedup_lsh_screen_streaming(spark, sf_dir):
    from ..streaming.windows import streaming_lsh_screen

    return streaming_lsh_screen(spark, sf_dir)


def q_lsh_index_roundtrip(spark, sf_dir):
    """The LSH band index AS A PERSISTED INDEX — the near-dup serving
    path, completing the persisted-index story `ivf_index_roundtrip`
    tells for the vector family: build the existing split's distinct
    ``(band_id, band_key)`` relation (`dedup.lsh_band_index`), WRITE it
    to parquet (two small deterministic columns, lossless), READ it
    back, and screen the incoming split purely from the on-disk
    relation (`dedup.lsh_screen_from_index`). Proof the index is DATA,
    not session state: a 100 TB ingest fleet builds it once and every
    later admission job probes parquet. Output identical to
    `dedup_lsh_screen` (round-trip identity) — one oracle string by
    the registry guard."""
    import tempfile

    docs = _docs_nd(spark, sf_dir)
    split = F.expr(_BLOOM_SPLIT_SPARK)
    idx = dedup.lsh_band_index(docs.where(split == 0))
    d = tempfile.mkdtemp(prefix="lsh_index_")
    idx.write.mode("overwrite").parquet(f"{d}/bands")
    return dedup.lsh_screen_from_index(
        spark.read.parquet(f"{d}/bands"), docs.where(split == 1)
    )


_LSH_HITS = "sum(CASE WHEN idx.band_id IS NOT NULL THEN 1 ELSE 0 END)"

SQL_DEDUP_LSH_SCREEN = f"""
WITH {_DUCK_SHINGLE_SET},
sigs AS (
  SELECT doc_id, {_LANES}
  FROM shh GROUP BY doc_id
),
bands AS (
  {_BAND_SELECTS}
),
idx AS (
  SELECT DISTINCT band_id, band_key FROM bands
  WHERE ({_BLOOM_SPLIT}) = 0
),
inc AS (
  SELECT doc_id, band_id, band_key FROM bands
  WHERE ({_BLOOM_SPLIT}) = 1
)
SELECT inc.doc_id,
       {_LSH_HITS}::BIGINT AS n_bands_hit,
       {_LSH_HITS} > 0 AS lsh_hit
FROM inc LEFT JOIN idx USING (band_id, band_key)
GROUP BY inc.doc_id
"""


def q_chunk_dedup(spark, sf_dir):
    """Repeated-passage chunks over the derived near-dup corpus (exact
    copies share every chunk; truncation mutants share all but the
    final windows)."""
    return textops.chunk_dedup(_docs_nd(spark, sf_dir))


def _sql_chunk_dedup() -> str:
    c, s = textops.CHUNK_TOKENS, textops.CHUNK_STEP
    return f"""
WITH docs_nd AS ({_ND}),
w AS (
  SELECT doc_id, {_DUCK_WORDS} AS ws FROM docs_nd
),
st AS (
  SELECT doc_id, ws,
         unnest(range(1, greatest(len(ws), 1) + 1, {s})) AS chunk_start
  FROM w
),
ch AS (
  SELECT doc_id,
         md5(array_to_string(
           list_slice(ws, chunk_start, chunk_start + {c} - 1), ' '))
           AS chunk_hash
  FROM st
)
SELECT chunk_hash,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_occurrences,
       min(doc_id) AS canonical_doc
FROM ch GROUP BY chunk_hash HAVING count(DISTINCT doc_id) >= 2
"""


def q_token_budget_sample(spark, sf_dir):
    return textops.token_budget_sample(load_table(spark, sf_dir, "documents"))


def _sql_quality_scored() -> str:
    """Shared CTE body: (lang, doc_id, n_tokens, quality_score) with
    the exact `textops.quality_score_expr` arithmetic (integer counts
    divided as exact ints, same fold order)."""
    return f"""
  SELECT lang, doc_id,
         len({_DUCK_WORDS})::BIGINT AS n_tokens,
         {_DUCK_QUALITY_EXPR} AS quality_score
  FROM documents
"""


def _sql_token_budget_sample() -> str:
    return f"""
WITH scored AS ({_sql_quality_scored()}),
c AS (
  SELECT lang, doc_id, n_tokens, quality_score,
         sum(n_tokens) OVER (
           PARTITION BY lang ORDER BY quality_score DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         )::BIGINT AS cum_tokens
  FROM scored
)
SELECT lang, doc_id, n_tokens, cum_tokens, quality_score
FROM c WHERE cum_tokens - n_tokens < {textops.TOKEN_BUDGET}
"""


def q_quality_band(spark, sf_dir):
    return textops.quality_band_filter(load_table(spark, sf_dir, "documents"))


def _sql_quality_band() -> str:
    return f"""
WITH scored AS ({_sql_quality_scored()})
SELECT lang, doc_id, quality_score, pr FROM (
  SELECT lang, doc_id, quality_score,
         percent_rank() OVER (
           PARTITION BY lang ORDER BY quality_score ASC, doc_id
         ) AS pr
  FROM scored
) WHERE pr >= 0.1 AND pr <= 0.9
"""


def q_doc_repetition(spark, sf_dir):
    return textops.doc_repetition(load_table(spark, sf_dir, "documents"))


SQL_DOC_REPETITION = f"""
WITH g AS (
  SELECT doc_id, {_DUCK_SHINGLES} AS grams FROM documents
)
SELECT doc_id,
       len(grams)::BIGINT AS n_grams,
       len(list_distinct(grams))::BIGINT AS n_distinct_grams,
       (len(grams)::BIGINT - len(list_distinct(grams))::BIGINT)
         / len(grams)::BIGINT AS rep_ratio
FROM g
"""


def q_pack_sequences(spark, sf_dir):
    return textops.pack_sequences(load_table(spark, sf_dir, "documents"))


def _sql_pack_sequences() -> str:
    return f"""
WITH sized AS (
  SELECT lang, doc_id, len({_DUCK_WORDS})::BIGINT AS n_tokens
  FROM documents
),
packed AS (
  SELECT lang, doc_id, n_tokens,
         (sum(n_tokens) OVER (
            PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
          )::BIGINT - n_tokens) // {textops.SEQ_LEN} AS pack_id
  FROM sized
)
SELECT lang, pack_id, count(*) AS n_docs,
       sum(n_tokens)::BIGINT AS n_tokens, min(doc_id) AS first_doc
FROM packed GROUP BY lang, pack_id
"""


PIPELINE_MIN_QUALITY = 0.4


def q_curation_pipeline(spark, sf_dir):
    """The END-TO-END pre-training curation pipeline as ONE lazy DAG,
    composed from the engine's stages — proof the operators compose the
    way a user would chain them:

      raw documents
        → `dedup.canonicalize_exact`        (exact-dup collapse first —
                                             the measured-17x ordering)
        → quality floor (`quality_score_expr >= 0.4`)
        → held-out eval split excluded (doc_id % 10 == 7) and
          `textops.decontaminate`-flagged train docs dropped
        → `textops.pack_sequences`          (training-sequence manifest)

    Output: the final per-pack manifest. Catalyst fuses the scan-side
    stages (canonicalize window + quality + splits ride one scan); the
    decon gram join and the pack window are the only data-sized
    shuffles.
    """
    from ..operators.dedup import canonicalize_exact

    docs = load_table(spark, sf_dir, "documents")
    canon = canonicalize_exact(docs)
    train = canon.where(
        (F.expr("doc_id % 10") != 7)
        & (textops.quality_score_expr() >= PIPELINE_MIN_QUALITY)
    )
    eval_docs = docs.where(F.expr("doc_id % 10") == 7)
    contaminated = textops.decontaminate(train, eval_docs).select("doc_id")
    clean = train.join(contaminated, "doc_id", "anti")
    return textops.pack_sequences(clean)


def _sql_curation_pipeline() -> str:
    n, seq = textops.DECON_NGRAM, textops.SEQ_LEN
    grams8 = _DUCK_SHINGLES8
    return f"""
WITH canon AS (
  SELECT doc_id, lang, text FROM (
    SELECT doc_id, lang, text,
           min(doc_id) OVER (PARTITION BY md5(text)) AS canonical
    FROM documents
  ) WHERE doc_id = canonical
),
train AS (
  SELECT doc_id, lang, text FROM canon
  WHERE doc_id % 10 <> 7 AND ({_DUCK_QUALITY_EXPR}) >= {PIPELINE_MIN_QUALITY}
),
evg AS (
  SELECT DISTINCT doc_id AS eval_id, {hash60_sql('sh')} AS g FROM (
    SELECT doc_id, unnest({grams8}) AS sh
    FROM documents WHERE doc_id % 10 = 7
  )
),
hot AS (SELECT g FROM evg GROUP BY g HAVING count(*) > {dedup.DEFAULT_MAX_DF}),
evc AS (SELECT * FROM evg WHERE g NOT IN (SELECT g FROM hot)),
trg AS (
  SELECT DISTINCT doc_id, {hash60_sql('sh')} AS g FROM (
    SELECT doc_id, unnest({grams8}) AS sh FROM train
  )
),
contaminated AS (
  SELECT DISTINCT t.doc_id FROM trg t JOIN evc e ON t.g = e.g
),
clean AS (
  SELECT * FROM train
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
sized AS (
  SELECT lang, doc_id, len({_DUCK_WORDS})::BIGINT AS n_tokens FROM clean
),
packed AS (
  SELECT lang, doc_id, n_tokens,
         (sum(n_tokens) OVER (
            PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
          )::BIGINT - n_tokens) // {seq} AS pack_id
  FROM sized
)
SELECT lang, pack_id, count(*) AS n_docs,
       sum(n_tokens)::BIGINT AS n_tokens, min(doc_id) AS first_doc
FROM packed GROUP BY lang, pack_id
"""


def q_events_attribution(spark, sf_dir):
    return events.purchase_attribution(load_table(spark, sf_dir, "events"))


def q_events_attribution_streaming(spark, sf_dir):
    from ..streaming.windows import streaming_purchase_attribution

    return streaming_purchase_attribution(spark, sf_dir)


SQL_EVENTS_ATTRIBUTION = """
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
  FROM events
),
p AS (
  SELECT event_id AS purchase_id, user_id, ts_us AS purchase_ts_us FROM ev
  WHERE event_type = 'purchase'
),
m AS (
  SELECT p.purchase_id,
         count(*)::BIGINT AS n_attributed,
         sum(e.value::DECIMAL(18,2))::DOUBLE AS attributed_value
  FROM p JOIN ev e
    ON e.user_id = p.user_id AND e.event_type <> 'purchase'
   AND e.ts_us >= p.purchase_ts_us - 3600000000
   AND e.ts_us < p.purchase_ts_us
  GROUP BY p.purchase_id
)
SELECT p.purchase_id, p.user_id, p.purchase_ts_us,
       coalesce(m.n_attributed, 0)::BIGINT AS n_attributed,
       coalesce(m.attributed_value, 0.0)::DOUBLE AS attributed_value
FROM p LEFT JOIN m USING (purchase_id)
"""


def q_cms_heavy_hitters(spark, sf_dir):
    return sketches.cms_topk_diagnostic(load_table(spark, sf_dir, "documents"))


SQL_CMS_HEAVY_HITTERS = f"""
WITH toks AS (SELECT unnest({_DUCK_WORDS}) AS tok FROM documents),
tc AS (SELECT tok, count(*)::BIGINT AS true_cnt FROM toks GROUP BY tok),
top AS (
  SELECT tok, true_cnt,
         row_number() OVER (ORDER BY true_cnt DESC, tok)::BIGINT AS rank
  FROM tc QUALIFY rank <= 20
),
rows_ AS (SELECT unnest([0, 1, 2, 3]) AS row),
sketch AS (
  SELECT row,
         ('0x' || substr(md5('cms' || row || ':' || tok), 1, 15))::BIGINT
           % 512 AS col,
         count(*)::BIGINT AS cnt
  FROM toks, rows_ GROUP BY row, col
),
probe_cells AS (
  SELECT top.tok, top.rank, top.true_cnt, r.row,
         ('0x' || substr(md5('cms' || r.row || ':' || top.tok), 1, 15))::BIGINT
           % 512 AS col
  FROM top CROSS JOIN rows_ r
)
SELECT p.tok, p.rank, p.true_cnt, min(s.cnt)::BIGINT AS est_cnt
FROM probe_cells p JOIN sketch s USING (row, col)
GROUP BY p.tok, p.rank, p.true_cnt
"""


# ------------------------------------------- LM scoring / mixing / sharding

def q_bigram_novelty(spark, sf_dir):
    return textops.bigram_novelty(load_table(spark, sf_dir, "documents"))


# word_shingles(n=2) twin: len(W)-1 two-word grams, whole text when <2
_DUCK_BIGRAMS = f"""
CASE WHEN len({_DUCK_WORDS}) < 2 THEN [text]
     ELSE [array_to_string(list_slice({_DUCK_WORDS}, i, i + 1), ' ')
           for i in range(1, len({_DUCK_WORDS}))] END
"""

SQL_BIGRAM_NOVELTY = f"""
WITH grams AS (
  SELECT doc_id, unnest({_DUCK_BIGRAMS}) AS gram FROM documents
),
freq AS (SELECT gram, count(*)::BIGINT AS freq FROM grams GROUP BY gram)
SELECT g.doc_id AS doc_id,
       count(*)::BIGINT AS n_grams,
       sum(f.freq)::BIGINT / count(*)::BIGINT AS avg_gram_freq,
       sum(CASE WHEN f.freq = 1 THEN 1 ELSE 0 END)::BIGINT
         / count(*)::BIGINT AS rare_ratio
FROM grams g JOIN freq f USING (gram)
GROUP BY g.doc_id
"""


def q_domain_mixture(spark, sf_dir):
    return textops.domain_mixture(load_table(spark, sf_dir, "documents"))


SQL_DOMAIN_MIXTURE = f"""
WITH s AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(len({_DUCK_WORDS}))::BIGINT AS total_tokens,
         round(sqrt(count(*)) * 1000000)::BIGINT AS w_num
  FROM documents GROUP BY source
),
d AS (SELECT sum(w_num)::BIGINT AS denom FROM s)
SELECT source, n_docs, total_tokens,
       w_num / denom AS weight,
       floor(100000 * w_num / denom)::BIGINT AS expected_docs
FROM s, d
"""


def q_shard_assign(spark, sf_dir):
    return textops.assign_shards(load_table(spark, sf_dir, "documents"))


def _sql_shard_assign() -> str:
    h = hash60_sql("doc_id::VARCHAR", "'shard'")
    return f"""
WITH h AS (SELECT doc_id, {h} AS h FROM documents)
SELECT doc_id, (h % 20)::INT AS shard,
       row_number() OVER (PARTITION BY h % 20 ORDER BY h, doc_id)::BIGINT AS pos
FROM h
"""


def q_dataset_split(spark, sf_dir):
    """Leakage-safe train/val/test split: the split unit is the
    near-duplicate CLUSTER, not the document. Splitting documents
    independently leaks near-copies of training docs into eval (the
    standard contamination failure); hashing the cluster label instead
    sends every member of a duplicate family to the same side.

    Pipeline: MinHash+LSH pairs → connected components (both the
    already-audited machinery) → singletons fall back to their own
    doc_id as group → deterministic 60-bit seeded hash of the group id
    buckets 90/5/5. Everything after the components is map-side (one
    left join on doc_id + a hash expression) — the split adds no new
    shuffle beyond the cluster closure, and the assignment is stable
    across runs, engines, and partitionings (unlike randomSplit).
    """
    from ..functions.text import hash60

    docs = _docs_nd(spark, sf_dir)
    pairs = dedup.minhash_near_duplicates(docs, threshold=0.5).select(
        "a", "b"
    )
    cc = dedup.connected_components(pairs, check_every=2)  # duplicate graphs converge in 2-3 rounds; halve the count jobs
    members = cc.select(
        F.col("node").alias("doc_id"), F.col("label").alias("gid")
    )
    joined = docs.select("doc_id").join(members, "doc_id", "left")
    gid = F.coalesce(F.col("gid"), F.col("doc_id"))
    bucket = F.pmod(hash60(gid.cast("string"), seed="split"), F.lit(100))
    split = (
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return joined.select(
        "doc_id",
        gid.alias("group_id"),
        bucket.cast("int").alias("bucket"),
        split.alias("split"),
    )


def q_dup_weighting(spark, sf_dir):
    """Inverse-duplication sampling weights — the SOFT alternative to
    hard near-dup removal (keep every copy but down-weight it so a
    family of d near-copies contributes ~one document's worth of
    training signal): weight = 1/|near-dup cluster|, singletons 1.0.
    Rides the same MinHash→connected-components closure as
    `dataset_split`; after the closure everything is one map-side
    count join — no new shuffle class. Weight is an exact single
    division of integers (value-hash stable)."""
    docs = _docs_nd(spark, sf_dir)
    pairs = dedup.minhash_near_duplicates(docs, threshold=0.5).select(
        "a", "b"
    )
    cc = dedup.connected_components(pairs, check_every=2)  # duplicate graphs converge in 2-3 rounds; halve the count jobs
    members = cc.select(
        F.col("node").alias("doc_id"), F.col("label").alias("gid")
    )
    joined = docs.select("doc_id").join(members, "doc_id", "left")
    gid = F.coalesce(F.col("gid"), F.col("doc_id"))
    sized = joined.select("doc_id", gid.alias("group_id"))
    counts = sized.groupBy("group_id").agg(
        F.count("*").cast("bigint").alias("group_size")
    )
    return sized.join(counts, "group_id").select(
        "doc_id",
        "group_id",
        "group_size",
        (F.lit(1.0) / F.col("group_size")).alias("weight"),
    )


def _sql_dup_weighting() -> str:
    return f"""
WITH RECURSIVE {_DUCK_CC_CTES},
g AS (
  SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS group_id
  FROM docs_nd d LEFT JOIN cc ON cc.doc_id = d.doc_id
),
c AS (SELECT group_id, count(*)::BIGINT AS group_size FROM g GROUP BY 1)
SELECT g.doc_id, g.group_id, c.group_size,
       1.0::DOUBLE / c.group_size AS weight
FROM g JOIN c USING (group_id)
"""


def _sql_dataset_split() -> str:
    h = hash60_sql("group_id::VARCHAR", "'split'")
    return f"""
WITH RECURSIVE {_DUCK_CC_CTES},
g AS (
  SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS group_id
  FROM docs_nd d LEFT JOIN cc ON cc.doc_id = d.doc_id
),
b AS (
  SELECT doc_id, group_id, ({h} % 100)::INT AS bucket FROM g
)
SELECT doc_id, group_id, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(spark, sf_dir):
    """Wide-format user activity matrix: one row per user, one count
    column per event type — the pivot operator. The value list is
    EXPLICIT (``pivot(col, values)``): without it Spark runs an eager
    distinct scan to discover the columns and the output schema becomes
    data-dependent — both wrong at 100 TB, where the type vocabulary is
    a declared contract. Physical shape: the pivot compiles to one hash
    aggregation with per-type conditional counts (same plan as the
    manual CASE form the oracle spells out) — map-side partial, one
    shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


SQL_EVENTS_PIVOT = f"""
SELECT user_id,
       {", ".join(
           f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)::BIGINT"
           f" AS n_{t}" for t in EVENT_TYPES
       )}
FROM events GROUP BY user_id
"""


def _mhr_probe_pred(col):
    """Deterministic ~1% hash sample of ORIGINAL docs (< 1e6 excludes
    the derived mutant/copy ids) — the recall probes. Hash-based (not
    ``% 100`` on the id) so it is unbiased under any id assignment
    scheme, and a FIXED rate so the diagnostic's cost stays a constant
    fraction of the corpus (round-5 advice: the exact-truth join at
    2% probes × 10x replica was the diagnostic's scale wall)."""
    from ..functions.text import hash60

    return (hash60(col.cast("string"), seed="mhr") % 100 == 0) & (
        col < 1_000_000
    )


def q_minhash_recall(spark, sf_dir):
    """Self-measuring dedup-index quality, the text twin of
    `ann_recall_lsh`: per probe document, what fraction of its TRUE
    near-duplicates (exact Jaccard ≥ 0.5 over the same uncapped
    shingle universe the MinHash path uses) does the banded LSH
    pipeline recover? The found side runs the same signatures → banded
    candidates → exact-verify pipeline as `dedup.minhash_near_
    duplicates`, with the candidate set probe-restricted BEFORE the
    verify join (recall only scores probe-touching pairs, and a
    banding miss is decided at candidate generation — restricting
    later stages cannot change any probe's verdict). Probes are a
    deterministic ~1% hash sample (:func:`_mhr_probe_pred`), so both
    the exact-truth join and the verify stage cost a fixed ~1% of
    their full-corpus forms — the production shape for running this
    diagnostic continuously at 100 TB.
    """
    from ..cache import materialize

    docs = _docs_nd(spark, sf_dir)
    sh = dedup.shingle_sets(docs).select("doc_id", "sh_hash")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    probes = sh.where(_mhr_probe_pred(F.col("doc_id")))
    pinter = (
        probes.select(F.col("doc_id").alias("p"), "sh_hash")
        .join(sh.select(F.col("doc_id").alias("o"), "sh_hash"), "sh_hash")
        .where(F.col("p") != F.col("o"))
        .groupBy("p", "o")
        .agg(F.count("*").alias("i"))
    )
    truth = (
        pinter.join(
            sizes.select(F.col("doc_id").alias("p"), F.col("n").alias("np_")),
            "p",
        )
        .join(
            sizes.select(F.col("doc_id").alias("o"), F.col("n").alias("no_")),
            "o",
        )
        .where(
            F.col("i") / (F.col("np_") + F.col("no_") - F.col("i")) >= 0.5
        )
        .select("p", "o")
    )
    hashed = dedup.hashed_shingle_arrays(docs)
    cands = materialize(
        dedup.lsh_candidates(dedup.minhash_signatures(hashed)).where(
            _mhr_probe_pred(F.col("a")) | _mhr_probe_pred(F.col("b"))
        )
    )
    found = dedup.jaccard_pairs(
        hashed, cands, threshold=0.5, candidate_count=cands.count()
    ).select("a", "b", F.lit(1).alias("hit"))
    keyed = truth.select(
        "p", F.least("p", "o").alias("a"), F.greatest("p", "o").alias("b")
    )
    return (
        keyed.join(found, ["a", "b"], "left")
        .groupBy("p")
        .agg(
            F.count("*").alias("n_true"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_found"),
        )
        .select(
            F.col("p").alias("probe_id"),
            "n_true",
            "n_found",
            (F.col("n_found") / F.col("n_true")).alias("recall"),
        )
    )


def _mhr_probe_pred_sql(col: str) -> str:
    """DuckDB twin of :func:`_mhr_probe_pred`."""
    return (
        f"({hash60_sql(col + '::VARCHAR', chr(39) + 'mhr' + chr(39))} % 100 = 0"
        f" AND {col} < 1000000)"
    )


SQL_MINHASH_RECALL = f"""
WITH {_DUCK_SHINGLE_SET},
sigs AS (
  SELECT doc_id, {_LANES}
  FROM shh GROUP BY doc_id
),
bands AS (
  {_BAND_SELECTS}
),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r USING (band_id, band_key)
  WHERE l.doc_id < r.doc_id
    AND ({_mhr_probe_pred_sql('l.doc_id')}
         OR {_mhr_probe_pred_sql('r.doc_id')})
),
inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cand c
  JOIN shh x ON x.doc_id = c.a
  JOIN shh y ON y.doc_id = c.b AND y.sh_hash = x.sh_hash
  GROUP BY c.a, c.b
),
mh AS (
  SELECT i2.a, i2.b FROM inter i2
  JOIN sizes sa ON sa.doc_id = i2.a
  JOIN sizes sb ON sb.doc_id = i2.b
  WHERE i2.i / (sa.n + sb.n - i2.i) >= 0.5
),
pinter AS (
  SELECT x.doc_id AS p, y.doc_id AS o, count(*) AS i
  FROM shh x JOIN shh y ON y.sh_hash = x.sh_hash AND x.doc_id <> y.doc_id
  WHERE {_mhr_probe_pred_sql('x.doc_id')}
  GROUP BY 1, 2
),
truth AS (
  SELECT pi.p, pi.o FROM pinter pi
  JOIN sizes sp ON sp.doc_id = pi.p
  JOIN sizes so ON so.doc_id = pi.o
  WHERE pi.i / (sp.n + so.n - pi.i) >= 0.5
)
SELECT t.p AS probe_id, count(*) AS n_true,
       sum(CASE WHEN m.a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_found,
       sum(CASE WHEN m.a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT / count(*)
         AS recall
FROM truth t LEFT JOIN mh m
  ON m.a = least(t.p, t.o) AND m.b = greatest(t.p, t.o)
GROUP BY t.p
"""


def q_events_rolling(spark, sf_dir):
    """Trailing 1h per-user rolling count/sum (RANGE frame)."""
    return events.rolling_window(load_table(spark, sf_dir, "events"))


SQL_EVENTS_ROLLING = f"""
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       count(*) OVER w AS n_events_1h,
       sum(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0 AS sum_value_1h
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN {events.HOUR_US} PRECEDING AND CURRENT ROW
)
"""


def q_events_retention(spark, sf_dir):
    """Cohort retention matrix (`events.retention_cohorts`): users
    bucketed by first-active day, counted per (cohort, whole-day age)
    they were active again — integer-exact day arithmetic, shuffles on
    bounded keys (user/day pairs, then cohort/age), never a window over
    the raw stream."""
    return events.retention_cohorts(load_table(spark, sf_dir, "events"))


SQL_EVENTS_RETENTION = f"""
WITH act AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {events.DAY_US} AS day FROM events
),
first AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1)
SELECT (f.cohort_day * {events.DAY_US})::BIGINT AS cohort_start_us,
       (a.day - f.cohort_day)::BIGINT AS age_days,
       count(*)::BIGINT AS n_users
FROM act a JOIN first f USING (user_id)
GROUP BY 1, 2
"""


def q_corpus_upsert(spark, sf_dir):
    """Latest-wins snapshot merge: the base corpus (version 1) merged
    with an update batch (every 5th doc re-crawled as version 2 with
    edited text) — one surviving row per doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "text", F.lit(1).cast("bigint").alias("version")
    )
    updates = docs.where(F.col("doc_id") % 5 == 0).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" [recrawled]")).alias("text"),
        F.lit(2).cast("bigint").alias("version"),
    )
    return dedup.corpus_upsert(base, updates)


SQL_CORPUS_UPSERT = """
WITH base AS (
  SELECT doc_id, text, 1::BIGINT AS version FROM documents
),
updates AS (
  SELECT doc_id, text || ' [recrawled]' AS text, 2::BIGINT AS version
  FROM documents WHERE doc_id % 5 = 0
),
merged AS (
  SELECT doc_id, version, md5(text) AS text_hash FROM base
  UNION ALL
  SELECT doc_id, version, md5(text) AS text_hash FROM updates
)
SELECT doc_id, version, text_hash FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY version DESC, text_hash DESC
  ) AS rn
  FROM merged
) WHERE rn = 1
"""


def q_ivf_upsert_assign(spark, sf_dir):
    """Continuous-ANN index maintenance, batch form
    (`kmeans.kmeans_ivf_assign_incoming`): the even-id half of the
    embeddings table is the INDEXED base (quantizer = coarse Lloyd
    centroids on its deterministic sample + its fine table, built once
    and materialized); the odd-id half is the INCOMING batch, paying
    one broadcast argmin + one coarse-cell equi-join — never a
    relearn. Output rows are what an upsert appends to the index."""
    from ..operators import kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans.kmeans_ivf_assign_incoming(
        emb.where("vec_id % 2 = 0"), emb.where("vec_id % 2 = 1")
    )


def q_ivf_upsert_assign_streaming(spark, sf_dir):
    """The same assignment as a stream (`streaming.windows.
    streaming_ivf_upsert_assign`): incoming vectors on a file stream
    resolve coarse cells against the static broadcast centroid table;
    argmin state = (vec_id, dist, cell) only; fine cells resolve
    batch-side post-drain through shared code. Shares the batch oracle
    by the registry twin guard."""
    from ..streaming.windows import streaming_ivf_upsert_assign

    return streaming_ivf_upsert_assign(spark, sf_dir)


def _sql_ivf_upsert_cells() -> str:
    """CTE chain (appends to an open WITH providing ``b`` = base and
    ``inc`` = incoming, both (vec_id, e)) ending in ``ucells`` =
    (vec_id, coarse, fine, d) for the INCOMING vectors assigned against
    the base-built static quantizer — the SQL twin of
    `kmeans.kmeans_ivf_assign_incoming`. Every generated CTE is
    u-prefixed (including the Lloyd chain) so the relearn chain
    `_sql_kmeans_ivf_cells` can coexist in the same WITH (the
    `ivf_upsert_drift` oracle runs both)."""
    from ..operators import kmeans

    iters, salts = kmeans.KM_ITERS, kmeans.KM_SALTS
    smod, fmod = kmeans.KM_IVF_SAMPLE_MOD, kmeans.KM_IVF_FINE_MOD
    k = "(SELECT greatest(2, CAST(floor(sqrt(count(*))) AS BIGINT)) FROM us)"
    dist_b = (
        "list_sum(list_transform(range(1, 65),"
        " j -> (b.e[j] - ucoarse.c[j]) * (b.e[j] - ucoarse.c[j])))"
    )
    dist_i = (
        "list_sum(list_transform(range(1, 65),"
        " j -> (i.e[j] - ucoarse.c[j]) * (i.e[j] - ucoarse.c[j])))"
    )
    dist_f = (
        "list_sum(list_transform(range(1, 65),"
        " j -> (a.e[j] - fi.f[j]) * (a.e[j] - fi.f[j])))"
    )
    return f""",
us AS (SELECT vec_id, e FROM b WHERE vec_id % {smod} = 0)
{_sql_kmeans_lloyd('us', k, iters, salts, prefix='u')},
ucoarse AS (SELECT cluster AS coarse, c FROM ucent{iters}),
ubassigned AS (
  SELECT vec_id, e, coarse FROM (
    SELECT b.vec_id, b.e, ucoarse.coarse,
           row_number() OVER (
             PARTITION BY b.vec_id ORDER BY {dist_b}, ucoarse.coarse
           ) AS rn
    FROM b, ucoarse
  ) WHERE rn = 1
),
ufine AS (
  SELECT coarse, vec_id AS fine_id, e AS f
  FROM ubassigned WHERE vec_id % {fmod} = 0
),
uiassigned AS (
  SELECT vec_id, e, coarse FROM (
    SELECT i.vec_id, i.e, ucoarse.coarse,
           row_number() OVER (
             PARTITION BY i.vec_id ORDER BY {dist_i}, ucoarse.coarse
           ) AS rn
    FROM inc i, ucoarse
  ) WHERE rn = 1
),
uscored AS (
  SELECT a.vec_id, a.coarse, fi.fine_id,
         CASE WHEN fi.fine_id IS NULL THEN NULL ELSE {dist_f} END AS d
  FROM uiassigned a LEFT JOIN ufine fi ON fi.coarse = a.coarse
),
ucells AS (
  SELECT vec_id, coarse, coalesce(fine_id, -1)::BIGINT AS fine, d FROM (
    SELECT vec_id, coarse, fine_id, d,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, fine_id) AS rn
    FROM uscored
  ) WHERE rn = 1
)"""


_SQL_UPSERT_SPLIT = """
WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
b AS (SELECT vec_id, e FROM n WHERE vec_id % 2 = 0),
inc AS (SELECT vec_id, e FROM n WHERE vec_id % 2 = 1)"""


def _sql_ivf_upsert_assign() -> str:
    return f"""{_SQL_UPSERT_SPLIT}
{_sql_ivf_upsert_cells()}
SELECT vec_id, coarse, fine, d FROM ucells
"""


def q_ivf_index_roundtrip(spark, sf_dir):
    """The quantizer AS A PERSISTED INDEX — the serving path: build
    from the base half (`kmeans.ivf_quantizer`), WRITE both tables
    (coarse centroids, fine table — arrays of double, lossless in
    parquet) to disk, READ them back, and assign the incoming half
    purely from the on-disk relations
    (`kmeans.ivf_assign_from_index`). Proof the index is DATA, not
    session state: build once, serve from any later job. Output is
    identical to `ivf_upsert_assign` (round-trip identity) — one
    oracle string by the registry guard."""
    import tempfile

    from ..operators import kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    coarse, fine = kmeans.ivf_quantizer(emb.where("vec_id % 2 = 0"))
    d = tempfile.mkdtemp(prefix="ivf_index_")
    coarse.write.mode("overwrite").parquet(f"{d}/coarse")
    fine.write.mode("overwrite").parquet(f"{d}/fine")
    return kmeans.ivf_assign_from_index(
        spark.read.parquet(f"{d}/coarse"),
        spark.read.parquet(f"{d}/fine"),
        emb.where("vec_id % 2 = 1"),
    )


def q_pq_codes_upsert(spark, sf_dir):
    """PQ code-index maintenance, batch form: the per-subspace codebook
    is Lloyd-learned once from the indexed (even-id) half's
    deterministic sample (`pq.pq_codebook_learned(train_mod=4)`), and
    the incoming (odd-id) half is ENCODED against it (`pq.pq_encode` —
    one broadcast join + one argmin aggregate, M small ints per
    vector). Together with `ivf_upsert_assign` this appends everything
    IVF-ADC needs for new vectors without touching the learned
    structures. Output (vec_id, subspace, code)."""
    from ..cache import materialize
    from ..operators import pq

    emb = load_table(spark, sf_dir, "embeddings")
    codebook = materialize(
        pq.pq_codebook_learned(emb.where("vec_id % 2 = 0"), train_mod=4)
    )
    return pq.pq_encode(emb.where("vec_id % 2 = 1"), codebook).select(
        "vec_id",
        F.col("subspace").cast("bigint").alias("subspace"),
        "code",
    )


def q_pq_codes_upsert_streaming(spark, sf_dir):
    """The same encoding as a stream (`streaming.windows.
    streaming_pq_encode`): incoming vectors explode to subvectors
    stream-side, score against the static broadcast codebook, and hold
    only per-(vec_id, subspace) argmin state. Shares the batch oracle
    by the registry twin guard."""
    from ..streaming.windows import streaming_pq_encode

    return streaming_pq_encode(spark, sf_dir)


def _sql_pq_codes_upsert() -> str:
    from ..operators import kmeans, pq as _pq

    m, sd, kcw = _pq.PQ_M, _pq.PQ_SUBDIM, _pq.PQ_CODEWORDS
    cb_iters = _pq.PQ_LLOYD_ITERS
    salts = kmeans.KM_SALTS
    code_l2 = (
        f"list_sum(list_transform(range(1, {sd + 1}),"
        " j -> (v.sub[j] - c.csub[j]) * (v.sub[j] - c.csub[j])))"
    )
    return f"""
WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
s AS (SELECT vec_id, e FROM n WHERE vec_id % 2 = 0 AND vec_id % 4 = 0),
subspaces AS (SELECT unnest(range(0, {m})) AS m),
tsub AS (
  SELECT vec_id, sp.m AS subspace,
         list_transform(range(1, {sd + 1}), j -> e[sp.m * {sd} + j]) AS sub
  FROM s, subspaces sp
)
{_sql_pq_lloyd(cb_iters, salts, sd, kcw, sub_src='tsub', seed_src='s')},
isub AS (
  SELECT vec_id, sp.m AS subspace,
         list_transform(range(1, {sd + 1}), j -> e[sp.m * {sd} + j]) AS sub
  FROM n, subspaces sp
  WHERE vec_id % 2 = 1
)
SELECT vec_id, subspace, cid AS code FROM (
  SELECT v.vec_id, v.subspace, c.cid,
         row_number() OVER (
           PARTITION BY v.vec_id, v.subspace ORDER BY {code_l2}, c.cid
         ) AS rn
  FROM isub v JOIN pcent{cb_iters} c USING (subspace)
) WHERE rn = 1
"""


def q_ivf_upsert_drift(spark, sf_dir):
    """Index-staleness diagnostic for the upsert path
    (`kmeans.ivf_upsert_drift`): per incoming vector, the fine-level
    quantization distance under the STATIC base-built quantizer (what
    the upsert writes) vs under a FULL relearn over base+incoming (what
    a retrain would give). ``excess = d_upsert - d_relearn`` is the
    error the upsert tolerates — the number an index-ops schedule
    watches to decide when retraining pays. Cell labels from the two
    quantizers live in different label spaces, so only DISTANCES are
    compared (metric-valid across quantizers); per-row output, no
    float aggregation to go non-deterministic."""
    from ..operators import kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans.ivf_upsert_drift(
        emb.where("vec_id % 2 = 0"), emb.where("vec_id % 2 = 1")
    )


def _sql_ivf_upsert_drift() -> str:
    return f"""{_SQL_UPSERT_SPLIT}
{_sql_ivf_upsert_cells()}
{_sql_kmeans_ivf_cells()}
SELECT u.vec_id, u.d AS d_upsert, c.d AS d_relearn,
       u.d - c.d AS excess
FROM ucells u JOIN cells c USING (vec_id)
"""


def q_corpus_upsert_streaming(spark, sf_dir):
    """The latest-wins upsert as a stream (`streaming.windows.
    streaming_corpus_upsert`): re-crawls arrive on a file stream,
    per-key winner state stays (version, digest)-sized, the drained
    delta resolves against the static snapshot batch-side. Shares the
    batch `corpus_upsert` oracle by the registry twin guard."""
    from ..streaming.windows import streaming_corpus_upsert

    return streaming_corpus_upsert(spark, sf_dir)


def q_ann_recall_ivf(spark, sf_dir):
    """Recall@5 of the IVF path vs the exact brute-force ranking —
    completes the self-measuring diagnostic matrix alongside
    `ann_recall_lsh` and `minhash_recall`: every approximate index the
    engine ships reports its own measured recall as an oracle-checked
    query. Misses here isolate the coarse-quantizer knobs (centroid
    sample density, nprobe), the knobs `semantic_dedup`'s √N scaling
    note tunes."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = _knn_probe_df(spark, sf_dir)
    bf = similarity.knn_bruteforce(emb, probes, k=5).select(
        "query_id", "neighbor_id"
    )
    ivf = similarity.knn_ivf(emb, probes, k=5).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        bf.join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_true"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
        )
        .select(
            "query_id",
            "n_true",
            "n_hit",
            (F.col("n_hit") / F.col("n_true")).alias("recall"),
        )
    )


SQL_ANN_RECALL_IVF = f"""
WITH n AS ({_DUCK_VEC_N}),
bf_scored AS ({_DUCK_BF_SCORED}),
bf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
    ) AS rank FROM bf_scored
  ) WHERE rank <= 5
),
cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n WHERE vec_id % 40 = 0),
sc AS (
  SELECT n.vec_id, n.e, n.nrm, c.cid,
         list_sum(list_transform(range(1, 65), j -> n.e[j] * c.ce[j]))
           / (n.nrm * c.cnrm) AS ccos
  FROM n CROSS JOIN cent c
),
member AS (
  SELECT vec_id AS neighbor_id, e, nrm, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid)
              AS rn FROM sc
  ) WHERE rn = 1
),
probe_lists AS (
  SELECT vec_id AS query_id, e AS qe, nrm AS qnrm, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid)
              AS rn
    FROM sc WHERE vec_id % 20 = 0
  ) WHERE rn <= 3
),
iscored AS (
  SELECT p.query_id, m.neighbor_id,
         list_sum(list_transform(range(1, 65), j -> p.qe[j] * m.e[j]))
           / (p.qnrm * m.nrm) AS cosine
  FROM probe_lists p JOIN member m USING (cid)
  WHERE p.query_id <> m.neighbor_id
),
ivf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
    ) AS rank FROM iscored
  ) WHERE rank <= 5
)
SELECT bf.query_id, count(*) AS n_true,
       sum(CASE WHEN ivf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_hit,
       sum(CASE WHEN ivf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         / count(*) AS recall
FROM bf LEFT JOIN ivf
  ON bf.query_id = ivf.query_id AND bf.neighbor_id = ivf.neighbor_id
GROUP BY bf.query_id
"""


def q_corpus_drift(spark, sf_dir):
    """Token-distribution drift between the doc_id-parity cohorts —
    integer-exact cross-product divergence, top-20 tokens."""
    return textops.corpus_drift(load_table(spark, sf_dir, "documents"))


SQL_CORPUS_DRIFT = f"""
WITH toks AS (
  SELECT doc_id % 2 = 0 AS in_a,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            t -> t <> '')) AS term
  FROM documents
),
counts AS (
  SELECT term,
         sum(CASE WHEN in_a THEN 1 ELSE 0 END)::BIGINT AS cnt_a,
         sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END)::BIGINT AS cnt_b
  FROM toks GROUP BY term
),
tot AS (SELECT sum(cnt_a)::BIGINT AS na, sum(cnt_b)::BIGINT AS nb FROM counts),
scored AS (
  SELECT term, cnt_a, cnt_b,
         abs(cnt_a * nb - cnt_b * na)::BIGINT AS score
  FROM counts, tot
)
SELECT term, cnt_a, cnt_b, score,
       row_number() OVER (ORDER BY score DESC, term)::BIGINT AS rank
FROM scored ORDER BY score DESC, term LIMIT 20
"""


def q_kmeans_embeddings(spark, sf_dir):
    """Lloyd k-means over the embeddings table (3 unrolled rounds,
    deterministic hash-sampled seeds, two-phase sorted-fold centroid
    means — `operators.kmeans` docstring has the reproducibility
    argument). Output: final (vec_id, cluster, d)."""
    from ..operators import kmeans

    return kmeans.kmeans_assign(load_table(spark, sf_dir, "embeddings"))


# Fold-order-pinned squared L2 over 64-dim double arrays named e / c —
# DuckDB's list_sum(list_transform) folds sequentially, matching Spark's
# F.aggregate(zip_with) bit for bit (operators.kmeans docstring).
_KM_DIST = (
    "list_sum(list_transform(range(1, 65),"
    " j -> (e[j] - c[j]) * (e[j] - c[j])))"
)


def _sql_kmeans_lloyd(
    src: str, k: "int | str", iters: int, salts: int, prefix: str = ""
) -> str:
    """CTE chain ``cent0 .. cent{iters}`` learning ``k`` centroids with
    ``iters`` unrolled Lloyd rounds over CTE ``src`` (columns vec_id, e)
    — the SQL twin of `operators.kmeans.kmeans_centroids`, parametrized
    by source so `kmeans_embeddings` (full corpus) and
    `kmeans_ivf_assign` (deterministic sample) share one generator.
    ``k`` may be an int literal or a SQL expression string (the learned
    family derives √|sample| via a scalar subquery — the twin of
    `kmeans.sqrt_sample_k`). Returned string starts with a comma
    (appends to an open WITH)."""
    h = hash60_sql("vec_id::VARCHAR", "'km'")
    parts = [
        f""",
{prefix}cent0 AS (
  SELECT (rn - 1)::BIGINT AS cluster, e AS c FROM (
    SELECT e, row_number() OVER (ORDER BY {h}, vec_id) AS rn FROM {src}
  ) WHERE rn <= ({k})
)"""
    ]
    for i in range(iters):
        parts.append(
            f""",
{prefix}score{i} AS (
  SELECT vec_id, cluster, {_KM_DIST} AS d FROM {src}, {prefix}cent{i}
),
{prefix}best{i} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
    FROM {prefix}score{i}
  ) WHERE rn = 1
),
{prefix}pe{i} AS (
  SELECT s.vec_id, b.cluster, j.j AS pos, s.e[j.j] AS val
  FROM {src} s JOIN {prefix}best{i} b USING (vec_id)
  CROSS JOIN (SELECT unnest(range(1, 65)) AS j) j
),
{prefix}p1_{i} AS (
  SELECT cluster, pos, vec_id % {salts} AS salt,
         list_sum(list(val ORDER BY vec_id)) AS psum,
         count(*)::BIGINT AS pn
  FROM {prefix}pe{i} GROUP BY 1, 2, 3
),
{prefix}p2_{i} AS (
  SELECT cluster, pos,
         list_sum(list(psum ORDER BY salt)) AS s,
         sum(pn)::BIGINT AS cnt
  FROM {prefix}p1_{i} GROUP BY 1, 2
),
{prefix}cent{i + 1} AS (
  SELECT cluster, list(s / cnt ORDER BY pos) AS c
  FROM {prefix}p2_{i} GROUP BY cluster
)"""
        )
    return "".join(parts)


def _sql_kmeans() -> str:
    from ..operators import kmeans

    k, iters, salts = kmeans.KM_K, kmeans.KM_ITERS, kmeans.KM_SALTS
    return f"""
WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
{_sql_kmeans_lloyd('n', k, iters, salts)}
SELECT vec_id, cluster, d FROM (
  SELECT vec_id, cluster, d,
         row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
  FROM (SELECT vec_id, cluster, {_KM_DIST} AS d FROM n, cent{iters})
) WHERE rn = 1
"""


def q_kmeans_ivf_assign(spark, sf_dir):
    """Two-level quantizer: coarse centroids LEARNED (Lloyd rounds on a
    deterministic 1/4 sample), full-corpus coarse assignment by
    broadcast argmin, fine assignment through the IVF bucketed
    equi-join on the coarse cell — the scale path past k ~ 10^5 where
    the flat centroid broadcast of `kmeans_assign` stops fitting
    (`operators.kmeans.kmeans_ivf_assign`)."""
    from ..operators import kmeans

    return kmeans.kmeans_ivf_assign(load_table(spark, sf_dir, "embeddings"))


def _sql_kmeans_ivf_cells(idx_pred: str = "TRUE") -> str:
    """CTE chain (starts with a comma, appends to an open WITH whose
    ``n`` CTE provides ``vec_id, e`` double arrays) ending in ``cells``
    = ``(vec_id, coarse, fine, d)`` — the SQL twin of
    `operators.kmeans.kmeans_ivf_assign`, shared by the plain
    `kmeans_ivf_assign` oracle and `semantic_dedup_learned`.

    ``idx_pred`` restricts the INDEX-BUILD inputs (the Lloyd sample
    and the fine table) to a sub-corpus while still assigning ALL of
    ``n`` through the result — the twin of building
    `kmeans.ivf_quantizer` from one split and serving the whole frame
    via `ivf_assign_from_index` (`decontaminate_semantic` learns from
    the train side only). The default emits the exact historical
    string, so existing oracles are byte-unchanged."""
    from ..operators import kmeans

    iters, salts = kmeans.KM_ITERS, kmeans.KM_SALTS
    idx = "" if idx_pred == "TRUE" else f" AND ({idx_pred})"
    # sqrt-scaled coarse k derived from the sample -- the twin of
    # kmeans.sqrt_sample_k (isqrt == floor(sqrt) at any testable N).
    k = "(SELECT greatest(2, CAST(floor(sqrt(count(*))) AS BIGINT)) FROM s)"
    smod = kmeans.KM_IVF_SAMPLE_MOD
    fmod = kmeans.KM_IVF_FINE_MOD
    # Same fold-pinned squared L2, field names per join side.
    dist_f = (
        "list_sum(list_transform(range(1, 65),"
        " j -> (a.e[j] - fi.f[j]) * (a.e[j] - fi.f[j])))"
    )
    return f""",
s AS (SELECT vec_id, e FROM n WHERE vec_id % {smod} = 0{idx})
{_sql_kmeans_lloyd('s', k, iters, salts)},
coarse AS (SELECT cluster AS coarse, c FROM cent{iters}),
assigned AS (
  SELECT vec_id, e, coarse FROM (
    SELECT n.vec_id, n.e, coarse.coarse,
           row_number() OVER (
             PARTITION BY n.vec_id ORDER BY {_KM_DIST}, coarse.coarse
           ) AS rn
    FROM n, coarse
  ) WHERE rn = 1
),
fine AS (
  SELECT coarse, vec_id AS fine_id, e AS f
  FROM assigned WHERE vec_id % {fmod} = 0{idx}
),
scored AS (
  SELECT a.vec_id, a.coarse, fi.fine_id,
         CASE WHEN fi.fine_id IS NULL THEN NULL ELSE {dist_f} END AS d
  FROM assigned a LEFT JOIN fine fi ON fi.coarse = a.coarse
),
cells AS (
  SELECT vec_id, coarse, coalesce(fine_id, -1)::BIGINT AS fine, d FROM (
    SELECT vec_id, coarse, fine_id, d,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, fine_id) AS rn
    FROM scored
  ) WHERE rn = 1
)"""


def _sql_kmeans_ivf() -> str:
    return f"""
WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
{_sql_kmeans_ivf_cells()}
SELECT vec_id, coarse, fine, d FROM cells
"""


def q_semantic_dedup_learned(spark, sf_dir):
    """SemDeDup over LEARNED two-level clusters (`similarity.semantic_
    near_duplicates_learned`): Lloyd coarse centroids on a deterministic
    sample, fine cells through the IVF bucketed equi-join, exact cosine
    pairs within each (coarse, fine) cell — the learned-centroid
    upgrade `semantic_dedup`'s docstring defers, as a first-class
    oracle-checked query over the planted near-dup embedding corpus."""
    corpus = derive_near_dup_embeddings(load_table(spark, sf_dir, "embeddings"))
    return similarity.semantic_near_duplicates_learned(corpus, threshold=0.9)


def _sql_semantic_dedup_learned() -> str:
    cos = (
        "list_sum(list_transform(range(1, 65), j -> a.e[j] * b.e[j]))"
        " / (a.nrm * b.nrm)"
    )
    return f"""
WITH emb_nd AS ({_ND_EMB}),
n AS (SELECT vec_id, embedding AS e FROM emb_nd)
{_sql_kmeans_ivf_cells()},
m AS (
  SELECT n.vec_id, n.e,
         sqrt(list_sum(list_transform(n.e, x -> x * x))) AS nrm,
         c.coarse, c.fine
  FROM n JOIN cells c USING (vec_id)
)
SELECT a.vec_id AS a, b.vec_id AS b, a.coarse AS coarse, a.fine AS fine,
       {cos} AS cosine
FROM m a JOIN m b
  ON a.coarse = b.coarse AND a.fine = b.fine AND a.vec_id < b.vec_id
WHERE {cos} >= 0.9
"""


def q_tfidf_topterms(spark, sf_dir):
    return textops.tfidf_top_terms(load_table(spark, sf_dir, "documents"))


SQL_TFIDF_TOPTERMS = f"""
WITH terms AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            t -> t <> '')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
SELECT doc_id, term, tf, df, score, rnk FROM (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         CAST(tf.tf * n.n_docs AS DOUBLE) / dfreq.df AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE) / dfreq.df DESC,
                    tf.term
         )::BIGINT AS rnk
  FROM tf, dfreq, n WHERE tf.term = dfreq.term
) WHERE rnk <= 3
"""


def q_events_quantiles_hist(spark, sf_dir):
    from ..operators.sketches import histogram_quantiles

    return histogram_quantiles(load_table(spark, sf_dir, "events"))


SQL_EVENTS_QUANTILES_HIST = """
WITH ev AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL
),
stats AS (
  SELECT event_type, min(value) AS v_min, max(value) AS v_max,
         count(*)::BIGINT AS n
  FROM ev GROUP BY event_type
),
bucketed AS (
  SELECT ev.event_type, stats.v_min, stats.v_max, stats.n,
         -- width-zero guard, matching the operator (subnormal ranges
         -- underflow (v_max - v_min)/64 to exactly 0.0 with min < max)
         CASE WHEN (stats.v_max - stats.v_min) / 64.0 = 0 THEN 0
              ELSE least(
                floor((ev.value - stats.v_min)
                      / ((stats.v_max - stats.v_min) / 64.0))::BIGINT,
                63)
         END AS bucket
  FROM ev, stats WHERE ev.event_type = stats.event_type
),
counts AS (
  SELECT event_type, v_min, v_max, n, bucket, count(*)::BIGINT AS cnt
  FROM bucketed GROUP BY 1, 2, 3, 4, 5
),
cum AS (
  SELECT *, sum(cnt) OVER (
    PARTITION BY event_type ORDER BY bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS cum
  FROM counts
)
SELECT event_type, min(n) AS n,
       CASE WHEN min(v_max) = min(v_min) THEN min(v_min)
            ELSE min(v_min)
                 + CAST(min(CASE WHEN cum >= (n * 50 + 99) // 100
                                 THEN bucket END) + 1 AS DOUBLE)
                   * ((min(v_max) - min(v_min)) / 64.0)
       END AS est_p50,
       CASE WHEN min(v_max) = min(v_min) THEN min(v_min)
            ELSE min(v_min)
                 + CAST(min(CASE WHEN cum >= (n * 90 + 99) // 100
                                 THEN bucket END) + 1 AS DOUBLE)
                   * ((min(v_max) - min(v_min)) / 64.0)
       END AS est_p90,
       CASE WHEN min(v_max) = min(v_min) THEN min(v_min)
            ELSE min(v_min)
                 + CAST(min(CASE WHEN cum >= (n * 99 + 99) // 100
                                 THEN bucket END) + 1 AS DOUBLE)
                   * ((min(v_max) - min(v_min)) / 64.0)
       END AS est_p99
FROM cum GROUP BY event_type
"""


def q_events_dedup_watermarked(spark, sf_dir):
    from ..streaming.windows import streaming_dedup_watermarked

    return streaming_dedup_watermarked(spark, sf_dir)


SQL_EVENTS_DEDUP_WATERMARKED = """
WITH deliveries AS (
  SELECT event_id, event_type FROM events
  UNION ALL
  SELECT event_id, event_type FROM events WHERE event_id % 7 = 0
)
SELECT event_type, count(DISTINCT event_id) AS n_events
FROM deliveries GROUP BY event_type
"""


# ------------------------------------------------- round-8 pipeline ops

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
    import tempfile

    panel = spark.createDataFrame(
        textops.BM25_PANEL, "query_id bigint, term string"
    )
    docs = load_table(spark, sf_dir, "documents")
    stats, df_rel = textops.bm25_index_stats(
        docs.where("doc_id % 2 = 0"), panel
    )
    d = tempfile.mkdtemp(prefix="bm25_index_")
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
        corpus, pred, threshold=0.9
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
        similarity.semantic_cross_decontaminate(corpus, pred, threshold=0.9)
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
    so the diagnostic measures exactly the production operator. One
    row per panel doc with >= 1 true contaminating pair:
    (b, n_true, n_found, recall)."""
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
        dedup.cross_corpus_near_duplicates(train, ev, threshold=0.5)
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


# ---------------------------------------------------------- round-9 wave

def _docs_sent(spark, sf_dir):
    """The nd corpus rewritten as PUNCTUATED text (`sources.derived.
    derive_sentenced_corpus`) — the testdata carries no sentence
    terminators, so the sentence family derives the structure it
    operates on, deterministically on both engines."""
    from ..sources.derived import derive_sentenced_corpus

    return derive_sentenced_corpus(_docs_nd(spark, sf_dir))


from ..sources.derived import sentenced_sql as _sentenced_sql

# the sentenced nd corpus: CTE body over ``docs_nd0`` (the raw nd docs)
_ND_SENT = (
    f"SELECT doc_id, {_sentenced_sql(_DUCK_WORDS)} AS text FROM docs_nd0"
)


def q_sentence_dedup(spark, sf_dir):
    """C4-style cross-document SENTENCE dedup
    (`textops.sentence_dedup`): sentences whose exact trimmed content
    recurs in >= 2 distinct documents are dropped and every document is
    rebuilt from its surviving sentences in order — the
    sentence-granularity sibling of `boilerplate_removal`'s fixed
    16-token windows (C4 removed repeated three-sentence spans; CCNet
    repeated paragraphs). Runs over the SENTENCED nd corpus
    (`_docs_sent` — the raw testdata has no terminators, which would
    degenerate every doc to one giant sentence); truncation mutants
    share their original's leading sentences, so recurrence is real.
    Linear: digest-keyed document frequency, the drop flag rides into
    one per-doc rebuild aggregation."""
    return textops.sentence_dedup(_docs_sent(spark, sf_dir))


# Sentence regex twin; trim both sides, drop empties. Rebuild joins
# surviving sentences with ' ' in original order.
SQL_SENTENCE_DEDUP = f"""
WITH docs_nd0 AS ({_ND}),
docs_nd AS ({_ND_SENT}),
sp AS (
  SELECT doc_id, sent_id, trim(s[sent_id]) AS stext
  FROM (
    SELECT doc_id, s, unnest(range(1, len(s) + 1)) AS sent_id
    FROM (
      SELECT doc_id,
             regexp_extract_all(text, '{textops.SENTENCE_PATTERN}') AS s
      FROM docs_nd
    )
  )
  WHERE trim(s[sent_id]) <> ''
),
common AS (
  SELECT md5(stext) AS shash FROM sp
  GROUP BY 1 HAVING count(DISTINCT doc_id) >= {textops.SENT_MIN_DOCS}
),
fl AS (
  SELECT sp.doc_id, sp.sent_id, sp.stext,
         (common.shash IS NOT NULL) AS dropped
  FROM sp LEFT JOIN common ON common.shash = md5(sp.stext)
),
rb AS (
  SELECT doc_id,
         count(*)::BIGINT AS n_sentences,
         sum(CASE WHEN dropped THEN 0 ELSE 1 END)::BIGINT
           AS n_kept_sentences,
         string_agg(CASE WHEN dropped THEN NULL ELSE stext END,
                    ' ' ORDER BY sent_id) AS clean_text
  FROM fl GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(rb.n_sentences, 0)::BIGINT AS n_sentences,
       coalesce(rb.n_kept_sentences, 0)::BIGINT AS n_kept_sentences,
       coalesce(rb.clean_text, '') AS clean_text
FROM docs_nd d LEFT JOIN rb USING (doc_id)
"""


def q_sentence_screen(spark, sf_dir):
    """Sentence-boilerplate SCREEN for continuous ingest
    (`textops.sentence_screen`): the indexed split's repeated-sentence
    digest index (sentence DF >= 2 WITHIN the indexed split,
    `textops.sentence_index`) probes incoming documents' sentences
    through one equi-join + one aggregation — the sentence-granularity
    sibling of `boilerplate_screen`, and the exact plan the streaming
    twin runs. Over the SENTENCED nd corpus (`_docs_sent`): the
    indexed split's original+truncation-mutant families share leading
    sentences (DF >= 2 within the split), and cross-split exact copies
    make incoming docs hit the index."""
    docs = _docs_sent(spark, sf_dir)
    split = F.expr(BLOOM_SPLIT_SPARK)
    idx = textops.sentence_index(docs.where(split == 0))
    return textops.sentence_screen(docs.where(split == 1), idx)


def q_sentence_screen_streaming(spark, sf_dir):
    """`streaming.windows.streaming_sentence_screen`: the identical
    sentence screen with the incoming split arriving on a file stream —
    stateless sentence explode, stream-static index join, one
    aggregation. Shares the batch oracle by the registry twin guard."""
    from ..streaming.windows import streaming_sentence_screen

    return streaming_sentence_screen(spark, sf_dir)


def _sql_sentence_screen() -> str:
    spans = f"""
  SELECT doc_id, trim(s[sent_id]) AS stext,
         len(list_filter(regexp_split_to_array(trim(s[sent_id]), '\\s+'),
                         t -> t <> ''))::BIGINT AS stok
  FROM (
    SELECT doc_id, s, unnest(range(1, len(s) + 1)) AS sent_id
    FROM (
      SELECT doc_id,
             regexp_extract_all(text, '{textops.SENTENCE_PATTERN}') AS s
      FROM docs_nd WHERE {{split}}
    )
  )
  WHERE trim(s[sent_id]) <> ''"""
    return f"""
WITH docs_nd0 AS ({_ND}),
docs_nd AS ({_ND_SENT}),
isp AS ({spans.format(split=f"{BLOOM_SPLIT_DUCK} = 0")}),
idx AS (
  SELECT md5(stext) AS shash FROM isp
  GROUP BY 1 HAVING count(DISTINCT doc_id) >= {textops.SENT_MIN_DOCS}
),
osp AS ({spans.format(split=f"{BLOOM_SPLIT_DUCK} = 1")})
SELECT osp.doc_id,
       count(*)::BIGINT AS n_sentences,
       sum(CASE WHEN idx.shash IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_boiler_sentences,
       sum(osp.stok)::BIGINT AS n_tokens,
       sum(CASE WHEN idx.shash IS NOT NULL THEN osp.stok ELSE 0 END)::BIGINT
         AS n_boiler_tokens
FROM osp LEFT JOIN idx ON idx.shash = md5(osp.stext)
GROUP BY osp.doc_id
"""


def q_quality_classifier(spark, sf_dir):
    """Deterministic hashed LINEAR quality scorer
    (`textops.quality_classifier`) — the bit-reproducible stand-in for
    a fastText-style model-scored quality filter: per-token integer
    weight `hash60(lower(tok)) % 2001 - 1000`, per-doc exact bigint
    sum folded IN THE ROW (zero shuffles), one final IEEE division.
    Scores the odd-doc_id half so the streaming twin (which scores at
    ingest) answers the identical question."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.quality_classifier(docs.where("doc_id % 2 = 1"))


def q_quality_classifier_streaming(spark, sf_dir):
    """`streaming.windows.streaming_quality_classifier`: the identical
    per-row fold on a file stream — append mode, NO state, no
    aggregation (the reason the scorer is an in-row fold). One oracle
    by the registry twin guard."""
    from ..streaming.windows import streaming_quality_classifier

    return streaming_quality_classifier(spark, sf_dir)


def _sql_quality_classifier() -> str:
    w = f"({hash60_sql('t', chr(39) + 'qcw' + chr(39))}) % {textops.QC_WEIGHT_MOD} - 1000"
    return f"""
WITH d AS (
  SELECT doc_id, {_DUCK_WORDS.replace('text', 'lower(text)')} AS ws
  FROM documents WHERE doc_id % 2 = 1
),
s AS (
  SELECT doc_id, len(ws)::BIGINT AS n_tokens,
         coalesce(list_sum(list_transform(ws, t -> {w})), 0)::BIGINT
           AS score_sum
  FROM d
)
SELECT doc_id, n_tokens, score_sum,
       CASE WHEN n_tokens > 0 THEN score_sum / n_tokens ELSE 0.0 END
         AS quality_lr
FROM s
"""


def q_image_near_dup(spark, sf_dir):
    """Near-duplicate IMAGE pairs end to end
    (`multimodal.image_near_duplicates`): payload bytes → pure-numpy
    PPM decode → 8×8 perceptual average hash → BANDED Hamming join
    (8 bands × 8 bits, pigeonhole-exact at the ≤ 6-bit threshold) —
    the full pipeline the reference's PDQ workload assumes happened
    upstream (it consumes precomputed perceptual hashes; reference
    ``pdq_dup_detection.py`` starts at hex strings), run here from
    image bytes in one query over the nd corpus's mutant frames."""
    return multimodal.image_near_duplicates(
        _ppm_media(_docs_nd(spark, sf_dir))
    )


# Reuses the char-indexed ahash oracle (same ASCII assertion), then
# pairs by banded candidate generation + exact char-wise Hamming.
SQL_IMAGE_NEAR_DUP = f"""
WITH docs_nd AS ({_ND}),
b AS (
  SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = len(text)
              THEN rpad(substr(text, 1, 192), 192, ' ')
              ELSE error('SQL_IMAGE_NEAR_DUP: non-ASCII text (doc_id '
                         || doc_id || '); char-indexed oracle diverges '
                         || 'from the byte-decoding operator')
         END AS raster
  FROM docs_nd
),
px AS (
  SELECT doc_id, i,
         (ascii(substr(raster, 3 * i + 1, 1))
          + ascii(substr(raster, 3 * i + 2, 1))
          + ascii(substr(raster, 3 * i + 3, 1))) // 3 AS gray
  FROM b CROSS JOIN (SELECT unnest(range(0, 64)) AS i) g
),
tot AS (SELECT doc_id, sum(gray)::BIGINT AS sg FROM px GROUP BY doc_id),
ah AS (
  SELECT px.doc_id,
         string_agg(CASE WHEN gray * 64 > sg THEN '1' ELSE '0' END,
                    '' ORDER BY i) AS bits
  FROM px JOIN tot ON tot.doc_id = px.doc_id
  GROUP BY px.doc_id
),
bands AS (
  SELECT doc_id, k AS band_id, substr(bits, k * 8 + 1, 8) AS band_key,
         bits
  FROM ah CROSS JOIN (SELECT unnest(range(0, 8)) AS k) kk
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.bits AS ba, y.bits AS bb
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_key = y.band_key
   AND x.doc_id < y.doc_id
),
scored AS (
  SELECT a, b,
         list_sum(list_transform(range(1, 65),
           i -> CASE WHEN substr(ba, i, 1) <> substr(bb, i, 1)
                     THEN 1 ELSE 0 END))::BIGINT AS hamming
  FROM cand
)
SELECT a, b, hamming FROM scored
WHERE hamming <= {multimodal.IMG_HAMMING_MAX}
"""


def q_lsh_index_merge(spark, sf_dir):
    """LSH index COMPACTION for continuous ingest: two crawl waves of
    the indexed split are indexed SEPARATELY (`dedup.lsh_band_index`
    per wave — what a fleet produces when admission jobs can't wait
    for a global rebuild) and merged by union + distinct; the incoming
    split screens against the merged relation. Because band keys are
    per-document and deterministic, distinct-of-union equals
    index-of-union, so the output is IDENTICAL to `dedup_lsh_screen`
    (one oracle string by the registry twin guard) — merging persisted
    index shards is a metadata operation, never a corpus recompute."""
    docs = _docs_nd(spark, sf_dir)
    split = F.expr(_BLOOM_SPLIT_SPARK)
    indexed = docs.where(split == 0)
    i1 = dedup.lsh_band_index(indexed.where("doc_id % 2 = 0"))
    i2 = dedup.lsh_band_index(indexed.where("doc_id % 2 = 1"))
    merged = i1.unionAll(i2).dropDuplicates(["band_id", "band_key"])
    return dedup.lsh_screen_from_index(
        merged, docs.where(split == 1), index_is_distinct=True
    )


def q_events_anomaly(spark, sf_dir):
    """Per-type event-rate anomaly windows (`events.rate_anomalies`):
    hourly counts per type flagged beyond two standard deviations,
    with the two-sigma rule evaluated in EXACT integer arithmetic
    ((cnt·n − Σ)² > 4·(n·Σsq − Σ²) — both sides of the float rule
    multiplied by n²) so the flag cannot wobble on rounding. One
    count shuffle + one #types-row stats broadcast."""
    return events.rate_anomalies(load_table(spark, sf_dir, "events"))


SQL_EVENTS_ANOMALY = f"""
WITH c AS (
  SELECT event_type,
         (epoch_us(ts) // {events.HOUR_US}) * {events.HOUR_US}
           AS window_start_us,
         count(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, count(*)::BIGINT AS n_windows,
         sum(n_events)::BIGINT AS sum_cnt,
         sum(n_events * n_events)::BIGINT AS sum_sq
  FROM c GROUP BY 1
)
SELECT c.event_type, c.window_start_us, c.n_events, s.n_windows, s.sum_cnt,
       ((c.n_events * s.n_windows - s.sum_cnt)
        * (c.n_events * s.n_windows - s.sum_cnt))::BIGINT AS dev_sq,
       (4 * (s.n_windows * s.sum_sq - s.sum_cnt * s.sum_cnt))::BIGINT
         AS var4
FROM c JOIN s USING (event_type)
WHERE (c.n_events * s.n_windows - s.sum_cnt)
      * (c.n_events * s.n_windows - s.sum_cnt)
      > 4 * (s.n_windows * s.sum_sq - s.sum_cnt * s.sum_cnt)
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
    registered operators, no new machinery."""
    docs = _docs_nd(spark, sf_dir)
    pred = F.col("doc_id") % _FUZZY_EVAL_MOD == _FUZZY_EVAL_REM
    train, ev = docs.where(~pred), docs.where(pred)
    ex = textops.decontaminate(train, ev).select(
        "doc_id", "n_shared_grams"
    )
    fz = (
        dedup.cross_corpus_near_duplicates(train, ev, threshold=0.5)
        .select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("fz", F.lit(True))
    )
    sc = textops.decontaminate_scrub(train, ev)
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


def q_corpus_bucketed_join(spark, sf_dir):
    """Bucketed-table join elimination — the 100 TB posture for every
    REPEATEDLY-joined relation (`sources.sinks.write_bucketed`): the
    documents projection and the per-doc shingle statistics are both
    written as parquet tables hash-bucketed (and sorted) by doc_id, so
    the doc_id join between them reads co-located buckets and runs with
    ZERO exchanges — the shuffle is paid once at write time instead of
    once per downstream join (`tests/test_plans.py::
    test_corpus_bucketed_join_is_shuffle_free` pins the executed plan).
    Output one row per document: (doc_id, text_len, n_shingles). The
    oracle computes the same statistics straight from the parquet view
    — bucketing is a physical layout, never a semantic change."""
    import os
    import tempfile

    from ..sources import sinks

    docs = load_table(spark, sf_dir, "documents")
    left = docs.select(
        "doc_id", F.length("text").cast("bigint").alias("text_len")
    )
    right = dedup.hashed_shingle_arrays(docs).select(
        "doc_id", F.size("hs").cast("bigint").alias("n_shingles")
    )
    # Per-invocation staging (ADVICE r9): a tag keyed only on sf_dir
    # made two concurrent runs (parallel bench + correctness drivers)
    # race on DROP TABLE/CTAS over one location and read each other's
    # half-written buckets. mkdtemp gives each invocation its own
    # directory (the lsh/ivf/bm25 index round-trip idiom), and the
    # dir's unique suffix salts the catalog table names the same way.
    stage = tempfile.mkdtemp(prefix="corpus_bucketed_")
    tag = os.path.basename(stage).removeprefix("corpus_bucketed_")
    tables = {f"corpus_docs_bkt_{tag}": left,
              f"corpus_shingles_bkt_{tag}": right}
    for name, df in tables.items():
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        sinks.write_bucketed(
            df, name, f"{stage}/{name}", ("doc_id",), 16,
            sort_cols=("doc_id",),
        )
    l, r = (sinks.read_table(spark, n) for n in tables)
    return l.join(r, "doc_id").select("doc_id", "text_len", "n_shingles")


SQL_CORPUS_BUCKETED_JOIN = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id, unnest({_DUCK_SHINGLES}) AS sh FROM documents
  )
),
stats AS (SELECT doc_id, count(*)::BIGINT AS n_shingles FROM sh GROUP BY 1)
SELECT d.doc_id, len(d.text)::BIGINT AS text_len, s.n_shingles
FROM documents d JOIN stats s USING (doc_id)
"""


EXTENSION_QUERIES: dict[str, tuple] = {
    "corpus_bucketed_join": (q_corpus_bucketed_join, SQL_CORPUS_BUCKETED_JOIN),
    "sentence_dedup": (q_sentence_dedup, SQL_SENTENCE_DEDUP),
    "quality_classifier": (q_quality_classifier, _sql_quality_classifier()),
    "quality_classifier_streaming": (
        q_quality_classifier_streaming,
        _sql_quality_classifier(),
    ),
    "image_near_dup": (q_image_near_dup, SQL_IMAGE_NEAR_DUP),
    "lsh_index_merge": (q_lsh_index_merge, SQL_DEDUP_LSH_SCREEN),
    "events_anomaly": (q_events_anomaly, SQL_EVENTS_ANOMALY),
    "sentence_screen": (q_sentence_screen, _sql_sentence_screen()),
    "sentence_screen_streaming": (
        q_sentence_screen_streaming,
        _sql_sentence_screen(),
    ),
    "decontamination_report": (
        q_decontamination_report,
        _sql_decontamination_report(),
    ),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_exact_normalized": (
        q_dedup_exact_normalized,
        SQL_DEDUP_EXACT_NORMALIZED,
    ),
    "dedup_exact_streaming": (
        q_dedup_exact_streaming,
        SQL_DEDUP_EXACT_STREAMING,
    ),
    "url_domain_stats": (q_url_domain_stats, _sql_url_domain_stats()),
    "doc_chunks": (q_doc_chunks, _sql_doc_chunks()),
    "docs_jsonl_roundtrip": (q_docs_jsonl_roundtrip, SQL_DOCS_JSONL_ROUNDTRIP),
    "dedup_minhash": (q_dedup_minhash, SQL_DEDUP_MINHASH),
    "dup_clusters": (q_dup_clusters, SQL_DUP_CLUSTERS),
    "cluster_representatives": (
        q_cluster_representatives,
        _sql_cluster_representatives(),
    ),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, SQL_DEDUP_NGRAM_JACCARD),
    "doc_topk_similar": (q_doc_topk_similar, SQL_DOC_TOPK_SIMILAR),
    "dedup_simhash": (q_dedup_simhash, SQL_DEDUP_SIMHASH),
    "dedup_simhash_pairs": (q_dedup_simhash_pairs, SQL_DEDUP_SIMHASH_PAIRS),
    "dedup_containment": (q_dedup_containment, SQL_DEDUP_CONTAINMENT),
    "dedup_containment_canonical": (
        q_dedup_containment_canonical,
        SQL_DEDUP_CONTAINMENT_CANONICAL,
    ),
    "knn_cosine_bruteforce": (q_knn_bruteforce, SQL_KNN_BRUTEFORCE),
    "knn_cosine_lsh": (q_knn_lsh, SQL_KNN_LSH),
    "knn_cosine_ivf": (q_knn_ivf, SQL_KNN_IVF),
    "knn_cosine_ivf_learned": (q_knn_ivf_learned, _sql_knn_ivf_learned()),
    "knn_pq_adc": (q_knn_pq_adc, _sql_knn_pq_adc()),
    "knn_ivf_pq": (q_knn_ivf_pq, _sql_knn_ivf_pq()),
    "knn_ivf_pq_refined": (q_knn_ivf_pq_refined, _sql_knn_ivf_pq_refined()),
    "pq_recall": (q_pq_recall, _sql_pq_recall()),
    "ann_recall_lsh": (q_ann_recall_lsh, SQL_ANN_RECALL_LSH),
    "embedding_near_dup": (q_embedding_near_dup, SQL_EMBEDDING_NEAR_DUP),
    "text_quality": (q_text_quality, SQL_TEXT_QUALITY),
    "token_count": (q_token_count, SQL_TOKEN_COUNT),
    "lang_id": (q_lang_id, SQL_LANG_ID),
    "doc_fingerprint": (q_doc_fingerprint, SQL_DOC_FINGERPRINT),
    "substring_dup": (q_substring_dup, SQL_SUBSTRING_DUP),
    "corpus_curation": (q_curate_corpus, _sql_curate_corpus()),
    "pii_redact": (q_pii_redact, _sql_pii_redact()),
    "ngram_topk": (q_ngram_topk, SQL_NGRAM_TOPK),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "dedup_incremental": (q_dedup_incremental, SQL_DEDUP_INCREMENTAL),
    "multimodal_features": (q_multimodal_features, SQL_MULTIMODAL_FEATURES),
    "multimodal_frames": (q_multimodal_frames, SQL_MULTIMODAL_FRAMES),
    "multimodal_resize": (q_multimodal_resize, SQL_MULTIMODAL_RESIZE),
    "multimodal_audio": (q_multimodal_audio, SQL_MULTIMODAL_AUDIO),
    "multimodal_image_ahash": (
        q_multimodal_image_ahash,
        SQL_MULTIMODAL_IMAGE_AHASH,
    ),
    "events_window": (q_events_window, SQL_EVENTS_WINDOW),
    "events_window_streaming": (q_events_window_streaming, SQL_EVENTS_WINDOW),
    "events_sessionize": (q_events_sessionize, SQL_EVENTS_SESSIONIZE),
    "events_sessionize_stateful": (
        q_events_sessionize_stateful,
        SQL_EVENTS_SESSIONIZE,
    ),
    "events_asof": (q_events_asof, SQL_EVENTS_ASOF),
    "events_json": (q_events_json, SQL_EVENTS_JSON),
    "events_funnel": (q_events_funnel, SQL_EVENTS_FUNNEL),
    "tpch_q1": (q_tpch_q1, SQL_TPCH_Q1),
    "tpch_q3": (q_tpch_q3, SQL_TPCH_Q3),
    "tpch_q5": (q_tpch_q5, SQL_TPCH_Q5),
    "tpch_q5_skewed": (q_tpch_q5_skewed, SQL_TPCH_Q5),
    "tpch_q6": (q_tpch_q6, SQL_TPCH_Q6),
    "tpch_q18": (q_tpch_q18, SQL_TPCH_Q18),
    "tpch_q10": (q_tpch_q10, SQL_TPCH_Q10),
    "tpch_q13": (q_tpch_q13, SQL_TPCH_Q13),
    "tpch_q14": (q_tpch_q14, SQL_TPCH_Q14),
    "tpch_q22_like": (q_tpch_q22_like, SQL_TPCH_Q22_LIKE),
    "tpch_q4_like": (q_tpch_q4_like, SQL_TPCH_Q4_LIKE),
    "tpch_q7_like": (q_tpch_q7_like, SQL_TPCH_Q7_LIKE),
    "tpch_q8_like": (q_tpch_q8_like, SQL_TPCH_Q8_LIKE),
    "tpch_q12_like": (q_tpch_q12_like, SQL_TPCH_Q12_LIKE),
    "tpch_q17_like": (q_tpch_q17_like, SQL_TPCH_Q17_LIKE),
    "tpch_q19_like": (q_tpch_q19_like, SQL_TPCH_Q19_LIKE),
    "tpch_q21_like": (q_tpch_q21_like, SQL_TPCH_Q21_LIKE),
    "tpch_q2_like": (q_tpch_q2_like, SQL_TPCH_Q2_LIKE),
    "tpch_q9_like": (q_tpch_q9_like, SQL_TPCH_Q9_LIKE),
    "tpch_q11_like": (q_tpch_q11_like, SQL_TPCH_Q11_LIKE),
    "tpch_q15_like": (q_tpch_q15_like, SQL_TPCH_Q15_LIKE),
    "tpch_q16_like": (q_tpch_q16_like, SQL_TPCH_Q16_LIKE),
    "tpch_q20_like": (q_tpch_q20_like, SQL_TPCH_Q20_LIKE),
    "events_distinct_users": (q_events_distinct_users, SQL_EVENTS_DISTINCT_USERS),
    "events_distinct_users_streaming": (
        q_events_distinct_users_streaming,
        SQL_EVENTS_DISTINCT_USERS_STREAMING,
    ),
    "events_quantiles": (q_events_quantiles, SQL_EVENTS_QUANTILES),
    "doc_repetition": (q_doc_repetition, SQL_DOC_REPETITION),
    "pack_sequences": (q_pack_sequences, _sql_pack_sequences()),
    "chunk_dedup": (q_chunk_dedup, _sql_chunk_dedup()),
    "token_budget_sample": (q_token_budget_sample, _sql_token_budget_sample()),
    "quality_band": (q_quality_band, _sql_quality_band()),
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
    "curation_pipeline": (q_curation_pipeline, _sql_curation_pipeline()),
    "semantic_dedup": (q_semantic_dedup, SQL_SEMANTIC_DEDUP),
    "distinct_kmv": (q_distinct_kmv, SQL_DISTINCT_KMV),
    "bloom_dedup": (q_bloom_dedup, SQL_BLOOM_DEDUP),
    "bloom_dedup_streaming": (q_bloom_dedup_streaming, SQL_BLOOM_DEDUP),
    "dedup_lsh_screen": (q_dedup_lsh_screen, SQL_DEDUP_LSH_SCREEN),
    "dedup_lsh_screen_streaming": (
        q_dedup_lsh_screen_streaming,
        SQL_DEDUP_LSH_SCREEN,
    ),
    "lsh_index_roundtrip": (q_lsh_index_roundtrip, SQL_DEDUP_LSH_SCREEN),
    "dup_overlap": (q_dup_overlap, _sql_dup_overlap()),
    "rollup_orders": (q_rollup_orders, SQL_ROLLUP_ORDERS),
    "corpus_stats_cube": (q_corpus_stats_cube, SQL_CORPUS_STATS_CUBE),
    "window_topn": (q_window_topn, SQL_WINDOW_TOPN),
    "bigram_novelty": (q_bigram_novelty, SQL_BIGRAM_NOVELTY),
    "domain_mixture": (q_domain_mixture, SQL_DOMAIN_MIXTURE),
    "shard_assign": (q_shard_assign, _sql_shard_assign()),
    "events_attribution": (q_events_attribution, SQL_EVENTS_ATTRIBUTION),
    "events_attribution_streaming": (
        q_events_attribution_streaming,
        SQL_EVENTS_ATTRIBUTION,
    ),
    "cms_heavy_hitters": (q_cms_heavy_hitters, SQL_CMS_HEAVY_HITTERS),
    "tfidf_topterms": (q_tfidf_topterms, SQL_TFIDF_TOPTERMS),
    "bm25_search": (q_bm25_search, _sql_bm25_search()),
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
    "events_quantiles_hist": (
        q_events_quantiles_hist,
        SQL_EVENTS_QUANTILES_HIST,
    ),
    "events_dedup_watermarked": (
        q_events_dedup_watermarked,
        SQL_EVENTS_DEDUP_WATERMARKED,
    ),
    "dataset_split": (q_dataset_split, _sql_dataset_split()),
    "dup_weighting": (q_dup_weighting, _sql_dup_weighting()),
    "docs_csv_roundtrip": (q_docs_csv_roundtrip, SQL_DOCS_CSV_ROUNDTRIP),
    "docs_orc_roundtrip": (q_docs_orc_roundtrip, SQL_DOCS_ORC_ROUNDTRIP),
    "kmeans_embeddings": (q_kmeans_embeddings, _sql_kmeans()),
    "kmeans_ivf_assign": (q_kmeans_ivf_assign, _sql_kmeans_ivf()),
    "semantic_recall_learned": (
        q_semantic_recall_learned,
        _sql_semantic_recall_learned(),
    ),
    "semantic_dedup_learned": (
        q_semantic_dedup_learned,
        _sql_semantic_dedup_learned(),
    ),
    "corpus_drift": (q_corpus_drift, SQL_CORPUS_DRIFT),
    "events_rolling": (q_events_rolling, SQL_EVENTS_ROLLING),
    "corpus_upsert": (q_corpus_upsert, SQL_CORPUS_UPSERT),
    "events_retention": (q_events_retention, SQL_EVENTS_RETENTION),
    "corpus_upsert_streaming": (q_corpus_upsert_streaming, SQL_CORPUS_UPSERT),
    "ivf_upsert_assign": (q_ivf_upsert_assign, _sql_ivf_upsert_assign()),
    "ivf_upsert_assign_streaming": (
        q_ivf_upsert_assign_streaming,
        _sql_ivf_upsert_assign(),
    ),
    "ivf_upsert_drift": (q_ivf_upsert_drift, _sql_ivf_upsert_drift()),
    "ivf_index_roundtrip": (q_ivf_index_roundtrip, _sql_ivf_upsert_assign()),
    "pq_codes_upsert": (q_pq_codes_upsert, _sql_pq_codes_upsert()),
    "pq_codes_upsert_streaming": (
        q_pq_codes_upsert_streaming,
        _sql_pq_codes_upsert(),
    ),
    "minhash_recall": (q_minhash_recall, SQL_MINHASH_RECALL),
    "events_pivot": (q_events_pivot, SQL_EVENTS_PIVOT),
    "ann_recall_ivf": (q_ann_recall_ivf, SQL_ANN_RECALL_IVF),
}
