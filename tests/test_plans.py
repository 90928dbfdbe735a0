"""Physical-plan regression tests: the scale-critical plan shapes from
SCALE.md, asserted so a refactor cannot silently regress them."""

from __future__ import annotations

from cir_duplicate_detector_spark.plans import ALL_QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    fn, _ = ALL_QUERIES[name]
    return ALL_QUERIES[name][0](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_tpch_q5_pushdown_and_broadcast(spark):
    plan = _plan(spark, "tpch_q5")
    # Dimension filter reaches the parquet scan.
    assert "EqualTo(r_name,ASIA)" in plan
    # Date range pushed to the orders scan.
    assert "GreaterThanOrEqual(o_orderdate" in plan
    # All five dimension joins broadcast; only the final agg shuffles.
    assert plan.count("BroadcastHashJoin") >= 5
    assert plan.count("Exchange hashpartitioning") <= 1
    # Column pruning: lineitem scan must not read l_comment-sized width.
    assert "ReadSchema: struct<l_orderkey:bigint,l_suppkey:bigint" in plan


def test_pdq_probed_broadcasts_probe_side(spark):
    plan = _plan(spark, "pdq_duplicates_probed")
    # Probe-set pushdown: the restricted probe side is broadcast and the
    # corpus streams (reference P9's asymmetric shape).
    assert "BroadcastNestedLoopJoin" in plan


def test_pdq_naive_self_join_never_broadcasts_corpus(spark):
    # The no-probe naive scan must distribute as a block-grid join. With
    # auto-broadcast off (emulating a corpus whose stats exceed the
    # threshold — the 100 TB case), the plan must be a shuffle equi-join
    # on the block key: no broadcast of either side, no cartesian
    # product. (At small sizes Catalyst MAY broadcast the grid side —
    # that is a size-based optimizer choice, not a plan-shape hint.)
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "pdq_duplicates_naive")
        assert "BroadcastExchange" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_grid_join_covers_all_pairs(spark):
    from pyspark.sql import functions as F

    from cir_duplicate_detector_spark.operators.pdq import _grid_joined

    p = spark.range(37).select(F.col("id").cast("string").alias("p_index"))
    c = spark.range(41).select(F.col("id").cast("string").alias("c_index"))
    got = _grid_joined(p, c, 4)
    # Every (probe, corpus) pair exactly once — the BNL contract.
    assert got.count() == 37 * 41
    assert got.distinct().count() == 37 * 41


def test_pdq_banded_is_equijoin(spark):
    plan = _plan(spark, "pdq_duplicates_banded")
    # The banded candidate join must be hash-partitioned (scale-out),
    # never a nested-loop cross join.
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_simhash_pairs_is_equijoin(spark):
    plan = _plan(spark, "dedup_simhash_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_substring_dup_is_equijoin(spark):
    plan = _plan(spark, "substring_dup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_corpus_curation_single_shuffle(spark):
    # One scan + the canonical-group window: exactly one exchange
    # (ignoring the explicit derived-corpus widening repartition).
    plan = _plan(spark, "corpus_curation")
    assert plan.count("Exchange hashpartitioning") == 1


def test_minhash_signatures_shuffle_free(spark):
    from cir_duplicate_detector_spark.operators import dedup
    from cir_duplicate_detector_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").selectExpr(
        "doc_id", "text"
    )
    sigs = dedup.minhash_signatures(dedup.hashed_shingle_arrays(docs))
    plan = sigs._jdf.queryExecution().executedPlan().toString()
    # Per-row signature construction: no exchange anywhere in the plan.
    assert "Exchange" not in plan


def test_incremental_dedup_anti_joins_scale_shape(spark):
    # The two screens (exact digest, fingerprint overlap) must stay
    # anti-joins, and with auto-broadcast off (emulating corpus stats
    # past the threshold — the 100 TB case) neither may broadcast the
    # corpus-derived side: the plan must fall back to shuffle joins, not
    # a nested-loop or cartesian shape (VERDICT r2 item 6).
    from cir_duplicate_detector_spark.operators.dedup import incremental_dedup
    from cir_duplicate_detector_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    corpus = docs.where("doc_id % 2 = 0")
    batch = docs.where("doc_id % 2 = 1")
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            incremental_dedup(corpus, batch)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # >= 2: the exact screen and the near screen. (The exact-screen
        # subtree is evaluated in two branches — the output side and the
        # fingerprint side — so it may appear twice in the plan.)
        assert plan.count("LeftAnti") >= 2
        assert "BroadcastExchange" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_probed_queries_have_no_driver_collect(spark):
    # Registered probe queries ship the probe set as a broadcast
    # semi-join (or a probe-derived broadcast), never a driver-side
    # collect()+isin literal (VERDICT r2 item 3). An InMemoryRelation /
    # LocalTableScan of probe ids in the plan would betray a literal.
    for name in (
        "url_duplicates_probed",
        "pdq_duplicates_probed",
        "pdq_duplicates_t08_probed",
        "knn_cosine_bruteforce",
        "knn_cosine_lsh",
        "knn_cosine_ivf",
    ):
        plan = _plan(spark, name)
        assert "LocalTableScan" not in plan, name
        assert " INSET " not in plan and " IN (" not in plan, name


def test_connected_components_raises_without_convergence(spark):
    import pytest

    from cir_duplicate_detector_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "a bigint, b bigint"
    )
    want = {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}
    labels = {
        r["node"]: r["label"] for r in connected_components(pairs).collect()
    }
    assert labels == want
    # check_every > 1 skips intermediate convergence counts but must
    # produce the identical labeling (extra rounds are no-ops).
    sparse = {
        r["node"]: r["label"]
        for r in connected_components(pairs, check_every=3).collect()
    }
    assert sparse == want
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=0)
    with pytest.raises(ValueError, match="check_every"):
        connected_components(pairs, check_every=0)


def test_doc_chunks_shuffle_free(spark):
    # Chunking is a pure per-row scan (tokenize + posexplode + slices):
    # zero exchanges at any corpus size.
    plan = _plan(spark, "doc_chunks")
    assert "Exchange" not in plan


def test_url_domain_stats_single_agg_shuffle(spark):
    # One grouped aggregate over a scan projection; the count-distinct
    # expands map-side. No joins, <= 2 hash-partition exchanges
    # (partial/final around the expand).
    plan = _plan(spark, "url_domain_stats")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_pq_adc_is_equijoin_with_broadcast_tables(spark):
    # Codebook and ADC partial-distance tables ride as broadcasts; the
    # scoring join is an equi-join on (subspace, code) — never an
    # all-pairs scan of raw vectors.
    plan = _plan(spark, "knn_pq_adc")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastExchange" in plan


def test_knn_ivf_pq_no_allpairs_scan(spark):
    # The composed IVF-ADC query: candidate generation is the coarse-
    # cell EQUI-join, scoring is the (query, subspace, code) equi-join
    # against the broadcast partials table. The only nested-loop joins
    # are the broadcast centroid/codebook scorings (bounded √N / M·K
    # build sides); an unhinted CartesianProduct anywhere means an
    # all-pairs scan leaked in.
    plan = _plan(spark, "knn_ivf_pq")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_doc_fingerprint_shuffle_free_before_explode(spark):
    from cir_duplicate_detector_spark.operators import textops
    from cir_duplicate_detector_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    plan = (
        textops.doc_fingerprint(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_jaccard_verify_broadcast_gate(spark):
    # VERDICT r3 #4: the Jaccard verify force-broadcast is size-gated.
    # Below the gate: candidates ride as broadcasts (zero corpus
    # shuffle). Above it (emulated with broadcast_max_pairs=0 and
    # auto-broadcast off, the 100 TB regime where `with_a` carries an
    # unbounded shingle array per candidate pair): shuffle equi-joins
    # only — no broadcast build to OOM.
    from pyspark.sql import functions as F

    from cir_duplicate_detector_spark.cache import materialize
    from cir_duplicate_detector_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    hashed = dedup.hashed_shingle_arrays(docs)
    cands = materialize(
        dedup.lsh_candidates(dedup.minhash_signatures(hashed))
    )
    n = cands.count()
    assert n > 0

    small = dedup.jaccard_pairs(hashed, cands, 0.5, candidate_count=n)
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_small

    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        big = dedup.jaccard_pairs(
            hashed, cands, 0.5, candidate_count=n, broadcast_max_pairs=0
        )
        plan_big = big._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan_big
        assert "SortMergeJoin" in plan_big or "ShuffledHashJoin" in plan_big
        # Both regimes must agree on the answer, not just the shape.
        key = lambda r: (r["a"], r["b"])  # noqa: E731
        assert sorted(map(key, big.collect())) == sorted(
            map(key, small.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_bloom_bitset_is_broadcast_and_bounded(spark):
    # The Bloom screen's whole point at 100 TB: the bitset side of the
    # bit join must be a BROADCAST (<= m rows by construction), so the
    # incoming batch is screened map-side — never a shuffle of the
    # incoming stream keyed on bit.
    from pyspark.sql import functions as F

    from cir_duplicate_detector_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    out = dedup.bloom_filter_dedup(
        docs.where("doc_id % 2 = 0"), docs.where("doc_id % 2 = 1")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # BOTH static joins broadcast: the bitset (on bit) AND the
    # ground-truth key set — asserting >= 2 so dropping the bitset
    # broadcast (the screen's whole point) cannot hide behind the other.
    assert plan.count("BroadcastHashJoin") >= 2
    # Bitset cardinality is bounded by m regardless of corpus size.
    bits = docs.select(
        F.explode(dedup.bloom_bit_positions(F.md5("text"), m=64)).alias("b")
    ).distinct()
    assert bits.count() <= 64


def test_decontaminate_is_equijoin(spark):
    # The gram match must be an equi-join on the hash (shuffle or
    # AQE-broadcast), never a nested-loop/cartesian product.
    plan = _plan(spark, "decontaminate")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_pairs_cluster_local(spark):
    # Centroids broadcast; the pair join is an equi-join on cid (the
    # cluster-local shape) — no all-pairs cross join outside the
    # bounded centroid assignment.
    plan = _plan(spark, "semantic_dedup")
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # centroid assign only
    assert "CartesianProduct" not in plan


def test_kmv_bottom_k_bounded_output(spark):
    # The sketch keeps <= k rows per group no matter the input size.
    from pyspark.sql import functions as F

    from cir_duplicate_detector_spark.operators import sketches

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = sketches.kmv_distinct_tokens(docs, k=16)
    rows = out.collect()
    assert all(r.n_kept <= 16 for r in rows)
    # And exactly one output row per group.
    assert out.groupBy("lang").count().where("count > 1").count() == 0


def test_chunk_dedup_digest_keyed_shuffles_only(spark):
    # Chunking is a pure scan; the dedup aggregation shuffles exactly
    # twice — the two-phase count-distinct: once on (chunk_hash,
    # doc_id) to dedup occurrences, once on chunk_hash for the final
    # counts. BOTH exchanges are keyed on the 128-bit digest (never the
    # text), which is the property that keeps the shuffle payload
    # ~48 bytes/chunk at any corpus size.
    from cir_duplicate_detector_spark.operators import textops

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        textops.chunk_dedup(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(exchanges) == 2
    assert all("chunk_hash" in l for l in exchanges)


def test_tpch_q5_skewed_salts_the_fact_join(spark):
    # The skewed variant must actually scatter: the salt column appears
    # in a join's keys (okey + __salt__), and the result still carries
    # no salt column (dropped before the agg).
    plan = _plan(spark, "tpch_q5_skewed")
    assert "__salt__" in plan
    fn, _ = ALL_QUERIES["tpch_q5_skewed"]
    assert "__salt__" not in fn(spark, SF).columns


def test_semantic_dedup_centroid_mod_is_corpus_scaled(spark):
    # The centroid sampling modulus must track the corpus (~sqrt(N)),
    # not a fixed literal: a fixed mod admits N/mod centroids and the
    # broadcast scoring pass degrades to O(N^2/mod) (round-4 verdict's
    # one `weak`). The sqrt-scaled literal must appear in the executed
    # plan, and the centroid count it induces must sit at ~sqrt(N).
    import math

    from cir_duplicate_detector_spark.operators.similarity import (
        sqrt_centroid_mod,
    )
    from cir_duplicate_detector_spark.sources.derived import (
        derive_near_dup_embeddings,
    )

    emb = derive_near_dup_embeddings(
        spark.read.parquet(f"{SF}/embeddings.parquet")
    )
    n = emb.count()
    mod = sqrt_centroid_mod(emb)
    assert mod == max(2, math.isqrt(n))
    n_cents = emb.where(f"vec_id % {mod} = 0").count()
    root = math.isqrt(n)
    assert root // 2 <= n_cents <= 3 * root
    # The final executed plan starts from the materialized member
    # assignment (lineage cut), so pin the modulus on the scoring
    # subplan and on the API default instead.
    import inspect

    from cir_duplicate_detector_spark.operators import similarity

    sig = inspect.signature(similarity.semantic_near_duplicates)
    assert sig.parameters["centroid_mod"].default is None
    splan = (
        similarity._centroid_scores(emb, mod)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert f"% {mod})" in splan
    assert "% 40)" not in splan


def test_composed_dag_builds_with_zero_jobs(spark):
    # README "Composing in larger DAGs": with every documented bypass
    # applied, building a composed plan over the flagship operators must
    # submit ZERO Spark jobs — construction stays pure and the whole
    # DAG executes at the terminal action. Job submissions from this
    # thread are tagged with a job group; any eager probe would land in
    # it and fail the assertion.
    from pyspark.sql import functions as F

    import cir_duplicate_detector_spark as cds
    from cir_duplicate_detector_spark.operators import dedup
    from cir_duplicate_detector_spark.sources.entries import derive_entries

    sc = spark.sparkContext
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    entries = derive_entries(docs)

    sc.setJobGroup("plan-build-purity", "composed DAG construction")
    try:
        detected = cds.detect_duplicates(
            entries,
            pqd_hash_similarity_threshold=0.9,
            pdq_duplicate_detection_method="banded",
            validate=False,
            max_hex_len=64,
        )
        hashed = dedup.hashed_shingle_arrays(docs.select("doc_id", "text"))
        cands = dedup.lsh_candidates(dedup.minhash_signatures(hashed))
        near = dedup.jaccard_pairs(
            hashed, cands, 0.5, candidate_count=10_000
        )
        composed = detected.join(
            near.select(
                F.concat(F.lit("UW"), F.lpad(F.col("a").cast("string"), 8, "0"))
                .alias("index")
            ),
            "index",
            "left",
        )
        job_ids = sc.statusTracker().getJobIdsForGroup("plan-build-purity")
    finally:
        sc.setJobGroup("", "")
    assert list(job_ids) == [], f"plan build submitted jobs: {job_ids}"
    # The plan is real: it executes (outside the tagged group).
    assert composed.count() > 0


def test_range_join_is_bucketed_equijoin(spark):
    # The interval join must be the bucketed (key, bucket) equi-join —
    # never a per-key nested loop over the BETWEEN predicate.
    plan = _plan(spark, "events_attribution")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pdq_naive_grid_pins_shuffled_hash_build(spark):
    # Even with auto-broadcast ON (the default), the grid BNL must not
    # let AQE broadcast the ×grid-replicated corpus side: the hint pins
    # a shuffled hash build of one corpus cell per task (round-5 fix —
    # the broadcast degenerated to grid² mega-chains and is grid× the
    # corpus at scale).
    plan = _plan(spark, "pdq_duplicates_naive")
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin [g_i" not in plan


def test_kmeans_seed_pick_is_distributed_topk(spark):
    # Seed selection must be TakeOrderedAndProject (local top-k per
    # partition), never a single-partition global window over the
    # corpus; assignment broadcasts the k-row centroid table.
    plan = _plan(spark, "kmeans_embeddings")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_histogram_quantiles_is_two_agg_sketch(spark):
    # The sketch must stay a bounded aggregation: stats pass + bucket
    # counts + per-group cumsum window — no sort of the raw values.
    plan = _plan(spark, "events_quantiles_hist")
    assert "WindowGroupLimit" not in plan  # no top-k machinery
    assert plan.count("HashAggregate") >= 4  # partial+final × two aggs


def test_url_duplicates_capped_drops_planted_viral_group(spark):
    # The registered capped query plants one viral-URL row per document
    # (group size = corpus size >> cap); the cap's count pre-pass must
    # drop that group entirely while organic groups pass through.
    fn, _ = ALL_QUERIES["url_duplicates_capped"]
    rows = fn(spark, SF).collect()
    assert rows, "organic duplicate groups must survive the cap"
    assert not [r for r in rows if r["index"].startswith("VG")]
    assert not [
        r for r in rows if "VG" in (r["url_duplicates"] or "")
    ]


def test_kmeans_ivf_fine_join_is_bucketed_not_broadcast(spark):
    # The two-level quantizer's whole point: the fine-centroid table
    # arrives via an equi-join on the coarse cell id, NOT a broadcast
    # (the fine table scales past executor memory). The coarse
    # assignment must be materialized once (both fine-stage branches
    # consume it) — pinned as ExistingRDD scans in the executed plan.
    plan = _plan(spark, "kmeans_ivf_assign")
    assert plan.count("Scan ExistingRDD") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re

    fine_join = re.findall(r"(\w+Join) \[coarse", plan)
    assert fine_join and all(j != "BroadcastHashJoin" for j in fine_join)


def _artifact_round(name: str) -> int:
    import re

    m = re.search(r"r(\d+)", name)
    return int(m.group(1)) if m else -1


def _stale_untracked_artifacts(on_disk: list[str], tracked: set[str]) -> list[str]:
    """Untracked rotation artifacts that SHOULD be committed.

    The driver writes ``CORRECTNESS_r{N}.json`` / ``BENCH_r{N}.json``
    AFTER the builder's final round-N commit, so at every round boundary
    exactly the newest round's artifacts are untracked by construction.
    Those cannot influence a fresh clone's rotation (a clone of HEAD
    doesn't have them), so they are exempt. Anything at or below the
    latest COMMITTED round, however, is a real hygiene failure: the
    working tree's rotation order would diverge from a fresh clone's —
    the round-7 verdict finding this test protects against.
    """
    latest_tracked = max(
        (_artifact_round(n) for n in tracked if n.startswith("CORRECTNESS_r")),
        default=-1,
    )
    return [
        n
        for n in on_disk
        if n not in tracked and _artifact_round(n) <= latest_tracked
    ]


def test_image_near_dup_is_banded_equi_join(spark):
    # Candidates must arrive through the banded (band_id, band_key)
    # equi-join — never an all-pairs scan. With auto-broadcast off
    # (two 100 TB-sized sides) the plan must stay a shuffle equi-join.
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "image_near_dup")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_image_near_dup_capped_stays_banded(spark):
    # The cap adds a count pre-pass + semi-join; the candidate path
    # must remain the banded equi-join — never an all-pairs scan —
    # even with the planted corpus-sized viral group present.
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "image_near_dup_capped")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_quality_classifier_learned_scoring_is_broadcast_only(spark):
    # Scoring = per-row features + a ONE-ROW broadcast model join: the
    # scored side must never shuffle. The only exchanges in the whole
    # plan belong to the training aggregation (which reduces to one
    # row); the scoring join is a broadcast nested-loop (cross) join.
    plan = _plan(spark, "quality_classifier_learned")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_hybrid_fusion_inputs_are_bounded_ranked_lists(spark):
    # The fusion layer must consume only the two per-query top-k
    # ranked lists: both sides of the full-outer fusion join sit above
    # a rank<=k window filter (lex, sem, plus the fused re-rank = 3
    # row_number windows), and the semantic stage streams the corpus
    # against the BROADCAST probe set — the corpus is never on the
    # build side of anything.
    plan = _plan(spark, "hybrid_search")
    assert "FullOuter" in plan
    assert plan.count("row_number()") >= 3
    assert "BroadcastNestedLoopJoin" in plan


def test_round_edits_are_declared():
    # The driver's 50-query correctness window orders by staleness plus
    # the hand-kept _PLAN_CHANGED list; the failure mode is an edit
    # that changes a query's RESULTS without a _PLAN_CHANGED entry, so
    # the stale driver row keeps vouching for a result that no longer
    # exists. This lint closes the gap: every package file changed
    # since the latest COMMITTED round artifact must be declared in
    # plans._ROUND_EDITS — either naming the result-changed queries
    # (which must then be queued via _PLAN_CHANGED, or be brand-new and
    # lead the rotation as never-verified) or carrying a written
    # results-unchanged rationale.
    import subprocess
    from pathlib import Path

    from cir_duplicate_detector_spark import plans

    root = Path(__file__).resolve().parents[1]

    def _git(*args):
        return subprocess.run(
            ["git", *args], cwd=root, capture_output=True, text=True
        )

    tracked = _git("ls-files").stdout.splitlines()
    rounds = sorted(
        (_artifact_round(n), n)
        for n in tracked
        if n.startswith("CORRECTNESS_r") and n.endswith(".json")
    )
    if not rounds:
        return  # round 1 / artifact-less clone: nothing to diff against
    base_commit = _git(
        "log", "--diff-filter=A", "--format=%H", "-n", "1", "--",
        rounds[-1][1],
    ).stdout.strip()
    if not base_commit:
        return  # shallow clone without the artifact's history
    changed = [
        f
        # Diff base → working tree (not base..HEAD), so uncommitted
        # edits are linted BEFORE they are committed undeclared.
        for f in _git(
            "diff", "--name-only", base_commit, "--",
            "cir_duplicate_detector_spark",
        ).stdout.splitlines()
        if f.endswith(".py")
    ]
    undeclared = [f for f in changed if f not in plans._ROUND_EDITS]
    assert not undeclared, (
        f"package files changed since {rounds[-1][1]} without a "
        f"plans._ROUND_EDITS declaration: {undeclared} — name the "
        "result-changed queries (and add them to _PLAN_CHANGED) or "
        "record why results are unchanged"
    )
    for f, decl in plans._ROUND_EDITS.items():
        if isinstance(decl, str):
            assert decl.strip(), f"{f}: empty results-unchanged rationale"
            continue
        for q in decl:
            assert q in plans.ALL_QUERIES, (f, q, "unknown query")
            assert q in plans._PLAN_CHANGED or q not in plans._LAST, (
                f"{f} declares result change for {q!r} but it is "
                "neither in _PLAN_CHANGED nor brand-new — the driver "
                "window may keep a stale row"
            )


def test_corpus_bucketed_join_is_shuffle_free(spark):
    # The whole payoff of write_bucketed: both sides of the doc_id join
    # are bucketed (and sorted) by doc_id with the same bucket count, so
    # the executed plan must contain NO exchange at all — the shuffle
    # was paid once at write time. With auto-broadcast disabled
    # (emulating two 100 TB relations) the join must still be
    # exchange-free, i.e. a sort-merge over co-located buckets.
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "corpus_bucketed_join")
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_rotation_artifacts_are_git_tracked():
    # The driver-window rotation is COMPUTED from the committed
    # CORRECTNESS_r*.json artifacts (plans/__init__._last_verified_round
    # reads the repo root). An untracked artifact at or below the latest
    # committed round means a fresh clone of HEAD computes a DIFFERENT
    # window order than this working tree. Artifacts NEWER than the
    # latest committed round are the driver's post-commit drop and are
    # exempt (see _stale_untracked_artifacts).
    import subprocess
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    tracked = set(
        subprocess.run(
            ["git", "ls-files"],
            cwd=root,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.splitlines()
    )
    on_disk = sorted(p.name for p in root.glob("CORRECTNESS_r*.json"))
    assert on_disk, "no correctness artifacts found at the repo root"
    stale = _stale_untracked_artifacts(on_disk, tracked)
    assert not stale, (
        f"rotation-visible artifacts not in git: {stale}; commit "
        "them or the next round's driver window mis-orders on a fresh "
        "clone"
    )


def test_rotation_artifact_check_tolerates_driver_drop(tmp_path):
    # Simulated round boundary: the driver drops CORRECTNESS_r99.json
    # after the builder's final commit. The check must pass both BEFORE
    # the drop (clean tree) and AFTER it (only-newer-round untracked),
    # while still flagging an uncommitted artifact from an OLD round.
    tracked = {
        "CORRECTNESS_r07.json",
        "CORRECTNESS_r08.json",
        "BENCH_r08.json",
        "README.md",
    }
    before = ["CORRECTNESS_r07.json", "CORRECTNESS_r08.json"]
    assert _stale_untracked_artifacts(before, tracked) == []
    after_drop = before + ["CORRECTNESS_r99.json"]
    assert _stale_untracked_artifacts(after_drop, tracked) == []
    # A missing OLD artifact is still a failure.
    regression = before + ["CORRECTNESS_r05.json"]
    assert _stale_untracked_artifacts(regression, tracked) == [
        "CORRECTNESS_r05.json"
    ]


def test_round_edit_lint_tolerates_driver_drop(tmp_path):
    # Simulated round boundary for the ROUND-EDITS lint's view of
    # "brand-new": the driver drops CORRECTNESS_r99.json (untracked)
    # right after the builder's final commit. _last_verified_round must
    # IGNORE rounds beyond the committed bound, so a genuinely
    # brand-new query stays brand-new (no row) in this working tree
    # exactly as it would in a fresh clone of HEAD — the one-round lag
    # that broke the lint at the round-9 boundary (VERDICT r9 item 1).
    import json as _json

    from cir_duplicate_detector_spark.plans import _last_verified_round

    (tmp_path / "CORRECTNESS_r08.json").write_text(
        _json.dumps({"old_q": {"rows_match": True}})
    )
    (tmp_path / "CORRECTNESS_r99.json").write_text(
        _json.dumps({"old_q": {"rows_match": True},
                     "new_q": {"rows_match": True}})
    )
    bounded = _last_verified_round(root=tmp_path, max_round=8)
    assert bounded == {"old_q": 8}, bounded  # r99 drop invisible
    unbounded = _last_verified_round(root=tmp_path, max_round=None)
    assert unbounded == {"old_q": 99, "new_q": 99}


def test_last_is_bounded_by_tracked_rounds():
    # The live _LAST must be computed with the committed-round bound:
    # no round in it may exceed the highest git-tracked CORRECTNESS
    # round, even while the driver's untracked drop sits on disk.
    from cir_duplicate_detector_spark import plans

    bound = plans._latest_tracked_round(plans._ROOT)
    if bound is None:
        return  # exported tree without git: nothing to bound against
    assert all(rnd <= bound for rnd in plans._LAST.values()), (
        "plans._LAST contains rounds newer than the latest committed "
        "artifact — the tracked-round bound is not applied"
    )


# ---- plan-fingerprint lint (round 11, VERDICT r10 item 2) ----------


def _tracked_plans_artifacts():
    import json
    import subprocess
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    out = subprocess.run(
        ["git", "ls-files", "PLANS_r*.json"],
        cwd=root,
        capture_output=True,
        text=True,
    )
    arts = {}
    for name in out.stdout.splitlines():
        try:
            arts[_artifact_round(name)] = json.loads(
                (root / name).read_text()
            )["fingerprints"]
        except (OSError, KeyError, ValueError):
            continue
    return arts


def test_canonicalizer_keeps_user_counter_names():
    # Session-generated tokens normalize (lambda vars x_2, hex-suffixed
    # sink views, expression ids), but a USER identifier ending in
    # _<digits> is plan-bearing: renaming foo_1 -> foo_2 must CHANGE
    # the canonical text — a blanket `\w*_\d+` collapse would vouch
    # "plan unchanged" for a real rename (round-11 review finding).
    from cir_duplicate_detector_spark.plans import fingerprint as fp

    norm = fp._GEN_NAME.sub(r"\1_", "lambda x_2: foo_1 + band_3")
    assert "x_" in norm and "x_2" not in norm
    assert "foo_1" in norm and "band_3" in norm
    a = fp._EXPR_ID.sub("#", "col_a#12 AS foo_1#34")
    b = fp._EXPR_ID.sub("#", "col_a#99 AS foo_1#7")
    assert a == b  # expression ids normalize
    hx = fp._HEX_NAME.sub(r"\1_", "view stream_sess_6f4fcd6bdead")
    assert "6f4fcd6b" not in hx


def test_fingerprint_lint_catches_mutation():
    # The pure diff rule, exercised with a deliberately-mutated query:
    # a changed fingerprint without a _PLAN_CHANGED entry is a
    # violation; queued, brand-new, volatile, and errored entries are
    # not. This is the simulation the machine-checkable lint promises —
    # prose declarations alone could claim anything.
    from cir_duplicate_detector_spark.plans.fingerprint import (
        fingerprint_violations,
    )

    prev = {
        "q_same": "aaaa",
        "q_mutated": "bbbb",
        "q_queued": "cccc",
        "q_volatile": "VOLATILE:x:y",
        "q_err": "ERR:AnalysisException",
    }
    cur = {
        "q_same": "aaaa",
        "q_mutated": "MUTATED",
        "q_queued": "CHANGED",
        "q_volatile": "dddd",
        "q_err": "eeee",
        "q_brand_new": "ffff",
    }
    assert fingerprint_violations(prev, cur, []) == ["q_mutated", "q_queued"]
    assert fingerprint_violations(prev, cur, ["q_mutated", "q_queued"]) == []
    # stable -> VOLATILE/ERR is a VIOLATION, not a skip: an edit that
    # makes a plan session-random (or unbuildable) changed the plan,
    # and skipping it would reopen the silent-edit hole (a
    # result-changing edit could hide behind a deliberately-volatile
    # plan). Queued, it passes like any other change.
    cur2 = dict(cur, q_mutated="VOLATILE:a:b", q_queued="ERR:Py4JError")
    assert fingerprint_violations(prev, cur2, []) == [
        "q_mutated", "q_queued",
    ]
    assert fingerprint_violations(
        prev, cur2, ["q_mutated", "q_queued"]
    ) == []


def test_plan_fingerprints_vs_previous_round():
    # The cross-round diff: every query whose canonical analyzed-plan
    # fingerprint changed between the previous round's committed
    # PLANS_r{N-1}.json and this round's PLANS_r{N}.json must be queued
    # in _PLAN_CHANGED (void its stale driver rows) or be brand-new.
    # Skips until two consecutive artifacts exist (bootstrap round).
    from cir_duplicate_detector_spark import plans
    from cir_duplicate_detector_spark.plans.fingerprint import (
        fingerprint_violations,
    )

    arts = _tracked_plans_artifacts()
    cur_round = (plans._latest_tracked_round(
        __import__("pathlib").Path(__file__).resolve().parents[1]
    ) or 0) + 1
    if cur_round not in arts or (cur_round - 1) not in arts:
        return  # bootstrap: no consecutive pair yet
    bad = fingerprint_violations(
        arts[cur_round - 1], arts[cur_round], plans._PLAN_CHANGED
    )
    assert not bad, (
        f"queries whose logical plan changed since round {cur_round - 1} "
        f"without a _PLAN_CHANGED entry: {bad} — queue them for driver "
        "re-verification (or regenerate PLANS with "
        "scripts/plan_fingerprints.py if the artifact is stale)"
    )


def test_plan_fingerprint_artifact_freshness(spark):
    # PLANS_r{N}.json is only as good as its regeneration discipline:
    # rebuild a small deterministic rotating sample of plans LIVE and
    # compare against the committed artifact for the current round — a
    # stale artifact (edits after the last scripts/plan_fingerprints.py
    # run) fails here instead of silently vouching for old plans.
    # Volatile/ERR entries and streaming queries (minutes each) are
    # skipped; the sample rotates with the round number so staleness
    # anywhere in the registry is eventually sampled.
    import hashlib as _h
    from pathlib import Path

    from cir_duplicate_detector_spark import plans
    from cir_duplicate_detector_spark.plans.fingerprint import (
        plan_fingerprint,
    )

    arts = _tracked_plans_artifacts()
    cur_round = (
        plans._latest_tracked_round(Path(__file__).resolve().parents[1])
        or 0
    ) + 1
    fps = arts.get(cur_round)
    if fps is None:
        return  # artifact not yet generated this round
    stable = sorted(
        n
        for n, v in fps.items()
        if not v.startswith(("VOLATILE", "ERR"))
        and "stream" not in n
        and n in ALL_QUERIES
    )
    sample = sorted(
        stable,
        key=lambda n: _h.sha256(f"{cur_round}:{n}".encode()).hexdigest(),
    )[:5]
    stale = []
    for name in sample:
        live = plan_fingerprint(ALL_QUERIES[name][0](spark, SF))
        if live != fps[name]:
            stale.append((name, fps[name], live))
    assert not stale, (
        f"PLANS_r{cur_round:02d}.json is stale for {stale} — re-run "
        "scripts/plan_fingerprints.py after the last package edit"
    )


def test_shared_artifacts_build_once_and_serve_from_parquet(spark):
    # The round-11 shared artifacts (shingle index, dup-label table,
    # coarse centroids) must (a) memoize per (application, sf_dir) —
    # the second call returns the SAME relation without rebuilding —
    # and (b) hand consumers a parquet scan, so every reference reads
    # the persisted index instead of re-running the build tree.
    from cir_duplicate_detector_spark.plans.ext_ann import (
        _shared_coarse_centroids,
    )
    from cir_duplicate_detector_spark.plans.ext_dedup import (
        _shared_dup_labels,
        _shared_shingle_index,
    )

    for builder in (
        _shared_shingle_index,
        _shared_dup_labels,
        _shared_coarse_centroids,
    ):
        first = builder(spark, SF)
        assert builder(spark, SF) is first, builder.__name__
        scan = first._jdf.queryExecution().executedPlan().toString()
        assert "FileScan parquet" in scan, (builder.__name__, scan[:400])


def test_ngram_jaccard_serves_index_scan_no_explode(spark):
    # With the family-shared persisted shingle index, the registered
    # Jaccard plan must contain NO Generate (explode) and no df-cap
    # re-aggregation — the three index references (probe filter, size
    # aggregate, corpus join side) all scan the same parquet relation.
    plan = _plan(spark, "dedup_ngram_jaccard")
    assert "Generate" not in plan, plan[:600]
    assert plan.count("FileScan parquet") >= 3


def test_dup_labels_upsert_shape(spark):
    # The incremental labeler must serve labels from the persisted
    # snapshot (a parquet scan, not an inline closure) and contain no
    # cartesian product anywhere — the band probe and verify are
    # equi-joins by construction.
    plan = _plan(spark, "dup_labels_upsert")
    assert "CartesianProduct" not in plan
    assert "FileScan parquet" in plan
    # the closure's iterative label propagation never appears in the
    # registered per-wave plan (no localCheckpoint scan of CC rounds
    # re-running: the snapshot is read, not recomputed)
    from cir_duplicate_detector_spark.plans.ext_dedup import (
        _shared_existing_labels,
    )
    lab_scan = _shared_existing_labels(
        spark, SF
    )._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in lab_scan


def test_coverage_counts_match_registry():
    # COVERAGE.md is the judge-facing contract doc; its hand-kept query
    # counts drifted twice (r11 verdict item: header said 168, the
    # tri-scale note said 179, the registry had 180). Pin every stated
    # count to len(ALL_QUERIES) so drift fails a test instead of
    # surviving review.
    import re
    from pathlib import Path

    from cir_duplicate_detector_spark.plans import ALL_QUERIES

    text = (Path(__file__).resolve().parents[1] / "COVERAGE.md").read_text()
    stated = re.findall(r"All (\d+) registered queries", text)
    stated += re.findall(r"tri-scale claim covers all (\d+)", text)
    assert stated, "COVERAGE.md no longer states registry counts"
    for n in stated:
        assert int(n) == len(ALL_QUERIES), (
            f"COVERAGE.md states {n} registered queries; the registry "
            f"has {len(ALL_QUERIES)} — update the doc (and re-run the "
            "tri-scale parity for any new registrations)"
        )


def test_tmp_normalization_preserves_family_prefix():
    # ADVICE r14 (medium): the two ANN recall rows' plans differed ONLY
    # by their shared-artifact parquet dir, and blanket /TMP collapsing
    # made their fingerprints identical — a cross-wired shared cache
    # would have produced NO fingerprint change. The normalizer now
    # keeps the deterministic mkdtemp family prefix (and still drops
    # the random suffix + everything after the first path segment).
    from cir_duplicate_detector_spark.plans.fingerprint import (
        _TMP_PATH,
        _tmp_repl,
    )

    def norm(s):
        return _TMP_PATH.sub(_tmp_repl, s)

    a = norm("file:/tmp/knn_bf_9ac3m1x2/topk.parquet")
    b = norm("file:/tmp/knn_lsh_0q2w3e4r/topk.parquet")
    assert a == "file:/TMP/knn_bf_"
    assert b == "file:/TMP/knn_lsh_"
    assert a != b  # family identity is plan-visible
    # same family, different mkdtemp suffix -> same canonical token
    assert norm("/tmp/knn_bf_11aa22bb/topk.parquet") == "/TMP/knn_bf_"
    # non-family paths (no prefix_ + 8-char suffix shape) still
    # collapse fully, including session-random subdirs
    assert norm("/tmp/blockmgr-06f1a2b3-c4d5/sub") == "/TMP/"
    assert norm("/tmp/tmpab12cd34/x") == "/TMP/"
