"""Planted-input tests for the round-4 pipeline operators: KMV
distinct sketch, decontamination screen, semantic dedup, Bloom screen.

Each test constructs an input where the correct answer is computable by
hand, so these pin SEMANTICS; engine parity with DuckDB is pinned
separately by tests/test_oracle_parity.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cir_duplicate_detector_spark.operators import dedup, similarity, sketches, textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --------------------------------------------------------------- KMV

def test_kmv_exact_below_k(spark):
    # 3 distinct tokens < k: the sketch must be EXACT.
    df = _docs(spark, [(1, "a b c a"), (2, "b c")])
    out = sketches.kmv_distinct_tokens(
        df.withColumn("lang", F.lit("en")), k=64
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row.n_kept == 3
    assert row.est_distinct == 3.0


def test_kmv_estimates_above_k(spark):
    # 500 distinct tokens, k=32: estimate within 30% of truth (the
    # estimator's relative error is ~1/sqrt(k-2) ≈ 18%).
    text = " ".join(f"tok{i}" for i in range(500))
    df = _docs(spark, [(1, text)]).withColumn("lang", F.lit("en"))
    row = sketches.kmv_distinct_tokens(df, k=32).collect()[0]
    assert row.n_kept == 32
    assert 350 <= row.est_distinct <= 650


def test_kmv_groups_independent(spark):
    # Groups sketch independently: same tokens -> same estimate per group.
    df = spark.createDataFrame(
        [(1, "x y z", "en"), (2, "x y z", "de")],
        "doc_id long, text string, lang string",
    )
    rows = {r.lang: r for r in sketches.kmv_distinct_tokens(df, k=8).collect()}
    assert rows["en"].est_distinct == rows["de"].est_distinct == 3.0
    assert rows["en"].kth_hash == rows["de"].kth_hash


# ----------------------------------------------------- decontamination

_EVAL_TEXT = "the quick brown fox jumps over the lazy dog today"  # 10 words


def test_decontaminate_flags_verbatim_overlap(spark):
    train = _docs(
        spark,
        [
            (1, "prefix words " + _EVAL_TEXT),  # contains every eval 8-gram
            (2, "completely unrelated text with no overlap at all here"),
        ],
    )
    ev = _docs(spark, [(100, _EVAL_TEXT)])
    out = {r.doc_id: r for r in textops.decontaminate(train, ev).collect()}
    assert set(out) == {1}
    # eval text has 10 words -> 3 distinct 8-grams, all shared
    assert out[1].n_shared_grams == 3
    assert out[1].n_eval_docs == 1


def test_decontaminate_short_text_whole_doc_gram(spark):
    # Texts under 8 words shingle to the whole text: only an exact
    # short-text match is contamination.
    train = _docs(spark, [(1, "short snippet"), (2, "other snippet")])
    ev = _docs(spark, [(100, "short snippet")])
    out = textops.decontaminate(train, ev).collect()
    assert [(r.doc_id, r.n_shared_grams) for r in out] == [(1, 1)]


def test_decontaminate_df_cap_drops_boilerplate_gram(spark):
    # A gram shared by every eval doc is dropped at max_df=1, so train
    # docs matching ONLY it are not flagged.
    boiler = "one two three four five six seven eight"
    train = _docs(spark, [(1, boiler)])
    ev = _docs(spark, [(100, boiler), (101, boiler)])
    assert textops.decontaminate(train, ev, max_df=1).count() == 0
    assert textops.decontaminate(train, ev, max_df=2).count() == 1


# ----------------------------------------------------- semantic dedup

def _vecs(spark, rows, dim=4):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df


def test_semantic_dedup_within_cluster(spark):
    # centroid_mod pinned to 40: vec 0 is the only centroid, all
    # vectors join its cluster (the default is √N-scaled, which at N=4
    # would promote vec 2 to a centroid and split the cluster). 1 and 2
    # are identical (cosine 1), 3 is orthogonal.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 1.0]),
    ]
    out = similarity.semantic_near_duplicates(
        _vecs(spark, rows), threshold=0.999, centroid_mod=40
    ).collect()
    pairs = {(r.a, r.b): r for r in out}
    assert (1, 2) in pairs
    assert abs(pairs[(1, 2)].cosine - 1.0) < 1e-12
    assert all(r.cid == 0 for r in out)
    assert not any(3 in (a, b) for (a, b) in pairs)


def test_semantic_dedup_blind_across_clusters(spark):
    # Two well-separated centroids (0 and 40): identical vectors
    # assigned to DIFFERENT clusters are never paired — the documented
    # SemDeDup trade.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (40, [0.0, 1.0, 0.0, 0.0]),
        # 1 leans to centroid 0; 41 leans to centroid 40; the pair
        # (1, 41) has cosine 1.0 but straddles clusters.
        (1, [0.8, 0.6, 0.0, 0.0]),
        (41, [0.6, 0.8, 0.0, 0.0]),
    ]
    out = similarity.semantic_near_duplicates(
        _vecs(spark, rows), threshold=0.5, centroid_mod=40
    ).collect()
    ids = {(r.a, r.b) for r in out}
    assert (1, 41) not in ids


# ------------------------------------------------ exact canonicalization

def test_canonicalize_exact_keeps_smallest_id(spark):
    df = _docs(
        spark,
        [(5, "same text"), (2, "same text"), (9, "same text"), (7, "other")],
    )
    out = sorted(r.doc_id for r in dedup.canonicalize_exact(df).collect())
    assert out == [2, 7]


def test_canonicalize_exact_preserves_non_dups(spark):
    df = _docs(spark, [(i, f"unique {i}") for i in range(10)])
    assert dedup.canonicalize_exact(df).count() == 10


# ----------------------------------------------------- chunk-level dedup

def test_chunk_dedup_finds_repeated_passage(spark):
    # Two docs share an identical 8-token passage; chunking at 8/8
    # (no overlap) isolates it as one recurring chunk.
    passage = "alpha beta gamma delta epsilon zeta eta theta"
    df = _docs(
        spark,
        [
            (1, passage + " " + "unique one two three four five six seven"),
            (2, passage + " " + "different eight nine ten eleven twelve thirteen fourteen"),
            (3, "nothing in common here at all whatsoever friends"),
        ],
    )
    out = textops.chunk_dedup(df, chunk_tokens=8, step=8).collect()
    assert len(out) == 1
    assert out[0].n_docs == 2
    assert out[0].n_occurrences == 2
    assert out[0].canonical_doc == 1


def test_chunk_dedup_within_doc_repeat_not_cross_doc(spark):
    # A passage repeated INSIDE one doc is not cross-doc duplication
    # (n_docs counts distinct docs, the min_docs gate uses it).
    passage = "rep one two three four five six seven"
    df = _docs(spark, [(1, passage + " " + passage)])
    assert textops.chunk_dedup(df, chunk_tokens=8, step=8).count() == 0


# ----------------------------------------------------- budget sampling

def test_token_budget_greedy_prefix(spark):
    # Equal quality -> doc_id order; budget 5 admits docs while tokens
    # BEFORE each stay under budget: 1 (0<5), 2 (3<5), not 3 (6>=5).
    df = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "d e f", "en"), (3, "g h i", "en")],
        "doc_id long, text string, lang string",
    )
    out = textops.token_budget_sample(df, budget=5)
    assert sorted(r.doc_id for r in out.collect()) == [1, 2]


def test_token_budget_prefers_quality(spark):
    # Higher-quality doc admitted first even with a larger doc_id.
    low = "zzz qqq xxx"  # no stopwords, no punct -> low score
    high = "the cat and the dog is in the house. it is nice."
    df = spark.createDataFrame(
        [(1, low, "en"), (2, high, "en")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in textops.token_budget_sample(df, budget=1).collect()}
    assert set(out) == {2}  # only the high-quality doc fits the 1-token budget gate


def test_quality_band_drops_both_tails(spark):
    # 11 docs, distinct scores -> percent_rank = i/10; band [0.1, 0.9]
    # drops exactly the extremes.
    rows = [
        (i, ("the is and of to in. " * (i + 1)).strip(), "en")
        for i in range(11)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = textops.quality_band_filter(df, lo=0.1, hi=0.9)
    kept = sorted(r.doc_id for r in out.collect())
    assert len(kept) == 9
    scores = {
        r.doc_id: r.quality_score
        for r in df.select(
            "doc_id", textops.quality_score_expr().alias("quality_score")
        ).collect()
    }
    order = sorted(scores, key=lambda d: (scores[d], d))
    assert kept == sorted(order[1:-1])


# ----------------------------------------------------- repetition score

def test_doc_repetition_planted(spark):
    # "a b c a b c a b c" -> 7 3-grams, 3 distinct -> ratio 4/7.
    # A non-repetitive doc scores 0; <3 words scores 0 (whole-text gram).
    df = _docs(
        spark,
        [(1, "a b c a b c a b c"), (2, "all words unique here now"), (3, "so short")],
    )
    out = {r.doc_id: r for r in textops.doc_repetition(df).collect()}
    assert out[1].n_grams == 7 and out[1].n_distinct_grams == 3
    assert out[1].rep_ratio == 4 / 7
    assert out[2].rep_ratio == 0.0
    assert out[3].n_grams == 1 and out[3].rep_ratio == 0.0


# ----------------------------------------------------- sequence packing

def test_pack_sequences_concat_then_split(spark):
    # 4 docs of 3 tokens each, seq_len=5: cumulative starts 0,3,6,9 ->
    # packs 0,0,1,1. Manifest: two packs of 2 docs / 6 tokens.
    df = spark.createDataFrame(
        [(i, "x y z", "en") for i in range(1, 5)],
        "doc_id long, text string, lang string",
    )
    out = sorted(
        textops.pack_sequences(df, seq_len=5).collect(),
        key=lambda r: r.pack_id,
    )
    assert [(r.pack_id, r.n_docs, r.n_tokens, r.first_doc) for r in out] == [
        (0, 2, 6, 1),
        (1, 2, 6, 3),
    ]


def test_pack_sequences_groups_pack_independently(spark):
    # Each language concatenates separately: same layout per group.
    df = spark.createDataFrame(
        [(1, "a b", "en"), (2, "c d", "en"), (3, "e f", "de"), (4, "g h", "de")],
        "doc_id long, text string, lang string",
    )
    out = textops.pack_sequences(df, seq_len=2).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append((r.pack_id, r.n_docs, r.n_tokens))
    assert sorted(by_lang["en"]) == sorted(by_lang["de"]) == [(0, 1, 2), (1, 1, 2)]


# -------------------------------------------------------- Bloom screen

def test_bloom_no_false_negatives(spark):
    # Every true duplicate MUST be a bloom hit (the filter's guarantee).
    existing = _docs(spark, [(i, f"doc number {i}") for i in range(50)])
    incoming = _docs(
        spark,
        [(100 + i, f"doc number {i}") for i in range(25)]  # dups
        + [(200 + i, f"fresh text {i}") for i in range(25)],  # new
    )
    out = dedup.bloom_filter_dedup(existing, incoming).collect()
    for r in out:
        if r.is_dup:
            assert r.bloom_hit, f"false negative at doc {r.doc_id}"
    assert sum(r.is_dup for r in out) == 25


def test_bloom_index_roundtrip_identical(spark, tmp_path):
    # The persisted index pair (bit positions + digest keys) must
    # answer EXACTLY like the in-session build — the soundness claim
    # behind the registered bloom_index_roundtrip identity guard.
    existing = _docs(spark, [(i, f"doc number {i}") for i in range(40)])
    incoming = _docs(
        spark,
        [(100 + i, f"doc number {i}") for i in range(20)]
        + [(200 + i, f"fresh text {i}") for i in range(20)],
    )
    bits, seen = dedup.bloom_index(existing)
    direct = dedup.bloom_screen_from_index(incoming, bits, seen).collect()
    bits.write.parquet(str(tmp_path / "bits"))
    seen.write.parquet(str(tmp_path / "keys"))
    served = dedup.bloom_screen_from_index(
        incoming,
        spark.read.parquet(str(tmp_path / "bits")),
        spark.read.parquet(str(tmp_path / "keys")),
    ).collect()

    def rows(rs):
        return sorted((r.doc_id, r.bloom_hit, r.is_dup) for r in rs)

    assert rows(direct) == rows(served)
    # And the composed bloom_filter_dedup agrees too.
    composed = dedup.bloom_filter_dedup(existing, incoming).collect()
    assert rows(composed) == rows(direct)


def test_bloom_tiny_filter_false_positives(spark):
    # m=4 bits / k=2: nearly every probe collides — false positives are
    # EXPECTED (bloom_hit without is_dup), false negatives still never.
    existing = _docs(spark, [(i, f"base {i}") for i in range(20)])
    incoming = _docs(spark, [(100 + i, f"novel {i}") for i in range(20)])
    out = dedup.bloom_filter_dedup(existing, incoming, m=4, k=2).collect()
    assert all(not r.is_dup for r in out)
    assert any(r.bloom_hit for r in out)  # saturated filter -> FPs


# ------------------------------------- LM scoring / mixing / sharding

def test_bigram_novelty_counts(spark):
    # doc 1: grams {"a b", "b c"}; doc 2: gram {"a b"}. Corpus freq:
    # "a b"=2, "b c"=1 -> doc1 avg=(2+1)/2, rare_ratio=1/2; doc2 avg=2.
    out = {
        r.doc_id: r
        for r in textops.bigram_novelty(
            _docs(spark, [(1, "a b c"), (2, "a b")])
        ).collect()
    }
    assert out[1].n_grams == 2 and out[2].n_grams == 1
    assert out[1].avg_gram_freq == 1.5 and out[1].rare_ratio == 0.5
    assert out[2].avg_gram_freq == 2.0 and out[2].rare_ratio == 0.0


def test_bigram_novelty_short_doc_whole_text_gram(spark):
    # <2 words: the whole text is the single gram (word_shingles
    # contract) -- the doc does not drop out.
    out = textops.bigram_novelty(_docs(spark, [(1, "solo")])).collect()
    assert [(r.doc_id, r.n_grams, r.rare_ratio) for r in out] == [(1, 1, 1.0)]


def test_domain_mixture_sqrt_weights(spark):
    df = spark.createDataFrame(
        [(i, "w x y z", "big") for i in range(4)] + [(9, "w", "small")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in textops.domain_mixture(df).collect()}
    # w_num: big=sqrt(4)*1e6=2e6, small=1e6 -> weights 2/3, 1/3.
    assert abs(out["big"].weight - 2 / 3) < 1e-12
    assert abs(out["small"].weight - 1 / 3) < 1e-12
    assert out["big"].total_tokens == 16 and out["small"].total_tokens == 1
    # expected_docs are exact floors summing to <= budget
    assert out["big"].expected_docs == 66666
    assert out["small"].expected_docs == 33333


def test_assign_shards_deterministic_and_dense(spark):
    docs = _docs(spark, [(i, "t") for i in range(50)])
    a = textops.assign_shards(docs, n_shards=4).collect()
    b = textops.assign_shards(docs, n_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # run-stable
    by_shard: dict[int, list[int]] = {}
    for r in a:
        assert 0 <= r.shard < 4
        by_shard.setdefault(r.shard, []).append(r.pos)
    # positions are dense 1..len within every shard
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))


# ------------------------------------------------- Count-Min sketch

def test_cms_estimate_one_sided_and_exact_heavy(spark):
    # "hot" appears 30x, others once: with 4x512 cells vs ~4 distinct
    # tokens, collisions are essentially impossible, so estimates are
    # exact; the CMS guarantee we pin structurally is est >= truth.
    text = " ".join(["hot"] * 30 + ["a", "b", "c"])
    out = {
        r.tok: r
        for r in sketches.cms_topk_diagnostic(
            _docs(spark, [(1, text)]), k=4
        ).collect()
    }
    assert out["hot"].rank == 1 and out["hot"].true_cnt == 30
    for r in out.values():
        assert r.est_cnt >= r.true_cnt
    assert out["hot"].est_cnt == 30


def test_cms_sketch_bounded_cells(spark):
    toks = _docs(spark, [(1, " ".join(f"t{i}" for i in range(2000)))]).select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    sk = sketches.cms_sketch(toks, "tok", depth=2, width=16)
    assert sk.count() <= 2 * 16  # counter table bounded, not stream-sized


# ------------------------------------------------- TF-IDF top terms

def test_tfidf_linear_idf_ranking(spark):
    # apple: tf=2 df=1 -> 2*3/1 = 6; banana: tf=1 df=2 -> 1.5.
    df = _docs(
        spark,
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry cherry cherry")],
    )
    out = textops.tfidf_top_terms(df, k=1).collect()
    best = {r.doc_id: r for r in out}
    assert best[1].term == "apple" and best[1].score == 6.0
    assert best[3].term == "cherry" and best[3].score == 3 * 3 / 2
    # doc 2: banana and cherry tie at 1*3/2; term asc tie-break -> banana
    assert best[2].term == "banana"


def test_tfidf_k_limits_per_doc(spark):
    df = _docs(spark, [(1, "a b c d e"), (2, "a b")])
    out = textops.tfidf_top_terms(df, k=3)
    per_doc = out.groupBy("doc_id").count().collect()
    assert {r.doc_id: r["count"] for r in per_doc} == {1: 3, 2: 2}


# ------------------------------------- histogram quantile sketch

def test_histogram_quantiles_one_sided_bounded_error(spark):
    vals = [(float(i), "t") for i in range(1, 101)]
    ev = spark.createDataFrame(vals, "value double, event_type string")
    row = sketches.histogram_quantiles(ev).collect()[0]
    width = (100.0 - 1.0) / 64
    # thr(p) = ceil(100*p/100); exact thr-th smallest value is thr itself.
    for p in (50, 90, 99):
        exact = float(p)
        est = row[f"est_p{p}"]
        assert exact <= est <= exact + width + 1e-9, (p, est)


def test_histogram_quantiles_degenerate_group_exact(spark):
    ev = spark.createDataFrame(
        [(7.5, "t")] * 5, "value double, event_type string"
    )
    row = sketches.histogram_quantiles(ev).collect()[0]
    assert row.est_p50 == row.est_p90 == row.est_p99 == 7.5


# ------------------------------ watermark-bounded streaming dedup

def test_streaming_dedup_watermarked_one_per_delivery_key(spark):
    from cir_duplicate_detector_spark.sources.tables import load_table
    from cir_duplicate_detector_spark.streaming.windows import (
        streaming_dedup_watermarked,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r.event_type: r.n_events
        for r in streaming_dedup_watermarked(spark, sf).collect()
    }
    # event_ids are unique in the raw table, so despite every 7th event
    # being delivered twice the retained count per type must equal the
    # plain per-type row count.
    want = {
        r.event_type: r.n
        for r in load_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


# --------------------------------- leakage-safe dataset split

def test_dataset_split_cluster_members_share_split(spark):
    from cir_duplicate_detector_spark.plans.extension_queries import (
        q_dataset_split,
    )

    out = q_dataset_split(spark, "/root/testdata/sf0.001").collect()
    # every document assigned exactly once
    ids = [r.doc_id for r in out]
    assert len(ids) == len(set(ids)) and len(ids) > 0
    # leakage guarantee: all members of a duplicate group land on the
    # same side
    by_group = {}
    for r in out:
        by_group.setdefault(r.group_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_group.values())
    # at least one multi-member group exists in the derived corpus and
    # all three splits are populated at 90/5/5 over ~1000 groups
    assert {r.split for r in out} == {"train", "val", "test"}


# ----------------------------------------------- Lloyd k-means

def test_kmeans_separates_planted_clusters(spark):
    from cir_duplicate_detector_spark.operators import kmeans

    # two tight blobs far apart in 64-dim: k=2 must split them exactly
    rows = []
    for i in range(8):
        rows.append((i, [10.0 + 0.01 * i] * 64))
        rows.append((100 + i, [-10.0 - 0.01 * i] * 64))
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = kmeans.kmeans_assign(embs, k=2, iters=2).collect()
    by_blob = {}
    for r in out:
        by_blob.setdefault(r.vec_id < 100, set()).add(r.cluster)
    assert len(out) == 16
    assert by_blob[True].isdisjoint(by_blob[False])
    assert len(by_blob[True]) == 1 and len(by_blob[False]) == 1
    # converged assignment: every member sits near its own blob center
    assert all(r.d < 64 * 0.1 for r in out)


# --------------------------------------------- corpus drift

def test_corpus_drift_planted_shift(spark):
    # cohort A (even ids) says "alpha", cohort B says "beta"; "common"
    # is balanced and must score 0.
    rows = [
        (0, "alpha common"), (2, "alpha common"),
        (1, "beta common"), (3, "beta common"),
    ]
    out = {r.term: r for r in textops.corpus_drift(_docs(spark, rows)).collect()}
    assert out["common"].score == 0
    assert out["alpha"].score == out["beta"].score > 0
    assert out["alpha"].cnt_a == 2 and out["alpha"].cnt_b == 0
    # ranks: the two shifted terms outrank the balanced one
    assert {out["alpha"].rank, out["beta"].rank} == {1, 2}


# ------------------------------------------------ corpus upsert

def test_corpus_upsert_latest_wins(spark):
    base = spark.createDataFrame(
        [(1, "old one", 1), (2, "two", 1)],
        "doc_id long, text string, version long",
    )
    updates = spark.createDataFrame(
        [(1, "new one", 2)], "doc_id long, text string, version long"
    )
    out = {r.doc_id: r for r in dedup.corpus_upsert(base, updates).collect()}
    assert len(out) == 2
    assert out[1].version == 2  # update wins
    assert out[2].version == 1  # untouched rows survive


# --------------------------------------------- minhash recall

def test_minhash_recall_floor_on_planted_corpus(spark):
    from cir_duplicate_detector_spark.plans.extension_queries import (
        q_minhash_recall,
    )

    rows = q_minhash_recall(spark, "/root/testdata/sf0.001").collect()
    assert rows, "planted corpus must yield probe near-dup pairs"
    n_true = sum(r.n_true for r in rows)
    n_found = sum(r.n_found for r in rows)
    # The derived corpus plants high-Jaccard mutants; 16 bands x 8 rows
    # at J>=0.5 keeps collision probability near 1, so micro-recall must
    # stay >= 0.9 (found is a subset of truth by construction).
    assert all(0.0 <= r.recall <= 1.0 for r in rows)
    assert n_found / n_true >= 0.9


def test_kmeans_ivf_assign_two_level_contract(spark):
    from cir_duplicate_detector_spark.operators import kmeans

    # two tight blobs far apart; sample_mod=2 learns coarse on half the
    # corpus, fine_mod=4 makes every 4th vector a fine centroid of its
    # coarse cell.
    rows = []
    for i in range(16):
        rows.append((i, [10.0 + 0.01 * i] * 64))
        rows.append((100 + i, [-10.0 - 0.01 * i] * 64))
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = kmeans.kmeans_ivf_assign(
        embs, k=2, iters=2, sample_mod=2, fine_mod=4
    ).collect()
    assert len(out) == 32
    # coarse assignment separates the blobs exactly
    by_blob = {}
    for r in out:
        by_blob.setdefault(r.vec_id < 100, set()).add(r.coarse)
    assert by_blob[True].isdisjoint(by_blob[False])
    # fine centroids live in the SAME coarse cell as their members: a
    # fine id of a +blob member must itself be a +blob vector (ids are
    # disjoint across blobs), and d is the in-cell distance
    coarse_of = {r.vec_id: r.coarse for r in out}
    for r in out:
        if r.fine == -1:
            assert r.d is None
            continue
        assert coarse_of[r.fine] == r.coarse
        assert r.fine % 4 == 0
        assert r.d is not None and r.d < 64 * 0.1


def test_kmeans_ivf_assign_prebuilt_coarse_identical(spark, tmp_path):
    # The family-shared persisted coarse-centroid table
    # (plans.ext_ann._shared_coarse_centroids) is sound only if
    # assigning against a parquet round-trip of the learned table gives
    # EXACTLY the in-session result (doubles serialize exactly), for
    # both kmeans_ivf_assign and knn_ivf_learned.
    from pyspark.sql import functions as F

    from cir_duplicate_detector_spark.operators import kmeans, similarity

    rows = []
    for i in range(16):
        rows.append((i, [10.0 + 0.01 * i] * 64))
        rows.append((100 + i, [-10.0 - 0.01 * i] * 64))
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    sample = embs.where(F.col("vec_id") % 2 == 0)
    cents = kmeans.kmeans_centroids(sample, k=2, iters=2).select(
        F.col("cluster").alias("coarse"), "c"
    )
    direct = kmeans.kmeans_ivf_assign(
        embs, k=2, iters=2, sample_mod=2, fine_mod=4
    ).collect()
    cents.write.parquet(str(tmp_path / "cents"))
    reread = spark.read.parquet(str(tmp_path / "cents"))
    served = kmeans.kmeans_ivf_assign(
        embs, fine_mod=4, coarse=reread
    ).collect()

    def rows_of(rs):
        return sorted((r.vec_id, r.coarse, r.fine, r.d) for r in rs)

    assert rows_of(direct) == rows_of(served)

    probe = embs.select("vec_id").where("vec_id % 8 = 0")
    knn_direct = similarity.knn_ivf_learned(
        embs, probe, k=3, coarse_k=2, iters=2, sample_mod=2
    ).collect()
    knn_served = similarity.knn_ivf_learned(
        embs,
        probe,
        k=3,
        centroids=reread.select(F.col("coarse").alias("cluster"), "c"),
    ).collect()

    def knn_rows(rs):
        return sorted(
            (r.query_id, r.rank, r.neighbor_id, r.cosine) for r in rs
        )

    assert knn_rows(knn_direct) == knn_rows(knn_served)


def test_kmeans_ivf_assign_marks_fine_less_cells(spark):
    from cir_duplicate_detector_spark.operators import kmeans

    # Ids are chosen so one group carries fine samples (% 4 == 0) and
    # the other carries none; whatever cells Lloyd lands on, the
    # CONTRACT is: a row gets fine=-1 / d NULL iff its coarse cell
    # contains no fine-sample vector, else a real in-cell fine id.
    rows = [(i, [10.0] * 64) for i in (0, 4, 8, 12)]
    rows += [(i, [-10.0] * 64) for i in (101, 102, 103)]
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = kmeans.kmeans_ivf_assign(
        embs, k=2, iters=1, sample_mod=1, fine_mod=4
    ).collect()
    assert len(out) == 7
    cells_with_fine = {
        r.coarse for r in out if r.vec_id % 4 == 0
    }
    for r in out:
        if r.coarse in cells_with_fine:
            assert r.fine != -1 and r.fine % 4 == 0 and r.d is not None
        else:
            assert r.fine == -1 and r.d is None


def test_kmeans_unrolled_iters_ceiling(spark):
    import pytest as _pytest

    from cir_duplicate_detector_spark.operators import kmeans

    embs = spark.createDataFrame(
        [(0, [0.0] * 64)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="unrolled-plan ceiling"):
        kmeans.kmeans_centroids(embs, iters=9)


def test_kmeans_ivf_default_k_is_sqrt_scaled(spark):
    from cir_duplicate_detector_spark.operators import kmeans

    rows = [(i, [float(i % 7)] * 64) for i in range(64)]
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    # sample_mod=1 -> sample is the full corpus -> default k = isqrt(64) = 8
    assert kmeans.sqrt_sample_k(embs) == 8
    out = kmeans.kmeans_ivf_assign(embs, sample_mod=1, iters=1).collect()
    coarse_ids = {r.coarse for r in out}
    assert len(out) == 64
    assert coarse_ids <= set(range(8)), "coarse ids must come from k=isqrt(N) seeds"


# -------------------------------------------------------------- BM25

def test_bm25_rational_idf_rare_term_outranks(spark):
    # d3 matches BOTH query terms (and the rarer one twice); docs
    # matching only the common term 'a' score below it.
    docs = _docs(
        spark,
        [(1, "a b"), (2, "a"), (3, "a c c"), (4, "b b")],
    )
    panel = spark.createDataFrame(
        [(1, "a"), (1, "c")], "query_id long, term string"
    )
    out = textops.bm25_search(docs, panel, topk=10).collect()
    by_rank = {r.rank: r for r in out}
    assert by_rank[1].doc_id == 3 and by_rank[1].n_terms_hit == 2
    assert all(r.score > 0 for r in out)
    assert sorted(r.rank for r in out) == list(range(1, len(out) + 1))


def test_bm25_score_matches_hand_formula(spark):
    # One query term, hand-replicated expression tree: the engine
    # score must equal the Python float EXACTLY (the bit-reproducible
    # claim of the rational-idf form).
    docs = _docs(spark, [(1, "a a b"), (2, "b c")])
    panel = spark.createDataFrame([(7, "a")], "query_id long, term string")
    out = {r.doc_id: r for r in textops.bm25_search(docs, panel).collect()}
    n_docs, total = 2, 5
    tf, dl, df_ = 2, 3, 1
    k1, b = textops.BM25_K1, textops.BM25_B
    idf = ((n_docs - df_) + 0.5) / (df_ + 0.5)
    tfnorm = (tf * (k1 + 1.0)) / (
        tf + (k1 * ((1.0 - b) + ((b * dl) / (total / n_docs))))
    )
    assert out[1].score == idf * tfnorm
    assert out[1].rank == 1 and out[1].n_terms_hit == 1
    assert 2 not in out  # no query term -> absent, not zero-scored


# ------------------------------------------- LSH index round-trip

def test_lsh_index_roundtrip_identity(spark, tmp_path):
    # The screen served from the parquet-persisted band index must
    # answer byte-identically to the in-session screen.
    existing = _docs(
        spark,
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely different content about spark partitions")],
    )
    incoming = _docs(
        spark,
        [(10, "the quick brown fox jumps over the lazy dog today"),
         (11, "unrelated third text with novel words entirely here")],
    )
    live = {
        r.doc_id: (r.n_bands_hit, r.lsh_hit)
        for r in dedup.lsh_screen(existing, incoming).collect()
    }
    idx = dedup.lsh_band_index(existing)
    d = str(tmp_path / "bands")
    idx.write.mode("overwrite").parquet(d)
    served = {
        r.doc_id: (r.n_bands_hit, r.lsh_hit)
        for r in dedup.lsh_screen_from_index(
            spark.read.parquet(d), incoming
        ).collect()
    }
    assert served == live
    assert live[10][1] and not live[11][1]  # exact copy hits, novel text misses


# -------------------------------------- semantic decontamination

def test_semantic_cross_decontaminate_planted(spark):
    # Two orthogonal directions; eval doc 103 is a near-copy of train
    # doc 1 (cosine ~ 1), eval doc 58 is orthogonal to everything in
    # its cell's train side. Quantizer learns from train only.
    def vec(axis, eps=0.0):
        v = [0.0] * 64
        v[axis] = 1.0
        v[(axis + 1) % 64] = eps
        return v

    # eval split: vec_id % 11 == 3 -> 58 % 11 == 3, 103 % 11 == 4? No:
    # choose ids explicitly below.
    rows = [
        (1, vec(0)),          # train, direction e0
        (2, vec(0, 0.01)),    # train, direction e0
        (7, vec(32)),         # train, direction e32
        (9, vec(32, 0.01)),   # train, direction e32
        (14, vec(0, 0.02)),   # eval (14 % 11 == 3): near train docs 1,2
        (25, vec(16)),        # eval (25 % 11 == 3): orthogonal to all
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    pred = F.col("vec_id") % 11 == 3
    # fine_mod > |train|: no fine sample, cells pair at the coarse
    # level (fine = -1). With fine_mod=1 every train vector becomes a
    # fine centroid and (1, 14) splits across fine cells — the
    # SemDeDup blindness `semantic_decon_recall` measures, exercised
    # deliberately in the second half below.
    out = similarity.semantic_cross_decontaminate(
        emb, pred, threshold=0.9, k=2, iters=1, sample_mod=1, fine_mod=1000
    ).collect()
    pairs = {(r.train_id, r.eval_id) for r in out}
    assert (1, 14) in pairs and (2, 14) in pairs
    assert all(e == 14 for _, e in pairs)  # 25 contaminates nothing
    assert all(r.cosine >= 0.9 for r in out)
    assert all(r.train_id % 11 != 3 for r in out)
    # fine_mod=1: every train vector is a fine centroid, eval 14
    # resolves to doc 2's cell — (1, 14) is now split across fine
    # cells and invisible to the screen (the measured trade).
    fine_out = similarity.semantic_cross_decontaminate(
        emb, pred, threshold=0.9, k=2, iters=1, sample_mod=1, fine_mod=1
    ).collect()
    fine_pairs = {(r.train_id, r.eval_id) for r in fine_out}
    assert fine_pairs == {(2, 14)}


def test_bm25_route_static_stats_and_df0(spark):
    # Index side: 2 docs, term 'a' in one of them, 'q' in neither.
    # Incoming doc matches both panel terms; 'q' takes the df=0
    # maximum-rarity idf. Scores must equal the hand formula exactly.
    index = _docs(spark, [(2, "a b b"), (4, "b c")])
    incoming = _docs(spark, [(1, "a q q")])
    panel = spark.createDataFrame(
        [(1, "a"), (1, "q")], "query_id long, term string"
    )
    stats, df_rel = textops.bm25_index_stats(index, panel)
    out = textops.bm25_route(incoming, panel, stats, df_rel).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_id, r.query_id, r.n_terms_hit) == (1, 1, 2)
    k1, b = textops.BM25_K1, textops.BM25_B
    n_docs, total = 2, 5  # index side only
    dl = 3  # incoming doc's own length

    def s(tf, df):
        idf = ((n_docs - df) + 0.5) / (df + 0.5)
        return idf * (
            (tf * (k1 + 1.0))
            / (tf + (k1 * ((1.0 - b) + ((b * dl) / (total / n_docs)))))
        )

    assert r.score == s(1, 1) + s(2, 0)  # term order: 'a' then 'q'


def test_decontaminate_scrub_removes_aligned_and_offset_spans(spark):
    # Train doc 1's FIRST 4-token span appears verbatim inside the eval
    # doc at an OFFSET alignment (eval side indexes overlapping spans);
    # its second span is clean and survives. Doc 2 is untouched.
    train = _docs(
        spark,
        [
            (1, "w x y z keep these four words"),
            (2, "totally clean text here"),
        ],
    )
    ev = _docs(spark, [(100, "lead-in w x y z trailing")])
    out = {
        r.doc_id: r
        for r in textops.decontaminate_scrub(train, ev, window=4).collect()
    }
    assert out[1].n_tokens == 8 and out[1].n_kept_tokens == 4
    assert out[1].clean_text == "keep these four words"
    assert out[2].n_kept_tokens == out[2].n_tokens == 4
    assert out[2].clean_text == "totally clean text here"


def test_decontaminate_scrub_fully_contaminated_doc_kept_empty(spark):
    train = _docs(spark, [(1, "a b c d")])
    ev = _docs(spark, [(100, "a b c d")])
    out = textops.decontaminate_scrub(train, ev, window=4).collect()
    assert [(r.doc_id, r.n_kept_tokens, r.clean_text) for r in out] == [
        (1, 0, "")
    ]


def test_label_upsert_adopts_existing_labels(spark):
    # Incoming near-dups adopt the EXISTING cluster's label (min-label,
    # singleton fallback = existing doc_id); unmatched self-label.
    from cir_duplicate_detector_spark.operators import dedup

    t_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    t_b = "one two three four five six seven eight nine ten eleven " * 4
    t_c = "red orange yellow green blue indigo violet crimson amber " * 4
    existing = spark.createDataFrame(
        [(0, t_a), (1, t_a), (2, t_b)], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [(10, t_a), (11, t_c), (12, t_b)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in dedup.label_upsert(existing, incoming).collect()}
    assert len(out) == 3
    assert out[10].matched and out[10].label == 0  # joins cluster {0,1}
    assert not out[11].matched and out[11].label == 11  # self-label
    assert out[12].matched and out[12].label == 2  # existing singleton
    # prebuilt labels path gives the identical answer (the persisted
    # snapshot serving shape)
    pairs = dedup.minhash_near_duplicates(existing, 0.5).select("a", "b")
    labels = dedup.connected_components(pairs, check_every=2)
    served = {
        r.doc_id: r
        for r in dedup.label_upsert(existing, incoming, labels=labels).collect()
    }
    assert {k: (v.label, v.matched) for k, v in out.items()} == {
        k: (v.label, v.matched) for k, v in served.items()
    }


def test_label_compact_churn_categories(spark):
    # The full-closure compaction realizes exactly what the per-wave
    # labeler defers: batch-internal pairs (adopted_internal) and
    # merges/renames via bridge docs (merged) — while untouched docs
    # stay 'unchanged'. Labels only ever move DOWN (union graph is a
    # supergraph of the wave's existing-only view).
    from cir_duplicate_detector_spark.operators import dedup

    t_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    t_b = "one two three four five six seven eight nine ten eleven " * 4
    t_c = "red orange yellow green blue indigo violet crimson amber " * 4
    t_e = "north south east west up down left right front back mid " * 4
    existing = spark.createDataFrame(
        [(0, t_a), (1, t_a), (4, t_b)], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [(3, t_b), (10, t_a), (11, t_c), (12, t_c), (13, t_b), (20, t_e)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup.label_compact(existing, incoming).collect()
    }
    assert len(out) == 9
    # existing cluster {0,1} untouched
    assert (out[0].label, out[0].churn) == (0, "unchanged")
    assert (out[1].label, out[1].churn) == (0, "unchanged")
    assert not out[0].is_incoming
    # existing singleton 4: incoming 3 (smaller id) joins its cluster,
    # so the full-closure label moves down — a rename the wave could
    # not see (it had adopted label 4).
    assert (out[4].old_label, out[4].label, out[4].churn) == (
        4, 3, "merged",
    )
    assert (out[3].old_label, out[3].label, out[3].churn) == (
        4, 3, "merged",
    )
    assert (out[13].old_label, out[13].label, out[13].churn) == (
        4, 3, "merged",
    )
    # matched incoming whose wave label survives compaction
    assert (out[10].old_label, out[10].label, out[10].churn) == (
        0, 0, "unchanged",
    )
    # batch-internal pair the wave deliberately skipped
    assert (out[11].label, out[11].churn) == (11, "adopted_internal")
    assert (out[12].label, out[12].churn) == (11, "adopted_internal")
    # true singleton
    assert (out[20].label, out[20].churn) == (20, "unchanged")
    assert out[20].is_incoming


def test_label_compact_reconciles_agreement(spark):
    # VERDICT r11 item 2's done-criterion: the agreement diagnostic's
    # deferred-merge and deferred-transitive-adoption counts must equal
    # the compaction's churn counts — two independent implementations
    # of the same contract (per-doc joins vs CASE classification)
    # agreeing on the real derived corpus.
    from cir_duplicate_detector_spark.plans.ext_dedup import (
        q_dup_labels_compact,
        q_upsert_labels_agreement,
    )

    sf = "/root/testdata/sf0.001"
    agree = q_upsert_labels_agreement(spark, sf).collect()
    compact = q_dup_labels_compact(spark, sf).collect()
    deferred_merges = sum(
        1 for r in agree if r.matched and not r.label_equals_full
    )
    transitive_adoptions = sum(
        1 for r in agree if not r.matched and r.reaches_existing
    )
    inc = [r for r in compact if r.is_incoming]
    assert deferred_merges == sum(1 for r in inc if r.churn == "merged")
    assert transitive_adoptions == sum(
        1 for r in inc if r.churn == "adopted_existing"
    )
    # and the wave adoptions the compaction reports as unchanged really
    # are the agreement's label_equals_full rows
    agree_ok = {r.doc_id for r in agree if r.matched and r.label_equals_full}
    compact_ok = {
        r.doc_id for r in inc if r.churn == "unchanged" and r.old_label != r.doc_id
    }
    assert compact_ok <= agree_ok
