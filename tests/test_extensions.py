"""Semantic tests for the pipeline-extension operators (the oracle
parity suite checks engine-vs-DuckDB equivalence; these check the
operators do the *right thing* on planted structures).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from cir_duplicate_detector_spark.operators import (
    dedup,
    events,
    multimodal,
    similarity,
    textops,
)
from cir_duplicate_detector_spark.sources.derived import derive_near_dup_corpus
from cir_duplicate_detector_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"

DOCS_SCHEMA = "doc_id bigint, text string"


def test_exact_duplicates_planted(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "aa bb cc"), (3, "unique text"), (4, "aa bb cc")],
        DOCS_SCHEMA,
    )
    got = dedup.exact_duplicates(docs).collect()
    assert len(got) == 1
    assert got[0]["members"] == [1, 2, 4]
    assert got[0]["group_size"] == 3


def test_minhash_finds_mutants(spark):
    docs = derive_near_dup_corpus(load_table(spark, SF_DIR, "documents"))
    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.minhash_near_duplicates(docs, threshold=0.5).collect()
    }
    # Exact copies (doc_id % 11 == 0 -> +2_000_000) have jaccard 1.0.
    assert pairs[(0, 2_000_000)] == 1.0
    assert pairs[(11, 2_000_011)] == 1.0
    # Truncation mutants (doc_id % 5 == 0 -> +1_000_000) are near 1.
    assert pairs[(5, 1_000_005)] > 0.7


def test_simhash_identical_for_copies(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
         (3, "a completely different sentence here")],
        DOCS_SCHEMA,
    )
    sig = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(docs).collect()}
    assert sig[1] == sig[2]
    assert sig[1] != sig[3]
    assert 0 <= sig[1] < (1 << 60)


def test_knn_self_similarity_excluded_and_ranked(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    out = similarity.knn_bruteforce(emb, [0, 20], k=3).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r["query_id"], []).append(r)
    for q, rows in by_query.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3]
        sims = [r["cosine"] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)


def test_knn_lsh_subset_of_bruteforce_space(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    lsh = similarity.knn_lsh(emb, [0, 20, 40], k=5).collect()
    # bucket-local: every returned neighbor shares the probe's sketch,
    # ranks are contiguous from 1
    for q in {r["query_id"] for r in lsh}:
        ranks = sorted(r["rank"] for r in lsh if r["query_id"] == q)
        assert ranks == list(range(1, len(ranks) + 1))


def test_sessionize_gap_semantics(spark):
    us = 1_000_000
    rows = [
        # user 1: two events 10 min apart (one session), then 40 min gap
        (1, 1, 0 * us, 10.0),
        (2, 1, 600 * us, 10.0),
        (3, 1, 3000 * us, 5.0),
        # user 2: single event
        (4, 2, 0 * us, 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_us bigint, value double"
    )
    got = {
        (r["user_id"], r["session_id"]): r
        for r in events.sessionize(ev, gap_us=events.SESSION_GAP_US).collect()
    }
    assert len(got) == 3
    assert got[(1, 0)]["n_events"] == 2
    assert got[(1, 1)]["n_events"] == 1
    assert got[(2, 0)]["n_events"] == 1
    assert got[(1, 0)]["sum_value"] == 20.0


def test_multimodal_features_match_hashlib(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(5)
    media = multimodal.to_media(docs)
    feats = multimodal.extract_features(media).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(feats) == 5
    for r in feats:
        raw = texts[r["doc_id"]].encode("utf-8")
        assert r["n_bytes"] == len(raw)
        assert r["content_md5"] == hashlib.md5(raw).hexdigest()
        assert r["feature60"] == int(hashlib.md5(raw).hexdigest()[:15], 16)


def test_lang_id_deterministic_ties(spark):
    docs = spark.createDataFrame(
        [(1, "the cat and the dog"), (2, "el perro y la casa de que"),
         (3, "xyzzy plugh")],
        DOCS_SCHEMA,
    )
    got = {r["doc_id"]: r["lang_pred"] for r in textops.lang_id(docs).collect()}
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "und"


def test_fingerprint_shape(spark):
    docs = spark.createDataFrame([(1, "abcdefghijklmno")], DOCS_SCHEMA)
    got = textops.doc_fingerprint(docs).collect()
    assert [r["fp_rank"] for r in sorted(got, key=lambda r: r["fp_rank"])] == [
        1,
        2,
        3,
        4,
    ]
    hashes = [r["fp_hash"] for r in sorted(got, key=lambda r: r["fp_rank"])]
    assert hashes == sorted(hashes)


def test_image_resize_box_filters_decoded_pixels(spark):
    # 2x2 image with one bright and three dark pixels: the 2x resize
    # must produce ONE pixel whose channels are the integer-floor block
    # means of the DECODED values — and the output must be a valid,
    # re-decodable P6 payload.
    from cir_duplicate_detector_spark.operators.multimodal import decode_ppm

    px = [(200, 100, 40), (0, 0, 0), (0, 0, 0), (0, 0, 2)]
    payload = _ppm(2, 2, px, comment=b"bytes differ, pixels rule")
    media = spark.createDataFrame(
        [(1, "image/x-portable-pixmap", payload, len(payload))],
        "doc_id bigint, media_type string, payload binary, n_bytes bigint",
    )
    got = multimodal.image_resize(media, factor=2).collect()[0]
    assert (got.orig_width, got.orig_height) == (2, 2)
    assert (got.width, got.height) == (1, 1)
    out = bytes.fromhex(got.resized_hex)
    arr = decode_ppm(out)
    assert arr.shape == (1, 1, 3)
    assert arr[0, 0].tolist() == [50, 25, 10]  # floor means incl. 42//4


def test_video_frame_ahash_parses_and_strides(spark):
    # Three concatenated 2x2 frames; stride 2 keeps frames 0 and 2.
    # Frame hashes must match the single-image feature on the same
    # pixels (shared rule), and frame 1 must be skipped.
    bright = [(200, 200, 200)] * 2 + [(10, 10, 10)] * 2
    frames = [
        _ppm(2, 2, bright),
        _ppm(2, 2, [(1, 2, 3)] * 4, comment=b"skipped"),
        _ppm(2, 2, list(reversed(bright))),
    ]
    payload = b"".join(frames)
    media = spark.createDataFrame(
        [(7, "video/x-ppm-stream", payload, len(payload))],
        "doc_id bigint, media_type string, payload binary, n_bytes bigint",
    )
    got = {
        r.frame_no: r
        for r in multimodal.video_frame_ahash(
            media, stride=2, grid=2
        ).collect()
    }
    assert sorted(got) == [0, 2]
    assert got[0].width == 2 and got[0].height == 2
    assert got[0].ahash_bits == "1100"
    assert got[2].ahash_bits == "0011"


def test_knn_ivf_ranked_and_self_excluded(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    out = similarity.knn_ivf(emb, [0, 40], k=3).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r["query_id"], []).append(r)
    assert set(by_query) == {0, 40}
    for q, rows in by_query.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(ranks) + 1))
        assert all(r["neighbor_id"] != q for r in rows)


def test_asof_join_prior_purchase(spark):
    # Replicates the registered as-of operator on a hand-built frame.
    from pyspark.sql import Window

    us = 1_000_000
    rows = [
        (1, 1, 0 * us, "purchase"),
        (2, 1, 10 * us, "click"),     # after purchase @0
        (3, 1, 20 * us, "purchase"),
        (4, 1, 30 * us, "click"),     # after purchase @20
        (5, 2, 5 * us, "click"),      # user 2 never purchased -> null
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_us bigint, event_type string"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_p = F.last(
        F.when(F.col("event_type") == "purchase", F.col("ts_us")),
        ignorenulls=True,
    ).over(w)
    got = {
        r["event_id"]: r["lp"]
        for r in ev.withColumn("lp", last_p)
        .where(F.col("event_type") == "click")
        .collect()
    }
    assert got[2] == 0 * us
    assert got[4] == 20 * us
    assert got[5] is None


def test_connected_components_transitive_closure(spark):
    # chain 1-2-3 (1,3 never directly paired) + isolated pair 10-11;
    # node 4 appears in no pair and must not appear in the output.
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "a bigint, b bigint"
    )
    got = {
        r["node"]: r["label"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    # a 40-node path graph needs the pointer-jump acceleration to
    # converge inside max_iter (plain propagation would need 40 rounds)
    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a bigint, b bigint"
    )
    labels = dedup.connected_components(pairs, max_iter=12).collect()
    assert {r["label"] for r in labels} == {0}
    assert len(labels) == n + 1


def test_pii_redact_counts_and_replaces(spark):
    docs = spark.createDataFrame(
        [(1, "mail bob@example.com or call 555-1234 from 10.0.3.21 ok"),
         (2, "no pii here at all")],
        DOCS_SCHEMA,
    )
    got = {r["doc_id"]: r for r in textops.pii_redact(docs).collect()}
    assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["n_ips"]) == (1, 1, 1)
    assert got[1]["redacted"] == "mail <EMAIL> or call <PHONE> from <IP> ok"
    assert got[2]["redacted"] == "no pii here at all"
    assert (got[2]["n_emails"], got[2]["n_phones"], got[2]["n_ips"]) == (0, 0, 0)


def test_ngram_topk_ranking(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a b", "en"), (2, "a b c d", "en"), (3, "x y x y", "de")],
        "doc_id bigint, text string, lang string",
    )
    got = textops.ngram_topk(docs, n=2, k=2).collect()
    en = {r["rank"]: (r["gram"], r["cnt"]) for r in got if r["lang"] == "en"}
    # "a b" appears 3x in doc1 + 1x in doc2; "b a" 2x in doc1.
    assert en[1] == ("a b", 4)
    assert en[2] == ("b a", 2)
    assert {r["gram"] for r in got if r["lang"] == "de"} == {"x y", "y x"}


def test_incremental_dedup_admits_only_new(spark):
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "an entirely different corpus document body here")],
        DOCS_SCHEMA,
    )
    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog today"),  # exact
         (11, "the quick brown fox jumps over the lazy dog"),        # near
         (12, "zq wv zq xk pj completely novel content mn bb")],     # new
        DOCS_SCHEMA,
    )
    kept = {r["doc_id"] for r in dedup.incremental_dedup(corpus, batch).collect()}
    assert kept == {12}


def test_normalized_exact_dedup_merges_reformatted(spark):
    docs = spark.createDataFrame(
        [(1, "Hello, World!  How are you?"),
         (2, "hello world how are you"),
         (3, 'HELLO   "world";  how are YOU'),
         (4, "a different document entirely")],
        DOCS_SCHEMA,
    )
    got = dedup.exact_duplicates_normalized(docs).collect()
    assert len(got) == 1
    assert sorted(got[0]["members"]) == [1, 2, 3]
    # Byte-exact dedup sees nothing to merge on the same input.
    assert dedup.exact_duplicates(docs).count() == 0


def test_url_domain_extraction(spark):
    from cir_duplicate_detector_spark.functions.url import url_domain

    rows = spark.createDataFrame(
        [("https://WWW.Example.com:8080/path?q=1#frag",),
         ("example.com/path",),
         ("http://sub.example.org;",),
         ("www.plain.net",)],
        "url string",
    )
    got = [r[0] for r in rows.select(url_domain("url")).collect()]
    assert got == ["example.com", "example.com", "sub.example.org", "plain.net"]


def test_pq_codes_compress_and_adc_ranks_near_vector_first(spark):
    from cir_duplicate_detector_spark.operators import pq

    emb = load_table(spark, SF_DIR, "embeddings")
    codebook = pq.pq_codebook(emb)
    # Codebook is BOUNDED: at most M * n_codewords rows no matter the
    # corpus size (the scale property; a corpus-fraction sample
    # degenerated encode to O(N^2) — measured 66x on a 10x corpus).
    assert codebook.count() <= pq.PQ_M * pq.PQ_CODEWORDS
    codes = pq.pq_encode(emb, codebook)
    n = emb.count()
    # Every vector gets exactly M codes.
    assert codes.count() == n * pq.PQ_M
    # A codeword vector encodes to itself in every subspace (its own
    # subvector is at distance 0; ties break to the smallest cid).
    cw_ids = {r[0] for r in codebook.select("cid").distinct().collect()}
    own = (
        codes.where(F.col("vec_id").isin(list(cw_ids)))
        .where(F.col("vec_id") != F.col("code"))
        .count()
    )
    assert own == 0


def test_pq_codebook_learned_converges_to_blob_means(spark):
    # Two far blobs; seeds (smallest-2 vec_ids) land one in each blob,
    # so a Lloyd round must move each codeword to its blob's per-
    # subspace mean — proof the codebook is LEARNED from member
    # geometry, not the raw seed sample pq_codebook returns.
    from cir_duplicate_detector_spark.operators import pq

    lo = [(i, [0.0 + i * 0.01] * 64) for i in range(0, 8, 2)]   # ids 0,2,4,6
    hi = [(i, [10.0 + i * 0.01] * 64) for i in range(1, 8, 2)]  # ids 1,3,5,7
    emb = spark.createDataFrame(
        lo + hi, "vec_id long, embedding array<double>"
    )
    cb = pq.pq_codebook_learned(emb, n_codewords=2, iters=2)
    rows = cb.collect()
    # Bounded: exactly M rows per codeword, cluster ids = seed vec_ids.
    assert len(rows) == pq.PQ_M * 2
    assert {r.cid for r in rows} == {0, 1}
    lo_mean = sum(v for _, vec in lo for v in vec[:1]) / len(lo)
    hi_mean = sum(vec[0] for _, vec in hi) / len(hi)
    for r in rows:
        want = lo_mean if r.cid == 0 else hi_mean
        assert len(r.csub) == pq.PQ_SUBDIM
        for v in r.csub:
            assert abs(v - want) < 0.2  # blob spread is ±0.07
    # Still bounded by M*K on the real table regardless of corpus size.
    emb_t = load_table(spark, SF_DIR, "embeddings")
    assert (
        pq.pq_codebook_learned(emb_t).count()
        <= pq.PQ_M * pq.PQ_CODEWORDS
    )


def test_knn_ivf_pq_contract_and_l2_bruteforce_exact(spark):
    from cir_duplicate_detector_spark.operators import pq

    emb = load_table(spark, SF_DIR, "embeddings")
    probe = emb.select("vec_id").where("vec_id % 100 = 0")
    out = pq.knn_ivf_pq(emb, probe, k=5, n_codewords=32).collect()
    by_q: dict = {}
    for r in out:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 100, 200, 300, 400}
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 5
        dists = [r.adc_dist for r in rows]
        assert dists == sorted(dists)  # rank follows ADC distance

    # Exact-L2 ground truth: rank 1 for a planted twin pair must be
    # each other, distances exact.
    twin = spark.createDataFrame(
        [
            (1, [1.0] * 64),
            (2, [1.0] * 63 + [1.5]),
            (3, [5.0] * 64),
        ],
        "vec_id long, embedding array<double>",
    )
    bf = {
        (r.query_id, r.rank): r
        for r in pq.knn_l2_bruteforce(twin, [1, 2], k=2).collect()
    }
    assert bf[(1, 1)].neighbor_id == 2 and bf[(1, 1)].l2sq == 0.25
    assert bf[(2, 1)].neighbor_id == 1 and bf[(2, 1)].l2sq == 0.25
    assert bf[(1, 2)].neighbor_id == 3

    # Exact re-rank: hand the refine stage a shortlist whose ADC order
    # is wrong-by-construction (3 before 2); true L2 must flip it.
    short = spark.createDataFrame(
        [(1, 3), (1, 2)], "query_id long, neighbor_id long"
    )
    ref = {r.rank: r for r in pq.pq_refine(twin, short, k=2).collect()}
    assert ref[1].neighbor_id == 2 and ref[1].l2sq == 0.25
    assert ref[2].neighbor_id == 3


def test_ivf_pq_index_roundtrip_identical(spark, tmp_path):
    # The build-once shared index (plans.ext_ann._shared_ivfpq_index)
    # is sound only if persist→read answers EXACTLY like the in-session
    # build — same rows, same ranks, same distances. Small config keeps
    # the double arithmetic identical through the parquet round-trip
    # (doubles serialize exactly).
    from cir_duplicate_detector_spark.operators import pq

    emb = load_table(spark, SF_DIR, "embeddings")
    probe = emb.select("vec_id").where("vec_id % 100 = 0")
    built = pq.build_ivf_pq_index(emb, n_codewords=32)
    direct = pq.knn_ivf_pq_from_index(built, emb, probe, k=5).collect()
    pq.persist_ivf_pq_index(built, str(tmp_path / "idx"))
    reopened = pq.read_ivf_pq_index(spark, str(tmp_path / "idx"))
    served = pq.knn_ivf_pq_from_index(reopened, emb, probe, k=5).collect()

    def rows(rs):
        return sorted(
            (r.query_id, r.rank, r.neighbor_id, r.adc_dist) for r in rs
        )

    assert rows(direct) == rows(served)
    # And the composed knn_ivf_pq (build+probe in one call) agrees too.
    composed = pq.knn_ivf_pq(emb, probe, k=5, n_codewords=32).collect()
    assert rows(composed) == rows(direct)


def test_ivf_pq_upsert_merge_serves_fresh(spark):
    # The continuous-ingest claim behind hybrid_search_fresh: a wave
    # upserted into a prebuilt index (assign to existing cells +
    # residual-encode against the existing codebook, pure relation
    # union) becomes retrievable through the unchanged probe path. The
    # base index alone can only ever answer with indexed (even-id)
    # neighbors; the merged index surfaces fresh (odd-id) ones. The
    # full merged-equals-rebuilt identity is pinned by the registered
    # query's oracle (train_pred-restricted chain).
    from cir_duplicate_detector_spark.operators import pq

    emb = load_table(spark, SF_DIR, "embeddings")
    base = pq.build_ivf_pq_index(
        emb.where("vec_id % 2 = 0"), n_codewords=32
    )
    a_new, c_new = pq.ivf_pq_upsert(base, emb.where("vec_id % 2 = 1"))
    merged = pq.merge_ivf_pq_index(base, a_new, c_new)
    probe = emb.select("vec_id").where("vec_id % 100 = 0")
    res_base = pq.knn_ivf_pq_from_index(base, emb, probe, k=5).collect()
    res_merged = pq.knn_ivf_pq_from_index(
        merged, emb, probe, k=5
    ).collect()
    assert res_base and all(r.neighbor_id % 2 == 0 for r in res_base)
    assert any(r.neighbor_id % 2 == 1 for r in res_merged)
    # Upsert is deterministic (broadcast argmin + tie-to-smaller-cid
    # encode): a second pass produces identical relations.
    a2, c2 = pq.ivf_pq_upsert(base, emb.where("vec_id % 2 = 1"))
    assert sorted(map(tuple, a_new.collect())) == sorted(
        map(tuple, a2.collect())
    )
    assert sorted((r.vec_id, tuple(r.ca)) for r in c_new.collect()) == (
        sorted((r.vec_id, tuple(r.ca)) for r in c2.collect())
    )


def test_image_index_roundtrip_identical(spark, tmp_path):
    # The persisted ahash band index must answer EXACTLY like the
    # in-session build — the soundness claim behind the registered
    # image_index_roundtrip identity guard (and copies must hit, fresh
    # rasters may legitimately miss).
    def media(rows):
        return spark.createDataFrame(
            [
                (i, multimodal.PPM_MEDIA_TYPE, bytearray(p), len(p))
                for i, p in rows
            ],
            "doc_id long, media_type string, payload binary, n_bytes long",
        )

    def raster(seed):
        return _ppm(
            8, 8, [((seed * (i + 3)) % 256,) * 3 for i in range(64)]
        )

    existing = media([(i, raster(i + 1)) for i in range(12)])
    incoming = media(
        [(100 + i, raster(i + 1)) for i in range(6)]  # exact copies
        + [(200 + i, raster(97 + i)) for i in range(6)]  # fresh
    )
    idx = multimodal.image_band_index(existing)
    direct = multimodal.image_screen_from_index(
        idx, incoming, index_is_distinct=True
    ).collect()
    idx.write.parquet(str(tmp_path / "bands"))
    served = multimodal.image_screen_from_index(
        spark.read.parquet(str(tmp_path / "bands")),
        incoming,
        index_is_distinct=True,
    ).collect()

    def rows(rs):
        return sorted((r.doc_id, r.n_bands_hit, r.img_hit) for r in rs)

    assert rows(direct) == rows(served)
    by_id = {r.doc_id: r for r in direct}
    for i in range(6):  # every exact copy hits all 8 bands
        assert by_id[100 + i].n_bands_hit == 8 and by_id[100 + i].img_hit
    # And the composed image_screen agrees too.
    composed = multimodal.image_screen(existing, incoming).collect()
    assert rows(composed) == rows(direct)


def test_retention_cohorts_ages_and_sizes(spark):
    DAY = events.DAY_US
    rows = [
        # user 1: cohort day 0, active days 0/1/3 (two events day 0 —
        # distinct-day dedup must count them once)
        (1, 0), (1, DAY // 2), (1, DAY + 1), (1, 3 * DAY),
        # user 2: cohort day 0, active days 0/1
        (2, 5), (2, DAY + 7),
        # user 3: first seen day 1 — a DIFFERENT cohort, age 0 only
        (3, DAY + 9),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_us long")
    got = {
        (r.cohort_start_us, r.age_days): r.n_users
        for r in events.retention_cohorts(ev).collect()
    }
    assert got == {
        (0, 0): 2, (0, 1): 2, (0, 3): 1,
        (DAY, 0): 1,
    }


def test_ivf_assign_incoming_uses_base_structure_only(spark):
    # Incoming vectors must land in the BASE corpus's cell structure:
    # every fine id comes from the base (or -1), and an incoming vector
    # identical to a base fine centroid resolves to exactly that
    # centroid at distance 0 — no relearning from incoming data.
    from cir_duplicate_detector_spark.operators import kmeans

    base = spark.createDataFrame(
        [(i * 2, [float(i)] * 64) for i in range(20)],  # even ids 0..38
        "vec_id long, embedding array<double>",
    )
    # incoming: odd ids; id 101 duplicates base vector 20 (a fine
    # candidate: 20 % 10 == 0)
    incoming = spark.createDataFrame(
        [(101, [10.0] * 64), (103, [3.3] * 64)],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r
        for r in kmeans.kmeans_ivf_assign_incoming(
            base, incoming, k=2, sample_mod=1, fine_mod=10
        ).collect()
    }
    assert set(out) == {101, 103}
    base_ids = {i * 2 for i in range(20)}
    for r in out.values():
        assert r.fine == -1 or r.fine in base_ids
    assert out[101].fine == 20 and out[101].d == 0.0


def test_learned_float_ops_partitioning_invariant(spark):
    # THE reproducibility claim of the sorted-fold machinery: iterative
    # float learning (Lloyd means) must produce BIT-IDENTICAL doubles
    # no matter how the input is partitioned or ordered — shuffle
    # reordering is exactly what breaks naive double accumulation.
    from cir_duplicate_detector_spark.operators import kmeans, pq

    emb = load_table(spark, SF_DIR, "embeddings")
    variants = [
        emb.repartition(1),
        emb.repartition(13, "vec_id"),
        emb.orderBy(F.col("vec_id").desc()),
    ]

    def km(df):
        return sorted(
            (r.cluster, tuple(r.c))
            for r in kmeans.kmeans_centroids(df, k=4, iters=2).collect()
        )

    def cb(df):
        return sorted(
            (r.subspace, r.cid, tuple(r.csub))
            for r in pq.pq_codebook_learned(
                df, n_codewords=8, iters=2
            ).collect()
        )

    base_km, base_cb = km(emb), cb(emb)
    assert len(base_km) == 4 and len(base_cb) == pq.PQ_M * 8
    for v in variants:
        assert km(v) == base_km  # exact double equality, no tolerance
        assert cb(v) == base_cb


def test_chunk_documents_windows_and_overlap(spark):
    text100 = " ".join(f"w{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(1, text100), (2, "a b c d e"), (3, "")], DOCS_SCHEMA
    )
    got = {
        (r["doc_id"], r["chunk_id"]): r
        for r in textops.chunk_documents(docs).collect()
    }
    # 100 tokens, window 64, step 48 -> starts 1/49/97, sizes 64/52/4.
    assert [got[(1, i)]["chunk_start"] for i in range(3)] == [1, 49, 97]
    assert [got[(1, i)]["n_chunk_tokens"] for i in range(3)] == [64, 52, 4]
    # Overlap: chunk 1 starts inside chunk 0's window (49 <= 64).
    assert got[(1, 1)]["chunk_start"] <= got[(1, 0)]["n_chunk_tokens"]
    # Short and empty docs produce exactly one (possibly empty) chunk.
    assert got[(2, 0)]["n_chunk_tokens"] == 5 and (2, 1) not in got
    assert got[(3, 0)]["n_chunk_tokens"] == 0 and (3, 1) not in got


def test_events_funnel_order_sensitivity(spark):
    us = 1_000_000
    rows = [
        # user 1 completes the funnel in order
        (1, 1, 0 * us, "view"), (2, 1, 10 * us, "click"), (3, 1, 20 * us, "purchase"),
        # user 2 clicks BEFORE viewing: click doesn't count, purchase
        # requires a qualifying click -> stops at stage 1
        (4, 2, 10 * us, "click"), (5, 2, 20 * us, "view"), (6, 2, 5 * us, "purchase"),
        # user 3 views only
        (7, 3, 0 * us, "view"),
        # user 4 purchases with no view at all -> appears nowhere
        (8, 4, 0 * us, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_us bigint, event_type string"
    )
    # Replicate the operator's stage chain on the hand-built frame
    # (the registered query is pinned to the events table).
    v = ev.where("event_type = 'view'").groupBy("user_id").agg(F.min("ts_us").alias("v_ts"))
    c = (ev.where("event_type = 'click'").join(v, "user_id")
         .where(F.col("ts_us") >= F.col("v_ts"))
         .groupBy("user_id").agg(F.min("ts_us").alias("c_ts")))
    p = (ev.where("event_type = 'purchase'").join(c, "user_id")
         .where(F.col("ts_us") >= F.col("c_ts"))
         .groupBy("user_id").agg(F.min("ts_us").alias("p_ts")))
    assert {r["user_id"] for r in v.collect()} == {1, 2, 3}
    assert {r["user_id"] for r in c.collect()} == {1}
    assert {r["user_id"] for r in p.collect()} == {1}


def test_df_cap_drops_only_hot_keys(spark):
    from cir_duplicate_detector_spark.operators.dedup import df_capped

    rows = [(d, 1) for d in range(20)] + [(1, 7), (2, 7), (3, 8)]
    idx = spark.createDataFrame(rows, "doc_id long, key long")
    capped = df_capped(idx, "key", max_df=5)
    assert {r["key"] for r in capped.collect()} == {7, 8}
    assert capped.count() == 3


def test_substring_dup_hot_key_bounded(spark):
    # Planted hot key (VERDICT r3 #5): 40 identical documents share
    # every bottom-4 fingerprint, so each fingerprint has df=40 and the
    # uncapped self-join emits the full C(40,2) cross-product. A df cap
    # below 40 drops the hot fingerprints and bounds the join output.
    from cir_duplicate_detector_spark.operators import textops

    shared = "the same boilerplate header run " * 4
    docs = spark.createDataFrame(
        [(i, shared) for i in range(40)], "doc_id long, text string"
    )
    assert textops.substring_duplicates(docs, max_df=100).count() == 40 * 39 // 2
    assert textops.substring_duplicates(docs, max_df=10).count() == 0


def test_range_join_bucketed_interval_semantics(spark):
    # Window [100, 200) for user 1 with bucket 60: covers buckets 1-3.
    # Events at 99 (out), 100 (in), 150 (in), 200 (out, half-open),
    # and user 2 at 150 (wrong key).
    ev = spark.createDataFrame(
        [(1, 99), (2, 100), (3, 150), (4, 200), (5, 150)],
        "event_id bigint, ts_us bigint",
    ).withColumn("user_id", F.when(F.col("event_id") == 5, 2).otherwise(1))
    wins = spark.createDataFrame(
        [(1, 100, 200)], "user_id bigint, start_us bigint, end_us bigint"
    )
    got = sorted(
        r["event_id"]
        for r in events.range_join(ev, wins, bucket_us=60).collect()
    )
    assert got == [2, 3]


def test_range_join_empty_interval_dropped(spark):
    ev = spark.createDataFrame(
        [(1, 1, 100)], "event_id bigint, user_id bigint, ts_us bigint"
    )
    wins = spark.createDataFrame(
        [(1, 100, 100), (1, 200, 100)],
        "user_id bigint, start_us bigint, end_us bigint",
    )
    assert events.range_join(ev, wins, bucket_us=60).count() == 0


def test_purchase_attribution_lookback(spark):
    H = 3_600_000_000
    rows = [
        # user 1: view 30 min before purchase (attributed), click 2h
        # before (not), view at the purchase instant (not, half-open)
        (1, 1, 0, "click", 1.0),
        (2, 1, H + H // 2, "view", 2.0),
        (3, 1, 2 * H, "purchase", 50.0),
        (4, 1, 2 * H, "view", 4.0),
        # user 2: purchase with nothing before -> kept at zero
        (5, 2, H, "purchase", 9.0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, ts_us bigint,"
        " event_type string, value double",
    )
    got = {
        r["purchase_id"]: r
        for r in events.purchase_attribution(ev, lookback_us=H).collect()
    }
    assert set(got) == {3, 5}
    assert got[3]["n_attributed"] == 1
    assert got[3]["attributed_value"] == 2.0
    assert got[5]["n_attributed"] == 0
    assert got[5]["attributed_value"] == 0.0


def test_multimodal_audio_window_math(spark):
    docs = spark.createDataFrame(
        [(1, "abcd" * 20)], "doc_id long, text string"  # 80 samples
    )
    rows = sorted(
        multimodal.audio_energy_windows(
            multimodal.to_media(docs)
        ).collect(),
        key=lambda r: r.window_no,
    )
    # 80 samples, hop 32 -> windows at 0 (64), 32 (48), 64 (16)
    assert [(r.window_no, r.n_samples) for r in rows] == [
        (0, 64), (1, 48), (2, 16)
    ]
    # exact integer energy: sum of squared sample bytes
    payload = b"abcd" * 20
    for r in rows:
        seg = payload[r.window_no * 32 : r.window_no * 32 + 64]
        assert r.energy_sq == sum(b * b for b in seg)


# ------------------------------------------------- real image codec

def _ppm(w, h, pixels, comment=None):
    """Binary P6 bytes from [(r,g,b), ...] row-major."""
    head = b"P6\n"
    if comment is not None:
        head += b"# " + comment + b"\n"
    head += f"{w} {h}\n255\n".encode()
    return head + bytes(v for px in pixels for v in px)


def test_decode_ppm_parses_header_comments_and_raster():
    import numpy as np

    from cir_duplicate_detector_spark.operators.multimodal import decode_ppm

    px = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    arr = decode_ppm(_ppm(2, 2, px, comment=b"made by a test"))
    assert arr.shape == (2, 2, 3)
    assert arr.dtype == np.uint8
    assert arr[0, 0].tolist() == [255, 0, 0]
    assert arr[1, 1].tolist() == [9, 9, 9]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="truncated"):
        decode_ppm(_ppm(2, 2, px)[:-1])
    with _pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")


def test_extract_features_dispatches_any_image_media_type(spark):
    # Round-9 advice: the dispatch is media_type.startswith("image/"),
    # not an exact PPM-type match — the SAME PPM payload tagged with
    # any image/* subtype decodes to the same perceptual feature, while
    # a non-image type stays content-addressed (md5 of the bytes).
    import hashlib

    from cir_duplicate_detector_spark.operators import multimodal

    px = [(i * 3 % 256, i % 256, (i * 7) % 256) for i in range(64)]
    payload = _ppm(8, 8, px)
    media = spark.createDataFrame(
        [
            (1, multimodal.PPM_MEDIA_TYPE, bytearray(payload)),
            (2, "image/x-anything", bytearray(payload)),
            (3, "application/octet-stream", bytearray(payload)),
        ],
        "doc_id bigint, media_type string, payload binary",
    ).withColumn("n_bytes", F.lit(len(payload)).cast("bigint"))
    rows = {
        r["doc_id"]: r
        for r in multimodal.extract_features(media).collect()
    }
    opaque = int(hashlib.md5(payload).hexdigest()[:15], 16)
    assert rows[3]["feature60"] == opaque
    assert rows[1]["feature60"] == rows[2]["feature60"]
    assert rows[1]["feature60"] != opaque


def test_image_ahash_is_content_addressed_not_byte_addressed(spark):
    # Two byte-DIFFERENT payloads (one carries a header comment) with
    # identical pixels must produce identical hashes — proof the path
    # decodes the image rather than hashing the bytes. A pixel-level
    # change must flip the hash.
    from cir_duplicate_detector_spark.operators import multimodal

    bright = [(200, 200, 200)] * 2 + [(10, 10, 10)] * 2
    rows = [
        (1, _ppm(2, 2, bright)),
        (2, _ppm(2, 2, bright, comment=b"different bytes, same image")),
        (3, _ppm(2, 2, list(reversed(bright)))),
    ]
    media = spark.createDataFrame(
        [(i, "image/x-portable-pixmap", p, len(p)) for i, p in rows],
        "doc_id bigint, media_type string, payload binary, n_bytes bigint",
    )
    out = {
        r.doc_id: r
        for r in multimodal.image_ahash_features(media, grid=2).collect()
    }
    assert out[1].width == 2 and out[1].height == 2
    assert len(out[1].ahash_bits) == 4
    assert out[1].ahash_bits == out[2].ahash_bits == "1100"
    assert out[3].ahash_bits == "0011"


def test_decode_image_pil_agrees_with_pure_decoder():
    import pytest as _pytest

    _pytest.importorskip("PIL")  # optional extra; skip in no-deps envs
    import io

    import numpy as np
    from PIL import Image

    from cir_duplicate_detector_spark.operators.multimodal import decode_ppm

    px = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    payload = _ppm(2, 2, px)
    ours = decode_ppm(payload)
    pils = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    assert (ours == pils).all()


def test_decode_image_routes_low_maxval_ppm_through_pure_decoder():
    # PIL RESCALES a maxval<255 raster to 8-bit (v * 255 // maxval);
    # the pure decoder returns raw bytes. decode_image must route every
    # P6 payload through the pure decoder so the feature does not
    # depend on whether the optional PIL extra is installed (round-6
    # advice, re-flagged in VERDICT r7).
    from cir_duplicate_detector_spark.operators.multimodal import (
        decode_image,
        decode_ppm,
    )

    px = [(100, 0, 0), (0, 50, 0), (0, 0, 25), (9, 9, 9)]
    payload = b"P6\n2 2\n100\n" + bytes(v for p in px for v in p)
    got = decode_image(payload)
    assert (got == decode_ppm(payload)).all()
    assert got[0, 0].tolist() == [100, 0, 0]  # raw bytes, NOT rescaled


def test_ahash_raises_named_error_for_images_smaller_than_grid(spark):
    # A 2x2 image under the default 8x8 grid used to die with an opaque
    # ZeroDivisionError inside the block reshape (VERDICT r7); it must
    # be a named ValueError carrying the doc_id and geometry.
    import pytest as _pytest

    from cir_duplicate_detector_spark.operators import multimodal

    payload = _ppm(2, 2, [(1, 2, 3)] * 4)
    media = spark.createDataFrame(
        [(7, "image/x-portable-pixmap", payload, len(payload))],
        "doc_id bigint, media_type string, payload binary, n_bytes bigint",
    )
    with _pytest.raises(Exception, match="doc_id 7 image 2x2 is smaller"):
        multimodal.image_ahash_features(media, grid=8).collect()


def test_semantic_dedup_learned_pairs_are_cell_local(spark):
    from cir_duplicate_detector_spark.operators import similarity

    # two far blobs of near-identical vectors: every emitted pair must
    # be within one blob (cells cannot span blobs) and above threshold
    rows = []
    for i in range(8):
        rows.append((i, [10.0 + 0.001 * i] * 64))
        rows.append((100 + i, [-10.0 - 0.001 * i] * 64))
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = similarity.semantic_near_duplicates_learned(
        embs, threshold=0.9, k=2, iters=2, sample_mod=1, fine_mod=4
    ).collect()
    assert out, "near-identical in-blob vectors must pair"
    for r in out:
        assert (r.a < 100) == (r.b < 100), "pair spans blobs"
        assert r.cosine >= 0.9


def test_lsh_screen_flags_copies_not_novel(spark):
    from cir_duplicate_detector_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog " * 4
    existing = spark.createDataFrame(
        [(1, base), (2, "completely different corpus text here " * 4)],
        "doc_id bigint, text string",
    )
    incoming = spark.createDataFrame(
        [(10, base), (11, "unrelated novel document nothing shared " * 4)],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in dedup.lsh_screen(existing, incoming).collect()}
    # an exact copy shares the full signature -> every band collides
    assert out[10].lsh_hit and out[10].n_bands_hit == dedup.LSH_BANDS
    assert not out[11].lsh_hit and out[11].n_bands_hit == 0


def test_lsh_screen_has_no_false_negatives_vs_banding(spark):
    # Cross-operator invariant: the screen's candidate space IS the
    # banding's candidate space, so any (existing, incoming) pair the
    # full minhash pipeline emits (band collision + exact verify) must
    # have its incoming side flagged lsh_hit — the screen can only
    # over-approximate, never miss what the banding would find.
    from pyspark.sql import functions as F

    from cir_duplicate_detector_spark.operators import dedup
    from cir_duplicate_detector_spark.sources.derived import (
        BLOOM_SPLIT_SPARK,
        derive_near_dup_corpus,
    )

    docs = derive_near_dup_corpus(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    split = F.expr(BLOOM_SPLIT_SPARK)
    existing, incoming = docs.where(split == 0), docs.where(split == 1)
    screen = {
        r.doc_id: r.lsh_hit
        for r in dedup.lsh_screen(existing, incoming).collect()
    }
    ex_ids = {r.doc_id for r in existing.select("doc_id").collect()}
    pairs = dedup.minhash_near_duplicates(docs, threshold=0.5).collect()
    crossing = [
        (p.a, p.b) for p in pairs
        if (p.a in ex_ids) != (p.b in ex_ids)
    ]
    assert crossing, "derived corpus must produce cross-split near-dups"
    for a, b in crossing:
        inc = b if a in ex_ids else a
        assert screen[inc], f"screen missed banding-found pair ({a},{b})"


def test_dup_weighting_partitions_unit_mass_per_group(spark):
    from cir_duplicate_detector_spark.plans import ALL_QUERIES

    rows = ALL_QUERIES["dup_weighting"][0](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_group: dict = {}
    for r in rows:
        by_group.setdefault(r.group_id, []).append(r)
    assert any(len(v) > 1 for v in by_group.values())
    for members in by_group.values():
        ws = {m.weight for m in members}
        assert len(ws) == 1  # equal weight within a family
        assert abs(sum(m.weight for m in members) - 1.0) < 1e-9
        assert all(m.group_size == len(members) for m in members)


def test_boilerplate_removal_drops_shared_spans_keeps_unique(spark):
    from cir_duplicate_detector_spark.operators import textops

    shared = " ".join(f"b{i}" for i in range(16))  # one full shared span
    docs = spark.createDataFrame(
        [
            (1, shared + " unique one tail"),
            (2, shared + " different trailing words"),
            (3, "entirely organic text with no repeats"),
            (4, shared),  # fully boilerplate
            (5, shared),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in textops.boilerplate_removal(docs, min_docs=2).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}  # every input doc present
    # The shared 16-token span is df=4 -> dropped; unique tails survive.
    assert out[1].clean_text == "unique one tail"
    assert out[1].n_tokens == 19 and out[1].n_kept_tokens == 3
    assert out[2].clean_text == "different trailing words"
    # Organic doc passes through whole (token-normalized).
    assert out[3].clean_text == "entirely organic text with no repeats"
    assert out[3].n_kept_tokens == out[3].n_tokens == 6
    # Fully-boilerplate docs come back empty, not missing.
    assert out[4].clean_text == "" and out[4].n_kept_tokens == 0


def test_boilerplate_removal_rebuild_preserves_span_order(spark):
    from cir_duplicate_detector_spark.operators import textops

    # 40 tokens -> spans [0:16], [16:32], [32:40]; drop the MIDDLE one
    # (shared with doc 2); rebuild must keep spans 0 and 2 in order.
    w = [f"w{i}" for i in range(16)]
    mid = [f"m{i}" for i in range(16)]
    tail = ["t0", "t1"]
    docs = spark.createDataFrame(
        [
            (1, " ".join(w + mid + tail)),
            (2, " ".join(mid)),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in textops.boilerplate_removal(docs, min_docs=2).collect()
    }
    assert out[1].clean_text == " ".join(w + tail)
    assert out[1].n_kept_tokens == 18


def test_dsir_weights_tilt_toward_target_profile(spark):
    from pyspark.sql import functions as F

    from cir_duplicate_detector_spark.operators import textops

    docs = spark.createDataFrame(
        [
            (1, "alpha alpha alpha beta", "en"),
            (2, "alpha alpha gamma gamma", "xx"),
            (3, "gamma gamma gamma delta", "xx"),
            (4, "", "xx"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {
        r.doc_id: r
        for r in textops.dsir_weights(
            docs, F.col("lang") == "en"
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # Target profile is alpha-heavy: the alpha-ish raw doc outscores
    # the gamma-ish one (weights are mean likelihood-ratio per token
    # scaled by count; compare per-token averages for size-fairness).
    assert (
        out[2].dsir_weight / out[2].n_tokens
        > out[3].dsir_weight / out[3].n_tokens
    )
    assert out[4].n_tokens == 0 and out[4].dsir_weight == 0.0
    assert out[1].n_tokens == 4


def test_cross_corpus_near_duplicates_flags_straddling_pairs(spark):
    from cir_duplicate_detector_spark.operators import dedup

    base = " ".join(f"x{i}" for i in range(30))
    train = spark.createDataFrame(
        [
            (1, base),  # exact copy of eval doc 100 -> jaccard 1.0
            (2, " ".join(f"x{i}" for i in range(27))),  # truncated copy
            (3, "totally unrelated content here entirely"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, base), (101, "other benchmark prompt words")],
        "doc_id long, text string",
    )
    rows = dedup.cross_corpus_near_duplicates(
        train, ev, threshold=0.5
    ).collect()
    got = {(r.a, r.b): r.jaccard for r in rows}
    assert got[(1, 100)] == 1.0
    assert (2, 100) in got and 0.5 <= got[(2, 100)] < 1.0
    assert all(a != 3 for (a, _b) in got)  # unrelated doc not flagged
    assert all(b != 101 for (_a, b) in got)


def test_boilerplate_screen_counts_against_static_index(spark):
    from cir_duplicate_detector_spark.operators import textops

    shared = " ".join(f"s{i}" for i in range(16))
    indexed = spark.createDataFrame(
        [
            (1, shared + " idx one"),
            (2, shared + " idx two"),
            (3, "unrepeated indexed content"),
        ],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            (10, shared + " fresh tail"),  # first span hits the index
            (11, "clean incoming document"),
        ],
        "doc_id long, text string",
    )
    idx = textops.boilerplate_index(indexed, min_docs=2)
    out = {
        r.doc_id: r
        for r in textops.boilerplate_screen(incoming, idx).collect()
    }
    assert out[10].n_spans == 2 and out[10].n_boiler_spans == 1
    assert out[10].n_tokens == 18 and out[10].n_boiler_tokens == 16
    assert out[11].n_boiler_spans == 0 and out[11].n_boiler_tokens == 0


def test_zero_token_docs_never_poison_span_indexes(spark):
    # Round-9 advice: _doc_spans emits one empty span per token-less
    # doc (so screens count every input), but md5('') must NOT enter
    # boilerplate_index or eval_span_index — three empty indexed docs
    # would otherwise brand every future empty doc "boilerplate" and
    # every empty train doc "contaminated".
    from cir_duplicate_detector_spark.operators import textops

    empties = [(i, "   ") for i in range(1, 4)]  # >= min_docs empty docs
    indexed = spark.createDataFrame(
        empties + [(4, "real indexed content")], "doc_id long, text string"
    )
    assert textops.boilerplate_index(indexed, min_docs=3).count() == 0
    assert textops.eval_span_index(indexed).where(
        F.col("whash") == F.md5(F.lit(""))
    ).count() == 0
    # An empty incoming doc still gets a screen row, with zero hits.
    incoming = spark.createDataFrame([(10, "")], "doc_id long, text string")
    idx = textops.boilerplate_index(indexed, min_docs=3)
    row = textops.boilerplate_screen(incoming, idx).collect()[0]
    assert row.n_spans == 1 and row.n_boiler_spans == 0


def test_lsh_screen_from_index_dedupes_malformed_index(spark):
    # Round-9 advice: the serving path must tolerate a hand-built /
    # multiply-appended index with repeated (band_id, band_key) rows —
    # duplicates would multiply join rows and inflate n_bands_hit.
    from cir_duplicate_detector_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    idx = dedup.lsh_band_index(corpus)
    doubled = idx.unionAll(idx)
    clean = {
        r.doc_id: r.n_bands_hit
        for r in dedup.lsh_screen_from_index(idx, corpus).collect()
    }
    dirty = {
        r.doc_id: r.n_bands_hit
        for r in dedup.lsh_screen_from_index(doubled, corpus).collect()
    }
    assert clean == dirty


def test_dsir_score_uses_default_ratio_for_unseen_buckets(spark):
    from pyspark.sql import functions as F

    from cir_duplicate_detector_spark.operators import textops

    indexed = spark.createDataFrame(
        [(1, "alpha alpha beta", "en"), (2, "beta gamma gamma", "xx")],
        "doc_id long, text string, lang string",
    )
    incoming = spark.createDataFrame(
        [
            (10, "alpha alpha", "xx"),  # target-heavy profile
            (11, "zzznovel zzznovel", "xx"),  # unseen buckets
            (12, "gamma gamma", "xx"),  # raw-only profile
        ],
        "doc_id long, text string, lang string",
    )
    ratios, default = textops.dsir_bucket_ratios(
        indexed, F.col("lang") == "en"
    )
    out = {
        r.doc_id: r
        for r in textops.dsir_score(incoming, ratios, default).collect()
    }
    # The unseen token takes exactly the default ratio (tc=rc=0
    # Laplace smoothing: (0+1)/(0+1) factor == unseen).
    rd = default.collect()[0].r_default
    assert abs(out[11].dsir_score - 2 * rd) < 1e-12
    # gamma is raw-heavy (rc=2, tc=0) -> ratio below default; alpha is
    # target-exclusive (tc=rc=2) -> factor 1, equal to default. The
    # ordering the sampler acts on: target-ish >= unseen > raw-only.
    assert out[12].dsir_score < out[11].dsir_score
    assert abs(out[10].dsir_score - out[11].dsir_score) < 1e-12
    assert out[10].n_tokens == out[12].n_tokens == 2


def test_fuzzy_decon_recall_counts_found_over_truth(spark):
    # The recall diagnostic must be 1.0 when the banded screen finds
    # every true pair (exact copies always share all bands).
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["fuzzy_decon_recall"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "no eval doc with a true contaminating pair"
    for r in rows:
        assert r.n_true >= 1 and 0.0 <= r.recall <= 1.0
        assert r.n_found <= r.n_true


def test_bm25_scores_partitioning_invariant(spark):
    # The term-ordered fold claim for the retrieval family: BM25 scores
    # must be BIT-IDENTICAL no matter how the corpus is partitioned or
    # ordered (shuffle reordering is what breaks naive double sums).
    from cir_duplicate_detector_spark.operators import textops

    docs = load_table(spark, SF_DIR, "documents")
    panel = spark.createDataFrame(
        textops.BM25_PANEL, "query_id bigint, term string"
    )

    def run(df):
        return sorted(
            (r.query_id, r.doc_id, r.rank, r.n_terms_hit, r.score)
            for r in textops.bm25_search(df, panel).collect()
        )

    base = run(docs)
    assert base  # non-empty at any sf
    for v in (
        docs.repartition(1),
        docs.repartition(13, "doc_id"),
        docs.orderBy(F.col("doc_id").desc()),
    ):
        assert run(v) == base  # exact double equality, no tolerance


# ------------------------------------------------------ round-9 wave

def test_sentence_dedup_drops_repeated_sentence_keeps_order(spark):
    from cir_duplicate_detector_spark.operators import textops

    boiler = "subscribe to our newsletter today!"
    docs = spark.createDataFrame(
        [
            (1, f"unique alpha. {boiler} unique beta?"),
            (2, f"{boiler} other words here."),
            (3, "entirely original text without repeats."),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textops.sentence_dedup(docs).collect()}
    assert out[1].n_sentences == 3 and out[1].n_kept_sentences == 2
    # surviving sentences keep original order
    assert out[1].clean_text == "unique alpha. unique beta?"
    assert out[2].n_kept_sentences == 1
    assert out[3].n_kept_sentences == out[3].n_sentences
    assert out[3].clean_text == "entirely original text without repeats."


def test_quality_classifier_is_zero_shuffle_and_exact(spark):
    from cir_duplicate_detector_spark.operators import textops
    from cir_duplicate_detector_spark.functions.text import hash60

    docs = spark.createDataFrame(
        [(1, "Alpha beta ALPHA"), (2, "   ")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textops.quality_classifier(docs).collect()}
    # hand-fold the weights through the engine's own hash
    ws = spark.createDataFrame([("alpha",), ("beta",)], "t string").select(
        F.col("t"),
        (hash60(F.col("t"), seed="qcw") % textops.QC_WEIGHT_MOD - 1000).alias(
            "w"
        ),
    )
    w = {r.t: r.w for r in ws.collect()}
    expected = 2 * w["alpha"] + w["beta"]
    assert out[1].score_sum == expected
    assert out[1].quality_lr == expected / 3
    assert out[2].n_tokens == 0 and out[2].quality_lr == 0.0
    # pure projection: the plan must contain no exchange at all
    plan = (
        textops.quality_classifier(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_image_near_duplicates_banded_pairs(spark):
    from cir_duplicate_detector_spark.operators import multimodal

    # base raster: 192 bytes; near copy differs in ONE pixel byte
    # (<= 6 ahash bits), far image is reversed (many bits).
    base = bytes(range(64)) * 3
    near = bytes([255]) + base[1:]
    far = bytes(reversed(base))
    rows = [
        (1, multimodal.PPM_MEDIA_TYPE, bytearray(b"P6\n8 8\n255\n" + base)),
        (2, multimodal.PPM_MEDIA_TYPE, bytearray(b"P6\n8 8\n255\n" + near)),
        (3, multimodal.PPM_MEDIA_TYPE, bytearray(b"P6\n8 8\n255\n" + far)),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    ).withColumn("n_bytes", F.octet_length("payload").cast("bigint"))
    got = {
        (r.a, r.b): r.hamming
        for r in multimodal.image_near_duplicates(media).collect()
    }
    assert (1, 2) in got and got[(1, 2)] <= 6
    assert (1, 3) not in got and (2, 3) not in got
    # layout must refuse a threshold the pigeonhole cannot guarantee
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_bits < bands"):
        multimodal.image_near_duplicates(media, max_bits=8, bands=8)


def test_image_near_duplicates_viral_group_cap(spark):
    from cir_duplicate_detector_spark.operators import multimodal

    # organic: base + one-pixel near copy. viral: ten identical copies
    # of a third raster — a mega-group the cap must drop entirely,
    # while the organic pair is untouched.
    base = bytes(range(64)) * 3
    near = bytes([255]) + base[1:]
    viral = bytes(reversed(base))
    rows = [
        (1, multimodal.PPM_MEDIA_TYPE, bytearray(b"P6\n8 8\n255\n" + base)),
        (2, multimodal.PPM_MEDIA_TYPE, bytearray(b"P6\n8 8\n255\n" + near)),
    ] + [
        (100 + i, multimodal.PPM_MEDIA_TYPE,
         bytearray(b"P6\n8 8\n255\n" + viral))
        for i in range(10)
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    ).withColumn("n_bytes", F.octet_length("payload").cast("bigint"))
    uncapped = {
        (r.a, r.b)
        for r in multimodal.image_near_duplicates(media).collect()
    }
    # the viral group contributes its 45 within pairs when uncapped
    assert (100, 101) in uncapped and (1, 2) in uncapped
    capped = {
        (r.a, r.b)
        for r in multimodal.image_near_duplicates(
            media, max_group_size=5
        ).collect()
    }
    assert capped == {(1, 2)}  # viral pairs gone, organic pair intact
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_group_size"):
        multimodal.image_near_duplicates(media, max_group_size=0)


def test_rate_anomalies_integer_two_sigma_rule(spark):
    from cir_duplicate_detector_spark.operators import events as ev_ops

    h = ev_ops.HOUR_US
    rows = []
    eid = 0
    # type "a": counts 1,1,1,1,1,10 over six hours -> hour 5 is an
    # outlier. (Six, not five: one spike over an equal baseline sits at
    # EXACTLY (n-1)/2 sigmas, so n=5 lands precisely ON the 2-sigma
    # boundary and the strict > must NOT flag it — the integer rule
    # makes that boundary exact instead of rounding-dependent.)
    for hour, cnt in enumerate([1, 1, 1, 1, 1, 10]):
        for _ in range(cnt):
            rows.append((eid, 1, hour * h, "a", 1.0))
            eid += 1
    # type "b": flat counts -> no outlier
    for hour in range(6):
        for _ in range(3):
            rows.append((eid, 2, hour * h, "b", 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts_us long, event_type string,"
        " value double",
    )
    got = ev_ops.rate_anomalies(ev).collect()
    flagged = {(r.event_type, r.window_start_us) for r in got}
    assert ("a", 5 * h) in flagged
    assert not [r for r in got if r.event_type == "b"]
    r = [x for x in got if x.event_type == "a" and x.window_start_us == 5 * h][0]
    # hand-check the integer rule: n=6, sum=15, sumsq=105
    assert r.n_windows == 6 and r.sum_cnt == 15
    assert r.dev_sq == (10 * 6 - 15) ** 2
    assert r.var4 == 4 * (6 * 105 - 15 * 15)
    assert r.dev_sq > r.var4
    # the exact-2-sigma boundary case must NOT flag (strict >)
    b_rows = [(9000 + i, 3, hr * h, "c", 1.0)
              for hr, c in enumerate([1, 1, 1, 1, 10]) for i in range(c)]
    # re-index event ids uniquely
    b_rows = [(10_000 + i, u, t, ty, v)
              for i, (_, u, t, ty, v) in enumerate(b_rows)]
    ev_c = spark.createDataFrame(
        b_rows,
        "event_id long, user_id long, ts_us long, event_type string,"
        " value double",
    )
    assert ev_ops.rate_anomalies(ev_c).count() == 0


def test_quality_classifier_agreement_floor(spark):
    # Pin the learned scorer's held-out agreement to a measured-minus-
    # margin floor (VERDICT r10 item 7 — the ANN recall-floor
    # discipline): the oracle parity gate proves the confusion matrix
    # is COMPUTED right, but nothing stopped a featurization edit from
    # silently degrading the MODEL while staying oracle-green.
    # Measured at sf0.001: 0.9813 (held-out n=375, majority base rate
    # 0.56-0.58); sf0.01 measures 0.9573 — floor 0.93 allows corpus
    # wiggle while still failing on any real regression toward the
    # base rate.
    from cir_duplicate_detector_spark.operators import textops

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = textops.quality_classifier_model(docs)
    rows = textops.quality_classifier_agreement(docs, model).collect()
    total = sum(r["n"] for r in rows)
    agree = sum(r["n"] for r in rows if r["label"] == r["predicted"])
    assert total > 300  # held-out split sanity (375 of 500 docs)
    assert agree / total >= 0.93, (
        f"held-out agreement collapsed: {agree}/{total} = "
        f"{agree / total:.4f} (floor 0.93, measured 0.9813)"
    )


# ------------------------------------------------- OPQ-lite permutation

def test_opq_permutation_is_bijection(spark):
    from cir_duplicate_detector_spark.operators import opq

    rows = [(i, [float((i * 7 + j * 13) % 29) for j in range(64)])
            for i in range(40)]
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    perm = opq.opq_permutation(embs).collect()[0].perm
    assert sorted(perm) == list(range(1, 65))
    # apply ∘ perm touches every source slot exactly once: re-ordering
    # preserves the multiset of values per row
    out = opq.apply_permutation(embs, opq.opq_permutation(embs)).collect()
    src = {r[0]: sorted(r[1]) for r in rows}
    for r in out:
        assert sorted(r.embedding) == src[r.vec_id]


def test_opq_balances_planted_skew(spark):
    # Dims 0..15 carry ~all the energy; the identity layout packs them
    # into subspaces 0..3 (pos // 4), so max/min subspace energy is
    # huge. The snake-deal permutation must spread them one per
    # subspace — the balance OPQ exists to buy.
    from cir_duplicate_detector_spark.operators import opq

    rows = []
    for i in range(64):
        v = [10.0 + (i % 5) if j < 16 else 0.01 * ((i + j) % 3 + 1)
             for j in range(64)]
        rows.append((i, v))
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    asg = {r.pos: (r.subspace, r.energy)
           for r in opq.opq_assignment(embs).collect()}
    per_sub_before: dict[int, float] = {}
    per_sub_after: dict[int, float] = {}
    for pos, (sub, en) in asg.items():
        per_sub_before[pos // 4] = per_sub_before.get(pos // 4, 0.0) + en
        per_sub_after[sub] = per_sub_after.get(sub, 0.0) + en
    ratio_before = max(per_sub_before.values()) / min(per_sub_before.values())
    ratio_after = max(per_sub_after.values()) / min(per_sub_after.values())
    assert ratio_before > 100, ratio_before  # the planted skew is real
    assert ratio_after < 3, ratio_after      # and the deal removes it
    # every subspace got exactly 4 dims (bijection at the slot level)
    from collections import Counter
    assert set(Counter(s for s, _ in asg.values()).values()) == {4}


def test_opq_ab_recall_improves_on_skew(spark):
    # The end-to-end claim behind the pq_recall_skewed A/B rows
    # (VERDICT r11 item 7): on a corpus where a few dimensions carry
    # the energy (dims 0-3 scaled x8), the sample-learned balanced
    # permutation materially improves RAW ADC recall@5 — measured
    # 0.581 -> 0.775 at sf0.001 and 0.550 -> 0.725 at sf0.1 — while
    # the exact refine stage saturates both variants at 1.0 here (the
    # 64-candidate shortlist covers the truth at this corpus size).
    # Floor at +0.10 to allow corpus variation without letting the
    # delta silently collapse.
    from cir_duplicate_detector_spark.plans.ext_ann_recall import (
        q_pq_recall_skewed,
        q_pq_recall_skewed_opq,
    )

    def agg(rows):
        return (
            sum(r.n_hit_adc for r in rows) / sum(r.n_true for r in rows),
            sum(r.n_hit_refined for r in rows)
            / sum(r.n_true for r in rows),
        )

    adc_id, ref_id = agg(q_pq_recall_skewed(spark, SF_DIR).collect())
    adc_opq, ref_opq = agg(q_pq_recall_skewed_opq(spark, SF_DIR).collect())
    assert adc_opq >= adc_id + 0.10, (
        f"OPQ permutation stopped helping ADC recall on the skewed "
        f"corpus: identity={adc_id:.3f} opq={adc_opq:.3f}"
    )
    assert ref_opq >= ref_id - 1e-9


def _opq_test_corpora(spark):
    """(skewed, isotropic) small corpora for the auto-gate tests: the
    planted-skew shape from test_opq_balances_planted_skew plus a flat
    per-dimension-energy twin."""
    skew_rows = [
        (i, [10.0 + (i % 5) if j < 16 else 0.01 * ((i + j) % 3 + 1)
             for j in range(64)])
        for i in range(64)
    ]
    iso_rows = [
        (i, [1.0 + 0.01 * ((i + j) % 3) for j in range(64)])
        for i in range(64)
    ]
    schema = "vec_id long, embedding array<double>"
    return (
        spark.createDataFrame(skew_rows, schema),
        spark.createDataFrame(iso_rows, schema),
    )


def test_opq_auto_gate_permutes_iff_skewed(spark):
    # VERDICT r12 item 5: build_ivf_pq_index(opq="auto") measures the
    # sample's identity-layout subspace imbalance and permutes iff it
    # exceeds OPQ_AUTO_RATIO — identity with opq="never" on a balanced
    # corpus, identity with opq="always" on a skew-regressed one.
    from cir_duplicate_detector_spark.operators import pq

    skewed, iso = _opq_test_corpora(spark)
    idx_iso = pq.build_ivf_pq_index(iso, opq="auto")
    assert idx_iso.perm is None  # auto == the shipped config
    idx_auto = pq.build_ivf_pq_index(skewed, opq="auto")
    assert idx_auto.perm is not None  # auto fired on the skew
    idx_always = pq.build_ivf_pq_index(skewed, opq="always")
    codes = lambda ix: sorted(  # noqa: E731
        (r.vec_id, tuple(r.ca)) for r in ix.codes.collect()
    )
    assert codes(idx_auto) == codes(idx_always)
    # ... and the permuted index differs from the unpermuted build
    # (the gate decision is load-bearing, not a no-op)
    idx_never = pq.build_ivf_pq_index(skewed, opq="never")
    assert codes(idx_auto) != codes(idx_never)


def test_opq_auto_index_roundtrips_perm_and_serves(spark, tmp_path):
    # The permutation rides IN the index: persist/read round-trips it,
    # and the probe path permutes queries through it — served results
    # equal the in-session build's.
    from cir_duplicate_detector_spark.operators import pq

    skewed, _ = _opq_test_corpora(spark)
    idx = pq.build_ivf_pq_index(skewed, opq="auto")
    out = str(tmp_path / "opq_idx")
    pq.persist_ivf_pq_index(idx, out)
    reopened = pq.read_ivf_pq_index(spark, out)
    assert reopened.perm is not None
    assert (
        reopened.perm.collect()[0].perm == idx.perm.collect()[0].perm
    )
    probe = [0, 7, 21]
    served = pq.knn_ivf_pq_from_index(reopened, skewed, probe, k=3)
    built = pq.knn_ivf_pq_from_index(idx, skewed, probe, k=3)
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(
        (r.query_id, r.rank, r.neighbor_id) for r in served.collect()
    ) == sorted(
        (r.query_id, r.rank, r.neighbor_id) for r in built.collect()
    ), key
    # upsert against the permuted index encodes the wave in the SAME
    # space: merged == from-scratch-on-union structurally (both sides
    # permute through the identical stored perm)
    wave = skewed.where("vec_id % 2 = 1")
    base = pq.build_ivf_pq_index(skewed.where("vec_id % 2 = 0"), opq="always")
    a_new, c_new = pq.ivf_pq_upsert(base, wave)
    merged = pq.merge_ivf_pq_index(base, a_new, c_new)
    assert merged.perm is not None
    assert merged.codes.count() == skewed.count()


def test_opq_composes_with_prebuilt_coarse(spark):
    # Round 14 (VERDICT r13 item 7): coarse_cents + opq is now
    # supported — the provided table must be in the ORIGINAL layout
    # and the build projects it through the learned permutation, so
    # the A/B recall pair can share one identity-layout coarse build.
    from cir_duplicate_detector_spark.operators import pq

    skewed, _ = _opq_test_corpora(spark)
    cents = pq.build_ivf_pq_index(skewed).cents  # identity layout
    idx = pq.build_ivf_pq_index(skewed, coarse_cents=cents, opq="auto")
    assert idx.perm is not None  # the gate still fires on the skew
    pm = idx.perm.collect()[0].perm
    got = {r.coarse: list(r.c) for r in idx.cents.collect()}
    for r in cents.collect():
        want = [r.c[pm[i] - 1] for i in range(len(pm))]
        assert got[r.coarse] == want  # cents = perm(provided cents)
    # and the projected-cents index serves (probes permute through the
    # same stored perm; cells are well-formed)
    out = pq.knn_ivf_pq_from_index(idx, skewed, [0, 7], k=3)
    assert out.count() > 0
    with pytest.raises(ValueError, match="never"):
        pq.build_ivf_pq_index(skewed, opq="sometimes")


def _correlated_corpus(spark, n=256):
    """Corpus whose structure is cross-dimension CORRELATION, not
    axis-aligned skew: heavy dims 0-3 (x8) MIXED pairwise with dims
    32-35 through a fixed 0.6/0.8 rotation (a 3-4-5 Givens — exact
    double constants), so the energy spreads across subspaces but the
    correlation remains. No permutation can undo a mix; the learned
    rotation can. Values are integer-hash diverse (every (i, j) cell
    distinct) so the learn's 32-codeword Lloyd cannot quantize the
    sample exactly — the distortion being minimized is real."""
    rows = []
    for i in range(n):
        v = [
            (((i * 2654435761 + j * 40503 + 17) % 4093) / 4093.0) - 0.5
            for j in range(64)
        ]
        for j in range(4):
            v[j] *= 8.0
        for j in range(4):
            a, b = v[j], v[32 + j]
            v[j], v[32 + j] = 0.6 * a + 0.8 * b, -0.8 * a + 0.6 * b
        rows.append((i, v))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_opq_rotation_beats_permutation_on_correlated_corpus(spark):
    # The full-OPQ stretch (VERDICT r12 item 8): the alternating
    # Lloyd/Procrustes learn must reduce sample quantization distortion
    # MONOTONICALLY from its permutation init (trace head = what the
    # snake-deal permutation achieves; tail = the learned rotation) —
    # the A/B evidence for the capability the registered permutation
    # rows cannot provide (a correlated corpus defeats any axis-aligned
    # re-ordering).
    from cir_duplicate_detector_spark.operators import opq

    emb = _correlated_corpus(spark)
    rot, trace = opq.learn_rotation(emb, sample_mod=1, return_trace=True)
    assert len(trace) == opq.OPQ_ROT_ITERS + 1
    # each Procrustes+Lloyd round may plateau but never regresses much;
    # the end-to-end claim is a material win over the permutation init
    assert trace[-1] < 0.85 * trace[0], trace
    # orthogonality: rotation preserves row norms (L2-invariant, the
    # property that lets exact refine stay in the original space)
    rotated = opq.apply_rotation(emb, rot).collect()
    orig = {r[0]: r[1] for r in emb.collect()}
    for r in rotated:
        n_before = sum(x * x for x in orig[r.vec_id])
        n_after = sum(x * x for x in r.embedding)
        assert abs(n_before - n_after) < 1e-9 * max(n_before, 1.0)


def _lowrank_mixed_corpus(spark, n=2048):
    """Corpus where the PERMUTATION is structurally powerless: a
    16-dim decaying-scale signal (8,8,8,8,4,...,1) + near-zero noise,
    spread across all 64 dims by three exact-Givens mixing layers —
    after mixing, per-dimension marginal energies are near-flat (so
    any energy-ranked re-ordering is ~arbitrary) while the heavy
    DIRECTIONS remain strongly cross-dimension correlated (so a
    learned rotation can re-align them). All constants exact doubles;
    fully deterministic."""
    def u(i, j, salt):
        return (((i * 2654435761 + j * 40503 + salt) % 4093) / 4093.0) - 0.5

    scales = [8, 8, 8, 8, 4, 4, 4, 4, 2, 2, 2, 2, 1, 1, 1, 1] + [0.05] * 48
    rows = []
    for i in range(n):
        v = [scales[j] * u(i, j, 17) for j in range(64)]
        for off, salt in ((16, 1), (32, 2), (8, 3)):
            for j in range(32):
                a, b = v[j], v[(j + off) % 64]
                if (j + salt) % 2 == 0:
                    v[j], v[(j + off) % 64] = (
                        0.6 * a + 0.8 * b,
                        -0.8 * a + 0.6 * b,
                    )
                else:
                    v[j], v[(j + off) % 64] = (
                        0.8 * a + 0.6 * b,
                        -0.6 * a + 0.8 * b,
                    )
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _adc_recall(spark, emb, mode, n_codewords):
    from cir_duplicate_detector_spark.operators import pq
    from cir_duplicate_detector_spark.plans.ext_ann_recall import (
        _pq_recall_over,
    )

    idx = pq.build_ivf_pq_index(
        emb, opq=mode, sample_mod=1, n_codewords=n_codewords
    )
    rows = _pq_recall_over(emb, index=idx).collect()
    return sum(r.n_hit_adc for r in rows) / sum(r.n_true for r in rows)


def test_opq_rotation_recall_ab(spark):
    """The rotation's RECALL-level A/B (round 14, VERDICT r13 item 2 —
    the r13 evidence was distortion-only): the `_pq_recall_over`
    harness (fixed 32-probe panel, exact-L2 truth) over identical
    builds differing ONLY in opq mode, at n_codewords=16 so PQ
    distortion (not cell coverage) binds ADC recall — at the shipped
    256 codewords per 4-d subspace every layout quantizes a 2k corpus
    near-exactly and all three modes measure ≈0.95 (recorded in
    SCALE.md; that saturation is itself the measured justification for
    the shipped config).

    On `_lowrank_mixed_corpus` — flat marginal energies, strong
    cross-dimension correlation — the permutation is structurally
    powerless (measured 0.719, BELOW identity's 0.769: an arbitrary
    re-ordering just scrambles subspace locality) while the learned
    rotation re-aligns the heavy directions (measured 0.775): the
    capability the permutation rows cannot provide, now measured at
    recall level. The headline pin is rotation ≥ permutation + 0.04
    (measured margin 0.056); against IDENTITY the pin is
    non-inferiority only (measured +0.006 — identity's axis-aligned
    subspaces partially capture this corpus's structure, so
    the rotation's edge over identity is thin here; the corpus where
    identity loses big is the skew A/B, next test). Floors leave
    margin for cross-platform SVD wobble (the learn is
    numpy-deterministic per platform)."""
    emb = _lowrank_mixed_corpus(spark)
    adc_id = _adc_recall(spark, emb, "never", 16)
    adc_perm = _adc_recall(spark, emb, "always", 16)
    adc_rot = _adc_recall(spark, emb, "rotate", 16)
    assert adc_rot >= adc_perm + 0.04, (
        f"rotation stopped beating the permutation where re-ordering "
        f"cannot help: perm={adc_perm:.3f} rot={adc_rot:.3f}"
    )
    assert adc_rot >= adc_id - 0.01, (
        f"rotation fell below identity: id={adc_id:.3f} "
        f"rot={adc_rot:.3f}"
    )


def test_opq_rotation_recall_ab_on_correlated_corpus(spark):
    """Same harness on the pairwise-mixed skew corpus (the r13
    distortion test's construction, 2048 rows) at n_codewords=32:
    monotone never < always < rotate (measured 0.844 / 0.881 /
    0.900) — here the permutation recovers most of the axis-aligned
    skew and the rotation's extra win is the unmixing margin."""
    from cir_duplicate_detector_spark.operators import opq  # noqa: F401

    emb = _correlated_corpus(spark, n=2048)
    adc_id = _adc_recall(spark, emb, "never", 32)
    adc_perm = _adc_recall(spark, emb, "always", 32)
    adc_rot = _adc_recall(spark, emb, "rotate", 32)
    assert adc_perm >= adc_id + 0.01
    assert adc_rot >= adc_perm + 0.005, (
        f"perm={adc_perm:.3f} rot={adc_rot:.3f}"
    )


def test_opq_rotate_index_roundtrips_and_serves(spark, tmp_path):
    from cir_duplicate_detector_spark.operators import pq

    emb = _correlated_corpus(spark)
    idx = pq.build_ivf_pq_index(emb, opq="rotate", sample_mod=1)
    assert idx.rot is not None and idx.perm is None
    out = str(tmp_path / "rot_idx")
    pq.persist_ivf_pq_index(idx, out)
    reopened = pq.read_ivf_pq_index(spark, out)
    assert reopened.rot is not None
    probe = [0, 13, 47]
    served = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in pq.knn_ivf_pq_from_index(
            reopened, emb, probe, k=3
        ).collect()
    )
    built = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in pq.knn_ivf_pq_from_index(idx, emb, probe, k=3).collect()
    )
    assert served == built
    # upsert projects the wave through the stored rotation: merged
    # index covers the full corpus and stays rotation-tagged
    base = pq.build_ivf_pq_index(
        emb.where("vec_id % 2 = 0"), opq="rotate", sample_mod=1
    )
    a_new, c_new = pq.ivf_pq_upsert(base, emb.where("vec_id % 2 = 1"))
    merged = pq.merge_ivf_pq_index(base, a_new, c_new)
    assert merged.rot is not None
    assert merged.codes.count() == emb.count()


def test_simhash_pairs_prebuilt_sigs_identical(spark, tmp_path):
    # Round-14 share contract: `dedup_simhash_pairs` bands over the
    # signature row's parquet instead of re-deriving signatures.
    # Bigint signatures round-trip parquet exactly, so the banded
    # pairs must be identical to the in-session derivation.
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "alpha beta gamma delta epsilon eta"),
            (4, "totally different words here now ok"),
        ],
        "doc_id bigint, text string",
    )
    inline = sorted(
        (r.a, r.b, r.dist)
        for r in dedup.simhash_near_duplicates(docs, max_bits=3).collect()
    )
    d = str(tmp_path / "sigs.parquet")
    dedup.simhash_signatures(docs).write.parquet(d)
    served = sorted(
        (r.a, r.b, r.dist)
        for r in dedup.simhash_near_duplicates(
            docs, max_bits=3, sigs=spark.read.parquet(d)
        ).collect()
    )
    assert served == inline and len(inline) > 0


def test_pq_encode_against_parquet_codebook_identical(spark, tmp_path):
    # Round-14 share contract: the upsert twins encode against ONE
    # parquet-backed codebook build (`_shared_pq_upsert_codebook`).
    # Doubles round-trip parquet bit-exactly, so codes against the
    # stored copy must equal codes against the in-session learn.
    from cir_duplicate_detector_spark.operators import pq

    emb = load_table(spark, SF_DIR, "embeddings")
    cb = pq.pq_codebook_learned(emb.where("vec_id % 2 = 0"), train_mod=4)
    inline = sorted(
        (r.vec_id, r.subspace, r.code)
        for r in pq.pq_encode(emb.where("vec_id % 2 = 1"), cb).collect()
    )
    d = str(tmp_path / "codebook")
    cb.write.parquet(d)
    served = sorted(
        (r.vec_id, r.subspace, r.code)
        for r in pq.pq_encode(
            emb.where("vec_id % 2 = 1"), spark.read.parquet(d)
        ).collect()
    )
    assert served == inline and len(inline) > 0


def test_opq_prebuilt_energy_identical_and_guarded(spark):
    # Round 15 (guide §1.2): build_ivf_pq_index(opq="auto") evaluates
    # the gate AND learns the permutation from ONE materialized
    # dim_energy frame. Pin the share's identity — permutation and
    # imbalance from a prebuilt energy frame equal the direct path —
    # and the prebuilt-table schema guard (ADVICE r14).
    import pytest as _pytest

    from cir_duplicate_detector_spark.operators import opq

    rows = []
    for i in range(64):
        v = [10.0 + (i % 5) if j < 16 else 0.01 * ((i + j) % 3 + 1)
             for j in range(64)]
        rows.append((i, v))
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    en = opq.dim_energy(embs)
    direct = opq.opq_permutation(embs).collect()[0].perm
    shared = opq.opq_permutation(embs, energy=en).collect()[0].perm
    assert direct == shared
    ri_direct = opq.opq_subspace_imbalance(embs).collect()[0]
    ri_shared = opq.opq_subspace_imbalance(embs, energy=en).collect()[0]
    assert ri_direct.ratio == ri_shared.ratio
    with _pytest.raises(ValueError, match="pos"):
        opq.opq_permutation(
            embs, energy=embs.select("vec_id")
        ).collect()


def test_bm25_one_pass_relation_matches_two_pass(spark):
    # Round 15 (guide §2.3): bm25_search's single materialized
    # relation (null-term stats markers + panel postings from one
    # corpus pass) must reproduce the two-pass form's exact output —
    # pinned here against an inline reimplementation of the r14 shape.
    from pyspark.sql import functions as F

    from cir_duplicate_detector_spark.operators import textops

    docs = load_table(spark, SF_DIR, "documents")
    panel = spark.createDataFrame(
        textops.BM25_PANEL, "query_id bigint, term string"
    )
    new = sorted(
        tuple(r) for r in textops.bm25_search(docs, panel).collect()
    )
    # r14 two-pass reference: tf via broadcast panel fan-out, stats
    # from an independent toked aggregation.
    toked = docs.select(
        "doc_id", textops.tokens("text").alias("toks"),
        F.lit(1).alias("one"),
    ).withColumn("dl", F.size("toks").cast("bigint")).where("dl > 0")
    stats = toked.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_tokens"),
    )
    terms = panel.select("term").dropDuplicates()
    tf = (
        toked.join(F.broadcast(terms.withColumn("one", F.lit(1))), "one")
        .select(
            "doc_id", "term", "dl",
            (F.size("toks")
             - F.size(F.array_remove(F.col("toks"), F.col("term"))))
            .cast("bigint").alias("tf"),
        )
        .where(F.col("tf") > 0)
    )
    df_rel = tf.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df")
    )
    k1, b = textops.BM25_K1, textops.BM25_B
    idf = ((F.col("n_docs") - F.col("df")) + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    tfnorm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + (F.lit(k1) * (F.lit(1.0 - b) + ((F.lit(b) * F.col("dl"))
           / (F.col("total_tokens") / F.col("n_docs")))))
    )
    from cir_duplicate_detector_spark.operators.kmeans import _sorted_fold
    from pyspark.sql import Window

    scored = (
        tf.join(F.broadcast(df_rel), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", (idf * tfnorm).alias("s"))
    )
    per = (
        F.broadcast(panel).join(scored, "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_terms_hit"),
            _sorted_fold(
                F.collect_list(F.struct("term", "s")), "s"
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    old = sorted(
        tuple(r)
        for r in per.withColumn(
            "rank", F.row_number().over(w).cast("bigint")
        )
        .where(F.col("rank") <= textops.BM25_TOPK)
        .select("query_id", "doc_id", "rank", "n_terms_hit", "score")
        .collect()
    )
    assert new == old
