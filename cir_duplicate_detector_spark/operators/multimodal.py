"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched Pandas UDFs (mapInPandas).

The container has no image/audio codecs, so the DECODE step is a
clearly-marked deterministic stub (`_fake_decode`); everything around it
— binary column handling, metadata schema, mapInPandas batch shape,
partitioning — is real and is the part that matters on a cluster. A
production deployment swaps `_fake_decode` for a real codec (PIL/ffmpeg)
without touching the Spark plumbing; that hot-swap point mirrors the
reference's posture of treating hash *computation* as an upstream
concern (reference pyproject declares pdqhash but never imports it —
SURVEY header).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, content_md5 string, feature60 bigint"
)

MEDIA_SCHEMA = "doc_id bigint, media_type string, payload binary, n_bytes bigint"


def to_media(docs: DataFrame) -> DataFrame:
    """Wrap documents as a media table: payload = utf-8 bytes standing in
    for image/audio blobs, with typed metadata columns.
    """
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> int:
    """STUB decode step — deterministic stand-in for a real media codec.

    Returns a 60-bit feature derived from the payload's md5. Replace
    with e.g. PIL image decode + PDQ hash computation in production;
    the surrounding Spark plumbing is codec-agnostic.
    """
    import hashlib

    return int(hashlib.md5(payload).hexdigest()[:15], 16)


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    mapInPandas streams record batches through Python once — the decode
    path is the only place this engine leaves the JVM, and it is
    batch-vectorized (no per-row Python round trips).
    """
    import hashlib

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.str.len().astype("int64"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    "feature60": payloads.map(_fake_decode).astype("int64"),
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, orig_bytes bigint, resized_bytes bigint, resized_md5 string"
)


def resize_stub(media: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Resize/downsample step of the media pipeline — STUB codec.

    The deterministic stand-in truncates the payload to ``target_bytes``
    (a real deployment swaps in PIL thumbnail / ffmpeg scale); the Spark
    plumbing — binary column in, Arrow batches through one Python pass,
    metadata about both sizes out — is the production shape.
    """
    import hashlib

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(lambda b: bytes(b)[:target_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": pdf["payload"].str.len().astype("int64"),
                    "resized_bytes": resized.str.len().astype("int64"),
                    "resized_md5": resized.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(resize, RESIZE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id bigint, frame_no bigint, frame_text string, frame_md5 string"
)


def frame_sample(
    media: DataFrame, frame_chars: int = 32, stride: int = 4
) -> DataFrame:
    """Frame decomposition + sampling over the payload column — the
    video-keyframe-shaped pipeline: decode (stub), split into fixed-
    width frames, keep every ``stride``-th frame, fingerprint each.

    One Arrow-batched pass (mapInPandas); the row explosion happens
    inside the Python worker, so upstream stages never materialize the
    unsampled frames. A production deployment replaces the utf-8 "
    "decode with ffmpeg frame extraction; schema and batch shape hold.
    """
    import hashlib

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_no": [], "frame_text": [], "frame_md5": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                text = bytes(payload).decode("utf-8")
                n_frames = (len(text) + frame_chars - 1) // frame_chars
                for fno in range(0, n_frames, stride):
                    ft = text[fno * frame_chars : (fno + 1) * frame_chars]
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(fno)
                    out["frame_text"].append(ft)
                    out["frame_md5"].append(
                        hashlib.md5(ft.encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(sample, FRAME_SCHEMA)


# ------------------------------------------------------------- real codec
#
# The container ships no image libraries, but "real codec" does not
# require one: binary PPM (P6) is a complete, standardized image format
# decodable with numpy alone. `decode_ppm` is that decoder — an actual
# parse of an actual image container, not a hash stub — and
# `image_ahash_features` runs a REAL perceptual feature (8x8 average
# hash over the decoded pixels) behind the same Arrow/mapInPandas
# plumbing as the stubs. `decode_image` prefers PIL when the optional
# extra is installed (any format PIL reads), falling back to the pure
# decoder for PPM — the documented swap point, now with a working
# default instead of only a stub.

PPM_MAGIC = b"P6"


def decode_ppm(payload: bytes):
    """Decode a binary PPM (P6, maxval ≤ 255) into an (h, w, 3) uint8
    numpy array. Pure numpy — no image library. Supports the full
    header grammar: ``P6``, whitespace-separated width/height/maxval,
    ``#`` comments, single whitespace before the raster."""
    import numpy as np

    if not payload.startswith(PPM_MAGIC):
        raise ValueError("not a P6 PPM payload")
    pos = len(PPM_MAGIC)
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and comments
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            nl = payload.index(b"\n", pos)
            pos = nl + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported by the pure decoder")
    pos += 1  # exactly one whitespace byte before the raster
    raster = payload[pos : pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError(
            f"truncated PPM raster: need {w * h * 3} bytes, got {len(raster)}"
        )
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def decode_image(payload: bytes):
    """Decode ``payload`` to an (h, w, 3) uint8 array. P6 PPM payloads
    ALWAYS take the pure-numpy decoder — PIL rescales maxval<255
    rasters to 8-bit while the pure decoder returns raw bytes, so
    routing by environment would make features depend on whether the
    optional extra is installed (round-6 advice). Non-PPM payloads use
    PIL when installed (any PIL-readable format). This is the
    production swap point the module docstring names; `_fake_decode`
    remains the no-decode fallback for payloads that are not images at
    all."""
    if payload.startswith(PPM_MAGIC):
        return decode_ppm(payload)
    try:
        import io

        import numpy as np
        from PIL import Image  # optional extra

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError:
        raise ValueError(
            "decode_image: non-PPM payload and the optional PIL extra "
            "is not installed"
        ) from None


AHASH_SCHEMA = "doc_id bigint, width bigint, height bigint, ahash_bits string"


def image_ahash_features(media: DataFrame, grid: int = 8) -> DataFrame:
    """REAL decode + perceptual feature over the payload column: parse
    each payload as an image (:func:`decode_image`), integer-grayscale
    the pixels, and emit the ``grid``x``grid`` average hash — '1' where
    a cell's gray exceeds the image mean (exact integer rule:
    ``gray*cells > sum(gray)``, no float division) — as a bit string.
    Row-major, block means by integer floor; for a grid-sized image
    each cell is one pixel, which is what the registered oracle pins.

    Same scale posture as the stubs: one Arrow boundary, numpy-
    vectorized per batch, schema/batch shape codec-agnostic.
    """
    import numpy as np

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "width": [], "height": [], "ahash_bits": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_image(bytes(payload))
                h, w = px.shape[0], px.shape[1]
                if h < grid or w < grid:
                    raise ValueError(
                        f"image_ahash_features: doc_id {doc_id} image "
                        f"{w}x{h} is smaller than the {grid}x{grid} grid"
                    )
                gray = px.astype(np.int64).sum(axis=2) // 3
                # block means by integer floor over equal grid cells
                bh, bw = h // grid, w // grid
                cells = (
                    gray[: bh * grid, : bw * grid]
                    .reshape(grid, bh, grid, bw)
                    .sum(axis=(1, 3))
                    // (bh * bw)
                )
                total = int(cells.sum())
                bits = (cells.reshape(-1) * (grid * grid)) > total
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["ahash_bits"].append(
                    "".join("1" if b else "0" for b in bits)
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(features, AHASH_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id bigint, window_no bigint, n_samples bigint, energy_sq bigint"
)

AUDIO_WINDOW = 64
AUDIO_HOP = 32


def audio_energy_windows(
    media: DataFrame, window: int = AUDIO_WINDOW, hop: int = AUDIO_HOP
) -> DataFrame:
    """Audio-shaped pipeline: treat the payload as a PCM sample stream
    (stub: one byte = one unsigned 8-bit sample) and emit overlapping
    fixed-width analysis windows with their energy (sum of squared
    samples) — the framing step every audio featurizer (VAD, MFCC,
    loudness normalization) starts from.

    One Arrow-batched ``mapInPandas`` pass; samples are decoded with
    ``np.frombuffer`` (zero-copy) and window energies computed
    vectorized per batch — the only JVM exit is the one Arrow boundary.
    Energy is an exact integer (bounded by 255²·window per row), so the
    oracle reproduces it bit-for-bit. A production deployment replaces
    the byte interpretation with a real PCM/ffmpeg decode; window math,
    schema, and batch shape are codec-agnostic.
    """
    import numpy as np

    def energies(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "window_no": [], "n_samples": [], "energy_sq": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(bytes(payload), dtype=np.uint8)
                sq = samples.astype(np.int64) ** 2
                n = len(samples)
                # ceil(n/hop) windows; empty payload -> zero rows
                # (mirrored by the oracle's empty range()).
                n_windows = (n + hop - 1) // hop
                for k in range(n_windows):
                    seg = sq[k * hop : k * hop + window]
                    out["doc_id"].append(doc_id)
                    out["window_no"].append(k)
                    out["n_samples"].append(len(seg))
                    out["energy_sq"].append(int(seg.sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(energies, AUDIO_SCHEMA)
