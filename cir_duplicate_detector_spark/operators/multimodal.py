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
