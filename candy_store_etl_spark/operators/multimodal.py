"""Multimodal (image/audio/video) column plumbing.

Large-scale training pipelines treat media as opaque ``binary``
columns + a typed metadata struct, processed by Arrow-batched
``mapInPandas`` stages so bytes never take the row-at-a-time Python
path. This module implements that plumbing for real — schemas, batch
iteration, partition sizing — while the actual codecs are STUBBED:
this container has no image/audio libraries, so ``decode_media``
ships a clearly-marked deterministic fake (hash-derived dimensions)
and raises ``NotImplementedError`` when a real codec is requested.

Swap ``_fake_decode`` for Pillow/torchaudio/pyav in a real deployment;
nothing else changes — the Spark-side contract (schema in, schema out,
bounded batch memory) is what this module pins down.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), True),
                    StructField("source", StringType(), True),
                    StructField("n_bytes", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def attach_media_column(
    df: DataFrame, id_col: str, payload_col: str, *, mime: str = "image/fake"
) -> DataFrame:
    """Wrap an existing column's bytes as a media row (binary+meta)."""
    content = F.encode(F.col(payload_col).cast("string"), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit("synthetic").alias("source"),
            F.length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(buf: bytes, n_features: int) -> tuple[int, int, int, np.ndarray]:
    """DETERMINISTIC FAKE decoder (no codec libs in this container).

    Dimensions derive from a content digest; "features" are a seeded
    byte histogram — stable across runs and machines, so tests can
    assert exact values. A real deployment replaces this function.
    """
    digest = hashlib.sha256(buf).digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    n_frames = 1 + digest[2] % 8
    hist, _ = np.histogram(
        np.frombuffer(buf, dtype=np.uint8), bins=n_features, range=(0, 256)
    )
    denom = max(len(buf), 1)
    return width, height, n_frames, (hist / denom).astype(np.float32)


def decode_media(
    media: DataFrame, *, n_features: int = 16, codec: str = "fake"
) -> DataFrame:
    """binary → (dims, frame count, feature vector), Arrow-batched.

    ``codec='fake'`` is the only implementation available here; any
    real codec name raises until its library is installed.
    """
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r} needs a media library not present in this "
            "container; only the deterministic 'fake' codec is available"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # guide-§4 shape: per-row work is only the digest (C-speed
        # sha256); the byte histograms for the WHOLE batch vectorize
        # through one np.add.at over the concatenated buffers when the
        # bin width divides 256 (bin index = byte // width matches
        # np.histogram's uniform integer edges exactly — verified by
        # the digest-pinned tests). The previous form ran np.histogram
        # and a row-tuple append per row.
        vec_bins = 256 % n_features == 0
        bin_w = 256 // n_features if vec_bins else None
        for pdf in batches:
            if pdf.empty:
                continue
            bufs = [
                None if b is None else bytes(b) for b in pdf["content"]
            ]
            n = len(bufs)
            width = [None] * n
            height = [None] * n
            frames = [None] * n
            feats: list = [None] * n
            valid: list[int] = []
            lens: list[int] = []
            for i, b in enumerate(bufs):
                if b is None:
                    continue
                d = hashlib.sha256(b).digest()
                width[i] = 16 + d[0] % 64
                height[i] = 16 + d[1] % 64
                frames[i] = 1 + d[2] % 8
                valid.append(i)
                lens.append(len(b))
            if valid and vec_bins:
                allb = np.frombuffer(
                    b"".join(bufs[i] for i in valid), dtype=np.uint8
                )
                row_ids = np.repeat(np.arange(len(valid)), lens)
                counts = np.zeros((len(valid), n_features), dtype=np.int64)
                np.add.at(counts, (row_ids, allb // bin_w), 1)
                denoms = np.maximum(np.asarray(lens), 1)
                fm = (counts / denoms[:, None]).astype(np.float32)
                for j, i in enumerate(valid):
                    feats[i] = fm[j].tolist()
            else:
                for i in valid:
                    hist, _ = np.histogram(
                        np.frombuffer(bufs[i], dtype=np.uint8),
                        bins=n_features,
                        range=(0, 256),
                    )
                    feats[i] = (
                        hist / max(len(bufs[i]), 1)
                    ).astype(np.float32).tolist()
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": width,
                    "height": height,
                    "n_frames": frames,
                    "features": feats,
                }
            )

    return media.select("media_id", "content").mapInPandas(
        decode, DECODED_SCHEMA
    )


def plan_resize(
    decoded: DataFrame, *, max_side: int = 32
) -> DataFrame:
    """Resize planning: aspect-preserving target geometry, JVM-side.

    The geometry (scale factor, rounded target dims, skip flag for
    already-small media) is pure column arithmetic computed at scan
    speed; only the pixel resample itself belongs in the codec UDF —
    which is stubbed here like ``decode_media``. Splitting it this way
    means the cheap decision ("is a resize even needed?") never pays
    the Python boundary, and the expensive stage receives exact
    output dims.
    """
    longest = F.greatest("width", "height")
    scale = F.when(longest <= max_side, F.lit(1.0)).otherwise(
        F.lit(max_side) / longest
    )
    return decoded.select(
        "media_id",
        "width",
        "height",
        scale.alias("scale"),
        F.ceil(F.col("width") * scale).cast("int").alias("target_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_height"),
        (longest <= max_side).alias("skip_resize"),
    )


def resize_media(
    media: DataFrame, *, max_side: int = 32, codec: str = "fake"
) -> DataFrame:
    """binary + plan → resized binary (STUB — same contract as
    ``decode_media``: real codecs slot into the mapInPandas stage)."""
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r} needs a media library not present in this "
            "container; only the deterministic 'fake' codec is available"
        )
    plan = plan_resize(decode_media(media), max_side=max_side)
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("target_width", IntegerType(), True),
            StructField("target_height", IntegerType(), True),
            StructField("content", BinaryType(), True),
        ]
    )

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            # fake resample: truncate the buffer proportionally to the
            # area ratio — deterministic, size-monotone, codec-shaped
            out = []
            for mid, buf, tw, th, w, h in zip(
                pdf["media_id"],
                pdf["content"],
                pdf["target_width"],
                pdf["target_height"],
                pdf["width"],
                pdf["height"],
            ):
                if buf is None:
                    out.append((mid, tw, th, None))
                    continue
                ratio = (tw * th) / max(w * h, 1)
                keep = max(1, int(len(buf) * min(ratio, 1.0)))
                out.append((mid, tw, th, bytes(buf)[:keep]))
            yield pd.DataFrame(
                out,
                columns=["media_id", "target_width", "target_height", "content"],
            )

    joined = media.select("media_id", "content").join(plan, "media_id")
    return joined.select(
        "media_id", "content", "target_width", "target_height", "width", "height"
    ).mapInPandas(resample, out_schema)


def sample_frames(decoded: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame-sampling plumbing: one row per kept frame index.

    With a real video codec the content column would ride along; the
    index fan-out (the Spark-side shape: explode, no shuffle) is real.
    """
    return decoded.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
        ).alias("frame_idx"),
    )


SEGMENTED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("clip_idx", IntegerType(), False),
        StructField("start_sample", LongType(), False),
        StructField("clip_len", LongType(), False),
        StructField("clip_md5", StringType(), False),
    ]
)


def segment_audio(media: DataFrame, *, codec: str = "fake") -> DataFrame:
    """Audio-style windowed segmentation: binary payload → fixed-size
    clips (digest-derived frame size stands in for sample-rate math),
    one output row per clip with its byte range and content digest.

    The Arrow-batched slicing over the binary column is the real
    contract a waveform chunker runs under (a real deployment decodes
    PCM and windows samples instead of raw bytes; no audio libs ship in
    this container, same policy as ``decode_media``). Deterministic by
    construction, so the registered query carries a full DuckDB oracle
    (digest arithmetic + substr windows — ASCII corpus makes char
    windows equal byte windows).
    """
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r} needs an audio library not present in this "
            "container; only the deterministic 'fake' codec is available"
        )

    def segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                if buf is None or len(buf) == 0:
                    continue
                data = bytes(buf)
                clip = 64 + hashlib.sha256(data).digest()[3] % 64
                for i in range((len(data) + clip - 1) // clip):
                    seg = data[i * clip : (i + 1) * clip]
                    rows.append(
                        (
                            mid,
                            i,
                            i * clip,
                            len(seg),
                            hashlib.md5(seg).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "clip_idx",
                    "start_sample",
                    "clip_len",
                    "clip_md5",
                ],
            )

    return media.select("media_id", "content").mapInPandas(
        segment, SEGMENTED_SCHEMA
    )
