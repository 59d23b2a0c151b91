"""Multimodal columns: opaque binary blobs + typed metadata.

Images/audio/video travel as `binary` columns with a metadata struct,
exactly the pattern the array store uses for chunk blobs
(/root/reference/src/io/mandoline/chunk.clj:35-45 content addressing).
All per-blob work runs as Arrow-batched `mapInPandas` so decode
libraries operate on whole batches, never row-at-a-time Python.

Real image/audio codecs are absent in this container, so the pipeline
runs on a deterministic fake wire format (RAW8: a tiny header + raw
uint8 pixels / frames).  The format is the ONLY fake part: the Spark
plumbing — schemas, UDF signatures, Arrow batch shapes, explode of
sampled frames — is the production shape; swap `decode_image` /
`encode_image` for PIL/ffmpeg calls and nothing else changes.

Scale notes: blobs never leave executors (no collect); feature/resize
stages are projections (no shuffle); frame sampling explodes to
(video, frame) rows only AFTER dropping unsampled frames, so the
exploded volume is output-, not input-, proportional.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

META_SCHEMA = "mime string, nbytes bigint, fp string"

_IMG_MAGIC = b"RAW8"
_VID_MAGIC = b"VID8"


# -- fake wire format (deterministic; stands in for JPEG/MP4 codecs) ---------


def encode_image(arr: np.ndarray) -> bytes:
    """uint8 HxWxC array → RAW8 blob."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    return _IMG_MAGIC + struct.pack("<HHB", h, w, c) + arr.astype(np.uint8).tobytes()


def decode_image(blob: bytes) -> np.ndarray:
    """RAW8 blob → uint8 HxWxC array.  For real formats (JPEG/PNG/...)
    swap in PIL here; the callers only see ndarrays."""
    blob = bytes(blob)
    if blob[:4] != _IMG_MAGIC:
        raise NotImplementedError(
            "non-RAW8 image decoding requires an image codec library"
        )
    h, w, c = struct.unpack("<HHB", blob[4:9])
    return np.frombuffer(blob, np.uint8, h * w * c, offset=9).reshape(h, w, c)


def encode_video(frames: np.ndarray) -> bytes:
    """uint8 NxHxWxC frame stack → VID8 blob."""
    n, h, w, c = frames.shape
    return (
        _VID_MAGIC
        + struct.pack("<IHHB", n, h, w, c)
        + frames.astype(np.uint8).tobytes()
    )


def decode_video(blob: bytes) -> np.ndarray:
    blob = bytes(blob)
    if blob[:4] != _VID_MAGIC:
        raise NotImplementedError(
            "non-VID8 video decoding requires a codec library"
        )
    n, h, w, c = struct.unpack("<IHHB", blob[4:13])
    return np.frombuffer(blob, np.uint8, n * h * w * c, offset=13).reshape(
        n, h, w, c
    )


# -- Spark operators ----------------------------------------------------------


def with_blob_metadata(
    df: DataFrame, blob_col: str = "blob", mime: str = "application/octet-stream"
) -> DataFrame:
    """Attach a `meta` struct (mime, nbytes, fp=md5-of-bytes) computed in
    an Arrow-batched mapInPandas stage.  fp doubles as the content
    address for exact multimodal dedup."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", meta struct<{META_SCHEMA}>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            pdf = pdf.copy()
            pdf["meta"] = [
                {
                    "mime": mime,
                    "nbytes": len(b) if b is not None else 0,
                    "fp": hashlib.md5(bytes(b)).hexdigest()
                    if b is not None
                    else None,
                }
                for b in blobs
            ]
            yield pdf

    return df.mapInPandas(extract, out_schema)


def resize_images(
    df: DataFrame, out_h: int, out_w: int, blob_col: str = "blob"
) -> DataFrame:
    """Nearest-neighbor resize of every image blob; output column
    replaces the input blob (same schema), still RAW8-encoded."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            resized = []
            for b in pdf[blob_col]:
                img = decode_image(b)
                h, w, _ = img.shape
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                resized.append(encode_image(img[np.ix_(yi, xi)]))
            out[blob_col] = resized
            yield out

    return df.mapInPandas(run, out_schema)


def image_features(
    df: DataFrame, blob_col: str = "blob", id_col: str = "id"
) -> DataFrame:
    """Per-image feature vector [mean, std, min, max] per channel, as an
    array<double> column — the hand-off point to embedding models."""
    out_schema = f"{id_col} long, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[blob_col]:
                img = decode_image(b).astype(np.float64)
                per_c = np.stack(
                    [
                        img.mean(axis=(0, 1)),
                        img.std(axis=(0, 1)),
                        img.min(axis=(0, 1)),
                        img.max(axis=(0, 1)),
                    ],
                    axis=0,
                )
                feats.append(per_c.T.reshape(-1).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.mapInPandas(run, out_schema)


def frame_sample(
    df: DataFrame, every_n: int = 30, blob_col: str = "blob", id_col: str = "id"
) -> DataFrame:
    """Sample every Nth frame of each video blob into
    (id, frame_idx, frame) rows, frames re-encoded as RAW8 images."""
    out_schema = f"{id_col} long, frame_idx int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for vid_id, b in zip(pdf[id_col], pdf[blob_col]):
                stack = decode_video(b)
                for i in range(0, stack.shape[0], every_n):
                    ids.append(vid_id)
                    idxs.append(i)
                    frames.append(encode_image(stack[i]))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(run, out_schema)
