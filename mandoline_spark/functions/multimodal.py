"""Multimodal columns: opaque binary blobs + typed metadata.

Images/audio/video travel as `binary` columns with a metadata struct,
exactly the pattern the array store uses for chunk blobs
(/root/reference/src/io/mandoline/chunk.clj:35-45 content addressing).
Feature extraction runs as Arrow-batched `mapInPandas` so decode
libraries (absent in this container — stubbed below) would operate on
whole batches, never row-at-a-time Python.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame


META_SCHEMA = "mime string, nbytes bigint, fp string"


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


def decode_image(blob: bytes) -> "object":
    """Decode an image blob to an ndarray.

    STUB: image codecs are not available in this container.  The Spark
    plumbing (binary column → mapInPandas batch → per-blob decode) is
    real and tested via :func:`with_blob_metadata`; swap this function
    for a PIL/torchvision decode in a real deployment.
    """
    raise NotImplementedError("image decoding requires an image codec library")


def frame_sample(blob: bytes, every_n: int = 30) -> "list":
    """Sample video frames.  STUB — see :func:`decode_image`."""
    raise NotImplementedError("video decoding requires a codec library")
