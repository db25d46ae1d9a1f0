"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched pandas (mapInPandas).

Beyond-reference capability (driver north star).  ``decode_image`` does
real header-level image decode when PIL is importable and raises
NotImplementedError otherwise (this container ships no image libs); the
deterministic fake (``fake_decode_meta``) keeps the Spark-side schema,
Arrow batch shape, partitioning, and UDF signatures tested either way.

Scale notes: payload columns ride in the same Parquet row groups as the
metadata; mapInPandas streams Arrow batches (bounded by
spark.sql.execution.arrow.maxRecordsPerBatch) so executor memory stays flat
regardless of corpus size; per-batch work is embarrassingly parallel.
"""

from __future__ import annotations

import hashlib
import io
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional dependency: real image decode when the lib is present
    from PIL import Image as _PILImage
except ImportError:  # container default: plumbing runs on the fake decoder
    _PILImage = None

PAYLOAD_SCHEMA = ("doc_id bigint, payload binary, media_type string, "
                  "n_bytes bigint")
STATS_SCHEMA = "doc_id bigint, n_bytes bigint, digest string"
META_SCHEMA = ("doc_id bigint, media_type string, width int, height int, "
               "n_frames int")


def to_payload(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Build an opaque binary payload column (UTF-8 bytes of the text stand
    in for an image/audio blob) + typed metadata."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).cast("long")
        .alias("n_bytes"))


def payload_stats(df: DataFrame) -> DataFrame:
    """Batch-process payloads with mapInPandas: size + md5 digest per blob.
    This is the plumbing template for decode/resize/frame-sample stages."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "digest": pdf["payload"].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
            })

    return df.mapInPandas(process, STATS_SCHEMA)


def decode_image(payload: bytes) -> tuple[str, int, int, int]:
    """Decode an image payload to (media_type, width, height, n_frames)
    with PIL when it is importable; raises NotImplementedError otherwise
    (this container ships no image libs — the deterministic
    ``fake_decode_meta`` keeps the batch plumbing tested either way).
    Runs inside the mapInPandas batch loop via ``extract_meta(df,
    decoder=decode_image)`` — header-only metadata read, pixels are not
    materialized."""
    if _PILImage is None:
        raise NotImplementedError(
            "image decode requires PIL/opencv; see fake_decode_meta for "
            "the tested plumbing")
    img = _PILImage.open(io.BytesIO(payload))
    fmt = (img.format or "unknown").lower()
    return (f"image/{fmt}", int(img.width), int(img.height),
            int(getattr(img, "n_frames", 1)))


def fake_decode_meta(payload: bytes) -> tuple[str, int, int, int]:
    """Deterministic stand-in for media decode: derives (media_type, width,
    height, n_frames) from the payload bytes, exercising the same batch
    path a real decoder would."""
    h = hashlib.md5(payload).digest()
    return ("image/fake", 16 + h[0] % 64, 16 + h[1] % 64, 1 + h[2] % 8)


def extract_meta(df: DataFrame,
                 decoder: Callable[[bytes], tuple[str, int, int, int]]
                 | None = None) -> DataFrame:
    """mapInPandas metadata extraction.  ``decoder`` maps payload bytes →
    (media_type, width, height, n_frames); default is the deterministic
    ``fake_decode_meta`` (oracle-stable — the test payloads are text
    bytes, not real images).  Pass ``decoder=decode_image`` for real PIL
    decode on an actual image corpus."""
    decoder = decoder or fake_decode_meta

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf["payload"].map(lambda b: decoder(bytes(b)))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": metas.map(lambda m: m[0]),
                "width": metas.map(lambda m: m[1]).astype("int32"),
                "height": metas.map(lambda m: m[2]).astype("int32"),
                "n_frames": metas.map(lambda m: m[3]).astype("int32"),
            })

    return df.mapInPandas(process, META_SCHEMA)
