"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched pandas (mapInPandas).

Beyond-reference capability (driver north star).  Image/audio/video decode
libraries are not in this container, so the decode/feature-extract stage is
STUBBED behind ``decode_image`` (raises NotImplementedError) with a
deterministic fake (``fake_decode_meta``) — the real, tested parts are the
Spark-side schema, Arrow batch shape, partitioning, and UDF signatures.

Scale notes: payload columns ride in the same Parquet row groups as the
metadata; mapInPandas streams Arrow batches (bounded by
spark.sql.execution.arrow.maxRecordsPerBatch) so executor memory stays flat
regardless of corpus size; per-batch work is embarrassingly parallel.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to pixels.

    STUB: image decode libraries (PIL/opencv) are not available in this
    container.  At deploy time, implement with
    ``PIL.Image.open(io.BytesIO(payload))`` inside the mapInPandas batch
    loop — the surrounding plumbing (payload_stats / extract_meta) is
    already batch-shaped for it.
    """
    raise NotImplementedError("image decode requires PIL/opencv; "
                              "see fake_decode_meta for the tested plumbing")


def fake_decode_meta(payload: bytes) -> tuple[str, int, int, int]:
    """Deterministic stand-in for media decode: derives (media_type, width,
    height, n_frames) from the payload bytes, exercising the same batch
    path a real decoder would."""
    h = hashlib.md5(payload).digest()
    return ("image/fake", 16 + h[0] % 64, 16 + h[1] % 64, 1 + h[2] % 8)


def extract_meta(df: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction using the deterministic fake decoder
    (swap fake_decode_meta → real decode when libs are present)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf["payload"].map(lambda b: fake_decode_meta(bytes(b)))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": metas.map(lambda m: m[0]),
                "width": metas.map(lambda m: m[1]).astype("int32"),
                "height": metas.map(lambda m: m[2]).astype("int32"),
                "n_frames": metas.map(lambda m: m[3]).astype("int32"),
            })

    return df.mapInPandas(process, META_SCHEMA)
