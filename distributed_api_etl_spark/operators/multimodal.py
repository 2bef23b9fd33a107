"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB of images/audio/video:
  * content is an opaque ``binary`` column (or a reference: uri + byte
    range) with a typed metadata struct alongside;
  * decode / feature-extract / resize / frame-sample are Arrow-batched
    pandas stages over ``mapInPandas`` — the batch shape (N rows of bytes
    in, N rows of fixed-schema features out) keeps memory bounded and lets
    Spark pipeline the scan into the Python workers;
  * partitioning: repartition by a size-aware key before heavy decode so a
    few giant payloads don't skew tasks.

The actual codec calls are STUBBED here (image/audio libraries are not in
this runtime): ``decoder="fake"`` produces a deterministic decode from the
byte stream itself (tested, oracle-able); ``decoder="pil"``/"ffmpeg" raise
NotImplementedError at the call site with the real integration point
documented. The Spark-side plumbing — schemas, mapInPandas signatures,
Arrow batching — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("content_sha", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_binary_content(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Manifest builder: treat the text payload as opaque bytes + metadata.

    (With real media you'd read via the ``binaryFile`` source; the schema
    and downstream plumbing are identical.)
    """
    content = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col).alias("doc_id"),
        content.alias("content"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.octet_length(content).cast("long").alias("byte_len"),
            F.sha2(content, 256).alias("content_sha"),
        ).alias("media_meta"),
    )


def _fake_decode(content: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a codec: derives a 'geometry' and an
    8-bucket byte histogram (normalized) from the raw bytes."""
    n = len(content)
    width = (n % 64) + 1
    height = (n // 64) + 1
    n_frames = 1
    hist = [0] * 8
    for b in content:
        hist[b >> 5] += 1
    total = float(n) if n else 1.0
    return width, height, n_frames, [h / total for h in hist]


def extract_features(
    df: DataFrame, decoder: str = "fake", batch_hint: int = 1024
) -> DataFrame:
    """Arrow-batched decode/feature stage over mapInPandas.

    Input: (doc_id, content binary, media_meta struct). Output: FEATURE_SCHEMA.
    """
    if decoder not in ("fake",):
        raise NotImplementedError(
            f"decoder {decoder!r}: real codecs (PIL/ffmpeg/torchaudio) are not "
            "available in this runtime; integrate by replacing _fake_decode — "
            "the mapInPandas contract (bytes in, FEATURE_SCHEMA out) is final"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content, meta in zip(
                pdf["doc_id"], pdf["content"], pdf["media_meta"]
            ):
                raw = bytes(content) if content is not None else b""
                width, height, n_frames, feats = _fake_decode(raw)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_type": meta["media_type"],
                        "byte_len": meta["byte_len"],
                        "width": width,
                        "height": height,
                        "n_frames": n_frames,
                        "features": feats,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)
