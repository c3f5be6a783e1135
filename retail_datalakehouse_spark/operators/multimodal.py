"""Multimodal column handling (SURVEY §2.10 L5).

Design: image/audio/video payloads are **opaque binary columns with typed
metadata structs** — the lakehouse carries them losslessly through every
relational op (binary is just bytes to Spark), and modality-specific work
happens in Arrow-batched `mapInPandas` stages at the edges.

The decode/resize/frame-sample kernels need codec libraries (PIL/ffmpeg/
librosa) that are NOT in this container — those steps are stubbed behind
`NotImplementedError` with the real Spark-side plumbing (schemas, batch
iteration, partition behavior) implemented and tested against a
deterministic fake feature extractor.

At 100 TB: binaries ride in parquet with `spark.sql.files.maxPartitionBytes`
sizing partitions; metadata-only queries never touch the payload bytes
(column pruning), and mapInPandas streams Arrow batches so an executor
holds one batch of payloads at a time, not a partition of decoded frames.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried beside every media payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_media(df: DataFrame, payload_from: str = "text") -> DataFrame:
    """Build a media-shaped frame: binary payload + metadata struct.
    (Testdata has no real media, so the payload is the utf-8 text bytes —
    byte-exact, deterministic, and structurally identical to real use.)"""
    return df.select(
        "doc_id",
        F.encode(F.col(payload_from), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("raw").alias("format"),
            F.octet_length(F.encode(F.col(payload_from), "UTF-8")).alias("width"),
            F.lit(1).alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real implementation requires an image codec (PIL/turbojpeg),
    not present in this environment. The mapInPandas plumbing that would
    call it is `extract_features` below."""
    raise NotImplementedError("image decode requires a codec library (PIL); not in container")


def resize_image(payload: bytes, w: int, h: int):  # pragma: no cover - stub
    """STUB: see `decode_image`."""
    raise NotImplementedError("image resize requires a codec library; not in container")


def sample_frames(payload: bytes, every_ms: int):  # pragma: no cover - stub
    """STUB: video frame sampling requires ffmpeg; not in container."""
    raise NotImplementedError("frame sampling requires ffmpeg; not in container")


def extract_features(df: DataFrame, use_stub_decoder: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    `mapInPandas` — THE production shape for media kernels: the pandas
    iterator sees one Arrow batch at a time (bounded memory), output schema
    is explicit, and partitioning is inherited (no shuffle).

    With ``use_stub_decoder`` the 'features' are a deterministic function
    of the bytes (length, additive checksum, 4 byte-histogram moments) —
    a stand-in with the same schema/shape a real encoder would produce.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            payloads = pdf["payload"]
            if not use_stub_decoder:  # pragma: no cover - needs codecs
                decode_image(payloads.iloc[0])
            n_bytes = payloads.map(len)
            checksum = payloads.map(lambda b: sum(b) % (1 << 31))
            feats = payloads.map(
                lambda b: [
                    float(len(b)),
                    float(sum(b) % 997),
                    float(b[0]) if len(b) else 0.0,
                    float(b[-1]) if len(b) else 0.0,
                ]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "checksum": checksum,
                    "features": feats,
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)
