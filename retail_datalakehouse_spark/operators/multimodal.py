"""Multimodal column handling (SURVEY §2.10 L5).

Design: image/audio/video payloads are **opaque binary columns with typed
metadata structs** — the lakehouse carries them losslessly through every
relational op (binary is just bytes to Spark), and modality-specific work
happens in Arrow-batched `mapInPandas` stages at the edges.

Raw-format kernels (rgb8 decode = reshape, nearest-neighbor resize, frame
sampling over stacked frames) are REAL, numpy-only, and exact-pixel
tested. Only compressed/container decode (png/jpeg/mp4) needs codec
libraries (PIL/ffmpeg) that are NOT in this container — those two entry
points stay stubbed behind `NotImplementedError`; every Spark-side piece
(schemas, Arrow batch iteration, partition behavior) runs for real.

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
    """STUB for COMPRESSED formats (png/jpeg): requires an image codec
    (PIL/turbojpeg), not present in this environment. Raw-format media is
    fully supported — see `decode_raw_rgb` below."""
    raise NotImplementedError("image decode requires a codec library (PIL); not in container")


def sample_frames(payload: bytes, every_ms: int):  # pragma: no cover - stub
    """STUB for CONTAINER formats (mp4/webm): requires ffmpeg. Raw frame
    stacks are fully supported — see `sample_frames_raw` below."""
    raise NotImplementedError("frame sampling requires ffmpeg; not in container")


# ------------------------- raw-format kernels (REAL — numpy only) ----------
#
# format='rgb8': payload is H*W*3 uint8 bytes, row-major. No codec needed —
# decode is a reshape, resize is nearest-neighbor index math, and a "video"
# is frames stacked along axis 0. These are the exact kernels a production
# pipeline runs AFTER codec decode; here they run end-to-end real.


def decode_raw_rgb(payload: bytes, w: int, h: int):
    """Decode an rgb8 payload to an (h, w, 3) uint8 array (zero-copy view)."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size != w * h * 3:
        raise ValueError(f"payload has {arr.size} bytes, expected {w*h*3} for {w}x{h} rgb8")
    return arr.reshape(h, w, 3)


def resize_nearest(arr, out_w: int, out_h: int):
    """Nearest-neighbor resize of an (h, w, 3) array — pure index math
    (the same sampling grid cv2.INTER_NEAREST uses: src = floor(dst*scale))."""
    import numpy as np

    h, w = arr.shape[:2]
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return arr[rows][:, cols]


def sample_frames_raw(payload: bytes, w: int, h: int, every: int = 2):
    """Sample every ``every``-th frame from a raw rgb8 frame stack:
    payload = n_frames * h * w * 3 bytes. Returns (n_sampled, h, w, 3)."""
    import numpy as np

    frame_bytes = w * h * 3
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size % frame_bytes != 0:
        raise ValueError("payload is not a whole number of frames")
    return arr.reshape(-1, h, w, 3)[::every]


def thumbnail_frame(df: DataFrame, src_w: int, src_h: int, out_w: int, out_h: int) -> DataFrame:
    """Arrow-batched REAL image pipeline over rgb8 payloads: decode
    (reshape) → nearest-neighbor resize → per-thumbnail stats. Same
    mapInPandas shape as `extract_features`; the kernel is actual pixel
    math, not a stand-in. Output: doc_id, out_w, out_h, px_sum (exact
    uint64 sum of resized pixels), corner values."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("out_w", T.IntegerType()),
            T.StructField("out_h", T.IntegerType()),
            T.StructField("px_sum", T.LongType()),
            T.StructField("top_left", T.IntegerType()),
            T.StructField("bottom_right", T.IntegerType()),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "out_w": [], "out_h": [], "px_sum": [], "top_left": [], "bottom_right": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_raw_rgb(payload, src_w, src_h)
                thumb = resize_nearest(img, out_w, out_h)
                out["doc_id"].append(doc_id)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["px_sum"].append(int(thumb.astype("int64").sum()))
                out["top_left"].append(int(thumb[0, 0, 0]))
                out["bottom_right"].append(int(thumb[-1, -1, -1]))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, out_schema)


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
