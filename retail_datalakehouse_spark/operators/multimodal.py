"""Multimodal column handling (SURVEY §2.10 L5).

Design: image/audio/video payloads are **opaque binary columns with typed
metadata structs** — the lakehouse carries them losslessly through every
relational op (binary is just bytes to Spark), and modality-specific work
happens in Arrow-batched `mapInPandas` stages at the edges.

Raw-format kernels (rgb8 decode = reshape, nearest-neighbor resize, frame
sampling over stacked frames) are REAL, numpy-only, and exact-pixel
tested. PNG encode/decode is ALSO real — a complete stdlib-zlib codec
(chunk framing + all five scanline filters, `encode_png`/`decode_png`),
so the compressed bytes→pixels path runs end-to-end with no third-party
library. Motion-PNG containers (concatenated frames) get keyframe-style
sampling via `sample_frames`. Only codecs that genuinely need native
libraries (JPEG/mp4) raise ValueError at dispatch.

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


# ------------------------- PNG codec (REAL — stdlib zlib + numpy) ----------
#
# A complete 8-bit PNG encoder/decoder with no third-party codec: IHDR/IDAT/
# IEND chunk framing, zlib deflate, and all five scanline filters (None/Sub/
# Up/Average/Paeth) unfiltered per the PNG spec §9. Grayscale (0),
# grayscale+alpha (4), RGB (2) and RGBA (6) at bit depth 8; no interlacing.
# This is the compressed-decode path a training-data pipeline runs on real
# image corpora — bytes → pixels with nothing stubbed.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(arr) -> bytes:
    """Encode an (h, w[, channels]) uint8 array as a PNG (filter 0 rows,
    stdlib zlib deflate). Inverse of `decode_png` — byte-exact roundtrip."""
    import struct
    import zlib

    import numpy as np

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"expected (h, w[, 1|2|3|4]) uint8 array, got shape {arr.shape}")
    channels = arr.shape[2]
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    h, w = arr.shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) prepended to every scanline
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _parse_png(payload: bytes, offset: int = 0, decode: bool = True):
    """Parse ONE PNG stream starting at ``offset``; returns
    ``(pixels, next_offset)`` where next_offset points just past IEND —
    the safe way to walk concatenated-PNG containers (a byte scan for the
    signature could false-match inside compressed IDAT data). With
    ``decode=False`` only the chunk framing is walked (pixels is None) —
    the cheap skip path for frame sampling."""
    import struct
    import zlib

    import numpy as np

    if payload[offset : offset + 8] != _PNG_SIG:
        raise ValueError("not a PNG stream (bad signature)")
    pos = offset + 8
    idat: list[bytes] = []
    w = h = color_type = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8:
                raise ValueError(f"only 8-bit PNG supported, got bit depth {bit_depth}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"unsupported color type {color_type} (palette needs PLTE)")
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    if not decode:
        return None, pos

    channels = _PNG_CHANNELS[color_type]
    bpp = channels  # bytes per pixel at depth 8
    stride = w * channels
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError(f"decompressed to {len(raw)} bytes, expected {h * (stride + 1)}")

    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        fbyte = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, offset=y * (stride + 1) + 1).astype(
            np.int64
        )
        if fbyte == 0:  # None
            cur = line
        elif fbyte == 1:  # Sub: prefix sum per byte-position-mod-bpp
            cur = line.copy()
            for c in range(bpp):
                cur[c::bpp] = np.cumsum(cur[c::bpp])
            cur &= 0xFF
        elif fbyte == 2:  # Up
            cur = (line + prev) & 0xFF
        elif fbyte == 3:  # Average — sequential in x (depends on left neighbor)
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif fbyte == 4:  # Paeth — sequential in x
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0  # left
                b = prev[x]  # up
                c = prev[x - bpp] if x >= bpp else 0  # up-left
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {fbyte} on row {y}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    pixels = out.reshape(h, w, channels)
    return pixels, pos


def decode_png(payload: bytes):
    """Decode a PNG payload to an (h, w, channels) uint8 array."""
    pixels, _ = _parse_png(payload, 0)
    return pixels


def decode_image(payload: bytes):
    """Decode a compressed image payload. PNG is decoded natively (stdlib
    zlib + numpy — see `decode_png`); other codecs (JPEG) would need a
    library not present in this container and raise ValueError."""
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    raise ValueError("unsupported image codec (PNG supported natively; JPEG needs libjpeg)")


def sample_frames(payload: bytes, every: int = 2):
    """Keyframe-style sampler over a motion-PNG container (concatenated
    PNG frames): walks the chunk structure frame-by-frame (never a raw
    signature scan — compressed IDAT bytes can false-match), decodes every
    ``every``-th frame, skips the rest cheaply (header parse only), and
    returns a stacked (n_sampled, h, w, channels) array."""
    import numpy as np

    frames = []
    offset, i = 0, 0
    while offset < len(payload):
        want = i % every == 0
        pixels, offset = _parse_png(payload, offset, decode=want)
        if want:
            frames.append(pixels)
        i += 1
    if not frames:
        raise ValueError("no PNG frames in payload")
    return np.stack(frames)


# ------------------------- raw-format kernels (REAL — numpy only) ----------
#
# format='rgb8': payload is H*W*3 uint8 bytes, row-major. No codec needed —
# decode is a reshape, resize is nearest-neighbor index math, and a "video"
# is frames stacked along axis 0. These are the exact kernels a production
# pipeline runs AFTER codec decode; here they run end-to-end real.


# ------------------------- WAV codec (REAL — stdlib struct + numpy) --------
#
# RIFF/WAVE with 16-bit PCM: encode writes RIFF/fmt/data chunks; decode
# walks the chunk structure (not a byte scan), validates PCM16, and returns
# the sample array + rate. The audio analogue of the PNG codec above —
# bytes→samples with no third-party library.


def encode_wav(samples, sample_rate: int = 16000, n_channels: int = 1) -> bytes:
    """Encode an int16 sample array as a PCM16 WAV file."""
    import struct

    import numpy as np

    samples = np.ascontiguousarray(samples, dtype=np.int16)
    data = samples.tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16
    )
    riff_body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_wav(payload: bytes):
    """Decode a PCM16 WAV payload → (int16 sample array, sample_rate,
    n_channels). Walks RIFF chunks; rejects compressed formats."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    rate = channels = bits = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
        elif tag == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("truncated WAV (missing fmt/data chunk)")
    return np.frombuffer(data, dtype="<i2"), rate, channels


def wav_features(df: DataFrame) -> DataFrame:
    """Arrow-batched audio feature stage: (doc_id, payload=WAV bytes) →
    (doc_id, n_samples, duration_ms, peak, abs_sum). The production shape
    for audio corpora — decode + per-clip stats, one Arrow batch at a
    time; integer features so results are engine-exact."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("peak", T.LongType()),
            T.StructField("abs_sum", T.LongType()),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {k: [] for k in ("doc_id", "n_samples", "duration_ms", "peak", "abs_sum")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, rate, _ch = decode_wav(bytes(payload))
                a = np.abs(samples.astype(np.int64))
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(samples))
                out["duration_ms"].append(len(samples) * 1000 // rate)
                out["peak"].append(int(a.max()) if len(a) else 0)
                out["abs_sum"].append(int(a.sum()))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, out_schema)


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


def encode_rgb_png(df: DataFrame, src_w: int, src_h: int) -> DataFrame:
    """Arrow-batched PNG ENCODE stage: (doc_id, payload=raw rgb8 bytes) →
    (doc_id, payload=PNG bytes). The corpus-preparation half of a real
    image pipeline — pixels in, compressed artifacts out."""
    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            encoded = [
                encode_png(decode_raw_rgb(p, src_w, src_h)) for p in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": encoded})

    return df.mapInPandas(batches, out_schema)


def png_thumbnail(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Arrow-batched compressed-image pipeline: PNG DECODE (stdlib zlib +
    unfilter) → nearest-neighbor resize → per-thumbnail stats. Same output
    schema as `thumbnail_frame`, but the input column holds real PNG bytes
    — the bytes→pixels step is no longer a reshape but a codec."""
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
            out = {k: [] for k in ("doc_id", "out_w", "out_h", "px_sum", "top_left", "bottom_right")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_png(bytes(payload))
                thumb = resize_nearest(img, out_w, out_h)
                out["doc_id"].append(doc_id)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["px_sum"].append(int(thumb.astype("int64").sum()))
                out["top_left"].append(int(thumb[0, 0, 0]))
                out["bottom_right"].append(int(thumb[-1, -1, -1]))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, out_schema)


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    `mapInPandas` — THE production shape for media kernels: the pandas
    iterator sees one Arrow batch at a time (bounded memory), output schema
    is explicit, and partitioning is inherited (no shuffle).

    Features are a deterministic function of the bytes (length, additive
    checksum, byte probes) — SQL-re-derivable, so the whole Python path is
    hash-checked (l5_feature_extraction); a learned encoder slots into the
    same batch loop with only the output schema changing.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            payloads = pdf["payload"]
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


def encode_gray_png(df: DataFrame, src_w: int, src_h: int) -> DataFrame:
    """Arrow-batched PNG ENCODE for 8-bit GRAYSCALE tiles: (doc_id,
    payload=raw gray bytes, row-major w×h) → (doc_id, payload=PNG bytes).
    Same contract as :func:`encode_rgb_png` with color type 0."""
    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            encoded = [
                encode_png(
                    np.frombuffer(bytes(p)[: src_w * src_h], dtype=np.uint8).reshape(
                        src_h, src_w
                    )
                )
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": encoded})

    return df.mapInPandas(batches, out_schema)


def dhash64_png(df: DataFrame, w: int, h: int) -> DataFrame:
    """Arrow-batched perceptual DIFFERENCE HASH over compressed images:
    PNG decode (stdlib inflate + unfilter) → 64-bit dHash. Bit k (k =
    8·r + c) is set when pixel (2r, c) < pixel (2r, c+1) — 8 sampled rows
    × 8 horizontal gradients, the standard dHash family: stable under
    re-encoding and small brightness shifts, so hamming-close hashes ≈
    visually-near-duplicate images. Returns (doc_id, phash: long) with
    bit 63 in the int64 sign position (the layout
    :func:`retail_datalakehouse_spark.operators.minhash.simhash_near_dup_pairs`
    bands on — image near-dup clustering reuses the text pipeline's
    banded hamming machinery unchanged)."""
    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("phash", T.LongType())]
    )

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        weights = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
        for pdf in it:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_png(bytes(payload))
                a = img.reshape(h, w) if img.ndim != 2 else img
                bits = a[0 : 2 * 8 : 2, 0:8] < a[0 : 2 * 8 : 2, 1:9]  # (8 rows, 8 cols)
                # bit k (= 8r + c) weighted-summed in one vectorized dot
                v = np.dot(bits.flatten().astype(np.uint64), weights)
                ids.append(doc_id)
                hashes.append(int(v.astype(np.int64)))
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    return df.mapInPandas(batches, out_schema)


def scene_cuts(payload: bytes, w: int, h: int, threshold: int) -> list[int]:
    """Scene-cut detection over a raw rgb8 frame stack: the 1-based index
    i is a cut iff the summed absolute pixel delta between frame i-1 and
    frame i exceeds ``threshold``. Integer math end-to-end (uint8 deltas
    summed in int64), so any engine recomputes it exactly — the
    curation primitive for segmenting video corpora before per-scene
    sampling/captioning."""
    import numpy as np

    frame_bytes = w * h * 3
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size % frame_bytes != 0:
        raise ValueError("payload is not a whole number of frames")
    frames = arr.reshape(-1, frame_bytes).astype(np.int64)
    deltas = np.abs(frames[1:] - frames[:-1]).sum(axis=1)
    return [int(i) + 1 for i in np.nonzero(deltas > threshold)[0]]


def vad_stats(df: DataFrame, frame: int = 16, threshold: int = 390_000) -> DataFrame:
    """Arrow-batched voice-activity detection: (doc_id, payload=WAV bytes)
    → (doc_id, n_frames, n_active, n_segments). Energy VAD — split the
    PCM16 stream into ``frame``-sample frames, a frame is ACTIVE when its
    sum of absolute amplitudes reaches ``threshold``, and a segment is a
    maximal run of active frames (speech-burst count — what a diarizer or
    silence-trimmer consumes). Integer features, engine-exact; trailing
    samples short of a full frame are dropped. Same production shape as
    :func:`wav_features`: decode + closed-form stats per Arrow batch, no
    per-row Python round trips."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("n_active", T.LongType()),
            T.StructField("n_segments", T.LongType()),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {k: [] for k in ("doc_id", "n_frames", "n_active", "n_segments")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, _rate, _ch = decode_wav(bytes(payload))
                n = (len(samples) // frame) * frame
                a = np.abs(samples[:n].astype(np.int64)).reshape(-1, frame)
                active = a.sum(axis=1) >= threshold
                starts = int(active[0]) + int(np.sum(active[1:] & ~active[:-1])) if len(active) else 0
                out["doc_id"].append(doc_id)
                out["n_frames"].append(len(active))
                out["n_active"].append(int(active.sum()))
                out["n_segments"].append(starts)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, out_schema)


def augment_stats(df: DataFrame, w: int = 8, h: int = 8) -> DataFrame:
    """Arrow-batched image AUGMENTATION stage: (doc_id, payload=raw rgb8)
    → horizontal flip + 90° clockwise rotation, verified by ORDER-SENSITIVE
    checksums (weighted row sums + corner bytes of each augmented image —
    a plain sum would not notice a wrong permutation). The training-data
    shape for vision corpora: deterministic per-item transforms in
    mapInPandas, no Python round trip per pixel, engine-exact integer
    outputs."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("fl_tl", T.LongType()),
            T.StructField("fl_w", T.LongType()),
            T.StructField("rot_tl", T.LongType()),
            T.StructField("rot_w", T.LongType()),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        w_flip = np.arange(1, w + 1, dtype=np.int64)
        # the rotated image is h wide: its row 0 has h pixels, not w
        w_rot = np.arange(1, h + 1, dtype=np.int64)
        for pdf in it:
            out = {k: [] for k in ("doc_id", "fl_tl", "fl_w", "rot_tl", "rot_w")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                a = decode_raw_rgb(bytes(payload), w, h)
                flip = a[:, ::-1, :]            # mirror left-right
                rot = np.rot90(a, k=-1)         # 90° clockwise
                out["doc_id"].append(doc_id)
                out["fl_tl"].append(int(flip[0, 0, 0]))
                out["fl_w"].append(int((w_flip * flip[0, :, 0].astype(np.int64)).sum()))
                out["rot_tl"].append(int(rot[0, 0, 0]))
                out["rot_w"].append(int((w_rot * rot[0, :, 0].astype(np.int64)).sum()))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, out_schema)
