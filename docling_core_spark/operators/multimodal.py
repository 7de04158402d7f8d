"""Multimodal column operators: image/audio/video as opaque binary + metadata.

The decode step is STUBBED (no image/audio libs in this runtime): behind
``set_decoders()`` any real decoder drops in; the default deterministic fake
derives metadata/features from the bytes alone, so the Spark-side plumbing —
schemas, Arrow batch shapes, partitioning, UDF signatures — is real and
tested end-to-end.

Scale notes:
- binary payloads ride the same Arrow batches as text; batch row count stays
  small (session default 256) so a batch of 1 MB images stays ~256 MB max.
- feature extraction is map-only; frame sampling explodes rows but with a
  bounded fan-out (max_frames), so output size is predictable.
"""

from __future__ import annotations

import hashlib
import json
import struct
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
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

# ---------------------------------------------------------------------------
# Decoder registry (stub by default; swap in PIL/ffmpeg on a real cluster)
# ---------------------------------------------------------------------------


def _stub_image_decode(data: bytes) -> dict:
    """Deterministic fake decode: metadata derived from content hash.

    Real implementation: PIL.Image.open(BytesIO(data)) -> size/mode.
    """
    if not data:
        raise ValueError("empty image payload")
    h = hashlib.sha256(data).digest()
    w = 64 + (struct.unpack("<H", h[0:2])[0] % 1984)  # 64..2047
    ht = 64 + (struct.unpack("<H", h[2:4])[0] % 1984)
    return {"width": w, "height": ht, "format": ["png", "jpeg", "webp"][h[4] % 3], "n_channels": 3}


def _stub_image_features(data: bytes, dim: int = 16) -> list[float]:
    """Deterministic fake embedding (sha256-expanded); real impl: CNN/CLIP."""
    out: list[float] = []
    seed = hashlib.sha256(data).digest()
    i = 0
    while len(out) < dim:
        block = hashlib.sha256(seed + i.to_bytes(4, "little")).digest()
        for k in range(0, 32, 4):
            if len(out) >= dim:
                break
            v = struct.unpack("<I", block[k : k + 4])[0]
            out.append((v / 2**32) * 2 - 1)
        i += 1
    return out


def _stub_video_frame_count(data: bytes) -> int:
    if not data:
        raise ValueError("empty video payload")
    return 1 + (hashlib.sha256(data).digest()[0] % 300)


def parse_image_header(data: bytes) -> Optional[dict]:
    """REAL decode of PNG IHDR / JPEG SOF headers — no PIL needed.

    Same byte-level parsing as sources/doclang_archive._image_size (the
    DocTags page-image path), extended with format + channel count: PNG
    color type maps {gray:1, rgb:3, palette:1, gray+a:2, rgba:4}; JPEG
    channel count is the SOF component byte.  Returns None for anything
    that is not a PNG/JPEG header (caller falls back).
    """
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 26:
        w, h = struct.unpack(">II", data[16:24])
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(data[25], 3)
        return {"width": int(w), "height": int(h), "format": "png", "n_channels": channels}
    if data[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return {
                    "width": int(w),
                    "height": int(h),
                    "format": "jpeg",
                    "n_channels": int(data[i + 9]),
                }
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            i += 2 + seg_len
    return None


def header_image_decode(data: bytes) -> dict:
    """Default image decode: real PNG/JPEG header parsing first, the
    deterministic stub for every other payload (true pixel decode needs
    PIL — env-blocked; swap in via set_decoders on a full runtime)."""
    meta = parse_image_header(bytes(data or b""))
    if meta is not None:
        return meta
    return _stub_image_decode(data)


def png_header_bytes(width: int, height: int, color_type: int = 2) -> bytes:
    """Minimal valid PNG signature + IHDR chunk (deterministic test/demo
    payload with a REAL header)."""
    import zlib

    ihdr = struct.pack(">II", width, height) + bytes([8, color_type, 0, 0, 0])
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def jpeg_header_bytes(width: int, height: int, n_components: int = 3) -> bytes:
    """Minimal JPEG SOI + SOF0 segment (real header, deterministic)."""
    comps = b"".join(bytes([k + 1, 0x11, 0]) for k in range(n_components))
    seg = struct.pack(">HBHHB", 8 + 3 * n_components, 8, height, width, n_components)
    return b"\xff\xd8\xff\xc0" + seg + comps + b"\xff\xd9"


_DECODERS: dict[str, Callable] = {
    "image_decode": header_image_decode,
    "image_features": _stub_image_features,
    "video_frame_count": _stub_video_frame_count,
}


def set_decoders(**decoders: Callable) -> None:
    """Swap in real decoders (e.g. PIL/ffmpeg-backed) on a full runtime."""
    _DECODERS.update(decoders)


# ---------------------------------------------------------------------------
# Operators
# ---------------------------------------------------------------------------

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
        StructField("n_channels", IntegerType()),
        StructField("error", StringType()),
    ]
)


def image_meta_row(media_id: str, data: Optional[bytes], decode: Optional[Callable] = None) -> dict:
    """Pure row-level metadata decode (shared by the UDF and the single-
    process oracle builder so distributed == single-process by construction)."""
    decode = decode or _DECODERS["image_decode"]
    data = bytes(data) if data is not None else b""
    row = {
        "media_id": media_id,
        "n_bytes": len(data),
        "sha256": hashlib.sha256(data).hexdigest(),
        "width": None,
        "height": None,
        "format": None,
        "n_channels": None,
        "error": None,
    }
    try:
        row.update(decode(data))
    except Exception as err:  # noqa: BLE001
        row["error"] = f"{type(err).__name__}: {err}"[:200]
    return row


def image_metadata(media: DataFrame, id_col: str = "media_id", data_col: str = "data") -> DataFrame:
    """Decode image headers into typed metadata (map-only, per-row isolation)."""

    decode = _DECODERS["image_decode"]  # captured at plan time: set_decoders
    # swaps on the driver must reach executors via the serialized closure

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                image_meta_row(mid, data, decode)
                for mid, data in zip(pdf[id_col], pdf[data_col])
            ]
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    return media.select(F_col(id_col), F_col(data_col)).mapInPandas(run, schema=IMAGE_META_SCHEMA)


def F_col(name: str):
    from pyspark.sql import functions as F

    return F.col(name)


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("error", StringType()),
    ]
)


IMAGE_FEATURES_JSON_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("embedding", StringType()),
        StructField("error", StringType()),
    ]
)


def image_features_row(
    media_id: str, data: Optional[bytes], dim: int, as_json: bool, feats: Optional[Callable] = None
) -> dict:
    """Pure row-level feature extraction (shared with the oracle builder)."""
    feats = feats or _DECODERS["image_features"]
    try:
        emb = feats(bytes(data) if data is not None else b"", dim)
        if as_json:
            emb = json.dumps(emb, separators=(",", ":"))
        return {"media_id": media_id, "embedding": emb, "error": None}
    except Exception as err:  # noqa: BLE001
        return {"media_id": media_id, "embedding": None, "error": str(err)[:200]}


def image_features(
    media: DataFrame,
    dim: int = 16,
    id_col: str = "media_id",
    data_col: str = "data",
    as_json: bool = False,
) -> DataFrame:
    """Per-image feature vector (Arrow-batched; swap the stub for a model).

    as_json=True serializes the vector to a JSON string *inside the UDF*
    (python formatting on both the distributed and the single-process-oracle
    side) — the scalar driver-boundary form.
    """
    schema = IMAGE_FEATURES_JSON_SCHEMA if as_json else IMAGE_FEATURES_SCHEMA

    feats = _DECODERS["image_features"]  # captured at plan time (see above)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                image_features_row(mid, data, dim, as_json, feats)
                for mid, data in zip(pdf[id_col], pdf[data_col])
            ]
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return media.select(F_col(id_col), F_col(data_col)).mapInPandas(run, schema=schema)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def iter_video_frames(
    media_id: str,
    data: Optional[bytes],
    max_frames: int = 8,
    fps: float = 30.0,
    count_frames: Optional[Callable] = None,
) -> Iterator[dict]:
    """Pure row-level uniform frame sampling (shared with the oracle builder)."""
    count_frames = count_frames or _DECODERS["video_frame_count"]
    data = bytes(data) if data is not None else b""
    try:
        n = count_frames(data)
    except Exception:  # noqa: BLE001
        return
    take = min(max_frames, n)
    for k in range(take):
        frame_idx = (k * n) // take
        yield {
            "media_id": media_id,
            "frame_idx": frame_idx,
            "ts_ms": int(frame_idx * 1000 / fps),
            "frame": hashlib.sha256(data + frame_idx.to_bytes(4, "little")).digest(),
        }


def sample_video_frames(
    media: DataFrame,
    max_frames: int = 8,
    id_col: str = "media_id",
    data_col: str = "data",
    fps: float = 30.0,
) -> DataFrame:
    """Uniform frame sampling: one output row per sampled frame.

    The stub emits deterministic pseudo-frames (hash-derived bytes); the
    explode shape (bounded fan-out max_frames) is the real contract.
    """

    count_frames = _DECODERS["video_frame_count"]  # captured at plan time

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf[id_col], pdf[data_col]):
                out.extend(iter_video_frames(mid, data, max_frames, fps, count_frames))
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.select(F_col(id_col), F_col(data_col)).mapInPandas(run, schema=FRAME_SCHEMA)


def real_header_media_rows(n_real: int = 20) -> list[tuple[str, bytes]]:
    """Deterministic media rows with REAL PNG/JPEG headers (alternating
    formats, varying dims/color types) — the de-vacuation input that proves
    header_image_decode parses actual image bytes, not just the stub."""
    rows: list[tuple[str, bytes]] = []
    for i in range(n_real):
        w, h = 100 + 13 * i, 80 + 7 * i
        if i % 2 == 0:
            rows.append(
                (f"media-png-{i}", png_header_bytes(w, h, color_type=(0, 2, 6)[i % 3]))
            )
        else:
            rows.append(
                (f"media-jpg-{i}", jpeg_header_bytes(w, h, n_components=1 if i % 3 == 0 else 3))
            )
    return rows


def synthetic_media_df(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary media table for tests/benchmarks: hashed
    pseudo-binary payloads (stub-decoded) PLUS real-PNG/JPEG-header rows
    (header-decoded) — the operator sees a mixed-format corpus.

    Must stay in lockstep with synthetic_media_rows() (the pure-python twin
    used by the single-process oracle builder).
    """
    from pyspark.sql import functions as F

    base = spark.range(n).select(
        F.concat(F.lit("media-"), F.col("id")).alias("media_id"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256).alias("hex"),
    )
    # expand hex digest to a pseudo-binary payload (64..~4k bytes)
    synth = base.select(
        "media_id",
        F.encode(
            F.concat_ws("", F.array_repeat(F.col("hex"), (F.crc32(F.col("hex")) % 64 + 1).cast("int"))),
            "utf-8",
        ).alias("data"),
    )
    real = spark.createDataFrame(
        real_header_media_rows(), "media_id string, data binary"
    )
    return synth.unionByName(real)


def synthetic_media_rows(n: int = 100, seed: int = 42) -> Iterator[dict]:
    """Pure-python twin of synthetic_media_df (sha2/crc32 match Spark's)."""
    import zlib

    for i in range(n):
        hexd = hashlib.sha256(f"{seed}{i}".encode()).hexdigest()
        reps = zlib.crc32(hexd.encode()) % 64 + 1
        yield {"media_id": f"media-{i}", "data": (hexd * reps).encode()}
    for media_id, data in real_header_media_rows():
        yield {"media_id": media_id, "data": data}
