"""Multimodal column conventions: image/audio/video as opaque binary
payloads + typed metadata structs.

Convention (the part that matters at 100 TB):

- a modality column is a struct
  ``(payload: binary | NULL, uri: string, media_type: string,
  byte_size: long, meta: struct)`` — payload inline when small,
  dereferenced lazily via ``uri`` when large, so relational stages
  never shuffle blobs they don't read;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages over only the columns they need (schema
  pruning keeps the payload out of every other operator's shuffle).

Decoding: FIVE formats are REAL — binary P6 PPM, 24-bit BMP and
RIFF/WAVE PCM16 (``codecs.py``, uncompressed container grammar),
zlib-DEFLATE PNG with chunk CRC + scanline-filter algebra
(``codecs.py``), and baseline grayscale JPEG with per-image Huffman
tables, DC prediction and the 8x8 DCT (``jpeg.py``) — each exercised
end-to-end with exact-integer arithmetic oracles by the mm_real_*
declared queries. Only the decoders that genuinely need external
codec libs (color/progressive JPEG, MP4) stay behind
``decode_image_stub``: it raises ``NotImplementedError`` when asked
for a real decode and otherwise produces a deterministic fake
(seeded by the payload hash), so the Spark-side plumbing — schema,
batching, partitioning, UDF signature — is real and tested even
where the codec cannot be.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_STRUCT = T.StructType(
    [
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("uri", T.StringType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("byte_size", T.LongType(), True),
    ]
)


def attach_payload_metadata(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    media_type: str = "image/png",
) -> DataFrame:
    """Build the canonical media struct from a source pointer column.

    Payload stays NULL (lazy dereference by uri) — the relational
    layers carry only the ~100-byte struct, and a downstream
    mapInPandas stage fetches bytes for exactly the rows it decodes.
    """
    uri = F.concat_ws(
        "/", F.lit("payloads"), F.col(source_col), F.col(id_col).cast("string")
    )
    return df.withColumn(
        "media",
        F.struct(
            F.lit(None).cast("binary").alias("payload"),
            uri.alias("uri"),
            F.lit(media_type).alias("media_type"),
            F.xxhash64(uri).bitwiseAND(F.lit(0x7FFFFFFF)).alias("byte_size"),
        ),
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("uri", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def _stable_hash(u: str | None) -> int:
    """crc32 — deterministic across processes (Python ``hash`` is
    salted per-process and would make executors disagree)."""
    return zlib.crc32(u.encode()) if u else 0


def _fake_decode(uri: pd.Series) -> pd.DataFrame:
    """Deterministic fake image properties derived from the uri hash.
    Stands in for a real `PIL.Image.open` until the lib is available."""
    h = uri.map(_stable_hash)
    return pd.DataFrame(
        {
            "width": (64 + (h % 1024)).astype("int32"),
            "height": (64 + ((h // 1024) % 1024)).astype("int32"),
            "n_channels": pd.Series([3] * len(uri), dtype="int32"),
            "mean_luma": ((h % 256) / 255.0).astype("float64"),
        }
    )


def decode_image_stub(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id", real: bool = False
) -> DataFrame:
    """Arrow-batched decode stage: mapInPandas over (id, media.uri).

    ``real=True`` is the seam for the decoders that genuinely need
    external codec libs (color/progressive JPEG, MP4) and raises
    NotImplementedError here. FIVE real formats are first-class:
    P6 PPM, 24-bit BMP, RIFF/WAVE PCM16, zlib-DEFLATE PNG
    (``codecs.py``) and baseline grayscale JPEG (``jpeg.py`` — full
    marker/Huffman/DCT pipeline), each with an oracle-checked
    pipeline in ``queries/media_q.py``. The plumbing — column pruning before the
    UDF, batch iteration, typed output schema — is the production
    shape.
    """
    if real:
        raise NotImplementedError(
            "color/progressive JPEG and MP4 decoding require external "
            "codec libs not present in this container; PPM/BMP/WAV/PNG "
            "and baseline grayscale JPEG are real — see "
            "multimodal/codecs.py and multimodal/jpeg.py"
        )
    slim = df.select(
        F.col(id_col).alias("doc_id"), F.col(f"{media_col}.uri").alias("uri")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = _fake_decode(pdf["uri"])
            out.insert(0, "uri", pdf["uri"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return slim.mapInPandas(batches, DECODED_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features_stub(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id", dim: int = 16
) -> DataFrame:
    """Feature-extraction stage stub: deterministic pseudo-embedding
    per uri (seeded), emitted as array<float> — the handoff format the
    similarity operators consume."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for u in pdf["uri"]:
                rng = np.random.default_rng(_stable_hash(u))
                feats.append(rng.standard_normal(dim).astype("float32"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    slim = df.select(
        F.col(id_col).alias("doc_id"), F.col(f"{media_col}.uri").alias("uri")
    )
    return slim.mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("scale", T.DoubleType()),
    ]
)


def resize_image_stub(
    decoded: DataFrame, max_side: int = 256
) -> DataFrame:
    """Resize stage stub: aspect-preserving downscale to ``max_side``
    (no-op when already smaller) computed vectorized per Arrow batch —
    the geometry logic is real, only the pixel resample is stubbed.
    Consumes the decode stage's output (chained mapInPandas stages
    stay in one python-worker pass when nothing reshuffles between
    them)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            w = pdf["width"].to_numpy(dtype="int64")
            h = pdf["height"].to_numpy(dtype="int64")
            side = np.maximum(w, h)
            scale = np.minimum(1.0, max_side / side)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_width": np.rint(w * scale).astype("int32"),
                    "out_height": np.rint(h * scale).astype("int32"),
                    "scale": scale,
                }
            )

    slim = decoded.select("doc_id", "width", "height")
    return slim.mapInPandas(batches, RESIZED_SCHEMA)


def frame_sample_stub(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    every_n: int = 30,
    max_frames: int = 4,
) -> DataFrame:
    """Video frame-sampling stage stub: one output row per sampled
    frame (fan-out inside mapInPandas — the row-expansion shape a real
    ffmpeg sampler needs)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_uri", T.StringType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, u in zip(pdf["doc_id"], pdf["uri"]):
                n = min(max_frames, 1 + (_stable_hash(u) % max_frames))
                for j in range(n):
                    rows.append((doc_id, j * every_n, f"{u}#frame={j * every_n}"))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_uri"])

    slim = df.select(
        F.col(id_col).alias("doc_id"), F.col(f"{media_col}.uri").alias("uri")
    )
    return slim.mapInPandas(batches, schema)
