"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The reference stores text only (images/video are roadmap,
reference README.md:185-187). A 100 TB training-data pipeline needs
media columns as first-class data, so this module supplies the Spark
plumbing — schemas, Arrow-batched ``mapInPandas`` kernels, bounded batch
sizes for large blobs — with the codec layer stubbed:

- This container has no image/audio libraries, so ``decode`` understands
  a deterministic FAKE container format (``FAKEIMG``/``FAKEAUD``, header
  + payload, see :func:`encode_fake_image`) used by tests, and raises a
  clearly-marked ``NotImplementedError`` for real formats unless PIL is
  importable (import-try gated).
- Everything around the codec — schema handling, per-batch NumPy work,
  frame explosion, feature vectors feeding the kNN engine — is real and
  tested.

Scale notes: media rows are big; the kernels set nothing per-row in
Python (one NumPy pass per Arrow batch), and callers should bound
``spark.sql.execution.arrow.maxRecordsPerBatch`` (or pre-repartition by
byte size) so a batch of blobs fits executor memory.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("data", BinaryType()),
        StructField("source_uri", StringType()),
    ]
)

_IMG_MAGIC = b"FAKEIMG1"
_AUD_MAGIC = b"FAKEAUD1"


# ---------------------------------------------------------------- codecs


def encode_fake_image(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic fake image: magic + WxH header + seed-derived payload
    (one byte per pixel). Stands in for JPEG/PNG in tests."""
    payload = hashlib.sha256(f"{width}x{height}:{seed}".encode()).digest()
    body = (payload * ((width * height) // len(payload) + 1))[: width * height]
    return _IMG_MAGIC + struct.pack(">II", width, height) + body


def encode_fake_audio(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    payload = hashlib.sha256(f"{sample_rate}:{n_samples}:{seed}".encode()).digest()
    body = (payload * (n_samples // len(payload) + 1))[:n_samples]
    return _AUD_MAGIC + struct.pack(">II", sample_rate, n_samples) + body


def encode_fake_video(frames: list[bytes]) -> bytes:
    """Fake video = concatenated length-prefixed fake image frames."""
    out = [b"FAKEVID1", struct.pack(">I", len(frames))]
    for fr in frames:
        out.append(struct.pack(">I", len(fr)))
        out.append(fr)
    return b"".join(out)


def _decode_image_bytes(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, pixels). Fake format decodes directly; real image
    formats require PIL (import-try) and otherwise raise the stub error."""
    if data[:8] == _IMG_MAGIC:
        w, h = struct.unpack(">II", data[8:16])
        return w, h, data[16 : 16 + w * h]
    try:
        import io

        from PIL import Image  # noqa: F401

        img = Image.open(io.BytesIO(data)).convert("L")
        return img.width, img.height, img.tobytes()
    except ImportError as e:
        raise NotImplementedError(
            "STUB: real image decoding needs PIL/pillow, which is not in "
            "this container; only the FAKEIMG test format is decodable"
        ) from e


# ---------------------------------------------------------------- operators


def image_metadata(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Decode header metadata (width/height/format/n_bytes) per image.

    One Arrow batch per kernel call; pure-Python header parse per blob
    (cheap — no pixel work)."""
    import pandas as pd

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, width int, height int, format string, n_bytes bigint"

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            meta = {"width": [], "height": [], "format": [], "n_bytes": []}
            for blob in pdf[data_col]:
                b = bytes(blob)
                if b[:8] == _IMG_MAGIC:
                    w, h = struct.unpack(">II", b[8:16])
                    fmt = "fakeimg"
                elif b[:8] == _AUD_MAGIC:
                    w, h, fmt = 0, 0, "fakeaud"
                elif b[:8] == b"FAKEVID1":
                    w, h, fmt = 0, 0, "fakevid"
                else:
                    w, h, fmt = 0, 0, "unknown"
                meta["width"].append(w)
                meta["height"].append(h)
                meta["format"].append(fmt)
                meta["n_bytes"].append(len(b))
            out = pdf.copy()
            for k, v in meta.items():
                out[k] = v
            yield out

    return df.mapInPandas(gen, out_schema)


def resize_images(
    df: DataFrame, target_w: int, target_h: int, data_col: str = "data"
) -> DataFrame:
    """Nearest-neighbor resize of fake images (real formats -> stub error).
    Output replaces the data column; header dims updated."""
    import numpy as np
    import pandas as pd

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_blobs = []
            for blob in pdf[data_col]:
                w, h, px = _decode_image_bytes(bytes(blob))
                img = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
                yi = (np.arange(target_h) * h) // target_h
                xi = (np.arange(target_w) * w) // target_w
                resized = img[yi][:, xi]
                out_blobs.append(
                    _IMG_MAGIC
                    + struct.pack(">II", target_w, target_h)
                    + resized.tobytes()
                )
            out = pdf.copy()
            out[data_col] = out_blobs
            yield out

    return df.mapInPandas(gen, fields)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 2,
    id_col: str = "media_id",
    data_col: str = "data",
) -> DataFrame:
    """Explode fake videos into every-Nth frame rows (media_id, frame_idx,
    frame bytes) — the frame-sampling stage of a video pipeline."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, frame_idx int, frame binary"

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[data_col]):
                b = bytes(blob)
                if b[:8] != b"FAKEVID1":
                    raise NotImplementedError(
                        "STUB: real video demux not available in this container"
                    )
                (n,) = struct.unpack(">I", b[8:12])
                off = 12
                for i in range(n):
                    (ln,) = struct.unpack(">I", b[off : off + 4])
                    off += 4
                    if i % every_n == 0:
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(b[off : off + ln])
                    off += ln
            if ids:
                yield pd.DataFrame(
                    {id_col: ids, "frame_idx": idxs, "frame": frames}
                )

    return df.select(id_col, data_col).mapInPandas(gen, out_schema)


def audio_metadata(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Decode fake-audio headers: sample_rate, n_samples, duration_s.
    Real audio formats would need soundfile/librosa (absent here) — the
    kernel shape is what a real decoder plugs into."""
    import pandas as pd

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, sample_rate int, n_samples bigint, duration_s double"

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sr_l, ns_l, dur_l = [], [], []
            for blob in pdf[data_col]:
                b = bytes(blob)
                if b[:8] != _AUD_MAGIC:
                    raise NotImplementedError(
                        "STUB: real audio decoding needs soundfile/librosa, "
                        "absent in this container; only FAKEAUD decodes"
                    )
                sr, ns = struct.unpack(">II", b[8:16])
                sr_l.append(sr)
                ns_l.append(ns)
                dur_l.append(ns / sr if sr else 0.0)
            out = pdf.copy()
            out["sample_rate"] = sr_l
            out["n_samples"] = ns_l
            out["duration_s"] = dur_l
            yield out

    return df.mapInPandas(gen, out_schema)


def image_features(
    df: DataFrame, dim: int = 64, data_col: str = "data", id_col: str = "media_id"
) -> DataFrame:
    """Deterministic feature vector per image (normalized, ``dim`` floats)
    from a byte-histogram + hash mix — the stand-in for a real vision
    encoder. Output feeds the kNN/ANN engine directly (array<float>),
    which is the point: media similarity search reuses the vector path."""
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, embedding array<float>"

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = []
            for blob in pdf[data_col]:
                w, h, px = _decode_image_bytes(bytes(blob))
                arr = np.frombuffer(px, dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                hist += 1e-9
                vecs.append((hist / np.linalg.norm(hist)).astype(np.float32))
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": vecs})

    return df.select(id_col, data_col).mapInPandas(gen, out_schema)
