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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_header(data: bytes) -> tuple[int, int]:
    """(width, height) from IHDR — cheap header-only parse."""
    if data[:8] != _PNG_SIG or data[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    return struct.unpack(">II", data[16:24])


def _decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Minimal pure-stdlib PNG decoder (public spec / RFC 2083): 8-bit
    greyscale / RGB / RGBA, non-interlaced, all five scanline filters.
    Color converts to greyscale with PIL's exact integer ITU-R 601-2
    luma ((R*19595 + G*38470 + B*7471) >> 16), so results agree
    bit-for-bit with ``convert("L")`` when PIL is present.

    This makes one REAL image format decodable with nothing but the
    stdlib — the smoke path for the real-codec plumbing; a production
    deployment swaps in PIL/turbojpeg for breadth and speed.
    """
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = ctype = None
    idat = []
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or ctype not in (0, 2, 6) or interlace != 0:
                raise NotImplementedError(
                    "PNG subset: 8-bit grey/RGB/RGBA, non-interlaced"
                )
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    stride = w * ch
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _ in range(h):
        f = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        out += line
        prev = line
    if ch == 1:
        px = bytes(out)
    else:
        px = bytes(
            (out[i] * 19595 + out[i + 1] * 38470 + out[i + 2] * 7471) >> 16
            for i in range(0, len(out), ch)
        )
    return w, h, px


def encode_png_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Write an 8-bit greyscale non-interlaced PNG (filter 0 scanlines).
    Stdlib-only; used by tests and as a real-format fixture generator."""
    import zlib

    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _decode_image_bytes(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, greyscale pixels). FAKEIMG and PNG decode with no
    dependencies; other real formats require PIL (import-try) and
    otherwise raise the stub error."""
    if data[:8] == _IMG_MAGIC:
        w, h = struct.unpack(">II", data[8:16])
        return w, h, data[16 : 16 + w * h]
    if data[:8] == _PNG_SIG:
        return _decode_png(data)
    try:
        import io

        from PIL import Image  # noqa: F401

        img = Image.open(io.BytesIO(data)).convert("L")
        return img.width, img.height, img.tobytes()
    except ImportError as e:
        raise NotImplementedError(
            "STUB: real image decoding beyond PNG needs PIL/pillow, which "
            "is not in this container; FAKEIMG and 8-bit PNG are decodable"
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
                elif b[:8] == _PNG_SIG:
                    try:
                        w, h = _png_header(b)
                        fmt = "png"
                    except Exception:
                        # corrupt/truncated PNG: classify, don't crash
                        # the whole job (every other branch is total)
                        w, h, fmt = 0, 0, "unknown"
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


def image_dhash(
    df: DataFrame, data_col: str = "data", id_col: str = "media_id", grid: int = 8
) -> DataFrame:
    """Perceptual difference hash (dHash) per image: decode to greyscale,
    nearest-neighbor downsample to a ``grid x grid`` thumbnail (same
    index arithmetic as :func:`resize_images`), then one bit per
    horizontally-adjacent pixel pair — bit ``r*(grid-1)+c`` is set when
    ``thumb[r][c] < thumb[r][c+1]``.  grid=8 gives a 56-bit fingerprint,
    deliberately inside the positive long range so downstream banding /
    SQL replays never fight the sign bit.

    Robust to re-encoding and uniform brightness shifts (gradient signs
    survive both); pairs with the Hamming banding join for near-dup
    detection at corpus scale.  Arrow-batched mapInPandas; per-image
    work is a NumPy reshape + two fancy-index gathers.
    """
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, dhash bigint"
    nbits = grid * (grid - 1)
    if nbits > 63:
        raise ValueError("grid too large: dhash must fit a positive long")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        weights = 1 << np.arange(nbits, dtype=np.uint64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            hashes = []
            for blob in pdf[data_col]:
                w, h, px = _decode_image_bytes(bytes(blob))
                img = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
                yi = (np.arange(grid) * h) // grid
                xi = (np.arange(grid) * w) // grid
                thumb = img[yi][:, xi].astype(np.int16)
                bits = (thumb[:, :-1] < thumb[:, 1:]).ravel()
                hashes.append(int((bits * weights).sum()))
            yield pd.DataFrame({id_col: pdf[id_col], "dhash": hashes})

    return df.select(id_col, data_col).mapInPandas(gen, out_schema)


def image_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    data_col: str = "data",
    id_col: str = "media_id",
    grid: int = 8,
) -> DataFrame:
    """Near-duplicate image pairs: perceptual dHash fingerprints joined
    through the shared Hamming banding engine (exact disjoint-chunk
    pigeonhole join — the same machinery as text simhash, so the plan
    is bucketed and never all-pairs).  Returns (id_a, id_b, hamming).
    """
    from ..operators.dedup import hamming_pairs

    sig = image_dhash(df, data_col=data_col, id_col=id_col, grid=grid)
    return hamming_pairs(sig, "dhash", id_col, max_hamming, bits=grid * (grid - 1))


def audio_features(
    df: DataFrame,
    n_frames: int = 16,
    data_col: str = "data",
    id_col: str = "media_id",
) -> DataFrame:
    """Deterministic audio feature vector: per-frame RMS energy +
    zero-crossing rate over the 8-bit PCM payload (2*n_frames floats,
    L2-normalized) — real DSP on the decodable format, and the stand-in
    kernel shape a real encoder (wav2vec-style) plugs into.  Output
    feeds the kNN/ANN engine directly (array<float>), the same
    media-similarity path as :func:`image_features`."""
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
                b = bytes(blob)
                if b[:8] != _AUD_MAGIC:
                    raise NotImplementedError(
                        "STUB: real audio decoding needs soundfile/librosa, "
                        "absent in this container; only FAKEAUD decodes"
                    )
                _, ns = struct.unpack(">II", b[8:16])
                pcm = np.frombuffer(b[16 : 16 + ns], dtype=np.uint8).astype(
                    np.float64
                )
                pcm = pcm - 128.0  # center 8-bit samples
                # pad to a frame multiple, then (n_frames, frame_len)
                fl = max(1, -(-len(pcm) // n_frames))
                pad = np.zeros(fl * n_frames)
                pad[: len(pcm)] = pcm
                frames = pad.reshape(n_frames, fl)
                rms = np.sqrt((frames**2).mean(axis=1))
                zc = (np.diff(np.signbit(frames), axis=1) != 0).mean(axis=1)
                v = np.concatenate([rms, zc])
                nrm = np.linalg.norm(v)
                vecs.append((v / nrm if nrm > 0 else v).astype(np.float32))
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": vecs})

    return df.select(id_col, data_col).mapInPandas(gen, out_schema)


def audio_fingerprint(
    df: DataFrame,
    n_frames: int = 57,
    data_col: str = "data",
    id_col: str = "media_id",
) -> DataFrame:
    """Acoustic fingerprint (chromaprint-spirit, integer-exact): split
    the centered 8-bit PCM into ``n_frames`` equal frames (zero-padded
    tail), take each frame's integer energy sum((s-128)^2), and emit one
    bit per adjacent frame pair — bit i set when E[i+1] > E[i].  The
    energy-envelope gradient survives re-encoding and uniform gain
    shifts, the same invariance argument as the image dHash; 57 frames
    give a 56-bit fingerprint inside the positive long range.

    All-integer arithmetic end to end, so the fingerprint is replayable
    bit-for-bit in ANSI SQL (no float comparisons near bit boundaries).
    Arrow-batched mapInPandas; per-clip work is one NumPy reshape + sum.
    """
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, afp bigint"
    nbits = n_frames - 1
    if nbits > 63:
        raise ValueError("n_frames too large: fingerprint must fit a positive long")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        weights = 1 << np.arange(nbits, dtype=np.uint64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            fps = []
            for blob in pdf[data_col]:
                b = bytes(blob)
                if b[:8] != _AUD_MAGIC:
                    raise NotImplementedError(
                        "STUB: real audio decoding needs soundfile/librosa, "
                        "absent in this container; only FAKEAUD decodes"
                    )
                _, ns = struct.unpack(">II", b[8:16])
                pcm = np.frombuffer(b[16 : 16 + ns], dtype=np.uint8).astype(np.int64)
                sq = (pcm - 128) ** 2
                fl = max(1, -(-len(sq) // n_frames))
                pad = np.zeros(fl * n_frames, dtype=np.int64)
                pad[: len(sq)] = sq
                energy = pad.reshape(n_frames, fl).sum(axis=1)
                bits = energy[1:] > energy[:-1]
                fps.append(int((bits * weights).sum()))
            yield pd.DataFrame({id_col: pdf[id_col], "afp": fps})

    return df.select(id_col, data_col).mapInPandas(gen, out_schema)


def audio_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    data_col: str = "data",
    id_col: str = "media_id",
    n_frames: int = 57,
) -> DataFrame:
    """Near-duplicate audio pairs: energy-envelope fingerprints joined
    through the shared Hamming banding engine (exact disjoint-chunk
    pigeonhole join — same machinery as text simhash and image dHash,
    so the plan is bucketed and never all-pairs).  Returns
    (id_a, id_b, hamming)."""
    from ..operators.dedup import hamming_pairs

    sig = audio_fingerprint(df, n_frames=n_frames, data_col=data_col, id_col=id_col)
    return hamming_pairs(sig, "afp", id_col, max_hamming, bits=n_frames - 1)


def _dhash_pixels(w: int, h: int, px: bytes, grid: int = 8) -> int:
    """The dHash core shared by image and video fingerprinting:
    nearest-neighbor downsample + horizontal gradient bits."""
    import numpy as np

    img = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    yi = (np.arange(grid) * h) // grid
    xi = (np.arange(grid) * w) // grid
    thumb = img[yi][:, xi].astype(np.int16)
    bits = (thumb[:, :-1] < thumb[:, 1:]).ravel()
    weights = 1 << np.arange(grid * (grid - 1), dtype=np.uint64)
    return int((bits * weights).sum())


def video_fingerprints(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "media_id",
    grid: int = 8,
) -> DataFrame:
    """Per-frame perceptual fingerprints of a video column: demux the
    container, dHash every frame (same kernel as :func:`image_dhash`).
    Returns (id, frame_idx, dhash) — the shot-level signature table
    video dedup joins on.  Arrow-batched mapInPandas."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, frame_idx int, dhash bigint"

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
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
                    w, h, px = _decode_image_bytes(b[off : off + ln])
                    ids.append(mid)
                    idxs.append(i)
                    hashes.append(_dhash_pixels(w, h, px, grid))
                    off += ln
            if ids:
                yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "dhash": hashes})

    return df.select(id_col, data_col).mapInPandas(gen, out_schema)


def video_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    data_col: str = "data",
    id_col: str = "media_id",
    grid: int = 8,
) -> DataFrame:
    """Near-duplicate video pairs by frame-set Jaccard: two videos match
    when the distinct-frame-fingerprint sets overlap by >= threshold —
    re-cut/trimmed/extended copies share most shots even when no single
    byte range does.

    Inverted-index join on the frame dHash (each real-world frame hash
    is rare, so the join is bucket-shaped, never all-pairs), then exact
    Jaccard from the per-video distinct set sizes.  Returns
    (id_a, id_b, jaccard)."""
    sig = video_fingerprints(df, data_col=data_col, id_col=id_col, grid=grid)
    sets = sig.select(id_col, "dhash").distinct()
    sizes = sets.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sets.alias("a")
    b = sets.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.dhash") == F.col("b.dhash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard", F.col("i") / (F.col("sz_a") + F.col("sz_b") - F.col("i"))
        )
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "jaccard")
    )
