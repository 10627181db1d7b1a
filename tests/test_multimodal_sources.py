"""Multimodal plumbing tests (fake codec, real Spark mechanics) and
document-source readers."""

from __future__ import annotations

import gzip
import json
import math

import pytest
from pyspark.sql import functions as F

from chromem_go_spark.multimodal import ops as M
from chromem_go_spark.sources import readers as R


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("img-1", "image", M.encode_fake_image(8, 6, seed=1), "s3://x/1"),
        ("img-2", "image", M.encode_fake_image(16, 16, seed=2), "s3://x/2"),
        ("img-3", "image", M.encode_fake_image(4, 4, seed=3), None),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_image_metadata(media_df):
    out = {r["media_id"]: r for r in M.image_metadata(media_df).collect()}
    assert out["img-1"]["width"] == 8 and out["img-1"]["height"] == 6
    assert out["img-2"]["width"] == 16
    assert out["img-1"]["format"] == "fakeimg"
    assert out["img-1"]["n_bytes"] == 16 + 8 * 6
    # passthrough columns intact
    assert out["img-2"]["source_uri"] == "s3://x/2"


def test_resize_images(media_df):
    resized = M.resize_images(media_df, 4, 3)
    meta = {r["media_id"]: r for r in M.image_metadata(resized).collect()}
    assert all(m["width"] == 4 and m["height"] == 3 for m in meta.values())
    # deterministic: same input -> same bytes
    again = {
        r["media_id"]: bytes(r["data"])
        for r in M.resize_images(media_df, 4, 3).collect()
    }
    first = {r["media_id"]: bytes(r["data"]) for r in resized.collect()}
    assert again == first


def test_video_frame_sampling(spark):
    frames = [M.encode_fake_image(4, 4, seed=i) for i in range(7)]
    vid = spark.createDataFrame(
        [("vid-1", "video", M.encode_fake_video(frames), None)], M.MEDIA_SCHEMA
    )
    out = M.sample_video_frames(vid, every_n=3).collect()
    assert [r["frame_idx"] for r in out] == [0, 3, 6]
    assert bytes(out[1]["frame"]) == frames[3]


def test_image_features_feed_knn(spark, media_df):
    """Features are normalized array<float> — directly usable by the kNN
    engine (media similarity search via the vector path)."""
    from chromem_go_spark.operators import knn as K

    feats = M.image_features(media_df, dim=32)
    row = feats.collect()[0]
    assert len(row["embedding"]) == 32
    assert math.isclose(
        sum(x * x for x in row["embedding"]), 1.0, rel_tol=1e-5
    )
    q = [float(x) for x in row["embedding"]]
    top = K.knn_single(feats, q, 1, vec_col="embedding", id_col="media_id").collect()
    assert top[0]["media_id"] == row["media_id"]
    assert top[0]["similarity"] == pytest.approx(1.0, abs=1e-5)


def test_real_format_raises_stub_error(spark):
    # JPEG magic: PNG now decodes for real (see the PNG codec tests), so
    # the stub error covers the formats that still need PIL
    df = spark.createDataFrame(
        [("bad", "image", b"\xff\xd8\xff\xe0" + b"x" * 16, None)], M.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="STUB: real image decoding"):
        M.resize_images(df, 2, 2).collect()


# ---------------------------------------------------------------- sources


def test_read_documents_jsonl_gz(spark, tmp_path):
    """Gzipped JSONL like the reference's wikipedia example
    (examples/rag-wikipedia-ollama/main.go:63-95)."""
    p = tmp_path / "docs.jsonl.gz"
    rows = [
        {"text": "the first doc", "category": "a", "rank": 1},
        {"text": "the second doc", "category": "b", "rank": 2},
    ]
    with gzip.open(p, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    df = R.read_documents_jsonl(
        spark, str(p), content_col="text", metadata_cols=["category", "rank"]
    )
    got = {r["content"]: r for r in df.collect()}
    assert set(got) == {"the first doc", "the second doc"}
    assert got["the first doc"]["metadata"] == {"category": "a", "rank": "1"}
    # derived id is the content md5 (stable re-ingest)
    import hashlib

    assert got["the first doc"]["id"] == hashlib.md5(b"the first doc").hexdigest()
    assert df.schema.fieldNames() == ["id", "metadata", "embedding", "content"]


def test_read_documents_csv(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text("doc_id,text,lang\n1,hello,en\n2,welt,de\n")
    df = R.read_documents_csv(
        spark, str(p), id_col="doc_id", content_col="text", metadata_cols=["lang"]
    )
    got = {r["id"]: r for r in df.collect()}
    assert got["1"]["content"] == "hello"
    assert got["2"]["metadata"] == {"lang": "de"}


def test_to_document_df_ingests_into_collection(spark, tmp_path):
    """Full path: external parquet -> document df -> collection upsert ->
    query."""
    from chromem_go_spark.collection import Collection

    src = spark.createDataFrame(
        [(1, "spark engines", 0.1), (2, "vector search", 0.9)],
        "doc_id long, body string, score double",
    )
    docs = R.to_document_df(
        src, id_col="doc_id", content_col="body", metadata_cols=["score"]
    ).withColumn(
        "embedding",
        F.array(F.lit(0.6).cast("float"), F.lit(0.8).cast("float")),
    )
    c = Collection(spark, "ingested")
    c.add_df(docs)
    assert c.count() == 2
    res = c.query_embedding([0.6, 0.8], 1).collect()
    assert res[0]["similarity"] == pytest.approx(1.0, abs=1e-5)


def test_audio_metadata(spark):
    rows = [
        ("au-1", "audio", M.encode_fake_audio(16000, 48000, seed=1), None),
        ("au-2", "audio", M.encode_fake_audio(8000, 4000, seed=2), None),
    ]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in M.audio_metadata(df).collect()}
    assert got["au-1"]["sample_rate"] == 16000
    assert got["au-1"]["duration_s"] == pytest.approx(3.0)
    assert got["au-2"]["n_samples"] == 4000
    assert got["au-2"]["duration_s"] == pytest.approx(0.5)


# ------------------------------------------------------------- real PNG codec


def _png_with_filters(width, height, pixels, filters):
    """Build a PNG whose scanlines use the GIVEN filter types, applying
    each forward filter in the test — the decoder must invert them all."""
    import struct
    import zlib

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = bytes(width)
    for y in range(height):
        line = pixels[y * width : (y + 1) * width]
        f = filters[y % len(filters)]
        raw.append(f)
        for i in range(width):
            a = line[i - 1] if i >= 1 else 0
            b = prev[i]
            c = prev[i - 1] if i >= 1 else 0
            if f == 0:
                v = line[i]
            elif f == 1:
                v = (line[i] - a) & 0xFF
            elif f == 2:
                v = (line[i] - b) & 0xFF
            elif f == 3:
                v = (line[i] - ((a + b) >> 1)) & 0xFF
            else:
                v = (line[i] - paeth(a, b, c)) & 0xFF
            raw.append(v)
        prev = line

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        M._PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_gray():
    """encode_png_gray -> _decode_png recovers the exact pixel bytes."""
    import hashlib

    for w, h in [(1, 1), (7, 3), (16, 16)]:
        px = (hashlib.sha256(f"{w}x{h}".encode()).digest() * (w * h // 32 + 1))[: w * h]
        data = M.encode_png_gray(w, h, px)
        gw, gh, gpx = M._decode_png(data)
        assert (gw, gh, gpx) == (w, h, px)
        # _decode_image_bytes routes PNGs without PIL
        assert M._decode_image_bytes(data) == (w, h, px)


def test_png_all_filter_types_decode():
    """Scanlines filtered with every PNG filter type (0-4) decode back to
    the original pixels — pins the Sub/Up/Average/Paeth inversions."""
    import hashlib

    w, h = 9, 10
    px = (hashlib.sha256(b"filters").digest() * 3)[: w * h]
    data = _png_with_filters(w, h, px, filters=[0, 1, 2, 3, 4])
    assert M._decode_png(data) == (w, h, px)


def test_png_rgb_to_gray():
    """8-bit RGB PNG decodes via ITU-R 601-2 luma (PIL-compatible)."""
    import struct
    import zlib

    w, h = 4, 2
    rgb = bytes(
        [
            255, 0, 0,   0, 255, 0,   0, 0, 255,   255, 255, 255,
            0, 0, 0,     128, 128, 128,   10, 200, 60,   77, 77, 77,
        ]
    )

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + rgb[y * w * 3 : (y + 1) * w * 3] for y in range(h))
    data = (
        M._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    gw, gh, gpx = M._decode_png(data)
    assert (gw, gh) == (w, h)
    expect = bytes(
        (rgb[i] * 19595 + rgb[i + 1] * 38470 + rgb[i + 2] * 7471) >> 16
        for i in range(0, len(rgb), 3)
    )
    assert gpx == expect
    # PIL cross-check when available (absent in this container)
    try:
        import io

        from PIL import Image

        pil = Image.open(io.BytesIO(data)).convert("L").tobytes()
        assert gpx == pil
    except ImportError:
        pass


def test_png_through_spark_kernels(spark):
    """Real-format smoke through the Spark plumbing: PNG blobs flow
    through image_metadata (format detection + dims) and image_features
    (decode -> feature vector) with no PIL in the container."""
    import hashlib

    rows = []
    for i, (w, h) in enumerate([(5, 4), (8, 8), (3, 9)]):
        px = (hashlib.sha256(f"png{i}".encode()).digest() * (w * h // 32 + 1))[: w * h]
        rows.append((f"png-{i}", "image", M.encode_png_gray(w, h, px), None))
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    meta = {r["media_id"]: r for r in M.image_metadata(df).collect()}
    assert meta["png-0"]["format"] == "png"
    assert (meta["png-0"]["width"], meta["png-0"]["height"]) == (5, 4)
    assert (meta["png-2"]["width"], meta["png-2"]["height"]) == (3, 9)
    feats = M.image_features(df, dim=16).collect()
    assert len(feats) == 3
    for r in feats:
        v = r["embedding"]
        assert len(v) == 16
        assert abs(sum(x * x for x in v) - 1.0) < 1e-5

    # resize accepts PNG input too (re-encoded to the internal format)
    resized = M.resize_images(df, 4, 4).collect()
    for r in resized:
        w2, h2, px2 = M._decode_image_bytes(bytes(r["data"]))
        assert (w2, h2) == (4, 4) and len(px2) == 16


def test_corrupt_png_classified_not_crash(spark):
    """A truncated/corrupt PNG blob is classified 'unknown' by
    image_metadata instead of failing the whole job."""
    rows = [
        ("bad-png", "image", M._PNG_SIG + b"xxxx", None),
        ("ok", "image", M.encode_fake_image(2, 2, seed=1), None),
    ]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in M.image_metadata(df).collect()}
    assert got["bad-png"]["format"] == "unknown"
    assert (got["bad-png"]["width"], got["bad-png"]["height"]) == (0, 0)
    assert got["ok"]["format"] == "fakeimg"


def test_orc_round_trip(spark, tmp_path):
    """ORC source/sink: write a document table as ORC, read it back
    through the source mapper — ids, metadata, embeddings intact."""
    from chromem_go_spark.sources.readers import (
        read_documents_orc,
        to_document_df,
        write_documents,
    )

    src = spark.createDataFrame(
        [("a", "hello world", "en", [0.1, 0.2]), ("b", "hallo welt", "de", [0.3, 0.4])],
        "doc_id string, text string, lang string, embedding array<float>",
    )
    docs = to_document_df(
        src, id_col="doc_id", metadata_cols=["lang"], embedding_col="embedding"
    )
    path = str(tmp_path / "docs_orc")
    write_documents(docs, path, fmt="orc")
    back = read_documents_orc(
        spark, path, id_col="id", content_col="content",
        metadata_cols=None, embedding_col="embedding",
    )
    rows = {r["id"]: r for r in back.collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["content"] == "hello world"
    assert [round(x, 4) for x in rows["a"]["embedding"]] == [0.1, 0.2]


def test_image_dhash_identity_and_brightness_invariance(spark):
    """dHash contract: byte-identical images hash equal; a uniform
    brightness shift (gradient signs preserved, no uint8 clipping)
    leaves the hash unchanged; PNG and FAKEIMG encodings of the SAME
    pixels hash identically (hash is over decoded pixels, not bytes)."""
    import struct

    w, h = 16, 12
    base = bytes((40 + ((x * 7 + y * 11) % 150)) for y in range(h) for x in range(w))
    brighter = bytes(min(b + 30, 255) for b in base)
    fake = M._IMG_MAGIC + struct.pack(">II", w, h) + base
    fake_bright = M._IMG_MAGIC + struct.pack(">II", w, h) + brighter
    png = M.encode_png_gray(w, h, base)
    df = spark.createDataFrame(
        [("base", fake), ("bright", fake_bright), ("png", png)],
        "media_id string, data binary",
    )
    got = {r["media_id"]: r["dhash"] for r in M.image_dhash(df).collect()}
    assert got["base"] == got["png"]
    assert got["base"] == got["bright"]
    assert 0 <= got["base"] < (1 << 56)


def test_image_neardup_pairs_banded_join(spark):
    """Near-dup pairs: identical twins at hamming 0, a one-pixel
    perturbation within the threshold, unrelated images excluded."""
    import struct

    a = M.encode_fake_image(20, 16, seed=1)
    a_twin = M.encode_fake_image(20, 16, seed=1)
    pert = bytearray(a)
    pert[16] ^= 0xFF  # first pixel -> at most one dhash bit
    b = M.encode_fake_image(20, 16, seed=99)
    df = spark.createDataFrame(
        [("a", a), ("a2", a_twin), ("ap", bytes(pert)), ("z", b)],
        "media_id string, data binary",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in M.image_neardup_pairs(df, max_hamming=3).collect()
    }
    assert pairs[("a", "a2")] == 0
    assert pairs.get(("a", "ap"), 99) <= 1
    assert not any("z" in p for p in pairs)


def test_pil_decode_matches_stdlib_png_path(spark):
    """PIL-present path (skip-marked where pillow is absent): a
    LOSSLESS PIL-encoded format (BMP) of the same pixels must decode to
    the same greyscale array as our stdlib PNG codec, and therefore the
    same dHash — proving the pluggable decode path produces identical
    downstream behavior, not just plausible pixels."""
    import io

    Image = pytest.importorskip("PIL.Image", reason="pillow not installed")

    w, h = 16, 12
    px = bytes((x * 7 + y * 11) % 256 for y in range(h) for x in range(w))
    png = M.encode_png_gray(w, h, px)
    img = Image.frombytes("L", (w, h), px)
    buf = io.BytesIO()
    img.save(buf, format="BMP")
    bmp = buf.getvalue()

    assert M._decode_image_bytes(bmp) == (w, h, px) == M._decode_image_bytes(png)
    df = spark.createDataFrame(
        [("png", png), ("bmp", bmp)], "media_id string, data binary"
    )
    got = {r["media_id"]: r["dhash"] for r in M.image_dhash(df).collect()}
    assert got["png"] == got["bmp"]


def test_non_png_without_pil_raises_documented_stub_error():
    """Where pillow is absent, a real non-PNG format fails with the
    DOCUMENTED stub error (graceful dependency degradation), never an
    opaque decode crash."""
    try:
        import PIL  # noqa: F401

        pytest.skip("pillow installed: stub error unreachable")
    except ImportError:
        pass
    jpeg_magic = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    with pytest.raises(NotImplementedError, match="PIL/pillow"):
        M._decode_image_bytes(jpeg_magic)


def test_text_corpus_source_file_and_line_modes(spark, tmp_path):
    """Raw-text source: one doc per file (wholetext) and one per line;
    stable content-hash ids; file provenance in metadata['source']."""
    from chromem_go_spark.sources.readers import read_documents_text

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("first document\nwith two lines\n")
    (d / "b.txt").write_text("second document\n")

    by_file = read_documents_text(spark, str(d), mode="file").collect()
    assert len(by_file) == 2
    contents = {r["content"].strip() for r in by_file}
    assert "second document" in contents
    assert all(r["metadata"]["source"].endswith(".txt") for r in by_file)
    assert all(len(r["id"]) == 32 for r in by_file)  # md5 ids

    by_line = read_documents_text(spark, str(d), mode="line").collect()
    assert {r["content"] for r in by_line} == {
        "first document", "with two lines", "second document",
    }
    # re-ingest stability: same text -> same id
    again = read_documents_text(spark, str(d), mode="line").collect()
    assert {r["id"] for r in again} == {r["id"] for r in by_line}


def test_audio_features_deterministic_and_discriminative(spark):
    """Audio feature kernel: identical PCM -> identical normalized
    vectors; different audio -> different vectors; output feeds the
    vector path (array<float>, unit norm)."""
    import math

    a1 = M.encode_fake_audio(16000, 4000, seed=1)
    a1b = M.encode_fake_audio(16000, 4000, seed=1)
    a2 = M.encode_fake_audio(16000, 4000, seed=2)
    df = spark.createDataFrame(
        [("a", a1), ("a2", a1b), ("b", a2)], "media_id string, data binary"
    )
    got = {r["media_id"]: list(r["embedding"]) for r in M.audio_features(df).collect()}
    assert got["a"] == got["a2"]
    assert got["a"] != got["b"]
    assert len(got["a"]) == 32
    assert abs(math.sqrt(sum(x * x for x in got["a"])) - 1.0) < 1e-5


# ------------------------- acoustic fingerprint near-dup


def test_audio_fingerprint_deterministic_and_sensitive(spark):
    from chromem_go_spark.multimodal.ops import audio_fingerprint, encode_fake_audio

    a = encode_fake_audio(8000, 400, seed=1)
    b = bytearray(a)
    b[16] ^= 0xFF  # one sample in frame 0 -> at most bit 0 flips
    c = encode_fake_audio(8000, 400, seed=2)
    df = spark.createDataFrame(
        [("a1", bytes(a)), ("a2", bytes(a)), ("b", bytes(b)), ("c", bytes(c))],
        "media_id string, data binary",
    )
    fp = {r["media_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    assert fp["a1"] == fp["a2"]
    assert 0 <= fp["a1"] < (1 << 56)
    assert bin(fp["a1"] ^ fp["b"]).count("1") <= 1
    assert fp["a1"] != fp["c"]


def test_audio_neardup_pairs_bands_find_twins(spark):
    from chromem_go_spark.multimodal.ops import audio_neardup_pairs, encode_fake_audio

    a = encode_fake_audio(16000, 456, seed=9)
    near = bytearray(a)
    near[16 + 8] ^= 0x55
    far = encode_fake_audio(16000, 456, seed=10)
    df = spark.createDataFrame(
        [("x", bytes(a)), ("y", bytes(near)), ("z", bytes(far))],
        "media_id string, data binary",
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in audio_neardup_pairs(df, max_hamming=6).collect()}
    assert ("x", "y") in got and got[("x", "y")] <= 2
    assert not any("z" in p for p in got)


def test_audio_fingerprint_rejects_foreign_bytes(spark):
    import pytest as _pytest

    from chromem_go_spark.multimodal.ops import audio_fingerprint

    df = spark.createDataFrame([("q", b"RIFF1234wave")], "media_id string, data binary")
    with _pytest.raises(Exception, match="FAKEAUD|NotImplemented"):
        audio_fingerprint(df).collect()


# ------------------------- video frame-set near-dup


def _mk_video(frame_seeds):
    from chromem_go_spark.multimodal.ops import encode_fake_image, encode_fake_video

    return encode_fake_video(
        [encode_fake_image(16 + s % 5, 12 + s % 3, seed=s) for s in frame_seeds]
    )


def test_video_fingerprints_per_frame(spark):
    from chromem_go_spark.multimodal.ops import video_fingerprints

    df = spark.createDataFrame(
        [("v1", _mk_video([1, 2, 3])), ("v2", _mk_video([1, 2, 3]))],
        "media_id string, data binary",
    )
    fp = video_fingerprints(df).collect()
    assert len(fp) == 6
    by = {}
    for r in fp:
        by.setdefault(r["media_id"], {})[r["frame_idx"]] = r["dhash"]
    assert by["v1"] == by["v2"]  # identical frames -> identical hashes
    assert len(set(by["v1"].values())) == 3  # distinct frames differ


def test_video_neardup_pairs_jaccard(spark):
    from chromem_go_spark.multimodal.ops import video_neardup_pairs

    df = spark.createDataFrame(
        [
            ("a", _mk_video([1, 2, 3, 4])),
            ("b", _mk_video([1, 2, 3, 99])),   # 3 of 5 shots shared -> 0.6
            ("c", _mk_video([50, 51, 52, 53])),
        ],
        "media_id string, data binary",
    )
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in video_neardup_pairs(df, threshold=0.5).collect()}
    assert got[("a", "b")] == pytest.approx(3 / 5)
    assert not any("c" in p for p in got)


def test_video_fingerprints_rejects_foreign_container(spark):
    from chromem_go_spark.multimodal.ops import video_fingerprints

    df = spark.createDataFrame([("x", b"RIFFxxxxAVI ")], "media_id string, data binary")
    with pytest.raises(Exception, match="demux|NotImplemented"):
        video_fingerprints(df).collect()
