"""Multimodal column plumbing: payload construction, REAL header decode,
frame-sample planning, and the (documented) stub feature kernel.

The decode tests validate two independent directions:
- golden bytes -> parser: payloads produced OUTSIDE the package (Python's
  stdlib ``wave`` writer, hand-assembled PNG/JPEG from the specs) must parse
  to the known metadata;
- JVM generator -> parser round-trip: ``png_payload``/``wav_payload``/
  ``jpeg_payload`` column expressions build bytes that the kernel recovers.
"""

from __future__ import annotations

import io
import wave

from pyspark.sql import functions as F

from lmdiskann_jl_spark.operators import multimodal as M


def _golden_wav(sample_rate: int, n_frames: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(b"\x00\x00" * n_frames)
    return buf.getvalue()


def test_sniff_and_parse_golden_bytes():
    # WAV written by the stdlib wave module — fully independent of our
    # generator: 16 kHz mono 16-bit, 8000 frames = 500 ms
    codec, w, h, rate, dur = M.sniff_and_parse(_golden_wav(16_000, 8_000))
    assert (codec, rate, dur) == ("wav", 16_000, 500)
    assert w is None and h is None

    # PNG per the spec: signature + IHDR(640x480)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR"
        + (640).to_bytes(4, "big") + (480).to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00" + b"\x00\x00\x00\x00"
    )
    assert M.sniff_and_parse(png) == ("png", 640, 480, None, None)

    # JPEG with an APP0 segment BEFORE the SOF0 — the marker scan must skip
    # non-frame segments by their length field, not assume SOF-first
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
        + (75).to_bytes(2, "big") + (320).to_bytes(2, "big")
        + b"\x01\x01\x11\x00"
    )
    jpg = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    assert M.sniff_and_parse(jpg) == ("jpeg", 320, 75, None, None)

    # garbage / truncated payloads degrade to all-None, never raise
    assert M.sniff_and_parse(b"\x00\x01\x02") == (None, None, None, None, None)
    assert M.sniff_and_parse(None) == (None, None, None, None, None)
    assert M.sniff_and_parse(b"RIFFxxxx????") == (None, None, None, None, None)


def test_generate_parse_roundtrip(spark):
    media = spark.range(30).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, M.png_payload(F.col("id") + 1, F.col("id") + 2))
        .when(F.col("id") % 3 == 1, M.wav_payload(F.col("id") * 3200))
        .otherwise(M.jpeg_payload(F.col("id") + 100, F.col("id") + 200))
        .alias("payload"),
    )
    rows = {r["media_id"]: r for r in M.decode_media_headers(media).collect()}
    assert len(rows) == 30
    for i, r in rows.items():
        if i % 3 == 0:
            assert (r["codec_detected"], r["width"], r["height"]) == ("png", i + 1, i + 2)
        elif i % 3 == 1:
            # data bytes = 3200*i at 32000 B/s -> i*100 ms
            assert (r["codec_detected"], r["sample_rate"], r["duration_ms"]) == (
                "wav", M.WAV_SAMPLE_RATE, i * 100,
            )
        else:
            assert (r["codec_detected"], r["width"], r["height"]) == ("jpeg", i + 100, i + 200)


def test_frame_plan_zero_duration(spark):
    media = spark.createDataFrame(
        [(1, "video", 3500), (2, "video", 0), (3, "image", 9000), (4, "video", None)],
        "media_id long, modality string, duration_ms long",
    ).withColumn("codec", F.lit("h264")).withColumn("payload", F.lit(b""))
    got = M.frame_sample_plan(media, every_ms=1000).select("media_id", "frame_ts_ms").collect()
    # 0-duration, null-duration, and non-video rows plan no frames
    assert sorted((r["media_id"], r["frame_ts_ms"]) for r in got) == [
        (1, 0), (1, 1000), (1, 2000), (1, 3000),
    ]


def test_stub_feature_extraction_shape(spark):
    media = spark.createDataFrame(
        [(1, "image", "raw", b"abc", None, None, None, None),
         (2, "audio", "raw", None, None, None, None, None)],
        M.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in M.extract_features(media).collect()}
    assert len(rows[1]["features"]) == M.FEATURE_DIM
    assert rows[2]["features"] is None


def test_png_sample_decode_all_filter_types():
    """The defilter kernel must invert every PNG filter type (0-4), not just
    the filter-0 rows our JVM builder emits: construct a 4x5 truecolor PNG
    in Python with one scanline per filter type, compressed with real zlib,
    and assert the decoded pixel bytes equal the original image."""
    import random
    import struct
    import zlib

    from lmdiskann_jl_spark.operators.multimodal import _paeth, _png_pixels

    random.seed(11)
    w, h, bpp = 4, 5, 3
    stride = w * bpp
    img = [[random.randrange(256) for _ in range(stride)] for _ in range(h)]

    raw = bytearray()
    prev = [0] * stride
    for y, line in enumerate(img):
        ftype = y % 5
        raw.append(ftype)
        for i in range(stride):
            left = line[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                enc = line[i]
            elif ftype == 1:
                enc = line[i] - left
            elif ftype == 2:
                enc = line[i] - up
            elif ftype == 3:
                enc = line[i] - (left + up) // 2
            else:
                enc = line[i] - _paeth(left, up, ul)
            raw.append(enc & 0xFF)
        prev = line

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + b"\0\0\0\0"

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert list(_png_pixels(png)) == [v for line in img for v in line]


def test_sample_decode_jpeg_reports_codec_with_null_stats():
    """JPEG entropy decode needs a codec library (the honest boundary lives
    in extract_features' decode_stub=False); the sample kernel must report
    the codec with null statistics rather than raising, so one JPEG row in
    a mixed corpus cannot abort the decode of every PNG/WAV row in the job."""
    from lmdiskann_jl_spark.operators.multimodal import _sample_stats

    assert _sample_stats(b"\xff\xd8\xff\xc0rest-of-jpeg-here") == (
        "jpeg", None, None, None, None, None,
    )


def test_wav_pcm_decode_matches_struct():
    import struct

    from lmdiskann_jl_spark.operators.multimodal import _sample_stats

    samples = [100, -100, 32000, -32000, 7]
    data = struct.pack(f"<{len(samples)}h", *samples)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    codec, n, s, ss, lo, hi = _sample_stats(hdr + data)
    assert (codec, n) == ("wav", 5)
    assert s == sum(samples) and ss == sum(v * v for v in samples)
    assert (lo, hi) == (-32000, 32000)


def test_png_payload_rejects_oversized_single_block(spark):
    """h*(3w+1) > 65535 cannot fit one STORED deflate block — the builder
    must fail LOUDLY instead of emitting a silently corrupt zlib stream."""
    from pyspark.sql import functions as F
    from py4j.protocol import Py4JJavaError

    from lmdiskann_jl_spark.operators import multimodal as M

    df = spark.range(1).select(
        M.png_payload_with_pixels(F.lit(150), F.lit(150), F.lit(7)).alias("p")
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="65535|STORED|assert"):
        df.collect()


def test_wav_pcm_zero_amplitude_encodes_zero_samples(spark):
    """amp % 32768 == 0 must encode PCM sample 0, not a truncated 0x10000."""
    from pyspark.sql import functions as F

    from lmdiskann_jl_spark.operators import multimodal as M

    df = spark.range(1).select(
        M.wav_payload_with_pcm(F.lit(0), F.lit(3)).alias("p")
    )
    payload = bytes(df.collect()[0]["p"])
    from lmdiskann_jl_spark.operators.multimodal import _sample_stats

    codec, n, s, sq, lo, hi = _sample_stats(payload)
    assert (codec, n, s, sq, lo, hi) == ("wav", 6, 0, 0, 0, 0)


def test_byte_budget_layout_shuffle_only_when_over_budget(spark, sf_dir):
    """Round 15: the byte-budget repartition runs only when a source
    partition exceeds the budget; both layouts produce identical rows."""
    import lmdiskann_jl_spark.operators.multimodal as M
    from pyspark.sql import functions as F

    media = M.attach_media_metadata(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").alias("media_id"),
            F.lit("image").alias("modality"),
            F.lit("raw").alias("codec"),
            F.encode("text", "UTF-8").alias("payload"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        )
    )
    kept = M._byte_budget_layout(media, "payload", 128 << 20)
    assert kept.rdd.getNumPartitions() == media.rdd.getNumPartitions()
    forced = M._byte_budget_layout(media, "payload", 1)  # 1-byte budget
    assert forced.rdd.getNumPartitions() > 1
    a = M.extract_features(media).drop("features")
    b = M.extract_features(media, target_partition_bytes=1).drop("features")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
