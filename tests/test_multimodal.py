"""Multimodal binary-column plumbing tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from iot_simulator_datalake_spark.multimodal import (
    attach_payload, decode_image, extract_features, frame_sample)


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, "fake jpeg bytes here"), (2, "another payload")],
        ["doc_id", "content"])
    return attach_payload(df, "content", media_type="image", fmt="jpeg")


def test_attach_payload_shape(media):
    row = media.filter(F.col("doc_id") == 1).collect()[0]
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["media"]["media_type"] == "image"
    assert row["media"]["format"] == "jpeg"
    assert row["media"]["n_bytes"] == len(b"fake jpeg bytes here")


def test_extract_features_deterministic(media):
    rows = {r["doc_id"]: r for r in extract_features(media).collect()}
    payload = b"fake jpeg bytes here"
    assert rows[1]["n_bytes"] == len(payload)
    assert rows[1]["digest"] == hashlib.md5(payload).hexdigest()
    d = hashlib.md5(payload).digest()
    assert rows[1]["width"] == 64 + d[0] % 192
    assert rows[1]["height"] == 64 + d[1] % 192
    # stable across runs
    again = {r["doc_id"]: r["digest"]
             for r in extract_features(media).collect()}
    assert again == {k: v["digest"] for k, v in rows.items()}


def test_repartition_by_bytes(spark):
    from iot_simulator_datalake_spark.multimodal import (
        attach_payload, repartition_by_bytes)
    rows = [(i, "x" * 1000) for i in range(100)]    # 100 KB of payload
    df = attach_payload(spark.createDataFrame(rows, ["id", "content"]),
                        "content")
    out = repartition_by_bytes(df, target_partition_bytes=30_000)
    assert out.rdd.getNumPartitions() == 4          # ceil(100k/30k)
    assert out.count() == 100
    # empty frame degrades to one partition
    empty = repartition_by_bytes(df.filter("id < 0"),
                                 target_partition_bytes=30_000)
    assert empty.rdd.getNumPartitions() == 1


def test_repartition_by_bytes_bounds_partition_bytes(spark):
    """The skew case the operator exists for: one giant payload among
    small ones.  Byte-aware placement must isolate the giant (its
    partition carries ~its own bytes, not giant + an equal-row share)
    and bound every other partition near the target."""
    from pyspark.sql import functions as F
    from iot_simulator_datalake_spark.multimodal import (
        attach_payload, repartition_by_bytes)
    rows = [(0, "G" * 100_000)] + [(i, "x" * 100) for i in range(1, 401)]
    df = attach_payload(spark.createDataFrame(rows, ["id", "content"]),
                        "content")
    out = repartition_by_bytes(df, target_partition_bytes=20_000,
                               order_col="id")
    sizes = (out.withColumn("_p", F.spark_partition_id())
             .groupBy("_p").agg(F.sum("media.n_bytes").alias("b"))
             .collect())
    per_part = sorted(r["b"] for r in sizes)
    # giant row alone in its partition; everything else ≈ target-bounded
    # (round-robin is even ± a few rows per input split, so allow 50%
    # slack — the point is the giant no longer drags an equal-row
    # share, and no small partition is anywhere near giant-sized)
    assert per_part[-1] == 100_000
    assert all(b <= 30_000 for b in per_part[:-1])
    assert out.count() == 401


def test_extract_features_null_payload_row_preserved(spark):
    from iot_simulator_datalake_spark.multimodal import (
        extract_features, frame_sample)
    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, None)],
        "doc_id long, payload binary")
    rows = {r["doc_id"]: r for r in extract_features(df).collect()}
    assert rows[1]["n_bytes"] == 3 and rows[1]["digest"] is not None
    assert rows[2]["n_bytes"] is None and rows[2]["digest"] is None
    # frame_sample: null payload → zero frames, no crash
    frames = frame_sample(df, frame_bytes=2).collect()
    assert {f["doc_id"] for f in frames} == {1}


def test_decode_raises_per_undecodable_payload(media):
    """r9: decode_image is no longer a wholesale stub — BMP/P6 decode
    for real — but text payloads (neither magic) must still raise
    NotImplementedError at execution, per payload, not fake pixels."""
    with pytest.raises(Exception) as ei:
        decode_image(media).collect()
    assert "NotImplementedError" in str(ei.value) or \
        isinstance(ei.value, NotImplementedError)


def test_frame_sample_explodes_one_to_k(spark):
    # 600-byte payload / 256-byte frames -> 3 frames (256, 256, 88)
    df = attach_payload(
        spark.createDataFrame([(7, "a" * 600)], ["doc_id", "content"]),
        "content", media_type="video")
    rows = sorted(frame_sample(df).collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    assert [r.offset_bytes for r in rows] == [0, 256, 512]
    assert [r.frame_bytes for r in rows] == [256, 256, 88]
    payload = b"a" * 600
    assert rows[1].frame_digest == hashlib.md5(
        payload[256:512]).hexdigest()
    # deterministic across runs
    assert sorted(r.frame_digest for r in frame_sample(df).collect()) == \
        sorted(r.frame_digest for r in rows)


def test_frame_sample_caps_and_custom_decoder(spark):
    df = attach_payload(
        spark.createDataFrame([(1, "x" * 10_000)], ["doc_id", "content"]),
        "content", media_type="video")
    assert frame_sample(df, max_frames=4).count() == 4

    def every_other(buf):   # custom codec: every second 100-byte frame
        for off in range(0, len(buf), 200):
            yield off, buf[off:off + 100]

    rows = frame_sample(df, decoder=every_other, max_frames=100).collect()
    assert len(rows) == 50
    assert all(r.frame_bytes == 100 for r in rows)
    assert rows[0].offset_bytes % 200 == 0
    # the cap binds for CUSTOM decoders too — previously only the fake
    # decoder honored it, so a real codec on a long video was unbounded
    assert frame_sample(df, decoder=every_other, max_frames=7).count() == 7


def test_extract_features_string_ids(spark):
    """id columns of any type must flow through — a hardcoded
    'doc_id long' schema crashed Arrow for string/UUID ids."""
    df = attach_payload(
        spark.createDataFrame([("u-1", "abc"), ("u-2", "defg")],
                              ["uid", "content"]), "content")
    out = {r["uid"]: r["n_bytes"]
           for r in extract_features(df, id_col="uid").collect()}
    assert out == {"u-1": 3, "u-2": 4}
    fr = frame_sample(df, id_col="uid", frame_bytes=2).collect()
    assert {r["uid"] for r in fr} == {"u-1", "u-2"}


def test_repartition_by_bytes_isolates_every_giant(spark):
    """ADVICE r4: round-robin repartition(n) starts each input
    partition at its own offset, so two giants could pile into one
    task.  Range placement on a unique key must put each giant in a
    partition of its own — checked directly via spark_partition_id."""
    from pyspark.sql import functions as F
    from iot_simulator_datalake_spark.multimodal import (
        attach_payload, repartition_by_bytes)
    # 8 giants spread across many input partitions + small filler
    rows = ([(i, "G" * 50_000) for i in range(8)]
            + [(i, "x" * 100) for i in range(8, 408)])
    df = attach_payload(
        spark.createDataFrame(rows, ["id", "content"]).repartition(16),
        "content")
    out = repartition_by_bytes(df, target_partition_bytes=20_000,
                               order_col="id")
    giant_parts = (out.filter(F.col("media.n_bytes") >= 20_000)
                   .withColumn("_p", F.spark_partition_id())
                   .groupBy("_p").count().collect())
    assert len(giant_parts) == 8, giant_parts
    assert all(r["count"] == 1 for r in giant_parts), giant_parts
    assert out.count() == 408


# =========================================================================
# Real stdlib image decode (r9, VERDICT r8 #8)
# =========================================================================

def _pattern(w, h, seed=0):
    return bytes(((seed + 7 * x + 13 * y + c) % 256)
                 for y in range(h) for x in range(w) for c in range(3))


def test_bmp_roundtrip_with_stride_padding():
    from iot_simulator_datalake_spark.multimodal.transforms import (
        _decode_bmp, encode_bmp)
    for w, h in ((7, 5), (4, 4), (1, 1), (3, 2)):
        rgb = _pattern(w, h, seed=w * 31 + h)
        assert _decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)


def test_bmp_top_down_negative_height():
    import struct
    from iot_simulator_datalake_spark.multimodal.transforms import (
        _decode_bmp, encode_bmp)
    rgb = _pattern(3, 2)
    buf = bytearray(encode_bmp(3, 2, rgb))
    # flip to top-down: height := -2, pixel rows reordered to top-first
    struct.pack_into("<i", buf, 22, -2)
    stride = 12
    off = 54
    rows = [bytes(buf[off + i * stride:off + (i + 1) * stride])
            for i in range(2)]
    buf[off:off + 2 * stride] = rows[1] + rows[0]
    assert _decode_bmp(bytes(buf)) == (3, 2, rgb)


def test_ppm_roundtrip_and_comments():
    from iot_simulator_datalake_spark.multimodal.transforms import (
        _decode_ppm, encode_ppm)
    rgb = _pattern(7, 5, seed=9)
    assert _decode_ppm(encode_ppm(7, 5, rgb)) == (7, 5, rgb)
    commented = b"P6\n# fixture\n7 5\n# more\n255\n" + rgb
    assert _decode_ppm(commented) == (7, 5, rgb)


def test_ppm_rejects_nonstandard_maxval_and_bad_delimiter():
    """r10 (ADVICE): maxval != 255 would be silently mis-scaled by the
    /255 tensor normalization → honest NotImplementedError; a CRLF
    after maxval (text-mode Windows writer) would shift the raster by
    one byte → ValueError instead of wrong pixels."""
    import pytest
    from iot_simulator_datalake_spark.multimodal.transforms import (
        _decode_ppm)
    rgb = _pattern(3, 2, seed=4)
    with pytest.raises(NotImplementedError, match="maxval=100"):
        _decode_ppm(b"P6\n3 2\n100\n" + rgb)
    with pytest.raises(NotImplementedError):
        _decode_ppm(b"P6\n3 2\n65535\n" + rgb)   # 16-bit still rejected
    with pytest.raises(ValueError, match="whitespace"):
        _decode_ppm(b"P6\n3 2\n255")    # EOF where delimiter belongs
    # CRLF text-mode writer (header tokens CRLF-delimited): raster
    # bytes are untrustworthy too — must raise, not decode shifted
    with pytest.raises(ValueError, match="CRLF"):
        _decode_ppm(b"P6\r\n3 2\r\n255\r\n" + rgb)
    # r11 (ADVICE r10 false positive): a binary writer using '\r' as
    # the single spec-legal delimiter, with a raster that legitimately
    # STARTS with 0x0A, must decode — the header shows no CRLF
    # evidence, so the old unconditional \r\n check was wrong here
    lf_first = b"\x0a" + _pattern(3, 2, seed=4)[1:]
    assert _decode_ppm(b"P6\n3 2\n255\r" + lf_first) == (3, 2, lf_first)


def test_decode_auto_raises_for_compressed_formats():
    import pytest
    from iot_simulator_datalake_spark.multimodal.transforms import (
        _decode_image_auto)
    with pytest.raises(NotImplementedError):
        _decode_image_auto(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with pytest.raises(NotImplementedError):
        _decode_image_auto(b"\xff\xd8\xff\xe0" + b"\x00" * 32)  # JPEG


def test_decode_image_operator_tensor_and_nulls(spark):
    from iot_simulator_datalake_spark.multimodal.transforms import (
        decode_image, encode_bmp, encode_ppm)
    rgb = _pattern(7, 5, seed=3)
    rows = [(1, encode_bmp(7, 5, rgb)), (2, encode_ppm(7, 5, rgb)),
            (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in decode_image(df).collect()}
    for did in (1, 2):
        r = out[did]
        assert (r["width"], r["height"]) == (7, 5)
        assert len(r["tensor"]) == 7 * 5 * 3
        got = bytes(round(v * 255) for v in r["tensor"])
        assert got == rgb          # decoded pixels ARE the pattern
    assert out[3]["width"] is None and out[3]["tensor"] is None
    # BMP and PPM of the same pixels decode identically
    assert out[1]["tensor"] == out[2]["tensor"]


def test_decode_image_nearest_neighbor_resize(spark):
    from iot_simulator_datalake_spark.multimodal.transforms import (
        decode_image, encode_ppm)
    rgb = _pattern(4, 4, seed=5)
    df = spark.createDataFrame([(1, encode_ppm(4, 4, rgb))],
                               "doc_id long, payload binary")
    r = decode_image(df, size=(2, 2)).collect()[0]
    assert (r["width"], r["height"]) == (2, 2)
    assert len(r["tensor"]) == 2 * 2 * 3
    # NN with xi = (i*4)//2 picks source pixels (0,0),(2,0),(0,2),(2,2)
    def px(x, y):
        i = (y * 4 + x) * 3
        return rgb[i:i + 3]
    want = px(0, 0) + px(2, 0) + px(0, 2) + px(2, 2)
    assert bytes(round(v * 255) for v in r["tensor"]) == want


# =========================================================================
# Real stdlib audio decode (r9)
# =========================================================================

def _pcm(n, seed=0):
    import struct
    return struct.pack(f"<{n}h", *(((seed + 11 * i) % 65536) - 32768
                                   for i in range(n)))


def test_wav_roundtrip_mono_and_stereo():
    from iot_simulator_datalake_spark.multimodal.transforms import (
        _decode_wav, encode_wav)
    pcm = _pcm(50, seed=4)
    assert _decode_wav(encode_wav(16000, 1, pcm)) == (16000, 1, pcm)
    stereo = _pcm(100, seed=8)   # 50 frames x 2 channels interleaved
    assert _decode_wav(encode_wav(8000, 2, stereo)) == (8000, 2, stereo)


def test_wav_rejects_non_16bit_and_non_riff():
    import io
    import wave
    import pytest
    from iot_simulator_datalake_spark.multimodal.transforms import (
        _decode_wav)
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1), w.setsampwidth(1), w.setframerate(8000)
        w.writeframes(b"\x80" * 10)            # 8-bit PCM
    with pytest.raises(NotImplementedError):
        _decode_wav(bio.getvalue())
    with pytest.raises(ValueError):
        _decode_wav(b"OggS" + b"\x00" * 40)


def test_decode_audio_operator_waveform_and_nulls(spark):
    from iot_simulator_datalake_spark.multimodal.transforms import (
        decode_audio, encode_wav)
    import struct
    pcm = _pcm(64, seed=2)
    rows = [(1, encode_wav(16000, 1, pcm)),
            (2, encode_wav(8000, 2, _pcm(64, seed=2))), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in decode_audio(df).collect()}
    r1 = out[1]
    assert (r1["sample_rate"], r1["n_channels"], r1["n_samples"]) == \
        (16000, 1, 64)
    got = struct.pack(f"<{64}h",
                      *(round(v * 32768) for v in r1["waveform"]))
    assert got == pcm                          # decoded samples exact
    # stereo: 64 interleaved samples = 32 frames
    assert (out[2]["n_channels"], out[2]["n_samples"]) == (2, 32)
    assert len(out[2]["waveform"]) == 64
    assert out[3]["sample_rate"] is None and out[3]["waveform"] is None
