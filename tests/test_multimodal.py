"""Multimodal stage tests — schema, batch shape, per-row error
semantics, and constructive feature truth for the real codecs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ragflow_ocr_spark.ops import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    df = mm.media_df(spark, 30, partitions=3).cache()
    df.count()
    yield df
    df.unpersist()


def test_media_table_shape(media):
    assert media.count() == 30
    kinds = dict(
        (r["kind"], r["count"]) for r in media.groupBy("kind").count().collect()
    )
    assert kinds == {"image": 10, "audio": 10, "video": 10}


def test_image_features(media, spark):
    imgs = media.where(F.col("kind") == "image")
    out = imgs.mapInPandas(mm.image_features_stage(), schema=mm.IMAGE_FEATURES_SCHEMA)
    rows = out.collect()
    assert len(rows) == 10
    for r in rows:
        assert r["status"] == "ok"
        assert (r["width"], r["height"]) == (64, 48)
        assert 0 < r["mean_luma"] < 255


def test_image_features_truth(media, spark):
    """Feature values equal the direct numpy computation (constructive)."""
    imgs = media.where(F.col("kind") == "image").limit(3).collect()
    out = {
        r["media_id"]: r
        for r in spark.createDataFrame(imgs)
        .mapInPandas(mm.image_features_stage(), schema=mm.IMAGE_FEATURES_SCHEMA)
        .collect()
    }
    from ragflow_ocr_spark.kernels import pngcodec

    for r in imgs:
        img = pngcodec.decode_png(bytes(r["payload"]))
        assert out[r["media_id"]]["mean_luma"] == round(float(img.mean()), 6)


def test_codec_routes_are_row_errors_not_task_failures(spark):
    """jpeg/bmp/tiff/webp are REAL decode routes now — a valid JPEG
    succeeds, malformed bytes (including a garbage lossy-VP8 chunk)
    become decode-error rows. None of them may raise out of the
    stage."""
    import numpy as np

    from ragflow_ocr_spark.kernels import imgcodecs

    good_jpeg = imgcodecs.encode_jpeg(
        np.full((16, 24), 90, dtype=np.uint8), quality=95
    )
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(good_jpeg), "jpeg", 24, 16, 0),
            (2, "image", bytearray(b"\xff\xd8\xff\xe0jpeg"), "jpeg", 0, 0, 0),
            # well-formed container whose codec chunk is lossy VP8 —
            # the one remaining unbundled image codec (VP8L decodes)
            (
                3,
                "image",
                bytearray(
                    b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00\x00\x00\x00\x00"
                ),
                "webp",
                0,
                0,
                0,
            ),
        ],
        mm.MEDIA_SCHEMA,
    )
    rows = {
        r["media_id"]: r
        for r in df.mapInPandas(
            mm.image_features_stage(), schema=mm.IMAGE_FEATURES_SCHEMA
        ).collect()
    }
    assert rows[1]["status"] == "ok" and abs(rows[1]["mean_luma"] - 90) < 2
    assert rows[2]["status"].startswith("error")
    assert rows[3]["status"] == "error:decode"


def test_thumbnail_roundtrip(media, spark):
    imgs = media.where(F.col("kind") == "image")
    out = imgs.mapInPandas(mm.thumbnail_stage(16), schema=mm.THUMB_SCHEMA).collect()
    from ragflow_ocr_spark.kernels import pngcodec

    for r in out:
        assert r["status"] == "ok"
        th = pngcodec.decode_png(bytes(r["thumb"]))
        assert max(th.shape[:2]) == 16


def test_audio_features(media):
    auds = media.where(F.col("kind") == "audio")
    out = auds.mapInPandas(mm.audio_features_stage(), schema=mm.AUDIO_FEATURES_SCHEMA)
    for r in out.collect():
        assert r["status"] == "ok"
        assert r["n_samples"] == 8000
        # 0.5-amplitude sine: rms ≈ 0.3535, many zero crossings
        assert 0.3 < r["rms"] < 0.4
        assert r["zero_crossings"] > 50


def test_frame_sampling_explodes(media):
    vids = media.where(F.col("kind") == "video")
    out = vids.mapInPandas(
        mm.frame_sample_stage(every_k=2), schema=mm.FRAME_SAMPLE_SCHEMA
    )
    rows = out.collect()
    # 8 frames, every 2nd -> 4 per video × 10 videos
    assert len(rows) == 40
    assert {r["frame_idx"] for r in rows} == {0, 2, 4, 6}
    assert all(r["status"] == "ok" for r in rows)


def test_contract_queries_match_analytic_truth(spark):
    """The multimodal contract queries vs their closed forms (the same
    expressions the DuckDB oracles compute) at sf0.001."""
    sf = "/root/testdata/sf0.001"

    rows = {r["media_id"]: r for r in mm.q_media_image_stats(spark, sf).collect()}
    for did, r in rows.items():
        assert (r["width"], r["height"]) == (64, 48)
        if did % 4 == 1:  # progressive-JPEG constant-value family
            v = 128 + 3 * ((did * 5 + 7) % 42 - 21)
            assert r["mean_luma"] == float(v)
            assert r["std_luma"] == 0.0
        elif did % 16 == 15:  # lossy VP8 WebP flat family (BT.601 map)
            y = 64 + did % 128
            assert r["mean_luma"] == float((298 * (y - 16) + 128) >> 8)
            assert r["std_luma"] == 0.0
        elif did % 16 == 11:  # HEIC two-tone (clipped BT.601 map)
            bt = lambda t: min(255, max(0, (298 * (t - 16) + 128) >> 8))  # noqa: E731
            a, v = bt(did % 256), bt((did * 7 + 13) % 256)
            assert r["mean_luma"] == round((a + v) / 2.0, 6)
            assert r["std_luma"] == round(abs(a - v) / 2.0, 6)
        else:  # two-tone PNG (even, Adam7 for %4==0) / GIF (%16==3)
            a, v = did % 256, (did * 7 + 13) % 256
            assert r["mean_luma"] == round((a + v) / 2.0, 6)
            assert r["std_luma"] == round(abs(a - v) / 2.0, 6)
        assert r["status"] == "ok"

    rows = {r["media_id"]: r for r in mm.q_media_audio_features(spark, sf).collect()}
    for did, r in rows.items():
        if did % 4 == 3:  # MP3 silence family (real Layer III decode)
            spf = 1152 if did % 8 == 3 else 576
            assert r["n_samples"] == spf * (2 + did % 3)
            assert r["rms"] == 0.0 == r["peak"]
            assert r["zero_crossings"] == 0
        elif did % 4 == 1:  # Ogg Vorbis silence family (real decode)
            assert r["n_samples"] == 128 * (1 + did % 3)
            assert r["rms"] == 0.0 == r["peak"]
            assert r["zero_crossings"] == 0
        else:
            amp = (2 * (did % 8191) + 1) / 32768.0
            assert r["rms"] == round(amp, 6) == r["peak"]
            assert r["zero_crossings"] == 7999 and r["n_samples"] == 8000
        assert r["status"] == "ok"

    rows = mm.q_media_frame_sample(spark, sf).collect()
    assert rows
    for r in rows:
        assert r["frame_idx"] % 2 == 0
        if (r["media_id"] % 8 == 7 or r["media_id"] % 16 == 11
                or r["media_id"] % 16 == 13 or r["media_id"] % 16 == 9):
            # animated lossy WebP / V_VP8 webm / avc1 mp4 / hvc1 mp4
            # → BT.601 map
            y = 64 + (r["media_id"] * 31 + r["frame_idx"] * 7) % 128
            assert r["mean_luma"] == float((298 * (y - 16) + 128) >> 8)
        else:
            assert r["mean_luma"] == float(
                (r["media_id"] * 31 + r["frame_idx"] * 7) % 256
            )

    rows = mm.q_media_thumbnail(spark, sf).collect()
    assert rows
    for r in rows:
        assert (r["thumb_w"], r["thumb_h"]) == (16, 12)
        assert r["mean_luma"] == float((r["media_id"] * 5 + 7) % 256)


def test_audio_stage_decodes_wav_container(spark):
    """A WAV-wrapped payload must produce the same features as the
    identical raw PCM payload — the container route is real, not a
    stub (kernels/wavcodec.py)."""
    import numpy as np

    from ragflow_ocr_spark.kernels import wavcodec
    from ragflow_ocr_spark.ops import multimodal as mm

    rng = np.random.default_rng(11)
    pcm_bytes = mm.make_audio_payload(rng)
    pcm = np.frombuffer(pcm_bytes, dtype="<i2")
    rows = [
        (0, "audio", bytearray(pcm_bytes), "pcm_s16le", 0, 0, 16000),
        (1, "audio", bytearray(wavcodec.encode_wav(pcm)), "wav", 0, 0, 16000),
        (2, "audio", bytearray(b"RIFF1234WAVEjunk"), "wav", 0, 0, 16000),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {
        r["media_id"]: r
        for r in df.mapInPandas(
            mm.audio_features_stage(), schema=mm.AUDIO_FEATURES_SCHEMA
        ).collect()
    }
    assert out[0]["status"] == out[1]["status"] == "ok"
    assert out[0]["rms"] == out[1]["rms"]
    assert out[0]["zero_crossings"] == out[1]["zero_crossings"]
    assert out[0]["n_samples"] == out[1]["n_samples"]
    assert out[2]["status"] == "error"  # malformed WAV -> error row


def test_audio_stage_decodes_vorbis_content(spark):
    """A content (non-silence) stereo mixed-block Ogg Vorbis payload
    routes through the SAME feature stage as PCM/WAV/MP3 and matches
    the kernel-direct decode (value correctness of the decode itself
    is pinned against independent models in tests/test_vorbis.py)."""
    import numpy as np

    from ragflow_ocr_spark.kernels import vorbis as V
    from ragflow_ocr_spark.ops import multimodal as mm

    n_parts = V.enc_coded_len(2, 256) // V.ENC_PSIZE
    frames = [
        (0, ((30, 40, 20, 50), (10, 15, 60, 5)),
         [[i % 16, (3 * i) % 16, 7, 12] for i in range(n_parts)]),
        (1, ((25, 25, 25, 25), None),
         [[5, 9, 2, 14]] * (V.enc_coded_len(2, 1024) // V.ENC_PSIZE)),
        None,
        (0, (None, (8, 16, 24, 32)), [[1, 2, 3, 4]] * n_parts),
    ]
    payload = V.encode_vorbis_ex(frames, channels=2, mixed=True)
    pcm, _sr = V.decode_vorbis(payload)
    rows = [
        (0, "audio", bytearray(payload), "vorbis", 0, 0, 16000),
        (1, "audio", bytearray(payload[:100]), "vorbis", 0, 0, 16000),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {
        r["media_id"]: r
        for r in df.mapInPandas(
            mm.audio_features_stage(), schema=mm.AUDIO_FEATURES_SCHEMA
        ).collect()
    }
    assert out[0]["status"] == "ok"
    assert out[0]["n_samples"] == len(pcm)
    assert out[0]["rms"] == round(float(np.sqrt((pcm**2).mean())), 6) > 0
    assert out[0]["peak"] == round(float(np.abs(pcm).max()), 6) > 0
    assert out[1]["status"] == "error"  # truncated Ogg -> error row


def test_frame_stage_decodes_avi_mjpeg(spark):
    """An MJPEG AVI payload goes through the SAME frame-sampling stage
    as the MOCKV1 container — the video demux seam is real for the
    RIFF/MJPEG subset (encode_avi_mjpeg writes it, real MJPEG AVIs
    parse too since unknown chunks are skipped)."""
    import numpy as np

    from ragflow_ocr_spark.kernels import imgcodecs
    from ragflow_ocr_spark.ops import multimodal as mm

    frames = []
    for k in range(6):
        img = np.full((24, 32), 40 * k, dtype=np.uint8)
        frames.append(imgcodecs.encode_jpeg(img, quality=95))
    avi = mm.encode_avi_mjpeg(frames)
    rows = [
        (0, "video", bytearray(avi), "mjpeg", 32, 24, 0),
        (1, "video", bytearray(b"RIFF\x00\x00\x00\x00AVI garbage"), "mjpeg", 0, 0, 0),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = df.mapInPandas(
        mm.frame_sample_stage(every_k=2), schema=mm.FRAME_SAMPLE_SCHEMA
    ).collect()
    ok = sorted(
        (r["frame_idx"], r["mean_luma"]) for r in out if r["media_id"] == 0
    )
    assert [i for i, _ in ok] == [0, 2, 4]  # every 2nd of 6 frames
    # constant frames: JPEG round-trips the constant nearly exactly
    for (idx, luma), want in zip(ok, (0.0, 80.0, 160.0)):
        assert abs(luma - want) < 2.0, (idx, luma)
    assert [r["status"] for r in out if r["media_id"] == 1] == ["error"]


def test_avi_walker_skips_header_lists():
    """A realistic AVI layout (hdrl LIST + junk before movi) yields
    exactly the video chunks."""
    import struct

    from ragflow_ocr_spark.ops import multimodal as mm

    fr = b"\xff\xd8FAKEJPEG"
    hdrl = b"LIST" + struct.pack("<I", 8) + b"hdrlavih"
    junk = b"JUNK" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    movi = b"00dc" + struct.pack("<I", len(fr)) + fr
    movi_list = b"LIST" + struct.pack("<I", 4 + len(movi)) + b"movi" + movi
    body = hdrl + junk + movi_list
    avi = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
    assert list(mm.iter_video_frames(avi)) == [fr]


def test_mp4_mjpeg_mux_demux_roundtrip():
    """ISO-BMFF sample tables (stsd/stsz/stsc/stco) round trip the
    exact frame bytes; non-MJPEG codecs are the unbundled-codec seam;
    garbage containers are per-row ValueErrors."""
    import numpy as np

    from ragflow_ocr_spark.kernels import imgcodecs as ic

    frames = [
        ic.encode_jpeg(np.full((24, 32), 40 * k + 10, np.uint8), quality=95)
        for k in range(5)
    ]
    payload = mm.encode_mp4_mjpeg(frames, 32, 24)
    out = list(mm.iter_video_frames(payload))
    assert out == frames
    with pytest.raises(NotImplementedError, match="codec"):
        list(mm.iter_video_frames(payload.replace(b"jpeg", b"vp09", 1)))
    # avc1 is routed now (kernels/h264) — a relabeled track without an
    # avcC record is malformed, not unbundled
    with pytest.raises(ValueError, match="avcC"):
        list(mm.iter_video_frames(payload.replace(b"jpeg", b"avc1", 1)))
    with pytest.raises(ValueError):
        list(mm.iter_video_frames(b"\x00\x00\x00\x08ftypxxxxxx"))


def test_mp4_multi_chunk_sample_table():
    """General stsc math: two chunks with different samples-per-chunk
    (3 then 2) must map samples to the right offsets."""
    import struct

    import numpy as np

    from ragflow_ocr_spark.kernels import imgcodecs as ic

    frames = [
        ic.encode_jpeg(np.full((8, 8), 30 * k + 5, np.uint8), quality=95)
        for k in range(5)
    ]
    ftyp = mm._box(b"ftyp", b"isom\x00\x00\x02\x00")
    mdat_payload = b"".join(frames)
    base = len(ftyp) + 8
    chunk2_off = base + sum(len(f) for f in frames[:3])
    entry = b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 78
    stsd = mm._box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + mm._box(b"jpeg", entry))
    stsz = mm._box(
        b"stsz",
        b"\x00" * 4 + struct.pack(">II", 0, 5)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stsc = mm._box(
        b"stsc",
        b"\x00" * 4 + struct.pack(">I", 2)
        + struct.pack(">III", 1, 3, 1) + struct.pack(">III", 2, 2, 1),
    )
    stco = mm._box(
        b"stco", b"\x00" * 4 + struct.pack(">I", 2)
        + struct.pack(">II", base, chunk2_off)
    )
    stbl = mm._box(b"stbl", stsd + stsz + stsc + stco)
    moov = mm._box(b"moov", mm._box(b"trak", mm._box(b"mdia", mm._box(b"minf", stbl))))
    payload = ftyp + mm._box(b"mdat", mdat_payload) + moov
    assert list(mm.iter_video_frames(payload)) == frames


def test_webm_mjpeg_mux_demux_roundtrip():
    """EBML/Matroska demux is real: V_MJPEG SimpleBlocks round trip
    exactly; VP8-coded tracks are the unbundled-codec seam; malformed
    EBML is a per-row ValueError."""
    import numpy as np

    from ragflow_ocr_spark.kernels import imgcodecs as ic

    frames = [
        ic.encode_jpeg(np.full((16, 20), 25 * k + 15, np.uint8), quality=95)
        for k in range(4)
    ]
    mkv = mm.encode_webm_mjpeg(frames)
    assert list(mm.iter_video_frames(mkv)) == frames
    with pytest.raises(NotImplementedError, match="codec"):
        list(mm.iter_video_frames(mkv.replace(b"V_MJPEG", b"V_VP9\x00\x00")))
    with pytest.raises(ValueError):
        list(mm.iter_video_frames(mm._EBML_MAGIC + b"\x00\xff\x13"))


def test_webm_vp8_sequence_decodes_keyframes_and_inter_frames():
    """V_VP8 Matroska tracks route through the STATEFUL
    kernels/vp8_inter sequence decoder: flat keyframes reconstruct
    their exact BT.601 values through demux + decode, and genuine
    inter frames (fractional-MV NEWMV / ZEROMV over the flat
    reference) reproduce the prior frame exactly (round-4 seam
    closed). An inter frame FIRST in the stream still fails loudly."""
    from ragflow_ocr_spark.kernels import vp8, vp8_inter

    vals = [70, 140, 200]
    frames = []
    for v in vals:
        frames.append(vp8.encode_vp8_flat_payload(32, 24, (v, 128, 128)))
        frames.append(vp8_inter.encode_vp8_inter_frame(
            32, 24, [{"mode": "new", "mv": (2, 6)} for _ in range(4)]))
    mkv = mm.encode_webm(frames, b"V_VP8")
    out = list(mm.iter_video_frames(mkv))
    assert len(out) == 6
    for i, fr in enumerate(out):
        img = mm._decode_frame(fr)
        exp = (298 * (vals[i // 2] - 16) + 128) >> 8
        assert (img == exp).all(), (i, np.unique(img), exp)
    # an inter frame with no prior keyframe fails loudly at demux-decode
    p_only = vp8_inter.encode_vp8_inter_frame(
        32, 24, [{"mode": "zero"} for _ in range(4)])
    with pytest.raises(ValueError, match="keyframe"):
        list(mm.iter_video_frames(mm.encode_webm([p_only], b"V_VP8")))


def test_webm_through_frame_sample_stage(spark):
    """A webm payload goes through the SAME frame-sampling stage as
    the other containers, with per-frame decode features."""
    import numpy as np

    from ragflow_ocr_spark.kernels import imgcodecs as ic

    frames = [
        ic.encode_jpeg(np.full((16, 20), 60 * k + 30, np.uint8), quality=95)
        for k in range(3)
    ]
    df = spark.createDataFrame(
        [(7, "video", bytearray(mm.encode_webm_mjpeg(frames)), "mjpeg_webm", 20, 16, 0)],
        mm.MEDIA_SCHEMA,
    )
    rows = df.mapInPandas(
        mm.frame_sample_stage(every_k=1), schema=mm.FRAME_SAMPLE_SCHEMA
    ).collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    assert [r["mean_luma"] for r in rows] == [30.0, 90.0, 150.0]


def test_animated_gif_through_frame_sample_stage(spark):
    """Animated GIFs route through the video path: composited frames
    re-encode as PNG and sample through the same stage."""
    import numpy as np

    from ragflow_ocr_spark.kernels import imgcodecs as ic

    frames = [np.full((12, 16), 50 * k + 20, np.uint8) for k in range(4)]
    gif = ic.encode_gif_animation(frames)
    df = spark.createDataFrame(
        [(9, "video", bytearray(gif), "gif_anim", 16, 12, 0)], mm.MEDIA_SCHEMA
    )
    rows = df.mapInPandas(
        mm.frame_sample_stage(every_k=2), schema=mm.FRAME_SAMPLE_SCHEMA
    ).collect()
    assert [(r["frame_idx"], r["mean_luma"]) for r in rows] == [(0, 20.0), (2, 120.0)]
