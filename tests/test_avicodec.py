"""Vendored AVI/MJPEG container walker + real video frame sampling
(round-5: fourth vendored-codec application; closes the video gate for
one container)."""

import struct

import numpy as np

from goscrape_spark.functions.avicodec import (
    avi_mjpeg_decode,
    avi_mjpeg_encode,
)
from goscrape_spark.functions.imagecodec import jpeg_decode, jpeg_encode


def _frame(v, h=16, w=16):
    return np.full((h, w, 3), v, dtype=np.uint8)


def test_avi_roundtrip_preserves_frames_and_rate():
    frames = [jpeg_encode(_frame(v), 90) for v in (50, 128, 200)]
    dec = avi_mjpeg_decode(avi_mjpeg_encode(frames, 40000))
    assert dec is not None
    got, usec = dec
    assert usec == 40000
    assert [bytes(f) for f in got] == [bytes(f) for f in frames]


def test_avi_rec_list_interleaving():
    """Frames wrapped in LIST 'rec ' groups (the spec's interleave unit)
    must still be collected in order."""
    f1, f2 = jpeg_encode(_frame(10), 85), jpeg_encode(_frame(240), 85)

    def chunk(cid, payload):
        return (cid + struct.pack("<I", len(payload)) + payload +
                (b"\x00" if len(payload) & 1 else b""))

    avih = struct.pack("<I", 33333) + b"\x00" * 52
    rec = b"rec " + chunk(b"00dc", f1) + chunk(b"00dc", f2)
    body = (b"AVI " + chunk(b"LIST", b"hdrl" + chunk(b"avih", avih)) +
            chunk(b"LIST", b"movi" + chunk(b"LIST", rec)))
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    got, usec = avi_mjpeg_decode(avi)
    assert usec == 33333
    assert [bytes(g) for g in got] == [f1, f2]


def test_avi_rejects_non_avi_and_empty():
    assert avi_mjpeg_decode(b"not a riff at all") is None
    assert avi_mjpeg_decode(b"RIFF\x04\x00\x00\x00WAVE") is None
    assert avi_mjpeg_decode(avi_mjpeg_encode([], 40000)) is None  # 0 frames


def test_avi_lying_chunk_size_is_clamped():
    avi = bytearray(avi_mjpeg_encode([jpeg_encode(_frame(99), 80)], 40000))
    i = bytes(avi).index(b"00dc") + 4
    avi[i:i + 4] = struct.pack("<I", 1 << 30)     # frame claims 1 GB
    dec = avi_mjpeg_decode(bytes(avi))
    # clamped to the buffer: either the (truncated) frame or None — but
    # never an overread/allocation of the declared size
    assert dec is None or len(dec[0][0]) < len(avi)


def test_sample_video_frames_real(spark):
    from goscrape_spark.operators.multimodal import sample_video_frames

    frames = [jpeg_encode(_frame(v), 90) for v in (0, 60, 130, 250)]
    avi = avi_mjpeg_encode(frames, 250000)        # 4 frames x 250 ms
    rows = [("vid://ok", "video", bytearray(avi), ("avi", None, None, None)),
            ("vid://bad", "video", bytearray(b"\x00\x01mp4-ish"),
             ("mp4", None, None, None))]
    media = spark.createDataFrame(
        rows, "media_id string, kind string, payload binary, "
              "meta struct<mime:string,width:int,height:int,"
              "duration_ms:int>")
    got = {(r.media_id, r.ts_ms): r for r in
           sample_video_frames(media, every_ms=400, decode="real").collect()}
    # duration 1000 ms, stride 400 -> ts 0/400/800 -> frame idx 0/1/3
    assert set(got) == {("vid://ok", 0), ("vid://ok", 400),
                        ("vid://ok", 800), ("vid://bad", 0)}
    assert got[("vid://bad", 0)].decode_status == "undecodable"
    ok0 = got[("vid://ok", 0)]
    assert (ok0.frame_idx, ok0.height, ok0.width,
            ok0.decode_status) == (0, 16, 16, "real")
    assert got[("vid://ok", 400)].frame_idx == 1
    assert got[("vid://ok", 800)].frame_idx == 3
    # stats match the codec's own decode of that frame
    want = float((jpeg_decode(frames[1]).astype(np.float64)
                  @ np.array([0.299, 0.587, 0.114])).mean())
    assert abs(got[("vid://ok", 400)].mean_lum - want) < 1e-9


def test_sample_video_frames_real_constant_frame_exact():
    """A constant-128 frame survives JPEG bit-exactly (DC-only blocks,
    level shift puts DC at zero), so mean_lum is exactly 128."""
    img = jpeg_decode(jpeg_encode(_frame(128), 75))
    assert (img == 128).all()


def test_sample_video_frames_bomb_header_is_bounded(spark):
    """A crafted avih usec_per_frame of 0xFFFFFFFF would make
    dur_ms = n_frames * usec // 1000 ~ 1.7e7 ms from ONE tiny frame —
    without the MAX_VIDEO_SAMPLES cap the sampling loop iterates
    dur_ms/every_ms times per video (billions for bigger payloads).
    The cap must bound the row count and the task must finish fast."""
    from goscrape_spark.operators.multimodal import (
        MAX_VIDEO_SAMPLES,
        sample_video_frames,
    )

    bomb = avi_mjpeg_encode([jpeg_encode(_frame(77), 80)] * 4, 0xFFFFFFFF)
    media = spark.createDataFrame(
        [("vid://bomb", "video", bytearray(bomb),
          ("avi", None, None, None))],
        "media_id string, kind string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int>")
    rows = sample_video_frames(media, every_ms=1000, decode="real").collect()
    assert 0 < len(rows) <= MAX_VIDEO_SAMPLES
    # all sampled rows still decode the real (single) frame
    assert {r.decode_status for r in rows} == {"real"}
