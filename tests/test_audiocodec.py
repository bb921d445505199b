"""Vendored RIFF/WAV codec + real audio features (round-5: the third
application of the vendored-codec playbook after PNG/JPEG)."""

import struct

import numpy as np
import pytest

from goscrape_spark.functions.audiocodec import wav_decode, wav_encode
from goscrape_spark.operators.multimodal import _audio_feature


def test_wav_roundtrip_16bit_exact():
    s = np.array([0.0, 0.5, -0.5, 0.25, -1.0, 0.75])
    dec, rate = wav_decode(wav_encode(s, 8000))
    assert rate == 8000
    assert np.allclose(dec, s)                # k/2^15 values are exact


@pytest.mark.parametrize("bits,tol", [(8, 1 / 128), (16, 1 / 32768),
                                      (24, 1 / (1 << 23)), (32, 1e-9)])
def test_wav_roundtrip_widths(bits, tol):
    rng = np.random.RandomState(7)
    s = rng.uniform(-0.99, 0.99, 256)
    dec, rate = wav_decode(wav_encode(s, 44100, bits=bits))
    assert rate == 44100 and dec.size == 256
    assert np.abs(dec - s).max() <= tol


def test_wav_stereo_downmixes_to_mono():
    s = np.array([0.5, -0.5, 0.25])
    dec, _ = wav_decode(wav_encode(s, 16000, channels=2))
    assert dec.size == 3 and np.allclose(dec, s)


def test_wav_float32_format_3():
    s = np.array([0.1, -0.2, 0.3], dtype=np.float32)
    raw = s.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 22050, 22050 * 4, 4, 32)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw)) +
           b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt +
           b"data" + struct.pack("<I", len(raw)) + raw)
    dec, rate = wav_decode(wav)
    assert rate == 22050 and np.allclose(dec, s.astype(np.float64))


def test_wav_rejects_non_wav_and_compressed():
    assert wav_decode(b"ID3\x04mp3-ish payload") is None
    assert wav_decode(b"OggS\x00vorbis") is None
    assert wav_decode(b"RIFF\x04\x00\x00\x00AVI ") is None
    # WAV container but a compressed (non-PCM) format tag
    fmt = struct.pack("<HHIIHH", 85, 1, 44100, 0, 1, 0)   # 85 = MP3
    wav = (b"RIFF" + struct.pack("<I", 30) + b"WAVE" +
           b"fmt " + struct.pack("<I", len(fmt)) + fmt +
           b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    assert wav_decode(wav) is None


def test_wav_lying_data_size_is_bounded():
    """A data chunk declaring more bytes than exist slices only what is
    present — no overread, still decodes the real frames."""
    wav = bytearray(wav_encode(np.array([0.5, -0.5]), 8000))
    i = bytes(wav).index(b"data") + 4
    wav[i:i + 4] = struct.pack("<I", 1 << 30)
    dec, _ = wav_decode(bytes(wav))
    assert dec.size == 2 and np.allclose(dec, [0.5, -0.5])


def test_audio_feature_dc_signal_hand_values():
    """Constant 0.5 signal, 1 s @ 8 kHz: duration 1, rate 8 kHz, RMS 0.5,
    no zero crossings, all spectral energy at DC."""
    f = _audio_feature(wav_encode(np.full(8000, 0.5), 8000), 12)
    assert np.allclose(f[:5], [1.0, 8.0, 0.5, 0.0, 0.0], atol=1e-9)
    assert np.allclose(f[5:], [1.0, 0, 0, 0, 0, 0, 0], atol=1e-9)


def test_audio_feature_nyquist_square_hand_values():
    """Alternating +-0.5 @ 8 kHz: RMS 0.5, zcr 1.0, centroid at Nyquist,
    all energy in the top band."""
    s = np.tile([0.5, -0.5], 4000)
    f = _audio_feature(wav_encode(s, 8000), 12)
    assert np.allclose(f[:5], [1.0, 8.0, 0.5, 1.0, 1.0], atol=1e-9)
    assert np.allclose(f[5:], [0, 0, 0, 0, 0, 0, 1.0], atol=1e-9)


def test_audio_feature_sine_rms():
    t = np.arange(16000) / 16000.0
    s = 0.8 * np.sin(2 * np.pi * 440 * t)
    f = _audio_feature(wav_encode(s, 16000), 12)
    assert abs(f[2] - 0.8 / np.sqrt(2)) < 1e-3     # RMS of a sine = A/sqrt2
    assert f[0] == pytest.approx(1.0) and f[1] == pytest.approx(16.0)


def test_audio_feature_none_for_garbage():
    assert _audio_feature(b"not audio at all", 12) is None
    assert _audio_feature(b"", 12) is None
