"""RIFF/WAVE I/O: round-trips, bit depths, chunk tolerance.

The stdlib `wave` module serves as the independent oracle for the
PCM16 wire format; other depths are round-tripped through our own
writer plus hand-built headers.
"""

import struct
import wave as stdlib_wave

import numpy as np
import pytest

from khg_tpu.data.wav import read_wav, wav_info, write_wav


def _sine(n=2000, rate=8000, freq=440.0, amp=12000.0):
    t = np.arange(n) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_pcm16_roundtrip(tmp_path):
    x = _sine()
    p = tmp_path / "a.wav"
    write_wav(p, x, 8000)
    y, rate = read_wav(p)
    assert rate == 8000
    np.testing.assert_allclose(y, np.rint(x), atol=0.5)
    info = wav_info(p)
    assert (info.sample_rate, info.num_channels, info.num_samples) == (
        8000, 1, len(x),
    )
    assert info.bits_per_sample == 16
    assert abs(info.duration - len(x) / 8000) < 1e-9


def test_matches_stdlib_wave_writer(tmp_path):
    # a file written by the stdlib (independent oracle) reads back
    x = np.clip(np.rint(_sine()), -32768, 32767).astype(np.int16)
    p = tmp_path / "std.wav"
    with stdlib_wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(x.tobytes())
    y, rate = read_wav(p)
    assert rate == 16000
    np.testing.assert_array_equal(y.astype(np.int16), x)
    # and a file we wrote reads back through the stdlib
    q = tmp_path / "ours.wav"
    write_wav(q, x.astype(np.float32), 16000)
    with stdlib_wave.open(str(q), "rb") as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        z = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    np.testing.assert_array_equal(z, x)


def test_stereo_roundtrip(tmp_path):
    left, right = _sine(freq=300.0), _sine(freq=700.0)
    p = tmp_path / "st.wav"
    write_wav(p, np.stack([left, right]), 8000)
    y, rate = read_wav(p)
    assert y.shape == (2, len(left))
    np.testing.assert_allclose(y[0], np.rint(left), atol=0.5)
    np.testing.assert_allclose(y[1], np.rint(right), atol=0.5)


def test_normalize_scaling(tmp_path):
    x = _sine()
    p = tmp_path / "n.wav"
    write_wav(p, x / 32768.0, 8000, normalized=True)
    y, _ = read_wav(p, normalize=True)
    np.testing.assert_allclose(y * 32768.0, np.rint(x), atol=0.5)


def _raw_wav(fmt, bits, payload, rate=8000, channels=1, extra_chunks=b""):
    byte_rate = rate * channels * bits // 8
    fmt_chunk = struct.pack(
        "<IHHIIHH", 16, fmt, channels, rate, byte_rate,
        channels * bits // 8, bits,
    )
    body = b"fmt " + fmt_chunk + extra_chunks
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


@pytest.mark.parametrize("bits", [8, 24, 32])
def test_pcm_depths(tmp_path, bits):
    vals = np.array([-1.0, -0.5, 0.0, 0.25, 0.999], dtype=np.float64)
    if bits == 8:
        raw = np.clip(np.rint(vals * 128 + 128), 0, 255).astype(np.uint8)
        payload = raw.tobytes()
    elif bits == 24:
        ints = np.clip(np.rint(vals * (1 << 23)), -(1 << 23), (1 << 23) - 1)
        ints = ints.astype(np.int64)
        payload = b"".join(
            int(v & 0xFFFFFF).to_bytes(3, "little") for v in ints
        )
    else:
        ints = np.clip(
            np.rint(vals * (1 << 31)), -(1 << 31), (1 << 31) - 1
        ).astype("<i4")
        payload = ints.tobytes()
    p = tmp_path / f"d{bits}.wav"
    p.write_bytes(_raw_wav(1, bits, payload))
    y, rate = read_wav(p, normalize=True)
    assert rate == 8000
    np.testing.assert_allclose(y, vals, atol=2.0 / (1 << min(bits, 16)))


def test_ieee_float_and_extra_chunks(tmp_path):
    vals = np.array([-0.7, 0.0, 0.3, 0.95], dtype=np.float32)
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    p = tmp_path / "f.wav"
    p.write_bytes(_raw_wav(3, 32, vals.tobytes(), extra_chunks=extra))
    y, _ = read_wav(p, normalize=True)
    np.testing.assert_allclose(y, vals, rtol=1e-6)


def test_odd_sized_chunk_alignment(tmp_path):
    # chunks are word-aligned: an odd-sized chunk is followed by a pad byte
    vals = np.array([100, -100], dtype="<i2")
    extra = b"note" + struct.pack("<I", 3) + b"abc" + b"\x00"
    p = tmp_path / "odd.wav"
    p.write_bytes(_raw_wav(1, 16, vals.tobytes(), extra_chunks=extra))
    y, _ = read_wav(p)
    np.testing.assert_array_equal(y.astype(np.int16), vals)


def test_rejects_garbage(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"not a wav file at all")
    with pytest.raises(ValueError):
        read_wav(p)
