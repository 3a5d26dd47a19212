"""RIFF/WAVE reading and writing — the waveform entry point.

The reference consumes audio through lhotse (egs/yesno/local/
compute_fbank_yesno.py:55) and ships no audio I/O of its own; this
framework needs a dependency-free path from .wav files on disk to the
device fbank frontend (features/fbank.py), so the container format is
implemented here directly: a chunk-walking RIFF parser that accepts PCM
8/16/24/32-bit and IEEE float 32/64-bit, mono or multichannel, and
tolerates the extra chunks (LIST, fact, bext, ...) real corpora contain.

Scaling convention: samples are returned as float32 at int16 scale
(PCM16 sample 1234 -> 1234.0), matching Kaldi's compute-fbank-feats
input convention that our FbankConfig defaults are calibrated to.
Pass normalize=True for the [-1, 1] convention lhotse uses.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from pathlib import Path
from typing import Tuple, Union

import numpy as np

_FMT_PCM = 1
_FMT_IEEE_FLOAT = 3
_FMT_EXTENSIBLE = 0xFFFE


@dataclass(frozen=True)
class WavInfo:
    sample_rate: int
    num_channels: int
    num_samples: int  # per channel
    bits_per_sample: int
    format_tag: int

    @property
    def duration(self) -> float:
        return self.num_samples / self.sample_rate


def _decode_samples(raw: bytes, fmt: int, bits: int) -> np.ndarray:
    """Interleaved sample bytes -> float32 at int16 scale."""
    if fmt == _FMT_IEEE_FLOAT:
        x = np.frombuffer(raw, dtype="<f4" if bits == 32 else "<f8")
        return np.asarray(x, np.float32) * 32768.0
    if fmt != _FMT_PCM:
        raise ValueError(f"unsupported WAVE format tag {fmt}")
    if bits == 16:
        return np.frombuffer(raw, dtype="<i2").astype(np.float32)
    if bits == 8:
        # 8-bit PCM is unsigned, midpoint 128
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
        return (x - 128.0) * 256.0
    if bits == 32:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64)
        return np.asarray(x / 65536.0, np.float32)
    if bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        x = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        x = np.where(x >= 1 << 23, x - (1 << 24), x)
        return np.asarray(x.astype(np.float64) / 256.0, np.float32)
    raise ValueError(f"unsupported PCM bit depth {bits}")


def read_wav(
    path: Union[str, Path], normalize: bool = False
) -> Tuple[np.ndarray, int]:
    """Read a .wav file -> ((num_samples,) or (C, num_samples) float32, rate).

    Mono files return a 1-D array.  Samples are at int16 scale unless
    normalize=True (then [-1, 1], the lhotse convention).
    """
    data = Path(path).read_bytes()
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt_tag = bits = rate = channels = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt_tag == _FMT_EXTENSIBLE and size >= 26:
                # sub-format GUID's first two bytes carry the real tag
                (fmt_tag,) = struct.unpack_from("<H", body, 24)
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_tag is None or payload is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    samples = _decode_samples(payload, fmt_tag, bits)
    if channels > 1:
        samples = samples[: len(samples) - len(samples) % channels]
        samples = samples.reshape(-1, channels).T.copy()
    if normalize:
        samples = samples / 32768.0
    return samples, rate


def wav_info(path: Union[str, Path]) -> WavInfo:
    """Header-only probe (reads the whole file but decodes no samples)."""
    data = Path(path).read_bytes()
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt_tag = bits = rate = channels = None
    data_size = 0
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack_from("<HHI", data, pos + 8)
            (bits,) = struct.unpack_from("<H", data, pos + 8 + 14)
            if fmt_tag == _FMT_EXTENSIBLE and size >= 26:
                (fmt_tag,) = struct.unpack_from("<H", data, pos + 8 + 24)
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)
    if fmt_tag is None:
        raise ValueError(f"{path}: missing fmt chunk")
    bytes_per = (bits // 8) * channels
    return WavInfo(rate, channels, data_size // bytes_per, bits, fmt_tag)


def write_wav(
    path: Union[str, Path],
    samples: np.ndarray,
    sample_rate: int,
    *,
    normalized: bool = False,
) -> None:
    """Write float32 samples as 16-bit PCM.

    samples: (num_samples,) mono or (C, num_samples); at int16 scale
    unless normalized=True (then [-1, 1]).
    """
    x = np.asarray(samples, np.float64)
    if normalized:
        x = x * 32768.0
    if x.ndim == 2:
        channels = x.shape[0]
        x = x.T.reshape(-1)
    else:
        channels = 1
    pcm = np.clip(np.rint(x), -32768, 32767).astype("<i2")
    payload = pcm.tobytes()
    byte_rate = sample_rate * channels * 2
    hdr = b"".join(
        [
            b"RIFF",
            struct.pack("<I", 36 + len(payload)),
            b"WAVE",
            b"fmt ",
            struct.pack(
                "<IHHIIHH", 16, _FMT_PCM, channels, sample_rate, byte_rate,
                channels * 2, 16,
            ),
            b"data",
            struct.pack("<I", len(payload)),
        ]
    )
    Path(path).write_bytes(hdr + payload)
