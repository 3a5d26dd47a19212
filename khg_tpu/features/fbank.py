"""Log-mel filterbank features on device.

The reference consumes lhotse-computed 80-dim fbank features and has no
extractor of its own (SURVEY §0.1); this framework computes them on the
TPU: framing is a strided gather, pre-emphasis/windowing are fused
elementwise ops, and the DFT + mel projection are two dense matmuls —
i.e. the whole frontend is GEMM-shaped and lives on the MXU.  A real FFT
would be O(N log N), but for N=512 a dense (N, 2*(N/2+1)) DFT matrix is a
single MXU-friendly GEMM and is faster in practice at batch sizes that
matter.

Defaults follow the Kaldi/lhotse fbank convention: 25 ms windows, 10 ms
shift, preemphasis 0.97, povey window, 80 mel bins, snip_edges=False.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class FbankConfig:
    sample_rate: int = 16000
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    num_mel_bins: int = 80
    low_freq: float = 20.0
    high_freq: float = 0.0  # <= 0: offset from Nyquist
    preemph_coeff: float = 0.97
    window_type: str = "povey"  # povey | hamming | hanning | rectangular
    remove_dc_offset: bool = True
    snip_edges: bool = False
    use_energy: bool = False
    raw_energy: bool = True   # energy before preemphasis/windowing
    energy_floor: float = 0.0  # absolute floor on frame energy (0 = off)
    dither: float = 0.0
    use_log_fbank: bool = True
    use_power: bool = True    # power spectrum; False = magnitude

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000)

    @property
    def fft_size(self) -> int:
        n = 1
        while n < self.frame_length:
            n *= 2
        return n


def _window(cfg: FbankConfig) -> np.ndarray:
    n = cfg.frame_length
    a = 2 * math.pi / (n - 1)
    i = np.arange(n)
    if cfg.window_type == "povey":
        w = (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    elif cfg.window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a * i)
    elif cfg.window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(a * i)
    elif cfg.window_type == "rectangular":
        w = np.ones(n)
    else:
        raise ValueError(cfg.window_type)
    return w.astype(np.float32)


def _mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def mel_banks(cfg: FbankConfig) -> np.ndarray:
    """(num_bins, fft_size//2 + 1) triangular mel filter matrix."""
    num_fft_bins = cfg.fft_size // 2
    nyquist = 0.5 * cfg.sample_rate
    high_freq = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq
    mel_low = _mel_scale(cfg.low_freq)
    mel_high = _mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (cfg.num_mel_bins + 1)
    fft_bin_width = cfg.sample_rate / cfg.fft_size

    bins = np.zeros((cfg.num_mel_bins, num_fft_bins + 1), dtype=np.float32)
    for b in range(cfg.num_mel_bins):
        left = mel_low + b * mel_delta
        center = mel_low + (b + 1) * mel_delta
        right = mel_low + (b + 2) * mel_delta
        for i in range(num_fft_bins):
            mel = _mel_scale(fft_bin_width * i)
            if left < mel < right:
                if mel <= center:
                    bins[b, i] = (mel - left) / (center - left)
                else:
                    bins[b, i] = (right - mel) / (right - center)
    return bins


def _dft_matrices(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT matrices (n_fft, n_fft//2+1) — the GEMM form of rfft."""
    k = np.arange(n_fft // 2 + 1)
    t = np.arange(n_fft)
    ang = -2.0 * np.pi * np.outer(t, k) / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def num_frames(cfg: FbankConfig, num_samples: int) -> int:
    if cfg.snip_edges:
        if num_samples < cfg.frame_length:
            return 0
        return 1 + (num_samples - cfg.frame_length) // cfg.frame_shift
    return (num_samples + cfg.frame_shift // 2) // cfg.frame_shift


@functools.partial(jax.jit, static_argnames=("cfg", "T"))
def _fbank_impl(
    wave: jnp.ndarray,  # (..., num_samples)
    cfg: FbankConfig,
    T: int,
    dither_key: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    frame_len = cfg.frame_length
    shift = cfg.frame_shift
    n_fft = cfg.fft_size
    num_samples = wave.shape[-1]
    if cfg.dither != 0.0 and dither_key is not None:
        wave = wave + cfg.dither * jax.random.normal(
            dither_key, wave.shape, dtype=wave.dtype
        )

    # frame start indices; with snip_edges=False frames are centered and
    # edges reflect
    if cfg.snip_edges:
        starts = jnp.arange(T) * shift
        idx = starts[:, None] + jnp.arange(frame_len)[None, :]
        frames = wave[..., idx]
    else:
        mid = jnp.arange(T) * shift + shift // 2
        offs = jnp.arange(frame_len) - frame_len // 2
        idx = mid[:, None] + offs[None, :]
        # reflect at edges (kaldi-style: mirror without repeating the edge)
        idx = jnp.where(idx < 0, -idx - 1, idx)
        idx = jnp.where(idx >= num_samples, 2 * num_samples - 1 - idx, idx)
        frames = wave[..., idx]

    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    log_energy = None
    if cfg.use_energy and cfg.raw_energy:
        log_energy = _log_energy(frames, cfg)
    if cfg.preemph_coeff != 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - cfg.preemph_coeff * prev
    window = jnp.asarray(_window(cfg))
    frames = frames * window
    if cfg.use_energy and not cfg.raw_energy:
        log_energy = _log_energy(frames, cfg)

    pad = n_fft - frame_len
    if pad:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, pad)])

    cos_m, sin_m = (jnp.asarray(m) for m in _dft_matrices(n_fft))
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, cos_m, precision=hi)
    im = jnp.matmul(frames, sin_m, precision=hi)
    power = jnp.square(re) + jnp.square(im)
    if not cfg.use_power:
        power = jnp.sqrt(power)

    mel = jnp.asarray(mel_banks(cfg))
    feats = jnp.matmul(power, mel.T, precision=hi)
    if cfg.use_log_fbank:
        feats = jnp.log(jnp.maximum(feats, 1.1754944e-38))  # FLT_MIN floor
    if log_energy is not None:
        feats = jnp.concatenate([log_energy[..., None], feats], axis=-1)
    return feats


def _log_energy(frames: jnp.ndarray, cfg: FbankConfig) -> jnp.ndarray:
    """Per-frame log energy with the Kaldi floor semantics (last axis)."""
    e = jnp.sum(jnp.square(frames), axis=-1)
    loge = jnp.log(jnp.maximum(e, 1.1754944e-38))
    if cfg.energy_floor > 0.0:
        loge = jnp.maximum(loge, math.log(cfg.energy_floor))
    return loge


def compute_fbank(
    wave: np.ndarray,
    cfg: FbankConfig = FbankConfig(),
    dither_key: Optional[jnp.ndarray] = None,
) -> np.ndarray:
    """(num_samples,) waveform -> (T, num_mel_bins) log-mel features.

    Dither (cfg.dither > 0) requires an explicit PRNG key — reproducible,
    unlike the reference stack's global RNG.
    """
    T = num_frames(cfg, wave.shape[-1])
    return np.asarray(
        _fbank_impl(jnp.asarray(wave, jnp.float32), cfg, T, dither_key)
    )


def compute_fbank_batch(
    waves: jnp.ndarray,
    cfg: FbankConfig = FbankConfig(),
    dither_key: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, num_samples) equal-length batch -> (B, T, num_mel_bins)."""
    T = num_frames(cfg, waves.shape[-1])
    return _fbank_impl(jnp.asarray(waves, jnp.float32), cfg, T, dither_key)
