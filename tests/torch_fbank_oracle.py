"""Independent fbank oracle built on torch primitives.

The feature frontend was previously validated only against a scalar
NumPy oracle written in the same repo by the same author — a correlated
error (mel breakpoints, window normalization, energy floor) would pass
everything and silently shift every downstream number (VERDICT r2).

This oracle shares NO code with khg_tpu.features: framing via
torch tensor advanced indexing, per-frame ops in torch float64, spectrum
via torch.fft.rfft (pocketfft — the device path uses a GEMM DFT), and
mel filter weights re-derived from the published Kaldi formulas
(kaldi/src/feat/mel-computations.cc: mel(f) = 1127 ln(1 + f/700),
num_bins+2 equally spaced mel breakpoints between low_freq and
high_freq, triangular weights over FFT bins strictly inside
(left, right), nyquist bin excluded) and the published window/framing
semantics (kaldi/src/feat/feature-window.cc: snip_edges=False centers
frame t at sample t*shift + shift/2 with single edge reflection; DC
removal -> raw energy -> preemphasis -> window).

The reference consumes lhotse Fbank output computed with these
semantics (/root/reference/egs/yesno/local/compute_fbank_yesno.py:51-58).
"""

import math

import numpy as np
import torch


def torch_mel_banks(cfg) -> torch.Tensor:
    """(num_mel_bins, fft_size//2 + 1) triangular filters, float64."""

    def mel(f: float) -> float:
        return 1127.0 * math.log1p(f / 700.0)

    nyquist = 0.5 * cfg.sample_rate
    high = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq
    m_lo, m_hi = mel(cfg.low_freq), mel(high)
    step = (m_hi - m_lo) / (cfg.num_mel_bins + 1)
    nfft = cfg.fft_size
    half = nfft // 2
    weights = torch.zeros((cfg.num_mel_bins, half + 1), dtype=torch.float64)
    for b in range(cfg.num_mel_bins):
        lo = m_lo + b * step
        mid = m_lo + (b + 1) * step
        hi = m_lo + (b + 2) * step
        for i in range(half):  # nyquist bin (i == half) stays zero
            fm = mel(i * cfg.sample_rate / nfft)
            if lo < fm < hi:
                weights[b, i] = (
                    (fm - lo) / (mid - lo) if fm <= mid else (hi - fm) / (hi - mid)
                )
    return weights


def _torch_window(cfg) -> torch.Tensor:
    n = cfg.frame_length
    i = torch.arange(n, dtype=torch.float64)
    a = 2.0 * math.pi / (n - 1)
    if cfg.window_type == "povey":
        return (0.5 - 0.5 * torch.cos(a * i)) ** 0.85
    if cfg.window_type == "hamming":
        return 0.54 - 0.46 * torch.cos(a * i)
    if cfg.window_type == "hanning":
        return 0.5 - 0.5 * torch.cos(a * i)
    if cfg.window_type == "rectangular":
        return torch.ones(n, dtype=torch.float64)
    raise ValueError(cfg.window_type)


def torch_fbank(wave: np.ndarray, cfg) -> np.ndarray:
    """Kaldi/lhotse-semantics log-mel fbank, all-torch, float64."""
    x = torch.from_numpy(np.asarray(wave)).to(torch.float64)
    n = x.numel()
    flen, shift, nfft = cfg.frame_length, cfg.frame_shift, cfg.fft_size

    if cfg.snip_edges:
        T = 0 if n < flen else 1 + (n - flen) // shift
        idx = (torch.arange(T) * shift)[:, None] + torch.arange(flen)[None, :]
    else:
        T = (n + shift // 2) // shift
        centers = torch.arange(T) * shift + shift // 2
        idx = centers[:, None] + (torch.arange(flen) - flen // 2)[None, :]
        idx = torch.where(idx < 0, -idx - 1, idx)
        idx = torch.where(idx >= n, 2 * n - 1 - idx, idx)
    frames = x[idx]  # (T, flen)

    if cfg.remove_dc_offset:
        frames = frames - frames.mean(dim=1, keepdim=True)

    flt_min = 1.1754944e-38
    log_energy = None
    if cfg.use_energy and cfg.raw_energy:
        log_energy = torch.log((frames * frames).sum(dim=1).clamp_min(flt_min))

    if cfg.preemph_coeff:
        frames = torch.cat(
            [
                frames[:, :1] * (1.0 - cfg.preemph_coeff),
                frames[:, 1:] - cfg.preemph_coeff * frames[:, :-1],
            ],
            dim=1,
        )

    frames = frames * _torch_window(cfg)

    if cfg.use_energy and not cfg.raw_energy:
        log_energy = torch.log((frames * frames).sum(dim=1).clamp_min(flt_min))

    spec = torch.fft.rfft(frames, n=nfft).abs() ** 2
    if not cfg.use_power:
        spec = torch.sqrt(spec)

    feats = spec @ torch_mel_banks(cfg).T
    if cfg.use_log_fbank:
        feats = torch.log(feats.clamp_min(flt_min))

    if cfg.use_energy:
        if cfg.energy_floor > 0:
            log_energy = log_energy.clamp_min(math.log(cfg.energy_floor))
        feats = torch.cat([log_energy[:, None], feats], dim=1)

    return feats.numpy()


def torch_mfcc(wave: np.ndarray, mcfg) -> np.ndarray:
    """Kaldi-semantics MFCC oracle: log-mel via torch_fbank, then an
    explicitly-constructed orthonormal DCT-II (matrix-functions.cc
    ComputeDctMatrix) and liftering (mel-computations.cc
    ComputeLifterCoeffs), energy overwriting c0 when use_energy —
    all torch float64, no khg_tpu.features code."""
    fcfg = mcfg.frontend_cfg()
    logmel = torch.from_numpy(torch_fbank(wave, fcfg))
    energy = None
    if mcfg.use_energy:
        energy, logmel = logmel[:, 0], logmel[:, 1:]

    nbins, nceps = fcfg.num_mel_bins, mcfg.num_ceps
    n = torch.arange(nbins, dtype=torch.float64)
    k = torch.arange(nceps, dtype=torch.float64)[:, None]
    dct = math.sqrt(2.0 / nbins) * torch.cos(
        math.pi / nbins * (n[None, :] + 0.5) * k
    )
    dct[0, :] = math.sqrt(1.0 / nbins)
    ceps = logmel @ dct.T

    if mcfg.cepstral_lifter != 0.0:
        q = mcfg.cepstral_lifter
        lifter = 1.0 + 0.5 * q * torch.sin(
            math.pi * torch.arange(nceps, dtype=torch.float64) / q
        )
        ceps = ceps * lifter
    if energy is not None:
        ceps = torch.cat([energy[:, None], ceps[:, 1:]], dim=1)
    return ceps.numpy()


def torch_deltas(feats: np.ndarray, order: int, window: int) -> np.ndarray:
    """Naive per-frame delta oracle (feature-functions.cc DeltaFeatures):
    scales built by the recursive ramp convolution, frame indices
    clamped at the edges; no vectorized shifts shared with the device
    implementation."""
    x = torch.from_numpy(np.asarray(feats)).to(torch.float64)
    T = x.shape[0]
    scales = [torch.tensor([1.0], dtype=torch.float64)]
    for _ in range(order):
        prev = scales[-1]
        prev_off = (prev.numel() - 1) // 2
        cur_off = prev_off + window
        cur = torch.zeros(prev.numel() + 2 * window, dtype=torch.float64)
        norm = 0.0
        for j in range(-window, window + 1):
            norm += j * j
            if j:
                for kk in range(-prev_off, prev_off + 1):
                    cur[j + kk + cur_off] += j * prev[kk + prev_off]
        scales.append(cur / norm)

    blocks = []
    for taps in scales:
        off = (taps.numel() - 1) // 2
        out = torch.zeros_like(x)
        for t in range(T):
            for j in range(-off, off + 1):
                src = min(max(t + j, 0), T - 1)
                out[t] += taps[j + off] * x[src]
        blocks.append(out)
    return torch.cat(blocks, dim=1).numpy()
