"""Fused Pallas TPU kernel: waveform -> log-mel fbank features.

BASELINE.json names a Pallas framing+FFT frontend as a north-star
component.  The XLA path (features/fbank.py) materializes padded frames
(B, T, n_fft) and the power spectrum (B, T, n_fft/2+1) in HBM between
ops; this kernel keeps the whole frontend in VMEM: per utterance the
wave enters once and features leave once.

Two TPU-first observations drive the design:

1. **The frontend is linear.**  DC removal (I - J/n), pre-emphasis
   (banded matrix E), windowing (diag(w)) and the real DFT (cos/sin
   matrices) are each linear maps on the frame vector, so their
   composition folds into ONE host-precomputed (frame_len, n_fft/2+1)
   matrix per Re/Im half: spectrum = frame @ M.  No elementwise
   preprocessing survives into the kernel at all — just GEMMs on the
   MXU (plus square/log on the VPU and the mel GEMM).

2. **Framing without gathers or concats.**  The (reflect-padded) wave
   is reshaped on the host to rows of `shift` samples.  Frame t is the
   concatenation of rows t..t+q — but since it is only ever *consumed
   by a matmul*, the concat itself disappears:
   frame @ M == sum_k rows[t+k] @ M[k*shift:(k+1)*shift].  Each part is
   a plain slice of a (Tc+q, shift) VMEM window feeding its own MXU
   call (Mosaic relayouts slice operands; concatenating them directly
   is not lowerable — "offset mismatch on non-concat dimension").

Raw frame log-energy (Kaldi semantics: post-DC, pre-window) comes from
the same parts: e = sum(f^2) - (sum f)^2 / n, two lane reductions.

Numerics match features/fbank.py to GEMM-reassociation error (the
folded matrix is formed in f64 on the host); parity is pinned by
tests/test_fbank.py.  Replaces the lhotse dependency of the reference
(egs/yesno/local/compute_fbank_yesno.py:55) with an on-device kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from khg_tpu.features.fbank import (
    FbankConfig,
    _dft_matrices,
    _window,
    mel_banks,
    num_frames,
)

_TC = 128  # frames per in-kernel chunk


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _folded_frontend(cfg: FbankConfig):
    """Fold dc-removal, pre-emphasis, window, and rDFT into two matrices.

    Returns (M_re, M_im) of shape (nparts*shift, F), f32, computed in
    f64.  Rows >= frame_len are zero so the junk lanes of the final
    partial part contribute nothing.
    """
    flen = cfg.frame_length
    shift = cfg.frame_shift
    nparts = -(-flen // shift)
    cos_m, sin_m = _dft_matrices(cfg.fft_size)
    C = cos_m[:flen].astype(np.float64)
    S = sin_m[:flen].astype(np.float64)
    L = np.diag(_window(cfg).astype(np.float64))
    if cfg.preemph_coeff != 0.0:
        c = cfg.preemph_coeff
        E = np.eye(flen)
        E[0, 0] = 1.0 - c
        E[np.arange(flen - 1), np.arange(1, flen)] = -c
        L = E @ L
    if cfg.remove_dc_offset:
        L = (np.eye(flen) - np.full((flen, flen), 1.0 / flen)) @ L
    M_re = np.zeros((nparts * shift, C.shape[1]), dtype=np.float32)
    M_im = np.zeros_like(M_re)
    M_re[:flen] = (L @ C).astype(np.float32)
    M_im[:flen] = (L @ S).astype(np.float32)
    return M_re, M_im


def _fbank_kernel(
    w_ref,       # (1, Wrows, shift) f32  reflect-padded wave rows
    m_re_ref,    # (nparts*shift, F) f32  folded frontend, Re
    m_im_ref,    # (nparts*shift, F) f32  folded frontend, Im
    mel_ref,     # (F, M) f32             mel matrix, transposed
    out_ref,     # out (1, Tpad, M) f32
    energy_ref,  # out (1, Tpad, 1) f32   raw log energy
    *,
    cfg: FbankConfig,
    Tpad: int,
):
    shift = cfg.frame_shift
    flen = cfg.frame_length
    nparts = m_re_ref.shape[0] // shift
    n_chunks = Tpad // _TC
    hi = jax.lax.Precision.HIGHEST

    def chunk(c, _):
        t0 = c * _TC
        rows = w_ref[0, pl.ds(t0, _TC + nparts), :]
        re = im = s1 = s2 = None
        for k in range(nparts):
            part = rows[k : _TC + k, :]
            lo = k * shift
            a = jnp.dot(part, m_re_ref[lo : lo + shift, :], precision=hi,
                        preferred_element_type=jnp.float32)
            b = jnp.dot(part, m_im_ref[lo : lo + shift, :], precision=hi,
                        preferred_element_type=jnp.float32)
            re = a if re is None else re + a
            im = b if im is None else im + b
            valid = min(shift, flen - lo)
            if valid < shift:  # mask the junk tail of the last part
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (_TC, shift), 1
                )
                part = jnp.where(lane < valid, part, 0.0)
            p1 = jnp.sum(part, axis=1, keepdims=True)
            p2 = jnp.sum(part * part, axis=1, keepdims=True)
            s1 = p1 if s1 is None else s1 + p1
            s2 = p2 if s2 is None else s2 + p2

        e = s2 - s1 * s1 * (1.0 / flen) if cfg.remove_dc_offset else s2
        loge = jnp.log(jnp.maximum(e, 1.1754944e-38))
        if cfg.energy_floor > 0.0:
            loge = jnp.maximum(loge, math.log(cfg.energy_floor))
        energy_ref[0, pl.ds(t0, _TC), :] = loge

        power = re * re + im * im
        if not cfg.use_power:
            power = jnp.sqrt(power)
        feats = jnp.dot(power, mel_ref[...], precision=hi,
                        preferred_element_type=jnp.float32)
        if cfg.use_log_fbank:
            feats = jnp.log(jnp.maximum(feats, 1.1754944e-38))
        out_ref[0, pl.ds(t0, _TC), :] = feats
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk, 0)


def _pad_and_rows(
    waves: jnp.ndarray, cfg: FbankConfig, Tpad: int
) -> jnp.ndarray:
    """(B, N) waves -> (B, Wrows, shift) reflect-padded row matrix.

    Row t starts at sample t*shift of the *virtual* wave whose frame t
    covers the same samples features/fbank.py frames cover (centered
    with mirror-reflection when snip_edges=False).
    """
    shift = cfg.frame_shift
    frame_len = cfg.frame_length
    N = waves.shape[-1]
    nparts = -(-frame_len // shift)
    Wrows = Tpad + nparts
    total = Wrows * shift
    left = 0 if cfg.snip_edges else frame_len // 2 - shift // 2
    # virtual sample v (v - left = original index), mirrored at edges
    v = np.arange(total) - left
    v = np.abs(v + (v < 0))  # -1 -> 0, -2 -> 1 (mirror w/o edge repeat)
    v = np.where(v >= N, np.maximum(2 * N - 1 - v, 0), v)
    idx = jnp.asarray(v.astype(np.int32))
    ext = waves[..., idx]
    return ext.reshape(waves.shape[0], Wrows, shift)


@functools.partial(jax.jit, static_argnames=("cfg", "T", "interpret"))
def _pallas_fbank_impl(
    waves: jnp.ndarray, cfg: FbankConfig, T: int, interpret: bool
) -> jnp.ndarray:
    B = waves.shape[0]
    Tpad = max(_round_up(T, _TC), _TC)
    rows = _pad_and_rows(waves.astype(jnp.float32), cfg, Tpad)
    n_fft = cfg.fft_size
    F = n_fft // 2 + 1
    M = cfg.num_mel_bins
    m_re, m_im = _folded_frontend(cfg)
    mel_t = mel_banks(cfg).T.copy()  # (F, M)

    kernel = functools.partial(_fbank_kernel, cfg=cfg, Tpad=Tpad)
    out, energy = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, rows.shape[1], rows.shape[2]),
                lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(m_re.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(m_im.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mel_t.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Tpad, M), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tpad, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tpad, M), jnp.float32),
            jax.ShapeDtypeStruct((B, Tpad, 1), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Tpad * (m_re.shape[0] * F * 2 + F * M),
            bytes_accessed=4 * B * Tpad * (rows.shape[2] + M),
            transcendentals=B * Tpad * (M + 1),
        ),
    )(rows, jnp.asarray(m_re), jnp.asarray(m_im), jnp.asarray(mel_t))
    feats = out[:, :T, :]
    if cfg.use_energy:
        feats = jnp.concatenate([energy[:, :T, :], feats], axis=-1)
    return feats


def compute_fbank_pallas(
    waves,
    cfg: FbankConfig = FbankConfig(),
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, N) equal-length waves -> (B, T, M [+1]) log-mel features.

    Fused single-kernel frontend; `interpret=True` runs on CPU (tests /
    fallback).  Dither is not supported in-kernel — apply it to the
    wave first (jax.random.normal) if cfg.dither > 0.
    """
    if cfg.dither != 0.0:
        raise ValueError(
            "compute_fbank_pallas: dither the waveform on the host "
            "first (in-kernel PRNG would break XLA-path parity)"
        )
    if not cfg.raw_energy:
        raise ValueError("compute_fbank_pallas supports raw_energy only")
    waves = jnp.atleast_2d(jnp.asarray(waves, jnp.float32))
    T = num_frames(cfg, waves.shape[-1])
    return _pallas_fbank_impl(waves, cfg, T, interpret)
