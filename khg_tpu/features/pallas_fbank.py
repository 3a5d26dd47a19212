"""Fused Pallas TPU kernel: waveform -> log-mel fbank features.

BASELINE.json names a Pallas framing+FFT frontend as a north-star
component.  The XLA path (features/fbank.py) materializes padded frames
(B, T, n_fft) and the power spectrum (B, T, n_fft/2+1) in HBM between
ops; this kernel keeps the whole frontend in VMEM: per utterance, the
wave enters once, features leave once, and framing / DC removal /
pre-emphasis / windowing / DFT / power / mel / log never touch HBM.

Framing without gathers: the (reflect-padded) wave is reshaped on the
host to rows of `shift` samples, W[t] = wave[t*shift:(t+1)*shift].
Frame t is then a *static* concatenation of rows t..t+q (q =
ceil(frame_len/shift)), so a chunk of Tc frames is built from plain
slices of a (Tc+q, shift) VMEM window — no dynamic per-frame indexing.
The DFT is two dense GEMMs against (n_fft, n_fft/2+1) cos/sin matrices
and the mel projection a third GEMM, all on the MXU (a radix FFT is
O(N log N) but lane-hostile at N=256..512; the dense form wins here).

Numerics match features/fbank.py bit-for-bit up to GEMM reduction
order (precision=HIGHEST both sides); parity is pinned by
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


def _fbank_kernel(
    w_ref,       # (1, Wrows, shift) f32  reflect-padded wave rows
    win_ref,     # (1, frame_len) f32     window function
    cos_ref,     # (n_fft, F) f32
    sin_ref,     # (n_fft, F) f32
    mel_ref,     # (F, M) f32             mel matrix, transposed
    out_ref,     # out (1, Tpad, M) f32
    energy_ref,  # out (1, Tpad, 1) f32   raw log energy (pre-window)
    *,
    cfg: FbankConfig,
    Tpad: int,
):
    frame_len = cfg.frame_length
    shift = cfg.frame_shift
    n_fft = cfg.fft_size
    q_full, rem = divmod(frame_len, shift)
    n_chunks = Tpad // _TC
    hi = jax.lax.Precision.HIGHEST

    def chunk(c, _):
        t0 = c * _TC
        nrows = _TC + q_full + (1 if rem else 0)
        rows = w_ref[0, pl.ds(t0, nrows), :]  # (Tc+q, shift)
        parts = [rows[i : _TC + i, :] for i in range(q_full)]
        if rem:
            parts.append(rows[q_full : _TC + q_full, :rem])
        frames = jnp.concatenate(parts, axis=1)  # (Tc, frame_len)

        if cfg.remove_dc_offset:
            frames = frames - jnp.mean(frames, axis=1, keepdims=True)
        # raw (pre-window) log energy, Kaldi semantics
        e = jnp.sum(jnp.square(frames), axis=1, keepdims=True)
        loge = jnp.log(jnp.maximum(e, 1.1754944e-38))
        if cfg.energy_floor > 0.0:
            loge = jnp.maximum(loge, math.log(cfg.energy_floor))
        energy_ref[0, pl.ds(t0, _TC), :] = loge
        if cfg.preemph_coeff != 0.0:
            prev = jnp.concatenate(
                [frames[:, :1], frames[:, :-1]], axis=1
            )
            frames = frames - cfg.preemph_coeff * prev
        frames = frames * win_ref[...]
        pad = n_fft - frame_len
        if pad:
            frames = jnp.concatenate(
                [frames, jnp.zeros((_TC, pad), frames.dtype)], axis=1
            )
        re = jnp.dot(frames, cos_ref[...], precision=hi,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(frames, sin_ref[...], precision=hi,
                     preferred_element_type=jnp.float32)
        power = jnp.square(re) + jnp.square(im)
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
    q = frame_len // shift + (1 if frame_len % shift else 0)
    Wrows = Tpad + q
    total = Wrows * shift
    if cfg.snip_edges:
        left = 0
    else:
        left = frame_len // 2 - shift // 2
    # virtual sample v (v - left = original index), mirrored at edges
    v = np.arange(total) - left
    v = np.abs(v + (v < 0))  # -1 -> 0, -2 -> 1 (mirror w/o edge repeat)
    v = np.where(v >= N, np.maximum(2 * N - 1 - v, 0), v)
    idx = jnp.asarray(v.astype(np.int32))
    ext = waves[..., idx]
    return ext.reshape(waves.shape[0], Wrows, shift)


@functools.partial(
    jax.jit, static_argnames=("cfg", "T", "interpret")
)
def _pallas_fbank_impl(
    waves: jnp.ndarray, cfg: FbankConfig, T: int, interpret: bool
) -> jnp.ndarray:
    B = waves.shape[0]
    Tpad = max(_round_up(T, _TC), _TC)
    rows = _pad_and_rows(waves.astype(jnp.float32), cfg, Tpad)
    n_fft = cfg.fft_size
    F = n_fft // 2 + 1
    M = cfg.num_mel_bins
    cos_m, sin_m = _dft_matrices(n_fft)
    mel_t = mel_banks(cfg).T.copy()  # (F, M)
    win = _window(cfg)[None, :]

    kernel = functools.partial(_fbank_kernel, cfg=cfg, Tpad=Tpad)
    grid = (B,)
    out, energy = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, rows.shape[1], rows.shape[2]),
                lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(win.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cos_m.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sin_m.shape, lambda b: (0, 0),
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
            flops=2 * B * Tpad * (n_fft * F * 2 + F * M),
            bytes_accessed=4 * B * Tpad * (rows.shape[2] + M),
            transcendentals=B * Tpad * (M + 1),
        ),
    )(rows, jnp.asarray(win), jnp.asarray(cos_m), jnp.asarray(sin_m),
      jnp.asarray(mel_t))
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
