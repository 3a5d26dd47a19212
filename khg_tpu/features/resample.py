"""Waveform resampling and speed perturbation, TPU-first.

The reference's recipes triple the training set with lhotse
``cut_set.perturb_speed(0.9/1.1)`` before fbank extraction
(/root/reference/egs/yesno/local/compute_fbank_yesno.py:68).  Speed
perturbation is waveform resampling by 1/factor with the sample rate
relabeled: a factor-f copy is the same audio played f times faster
(duration/f, pitch*f).

Design: rational-ratio polyphase windowed-sinc resampling expressed as
ONE ``lax.conv_general_dilated`` — upsample-by-q via lhs dilation,
lowpass with a Hann-windowed sinc, downsample-by-p via stride.  XLA
lowers that to the MXU-friendly conv path; there is no per-sample
Python.  The filter is built on the host once per (p, q) and cached.

Semantics follow the classic streaming resamplers (Kaldi's
LinearResample / sox): cutoff a little below the lower Nyquist,
``num_zeros`` sinc lobes per side, even-symmetric filter, output length
ceil(n * q / p).
"""

from __future__ import annotations

from fractions import Fraction
from functools import lru_cache
from typing import Sequence, Tuple

import numpy as np

__all__ = ["resample_waveform", "perturb_speed", "speed_perturb_corpus"]


def _as_ratio(sr_in: int, sr_out: int) -> Tuple[int, int]:
    """(p, q) with sr_out/sr_in == q/p in lowest terms."""
    f = Fraction(int(sr_out), int(sr_in))
    return f.denominator, f.numerator


@lru_cache(maxsize=32)
def _polyphase_filter(p: int, q: int, num_zeros: int) -> np.ndarray:
    """Hann-windowed sinc lowpass for up-q/down-p resampling, f32.

    Designed at the upsampled rate (sr_in * q): cutoff 0.95 of the
    smaller Nyquist, gain q (each output draws from 1/q nonzero
    upsampled taps).  Odd length, centered."""
    cutoff = 0.95 * 0.5 / max(p, q)  # cycles per upsampled sample
    half = int(np.ceil(num_zeros / (2.0 * cutoff)))
    t = np.arange(-half, half + 1, dtype=np.float64)
    taps = 2.0 * cutoff * np.sinc(2.0 * cutoff * t)
    window = 0.5 + 0.5 * np.cos(np.pi * t / half)  # Hann, zero at edges
    return (q * taps * window).astype(np.float32)


def _out_len(n: int, p: int, q: int) -> int:
    return int(-(-n * q // p))  # ceil(n*q/p)


def resample_waveform(
    wav: np.ndarray, sr_in: int, sr_out: int, num_zeros: int = 10
) -> np.ndarray:
    """Resample a 1-D waveform from sr_in to sr_out (f32 in, f32 out).

    One dilated/strided convolution on the accelerator: upsample by q
    (lhs_dilation), windowed-sinc lowpass, downsample by p (stride).
    Output length ceil(n * sr_out / sr_in); edges are zero-padded (the
    filter sees silence outside the signal, as in Kaldi's
    LinearResample)."""
    import jax.numpy as jnp
    from jax import lax

    wav = np.asarray(wav, dtype=np.float32)
    assert wav.ndim == 1, "resample_waveform takes one utterance"
    if sr_in == sr_out:
        return wav
    p, q = _as_ratio(sr_in, sr_out)
    h = _polyphase_filter(p, q, num_zeros)
    half = (h.shape[0] - 1) // 2
    n_out = _out_len(wav.shape[0], p, q)
    # conv_general_dilated with lhs_dilation=q inserts q-1 zeros between
    # input samples; stride p then picks every p-th filtered sample.
    # Padding `half` on both sides centers the filter on output index 0
    # at input time 0.
    lhs = jnp.asarray(wav)[None, None, :]
    rhs = jnp.asarray(h[::-1].copy())[None, None, :]
    # Right slack half+p+q guarantees the conv yields >= n_out samples
    # for ANY p/q: dilated+padded length (n-1)q+1+2*half+p+q minus the
    # filter span 2*half+1 gives floor(nq/p)+2 >= ceil(nq/p) outputs.
    # (half+p alone under-produced for q > 2p, silently truncating the
    # tail when upsampling by more than 2x.)
    out = lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(p,),
        padding=[(half, half + p + q)],
        lhs_dilation=(q,),
        rhs_dilation=(1,),
    )[0, 0]
    assert out.shape[0] >= n_out, (out.shape, n_out, p, q)
    return np.asarray(out[:n_out])


def perturb_speed(
    wav: np.ndarray, sample_rate: int, factor: float, num_zeros: int = 10
) -> np.ndarray:
    """Speed-perturbed copy at the SAME sample rate (sox `speed`,
    lhotse perturb_speed): duration /factor, pitch and formants *factor.

    Implemented as resampling from sample_rate to sample_rate/factor
    and relabeling; factor must give a rational ratio (0.9, 1.1, ... do).

    ``sample_rate`` is accepted only for lhotse API symmetry and is
    intentionally UNUSED: the synthetic p/q ratio derived from ``factor``
    fully determines the anti-alias filter (the cutoff is relative to
    the signal's own Nyquist, whatever the absolute rate).
    """
    if factor == 1.0:
        return np.asarray(wav, dtype=np.float32)
    f = Fraction(factor).limit_denominator(1000)
    # resample n -> n/factor samples: sr_out/sr_in = 1/factor = den/num
    p, q = f.numerator, f.denominator
    g = int(np.gcd(p, q))
    # delegate through resample_waveform's conv with synthetic rates
    return resample_waveform(
        wav, sr_in=p // g, sr_out=q // g, num_zeros=num_zeros
    )


def speed_perturb_corpus(
    wavs: Sequence[np.ndarray],
    sample_rate: int,
    factors: Sequence[float] = (0.9, 1.0, 1.1),
    num_zeros: int = 10,
):
    """lhotse-style corpus tripling: one copy per factor, original order
    preserved within each factor block (cut_set + perturb(0.9) +
    perturb(1.1) semantics).  Returns (wavs_out, src_indices) where
    src_indices[i] is the original utterance index of output i — use it
    to replicate transcripts."""
    out, src = [], []
    for f in factors:
        for i, w in enumerate(wavs):
            out.append(perturb_speed(w, sample_rate, f, num_zeros))
            src.append(i)
    return out, src
