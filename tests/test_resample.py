"""Polyphase windowed-sinc resampler / speed perturbation.

Reference semantics: lhotse/sox speed perturbation as used by the
reference recipe (/root/reference/egs/yesno/local/compute_fbank_yesno.py:68)
— duration /factor at the same nominal sample rate."""

import numpy as np
import pytest

from khg_tpu.features.resample import (
    _out_len,
    _polyphase_filter,
    perturb_speed,
    resample_waveform,
    speed_perturb_corpus,
)


def _tone(freq, sr, dur=0.5):
    t = np.arange(int(sr * dur)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def _dominant_freq(x, sr):
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.argmax(spec) * sr / len(x)


def test_identity():
    x = _tone(440, 8000)
    y = resample_waveform(x, 8000, 8000)
    np.testing.assert_array_equal(x, y)
    np.testing.assert_array_equal(perturb_speed(x, 8000, 1.0), x)


@pytest.mark.parametrize("sr_out", [12000, 16000, 6000, 11025, 24000, 48000])
def test_tone_frequency_preserved(sr_out):
    sr_in = 8000
    x = _tone(440, sr_in)
    y = resample_waveform(x, sr_in, sr_out)
    assert y.shape[0] == _out_len(x.shape[0], *(
        (lambda f: (f.denominator, f.numerator))(
            __import__("fractions").Fraction(sr_out, sr_in)
        )
    ))
    assert abs(_dominant_freq(y, sr_out) - 440) < 5.0
    # amplitude preserved in the passband (interior, away from edges)
    mid = y[len(y) // 4 : -len(y) // 4]
    assert abs(np.max(np.abs(mid)) - 1.0) < 0.05


def test_matches_direct_sinc_sum():
    """The conv formulation equals the textbook per-sample evaluation
    y[j] = sum_m x_up[j*p + m] h[m] (x_up = q-dilated input)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(64).astype(np.float32)
    p, q = 3, 2  # 2/3 downsample
    h = _polyphase_filter(p, q, num_zeros=6)
    half = (h.shape[0] - 1) // 2
    n_up = 64 * q
    x_up = np.zeros(n_up + 2 * half, dtype=np.float64)
    x_up[half : half + n_up : q] = x
    n_out = _out_len(64, p, q)
    direct = np.array(
        [np.dot(x_up[j * p : j * p + h.shape[0]], h) for j in range(n_out)]
    )
    y = resample_waveform(x, sr_in=p, sr_out=q, num_zeros=6)
    np.testing.assert_allclose(y, direct, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("factor", [0.9, 1.1])
def test_perturb_speed_semantics(factor):
    """Duration /factor, apparent tone frequency *factor — sox `speed`,
    which lhotse's perturb_speed wraps."""
    sr = 8000
    x = _tone(500, sr, dur=1.0)
    y = perturb_speed(x, sr, factor)
    assert abs(y.shape[0] - round(len(x) / factor)) <= 1
    assert abs(_dominant_freq(y, sr) - 500 * factor) < 6.0


def test_speed_perturb_corpus_order_and_sources():
    sr = 8000
    wavs = [_tone(300, sr, 0.1), _tone(600, sr, 0.2)]
    out, src = speed_perturb_corpus(wavs, sr, factors=(0.9, 1.0, 1.1))
    assert len(out) == 6
    assert src == [0, 1, 0, 1, 0, 1]
    # the factor-1.0 block is the untouched originals
    np.testing.assert_array_equal(out[2], wavs[0])
    np.testing.assert_array_equal(out[3], wavs[1])
    # 0.9 block is longer, 1.1 block is shorter
    assert out[0].shape[0] > wavs[0].shape[0] > out[4].shape[0]


@pytest.mark.parametrize(
    "n,sr_in,sr_out",
    [(100, 8000, 24000), (200, 8000, 48000), (100, 16000, 44100)],
)
def test_large_upsample_exact_length(n, sr_in, sr_out):
    """Upsampling by more than 2x must still deliver the documented
    ceil(n*sr_out/sr_in) samples (the old half+p right pad silently
    dropped tail samples for q > 2p — ADVICE r2)."""
    import fractions

    x = np.ones(n, dtype=np.float32)
    y = resample_waveform(x, sr_in, sr_out)
    f = fractions.Fraction(sr_out, sr_in)
    assert y.shape[0] == _out_len(n, f.denominator, f.numerator)


def test_dc_gain_near_unity():
    """Constant input stays ~constant through any rational ratio (per-
    polyphase-branch DC gain ~= 1)."""
    x = np.ones(500, dtype=np.float32)
    for sr_out in (12000, 6000):
        y = resample_waveform(x, 8000, sr_out)
        mid = y[len(y) // 4 : -len(y) // 4]
        np.testing.assert_allclose(mid, 1.0, atol=0.02)
