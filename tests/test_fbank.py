import math

import numpy as np
import pytest

from khg_tpu.features.fbank import (
    FbankConfig,
    compute_fbank,
    compute_fbank_batch,
    mel_banks,
    num_frames,
)


def test_num_frames():
    cfg = FbankConfig()
    assert cfg.frame_length == 400 and cfg.frame_shift == 160
    # snip_edges=False: ~ samples/shift
    assert num_frames(cfg, 16000) == 100
    cfg2 = FbankConfig(snip_edges=True)
    assert num_frames(cfg2, 16000) == 1 + (16000 - 400) // 160


def test_output_shape_and_finite():
    rng = np.random.default_rng(0)
    wave = rng.standard_normal(16000).astype(np.float32)
    feats = compute_fbank(wave)
    assert feats.shape == (100, 80)
    assert np.all(np.isfinite(feats))


def test_pure_tone_peaks_at_right_mel_bin():
    cfg = FbankConfig(num_mel_bins=40)
    sr = cfg.sample_rate
    t = np.arange(sr) / sr
    for freq in (300.0, 1000.0, 3000.0):
        wave = np.sin(2 * np.pi * freq * t).astype(np.float32)
        feats = compute_fbank(wave, cfg)
        mean_spec = feats.mean(axis=0)
        peak_bin = int(np.argmax(mean_spec))
        # expected bin: the mel filter whose center is closest to freq
        mel = 1127.0 * math.log(1 + freq / 700.0)
        mel_low = 1127.0 * math.log(1 + cfg.low_freq / 700.0)
        mel_high = 1127.0 * math.log(1 + (sr / 2) / 700.0)
        delta = (mel_high - mel_low) / (cfg.num_mel_bins + 1)
        expected = round((mel - mel_low) / delta) - 1
        assert abs(peak_bin - expected) <= 1, (freq, peak_bin, expected)


def test_dft_matches_numpy_rfft():
    # power spectrum via the GEMM DFT == numpy rfft
    cfg = FbankConfig(
        preemph_coeff=0.0, remove_dc_offset=False, window_type="rectangular",
        snip_edges=True, use_log_fbank=False, num_mel_bins=23,
    )
    rng = np.random.default_rng(1)
    wave = rng.standard_normal(cfg.frame_length).astype(np.float32)
    feats = compute_fbank(wave, cfg)  # one frame
    padded = np.zeros(cfg.fft_size, dtype=np.float32)
    padded[: cfg.frame_length] = wave
    power = np.abs(np.fft.rfft(padded)) ** 2
    expected = mel_banks(cfg) @ power
    np.testing.assert_allclose(feats[0], expected, rtol=1e-3, atol=1e-3)


def test_batch_matches_single():
    rng = np.random.default_rng(2)
    waves = rng.standard_normal((3, 8000)).astype(np.float32)
    batch = np.asarray(compute_fbank_batch(waves))
    for i in range(3):
        single = compute_fbank(waves[i])
        np.testing.assert_allclose(batch[i], single, rtol=1e-3, atol=1e-3)


def test_louder_is_bigger():
    rng = np.random.default_rng(3)
    wave = rng.standard_normal(8000).astype(np.float32)
    f1 = compute_fbank(wave)
    f2 = compute_fbank(wave * 10.0)
    # log energy scales by log(100)
    np.testing.assert_allclose(f2 - f1, 2 * math.log(10.0), rtol=1e-3)
