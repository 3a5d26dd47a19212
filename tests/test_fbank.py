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


def _oracle_fbank(wave, cfg):
    """Literal per-frame transcription of the Kaldi fbank algorithm.

    Scalar/loop NumPy, structured nothing like the GEMM device path:
    frames are extracted one by one, energy/dc/preemph/window applied
    per frame, spectrum via np.fft.rfft.  Serves as the independent
    oracle for the option-surface semantics (snip_edges, raw_energy,
    energy_floor, use_power, use_energy) that lhotse parity would pin
    if lhotse were installable here.
    """
    n = len(wave)
    T = num_frames(cfg, n)
    flen, shift, nfft = cfg.frame_length, cfg.frame_shift, cfg.fft_size
    i = np.arange(flen)
    a = 2 * np.pi / (flen - 1)
    win = {
        "povey": (0.5 - 0.5 * np.cos(a * i)) ** 0.85,
        "hamming": 0.54 - 0.46 * np.cos(a * i),
        "hanning": 0.5 - 0.5 * np.cos(a * i),
        "rectangular": np.ones(flen),
    }[cfg.window_type]
    mel = mel_banks(cfg)
    out = []
    for t in range(T):
        if cfg.snip_edges:
            start = t * shift
            idx = start + i
        else:
            idx = t * shift + shift // 2 + (i - flen // 2)
            idx = np.where(idx < 0, -idx - 1, idx)
            idx = np.where(idx >= n, 2 * n - 1 - idx, idx)
        frame = wave[idx].astype(np.float64)
        if cfg.remove_dc_offset:
            frame = frame - frame.mean()
        if cfg.use_energy and cfg.raw_energy:
            loge = math.log(max(np.dot(frame, frame), 1.1754944e-38))
        if cfg.preemph_coeff:
            frame = np.concatenate(
                [[frame[0] - cfg.preemph_coeff * frame[0]],
                 frame[1:] - cfg.preemph_coeff * frame[:-1]])
        frame = frame * win
        if cfg.use_energy and not cfg.raw_energy:
            loge = math.log(max(np.dot(frame, frame), 1.1754944e-38))
        spec = np.abs(np.fft.rfft(frame, nfft)) ** 2
        if not cfg.use_power:
            spec = np.sqrt(spec)
        feat = mel @ spec
        if cfg.use_log_fbank:
            feat = np.log(np.maximum(feat, 1.1754944e-38))
        if cfg.use_energy:
            if cfg.energy_floor > 0:
                loge = max(loge, math.log(cfg.energy_floor))
            feat = np.concatenate([[loge], feat])
        out.append(feat)
    return np.stack(out) if out else np.zeros((0, cfg.num_mel_bins))


@pytest.mark.parametrize(
    "cfg",
    [
        FbankConfig(),
        FbankConfig(snip_edges=True, num_mel_bins=23),
        FbankConfig(use_energy=True, energy_floor=1e-4),
        FbankConfig(use_energy=True, raw_energy=False),
        FbankConfig(use_power=False, window_type="hanning",
                    preemph_coeff=0.0, remove_dc_offset=False),
        FbankConfig(sample_rate=8000, num_mel_bins=40, low_freq=40.0,
                    high_freq=-200.0),
    ],
    ids=["default", "snip", "energy", "win_energy", "magnitude", "8k"],
)
def test_fbank_matches_scalar_oracle(cfg):
    rng = np.random.default_rng(7)
    wave = (rng.standard_normal(int(cfg.sample_rate * 0.73)) * 5000).astype(
        np.float32
    )
    got = compute_fbank(wave, cfg)
    want = _oracle_fbank(wave, cfg)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize(
    "cfg",
    [
        FbankConfig(),
        FbankConfig(snip_edges=True, num_mel_bins=23),
        FbankConfig(use_energy=True, energy_floor=1e-4),
        FbankConfig(use_energy=True, raw_energy=False),
        FbankConfig(use_power=False, window_type="hanning",
                    preemph_coeff=0.0, remove_dc_offset=False),
        # the config the reference actually consumes: lhotse
        # Fbank(FbankConfig(sampling_rate=8000, num_mel_bins=23)) with
        # lhotse's Kaldi-compatible defaults (high_freq=-400 offset,
        # snip_edges=False, povey, preemph 0.97, dither 0)
        # (/root/reference/egs/yesno/local/compute_fbank_yesno.py:51-58)
        FbankConfig(sample_rate=8000, num_mel_bins=23, high_freq=-400.0),
    ],
    ids=["default", "snip", "energy", "win_energy", "magnitude",
         "yesno_lhotse"],
)
def test_fbank_matches_torch_oracle(cfg):
    """Independent-oracle parity: torch framing/FFT/mel weights share no
    code with khg_tpu.features (see tests/torch_fbank_oracle.py) — this
    is the cross-implementation check that lhotse parity would provide
    if lhotse were installable here."""
    from torch_fbank_oracle import torch_fbank

    rng = np.random.default_rng(17)
    wave = (rng.standard_normal(int(cfg.sample_rate * 0.81)) * 4000).astype(
        np.float32
    )
    got = np.asarray(compute_fbank(wave, cfg))
    want = torch_fbank(wave, cfg)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_mel_banks_match_torch_derivation():
    """The mel filter matrix itself, against an independent derivation
    of the published Kaldi formula — catches breakpoint/edge-bin errors
    that whole-pipeline tolerance could absorb."""
    from torch_fbank_oracle import torch_mel_banks

    for cfg in (
        FbankConfig(),
        FbankConfig(sample_rate=8000, num_mel_bins=23, high_freq=-400.0),
        FbankConfig(num_mel_bins=40, low_freq=40.0, high_freq=-200.0),
    ):
        ours = mel_banks(cfg)
        theirs = torch_mel_banks(cfg).numpy()
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def _golden_wave():
    """Deterministic 8 kHz test signal: chirp + two formant-ish tones +
    noise, amplitude-modulated; fixed forever (the golden pins it)."""
    sr = 8000
    t = np.arange(int(sr * 0.6)) / sr
    wave = (
        3000.0 * np.sin(2 * np.pi * (200.0 + 800.0 * t) * t)
        + 1500.0 * np.sin(2 * np.pi * 1300.0 * t)
        + 700.0 * np.sin(2 * np.pi * 2600.0 * t + 0.7)
    ) * (0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t))
    wave += np.random.default_rng(99).standard_normal(len(t)) * 40.0
    return wave.astype(np.float32)


def test_frozen_golden_features():
    """Regression pin: khg fbank output for a fixed WAV must match the
    checked-in golden matrix (generated by the independent torch oracle,
    tests/golden/fbank_golden.npz).  Any change to framing, windowing,
    mel weights, or flooring moves this."""
    from pathlib import Path

    golden_path = Path(__file__).parent / "golden" / "fbank_golden.npz"
    cfg = FbankConfig(sample_rate=8000, num_mel_bins=23, high_freq=-400.0)
    got = np.asarray(compute_fbank(_golden_wave(), cfg))
    golden = np.load(golden_path)["feats"]
    assert got.shape == golden.shape
    np.testing.assert_allclose(got, golden, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize(
    "cfg",
    [
        FbankConfig(),
        FbankConfig(sample_rate=8000, num_mel_bins=23),
        FbankConfig(snip_edges=True),
        FbankConfig(use_energy=True),
    ],
    ids=["default", "8k", "snip", "energy"],
)
def test_pallas_fbank_matches_xla(cfg):
    from khg_tpu.features.pallas_fbank import compute_fbank_pallas

    rng = np.random.default_rng(11)
    waves = (rng.standard_normal((2, int(cfg.sample_rate * 1.1))) * 300).astype(
        np.float32
    )
    ref = np.asarray(compute_fbank_batch(waves, cfg))
    got = np.asarray(compute_fbank_pallas(waves, cfg, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_dither_reproducible():
    import jax

    rng = np.random.default_rng(5)
    wave = rng.standard_normal(8000).astype(np.float32) * 100
    cfg = FbankConfig(dither=1.0)
    key = jax.random.PRNGKey(42)
    f1 = compute_fbank(wave, cfg, dither_key=key)
    f2 = compute_fbank(wave, cfg, dither_key=key)
    f3 = compute_fbank(wave, cfg, dither_key=jax.random.PRNGKey(43))
    np.testing.assert_array_equal(f1, f2)
    assert np.max(np.abs(f1 - f3)) > 0
