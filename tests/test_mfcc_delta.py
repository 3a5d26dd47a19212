"""MFCC + delta features vs the independent torch oracle.

Semantics spec: kaldi/src/feat/feature-mfcc.cc (DCT-II + liftering,
energy in c0), feature-functions.cc DeltaFeatures (recursive ramp
scales, edge clamping).  The reference repo itself consumes lhotse
features (/root/reference/egs/yesno/local/compute_fbank_yesno.py:51-58);
BASELINE.json names MFCC/delta-fbank as build targets.
"""

import numpy as np
import pytest

from khg_tpu.features.delta import DeltaConfig, add_deltas, delta_scales
from khg_tpu.features.fbank import FbankConfig, compute_fbank
from khg_tpu.features.mfcc import (
    MfccConfig,
    compute_mfcc,
    compute_mfcc_batch,
    dct_matrix,
    lifter_coeffs,
)


def _wave(sr, seconds=0.71, seed=23, scale=4000.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(int(sr * seconds)) * scale).astype(np.float32)


def test_dct_matrix_orthonormal():
    m = dct_matrix(23, 23)
    np.testing.assert_allclose(m @ m.T, np.eye(23), atol=1e-12)


def test_lifter_first_coeff_is_one():
    assert lifter_coeffs(13, 22.0)[0] == 1.0


@pytest.mark.parametrize(
    "mcfg",
    [
        MfccConfig(),
        MfccConfig(use_energy=False),
        MfccConfig(cepstral_lifter=0.0),
        MfccConfig(
            fbank=FbankConfig(sample_rate=8000, num_mel_bins=23,
                              high_freq=-400.0),
            num_ceps=13,
        ),
        MfccConfig(
            fbank=FbankConfig(num_mel_bins=40, low_freq=40.0),
            num_ceps=20, use_energy=False, cepstral_lifter=30.0,
        ),
    ],
    ids=["default", "no_energy", "no_lifter", "8k", "wide"],
)
def test_mfcc_matches_torch_oracle(mcfg):
    from torch_fbank_oracle import torch_mfcc

    wave = _wave(mcfg.fbank.sample_rate)
    got = compute_mfcc(wave, mcfg)
    want = torch_mfcc(wave, mcfg)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_mfcc_batch_matches_single():
    mcfg = MfccConfig(use_energy=False)
    waves = np.stack([_wave(16000, seed=s) for s in (1, 2, 3)])
    batch = np.asarray(compute_mfcc_batch(waves, mcfg))
    for b in range(3):
        np.testing.assert_allclose(
            batch[b], compute_mfcc(waves[b], mcfg), rtol=1e-5, atol=1e-4
        )


def test_mfcc_flat_logmel_concentrates_in_c0():
    """A white-ish spectrum has (near-)flat log-mel, so cepstra beyond
    c0 should be small relative to c0 — catches a transposed DCT."""
    mcfg = MfccConfig(use_energy=False, cepstral_lifter=0.0)
    got = compute_mfcc(_wave(16000, scale=1000.0), mcfg)
    mean = np.abs(got.mean(axis=0))
    assert mean[0] > 5 * mean[2:].max()


def test_delta_scales_reference_values():
    """order=1/window=2 taps are the classic [-2,-1,0,1,2]/10 ramp;
    order=2 is its self-convolution."""
    s = delta_scales(DeltaConfig(order=2, window=2))
    np.testing.assert_allclose(
        s[1], np.array([-2, -1, 0, 1, 2]) / 10.0, atol=1e-12
    )
    np.testing.assert_allclose(s[2], np.convolve(s[1], s[1]), atol=1e-12)


def test_deltas_constant_and_ramp():
    T, D = 40, 5
    const = np.ones((T, D), np.float32) * 3.0
    out = np.asarray(add_deltas(const))
    np.testing.assert_allclose(out[:, D:], 0.0, atol=1e-6)
    ramp = np.arange(T, dtype=np.float32)[:, None] * np.ones((1, D), np.float32)
    out = np.asarray(add_deltas(ramp))
    # interior frames of a unit ramp: delta == 1, delta-delta == 0
    np.testing.assert_allclose(out[4:-4, D:2 * D], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[4:-4, 2 * D:], 0.0, atol=1e-5)


@pytest.mark.parametrize("order,window", [(1, 2), (2, 2), (2, 3), (3, 1)])
def test_deltas_match_torch_oracle(order, window):
    from torch_fbank_oracle import torch_deltas

    rng = np.random.default_rng(5)
    feats = rng.standard_normal((37, 13)).astype(np.float32)
    got = np.asarray(add_deltas(feats, DeltaConfig(order, window)))
    want = torch_deltas(feats, order, window)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_deltas_batched_matches_loop():
    rng = np.random.default_rng(6)
    feats = rng.standard_normal((4, 29, 8)).astype(np.float32)
    batch = np.asarray(add_deltas(feats))
    for b in range(4):
        np.testing.assert_allclose(
            batch[b], np.asarray(add_deltas(feats[b])), atol=1e-6
        )


def test_mfcc_pallas_matches_xla():
    """compute_mfcc_pallas (fused Pallas log-mel + outside DCT GEMM)
    vs the XLA path, interpret mode on CPU."""
    from khg_tpu.features.mfcc import compute_mfcc_pallas

    mcfg = MfccConfig(
        fbank=FbankConfig(sample_rate=8000, num_mel_bins=23,
                          high_freq=-400.0)
    )
    rng = np.random.default_rng(11)
    waves = (rng.standard_normal((2, 6400)) * 3000).astype(np.float32)
    got = np.asarray(compute_mfcc_pallas(waves, mcfg, interpret=True))
    want = np.asarray(compute_mfcc_batch(waves, mcfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_extract_features_mfcc_deltas(tmp_path):
    """Recipe wiring: extract_features(feature_type='mfcc',
    delta_order=2) produces 39-dim features identical to per-utterance
    compute_mfcc + add_deltas."""
    from khg_tpu.data.wav import read_wav
    from khg_tpu.recipes.yesno_wav import (
        extract_features,
        load_yesno_corpus,
        write_yesno_corpus,
    )

    write_yesno_corpus(tmp_path, num_utts=4, words_per_utt=2, seed=3)
    corpus = load_yesno_corpus(tmp_path)
    mcfg = MfccConfig(
        fbank=FbankConfig(sample_rate=8000, num_mel_bins=23,
                          high_freq=-400.0)
    )
    corpus = extract_features(
        corpus, use_pallas=False, feature_type="mfcc", mfcc_cfg=mcfg,
        delta_order=2,
    )
    assert all(f.shape[1] == 39 for f in corpus.feats)
    w, _ = read_wav(corpus.wav_paths[0])
    want = np.asarray(add_deltas(compute_mfcc(w, mcfg)))
    np.testing.assert_allclose(corpus.feats[0], want, rtol=1e-5, atol=1e-4)


def test_frozen_golden_mfcc_deltas():
    """Regression pin: MFCC+deltas for a fixed WAV vs a checked-in
    golden generated by the torch oracle (tests/golden/mfcc_golden.npz).
    """
    from pathlib import Path

    from test_fbank import _golden_wave

    golden_path = Path(__file__).parent / "golden" / "mfcc_golden.npz"
    mcfg = MfccConfig(
        fbank=FbankConfig(sample_rate=8000, num_mel_bins=23,
                          high_freq=-400.0)
    )
    got = np.asarray(add_deltas(compute_mfcc(_golden_wave(), mcfg)))
    golden = np.load(golden_path)["feats"]
    assert got.shape == golden.shape
    np.testing.assert_allclose(got, golden, rtol=2e-3, atol=2e-3)
