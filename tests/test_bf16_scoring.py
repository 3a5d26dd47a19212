"""bf16 acoustic scoring: bounded drift vs the f32/HIGHEST path.

The triphone benchmark's fast full-P mode runs the scoring GEMM in
bf16 with f32 accumulation (the MXU's native mode).  These tests pin
the accuracy contract that makes the mode usable: per-frame loglike
drift stays well under the typical inter-pdf score gap, and the Pallas
kernel's bf16 mode agrees with the XLA bf16 path.
"""

import numpy as np
import pytest

from khg_tpu.gmm.likelihoods import loglikes
from khg_tpu.gmm.pallas_kernels import loglikes_pallas


@pytest.fixture(scope="module")
def model_and_feats():
    rng = np.random.default_rng(0)
    P, K, D = 256, 8, 40
    means = rng.standard_normal((P, K, D)).astype(np.float32)
    var = (0.5 + rng.random((P, K, D))).astype(np.float32)
    iv = (1.0 / var).astype(np.float32)
    miv = (means * iv).astype(np.float32)
    gconsts = (
        -0.5 * (D * np.log(2 * np.pi) - np.log(iv).sum(-1)
                + (means * miv).sum(-1))
    ).astype(np.float32)
    feats = rng.standard_normal((4, 50, D)).astype(np.float32)
    return gconsts, miv, iv, feats


def test_bf16_loglike_drift_bound(model_and_feats):
    gconsts, miv, iv, feats = model_and_feats
    f32 = np.asarray(loglikes(gconsts, miv, iv, feats))
    bf = np.asarray(loglikes(gconsts, miv, iv, feats,
                             compute_dtype="bfloat16"))
    drift = np.abs(bf - f32)
    # measured 0.111 max at |loglike| ~ 68 on this config; pin 4.5x
    assert drift.max() < 0.5, drift.max()
    # what alignment actually consumes: the per-frame best pdf must
    # almost never flip (ties between near-equal pdfs may)
    agree = (bf.argmax(-1) == f32.argmax(-1)).mean()
    assert agree > 0.99, agree


def test_pallas_bf16_matches_xla_bf16(model_and_feats):
    gconsts, miv, iv, feats = model_and_feats
    xla = np.asarray(loglikes(gconsts, miv, iv, feats,
                              compute_dtype="bfloat16"))
    pal = np.asarray(loglikes_pallas(gconsts, miv, iv, feats,
                                     compute_dtype="bfloat16",
                                     interpret=True))
    # same bf16 inputs, f32 accumulate; only reduction order differs
    np.testing.assert_allclose(pal, xla, atol=5e-3, rtol=0)


def test_pallas_f32_matches_xla_f32(model_and_feats):
    gconsts, miv, iv, feats = model_and_feats
    xla = np.asarray(loglikes(gconsts, miv, iv, feats))
    pal = np.asarray(loglikes_pallas(gconsts, miv, iv, feats,
                                     interpret=True))
    np.testing.assert_allclose(pal, xla, atol=1e-4, rtol=0)
