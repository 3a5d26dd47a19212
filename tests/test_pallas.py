"""Pallas fused-loglikes kernel vs the XLA reference path (interpret mode
on CPU; the real TPU path is exercised by bench.py)."""

import numpy as np
import pytest

from khg_tpu.gmm.likelihoods import loglikes
from khg_tpu.gmm.pallas_kernels import loglikes_pallas
from tests.test_align import random_am


def test_pallas_loglikes_match_xla():
    rng = np.random.default_rng(0)
    am = random_am(10, 12, rng, max_mix=4)
    packed = am.pack(mix_pad_to=4)
    feats = rng.standard_normal((3, 17, 12)).astype(np.float32)
    ref = np.asarray(
        loglikes(packed.gconsts, packed.means_invvars, packed.inv_vars, feats)
    )
    got = np.asarray(
        loglikes_pallas(
            packed.gconsts, packed.means_invvars, packed.inv_vars, feats,
            tn=8, tp=2, interpret=True,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_pallas_padding_pdfs_masked():
    rng = np.random.default_rng(1)
    am = random_am(3, 6, rng, max_mix=2)
    packed = am.pack(mix_pad_to=2)
    feats = rng.standard_normal((5, 6)).astype(np.float32)
    got = np.asarray(
        loglikes_pallas(
            packed.gconsts, packed.means_invvars, packed.inv_vars, feats,
            tn=8, tp=2, interpret=True,
        )
    )
    ref = np.asarray(
        loglikes(packed.gconsts, packed.means_invvars, packed.inv_vars, feats)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
    assert np.all(np.isfinite(got))
