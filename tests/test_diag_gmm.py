import math
import pickle

import numpy as np
import pytest

from khg_tpu.gmm.am_gmm import AmDiagGmm, get_split_targets
from khg_tpu.gmm.diag_gmm import DiagGmm
from khg_tpu.gmm.likelihoods import loglikes_np
from khg_tpu.utils.math_utils import M_LOG_2PI


def random_gmm(nmix, dim, rng):
    g = DiagGmm(nmix, dim)
    g.set_weights(rng.dirichlet(np.ones(nmix)).astype(np.float32))
    means = rng.standard_normal((nmix, dim)).astype(np.float32)
    invvars = rng.uniform(0.5, 2.0, (nmix, dim)).astype(np.float32)
    g.set_invvars_and_means(invvars, means)
    g.compute_gconsts()
    return g


def test_gconst_closed_form():
    rng = np.random.default_rng(0)
    g = random_gmm(3, 5, rng)
    # Re-derive gconst from the definition
    w = g.weights
    means = g.get_means()
    variances = g.get_vars()
    expected = (
        np.log(w)
        - 0.5 * (M_LOG_2PI * g.dim + np.sum(np.log(variances), axis=1))
        - 0.5 * np.sum(means**2 / variances, axis=1)
    )
    np.testing.assert_allclose(g.gconsts, expected, rtol=1e-5)


def test_loglikelihood_matches_density():
    rng = np.random.default_rng(1)
    g = random_gmm(4, 3, rng)
    x = rng.standard_normal(3).astype(np.float32)
    # Brute force density
    means = g.get_means()
    variances = g.get_vars()
    p = 0.0
    for k in range(4):
        z = np.prod(1.0 / np.sqrt(2 * np.pi * variances[k]))
        p += g.weights[k] * z * np.exp(
            -0.5 * np.sum((x - means[k]) ** 2 / variances[k])
        )
    assert math.isclose(g.log_likelihood(x), math.log(p), rel_tol=1e-4)


def test_component_posteriors_sum_to_one():
    rng = np.random.default_rng(2)
    g = random_gmm(5, 4, rng)
    x = rng.standard_normal(4).astype(np.float32)
    ll, post = g.component_posteriors(x)
    assert math.isclose(post.sum(), 1.0, rel_tol=1e-5)
    assert math.isclose(ll, g.log_likelihood(x), rel_tol=1e-5)


def test_split_preserves_weight_and_doubles():
    rng = np.random.default_rng(3)
    g = random_gmm(2, 3, rng)
    w0 = g.weights.sum()
    g.split(4, perturb_factor=0.01, rng=rng)
    assert g.num_gauss == 4
    assert math.isclose(g.weights.sum(), w0, rel_tol=1e-5)
    assert g.valid_gconsts


def test_merge_to_one_matches_moments():
    rng = np.random.default_rng(4)
    g = random_gmm(3, 2, rng)
    w = g.weights.copy()
    means = g.get_means().copy()
    variances = g.get_vars().copy()
    g.merge(1)
    assert g.num_gauss == 1
    mean1 = w @ means
    var1 = w @ (variances + means**2) - mean1**2
    np.testing.assert_allclose(g.get_means()[0], mean1, rtol=1e-4)
    np.testing.assert_allclose(g.get_vars()[0], var1, rtol=1e-4)


def test_merge_pairwise():
    rng = np.random.default_rng(5)
    g = random_gmm(6, 3, rng)
    g.merge(3)
    assert g.num_gauss == 3
    assert math.isclose(g.weights.sum(), 1.0, rel_tol=1e-4)


def test_remove_components():
    rng = np.random.default_rng(6)
    g = random_gmm(4, 2, rng)
    g.remove_components([1, 3], renorm_weights=True)
    assert g.num_gauss == 2
    assert math.isclose(g.weights.sum(), 1.0, rel_tol=1e-6)


def test_pickle():
    rng = np.random.default_rng(7)
    g = random_gmm(3, 4, rng)
    g2 = pickle.loads(pickle.dumps(g))
    np.testing.assert_array_equal(g.weights, g2.weights)
    np.testing.assert_array_equal(g.means_invvars, g2.means_invvars)


def test_get_split_targets_power_allocation():
    occs = np.array([100.0, 10.0, 1.0], dtype=np.float32)
    targets = get_split_targets(occs, 6, power=0.2, min_count=0.0)
    assert sum(targets) == 6
    assert targets[0] >= targets[1] >= targets[2] >= 1


def test_get_split_targets_min_count():
    occs = np.array([5.0, 5.0], dtype=np.float32)
    # min_count 20 forbids any splitting beyond 1 comp each
    targets = get_split_targets(occs, 10, power=0.2, min_count=20.0)
    assert targets == [1, 1]


def test_am_pack_and_device_loglikes_match_host():
    rng = np.random.default_rng(8)
    am = AmDiagGmm()
    for k in (1, 3, 2):
        am.add_pdf(random_gmm(k, 6, rng))
    packed = am.pack()
    assert packed.num_pdfs == 3 and packed.max_mix == 3 and packed.dim == 6
    feats = rng.standard_normal((11, 6)).astype(np.float32)
    dev = loglikes_np(packed, feats)
    assert dev.shape == (11, 3)
    for p in range(3):
        host = np.array(
            [am.get_pdf(p).log_likelihood(feats[t]) for t in range(11)]
        )
        np.testing.assert_allclose(dev[:, p], host, rtol=2e-4, atol=2e-4)


def test_pack_with_padding_alignment():
    rng = np.random.default_rng(9)
    am = AmDiagGmm()
    am.add_pdf(random_gmm(3, 6, rng))
    packed = am.pack(mix_pad_to=8, dim_pad_to=128)
    assert packed.max_mix == 8
    assert packed.means_invvars.shape[2] == 128
    feats = np.zeros((4, 128), dtype=np.float32)
    feats[:, :6] = rng.standard_normal((4, 6)).astype(np.float32)
    dev = loglikes_np(packed, feats)
    host = np.array(
        [am.get_pdf(0).log_likelihood(feats[t, :6]) for t in range(4)]
    )
    np.testing.assert_allclose(dev[:, 0], host, rtol=2e-4, atol=2e-4)


def test_split_by_count_and_merge_by_count():
    rng = np.random.default_rng(10)
    am = AmDiagGmm()
    for _ in range(3):
        am.add_pdf(random_gmm(1, 4, rng))
    occs = np.array([100.0, 50.0, 25.0], dtype=np.float32)
    am.split_by_count(occs, 9, perturb_factor=0.01, power=0.2, min_count=0.0, rng=rng)
    assert am.num_gauss == 9
    am.merge_by_count(occs, 3, power=0.2, min_count=0.0)
    assert am.num_gauss <= 9
