"""Parity: fused Pallas stats fold == XLA local-state fold.

The kernel (stats/pallas_fold.py) recomputes per-state scores, selects
the aligned state, and folds occupancy/moment stats entirely in VMEM;
these tests pin it (interpret mode, CPU) against
accumulate_am_stats_local, which is itself pinned against the global
GEMM fold and the reference goldens (tests/test_stats_est.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from khg_tpu.stats.accum import accumulate_am_stats_local
from khg_tpu.stats.pallas_fold import accumulate_am_stats_fold_pallas


def _problem(seed, B=5, T=23, D=6, P=37, K=8, S0=11, frac_weights=False,
             pad_components=0):
    rng = np.random.default_rng(seed)
    gconsts = rng.standard_normal((P, K)).astype(np.float32)
    miv = rng.standard_normal((P, K, D)).astype(np.float32)
    iv = rng.uniform(0.5, 2.0, (P, K, D)).astype(np.float32)
    if pad_components:
        gconsts[:, K - pad_components:] = -np.inf
        miv[:, K - pad_components:] = 0.0
        iv[:, K - pad_components:] = 1.0
    feats = rng.standard_normal((B, T, D)).astype(np.float32)
    state_pdf = rng.integers(0, P, (B, S0)).astype(np.int32)
    # aligned pdfs drawn from each utterance's own states (the contract)
    cols = rng.integers(0, S0, (B, T))
    pdf_ids = np.take_along_axis(state_pdf, cols, axis=1).astype(np.int32)
    if frac_weights:
        fw = rng.uniform(0.0, 1.0, (B, T)).astype(np.float32)
        fw[fw < 0.2] = 0.0
    else:
        fw = (rng.uniform(size=(B, T)) > 0.15).astype(np.float32)
    return gconsts, miv, iv, feats, pdf_ids, fw, state_pdf


def _assert_stats_close(a, b, tol=2e-4):
    np.testing.assert_allclose(a.occ, b.occ, rtol=tol, atol=tol)
    np.testing.assert_allclose(a.mean_acc, b.mean_acc, rtol=tol, atol=tol)
    np.testing.assert_allclose(a.var_acc, b.var_acc, rtol=tol, atol=tol)
    np.testing.assert_allclose(
        float(a.tot_log_like), float(b.tot_log_like), rtol=tol)
    np.testing.assert_allclose(
        float(a.tot_frames), float(b.tot_frames), rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_fold_kernel_matches_xla_local(seed):
    args = _problem(seed)
    ref = accumulate_am_stats_local(*map(jnp.asarray, args))
    got = accumulate_am_stats_fold_pallas(
        *map(jnp.asarray, args), interpret=True)
    _assert_stats_close(got, ref)


def test_fold_kernel_fractional_weights_and_padding_components():
    args = _problem(7, frac_weights=True, pad_components=3)
    ref = accumulate_am_stats_local(*map(jnp.asarray, args))
    got = accumulate_am_stats_fold_pallas(
        *map(jnp.asarray, args), interpret=True)
    _assert_stats_close(got, ref)
    # padded components must carry exactly zero occupancy
    assert float(jnp.abs(got.occ[:, -3:]).max()) == 0.0


def test_fold_kernel_ragged_shapes_and_blocking():
    # shapes that exercise every padding path: S0 not 8-divisible,
    # T not chunk-divisible, B not block-divisible
    args = _problem(3, B=3, T=17, S0=5, K=8)
    ref = accumulate_am_stats_local(*map(jnp.asarray, args))
    got = accumulate_am_stats_fold_pallas(
        *map(jnp.asarray, args), interpret=True, block_b=2, time_chunk=8)
    _assert_stats_close(got, ref)


def test_fold_kernel_bench_scale_shapes():
    # triphone-bench-like (scaled down in T/B): wide P, K=32, S0=64
    args = _problem(11, B=4, T=40, D=16, P=257, K=32, S0=24)
    ref = accumulate_am_stats_local(*map(jnp.asarray, args))
    got = accumulate_am_stats_fold_pallas(
        *map(jnp.asarray, args), interpret=True, block_b=4)
    _assert_stats_close(got, ref)
