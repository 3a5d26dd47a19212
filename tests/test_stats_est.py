import math

import numpy as np
import pytest

from khg_tpu.est.flags import GMM_ALL, str_to_gmm_flags
from khg_tpu.est.mle import (
    MapDiagGmmOptions,
    MleDiagGmmOptions,
    gmm_boost_silence,
    map_diag_gmm_update,
    ml_objective,
    mle_diag_gmm_update,
)
from khg_tpu.stats.accum import (
    AccumAmDiagGmm,
    AccumDiagGmm,
    accumulate_am_stats,
)
from tests.test_align import random_am
from tests.test_graph_compiler import build_yesno_like


def test_device_stats_match_host_accumulation():
    rng = np.random.default_rng(5)
    am = random_am(4, 5, rng, max_mix=3)
    T = 17
    feats = rng.standard_normal((1, T, 5)).astype(np.float32)
    pdf_seq = rng.integers(0, 4, T).astype(np.int32)

    # host path: per-frame accumulate_for_gmm
    host = AccumAmDiagGmm()
    host.init(am, flags=GMM_ALL)
    for t in range(T):
        host.accumulate_for_gmm(am, feats[0, t], int(pdf_seq[t]), 1.0)

    # device path
    dev = AccumAmDiagGmm()
    dev.init(am, flags=GMM_ALL)
    model = am.pack()
    stats = accumulate_am_stats(
        model.gconsts, model.means_invvars, model.inv_vars,
        feats, pdf_seq[None, :], np.ones((1, T), dtype=np.float32),
    )
    dev.add_dense(
        np.asarray(stats.occ), np.asarray(stats.mean_acc),
        np.asarray(stats.var_acc), float(stats.tot_log_like),
        float(stats.tot_frames),
    )

    assert math.isclose(dev.tot_count, host.tot_count)
    assert math.isclose(dev.tot_log_like, host.tot_log_like, rel_tol=1e-4)
    for p in range(4):
        np.testing.assert_allclose(
            dev.get_acc(p).occupancy, host.get_acc(p).occupancy,
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            dev.get_acc(p).mean_accumulator, host.get_acc(p).mean_accumulator,
            rtol=1e-3, atol=1e-4,
        )
        np.testing.assert_allclose(
            dev.get_acc(p).variance_accumulator,
            host.get_acc(p).variance_accumulator,
            rtol=1e-3, atol=1e-4,
        )


def test_stats_additive_equals_shard_sum():
    """psum correctness anchor: sum of per-shard stats == serial stats."""
    rng = np.random.default_rng(6)
    am = random_am(3, 4, rng)
    feats = rng.standard_normal((40, 4)).astype(np.float32)
    pdfs = rng.integers(0, 3, 40)

    serial = AccumAmDiagGmm()
    serial.init(am, flags=GMM_ALL)
    for t in range(40):
        serial.accumulate_for_gmm(am, feats[t], int(pdfs[t]), 1.0)

    sharded = AccumAmDiagGmm()
    sharded.init(am, flags=GMM_ALL)
    for lo in (0, 20):
        part = AccumAmDiagGmm()
        part.init(am, flags=GMM_ALL)
        for t in range(lo, lo + 20):
            part.accumulate_for_gmm(am, feats[t], int(pdfs[t]), 1.0)
        sharded.add(1.0, part)

    for p in range(3):
        np.testing.assert_allclose(
            sharded.get_acc(p).occupancy, serial.get_acc(p).occupancy, rtol=1e-12
        )
        np.testing.assert_allclose(
            sharded.get_acc(p).mean_accumulator,
            serial.get_acc(p).mean_accumulator,
            rtol=1e-12,
        )


def test_mle_update_recovers_sample_moments():
    rng = np.random.default_rng(7)
    from khg_tpu.gmm.diag_gmm import DiagGmm

    g = DiagGmm(1, 3)
    g.set_weights(np.ones(1, dtype=np.float32))
    g.set_invvars_and_means(
        np.ones((1, 3), dtype=np.float32), np.zeros((1, 3), dtype=np.float32)
    )
    g.compute_gconsts()
    data = rng.standard_normal((200, 3)).astype(np.float32) * 2.0 + 1.5
    acc = AccumDiagGmm(1, 3, GMM_ALL)
    for x in data:
        acc.accumulate_from_diag(g, x, 1.0)
    obj_change, count, ef, gf, rm = mle_diag_gmm_update(
        MleDiagGmmOptions(), acc, str_to_gmm_flags("mvw"), g
    )
    assert count == 200
    assert obj_change > 0
    np.testing.assert_allclose(g.get_means()[0], data.mean(axis=0), rtol=1e-4)
    np.testing.assert_allclose(
        g.get_vars()[0], data.var(axis=0), rtol=1e-3
    )


def test_mle_update_removes_low_count():
    rng = np.random.default_rng(8)
    am = random_am(1, 3, rng, max_mix=3)
    g = am.get_pdf(0)
    k = g.num_gauss
    if k == 1:
        g.split(3, 0.1, rng=rng)
        k = 3
    acc = AccumDiagGmm(k, 3, GMM_ALL)
    # only component stats for comp 0; others have zero occupancy
    data = rng.standard_normal((50, 3)).astype(np.float32)
    for x in data:
        acc.accumulate_for_component(x, 0, 1.0)
    obj, count, ef, gf, removed = mle_diag_gmm_update(
        MleDiagGmmOptions(), acc, str_to_gmm_flags("mvw"), g
    )
    assert removed == k - 1
    assert g.num_gauss == 1


def test_variance_flooring():
    rng = np.random.default_rng(9)
    from khg_tpu.gmm.diag_gmm import DiagGmm

    g = DiagGmm(1, 2)
    g.set_weights(np.ones(1, dtype=np.float32))
    g.set_invvars_and_means(
        np.ones((1, 2), dtype=np.float32), np.zeros((1, 2), dtype=np.float32)
    )
    g.compute_gconsts()
    acc = AccumDiagGmm(1, 2, GMM_ALL)
    # constant data -> zero variance -> must floor
    for _ in range(30):
        acc.accumulate_for_component(np.array([1.0, 1.0], np.float32), 0, 1.0)
    opts = MleDiagGmmOptions(min_variance=0.01)
    obj, count, ef, gf, rm = mle_diag_gmm_update(
        opts, acc, str_to_gmm_flags("mvw"), g
    )
    assert ef == 2 and gf == 1
    np.testing.assert_allclose(g.get_vars()[0], [0.01, 0.01], rtol=1e-5)


def test_map_update_shrinks_toward_prior():
    rng = np.random.default_rng(10)
    from khg_tpu.gmm.diag_gmm import DiagGmm

    g = DiagGmm(1, 2)
    g.set_weights(np.ones(1, dtype=np.float32))
    g.set_invvars_and_means(
        np.ones((1, 2), dtype=np.float32), np.zeros((1, 2), dtype=np.float32)
    )
    g.compute_gconsts()
    acc = AccumDiagGmm(1, 2, GMM_ALL)
    data = rng.standard_normal((20, 2)).astype(np.float32) + 3.0
    for x in data:
        acc.accumulate_from_diag(g, x, 1.0)
    opts = MapDiagGmmOptions(mean_tau=10.0)
    map_diag_gmm_update(opts, acc, str_to_gmm_flags("mv"), g)
    mean = g.get_means()[0]
    sample_mean = data.mean(axis=0)
    # MAP mean = (sum_x) / (occ + tau): strictly between 0 and sample mean
    assert np.all(mean > 0.1) and np.all(mean < sample_mean)


def test_boost_silence():
    lp, topo, tree, tm, gc = build_yesno_like()
    rng = np.random.default_rng(11)
    am = random_am(tree.num_pdfs, 4, rng, max_mix=2)
    boosted = gmm_boost_silence(am, tm, [lp.get_sil_phone_id()], boost=2.0)
    # silence pdfs are 0..4 (5-state sil); weights doubled there
    for p in range(5):
        np.testing.assert_allclose(
            boosted.get_pdf(p).weights, am.get_pdf(p).weights * 2.0, rtol=1e-6
        )
    for p in range(5, tree.num_pdfs):
        np.testing.assert_allclose(
            boosted.get_pdf(p).weights, am.get_pdf(p).weights, rtol=1e-6
        )
    # original untouched
    assert not np.allclose(boosted.get_pdf(0).weights, am.get_pdf(0).weights)


def test_gather_path_matches_gemm_path():
    """The large-model gather branch of accumulate_am_stats agrees with
    the all-pdf GEMM branch (forced via the P*K gate)."""
    import jax

    import khg_tpu.stats.accum as accum_mod

    rng = np.random.default_rng(9)
    am = random_am(6, 5, rng, max_mix=3)
    B, T = 3, 13
    feats = rng.standard_normal((B, T, 5)).astype(np.float32)
    pdf_seq = rng.integers(0, 6, (B, T)).astype(np.int32)
    fw = (rng.random((B, T)) > 0.2).astype(np.float32)
    model = am.pack()
    args = (model.gconsts, model.means_invvars, model.inv_vars,
            feats, pdf_seq, fw)

    a = jax.tree.map(np.asarray, accumulate_am_stats(*args))
    old = accum_mod._SCORES_ALL_MAX_BYTES
    try:
        accum_mod._SCORES_ALL_MAX_BYTES = 0  # force the gather branch
        accumulate_am_stats.clear_cache()
        b = jax.tree.map(np.asarray, accumulate_am_stats(*args))
    finally:
        accum_mod._SCORES_ALL_MAX_BYTES = old
        accumulate_am_stats.clear_cache()
    np.testing.assert_allclose(b.occ, a.occ, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(b.mean_acc, a.mean_acc, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(b.var_acc, a.var_acc, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        b.tot_log_like, a.tot_log_like, rtol=1e-5
    )


def test_smooth_with_accum_zero_occupancy_branch():
    """smooth_with_accum skips (and warns on) zero-occupancy source
    components instead of crashing (mle-diag-gmm.cc:209-226)."""
    from khg_tpu.est.flags import GMM_ALL
    from khg_tpu.stats.accum import AccumDiagGmm

    acc = AccumDiagGmm(2, 3, GMM_ALL)
    src = AccumDiagGmm(2, 3, GMM_ALL)
    acc.accumulate_for_component(np.full(3, 2.0), 0, 4.0)
    acc.accumulate_for_component(np.full(3, -1.0), 1, 3.0)
    src.accumulate_for_component(np.full(3, 1.0), 0, 5.0)  # comp 1 empty

    acc.smooth_with_accum(10.0, src)  # must not raise on comp 1
    assert acc.occupancy[0] == 14.0
    assert acc.occupancy[1] == 3.0  # untouched: source had no counts
    np.testing.assert_allclose(acc.mean_accumulator[0], 8.0 + 10.0 * 1.0)
    np.testing.assert_allclose(acc.mean_accumulator[1], -3.0)


def test_local_path_matches_gemm_path():
    """The local-state (S-factored) stats fold agrees with the standard
    accumulate_am_stats: duplicate pdfs across states, masked frames,
    padding states, and a padded mixture all covered."""
    import jax

    from khg_tpu.gmm.likelihoods import component_scores_per_state
    from khg_tpu.stats.accum import accumulate_am_stats_local

    rng = np.random.default_rng(11)
    am = random_am(6, 5, rng, max_mix=3)
    B, T, S = 3, 13, 4
    feats = rng.standard_normal((B, T, 5)).astype(np.float32)
    # per-utterance graph states with duplicate pdfs and a padding state
    state_pdf = np.array(
        [[0, 1, 1, 5], [2, 3, 2, 0], [4, 5, 0, 4]], dtype=np.int32
    )
    # alignments draw only from each utterance's graph states
    pdf_seq = np.stack(
        [state_pdf[b][rng.integers(0, S, T)] for b in range(B)]
    ).astype(np.int32)
    fw = (rng.random((B, T)) > 0.2).astype(np.float32)
    model = am.pack()
    args = (model.gconsts, model.means_invvars, model.inv_vars,
            feats, pdf_seq, fw)

    a = jax.tree.map(np.asarray, accumulate_am_stats(*args))
    b = jax.tree.map(
        np.asarray, accumulate_am_stats_local(*args, state_pdf=state_pdf)
    )
    np.testing.assert_allclose(b.occ, a.occ, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(b.mean_acc, a.mean_acc, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(b.var_acc, a.var_acc, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(b.tot_log_like, a.tot_log_like, rtol=1e-5)
    np.testing.assert_allclose(b.tot_frames, a.tot_frames)

    # precomputed state_scores (the fused-E-step path) is identical
    ssk = component_scores_per_state(
        model.gconsts, model.means_invvars, model.inv_vars,
        state_pdf, feats,
    )
    c = jax.tree.map(
        np.asarray,
        accumulate_am_stats_local(
            *args, state_pdf=state_pdf, state_scores=ssk
        ),
    )
    np.testing.assert_allclose(c.occ, b.occ, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(c.mean_acc, b.mean_acc, rtol=1e-6, atol=1e-6)
