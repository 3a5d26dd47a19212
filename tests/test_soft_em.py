"""Baum-Welch (soft) E-step through the pipeline."""

import math

import numpy as np
import pytest

from khg_tpu.est.flags import GMM_ALL
from khg_tpu.recipes.pipeline import EStepPipeline
from khg_tpu.recipes.steps import gmm_est
from khg_tpu.recipes.yesno import make_synthetic_corpus, train_yesno
from khg_tpu.stats.accum import AccumAmDiagGmm


def test_soft_estep_stats_close_to_hard_when_sharp():
    """With a well-trained model the FB posteriors concentrate on the
    Viterbi path, so soft stats approximately match hard stats."""
    rng = np.random.default_rng(2)
    lp, corpus = make_synthetic_corpus(num_utts=6, dim=8, rng=rng)
    result = train_yesno(
        lp, corpus, num_iters=6, total_gauss=30, max_iter_inc=3,
        realign_iters="1 2 3 4 5",
    )
    am, tm = result.am, result.transition_model
    pipeline = EStepPipeline(tm, acoustic_scale=1.0, self_loop_scale=0.1)
    packed = pipeline.pack_graphs(result.graphs)

    hard = AccumAmDiagGmm()
    hard.init(am, flags=GMM_ALL)
    hard_t = tm.init_stats()
    res = pipeline.align_and_accumulate(
        am, packed, corpus.feats, hard, hard_t
    )

    soft = AccumAmDiagGmm()
    soft.init(am, flags=GMM_ALL)
    soft_t = tm.init_stats()
    log_z = pipeline.accumulate_forward_backward(
        am, packed, corpus.feats, soft, soft_t
    )

    assert math.isclose(soft.tot_count, hard.tot_count, rel_tol=1e-3)
    # occupancies close (posterior mass concentrated at scale 1.0)
    for p in range(am.num_pdfs):
        h = hard.get_acc(p).occupancy.sum()
        s = soft.get_acc(p).occupancy.sum()
        assert abs(h - s) < 0.1 * max(hard.tot_count, 1.0), (p, h, s)
    # transition counts: same totals
    assert math.isclose(soft_t.sum(), hard_t.sum(), rel_tol=1e-3)
    # log Z upper-bounds the Viterbi path log-prob
    assert log_z >= res.tot_like * pipeline.acoustic_scale - 1e-3


def test_soft_em_improves_loglike():
    """A few Baum-Welch iterations must increase total log Z."""
    rng = np.random.default_rng(3)
    lp, corpus = make_synthetic_corpus(num_utts=6, dim=8, rng=rng)
    result = train_yesno(
        lp, corpus, num_iters=3, total_gauss=22, max_iter_inc=2,
        realign_iters="1 2",
    )
    am, tm = result.am, result.transition_model
    pipeline = EStepPipeline(tm, acoustic_scale=1.0, self_loop_scale=0.1)

    log_zs = []
    for _ in range(4):
        packed = pipeline.pack_graphs(result.graphs)
        accs = AccumAmDiagGmm()
        accs.init(am, flags=GMM_ALL)
        t_accs = tm.init_stats()
        log_z = pipeline.accumulate_forward_backward(
            am, packed, corpus.feats, accs, t_accs
        )
        log_zs.append(log_z)
        gmm_est(am, accs, tm, t_accs, update_flags="mvwt")
    assert log_zs[-1] > log_zs[0]
    # monotone within tolerance (EM guarantee, modulo f32 noise)
    for a, b in zip(log_zs, log_zs[1:]):
        assert b > a - 1.0, log_zs


def test_soft_estep_banded_backend_matches_xla():
    """accumulate_forward_backward with align_backend='banded' (fused
    Pallas kernel, interpret on CPU) matches the XLA backend's stats."""
    rng = np.random.default_rng(4)
    lp, corpus = make_synthetic_corpus(num_utts=5, dim=8, rng=rng)
    result = train_yesno(
        lp, corpus, num_iters=3, total_gauss=22, max_iter_inc=2,
        realign_iters="1 2",
    )
    am, tm = result.am, result.transition_model

    outs = {}
    for backend in ("xla", "banded"):
        pipeline = EStepPipeline(
            tm, acoustic_scale=1.0, self_loop_scale=0.1,
            align_backend=backend,
        )
        packed = pipeline.pack_graphs(result.graphs)
        accs = AccumAmDiagGmm()
        accs.init(am, flags=GMM_ALL)
        t_accs = tm.init_stats()
        log_z = pipeline.accumulate_forward_backward(
            am, packed, corpus.feats, accs, t_accs
        )
        outs[backend] = (log_z, accs, t_accs)

    lz_x, acc_x, t_x = outs["xla"]
    lz_b, acc_b, t_b = outs["banded"]
    assert math.isclose(lz_b, lz_x, rel_tol=1e-5)
    # both paths accumulate in f32; differences are association noise,
    # so compare relatively (large counts carry large absolute noise)
    np.testing.assert_allclose(t_b, t_x, rtol=1e-3, atol=5e-3)
    for p in range(am.num_pdfs):
        np.testing.assert_allclose(
            acc_b.get_acc(p).occupancy, acc_x.get_acc(p).occupancy,
            rtol=1e-3, atol=5e-3,
        )
        np.testing.assert_allclose(
            acc_b.get_acc(p).mean_accumulator,
            acc_x.get_acc(p).mean_accumulator, rtol=1e-3, atol=5e-2,
        )


@pytest.mark.parametrize("backend", ["banded", "xla"])
def test_fb_em_passes_resident_matches_per_pass_host_loop(backend):
    """N fully-resident Baum-Welch passes (device M-step + device
    transition update on EXPECTED counts + device cost refresh, one
    fetch at the end) == N x {accumulate_forward_backward; host GMM
    update; host tm.mle_update; refresh_transition_costs}."""
    import copy

    from khg_tpu.est.mle import MleDiagGmmOptions, mle_am_diag_gmm_update
    from khg_tpu.model.transition_model import MleTransitionUpdateConfig

    rng = np.random.default_rng(29)
    lp, corpus = make_synthetic_corpus(num_utts=7, dim=8, rng=rng)
    result = train_yesno(
        lp, corpus, num_iters=3, total_gauss=22, max_iter_inc=2,
        realign_iters="1 2",
    )
    opts = MleDiagGmmOptions()
    tcfg = MleTransitionUpdateConfig()
    passes = 3

    # host-driven reference
    tm_h = copy.deepcopy(result.transition_model)
    pipe_h = EStepPipeline(
        tm_h, acoustic_scale=1.0, self_loop_scale=0.1, batch_size=2,
        align_backend=backend,
    )
    base_h = pipe_h.pack_graphs_base(result.graphs)
    am_h = result.am.copy()
    log_zs_h = []
    for _ in range(passes):
        graphs_p = pipe_h.refresh_transition_costs(base_h)
        accs = AccumAmDiagGmm()
        accs.init(am_h, flags=GMM_ALL)
        tacc = tm_h.init_stats()
        log_zs_h.append(
            pipe_h.accumulate_forward_backward(
                am_h, graphs_p, corpus.feats, accs, tacc
            )
        )
        mle_am_diag_gmm_update(opts, accs, 0b111, am_h)
        tm_h.mle_update(tacc, tcfg)

    # fully-resident soft loop
    tm_d = copy.deepcopy(result.transition_model)
    pipe_d = EStepPipeline(
        tm_d, acoustic_scale=1.0, self_loop_scale=0.1, batch_size=2,
        align_backend=backend,
    )
    base_d = pipe_d.pack_graphs_base(result.graphs)
    am_d = result.am.copy()
    model_d = pipe_d.pack_model_device(am_d)
    model_d, rec = pipe_d.fb_em_passes_resident(
        model_d, base_d, corpus.feats, passes,
        mle_config=opts, transition_cfg=tcfg,
    )
    assert rec.shape == (passes, 8)
    assert int(rec[:, 4].sum()) == 0  # no FB failures
    np.testing.assert_allclose(rec[:, 2], log_zs_h, rtol=3e-5)
    np.testing.assert_allclose(
        # expected (fractional) tid counts ride the f32 carry on device
        # vs f64 host accumulators — unlike the hard loop's exact
        # integer counts, so O(1e-4) log-prob noise is the honest bound
        tm_d.log_probs[1:], tm_h.log_probs[1:], rtol=0, atol=3e-4
    )
    pipe_d.apply_model_to_am(model_d, am_d)
    for p in range(am_h.num_pdfs):
        gh, gd = am_h.get_pdf(p), am_d.get_pdf(p)
        assert gh.num_gauss == gd.num_gauss, p
        np.testing.assert_allclose(gd.weights, gh.weights,
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(gd.means_invvars, gh.means_invvars,
                                   rtol=5e-3, atol=2e-3)


def test_sharded_resident_fb_em_loop_matches_single_chip():
    """Mesh soft loop == single-chip fb_em_passes_resident on the same
    data (2- and 4-device meshes): same per-pass packets, same final
    model and transition probs.  psum==serial anchor for the soft path."""
    import copy

    import jax
    import jax.numpy as jnp

    from khg_tpu.align.packed import pack_graph_batch
    from khg_tpu.est.mle import MleDiagGmmOptions
    from khg_tpu.model.transition_device import build_transition_struct
    from khg_tpu.model.transition_model import MleTransitionUpdateConfig
    from khg_tpu.parallel.mesh import (
        make_data_mesh,
        sharded_resident_fb_em_loop,
        unpack_resident_packet,
    )

    rng = np.random.default_rng(41)
    lp, corpus = make_synthetic_corpus(num_utts=8, dim=8, rng=rng)
    result = train_yesno(
        lp, corpus, num_iters=2, total_gauss=22, max_iter_inc=1,
        realign_iters="1",
    )
    opts = MleDiagGmmOptions()
    tcfg = MleTransitionUpdateConfig()
    passes = 2
    # equal-length pad so one batch shards cleanly over the mesh
    T = max(f.shape[0] for f in corpus.feats)
    feats = np.stack([
        np.pad(f, ((0, T - f.shape[0]), (0, 0))) for f in corpus.feats
    ]).astype(np.float32)
    lens = np.array([f.shape[0] for f in corpus.feats], np.int32)

    # single-chip reference
    tm_s = copy.deepcopy(result.transition_model)
    pipe_s = EStepPipeline(
        tm_s, acoustic_scale=1.0, self_loop_scale=0.1, batch_size=8,
        align_backend="xla",
    )
    base_s = pipe_s.pack_graphs_base(result.graphs)
    am_s = result.am.copy()
    model_s = pipe_s.pack_model_device(am_s)
    model_s, rec_s = pipe_s.fb_em_passes_resident(
        model_s, base_s, [f for f in corpus.feats], passes,
        mle_config=opts, transition_cfg=tcfg,
    )

    for n_dev in (2, 4):
        mesh = make_data_mesh(n_dev)
        tm_m = copy.deepcopy(result.transition_model)
        pipe_m = EStepPipeline(
            tm_m, acoustic_scale=1.0, self_loop_scale=0.1, batch_size=8,
            align_backend="xla",
        )
        base_m = pipe_m.pack_graphs_base(result.graphs)
        graphs = pack_graph_batch(list(base_m), semiring="log")
        struct = build_transition_struct(tm_m)
        P_, K = np.asarray(model_s[0]).shape
        D = feats.shape[-1]
        loop = sharded_resident_fb_em_loop(
            mesh, P_, K, D, tm_m.num_transition_ids, struct,
            acoustic_scale=1.0, transition_scale=1.0, self_loop_scale=0.1,
            mle_config=opts, transition_cfg=tcfg,
        )
        model_m = pipe_m.pack_model_device(result.am.copy())
        model_m = tuple(jnp.asarray(x) for x in model_m)
        logp = jnp.asarray(np.asarray(tm_m.log_probs, np.float32))
        delta = loop.delta(logp)
        packets = []
        for _ in range(passes):
            carry, comp = loop.make_carry()
            carry, comp = loop.fold(
                model_m, delta, carry, comp, graphs,
                jnp.asarray(feats), jnp.asarray(lens),
            )
            model_m, logp, delta, packet = loop.finish(
                model_m, carry, comp, logp
            )
            packets.append(np.asarray(jax.device_get(packet)))
        # per-pass summary scalars match the single-chip records
        for p in range(passes):
            (tot_ll, tot_frames, counts, log_z_sum, num_done, num_error,
             _fc) = unpack_resident_packet(
                packets[p], tm_m.num_transition_ids
            )
            np.testing.assert_allclose(tot_ll, rec_s[p, 0], rtol=3e-5)
            # soft tot_frames is summed posterior mass (fractional) —
            # f32 reassociation across shards moves it at the 1e-5 level
            np.testing.assert_allclose(tot_frames, rec_s[p, 1], rtol=1e-4)
            np.testing.assert_allclose(log_z_sum, rec_s[p, 2], rtol=3e-5)
            assert num_done == rec_s[p, 3] and num_error == rec_s[p, 4]
        np.testing.assert_allclose(
            # same fractional-counts-in-f32 bound as the single-chip test
            np.asarray(jax.device_get(logp))[1:], tm_s.log_probs[1:],
            rtol=0, atol=3e-4,
        )
        for a, b in zip(model_m, model_s):
            np.testing.assert_allclose(
                np.asarray(jax.device_get(a)), np.asarray(b),
                rtol=2e-4, atol=2e-4,
            )
