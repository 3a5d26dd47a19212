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
