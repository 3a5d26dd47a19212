"""Device-resident carry E-steps (one fetch per pass) must match the
per-batch-fetch paths: same GMM stats, transition counts, and summary
scalars.  Covers EStepPipeline.align_and_accumulate(return_alignments=
False), whose stats ride a Kahan-compensated device carry."""

import math

import numpy as np
import pytest

from khg_tpu.est.flags import GMM_ALL
from khg_tpu.recipes.pipeline import EStepPipeline
from khg_tpu.recipes.yesno import make_synthetic_corpus, train_yesno
from khg_tpu.stats.accum import AccumAmDiagGmm


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(11)
    lp, corpus = make_synthetic_corpus(num_utts=7, dim=8, rng=rng)
    result = train_yesno(
        lp, corpus, num_iters=3, total_gauss=22, max_iter_inc=2,
        realign_iters="1 2",
    )
    return corpus, result


def _accs_allclose(a, b, num_pdfs, rtol=2e-5, atol=1e-4):
    for p in range(num_pdfs):
        np.testing.assert_allclose(
            a.get_acc(p).occupancy, b.get_acc(p).occupancy,
            rtol=rtol, atol=atol,
        )
        np.testing.assert_allclose(
            a.get_acc(p).mean_accumulator, b.get_acc(p).mean_accumulator,
            rtol=rtol, atol=atol,
        )
        np.testing.assert_allclose(
            a.get_acc(p).variance_accumulator,
            b.get_acc(p).variance_accumulator,
            rtol=rtol, atol=atol,
        )


@pytest.mark.parametrize("backend", ["xla", "banded"])
def test_carry_align_matches_per_batch(system, backend):
    corpus, result = system
    am, tm = result.am, result.transition_model
    # batch_size=2 forces several carry folds per pass
    pipeline = EStepPipeline(
        tm, acoustic_scale=1.0, self_loop_scale=0.1, batch_size=2,
        align_backend=backend,
    )
    packed = pipeline.pack_graphs(result.graphs)

    ref = AccumAmDiagGmm()
    ref.init(am, flags=GMM_ALL)
    ref_t = tm.init_stats()
    ref_res = pipeline.align_and_accumulate(
        am, packed, corpus.feats, ref, ref_t
    )
    assert ref_res.alignments is not None

    car = AccumAmDiagGmm()
    car.init(am, flags=GMM_ALL)
    car_t = tm.init_stats()
    res = pipeline.align_and_accumulate(
        am, packed, corpus.feats, car, car_t, return_alignments=False
    )
    assert res.alignments is None
    assert res.num_done == ref_res.num_done
    assert res.num_error == ref_res.num_error
    assert res.frame_count == ref_res.frame_count
    assert math.isclose(res.tot_like, ref_res.tot_like, rel_tol=1e-5)
    # transition counts are integer-valued sums of 0/1 frame weights:
    # exact in both the f64 host path and the compensated device carry
    np.testing.assert_allclose(car_t, ref_t, rtol=0, atol=1e-3)
    _accs_allclose(car, ref, am.num_pdfs)
    assert math.isclose(car.tot_count, ref.tot_count, rel_tol=1e-6)
    assert math.isclose(
        car.tot_log_like, ref.tot_log_like, rel_tol=1e-5, abs_tol=1e-3
    )


def test_carry_without_accumulate_rejected(system):
    corpus, result = system
    pipeline = EStepPipeline(
        result.transition_model, acoustic_scale=1.0, self_loop_scale=0.1
    )
    packed = pipeline.pack_graphs(result.graphs)
    with pytest.raises(AssertionError):
        pipeline.align_and_accumulate(
            result.am, packed, corpus.feats,
            accumulate=False, return_alignments=False,
        )


def test_carry_small_batches_soft(system):
    """accumulate_forward_backward now always runs on the carry; a
    tiny batch size exercises many sequential compensated folds and the
    result must match a single-batch pass."""
    corpus, result = system
    am, tm = result.am, result.transition_model

    outs = {}
    for bs in (2, 64):
        pipeline = EStepPipeline(
            tm, acoustic_scale=1.0, self_loop_scale=0.1, batch_size=bs
        )
        packed = pipeline.pack_graphs(result.graphs)
        accs = AccumAmDiagGmm()
        accs.init(am, flags=GMM_ALL)
        t_accs = tm.init_stats()
        log_z = pipeline.accumulate_forward_backward(
            am, packed, corpus.feats, accs, t_accs
        )
        outs[bs] = (log_z, accs, t_accs)

    lz_a, acc_a, t_a = outs[2]
    lz_b, acc_b, t_b = outs[64]
    assert math.isclose(lz_a, lz_b, rel_tol=1e-5)
    np.testing.assert_allclose(t_a, t_b, rtol=1e-4, atol=1e-3)
    _accs_allclose(acc_a, acc_b, am.num_pdfs, rtol=1e-4, atol=1e-3)


def test_kahan_carry_precision_many_folds():
    """The compensated carry must not drift where a naive f32 running
    sum visibly does: fold a batch contribution with a large static
    component 4096 times and compare against exact f64 summation.
    This is the regime that licenses replacing the per-batch f64 host
    accumulation (BENCH.md carry section)."""
    import jax
    import jax.numpy as jnp

    from khg_tpu.recipes.pipeline import _kahan_add

    rng = np.random.default_rng(0)
    xs = (3e4 + rng.standard_normal(16384) * 10).astype(np.float32)

    @jax.jit
    def fold_all(xs):
        def step(cc, x):
            c, comp = cc
            c, comp = _kahan_add(c, comp, x)
            return (c, comp), None

        (c, _), _ = jax.lax.scan(
            step, (jnp.float32(0), jnp.float32(0)), xs
        )
        naive = jnp.sum(xs.astype(jnp.float32))  # single-pass f32 sum
        return c, naive

    kahan, _ = fold_all(jnp.asarray(xs))
    exact = float(np.sum(xs.astype(np.float64)))
    naive_seq = np.float32(0)
    for v in xs:  # sequential f32 adds — what a non-compensated carry does
        naive_seq = np.float32(naive_seq + v)
    assert abs(float(naive_seq) - exact) > 100.0, (
        "test must exercise a regime where naive f32 drifts"
    )
    # The compensated sum is limited only by the FINAL rounding to f32:
    # one ULP at this magnitude (~4.9e8) is 32, so "< 1.0" is
    # unsatisfiable for ANY f32 result.  Assert correct rounding (within
    # one ULP of the exact sum) and that the compensation actually beat
    # the naive sequential sum by a wide margin.
    ulp = float(np.spacing(np.float32(exact)))
    kahan_err = abs(float(kahan) - exact)
    assert kahan_err <= ulp, (float(kahan), exact, ulp)
    assert kahan_err < abs(float(naive_seq) - exact) / 4.0


def test_carry_wide_model_local_stats_matches(system, monkeypatch):
    """The wide-model carry branch (per-state component scores feeding
    BOTH the sac-mode banded Viterbi and the local-state stats fold)
    produces the same accumulators as the per-batch reference path.
    Forced by shrinking the EXTERNAL_AC_PDFS gate."""
    import khg_tpu.align.pallas_banded as pb

    monkeypatch.setattr(pb, "EXTERNAL_AC_PDFS", 1)  # everything is "wide"
    corpus, result = system
    am, tm = result.am, result.transition_model
    pipeline = EStepPipeline(
        tm, acoustic_scale=1.0, self_loop_scale=0.1, batch_size=2,
        align_backend="banded",
    )
    packed = pipeline.pack_graphs(result.graphs)

    ref = AccumAmDiagGmm()
    ref.init(am, flags=GMM_ALL)
    ref_t = tm.init_stats()
    ref_res = pipeline.align_and_accumulate(
        am, packed, corpus.feats, ref, ref_t
    )

    car = AccumAmDiagGmm()
    car.init(am, flags=GMM_ALL)
    car_t = tm.init_stats()
    res = pipeline.align_and_accumulate(
        am, packed, corpus.feats, car, car_t, return_alignments=False
    )
    assert res.num_done == ref_res.num_done
    assert res.num_error == ref_res.num_error
    assert math.isclose(res.tot_like, ref_res.tot_like, rel_tol=1e-5)
    np.testing.assert_allclose(car_t, ref_t, rtol=0, atol=1e-3)
    _accs_allclose(car, ref, am.num_pdfs)


def test_em_pass_resident_matches_host_driven():
    """Device-resident EM pass (stats never fetched; M-step on device;
    small packet fetch) == host-driven carry accumulate + host MLE
    update, including starved-component removal and the
    apply_model_to_am write-back."""
    from khg_tpu.est.mle import MleDiagGmmOptions, mle_am_diag_gmm_update

    rng = np.random.default_rng(17)
    from khg_tpu.recipes.yesno import make_synthetic_corpus, train_yesno

    lp, corpus = make_synthetic_corpus(num_utts=7, dim=8, rng=rng)
    result = train_yesno(
        lp, corpus, num_iters=3, total_gauss=22, max_iter_inc=2,
        realign_iters="1 2",
    )
    tm = result.transition_model
    pipeline = EStepPipeline(
        tm, acoustic_scale=1.0, self_loop_scale=0.1, batch_size=2,
        align_backend="banded",
    )
    packed = pipeline.pack_graphs(result.graphs)
    opts = MleDiagGmmOptions()

    # host-driven reference: carry accumulate -> host MLE update
    am_host = result.am.copy()
    accs = AccumAmDiagGmm()
    accs.init(am_host, flags=GMM_ALL)
    tacc = tm.init_stats()
    ref_res = pipeline.align_and_accumulate(
        am_host, packed, corpus.feats, accs, tacc, return_alignments=False
    )
    mle_am_diag_gmm_update(opts, accs, 0b111, am_host)

    # device-resident pass
    am_dev = result.am.copy()
    model = pipeline.pack_model_device(am_dev)
    new_model, counts, res = pipeline.em_pass_resident(
        model, packed, corpus.feats, mle_config=opts
    )
    assert res.num_done == ref_res.num_done
    assert res.num_error == ref_res.num_error
    assert res.frame_count == ref_res.frame_count
    assert math.isclose(res.tot_like, ref_res.tot_like, rel_tol=1e-5)
    np.testing.assert_allclose(counts, tacc, rtol=0, atol=1e-3)
    pipeline.apply_model_to_am(new_model, am_dev)

    for p in range(am_host.num_pdfs):
        gh, gd = am_host.get_pdf(p), am_dev.get_pdf(p)
        assert gh.num_gauss == gd.num_gauss, p
        np.testing.assert_allclose(gd.weights, gh.weights,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(gd.inv_vars, gh.inv_vars,
                                   rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(gd.means_invvars, gh.means_invvars,
                                   rtol=2e-3, atol=1e-3)
        np.testing.assert_allclose(gd.gconsts, gh.gconsts,
                                   rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("backend", ["banded", "xla"])
def test_em_passes_resident_matches_per_pass_host_loop(backend):
    """N fully-resident passes (device transition update + device cost
    refresh, one fetch at the end) == N x {em_pass_resident; host
    tm.mle_update; refresh_transition_costs}."""
    import copy

    from khg_tpu.est.mle import MleDiagGmmOptions
    from khg_tpu.model.transition_model import MleTransitionUpdateConfig
    from khg_tpu.recipes.yesno import make_synthetic_corpus, train_yesno

    rng = np.random.default_rng(23)
    lp, corpus = make_synthetic_corpus(num_utts=7, dim=8, rng=rng)
    result = train_yesno(
        lp, corpus, num_iters=3, total_gauss=22, max_iter_inc=2,
        realign_iters="1 2",
    )
    opts = MleDiagGmmOptions()
    tcfg = MleTransitionUpdateConfig()
    passes = 3

    # host-driven reference: per-pass resident E/M + HOST transition
    # update + HOST cost refresh
    tm_h = copy.deepcopy(result.transition_model)
    pipe_h = EStepPipeline(
        tm_h, acoustic_scale=1.0, self_loop_scale=0.1, batch_size=2,
        align_backend=backend,
    )
    base_h = pipe_h.pack_graphs_base(result.graphs)
    am_h = result.am.copy()
    model_h = pipe_h.pack_model_device(am_h)
    likes_h = []
    for _ in range(passes):
        graphs_p = pipe_h.refresh_transition_costs(base_h)
        model_h, counts, res = pipe_h.em_pass_resident(
            model_h, graphs_p, corpus.feats, mle_config=opts
        )
        likes_h.append(res.tot_like)
        tm_h.mle_update(counts, tcfg)

    # fully-resident loop
    tm_d = copy.deepcopy(result.transition_model)
    pipe_d = EStepPipeline(
        tm_d, acoustic_scale=1.0, self_loop_scale=0.1, batch_size=2,
        align_backend=backend,
    )
    base_d = pipe_d.pack_graphs_base(result.graphs)
    am_d = result.am.copy()
    model_d = pipe_d.pack_model_device(am_d)
    model_d, rec = pipe_d.em_passes_resident(
        model_d, base_d, corpus.feats, passes,
        mle_config=opts, transition_cfg=tcfg,
    )
    assert rec.shape == (passes, 8)
    # per-pass log-likes agree
    likes_d = rec[:, 2] / pipe_d.acoustic_scale
    np.testing.assert_allclose(likes_d, likes_h, rtol=2e-5)
    assert int(rec[:, 4].sum()) == 0  # no failures
    # final transition models agree (f32 vs f64 count temporaries)
    np.testing.assert_allclose(
        tm_d.log_probs[1:], tm_h.log_probs[1:], rtol=0, atol=1e-5
    )
    # final GMMs agree
    pipe_h.apply_model_to_am(model_h, am_h)
    pipe_d.apply_model_to_am(model_d, am_d)
    for p in range(am_h.num_pdfs):
        gh, gd = am_h.get_pdf(p), am_d.get_pdf(p)
        assert gh.num_gauss == gd.num_gauss, p
        np.testing.assert_allclose(gd.weights, gh.weights,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(gd.means_invvars, gh.means_invvars,
                                   rtol=2e-3, atol=1e-3)


def test_em_passes_resident_failure_accounting():
    """An unalignable utterance (graph needs more frames than it has)
    is counted as an error EVERY pass, contributes nothing to the
    stats, and the rest of the corpus still trains."""
    from khg_tpu.est.mle import MleDiagGmmOptions
    from khg_tpu.recipes.yesno import make_synthetic_corpus, train_yesno

    rng = np.random.default_rng(31)
    lp, corpus = make_synthetic_corpus(num_utts=6, dim=8, rng=rng)
    result = train_yesno(
        lp, corpus, num_iters=2, total_gauss=22, max_iter_inc=1,
        realign_iters="1",
    )
    feats = list(corpus.feats)
    feats[2] = feats[2][:2]  # 2 frames cannot traverse the word graph
    pipe = EStepPipeline(
        result.transition_model, acoustic_scale=1.0, self_loop_scale=0.1,
        batch_size=3, align_backend="banded",
    )
    base = pipe.pack_graphs_base(result.graphs)
    model = pipe.pack_model_device(result.am.copy())
    model, rec = pipe.em_passes_resident(
        model, base, feats, 3, mle_config=MleDiagGmmOptions()
    )
    assert rec.shape == (3, 8)
    np.testing.assert_array_equal(rec[:, 4], [1.0, 1.0, 1.0])  # num_error
    np.testing.assert_array_equal(rec[:, 3], [5.0, 5.0, 5.0])  # num_done
    # frame accounting excludes the failed utterance
    good = sum(f.shape[0] for i, f in enumerate(feats) if i != 2)
    np.testing.assert_array_equal(rec[:, 5], [good] * 3)
    assert np.all(np.isfinite(rec[:, 0]))


def test_banded_compile_failure_demotes_to_xla(system, monkeypatch):
    """A banded-kernel compile failure (real-chip scoped-VMEM OOMs
    arrive as exceptions at dispatch) must demote that batch to the XLA
    tables and keep the corpus pass running — results identical to the
    pure XLA path."""
    from khg_tpu.est.mle import MleDiagGmmOptions
    from khg_tpu.recipes.pipeline import EStepPipeline

    corpus, result = system
    am, tm = result.am, result.transition_model
    opts = MleDiagGmmOptions()

    def run(backend, sabotage):
        pipe = EStepPipeline(
            tm, acoustic_scale=1.0, self_loop_scale=0.1, batch_size=2,
            align_backend=backend,
        )
        if sabotage:
            real = pipe._fused_carry_delta_fn

            def exploding(banded_args, wide):
                if banded_args is not None:
                    def boom(*a, **k):
                        raise RuntimeError(
                            "Mosaic: scoped vmem limit exceeded (test)"
                        )
                    return boom
                return real(None, False)

            monkeypatch.setattr(
                pipe, "_fused_carry_delta_fn", exploding
            )
        base = pipe.pack_graphs_base(result.graphs)
        model = pipe.pack_model_device(am.copy())
        model, rec = pipe.em_passes_resident(
            model, base, corpus.feats, 2, mle_config=opts
        )
        return np.asarray(model[0]), rec

    g_ref, rec_ref = run("xla", sabotage=False)
    g_demoted, rec_demoted = run("banded", sabotage=True)
    assert int(rec_demoted[:, 4].sum()) == 0
    np.testing.assert_allclose(rec_demoted[:, 0], rec_ref[:, 0],
                               rtol=1e-5)
    np.testing.assert_allclose(g_demoted, g_ref, rtol=1e-4, atol=1e-4)
