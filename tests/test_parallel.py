"""Data-parallel sharded EM: sharding invariance, M-step parity,
multi-step convergence on the virtual CPU mesh."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from khg_tpu.align.packed import pack_graph, pack_graph_batch
from khg_tpu.est.flags import GMM_ALL
from khg_tpu.est.mle import MleDiagGmmOptions, mle_am_diag_gmm_update
from khg_tpu.graph.h_builder import add_transition_probs
from khg_tpu.parallel.mesh import make_data_mesh, sharded_em_step
from khg_tpu.stats.accum import AccumAmDiagGmm
from tests.test_align import random_am
from tests.test_graph_compiler import build_yesno_like


def build_sharded_problem(num_utts=8, T=24, dim=6, seed=0):
    lp, topo, tree, tm, gc = build_yesno_like()
    rng = np.random.default_rng(seed)
    am = random_am(tree.num_pdfs, dim, rng, max_mix=2)
    id2pdf = tm.id2pdf_array()
    packed = []
    for i in range(num_utts):
        words = [lp.word2id["YES" if (i + j) % 2 else "NO"]
                 for j in range(2 + i % 2)]
        g = gc.compile_graph_from_text(words).copy()
        add_transition_probs(tm, g, 1.0, 0.1)
        packed.append(pack_graph(g, id2pdf))
    graphs = pack_graph_batch(packed, states_pad_to=8, indeg_pad_to=2)
    feats = rng.standard_normal((num_utts, T, dim)).astype(np.float32)
    lens = np.full(num_utts, T, dtype=np.int32)
    packed_model = am.pack(mix_pad_to=2)
    weights = np.zeros(packed_model.gconsts.shape, dtype=np.float32)
    for p in range(am.num_pdfs):
        k = am.get_pdf(p).num_gauss
        weights[p, :k] = am.get_pdf(p).weights
    return lp, tm, am, packed_model, weights, graphs, feats, lens, id2pdf


def run_step(n_devices, problem, acoustic_scale=0.5, uniform_dest_pdf=False):
    lp, tm, am, pm, weights, graphs, feats, lens, id2pdf = problem
    mesh = make_data_mesh(n_devices, devices=jax.devices("cpu")[:n_devices])
    step = sharded_em_step(
        mesh, acoustic_scale=acoustic_scale, uniform_dest_pdf=uniform_dest_pdf
    )
    return step(
        (jnp.asarray(pm.gconsts), jnp.asarray(pm.means_invvars),
         jnp.asarray(pm.inv_vars), jnp.asarray(weights)),
        jax.tree.map(jnp.asarray, graphs),
        jnp.asarray(feats), jnp.asarray(lens), jnp.asarray(id2pdf),
    )


def test_sharding_invariance():
    problem = build_sharded_problem()
    results = [run_step(n, problem) for n in (1, 2, 4)]
    for r in results[1:]:
        np.testing.assert_allclose(
            np.asarray(r.occ), np.asarray(results[0].occ), rtol=1e-4, atol=1e-4
        )
        assert math.isclose(
            float(r.tot_log_like), float(results[0].tot_log_like), rel_tol=1e-4
        )
        np.testing.assert_array_equal(
            np.asarray(r.tids), np.asarray(results[0].tids)
        )


def test_dense_mstep_matches_host():
    """The on-device M-step equals the host MLE update where no component
    is removed (occupancy above threshold)."""
    problem = build_sharded_problem(num_utts=8, T=60)
    lp, tm, am, pm, weights, graphs, feats, lens, id2pdf = problem
    res = run_step(4, problem)

    # host path: fold the SAME dense stats into accumulators and update
    accs = AccumAmDiagGmm()
    am2 = am.copy()
    accs.init(am2, flags=GMM_ALL)
    accs.add_dense(
        np.asarray(res.occ), np.asarray(res.mean_acc), np.asarray(res.var_acc),
        float(res.tot_log_like), float(res.tot_frames),
    )
    opts = MleDiagGmmOptions(remove_low_count_gaussians=False)
    mle_am_diag_gmm_update(opts, accs, 0b111, am2)

    new_miv = np.asarray(res.new_means_invvars)
    new_iv = np.asarray(res.new_inv_vars)
    for p in range(am2.num_pdfs):
        g = am2.get_pdf(p)
        for k in range(g.num_gauss):
            occ = accs.get_acc(p).occupancy[k]
            if occ <= 10.0:
                continue  # device keeps old params below the threshold
            np.testing.assert_allclose(
                new_iv[p, k, : g.dim], g.inv_vars[k], rtol=2e-3,
                err_msg=f"pdf {p} comp {k}",
            )
            np.testing.assert_allclose(
                new_miv[p, k, : g.dim], g.means_invvars[k], rtol=2e-3, atol=1e-3,
            )


def _host_update_via_dense_stats(am, occ, mean_acc, var_acc, opts):
    """Host MLE update of a copy of ``am`` from padded dense stats."""
    accs = AccumAmDiagGmm()
    am2 = am.copy()
    accs.init(am2, flags=GMM_ALL)
    accs.add_dense(occ, mean_acc, var_acc, 0.0, float(occ.sum()))
    mle_am_diag_gmm_update(opts, accs, 0b111, am2)
    return am2


def _edge_case_problem(dim=4):
    """3 pdfs exercising every MleDiagGmmOptions branch: pdf0 healthy,
    pdf1 has one starved component (removal + weight renorm), pdf2 is
    fully starved (the keep-the-last-one branch)."""
    from khg_tpu.gmm.am_gmm import AmDiagGmm
    from khg_tpu.gmm.diag_gmm import DiagGmm

    rng = np.random.default_rng(11)
    am = AmDiagGmm()
    for k in (2, 3, 2):
        g = DiagGmm(k, dim)
        g.set_weights(rng.dirichlet(np.ones(k)).astype(np.float32))
        g.set_invvars_and_means(
            rng.uniform(0.5, 2.0, (k, dim)).astype(np.float32),
            rng.standard_normal((k, dim)).astype(np.float32),
        )
        g.compute_gconsts()
        am.add_pdf(g)
    K = 3
    occ = np.zeros((3, K))
    occ[0, :2] = [50.0, 80.0]
    occ[1, :3] = [40.0, 2.0, 25.0]      # comp 1 starved -> removed
    occ[2, :2] = [1.0, 0.5]             # all starved -> keep the last
    mean_acc = rng.standard_normal((3, K, dim)) * occ[..., None]
    # second moment >= mean^2/occ guaranteeing mostly-positive variances,
    # with a few entries BELOW the floor to exercise flooring
    mu = mean_acc / np.maximum(occ[..., None], 1e-9)
    var = rng.uniform(0.2, 2.0, (3, K, dim))
    var[0, 0, :2] = 1e-5                # floored elements
    var_acc = (var + mu**2) * occ[..., None]
    return am, occ, mean_acc, var_acc


def test_dense_mstep_edge_cases_match_host():
    """Device M-step == host MleDiagGmmUpdate on starved components,
    flooring (scalar and vector), and low-count removal/renorm."""
    from khg_tpu.parallel.mesh import _dense_mstep

    am, occ, mean_acc, var_acc = _edge_case_problem()
    dim = am.dim
    floor_vec = np.full(dim, 0.01, dtype=np.float64)

    for opts in (
        MleDiagGmmOptions(),
        MleDiagGmmOptions(remove_low_count_gaussians=False),
        MleDiagGmmOptions(variance_floor_vector=floor_vec),
        MleDiagGmmOptions(min_gaussian_occupancy=30.0),
    ):
        am_host = _host_update_via_dense_stats(
            am, occ, mean_acc, var_acc, opts
        )
        pm = am.pack(mix_pad_to=3)
        weights = np.zeros(pm.gconsts.shape, dtype=np.float32)
        for p in range(am.num_pdfs):
            weights[p, : am.get_pdf(p).num_gauss] = am.get_pdf(p).weights
        ng, nmiv, niv, nw = _dense_mstep(
            jnp.asarray(occ, jnp.float32),
            jnp.asarray(mean_acc, jnp.float32),
            jnp.asarray(var_acc, jnp.float32),
            jnp.asarray(pm.gconsts), jnp.asarray(pm.means_invvars),
            jnp.asarray(pm.inv_vars), jnp.asarray(weights),
            min_variance=opts.min_variance,
            min_gaussian_occupancy=opts.min_gaussian_occupancy,
            min_gaussian_weight=opts.min_gaussian_weight,
            remove_low_count_gaussians=opts.remove_low_count_gaussians,
            variance_floor_vector=opts.variance_floor_vector,
        )
        nw, niv, nmiv, ng = map(np.asarray, (nw, niv, nmiv, ng))
        for p in range(am.num_pdfs):
            g = am_host.get_pdf(p)
            # surviving device components = weight > 0, in index order
            surv = [k for k in range(3) if nw[p, k] > 0]
            assert len(surv) == g.num_gauss, (p, opts)
            np.testing.assert_allclose(
                nw[p, surv], g.weights, rtol=2e-4, atol=1e-6,
                err_msg=f"pdf {p} weights {opts}",
            )
            np.testing.assert_allclose(
                niv[p, surv, :dim], g.inv_vars, rtol=2e-3,
                err_msg=f"pdf {p} inv_vars {opts}",
            )
            np.testing.assert_allclose(
                nmiv[p, surv, :dim], g.means_invvars, rtol=2e-3, atol=1e-3,
                err_msg=f"pdf {p} means_invvars {opts}",
            )
            np.testing.assert_allclose(
                ng[p, surv], g.gconsts, rtol=1e-4, atol=2e-3,
                err_msg=f"pdf {p} gconsts {opts}",
            )


def test_sharded_em_step_tid_counts_match_host():
    """Device tid scatter-add counts == host accumulate_transition_stats."""
    from khg_tpu.stats.accum import accumulate_transition_stats

    problem = build_sharded_problem()
    lp, tm, am, pm, weights, graphs, feats, lens, id2pdf = problem
    res = run_step(2, problem)
    host = accumulate_transition_stats(
        np.asarray(res.tids), np.asarray(lens), tm.num_transition_ids
    )
    np.testing.assert_allclose(np.asarray(res.tid_counts), host, atol=1e-6)


def test_device_em_improves_loglike():
    """Iterating the fully on-device EM step increases total log-like."""
    problem = build_sharded_problem(num_utts=8, T=60)
    lp, tm, am, pm, weights, graphs, feats, lens, id2pdf = problem
    mesh = make_data_mesh(4, devices=jax.devices("cpu")[:4])
    step = sharded_em_step(mesh, acoustic_scale=0.5)
    model = (
        jnp.asarray(pm.gconsts), jnp.asarray(pm.means_invvars),
        jnp.asarray(pm.inv_vars), jnp.asarray(weights),
    )
    args = (
        jax.tree.map(jnp.asarray, graphs),
        jnp.asarray(feats), jnp.asarray(lens), jnp.asarray(id2pdf),
    )
    lls = []
    for _ in range(5):
        res = step(model, *args)
        lls.append(float(res.tot_log_like))
        model = (
            res.new_gconsts, res.new_means_invvars,
            res.new_inv_vars, res.new_weights,
        )
    assert lls[-1] > lls[0], lls
    # hard-EM with exact Viterbi: monotone within f32 tolerance
    for a, b in zip(lls, lls[1:]):
        assert b > a - 1.0, lls


def test_uniform_dest_pdf_fast_path_invariant():
    """The per-state acoustic fast path must give identical sharded-EM
    results (tids, stats, updated model) to the per-arc path."""
    from khg_tpu.align.packed import uniform_dest_pdf as check_uniform

    problem = build_sharded_problem()
    graphs = problem[5]
    assert check_uniform(graphs) is not None
    a = run_step(2, problem, uniform_dest_pdf=False)
    b = run_step(2, problem, uniform_dest_pdf=True)
    np.testing.assert_array_equal(np.asarray(a.tids), np.asarray(b.tids))
    for fa, fb in zip(a, b):
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), rtol=0, atol=0)


def test_sharded_banded_kernel_matches_xla():
    """The banded Pallas kernel drops into the sharded EM step per shard
    (interpret mode on the CPU mesh): same stats, costs, and model."""
    from khg_tpu.align.banded import band_renumber, pack_banded
    from khg_tpu.align.packed import uniform_dest_pdf

    problem = build_sharded_problem()
    lp, tm, am, pm, weights, graphs, feats, lens, id2pdf = problem
    ren, _ = band_renumber(graphs)
    banded, offsets = pack_banded(ren, uniform_dest_pdf(ren))

    a = run_step(2, problem, uniform_dest_pdf=True)

    mesh = make_data_mesh(2, devices=jax.devices("cpu")[:2])
    step = sharded_em_step(
        mesh, acoustic_scale=0.5,
        banded_offsets=offsets, banded_interpret=True,
    )
    b = step(
        (jnp.asarray(pm.gconsts), jnp.asarray(pm.means_invvars),
         jnp.asarray(pm.inv_vars), jnp.asarray(weights)),
        jax.tree.map(jnp.asarray, banded),
        jnp.asarray(feats), jnp.asarray(lens), jnp.asarray(id2pdf),
    )
    np.testing.assert_allclose(
        np.asarray(b.total_cost), np.asarray(a.total_cost), rtol=0, atol=0
    )
    np.testing.assert_array_equal(np.asarray(b.tids), np.asarray(a.tids))
    np.testing.assert_allclose(np.asarray(b.occ), np.asarray(a.occ))
    np.testing.assert_allclose(
        np.asarray(b.new_inv_vars), np.asarray(a.new_inv_vars)
    )


def run_fb_step(n_devices, problem, acoustic_scale=0.5, **kw):
    from khg_tpu.parallel.mesh import sharded_fb_em_step

    lp, tm, am, pm, weights, graphs, feats, lens, id2pdf = problem
    mesh = make_data_mesh(n_devices, devices=jax.devices("cpu")[:n_devices])
    step = sharded_fb_em_step(
        mesh, tm.num_transition_ids, acoustic_scale=acoustic_scale, **kw
    )
    g = kw.get("banded_graphs", graphs)
    return step(
        (jnp.asarray(pm.gconsts), jnp.asarray(pm.means_invvars),
         jnp.asarray(pm.inv_vars), jnp.asarray(weights)),
        jax.tree.map(jnp.asarray, g),
        jnp.asarray(feats), jnp.asarray(lens),
    )


def test_sharded_fb_sharding_invariance():
    """Soft (Baum-Welch) sharded EM: psum of shard stats == 1-device run."""
    problem = build_sharded_problem()
    results = [
        run_fb_step(n, problem, uniform_dest_pdf=True) for n in (1, 2, 4)
    ]
    for r in results[1:]:
        np.testing.assert_allclose(
            np.asarray(r.occ), np.asarray(results[0].occ),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(r.tid_counts), np.asarray(results[0].tid_counts),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(r.log_z), np.asarray(results[0].log_z),
            rtol=1e-5, atol=1e-5,
        )


def test_sharded_fb_banded_kernel_matches_xla():
    """The banded Pallas FB kernel drops into the sharded soft EM step
    per shard (interpret mode on the CPU mesh)."""
    from khg_tpu.align.banded import band_renumber, pack_banded
    from khg_tpu.align.packed import uniform_dest_pdf
    from khg_tpu.parallel.mesh import sharded_fb_em_step

    problem = build_sharded_problem()
    lp, tm, am, pm, weights, graphs, feats, lens, id2pdf = problem
    ren, _ = band_renumber(graphs)
    banded, offsets = pack_banded(
        ren, uniform_dest_pdf(ren), reject_parallel=True
    )

    a = run_fb_step(2, problem, uniform_dest_pdf=True)

    mesh = make_data_mesh(2, devices=jax.devices("cpu")[:2])
    step = sharded_fb_em_step(
        mesh, tm.num_transition_ids, acoustic_scale=0.5,
        banded_offsets=offsets, banded_interpret=True,
    )
    b = step(
        (jnp.asarray(pm.gconsts), jnp.asarray(pm.means_invvars),
         jnp.asarray(pm.inv_vars), jnp.asarray(weights)),
        jax.tree.map(jnp.asarray, banded),
        jnp.asarray(feats), jnp.asarray(lens),
    )
    np.testing.assert_allclose(
        np.asarray(b.log_z), np.asarray(a.log_z), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(b.occ), np.asarray(a.occ), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(b.tid_counts), np.asarray(a.tid_counts),
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(b.new_inv_vars), np.asarray(a.new_inv_vars),
        rtol=1e-4, atol=1e-4,
    )


def test_sharded_per_state_wide_mode():
    """per_state=True (the wide-model sharded mode: per-state scoring +
    sac-mode banded Viterbi + local-state stats fold, all per shard):
    identical results on any mesh size, and agreement with the full-P
    banded path up to f32 scoring rounding (tie-free on this trained
    problem)."""
    from khg_tpu.align.banded import band_renumber, pack_banded
    from khg_tpu.align.packed import uniform_dest_pdf

    problem = build_sharded_problem()
    lp, tm, am, pm, weights, graphs, feats, lens, id2pdf = problem
    ren, _ = band_renumber(graphs)
    banded, offsets = pack_banded(ren, uniform_dest_pdf(ren))

    model = (
        jnp.asarray(pm.gconsts), jnp.asarray(pm.means_invvars),
        jnp.asarray(pm.inv_vars), jnp.asarray(weights),
    )
    args = (
        jax.tree.map(jnp.asarray, banded),
        jnp.asarray(feats), jnp.asarray(lens), jnp.asarray(id2pdf),
    )

    def run(n):
        mesh = make_data_mesh(n, devices=jax.devices("cpu")[:n])
        step = sharded_em_step(
            mesh, acoustic_scale=0.5,
            banded_offsets=offsets, banded_interpret=True, per_state=True,
        )
        return step(model, *args)

    a, b = run(2), run(4)
    # mesh-size invariance: alignments bitwise; stats to f32 grouping
    # (the local fold's scatter GEMM contracts across the per-shard
    # batch, so summation grouping differs between mesh sizes)
    np.testing.assert_array_equal(np.asarray(a.tids), np.asarray(b.tids))
    for fa, fb in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(fa), np.asarray(fb), rtol=1e-5, atol=1e-5
        )

    # vs the full-P banded path: same alignments (trained model, no
    # score ties), stats equal to f32 GEMM rounding
    mesh = make_data_mesh(2, devices=jax.devices("cpu")[:2])
    full = sharded_em_step(
        mesh, acoustic_scale=0.5,
        banded_offsets=offsets, banded_interpret=True,
    )(model, *args)
    np.testing.assert_array_equal(np.asarray(a.tids), np.asarray(full.tids))
    np.testing.assert_allclose(
        np.asarray(a.occ), np.asarray(full.occ), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(a.new_inv_vars), np.asarray(full.new_inv_vars),
        rtol=2e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        float(a.tot_log_like), float(full.tot_log_like), rtol=1e-5
    )


def _split_batch(graphs, feats, lens, halves=2):
    """Slice a batched problem into ``halves`` equal sub-batches."""
    B = feats.shape[0]
    assert B % halves == 0
    n = B // halves
    out = []
    for h in range(halves):
        sl = slice(h * n, (h + 1) * n)
        out.append((
            jax.tree.map(lambda a: jnp.asarray(a[sl]), graphs),
            jnp.asarray(feats[sl]), jnp.asarray(lens[sl]),
        ))
    return out


def test_sharded_resident_em_matches_per_batch():
    """Device-resident corpus pass (per-shard Kahan fold across batches,
    ONE psum + ONE dense M-step) == host-accumulated per-batch psum
    stats + one M-step on the sum."""
    from khg_tpu.parallel.mesh import (
        _dense_mstep,
        sharded_resident_em,
        unpack_resident_packet,
    )

    problem = build_sharded_problem(num_utts=16, seed=3)
    lp, tm, am, pm, weights, graphs, feats, lens, id2pdf = problem
    model = (
        jnp.asarray(pm.gconsts), jnp.asarray(pm.means_invvars),
        jnp.asarray(pm.inv_vars), jnp.asarray(weights),
    )
    P_, K = pm.gconsts.shape
    D = pm.means_invvars.shape[-1]
    num_tids = int(id2pdf.shape[0]) - 1
    batches = _split_batch(graphs, feats, lens, halves=2)

    mesh = make_data_mesh(2, devices=jax.devices("cpu")[:2])
    r = sharded_resident_em(
        mesh, P_, K, D, num_tids, acoustic_scale=0.5
    )
    carry, comp = r.make_carry()
    for g, f, ln in batches:
        carry, comp = r.fold(model, carry, comp, g, f, ln,
                             jnp.asarray(id2pdf))
    new_model, packet = r.finish(model, carry, comp)
    (tot_ll, tot_frames, counts, like_sum, num_done, num_error,
     frame_count) = unpack_resident_packet(np.asarray(packet), num_tids)

    # host-driven reference: per-batch psummed stats summed on the host,
    # one dense M-step on the total
    step = sharded_em_step(mesh, acoustic_scale=0.5)
    res = [step(model, g, f, ln, jnp.asarray(id2pdf))
           for g, f, ln in batches]
    occ = sum(np.asarray(x.occ, np.float64) for x in res)
    mean_acc = sum(np.asarray(x.mean_acc, np.float64) for x in res)
    var_acc = sum(np.asarray(x.var_acc, np.float64) for x in res)
    ref_counts = sum(np.asarray(x.tid_counts, np.float64) for x in res)
    ref_ll = sum(float(np.asarray(x.tot_log_like)) for x in res)
    ref_frames = sum(float(np.asarray(x.tot_frames)) for x in res)
    ref_model = jax.jit(_dense_mstep)(
        jnp.asarray(occ, jnp.float32), jnp.asarray(mean_acc, jnp.float32),
        jnp.asarray(var_acc, jnp.float32), *model,
    )

    np.testing.assert_allclose(counts, ref_counts, atol=1e-3)
    assert math.isclose(tot_ll, ref_ll, rel_tol=1e-5)
    assert tot_frames == ref_frames == lens.sum()
    assert num_done == 16 and num_error == 0 and frame_count == lens.sum()
    for got, ref in zip(new_model, ref_model):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


def test_sharded_resident_em_mesh_invariance():
    """The resident pass gives the same model and counts on any mesh
    size, including the wide-model (per-state banded) mode."""
    from khg_tpu.align.banded import band_renumber, pack_banded
    from khg_tpu.align.packed import uniform_dest_pdf
    from khg_tpu.parallel.mesh import sharded_resident_em

    problem = build_sharded_problem(num_utts=8, seed=5)
    lp, tm, am, pm, weights, graphs, feats, lens, id2pdf = problem
    model = (
        jnp.asarray(pm.gconsts), jnp.asarray(pm.means_invvars),
        jnp.asarray(pm.inv_vars), jnp.asarray(weights),
    )
    P_, K = pm.gconsts.shape
    D = pm.means_invvars.shape[-1]
    num_tids = int(id2pdf.shape[0]) - 1
    ren, _ = band_renumber(graphs)
    banded, offsets = pack_banded(ren, uniform_dest_pdf(ren))

    def run(n, wide):
        mesh = make_data_mesh(n, devices=jax.devices("cpu")[:n])
        kw = dict(banded_offsets=offsets, banded_interpret=True,
                  per_state=True) if wide else {}
        r = sharded_resident_em(
            mesh, P_, K, D, num_tids, acoustic_scale=0.5, **kw
        )
        g = jax.tree.map(jnp.asarray, banded if wide else graphs)
        carry, comp = r.make_carry()
        carry, comp = r.fold(model, carry, comp, g, jnp.asarray(feats),
                             jnp.asarray(lens), jnp.asarray(id2pdf))
        new_model, packet = r.finish(model, carry, comp)
        return new_model, np.asarray(packet)

    for wide in (False, True):
        (m2, p2), (m4, p4) = run(2, wide), run(4, wide)
        np.testing.assert_allclose(p2, p4, rtol=1e-5, atol=1e-5)
        for a, b in zip(m2, m4):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )


def test_sharded_resident_em_loop_matches_host_updates():
    """Fully-resident multi-pass EM over the mesh (device transition
    update + device cost refresh inside finish) == per-pass sharded
    resident EM with HOST transition update + HOST cost refresh; and
    mesh-size invariant."""
    import copy

    from khg_tpu.model.transition_device import build_transition_struct
    from khg_tpu.model.transition_model import MleTransitionUpdateConfig
    from khg_tpu.parallel.mesh import (
        sharded_resident_em,
        sharded_resident_em_loop,
        unpack_resident_packet,
    )

    lp, topo, tree, tm0, gc = build_yesno_like()
    rng = np.random.default_rng(9)
    dim = 6
    am = random_am(tree.num_pdfs, dim, rng, max_mix=2)
    id2pdf = tm0.id2pdf_array()
    base_packed, prob_packed = [], []
    for i in range(8):
        words = [lp.word2id["YES" if (i + j) % 2 else "NO"]
                 for j in range(2 + i % 2)]
        g = gc.compile_graph_from_text(words).copy()
        base_packed.append(pack_graph(g.copy(), id2pdf))
        add_transition_probs(tm0, g, 1.0, 0.1)
        prob_packed.append(pack_graph(g, id2pdf))
    base_graphs = pack_graph_batch(base_packed, states_pad_to=8,
                                   indeg_pad_to=2)
    feats = rng.standard_normal((8, 24, dim)).astype(np.float32)
    lens = np.full(8, 24, dtype=np.int32)
    pm = am.pack(mix_pad_to=2)
    weights = np.zeros(pm.gconsts.shape, dtype=np.float32)
    for p in range(am.num_pdfs):
        k = am.get_pdf(p).num_gauss
        weights[p, :k] = am.get_pdf(p).weights
    P_, K = pm.gconsts.shape
    num_tids = int(id2pdf.shape[0]) - 1
    tcfg = MleTransitionUpdateConfig()
    passes = 3

    def model0():
        return (jnp.asarray(pm.gconsts), jnp.asarray(pm.means_invvars),
                jnp.asarray(pm.inv_vars), jnp.asarray(weights))

    def run_loop(n_dev):
        tm = copy.deepcopy(tm0)
        struct = build_transition_struct(tm)
        mesh = make_data_mesh(n_dev, devices=jax.devices("cpu")[:n_dev])
        loop = sharded_resident_em_loop(
            mesh, P_, K, dim, num_tids, struct, acoustic_scale=0.5,
            transition_scale=1.0, self_loop_scale=0.1,
        )
        model = model0()
        logp = jnp.asarray(np.asarray(tm.log_probs, np.float32))
        delta = loop.delta(logp)
        rows = []
        bg = jax.tree.map(jnp.asarray, base_graphs)
        for _ in range(passes):
            carry, comp = loop.make_carry()
            carry, comp = loop.fold(
                model, delta, carry, comp, bg, jnp.asarray(feats),
                jnp.asarray(lens), jnp.asarray(id2pdf),
            )
            model, logp, delta, packet = loop.finish(
                model, carry, comp, logp
            )
            rows.append(np.asarray(packet, np.float64))
        return model, np.asarray(logp), rows

    # reference: per-pass sharded resident EM on HOST-refreshed costs +
    # host transition update
    tm_h = copy.deepcopy(tm0)
    from khg_tpu.recipes.pipeline import EStepPipeline

    pipe = EStepPipeline(tm_h, acoustic_scale=0.5, transition_scale=1.0,
                         self_loop_scale=0.1)
    mesh = make_data_mesh(2, devices=jax.devices("cpu")[:2])
    r = sharded_resident_em(mesh, P_, K, dim, num_tids,
                            acoustic_scale=0.5)
    model_h = model0()
    rows_h = []
    for _ in range(passes):
        d = pipe.transition_cost_deltas()
        g_ref = base_graphs._replace(
            in_cost=(base_graphs.in_cost + d[base_graphs.in_tid]
                     ).astype(np.float32),
            out_cost=(base_graphs.out_cost + d[base_graphs.out_tid]
                      ).astype(np.float32),
        )
        carry, comp = r.make_carry()
        carry, comp = r.fold(model_h, carry, comp,
                             jax.tree.map(jnp.asarray, g_ref),
                             jnp.asarray(feats), jnp.asarray(lens),
                             jnp.asarray(id2pdf))
        model_h, packet = r.finish(model_h, carry, comp)
        pk = np.asarray(packet, np.float64)
        rows_h.append(pk)
        counts = unpack_resident_packet(pk, num_tids)[2]
        tm_h.mle_update(counts, tcfg)

    for n_dev in (1, 2):
        model_d, logp_d, rows_d = run_loop(n_dev)
        for pr_d, pr_h in zip(rows_d, rows_h):
            np.testing.assert_allclose(pr_d[0], pr_h[0], rtol=2e-5)  # ll
            np.testing.assert_allclose(
                pr_d[2: 2 + num_tids + 1], pr_h[2: 2 + num_tids + 1],
                atol=1e-3,
            )
        np.testing.assert_allclose(
            logp_d[1:], np.asarray(tm_h.log_probs[1:], np.float64),
            rtol=0, atol=1e-5,
        )
        for got, ref in zip(model_d, model_h):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-4, atol=2e-4)
