"""Banded (offset-plane) graph packing: renumbering preserves the DP,
the banded host reference matches the independent per-arc host DP, and
the Pallas banded kernel (interpret mode) matches both."""

import numpy as np

from khg_tpu.align.banded import (
    band_renumber,
    pack_banded,
    viterbi_banded_host,
)
from khg_tpu.align.packed import pack_graph, pack_graph_batch, uniform_dest_pdf
from khg_tpu.align.viterbi import viterbi_align_batch
from khg_tpu.gmm.likelihoods import loglikes_np

from tests.test_align import aligned_graph, host_viterbi, setup  # noqa: F401


def _problem(setup_tuple, lens, words, seed_feats=True):
    lp, topo, tree, tm, gc, am, rng = setup_tuple
    id2pdf = tm.id2pdf_array()
    graphs = [aligned_graph(gc, tm, w) for w in words]
    packed = [pack_graph(g, id2pdf) for g in graphs]
    Tmax = max(lens)
    feats = np.zeros((len(lens), Tmax, 6), dtype=np.float32)
    for i, t in enumerate(lens):
        feats[i, :t] = rng.standard_normal((t, 6)).astype(np.float32)
    ll = loglikes_np(am.pack(), feats)
    arrays = pack_graph_batch(packed, states_pad_to=8, indeg_pad_to=2)
    return graphs, arrays, np.asarray(ll), np.array(lens, np.int32), id2pdf


def test_band_renumber_preserves_viterbi(setup):  # noqa: F811
    lp = setup[0]
    words = [
        [lp.word2id["YES"], lp.word2id["NO"]],
        [lp.word2id["NO"]],
    ]
    graphs, arrays, ll, nf, id2pdf = _problem(setup, [22, 13], words)
    ren, perm = band_renumber(arrays)
    res0 = viterbi_align_batch(arrays, ll, nf, id2pdf, acoustic_scale=0.5)
    res1 = viterbi_align_batch(ren, ll, nf, id2pdf, acoustic_scale=0.5)
    # state ids are internal: tids and costs must be unchanged
    np.testing.assert_array_equal(np.asarray(res1.tids), np.asarray(res0.tids))
    np.testing.assert_allclose(
        np.asarray(res1.total_cost), np.asarray(res0.total_cost), rtol=1e-6
    )


def test_banded_host_matches_per_arc_host(setup):  # noqa: F811
    lp = setup[0]
    words = [
        [lp.word2id["YES"]],
        [lp.word2id["NO"], lp.word2id["YES"], lp.word2id["NO"]],
    ]
    lens = [15, 40]
    graphs, arrays, ll, nf, id2pdf = _problem(setup, lens, words)
    ren, _ = band_renumber(arrays)
    sp = uniform_dest_pdf(ren)
    assert sp is not None
    out = pack_banded(ren, sp)
    assert out is not None, "band menu must cover small training graphs"
    banded, offsets = out

    tids, costs = viterbi_banded_host(banded, offsets, ll, nf, 0.5)
    for i, g in enumerate(graphs):
        host = host_viterbi(g, ll[i, : lens[i]], id2pdf, acoustic_scale=0.5)
        assert host is not None
        host_tids, host_cost = host
        assert tids[i, : lens[i]].tolist() == host_tids, i
        np.testing.assert_allclose(costs[i], host_cost, rtol=1e-4)


def test_pallas_banded_kernel_interpret(setup):  # noqa: F811
    from khg_tpu.align.pallas_banded import viterbi_align_banded

    lp = setup[0]
    words = [
        [lp.word2id["YES"]],
        [lp.word2id["NO"], lp.word2id["NO"]],
        [lp.word2id["YES"], lp.word2id["NO"]],
    ]
    lens = [12, 19, 30]
    graphs, arrays, ll, nf, id2pdf = _problem(setup, lens, words)
    ren, _ = band_renumber(arrays)
    sp = uniform_dest_pdf(ren)
    banded, offsets = pack_banded(ren, sp)

    res = viterbi_align_banded(
        banded, offsets, ll, nf, id2pdf, acoustic_scale=0.5,
        block_b=2, time_chunk=16, lane=8, interpret=True,
    )
    assert not np.asarray(res.failed).any()

    # vs independent banded host DP: exact
    h_tids, h_costs = viterbi_banded_host(banded, offsets, ll, nf, 0.5)
    np.testing.assert_array_equal(np.asarray(res.tids), h_tids)
    np.testing.assert_allclose(
        np.asarray(res.total_cost), h_costs, rtol=0, atol=0
    )

    # vs the per-arc host DP and XLA path: same tids/costs
    res_x = viterbi_align_batch(arrays, ll, nf, id2pdf, acoustic_scale=0.5)
    np.testing.assert_allclose(
        np.asarray(res.total_cost), np.asarray(res_x.total_cost), rtol=1e-6
    )
    for i, g in enumerate(graphs):
        host = host_viterbi(g, ll[i, : lens[i]], id2pdf, acoustic_scale=0.5)
        assert np.asarray(res.tids)[i, : lens[i]].tolist() == host[0], i


def test_pallas_banded_infeasible(setup):  # noqa: F811
    from khg_tpu.align.pallas_banded import viterbi_align_banded

    lp = setup[0]
    words = [[lp.word2id["YES"], lp.word2id["NO"]]]
    graphs, arrays, ll, nf, id2pdf = _problem(setup, [3], words)
    ren, _ = band_renumber(arrays)
    banded, offsets = pack_banded(ren, uniform_dest_pdf(ren))
    res = viterbi_align_banded(
        banded, offsets, ll, nf, id2pdf, acoustic_scale=0.5,
        block_b=1, time_chunk=8, lane=8, interpret=True,
    )
    assert bool(np.asarray(res.failed)[0])


def test_pipeline_banded_backend_matches_xla():
    """EStepPipeline(align_backend='banded') produces the same likelihood,
    alignments, and stats as the XLA path (interpret-mode kernel on CPU)."""
    from khg_tpu.est.flags import GMM_ALL
    from khg_tpu.recipes.pipeline import EStepPipeline
    from khg_tpu.recipes.yesno import make_synthetic_corpus, train_yesno
    from khg_tpu.stats.accum import AccumAmDiagGmm

    rng = np.random.default_rng(5)
    lp, corpus = make_synthetic_corpus(num_utts=4, dim=8, rng=rng)
    result = train_yesno(
        lp, corpus, num_iters=3, total_gauss=20, max_iter_inc=2,
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
        res = pipeline.align_and_accumulate(am, packed, corpus.feats, accs)
        outs[backend] = (res, accs)

    rx, ax = outs["xla"]
    rb, ab = outs["banded"]
    assert rx.num_done == rb.num_done and rx.num_error == rb.num_error
    np.testing.assert_allclose(rb.tot_like, rx.tot_like, rtol=1e-5)
    assert rx.alignments == rb.alignments  # no ties in random-weight models
    for p in range(ax.num_accs):
        np.testing.assert_allclose(
            ab.get_acc(p).occupancy, ax.get_acc(p).occupancy, rtol=1e-6
        )


def test_banded_triphone_graphs():
    """Triphone (context-dependent) training graphs also fit a band and
    the kernel matches the XLA path there (interpret mode)."""
    from khg_tpu.align.packed import pack_graph, pack_graph_batch
    from khg_tpu.align.pallas_banded import viterbi_align_banded
    from khg_tpu.graph.h_builder import add_transition_probs
    from tests.test_align import random_am
    from tests.test_triphone import build_compiler, build_triphone_system

    topo, tree, tm = build_triphone_system()
    lp, gc = build_compiler(tm, tree)
    rng = np.random.default_rng(7)
    am = random_am(tree.num_pdfs, 6, rng)
    id2pdf = tm.id2pdf_array()

    words = [[lp.word2id["A"]], [lp.word2id["C"], lp.word2id["A"]]]
    lens = [10, 16]
    packed = []
    for w in words:
        g = gc.compile_graph_from_text(w).copy()
        add_transition_probs(tm, g, 1.0, 0.1)
        packed.append(pack_graph(g, id2pdf))
    arrays = pack_graph_batch(packed, states_pad_to=8, indeg_pad_to=2)

    feats = np.zeros((2, max(lens), 6), dtype=np.float32)
    for i, t in enumerate(lens):
        feats[i, :t] = rng.standard_normal((t, 6)).astype(np.float32)
    ll = loglikes_np(am.pack(), feats)
    nf = np.array(lens, np.int32)

    ren, _ = band_renumber(arrays)
    sp = uniform_dest_pdf(ren)
    assert sp is not None, "triphone H graphs keep dest-uniform pdfs"
    out = pack_banded(ren, sp)
    assert out is not None, "triphone graphs must fit a band menu"
    banded, offsets = out

    res_b = viterbi_align_banded(
        banded, offsets, ll, nf, id2pdf, acoustic_scale=0.5,
        block_b=2, time_chunk=8, lane=8, interpret=True,
    )
    res_x = viterbi_align_batch(arrays, ll, nf, id2pdf, acoustic_scale=0.5)
    np.testing.assert_array_equal(
        np.asarray(res_b.total_cost), np.asarray(res_x.total_cost)
    )
    np.testing.assert_array_equal(np.asarray(res_b.tids), np.asarray(res_x.tids))


def _parallel_arc_batch():
    """A 3-state graph with TWO parallel arcs 0->1 (different tids): legal
    for Viterbi min-packing, illegal for the banded FB (sum semiring)."""
    from khg_tpu.align.packed import BIG, BatchedGraphs

    S, M = 3, 3
    in_src = np.zeros((1, S, M), np.int32)
    in_tid = np.zeros((1, S, M), np.int32)
    in_pdf = np.zeros((1, S, M), np.int32)
    in_cost = np.full((1, S, M), BIG, np.float32)
    # arcs into state 1: 0->1 tid=1 cost 0.5 ; 0->1 tid=2 cost 1.2 (parallel)
    in_src[0, 1, :2] = [0, 0]
    in_tid[0, 1, :2] = [1, 2]
    in_cost[0, 1, :2] = [0.5, 1.2]
    # arc into state 2 (final): 1->2 tid=3
    in_src[0, 2, 0] = 1
    in_tid[0, 2, 0] = 3
    in_cost[0, 2, 0] = 0.3
    out_dst = np.zeros((1, S, M), np.int32)
    out_tid = np.zeros((1, S, M), np.int32)
    out_pdf = np.zeros((1, S, M), np.int32)
    out_cost = np.full((1, S, M), BIG, np.float32)
    out_dst[0, 0, :2] = [1, 1]
    out_tid[0, 0, :2] = [1, 2]
    out_cost[0, 0, :2] = [0.5, 1.2]
    out_dst[0, 1, 0] = 2
    out_tid[0, 1, 0] = 3
    out_cost[0, 1, 0] = 0.3
    init = np.full((1, S), BIG, np.float32)
    init[0, 0] = 0.0
    final = np.full((1, S), BIG, np.float32)
    final[0, 2] = 0.0
    return BatchedGraphs(
        in_src, in_tid, in_pdf, in_cost,
        out_dst, out_tid, out_pdf, out_cost, init, final,
    )


def test_pack_banded_rejects_parallel_arcs_for_fb():
    """FB (sum semiring) needs every parallel arc; the banded planes can
    hold only one per (src, dst) cell, so reject_parallel=True must bail
    out while the default (Viterbi) packing keeps the min-cost arc."""
    arrays = _parallel_arc_batch()
    sp = uniform_dest_pdf(arrays)
    assert sp is not None

    assert pack_banded(arrays, sp, reject_parallel=True) is None

    out = pack_banded(arrays, sp)  # Viterbi view: min-cost arc survives
    assert out is not None
    banded, offsets = out
    d1 = offsets.index(1)
    assert float(banded.plane_cost[0, d1, 1]) == np.float32(0.5)
    assert int(banded.plane_tid[0, d1, 1]) == 1


def test_banded_forward_backward_interpret(setup):  # noqa: F811
    """Banded fused Baum-Welch (interpret mode) vs the XLA FB path."""
    from khg_tpu.align.forward_backward import forward_backward_batch
    from khg_tpu.align.pallas_banded_fb import forward_backward_banded

    lp = setup[0]
    tm = setup[3]
    words = [
        [lp.word2id["YES"]],
        [lp.word2id["NO"], lp.word2id["YES"]],
        [lp.word2id["NO"]],
    ]
    lens = [14, 26, 9]
    graphs, arrays, ll, nf, id2pdf = _problem(setup, lens, words)
    ren, _ = band_renumber(arrays)
    sp = uniform_dest_pdf(ren)
    banded, offsets = pack_banded(ren, sp, reject_parallel=True)
    num_tids = tm.num_transition_ids

    # XLA reference on the ORIGINAL arrays: gamma/log_z/tid_counts are
    # invariant to state renumbering (band_renumber leaves the outgoing
    # tables untouched, so the XLA FB must see the original numbering)
    a = forward_backward_batch(
        arrays, ll, nf, num_tids, acoustic_scale=0.5,
        state_pdf=uniform_dest_pdf(arrays),
    )
    b = forward_backward_banded(
        banded, offsets, ll, nf, num_tids, acoustic_scale=0.5,
        block_b=2, time_chunk=8, lane=8, interpret=True,
    )

    np.testing.assert_allclose(
        np.asarray(b.log_z), np.asarray(a.log_z), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(b.gamma), np.asarray(a.gamma), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(b.tid_counts), np.asarray(a.tid_counts), atol=1e-3
    )
    np.testing.assert_array_equal(np.asarray(b.failed), np.asarray(a.failed))


def test_pallas_banded_external_ac_matches(setup):  # noqa: F811
    """external_ac mode (acoustic select outside the kernel, the wide-
    model path) produces identical alignments and costs to the in-kernel
    one-hot mode — both exact 0/1 GEMM selects, different placement."""
    from khg_tpu.align.pallas_banded import viterbi_align_banded

    lp = setup[0]
    words = [
        [lp.word2id["YES"]],
        [lp.word2id["NO"], lp.word2id["YES"], lp.word2id["NO"]],
    ]
    lens = [14, 33]
    graphs, arrays, ll, nf, id2pdf = _problem(setup, lens, words)
    ren, _ = band_renumber(arrays)
    sp = uniform_dest_pdf(ren)
    out = pack_banded(ren, sp)
    assert out is not None
    banded, offsets = out
    kw = dict(acoustic_scale=0.5, block_b=2, time_chunk=16, interpret=True)
    a = viterbi_align_banded(
        banded, offsets, ll, nf, id2pdf, external_ac=False, **kw
    )
    b = viterbi_align_banded(
        banded, offsets, ll, nf, id2pdf, external_ac=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(a.tids), np.asarray(b.tids))
    np.testing.assert_allclose(
        np.asarray(a.total_cost), np.asarray(b.total_cost), rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(a.failed), np.asarray(b.failed))


def test_per_state_scoring_sac_mode(setup):  # noqa: F811
    """loglikes_per_state + sac-mode banded Viterbi: same alignments as
    full-P scoring — the O(S) triphone scoring path never computes the
    P-S pdfs outside the graph."""
    from khg_tpu.align.pallas_banded import viterbi_align_banded
    from khg_tpu.gmm.likelihoods import loglikes_per_state

    lp, topo, tree, tm, gc, am, rng = setup
    id2pdf = tm.id2pdf_array()
    words = [
        [lp.word2id["YES"], lp.word2id["NO"]],
        [lp.word2id["NO"]],
    ]
    lens = [22, 11]
    graphs, arrays, ll, nf, id2pdf = _problem(setup, lens, words)
    ren, _ = band_renumber(arrays)
    sp = uniform_dest_pdf(ren)
    out = pack_banded(ren, sp)
    assert out is not None
    banded, offsets = out

    pm = am.pack()
    feats = None  # rebuilt below from the same rng draw is impossible;
    # instead derive sac by exact select from ll (the identity
    # loglikes_per_state must satisfy) and ALSO check the kernel output
    sac_select = np.take_along_axis(
        np.asarray(ll), np.asarray(banded.state_pdf)[:, None, :], axis=2
    )
    kw = dict(acoustic_scale=0.5, block_b=2, time_chunk=16, interpret=True)
    a = viterbi_align_banded(banded, offsets, ll, nf, id2pdf, **kw)
    b = viterbi_align_banded(
        banded, offsets, None, nf, id2pdf, sac=sac_select, **kw
    )
    np.testing.assert_array_equal(np.asarray(a.tids), np.asarray(b.tids))
    np.testing.assert_allclose(
        np.asarray(a.total_cost), np.asarray(b.total_cost), rtol=1e-6
    )


def test_loglikes_per_state_matches_full(setup):  # noqa: F811
    from khg_tpu.gmm.likelihoods import loglikes, loglikes_per_state

    lp, topo, tree, tm, gc, am, rng = setup
    pm = am.pack()
    B, T, D = 3, 9, 6
    feats = rng.standard_normal((B, T, D)).astype(np.float32)
    S = 7
    state_pdf = rng.integers(0, am.num_pdfs, size=(B, S)).astype(np.int32)
    full = np.asarray(loglikes(pm.gconsts, pm.means_invvars, pm.inv_vars, feats))
    per_state = np.asarray(loglikes_per_state(
        pm.gconsts, pm.means_invvars, pm.inv_vars, state_pdf, feats
    ))
    want = np.take_along_axis(full, state_pdf[:, None, :], axis=2)
    np.testing.assert_allclose(per_state, want, rtol=1e-5, atol=1e-5)


def test_pipeline_per_state_path_matches_xla(setup, monkeypatch):  # noqa: F811
    """Force the wide-model (per-state scoring + sac banded) pipeline
    path at monophone scale and check it aligns identically to the XLA
    backend — the path triphone systems take by default."""
    import khg_tpu.align.pallas_banded as pb
    from khg_tpu.recipes.pipeline import EStepPipeline
    from khg_tpu.stats.accum import AccumAmDiagGmm

    monkeypatch.setattr(pb, "EXTERNAL_AC_PDFS", 1)  # everything is "wide"

    lp, topo, tree, tm, gc, am, rng = setup
    words = [
        [lp.word2id["YES"], lp.word2id["NO"]],
        [lp.word2id["NO"]],
        [lp.word2id["YES"]],
    ]
    feats = [rng.standard_normal((t, 6)).astype(np.float32)
             for t in (25, 14, 18)]
    graphs_fst = [aligned_graph(gc, tm, w) for w in words]

    results = {}
    for backend in ("banded", "xla"):
        pipeline = EStepPipeline(
            tm, acoustic_scale=0.6, align_backend=backend
        )
        packed = pipeline.pack_graphs_base(graphs_fst)
        cur = pipeline.refresh_transition_costs(packed)
        accs = AccumAmDiagGmm()
        accs.init(am, flags=0b1111)
        res = pipeline.align_and_accumulate(am, cur, feats, accs)
        results[backend] = (res, accs)
    a, acc_a = results["banded"]
    b, acc_b = results["xla"]
    assert a.num_done == b.num_done == 3
    assert a.alignments == b.alignments
    assert abs(a.tot_like - b.tot_like) < 1e-3
    for p in range(am.num_pdfs):
        np.testing.assert_allclose(
            acc_a.accs[p].occupancy, acc_b.accs[p].occupancy, atol=1e-3
        )
