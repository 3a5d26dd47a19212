import math

import numpy as np
import pytest

from khg_tpu.align.packed import BIG, pack_graph, pack_graph_batch
from khg_tpu.align.viterbi import viterbi_align_batch
from khg_tpu.gmm.am_gmm import AmDiagGmm
from khg_tpu.gmm.diag_gmm import DiagGmm
from khg_tpu.gmm.likelihoods import loglikes_np
from khg_tpu.graph.h_builder import add_transition_probs

from tests.test_graph_compiler import build_yesno_like


def random_am(num_pdfs, dim, rng, max_mix=2):
    am = AmDiagGmm()
    for p in range(num_pdfs):
        k = int(rng.integers(1, max_mix + 1))
        g = DiagGmm(k, dim)
        g.set_weights(rng.dirichlet(np.ones(k)).astype(np.float32))
        g.set_invvars_and_means(
            rng.uniform(0.5, 2.0, (k, dim)).astype(np.float32),
            rng.standard_normal((k, dim)).astype(np.float32),
        )
        g.compute_gconsts()
        am.add_pdf(g)
    return am


def host_viterbi(fst, loglikes, id2pdf, acoustic_scale):
    """Independent reference: frame-synchronous DP directly on the FST,
    with per-frame epsilon relaxation.  Returns (tids, total_cost) or None."""
    n = fst.num_states
    INF = math.inf

    def eps_relax(alpha, paths):
        changed = True
        while changed:
            changed = False
            for s in range(n):
                if alpha[s] == INF:
                    continue
                for a in fst.arcs[s]:
                    if a.ilabel == 0:
                        nc = alpha[s] + a.weight
                        if nc < alpha[a.nextstate] - 1e-12:
                            alpha[a.nextstate] = nc
                            paths[a.nextstate] = paths[s]
                            changed = True
        return alpha, paths

    alpha = [INF] * n
    paths = [None] * n
    alpha[fst.start] = 0.0
    paths[fst.start] = ()
    alpha, paths = eps_relax(alpha, paths)
    T = loglikes.shape[0]
    for t in range(T):
        na = [INF] * n
        np_ = [None] * n
        for s in range(n):
            if alpha[s] == INF:
                continue
            for a in fst.arcs[s]:
                if a.ilabel == 0:
                    continue
                c = (
                    alpha[s]
                    + a.weight
                    - acoustic_scale * loglikes[t, id2pdf[a.ilabel]]
                )
                if c < na[a.nextstate] - 1e-12:
                    na[a.nextstate] = c
                    np_[a.nextstate] = paths[s] + (a.ilabel,)
        alpha, paths = eps_relax(na, np_)
    best, best_s = INF, None
    for s in range(n):
        if fst.final[s] != INF and alpha[s] + fst.final[s] < best:
            best = alpha[s] + fst.final[s]
            best_s = s
    if best_s is None:
        return None
    return list(paths[best_s]), best


@pytest.fixture(scope="module")
def setup():
    lp, topo, tree, tm, gc = build_yesno_like()
    rng = np.random.default_rng(11)
    am = random_am(tree.num_pdfs, 6, rng)
    return lp, topo, tree, tm, gc, am, rng


def aligned_graph(gc, tm, word_ids):
    g = gc.compile_graph_from_text(word_ids).copy()
    add_transition_probs(tm, g, transition_scale=1.0, self_loop_scale=0.1)
    return g


def test_device_viterbi_matches_host(setup):
    lp, topo, tree, tm, gc, am, rng = setup
    word_ids = [lp.word2id["YES"], lp.word2id["NO"]]
    g = aligned_graph(gc, tm, word_ids)
    id2pdf = tm.id2pdf_array()
    packed = pack_graph(g, id2pdf)
    T = 25
    feats = rng.standard_normal((T, 6)).astype(np.float32)
    model = am.pack()
    ll = loglikes_np(model, feats[None])  # (1, T, P)

    arrays = pack_graph_batch([packed])
    res = viterbi_align_batch(
        arrays, ll, np.array([T], dtype=np.int32), id2pdf, acoustic_scale=0.5
    )
    tids = np.asarray(res.tids)[0]
    got_cost = float(np.asarray(res.total_cost)[0])
    assert not bool(np.asarray(res.failed)[0])

    host = host_viterbi(g, np.asarray(ll[0]), id2pdf, acoustic_scale=0.5)
    assert host is not None
    host_tids, host_cost = host
    assert math.isclose(got_cost, host_cost, rel_tol=1e-4)
    assert tids.tolist() == host_tids


def test_batch_variable_lengths(setup):
    lp, topo, tree, tm, gc, am, rng = setup
    id2pdf = tm.id2pdf_array()
    words = [
        [lp.word2id["YES"]],
        [lp.word2id["NO"], lp.word2id["NO"]],
        [lp.word2id["YES"], lp.word2id["NO"]],
    ]
    lens = [12, 19, 30]
    graphs = [aligned_graph(gc, tm, w) for w in words]
    packed = [pack_graph(g, id2pdf) for g in graphs]
    Tmax = max(lens)
    feats = np.zeros((3, Tmax, 6), dtype=np.float32)
    all_feats = [rng.standard_normal((t, 6)).astype(np.float32) for t in lens]
    for i, f in enumerate(all_feats):
        feats[i, : lens[i]] = f
    model = am.pack()
    ll = loglikes_np(model, feats)
    arrays = pack_graph_batch(packed, states_pad_to=8, indeg_pad_to=2)
    res = viterbi_align_batch(
        arrays, ll, np.array(lens, dtype=np.int32), id2pdf, acoustic_scale=0.5
    )
    for i in range(3):
        assert not bool(np.asarray(res.failed)[i])
        tids = np.asarray(res.tids)[i, : lens[i]]
        host = host_viterbi(
            graphs[i], np.asarray(ll[i, : lens[i]]), id2pdf, acoustic_scale=0.5
        )
        host_tids, host_cost = host
        assert tids.tolist() == host_tids, i
        assert math.isclose(
            float(np.asarray(res.total_cost)[i]), host_cost, rel_tol=1e-4
        )
        # alignment decodes to the right words: check phone sequence
        from tests.test_graph_compiler import tids_to_phones

        phones = [
            p
            for p in tids_to_phones(tm, tids.tolist())
            if p != lp.get_sil_phone_id()
        ]
        expected = []
        for w in words[i]:
            expected.extend(
                lp.phone2id[p]
                for p in {"YES": ["Y"], "NO": ["N"]}[lp.id2word[w]]
            )
        assert phones == expected


def test_infeasible_length_fails(setup):
    lp, topo, tree, tm, gc, am, rng = setup
    id2pdf = tm.id2pdf_array()
    g = aligned_graph(gc, tm, [lp.word2id["YES"], lp.word2id["NO"]])
    packed = pack_graph(g, id2pdf)
    T = 4  # min length is 6 (two 3-state phones)
    feats = rng.standard_normal((1, T, 6)).astype(np.float32)
    model = am.pack()
    ll = loglikes_np(model, feats)
    arrays = pack_graph_batch([packed])
    res = viterbi_align_batch(
        arrays, ll, np.array([T], dtype=np.int32), id2pdf, acoustic_scale=0.5
    )
    assert bool(np.asarray(res.failed)[0])


def test_acoustic_cost_decomposition(setup):
    lp, topo, tree, tm, gc, am, rng = setup
    id2pdf = tm.id2pdf_array()
    g = aligned_graph(gc, tm, [lp.word2id["NO"]])
    packed = pack_graph(g, id2pdf)
    T = 10
    feats = rng.standard_normal((1, T, 6)).astype(np.float32)
    model = am.pack()
    ll = loglikes_np(model, feats)
    arrays = pack_graph_batch([packed])
    scale = 0.1
    res = viterbi_align_batch(
        arrays, ll, np.array([T], dtype=np.int32), id2pdf, acoustic_scale=scale
    )
    tids = np.asarray(res.tids)[0]
    expected_ac = -scale * sum(
        float(ll[0, t, id2pdf[tids[t]]]) for t in range(T)
    )
    assert math.isclose(
        float(np.asarray(res.acoustic_cost)[0]), expected_ac, rel_tol=1e-4
    )


def test_state_pdf_fast_path_identical(setup):
    """uniform_dest_pdf holds on H-level graphs; the per-state acoustic
    path must reproduce the per-arc path exactly."""
    from khg_tpu.align.packed import uniform_dest_pdf

    lp, topo, tree, tm, gc, am, rng = setup
    id2pdf = tm.id2pdf_array()
    words = [
        [lp.word2id["YES"]],
        [lp.word2id["NO"], lp.word2id["YES"]],
    ]
    lens = [14, 27]
    graphs = [aligned_graph(gc, tm, w) for w in words]
    packed = [pack_graph(g, id2pdf) for g in graphs]
    Tmax = max(lens)
    feats = np.zeros((2, Tmax, 6), dtype=np.float32)
    for i, t in enumerate(lens):
        feats[i, :t] = rng.standard_normal((t, 6)).astype(np.float32)
    ll = loglikes_np(am.pack(), feats)
    arrays = pack_graph_batch(packed, states_pad_to=8, indeg_pad_to=2)

    state_pdf = uniform_dest_pdf(arrays)
    assert state_pdf is not None  # reorder=True H graphs are uniform

    nf = np.array(lens, dtype=np.int32)
    res_slow = viterbi_align_batch(arrays, ll, nf, id2pdf, acoustic_scale=0.5)
    res_fast = viterbi_align_batch(
        arrays, ll, nf, id2pdf, acoustic_scale=0.5, state_pdf=state_pdf
    )
    np.testing.assert_array_equal(
        np.asarray(res_fast.tids), np.asarray(res_slow.tids)
    )
    np.testing.assert_array_equal(
        np.asarray(res_fast.total_cost), np.asarray(res_slow.total_cost)
    )
