"""Fused Pallas Viterbi kernel vs the XLA scan path (interpret mode on
CPU). The two paths order arithmetic identically, so tids and costs must
match exactly."""

import numpy as np

from khg_tpu.align.packed import pack_graph, pack_graph_batch
from khg_tpu.align.pallas_viterbi import (
    viterbi_align_batch_pallas,
    viterbi_vmem_bytes,
)
from khg_tpu.align.viterbi import viterbi_align_batch
from khg_tpu.gmm.likelihoods import loglikes_np

from tests.test_align import aligned_graph, host_viterbi, setup  # noqa: F401


def _batch(setup_tuple, lens, words):
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
    return graphs, arrays, ll, np.array(lens, dtype=np.int32), id2pdf


def test_pallas_matches_xla_and_host(setup):  # noqa: F811
    lp = setup[0]
    words = [
        [lp.word2id["YES"]],
        [lp.word2id["NO"], lp.word2id["NO"]],
        [lp.word2id["YES"], lp.word2id["NO"]],
    ]
    lens = [12, 19, 30]
    graphs, arrays, ll, nf, id2pdf = _batch(setup, lens, words)

    res_x = viterbi_align_batch(arrays, ll, nf, id2pdf, acoustic_scale=0.5)
    res_p = viterbi_align_batch_pallas(
        arrays, ll, nf, id2pdf, acoustic_scale=0.5,
        block_b=2, time_chunk=16, lane=8, interpret=True,
    )

    np.testing.assert_array_equal(np.asarray(res_p.tids), np.asarray(res_x.tids))
    np.testing.assert_array_equal(
        np.asarray(res_p.total_cost), np.asarray(res_x.total_cost)
    )
    np.testing.assert_array_equal(
        np.asarray(res_p.acoustic_cost), np.asarray(res_x.acoustic_cost)
    )
    assert not np.asarray(res_p.failed).any()

    # and both must agree with the independent host DP
    for i, g in enumerate(graphs):
        host = host_viterbi(
            g, np.asarray(ll[i, : lens[i]]), id2pdf, acoustic_scale=0.5
        )
        assert host is not None
        host_tids, host_cost = host
        assert np.asarray(res_p.tids)[i, : lens[i]].tolist() == host_tids
        np.testing.assert_allclose(
            float(np.asarray(res_p.total_cost)[i]), host_cost, rtol=1e-4
        )


def test_pallas_infeasible_marks_failed(setup):  # noqa: F811
    lp = setup[0]
    # two words need more frames than this to traverse the graph
    words = [[lp.word2id["YES"], lp.word2id["NO"]]]
    graphs, arrays, ll, nf, id2pdf = _batch(setup, [3], words)
    res = viterbi_align_batch_pallas(
        arrays, ll, nf, id2pdf, acoustic_scale=0.5,
        block_b=1, time_chunk=8, lane=8, interpret=True,
    )
    assert bool(np.asarray(res.failed)[0])


def test_vmem_estimate_monotone():
    small = viterbi_vmem_bytes(B=8, S0=64, M=4, T=100, P=32)
    big = viterbi_vmem_bytes(B=8, S0=256, M=4, T=100, P=32)
    assert 0 < small < big
