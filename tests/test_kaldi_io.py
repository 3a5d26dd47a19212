import numpy as np

from khg_tpu.model.kaldi_io import (
    read_am_diag_gmm,
    read_context_dependency,
    read_diag_gmm,
    read_transition_model,
    write_am_diag_gmm,
    write_context_dependency,
    write_diag_gmm,
    write_transition_model,
)
from tests.test_align import random_am
from tests.test_transition_model import build_tm


def test_transition_model_round_trip():
    topo, tree, tm = build_tm()
    text = write_transition_model(tm)
    tm2 = read_transition_model(text)
    assert tm2.tuples == tm.tuples
    assert tm2.num_transition_ids == tm.num_transition_ids
    np.testing.assert_allclose(tm2.log_probs, tm.log_probs, rtol=1e-6)
    np.testing.assert_allclose(
        tm2.non_self_loop_log_probs, tm.non_self_loop_log_probs, rtol=1e-5
    )


def test_context_dependency_round_trip():
    topo, tree, tm = build_tm()
    text = write_context_dependency(tree)
    tree2 = read_context_dependency(text)
    assert tree2.N == tree.N and tree2.P == tree.P
    assert tree2.num_pdfs == tree.num_pdfs
    for phone in topo.phones:
        for pc in range(topo.num_pdf_classes(phone)):
            assert tree2.compute([phone], pc) == tree.compute([phone], pc)


def test_diag_gmm_round_trip():
    rng = np.random.default_rng(0)
    am = random_am(1, 5, rng, max_mix=3)
    g = am.get_pdf(0)
    text = write_diag_gmm(g)
    g2 = read_diag_gmm(text)
    np.testing.assert_allclose(g2.weights, g.weights, rtol=1e-5)
    np.testing.assert_allclose(g2.means_invvars, g.means_invvars, rtol=1e-5)
    np.testing.assert_allclose(g2.inv_vars, g.inv_vars, rtol=1e-5)
    x = rng.standard_normal(5).astype(np.float32)
    assert abs(g2.log_likelihood(x) - g.log_likelihood(x)) < 1e-3


def test_am_round_trip():
    rng = np.random.default_rng(1)
    am = random_am(4, 3, rng, max_mix=2)
    text = write_am_diag_gmm(am)
    am2 = read_am_diag_gmm(text)
    assert am2.num_pdfs == 4 and am2.dim == 3
    for p in range(4):
        np.testing.assert_allclose(
            am2.get_pdf(p).weights, am.get_pdf(p).weights, rtol=1e-5
        )
