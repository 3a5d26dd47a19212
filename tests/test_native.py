"""Equivalence of the native (C++) FST core with the Python reference."""

import math

import numpy as np
import pytest

from khg_tpu.fstlib import native
from khg_tpu.fstlib.fst import (
    Arc,
    VectorFst,
    compose,
    determinize_star,
    make_linear_acceptor,
    minimize_encoded,
    shortest_path,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def random_fst(rng, num_states=12, num_arcs=30, num_labels=5, eps_prob=0.2):
    f = VectorFst()
    for _ in range(num_states):
        f.add_state()
    f.set_start(0)
    for s in rng.choice(num_states, 3, replace=False):
        f.set_final(int(s), float(rng.uniform(0, 2)))
    for _ in range(num_arcs):
        s = int(rng.integers(num_states))
        d = int(rng.integers(num_states))
        # forward arcs only: acyclic, so path counts stay bounded
        if s == d:
            continue
        if d < s:
            s, d = d, s
        il = 0 if rng.random() < eps_prob else int(rng.integers(1, num_labels + 1))
        ol = 0 if rng.random() < eps_prob else int(rng.integers(1, num_labels + 1))
        f.add_arc(s, Arc(il, ol, float(rng.uniform(0, 3)), d))
    return f


def total_mass(g, iters=500):
    import math as m

    n = g.num_states
    if n == 0 or g.start == -1:
        return 0.0
    vals = np.zeros(n)
    fin = np.array(
        [m.exp(-g.final[s]) if g.is_final(s) else 0.0 for s in range(n)]
    )
    for _ in range(iters):
        new = fin.copy()
        for s in range(n):
            new[s] += sum(
                m.exp(-a.weight) * vals[a.nextstate] for a in g.arcs[s]
            )
        if np.max(np.abs(new - vals)) < 1e-13:
            vals = new
            break
        vals = new
    return float(vals[g.start])


def test_native_compose_equiv():
    rng = np.random.default_rng(0)
    for trial in range(5):
        a = random_fst(rng, eps_prob=0.15)
        b = random_fst(rng, eps_prob=0.15)
        py = compose(a, b)
        nat = native.compose(a, b)
        assert (py.start == -1) == (nat.start == -1)
        if py.start == -1:
            continue
        assert math.isclose(
            total_mass(py), total_mass(nat), rel_tol=1e-5
        ), trial
        sp_py = shortest_path(py)
        sp_nat = shortest_path(nat)
        assert (sp_py is None) == (sp_nat is None)
        if sp_py:
            assert math.isclose(sp_py[2], sp_nat[2], rel_tol=1e-5)


def test_native_determinize_equiv():
    rng = np.random.default_rng(1)
    for trial in range(5):
        f = random_fst(rng, eps_prob=0.25)
        from khg_tpu.fstlib.fst import connect

        f = connect(f)
        if f.start == -1:
            continue
        for semiring in ("tropical", "log"):
            py = determinize_star(f, semiring=semiring)
            nat = native.determinize_star(f, semiring=semiring)
            assert math.isclose(
                total_mass(py), total_mass(nat), rel_tol=1e-4
            ), (trial, semiring)
            # (output-emitting chain states legitimately carry eps inputs,
            # in both implementations; equivalence is the real check)


def test_native_minimize_equiv():
    rng = np.random.default_rng(2)
    for trial in range(5):
        f = random_fst(rng, eps_prob=0.1)
        from khg_tpu.fstlib.fst import connect

        f = connect(f)
        if f.start == -1:
            continue
        py = minimize_encoded(f)
        nat = native.minimize_encoded(f)
        assert nat.num_states <= f.num_states
        assert math.isclose(total_mass(py), total_mass(nat), rel_tol=1e-5)
        assert py.num_states == nat.num_states


def test_native_graph_compiler_end_to_end():
    """Graphs compiled with the native core align identically."""
    from khg_tpu.fstlib.fst import equal_align
    from khg_tpu.graph.compiler import TrainingGraphCompiler
    from tests.test_graph_compiler import build_yesno_like

    lp, topo, tree, tm, gc_py = build_yesno_like()
    from khg_tpu.lang.lfst import make_lexicon_fst_with_silence
    from khg_tpu.lang.lexicon import Lexicon, Lexiconp

    lexicon = Lexicon(word2phones={"<SIL>": ["SIL"], "YES": ["Y"], "NO": ["N"]})
    lexiconp = Lexiconp.from_lexicon(lexicon)
    L = make_lexicon_fst_with_silence(lexiconp=lexiconp, sil_prob=0.5, sil_phone="SIL")
    gc_nat = TrainingGraphCompiler(
        tm, tree, L, disambig_syms=gc_py.disambig_syms, use_native=True
    )
    assert gc_nat._native is not None
    word_ids = [lp.word2id["YES"], lp.word2id["NO"], lp.word2id["YES"]]
    g_py = gc_py.compile_graph_from_text(word_ids)
    g_nat = gc_nat.compile_graph_from_text(word_ids)
    # equivalent: same alignment cost for the same tid sequence
    rng = np.random.default_rng(5)
    for T in (9, 25):
        tids, words, cost_nat = equal_align(g_nat, T, rng)
        assert words == word_ids
        comp = compose(make_linear_acceptor(tids), g_py)
        _, _, cost_py = shortest_path(comp)
        assert math.isclose(cost_nat, cost_py, rel_tol=1e-4)
