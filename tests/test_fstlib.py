import math

import numpy as np
import pytest

from khg_tpu.fstlib.fst import (
    Arc,
    VectorFst,
    compose,
    concat,
    connect,
    determinize_star,
    equal_align,
    make_linear_acceptor,
    minimize_encoded,
    remove_eps_local,
    remove_input_symbols,
    shortest_path,
)
from khg_tpu.lang.lexicon import Lexicon, Lexiconp
from khg_tpu.lang.lfst import make_lexicon_fst_with_silence


def lang_fixture():
    lexicon = Lexicon(
        word2phones={"<SIL>": ["SIL"], "YES": ["Y"], "NO": ["N"]}
    )
    lexiconp = Lexiconp.from_lexicon(lexicon)
    return lexiconp.add_lex_disambig()


def test_symbol_tables_conventions():
    lp = lang_fixture()
    # <eps>=0, SIL=1, then sorted non-sil phones, then #0 #1
    assert lp.phone2id["<eps>"] == 0
    assert lp.phone2id["SIL"] == 1
    assert lp.phone2id["N"] == 2
    assert lp.phone2id["Y"] == 3
    assert lp.phone2id["#0"] == 4
    assert lp.phone2id["#1"] == 5
    assert lp.word2id["<eps>"] == 0
    assert lp.word2id["<SIL>"] == 1
    assert lp.word2id["NO"] == 2
    assert lp.word2id["YES"] == 3
    assert lp.word2id["#0"] == 4
    assert lp.max_disambig == 0  # yesno lexicon is unambiguous


def test_add_lex_disambig_homophones():
    lexicon = Lexicon(word2phones={"A": ["x y"], "B": ["x y"], "C": ["x"]})
    lp = Lexiconp.from_lexicon(lexicon).add_lex_disambig()
    prons = sorted(p for _, _, p in lp)
    # homophones get #1/#2; prefix "x" gets #1
    assert prons == ["x #1", "x y #1", "x y #2"]
    assert lp.max_disambig == 2


def test_linear_acceptor_and_shortest_path():
    fst = make_linear_acceptor([3, 1, 2])
    ils, ols, cost = shortest_path(fst)
    assert ils == [3, 1, 2] and ols == [3, 1, 2] and cost == 0.0


def test_compose_simple_transduction():
    # A: maps 1->10, 2->20 in sequence
    a = VectorFst()
    s0 = a.add_state(); s1 = a.add_state(); s2 = a.add_state()
    a.set_start(s0); a.set_final(s2, 0.5)
    a.add_arc(s0, Arc(1, 10, 0.25, s1))
    a.add_arc(s1, Arc(2, 20, 0.25, s2))
    # B: accepts 10 20 mapping to 100 200
    b = VectorFst()
    t0 = b.add_state(); t1 = b.add_state(); t2 = b.add_state()
    b.set_start(t0); b.set_final(t2, 1.0)
    b.add_arc(t0, Arc(10, 100, 0.1, t1))
    b.add_arc(t1, Arc(20, 200, 0.1, t2))
    c = compose(a, b)
    ils, ols, cost = shortest_path(c)
    assert ils == [1, 2]
    assert ols == [100, 200]
    assert math.isclose(cost, 0.25 + 0.25 + 0.1 + 0.1 + 0.5 + 1.0)


def test_compose_epsilon_no_duplication():
    # A has an output-eps arc, B has an input-eps arc at the same point; the
    # filter must produce exactly ONE composed path.
    a = VectorFst()
    s0 = a.add_state(); s1 = a.add_state(); s2 = a.add_state()
    a.set_start(s0); a.set_final(s2, 0.0)
    a.add_arc(s0, Arc(1, 5, 0.0, s1))
    a.add_arc(s1, Arc(2, 0, 0.0, s2))  # output eps
    b = VectorFst()
    t0 = b.add_state(); t1 = b.add_state(); t2 = b.add_state()
    b.set_start(t0); b.set_final(t2, 0.0)
    b.add_arc(t0, Arc(5, 7, 0.0, t1))
    b.add_arc(t1, Arc(0, 8, 0.0, t2))  # input eps
    c = compose(a, b)
    # count complete paths by brute force
    n_paths = 0
    stack = [(c.start, 0)]
    while stack:
        s, depth = stack.pop()
        assert depth < 10
        if c.is_final(s):
            n_paths += 1
        for arc in c.arcs[s]:
            stack.append((arc.nextstate, depth + 1))
    assert n_paths == 1
    ils, ols, cost = shortest_path(c)
    assert ils == [1, 2]
    assert ols == [7, 8]


def test_determinize_star_removes_eps_and_merges():
    # Nondeterministic acceptor with eps arcs: two eps paths to same suffix.
    f = VectorFst()
    s = [f.add_state() for _ in range(5)]
    f.set_start(s[0])
    f.add_arc(s[0], Arc(0, 0, 1.0, s[1]))
    f.add_arc(s[0], Arc(0, 0, 2.0, s[2]))
    f.add_arc(s[1], Arc(7, 7, 0.5, s[3]))
    f.add_arc(s[2], Arc(7, 7, 0.5, s[3]))
    f.add_arc(s[3], Arc(8, 8, 0.0, s[4]))
    f.set_final(s[4], 0.0)
    # tropical: best path cost = 1.0+0.5+0.0 = 1.5
    d = determinize_star(f, semiring="tropical")
    assert 0 not in d.input_symbols_used()
    ils, ols, cost = shortest_path(d)
    assert ils == [7, 8]
    assert math.isclose(cost, 1.5)
    # deterministic: one arc per ilabel per state
    for arcs in d.arcs:
        labs = [a.ilabel for a in arcs]
        assert len(labs) == len(set(labs))
    # log semiring: weight = -log(e^-1 + e^-2) + 0.5
    dl = determinize_star(f, semiring="log")
    ils, ols, cost = shortest_path(dl)
    expected = -math.log(math.exp(-1.0) + math.exp(-2.0)) + 0.5
    assert math.isclose(cost, expected, rel_tol=1e-6)


def test_determinize_star_functional_output_strings():
    # Two arcs with same ilabel but outputs diverge later -> common prefix
    # handling; language must be preserved.
    f = VectorFst()
    s = [f.add_state() for _ in range(4)]
    f.set_start(s[0])
    f.add_arc(s[0], Arc(1, 10, 0.0, s[1]))
    f.add_arc(s[0], Arc(1, 10, 1.0, s[2]))
    f.add_arc(s[1], Arc(2, 20, 0.0, s[3]))
    f.add_arc(s[2], Arc(3, 30, 0.0, s[3]))
    f.set_final(s[3], 0.0)
    d = determinize_star(f)
    # path for input [1,2] must output [10,20]; for [1,3]: [10,30]
    comp = compose(make_linear_acceptor([1, 2]), d)
    ils, ols, cost = shortest_path(comp)
    assert ols == [10, 20] and math.isclose(cost, 0.0)
    comp = compose(make_linear_acceptor([1, 3]), d)
    ils, ols, cost = shortest_path(comp)
    assert ols == [10, 30] and math.isclose(cost, 1.0)


def test_minimize_encoded_merges_equivalent_states():
    # Two identical branches should merge.
    f = VectorFst()
    s = [f.add_state() for _ in range(5)]
    f.set_start(s[0])
    f.add_arc(s[0], Arc(1, 1, 0.0, s[1]))
    f.add_arc(s[0], Arc(2, 2, 0.0, s[2]))
    f.add_arc(s[1], Arc(3, 3, 0.0, s[3]))
    f.add_arc(s[2], Arc(3, 3, 0.0, s[4]))
    f.set_final(s[3], 0.0)
    f.set_final(s[4], 0.0)
    m = minimize_encoded(f)
    assert m.num_states == 3  # states 1&2 merge, 3&4 merge... 1,2 differ on in-label but have same suffix
    ils, _, _ = shortest_path(m)
    assert ils in ([1, 3], [2, 3])


def test_remove_eps_local():
    f = VectorFst()
    s = [f.add_state() for _ in range(4)]
    f.set_start(s[0])
    f.add_arc(s[0], Arc(1, 1, 0.5, s[1]))
    f.add_arc(s[1], Arc(0, 0, 0.25, s[2]))
    f.add_arc(s[2], Arc(2, 2, 0.5, s[3]))
    f.set_final(s[3], 0.0)
    g = remove_eps_local(f)
    for arcs in g.arcs:
        for a in arcs:
            assert not (a.ilabel == 0 and a.olabel == 0)
    ils, ols, cost = shortest_path(g)
    assert ils == [1, 2]
    assert math.isclose(cost, 1.25)


def test_equal_align_exact_length():
    # Simple self-loop FST: state with loop label 1, exit label 2.
    f = VectorFst()
    s0 = f.add_state(); s1 = f.add_state()
    f.set_start(s0)
    f.add_arc(s0, Arc(1, 0, 0.0, s0))
    f.add_arc(s0, Arc(2, 9, 0.0, s1))
    f.set_final(s1, 0.0)
    rng = np.random.default_rng(3)
    ils, ols, cost = equal_align(f, 10, rng)
    assert len(ils) == 10
    assert ils[-1] == 2
    assert all(l == 1 for l in ils[:-1])
    assert ols == [9]
    # infeasible length
    f2 = make_linear_acceptor([1, 2, 3])
    assert equal_align(f2, 5, rng) is None
    assert equal_align(f2, 3, rng) is not None


def test_l_fst_transduces_words():
    lp = lang_fixture()
    L = make_lexicon_fst_with_silence(lexiconp=lp, sil_prob=0.5, sil_phone="SIL")
    L.arcsort("olabel")
    # Compose with word acceptor YES NO
    words = make_linear_acceptor([lp.word2id["YES"], lp.word2id["NO"]])
    LG = compose(L, words)
    ils, ols, cost = shortest_path(LG)
    assert ols == [lp.word2id["YES"], lp.word2id["NO"]]
    # Cheapest phone path has no optional silence: Y N
    assert ils == [lp.phone2id["Y"], lp.phone2id["N"]]
    # 3 no_sil choices (before YES, between, after): cost 3*(-log 0.5)
    assert math.isclose(cost, 3 * math.log(2.0), rel_tol=1e-6)


def test_concat():
    a = make_linear_acceptor([1])
    b = make_linear_acceptor([2])
    c = connect(concat(a, b))
    ils, _, _ = shortest_path(c)
    assert ils == [1, 2]
