import math

import numpy as np
import pytest

from khg_tpu.fstlib.fst import compose, equal_align, make_linear_acceptor, shortest_path
from khg_tpu.graph.compiler import TrainingGraphCompiler, TrainingGraphCompilerOptions
from khg_tpu.graph.h_builder import add_transition_probs
from khg_tpu.lang.lexicon import Lexicon, Lexiconp
from khg_tpu.lang.lfst import make_lexicon_fst_with_silence
from khg_tpu.lang.topo import generate_hmm_topo
from khg_tpu.model.context_dep import monophone_context_dependency
from khg_tpu.model.transition_model import TransitionModel


def build_yesno_like():
    lexicon = Lexicon(word2phones={"<SIL>": ["SIL"], "YES": ["Y"], "NO": ["N"]})
    lexiconp = Lexiconp.from_lexicon(lexicon)
    lp = lexiconp.add_lex_disambig()
    topo = generate_hmm_topo(
        non_sil_phones=lp.get_non_sil_phone_ids(),
        sil_phone=lp.get_sil_phone_id(),
    )
    tree = monophone_context_dependency(
        topo.phones, topo.get_phone_to_num_pdf_classes()
    )
    tm = TransitionModel(ctx_dep=tree, hmm_topo=topo)
    lex_fst = make_lexicon_fst_with_silence(
        lexiconp=lexiconp, sil_prob=0.5, sil_phone="SIL"
    )
    disambig_ids = [lp.phone2id[f"#{i}"] for i in range(lp.max_disambig + 1)]
    gc = TrainingGraphCompiler(
        trans_model=tm,
        ctx_dep=tree,
        lex_fst=lex_fst,
        disambig_syms=disambig_ids,
        opts=TrainingGraphCompilerOptions(),
    )
    return lp, topo, tree, tm, gc


def tids_to_phones(tm, tids):
    """Recover the phone sequence from a tid alignment (reorder graphs)."""
    phones = []
    for tid in tids:
        if tm.transition_id_is_start_of_phone(tid) and not tm.is_self_loop(tid):
            phones.append(tm.transition_id_to_phone(tid))
    return phones


def total_path_mass(g, iters=3000):
    """Sum of exp(-cost) over all complete paths (fixpoint iteration;
    converges for substochastic cycles like the ergodic silence core)."""
    n = g.num_states
    m = np.zeros(n)
    fin = np.array([math.exp(-g.final[s]) if g.is_final(s) else 0.0 for s in range(n)])
    for _ in range(iters):
        new = fin.copy()
        for s in range(n):
            new[s] += sum(math.exp(-a.weight) * m[a.nextstate] for a in g.arcs[s])
        if np.max(np.abs(new - m)) < 1e-12:
            m = new
            break
        m = new
    return float(m[g.start])


def test_pre_self_loop_graph_total_mass_is_one():
    # With unit scales and a stochastic L (sil 0.5/0.5, pron prob 1) the
    # acyclic pre-self-loop graph must have total path mass exactly 1:
    # this exercises H weights, the epsilon-filter composition, log-semiring
    # determinization (mass-preserving) and encoded minimization.
    from khg_tpu.graph.context import compose_context_monophone
    from khg_tpu.graph.h_builder import get_h_transducer
    from khg_tpu.fstlib.fst import (
        determinize_star,
        minimize_encoded,
        remove_input_symbols,
    )

    lp, topo, tree, tm, gc = build_yesno_like()
    word_ids = [lp.word2id["YES"], lp.word2id["NO"]]
    LG = compose(gc.lex_fst, make_linear_acceptor(word_ids))
    assert math.isclose(total_path_mass(LG), 1.0, rel_tol=1e-5)
    CLG, ilabel_info = compose_context_monophone(LG, tm.phones, gc.disambig_syms)
    H, dis_h = get_h_transducer(ilabel_info, tree, tm, 1.0)
    H.arcsort("olabel")
    HCLGa = compose(H, CLG)
    # self-loop mass has been factored out: each HMM path contributes
    # P(path)/prod(1-p_self) ... so HCLGa mass is NOT 1; but determinize in
    # the log semiring must preserve it exactly.
    m0 = total_path_mass(HCLGa)
    D = determinize_star(HCLGa, semiring="log")
    assert math.isclose(total_path_mass(D), m0, rel_tol=1e-5)
    remove_input_symbols(dis_h, D)
    M = minimize_encoded(D)
    assert math.isclose(total_path_mass(M), m0, rel_tol=1e-5)


def test_alignment_cost_parity():
    # For a reorder-style graph with unit scales, the cost of any complete
    # tid path telescopes to  sum_t -log P(tid_t)  +  (L costs).  For the
    # yesno-style lexicon, every word boundary contributes -log(0.5)
    # regardless of whether silence is taken (sil_prob = 0.5), i.e.
    # (num_words + 1) * log 2 for paths where all sil decisions resolve.
    lp, topo, tree, tm, gc = build_yesno_like()
    word_ids = [lp.word2id["YES"], lp.word2id["NO"]]
    g = gc.compile_graph_from_text(word_ids)
    rng = np.random.default_rng(7)
    for T in (6, 20, 41):
        res = equal_align(g, T, rng)
        assert res is not None
        tids, words, cost = res
        expected = sum(-tm.get_transition_log_prob(t) for t in tids)
        expected += 3 * math.log(2.0)
        assert math.isclose(cost, expected, rel_tol=1e-4), (T, cost, expected)
        # the same path re-scored through composition gives the same cost
        comp = compose(make_linear_acceptor(tids), g)
        _, ols, comp_cost = shortest_path(comp)
        assert math.isclose(comp_cost, expected, rel_tol=1e-4)
        assert ols == words


def test_compile_graph_accepts_only_transcript_words():
    lp, topo, tree, tm, gc = build_yesno_like()
    word_ids = [lp.word2id["YES"], lp.word2id["NO"]]
    g = gc.compile_graph_from_text(word_ids)
    ils, ols, cost = shortest_path(g)
    assert ols == word_ids
    # Best path phone sequence: Y N (silences optional and dispreferred
    # only via cost 0.5 each way... both branches equal; accept either)
    phones = tids_to_phones(tm, ils)
    non_sil = [p for p in phones if p != lp.get_sil_phone_id()]
    assert non_sil == [lp.phone2id["Y"], lp.phone2id["N"]]


def test_no_self_loops_before_and_present_after():
    lp, topo, tree, tm, gc = build_yesno_like()
    word_ids = [lp.word2id["NO"]]
    g = gc.compile_graph_from_text(word_ids)
    self_loops = 0
    for s in range(g.num_states):
        for a in g.arcs[s]:
            if a.nextstate == s and a.ilabel != 0:
                assert tm.is_self_loop(a.ilabel)
                self_loops += 1
    # every emitting HMM state of the path must have a self-loop somewhere
    assert self_loops >= 3


def test_equal_align_on_training_graph():
    lp, topo, tree, tm, gc = build_yesno_like()
    word_ids = [lp.word2id["YES"], lp.word2id["NO"]]
    g = gc.compile_graph_from_text(word_ids)
    rng = np.random.default_rng(3)
    T = 50
    res = equal_align(g, T, rng)
    assert res is not None
    tids, words, cost = res
    assert len(tids) == T
    assert words == word_ids
    phones = tids_to_phones(tm, tids)
    non_sil = [p for p in phones if p != lp.get_sil_phone_id()]
    assert non_sil == [lp.phone2id["Y"], lp.phone2id["N"]]
    # alignment must be a valid path: compose with the graph
    acc = make_linear_acceptor(tids)
    comp = compose(acc, g)
    assert comp.start != -1
    # too-short length is infeasible (min 3 frames/phone * 2 phones)
    assert equal_align(g, 5, rng) is None


def test_min_length_feasibility():
    lp, topo, tree, tm, gc = build_yesno_like()
    word_ids = [lp.word2id["YES"]]
    g = gc.compile_graph_from_text(word_ids)
    rng = np.random.default_rng(0)
    assert equal_align(g, 3, rng) is not None  # exactly min length (Y = 3 states)
    assert equal_align(g, 2, rng) is None


def test_add_transition_probs_scales():
    lp, topo, tree, tm, gc = build_yesno_like()
    # Graph compiled with zero scales → bare graph costs (L costs only);
    # add_transition_probs(1.0, 0.1) then adds the scaled trans costs
    # exactly as the aligner uses them.
    gc0 = TrainingGraphCompiler(
        trans_model=tm,
        ctx_dep=tree,
        lex_fst=gc.lex_fst.copy(),
        disambig_syms=gc.disambig_syms,
        opts=TrainingGraphCompilerOptions(
            transition_scale=0.0, self_loop_scale=0.0
        ),
    )
    word_ids = [lp.word2id["NO"]]
    g0 = gc0.compile_graph_from_text(word_ids)
    g1 = g0.copy()
    add_transition_probs(tm, g1, transition_scale=1.0, self_loop_scale=1.0)
    # With unit scales re-applied, any alignment path must cost
    # sum_t -log P(tid) + L costs (2 boundaries for one word), same as a
    # graph compiled directly with unit scales.
    rng = np.random.default_rng(1)
    tids, words, cost = equal_align(g1, 12, rng)
    expected = sum(-tm.get_transition_log_prob(t) for t in tids) + 2 * math.log(2.0)
    assert math.isclose(cost, expected, rel_tol=1e-4)
    # and the zero-scale graph costs only the L part
    comp = compose(make_linear_acceptor(tids), g0)
    _, _, cost0 = shortest_path(comp)
    assert math.isclose(cost0, 2 * math.log(2.0), rel_tol=1e-4)
