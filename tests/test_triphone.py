"""Wide-context (triphone) training-graph compilation."""

import math

import numpy as np
import pytest

from khg_tpu.fstlib.fst import equal_align, make_linear_acceptor, compose, shortest_path
from khg_tpu.graph.compiler import TrainingGraphCompiler, TrainingGraphCompilerOptions
from khg_tpu.lang.lexicon import Lexicon, Lexiconp
from khg_tpu.lang.lfst import make_lexicon_fst_no_silence
from khg_tpu.lang.topo import generate_hmm_topo
from khg_tpu.model.context_dep import ContextDependency
from khg_tpu.model.event_map import (
    K_PDF_CLASS,
    SplitEventMap,
    TableEventMap,
)
from khg_tpu.model.topology import HmmTopology
from khg_tpu.model.transition_model import TransitionModel


def build_triphone_system():
    """Phones 1,2,3 (no silence); phone 2's pdfs depend on its LEFT context
    (left in {1} vs not); phones 1,3 are context-independent."""
    topo_text = """
    <Topology> <TopologyEntry> <ForPhones> 1 2 3 </ForPhones>
    <State> 0 <PdfClass> 0 <Transition> 0 0.5 <Transition> 1 0.5 </State>
    <State> 1 <PdfClass> 1 <Transition> 1 0.5 <Transition> 2 0.5 </State>
    <State> 2 </State> </TopologyEntry> </Topology>
    """
    topo = HmmTopology().read(topo_text)

    def leaves(first):
        return TableEventMap.from_answers(
            K_PDF_CLASS, {0: first, 1: first + 1}
        )

    # pdf layout: phone1: 0,1; phone2|left=1: 2,3; phone2|other: 4,5;
    # phone3: 6,7
    tree_map = TableEventMap(
        1,  # central phone (P=1)
        {
            1: leaves(0),
            2: SplitEventMap(0, [1], leaves(2), leaves(4)),
            3: leaves(6),
        },
    )
    tree = ContextDependency(N=3, P=1, to_pdf=tree_map)
    tm = TransitionModel(ctx_dep=tree, hmm_topo=topo)
    return topo, tree, tm


def test_triphone_tuples():
    topo, tree, tm = build_triphone_system()
    assert tree.num_pdfs == 8
    assert tm.num_pdfs == 8
    # pdfs 2,3 and 4,5 both belong to phone 2
    for pdf, phone in [(0, 1), (2, 2), (4, 2), (6, 3)]:
        states = [
            ts for ts in range(1, tm.num_transition_states + 1)
            if tm.transition_state_to_forward_pdf(ts) == pdf
        ]
        assert states, pdf
        assert all(tm.transition_state_to_phone(ts) == phone for ts in states)


def build_compiler(tm, tree):
    word2phones = {"A": ["p1 p2"], "B": ["p3 p2"], "C": ["p3"]}
    lexicon = Lexicon(word2phones=word2phones)
    lp = Lexiconp.from_lexicon(lexicon).add_lex_disambig()
    # phone symbol ids must match 1,2,3: p1<p2<p3 sorted gives 1,2,3
    assert lp.phone2id["p1"] == 1 and lp.phone2id["p2"] == 2
    L = make_lexicon_fst_no_silence(lp)
    disambig_ids = [lp.phone2id[f"#{i}"] for i in range(lp.max_disambig + 1)]
    gc = TrainingGraphCompiler(
        tm, tree, L, disambig_syms=disambig_ids,
        opts=TrainingGraphCompilerOptions(),
    )
    return lp, gc


def test_triphone_graph_context_dependent_pdfs():
    topo, tree, tm = build_triphone_system()
    lp, gc = build_compiler(tm, tree)
    rng = np.random.default_rng(0)

    # word A = p1 p2: phone 2 with left context p1 -> pdfs 2,3
    gA = gc.compile_graph_from_text([lp.word2id["A"]])
    tids, words, cost = equal_align(gA, 8, rng)
    assert words == [lp.word2id["A"]]
    pdfs = {tm.transition_id_to_pdf(t) for t in tids}
    assert pdfs <= {0, 1, 2, 3}
    assert {2, 3} & pdfs

    # word B = p3 p2: phone 2 with left context p3 -> pdfs 4,5
    gB = gc.compile_graph_from_text([lp.word2id["B"]])
    tids, words, cost = equal_align(gB, 8, rng)
    assert words == [lp.word2id["B"]]
    pdfs = {tm.transition_id_to_pdf(t) for t in tids}
    assert pdfs <= {6, 7, 4, 5}
    assert {4, 5} & pdfs


def test_triphone_cross_word_context():
    topo, tree, tm = build_triphone_system()
    lp, gc = build_compiler(tm, tree)
    rng = np.random.default_rng(1)
    # "C A": phones p3 | p1 p2 -- still left ctx p1 for p2 (within word A)
    g = gc.compile_graph_from_text([lp.word2id["C"], lp.word2id["A"]])
    tids, words, cost = equal_align(g, 10, rng)
    assert words == [lp.word2id["C"], lp.word2id["A"]]
    pdfs = [tm.transition_id_to_pdf(t) for t in tids]
    assert {2, 3} & set(pdfs)
    assert not ({4, 5} & set(pdfs))


def test_triphone_graph_cost_telescopes():
    topo, tree, tm = build_triphone_system()
    lp, gc = build_compiler(tm, tree)
    rng = np.random.default_rng(2)
    g = gc.compile_graph_from_text([lp.word2id["A"], lp.word2id["B"]])
    for T in (8, 15):
        res = equal_align(g, T, rng)
        assert res is not None
        tids, words, cost = res
        expected = sum(-tm.get_transition_log_prob(t) for t in tids)
        assert math.isclose(cost, expected, rel_tol=1e-4)
        comp = compose(make_linear_acceptor(tids), g)
        _, ols, comp_cost = shortest_path(comp)
        assert math.isclose(comp_cost, expected, rel_tol=1e-4)
        assert ols == words
