"""Non-HMM (chain/CTC-style) topologies with context-dependent trees.

The non-HMM tuple path (distinct forward / self-loop pdf-classes) must
work for ANY context tree, enumerating only the (forward_pdf,
self_loop_pdf) pairs that co-occur for some real context — reference
semantics ComputeTuplesNotHmm (transition-model.cc:181-252) +
EnumeratePairs (context-dep.cc:85-163).  Previously khg_tpu asserted
N==1 here (VERDICT r4 missing #3).
"""

import math

import numpy as np
import pytest

from khg_tpu.fstlib.fst import (
    compose,
    equal_align,
    make_linear_acceptor,
    shortest_path,
)
from khg_tpu.graph.compiler import (
    TrainingGraphCompiler,
    TrainingGraphCompilerOptions,
)
from khg_tpu.lang.lexicon import Lexicon, Lexiconp
from khg_tpu.lang.lfst import make_lexicon_fst_no_silence
from khg_tpu.model.context_dep import ContextDependency
from khg_tpu.model.event_map import (
    ConstantEventMap,
    K_PDF_CLASS,
    SplitEventMap,
    TableEventMap,
)
from khg_tpu.model.topology import HmmTopology
from khg_tpu.model.transition_model import TransitionModel

# one emitting state whose forward and self-loop pdfs differ (the
# chain-model shape that makes is_hmm() False)
CHAIN_TOPO = """
<Topology> <TopologyEntry> <ForPhones> 1 2 3 </ForPhones>
<State> 0 <ForwardPdfClass> 0 <SelfLoopPdfClass> 1
  <Transition> 0 0.5 <Transition> 1 0.5 </State>
<State> 1 </State> </TopologyEntry> </Topology>
"""


def build_chain_system(context: str):
    """context='mono' -> N=1 tree; 'tri' -> N=3 tree where phone 1's
    forward AND self-loop pdfs depend on the left context (left==1 vs
    not), phones 2,3 context-independent.

    Triphone pdf layout: phone1 fwd: 0|1 (left==1 / other),
    slf: 2|3; phone2: 4,5; phone3: 6,7.
    """
    topo = HmmTopology().read(CHAIN_TOPO)
    if context == "mono":
        # pdf p = 2*(phone-1) + pdf_class
        table = {
            p: TableEventMap.from_answers(
                K_PDF_CLASS, {0: 2 * (p - 1), 1: 2 * (p - 1) + 1}
            )
            for p in (1, 2, 3)
        }
        tree = ContextDependency(N=1, P=0, to_pdf=TableEventMap(0, table))
    else:
        def split_on_left(yes_pdf, no_pdf):
            return SplitEventMap(
                0, [1], ConstantEventMap(yes_pdf), ConstantEventMap(no_pdf)
            )

        tree_map = TableEventMap(
            1,  # central phone (P=1)
            {
                1: TableEventMap(
                    K_PDF_CLASS,
                    {0: split_on_left(0, 1), 1: split_on_left(2, 3)},
                ),
                2: TableEventMap.from_answers(K_PDF_CLASS, {0: 4, 1: 5}),
                3: TableEventMap.from_answers(K_PDF_CLASS, {0: 6, 1: 7}),
            },
        )
        tree = ContextDependency(N=3, P=1, to_pdf=tree_map)
    tm = TransitionModel(ctx_dep=tree, hmm_topo=topo)
    return topo, tree, tm


def test_chain_topo_is_not_hmm():
    topo = HmmTopology().read(CHAIN_TOPO)
    assert not topo.is_hmm()


def test_chain_mono_tuples():
    topo, tree, tm = build_chain_system("mono")
    assert tm.num_pdfs == 6
    got = sorted(tm.tuples)
    assert got == [(p, 0, 2 * (p - 1), 2 * (p - 1) + 1) for p in (1, 2, 3)]


def test_chain_tri_tuples_no_cross_product():
    """Phone 1's forward pdfs {0,1} and self-loop pdfs {2,3} are both
    context-ambiguous; only the CO-OCCURRING pairs (0,2) [left==1] and
    (1,3) [other contexts] are realizable.  A naive cross product would
    also produce (0,3) and (1,2) — tuples the reference never creates."""
    topo, tree, tm = build_chain_system("tri")
    assert tm.num_pdfs == 8
    phone1 = sorted(set(t for t in tm.tuples if t[0] == 1))
    assert phone1 == [(1, 0, 0, 2), (1, 0, 1, 3)]
    phone2 = sorted(set(t for t in tm.tuples if t[0] == 2))
    assert phone2 == [(2, 0, 4, 5)]


def test_chain_tri_tids_map_to_pdfs():
    """Self-loop tids resolve to the self-loop pdf, forward tids to the
    forward pdf, for every transition-state."""
    topo, tree, tm = build_chain_system("tri")
    for ts in range(1, tm.num_transition_states + 1):
        phone, hmm_state, fwd, slf = tm.tuples[ts - 1]
        for tid in range(tm.state2id[ts], tm.state2id[ts + 1]):
            want = slf if tm.is_self_loop(tid) else fwd
            assert tm.id2pdf_id[tid] == want
    # both pdf columns appear among tids
    pdfs = {tm.id2pdf_id[t] for t in range(1, tm.num_transition_ids + 1)}
    assert pdfs == set(range(8))


def test_chain_tri_numbering_is_tuple_sorted():
    topo, tree, tm = build_chain_system("tri")
    assert tm.tuples == sorted(tm.tuples)


def test_chain_golden_matches_reference():
    """Bit parity with the reference's own ComputeTuplesNotHmm +
    EnumeratePairs, run over khg_tpu-exported topo/tree files
    (tools/refgold/tuples_runner.cc -> chain_tuples_golden.json)."""
    import json
    from pathlib import Path

    golden = json.loads(
        (Path(__file__).parent / "golden" / "chain_tuples_golden.json")
        .read_text()
    )
    for kind in ("mono", "tri"):
        topo, tree, tm = build_chain_system(kind)
        g = golden[kind]
        assert tm.num_pdfs == g["num_pdfs"]
        assert tm.num_transition_ids == g["num_transition_ids"]
        assert tm.num_transition_states == g["num_transition_states"]
        assert [list(t) for t in tm.tuples] == g["tuples"]
        n = tm.num_transition_ids
        assert list(tm.id2pdf_id[1:n + 1]) == g["id2pdf"]
        assert [tm.id2state[t] for t in range(1, n + 1)] == g["id2state"]
        assert [int(tm.is_self_loop(t)) for t in range(1, n + 1)] == \
            g["id2self_loop"]


def _chain_compiler(tm, tree):
    lexicon = Lexicon(
        word2phones={"A": ["p1 p2"], "B": ["p3 p2"], "C": ["p3"]}
    )
    lp = Lexiconp.from_lexicon(lexicon).add_lex_disambig()
    assert lp.phone2id["p1"] == 1 and lp.phone2id["p2"] == 2
    L = make_lexicon_fst_no_silence(lp)
    disambig_ids = [lp.phone2id[f"#{i}"] for i in range(lp.max_disambig + 1)]
    gc = TrainingGraphCompiler(
        tm, tree, L, disambig_syms=disambig_ids,
        opts=TrainingGraphCompilerOptions(),
    )
    return lp, gc


@pytest.mark.parametrize("context", ["mono", "tri"])
def test_chain_train_graph_aligns_and_costs_telescope(context):
    """A training graph compiled from the chain topology admits an
    equal-align path whose cost telescopes to sum(-log P(tid)) —
    the H/graph layer handles split forward/self-loop pdfs end to end."""
    topo, tree, tm = build_chain_system(context)
    lp, gc = _chain_compiler(tm, tree)
    rng = np.random.default_rng(3)
    g = gc.compile_graph_from_text(
        [lp.word2id["A"], lp.word2id["B"], lp.word2id["C"]]
    )
    assert g.num_states > 0
    for T in (10, 17):
        res = equal_align(g, T, rng)
        assert res is not None
        tids, words, cost = res
        assert len(tids) == T
        expected = sum(-tm.get_transition_log_prob(t) for t in tids)
        assert math.isclose(cost, expected, rel_tol=1e-4)
        comp = compose(make_linear_acceptor(tids), g)
        _, ols, comp_cost = shortest_path(comp)
        assert math.isclose(comp_cost, expected, rel_tol=1e-4)
        assert ols == words
        for t in tids:
            assert 0 <= tm.id2pdf_id[t] < tm.num_pdfs


def test_chain_tri_small_em_improves():
    """One EM step over synthetic features with the chain-tri system:
    stats accumulate on both pdf columns and the update improves the
    log-likelihood (the estimation layer sees nothing special about
    split pdfs)."""
    from khg_tpu.est.flags import GMM_ALL
    from khg_tpu.est.mle import MleDiagGmmOptions, mle_am_diag_gmm_update
    from khg_tpu.gmm.am_gmm import AmDiagGmm
    from khg_tpu.gmm.diag_gmm import DiagGmm
    from khg_tpu.recipes.pipeline import EStepPipeline
    from khg_tpu.stats.accum import AccumAmDiagGmm

    topo, tree, tm = build_chain_system("tri")
    lp, gc = _chain_compiler(tm, tree)
    rng = np.random.default_rng(0)
    dim = 6
    am = AmDiagGmm()
    for p in range(tm.num_pdfs):
        g = DiagGmm(1, dim)
        g.means_invvars = rng.standard_normal((1, dim))
        g.inv_vars = np.ones((1, dim))
        g.weights = np.ones(1)
        g.compute_gconsts()
        am.add_pdf(g)

    graphs = [
        gc.compile_graph_from_text([lp.word2id["A"], lp.word2id["C"]]),
        gc.compile_graph_from_text([lp.word2id["B"]]),
    ]
    feats = [rng.standard_normal((20, dim)).astype(np.float32)
             for _ in graphs]
    pipeline = EStepPipeline(tm, acoustic_scale=1.0, batch_size=2)
    packed = pipeline.pack_graphs(graphs)

    def one_pass():
        accs = AccumAmDiagGmm()
        accs.init(am, flags=GMM_ALL)
        tacc = tm.init_stats()
        res = pipeline.align_and_accumulate(
            am, packed, feats, accs, tacc, return_alignments=False
        )
        assert res.num_done == len(graphs)
        return accs, res.tot_like

    accs, like0 = one_pass()
    # both pdf columns of phone 1 must have received occupancy
    occs = [float(np.sum(accs.get_acc(p).occupancy)) for p in range(8)]
    assert occs[0] + occs[1] > 0 and occs[2] + occs[3] > 0
    mle_am_diag_gmm_update(MleDiagGmmOptions(), accs, GMM_ALL, am)
    _, like1 = one_pass()
    assert like1 > like0
