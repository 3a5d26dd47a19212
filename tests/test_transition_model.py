import math
import pickle

import numpy as np

from khg_tpu.lang.topo import generate_hmm_topo
from khg_tpu.model.context_dep import monophone_context_dependency
from khg_tpu.model.transition_model import (
    MleTransitionUpdateConfig,
    TransitionModel,
    get_pdfs_for_phones,
)


def build_tm(non_sil=(2, 3), sil=1, num_sil_states=5):
    topo = generate_hmm_topo(
        non_sil_phones=list(non_sil), sil_phone=sil, num_sil_states=num_sil_states
    )
    tree = monophone_context_dependency(
        topo.phones, topo.get_phone_to_num_pdf_classes()
    )
    return topo, tree, TransitionModel(ctx_dep=tree, hmm_topo=topo)


def test_monophone_tree_numbering():
    topo, tree, tm = build_tm()
    # Phones [1(sil,5 classes), 2, 3 (3 classes each)] -> 5+3+3=11 pdfs,
    # numbered in stub-map recursion order (phone-major, pdf-class minor).
    assert tree.num_pdfs == 11
    assert tree.compute([1], 0) == 0
    assert tree.compute([1], 4) == 4
    assert tree.compute([2], 0) == 5
    assert tree.compute([3], 2) == 10


def test_tuples_sorted_and_onebased():
    topo, tree, tm = build_tm()
    assert tm.tuples == sorted(tm.tuples)
    # 11 emitting states total -> 11 transition states
    assert tm.num_transition_states == 11
    # tids: sil state0: 4 transitions, sil states 1-3: 4 each, sil state4: 2,
    # plus 6 non-sil states with 2 each: 4*4+2+12 = 30
    assert tm.num_transition_ids == 4 + 4 + 4 + 4 + 2 + 6 * 2
    # First tuple must be (1, 0, 0, 0) -> tstate 1, tids 1..4
    assert tm.tuples[0] == (1, 0, 0, 0)
    assert tm.state2id[1] == 1
    assert tm.num_transition_indices(1) == 4
    # Reverse lookup
    for ts in range(1, tm.num_transition_states + 1):
        tup = tm.tuples[ts - 1]
        assert tm.tuple_to_transition_state(*tup) == ts


def test_id2pdf_and_selfloops():
    topo, tree, tm = build_tm()
    for tid in range(1, tm.num_transition_ids + 1):
        ts = tm.transition_id_to_transition_state(tid)
        pdf = tm.transition_id_to_pdf(tid)
        if tm.is_self_loop(tid):
            assert pdf == tm.transition_state_to_self_loop_pdf(ts)
        else:
            assert pdf == tm.transition_state_to_forward_pdf(ts)
        assert tid == tm.pair_to_transition_id(
            ts, tm.transition_id_to_transition_index(tid)
        )
    # Self-loop of non-sil phone state: prob 0.75
    ts = tm.tuple_to_transition_state(2, 0, 5, 5)
    tid = tm.self_loop_of(ts)
    assert tid != 0
    assert math.isclose(tm.get_transition_prob(tid), 0.75, rel_tol=1e-6)
    assert math.isclose(
        tm.get_non_self_loop_log_prob(ts), math.log(0.25), rel_tol=1e-5
    )
    # log prob ignoring self-loops: log(0.25) - log(0.25) = 0
    fwd_tid = tid + 1 if not tm.is_self_loop(tid + 1) else tid - 1
    assert abs(tm.get_transition_log_prob_ignoring_self_loops(fwd_tid)) < 1e-5


def test_is_final():
    topo, tree, tm = build_tm()
    # The transition from the last emitting non-sil state to the final state.
    ts = tm.tuple_to_transition_state(2, 2, 7, 7)
    finals = [
        tid
        for tid in range(tm.state2id[ts], tm.state2id[ts + 1])
        if tm.is_final(tid)
    ]
    assert len(finals) == 1
    assert not tm.is_self_loop(finals[0])


def test_mle_update():
    topo, tree, tm = build_tm()
    stats = tm.init_stats()
    # Fake counts: self-loops seen 90x, forward 10x for tstate of phone 2.
    ts = tm.tuple_to_transition_state(2, 0, 5, 5)
    self_tid = tm.self_loop_of(ts)
    other_tids = [
        tid
        for tid in range(tm.state2id[ts], tm.state2id[ts + 1])
        if tid != self_tid
    ]
    stats[self_tid] = 90.0
    stats[other_tids[0]] = 10.0
    objf_impr, count = tm.mle_update(stats, MleTransitionUpdateConfig())
    assert count == 100.0
    assert objf_impr > 0
    assert math.isclose(tm.get_transition_prob(self_tid), 0.9, rel_tol=1e-5)
    # Untouched tstates keep their priors.
    ts3 = tm.tuple_to_transition_state(3, 0, 8, 8)
    tid3 = tm.self_loop_of(ts3)
    assert math.isclose(tm.get_transition_prob(tid3), 0.75, rel_tol=1e-6)


def test_mle_update_flooring():
    topo, tree, tm = build_tm()
    stats = tm.init_stats()
    ts = tm.tuple_to_transition_state(2, 0, 5, 5)
    self_tid = tm.self_loop_of(ts)
    stats[self_tid] = 1000.0  # all mass on the self-loop -> other floored
    objf_impr, count = tm.mle_update(stats, MleTransitionUpdateConfig(floor=0.01))
    probs = [
        tm.get_transition_prob(tid)
        for tid in range(tm.state2id[ts], tm.state2id[ts + 1])
    ]
    assert math.isclose(min(probs), 0.01, rel_tol=1e-5)


def test_get_pdfs_for_phones():
    topo, tree, tm = build_tm()
    is_unique, pdfs = get_pdfs_for_phones(tm, [1])
    assert is_unique
    assert pdfs == [0, 1, 2, 3, 4]


def test_pickle_round_trip():
    topo, tree, tm = build_tm()
    tm2 = pickle.loads(pickle.dumps(tm))
    assert tm2.tuples == tm.tuples
    assert np.allclose(tm2.log_probs, tm.log_probs)
    assert tm2.num_transition_ids == tm.num_transition_ids


def test_id2pdf_array():
    topo, tree, tm = build_tm()
    arr = tm.id2pdf_array()
    assert arr.shape == (tm.num_transition_ids + 1,)
    # entry 0 (tid 0 = padding) is 0, matching the reference's
    # zero-initialized id2pdf_id_[0] (transition-model.cc:280)
    assert arr[0] == 0
    assert arr[1] == tm.transition_id_to_pdf(1)
