"""H-transducer construction and transition-id level graph transforms.

Builds per-phone-in-context HMM FSAs (self-loop-free, arcs labeled with
transition-ids, weights = scaled -log P(trans)/(1 - P(self-loop))), unions
them into the H transducer, and provides AddSelfLoops / AddTransitionProbs
with the reference's exact weight semantics — these weights flow into
alignment scores, so parity matters.

Reference semantics: /root/reference/kaldi-hmm-gmm/csrc/hmm-utils.cc
(GetHmmAsFsa 40-158, GetHTransducer 162-242, AddSelfLoops 293-438,
AddTransitionProbs 442-493).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from khg_tpu.fstlib.fst import Arc, VectorFst, remove_eps_local
from khg_tpu.model.context_dep import ContextDependency
from khg_tpu.model.topology import K_NO_PDF
from khg_tpu.model.transition_model import TransitionModel


def get_hmm_as_fsa(
    phone_window: List[int],
    ctx_dep: ContextDependency,
    trans_model: TransitionModel,
    transition_scale: float = 1.0,
    cache: Optional[Dict] = None,
) -> VectorFst:
    """Self-loop-free HMM FSA for one phone-in-context.

    Arc weight for a normal transition is
    -transition_scale * log(P(trans) / (1 - P(self_loop))): self-loop mass
    is deferred to add_self_loops.
    """
    assert len(phone_window) == ctx_dep.context_width
    P = ctx_dep.central_position
    phone = phone_window[P]
    assert phone != 0

    topo = trans_model.get_topo()
    entry = topo.topology_for_phone(phone)

    pdfs = []
    for pdf_class in range(topo.num_pdf_classes(phone)):
        pdf = ctx_dep.compute(phone_window, pdf_class)
        if pdf is None:
            raise ValueError(
                f"Context-dependency gave no pdf for phone window {phone_window}, "
                f"pdf-class {pdf_class}"
            )
        pdfs.append(pdf)

    cache_index = (phone, tuple(pdfs))
    if cache is not None and cache_index in cache:
        return cache[cache_index]

    fsa = VectorFst()
    state_ids = [fsa.add_state() for _ in entry]
    fsa.set_start(state_ids[0])
    fsa.set_final(state_ids[-1], 0.0)

    for hmm_state, st in enumerate(entry):
        if st.forward_pdf_class == K_NO_PDF:
            forward_pdf = self_loop_pdf = K_NO_PDF
        else:
            forward_pdf = pdfs[st.forward_pdf_class]
            self_loop_pdf = pdfs[st.self_loop_pdf_class]
        for trans_idx, (dest_state, prob) in enumerate(st.transitions):
            if dest_state == hmm_state:
                continue  # self-loops added later
            if st.forward_pdf_class == K_NO_PDF:
                log_prob = math.log(prob)
                label = 0
            else:
                tstate = trans_model.tuple_to_transition_state(
                    phone, hmm_state, forward_pdf, self_loop_pdf
                )
                tid = trans_model.pair_to_transition_id(tstate, trans_idx)
                log_prob = trans_model.get_transition_log_prob_ignoring_self_loops(tid)
                label = tid
            fsa.add_arc(
                state_ids[hmm_state],
                Arc(label, label, -log_prob, state_ids[dest_state]),
            )

    fsa = remove_eps_local(fsa)
    fsa.apply_probability_scale(transition_scale)
    if cache is not None:
        cache[cache_index] = fsa
    return fsa


def make_trivial_acceptor(label: int) -> VectorFst:
    fst = VectorFst()
    s0 = fst.add_state()
    s1 = fst.add_state()
    fst.set_start(s0)
    fst.set_final(s1, 0.0)
    fst.add_arc(s0, Arc(label, label, 0.0, s1))
    return fst


def make_loop_fst(fsts: Sequence[Optional[VectorFst]]) -> VectorFst:
    """Union-with-loop: paths through fsts[i] carry output label i.

    One loop state that is both start and final; entering sub-FST i puts
    olabel i on the entry arc; sub-FST final weights become return arcs to
    the loop state.  (Functional equivalent of fst::MakeLoopFst.)
    """
    out = VectorFst()
    loop = out.add_state()
    out.set_start(loop)
    out.set_final(loop, 0.0)

    for olabel, sub in enumerate(fsts):
        if olabel == 0 or sub is None:
            continue
        assert sub.start != -1
        smap = {}
        for s in range(sub.num_states):
            smap[s] = out.add_state()
        # entry arcs: pull the first arcs of the sub-FST up to the loop state
        # so we avoid an epsilon entry arc where possible.
        for a in sub.arcs[sub.start]:
            out.add_arc(loop, Arc(a.ilabel, olabel, a.weight, smap[a.nextstate]))
        if sub.is_final(sub.start):
            # empty path through the sub-FST: epsilon arc with the olabel
            out.add_arc(loop, Arc(0, olabel, sub.final[sub.start], loop))
        for s in range(sub.num_states):
            if s == sub.start:
                continue
            for a in sub.arcs[s]:
                out.add_arc(smap[s], Arc(a.ilabel, a.olabel, a.weight, smap[a.nextstate]))
            if sub.is_final(s):
                out.add_arc(smap[s], Arc(0, 0, sub.final[s], loop))
        # note: arcs inside the sub-FST keep their own olabels, which are 0
        # for HMM FSAs (acceptor arcs carry tid:tid — see below).
    return out


def get_h_transducer(
    ilabel_info: List[List[int]],
    ctx_dep: ContextDependency,
    trans_model: TransitionModel,
    transition_scale: float = 1.0,
) -> Tuple[VectorFst, List[int]]:
    """H: transition-ids (input) -> context-window symbols (output).

    Returns (H, disambig_syms_left): fresh input-side disambig symbols start
    at num_transition_ids + 1, one per disambig entry of ilabel_info.
    """
    assert len(ilabel_info) >= 1 and len(ilabel_info[0]) == 0
    cache: Dict = {}
    fsts: List[Optional[VectorFst]] = [None] * len(ilabel_info)
    disambig_syms_left: List[int] = []
    next_disambig = trans_model.num_transition_ids + 1

    for j in range(1, len(ilabel_info)):
        info = ilabel_info[j]
        assert len(info) > 0
        if info[0] < 0 or (info[0] == 0 and len(info) == 1):
            assert len(info) == 1, "grammar-FST ilabel-info not supported"
            disambig_sym_left = next_disambig
            next_disambig += 1
            disambig_syms_left.append(disambig_sym_left)
            fsts[j] = make_trivial_acceptor(disambig_sym_left)
        else:
            fsa = get_hmm_as_fsa(
                list(info), ctx_dep, trans_model, transition_scale, cache
            )
            fsts[j] = fsa

    # HMM FSAs are acceptors (ilabel==olabel).  Inside the loop FST the
    # output tape must carry only the context-window symbol on the entry
    # arc, so strip olabels first.
    stripped: List[Optional[VectorFst]] = [None] * len(fsts)
    seen = {}
    for j, f in enumerate(fsts):
        if f is None:
            continue
        if id(f) in seen:
            stripped[j] = seen[id(f)]
            continue
        g = f.copy()
        for arcs in g.arcs:
            for a in arcs:
                a.olabel = 0
        stripped[j] = g
        seen[id(f)] = g
    return make_loop_fst(stripped), disambig_syms_left


# ---------------------------------------------------------------- self-loops


def _make_preceding_input_symbols_same_class(
    fst: VectorFst, classify: Callable[[int], int]
) -> None:
    """Duplicate states so all incoming arcs of a state share one class.

    The start state is treated as having a virtual incoming arc of class 0
    (epsilon), so it never receives a self-loop.  In-place.
    """
    n = fst.num_states
    # collect incoming classes
    classes: List[set] = [set() for _ in range(n)]
    classes[fst.start].add(0)
    for s in range(n):
        for a in fst.arcs[s]:
            classes[a.nextstate].add(classify(a.ilabel))

    # representative state per (state, class)
    rep: Dict[Tuple[int, int], int] = {}
    dups: List[Tuple[int, int]] = []  # (orig, class) needing new states
    for s in range(n):
        cls = sorted(classes[s]) or [0]
        rep[(s, cls[0])] = s
        for c in cls[1:]:
            dups.append((s, c))
    for s, c in dups:
        rep[(s, c)] = fst.add_state()

    if not dups:
        return

    # copy outgoing arcs and final weights to duplicates
    for s, c in dups:
        d = rep[(s, c)]
        fst.final[d] = fst.final[s]
        for a in fst.arcs[s]:
            fst.arcs[d].append(Arc(a.ilabel, a.olabel, a.weight, a.nextstate))

    # redirect every arc to the representative of (dst, class(ilabel))
    for s in range(fst.num_states):
        for a in fst.arcs[s]:
            a.nextstate = rep[(a.nextstate, classify(a.ilabel))]


def add_self_loops(
    trans_model: TransitionModel,
    fst: VectorFst,
    self_loop_scale: float = 1.0,
    disambig_syms: Optional[List[int]] = None,
    reorder: bool = True,
    check_no_self_loops: bool = True,
) -> VectorFst:
    """Expand a tid-labeled, self-loop-free graph with self-loop arcs.

    reorder=True (Dan-style): the self-loop is attached to the DESTINATION
    state of each forward transition, all outgoing weights (and final
    weight) of such states are multiplied by (1 - p_self)^self_loop_scale,
    and the self-loop arc gets p_self^self_loop_scale.  Returns a new FST.
    """
    disambig = set(disambig_syms or [])
    num_tids = trans_model.num_transition_ids

    def classify(label: int) -> int:
        if 1 <= label <= num_tids:
            if check_no_self_loops and trans_model.is_self_loop(label):
                raise ValueError("add_self_loops: graph already has self-loops")
            return trans_model.transition_id_to_transition_state(label)
        if label != 0:
            assert label in disambig, f"invalid label {label}"
        return 0

    out = fst.copy()
    if not reorder:
        return _add_self_loops_no_reorder(trans_model, out, self_loop_scale, classify)

    _make_preceding_input_symbols_same_class(out, classify)

    # incoming class per state
    n = out.num_states
    state_in = [-1] * n
    for s in range(n):
        for a in out.arcs[s]:
            c = classify(a.ilabel)
            if state_in[a.nextstate] == -1:
                state_in[a.nextstate] = c
            else:
                assert state_in[a.nextstate] == c
    assert state_in[out.start] in (-1, 0)

    for s in range(n):
        tstate = state_in[s]
        if tstate > 0:
            log_prob = trans_model.get_non_self_loop_log_prob(tstate)
            if out.final[s] != math.inf:
                out.final[s] += -log_prob * self_loop_scale
            for a in out.arcs[s]:
                a.weight += -log_prob * self_loop_scale
            tid = trans_model.self_loop_of(tstate)
            if tid != 0:
                self_log_prob = trans_model.get_transition_log_prob(tid)
                out.add_arc(s, Arc(tid, 0, -self_log_prob * self_loop_scale, s))
    return out


def _make_following_input_symbols_same_class(
    fst: VectorFst, classify: Callable[[int], int]
) -> None:
    """Duplicate states so all outgoing arcs of a state share one class."""
    n = fst.num_states
    out_classes: List[List[int]] = []
    for s in range(n):
        out_classes.append(sorted({classify(a.ilabel) for a in fst.arcs[s]}))

    rep: Dict[Tuple[int, int], int] = {}
    dups: List[Tuple[int, int]] = []
    for s in range(n):
        cls = out_classes[s] or [0]
        rep[(s, cls[0])] = s
        for c in cls[1:]:
            dups.append((s, c))
    for s, c in dups:
        rep[(s, c)] = fst.add_state()
    if not dups:
        return
    # duplicates carry only the outgoing arcs of their class; finality stays
    # on the original (a final state with outgoing arcs of several classes
    # keeps finality where no class is assigned -- mirror of the reference's
    # requirement that final states have class eps or none).
    orig_arcs = [list(fst.arcs[s]) for s in range(n)]
    for s in range(n):
        fst.arcs[s] = [a for a in orig_arcs[s] if classify(a.ilabel) == (out_classes[s] or [0])[0]]
    for s, c in dups:
        d = rep[(s, c)]
        fst.arcs[d] = [Arc(a.ilabel, a.olabel, a.weight, a.nextstate)
                       for a in orig_arcs[s] if classify(a.ilabel) == c]
    # An arc u->s must now go to EVERY class copy of s (fan-out), since the
    # path may continue with any outgoing class.
    for u in range(fst.num_states):
        extra = []
        for a in fst.arcs[u]:
            s = a.nextstate
            if s < n:
                cls = out_classes[s] or [0]
                for c in cls[1:]:
                    extra.append(Arc(a.ilabel, a.olabel, a.weight, rep[(s, c)]))
        fst.arcs[u].extend(extra)


def _add_self_loops_no_reorder(
    trans_model: TransitionModel,
    fst: VectorFst,
    self_loop_scale: float,
    classify: Callable[[int], int],
) -> VectorFst:
    """reorder=False: self-loop attached to the SOURCE state of its arcs."""
    _make_following_input_symbols_same_class(fst, classify)
    for s in range(fst.num_states):
        my_tstate = -1
        for a in fst.arcs[s]:
            c = classify(a.ilabel)
            if my_tstate == -1:
                my_tstate = c
            else:
                assert my_tstate == c
            if my_tstate > 0:
                log_prob = trans_model.get_non_self_loop_log_prob(my_tstate)
                a.weight += -log_prob * self_loop_scale
        if my_tstate not in (-1, 0):
            tid = trans_model.self_loop_of(my_tstate)
            if tid != 0:
                log_prob = trans_model.get_transition_log_prob(tid)
                fst.add_arc(s, Arc(tid, 0, -log_prob * self_loop_scale, s))
    return fst


def modify_graph_for_careful_alignment(fst: VectorFst) -> VectorFst:
    """Concat the graph with a final-prob-stripped copy of itself.

    'Careful' alignment: a path that reaches the end of the graph too early
    and wraps around lands in the stripped copy, which has no final states,
    so wrapped (bad) alignments fail instead of silently succeeding
    (decoder-wrappers.cc:111-140).
    """
    from khg_tpu.fstlib.fst import Arc, concat

    rhs = fst.copy()
    for s in range(rhs.num_states):
        rhs.final[s] = math.inf
    pre_initial = rhs.add_state()
    rhs.add_arc(pre_initial, Arc(0, 0, 0.0, rhs.start))
    rhs.set_start(pre_initial)
    rhs.set_final(pre_initial, 0.0)
    return concat(fst, rhs)


# --------------------------------------------------------- transition probs


def _scaled_transition_log_prob(
    trans_model: TransitionModel,
    tid: int,
    transition_scale: float,
    self_loop_scale: float,
) -> float:
    if transition_scale == self_loop_scale:
        return trans_model.get_transition_log_prob(tid) * transition_scale
    if trans_model.is_self_loop(tid):
        return self_loop_scale * trans_model.get_transition_log_prob(tid)
    tstate = trans_model.transition_id_to_transition_state(tid)
    return (
        self_loop_scale * trans_model.get_non_self_loop_log_prob(tstate)
        + transition_scale
        * trans_model.get_transition_log_prob_ignoring_self_loops(tid)
    )


def add_transition_probs(
    trans_model: TransitionModel,
    fst: VectorFst,
    transition_scale: float,
    self_loop_scale: float,
    disambig_syms: Optional[List[int]] = None,
) -> None:
    """Add scaled transition costs to a tid-labeled graph, in place.

    Used on training graphs compiled with scales of 0/"bare" weights, before
    alignment (gmm_align_compiled passes transition_scale=1.0,
    self_loop_scale=0.1).
    """
    disambig = set(disambig_syms or [])
    num_tids = trans_model.num_transition_ids
    for arcs in fst.arcs:
        for a in arcs:
            if 1 <= a.ilabel <= num_tids:
                a.weight += -_scaled_transition_log_prob(
                    trans_model, a.ilabel, transition_scale, self_loop_scale
                )
            elif a.ilabel != 0:
                assert a.ilabel in disambig, f"invalid symbol {a.ilabel}"
