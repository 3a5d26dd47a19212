"""Context expansion: phones -> phone-in-context symbols (C of HCLG).

For monophone systems (N=1, P=0) the context transducer is an identity
relabeling.  For wide context (triphone N=3/P=1 etc.) the inverse context
transducer is composed with LG on demand: states are (LG state, last N-1
input symbols); each consumed phone emits the context window of the phone
P positions back (so output is delayed by N-1-P symbols, flushed by the
subsequential '$' symbols the compiler adds to the lexicon when
P != N-1).  Produces the CLG FST plus the ilabel_info table that
get_h_transducer consumes (window entries use 0 for out-of-bounds
positions; disambig entries are [-sym]).

Functional equivalent of kaldifst's InverseContextFst /
ComposeDeterministicOnDemandInverse (training-graph-compiler.cc:98-104).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from khg_tpu.fstlib.fst import Arc, VectorFst


def compose_context_monophone(
    lg: VectorFst,
    phones: List[int],
    disambig_syms: List[int],
) -> Tuple[VectorFst, List[List[int]]]:
    """CLG and ilabel_info for N=1, P=0.

    ilabel_info[0] = [] (epsilon); ilabel_info[p] = [p] for phones;
    ilabel_info[d] = [-d] for disambig symbols (the convention
    get_h_transducer expects for disambig entries).
    """
    max_sym = 0
    if phones:
        max_sym = max(max_sym, max(phones))
    if disambig_syms:
        max_sym = max(max_sym, max(disambig_syms))
    ilabel_info: List[List[int]] = [[] for _ in range(max_sym + 1)]
    for p in phones:
        ilabel_info[p] = [p]
    for d in disambig_syms:
        ilabel_info[d] = [-d]
    # identity relabeling: CLG ilabels == LG ilabels
    return lg.copy(), ilabel_info


def compose_context(
    lg: VectorFst,
    phones: List[int],
    disambig_syms: List[int],
    N: int,
    P: int,
    subsequential_symbol: int,
) -> Tuple[VectorFst, List[List[int]]]:
    """C⁻¹ ∘ LG for general context width N, central position P.

    ``lg`` must already contain the subsequential '$' loop at final states
    when P != N-1 (TrainingGraphCompiler adds it).  Returns (CLG,
    ilabel_info): CLG input labels index ilabel_info, whose entries are
    N-length context windows (0 = out of bounds) or [-d] for disambig d.
    """
    if N == 1 and P == 0:
        return compose_context_monophone(lg, phones, disambig_syms)

    disambig = set(disambig_syms)
    phone_set = set(phones)

    ilabel_info: List[List[int]] = [[]]
    ilabel_of: Dict[tuple, int] = {}

    def window_label(window: tuple) -> int:
        key = ("w",) + window
        if key not in ilabel_of:
            ilabel_of[key] = len(ilabel_info)
            ilabel_info.append(list(window))
        return ilabel_of[key]

    def disambig_label(d: int) -> int:
        key = ("d", d)
        if key not in ilabel_of:
            ilabel_of[key] = len(ilabel_info)
            ilabel_info.append([-d])
        return ilabel_of[key]

    out = VectorFst()
    bos_hist = (0,) * (N - 1)
    state_map: Dict[Tuple[int, tuple, int], int] = {}
    queue: List[Tuple[int, tuple, int]] = []

    def get_state(lg_s: int, hist: tuple, flushed: int) -> int:
        key = (lg_s, hist, flushed)
        if key not in state_map:
            state_map[key] = out.add_state()
            queue.append(key)
        return state_map[key]

    start = get_state(lg.start, bos_hist, 0)
    out.set_start(start)
    needed_flush = N - 1 - P  # number of '$' needed to flush the delay

    qi = 0
    while qi < len(queue):
        lg_s, hist, flushed = queue[qi]
        cur = state_map[(lg_s, hist, flushed)]
        qi += 1

        if lg.final[lg_s] != float("inf") and flushed == needed_flush:
            out.set_final(cur, lg.final[lg_s])

        for a in lg.arcs[lg_s]:
            x = a.ilabel
            if x == 0:
                ns = get_state(a.nextstate, hist, flushed)
                out.add_arc(cur, Arc(0, a.olabel, a.weight, ns))
            elif x in disambig:
                ns = get_state(a.nextstate, hist, flushed)
                out.add_arc(cur, Arc(disambig_label(x), a.olabel, a.weight, ns))
            elif x == subsequential_symbol:
                if flushed >= needed_flush:
                    # extra '$'s (from the lexicon loop) act as plain eps;
                    # drop self-loops outright (they would be eps cycles)
                    if a.nextstate != lg_s:
                        ns = get_state(a.nextstate, hist, flushed)
                        out.add_arc(cur, Arc(0, a.olabel, a.weight, ns))
                    continue
                window = hist + (0,)
                new_hist = window[1:]
                label = window_label(window) if window[P] != 0 else 0
                ns = get_state(a.nextstate, new_hist, flushed + 1)
                out.add_arc(cur, Arc(label, a.olabel, a.weight, ns))
            else:
                assert x in phone_set, f"unexpected symbol {x} in LG"
                window = hist + (x,)
                new_hist = window[1:]
                # the central phone of this window is the one being emitted;
                # 0 means we are still inside the initial delay
                label = window_label(window) if window[P] != 0 else 0
                ns = get_state(a.nextstate, new_hist, flushed)
                out.add_arc(cur, Arc(label, a.olabel, a.weight, ns))
    return out, ilabel_info
