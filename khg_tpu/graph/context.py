"""Context expansion: phones -> phone-in-context symbols (C of HCLG).

For monophone systems (N=1, P=0) the context transducer is an identity
relabeling: each phone is its own context window, and disambiguation
symbols pass through with negated ilabel-info entries.  This module
produces the CLG FST plus the ilabel_info table that get_h_transducer
consumes.

General N/P triphone context (the on-demand inverse context FST the
reference gets from kaldifst, training-graph-compiler.cc:98-104) is a
planned extension; the interface is shaped for it.
"""

from __future__ import annotations

from typing import List, Tuple

from khg_tpu.fstlib.fst import VectorFst


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
