"""Standard HMM topology generators.

Builds the Bakis 3-state topology for non-silence phones and the
5-state ergodic-core silence topology, via the text format (which keeps
us parity-testable against the reference's generate_hmm_topo,
/root/reference/scripts/prepare_lang.py:514-600).
"""

from __future__ import annotations

from typing import List

from khg_tpu.model.topology import HmmTopology


def generate_hmm_topo(
    non_sil_phones: List[int],
    sil_phone: int,
    num_non_sil_states: int = 3,
    num_sil_states: int = 5,
) -> HmmTopology:
    s = "<Topology> "

    s += "<TopologyEntry> <ForPhones> "
    s += " ".join(map(str, non_sil_phones))
    s += " </ForPhones> "
    for i in range(num_non_sil_states):
        s += f"<State> {i} <PdfClass> {i} "
        s += f"<Transition> {i} 0.75 "
        s += f"<Transition> {i + 1} 0.25 "
        s += "</State> "
    s += f"<State> {num_non_sil_states} </State> "
    s += "</TopologyEntry> "

    if num_sil_states > 1:
        transp = 1.0 / (num_sil_states - 1)
        s += "<TopologyEntry> <ForPhones> "
        s += f"{sil_phone} "
        s += "</ForPhones> "
        # First state: transitions to all but the last emitting state.
        s += "<State> 0 <PdfClass> 0 "
        for i in range(num_sil_states - 1):
            s += f"<Transition> {i} {transp} "
        s += "</State> "
        # Central states: fully connected among 1..num_sil_states-1.
        for i in range(1, num_sil_states - 1):
            s += f"<State> {i} <PdfClass> {i} "
            for k in range(1, num_sil_states):
                s += f"<Transition> {k} {transp} "
            s += "</State> "
        # Final emitting state (non-skippable).
        s += f"<State> {num_sil_states - 1} <PdfClass> {num_sil_states - 1} "
        s += f"<Transition> {num_sil_states - 1} 0.75 "
        s += f"<Transition> {num_sil_states} 0.25 "
        s += "</State> "
        s += f"<State> {num_sil_states} </State> "
        s += "</TopologyEntry> "
    else:
        assert num_sil_states == 1, num_sil_states
        s += "<TopologyEntry> <ForPhones> "
        s += f"{sil_phone} "
        s += "</ForPhones> "
        s += "<State> 0 <PdfClass> 0 "
        s += "<Transition> 0 0.75 "
        s += "<Transition> 1 0.25 "
        s += "</State> "
        s += "<State> 1 </State> "
        s += "</TopologyEntry> "

    s += "</Topology>"
    return HmmTopology().read(s)
