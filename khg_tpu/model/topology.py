"""HMM topology prototypes.

Host-side description of per-phone HMM structure.  Parses and writes the
Kaldi text topology format so artifacts interoperate with the reference
(reference semantics: /root/reference/kaldi-hmm-gmm/csrc/hmm-topology.cc:23-494,
hmm-topology.h:74-182).

The device-side code never sees this class directly: the TransitionModel
exports dense integer/float arrays derived from it.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

K_NO_PDF = -1


@dataclass
class HmmState:
    """One prototype HMM state.

    ``transitions`` is a list of (next_state, default_prob) indexed by
    transition-index.  ``forward_pdf_class``/``self_loop_pdf_class`` are both
    ``K_NO_PDF`` for non-emitting states.
    """

    forward_pdf_class: int = K_NO_PDF
    self_loop_pdf_class: int = K_NO_PDF
    transitions: List[Tuple[int, float]] = field(default_factory=list)


TopologyEntry = List[HmmState]


class HmmTopology:
    """Set of per-phone HMM prototypes.

    phones:    sorted unique list of phone ids (> 0) covered.
    phone2idx: phone id -> index into entries (-1 if absent).
    entries:   list of TopologyEntry.
    """

    def __init__(self):
        self.phones: List[int] = []
        self.phone2idx: List[int] = []
        self.entries: List[TopologyEntry] = []

    # ------------------------------------------------------------------ I/O

    def read(self, text: str) -> "HmmTopology":
        """Parse the Kaldi text topology format."""
        toks = text.split()
        pos = 0

        def next_tok() -> str:
            nonlocal pos
            if pos >= len(toks):
                raise ValueError("Unexpected end of topology text")
            t = toks[pos]
            pos += 1
            return t

        if next_tok() != "<Topology>":
            raise ValueError("Expected <Topology>")

        self.phones, self.phone2idx, self.entries = [], [], []

        while True:
            tok = next_tok()
            if tok == "</Topology>":
                break
            if tok != "<TopologyEntry>":
                raise ValueError(f"Expected <TopologyEntry>, got {tok}")
            if next_tok() != "<ForPhones>":
                raise ValueError("Expected <ForPhones>")
            phones: List[int] = []
            while True:
                t = next_tok()
                if t == "</ForPhones>":
                    break
                phones.append(int(t))

            entry: TopologyEntry = []
            tok = next_tok()
            while tok != "</TopologyEntry>":
                if tok != "<State>":
                    raise ValueError(f"Expected </TopologyEntry> or <State>, got {tok}")
                state = int(next_tok())
                if state != len(entry):
                    raise ValueError(
                        f"States must be in order from zero: expected {len(entry)}, got {state}"
                    )
                tok = next_tok()
                fwd = K_NO_PDF
                slf = K_NO_PDF
                if tok == "<PdfClass>":
                    fwd = int(next_tok())
                    slf = fwd
                    tok = next_tok()
                    if tok == "<SelfLoopPdfClass>":
                        raise ValueError(
                            "Use <PdfClass> or <ForwardPdfClass>/<SelfLoopPdfClass> pair"
                        )
                elif tok == "<ForwardPdfClass>":
                    fwd = int(next_tok())
                    tok = next_tok()
                    if tok != "<SelfLoopPdfClass>":
                        raise ValueError("Expected <SelfLoopPdfClass>")
                    slf = int(next_tok())
                    tok = next_tok()
                st = HmmState(fwd, slf)
                while tok == "<Transition>":
                    dst = int(next_tok())
                    prob = float(next_tok())
                    st.transitions.append((dst, prob))
                    tok = next_tok()
                if tok != "</State>":
                    raise ValueError(f"Expected </State>, got {tok}")
                entry.append(st)
                tok = next_tok()

            my_index = len(self.entries)
            self.entries.append(entry)
            for phone in phones:
                if phone <= 0:
                    raise ValueError("Phones must be > 0")
                if len(self.phone2idx) <= phone:
                    self.phone2idx.extend([-1] * (phone + 1 - len(self.phone2idx)))
                if self.phone2idx[phone] != -1:
                    raise ValueError(f"Phone {phone} appears in multiple topology entries")
                self.phone2idx[phone] = my_index
                self.phones.append(phone)

        self.phones.sort()
        if len(set(self.phones)) != len(self.phones):
            raise ValueError("Duplicate phones in topology")
        self.check()
        return self

    def write(self) -> str:
        """Emit the Kaldi text topology format (round-trips through read)."""
        out = io.StringIO()
        is_hmm = self.is_hmm()
        out.write("<Topology> \n")
        for i, entry in enumerate(self.entries):
            out.write("<TopologyEntry> \n<ForPhones> \n")
            out.write(
                " ".join(str(p) for p in range(len(self.phone2idx)) if self.phone2idx[p] == i)
            )
            out.write(" \n</ForPhones> \n")
            for j, st in enumerate(entry):
                out.write(f"<State> {j} ")
                if st.forward_pdf_class != K_NO_PDF:
                    if is_hmm:
                        out.write(f"<PdfClass> {st.forward_pdf_class} ")
                    else:
                        out.write(
                            f"<ForwardPdfClass> {st.forward_pdf_class} "
                            f"<SelfLoopPdfClass> {st.self_loop_pdf_class} "
                        )
                for dst, prob in st.transitions:
                    out.write(f"<Transition> {dst} {prob} ")
                out.write("</State> \n")
            out.write("</TopologyEntry> \n")
        out.write("</Topology> \n")
        return out.getvalue()

    # --------------------------------------------------------------- queries

    def is_hmm(self) -> bool:
        """True when every state's forward and self-loop pdf-classes agree."""
        for phone in self.phones:
            for st in self.topology_for_phone(phone):
                if st.forward_pdf_class != st.self_loop_pdf_class:
                    return False
        return True

    def topology_for_phone(self, phone: int) -> TopologyEntry:
        if phone >= len(self.phone2idx) or self.phone2idx[phone] == -1:
            raise ValueError(f"Phone {phone} not covered by the topology")
        return self.entries[self.phone2idx[phone]]

    def num_pdf_classes(self, phone: int) -> int:
        entry = self.topology_for_phone(phone)
        m = 0
        for st in entry:
            m = max(m, st.forward_pdf_class, st.self_loop_pdf_class)
        return m + 1

    def get_phone_to_num_pdf_classes(self) -> List[int]:
        """Vector indexed by phone id: number of pdf-classes (-1 if absent)."""
        ans = [-1] * (self.phones[-1] + 1)
        for p in self.phones:
            ans[p] = self.num_pdf_classes(p)
        return ans

    def min_length(self, phone: int) -> int:
        """Minimum number of frames needed to traverse this phone's HMM."""
        entry = self.topology_for_phone(phone)
        inf = float("inf")
        min_len = [inf] * len(entry)
        min_len[0] = 0 if entry[0].forward_pdf_class == K_NO_PDF else 1
        changed = True
        while changed:
            changed = False
            for s, st in enumerate(entry):
                if min_len[s] == inf:
                    continue
                for nxt, _ in st.transitions:
                    cand = min_len[s] + (
                        0 if entry[nxt].forward_pdf_class == K_NO_PDF else 1
                    )
                    if cand < min_len[nxt]:
                        min_len[nxt] = cand
                        if nxt < s:
                            changed = True
        assert min_len[-1] != inf
        return int(min_len[-1])

    # ----------------------------------------------------------------- check

    def check(self) -> None:
        if not self.entries or not self.phones or not self.phone2idx:
            raise ValueError("Empty HmmTopology")
        seen = [False] * len(self.entries)
        for phone in self.phones:
            if phone >= len(self.phone2idx) or self.phone2idx[phone] >= len(self.entries):
                raise ValueError("Phone has no valid topology index")
            seen[self.phone2idx[phone]] = True
        for i, entry in enumerate(self.entries):
            if not seen[i]:
                raise ValueError("Topology entry with no corresponding phones")
            num_states = len(entry)
            if num_states <= 1:
                raise ValueError("Topology entry must have at least two states")
            if entry[-1].transitions:
                raise ValueError("Last state must have no transitions")
            if entry[-1].forward_pdf_class != K_NO_PDF:
                raise ValueError("Last state must be non-emitting")
            has_trans_in = [False] * num_states
            seen_pdf_classes = []
            for j, st in enumerate(entry):
                tot_prob = 0.0
                if st.forward_pdf_class != K_NO_PDF:
                    seen_pdf_classes.append(st.forward_pdf_class)
                    seen_pdf_classes.append(st.self_loop_pdf_class)
                seen_dst = set()
                for dst, prob in st.transitions:
                    tot_prob += prob
                    if prob <= 0.0:
                        raise ValueError("Non-positive transition probability")
                    if dst == num_states - 1 and st.forward_pdf_class == K_NO_PDF:
                        raise ValueError(
                            "Non-emitting state may not transition to the final state"
                        )
                    if dst < 0 or dst >= num_states:
                        raise ValueError(f"Invalid destination state {dst}")
                    if dst in seen_dst:
                        raise ValueError("Duplicate transition")
                    if dst == j and st.self_loop_pdf_class == K_NO_PDF:
                        raise ValueError("Non-emitting states cannot have self-loops")
                    seen_dst.add(dst)
                    has_trans_in[dst] = True
                if j + 1 < num_states:
                    if tot_prob <= 0.0:
                        raise ValueError("Non-final state must have outgoing transitions")
                else:
                    if tot_prob != 0.0:
                        raise ValueError("Final state must have no transitions")
            for j in range(1, num_states):
                if not has_trans_in[j]:
                    raise ValueError(f"State {j} has no input transitions")
            classes = sorted(set(seen_pdf_classes))
            if classes[0] != 0 or classes[-1] != len(classes) - 1:
                raise ValueError("pdf-classes must be contiguous and start from zero")

    # ------------------------------------------------------------- utilities

    def __eq__(self, other) -> bool:
        if not isinstance(other, HmmTopology):
            return NotImplemented
        return (
            self.phones == other.phones
            and self.phone2idx == other.phone2idx
            and self.entries == other.entries
        )

    def __getstate__(self):
        return {"text": self.write()}

    def __setstate__(self, state):
        self.__init__()
        self.read(state["text"])
