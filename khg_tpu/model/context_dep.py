"""Phonetic context dependency (decision tree wrapper).

Maps a phone-in-context window plus pdf-class to a pdf-id via an EventMap
tree.  The monophone builders reproduce the reference's pdf numbering
exactly (pdf-ids leak into alignments, so the recursion order matters).

Reference semantics: /root/reference/kaldi-hmm-gmm/csrc/context-dep.cc,
context-dep.h:42-145.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from khg_tpu.model.event_map import (
    EventMap,
    EventType,
    K_PDF_CLASS,
    get_stub_map,
)


class ContextDependency:
    """N/P context window + EventMap -> pdf-id."""

    def __init__(self, N: int, P: int, to_pdf: EventMap):
        self.N = N
        self.P = P
        self.to_pdf = to_pdf

    @property
    def context_width(self) -> int:
        return self.N

    @property
    def central_position(self) -> int:
        return self.P

    @property
    def num_pdfs(self) -> int:
        return self.to_pdf.max_result() + 1

    def compute(self, phone_window: List[int], pdf_class: int) -> Optional[int]:
        """pdf-id for this context window and pdf-class, or None."""
        assert len(phone_window) == self.N
        event: EventType = [(K_PDF_CLASS, pdf_class)]
        for i, phone in enumerate(phone_window):
            assert phone >= 0
            event.append((i, phone))
        # K_PDF_CLASS == -1 < 0 keeps the event sorted by key.
        return self.to_pdf.map(event)

    def get_pdf_info(
        self, phones: List[int], num_pdf_classes: List[int]
    ) -> List[List[Tuple[int, int]]]:
        """For each pdf-id, the sorted list of (phone, pdf_class) mapping to it.

        Mirrors context-dep.cc GetPdfInfo (the IsHmm variant), which queries
        the tree with only the central-phone key set and collects all
        reachable answers.
        """
        pdf_info: List[List[Tuple[int, int]]] = [[] for _ in range(self.num_pdfs)]
        for phone in phones:
            length = num_pdf_classes[phone]
            for pos in range(length):
                event: EventType = sorted([(self.P, phone), (K_PDF_CLASS, pos)])
                pdfs: List[int] = []
                self.to_pdf.multi_map(event, pdfs)
                for pdf in sorted(set(pdfs)):
                    pdf_info[pdf].append((phone, pos))
        for lst in pdf_info:
            lst.sort()
        return pdf_info

    def enumerate_pairs(
        self,
        phones: List[int],
        self_loop_pdf_class: int,
        forward_pdf_class: int,
        phone_window: List[int],
        pairs: set,
    ) -> None:
        """All (forward_pdf, self_loop_pdf) pairs reachable for this
        (possibly partially filled) context window.

        Positions holding -1 are unconstrained; 0 in a non-central
        position means "no phone here" (BOS/EOS).  When both the
        forward and self-loop queries are ambiguous (the tree splits on
        an unfilled position), the window is refined one position at a
        time — the unfilled slot nearest the central position — over
        {0} + phones, so only pairs that co-occur for some actual
        context survive (a plain cross product would invent pairs).
        Mirrors context-dep.cc EnumeratePairs (context-dep.cc:85-163).
        """

        def query(pdf_class: int) -> List[int]:
            event: EventType = [
                (i, ph) for i, ph in enumerate(phone_window) if ph >= 0
            ]
            event.append((K_PDF_CLASS, pdf_class))
            event.sort()
            out: List[int] = []
            self.to_pdf.multi_map(event, out)
            return sorted(set(out))

        forward_pdfs = query(forward_pdf_class)
        if self_loop_pdf_class < 0:
            # no self-loop on this state: pair with the -1 sentinel
            pairs.update((f, -1) for f in forward_pdfs)
            return
        self_loop_pdfs = query(self_loop_pdf_class)
        if len(forward_pdfs) == 1 or len(self_loop_pdfs) == 1:
            pairs.update(
                (f, s) for f in forward_pdfs for s in self_loop_pdfs
            )
            return
        # refine the unfilled position closest to the central phone
        position, min_dist = 0, self.N - 1
        for i in range(self.N):
            dist = abs(self.P - i)
            if phone_window[i] == -1 and dist < min_dist:
                position, min_dist = i, dist
        assert min_dist < self.N and position != self.P
        window = list(phone_window)
        for value in [0] + list(phones):
            window[position] = value
            self.enumerate_pairs(
                phones, self_loop_pdf_class, forward_pdf_class, window,
                pairs,
            )

    def get_pdf_info_pairs(
        self,
        phones: List[int],
        pdf_class_pairs,  # phone -> [(forward_pdf_class, self_loop_pdf_class)]
    ):
        """For each phone and each of its (forward, self-loop) pdf-class
        pairs, the sorted list of realizable (forward_pdf, self_loop_pdf)
        pairs over all contexts.  Mirrors the pairs overload of
        context-dep.cc GetPdfInfo (context-dep.cc:210-239); used by
        ComputeTuplesNotHmm-style tuple enumeration for non-HMM
        topologies with N>1 trees.
        """
        pdf_info = {phone: [] for phone in phones}
        for phone in phones:
            for fwd_class, slf_class in pdf_class_pairs[phone]:
                window = [-1] * self.N
                window[self.P] = phone
                pairs: set = set()
                self.enumerate_pairs(
                    phones, slf_class, fwd_class, window, pairs
                )
                pdf_info[phone].append(sorted(pairs))
        return pdf_info

    def __getstate__(self):
        # The EventMap classes are plain Python objects; default pickling of
        # the tree works, but keep the signature explicit for stability.
        return {"N": self.N, "P": self.P, "to_pdf": self.to_pdf}

    def __setstate__(self, state):
        self.__init__(state["N"], state["P"], state["to_pdf"])


def monophone_context_dependency(
    phones: List[int], phone2num_pdf_classes: List[int]
) -> ContextDependency:
    """One pdf per (phone, pdf-class); numbering follows the stub-map order."""
    phone_sets = [[p] for p in phones]
    share_roots = [False] * len(phones)
    num_leaves = [0]
    pdf_map = get_stub_map(0, phone_sets, phone2num_pdf_classes, share_roots, num_leaves)
    return ContextDependency(N=1, P=0, to_pdf=pdf_map)


def monophone_context_dependency_shared(
    phone_sets: List[List[int]], phone2num_pdf_classes: List[int]
) -> ContextDependency:
    """Like monophone_context_dependency but phones in a set share pdfs."""
    share_roots = [False] * len(phone_sets)
    num_leaves = [0]
    pdf_map = get_stub_map(0, phone_sets, phone2num_pdf_classes, share_roots, num_leaves)
    return ContextDependency(N=1, P=0, to_pdf=pdf_map)
