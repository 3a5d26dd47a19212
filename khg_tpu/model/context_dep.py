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
