"""Acoustic model: one DiagGmm per pdf-id, plus packed device tensors.

The host view is a list of ragged DiagGmms (mutated by the M-step and
split/merge).  ``pack()`` produces the dense, padded tensors consumed by
the device likelihood engine: all pdfs stacked to (num_pdfs, max_mix, D)
with -inf gconsts on padding components so they vanish under logsumexp.

Reference semantics: /root/reference/kaldi-hmm-gmm/csrc/am-diag-gmm.cc,
model-common.cc:29-70 (GetSplitTargets).
"""

from __future__ import annotations

import heapq
import logging
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from khg_tpu.gmm.diag_gmm import DiagGmm

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class PackedGmm:
    """Dense padded model tensors for the device likelihood engine.

    gconsts:       (P, K) float32, -inf on padding
    means_invvars: (P, K, D) float32, 0 on padding
    inv_vars:      (P, K, D) float32, 0 on padding
    num_mix:       (P,) int32 actual component counts
    """

    gconsts: np.ndarray
    means_invvars: np.ndarray
    inv_vars: np.ndarray
    num_mix: np.ndarray

    @property
    def num_pdfs(self) -> int:
        return self.gconsts.shape[0]

    @property
    def max_mix(self) -> int:
        return self.gconsts.shape[1]

    @property
    def dim(self) -> int:
        return self.means_invvars.shape[2]


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class AmDiagGmm:
    def __init__(self):
        self.densities: List[DiagGmm] = []

    # ------------------------------------------------------------ container

    def add_pdf(self, gmm: DiagGmm) -> None:
        if self.densities:
            assert gmm.dim == self.dim
        self.densities.append(gmm.copy())

    def init(self, proto: DiagGmm, num_pdfs: int) -> None:
        self.densities = [proto.copy() for _ in range(num_pdfs)]

    def copy_from_am_diag_gmm(self, other: "AmDiagGmm") -> None:
        self.densities = [g.copy() for g in other.densities]

    def copy(self) -> "AmDiagGmm":
        am = AmDiagGmm()
        am.copy_from_am_diag_gmm(self)
        return am

    def get_pdf(self, pdf_index: int) -> DiagGmm:
        return self.densities[pdf_index]

    @property
    def num_pdfs(self) -> int:
        return len(self.densities)

    @property
    def num_gauss(self) -> int:
        return sum(g.num_gauss for g in self.densities)

    def num_gauss_in_pdf(self, pdf_index: int) -> int:
        return self.densities[pdf_index].num_gauss

    @property
    def dim(self) -> int:
        return self.densities[0].dim

    def compute_gconsts(self) -> int:
        return sum(g.compute_gconsts() for g in self.densities)

    def log_likelihood(self, pdf_index: int, data: np.ndarray) -> float:
        return self.densities[pdf_index].log_likelihood(data)

    # ------------------------------------------------------------ split/merge

    def split_pdf(
        self,
        pdf_index: int,
        target_components: int,
        perturb_factor: float,
        rng: Optional[np.random.Generator] = None,
    ) -> None:
        self.densities[pdf_index].split(target_components, perturb_factor, rng=rng)

    def split_by_count(
        self,
        state_occs: np.ndarray,
        target_components: int,
        perturb_factor: float,
        power: float,
        min_count: float,
        rng: Optional[np.random.Generator] = None,
    ) -> None:
        start = self.num_gauss
        targets = get_split_targets(state_occs, target_components, power, min_count)
        for i, g in enumerate(self.densities):
            if g.num_gauss < targets[i]:
                g.split(targets[i], perturb_factor, rng=rng)
        logger.info(
            "Split %d states: target=%d power=%s min_count=%s, #Gauss %d -> %d",
            self.num_pdfs, target_components, power, min_count, start, self.num_gauss,
        )

    def merge_by_count(
        self,
        state_occs: np.ndarray,
        target_components: int,
        power: float,
        min_count: float,
    ) -> None:
        start = self.num_gauss
        targets = get_split_targets(state_occs, target_components, power, min_count)
        for i, g in enumerate(self.densities):
            target = max(targets[i], 1)
            if g.num_gauss > target:
                g.merge(target)
        logger.info(
            "Merged %d states: target=%d, #Gauss %d -> %d",
            self.num_pdfs, target_components, start, self.num_gauss,
        )

    # ----------------------------------------------------------------- pack

    def pack(self, mix_pad_to: int = 1, dim_pad_to: int = 1) -> PackedGmm:
        """Stack all pdfs into dense padded tensors for the device.

        ``mix_pad_to``/``dim_pad_to`` let callers round the mixture and
        feature axes up (e.g. to multiples of 8/128) so the fused GEMM tiles
        cleanly onto the MXU.  Padding mixture components get gconst=-inf so
        they cannot win the logsumexp; padding feature dims contribute zero
        because both model tensors are zero there (features must be
        zero-padded to match).
        """
        P = self.num_pdfs
        D = self.dim
        kmax = max(g.num_gauss for g in self.densities)
        K = round_up(max(kmax, 1), mix_pad_to)
        Dp = round_up(D, dim_pad_to)

        gconsts = np.full((P, K), -np.inf, dtype=np.float32)
        miv = np.zeros((P, K, Dp), dtype=np.float32)
        iv = np.zeros((P, K, Dp), dtype=np.float32)
        num_mix = np.zeros(P, dtype=np.int32)
        for p, g in enumerate(self.densities):
            if not g.valid_gconsts:
                g.compute_gconsts()
            k = g.num_gauss
            gconsts[p, :k] = g.gconsts
            miv[p, :k, :D] = g.means_invvars
            iv[p, :k, :D] = g.inv_vars
            num_mix[p] = k
        return PackedGmm(gconsts, miv, iv, num_mix)

    # ------------------------------------------------------------- pickling

    def __getstate__(self):
        return {"densities": self.densities}

    def __setstate__(self, state):
        self.densities = state["densities"]


def get_split_targets(
    state_occs: np.ndarray,
    target_components: int,
    power: float,
    min_count: float,
) -> List[int]:
    """Power-of-occupancy allocation of Gaussians to states with a min-count
    guard (priority queue over occ^power / #components)."""
    num_pdfs = len(state_occs)
    # heapq is a min-heap; the reference pops the max of occ/(n+eps).
    heap = []
    for pdf_index in range(num_pdfs):
        occ = float(state_occs[pdf_index]) ** power
        heap.append((-occ / (1 + 1.0e-10), pdf_index, 1, occ))
    heapq.heapify(heap)

    num_gauss = num_pdfs
    while num_gauss < target_components:
        neg_ratio, pdf_index, n, occ = heapq.heappop(heap)
        if occ == 0.0:
            logger.warning(
                "Could not split up to %d due to min-count %s",
                target_components, min_count,
            )
            heapq.heappush(heap, (neg_ratio, pdf_index, n, occ))
            break
        orig_occ = float(state_occs[pdf_index])
        if (n + 1) * min_count >= orig_occ:
            occ = 0.0  # min-count active: freeze this state
        else:
            n += 1
            num_gauss += 1
        heapq.heappush(heap, (-occ / (n + 1.0e-10), pdf_index, n, occ))

    targets = [0] * num_pdfs
    for _, pdf_index, n, _ in heap:
        targets[pdf_index] = n
    return targets
