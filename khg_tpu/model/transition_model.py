"""Transition model: the integer-mapping nexus of the framework.

Maps tuples (phone, hmm-state, forward-pdf, self-loop-pdf) <-> 1-based
transition-states <-> 1-based transition-ids, and stores trainable
transition log-probs.  The tuple sort order and 1-based numbering are THE
compatibility contract for alignments: they must match the reference
exactly (/root/reference/kaldi-hmm-gmm/csrc/transition-model.cc:120-337).

Device code consumes the dense exports (``id2pdf_array``, ``log_probs``)
rather than this class.
"""

from __future__ import annotations

import bisect
import logging
import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from khg_tpu.model.context_dep import ContextDependency
from khg_tpu.model.topology import HmmTopology, K_NO_PDF

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class MleTransitionUpdateConfig:
    floor: float = 0.01
    mincount: float = 5.0
    share_for_pdfs: bool = False


class TransitionModel:
    def __init__(
        self,
        ctx_dep: Optional[ContextDependency] = None,
        hmm_topo: Optional[HmmTopology] = None,
    ):
        if ctx_dep is None and hmm_topo is None:
            return  # for unpickling
        assert ctx_dep is not None and hmm_topo is not None
        self.topo = hmm_topo
        # tuples_[tstate-1] = (phone, hmm_state, forward_pdf, self_loop_pdf)
        self.tuples: List[Tuple[int, int, int, int]] = []
        self._compute_tuples(ctx_dep)
        self._compute_derived()
        self._initialize_probs()
        self._check()

    # ------------------------------------------------------------ construction

    def is_hmm(self) -> bool:
        return self.topo.is_hmm()

    def _compute_tuples(self, ctx_dep: ContextDependency) -> None:
        if self.is_hmm():
            self._compute_tuples_is_hmm(ctx_dep)
        else:
            self._compute_tuples_not_hmm(ctx_dep)
        # This sort defines transition-state (and hence transition-id)
        # numbering; reverse lookup relies on it.
        self.tuples.sort()

    def _compute_tuples_is_hmm(self, ctx_dep: ContextDependency) -> None:
        phones = self.topo.phones
        num_pdf_classes = [-1] * (max(phones) + 1)
        for p in phones:
            num_pdf_classes[p] = self.topo.num_pdf_classes(p)
        pdf_info = ctx_dep.get_pdf_info(phones, num_pdf_classes)

        to_hmm_state_list = {}
        for phone in phones:
            for j, st in enumerate(self.topo.topology_for_phone(phone)):
                if st.forward_pdf_class != K_NO_PDF:
                    to_hmm_state_list.setdefault(
                        (phone, st.forward_pdf_class), []
                    ).append(j)

        for pdf, pairs in enumerate(pdf_info):
            for phone, pdf_class in pairs:
                for hmm_state in to_hmm_state_list[(phone, pdf_class)]:
                    self.tuples.append((phone, hmm_state, pdf, pdf))

    def _compute_tuples_not_hmm(self, ctx_dep: ContextDependency) -> None:
        # Non-'hmm' topologies (e.g. CTC/chain-style with distinct forward
        # and self-loop pdf-classes), tree-general: realizable
        # (forward_pdf, self_loop_pdf) pairs come from the context tree's
        # pair enumeration over all contexts, so N>1 (triphone etc.) trees
        # work.  Mirrors ComputeTuplesNotHmm (transition-model.cc:181-252)
        # including its per-state-occurrence structure, which defines the
        # tuple multiset and hence the numbering contract.
        phones = self.topo.phones
        pdf_class_pairs = {p: [] for p in phones}
        state_lists = {p: {} for p in phones}
        for phone in phones:
            for j, st in enumerate(self.topo.topology_for_phone(phone)):
                if st.forward_pdf_class != K_NO_PDF:
                    pair = (st.forward_pdf_class, st.self_loop_pdf_class)
                    pdf_class_pairs[phone].append(pair)
                    state_lists[phone].setdefault(pair, []).append(j)
        pdf_info = ctx_dep.get_pdf_info_pairs(phones, pdf_class_pairs)
        for phone in phones:
            for j, pair in enumerate(pdf_class_pairs[phone]):
                for hmm_state in state_lists[phone][pair]:
                    for fwd_pdf, slf_pdf in pdf_info[phone][j]:
                        self.tuples.append(
                            (phone, hmm_state, fwd_pdf, slf_pdf)
                        )

    def _compute_derived(self) -> None:
        num_tstates = len(self.tuples)
        # state2id[tstate] = first transition-id of that tstate (1-based);
        # state2id[num_tstates+1] = num_tids + 1.
        self.state2id = [0] * (num_tstates + 2)
        cur_tid = 1
        self.num_pdfs = 0
        for tstate in range(1, num_tstates + 2):
            self.state2id[tstate] = cur_tid
            if tstate <= num_tstates:
                phone, hmm_state, fwd_pdf, slf_pdf = self.tuples[tstate - 1]
                self.num_pdfs = max(self.num_pdfs, fwd_pdf + 1, slf_pdf + 1)
                cur_tid += len(
                    self.topo.topology_for_phone(phone)[hmm_state].transitions
                )

        self.id2state = [0] * cur_tid
        self.id2pdf_id = [0] * cur_tid
        for tstate in range(1, num_tstates + 1):
            for tid in range(self.state2id[tstate], self.state2id[tstate + 1]):
                self.id2state[tid] = tstate
                tup = self.tuples[tstate - 1]
                self.id2pdf_id[tid] = (
                    tup[3] if self.is_self_loop(tid) else tup[2]
                )

    def _initialize_probs(self) -> None:
        n = self.num_transition_ids
        self.log_probs = np.zeros(n + 1, dtype=np.float32)  # 1-based
        for tid in range(1, n + 1):
            tstate = self.id2state[tid]
            tidx = tid - self.state2id[tstate]
            phone, hmm_state, _, _ = self.tuples[tstate - 1]
            prob = self.topo.topology_for_phone(phone)[hmm_state].transitions[tidx][1]
            if prob <= 0.0:
                raise ValueError("Zero transition probability in topology")
            self.log_probs[tid] = math.log(prob)
        self._compute_derived_of_probs()

    def _compute_derived_of_probs(self) -> None:
        n = self.num_transition_states
        self.non_self_loop_log_probs = np.zeros(n + 1, dtype=np.float32)
        for tstate in range(1, n + 1):
            tid = self.self_loop_of(tstate)
            if tid == 0:
                self.non_self_loop_log_probs[tstate] = 0.0
            else:
                non_self_prob = 1.0 - math.exp(self.get_transition_log_prob(tid))
                if non_self_prob <= 0.0:
                    logger.warning("non-self-loop prob is %s", non_self_prob)
                    non_self_prob = 1.0e-10
                self.non_self_loop_log_probs[tstate] = math.log(non_self_prob)

    def _check(self) -> None:
        assert self.num_transition_ids > 0 and self.num_transition_states > 0
        total = sum(
            self.num_transition_indices(ts)
            for ts in range(1, self.num_transition_states + 1)
        )
        assert total == self.num_transition_ids
        assert np.all(self.log_probs[1:] <= 0.0)
        assert np.all(np.isfinite(self.log_probs[1:]))

    # ----------------------------------------------------------------- queries

    @property
    def num_transition_states(self) -> int:
        return len(self.tuples)

    @property
    def num_transition_ids(self) -> int:
        return len(self.id2state) - 1

    @property
    def phones(self) -> List[int]:
        return self.topo.phones

    def get_topo(self) -> HmmTopology:
        return self.topo

    def is_self_loop(self, tid: int) -> bool:
        tstate = self.id2state[tid]
        tidx = tid - self.state2id[tstate]
        phone, hmm_state, _, _ = self.tuples[tstate - 1]
        transitions = self.topo.topology_for_phone(phone)[hmm_state].transitions
        return tidx < len(transitions) and transitions[tidx][0] == hmm_state

    def is_final(self, tid: int) -> bool:
        """True if the transition goes to the topology entry's final state."""
        tstate = self.id2state[tid]
        tidx = tid - self.state2id[tstate]
        phone, hmm_state, _, _ = self.tuples[tstate - 1]
        entry = self.topo.topology_for_phone(phone)
        return entry[hmm_state].transitions[tidx][0] + 1 == len(entry)

    def self_loop_of(self, tstate: int) -> int:
        """Self-loop transition-id of this tstate, or 0 if none."""
        phone, hmm_state, _, _ = self.tuples[tstate - 1]
        transitions = self.topo.topology_for_phone(phone)[hmm_state].transitions
        for tidx, (dst, _) in enumerate(transitions):
            if dst == hmm_state:
                return self.pair_to_transition_id(tstate, tidx)
        return 0

    def pair_to_transition_id(self, tstate: int, tidx: int) -> int:
        assert tidx < self.state2id[tstate + 1] - self.state2id[tstate]
        return self.state2id[tstate] + tidx

    def num_transition_indices(self, tstate: int) -> int:
        return self.state2id[tstate + 1] - self.state2id[tstate]

    def tuple_to_transition_state(
        self, phone: int, hmm_state: int, pdf: int, self_loop_pdf: int
    ) -> int:
        tup = (phone, hmm_state, pdf, self_loop_pdf)
        i = bisect.bisect_left(self.tuples, tup)
        if i == len(self.tuples) or self.tuples[i] != tup:
            raise ValueError(
                "Tuple not found (incompatible tree and model?)"
            )
        return i + 1

    def transition_id_to_transition_state(self, tid: int) -> int:
        return self.id2state[tid]

    def transition_id_to_transition_index(self, tid: int) -> int:
        return tid - self.state2id[self.id2state[tid]]

    def transition_id_to_pdf(self, tid: int) -> int:
        return self.id2pdf_id[tid]

    def transition_id_to_pdf_array(self) -> List[int]:
        return self.id2pdf_id

    def transition_id_to_phone(self, tid: int) -> int:
        return self.tuples[self.id2state[tid] - 1][0]

    def transition_id_to_hmm_state(self, tid: int) -> int:
        return self.tuples[self.id2state[tid] - 1][1]

    def transition_ids_equivalent(self, tid1: int, tid2: int) -> bool:
        return self.id2state[tid1] == self.id2state[tid2]

    def transition_id_is_start_of_phone(self, tid: int) -> bool:
        return self.transition_id_to_hmm_state(tid) == 0

    def transition_state_to_phone(self, tstate: int) -> int:
        return self.tuples[tstate - 1][0]

    def transition_state_to_hmm_state(self, tstate: int) -> int:
        return self.tuples[tstate - 1][1]

    def transition_state_to_forward_pdf(self, tstate: int) -> int:
        return self.tuples[tstate - 1][2]

    def transition_state_to_self_loop_pdf(self, tstate: int) -> int:
        return self.tuples[tstate - 1][3]

    def get_transition_prob(self, tid: int) -> float:
        return float(math.exp(self.log_probs[tid]))

    def get_transition_log_prob(self, tid: int) -> float:
        return float(self.log_probs[tid])

    def get_non_self_loop_log_prob(self, tstate: int) -> float:
        assert tstate != 0
        return float(self.non_self_loop_log_probs[tstate])

    def get_transition_log_prob_ignoring_self_loops(self, tid: int) -> float:
        assert tid != 0 and not self.is_self_loop(tid)
        return float(
            self.log_probs[tid]
            - self.non_self_loop_log_probs[self.id2state[tid]]
        )

    # ------------------------------------------------------------ dense export

    def id2pdf_array(self) -> np.ndarray:
        """(num_tids+1,) int32 device-side map.  Entry 0 (tid 0 = padding)
        is 0, matching the reference's zero-initialized id2pdf_id_[0]
        (transition-model.cc:280); consumers mask padding by frame
        weight/arc cost, never by pdf value."""
        return np.array(self.id2pdf_id, dtype=np.int32)

    # ------------------------------------------------------------------- stats

    def init_stats(self) -> np.ndarray:
        return np.zeros(self.num_transition_ids + 1, dtype=np.float64)

    def accumulate(self, prob: float, tid: int, stats: np.ndarray) -> np.ndarray:
        assert 1 <= tid <= self.num_transition_ids
        stats[tid] += prob
        return stats

    def mle_update(
        self, stats: np.ndarray, cfg: MleTransitionUpdateConfig
    ) -> Tuple[float, float]:
        """MLE update of transition probs.  Returns (objf_impr, count).

        Per-tstate count-normalize with a floor, renormalizing 3 times, as in
        transition-model.cc:657-750 (and MleUpdateShared for share_for_pdfs).
        """
        if cfg.share_for_pdfs:
            return self._mle_update_shared(stats, cfg)
        assert len(stats) == self.num_transition_ids + 1
        count_sum = 0.0
        objf_impr_sum = 0.0
        num_skipped = 0
        num_floored = 0
        for tstate in range(1, self.num_transition_states + 1):
            n = self.num_transition_indices(tstate)
            if n <= 1:
                continue
            tids = [self.pair_to_transition_id(tstate, i) for i in range(n)]
            counts = np.array([stats[tid] for tid in tids], dtype=np.float64)
            tstate_tot = counts.sum()
            count_sum += tstate_tot
            if tstate_tot < cfg.mincount:
                num_skipped += 1
                continue
            old_probs = np.array(
                [self.get_transition_prob(tid) for tid in tids], dtype=np.float32
            )
            new_probs = (counts / tstate_tot).astype(np.float32)
            for _ in range(3):
                new_probs = new_probs / new_probs.sum()
                new_probs = np.maximum(new_probs, cfg.floor)
            num_floored += int(np.sum(new_probs == cfg.floor))
            objf_impr_sum += float(
                np.sum(counts * (np.log(new_probs) - np.log(old_probs)))
            )
            for tid, p in zip(tids, new_probs):
                self.log_probs[tid] = math.log(p)
                assert np.isfinite(self.log_probs[tid])
        logger.info(
            "TransitionModel update: objf change %.6f/frame over %.1f frames; "
            "%d floored, %d skipped",
            objf_impr_sum / max(count_sum, 1e-20),
            count_sum,
            num_floored,
            num_skipped,
        )
        self._compute_derived_of_probs()
        return objf_impr_sum, count_sum

    def _mle_update_shared(
        self, stats: np.ndarray, cfg: MleTransitionUpdateConfig
    ) -> Tuple[float, float]:
        assert len(stats) == self.num_transition_ids + 1
        pdf_to_tstates = {}
        for tstate in range(1, self.num_transition_states + 1):
            pdf_to_tstates.setdefault(
                self.transition_state_to_forward_pdf(tstate), set()
            ).add(tstate)
            if not self.is_hmm():
                pdf_to_tstates.setdefault(
                    self.transition_state_to_self_loop_pdf(tstate), set()
                ).add(tstate)

        count_sum = 0.0
        objf_impr_sum = 0.0
        for pdf in sorted(pdf_to_tstates):
            tstates = sorted(pdf_to_tstates[pdf])
            n = self.num_transition_indices(tstates[0])
            if n <= 1:
                continue
            counts = np.zeros(n, dtype=np.float64)
            for tstate in tstates:
                if self.num_transition_indices(tstate) != n:
                    raise ValueError(
                        "share_for_pdfs requires matching #transition-indices"
                    )
                for tidx in range(n):
                    counts[tidx] += stats[self.pair_to_transition_id(tstate, tidx)]
            pdf_tot = counts.sum()
            count_sum += pdf_tot
            if pdf_tot < cfg.mincount:
                continue
            old_probs = np.array(
                [
                    self.get_transition_prob(self.pair_to_transition_id(tstates[0], i))
                    for i in range(n)
                ],
                dtype=np.float32,
            )
            new_probs = (counts / pdf_tot).astype(np.float32)
            for _ in range(3):
                new_probs = new_probs / new_probs.sum()
                new_probs = np.maximum(new_probs, cfg.floor)
            objf_impr_sum += float(
                np.sum(counts * (np.log(new_probs) - np.log(old_probs)))
            )
            for tstate in tstates:
                for tidx in range(n):
                    tid = self.pair_to_transition_id(tstate, tidx)
                    self.log_probs[tid] = math.log(new_probs[tidx])
        self._compute_derived_of_probs()
        return objf_impr_sum, count_sum

    # ---------------------------------------------------------------- pickling

    def __getstate__(self):
        return {
            "topo": self.topo,
            "tuples": self.tuples,
            "log_probs": self.log_probs,
        }

    def __setstate__(self, state):
        self.topo = state["topo"]
        self.tuples = state["tuples"]
        self._compute_derived()
        self.log_probs = state["log_probs"]
        self._compute_derived_of_probs()
        self._check()


def get_pdfs_for_phones(
    trans_model: TransitionModel, phones: List[int]
) -> Tuple[bool, List[int]]:
    """(is_unique, pdfs seen for these phones).

    is_unique is False if any returned pdf is also used by other phones
    (transition-model.cc:752-785).
    """
    phone_set = set(phones)
    pdfs = set()
    for tstate in range(1, trans_model.num_transition_states + 1):
        if trans_model.transition_state_to_phone(tstate) in phone_set:
            pdfs.add(trans_model.transition_state_to_forward_pdf(tstate))
            pdfs.add(trans_model.transition_state_to_self_loop_pdf(tstate))
    is_unique = True
    for tstate in range(1, trans_model.num_transition_states + 1):
        if trans_model.transition_state_to_phone(tstate) not in phone_set and (
            trans_model.transition_state_to_forward_pdf(tstate) in pdfs
            or trans_model.transition_state_to_self_loop_pdf(tstate) in pdfs
        ):
            is_unique = False
            break
    return is_unique, sorted(pdfs)
