"""Lattice-generating decoding.

Produces a pruned state-level lattice: all decoding paths whose cost is
within ``lattice_beam`` of the best path, with graph and acoustic costs
kept separate on the arcs (the information Kaldi's LatticeFasterDecoder
keeps, lattice-faster-decoder.cc).  The construction is offline-equivalent
to Kaldi's online pruning: run the beam DP keeping all links, then
alpha/beta-prune tokens and links against best_cost + lattice_beam —
the same surviving set PruneActiveTokens converges to, computed in one
backward sweep.

The lattice is itself a VectorFst (ilabels = tids, olabels = words,
weight = graph + acoustic cost), plus a parallel acoustic-cost table so
costs can be re-scaled after the fact.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from khg_tpu.fstlib.fst import Arc, VectorFst, shortest_path

INF = math.inf


@dataclass(frozen=True)
class LatticeFasterDecoderConfig:
    beam: float = 16.0
    max_active: int = 2**31 - 1
    min_active: int = 200
    lattice_beam: float = 10.0
    prune_interval: int = 25  # kept for API parity; pruning here is offline


@dataclass
class Lattice:
    """State-level lattice with separated costs.

    fst:  VectorFst, arc weight = graph_cost + acoustic_cost
    acoustic_costs: per (state, arc-index) acoustic parts, aligned with
        fst.arcs (final acoustic cost is zero).
    """

    fst: VectorFst
    acoustic_costs: List[List[float]]

    def best_path(self) -> Optional[Tuple[List[int], List[int], float]]:
        """(tids, words, total_cost) of the lattice's best path."""
        return shortest_path(self.fst)

    @property
    def num_states(self) -> int:
        return self.fst.num_states


class LatticeFasterDecoder:
    def __init__(
        self,
        fst: VectorFst,
        config: LatticeFasterDecoderConfig = LatticeFasterDecoderConfig(),
    ):
        self.fst = fst
        self.config = config

    def decode(
        self,
        loglikes: np.ndarray,  # (T, num_pdfs)
        id2pdf: np.ndarray,
        acoustic_scale: float = 1.0,
        allow_partial: bool = True,
    ) -> Optional[Lattice]:
        fst = self.fst
        cfg = self.config
        num_tids = len(id2pdf) - 1
        T = loglikes.shape[0]
        ac = -acoustic_scale * loglikes

        # tokens[t] : dict state -> best cost arriving with t frames consumed
        # links: (t_src, s_src, t_dst, s_dst, ilabel, olabel, graph_c, ac_c)
        tokens: List[Dict[int, float]] = [dict() for _ in range(T + 1)]
        links: List[Tuple[int, int, int, int, int, int, float, float]] = []

        def eps_expand(t: int, cutoff: float) -> None:
            queue = list(tokens[t].keys())
            while queue:
                s = queue.pop()
                cost = tokens[t].get(s, INF)
                if cost > cutoff:
                    continue
                for a in fst.arcs[s]:
                    if a.ilabel != 0:
                        continue
                    nc = cost + a.weight
                    if nc > cutoff:
                        continue
                    links.append((t, s, t, a.nextstate, 0, a.olabel, a.weight, 0.0))
                    if nc < tokens[t].get(a.nextstate, INF):
                        tokens[t][a.nextstate] = nc
                        queue.append(a.nextstate)

        tokens[0][fst.start] = 0.0
        eps_expand(0, cfg.beam)
        for t in range(T):
            if not tokens[t]:
                return None
            costs = np.array(list(tokens[t].values()))
            best = float(costs.min())
            cutoff = best + cfg.beam
            if cfg.max_active < len(costs):
                k = cfg.max_active
                cutoff = min(cutoff, float(np.partition(costs, k - 1)[k - 1]))
            for s, cost in list(tokens[t].items()):
                if cost > cutoff:
                    continue
                for a in fst.arcs[s]:
                    if a.ilabel == 0:
                        continue
                    ac_cost = float(ac[t, id2pdf[a.ilabel]])
                    nc = cost + a.weight + ac_cost
                    links.append(
                        (t, s, t + 1, a.nextstate, a.ilabel, a.olabel,
                         a.weight, ac_cost)
                    )
                    if nc < tokens[t + 1].get(a.nextstate, INF):
                        tokens[t + 1][a.nextstate] = nc
            if not tokens[t + 1]:
                return None
            nbest = min(tokens[t + 1].values())
            eps_expand(t + 1, nbest + cfg.beam)

        # final costs
        finals = {
            s: fst.final[s]
            for s in tokens[T]
            if fst.final[s] != INF
        }
        partial = not finals
        if partial:
            if not allow_partial:
                return None
            finals = {s: 0.0 for s in tokens[T]}

        # ---- alpha (already have best forward costs in tokens) and beta
        beta: List[Dict[int, float]] = [dict() for _ in range(T + 1)]
        for s, fw in finals.items():
            beta[T][s] = fw
        # Relax links backward to a fixpoint: one reversed sweep handles the
        # frame-major order; within-frame epsilon chains may need extra
        # sweeps (their append order is exploration order, not topological).
        for _ in range(1 + len(links)):
            changed = False
            for (t0, s0, t1, s1, il, ol, gc, acc) in reversed(links):
                b = beta[t1].get(s1, INF)
                if b == INF:
                    continue
                cand = gc + acc + b
                if cand < beta[t0].get(s0, INF) - 1e-12:
                    beta[t0][s0] = cand
                    changed = True
            if not changed:
                break

        best_total = beta[0].get(fst.start, INF)
        if best_total == INF:
            return None
        keep_cutoff = best_total + cfg.lattice_beam

        # ---- build the pruned lattice over surviving (t, state) tokens
        out = VectorFst()
        acoustic_costs: List[List[float]] = []
        state_map: Dict[Tuple[int, int], int] = {}

        def get_state(t: int, s: int) -> int:
            key = (t, s)
            if key not in state_map:
                state_map[key] = out.add_state()
                acoustic_costs.append([])
            return state_map[key]

        def surviving(t, s):
            a = tokens[t].get(s, INF)
            b = beta[t].get(s, INF)
            return a + b <= keep_cutoff + 1e-6

        for (t0, s0, t1, s1, il, ol, gc, acc) in links:
            a0 = tokens[t0].get(s0, INF)
            b1 = beta[t1].get(s1, INF)
            if a0 == INF or b1 == INF:
                continue
            if a0 + gc + acc + b1 > keep_cutoff + 1e-6:
                continue
            src = get_state(t0, s0)
            dst = get_state(t1, s1)
            out.add_arc(src, Arc(il, ol, gc + acc, dst))
            acoustic_costs[src].append(acc)
        if (0, fst.start) not in state_map:
            return None
        out.set_start(state_map[(0, fst.start)])
        for s, fw in finals.items():
            if surviving(T, s) and (T, s) in state_map:
                out.set_final(state_map[(T, s)], fw)
        return Lattice(out, acoustic_costs)


class LatticeSimpleDecoder(LatticeFasterDecoder):
    """Unpruned-during-search variant (didactic oracle): beam = inf,
    lattice pruning still applies at extraction."""

    def __init__(self, fst: VectorFst, config: LatticeFasterDecoderConfig = LatticeFasterDecoderConfig()):
        cfg = LatticeFasterDecoderConfig(
            beam=float("inf"),
            max_active=2**31 - 1,
            min_active=0,
            lattice_beam=config.lattice_beam,
        )
        super().__init__(fst, cfg)


def decode_utterance_lattice_faster(
    decoder: LatticeFasterDecoder,
    loglikes: np.ndarray,
    id2pdf: np.ndarray,
    acoustic_scale: float = 1.0,
    allow_partial: bool = True,
) -> Tuple[bool, List[int], List[int], float]:
    """(succeeded, alignment tids, words, log-like).

    log-like = -(total cost) as in DecodeUtteranceLatticeFaster
    (decoder-wrappers.cc:186-224).
    """
    lat = decoder.decode(
        loglikes, id2pdf, acoustic_scale=acoustic_scale,
        allow_partial=allow_partial,
    )
    if lat is None:
        return False, [], [], 0.0
    bp = lat.best_path()
    if bp is None:
        return False, [], [], 0.0
    tids, words, cost = bp
    return True, tids, words, -cost
