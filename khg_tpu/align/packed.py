"""Packing FST training graphs into dense tensors for the device DP.

The device Viterbi/forward-backward works on an incoming-arc table padded
to the maximum in-degree M:

    in_src[s, m], in_tid[s, m], in_pdf[s, m], in_cost[s, m]

Input-epsilon arcs (from disambiguation-symbol removal etc.) cannot be
traversed frame-synchronously, so they are absorbed on the host: each
packed arc is (epsilon path) + (one emitting arc), with the epsilon path
cost folded in; start and final costs likewise close over epsilons.  The
alignment (one tid per frame) is exactly the FST path's input-label
sequence, since only emitting arcs carry labels.

This replaces the reference's pointer-chasing beam decoder state
(faster-decoder.cc token lists) with static-shape tensors XLA can tile.
"""

from __future__ import annotations

import heapq
import math
from dataclasses import dataclass
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from khg_tpu.fstlib.fst import VectorFst

BIG = np.float32(1.0e30)  # finite stand-in for +inf (inf poisons arithmetic)


@dataclass
class PackedGraph:
    """Dense per-utterance graph tensors (numpy, host side).

    Incoming-arc table (for forward passes / Viterbi):
      in_src:  (S, M) int32 source state of each incoming arc (0 padding)
      in_tid:  (S, M) int32 transition-id (0 padding)
      in_pdf:  (S, M) int32 pdf-id of the tid (0 padding)
      in_cost: (S, M) float32 graph cost incl. absorbed eps prefix (BIG pad)
    Outgoing-arc table (same effective arcs grouped by source, for the
    backward pass of Baum-Welch):
      out_dst/out_tid/out_pdf/out_cost: (S, Mo)
    init_cost:  (S,) float32 cost from the start state via eps paths
    final_cost: (S,) float32 cost to finality via eps paths
    """

    in_src: np.ndarray
    in_tid: np.ndarray
    in_pdf: np.ndarray
    in_cost: np.ndarray
    out_dst: np.ndarray
    out_tid: np.ndarray
    out_pdf: np.ndarray
    out_cost: np.ndarray
    init_cost: np.ndarray
    final_cost: np.ndarray
    # Log-semiring views, present ONLY when the graph has parallel
    # input-eps paths (so tropical min != log-add).  The sum-over-paths
    # semantics of forward-backward requires these; Viterbi uses the
    # tropical arrays above.  None means the tropical arrays are exact
    # in both semirings.
    in_cost_log: Optional[np.ndarray] = None
    out_cost_log: Optional[np.ndarray] = None
    final_cost_log: Optional[np.ndarray] = None

    @property
    def num_states(self) -> int:
        return self.in_src.shape[0]

    @property
    def max_in_degree(self) -> int:
        return self.in_src.shape[1]

    @property
    def max_out_degree(self) -> int:
        return self.out_dst.shape[1]


class BatchedGraphs(NamedTuple):
    """Batch-stacked PackedGraphs (leading axis B), device-ready."""

    in_src: np.ndarray
    in_tid: np.ndarray
    in_pdf: np.ndarray
    in_cost: np.ndarray
    out_dst: np.ndarray
    out_tid: np.ndarray
    out_pdf: np.ndarray
    out_cost: np.ndarray
    init_cost: np.ndarray
    final_cost: np.ndarray


def _log_add_cost(c1: float, c2: float) -> float:
    """-log(exp(-c1) + exp(-c2)), stable (costs are -log probs)."""
    lo, hi = (c1, c2) if c1 <= c2 else (c2, c1)
    return lo - math.log1p(math.exp(lo - hi))


def _eps_arcs(fst: VectorFst) -> List[List[Tuple[int, float]]]:
    n = fst.num_states
    eps: List[List[Tuple[int, float]]] = [[] for _ in range(n)]
    for s in range(n):
        for a in fst.arcs[s]:
            if a.ilabel == 0:
                eps[s].append((a.nextstate, a.weight))
    return eps


def _eps_closure_costs(fst: VectorFst) -> List[Dict[int, float]]:
    """closure[s] = {t: min cost over input-eps paths s->t} (includes s:0)."""
    n = fst.num_states
    eps_arcs = _eps_arcs(fst)
    closure: List[Dict[int, float]] = []
    for s in range(n):
        dist = {s: 0.0}
        heap = [(0.0, s)]
        while heap:
            d, u = heapq.heappop(heap)
            if d > dist.get(u, math.inf):
                continue
            for v, w in eps_arcs[u]:
                nd = d + w
                if nd < dist.get(v, math.inf) - 1e-12:
                    dist[v] = nd
                    heapq.heappush(heap, (nd, v))
        closure.append(dist)
    return closure


def _eps_closure_costs_log(fst: VectorFst) -> Optional[List[Dict[int, float]]]:
    """Log-semiring closure: parallel eps paths s->t log-add.

    Exact for the forward-backward (sum-over-paths) semantics, where
    the tropical closure's min is only a lower bound.  Requires the
    input-eps subgraph to be acyclic (true for determinized training
    graphs; an eps cycle would make the path sum a geometric series) —
    returns None on a cycle so callers fall back to tropical.
    """
    n = fst.num_states
    eps_arcs = _eps_arcs(fst)
    # Kahn topological order of the eps subgraph
    indeg = [0] * n
    for s in range(n):
        for v, _ in eps_arcs[s]:
            indeg[v] += 1
    order = [s for s in range(n) if indeg[s] == 0]
    head = 0
    while head < len(order):
        u = order[head]
        head += 1
        for v, _ in eps_arcs[u]:
            indeg[v] -= 1
            if indeg[v] == 0:
                order.append(v)
    if len(order) < n:
        return None  # eps cycle
    pos = {s: i for i, s in enumerate(order)}
    closure: List[Dict[int, float]] = [dict() for _ in range(n)]
    for s in range(n):
        dist = {s: 0.0}
        for u in order[pos[s]:]:
            du = dist.get(u)
            if du is None:
                continue
            for v, w in eps_arcs[u]:
                nd = du + w
                dist[v] = nd if v not in dist else _log_add_cost(dist[v], nd)
        closure[s] = dist
    return closure


def pack_graph(
    fst: VectorFst,
    id2pdf: np.ndarray,
    min_in_degree_pad: int = 1,
) -> PackedGraph:
    """Pack one compiled training graph.

    ``id2pdf`` is TransitionModel.id2pdf_array() ((num_tids+1,) int32).
    """
    n = fst.num_states
    assert fst.start != -1
    closure = _eps_closure_costs(fst)
    # Log-semiring closure, only when some state pair has parallel eps
    # paths (otherwise the two closures coincide and we skip the work).
    closure_log = None
    if any(len(fst.arcs[s]) and any(a.ilabel == 0 for a in fst.arcs[s])
           for s in range(n)):
        cl = _eps_closure_costs_log(fst)
        if cl is not None and any(
            abs(cl[s][t] - closure[s][t]) > 1e-9
            for s in range(n) for t in cl[s]
        ):
            closure_log = cl

    # Initial mass sits ONLY at the start state: epsilon prefixes are
    # absorbed into the composite arcs below, and placing closure mass at
    # every eps-reachable state as well would double-count first-frame
    # paths under the sum semiring (forward-backward).
    init_cost = np.full(n, BIG, dtype=np.float32)
    init_cost[fst.start] = 0.0
    final_cost = np.full(n, BIG, dtype=np.float32)
    final_cost_log = np.full(n, BIG, dtype=np.float32)
    for s in range(n):
        best = math.inf
        blog = math.inf
        cl_log = closure_log[s] if closure_log is not None else closure[s]
        for t, d in closure[s].items():
            if fst.final[t] != math.inf:
                best = min(best, d + fst.final[t])
        for t, d in cl_log.items():
            if fst.final[t] != math.inf:
                c = d + fst.final[t]
                blog = c if blog == math.inf else _log_add_cost(blog, c)
        if best != math.inf:
            final_cost[s] = best
            final_cost_log[s] = blog

    # Effective emitting arcs (eps prefix + emitting arc), deduped per
    # (src, tid).  Parallel paths to the same (src, tid) slot combine
    # with min in the tropical semiring (Viterbi: best path) and with
    # log-add in the log semiring (forward-backward: sum over paths);
    # both are tracked and the log arrays are materialized only if they
    # differ.
    M = min_in_degree_pad
    has_parallel = False
    incoming: List[List[Tuple[int, int, float, float]]] = [[] for _ in range(n)]
    outgoing: List[List[Tuple[int, int, float, float]]] = [[] for _ in range(n)]
    trop: List[Dict[Tuple[int, int], float]] = [dict() for _ in range(n)]
    logc: List[Dict[Tuple[int, int], float]] = [dict() for _ in range(n)]
    for s in range(n):
        cl_log = closure_log[s] if closure_log is not None else closure[s]
        for t, d in closure[s].items():
            for a in fst.arcs[t]:
                if a.ilabel == 0:
                    continue
                key = (s, a.ilabel)
                c = d + a.weight
                tv = trop[a.nextstate]
                if key not in tv or c < tv[key]:
                    tv[key] = c
        for t, d in cl_log.items():
            for a in fst.arcs[t]:
                if a.ilabel == 0:
                    continue
                key = (s, a.ilabel)
                c = d + a.weight
                lv = logc[a.nextstate]
                if key in lv:
                    lv[key] = _log_add_cost(lv[key], c)
                    has_parallel = True
                else:
                    lv[key] = c
    for v in range(n):
        incoming[v] = sorted(
            (s, tid, c, logc[v][(s, tid)]) for (s, tid), c in trop[v].items()
        )
        M = max(M, len(incoming[v]))
        for s, tid, c, cl in incoming[v]:
            outgoing[s].append((v, tid, c, cl))
    Mo = max(max((len(o) for o in outgoing), default=1), 1)
    want_log = has_parallel or closure_log is not None

    in_src = np.zeros((n, M), dtype=np.int32)
    in_tid = np.zeros((n, M), dtype=np.int32)
    in_pdf = np.zeros((n, M), dtype=np.int32)
    in_cost = np.full((n, M), BIG, dtype=np.float32)
    in_cost_log = np.full((n, M), BIG, dtype=np.float32)
    for v in range(n):
        for m, (s, tid, c, cl) in enumerate(incoming[v]):
            in_src[v, m] = s
            in_tid[v, m] = tid
            in_pdf[v, m] = id2pdf[tid]
            in_cost[v, m] = c
            in_cost_log[v, m] = cl
    out_dst = np.zeros((n, Mo), dtype=np.int32)
    out_tid = np.zeros((n, Mo), dtype=np.int32)
    out_pdf = np.zeros((n, Mo), dtype=np.int32)
    out_cost = np.full((n, Mo), BIG, dtype=np.float32)
    out_cost_log = np.full((n, Mo), BIG, dtype=np.float32)
    for s in range(n):
        for m, (v, tid, c, cl) in enumerate(sorted(outgoing[s])):
            out_dst[s, m] = v
            out_tid[s, m] = tid
            out_pdf[s, m] = id2pdf[tid]
            out_cost[s, m] = c
            out_cost_log[s, m] = cl
    return PackedGraph(
        in_src, in_tid, in_pdf, in_cost,
        out_dst, out_tid, out_pdf, out_cost,
        init_cost, final_cost,
        in_cost_log=in_cost_log if want_log else None,
        out_cost_log=out_cost_log if want_log else None,
        final_cost_log=final_cost_log if want_log else None,
    )


# costs at/above this are padding ("unreachable"), mirroring viterbi.py
FAIL_PAD_THRESHOLD = 1.0e29


def uniform_dest_pdf(batched: "BatchedGraphs") -> Optional[np.ndarray]:
    """(B, S) pdf-id per destination state, or None.

    In H-level training graphs compiled with reorder=True self-loops
    (graph/h_builder.py), every arc INTO a state carries that state's
    emitting pdf, so the acoustic term of the Viterbi DP depends only on
    the destination state.  When that holds (checked here on the host),
    viterbi_align_batch can precompute the acoustic lattice for ALL
    frames as one one-hot GEMM outside the scan instead of selecting
    per-arc pdfs every step — the pdf one-hots are the larger half of
    the scan's per-step HBM streaming.

    Returns None if any state has incoming real arcs with differing
    pdfs (fall back to the per-arc select).
    """
    in_pdf = np.asarray(batched.in_pdf)
    real = np.asarray(batched.in_cost) < FAIL_PAD_THRESHOLD
    first = in_pdf[:, :, :1]
    if np.any(real & (in_pdf != first)):
        return None
    # states with no real arcs keep pdf of slot 0 (never traversed)
    return first[:, :, 0].astype(np.int32)


def pack_graph_batch(
    graphs: Sequence[PackedGraph],
    states_pad_to: int = 1,
    indeg_pad_to: int = 1,
    semiring: str = "tropical",
) -> BatchedGraphs:
    """Stack PackedGraphs, padding states/in-degree to the batch max
    (optionally rounded up so bucketed shapes recompile rarely).

    Padding states are unreachable (init BIG, no real incoming arcs).

    semiring="log" selects the log-add-combined cost arrays (exact for
    forward-backward when graphs have parallel eps paths); graphs whose
    semirings coincide have no log arrays and use the shared ones.
    """
    if semiring not in ("tropical", "log"):
        raise ValueError(semiring)

    def round_up(x, m):
        return ((x + m - 1) // m) * m

    def costs_of(g: PackedGraph):
        if semiring == "log" and g.in_cost_log is not None:
            return g.in_cost_log, g.out_cost_log, g.final_cost_log
        return g.in_cost, g.out_cost, g.final_cost

    S = round_up(max(g.num_states for g in graphs), states_pad_to)
    M = round_up(max(g.max_in_degree for g in graphs), indeg_pad_to)
    Mo = round_up(max(g.max_out_degree for g in graphs), indeg_pad_to)
    B = len(graphs)
    in_src = np.zeros((B, S, M), dtype=np.int32)
    in_tid = np.zeros((B, S, M), dtype=np.int32)
    in_pdf = np.zeros((B, S, M), dtype=np.int32)
    in_cost = np.full((B, S, M), BIG, dtype=np.float32)
    out_dst = np.zeros((B, S, Mo), dtype=np.int32)
    out_tid = np.zeros((B, S, Mo), dtype=np.int32)
    out_pdf = np.zeros((B, S, Mo), dtype=np.int32)
    out_cost = np.full((B, S, Mo), BIG, dtype=np.float32)
    init_cost = np.full((B, S), BIG, dtype=np.float32)
    final_cost = np.full((B, S), BIG, dtype=np.float32)
    for b, g in enumerate(graphs):
        s, m, mo = g.num_states, g.max_in_degree, g.max_out_degree
        g_in, g_out, g_final = costs_of(g)
        in_src[b, :s, :m] = g.in_src
        in_tid[b, :s, :m] = g.in_tid
        in_pdf[b, :s, :m] = g.in_pdf
        in_cost[b, :s, :m] = g_in
        out_dst[b, :s, :mo] = g.out_dst
        out_tid[b, :s, :mo] = g.out_tid
        out_pdf[b, :s, :mo] = g.out_pdf
        out_cost[b, :s, :mo] = g_out
        init_cost[b, :s] = g.init_cost
        final_cost[b, :s] = g_final
    return BatchedGraphs(
        in_src, in_tid, in_pdf, in_cost,
        out_dst, out_tid, out_pdf, out_cost,
        init_cost, final_cost,
    )
