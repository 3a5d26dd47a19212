"""Banded (offset-plane) packing of training graphs for the fused
Viterbi kernel.

Training graphs are *almost* topological: cycles only arise inside
ergodic silence blocks (a handful of states).  After renumbering states
by the topological order of the SCC condensation, nearly every arc's
state offset d = dest - src falls in a narrow band around zero
(self-loops d=0, chain arcs d=1..3, skips over an optional-silence
block d<=~25, intra-silence back arcs d>=-4).

The DP step then needs NO gather at all: for each offset d in a STATIC
band, the candidate scores are `shift(alpha, d) + cost_plane[d]` — a
lane roll plus an add, instead of a one-hot select.  Per-frame work
drops from O(arcs * sqrt(S)) MACs to O(band * S) VPU ops with zero
per-step HBM traffic in the Pallas kernel (align/pallas_banded.py).

Band form: planes are (offset d, multiplicity k) slots; `plane_offsets`
is chosen per batch but BUCKETED to a small menu so jit recompilation
is rare.  Graphs with arcs outside the band report band_ok=False and
callers fall back to the one-hot path — semantics never depend on the
band fitting.

Same role as the reference's decoder state expansion
(faster-decoder.cc:154-240), redesigned around TPU lane shifts.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from khg_tpu.align.packed import BIG, BatchedGraphs, FAIL_PAD_THRESHOLD


def _scc_topo_order(n: int, succs: List[List[int]]) -> List[int]:
    """States in topological order of the SCC condensation (Tarjan,
    iterative); members of one SCC stay consecutive."""
    index = [-1] * n
    low = [0] * n
    on_stack = [False] * n
    stack: List[int] = []
    sccs: List[List[int]] = []
    counter = [0]

    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack[v] = True
            advanced = False
            for i in range(pi, len(succs[v])):
                w = succs[v][i]
                if index[w] == -1:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                elif on_stack[w]:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                low[work[-1][0]] = min(low[work[-1][0]], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    comp.append(w)
                    if w == v:
                        break
                comp.reverse()
                sccs.append(comp)
    # Tarjan emits SCCs in reverse topological order
    sccs.reverse()
    order: List[int] = []
    for comp in sccs:
        order.extend(comp)
    return order


def band_renumber(
    batched: BatchedGraphs, perm: Optional[np.ndarray] = None
) -> Tuple[BatchedGraphs, np.ndarray]:
    """Renumber each graph's states by SCC-condensation topo order.

    Returns (renumbered BatchedGraphs, perm) where perm[b, new] = old.
    Alignments/tids are unchanged (state ids are internal); init/final
    costs and arc tables are permuted consistently.

    Pass a previously returned ``perm`` to skip the SCC computation —
    the order depends only on the arc STRUCTURE (in_src + which cells
    are real), which is unchanged across EM passes (only costs move),
    so callers can cache it keyed on that structure.
    """
    in_src = np.asarray(batched.in_src)
    in_cost = np.asarray(batched.in_cost)
    B, S, M = in_src.shape
    if perm is None:
        perm = np.zeros((B, S), dtype=np.int32)
        for b in range(B):
            succs: List[List[int]] = [[] for _ in range(S)]
            for s in range(S):
                for m in range(M):
                    if in_cost[b, s, m] < FAIL_PAD_THRESHOLD:
                        src = int(in_src[b, s, m])
                        if src != s:
                            succs[src].append(s)
            perm[b] = _scc_topo_order(S, succs)
    inv = np.zeros((B, S), dtype=np.int32)
    np.put_along_axis(
        inv, perm, np.broadcast_to(np.arange(S, dtype=np.int32), (B, S)), axis=1
    )

    def permute_state_axis(x):  # (B, S, ...) gather new <- old
        return np.take_along_axis(
            np.asarray(x), perm.reshape(B, S, *([1] * (x.ndim - 2))), axis=1
        )

    new_src = inv[np.arange(B)[:, None, None], permute_state_axis(batched.in_src)]
    out = BatchedGraphs(
        in_src=new_src.astype(np.int32),
        in_tid=permute_state_axis(batched.in_tid),
        in_pdf=permute_state_axis(batched.in_pdf),
        in_cost=permute_state_axis(batched.in_cost),
        out_dst=batched.out_dst,  # outgoing tables not renumbered (only
        out_tid=batched.out_tid,  # the forward-backward uses them; call
        out_pdf=batched.out_pdf,  # band_renumber on the Viterbi path only)
        out_cost=batched.out_cost,
        init_cost=permute_state_axis(batched.init_cost[..., None])[..., 0],
        final_cost=permute_state_axis(batched.final_cost[..., None])[..., 0],
    )
    return out, perm


class BandedGraphs(NamedTuple):
    """Offset-plane arc tables (all numpy/jnp, leading axis B).

    plane_cost: (B, DK, S) f32   cost of the arc into state s whose
                                 source is s - plane_offsets[dk] (BIG if
                                 no such arc)
    plane_tid:  (B, DK, S) int32 transition-id of that arc (0 pad)
    state_pdf:  (B, S) int32     pdf of every arc into s (uniform)
    init_cost/final_cost: (B, S) f32
    plane_offsets: static tuple(int) of length DK
    """

    plane_cost: np.ndarray
    plane_tid: np.ndarray
    state_pdf: np.ndarray
    init_cost: np.ndarray
    final_cost: np.ndarray


# offset menus, smallest first; a batch uses the first menu that covers
# all its arcs so recompiles stay rare
_BAND_MENUS: Tuple[Tuple[int, ...], ...] = (
    tuple(range(-4, 12)),
    tuple(range(-4, 16)),
    tuple(range(-8, 24)),
    tuple(range(-8, 56)),
    tuple(range(-16, 112)),
)


def pack_banded(
    batched: BatchedGraphs,
    state_pdf: np.ndarray,
    reject_parallel: bool = False,
) -> Optional[Tuple[BandedGraphs, Tuple[int, ...]]]:
    """Convert (renumbered) incoming-arc tables to offset planes.

    Parallel arcs between the same (src, dst) pair are pruned to the
    min-cost one (first wins ties).  This is EXACT for Viterbi: with the
    per-state-uniform acoustic term, a costlier parallel arc can never
    be on a best path (the reference's beam decoder drops such tokens
    the same way, faster-decoder.cc:195-236).  It is NOT exact for the
    sum semiring (forward-backward needs every parallel arc's mass and
    per-arc tid attribution), so FB callers must pass
    ``reject_parallel=True``: packing then returns None whenever any
    (src, dst) cell holds more than one real arc, and the caller falls
    back to the one-hot XLA path.  One plane per offset.

    Returns None when no band menu covers the arcs — callers then use
    the one-hot path.
    """
    in_src = np.asarray(batched.in_src)
    in_cost = np.asarray(batched.in_cost)
    in_tid = np.asarray(batched.in_tid)
    B, S, M = in_src.shape
    dest = np.arange(S, dtype=np.int64)[None, :, None]
    offs = dest - in_src.astype(np.int64)  # (B, S, M)
    real = in_cost < FAIL_PAD_THRESHOLD
    if not real.any():
        return None
    lo = int(offs[real].min())
    hi = int(offs[real].max())
    menu = None
    for cand in _BAND_MENUS:
        if cand[0] <= lo and hi <= cand[-1]:
            menu = cand
            break
    if menu is None:
        return None
    D = len(menu)
    base = menu[0]

    plane_cost = np.full((B, D, S), BIG, dtype=np.float32)
    plane_tid = np.zeros((B, D, S), dtype=np.int32)
    # vectorized min-cost/first-tie reduction over parallel arcs: sort by
    # (plane cell, cost, original arc order) and keep each cell's first row
    bs, ss, ms = np.nonzero(real)
    cost = in_cost[bs, ss, ms]
    tid = in_tid[bs, ss, ms]
    cell = (bs.astype(np.int64) * D + (offs[bs, ss, ms] - base)) * S + ss
    order = np.lexsort((np.arange(len(cell)), cost, cell))
    cell_sorted = cell[order]
    first = np.ones(len(cell), dtype=bool)
    first[1:] = cell_sorted[1:] != cell_sorted[:-1]
    if reject_parallel and not first.all():
        return None
    sel = order[first]
    plane_cost.reshape(-1)[cell[sel]] = cost[sel]
    plane_tid.reshape(-1)[cell[sel]] = tid[sel]

    banded = BandedGraphs(
        plane_cost=plane_cost,
        plane_tid=plane_tid,
        state_pdf=np.asarray(state_pdf, dtype=np.int32),
        init_cost=np.asarray(batched.init_cost, dtype=np.float32),
        final_cost=np.asarray(batched.final_cost, dtype=np.float32),
    )
    return banded, tuple(menu)


def viterbi_banded_host(
    banded: BandedGraphs,
    plane_offsets: Sequence[int],
    loglikes: np.ndarray,   # (B, T, P)
    num_frames: np.ndarray,
    acoustic_scale: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Independent numpy reference for the banded DP (tids, total_cost).

    Mirrors the kernel's arithmetic (shift + add + min, acoustic after
    the min) for parity tests.
    """
    pc = banded.plane_cost
    B, DK, S = pc.shape
    T = loglikes.shape[1]
    offsets = np.asarray(plane_offsets)
    tids_out = np.zeros((B, T), dtype=np.int32)
    costs = np.zeros(B, dtype=np.float32)
    for b in range(B):
        alpha = banded.init_cost[b].copy()
        bp = np.zeros((T, S), dtype=np.int32)
        ac = loglikes[b][:, banded.state_pdf[b]]  # (T, S)
        for t in range(int(num_frames[b])):
            cand = np.full((DK, S), np.float32(BIG) * 2, dtype=np.float32)
            for p, d in enumerate(offsets):
                shifted = np.roll(alpha, d)
                cand[p] = shifted + pc[b, p]
            best = cand.min(axis=0)
            bp[t] = cand.argmin(axis=0)
            alpha = np.minimum(
                (best - acoustic_scale * ac[t]).astype(np.float32), BIG
            )
        totals = alpha + banded.final_cost[b]
        v = int(totals.argmin())
        costs[b] = totals[v]
        for t in range(int(num_frames[b]) - 1, -1, -1):
            p = int(bp[t, v])
            tids_out[b, t] = banded.plane_tid[b, p, v]
            v = (v - int(offsets[p])) % S
    return tids_out, costs
