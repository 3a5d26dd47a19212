"""A self-contained weighted FST library (host side).

This is the symbolic substrate of the graph compiler: weighted transducers
over the tropical semiring (weights are costs = negative log probs), with a
log-semiring mode where summation matters (determinization of stochastic
graphs).

Everything here runs on the host, once per utterance/graph, and its output
is packed into dense tensors for the device DP — so clarity and exact
semantics win over raw speed.  The algorithms mirror what the reference
gets from OpenFST/kaldifst (compose with the epsilon-sequencing filter,
DeterminizeStar = epsilon-removal + determinization of functional FSTs,
encoded minimization, EqualAlign), but are independent implementations.

Conventions:
- label 0 is epsilon on both tapes.
- weights are float costs; semiring "times" is +, "plus" is min (tropical)
  or -log(e^-a + e^-b) (log).
- a state's final weight is a cost; math.inf means "not final".
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

NO_STATE = -1
INF = math.inf


@dataclass
class Arc:
    ilabel: int
    olabel: int
    weight: float
    nextstate: int


def log_plus(a: float, b: float) -> float:
    """Log-semiring ⊕ on costs: -log(e^-a + e^-b)."""
    if a == INF:
        return b
    if b == INF:
        return a
    m = min(a, b)
    return m - math.log1p(math.exp(m - max(a, b)))


def trop_plus(a: float, b: float) -> float:
    return min(a, b)


class VectorFst:
    """Mutable arc-vector FST."""

    __slots__ = ("arcs", "final", "start")

    def __init__(self):
        self.arcs: List[List[Arc]] = []
        self.final: List[float] = []
        self.start: int = NO_STATE

    # ------------------------------------------------------------- building

    def add_state(self) -> int:
        self.arcs.append([])
        self.final.append(INF)
        return len(self.arcs) - 1

    def add_arc(self, state: int, arc: Arc) -> None:
        self.arcs[state].append(arc)

    def set_start(self, s: int) -> None:
        self.start = s

    def set_final(self, s: int, weight: float = 0.0) -> None:
        self.final[s] = weight

    @property
    def num_states(self) -> int:
        return len(self.arcs)

    @property
    def num_arcs(self) -> int:
        return sum(len(a) for a in self.arcs)

    def is_final(self, s: int) -> bool:
        return self.final[s] != INF

    def copy(self) -> "VectorFst":
        out = VectorFst()
        out.start = self.start
        out.final = list(self.final)
        out.arcs = [[Arc(a.ilabel, a.olabel, a.weight, a.nextstate) for a in arcs]
                    for arcs in self.arcs]
        return out

    # ------------------------------------------------------------ utilities

    def arcsort(self, sort_type: str = "ilabel") -> None:
        if sort_type == "ilabel":
            key = lambda a: (a.ilabel, a.olabel, a.nextstate)  # noqa: E731
        elif sort_type == "olabel":
            key = lambda a: (a.olabel, a.ilabel, a.nextstate)  # noqa: E731
        else:
            raise ValueError(sort_type)
        for arcs in self.arcs:
            arcs.sort(key=key)

    def apply_probability_scale(self, scale: float) -> None:
        """Scale all arc costs (not final weights), as fst::ApplyProbabilityScale."""
        for arcs in self.arcs:
            for a in arcs:
                a.weight *= scale

    def input_symbols_used(self) -> set:
        out = set()
        for arcs in self.arcs:
            for a in arcs:
                out.add(a.ilabel)
        return out

    def text(self) -> str:
        """OpenFST-style text (for debugging)."""
        lines = []
        if self.start == NO_STATE:
            return ""
        order = [self.start] + [s for s in range(self.num_states) if s != self.start]
        for s in order:
            for a in self.arcs[s]:
                lines.append(f"{s}\t{a.nextstate}\t{a.ilabel}\t{a.olabel}\t{a.weight:g}")
            if self.is_final(s):
                lines.append(f"{s}\t{self.final[s]:g}")
        return "\n".join(lines) + "\n"

    def __repr__(self):
        return f"VectorFst(num_states={self.num_states}, num_arcs={self.num_arcs})"


# ----------------------------------------------------------------- builders


def make_linear_acceptor(labels: Sequence[int]) -> VectorFst:
    fst = VectorFst()
    cur = fst.add_state()
    fst.set_start(cur)
    for lab in labels:
        nxt = fst.add_state()
        fst.add_arc(cur, Arc(lab, lab, 0.0, nxt))
        cur = nxt
    fst.set_final(cur, 0.0)
    return fst


def add_subsequential_loop(subseq_symbol: int, fst: VectorFst) -> None:
    """Add the '$' loop needed to compose with right-context C FSTs.

    Mirrors fst::AddSubsequentialLoop: every final state gets an arc
    (subseq_symbol:eps) to a new super-final state with a self-loop.
    """
    superfinal = fst.add_state()
    fst.add_arc(superfinal, Arc(subseq_symbol, 0, 0.0, superfinal))
    fst.set_final(superfinal, 0.0)
    for s in range(fst.num_states):
        if s != superfinal and fst.is_final(s):
            w = fst.final[s]
            fst.add_arc(s, Arc(subseq_symbol, 0, w, superfinal))
            # state stays final as well (matches OpenFST semantics)


def concat(left: VectorFst, right: VectorFst) -> VectorFst:
    """Concatenation: language(left)·language(right)."""
    out = left.copy()
    offset = out.num_states
    for s in range(right.num_states):
        out.add_state()
    for s in range(right.num_states):
        for a in right.arcs[s]:
            out.add_arc(offset + s, Arc(a.ilabel, a.olabel, a.weight, offset + a.nextstate))
        if right.is_final(s):
            out.set_final(offset + s, right.final[s])
    for s in range(offset):
        if left.final[s] != INF:
            out.add_arc(s, Arc(0, 0, left.final[s], offset + right.start))
            out.final[s] = INF
    return out


# ------------------------------------------------------------------ connect


def connect(fst: VectorFst) -> VectorFst:
    """Trim states not on a successful path; renumbers states."""
    n = fst.num_states
    if fst.start == NO_STATE or n == 0:
        return VectorFst()
    # forward reachability
    fwd = np.zeros(n, dtype=bool)
    stack = [fst.start]
    fwd[fst.start] = True
    while stack:
        s = stack.pop()
        for a in fst.arcs[s]:
            if not fwd[a.nextstate]:
                fwd[a.nextstate] = True
                stack.append(a.nextstate)
    # backward reachability from finals
    preds: List[List[int]] = [[] for _ in range(n)]
    for s in range(n):
        for a in fst.arcs[s]:
            preds[a.nextstate].append(s)
    bwd = np.zeros(n, dtype=bool)
    stack = [s for s in range(n) if fst.is_final(s)]
    for s in stack:
        bwd[s] = True
    while stack:
        s = stack.pop()
        for p in preds[s]:
            if not bwd[p]:
                bwd[p] = True
                stack.append(p)
    keep = fwd & bwd
    if not keep[fst.start]:
        return VectorFst()
    remap = -np.ones(n, dtype=np.int64)
    out = VectorFst()
    for s in range(n):
        if keep[s]:
            remap[s] = out.add_state()
    for s in range(n):
        if not keep[s]:
            continue
        ns = int(remap[s])
        for a in fst.arcs[s]:
            if keep[a.nextstate]:
                out.add_arc(ns, Arc(a.ilabel, a.olabel, a.weight, int(remap[a.nextstate])))
        out.final[ns] = fst.final[s]
    out.set_start(int(remap[fst.start]))
    return out


# ------------------------------------------------------------------ compose


def compose(a: VectorFst, b: VectorFst, connect_result: bool = True) -> VectorFst:
    """Weighted composition with the standard epsilon-sequencing filter.

    The 3-state filter ensures each pair of epsilon paths contributes
    exactly one composed path, so the result is correct in ANY semiring
    (which matters because the training-graph pipeline later re-interprets
    the weights in the log semiring).
    """
    if a.start == NO_STATE or b.start == NO_STATE:
        return VectorFst()
    # Sort b's arcs by ilabel for binary-search matching.
    b_sorted: List[List[Arc]] = []
    b_ilabels: List[np.ndarray] = []
    for s in range(b.num_states):
        arcs = sorted(b.arcs[s], key=lambda x: x.ilabel)
        b_sorted.append(arcs)
        b_ilabels.append(np.array([x.ilabel for x in arcs], dtype=np.int64))

    out = VectorFst()
    state_map: Dict[Tuple[int, int, int], int] = {}

    def get_state(s1: int, s2: int, f: int) -> int:
        key = (s1, s2, f)
        s = state_map.get(key)
        if s is None:
            s = out.add_state()
            state_map[key] = s
            queue.append(key)
        return s

    queue: List[Tuple[int, int, int]] = []
    start_key = (a.start, b.start, 0)
    state_map[start_key] = out.add_state()
    out.set_start(0)
    queue.append(start_key)

    qi = 0
    while qi < len(queue):
        s1, s2, f = queue[qi]
        cur = state_map[(s1, s2, f)]
        qi += 1

        # final weight
        fa, fb = a.final[s1], b.final[s2]
        if fa != INF and fb != INF:
            out.final[cur] = fa + fb

        arcs1 = a.arcs[s1]
        arcs2 = b_sorted[s2]
        il2 = b_ilabels[s2]

        for arc1 in arcs1:
            x = arc1.olabel
            if x != 0:
                # match non-eps
                lo = int(np.searchsorted(il2, x, side="left"))
                hi = int(np.searchsorted(il2, x, side="right"))
                for j in range(lo, hi):
                    arc2 = arcs2[j]
                    ns = get_state(arc1.nextstate, arc2.nextstate, 0)
                    out.add_arc(cur, Arc(arc1.ilabel, arc2.olabel,
                                         arc1.weight + arc2.weight, ns))
            else:
                # A-side epsilon-output move (allowed in filter states 0, 1)
                if f in (0, 1):
                    ns = get_state(arc1.nextstate, s2, 1)
                    out.add_arc(cur, Arc(arc1.ilabel, 0, arc1.weight, ns))
                # joint eps move (only from filter state 0)
                if f == 0:
                    lo = int(np.searchsorted(il2, 0, side="left"))
                    hi = int(np.searchsorted(il2, 0, side="right"))
                    for j in range(lo, hi):
                        arc2 = arcs2[j]
                        ns = get_state(arc1.nextstate, arc2.nextstate, 0)
                        out.add_arc(cur, Arc(arc1.ilabel, arc2.olabel,
                                             arc1.weight + arc2.weight, ns))
        # B-side epsilon-input move (allowed in filter states 0, 2)
        if f in (0, 2):
            lo = int(np.searchsorted(il2, 0, side="left"))
            hi = int(np.searchsorted(il2, 0, side="right"))
            for j in range(lo, hi):
                arc2 = arcs2[j]
                ns = get_state(s1, arc2.nextstate, 2)
                out.add_arc(cur, Arc(0, arc2.olabel, arc2.weight, ns))

    return connect(out) if connect_result else out


# ----------------------------------------------------------- determinize ★


class DeterminizeError(RuntimeError):
    pass


def determinize_star(
    fst: VectorFst,
    semiring: str = "tropical",
    max_states: int = 2_000_000,
) -> VectorFst:
    """Epsilon-removal + determinization of a functional FST.

    Subset elements are (state, residual-cost, residual-output-string).
    Input-epsilon arcs are followed inside the subset closure (accumulating
    any output labels they carry), so the result has no input epsilons.
    ``semiring='log'`` sums path weights where paths merge — used for
    stochastic training graphs (the analogue of DeterminizeStarInLog).
    """
    plus = log_plus if semiring == "log" else trop_plus
    if fst.start == NO_STATE:
        return VectorFst()

    out = VectorFst()
    subset_map: Dict[tuple, int] = {}

    def closure(elements: Dict[Tuple[int, tuple], float]) -> Dict[Tuple[int, tuple], float]:
        """Epsilon-closure over input-eps arcs; keys are (state, string)."""
        agenda = list(elements.keys())
        iters = 0
        limit = 100 * (fst.num_states + 10)
        while agenda:
            iters += 1
            if iters > limit:
                raise DeterminizeError("epsilon cycle detected in determinize_star")
            key = agenda.pop()
            s, string = key
            w = elements.get(key)
            if w is None:
                continue
            for a in fst.arcs[s]:
                if a.ilabel != 0:
                    continue
                nstring = string + (a.olabel,) if a.olabel != 0 else string
                nkey = (a.nextstate, nstring)
                nw = w + a.weight
                old = elements.get(nkey)
                if old is None:
                    elements[nkey] = nw
                    agenda.append(nkey)
                else:
                    comb = plus(old, nw)
                    if comb != old:
                        elements[nkey] = comb
                        agenda.append(nkey)
        return elements

    def normalize(
        elements: Dict[Tuple[int, tuple], float]
    ) -> Tuple[tuple, float, tuple, Dict[Tuple[int, tuple], float]]:
        """Factor out the total weight and common output prefix.

        Returns (canonical subset key, common cost, common output string,
        normalized elements with the prefix stripped and weights divided).
        """
        tot = INF
        for w in elements.values():
            tot = plus(tot, w)
        strings = [k[1] for k in elements.keys()]
        prefix = strings[0]
        for st in strings[1:]:
            n = 0
            for x, y in zip(prefix, st):
                if x != y:
                    break
                n += 1
            prefix = prefix[:n]
            if not prefix:
                break
        norm: Dict[Tuple[int, tuple], float] = {}
        items = []
        for (s, string), w in elements.items():
            stripped = string[len(prefix):]
            norm[(s, stripped)] = w - tot
            items.append((s, stripped, round((w - tot) * 1e6)))
        items.sort()
        return tuple(items), tot, prefix, norm

    def get_state(items_key: tuple, norm_elements: Dict[Tuple[int, tuple], float]) -> int:
        s = subset_map.get(items_key)
        if s is None:
            s = out.add_state()
            if out.num_states > max_states:
                raise DeterminizeError("determinize_star exceeded max states")
            subset_map[items_key] = s
            queue.append((s, norm_elements))
        return s

    def emit_chain(src: int, ilabel: int, weight: float, string: tuple, dst: int) -> None:
        """Arc from src to dst emitting `string` (possibly via chain states)."""
        if len(string) == 0:
            out.add_arc(src, Arc(ilabel, 0, weight, dst))
            return
        cur = src
        for i, olab in enumerate(string):
            last = i == len(string) - 1
            nxt = dst if last else out.add_state()
            out.add_arc(cur, Arc(ilabel if i == 0 else 0, olab,
                                 weight if i == 0 else 0.0, nxt))
            cur = nxt

    queue: List[Tuple[int, Dict[Tuple[int, tuple], float]]] = []

    init = closure({(fst.start, ()): 0.0})
    init_key, init_tot, init_prefix, init_norm = normalize(init)
    # Initial subset: any common weight/prefix must be emitted before the
    # start state; OpenFST-style FSTs have no "initial weight", so create a
    # pre-start chain if needed.
    start_state = get_state(init_key, init_norm)
    if init_tot != 0.0 or init_prefix:
        pre = out.add_state()
        out.set_start(pre)
        emit_chain(pre, 0, init_tot, init_prefix, start_state)
    else:
        out.set_start(start_state)

    qi = 0
    while qi < len(queue):
        cur, elements = queue[qi]
        qi += 1

        # --- final treatment
        final_groups: Dict[tuple, float] = {}
        for (s, string), w in elements.items():
            if fst.final[s] != INF:
                fw = w + fst.final[s]
                old = final_groups.get(string)
                final_groups[string] = fw if old is None else plus(old, fw)
        for string, fw in final_groups.items():
            if len(string) == 0:
                out.final[cur] = fw if out.final[cur] == INF else plus(out.final[cur], fw)
            else:
                # emit residual output via eps-input chain to a final state
                tail = out.add_state()
                out.set_final(tail, 0.0)
                emit_chain(cur, 0, fw, string, tail)

        # --- gather transitions per input label
        by_label: Dict[int, Dict[Tuple[int, tuple], float]] = {}
        for (s, string), w in elements.items():
            for a in fst.arcs[s]:
                if a.ilabel == 0:
                    continue
                nstring = string + (a.olabel,) if a.olabel != 0 else string
                d = by_label.setdefault(a.ilabel, {})
                nkey = (a.nextstate, nstring)
                nw = w + a.weight
                old = d.get(nkey)
                d[nkey] = nw if old is None else plus(old, nw)

        for ilabel in sorted(by_label):
            dest = closure(by_label[ilabel])
            key, tot, prefix, norm = normalize(dest)
            ns = get_state(key, norm)
            emit_chain(cur, ilabel, tot, prefix, ns)

    return connect(out)


# ------------------------------------------------------------- relabeling


def remove_input_symbols(symbols: Iterable[int], fst: VectorFst) -> None:
    """Replace the given input symbols by epsilon, in place."""
    symset = set(symbols)
    for arcs in fst.arcs:
        for a in arcs:
            if a.ilabel in symset:
                a.ilabel = 0


def relabel_input(fst: VectorFst, mapping: Callable[[int], int]) -> None:
    for arcs in fst.arcs:
        for a in arcs:
            a.ilabel = mapping(a.ilabel)


# ---------------------------------------------------------------- minimize


def minimize_encoded(fst: VectorFst, weight_decimals: int = 6) -> VectorFst:
    """Bisimulation-based state merging over encoded labels.

    Arcs are treated as atomic labels (ilabel, olabel, rounded weight) — no
    weight pushing, exactly like Kaldi's MinimizeEncoded.  For deterministic
    inputs (post determinize-star) this reaches the minimal machine; for
    nondeterministic inputs it is still a sound equivalence reduction.
    """
    n = fst.num_states
    if n == 0:
        return fst.copy()
    scale = 10 ** weight_decimals

    def enc(a: Arc) -> tuple:
        return (a.ilabel, a.olabel, round(a.weight * scale))

    # initial partition by final weight
    cls = {}
    part = np.zeros(n, dtype=np.int64)
    for s in range(n):
        key = round(fst.final[s] * scale) if fst.final[s] != INF else None
        if key not in cls:
            cls[key] = len(cls)
        part[s] = cls[key]

    while True:
        sig_map = {}
        new_part = np.zeros(n, dtype=np.int64)
        for s in range(n):
            sig = (part[s], tuple(sorted(enc(a) + (part[a.nextstate],)
                                         for a in fst.arcs[s])))
            idx = sig_map.get(sig)
            if idx is None:
                idx = len(sig_map)
                sig_map[sig] = idx
            new_part[s] = idx
        if len(sig_map) == len(set(part.tolist())):
            part = new_part
            break
        part = new_part

    num_classes = len(set(part.tolist()))
    if num_classes == n:
        return fst.copy()
    out = VectorFst()
    for _ in range(num_classes):
        out.add_state()
    done = set()
    for s in range(n):
        c = int(part[s])
        if c in done:
            continue
        done.add(c)
        seen = set()
        for a in fst.arcs[s]:
            key = enc(a) + (int(part[a.nextstate]),)
            if key in seen:
                continue
            seen.add(key)
            out.add_arc(c, Arc(a.ilabel, a.olabel, a.weight, int(part[a.nextstate])))
        out.final[c] = fst.final[s]
    out.set_start(int(part[fst.start]))
    return connect(out)


# ------------------------------------------------------------ eps removal


def remove_eps_local(fst: VectorFst) -> VectorFst:
    """Remove arcs with ilabel=olabel=0 by weighted epsilon closure.

    Full (not merely 'local') epsilon removal in the tropical semiring;
    language-equivalent, used on acyclic-in-epsilon HMM FSAs before they
    are embedded into H (the reference uses fst::RemoveEpsLocal there,
    hmm-utils.cc:150; full removal is an equally valid normalization since
    a determinize-star pass follows downstream).
    """
    n = fst.num_states
    # closure[s] = dict target -> cost over pure-eps paths
    out = VectorFst()
    for _ in range(n):
        out.add_state()
    out.set_start(fst.start)

    for s in range(n):
        # Dijkstra-ish closure (costs may be any sign but eps-graphs here are
        # acyclic; do Bellman-Ford over eps arcs with cycle detection)
        dist = {s: 0.0}
        agenda = [s]
        iters = 0
        while agenda:
            iters += 1
            if iters > 10 * n * n + 100:
                raise RuntimeError("epsilon cycle in remove_eps_local")
            u = agenda.pop()
            for a in fst.arcs[u]:
                if a.ilabel == 0 and a.olabel == 0:
                    nd = dist[u] + a.weight
                    if a.nextstate not in dist or nd < dist[a.nextstate]:
                        dist[a.nextstate] = nd
                        agenda.append(a.nextstate)
        fw = INF
        for t, d in dist.items():
            if fst.final[t] != INF:
                fw = min(fw, d + fst.final[t])
            for a in fst.arcs[t]:
                if a.ilabel == 0 and a.olabel == 0:
                    continue
                out.add_arc(s, Arc(a.ilabel, a.olabel, d + a.weight, a.nextstate))
        out.final[s] = fw
    return connect(out)


# ------------------------------------------------------------- equal align


def equal_align(
    fst: VectorFst,
    length: int,
    rng: np.random.Generator,
) -> Optional[Tuple[List[int], List[int], float]]:
    """Random path with exactly ``length`` emitting (ilabel != 0) arcs,
    with frames distributed EVENLY along the path.

    Samples a random "skeleton" path (no self-loops) whose emitting length
    fits within ``length``, then spreads the remaining frames as evenly as
    possible over the path's self-loop-capable states.  This is the flat
    -start initial segmentation: roughly uniform state durations, which is
    what "equal align" means semantically (cf. kaldifst.equal_align; the
    retry-based random walk there has the same intent).

    Returns (ilabels, olabels, cost) or None if infeasible.  Exact
    feasibility DP: never fails when a path exists; reproducible from
    ``rng``.
    """
    n = fst.num_states
    if fst.start == NO_STATE:
        return None

    def is_self_loop(s: int, a: Arc) -> bool:
        return a.nextstate == s and a.ilabel != 0

    # feasible[k][s]: a skeleton path (no self-loop arcs) from s can reach a
    # final state consuming BETWEEN 0 and k emitting arcs, i.e. min skeleton
    # length <= k.  Epsilon arcs consume nothing.
    feasible = np.zeros((length + 1, n), dtype=bool)
    level = np.array([fst.final[s] != INF for s in range(n)], dtype=bool)

    def eps_fix(level):
        changed = True
        while changed:
            changed = False
            for s in range(n):
                if level[s]:
                    continue
                for a in fst.arcs[s]:
                    if a.ilabel == 0 and level[a.nextstate]:
                        level[s] = True
                        changed = True
                        break
        return level

    feasible[0] = eps_fix(level.copy())
    for k in range(1, length + 1):
        level = feasible[k - 1].copy()  # "<= k" includes "<= k-1"
        for s in range(n):
            if level[s]:
                continue
            for a in fst.arcs[s]:
                if (
                    a.ilabel != 0
                    and not is_self_loop(s, a)
                    and feasible[k - 1][a.nextstate]
                ):
                    level[s] = True
                    break
        feasible[k] = eps_fix(level)

    if not feasible[length][fst.start]:
        return None

    # ---- sample the skeleton path
    # steps: list of (arc, emitting?, state_if_emitting)
    path: List[Tuple[Arc, int]] = []
    s = fst.start
    k = length
    eps_run = 0
    while True:
        may_stop = fst.final[s] != INF and (
            k == 0 or _has_self_loop_on_path(path, fst)
        )
        options = []
        for a in fst.arcs[s]:
            if is_self_loop(s, a):
                continue
            if a.ilabel != 0:
                if k > 0 and feasible[k - 1][a.nextstate]:
                    options.append((a, 1))
            else:
                if feasible[k][a.nextstate] and eps_run < n + 1:
                    options.append((a, 0))
        if may_stop and (not options or rng.random() < 0.5):
            final_cost = fst.final[s]
            break
        if not options:
            # dead end can only happen if we relied on self-loop absorption
            # but none exists; feasibility guaranteed only for k reachable
            # exactly -- retry with exact-fit semantics
            return _equal_align_exact(fst, length, rng)
        a, consumes = options[int(rng.integers(len(options)))]
        path.append((a, consumes))
        eps_run = 0 if consumes else eps_run + 1
        k -= consumes
        s = a.nextstate

    # ---- distribute remaining k frames over self-loop states on the path
    # reorder-style graphs attach the self-loop to the DESTINATION state of
    # each emitting arc.
    slots = []  # indices into path where the destination has a self-loop
    loop_arc_of: List[Optional[Arc]] = []
    for i, (a, consumes) in enumerate(path):
        loop = None
        if consumes:
            dst = a.nextstate
            for b in fst.arcs[dst]:
                if is_self_loop(dst, b):
                    loop = b
                    break
        loop_arc_of.append(loop)
        if loop is not None:
            slots.append(i)
    if k > 0 and not slots:
        return _equal_align_exact(fst, length, rng)
    extras = [0] * len(path)
    if slots:
        base, rem = divmod(k, len(slots))
        for j, i in enumerate(slots):
            extras[i] = base + (1 if j < rem else 0)

    ilabels: List[int] = []
    olabels: List[int] = []
    cost = 0.0
    for i, (a, consumes) in enumerate(path):
        if a.ilabel != 0:
            ilabels.append(a.ilabel)
        if a.olabel != 0:
            olabels.append(a.olabel)
        cost += a.weight
        loop = loop_arc_of[i]
        for _ in range(extras[i]):
            ilabels.append(loop.ilabel)
            if loop.olabel != 0:
                olabels.append(loop.olabel)
            cost += loop.weight
    cost += final_cost
    assert len(ilabels) == length
    return ilabels, olabels, cost


def _has_self_loop_on_path(path, fst) -> bool:
    for a, consumes in path:
        if consumes:
            dst = a.nextstate
            for b in fst.arcs[dst]:
                if b.nextstate == dst and b.ilabel != 0:
                    return True
    return False


def _equal_align_exact(
    fst: VectorFst, length: int, rng: np.random.Generator
) -> Optional[Tuple[List[int], List[int], float]]:
    """Fallback: random walk over ALL arcs with exact-length feasibility
    (handles graphs without self-loops, e.g. pre-expansion FSAs)."""
    n = fst.num_states
    feasible = np.zeros((length + 1, n), dtype=bool)
    level = np.array([fst.final[s] != INF for s in range(n)], dtype=bool)

    def eps_fix(level):
        changed = True
        while changed:
            changed = False
            for s in range(n):
                if level[s]:
                    continue
                for a in fst.arcs[s]:
                    if a.ilabel == 0 and level[a.nextstate]:
                        level[s] = True
                        changed = True
                        break
        return level

    feasible[0] = eps_fix(level.copy())
    for k in range(1, length + 1):
        level = np.zeros(n, dtype=bool)
        for s in range(n):
            for a in fst.arcs[s]:
                if a.ilabel != 0 and feasible[k - 1][a.nextstate]:
                    level[s] = True
                    break
        feasible[k] = eps_fix(level)
    if not feasible[length][fst.start]:
        return None
    ilabels: List[int] = []
    olabels: List[int] = []
    cost = 0.0
    s = fst.start
    k = length
    eps_run = 0
    while True:
        if k == 0 and fst.final[s] != INF:
            cost += fst.final[s]
            break
        options = []
        for a in fst.arcs[s]:
            if a.ilabel != 0:
                if k > 0 and feasible[k - 1][a.nextstate]:
                    options.append((a, 1))
            else:
                if feasible[k][a.nextstate] and eps_run < n + 1:
                    options.append((a, 0))
        assert options, "feasibility DP violated"
        a, consumes = options[int(rng.integers(len(options)))]
        if a.ilabel != 0:
            ilabels.append(a.ilabel)
        if a.olabel != 0:
            olabels.append(a.olabel)
        cost += a.weight
        eps_run = 0 if consumes else eps_run + 1
        k -= consumes
        s = a.nextstate
    return ilabels, olabels, cost


# ------------------------------------------------------------ shortest path


def shortest_path(fst: VectorFst) -> Optional[Tuple[List[int], List[int], float]]:
    """Single best path (tropical).  Requires non-negative arc costs OR an
    acyclic FST; uses Dijkstra with a lower-bound guard for small negatives.
    Returns (ilabels, olabels, total_cost)."""
    import heapq

    if fst.start == NO_STATE:
        return None
    n = fst.num_states
    min_w = min((a.weight for arcs in fst.arcs for a in arcs), default=0.0)
    if min_w < -1e-9:
        return _shortest_path_bellman(fst)
    dist = [INF] * n
    prev: List[Optional[Tuple[int, Arc]]] = [None] * n
    dist[fst.start] = 0.0
    heap = [(0.0, fst.start)]
    while heap:
        d, s = heapq.heappop(heap)
        if d > dist[s]:
            continue
        for a in fst.arcs[s]:
            nd = d + a.weight
            if nd < dist[a.nextstate]:
                dist[a.nextstate] = nd
                prev[a.nextstate] = (s, a)
                heapq.heappush(heap, (nd, a.nextstate))
    best_s, best_c = None, INF
    for s in range(n):
        if fst.final[s] != INF and dist[s] + fst.final[s] < best_c:
            best_c = dist[s] + fst.final[s]
            best_s = s
    if best_s is None:
        return None
    ilabels: List[int] = []
    olabels: List[int] = []
    s = best_s
    while prev[s] is not None:
        p, a = prev[s]
        if a.ilabel != 0:
            ilabels.append(a.ilabel)
        if a.olabel != 0:
            olabels.append(a.olabel)
        s = p
    return ilabels[::-1], olabels[::-1], best_c


def _shortest_path_bellman(fst: VectorFst) -> Optional[Tuple[List[int], List[int], float]]:
    n = fst.num_states
    dist = [INF] * n
    prev: List[Optional[Tuple[int, Arc]]] = [None] * n
    dist[fst.start] = 0.0
    for _ in range(n + 2):
        changed = False
        for s in range(n):
            if dist[s] == INF:
                continue
            for a in fst.arcs[s]:
                nd = dist[s] + a.weight
                if nd < dist[a.nextstate] - 1e-12:
                    dist[a.nextstate] = nd
                    prev[a.nextstate] = (s, a)
                    changed = True
        if not changed:
            break
    else:
        raise RuntimeError("negative cycle in shortest_path")
    best_s, best_c = None, INF
    for s in range(n):
        if fst.final[s] != INF and dist[s] + fst.final[s] < best_c:
            best_c = dist[s] + fst.final[s]
            best_s = s
    if best_s is None:
        return None
    ilabels: List[int] = []
    olabels: List[int] = []
    s = best_s
    while prev[s] is not None:
        p, a = prev[s]
        if a.ilabel != 0:
            ilabels.append(a.ilabel)
        if a.olabel != 0:
            olabels.append(a.olabel)
        s = p
    return ilabels[::-1], olabels[::-1], best_c
