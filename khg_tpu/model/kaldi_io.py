"""Kaldi-compatible TEXT serialization for model objects.

Read/Write of the Kaldi text formats for HmmTopology, TransitionModel,
ContextDependency (EventMap trees), DiagGmm and AmDiagGmm, so artifacts
interoperate with the reference / real Kaldi tooling and parity can be
checked on real checkpoints.

Formats follow /root/reference/kaldi-hmm-gmm/csrc/transition-model.cc:37-116,
event-map.cc I/O dispatch, context-dep.cc:45-83, and Kaldi's DiagGmm
text layout (<DiagGMM> <GCONSTS> <WEIGHTS> <MEANS_INVVARS> <INV_VARS>).
"""

from __future__ import annotations

import math
from typing import Iterator, List

import numpy as np

from khg_tpu.gmm.am_gmm import AmDiagGmm
from khg_tpu.gmm.diag_gmm import DiagGmm
from khg_tpu.model.context_dep import ContextDependency
from khg_tpu.model.event_map import (
    ConstantEventMap,
    EventMap,
    SplitEventMap,
    TableEventMap,
)
from khg_tpu.model.topology import HmmTopology
from khg_tpu.model.transition_model import TransitionModel


class Tokens:
    """Token stream with pushback, as Kaldi text streams behave."""

    def __init__(self, text: str):
        self.toks = text.split()
        self.pos = 0

    def next(self) -> str:
        if self.pos >= len(self.toks):
            raise ValueError("Unexpected end of stream")
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, token: str) -> None:
        t = self.next()
        if t != token:
            raise ValueError(f"Expected {token}, got {t}")

    def peek(self) -> str:
        return self.toks[self.pos]


# ------------------------------------------------------------------ vectors


def write_vector(v: np.ndarray) -> str:
    return " [ " + " ".join(f"{x:.7g}" for x in v) + " ]"


def read_vector(ts: Tokens) -> np.ndarray:
    ts.expect("[")
    vals = []
    while True:
        t = ts.next()
        if t == "]":
            break
        vals.append(float(t))
    return np.array(vals, dtype=np.float64)


def write_matrix(m: np.ndarray) -> str:
    rows = "\n  ".join(" ".join(f"{x:.7g}" for x in row) for row in m)
    return " [\n  " + rows + " ]"


# Kaldi's text matrices rely on newlines, which a whitespace tokenizer
# cannot see.  We emit standard Kaldi layout on WRITE (newline-separated
# rows), and on READ use the explicitly-known shape from the surrounding
# object (num components / dim), consuming values in order.


def read_matrix_shaped(ts: Tokens, rows: int, cols: int) -> np.ndarray:
    ts.expect("[")
    vals = [float(ts.next()) for _ in range(rows * cols)]
    ts.expect("]")
    return np.array(vals, dtype=np.float64).reshape(rows, cols)


# ---------------------------------------------------------------- event map


def write_event_map(m: EventMap) -> str:
    if isinstance(m, ConstantEventMap):
        return f"CE {m.answer} "
    if isinstance(m, TableEventMap):
        parts = [f"TE {m.key} {len(m.table)} ("]
        for child in m.table:
            parts.append("NULL" if child is None else write_event_map(child))
        parts.append(") ")
        return " ".join(parts)
    if isinstance(m, SplitEventMap):
        yes = " ".join(str(x) for x in sorted(m.yes_set))
        return (
            f"SE {m.key} [ {yes} ] {{ "
            + write_event_map(m.yes)
            + write_event_map(m.no)
            + "} "
        )
    raise TypeError(type(m))


def read_event_map(ts: Tokens):
    t = ts.next()
    if t == "NULL":
        return None
    if t == "CE":
        return ConstantEventMap(int(ts.next()))
    if t == "TE":
        key = int(ts.next())
        size = int(ts.next())
        ts.expect("(")
        table = {}
        for i in range(size):
            child = read_event_map(ts)
            if child is not None:
                table[i] = child
        ts.expect(")")
        return TableEventMap(key, table)
    if t == "SE":
        key = int(ts.next())
        ts.expect("[")
        yes_set = []
        while True:
            tok = ts.next()
            if tok == "]":
                break
            yes_set.append(int(tok))
        ts.expect("{")
        yes = read_event_map(ts)
        no = read_event_map(ts)
        ts.expect("}")
        return SplitEventMap(key, yes_set, yes, no)
    raise ValueError(f"Unknown EventMap type {t}")


# --------------------------------------------------------- context dependency


def write_context_dependency(tree: ContextDependency) -> str:
    return (
        f"ContextDependency {tree.N} {tree.P} ToPdf "
        + write_event_map(tree.to_pdf)
        + "EndContextDependency "
    )


def read_context_dependency(text_or_tokens) -> ContextDependency:
    ts = text_or_tokens if isinstance(text_or_tokens, Tokens) else Tokens(text_or_tokens)
    ts.expect("ContextDependency")
    N = int(ts.next())
    P = int(ts.next())
    ts.expect("ToPdf")
    to_pdf = read_event_map(ts)
    ts.expect("EndContextDependency")
    return ContextDependency(N, P, to_pdf)


# ----------------------------------------------------------- transition model


def write_transition_model(tm: TransitionModel) -> str:
    out = ["<TransitionModel>"]
    out.append(tm.topo.write())
    is_hmm = tm.is_hmm()
    tag = "Triples" if is_hmm else "Tuples"
    out.append(f"<{tag}> {len(tm.tuples)}")
    for phone, hmm_state, fwd, slf in tm.tuples:
        if is_hmm:
            out.append(f"{phone} {hmm_state} {fwd}")
        else:
            out.append(f"{phone} {hmm_state} {fwd} {slf}")
    out.append(f"</{tag}>")
    out.append("<LogProbs>")
    out.append(write_vector(tm.log_probs))
    out.append("</LogProbs>")
    out.append("</TransitionModel>")
    return "\n".join(out) + "\n"


def read_transition_model(text: str) -> TransitionModel:
    ts = Tokens(text)
    ts.expect("<TransitionModel>")
    # topology: consume tokens up to </Topology> and re-parse
    topo_toks = []
    while True:
        t = ts.next()
        topo_toks.append(t)
        if t == "</Topology>":
            break
    topo = HmmTopology().read(" ".join(topo_toks))
    tag = ts.next()
    assert tag in ("<Triples>", "<Tuples>"), tag
    size = int(ts.next())
    tuples = []
    for _ in range(size):
        phone = int(ts.next())
        hmm_state = int(ts.next())
        fwd = int(ts.next())
        slf = int(ts.next()) if tag == "<Tuples>" else fwd
        tuples.append((phone, hmm_state, fwd, slf))
    ts.expect("</Triples>" if tag == "<Triples>" else "</Tuples>")
    ts.expect("<LogProbs>")
    log_probs = read_vector(ts).astype(np.float32)
    ts.expect("</LogProbs>")
    ts.expect("</TransitionModel>")

    tm = TransitionModel()
    tm.topo = topo
    tm.tuples = tuples
    tm._compute_derived()
    tm.log_probs = log_probs
    tm._compute_derived_of_probs()
    tm._check()
    return tm


# ----------------------------------------------------------------- diag gmm


def write_diag_gmm(g: DiagGmm) -> str:
    if not g.valid_gconsts:
        g.compute_gconsts()
    out = ["<DiagGMM>"]
    out.append("<GCONSTS> " + write_vector(g.gconsts))
    out.append("<WEIGHTS> " + write_vector(g.weights))
    out.append("<MEANS_INVVARS> " + write_matrix(g.means_invvars))
    out.append("<INV_VARS> " + write_matrix(g.inv_vars))
    out.append("</DiagGMM>")
    return "\n".join(out) + "\n"


def read_diag_gmm(text_or_tokens) -> DiagGmm:
    ts = text_or_tokens if isinstance(text_or_tokens, Tokens) else Tokens(text_or_tokens)
    ts.expect("<DiagGMM>")
    ts.expect("<GCONSTS>")
    gconsts = read_vector(ts)
    k = len(gconsts)
    ts.expect("<WEIGHTS>")
    weights = read_vector(ts)
    ts.expect("<MEANS_INVVARS>")
    # matrix: consume until matching count — need dim: infer from token
    # stream: count floats until "]"
    ts.expect("[")
    vals = []
    while True:
        t = ts.next()
        if t == "]":
            break
        vals.append(float(t))
    dim = len(vals) // k
    means_invvars = np.array(vals, dtype=np.float64).reshape(k, dim)
    ts.expect("<INV_VARS>")
    inv_vars = read_matrix_shaped(ts, k, dim)
    ts.expect("</DiagGMM>")
    g = DiagGmm(k, dim)
    g.weights = weights.astype(np.float32)
    g.inv_vars = inv_vars.astype(np.float32)
    g.means_invvars = means_invvars.astype(np.float32)
    g.gconsts = gconsts.astype(np.float32)
    g.valid_gconsts = True
    return g


def write_am_diag_gmm(am: AmDiagGmm) -> str:
    out = ["<DIMENSION> %d <NUMPDFS> %d" % (am.dim, am.num_pdfs)]
    for i in range(am.num_pdfs):
        out.append(write_diag_gmm(am.get_pdf(i)))
    return "\n".join(out)


def read_am_diag_gmm(text: str) -> AmDiagGmm:
    ts = Tokens(text)
    ts.expect("<DIMENSION>")
    dim = int(ts.next())
    ts.expect("<NUMPDFS>")
    num_pdfs = int(ts.next())
    am = AmDiagGmm()
    for _ in range(num_pdfs):
        g = read_diag_gmm(ts)
        assert g.dim == dim
        am.densities.append(g)
    return am
