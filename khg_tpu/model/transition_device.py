"""Device-side transition-model update and graph-cost deltas.

The host EM loop updates transition probabilities (TransitionModel.
mle_update) and re-applies them to the training graphs
(EStepPipeline.refresh_transition_costs) BETWEEN passes — a host
round-trip per pass whose wall time through a tunneled link is one RTT
(BENCH.md: the sole residual between the corpus EM pass and the raw
kernel rate).  These functions move both steps onto the chip so a
multi-pass EM stretch needs ONE host fetch at the end
(EStepPipeline.em_passes_resident).

Semantics mirror the reference exactly:
- mle_update: per transition-state normalization with mincount skip and
  3x {renormalize; floor} iterations
  (/root/reference/kaldi-hmm-gmm/csrc/transition-model.cc MleUpdate;
  host twin: model/transition_model.py:312-358).  Groups are CONTIGUOUS
  tid ranges by the tuple-sort numbering, so the group structure is a
  static (G, max_n) index matrix — no segment scatter needed.
- cost deltas: -scaled log P per tid with the self-loop/non-self-loop
  scale split of hmm-utils AddTransitionProbs
  (graph/h_builder._scaled_transition_log_prob), including the 1e-10
  non-self-loop probability clamp of _compute_derived_of_probs.

The only numerical difference vs the host pair is f32 arithmetic where
the host uses f64 count temporaries; tests/test_transition_device.py
pins the gap (~1e-6 on log-probs) and exact agreement of every discrete
decision (which groups update, which entries floor).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np


class TransitionStruct(NamedTuple):
    """Static structure of a TransitionModel for device updates."""

    idx: np.ndarray      # (G, max_n) int32 — tid of entry j of group g, 0 pad
    valid: np.ndarray    # (G, max_n) bool
    sizes: np.ndarray    # (G,) int32 — num transition indices per tstate
    sl_tid: np.ndarray   # (G + 1,) int32 — self-loop tid per tstate (1-based
                         #                 row; row 0 dummy), 0 if none
    is_sl: np.ndarray    # (num_tids + 1,) bool
    tstate: np.ndarray   # (num_tids + 1,) int32 — tstate of tid (0 for pad)
    num_tids: int


def build_transition_struct(tm) -> TransitionStruct:
    """Precompute the static index arrays (host, once per topology)."""
    G = tm.num_transition_states
    n_tids = tm.num_transition_ids
    sizes = np.array(
        [tm.num_transition_indices(ts) for ts in range(1, G + 1)],
        dtype=np.int32,
    )
    max_n = int(sizes.max()) if G else 1
    idx = np.zeros((G, max_n), dtype=np.int32)
    valid = np.zeros((G, max_n), dtype=bool)
    for g in range(G):
        start = tm.pair_to_transition_id(g + 1, 0)
        n = int(sizes[g])
        idx[g, :n] = np.arange(start, start + n, dtype=np.int32)
        valid[g, :n] = True
    sl_tid = np.zeros(G + 1, dtype=np.int32)
    for ts in range(1, G + 1):
        sl_tid[ts] = tm.self_loop_of(ts)
    is_sl = np.zeros(n_tids + 1, dtype=bool)
    tstate = np.zeros(n_tids + 1, dtype=np.int32)
    for tid in range(1, n_tids + 1):
        tstate[tid] = tm.transition_id_to_transition_state(tid)
        is_sl[tid] = tm.is_self_loop(tid)
    return TransitionStruct(idx, valid, sizes, sl_tid, is_sl, tstate, n_tids)


def transition_mle_update_device(
    counts,            # (num_tids + 1,) f32 — frame occupancy per tid
    logp,              # (num_tids + 1,) f32 — current log probs
    struct: TransitionStruct,
    floor: float = 0.01,
    mincount: float = 5.0,
):
    """Returns (logp_new, objf_impr, count_sum) — the traceable twin of
    TransitionModel.mle_update (non-shared variant)."""
    import jax.numpy as jnp

    idx = jnp.asarray(struct.idx)
    valid = jnp.asarray(struct.valid)
    sizes = jnp.asarray(struct.sizes)

    c = jnp.where(valid, counts[idx], 0.0)                 # (G, max_n)
    tot = jnp.sum(c, axis=1)                               # (G,)
    multi = sizes > 1
    safe_tot = jnp.maximum(tot, 1e-30)
    new = c / safe_tot[:, None]
    for _ in range(3):
        s = jnp.sum(jnp.where(valid, new, 0.0), axis=1, keepdims=True)
        new = new / jnp.maximum(s, 1e-30)
        new = jnp.where(valid, jnp.maximum(new, floor), new)
    old = jnp.exp(logp[idx])                               # (G, max_n)
    upd = multi & (tot >= mincount)                        # (G,)
    probs = jnp.where(upd[:, None] & valid, new, old)
    objf_impr = jnp.sum(
        jnp.where(
            upd[:, None] & valid,
            c * (jnp.log(jnp.maximum(probs, 1e-30)) - logp[idx]),
            0.0,
        )
    )
    count_sum = jnp.sum(jnp.where(multi, tot, 0.0))
    # scatter back: padding entries all write tid 0; restore it after
    logp_new = logp.at[idx.reshape(-1)].set(
        jnp.log(jnp.maximum(probs, 1e-30)).reshape(-1)
    )
    logp_new = logp_new.at[0].set(logp[0])
    return logp_new, objf_impr, count_sum


def factored_take(table, idx, block: int = 0,
                  max_onehot_bytes: int = 256 * 2**20):
    """``table[idx]`` without a TPU scalar gather (exact).

    Decomposes idx = hi*block + lo and selects with two exact 0/1
    one-hots: the hi rows ride one MXU GEMM against the (H, block)
    reshaped table, the lo lanes a multiply+sum.  Every product is
    0/1 * table-value, so the result is bit-exact table[idx] at any
    precision.  Measured on-chip: the XLA gather of 1.3M indices from
    an ~800-entry table costs ~8 ms inside the fused E-step; this
    formulation is GEMM-shaped.

    ``block=0`` picks ~sqrt(len(table)) (8-aligned), balancing the hi
    and lo one-hot widths.  Falls back to the plain gather only when
    the two one-hot intermediates would exceed ``max_onehot_bytes``
    (enormous tables x huge index sets), where streaming them would
    outgrow the gather cost.
    """
    import math

    import jax
    import jax.numpy as jnp

    n = table.shape[0]
    if block <= 0:
        block = max(8, -(-math.isqrt(max(n - 1, 1)) // 8) * 8)
    H = -(-n // block)
    if idx.size * (H + block) * table.dtype.itemsize > max_onehot_bytes:
        return table[idx]
    padded = jnp.pad(table, (0, H * block - n)).reshape(H, block)
    hi = idx // block
    lo = idx % block
    oh_hi = (
        hi[..., None] == jnp.arange(H, dtype=idx.dtype)
    ).astype(table.dtype)
    rows = jnp.einsum(
        "...h,hl->...l", oh_hi, padded,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=table.dtype,
    )
    oh_lo = (
        lo[..., None] == jnp.arange(block, dtype=idx.dtype)
    ).astype(table.dtype)
    return jnp.sum(rows * oh_lo, axis=-1)


def transition_cost_deltas_device(
    logp,              # (num_tids + 1,) f32
    struct: TransitionStruct,
    transition_scale: float,
    self_loop_scale: float,
):
    """(num_tids + 1,) f32 graph-cost deltas: -scaled log P(tid), the
    traceable twin of EStepPipeline.transition_cost_deltas."""
    import jax.numpy as jnp

    if transition_scale == self_loop_scale:
        d = -transition_scale * logp
        return d.at[0].set(0.0)
    sl_tid = jnp.asarray(struct.sl_tid)                    # (G + 1,)
    is_sl = jnp.asarray(struct.is_sl)
    tstate = jnp.asarray(struct.tstate)
    # log(1 - p_self) per tstate, with the host's 1e-10 clamp
    p_self = jnp.where(sl_tid > 0, jnp.exp(logp[sl_tid]), 0.0)
    log_nsl = jnp.log(jnp.maximum(1.0 - p_self, 1e-10))
    log_nsl = jnp.where(sl_tid > 0, log_nsl, 0.0)          # (G + 1,)
    nsl_t = log_nsl[tstate]                                # (num_tids + 1,)
    d_sl = -self_loop_scale * logp
    d_nsl = -(
        self_loop_scale * nsl_t
        + transition_scale * (logp - nsl_t)
    )
    d = jnp.where(is_sl, d_sl, d_nsl)
    return d.at[0].set(0.0)
