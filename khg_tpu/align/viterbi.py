"""Dense Viterbi alignment as a jitted lax.scan over packed graphs.

Per frame t the DP updates all (state, incoming-arc) pairs at once:

    score[b, s, m] = alpha[b, in_src[b,s,m]] + in_cost[b,s,m]
                     - acoustic_scale * ll[b, t, in_pdf[b,s,m]]
    alpha'[b, s]   = min_m score[b, s, m];  bp[t, b, s] = argmin_m

followed by a reverse scan for the backtrace.

TPU-critical design point: the two index lookups are NOT gathers.
Dynamic gathers inside a scan lower to serialized element loads on TPU
(~1 ms/step measured); instead the static index tables are expanded once
into one-hot selection matrices and each lookup becomes a small MXU
matmul (~16x faster end to end).  f32 with HIGHEST precision keeps the
selection exact (one-hot rows select, not mix).  ``unroll`` amortizes the
per-step loop overhead of the backend.

This subsumes the reference's FasterDecoder beam search for training
graphs (faster-decoder.cc:120-423): the DP is exact, so beam/retry-beam
logic is unnecessary — "alignment failure" only happens when the graph
cannot emit exactly T frames, reported via a BIG total cost.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from khg_tpu.align.packed import BIG

# Costs at/above this threshold mean "unreachable".
FAIL_THRESHOLD = 1.0e29

_HI = jax.lax.Precision.HIGHEST


class ViterbiResult(NamedTuple):
    tids: jnp.ndarray        # (B, T) int32 frame alignment (0 past utt end)
    total_cost: jnp.ndarray  # (B,) float32 graph+acoustic cost of best path
    acoustic_cost: jnp.ndarray  # (B,) float32 acoustic part (scaled)
    failed: jnp.ndarray      # (B,) bool no complete path of length len


def make_factored_select(indices: jnp.ndarray, size: int, mask_dtype=jnp.float32):
    """Exact batched select ``values[b, indices[b, x]]`` with O(√size)
    one-hot storage.

    The flat (B, X, size) one-hot matmul is exact but streams
    B·X·size floats from HBM every scan step, which becomes the
    bottleneck at batch ≥ 128.  Factor the index as (hi, lo) over a
    (G, J) grid: stage 1 selects column lo within EVERY group via a
    (B, X, J) one-hot GEMM (same MACs, √size smaller operand); stage 2
    picks group hi with an elementwise (B, X, G) mask-reduce.  Both
    stages multiply by exact 0/1 masks, so the composite is an exact
    f32 gather.
    """
    B, X = indices.shape
    G = 1 << max(1, (size.bit_length() + 1) // 2)
    J = -(-size // G)
    Sp = G * J
    # 0/1 masks are exact in bf16; the einsum/multiply below promotes to
    # f32 before accumulating, so bf16 masks halve the per-step HBM
    # streaming without changing a single bit of the result.
    oh_lo = jax.nn.one_hot(indices % J, J, dtype=mask_dtype)   # (B, X, J)
    oh_hi = jax.nn.one_hot(indices // J, G, dtype=mask_dtype)  # (B, X, G)

    def select(values: jnp.ndarray) -> jnp.ndarray:  # (B, size) -> (B, X)
        v = jnp.pad(values, ((0, 0), (0, Sp - size))).reshape(B, G, J)
        a1 = jnp.einsum(
            "bxj,bgj->bxg", oh_lo.astype(jnp.float32), v,
            precision=_HI, preferred_element_type=jnp.float32,
        )
        return jnp.sum(oh_hi.astype(jnp.float32) * a1, axis=-1)

    return select


@functools.partial(jax.jit, static_argnames=("acoustic_scale", "unroll"))
def viterbi_align_batch(
    graphs,                   # BatchedGraphs (leading axis B)
    loglikes: jnp.ndarray,   # (B, T, P)
    num_frames: jnp.ndarray,  # (B,) int32
    id2pdf: jnp.ndarray,     # (num_tids+1,) int32
    acoustic_scale: float = 1.0,
    unroll: int = 8,
    state_pdf: Optional[jnp.ndarray] = None,  # (B, S) int32 or None
) -> ViterbiResult:
    """Exact batched Viterbi alignment of B utterances.

    ``state_pdf`` (from align.packed.uniform_dest_pdf) enables the
    fast acoustic path: when every arc into a state carries the same
    pdf, the acoustic lattice ac[t, b, s] is precomputed for ALL frames
    as one one-hot GEMM outside the scan, halving the scan's per-step
    one-hot HBM streaming.  Scores of padding arcs change (BIG swamps
    them either way), so results are identical for every feasible path.
    """
    B, S, M = graphs.in_src.shape
    T = loglikes.shape[1]
    P = loglikes.shape[2]

    in_src = graphs.in_src.reshape(B, S * M)
    in_pdf = graphs.in_pdf.reshape(B, S * M)
    in_cost = graphs.in_cost
    sel_src = make_factored_select(in_src, S, mask_dtype=jnp.bfloat16)

    ts = jnp.arange(T, dtype=jnp.int32)
    ll_seq = jnp.swapaxes(loglikes, 0, 1)  # (T, B, P)

    if state_pdf is not None:
        ohp = jax.nn.one_hot(state_pdf, P, dtype=jnp.float32)  # (B, S, P)
        ac_seq = jnp.einsum(
            "btp,bsp->tbs", loglikes, ohp,
            precision=_HI, preferred_element_type=jnp.float32,
        )  # (T, B, S): exact select, MXU, outside the scan

        def step(alpha, xs):
            t, ac_t = xs
            ga = sel_src(alpha).reshape(B, S, M)
            score = ga + in_cost - acoustic_scale * ac_t[:, :, None]
            bp_t = jnp.argmin(score, axis=2).astype(jnp.int32)  # (B, S)
            new_alpha = jnp.minimum(jnp.min(score, axis=2), BIG)
            active = (t < num_frames)[:, None]
            alpha = jnp.where(active, new_alpha, alpha)
            return alpha, bp_t

        alpha_T, bp = jax.lax.scan(
            step, graphs.init_cost, (ts, ac_seq), unroll=unroll
        )  # bp: (T, B, S)
    else:
        sel_pdf = make_factored_select(in_pdf, P)

        def step(alpha, xs):
            t, ll_t = xs
            ga = sel_src(alpha).reshape(B, S, M)
            ac = sel_pdf(ll_t).reshape(B, S, M)
            score = ga + in_cost - acoustic_scale * ac
            bp_t = jnp.argmin(score, axis=2).astype(jnp.int32)  # (B, S)
            new_alpha = jnp.minimum(jnp.min(score, axis=2), BIG)
            active = (t < num_frames)[:, None]
            alpha = jnp.where(active, new_alpha, alpha)
            return alpha, bp_t

        alpha_T, bp = jax.lax.scan(
            step, graphs.init_cost, (ts, ll_seq), unroll=unroll
        )  # bp: (T, B, S)

    totals = alpha_T + graphs.final_cost
    end_state = jnp.argmin(totals, axis=1)  # (B,)
    total_cost = jnp.take_along_axis(totals, end_state[:, None], axis=1)[:, 0]
    failed = total_cost >= FAIL_THRESHOLD

    # ---- backtrace (reverse scan; lookups via one-hot einsums)
    in_tid_f = graphs.in_tid.astype(jnp.float32)  # (B, S, M); tids < 2^24

    def back_step(v, t):
        oh_v = jax.nn.one_hot(v, S, dtype=jnp.float32)          # (B, S)
        bp_t = bp[t]                                             # (B, S)
        m = jnp.einsum("bs,bs->b", oh_v, bp_t.astype(jnp.float32),
                       precision=_HI).astype(jnp.int32)          # (B,)
        oh_m = jax.nn.one_hot(m, M, dtype=jnp.float32)           # (B, M)
        tid = jnp.einsum(
            "bsm,bs,bm->b", in_tid_f, oh_v, oh_m, precision=_HI
        ).astype(jnp.int32)
        src = jnp.einsum(
            "bsm,bs,bm->b", graphs.in_src.astype(jnp.float32), oh_v, oh_m,
            precision=_HI,
        ).astype(jnp.int32)
        active = t < num_frames
        tid = jnp.where(active, tid, 0)
        prev = jnp.where(active, src, v)
        return prev, tid

    _, tids_rev = jax.lax.scan(
        back_step, end_state, jnp.arange(T - 1, -1, -1, dtype=jnp.int32),
        unroll=unroll,
    )
    tids = jnp.swapaxes(tids_rev[::-1], 0, 1)  # (B, T)

    # scaled acoustic cost of the chosen path
    frame_mask = jnp.arange(T)[None, :] < num_frames[:, None]
    pdf_ids = id2pdf[tids]
    ll = jnp.take_along_axis(
        loglikes, jnp.maximum(pdf_ids, 0)[..., None], axis=2
    )[..., 0]
    acoustic_cost = -acoustic_scale * jnp.sum(
        jnp.where(frame_mask, ll, 0.0), axis=1
    )
    return ViterbiResult(
        tids=tids,
        total_cost=total_cost,
        acoustic_cost=acoustic_cost,
        failed=failed,
    )
