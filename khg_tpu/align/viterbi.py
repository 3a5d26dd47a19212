"""Dense Viterbi alignment as a jitted lax.scan over packed graphs.

Per frame t and state v the DP is a (S, M) gather + min:

    score[v, m]  = alpha[in_src[v, m]] + in_cost[v, m]
                   - acoustic_scale * loglikes[t, in_pdf[v, m]]
    alpha'[v]    = min_m score[v, m];   bp[t, v] = argmin_m

followed by a reverse scan for the backtrace.  Everything is static-shape
and batched with vmap, so XLA fuses the whole per-frame update; the
acoustic matrix comes from the fused GMM GEMM (khg_tpu.gmm.likelihoods).

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


class ViterbiResult(NamedTuple):
    tids: jnp.ndarray        # (B, T) int32 frame alignment (0 past utt end)
    total_cost: jnp.ndarray  # (B,) float32 graph+acoustic cost of best path
    acoustic_cost: jnp.ndarray  # (B,) float32 acoustic part (scaled)
    failed: jnp.ndarray      # (B,) bool no complete path of length len


def _viterbi_single(
    in_src: jnp.ndarray,    # (S, M) int32
    in_pdf: jnp.ndarray,    # (S, M) int32
    in_cost: jnp.ndarray,   # (S, M) f32
    in_tid: jnp.ndarray,    # (S, M) int32
    init_cost: jnp.ndarray,  # (S,) f32
    final_cost: jnp.ndarray,  # (S,) f32
    loglikes: jnp.ndarray,  # (T, P) f32
    num_frames: jnp.ndarray,  # () int32
    acoustic_scale: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    T = loglikes.shape[0]
    S, M = in_src.shape

    def step(alpha, xs):
        t, ll_t = xs
        ac = -acoustic_scale * ll_t[in_pdf]          # (S, M)
        score = alpha[in_src] + in_cost + ac          # (S, M)
        bp_t = jnp.argmin(score, axis=1)              # (S,)
        new_alpha = jnp.min(score, axis=1)
        new_alpha = jnp.minimum(new_alpha, BIG)       # avoid overflow drift
        # past the end of the utterance the lattice is frozen
        active = t < num_frames
        alpha = jnp.where(active, new_alpha, alpha)
        return alpha, bp_t

    ts = jnp.arange(T, dtype=jnp.int32)
    alpha_T, bp = jax.lax.scan(step, init_cost, (ts, loglikes))

    totals = alpha_T + final_cost
    end_state = jnp.argmin(totals)
    total_cost = totals[end_state]
    failed = total_cost >= FAIL_THRESHOLD

    def back_step(v, t):
        active = t < num_frames
        m = bp[t, v]
        tid = jnp.where(active, in_tid[v, m], 0)
        prev = jnp.where(active, in_src[v, m], v)
        return prev, tid

    _, tids_rev = jax.lax.scan(
        back_step, end_state, jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    )
    tids = tids_rev[::-1]
    return tids, total_cost, jnp.asarray(failed)


@functools.partial(jax.jit, static_argnames=("acoustic_scale",))
def viterbi_align_batch(
    graphs,                   # BatchedGraphs (leading axis B)
    loglikes: jnp.ndarray,   # (B, T, P)
    num_frames: jnp.ndarray,  # (B,) int32
    id2pdf: jnp.ndarray,     # (num_tids+1,) int32
    acoustic_scale: float = 1.0,
) -> ViterbiResult:
    """Exact batched Viterbi alignment of B utterances."""
    tids, total_cost, failed = jax.vmap(
        _viterbi_single, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None)
    )(
        graphs.in_src, graphs.in_pdf, graphs.in_cost, graphs.in_tid,
        graphs.init_cost, graphs.final_cost,
        loglikes, num_frames, acoustic_scale,
    )
    # scaled acoustic cost of the chosen path
    B, T = tids.shape
    frame_mask = jnp.arange(T)[None, :] < num_frames[:, None]
    pdf_ids = id2pdf[tids]                       # (B, T)
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
