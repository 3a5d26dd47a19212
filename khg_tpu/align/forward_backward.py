"""Forward-backward (Baum-Welch) over packed graphs as dense lax.scans.

Computes exact per-frame pdf occupation posteriors gamma[t, p] and
per-transition-id expected counts under the utterance's training graph —
the soft-EM alternative to Viterbi alignment.  Works in the log-prob
domain (negated costs):

  alpha[t+1][v] = logsumexp_m( alpha[t][in_src[v,m]] - in_cost[v,m]
                               + scale * ll[t, in_pdf[v,m]] )
  beta[t][s]    = logsumexp_m( beta[t+1][out_dst[s,m]] - out_cost[s,m]
                               + scale * ll[t, out_pdf[s,m]] )
  arc posterior = exp(alpha[t][s] + w + ll - logZ + beta[t+1][v])

Replaces nothing in the reference (it only does hard Viterbi-EM); the
BASELINE north star lists Baum-Welch as a first-class dense scan.
Memory: alpha is O(T·S); for long utterances pair with jax.checkpoint
time-chunking (SURVEY §5.7) — utterance batching, not sequence sharding,
is where the scale is.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from khg_tpu.align.packed import BIG

NEG_BIG = -1.0e30


class FBResult(NamedTuple):
    log_z: jnp.ndarray        # (B,) total log-prob of each utterance
    gamma: jnp.ndarray        # (B, T, P) per-frame pdf posteriors
    tid_counts: jnp.ndarray   # (B, num_tids+1) expected transition counts
    failed: jnp.ndarray       # (B,) bool (no complete path)


def _fb_single(
    in_src, in_pdf, in_cost, in_tid,
    out_dst, out_pdf, out_cost,
    init_cost, final_cost,
    loglikes,     # (T, P)
    num_frames,   # ()
    num_tids: int,
    acoustic_scale: float,
):
    T, P = loglikes.shape
    S, M = in_src.shape

    init = -init_cost  # log-prob domain
    init = jnp.maximum(init, NEG_BIG)
    fin = jnp.maximum(-final_cost, NEG_BIG)

    def fwd_step(alpha, xs):
        t, ll_t = xs
        contrib = (
            alpha[in_src]
            - in_cost
            + acoustic_scale * ll_t[in_pdf]
        )
        new_alpha = jax.nn.logsumexp(contrib, axis=1)
        new_alpha = jnp.maximum(new_alpha, NEG_BIG)
        active = t < num_frames
        alpha = jnp.where(active, new_alpha, alpha)
        return alpha, alpha

    ts = jnp.arange(T, dtype=jnp.int32)
    alpha_T, alphas_next = jax.lax.scan(fwd_step, init, (ts, loglikes))
    # alphas[t] = alpha AFTER consuming frame t; prepend initial
    alphas = jnp.concatenate([init[None], alphas_next], axis=0)  # (T+1, S)

    log_z = jax.nn.logsumexp(alpha_T + fin)
    failed = log_z < NEG_BIG / 2

    def bwd_step(beta, xs):
        t, ll_t = xs
        contrib = (
            beta[out_dst]
            - out_cost
            + acoustic_scale * ll_t[out_pdf]
        )
        new_beta = jax.nn.logsumexp(contrib, axis=1)
        new_beta = jnp.maximum(new_beta, NEG_BIG)
        active = t < num_frames
        beta = jnp.where(active, new_beta, beta)
        return beta, beta

    ts_rev = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    _, betas_rev = jax.lax.scan(bwd_step, fin, (ts_rev, loglikes[::-1]))
    betas = jnp.concatenate([betas_rev[::-1], fin[None]], axis=0)  # (T+1, S)

    # arc posteriors per frame (T, S, M) -> reduce to pdf/tid marginals.
    def gamma_step(_, xs):
        t, ll_t = xs
        # posterior of incoming arc (v, m) at frame t
        logp = (
            alphas[t][in_src]
            - in_cost
            + acoustic_scale * ll_t[in_pdf]
            + betas[t + 1][:, None]
            - log_z
        )
        post = jnp.exp(jnp.minimum(logp, 0.0))
        post = jnp.where(t < num_frames, post, 0.0)
        gamma_t = jax.ops.segment_sum(
            post.reshape(-1), in_pdf.reshape(-1), num_segments=P
        )
        tid_t = jax.ops.segment_sum(
            post.reshape(-1), in_tid.reshape(-1), num_segments=num_tids + 1
        )
        return None, (gamma_t, tid_t)

    _, (gamma, tid_counts_t) = jax.lax.scan(gamma_step, None, (ts, loglikes))
    tid_counts = jnp.sum(tid_counts_t, axis=0)
    tid_counts = tid_counts.at[0].set(0.0)
    return log_z, gamma, tid_counts, failed


@functools.partial(jax.jit, static_argnames=("num_tids", "acoustic_scale"))
def forward_backward_batch(
    graphs,                  # BatchedGraphs
    loglikes: jnp.ndarray,   # (B, T, P)
    num_frames: jnp.ndarray,  # (B,)
    num_tids: int,
    acoustic_scale: float = 1.0,
) -> FBResult:
    log_z, gamma, tid_counts, failed = jax.vmap(
        _fb_single, in_axes=(0,) * 9 + (0, 0, None, None)
    )(
        graphs.in_src, graphs.in_pdf, graphs.in_cost, graphs.in_tid,
        graphs.out_dst, graphs.out_pdf, graphs.out_cost,
        graphs.init_cost, graphs.final_cost,
        loglikes, num_frames, num_tids, acoustic_scale,
    )
    return FBResult(log_z, gamma, tid_counts, failed)
