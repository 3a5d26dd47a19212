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

As in the Viterbi engine, index lookups are one-hot einsums (exact
selects on the MXU), never gathers-in-scan, and per-arc posteriors are
reduced to pdf/tid marginals by one-hot matmuls; the gamma emission is
fused into the backward scan so there are exactly two scans.

Replaces nothing in the reference (it only does hard Viterbi-EM); the
BASELINE north star lists Baum-Welch as a first-class dense scan.
Memory: alphas are O(T·S); for long utterances pair with jax.checkpoint
time-chunking (SURVEY §5.7) — utterance batching, not sequence sharding,
is where the scale is.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_BIG = -1.0e30
_HI = jax.lax.Precision.HIGHEST


class FBResult(NamedTuple):
    log_z: jnp.ndarray        # (B,) total log-prob of each utterance
    gamma: jnp.ndarray        # (B, T, P) per-frame pdf posteriors
    tid_counts: jnp.ndarray   # (B, num_tids+1) expected transition counts
    failed: jnp.ndarray       # (B,) bool (no complete path)


@functools.partial(
    jax.jit,
    static_argnames=("num_tids", "acoustic_scale", "unroll", "time_chunk"),
)
def forward_backward_batch(
    graphs,                  # BatchedGraphs
    loglikes: jnp.ndarray,   # (B, T, P)
    num_frames: jnp.ndarray,  # (B,)
    num_tids: int,
    acoustic_scale: float = 1.0,
    unroll: int = 8,
    state_pdf=None,          # (B, S) int32 or None (align.packed.uniform_dest_pdf)
    time_chunk=None,         # int: checkpointed alphas (long utterances)
) -> FBResult:
    """``state_pdf`` enables the fast acoustic path (as in viterbi.py):
    when every arc into a state carries that state's pdf, the acoustic
    lattice is ONE one-hot GEMM outside the scans, and because the
    acoustic term then shares the arc-destination index with beta, BOTH
    per-arc pdf selects disappear — the backward step selects
    (beta + scale*ac) through the out_dst one-hots it already needed.

    ``time_chunk=C`` (state_pdf path only) trades FLOPs for memory on
    long utterances: the forward scan stores only every C-th alpha
    (T/C + 1 boundaries) and the backward pass recomputes each chunk's
    alphas from its boundary — alpha residency drops from O(T*B*S) to
    O((T/C + C)*B*S) for one extra forward pass of compute (the same
    remat plan the banded Pallas FB kernel uses).  Matches the
    unchunked path to compiler-fusion rounding (pinned by tests)."""
    if state_pdf is not None:
        if time_chunk is not None:
            return _forward_backward_state_pdf_chunked(
                graphs, loglikes, num_frames, num_tids, acoustic_scale,
                unroll, state_pdf, int(time_chunk),
            )
        return _forward_backward_state_pdf(
            graphs, loglikes, num_frames, num_tids, acoustic_scale,
            unroll, state_pdf,
        )
    B, S, M = graphs.in_src.shape
    Mo = graphs.out_dst.shape[2]
    T, P = loglikes.shape[1:]

    from khg_tpu.align.viterbi import make_factored_select

    sel_in_src = make_factored_select(graphs.in_src.reshape(B, S * M), S)
    sel_in_pdf = make_factored_select(graphs.in_pdf.reshape(B, S * M), P)
    sel_out_dst = make_factored_select(graphs.out_dst.reshape(B, S * Mo), S)
    sel_out_pdf = make_factored_select(graphs.out_pdf.reshape(B, S * Mo), P)
    # gamma scatter (post -> per-pdf sums) factored the same way:
    # gamma[b, hi*J+lo] = sum_x post[b,x] oh_hi[b,x,hi] oh_lo[b,x,lo]
    Gp = 1 << max(1, (P.bit_length() + 1) // 2)
    Jp = -(-P // Gp)
    in_pdf_flat = graphs.in_pdf.reshape(B, S * M)
    oh_pdf_hi = jax.nn.one_hot(in_pdf_flat // Jp, Gp, dtype=jnp.float32)
    oh_pdf_lo = jax.nn.one_hot(in_pdf_flat % Jp, Jp, dtype=jnp.float32)
    oh_in_tid = jax.nn.one_hot(
        graphs.in_tid.reshape(B, S * M), num_tids + 1, dtype=jnp.float32
    )
    in_cost = graphs.in_cost
    out_cost = graphs.out_cost

    init = jnp.maximum(-graphs.init_cost, NEG_BIG)
    fin = jnp.maximum(-graphs.final_cost, NEG_BIG)
    ts = jnp.arange(T, dtype=jnp.int32)
    ll_seq = jnp.swapaxes(loglikes, 0, 1)  # (T, B, P)

    def fwd_step(alpha, xs):
        t, ll_t = xs
        ga = sel_in_src(alpha).reshape(B, S, M)
        ac = sel_in_pdf(ll_t).reshape(B, S, M)
        contrib = ga - in_cost + acoustic_scale * ac
        new_alpha = jnp.maximum(jax.nn.logsumexp(contrib, axis=2), NEG_BIG)
        active = (t < num_frames)[:, None]
        alpha = jnp.where(active, new_alpha, alpha)
        return alpha, alpha

    alpha_T, alphas_next = jax.lax.scan(
        fwd_step, init, (ts, ll_seq), unroll=unroll
    )
    alphas = jnp.concatenate([init[None], alphas_next], axis=0)  # (T+1, B, S)

    log_z = jax.nn.logsumexp(alpha_T + fin, axis=1)  # (B,)
    failed = log_z < NEG_BIG / 2

    # backward scan over reversed time; emits gamma_t and accumulates
    # per-arc posteriors for transition counts
    def bwd_step(carry, xs):
        beta, arc_post_sum = carry  # beta = beta[t+1]; (B, S), (B, S*M)
        t, ll_t, alpha_t = xs       # alpha_t = alphas[t]
        # arc posteriors at frame t (incoming-arc view)
        ga = sel_in_src(alpha_t).reshape(B, S, M)
        ac = sel_in_pdf(ll_t).reshape(B, S, M)
        logp = (
            ga - in_cost + acoustic_scale * ac
            + beta[:, :, None] - log_z[:, None, None]
        )
        post = jnp.exp(jnp.minimum(logp, 0.0))
        post = jnp.where((t < num_frames)[:, None, None], post, 0.0)
        post_flat = post.reshape(B, S * M)
        gamma_t = jnp.einsum(
            "bx,bxg,bxj->bgj", post_flat, oh_pdf_hi, oh_pdf_lo,
            precision=_HI, preferred_element_type=jnp.float32,
        ).reshape(B, Gp * Jp)[:, :P]
        arc_post_sum = arc_post_sum + post_flat
        # beta recursion (outgoing-arc view)
        gb = sel_out_dst(beta).reshape(B, S, Mo)
        aco = sel_out_pdf(ll_t).reshape(B, S, Mo)
        contrib = gb - out_cost + acoustic_scale * aco
        new_beta = jnp.maximum(jax.nn.logsumexp(contrib, axis=2), NEG_BIG)
        beta = jnp.where((t < num_frames)[:, None], new_beta, beta)
        return (beta, arc_post_sum), gamma_t

    ts_rev = ts[::-1]
    (beta0, arc_post_sum), gammas_rev = jax.lax.scan(
        bwd_step,
        (fin, jnp.zeros((B, S * M), jnp.float32)),
        (ts_rev, ll_seq[::-1], alphas[:-1][::-1]),
        unroll=unroll,
    )
    gamma = jnp.swapaxes(gammas_rev[::-1], 0, 1)  # (B, T, P)

    tid_counts = jnp.einsum(
        "bx,bxn->bn", arc_post_sum, oh_in_tid,
        precision=_HI, preferred_element_type=jnp.float32,
    )
    tid_counts = tid_counts.at[:, 0].set(0.0)
    return FBResult(log_z, gamma, tid_counts, failed)


def _forward_backward_state_pdf_chunked(
    graphs, loglikes, num_frames, num_tids, acoustic_scale, unroll,
    state_pdf, chunk,
) -> FBResult:
    """Checkpointed variant of _forward_backward_state_pdf (same math,
    see forward_backward_batch(time_chunk=...))."""
    B, S, M = graphs.in_src.shape
    Mo = graphs.out_dst.shape[2]
    T, P = loglikes.shape[1:]
    C = max(1, min(chunk, T))
    nC = -(-T // C)
    Tp = nC * C

    from khg_tpu.align.viterbi import make_factored_select

    bf16 = jnp.bfloat16
    sel_in_src = make_factored_select(
        graphs.in_src.reshape(B, S * M), S, mask_dtype=bf16
    )
    sel_out_dst = make_factored_select(
        graphs.out_dst.reshape(B, S * Mo), S, mask_dtype=bf16
    )
    oh_state_pdf = jax.nn.one_hot(state_pdf, P, dtype=jnp.float32)
    oh_in_tid = jax.nn.one_hot(
        graphs.in_tid.reshape(B, S * M), num_tids + 1, dtype=jnp.float32
    )
    in_cost = graphs.in_cost
    out_cost = graphs.out_cost

    sac_seq = acoustic_scale * jnp.einsum(
        "btp,bsp->tbs", loglikes, oh_state_pdf,
        precision=_HI, preferred_element_type=jnp.float32,
    )  # (T, B, S)
    if Tp > T:  # padding frames are masked inactive (t >= num_frames)
        sac_seq = jnp.concatenate(
            [sac_seq, jnp.zeros((Tp - T, B, S), sac_seq.dtype)], axis=0
        )
    ts = jnp.arange(Tp, dtype=jnp.int32)
    ts_chunks = ts.reshape(nC, C)
    sac_chunks = sac_seq.reshape(nC, C, B, S)

    init = jnp.maximum(-graphs.init_cost, NEG_BIG)
    fin = jnp.maximum(-graphs.final_cost, NEG_BIG)

    def fwd_step(alpha, xs):
        t, sac_t = xs
        ga = sel_in_src(alpha).reshape(B, S, M)
        contrib = ga - in_cost + sac_t[:, :, None]
        new_alpha = jnp.maximum(jax.nn.logsumexp(contrib, axis=2), NEG_BIG)
        return jnp.where((t < num_frames)[:, None], new_alpha, alpha), None

    def fwd_chunk(alpha, xs):
        ts_c, sac_c = xs
        alpha2, _ = jax.lax.scan(fwd_step, alpha, (ts_c, sac_c), unroll=unroll)
        return alpha2, alpha  # emit the alpha at the chunk's START

    alpha_T, alpha_bounds = jax.lax.scan(
        fwd_chunk, init, (ts_chunks, sac_chunks)
    )  # alpha_bounds: (nC, B, S)

    log_z = jax.nn.logsumexp(alpha_T + fin, axis=1)
    failed = log_z < NEG_BIG / 2

    def refwd_step(alpha, xs):
        t, sac_t = xs
        ga = sel_in_src(alpha).reshape(B, S, M)
        contrib = ga - in_cost + sac_t[:, :, None]
        new_alpha = jnp.maximum(jax.nn.logsumexp(contrib, axis=2), NEG_BIG)
        alpha = jnp.where((t < num_frames)[:, None], new_alpha, alpha)
        return alpha, alpha

    def bwd_step(carry, xs):
        beta, arc_post_sum = carry
        t, sac_t, alpha_t = xs
        bplus = beta + sac_t
        ga = sel_in_src(alpha_t).reshape(B, S, M)
        logp = ga - in_cost + (bplus - log_z[:, None])[:, :, None]
        post = jnp.exp(jnp.minimum(logp, 0.0))
        post = jnp.where((t < num_frames)[:, None, None], post, 0.0)
        state_post = jnp.sum(post, axis=2)
        gamma_t = jnp.einsum(
            "bs,bsp->bp", state_post, oh_state_pdf,
            precision=_HI, preferred_element_type=jnp.float32,
        )
        arc_post_sum = arc_post_sum + post.reshape(B, S * M)
        gb = sel_out_dst(bplus).reshape(B, S, Mo)
        new_beta = jnp.maximum(
            jax.nn.logsumexp(gb - out_cost, axis=2), NEG_BIG
        )
        beta = jnp.where((t < num_frames)[:, None], new_beta, beta)
        return (beta, arc_post_sum), gamma_t

    def bwd_chunk(carry, xs):
        ts_c, sac_c, alpha0 = xs  # chunk contents in FORWARD order
        _, alphas_after = jax.lax.scan(
            refwd_step, alpha0, (ts_c, sac_c), unroll=unroll
        )
        alphas_before = jnp.concatenate(
            [alpha0[None], alphas_after[:-1]], axis=0
        )
        carry, gam_rev = jax.lax.scan(
            bwd_step, carry,
            (ts_c[::-1], sac_c[::-1], alphas_before[::-1]),
            unroll=unroll,
        )
        return carry, gam_rev  # (C, B, P), reversed within the chunk

    (beta0, arc_post_sum), gam_chunks = jax.lax.scan(
        bwd_chunk,
        (fin, jnp.zeros((B, S * M), jnp.float32)),
        (ts_chunks[::-1], sac_chunks[::-1], alpha_bounds[::-1]),
    )
    # chunks arrive last-first, steps reversed within each: undo both
    gamma = jnp.swapaxes(
        gam_chunks[::-1, ::-1].reshape(Tp, B, P)[:T], 0, 1
    )  # (B, T, P)

    tid_counts = jnp.einsum(
        "bx,bxn->bn", arc_post_sum, oh_in_tid,
        precision=_HI, preferred_element_type=jnp.float32,
    )
    tid_counts = tid_counts.at[:, 0].set(0.0)
    return FBResult(log_z, gamma, tid_counts, failed)


def _forward_backward_state_pdf(
    graphs, loglikes, num_frames, num_tids, acoustic_scale, unroll, state_pdf
) -> FBResult:
    """Fast path: dest-uniform pdfs (see forward_backward_batch).

    The acoustic term indexes by arc DESTINATION, so it broadcasts over
    incoming arcs (forward / posterior) and rides the out_dst select
    (backward) — no per-arc pdf selects, no per-step pdf one-hots.
    """
    B, S, M = graphs.in_src.shape
    Mo = graphs.out_dst.shape[2]
    T, P = loglikes.shape[1:]

    from khg_tpu.align.viterbi import make_factored_select

    bf16 = jnp.bfloat16
    sel_in_src = make_factored_select(
        graphs.in_src.reshape(B, S * M), S, mask_dtype=bf16
    )
    sel_out_dst = make_factored_select(
        graphs.out_dst.reshape(B, S * Mo), S, mask_dtype=bf16
    )
    oh_state_pdf = jax.nn.one_hot(state_pdf, P, dtype=jnp.float32)  # (B,S,P)
    oh_in_tid = jax.nn.one_hot(
        graphs.in_tid.reshape(B, S * M), num_tids + 1, dtype=jnp.float32
    )
    in_cost = graphs.in_cost
    out_cost = graphs.out_cost

    # per-state scaled acoustic lattice for ALL frames: one MXU GEMM
    sac_seq = acoustic_scale * jnp.einsum(
        "btp,bsp->tbs", loglikes, oh_state_pdf,
        precision=_HI, preferred_element_type=jnp.float32,
    )  # (T, B, S)

    init = jnp.maximum(-graphs.init_cost, NEG_BIG)
    fin = jnp.maximum(-graphs.final_cost, NEG_BIG)
    ts = jnp.arange(T, dtype=jnp.int32)

    def fwd_step(alpha, xs):
        t, sac_t = xs
        ga = sel_in_src(alpha).reshape(B, S, M)
        contrib = ga - in_cost + sac_t[:, :, None]
        new_alpha = jnp.maximum(jax.nn.logsumexp(contrib, axis=2), NEG_BIG)
        active = (t < num_frames)[:, None]
        alpha = jnp.where(active, new_alpha, alpha)
        return alpha, alpha

    alpha_T, alphas_next = jax.lax.scan(
        fwd_step, init, (ts, sac_seq), unroll=unroll
    )
    alphas = jnp.concatenate([init[None], alphas_next], axis=0)  # (T+1, B, S)

    log_z = jax.nn.logsumexp(alpha_T + fin, axis=1)  # (B,)
    failed = log_z < NEG_BIG / 2

    def bwd_step(carry, xs):
        beta, arc_post_sum = carry  # beta = beta[t+1]; (B, S), (B, S*M)
        t, sac_t, alpha_t = xs
        # dest-indexed terms share one vector: beta + scale*ac - logZ
        bplus = beta + sac_t
        ga = sel_in_src(alpha_t).reshape(B, S, M)
        logp = ga - in_cost + (bplus - log_z[:, None])[:, :, None]
        post = jnp.exp(jnp.minimum(logp, 0.0))
        post = jnp.where((t < num_frames)[:, None, None], post, 0.0)
        post_flat = post.reshape(B, S * M)
        # gamma via STATE posteriors (pdf is a function of the state)
        state_post = jnp.sum(post, axis=2)  # (B, S)
        gamma_t = jnp.einsum(
            "bs,bsp->bp", state_post, oh_state_pdf,
            precision=_HI, preferred_element_type=jnp.float32,
        )
        arc_post_sum = arc_post_sum + post_flat
        # beta recursion: ONE select of (beta + scale*ac) over out_dst
        gb = sel_out_dst(bplus).reshape(B, S, Mo)
        new_beta = jnp.maximum(
            jax.nn.logsumexp(gb - out_cost, axis=2), NEG_BIG
        )
        beta = jnp.where((t < num_frames)[:, None], new_beta, beta)
        return (beta, arc_post_sum), gamma_t

    (beta0, arc_post_sum), gammas_rev = jax.lax.scan(
        bwd_step,
        (fin, jnp.zeros((B, S * M), jnp.float32)),
        (ts[::-1], sac_seq[::-1], alphas[:-1][::-1]),
        unroll=unroll,
    )
    gamma = jnp.swapaxes(gammas_rev[::-1], 0, 1)  # (B, T, P)

    tid_counts = jnp.einsum(
        "bx,bxn->bn", arc_post_sum, oh_in_tid,
        precision=_HI, preferred_element_type=jnp.float32,
    )
    tid_counts = tid_counts.at[:, 0].set(0.0)
    return FBResult(log_z, gamma, tid_counts, failed)
