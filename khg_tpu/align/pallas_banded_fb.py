"""Fused Pallas TPU kernels: banded Baum-Welch forward-backward.

Log-semiring companion of align/pallas_banded.py: the per-frame
recursions run on banded plane tables (one strided lane-roll + add +
logsumexp over D offset planes), with the dest-uniform acoustic term
factored OUT of the plane logsumexp entirely:

    alpha[t+1] = logsumexp_d( roll(alpha[t], d) - cost_d ) + sac[t]
    beta[t]    = logsumexp_d( roll(beta[t+1] + sac[t], -d) - out_cost_d )
    post_d[t]  = exp( roll(alpha[t], d) - cost_d
                      + (sac[t] + beta[t+1] - logZ) )

where out_cost_d[s] = cost_d[s+d] (the in-planes pre-rolled to the
source view — no separate outgoing pack needed) and sac[t, s] is the
per-state scaled acoustic lattice (one one-hot GEMM outside).

Memory plan (the part that differs from Viterbi): the backward pass
needs every alpha[t].  Instead of streaming O(T*S) alphas through HBM,
the forward kernel emits one checkpoint per Tc-frame chunk and the
backward kernel RECOMPUTES each chunk's alphas from its checkpoint in
VMEM (one extra forward sweep, ~33% more flops for ~64x less alpha
traffic).  Both kernels run a (batch, time-chunk) grid; carries
(alpha / beta / plane-posterior accumulators) live in VMEM scratch,
which persists across grid steps and is re-initialized at each batch
block's first chunk.

Outputs are STATE posteriors; the pdf marginal gamma = state_post @
one_hot(state_pdf) and expected tid counts (scatter-add over plane
tids) are one cheap op each outside the kernels.

Same role as align/forward_backward.py (which remains the general
fallback); results agree to f32 association error.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from khg_tpu.align.banded import BandedGraphs
from khg_tpu.align.forward_backward import FBResult, NEG_BIG

_HI = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def banded_fb_vmem_bytes(
    B: int, DK: int, S0: int, T: int, P: int,
    block_b: int = 8, time_chunk: int = 64, lane: int = 128,
) -> int:
    """Approximate per-program VMEM footprint of the (larger) backward
    kernel; callers gate on ~12 MB.  ``P`` is unused (the acoustic GEMM
    runs outside the kernel) but kept for signature parity with
    pallas_banded.banded_vmem_bytes."""
    del B, P
    S = _round_up(S0, lane)
    Tc = min(time_chunk, _round_up(T, 8))
    return (
        2 * 2 * 2 * block_b * DK * S * 4  # ncost+nocost, double-buffered
        + 2 * 2 * Tc * block_b * S * 4    # sac in + spost out (dbl-buf)
        + Tc * block_b * S * 4            # alpha recompute scratch
        + 2 * DK * block_b * S * 4        # plane-posterior acc + apost out
        + 8 * block_b * S * 4             # init/fin/ckpt/beta/logz blocks
    )


def banded_fb_scratch_bytes(
    B: int, DK: int, S0: int, T: int, P: int,
    block_b: int = 8, time_chunk: int = 64, lane: int = 128,
) -> int:
    """Scoped-stack footprint of the FB kernels' scratch_shapes.  The
    backward kernel dominates: (Bb,S) beta + (DK,Bb,S) plane-posterior
    accumulator + (Tc,Bb,S) recomputed alpha, all f32 (the forward
    kernel's single (Bb,S) buffer is strictly smaller).  Distinct from
    banded_scratch_bytes (the Viterbi kernel's int8 backpointers + pdf
    one-hot), which overestimates FB scratch and needlessly halves its
    block sizes."""
    del B, P
    S = _round_up(S0, lane)
    Tc = min(time_chunk, _round_up(T, 8))
    return (1 + DK + Tc) * block_b * S * 4


def _plane_lse(cand):
    """logsumexp over the leading plane axis of (D, Bb, S), NEG_BIG floor."""
    m = jnp.max(cand, axis=0)
    m_safe = jnp.where(m > NEG_BIG / 2, m, 0.0)
    s = jnp.sum(jnp.exp(cand - m_safe[None]), axis=0)
    out = jnp.log(s) + m_safe
    return jnp.maximum(jnp.where(m > NEG_BIG / 2, out, NEG_BIG), NEG_BIG)


def _rolled_planes(x, base, D):
    """(D, Bb, S): row d = roll(x, base + d) along the lane axis."""
    S = x.shape[1]
    pre = pltpu.roll(x, base % S, 1)
    xb = jnp.broadcast_to(pre[None], (D,) + x.shape)
    return pltpu.roll(xb, 0, 2, stride=1, stride_axis=0)


def _fb_fwd_kernel(
    nf_ref,      # (1, Bb, 1) int32
    ncost_ref,   # (1, D, Bb, S) f32: NEGATED in-plane costs
    init_ref,    # (1, Bb, S) f32 (log domain: -init_cost)
    fin_ref,     # (1, Bb, S) f32 (log domain: -final_cost)
    sac_ref,     # (1, 1, Tc, Bb, S) f32 (this chunk)
    ckpt_ref,    # out (1, 1, Bb, S) f32: alpha at this chunk's START
    logz_ref,    # out (1, Bb, 1) f32
    alpha_ref,   # scratch VMEM (Bb, S) f32 (persists across chunks)
    *,
    base: int,
    Tc: int,
):
    _, D, Bb, S = ncost_ref.shape
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        alpha_ref[:] = init_ref[0]

    ckpt_ref[0, 0] = alpha_ref[:]
    nf = nf_ref[0]  # (Bb, 1)
    ncost = ncost_ref[0]

    def step(i, alpha):
        t = c * Tc + i
        cand = _rolled_planes(alpha, base, D) + ncost
        new_alpha = _plane_lse(cand) + sac_ref[0, 0, i]
        new_alpha = jnp.maximum(new_alpha, NEG_BIG)
        return jnp.where(t < nf, new_alpha, alpha)

    alpha_ref[:] = jax.lax.fori_loop(0, Tc, step, alpha_ref[:])

    @pl.when(c == n_chunks - 1)
    def _():
        tot = alpha_ref[:] + fin_ref[0]
        m = jnp.max(tot, axis=1, keepdims=True)
        m_safe = jnp.where(m > NEG_BIG / 2, m, 0.0)
        z = jnp.log(jnp.sum(jnp.exp(tot - m_safe), axis=1, keepdims=True))
        logz_ref[0] = jnp.maximum(
            jnp.where(m > NEG_BIG / 2, z + m_safe, NEG_BIG), NEG_BIG
        )


def _fb_bwd_kernel(
    nf_ref,      # (1, Bb, 1) int32
    ncost_ref,   # (1, D, Bb, S) f32: NEGATED in-plane costs
    nocost_ref,  # (1, D, Bb, S) f32: NEGATED out-plane costs, PLANE-FLIPPED
                 #   (row d' = out-plane for offset D-1-d', so the beta
                 #   recursion uses the same ascending-stride roll)
    fin_ref,     # (1, Bb, S) f32
    logz_ref,    # (1, Bb, 1) f32
    ckpt_ref,    # (1, 1, Bb, S) f32 (this chunk's start alpha)
    sac_ref,     # (1, 1, Tc, Bb, S) f32
    spost_ref,   # out (1, 1, Tc, Bb, S) f32: state posteriors
    apost_ref,   # out (1, D, Bb, S) f32: summed plane posteriors
    beta_ref,    # scratch VMEM (Bb, S) f32 (persists across chunks)
    acc_ref,     # scratch VMEM (D, Bb, S) f32 (plane posterior accum)
    alpha_ref,   # scratch VMEM (Tc, Bb, S) f32 (recomputed chunk alphas)
    *,
    base: int,
    Tc: int,
):
    _, D, Bb, S = ncost_ref.shape
    c = pl.program_id(1)          # c-th grid step = time chunk nTc-1-c
    n_chunks = pl.num_programs(1)
    tc = n_chunks - 1 - c

    @pl.when(c == 0)
    def _():
        beta_ref[:] = fin_ref[0]
        acc_ref[:] = jnp.zeros((D, Bb, S), jnp.float32)

    nf = nf_ref[0]          # (Bb, 1)
    ncost = ncost_ref[0]
    nocost = nocost_ref[0]
    lz = logz_ref[0]        # (Bb, 1)

    # recompute this chunk's alphas from its checkpoint (alpha BEFORE
    # each frame of the chunk)
    def fwd_step(i, alpha):
        alpha_ref[pl.ds(i, 1)] = alpha[None]
        t = tc * Tc + i
        cand = _rolled_planes(alpha, base, D) + ncost
        new_alpha = jnp.maximum(_plane_lse(cand) + sac_ref[0, 0, i], NEG_BIG)
        return jnp.where(t < nf, new_alpha, alpha)

    jax.lax.fori_loop(0, Tc, fwd_step, ckpt_ref[0, 0])

    def bwd_step(i_rev, beta):
        i = Tc - 1 - i_rev
        t = tc * Tc + i
        active = t < nf  # (Bb, 1)
        sac_t = sac_ref[0, 0, i]
        # plane posteriors: exp(roll(alpha,d) - cost_d + sac + beta' - logZ)
        logp = (
            _rolled_planes(alpha_ref[i], base, D)
            + ncost
            + (sac_t + beta - lz)[None]
        )
        post = jnp.exp(jnp.minimum(logp, 0.0))
        post = jnp.where(active[None], post, 0.0)
        acc_ref[:] = acc_ref[:] + post
        spost_ref[0, 0, pl.ds(i, 1)] = jnp.sum(post, axis=0)[None]
        # beta recursion: source view of (beta' + sac) through out planes.
        # Want roll(bplus, -(base+d)) per offset d; with d' = D-1-d the
        # shifts ascend (stride +1), matching the verified roll pattern,
        # and nocost arrives pre-flipped to the same d' order.
        bplus = beta + sac_t
        rolled_rev = _rolled_planes(bplus, -(base + D - 1), D)
        new_beta = jnp.maximum(_plane_lse(rolled_rev + nocost), NEG_BIG)
        return jnp.where(active, new_beta, beta)

    beta_ref[:] = jax.lax.fori_loop(0, Tc, bwd_step, beta_ref[:])

    @pl.when(c == n_chunks - 1)
    def _():
        apost_ref[0] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "plane_offsets", "num_tids", "acoustic_scale", "block_b",
        "time_chunk", "interpret", "lane",
    ),
)
def forward_backward_banded(
    banded: BandedGraphs,
    plane_offsets: Tuple[int, ...],
    loglikes: jnp.ndarray,    # (B, T, P)
    num_frames: jnp.ndarray,  # (B,)
    num_tids: int,
    acoustic_scale: float = 1.0,
    block_b: int = 16,
    time_chunk: int = 64,
    interpret: bool = False,
    lane: int = 128,
) -> FBResult:
    """Banded fused Baum-Welch (see module docstring).

    Inputs from align.banded.band_renumber + pack_banded called with
    ``reject_parallel=True`` — the sum semiring needs every parallel
    (src, dst) arc, but a plane cell holds exactly one, so packing must
    refuse graphs with duplicates; fall back to
    align.forward_backward.forward_backward_batch when it does.
    """
    B, D, S0 = banded.plane_cost.shape
    T, P = loglikes.shape[1:]
    offsets = tuple(int(d) for d in plane_offsets)
    base = offsets[0]
    assert offsets == tuple(base + i for i in range(D))

    Bp = _round_up(B, block_b)
    nB = Bp // block_b
    S = _round_up(S0, lane)
    Tc = min(time_chunk, _round_up(T, 8))
    Tpad = _round_up(T, Tc)
    nTc = Tpad // Tc

    def pad(x, shape, fill):
        out = jnp.full(shape, fill, dtype=x.dtype)
        return out.at[tuple(slice(0, d) for d in x.shape)].set(x)

    plane_cost = pad(banded.plane_cost, (Bp, D, S), np.float32(-NEG_BIG))
    ncost = -plane_cost  # negated: log-domain weights
    # out-planes: cost of the arc LEAVING s with offset d sits at dest
    # s+d in the in-plane -> pre-roll each plane to the source view;
    # plane axis FLIPPED to match the kernel's ascending-stride rolls
    nocost = jnp.stack(
        [
            jnp.roll(ncost[:, i], -d, axis=-1)
            for i, d in reversed(list(enumerate(offsets)))
        ],
        axis=1,
    )
    state_pdf = pad(banded.state_pdf, (Bp, S), 0)
    init = jnp.maximum(-pad(banded.init_cost, (Bp, S), np.float32(-NEG_BIG)),
                       NEG_BIG)
    fin = jnp.maximum(-pad(banded.final_cost, (Bp, S), np.float32(-NEG_BIG)),
                      NEG_BIG)
    nf = pad(num_frames.astype(jnp.int32)[:, None], (Bp, 1), 0)

    # per-state scaled acoustic lattice (exact one-hot GEMM, outside)
    ohp = jax.nn.one_hot(state_pdf, P, dtype=jnp.float32)  # (Bp, S, P)
    ll = pad(loglikes, (Bp, Tpad, P), 0.0)
    sac = acoustic_scale * jnp.einsum(
        "btp,bsp->bts", ll, ohp, precision=_HI,
        preferred_element_type=jnp.float32,
    )  # (Bp, Tpad, S)

    def blk(x, *trail):
        return x.reshape(nB, block_b, *trail)

    def pm(x):  # (Bp, D, S) -> (nB, D, Bb, S)
        return jnp.swapaxes(
            jnp.swapaxes(x, 0, 1).reshape(D, nB, block_b, S), 0, 1
        )

    # (Bp, Tpad, S) -> (nB, nTc, Tc, Bb, S)
    sac_blocks = jnp.transpose(
        sac.reshape(nB, block_b, nTc, Tc, S), (0, 2, 3, 1, 4)
    )

    def spec(*block, index=None):
        idx = index or (lambda i, c: (i,) + (0,) * len(block))
        return pl.BlockSpec((1, *block), idx, memory_space=pltpu.VMEM)

    chunk_fwd = lambda i, c: (i, c, 0, 0, 0)  # noqa: E731
    chunk_bwd = lambda i, c, n=nTc: (i, n - 1 - c, 0, 0, 0)  # noqa: E731

    fwd = functools.partial(_fb_fwd_kernel, base=base, Tc=Tc)
    ckpt, logz = pl.pallas_call(
        fwd,
        grid=(nB, nTc),
        in_specs=[
            spec(block_b, 1),
            spec(D, block_b, S),
            spec(block_b, S),
            spec(block_b, S),
            pl.BlockSpec(
                (1, 1, Tc, block_b, S), chunk_fwd, memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, block_b, S), lambda i, c: (i, c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_b, 1), lambda i, c: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nB, nTc, block_b, S), jnp.float32),
            jax.ShapeDtypeStruct((nB, block_b, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block_b, S), jnp.float32)],
        interpret=interpret,
    )(blk(nf, 1), pm(ncost), blk(init, S), blk(fin, S), sac_blocks)

    bwd = functools.partial(_fb_bwd_kernel, base=base, Tc=Tc)
    spost_blocks, apost = pl.pallas_call(
        bwd,
        grid=(nB, nTc),
        in_specs=[
            spec(block_b, 1),
            spec(D, block_b, S),
            spec(D, block_b, S),
            spec(block_b, S),
            spec(block_b, 1),
            pl.BlockSpec(
                (1, 1, block_b, S),
                lambda i, c, n=nTc: (i, n - 1 - c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Tc, block_b, S), chunk_bwd, memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, Tc, block_b, S), chunk_bwd, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, D, block_b, S), lambda i, c: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nB, nTc, Tc, block_b, S), jnp.float32),
            jax.ShapeDtypeStruct((nB, D, block_b, S), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, S), jnp.float32),
            pltpu.VMEM((D, block_b, S), jnp.float32),
            pltpu.VMEM((Tc, block_b, S), jnp.float32),
        ],
        interpret=interpret,
    )(
        blk(nf, 1), pm(ncost), pm(nocost), blk(fin, S), logz,
        ckpt, sac_blocks,
    )

    log_z = logz.reshape(Bp)[:B]
    failed = log_z < NEG_BIG / 2

    # (nB, nTc, Tc, Bb, S) -> (B, Tpad, S) -> gamma (B, T, P)
    spost = jnp.swapaxes(spost_blocks.reshape(nB, Tpad, block_b, S), 1, 2)
    spost = spost.reshape(Bp, Tpad, S)[:B, :T]
    gamma = jnp.einsum(
        "bts,bsp->btp", spost, ohp[:B], precision=_HI,
        preferred_element_type=jnp.float32,
    )

    # expected tid counts: scatter plane posteriors onto plane tids
    apost_b = jnp.swapaxes(apost.reshape(nB, D, block_b, S), 1, 2)
    apost_b = apost_b.reshape(Bp, D, S)[:B, :, :S0]
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None, None], (B, D, S0))
    tid_counts = jnp.zeros((B, num_tids + 1), jnp.float32).at[
        bidx.ravel(), banded.plane_tid.ravel()
    ].add(apost_b.ravel())
    tid_counts = tid_counts.at[:, 0].set(0.0)
    return FBResult(log_z, gamma, tid_counts, failed)
