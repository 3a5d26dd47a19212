"""Fused Pallas TPU kernel: exact batched Viterbi alignment.

The XLA path (khg_tpu.align.viterbi) runs the (T, S) DP as a lax.scan:
every frame is a separate step with its own dispatch overhead, and the
one-hot selection operands are re-streamed from HBM each step — at
B=256 the scan, not the math, dominates the E-step (BENCH.md).

This kernel runs the ENTIRE time loop (forward DP + backtrace) in one
pallas_call per batch block:

- the per-utterance graph tables and their one-hot selection masks are
  built once into VMEM scratch and stay resident across all T steps;
- the acoustic term ll[t, in_pdf[x]] has no sequential dependency, so it
  is precomputed for Tc-frame chunks as ONE batched one-hot GEMM on the
  MXU (exact for 0/1 masks at HIGHEST precision);
- the sequential part per frame is a VPU masked-sum select of
  alpha[in_src] (bfloat16 0/1 mask x f32 value -> exact f32), a min and
  a first-match argmin — no HBM traffic at all;
- the backtrace pointer-chase runs in-kernel over the VMEM-resident
  backpointers, emitting one (Bb,) tid row per frame.

Arithmetic is ordered identically to the XLA path, so tids and costs
match it bit-exactly (tested in tests/test_pallas_viterbi.py).

STATUS (measured on TPU v5e, B=256 x T=500, S=208, M=4): this kernel is
bit-exact but NOT yet faster than the XLA scan (221 ms vs 42.7 ms): the
per-step masked-sum select does X*S VPU work per utterance where the
XLA path's factored one-hot select does X*(J+G) MACs on the MXU across
the whole batch.  The XLA path with the per-state acoustic precompute
(align/viterbi.py state_pdf) is the production path; this kernel is the
foundation for a banded (roll-plane) variant whose per-step work is
O(D*S) per utterance.

Every operand is reshaped to (num_blocks, Bb, ...) with full-size
trailing block dims: Mosaic requires the last two block dims to be
(8, 128)-divisible OR equal to the array dims, and the equal-dims form
frees the batch block size from tiling constraints.

Same role as the reference's FasterDecoder::Decode inner loops
(faster-decoder.cc:120-423), redesigned as a dense DP kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from khg_tpu.align.packed import BIG
from khg_tpu.align.viterbi import FAIL_THRESHOLD, ViterbiResult

_HI = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _viterbi_kernel(
    nf_ref,      # (1, Bb, 1) int32
    insrc_ref,   # (1, Bb, X) int32, X = M*S, x = m*S + s
    inpdf_ref,   # (1, Bb, X) int32
    incost_ref,  # (1, Bb, X) f32
    intid_ref,   # (1, Bb, X) int32
    init_ref,    # (1, Bb, S) f32
    final_ref,   # (1, Bb, S) f32
    ll_ref,      # (1, Bb, Tpad, P) f32
    tids_ref,    # out (1, Tpad, Bb) int32
    cost_ref,    # out (1, Bb, 1) f32
    ohsrc_ref,   # scratch VMEM (Bb, X, S) bf16
    ohpdf_ref,   # scratch VMEM (Bb, X, P) bf16
    ac_ref,      # scratch VMEM (Bb, Tc, X) f32
    bp_ref,      # scratch VMEM (Bb, Tpad, S) int32
    *,
    S: int,
    M: int,
    Tc: int,
    scale: float,
):
    _, Bb, X = insrc_ref.shape
    P = ll_ref.shape[3]
    Tpad = ll_ref.shape[2]
    n_chunks = Tpad // Tc

    # one-hot selection masks, built once, resident across all T steps
    # (bf16 0/1 is exact; products with f32 promote to f32 first)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (Bb, X, S), 2)
    ohsrc_ref[:] = (insrc_ref[0][:, :, None] == s_iota).astype(jnp.bfloat16)
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (Bb, X, P), 2)
    ohpdf_ref[:] = (inpdf_ref[0][:, :, None] == p_iota).astype(jnp.bfloat16)

    # NOTE: every intermediate is kept rank >= 2 (keepdims=True etc.) —
    # Mosaic's vector layouts reject rank-1 values.
    nf = nf_ref[0]              # (Bb, 1)
    in_cost = incost_ref[0]     # (Bb, X)
    m_iota3 = jax.lax.broadcasted_iota(jnp.int32, (Bb, M, S), 1)

    def chunk_body(c, alpha):
        # acoustic select for the whole chunk: one MXU GEMM (exact 0/1 mask)
        ll_chunk = ll_ref[0, :, pl.ds(c * Tc, Tc), :]  # (Bb, Tc, P)
        ac_ref[:] = jax.lax.dot_general(
            ll_chunk,
            ohpdf_ref[:].astype(jnp.float32),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_HI,
        )  # (Bb, Tc, X)

        def step_body(i, alpha):
            t = c * Tc + i
            # exact select alpha[in_src]: bf16 0/1 mask * f32 value
            ga = jnp.sum(
                ohsrc_ref[:].astype(jnp.float32) * alpha[:, None, :], axis=2
            )  # (Bb, X)
            score = ga + in_cost - scale * ac_ref[:, i, :]
            s3 = score.reshape(Bb, M, S)
            min3 = jnp.min(s3, axis=1)
            new_alpha = jnp.minimum(min3, BIG)
            # first-match argmin as a pure min-reduce (same tie-breaking
            # as jnp.argmin in the XLA path)
            bp_t = jnp.min(
                jnp.where(s3 == min3[:, None, :], m_iota3, M), axis=1
            ).astype(jnp.int32)  # (Bb, S)
            bp_ref[:, pl.ds(t, 1), :] = bp_t[:, None, :]
            active = t < nf  # (Bb, 1)
            return jnp.where(active, new_alpha, alpha)

        return jax.lax.fori_loop(0, Tc, step_body, alpha)

    alpha = jax.lax.fori_loop(0, n_chunks, chunk_body, init_ref[0])

    totals = alpha + final_ref[0]  # (Bb, S)
    s_iota2 = jax.lax.broadcasted_iota(jnp.int32, (Bb, S), 1)
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (Bb, M), 1)
    best = jnp.min(totals, axis=1, keepdims=True)  # (Bb, 1)
    cost_ref[0] = best
    end = jnp.min(
        jnp.where(totals == best, s_iota2, S), axis=1, keepdims=True
    )  # (Bb, 1) first-match argmin
    ov0 = (s_iota2 == end).astype(jnp.float32)

    in_tid3 = intid_ref[0].astype(jnp.float32).reshape(Bb, M, S)
    in_src3 = insrc_ref[0].astype(jnp.float32).reshape(Bb, M, S)

    def back_body(i, ov):
        t = Tpad - 1 - i
        bp_t = bp_ref[:, t, :].astype(jnp.float32)  # (Bb, S)
        m_t = jnp.sum(ov * bp_t, axis=1, keepdims=True).astype(jnp.int32)
        ohm = (m_iota == m_t).astype(jnp.float32)           # (Bb, M)
        ohx = ohm[:, :, None] * ov[:, None, :]              # (Bb, M, S)
        tid = jnp.sum(in_tid3 * ohx, axis=1)                # (Bb, S)
        tid = jnp.sum(tid, axis=1, keepdims=True)           # (Bb, 1)
        src = jnp.sum(jnp.sum(in_src3 * ohx, axis=1), axis=1, keepdims=True)
        src = src.astype(jnp.int32)                         # (Bb, 1)
        active = t < nf                                     # (Bb, 1)
        tid_out = jnp.where(active, tid.astype(jnp.int32), 0)  # (Bb, 1)
        tids_ref[0, pl.ds(t, 1), :] = tid_out.reshape(1, Bb)
        ov_new = (s_iota2 == src).astype(jnp.float32)
        return jnp.where(active, ov_new, ov)

    jax.lax.fori_loop(0, Tpad, back_body, ov0)


@functools.partial(
    jax.jit,
    static_argnames=("acoustic_scale", "block_b", "time_chunk", "interpret", "lane"),
)
def viterbi_align_batch_pallas(
    graphs,                   # BatchedGraphs (leading axis B)
    loglikes: jnp.ndarray,    # (B, T, P)
    num_frames: jnp.ndarray,  # (B,) int32
    id2pdf: jnp.ndarray,      # (num_tids+1,) int32
    acoustic_scale: float = 1.0,
    block_b: int = 4,
    time_chunk: int = 128,
    interpret: bool = False,
    lane: int = 128,
) -> ViterbiResult:
    """Exact batched Viterbi alignment, fused single-kernel Pallas path.

    Bit-identical to khg_tpu.align.viterbi.viterbi_align_batch (same
    arithmetic order); use that XLA path when shapes exceed VMEM
    (gate with viterbi_vmem_bytes).
    """
    B, S0, M = graphs.in_src.shape
    T = loglikes.shape[1]
    P = loglikes.shape[2]

    Bp = _round_up(B, block_b)
    nB = Bp // block_b
    S = _round_up(S0, lane)
    Tc = min(time_chunk, _round_up(T, 8))
    Tpad = _round_up(T, Tc)
    X = M * S

    def pad(x, shape, fill):
        out = jnp.full(shape, fill, dtype=x.dtype)
        return out.at[tuple(slice(0, d) for d in x.shape)].set(x)

    # (B, S, M) -> (nB, Bb, M*S) with x = m*S + s; padded arcs cost BIG
    def arcs(x, fill):
        x = pad(x, (Bp, S, M), fill)
        return jnp.swapaxes(x, 1, 2).reshape(nB, block_b, X)

    in_src = arcs(graphs.in_src, 0)
    in_pdf = arcs(graphs.in_pdf, 0)
    in_tid = arcs(graphs.in_tid, 0)
    in_cost = arcs(graphs.in_cost, BIG)
    init_cost = pad(graphs.init_cost, (Bp, S), BIG).reshape(nB, block_b, S)
    final_cost = pad(graphs.final_cost, (Bp, S), BIG).reshape(nB, block_b, S)
    ll = pad(loglikes, (Bp, Tpad, P), 0.0).reshape(nB, block_b, Tpad, P)
    nf = pad(num_frames.astype(jnp.int32)[:, None], (Bp, 1), 0)
    nf = nf.reshape(nB, block_b, 1)

    def spec(*block):
        return pl.BlockSpec(
            (1, *block), lambda i: (i,) + (0,) * len(block),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _viterbi_kernel, S=S, M=M, Tc=Tc, scale=float(acoustic_scale)
    )
    tids_tb, cost = pl.pallas_call(
        kernel,
        grid=(nB,),
        in_specs=[
            spec(block_b, 1),
            spec(block_b, X),
            spec(block_b, X),
            spec(block_b, X),
            spec(block_b, X),
            spec(block_b, S),
            spec(block_b, S),
            spec(block_b, Tpad, P),
        ],
        out_specs=[
            spec(Tpad, block_b),
            spec(block_b, 1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nB, Tpad, block_b), jnp.int32),
            jax.ShapeDtypeStruct((nB, block_b, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, X, S), jnp.bfloat16),
            pltpu.VMEM((block_b, X, P), jnp.bfloat16),
            pltpu.VMEM((block_b, Tc, X), jnp.float32),
            pltpu.VMEM((block_b, Tpad, S), jnp.int32),
        ],
        interpret=interpret,
    )(nf, in_src, in_pdf, in_cost, in_tid, init_cost, final_cost, ll)

    # (nB, Tpad, Bb) -> (B, T)
    tids = jnp.swapaxes(tids_tb, 1, 2).reshape(Bp, Tpad)[:B, :T]
    total_cost = cost.reshape(Bp)[:B]
    failed = total_cost >= FAIL_THRESHOLD

    # scaled acoustic cost of the chosen path (outside any scan: batched
    # gathers are fine here)
    frame_mask = jnp.arange(T)[None, :] < num_frames[:, None]
    pdf_ids = id2pdf[tids]
    ll_path = jnp.take_along_axis(
        loglikes, jnp.maximum(pdf_ids, 0)[..., None], axis=2
    )[..., 0]
    acoustic_cost = -acoustic_scale * jnp.sum(
        jnp.where(frame_mask, ll_path, 0.0), axis=1
    )
    return ViterbiResult(
        tids=tids,
        total_cost=total_cost,
        acoustic_cost=acoustic_cost,
        failed=failed,
    )


def viterbi_vmem_bytes(
    B: int, S0: int, M: int, T: int, P: int,
    block_b: int = 4, time_chunk: int = 128, lane: int = 128,
) -> int:
    """Approximate per-program VMEM footprint (with lane padding of the
    trailing dims); callers gate on ~12 MB."""
    S = _round_up(S0, lane)
    X = M * S
    Pp = _round_up(P, lane)
    Tc = min(time_chunk, _round_up(T, 8))
    Tpad = _round_up(T, Tc)
    return (
        block_b * X * S * 2          # ohsrc bf16
        + block_b * X * Pp * 2       # ohpdf bf16
        + block_b * Tc * X * 4       # ac chunk
        + block_b * Tpad * S * 4     # backpointers
        + 2 * block_b * Tpad * Pp * 4  # loglikes block (double-buffered)
        + 4 * block_b * X * 4        # arc tables
    )
