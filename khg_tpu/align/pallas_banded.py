"""Fused Pallas TPU kernel: banded (offset-plane) Viterbi alignment.

The one-hot select of alpha[in_src] — the per-step cost of both the XLA
scan and the masked-sum kernel (align/pallas_viterbi.py) — disappears
entirely in the banded form (align/banded.py): after SCC-topological
renumbering every arc's source is `dest - d` for a small static offset
d, so the per-frame relaxation is

    cand[p] = roll(alpha, d_p) + plane_cost[p]      (static lane shifts)
    alpha'  = min(min_p cand[p] - scale * ac[t], BIG)

O(band * S) VPU ops per utterance per frame, zero per-step HBM traffic:
plane tables live in VMEM across the whole utterance, the acoustic
lattice ac[t, s] is one chunked MXU GEMM (exact 0/1 one-hot), and the
backtrace pointer-chase runs in-kernel over VMEM-resident backpointers.

Subtracting the (per-state uniform) acoustic term after the min is
bit-equivalent to the per-arc form: f32 subtraction by a common value
is monotone, so it commutes with min.  Ties between parallel arcs may
resolve to a different (equal-cost) arc than the XLA path's m-order.

Measured on TPU v5e (B=256, T=500, S=208->256, DK=32): forward +
backtrace 3.3 ms vs 20.8 ms for the XLA scan path (see BENCH.md).

Same role as the reference's FasterDecoder::Decode inner loops
(faster-decoder.cc:120-423), redesigned around TPU lane shifts.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from khg_tpu.align.banded import BandedGraphs
from khg_tpu.align.packed import BIG
from khg_tpu.align.viterbi import FAIL_THRESHOLD, ViterbiResult

_HI = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _banded_kernel(
    nf_ref,      # (1, Bb, 1) int32
    offs_ref,    # (1, DK, 1) int32 (shared across blocks)
    cost_ref,    # (1, DK, Bb, S) f32 (plane-major)
    tid_ref,     # (1, DK, Bb, S) f32 (tids are < 2^24: exact in f32)
    spdf_ref,    # (1, Bb, S) int32 (unused when external_ac)
    init_ref,    # (1, Bb, S) f32
    final_ref,   # (1, Bb, S) f32
    ll_ref,      # (1, Bb, Tpad, P) f32 loglikes — OR, when external_ac,
                 #   (1, Bb, Tpad, S) precomputed per-state acoustic
    tids_ref,    # out (1, Tpad, Bb) int32
    cost_out_ref,  # out (1, Bb, 1) f32
    *scratch,    # [ohpdf (Bb, S, P) bf16 — only when not external_ac],
                 # ac (Tc, Bb, S) f32,
                 # bp (Tpad, Bb, S) int8 (DK < 128; dim 0 dynamic:
                 #   full-tile stores, no read-modify-write)
    offsets: Tuple[int, ...],
    K: int,
    Tc: int,
    scale: float,
    external_ac: bool = False,
):
    _, DK, Bb, S = cost_ref.shape
    D = DK // K
    Tpad = ll_ref.shape[2]
    n_chunks = Tpad // Tc
    base = offsets[0]
    # offsets must be K copies each of a contiguous ascending range so
    # ONE strided roll produces every shifted alpha (asserted in wrapper)

    if external_ac:
        ac_ref, bp_ref = scratch
    else:
        ohpdf_ref, ac_ref, bp_ref = scratch
        P = ll_ref.shape[3]
        p_iota = jax.lax.broadcasted_iota(jnp.int32, (Bb, S, P), 2)
        ohpdf_ref[:] = (spdf_ref[0][:, :, None] == p_iota).astype(
            jnp.bfloat16
        )

    nf = nf_ref[0]  # (Bb, 1)
    cost4 = cost_ref[0].reshape(D, K, Bb, S)
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (D, K, Bb, S), 0)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (D, K, Bb, S), 1)
    dk_idx = d_iota * K + k_iota

    def relax(alpha):
        """One frame's plane sweep: (best, bp) without the acoustic.

        All D circular shifts of alpha come from a single strided roll
        (row d is roll(alpha, base+d), verified == np.roll semantics).
        """
        # pre-roll by base (shift < S), then stride rows 0..D-1 (< S):
        # composed circular shifts stay in range even for negative base
        pre = pltpu.roll(alpha, base % S, 1)
        xb = jnp.broadcast_to(pre[None], (D, Bb, S))
        rolled = pltpu.roll(xb, 0, 2, stride=1, stride_axis=0)
        cand = rolled[:, None] + cost4                    # (D, K, Bb, S)
        best = jnp.min(cand, axis=(0, 1))                 # (Bb, S)
        bp = jnp.min(                                     # first-match
            jnp.where(cand == best[None, None], dk_idx, DK), axis=(0, 1)
        ).astype(jnp.int8)
        return best, bp

    def chunk_body(c, alpha):
        if external_ac:  # the select already ran outside as one GEMM
            ac = ll_ref[0, :, pl.ds(c * Tc, Tc), :]  # (Bb, Tc, S)
        else:
            ll_chunk = ll_ref[0, :, pl.ds(c * Tc, Tc), :]  # (Bb, Tc, P)
            ac = jax.lax.dot_general(
                ll_chunk,
                ohpdf_ref[:].astype(jnp.float32),
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=_HI,
            )  # (Bb, Tc, S)
        ac_ref[:] = jnp.swapaxes(ac, 0, 1)  # (Tc, Bb, S): dim-0 step slices

        def step_body(i, alpha):
            t = c * Tc + i
            best, bp_t = relax(alpha)
            new_alpha = jnp.minimum(best - scale * ac_ref[i], BIG)
            bp_ref[pl.ds(t, 1)] = bp_t[None]
            active = t < nf  # (Bb, 1)
            return jnp.where(active, new_alpha, alpha)

        return jax.lax.fori_loop(0, Tc, step_body, alpha)

    alpha = jax.lax.fori_loop(0, n_chunks, chunk_body, init_ref[0])

    totals = alpha + final_ref[0]  # (Bb, S)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (Bb, S), 1)
    best_tot = jnp.min(totals, axis=1, keepdims=True)  # (Bb, 1)
    cost_out_ref[0] = best_tot
    v0 = jnp.min(
        jnp.where(totals == best_tot, s_iota, S), axis=1, keepdims=True
    )  # (Bb, 1) first-match argmin

    offs_col = offs_ref[0].astype(jnp.float32)  # (DK, 1)
    dk_iota_t = jax.lax.broadcasted_iota(jnp.int32, (DK, Bb), 0)

    def back_body(i, v):
        t = Tpad - 1 - i
        ov = (s_iota == v).astype(jnp.float32)              # (Bb, S)
        bp_t = bp_ref[t].astype(jnp.float32)
        p_t = jnp.sum(ov * bp_t, axis=1, keepdims=True).astype(jnp.int32)
        ohp = (dk_iota_t == p_t.reshape(1, Bb)).astype(jnp.float32)  # (DK, Bb)
        tid_sel = jnp.sum(
            ohp[:, :, None] * tid_ref[0], axis=0
        )                                                   # (Bb, S)
        tid = jnp.sum(ov * tid_sel, axis=1, keepdims=True)  # (Bb, 1)
        off = jnp.sum(ohp * offs_col, axis=0, keepdims=True)  # (1, Bb)
        active = t < nf                                     # (Bb, 1)
        tid_out = jnp.where(active, tid.astype(jnp.int32), 0)
        tids_ref[0, pl.ds(t, 1), :] = tid_out.reshape(1, Bb)
        v_new = jnp.remainder(v - off.reshape(Bb, 1).astype(jnp.int32), S)
        return jnp.where(active, v_new, v)

    jax.lax.fori_loop(0, Tpad, back_body, v0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "plane_offsets", "acoustic_scale", "block_b", "time_chunk",
        "interpret", "lane", "external_ac",
    ),
)
def viterbi_align_banded(
    banded: BandedGraphs,            # leading axis B (jnp/np arrays)
    plane_offsets: Tuple[int, ...],  # static, length DK
    loglikes: jnp.ndarray,           # (B, T, P) — or None with sac
    num_frames: jnp.ndarray,         # (B,) int32
    id2pdf: jnp.ndarray,             # (num_tids+1,) int32
    acoustic_scale: float = 1.0,
    block_b: int = 8,
    time_chunk: int = 128,
    interpret: bool = False,
    lane: int = 128,
    external_ac=None,                # None: auto (P > EXTERNAL_AC_PDFS)
    sac=None,                        # (B, T, S0) precomputed per-state ll
) -> ViterbiResult:
    """Exact banded Viterbi alignment (fused Pallas kernel).

    Use align.banded.band_renumber + pack_banded to build the inputs;
    fall back to align.viterbi.viterbi_align_batch when pack_banded
    returns None.

    For wide models (P > EXTERNAL_AC_PDFS, e.g. triphone systems) the
    per-state acoustic select runs OUTSIDE the kernel as one exact
    one-hot MXU GEMM and the kernel streams the (T, S) acoustic lattice
    instead of (T, P) loglikes — VMEM drops from O(Tpad*P) to
    O(Tpad*S) per block, and the P-wide in-kernel one-hot (which Mosaic
    fails to lower at P~2048) disappears.  Same math, identical
    alignments (pinned by tests).

    ``sac`` supplies the (B, T, S0) per-state UNSCALED log-likelihood
    lattice directly (e.g. from gmm.likelihoods.loglikes_per_state,
    which never scores the P-S pdfs outside the graph).  ``loglikes``
    may then be None; the result's ``acoustic_cost`` is returned as
    zeros in that case (only tests consume it — pass loglikes too if
    you need it).
    """
    B, DK, S0 = banded.plane_cost.shape
    if sac is not None:
        external_ac = True
        T = sac.shape[1]
        P = None  # never scored; only the (T, S) lattice enters
    else:
        T = loglikes.shape[1]
        P = loglikes.shape[2]
        if external_ac is None:
            external_ac = P > EXTERNAL_AC_PDFS

    Bp = _round_up(B, block_b)
    nB = Bp // block_b
    S = _round_up(S0, lane)
    Tc = min(time_chunk, _round_up(T, 8))
    Tpad = _round_up(T, Tc)

    def pad(x, shape, fill):
        out = jnp.full(shape, fill, dtype=x.dtype)
        return out.at[tuple(slice(0, d) for d in x.shape)].set(x)

    # NOTE state padding changes roll wraparound targets, but padded
    # plane slots cost BIG, which swamps any wrapped alpha (<= BIG):
    # padded states stay unreachable.
    plane_cost = pad(banded.plane_cost, (Bp, DK, S), BIG)
    plane_tid = pad(
        banded.plane_tid.astype(jnp.float32), (Bp, DK, S), 0.0
    )
    state_pdf = pad(banded.state_pdf, (Bp, S), 0)
    init_cost = pad(banded.init_cost, (Bp, S), BIG)
    final_cost = pad(banded.final_cost, (Bp, S), BIG)
    if external_ac:
        if sac is None:
            # exact 0/1 select on the MXU: sac[b,t,s] = ll[b,t,pdf(s)]
            oh = (
                jnp.asarray(banded.state_pdf)[:, :, None]
                == jnp.arange(P, dtype=jnp.int32)[None, None, :]
            ).astype(jnp.float32)  # (B, S0, P)
            sac = jnp.einsum(
                "btp,bsp->bts", loglikes, oh,
                precision=_HI, preferred_element_type=jnp.float32,
            )  # (B, T, S0)
        ll = pad(jnp.asarray(sac, jnp.float32), (Bp, Tpad, S), 0.0)
    else:
        ll = pad(loglikes, (Bp, Tpad, P), 0.0)
    nf = pad(num_frames.astype(jnp.int32)[:, None], (Bp, 1), 0)

    def blk(x, *trail):
        return x.reshape(nB, block_b, *trail)

    def plane_major(x):  # (Bp, DK, S) -> (nB, DK, Bb, S)
        return jnp.swapaxes(
            jnp.swapaxes(x, 0, 1).reshape(DK, nB, block_b, S), 0, 1
        )

    def spec(*block):
        return pl.BlockSpec(
            (1, *block), lambda i: (i,) + (0,) * len(block),
            memory_space=pltpu.VMEM,
        )

    offsets = tuple(int(d) for d in plane_offsets)
    assert DK < 128, "int8 backpointers require fewer than 128 planes"
    # the kernel derives every shifted alpha from one strided roll, which
    # requires K copies each of a contiguous ascending offset range (the
    # layout pack_banded emits)
    K = 1
    while K < len(offsets) and offsets[K] == offsets[0]:
        K += 1
    D = len(offsets) // K
    assert offsets == tuple(
        offsets[0] + i for i in range(D) for _ in range(K)
    ), "plane_offsets must be K copies each of a contiguous range"

    kernel = functools.partial(
        _banded_kernel,
        offsets=offsets,
        K=K,
        Tc=Tc,
        scale=float(acoustic_scale),
        external_ac=external_ac,
    )
    ll_width = S if external_ac else P
    scratch_shapes = [
        pltpu.VMEM((Tc, block_b, S), jnp.float32),
        pltpu.VMEM((Tpad, block_b, S), jnp.int8),
    ]
    if not external_ac:
        scratch_shapes.insert(0, pltpu.VMEM((block_b, S, P), jnp.bfloat16))
    tids_tb, cost = pl.pallas_call(
        kernel,
        grid=(nB,),
        in_specs=[
            spec(block_b, 1),
            pl.BlockSpec(
                (1, DK, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            spec(DK, block_b, S),
            spec(DK, block_b, S),
            spec(block_b, S),
            spec(block_b, S),
            spec(block_b, S),
            spec(block_b, Tpad, ll_width),
        ],
        out_specs=[
            spec(Tpad, block_b),
            spec(block_b, 1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nB, Tpad, block_b), jnp.int32),
            jax.ShapeDtypeStruct((nB, block_b, 1), jnp.float32),
        ],
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(
        blk(nf, 1),
        jnp.asarray(plane_offsets, dtype=jnp.int32).reshape(1, DK, 1),
        plane_major(plane_cost), plane_major(plane_tid),
        blk(state_pdf, S), blk(init_cost, S), blk(final_cost, S),
        blk(ll, Tpad, ll_width),
    )

    tids = jnp.swapaxes(tids_tb, 1, 2).reshape(Bp, Tpad)[:B, :T]
    total_cost = cost.reshape(Bp)[:B]
    failed = total_cost >= FAIL_THRESHOLD

    if loglikes is not None:
        frame_mask = jnp.arange(T)[None, :] < num_frames[:, None]
        pdf_ids = id2pdf[tids]
        ll_path = jnp.take_along_axis(
            loglikes, jnp.maximum(pdf_ids, 0)[..., None], axis=2
        )[..., 0]
        acoustic_cost = -acoustic_scale * jnp.sum(
            jnp.where(frame_mask, ll_path, 0.0), axis=1
        )
    else:  # sac-only mode: not computed (see docstring)
        acoustic_cost = jnp.zeros((B,), jnp.float32)
    return ViterbiResult(
        tids=tids,
        total_cost=total_cost,
        acoustic_cost=acoustic_cost,
        failed=failed,
    )


# above this pdf count the wrapper precomputes the acoustic lattice
# outside the kernel (one exact one-hot MXU GEMM) and streams (T, S)
# instead of (T, P) — see viterbi_align_banded(external_ac=...)
EXTERNAL_AC_PDFS = 512


def banded_vmem_bytes(
    B: int, DK: int, S0: int, T: int, P: int,
    block_b: int = 8, time_chunk: int = 128, lane: int = 128,
) -> int:
    """Approximate per-program VMEM footprint (gate with VMEM_BUDGET)."""
    S = _round_up(S0, lane)
    Pp = _round_up(P, lane)
    Tc = min(time_chunk, _round_up(T, 8))
    Tpad = _round_up(T, Tc)
    if P > EXTERNAL_AC_PDFS:  # external-acoustic mode: no P-wide blocks
        return (
            2 * 2 * block_b * DK * S * 4
            + block_b * Tc * S * 4
            + block_b * Tpad * S * 1
            + 2 * block_b * Tpad * S * 4  # sac block (double-buffered)
        )
    return (
        2 * 2 * block_b * DK * S * 4     # plane cost+tid (double-buffered)
        + block_b * S * Pp * 2           # pdf one-hot
        + block_b * Tc * S * 4           # acoustic chunk
        + block_b * Tpad * S * 1         # backpointers (int8)
        + 2 * block_b * Tpad * Pp * 4    # loglikes block (double-buffered)
    )


# v5e has ~128 MiB of VMEM; 60 MiB leaves headroom for Mosaic's own
# buffers and pipelining.  (The old 12 MiB gate, sized off the generic
# "~16 MB/core" rule plus a 4x-overcounted int8 term, forced block_b
# down to 8 and cost ~2x corpus-pass throughput.)
VMEM_BUDGET = 60 * 2**20

# Scratch (pltpu.VMEM scratch_shapes) draws from a SEPARATE scoped
# stack hard-limited to 16 MiB per grid step, independent of the block
# budget above — exceeding it is a compile error ("Scoped allocation
# ... exceeded scoped vmem limit"), observed at block_b=64 on the
# monophone bench config.  14 MiB leaves margin for Mosaic's own
# stack temporaries.
SCOPED_VMEM_BUDGET = 14 * 2**20


def banded_scratch_bytes(
    B: int, DK: int, S0: int, T: int, P: int,
    block_b: int = 8, time_chunk: int = 128, lane: int = 128,
) -> int:
    """Scoped-stack footprint of the kernel's scratch_shapes (the
    acoustic chunk, the int8 backpointers, and — in non-external mode —
    the pdf one-hot); must fit SCOPED_VMEM_BUDGET."""
    S = _round_up(S0, lane)
    Pp = _round_up(P, lane)
    Tc = min(time_chunk, _round_up(T, 8))
    Tpad = _round_up(T, Tc)
    n = block_b * Tc * S * 4 + block_b * Tpad * S * 1
    if P <= EXTERNAL_AC_PDFS:
        n += block_b * S * Pp * 2
    return n


def pick_block_b(
    vmem_fn, B: int, DK: int, S0: int, T: int, P: int,
    max_block_b: int = 64, budget: int = VMEM_BUDGET,
    scratch_fn=None, scratch_budget: int = SCOPED_VMEM_BUDGET,
):
    """Largest power-of-two block_b <= max_block_b whose estimated VMEM
    footprint fits ``budget`` AND whose scratch fits the scoped stack,
    or None if even block_b=1 does not (callers then use the XLA
    path)."""
    if scratch_fn is None:
        scratch_fn = banded_scratch_bytes

    def fits(bb):
        return (
            vmem_fn(B, DK, S0, T, P, block_b=bb) <= budget
            and scratch_fn(B, DK, S0, T, P, block_b=bb) <= scratch_budget
        )

    block_b = min(max_block_b, B)
    while block_b > 1 and not fits(block_b):
        block_b //= 2
    if not fits(block_b):
        return None
    return block_b
