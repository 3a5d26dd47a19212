"""Pallas TPU kernel: fused aligned-state rescoring + local stats fold.

The XLA local-state fold (stats.accum.accumulate_am_stats_local) runs
four HBM-materializing stages: the per-state score GEMM writes a
(B, T, S, K) lattice (157 MB at bench triphone scale), the aligned-state
select reads it back, the posterior/moment fold forms a (B, T, K, 1+2D)
outer-product intermediate (~400 MB), and only then does the global
scatter GEMM consume the (B, S, K, 1+2D) local stats.  On-chip profiling
(tools/profile_stats.py, BENCH.md round 4) showed every one of those
stages is bandwidth-bound — their combined arithmetic is < 1 ms at the
f32 MXU peak, yet they measure ~7.5 ms standalone.

This kernel keeps the whole chain in VMEM: for each (batch, time-chunk)
block it recomputes the per-state component scores as ONE fused MXU GEMM
(model rows [means_invvars | -inv_vars/2 | gconst] against
[x | x^2 | 1] — the same O(B*T*S*K*D) contraction the XLA path pays,
but the (S*K, Tc) score tile never leaves VMEM), selects the aligned
state's components with an exact 0/1 one-hot multiply, forms posteriors,
and folds [occ | post*x | post*x^2] into per-state accumulators with
three small MXU dots.  HBM traffic drops from ~700 MB to the inputs and
the (B, S, K, 1+2D) output (~180 MB).

The global scatter to the (P, ...) accumulators stays OUTSIDE as one
exact 0/1 one-hot GEMM (it is MXU-compute-bound, not bandwidth-bound,
and P-wide one-hots do not lower inside Mosaic kernels).

Mirrors the reference semantics of AccumulateFromPosteriors over a
Viterbi alignment (kaldi-hmm-gmm/csrc/mle-diag-gmm.cc, AccumulateForGmm)
exactly as accumulate_am_stats_local does; parity is pinned by
tests/test_pallas_fold.py against the XLA fold.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from khg_tpu.stats.accum import DenseStats

_HI = jax.lax.Precision.HIGHEST
# finite stand-in for -inf gconsts (padding mixture components):
# exp(-1e30 - rowmax) underflows to exactly 0, so padded components get
# exactly zero posterior, while 0 * (-1e30) NaNs can never form because
# the one-hot select multiplies scores only AFTER this clamp.
_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fold_kernel(
    model_ref,   # (Bb, SK, D2p) f32 rows [miv | -iv/2 | gconst | 0pad]
    x2_ref,      # (Bb, D2p, Tc) f32 cols [x | x^2 | 1 | 0pad]
    oh_ref,      # (Bb, S, Tc)  f32 exact 0/1 aligned-state one-hot
    ohw_ref,     # (Bb, S, Tc)  f32 one-hot * frame weight
    m_out_ref,   # (Bb, S, K*D) f32 accumulated over time chunks
    v_out_ref,   # (Bb, S, K*D) f32
    occ_out_ref,  # (Bb, S, K) f32
    ll_out_ref,  # (Bb, 8, 128) f32 (total log-like, slot [0, 0])
    *,
    S: int,
    K: int,
    D: int,
):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        m_out_ref[...] = jnp.zeros_like(m_out_ref)
        v_out_ref[...] = jnp.zeros_like(v_out_ref)
        occ_out_ref[...] = jnp.zeros_like(occ_out_ref)
        ll_out_ref[...] = jnp.zeros_like(ll_out_ref)

    Bb = oh_ref.shape[0]
    Tc = x2_ref.shape[2]
    for b in range(Bb):  # static unroll over the batch block
        x2 = x2_ref[b]                                   # (D2p, Tc)
        # per-state component scores, one fused MXU GEMM; the gconst
        # column rides the contraction against the constant-1 feature
        # row.  HIGHEST throughout: a manual hi/lo-bf16 3-pass variant
        # was tried and produced silently wrong results on the real
        # chip (interpret-mode-correct — the known Mosaic failure
        # class), and profiling showed this dot is NOT the kernel's
        # bottleneck anyway (~10 us/utterance of MXU time).
        ssk = jax.lax.dot_general(
            model_ref[b], x2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_HI,
        )                                                # (S*K, Tc)
        ssk3 = ssk.reshape(S, K, Tc)
        oh = oh_ref[b]                                   # (S, Tc)
        # exact first-match select: one 0/1 row per frame (all-zero for
        # masked / padding frames -> sel column 0, posterior zeroed by wm)
        sel = jnp.sum(ssk3 * oh[:, None, :], axis=0)     # (K, Tc)
        mx = jnp.max(sel, axis=0, keepdims=True)         # (1, Tc)
        e = jnp.exp(sel - mx)
        z = jnp.sum(e, axis=0, keepdims=True)            # (1, Tc)
        ll = jnp.log(z) + mx                             # (1, Tc)
        wm = jnp.sum(ohw_ref[b], axis=0, keepdims=True)  # (1, Tc) w*matched
        post_w = e / z * wm                              # (K, Tc)

        x_part = x2[:D, :]                               # (D, Tc)
        xsq_part = x2[D:2 * D, :]                        # (D, Tc)
        pw = (post_w[:, None, :] * x_part[None, :, :]).reshape(K * D, Tc)
        pw2 = (post_w[:, None, :] * xsq_part[None, :, :]).reshape(K * D, Tc)
        contract_t = (((1,), (1,)), ((), ()))
        m_out_ref[b] += jax.lax.dot_general(
            oh, pw, contract_t,
            preferred_element_type=jnp.float32, precision=_HI,
        )                                                # (S, K*D)
        v_out_ref[b] += jax.lax.dot_general(
            oh, pw2, contract_t,
            preferred_element_type=jnp.float32, precision=_HI,
        )
        occ_out_ref[b] += jax.lax.dot_general(
            oh, post_w, contract_t,
            preferred_element_type=jnp.float32, precision=_HI,
        )                                                # (S, K)
        # total log-like rides out as an (8, 128) tile whose every slot
        # accumulates the chunk partial; consumers read slot [0, 0]
        llb = jnp.sum(ll * wm)                           # scalar
        ll_out_ref[b] += jnp.full((8, 128), llb, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("block_b", "time_chunk", "interpret"),
)
def accumulate_am_stats_fold_pallas(
    gconsts: jnp.ndarray,        # (P, K) f32, -inf padding components
    means_invvars: jnp.ndarray,  # (P, K, D)
    inv_vars: jnp.ndarray,       # (P, K, D)
    feats: jnp.ndarray,          # (B, T, D)
    pdf_ids: jnp.ndarray,        # (B, T) int32 aligned pdf per frame
    frame_weights: jnp.ndarray,  # (B, T) f32 (0 masks a frame out)
    state_pdf: jnp.ndarray,      # (B, S0) int32 pdf of each graph state
    block_b: int = 1,
    time_chunk: int = 128,
    interpret: bool = False,
) -> DenseStats:
    """Fused-kernel equivalent of stats.accum.accumulate_am_stats_local.

    Same contract: every w>0 frame's pdf must occur among its
    utterance's graph states; results match the XLA fold up to f32
    summation order (pinned by tests/test_pallas_fold.py).

    block_b stays 1: each utterance's per-state model pack is ~2 MB of
    VMEM at triphone-bench scale, so batching blocks overflows the
    16 MB scoped-VMEM stack (measured: block_b=4 OOMs at 22.8 MB,
    block_b=2 fails Mosaic compilation).

    Measured honestly (BENCH.md round 4): at triphone bench scale the
    end-to-end call is ~equal to the XLA fold (~5.7 ms vs ~5.5 ms) —
    the kernel removes the ~550 MB of HBM intermediates the XLA fold
    streams, but both paths are dominated by the shared XLA-side
    per-state model gather/pack and the HIGHEST global scatter GEMM.
    It is kept as an opt-in backend because its VMEM-resident middle
    is the right structure wherever the pack can be amortized.
    """
    P, K, D = means_invvars.shape
    B, T, _ = feats.shape
    S0 = state_pdf.shape[1]
    assert K % 8 == 0, "pack models with mix_pad_multiple >= 8"

    S = _round_up(S0, 8)
    D2 = 2 * D
    D2p = _round_up(D2 + 1, 128)
    Tc = min(time_chunk, _round_up(T, 8))
    Tp = _round_up(T, Tc)
    Bp = _round_up(B, block_b)

    # ---- host/XLA-side packing (cheap next to the fold itself) ----
    spdf = state_pdf
    if S != S0:
        spdf = jnp.pad(spdf, ((0, 0), (0, S - S0)), constant_values=-1)
    safe = jnp.maximum(spdf, 0)
    m_s = means_invvars[safe]                      # (B, S, K, D)
    v_s = inv_vars[safe]
    g_s = jnp.maximum(gconsts[safe], _NEG)         # (B, S, K) finite
    model = jnp.concatenate(
        [m_s, -0.5 * v_s, g_s[..., None]], axis=-1
    )                                              # (B, S, K, 2D+1)
    model = model.reshape(B, S * K, D2 + 1)
    model = jnp.pad(model, ((0, Bp - B), (0, 0), (0, D2p - (D2 + 1))))

    x2 = jnp.concatenate(
        [feats, jnp.square(feats),
         jnp.ones(feats.shape[:2] + (1,), feats.dtype)], axis=-1,
    )                                              # (B, T, 2D+1)
    x2 = jnp.pad(
        x2, ((0, Bp - B), (0, Tp - T), (0, D2p - (D2 + 1)))
    )
    x2t = jnp.swapaxes(x2, 1, 2)                   # (Bp, D2p, Tp)

    # first-match aligned local state (S0 if the pdf is absent -> no
    # one-hot row: the frame drops out of every output, as in the XLA
    # fold); exact 0/1 construction, no transposes
    iota = jnp.arange(S, dtype=jnp.int32)
    eq = spdf[:, :, None] == pdf_ids[:, None, :]   # (B, S, T)
    sidx = jnp.min(
        jnp.where(eq, iota[:, None], S), axis=1
    )                                              # (B, T)
    wpos = frame_weights > 0
    oh = (
        (sidx[:, None, :] == iota[None, :, None]) & wpos[:, None, :]
    ).astype(jnp.float32)                          # (B, S, T)
    ohw = oh * frame_weights[:, None, :]
    oh = jnp.pad(oh, ((0, Bp - B), (0, 0), (0, Tp - T)))
    ohw = jnp.pad(ohw, ((0, Bp - B), (0, 0), (0, Tp - T)))

    grid = (Bp // block_b, Tp // Tc)

    def bspec(*trail):
        return pl.BlockSpec(
            (block_b, *trail), lambda i, j: (i,) + (0,) * len(trail),
            memory_space=pltpu.VMEM,
        )

    def tspec(mid):
        return pl.BlockSpec(
            (block_b, mid, Tc), lambda i, j: (i, 0, j),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(_fold_kernel, S=S, K=K, D=D)
    m_out, v_out, occ_out, ll_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            bspec(S * K, D2p),
            tspec(D2p),
            tspec(S),
            tspec(S),
        ],
        out_specs=[
            bspec(S, K * D),
            bspec(S, K * D),
            bspec(S, K),
            bspec(8, 128),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, S, K * D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, S, K * D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, S, K), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(model, x2t, oh, ohw)

    # ---- global scatter: one exact 0/1 one-hot GEMM (unchanged) ----
    occ_l = occ_out[:B, :S0, :K]                   # (B, S0, K)
    m_l = m_out[:B, :S0].reshape(B, S0, K, D)
    v_l = v_out[:B, :S0].reshape(B, S0, K, D)
    local = jnp.concatenate(
        [occ_l[..., None], m_l, v_l], axis=-1
    )                                              # (B, S0, K, 1+2D)
    scatter = jax.nn.one_hot(state_pdf, P, dtype=jnp.float32)
    out = jnp.einsum(
        "bsp,bskq->pkq", scatter, local,
        preferred_element_type=jnp.float32, precision=_HI,
    )
    occ = out[..., 0]
    mean_acc = out[..., 1:1 + D]
    var_acc = out[..., 1 + D:]
    tot_log_like = jnp.sum(ll_out[:B, 0, 0])
    tot_frames = jnp.sum(ohw[:B])
    return DenseStats(occ, mean_acc, var_acc, tot_log_like, tot_frames)
