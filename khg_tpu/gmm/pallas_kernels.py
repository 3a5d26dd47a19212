"""Pallas TPU kernel: fused GMM log-likelihoods.

The XLA path (khg_tpu.gmm.likelihoods) materializes per-component scores
(N, P*K) in HBM before the logsumexp reduces them to (N, P) — a K-fold
write/read amplification (e.g. 188 MB of traffic for a 12 MB result at
K=16).  This kernel fuses the GEMM with the per-pdf logsumexp epilogue:
scores live only in VMEM tiles, and only the (N, P) result ever touches
HBM.

Grid: (N/TN, P/TP).  Each program computes a (TN, TP*K) score tile on the
MXU and reduces K lanes per pdf in-register.

Padding contract (same as the XLA path): padding components have
gconst = -inf and zero model rows; padding pdfs produce garbage rows that
callers must ignore (they index only real pdf ids).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _loglikes_kernel(x_ref, model_ref, gconst_ref, gsel_ref, out_ref, *, precision):
    # x:      (TN, D2)
    # model:  (TP*K, D2)   rows are [means_invvars, -0.5*inv_vars]
    # gconst: (1, TP*K)    flattened, -BIG on padding components
    # gsel:   (TP*K, TP)   block-diagonal 0/1 group-sum selector
    # out:    (TN, TP)
    #
    # Group logsumexp without lane-splitting reshapes (Mosaic cannot split
    # the lane dim): stabilize by the ROW max, exponentiate, and sum each
    # K-lane group with a 0/1 selection matmul on the MXU.  Groups more
    # than ~85 nats below the row max underflow to -inf — irrelevant for
    # scoring (they can never win a path).
    scores = jax.lax.dot_general(
        x_ref[:],
        model_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ) + gconst_ref[0, :][None, :]  # (TN, TP*K)
    m_row = jnp.max(scores, axis=1, keepdims=True)  # (TN, 1)
    m_safe = jnp.where(m_row > -1e30, m_row, 0.0)
    e = jnp.exp(scores - m_safe)
    sums = jax.lax.dot_general(
        e,
        gsel_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TN, TP)
    out_ref[:] = jnp.log(sums) + m_safe


@functools.partial(
    jax.jit, static_argnames=("tn", "tp", "interpret", "compute_dtype")
)
def loglikes_pallas(
    gconsts: jnp.ndarray,        # (P, K) float32, -inf padding
    means_invvars: jnp.ndarray,  # (P, K, D)
    inv_vars: jnp.ndarray,       # (P, K, D)
    feats: jnp.ndarray,          # (..., T, D)
    tn: int = 256,
    tp: int = 128,
    interpret: bool = False,
    compute_dtype: Optional[str] = None,
) -> jnp.ndarray:
    """(..., T, P) total log-likelihoods, logsumexp fused into the GEMM."""
    P, K, D = means_invvars.shape
    lead = feats.shape[:-1]
    N = int(np.prod(lead)) if lead else 1
    x = feats.reshape(N, D)
    x2 = jnp.concatenate([x, jnp.square(x)], axis=1)  # (N, 2D)

    # pad shapes to tile multiples
    Np = _round_up(max(N, 1), tn)
    Pp = _round_up(P, tp)
    D2 = 2 * D
    D2p = _round_up(D2, 128)
    if Np != N or D2p != D2:
        x2 = jnp.pad(x2, ((0, Np - N), (0, D2p - D2)))
    model = jnp.concatenate([means_invvars, -0.5 * inv_vars], axis=-1)  # (P,K,2D)
    model = model.reshape(P * K, D2)
    if Pp != P or D2p != D2:
        model = jnp.pad(model, ((0, (Pp - P) * K), (0, D2p - D2)))
    g = gconsts
    if Pp != P:
        g = jnp.pad(g, ((0, Pp - P), (0, 0)), constant_values=-jnp.inf)
    gflat = g.reshape(1, Pp * K)
    # block-diagonal group-sum selector for one pdf tile
    gsel = jnp.asarray(
        np.repeat(np.eye(tp, dtype=np.float32), K, axis=0)
    )  # (tp*K, tp)

    if compute_dtype == "bfloat16":
        x2 = x2.astype(jnp.bfloat16)
        model = model.astype(jnp.bfloat16)

    precision = (
        None if compute_dtype == "bfloat16" else jax.lax.Precision.HIGHEST
    )
    # Measured bound at triphone scale (BENCH.md round 4): ~9.7 ms bf16
    # for the P=2051, K=32 bench config, identical under either grid
    # order (a P-outer variant that streams the model once was A/B'd
    # dead even — the pipeliner is not model-bandwidth-bound).  The
    # structural floor is ~3.5 ms of PADDED GEMM (the 2D=160 contraction
    # pads to 256 on the 128-deep MXU) plus ~1.3e9 elements of epilogue
    # VPU work (max/exp over every (N, P*K) score plus the group-sum
    # dot) that the logsumexp-over-K semantics require.
    grid = (Np // tn, Pp // tp)
    out = pl.pallas_call(
        functools.partial(_loglikes_kernel, precision=precision),
        out_shape=jax.ShapeDtypeStruct((Np, Pp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, D2p), lambda i, j: (i, 0)),
            pl.BlockSpec((tp * K, D2p), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tp * K), lambda i, j: (0, j)),
            pl.BlockSpec((tp * K, tp), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tn, tp), lambda i, j: (i, j)),
        interpret=interpret,
    )(x2, model, gflat, gsel)
    return out[:N, :P].reshape(lead + (P,))
