"""Device-side GMM log-likelihood engine.

The per-frame, per-pdf log-likelihood of a diagonal GMM in exponential form
is

    loglike[t, p] = logsumexp_k( gconst[p,k] + M[p,k]·x[t] - 0.5 V[p,k]·x[t]² )

Stacking all pdfs (padded to max_mix K) turns the whole acoustic scoring
pass into ONE fused GEMM on the MXU:

    scores = [x, x²] @ [M, -0.5 V]^T + gconsts            # (T, P*K)
    loglikes = logsumexp over K                            # (T, P)

Padding components carry gconst = -inf so they cannot win the logsumexp
(their model rows are zero, so the GEMM contributes 0 and -inf survives).

This replaces the reference's per-(frame,pdf) cached Eigen matvec
(/root/reference/kaldi-hmm-gmm/csrc/diag-gmm.cc:167-189,
decodable-am-diag-gmm.cc:16-71): on TPU the dense precompute of all pdfs
is faster than any caching scheme because it is a single large matmul.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _stack_model(
    gconsts: jnp.ndarray, means_invvars: jnp.ndarray, inv_vars: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(P,K), (P,K,D), (P,K,D) -> A (P*K, 2D), g (P*K,)."""
    P, K, D = means_invvars.shape
    A = jnp.concatenate([means_invvars, -0.5 * inv_vars], axis=-1)
    return A.reshape(P * K, 2 * D), gconsts.reshape(P * K)


def _expand_feats(feats: jnp.ndarray) -> jnp.ndarray:
    """(..., D) -> (..., 2D) with [x, x²]."""
    return jnp.concatenate([feats, jnp.square(feats)], axis=-1)


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def component_scores(
    gconsts: jnp.ndarray,
    means_invvars: jnp.ndarray,
    inv_vars: jnp.ndarray,
    feats: jnp.ndarray,
    compute_dtype: Optional[str] = None,
) -> jnp.ndarray:
    """Per-component log-likelihoods: (..., T, D) feats -> (..., T, P, K).

    ``compute_dtype='bfloat16'`` runs the GEMM in bf16 with f32 accumulation
    (the MXU's native mode); the result is returned in f32.
    """
    P, K, D = means_invvars.shape
    A, g = _stack_model(gconsts, means_invvars, inv_vars)
    x = _expand_feats(feats)
    if compute_dtype == "bfloat16":
        A = A.astype(jnp.bfloat16)
        x = x.astype(jnp.bfloat16)
    # bf16 inputs use the MXU's native mode (fast path); f32 inputs request
    # HIGHEST precision so results are reproducible across backends and match
    # the host reference to f32 accuracy.
    precision = None if compute_dtype == "bfloat16" else jax.lax.Precision.HIGHEST
    scores = (
        jax.lax.dot_general(
            x,
            A,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        + g
    )
    return scores.reshape(feats.shape[:-1] + (P, K))


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def loglikes(
    gconsts: jnp.ndarray,
    means_invvars: jnp.ndarray,
    inv_vars: jnp.ndarray,
    feats: jnp.ndarray,
    compute_dtype: Optional[str] = None,
) -> jnp.ndarray:
    """Total per-pdf log-likelihoods: (..., T, D) feats -> (..., T, P)."""
    scores = component_scores(
        gconsts, means_invvars, inv_vars, feats, compute_dtype=compute_dtype
    )
    return jax.nn.logsumexp(scores, axis=-1)


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def component_scores_per_state(
    gconsts: jnp.ndarray,        # (P, K)
    means_invvars: jnp.ndarray,  # (P, K, D)
    inv_vars: jnp.ndarray,       # (P, K, D)
    state_pdf: jnp.ndarray,      # (B, S) int32 — pdf of each graph state
    feats: jnp.ndarray,          # (B, T, D)
    compute_dtype: Optional[str] = None,
) -> jnp.ndarray:
    """(B, T, S, K) per-component scores of each graph STATE's pdf.

    The S-factored analogue of component_scores: model rows are gathered
    once per (b, s) and the GEMM shrinks by P/S.  Shared by per-state
    alignment scoring (loglikes_per_state) and the local-state stats
    fold (stats.accum.accumulate_am_stats_local) — compute it once in a
    fused E-step and feed both.
    """
    P, K, D = means_invvars.shape
    A, g = _stack_model(gconsts, means_invvars, inv_vars)
    A_state = A.reshape(P, K, 2 * D)[state_pdf]      # (B, S, K, 2D)
    g_state = g.reshape(P, K)[state_pdf]             # (B, S, K)
    x2 = _expand_feats(feats)                        # (B, T, 2D)
    if compute_dtype == "bfloat16":
        A_state = A_state.astype(jnp.bfloat16)
        x2 = x2.astype(jnp.bfloat16)
    precision = (
        None if compute_dtype == "bfloat16" else jax.lax.Precision.HIGHEST
    )
    return jnp.einsum(
        "btd,bskd->btsk", x2, A_state,
        precision=precision, preferred_element_type=jnp.float32,
    ) + g_state[:, None]


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def loglikes_per_state(
    gconsts: jnp.ndarray,        # (P, K)
    means_invvars: jnp.ndarray,  # (P, K, D)
    inv_vars: jnp.ndarray,       # (P, K, D)
    state_pdf: jnp.ndarray,      # (B, S) int32 — pdf of each graph state
    feats: jnp.ndarray,          # (B, T, D)
    compute_dtype: Optional[str] = None,
) -> jnp.ndarray:
    """(B, T, S) log-likelihoods of each graph STATE's pdf.

    The alignment E-step only ever consumes loglikes of pdfs that occur
    in each utterance's training graph (dest-uniform graphs: one pdf per
    state), and the stats accumulators recompute per-assigned-pdf
    posteriors from the model themselves — so scoring all P pdfs is
    wasted work whenever S << P.  This scores per state instead: the
    model rows are gathered once per (b, s) (a (B,S,K,2D) tensor, tiny
    next to (B,T,P,K) component scores) and the GEMM shrinks by P/S —
    ~32x fewer FLOPs at triphone scale (P~2048, S~64).  Identical
    values to loglikes(...)[b, t, state_pdf[b, s]].
    """
    scores = component_scores_per_state(
        gconsts, means_invvars, inv_vars, state_pdf, feats,
        compute_dtype=compute_dtype,
    )
    return jax.nn.logsumexp(scores, axis=-1)        # (B, T, S)


def loglikes_np(packed, feats: np.ndarray) -> np.ndarray:
    """Convenience host wrapper taking a PackedGmm."""
    return np.asarray(
        loglikes(packed.gconsts, packed.means_invvars, packed.inv_vars, feats)
    )
