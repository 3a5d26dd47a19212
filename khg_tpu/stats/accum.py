"""Sufficient-statistics accumulation.

Host view: AccumDiagGmm / AccumAmDiagGmm with float64 0th/1st/2nd-order
stats, additive across shards (the correctness anchor for distributed
reduction: psum of per-shard stats == serial accumulation).

Device path: ``accumulate_am_stats`` — given frame-aligned pdf-ids, one
jitted pass computes per-component posteriors of each frame's pdf and
reduces the three stats tensors with one-hot GEMMs (MXU-friendly
segment-sums), replacing the reference's per-frame Eigen loop
(/root/reference/kaldi-hmm-gmm/csrc/mle-diag-gmm.cc:100-158,
mle-am-diag-gmm.cc:41-53).  Under data parallelism these tensors are
combined with jax.lax.psum (see khg_tpu.parallel).
"""

from __future__ import annotations

import functools
import logging
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from khg_tpu.est.flags import GMM_MEANS, GMM_VARIANCES, GMM_WEIGHTS, augment_gmm_flags
from khg_tpu.gmm.am_gmm import AmDiagGmm
from khg_tpu.gmm.diag_gmm import DiagGmm

logger = logging.getLogger(__name__)

# accumulate_am_stats: above this many BYTES of all-pdf score tensor
# (N, P, K) the per-frame gather path is used instead of materializing it.
_SCORES_ALL_MAX_BYTES = 1 << 30


class AccumDiagGmm:
    """Per-pdf accumulator: occupancy (K,), mean (K,D), var (K,D) in f64."""

    def __init__(self, num_comp: int = 0, dim: int = 0, flags: int = 0):
        if num_comp > 0:
            self.resize(num_comp, dim, flags)
        else:
            self.num_comp = 0
            self.dim = 0
            self.flags = 0

    def resize(self, num_comp: int, dim: int, flags: int) -> None:
        assert num_comp > 0 and dim > 0
        self.num_comp = num_comp
        self.dim = dim
        self.flags = augment_gmm_flags(flags)
        self.occupancy = np.zeros(num_comp, dtype=np.float64)
        self.mean_accumulator = (
            np.zeros((num_comp, dim), dtype=np.float64)
            if self.flags & GMM_MEANS
            else np.zeros((0, 0))
        )
        self.variance_accumulator = (
            np.zeros((num_comp, dim), dtype=np.float64)
            if self.flags & GMM_VARIANCES
            else np.zeros((0, 0))
        )

    def set_zero(self) -> None:
        self.occupancy[:] = 0
        if self.flags & GMM_MEANS:
            self.mean_accumulator[:] = 0
        if self.flags & GMM_VARIANCES:
            self.variance_accumulator[:] = 0

    def scale(self, f: float) -> None:
        self.occupancy *= f
        if self.flags & GMM_MEANS:
            self.mean_accumulator *= f
        if self.flags & GMM_VARIANCES:
            self.variance_accumulator *= f

    def accumulate_for_component(
        self, data: np.ndarray, comp_index: int, weight: float
    ) -> None:
        self.occupancy[comp_index] += weight
        if self.flags & GMM_MEANS:
            self.mean_accumulator[comp_index] += data.astype(np.float64) * weight
        if self.flags & GMM_VARIANCES:
            self.variance_accumulator[comp_index] += (
                data.astype(np.float64) ** 2 * weight
            )

    def accumulate_from_posteriors(
        self, data: np.ndarray, posteriors: np.ndarray
    ) -> None:
        p = posteriors.astype(np.float64)
        self.occupancy += p
        if self.flags & GMM_MEANS:
            self.mean_accumulator += p[:, None] * data.astype(np.float64)[None, :]
        if self.flags & GMM_VARIANCES:
            self.variance_accumulator += (
                p[:, None] * (data.astype(np.float64) ** 2)[None, :]
            )

    def accumulate_from_diag(
        self, gmm: DiagGmm, data: np.ndarray, weight: float
    ) -> float:
        log_like, post = gmm.component_posteriors(data)
        self.accumulate_from_posteriors(data, post * weight)
        return log_like

    def add(self, scale: float, other: "AccumDiagGmm") -> None:
        self.occupancy += scale * other.occupancy
        if self.flags & GMM_MEANS:
            self.mean_accumulator += scale * other.mean_accumulator
        if self.flags & GMM_VARIANCES:
            self.variance_accumulator += scale * other.variance_accumulator

    def smooth_stats(self, tau: float) -> None:
        """Scale 1st/2nd-order stats so they appear to have (occ+tau) counts."""
        smoothing = (self.occupancy + tau) / self.occupancy
        self.mean_accumulator *= smoothing[:, None]
        self.variance_accumulator *= smoothing[:, None]
        self.occupancy += tau

    def smooth_with_accum(self, tau: float, src: "AccumDiagGmm") -> None:
        """Add tau virtual counts per component shaped like ``src``'s stats
        (mle-diag-gmm.cc:209-226).  Not valid for weight updates."""
        assert src.num_comp == self.num_comp and src.dim == self.dim
        for i in range(self.num_comp):
            if src.occupancy[i] != 0.0:
                self.occupancy[i] += tau
                self.mean_accumulator[i] += (
                    src.mean_accumulator[i] * tau / src.occupancy[i]
                )
                self.variance_accumulator[i] += (
                    src.variance_accumulator[i] * tau / src.occupancy[i]
                )
            else:
                logger.warning("Cannot smooth: source occupancy is zero")

    def smooth_with_model(self, tau: float, gmm: DiagGmm) -> None:
        """Add tau virtual counts per component drawn from the model itself
        (mle-diag-gmm.cc:228-241)."""
        assert gmm.num_gauss == self.num_comp and gmm.dim == self.dim
        means = gmm.get_means().astype(np.float64)
        variances = gmm.get_vars().astype(np.float64)
        self.mean_accumulator += means * tau
        self.variance_accumulator += (variances + means**2) * tau
        self.occupancy += tau


class AccumAmDiagGmm:
    def __init__(self):
        self.accs: List[AccumDiagGmm] = []
        self.total_frames = 0.0
        self.total_log_like = 0.0

    def init(self, model: AmDiagGmm, flags: int) -> None:
        self.accs = []
        for i in range(model.num_pdfs):
            acc = AccumDiagGmm()
            acc.resize(model.get_pdf(i).num_gauss, model.dim, flags)
            self.accs.append(acc)
        self.total_frames = 0.0
        self.total_log_like = 0.0

    @property
    def num_accs(self) -> int:
        return len(self.accs)

    @property
    def tot_count(self) -> float:
        return self.total_frames

    @property
    def tot_log_like(self) -> float:
        return self.total_log_like

    def get_acc(self, i: int) -> AccumDiagGmm:
        return self.accs[i]

    def accumulate_for_gmm(
        self, model: AmDiagGmm, data: np.ndarray, gmm_index: int, weight: float
    ) -> float:
        log_like = self.accs[gmm_index].accumulate_from_diag(
            model.get_pdf(gmm_index), data, weight
        )
        self.total_log_like += log_like * weight
        self.total_frames += weight
        return log_like

    def add(self, scale: float, other: "AccumAmDiagGmm") -> None:
        self.total_frames += scale * other.total_frames
        self.total_log_like += scale * other.total_log_like
        assert self.num_accs == other.num_accs
        for a, b in zip(self.accs, other.accs):
            a.add(scale, b)

    # ------------------------------------------------------------- device IO

    def add_dense(
        self,
        occ: np.ndarray,       # (P, K)
        mean_acc: np.ndarray,  # (P, K, D)
        var_acc: np.ndarray,   # (P, K, D)
        tot_log_like: float,
        tot_frames: float,
    ) -> None:
        """Fold device-computed padded stats into the ragged host view."""
        for p, acc in enumerate(self.accs):
            k = acc.num_comp
            acc.occupancy += occ[p, :k].astype(np.float64)
            if acc.flags & GMM_MEANS:
                acc.mean_accumulator += mean_acc[p, :k, : acc.dim].astype(np.float64)
            if acc.flags & GMM_VARIANCES:
                acc.variance_accumulator += var_acc[p, :k, : acc.dim].astype(
                    np.float64
                )
        self.total_log_like += float(tot_log_like)
        self.total_frames += float(tot_frames)


class DenseStats(NamedTuple):
    """Device-side padded stats; additive, psum-able."""

    occ: jnp.ndarray       # (P, K)
    mean_acc: jnp.ndarray  # (P, K, D)
    var_acc: jnp.ndarray   # (P, K, D)
    tot_log_like: jnp.ndarray  # ()
    tot_frames: jnp.ndarray    # ()


@functools.partial(jax.jit, static_argnames=())
def accumulate_am_stats(
    gconsts: jnp.ndarray,        # (P, K)
    means_invvars: jnp.ndarray,  # (P, K, D)
    inv_vars: jnp.ndarray,       # (P, K, D)
    feats: jnp.ndarray,          # (B, T, D)
    pdf_ids: jnp.ndarray,        # (B, T) int32
    frame_weights: jnp.ndarray,  # (B, T) f32 (0 masks a frame out)
) -> DenseStats:
    """E-step stats from a fixed frame-level pdf alignment.

    Per frame: component posteriors of the aligned pdf; stats reduced over
    frames with one-hot GEMMs.  Exactly mirrors AccumulateForGmm with
    weight=frame_weights (1.0 normally, 0.0 for padding/failed frames).
    """
    P, K, D = means_invvars.shape
    B, T, _ = feats.shape
    N = B * T
    x = feats.reshape(N, D)
    pid = pdf_ids.reshape(N)
    w = frame_weights.reshape(N)

    hi = jax.lax.Precision.HIGHEST
    onehot = jax.nn.one_hot(pid, P, dtype=jnp.float32) * (w > 0)[:, None]
    if N * P * K * 4 <= _SCORES_ALL_MAX_BYTES:
        # Score ALL pdfs with one MXU GEMM, then pick the aligned pdf's
        # row by an exact 0/1 one-hot contraction — no per-frame
        # model-row gathers (at bench scale those stream ~650 MB of
        # gathered rows through HBM and dominated the E-step).  Under
        # one jit with the likelihood pass XLA CSEs the shared
        # component_scores GEMM, so the stats' marginal cost is just
        # the select + moment GEMMs.
        from khg_tpu.gmm.likelihoods import component_scores

        scores_all = component_scores(
            gconsts, means_invvars, inv_vars, feats
        ).reshape(N, P, K)
        # padding components carry gconst=-inf; clamp to a finite floor
        # so the 0-weighted terms of the one-hot contraction stay 0
        # (0 * -inf = NaN).  exp(-1e30 - max) underflows to exactly 0,
        # so posteriors are unchanged.
        scores_all = jnp.maximum(scores_all, -1e30)
        scores = jnp.einsum(
            "npk,np->nk", scores_all, onehot,
            preferred_element_type=jnp.float32, precision=hi,
        )
    else:
        # Large (triphone-scale) models: the (N, P, K) score tensor no
        # longer fits; gather the aligned pdf's rows instead (the
        # gather moves N*K*D floats — cheaper than N*P*K here).
        g = gconsts[pid]                  # (N, K)
        m = means_invvars[pid]            # (N, K, D)
        v = inv_vars[pid]                 # (N, K, D)
        scores = (
            g
            + jnp.einsum("nkd,nd->nk", m, x,
                         preferred_element_type=jnp.float32, precision=hi)
            - 0.5 * jnp.einsum("nkd,nd->nk", v, jnp.square(x),
                               preferred_element_type=jnp.float32,
                               precision=hi)
        )
    log_like = jax.nn.logsumexp(scores, axis=1)       # (N,)
    post = jax.nn.softmax(scores, axis=1) * w[:, None]  # (N, K)
    # guard: padding frames may carry pdf 0; the weight factor zeroes them.
    post_masked = post
    occ = jnp.einsum("np,nk->pk", onehot, post_masked,
                     preferred_element_type=jnp.float32, precision=hi)
    xw = jnp.concatenate([x, jnp.square(x)], axis=1)  # (N, 2D)
    # (P, N) @ (N, K*2D): one big MXU GEMM for both moment tensors
    pkx = jnp.einsum(
        "np,nk,nd->pkd", onehot, post_masked, xw,
        preferred_element_type=jnp.float32, precision=hi,
    )
    mean_acc = pkx[..., :D]
    var_acc = pkx[..., D:]
    tot_log_like = jnp.sum(log_like * w)
    tot_frames = jnp.sum(w)
    return DenseStats(occ, mean_acc, var_acc, tot_log_like, tot_frames)


@functools.partial(jax.jit, static_argnames=())
def accumulate_am_stats_local(
    gconsts: jnp.ndarray,        # (P, K)
    means_invvars: jnp.ndarray,  # (P, K, D)
    inv_vars: jnp.ndarray,       # (P, K, D)
    feats: jnp.ndarray,          # (B, T, D)
    pdf_ids: jnp.ndarray,        # (B, T) int32
    frame_weights: jnp.ndarray,  # (B, T) f32 (0 masks a frame out)
    state_pdf: jnp.ndarray,      # (B, S) int32 — pdf of each graph state
    state_scores: Optional[jnp.ndarray] = None,  # (B, T, S, K) precomputed
) -> DenseStats:
    """Triphone-scale stats factored through each utterance's graph
    states.

    The gather branch of accumulate_am_stats moves O(N·K·D) gathered
    model rows and pays an O(N·P·Q) one-hot moment GEMM; at wide-model
    scale (P ~ 2048) that fold dominates the whole E-step.  Every
    aligned pdf occurs among the utterance's graph states (S << P), so
    posteriors and moments accumulate per LOCAL state first —
    O(B·T·S·K·D) — and one exact 0/1 one-hot GEMM over state_pdf
    scatters the (B, S) partials into the global (P, ...) accumulators,
    shrinking the scatter contraction from N=B·T rows to B·S.

    Pass ``state_scores`` (from gmm.likelihoods.component_scores_per_state,
    f32/HIGHEST) when the fused E-step already computed them for
    alignment scoring — the fold then adds no scoring GEMM at all.

    Matches accumulate_am_stats up to f32 summation order (pinned by
    tests/test_stats_est.py::test_local_path_matches_gemm_path).
    """
    from khg_tpu.gmm.likelihoods import component_scores_per_state

    P, K, D = means_invvars.shape
    B, T, _ = feats.shape
    S = state_pdf.shape[1]
    hi = jax.lax.Precision.HIGHEST

    if state_scores is None:
        state_scores = component_scores_per_state(
            gconsts, means_invvars, inv_vars, state_pdf, feats
        )
    # padding components carry gconst=-inf; clamp so 0-weighted one-hot
    # terms stay 0 (0 * -inf = NaN); exp(-1e30 - max) underflows to 0
    scores_sk = jnp.maximum(state_scores, -1e30)     # (B, T, S, K)

    # first-match local state of each frame's aligned pdf: any state
    # with the same pdf has identical model rows, so selecting exactly
    # one (the first) reproduces the per-pdf posteriors
    iota = jnp.arange(S, dtype=jnp.int32)
    eq = state_pdf[:, None, :] == pdf_ids[:, :, None]          # (B, T, S)
    sidx = jnp.min(jnp.where(eq, iota[None, None, :], S), axis=-1)
    onehot_local = jax.nn.one_hot(sidx, S, dtype=jnp.float32)  # (B, T, S)
    onehot_local = onehot_local * (frame_weights > 0)[..., None]

    # aligned state's component scores -> posteriors and log-like
    sel = jnp.einsum(
        "btsk,bts->btk", scores_sk, onehot_local,
        preferred_element_type=jnp.float32, precision=hi,
    )
    w = frame_weights
    log_like = jax.nn.logsumexp(sel, axis=-1)                  # (B, T)
    post = jax.nn.softmax(sel, axis=-1) * w[..., None]         # (B, T, K)

    # per-local-state payload [occ | post (x) [x, x^2]] folded over t,
    # then ONE exact one-hot scatter GEMM to the global pdf axis
    xw1 = jnp.concatenate(
        [jnp.ones(feats.shape[:2] + (1,), feats.dtype), feats,
         jnp.square(feats)], axis=-1,
    )                                                          # (B, T, 1+2D)
    local = jnp.einsum(
        "bts,btk,btq->bskq", onehot_local, post, xw1,
        preferred_element_type=jnp.float32, precision=hi,
    )                                                          # (B, S, K, 1+2D)
    scatter = jax.nn.one_hot(state_pdf, P, dtype=jnp.float32)  # (B, S, P)
    out = jnp.einsum(
        "bsp,bskq->pkq", scatter, local,
        preferred_element_type=jnp.float32, precision=hi,
    )                                                          # (P, K, 1+2D)
    occ = out[..., 0]
    mean_acc = out[..., 1:1 + D]
    var_acc = out[..., 1 + D:]
    # frames masked out (w=0) or with no matching state (padding tids)
    # contribute 0 via onehot_local; log-like AND tot_frames use the
    # same matched mask so occ.sum() == tot_frames stays invariant even
    # if a caller feeds an alignment from a different graph (a w>0
    # frame whose pdf is absent from state_pdf drops out of ALL outputs
    # consistently; with graph-consistent alignments — the documented
    # contract — matched == (w > 0) and this equals jnp.sum(w))
    matched = onehot_local.sum(-1) > 0
    tot_log_like = jnp.sum(jnp.where(matched, log_like * w, 0.0))
    tot_frames = jnp.sum(jnp.where(matched, w, 0.0))
    return DenseStats(occ, mean_acc, var_acc, tot_log_like, tot_frames)


@functools.partial(jax.jit, static_argnames=())
def accumulate_am_stats_soft(
    gconsts: jnp.ndarray,        # (P, K)
    means_invvars: jnp.ndarray,  # (P, K, D)
    inv_vars: jnp.ndarray,       # (P, K, D)
    feats: jnp.ndarray,          # (B, T, D)
    gamma: jnp.ndarray,          # (B, T, P) per-frame pdf posteriors
) -> DenseStats:
    """Soft-EM (Baum-Welch) stats: every frame contributes to every pdf
    weighted by its occupation posterior gamma[t, p].

    Computes full per-component scores (B, T, P, K) — memory O(B·T·P·K),
    fine for monophone-scale P; chunk the batch for big models.
    """
    from khg_tpu.gmm.likelihoods import component_scores

    P, K, D = means_invvars.shape
    B, T, _ = feats.shape
    N = B * T
    x = feats.reshape(N, D)
    w = gamma.reshape(N, P)

    scores = component_scores(gconsts, means_invvars, inv_vars, feats)
    scores = scores.reshape(N, P, K)
    post = jax.nn.softmax(scores, axis=-1) * w[..., None]  # (N, P, K)
    # total log-like under the soft alignment: sum_t sum_p gamma * loglike
    ll = jax.nn.logsumexp(scores, axis=-1)  # (N, P)
    tot_log_like = jnp.sum(jnp.where(w > 0, ll * w, 0.0))

    hi = jax.lax.Precision.HIGHEST
    occ = jnp.sum(post, axis=0)  # (P, K)
    xw = jnp.concatenate([x, jnp.square(x)], axis=1)  # (N, 2D)
    pkx = jnp.einsum(
        "npk,nd->pkd", post, xw, preferred_element_type=jnp.float32,
        precision=hi,
    )
    mean_acc = pkx[..., :D]
    var_acc = pkx[..., D:]
    tot_frames = jnp.sum(w)
    return DenseStats(occ, mean_acc, var_acc, tot_log_like, tot_frames)


def accumulate_transition_stats(
    tids: np.ndarray, num_frames: np.ndarray, num_tids: int
) -> np.ndarray:
    """(num_tids+1,) float64 counts from batched alignments (host)."""
    stats = np.zeros(num_tids + 1, dtype=np.float64)
    B, T = tids.shape
    mask = np.arange(T)[None, :] < np.asarray(num_frames).reshape(B, 1)
    np.add.at(stats, tids[mask], 1.0)
    stats[0] = 0.0
    return stats
