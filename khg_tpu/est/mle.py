"""MLE / MAP M-step for diagonal GMMs and helpers.

Closed-form updates from accumulated stats, with the reference's exact
flooring / minimum-occupancy / low-count-removal rules
(/root/reference/kaldi-hmm-gmm/csrc/mle-diag-gmm.cc:243-499,
mle-am-diag-gmm.cc:153-230).  Stats are tiny relative to the E-step, so
this runs on the host in float64 (matching the reference's double
accumulators bit-for-bit in spirit); the device owns the E-step.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from khg_tpu.est.flags import (
    GMM_MEANS,
    GMM_TRANSITIONS,
    GMM_VARIANCES,
    GMM_WEIGHTS,
)
from khg_tpu.gmm.am_gmm import AmDiagGmm
from khg_tpu.gmm.diag_gmm import DiagGmm
from khg_tpu.model.transition_model import TransitionModel, get_pdfs_for_phones
from khg_tpu.stats.accum import AccumAmDiagGmm, AccumDiagGmm

logger = logging.getLogger(__name__)


@dataclass
class MleDiagGmmOptions:
    variance_floor_vector: Optional[np.ndarray] = None
    min_gaussian_weight: float = 1.0e-05
    min_gaussian_occupancy: float = 10.0
    min_variance: float = 0.001
    remove_low_count_gaussians: bool = True


@dataclass
class MapDiagGmmOptions:
    mean_tau: float = 10.0
    variance_tau: float = 50.0
    weight_tau: float = 10.0


def ml_objective(gmm: DiagGmm, acc: AccumDiagGmm) -> float:
    """occ·gconst + Σ m⊙(μ/σ²) − ½ Σ v⊙(1/σ²)."""
    obj = float(acc.occupancy @ gmm.gconsts.astype(np.float64))
    if acc.flags & GMM_MEANS:
        obj += float(
            np.sum(acc.mean_accumulator * gmm.means_invvars.astype(np.float64))
        )
    if acc.flags & GMM_VARIANCES:
        obj -= 0.5 * float(
            np.sum(acc.variance_accumulator * gmm.inv_vars.astype(np.float64))
        )
    return obj


def mle_diag_gmm_update(
    config: MleDiagGmmOptions,
    acc: AccumDiagGmm,
    flags: int,
    gmm: DiagGmm,
) -> Tuple[float, float, int, int, int]:
    """Returns (obj_change, count, elements_floored, gauss_floored, removed)."""
    if flags & ~acc.flags:
        raise ValueError("Flags in argument do not match the accumulators")
    assert acc.num_comp == gmm.num_gauss and acc.dim == gmm.dim

    num_gauss = gmm.num_gauss
    occ_sum = float(acc.occupancy.sum())
    elements_floored = 0
    gauss_floored = 0

    gmm.compute_gconsts()
    obj_old = ml_objective(gmm, acc)

    # "normal" representation in double
    weights = gmm.weights.astype(np.float64).copy()
    means = gmm.get_means().astype(np.float64)
    variances = gmm.get_vars().astype(np.float64)

    to_remove: List[int] = []
    for i in range(num_gauss):
        occ = float(acc.occupancy[i])
        prob = occ / occ_sum if occ_sum > 0.0 else 1.0 / num_gauss
        if occ > config.min_gaussian_occupancy and prob > config.min_gaussian_weight:
            weights[i] = prob
            old_mean = means[i].copy()
            if acc.flags & (GMM_MEANS | GMM_VARIANCES):
                means[i] = acc.mean_accumulator[i] / occ
            if acc.flags & GMM_VARIANCES:
                var = acc.variance_accumulator[i] / occ - means[i] ** 2
                if not (flags & GMM_MEANS):
                    # variance-only update: compensate for the mean shift
                    old_mean = old_mean - means[i]
                    var = var + old_mean**2
                if config.variance_floor_vector is not None:
                    floor = config.variance_floor_vector
                else:
                    floor = config.min_variance
                floored = var < floor
                var = np.where(floored, floor, var)
                nf = int(np.sum(floored))
                if nf:
                    elements_floored += nf
                    gauss_floored += 1
                variances[i] = var
        else:
            if config.remove_low_count_gaussians and len(to_remove) < num_gauss - 1:
                logger.warning(
                    "Too little data - removing Gaussian (weight %.6f, "
                    "occupancy %.6f, dim %d)", prob, occ, gmm.dim,
                )
                to_remove.append(i)
            else:
                logger.warning(
                    "Gaussian has too little data but not removing: "
                    "occ=%.6f weight=%.6f", occ, prob,
                )
                weights[i] = max(prob, config.min_gaussian_weight)

    # copy back per flags
    if flags & GMM_WEIGHTS:
        gmm.weights = weights.astype(np.float32)
    if flags & GMM_VARIANCES:
        inv_vars = (1.0 / variances).astype(np.float32)
        if flags & GMM_MEANS:
            gmm.means_invvars = (means * (1.0 / variances)).astype(np.float32)
        else:
            gmm.means_invvars = (
                gmm.get_means().astype(np.float64) / variances
            ).astype(np.float32)
        gmm.inv_vars = inv_vars
    elif flags & GMM_MEANS:
        gmm.means_invvars = (means * gmm.inv_vars.astype(np.float64)).astype(
            np.float32
        )
    gmm.valid_gconsts = False

    gmm.compute_gconsts()
    obj_new = ml_objective(gmm, acc)

    if to_remove:
        gmm.remove_components(to_remove, renorm_weights=True)
        gmm.compute_gconsts()

    return obj_new - obj_old, occ_sum, elements_floored, gauss_floored, len(to_remove)


def map_diag_gmm_update(
    config: MapDiagGmmOptions,
    acc: AccumDiagGmm,
    flags: int,
    gmm: DiagGmm,
) -> Tuple[float, float]:
    """Tau-smoothed MAP update (mle-diag-gmm.cc:392-477)."""
    if flags & ~acc.flags:
        raise ValueError("Flags in argument do not match the accumulators")
    assert acc.num_comp == gmm.num_gauss and acc.dim == gmm.dim
    num_gauss = gmm.num_gauss
    occ_sum = float(acc.occupancy.sum())

    gmm.compute_gconsts()
    obj_old = ml_objective(gmm, acc)

    weights = gmm.weights.astype(np.float64).copy()
    means = gmm.get_means().astype(np.float64)
    variances = gmm.get_vars().astype(np.float64)

    for i in range(num_gauss):
        occ = float(acc.occupancy[i])
        weights[i] = (occ + weights[i] * config.weight_tau) / (
            occ_sum + config.weight_tau
        )
        if occ > 0.0 and (flags & GMM_MEANS):
            old_mean = means[i].copy()
            mean = acc.mean_accumulator[i] / (occ + config.mean_tau)
            mean += old_mean * (config.mean_tau / (occ + config.mean_tau))
            means[i] = mean
        if occ > 0.0 and (flags & GMM_VARIANCES):
            old_var = variances[i].copy()
            var = acc.variance_accumulator[i] / occ
            var = var + means[i] ** 2
            var = var + acc.mean_accumulator[i] * means[i] * (-2.0 / occ)
            var *= occ / (config.variance_tau + occ)
            var += old_var * (config.variance_tau / (config.variance_tau + occ))
            variances[i] = var

    if flags & GMM_WEIGHTS:
        gmm.weights = weights.astype(np.float32)
    if flags & GMM_VARIANCES:
        gmm.inv_vars = (1.0 / variances).astype(np.float32)
        gmm.means_invvars = (means / variances).astype(np.float32)
    elif flags & GMM_MEANS:
        gmm.means_invvars = (means * gmm.inv_vars.astype(np.float64)).astype(
            np.float32
        )
    gmm.compute_gconsts()
    obj_new = ml_objective(gmm, acc)
    return obj_new - obj_old, occ_sum


def mle_am_diag_gmm_update(
    config: MleDiagGmmOptions,
    am_acc: AccumAmDiagGmm,
    flags: int,
    am_gmm: AmDiagGmm,
) -> Tuple[float, float]:
    assert am_acc.num_accs == am_gmm.num_pdfs
    tot_obj_change = 0.0
    tot_count = 0.0
    tot_floored = 0
    tot_gauss_floored = 0
    tot_removed = 0
    for i in range(am_acc.num_accs):
        obj, count, ef, gf, rm = mle_diag_gmm_update(
            config, am_acc.get_acc(i), flags, am_gmm.get_pdf(i)
        )
        tot_obj_change += obj
        tot_count += count
        tot_floored += ef
        tot_gauss_floored += gf
        tot_removed += rm
    logger.info(
        "%d variance elements floored in %d Gaussians out of %d; removed %d",
        tot_floored, tot_gauss_floored, am_gmm.num_gauss, tot_removed,
    )
    return tot_obj_change, tot_count


def map_am_diag_gmm_update(
    config: MapDiagGmmOptions,
    am_acc: AccumAmDiagGmm,
    flags: int,
    am_gmm: AmDiagGmm,
) -> Tuple[float, float]:
    assert am_acc.num_accs == am_gmm.num_pdfs
    tot_obj = 0.0
    tot_count = 0.0
    for i in range(am_acc.num_accs):
        obj, count = map_diag_gmm_update(
            config, am_acc.get_acc(i), flags, am_gmm.get_pdf(i)
        )
        tot_obj += obj
        tot_count += count
    return tot_obj, tot_count


def gmm_boost_silence(
    am_gmm: AmDiagGmm,
    transition_model: TransitionModel,
    silence_phones: List[int],
    boost: float = 1.5,
) -> AmDiagGmm:
    """Return a copy with silence-pdf mixture weights multiplied by boost."""
    assert silence_phones
    is_unique, pdfs = get_pdfs_for_phones(transition_model, sorted(silence_phones))
    if not is_unique:
        logger.info("Silence pdfs may be shared with other phones (harmless)")
    out = am_gmm.copy()
    for pdf in pdfs:
        g = out.get_pdf(pdf)
        g.set_weights(g.weights * boost)
        g.compute_gconsts()
    logger.info("Boosted weights for %d pdfs by factor %s", len(pdfs), boost)
    return out
