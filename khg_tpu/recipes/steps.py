"""Recipe-level steps: the per-stage functions of monophone training.

Covers the reference's script layer functionality
(/root/reference/scripts/gmm_init_mono.py, gmm_est.py, gmm_info.py) on
this framework's objects: a flat-start initializer from global feature
moments, a composed M-step (transitions -> GMM params -> mixture
resizing), and a model summary.  Unlike the reference scripts these take
and return framework objects directly and thread explicit RNGs
(split/perturb are seedable here; the reference's are not, eigen.cc:34).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from khg_tpu.est.flags import GMM_TRANSITIONS, str_to_gmm_flags
from khg_tpu.est.mle import MleDiagGmmOptions, mle_am_diag_gmm_update
from khg_tpu.gmm.am_gmm import AmDiagGmm
from khg_tpu.gmm.diag_gmm import DiagGmm
from khg_tpu.model.context_dep import (
    ContextDependency,
    monophone_context_dependency,
    monophone_context_dependency_shared,
)
from khg_tpu.model.topology import HmmTopology
from khg_tpu.model.transition_model import (
    MleTransitionUpdateConfig,
    TransitionModel,
)
from khg_tpu.stats.accum import AccumAmDiagGmm

logger = logging.getLogger(__name__)


def _global_moments(feats: Sequence[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """Mean and variance over every frame of every utterance (f64)."""
    stacked = np.concatenate([np.asarray(f, dtype=np.float64) for f in feats])
    mean = stacked.mean(axis=0)
    return mean, np.square(stacked).mean(axis=0) - np.square(mean)


def _flat_start_gmm(mean: np.ndarray, var: np.ndarray) -> DiagGmm:
    proto = DiagGmm(1, len(mean))
    proto.set_weights(np.ones(1, dtype=np.float32))
    proto.set_invvars_and_means(
        (1.0 / var)[None, :].astype(np.float32),
        mean[None, :].astype(np.float32),
    )
    proto.compute_gconsts()
    return proto


def gmm_init_mono(
    topo: HmmTopology,
    feats: Sequence[np.ndarray],
    shared_phones: Optional[List[List[int]]] = None,
    perturb_factor: float = 0.0,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[TransitionModel, ContextDependency, AmDiagGmm]:
    """Flat start: one shared 1-Gaussian pdf from global feature stats."""
    num_classes = topo.get_phone_to_num_pdf_classes()
    tree = (
        monophone_context_dependency(topo.phones, num_classes)
        if shared_phones is None
        else monophone_context_dependency_shared(shared_phones, num_classes)
    )

    am = AmDiagGmm()
    am.init(_flat_start_gmm(*_global_moments(feats)), tree.num_pdfs)
    if perturb_factor != 0.0:
        for i in range(am.num_pdfs):
            am.get_pdf(i).perturb(perturb_factor, rng=rng)

    return TransitionModel(ctx_dep=tree, hmm_topo=topo), tree, am


def gmm_info(am_gmm: AmDiagGmm, transition_model: TransitionModel) -> Dict[str, int]:
    return {
        "number_of_phones": len(transition_model.phones),
        "number_of_pdfs": transition_model.num_pdfs,
        "number_of_transition_ids": transition_model.num_transition_ids,
        "number_of_transition_states": transition_model.num_transition_states,
        "feature_dimension": am_gmm.dim,
        "number_of_gaussians": am_gmm.num_gauss,
    }


def _update_transitions(
    tm: TransitionModel, accs: np.ndarray, cfg: MleTransitionUpdateConfig
) -> None:
    objf_impr, count = tm.mle_update(accs, cfg)
    logger.info(
        "Transition update: %.6f log-like improvement / frame over %.1f frames",
        objf_impr / max(count, 1e-20), count,
    )


def _update_gmms(
    am: AmDiagGmm, accs: AccumAmDiagGmm, flags: int, opts: MleDiagGmmOptions
) -> None:
    avg_like = accs.tot_log_like / max(accs.tot_count, 1e-20)
    objf_impr, count = mle_am_diag_gmm_update(opts, accs, flags, am)
    logger.info(
        "GMM update: %.6f objf improvement / frame over %.1f frames; "
        "avg like/frame %.6f over %.1f frames",
        objf_impr / max(count, 1e-20), count, avg_like, accs.tot_count,
    )


def _resize_mixtures(
    am: AmDiagGmm,
    accs: AccumAmDiagGmm,
    mixup: int,
    mixdown: int,
    perturb_factor: float,
    power: float,
    min_count: float,
    rng: Optional[np.random.Generator],
) -> None:
    occs = np.fromiter(
        (accs.get_acc(i).occupancy.sum() for i in range(accs.num_accs)),
        dtype=np.float32, count=accs.num_accs,
    )
    if mixdown:
        am.merge_by_count(occs, mixdown, power, min_count)
    if mixup:
        am.split_by_count(occs, mixup, perturb_factor, power, min_count,
                          rng=rng)


def gmm_est(
    am_gmm: AmDiagGmm,
    gmm_accs: AccumAmDiagGmm,
    transition_model: TransitionModel,
    transition_accs: Optional[np.ndarray],
    tcfg: MleTransitionUpdateConfig = MleTransitionUpdateConfig(),
    gmm_opts: MleDiagGmmOptions = MleDiagGmmOptions(),
    mixup: int = 0,
    mixdown: int = 0,
    perturb_factor: float = 0.01,
    power: float = 0.2,
    min_count: float = 20.0,
    update_flags: str = "mvwt",
    rng: Optional[np.random.Generator] = None,
) -> None:
    """M-step driver: transitions, GMM params, then mixture resizing
    toward the target using per-pdf occupancies."""
    flags = str_to_gmm_flags(update_flags)
    if flags & GMM_TRANSITIONS:
        assert transition_accs is not None
        _update_transitions(transition_model, transition_accs, tcfg)
    _update_gmms(am_gmm, gmm_accs, flags, gmm_opts)
    if mixup or mixdown:
        _resize_mixtures(
            am_gmm, gmm_accs, mixup, mixdown, perturb_factor, power,
            min_count, rng,
        )
