"""Recipe-level steps: the per-stage functions of monophone training.

Functional equivalents of the reference's script layer
(/root/reference/scripts/gmm_init_mono.py, gmm_est.py, gmm_info.py), but
operating on this framework's objects and batched device kernels.
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


def gmm_init_mono(
    topo: HmmTopology,
    feats: Sequence[np.ndarray],
    shared_phones: Optional[List[List[int]]] = None,
    perturb_factor: float = 0.0,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[TransitionModel, ContextDependency, AmDiagGmm]:
    """Flat start: one shared 1-Gaussian pdf from global feature stats."""
    total = np.zeros(feats[0].shape[1], dtype=np.float64)
    total_sq = np.zeros_like(total)
    n = 0
    for f in feats:
        total += f.sum(axis=0)
        total_sq += (f.astype(np.float64) ** 2).sum(axis=0)
        n += f.shape[0]
    mean = total / n
    var = total_sq / n - mean**2

    if shared_phones is None:
        tree = monophone_context_dependency(
            topo.phones, topo.get_phone_to_num_pdf_classes()
        )
    else:
        tree = monophone_context_dependency_shared(
            shared_phones, topo.get_phone_to_num_pdf_classes()
        )

    dim = len(mean)
    proto = DiagGmm(1, dim)
    proto.set_weights(np.ones(1, dtype=np.float32))
    proto.set_invvars_and_means(
        (1.0 / var)[None, :].astype(np.float32), mean[None, :].astype(np.float32)
    )
    proto.compute_gconsts()

    am = AmDiagGmm()
    am.init(proto, tree.num_pdfs)
    if perturb_factor != 0.0:
        for i in range(am.num_pdfs):
            am.get_pdf(i).perturb(perturb_factor, rng=rng)

    tm = TransitionModel(ctx_dep=tree, hmm_topo=topo)
    return tm, tree, am


def gmm_info(am_gmm: AmDiagGmm, transition_model: TransitionModel) -> Dict[str, int]:
    return {
        "number_of_phones": len(transition_model.phones),
        "number_of_pdfs": transition_model.num_pdfs,
        "number_of_transition_ids": transition_model.num_transition_ids,
        "number_of_transition_states": transition_model.num_transition_states,
        "feature_dimension": am_gmm.dim,
        "number_of_gaussians": am_gmm.num_gauss,
    }


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
    """M-step driver: transitions, GMM params, then merge/split toward the
    mixture target using per-pdf occupancies."""
    flags = str_to_gmm_flags(update_flags)

    if flags & GMM_TRANSITIONS:
        assert transition_accs is not None
        objf_impr, count = transition_model.mle_update(transition_accs, tcfg)
        logger.info(
            "Transition update: %.6f log-like improvement / frame over %.1f frames",
            objf_impr / max(count, 1e-20), count,
        )

    tot_like = gmm_accs.tot_log_like
    tot_t = gmm_accs.tot_count
    objf_impr, count = mle_am_diag_gmm_update(gmm_opts, gmm_accs, flags, am_gmm)
    logger.info(
        "GMM update: %.6f objf improvement / frame over %.1f frames; "
        "avg like/frame %.6f over %.1f frames",
        objf_impr / max(count, 1e-20), count,
        tot_like / max(tot_t, 1e-20), tot_t,
    )

    if mixup != 0 or mixdown != 0:
        pdf_occs = np.array(
            [gmm_accs.get_acc(i).occupancy.sum() for i in range(gmm_accs.num_accs)],
            dtype=np.float32,
        )
        if mixdown != 0:
            am_gmm.merge_by_count(pdf_occs, mixdown, power, min_count)
        if mixup != 0:
            am_gmm.split_by_count(
                pdf_occs, mixup, perturb_factor, power, min_count, rng=rng
            )
