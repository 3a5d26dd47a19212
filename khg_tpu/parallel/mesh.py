"""Data-parallel EM over a device mesh.

The workload's natural parallelism is over utterances (SURVEY §2.4): each
utterance's alignment is independent, and sufficient statistics are
additive.  So the distributed design is:

  - a 1-D mesh over axis "dp"; utterance batches sharded along it
  - the (small) model replicated on every chip
  - per-shard fused-GEMM loglikes -> dense Viterbi -> stats GEMMs
  - jax.lax.psum of the three stats tensors over "dp" (ICI within a
    slice; JAX's multi-host runtime extends the same program over DCN)
  - a pure-JAX dense M-step on the reduced stats, identical on every
    chip (so the replicated model stays in sync without a broadcast)

Correctness anchor: psum of shard stats == serial accumulation, which the
additivity tests in tests/test_stats_est.py pin down.

This whole module replaces "nothing" in the reference — it is
single-process (SURVEY §2.4); Kaldi-style recipes shard by file and sum
accumulators, which psum subsumes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from khg_tpu.align.viterbi import viterbi_align_batch
from khg_tpu.gmm.likelihoods import loglikes as gmm_loglikes
from khg_tpu.stats.accum import accumulate_am_stats


def make_data_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("dp",))


class EmStepResult(NamedTuple):
    tids: jnp.ndarray          # (B, T) sharded over dp
    total_cost: jnp.ndarray    # (B,)
    occ: jnp.ndarray           # (P, K) replicated (psummed)
    mean_acc: jnp.ndarray      # (P, K, D)
    var_acc: jnp.ndarray       # (P, K, D)
    tid_counts: jnp.ndarray    # (num_tids+1,) replicated (psummed)
    tot_log_like: jnp.ndarray  # ()
    tot_frames: jnp.ndarray    # ()
    new_gconsts: jnp.ndarray       # (P, K)
    new_means_invvars: jnp.ndarray  # (P, K, D)
    new_inv_vars: jnp.ndarray      # (P, K, D)
    new_weights: jnp.ndarray       # (P, K)


def _dense_mstep(
    occ: jnp.ndarray,        # (P, K)
    mean_acc: jnp.ndarray,   # (P, K, D)
    var_acc: jnp.ndarray,    # (P, K, D)
    old_gconsts: jnp.ndarray,
    old_means_invvars: jnp.ndarray,
    old_inv_vars: jnp.ndarray,
    old_weights: jnp.ndarray,
    min_variance: float = 0.001,
    min_gaussian_occupancy: float = 10.0,
    min_gaussian_weight: float = 1.0e-05,
    remove_low_count_gaussians: bool = True,
    variance_floor_vector=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pure-JAX closed-form MLE update on padded dense stats.

    Full MleDiagGmmOptions semantics, matching est.mle.mle_diag_gmm_update
    (reference: mle-diag-gmm.cc:243-390) with flags=mvw on padded tensors:

    - a component updates iff occ > min_gaussian_occupancy AND its weight
      prob > min_gaussian_weight (prob = occ/occ_sum, or 1/num_real when
      the pdf saw no data);
    - variances floored by ``variance_floor_vector`` (a (D,) array) when
      given, else by the scalar ``min_variance``;
    - with ``remove_low_count_gaussians`` starved components are
      DEACTIVATED (weight 0, inv_vars/means_invvars zeroed, gconst -inf —
      the dense analogue of removal, which would change shapes) and the
      surviving weights renormalized per pdf, except the last real
      component of an all-starved pdf survives with weight
      max(prob, min_gaussian_weight) exactly as the reference's
      "don't remove the last one" branch;
    - without it, starved components keep their parameters and get
      weight max(prob, min_gaussian_weight), no renormalization.

    Padding components (gconst -inf / zero inv_vars rows) never update.
    """
    P_, K, D = mean_acc.shape
    real = jnp.isfinite(old_gconsts)                       # (P, K)
    num_real = jnp.sum(real, axis=1, keepdims=True)        # (P, 1)
    occ = jnp.where(real, occ, 0.0)
    occ_sum = jnp.sum(occ, axis=1, keepdims=True)          # (P, 1)
    prob = jnp.where(
        occ_sum > 0,
        occ / jnp.maximum(occ_sum, 1e-300),
        1.0 / jnp.maximum(num_real, 1),
    )
    active = real & (occ > min_gaussian_occupancy) & (prob > min_gaussian_weight)
    safe_occ = jnp.where(active, occ, 1.0)

    means = mean_acc / safe_occ[..., None]
    variances = var_acc / safe_occ[..., None] - jnp.square(means)
    if variance_floor_vector is not None:
        floor = jnp.asarray(variance_floor_vector).reshape(1, 1, D)
    else:
        floor = jnp.full((1, 1, 1), min_variance)
    variances = jnp.maximum(variances, floor)

    inv_vars = 1.0 / variances
    means_invvars = means * inv_vars

    new_inv_vars = jnp.where(active[..., None], inv_vars, old_inv_vars)
    new_means_invvars = jnp.where(
        active[..., None], means_invvars, old_means_invvars
    )

    starved = real & ~active
    if remove_low_count_gaussians:
        # deactivate starved comps, but keep one survivor when a pdf is
        # fully starved: the reference removes components in index order
        # and stops short of the last, so the highest-index REAL component
        # survives (real slots need not be contiguous once earlier passes
        # have deactivated components)
        rev_cum = jnp.cumsum(real[:, ::-1], axis=1)[:, ::-1]
        last_real = real & (rev_cum == 1)
        all_starved = ~jnp.any(active, axis=1, keepdims=True)
        keep_anyway = starved & last_real & all_starved
        removed = starved & ~keep_anyway
        surv = active | keep_anyway
        w = jnp.where(active, prob, 0.0)
        w = jnp.where(keep_anyway, jnp.maximum(prob, min_gaussian_weight), w)
        # remove_components(renorm_weights=True): renormalize only in
        # pdfs that actually removed something
        any_removed = jnp.any(removed, axis=1, keepdims=True)
        denom = jnp.sum(jnp.where(surv, w, 0.0), axis=1, keepdims=True)
        w = jnp.where(
            any_removed, w / jnp.maximum(denom, 1e-300), w
        )
        new_weights = jnp.where(surv, w, 0.0)
        new_inv_vars = jnp.where(removed[..., None], 0.0, new_inv_vars)
        new_means_invvars = jnp.where(
            removed[..., None], 0.0, new_means_invvars
        )
    else:
        w = jnp.where(active, prob, jnp.maximum(prob, min_gaussian_weight))
        new_weights = jnp.where(real, w, 0.0)

    # gconsts; padding/deactivated components (zero inv_vars rows) stay -inf
    log2pi = 1.8378770664093453
    valid = jnp.any(new_inv_vars > 0, axis=-1) & (new_weights > 0)
    gconsts = (
        jnp.log(jnp.maximum(new_weights, 1e-300))
        - 0.5 * log2pi * D
        + 0.5 * jnp.sum(jnp.log(jnp.where(new_inv_vars > 0, new_inv_vars, 1.0)), axis=-1)
        - 0.5
        * jnp.sum(
            jnp.square(new_means_invvars)
            / jnp.where(new_inv_vars > 0, new_inv_vars, 1.0),
            axis=-1,
        )
    )
    new_gconsts = jnp.where(valid, gconsts, -jnp.inf)
    return new_gconsts, new_means_invvars, new_inv_vars, new_weights


class FbEmStepResult(NamedTuple):
    log_z: jnp.ndarray         # (B,) sharded over dp; 0 where failed
    failed: jnp.ndarray        # (B,) bool sharded over dp
    occ: jnp.ndarray           # (P, K) replicated (psummed)
    mean_acc: jnp.ndarray      # (P, K, D)
    var_acc: jnp.ndarray       # (P, K, D)
    tid_counts: jnp.ndarray    # (num_tids+1,) replicated (psummed)
    tot_log_like: jnp.ndarray  # ()
    tot_frames: jnp.ndarray    # ()
    new_gconsts: jnp.ndarray
    new_means_invvars: jnp.ndarray
    new_inv_vars: jnp.ndarray
    new_weights: jnp.ndarray


def sharded_fb_em_step(
    mesh: Mesh,
    num_tids: int,
    acoustic_scale: float = 1.0,
    uniform_dest_pdf: bool = False,
    banded_offsets: Optional[Tuple[int, ...]] = None,
    banded_interpret: bool = False,
    mle_config=None,
):
    """Build the jitted soft (Baum-Welch) EM step over the mesh.

    Same plumbing as sharded_em_step, but the E-step is the
    forward-backward pass: per-shard pdf posteriors gamma feed the soft
    stats GEMMs, expected transition counts psum alongside the GMM
    stats, and the dense M-step runs replicated on the reduced stats.
    With ``banded_offsets`` the fused banded Pallas FB kernel
    (align/pallas_banded_fb.py) runs per shard; ``graphs`` is then a
    BandedGraphs tuple.

    Returns step(model (gconsts, miv, iv, weights), graphs, feats,
    num_frames) -> FbEmStepResult.
    """
    from jax import shard_map

    from khg_tpu.stats.accum import accumulate_am_stats_soft

    dp = P("dp")
    rep = P()

    def step(model, graphs, feats, num_frames):
        gconsts, miv, iv, weights = model

        ll = gmm_loglikes(gconsts, miv, iv, feats)
        if banded_offsets is not None:
            from khg_tpu.align.pallas_banded_fb import forward_backward_banded

            fb = forward_backward_banded(
                graphs, banded_offsets, ll, num_frames, num_tids,
                acoustic_scale=acoustic_scale,
                block_b=min(16, graphs.plane_cost.shape[0]),
                interpret=banded_interpret,
            )
        else:
            from khg_tpu.align.forward_backward import forward_backward_batch

            fb = forward_backward_batch(
                graphs, ll, num_frames, num_tids,
                acoustic_scale=acoustic_scale,
                state_pdf=graphs.in_pdf[:, :, 0] if uniform_dest_pdf else None,
            )
        ok = ~fb.failed
        gamma = jnp.where(ok[:, None, None], fb.gamma, 0.0)
        stats = accumulate_am_stats_soft(gconsts, miv, iv, feats, gamma)
        counts = jnp.sum(
            jnp.where(ok[:, None], fb.tid_counts, 0.0), axis=0
        )

        occ = jax.lax.psum(stats.occ, "dp")
        mean_acc = jax.lax.psum(stats.mean_acc, "dp")
        var_acc = jax.lax.psum(stats.var_acc, "dp")
        tid_counts = jax.lax.psum(counts, "dp")
        tot_ll = jax.lax.psum(stats.tot_log_like, "dp")
        tot_frames = jax.lax.psum(stats.tot_frames, "dp")

        ng, nmiv, niv, nw = _dense_mstep(
            occ, mean_acc, var_acc, gconsts, miv, iv, weights,
            **_mstep_kwargs(mle_config),
        )
        return FbEmStepResult(
            jnp.where(ok, fb.log_z, 0.0), fb.failed, occ, mean_acc,
            var_acc, tid_counts, tot_ll, tot_frames, ng, nmiv, niv, nw,
        )

    from khg_tpu.align.banded import BandedGraphs
    from khg_tpu.align.packed import BatchedGraphs

    graphs_spec = (
        BandedGraphs(*([dp] * 5))
        if banded_offsets is not None
        else BatchedGraphs(*([dp] * 10))
    )
    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(
            (rep, rep, rep, rep),
            graphs_spec,
            dp,
            dp,
        ),
        out_specs=FbEmStepResult(
            dp, dp, rep, rep, rep, rep, rep, rep, rep, rep, rep, rep
        ),
        check_vma=False,
    )
    return jax.jit(sharded)


def _mstep_kwargs(mle_config) -> dict:
    """kwargs for _dense_mstep from an est.mle.MleDiagGmmOptions (or None)."""
    if mle_config is None:
        return {}
    return dict(
        min_variance=float(mle_config.min_variance),
        min_gaussian_occupancy=float(mle_config.min_gaussian_occupancy),
        min_gaussian_weight=float(mle_config.min_gaussian_weight),
        remove_low_count_gaussians=bool(mle_config.remove_low_count_gaussians),
        variance_floor_vector=mle_config.variance_floor_vector,
    )


def _make_align_estep(
    acoustic_scale: float,
    uniform_dest_pdf: bool,
    banded_offsets,
    banded_interpret: bool,
    per_state: bool,
):
    """Per-shard hard-EM alignment: (gconsts, miv, iv, graphs, feats,
    num_frames, id2pdf) -> (ViterbiResult, per-state component scores or
    None).  Shared by the per-batch sharded step and the resident fold."""

    def align(gconsts, miv, iv, graphs, feats, num_frames, id2pdf):
        ssk = None
        if banded_offsets is not None:
            from khg_tpu.align.pallas_banded import viterbi_align_banded

            if per_state:
                from khg_tpu.gmm.likelihoods import (
                    component_scores_per_state,
                )

                ssk = component_scores_per_state(
                    gconsts, miv, iv, graphs.state_pdf, feats
                )
                sac = jax.nn.logsumexp(ssk, axis=-1)
                res = viterbi_align_banded(
                    graphs, banded_offsets, None, num_frames, id2pdf,
                    acoustic_scale=acoustic_scale,
                    block_b=min(32, graphs.plane_cost.shape[0]),
                    interpret=banded_interpret, sac=sac,
                )
            else:
                ll = gmm_loglikes(gconsts, miv, iv, feats)
                res = viterbi_align_banded(
                    graphs, banded_offsets, ll, num_frames, id2pdf,
                    acoustic_scale=acoustic_scale,
                    block_b=min(32, graphs.plane_cost.shape[0]),
                    interpret=banded_interpret,
                )
        else:
            ll = gmm_loglikes(gconsts, miv, iv, feats)
            state_pdf = graphs.in_pdf[:, :, 0] if uniform_dest_pdf else None
            res = viterbi_align_batch(
                graphs, ll, num_frames, id2pdf,
                acoustic_scale=acoustic_scale, state_pdf=state_pdf,
            )
        return res, ssk

    return align


def sharded_em_step(
    mesh: Mesh,
    acoustic_scale: float = 1.0,
    uniform_dest_pdf: bool = False,
    banded_offsets: Optional[Tuple[int, ...]] = None,
    banded_interpret: bool = False,
    mle_config=None,
    per_state: bool = False,
):
    """Build the jitted full EM step over the mesh.

    Set ``uniform_dest_pdf=True`` (checked on the host with
    align.packed.uniform_dest_pdf) to use the per-state acoustic fast
    path in the Viterbi scan — identical results, about half the
    per-step HBM streaming.

    Pass ``banded_offsets`` (from align.banded.pack_banded) to run the
    fused banded Pallas kernel per shard instead of the XLA scan; the
    ``graphs`` argument is then a BandedGraphs tuple.  Plane tables
    shard over "dp" exactly like the arc tables — the kernel is a
    per-shard drop-in, so the psum/M-step plumbing is unchanged.

    ``per_state=True`` (requires ``banded_offsets``) is the wide-model
    (triphone-scale) mode: ONE per-state component-score GEMM per shard
    feeds both the sac-mode banded Viterbi and the local-state stats
    fold — every stage's work scales with the graph-state count S, not
    the pdf count P.  Same psum/M-step plumbing; scores differ from the
    full-P formulation only by f32 GEMM rounding.

    Returns a function
      step(model (gconsts, miv, iv, weights), graphs (in_src, in_tid,
           in_pdf, in_cost, init_cost, final_cost) OR BandedGraphs,
           feats, num_frames, id2pdf) -> EmStepResult
    with batch axes sharded over "dp" and the model replicated.  The
    M-step runs on the psummed stats, replicated, keeping every chip's
    model bitwise identical.
    """
    from jax import shard_map

    dp = P("dp")
    rep = P()

    assert not per_state or banded_offsets is not None, (
        "per_state mode needs the banded tables (state_pdf lives there)"
    )

    _align = _make_align_estep(
        acoustic_scale, uniform_dest_pdf, banded_offsets,
        banded_interpret, per_state,
    )

    def step(model, graphs, feats, num_frames, id2pdf):
        gconsts, miv, iv, weights = model
        res, ssk = _align(gconsts, miv, iv, graphs, feats, num_frames,
                          id2pdf)
        T = feats.shape[1]
        frame_weights = (
            (jnp.arange(T)[None, :] < num_frames[:, None])
            & ~res.failed[:, None]
        ).astype(jnp.float32)
        pdf_ids = id2pdf[res.tids]
        if per_state:
            from khg_tpu.stats.accum import accumulate_am_stats_local

            stats = accumulate_am_stats_local(
                gconsts, miv, iv, feats, pdf_ids, frame_weights,
                graphs.state_pdf, state_scores=ssk,
            )
        else:
            stats = accumulate_am_stats(
                gconsts, miv, iv, feats, pdf_ids, frame_weights
            )
        # transition stats on device: scatter-add of frame weights over
        # tids (id2pdf has num_tids+1 entries; tid 0 is padding/eps and
        # carries weight 0 only via masked frames — zero it explicitly)
        counts = (
            jnp.zeros(id2pdf.shape[0], jnp.float32)
            .at[res.tids]
            .add(frame_weights)
            .at[0]
            .set(0.0)
        )
        occ = jax.lax.psum(stats.occ, "dp")
        mean_acc = jax.lax.psum(stats.mean_acc, "dp")
        var_acc = jax.lax.psum(stats.var_acc, "dp")
        tid_counts = jax.lax.psum(counts, "dp")
        tot_ll = jax.lax.psum(stats.tot_log_like, "dp")
        tot_frames = jax.lax.psum(stats.tot_frames, "dp")

        ng, nmiv, niv, nw = _dense_mstep(
            occ, mean_acc, var_acc, gconsts, miv, iv, weights,
            **_mstep_kwargs(mle_config),
        )
        return EmStepResult(
            res.tids, res.total_cost, occ, mean_acc, var_acc, tid_counts,
            tot_ll, tot_frames, ng, nmiv, niv, nw,
        )

    from khg_tpu.align.banded import BandedGraphs
    from khg_tpu.align.packed import BatchedGraphs

    graphs_spec = (
        BandedGraphs(*([dp] * 5))
        if banded_offsets is not None
        else BatchedGraphs(*([dp] * 10))
    )
    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(
            (rep, rep, rep, rep),               # model replicated
            graphs_spec,                        # graphs sharded over batch
            dp,                                 # feats
            dp,                                 # num_frames
            rep,                                # id2pdf
        ),
        out_specs=EmStepResult(
            dp, dp, rep, rep, rep, rep, rep, rep, rep, rep, rep, rep
        ),
        check_vma=False,
    )
    return jax.jit(sharded)


class ShardedResidentEm(NamedTuple):
    """Device-resident corpus EM over the mesh (see sharded_resident_em)."""

    make_carry: object   # () -> (carry, comp), zeros sharded over dp
    fold: object         # (model, carry, comp, graphs, feats, nf, id2pdf)
    finish: object       # (model, carry, comp) -> (new_model, packet)
    carry_width: int
    num_tids: int


def sharded_resident_em(
    mesh: Mesh,
    num_pdfs: int,
    num_mix: int,
    dim: int,
    num_tids: int,
    acoustic_scale: float = 1.0,
    uniform_dest_pdf: bool = False,
    banded_offsets: Optional[Tuple[int, ...]] = None,
    banded_interpret: bool = False,
    mle_config=None,
    per_state: bool = False,
) -> ShardedResidentEm:
    """Multi-chip port of EStepPipeline.em_pass_resident: per-shard
    Kahan carry fold across batches, ONE psum + ONE dense M-step per
    corpus pass, model replicated and resident across passes, and a
    counts-only fetch.

    The per-batch sharded_em_step pays a psum + M-step + host sync per
    BATCH; on a pod that re-introduces exactly the per-pass overhead the
    single-chip resident path was built to kill (recipes/pipeline.py
    em_pass_resident).  Here each shard folds its batches' stats into a
    device-resident compensated carry (the same flat layout and
    _kahan_add as the single-chip fold), and only ``finish`` runs the
    collective: psum(carry) + psum(comp) over "dp", then the replicated
    dense M-step, returning the new model tuple (stays on device for
    the next pass) and the small packet (transition counts + summary
    scalars) — the only thing the host ever fetches.

    Usage per corpus pass:
        carry, comp = r.make_carry()
        for batch in batches:                # each sharded over dp
            carry, comp = r.fold(model, carry, comp, *batch)
        model, packet = r.finish(model, carry, comp)

    Equality contract (exercised by tests/test_parallel.py and the
    driver dryrun): final model == host-side _dense_mstep on the summed
    per-batch psum stats of sharded_em_step, on any mesh size.
    """
    from jax import shard_map

    from khg_tpu.align.banded import BandedGraphs
    from khg_tpu.align.packed import BatchedGraphs
    from khg_tpu.recipes.pipeline import _carry_fold, _carry_width

    dp = P("dp")
    rep = P()
    n_dev = mesh.devices.size
    W = _carry_width(num_pdfs, num_mix, dim, num_tids)

    _align = _make_align_estep(
        acoustic_scale, uniform_dest_pdf, banded_offsets,
        banded_interpret, per_state,
    )

    def fold(model, carry, comp, graphs, feats, num_frames, id2pdf):
        gconsts, miv, iv, _weights = model
        res, ssk = _align(gconsts, miv, iv, graphs, feats, num_frames,
                          id2pdf)
        c, k = _carry_fold(
            gconsts, miv, iv, feats, res.tids, num_frames, res.failed,
            id2pdf, res.total_cost, carry[0], comp[0],
            state_pdf=graphs.state_pdf if per_state else None,
            state_scores=ssk,
        )
        return c[None], k[None]

    graphs_spec = (
        BandedGraphs(*([dp] * 5))
        if banded_offsets is not None
        else BatchedGraphs(*([dp] * 10))
    )
    fold_sharded = jax.jit(
        shard_map(
            fold,
            mesh=mesh,
            in_specs=((rep, rep, rep, rep), dp, dp, graphs_spec, dp, dp,
                      rep),
            out_specs=(dp, dp),
            check_vma=False,
        ),
        donate_argnums=(1, 2),
    )

    def finish(model, carry, comp):
        gconsts, miv, iv, weights = model
        # one collective per corpus pass: shard partial + its
        # compensation reduce together (comp rides along so the summed
        # total keeps the compensated precision of each shard's fold)
        total = jax.lax.psum(carry[0], "dp") + jax.lax.psum(comp[0], "dp")
        pk = num_pdfs * num_mix
        pkd = pk * dim
        occ = total[:pk].reshape(num_pdfs, num_mix)
        mean_acc = total[pk : pk + pkd].reshape(num_pdfs, num_mix, dim)
        var_acc = total[pk + pkd : pk + 2 * pkd].reshape(
            num_pdfs, num_mix, dim
        )
        new_model = _dense_mstep(
            occ, mean_acc, var_acc, gconsts, miv, iv, weights,
            **_mstep_kwargs(mle_config),
        )
        packet = total[pk + 2 * pkd :]  # [tot_ll, tot_frames, counts, tail]
        return new_model, packet

    finish_sharded = jax.jit(
        shard_map(
            finish,
            mesh=mesh,
            in_specs=((rep, rep, rep, rep), dp, dp),
            out_specs=((rep, rep, rep, rep), rep),
            check_vma=False,
        )
    )

    def make_carry():
        # NOTE: two separate zeros arrays — device_put of the SAME array
        # twice can return the same committed buffer (observed on a
        # 1-device mesh), and fold donates both, which XLA rejects as a
        # double donation
        sharding = NamedSharding(mesh, P("dp"))
        return (
            jax.device_put(jnp.zeros((n_dev, W), jnp.float32), sharding),
            jax.device_put(jnp.zeros((n_dev, W), jnp.float32), sharding),
        )

    return ShardedResidentEm(
        make_carry, fold_sharded, finish_sharded, W, num_tids
    )


class ShardedResidentEmLoop(NamedTuple):
    """Fully-resident multi-pass EM over the mesh (see
    sharded_resident_em_loop)."""

    make_carry: object   # () -> (carry, comp), zeros sharded over dp
    fold: object         # (model, delta, carry, comp, graphs, feats,
                         #  nf, id2pdf) — graphs hold BASE (prob-free)
                         #  costs; delta is applied in-trace
    finish: object       # (model, carry, comp, logp) ->
                         #  (new_model, logp_new, delta_new, packet)
    delta: object        # (logp) -> delta (for the first pass)
    carry_width: int
    num_tids: int


def sharded_resident_em_loop(
    mesh: Mesh,
    num_pdfs: int,
    num_mix: int,
    dim: int,
    num_tids: int,
    struct,
    acoustic_scale: float = 1.0,
    transition_scale: float = 1.0,
    self_loop_scale: float = 1.0,
    uniform_dest_pdf: bool = False,
    banded_offsets: Optional[Tuple[int, ...]] = None,
    banded_interpret: bool = False,
    mle_config=None,
    transition_cfg=None,
    per_state: bool = False,
) -> ShardedResidentEmLoop:
    """Mesh port of EStepPipeline.em_passes_resident: the transition
    update and the graph-cost refresh join the M-step INSIDE the
    replicated finish, so N corpus passes over the pod need one psum
    per pass and one host fetch at the very end.

    ``struct`` is model.transition_device.build_transition_struct(tm);
    the graphs passed to ``fold`` must be packed from
    pack_graphs_base output (costs WITHOUT transition probs — the
    current probs are applied per call as delta[tid] via the exact
    factored one-hot select).  Like the single-chip loop, banded graph
    batches must be parallel-arc-free for the delta shortcut to equal
    pack-after-refresh (the pipeline probes this; the XLA tables are
    exact unconditionally).

    Equality contract (tests/test_parallel.py): N fold/finish rounds ==
    the single-chip em_passes_resident on the same data, any mesh size.
    """
    from jax import shard_map

    from khg_tpu.align.banded import BandedGraphs
    from khg_tpu.align.packed import BatchedGraphs
    from khg_tpu.model.transition_device import (
        factored_take,
        transition_cost_deltas_device,
        transition_mle_update_device,
    )
    from khg_tpu.model.transition_model import MleTransitionUpdateConfig
    from khg_tpu.recipes.pipeline import _carry_fold, _carry_width

    tcfg = transition_cfg or MleTransitionUpdateConfig()
    assert not tcfg.share_for_pdfs
    dp = P("dp")
    rep = P()
    n_dev = mesh.devices.size
    W = _carry_width(num_pdfs, num_mix, dim, num_tids)

    _align = _make_align_estep(
        acoustic_scale, uniform_dest_pdf, banded_offsets,
        banded_interpret, per_state,
    )
    banded = banded_offsets is not None

    def fold(model, delta, carry, comp, graphs, feats, num_frames,
             id2pdf):
        gconsts, miv, iv, _weights = model
        if banded:
            graphs = graphs._replace(
                plane_cost=graphs.plane_cost
                + factored_take(delta, graphs.plane_tid)
            )
        else:
            graphs = graphs._replace(
                in_cost=graphs.in_cost
                + factored_take(delta, graphs.in_tid),
                out_cost=graphs.out_cost
                + factored_take(delta, graphs.out_tid),
            )
        res, ssk = _align(gconsts, miv, iv, graphs, feats, num_frames,
                          id2pdf)
        c, k = _carry_fold(
            gconsts, miv, iv, feats, res.tids, num_frames, res.failed,
            id2pdf, res.total_cost, carry[0], comp[0],
            state_pdf=graphs.state_pdf if per_state else None,
            state_scores=ssk,
        )
        return c[None], k[None]

    graphs_spec = (
        BandedGraphs(*([dp] * 5))
        if banded
        else BatchedGraphs(*([dp] * 10))
    )
    fold_sharded = jax.jit(
        shard_map(
            fold,
            mesh=mesh,
            in_specs=((rep, rep, rep, rep), rep, dp, dp, graphs_spec,
                      dp, dp, rep),
            out_specs=(dp, dp),
            check_vma=False,
        ),
        donate_argnums=(2, 3),
    )

    def finish(model, carry, comp, logp):
        gconsts, miv, iv, weights = model
        total = jax.lax.psum(carry[0], "dp") + jax.lax.psum(comp[0], "dp")
        pk = num_pdfs * num_mix
        pkd = pk * dim
        occ = total[:pk].reshape(num_pdfs, num_mix)
        mean_acc = total[pk : pk + pkd].reshape(num_pdfs, num_mix, dim)
        var_acc = total[pk + pkd : pk + 2 * pkd].reshape(
            num_pdfs, num_mix, dim
        )
        new_model = _dense_mstep(
            occ, mean_acc, var_acc, gconsts, miv, iv, weights,
            **_mstep_kwargs(mle_config),
        )
        packet = total[pk + 2 * pkd :]
        counts = packet[2 : 2 + num_tids + 1]
        logp_new, _objf, _csum = transition_mle_update_device(
            counts, logp, struct,
            floor=tcfg.floor, mincount=tcfg.mincount,
        )
        delta_new = transition_cost_deltas_device(
            logp_new, struct, transition_scale, self_loop_scale
        )
        return new_model, logp_new, delta_new, packet

    finish_sharded = jax.jit(
        shard_map(
            finish,
            mesh=mesh,
            in_specs=((rep, rep, rep, rep), dp, dp, rep),
            out_specs=((rep, rep, rep, rep), rep, rep, rep),
            check_vma=False,
        )
    )

    delta_fn = jax.jit(
        lambda lp: transition_cost_deltas_device(
            lp, struct, transition_scale, self_loop_scale
        )
    )

    def make_carry():
        # NOTE: two separate zeros arrays — device_put of the SAME array
        # twice can return the same committed buffer (observed on a
        # 1-device mesh), and fold donates both, which XLA rejects as a
        # double donation
        sharding = NamedSharding(mesh, P("dp"))
        return (
            jax.device_put(jnp.zeros((n_dev, W), jnp.float32), sharding),
            jax.device_put(jnp.zeros((n_dev, W), jnp.float32), sharding),
        )

    return ShardedResidentEmLoop(
        make_carry, fold_sharded, finish_sharded, delta_fn, W, num_tids
    )


def sharded_resident_fb_em_loop(
    mesh: Mesh,
    num_pdfs: int,
    num_mix: int,
    dim: int,
    num_tids: int,
    struct,
    acoustic_scale: float = 1.0,
    transition_scale: float = 1.0,
    self_loop_scale: float = 1.0,
    uniform_dest_pdf: bool = False,
    banded_offsets: Optional[Tuple[int, ...]] = None,
    banded_interpret: bool = False,
    mle_config=None,
    transition_cfg=None,
) -> ShardedResidentEmLoop:
    """Soft-EM (Baum-Welch) twin of sharded_resident_em_loop: the
    per-shard E-step is the forward-backward pass (expected posteriors
    and expected transition counts), folded into the same flat Kahan
    carry; the replicated finish runs the dense M-step, the transition
    update on EXPECTED counts, and the cost-delta refresh — one psum
    per pass, one host fetch per stretch.  Same delta-shortcut
    contract: banded FB batches are parallel-arc-free by construction
    (the packer rejects them), XLA tables exact unconditionally.

    Equality anchor: stats contract of mle-diag-gmm.cc:100-158 fed by
    posteriors; psum == serial sum (tests/test_parallel.py).
    """
    from jax import shard_map

    from khg_tpu.align.banded import BandedGraphs
    from khg_tpu.align.packed import BatchedGraphs
    from khg_tpu.model.transition_device import (
        factored_take,
        transition_cost_deltas_device,
        transition_mle_update_device,
    )
    from khg_tpu.model.transition_model import MleTransitionUpdateConfig
    from khg_tpu.recipes.pipeline import _carry_width, _soft_carry_fold

    tcfg = transition_cfg or MleTransitionUpdateConfig()
    assert not tcfg.share_for_pdfs
    dp = P("dp")
    rep = P()
    n_dev = mesh.devices.size
    W = _carry_width(num_pdfs, num_mix, dim, num_tids)
    banded = banded_offsets is not None

    def fold(model, delta, carry, comp, graphs, feats, num_frames):
        gconsts, miv, iv, _weights = model
        ll = gmm_loglikes(gconsts, miv, iv, feats)
        if banded:
            from khg_tpu.align.pallas_banded_fb import (
                forward_backward_banded,
            )

            graphs = graphs._replace(
                plane_cost=graphs.plane_cost
                + factored_take(delta, graphs.plane_tid)
            )
            fb = forward_backward_banded(
                graphs, banded_offsets, ll, num_frames, num_tids,
                acoustic_scale=acoustic_scale,
                block_b=min(16, graphs.plane_cost.shape[0]),
                interpret=banded_interpret,
            )
        else:
            from khg_tpu.align.forward_backward import (
                forward_backward_batch,
            )

            graphs = graphs._replace(
                in_cost=graphs.in_cost
                + factored_take(delta, graphs.in_tid),
                out_cost=graphs.out_cost
                + factored_take(delta, graphs.out_tid),
            )
            fb = forward_backward_batch(
                graphs, ll, num_frames, num_tids,
                acoustic_scale=acoustic_scale,
                state_pdf=(
                    graphs.in_pdf[:, :, 0] if uniform_dest_pdf else None
                ),
            )
        c, k = _soft_carry_fold(
            gconsts, miv, iv, feats, fb.log_z, fb.gamma, fb.tid_counts,
            fb.failed, carry[0], comp[0],
        )
        return c[None], k[None]

    graphs_spec = (
        BandedGraphs(*([dp] * 5))
        if banded
        else BatchedGraphs(*([dp] * 10))
    )
    fold_sharded = jax.jit(
        shard_map(
            fold,
            mesh=mesh,
            in_specs=((rep, rep, rep, rep), rep, dp, dp, graphs_spec,
                      dp, dp),
            out_specs=(dp, dp),
            check_vma=False,
        ),
        donate_argnums=(2, 3),
    )

    def finish(model, carry, comp, logp):
        gconsts, miv, iv, weights = model
        total = jax.lax.psum(carry[0], "dp") + jax.lax.psum(comp[0], "dp")
        pk = num_pdfs * num_mix
        pkd = pk * dim
        occ = total[:pk].reshape(num_pdfs, num_mix)
        mean_acc = total[pk : pk + pkd].reshape(num_pdfs, num_mix, dim)
        var_acc = total[pk + pkd : pk + 2 * pkd].reshape(
            num_pdfs, num_mix, dim
        )
        new_model = _dense_mstep(
            occ, mean_acc, var_acc, gconsts, miv, iv, weights,
            **_mstep_kwargs(mle_config),
        )
        packet = total[pk + 2 * pkd :]
        counts = packet[2 : 2 + num_tids + 1]
        logp_new, _objf, _csum = transition_mle_update_device(
            counts, logp, struct,
            floor=tcfg.floor, mincount=tcfg.mincount,
        )
        delta_new = transition_cost_deltas_device(
            logp_new, struct, transition_scale, self_loop_scale
        )
        return new_model, logp_new, delta_new, packet

    finish_sharded = jax.jit(
        shard_map(
            finish,
            mesh=mesh,
            in_specs=((rep, rep, rep, rep), dp, dp, rep),
            out_specs=((rep, rep, rep, rep), rep, rep, rep),
            check_vma=False,
        )
    )

    delta_fn = jax.jit(
        lambda lp: transition_cost_deltas_device(
            lp, struct, transition_scale, self_loop_scale
        )
    )

    def make_carry():
        sharding = NamedSharding(mesh, P("dp"))
        return (
            jax.device_put(jnp.zeros((n_dev, W), jnp.float32), sharding),
            jax.device_put(jnp.zeros((n_dev, W), jnp.float32), sharding),
        )

    return ShardedResidentEmLoop(
        make_carry, fold_sharded, finish_sharded, delta_fn, W, num_tids
    )


def unpack_resident_packet(packet: np.ndarray, num_tids: int):
    """Split a finish() packet into (tot_log_like, tot_frames,
    tid_counts, like_sum, num_done, num_error, frame_count)."""
    packet = np.asarray(packet, dtype=np.float64)
    tot_ll, tot_frames = packet[0], packet[1]
    counts = packet[2 : 2 + num_tids + 1]
    like_sum, num_done, num_error, frame_count = packet[2 + num_tids + 1 :]
    return (tot_ll, tot_frames, counts, like_sum, num_done, num_error,
            frame_count)
