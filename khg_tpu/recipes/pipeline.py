"""Batched device E-step: align utterances and accumulate statistics.

Bridges the host world (ragged utterances, FST graphs, mutable models) and
the device world (padded dense tensors, jitted kernels):

  1. pack the acoustic model (one padded tensor set per E-step),
  2. pack each utterance's training graph (rebuilt per realignment pass,
     since transition probs change),
  3. bucket utterances by padded (T, S, M) shape to bound recompilation,
  4. per bucket: fused GEMM loglikes -> dense Viterbi -> stats GEMMs,
  5. fold dense padded stats back into the ragged host accumulators.

Equivalent of the reference's per-utterance loop
(/root/reference/egs/yesno/train.py:116-222, gmm_align_compiled.py,
gmm_acc_stats_ali.py) redesigned for batched TPU execution.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from khg_tpu.align.packed import (
    BIG,
    PackedGraph,
    pack_graph,
    pack_graph_batch,
    uniform_dest_pdf,
)
from khg_tpu.align.viterbi import FAIL_THRESHOLD, viterbi_align_batch
from khg_tpu.est.flags import GMM_ALL
from khg_tpu.fstlib.fst import VectorFst
from khg_tpu.gmm.am_gmm import AmDiagGmm
from khg_tpu.gmm.likelihoods import loglikes as gmm_loglikes
from khg_tpu.graph.h_builder import add_transition_probs
from khg_tpu.model.transition_model import TransitionModel
from khg_tpu.stats.accum import (
    AccumAmDiagGmm,
    accumulate_am_stats,
    accumulate_transition_stats,
)

logger = logging.getLogger(__name__)

# distinguishes "not cached" from a cached None ("use the XLA path")
_BANDED_CACHE_MISS = object()


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hard_stats_device(
    gconsts, miv, iv, bfeats, tids, lens, failed, id2pdf, total_cost
):
    """Jitted on-device stats from device-resident alignments, flattened
    into ONE f32 vector: frame weights, pdf lookup, the stats GEMMs, and
    the result packing all run on device, so a batch's entire stats come
    back in a single transfer (each transfer costs a full RTT on
    tunneled backends)."""
    import jax

    global _hard_stats_jit
    if _hard_stats_jit is None:

        def f(gconsts, miv, iv, bfeats, tids, lens, failed, id2pdf, total_cost):
            import jax.numpy as jnp

            T = bfeats.shape[1]
            fw = (
                (jnp.arange(T)[None, :] < lens[:, None]) & ~failed[:, None]
            ).astype(jnp.float32)
            s = accumulate_am_stats(gconsts, miv, iv, bfeats, id2pdf[tids], fw)
            return jnp.concatenate(
                [
                    total_cost,
                    failed.astype(jnp.float32),
                    s.occ.ravel(),
                    s.mean_acc.ravel(),
                    s.var_acc.ravel(),
                    s.tot_log_like[None],
                    s.tot_frames[None],
                ]
            )

        _hard_stats_jit = jax.jit(f)
    return _hard_stats_jit(
        gconsts, miv, iv, bfeats, tids, lens, failed, id2pdf, total_cost
    )


_hard_stats_jit = None


def _soft_stats_device(gconsts, miv, iv, bfeats, fb):
    """Jitted device-side soft-EM reduction: mask failed utterances,
    soft stats GEMMs, tid-count sum — packed into ONE f32 vector
    [log_z(B), failed(B), tid_counts(num_tids+1), stats...]."""
    import jax

    global _soft_stats_jit
    if _soft_stats_jit is None:

        def f(gconsts, miv, iv, bfeats, log_z, gamma, tid_counts, failed):
            import jax.numpy as jnp

            from khg_tpu.stats.accum import accumulate_am_stats_soft

            ok = ~failed
            gamma = jnp.where(ok[:, None, None], gamma, 0.0)
            s = accumulate_am_stats_soft(gconsts, miv, iv, bfeats, gamma)
            counts = jnp.sum(
                jnp.where(ok[:, None], tid_counts, 0.0), axis=0
            )
            return jnp.concatenate(
                [
                    jnp.where(ok, log_z, 0.0),
                    failed.astype(jnp.float32),
                    counts,
                    s.occ.ravel(),
                    s.mean_acc.ravel(),
                    s.var_acc.ravel(),
                    s.tot_log_like[None],
                    s.tot_frames[None],
                ]
            )

        _soft_stats_jit = jax.jit(f)
    return _soft_stats_jit(
        gconsts, miv, iv, bfeats, fb.log_z, fb.gamma, fb.tid_counts, fb.failed
    )


_soft_stats_jit = None


def _unpack_stats(flat: np.ndarray, P: int, K: int, D: int):
    """Host-side inverse of _hard_stats_device's packing."""
    occ, rest = flat[: P * K].reshape(P, K), flat[P * K :]
    mean_acc = rest[: P * K * D].reshape(P, K, D)
    var_acc = rest[P * K * D : 2 * P * K * D].reshape(P, K, D)
    tot_log_like, tot_frames = rest[2 * P * K * D :]
    return occ, mean_acc, var_acc, float(tot_log_like), float(tot_frames)


# ------------------------------------------------------- device-side carry
#
# Per-batch D2H fetches cost a full RTT each on tunneled backends, and an
# EM pass makes one per batch.  The carry mode instead folds every batch's
# stats into a device-resident running sum and fetches ONCE per pass.
# Cross-batch summation is Kahan-compensated in f32 (two jnp vectors), so
# dropping the host's per-batch f64 accumulation loses no precision that
# matters: within-batch sums are the same f32 GEMMs either way, and the
# compensated cross-batch sum does not accumulate drift — the fetched
# total is within one f32 ULP of the exact sum (correctly rounded; the
# (carry, comp) pair holds ~2x f32 precision while folding, but the
# final readout is one f32, so ULP-of-total is the honest bound — pinned
# by tests/test_carry_estep.py::test_kahan_carry_precision_many_folds).
#
# Carry layout (one flat f32 vector):
#   [occ (P*K), mean_acc (P*K*D), var_acc (P*K*D), tot_log_like, tot_frames,
#    tid_counts (num_tids+1), like_sum, num_done, num_error, frame_count]


def _carry_width(P: int, K: int, D: int, num_tids: int) -> int:
    return P * K * (2 * D + 1) + 2 + (num_tids + 1) + 4


def _kahan_add(carry, comp, x):
    """One compensated-summation step; returns (carry', comp').

    The optimization_barrier pins the rounding of ``t`` so XLA can never
    reassociate ``(t - carry) - y`` into zero (which would silently turn
    this back into a naive f32 sum)."""
    import jax

    y = x - comp
    t = jax.lax.optimization_barrier(carry + y)
    return t, (t - carry) - y


def _carry_fold(
    gconsts, miv, iv, bfeats, tids, lens, failed, id2pdf, total_cost,
    carry, comp, state_pdf=None, state_scores=None,
):
    """Traceable: fold one aligned batch's stats into the carry.

    Shared by _hard_stats_carry and the fused per-batch E-step jits.
    Pass ``state_pdf`` (and the per-state component ``state_scores``
    the scoring pass already produced) on wide models to fold through
    the local-state path — O(S) not O(P) stats GEMMs."""
    import jax.numpy as jnp

    T = bfeats.shape[1]
    ok = ~failed
    fw = (
        (jnp.arange(T)[None, :] < lens[:, None]) & ok[:, None]
    ).astype(jnp.float32)
    if state_pdf is not None:
        from khg_tpu.stats.accum import accumulate_am_stats_local

        s = accumulate_am_stats_local(
            gconsts, miv, iv, bfeats, id2pdf[tids], fw, state_pdf,
            state_scores=state_scores,
        )
    else:
        s = accumulate_am_stats(gconsts, miv, iv, bfeats, id2pdf[tids], fw)
    # transition counts on device: scatter-add of frame weights over
    # tids (tid 0 = padding/eps — zero it explicitly)
    counts = (
        jnp.zeros(id2pdf.shape[0], jnp.float32)
        .at[tids]
        .add(fw)
        .at[0]
        .set(0.0)
    )
    okf = ok.astype(jnp.float32)
    x = jnp.concatenate(
        [
            s.occ.ravel(),
            s.mean_acc.ravel(),
            s.var_acc.ravel(),
            s.tot_log_like[None],
            s.tot_frames[None],
            counts,
            jnp.sum(-total_cost * okf)[None],
            jnp.sum(okf)[None],
            jnp.sum(failed.astype(jnp.float32))[None],
            jnp.sum(lens.astype(jnp.float32) * okf)[None],
        ]
    )
    return _kahan_add(carry, comp, x)


def _hard_stats_carry(
    gconsts, miv, iv, bfeats, tids, lens, failed, id2pdf, total_cost,
    carry, comp,
):
    """Fold one aligned batch's stats into the device carry (no fetch)."""
    import jax

    global _hard_carry_jit
    if _hard_carry_jit is None:
        _hard_carry_jit = jax.jit(_carry_fold, donate_argnums=(9, 10))
    return _hard_carry_jit(
        gconsts, miv, iv, bfeats, tids, lens, failed, id2pdf, total_cost,
        carry, comp,
    )


_hard_carry_jit = None


def _soft_carry_fold(gconsts, miv, iv, bfeats, log_z, gamma, tid_counts,
                     failed, carry, comp):
    """Traceable: fold one forward-backward batch's soft stats into the
    carry (layout identical to _carry_fold's, so the same finishers
    work; the frame_count tail slot is 0 — FB has no per-frame hard
    assignment)."""
    import jax.numpy as jnp

    from khg_tpu.stats.accum import accumulate_am_stats_soft

    ok = ~failed
    gamma = jnp.where(ok[:, None, None], gamma, 0.0)
    s = accumulate_am_stats_soft(gconsts, miv, iv, bfeats, gamma)
    counts = jnp.sum(
        jnp.where(ok[:, None], tid_counts, 0.0), axis=0
    )
    okf = ok.astype(jnp.float32)
    x = jnp.concatenate(
        [
            s.occ.ravel(),
            s.mean_acc.ravel(),
            s.var_acc.ravel(),
            s.tot_log_like[None],
            s.tot_frames[None],
            counts,
            jnp.sum(jnp.where(ok, log_z, 0.0))[None],
            jnp.sum(okf)[None],
            jnp.sum(failed.astype(jnp.float32))[None],
            jnp.zeros((1,), jnp.float32),
        ]
    )
    return _kahan_add(carry, comp, x)


def _soft_stats_carry(gconsts, miv, iv, bfeats, fb, carry, comp):
    """Fold one forward-backward batch's soft stats into the carry."""
    import jax

    global _soft_carry_jit
    if _soft_carry_jit is None:
        _soft_carry_jit = jax.jit(_soft_carry_fold, donate_argnums=(8, 9))
    return _soft_carry_jit(
        gconsts, miv, iv, bfeats, fb.log_z, fb.gamma, fb.tid_counts,
        fb.failed, carry, comp,
    )


_soft_carry_jit = None


def _unpack_carry(flat: np.ndarray, P: int, K: int, D: int, num_tids: int):
    """Host-side inverse of the carry layout (see module comment)."""
    base = P * K * (2 * D + 1) + 2
    occ, mean_acc, var_acc, tot_ll, tot_frames = _unpack_stats(
        flat[:base], P, K, D
    )
    counts = flat[base : base + num_tids + 1].astype(np.float64)
    like_sum, num_done, num_error, frame_count = flat[base + num_tids + 1 :]
    return (
        occ, mean_acc, var_acc, tot_ll, tot_frames, counts,
        float(like_sum), int(round(float(num_done))),
        int(round(float(num_error))), int(round(float(frame_count))),
    )


def _start_host_copies(arrays) -> None:
    """Kick off async device->host copies; best-effort (the fetch in
    drain() is correct without it, this just overlaps the transfers
    with device compute and with each other)."""
    for x in arrays:
        try:
            x.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass


@dataclass
class AlignmentResult:
    """Host-side alignment outcome for a batch of utterances.

    ``alignments`` is None when the pass ran with
    ``return_alignments=False`` (stats-only carry mode — the tid
    sequences never leave the device)."""

    alignments: Optional[List[Optional[List[int]]]]  # per utt tids (None = failed)
    tot_like: float  # sum over utts of -(graph+acoustic)/acoustic_scale
    num_done: int
    num_error: int
    frame_count: int


class EStepPipeline:
    def __init__(
        self,
        transition_model: TransitionModel,
        acoustic_scale: float = 1.0,
        transition_scale: float = 1.0,
        self_loop_scale: float = 1.0,
        batch_size: int = 64,
        frames_pad_multiple: int = 32,
        states_pad_multiple: int = 8,
        indeg_pad_multiple: int = 2,
        mix_pad_multiple: int = 1,
        likelihood_backend: str = "xla",
        align_backend: str = "xla",
        feature_cache_budget: int = 2 << 30,
    ):
        """``likelihood_backend``: "xla" (f32, exact — default), "xla_bf16"
        (MXU-native, ~1.3x faster scoring), "pallas" (fused logsumexp
        kernel), or "pallas_bf16" (fastest).

        ``align_backend``: "xla" (one-hot scan — default) or "banded"
        (fused Pallas offset-plane kernel, ~2x faster on TPU; falls back
        to "xla" per batch when the graphs do not fit a band menu or
        VMEM).  Both are exact; ties between equal-cost parallel arcs
        may resolve to a different equally-optimal alignment.

        ``feature_cache_budget``: bytes of padded feature batches to keep
        resident on the device across calls.  EM re-runs the E-step on
        the same corpus every pass, so re-uploading features each pass
        wastes host->device bandwidth (a full per-batch RTT each on
        tunneled/remote backends).  Keyed on the utterance arrays'
        identity (id + data pointer + shape): do not mutate feature
        arrays in place between passes.  0 disables caching."""
        self.tm = transition_model
        self.acoustic_scale = acoustic_scale
        self.transition_scale = transition_scale
        self.self_loop_scale = self_loop_scale
        self.batch_size = batch_size
        self.frames_pad = frames_pad_multiple
        self.states_pad = states_pad_multiple
        self.indeg_pad = indeg_pad_multiple
        self.mix_pad = mix_pad_multiple
        self.id2pdf = transition_model.id2pdf_array()
        self._id2pdf_device = None
        from khg_tpu.utils.profiling import Counters

        self.counters = Counters()
        assert likelihood_backend in ("xla", "xla_bf16", "pallas", "pallas_bf16")
        self.likelihood_backend = likelihood_backend
        assert align_backend in ("xla", "banded")
        self.align_backend = align_backend
        import collections

        self.feature_cache_budget = feature_cache_budget
        self._feat_cache = collections.OrderedDict()
        self._feat_cache_bytes = 0
        self._band_perm_cache = collections.OrderedDict()
        # device-resident banded tables keyed on (structure, costs):
        # EM passes re-align the same batches, and rebuilding + re-
        # uploading ~7 MB of plane tables per batch per pass costs more
        # than the aligned kernel itself (~95 ms vs ~17 ms measured)
        self._banded_args_cache = collections.OrderedDict()
        self._fused_jit_cache = {}  # static config -> fused e-step jit
        # identity-keyed front cache over (pack_graph_batch +
        # _try_pack_banded): a pass over an unchanged packed-graph list
        # (no refresh_transition_costs) skips the batch stacking AND the
        # bytes hashing entirely.  Values pin the PackedGraph objects so
        # the id()-based keys cannot be reused by the allocator.
        self._batch_graph_cache = collections.OrderedDict()

    def _pack_model(self, am):
        """Pack the model and park its tensors on the device ONCE per
        E-step pass.  Host numpy arrays passed to jitted calls re-upload
        on EVERY call (3+ calls per batch — ~0.5 MB each through the
        tunnel); device arrays transfer once here."""
        import dataclasses

        import jax.numpy as jnp

        m = am.pack(mix_pad_to=self.mix_pad)
        return dataclasses.replace(
            m,
            gconsts=jnp.asarray(m.gconsts),
            means_invvars=jnp.asarray(m.means_invvars),
            inv_vars=jnp.asarray(m.inv_vars),
        )

    def _id2pdf_dev(self):
        """Device-resident copy of the tid->pdf table (uploaded once)."""
        if self._id2pdf_device is None:
            import jax.numpy as jnp

            self._id2pdf_device = jnp.asarray(self.id2pdf)
        return self._id2pdf_device

    def _pipelined(self, batches, dispatch, drain, max_in_flight):
        """Run dispatch over batches with up to max_in_flight undrained,
        so host packing, transfers, and device compute overlap."""
        import collections

        pending = collections.deque()
        for b in batches:
            pending.append(dispatch(b))
            if len(pending) >= max_in_flight:
                drain(pending.popleft())
        while pending:
            drain(pending.popleft())

    def _batch_feats(self, idx, feats):
        """Assemble (and device-cache) one padded feature batch.

        Returns (bfeats, lens, bt) where bfeats is a device array when
        cached (upload happens once per distinct batch) or the host
        array otherwise."""
        bt = _round_up(max(feats[i].shape[0] for i in idx), self.frames_pad)
        lens = np.array([feats[i].shape[0] for i in idx], dtype=np.int32)
        cacheable = self.feature_cache_budget > 0 and all(
            isinstance(feats[i], np.ndarray) for i in idx
        )
        if cacheable:
            key = (bt,) + tuple(
                (id(feats[i]), feats[i].ctypes.data, feats[i].shape)
                for i in idx
            )
            cached = self._feat_cache.get(key)
            if cached is not None:
                return cached[0], lens, bt
        bfeats = np.zeros((len(idx), bt, feats[0].shape[1]), dtype=np.float32)
        for j, i in enumerate(idx):
            bfeats[j, : feats[i].shape[0]] = feats[i]
        if cacheable and bfeats.nbytes <= self.feature_cache_budget:
            import jax.numpy as jnp

            # evict oldest entries (insertion order) to fit the budget
            while self._feat_cache_bytes + bfeats.nbytes > self.feature_cache_budget:
                _, (old_dev, _) = self._feat_cache.popitem(last=False)
                self._feat_cache_bytes -= old_dev.nbytes

            dev = jnp.asarray(bfeats)
            # keep references to the source arrays: the key uses id() +
            # data pointer, which the allocator may REUSE once an array
            # is garbage-collected — pinning them makes stale hits
            # impossible
            self._feat_cache[key] = (dev, [feats[i] for i in idx])
            self._feat_cache_bytes += bfeats.nbytes
            return dev, lens, bt
        return bfeats, lens, bt

    def _loglikes(self, model, bfeats):
        return self._loglikes_raw(
            model.gconsts, model.means_invvars, model.inv_vars, bfeats
        )

    def _loglikes_raw(self, gconsts, miv, iv, bfeats):
        dtype = "bfloat16" if self.likelihood_backend.endswith("bf16") else None
        if self.likelihood_backend.startswith("pallas"):
            from khg_tpu.gmm.pallas_kernels import loglikes_pallas

            return loglikes_pallas(
                gconsts, miv, iv, bfeats, compute_dtype=dtype,
            )
        return gmm_loglikes(gconsts, miv, iv, bfeats, compute_dtype=dtype)

    def _fused_carry_fn(self, banded_args, wide):
        """One jitted call per batch for the carry E-step: scoring +
        Viterbi + stats fold in a single dispatch (3 separate dispatches
        each cost tunnel latency).  Cached per static config; jax.jit
        re-specializes on shapes within each entry."""
        if banded_args is not None:
            _, offsets, block_b, interpret = banded_args
            key = ("banded", offsets, block_b, interpret, wide)
        else:
            key = ("xla",)
        fn = self._fused_jit_cache.get(key)
        if fn is not None:
            return fn
        import jax

        acoustic_scale = self.acoustic_scale
        if banded_args is not None:
            from khg_tpu.align.pallas_banded import viterbi_align_banded

            if wide:
                from khg_tpu.gmm.likelihoods import (
                    component_scores_per_state,
                )

                def step(gconsts, miv, iv, bfeats, lens, tables,
                         id2pdf, carry, comp):
                    # ONE per-state component-score GEMM feeds the
                    # alignment scoring AND the local-state stats fold
                    ssk = component_scores_per_state(
                        gconsts, miv, iv, tables.state_pdf, bfeats
                    )
                    sac = jax.nn.logsumexp(ssk, axis=-1)
                    res = viterbi_align_banded(
                        tables, offsets, None, lens, id2pdf,
                        acoustic_scale=acoustic_scale, block_b=block_b,
                        interpret=interpret, sac=sac,
                    )
                    return _carry_fold(
                        gconsts, miv, iv, bfeats, res.tids, lens,
                        res.failed, id2pdf, res.total_cost, carry, comp,
                        state_pdf=tables.state_pdf, state_scores=ssk,
                    )
            else:

                def step(gconsts, miv, iv, bfeats, lens, tables,
                         id2pdf, carry, comp):
                    ll = self._loglikes_raw(gconsts, miv, iv, bfeats)
                    res = viterbi_align_banded(
                        tables, offsets, ll, lens, id2pdf,
                        acoustic_scale=acoustic_scale, block_b=block_b,
                        interpret=interpret,
                    )
                    return _carry_fold(
                        gconsts, miv, iv, bfeats, res.tids, lens,
                        res.failed, id2pdf, res.total_cost, carry, comp,
                    )

            fn = jax.jit(step, donate_argnums=(7, 8))
        else:

            def step(gconsts, miv, iv, bfeats, lens, tables, state_pdf,
                     id2pdf, carry, comp):
                ll = self._loglikes_raw(gconsts, miv, iv, bfeats)
                res = viterbi_align_batch(
                    tables, ll, lens, id2pdf,
                    acoustic_scale=acoustic_scale, state_pdf=state_pdf,
                )
                return _carry_fold(
                    gconsts, miv, iv, bfeats, res.tids, lens,
                    res.failed, id2pdf, res.total_cost, carry, comp,
                )

            fn = jax.jit(step, donate_argnums=(8, 9))
        self._fused_jit_cache[key] = fn
        return fn

    def _batch_graphs(self, idx, packed_graphs, bt, fb: bool = False):
        """Batched (and, when enabled, banded) graph tables for these
        utterances, front-cached on the PackedGraph objects' identity.

        Returns (graphs, banded_args, state_pdf) where state_pdf is the
        uniform-destination-pdf table for the XLA path (None when the
        banded tables are used or the graphs are not dest-uniform).
        A hit skips the batch stacking and the bytes-key hashing of the
        inner banded cache — measurable host time per batch per EM pass.
        Do not mutate PackedGraphs in place between passes (refresh via
        refresh_transition_costs creates new objects, which miss here
        and re-key correctly)."""
        key = (
            fb, bt, self.states_pad, self.indeg_pad,
            tuple(id(packed_graphs[i]) for i in idx),
        )
        hit = self._batch_graph_cache.get(key)
        if hit is not None:
            self._batch_graph_cache.move_to_end(key)
            return hit[0], hit[1], hit[2]
        graphs = pack_graph_batch(
            [packed_graphs[i] for i in idx],
            states_pad_to=self.states_pad,
            indeg_pad_to=self.indeg_pad,
            semiring="log" if fb else "tropical",
        )
        banded_args = (
            self._try_pack_banded(graphs, bt, fb=fb)
            if self.align_backend == "banded" else None
        )
        state_pdf = None if banded_args else uniform_dest_pdf(graphs)
        self._batch_graph_cache[key] = (
            graphs, banded_args, state_pdf,
            [packed_graphs[i] for i in idx],  # pin: id()s stay unique
        )
        while len(self._batch_graph_cache) > 32:
            self._batch_graph_cache.popitem(last=False)
        return graphs, banded_args, state_pdf

    def _try_pack_banded(self, graphs, frames, fb: bool = False):
        """Banded tables for this batch, or None to use the XLA path.

        Results (including the None "use XLA" verdict) are cached keyed
        on (arc structure, costs): EM passes re-align the same batches,
        and rebuilding + re-uploading ~7 MB of plane tables per batch
        per pass costs more than the align kernel itself (~95 ms vs
        ~17 ms measured through the tunnel).  Positive entries hold
        DEVICE-resident tables, so hits skip the H2D transfer too.
        """
        from khg_tpu.align.packed import FAIL_PAD_THRESHOLD

        in_src = np.asarray(graphs.in_src)
        in_cost = np.asarray(graphs.in_cost)
        real = in_cost < FAIL_PAD_THRESHOLD
        key = (in_src.shape, in_src.tobytes(), np.packbits(real).tobytes())
        ckey = (fb, frames, key, in_cost.tobytes())
        _MISS = _BANDED_CACHE_MISS
        hit = self._banded_args_cache.get(ckey, _MISS)
        if hit is not _MISS:
            self._banded_args_cache.move_to_end(ckey)
            return hit
        result = self._pack_banded_uncached(graphs, frames, fb, key)
        self._banded_args_cache[ckey] = result
        while len(self._banded_args_cache) > 8:  # ~7 MB device each
            self._banded_args_cache.popitem(last=False)
        return result

    def _pack_banded_uncached(self, graphs, frames, fb, key):
        import jax

        from khg_tpu.align.banded import band_renumber, pack_banded
        from khg_tpu.align.pallas_banded import (
            banded_vmem_bytes,
            pick_block_b,
        )
        from khg_tpu.align.pallas_banded_fb import (
            banded_fb_scratch_bytes,
            banded_fb_vmem_bytes,
        )

        # the SCC renumbering depends only on the arc structure, which EM
        # passes leave unchanged (only costs move) — cache it on exactly
        # that structure (bytes keys: cheap memcmp on hit)
        ren, perm = band_renumber(graphs, perm=self._band_perm_cache.get(key))
        self._band_perm_cache[key] = perm
        while len(self._band_perm_cache) > 64:  # bounded (keys hold blobs)
            self._band_perm_cache.popitem(last=False)
        sp = uniform_dest_pdf(ren)
        if sp is None:
            return None
        # FB needs every parallel arc's mass (sum semiring); the banded
        # planes keep only the min-cost arc per (src, dst), so reject and
        # fall back to the one-hot XLA FB when duplicates exist.
        out = pack_banded(ren, sp, reject_parallel=fb)
        if out is None:
            return None
        banded, offsets = out
        B, DK, S = banded.plane_cost.shape
        if not fb and DK >= 128:  # int8 backpointer limit (Viterbi only)
            return None
        P = int(self.id2pdf.max()) + 1  # pdf one-hot width = num loglike cols
        vmem = banded_fb_vmem_bytes if fb else banded_vmem_bytes
        scratch = banded_fb_scratch_bytes if fb else None
        block_b = pick_block_b(vmem, B, DK, S, frames, P, scratch_fn=scratch)
        if block_b is None:
            return None  # even block_b=1 would blow VMEM — use the XLA path
        interpret = jax.default_backend() == "cpu"
        if not interpret:  # park the tables on the device once
            import jax.numpy as jnp

            banded = jax.tree.map(jnp.asarray, banded)
        return banded, offsets, block_b, interpret

    # ------------------------------------------------------------- packing

    def pack_graphs(
        self, graphs: Sequence[VectorFst], careful: bool = False
    ) -> List[PackedGraph]:
        """Apply current transition probs (align-time scales) and pack.

        Mirrors gmm_align_compiled: scaled transition costs are ADDED to the
        compile-time graph costs, on a copy.  ``careful`` concatenates a
        final-stripped copy so wrap-around alignments fail loudly
        (AlignConfig.careful).
        """
        from khg_tpu.graph.h_builder import modify_graph_for_careful_alignment

        id2pdf = self.tm.id2pdf_array()
        packed = []
        for g in graphs:
            gc = g.copy()
            add_transition_probs(
                self.tm, gc, self.transition_scale, self.self_loop_scale
            )
            if careful:
                gc = modify_graph_for_careful_alignment(gc)
            packed.append(pack_graph(gc, id2pdf))
        return packed

    def pack_graphs_base(
        self, graphs: Sequence[VectorFst]
    ) -> List[PackedGraph]:
        """Pack once WITHOUT transition probs; per EM pass, apply the
        current probs with refresh_transition_costs — a vectorized
        per-tid add on the packed arrays instead of an FST copy and a
        per-arc Python pass per utterance per pass."""
        id2pdf = self.tm.id2pdf_array()
        return [pack_graph(g, id2pdf) for g in graphs]

    def transition_cost_deltas(self) -> np.ndarray:
        """(num_tids+1,) f32: -scaled log P(tid) under the CURRENT
        transition model (index 0 = 0), as add_transition_probs applies
        per arc (hmm-utils.cc:442-493)."""
        from khg_tpu.graph.h_builder import _scaled_transition_log_prob

        n = self.tm.num_transition_ids
        d = np.zeros(n + 1, dtype=np.float32)
        for tid in range(1, n + 1):
            d[tid] = -_scaled_transition_log_prob(
                self.tm, tid, self.transition_scale, self.self_loop_scale
            )
        return d

    def refresh_transition_costs(
        self, base: Sequence[PackedGraph]
    ) -> List[PackedGraph]:
        """Packed graphs with current transition probs applied.

        Equivalent to pack_graphs on the original FSTs up to f32
        association (the delta adds after the eps-prefix sum instead of
        before); eps paths carry no tids, so exactly one delta applies
        per packed arc.  Padding survives: delta[tid=0] = 0."""
        import dataclasses

        d = self.transition_cost_deltas()
        out = []
        for pg in base:
            repl = dict(
                in_cost=(pg.in_cost + d[pg.in_tid]).astype(np.float32),
                out_cost=(pg.out_cost + d[pg.out_tid]).astype(np.float32),
            )
            if pg.in_cost_log is not None:
                # paths combined into one slot share the tid, so the
                # delta commutes with the log-add: exact
                repl["in_cost_log"] = (
                    pg.in_cost_log + d[pg.in_tid]
                ).astype(np.float32)
                repl["out_cost_log"] = (
                    pg.out_cost_log + d[pg.out_tid]
                ).astype(np.float32)
            out.append(dataclasses.replace(pg, **repl))
        return out

    # -------------------------------------------------------------- e-step

    def _align_batch(self, model, idx, packed_graphs, feats):
        """Dispatch one batch's Viterbi alignment to the device.

        Picks the backend per batch: banded Pallas kernel when the
        graphs fit a band (per-state O(S) scoring for wide models,
        external-acoustic or in-kernel select otherwise), XLA one-hot
        scan when they do not.  Returns (res, bfeats, lens)."""
        bfeats, lens, bt = self._batch_feats(idx, feats)
        graphs, banded_args, state_pdf = self._batch_graphs(
            idx, packed_graphs, bt
        )
        if banded_args:
            from khg_tpu.align.pallas_banded import (
                EXTERNAL_AC_PDFS,
                viterbi_align_banded,
            )

            banded, offsets, block_b, interpret = banded_args
            P = int(self.id2pdf.max()) + 1
            if P > EXTERNAL_AC_PDFS:
                # wide (triphone-scale) models: score ONLY each graph
                # state's pdf — O(S) not O(P) scoring work (the stats
                # GEMMs recompute assigned-pdf posteriors themselves)
                from khg_tpu.gmm.likelihoods import loglikes_per_state

                sac = loglikes_per_state(
                    model.gconsts, model.means_invvars,
                    model.inv_vars, banded.state_pdf, bfeats,
                )
                res = viterbi_align_banded(
                    banded, offsets, None, lens, self._id2pdf_dev(),
                    acoustic_scale=self.acoustic_scale,
                    block_b=block_b, interpret=interpret, sac=sac,
                )
            else:
                res = viterbi_align_banded(
                    banded, offsets, self._loglikes(model, bfeats),
                    lens, self._id2pdf_dev(),
                    acoustic_scale=self.acoustic_scale,
                    block_b=block_b, interpret=interpret,
                )
        else:
            res = viterbi_align_batch(
                graphs, self._loglikes(model, bfeats), lens,
                self._id2pdf_dev(),
                acoustic_scale=self.acoustic_scale,
                state_pdf=state_pdf,
            )
        return res, bfeats, lens

    def _run_carry_fold_loop(self, gconsts, miv, iv, packed_graphs, feats):
        """Dispatch the whole stats-only E-step: every batch's scoring +
        Viterbi + stats fold into the device-resident compensated carry.
        Returns the (carry, comp) device arrays WITHOUT fetching."""
        import jax
        import jax.numpy as jnp

        P, K = gconsts.shape
        D = miv.shape[-1]
        num_tids = self.tm.num_transition_ids
        n = len(feats)
        order = sorted(range(n), key=lambda i: feats[i].shape[0])
        width = _carry_width(P, K, D, num_tids)
        carry = jnp.zeros(width, jnp.float32)
        comp = jnp.zeros(width, jnp.float32)

        from khg_tpu.align.pallas_banded import EXTERNAL_AC_PDFS

        wide = int(self.id2pdf.max()) + 1 > EXTERNAL_AC_PDFS
        for k, lo in enumerate(range(0, n, self.batch_size)):
            idx = order[lo : lo + self.batch_size]
            bfeats, lens, bt = self._batch_feats(idx, feats)
            graphs, banded_args, state_pdf = self._batch_graphs(
                idx, packed_graphs, bt
            )
            # scoring + Viterbi + stats fold: ONE dispatch per batch
            if banded_args is not None:
                fn = self._fused_carry_fn(banded_args, wide)
                try:
                    carry, comp = fn(
                        gconsts, miv, iv, bfeats, lens, banded_args[0],
                        self._id2pdf_dev(), carry, comp,
                    )
                except Exception as e:  # compile-time kernel failure
                    state_pdf = self._demote_banded(
                        idx, packed_graphs, bt, graphs, e
                    )
                    banded_args = None
            if banded_args is None:
                fn = self._fused_carry_fn(None, False)
                carry, comp = fn(
                    gconsts, miv, iv, bfeats, lens, graphs, state_pdf,
                    self._id2pdf_dev(), carry, comp,
                )
            if k % 128 == 127:
                # bound the async dispatch queue (one RTT per 128
                # batches; keeps host-side buffers from piling up on
                # very large corpora)
                jax.device_get(carry[-1])
        return carry, comp

    def _align_accumulate_carry(
        self, model, packed_graphs, feats, gmm_accs, transition_accs,
    ) -> AlignmentResult:
        """Stats-only E-step: align every batch and fold its stats into
        a device-resident compensated carry; ONE fetch for the whole
        pass (see align_and_accumulate's docstring)."""
        import jax

        P, K = model.gconsts.shape
        D = model.means_invvars.shape[-1]
        num_tids = self.tm.num_transition_ids
        n = len(feats)
        total_frames = sum(f.shape[0] for f in feats)
        t_pass0 = time.perf_counter()
        with self.counters.phase("align", frames=total_frames):
            carry, _comp = self._run_carry_fold_loop(
                model.gconsts, model.means_invvars, model.inv_vars,
                packed_graphs, feats,
            )
            t_dispatched = time.perf_counter()
            flat = np.asarray(jax.device_get(carry), dtype=np.float64)
            t_fetched = time.perf_counter()
            # pass-level breakdown for the bench/BENCH.md overhead audit:
            # dispatch wall = host packing + async enqueues (device
            # compute overlaps it); fetch wall = device drain + the one
            # device->host carry transfer (dominated by tunnel RTT here)
            self.last_carry_timings = {
                "dispatch_s": t_dispatched - t_pass0,
                "fetch_s": t_fetched - t_dispatched,
                "batches": (n + self.batch_size - 1) // self.batch_size,
            }
        (
            occ, mean_acc, var_acc, tot_ll, tot_frames, counts,
            like_sum, num_done, num_error, frame_count,
        ) = _unpack_carry(flat, P, K, D, num_tids)
        if num_error:
            logger.warning(
                "Alignment failed for %d of %d utterances", num_error, n
            )
        if gmm_accs is not None:
            gmm_accs.add_dense(occ, mean_acc, var_acc, tot_ll, tot_frames)
        if transition_accs is not None:
            transition_accs += counts
        return AlignmentResult(
            None, like_sum / self.acoustic_scale,
            num_done, num_error, frame_count,
        )

    # ------------------------------------------------- device-resident EM

    def pack_model_device(self, am: AmDiagGmm):
        """(gconsts, means_invvars, inv_vars, weights) device tuple for
        device-resident EM passes (em_pass_resident)."""
        import jax.numpy as jnp

        m = self._pack_model(am)
        P, K = m.gconsts.shape
        w = np.zeros((P, K), dtype=np.float32)
        for p in range(am.num_pdfs):
            g = am.get_pdf(p)
            w[p, : g.num_gauss] = g.weights
        return (m.gconsts, m.means_invvars, m.inv_vars, jnp.asarray(w))

    def apply_model_to_am(self, model, am: AmDiagGmm) -> None:
        """Write a device-resident model back into the host AmDiagGmm —
        the sync point for checkpoints, mix-up, and boost-silence.

        The device M-step deactivates starved components (weight 0,
        zeroed rows — the dense analogue of the reference's removal);
        write-back drops them so the host model matches the reference's
        post-removal shape."""
        gconsts, miv, iv, w = (np.asarray(x) for x in model)
        D = am.dim
        for p in range(am.num_pdfs):
            g = am.get_pdf(p)
            k = g.num_gauss
            keep = w[p, :k] > 0
            if not keep.all():
                g.resize(int(keep.sum()), D)
            g.weights = w[p, :k][keep].astype(np.float32).copy()
            g.inv_vars = iv[p, :k, :D][keep].astype(np.float32).copy()
            g.means_invvars = (
                miv[p, :k, :D][keep].astype(np.float32).copy()
            )
            g.valid_gconsts = False
            g.compute_gconsts()

    def _fused_carry_delta_fn(self, banded_args, wide):
        """Fused per-batch E-step that applies the CURRENT transition
        cost deltas to the (base-packed, transition-prob-free) graph
        tables in-trace — the multi-pass-resident loop's variant of
        _fused_carry_fn.  delta[tid 0] = 0, so padding cells are
        untouched (BIG + 0 = BIG)."""
        if banded_args is not None:
            _, offsets, block_b, interpret = banded_args
            key = ("banded-delta", offsets, block_b, interpret, wide)
        else:
            key = ("xla-delta",)
        fn = self._fused_jit_cache.get(key)
        if fn is not None:
            return fn
        import jax

        acoustic_scale = self.acoustic_scale
        if banded_args is not None:
            from khg_tpu.align.pallas_banded import viterbi_align_banded

            if wide:
                from khg_tpu.gmm.likelihoods import (
                    component_scores_per_state,
                )

                def step(gconsts, miv, iv, bfeats, lens, tables, delta,
                         id2pdf, carry, comp):
                    from khg_tpu.model.transition_device import (
                        factored_take,
                    )

                    tables = tables._replace(
                        plane_cost=tables.plane_cost
                        + factored_take(delta, tables.plane_tid)
                    )
                    ssk = component_scores_per_state(
                        gconsts, miv, iv, tables.state_pdf, bfeats
                    )
                    sac = jax.nn.logsumexp(ssk, axis=-1)
                    res = viterbi_align_banded(
                        tables, offsets, None, lens, id2pdf,
                        acoustic_scale=acoustic_scale, block_b=block_b,
                        interpret=interpret, sac=sac,
                    )
                    return _carry_fold(
                        gconsts, miv, iv, bfeats, res.tids, lens,
                        res.failed, id2pdf, res.total_cost, carry, comp,
                        state_pdf=tables.state_pdf, state_scores=ssk,
                    )
            else:

                def step(gconsts, miv, iv, bfeats, lens, tables, delta,
                         id2pdf, carry, comp):
                    from khg_tpu.model.transition_device import (
                        factored_take,
                    )

                    tables = tables._replace(
                        plane_cost=tables.plane_cost
                        + factored_take(delta, tables.plane_tid)
                    )
                    ll = self._loglikes_raw(gconsts, miv, iv, bfeats)
                    res = viterbi_align_banded(
                        tables, offsets, ll, lens, id2pdf,
                        acoustic_scale=acoustic_scale, block_b=block_b,
                        interpret=interpret,
                    )
                    return _carry_fold(
                        gconsts, miv, iv, bfeats, res.tids, lens,
                        res.failed, id2pdf, res.total_cost, carry, comp,
                    )

            fn = jax.jit(step, donate_argnums=(8, 9))
        else:

            def step(gconsts, miv, iv, bfeats, lens, tables, state_pdf,
                     delta, id2pdf, carry, comp):
                from khg_tpu.model.transition_device import factored_take

                tables = tables._replace(
                    in_cost=tables.in_cost
                    + factored_take(delta, tables.in_tid),
                    out_cost=tables.out_cost
                    + factored_take(delta, tables.out_tid),
                )
                ll = self._loglikes_raw(gconsts, miv, iv, bfeats)
                res = viterbi_align_batch(
                    tables, ll, lens, id2pdf,
                    acoustic_scale=acoustic_scale, state_pdf=state_pdf,
                )
                return _carry_fold(
                    gconsts, miv, iv, bfeats, res.tids, lens,
                    res.failed, id2pdf, res.total_cost, carry, comp,
                )

            fn = jax.jit(step, donate_argnums=(9, 10))
        self._fused_jit_cache[key] = fn
        return fn

    def _fused_fb_carry_delta_fn(self, banded_args):
        """Soft-EM twin of _fused_carry_delta_fn: apply the current
        transition cost deltas in-trace, run forward-backward, fold the
        soft stats into the carry — one dispatch per batch.  The banded
        FB packing already rejects parallel-arc batches
        (reject_parallel), so the delta shortcut is exact wherever the
        kernel runs; the XLA tables are exact unconditionally."""
        if banded_args is not None:
            _, offsets, block_b, interpret = banded_args
            key = ("fb-banded-delta", offsets, block_b, interpret)
        else:
            key = ("fb-xla-delta",)
        fn = self._fused_jit_cache.get(key)
        if fn is not None:
            return fn
        import jax

        acoustic_scale = self.acoustic_scale
        num_tids = self.tm.num_transition_ids
        if banded_args is not None:
            from khg_tpu.align.pallas_banded_fb import (
                forward_backward_banded,
            )

            def step(gconsts, miv, iv, bfeats, lens, tables, delta,
                     carry, comp):
                from khg_tpu.model.transition_device import factored_take

                tables = tables._replace(
                    plane_cost=tables.plane_cost
                    + factored_take(delta, tables.plane_tid)
                )
                ll = self._loglikes_raw(gconsts, miv, iv, bfeats)
                fb = forward_backward_banded(
                    tables, offsets, ll, lens, num_tids,
                    acoustic_scale=acoustic_scale, block_b=block_b,
                    interpret=interpret,
                )
                return _soft_carry_fold(
                    gconsts, miv, iv, bfeats, fb.log_z, fb.gamma,
                    fb.tid_counts, fb.failed, carry, comp,
                )

            fn = jax.jit(step, donate_argnums=(7, 8))
        else:
            from khg_tpu.align.forward_backward import (
                forward_backward_batch,
            )

            def step(gconsts, miv, iv, bfeats, lens, tables, state_pdf,
                     delta, carry, comp):
                from khg_tpu.model.transition_device import factored_take

                tables = tables._replace(
                    in_cost=tables.in_cost
                    + factored_take(delta, tables.in_tid),
                    out_cost=tables.out_cost
                    + factored_take(delta, tables.out_tid),
                )
                ll = self._loglikes_raw(gconsts, miv, iv, bfeats)
                fb = forward_backward_batch(
                    tables, ll, lens, num_tids,
                    acoustic_scale=acoustic_scale, state_pdf=state_pdf,
                )
                return _soft_carry_fold(
                    gconsts, miv, iv, bfeats, fb.log_z, fb.gamma,
                    fb.tid_counts, fb.failed, carry, comp,
                )

            fn = jax.jit(step, donate_argnums=(8, 9))
        self._fused_jit_cache[key] = fn
        return fn

    def _demote_banded(self, idx, packed_graphs, bt, graphs, e,
                       fb: bool = False):
        """A banded-kernel compile failed on the real chip (observed:
        scoped-VMEM OOM at shapes the host-side estimator accepts, e.g.
        Tpad=640/S=256/block_b=32 allocates 31 MB against the 16 MB
        stack while Tpad=512 fits).  Demote this batch's cache entry to
        the XLA tables so every later pass skips both the kernel and
        the failed-compile retry, and return the XLA state_pdf."""
        logger.warning(
            "banded kernel compile failed for batch shape "
            "(bt=%d, %d utts); using XLA tables for it: %s",
            bt, len(idx), str(e).splitlines()[-1][:300],
        )
        sp = uniform_dest_pdf(graphs)
        key = (
            fb, bt, self.states_pad, self.indeg_pad,
            tuple(id(packed_graphs[i]) for i in idx),
        )
        self._batch_graph_cache[key] = (
            graphs, None, sp, [packed_graphs[i] for i in idx],
        )
        return sp

    @staticmethod
    def _banded_parallel_free(graphs) -> bool:
        """True when no (src, dst) pair carries 2+ real arcs: banded
        packing then never min-prunes, so adding cost deltas to the
        base-packed planes is EXACTLY pack-after-refresh.  (With
        parallel arcs the min is taken under whichever costs were
        current at pack time, and the delta shortcut would freeze that
        choice — those batches fall back to the XLA tables, where every
        arc survives and the delta is exact unconditionally.)"""
        from khg_tpu.align.packed import FAIL_PAD_THRESHOLD

        in_src = np.asarray(graphs.in_src)
        in_cost = np.asarray(graphs.in_cost)
        real = in_cost < FAIL_PAD_THRESHOLD
        bs, ss, ms = np.nonzero(real)
        if len(bs) == 0:
            return True
        src = in_src[bs, ss, ms].astype(np.int64)
        S = in_src.shape[1]
        cell = (bs.astype(np.int64) * S + ss) * S + src
        return len(np.unique(cell)) == len(cell)

    def _resident_loop_finish_fn(
        self, P, K, D, num_tids, mle_config, struct, tcfg
    ):
        """Jitted multi-pass finisher: device M-step + device
        transition-model update + fresh cost deltas + per-pass record
        row.  NOTHING is fetched; the host only redispatches."""
        from khg_tpu.model.transition_device import (
            transition_cost_deltas_device,
            transition_mle_update_device,
        )
        from khg_tpu.parallel.mesh import _dense_mstep, _mstep_kwargs

        kw = _mstep_kwargs(mle_config)
        vfv = kw.get("variance_floor_vector")
        key = (
            "loop-finish", P, K, D, num_tids,
            tcfg.floor, tcfg.mincount,
            self.transition_scale, self.self_loop_scale,
            tuple(sorted(
                (k, v) for k, v in kw.items()
                if k != "variance_floor_vector"
            )),
            None if vfv is None else np.asarray(vfv).tobytes(),
        )
        fn = self._fused_jit_cache.get(key)
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp

        tscale, slscale = self.transition_scale, self.self_loop_scale

        def finish(gconsts, miv, iv, weights, carry, logp):
            pk = P * K
            pkd = P * K * D
            occ = carry[:pk].reshape(P, K)
            mean_acc = carry[pk : pk + pkd].reshape(P, K, D)
            var_acc = carry[pk + pkd : pk + 2 * pkd].reshape(P, K, D)
            off = pk + 2 * pkd
            scalars = carry[off : off + 2]  # tot_log_like, tot_frames
            counts = carry[off + 2 : off + 2 + num_tids + 1]
            tail = carry[off + 2 + num_tids + 1 :]
            new_model = _dense_mstep(
                occ, mean_acc, var_acc, gconsts, miv, iv, weights, **kw
            )
            logp_new, objf_t, count_t = transition_mle_update_device(
                counts, logp, struct,
                floor=tcfg.floor, mincount=tcfg.mincount,
            )
            delta = transition_cost_deltas_device(
                logp_new, struct, tscale, slscale
            )
            row = jnp.concatenate(
                [scalars, tail, objf_t[None], count_t[None]]
            )
            return new_model, logp_new, delta, row

        # NOTE: keep every argument shape pass-count-independent — an
        # earlier (passes, 8) records argument recompiled the finisher
        # whenever the stretch length changed (~1.2 s per recompile
        # through the tunnel, measured)
        fn = jax.jit(finish)
        self._fused_jit_cache[key] = fn
        return fn

    def em_passes_resident(
        self,
        model,
        base_packed_graphs: Sequence[PackedGraph],
        feats: Sequence[np.ndarray],
        passes: int,
        mle_config=None,
        transition_cfg=None,
        return_occ: bool = False,
    ):
        """``passes`` consecutive EM passes with EVERYTHING resident:
        model, stats carry, transition model, and graph costs all live
        on the chip; the transition update and the cost refresh run as
        device math (model/transition_device.py), so the host only
        dispatches async work and fetches ONE small record block at the
        very end — the per-pass tunnel round-trip that bounds
        em_pass_resident disappears.

        ``base_packed_graphs`` must come from pack_graphs_base (costs
        WITHOUT transition probs); the current probs are applied
        in-trace as per-tid deltas (exact: every packed arc carries one
        tid, and batches whose banded packing would min-prune parallel
        arcs fall back to the XLA tables automatically).

        Returns (new_model, records) where records is a (passes, 8)
        f64 array of rows [tot_log_like, tot_frames, like_sum,
        num_done, num_error, frame_count, transition_objf_impr,
        transition_count].  The host TransitionModel is synced to the
        final device state before returning.  Like em_pass_resident,
        sync the GMM side with apply_model_to_am at boundaries.
        """
        import jax
        import jax.numpy as jnp

        from khg_tpu.align.pallas_banded import EXTERNAL_AC_PDFS
        from khg_tpu.model.transition_device import (
            build_transition_struct,
            transition_cost_deltas_device,
        )
        from khg_tpu.model.transition_model import (
            MleTransitionUpdateConfig,
        )

        gconsts, miv, iv, weights = model
        P, K = gconsts.shape
        D = miv.shape[-1]
        num_tids = self.tm.num_transition_ids
        tcfg = transition_cfg or MleTransitionUpdateConfig()
        assert not tcfg.share_for_pdfs, (
            "device transition update implements the non-shared "
            "variant; use the host loop for share_for_pdfs"
        )
        struct = build_transition_struct(self.tm)
        logp = jnp.asarray(np.asarray(self.tm.log_probs, np.float32))
        dkey = ("tdelta", self.transition_scale, self.self_loop_scale,
                struct.num_tids, len(struct.sizes))
        delta_fn = self._fused_jit_cache.get(dkey)
        if delta_fn is None:
            delta_fn = jax.jit(
                lambda lp: transition_cost_deltas_device(
                    lp, struct, self.transition_scale,
                    self.self_loop_scale,
                )
            )
            self._fused_jit_cache[dkey] = delta_fn
        delta = delta_fn(logp)

        n = len(feats)
        order = sorted(range(n), key=lambda i: feats[i].shape[0])
        wide = int(self.id2pdf.max()) + 1 > EXTERNAL_AC_PDFS
        id2pdf_dev = self._id2pdf_dev()
        batches = []
        for lo in range(0, n, self.batch_size):
            idx = order[lo : lo + self.batch_size]
            bfeats, lens, bt = self._batch_feats(idx, feats)
            graphs, banded_args, state_pdf = self._batch_graphs(
                idx, base_packed_graphs, bt
            )
            if banded_args is not None and not self._banded_parallel_free(
                graphs
            ):
                banded_args = None
                state_pdf = uniform_dest_pdf(graphs)
            batches.append(
                [bfeats, lens, graphs, banded_args, state_pdf, idx, bt]
            )

        finish = self._resident_loop_finish_fn(
            P, K, D, num_tids, mle_config, struct, tcfg
        )
        width = _carry_width(P, K, D, num_tids)
        rows = []
        total_frames = sum(f.shape[0] for f in feats) * passes
        with self.counters.phase("align", frames=total_frames):
            for p in range(passes):
                carry = jnp.zeros(width, jnp.float32)
                comp = jnp.zeros(width, jnp.float32)
                for batch in batches:
                    bfeats, lens, graphs, banded_args, state_pdf = (
                        batch[:5]
                    )
                    if banded_args is not None:
                        fn = self._fused_carry_delta_fn(banded_args, wide)
                        try:
                            carry, comp = fn(
                                gconsts, miv, iv, bfeats, lens,
                                banded_args[0], delta, id2pdf_dev,
                                carry, comp,
                            )
                            continue
                        except Exception as e:  # kernel compile failure
                            state_pdf = self._demote_banded(
                                batch[5], base_packed_graphs, batch[6],
                                graphs, e,
                            )
                            batch[3], batch[4] = None, state_pdf
                    fn = self._fused_carry_delta_fn(None, False)
                    carry, comp = fn(
                        gconsts, miv, iv, bfeats, lens, graphs,
                        state_pdf, delta, id2pdf_dev, carry, comp,
                    )
                (gconsts, miv, iv, weights), logp, delta, row = finish(
                    gconsts, miv, iv, weights, carry, logp,
                )
                rows.append(row)
                # the finisher does not donate the carry, so the final
                # pass's occupancies are still fetchable — the only
                # extra data mix-up growth needs (P*K floats)
                occ_carry = carry if return_occ else None
            rec = np.asarray(
                jax.device_get(jnp.stack(rows)), np.float64
            )
            logp_host = np.asarray(jax.device_get(logp), np.float32)
            occ = None
            if return_occ:
                occ = np.asarray(
                    jax.device_get(occ_carry[: P * K]), np.float64
                ).reshape(P, K)
        self.tm.log_probs[1:] = logp_host[1:]
        self.tm._compute_derived_of_probs()
        n_err = rec[:, 4].sum()
        if n_err:
            logger.warning(
                "Alignment failed for %d utterance-passes",
                int(round(n_err)),
            )
        if return_occ:
            return (gconsts, miv, iv, weights), rec, occ
        return (gconsts, miv, iv, weights), rec

    def fb_em_passes_resident(
        self,
        model,
        base_packed_graphs: Sequence[PackedGraph],
        feats: Sequence[np.ndarray],
        passes: int,
        mle_config=None,
        transition_cfg=None,
    ):
        """Soft-EM (Baum-Welch) twin of em_passes_resident: ``passes``
        consecutive forward-backward EM passes with model, stats carry,
        transition model and graph costs all device-resident — the
        transition update runs on the EXPECTED tid counts (reference
        contract: the same accumulate/update stats path,
        mle-diag-gmm.cc:100-158, fed by posteriors instead of a hard
        alignment), and the host fetches one record block at the end.

        Returns (new_model, records); records rows are [tot_log_like,
        tot_frames, log_z_sum, num_done, num_error, 0, t_objf, t_count]
        (the frame_count slot is 0 — FB has no hard assignment).
        """
        import jax
        import jax.numpy as jnp

        from khg_tpu.model.transition_device import (
            build_transition_struct,
            transition_cost_deltas_device,
        )
        from khg_tpu.model.transition_model import (
            MleTransitionUpdateConfig,
        )

        gconsts, miv, iv, weights = model
        P, K = gconsts.shape
        D = miv.shape[-1]
        num_tids = self.tm.num_transition_ids
        tcfg = transition_cfg or MleTransitionUpdateConfig()
        assert not tcfg.share_for_pdfs
        struct = build_transition_struct(self.tm)
        logp = jnp.asarray(np.asarray(self.tm.log_probs, np.float32))
        dkey = ("tdelta", self.transition_scale, self.self_loop_scale,
                struct.num_tids, len(struct.sizes))
        delta_fn = self._fused_jit_cache.get(dkey)
        if delta_fn is None:
            delta_fn = jax.jit(
                lambda lp: transition_cost_deltas_device(
                    lp, struct, self.transition_scale,
                    self.self_loop_scale,
                )
            )
            self._fused_jit_cache[dkey] = delta_fn
        delta = delta_fn(logp)

        n = len(feats)
        order = sorted(range(n), key=lambda i: feats[i].shape[0])
        batches = []
        for lo in range(0, n, self.batch_size):
            idx = order[lo : lo + self.batch_size]
            bfeats, lens, bt = self._batch_feats(idx, feats)
            graphs, banded_args, state_pdf = self._batch_graphs(
                idx, base_packed_graphs, bt, fb=True
            )
            batches.append(
                [bfeats, lens, graphs, banded_args, state_pdf, idx, bt]
            )

        finish = self._resident_loop_finish_fn(
            P, K, D, num_tids, mle_config, struct, tcfg
        )
        width = _carry_width(P, K, D, num_tids)
        rows = []
        total_frames = sum(f.shape[0] for f in feats) * passes
        with self.counters.phase("fb", frames=total_frames):
            for p in range(passes):
                carry = jnp.zeros(width, jnp.float32)
                comp = jnp.zeros(width, jnp.float32)
                for batch in batches:
                    bfeats, lens, graphs, banded_args, state_pdf = (
                        batch[:5]
                    )
                    if banded_args is not None:
                        fn = self._fused_fb_carry_delta_fn(banded_args)
                        try:
                            carry, comp = fn(
                                gconsts, miv, iv, bfeats, lens,
                                banded_args[0], delta, carry, comp,
                            )
                            continue
                        except Exception as e:  # kernel compile failure
                            state_pdf = self._demote_banded(
                                batch[5], base_packed_graphs, batch[6],
                                graphs, e, fb=True,
                            )
                            batch[3], batch[4] = None, state_pdf
                    fn = self._fused_fb_carry_delta_fn(None)
                    carry, comp = fn(
                        gconsts, miv, iv, bfeats, lens, graphs,
                        state_pdf, delta, carry, comp,
                    )
                (gconsts, miv, iv, weights), logp, delta, row = finish(
                    gconsts, miv, iv, weights, carry, logp,
                )
                rows.append(row)
            rec = np.asarray(
                jax.device_get(jnp.stack(rows)), np.float64
            )
            logp_host = np.asarray(jax.device_get(logp), np.float32)
        self.tm.log_probs[1:] = logp_host[1:]
        self.tm._compute_derived_of_probs()
        n_err = rec[:, 4].sum()
        if n_err:
            logger.warning(
                "Forward-backward failed for %d utterance-passes",
                int(round(n_err)),
            )
        return (gconsts, miv, iv, weights), rec

    def _resident_finish_fn(self, P, K, D, num_tids, mle_config):
        """Jitted pass finisher: slice the carry, run the device M-step,
        emit the new model + a SMALL host packet (tid counts + summary
        scalars).  The P*K*(2D+1) stats never leave the device."""
        from khg_tpu.parallel.mesh import _dense_mstep, _mstep_kwargs

        kw = _mstep_kwargs(mle_config)
        vfv = kw.get("variance_floor_vector")
        key = (
            "finish", P, K, D, num_tids,
            tuple(sorted(
                (k, v) for k, v in kw.items()
                if k != "variance_floor_vector"
            )),
            None if vfv is None else np.asarray(vfv).tobytes(),
        )
        fn = self._fused_jit_cache.get(key)
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp

        def finish(gconsts, miv, iv, weights, carry):
            pk = P * K
            pkd = P * K * D
            occ = carry[:pk].reshape(P, K)
            mean_acc = carry[pk : pk + pkd].reshape(P, K, D)
            var_acc = carry[pk + pkd : pk + 2 * pkd].reshape(P, K, D)
            off = pk + 2 * pkd
            scalars = carry[off : off + 2]  # tot_log_like, tot_frames
            counts = carry[off + 2 : off + 2 + num_tids + 1]
            tail = carry[off + 2 + num_tids + 1 :]
            new_model = _dense_mstep(
                occ, mean_acc, var_acc, gconsts, miv, iv, weights, **kw
            )
            packet = jnp.concatenate([counts, scalars, tail])
            return new_model, packet

        # no donation: none of the outputs matches the carry's shape,
        # so donating it only produces "donated buffer not usable"
        # warnings
        fn = jax.jit(finish)
        self._fused_jit_cache[key] = fn
        return fn

    def em_pass_resident(
        self,
        model,
        packed_graphs: Sequence[PackedGraph],
        feats: Sequence[np.ndarray],
        mle_config=None,
    ):
        """One full EM pass with the model DEVICE-RESIDENT: the carry
        E-step folds every batch's stats on device, the M-step consumes
        the carry in place, and the host fetches only the transition
        counts + summary scalars (~num_tids floats, not the
        P*K*(2D+1) stats — 42 MB at triphone scale, ~1.7 s through this
        container's tunnel but milliseconds of device math).

        Returns (new_model, tid_counts, AlignmentResult-with-None-
        alignments).  ``new_model`` is the (gconsts, means_invvars,
        inv_vars, weights) device tuple for the next pass; sync it to a
        host AmDiagGmm with apply_model_to_am at checkpoint / mix-up /
        boost-silence boundaries.  The transition-model update stays on
        the host (counts are small): call tm.mle_update(counts) and
        refresh_transition_costs between passes exactly as in the
        host-driven loop.
        """
        import jax

        gconsts, miv, iv, weights = model
        P, K = gconsts.shape
        D = miv.shape[-1]
        num_tids = self.tm.num_transition_ids
        total_frames = sum(f.shape[0] for f in feats)
        with self.counters.phase("align", frames=total_frames):
            carry, _comp = self._run_carry_fold_loop(
                gconsts, miv, iv, packed_graphs, feats
            )
            finish = self._resident_finish_fn(P, K, D, num_tids, mle_config)
            new_model, packet = finish(gconsts, miv, iv, weights, carry)
            packet = np.asarray(
                jax.device_get(packet), dtype=np.float64
            )
        counts = packet[: num_tids + 1]
        tot_ll, tot_frames = packet[num_tids + 1 : num_tids + 3]
        like_sum, num_done, num_error, frame_count = packet[num_tids + 3 :]
        if num_error:
            logger.warning(
                "Alignment failed for %d of %d utterances",
                int(round(num_error)), len(feats),
            )
        return (
            new_model,
            counts,
            AlignmentResult(
                None, like_sum / self.acoustic_scale,
                int(round(num_done)), int(round(num_error)),
                int(round(frame_count)),
            ),
        )

    def align_and_accumulate(
        self,
        am: AmDiagGmm,
        packed_graphs: Sequence[PackedGraph],
        feats: Sequence[np.ndarray],
        gmm_accs: Optional[AccumAmDiagGmm] = None,
        transition_accs: Optional[np.ndarray] = None,
        accumulate: bool = True,
        max_in_flight: int = 4,
        return_alignments: bool = True,
    ) -> AlignmentResult:
        """Viterbi-align all utterances; optionally accumulate GMM and
        transition stats from the alignments (weight 1.0 per frame).

        Batches are pipelined: up to ``max_in_flight`` batches are
        dispatched to the device before the oldest is fetched, so host
        packing and the (latency-heavy, ~100s of ms through a tunnel)
        device->host transfer overlap device compute.  Each batch's
        entire result — alignment, costs, AND the GMM stats, which are
        reduced on device — comes back in ONE transfer.

        ``return_alignments=False`` (stats-only EM passes) goes further:
        every batch's stats — GMM stats AND transition counts — fold
        into a device-resident Kahan-compensated carry, and the whole
        pass makes ONE device->host fetch at the end.  The tid
        sequences never leave the device (``result.alignments`` is
        None), so per-utterance failure logging degrades to a count."""
        assert len(packed_graphs) == len(feats)
        import collections

        import jax

        model = self._pack_model(am)
        n = len(feats)
        order = sorted(range(n), key=lambda i: feats[i].shape[0])
        alignments: List[Optional[List[int]]] = [None] * n
        tot_like = 0.0
        num_done = 0
        num_error = 0
        frame_count = 0
        do_gmm = accumulate and gmm_accs is not None
        if not return_alignments:
            assert accumulate, (
                "return_alignments=False only makes sense when "
                "accumulating: the alignments are the only other output"
            )
            return self._align_accumulate_carry(
                model, packed_graphs, feats, gmm_accs, transition_accs,
            )

        def dispatch(idx):
            res, bfeats, lens = self._align_batch(
                model, idx, packed_graphs, feats
            )
            if do_gmm:
                # everything but the tids rides in ONE packed f32 buffer
                flat = _hard_stats_device(
                    model.gconsts, model.means_invvars, model.inv_vars,
                    bfeats, res.tids, lens, res.failed, self._id2pdf_dev(),
                    res.total_cost,
                )
                out = [res.tids, flat]
            else:
                out = [res.tids, res.total_cost, res.failed]
            _start_host_copies(out)
            return idx, lens, out

        P, K = model.gconsts.shape
        D = model.means_invvars.shape[-1]

        def drain(job):
            nonlocal tot_like, num_done, num_error, frame_count, transition_accs
            idx, lens, out = job
            fetched = jax.device_get(out)
            tids = fetched[0]
            if do_gmm:
                flat = fetched[1]
                B = len(idx)
                total_cost, failed = flat[:B], flat[B : 2 * B] > 0.5
            else:
                total_cost, failed = fetched[1], fetched[2]
            for j, i in enumerate(idx):
                if failed[j]:
                    num_error += 1
                    logger.warning("Alignment failed for utterance %d", i)
                    continue
                t = int(lens[j])
                alignments[i] = tids[j, :t].tolist()
                # like = -(graph_cost + acoustic_cost)/acoustic_scale, as in
                # AlignUtteranceWrapper (decoder-wrappers.cc:99)
                tot_like += -float(total_cost[j]) / self.acoustic_scale
                num_done += 1
                frame_count += t
            if do_gmm:
                occ, mean_acc, var_acc, tot_ll, tot_frames = _unpack_stats(
                    flat[2 * len(idx):], P, K, D
                )
                gmm_accs.add_dense(occ, mean_acc, var_acc, tot_ll, tot_frames)
            if accumulate and transition_accs is not None:
                ok = ~failed
                transition_accs += accumulate_transition_stats(
                    tids[ok], lens[ok], self.tm.num_transition_ids
                )

        total_frames = sum(f.shape[0] for f in feats)
        with self.counters.phase("align", frames=total_frames):
            self._pipelined((order[lo : lo + self.batch_size] for lo in range(0, n, self.batch_size)), dispatch, drain, max_in_flight)
        return AlignmentResult(alignments, tot_like, num_done, num_error, frame_count)

    def accumulate_forward_backward(
        self,
        am: AmDiagGmm,
        packed_graphs: Sequence[PackedGraph],
        feats: Sequence[np.ndarray],
        gmm_accs: AccumAmDiagGmm,
        transition_accs: Optional[np.ndarray] = None,
        max_in_flight: int = 4,
    ) -> float:
        """Soft E-step: Baum-Welch posteriors instead of a hard alignment.

        Returns the total data log-likelihood (sum of per-utterance log Z).

        Stats-only by construction, so every batch folds into the
        device-resident compensated carry and the whole pass makes one
        device->host fetch (see align_and_accumulate's docstring).
        """
        from khg_tpu.align.forward_backward import forward_backward_batch

        assert len(packed_graphs) == len(feats)
        import jax
        import jax.numpy as jnp

        model = self._pack_model(am)
        P, K = model.gconsts.shape
        D = model.means_invvars.shape[-1]
        num_tids = self.tm.num_transition_ids
        n = len(feats)
        order = sorted(range(n), key=lambda i: feats[i].shape[0])
        width = _carry_width(P, K, D, num_tids)
        carry = jnp.zeros(width, jnp.float32)
        comp = jnp.zeros(width, jnp.float32)

        def run_batch(idx):
            bfeats, lens, bt = self._batch_feats(idx, feats)
            # fb=True: sum-over-paths log semiring, parallel eps log-add
            graphs, banded_args, sp = self._batch_graphs(
                idx, packed_graphs, bt, fb=True
            )
            ll = self._loglikes(model, bfeats)
            if banded_args:
                from khg_tpu.align.pallas_banded_fb import (
                    forward_backward_banded,
                )

                banded, offsets, block_b, interpret = banded_args
                fb = forward_backward_banded(
                    banded, offsets, ll, lens, num_tids,
                    acoustic_scale=self.acoustic_scale,
                    block_b=block_b, interpret=interpret,
                )
            else:
                fb = forward_backward_batch(
                    graphs, ll, lens, num_tids,
                    acoustic_scale=self.acoustic_scale,
                    state_pdf=sp,
                    # long batches: checkpointed alphas (O(sqrt-ish T)
                    # residency instead of O(T)); exact
                    time_chunk=(
                        256 if sp is not None and bt > 1024 else None
                    ),
                )
            return _soft_stats_carry(
                model.gconsts, model.means_invvars, model.inv_vars,
                bfeats, fb, carry, comp,
            )

        for k, lo in enumerate(range(0, n, self.batch_size)):
            carry, comp = run_batch(order[lo : lo + self.batch_size])
            if k % 128 == 127:  # bound the async dispatch queue
                jax.device_get(carry[-1])
        flat = np.asarray(jax.device_get(carry), dtype=np.float64)
        (
            occ, mean_acc, var_acc, tot_ll, tot_frames, counts,
            log_z_sum, num_done, num_error, _,
        ) = _unpack_carry(flat, P, K, D, num_tids)
        if num_error:
            logger.warning(
                "Forward-backward failed for %d of %d utterances",
                num_error, n,
            )
        gmm_accs.add_dense(occ, mean_acc, var_acc, tot_ll, tot_frames)
        if transition_accs is not None:
            transition_accs += counts
        return log_z_sum

    def accumulate_from_alignments(
        self,
        am: AmDiagGmm,
        feats: Sequence[np.ndarray],
        alignments: Sequence[Sequence[int]],
        gmm_accs: AccumAmDiagGmm,
        transition_accs: Optional[np.ndarray] = None,
        max_in_flight: int = 4,
    ) -> float:
        """Stats from FIXED alignments (equal-align init / re-accumulation).

        Returns the total log-like.  Device path of gmm_acc_stats_ali.
        Every batch folds into the device-resident compensated carry —
        ONE device->host fetch for the whole pass (see
        align_and_accumulate's docstring); transition stats come
        straight from the host-side alignments (exact f64, no device
        round-trip)."""
        import jax
        import jax.numpy as jnp

        model = self._pack_model(am)
        P, K = model.gconsts.shape
        D = model.means_invvars.shape[-1]
        num_tids = self.tm.num_transition_ids
        n = len(feats)
        order = sorted(range(n), key=lambda i: feats[i].shape[0])
        width = _carry_width(P, K, D, num_tids)
        carry = jnp.zeros(width, jnp.float32)
        comp = jnp.zeros(width, jnp.float32)

        def run_batch(idx, carry, comp):
            nonlocal transition_accs
            bfeats, lens, bt = self._batch_feats(idx, feats)
            btids = np.zeros((len(idx), bt), dtype=np.int32)
            for j, i in enumerate(idx):
                t = feats[i].shape[0]
                assert len(alignments[i]) == t
                btids[j, :t] = alignments[i]
            if transition_accs is not None:
                transition_accs += accumulate_transition_stats(
                    btids, lens, self.tm.num_transition_ids
                )
            B = len(idx)
            return _hard_stats_carry(
                model.gconsts, model.means_invvars, model.inv_vars,
                bfeats, btids, jnp.asarray(lens),
                jnp.zeros(B, dtype=bool), self._id2pdf_dev(),
                jnp.zeros(B, dtype=jnp.float32), carry, comp,
            )

        for k, lo in enumerate(range(0, n, self.batch_size)):
            carry, comp = run_batch(
                order[lo : lo + self.batch_size], carry, comp
            )
            if k % 128 == 127:  # bound the async dispatch queue
                jax.device_get(carry[-1])
        flat = np.asarray(jax.device_get(carry), dtype=np.float64)
        (
            occ, mean_acc, var_acc, tot_ll, tot_frames,
            _counts, _like, _done, _err, _fc,
        ) = _unpack_carry(flat, P, K, D, num_tids)
        gmm_accs.add_dense(occ, mean_acc, var_acc, tot_ll, tot_frames)
        tot = tot_ll
        return tot
