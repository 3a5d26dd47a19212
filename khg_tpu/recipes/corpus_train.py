"""Corpus-scale monophone training: flat start -> mix-up growth ->
fully-resident multi-pass EM -> final model, at >=10k utterances.

The reference's defining artifact is a complete train.py run
(/root/reference/egs/yesno/train.py:36-230: per-iter accumulate ->
update -> mix-up on a num_gauss ramp, realign on realign_iters).  This
trainer keeps those semantics but restructures the loop around what the
chip is good at:

- GROWTH phase (iters 0..max_iter_inc): the model's component count
  grows along the power-rule ramp, so each iteration needs per-component
  occupancies on the host for split_by_count.  Each iter is ONE
  device-carry E-step (align_and_accumulate: fused scoring + Viterbi +
  stats fold, one fetch) + host M-step + mix-up.  Alignments are
  recomputed every iteration — a superset of the reference's
  realign_iters schedule, which lists nearly every early iteration
  anyway (train.py:52).
- STEADY phase (remaining iters): model shape is frozen, so the loop
  switches to em_passes_resident — model, stats carry, transition model
  and graph costs all device-resident, one fetch per multi-pass stretch.

Model shape growth is the recompile hazard CLAUDE.md documents: the
EStepPipeline pads mixture counts to ``mix_pad_multiple`` so the K axis
crosses a compiled-shape bucket only every ``mix_pad_multiple`` splits.

Checkpoints (``checkpoint_dir``) are written after every growth iter and
every steady stretch; resume restores the model, transition model, RNG
and schedule position bit-exactly (tests/test_checkpoint.py contract).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from khg_tpu.est.mle import MleDiagGmmOptions
from khg_tpu.lang.lexicon import Lexiconp
from khg_tpu.lang.lfst import make_lexicon_fst_with_silence
from khg_tpu.graph.compiler import (
    TrainingGraphCompiler,
    TrainingGraphCompilerOptions,
)
from khg_tpu.lang.topo import generate_hmm_topo
from khg_tpu.model.transition_model import MleTransitionUpdateConfig
from khg_tpu.recipes.pipeline import EStepPipeline
from khg_tpu.recipes.steps import gmm_est, gmm_info, gmm_init_mono
from khg_tpu.stats.accum import AccumAmDiagGmm

logger = logging.getLogger(__name__)


@dataclass
class CorpusTrainResult:
    transition_model: object
    tree: object
    am: object
    lexiconp: Lexiconp
    avg_loglikes: List[float]
    num_gauss_after_est: List[int]
    info: Dict[str, int]
    timings: Dict[str, float] = field(default_factory=dict)


def compile_training_graphs(
    lp: Lexiconp, tm, tree, word_seqs: Sequence[Sequence[str]],
    sil_prob: float = 0.5,
):
    """One graph per utterance, deduped by word-sequence (identical
    sentences share one compiled FST object — free for the packer, which
    caches by object identity)."""
    lex_fst = make_lexicon_fst_with_silence(
        lexiconp=lp, sil_prob=sil_prob, sil_phone="SIL"
    )
    gc = TrainingGraphCompiler(
        trans_model=tm, ctx_dep=tree, lex_fst=lex_fst,
        disambig_syms=lp.disambig_phone_ids(),
        opts=TrainingGraphCompilerOptions(),
    )
    cache = {}
    graphs = []
    for words in word_seqs:
        key = tuple(words)
        g = cache.get(key)
        if g is None:
            word_ids = [lp.word2id[w] for w in words]
            g = gc.compile_graph_from_text(word_ids)
            cache[key] = g
        graphs.append(g)
    return graphs


def train_corpus(
    lp: Lexiconp,
    word_seqs: Sequence[Sequence[str]],
    feats: Sequence[np.ndarray],
    num_iters: int = 30,
    total_gauss: int = 1000,
    max_iter_inc: int = 15,
    stretch: int = 6,
    acoustic_scale: float = 0.1,
    self_loop_scale: float = 0.1,
    batch_size: int = 256,
    mix_pad_multiple: int = 8,
    states_pad_multiple: int = 256,
    frames_pad_multiple: int = 256,
    align_backend: str = "banded",
    perturb_factor: float = 0.01,
    power: float = 0.2,
    min_count: float = 20.0,
    seed: int = 3,
    checkpoint_dir: Optional[str] = None,
    graphs=None,
) -> CorpusTrainResult:
    """Flat-start -> growth -> resident-stretch EM over the full corpus.

    ``feats`` are pre-extracted features (any dim); ``graphs`` may be
    passed to skip compilation (e.g. a staged runner that caches them).
    Matches /root/reference/egs/yesno/train.py:152-222 stage order:
    equal-align init, per-iter accumulate+est with inc_gauss mix-up up
    to max_iter_inc, then fixed-size iterations to num_iters.
    """
    from khg_tpu.fstlib.fst import equal_align
    from khg_tpu.utils.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )

    t_all = time.perf_counter()
    timings: Dict[str, float] = {}
    rng = np.random.default_rng(seed)
    n = len(feats)
    assert n == len(word_seqs)
    total_frames = sum(f.shape[0] for f in feats)
    audio_sec = total_frames / 100.0
    logger.info(
        "corpus train: %d utts, %.0f audio-sec, target %d Gaussians",
        n, audio_sec, total_gauss,
    )

    topo = generate_hmm_topo(
        non_sil_phones=lp.get_non_sil_phone_ids(),
        sil_phone=lp.get_sil_phone_id(),
    )

    resume = latest_checkpoint(checkpoint_dir) if checkpoint_dir else None
    if resume is not None:
        state = load_checkpoint(resume)
        tm, tree, am = (state["transition_model"], state["tree"],
                        state["acoustic_model"])
        avg_loglikes = state["avg_loglikes"]
        gauss_sched = state["num_gauss_after_est"]
        num_gauss = state["num_gauss"]
        inc_gauss = state["inc_gauss"]
        start_iter = state["iter"] + 1
        timings = state.get("timings", {})
        rng.bit_generator.state = state["rng_state"]
        logger.info("resumed from %s at iter %d", resume, start_iter)
    else:
        t0 = time.perf_counter()
        tm, tree, am = gmm_init_mono(topo, feats)
        timings["flat_start_s"] = time.perf_counter() - t0
        num_gauss = am.num_gauss
        inc_gauss = (total_gauss - num_gauss) // max_iter_inc
        start_iter = 0
        avg_loglikes = []
        gauss_sched = []

    t0 = time.perf_counter()
    if graphs is None:
        # compile with a PRISTINE transition model (topology probs):
        # compilation bakes the tm's probs into the graph costs
        # (graph/compiler.py:111-143), so compiling with the restored
        # (already-updated) tm on resume would shift every base cost and
        # break bit-exact resume.  refresh_transition_costs /
        # the resident loop's delta apply the CURRENT probs per pass on
        # top of these deterministic base costs either way.
        from khg_tpu.model.transition_model import TransitionModel

        tm0 = TransitionModel(ctx_dep=tree, hmm_topo=topo)
        graphs = compile_training_graphs(lp, tm0, tree, word_seqs)
    timings.setdefault("graph_compile_s", 0.0)
    timings["graph_compile_s"] += time.perf_counter() - t0

    # coarse shape padding: each distinct (T-bucket x S-pad x K-pad)
    # batch shape is one multi-second remote compile; at 10k utts fine
    # padding produced 38 shapes (373 s of first-epoch compiles) where
    # 256-multiples produce ~5 (67 s) for a measured -17% steady-state
    # cost — compile-dominated training runs want coarse buckets
    pipeline = EStepPipeline(
        tm, acoustic_scale=acoustic_scale, transition_scale=1.0,
        self_loop_scale=self_loop_scale, batch_size=batch_size,
        mix_pad_multiple=mix_pad_multiple,
        states_pad_multiple=states_pad_multiple,
        frames_pad_multiple=frames_pad_multiple,
        align_backend=align_backend,
    )
    base = pipeline.pack_graphs_base(graphs)
    gmm_opts = MleDiagGmmOptions()
    tcfg = MleTransitionUpdateConfig()

    def ckpt(it):
        if checkpoint_dir is None:
            return
        save_checkpoint(
            f"{checkpoint_dir}/iter_{it}.ckpt",
            {
                "iter": it,
                "transition_model": tm,
                "tree": tree,
                "acoustic_model": am,
                "avg_loglikes": avg_loglikes,
                "num_gauss_after_est": gauss_sched,
                "num_gauss": num_gauss,
                "inc_gauss": inc_gauss,
                "timings": timings,
                "rng_state": rng.bit_generator.state,
            },
        )

    if start_iter == 0:
        # ---- pass 0: equal-align init (train.py:116-150 semantics)
        t0 = time.perf_counter()
        alignments = []
        for g, f in zip(graphs, feats):
            res = equal_align(g, f.shape[0], rng)
            alignments.append(res[0] if res is not None else None)
        n_fail = sum(a is None for a in alignments)
        if n_fail:
            logger.warning("equal-align failed for %d utts", n_fail)
        timings["equal_align_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        ok = [i for i, a in enumerate(alignments) if a is not None]
        accs = AccumAmDiagGmm()
        accs.init(am, flags=0b1111)
        tacc = tm.init_stats()
        tot = pipeline.accumulate_from_alignments(
            am, [feats[i] for i in ok], [alignments[i] for i in ok],
            accs, tacc,
        )
        avg_loglikes.append(tot / max(accs.tot_count, 1.0))
        logger.info("pass 0 (equal-align) avg ll/frame: %.4f",
                    avg_loglikes[-1])
        gmm_est(
            am, accs, tm, tacc, tcfg,
            MleDiagGmmOptions(min_gaussian_occupancy=3.0),
            mixup=num_gauss, perturb_factor=perturb_factor,
            power=power, min_count=min_count, rng=rng,
        )
        gauss_sched.append(am.num_gauss)
        del alignments
        timings["init_pass_s"] = time.perf_counter() - t0
        ckpt(0)
        start_iter = 1

    # ---- GROWTH phase: one fully-resident pass per iter (device
    # M-step + device transition update + in-trace cost deltas — no
    # per-iter graph refresh/repack, which dominated an earlier
    # host-M-step formulation at 10k utts: refreshing creates new
    # PackedGraph objects, so every batch-table cache missed and
    # re-uploaded every iteration).  Mix-up is the only step that needs
    # the host: per-pdf occupancies are a (P, K) fetch off the carry.
    t_growth = time.perf_counter()
    it = start_iter
    model = pipeline.pack_model_device(am)
    while it <= min(max_iter_inc, num_iters - 1):
        # ramp matches train.py (est at target, then raise after): with
        # this loop 1-based, raising first gives the identical per-iter
        # target sequence — max_iter_inc increments total
        num_gauss += inc_gauss
        model, rec, occ = pipeline.em_passes_resident(
            model, base, feats, 1,
            mle_config=gmm_opts, transition_cfg=tcfg, return_occ=True,
        )
        if rec[0, 4]:
            logger.warning("iter %d: %d alignment failures", it,
                           int(rec[0, 4]))
        avg_loglikes.append(rec[0, 0] / max(rec[0, 1], 1.0))
        logger.info(
            "iter %d avg ll/frame: %.4f (%d Gauss -> target %d)",
            it, avg_loglikes[-1], am.num_gauss, num_gauss,
        )
        # device M-step already ran (== host MLE update, pinned by
        # tests/test_carry_estep.py); sync and grow on the host
        pipeline.apply_model_to_am(model, am)
        occs = occ.sum(axis=1)[: am.num_pdfs].astype(np.float32)
        am.split_by_count(
            occs, num_gauss, perturb_factor, power, min_count, rng=rng
        )
        model = pipeline.pack_model_device(am)
        gauss_sched.append(am.num_gauss)
        ckpt(it)
        it += 1
    timings.setdefault("growth_s", 0.0)
    timings["growth_s"] += time.perf_counter() - t_growth

    # ---- STEADY phase: fully-resident multi-pass stretches
    t_res = time.perf_counter()
    model = pipeline.pack_model_device(am)
    while it < num_iters:
        span = min(stretch, num_iters - it)
        model, rec = pipeline.em_passes_resident(
            model, base, feats, span,
            mle_config=gmm_opts, transition_cfg=tcfg,
        )
        for r in rec:
            # rec rows: [tot_ll, tot_frames, like_sum, done, err, fc, ...]
            avg_loglikes.append(r[0] / max(r[1], 1.0))
            gauss_sched.append(am.num_gauss)
        n_err = int(rec[:, 4].sum())
        if n_err:
            logger.warning("resident stretch: %d utt-pass failures", n_err)
        logger.info(
            "iters %d..%d (resident stretch) avg ll/frame: %.4f",
            it, it + span - 1, avg_loglikes[-1],
        )
        it += span
        pipeline.apply_model_to_am(model, am)
        ckpt(it - 1)
    timings.setdefault("resident_s", 0.0)
    timings["resident_s"] += time.perf_counter() - t_res

    timings["total_s"] = time.perf_counter() - t_all
    timings["audio_sec"] = audio_sec
    info = gmm_info(am, tm)
    logger.info("final: %s; timings: %s", info,
                {k: round(v, 2) for k, v in timings.items()})
    return CorpusTrainResult(
        tm, tree, am, lp, avg_loglikes, gauss_sched, info, timings
    )
