"""Generate the EM-loop trajectory problem for em_loop_runner.cc.

The reference's defining observable is the per-pass average-log-likelihood
trajectory of the full EM loop (/root/reference/egs/yesno/train.py:116-222:
equal-align init -> accumulate -> update -> boost-silence -> realign on
realign_iters -> mix-up).  Per-component parity can't catch an interaction
bug (realign scheduling, mix-up timing, boost ordering), so this exports
everything both sides need to run the SAME loop:

  - deterministic synthetic corpus features (the khg test rebuilds them
    from the same seed),
  - compile-time training graphs (khg compiler output — already pinned
    100% against the reference FasterDecoder by align_golden),
  - the flat-start global mean/var (khg gmm_init_mono's numbers, so both
    loops start from an identical acoustic model),
  - khg equal_align initial alignments (kaldifst.equal_align is random
    and unavailable; starting both loops from the same init is the point),
  - the loop schedule (realign iters, mixup targets, scales).

perturb_factor is 0.0 throughout: the reference's DiagGmm::Split draws
from a fresh std::random_device (csrc/eigen.cc:34-46) and cannot be
seeded, so split perturbation is the one step that must be deterministic
by construction.  Split bookkeeping (targets, weights halving, gconsts)
is still fully exercised.

Run via tools/refgold/build_and_run.sh.
"""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from khg_tpu.fstlib.fst import equal_align  # noqa: E402
from khg_tpu.graph.compiler import (  # noqa: E402
    TrainingGraphCompiler,
    TrainingGraphCompilerOptions,
)
from khg_tpu.lang.lfst import make_lexicon_fst_with_silence  # noqa: E402
from khg_tpu.lang.topo import generate_hmm_topo  # noqa: E402
from khg_tpu.recipes.steps import gmm_info, gmm_init_mono  # noqa: E402
from khg_tpu.recipes.yesno import make_synthetic_corpus  # noqa: E402

# Shared by tests/test_em_loop_golden.py — the single source of truth for
# the problem configurations.
#
# "toy": the original fast 8-pass config (kept: sub-second on both sides,
#        red immediately on any semantic change).
# "long": the reference's ACTUAL yesno training shape
#         (/root/reference/egs/yesno/train.py:52-55,152-153): 80 passes,
#         its full realign_iters schedule, 30 mix-up increments, 10
#         utterances, boost=1.0, realistic feature dim — long-horizon
#         interactions (mix-up increments compounding with min-occupancy
#         removal and min-count split gating, late realigns on a drifted
#         model) that the toy run cannot reach.  total_gauss=400 puts the
#         schedule deep into min-count-capped territory on this corpus
#         size, the same regime the reference's 1000-on-10-utts target
#         produces.
CONFIGS = {
    "toy": dict(
        corpus_seed=1234, num_utts=6, dim=6, train_seed=3, num_iters=8,
        realign_iters="1 2 4 6", total_gauss=27, max_iter_inc=4,
        boost=1.5, det_split_perturb=0.0,
    ),
    # det_split_perturb: the SHARED deterministic post-split perturbation
    # (recipes/yesno.apply_det_split_perturb == em_loop_runner.cc
    # ApplyDetSplitPerturb).  At perturb 0 the long run's split twins sit
    # on a symmetry ridge and both loops' trajectories fork on rounding
    # tie-breaks alone; the shared perturbation breaks the ridge
    # IDENTICALLY on both sides, making 80-pass parity well-posed — and
    # exercises the split-perturbation dynamics the toy config excludes.
    "long": dict(
        corpus_seed=1234, num_utts=10, dim=23, train_seed=3, num_iters=80,
        realign_iters=(
            "1 2 3 4 5 6 7 8 9 10 12 14 16 18 20 23 26 29 32 35 38 40 "
            "42 44 46 49 52 55 58 60 65 70 75 78 79"
        ),
        total_gauss=400, max_iter_inc=30, boost=1.0,
        det_split_perturb=0.05,
    ),
}

# toy-config aliases (back-compat for existing imports)
CORPUS_SEED = CONFIGS["toy"]["corpus_seed"]
NUM_UTTS = CONFIGS["toy"]["num_utts"]
DIM = CONFIGS["toy"]["dim"]
TRAIN_SEED = CONFIGS["toy"]["train_seed"]
NUM_ITERS = CONFIGS["toy"]["num_iters"]
REALIGN_ITERS = CONFIGS["toy"]["realign_iters"]
TOTAL_GAUSS = CONFIGS["toy"]["total_gauss"]
MAX_ITER_INC = CONFIGS["toy"]["max_iter_inc"]
BOOST = CONFIGS["toy"]["boost"]
ACOUSTIC_SCALE = 0.1
TRANSITION_SCALE = 1.0
SELF_LOOP_SCALE = 0.1
BEAM = 1.0e6  # exact search on both sides: pins loop semantics, not pruning
RETRY_BEAM = 0.0


def build_system(cfg=None):
    """The exact object set tests/test_em_loop_golden.py's train_yesno call
    constructs internally: same corpus seed, same rng consumption order as
    khg_tpu/recipes/yesno.py train_yesno's fresh-start path."""
    cfg = cfg or CONFIGS["toy"]
    lp, corpus = make_synthetic_corpus(
        num_utts=cfg["num_utts"], dim=cfg["dim"],
        rng=np.random.default_rng(cfg["corpus_seed"]),
    )
    rng = np.random.default_rng(cfg["train_seed"])
    topo = generate_hmm_topo(
        non_sil_phones=lp.get_non_sil_phone_ids(),
        sil_phone=lp.get_sil_phone_id(),
    )
    tm, tree, am = gmm_init_mono(topo, corpus.feats)
    lex_fst = make_lexicon_fst_with_silence(
        lexiconp=lp, sil_prob=0.5, sil_phone="SIL"
    )
    gc = TrainingGraphCompiler(
        trans_model=tm,
        ctx_dep=tree,
        lex_fst=lex_fst,
        disambig_syms=lp.disambig_phone_ids(),
        opts=TrainingGraphCompilerOptions(),
    )
    graphs = []
    for words in corpus.word_seqs:
        word_ids = [lp.word2id[w] for w in words]
        graphs.append(gc.compile_graph_from_text(word_ids))
    alignments = []
    for g, f in zip(graphs, corpus.feats):
        res = equal_align(g, f.shape[0], rng)
        assert res is not None
        alignments.append(res[0])
    return lp, corpus, topo, tm, tree, am, graphs, alignments


def f32(x) -> str:
    return repr(float(np.float32(x)))


def main(problem_path: str, topo_path: str, config: str = "toy") -> None:
    cfg = CONFIGS[config]
    lp, corpus, topo, tm, tree, am, graphs, alignments = build_system(cfg)
    Path(topo_path).write_text(topo.write())

    pdf0 = am.get_pdf(0)
    means = np.asarray(pdf0.get_means(), dtype=np.float64).ravel()
    variances = np.asarray(pdf0.get_vars(), dtype=np.float64).ravel()
    info = gmm_info(am, tm)

    lines = []
    lines.append(f"{cfg['dim']} {len(corpus.feats)} {lp.get_sil_phone_id()}")
    lines.append(
        f"{ACOUSTIC_SCALE} {TRANSITION_SCALE} {SELF_LOOP_SCALE} "
        f"{cfg['boost']} {BEAM} {RETRY_BEAM} {cfg['det_split_perturb']}"
    )
    lines.append(
        f"{cfg['num_iters']} {cfg['total_gauss']} {cfg['max_iter_inc']} "
        f"{info['number_of_gaussians']}"
    )
    ri = cfg["realign_iters"].split()
    lines.append(str(len(ri)) + " " + " ".join(ri))
    lines.append(" ".join(repr(float(v)) for v in means))
    lines.append(" ".join(repr(float(v)) for v in variances))

    for feats, g, ali in zip(corpus.feats, graphs, alignments):
        T = feats.shape[0]
        lines.append(str(T))
        for t in range(T):
            lines.append(" ".join(f32(v) for v in feats[t]))
        arcs = [
            (s, a.ilabel, a.olabel, np.float32(a.weight), a.nextstate)
            for s in range(g.num_states)
            for a in g.arcs[s]
        ]
        finals = [
            (s, np.float32(w))
            for s, w in enumerate(g.final)
            if w != float("inf")
        ]
        lines.append(f"{g.num_states} {g.start} {len(arcs)}")
        for s, il, ol, w, d in arcs:
            lines.append(f"{s} {il} {ol} {f32(w)} {d}")
        lines.append(str(len(finals)))
        for s, w in finals:
            lines.append(f"{s} {f32(w)}")
        assert len(ali) == T
        lines.append(" ".join(str(int(t)) for t in ali))

    Path(problem_path).write_text("\n".join(lines) + "\n")
    print(
        f"wrote {problem_path} ({config}): {len(corpus.feats)} utts, "
        f"D={cfg['dim']}, init num_gauss={info['number_of_gaussians']}"
    )


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else "toy")
