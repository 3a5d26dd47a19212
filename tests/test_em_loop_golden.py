"""Run-level EM-loop parity with the reference's own training loop.

tools/refgold/em_loop_runner.cc drives the REFERENCE's compiled
components through the full train.py loop (equal-align init ->
accumulate -> update -> boost-silence -> realign on realign_iters ->
mix-up; /root/reference/egs/yesno/train.py:116-222) on inputs exported
by tools/refgold/make_em_problem.py, and dumps the per-pass
average-log-likelihood trajectory, the mix-up schedule, the final
alignments, and the final model to tests/golden/em_loop_golden*.json.

This test runs khg_tpu's train_yesno on the SAME inputs (same corpus
seed, same rng threading) and asserts the trajectory matches: any drift
in realign-iteration scheduling, boost-silence ordering, mix-up timing,
min-occupancy gating, or accumulate/update semantics goes red here even
if every per-component golden still passes.

Two configurations run: "toy" (8 passes, 6 utts — fast smoke) and
"long" — the reference's ACTUAL yesno shape
(/root/reference/egs/yesno/train.py:52-55,152-153): 80 passes, the full
realign_iters schedule, 30 mix-up increments, 10 utterances, boost=1.0.
The long run spends most of its passes in min-count-capped mix-up with
min-occupancy removal active, the compounding regime the toy run never
reaches.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools" / "refgold"))

import make_em_problem as prob  # noqa: E402

from khg_tpu.recipes.yesno import make_synthetic_corpus, train_yesno  # noqa: E402

GOLDEN_FILES = {
    "toy": REPO / "tests" / "golden" / "em_loop_golden.json",
    "long": REPO / "tests" / "golden" / "em_loop_golden_long.json",
}
PROBLEM_FILES = {
    "toy": ("em_problem.txt", "em_topo.txt"),
    "long": ("em_problem_long.txt", "em_topo_long.txt"),
}
# Per-pass avg-loglike tolerance.
#
# toy: flat 2e-3 — observed drift < 1e-5 over 8 passes; any semantic
# difference (a misscheduled realign) moves passes by > 1e-2.
#
# long: a pass-indexed ENVELOPE, now MEASURED (round 5,
# tools/measure_golden_envelope.py -> docs/envelope_long.json).  With
# the shared deterministic split perturbation both loops take the same
# discrete branches (schedule, realignments, removals all match
# exactly) while the trajectory drifts smoothly to |d| = 0.105 at pass
# 80.  The a/b run REFUTED the old f32-vs-f64-storage attribution:
# rounding khg's model through f32 after every M-step (exactly the
# reference's FloatMatrix storage precision) moves khg's trajectory by
# at most 3.1e-3 and leaves the distance to the golden essentially
# unchanged (max 0.1049 f64 vs 0.1063 f32-rounded), with the discrete
# schedule still identical.  The dominant term is therefore not
# representation precision but f32 arithmetic-ORDER differences in
# scoring (device GEMM vs the reference's Eigen host loops) flipping a
# small fraction of Viterbi ties; the final-alignment test measures
# that fraction at <= 0.5% of frames, and per-frame loglikes of O(-20)
# times 0.5% re-aligned frames is exactly the observed O(0.1) scale,
# compounding once mix-up's min-count regime begins (~pass 15).  The
# envelope allows 2x the measured slope; a semantic difference still
# goes red (the round-4 perturb-twin bug produced jumps of 1.0+ by
# pass 10, far outside it).
def traj_atol(config: str, num_passes: int) -> np.ndarray:
    if config == "toy":
        return np.full(num_passes, 2e-3)
    return np.maximum(2e-3, 2.5e-3 * np.arange(num_passes))


@pytest.fixture(scope="module", params=["toy", "long"])
def config(request):
    return request.param


@pytest.fixture(scope="module")
def golden(config):
    with open(GOLDEN_FILES[config]) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def khg_run(config):
    cfg = prob.CONFIGS[config]
    lp, corpus = make_synthetic_corpus(
        num_utts=cfg["num_utts"],
        dim=cfg["dim"],
        rng=np.random.default_rng(cfg["corpus_seed"]),
    )
    result = train_yesno(
        lp,
        corpus,
        num_iters=cfg["num_iters"],
        realign_iters=cfg["realign_iters"],
        total_gauss=cfg["total_gauss"],
        max_iter_inc=cfg["max_iter_inc"],
        acoustic_scale=prob.ACOUSTIC_SCALE,
        self_loop_scale=prob.SELF_LOOP_SCALE,
        boost=cfg["boost"],
        seed=cfg["train_seed"],
        perturb_factor=0.0,
        det_split_perturb=cfg["det_split_perturb"],
    )
    return result


def test_f32_storage_twin_toy(config, golden, khg_run):
    """The f32_storage emulation knob (used by
    tools/measure_golden_envelope.py) must not change any discrete
    branch and must stay within the storage-precision scale of the f64
    run — pins the hook that produced docs/envelope_toy/long.json."""
    if config != "toy":
        pytest.skip("long config measured offline (docs/envelope_long.json)")
    cfg = prob.CONFIGS[config]
    lp, corpus = make_synthetic_corpus(
        num_utts=cfg["num_utts"],
        dim=cfg["dim"],
        rng=np.random.default_rng(cfg["corpus_seed"]),
    )
    r32 = train_yesno(
        lp, corpus,
        num_iters=cfg["num_iters"],
        realign_iters=cfg["realign_iters"],
        total_gauss=cfg["total_gauss"],
        max_iter_inc=cfg["max_iter_inc"],
        acoustic_scale=prob.ACOUSTIC_SCALE,
        self_loop_scale=prob.SELF_LOOP_SCALE,
        boost=cfg["boost"],
        seed=cfg["train_seed"],
        perturb_factor=0.0,
        det_split_perturb=cfg["det_split_perturb"],
        f32_storage=True,
    )
    assert r32.num_gauss_after_est == khg_run.num_gauss_after_est
    np.testing.assert_allclose(
        r32.avg_loglikes, khg_run.avg_loglikes, atol=1e-4
    )


def test_problem_export_is_current(config, tmp_path):
    """The checked-in problem file must match what make_em_problem.py
    exports today — a drift here means the golden was generated from
    different inputs than the test runs on."""
    out = tmp_path / "em_problem.txt"
    topo = tmp_path / "em_topo.txt"
    prob.main(str(out), str(topo), config)
    prob_name, topo_name = PROBLEM_FILES[config]
    assert out.read_text() == (REPO / "tests/golden" / prob_name).read_text()
    assert topo.read_text() == (REPO / "tests/golden" / topo_name).read_text()


def test_avg_loglike_trajectory(config, golden, khg_run):
    ref = np.asarray(golden["pass_avg_loglike"])
    got = np.asarray(khg_run.avg_loglikes)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    atol = traj_atol(config, len(ref))
    bad = np.abs(got - ref) > atol
    assert not bad.any(), (
        f"passes {np.nonzero(bad)[0].tolist()}: "
        f"|diff|={np.abs(got - ref)[bad]} > atol={atol[bad]}"
    )


def test_mixup_schedule_exact(golden, khg_run):
    """The DISCRETE schedule — per-pass total Gaussian count after each
    est step (mix-up increments, min-count split caps, min-occupancy
    removals) — must match the reference loop EXACTLY at every pass."""
    assert khg_run.num_gauss_after_est == golden["num_gauss_after_est"]
    assert khg_run.info["number_of_gaussians"] == golden["final_num_gauss"]
    per_pdf_ref = [len(p["weights"]) for p in golden["final_pdfs"]]
    per_pdf_got = [
        khg_run.am.get_pdf(p).num_gauss for p in range(khg_run.am.num_pdfs)
    ]
    assert per_pdf_got == per_pdf_ref


def test_final_alignment_agreement(config, golden, khg_run):
    agree = total = 0
    for ref_ali, got_ali in zip(golden["final_alignments"], khg_run.alignments):
        assert got_ali is not None
        assert len(got_ali) == len(ref_ali)
        agree += sum(int(a == b) for a, b in zip(ref_ali, got_ali))
        total += len(ref_ali)
    floor = 0.999 if config == "toy" else 0.995
    assert agree / total >= floor, f"{agree}/{total}"


def test_final_transition_log_probs(golden, khg_run):
    ref = np.asarray(golden["final_trans_log_probs"])
    got = np.asarray(
        [
            khg_run.transition_model.get_transition_log_prob(t)
            for t in range(1, khg_run.transition_model.num_transition_ids + 1)
        ]
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_final_model_parameters(config, golden, khg_run):
    if config == "toy":
        for p, ref_pdf in enumerate(golden["final_pdfs"]):
            g = khg_run.am.get_pdf(p)
            np.testing.assert_allclose(
                g.weights, ref_pdf["weights"], atol=2e-4, rtol=0
            )
            np.testing.assert_allclose(
                g.get_means(), ref_pdf["means"], atol=5e-3, rtol=0
            )
            np.testing.assert_allclose(
                g.get_vars(), ref_pdf["vars"], atol=5e-3, rtol=0
            )
        return
    # long config: the smooth f64-vs-f32 drift (see traj_atol comment)
    # accumulates in individual late-separating twin components, so
    # element-wise equality is not the right observable; the chaos-aware
    # ones (measured margins ~2x in docs/design.md):
    # - sorted per-pdf weights agree closely (occupancy distribution)
    # - the bulk of components sit at the same positions (median ~1e-3)
    dists, wdiff = [], 0.0
    for p, ref_pdf in enumerate(golden["final_pdfs"]):
        g = khg_run.am.get_pdf(p)
        m, rm = np.asarray(g.get_means()), np.asarray(ref_pdf["means"])
        dists += list(np.linalg.norm(m - rm, axis=-1))
        wdiff = max(wdiff, np.abs(
            np.sort(np.asarray(g.weights))
            - np.sort(np.asarray(ref_pdf["weights"]))
        ).max())
    dists = np.asarray(dists)
    assert wdiff < 0.08, wdiff
    assert np.median(dists) < 0.02, np.median(dists)
    assert (dists < 0.05).mean() >= 0.45, (dists < 0.05).mean()
