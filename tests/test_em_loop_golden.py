"""Run-level EM-loop parity with the reference's own training loop.

tools/refgold/em_loop_runner.cc drives the REFERENCE's compiled
components through the full train.py loop (equal-align init ->
accumulate -> update -> boost-silence -> realign on realign_iters ->
mix-up; /root/reference/egs/yesno/train.py:116-222) on inputs exported
by tools/refgold/make_em_problem.py, and dumps the per-pass
average-log-likelihood trajectory, the mix-up schedule, the final
alignments, and the final model to tests/golden/em_loop_golden.json.

This test runs khg_tpu's train_yesno on the SAME inputs (same corpus
seed, same rng threading) and asserts the trajectory matches: any drift
in realign-iteration scheduling, boost-silence ordering, mix-up timing,
min-occupancy gating, or accumulate/update semantics goes red here even
if every per-component golden still passes.
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

GOLDEN = REPO / "tests" / "golden" / "em_loop_golden.json"


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def khg_run():
    lp, corpus = make_synthetic_corpus(
        num_utts=prob.NUM_UTTS,
        dim=prob.DIM,
        rng=np.random.default_rng(prob.CORPUS_SEED),
    )
    result = train_yesno(
        lp,
        corpus,
        num_iters=prob.NUM_ITERS,
        realign_iters=prob.REALIGN_ITERS,
        total_gauss=prob.TOTAL_GAUSS,
        max_iter_inc=prob.MAX_ITER_INC,
        acoustic_scale=prob.ACOUSTIC_SCALE,
        self_loop_scale=prob.SELF_LOOP_SCALE,
        boost=prob.BOOST,
        seed=prob.TRAIN_SEED,
        perturb_factor=0.0,
    )
    return result


def test_problem_export_is_current(tmp_path):
    """The checked-in problem file must match what make_em_problem.py
    exports today — a drift here means the golden was generated from
    different inputs than the test runs on."""
    out = tmp_path / "em_problem.txt"
    topo = tmp_path / "em_topo.txt"
    prob.main(str(out), str(topo))
    assert out.read_text() == (REPO / "tests/golden/em_problem.txt").read_text()
    assert topo.read_text() == (REPO / "tests/golden/em_topo.txt").read_text()


def test_avg_loglike_trajectory(golden, khg_run):
    ref = np.asarray(golden["pass_avg_loglike"])
    got = np.asarray(khg_run.avg_loglikes)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=0)


def test_mixup_schedule_final_num_gauss(golden, khg_run):
    assert khg_run.info["number_of_gaussians"] == golden["final_num_gauss"]
    per_pdf_ref = [len(p["weights"]) for p in golden["final_pdfs"]]
    per_pdf_got = [
        khg_run.am.get_pdf(p).num_gauss for p in range(khg_run.am.num_pdfs)
    ]
    assert per_pdf_got == per_pdf_ref


def test_final_alignment_agreement(golden, khg_run):
    agree = total = 0
    for ref_ali, got_ali in zip(golden["final_alignments"], khg_run.alignments):
        assert got_ali is not None
        assert len(got_ali) == len(ref_ali)
        agree += sum(int(a == b) for a, b in zip(ref_ali, got_ali))
        total += len(ref_ali)
    assert agree / total >= 0.999, f"{agree}/{total}"


def test_final_transition_log_probs(golden, khg_run):
    ref = np.asarray(golden["final_trans_log_probs"])
    got = np.asarray(
        [
            khg_run.transition_model.get_transition_log_prob(t)
            for t in range(1, khg_run.transition_model.num_transition_ids + 1)
        ]
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_final_model_parameters(golden, khg_run):
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
