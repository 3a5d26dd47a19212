"""Corpus-scale trainer (recipes/corpus_train.py) at smoke scale.

The full-scale run (>=10k utts on the chip) is driven by
egs/audiomnist_10k/run.py and bench.py; this pins the loop mechanics on
CPU: growth ramp, the growth->resident phase switch, likelihood
improvement, and bit-exact checkpoint resume.
"""

import numpy as np
import pytest

from khg_tpu.recipes.audiomnist import make_synthetic_digits_corpus
from khg_tpu.recipes.corpus_train import CorpusTrainResult, train_corpus


@pytest.fixture(scope="module")
def small_corpus():
    rng = np.random.default_rng(5)
    lp, corpus = make_synthetic_digits_corpus(
        num_utts=24, dim=10, rng=rng, min_words=2, max_words=4
    )
    return lp, corpus


def _run(lp, corpus, **kw):
    args = dict(
        num_iters=8, total_gauss=120, max_iter_inc=4, stretch=2,
        batch_size=8, seed=3,
    )
    args.update(kw)
    return train_corpus(
        lp, corpus.word_seqs, corpus.feats, **args
    )


def test_corpus_train_improves_and_grows(small_corpus):
    lp, corpus = small_corpus
    res = _run(lp, corpus)
    assert isinstance(res, CorpusTrainResult)
    # one avg-ll entry per pass: pass0 + iters 1..7
    assert len(res.avg_loglikes) == 8
    assert res.avg_loglikes[-1] > res.avg_loglikes[0] + 1.0
    # growth reached the target (power rule may cap below, but must
    # exceed the flat-start count substantially)
    assert res.info["number_of_gaussians"] >= 60
    # ramp grows overall (min-occupancy removal may dip it by a few)
    assert res.num_gauss_after_est[-1] >= res.num_gauss_after_est[0] + 40
    # phase switch happened: growth phase populated, resident phase ran
    assert res.timings["growth_s"] > 0 and res.timings["resident_s"] > 0
    # likelihoods keep improving through the resident stretches
    assert res.avg_loglikes[-1] > res.avg_loglikes[4] - 1e-3


def test_corpus_train_resident_matches_host_tail(small_corpus):
    """Running the steady phase through the resident loop must give the
    same final likelihood trajectory as an all-growth-phase run with
    the same schedule (stretch=1 resident == per-iter host est is
    pinned elsewhere; here: stretch length must not change results)."""
    lp, corpus = small_corpus
    r2 = _run(lp, corpus, stretch=2)
    r3 = _run(lp, corpus, stretch=3)
    np.testing.assert_allclose(
        r2.avg_loglikes, r3.avg_loglikes, rtol=0, atol=2e-4
    )
    assert r2.info["number_of_gaussians"] == r3.info["number_of_gaussians"]


def test_corpus_train_checkpoint_resume(tmp_path, small_corpus):
    """Kill after iter 3, resume, and the trajectory + final model must
    be bit-comparable to an uninterrupted run."""
    lp, corpus = small_corpus
    full = _run(lp, corpus, checkpoint_dir=str(tmp_path / "a"))

    ck = tmp_path / "b"
    # truncated run: only through iter 3 (growth phase)
    _run(lp, corpus, num_iters=4, checkpoint_dir=str(ck))
    resumed = _run(lp, corpus, checkpoint_dir=str(ck))
    np.testing.assert_allclose(
        resumed.avg_loglikes, full.avg_loglikes, rtol=0, atol=1e-6
    )
    assert resumed.num_gauss_after_est == full.num_gauss_after_est
    for p in range(full.am.num_pdfs):
        np.testing.assert_array_equal(
            resumed.am.get_pdf(p).weights, full.am.get_pdf(p).weights
        )
        np.testing.assert_array_equal(
            resumed.am.get_pdf(p).means_invvars,
            full.am.get_pdf(p).means_invvars,
        )
    np.testing.assert_array_equal(
        resumed.transition_model.log_probs,
        full.transition_model.log_probs,
    )
