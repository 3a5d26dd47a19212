import numpy as np
import pytest

from khg_tpu.recipes.yesno import make_synthetic_corpus, train_yesno
from khg_tpu.utils.checkpoint import (
    export_kaldi_text,
    latest_checkpoint,
    load_checkpoint,
)


def test_checkpoint_resume_bit_exact(tmp_path):
    rng = np.random.default_rng(0)
    lp, corpus = make_synthetic_corpus(num_utts=5, dim=6, rng=rng)
    common = dict(
        num_iters=6, total_gauss=20, max_iter_inc=3, realign_iters="1 2 3 4 5"
    )

    # full run, checkpointing each pass
    full_dir = tmp_path / "full"
    full = train_yesno(lp, corpus, checkpoint_dir=str(full_dir), **common)

    # interrupted run: reuse the full run's pass-2 checkpoint as the resume
    # point, then continue in a fresh directory
    resume_dir = tmp_path / "resume"
    resume_dir.mkdir()
    import shutil

    for i in range(3):  # passes 0..2
        shutil.copy(full_dir / f"iter_{i}.ckpt", resume_dir / f"iter_{i}.ckpt")
    resumed = train_yesno(lp, corpus, checkpoint_dir=str(resume_dir), **common)

    # resume must reproduce the full run exactly (explicit RNG threading)
    assert np.allclose(resumed.avg_loglikes[-1], full.avg_loglikes[-1])
    assert resumed.info == full.info
    for a, b in zip(resumed.alignments, full.alignments):
        assert a == b


def test_kaldi_text_export(tmp_path):
    rng = np.random.default_rng(1)
    lp, corpus = make_synthetic_corpus(num_utts=4, dim=5, rng=rng)
    result = train_yesno(
        lp, corpus, num_iters=2, total_gauss=15, max_iter_inc=1,
        realign_iters="1",
    )
    path = tmp_path / "final.txt"
    export_kaldi_text(path, result.transition_model, result.am)
    text = path.read_text()
    assert "<TransitionModel>" in text and "<DiagGMM>" in text
    # round-trip the transition model part
    from khg_tpu.model.kaldi_io import read_transition_model

    tm_text = text[: text.index("<DIMENSION>")]
    tm2 = read_transition_model(tm_text)
    assert tm2.tuples == result.transition_model.tuples
