"""End-to-end GMM-EM training over CTC topology graphs.

Covers BASELINE config #4 ("AudioMNIST with CTC topology training
graphs instead of 3-state HMM"): synthetic per-token Gaussian features,
flat start, Viterbi EM over blank-insertion CTC lattices, mixture
split-up, and word decoding through an HL graph with the trained GMMs.
"""

import numpy as np
import pytest

from khg_tpu.decode.decoder import FasterDecoder, FasterDecoderOptions
from khg_tpu.gmm.likelihoods import loglikes
from khg_tpu.lang.ctc import build_hl_graph, ctc_id2pdf
from khg_tpu.recipes.ctc_train import (
    collapse_ctc_labels,
    ctc_flat_start,
    train_ctc_gmm,
)

VOCAB = 5  # 0=blank, tokens 1..4
DIM = 6


def _token_means():
    rng = np.random.default_rng(7)
    means = rng.normal(0.0, 4.0, size=(VOCAB, DIM)).astype(np.float32)
    means[0] = 0.0  # blank sits at the origin
    return means


def _make_corpus(num_utts=24, seed=3):
    """Utterances of 3-5 tokens, 4-7 frames/token, 1-3 blank frames
    between tokens, unit-variance Gaussian emissions per token."""
    rng = np.random.default_rng(seed)
    means = _token_means()
    feats, seqs = [], []
    for _ in range(num_utts):
        toks = rng.integers(1, VOCAB, size=rng.integers(3, 6)).tolist()
        rows = []
        labels = []
        for j, t in enumerate(toks):
            if j == 0 or rng.random() < 0.8:
                labels += [0] * int(rng.integers(1, 4))
            labels += [t] * int(rng.integers(4, 8))
        labels += [0] * int(rng.integers(1, 4))
        for lab in labels:
            rows.append(means[lab] + rng.normal(0.0, 1.0, DIM))
        feats.append(np.asarray(rows, dtype=np.float32))
        seqs.append(toks)
    return feats, seqs


def test_ctc_em_monotone_and_recovers_tokens():
    feats, seqs = _make_corpus()
    am, history, hyps = train_ctc_gmm(
        feats, seqs, VOCAB, num_passes=8, seed=0
    )
    assert len(history) == 8
    # Viterbi EM increases the Viterbi-path likelihood monotonically
    # (up to f32 accumulation noise)
    for a, b in zip(history, history[1:]):
        assert b >= a - 1e-3, history
    assert history[-1] > history[0] + 1.0
    # the final alignments collapse to the transcripts
    correct = sum(h == list(s) for h, s in zip(hyps, seqs))
    assert correct == len(seqs), (correct, len(seqs))


def test_ctc_em_mixup_grows_and_improves():
    feats, seqs = _make_corpus(num_utts=16, seed=11)
    am1, hist1, _ = train_ctc_gmm(feats, seqs, VOCAB, num_passes=6, seed=0)
    am2, hist2, _ = train_ctc_gmm(
        feats, seqs, VOCAB, num_passes=6, mixup=2 * VOCAB, seed=0
    )
    assert am1.num_gauss == VOCAB
    assert am2.num_gauss > VOCAB
    # extra mixtures cannot hurt the training objective
    assert hist2[-1] >= hist1[-1] - 1e-3


def test_ctc_trained_gmm_decodes_words_through_hl():
    """Train on synthetic token audio, decode held-out utterances to
    WORDS through HL with the trained GMM acoustic model."""
    from khg_tpu.lang.lexicon import Lexicon, Lexiconp
    from khg_tpu.lang.lfst import make_lexicon_fst_no_silence

    feats, seqs = _make_corpus(num_utts=24, seed=5)
    am, _, _ = train_ctc_gmm(feats, seqs, VOCAB, num_passes=8, seed=0)

    # lexicon over the trained tokens: words name token pairs/singletons
    lexicon = Lexicon(word2phones={
        "W12": ["p1 p2"], "W3": ["p3"], "W4": ["p4"], "W21": ["p2 p1"],
    })
    lp = Lexiconp.from_lexicon(lexicon).add_lex_disambig()
    # map lexicon phone ids onto CTC token ids: p1->1 .. p4->4
    assert [lp.phone2id[f"p{i}"] for i in range(1, 5)] == [1, 2, 3, 4]
    L = make_lexicon_fst_no_silence(lp)
    ndis = lp.max_disambig + 1 if hasattr(lp, "max_disambig") else 0
    hl = build_hl_graph(
        VOCAB - 1, L,
        disambig_start=lp.phone2id.get("#0", 0),
        disambig_end=max(lp.phone2id.values()),
    ) if ndis else build_hl_graph(VOCAB - 1, L)

    # held-out audio for known word sequences
    rng = np.random.default_rng(42)
    means = _token_means()
    cases = [(["W12", "W3"], [1, 2, 3]), (["W4", "W21"], [4, 2, 1])]
    id2pdf = ctc_id2pdf(VOCAB)
    packed = am.pack()
    dec = FasterDecoder(hl, FasterDecoderOptions(beam=24.0))
    for words_ref, toks in cases:
        rows = []
        for t in toks:
            rows += [means[0] + rng.normal(0, 1, DIM)] * 2
            rows += [means[t] + rng.normal(0, 1, DIM)] * 6
        rows += [means[0] + rng.normal(0, 1, DIM)] * 2
        f = np.asarray(rows, dtype=np.float32)[None]
        ll = np.asarray(loglikes(
            packed.gconsts, packed.means_invvars, packed.inv_vars, f
        ))[0]
        out = dec.decode(ll, id2pdf, acoustic_scale=1.0)
        assert out is not None
        _, words, _, _ = out
        assert [lp.id2word[w] for w in words] == words_ref


def test_ctc_recipe_staged_wer(tmp_path):
    """The staged CTC recipe (egs/ctc_synth/run.py): synth corpus ->
    CTC EM with mix-up -> HLG (topo ∘ det(L ∘ G)) decode of HELD-OUT
    audio -> WER.  Stages are resumable: rerunning from stage 2 reuses
    the saved model and reproduces the same WER."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]
                           / "egs" / "ctc_synth"))
    import run as ctc_run

    exp = tmp_path / "exp"
    wer = ctc_run.main([
        "--exp-dir", str(exp), "--num-train", "24", "--num-test", "6",
        "--num-passes", "8",
    ])
    assert wer == 0.0, wer
    assert (exp / "wer.txt").exists()
    # stage re-entry: decode-only from saved artifacts
    wer2 = ctc_run.main(["--exp-dir", str(exp), "--stage", "2"])
    assert wer2 == wer
