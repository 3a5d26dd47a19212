"""Waveform AudioMNIST recipe: spoken-digit WAVs -> fbank -> train ->
decode.  The 10-word / 15-phone real-audio analogue of the reference's
AudioMNIST recipe (scripts/compute_fbank_audio_mnist.py,
generate_lexicon.py) on the synthesized-speech corpus."""

import math

import numpy as np
import pytest

from khg_tpu.recipes.audiomnist import (
    DIGITS,
    digits_lexicon,
    load_audiomnist_corpus,
    train_audiomnist_wav,
    write_audiomnist_corpus,
)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    d = tmp_path_factory.mktemp("am_waves")
    write_audiomnist_corpus(d, num_utts=12, min_words=2, max_words=3, seed=5)
    result = train_audiomnist_wav(d, num_iters=8, total_gauss=240)
    return d, result


def test_corpus_and_learning(trained):
    d, result = trained
    corpus = load_audiomnist_corpus(d)
    assert len(corpus.utt_ids) == 12
    for uid, ws in zip(corpus.utt_ids, corpus.word_seqs):
        assert ws == [DIGITS[int(b)] for b in uid.split("_")]
    # flat-start EM learns the synthesized-digit acoustics
    assert result.avg_loglikes[-1] > result.avg_loglikes[0] + 5.0


def test_decode_digits(trained):
    d, result = trained
    from khg_tpu.decode.arpa import arpa_to_fst
    from khg_tpu.decode.graph import build_hclg
    from khg_tpu.decode.lattice import (
        LatticeFasterDecoder,
        LatticeFasterDecoderConfig,
        decode_utterance_lattice_faster,
    )
    from khg_tpu.decode.wer import levenshtein_align
    from khg_tpu.features.fbank import FbankConfig
    from khg_tpu.gmm.likelihoods import loglikes_np
    from khg_tpu.recipes.synth import SAMPLE_RATE
    from khg_tpu.recipes.yesno_wav import extract_features

    lp = result.lexiconp
    arpa_lines = [f"-1\t{w}" for w in DIGITS]
    arpa = (
        "\\data\\\nngram 1=%d\n\n\\1-grams:\n" % (len(DIGITS) + 2)
        + "\n".join(arpa_lines)
        + "\n-99 <s>\n-1 </s>\n\n\\end\\\n"
    )
    G = arpa_to_fst(arpa, lp.word2id)
    hclg = build_hclg(lp, G, result.transition_model, result.tree)
    decoder = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(beam=40.0, lattice_beam=6.0)
    )
    id2pdf = result.transition_model.id2pdf_array()
    packed = result.am.pack()

    corpus = load_audiomnist_corpus(d)
    cfg = FbankConfig(sample_rate=SAMPLE_RATE, num_mel_bins=23)
    corpus = extract_features(corpus, cfg, use_pallas=False)
    errs = tot = 0
    for i, feats in enumerate(corpus.feats):
        ll = loglikes_np(packed, feats)
        ok, _, words, _ = decode_utterance_lattice_faster(
            decoder, ll, id2pdf, acoustic_scale=2.0
        )
        hyp = [lp.id2word[w] for w in words] if ok else []
        ref = corpus.word_seqs[i]
        tot += len(ref)
        errs += sum(1 for r, h in levenshtein_align(ref, hyp) if r != h)
    wer = errs / tot
    assert wer <= 0.35, f"digit WER {wer:.2%} on the training corpus"
