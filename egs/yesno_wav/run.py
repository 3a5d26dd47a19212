#!/usr/bin/env python3
"""Waveform yesno: WAV files -> fbank -> train -> decode -> WER.

The full-stack analogue of the reference's egs/yesno (run.sh ->
train.py -> decode.py), driven from real audio files on disk rather
than pre-extracted features.  Stages (each writes artifacts under
--exp-dir; later stages reload them, so any stage re-runs independently):

  0  data: put WAV files in <exp>/waves.  With no network this
     synthesizes formant-speech yes/no recordings in the real corpus's
     layout (60 files x 8 words, filename = word sequence); a real
     waves_yesno download drops into the same directory unchanged.
  1  prepare the lang directory (phones/words tables, topo, L FSTs)
  2  fbank feature extraction (Pallas kernel on TPU, XLA elsewhere)
  3  flat-start monophone EM training on the train split
  4  build HCLG from the unigram ARPA LM, decode the TEST split, WER

Usage:  python egs/yesno_wav/run.py [--stage N] [--exp-dir exp]
"""

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import numpy as np

ARPA = """\\data\\
ngram 1=4

\\1-grams:
-1\tNO
-1\tYES
-99 <s>
-1 </s>

\\end\\
"""


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--stage", type=int, default=0)
    parser.add_argument("--exp-dir", type=Path, default=Path("exp/yesno_wav"))
    parser.add_argument(
        "--waves-dir", type=Path, default=None,
        help="existing waves directory (e.g. a real waves_yesno download "
        "from `lhotse download yesno`); validated against the drop-in "
        "contract (recipes/yesno_wav.YESNO_WAVES_CONTRACT) instead of "
        "synthesizing stand-in audio. With the real 60-file corpus the "
        "canonical 30/30 sorted split is used unless --num-train is set",
    )
    parser.add_argument("--num-utts", type=int, default=60)
    parser.add_argument("--words-per-utt", type=int, default=8)
    parser.add_argument(
        "--num-train", type=int, default=None,
        help="train-split size over the sorted file list; default: first "
        "half (the canonical waves_yesno 30/30 split)",
    )
    parser.add_argument("--num-iters", type=int, default=30)
    parser.add_argument("--total-gauss", type=int, default=300)
    parser.add_argument("--num-mel-bins", type=int, default=23)
    parser.add_argument(
        "--speed-perturb", action="store_true",
        help="triple the TRAINING set with 0.9/1.1 speed-perturbed "
        "copies before fbank, as the reference's training recipe does "
        "(compute_fbank_yesno.py:68); the test half stays unperturbed",
    )
    from khg_tpu.utils.platform import ensure_backend

    ensure_backend()
    args = parser.parse_args()
    exp = args.exp_dir
    exp.mkdir(parents=True, exist_ok=True)

    from khg_tpu.features.fbank import FbankConfig
    from khg_tpu.lang.prepare import prepare_lang
    from khg_tpu.recipes.yesno_wav import (
        SAMPLE_RATE,
        extract_features,
        load_yesno_corpus,
        make_yesno_lexiconp,
        write_yesno_corpus,
    )
    from khg_tpu.recipes.yesno import SyntheticCorpus, train_yesno

    from khg_tpu.recipes.yesno_wav import validate_yesno_waves

    wav_dir = args.waves_dir if args.waves_dir is not None else exp / "waves"
    if args.stage <= 0:
        if args.waves_dir is not None:
            report = validate_yesno_waves(wav_dir, strict=True)
            kind = ("real waves_yesno corpus"
                    if report["is_real_corpus_shape"] else "stand-in corpus")
            print(f"=== stage 0: {kind} in {wav_dir} "
                  f"({report['num_files']} files, contract OK)")
        elif any(wav_dir.glob("*.wav")):
            print(f"=== stage 0: using existing WAVs in {wav_dir}")
        else:
            print(f"=== stage 0: synthesizing {args.num_utts} recordings")
            write_yesno_corpus(
                wav_dir, num_utts=args.num_utts,
                words_per_utt=args.words_per_utt,
            )

    if args.stage <= 1:
        print("=== stage 1: prepare lang")
        prepare_lang(
            exp / "lang",
            word2phones={"<SIL>": ["SIL"], "YES": ["Y"], "NO": ["N"]},
        )

    if args.stage <= 2:
        print("=== stage 2: fbank extraction")
        corpus = load_yesno_corpus(wav_dir)
        cfg = FbankConfig(
            sample_rate=SAMPLE_RATE, num_mel_bins=args.num_mel_bins
        )
        corpus = extract_features(corpus, cfg)
        with open(exp / "feats.pkl", "wb") as f:
            pickle.dump({"corpus": corpus, "cfg": cfg}, f)
        tot = sum(len(x) for x in corpus.feats)
        print(f"{len(corpus.feats)} utts, {tot} frames")

    with open(exp / "feats.pkl", "rb") as f:
        _saved = pickle.load(f)
    corpus, feat_cfg = _saved["corpus"], _saved["cfg"]
    lp = make_yesno_lexiconp()
    # deterministic split over the sorted file list; default = first half,
    # the canonical waves_yesno 30/30 train/test convention
    num_train = (
        args.num_train if args.num_train is not None
        else (len(corpus.utt_ids) + 1) // 2
    )
    train_ids = list(range(min(num_train, len(corpus.utt_ids))))
    test_ids = [i for i in range(len(corpus.utt_ids)) if i not in train_ids]
    if not test_ids:  # tiny runs: score on train
        test_ids = train_ids

    if args.stage <= 3:
        if args.speed_perturb:
            # split FIRST, then perturb only the train half: perturbed
            # copies of test utterances must not leak into training
            from khg_tpu.recipes.yesno_wav import WavCorpus

            base = load_yesno_corpus(wav_dir)
            # a resumed --stage 3 must see the SAME corpus and feature
            # config stage 2 pickled: a changed waves dir or CLI
            # --num-mel-bins would otherwise silently desynchronize
            # train (recomputed here) from test (loaded from feats.pkl)
            assert base.utt_ids == corpus.utt_ids, (
                "waves dir changed since stage 2 — re-run from --stage 2"
            )
            sub = WavCorpus(
                utt_ids=[base.utt_ids[i] for i in train_ids],
                wav_paths=[base.wav_paths[i] for i in train_ids],
                word_seqs=[base.word_seqs[i] for i in train_ids],
                feats=[],
            )
            sub = extract_features(
                sub, feat_cfg, speed_perturb_factors=(0.9, 1.0, 1.1)
            )
            train_corpus = SyntheticCorpus(
                word_seqs=sub.word_seqs, feats=sub.feats,
                phone_alignments=[],
            )
        else:
            train_corpus = SyntheticCorpus(
                word_seqs=[corpus.word_seqs[i] for i in train_ids],
                feats=[corpus.feats[i] for i in train_ids],
                phone_alignments=[],
            )
        print(f"=== stage 3: train on {len(train_corpus.feats)} utts")
        result = train_yesno(
            lp, train_corpus,
            num_iters=args.num_iters,
            total_gauss=args.total_gauss,
            checkpoint_dir=str(exp / "checkpoints"),
        )
        from khg_tpu.utils.checkpoint import export_kaldi_text, save_checkpoint

        save_checkpoint(
            exp / "final.ckpt",
            {
                "acoustic_model": result.am,
                "transition_model": result.transition_model,
                "tree": result.tree,
            },
        )
        export_kaldi_text(exp / "final.txt", result.transition_model, result.am)
        print("avg log-likes:", [round(x, 3) for x in result.avg_loglikes[::4]])

    if args.stage <= 4:
        print(f"=== stage 4: decode {len(test_ids)} test utts + WER")
        from khg_tpu.decode.arpa import arpa_to_fst
        from khg_tpu.decode.graph import build_hclg
        from khg_tpu.decode.lattice import (
            LatticeFasterDecoder,
            LatticeFasterDecoderConfig,
            decode_utterances_parallel,
        )
        from khg_tpu.decode.wer import write_error_stats
        from khg_tpu.gmm.likelihoods import loglikes_np
        from khg_tpu.utils.checkpoint import load_checkpoint

        state = load_checkpoint(exp / "final.ckpt")
        am, tm = state["acoustic_model"], state["transition_model"]
        G = arpa_to_fst(ARPA, lp.word2id)
        hclg = build_hclg(lp, G, tm, state["tree"])
        decoder = LatticeFasterDecoder(
            hclg, LatticeFasterDecoderConfig(beam=40.0, lattice_beam=6.0)
        )
        id2pdf = tm.id2pdf_array()
        packed = am.pack()
        lls = [loglikes_np(packed, corpus.feats[i]) for i in test_ids]
        decoded = decode_utterances_parallel(
            decoder, lls, id2pdf, acoustic_scale=2.0
        )
        results = []
        for i, (ok, tids, words, like) in zip(test_ids, decoded):
            hyp = [lp.id2word[w] for w in words] if ok else []
            results.append((corpus.utt_ids[i], corpus.word_seqs[i], hyp))
        with open(exp / "wer.txt", "w") as f:
            write_error_stats(f, "yesno_wav_test", results)
        print(open(exp / "wer.txt").readline().strip())
        print(f"full report: {exp}/wer.txt")


if __name__ == "__main__":
    main()
