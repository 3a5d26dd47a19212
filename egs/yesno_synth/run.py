#!/usr/bin/env python3
"""Synthetic-yesno end-to-end example: lang prep -> train -> decode -> WER.

Staged like the reference's egs/yesno/run.sh; each stage writes artifacts
under --exp-dir and later stages reload them, so any stage can be re-run
independently:

  0  prepare the lang directory (phones/words tables, topo, L FSTs)
  1  generate the synthetic corpus (features + transcripts)
  2  flat-start monophone EM training (checkpointed per pass)
  3  build HCLG from the unigram ARPA LM, decode the corpus, score WER

Usage:  python egs/yesno_synth/run.py [--stage N] [--exp-dir exp]
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
    parser.add_argument("--exp-dir", type=Path, default=Path("exp/yesno_synth"))
    parser.add_argument("--num-utts", type=int, default=10)
    parser.add_argument("--num-iters", type=int, default=20)
    parser.add_argument("--total-gauss", type=int, default=100)
    from khg_tpu.utils.platform import ensure_backend

    ensure_backend()
    args = parser.parse_args()
    exp = args.exp_dir
    exp.mkdir(parents=True, exist_ok=True)

    from khg_tpu.lang.prepare import prepare_lang
    from khg_tpu.recipes.yesno import make_synthetic_corpus, train_yesno

    if args.stage <= 0:
        print("=== stage 0: prepare lang")
        prepare_lang(
            exp / "lang",
            word2phones={"<SIL>": ["SIL"], "YES": ["Y"], "NO": ["N"]},
        )

    if args.stage <= 1:
        print("=== stage 1: synthesize corpus")
        rng = np.random.default_rng(0)
        lp, corpus = make_synthetic_corpus(num_utts=args.num_utts, rng=rng)
        with open(exp / "corpus.pkl", "wb") as f:
            pickle.dump({"lexiconp": lp, "corpus": corpus}, f)

    with open(exp / "corpus.pkl", "rb") as f:
        blob = pickle.load(f)
    lp, corpus = blob["lexiconp"], blob["corpus"]

    if args.stage <= 2:
        print("=== stage 2: train")
        result = train_yesno(
            lp, corpus,
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
        export_kaldi_text(
            exp / "final.txt", result.transition_model, result.am
        )
        print("avg log-likes:", [round(x, 3) for x in result.avg_loglikes[::4]])

    if args.stage <= 3:
        print("=== stage 3: decode + WER")
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
        am, tm, tree = (
            state["acoustic_model"],
            state["transition_model"],
            state["tree"],
        )
        G = arpa_to_fst(ARPA, lp.word2id)
        hclg = build_hclg(lp, G, tm, tree)
        decoder = LatticeFasterDecoder(
            hclg, LatticeFasterDecoderConfig(beam=40.0, lattice_beam=6.0)
        )
        id2pdf = tm.id2pdf_array()
        packed = am.pack()
        lls = [loglikes_np(packed, feats) for feats in corpus.feats]
        decoded = decode_utterances_parallel(
            decoder, lls, id2pdf, acoustic_scale=2.0
        )
        results = []
        for i, (ok, tids, words, like) in enumerate(decoded):
            hyp = [lp.id2word[w] for w in words] if ok else []
            results.append((f"utt{i}", corpus.word_seqs[i], hyp))
        with open(exp / "wer.txt", "w") as f:
            wer = write_error_stats(f, "yesno_synth", results)
        print(f"results in {exp}/wer.txt")


if __name__ == "__main__":
    main()
