"""Generate the lattice-decoder-parity problem file for lattice_runner.cc.

Builds a yesno-like monophone system, a full HCLG decoding graph (ARPA
unigram LM -> G, L, H with self-loops — the decode.py pipeline), and
seeded random loglike matrices; the reference LatticeFasterDecoderTpl
and khg_tpu's decode.lattice.LatticeFasterDecoder both consume THIS
file, so best-path disagreement is a real semantic divergence.

Run via tools/refgold/build_and_run.sh.
"""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from tests.test_align import random_am  # noqa: E402
from tests.test_graph_compiler import build_yesno_like  # noqa: E402

ACOUSTIC_SCALE = 2.0
BEAM = 1.0e6
MAX_ACTIVE = 10_000_000
LATTICE_BEAM = 6.0
PRUNE_INTERVAL = 5  # small, so PruneActiveTokens actually runs

ARPA = """\\data\\
ngram 1=4

\\1-grams:
-1\tNO
-1\tYES
-99 <s>
-1 </s>

\\end\\
"""


def f32(x) -> str:
    return repr(float(np.float32(x)))


def main(out_path: str) -> None:
    from khg_tpu.decode.arpa import arpa_to_fst
    from khg_tpu.decode.graph import build_hclg
    from khg_tpu.gmm.likelihoods import loglikes_np

    lp, topo, tree, tm, gc = build_yesno_like()
    rng = np.random.default_rng(4097)
    am = random_am(tree.num_pdfs, 6, rng, max_mix=3)
    id2pdf = tm.id2pdf_array()
    P = am.num_pdfs

    G = arpa_to_fst(ARPA, lp.word2id)
    hclg = build_hclg(lp, G, tm, tree)

    lens = [13, 21, 34, 48]
    lines = []
    lines.append(f"{P} {len(lens)} {ACOUSTIC_SCALE}")
    lines.append(str(len(id2pdf)))
    lines.append(" ".join(str(int(v)) for v in id2pdf))

    pm = am.pack()
    arcs = [
        (s, a.ilabel, a.olabel, np.float32(a.weight), a.nextstate)
        for s in range(hclg.num_states)
        for a in hclg.arcs[s]
    ]
    finals = [
        (s, np.float32(w)) for s, w in enumerate(hclg.final)
        if w != float("inf")
    ]
    for T in lens:
        feats = rng.standard_normal((1, T, 6)).astype(np.float32)
        ll = np.asarray(loglikes_np(pm, feats))[0].astype(np.float32)
        lines.append(str(T))
        for t in range(T):
            lines.append(" ".join(f32(v) for v in ll[t]))
        lines.append(f"{hclg.num_states} {hclg.start} {len(arcs)}")
        for s, il, ol, w, d in arcs:
            lines.append(f"{s} {il} {ol} {f32(w)} {d}")
        lines.append(str(len(finals)))
        for s, w in finals:
            lines.append(f"{s} {f32(w)}")
        lines.append(f"{BEAM} {MAX_ACTIVE} {LATTICE_BEAM} {PRUNE_INTERVAL}")

    Path(out_path).write_text("\n".join(lines) + "\n")
    print(
        f"wrote {out_path}: {len(lens)} utterances over an HCLG with "
        f"{hclg.num_states} states / {len(arcs)} arcs"
    )


if __name__ == "__main__":
    main(sys.argv[1])
