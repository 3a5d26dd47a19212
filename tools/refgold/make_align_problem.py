"""Generate the alignment-parity problem file for align_runner.cc.

Builds the same yesno-like monophone system the unit tests use, compiles
training graphs with align-time transition scales applied (matching
gmm_align_compiled: transition_scale=1.0, self_loop_scale=0.1), computes
GMM loglikes from a seeded random acoustic model, and writes everything
as text.  The reference FasterDecoder (exact search: huge beam) and the
khg_tpu device Viterbi then both consume THIS file, so any tid
disagreement is a real semantic divergence, not an input mismatch.

Run via tools/refgold/build_and_run.sh.
"""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from khg_tpu.graph.h_builder import add_transition_probs  # noqa: E402
from tests.test_align import random_am  # noqa: E402
from tests.test_graph_compiler import build_yesno_like  # noqa: E402

ACOUSTIC_SCALE = 0.5
BEAM = 1.0e6
MAX_ACTIVE = 10_000_000


def f32(x) -> str:
    return np.format_float_repr(np.float32(x)) if False else repr(float(np.float32(x)))


def main(out_path: str) -> None:
    lp, topo, tree, tm, gc = build_yesno_like()
    rng = np.random.default_rng(2024)
    am = random_am(tree.num_pdfs, 6, rng, max_mix=3)
    id2pdf = tm.id2pdf_array()
    P = am.num_pdfs

    yes, no = lp.word2id["YES"], lp.word2id["NO"]
    word_seqs = [
        [yes], [no], [yes, no], [no, no, yes],
        [yes, yes, no, yes], [no, yes, no, no, yes],
    ]
    lens = [11, 9, 22, 31, 44, 57]

    lines = []
    lines.append(f"{P} {len(word_seqs)} {ACOUSTIC_SCALE}")
    lines.append(str(len(id2pdf)))
    lines.append(" ".join(str(int(v)) for v in id2pdf))

    pm = am.pack()
    from khg_tpu.gmm.likelihoods import loglikes_np

    for words, T in zip(word_seqs, lens):
        g = gc.compile_graph_from_text(words).copy()
        add_transition_probs(tm, g, 1.0, 0.1)

        feats = rng.standard_normal((1, T, 6)).astype(np.float32)
        ll = np.asarray(loglikes_np(pm, feats))[0].astype(np.float32)  # (T, P)

        lines.append(str(T))
        for t in range(T):
            lines.append(" ".join(f32(v) for v in ll[t]))
        arcs = [
            (s, a.ilabel, a.olabel, np.float32(a.weight), a.nextstate)
            for s in range(g.num_states)
            for a in g.arcs[s]
        ]
        finals = [
            (s, np.float32(w)) for s, w in enumerate(g.final)
            if w != float("inf")
        ]
        lines.append(f"{g.num_states} {g.start} {len(arcs)}")
        for s, il, ol, w, d in arcs:
            lines.append(f"{s} {il} {ol} {f32(w)} {d}")
        lines.append(str(len(finals)))
        for s, w in finals:
            lines.append(f"{s} {f32(w)}")
        lines.append(f"{BEAM} {MAX_ACTIVE}")

    Path(out_path).write_text("\n".join(lines) + "\n")
    print(f"wrote {out_path}: {len(word_seqs)} utterances, P={P}")


if __name__ == "__main__":
    main(sys.argv[1])
