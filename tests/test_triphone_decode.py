"""End-to-end TRIPHONE decoding: tree -> HCLG -> lattice decode -> WER.

Closes the round-3 gap "triphone-scale decoding is never exercised":
an N=3, P=1 context-dependency tree flows through the full test-time
graph build (`decode/graph.build_hclg`: LG -> subsequential loop ->
compose_context -> Ha -> remove disambig -> self-loops, mirroring
/root/reference/egs/yesno/decode.py:100-141) and the lattice decoder.

The acoustic setup is adversarial for context handling: phones p1 and
p3 share IDENTICAL Gaussian means, and phone p2's pdfs depend on its
left context (p1 vs anything else) with well-separated means.  The
words A = "p1 p2" and B = "p3 p2" are therefore acoustically
distinguishable ONLY through p2's context-dependent pdfs — any bug in
test-time ilabel/context-window handling flips A and B.
"""

import numpy as np
import pytest

from khg_tpu.decode.graph import build_hclg
from khg_tpu.decode.lattice import (
    LatticeFasterDecoder,
    LatticeFasterDecoderConfig,
    decode_utterance_lattice_faster,
)
from khg_tpu.decode.arpa import arpa_to_fst

from khg_tpu.fstlib.fst import equal_align
from khg_tpu.gmm.am_gmm import AmDiagGmm
from khg_tpu.gmm.diag_gmm import DiagGmm
from khg_tpu.gmm.likelihoods import loglikes_np
from khg_tpu.graph.compiler import (
    TrainingGraphCompiler,
    TrainingGraphCompilerOptions,
)
from khg_tpu.lang.lexicon import Lexicon, Lexiconp
from khg_tpu.lang.lfst import make_lexicon_fst_no_silence
from khg_tpu.lang.topo import generate_hmm_topo
from khg_tpu.model.context_dep import ContextDependency
from khg_tpu.model.event_map import (
    K_PDF_CLASS,
    SplitEventMap,
    TableEventMap,
)
from khg_tpu.model.transition_model import TransitionModel

DIM = 8


def build_triphone_decode_system():
    words = {
        "A": ["p1 p2"],
        "B": ["p3 p2"],
        "C": ["p2 p1"],
        "<SIL>": ["SIL"],
    }
    lp = Lexiconp.from_lexicon(Lexicon(word2phones=words)).add_lex_disambig()
    sil, p1, p2, p3 = (lp.phone2id[p] for p in ("SIL", "p1", "p2", "p3"))
    topo = generate_hmm_topo(
        non_sil_phones=sorted([p1, p2, p3]), sil_phone=sil
    )
    npc = topo.get_phone_to_num_pdf_classes()

    next_pdf = [0]

    def leaves(phone):
        n = npc[phone]
        first = next_pdf[0]
        next_pdf[0] += n
        return TableEventMap.from_answers(
            K_PDF_CLASS, {c: first + c for c in range(n)}
        )

    # pdf layout (order of allocation): SIL, p1, p2|left=p1, p2|else, p3
    tree_map = TableEventMap(
        1,  # central phone (P=1)
        {
            sil: leaves(sil),
            p1: leaves(p1),
            p2: SplitEventMap(0, [p1], leaves(p2), leaves(p2)),
            p3: leaves(p3),
        },
    )
    tree = ContextDependency(N=3, P=1, to_pdf=tree_map)
    tm = TransitionModel(ctx_dep=tree, hmm_topo=topo)

    # acoustic model: distinct random means per pdf, EXCEPT p1 == p3
    rng = np.random.default_rng(0)
    means = rng.normal(0.0, 4.0, size=(tree.num_pdfs, DIM)).astype(np.float64)
    # find each phone's pdf block via the tree itself
    def pdfs_of(phone, left):
        out = []
        for c in range(npc[phone]):
            ans = tree.to_pdf.map(
                [(K_PDF_CLASS, c), (0, left), (1, phone), (2, sil)]
            )
            out.append(ans)
        return out

    p1_pdfs = pdfs_of(p1, sil)
    p3_pdfs = pdfs_of(p3, sil)
    p2_left_p1 = pdfs_of(p2, p1)
    p2_other = pdfs_of(p2, p3)
    assert set(p2_left_p1).isdisjoint(p2_other)
    means[p3_pdfs] = means[p1_pdfs]  # p1 and p3 acoustically identical

    proto = DiagGmm(nmix=1, dim=DIM)
    proto.set_weights(np.ones(1))
    proto.set_invvars_and_means(np.ones((1, DIM)), np.zeros((1, DIM)))
    proto.compute_gconsts()
    am = AmDiagGmm()
    am.init(proto, tree.num_pdfs)
    for p in range(tree.num_pdfs):
        g = am.get_pdf(p)
        g.set_invvars_and_means(np.ones((1, DIM)), means[p : p + 1])
        g.compute_gconsts()
    return lp, topo, tree, tm, am, means


def synth_utterances(lp, tree, tm, means, word_seqs, frames_per_word=14):
    """Sample a uniform-duration path through each word sequence's
    TRAINING graph and emit pdf-mean + noise features along it."""
    L = make_lexicon_fst_no_silence(lp)
    disambig_ids = [lp.phone2id[f"#{i}"] for i in range(lp.max_disambig + 1)]
    gc = TrainingGraphCompiler(
        tm, tree, L, disambig_syms=disambig_ids,
        opts=TrainingGraphCompilerOptions(),
    )
    rng = np.random.default_rng(42)
    id2pdf = tm.id2pdf_array()
    feats = []
    for seq in word_seqs:
        g = gc.compile_graph_from_text([lp.word2id[w] for w in seq])
        T = frames_per_word * len(seq)
        tids, ols, _ = equal_align(g, T, rng)
        assert ols == [lp.word2id[w] for w in seq]
        pdfs = id2pdf[np.asarray(tids)]
        f = means[pdfs] + 0.3 * rng.standard_normal((T, DIM))
        feats.append(f.astype(np.float32))
    return feats


def unigram_graph(lp):
    lm_words = [w for w in lp.word2id if w not in ("<eps>", "<SIL>")]
    arpa = "\\data\\\nngram 1=%d\n\n\\1-grams:\n" % (len(lm_words) + 2)
    for w in lm_words:
        arpa += f"-1\t{w}\n"
    arpa += "-99 <s>\n-1 </s>\n\n\\end\\\n"
    return arpa_to_fst(arpa, lp.word2id)


@pytest.fixture(scope="module")
def triphone_system():
    return build_triphone_decode_system()


def test_triphone_hclg_decodes_context_dependent_words(triphone_system):
    lp, topo, tree, tm, am, means = triphone_system
    assert (tree.context_width, tree.central_position) == (3, 1)
    hclg = build_hclg(lp, unigram_graph(lp), tm, tree)
    assert hclg.start != -1 and hclg.num_states > 0

    word_seqs = [["A"], ["B"], ["A", "B"], ["B", "A"], ["C", "B"],
                 ["A", "C"], ["B", "B"], ["A", "B", "A"]]
    feats = synth_utterances(lp, tree, tm, means, word_seqs)

    dec = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(beam=32.0, lattice_beam=8.0)
    )
    id2pdf = tm.id2pdf_array()
    packed = am.pack()
    for seq, f in zip(word_seqs, feats):
        ll = loglikes_np(packed, f)
        ok, _, wids, _ = decode_utterance_lattice_faster(
            dec, ll, id2pdf, acoustic_scale=1.0
        )
        assert ok
        hyp = [lp.id2word[w] for w in wids if lp.id2word[w] != "<SIL>"]
        # A vs B is decidable ONLY via p2's left-context pdfs
        assert hyp == seq, (seq, hyp)


def test_triphone_hclg_confusable_without_context(triphone_system):
    """Sanity check the adversarial construction: scoring word A's audio
    against word B's forced path differs ONLY on p2's frames."""
    lp, topo, tree, tm, am, means = triphone_system
    p1, p3 = lp.phone2id["p1"], lp.phone2id["p3"]
    npc = topo.get_phone_to_num_pdf_classes()

    sil = lp.phone2id["SIL"]

    def pdfs_of(phone, left):
        return [
            tree.to_pdf.map(
                [(K_PDF_CLASS, c), (0, left), (1, phone), (2, sil)]
            )
            for c in range(npc[phone])
        ]

    # identical means for p1/p3, distinct for p2's two context variants
    assert np.array_equal(
        means[pdfs_of(p1, lp.phone2id["SIL"])],
        means[pdfs_of(p3, lp.phone2id["SIL"])],
    )
    d = np.linalg.norm(
        means[pdfs_of(lp.phone2id["p2"], p1)]
        - means[pdfs_of(lp.phone2id["p2"], p3)]
    )
    assert d > 1.0
