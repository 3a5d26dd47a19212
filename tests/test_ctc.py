import numpy as np
import pytest

from khg_tpu.align.packed import pack_graph, pack_graph_batch
from khg_tpu.align.viterbi import viterbi_align_batch
from khg_tpu.decode.decoder import FasterDecoder, FasterDecoderOptions
from khg_tpu.fstlib.fst import compose, make_linear_acceptor, shortest_path
from khg_tpu.lang.ctc import (
    add_disambig_self_loops,
    add_one,
    build_ctc_training_graph,
    build_standard_ctc_topo,
    ctc_id2pdf,
)


def test_ctc_topo_shape():
    topo = build_standard_ctc_topo(3)  # tokens 0..3, 0=blank
    assert topo.num_states == 4
    assert topo.num_arcs == 16
    # every state final
    for s in range(4):
        assert topo.is_final(s)
    add_one(topo, treat_ilabel_zero_specially=False)
    labs = {a.ilabel for arcs in topo.arcs for a in arcs}
    assert labs == {1, 2, 3, 4}
    # self-loops have eps output
    for s in range(topo.num_states):
        for a in topo.arcs[s]:
            if a.nextstate == s:
                assert a.olabel == 0


def test_add_disambig_self_loops():
    topo = build_standard_ctc_topo(2)
    add_disambig_self_loops(topo, start=10, end=12)
    for s in range(topo.num_states):
        outs = [a.olabel for a in topo.arcs[s] if a.ilabel == 0 and a.olabel >= 10]
        assert outs == [10, 11, 12]


def make_logits(seq, vocab, frames_per_tok=3, sharp=8.0):
    """Synthetic log-softmax with `seq` tokens, blanks between."""
    rows = []
    truth = []
    for t in seq:
        for _ in range(frames_per_tok):
            rows.append(t)
            truth.append(t)
        rows.append(0)
        truth.append(0)
    T = len(rows)
    ll = np.full((T, vocab), -sharp, dtype=np.float32)
    for i, t in enumerate(rows):
        ll[i, t] = 0.0
    ll = ll - np.log(np.sum(np.exp(ll), axis=1, keepdims=True))
    return ll


def test_ctc_viterbi_alignment():
    vocab = 5  # 0=blank, tokens 1..4
    tokens = [2, 3, 2, 2]
    g = build_ctc_training_graph(tokens, vocab)
    ll = make_logits(tokens, vocab)
    id2pdf = ctc_id2pdf(vocab)
    packed = pack_graph(g, id2pdf)
    arrays = pack_graph_batch([packed])
    T = ll.shape[0]
    res = viterbi_align_batch(
        arrays, ll[None], np.array([T], np.int32), id2pdf, acoustic_scale=1.0
    )
    assert not bool(np.asarray(res.failed)[0])
    labs = np.asarray(res.tids)[0] - 1  # unshift
    # collapse: remove blanks and dedupe runs
    collapsed = []
    prev = None
    for l in labs:
        if l != 0 and l != prev:
            collapsed.append(int(l))
        prev = l
    assert collapsed == tokens
    # emitted words from the graph
    comp = compose(make_linear_acceptor(np.asarray(res.tids)[0].tolist()), g)
    r = shortest_path(comp)
    assert r is not None
    assert [w - 1 for w in r[1]] == tokens


def test_ctc_decode_with_topo():
    """Free decoding through the CTC topology with FasterDecoder."""
    vocab = 5
    tokens = [1, 4, 3]
    topo = build_standard_ctc_topo(vocab - 1)
    add_one(topo, treat_ilabel_zero_specially=False)
    ll = make_logits(tokens, vocab)
    id2pdf = ctc_id2pdf(vocab)
    dec = FasterDecoder(topo, FasterDecoderOptions(beam=20.0))
    out = dec.decode(ll, id2pdf, acoustic_scale=1.0)
    assert out is not None
    tids, words, cost, ac = out
    assert [w - 1 for w in words] == tokens


def test_ctc_infeasible_too_short():
    vocab = 4
    tokens = [1, 1, 1]  # repeats require blanks: min length 5
    g = build_ctc_training_graph(tokens, vocab)
    id2pdf = ctc_id2pdf(vocab)
    packed = pack_graph(g, id2pdf)
    arrays = pack_graph_batch([packed])
    ll = np.zeros((4, vocab), dtype=np.float32)
    res = viterbi_align_batch(
        arrays, ll[None], np.array([4], np.int32), id2pdf, acoustic_scale=1.0
    )
    assert bool(np.asarray(res.failed)[0])
    ll5 = np.zeros((5, vocab), dtype=np.float32)
    res5 = viterbi_align_batch(
        arrays, ll5[None], np.array([5], np.int32), id2pdf, acoustic_scale=1.0
    )
    assert not bool(np.asarray(res5.failed)[0])


def test_ctc_hl_decode_to_words():
    """CTC logits decoded to WORDS through a lexicon (HL graph)."""
    from khg_tpu.lang.ctc import build_hl_graph
    from khg_tpu.lang.lexicon import Lexicon, Lexiconp
    from khg_tpu.lang.lfst import make_lexicon_fst_no_silence

    # tokens: 0=blank, 1..3 = a, b, c; words AB = "a b", C = "c"
    lexicon = Lexicon(word2phones={"AB": ["a b"], "C": ["c"]})
    lp = Lexiconp.from_lexicon(lexicon).add_lex_disambig()
    assert lp.phone2id["a"] == 1 and lp.phone2id["c"] == 3
    L = make_lexicon_fst_no_silence(lp)
    hl = build_hl_graph(3, L)

    vocab = 4
    tokens = [1, 2, 3]  # a b c -> "AB C"
    ll = make_logits(tokens, vocab)
    id2pdf = ctc_id2pdf(vocab)
    dec = FasterDecoder(hl, FasterDecoderOptions(beam=20.0))
    out = dec.decode(ll, id2pdf, acoustic_scale=1.0)
    assert out is not None
    _, words, _, _ = out
    assert [lp.id2word[w] for w in words] == ["AB", "C"]
