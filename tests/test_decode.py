import io
import math

import numpy as np
import pytest

from khg_tpu.decode.arpa import arpa_to_fst
from khg_tpu.decode.decoder import (
    FasterDecoder,
    FasterDecoderOptions,
    decode_dense,
    recover_words,
)
from khg_tpu.decode.graph import build_hclg
from khg_tpu.decode.wer import levenshtein_align, write_error_stats
from khg_tpu.fstlib.fst import compose, make_linear_acceptor, shortest_path
from khg_tpu.gmm.likelihoods import loglikes_np
from khg_tpu.recipes.yesno import make_synthetic_corpus, train_yesno

YESNO_ARPA = """
\\data\\
ngram 1=4

\\1-grams:
-1\tNO
-1\tYES
-99 <s>
-1 </s>

\\end\\
"""


def test_levenshtein_align():
    ali = levenshtein_align(["a", "b", "c"], ["a", "x", "c", "d"])
    assert ("b", "x") in ali
    assert ("*", "d") in ali
    assert sum(1 for r, h in ali if r == h) == 2


def test_write_error_stats():
    out = io.StringIO()
    results = [
        ("u1", ["YES", "NO"], ["YES", "NO"]),
        ("u2", ["YES"], ["NO"]),
    ]
    wer = write_error_stats(out, "test", results, enable_log=False)
    assert math.isclose(wer, 100.0 / 3)
    text = out.getvalue()
    assert "%WER 33.33%" in text
    assert "1 substitutions" in text


def test_arpa_to_fst_unigram():
    word2id = {"<eps>": 0, "<SIL>": 1, "NO": 2, "YES": 3, "#0": 4, "<s>": 5, "</s>": 6}
    G = arpa_to_fst(YESNO_ARPA, word2id)
    # accepts any YES/NO sequence; weight of a 2-word path:
    # <s> backoff (99*log10) is on the start state? start=(<s>,) state
    res = shortest_path(compose(G, make_linear_acceptor([3, 2])))
    assert res is not None
    ils, ols, cost = res
    assert ils[-2:] == [3, 2] or ils == [3, 2]  # may include #0 backoff arcs
    # cost: backoff(<s>)=0 (not listed -> its -99 logprob is the unigram
    # prob, backoff weight 0) + 1*log10 (YES) + 1*log10 (NO) + 1*log10 (</s>)
    assert math.isclose(cost, 3 * math.log(10.0), rel_tol=1e-6)


@pytest.fixture(scope="module")
def trained_and_graph():
    rng = np.random.default_rng(1)
    lp, corpus = make_synthetic_corpus(num_utts=8, dim=8, rng=rng)
    result = train_yesno(
        lp, corpus, num_iters=10, total_gauss=40, max_iter_inc=5,
        realign_iters="1 2 3 4 5 6 7 8 9",
    )
    G = arpa_to_fst(YESNO_ARPA, lp.word2id)
    hclg = build_hclg(lp, G, result.transition_model, result.tree)
    return lp, corpus, result, hclg


def test_decode_faster_recovers_transcripts(trained_and_graph):
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    # NOTE: synthetic emitters are far sharper than real speech, so relative
    # path costs are larger and the beam must be wider than the reference's
    # real-data beam of 13.
    decoder = FasterDecoder(hclg, FasterDecoderOptions(beam=40.0))
    results = []
    for i, feats in enumerate(corpus.feats):
        ll = loglikes_np(packed, feats)
        out = decoder.decode(ll, id2pdf, acoustic_scale=2.0)
        assert out is not None, i
        tids, words, cost, acoustic = out
        hyp = [lp.id2word[w] for w in words]
        results.append((f"u{i}", corpus.word_seqs[i], hyp))
        assert len(tids) == feats.shape[0]
    out = io.StringIO()
    wer = write_error_stats(out, "synthetic", results, enable_log=False)
    assert wer <= 20.0, out.getvalue()


def test_decode_dense_matches_faster(trained_and_graph):
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    decoder = FasterDecoder(hclg, FasterDecoderOptions(beam=30.0))
    for i in range(3):
        feats = corpus.feats[i]
        ll = loglikes_np(packed, feats)
        fast = decoder.decode(ll, id2pdf, acoustic_scale=2.0)
        dense = decode_dense(hclg, ll, id2pdf, acoustic_scale=2.0)
        assert fast is not None and dense is not None
        # exact DP and wide-beam search agree on cost and words
        assert math.isclose(fast[2], dense[2], rel_tol=1e-3), (fast[2], dense[2])
        assert fast[1] == dense[1]


def test_recover_words_roundtrip(trained_and_graph):
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    feats = corpus.feats[0]
    ll = loglikes_np(packed, feats)
    dense = decode_dense(hclg, ll, id2pdf, acoustic_scale=2.0)
    tids, words, cost = dense
    assert recover_words(hclg, tids) == words


def test_faster_decoder_min_active_rescues_narrow_beam(trained_and_graph):
    """GetCutoff semantics (faster-decoder.cc:243-335): with active <=
    min_active nothing is pruned, so a huge min_active makes even a
    hopeless beam exact."""
    import math

    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    ll = loglikes_np(packed, corpus.feats[0])
    wide = FasterDecoder(
        hclg, FasterDecoderOptions(beam=100.0, min_active=0)
    ).decode(ll, id2pdf, acoustic_scale=2.0)
    rescued = FasterDecoder(
        hclg, FasterDecoderOptions(beam=0.01, min_active=10**6)
    ).decode(ll, id2pdf, acoustic_scale=2.0)
    assert wide is not None and rescued is not None
    assert math.isclose(rescued[2], wide[2], rel_tol=1e-6)
    assert rescued[0] == wide[0]
