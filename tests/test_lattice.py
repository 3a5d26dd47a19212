import math

import numpy as np
import pytest

from khg_tpu.decode.decoder import FasterDecoder, FasterDecoderOptions
from khg_tpu.decode.lattice import (
    LatticeFasterDecoder,
    LatticeFasterDecoderConfig,
    LatticeSimpleDecoder,
    decode_utterance_lattice_faster,
)
from khg_tpu.gmm.likelihoods import loglikes_np
from tests.test_decode import YESNO_ARPA, trained_and_graph  # noqa: F401


def test_lattice_best_path_matches_faster_decoder(trained_and_graph):
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    fd = FasterDecoder(hclg, FasterDecoderOptions(beam=100.0))
    ld = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(beam=100.0, lattice_beam=8.0)
    )
    for i in range(4):
        ll = loglikes_np(packed, corpus.feats[i])
        fast = fd.decode(ll, id2pdf, acoustic_scale=2.0)
        lat = ld.decode(ll, id2pdf, acoustic_scale=2.0)
        assert fast is not None and lat is not None
        tids, words, cost = lat.best_path()
        assert math.isclose(cost, fast[2], rel_tol=1e-4), (cost, fast[2])
        assert words == fast[1]
        assert tids == fast[0]


def test_lattice_contains_alternatives(trained_and_graph):
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    ld = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(beam=200.0, lattice_beam=200.0)
    )
    ll = loglikes_np(packed, corpus.feats[0])
    lat = ld.decode(ll, id2pdf, acoustic_scale=2.0)
    assert lat is not None
    # with a huge lattice beam, the lattice has more than one path: count
    # paths by DP (cycles impossible: states are (t, s) pairs)
    fst = lat.fst
    n_paths = [0.0] * fst.num_states
    # topological order: states created in t order; compute by repeated pass
    order = list(range(fst.num_states))
    counts = {s: 0 for s in order}
    import functools

    import sys
    sys.setrecursionlimit(100000)

    @functools.lru_cache(maxsize=None)
    def paths_from(s):
        total = 1 if fst.is_final(s) else 0
        for a in fst.arcs[s]:
            total += paths_from(a.nextstate)
        return total

    assert paths_from(fst.start) > 1


def test_lattice_beam_prunes(trained_and_graph):
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    ll = loglikes_np(packed, corpus.feats[1])
    wide = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(beam=200.0, lattice_beam=100.0)
    ).decode(ll, id2pdf, acoustic_scale=2.0)
    narrow = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(beam=200.0, lattice_beam=0.1)
    ).decode(ll, id2pdf, acoustic_scale=2.0)
    assert wide.fst.num_arcs > narrow.fst.num_arcs
    # both contain the best path with the same cost
    assert math.isclose(
        wide.best_path()[2], narrow.best_path()[2], rel_tol=1e-4
    )


def test_lattice_simple_matches_faster(trained_and_graph):
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    ll = loglikes_np(packed, corpus.feats[2])
    simple = LatticeSimpleDecoder(hclg).decode(ll, id2pdf, acoustic_scale=2.0)
    faster = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(beam=100.0)
    ).decode(ll, id2pdf, acoustic_scale=2.0)
    assert math.isclose(
        simple.best_path()[2], faster.best_path()[2], rel_tol=1e-4
    )


def test_decode_utterance_wrapper(trained_and_graph):
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    ld = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(beam=100.0, lattice_beam=6.0)
    )
    ll = loglikes_np(packed, corpus.feats[0])
    ok, tids, words, like = decode_utterance_lattice_faster(
        ld, ll, id2pdf, acoustic_scale=2.0
    )
    assert ok
    assert len(tids) == corpus.feats[0].shape[0]
    hyp = [lp.id2word[w] for w in words]
    assert hyp == corpus.word_seqs[0]


def _lattice_signature(lat):
    """Canonical arc-set signature for lattice equality: state ids are
    creation-order-dependent, so states are identified by their
    (frame, graph-state) keys instead."""
    fst = lat.fst
    key = lat.state_keys
    arcs = []
    for s in range(fst.num_states):
        for a in fst.arcs[s]:
            arcs.append(
                (key[s], a.ilabel, a.olabel, round(a.weight, 4),
                 key[a.nextstate])
            )
    finals = [(key[s], round(w, 4)) for s, w in enumerate(fst.final)
              if w != math.inf]
    return sorted(arcs), sorted(finals), key[fst.start]


def test_incremental_pruning_matches_offline(trained_and_graph):
    """PruneActiveTokens-every-N analogue: the lattice with
    prune_interval=5 is IDENTICAL to the offline (prune_interval > T)
    lattice — incremental pruning is conservative (every active
    frontier token gets extra_cost 0, like the reference)."""
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    off = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(
            beam=30.0, lattice_beam=8.0, prune_interval=10**9)
    )
    inc = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(
            beam=30.0, lattice_beam=8.0, prune_interval=5)
    )
    for i in range(4):
        ll = loglikes_np(packed, corpus.feats[i])
        a = off.decode(ll, id2pdf, acoustic_scale=2.0)
        b = inc.decode(ll, id2pdf, acoustic_scale=2.0)
        assert a is not None and b is not None
        assert _lattice_signature(a) == _lattice_signature(b), i
        assert inc.last_max_live_links <= off.last_max_live_links


def test_incremental_pruning_bounds_memory(trained_and_graph):
    """On a long utterance the live-link count must stay bounded by the
    lattice width, not grow O(T): the decode/lattice.py scale fix of
    VERDICT round-1 item #10."""
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    # a long utterance: the corpus features tiled 12x
    feats = np.concatenate([corpus.feats[0]] * 12, axis=0)
    ll = loglikes_np(packed, feats)
    off = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(
            beam=30.0, lattice_beam=6.0, prune_interval=10**9)
    )
    inc = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(
            beam=30.0, lattice_beam=6.0, prune_interval=25)
    )
    a = off.decode(ll, id2pdf, acoustic_scale=2.0)
    b = inc.decode(ll, id2pdf, acoustic_scale=2.0)
    assert a is not None and b is not None
    assert math.isclose(a.best_path()[2], b.best_path()[2], rel_tol=1e-5)
    # the pruned decoder's peak live links must be well below offline's
    assert inc.last_max_live_links < 0.5 * off.last_max_live_links, (
        inc.last_max_live_links, off.last_max_live_links,
    )


def test_min_active_keeps_tokens(trained_and_graph):
    """With a beam too narrow to survive, min_active must keep the
    min_active best tokens alive (GetCutoff semantics)."""
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    ll = loglikes_np(packed, corpus.feats[0])
    narrow = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(
            beam=0.01, min_active=0, lattice_beam=8.0)
    )
    rescued = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(
            beam=0.01, min_active=10**6, lattice_beam=8.0)
    )
    wide = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(
            beam=100.0, min_active=0, lattice_beam=8.0)
    )
    bad = narrow.decode(ll, id2pdf, acoustic_scale=2.0)
    good = rescued.decode(ll, id2pdf, acoustic_scale=2.0)
    ref = wide.decode(ll, id2pdf, acoustic_scale=2.0)
    assert good is not None and ref is not None
    # active <= min_active disables pruning entirely: exact best path
    assert math.isclose(
        good.best_path()[2], ref.best_path()[2], rel_tol=1e-5
    )
    # the bare narrow beam loses it (greedy path is suboptimal or dies)
    assert bad is None or bad.best_path()[2] >= ref.best_path()[2] - 1e-6


def test_max_active_on_large_graph():
    """A deliberately larger composed HCLG (40-word lexicon, flat
    unigram LM) decoded with max_active enforced: the histogram cutoff
    keeps decoding linear-time and the result stays the exact best path
    when max_active is generous, degrading gracefully when tight."""
    import itertools

    from khg_tpu.decode.arpa import arpa_to_fst
    from khg_tpu.decode.graph import build_hclg
    from khg_tpu.lang.lexicon import Lexicon, Lexiconp
    from khg_tpu.lang.topo import generate_hmm_topo
    from khg_tpu.model.context_dep import monophone_context_dependency
    from khg_tpu.model.transition_model import TransitionModel

    phones = [c for c in "BCDFGJKLMPQRSTVWXZ"]
    words = {}
    for i, (a, b, c) in enumerate(itertools.product(phones, phones, phones)):
        if len(words) >= 40:
            break
        # stride the product so word shapes do not share long prefixes
        if i % 7:
            continue
        words[f"W{i}"] = [a, b, c]
    words["<SIL>"] = ["SIL"]
    lp = Lexiconp.from_lexicon(Lexicon(word2phones=words)).add_lex_disambig()
    topo = generate_hmm_topo(
        non_sil_phones=lp.get_non_sil_phone_ids(),
        sil_phone=lp.get_sil_phone_id(),
    )
    tree = monophone_context_dependency(
        topo.phones, topo.get_phone_to_num_pdf_classes()
    )
    tm = TransitionModel(tree, topo)
    lm_words = [w for w in words if w != "<SIL>"]
    arpa = "\\data\\\nngram 1=%d\n\n\\1-grams:\n" % (len(lm_words) + 2)
    for w in lm_words:
        arpa += f"-2\t{w}\n"
    arpa += "-99 <s>\n-2 </s>\n\n\\end\\\n"
    G = arpa_to_fst(arpa, lp.word2id)
    hclg = build_hclg(lp, G, tm, tree)
    assert hclg.num_states > 150 and hclg.num_arcs > 1000, (
        hclg.num_states, hclg.num_arcs)

    rng = np.random.default_rng(0)
    num_pdfs = tm.num_pdfs
    T = 60
    ll = rng.standard_normal((T, num_pdfs)).astype(np.float32)
    id2pdf = tm.id2pdf_array()
    exact = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(
            beam=1e9, min_active=0, lattice_beam=6.0)
    )
    generous = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(
            beam=1e9, max_active=100, min_active=0, lattice_beam=6.0)
    )
    tight = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(
            beam=1e9, max_active=12, min_active=0, lattice_beam=6.0)
    )
    a = exact.decode(ll, id2pdf, acoustic_scale=1.0)
    g = generous.decode(ll, id2pdf, acoustic_scale=1.0)
    t_ = tight.decode(ll, id2pdf, acoustic_scale=1.0)
    assert a is not None and g is not None
    assert math.isclose(a.best_path()[2], g.best_path()[2], rel_tol=1e-6)
    # max_active bounds work: far fewer live links than exhaustive
    assert generous.last_max_live_links < exact.last_max_live_links
    if t_ is not None:  # tight beam may legally fail; if not, no better
        assert t_.best_path()[2] >= a.best_path()[2] - 1e-6
        assert tight.last_max_live_links < generous.last_max_live_links
