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
