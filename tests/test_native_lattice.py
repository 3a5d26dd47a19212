"""Native (C++) lattice decoder == Python lattice decoder, EXACTLY.

The Python LatticeFasterDecoder (khg_tpu/decode/lattice.py) is the
semantics reference (itself pinned against the reference's
LatticeFasterDecoderTpl by tests/test_reference_parity.py).  The native
core must reproduce it bit-for-bit: identical lattice state numbering,
state keys, arc order, double-precision costs, finals, and the
max-live-links observability counter — across beams, max/min_active,
prune intervals, partial paths, and failure cases.
"""

import itertools

import numpy as np
import pytest

from khg_tpu.decode.lattice import (
    LatticeFasterDecoder,
    LatticeFasterDecoderConfig,
)
from khg_tpu.decode.native_lattice import native_available
from khg_tpu.gmm.likelihoods import loglikes_np
from tests.test_decode import YESNO_ARPA, trained_and_graph  # noqa: F401

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native core unavailable"
)


def assert_lattices_identical(lat_n, lat_p):
    if lat_p is None or lat_n is None:
        assert lat_p is None and lat_n is None
        return
    fn, fp = lat_n.fst, lat_p.fst
    assert fn.num_states == fp.num_states
    assert fn.start == fp.start
    assert lat_n.state_keys == lat_p.state_keys
    for s in range(fp.num_states):
        assert fn.final[s] == fp.final[s], s
        an = [(a.ilabel, a.olabel, a.weight, a.nextstate) for a in fn.arcs[s]]
        ap = [(a.ilabel, a.olabel, a.weight, a.nextstate) for a in fp.arcs[s]]
        assert an == ap, f"state {s}"
        assert lat_n.acoustic_costs[s] == lat_p.acoustic_costs[s], s


CONFIGS = [
    LatticeFasterDecoderConfig(),
    LatticeFasterDecoderConfig(beam=8.0, lattice_beam=4.0),
    LatticeFasterDecoderConfig(beam=100.0, lattice_beam=8.0,
                               prune_interval=5),
    LatticeFasterDecoderConfig(beam=16.0, max_active=20, min_active=5,
                               lattice_beam=6.0, prune_interval=3),
    LatticeFasterDecoderConfig(beam=200.0, lattice_beam=200.0),
    LatticeFasterDecoderConfig(beam=float("inf"), max_active=2**31 - 1,
                               min_active=0, lattice_beam=10.0),
]


def test_native_matches_python_yesno(trained_and_graph):
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    for cfg in CONFIGS:
        dn = LatticeFasterDecoder(hclg, cfg, backend="native")
        dp = LatticeFasterDecoder(hclg, cfg, backend="python")
        for i in range(3):
            ll = loglikes_np(packed, corpus.feats[i])
            lat_n = dn.decode(ll, id2pdf, acoustic_scale=2.0)
            lat_p = dp.decode(ll, id2pdf, acoustic_scale=2.0)
            assert_lattices_identical(lat_n, lat_p)
            assert dn.last_max_live_links == dp.last_max_live_links, cfg


def _large_graph():
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
    return build_hclg(lp, G, tm, tree), tm


def test_native_matches_python_large_graph():
    hclg, tm = _large_graph()
    rng = np.random.default_rng(0)
    id2pdf = tm.id2pdf_array()
    ll = rng.standard_normal((60, tm.num_pdfs)).astype(np.float32)
    for cfg in [
        LatticeFasterDecoderConfig(beam=1e9, min_active=0, lattice_beam=6.0),
        LatticeFasterDecoderConfig(beam=1e9, max_active=100, min_active=0,
                                   lattice_beam=6.0),
        LatticeFasterDecoderConfig(beam=1e9, max_active=12, min_active=0,
                                   lattice_beam=6.0, prune_interval=7),
    ]:
        dn = LatticeFasterDecoder(hclg, cfg, backend="native")
        dp = LatticeFasterDecoder(hclg, cfg, backend="python")
        lat_n = dn.decode(ll, id2pdf, acoustic_scale=1.0)
        lat_p = dp.decode(ll, id2pdf, acoustic_scale=1.0)
        assert_lattices_identical(lat_n, lat_p)
        assert dn.last_max_live_links == dp.last_max_live_links


def test_native_partial_and_failure(trained_and_graph):
    """Partial fallback (not enough frames to reach a final state) and
    the allow_partial=False -> None case agree with the Python path."""
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    ll = loglikes_np(packed, corpus.feats[0])[:2]  # 2 frames: no final yet
    cfg = LatticeFasterDecoderConfig(beam=100.0, lattice_beam=8.0)
    dn = LatticeFasterDecoder(hclg, cfg, backend="native")
    dp = LatticeFasterDecoder(hclg, cfg, backend="python")
    for allow_partial in (True, False):
        lat_n = dn.decode(ll, id2pdf, acoustic_scale=2.0,
                          allow_partial=allow_partial)
        lat_p = dp.decode(ll, id2pdf, acoustic_scale=2.0,
                          allow_partial=allow_partial)
        assert_lattices_identical(lat_n, lat_p)


def test_native_best_path_matches_shortest_path(trained_and_graph):
    """NativeLattice.best_path (C++ replica of fstlib.shortest_path,
    run on the flat arrays) == shortest_path over the materialized fst —
    exact tids, words, and cost."""
    from khg_tpu.fstlib.fst import shortest_path

    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    dn = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(beam=100.0, lattice_beam=8.0),
        backend="native",
    )
    for i in range(4):
        ll = loglikes_np(packed, corpus.feats[i])
        lat = dn.decode(ll, id2pdf, acoustic_scale=2.0)
        bp = lat.best_path()
        ref = shortest_path(lat.fst)
        assert bp == ref

    hclg2, tm2 = _large_graph()
    rng = np.random.default_rng(3)
    ll = rng.standard_normal((60, tm2.num_pdfs)).astype(np.float32)
    d2 = LatticeFasterDecoder(
        hclg2,
        LatticeFasterDecoderConfig(beam=1e9, max_active=40, min_active=0,
                                   lattice_beam=6.0),
        backend="native",
    )
    lat = d2.decode(ll, tm2.id2pdf_array(), acoustic_scale=1.0)
    assert lat.best_path() == shortest_path(lat.fst)


def test_auto_backend_uses_native(trained_and_graph):
    lp, corpus, result, hclg = trained_and_graph
    d = LatticeFasterDecoder(hclg)
    assert d._use_native()


def test_float64_loglikes_same_lattice_both_backends(trained_and_graph):
    """decode() normalizes loglikes to f32 for BOTH backends, so a
    float64 caller gets identical lattices regardless of backend
    (review finding: the native path cast to f32 while the Python path
    computed f64 acoustics)."""
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    ll64 = loglikes_np(packed, corpus.feats[0]).astype(np.float64)
    cfg = LatticeFasterDecoderConfig(beam=100.0, lattice_beam=8.0)
    lat_n = LatticeFasterDecoder(hclg, cfg, backend="native").decode(
        ll64, id2pdf, acoustic_scale=2.0
    )
    lat_p = LatticeFasterDecoder(hclg, cfg, backend="python").decode(
        ll64, id2pdf, acoustic_scale=2.0
    )
    assert_lattices_identical(lat_n, lat_p)


def test_max_active_zero_matches_python(trained_and_graph):
    """max_active=0 hits np.partition's negative-index wrap (kth=-1 ->
    the max): the native path must replicate it, not run UB on an
    iterator before begin()."""
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    ll = loglikes_np(packed, corpus.feats[0])
    cfg = LatticeFasterDecoderConfig(
        beam=100.0, max_active=0, min_active=0, lattice_beam=8.0
    )
    lat_n = LatticeFasterDecoder(hclg, cfg, backend="native").decode(
        ll, id2pdf, acoustic_scale=2.0
    )
    lat_p = LatticeFasterDecoder(hclg, cfg, backend="python").decode(
        ll, id2pdf, acoustic_scale=2.0
    )
    assert_lattices_identical(lat_n, lat_p)


def test_graph_cache_invalidation(trained_and_graph):
    """The native CSR cache re-packs when the graph's shape changes and
    on explicit invalidate_graph_cache() after in-place weight edits."""
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    ll = loglikes_np(packed, corpus.feats[0])
    g = hclg.copy()
    cfg = LatticeFasterDecoderConfig(beam=100.0, lattice_beam=8.0)
    dn = LatticeFasterDecoder(g, cfg, backend="native")
    dp = LatticeFasterDecoder(g, cfg, backend="python")
    assert_lattices_identical(
        dn.decode(ll, id2pdf, acoustic_scale=2.0),
        dp.decode(ll, id2pdf, acoustic_scale=2.0),
    )
    # in-place weight mutation: explicit invalidation restores parity
    for s in range(g.num_states):
        for a in g.arcs[s]:
            a.weight = a.weight * 1.5 + 0.01
    dn.invalidate_graph_cache()
    assert_lattices_identical(
        dn.decode(ll, id2pdf, acoustic_scale=2.0),
        dp.decode(ll, id2pdf, acoustic_scale=2.0),
    )


def test_parallel_decode_matches_serial(trained_and_graph):
    """Thread-parallel test-set decoding (native releases the GIL)
    returns exactly the serial results, in input order."""
    from khg_tpu.decode.lattice import (
        decode_utterance_lattice_faster,
        decode_utterances_parallel,
    )

    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    lls = [loglikes_np(packed, f) for f in corpus.feats]
    d = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(beam=100.0, lattice_beam=8.0),
        backend="native",
    )
    par = decode_utterances_parallel(
        d, lls, id2pdf, acoustic_scale=2.0, max_workers=4
    )
    ser = [
        decode_utterance_lattice_faster(d, ll, id2pdf, acoustic_scale=2.0)
        for ll in lls
    ]
    assert par == ser
