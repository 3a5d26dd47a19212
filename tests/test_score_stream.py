"""Streamed score fetch: values, ordering, and f16-fetch decode parity.

decode/score_stream.py overlaps device->host score transfers with host
decoding.  These tests pin (on the CPU backend): the stream yields the
same f32 matrices as a direct fetch; the streamed decode equals the
list-based decode exactly; and the float16 fetch option leaves every
decoded word sequence unchanged on a trained synthetic system.
"""

import numpy as np
import jax.numpy as jnp

from khg_tpu.decode.lattice import (
    LatticeFasterDecoder,
    LatticeFasterDecoderConfig,
    decode_utterances_parallel,
)
from khg_tpu.decode.score_stream import (
    decode_scores_streamed,
    stream_scores,
)
from khg_tpu.gmm.likelihoods import loglikes_np
from tests.test_decode import trained_and_graph  # noqa: F401


def test_stream_scores_matches_direct_fetch():
    rng = np.random.default_rng(0)
    ll = rng.standard_normal((5, 17, 23)).astype(np.float32)
    got = list(stream_scores(jnp.asarray(ll)))
    assert len(got) == 5
    for u in range(5):
        assert got[u].dtype == np.float32
        np.testing.assert_array_equal(got[u], ll[u])


def test_stream_scores_f16_roundtrip_error_bounded():
    rng = np.random.default_rng(1)
    ll = (rng.standard_normal((3, 11, 19)) * 50).astype(np.float32)
    got = list(stream_scores(jnp.asarray(ll), fetch_dtype="float16"))
    for u in range(3):
        assert got[u].dtype == np.float32
        err = np.abs(got[u] - ll[u]) / np.maximum(np.abs(ll[u]), 1.0)
        assert err.max() < 1.5e-3


def _pad_scores(corpus, packed):
    """(U, Tmax, P) device tensor of per-utterance loglikes, -1e9 pad."""
    lls = [loglikes_np(packed, f) for f in corpus.feats]
    T = max(x.shape[0] for x in lls)
    out = np.full((len(lls), T, lls[0].shape[1]), -1e9, np.float32)
    for u, x in enumerate(lls):
        out[u, : x.shape[0]] = x
    return jnp.asarray(out), [x.shape[0] for x in lls]


def test_streamed_decode_matches_list_decode(trained_and_graph):
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    decoder = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(beam=40.0, lattice_beam=6.0)
    )
    lls = [loglikes_np(packed, f) for f in corpus.feats]
    ref = decode_utterances_parallel(
        decoder, lls, id2pdf, acoustic_scale=2.0
    )
    # streamed over the padded tensor, trimming pad frames per utterance
    dev, lens = _pad_scores(corpus, packed)
    got = [
        None
        for _ in range(len(lls))
    ]
    for u, ll in enumerate(stream_scores(dev)):
        from khg_tpu.decode.lattice import decode_utterance_lattice_faster

        got[u] = decode_utterance_lattice_faster(
            decoder, ll[: lens[u]], id2pdf, acoustic_scale=2.0
        )
    for r, g in zip(ref, got):
        assert r[0] == g[0]
        assert r[1] == g[1]  # identical alignments
        assert r[2] == g[2]  # identical words
        np.testing.assert_allclose(r[3], g[3], rtol=1e-6)


def test_f16_fetch_decodes_identical_words(trained_and_graph):
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    decoder = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(beam=40.0, lattice_beam=6.0)
    )
    dev, lens = _pad_scores(corpus, packed)
    from khg_tpu.decode.lattice import decode_utterance_lattice_faster

    words32, words16 = [], []
    for u, ll in enumerate(stream_scores(dev)):
        words32.append(decode_utterance_lattice_faster(
            decoder, ll[: lens[u]], id2pdf, acoustic_scale=2.0)[2])
    for u, ll in enumerate(stream_scores(dev, fetch_dtype="float16")):
        words16.append(decode_utterance_lattice_faster(
            decoder, ll[: lens[u]], id2pdf, acoustic_scale=2.0)[2])
    assert words32 == words16


def test_decode_scores_streamed_wrapper(trained_and_graph):
    lp, corpus, result, hclg = trained_and_graph
    tm = result.transition_model
    id2pdf = tm.id2pdf_array()
    packed = result.am.pack()
    decoder = LatticeFasterDecoder(
        hclg, LatticeFasterDecoderConfig(beam=40.0, lattice_beam=6.0)
    )
    # equal-length scores so the padded tensor needs no trimming
    T = min(f.shape[0] for f in corpus.feats)
    lls = [loglikes_np(packed, f[:T]) for f in corpus.feats]
    dev = jnp.asarray(np.stack(lls))
    ref = decode_utterances_parallel(
        decoder, lls, id2pdf, acoustic_scale=2.0
    )
    got = decode_scores_streamed(
        decoder, dev, id2pdf, acoustic_scale=2.0
    )
    assert [g[2] for g in got] == [r[2] for r in ref]
