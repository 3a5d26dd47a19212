import numpy as np
import pytest

from khg_tpu.decode.decodable import DecodableAmDiagGmmScaled, DecodableCtc
from khg_tpu.lang.prepare import prepare_lang
from khg_tpu.recipes.audiomnist import (
    digits_lexicon,
    make_synthetic_digits_corpus,
)
from khg_tpu.recipes.yesno import train_yesno


def test_prepare_lang_writes_artifacts(tmp_path):
    lp, topo = prepare_lang(
        tmp_path / "lang",
        word2phones={"<SIL>": ["SIL"], "YES": ["Y"], "NO": ["N"]},
    )
    lang = tmp_path / "lang"
    for name in ("phones.txt", "words.txt", "topo", "L.fst.txt",
                 "L_disambig.fst.txt"):
        assert (lang / name).exists(), name
    phones = dict(
        line.split() for line in (lang / "phones.txt").read_text().splitlines()
    )
    assert phones["<eps>"] == "0" and phones["SIL"] == "1"
    assert (lang / "phones" / "disambig.txt").read_text().strip() == "#0"
    # topo round-trips
    from khg_tpu.model.topology import HmmTopology

    topo2 = HmmTopology().read((lang / "topo").read_text())
    assert topo2 == topo


def test_digits_corpus_and_short_training():
    rng = np.random.default_rng(0)
    lp, corpus = make_synthetic_digits_corpus(num_utts=6, dim=10, rng=rng)
    assert len(lp.phone2id) >= 17  # 15+ phones + eps + disambig
    result = train_yesno(
        lp, corpus, num_iters=4, total_gauss=100, max_iter_inc=2,
        realign_iters="1 2 3",
    )
    assert result.avg_loglikes[-1] > result.avg_loglikes[0] + 2.0


def test_decodable_adapters():
    from tests.test_align import random_am
    from tests.test_graph_compiler import build_yesno_like

    lp, topo, tree, tm, gc = build_yesno_like()
    rng = np.random.default_rng(1)
    am = random_am(tree.num_pdfs, 5, rng)
    feats = rng.standard_normal((7, 5)).astype(np.float32)
    dec = DecodableAmDiagGmmScaled(am, tm, feats, scale=0.5)
    ll, id2pdf, scale = dec.matrix_and_map()
    assert ll.shape == (7, tree.num_pdfs) and scale == 0.5
    tid = 1
    assert np.isclose(
        dec.log_likelihood(3, tid), 0.5 * ll[3, id2pdf[tid]], rtol=1e-6
    )

    logits = rng.standard_normal((4, 6)).astype(np.float32)
    ctc = DecodableCtc(logits)
    m, cmap, s = ctc.matrix_and_map()
    assert cmap[1] == 0 and cmap[6] == 5
    assert ctc.log_likelihood(2, 3) == logits[2, 2]
