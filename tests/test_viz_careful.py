import numpy as np

from khg_tpu.graph.h_builder import modify_graph_for_careful_alignment
from khg_tpu.utils.viz import draw_fst, draw_hmm_topology, draw_tree
from tests.test_align import aligned_graph, random_am, setup  # noqa: F401
from tests.test_graph_compiler import build_yesno_like


def test_draw_topology_and_tree():
    lp, topo, tree, tm, gc = build_yesno_like()
    dot = draw_hmm_topology(topo, lp.get_sil_phone_id())
    assert dot.startswith("digraph")
    assert "doublecircle" in dot
    assert dot.count("->") == sum(
        len(st.transitions)
        for st in topo.topology_for_phone(lp.get_sil_phone_id())
    )
    tree_dot = draw_tree(tree, phone_syms=lp.id2phone)
    assert "pdf 0" in tree_dot and "pdf 10" in tree_dot
    assert "SIL" in tree_dot


def test_draw_fst():
    lp, topo, tree, tm, gc = build_yesno_like()
    g = gc.compile_graph_from_text([lp.word2id["NO"]])
    dot = draw_fst(g, osymbols=lp.id2word)
    assert "digraph" in dot and "NO" in dot


def test_careful_alignment_graph(setup):
    lp, topo, tree, tm, gc, am, rng = setup
    from khg_tpu.align.packed import pack_graph, pack_graph_batch
    from khg_tpu.align.viterbi import viterbi_align_batch
    from khg_tpu.gmm.likelihoods import loglikes_np

    g = aligned_graph(gc, tm, [lp.word2id["NO"]])
    careful = modify_graph_for_careful_alignment(g)
    id2pdf = tm.id2pdf_array()
    # same best alignment as the plain graph (for a feasible length)
    T = 10
    feats = rng.standard_normal((1, T, 6)).astype(np.float32)
    ll = loglikes_np(am.pack(), feats)
    res_plain = viterbi_align_batch(
        pack_graph_batch([pack_graph(g, id2pdf)]), ll,
        np.array([T], np.int32), id2pdf, acoustic_scale=0.5,
    )
    res_careful = viterbi_align_batch(
        pack_graph_batch([pack_graph(careful, id2pdf)]), ll,
        np.array([T], np.int32), id2pdf, acoustic_scale=0.5,
    )
    assert not bool(np.asarray(res_careful.failed)[0])
    assert (
        np.asarray(res_plain.tids)[0].tolist()
        == np.asarray(res_careful.tids)[0].tolist()
    )


def test_draw_tree_query_highlight():
    """Query-path highlighting, the reference TreeRenderer's -query mode
    (tree-renderer.h:20-58): exactly the decision path to the queried
    (phone, pdf-class)'s pdf is drawn in red, and the highlighted leaf
    is the pdf the tree actually computes."""
    from khg_tpu.model.event_map import K_PDF_CLASS

    lp, topo, tree, tm, gc = build_yesno_like()
    phone = lp.get_sil_phone_id()
    pdf_class = 1
    want_pdf = tree.compute([phone], pdf_class)
    dot = draw_tree(
        tree, phone_syms=lp.id2phone,
        query={0: phone, K_PDF_CLASS: pdf_class},
    )
    red_lines = [ln for ln in dot.splitlines() if 'color="red"' in ln]
    assert red_lines, "query must highlight a path"
    # exactly one leaf is highlighted, and it is the right pdf
    red_leaves = [ln for ln in red_lines if "ellipse" in ln]
    assert len(red_leaves) == 1
    assert f"pdf {want_pdf}" in red_leaves[0]
    # no query -> no highlighting, same structure otherwise
    plain = draw_tree(tree, phone_syms=lp.id2phone)
    assert 'color="red"' not in plain
    assert plain.count("->") == dot.count("->")
