"""Kaldi BINARY wire-format round trips (khg_tpu.model.kaldi_binary).

Layout pinned against the reference's binary branches:
transition-model.cc:37-116, hmm-topology.cc:122-160/241-280,
event-map.cc:116-190, context-dep.cc:45-52.
"""

import struct

import numpy as np

from khg_tpu.model.event_map import (
    ConstantEventMap,
    SplitEventMap,
    TableEventMap,
)
from khg_tpu.model.kaldi_binary import (
    BINARY_MARKER,
    BinReader,
    BinWriter,
    load_transition_model,
    load_tree,
    read_context_dependency,
    read_event_map,
    read_topology,
    read_transition_model,
    save_transition_model,
    save_tree,
    write_context_dependency,
    write_event_map,
    write_topology,
    write_transition_model,
)
from khg_tpu.model.topology import HmmState, HmmTopology
from tests.test_transition_model import build_tm


def test_primitive_wire_layout():
    w = BinWriter()
    w.token("<Tok>")
    w.int32(7)
    w.float32(1.5)
    w.int_vector([1, 2, 3])
    w.float_vector(np.array([0.5, -2.0]))
    data = w.getvalue()
    expected = (
        b"<Tok> "
        + b"\x04" + struct.pack("<i", 7)
        + b"\x04" + struct.pack("<f", 1.5)
        + b"\x04" + struct.pack("<i", 3) + struct.pack("<3i", 1, 2, 3)
        + b"FV " + b"\x04" + struct.pack("<i", 2) + struct.pack("<2f", 0.5, -2.0)
    )
    assert data == expected

    r = BinReader(data)
    assert r.token() == "<Tok>"
    assert r.int32() == 7
    assert r.float32() == 1.5
    assert r.int_vector() == [1, 2, 3]
    np.testing.assert_array_equal(r.float_vector(), [0.5, -2.0])


def test_double_vector_read():
    # real Kaldi may write DV (double) vectors; reader must accept them
    data = b"DV " + b"\x04" + struct.pack("<i", 2) + struct.pack("<2d", 1.25, -3.5)
    v = BinReader(data).float_vector()
    assert v.dtype == np.float32
    np.testing.assert_array_equal(v, [1.25, -3.5])


def test_topology_binary_round_trip():
    topo, tree, tm = build_tm()
    w = BinWriter()
    write_topology(w, topo)
    topo2 = read_topology(BinReader(w.getvalue()))
    assert topo2 == topo


def test_topology_binary_non_hmm():
    # forward_pdf_class != self_loop_pdf_class exercises the extended
    # (-1-signalled) format (hmm-topology.cc:245-249)
    topo = HmmTopology()
    topo.phones = [1]
    topo.phone2idx = [-1, 0]
    s0 = HmmState(0, 1)
    s0.transitions = [(0, 0.5), (1, 0.5)]
    s1 = HmmState()
    topo.entries = [[s0, s1]]
    assert not topo.is_hmm()

    w = BinWriter()
    write_topology(w, topo)
    topo2 = read_topology(BinReader(w.getvalue()))
    assert topo2 == topo
    assert not topo2.is_hmm()


def test_event_map_binary_round_trip():
    # TE with a NULL child and an SE subtree, mirroring event-map.cc I/O
    inner = SplitEventMap(
        0, [1, 3, 5], ConstantEventMap(2), ConstantEventMap(3)
    )
    m = TableEventMap(-1, {0: ConstantEventMap(1), 2: inner})
    assert m.table[1] is None

    w = BinWriter()
    write_event_map(w, m)
    m2 = read_event_map(BinReader(w.getvalue()))
    assert isinstance(m2, TableEventMap)
    assert len(m2.table) == len(m.table)
    assert m2.table[1] is None
    assert m2.table[0].answer == 1
    assert isinstance(m2.table[2], SplitEventMap)
    assert sorted(m2.table[2].yes_set) == [1, 3, 5]
    assert m2.table[2].yes.answer == 2
    assert m2.table[2].no.answer == 3


def test_context_dependency_binary_round_trip():
    topo, tree, tm = build_tm()
    w = BinWriter()
    write_context_dependency(w, tree)
    tree2 = read_context_dependency(BinReader(w.getvalue()))
    assert tree2.N == tree.N and tree2.P == tree.P
    assert tree2.num_pdfs == tree.num_pdfs
    for phone in topo.phones:
        for pc in range(topo.num_pdf_classes(phone)):
            assert tree2.compute([phone], pc) == tree.compute([phone], pc)


def test_transition_model_binary_round_trip():
    topo, tree, tm = build_tm()
    w = BinWriter()
    write_transition_model(w, tm)
    tm2 = read_transition_model(BinReader(w.getvalue()))
    assert tm2.tuples == tm.tuples
    assert tm2.num_transition_ids == tm.num_transition_ids
    np.testing.assert_array_equal(tm2.log_probs, tm.log_probs)
    np.testing.assert_allclose(
        tm2.non_self_loop_log_probs, tm.non_self_loop_log_probs, rtol=1e-5
    )


def test_file_save_load_autodetect(tmp_path):
    topo, tree, tm = build_tm()

    pb = tmp_path / "final.mdl"
    save_transition_model(pb, tm, binary=True)
    assert pb.read_bytes().startswith(BINARY_MARKER)
    tm_b = load_transition_model(pb)
    assert tm_b.tuples == tm.tuples

    pt = tmp_path / "final_text.mdl"
    save_transition_model(pt, tm, binary=False)
    assert not pt.read_bytes().startswith(BINARY_MARKER)
    tm_t = load_transition_model(pt)
    assert tm_t.tuples == tm.tuples
    np.testing.assert_allclose(tm_t.log_probs, tm_b.log_probs, rtol=1e-6)

    tb = tmp_path / "tree"
    save_tree(tb, tree, binary=True)
    tree_b = load_tree(tb)
    assert tree_b.num_pdfs == tree.num_pdfs

    tt = tmp_path / "tree_text"
    save_tree(tt, tree, binary=False)
    tree_t = load_tree(tt)
    assert tree_t.num_pdfs == tree.num_pdfs
