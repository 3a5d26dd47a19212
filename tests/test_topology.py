import numpy as np
import pytest

from khg_tpu.lang.topo import generate_hmm_topo
from khg_tpu.model.topology import HmmTopology, K_NO_PDF

BAKIS_3 = """
<Topology>
<TopologyEntry>
<ForPhones> 1 2 3 4 5 6 7 8 </ForPhones>
<State> 0 <PdfClass> 0
<Transition> 0 0.5
<Transition> 1 0.5
</State>
<State> 1 <PdfClass> 1
<Transition> 1 0.5
<Transition> 2 0.5
</State>
<State> 2 <PdfClass> 2
<Transition> 2 0.5
<Transition> 3 0.5
</State>
<State> 3
</State>
</TopologyEntry>
</Topology>
"""


def test_parse_basic():
    topo = HmmTopology().read(BAKIS_3)
    assert topo.phones == [1, 2, 3, 4, 5, 6, 7, 8]
    assert topo.is_hmm()
    entry = topo.topology_for_phone(3)
    assert len(entry) == 4
    assert entry[0].forward_pdf_class == 0
    assert entry[0].transitions == [(0, 0.5), (1, 0.5)]
    assert entry[3].forward_pdf_class == K_NO_PDF
    assert topo.num_pdf_classes(1) == 3
    assert topo.min_length(1) == 3
    assert topo.get_phone_to_num_pdf_classes() == [-1] + [3] * 8


def test_write_round_trip():
    topo = HmmTopology().read(BAKIS_3)
    topo2 = HmmTopology().read(topo.write())
    assert topo == topo2


def test_pickle_round_trip():
    import pickle

    topo = HmmTopology().read(BAKIS_3)
    topo2 = pickle.loads(pickle.dumps(topo))
    assert topo == topo2


def test_generate_hmm_topo():
    topo = generate_hmm_topo(non_sil_phones=[2, 3], sil_phone=1)
    assert topo.phones == [1, 2, 3]
    # Silence: 5 emitting states, ergodic core.
    assert topo.num_pdf_classes(1) == 5
    assert topo.num_pdf_classes(2) == 3
    sil = topo.topology_for_phone(1)
    assert len(sil) == 6
    # state 0 transitions to states 0..3 with prob 1/4 each
    assert sil[0].transitions == [(i, 0.25) for i in range(4)]
    # central states transition to 1..4
    assert sil[1].transitions == [(k, 0.25) for k in range(1, 5)]
    assert sil[4].transitions == [(4, 0.75), (5, 0.25)]
    # minimum silence path: state 0 -> state 3 -> state 4 -> final
    assert topo.min_length(1) == 3
    assert topo.min_length(2) == 3


def test_single_state_sil_topo():
    topo = generate_hmm_topo(non_sil_phones=[2], sil_phone=1, num_sil_states=1)
    assert topo.num_pdf_classes(1) == 1
    assert topo.min_length(1) == 1


def test_check_rejects_bad():
    bad = BAKIS_3.replace("<Transition> 3 0.5", "<Transition> 2 0.5")
    with pytest.raises(ValueError):
        HmmTopology().read(bad)
