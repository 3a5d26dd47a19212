"""Standard HMM topology builders.

Constructs HmmTopology OBJECTS directly (no text round-trip): a Bakis
chain for ordinary phones and an ergodic-core silence prototype.  The
resulting structures and default probabilities match what the
reference's topology generator emits as text
(/root/reference/scripts/prepare_lang.py:514-600) — pinned by
tests/test_reference_parity.py against a checked-in text fixture — but
the construction here is in terms of HmmState records, not strings.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

from khg_tpu.model.topology import HmmState, HmmTopology, TopologyEntry


def _state(pdf_class: int, hops: Iterable[Tuple[int, float]]) -> HmmState:
    return HmmState(pdf_class, pdf_class, transitions=list(hops))


def bakis_entry(num_states: int, self_prob: float = 0.75) -> TopologyEntry:
    """Left-to-right chain: each emitting state self-loops with
    ``self_prob`` and advances with the rest; one non-emitting final."""
    hop = 1.0 - self_prob
    chain = [
        _state(i, [(i, self_prob), (i + 1, hop)]) for i in range(num_states)
    ]
    return chain + [HmmState()]


def ergodic_silence_entry(num_states: int) -> TopologyEntry:
    """Silence prototype: an ergodic core with a non-skippable exit state.

    State 0 fans out to every core state {0..S-2}; core states 1..S-2 are
    fully connected to {1..S-1}; the last emitting state S-1 behaves like
    a Bakis state (self-loop 0.75 / exit 0.25).  Degenerates to a single
    Bakis state when num_states == 1.
    """
    if num_states == 1:
        return bakis_entry(1)
    spread = 1.0 / (num_states - 1)
    entry: TopologyEntry = [
        _state(0, ((k, spread) for k in range(num_states - 1)))
    ]
    entry += [
        _state(i, ((k, spread) for k in range(1, num_states)))
        for i in range(1, num_states - 1)
    ]
    last = num_states - 1
    entry.append(_state(last, [(last, 0.75), (last + 1, 0.25)]))
    entry.append(HmmState())
    return entry


def build_topology(
    entries_for_phones: Sequence[Tuple[Sequence[int], TopologyEntry]],
) -> HmmTopology:
    """Assemble an HmmTopology from (phone list, entry) pairs."""
    topo = HmmTopology()
    for idx, (phones, entry) in enumerate(entries_for_phones):
        topo.entries.append(entry)
        topo.phones.extend(int(p) for p in phones)
        max_p = max(int(p) for p in phones)
        if len(topo.phone2idx) <= max_p:
            topo.phone2idx.extend(
                [-1] * (max_p + 1 - len(topo.phone2idx))
            )
        for p in phones:
            topo.phone2idx[int(p)] = idx
    topo.phones.sort()
    topo.check()
    return topo


def generate_hmm_topo(
    non_sil_phones: List[int],
    sil_phone: int,
    num_non_sil_states: int = 3,
    num_sil_states: int = 5,
) -> HmmTopology:
    """The standard recipe topology: Bakis for speech phones, ergodic-core
    silence for the silence phone."""
    return build_topology([
        (non_sil_phones, bakis_entry(num_non_sil_states)),
        ([sil_phone], ergodic_silence_entry(num_sil_states)),
    ])
