"""Lexicon FST (L) construction.

Builds the optional-silence L transducer (phones -> words) and the
no-silence variant.  The state/arc layout and cost placement are a
parity CONTRACT (composed graph weights must telescope exactly —
/root/reference/scripts/prepare_lang.py:329-511 defines it); the
construction here factors each pronunciation into an explicit
label/cost schedule emitted against a set of exit states, instead of
the reference's inline special-casing.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

from khg_tpu.fstlib.fst import Arc, VectorFst
from khg_tpu.lang.lexicon import Lexiconp

# (ilabel, olabel, cost) triple for one arc of a pronunciation chain
_Step = Tuple[int, int, float]


def _pron_schedule(
    phone_ids: Sequence[int], word_id: int, pron_cost: float
) -> List[_Step]:
    """Arc schedule for one pronunciation: the word label and its cost
    ride the FIRST arc; remaining arcs carry bare phones.  An empty
    pronunciation degenerates to a single all-epsilon step."""
    if not phone_ids:
        return [(0, word_id, pron_cost)]
    steps = [(phone_ids[0], word_id, pron_cost)]
    steps += [(p, 0, 0.0) for p in phone_ids[1:]]
    return steps


def _emit_pron(
    fst: VectorFst,
    home: int,
    steps: List[_Step],
    exits: Sequence[Tuple[int, float]],
) -> None:
    """Lay down a chain from ``home`` through fresh states for all but
    the last step; the last step fans out to every (exit state, exit
    cost) destination."""
    cur = home
    for il, ol, cost in steps[:-1]:
        nxt = fst.add_state()
        fst.add_arc(cur, Arc(il, ol, cost, nxt))
        cur = nxt
    il, ol, cost = steps[-1]
    for dest, extra in exits:
        fst.add_arc(cur, Arc(il, ol, cost + extra, dest))


def _prons_with_ids(lexiconp: Lexiconp):
    phone2id = lexiconp.phone2id
    word2id = lexiconp.word2id
    for word, prob, phones in lexiconp:
        ids = [phone2id[p] for p in phones.split()]
        yield ids, word2id[word], -math.log(float(prob))


def make_lexicon_fst_with_silence(
    lexiconp: Lexiconp,
    sil_prob: float = 0.5,
    sil_phone: str = "SIL",
    sil_disambig: Optional[int] = None,
) -> VectorFst:
    """3-state optional-silence L: every word may be followed by silence
    with probability ``sil_prob``; an utterance may start with silence
    likewise.  ``sil_disambig`` inserts the silence disambiguation symbol
    after the silence phone (needed when silence is also a word)."""
    assert sil_phone in lexiconp.phone2id
    sil_cost = -math.log(sil_prob)
    cont_cost = -math.log(1.0 - sil_prob)

    fst = VectorFst()
    start = fst.add_state()
    home = fst.add_state()   # the word-loop state
    sil = fst.add_state()    # pre-silence-phone state
    fst.set_start(start)
    fst.set_final(home, 0.0)

    fst.add_arc(start, Arc(0, 0, cont_cost, home))
    fst.add_arc(start, Arc(0, 0, sil_cost, sil))

    sil_phone_id = lexiconp.phone2id[sil_phone]
    if sil_disambig is None:
        fst.add_arc(sil, Arc(sil_phone_id, 0, 0.0, home))
    else:
        mid = fst.add_state()
        fst.add_arc(sil, Arc(sil_phone_id, 0, 0.0, mid))
        fst.add_arc(mid, Arc(sil_disambig, 0, 0.0, home))

    exits = ((home, cont_cost), (sil, sil_cost))
    for phone_ids, word_id, pron_cost in _prons_with_ids(lexiconp):
        _emit_pron(fst, home, _pron_schedule(phone_ids, word_id, pron_cost),
                   exits)
    return fst


def make_lexicon_fst_no_silence(lexiconp: Lexiconp) -> VectorFst:
    """Single-state word loop with no optional silence."""
    fst = VectorFst()
    home = fst.add_state()
    fst.set_start(home)
    fst.set_final(home, 0.0)
    for phone_ids, word_id, pron_cost in _prons_with_ids(lexiconp):
        _emit_pron(fst, home, _pron_schedule(phone_ids, word_id, pron_cost),
                   ((home, 0.0),))
    return fst
