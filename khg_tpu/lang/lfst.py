"""Lexicon FST (L) construction.

Builds the 3-state optional-silence L transducer (phones -> words) and the
no-silence variant, with the exact state/arc layout and costs of the
reference (so composed graph weights agree).

Reference semantics: /root/reference/scripts/prepare_lang.py:329-511.
"""

from __future__ import annotations

import math
from typing import Optional

from khg_tpu.fstlib.fst import Arc, VectorFst
from khg_tpu.lang.lexicon import Lexiconp


def make_lexicon_fst_with_silence(
    lexiconp: Lexiconp,
    sil_prob: float = 0.5,
    sil_phone: str = "SIL",
    sil_disambig: Optional[int] = None,
) -> VectorFst:
    phone2id = lexiconp.phone2id
    word2id = lexiconp.word2id
    assert sil_phone in phone2id

    sil_cost = -math.log(sil_prob)
    no_sil_cost = -math.log(1.0 - sil_prob)

    fst = VectorFst()
    start_state = fst.add_state()
    loop_state = fst.add_state()
    sil_state = fst.add_state()
    fst.set_start(start_state)
    fst.set_final(loop_state, 0.0)

    fst.add_arc(start_state, Arc(0, 0, no_sil_cost, loop_state))
    fst.add_arc(start_state, Arc(0, 0, sil_cost, sil_state))

    if sil_disambig is None:
        fst.add_arc(sil_state, Arc(phone2id[sil_phone], 0, 0.0, loop_state))
    else:
        sil_disambig_state = fst.add_state()
        fst.add_arc(sil_state, Arc(phone2id[sil_phone], 0, 0.0, sil_disambig_state))
        fst.add_arc(sil_disambig_state, Arc(sil_disambig, 0, 0.0, loop_state))

    for word, prob, phones in lexiconp:
        phoneseq = phones.split()
        pron_cost = -math.log(float(prob))
        cur_state = loop_state
        for i in range(len(phoneseq) - 1):
            next_state = fst.add_state()
            fst.add_arc(
                cur_state,
                Arc(
                    phone2id[phoneseq[i]],
                    word2id[word] if i == 0 else 0,
                    pron_cost if i == 0 else 0.0,
                    next_state,
                ),
            )
            cur_state = next_state
        i = len(phoneseq) - 1  # -1 if empty pronunciation
        fst.add_arc(
            cur_state,
            Arc(
                phone2id[phoneseq[i]] if i >= 0 else 0,
                word2id[word] if i <= 0 else 0,
                no_sil_cost + (pron_cost if i <= 0 else 0.0),
                loop_state,
            ),
        )
        fst.add_arc(
            cur_state,
            Arc(
                phone2id[phoneseq[i]] if i >= 0 else 0,
                word2id[word] if i <= 0 else 0,
                sil_cost + (pron_cost if i <= 0 else 0.0),
                sil_state,
            ),
        )
    return fst


def make_lexicon_fst_no_silence(lexiconp: Lexiconp) -> VectorFst:
    phone2id = lexiconp.phone2id
    word2id = lexiconp.word2id

    fst = VectorFst()
    start_state = fst.add_state()
    fst.set_start(start_state)
    fst.set_final(start_state, 0.0)

    for word, prob, phones in lexiconp:
        phoneseq = phones.split()
        pron_cost = -math.log(float(prob))
        cur_state = start_state
        for i in range(len(phoneseq) - 1):
            next_state = fst.add_state()
            fst.add_arc(
                cur_state,
                Arc(
                    phone2id[phoneseq[i]],
                    word2id[word] if i == 0 else 0,
                    pron_cost if i == 0 else 0.0,
                    next_state,
                ),
            )
            cur_state = next_state
        i = len(phoneseq) - 1
        fst.add_arc(
            cur_state,
            Arc(
                phone2id[phoneseq[i]] if i >= 0 else 0,
                word2id[word] if i <= 0 else 0,
                pron_cost if i <= 0 else 0.0,
                start_state,
            ),
        )
    return fst
