"""Lexicon / pronunciation-probability lexicon and symbol tables.

Host-side language preparation.  The phone/word symbol-id conventions
(<eps> first, SIL second when present, disambig symbols #0..#N last for
phones; words sorted with <eps> first and #0, <s>, </s> appended) must be
reproduced exactly since those ids leak into training graphs and
alignments.

Reference semantics: /root/reference/scripts/prepare_lang.py:66-324.
"""

from __future__ import annotations

import copy
from collections import defaultdict
from typing import Dict, Iterator, List, Optional, Tuple


class Lexicon:
    """word -> list of pronunciations (each a space-joined phone string)."""

    def __init__(
        self,
        lexicon_txt: Optional[str] = None,
        word2phones: Optional[Dict[str, List[str]]] = None,
    ):
        if word2phones is not None:
            self.word2phones = copy.deepcopy(word2phones)
            return
        word2phones = defaultdict(list)
        with open(lexicon_txt, encoding="utf-8") as f:
            for line in f:
                fields = line.strip().split()
                if not fields:
                    continue
                assert len(fields) >= 2, (fields, line)
                word2phones[fields[0]].append(" ".join(fields[1:]))
        self.word2phones = dict(word2phones)

    def __iter__(self) -> Iterator[Tuple[str, str]]:
        for word, phones_list in self.word2phones.items():
            for phones in phones_list:
                yield word, phones

    @staticmethod
    def from_lexiconp(lexiconp: "Lexiconp") -> "Lexicon":
        word2phones = defaultdict(list)
        for word, _, phones in lexiconp:
            word2phones[word].append(phones)
        return Lexicon(word2phones=dict(word2phones))


class Lexiconp:
    """word -> list of (prob, pronunciation)."""

    def __init__(
        self,
        lexiconp_txt: Optional[str] = None,
        word2prob_phones: Optional[dict] = None,
    ):
        if word2prob_phones is not None:
            self.word2prob_phones = copy.deepcopy(word2prob_phones)
            return
        word2prob_phones = defaultdict(list)
        with open(lexiconp_txt, encoding="utf-8") as f:
            for line in f:
                fields = line.strip().split()
                if not fields:
                    continue
                assert len(fields) >= 3, (fields, line)
                word2prob_phones[fields[0]].append([fields[1], " ".join(fields[2:])])
        self.word2prob_phones = dict(word2prob_phones)

    def __iter__(self) -> Iterator[Tuple[str, str, str]]:
        for word, prob_phones_list in self.word2prob_phones.items():
            for prob, phones in prob_phones_list:
                yield word, prob, phones

    @staticmethod
    def from_lexicon(lexicon: Lexicon) -> "Lexiconp":
        word2prob_phones = defaultdict(list)
        for word, phones in lexicon:
            word2prob_phones[word].append(["1.0", phones])
        return Lexiconp(word2prob_phones=dict(word2prob_phones))

    # ------------------------------------------------------------- disambig

    def add_lex_disambig(self) -> "Lexiconp":
        """Append #N disambiguation symbols to ambiguous/prefix prons.

        A pronunciation needs a disambig symbol if it occurs more than once
        or is a prefix of another pronunciation.  #1 is the first symbol we
        may use (#0 is reserved for the LM backoff).
        """
        count = defaultdict(int)
        for _, _, phones in self:
            count[phones] += 1

        issubseq = defaultdict(int)
        for _, _, phones in self:
            parts = phones.split()
            parts.pop()
            while parts:
                issubseq[" ".join(parts)] = 1
                parts.pop()

        first_allowed_disambig = 1
        max_disambig = first_allowed_disambig - 1
        last_used = defaultdict(int)
        out = defaultdict(list)
        for word, prob, phones in self:
            assert phones != ""
            if issubseq[phones] == 0 and count[phones] == 1:
                out[word].append([prob, phones])
                continue
            cur = last_used[phones]
            cur = first_allowed_disambig if cur == 0 else cur + 1
            max_disambig = max(max_disambig, cur)
            last_used[phones] = cur
            out[word].append([prob, phones + f" #{cur}"])

        ans = Lexiconp(word2prob_phones=dict(out))
        ans._max_disambig = max_disambig
        return ans

    @property
    def max_disambig(self) -> int:
        return getattr(self, "_max_disambig", 0)

    # --------------------------------------------------------- symbol tables

    @property
    def phone2id(self) -> Dict[str, int]:
        if hasattr(self, "_phone2id"):
            return self._phone2id
        phone_set = set()
        for _, _, phones in self:
            phone_set.update(phones.split())
        kept = sorted(p for p in phone_set if p[0] != "#")
        has_sil = "SIL" in kept
        if has_sil:
            kept.remove("SIL")
        kept.insert(0, "<eps>")
        if has_sil:
            kept.insert(1, "SIL")
        for i in range(self.max_disambig + 2):
            kept.append(f"#{i}")
        self._phone2id = {p: i for i, p in enumerate(kept)}
        self._id2phone = {i: p for i, p in enumerate(kept)}
        return self._phone2id

    @property
    def id2phone(self) -> Dict[int, str]:
        _ = self.phone2id
        return self._id2phone

    @property
    def word2id(self) -> Dict[str, int]:
        if hasattr(self, "_word2id"):
            return self._word2id
        words = sorted(self.word2prob_phones.keys())
        words.insert(0, "<eps>")
        words.append("#0")
        words.append("<s>")
        words.append("</s>")
        self._word2id = {w: i for i, w in enumerate(words)}
        self._id2word = {i: w for i, w in enumerate(words)}
        return self._word2id

    @property
    def id2word(self) -> Dict[int, str]:
        _ = self.word2id
        return self._id2word

    def get_non_sil_phone_ids(self, sil_phone: str = "SIL") -> List[int]:
        skip = ("<eps>", sil_phone)
        return [
            i
            for p, i in self.phone2id.items()
            if p not in skip and p[0] != "#"
        ]

    def get_sil_phone_id(self, sil_phone: str = "SIL") -> int:
        return self.phone2id[sil_phone]

    def disambig_phone_ids(self) -> List[int]:
        """Ids of #0..#max_disambig (the symbols used on the L side)."""
        return [self.phone2id[f"#{i}"] for i in range(self.max_disambig + 1)]
