"""Lexicon / pronunciation-probability lexicon and symbol tables.

Host-side language preparation.  The OUTPUT contracts — phone/word
symbol-id conventions (<eps> first, SIL hoisted second when present,
disambig symbols #0..#N last for phones; words sorted with <eps> first
and #0, <s>, </s> appended) and the disambiguation-marker assignment —
must hold exactly, since those ids leak into training graphs and
alignments (pinned by tests/test_reference_parity.py and the graph
tests).  Contract per /root/reference/scripts/prepare_lang.py:66-324;
the internals here are record-based (a flat pronunciation list + a
prefix-set pass) rather than the reference's per-word dict machinery.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Tuple


@dataclass(frozen=True)
class Pron:
    """One pronunciation entry, in input order."""

    word: str
    prob: str          # kept as the original text token (e.g. "1.0")
    phones: Tuple[str, ...]

    @property
    def phones_str(self) -> str:
        return " ".join(self.phones)


def _parse_lines(text: str, min_fields: int) -> Iterator[List[str]]:
    for line in text.splitlines():
        fields = line.strip().split()
        if not fields:
            continue
        assert len(fields) >= min_fields, (fields, line)
        yield fields


def _group_by_word(entries, word_of):
    """Stable-group entries so each word's pronunciations are contiguous,
    words ordered by first appearance (the iteration order contract)."""
    order: Dict[str, int] = {}
    for e in entries:
        order.setdefault(word_of(e), len(order))
    return sorted(entries, key=lambda e: order[word_of(e)])


class Lexicon:
    """word -> pronunciations (each a space-joined phone string)."""

    def __init__(
        self,
        lexicon_txt: Optional[str] = None,
        word2phones: Optional[Dict[str, List[str]]] = None,
    ):
        self._prons: List[Tuple[str, str]] = []
        if word2phones is not None:
            for word, pron_list in word2phones.items():
                for phones in pron_list:
                    self._prons.append((word, phones))
        else:
            with open(lexicon_txt, encoding="utf-8") as f:
                for fields in _parse_lines(f.read(), 2):
                    self._prons.append((fields[0], " ".join(fields[1:])))
            self._prons = _group_by_word(self._prons, lambda e: e[0])

    @property
    def word2phones(self) -> Dict[str, List[str]]:
        out: Dict[str, List[str]] = {}
        for word, phones in self._prons:
            out.setdefault(word, []).append(phones)
        return out

    def __iter__(self) -> Iterator[Tuple[str, str]]:
        return iter(self._prons)

    @staticmethod
    def from_lexiconp(lexiconp: "Lexiconp") -> "Lexicon":
        out = Lexicon(word2phones={})
        out._prons = [(p.word, p.phones_str) for p in lexiconp.prons]
        return out


class Lexiconp:
    """word -> (pronunciation probability, pronunciation) entries."""

    def __init__(
        self,
        lexiconp_txt: Optional[str] = None,
        word2prob_phones: Optional[dict] = None,
        prons: Optional[Sequence[Pron]] = None,
        num_disambig: int = 0,
    ):
        self._num_disambig = num_disambig
        if prons is not None:
            self.prons = list(prons)
        elif word2prob_phones is not None:
            self.prons = [
                Pron(word, str(prob), tuple(phones.split()))
                for word, entries in word2prob_phones.items()
                for prob, phones in entries
            ]
        else:
            with open(lexiconp_txt, encoding="utf-8") as f:
                self.prons = [
                    Pron(fs[0], fs[1], tuple(fs[2:]))
                    for fs in _parse_lines(f.read(), 3)
                ]
            self.prons = _group_by_word(self.prons, lambda p: p.word)

    @property
    def word2prob_phones(self) -> dict:
        out: dict = {}
        for p in self.prons:
            out.setdefault(p.word, []).append([p.prob, p.phones_str])
        return out

    def __iter__(self) -> Iterator[Tuple[str, str, str]]:
        for p in self.prons:
            yield p.word, p.prob, p.phones_str

    @staticmethod
    def from_lexicon(lexicon: Lexicon) -> "Lexiconp":
        return Lexiconp(
            prons=[
                Pron(word, "1.0", tuple(phones.split()))
                for word, phones in lexicon
            ]
        )

    # ------------------------------------------------------------- disambig

    def add_lex_disambig(self) -> "Lexiconp":
        """Return a copy with #N markers appended to ambiguous prons.

        A pronunciation needs a marker iff it occurs more than once OR is
        a proper prefix of another pronunciation; repeated occurrences of
        the same pronunciation get successive markers.  #0 is reserved
        for the LM backoff symbol, so numbering starts at #1.
        """
        occurrences = Counter(p.phones for p in self.prons)
        prefixes = {
            p.phones[:k] for p in self.prons for k in range(1, len(p.phones))
        }

        next_marker: Dict[Tuple[str, ...], int] = {}
        highest = 0
        marked: List[Pron] = []
        for p in self.prons:
            assert p.phones, p
            if occurrences[p.phones] == 1 and p.phones not in prefixes:
                marked.append(p)
                continue
            n = next_marker.get(p.phones, 1)
            next_marker[p.phones] = n + 1
            highest = max(highest, n)
            marked.append(Pron(p.word, p.prob, p.phones + (f"#{n}",)))
        return Lexiconp(prons=marked, num_disambig=highest)

    @property
    def max_disambig(self) -> int:
        return self._num_disambig

    # --------------------------------------------------------- symbol tables

    def _build_tables(self) -> None:
        # phones: <eps>, then SIL (if present), then the rest sorted, then
        # the #0..#max+1 disambiguation symbols
        bare = {ph for p in self.prons for ph in p.phones
                if not ph.startswith("#")}
        ordered = ["<eps>"]
        if "SIL" in bare:
            ordered.append("SIL")
        ordered += sorted(bare - {"SIL"})
        ordered += [f"#{i}" for i in range(self.max_disambig + 2)]
        self._phone_table = ordered
        # words: <eps>, sorted vocabulary, then #0 <s> </s>
        self._word_table = (
            ["<eps>"]
            + sorted({p.word for p in self.prons})
            + ["#0", "<s>", "</s>"]
        )

    @property
    def phone2id(self) -> Dict[str, int]:
        if not hasattr(self, "_phone_table"):
            self._build_tables()
        return {p: i for i, p in enumerate(self._phone_table)}

    @property
    def id2phone(self) -> Dict[int, str]:
        if not hasattr(self, "_phone_table"):
            self._build_tables()
        return dict(enumerate(self._phone_table))

    @property
    def word2id(self) -> Dict[str, int]:
        if not hasattr(self, "_word_table"):
            self._build_tables()
        return {w: i for i, w in enumerate(self._word_table)}

    @property
    def id2word(self) -> Dict[int, str]:
        if not hasattr(self, "_word_table"):
            self._build_tables()
        return dict(enumerate(self._word_table))

    def get_non_sil_phone_ids(self, sil_phone: str = "SIL") -> List[int]:
        return [
            i for p, i in self.phone2id.items()
            if p not in ("<eps>", sil_phone) and not p.startswith("#")
        ]

    def get_sil_phone_id(self, sil_phone: str = "SIL") -> int:
        return self.phone2id[sil_phone]

    def disambig_phone_ids(self) -> List[int]:
        """Ids of #0..#max_disambig (the symbols used on the L side)."""
        return [self.phone2id[f"#{i}"] for i in range(self.max_disambig + 1)]
