"""Decision-tree event maps.

A host-side map from sorted (key, value) event lists to integer answers
(pdf-ids).  Only the subset the reference framework ships is needed:
constant leaves, table splits, and binary value-set splits, plus the
monophone stub-tree builder.

Reference semantics: /root/reference/kaldi-hmm-gmm/csrc/event-map.h:81-382,
event-map.cc, build-tree-utils.cc:18-121.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

K_PDF_CLASS = -1  # event key used for the pdf-class (position in HMM)

EventType = List[Tuple[int, int]]  # sorted list of (key, value)


def lookup_event(event: EventType, key: int) -> Optional[int]:
    for k, v in event:
        if k == key:
            return v
    return None


class EventMap:
    def map(self, event: EventType) -> Optional[int]:
        raise NotImplementedError

    def multi_map(self, event: EventType, out: List[int]) -> None:
        """Append all answers reachable given a possibly-partial event."""
        raise NotImplementedError

    def max_result(self) -> int:
        raise NotImplementedError

    def map_values(
        self, keys_to_map: set, value_map: Dict[int, int]
    ) -> "EventMap":
        """Copy with the VALUES of the given keys remapped (event-map.h
        MapValues) — used when renumbering phones."""
        raise NotImplementedError

    def prune(self) -> Optional["EventMap"]:
        """Copy with -1-answer leaves removed; None if everything pruned
        (event-map.h Prune)."""
        raise NotImplementedError


class ConstantEventMap(EventMap):
    def __init__(self, answer: int):
        self.answer = answer

    def map(self, event: EventType) -> Optional[int]:
        return self.answer

    def multi_map(self, event: EventType, out: List[int]) -> None:
        out.append(self.answer)

    def max_result(self) -> int:
        return self.answer

    def map_values(self, keys_to_map, value_map):
        return ConstantEventMap(self.answer)

    def prune(self):
        return None if self.answer < 0 else ConstantEventMap(self.answer)

    def __repr__(self):
        return f"CE({self.answer})"


class TableEventMap(EventMap):
    """Indexed split on one key; ``table`` maps value -> child EventMap."""

    def __init__(self, key: int, table: Dict[int, EventMap]):
        self.key = key
        # Dense table indexed by value, like the reference's vector form.
        size = (max(table.keys()) + 1) if table else 0
        self.table: List[Optional[EventMap]] = [None] * size
        for value, child in table.items():
            self.table[value] = child

    @staticmethod
    def from_answers(key: int, value2answer: Dict[int, int]) -> "TableEventMap":
        return TableEventMap(
            key, {v: ConstantEventMap(a) for v, a in value2answer.items()}
        )

    def map(self, event: EventType) -> Optional[int]:
        value = lookup_event(event, self.key)
        if value is None:
            return None
        if 0 <= value < len(self.table) and self.table[value] is not None:
            return self.table[value].map(event)
        return None

    def multi_map(self, event: EventType, out: List[int]) -> None:
        value = lookup_event(event, self.key)
        if value is not None:
            if 0 <= value < len(self.table) and self.table[value] is not None:
                self.table[value].multi_map(event, out)
        else:
            for child in self.table:
                if child is not None:
                    child.multi_map(event, out)

    def max_result(self) -> int:
        return max(
            (c.max_result() for c in self.table if c is not None), default=-1
        )

    def map_values(self, keys_to_map, value_map):
        table = {}
        for value, child in enumerate(self.table):
            if child is None:
                continue
            new_value = value
            if self.key in keys_to_map:
                assert value in value_map, (self.key, value)
                new_value = value_map[value]
            assert new_value not in table, "value_map not 1:1"
            table[new_value] = child.map_values(keys_to_map, value_map)
        return TableEventMap(self.key, table)

    def prune(self):
        table = {}
        for value, child in enumerate(self.table):
            if child is None:
                continue
            pruned = child.prune()
            if pruned is not None:
                table[value] = pruned
        return TableEventMap(self.key, table) if table else None

    def __repr__(self):
        return f"TE(key={self.key}, {self.table})"


class SplitEventMap(EventMap):
    """Binary split: if event[key] in yes_set -> yes branch else no branch."""

    def __init__(self, key: int, yes_set: Sequence[int], yes: EventMap, no: EventMap):
        self.key = key
        self.yes_set = frozenset(yes_set)
        self.yes = yes
        self.no = no

    def map(self, event: EventType) -> Optional[int]:
        value = lookup_event(event, self.key)
        if value is None:
            return None
        return (self.yes if value in self.yes_set else self.no).map(event)

    def multi_map(self, event: EventType, out: List[int]) -> None:
        value = lookup_event(event, self.key)
        if value is not None:
            (self.yes if value in self.yes_set else self.no).multi_map(event, out)
        else:
            self.yes.multi_map(event, out)
            self.no.multi_map(event, out)

    def max_result(self) -> int:
        return max(self.yes.max_result(), self.no.max_result())

    def map_values(self, keys_to_map, value_map):
        if self.key in keys_to_map:
            yes_set = []
            for v in self.yes_set:
                assert v in value_map, (self.key, v)
                yes_set.append(value_map[v])
        else:
            yes_set = list(self.yes_set)
        return SplitEventMap(
            self.key, yes_set,
            self.yes.map_values(keys_to_map, value_map),
            self.no.map_values(keys_to_map, value_map),
        )

    def prune(self):
        yes = self.yes.prune()
        no = self.no.prune()
        if yes is None and no is None:
            return None
        if yes is None:
            return no
        if no is None:
            return yes
        return SplitEventMap(self.key, sorted(self.yes_set), yes, no)

    def __repr__(self):
        return f"SE(key={self.key}, yes_set={sorted(self.yes_set)}, {self.yes}, {self.no})"


def get_stub_map(
    P: int,
    phone_sets: List[List[int]],
    phone2num_pdf_classes: List[int],
    share_roots: List[bool],
    num_leaves: List[int],
) -> EventMap:
    """Build the initial (pre-split) tree over phone sets.

    ``num_leaves`` is a one-element list acting as a mutable counter so the
    leaf numbering matches the reference's recursion order
    (build-tree-utils.cc:18-121) — that order defines pdf-ids.
    """
    assert phone_sets and len(share_roots) == len(phone_sets)
    all_phones = set()
    for ps in phone_sets:
        assert ps and sorted(set(ps)) == list(ps)
        for p in ps:
            assert p not in all_phones
            all_phones.add(p)

    max_set_size = max(len(ps) for ps in phone_sets)
    highest_phone = max(max(ps) for ps in phone_sets)

    if len(phone_sets) == 1:
        if share_roots[0]:
            ans = ConstantEventMap(num_leaves[0])
            num_leaves[0] += 1
            return ans
        max_len = 0
        for i, phone in enumerate(phone_sets[0]):
            length = phone2num_pdf_classes[phone]
            assert length > 0
            max_len = length if i == 0 else max(max_len, length)
        table = {}
        for pdf_class in range(max_len):
            table[pdf_class] = num_leaves[0]
            num_leaves[0] += 1
        return TableEventMap.from_answers(K_PDF_CLASS, table)

    if max_set_size == 1 and len(phone_sets) <= 2 * highest_phone:
        # Table split on the central phone: one stub per phone set.
        table: Dict[int, EventMap] = {}
        for i, ps in enumerate(phone_sets):
            stub = get_stub_map(
                P, [ps], phone2num_pdf_classes, [share_roots[i]], num_leaves
            )
            table[ps[0]] = stub
        return TableEventMap(P, table)

    # Binary split; recurse.
    half = len(phone_sets) // 2
    map1 = get_stub_map(
        P, phone_sets[:half], phone2num_pdf_classes, share_roots[:half], num_leaves
    )
    map2 = get_stub_map(
        P, phone_sets[half:], phone2num_pdf_classes, share_roots[half:], num_leaves
    )
    yes_set = sorted(p for ps in phone_sets[:half] for p in ps)
    return SplitEventMap(P, yes_set, map1, map2)
