"""WER scoring: Levenshtein alignment + error statistics.

Produces the same per-corpus and per-word statistics as the reference's
write_error_stats (/root/reference/scripts/utils.py:7-165) with an
internal aligner instead of kaldialign.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence, TextIO, Tuple

ERR = "*"


def levenshtein_align(
    ref: Sequence[str], hyp: Sequence[str], gap: str = ERR
) -> List[Tuple[str, str]]:
    """Minimum-edit alignment of two sequences as (ref, hyp) pairs with
    ``gap`` marking insertions/deletions (sub cost 1, ins/del cost 1)."""
    n, m = len(ref), len(hyp)
    # DP over costs with backpointers
    cost = [[0] * (m + 1) for _ in range(n + 1)]
    back = [[0] * (m + 1) for _ in range(n + 1)]  # 0 diag, 1 up(del), 2 left(ins)
    for i in range(1, n + 1):
        cost[i][0] = i
        back[i][0] = 1
    for j in range(1, m + 1):
        cost[0][j] = j
        back[0][j] = 2
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            sub = cost[i - 1][j - 1] + (ref[i - 1] != hyp[j - 1])
            dele = cost[i - 1][j] + 1
            ins = cost[i][j - 1] + 1
            best = min(sub, dele, ins)
            cost[i][j] = best
            back[i][j] = 0 if best == sub else (1 if best == dele else 2)
    out: List[Tuple[str, str]] = []
    i, j = n, m
    while i > 0 or j > 0:
        b = back[i][j]
        if b == 0 and i > 0 and j > 0:
            out.append((ref[i - 1], hyp[j - 1]))
            i -= 1
            j -= 1
        elif b == 1 and i > 0:
            out.append((ref[i - 1], gap))
            i -= 1
        else:
            out.append((gap, hyp[j - 1]))
            j -= 1
    return out[::-1]


def write_error_stats(
    f: TextIO,
    test_set_name: str,
    results: List[Tuple[str, List[str], List[str]]],
    enable_log: bool = True,
) -> float:
    """Write WER and error breakdowns; returns the WER in percent."""
    subs: Dict[Tuple[str, str], int] = defaultdict(int)
    ins: Dict[str, int] = defaultdict(int)
    dels: Dict[str, int] = defaultdict(int)
    words: Dict[str, List[int]] = defaultdict(lambda: [0, 0, 0, 0, 0])
    num_corr = 0
    for cut_id, ref, hyp in results:
        for ref_word, hyp_word in levenshtein_align(ref, hyp):
            if ref_word == ERR:
                ins[hyp_word] += 1
                words[hyp_word][3] += 1
            elif hyp_word == ERR:
                dels[ref_word] += 1
                words[ref_word][4] += 1
            elif hyp_word != ref_word:
                subs[(ref_word, hyp_word)] += 1
                words[ref_word][1] += 1
                words[hyp_word][2] += 1
            else:
                words[ref_word][0] += 1
                num_corr += 1
    ref_len = sum(len(r) for _, r, _ in results)
    sub_errs = sum(subs.values())
    ins_errs = sum(ins.values())
    del_errs = sum(dels.values())
    tot_errs = sub_errs + ins_errs + del_errs
    wer = 100.0 * tot_errs / max(ref_len, 1)

    msg = (
        f"[{test_set_name}] %WER {wer:.2f}% "
        f"[{tot_errs} / {ref_len}, {ins_errs} ins, "
        f"{del_errs} del, {sub_errs} sub ]"
    )
    if enable_log:
        print(msg)
    print(msg, file=f)
    print(
        f"Errors: {ins_errs} insertions, {del_errs} deletions, "
        f"{sub_errs} substitutions, over {ref_len} reference words "
        f"({num_corr} correct)",
        file=f,
    )

    print("PER-UTT DETAILS: corr or (ref->hyp)", file=f)
    for cut_id, ref, hyp in results:
        ali = levenshtein_align(ref, hyp)
        parts = []
        for r, h in ali:
            parts.append(r if r == h else f"({r}->{h})")
        print(f"{cut_id}:\t" + " ".join(parts), file=f)

    print("SUBSTITUTIONS: count ref -> hyp", file=f)
    for count, (r, h) in sorted(
        ((c, k) for k, c in subs.items()), reverse=True
    ):
        print(f"{count}   {r} -> {h}", file=f)
    print("DELETIONS: count ref", file=f)
    for count, r in sorted(((c, k) for k, c in dels.items()), reverse=True):
        print(f"{count}   {r}", file=f)
    print("INSERTIONS: count hyp", file=f)
    for count, h in sorted(((c, k) for k, c in ins.items()), reverse=True):
        print(f"{count}   {h}", file=f)

    print("PER-WORD STATS: word corr tot_errs count_in_ref count_in_hyp", file=f)
    for _, word, counts in sorted(
        ((sum(v[1:]), k, v) for k, v in words.items()), reverse=True
    ):
        corr, ref_sub, hyp_sub, w_ins, w_del = counts
        tot_err = ref_sub + hyp_sub + w_ins + w_del
        ref_count = corr + ref_sub + w_del
        hyp_count = corr + hyp_sub + w_ins
        print(f"{word}   {corr}   {tot_err}   {ref_count}   {hyp_count}", file=f)
    return wer
