"""GMM update-flag bitmask and helpers.

Reference semantics: /root/reference/kaldi-hmm-gmm/csrc/model-common.h:18-26,
model-common.cc:74-150.
"""

import logging

logger = logging.getLogger(__name__)

GMM_MEANS = 0x001  # "m"
GMM_VARIANCES = 0x002  # "v"
GMM_WEIGHTS = 0x004  # "w"
GMM_TRANSITIONS = 0x008  # "t"
GMM_ALL = GMM_MEANS | GMM_VARIANCES | GMM_WEIGHTS | GMM_TRANSITIONS


def str_to_gmm_flags(s: str) -> int:
    flags = 0
    for c in s:
        if c == "m":
            flags |= GMM_MEANS
        elif c == "v":
            flags |= GMM_VARIANCES
        elif c == "w":
            flags |= GMM_WEIGHTS
        elif c == "t":
            flags |= GMM_TRANSITIONS
        elif c == "a":
            flags |= GMM_ALL
        else:
            raise ValueError(f"Invalid GMM flag character {c!r} in {s!r}")
    return flags


def gmm_flags_to_str(flags: int) -> str:
    ans = ""
    if flags & GMM_MEANS:
        ans += "m"
    if flags & GMM_VARIANCES:
        ans += "v"
    if flags & GMM_WEIGHTS:
        ans += "w"
    if flags & GMM_TRANSITIONS:
        ans += "t"
    return ans


def augment_gmm_flags(flags: int) -> int:
    """Variances imply means imply weights (stat-shape consistency)."""
    assert (flags & ~GMM_ALL) == 0
    if flags & GMM_VARIANCES:
        flags |= GMM_MEANS
    if flags & GMM_MEANS:
        flags |= GMM_WEIGHTS
    if not (flags & GMM_WEIGHTS):
        logger.warning("Adding in weights flag to empty flags")
        flags |= GMM_WEIGHTS
    return flags
