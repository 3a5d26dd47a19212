"""Small scalar math helpers shared across the host-side code.

Device-side math uses jax.numpy directly (jax.nn.logsumexp etc.); these
helpers exist for host-side graph weights and parity tests.

Reference semantics: /root/reference/kaldi-hmm-gmm/csrc/kaldi-math.h:60-110.
"""

import math

M_LOG_2PI = 1.8378770664093454835606594728112

LOG_ZERO = -math.inf


def log_add(a: float, b: float) -> float:
    """log(exp(a) + exp(b)) computed stably."""
    if a < b:
        a, b = b, a
    if b == -math.inf:
        return a
    diff = b - a
    return a + math.log1p(math.exp(diff))


def approx_equal(a: float, b: float, relative_tolerance: float = 0.001) -> bool:
    return abs(a - b) <= relative_tolerance * (abs(a) + abs(b))
