"""Delta / delta-delta features (Kaldi DeltaFeatures semantics).

Regression-window deltas per kaldi/src/feat/feature-functions.cc
(DeltaFeaturesOptions order=2 window=2; scales built recursively, each
order convolving the previous order's taps with the normalized ramp
[-w..w]/sum(j^2); frame indices clamped to [0, T-1] at the edges).

TPU-first shape: the taps are tiny static kernels (9 taps at
order=2/window=2), so each output order is a sum of statically shifted
copies of an edge-replicated pad of the input — pure slices and adds
that XLA fuses into one elementwise pass; no gathers, no convolution
primitive, batch-shape agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DeltaConfig:
    order: int = 2
    window: int = 2  # taps per side per order


def delta_scales(cfg: DeltaConfig) -> List[np.ndarray]:
    """Per-order tap vectors, scales[o] has length 2*o*window + 1
    (centered).  Mirrors DeltaFeatures::DeltaFeatures exactly."""
    scales = [np.array([1.0], dtype=np.float64)]
    for _ in range(cfg.order):
        prev = scales[-1]
        prev_offset = (len(prev) - 1) // 2
        cur_offset = prev_offset + cfg.window
        cur = np.zeros(len(prev) + 2 * cfg.window, dtype=np.float64)
        normalizer = 0.0
        for j in range(-cfg.window, cfg.window + 1):
            normalizer += j * j
            if j != 0:
                for k in range(-prev_offset, prev_offset + 1):
                    cur[j + k + cur_offset] += j * prev[k + prev_offset]
        cur /= normalizer
        scales.append(cur)
    return scales


def add_deltas(
    feats: jnp.ndarray, cfg: DeltaConfig = DeltaConfig()
) -> jnp.ndarray:
    """(..., T, D) -> (..., T, D * (order + 1)): base features with the
    delta orders appended along the feature axis."""
    scales = delta_scales(cfg)
    max_offset = cfg.order * cfg.window
    t_axis = feats.ndim - 2
    pad = [(0, 0)] * feats.ndim
    pad[t_axis] = (max_offset, max_offset)
    padded = jnp.pad(feats, pad, mode="edge")
    T = feats.shape[t_axis]

    outs = []
    for taps in scales:
        offset = (len(taps) - 1) // 2
        acc = None
        for j, w in enumerate(taps):
            if w == 0.0:
                continue
            start = max_offset - offset + j
            sl = [slice(None)] * feats.ndim
            sl[t_axis] = slice(start, start + T)
            term = jnp.float32(w) * padded[tuple(sl)]
            acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)
