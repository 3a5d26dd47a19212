"""Formant-style waveform synthesis for recipe corpora.

With no network access, recipe audio is synthesized: each grapheme-phone
gets a distinct acoustic recipe (harmonic vowel formants, shaped
fricative noise, nasal murmurs, stop bursts) with per-token pitch,
duration, and formant jitter, so the fbank frontend, flat-start EM,
realignment, and decoding all face realistic, genuinely time-varying
spectra.  Words are synthesized from their character-level
pronunciations — the same lexicon convention the AudioMNIST recipe uses
(/root/reference/scripts/generate_lexicon.py).

Not a TTS system: the goal is acoustically distinct, HMM-learnable
phone classes in the 4 kHz band, not intelligibility.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np

SAMPLE_RATE = 8000


def harmonic(
    dur: float,
    f0: float,
    formants: Sequence[Tuple[float, float]],
    rng: np.random.Generator,
    rate: int = SAMPLE_RATE,
    glide: float = 0.0,
    amp: float = 1.0,
) -> np.ndarray:
    """Voiced segment: sum of harmonics shaped by a formant envelope."""
    n = max(int(dur * rate), 1)
    t = np.arange(n) / rate
    f0_t = f0 * (1.0 + 0.01 * np.sin(2 * np.pi * 4.5 * t + rng.uniform(0, 6)))
    phase = 2 * np.pi * np.cumsum(f0_t) / rate
    drift = 1.0 + glide * (t / max(dur, 1e-6))
    wave = np.zeros(n)
    for h in range(1, int((rate / 2 - 100) / f0) + 1):
        freq = h * f0
        a = 0.0
        for fc, bw in formants:
            a = a + np.exp(-0.5 * ((freq - fc * drift) / bw) ** 2)
        wave += np.mean(a) * np.sin(h * phase) / math.sqrt(h)
    env = np.clip(np.minimum(t / 0.015, (dur - t) / 0.03), 0.0, 1.0)
    return amp * wave * env


def noise_band(
    dur: float,
    band: Tuple[float, float],
    rng: np.random.Generator,
    rate: int = SAMPLE_RATE,
    amp: float = 1.0,
) -> np.ndarray:
    """Band-shaped noise (fricatives, bursts), DFT-domain filtered."""
    n = max(int(dur * rate), 8)
    spec = np.fft.rfft(rng.standard_normal(n))
    freqs = np.fft.rfftfreq(n, 1.0 / rate)
    lo, hi = band
    gain = np.exp(-0.5 * ((freqs - (lo + hi) / 2) / ((hi - lo) / 2)) ** 2)
    shaped = np.fft.irfft(spec * gain, n)
    env = np.clip(np.arange(n) / (0.008 * rate), 0.0, 1.0)
    return amp * shaped / (np.std(shaped) + 1e-9) * env


def silence(dur: float, rng: np.random.Generator,
            rate: int = SAMPLE_RATE) -> np.ndarray:
    return rng.standard_normal(max(int(dur * rate), 1)) * 0.002


# per-grapheme acoustic recipes: kind, params, base duration (s).
# Formant centers spread across the F1/F2 plane; fricative bands across
# the 1.5-4 kHz range — every pair of phones differs in >= one of
# (excitation type, band/formant placement, amplitude).
_RECIPES: Dict[str, Tuple] = {
    # vowels (harmonic: (F1, F2), glide)
    "A": ("v", ((750, 110), (1250, 160)), 0.0, 0.16),
    "E": ("v", ((550, 90), (1900, 180)), 0.0, 0.15),
    "I": ("v", ((300, 70), (2300, 220)), 0.0, 0.14),
    "O": ("v", ((500, 85), (850, 120)), -0.12, 0.16),
    "U": ("v", ((350, 70), (950, 130)), 0.0, 0.14),
    # sonorants
    "R": ("v", ((450, 90), (1350, 200)), 0.18, 0.12),
    "W": ("v", ((400, 80), (700, 120)), 0.35, 0.10),
    "Y": ("v", ((300, 80), (2150, 220)), -0.15, 0.10),
    "L": ("v", ((380, 80), (1050, 150)), 0.1, 0.11),
    # nasals (low, muffled)
    "N": ("n", ((250, 60), (1100, 350)), 0.0, 0.10),
    "M": ("n", ((230, 60), (900, 300)), 0.0, 0.10),
    # fricatives (band lo, hi, amp)
    "S": ("f", (3000.0, 3900.0), 0.8, 0.13),
    "Z": ("f", (2300.0, 3500.0), 0.55, 0.13),
    "F": ("f", (3400.0, 3950.0), 0.3, 0.11),
    "V": ("f", (2700.0, 3500.0), 0.35, 0.10),
    "H": ("f", (600.0, 2400.0), 0.25, 0.09),
    "X": ("f", (1900.0, 3000.0), 0.6, 0.12),
    # stops (gap + burst band)
    "T": ("t", (2600.0, 3900.0), 0.6, 0.09),
    "G": ("t", (1400.0, 2400.0), 0.5, 0.09),
}


def synthesize_phone(
    phone: str, rng: np.random.Generator, rate: int = SAMPLE_RATE
) -> np.ndarray:
    if phone not in _RECIPES:
        raise KeyError(f"no acoustic recipe for phone {phone!r}")
    kind, spec, extra, dur0 = _RECIPES[phone]
    dur = dur0 * rng.uniform(0.8, 1.25)
    j = rng.uniform(0.92, 1.08)
    if kind == "v":
        f0 = rng.uniform(95.0, 150.0)
        fmts = [(fc * j, bw) for fc, bw in spec]
        return harmonic(dur, f0, fmts, rng, rate, glide=extra)
    if kind == "n":
        f0 = rng.uniform(95.0, 150.0)
        fmts = [(fc * j, bw) for fc, bw in spec]
        return harmonic(dur, f0, fmts, rng, rate) * 0.45
    if kind == "f":
        lo, hi = spec
        return noise_band(dur, (lo * j, hi * j), rng, rate, amp=extra * 0.4)
    if kind == "t":  # closure gap then burst
        lo, hi = spec
        gap = silence(rng.uniform(0.03, 0.05), rng, rate)
        burst = noise_band(
            rng.uniform(0.03, 0.05), (lo * j, hi * j), rng, rate,
            amp=extra * 0.5,
        )
        return np.concatenate([gap, burst])
    raise AssertionError(kind)


def synthesize_spelled_word(
    word: str, rng: np.random.Generator, rate: int = SAMPLE_RATE
) -> np.ndarray:
    """Concatenate the word's letter-phones, peak-normalized to ~0.3."""
    parts = [synthesize_phone(c, rng, rate) for c in word]
    w = np.concatenate(parts)
    return (w / (np.max(np.abs(w)) + 1e-9) * 0.3).astype(np.float32)


def synthesize_word_sequence(
    words: Sequence[str],
    rng: np.random.Generator,
    rate: int = SAMPLE_RATE,
    level: float = 20000.0,
) -> np.ndarray:
    """Spelled words separated/book-ended by silence, int16 scale."""
    parts: List[np.ndarray] = [silence(rng.uniform(0.25, 0.45), rng, rate)]
    for w in words:
        parts.append(synthesize_spelled_word(w, rng, rate))
        parts.append(silence(rng.uniform(0.15, 0.35), rng, rate))
    return np.concatenate(parts).astype(np.float32) * level
