"""MFCC features on device: DCT-II + liftering over the log-mel path.

The reference has no feature extractor of its own (it consumes lhotse
Fbank output, /root/reference/egs/yesno/local/compute_fbank_yesno.py:51-58);
MFCC semantics here follow the published Kaldi formulas
(kaldi/src/feat/feature-mfcc.cc, matrix-functions.cc ComputeDctMatrix,
mel-computations.cc ComputeLifterCoeffs):

  c = lifter * (DCT_II @ log(mel @ |X|^2));  c[0] <- log-energy if use_energy

TPU-first shape: the DCT is one more small GEMM appended to the fbank
frontend's GEMM chain (framing/DFT/mel are already MXU matmuls in
fbank.py), and liftering folds into the DCT matrix rows on the host, so
the whole cepstral stage is a single (num_bins, num_ceps) matmul with no
extra elementwise pass.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from khg_tpu.features.fbank import (
    FbankConfig,
    _fbank_impl,
    num_frames,
)


@dataclass(frozen=True)
class MfccConfig:
    """Kaldi MfccOptions analogue.  ``fbank`` carries the shared frontend
    (window/mel) settings; num_mel_bins defaults to Kaldi's 23 for MFCC.
    """

    fbank: FbankConfig = field(
        default_factory=lambda: FbankConfig(num_mel_bins=23)
    )
    num_ceps: int = 13
    use_energy: bool = True
    cepstral_lifter: float = 22.0

    def frontend_cfg(self) -> FbankConfig:
        """Fbank settings for the mel-energy stage: log mel energies,
        energy handled here (the C0 slot), power spectrum."""
        return replace(
            self.fbank, use_log_fbank=True, use_energy=self.use_energy
        )


def dct_matrix(num_rows: int, num_cols: int) -> np.ndarray:
    """(num_rows, num_cols) orthonormal DCT-II matrix, Kaldi's
    ComputeDctMatrix convention: row 0 = sqrt(1/N), row k =
    sqrt(2/N) cos(pi/N (n+0.5) k)."""
    n = np.arange(num_cols)
    k = np.arange(num_rows)[:, None]
    m = np.sqrt(2.0 / num_cols) * np.cos(
        np.pi / num_cols * (n[None, :] + 0.5) * k
    )
    m[0, :] = np.sqrt(1.0 / num_cols)
    return m.astype(np.float64)


def lifter_coeffs(num_ceps: int, q: float) -> np.ndarray:
    """Kaldi ComputeLifterCoeffs: l[i] = 1 + 0.5 Q sin(pi i / Q)."""
    i = np.arange(num_ceps, dtype=np.float64)
    return 1.0 + 0.5 * q * np.sin(math.pi * i / q)


def lifted_dct_matrix(cfg: MfccConfig) -> np.ndarray:
    """(num_mel_bins, num_ceps) host-folded transform: log-mel energies
    @ this = liftered cepstra.  Liftering is a per-row scale of the DCT
    matrix, so it costs nothing at run time."""
    m = dct_matrix(cfg.num_ceps, cfg.fbank.num_mel_bins)
    if cfg.cepstral_lifter != 0.0:
        m = m * lifter_coeffs(cfg.num_ceps, cfg.cepstral_lifter)[:, None]
    return m.T.astype(np.float32)


def _mfcc_from_logmel(
    logmel: jnp.ndarray, cfg: MfccConfig
) -> jnp.ndarray:
    """(..., T, num_mel_bins [+1 energy col]) log-mel -> (..., T, num_ceps).

    When use_energy the frontend prepended a log-energy column; it is
    split off, the DCT+lifter GEMM runs on the mel columns, and the
    energy replaces c0 (Kaldi feature-mfcc.cc:63-78 ordering: lifter
    first, then the energy overwrite — liftering does not scale the
    energy slot because lifter_coeffs[0] == 1).
    """
    energy = None
    if cfg.use_energy:
        energy = logmel[..., 0]
        logmel = logmel[..., 1:]
    feats = jnp.matmul(
        logmel,
        jnp.asarray(lifted_dct_matrix(cfg)),
        precision=jax.lax.Precision.HIGHEST,
    )
    if energy is not None:
        feats = jnp.concatenate(
            [energy[..., None], feats[..., 1:]], axis=-1
        )
    return feats


def compute_mfcc(
    wave: np.ndarray,
    cfg: MfccConfig = MfccConfig(),
    dither_key: Optional[jnp.ndarray] = None,
) -> np.ndarray:
    """(num_samples,) waveform -> (T, num_ceps) MFCC features."""
    fcfg = cfg.frontend_cfg()
    T = num_frames(fcfg, wave.shape[-1])
    logmel = _fbank_impl(jnp.asarray(wave, jnp.float32), fcfg, T, dither_key)
    return np.asarray(_mfcc_from_logmel(logmel, cfg))


def compute_mfcc_batch(
    waves: jnp.ndarray,
    cfg: MfccConfig = MfccConfig(),
    dither_key: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, num_samples) equal-length batch -> (B, T, num_ceps)."""
    fcfg = cfg.frontend_cfg()
    T = num_frames(fcfg, waves.shape[-1])
    logmel = _fbank_impl(jnp.asarray(waves, jnp.float32), fcfg, T, dither_key)
    return _mfcc_from_logmel(logmel, cfg)


def compute_mfcc_pallas(
    waves,
    cfg: MfccConfig = MfccConfig(),
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, N) equal-length waves -> (B, T, num_ceps) via the fused
    Pallas log-mel kernel; the DCT+lifter GEMM runs outside the kernel
    (XLA fuses it into the output stream — keeping the wide one-hot-free
    matmul out of the kernel per the Mosaic lessons in CLAUDE.md)."""
    from khg_tpu.features.pallas_fbank import compute_fbank_pallas

    logmel = compute_fbank_pallas(waves, cfg.frontend_cfg(), interpret)
    return _mfcc_from_logmel(logmel, cfg)
