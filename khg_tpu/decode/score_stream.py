"""Streamed device->host acoustic-score transfer for decoding.

The decoders (decode/lattice.py, native core) run on the HOST over
host-resident loglike matrices, while GMM scoring runs on the chip as
one batched GEMM.  Fetching the whole (U, T, P) score tensor before
decoding serializes transfer and decode — and at wide-model scale the
transfer dominates: the bench triphone decode set is ~59 MB of f32
scores, which costs ~2.3 s through this container's ~25 MB/s tunnel
against well under a second of actual decoding (BENCH.md round 4).

``stream_scores`` starts an asynchronous device->host copy of every
utterance up front and yields host matrices in order, so the caller
decodes utterance u while u+1.. are still in flight.  With
``fetch_dtype="float16"`` the matrices cross the link at half width and
are widened back to f32 on the host: acoustic scores are O(-1e2) nats
with ~1e-3 relative f16 error, far inside the decoder's beam slack —
word outputs are pinned unchanged by tests/test_score_stream.py — but
exact-parity consumers (the golden decoder tests) should keep the f32
default.

Mirrors the role of the reference's per-utterance decodable loop
(kaldi-hmm-gmm csrc/decoder-wrappers.cc DecodeUtteranceLatticeFaster):
the reference scores lazily per frame on the CPU; here scoring is one
MXU GEMM and the transfer is the cost to hide.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np


def stream_scores(
    loglikes_dev,
    fetch_dtype: Optional[str] = None,
) -> Iterator[np.ndarray]:
    """Yield per-utterance (T, P) f32 host arrays from a device (U, T, P)
    array, overlapping transfers with the caller's work.

    ``fetch_dtype``: optional narrow dtype ("float16"/"bfloat16") for
    the device->host copy; the yielded arrays are always f32.
    """
    import jax.numpy as jnp

    U = loglikes_dev.shape[0]
    parts = [loglikes_dev[u] for u in range(U)]
    if fetch_dtype is not None:
        parts = [p.astype(jnp.dtype(fetch_dtype)) for p in parts]
    for p in parts:
        # best-effort async host copy (supported by jax.Array; harmless
        # no-op if a backend lacks it — np.asarray below then blocks)
        try:
            p.copy_to_host_async()
        except AttributeError:
            pass
    for p in parts:
        out = np.asarray(p)
        if out.dtype != np.float32:
            out = out.astype(np.float32)
        yield out


def decode_scores_streamed(
    decoder,
    loglikes_dev,
    id2pdf: np.ndarray,
    acoustic_scale: float = 1.0,
    allow_partial: bool = True,
    fetch_dtype: Optional[str] = None,
    max_workers: Optional[int] = None,
):
    """decode_utterances_parallel over a device score tensor, with the
    per-utterance transfers streamed behind the decoding threads."""
    from khg_tpu.decode.lattice import decode_utterances_parallel

    return decode_utterances_parallel(
        decoder,
        stream_scores(loglikes_dev, fetch_dtype=fetch_dtype),
        id2pdf,
        acoustic_scale=acoustic_scale,
        allow_partial=allow_partial,
        max_workers=max_workers,
    )
