"""Backend resilience helper.

Some TPU environments pre-select an experimental platform via config
(e.g. ``jax_platforms="axon,cpu"`` set by a sitecustomize hook) whose
plugin registration can fail transiently; JAX then raises "Backend ...
is not in the list of known backends" instead of falling back.  Entry
points call ensure_backend() to recover onto whatever backend exists.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)


def ensure_backend() -> str:
    """Initialize a usable JAX backend, falling back to auto-selection.

    Returns the platform name of the default device.
    """
    import jax

    try:
        return jax.devices()[0].platform
    except RuntimeError as e:
        logger.warning(
            "default platform unavailable (%s); falling back to auto-select", e
        )
        jax.config.update("jax_platforms", "")
        return jax.devices()[0].platform
