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

    KHG_PLATFORM=cpu (etc.) overrides the platform list — unlike
    JAX_PLATFORMS it wins over sitecustomize hooks that pre-set
    jax_platforms, because it is applied via jax.config *after* import.

    Returns the platform name of the default device.
    """
    import os

    import jax

    forced = os.environ.get("KHG_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)
    try:
        return jax.devices()[0].platform
    except RuntimeError as e:
        logger.warning(
            "default platform unavailable (%s); falling back to auto-select", e
        )
        jax.config.update("jax_platforms", "")
        return jax.devices()[0].platform
