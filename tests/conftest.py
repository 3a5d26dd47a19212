"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-chip sharding paths are validated
on forced host devices.  bench.py (run separately) uses the real TPU.
"""

import os

# Force CPU: the environment presets JAX_PLATFORMS=axon (the TPU tunnel),
# so a setdefault would silently run tests on the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# First-compile latency in this environment is large; a persistent cache
# makes repeated test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/khg_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

# The TPU tunnel's sitecustomize force-sets jax_platforms="axon,cpu" at
# interpreter start, clobbering JAX_PLATFORMS; override it back before any
# backend is initialized so tests stay hermetic on CPU.
import jax

jax.config.update("jax_platforms", "cpu")
