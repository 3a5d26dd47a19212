"""Multi-host (pod-slice) training setup.

Extends the single-process data-parallel EM (parallel/mesh.py) across
hosts: JAX's multi-controller runtime runs the SAME program on every
host; each host feeds its local shard of the utterance list, the global
mesh spans all chips, and the psum in the sharded EM step rides ICI
within a slice and DCN across slices automatically.

Correctness anchor is unchanged: stats are additive, so the global psum
equals the serial sum regardless of host layout.  Single-host runs are
the degenerate case (initialize() is a no-op).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize, tolerant of single-process runs.

    With no arguments, relies on the cluster environment (TPU pod
    metadata) as JAX does natively; a no-op when only one process exists.
    """
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except (RuntimeError, ValueError) as e:
        logger.info("single-process run (distributed init skipped: %s)", e)


def process_shard(num_items: int) -> Tuple[int, int]:
    """[start, end) of this host's contiguous shard of a global work list.

    Every host must call with the same num_items; remainders go to the
    first hosts so sizes differ by at most one.
    """
    import jax

    p, n = jax.process_index(), jax.process_count()
    base, rem = divmod(num_items, n)
    start = p * base + min(p, rem)
    end = start + base + (1 if p < rem else 0)
    return start, end


def global_data_mesh():
    """1-D "dp" mesh over ALL devices in the job (all hosts)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), axis_names=("dp",))


def make_global_batch(local_arrays, mesh):
    """Assemble a globally-sharded batch from per-host local shards.

    Each host passes its local (B_local, ...) arrays; the result is a
    global jax.Array of shape (B_local * num_processes, ...) sharded over
    "dp" without any cross-host data movement.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("dp"))

    def build(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        local_devices = mesh.local_devices
        per_dev = np.array_split(x, len(local_devices))
        return jax.make_array_from_single_device_arrays(
            global_shape,
            sharding,
            [
                jax.device_put(shard, d)
                for shard, d in zip(per_dev, local_devices)
            ],
        )

    return jax.tree.map(build, local_arrays)
