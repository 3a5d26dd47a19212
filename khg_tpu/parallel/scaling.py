"""Weak-scaling efficiency measurement for the sharded EM step.

One harness, two uses:

- Dry run: timed on a virtual CPU mesh (1/2/4/8 forced host devices) by
  ``__graft_entry__.dryrun_multichip`` every driver invocation, so the
  measurement machinery itself is validated continuously.  The absolute
  numbers are meaningless there (all virtual devices share the host
  cores), but the curve shape and the plumbing are exercised.
- Real hardware: the SAME function emits the BASELINE.md >= 80%
  weak-scaling-efficiency number the moment a multi-chip slice is
  attached — no code changes, just real devices in ``devices``.

Weak scaling: per-device batch stays FIXED as the mesh grows; ideal
throughput is linear in mesh size, efficiency(n) =
throughput(n) / (n * throughput(1)).
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Sequence

import numpy as np


def weak_scaling_curve(
    problem_fn: Callable[[int], tuple],
    mesh_sizes: Sequence[int],
    per_device_batch: int = 4,
    iters: int = 3,
    acoustic_scale: float = 0.1,
    devices: Optional[list] = None,
    frames_per_sec: float = 100.0,
) -> List[dict]:
    """Time the full sharded EM step at fixed per-device batch over
    increasing mesh sizes.

    ``problem_fn(num_utts)`` must return
    (model=(gconsts, miv, iv), weights, graph_arrays, feats, lens,
    id2pdf) — e.g. ``__graft_entry__._toy_problem`` or a real corpus
    packer.  Returns one record per mesh size:
    {"n_devices", "batch", "step_seconds", "audio_sec_per_s",
     "efficiency_pct"} (efficiency is vs the 1-device throughput when a
    size-1 mesh is part of the sweep, else vs the smallest).
    """
    import jax
    import jax.numpy as jnp

    from khg_tpu.align.packed import uniform_dest_pdf
    from khg_tpu.parallel.mesh import make_data_mesh, sharded_em_step

    if devices is None:
        devices = jax.devices()
    records = []
    base_tput = None
    for n in mesh_sizes:
        if n > len(devices):
            continue
        mesh = make_data_mesh(n, devices=devices[:n])
        num_utts = n * per_device_batch
        model, weights, graph_arrays, feats, lens, id2pdf = problem_fn(
            num_utts
        )
        gconsts, miv, iv = model
        step = sharded_em_step(
            mesh,
            acoustic_scale=acoustic_scale,
            uniform_dest_pdf=uniform_dest_pdf(graph_arrays) is not None,
        )
        args = (
            (gconsts, miv, iv, weights),
            jax.tree.map(jnp.asarray, graph_arrays),
            jnp.asarray(feats),
            jnp.asarray(lens),
            jnp.asarray(id2pdf),
        )
        # sync via a VALUE FETCH (the axon backend's block_until_ready
        # returns early; a scalar fetch bounds all queued executions)
        out = step(*args)
        float(np.asarray(out.tot_log_like))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*args)
        float(np.asarray(out.tot_log_like))
        step_s = (time.perf_counter() - t0) / iters
        audio_sec = float(lens.sum()) / frames_per_sec
        tput = audio_sec / step_s
        if base_tput is None:
            base_tput = tput / n  # per-device throughput of the smallest mesh
        records.append(
            {
                "n_devices": n,
                "batch": num_utts,
                "step_seconds": round(step_s, 6),
                "audio_sec_per_s": round(tput, 2),
                "efficiency_pct": round(100.0 * tput / (n * base_tput), 1),
            }
        )
    return records
