"""Weak-scaling harness: structure and sanity on the virtual CPU mesh.

The absolute numbers are host-bound here (all virtual devices share the
host cores); the harness's CONTRACT is what's pinned: fixed per-device
batch, per-mesh-size step timings, efficiency normalized to the
1-device throughput.  The same function emits the BASELINE.md >= 80%
efficiency number unchanged on real multi-chip hardware.
"""

import numpy as np

from khg_tpu.parallel.scaling import weak_scaling_curve


def _problem(num_utts):
    from __graft_entry__ import _toy_problem

    return _toy_problem(num_utts=num_utts, T=32, dim=8)


def test_weak_scaling_curve_structure():
    records = weak_scaling_curve(
        _problem, mesh_sizes=[1, 2], per_device_batch=2, iters=1
    )
    assert [r["n_devices"] for r in records] == [1, 2]
    for r in records:
        assert r["batch"] == r["n_devices"] * 2
        assert r["step_seconds"] > 0
        assert r["audio_sec_per_s"] > 0
        # finite-and-positive only: on shared host cores the 1-device
        # baseline is timing-noisy (observed 234% under concurrent CPU
        # load), so any numeric cap here is a flake generator
        assert 0 < r["efficiency_pct"] < float("inf")
    # efficiency is normalized to the 1-device throughput
    assert records[0]["efficiency_pct"] == 100.0


def test_weak_scaling_skips_oversized_meshes():
    import jax

    n = len(jax.devices())
    records = weak_scaling_curve(
        _problem, mesh_sizes=[1, n * 16], per_device_batch=2, iters=1
    )
    assert [r["n_devices"] for r in records] == [1]
