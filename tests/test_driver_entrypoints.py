"""Guard the driver-facing entry points: bench.py and __graft_entry__.py.

These run outside the test suite (on real hardware), so a silent breakage
would only surface at judging time; keep tiny CPU smoke versions green.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_bench_problem_and_estep_smoke():
    import jax

    import bench

    # frames must exceed the longest transcript's minimum path length
    problem = bench.build_problem(num_graphs=3, batch=4, frames=160, dim=16, mix=2)
    assert problem["feats"].shape == (4, 160, 16)
    secs, out = bench.run_estep(problem, jax.devices()[0], iters=1)
    assert secs > 0
    tids = np.asarray(out[0])
    assert tids.shape == (4, 160)
    assert np.all(tids >= 1)  # every frame aligned to a real tid
    occ = np.asarray(out[1])
    assert abs(float(occ.sum()) - 4 * 160) < 1.0  # one count per frame


def test_graft_entry_compiles():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    tids = np.asarray(out[0])
    assert tids.ndim == 2
    assert np.all(np.asarray(out[1]) < 1e29)  # all alignments feasible


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)


def test_ensure_backend_no_retry_when_cpu_configured(monkeypatch):
    # the retry loop must not fire when cpu is what was asked for
    # (test processes force jax_platforms=cpu in conftest)
    import time as _time

    from khg_tpu.utils.platform import ensure_backend

    t0 = _time.perf_counter()
    assert ensure_backend(retry_tpu=3, retry_wait_s=30.0) == "cpu"
    assert _time.perf_counter() - t0 < 5.0  # no 30 s retry sleeps
