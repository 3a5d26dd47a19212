"""Multi-host (multi-process) data parallelism: psum across processes.

Spawns two REAL processes (jax.distributed over localhost, gloo CPU
collectives), each owning 2 virtual devices of a 4-device global mesh,
and checks the sharded EM step's psummed statistics and M-step outputs
against the single-process run of the same problem — the SURVEY §5.8
anchor: distributed sum == serial sum, identical results on any
process layout.  Closes VERDICT round-1 missing item #4
(parallel/multihost.py had zero test coverage).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "multihost_worker.py"


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def two_process_outputs(tmp_path_factory):
    d = tmp_path_factory.mktemp("mh")
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_PROCESSES")
    }
    # fresh compile caches don't matter; keep the persistent cache shared
    procs = []
    outs = []
    for pid in range(2):
        out = d / f"p{pid}.npz"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(WORKER), str(port), str(pid), "2",
                 str(out)],
                cwd=str(REPO),
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return [dict(np.load(o)) for o in outs]


def _single_process_reference():
    """The same problem on a single-process 4-device mesh."""
    import jax

    from __graft_entry__ import _toy_problem
    from khg_tpu.align.packed import uniform_dest_pdf
    from khg_tpu.parallel.mesh import make_data_mesh, sharded_em_step

    import jax.numpy as jnp

    model, weights, graph_arrays, bfeats, lens, id2pdf = _toy_problem(
        num_utts=8
    )
    gconsts, miv, iv = model
    mesh = make_data_mesh(4, devices=jax.devices("cpu")[:4])
    step = sharded_em_step(
        mesh,
        acoustic_scale=0.1,
        uniform_dest_pdf=uniform_dest_pdf(graph_arrays) is not None,
    )
    return step(
        (gconsts, miv, iv, weights),
        jax.tree.map(jnp.asarray, graph_arrays),
        jnp.asarray(bfeats), jnp.asarray(lens), jnp.asarray(id2pdf),
    )


def test_two_process_psum_equals_serial(two_process_outputs):
    p0, p1 = two_process_outputs
    # both processes hold identical replicated (psummed) results
    for key in ("occ", "mean_acc", "var_acc", "tid_counts",
                "tot_log_like", "tot_frames", "new_gconsts", "new_weights"):
        np.testing.assert_array_equal(p0[key], p1[key], err_msg=key)
    # shards partition the corpus
    assert p0["shard"].tolist() == [0, 4]
    assert p1["shard"].tolist() == [4, 8]

    ref = _single_process_reference()
    np.testing.assert_allclose(
        p0["occ"], np.asarray(ref.occ), rtol=0, atol=1e-4
    )
    np.testing.assert_allclose(
        p0["mean_acc"], np.asarray(ref.mean_acc), rtol=1e-6, atol=1e-4
    )
    np.testing.assert_allclose(
        p0["var_acc"], np.asarray(ref.var_acc), rtol=1e-6, atol=1e-4
    )
    np.testing.assert_allclose(
        p0["tid_counts"], np.asarray(ref.tid_counts), rtol=0, atol=1e-5
    )
    np.testing.assert_allclose(
        float(p0["tot_log_like"]), float(np.asarray(ref.tot_log_like)),
        rtol=1e-6,
    )
    assert float(p0["tot_frames"]) == float(np.asarray(ref.tot_frames))
    np.testing.assert_allclose(
        p0["new_gconsts"], np.asarray(ref.new_gconsts), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        p0["new_weights"], np.asarray(ref.new_weights), rtol=1e-6, atol=1e-7
    )
