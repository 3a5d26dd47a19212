"""Worker process for the multi-host (multi-process) DP test.

Run as:  python tests/multihost_worker.py PORT PROC_ID NUM_PROCS OUT.npz

Each process owns 2 virtual CPU devices; the global mesh spans
NUM_PROCS * 2 devices across processes, so the psum in the sharded EM
step exercises real cross-process collectives (gloo) — the same-binary
multi-process stats-equality anchor of SURVEY §5.8.
"""

import os
import sys


def main():
    port, pid, nproc, out_path = sys.argv[1:5]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from khg_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=int(nproc),
        process_id=int(pid),
    )
    assert jax.process_count() == int(nproc)
    mesh = multihost.global_data_mesh()

    from __graft_entry__ import _toy_problem

    from khg_tpu.align.packed import uniform_dest_pdf
    from khg_tpu.parallel.mesh import sharded_em_step

    num_utts = 8
    model, weights, graph_arrays, bfeats, lens, id2pdf = _toy_problem(
        num_utts=num_utts
    )
    gconsts, miv, iv = model

    # every process builds the same global problem deterministically and
    # feeds only its shard; make_global_batch assembles the global arrays
    lo, hi = multihost.process_shard(num_utts)
    local = (
        jax.tree.map(lambda x: np.asarray(x)[lo:hi], graph_arrays),
        bfeats[lo:hi],
        lens[lo:hi],
    )
    g_graphs, g_feats, g_lens = multihost.make_global_batch(local, mesh)

    step = sharded_em_step(
        mesh,
        acoustic_scale=0.1,
        uniform_dest_pdf=uniform_dest_pdf(graph_arrays) is not None,
    )
    import jax.numpy as jnp

    result = step(
        (gconsts, miv, iv, weights),
        g_graphs, g_feats, g_lens, jnp.asarray(id2pdf),
    )
    # replicated (psummed) outputs are addressable on every process
    np.savez(
        out_path,
        occ=np.asarray(result.occ),
        mean_acc=np.asarray(result.mean_acc),
        var_acc=np.asarray(result.var_acc),
        tid_counts=np.asarray(result.tid_counts),
        tot_log_like=np.asarray(result.tot_log_like),
        tot_frames=np.asarray(result.tot_frames),
        new_gconsts=np.asarray(result.new_gconsts),
        new_weights=np.asarray(result.new_weights),
        shard=np.array([lo, hi]),
    )
    print(f"worker {pid}: shard [{lo},{hi}) done", flush=True)


if __name__ == "__main__":
    main()
