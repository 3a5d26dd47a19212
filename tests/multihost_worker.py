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
    model, weights, graph_arrays, bfeats, lens, id2pdf, tm = _toy_problem(
        num_utts=num_utts, return_tm=True
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

    # fully-resident MULTI-PASS loop across processes (VERDICT r4 #2):
    # per-shard carry folds, one cross-process psum + replicated device
    # transition update + cost refresh per pass, one fetch per stretch
    from khg_tpu.model.transition_device import build_transition_struct
    from khg_tpu.parallel.mesh import sharded_resident_em_loop

    num_pdfs, num_mix = np.asarray(gconsts).shape
    dim = np.asarray(miv).shape[-1]
    num_tids = int(np.asarray(id2pdf).shape[0]) - 1
    struct = build_transition_struct(tm)
    loop = sharded_resident_em_loop(
        mesh, num_pdfs, num_mix, dim, num_tids, struct,
        acoustic_scale=0.1, transition_scale=1.0, self_loop_scale=1.0,
        uniform_dest_pdf=uniform_dest_pdf(graph_arrays) is not None,
    )
    logp = jnp.asarray(np.asarray(tm.log_probs, np.float32))
    delta = loop.delta(logp)
    lmodel = (gconsts, miv, iv, jnp.asarray(weights))
    for _p in range(2):
        carry, comp = loop.make_carry()
        carry, comp = loop.fold(
            lmodel, delta, carry, comp, g_graphs, g_feats, g_lens,
            jnp.asarray(id2pdf),
        )
        lmodel, logp, delta, packet = loop.finish(
            lmodel, carry, comp, logp
        )

    # ... and the wide-model (per-state banded) resident loop variant
    from khg_tpu.align.banded import band_renumber, pack_banded
    from khg_tpu.align.packed import pack_graph_batch

    ren, _ = band_renumber(graph_arrays)
    spdf = uniform_dest_pdf(ren)
    banded_out = pack_banded(ren, spdf) if spdf is not None else None
    wide_gconsts = wide_logp = wide_packet = None
    if banded_out is not None:
        bg, offs = banded_out
        local_bg = jax.tree.map(lambda x: np.asarray(x)[lo:hi], bg)
        (g_bg,) = multihost.make_global_batch((local_bg,), mesh)
        wloop = sharded_resident_em_loop(
            mesh, num_pdfs, num_mix, dim, num_tids, struct,
            acoustic_scale=0.1, transition_scale=1.0,
            self_loop_scale=1.0, banded_offsets=offs,
            banded_interpret=True, per_state=True,
        )
        wlogp = jnp.asarray(np.asarray(tm.log_probs, np.float32))
        wdelta = wloop.delta(wlogp)
        wmodel = (gconsts, miv, iv, jnp.asarray(weights))
        for _p in range(2):
            carry, comp = wloop.make_carry()
            carry, comp = wloop.fold(
                wmodel, wdelta, carry, comp, g_bg, g_feats, g_lens,
                jnp.asarray(id2pdf),
            )
            wmodel, wlogp, wdelta, wpacket = wloop.finish(
                wmodel, carry, comp, wlogp
            )
        wide_gconsts = np.asarray(wmodel[0])
        wide_logp = np.asarray(wlogp)
        wide_packet = np.asarray(wpacket)

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
        loop_gconsts=np.asarray(lmodel[0]),
        loop_weights=np.asarray(lmodel[3]),
        loop_logp=np.asarray(logp),
        loop_packet=np.asarray(packet),
        wide_gconsts=(
            wide_gconsts if wide_gconsts is not None else np.zeros(0)
        ),
        wide_logp=wide_logp if wide_logp is not None else np.zeros(0),
        wide_packet=(
            wide_packet if wide_packet is not None else np.zeros(0)
        ),
        shard=np.array([lo, hi]),
    )
    print(f"worker {pid}: shard [{lo},{hi}) done", flush=True)


if __name__ == "__main__":
    main()
