"""Attribute the triphone full-P E-step's wall time component by component.

VERDICT r3 item 5: the fused bf16 full-P E-step ran at 10.6% MFU while
its scoring GEMM alone hit 20.8% — roughly half the step is non-GEMM
work (banded Viterbi, acoustic select, stats fold, glue) that BENCH.md's
round-3 profile could not attribute below component level.

This script times each piece as its OWN jitted function on the real
chip (device-resident inputs, value-fetch sync per CLAUDE.md — the axon
backend's block_until_ready returns early), then times the fused step,
so the residual (fusion glue / scheduling) is visible too.

Run: python tools/profile_estep.py  (uses the real chip; ~1 min warm)
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import numpy as np  # noqa: E402


def timeit(fn, args, iters=20, sync=None):
    """Wall seconds per call; syncs by fetching a scalar from the last
    output (device execution is FIFO, one fetch RTT amortizes)."""
    out = fn(*args)
    (sync or (lambda o: float(np.asarray(o).ravel()[0])))(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    (sync or (lambda o: float(np.asarray(o).ravel()[0])))(out)
    return (time.perf_counter() - t0) / iters


def main(compute_dtype="bfloat16", iters=20):
    import jax
    import jax.numpy as jnp

    from bench import build_problem, estep_flops, run_estep
    from khg_tpu.align.pallas_banded import (
        banded_vmem_bytes, pick_block_b, viterbi_align_banded,
    )
    from khg_tpu.gmm.pallas_kernels import loglikes_pallas
    from khg_tpu.stats.accum import accumulate_am_stats_local
    from khg_tpu.utils.platform import ensure_backend

    ensure_backend()
    dev = jax.devices()[0]
    assert dev.platform != "cpu", "profile on the real chip"

    problem = build_problem(
        num_graphs=8, batch=64, frames=300, dim=80, mix=32,
        num_phones=682, words_per_utt=3,
    )
    B, T, D = problem["feats"].shape
    P, K = problem["model"][0].shape
    banded = problem["banded"]
    Bb_, DK, S0 = banded.plane_cost.shape
    block_b = pick_block_b(
        banded_vmem_bytes, Bb_, DK, S0, T, int(problem["id2pdf"].max()) + 1
    )
    audio_sec = B * T / 100.0
    print(f"B={B} T={T} D={D} P={P} K={K} DK={DK} S0={S0} "
          f"block_b={block_b} nB={-(-B // block_b)}", file=sys.stderr)

    put = lambda x: jax.device_put(jnp.asarray(x), dev)  # noqa: E731
    gconsts, miv, iv = (put(x) for x in problem["model"])
    feats = put(problem["feats"])
    lens = put(problem["lens"])
    id2pdf = put(problem["id2pdf"])
    graphs = jax.tree.map(put, banded)
    offsets = problem["offsets"]
    spdf = put(banded.state_pdf)

    rows = {}

    # (a) full fused E-step — the number being attributed
    full_s, out = run_estep(
        problem, dev, iters=max(3, iters // 4),
        pallas_scoring=True, compute_dtype=compute_dtype,
    )
    tids_host = np.asarray(out[0])
    rows["full_estep"] = full_s

    # (b) scoring GEMM alone (Pallas fused logsumexp epilogue)
    score = jax.jit(lambda g, m, v, f: loglikes_pallas(
        g, m, v, f, compute_dtype=compute_dtype))
    rows["scoring"] = timeit(
        score, (gconsts, miv, iv, feats), iters,
        sync=lambda o: float(o[0, 0, 0]),
    )

    # (c) acoustic select: (B,T,P) loglikes -> (B,T,S) per-state lattice
    # (the exact 0/1 one-hot GEMM viterbi_align_banded runs in
    # external-ac mode, plus the (B,T,P) HBM round-trip it implies)
    ll_dev = score(gconsts, miv, iv, feats)
    float(ll_dev[0, 0, 0])

    @jax.jit
    def select(ll, sp):
        oh = (sp[:, :, None]
              == jnp.arange(P, dtype=jnp.int32)[None, None, :]
              ).astype(jnp.float32)
        return jnp.einsum(
            "btp,bsp->bts", ll, oh,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    rows["ac_select"] = timeit(
        select, (ll_dev, spdf), iters, sync=lambda o: float(o[0, 0, 0]))

    # (d) banded Viterbi kernel alone, sac mode (select pre-done)
    sac_dev = select(ll_dev, spdf)
    float(sac_dev[0, 0, 0])

    @jax.jit
    def viterbi_only(sac, lens, id2pdf):
        res = viterbi_align_banded(
            graphs, offsets, None, lens, id2pdf,
            acoustic_scale=0.1, block_b=block_b, sac=sac,
        )
        return res.tids, res.total_cost
    rows["viterbi_kernel"] = timeit(
        viterbi_only, (sac_dev, lens, id2pdf), iters,
        sync=lambda o: float(o[1][0]),
    )

    # (e) stats fold alone (alignment fixed; includes its own per-state
    # HIGHEST-precision scoring GEMM, as in the fused step)
    tids_dev = put(tids_host)

    @jax.jit
    def stats_only(g, m, v, f, tids, lens):
        fw = (jnp.arange(T)[None, :] < lens[:, None]).astype(jnp.float32)
        st = accumulate_am_stats_local(g, m, v, f, id2pdf[tids], fw, spdf)
        return st.occ, st.tot_log_like
    rows["stats_fold"] = timeit(
        stats_only, (gconsts, miv, iv, feats, tids_dev, lens), iters,
        sync=lambda o: float(o[1]),
    )

    # (f) path acoustic-cost glue (take_along_axis over the (B,T,P) ll)
    @jax.jit
    def path_cost(ll, tids, lens):
        pdf_ids = id2pdf[tids]
        lp = jnp.take_along_axis(
            ll, jnp.maximum(pdf_ids, 0)[..., None], axis=2)[..., 0]
        mask = jnp.arange(T)[None, :] < lens[:, None]
        return -0.1 * jnp.sum(jnp.where(mask, lp, 0.0), axis=1)
    rows["path_cost_glue"] = timeit(
        path_cost, (ll_dev, tids_dev, lens), iters,
        sync=lambda o: float(o[0]),
    )

    parts = sum(v for k, v in rows.items() if k != "full_estep")
    print(f"\n=== triphone full-P E-step attribution ({compute_dtype}) ===")
    for k, v in rows.items():
        frac = 100.0 * v / rows["full_estep"]
        print(f"{k:>16}: {v * 1e3:8.2f} ms  ({frac:5.1f}% of full)")
    print(f"{'sum(parts)':>16}: {parts * 1e3:8.2f} ms  "
          f"({100.0 * parts / rows['full_estep']:5.1f}% of full; "
          f"residual = fusion/CSE overlap + dispatch)")
    print(f"{'audio-sec/s':>16}: {audio_sec / rows['full_estep']:8.1f}")
    flops = estep_flops(problem)
    print(f"{'bf16 MFU':>16}: "
          f"{100.0 * flops / rows['full_estep'] / 197e12:8.1f}% of 197 TF")
    return rows


if __name__ == "__main__":
    main(compute_dtype=None if "--f32" in sys.argv else "bfloat16")
