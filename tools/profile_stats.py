"""Attribute accumulate_am_stats_local's wall time einsum by einsum.

Companion to profile_estep.py (VERDICT r3 item 5): the local-state
stats fold standalone costs more than the full-P scoring GEMM; this
times each stage of the fold as its own jit on the real chip.

Run: python tools/profile_stats.py
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


def timeit(fn, args, iters, sync):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main(iters=20):
    import jax
    import jax.numpy as jnp

    from bench import build_problem
    from khg_tpu.gmm.likelihoods import component_scores_per_state
    from khg_tpu.utils.platform import ensure_backend

    ensure_backend()
    dev = jax.devices()[0]
    assert dev.platform != "cpu"
    hi = jax.lax.Precision.HIGHEST

    problem = build_problem(
        num_graphs=8, batch=64, frames=300, dim=80, mix=32,
        num_phones=682, words_per_utt=3,
    )
    B, T, D = problem["feats"].shape
    P, K = problem["model"][0].shape
    S = problem["banded"].state_pdf.shape[1]
    put = lambda x: jax.device_put(jnp.asarray(x), dev)  # noqa: E731
    gconsts, miv, iv = (put(x) for x in problem["model"])
    feats = put(problem["feats"])
    spdf = put(problem["banded"].state_pdf)
    rng = np.random.default_rng(0)
    # alignment stand-ins: any valid local state / weights
    sidx = put(rng.integers(0, S, size=(B, T)).astype(np.int32))
    rows = {}

    # 1. per-state component scores (B,T,S,K), HIGHEST
    f1 = jax.jit(lambda g, m, v, sp, f: component_scores_per_state(
        g, m, v, sp, f))
    rows["scores_per_state"] = timeit(
        f1, (gconsts, miv, iv, spdf, feats), iters,
        lambda o: float(o[0, 0, 0, 0]))
    ssk = f1(gconsts, miv, iv, spdf, feats)
    float(ssk[0, 0, 0, 0])

    # 2. aligned-state select + posteriors
    @jax.jit
    def f2(ssk, sidx):
        oh = jax.nn.one_hot(sidx, S, dtype=jnp.float32)
        sel = jnp.einsum("btsk,bts->btk", jnp.maximum(ssk, -1e30), oh,
                         preferred_element_type=jnp.float32, precision=hi)
        post = jax.nn.softmax(sel, axis=-1)
        return post, jax.nn.logsumexp(sel, axis=-1)
    rows["select_post"] = timeit(
        f2, (ssk, sidx), iters, lambda o: float(o[0][0, 0, 0]))
    post = f2(ssk, sidx)[0]
    float(post[0, 0, 0])

    # 3. local fold einsum (bts,btk,btq->bskq)
    @jax.jit
    def f3(sidx, post, feats):
        oh = jax.nn.one_hot(sidx, S, dtype=jnp.float32)
        xw1 = jnp.concatenate(
            [jnp.ones(feats.shape[:2] + (1,), feats.dtype), feats,
             jnp.square(feats)], axis=-1)
        return jnp.einsum("bts,btk,btq->bskq", oh, post, xw1,
                          preferred_element_type=jnp.float32, precision=hi)
    rows["local_fold"] = timeit(
        f3, (sidx, post, feats), iters, lambda o: float(o[0, 0, 0, 0]))
    local = f3(sidx, post, feats)
    float(local[0, 0, 0, 0])

    # 4. global scatter (bsp,bskq->pkq), HIGHEST
    @jax.jit
    def f4(spdf, local):
        scatter = jax.nn.one_hot(spdf, P, dtype=jnp.float32)
        return jnp.einsum("bsp,bskq->pkq", scatter, local,
                          preferred_element_type=jnp.float32, precision=hi)
    rows["global_scatter"] = timeit(
        f4, (spdf, local), iters, lambda o: float(o[0, 0, 0]))

    # 4b. the same scatter as a flat 2-D GEMM at HIGH (3-pass) —
    # candidate replacement: one-hot rows are exact in bf16, the data
    # side's 3-term bf16 split carries ~f32 mantissa
    @jax.jit
    def f4b(spdf, local):
        scatter = jax.nn.one_hot(spdf.reshape(-1), P, dtype=jnp.float32)
        flat = local.reshape(-1, local.shape[2] * local.shape[3])
        return jax.lax.dot_general(
            scatter, flat, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32)
    rows["scatter_HIGH"] = timeit(
        f4b, (spdf, local), iters, lambda o: float(o[0, 0]))

    total = sum(v for k, v in rows.items() if k != "scatter_HIGH")
    print(f"\nB={B} T={T} S={S} P={P} K={K} D={D}")
    print("=== accumulate_am_stats_local attribution ===")
    for k, v in rows.items():
        print(f"{k:>18}: {v * 1e3:8.2f} ms")
    print(f"{'sum(1-4)':>18}: {total * 1e3:8.2f} ms")
    return rows


if __name__ == "__main__":
    main()
