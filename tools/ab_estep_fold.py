import os, sys, time
sys.path.insert(0, '/root/repo')
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES', '-1')
import numpy as np, jax, jax.numpy as jnp
from bench import build_problem
from khg_tpu.align.pallas_banded import (banded_vmem_bytes, pick_block_b,
                                         viterbi_align_banded)
from khg_tpu.gmm.likelihoods import component_scores_per_state
from khg_tpu.gmm.pallas_kernels import loglikes_pallas
from khg_tpu.stats.accum import accumulate_am_stats_local
from khg_tpu.stats.pallas_fold import accumulate_am_stats_fold_pallas
from khg_tpu.utils.platform import ensure_backend
ensure_backend()
dev = jax.devices()[0]; assert dev.platform != 'cpu'
p = build_problem(num_graphs=8, batch=64, frames=300, dim=80, mix=32,
                  num_phones=682, words_per_utt=3)
B, T, D = p['feats'].shape
P, K = p['model'][0].shape
banded = p['banded']
Bb_, DK, S0 = banded.plane_cost.shape
block_b = pick_block_b(banded_vmem_bytes, Bb_, DK, S0, T,
                       int(p['id2pdf'].max()) + 1)
put = lambda x: jax.device_put(jnp.asarray(x), dev)
g, m, v = (put(x) for x in p['model'])
feats = put(p['feats']); lens = put(p['lens']); id2pdf = put(p['id2pdf'])
graphs = jax.tree.map(put, banded); offsets = p['offsets']
spdf = put(banded.state_pdf)
audio = B * T / 100.0

def mk_ps(use_kernel):
    @jax.jit
    def estep(g, m, v, feats, lens, id2pdf):
        ssk = component_scores_per_state(g, m, v, spdf, feats)
        sac = jax.nn.logsumexp(ssk, axis=-1)
        res = viterbi_align_banded(graphs, offsets, None, lens, id2pdf,
                                   acoustic_scale=0.1, block_b=block_b, sac=sac)
        fw = ((jnp.arange(T)[None, :] < lens[:, None]) & ~res.failed[:, None]).astype(jnp.float32)
        if use_kernel:
            st = accumulate_am_stats_fold_pallas(g, m, v, feats, id2pdf[res.tids], fw, spdf, time_chunk=320)
        else:
            st = accumulate_am_stats_local(g, m, v, feats, id2pdf[res.tids], fw, spdf, state_scores=ssk)
        return res.tids, st.occ, st.mean_acc, st.var_acc, st.tot_log_like
    return estep

def mk_fullp(use_kernel):
    @jax.jit
    def estep(g, m, v, feats, lens, id2pdf):
        ll = loglikes_pallas(g, m, v, feats, compute_dtype='bfloat16')
        res = viterbi_align_banded(graphs, offsets, ll, lens, id2pdf,
                                   acoustic_scale=0.1, block_b=block_b)
        fw = ((jnp.arange(T)[None, :] < lens[:, None]) & ~res.failed[:, None]).astype(jnp.float32)
        if use_kernel:
            st = accumulate_am_stats_fold_pallas(g, m, v, feats, id2pdf[res.tids], fw, spdf, time_chunk=320)
        else:
            st = accumulate_am_stats_local(g, m, v, feats, id2pdf[res.tids], fw, spdf)
        return res.tids, st.occ, st.mean_acc, st.var_acc, st.tot_log_like
    return estep

def bench20(fn):
    args = (g, m, v, feats, lens, id2pdf)
    out = fn(*args); float(out[-1])
    t0 = time.perf_counter()
    for _ in range(20): out = fn(*args)
    float(out[-1])
    return (time.perf_counter() - t0) / 20, out

for name, mk in (('per-state', mk_ps), ('fullP-bf16', mk_fullp)):
    outs = {}
    for use_kernel in (False, True):
        s, out = bench20(mk(use_kernel))
        outs[use_kernel] = out
        print(f'{name} kernel={use_kernel}: {s*1e3:.2f} ms, {audio/s:.0f} a-s/s', flush=True)
    d_occ = float(abs(np.asarray(outs[0][1]) - np.asarray(outs[1][1])).max())
    d_tids = int((np.asarray(outs[0][0]) != np.asarray(outs[1][0])).sum())
    print(f'{name}: occ maxdiff {d_occ:.2e}, tid mismatches {d_tids}', flush=True)
