"""Benchmark: align + acc-stats throughput (audio-seconds/s/chip).

Three measurements on the real chip, one JSON line:

1. **Headline** (``value``): the raw jitted E-step — fused-GEMM GMM
   log-likelihoods, exact dense Viterbi alignment (banded Pallas
   kernel), sufficient-statistics accumulation — on an AudioMNIST-scale
   monophone system (50 pdfs x 16 mix, D=80), batch 256 x 5 s.
2. ``corpus_em_pass``: the USER-FACING number — one full EM pass over a
   1024-utterance corpus through EStepPipeline (pipelined batches,
   device feature cache, vectorized transition refresh), including all
   host work and transfers.
3. ``triphone``: a triphone-scale model (P=2048 pdfs, K=32, D=80 —
   P*K = 64k Gaussians, the regime the size-gated gather stats path
   exists for), f32 and bf16 scoring, with an estimated model-FLOP
   utilization: this config is MXU-bound, unlike the tiny monophone.

The metric is audio seconds processed per wall-clock second per chip
(100 frames per audio second).  ``vs_baseline`` is the headline's
speedup over the same computation on the host CPU backend (the
reference implementation is single-threaded CPU; it publishes no
numbers of its own — BASELINE.md).
"""

import json
import os
import sys
import time

# Persistent compile cache inside the repo: first compilation of the
# unrolled scan through the TPU tunnel takes minutes; cached runs are fast.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import numpy as np

# Audited v5e MXU peaks (VERDICT r2 item 3a): the chip's peak is
# ~197 TFLOP/s in bf16 (394 TOPS is int8, NOT bf16 — the old constants
# had these swapped).  f32-precision matmuls (precision=HIGHEST =
# 6-pass bf16 decomposition) top out at ~197/6 = ~32.8 TFLOP/s of
# f32-equivalent work.  MFU keys name the peak they are measured
# against.
_PEAK_BF16 = 197e12
_PEAK_F32_6PASS = 197e12 / 6.0


def build_system(num_phones=None, mix=16, dim=80, seed=0):
    """Lexicon -> topology -> flat-start model -> graph compiler.

    num_phones=None gives the AudioMNIST digits lexicon (~50 pdfs);
    num_phones=N gives N single-phone words (triphone-scale pdf counts
    with a consistent tid->pdf contract throughout).
    """
    from khg_tpu.graph.compiler import TrainingGraphCompiler
    from khg_tpu.lang.lexicon import Lexicon, Lexiconp
    from khg_tpu.lang.lfst import make_lexicon_fst_with_silence
    from khg_tpu.lang.topo import generate_hmm_topo
    from khg_tpu.recipes.steps import gmm_init_mono

    rng = np.random.default_rng(seed)
    if num_phones is None:
        digits = "ZERO ONE TWO THREE FOUR FIVE SIX SEVEN EIGHT NINE".split()
        word2phones = {"<SIL>": ["SIL"]}
        for w in digits:
            word2phones[w] = [" ".join(w)]
    else:
        word2phones = {"<SIL>": ["SIL"]}
        for i in range(num_phones):
            word2phones[f"W{i}"] = [f"P{i}"]
    lp = Lexiconp.from_lexicon(Lexicon(word2phones=word2phones)).add_lex_disambig()
    topo = generate_hmm_topo(
        non_sil_phones=lp.get_non_sil_phone_ids(),
        sil_phone=lp.get_sil_phone_id(),
    )
    stats_feats = [rng.standard_normal((100, dim)).astype(np.float32)]
    tm, tree, am = gmm_init_mono(topo, stats_feats)
    for p in range(am.num_pdfs):
        am.get_pdf(p).split(mix, 0.1, rng=rng)
    L = make_lexicon_fst_with_silence(lexiconp=lp, sil_prob=0.5, sil_phone="SIL")
    gc = TrainingGraphCompiler(tm, tree, L, disambig_syms=lp.disambig_phone_ids())
    return lp, tm, tree, am, gc, rng


def build_problem(num_graphs=16, batch=256, frames=500, dim=80, mix=16,
                  seed=0, num_phones=None, words_per_utt=None):
    from khg_tpu.align.packed import pack_graph, pack_graph_batch
    from khg_tpu.graph.h_builder import add_transition_probs

    lp, tm, tree, am, gc, rng = build_system(num_phones, mix, dim, seed)
    id2pdf = tm.id2pdf_array()
    word_ids = [w for w in lp.word2id.values() if w > 0]
    lm_words = [w for w in word_ids
                if not lp.id2word[w].startswith(("<", "#"))]
    packed = []
    graph_fsts = []  # prob-free compile output (for pack_graphs_base)
    for i in range(num_graphs):
        n_words = words_per_utt or (4 + (i % 4))
        words = [lm_words[int(rng.integers(len(lm_words)))]
                 for _ in range(n_words)]
        g = gc.compile_graph_from_text(words)
        graph_fsts.append(g.copy())
        add_transition_probs(tm, g, transition_scale=1.0, self_loop_scale=0.1)
        packed.append(pack_graph(g, id2pdf))
    graphs = [packed[i % num_graphs] for i in range(batch)]
    graph_arrays = pack_graph_batch(graphs, states_pad_to=8, indeg_pad_to=2)

    pm = am.pack(mix_pad_to=8, dim_pad_to=1)
    feats = rng.standard_normal((batch, frames, dim)).astype(np.float32)
    lens = np.full(batch, frames, dtype=np.int32)

    # banded (offset-plane) form for the fused Pallas Viterbi kernel
    from khg_tpu.align.banded import band_renumber, pack_banded
    from khg_tpu.align.packed import uniform_dest_pdf

    banded, offsets = None, None
    renumbered, _ = band_renumber(graph_arrays)
    sp = uniform_dest_pdf(renumbered)
    if sp is not None:
        out = pack_banded(renumbered, sp)
        if out is not None:
            banded, offsets = out
    return {
        "model": (pm.gconsts, pm.means_invvars, pm.inv_vars),
        "graphs": graph_arrays,
        "banded": banded,
        "offsets": offsets,
        "feats": feats,
        "lens": lens,
        "id2pdf": id2pdf,
        "num_pdfs": am.num_pdfs,
        "system": (lp, tm, tree, am, gc),
        "packed_graphs": packed,
        "graph_fsts": graph_fsts,
    }


def build_triphone_decode_problem(n_phones=26, n_words=40, mix=32, dim=80,
                                  num_utts=16, words_per_utt=6,
                                  frames_per_utt=420, seed=0):
    """Triphone-scale DECODE problem: an N=3, P=1 tree whose leaves
    depend on the left context (one pdf block per (phone, left) pair,
    ~2.2k pdfs), a realistic multi-phone-word vocabulary, and synthetic
    utterances sampled from the model along training-graph paths.

    Returns a problem dict consumable by run_decode (the HCLG there is
    built through decode/graph.build_hclg, which routes N=3 trees
    through compose_context + the subsequential loop — the same
    mechanism as /root/reference/egs/yesno/decode.py:100-141).
    """
    from khg_tpu.fstlib.fst import equal_align
    from khg_tpu.gmm.am_gmm import AmDiagGmm
    from khg_tpu.gmm.diag_gmm import DiagGmm
    from khg_tpu.graph.compiler import TrainingGraphCompiler
    from khg_tpu.lang.lexicon import Lexicon, Lexiconp
    from khg_tpu.lang.lfst import make_lexicon_fst_with_silence
    from khg_tpu.lang.topo import generate_hmm_topo
    from khg_tpu.model.context_dep import ContextDependency
    from khg_tpu.model.event_map import K_PDF_CLASS, TableEventMap
    from khg_tpu.model.transition_model import TransitionModel

    rng = np.random.default_rng(seed)
    phones = [f"p{i:02d}" for i in range(n_phones)]
    word2phones = {"<SIL>": ["SIL"]}
    for i in range(n_words):
        n = 3 + int(rng.integers(0, 2))
        word2phones[f"W{i}"] = [
            " ".join(phones[int(rng.integers(n_phones))] for _ in range(n))
        ]
    lp = Lexiconp.from_lexicon(Lexicon(word2phones=word2phones))
    lp = lp.add_lex_disambig()
    topo = generate_hmm_topo(
        non_sil_phones=lp.get_non_sil_phone_ids(),
        sil_phone=lp.get_sil_phone_id(),
    )
    npc = topo.get_phone_to_num_pdf_classes()
    sil = lp.get_sil_phone_id()
    max_phone = max(topo.phones)

    next_pdf = [0]

    def leaves(n_classes):
        first = next_pdf[0]
        next_pdf[0] += n_classes
        return TableEventMap.from_answers(
            K_PDF_CLASS, {c: first + c for c in range(n_classes)}
        )

    table = {}
    for p in topo.phones:
        if p == sil:
            table[p] = leaves(npc[p])
        else:
            table[p] = TableEventMap(
                0, {left: leaves(npc[p]) for left in range(max_phone + 1)}
            )
    tree = ContextDependency(N=3, P=1, to_pdf=TableEventMap(1, table))
    tm = TransitionModel(ctx_dep=tree, hmm_topo=topo)
    P = tree.num_pdfs

    means = rng.normal(0.0, 3.0, size=(P, dim))
    proto = DiagGmm(nmix=mix, dim=dim)
    proto.set_weights(np.full(mix, 1.0 / mix))
    proto.set_invvars_and_means(np.ones((mix, dim)), np.zeros((mix, dim)))
    proto.compute_gconsts()
    am = AmDiagGmm()
    am.init(proto, P)
    for p in range(P):
        g = am.get_pdf(p)
        g.set_invvars_and_means(
            np.ones((mix, dim)),
            means[p] + 0.25 * rng.standard_normal((mix, dim)),
        )
        g.compute_gconsts()

    L = make_lexicon_fst_with_silence(lexiconp=lp, sil_prob=0.5,
                                      sil_phone="SIL")
    gc = TrainingGraphCompiler(tm, tree, L,
                               disambig_syms=lp.disambig_phone_ids())
    id2pdf = tm.id2pdf_array()
    lm_words = [w for w in lp.word2id.values()
                if w > 0 and not lp.id2word[w].startswith(("<", "#"))]
    feats = np.zeros((num_utts, frames_per_utt, dim), dtype=np.float32)
    for u in range(num_utts):
        words = [lm_words[int(rng.integers(len(lm_words)))]
                 for _ in range(words_per_utt)]
        g = gc.compile_graph_from_text(words)
        res = equal_align(g, frames_per_utt, rng)
        assert res is not None
        pdfs = id2pdf[np.asarray(res[0])]
        feats[u] = means[pdfs] + 0.5 * rng.standard_normal(
            (frames_per_utt, dim)
        )

    pm = am.pack(mix_pad_to=8, dim_pad_to=1)
    return {
        "model": (pm.gconsts, pm.means_invvars, pm.inv_vars),
        "feats": feats,
        "system": (lp, tm, tree, am, gc),
        "num_pdfs": P,
    }


def estep_flops(problem):
    """Analytic FLOPs of one E-step (the two scoring GEMMs dominate;
    stats one-hot GEMMs included, DP/elementwise ignored)."""
    B, T, D = problem["feats"].shape
    P, K = problem["model"][0].shape
    return 4 * B * T * P * K * D + 4 * B * T * P * D


def run_estep(problem, device, iters, acoustic_scale=0.1, compute_dtype=None,
              pallas_scoring=False, per_state_scoring=False):
    """Returns wall seconds per E-step (align + acc-stats) on `device`.

    per_state_scoring=True scores only each graph state's pdf
    (gmm.likelihoods.loglikes_per_state -> sac-mode banded Viterbi):
    O(S) instead of O(P) scoring work — the triphone fast path.
    Requires the banded tables.
    """
    import jax
    import jax.numpy as jnp

    from khg_tpu.align.packed import uniform_dest_pdf
    from khg_tpu.align.pallas_banded import viterbi_align_banded
    from khg_tpu.align.viterbi import viterbi_align_batch
    from khg_tpu.gmm.likelihoods import loglikes as gmm_loglikes
    from khg_tpu.gmm.likelihoods import loglikes_per_state
    from khg_tpu.gmm.pallas_kernels import loglikes_pallas
    from khg_tpu.stats.accum import accumulate_am_stats

    put = lambda x: jax.device_put(jnp.asarray(x), device)  # noqa: E731
    gconsts, miv, iv = (put(x) for x in problem["model"])
    feats = put(problem["feats"])
    lens = put(problem["lens"])
    id2pdf = put(problem["id2pdf"])
    banded = problem.get("banded")
    use_banded = banded is not None and device.platform != "cpu"
    if use_banded:
        from khg_tpu.align.pallas_banded import banded_vmem_bytes, pick_block_b

        Bb, DKb, Sb = banded.plane_cost.shape
        block_b = pick_block_b(
            banded_vmem_bytes, Bb, DKb, Sb,
            problem["feats"].shape[1], int(problem["id2pdf"].max()) + 1,
        )
        use_banded = block_b is not None
    if use_banded:
        graphs = jax.tree.map(put, banded)
        offsets = problem["offsets"]
    else:
        graphs = jax.tree.map(put, problem["graphs"])
        state_pdf = uniform_dest_pdf(problem["graphs"])
        uniform = state_pdf is not None

    if per_state_scoring:
        assert use_banded, "per-state scoring needs the banded tables"
        spdf = put(problem["banded"].state_pdf)
        from khg_tpu.gmm.likelihoods import component_scores_per_state
        from khg_tpu.stats.accum import accumulate_am_stats_local

        @jax.jit
        def estep_ps(gconsts, miv, iv, graphs, feats, lens, id2pdf):
            # ONE per-state component-score GEMM feeds both the
            # alignment scoring (logsumexp -> sac) and the local-state
            # stats fold — no full-P work anywhere in the E-step
            ssk = component_scores_per_state(
                gconsts, miv, iv, spdf, feats, compute_dtype=compute_dtype
            )
            sac = jax.nn.logsumexp(ssk, axis=-1)
            res = viterbi_align_banded(
                graphs, offsets, None, lens, id2pdf,
                acoustic_scale=acoustic_scale, block_b=block_b, sac=sac,
            )
            T = feats.shape[1]
            fw = (
                (jnp.arange(T)[None, :] < lens[:, None]) & ~res.failed[:, None]
            ).astype(jnp.float32)
            stats = accumulate_am_stats_local(
                gconsts, miv, iv, feats, id2pdf[res.tids], fw, spdf,
                # stats need f32/HIGHEST scores; reuse only when the
                # scoring pass computed them at that precision
                state_scores=ssk if compute_dtype is None else None,
            )
            return (res.tids, stats.occ, stats.mean_acc, stats.var_acc,
                    stats.tot_log_like)

        args = (gconsts, miv, iv, graphs, feats, lens, id2pdf)
        out = estep_ps(*args)
        float(out[-1])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = estep_ps(*args)
        float(out[-1])
        return (time.perf_counter() - t0) / iters, out

    if use_banded:
        from khg_tpu.stats.accum import _SCORES_ALL_MAX_BYTES
        from khg_tpu.stats.accum import accumulate_am_stats_local

        spdf_full = put(problem["banded"].state_pdf)
        B_, T_ = problem["feats"].shape[:2]
        P_, K_ = problem["model"][0].shape
        # local fold only where the all-pdf GEMM branch would not engage
        # (the wide-model gather regime it replaces); at monophone scale
        # the fused GEMM branch CSEs with scoring and stays optimal
        local_stats = B_ * T_ * P_ * K_ * 4 > _SCORES_ALL_MAX_BYTES
    else:
        local_stats = False

    @jax.jit
    def estep(gconsts, miv, iv, graphs, feats, lens, id2pdf):
        if pallas_scoring:
            ll = loglikes_pallas(
                gconsts, miv, iv, feats, compute_dtype=compute_dtype,
                interpret=device.platform == "cpu",
            )
        else:
            ll = gmm_loglikes(
                gconsts, miv, iv, feats, compute_dtype=compute_dtype
            )
        if use_banded:
            res = viterbi_align_banded(
                graphs, offsets, ll, lens, id2pdf,
                acoustic_scale=acoustic_scale, block_b=block_b,
            )
        else:
            res = viterbi_align_batch(
                graphs, ll, lens, id2pdf, acoustic_scale=acoustic_scale,
                state_pdf=graphs.in_pdf[:, :, 0] if uniform else None,
            )
        T = feats.shape[1]
        fw = (
            (jnp.arange(T)[None, :] < lens[:, None]) & ~res.failed[:, None]
        ).astype(jnp.float32)
        if local_stats:
            # local-state fold: the stats GEMMs scale with S, not P —
            # at triphone scale the old (N, P) one-hot fold dominated
            # the whole E-step
            stats = accumulate_am_stats_local(
                gconsts, miv, iv, feats, id2pdf[res.tids], fw, spdf_full
            )
        else:
            stats = accumulate_am_stats(
                gconsts, miv, iv, feats, id2pdf[res.tids], fw
            )
        return res.tids, stats.occ, stats.mean_acc, stats.var_acc, stats.tot_log_like

    args = (gconsts, miv, iv, graphs, feats, lens, id2pdf)
    # NOTE: sync via a VALUE FETCH, not block_until_ready — the axon
    # backend's readiness signal returns before execution completes, which
    # inflates throughput ~100x.  Device execution is FIFO, so fetching a
    # scalar from the LAST iteration's output bounds all N executions; the
    # single fetch RTT amortizes over iters.
    out = estep(*args)  # compile + warm
    float(out[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = estep(*args)
    float(out[-1])
    return (time.perf_counter() - t0) / iters, out


_HBM_BW = 819e9  # v5e HBM ~819 GB/s


def monophone_floor_audit(problem, device, fused_s, iters=20):
    """Per-stage structural-floor audit of the BENCH-DEFAULT monophone
    E-step (VERDICT r4 weak #1: the 81k headline needs the same
    treatment the triphone step got in BENCH.md r4).

    Measures each stage as its own jit and computes a LOWER bound per
    stage (unpadded FLOPs at the 6-pass-HIGHEST MXU peak, materialized
    operand streams at HBM bandwidth, sequential-DP latency taken as
    measured), then reports measured/floor.  Floors use UNPADDED work,
    so pct_of_structural_floor is conservative (padding only raises the
    true cost).  Returns a dict of mono_* keys.
    """
    import jax
    import jax.numpy as jnp

    from khg_tpu.align.pallas_banded import (
        banded_vmem_bytes,
        pick_block_b,
        viterbi_align_banded,
    )
    from khg_tpu.gmm.likelihoods import loglikes as gmm_loglikes
    from khg_tpu.stats.accum import accumulate_am_stats

    put = lambda x: jax.device_put(jnp.asarray(x), device)  # noqa: E731
    gconsts, miv, iv = (put(x) for x in problem["model"])
    feats = put(problem["feats"])
    lens = put(problem["lens"])
    id2pdf = put(problem["id2pdf"])
    B, T, D = problem["feats"].shape
    P, K = problem["model"][0].shape
    N = B * T

    def timeit(fn):
        out = fn()
        float(np.asarray(out).ravel()[0])  # fetch-sync (axon gotcha)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        float(np.asarray(out).ravel()[0])
        return (time.perf_counter() - t0) / iters

    # --- stage timings (standalone jits).  Each jit reduces its output
    # to a scalar: fetch-syncing on the full (B, T, P) tensor would
    # charge the stage for an output materialization the fused step
    # never performs (measured 36 ms vs 16 ms for the WHOLE fused step).
    # Every stage is individually guarded: remote compiles flake
    # (HTTP 500 from the compile helper) and partial keys beat none.
    t_score = ll = None
    try:
        score_fn = jax.jit(
            lambda: jnp.sum(gmm_loglikes(gconsts, miv, iv, feats))
        )
        t_score = timeit(score_fn)
        ll = jax.jit(lambda: gmm_loglikes(gconsts, miv, iv, feats))()
    except Exception as e:
        print(f"floor audit: scoring stage failed: {e}", file=sys.stderr)

    banded = problem.get("banded")
    t_vit = None
    if banded is not None and ll is not None:
        bb = pick_block_b(
            banded_vmem_bytes, *banded.plane_cost.shape, T,
            int(problem["id2pdf"].max()) + 1,
        )
        if bb is not None:
            try:
                graphs = jax.tree.map(put, banded)
                offs = problem["offsets"]
                vit_fn = jax.jit(lambda: viterbi_align_banded(
                    graphs, offs, ll, lens, id2pdf,
                    acoustic_scale=0.1, block_b=bb,
                    interpret=device.platform == "cpu",
                ).total_cost)
                t_vit = timeit(vit_fn)
            except Exception as e:
                # the STANDALONE kernel jit can hit the swallowed Mosaic
                # compile-failure class even though the fused step's
                # instance of the same kernel compiles (observed:
                # tpu_compile_helper exit 1); the audit then reports the
                # DP via the fused-minus-stages residual instead
                print(f"floor audit: standalone viterbi failed: {e}",
                      file=sys.stderr)

    t_stats = None
    try:
        pdf_ids = put(
            np.asarray(problem["id2pdf"])[
                np.ones((B, T), np.int32)  # valid tid; shapes matter only
            ]
        )
        fw = put(np.ones((B, T), np.float32))
        stats_fn = jax.jit(lambda: jnp.sum(accumulate_am_stats(
            gconsts, miv, iv, feats, pdf_ids, fw
        ).occ))
        t_stats = timeit(stats_fn)
    except Exception as e:
        print(f"floor audit: stats stage failed: {e}", file=sys.stderr)

    # --- structural floors (true lower bounds)
    peak = _PEAK_F32_6PASS
    # scoring: one (N, 2D) x (2D, P*K) GEMM + logsumexp epilogue that
    # streams the (N, P*K) score lattice
    f_score = (2 * N * 2 * D * P * K) / peak + (N * P * K * 4) / _HBM_BW
    # stats (fused marginal): scores_all CSE-shared with scoring; the
    # moment GEMM (P, N) x (N, K*2D) dominates, plus its materialized
    # (N, K*2D) operand stream (write+read) and the (N, P*K) re-read
    f_stats = (
        (2 * N * P * K * 2 * D) / peak
        + (2 * N * K * 2 * D * 4 + N * P * K * 4) / _HBM_BW
    )
    # banded Viterbi: inherently sequential DP (T dependent steps);
    # latency-bound by construction — its floor is taken as measured
    f_vit = t_vit if t_vit is not None else 0.0
    floor = f_score + f_stats + f_vit

    out = {
        "mono_fused_ms": round(fused_s * 1e3, 2),
        "mono_scoring_floor_ms": round(f_score * 1e3, 2),
        "mono_stats_floor_ms": round(f_stats * 1e3, 2),
        "mono_structural_floor_ms": round(floor * 1e3, 2),
        "mono_pct_of_structural_floor": round(
            100.0 * floor / fused_s, 1
        ),
        "mono_shapes_BTPKD": [B, T, P, K, D],
    }
    if t_score is not None:
        out["mono_scoring_ms"] = round(t_score * 1e3, 2)
    if t_stats is not None:
        out["mono_stats_ms"] = round(t_stats * 1e3, 2)
    if t_score is not None and t_stats is not None:
        # DP + glue as seen by the fused step (standalone stage times
        # overlap-confounded; negative values mean XLA overlaps stages)
        out["mono_residual_ms"] = round(
            (fused_s - t_score - t_stats) * 1e3, 2
        )
    if t_vit is not None:
        out["mono_viterbi_ms"] = round(t_vit * 1e3, 2)
    return out


def run_scoring(problem, device, iters=20, compute_dtype=None):
    """Seconds per full-P Pallas scoring pass alone (the dense GEMM the
    MFU claim is about), fetch-synchronized via a scalar slice."""
    import jax
    import jax.numpy as jnp

    from khg_tpu.gmm.pallas_kernels import loglikes_pallas

    put = lambda x: jax.device_put(jnp.asarray(x), device)  # noqa: E731
    gconsts, miv, iv = (put(x) for x in problem["model"])
    feats = put(problem["feats"])
    fn = jax.jit(lambda: loglikes_pallas(
        gconsts, miv, iv, feats, compute_dtype=compute_dtype,
        interpret=device.platform == "cpu",
    ))
    out = fn()
    float(out.ravel()[0])  # device-side slice: 4-byte fetch, FIFO bound
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def run_decode(problem, device, num_utts=16, warm=2):
    """Test-set lattice decoding xRT: device GMM scoring (one batched
    GEMM + fetch) followed by native lattice-faster decoding + best
    path per utterance, over a full HCLG (digits lexicon, unigram LM).

    Returns (wall seconds per audio second i.e. xRT, backend name).
    The reference's comparison point is its compiled C++
    LatticeFasterDecoderTpl (csrc/lattice-faster-decoder.cc:86-893),
    which decodes yesno well under real time on CPU.
    """
    import jax
    import jax.numpy as jnp

    from khg_tpu.decode.arpa import arpa_to_fst
    from khg_tpu.decode.graph import build_hclg
    from khg_tpu.decode.lattice import (
        LatticeFasterDecoder,
        LatticeFasterDecoderConfig,
        decode_utterance_lattice_faster,
    )
    from khg_tpu.gmm.likelihoods import loglikes as gmm_loglikes

    lp, tm, tree, am, gc = problem["system"]
    lm_words = [
        lp.id2word[w] for w in lp.word2id.values()
        if w > 0 and not lp.id2word[w].startswith(("<", "#"))
    ]
    arpa = "\\data\\\nngram 1=%d\n\n\\1-grams:\n" % (len(lm_words) + 2)
    for w in lm_words:
        arpa += f"-1\t{w}\n"
    arpa += "-99 <s>\n-1 </s>\n\n\\end\\\n"
    G = arpa_to_fst(arpa, lp.word2id)
    hclg = build_hclg(lp, G, tm, tree, self_loop_scale=0.1)
    decoder = LatticeFasterDecoder(
        hclg,
        LatticeFasterDecoderConfig(
            beam=16.0, max_active=7000, min_active=200, lattice_beam=8.0
        ),
    )
    backend = "native" if decoder._use_native() else "python"
    id2pdf = tm.id2pdf_array()
    feats = problem["feats"][:num_utts]
    audio_sec = feats.shape[0] * feats.shape[1] / 100.0

    put = lambda x: jax.device_put(jnp.asarray(x), device)  # noqa: E731
    gconsts, miv, iv = (put(x) for x in problem["model"])
    dev_feats = put(feats)
    score = jax.jit(lambda f: gmm_loglikes(gconsts, miv, iv, f))
    np.asarray(score(dev_feats))  # compile + warm

    from khg_tpu.decode.score_stream import stream_scores

    def one_pass(fetch_dtype=None):
        # per-utterance fetches streamed behind the host decode (at
        # wide-model scale the f32 score tensor is ~59 MB and the
        # tunnel transfer dominated the serialized measurement)
        n_ok = 0
        for ll in stream_scores(score(dev_feats), fetch_dtype=fetch_dtype):
            ok, tids, words, _ = decode_utterance_lattice_faster(
                decoder, ll, id2pdf, acoustic_scale=0.1
            )
            n_ok += ok
        return n_ok

    def one_pass_parallel(fetch_dtype=None):
        from khg_tpu.decode.lattice import decode_utterances_parallel

        out = decode_utterances_parallel(
            decoder,
            stream_scores(score(dev_feats), fetch_dtype=fetch_dtype),
            id2pdf, acoustic_scale=0.1,
        )
        return sum(ok for ok, *_ in out)

    assert one_pass() == num_utts
    for _ in range(warm - 1):
        one_pass()
    t0 = time.perf_counter()
    one_pass()
    xrt = (time.perf_counter() - t0) / audio_sec
    one_pass_parallel()
    t0 = time.perf_counter()
    assert one_pass_parallel() == num_utts
    xrt_par = (time.perf_counter() - t0) / audio_sec
    # half-width score fetch (word outputs pinned unchanged by
    # tests/test_score_stream.py): the option that matters when the
    # host link, not the decoder, is the wall
    one_pass_parallel(fetch_dtype="float16")
    t0 = time.perf_counter()
    assert one_pass_parallel(fetch_dtype="float16") == num_utts
    xrt_par16 = (time.perf_counter() - t0) / audio_sec

    # --- decomposition (VERDICT r4 weak #2): the combined keys mix
    # session-dependent tunnel transfer with host decode; these split
    # them so rounds compare like with like.
    comp = {}
    host_lls = [np.array(x) for x in stream_scores(score(dev_feats))]
    from khg_tpu.decode.lattice import decode_utterances_parallel

    def host_serial():
        return sum(
            decode_utterance_lattice_faster(
                decoder, ll, id2pdf, acoustic_scale=0.1
            )[0]
            for ll in host_lls
        )

    assert host_serial() == num_utts
    t0 = time.perf_counter()
    host_serial()
    comp["host_xrt"] = (time.perf_counter() - t0) / audio_sec
    decode_utterances_parallel(
        decoder, host_lls, id2pdf, acoustic_scale=0.1
    )
    t0 = time.perf_counter()
    decode_utterances_parallel(
        decoder, host_lls, id2pdf, acoustic_scale=0.1
    )
    comp["host_parallel_xrt"] = (time.perf_counter() - t0) / audio_sec
    for dt, key in ((None, "fetch_xrt"), ("float16", "fetch_f16_xrt")):
        list(stream_scores(score(dev_feats), fetch_dtype=dt))
        t0 = time.perf_counter()
        # consume-only: transfer + (for f16) the host-side up-cast
        for ll in stream_scores(score(dev_feats), fetch_dtype=dt):
            ll.ravel()[0]
        comp[key] = (time.perf_counter() - t0) / audio_sec
    return xrt, xrt_par, xrt_par16, backend, comp


def run_corpus_em_resident(problem, num_utts=512, passes=3):
    """Device-resident corpus EM at wide-model scale: per-state carry
    E-step + on-device M-step via EStepPipeline.em_pass_resident — the
    model and the 42 MB of stats stay on the chip; the host fetches only
    tid counts + summary scalars per pass.  Returns audio-sec/s."""
    from khg_tpu.recipes.pipeline import EStepPipeline

    lp, tm, tree, am, gc = problem["system"]
    frames, dim = problem["feats"].shape[1:3]
    rng = np.random.default_rng(2)
    feats = [rng.standard_normal((frames, dim)).astype(np.float32)
             for _ in range(num_utts)]
    ng = len(problem["packed_graphs"])
    packed = [problem["packed_graphs"][i % ng] for i in range(num_utts)]
    pipeline = EStepPipeline(
        tm, acoustic_scale=0.1, batch_size=64,
        mix_pad_multiple=8, align_backend="banded",
    )
    model = pipeline.pack_model_device(am)
    model, counts, res = pipeline.em_pass_resident(model, packed, feats)
    assert res.num_done == num_utts, res.num_error
    model, counts, res = pipeline.em_pass_resident(model, packed, feats)
    t0 = time.perf_counter()
    for _ in range(passes):
        model, counts, res = pipeline.em_pass_resident(model, packed, feats)
    per = (time.perf_counter() - t0) / passes
    return num_utts * frames / 100.0 / per


def run_corpus_em_multipass(num_utts=1024, frames=500, dim=80, passes=6):
    """Fully-resident multi-pass EM: model, stats carry, transition
    model, AND graph costs live on the chip (device transition update +
    device cost-delta refresh, khg_tpu/model/transition_device.py);
    the host dispatches async and fetches one record block at the end.
    This removes the one tunnel round-trip per pass that bounds
    run_corpus_em.  Returns steady-state audio-sec/s per pass."""
    from khg_tpu.recipes.pipeline import EStepPipeline

    problem = build_problem(num_graphs=16, batch=16, frames=frames, dim=dim)
    lp, tm, tree, am, gc = problem["system"]
    rng = np.random.default_rng(1)
    feats = [rng.standard_normal((frames, dim)).astype(np.float32)
             for _ in range(num_utts)]
    pipeline = EStepPipeline(
        tm, acoustic_scale=0.1, batch_size=256,
        transition_scale=1.0, self_loop_scale=0.1,
        mix_pad_multiple=8, align_backend="banded",
    )
    base16 = pipeline.pack_graphs_base(problem["graph_fsts"])
    base = [base16[i % 16] for i in range(num_utts)]
    model = pipeline.pack_model_device(am)
    model, rec = pipeline.em_passes_resident(model, base, feats, 2)
    assert rec[:, 4].sum() == 0, "alignment failures in warmup"
    t0 = time.perf_counter()
    model, rec = pipeline.em_passes_resident(model, base, feats, passes)
    per_pass = (time.perf_counter() - t0) / passes
    return num_utts * frames / 100.0 / per_pass


def run_corpus_em_multipass_resident(problem, num_utts=512, passes=6):
    """Wide-model (triphone-scale) fully-resident multi-pass EM: the
    per-state banded E-step, M-step, transition update AND graph-cost
    refresh all on device, one fetch per stretch (vs one per pass for
    run_corpus_em_resident).  Returns audio-sec/s per pass."""
    from khg_tpu.recipes.pipeline import EStepPipeline

    lp, tm, tree, am, gc = problem["system"]
    frames, dim = problem["feats"].shape[1:3]
    rng = np.random.default_rng(2)
    feats = [rng.standard_normal((frames, dim)).astype(np.float32)
             for _ in range(num_utts)]
    pipeline = EStepPipeline(
        tm, acoustic_scale=0.1, batch_size=64,
        transition_scale=1.0, self_loop_scale=0.1,
        mix_pad_multiple=8, align_backend="banded",
    )
    ng = len(problem["graph_fsts"])
    base_u = pipeline.pack_graphs_base(problem["graph_fsts"])
    base = [base_u[i % ng] for i in range(num_utts)]
    model = pipeline.pack_model_device(am)
    model, rec = pipeline.em_passes_resident(model, base, feats, passes)
    assert rec[:, 4].sum() == 0, "alignment failures in warmup"
    t0 = time.perf_counter()
    model, rec = pipeline.em_passes_resident(model, base, feats, passes)
    per = (time.perf_counter() - t0) / passes
    return num_utts * frames / 100.0 / per


def run_corpus_fb_em_multipass(num_utts=1024, frames=500, dim=80, passes=6):
    """Fully-resident multi-pass SOFT EM (Baum-Welch): same carry
    architecture as run_corpus_em_multipass but the E-step is the
    forward-backward pass (pipeline.fb_em_passes_resident) — expected
    posteriors feed the stats GEMMs and the transition update runs on
    expected counts.  Returns steady-state audio-sec/s per pass, putting
    the soft path's cost on record next to the hard path's
    (VERDICT r4 weak #4)."""
    from khg_tpu.recipes.pipeline import EStepPipeline

    problem = build_problem(num_graphs=16, batch=16, frames=frames, dim=dim)
    lp, tm, tree, am, gc = problem["system"]
    rng = np.random.default_rng(1)
    feats = [rng.standard_normal((frames, dim)).astype(np.float32)
             for _ in range(num_utts)]
    pipeline = EStepPipeline(
        tm, acoustic_scale=0.1, batch_size=256,
        transition_scale=1.0, self_loop_scale=0.1,
        mix_pad_multiple=8, align_backend="banded",
    )
    base16 = pipeline.pack_graphs_base(problem["graph_fsts"])
    base = [base16[i % 16] for i in range(num_utts)]
    model = pipeline.pack_model_device(am)
    model, rec = pipeline.fb_em_passes_resident(model, base, feats, 2)
    t0 = time.perf_counter()
    model, rec = pipeline.fb_em_passes_resident(model, base, feats, passes)
    per_pass = (time.perf_counter() - t0) / passes
    return num_utts * frames / 100.0 / per_pass


def run_corpus_em(num_utts=1024, frames=500, dim=80, passes=3):
    """Steady-state wall seconds per EM pass through EStepPipeline
    (the user-facing corpus loop: pipelined batches, feature cache,
    vectorized transition-cost refresh, host M-step accumulators)."""
    from khg_tpu.recipes.pipeline import EStepPipeline
    from khg_tpu.stats.accum import AccumAmDiagGmm

    problem = build_problem(num_graphs=16, batch=16, frames=frames, dim=dim)
    lp, tm, tree, am, gc = problem["system"]
    rng = np.random.default_rng(1)
    feats = [rng.standard_normal((frames, dim)).astype(np.float32)
             for _ in range(num_utts)]
    packed = [problem["packed_graphs"][i % 16] for i in range(num_utts)]
    pipeline = EStepPipeline(
        tm, acoustic_scale=0.1, batch_size=256,
        mix_pad_multiple=8, align_backend="banded",
    )

    def one_pass():
        accs = AccumAmDiagGmm()
        accs.init(am, flags=0b1111)
        tacc = tm.init_stats()
        res = pipeline.align_and_accumulate(
            am, packed, feats, accs, tacc,
            # stats-only EM pass: stats fold into a device-resident
            # carry, ONE device->host fetch for the whole pass
            return_alignments=False,
        )
        assert res.num_done == num_utts, res.num_error

    one_pass()  # compile + warm caches
    one_pass()  # steady state
    t0 = time.perf_counter()
    for _ in range(passes):
        one_pass()
    per_pass = (time.perf_counter() - t0) / passes

    # overhead breakdown (VERDICT r2 item 6): dispatch wall vs the one
    # end-of-pass carry fetch, plus the bare tunnel round-trip for scale
    import jax
    import jax.numpy as jnp

    timings = dict(getattr(pipeline, "last_carry_timings", {}))
    tiny = jnp.zeros(())
    float(tiny)  # materialize
    t1 = time.perf_counter()
    for _ in range(5):
        float(jnp.asarray(tiny) + 1.0)
    timings["bare_rtt_s"] = (time.perf_counter() - t1) / 5
    return per_pass, timings


def main():
    import jax

    from khg_tpu.utils.platform import ensure_backend

    if "--cpu-only" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    ensure_backend()

    problem = build_problem()
    batch, frames = problem["feats"].shape[:2]
    audio_seconds = batch * frames / 100.0

    default_dev = jax.devices()[0]
    on_tpu = default_dev.platform != "cpu"
    secs, out = run_estep(problem, default_dev, iters=50 if on_tpu else 2)
    value = audio_seconds / secs

    vs_baseline = None
    try:
        cpu_dev = jax.devices("cpu")[0]
        if on_tpu:
            cpu_secs, _ = run_estep(problem, cpu_dev, iters=1)
            vs_baseline = value / (audio_seconds / cpu_secs)
        else:
            vs_baseline = 1.0
    except Exception as e:  # CPU fallback missing: report raw value only
        print(f"baseline measurement failed: {e}", file=sys.stderr)

    extras = {}
    if on_tpu and "--headline-only" not in sys.argv:
        try:
            # VERDICT r4 weak #1: structural-floor audit of the headline
            extras.update(
                monophone_floor_audit(problem, default_dev, secs)
            )
        except Exception as e:
            print(f"monophone floor audit failed: {e}", file=sys.stderr)
        try:
            em_secs, em_timings = run_corpus_em()
            extras["corpus_em_pass_audio_sec_per_s"] = round(
                1024 * frames / 100.0 / em_secs, 1
            )
            extras["corpus_em_pass_pct_of_raw"] = round(
                100.0 * (1024 * frames / 100.0 / em_secs) / value, 1
            )
            if em_timings:
                extras["corpus_em_dispatch_ms"] = round(
                    em_timings.get("dispatch_s", 0) * 1e3, 1
                )
                extras["corpus_em_fetch_ms"] = round(
                    em_timings.get("fetch_s", 0) * 1e3, 1
                )
                extras["tunnel_rtt_ms"] = round(
                    em_timings.get("bare_rtt_s", 0) * 1e3, 1
                )
            # VERDICT r3 item 6a: the RTT-amortized number as a JSON key,
            # not just BENCH.md prose.  The end-of-pass fetch wall
            # OVERLAPS the async-dispatched device compute, so no
            # subtraction recovers the co-located-host time; instead
            # MEASURE a 4x corpus, which amortizes the one irreducible
            # tunnel round-trip per pass over 4x the compute (BENCH.md
            # round-3 breakdown: the residual vs raw is exactly that
            # RTT).
        except Exception as e:
            print(f"corpus EM measurement failed: {e}", file=sys.stderr)
        # each sub-benchmark gets its own try so one failure (e.g. an
        # alignment blip in a warmup) doesn't drop sibling metrics
        try:
            em4_secs, _ = run_corpus_em(num_utts=4096)
            extras["corpus_em_pass_4096utt_audio_sec_per_s"] = round(
                4096 * frames / 100.0 / em4_secs, 1
            )
            extras["corpus_em_pass_4096utt_pct_of_raw"] = round(
                100.0 * (4096 * frames / 100.0 / em4_secs) / value, 1
            )
        except Exception as e:
            print(f"4096-utt corpus EM failed: {e}", file=sys.stderr)
        mp = None
        try:
            # fully-resident multi-pass loop: device transition update +
            # device cost refresh kill the per-pass round-trip entirely
            mp = run_corpus_em_multipass()
            extras["corpus_em_multipass_resident_audio_sec_per_s"] = round(
                mp, 1
            )
            extras["corpus_em_multipass_resident_pct_of_raw"] = round(
                100.0 * mp / value, 1
            )
        except Exception as e:
            print(f"multipass corpus EM failed: {e}", file=sys.stderr)
        try:
            # soft-EM (Baum-Welch) twin of the resident multi-pass loop
            fbmp = run_corpus_fb_em_multipass()
            extras["corpus_fb_em_multipass_resident_audio_sec_per_s"] = (
                round(fbmp, 1)
            )
            if mp:
                extras["corpus_fb_em_multipass_resident_pct_of_hard"] = (
                    round(100.0 * fbmp / mp, 1)
                )
        except Exception as e:
            print(f"multipass corpus FB EM failed: {e}", file=sys.stderr)
        try:
            xrt, xrt_par, xrt_par16, backend, comp = run_decode(
                problem, default_dev
            )
            extras["decode_lattice_xrt"] = round(xrt, 5)
            extras["decode_audio_sec_per_s"] = round(1.0 / xrt, 1)
            extras["decode_parallel_xrt"] = round(xrt_par, 5)
            extras["decode_parallel_f16_xrt"] = round(xrt_par16, 5)
            extras["decode_backend"] = backend
            for k, v in comp.items():
                extras[f"decode_{k}"] = round(v, 5)
        except Exception as e:
            print(f"decode measurement failed: {e}", file=sys.stderr)
        try:
            tri = build_problem(
                num_graphs=8, batch=64, frames=300, dim=80, mix=32,
                num_phones=682, words_per_utt=3,
            )
            tb, tf = tri["feats"].shape[:2]
            t_audio = tb * tf / 100.0
            flops = estep_flops(tri)
            # primary: per-state scoring (O(S) not O(P)) + sac-mode
            # banded Viterbi + local-state stats fold — the triphone
            # fast path (every stage's work scales with S, not P)
            tps, _ = run_estep(tri, default_dev, iters=5,
                               per_state_scoring=True)
            extras["triphone_audio_sec_per_s"] = round(t_audio / tps, 1)
            # reference points: full-P fused Pallas scoring (logsumexp
            # in the GEMM epilogue) + banded external-acoustic, in f32
            # (HIGHEST, 6-pass) and bf16 (MXU native, f32 accumulate)
            t32, _ = run_estep(tri, default_dev, iters=3,
                               pallas_scoring=True)
            extras["triphone_fullP_f32_audio_sec_per_s"] = round(
                t_audio / t32, 1
            )
            extras["triphone_fullP_f32_tflops"] = round(
                flops / t32 / 1e12, 1
            )
            extras["triphone_fullP_f32_mfu_pct_vs_33tf_6pass_peak"] = round(
                100.0 * flops / t32 / _PEAK_F32_6PASS, 1
            )
            tbf, _ = run_estep(tri, default_dev, iters=3,
                               pallas_scoring=True,
                               compute_dtype="bfloat16")
            extras["triphone_fullP_bf16_audio_sec_per_s"] = round(
                t_audio / tbf, 1
            )
            extras["triphone_fullP_bf16_tflops"] = round(
                flops / tbf / 1e12, 1
            )
            extras["triphone_fullP_bf16_mfu_pct_vs_197tf_peak"] = round(
                100.0 * flops / tbf / _PEAK_BF16, 1
            )
            # scoring GEMM alone (no DP/stats): the MXU utilization of
            # the dense compute itself, against the audited peaks
            _P, _K = tri["model"][0].shape
            score_flops = 4 * tb * tf * _P * _K * tri["feats"].shape[2]
            s32 = run_scoring(tri, default_dev, iters=10)
            extras["triphone_scoring_f32_tflops"] = round(
                score_flops / s32 / 1e12, 1
            )
            extras["triphone_scoring_f32_mfu_pct_vs_33tf_6pass_peak"] = (
                round(100.0 * score_flops / s32 / _PEAK_F32_6PASS, 1)
            )
            sbf = run_scoring(tri, default_dev, iters=10,
                              compute_dtype="bfloat16")
            extras["triphone_scoring_bf16_tflops"] = round(
                score_flops / sbf / 1e12, 1
            )
            extras["triphone_scoring_bf16_mfu_pct_vs_197tf_peak"] = round(
                100.0 * score_flops / sbf / _PEAK_BF16, 1
            )
            extras["triphone_pdfs_x_mix"] = list(tri["model"][0].shape)
            # device-resident corpus EM at triphone scale: stats fold +
            # M-step consume the carry ON DEVICE; the host fetches only
            # tid counts + scalars.  The alternative (fetching the
            # P*K*(2D+1) stats = 42 MB/pass) costs ~1.7 s through this
            # container's tunnel and capped the wide-model corpus rate
            # at ~700 audio-sec/s.
            extras["triphone_corpus_resident_audio_sec_per_s"] = round(
                run_corpus_em_resident(tri), 1
            )
            # ...and the fully-resident multi-pass variant (device
            # transition update + cost refresh, one fetch per stretch)
            extras["triphone_corpus_multipass_resident_audio_sec_per_s"] = (
                round(run_corpus_em_multipass_resident(tri), 1)
            )
        except Exception as e:
            print(f"triphone measurement failed: {e}", file=sys.stderr)
        try:
            td = build_triphone_decode_problem()
            xrt3, xrt3p, xrt3p16, backend3, comp3 = run_decode(
                td, default_dev, num_utts=td["feats"].shape[0]
            )
            extras["decode_triphone_xrt"] = round(xrt3, 5)
            extras["decode_triphone_parallel_xrt"] = round(xrt3p, 5)
            extras["decode_triphone_parallel_f16_xrt"] = round(xrt3p16, 5)
            extras["decode_triphone_pdfs"] = td["num_pdfs"]
            extras["decode_triphone_backend"] = backend3
            for k, v in comp3.items():
                extras[f"decode_triphone_{k}"] = round(v, 5)
        except Exception as e:
            print(f"triphone decode measurement failed: {e}",
                  file=sys.stderr)

    rec = {
        "metric": "align+acc-stats throughput (audiomnist-scale monophone)",
        "value": round(value, 2),
        "unit": "audio-sec/s/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
    }
    rec.update(extras)
    print(json.dumps(rec))


def _merge_corpus_train(line: str, tpu_ok: bool) -> str:
    """Run the corpus-scale training recipe (its own subprocess + its
    own budget — a >=10k-utt flat-start->mix-up->resident-EM->WER run is
    minutes of wall time, far over the 540 s inner watchdog) and merge
    its corpus_train_* keys into the bench record.  The exp dir is
    persistent and every stage resumes, so an interrupted attempt picks
    up where it left off on the next bench run.  Failures leave the main
    record untouched."""
    import subprocess

    if not tpu_ok or os.environ.get("KHG_BENCH_NO_CORPUS_TRAIN"):
        return line
    repo = os.path.dirname(os.path.abspath(__file__))
    runner = os.path.join(repo, "egs", "audiomnist_10k", "run.py")
    exp = os.environ.get("KHG_BENCH_TRAIN_EXP", "/tmp/khg_bench_10k")
    utts = os.environ.get("KHG_BENCH_TRAIN_UTTS", "10000")
    try:
        proc = subprocess.run(
            [sys.executable, "-u", runner, "--exp-dir", exp,
             "--num-utts", utts, "--json"],
            capture_output=True, text=True, timeout=2400,
        )
        out = None
        for ln in reversed(proc.stdout.splitlines()):
            ln = ln.strip()
            if ln.startswith("{") and "corpus_train" in ln:
                out = json.loads(ln)
                break
        if out is None:
            print(
                f"corpus train produced no record (rc={proc.returncode}):"
                f" {proc.stdout[-1000:]} {proc.stderr[-1000:]}",
                file=sys.stderr,
            )
            return line
        rec = json.loads(line)
        rec.update(out)
        return json.dumps(rec)
    except Exception as e:
        print(f"corpus train bench failed: {e}", file=sys.stderr)
        return line


def orchestrate():
    """Run the measurement in a subprocess with a watchdog.

    The TPU tunnel in this environment can wedge hard (even device
    enumeration hangs in native code, unkillable from Python).  Running
    the measurement in a child process bounds the damage: on timeout we
    retry with the headline measurement only, then fall back to a
    CPU-only measurement, and always emit one JSON line.
    """
    import subprocess

    here = os.path.abspath(__file__)
    # the full run covers ~20 sub-benchmarks (floor audit, corpus EM
    # hard+soft, decode + decomposition, triphone suite) — give it a
    # budget sized to that, with the quick headline pass as the wedge
    # detector fallback
    for args, note, budget in [
        ([], None, 1800),
        (["--headline-only"], "headline-only: full run timed out", 420),
        (["--cpu-only"], "cpu-fallback: TPU unavailable", 540),
    ]:
        try:
            proc = subprocess.run(
                [sys.executable, "-u", here, "--inner", *args],
                capture_output=True, text=True, timeout=budget,
            )
        except subprocess.TimeoutExpired:
            continue
        # surface the inner run's diagnostics (failed sub-benchmarks,
        # kernel demotions) — otherwise they vanish with the subprocess
        for ln in proc.stderr.splitlines()[-30:]:
            print(f"[inner] {ln}", file=sys.stderr)
        for line in reversed(proc.stdout.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                if note:
                    rec = json.loads(line)
                    rec["metric"] += f" ({note})"
                    line = json.dumps(rec)
                # corpus train needs only a live TPU — run it for the
                # full AND headline-only outcomes
                line = _merge_corpus_train(
                    line, "cpu" not in (note or "")
                )
                print(line)
                return
    print(
        json.dumps(
            {
                "metric": "align+acc-stats throughput (TPU and CPU "
                "measurements both failed/timed out)",
                "value": 0.0,
                "unit": "audio-sec/s/chip",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    if "--inner" in sys.argv:
        main()
    else:
        orchestrate()
