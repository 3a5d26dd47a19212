"""Device transition update / cost deltas == host TransitionModel pair.

model/transition_device.py re-expresses TransitionModel.mle_update and
EStepPipeline.transition_cost_deltas as traceable device math so a
multi-pass EM stretch never returns to the host.  These tests pin both
against the host implementations on real topologies (sil + non-sil
phones, 5-state silence with its dense transition fan-out) across
random count vectors, including mincount-skipped and floored groups.
"""

import numpy as np
import jax.numpy as jnp

from khg_tpu.lang.topo import generate_hmm_topo
from khg_tpu.model.context_dep import monophone_context_dependency
from khg_tpu.model.transition_model import (
    MleTransitionUpdateConfig,
    TransitionModel,
)
from khg_tpu.model.transition_device import (
    build_transition_struct,
    transition_cost_deltas_device,
    transition_mle_update_device,
)


def build_tm(non_sil=(2, 3, 4), sil=1, num_sil_states=5):
    topo = generate_hmm_topo(
        non_sil_phones=list(non_sil), sil_phone=sil,
        num_sil_states=num_sil_states,
    )
    tree = monophone_context_dependency(
        topo.phones, topo.get_phone_to_num_pdf_classes()
    )
    return TransitionModel(ctx_dep=tree, hmm_topo=topo)


def _rand_counts(tm, rng, sparse=False):
    n = tm.num_transition_ids
    counts = rng.uniform(0.0, 300.0, n + 1).astype(np.float32)
    counts[0] = 0.0
    if sparse:
        counts[rng.uniform(size=n + 1) < 0.5] = 0.0
        # force some groups fully under mincount
        counts[1 : min(8, n + 1)] = 0.3
    return counts


def test_update_matches_host_exactly_on_decisions():
    tm = build_tm()
    struct = build_transition_struct(tm)
    rng = np.random.default_rng(0)
    for trial in range(4):
        counts = _rand_counts(tm, rng, sparse=trial % 2 == 1)
        cfg = MleTransitionUpdateConfig()
        host = tm  # mutate a fresh copy each trial
        import copy

        host = copy.deepcopy(tm)
        host.mle_update(counts.astype(np.float64), cfg)
        logp0 = np.asarray(tm.log_probs, dtype=np.float32)
        logp_new, objf, csum = transition_mle_update_device(
            jnp.asarray(counts), jnp.asarray(logp0), struct,
            floor=cfg.floor, mincount=cfg.mincount,
        )
        got = np.asarray(logp_new)
        want = np.asarray(host.log_probs, dtype=np.float32)
        np.testing.assert_allclose(got[1:], want[1:], rtol=0, atol=5e-6)
        # every discrete decision identical: floored entries match
        assert np.array_equal(
            np.isclose(np.exp(got[1:]), cfg.floor, rtol=1e-5),
            np.isclose(np.exp(want[1:]), cfg.floor, rtol=1e-5),
        )


def test_update_objf_and_count_match_host():
    tm = build_tm()
    struct = build_transition_struct(tm)
    rng = np.random.default_rng(3)
    counts = _rand_counts(tm, rng)
    import copy

    host = copy.deepcopy(tm)
    objf_h, csum_h = host.mle_update(
        counts.astype(np.float64), MleTransitionUpdateConfig()
    )
    logp0 = np.asarray(tm.log_probs, dtype=np.float32)
    _, objf_d, csum_d = transition_mle_update_device(
        jnp.asarray(counts), jnp.asarray(logp0), struct
    )
    np.testing.assert_allclose(float(objf_d), objf_h, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(csum_d), csum_h, rtol=1e-5)


def test_deltas_match_host_both_scale_regimes():
    from khg_tpu.recipes.pipeline import EStepPipeline

    tm = build_tm()
    # move off the flat start so the deltas are non-trivial
    rng = np.random.default_rng(1)
    import copy

    tm2 = copy.deepcopy(tm)
    tm2.mle_update(
        _rand_counts(tm, rng).astype(np.float64),
        MleTransitionUpdateConfig(),
    )
    struct = build_transition_struct(tm2)
    logp = jnp.asarray(np.asarray(tm2.log_probs, dtype=np.float32))
    for tscale, slscale in [(1.0, 1.0), (1.0, 0.1), (0.5, 2.0)]:
        pipe = EStepPipeline(
            tm2, transition_scale=tscale, self_loop_scale=slscale,
        )
        want = pipe.transition_cost_deltas()
        got = np.asarray(
            transition_cost_deltas_device(logp, struct, tscale, slscale)
        )
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)
        assert got[0] == 0.0


def test_factored_take_bit_exact_and_fallback():
    from khg_tpu.model.transition_device import factored_take

    rng = np.random.default_rng(5)
    table = jnp.asarray(rng.standard_normal(803).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 803, (7, 11, 13)).astype(np.int32))
    got = np.asarray(factored_take(table, idx))
    want = np.asarray(table)[np.asarray(idx)]
    assert got.dtype == np.float32
    assert np.array_equal(got, want)  # bit-exact, not allclose
    # adaptive block on a wide table (sqrt-balanced one-hots)
    big = jnp.asarray(rng.standard_normal(70000).astype(np.float32))
    idx2 = jnp.asarray(rng.integers(0, 70000, (64,)).astype(np.int32))
    got2 = np.asarray(factored_take(big, idx2))
    assert np.array_equal(got2, np.asarray(big)[np.asarray(idx2)])
    # byte-gate fallback path (intermediates would exceed the cap)
    got3 = np.asarray(factored_take(big, idx2, max_onehot_bytes=64))
    assert np.array_equal(got3, np.asarray(big)[np.asarray(idx2)])
