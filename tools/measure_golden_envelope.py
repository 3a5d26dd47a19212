"""Measure the f32-vs-f64 EM trajectory drift behind the long-golden
tolerance envelope.

tests/test_em_loop_golden.py tolerates a pass-indexed envelope between
khg's trajectory (f64 model storage) and the reference golden (f32
FloatMatrix storage).  This script turns that argued attribution into a
measurement: it runs khg's OWN loop twice on the long config — the only
difference being an after-M-step round-trip of the model through
float32 (train_yesno(f32_storage=True), exactly emulating the
reference's storage precision) — and reports three per-pass curves:

  d_storage = |khg_f64 - khg_f32|       (pure precision effect, same code)
  d_ref_f64 = |khg_f64 - golden|        (what the test currently bounds)
  d_ref_f32 = |khg_f32 - golden|        (residual after matching storage)

If d_ref_f32 << d_ref_f64 ~ d_storage, the envelope is measured to be a
storage-precision artifact, and its slope can be set from d_storage.

Usage: python tools/measure_golden_envelope.py [toy|long]
"""

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools" / "refgold"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import make_em_problem as prob  # noqa: E402

from khg_tpu.recipes.yesno import (  # noqa: E402
    make_synthetic_corpus,
    train_yesno,
)

GOLDEN = {
    "toy": REPO / "tests/golden/em_loop_golden.json",
    "long": REPO / "tests/golden/em_loop_golden_long.json",
}


def run(config: str, f32_storage: bool):
    cfg = prob.CONFIGS[config]
    lp, corpus = make_synthetic_corpus(
        num_utts=cfg["num_utts"],
        dim=cfg["dim"],
        rng=np.random.default_rng(cfg["corpus_seed"]),
    )
    return train_yesno(
        lp,
        corpus,
        num_iters=cfg["num_iters"],
        realign_iters=cfg["realign_iters"],
        total_gauss=cfg["total_gauss"],
        max_iter_inc=cfg["max_iter_inc"],
        acoustic_scale=prob.ACOUSTIC_SCALE,
        self_loop_scale=prob.SELF_LOOP_SCALE,
        boost=cfg["boost"],
        seed=cfg["train_seed"],
        perturb_factor=0.0,
        det_split_perturb=cfg["det_split_perturb"],
        f32_storage=f32_storage,
    )


def main(config: str) -> None:
    golden = json.loads(GOLDEN[config].read_text())
    ref = np.asarray(golden["pass_avg_loglike"])

    r64 = run(config, f32_storage=False)
    r32 = run(config, f32_storage=True)
    t64 = np.asarray(r64.avg_loglikes)
    t32 = np.asarray(r32.avg_loglikes)
    assert t64.shape == ref.shape == t32.shape

    d_storage = np.abs(t64 - t32)
    d_ref64 = np.abs(t64 - ref)
    d_ref32 = np.abs(t32 - ref)

    print(f"config={config} passes={len(ref)}")
    print("pass  d_storage     d_ref_f64     d_ref_f32")
    for i in range(len(ref)):
        print(f"{i:4d}  {d_storage[i]:.6e}  {d_ref64[i]:.6e}  "
              f"{d_ref32[i]:.6e}")
    for name, d in (("d_storage", d_storage), ("d_ref_f64", d_ref64),
                    ("d_ref_f32", d_ref32)):
        print(f"{name}: max={d.max():.4e} "
              f"p90={np.percentile(d, 90):.4e} final={d[-1]:.4e}")
    # schedule must be identical in all three — else the comparison is
    # about discrete branches, not precision
    assert r64.num_gauss_after_est == r32.num_gauss_after_est, \
        "f32 storage changed the discrete mix-up schedule"
    assert r64.num_gauss_after_est == golden["num_gauss_after_est"], \
        "khg schedule differs from golden"
    print("discrete schedule identical across f64/f32/golden")

    out = {
        "config": config,
        "d_storage": d_storage.tolist(),
        "d_ref_f64": d_ref64.tolist(),
        "d_ref_f32": d_ref32.tolist(),
    }
    out_path = REPO / f"docs/envelope_{config}.json"
    out_path.write_text(json.dumps(out))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "long")
