"""Write the chain-topology tuple-enumeration problem for the reference.

Exports the SAME system tests/test_chain_topo.py builds — a non-HMM
(chain-style) topology plus monophone and triphone trees — as Kaldi text
files the reference readers consume (HmmTopology::Read,
ContextDependency::Read).  tools/refgold/tuples_runner.cc then builds the
reference TransitionModel over them and dumps the tuples/tids golden.

Usage: python tools/refgold/make_tuples_problem.py <outdir>
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "tests"))

from test_chain_topo import build_chain_system  # noqa: E402

from khg_tpu.model.kaldi_io import write_context_dependency  # noqa: E402


def main(outdir: str) -> None:
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    for kind in ("mono", "tri"):
        topo, tree, _tm = build_chain_system(kind)
        (out / "chain_topo.txt").write_text(topo.write())
        (out / f"chain_tree_{kind}.txt").write_text(
            write_context_dependency(tree)
        )
    print(f"wrote chain_topo.txt + chain_tree_{{mono,tri}}.txt to {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "tests/golden/inputs")
