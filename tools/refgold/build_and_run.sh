#!/bin/bash
# Rebuild the reference model layer in place and regenerate the golden
# parity fixtures under tests/golden/.  Requires the tensorflow wheel's
# bundled Eigen (present in this image); nothing is copied out of
# /root/reference — its sources are compiled via -I.
set -euo pipefail
cd "$(dirname "$0")/../.."

REF=/root/reference
EIGEN=$(python - <<'EOF'
import pathlib, tensorflow
print(pathlib.Path(tensorflow.__file__).parent / "include")
EOF
)
OUT=/tmp/refgold
mkdir -p "$OUT"

SRCS=""
for f in transition-model hmm-topology event-map context-dep \
         build-tree-utils model-common diag-gmm diag-gmm-normal \
         am-diag-gmm mle-diag-gmm mle-am-diag-gmm kaldi-math eigen \
         clusterable-classes cluster-utils; do
  SRCS="$SRCS $REF/kaldi-hmm-gmm/csrc/$f.cc"
done

g++ -O2 -std=c++17 \
  -I"$REF" -Itools/refgold/include -I"$EIGEN" \
  -include tools/refgold/include/compat/eigen_compat.h \
  tools/refgold/gen_golden.cc $SRCS -o "$OUT/gen_golden"

"$OUT/gen_golden" tests/golden/inputs/topo.txt tests/golden
python -m json.tool tests/golden/ref_fixtures.json > /dev/null \
  && echo "fixtures JSON valid"

# alignment parity: reference FasterDecoder over khg_tpu-exported graphs
g++ -O2 -std=c++17 \
  -I"$REF" -Itools/refgold/include \
  tools/refgold/align_runner.cc \
  "$REF/kaldi-hmm-gmm/csrc/faster-decoder.cc" -o "$OUT/align_runner"
python tools/refgold/make_align_problem.py tests/golden/align_problem.txt
"$OUT/align_runner" tests/golden/align_problem.txt \
  > tests/golden/align_golden.txt
cat tests/golden/align_golden.txt
ls -la tests/golden/

# EM-loop trajectory golden: the reference's full training loop
# (train.py:116-222 semantics) over khg_tpu-exported graphs/features
g++ -O2 -std=c++17 \
  -I"$REF" -Itools/refgold/include -I"$EIGEN" \
  -include tools/refgold/include/compat/eigen_compat.h \
  tools/refgold/em_loop_runner.cc $SRCS \
  "$REF/kaldi-hmm-gmm/csrc/faster-decoder.cc" \
  "$REF/kaldi-hmm-gmm/csrc/decodable-am-diag-gmm.cc" \
  -o "$OUT/em_loop_runner"
python tools/refgold/make_em_problem.py tests/golden/em_problem.txt \
  tests/golden/em_topo.txt toy
"$OUT/em_loop_runner" tests/golden/em_problem.txt tests/golden/em_topo.txt \
  tests/golden/em_loop_golden.json
python -m json.tool tests/golden/em_loop_golden.json > /dev/null \
  && echo "em loop golden JSON valid"

# ... and at the reference's REAL yesno scale: 80 passes, its full
# realign schedule, 30 mix-up increments, 10 utterances
python tools/refgold/make_em_problem.py tests/golden/em_problem_long.txt \
  tests/golden/em_topo_long.txt long
"$OUT/em_loop_runner" tests/golden/em_problem_long.txt \
  tests/golden/em_topo_long.txt tests/golden/em_loop_golden_long.json
python -m json.tool tests/golden/em_loop_golden_long.json > /dev/null \
  && echo "em loop golden (long) JSON valid"

# chain-topology (non-HMM) tuple enumeration golden: reference
# ComputeTuplesNotHmm + EnumeratePairs over khg_tpu-exported trees
g++ -O2 -std=c++17 \
  -I"$REF" -Itools/refgold/include -I"$EIGEN" \
  -include tools/refgold/include/compat/eigen_compat.h \
  tools/refgold/tuples_runner.cc $SRCS -o "$OUT/tuples_runner"
python tools/refgold/make_tuples_problem.py tests/golden/inputs
"$OUT/tuples_runner" tests/golden/inputs \
  tests/golden/chain_tuples_golden.json
python -m json.tool tests/golden/chain_tuples_golden.json > /dev/null \
  && echo "chain tuples golden JSON valid"

# lattice parity: reference LatticeFasterDecoderTpl over a khg_tpu HCLG
g++ -O2 -std=c++17 -Dint32=int32_t \
  -I"$REF" -Itools/refgold/include \
  tools/refgold/lattice_runner.cc \
  "$REF/kaldi-hmm-gmm/csrc/lattice-faster-decoder.cc" \
  -o "$OUT/lattice_runner"
python tools/refgold/make_lattice_problem.py tests/golden/lattice_problem.txt
"$OUT/lattice_runner" tests/golden/lattice_problem.txt \
  > tests/golden/lattice_golden.txt
cat tests/golden/lattice_golden.txt
