// Chain-topology (non-HMM) tuple-enumeration golden: builds the
// REFERENCE TransitionModel (compiled in place from
// /root/reference/kaldi-hmm-gmm/csrc — nothing copied) over the
// khg_tpu-exported chain topology + {mono,tri} trees and dumps the tuple
// list, tid->pdf map and tid->tstate map as JSON.
// tests/test_chain_topo.py::test_chain_golden_matches_reference asserts
// khg_tpu's ComputeTuplesNotHmm path reproduces every number.
//
// Reference entry points exercised:
//   kaldi-hmm-gmm/csrc/transition-model.cc:181-252 (ComputeTuplesNotHmm)
//   kaldi-hmm-gmm/csrc/context-dep.cc:85-163,210-239 (EnumeratePairs,
//     GetPdfInfo pairs overload), context-dep.cc:55-84 (Read)
//
// Build & run: tools/refgold/build_and_run.sh

#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "kaldi-hmm-gmm/csrc/context-dep.h"
#include "kaldi-hmm-gmm/csrc/hmm-topology.h"
#include "kaldi-hmm-gmm/csrc/transition-model.h"

using namespace khg;  // NOLINT

int main(int argc, char **argv) {
  if (argc != 3) {
    std::cerr << "usage: tuples_runner <inputs_dir> <out_json>\n";
    return 1;
  }
  const std::string dir = argv[1];

  std::ostringstream js;
  js << "{";
  bool first_kind = true;
  for (const std::string kind : {"mono", "tri"}) {
    std::ifstream topo_is(dir + "/chain_topo.txt");
    HmmTopology topo;
    topo.Read(topo_is, /*binary=*/false);

    std::ifstream tree_is(dir + "/chain_tree_" + kind + ".txt");
    ContextDependency ctx;
    ctx.Read(tree_is, /*binary=*/false);

    TransitionModel tm(ctx, topo);

    if (!first_kind) js << ",";
    first_kind = false;
    js << "\"" << kind << "\":{";
    js << "\"num_pdfs\":" << tm.NumPdfs();
    js << ",\"num_transition_ids\":" << tm.NumTransitionIds();
    js << ",\"num_transition_states\":" << tm.NumTransitionStates();
    js << ",\"tuples\":[";
    const auto &tuples = tm.GetTuples();
    for (size_t i = 0; i < tuples.size(); i++) {
      if (i) js << ",";
      js << "[" << tuples[i].phone << "," << tuples[i].hmm_state << ","
         << tuples[i].forward_pdf << "," << tuples[i].self_loop_pdf << "]";
    }
    js << "],\"id2pdf\":[";
    for (int32_t t = 1; t <= tm.NumTransitionIds(); t++) {
      if (t > 1) js << ",";
      js << tm.TransitionIdToPdf(t);
    }
    js << "],\"id2state\":[";
    for (int32_t t = 1; t <= tm.NumTransitionIds(); t++) {
      if (t > 1) js << ",";
      js << tm.TransitionIdToTransitionState(t);
    }
    js << "],\"id2self_loop\":[";
    for (int32_t t = 1; t <= tm.NumTransitionIds(); t++) {
      if (t > 1) js << ",";
      js << (tm.IsSelfLoop(t) ? 1 : 0);
    }
    js << "]}";
  }
  js << "}";

  std::ofstream os(argv[2]);
  os << js.str() << "\n";
  std::cout << "wrote " << argv[2] << "\n";
  return 0;
}
