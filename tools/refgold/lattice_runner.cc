// Lattice-decoder parity runner: drives the REFERENCE
// LatticeFasterDecoderTpl (/root/reference/kaldi-hmm-gmm/csrc/
// lattice-faster-decoder.cc, compiled in place against the fst shim
// headers) over decoding graphs and loglike matrices exported from
// khg_tpu, and prints each utterance's lattice best path.
// tests/test_reference_parity.py compares these against
// khg_tpu.decode.lattice.decode_utterance_lattice_faster — the
// reference's actual lattice search code on the other side, exercising
// ProcessEmitting/ProcessNonemitting/PruneActiveTokens/GetRawLattice.
//
// Input format: identical to align_runner.cc, with one extra per-utt
// line after "beam max_active":
//   lattice_beam prune_interval
// Output per utterance:
//   "utt <i> cost <c> tids <n>: ... words: ..."  or "utt <i> FAILED"

#include <cstdint>
#include <cstdio>
#include <fstream>
#include <iostream>
#include <vector>

#include "kaldi-hmm-gmm/csrc/decodable-itf.h"
#include "kaldi-hmm-gmm/csrc/lattice-faster-decoder.h"

namespace {

class MatrixDecodable : public khg::DecodableInterface {
 public:
  MatrixDecodable(const std::vector<std::vector<float>> &ll,
                  const std::vector<int32_t> &id2pdf, float scale)
      : ll_(ll), id2pdf_(id2pdf), scale_(scale) {}

  float LogLikelihood(int32_t frame, int32_t tid) override {
    return scale_ * ll_[frame][id2pdf_[tid]];
  }
  int32_t NumFramesReady() const override {
    return static_cast<int32_t>(ll_.size());
  }
  bool IsLastFrame(int32_t frame) const override {
    return frame == NumFramesReady() - 1;
  }
  int32_t NumIndices() const override {
    return static_cast<int32_t>(id2pdf_.size()) - 1;
  }

 private:
  const std::vector<std::vector<float>> &ll_;
  const std::vector<int32_t> &id2pdf_;
  float scale_;
};

}  // namespace

int main(int argc, char **argv) {
  if (argc != 2) {
    std::cerr << "usage: lattice_runner <problem.txt>\n";
    return 1;
  }
  std::ifstream in(argv[1]);
  int P, num_utts;
  float scale;
  in >> P >> num_utts >> scale;
  int id2pdf_len;
  in >> id2pdf_len;
  std::vector<int32_t> id2pdf(id2pdf_len);
  for (auto &v : id2pdf) in >> v;

  for (int u = 0; u < num_utts; ++u) {
    int T;
    in >> T;
    std::vector<std::vector<float>> ll(T, std::vector<float>(P));
    for (int t = 0; t < T; ++t)
      for (int p = 0; p < P; ++p) in >> ll[t][p];

    int num_states, start, num_arcs;
    in >> num_states >> start >> num_arcs;
    fst::VectorFst<fst::StdArc> graph;
    for (int s = 0; s < num_states; ++s) graph.AddState();
    graph.SetStart(start);
    for (int a = 0; a < num_arcs; ++a) {
      int src, il, ol, dst;
      float w;
      in >> src >> il >> ol >> w >> dst;
      graph.AddArc(src, fst::StdArc(il, ol, fst::TropicalWeight(w), dst));
    }
    int num_finals;
    in >> num_finals;
    for (int f = 0; f < num_finals; ++f) {
      int s;
      float w;
      in >> s >> w;
      graph.SetFinal(s, fst::TropicalWeight(w));
    }
    float beam, lattice_beam;
    int max_active, prune_interval;
    in >> beam >> max_active >> lattice_beam >> prune_interval;

    khg::LatticeFasterDecoderConfig config;
    config.beam = beam;
    config.max_active = max_active;
    config.lattice_beam = lattice_beam;
    config.prune_interval = prune_interval;
    khg::LatticeFasterDecoderTpl<fst::VectorFst<fst::StdArc>,
                                 khg::decoder::StdToken>
        decoder(graph, config);
    MatrixDecodable decodable(ll, id2pdf, scale);
    if (!decoder.Decode(&decodable)) {
      std::cout << "utt " << u << " FAILED\n";
      continue;
    }
    fst::Lattice best;
    if (!decoder.GetBestPath(&best)) {
      std::cout << "utt " << u << " FAILED\n";
      continue;
    }
    std::vector<int> tids, words;
    double cost = 0.0;
    int s = best.Start();
    while (true) {
      const auto &arcs = best.ArcsOf(s);
      if (arcs.empty()) {
        cost += best.Final(s).Value();
        break;
      }
      const fst::LatticeArc &arc = arcs[0];
      if (arc.ilabel != 0) tids.push_back(arc.ilabel);
      if (arc.olabel != 0) words.push_back(arc.olabel);
      cost += arc.weight.Value();
      s = arc.nextstate;
    }
    std::printf("utt %d cost %.6f tids %zu:", u, cost, tids.size());
    for (int t : tids) std::printf(" %d", t);
    std::printf(" words:");
    for (int w : words) std::printf(" %d", w);
    std::printf("\n");
  }
  return 0;
}
