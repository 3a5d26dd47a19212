// Shim LatticeWeight/LatticeArc (graph cost, acoustic cost pair).
#ifndef REFGOLD_KALDIFST_CSRC_LATTICE_WEIGHT_H_
#define REFGOLD_KALDIFST_CSRC_LATTICE_WEIGHT_H_

#include <algorithm>
#include <limits>
#include <utility>
#include <vector>

#include "fst/fst.h"

namespace fst {

class LatticeWeight {
 public:
  LatticeWeight() : value1_(0.0f), value2_(0.0f) {}
  LatticeWeight(float graph, float acoustic)
      : value1_(graph), value2_(acoustic) {}
  float Value1() const { return value1_; }
  float Value2() const { return value2_; }
  float Value() const { return value1_ + value2_; }
  static LatticeWeight One() { return LatticeWeight(0.0f, 0.0f); }
  static LatticeWeight Zero() {
    float inf = std::numeric_limits<float>::infinity();
    return LatticeWeight(inf, inf);
  }

 private:
  float value1_;  // graph cost
  float value2_;  // acoustic cost
};

using LatticeArc = ArcTpl<LatticeWeight>;
using Lattice = VectorFst<LatticeArc>;

// ShortestPath over an ACYCLIC lattice (raw lattices are frame-indexed
// DAGs): total cost = graph + acoustic; emits the single best path as a
// linear FST, as the reference decoder's GetBestPath expects of
// OpenFST's ShortestPath.
inline void ShortestPath(const Lattice &ifst, Lattice *ofst) {
  ofst->DeleteStates();
  int n = ifst.NumStates();
  if (n == 0 || ifst.Start() == kNoStateId) return;
  const float inf = std::numeric_limits<float>::infinity();
  // topological order via DFS (lattice is acyclic by construction)
  std::vector<int> order;
  std::vector<int> state(n, 0);  // 0 unvisited, 1 on stack, 2 done
  std::vector<std::pair<int, size_t>> stack;
  stack.emplace_back(ifst.Start(), 0);
  state[ifst.Start()] = 1;
  while (!stack.empty()) {
    int s = stack.back().first;
    size_t i = stack.back().second;
    const auto &arcs = ifst.ArcsOf(s);
    if (i < arcs.size()) {
      stack.back().second = i + 1;  // before any push (vector realloc)
      int ns = arcs[i].nextstate;
      if (state[ns] == 0) {
        state[ns] = 1;
        stack.emplace_back(ns, 0);
      }
    } else {
      state[s] = 2;
      order.push_back(s);
      stack.pop_back();
    }
  }
  std::reverse(order.begin(), order.end());
  std::vector<double> dist(n, inf);
  std::vector<int> bp_state(n, kNoStateId), bp_arc(n, -1);
  dist[ifst.Start()] = 0.0;
  double best = inf;
  int best_state = kNoStateId;
  for (int s : order) {
    if (dist[s] == inf) continue;
    float fw = ifst.Final(s).Value();
    if (fw != inf && dist[s] + fw < best) {
      best = dist[s] + fw;
      best_state = s;
    }
    const auto &arcs = ifst.ArcsOf(s);
    for (size_t a = 0; a < arcs.size(); ++a) {
      double nd = dist[s] + arcs[a].weight.Value();
      int ns = arcs[a].nextstate;
      if (nd < dist[ns]) {
        dist[ns] = nd;
        bp_state[ns] = s;
        bp_arc[ns] = static_cast<int>(a);
      }
    }
  }
  if (best_state == kNoStateId) return;
  std::vector<std::pair<int, int>> path;  // (src, arc idx), reversed
  for (int s = best_state; bp_state[s] != kNoStateId;
       s = bp_state[s]) {
    path.emplace_back(bp_state[s], bp_arc[s]);
  }
  std::reverse(path.begin(), path.end());
  int cur = ofst->AddState();
  ofst->SetStart(cur);
  for (const auto &[src, ai] : path) {
    const LatticeArc &arc = ifst.ArcsOf(src)[ai];
    int nxt = ofst->AddState();
    ofst->AddArc(cur, LatticeArc(arc.ilabel, arc.olabel, arc.weight, nxt));
    cur = nxt;
  }
  ofst->SetFinal(cur, ifst.Final(best_state));
}

}  // namespace fst

#endif  // REFGOLD_KALDIFST_CSRC_LATTICE_WEIGHT_H_
