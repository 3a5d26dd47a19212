// Shim LatticeWeight/LatticeArc (graph cost, acoustic cost pair).
#ifndef REFGOLD_KALDIFST_CSRC_LATTICE_WEIGHT_H_
#define REFGOLD_KALDIFST_CSRC_LATTICE_WEIGHT_H_

#include <limits>

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

}  // namespace fst

#endif  // REFGOLD_KALDIFST_CSRC_LATTICE_WEIGHT_H_
