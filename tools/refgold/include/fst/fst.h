// Minimal OpenFST shim: just enough of the fst:: surface for the
// reference FasterDecoder (faster-decoder.h/.cc) to compile and run.
// Original code — only the (public, documented) OpenFST API shape is
// reproduced: Fst<Arc> virtual interface, ArcIterator, VectorFst,
// TropicalWeight, StdArc.
#ifndef REFGOLD_FST_FST_H_
#define REFGOLD_FST_FST_H_

#include <cstdint>
#include <limits>
#include <string>
#include <vector>

namespace fst {

constexpr int kNoStateId = -1;

class TropicalWeight {
 public:
  TropicalWeight() : value_(0.0f) {}
  explicit TropicalWeight(float v) : value_(v) {}
  float Value() const { return value_; }
  static TropicalWeight One() { return TropicalWeight(0.0f); }
  static TropicalWeight Zero() {
    return TropicalWeight(std::numeric_limits<float>::infinity());
  }
  bool operator==(const TropicalWeight &o) const { return value_ == o.value_; }
  bool operator!=(const TropicalWeight &o) const { return value_ != o.value_; }

 private:
  float value_;
};

template <class W>
struct ArcTpl {
  using Weight = W;
  using Label = int;
  using StateId = int;
  Label ilabel = 0;
  Label olabel = 0;
  Weight weight = Weight::One();
  StateId nextstate = kNoStateId;
  ArcTpl() = default;
  ArcTpl(Label il, Label ol, Weight w, StateId ns)
      : ilabel(il), olabel(ol), weight(w), nextstate(ns) {}
};

using StdArc = ArcTpl<TropicalWeight>;

template <class A>
class Fst {
 public:
  using Arc = A;
  using StateId = typename A::StateId;
  using Weight = typename A::Weight;
  virtual ~Fst() = default;
  virtual StateId Start() const = 0;
  virtual Weight Final(StateId s) const = 0;
  virtual const std::vector<Arc> &ArcsOf(StateId s) const = 0;
  virtual std::string Type() const { return "vector"; }
  int NumInputEpsilons(StateId s) const {
    int n = 0;
    for (const Arc &a : ArcsOf(s))
      if (a.ilabel == 0) ++n;
    return n;
  }
};

template <class F>
class ArcIterator {
 public:
  using Arc = typename F::Arc;
  ArcIterator(const F &fst, typename F::StateId s)
      : arcs_(&fst.ArcsOf(s)), pos_(0) {}
  bool Done() const { return pos_ >= arcs_->size(); }
  void Next() { ++pos_; }
  const Arc &Value() const { return (*arcs_)[pos_]; }

 private:
  const std::vector<Arc> *arcs_;
  size_t pos_;
};

template <class A>
class MutableFst : public Fst<A> {
 public:
  using Arc = A;
  using StateId = typename A::StateId;
  using Weight = typename A::Weight;
  virtual StateId AddState() = 0;
  virtual void SetStart(StateId s) = 0;
  virtual void SetFinal(StateId s, Weight w) = 0;
  virtual void AddArc(StateId s, const Arc &arc) = 0;
  virtual void DeleteStates() = 0;
};

template <class A>
class VectorFst : public MutableFst<A> {
 public:
  using Arc = A;
  using StateId = typename A::StateId;
  using Weight = typename A::Weight;

  StateId Start() const override { return start_; }
  Weight Final(StateId s) const override {
    if (s < 0 || s >= static_cast<StateId>(finals_.size()))
      return Weight::Zero();
    return finals_[s];
  }
  const std::vector<Arc> &ArcsOf(StateId s) const override {
    return arcs_[s];
  }
  StateId NumStates() const { return static_cast<StateId>(arcs_.size()); }

  StateId AddState() override {
    arcs_.emplace_back();
    finals_.push_back(Weight::Zero());
    return static_cast<StateId>(arcs_.size()) - 1;
  }
  void SetStart(StateId s) override { start_ = s; }
  void SetFinal(StateId s, Weight w) override { finals_[s] = w; }
  void AddArc(StateId s, const Arc &arc) override { arcs_[s].push_back(arc); }
  void DeleteStates() override {
    arcs_.clear();
    finals_.clear();
    start_ = kNoStateId;
  }

 private:
  std::vector<std::vector<Arc>> arcs_;
  std::vector<Weight> finals_;
  StateId start_ = kNoStateId;
};

// Distinct type so the reference's explicit template instantiations for
// VectorFst and ConstFst do not collide; behaviorally identical here.
template <class A>
class ConstFst : public VectorFst<A> {
 public:
  std::string Type() const override { return "const"; }
};

using StdFst = Fst<StdArc>;

constexpr float kDelta = 1.0f / 1024.0f;

// Placement-new object pool with the OpenFST MemoryPool surface
// (Allocate returns raw storage; Free recycles it; destructors are the
// owner's business, matching the reference's usage).
template <class T>
class MemoryPool {
 public:
  explicit MemoryPool(int block_size = 256) { (void)block_size; }
  ~MemoryPool() {
    for (void *p : all_) ::operator delete(p);
  }
  void *Allocate() {
    if (!free_.empty()) {
      void *p = free_.back();
      free_.pop_back();
      return p;
    }
    void *p = ::operator new(sizeof(T));
    all_.push_back(p);
    return p;
  }
  void Free(T *p) {
    p->~T();
    free_.push_back(p);
  }

 private:
  std::vector<void *> all_;
  std::vector<void *> free_;
};

}  // namespace fst

#endif  // REFGOLD_FST_FST_H_
