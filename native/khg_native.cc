// khg_tpu native graph-compilation core.
//
// C++ implementations of the hot host-side FST operations used by the
// training-graph compiler: epsilon-filter composition, determinize-star in
// the log semiring, encoded minimization, connection, and packed-graph
// extraction.  Semantics mirror khg_tpu/fstlib/fst.py exactly (the Python
// implementations are the reference; equivalence is pinned by tests).
//
// The C ABI below exchanges FSTs as flat arrays; buffers returned by the
// library are malloc'd and released with khg_free_fst.
//
// Build:  g++ -O2 -shared -fPIC -std=c++17 khg_native.cc -o libkhg_native.so

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <map>
#include <queue>
#include <set>
#include <string>
#include <tuple>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();
constexpr float kBig = 1.0e30f;

struct Arc {
  int32_t ilabel;
  int32_t olabel;
  float weight;
  int32_t nextstate;
};

struct Fst {
  int32_t start = -1;
  std::vector<std::vector<Arc>> arcs;
  std::vector<float> final;

  int32_t NumStates() const { return static_cast<int32_t>(arcs.size()); }
  int32_t AddState() {
    arcs.emplace_back();
    final.push_back(kInf);
    return NumStates() - 1;
  }
};

double LogPlus(double a, double b) {
  // log-semiring ⊕ on costs: -log(e^-a + e^-b)
  if (a == kInf || std::isinf(a)) return b;
  if (b == kInf || std::isinf(b)) return a;
  double m = std::min(a, b);
  double M = std::max(a, b);
  return m - std::log1p(std::exp(m - M));
}

// ------------------------------------------------------------------ connect

Fst Connect(const Fst &in) {
  int32_t n = in.NumStates();
  Fst out;
  if (in.start < 0 || n == 0) return out;
  std::vector<char> fwd(n, 0), bwd(n, 0);
  {
    std::vector<int32_t> stack = {in.start};
    fwd[in.start] = 1;
    while (!stack.empty()) {
      int32_t s = stack.back();
      stack.pop_back();
      for (const Arc &a : in.arcs[s])
        if (!fwd[a.nextstate]) {
          fwd[a.nextstate] = 1;
          stack.push_back(a.nextstate);
        }
    }
  }
  {
    std::vector<std::vector<int32_t>> preds(n);
    for (int32_t s = 0; s < n; ++s)
      for (const Arc &a : in.arcs[s]) preds[a.nextstate].push_back(s);
    std::vector<int32_t> stack;
    for (int32_t s = 0; s < n; ++s)
      if (in.final[s] != kInf) {
        bwd[s] = 1;
        stack.push_back(s);
      }
    while (!stack.empty()) {
      int32_t s = stack.back();
      stack.pop_back();
      for (int32_t p : preds[s])
        if (!bwd[p]) {
          bwd[p] = 1;
          stack.push_back(p);
        }
    }
  }
  std::vector<int32_t> remap(n, -1);
  for (int32_t s = 0; s < n; ++s)
    if (fwd[s] && bwd[s]) remap[s] = out.AddState();
  if (remap[in.start] < 0) return Fst();
  for (int32_t s = 0; s < n; ++s) {
    if (remap[s] < 0) continue;
    for (const Arc &a : in.arcs[s])
      if (remap[a.nextstate] >= 0)
        out.arcs[remap[s]].push_back(
            {a.ilabel, a.olabel, a.weight, remap[a.nextstate]});
    out.final[remap[s]] = in.final[s];
  }
  out.start = remap[in.start];
  return out;
}

// ------------------------------------------------------------------ compose

Fst Compose(const Fst &a, const Fst &b) {
  Fst out;
  if (a.start < 0 || b.start < 0) return out;
  int32_t nb = b.NumStates();
  // sort b arcs by ilabel
  std::vector<std::vector<Arc>> b_sorted(nb);
  for (int32_t s = 0; s < nb; ++s) {
    b_sorted[s] = b.arcs[s];
    std::sort(b_sorted[s].begin(), b_sorted[s].end(),
              [](const Arc &x, const Arc &y) { return x.ilabel < y.ilabel; });
  }

  struct KeyHash {
    size_t operator()(const std::tuple<int32_t, int32_t, int32_t> &k) const {
      return std::get<0>(k) * 1000003ull + std::get<1>(k) * 8191ull +
             std::get<2>(k);
    }
  };
  std::unordered_map<std::tuple<int32_t, int32_t, int32_t>, int32_t, KeyHash>
      state_map;
  std::vector<std::tuple<int32_t, int32_t, int32_t>> queue;

  auto GetState = [&](int32_t s1, int32_t s2, int32_t f) -> int32_t {
    auto key = std::make_tuple(s1, s2, f);
    auto it = state_map.find(key);
    if (it != state_map.end()) return it->second;
    int32_t s = out.AddState();
    state_map.emplace(key, s);
    queue.push_back(key);
    return s;
  };

  GetState(a.start, b.start, 0);
  out.start = 0;

  auto MatchRange = [&](const std::vector<Arc> &arcs, int32_t label) {
    auto lo = std::lower_bound(
        arcs.begin(), arcs.end(), label,
        [](const Arc &x, int32_t l) { return x.ilabel < l; });
    auto hi = std::upper_bound(
        arcs.begin(), arcs.end(), label,
        [](int32_t l, const Arc &x) { return l < x.ilabel; });
    return std::make_pair(lo, hi);
  };

  for (size_t qi = 0; qi < queue.size(); ++qi) {
    auto [s1, s2, f] = queue[qi];
    int32_t cur = state_map[{s1, s2, f}];
    if (a.final[s1] != kInf && b.final[s2] != kInf)
      out.final[cur] = a.final[s1] + b.final[s2];
    const auto &arcs2 = b_sorted[s2];
    for (const Arc &arc1 : a.arcs[s1]) {
      if (arc1.olabel != 0) {
        auto [lo, hi] = MatchRange(arcs2, arc1.olabel);
        for (auto it = lo; it != hi; ++it) {
          int32_t ns = GetState(arc1.nextstate, it->nextstate, 0);
          out.arcs[cur].push_back({arc1.ilabel, it->olabel,
                                   arc1.weight + it->weight, ns});
        }
      } else {
        if (f == 0 || f == 1) {
          int32_t ns = GetState(arc1.nextstate, s2, 1);
          out.arcs[cur].push_back({arc1.ilabel, 0, arc1.weight, ns});
        }
        if (f == 0) {
          auto [lo, hi] = MatchRange(arcs2, 0);
          for (auto it = lo; it != hi; ++it) {
            int32_t ns = GetState(arc1.nextstate, it->nextstate, 0);
            out.arcs[cur].push_back({arc1.ilabel, it->olabel,
                                     arc1.weight + it->weight, ns});
          }
        }
      }
    }
    if (f == 0 || f == 2) {
      auto [lo, hi] = MatchRange(arcs2, 0);
      for (auto it = lo; it != hi; ++it) {
        int32_t ns = GetState(s1, it->nextstate, 2);
        out.arcs[cur].push_back({0, it->olabel, it->weight, ns});
      }
    }
  }
  return Connect(out);
}

// ------------------------------------------------------------ determinize ★

struct DetElement {
  int32_t state;
  std::vector<int32_t> string;
  double weight;  // cost
  bool operator<(const DetElement &o) const {
    if (state != o.state) return state < o.state;
    return string < o.string;
  }
};

// subset key: sorted (state, string, rounded normalized weight)
using SubsetKey = std::string;

SubsetKey MakeKey(const std::vector<DetElement> &elems) {
  std::string key;
  key.reserve(elems.size() * 16);
  for (const auto &e : elems) {
    key.append(reinterpret_cast<const char *>(&e.state), 4);
    int32_t len = static_cast<int32_t>(e.string.size());
    key.append(reinterpret_cast<const char *>(&len), 4);
    for (int32_t s : e.string)
      key.append(reinterpret_cast<const char *>(&s), 4);
    int64_t w = llround(e.weight * 1e6);
    key.append(reinterpret_cast<const char *>(&w), 8);
  }
  return key;
}

class DeterminizerStar {
 public:
  DeterminizerStar(const Fst &in, bool log_semiring)
      : in_(in), log_(log_semiring) {}

  double Plus(double a, double b) const {
    return log_ ? LogPlus(a, b) : std::min(a, b);
  }

  bool Run(Fst *out_fst) {
    if (in_.start < 0) {
      *out_fst = Fst();
      return true;
    }
    std::map<std::pair<int32_t, std::vector<int32_t>>, double> init;
    init[{in_.start, {}}] = 0.0;
    Closure(&init);
    std::vector<DetElement> elems;
    double tot;
    std::vector<int32_t> prefix;
    Normalize(init, &elems, &tot, &prefix);
    int32_t start_state = GetState(elems);
    if (tot != 0.0 || !prefix.empty()) {
      int32_t pre = out_.AddState();
      out_.start = pre;
      EmitChain(pre, 0, static_cast<float>(tot), prefix, start_state);
    } else {
      out_.start = start_state;
    }

    for (size_t qi = 0; qi < queue_.size(); ++qi) {
      int32_t cur = queue_[qi].first;
      // copy: ProcessState may grow queue_ and invalidate references
      std::vector<DetElement> elements = queue_[qi].second;
      ProcessState(cur, elements);
      if (out_.NumStates() > 2000000) return false;
    }
    *out_fst = Connect(out_);
    return true;
  }

 private:
  void Closure(std::map<std::pair<int32_t, std::vector<int32_t>>, double> *m) {
    std::vector<std::pair<int32_t, std::vector<int32_t>>> agenda;
    for (auto &kv : *m) agenda.push_back(kv.first);
    size_t iters = 0, limit = 100ull * (in_.NumStates() + 10);
    while (!agenda.empty()) {
      if (++iters > limit) {
        // epsilon cycle: bail (caller treats as failure via exception-free
        // path; we just stop, yielding equivalent-but-larger output)
        break;
      }
      auto key = agenda.back();
      agenda.pop_back();
      auto it = m->find(key);
      if (it == m->end()) continue;
      double w = it->second;
      for (const Arc &a : in_.arcs[key.first]) {
        if (a.ilabel != 0) continue;
        auto nstring = key.second;
        if (a.olabel != 0) nstring.push_back(a.olabel);
        auto nkey = std::make_pair(a.nextstate, nstring);
        double nw = w + a.weight;
        auto jt = m->find(nkey);
        if (jt == m->end()) {
          (*m)[nkey] = nw;
          agenda.push_back(nkey);
        } else {
          double comb = Plus(jt->second, nw);
          if (comb != jt->second) {
            jt->second = comb;
            agenda.push_back(nkey);
          }
        }
      }
    }
  }

  void Normalize(
      const std::map<std::pair<int32_t, std::vector<int32_t>>, double> &m,
      std::vector<DetElement> *elems, double *tot,
      std::vector<int32_t> *prefix) {
    *tot = kInf;
    for (auto &kv : m) *tot = Plus(*tot, kv.second);
    bool first = true;
    for (auto &kv : m) {
      if (first) {
        *prefix = kv.first.second;
        first = false;
      } else {
        size_t n = 0;
        const auto &s = kv.first.second;
        while (n < prefix->size() && n < s.size() && (*prefix)[n] == s[n]) ++n;
        prefix->resize(n);
      }
      if (prefix->empty()) break;
    }
    elems->clear();
    for (auto &kv : m) {
      DetElement e;
      e.state = kv.first.first;
      e.string.assign(kv.first.second.begin() + prefix->size(),
                      kv.first.second.end());
      e.weight = kv.second - *tot;
      elems->push_back(e);
    }
    std::sort(elems->begin(), elems->end());
  }

  int32_t GetState(const std::vector<DetElement> &elems) {
    SubsetKey key = MakeKey(elems);
    auto it = subset_map_.find(key);
    if (it != subset_map_.end()) return it->second;
    int32_t s = out_.AddState();
    subset_map_.emplace(std::move(key), s);
    queue_.emplace_back(s, elems);
    return s;
  }

  void EmitChain(int32_t src, int32_t ilabel, float weight,
                 const std::vector<int32_t> &string, int32_t dst) {
    if (string.empty()) {
      out_.arcs[src].push_back({ilabel, 0, weight, dst});
      return;
    }
    int32_t cur = src;
    for (size_t i = 0; i < string.size(); ++i) {
      bool last = (i == string.size() - 1);
      int32_t nxt = last ? dst : out_.AddState();
      out_.arcs[cur].push_back({i == 0 ? ilabel : 0, string[i],
                                i == 0 ? weight : 0.0f, nxt});
      cur = nxt;
    }
  }

  void ProcessState(int32_t cur, const std::vector<DetElement> &elements) {
    // finals
    std::map<std::vector<int32_t>, double> final_groups;
    for (const auto &e : elements) {
      if (in_.final[e.state] == kInf) continue;
      double fw = e.weight + in_.final[e.state];
      auto it = final_groups.find(e.string);
      if (it == final_groups.end())
        final_groups[e.string] = fw;
      else
        it->second = Plus(it->second, fw);
    }
    for (auto &kv : final_groups) {
      if (kv.first.empty()) {
        out_.final[cur] = (out_.final[cur] == kInf)
                              ? kv.second
                              : Plus(out_.final[cur], kv.second);
      } else {
        int32_t tail = out_.AddState();
        out_.final[tail] = 0.0f;
        EmitChain(cur, 0, static_cast<float>(kv.second), kv.first, tail);
      }
    }
    // transitions grouped by ilabel
    std::map<int32_t,
             std::map<std::pair<int32_t, std::vector<int32_t>>, double>>
        by_label;
    for (const auto &e : elements) {
      for (const Arc &a : in_.arcs[e.state]) {
        if (a.ilabel == 0) continue;
        auto nstring = e.string;
        if (a.olabel != 0) nstring.push_back(a.olabel);
        auto &d = by_label[a.ilabel];
        auto nkey = std::make_pair(a.nextstate, nstring);
        double nw = e.weight + a.weight;
        auto it = d.find(nkey);
        if (it == d.end())
          d[nkey] = nw;
        else
          it->second = Plus(it->second, nw);
      }
    }
    for (auto &kv : by_label) {
      Closure(&kv.second);
      std::vector<DetElement> elems;
      double tot;
      std::vector<int32_t> prefix;
      Normalize(kv.second, &elems, &tot, &prefix);
      int32_t ns = GetState(elems);
      EmitChain(cur, kv.first, static_cast<float>(tot), prefix, ns);
    }
  }

  const Fst &in_;
  bool log_;
  Fst out_;
  std::unordered_map<SubsetKey, int32_t> subset_map_;
  std::vector<std::pair<int32_t, std::vector<DetElement>>> queue_;
};

// ---------------------------------------------------------------- minimize

Fst MinimizeEncoded(const Fst &in) {
  int32_t n = in.NumStates();
  if (n == 0) return in;
  auto Enc = [](const Arc &a) {
    return std::make_tuple(a.ilabel, a.olabel,
                           static_cast<int64_t>(llround(a.weight * 1e6)));
  };
  std::vector<int64_t> part(n);
  {
    std::map<int64_t, int64_t> cls;
    for (int32_t s = 0; s < n; ++s) {
      int64_t key = (in.final[s] == kInf)
                        ? std::numeric_limits<int64_t>::min()
                        : llround(in.final[s] * 1e6);
      auto it = cls.find(key);
      if (it == cls.end()) it = cls.emplace(key, cls.size()).first;
      part[s] = it->second;
    }
  }
  size_t num_classes = 0;
  while (true) {
    std::map<std::pair<int64_t, std::vector<std::tuple<int32_t, int32_t,
                                                       int64_t, int64_t>>>,
             int64_t>
        sig_map;
    std::vector<int64_t> new_part(n);
    for (int32_t s = 0; s < n; ++s) {
      std::vector<std::tuple<int32_t, int32_t, int64_t, int64_t>> sig;
      for (const Arc &a : in.arcs[s]) {
        auto [il, ol, w] = Enc(a);
        sig.emplace_back(il, ol, w, part[a.nextstate]);
      }
      std::sort(sig.begin(), sig.end());
      auto key = std::make_pair(part[s], std::move(sig));
      auto it = sig_map.find(key);
      if (it == sig_map.end()) it = sig_map.emplace(key, sig_map.size()).first;
      new_part[s] = it->second;
    }
    bool stable = sig_map.size() == num_classes;
    num_classes = sig_map.size();
    part.swap(new_part);
    if (stable) break;
  }
  if (static_cast<int32_t>(num_classes) == n) return in;
  Fst out;
  for (size_t i = 0; i < num_classes; ++i) out.AddState();
  std::vector<char> done(num_classes, 0);
  for (int32_t s = 0; s < n; ++s) {
    int64_t c = part[s];
    if (done[c]) continue;
    done[c] = 1;
    std::set<std::tuple<int32_t, int32_t, int64_t, int64_t>> seen;
    for (const Arc &a : in.arcs[s]) {
      auto [il, ol, w] = Enc(a);
      auto key = std::make_tuple(il, ol, w, part[a.nextstate]);
      if (!seen.insert(key).second) continue;
      out.arcs[c].push_back(
          {a.ilabel, a.olabel, a.weight,
           static_cast<int32_t>(part[a.nextstate])});
    }
    out.final[c] = in.final[s];
  }
  out.start = static_cast<int32_t>(part[in.start]);
  return Connect(out);
}

// ------------------------------------------------------ lattice decoder
//
// Native implementation of khg_tpu/decode/lattice.py's
// LatticeFasterDecoder.decode (which itself mirrors the reference's
// lattice-faster-decoder.cc:86-893 semantics via offline-equivalent
// pruning).  The Python implementation is the semantics reference; this
// reproduces it EXACTLY — same link exploration order (Python dicts are
// insertion-ordered; TokenMap mirrors that), same double arithmetic in
// the same association order, same tolerances — so the produced lattice
// is identical state-for-state and arc-for-arc (pinned by
// tests/test_native_lattice.py).

constexpr double kDInf = std::numeric_limits<double>::infinity();

// open-addressing int32 -> int32 map (linear probing, no deletion):
// the token maps see millions of lookups/inserts per decode, and
// std::unordered_map's per-node allocation dominates the runtime.
struct IntMap {
  std::vector<int32_t> keys, vals;
  size_t mask = 0, count = 0;

  IntMap() { Reset(16); }
  void Reset(size_t cap) {
    keys.assign(cap, -1);
    vals.resize(cap);
    mask = cap - 1;
    count = 0;
  }
  static size_t Hash(int32_t k) {
    return static_cast<uint32_t>(k) * 2654435761u;
  }
  // position of key, or -1
  int32_t Find(int32_t k) const {
    size_t i = Hash(k) & mask;
    while (keys[i] != -1) {
      if (keys[i] == k) return vals[i];
      i = (i + 1) & mask;
    }
    return -1;
  }
  void Insert(int32_t k, int32_t v) {
    if ((count + 1) * 10 >= keys.size() * 7) Grow();
    size_t i = Hash(k) & mask;
    while (keys[i] != -1) {
      if (keys[i] == k) {
        vals[i] = v;
        return;
      }
      i = (i + 1) & mask;
    }
    keys[i] = k;
    vals[i] = v;
    ++count;
  }
  void Grow() {
    std::vector<int32_t> ok = std::move(keys), ov = std::move(vals);
    Reset(ok.size() * 2);
    for (size_t i = 0; i < ok.size(); ++i) {
      if (ok[i] == -1) continue;
      size_t j = Hash(ok[i]) & mask;
      while (keys[j] != -1) j = (j + 1) & mask;
      keys[j] = ok[i];
      vals[j] = ov[i];
      ++count;
    }
  }
};

// state -> cost map with Python-dict iteration semantics: iteration is
// first-insertion order; updates do not move an entry.  Entry positions
// double as dense per-frame indices for the extra/beta tables.
struct TokenMap {
  std::vector<std::pair<int32_t, double>> items;
  IntMap idx;

  bool empty() const { return items.empty(); }
  int32_t Pos(int32_t s) const { return idx.Find(s); }
  double Get(int32_t s) const {
    int32_t p = idx.Find(s);
    return p < 0 ? kDInf : items[p].second;
  }
  void Set(int32_t s, double c) {
    int32_t p = idx.Find(s);
    if (p < 0) {
      idx.Insert(s, static_cast<int32_t>(items.size()));
      items.emplace_back(s, c);
    } else {
      items[p].second = c;
    }
  }
  template <typename Pred>
  void Filter(Pred keep) {
    std::vector<std::pair<int32_t, double>> kept;
    kept.reserve(items.size());
    for (const auto &kv : items)
      if (keep(kv.first)) kept.push_back(kv);
    items.swap(kept);
    idx.Reset(16);
    while (idx.keys.size() * 7 <= items.size() * 10) idx.Grow();
    for (int32_t i = 0; i < static_cast<int32_t>(items.size()); ++i)
      idx.Insert(items[i].first, i);
  }
};

struct Link {
  int32_t t0, s0, t1, s1, il, ol;
  double gc, ac;
};

struct LatticeDecoder {
  // graph in CSR form, double weights (Python floats are doubles)
  int32_t num_states, start;
  const double *finals;
  const int64_t *offsets;
  const int32_t *ail, *aol, *adst;
  const double *aw;
  // decodable
  const float *loglikes;  // (T, P) row-major
  int32_t T, P;
  const int32_t *id2pdf;
  float neg_scale;  // f32(-acoustic_scale): numpy computes ac in f32
  // config
  double beam, lattice_beam;
  int32_t max_active, min_active, prune_interval;

  std::vector<TokenMap> tokens;
  std::vector<Link> links;
  int64_t max_live_links = 0;

  double AcCost(int32_t t, int32_t il) const {
    // Python: ac = -acoustic_scale * loglikes (f32); float(ac[t, pdf])
    return static_cast<double>(
        neg_scale * loglikes[static_cast<int64_t>(t) * P + id2pdf[il]]);
  }

  // kth-smallest with numpy-partition index semantics: a negative kth
  // wraps from the end (np.partition(costs, k)[k]); an index out of
  // range after wrapping mirrors numpy's ValueError (signalled as NaN,
  // caught by the caller).  The Python reference computes
  // np.partition(costs, k - 1)[k - 1], which is well-defined for
  // k = 0 (the max) — replicate rather than UB on begin() - 1.
  static double KthPartition(std::vector<double> tmp, int64_t kth) {
    int64_t n = static_cast<int64_t>(tmp.size());
    if (kth < 0) kth += n;
    if (kth < 0 || kth >= n)
      return std::numeric_limits<double>::quiet_NaN();
    std::nth_element(tmp.begin(), tmp.begin() + kth, tmp.end());
    return tmp[kth];
  }

  // GetCutoff semantics (lattice.py frame_cutoff / faster-decoder.cc
  // GetCutoff): beam cutoff, tightened to the max_active-th best when
  // over max_active, never pruning below min_active live tokens.
  // Returns NaN for index-out-of-range configs (numpy would raise).
  double FrameCutoff(const TokenMap &tok) const {
    std::vector<double> costs;
    costs.reserve(tok.items.size());
    for (const auto &kv : tok.items) costs.push_back(kv.second);
    double best = *std::min_element(costs.begin(), costs.end());
    double cutoff = best + beam;
    int64_t n = static_cast<int64_t>(costs.size());
    if (max_active < n) {
      double kth = KthPartition(costs, static_cast<int64_t>(max_active) - 1);
      if (std::isnan(kth)) return kth;
      cutoff = std::min(cutoff, kth);
    }
    if (min_active > 0) {
      if (n <= min_active) return kDInf;
      double kth = KthPartition(costs, static_cast<int64_t>(min_active) - 1);
      if (std::isnan(kth)) return kth;
      cutoff = std::max(cutoff, kth);
    }
    return cutoff;
  }

  void EpsExpand(int32_t t, double cutoff) {
    TokenMap &tok = tokens[t];
    std::vector<int32_t> queue;
    queue.reserve(tok.items.size());
    for (const auto &kv : tok.items) queue.push_back(kv.first);
    while (!queue.empty()) {
      int32_t s = queue.back();
      queue.pop_back();
      double cost = tok.Get(s);
      if (cost > cutoff) continue;
      for (int64_t i = offsets[s]; i < offsets[s + 1]; ++i) {
        if (ail[i] != 0) continue;
        double nc = cost + aw[i];
        if (nc > cutoff) continue;
        links.push_back({t, s, t, adst[i], 0, aol[i], aw[i], 0.0});
        if (nc < tok.Get(adst[i])) {
          tok.Set(adst[i], nc);
          queue.push_back(adst[i]);
        }
      }
    }
  }

  // Offline-equivalent PruneActiveTokens analogue
  // (lattice.py _prune_active): delete links/tokens provably outside
  // lattice_beam of the best path through the frame-t_now frontier.
  // Flattened (frame, token-position) index for the relaxation tables:
  // token maps are frozen while a relaxation runs, so positions are
  // stable.  Resolving each link's endpoints ONCE turns every
  // subsequent sweep into pure array arithmetic — the sweeps themselves
  // (in reversed link order, identical update sequence to the Python
  // reference) dominate the decode otherwise.
  struct LinkIndex {
    std::vector<int64_t> base;  // frame -> offset into the flat tables
    std::vector<int64_t> g0, g1;  // per link: flat endpoint slots, -1 none
    std::vector<double> a0, a1;   // per link: endpoint token costs
    int64_t total = 0;
  };

  LinkIndex BuildIndex(int32_t t_max) const {
    LinkIndex ix;
    ix.base.assign(t_max + 2, 0);
    for (int32_t t = 0; t <= t_max; ++t)
      ix.base[t + 1] = ix.base[t] + static_cast<int64_t>(tokens[t].items.size());
    ix.total = ix.base[t_max + 1];
    size_t L = links.size();
    ix.g0.resize(L);
    ix.g1.resize(L);
    ix.a0.resize(L);
    ix.a1.resize(L);
    for (size_t i = 0; i < L; ++i) {
      const Link &l = links[i];
      if (l.t0 > t_max || l.t1 > t_max) {
        ix.g0[i] = ix.g1[i] = -1;
        continue;
      }
      int32_t p0 = tokens[l.t0].Pos(l.s0);
      int32_t p1 = tokens[l.t1].Pos(l.s1);
      ix.g0[i] = p0 < 0 ? -1 : ix.base[l.t0] + p0;
      ix.g1[i] = p1 < 0 ? -1 : ix.base[l.t1] + p1;
      ix.a0[i] = p0 < 0 ? kDInf : tokens[l.t0].items[p0].second;
      ix.a1[i] = p1 < 0 ? kDInf : tokens[l.t1].items[p1].second;
    }
    return ix;
  }

  void PruneActive(int32_t t_now) {
    LinkIndex ix = BuildIndex(t_now);
    std::vector<double> extra(ix.total, kDInf);
    for (int64_t g = ix.base[t_now]; g < ix.base[t_now + 1]; ++g)
      extra[g] = 0.0;
    int64_t L = static_cast<int64_t>(links.size());
    int64_t max_iters = 1 + L;
    for (int64_t iter = 0; iter < max_iters; ++iter) {
      bool changed = false;
      for (int64_t i = L - 1; i >= 0; --i) {
        if (links[i].t1 > t_now) continue;
        int64_t g1 = ix.g1[i];
        if (g1 < 0) continue;
        double e1 = extra[g1];
        if (e1 == kDInf) continue;
        int64_t g0 = ix.g0[i];
        if (g0 < 0) continue;
        double cand = e1 + (ix.a0[i] + links[i].gc + links[i].ac - ix.a1[i]);
        if (cand < extra[g0] - 1e-12) {
          extra[g0] = cand;
          changed = true;
        }
      }
      if (!changed) break;
    }
    std::vector<Link> kept;
    kept.reserve(links.size());
    for (int64_t i = 0; i < L; ++i) {
      const Link &l = links[i];
      if (l.t1 > t_now) {
        kept.push_back(l);
        continue;
      }
      int64_t g1 = ix.g1[i], g0 = ix.g0[i];
      if (g1 < 0 || g0 < 0) continue;
      double e1 = extra[g1];
      if (e1 == kDInf) continue;
      if (e1 + (ix.a0[i] + l.gc + l.ac - ix.a1[i]) <= lattice_beam + 1e-6)
        kept.push_back(l);
    }
    links.swap(kept);
    for (int32_t t = 0; t < t_now; ++t) {
      const TokenMap &tok = tokens[t];
      int64_t base = ix.base[t];
      tokens[t].Filter([&](int32_t s) {
        int32_t p = tok.Pos(s);
        return extra[base + p] <= lattice_beam + 1e-6;
      });
    }
  }
};

}  // namespace

// lattice output over the C ABI: arcs in creation (link) order; lattice
// state i originated at (key_t[i], key_s[i]) in the (frame, graph-state)
// grid.  Buffers are malloc'd; release with khg_free_lattice.
struct LatticeBuf {
  int32_t num_states;
  int32_t start;
  int64_t num_arcs;
  int32_t *src;
  int32_t *il;
  int32_t *ol;
  double *gc;   // graph part of the arc cost
  double *ac;   // acoustic part of the arc cost
  int32_t *dst;
  int32_t *key_t;  // per lattice state
  int32_t *key_s;
  int32_t num_finals;
  int32_t *final_state;
  double *final_w;
  int32_t partial;
  int64_t max_live_links;
};

namespace {

template <typename T>
T *MallocCopy(const std::vector<T> &v) {
  T *p = static_cast<T *>(malloc(sizeof(T) * std::max<size_t>(v.size(), 1)));
  std::memcpy(p, v.data(), sizeof(T) * v.size());
  return p;
}

}  // namespace

extern "C" {

void khg_free_lattice(LatticeBuf *b) {
  free(b->src);
  free(b->il);
  free(b->ol);
  free(b->gc);
  free(b->ac);
  free(b->dst);
  free(b->key_t);
  free(b->key_s);
  free(b->final_state);
  free(b->final_w);
  std::memset(b, 0, sizeof(*b));
}

// Returns 0 and fills *out on success; 1 when decoding produced no
// lattice (Python returns None).  Mirrors
// khg_tpu/decode/lattice.py LatticeFasterDecoder.decode exactly.
int khg_lattice_decode(
    int32_t num_states, int32_t start, const double *finals,
    const int64_t *arc_offsets, const int32_t *ail, const int32_t *aol,
    const double *aw, const int32_t *adst, const float *loglikes, int32_t T,
    int32_t P, const int32_t *id2pdf, double acoustic_scale, double beam,
    int32_t max_active, int32_t min_active, double lattice_beam,
    int32_t prune_interval, int32_t allow_partial, LatticeBuf *out) {
  LatticeDecoder d;
  d.num_states = num_states;
  d.start = start;
  d.finals = finals;
  d.offsets = arc_offsets;
  d.ail = ail;
  d.aol = aol;
  d.aw = aw;
  d.adst = adst;
  d.loglikes = loglikes;
  d.T = T;
  d.P = P;
  d.id2pdf = id2pdf;
  d.neg_scale = static_cast<float>(-acoustic_scale);
  d.beam = beam;
  d.lattice_beam = lattice_beam;
  d.max_active = max_active;
  d.min_active = min_active;
  d.prune_interval = prune_interval;

  // opt-in phase timing (KHG_DEBUG_TIMING=1): forward / prune / beta /
  // build breakdown on stderr — decoder observability without a profiler
  const bool dbg = getenv("KHG_DEBUG_TIMING") != nullptr;
  auto Now = [] { return std::chrono::steady_clock::now(); };
  auto Ms = [](auto a, auto b) {
    return std::chrono::duration<double, std::milli>(b - a).count();
  };
  auto t_start = Now();
  double ms_prune = 0.0;
  int64_t beta_sweeps = 0;

  d.tokens.resize(T + 1);
  d.tokens[0].Set(start, 0.0);
  {
    double c0 = d.FrameCutoff(d.tokens[0]);
    if (std::isnan(c0)) return 2;  // numpy-raising partition index
    d.EpsExpand(0, c0);
  }
  for (int32_t t = 0; t < T; ++t) {
    if (d.tokens[t].empty()) return 1;
    double cutoff = d.FrameCutoff(d.tokens[t]);
    if (std::isnan(cutoff)) return 2;
    // snapshot (Python: list(tokens[t].items())) — the emit stage only
    // writes frame t+1, so plain iteration is equivalent
    size_t n_now = d.tokens[t].items.size();
    for (size_t i = 0; i < n_now; ++i) {
      auto [s, cost] = d.tokens[t].items[i];
      if (cost > cutoff) continue;
      for (int64_t k = arc_offsets[s]; k < arc_offsets[s + 1]; ++k) {
        if (ail[k] == 0) continue;
        double ac_cost = d.AcCost(t, ail[k]);
        double nc = cost + aw[k] + ac_cost;
        d.links.push_back({t, s, t + 1, adst[k], ail[k], aol[k], aw[k],
                           ac_cost});
        if (nc < d.tokens[t + 1].Get(adst[k])) d.tokens[t + 1].Set(adst[k], nc);
      }
    }
    if (d.tokens[t + 1].empty()) return 1;
    double next_cutoff = d.FrameCutoff(d.tokens[t + 1]);
    if (std::isnan(next_cutoff)) return 2;
    d.EpsExpand(t + 1, next_cutoff);
    d.max_live_links =
        std::max(d.max_live_links, static_cast<int64_t>(d.links.size()));
    if ((t + 1) % prune_interval == 0 && t + 1 < T) {
      auto p0 = Now();
      d.PruneActive(t + 1);
      ms_prune += Ms(p0, Now());
    }
  }
  auto t_fwd = Now();
  d.max_live_links =
      std::max(d.max_live_links, static_cast<int64_t>(d.links.size()));

  // final costs (insertion order of the frame-T frontier)
  std::vector<std::pair<int32_t, double>> final_toks;
  for (const auto &kv : d.tokens[T].items)
    if (finals[kv.first] != kDInf && !std::isinf(finals[kv.first]))
      final_toks.emplace_back(kv.first, finals[kv.first]);
  int32_t partial = final_toks.empty() ? 1 : 0;
  if (partial) {
    if (!allow_partial) return 1;
    for (const auto &kv : d.tokens[T].items)
      final_toks.emplace_back(kv.first, 0.0);
  }

  // beta: backward relaxation to a fixpoint over the links, on the
  // flattened (frame, token-position) tables (token maps are frozen now)
  LatticeDecoder::LinkIndex ix = d.BuildIndex(T);
  std::vector<double> beta(ix.total, kDInf);
  for (const auto &kv : final_toks)
    beta[ix.base[T] + d.tokens[T].Pos(kv.first)] = kv.second;
  int64_t L = static_cast<int64_t>(d.links.size());
  int64_t max_iters = 1 + L;
  for (int64_t iter = 0; iter < max_iters; ++iter) {
    ++beta_sweeps;
    bool changed = false;
    for (int64_t i = L - 1; i >= 0; --i) {
      int64_t g1 = ix.g1[i];
      if (g1 < 0) continue;
      double b = beta[g1];
      if (b == kDInf) continue;
      double cand = d.links[i].gc + d.links[i].ac + b;
      int64_t g0 = ix.g0[i];
      if (g0 < 0) continue;
      if (cand < beta[g0] - 1e-12) {
        beta[g0] = cand;
        changed = true;
      }
    }
    if (!changed) break;
  }
  auto t_beta = Now();
  auto BetaGet = [&](int32_t t, int32_t s) -> double {
    int32_t p = d.tokens[t].Pos(s);
    return p < 0 ? kDInf : beta[ix.base[t] + p];
  };

  double best_total = BetaGet(0, start);
  if (best_total == kDInf) return 1;
  double keep_cutoff = best_total + lattice_beam;

  // build the pruned lattice over surviving (t, graph-state) tokens,
  // lattice states numbered in first-appearance (link) order
  std::unordered_map<int64_t, int32_t> state_map;
  std::vector<int32_t> key_t, key_s;
  std::vector<int32_t> osrc, oil, ool, odst;
  std::vector<double> ogc, oac;
  auto GetState = [&](int32_t t, int32_t s) -> int32_t {
    int64_t key = (static_cast<int64_t>(t) << 32) |
                  static_cast<uint32_t>(s);
    auto it = state_map.find(key);
    if (it != state_map.end()) return it->second;
    int32_t id = static_cast<int32_t>(key_t.size());
    state_map.emplace(key, id);
    key_t.push_back(t);
    key_s.push_back(s);
    return id;
  };
  for (int64_t i = 0; i < L; ++i) {
    const Link &l = d.links[i];
    double a0 = ix.g0[i] < 0 ? kDInf : ix.a0[i];
    double b1 = ix.g1[i] < 0 ? kDInf : beta[ix.g1[i]];
    if (a0 == kDInf || b1 == kDInf) continue;
    if (a0 + l.gc + l.ac + b1 > keep_cutoff + 1e-6) continue;
    int32_t src = GetState(l.t0, l.s0);
    int32_t dst = GetState(l.t1, l.s1);
    osrc.push_back(src);
    oil.push_back(l.il);
    ool.push_back(l.ol);
    ogc.push_back(l.gc);
    oac.push_back(l.ac);
    odst.push_back(dst);
  }
  int64_t start_key = static_cast<int64_t>(0) << 32 |
                      static_cast<uint32_t>(start);
  auto sit = state_map.find(start_key);
  if (sit == state_map.end()) return 1;

  std::vector<int32_t> fstate;
  std::vector<double> fw;
  for (const auto &kv : final_toks) {
    double a = d.tokens[T].Get(kv.first);
    double b = BetaGet(T, kv.first);
    if (a + b > keep_cutoff + 1e-6) continue;
    int64_t key = (static_cast<int64_t>(T) << 32) |
                  static_cast<uint32_t>(kv.first);
    auto it = state_map.find(key);
    if (it == state_map.end()) continue;
    fstate.push_back(it->second);
    fw.push_back(kv.second);
  }

  out->num_states = static_cast<int32_t>(key_t.size());
  out->start = sit->second;
  out->num_arcs = static_cast<int64_t>(osrc.size());
  out->src = MallocCopy(osrc);
  out->il = MallocCopy(oil);
  out->ol = MallocCopy(ool);
  out->gc = MallocCopy(ogc);
  out->ac = MallocCopy(oac);
  out->dst = MallocCopy(odst);
  out->key_t = MallocCopy(key_t);
  out->key_s = MallocCopy(key_s);
  out->num_finals = static_cast<int32_t>(fstate.size());
  out->final_state = MallocCopy(fstate);
  out->final_w = MallocCopy(fw);
  out->partial = partial;
  out->max_live_links = d.max_live_links;
  if (dbg) {
    fprintf(stderr,
            "[khg_lattice_decode] T=%d links=%lld fwd=%.1fms "
            "(prune=%.1fms) beta=%.1fms (%lld sweeps) build=%.1fms\n",
            T, static_cast<long long>(L), Ms(t_start, t_fwd), ms_prune,
            Ms(t_fwd, t_beta), static_cast<long long>(beta_sweeps),
            Ms(t_beta, Now()));
  }
  return 0;
}

}  // extern "C"

// --------------------------------------------------------- shortest path

// best path over a flat arc list (exact replica of
// khg_tpu/fstlib/fst.py shortest_path: Dijkstra when all weights are
// >= -1e-9, Bellman-Ford sweeps otherwise, identical tie-breaking and
// tolerances).  Used by the native lattice path so a decode-to-words
// never materializes Python arc objects.
struct PathBuf {
  int32_t found;
  int32_t n_il;
  int32_t n_ol;
  int32_t *il;
  int32_t *ol;
  double cost;
};

extern "C" {

void khg_free_path(PathBuf *b) {
  free(b->il);
  free(b->ol);
  std::memset(b, 0, sizeof(*b));
}

// returns 0 on success (out->found says whether a path exists),
// -1 on a negative cycle (the Python reference raises).
int khg_shortest_path(int32_t num_states, int32_t start, const double *finals,
                      int64_t num_arcs, const int32_t *asrc,
                      const int32_t *ail, const int32_t *aol, const double *aw,
                      const int32_t *adst, PathBuf *out) {
  std::memset(out, 0, sizeof(*out));
  if (start < 0 || num_states == 0) return 0;
  // stable CSR by src: per-state arc order == arc insertion order
  std::vector<int64_t> off(num_states + 1, 0);
  for (int64_t i = 0; i < num_arcs; ++i) off[asrc[i] + 1]++;
  for (int32_t s = 0; s < num_states; ++s) off[s + 1] += off[s];
  std::vector<int64_t> order(num_arcs);
  {
    std::vector<int64_t> cur(off.begin(), off.end() - 1);
    for (int64_t i = 0; i < num_arcs; ++i) order[cur[asrc[i]]++] = i;
  }
  double min_w = 0.0;
  if (num_arcs > 0) {
    min_w = aw[0];
    for (int64_t i = 1; i < num_arcs; ++i) min_w = std::min(min_w, aw[i]);
  }
  std::vector<double> dist(num_states, kDInf);
  std::vector<int64_t> prev_arc(num_states, -1);
  dist[start] = 0.0;
  if (min_w < -1e-9) {
    bool done = false;
    for (int64_t it = 0; it < static_cast<int64_t>(num_states) + 2; ++it) {
      bool changed = false;
      for (int32_t s = 0; s < num_states; ++s) {
        if (dist[s] == kDInf) continue;
        for (int64_t k = off[s]; k < off[s + 1]; ++k) {
          int64_t i = order[k];
          // dist[s] read per arc: a self-loop relaxation mid-state must
          // be visible to the remaining arcs, as in the Python reference
          double nd = dist[s] + aw[i];
          if (nd < dist[adst[i]] - 1e-12) {
            dist[adst[i]] = nd;
            prev_arc[adst[i]] = i;
            changed = true;
          }
        }
      }
      if (!changed) {
        done = true;
        break;
      }
    }
    if (!done) return -1;  // negative cycle
  } else {
    using QE = std::pair<double, int32_t>;
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> heap;
    heap.push({0.0, start});
    while (!heap.empty()) {
      auto [d, s] = heap.top();
      heap.pop();
      if (d > dist[s]) continue;
      for (int64_t k = off[s]; k < off[s + 1]; ++k) {
        int64_t i = order[k];
        double nd = d + aw[i];
        if (nd < dist[adst[i]]) {
          dist[adst[i]] = nd;
          prev_arc[adst[i]] = i;
          heap.push({nd, adst[i]});
        }
      }
    }
  }
  int32_t best_s = -1;
  double best_c = kDInf;
  for (int32_t s = 0; s < num_states; ++s)
    if (finals[s] != kDInf && dist[s] + finals[s] < best_c) {
      best_c = dist[s] + finals[s];
      best_s = s;
    }
  if (best_s < 0) return 0;
  std::vector<int32_t> ils, ols;
  int32_t s = best_s;
  int64_t guard = num_arcs + num_states + 2;
  while (prev_arc[s] >= 0) {
    int64_t i = prev_arc[s];
    if (ail[i] != 0) ils.push_back(ail[i]);
    if (aol[i] != 0) ols.push_back(aol[i]);
    s = asrc[i];
    if (--guard < 0) return -1;
  }
  std::reverse(ils.begin(), ils.end());
  std::reverse(ols.begin(), ols.end());
  out->found = 1;
  out->n_il = static_cast<int32_t>(ils.size());
  out->n_ol = static_cast<int32_t>(ols.size());
  out->il = MallocCopy(ils);
  out->ol = MallocCopy(ols);
  out->cost = best_c;
  return 0;
}

}  // extern "C"

// ------------------------------------------------------------------- C ABI

struct FstBuf {
  int32_t num_states;
  int32_t start;
  float *finals;
  int64_t num_arcs;
  int32_t *src;
  int32_t *il;
  int32_t *ol;
  float *w;
  int32_t *dst;
};

namespace {

Fst FromBuf(const FstBuf *b) {
  Fst f;
  for (int32_t i = 0; i < b->num_states; ++i) f.AddState();
  f.start = b->start;
  for (int32_t i = 0; i < b->num_states; ++i) f.final[i] = b->finals[i];
  for (int64_t i = 0; i < b->num_arcs; ++i)
    f.arcs[b->src[i]].push_back({b->il[i], b->ol[i], b->w[i], b->dst[i]});
  return f;
}

void ToBuf(const Fst &f, FstBuf *b) {
  b->num_states = f.NumStates();
  b->start = f.start;
  b->finals = static_cast<float *>(malloc(sizeof(float) * f.NumStates()));
  int64_t na = 0;
  for (const auto &arcs : f.arcs) na += arcs.size();
  b->num_arcs = na;
  b->src = static_cast<int32_t *>(malloc(sizeof(int32_t) * na));
  b->il = static_cast<int32_t *>(malloc(sizeof(int32_t) * na));
  b->ol = static_cast<int32_t *>(malloc(sizeof(int32_t) * na));
  b->w = static_cast<float *>(malloc(sizeof(float) * na));
  b->dst = static_cast<int32_t *>(malloc(sizeof(int32_t) * na));
  int64_t k = 0;
  for (int32_t s = 0; s < f.NumStates(); ++s) {
    b->finals[s] = f.final[s];
    for (const Arc &a : f.arcs[s]) {
      b->src[k] = s;
      b->il[k] = a.ilabel;
      b->ol[k] = a.olabel;
      b->w[k] = a.weight;
      b->dst[k] = a.nextstate;
      ++k;
    }
  }
}

}  // namespace

extern "C" {

void khg_free_fst(FstBuf *b) {
  free(b->finals);
  free(b->src);
  free(b->il);
  free(b->ol);
  free(b->w);
  free(b->dst);
  b->finals = nullptr;
  b->src = b->il = b->ol = b->dst = nullptr;
  b->w = nullptr;
}

int khg_compose(const FstBuf *a, const FstBuf *b, FstBuf *out) {
  Fst fa = FromBuf(a), fb = FromBuf(b);
  Fst result = Compose(fa, fb);
  ToBuf(result, out);
  return 0;
}

int khg_determinize_star(const FstBuf *a, int log_semiring, FstBuf *out) {
  Fst fa = FromBuf(a);
  DeterminizerStar det(fa, log_semiring != 0);
  Fst result;
  if (!det.Run(&result)) return 1;
  ToBuf(result, out);
  return 0;
}

int khg_minimize_encoded(const FstBuf *a, FstBuf *out) {
  Fst fa = FromBuf(a);
  Fst result = MinimizeEncoded(fa);
  ToBuf(result, out);
  return 0;
}

int khg_connect(const FstBuf *a, FstBuf *out) {
  Fst fa = FromBuf(a);
  Fst result = Connect(fa);
  ToBuf(result, out);
  return 0;
}

}  // extern "C"
