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
#include <cmath>
#include <cstdint>
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

}  // namespace

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
