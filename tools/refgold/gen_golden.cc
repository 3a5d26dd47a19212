// Golden-fixture generator: compiles the REFERENCE model/estimation layer
// (/root/reference/kaldi-hmm-gmm/csrc, in place — nothing copied) against
// the shim headers in include/, drives it on deterministic inputs, and
// dumps the results as JSON + Kaldi binary/text model files under
// tests/golden/.  tests/test_reference_parity.py then asserts that
// khg_tpu reproduces every number and byte.
//
// Build & run: tools/refgold/build_and_run.sh
//
// Reference entry points exercised (file:line in /root/reference):
//   kaldi-hmm-gmm/csrc/hmm-topology.cc:23-280  (Read/Write/Check/MinLength)
//   kaldi-hmm-gmm/csrc/context-dep.cc:241-268  (MonophoneContextDependency)
//   kaldi-hmm-gmm/csrc/transition-model.cc:27-337,657-750 (numbering, MleUpdate)
//   kaldi-hmm-gmm/csrc/diag-gmm.cc:103-446,557-851 (gconsts/loglikes/merge)
//   kaldi-hmm-gmm/csrc/mle-diag-gmm.cc:100-499  (accumulate + MLE/MAP update)
//   kaldi-hmm-gmm/csrc/mle-am-diag-gmm.cc:41-230 (AM accumulate/update)
//   kaldi-hmm-gmm/csrc/model-common.cc:29-70    (GetSplitTargets)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "kaldi-hmm-gmm/csrc/am-diag-gmm.h"
#include "kaldi-hmm-gmm/csrc/build-tree-utils.h"
#include "kaldi-hmm-gmm/csrc/context-dep.h"
#include "kaldi-hmm-gmm/csrc/diag-gmm.h"
#include "kaldi-hmm-gmm/csrc/hmm-topology.h"
#include "kaldi-hmm-gmm/csrc/mle-am-diag-gmm.h"
#include "kaldi-hmm-gmm/csrc/mle-diag-gmm.h"
#include "kaldi-hmm-gmm/csrc/model-common.h"
#include "kaldi-hmm-gmm/csrc/transition-model.h"
#include "kaldi_native_io/csrc/io-funcs.h"

using namespace khg;  // NOLINT

// ----------------------------------------------------------- JSON emitter

struct Json {
  std::ostringstream os;
  bool first_in_scope = true;

  void sep() {
    if (!first_in_scope) os << ",";
    first_in_scope = false;
  }
  void obj_open(const std::string &key = "") {
    sep();
    if (!key.empty()) os << "\"" << key << "\":";
    os << "{";
    first_in_scope = true;
  }
  void obj_close() {
    os << "}";
    first_in_scope = false;
  }
  void arr_open(const std::string &key) {
    sep();
    os << "\"" << key << "\":[";
    first_in_scope = true;
  }
  void arr_close() {
    os << "]";
    first_in_scope = false;
  }
  void num(double v) {
    sep();
    char buf[64];
    snprintf(buf, sizeof(buf), "%.17g", v);
    os << buf;
  }
  void kv(const std::string &key, double v) {
    sep();
    char buf[64];
    snprintf(buf, sizeof(buf), "%.17g", v);
    os << "\"" << key << "\":" << buf;
  }
  void kv(const std::string &key, int64_t v) {
    sep();
    os << "\"" << key << "\":" << v;
  }
  void kv(const std::string &key, bool v) {
    sep();
    os << "\"" << key << "\":" << (v ? "true" : "false");
  }
  template <class V>
  void vec(const std::string &key, const V &v, int n) {
    arr_open(key);
    for (int i = 0; i < n; ++i) num(static_cast<double>(v(i)));
    arr_close();
  }
  void ivec(const std::string &key, const std::vector<int32_t> &v) {
    arr_open(key);
    for (int32_t e : v) num(e);
    arr_close();
  }
  template <class M>
  void mat(const std::string &key, const M &m) {
    arr_open(key);
    for (int i = 0; i < m.rows(); ++i) {
      sep();
      os << "[";
      first_in_scope = true;
      for (int j = 0; j < m.cols(); ++j) num(static_cast<double>(m(i, j)));
      os << "]";
      first_in_scope = false;
    }
    arr_close();
  }
};

// -------------------------------------------------- deterministic params

// Simple fixed formulas (echoed into the JSON, so the Python side reads
// them back rather than re-deriving).
static float det(float a, float b, int i) { return a + std::fmod(b * i, 1.0f); }

static DiagGmm *make_gmm(int K, int D, int seed) {
  FloatVector w(K);
  float tot = 0;
  for (int k = 0; k < K; ++k) {
    w(k) = 0.3f + det(0.1f, 0.37f, k + seed);
    tot += w(k);
  }
  for (int k = 0; k < K; ++k) w(k) /= tot;
  FloatMatrix means(K, D), invvars(K, D);
  for (int k = 0; k < K; ++k) {
    for (int d = 0; d < D; ++d) {
      means(k, d) = -1.0f + det(0.2f, 0.61f, k * D + d + seed) * 2.0f;
      invvars(k, d) = 1.0f / (0.3f + det(0.1f, 0.43f, k * D + d + 2 * seed) * 1.5f);
    }
  }
  DiagGmm *g = new DiagGmm(K, D);
  g->SetWeights(w);
  g->SetInvVarsAndMeans(invvars, means);
  g->ComputeGconsts();
  return g;
}

static FloatMatrix make_frames(int T, int D, int seed) {
  FloatMatrix x(T, D);
  for (int t = 0; t < T; ++t)
    for (int d = 0; d < D; ++d)
      x(t, d) = -1.5f + det(0.05f, 0.777f, t * D + d + seed) * 3.0f;
  return x;
}

static void dump_gmm(Json &j, const std::string &key, const DiagGmm &g) {
  j.obj_open(key);
  j.kv("num_gauss", (int64_t)g.NumGauss());
  j.kv("dim", (int64_t)g.Dim());
  j.vec("weights", g.weights(), g.NumGauss());
  j.vec("gconsts", g.gconsts(), g.NumGauss());
  j.mat("means", g.GetMeans());
  j.mat("vars", g.GetVars());
  j.obj_close();
}

static void write_model_files(const std::string &dir, const HmmTopology &topo,
                              const ContextDependency &tree,
                              const TransitionModel &tm) {
  auto wr = [&](const std::string &name, auto fn) {
    {
      std::ofstream os(dir + "/" + name + ".bin", std::ios::binary);
      kaldiio::InitKaldiOutputStream(os, true);
      fn(os, true);
    }
    {
      std::ofstream os(dir + "/" + name + ".txt");
      fn(os, false);
    }
  };
  wr("topo", [&](std::ostream &os, bool b) { topo.Write(os, b); });
  wr("tree", [&](std::ostream &os, bool b) { tree.Write(os, b); });
  wr("trans", [&](std::ostream &os, bool b) { tm.Write(os, b); });
}

int main(int argc, char **argv) {
  if (argc != 3) {
    std::cerr << "usage: gen_golden <topo.txt> <out_dir>\n";
    return 1;
  }
  std::string topo_path = argv[1], out_dir = argv[2];

  Json j;
  j.obj_open();

  // ---------------------------------------------------------- topology
  HmmTopology topo;
  {
    std::ifstream is(topo_path);
    topo.Read(is, false);
  }
  topo.Check();
  std::vector<int32_t> phones = topo.GetPhones();
  j.obj_open("topo");
  j.ivec("phones", phones);
  j.kv("is_hmm", topo.IsHmm());
  j.arr_open("num_pdf_classes");
  for (int32_t p : phones) j.num(topo.NumPdfClasses(p));
  j.arr_close();
  j.arr_open("min_length");
  for (int32_t p : phones) j.num(topo.MinLength(p));
  j.arr_close();
  j.obj_close();

  // -------------------------------------------------------------- tree
  std::vector<int32_t> phone2num_pdf_classes;
  topo.GetPhoneToNumPdfClasses(&phone2num_pdf_classes);
  ContextDependency *tree =
      MonophoneContextDependency(phones, phone2num_pdf_classes);
  j.obj_open("tree");
  j.kv("num_pdfs", (int64_t)tree->NumPdfs());
  j.arr_open("pdf_table");  // rows [phone, pdf_class, pdf_id]
  for (int32_t p : phones) {
    for (int32_t c = 0; c < topo.NumPdfClasses(p); ++c) {
      int32_t pdf = -1;
      bool ok = tree->Compute({p}, c, &pdf);
      j.sep();
      j.os << "[" << p << "," << c << "," << (ok ? pdf : -1) << "]";
    }
  }
  j.arr_close();
  j.obj_close();

  // -------------------------------------------------- transition model
  TransitionModel tm(*tree, topo);
  int32_t num_tids = tm.NumTransitionIds();
  int32_t num_tstates = tm.NumTransitionStates();
  j.obj_open("transition_model");
  j.kv("num_transition_ids", (int64_t)num_tids);
  j.kv("num_transition_states", (int64_t)num_tstates);
  j.kv("num_pdfs", (int64_t)tm.NumPdfs());
  j.arr_open("tuples");  // [phone, hmm_state, forward_pdf, self_loop_pdf]
  for (int32_t s = 1; s <= num_tstates; ++s) {
    j.sep();
    j.os << "[" << tm.TransitionStateToPhone(s) << ","
         << "-1"  // hmm_state not directly exposed; recovered below
         << "," << tm.TransitionStateToForwardPdf(s) << ","
         << tm.TransitionStateToSelfLoopPdf(s) << "]";
  }
  j.arr_close();
  {
    std::vector<int32_t> id2pdf = tm.TransitionIdToPdfArray();
    j.ivec("id2pdf", id2pdf);
  }
  j.arr_open("id2state");
  for (int32_t t = 1; t <= num_tids; ++t)
    j.num(tm.TransitionIdToTransitionState(t));
  j.arr_close();
  j.arr_open("is_self_loop");
  for (int32_t t = 1; t <= num_tids; ++t) j.num(tm.IsSelfLoop(t) ? 1 : 0);
  j.arr_close();
  j.arr_open("is_final");
  for (int32_t t = 1; t <= num_tids; ++t) j.num(tm.IsFinal(t) ? 1 : 0);
  j.arr_close();
  j.arr_open("log_probs");
  for (int32_t t = 1; t <= num_tids; ++t) j.num(tm.GetTransitionLogProb(t));
  j.arr_close();
  j.arr_open("self_loop_of");
  for (int32_t s = 1; s <= num_tstates; ++s) j.num(tm.SelfLoopOf(s));
  j.arr_close();
  j.arr_open("non_self_loop_log_probs");
  for (int32_t s = 1; s <= num_tstates; ++s)
    j.num(tm.GetNonSelfLoopLogProb(s));
  j.arr_close();
  j.arr_open("log_prob_ignoring_self_loops");
  for (int32_t t = 1; t <= num_tids; ++t)
    j.num(tm.IsSelfLoop(t) ? 0.0
                           : tm.GetTransitionLogProbIgnoringSelfLoops(t));
  j.arr_close();
  j.obj_close();

  write_model_files(out_dir, topo, *tree, tm);

  // -------------------------------------------- transition MLE update
  {
    DoubleVector stats;
    tm.InitStats(&stats);
    for (int32_t t = 1; t <= num_tids; ++t) {
      // mixture of healthy and starved states; state 2's counts fall
      // below mincount=5 to hit the skip branch
      double c = 0.25 + std::fmod(7.3 * t + 1.1, 13.0);
      if (tm.TransitionIdToTransitionState(t) == 2) c = 0.5;
      stats(t) = c;
    }
    j.obj_open("transition_mle");
    j.arr_open("stats");
    for (int32_t t = 0; t <= num_tids; ++t) j.num(stats(t));
    j.arr_close();
    {
      TransitionModel tm2(*tree, topo);
      float objf = 0, count = 0;
      tm2.MleUpdate(stats, MleTransitionUpdateConfig(), &objf, &count);
      j.kv("objf_impr", (double)objf);
      j.kv("count", (double)count);
      j.arr_open("new_log_probs");
      for (int32_t t = 1; t <= num_tids; ++t)
        j.num(tm2.GetTransitionLogProb(t));
      j.arr_close();
    }
    {
      TransitionModel tm3(*tree, topo);
      float objf = 0, count = 0;
      MleTransitionUpdateConfig cfg;
      cfg.share_for_pdfs = true;
      tm3.MleUpdate(stats, cfg, &objf, &count);
      j.kv("shared_objf_impr", (double)objf);
      j.kv("shared_count", (double)count);
      j.arr_open("shared_new_log_probs");
      for (int32_t t = 1; t <= num_tids; ++t)
        j.num(tm3.GetTransitionLogProb(t));
      j.arr_close();
    }
    j.obj_close();
  }

  // ----------------------------------------------------------- DiagGmm
  const int K = 4, D = 5, T = 6;
  DiagGmm *gmm = make_gmm(K, D, 3);
  FloatMatrix frames = make_frames(T, D, 5);
  dump_gmm(j, "diag_gmm", *gmm);
  j.obj_open("gmm_eval");
  j.mat("frames", frames);
  j.arr_open("frame_loglikes");
  for (int t = 0; t < T; ++t)
    j.num(gmm->LogLikelihood(frames.row(t).transpose()));
  j.arr_close();
  {
    FloatMatrix ll;
    gmm->LogLikelihoodsMatrix(frames, &ll);
    j.mat("comp_loglikes", ll);
  }
  j.arr_open("posteriors");
  for (int t = 0; t < T; ++t) {
    FloatVector post;
    gmm->ComponentPosteriors(frames.row(t).transpose(), &post);
    j.sep();
    j.os << "[";
    j.first_in_scope = true;
    for (int k = 0; k < K; ++k) j.num(post(k));
    j.os << "]";
    j.first_in_scope = false;
  }
  j.arr_close();
  j.arr_open("gselect2");
  for (int t = 0; t < T; ++t) {
    std::vector<int32_t> out;
    gmm->GaussianSelection(FloatVector(frames.row(t).transpose()), 2, &out);
    j.sep();
    j.os << "[" << out[0] << "," << out[1] << "]";
    j.first_in_scope = false;
  }
  j.arr_close();
  j.obj_close();

  // ------------------------------------------------ accumulate + MLE
  {
    AccumDiagGmm acc(*gmm, kGmmAll);
    double tot_like = 0;
    for (int t = 0; t < T; ++t)
      tot_like += acc.AccumulateFromDiag(*gmm, frames.row(t).transpose(), 1.0f);
    // starve component K-1: scale its stats down hard via direct access
    // is not in the API; instead accumulate an extra strong frame on
    // components 0..K-2 so relative occupancy patterns vary
    for (int rep = 0; rep < 40; ++rep) {
      for (int t = 0; t < T; ++t)
        acc.AccumulateForComponent(frames.row(t % T).transpose(), rep % (K - 1),
                                   0.8f);
    }
    j.obj_open("accum");
    j.kv("tot_like", tot_like);
    j.vec("occupancy", acc.occupancy(), K);
    j.mat("mean_acc", acc.mean_accumulator());
    j.mat("var_acc", acc.variance_accumulator());
    j.kv("ml_objective", (double)MlObjective(*gmm, acc));
    j.obj_close();

    j.arr_open("mle_variants");
    struct Var {
      const char *name;
      MleDiagGmmOptions opts;
    };
    std::vector<Var> vars;
    vars.push_back({"default", MleDiagGmmOptions()});
    {
      MleDiagGmmOptions o;
      o.remove_low_count_gaussians = false;
      vars.push_back({"no_removal", o});
    }
    {
      MleDiagGmmOptions o;
      o.variance_floor_vector = DoubleVector::Constant(D, 0.4);
      vars.push_back({"floor_vector", o});
    }
    {
      MleDiagGmmOptions o;
      o.min_gaussian_occupancy = 60.0;
      vars.push_back({"min_occ_60", o});
    }
    for (auto &v : vars) {
      DiagGmm g2(*gmm);
      float objf = 0, count = 0;
      int32_t fe = 0, fg = 0, rm = 0;
      MleDiagGmmUpdate(v.opts, acc, kGmmAll, &g2, &objf, &count, &fe, &fg,
                       &rm);
      j.obj_open();
      j.sep();
      j.os << "\"name\":\"" << v.name << "\"";
      j.first_in_scope = false;
      j.kv("objf_change", (double)objf);
      j.kv("count", (double)count);
      j.kv("floored_elements", (int64_t)fe);
      j.kv("floored_gauss", (int64_t)fg);
      j.kv("removed", (int64_t)rm);
      j.kv("min_occ", (double)v.opts.min_gaussian_occupancy);
      j.kv("remove_low_count", v.opts.remove_low_count_gaussians);
      j.kv("has_floor_vector", v.opts.variance_floor_vector.size() > 0);
      dump_gmm(j, "gmm", g2);
      j.obj_close();
    }
    j.arr_close();

    // MAP update
    {
      DiagGmm g2(*gmm);
      float objf = 0, count = 0;
      MapDiagGmmUpdate(MapDiagGmmOptions(), acc, kGmmAll, &g2, &objf, &count);
      j.obj_open("map_update");
      j.kv("objf_change", (double)objf);
      j.kv("count", (double)count);
      dump_gmm(j, "gmm", g2);
      j.obj_close();
    }
  }

  // ------------------------------------------------------ split targets
  {
    FloatVector occs(5);
    occs << 100.0f, 400.0f, 25.0f, 3.0f, 900.0f;
    std::vector<int32_t> targets;
    GetSplitTargets(occs, 40, 0.2f, 20.0f, &targets);
    j.obj_open("split_targets");
    j.vec("occs", occs, 5);
    j.kv("target", (int64_t)40);
    j.kv("power", 0.2);
    j.kv("min_count", 20.0);
    j.ivec("targets", targets);
    j.obj_close();
  }

  // ------------------------------------------------------------- merge
  {
    DiagGmm *g6 = make_gmm(6, 4, 9);
    dump_gmm(j, "merge_init", *g6);
    g6->Merge(3);
    dump_gmm(j, "merge_result", *g6);
    delete g6;
  }

  // ------------------------------------------------- AM accumulate+MLE
  {
    AmDiagGmm am;
    std::vector<int> ks = {2, 1, 3};
    for (int p = 0; p < 3; ++p) {
      DiagGmm *g = make_gmm(ks[p], D, 20 + p);
      am.AddPdf(*g);
      delete g;
    }
    j.obj_open("am_init");
    for (int p = 0; p < 3; ++p)
      dump_gmm(j, "pdf" + std::to_string(p), am.GetPdf(p));
    j.obj_close();
    AccumAmDiagGmm am_acc;
    am_acc.Init(am, kGmmAll);
    FloatMatrix x = make_frames(30, D, 13);
    for (int t = 0; t < 30; ++t)
      am_acc.AccumulateForGmm(am, x.row(t).transpose(), t % 3, 1.0f);
    float objf = 0, count = 0;
    MleDiagGmmOptions o;
    o.min_gaussian_occupancy = 3.0;  // keep all comps alive at T=30
    MleAmDiagGmmUpdate(o, am_acc, kGmmAll, &am, &objf, &count);
    j.obj_open("am_update");
    j.kv("objf_change", (double)objf);
    j.kv("count", (double)count);
    j.kv("tot_log_like", (double)am_acc.TotLogLike());
    j.mat("frames", x);
    for (int p = 0; p < 3; ++p)
      dump_gmm(j, "pdf" + std::to_string(p), am.GetPdf(p));
    j.obj_close();
  }

  j.obj_close();
  std::ofstream of(out_dir + "/ref_fixtures.json");
  of << j.os.str() << "\n";
  std::cout << "wrote " << out_dir << "/ref_fixtures.json and model files\n";
  delete tree;
  delete gmm;
  return 0;
}
