// EM-loop trajectory golden: runs the REFERENCE's full monophone training
// loop (/root/reference/egs/yesno/train.py:116-222 — equal-align init ->
// accumulate -> update -> boost-silence -> realign on realign_iters ->
// mix-up) using the reference's own compiled components
// (/root/reference/kaldi-hmm-gmm/csrc, compiled in place):
//   TransitionModel / AmDiagGmm / AccumAmDiagGmm (accumulation semantics
//   of scripts/gmm_acc_stats_ali.py), MleUpdate + MleAmDiagGmmUpdate +
//   SplitByCount (scripts/gmm_est.py), GetPdfsForPhones + weight boost
//   (scripts/gmm_boost_silence.py), DecodableAmDiagGmmScaled +
//   FasterDecoder (scripts/gmm_align_compiled.py, decoder-wrappers.cc:16).
//
// Inputs come from make_em_problem.py: synthetic features, khg_tpu's
// compiled training graphs (pinned against this decoder by align_golden),
// the flat-start model, and khg equal_align initial alignments (the
// reference's kaldifst.equal_align is unseedable; both loops start from
// the same init by construction).  perturb_factor = 0 throughout —
// DiagGmm::Split's RNG (csrc/eigen.cc:34-46) cannot be seeded.
//
// The driver-side glue reimplemented here (and ONLY this) mirrors:
//   GetScaledTransitionLogProb + AddTransitionProbs arc-weight update
//     (hmm-utils.cc:442-493; the rest of hmm-utils needs kaldifst),
//   AlignUtteranceWrapper's decode -> best-path flow
//     (decoder-wrappers.cc:16-108; retry never fires at the exact beam).
//
// Output: tests/golden/em_loop_golden.json — per-pass avg loglike/frame,
// num_gauss after each est, final alignments, final model parameters.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <fstream>
#include <iostream>
#include <memory>
#include <set>
#include <string>
#include <vector>

#include "kaldi-hmm-gmm/csrc/am-diag-gmm.h"
#include "kaldi-hmm-gmm/csrc/context-dep.h"
#include "kaldi-hmm-gmm/csrc/decodable-am-diag-gmm.h"
#include "kaldi-hmm-gmm/csrc/diag-gmm.h"
#include "kaldi-hmm-gmm/csrc/faster-decoder.h"
#include "kaldi-hmm-gmm/csrc/hmm-topology.h"
#include "kaldi-hmm-gmm/csrc/mle-am-diag-gmm.h"
#include "kaldi-hmm-gmm/csrc/mle-diag-gmm.h"
#include "kaldi-hmm-gmm/csrc/model-common.h"
#include "kaldi-hmm-gmm/csrc/transition-model.h"

using namespace khg;  // NOLINT

namespace {

// Mirrors GetScaledTransitionLogProb (hmm-utils.cc:442-464) on the
// reference TransitionModel's own accessors.
float ScaledTransLogProb(const TransitionModel &tm, int32_t tid,
                         float transition_scale, float self_loop_scale) {
  if (transition_scale == self_loop_scale)
    return tm.GetTransitionLogProb(tid) * transition_scale;
  if (tm.IsSelfLoop(tid))
    return self_loop_scale * tm.GetTransitionLogProb(tid);
  int32_t ts = tm.TransitionIdToTransitionState(tid);
  return self_loop_scale * tm.GetNonSelfLoopLogProb(ts) +
         transition_scale * tm.GetTransitionLogProbIgnoringSelfLoops(tid);
}

// Mirrors AddTransitionProbs' arc-weight update (hmm-utils.cc:465-493):
// every tid-labeled arc gets Times(w, -scaled_log_prob).
fst::VectorFst<fst::StdArc> WithTransitionProbs(
    const fst::VectorFst<fst::StdArc> &graph, const TransitionModel &tm,
    float transition_scale, float self_loop_scale) {
  int32_t num_tids = tm.NumTransitionIds();
  fst::VectorFst<fst::StdArc> out;
  for (int s = 0; s < graph.NumStates(); ++s) out.AddState();
  out.SetStart(graph.Start());
  for (int s = 0; s < graph.NumStates(); ++s) {
    out.SetFinal(s, graph.Final(s));
    for (const fst::StdArc &arc : graph.ArcsOf(s)) {
      fst::StdArc a = arc;
      if (a.ilabel >= 1 && a.ilabel <= num_tids) {
        float slp =
            ScaledTransLogProb(tm, a.ilabel, transition_scale, self_loop_scale);
        a.weight = fst::TropicalWeight(a.weight.Value() - slp);
      }
      out.AddArc(s, a);
    }
  }
  return out;
}

// scripts/gmm_boost_silence.py: copy, multiply silence-pdf weights by
// boost, recompute gconsts.
AmDiagGmm *BoostSilence(const AmDiagGmm &am, const TransitionModel &tm,
                        const std::vector<int32_t> &silence_phones,
                        float boost) {
  std::vector<int32_t> pdfs;
  GetPdfsForPhones(tm, silence_phones, &pdfs);
  AmDiagGmm *out = new AmDiagGmm();
  out->CopyFromAmDiagGmm(am);
  for (int32_t pdf : pdfs) {
    DiagGmm &g = out->GetPdf(pdf);
    FloatVector w = g.weights();
    w *= boost;
    g.SetWeights(w);
    g.ComputeGconsts();
  }
  return out;
}

struct Utt {
  FloatMatrix feats;                    // (T, D)
  fst::VectorFst<fst::StdArc> graph;    // compile-time, no transition probs
  std::vector<int32_t> ali;             // current alignment (tids)
};

// scripts/gmm_acc_stats_ali.py: per frame tid -> transition accumulate +
// AccumulateForGmm on the tid's pdf.  Returns the total log-like.
double AccStatsAli(const AmDiagGmm &am, const TransitionModel &tm,
                   const Utt &u, AccumAmDiagGmm *gmm_accs,
                   DoubleVector *trans_accs) {
  double log_like = 0.0;
  for (size_t i = 0; i < u.ali.size(); ++i) {
    int32_t tid = u.ali[i];
    int32_t pdf = tm.TransitionIdToPdf(tid);
    tm.Accumulate(1.0f, tid, trans_accs);
    log_like += gmm_accs->AccumulateForGmm(
        am, u.feats.row(static_cast<int>(i)).transpose(), pdf, 1.0f);
  }
  return log_like;
}

// Deterministic split perturbation, shared with khg_tpu
// (recipes/yesno.py det_split_noise): DiagGmm::Split's own perturbation
// draws from an unseedable std::random_device (csrc/eigen.cc:34-46), so
// run-level parity with perturbation requires BOTH loops to apply the
// same post-split noise.  splitmix64 of (pass, pdf, comp, dim) -> a
// uniform in [-0.5, 0.5); new components (indices >= the pre-split
// count) get mean += eps * sqrt(var) * u.  Without this, perturb=0
// split twins sit on a symmetry ridge and 80-pass trajectories diverge
// on tie-breaking rounding noise alone.
uint64_t SplitMix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ULL;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}

double DetSplitNoise(int pass, int p, int k, int d) {
  uint64_t key = (static_cast<uint64_t>(pass + 1) << 40) ^
                 (static_cast<uint64_t>(p) << 24) ^
                 (static_cast<uint64_t>(k) << 12) ^ static_cast<uint64_t>(d);
  return static_cast<double>(SplitMix64(key) >> 11) / 9007199254740992.0 -
         0.5;
}

void ApplyDetSplitPerturb(AmDiagGmm *am, const std::vector<int32_t> &old_n,
                          float eps, int pass) {
  if (eps == 0.0f) return;
  for (int32_t p = 0; p < am->NumPdfs(); ++p) {
    DiagGmm &g = am->GetPdf(p);
    bool changed = false;
    for (int32_t k = old_n[p]; k < g.NumGauss(); ++k) {
      FloatVector mean = g.GetComponentMean(k);
      FloatVector var = g.GetComponentVariance(k);
      for (int32_t d = 0; d < mean.size(); ++d) {
        mean(d) = static_cast<float>(
            static_cast<double>(mean(d)) +
            static_cast<double>(eps) *
                std::sqrt(static_cast<double>(var(d))) *
                DetSplitNoise(pass, p, k, d));
      }
      g.SetComponentMean(k, mean);
      changed = true;
    }
    if (changed) g.ComputeGconsts();
  }
}

std::vector<int32_t> PdfGaussCounts(const AmDiagGmm &am) {
  std::vector<int32_t> n(am.NumPdfs());
  for (int32_t p = 0; p < am.NumPdfs(); ++p)
    n[p] = am.GetPdf(p).NumGauss();
  return n;
}

// scripts/gmm_est.py with update_flags="mvwt", mixdown=0, perturb=0.
void GmmEst(AmDiagGmm *am, AccumAmDiagGmm &gmm_accs, TransitionModel *tm,
            const DoubleVector &trans_accs, const MleDiagGmmOptions &gmm_opts,
            int32_t mixup, float power, float min_count) {
  float objf = 0, count = 0;
  tm->MleUpdate(trans_accs, MleTransitionUpdateConfig(), &objf, &count);
  MleAmDiagGmmUpdate(gmm_opts, gmm_accs, kGmmAll, am, &objf, &count);
  if (mixup != 0) {
    FloatVector occs(gmm_accs.NumAccs());
    for (int32_t i = 0; i < gmm_accs.NumAccs(); ++i)
      occs(i) = static_cast<float>(gmm_accs.GetAcc(i).occupancy().sum());
    am->SplitByCount(occs, mixup, /*perturb_factor=*/0.0f, power, min_count);
  }
}

// decoder-wrappers.cc:16-108 decode -> best-path -> tids (retry elided:
// the problem file's beam makes search exact; retry_beam=0 disables it,
// matching AlignUtteranceWrapper's `retry_beam != 0` gate).
bool AlignOne(const fst::VectorFst<fst::StdArc> &graph,
              DecodableInterface *decodable, float beam,
              std::vector<int32_t> *tids) {
  FasterDecoderOptions opts;
  opts.beam = beam;
  FasterDecoder decoder(graph, opts);
  decoder.Decode(decodable);
  if (!decoder.ReachedFinal()) return false;
  fst::VectorFst<fst::LatticeArc> best;
  if (!decoder.GetBestPath(&best)) return false;
  tids->clear();
  int s = best.Start();
  while (true) {
    const auto &arcs = best.ArcsOf(s);
    if (arcs.empty()) break;
    const fst::LatticeArc &arc = arcs[0];
    if (arc.ilabel != 0) tids->push_back(arc.ilabel);
    s = arc.nextstate;
  }
  return true;
}

void PrintJsonFloatArr(std::FILE *f, const char *key,
                       const std::vector<double> &v, bool trailing_comma) {
  std::fprintf(f, "\"%s\": [", key);
  for (size_t i = 0; i < v.size(); ++i)
    std::fprintf(f, "%s%.17g", i ? ", " : "", v[i]);
  std::fprintf(f, "]%s\n", trailing_comma ? "," : "");
}

void PrintJsonIntArr(std::FILE *f, const char *key,
                     const std::vector<int32_t> &v, bool trailing_comma) {
  std::fprintf(f, "\"%s\": [", key);
  for (size_t i = 0; i < v.size(); ++i)
    std::fprintf(f, "%s%d", i ? ", " : "", v[i]);
  std::fprintf(f, "]%s\n", trailing_comma ? "," : "");
}

}  // namespace

int main(int argc, char **argv) {
  if (argc != 4) {
    std::cerr << "usage: em_loop_runner <problem.txt> <topo.txt> <out.json>\n";
    return 1;
  }
  std::ifstream in(argv[1]);

  int D, num_utts, sil_phone;
  in >> D >> num_utts >> sil_phone;
  float acoustic_scale, transition_scale, self_loop_scale, boost, beam,
      retry_beam;
  in >> acoustic_scale >> transition_scale >> self_loop_scale >> boost >>
      beam >> retry_beam;
  float det_split_perturb = 0.0f;
  in >> det_split_perturb;
  int num_iters, total_gauss, max_iter_inc, num_gauss;
  in >> num_iters >> total_gauss >> max_iter_inc >> num_gauss;
  int nri;
  in >> nri;
  std::set<int> realign_iters;
  for (int i = 0; i < nri; ++i) {
    int v;
    in >> v;
    realign_iters.insert(v);
  }
  DoubleVector init_means(D), init_vars(D);
  for (int d = 0; d < D; ++d) in >> init_means(d);
  for (int d = 0; d < D; ++d) in >> init_vars(d);

  std::vector<Utt> utts(num_utts);
  for (auto &u : utts) {
    int T;
    in >> T;
    u.feats = FloatMatrix(T, D);
    for (int t = 0; t < T; ++t)
      for (int d = 0; d < D; ++d) in >> u.feats(t, d);
    int num_states, start, num_arcs;
    in >> num_states >> start >> num_arcs;
    for (int s = 0; s < num_states; ++s) u.graph.AddState();
    u.graph.SetStart(start);
    for (int a = 0; a < num_arcs; ++a) {
      int src, il, ol, dst;
      float w;
      in >> src >> il >> ol >> w >> dst;
      u.graph.AddArc(src, fst::StdArc(il, ol, fst::TropicalWeight(w), dst));
    }
    int num_finals;
    in >> num_finals;
    for (int ff = 0; ff < num_finals; ++ff) {
      int s;
      float w;
      in >> s >> w;
      u.graph.SetFinal(s, fst::TropicalWeight(w));
    }
    u.ali.resize(T);
    for (int t = 0; t < T; ++t) in >> u.ali[t];
  }

  // ---- model init (gmm_init_mono semantics from the exported stats)
  HmmTopology topo;
  {
    std::ifstream is(argv[2]);
    topo.Read(is, false);
  }
  std::vector<int32_t> phone2num_pdf_classes;
  topo.GetPhoneToNumPdfClasses(&phone2num_pdf_classes);
  std::unique_ptr<ContextDependency> tree(
      MonophoneContextDependency(topo.GetPhones(), phone2num_pdf_classes));
  TransitionModel tm(*tree, topo);

  AmDiagGmm am;
  {
    DiagGmm proto(1, D);
    FloatVector w(1);
    w(0) = 1.0f;
    proto.SetWeights(w);
    FloatMatrix means(1, D), invvars(1, D);
    for (int d = 0; d < D; ++d) {
      means(0, d) = static_cast<float>(init_means(d));
      invvars(0, d) = static_cast<float>(1.0 / init_vars(d));
    }
    proto.SetInvVarsAndMeans(invvars, means);
    proto.ComputeGconsts();
    for (int p = 0; p < tree->NumPdfs(); ++p) am.AddPdf(proto);
  }
  int inc_gauss = (total_gauss - num_gauss) / max_iter_inc;

  std::vector<double> pass_avg_loglike, pass_frames;
  std::vector<int32_t> num_gauss_after_est;

  // ---- pass 0: accumulate from the equal-align init, then first est
  // (train.py:110-150: min_gaussian_occupancy=3 for the first update)
  {
    AccumAmDiagGmm gmm_accs;
    gmm_accs.Init(am, kGmmAll);
    DoubleVector trans_accs;
    tm.InitStats(&trans_accs);
    double tot = 0.0;
    int64_t frames = 0;
    for (const Utt &u : utts) {
      tot += AccStatsAli(am, tm, u, &gmm_accs, &trans_accs);
      frames += static_cast<int64_t>(u.ali.size());
    }
    pass_avg_loglike.push_back(tot / frames);
    pass_frames.push_back(static_cast<double>(frames));
    MleDiagGmmOptions opts0;
    opts0.min_gaussian_occupancy = 3.0;
    std::vector<int32_t> old_n = PdfGaussCounts(am);
    GmmEst(&am, gmm_accs, &tm, trans_accs, opts0, num_gauss, 0.2f, 20.0f);
    ApplyDetSplitPerturb(&am, old_n, det_split_perturb, /*pass=*/0);
    num_gauss_after_est.push_back(am.NumGauss());
  }

  // ---- the EM loop (train.py:152-222)
  for (int it = 0; it < num_iters; ++it) {
    if (realign_iters.count(it)) {
      std::unique_ptr<AmDiagGmm> boosted(
          BoostSilence(am, tm, {sil_phone}, boost));
      for (Utt &u : utts) {
        fst::VectorFst<fst::StdArc> g =
            WithTransitionProbs(u.graph, tm, transition_scale,
                                self_loop_scale);
        DecodableAmDiagGmmScaled decodable(*boosted, tm, u.feats,
                                           acoustic_scale);
        std::vector<int32_t> tids;
        if (AlignOne(g, &decodable, beam, &tids)) {
          u.ali = tids;
        } else {
          std::fprintf(stderr, "realign failed at iter %d\n", it);
        }
      }
    }
    AccumAmDiagGmm gmm_accs;
    gmm_accs.Init(am, kGmmAll);
    DoubleVector trans_accs;
    tm.InitStats(&trans_accs);
    double tot = 0.0;
    int64_t frames = 0;
    for (const Utt &u : utts) {
      tot += AccStatsAli(am, tm, u, &gmm_accs, &trans_accs);
      frames += static_cast<int64_t>(u.ali.size());
    }
    pass_avg_loglike.push_back(tot / frames);
    pass_frames.push_back(static_cast<double>(frames));
    std::vector<int32_t> old_n = PdfGaussCounts(am);
    GmmEst(&am, gmm_accs, &tm, trans_accs, MleDiagGmmOptions(), num_gauss,
           0.2f, 20.0f);
    ApplyDetSplitPerturb(&am, old_n, det_split_perturb, /*pass=*/it + 1);
    num_gauss_after_est.push_back(am.NumGauss());
    if (it < max_iter_inc) num_gauss += inc_gauss;
  }

  // ------------------------------------------------------------ output
  std::FILE *f = std::fopen(argv[3], "w");
  std::fprintf(f, "{\n");
  PrintJsonFloatArr(f, "pass_avg_loglike", pass_avg_loglike, true);
  PrintJsonFloatArr(f, "pass_frames", pass_frames, true);
  PrintJsonIntArr(f, "num_gauss_after_est", num_gauss_after_est, true);
  std::fprintf(f, "\"final_alignments\": [\n");
  for (size_t i = 0; i < utts.size(); ++i) {
    std::fprintf(f, "  [");
    for (size_t t = 0; t < utts[i].ali.size(); ++t)
      std::fprintf(f, "%s%d", t ? ", " : "", utts[i].ali[t]);
    std::fprintf(f, "]%s\n", i + 1 < utts.size() ? "," : "");
  }
  std::fprintf(f, "],\n");
  {
    std::vector<double> lp(tm.NumTransitionIds());
    for (int32_t t = 1; t <= tm.NumTransitionIds(); ++t)
      lp[t - 1] = tm.GetTransitionLogProb(t);
    PrintJsonFloatArr(f, "final_trans_log_probs", lp, true);
  }
  std::fprintf(f, "\"final_pdfs\": [\n");
  for (int p = 0; p < am.NumPdfs(); ++p) {
    const DiagGmm &g = am.GetPdf(p);
    FloatMatrix means = g.GetMeans(), vars = g.GetVars();
    std::fprintf(f, "  {\"weights\": [");
    for (int k = 0; k < g.NumGauss(); ++k)
      std::fprintf(f, "%s%.17g", k ? ", " : "",
                   static_cast<double>(g.weights()(k)));
    std::fprintf(f, "], \"means\": [");
    for (int k = 0; k < g.NumGauss(); ++k) {
      std::fprintf(f, "%s[", k ? ", " : "");
      for (int d = 0; d < D; ++d)
        std::fprintf(f, "%s%.17g", d ? ", " : "",
                     static_cast<double>(means(k, d)));
      std::fprintf(f, "]");
    }
    std::fprintf(f, "], \"vars\": [");
    for (int k = 0; k < g.NumGauss(); ++k) {
      std::fprintf(f, "%s[", k ? ", " : "");
      for (int d = 0; d < D; ++d)
        std::fprintf(f, "%s%.17g", d ? ", " : "",
                     static_cast<double>(vars(k, d)));
      std::fprintf(f, "]");
    }
    std::fprintf(f, "]}%s\n", p + 1 < am.NumPdfs() ? "," : "");
  }
  std::fprintf(f, "],\n");
  std::fprintf(f, "\"final_num_gauss\": %d\n", am.NumGauss());
  std::fprintf(f, "}\n");
  std::fclose(f);
  std::printf("wrote %s: %d passes, final num_gauss %d\n", argv[3],
              static_cast<int>(pass_avg_loglike.size()), am.NumGauss());
  return 0;
}
