"""khg_tpu — a TPU-native HMM-GMM acoustic-modeling framework.

A from-scratch re-design (NOT a port) of the capabilities of
csukuangfj/kaldi-hmm-gmm for TPU hardware:

- Host (Python) owns symbolic/irregular work: lexicon, HMM topologies,
  decision trees, FST graph compilation, packing graphs into dense tensors.
- Device (JAX/XLA/Pallas) owns all per-frame numeric work: fbank features,
  GMM log-likelihoods as one fused batched GEMM, Viterbi alignment /
  forward-backward as dense ``lax.scan`` DPs over packed training graphs,
  sufficient-statistics accumulation via segment-sums, reduced across a
  device mesh with ``psum``.

Layout:
  utils/     math helpers, frozen config dataclasses
  lang/      lexicon, phone/word symbol tables, L-FST, topology text
  fstlib/    weighted FST library (compose, determinize-star, minimize, ...)
  model/     HmmTopology, EventMap trees, ContextDependency, TransitionModel
  gmm/       DiagGmm / AmDiagGmm, packed device model tensors
  graph/     H transducer, self-loop expansion, training-graph compiler
  align/     packed graphs + dense Viterbi / forward-backward, equal-align
  stats/     sufficient-statistics accumulation (device + host views)
  est/       MLE / MAP M-steps, mixture split/merge, silence boosting
  features/  fbank feature extraction (JAX / Pallas)
  decode/    decoding-graph build, best-path decoding, WER scoring
  parallel/  device-mesh sharded E-step (data parallel + psum)
  recipes/   end-to-end training recipes (yesno-style, CTC topology)
"""

__version__ = "0.1.0"

# Flat convenience namespace (the snake_case API surface mirrors the
# reference's kaldi_hmm_gmm/__init__.py exports where a counterpart
# exists; device-first additions live alongside).
from khg_tpu.model.topology import HmmTopology
from khg_tpu.model.context_dep import (
    ContextDependency,
    monophone_context_dependency,
    monophone_context_dependency_shared,
)
from khg_tpu.model.transition_model import (
    MleTransitionUpdateConfig,
    TransitionModel,
    get_pdfs_for_phones,
)
from khg_tpu.gmm.diag_gmm import DiagGmm
from khg_tpu.gmm.am_gmm import AmDiagGmm, get_split_targets
from khg_tpu.est.flags import (
    GMM_ALL,
    GMM_MEANS,
    GMM_TRANSITIONS,
    GMM_VARIANCES,
    GMM_WEIGHTS,
    gmm_flags_to_str,
    str_to_gmm_flags,
)
from khg_tpu.est.mle import (
    MapDiagGmmOptions,
    MleDiagGmmOptions,
    gmm_boost_silence,
    map_am_diag_gmm_update,
    map_diag_gmm_update,
    ml_objective,
    mle_am_diag_gmm_update,
    mle_diag_gmm_update,
)
from khg_tpu.stats.accum import AccumAmDiagGmm, AccumDiagGmm
from khg_tpu.graph.compiler import (
    TrainingGraphCompiler,
    TrainingGraphCompilerOptions,
)
from khg_tpu.graph.h_builder import (
    add_self_loops,
    add_transition_probs,
    get_h_transducer,
    modify_graph_for_careful_alignment,
)
from khg_tpu.decode.decoder import FasterDecoder, FasterDecoderOptions
from khg_tpu.decode.lattice import (
    LatticeFasterDecoder,
    LatticeFasterDecoderConfig,
    LatticeSimpleDecoder,
    decode_utterance_lattice_faster,
)
from khg_tpu.decode.score_stream import (
    decode_scores_streamed,
    stream_scores,
)
from khg_tpu.decode.decodable import DecodableAmDiagGmmScaled, DecodableCtc
from khg_tpu.model.kaldi_binary import (
    load_transition_model,
    load_tree,
    save_transition_model,
    save_tree,
)
from khg_tpu.features import (
    FbankConfig,
    compute_fbank,
    compute_fbank_batch,
    compute_fbank_pallas,
)
from khg_tpu.data import read_wav, wav_info, write_wav
