from khg_tpu.align.packed import PackedGraph, pack_graph, pack_graph_batch
from khg_tpu.align.viterbi import viterbi_align_batch
