from khg_tpu.graph.compiler import TrainingGraphCompiler, TrainingGraphCompilerOptions
from khg_tpu.graph.h_builder import (
    add_self_loops,
    add_transition_probs,
    get_h_transducer,
)
