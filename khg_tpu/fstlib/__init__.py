from khg_tpu.fstlib.fst import (
    Arc,
    VectorFst,
    NO_STATE,
    compose,
    connect,
    determinize_star,
    equal_align,
    make_linear_acceptor,
    minimize_encoded,
    relabel_input,
    remove_input_symbols,
    shortest_path,
)
