from khg_tpu.lang.lexicon import Lexicon, Lexiconp
from khg_tpu.lang.topo import generate_hmm_topo
