from khg_tpu.decode.arpa import arpa_to_fst
from khg_tpu.decode.decoder import FasterDecoder, FasterDecoderOptions
from khg_tpu.decode.graph import build_hclg
from khg_tpu.decode.wer import levenshtein_align, write_error_stats
