from khg_tpu.features.fbank import FbankConfig, compute_fbank, compute_fbank_batch
from khg_tpu.features.pallas_fbank import compute_fbank_pallas
from khg_tpu.features.resample import (
    perturb_speed,
    resample_waveform,
    speed_perturb_corpus,
)
