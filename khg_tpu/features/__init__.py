from khg_tpu.features.fbank import FbankConfig, compute_fbank, compute_fbank_batch
