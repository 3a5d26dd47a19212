from khg_tpu.data.loader import BucketingLoader, LoaderConfig
from khg_tpu.data.wav import WavInfo, read_wav, wav_info, write_wav
