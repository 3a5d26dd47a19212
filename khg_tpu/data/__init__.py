from khg_tpu.data.loader import BucketingLoader, LoaderConfig
