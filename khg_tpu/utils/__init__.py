from khg_tpu.utils.math_utils import log_add, approx_equal, M_LOG_2PI
