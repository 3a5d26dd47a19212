from khg_tpu.stats.accum import AccumAmDiagGmm, AccumDiagGmm, accumulate_am_stats
