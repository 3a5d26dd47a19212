from khg_tpu.parallel.mesh import (
    make_data_mesh,
    sharded_em_step,
)
