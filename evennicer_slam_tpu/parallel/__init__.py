from evennicer_slam_tpu.parallel.sharding import (
    make_mesh,
    shard_params,
    multichip_train_step,
)
