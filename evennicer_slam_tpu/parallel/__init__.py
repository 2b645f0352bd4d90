"""Multi-chip parallelism. Production API: dp ray sharding (sharding.py).
The grid-channel TP recipe is an example, import it explicitly from
``evennicer_slam_tpu.parallel.tp_example``."""

from evennicer_slam_tpu.parallel.sharding import (
    constrain_dp,
    pipeline_dp_sharding,
)

__all__ = ["constrain_dp", "pipeline_dp_sharding"]
