"""Scene representation: hierarchical feature grids + NICE / iMAP decoders,
plus the EventNet 2-head UNet."""

from evennicer_slam_tpu.models.grids import init_grids, grid_shapes
from evennicer_slam_tpu.models.decoders import (
    init_nice_decoders,
    init_imap_decoder,
    nice_forward,
    imap_forward,
    decoder_forward,
)
