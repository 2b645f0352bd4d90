"""EvenNICER-SLAM-TPU: a TPU-native (JAX/XLA/Pallas) dense neural-implicit
event-RGBD SLAM framework.

Re-implements the full capability surface of the EvenNICER-SLAM reference
(an event-camera extension of NICE-SLAM) with a TPU-first architecture:

- single-process, jit-compiled interleaved tracker/mapper schedule instead of
  the reference's 3-process shared-memory design
  (reference: src/EvenNICER_SLAM.py:313-332),
- functional state threading (pytrees) instead of in-place shared tensors,
- fixed-shape masking instead of dynamic boolean filtering,
- `jax.sharding.Mesh` + NamedSharding for multi-chip scale-out.

Package layout:
    core/      pure ray/pose/sampling/compositing math      (reference src/common.py)
    models/    feature grids + NICE/iMAP decoders + EventNet (src/conv_onet/, event_net/)
    ops/       TPU kernels: grid sampling, blur, resize
    render/    volume renderer                               (src/utils/Renderer.py)
    slam/      tracker, mapper, keyframes, pipeline          (src/Tracker.py, src/Mapper.py)
    parallel/  device mesh + sharding strategy
    data/      dataset readers (9 families)                  (src/utils/datasets.py)
    mesh/      marching cubes, mesher, PLY, hull             (src/utils/Mesher.py)
    utils/     checkpointing (with resume), visualizer, telemetry
    tools/     eval_ate, eval_recon, cull_mesh, viz
"""

__version__ = "0.1.0"
