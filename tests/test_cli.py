"""End-to-end CLI test: config file -> run.py main -> outputs -> eval_ate."""

import os
import sys

import numpy as np
import yaml

from evennicer_slam_tpu.data.synthetic import make_synthetic_replica


def test_run_cli_and_eval(tmp_path, monkeypatch):
    frag = make_synthetic_replica(str(tmp_path / "scene"), n_frames=3, H=36, W=48,
                                  fx=60.0, fy=60.0, traj_step=0.02)
    frag["dataset"] = "replica"
    cfg = dict(frag)
    cfg["inherit_from"] = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "nice_slam.yaml",
    )
    cfg.update({
        "coarse": False,
        "mapping": {
            **frag["mapping"],
            "iters_first": 8, "iters": 4, "every_frame": 2, "pixels": 80,
            "mapping_window_size": 3, "keyframe_every": 2,
            "mesh_freq": 10**9, "ckpt_freq": 10**9,
        },
        "tracking": {"iters": 2, "pixels": 40, "ignore_edge_W": 4,
                     "ignore_edge_H": 4},
        "meshing": {"eval_rec": False, "resolution": 20},
        "grid_len": {"coarse": 0.8, "middle": 0.4, "fine": 0.2, "color": 0.2,
                     "bound_divisible": 0.2},
    })
    cfg_path = str(tmp_path / "scene.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    out_dir = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", ["run.py", cfg_path, "--output", out_dir])
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import run as run_mod

    run_mod.main()

    # checkpoint written at the final frame
    ckpts = os.listdir(os.path.join(out_dir, "ckpts"))
    assert any(c.endswith(".npz") for c in ckpts)
    # final mesh written
    assert os.path.exists(os.path.join(out_dir, "mesh", "final_mesh.ply"))

    # eval_ate over the produced checkpoint
    from evennicer_slam_tpu.tools.eval_ate import evaluate_checkpoint
    from evennicer_slam_tpu.utils.logger import CheckpointLogger

    ckpt = CheckpointLogger.latest(os.path.join(out_dir, "ckpts"))
    res = evaluate_checkpoint(ckpt, scale=1.0,
                              plot=os.path.join(out_dir, "eval_ate_plot.png"))
    assert np.isfinite(res["absolute_translational_error.rmse"])
    assert os.path.exists(os.path.join(out_dir, "eval_ate_plot.png"))
