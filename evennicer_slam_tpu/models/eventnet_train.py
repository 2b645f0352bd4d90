"""EventNet training: fit the 2-head UNet to ESIM-style synthetic events.

The reference consumes a pretrained ``UNet_2heads`` checkpoint
(cfg['event']['pretrained_path']) whose training code is NOT in the
reference repo. This module provides that missing capability natively:
it trains the network on procedurally rendered intensity pairs from the
synthetic room (data/synthetic.py), supervising

- head 1 (event counts, 2 polarity channels) with an L2 loss against
  ``gain * (I2 - I1)`` split by sign — the same construction the synthetic
  ESIM ground truth uses, and
- head 2 (event existence) with binary cross-entropy.

Trained parameters are saved as an ``.npz`` pytree; the pipeline loads
either torch ``.pth`` (converted) or these ``.npz`` weights.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from evennicer_slam_tpu.data.synthetic import circular_trajectory, render_box_views
from evennicer_slam_tpu.models.eventnet import eventnet_forward, init_eventnet
from evennicer_slam_tpu.utils.optim import adam_init, adam_update


def make_pair_batch(
    rng: np.random.Generator,
    batch: int,
    hw: Tuple[int, int],
    bound: np.ndarray,
    gain: float = 20.0,
    step_scale: float = 0.03,
    full_hw: Tuple[int, int] = None,
):
    """Random intensity pairs + GT events from the synthetic room, matched to
    the SLAM-time input distribution: the previous image is a NEAREST
    down-scale of the full-res frame (the reference's transform,
    src/Tracker.py:136,148), the current image is point-sampled on
    the renderer's sparse low-res ray grid, and the event target is the
    nearest-downsampled full-res event image (exactly what the tracker's
    event loss consumes, slam/tracker.py)."""
    import jax.numpy as jnp

    from evennicer_slam_tpu.ops.resize import resize_nearest

    h, w = hw
    H, W = full_hw if full_hw else (4 * h, 4 * w)
    fx = fy = 0.8 * max(H, W)
    cx, cy = (W - 1) / 2, (H - 1) / 2
    # the renderer's low-res grid places rays on linspace(0, W-1, w): the
    # equivalent direct render uses scaled intrinsics
    sx = (W - 1) / (w - 1)
    sy = (H - 1) / (h - 1)
    imgs1, imgs2, events = [], [], []
    center = bound.mean(axis=1)
    traj = circular_trajectory(128, center, radius=0.25, step=step_scale,
                               jitter=0.01, jitter_seed=int(rng.integers(1 << 30)))
    for _ in range(batch):
        k = int(rng.integers(0, len(traj) - 1))
        c1_full, _ = render_box_views(traj[k], H, W, fx, fy, cx, cy, bound)
        c2_full, _ = render_box_views(traj[k + 1], H, W, fx, fy, cx, cy, bound)
        c2_lo, _ = render_box_views(
            traj[k + 1], h, w, fx / sx, fy / sy, cx / sx, cy / sy, bound
        )
        # NEAREST: deployment feeds the net a nearest-resized previous image
        # (reference src/Tracker.py:136,148), so train on the same statistics
        c1_lo = np.asarray(resize_nearest(jnp.asarray(c1_full), (h, w)))
        diff_full = (c2_full.mean(-1) - c1_full.mean(-1)) * gain
        ev_full = np.stack(
            [np.clip(-diff_full, 0, 255), np.clip(diff_full, 0, 255)], -1
        )
        ev_lo = np.asarray(resize_nearest(jnp.asarray(ev_full), (h, w)))
        imgs1.append(c1_lo)
        imgs2.append(c2_lo)
        events.append(ev_lo)
    return (
        np.stack(imgs1).astype(np.float32),
        np.stack(imgs2).astype(np.float32),
        np.stack(events).astype(np.float32),
    )


def _loss_fn(params, img1, img2, gt_event):
    x = jnp.concatenate([img1, img2], axis=-1)
    events, mask = eventnet_forward(params, x)
    l_ev = jnp.mean((events - gt_event) ** 2)
    exist = (jnp.sum(gt_event, axis=-1, keepdims=True) > 0).astype(jnp.float32)
    p1 = jnp.clip(mask[..., 1:2], 1e-6, 1 - 1e-6)
    l_mask = -jnp.mean(exist * jnp.log(p1) + (1 - exist) * jnp.log(1 - p1))
    return l_ev + 0.1 * l_mask, (l_ev, l_mask)


@jax.jit
def _train_step(params, opt_state, img1, img2, gt_event, lr):
    (loss, aux), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
        params, img1, img2, gt_event
    )
    params, opt_state = adam_update(grads, opt_state, params, lr)
    return params, opt_state, loss


def train_eventnet(
    steps: int = 400,
    batch: int = 4,
    hw: Tuple[int, int] = (64, 96),
    lr: float = 3e-4,
    seed: int = 0,
    bound: np.ndarray = None,
    verbose: bool = False,
) -> Dict:
    """Train from scratch on synthetic pairs; returns the params pytree."""
    if bound is None:
        bound = np.array([[-1.2, 1.2], [-1.0, 1.0], [-0.8, 0.8]], np.float32)
    rng = np.random.default_rng(seed)
    params = init_eventnet(jax.random.PRNGKey(seed))
    opt_state = adam_init(params)
    for step in range(steps):
        img1, img2, ev = make_pair_batch(rng, batch, hw, bound)
        params, opt_state, loss = _train_step(
            params, opt_state, jnp.asarray(img1), jnp.asarray(img2),
            jnp.asarray(ev), lr,
        )
        if verbose and step % 50 == 0:
            print(f"eventnet step {step}: loss {float(loss):.4f}", flush=True)
    return params


# ---------------------------------------------------------------------------
# map-domain training: close the inference-time domain gap
# ---------------------------------------------------------------------------
#
# At SLAM time the tracker feeds EventNet (prev GT color downscaled,
# CURRENT IMAGE RENDERED FROM THE LEARNED MAP) and compares against the
# integrated GT events since the last RGB-D frame (slam/tracker.py event
# branch; reference src/Tracker.py:129-157). A net trained purely on GT-GT
# intensity pairs sees map-render artifacts (early-map blur, color bias) as
# huge fake events, which biases the pose loss — the round-1 finding that
# made events LOSE to dead reckoning. The fix: build the training set from
# an actual learned map's renders.

def _perturb_pose(c2w: np.ndarray, rng, trans: float, rot: float):
    q = c2w.copy()
    q[:3, 3] += rng.normal(scale=trans, size=3)
    ax = rng.normal(size=3)
    ax /= np.linalg.norm(ax) + 1e-12
    ang = rng.normal(scale=rot)
    K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
    R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)
    q[:3, :3] = q[:3, :3] @ R
    return q


def map_domain_pairs(
    cfg: Dict,
    n_map_frames: int = 20,
    n_pairs: int = 64,
    max_offset: int = 5,
    seed: int = 0,
    perturb_trans: float = 0.0,
    perturb_rot: float = 0.0,
    gt_render_fn=None,
    event_gain: float = 20.0,
    verbose: bool = False,
):
    """(prev_lo, map_render_lo, gt_event_lo) triples from a real map.

    Runs the pipeline with ``gt_camera`` (mapping only) over the first
    ``n_map_frames`` of the configured dataset, then for random (k, k+j)
    windows (j <= max_offset, the ``rgbd_every_frame`` horizon) renders the
    CURRENT image from the learned map at the GT pose and pairs it with the
    nearest-downscaled GT previous image and the nearest-downscaled
    integral of the GT events over the window — exactly the tracker's
    inference-time input/target distribution.

    When ``gt_render_fn(c2w) -> (color, depth)`` is supplied with
    ``perturb_trans/rot`` > 0, half the triples render the current image at a
    PERTURBED pose with the ESIM-style target events between the previous
    frame and the GT view AT THAT POSE. Without these, off-pose renders are
    out-of-distribution and the net's predictions flatten the tracker's loss
    landscape exactly where pose gradients are needed."""
    from evennicer_slam_tpu.ops.resize import resize_nearest
    from evennicer_slam_tpu.slam.pipeline import EvenNICERSLAM

    import copy

    cfg = copy.deepcopy(cfg)
    if gt_render_fn is not None and (
        cfg["cam"].get("crop_edge", 0) or cfg.get("scale", 1.0) != 1.0
        or cfg["cam"].get("crop_size")
    ):
        raise ValueError(
            "perturbed-pose triples assume uncropped/unscaled frames at the "
            "cam resolution (gt_render_fn renders raw [H, W])"
        )
    cfg.setdefault("tracking", {})["gt_camera"] = True
    cfg["enable_vis"] = False
    slam = EvenNICERSLAM(cfg, nice=True)
    n = min(n_map_frames, slam.n_img)
    slam.run(end_frame=n, mesh=False, checkpoint=False)
    if verbose:
        print(f"[map_domain_pairs] mapped {n} frames", flush=True)

    lo_hw = slam.tracker.lo_hw
    sf = slam.t_cfg.scale_factor
    rng = np.random.default_rng(seed)
    frames = [slam.frame_reader[i] for i in range(n)]
    prevs, curs, evs = [], [], []
    for _ in range(n_pairs):
        j = int(rng.integers(1, max_offset + 1))
        k = int(rng.integers(0, n - j))
        prev = frames[k]
        cur = frames[k + j]
        prev_lo = resize_nearest(jnp.asarray(prev.color), lo_hw)
        perturbed = (
            gt_render_fn is not None
            and (perturb_trans > 0 or perturb_rot > 0)
            and rng.random() < 0.5
        )
        if perturbed:
            q = _perturb_pose(cur.c2w, rng, perturb_trans, perturb_rot)
            gt_color_q, gt_depth_q = gt_render_fn(q)
            pose, gt_depth = q, jnp.asarray(gt_depth_q)
            diff = (gt_color_q.mean(-1) - prev.color.mean(-1)) * event_gain
            ev = np.stack(
                [np.clip(-diff, 0, 255), np.clip(diff, 0, 255)], -1
            ).astype(np.float32)
        else:
            pose, gt_depth = cur.c2w, jnp.asarray(cur.depth)
            ev = np.zeros_like(frames[0].event)
            for i in range(k + 1, k + j + 1):
                ev = ev + frames[i].event
        _, _, cur_lo = slam.renderer.render_img_rescale(
            slam.decoders, slam.grids, jnp.asarray(pose[:3]), "color",
            gt_depth=gt_depth, scale_factor=sf,
        )
        ev_lo = resize_nearest(jnp.asarray(ev), lo_hw)
        prevs.append(np.asarray(prev_lo))
        curs.append(np.asarray(cur_lo))
        evs.append(np.asarray(ev_lo))
    return (
        np.stack(prevs).astype(np.float32),
        np.stack(curs).astype(np.float32),
        np.stack(evs).astype(np.float32),
    )


def train_eventnet_map_domain(
    cfg: Dict,
    steps: int = 300,
    batch: int = 4,
    lr: float = 3e-4,
    n_map_frames: int = 20,
    n_pairs: int = 96,
    seed: int = 0,
    init_params: Dict = None,
    perturb_trans: float = 0.0,
    perturb_rot: float = 0.0,
    gt_render_fn=None,
    verbose: bool = False,
) -> Dict:
    """Fine-tune (or train from scratch) on map-domain triples."""
    prevs, curs, evs = map_domain_pairs(
        cfg, n_map_frames=n_map_frames, n_pairs=n_pairs, seed=seed,
        perturb_trans=perturb_trans, perturb_rot=perturb_rot,
        gt_render_fn=gt_render_fn, verbose=verbose,
    )
    rng = np.random.default_rng(seed + 1)
    params = (
        init_params if init_params is not None
        else init_eventnet(jax.random.PRNGKey(seed))
    )
    opt_state = adam_init(params)
    for step in range(steps):
        idx = rng.integers(0, len(prevs), size=batch)
        params, opt_state, loss = _train_step(
            params, opt_state, jnp.asarray(prevs[idx]), jnp.asarray(curs[idx]),
            jnp.asarray(evs[idx]), lr,
        )
        if verbose and step % 50 == 0:
            print(f"eventnet map-domain step {step}: loss {float(loss):.4f}",
                  flush=True)
    return params


def save_eventnet_npz(params: Dict, path: str, half: bool = True) -> None:
    """``half`` stores conv/BN weights as float16 (halves the shipped-weights
    size; ~1e-3 relative quantization is far below the net's own error) while
    keeping BatchNorm running statistics in float32 (variances can underflow
    f16's 6e-5 normal floor)."""
    from evennicer_slam_tpu.utils.logger import _flatten_tree

    flat = {}
    _flatten_tree(params, "eventnet", flat)
    if half:
        # BN running stats flatten to "....bnN.m" / "....bnN.v" (see _bn's
        # param dict) — match those keys, not torch's "running_mean" naming
        def _is_bn_stat(k: str) -> bool:
            parts = k.rsplit(".", 2)
            return (len(parts) == 3 and parts[1].startswith("bn")
                    and parts[2] in ("m", "v"))

        flat = {
            k: (v if (_is_bn_stat(k) or v.dtype != np.float32)
                else v.astype(np.float16))
            for k, v in flat.items()
        }
    np.savez_compressed(path, **flat)


def load_eventnet_npz(path: str) -> Dict:
    """Loads f32 or f16-quantized checkpoints; parameters are always cast
    back to the template (f32) dtypes for inference."""
    from evennicer_slam_tpu.utils.logger import _unflatten_into

    data = dict(np.load(path))
    data = {k: v.astype(np.float32) if v.dtype == np.float16 else v
            for k, v in data.items()}
    template = init_eventnet(jax.random.PRNGKey(0))
    return _unflatten_into(template, "eventnet", data)
