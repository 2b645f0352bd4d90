"""Mapper: joint scene + (optionally) pose optimization, fully jit-compiled.

TPU-native rebuild of reference src/Mapper.py:21-879. One compiled program
runs an entire mapping call: the staged middle -> fine -> color schedule is
three sequential on-device loops with *dynamic* iteration counts and
*dynamic* per-group learning rates, so first-frame (1500 iters, lr x5),
steady-state (60 iters), and color-refinement calls all reuse the same
executable.

Reference semantics preserved:
- keyframe window = (mapping_window_size - 2 selected) + last keyframe +
  current frame; ``pixels // len(window)`` rays per window frame
  (src/Mapper.py:287-317),
- staged LR schedule via param groups (decoders, coarse/middle/fine/color
  grids) from cfg['mapping']['stage'] (src/Mapper.py:460-485); Adam moments
  persist across stages within a call and reset between calls,
- frustum feature selection restricts grid updates to visible nodes; realized
  here as a gradient mask instead of gather/scatter (src/Mapper.py:448-458),
- BA: window poses optimized (oldest fixed) with BA_cam_lr only in the color
  stage (src/Mapper.py:374-391,481-485),
- loss = masked depth L1 + w_color * color L1 (color stage only) +
  5e-4 * |sigma| regulation for iMAP (src/Mapper.py:556-570),
- the event-supervision path (second optimizer that excludes the color grid,
  blur kernel [3], balancer pixels/(w*h)/100) is implemented and exposed as
  ``use_events`` — the reference has the code but hardwires it off
  (src/Mapper.py:811-823).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from evennicer_slam_tpu.core.bounds import inside_bound_mask
from evennicer_slam_tpu.core.quaternion import (
    pose_matrix_from_tensor,
    pose_matrix_from_tensor_np,
    tensor_from_pose_matrix,
    tensor_from_pose_matrix_np,
)
from evennicer_slam_tpu.core.rays import get_rays_rescale, rays_from_uv
from evennicer_slam_tpu.models.eventnet import inference_event
from evennicer_slam_tpu.ops.gaussian_blur import gaussian_blur
from evennicer_slam_tpu.parallel.sharding import constrain_dp
from evennicer_slam_tpu.ops.resize import resize_bilinear, resize_nearest
from evennicer_slam_tpu.render.renderer import (
    RenderSettings,
    regulation_sigma,
    render_rays,
)
from evennicer_slam_tpu.slam.camera import Camera
from evennicer_slam_tpu.slam.keyframes import (
    KeyframeStore,
    frustum_feature_mask,
    frustum_feature_masks_dev,
    keyframe_selection_overlap,
    random_select,
    scatter_window_poses_dev,
    select_assemble_window_dev,
)
from evennicer_slam_tpu.utils.optim import AdamState, adam_init, adam_update


class MapperConfig(NamedTuple):
    pixels: int = 1000
    iters: int = 60
    iters_first: int = 1500
    lr_first_factor: float = 5.0
    lr_factor: float = 1.0
    middle_iter_ratio: float = 0.4
    fine_iter_ratio: float = 0.6
    every_frame: int = 5
    window_size: int = 5
    keyframe_every: int = 50
    keyframe_selection: str = "overlap"
    frustum_feature_selection: bool = True
    BA: bool = False
    BA_cam_lr: float = 0.001
    fix_fine: bool = True
    fix_color: bool = False
    w_color_loss: float = 0.2
    color_refine: bool = True
    save_selected_keyframes_info: bool = False
    use_events: bool = False
    event_scale_factor: float = 0.15
    event_predictor: str = "unet"
    esim_gain: float = 20.0
    keyframe_catchup: bool = False
    imap_decoders_lr: float = 0.0002
    prev_resize: str = "nearest"  # see TrackerConfig.prev_resize
    stage_lrs: Tuple[Tuple[str, Tuple[float, float, float, float, float]], ...] = ()

    @staticmethod
    def from_cfg(cfg: Dict[str, Any], use_events: bool = False) -> "MapperConfig":
        m = cfg["mapping"]
        stage_lrs = tuple(
            (
                s,
                (
                    m["stage"][s]["decoders_lr"],
                    m["stage"][s]["coarse_lr"],
                    m["stage"][s]["middle_lr"],
                    m["stage"][s]["fine_lr"],
                    m["stage"][s]["color_lr"],
                ),
            )
            for s in ("coarse", "middle", "fine", "color")
        ) if "stage" in m else ()
        concurrent = (
            cfg.get("sync_method", "strict") in ("loose", "free")
            and int(cfg.get("parallel", {}).get("map_devices", 0) or 0) > 0
        )
        if concurrent and not m.get("keyframe_catchup", False):
            import warnings

            warnings.warn(
                "concurrent loose/free mapping maps whatever frame tracking"
                " is on when the previous call completes, so mapped indices"
                " are timing-dependent and `idx % keyframe_every == 0` may"
                " NEVER fire — the keyframe registry starves and meshing"
                " discards unanchored regions. (The reference has the same"
                " exposure in its loose mode, src/Mapper.py:752-754 +"
                " :830-835.) Set mapping.keyframe_catchup: true to add a"
                " keyframe whenever a full keyframe_every window passes"
                " without one.",
                stacklevel=2,
            )
        if m["keyframe_every"] % m["every_frame"] != 0:
            import math
            import warnings

            eff = math.lcm(m["keyframe_every"], m["every_frame"])
            warnings.warn(
                f"mapping.keyframe_every={m['keyframe_every']} is not a"
                f" multiple of mapping.every_frame={m['every_frame']}:"
                " keyframes are only added at mapped frames (reference"
                " src/Mapper.py:830-835 checks idx % keyframe_every inside"
                f" the mapping call), so the EFFECTIVE cadence is"
                f" lcm={eff} frames. Mesh extraction bounds and keyframe"
                " windows are built from keyframes only — a sparse registry"
                " silently discards mapped regions at meshing time.",
                stacklevel=2,
            )
        return MapperConfig(
            pixels=m["pixels"],
            iters=m["iters"],
            iters_first=m["iters_first"],
            lr_first_factor=m["lr_first_factor"],
            lr_factor=m["lr_factor"],
            middle_iter_ratio=m["middle_iter_ratio"],
            fine_iter_ratio=m["fine_iter_ratio"],
            every_frame=m["every_frame"],
            window_size=m["mapping_window_size"],
            keyframe_every=m["keyframe_every"],
            keyframe_selection=m["keyframe_selection_method"],
            frustum_feature_selection=m["frustum_feature_selection"],
            BA=m["BA"],
            BA_cam_lr=m["BA_cam_lr"],
            fix_fine=m["fix_fine"],
            fix_color=m["fix_color"],
            w_color_loss=m["w_color_loss"],
            color_refine=m["color_refine"],
            save_selected_keyframes_info=m.get("save_selected_keyframes_info", False),
            use_events=use_events,
            event_scale_factor=cfg.get("event", {}).get("scale_factor", 0.15),
            event_predictor=cfg.get("event", {}).get("predictor", "unet"),
            esim_gain=float(cfg.get("event", {}).get("esim_gain", 20.0)),
            keyframe_catchup=m.get("keyframe_catchup", False),
            imap_decoders_lr=m.get("imap_decoders_lr", 0.0002),
            prev_resize=cfg.get("event", {}).get("prev_resize", "nearest"),
            stage_lrs=stage_lrs,
        )

    def stage_lr_dict(self, stage: str) -> Dict[str, float]:
        for s, (dec, co, mid, fi, col) in self.stage_lrs:
            if s == stage:
                return {
                    "decoders": dec, "coarse": co, "middle": mid,
                    "fine": fi, "color": col,
                }
        raise KeyError(stage)


# ---------------------------------------------------------------------------
# device-side mapping program
# ---------------------------------------------------------------------------

def _window_c2w(cam_tensors, fixed_c2w, ba: bool):
    """Per-slot camera matrices [K, 3, 4]: from optimizable tensors under BA,
    else the fixed estimates."""
    if ba:
        return jax.vmap(pose_matrix_from_tensor)(cam_tensors)
    return fixed_c2w[:, :3, :]


def _sample_window_rays(key, c2ws, colors, depths, pix_per_img, cam: Camera):
    """Sample ``pix_per_img`` rays from each of K window frames; flatten."""
    K = colors.shape[0]
    keys = jax.random.split(key, K)

    def per_frame(k_key, c2w, color, depth):
        idx = jax.random.randint(k_key, (pix_per_img,), 0, cam.H * cam.W)
        jj = (idx // cam.W).astype(jnp.float32)
        ii = (idx % cam.W).astype(jnp.float32)
        ro, rd = rays_from_uv(ii, jj, c2w, cam.fx, cam.fy, cam.cx, cam.cy)
        j_i, i_i = jj.astype(jnp.int32), ii.astype(jnp.int32)
        return ro, rd, depth[j_i, i_i], color[j_i, i_i]

    ro, rd, d, c = jax.vmap(per_frame)(keys, c2ws, colors, depths)
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    return flat(ro), flat(rd), flat(d), flat(c)


def _map_loss(
    params,
    fixed_c2w,
    colors,
    depths,
    bound,
    key,
    cfg: MapperConfig,
    cam: Camera,
    settings: RenderSettings,
    stage: str,
    ba: bool,
    coarse_mapper: bool,
    pix_per_img: int,
    dp=None,
):
    grids, decoders, cam_tensors = params
    c2ws = _window_c2w(cam_tensors, fixed_c2w, ba)
    rays_o, rays_d, b_depth, b_color = _sample_window_rays(
        key, c2ws, colors, depths, pix_per_img, cam
    )
    # dp: ray rows shard across the mesh; grid/decoder grads psum over dp
    rays_o = constrain_dp(rays_o, dp)
    rays_d = constrain_dp(rays_d, dp)
    b_depth = constrain_dp(b_depth, dp)
    b_color = constrain_dp(b_color, dp)

    if settings.nice:
        inside = inside_bound_mask(
            jax.lax.stop_gradient(rays_o), jax.lax.stop_gradient(rays_d),
            b_depth, bound,
        )
    else:
        inside = jnp.ones_like(b_depth, dtype=bool)

    depth, _, color = render_rays(
        decoders, grids, rays_o, rays_d, bound, stage, settings,
        gt_depth=None if coarse_mapper else b_depth,
    )
    depth_mask = (b_depth > 0) & inside
    loss = jnp.sum(jnp.abs(b_depth - depth) * depth_mask)
    if (not settings.nice) or stage == "color":
        loss = loss + cfg.w_color_loss * jnp.sum(
            jnp.abs(b_color - color) * inside[:, None]
        )
    if not settings.occupancy:  # iMAP free-space regulation
        sigma = regulation_sigma(
            decoders, grids, rays_o, rays_d, b_depth, bound, settings,
            jax.random.fold_in(key, 1), stage,
        )
        loss = loss + 0.0005 * jnp.sum(jnp.abs(sigma))
    return loss


def _grid_lr_tree(grids, lrs: Dict[str, Any]):
    return {level: lrs[level] for level in grids}


def _decoder_lr_tree(decoders, lrs: Dict[str, Any], cfg: MapperConfig, nice: bool):
    out = {}
    for name in decoders:
        if not nice:
            lr = lrs["decoders"]
        elif name == "fine":
            lr = 0.0 if cfg.fix_fine else lrs["decoders"]
        elif name == "color":
            lr = 0.0 if cfg.fix_color else lrs["decoders"]
        else:  # middle / coarse decoders are never optimized (reference)
            lr = 0.0
        out[name] = jax.tree.map(lambda _: jnp.asarray(lr, jnp.float32), decoders[name])
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "cam", "settings", "ba", "coarse_mapper", "pix_per_img",
        "use_frustum", "stages", "use_events", "fix_color_now", "fuse_coarse",
        "pix_per_img_c", "dp", "init_adam",
    ),
)
def map_frame_jit(
    grids,
    decoders,
    cam_tensors,
    adam,
    adam_ev,
    fixed_c2w,
    opt_cam_mask,
    colors,
    depths,
    grid_masks,
    bound,
    seed_scalar,       # uint32 scalar; the PRNG key is derived in-program
    seg_lens,          # dict stage -> dynamic scalar iteration count
    seg_starts,        # dict stage -> dynamic global start iter (RNG/LR phase)
    lr_factor,         # dynamic scalar
    prev_color_lo,
    gt_event_lo,
    gt_depth_lo_flat,
    eventnet,
    event_balancer,
    colors_c,          # coarse-window images (fuse_coarse; else aliased+unused)
    depths_c,
    fixed_c2w_c,
    cfg: MapperConfig,
    cam: Camera,
    settings: RenderSettings,
    ba: bool,
    coarse_mapper: bool,
    pix_per_img: int,
    use_frustum: bool,
    stages: Tuple[str, ...],
    use_events: bool,
    fix_color_now: bool,
    fuse_coarse: bool = False,
    pix_per_img_c: int = 0,
    dp=None,
    init_adam: bool = False,
):
    """One full mapping call: sequential per-stage loops with dynamic lengths.

    Adam state is threaded through (callers init it via ``adam_init``), and
    ``seg_starts`` gives each stage's global starting iteration — so a call
    can be split into chunks (per-inner-iteration visualization) and remain
    bitwise identical to the unchunked call: RNG keys and LR schedules are
    functions of the global iteration, and the optimizer state carries over.

    ``fuse_coarse``: the reference runs the coarse mapper as a THIRD process
    racing the fine mapper on shared state (src/EvenNICER_SLAM.py:313-332,
    src/Mapper.py:83-85) — its loss reads only the coarse grid + coarse
    decoder, which the middle/fine/color stages never touch, so the two
    optimizations are mathematically independent. Here the coarse loss (its
    own random keyframe window, depth-unguided rendering) is summed into
    every staged iteration and the combined gradient is one Adam step:
    because the parameter sets are disjoint, the moments/updates are
    identical to two separate optimizers, but the coarse mapper's
    ``num_iters`` iterations ride along for free — one executable, one
    dispatch, half the per-iteration overhead of running it separately.

    ``init_adam``: build the (zero) Adam state INSIDE this program and ignore
    the passed-in ``adam``/``adam_ev`` placeholders. ``adam_init`` on the host
    would issue one eager ``zeros_like`` dispatch per parameter leaf (~90) —
    each a multi-ms round trip on a remote-attached device — per mapping
    call; in-program initialization is a single fused alloc. Callers chunking
    a call (per-inner-iteration vis) set it on the FIRST chunk only and
    thread the returned state through the rest.

    Returns (grids, decoders, cam_tensors, adam, adam_ev, last_loss,
    last_event_loss)."""
    params = (grids, decoders, cam_tensors)
    if init_adam:
        adam = adam_init(params, per_leaf_t=True)
        if use_events:
            adam_ev = adam_init(params, per_leaf_t=True)
    # identical to a host-side PRNGKey(seed) for seeds < 2^32 (threefry key
    # = [0, seed]); derived in-program to avoid 2 eager dispatches per call
    base_key = jax.random.PRNGKey(seed_scalar)

    cfg_now = cfg._replace(fix_color=cfg.fix_color or fix_color_now)

    def active_trees(stage: str, event_update: bool):
        """torch's lazy per-parameter Adam as a static bool pytree: a leaf is
        active iff the corresponding torch parameter exists in the optimizer
        (reference src/Mapper.py:363-423 param groups) AND receives a grad at
        this stage (``Adam.step()`` skips grad-None params). Inactive leaves
        keep their p/m/v/step untouched — matching torch exactly and skipping
        the dead moment traffic (e.g. the fine/color grids during the middle
        stage)."""
        if event_update:
            # optimizer_event param list: decoders + coarse/middle/fine grids
            # (color grid excluded, src/Mapper.py:404-410); its loss is a
            # color-stage render, so the coarse grid never gets a grad
            grid_on = {"coarse": False, "middle": True, "fine": True,
                       "color": False}
        else:
            grid_on = {
                # fused mode: the coarse-mapper loss rides every iteration
                "coarse": stage == "coarse" or fuse_coarse,
                "middle": stage in ("middle", "fine", "color"),
                "fine": stage in ("fine", "color"),
                "color": stage == "color",
            }
        g_act = None if grids is None else {
            lvl: jax.tree.map(lambda _: grid_on.get(lvl, False), grids[lvl])
            for lvl in grids
        }

        def dec_on(name: str) -> bool:
            if not settings.nice:
                return True  # imap: the whole MLP is the param list
            if name == "fine":
                on = event_update or stage in ("fine", "color")
                return (not cfg.fix_fine) and on
            if name == "color":
                on = event_update or stage == "color"
                return (not cfg_now.fix_color) and on
            return False  # middle/coarse decoders are never optimized

        d_act = {
            name: jax.tree.map(lambda _, n=name: dec_on(n), decoders[name])
            for name in decoders
        }
        return (g_act, d_act, ba)

    def make_stage_body(stage: str):
        lrs_host = (
            cfg.stage_lr_dict(stage)
            if settings.nice
            else {"decoders": cfg.imap_decoders_lr, "coarse": 0.0,
                  "middle": 0.0, "fine": 0.0, "color": 0.0}
        )
        if fuse_coarse:
            # the coarse grid trains at the coarse STAGE's lr throughout
            # (it belongs to the fused coarse-mapper loss, not this stage)
            lrs_host = dict(lrs_host, coarse=cfg.stage_lr_dict("coarse")["coarse"])

        def lr_tree_for(params, event_update: bool, it=None):
            grids_, decoders_, cams_ = params
            g_lrs = {
                lvl: jnp.asarray(lrs_host.get(lvl, 0.0), jnp.float32) * lr_factor
                for lvl in ("coarse", "middle", "fine", "color")
            }
            if event_update:
                g_lrs["color"] = jnp.zeros(())  # event optimizer excludes color grid
                g_lrs["coarse"] = jnp.zeros(())  # and never touches coarse
            grid_tree = {
                lvl: jax.tree.map(lambda _: g_lrs[lvl], grids_[lvl])
                for lvl in grids_
            }
            dec_lr = jnp.asarray(lrs_host["decoders"], jnp.float32) * lr_factor
            if not settings.nice and it is not None:
                # iMAP* StepLR(step=200, gamma=0.8) (reference src/Mapper.py:433-434)
                dec_lr = dec_lr * 0.8 ** (it // 200).astype(jnp.float32)
            dec_tree = _decoder_lr_tree(decoders_, {"decoders": dec_lr}, cfg_now, settings.nice)
            cam_lr = (
                jnp.asarray(cfg.BA_cam_lr, jnp.float32)
                if (ba and stage == "color")
                else jnp.zeros(())
            )
            cam_tree = opt_cam_mask[:, None] * cam_lr
            return (grid_tree, dec_tree, cam_tree)

        def loss_fn(p, key):
            loss = _map_loss(
                p, fixed_c2w, colors, depths, bound, key, cfg_now, cam,
                settings, stage, ba, coarse_mapper, pix_per_img, dp,
            )
            if fuse_coarse:
                # independent coarse-mapper loss (disjoint params) rides in
                # the same backward; own window, own RNG stream, no BA
                loss = loss + _map_loss(
                    p, fixed_c2w_c, colors_c, depths_c, bound,
                    jax.random.fold_in(key, 2), cfg_now, cam, settings,
                    "coarse", False, True, pix_per_img_c, dp,
                )
            return loss

        grad_fn = jax.value_and_grad(loss_fn)

        if use_events:
            ev_fn = lambda p: _mapper_event_loss(
                p, fixed_c2w, bound, prev_color_lo, gt_event_lo,
                gt_depth_lo_flat, eventnet, cfg, cam, settings, ba,
                event_balancer, dp,
            )
            ev_grad_fn = jax.value_and_grad(ev_fn)

        act_main = active_trees(stage, event_update=False)
        act_ev = active_trees(stage, event_update=True) if use_events else None

        def body(i, carry):
            params, adam, adam_ev, _, _ = carry
            it = i + seg_starts[stage]
            key = jax.random.fold_in(jax.random.fold_in(base_key, _stage_id(stage)), it)
            loss, grads = grad_fn(params, key)
            if use_frustum:
                grads = (_mask_grid_grads(grads[0], grid_masks, coarse_mapper,
                                          fused=fuse_coarse),
                         grads[1], grads[2])
            lrs = lr_tree_for(params, event_update=False, it=it)
            new_params, adam = adam_update(grads, adam, params, lrs,
                                           active=act_main)
            ev_loss = jnp.zeros(())
            if use_events:
                ev_loss, ev_grads = ev_grad_fn(new_params)
                if use_frustum:
                    ev_grads = (
                        _mask_grid_grads(ev_grads[0], grid_masks, coarse_mapper),
                        ev_grads[1], ev_grads[2],
                    )
                ev_lrs = lr_tree_for(new_params, event_update=True)
                new_params, adam_ev = adam_update(ev_grads, adam_ev,
                                                  new_params, ev_lrs,
                                                  active=act_ev)
            return (new_params, adam, adam_ev, loss, ev_loss)

        return body

    last_loss = jnp.zeros(())
    last_ev = jnp.zeros(())
    carry = (params, adam, adam_ev, last_loss, last_ev)
    for stage in stages:
        body = make_stage_body(stage)
        carry = jax.lax.fori_loop(0, seg_lens[stage], body, carry)
    params, adam, adam_ev, last_loss, last_ev = carry
    return (params[0], params[1], params[2], adam, adam_ev,
            last_loss, last_ev)


def _stage_id(stage: str) -> int:
    return {"coarse": 0, "middle": 1, "fine": 2, "color": 3}[stage]


def _mask_grid_grads(grid_grads, grid_masks, coarse_mapper: bool,
                     fused: bool = False):
    """Frustum selection as a gradient mask: coarse mapper touches only the
    coarse grid, the fine mapper everything but coarse
    (reference src/Mapper.py:450-458). In fused mode the coarse-mapper loss
    shares the backward, so the coarse grid's gradient (produced ONLY by the
    coarse loss — the staged decode never reads it) passes through too."""
    out = {}
    for lvl, g in grid_grads.items():
        keep = (lvl == "coarse") if coarse_mapper else (fused or lvl != "coarse")
        out[lvl] = g * grid_masks[lvl] if keep else jnp.zeros_like(g)
    return out


def _mapper_event_loss(
    params, fixed_c2w, bound, prev_color_lo, gt_event_lo, gt_depth_lo_flat,
    eventnet, cfg, cam, settings, ba, balancer, dp=None,
):
    grids, decoders, cam_tensors = params
    c2ws = _window_c2w(cam_tensors, fixed_c2w, ba)
    cur_c2w = c2ws[-1]
    lo_h, lo_w = prev_color_lo.shape[:2]
    rays_o, rays_d = get_rays_rescale(
        cam.H, cam.W, lo_h, lo_w, cam.fx, cam.fy, cam.cx, cam.cy, cur_c2w
    )
    _, _, cur_lo = render_rays(
        decoders, grids,
        constrain_dp(rays_o.reshape(-1, 3), dp),
        constrain_dp(rays_d.reshape(-1, 3), dp),
        bound, "color", settings,
        gt_depth=constrain_dp(gt_depth_lo_flat, dp),
    )
    cur_lo = cur_lo.reshape(lo_h, lo_w, 3)
    if cfg.event_predictor == "esim":
        # net-free analytic predictor (event.predictor: esim) — same branch
        # the tracker takes; eventnet is an empty dict in this mode
        from evennicer_slam_tpu.slam.tracker import esim_predict

        pred, _ = esim_predict(prev_color_lo, cur_lo, cfg.esim_gain)
    else:
        pred, _ = inference_event(eventnet, prev_color_lo, cur_lo)
    loss = jnp.sum((gt_event_lo - pred) ** 2)
    loss = loss + jnp.sum(
        (gaussian_blur(gt_event_lo, 3) - gaussian_blur(pred, 3)) ** 2
    )
    return loss * balancer


# ---------------------------------------------------------------------------
# host-side driver
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cur_slots", "need_cams"))
def _assemble_dev_jit(col_list, dep_list, kf_rows, cams, cur_c2w,
                      cur_slots: Tuple[int, ...], need_cams: bool):
    """Device-pose window assembly as ONE program: stack the window images,
    splice the tracker's device pose (and its quat+trans tensor) into the
    current-frame slots. Replaces ~20 eager dispatches per mapping call."""
    colors = jnp.stack(col_list)
    depths = jnp.stack(dep_list)
    fixed = jnp.asarray(kf_rows, jnp.float32)
    cams = jnp.asarray(cams, jnp.float32)
    cur4 = jnp.asarray(cur_c2w, jnp.float32)
    if need_cams:
        cur_cam = tensor_from_pose_matrix(cur4[:3])
    for slot in cur_slots:
        fixed = fixed.at[slot].set(cur4)
        if need_cams:
            cams = cams.at[slot].set(cur_cam)
    return colors, depths, fixed, cams


class Mapper:
    """Host-side mapping driver: window selection, frustum masks, keyframe
    registry, and dispatch into map_frame_jit."""

    def __init__(
        self,
        cfg: MapperConfig,
        cam: Camera,
        settings: RenderSettings,
        bound: np.ndarray,
        coarse_mapper: bool = False,
        eventnet: Optional[Dict] = None,
        seed: int = 1234,
        dp=None,
    ):
        self.cfg = cfg
        self.dp = dp
        self.cam = cam
        self.settings = settings
        self.bound_np = np.asarray(bound, np.float32)
        self.bound = jnp.asarray(bound, jnp.float32)
        self.coarse_mapper = coarse_mapper
        self.keyframes = KeyframeStore()
        self.eventnet = eventnet if eventnet is not None else {}
        self.rng = np.random.default_rng(seed)
        # fold the coarse mapper's optimization into this mapper's compiled
        # call (set by the pipeline; see map_frame_jit's fuse_coarse note).
        # Its window selection draws from an independent stream so fusing
        # cannot perturb the fine mapper's selection RNG.
        self.fuse_coarse = False
        self.rng_coarse = np.random.default_rng(seed + 1)
        self.BA_active = False
        self.last_loss = 0.0
        self.selected_keyframes = {}  # per-frame window info (opt-in)
        self.selection = (
            "global" if coarse_mapper else cfg.keyframe_selection
        )
        lo_h = int(cam.H * cfg.event_scale_factor)
        lo_w = int(cam.W * cfg.event_scale_factor)
        self.lo_hw = (lo_h, lo_w)
        # device-constant caches: these are re-used every mapping call; an
        # eager jnp.ones/zeros per call is a multi-ms dispatch round trip on
        # a remote-attached device
        self._ones_masks: Dict[Tuple[int, ...], jnp.ndarray] = {}
        self._zeros_cache: Dict[Tuple[int, ...], jnp.ndarray] = {}

    def _ones_mask(self, shape_zyx) -> jnp.ndarray:
        key = tuple(int(s) for s in shape_zyx)
        if key not in self._ones_masks:
            self._ones_masks[key] = jnp.ones(key + (1,), jnp.float32)
        return self._ones_masks[key]

    def _zeros(self, *shape) -> jnp.ndarray:
        if shape not in self._zeros_cache:
            self._zeros_cache[shape] = jnp.zeros(shape, jnp.float32)
        return self._zeros_cache[shape]

    # -- window selection ---------------------------------------------------

    def select_window(self, gt_color, gt_depth, cur_c2w,
                      selection: Optional[str] = None,
                      rng=None) -> List[int]:
        """Indices into the keyframe store; -1 denotes the current frame.

        ``selection``/``rng`` default to this mapper's own policy/stream;
        the fused coarse term passes ('global', rng_coarse) — the
        reference forces global selection for its coarse mapper
        (src/Mapper.py:83-85) — so fusing cannot perturb the fine
        selection RNG."""
        kf = self.keyframes
        selection = self.selection if selection is None else selection
        rng = self.rng if rng is None else rng
        if len(kf) <= 1:
            # no candidates besides the always-included last keyframe: both
            # policies select nothing, and skipping the overlap scorer keeps
            # this pose-free (the async path passes cur_c2w as a device
            # array; the scorer's ray math would force a fetch)
            frames: List[int] = []
        else:
            num = self.cfg.window_size - 2
            if selection == "global":
                frames = random_select(len(kf) - 1, num, rng)
            else:
                kf.sync_host_poses()  # device BA may have updated poses
                frames = keyframe_selection_overlap(
                    np.asarray(gt_color), np.asarray(gt_depth),
                    np.asarray(cur_c2w), kf.frames[:-1], num, self.cam,
                    rng=rng,
                )
        if len(kf) > 0:
            frames = frames + [len(kf) - 1]
        frames = [int(f) for f in frames] + [-1]
        return frames

    def _assemble_window(self, frames: List[int], cur_color_dev,
                         cur_depth_dev, cur_c2w, need_cams: bool = True):
        """Stack window images from the keyframe device cache (current frame
        from the pipeline's upload) + estimated c2w matrices and (when
        ``need_cams``) their quat+trans tensors. The fused-coarse window
        passes need_cams=False: its cam tensors are never read (cam tensors
        only matter under BA, which excludes the coarse term), so the host
        quaternion conversions and device splices are skipped.

        ``cur_c2w`` may be a DEVICE array (steady-state async path): the
        keyframe rows are still host numpy, but the current-frame rows are
        spliced in on device so no pose fetch (queue drain) is needed."""
        col_list, dep_list = [], []
        for f in frames:
            if f == -1:
                col_list.append(cur_color_dev)
                dep_list.append(cur_depth_dev)
            else:
                c, d = self.keyframes.device_images(f)
                col_list.append(c)
                dep_list.append(d)
        cur_is_dev = not isinstance(cur_c2w, np.ndarray)
        if self.keyframes.host_poses_stale and cur_is_dev and not need_cams:
            # device BA updated the pose stack; gather the window rows on
            # device instead of fetching (used by the fused-coarse window in
            # the grown-registry fast path)
            _, _, poses_dev = self.keyframes.device_stack()
            sel = jnp.asarray(
                np.array([0 if f == -1 else f for f in frames], np.int32)
            )
            kf_rows = poses_dev[sel]
        else:
            self.keyframes.sync_host_poses()
            kf_rows = np.stack(
                [
                    np.eye(4, dtype=np.float32) if (f == -1 and cur_is_dev)
                    else (cur_c2w if f == -1
                          else self.keyframes.frames[f]["est_c2w"])
                    for f in frames
                ]
            ).astype(np.float32)
        cams = None
        if need_cams:
            cams = np.stack(
                [tensor_from_pose_matrix_np(m[:3]) for m in kf_rows]
            ).astype(np.float32)
        if cams is None:
            cams = np.zeros((len(frames), 7), np.float32)
        if cur_is_dev:
            # single fused dispatch: stacks, pose splices, and the quat
            # conversion ran as ~20 eager ops before (each a multi-ms round
            # trip on a remote-attached device — ~300 ms per mapping call)
            cur_slots = tuple(i for i, f in enumerate(frames) if f == -1)
            return _assemble_dev_jit(
                col_list, dep_list, kf_rows, cams, cur_c2w, cur_slots,
                need_cams,
            )
        return jnp.stack(col_list), jnp.stack(dep_list), kf_rows, cams

    # -- main entry ---------------------------------------------------------

    def optimize_map(
        self,
        num_joint_iters: int,
        lr_factor: float,
        idx: int,
        cur_gt_color,
        cur_gt_depth,
        cur_gt_event,
        cur_c2w: np.ndarray,
        pre_gt_color=None,
        color_refine: bool = False,
        seed: int = 0,
        grids=None,
        decoders=None,
        cur_images_dev=None,
        vis_callback=None,
        vis_inside_freq: int = 0,
    ):
        """One mapping call. Returns (grids, decoders, new_cur_c2w or None).

        ``vis_callback(global_iter, grids, decoders, cam_tensors)`` — when
        given with ``vis_inside_freq`` > 0, the on-device optimization is
        split into chunks of that many joint iterations and the callback
        fires before each chunk (reference Visualizer.vis fires every
        ``vis_inside_freq`` iterations inside the joint loop,
        src/utils/Visualizer.py:34-44). Chunking is bitwise identical to the
        unchunked call: Adam state is threaded through and RNG/LR phases are
        functions of the global iteration."""
        cfg = self.cfg
        cam = self.cam
        # cur_c2w may be a DEVICE array (pipeline steady-state async path:
        # no BA, pose-free window selection). Everything below then splices
        # the device pose in on device — zero host round trips.
        pose_is_dev = not isinstance(cur_c2w, np.ndarray)

        # window images assembled on DEVICE: keyframes from the store's
        # device cache, the current frame from the pipeline's upload — the
        # host link is slow enough that re-uploading the window every call
        # dominated the mapping wall time
        if cur_images_dev is not None:
            cur_color_dev, cur_depth_dev = cur_images_dev
        else:
            cur_color_dev = jnp.asarray(np.asarray(cur_gt_color))
            cur_depth_dev = jnp.asarray(np.asarray(cur_gt_depth))

        # Grown-registry fast path: with a device pose and overlap selection,
        # the scorer + selection + window assembly (and, below, the BA pose
        # write-back) all run as device programs — keeping the steady-state
        # pipeline fully asynchronous where the host path would fetch the
        # pose (draining the device queue) every mapping call. Measured on
        # the bench's grown-window phase: 1.32 -> ~1.7 fps.
        dev_select = (
            pose_is_dev
            and self.selection == "overlap"
            and len(self.keyframes) > 1
            and not cfg.save_selected_keyframes_info
        )
        ba = self.BA_active and not self.coarse_mapper
        window_idx_dev = opt_mask = None
        if dev_select:
            K = min(cfg.window_size, len(self.keyframes) + 1)
            window = None
            kf_cols, kf_deps, kf_poses = self.keyframes.device_stack()
            (colors, depths, fixed_c2w, cam_tensors, window_idx_dev,
             opt_mask) = select_assemble_window_dev(
                jax.random.PRNGKey(np.uint32(seed * 2 + 1)),
                kf_cols, kf_deps, kf_poses,
                cur_color_dev, cur_depth_dev, cur_c2w, K - 2, cam,
            )
        else:
            window = self.select_window(cur_gt_color, cur_gt_depth, cur_c2w)
            K = len(window)
            # cam tensors are only ever read under BA (_window_c2w); without
            # it, skip the quaternion conversions AND the host-pose sync they
            # would force — the standalone coarse mapper (global selection,
            # no BA) then stays on the async path even when device-side BA
            # left host pose rows stale
            colors, depths, fixed_c2w, cam_tensors = self._assemble_window(
                window, cur_color_dev, cur_depth_dev, cur_c2w, need_cams=ba)
        pix_per_img = cfg.pixels // K

        if cfg.save_selected_keyframes_info:
            info = []
            for f in window:
                if f == -1:
                    info.append({"idx": idx, "est_c2w": np.asarray(cur_c2w).copy()})
                else:
                    kf = self.keyframes.frames[f]
                    info.append({"idx": kf["idx"],
                                 "est_c2w": kf["est_c2w"].copy(),
                                 "gt_c2w": kf["gt_c2w"].copy()})
            self.selected_keyframes[idx] = info

        # fused coarse-mapper term: its own globally-random window, assembled
        # from the same device image cache
        fuse_coarse = bool(
            self.fuse_coarse and self.settings.nice
            and not self.coarse_mapper and not color_refine
        )
        if fuse_coarse:
            c_frames = self.select_window(
                None, None, None, selection="global", rng=self.rng_coarse)
            pix_per_img_c = cfg.pixels // len(c_frames)
            if c_frames == window:
                # steady state with ≤ window_size keyframes: the coarse
                # window draws the same frames — alias the already-assembled
                # stacks instead of paying a second assembly dispatch
                colors_c, depths_c, fixed_c2w_c = colors, depths, fixed_c2w
            else:
                colors_c, depths_c, fixed_c2w_c, _ = self._assemble_window(
                    c_frames, cur_color_dev, cur_depth_dev, cur_c2w,
                    need_cams=False)
        else:
            colors_c, depths_c = colors, depths
            fixed_c2w_c = self._zeros(colors.shape[0], 4, 4)
            pix_per_img_c = 0

        assert not (ba and pose_is_dev and not dev_select), (
            "BA with a device pose needs the device selection/write-back "
            "path (overlap selection); host-path BA must receive a numpy "
            "pose"
        )
        # the reference anchors the oldest KEYFRAME and optimizes the current
        # frame's pose (oldest computed BEFORE appending -1,
        # src/Mapper.py:296-300); min over the full window would instead
        # freeze the current frame (-1) and leave the gauge unanchored.
        # (dev_select computed opt_mask on device already.)
        if not dev_select:
            kf_only = [f for f in window if f != -1]
            oldest = min(kf_only) if kf_only else -1
            opt_mask = np.array(
                [0.0 if f == oldest else 1.0 for f in window], np.float32
            )

        # stage schedule
        if self.coarse_mapper:
            stages: Tuple[str, ...] = ("coarse",)
            seg = {"coarse": num_joint_iters}
        elif not self.settings.nice:
            stages = ("color",)
            seg = {"color": num_joint_iters}
        elif color_refine:
            stages = ("color",)
            seg = {"color": num_joint_iters}
        else:
            m_end = int(num_joint_iters * cfg.middle_iter_ratio)
            f_end = int(num_joint_iters * cfg.fine_iter_ratio)
            stages = ("middle", "fine", "color")
            seg = {
                "middle": m_end + 1,
                "fine": f_end - m_end,
                "color": num_joint_iters - 1 - f_end,
            }
        # global-iteration span of each stage (chunking slices these)
        spans = {}
        acc = 0
        for s in stages:
            spans[s] = (acc, acc + seg.get(s, 0))
            acc += seg.get(s, 0)
        total_iters = acc

        # frustum masks
        use_frustum = cfg.frustum_feature_selection and self.settings.nice and not color_refine
        grid_masks = {}
        if grids is not None:
            masked = [
                lvl for lvl in grids if use_frustum and lvl != "coarse"
            ]
            if masked and pose_is_dev:
                # one dispatch for every level (per-level calls cost 3 jit
                # dispatches + eager reshape/cast ops per mapping call)
                ms = frustum_feature_masks_dev(
                    cur_c2w, [grids[lvl].shape[:3] for lvl in masked],
                    cur_depth_dev, self.bound_np, cam,
                )
                grid_masks.update(zip(masked, ms))
            else:
                for lvl in masked:
                    m = frustum_feature_mask(
                        cur_c2w, grids[lvl].shape[:3],
                        np.asarray(cur_gt_depth), self.bound_np, cam,
                    )
                    grid_masks[lvl] = jnp.asarray(
                        m[..., None].astype(np.float32)
                    )
            for lvl, g in grids.items():
                if lvl not in grid_masks:
                    grid_masks[lvl] = self._ones_mask(g.shape[:3])

        # event inputs
        use_events = cfg.use_events and not self.coarse_mapper and idx != 0
        lo_h, lo_w = self.lo_hw
        if use_events and pre_gt_color is not None:
            # NEAREST like the reference's transform (src/Mapper.py:444,587)
            # by default; event.prev_resize: bilinear opts out (see
            # TrackerConfig.prev_resize)
            prev_fn = (resize_nearest if cfg.prev_resize == "nearest"
                       else resize_bilinear)
            prev_color_lo = prev_fn(jnp.asarray(pre_gt_color), self.lo_hw)
            gt_event_lo = resize_nearest(jnp.asarray(cur_gt_event), self.lo_hw)
            gt_depth_lo_flat = resize_bilinear(
                jnp.asarray(cur_gt_depth), self.lo_hw
            ).reshape(-1)
            balancer = (pix_per_img * K) / (lo_w * lo_h) / 100.0
        else:
            use_events = False
            prev_color_lo = self._zeros(lo_h, lo_w, 3)
            gt_event_lo = self._zeros(lo_h, lo_w, 2)
            gt_depth_lo_flat = self._zeros(lo_h * lo_w)
            balancer = 0.0

        new_grids, new_decoders = grids, decoders
        new_cams = cam_tensors
        params0 = (new_grids, new_decoders, new_cams)
        # Adam state is initialized INSIDE map_frame_jit (init_adam on the
        # first chunk); a host-side adam_init costs ~90 eager zeros_like
        # dispatches per mapping call (~hundreds of ms on a remote-attached
        # device). The placeholder aliases the parameter arrays — no
        # transfers, no eager ops — and is dead under init_adam=True.
        adam = AdamState(params0, params0, np.int32(0))
        adam_ev = adam if use_events else None
        loss = ev_loss = np.float32(0.0)

        if vis_callback is not None and vis_inside_freq > 0:
            chunks = [
                (a, min(a + vis_inside_freq, total_iters))
                for a in range(0, total_iters, vis_inside_freq)
            ]
        else:
            chunks = [(0, total_iters)]

        # numpy scalars throughout: each jnp.asarray here was an eager
        # dispatch (multi-ms on a remote-attached device); numpy args ride
        # the jit call's own transfer instead
        for ci, (a, b) in enumerate(chunks):
            if vis_callback is not None and vis_inside_freq > 0:
                vis_callback(a, new_grids, new_decoders, new_cams)
            seg_lens = {
                s: np.int32(
                    max(0, min(b, spans[s][1]) - max(a, spans[s][0]))
                )
                for s in stages
            }
            seg_starts = {
                s: np.int32(max(0, min(a, spans[s][1]) - spans[s][0]))
                for s in stages
            }
            (new_grids, new_decoders, new_cams, adam, adam_ev, loss,
             ev_loss) = map_frame_jit(
                new_grids,
                new_decoders,
                new_cams,
                adam,
                adam_ev,
                fixed_c2w,
                opt_mask,
                colors,
                depths,
                grid_masks,
                self.bound,
                np.uint32(seed),
                seg_lens,
                seg_starts,
                np.float32(lr_factor),
                prev_color_lo,
                gt_event_lo,
                gt_depth_lo_flat,
                self.eventnet,
                np.float32(balancer),
                colors_c,
                depths_c,
                fixed_c2w_c,
                cfg,
                cam,
                self.settings,
                ba,
                self.coarse_mapper,
                pix_per_img,
                use_frustum,
                stages,
                use_events,
                color_refine,
                fuse_coarse,
                pix_per_img_c,
                self.dp,
                init_adam=(ci == 0),
            )
        # device scalar on purpose: float() would stall the host on the whole
        # mapping program; the pipeline fetches it in deferred metric batches
        self.last_loss = loss

        new_cur_c2w = None
        if ba and dev_select:
            # device-side write-back: optimized window poses scatter into
            # the registry's device pose stack (host copies lazily synced);
            # the new current-frame pose stays a device array
            _, _, kf_poses = self.keyframes.device_stack()
            new_poses, new_cur_c2w = scatter_window_poses_dev(
                kf_poses, window_idx_dev, new_cams, fixed_c2w, opt_mask
            )
            self.keyframes.set_poses_device(new_poses)
        elif ba:
            cams_np = np.asarray(new_cams)
            for slot, f in enumerate(window):
                if f == oldest:
                    continue
                m34 = pose_matrix_from_tensor_np(cams_np[slot])
                m = np.eye(4, dtype=np.float32)
                m[:3] = m34
                if f == -1:
                    new_cur_c2w = m
                else:
                    self.keyframes.set_pose(f, m)
        return new_grids, new_decoders, new_cur_c2w

    def maybe_add_keyframe(
        self, idx, n_img, gt_color, gt_depth, gt_event, cur_c2w, gt_c2w,
        device_images=None,
    ):
        """Append every keyframe_every frames or at the second-to-last frame
        (reference src/Mapper.py:830-835). With ``mapping.keyframe_catchup``
        (extension, default off = reference behavior) a keyframe is also
        added whenever a full keyframe_every window has passed without one —
        the rescue for concurrent loose/free mapping, where mapped indices
        are timing-dependent and may never hit the % grid."""
        due = idx % self.cfg.keyframe_every == 0 or idx == n_img - 2
        if not due and self.cfg.keyframe_catchup and self.keyframes.indices:
            due = idx - max(self.keyframes.indices) >= self.cfg.keyframe_every
        if due and idx not in self.keyframes.indices:
            self.keyframes.append(idx, gt_color, gt_depth, gt_event, cur_c2w,
                                  gt_c2w, device_images=device_images)

    def update_ba_state(self):
        self.BA_active = (
            len(self.keyframes) > 4 and self.cfg.BA and not self.coarse_mapper
        )
