"""Tracker: per-frame camera-pose optimization, fully jit-compiled.

TPU-native rebuild of reference src/Tracker.py:22-466. One compiled program
runs the ENTIRE per-frame optimization (``iters`` Adam steps via lax.scan) —
pose init, ray sampling, rendering, the EventNet branch, loss masking, and
best-pose selection all stay on device; the host only feeds frames and reads
back the winning pose.

Semantics preserved from the reference:
- constant-speed motion extrapolation for pose init (src/Tracker.py:316-321),
- pose as a 7-vector [quat, t]; optional ``seperate_LR`` gives the quaternion
  0.2x the translation LR (src/Tracker.py:325-342),
- RGB-D loss = sum |d_gt - d| / sqrt(var + 1e-10) over rays passing the
  dynamic-handling mask (err < 10 * median, d_gt > 0) plus w_color * L1 color
  (src/Tracker.py:180-194); rays whose depth exits the scene bound are
  *masked* rather than dropped (fixed shapes),
- event loss = L2 of (accumulated GT events - EventNet prediction) at
  0.15 scale with a Gaussian-blur pyramid, scaled by ``balancer``
  (src/Tracker.py:204-228); RGB-D loss only fires when
  ``idx % rgbd_every_frame == 0`` (src/Tracker.py:357),
- both losses feed ONE Adam step (the reference's two backward() calls sum
  gradients, src/Tracker.py:196-239); the event loss enters gradients only
  when ``activate_events``,
- best pose = argmin of the per-iteration criterion loss, where the stored
  tensor is the post-step value (reference quirk, src/Tracker.py:439-442);
  criterion is the event loss when the event branch runs, else the RGB-D loss.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from evennicer_slam_tpu.core.bounds import inside_bound_mask
from evennicer_slam_tpu.core.quaternion import (
    pose_matrix_from_tensor,
    tensor_from_pose_matrix,
)
from evennicer_slam_tpu.core.rays import get_rays_rescale, get_samples
from evennicer_slam_tpu.models.eventnet import inference_event
from evennicer_slam_tpu.ops.gaussian_blur import gaussian_blur
from evennicer_slam_tpu.parallel.sharding import constrain_dp
from evennicer_slam_tpu.ops.resize import resize_bilinear, resize_nearest
from evennicer_slam_tpu.render.renderer import RenderSettings, render_rays
from evennicer_slam_tpu.slam.camera import Camera
from evennicer_slam_tpu.utils.optim import adam_init, adam_update


def _check_activate_events(value):
    """true | false | 'non_rgbd'; anything else (e.g. a typo'd string,
    which would silently fall into the truthy always-on branch) raises."""
    if value in (True, False, 0, 1, "non_rgbd"):
        return bool(value) if value in (0, 1) else value
    raise ValueError(
        f"event.activate_events must be true, false, or 'non_rgbd'; "
        f"got {value!r}"
    )


class TrackerConfig(NamedTuple):
    pixels: int = 200
    iters: int = 10
    lr: float = 1e-3
    separate_lr: bool = False
    w_color_loss: float = 0.5
    ignore_edge_w: int = 20
    ignore_edge_h: int = 20
    handle_dynamic: bool = True
    use_color: bool = True
    const_speed: bool = True
    gt_camera: bool = False
    rgbd_every_frame: int = 1
    use_events: bool = False
    # True: event loss optimized on every frame (reference behavior);
    # False: never optimized (loss still computed for logging/selection);
    # "non_rgbd": optimized only on frames WITHOUT an RGB-D loss — an
    # extension: the event signal's ~5 mm bias can degrade the mm-precise
    # RGB-D anchor frames it is summed into (measured, tools/event_ablation)
    activate_events: object = True
    balancer: float = 0.025
    scale_factor: float = 0.15
    blur: bool = True
    kernel_sizes: Tuple[int, ...] = (9,)
    unblurred_weight: float = 0.0
    kernel_weights: Tuple[float, ...] = (1.0,)
    # reference quirk: the best tracked pose is selected by the EVENT loss
    # even on frames that also have RGB-D (src/Tracker.py:439-442). "rgbd"
    # switches selection to the RGB-D loss on RGB-D frames (ablation knob;
    # event-only frames always select by event loss - it is the only one).
    best_pose_criterion: str = "event"
    # extension: event-bias self-calibration. The event-loss basin minimum
    # sits a systematic few mm off the true pose (measured,
    # ARCHITECTURE.md §EventNet training); at RGB-D-anchored frames the
    # tracker measures that offset (event-only optimization probe FROM the
    # anchored pose) and subtracts it from subsequent event-tracked poses,
    # breaking the drift accumulation through the map/pose feedback loop.
    bias_correction: bool = False
    # "constant": subtract the full measured bias each frame;
    # "window": scale by (frames since boundary)/rgbd_every_frame (the bias
    # was measured on a full integration window)
    bias_scale_mode: str = "constant"
    # EMA over boundary measurements (0 = use the newest only). The probe's
    # Adam transient adds noise on top of the systematic offset; averaging
    # across boundaries keeps the systematic part and cancels the noise.
    bias_ema: float = 0.0
    # global damping on the applied correction
    bias_alpha: float = 1.0
    # event predictor: "unet" = the reference's 2-head EventNet
    # (src/event_net.py:67-99); "esim" = extension: the analytic ESIM-style
    # model gain*(I2_render - I1_gt) split by polarity — net-free, and on
    # synthetic ESIM ground truth it IS the Bayes-optimal predictor, so it
    # doubles as the oracle bound for what a perfect net could contribute
    predictor: str = "unet"
    esim_gain: float = 20.0
    # previous-image downscale filter. "nearest" = reference-exact
    # (src/Tracker.py:136,148 applies the NEAREST transform to
    # pre_gt_color). "bilinear" (extension) antialiases the prev image —
    # measurably better for the ANALYTIC esim predictor on fast-rotation
    # scenes, where nearest aliasing noise swamps the intensity-difference
    # signal (flagship 300-frame scene: esim 0.386 m bilinear vs 0.991 m
    # nearest; the UNet is robust either way and prefers reference-exact
    # inputs: 0.219 m nearest vs 1.73 m bilinear-fed-out-of-domain)
    prev_resize: str = "nearest"

    @staticmethod
    def from_cfg(cfg: Dict[str, Any], use_events: bool) -> "TrackerConfig":
        t = cfg["tracking"]
        e = cfg.get("event", {})
        return TrackerConfig(
            pixels=t["pixels"],
            iters=t["iters"],
            lr=t["lr"],
            separate_lr=t["seperate_LR"],
            w_color_loss=t["w_color_loss"],
            ignore_edge_w=t["ignore_edge_W"],
            ignore_edge_h=t["ignore_edge_H"],
            handle_dynamic=t["handle_dynamic"],
            use_color=t["use_color_in_tracking"],
            const_speed=t["const_speed_assumption"],
            gt_camera=t["gt_camera"],
            rgbd_every_frame=e.get("rgbd_every_frame", 1),
            use_events=use_events,
            activate_events=_check_activate_events(
                e.get("activate_events", False)
            ),
            balancer=e.get("balancer", 0.025),
            scale_factor=e.get("scale_factor", 0.15),
            blur=e.get("blur", True),
            kernel_sizes=tuple(e.get("kernel_sizes", [9])),
            unblurred_weight=e.get("unblurred_weight", 0.0),
            kernel_weights=tuple(e.get("kernel_weights", [1.0])),
            best_pose_criterion=e.get("best_pose_criterion", "event"),
            bias_correction=bool(e.get("bias_correction", False)),
            bias_scale_mode=e.get("bias_scale_mode", "constant"),
            bias_ema=float(e.get("bias_ema", 0.0)),
            bias_alpha=float(e.get("bias_alpha", 1.0)),
            predictor=_check_predictor(e.get("predictor", "unet")),
            esim_gain=float(e.get("esim_gain", 20.0)),
            prev_resize=_check_prev_resize(e.get("prev_resize", "nearest")),
        )


def _check_predictor(value: str) -> str:
    if value not in ("unet", "esim"):
        raise ValueError(
            f"event.predictor must be 'unet' or 'esim'; got {value!r}"
        )
    return value


def _check_prev_resize(value: str) -> str:
    if value not in ("nearest", "bilinear"):
        raise ValueError(
            f"event.prev_resize must be 'nearest' or 'bilinear'; got {value!r}"
        )
    return value


def esim_predict(
    prev_lo: jnp.ndarray, cur_lo: jnp.ndarray, gain: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Analytic ESIM-style event prediction from an intensity pair:
    counts = gain * (mean(cur) - mean(prev)) split by polarity [-,+]
    (the construction ESIM ground truth uses). Returns (events [h,w,2],
    existence mask probs [h,w,2]) matching inference_event's contract."""
    diff = (jnp.mean(cur_lo, axis=-1) - jnp.mean(prev_lo, axis=-1)) * gain
    events = jnp.stack(
        [jnp.clip(-diff, 0.0, 255.0), jnp.clip(diff, 0.0, 255.0)], axis=-1
    )
    p = (jnp.abs(diff) > 0.5).astype(jnp.float32)
    mask = jnp.stack([1.0 - p, p], axis=-1)
    return events, mask


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """torch-style median (lower middle, index (n-1)//2) over masked entries."""
    big = jnp.where(mask, x, jnp.inf)
    s = jnp.sort(big)
    n = jnp.sum(mask)
    idx = jnp.maximum(n - 1, 0) // 2
    return s[idx]


def event_pyramid_loss(
    gt_lo: jnp.ndarray,
    pred: jnp.ndarray,
    kernel_sizes: Tuple[int, ...],
    kernel_weights: Tuple[float, ...],
) -> jnp.ndarray:
    """raw L2 + sum_k w_k * L2(blur_k(gt), blur_k(pred)). The reference's
    ``unblurred_weight`` scales only the LOGGED unblurred entry, not the
    optimized loss (src/Tracker.py:204-220)."""
    loss = jnp.sum((gt_lo - pred) ** 2)
    for k, w in zip(kernel_sizes, kernel_weights):
        loss = loss + w * jnp.sum(
            (gaussian_blur(gt_lo, k) - gaussian_blur(pred, k)) ** 2
        )
    return loss


def _tracking_loss(
    cam_tensor: jnp.ndarray,
    decoders,
    grids,
    eventnet,
    bound: jnp.ndarray,
    key: jax.Array,
    gt_color: jnp.ndarray,
    gt_depth: jnp.ndarray,
    gt_event_lo: jnp.ndarray,
    prev_color_lo: jnp.ndarray,
    gt_depth_lo_flat: jnp.ndarray,
    gt_mask_lo: jnp.ndarray,
    cfg: TrackerConfig,
    cam: Camera,
    settings: RenderSettings,
    rgbd: bool,
    event: bool,
    dp=None,
):
    """One iteration's losses as a function of the camera tensor. ``dp``
    (static NamedSharding or None) shards every ray batch row-wise across
    the device mesh — rendering is embarrassingly parallel over rays, so
    GSPMD turns the loss/pose-gradient reductions into one psum over dp."""
    c2w = pose_matrix_from_tensor(cam_tensor)
    aux: Dict[str, jnp.ndarray] = {}
    total = jnp.zeros(())

    if rgbd:
        He, We = cfg.ignore_edge_h, cfg.ignore_edge_w
        rays_o, rays_d, b_depth, b_color = get_samples(
            key, He, cam.H - He, We, cam.W - We, cfg.pixels,
            cam.fx, cam.fy, cam.cx, cam.cy, c2w, gt_depth, gt_color,
        )
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

        depth, var, color = render_rays(
            decoders, grids, rays_o, rays_d, bound, "color", settings,
            gt_depth=b_depth,
        )
        var = jax.lax.stop_gradient(var)
        tmp = jnp.abs(b_depth - depth) / jnp.sqrt(var + 1e-10)
        if cfg.handle_dynamic:
            med = masked_median(jax.lax.stop_gradient(tmp), inside)
            mask = (jax.lax.stop_gradient(tmp) < 10 * med) & (b_depth > 0) & inside
        else:
            mask = (b_depth > 0) & inside

        loss_rgbd = jnp.sum(tmp * mask)
        if cfg.use_color:
            loss_rgbd = loss_rgbd + cfg.w_color_loss * jnp.sum(
                jnp.abs(b_color - color) * mask[:, None]
            )
        aux["rgbd"] = loss_rgbd
        total = total + loss_rgbd

    if event:
        lo_h, lo_w = prev_color_lo.shape[:2]
        rays_o, rays_d = get_rays_rescale(
            cam.H, cam.W, lo_h, lo_w, cam.fx, cam.fy, cam.cx, cam.cy, c2w
        )
        _, _, cur_color_lo = render_rays(
            decoders, grids,
            constrain_dp(rays_o.reshape(-1, 3), dp),
            constrain_dp(rays_d.reshape(-1, 3), dp),
            bound, "color", settings,
            gt_depth=constrain_dp(gt_depth_lo_flat, dp),
        )
        cur_color_lo = cur_color_lo.reshape(lo_h, lo_w, 3)
        if cfg.predictor == "esim":
            ev, mp = esim_predict(prev_color_lo, cur_color_lo, cfg.esim_gain)
            pred_event, mask_pred = ev, mp[None]
        else:
            pred_event, mask_pred = inference_event(
                eventnet, prev_color_lo, cur_color_lo
            )
        # prediction-quality telemetry for the divergence guard
        # (pipeline._event_guard, extension — the reference runs the net
        # unconditionally with no health signal, src/Tracker.py:129-157):
        # Pearson correlation of the (stop-gradient) prediction against the
        # GT events, plus the GT event energy so the guard can skip
        # event-free frames where the correlation is undefined
        p = jax.lax.stop_gradient(pred_event).ravel()
        g = gt_event_lo.ravel()
        pc = p - jnp.mean(p)
        gc = g - jnp.mean(g)
        aux["event_corr"] = jnp.sum(pc * gc) / jnp.sqrt(
            jnp.sum(pc * pc) * jnp.sum(gc * gc) + 1e-12
        )
        aux["event_gt_energy"] = jnp.sum(g * g)
        # event-existence mask cross-entropy — computed and LOGGED but never
        # backpropagated, exactly like the reference ("not used, just for
        # reference", src/Tracker.py:222-224; its CE runs on the already-
        # sigmoided mask head, reproduced verbatim)
        logsm = jax.nn.log_softmax(jax.lax.stop_gradient(mask_pred[0]), axis=-1)
        aux["mask"] = -jnp.mean(
            gt_mask_lo * logsm[..., 1] + (1.0 - gt_mask_lo) * logsm[..., 0]
        )
        if cfg.blur:
            loss_event = event_pyramid_loss(
                gt_event_lo, pred_event, cfg.kernel_sizes, cfg.kernel_weights
            )
        else:
            loss_event = jnp.sum((gt_event_lo - pred_event) ** 2)
        loss_event = loss_event * cfg.balancer
        aux["event"] = loss_event
        if cfg.activate_events == "non_rgbd":
            if not rgbd:
                total = total + loss_event
        elif cfg.activate_events:
            total = total + loss_event

    return total, aux


def initial_pose_tensor(
    pre_c2w: jnp.ndarray,
    pre_pre_c2w: jnp.ndarray,
    const_speed: bool,
) -> jnp.ndarray:
    """Constant-speed pose extrapolation, on device (reference
    src/Tracker.py:316-324 did this per frame on the CPU via mathutils)."""
    if const_speed:
        delta = pre_c2w @ jnp.linalg.inv(pre_pre_c2w)
        est_c2w = delta @ pre_c2w
    else:
        est_c2w = pre_c2w
    return tensor_from_pose_matrix(est_c2w[:3])


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "cam", "settings", "rgbd", "event", "const_speed",
                     "calibrate", "dp"),
)
def track_frame_jit(
    pre_c2w: jnp.ndarray,
    pre_pre_c2w: jnp.ndarray,
    decoders,
    grids,
    eventnet,
    bound: jnp.ndarray,
    base_key: jax.Array,
    gt_color: jnp.ndarray,
    gt_depth: jnp.ndarray,
    gt_event_lo: jnp.ndarray,
    prev_color_lo: jnp.ndarray,
    gt_depth_lo_flat: jnp.ndarray,
    gt_mask_lo: jnp.ndarray,
    bias_in: jnp.ndarray,
    bias_scale: jnp.ndarray,
    cfg: TrackerConfig,
    cam: Camera,
    settings: RenderSettings,
    rgbd: bool,
    event: bool,
    const_speed: bool,
    calibrate: bool = False,
    dp=None,
):
    """Full per-frame tracking: pose init by constant-speed extrapolation
    (reference src/Tracker.py:316-324) followed by ``cfg.iters`` Adam steps —
    all on device, so the host never has to fetch a pose mid-sequence (each
    fetch over the remote-device link costs ~30 ms of round-trip latency).

    ``calibrate`` (RGB-D-anchored frames, event.bias_correction): after the
    anchored pose is selected, an event-only probe optimization measures the
    event basin's offset from it; on event-only frames the caller passes the
    measured bias (zeros until one exists, so the subtraction is a traced
    no-op rather than a recompile-forcing static branch) and
    ``bias_in * bias_scale`` is subtracted from the winning pose tensor.

    Returns (best_cam_tensor, best_c2w [4, 4], per-iter loss dict,
    bias_out [7])."""
    init_cam_tensor = initial_pose_tensor(pre_c2w, pre_pre_c2w, const_speed)
    if cfg.separate_lr:
        lr_vec = jnp.concatenate(
            [jnp.full((4,), cfg.lr * 0.2), jnp.full((3,), cfg.lr)]
        )
    else:
        lr_vec = jnp.full((7,), cfg.lr)

    if settings.fused_decode and settings.nice:
        # pack the frozen map snapshot once; every iteration's decode then
        # needs a single gather per grid family
        from evennicer_slam_tpu.models.decoders import pack_grids_for_tracking

        grids = pack_grids_for_tracking(grids)

    loss_fn = functools.partial(
        _tracking_loss,
        decoders=decoders,
        grids=grids,
        eventnet=eventnet,
        bound=bound,
        gt_color=gt_color,
        gt_depth=gt_depth,
        gt_event_lo=gt_event_lo,
        prev_color_lo=prev_color_lo,
        gt_depth_lo_flat=gt_depth_lo_flat,
        gt_mask_lo=gt_mask_lo,
        cfg=cfg,
        cam=cam,
        settings=settings,
        rgbd=rgbd,
        event=event,
        dp=dp,
    )
    grad_fn = jax.value_and_grad(
        lambda ct, key: loss_fn(ct, key=key), has_aux=True
    )

    adam0 = adam_init(init_cam_tensor)

    def step(carry, it):
        cam_t, adam_state, best_loss, best_cam = carry
        key = jax.random.fold_in(base_key, it)
        (_, aux), g = grad_fn(cam_t, key)
        new_cam, adam_state = adam_update(g, adam_state, cam_t, lr_vec)
        # criterion: event loss when the event branch runs (it is always
        # available), else the RGB-D loss (vanilla NICE-SLAM behavior).
        # best_pose_criterion="rgbd" overrides on RGB-D frames (quirk knob).
        if event and (cfg.best_pose_criterion == "event" or not rgbd):
            crit = aux["event"]
        else:
            crit = aux["rgbd"]
        better = crit < best_loss
        best_loss = jnp.where(better, crit, best_loss)
        # reference stores the post-step tensor for a pre-step loss
        best_cam = jnp.where(better, new_cam, best_cam)
        out = {k: v for k, v in aux.items()}
        return (new_cam, adam_state, best_loss, best_cam), out

    init = (init_cam_tensor, adam0, jnp.asarray(jnp.inf), init_cam_tensor)
    (final_cam, _, _, best_cam), losses = jax.lax.scan(
        step, init, jnp.arange(cfg.iters)
    )

    bias_out = jnp.zeros((7,), jnp.float32)
    if calibrate and event:
        # event-only probe from the anchored pose: where does the event
        # basin pull a pose that RGB-D says is right? That offset is the
        # systematic bias to subtract on event-only frames.
        ev_loss_fn = functools.partial(
            _tracking_loss,
            decoders=decoders, grids=grids, eventnet=eventnet, bound=bound,
            gt_color=gt_color, gt_depth=gt_depth, gt_event_lo=gt_event_lo,
            prev_color_lo=prev_color_lo, gt_depth_lo_flat=gt_depth_lo_flat,
            gt_mask_lo=gt_mask_lo,
            cfg=cfg._replace(activate_events=True), cam=cam,
            settings=settings, rgbd=False, event=True, dp=dp,
        )
        ev_grad_fn = jax.value_and_grad(
            lambda ct, key: ev_loss_fn(ct, key=key), has_aux=True
        )

        def ev_step(carry, it):
            cam_t, adam_state, best_loss, best = carry
            key = jax.random.fold_in(base_key, 1000 + it)
            (_, aux), g = ev_grad_fn(cam_t, key)
            new_cam, adam_state = adam_update(g, adam_state, cam_t, lr_vec)
            better = aux["event"] < best_loss
            best_loss = jnp.where(better, aux["event"], best_loss)
            best = jnp.where(better, new_cam, best)
            return (new_cam, adam_state, best_loss, best), aux["event"]

        (_, _, _, ev_best), _ = jax.lax.scan(
            ev_step,
            (best_cam, adam_init(best_cam), jnp.asarray(jnp.inf), best_cam),
            jnp.arange(cfg.iters),
        )
        bias_out = ev_best - best_cam

    if event:
        best_cam = best_cam - bias_in * bias_scale

    best_c2w = jnp.concatenate(
        [
            pose_matrix_from_tensor(best_cam),
            jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32),
        ],
        axis=0,
    )
    return best_cam, best_c2w, losses, bias_out


@functools.partial(jax.jit, static_argnames=("lo_hw", "prev_resize"))
def _prep_event_inputs(gt_event_integrate, gt_event, pre_gt_color, gt_depth,
                       lo_hw, prev_resize="nearest"):
    """Fused per-frame event preprocessing (integration + resizes). The
    existence mask is the CURRENT frame's (any polarity nonzero — the
    dataset-level mask of src/utils/datasets.py:189-191), nearest-resized
    like the reference's gt_mask (src/Tracker.py:139-140). The PREVIOUS
    color defaults to the same NEAREST transform the reference applies
    (src/Tracker.py:136,148 — the bilinear alternative is commented out
    there); ``event.prev_resize: bilinear`` opts into the antialiased
    variant (see TrackerConfig.prev_resize). The depth rescale is always
    bilinear, matching render_img_rescale (src/utils/Renderer.py:290)."""
    acc = gt_event_integrate + gt_event
    gt_event_lo = resize_nearest(acc, lo_hw)
    prev_fn = resize_nearest if prev_resize == "nearest" else resize_bilinear
    prev_color_lo = prev_fn(pre_gt_color, lo_hw)
    gt_depth_lo_flat = resize_bilinear(gt_depth, lo_hw).reshape(-1)
    mask = jnp.any(gt_event != 0, axis=-1).astype(jnp.float32)
    gt_mask_lo = resize_nearest(mask, lo_hw)
    return acc, gt_event_lo, prev_color_lo, gt_depth_lo_flat, gt_mask_lo


class Tracker:
    """Host-side tracking driver: motion model, event integration, frame
    loop bookkeeping. All math happens in track_frame_jit."""

    def __init__(
        self,
        cfg: TrackerConfig,
        cam: Camera,
        settings: RenderSettings,
        bound: np.ndarray,
        eventnet: Optional[Dict] = None,
        dp=None,
    ):
        self.cfg = cfg
        self.dp = dp
        self.cam = cam
        self.settings = settings
        self.bound = jnp.asarray(bound, jnp.float32)
        self.eventnet = eventnet if eventnet is not None else {}
        lo_h = int(cam.H * cfg.scale_factor)
        lo_w = int(cam.W * cfg.scale_factor)
        self.lo_hw = (lo_h, lo_w)
        self.pre_gt_color: Optional[jnp.ndarray] = None
        self.gt_event_integrate: Optional[jnp.ndarray] = None
        self.handoff_event_integrate: Optional[jnp.ndarray] = None
        self.handoff_idx: int = -1
        self.last_losses: Dict[str, jnp.ndarray] = {}
        # event-bias self-calibration state (device 7-vector, see
        # TrackerConfig.bias_correction)
        self.event_bias: Optional[jnp.ndarray] = None

    def consume_event_handoff(self, idx: int) -> Optional[jnp.ndarray]:
        """The event integral handed off at window boundary ``idx``, or None
        if none/stale (an out-of-cadence mapping call must re-integrate its
        own window rather than reuse an older boundary's integral). Consuming
        clears the handoff so it can never be read twice."""
        if self.handoff_event_integrate is None or self.handoff_idx != idx:
            return None
        out = self.handoff_event_integrate
        self.handoff_event_integrate = None
        return out

    def reset_event_integration(self, shape):
        self.gt_event_integrate = jnp.zeros(shape, jnp.float32)

    def track(
        self,
        idx: int,
        gt_color: jnp.ndarray,
        gt_depth: jnp.ndarray,
        gt_event: jnp.ndarray,
        pre_c2w,
        pre_pre_c2w,
        decoders,
        grids,
        seed: int = 0,
    ) -> jnp.ndarray:
        """Track one frame; returns the refined 4x4 c2w as a DEVICE array.

        The whole call is asynchronous: pose init, optimization, and best-pose
        selection run on device; nothing here blocks on device results, so the
        host can immediately move on to dispatching the next frame's work."""
        cfg = self.cfg
        event = cfg.use_events
        rgbd = (not event) or (idx % cfg.rgbd_every_frame == 0)

        if event:
            if self.gt_event_integrate is None:
                self.gt_event_integrate = jnp.zeros_like(gt_event)
            (self.gt_event_integrate, gt_event_lo, prev_color_lo,
             gt_depth_lo_flat, gt_mask_lo) = _prep_event_inputs(
                self.gt_event_integrate, gt_event, self.pre_gt_color, gt_depth,
                self.lo_hw, self.cfg.prev_resize,
            )
        else:
            lo_h, lo_w = self.lo_hw
            gt_event_lo = jnp.zeros((lo_h, lo_w, 2))
            prev_color_lo = jnp.zeros((lo_h, lo_w, 3))
            gt_depth_lo_flat = jnp.zeros((lo_h * lo_w,))
            gt_mask_lo = jnp.zeros((lo_h, lo_w))

        const_speed = bool(self.cfg.const_speed and pre_pre_c2w is not None)
        pre_c2w = jnp.asarray(pre_c2w)
        pre_pre_c2w = (
            jnp.asarray(pre_pre_c2w) if pre_pre_c2w is not None
            else jnp.eye(4, dtype=jnp.float32)
        )
        calibrate = bool(cfg.bias_correction and event and rgbd and idx > 0)
        apply_bias = bool(
            cfg.bias_correction and event and not rgbd
            and self.event_bias is not None
        )
        if apply_bias and cfg.bias_scale_mode == "window":
            scale = (idx % cfg.rgbd_every_frame) / cfg.rgbd_every_frame
        else:
            scale = 1.0
        scale *= cfg.bias_alpha
        bias_in = (
            self.event_bias if apply_bias else jnp.zeros((7,), jnp.float32)
        )
        best_cam, c2w, losses, bias_out = track_frame_jit(
            pre_c2w,
            pre_pre_c2w,
            decoders,
            grids,
            self.eventnet,
            self.bound,
            jax.random.PRNGKey(seed),
            gt_color,
            gt_depth,
            gt_event_lo,
            prev_color_lo,
            gt_depth_lo_flat,
            gt_mask_lo,
            bias_in,
            jnp.asarray(scale, jnp.float32),
            cfg,
            self.cam,
            self.settings,
            rgbd,
            event,
            const_speed,
            calibrate,
            self.dp,
        )
        self.last_losses = losses
        if calibrate:
            if cfg.bias_ema > 0 and self.event_bias is not None:
                self.event_bias = (
                    cfg.bias_ema * self.event_bias
                    + (1.0 - cfg.bias_ema) * bias_out
                )
            else:
                self.event_bias = bias_out
        return c2w

    def end_of_window(self, idx: int, gt_color: jnp.ndarray, every_frame: int):
        """At RGB-D boundaries, snapshot prev color + hand the event integral
        to the mapper, then reset it (reference src/Tracker.py:462-466). The
        handoff stays a device array — it is only ever consumed on device."""
        if idx % every_frame == 0:
            self.pre_gt_color = gt_color
            if self.gt_event_integrate is not None:
                self.handoff_event_integrate = self.gt_event_integrate
                self.handoff_idx = idx
                self.gt_event_integrate = jnp.zeros_like(self.gt_event_integrate)
