"""Dataset readers for all nine input families the reference supports
(reference src/utils/datasets.py:47-619):

    replica, replica_event, rpg, rpg_event, rpg_event_dense,
    azure, scannet, cofusion, tumrgbd

This layer is host-side numpy/cv2 (the reference used torch tensors on GPU;
here frames are numpy and the SLAM pipeline transfers them to TPU once per
frame). Every reader yields a uniform :class:`Frame` record — non-event
datasets carry all-zero event channels so the pipeline is shape-uniform.

Pose conventions copied from the reference: y/z camera axes are flipped
(c2w[:, 1:3] *= -1), translations scaled by the global ``scale``.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import cv2
import numpy as np


@dataclass
class Frame:
    """One input frame: RGB-D (+ optional event channels)."""

    index: int
    color: np.ndarray            # [H, W, 3] float32 in [0, 1]
    depth: np.ndarray            # [H, W] float32 (scaled)
    event: np.ndarray            # [H, W, 2] float32, polarity order [-, +]
    event_mask: np.ndarray       # [H, W] int32 (any polarity nonzero)
    c2w: np.ndarray              # [4, 4] float32 camera-to-world


def readEXR_onlydepth(filename: str) -> np.ndarray:
    """Y-channel depth from an EXR file (CoFusion). Tries OpenEXR, falls back
    to cv2's EXR codec (reference src/utils/datasets.py:12-44)."""
    try:
        import Imath
        import OpenEXR as exr

        exrfile = exr.InputFile(filename)
        header = exrfile.header()
        dw = header["dataWindow"]
        isize = (dw.max.y - dw.min.y + 1, dw.max.x - dw.min.x + 1)
        C = exrfile.channel("Y", Imath.PixelType(Imath.PixelType.FLOAT))
        return np.frombuffer(C, dtype=np.float32).reshape(isize)
    except ImportError:
        img = cv2.imread(filename, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
        if img is not None:
            if img.ndim == 3:
                img = img[..., 0]
            return img.astype(np.float32)
        # cv2 built without the EXR codec: use the bundled minimal reader
        from evennicer_slam_tpu.data.exr import read_exr

        chans = read_exr(filename)
        for key in ("Y", "Z", "R"):
            if key in chans:
                return chans[key]
        return next(iter(chans.values()))


def as_intrinsics_matrix(intrinsics) -> np.ndarray:
    K = np.eye(3)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = intrinsics
    return K


def _flip_yz(c2w: np.ndarray) -> np.ndarray:
    c2w = c2w.copy()
    c2w[:3, 1] *= -1
    c2w[:3, 2] *= -1
    return c2w


class BaseDataset:
    """Shared preprocessing: BGR->RGB /255, depth/png_depth_scale*scale,
    optional undistortion, crop_size resize, crop_edge crop
    (reference src/utils/datasets.py:51-113)."""

    has_events = False

    def __init__(self, cfg, args=None, scale: float = 1.0, device=None):
        self.name = cfg["dataset"]
        self.scale = scale
        self.png_depth_scale = cfg["cam"]["png_depth_scale"]
        cam = cfg["cam"]
        self.H, self.W = cam["H"], cam["W"]
        self.fx, self.fy, self.cx, self.cy = cam["fx"], cam["fy"], cam["cx"], cam["cy"]
        self.distortion = (
            np.array(cam["distortion"]) if "distortion" in cam else None
        )
        self.crop_size = cam.get("crop_size")
        self.crop_edge = cam["crop_edge"]
        input_folder = getattr(args, "input_folder", None) if args else None
        self.input_folder = input_folder or cfg["data"]["input_folder"]
        self.color_paths: List[str] = []
        self.depth_paths: List[str] = []
        self.poses: List[np.ndarray] = []
        self.n_img = 0

    def __len__(self):
        return self.n_img

    # -- shared pieces ------------------------------------------------------

    def _read_color(self, path: str, grayscale: bool = False) -> np.ndarray:
        if grayscale:
            data = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
            data = cv2.cvtColor(data, cv2.COLOR_GRAY2BGR)
        else:
            data = cv2.imread(path)
        if data is None:
            raise IOError(f"cannot read color image {path}")
        if self.distortion is not None:
            K = as_intrinsics_matrix([self.fx, self.fy, self.cx, self.cy])
            data = cv2.undistort(data, K, self.distortion)
        data = cv2.cvtColor(data, cv2.COLOR_BGR2RGB)
        return data.astype(np.float64) / 255.0

    def _read_depth(self, path: str) -> np.ndarray:
        if path.endswith(".exr"):
            depth = readEXR_onlydepth(path)
        else:
            depth = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if depth is None:
                raise IOError(f"cannot read depth image {path}")
        return depth.astype(np.float32) / self.png_depth_scale

    def _postprocess(self, color, depth, event=None):
        H, W = depth.shape
        color = cv2.resize(color, (W, H))
        depth = depth * self.scale
        if event is not None:
            event = cv2.resize(event, (W, H))
        if self.crop_size is not None:
            ch, cw = self.crop_size
            # reference uses F.interpolate bilinear align_corners=True for
            # color/event and nearest for depth (datasets.py:97-104)
            color = _interp_align_corners(color, (ch, cw))
            depth = _interp_nearest(depth, (ch, cw))
            if event is not None:
                event = _interp_align_corners(event, (ch, cw))
        edge = self.crop_edge
        if edge > 0:
            color = color[edge:-edge, edge:-edge]
            depth = depth[edge:-edge, edge:-edge]
            if event is not None:
                event = event[edge:-edge, edge:-edge]
        return color.astype(np.float32), depth.astype(np.float32), (
            None if event is None else event.astype(np.float32)
        )

    def _pose(self, index: int) -> np.ndarray:
        pose = self.poses[index].copy()
        pose[:3, 3] *= self.scale
        return pose.astype(np.float32)

    def __getitem__(self, index: int) -> Frame:
        color = self._read_color(self.color_paths[index])
        depth = self._read_depth(self.depth_paths[index])
        color, depth, _ = self._postprocess(color, depth)
        event = np.zeros((*depth.shape, 2), np.float32)
        mask = np.zeros(depth.shape, np.int32)
        return Frame(index, color, depth, event, mask, self._pose(index))


def _interp_align_corners(img: np.ndarray, out_hw):
    """Bilinear resize with align_corners=True (reference crop_size path)."""
    H, W = img.shape[:2]
    oh, ow = out_hw
    ys = np.linspace(0, H - 1, oh)
    xs = np.linspace(0, W - 1, ow)
    xg, yg = np.meshgrid(xs, ys)
    return cv2.remap(
        img.astype(np.float32), xg.astype(np.float32), yg.astype(np.float32),
        interpolation=cv2.INTER_LINEAR,
    )


def _interp_nearest(img: np.ndarray, out_hw):
    H, W = img.shape[:2]
    oh, ow = out_hw
    ri = np.floor(np.arange(oh) * (H / oh)).astype(np.int64)
    ci = np.floor(np.arange(ow) * (W / ow)).astype(np.int64)
    return img[ri][:, ci]


def _load_traj_txt(path: str, n: int) -> List[np.ndarray]:
    """Replica/RPG-style traj.txt: 16 floats per line, y/z flipped."""
    poses = []
    with open(path) as f:
        lines = f.readlines()
    for i in range(n):
        c2w = np.array(list(map(float, lines[i].split()))).reshape(4, 4)
        poses.append(_flip_yz(c2w).astype(np.float32))
    return poses


class Replica(BaseDataset):
    def __init__(self, cfg, args=None, scale=1.0, device=None):
        super().__init__(cfg, args, scale, device)
        self.color_paths = sorted(glob.glob(f"{self.input_folder}/results/frame*.jpg"))
        if not self.color_paths:  # synthetic fixtures use png
            self.color_paths = sorted(glob.glob(f"{self.input_folder}/results/frame*.png"))
        self.depth_paths = sorted(glob.glob(f"{self.input_folder}/results/depth*.png"))
        self.n_img = len(self.color_paths)
        self.poses = _load_traj_txt(f"{self.input_folder}/traj.txt", self.n_img)


class ReplicaEvent(Replica):
    """Replica + ESIM ground-truth event PNGs (reference Replica_event,
    datasets.py:139-216). Event PNG channel layout after BGR->RGB is
    [0, -, +]; channels 1: are kept -> polarity order [-, +]. Frame 0 gets an
    all-black event image."""

    has_events = True

    def __init__(self, cfg, args=None, scale=1.0, device=None):
        super().__init__(cfg, args, scale, device)
        event_folder = getattr(args, "event_folder", None) if args else None
        self.event_folder = event_folder or cfg["data"]["event_folder"]
        self.event_paths = sorted(glob.glob(f"{self.event_folder}/*frame*.png"))
        self.n_event = len(self.event_paths)
        assert self.n_event == self.n_img - 1, (
            "Number of GT events does not match that of GT images!"
        )

    def _read_event(self, index: int, like_shape) -> np.ndarray:
        if index - 1 >= 0:
            data = cv2.imread(self.event_paths[index - 1]).astype(np.float64)
            if self.distortion is not None:
                K = as_intrinsics_matrix([self.fx, self.fy, self.cx, self.cy])
                data = cv2.undistort(data, K, self.distortion)
        else:
            data = np.zeros(like_shape, np.float64)
        return cv2.cvtColor(data.astype(np.float32), cv2.COLOR_BGR2RGB)

    def __getitem__(self, index: int) -> Frame:
        color = self._read_color(self.color_paths[index])
        depth = self._read_depth(self.depth_paths[index])
        event = self._read_event(index, color.shape)
        color, depth, event = self._postprocess(color, depth, event)
        event = event[:, :, 1:]  # [-, +]
        mask = (np.any(event != 0, axis=-1)).astype(np.int32)
        return Frame(index, color, depth, event, mask, self._pose(index))


class RPG(BaseDataset):
    def __init__(self, cfg, args=None, scale=1.0, device=None):
        super().__init__(cfg, args, scale, device)
        self.color_paths = sorted(glob.glob(f"{self.input_folder}/results/frame*"))
        self.depth_paths = sorted(glob.glob(f"{self.input_folder}/results/depth*"))
        self.n_img = len(self.color_paths)
        self.poses = _load_traj_txt(f"{self.input_folder}/traj.txt", self.n_img)

    def __getitem__(self, index: int) -> Frame:
        color = self._read_color(self.color_paths[index], grayscale=True)
        depth = self._read_depth(self.depth_paths[index])
        color, depth, _ = self._postprocess(color, depth)
        event = np.zeros((*depth.shape, 2), np.float32)
        mask = np.zeros(depth.shape, np.int32)
        return Frame(index, color, depth, event, mask, self._pose(index))


class RPGEvent(RPG):
    """RPG grayscale frames + event PNGs; event channels arrive as [+, -, 0]
    and are swapped to [-, +] (reference RPG_event, datasets.py:242-319)."""

    has_events = True

    def __init__(self, cfg, args=None, scale=1.0, device=None):
        super().__init__(cfg, args, scale, device)
        event_folder = getattr(args, "event_folder", None) if args else None
        self.event_folder = event_folder or cfg["data"]["event_folder"]
        self.event_paths = sorted(glob.glob(f"{self.event_folder}/*.png"))
        self.n_event = len(self.event_paths)
        assert self.n_event == self.n_img - 1, (
            "Number of GT events does not match that of GT images!"
        )

    def _read_event(self, event_index: int, like_shape) -> np.ndarray:
        if event_index >= 0:
            data = cv2.imread(self.event_paths[event_index]).astype(np.float64)
            if self.distortion is not None:
                K = as_intrinsics_matrix([self.fx, self.fy, self.cx, self.cy])
                data = cv2.undistort(data, K, self.distortion)
        else:
            data = np.zeros(like_shape, np.float64)
        return cv2.cvtColor(data.astype(np.float32), cv2.COLOR_BGR2RGB)

    def __getitem__(self, index: int) -> Frame:
        color = self._read_color(self.color_paths[index], grayscale=True)
        depth = self._read_depth(self.depth_paths[index])
        event = self._read_event(index - 1, color.shape)
        color, depth, event = self._postprocess(color, depth, event)
        event = event[:, :, :-1][:, :, ::-1].copy()  # [+, -] -> [-, +]
        mask = (np.any(event != 0, axis=-1)).astype(np.int32)
        return Frame(index, color, depth, event, mask, self._pose(index))


class RPGEventDense(RPGEvent):
    """Densified event frames: ``density`` event frames per RGB frame, poses
    from ``traj_density{d}.txt``; RGB/depth only meaningful when
    ``index % density == 0`` (reference RPG_event_dense, datasets.py:321-423)."""

    has_events = True

    def __init__(self, cfg, args=None, scale=1.0, device=None):
        # skip RPGEvent init (different count assertion); call RPG's
        RPG.__init__(self, cfg, args, scale, device)
        event_folder = getattr(args, "event_folder", None) if args else None
        self.event_folder = event_folder or cfg["data"]["event_folder"]
        self.event_paths = sorted(glob.glob(f"{self.event_folder}/*.png"))
        self.density = cfg["data"]["density"]
        self.n_event = len(self.event_paths)
        assert self.n_event == self.n_img * self.density - self.density, (
            "Number of GT events does not match that of GT images!"
        )
        traj_path = f"{self.input_folder}/traj_density{self.density}.txt"
        self.poses = _load_traj_txt(traj_path, self.n_event + 1)

    def __len__(self):
        return self.n_event + 1

    def __getitem__(self, index: int) -> Frame:
        color = self._read_color(self.color_paths[index // self.density], grayscale=True)
        depth = self._read_depth(self.depth_paths[index // self.density])
        event = self._read_event(index - 1, color.shape)
        color, depth, event = self._postprocess(color, depth, event)
        event = event[:, :, :-1][:, :, ::-1].copy()
        mask = (np.any(event != 0, axis=-1)).astype(np.int32)
        return Frame(index, color, depth, event, mask, self._pose(index))


class Azure(BaseDataset):
    def __init__(self, cfg, args=None, scale=1.0, device=None):
        super().__init__(cfg, args, scale, device)
        self.color_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "color", "*.jpg"))
        )
        self.depth_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "depth", "*.png"))
        )
        self.n_img = len(self.color_paths)
        self._load_poses(os.path.join(self.input_folder, "scene", "trajectory.log"))

    def _load_poses(self, path):
        self.poses = []
        if os.path.exists(path):
            with open(path) as f:
                content = f.readlines()
            for i in range(0, len(content), 5):
                c2w = np.array(
                    list(map(float, ("".join(content[i + 1 : i + 5])).strip().split()))
                ).reshape(4, 4)
                self.poses.append(_flip_yz(c2w).astype(np.float32))
        else:
            self.poses = [np.eye(4, dtype=np.float32) for _ in range(self.n_img)]


class ScanNet(BaseDataset):
    def __init__(self, cfg, args=None, scale=1.0, device=None):
        super().__init__(cfg, args, scale, device)
        self.input_folder = os.path.join(self.input_folder, "frames")
        by_num = lambda x: int(os.path.basename(x)[:-4])
        self.color_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "color", "*.jpg")), key=by_num
        )
        self.depth_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "depth", "*.png")), key=by_num
        )
        self._load_poses(os.path.join(self.input_folder, "pose"))
        self.n_img = len(self.color_paths)

    def _load_poses(self, path):
        self.poses = []
        pose_paths = sorted(
            glob.glob(os.path.join(path, "*.txt")),
            key=lambda x: int(os.path.basename(x)[:-4]),
        )
        for pose_path in pose_paths:
            mat = np.loadtxt(pose_path).reshape(4, 4)
            self.poses.append(_flip_yz(mat).astype(np.float32))


class CoFusion(BaseDataset):
    def __init__(self, cfg, args=None, scale=1.0, device=None):
        super().__init__(cfg, args, scale, device)
        self.color_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "colour", "*.png"))
        )
        self.depth_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "depth_noise", "*.exr"))
        )
        self.n_img = len(self.color_paths)
        # reference provides identity poses (ATE is alignment-invariant)
        self.poses = [np.eye(4, dtype=np.float32) for _ in range(self.n_img)]


class TUMRGBD(BaseDataset):
    """TUM RGB-D: timestamp association of rgb/depth/groundtruth, first-pose
    normalization (reference TUM_RGBD, datasets.py:519-606)."""

    def __init__(self, cfg, args=None, scale=1.0, device=None):
        super().__init__(cfg, args, scale, device)
        self.color_paths, self.depth_paths, self.poses = self._loadtum(
            self.input_folder, frame_rate=32
        )
        self.n_img = len(self.color_paths)

    @staticmethod
    def _parse_list(filepath, skiprows=0):
        return np.loadtxt(filepath, delimiter=" ", dtype=np.str_, skiprows=skiprows)

    @staticmethod
    def _associate(t_img, t_depth, t_pose, max_dt=0.08):
        associations = []
        for i, t in enumerate(t_img):
            j = np.argmin(np.abs(t_depth - t))
            k = np.argmin(np.abs(t_pose - t))
            if np.abs(t_depth[j] - t) < max_dt and np.abs(t_pose[k] - t) < max_dt:
                associations.append((i, j, k))
        return associations

    def _loadtum(self, datapath, frame_rate=-1):
        if os.path.isfile(os.path.join(datapath, "groundtruth.txt")):
            pose_list = os.path.join(datapath, "groundtruth.txt")
        else:
            pose_list = os.path.join(datapath, "pose.txt")
        image_data = self._parse_list(os.path.join(datapath, "rgb.txt"))
        depth_data = self._parse_list(os.path.join(datapath, "depth.txt"))
        pose_data = self._parse_list(pose_list, skiprows=1)
        pose_vecs = pose_data[:, 1:].astype(np.float64)

        t_img = image_data[:, 0].astype(np.float64)
        t_depth = depth_data[:, 0].astype(np.float64)
        t_pose = pose_data[:, 0].astype(np.float64)
        associations = self._associate(t_img, t_depth, t_pose)

        indices = [0]
        for i in range(1, len(associations)):
            t0 = t_img[associations[indices[-1]][0]]
            t1 = t_img[associations[i][0]]
            if t1 - t0 > 1.0 / frame_rate:
                indices.append(i)

        images, depths, poses = [], [], []
        inv_pose = None
        for ix in indices:
            (i, j, k) = associations[ix]
            images.append(os.path.join(datapath, str(image_data[i, 1])))
            depths.append(os.path.join(datapath, str(depth_data[j, 1])))
            c2w = self._pose_from_quat(pose_vecs[k])
            if inv_pose is None:
                inv_pose = np.linalg.inv(c2w)
                c2w = np.eye(4)
            else:
                c2w = inv_pose @ c2w
            poses.append(_flip_yz(c2w).astype(np.float32))
        return images, depths, poses

    @staticmethod
    def _pose_from_quat(pvec):
        from scipy.spatial.transform import Rotation

        pose = np.eye(4)
        pose[:3, :3] = Rotation.from_quat(pvec[3:]).as_matrix()
        pose[:3, 3] = pvec[:3]
        return pose


dataset_dict: Dict[str, type] = {
    "replica": Replica,
    "replica_event": ReplicaEvent,
    "rpg": RPG,
    "rpg_event": RPGEvent,
    "rpg_event_dense": RPGEventDense,
    "azure": Azure,
    "scannet": ScanNet,
    "cofusion": CoFusion,
    "tumrgbd": TUMRGBD,
}


def get_dataset(cfg, args=None, scale: float = 1.0, device=None) -> BaseDataset:
    return dataset_dict[cfg["dataset"]](cfg, args, scale, device=device)
