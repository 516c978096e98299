"""Host-side dataset over the CrossLoc directory contract.

Directory layout parity with `dataloader/dataloader.py:232-247`:

    <root>/rgb/           images (png/jpg), sorted by name
    <root>/poses/         4x4 cam-to-world text matrices
    <root>/calibration/   focal length scalars (text)
    <root>/init/          scene-coordinate tensors [3, h, w]   (mode 1 sparse)
    <root>/depth/         depth tensors [h, w] or mm-PNGs      (labels / mode 1 dense)
    <root>/normal/        surface-normal tensors [3, h, w]
    <root>/semantics/     raw-id label arrays [H, W] (.npy)
    <root>/eye/           camera-coordinate tensors             (mode 2)

Modes (ctor semantics of `CamLocDataset`, `dataloader/dataloader.py:96-105`):
0 = RGB only; 1 = RGB + ground truth (sparse tensors, or dense generated
from a depth map); 2 = RGB-D eye coordinates. Multiple roots concatenate
(`:225-231`). Label tensors may be torch `.pt` / `.npy` / `.npz`.

This layer only does I/O and static per-image prep (resize to the standard
height, focal rescale); ALL augmentation runs on device (data/augment.py) —
the TPU-native replacement for the reference's multiprocess DataLoader
workers + `batch_resize` collate.
"""
from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Union

import numpy as np

from ..losses.semantics import trim_semantic_label

IMAGE_HEIGHT = 480  # standard input height (`dataloader/dataloader.py:115`)
OUTPUT_SUBSAMPLE = 8

# per-scene normalization statistics (`dataloader/dataloader.py:171-201`;
# urbanscape stats are used for both scenes in the reference)
RGB_MEAN = np.array([0.4245, 0.4375, 0.3836], np.float32)
RGB_STD = np.array([0.1823, 0.1701, 0.1854], np.float32)
GRAY_MEAN = np.array([0.4308], np.float32)
GRAY_STD = np.array([0.1724], np.float32)


def _load_image(path: str) -> np.ndarray:
    """Decode to float32 RGB [H, W, 3] in [0, 1]; gray->RGB, RGBA->RGB
    (`dataloader/dataloader.py:310-316`). PIL fallback path; the fast path
    goes through the native C++ decoder (see `_load_image_resized`)."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        arr = np.asarray(im, dtype=np.float32) / 255.0
    return arr


def _load_image_resized(path: str, image_height: int):
    """(image [image_height, W', 3] float32, f_scale) — native C++ decode +
    resize when available (GIL-free under the thread-pool loader), PIL
    otherwise."""
    from .. import native

    if native.available():
        dims = native.image_dims(path)
        if dims is not None:
            h, w = dims
            img = native.load_image_std_height(path, image_height)
            if img is not None:
                return img, image_height / h
    img = _load_image(path)
    f_scale = image_height / img.shape[0]
    return _resize_height(img, image_height), f_scale


def _resize_height(img: np.ndarray, height: int) -> np.ndarray:
    """Resize keeping aspect ratio so that the image height == height."""
    from PIL import Image

    h, w = img.shape[:2]
    if h == height:
        return img
    new_w = int(round(w * height / h))
    im = Image.fromarray((img * 255.0).astype(np.uint8))
    im = im.resize((new_w, height), Image.BILINEAR)
    return np.asarray(im, dtype=np.float32) / 255.0


def _load_tensor(path: str) -> np.ndarray:
    """Load a label tensor saved as torch .pt, .npy or .npz."""
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".npz"):
        with np.load(path) as z:
            return z[list(z.keys())[0]]
    import torch

    t = torch.load(path, map_location="cpu", weights_only=False)
    return t.numpy() if hasattr(t, "numpy") else np.asarray(t)


def _listdir_sorted(d: str) -> List[str]:
    return [os.path.join(d, f) for f in sorted(os.listdir(d))]


@dataclass
class CamLocItem:
    """One datapoint: image + pose + labels, all numpy, channels-last."""

    image: np.ndarray  # [480, W, 3] float32 in [0, 1] (pre-normalization)
    pose: np.ndarray  # [4, 4] cam-to-world
    focal: float  # rescaled to the standard image height
    file_name: str
    coord: Optional[np.ndarray] = None  # [h, w, 3]
    depth: Optional[np.ndarray] = None  # [h, w, 1]
    normal: Optional[np.ndarray] = None  # [h, w, 3]
    semantics: Optional[np.ndarray] = None  # [H, W] int (trimmed ids)
    eye: Optional[np.ndarray] = None  # [h, w, 3] camera coords


class CamLocDataset:
    """Sequence-style dataset mirroring `CamLocDataset` capabilities."""

    def __init__(
        self,
        root_dir: Union[str, Sequence[str]],
        mode: int = 1,
        sparse: bool = True,
        coord: bool = True,
        depth: bool = False,
        normal: bool = False,
        semantics: bool = False,
        grayscale: bool = False,
        raw_image: bool = False,
        image_height: int = IMAGE_HEIGHT,
    ):
        self.mode = mode
        self.sparse = sparse
        self.grayscale = grayscale and not raw_image
        self.raw_image = raw_image
        self.image_height = image_height
        self.want = {
            "coord": coord and mode == 1 and sparse,
            "depth": depth and mode == 1 and sparse,
            "normal": normal and mode == 1 and sparse,
            "semantics": semantics and mode == 1 and sparse,
        }
        if mode == 1 and sparse and not any(self.want.values()):
            raise ValueError("at least one label flag must be set in mode 1")

        roots = [root_dir] if isinstance(root_dir, (str, os.PathLike)) else list(root_dir)
        self.rgb_files: List[str] = []
        self.pose_files: List[str] = []
        self.calib_files: List[str] = []
        self.coord_files: List[str] = []
        self.depth_files: List[str] = []
        self.normal_files: List[str] = []
        self.semantics_files: List[str] = []

        for base in roots:
            self.rgb_files += _listdir_sorted(os.path.join(base, "rgb"))
            self.pose_files += _listdir_sorted(os.path.join(base, "poses"))
            self.calib_files += _listdir_sorted(os.path.join(base, "calibration"))
            if mode == 2:
                self.coord_files += _listdir_sorted(os.path.join(base, "eye"))
            elif mode == 1 and sparse:
                if self.want["coord"]:
                    self.coord_files += _listdir_sorted(os.path.join(base, "init"))
                if self.want["depth"]:
                    self.depth_files += _listdir_sorted(os.path.join(base, "depth"))
                if self.want["normal"]:
                    self.normal_files += _listdir_sorted(os.path.join(base, "normal"))
                if self.want["semantics"]:
                    self.semantics_files += _listdir_sorted(os.path.join(base, "semantics"))
            elif mode == 1:
                # dense: generate coords from a depth map (`:339-342,444-486`)
                self.coord_files += _listdir_sorted(os.path.join(base, "depth"))

        if len(self.rgb_files) != len(self.pose_files):
            raise ValueError("RGB file count does not match pose file count")

    def __len__(self) -> int:
        return len(self.rgb_files)

    def _chw_to_hwc(self, t: np.ndarray) -> np.ndarray:
        if t.ndim == 2:
            return t[..., None].astype(np.float32)
        return np.transpose(t, (1, 2, 0)).astype(np.float32)

    def __getitem__(self, idx: int) -> CamLocItem:
        img, f_scale = _load_image_resized(self.rgb_files[idx], self.image_height)
        focal = float(np.loadtxt(self.calib_files[idx])) * f_scale
        pose = np.loadtxt(self.pose_files[idx]).astype(np.float32)

        item = CamLocItem(
            image=img, pose=pose, focal=focal, file_name=self.rgb_files[idx]
        )

        if self.mode == 2:
            item.eye = self._chw_to_hwc(_load_tensor(self.coord_files[idx]))
        elif self.mode == 1 and self.sparse:
            if self.want["coord"]:
                item.coord = self._chw_to_hwc(_load_tensor(self.coord_files[idx]))
            if self.want["depth"]:
                item.depth = self._chw_to_hwc(_load_tensor(self.depth_files[idx]))
            if self.want["normal"]:
                item.normal = self._chw_to_hwc(_load_tensor(self.normal_files[idx]))
            if self.want["semantics"]:
                raw = _load_tensor(self.semantics_files[idx]).astype(np.int64)
                item.semantics = trim_semantic_label(raw)
        elif self.mode == 1:
            item.coord = self._dense_coords_from_depth(idx, img, pose, focal)
        return item

    def _dense_coords_from_depth(self, idx, img, pose, focal) -> np.ndarray:
        """Generate scene coordinates by backprojecting a depth PNG through
        the cam-to-world pose (`dataloader/dataloader.py:444-486`): subsample
        by 8 with half-pixel offset, pinhole backprojection, zero where
        depth==0 or depth>1000."""
        import imageio.v2 as imageio

        depth = imageio.imread(self.coord_files[idx]).astype(np.float64) / 1000.0  # mm->m
        # resize (nearest) to the standard image size before subsampling
        H, W = img.shape[:2]
        if depth.shape != (H, W):
            ys = (np.arange(H) * depth.shape[0] / H).astype(int)
            xs = (np.arange(W) * depth.shape[1] / W).astype(int)
            depth = depth[ys][:, xs]

        off = OUTPUT_SUBSAMPLE // 2
        d = depth[off::OUTPUT_SUBSAMPLE, off::OUTPUT_SUBSAMPLE]
        h, w = d.shape
        xs = np.arange(w) * OUTPUT_SUBSAMPLE + off
        ys = np.arange(h) * OUTPUT_SUBSAMPLE + off
        gx, gy = np.meshgrid(xs, ys)
        x = (gx - W / 2.0) / focal * d
        y = (gy - H / 2.0) / focal * d
        eye = np.stack([x, y, d, np.ones_like(d)], axis=-1)  # [h, w, 4]
        sc = eye.reshape(-1, 4) @ pose.T
        sc = sc.reshape(h, w, 4)[..., 0:3]
        invalid = (d == 0) | (d > 1000)
        sc[invalid] = 0.0
        out = np.zeros((math.ceil(H / OUTPUT_SUBSAMPLE), math.ceil(W / OUTPUT_SUBSAMPLE), 3))
        out[:h, :w] = sc
        return out.astype(np.float32)

    # -- batching ---------------------------------------------------------

    def collate(self, indices: Sequence[int]) -> dict:
        """Stack raw items into a host batch dict (numpy, NHWC)."""
        items = [self[i] for i in indices]
        batch = {
            "image": np.stack([it.image for it in items]),
            "pose": np.stack([it.pose for it in items]),
            "focal": np.asarray([it.focal for it in items], np.float32),
            "file_name": [it.file_name for it in items],
        }
        for key in ("coord", "depth", "normal", "eye"):
            vals = [getattr(it, key) for it in items]
            if vals[0] is not None:
                batch[key] = np.stack(vals)
        if items[0].semantics is not None:
            batch["semantics"] = np.stack([it.semantics for it in items])
        return batch
