"""Synthetic scene generation + on-disk fake dataset (test fixture).

SURVEY.md §4: the reference ships no datasets and no tests; the synthetic
scene (random pose -> exact dense scene-coordinate / depth / normal /
semantic maps) is the framework's dataset-free ground truth. It exercises
the directory contract of `CamLocDataset` (`dataloader/dataloader.py:232-247`)
end to end, and backs the GT-oracle solver/integration tests.
"""
from __future__ import annotations

import os
import numpy as np

from .. import geometry as geo

import jax.numpy as jnp


# The plane world is centered on the reference's hard-coded urbanscape
# coordinate mean ([-29.34, 184.17, 91.96], `utils/learning.py:84-174` /
# data/means.py): the train CLI initializes the decoder's output offset from
# that constant, so a scene living elsewhere would start with a ~hundreds-of-
# units output bias that Adam (per-param step ~ lr) cannot traverse in a
# short run.
_PLANE_Z = 91.96
_PLANE_CX, _PLANE_CY = -29.34, 184.17
_SEM_IDS = np.array([0, 1, 2, 3, 6, 9, 17], np.int64)


def _plane_texture(x, y):
    """Deterministic smooth RGB texture over the world plane.

    Per-channel sinusoid mixtures: the lowest frequency component is
    non-repeating over the scene footprint (appearance encodes absolute
    position), higher components add local detail. This is what makes the
    "plane" scene LEARNABLE: a conv net can regress pixel -> world
    coordinate from appearance alone and generalize to unseen poses —
    unlike the "noise" scene, where learning is pure memorization.
    """
    x = x - _PLANE_CX
    y = y - _PLANE_CY

    def mix(ramp, waves):
        v = 0.5 + 0.3 * ramp / 240.0
        v = v + sum(w * np.sin(fx * x + fy * y + p) for fx, fy, p, w in waves)
        return np.clip(v, 0.0, 1.0).astype(np.float32)

    # per-channel linear ramps give an unambiguous global position signal;
    # two sinusoid octaves per channel add local detail the conv stack can
    # sharpen the estimate with
    r = mix(x, [(0.031, -0.017, 1.3, 0.1), (0.11, 0.07, 0.5, 0.08),
                (0.23, -0.19, 2.1, 0.06)])
    g = mix(y, [(0.019, 0.027, 2.9, 0.1), (-0.083, 0.099, 1.9, 0.08),
                (0.17, 0.29, 0.2, 0.06)])
    b = mix(0.7 * (x - y), [(-0.029, 0.013, 0.4, 0.1),
                            (0.093, 0.061, 2.6, 0.08),
                            (-0.27, 0.15, 1.1, 0.06)])
    return np.stack([r, g, b], axis=-1)


def _plane_raycast(R, t, K, us, vs):
    """Intersect camera rays through pixel centers (us, vs) with the world
    plane z = _PLANE_Z. Returns (world [N, 3], zdepth [N])."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    dirs = np.stack([(us - cx) / fx, (vs - cy) / fy, np.ones_like(us)], axis=-1)
    rd = dirs @ R.T
    z = (_PLANE_Z - t[2]) / rd[..., 2]
    world = t + z[..., None] * rd
    return world.astype(np.float32), z.astype(np.float32)


def synth_sample(
    rng: np.random.Generator,
    img_h: int = 480,
    img_w: int = 720,
    focal: float = 480.0,
    subsample: int = 8,
    scene_offset=(0.0, 0.0, 0.0),
    scene: str = "noise",
):
    """One synthetic frame: exact geometry from a random cam-to-world pose.

    Returns dict with image [H, W, 3] in [0, 1], pose [4, 4], focal, and
    dense labels: coord [h, w, 3], depth [h, w, 1], normal [h, w, 3] (unit,
    world frame), semantics [H, W] raw ids.

    scene="noise" (default): random per-cell depth, random-texture image —
    exact GT for solver/loss oracles, but the image carries no learnable
    signal. scene="plane": a fixed textured world plane (z = 200) rendered
    from a random pose — image content is a deterministic function of
    world geometry, so a network trained on some poses generalizes to
    held-out poses (the TPU convergence run's dataset, VERDICT r4 item 1).
    """
    if scene == "plane":
        return _synth_plane_sample(rng, img_h, img_w, focal, subsample)
    if scene != "noise":
        raise ValueError(f"unknown scene kind {scene!r}")
    h, w = img_h // subsample, img_w // subsample
    rvec = rng.normal(size=3) * 0.5
    R = np.asarray(geo.rodrigues(jnp.asarray(rvec)))
    t = rng.normal(size=3) * 20 + np.array([0, 0, 120.0])
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R
    pose[:3, 3] = t

    K = np.asarray(geo.intrinsics(focal, img_w, img_h))
    grid = np.asarray(geo.pixel_grid(h, w, subsample)).reshape(-1, 2)
    depth = rng.uniform(40.0, 300.0, size=grid.shape[0]).astype(np.float32)
    cam_pts = np.asarray(geo.backproject(jnp.asarray(grid), jnp.asarray(depth), jnp.asarray(K)))
    world = (cam_pts @ R.T + t).astype(np.float32)

    normal_w = rng.normal(size=(grid.shape[0], 3))
    normal_w /= np.linalg.norm(normal_w, axis=-1, keepdims=True)

    sem_raw = rng.choice([0, 1, 2, 3, 6, 9, 17], size=(img_h, img_w)).astype(np.int64)
    image = rng.uniform(0, 1, size=(img_h, img_w, 3)).astype(np.float32)

    return {
        "image": image,
        "pose": pose,
        "focal": float(focal),
        "coord": world.reshape(h, w, 3),
        "depth": depth.reshape(h, w, 1),
        "normal": normal_w.reshape(h, w, 3).astype(np.float32),
        "semantics": sem_raw,
    }


def _synth_plane_sample(rng, img_h, img_w, focal, subsample):
    """Render one frame of the fixed plane world from a random pose."""
    rvec = rng.normal(size=3) * 0.1
    R = np.asarray(geo.rodrigues(jnp.asarray(rvec)))
    t = np.array([_PLANE_CX + rng.uniform(-30, 30),
                  _PLANE_CY + rng.uniform(-30, 30),
                  _PLANE_Z - rng.uniform(70, 110)], np.float64)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R
    pose[:3, 3] = t

    K = np.asarray(geo.intrinsics(focal, img_w, img_h), np.float64)

    # full-resolution image from the world texture
    uu, vv = np.meshgrid(np.arange(img_w) + 0.5, np.arange(img_h) + 0.5)
    world_full, _ = _plane_raycast(R, t, K, uu, vv)
    image = _plane_texture(world_full[..., 0], world_full[..., 1])

    # labels on the subsampled prediction grid (same centers as pixel_grid)
    h, w = img_h // subsample, img_w // subsample
    grid = np.asarray(geo.pixel_grid(h, w, subsample), np.float64)
    world, zdepth = _plane_raycast(R, t, K, grid[..., 0], grid[..., 1])

    normal_w = np.zeros((h, w, 3), np.float32)
    normal_w[..., 2] = -1.0  # plane normal faces the camera (-z world)

    sem_cell = (np.floor(world_full[..., 0] / 40.0)
                + np.floor(world_full[..., 1] / 40.0)).astype(np.int64)
    sem_raw = _SEM_IDS[np.abs(sem_cell) % len(_SEM_IDS)]

    return {
        "image": image,
        "pose": pose,
        "focal": float(focal),
        "coord": world.reshape(h, w, 3),
        "depth": zdepth.reshape(h, w, 1),
        "normal": normal_w,
        "semantics": sem_raw,
    }


def write_fake_dataset(
    root: str,
    n: int = 4,
    img_h: int = 96,
    img_w: int = 144,
    focal: float = 120.0,
    seed: int = 0,
    fullsize: bool = False,
    scene: str = "noise",
):
    """Write a directory tree following the reference dataset contract
    (rgb/ poses/ calibration/ init/ depth/ normal/ semantics/ eye/).

    `focal` may be a scalar or a sequence cycled per image (the reference
    dataset carries one calibration file per frame, so a section may mix
    calibrations — `utils/evaluation.py:161-172` evaluates per-image)."""
    import torch
    from PIL import Image

    rng = np.random.default_rng(seed)
    sub = ("rgb", "poses", "calibration", "init", "depth", "normal", "semantics", "eye")
    for d in sub:
        os.makedirs(os.path.join(root, d), exist_ok=True)

    focals = list(np.atleast_1d(np.asarray(focal, np.float64)))
    for i in range(n):
        s = synth_sample(rng, img_h, img_w, float(focals[i % len(focals)]),
                         subsample=1 if fullsize else 8, scene=scene)
        name = f"frame_{i:05d}"
        Image.fromarray((s["image"] * 255).astype(np.uint8)).save(
            os.path.join(root, "rgb", name + ".png")
        )
        np.savetxt(os.path.join(root, "poses", name + ".txt"), s["pose"])
        np.savetxt(os.path.join(root, "calibration", name + ".txt"), [s["focal"]])
        torch.save(
            torch.from_numpy(np.transpose(s["coord"], (2, 0, 1))),
            os.path.join(root, "init", name + ".pt"),
        )
        torch.save(
            torch.from_numpy(s["depth"][..., 0]), os.path.join(root, "depth", name + ".pt")
        )
        torch.save(
            torch.from_numpy(np.transpose(s["normal"], (2, 0, 1))),
            os.path.join(root, "normal", name + ".pt"),
        )
        np.save(os.path.join(root, "semantics", name + ".npy"), s["semantics"])
        w2c = np.asarray(geo.invert_se3(jnp.asarray(s["pose"])))
        eye = s["coord"] @ w2c[:3, :3].T + w2c[:3, 3]
        torch.save(
            torch.from_numpy(np.transpose(eye, (2, 0, 1))),
            os.path.join(root, "eye", name + ".pt"),
        )
    return root
