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


def synth_sample(
    rng: np.random.Generator,
    img_h: int = 480,
    img_w: int = 720,
    focal: float = 480.0,
    subsample: int = 8,
    scene_offset=(0.0, 0.0, 0.0),
):
    """One synthetic frame: exact geometry from a random cam-to-world pose.

    Returns dict with image [H, W, 3] in [0, 1], pose [4, 4], focal, and
    dense labels: coord [h, w, 3], depth [h, w, 1], normal [h, w, 3] (unit,
    world frame), semantics [H, W] raw ids.
    """
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


def write_fake_dataset(
    root: str,
    n: int = 4,
    img_h: int = 96,
    img_w: int = 144,
    focal: float = 120.0,
    seed: int = 0,
    fullsize: bool = False,
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
                         subsample=1 if fullsize else 8)
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
