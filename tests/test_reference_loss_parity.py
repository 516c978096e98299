"""Golden loss parity: the ACTUAL reference loss functions vs ours on
identical random tensors (values and valid-rates). Complements the model
forward parity tests — together they pin the training objective exactly.

The reference is imported read-only with its CUDA/torchvision/skimage/
gitpython dependencies neutralized; tests skip if unavailable.
"""
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from crossloc_tpu import geometry as geo
from crossloc_tpu import losses

REF_PATH = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    torch = pytest.importorskip("torch")
    import os

    if not os.path.isdir(REF_PATH):
        pytest.skip("reference repo not mounted")
    torch.Tensor.cuda = lambda self, *a, **k: self
    stub_names = [
        "git", "transforms3d", "transforms3d.quaternions", "skimage", "skimage.io",
        "skimage.color", "skimage.transform", "torchvision", "torchvision.transforms",
    ]
    for name in stub_names:
        sys.modules.setdefault(name, types.ModuleType(name))
    tq = sys.modules["transforms3d.quaternions"]
    tq.mat2quat = tq.quat2mat = lambda *a: None
    sys.modules["skimage"].io = sys.modules["skimage.io"]
    sys.modules["skimage"].color = sys.modules["skimage.color"]
    st = sys.modules["skimage.transform"]
    st.rotate = st.resize = lambda *a, **k: None
    tv = sys.modules["torchvision.transforms"]
    for attr in ("Compose", "ToPILImage", "Resize", "Grayscale", "ToTensor",
                 "Normalize", "ColorJitter"):
        setattr(tv, attr, lambda *a, **k: None)
    tv.functional = types.SimpleNamespace(rotate=lambda *a, **k: None)
    sys.modules["torchvision"].transforms = tv
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)

    import loss.coord as ref_coord
    import loss.depth as ref_depth
    import loss.normal as ref_normal
    import loss.semantics as ref_semantics
    import utils.learning as ref_learning

    return types.SimpleNamespace(
        coord=ref_coord, depth=ref_depth, normal=ref_normal,
        semantics=ref_semantics, learning=ref_learning, torch=torch,
    )


B, H, W = 2, 6, 9
FOCAL, IMG_W, IMG_H = 120.0, W * 8, H * 8


def _nchw(t):
    return np.transpose(t, (0, 3, 1, 2)).copy()


class TestCoordLossParity:
    def _data(self, rng, nodata_frac=0.2):
        off = np.asarray([0, 0, 40], np.float32)
        pred = (rng.normal(size=(B, H, W, 3)) * 30).astype(np.float32) + off
        gt = (rng.normal(size=(B, H, W, 3)) * 30).astype(np.float32) + off
        mask = rng.uniform(size=(B, H, W)) < nodata_frac
        gt[mask] = -1.0
        poses = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
        poses[:, 2, 3] = 50.0
        return pred, gt, poses

    @pytest.mark.parametrize("uncertainty", [None, "MLE"])
    def test_matches_reference(self, ref, rng, uncertainty):
        torch = ref.torch
        pred, gt, poses = self._data(rng)
        unc = np.abs(rng.normal(size=(B, H, W, 1)).astype(np.float32)) + 0.5

        cam = ref.coord.get_cam_mat(IMG_W, IMG_H, FOCAL)
        grid = ref.learning.get_pixel_grid(8)
        ref_loss, ref_rate = ref.coord.scene_coords_regression_loss(
            0.1, 100.0, 1000.0, 50.0, uncertainty, grid, -1, cam,
            torch.from_numpy(_nchw(pred)),
            torch.from_numpy(_nchw(unc)) if uncertainty else None,
            torch.from_numpy(poses.copy()), torch.from_numpy(_nchw(gt)), "mean",
        )

        K = geo.intrinsics(FOCAL, IMG_W, IMG_H)
        ours, rate = losses.scene_coords_loss(
            jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(poses), K,
            uncertainty_map=jnp.asarray(unc) if uncertainty else None,
        )
        np.testing.assert_allclose(float(ours), float(ref_loss), rtol=2e-4)
        np.testing.assert_allclose(float(rate), float(ref_rate), atol=1e-6)

    def test_reduction_none(self, ref, rng):
        torch = ref.torch
        pred, gt, poses = self._data(rng)
        cam = ref.coord.get_cam_mat(IMG_W, IMG_H, FOCAL)
        grid = ref.learning.get_pixel_grid(8)
        ref_loss, _ = ref.coord.scene_coords_regression_loss(
            0.1, 100.0, 1000.0, 50.0, None, grid, -1, cam,
            torch.from_numpy(_nchw(pred)), None,
            torch.from_numpy(poses.copy()), torch.from_numpy(_nchw(gt)), None,
        )
        K = geo.intrinsics(FOCAL, IMG_W, IMG_H)
        ours, _ = losses.scene_coords_loss(
            jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(poses), K, reduction=None
        )
        np.testing.assert_allclose(np.asarray(ours), ref_loss.numpy(), rtol=2e-4)


class TestDepthLossParity:
    @pytest.mark.parametrize("uncertainty", [None, "MLE"])
    def test_matches_reference(self, ref, rng, uncertainty):
        torch = ref.torch
        pred = np.abs(rng.normal(size=(B, H, W, 1)).astype(np.float32)) * 50
        gt = np.abs(rng.normal(size=(B, H, W, 1)).astype(np.float32)) * 50
        gt[rng.uniform(size=(B, H, W, 1)) < 0.15] = -1.0
        unc = np.abs(rng.normal(size=(B, H, W, 1)).astype(np.float32)) + 0.5

        ref_loss, ref_rate = ref.depth.depth_regression_loss(
            0.1, 10.0, uncertainty, -1,
            torch.from_numpy(_nchw(pred)),
            torch.from_numpy(_nchw(unc)) if uncertainty else None,
            torch.from_numpy(_nchw(gt)), "mean",
        )
        ours, rate = losses.depth_loss(
            jnp.asarray(pred), jnp.asarray(gt),
            uncertainty_map=jnp.asarray(unc) if uncertainty else None,
        )
        np.testing.assert_allclose(float(ours), float(ref_loss), rtol=2e-4)
        np.testing.assert_allclose(float(rate), float(ref_rate), atol=1e-6)


class TestNormalLossParity:
    @pytest.mark.parametrize("uncertainty", [None, "MLE"])
    def test_matches_reference(self, ref, rng, uncertainty):
        torch = ref.torch
        logits = rng.normal(size=(B, H, W, 2)).astype(np.float32)
        xyz = rng.normal(size=(B, H, W, 3)).astype(np.float32)
        xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
        xyz[rng.uniform(size=(B, H, W)) < 0.15] = -1.0
        unc = np.abs(rng.normal(size=(B, H, W, 1)).astype(np.float32)) + 0.5

        ref_loss, ref_rate = ref.normal.normal_regression_loss(
            10.0, uncertainty, -1,
            torch.from_numpy(_nchw(logits)),
            torch.from_numpy(_nchw(unc)) if uncertainty else None,
            torch.from_numpy(_nchw(xyz)), "mean",
        )
        ours, rate = losses.normal_loss(
            jnp.asarray(logits), jnp.asarray(xyz),
            uncertainty_map=jnp.asarray(unc) if uncertainty else None,
        )
        np.testing.assert_allclose(float(ours), float(ref_loss), rtol=2e-4)
        np.testing.assert_allclose(float(rate), float(ref_rate), atol=1e-6)


class TestSemanticsLossParity:
    def test_matches_reference(self, ref, rng):
        torch = ref.torch
        logits = rng.normal(size=(B, H, W, 6)).astype(np.float32)
        labels = rng.integers(0, 6, size=(B, H, W))

        criterion = ref.semantics.CrossEntropyLoss2d()
        ref_loss, ref_rate = ref.semantics.semantics_classification_loss(
            None, torch.from_numpy(_nchw(logits)), None,
            torch.from_numpy(labels[:, None].astype(np.float32)), criterion, "mean",
        )
        ours, rate = losses.semantics_loss(jnp.asarray(logits), jnp.asarray(labels))
        np.testing.assert_allclose(float(ours), float(ref_loss), rtol=2e-4)
        np.testing.assert_allclose(float(rate), float(ref_rate), atol=1e-6)
