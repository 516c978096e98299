"""Tests for the dsacstar plugin-API shim (torch tensors in/out)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import crossloc_tpu.compat.dsacstar_shim as dsacstar
from crossloc_tpu import geometry as geo

torch = pytest.importorskip("torch")

IMG_H, IMG_W, FOCAL, HS, WS = 480, 720, 500.0, 30, 45


def synth_nchw(rng):
    import sys

    sys.path.insert(0, str(__file__).rsplit("/", 1)[0])
    from test_ransac import synth_scene

    coords, gt = synth_scene(rng, B=1)
    nchw = torch.from_numpy(np.transpose(np.asarray(coords), (0, 3, 1, 2)).copy())
    return nchw, np.asarray(gt[0])


class TestShim:
    def test_forward_rgb_api(self, rng):
        nchw, gt = synth_nchw(rng)
        out_pose = torch.zeros((4, 4))
        ret = dsacstar.forward_rgb(
            nchw, out_pose, 64, 10.0, FOCAL, IMG_W / 2.0, IMG_H / 2.0, 100.0, 100.0, 8
        )
        assert ret == 0
        est = out_pose.numpy()
        t_err = np.linalg.norm(est[0:3, 3] - gt[0:3, 3])
        r_err = float(geo.rotation_angle_deg(jnp.asarray(est[0:3, 0:3]), jnp.asarray(gt[0:3, 0:3])))
        assert t_err < 0.5 and r_err < 0.3

    def test_backward_rgb_loss_and_grads(self, rng):
        nchw, gt = synth_nchw(rng)
        nchw = nchw + torch.randn_like(nchw) * 0.5
        grads = torch.zeros_like(nchw)
        loss = dsacstar.backward_rgb(
            nchw, grads, torch.from_numpy(gt.copy()), 16, 10.0, FOCAL,
            IMG_W / 2.0, IMG_H / 2.0, 1.0, 1.0, 100.0, 100.0, 100.0, 8, 42,
        )
        assert np.isfinite(loss) and loss < 50.0
        g = grads.numpy()
        assert np.all(np.isfinite(g)) and np.abs(g).sum() > 0

    def test_forward_rgbd_api(self, rng):
        nchw, gt = synth_nchw(rng)
        w2c = np.asarray(geo.invert_se3(jnp.asarray(gt)))
        coords = nchw.numpy()[0].transpose(1, 2, 0)
        eye = coords @ w2c[:3, :3].T + w2c[:3, 3]
        eye_nchw = torch.from_numpy(np.transpose(eye[None], (0, 3, 1, 2)).copy())
        out_pose = torch.zeros((4, 4))
        dsacstar.forward_rgbd(nchw, eye_nchw, out_pose, 64, 10.0, 100.0, 100.0)
        est = out_pose.numpy()
        assert np.linalg.norm(est[0:3, 3] - gt[0:3, 3]) < 0.1

    def test_backward_rgbd_api(self, rng):
        nchw, gt = synth_nchw(rng)
        w2c = np.asarray(geo.invert_se3(jnp.asarray(gt)))
        coords = nchw.numpy()[0].transpose(1, 2, 0)
        eye = coords @ w2c[:3, :3].T + w2c[:3, 3]
        eye_nchw = torch.from_numpy(np.transpose(eye[None], (0, 3, 1, 2)).copy())
        noisy = nchw + torch.randn_like(nchw) * 0.3
        grads = torch.zeros_like(nchw)
        loss = dsacstar.backward_rgbd(
            noisy, eye_nchw, grads, torch.from_numpy(gt.copy()), 16, 10.0,
            1.0, 1.0, 100.0, 100.0, 100.0, 7,
        )
        assert np.isfinite(loss)
        assert np.all(np.isfinite(grads.numpy()))
