"""Oracle parity vs the ACTUAL reference C++ pose solver.

Builds the reference `dsacstar` plugin CPU-only (`dsacstar/setup.py:28-38`,
patched for OpenCV >= 4: the CvMat/cvCalcMatMulDeriv C API in
`dsacstar_util_rgbd.h:221-222` became cv::matMulDeriv) from a scratch copy,
feeds IDENTICAL scene-coordinate maps to `dsacstar.forward_rgb` and to
`ransac.solve_batch`, and asserts the median pose errors agree within
RANSAC stochasticity — the BASELINE.md fidelity criterion, measured against
the reference itself rather than a cv2 stand-in.

Skips gracefully when the reference tree, OpenCV dev headers, or the
toolchain are absent. The built module is cached under ~/.cache so the
~2 min build happens once per machine.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crossloc_tpu import geometry as geo
from crossloc_tpu import ransac
from crossloc_tpu.compat.plugin_oracle import PluginUnavailable, load_plugin


@pytest.fixture(scope="module")
def dsacstar_mod():
    try:
        return load_plugin()
    except PluginUnavailable as e:
        pytest.skip(str(e))


IMG_H, IMG_W, FOCAL, HS, WS = 480, 720, 500.0, 60, 90


def _frames(rng, n, noise=1.0, outlier=0.2):
    K = np.asarray(geo.intrinsics(FOCAL, IMG_W, IMG_H))
    grid = np.asarray(geo.pixel_grid(HS, WS, 8)).reshape(-1, 2)
    N = grid.shape[0]
    for _ in range(n):
        R = np.asarray(geo.rodrigues(jnp.asarray(rng.normal(size=3) * 0.6)))
        t = rng.normal(size=3) * 20 + np.array([0, 0, 100.0])
        depth = rng.uniform(30.0, 300.0, size=N)
        cam = np.asarray(geo.backproject(jnp.asarray(grid), jnp.asarray(depth), jnp.asarray(K)))
        world = cam @ R.T + t + rng.normal(size=(N, 3)) * noise
        sel = rng.choice(N, int(N * outlier), replace=False)
        world[sel] += rng.uniform(-200, 200, size=(len(sel), 3))
        gt = np.eye(4)
        gt[:3, :3] = R
        gt[:3, 3] = t
        yield world.reshape(HS, WS, 3).astype(np.float32), gt


def _pose_err(est4, gt4):
    t_err = float(np.linalg.norm(est4[:3, 3] - gt4[:3, 3]))
    r_err = float(geo.rotation_angle_deg(jnp.asarray(est4[:3, :3]), jnp.asarray(gt4[:3, :3])))
    return t_err, r_err


class TestReferencePluginParity:
    def test_forward_rgb_median_parity(self, dsacstar_mod):
        """Identical noisy GT-oracle inputs through both solvers; our medians
        must be within the 32-frame sampling envelope of the plugin's, and
        both must actually localize (sub-meter at 100 m scene depth). Ours
        solves all frames in ONE batched call — the TPU-native shape of the
        pipeline.

        Tolerance derivation (round 4, tools/plugin_ab.py --frames 32
        --seeds 10 --platform cpu): per-seed ours/plugin median ratios are
        t: mean 0.814, sigma 0.079 -> mean+3sigma = 1.05;
        r: mean 0.776, sigma 0.104 -> mean+3sigma = 1.09.
        Guards of 1.06x/1.10x therefore pass any draw consistent with the
        measured population (this fixed-seed test sits at 0.89x/0.71x) while
        a real solver regression past the plugin cannot land green — the old
        1.25x guard allowed a 56% blind spot (VERDICT r3 #8)."""
        import torch

        n = 32
        rng = np.random.default_rng(11)
        frames = list(_frames(rng, n))
        t_ref, r_ref = [], []
        for coords, gt in frames:
            sc = torch.from_numpy(coords.transpose(2, 0, 1)[None])
            out_pose = torch.zeros((4, 4))
            dsacstar_mod.forward_rgb(
                sc, out_pose, 64, 10.0, FOCAL, IMG_W / 2.0, IMG_H / 2.0,
                100.0, 100.0, 8,
            )
            te, re_ = _pose_err(out_pose.numpy(), gt)
            t_ref.append(te)
            r_ref.append(re_)

        batch = jnp.asarray(np.stack([c for c, _ in frames]))
        res = ransac.solve_batch(batch, FOCAL, (IMG_H, IMG_W), jax.random.PRNGKey(11))
        t_ours, r_ours = [], []
        for i, (_, gt) in enumerate(frames):
            te, re_ = _pose_err(np.asarray(res.cam_to_world[i]), gt)
            t_ours.append(te)
            r_ours.append(re_)

        mt_ref, mt_ours = np.median(t_ref), np.median(t_ours)
        mr_ref, mr_ours = np.median(r_ref), np.median(r_ours)
        print(f"\nreference plugin: median t={mt_ref:.3f} m r={mr_ref:.3f} deg")
        print(f"this framework:   median t={mt_ours:.3f} m r={mr_ours:.3f} deg")
        assert mt_ours < 1.0 and mt_ref < 1.0, (mt_ours, mt_ref)
        assert mt_ours < 1.06 * mt_ref + 0.02, f"ours {mt_ours} vs ref {mt_ref}"
        assert mr_ours < 1.10 * mr_ref + 0.02, f"ours {mr_ours} vs ref {mr_ref}"

    def test_forward_rgb_exact_coords(self, dsacstar_mod):
        """Exact scene coordinates: both solvers recover the pose almost
        perfectly on clean input."""
        import torch

        rng = np.random.default_rng(3)
        coords, gt = next(_frames(rng, 1, noise=0.0, outlier=0.0))
        sc = torch.from_numpy(coords.transpose(2, 0, 1)[None])
        out_pose = torch.zeros((4, 4))
        dsacstar_mod.forward_rgb(
            sc, out_pose, 64, 10.0, FOCAL, IMG_W / 2.0, IMG_H / 2.0, 100.0, 100.0, 8
        )
        te, re_ = _pose_err(out_pose.numpy(), gt)
        assert te < 0.05 and re_ < 0.05, (te, re_)

        res = ransac.solve_batch(jnp.asarray(coords[None]), FOCAL, (IMG_H, IMG_W),
                                 jax.random.PRNGKey(0))
        te, re_ = _pose_err(np.asarray(res.cam_to_world[0]), gt)
        assert te < 0.05 and re_ < 0.05, (te, re_)
