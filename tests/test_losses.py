"""Golden-value and property tests for the task losses (SURVEY.md §4 item 3)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crossloc_tpu import geometry as geo
from crossloc_tpu import losses


def make_perfect_scene(rng, B=2, H=6, W=9, focal=500.0, subsample=8):
    """Synthesize exact scene coordinates for random poses: backproject the
    prediction-grid pixels at random depths through a cam-to-world pose."""
    img_w, img_h = W * subsample, H * subsample
    K = np.asarray(geo.intrinsics(focal, img_w, img_h))
    grid = np.asarray(geo.pixel_grid(H, W, subsample)).reshape(-1, 2)

    poses, coords = [], []
    for _ in range(B):
        rvec = rng.normal(size=3) * 0.5
        R = np.asarray(geo.rodrigues(jnp.asarray(rvec)))
        t = rng.normal(size=3) * 5 + np.array([0, 0, 10.0])
        c2w = np.eye(4)
        c2w[:3, :3] = R
        c2w[:3, 3] = t
        depth = rng.uniform(5.0, 80.0, size=grid.shape[0])
        cam_pts = np.asarray(geo.backproject(jnp.asarray(grid), jnp.asarray(depth), jnp.asarray(K)))
        world = cam_pts @ R.T + t
        poses.append(c2w)
        coords.append(world.reshape(H, W, 3))
    return (
        jnp.asarray(np.stack(coords), dtype=jnp.float32),
        jnp.asarray(np.stack(poses), dtype=jnp.float32),
        jnp.asarray(K, dtype=jnp.float32),
    )


class TestCoordLoss:
    def test_perfect_prediction_near_zero(self, rng):
        coords, poses, K = make_perfect_scene(rng)
        loss, rate = losses.scene_coords_loss(coords, coords, poses, K)
        # only the reference's sqrt-branch epsilon constant remains (~3.2e-3/px)
        assert float(loss) < 0.01
        assert float(rate) == 1.0

    def test_mle_sigma_one_matches_no_unc_reproj_only(self, rng):
        coords, poses, K = make_perfect_scene(rng)
        unc = jnp.ones(coords.shape[:3] + (1,))
        loss, _ = losses.scene_coords_loss(coords, coords, poses, K, uncertainty_map=unc)
        # e=0 -> MLE term = 3*log(1) + eps = ~0; only reproj constant remains
        assert float(loss) < 0.01

    def test_mle_log_sigma_term(self, rng):
        coords, poses, K = make_perfect_scene(rng)
        sigma = np.e
        unc = jnp.full(coords.shape[:3] + (1,), sigma)
        loss, _ = losses.scene_coords_loss(coords, coords, poses, K, uncertainty_map=unc)
        # every pixel valid-gt: 3*log(e) = 3 per pixel (+ tiny e^2/2sigma^2 + reproj const)
        assert abs(float(loss) - 3.0) < 0.02

    def test_nodata_masks_regression_term(self, rng):
        # Note: the reference's reprojection term deliberately includes
        # nodata-gt pixels (`loss/coord.py:128-131` — valid_sc is not coupled
        # to the gt mask); only the 3D regression/MLE term is masked.
        coords, poses, K = make_perfect_scene(rng)
        gt = np.asarray(coords).copy()
        gt[:, 0, :, :] = -1.0  # first row nodata (pred there is still exact)
        loss, _ = losses.scene_coords_loss(coords, jnp.asarray(gt), poses, K)
        # reg_error vs the -1 sentinel is huge, but masked -> near zero loss
        assert float(loss) < 0.01

        # same 2m pred corruption hurts more when gt is valid than nodata
        bad = np.asarray(coords).copy()
        bad[:, 0, :, :] += 2.0
        loss_nodata, _ = losses.scene_coords_loss(jnp.asarray(bad), jnp.asarray(gt), poses, K)
        loss_valid, _ = losses.scene_coords_loss(jnp.asarray(bad), coords, poses, K)
        assert float(loss_valid) > float(loss_nodata)

    def test_translation_error_appears_in_loss(self, rng):
        coords, poses, K = make_perfect_scene(rng)
        shifted = coords + jnp.array([3.0, 0.0, 0.0])
        loss0, _ = losses.scene_coords_loss(coords, coords, poses, K)
        loss1, _ = losses.scene_coords_loss(shifted, coords, poses, K)
        assert float(loss1) > float(loss0) + 1.0  # ~3m regression error/px

    def test_reduction_none_matches_mean(self, rng):
        coords, poses, K = make_perfect_scene(rng)
        shifted = coords + 0.5
        lm, _ = losses.scene_coords_loss(shifted, coords, poses, K, reduction="mean")
        ln, _ = losses.scene_coords_loss(shifted, coords, poses, K, reduction=None)
        assert ln.shape == (coords.shape[0],)
        np.testing.assert_allclose(float(jnp.mean(ln)), float(lm), rtol=1e-5)

    def test_grad_finite(self, rng):
        coords, poses, K = make_perfect_scene(rng)
        f = lambda p: losses.scene_coords_loss(p, coords, poses, K)[0]
        g = jax.grad(f)(coords + 0.1)
        assert np.all(np.isfinite(np.asarray(g)))


class TestDepthLoss:
    def test_golden_small(self):
        pred = jnp.asarray([[2.0, 5.0, 0.05, 30.0]]).reshape(1, 1, 4, 1)
        gt = jnp.asarray([[2.5, 5.0, 1.0, -1.0]]).reshape(1, 1, 4, 1)
        loss, rate = losses.depth_loss(pred, gt)
        # valid-gt pixels: |2-2.5| + |5-5| + |0.05-1| = 1.45 over 4 px
        np.testing.assert_allclose(float(loss), 1.45 / 4, rtol=1e-6)
        # valid preds: px0 (err .5<=10, d>=.1), px1; px2 fails min_depth; px3 nodata
        np.testing.assert_allclose(float(rate), 2 / 4)

    def test_mle_formula(self):
        pred = jnp.full((1, 2, 2, 1), 4.0)
        gt = jnp.full((1, 2, 2, 1), 6.0)
        unc = jnp.full((1, 2, 2, 1), 2.0)
        loss, _ = losses.depth_loss(pred, gt, uncertainty_map=unc)
        expected = np.log(2.0) + 4.0 / (2 * 4.0)  # 1*log(s) + e^2/(2 s^2)
        np.testing.assert_allclose(float(loss), expected, rtol=1e-6)


class TestNormalLoss:
    def _logits_for_ae(self, ae):
        # invert logits_to_radian: sigmoid(x) = (ae/pi + 1)/2
        s = (ae / np.pi + 1.0) / 2.0
        return np.log(s / (1.0 - s))

    def test_perfect_prediction(self, rng):
        xyz = rng.normal(size=(2, 4, 5, 3))
        xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
        ae = np.asarray(losses.xyz2ae(jnp.asarray(xyz)))
        logits = self._logits_for_ae(ae)
        loss, rate = losses.normal_loss(jnp.asarray(logits), jnp.asarray(xyz))
        assert float(loss) < 1e-4
        assert float(rate) == 1.0

    def test_azimuth_circle_wraps(self):
        # gt azimuth +pi-0.1 vs pred -pi+0.1 -> circular distance 0.2, not 2pi-0.2
        gt_ae = np.array([np.pi - 0.1, 0.3])
        pred_ae = np.array([-np.pi + 0.1, 0.3])
        gt_xyz = np.asarray(losses.ae2xyz(jnp.asarray(gt_ae)))
        logits = self._logits_for_ae(pred_ae)
        loss, _ = losses.normal_loss(
            jnp.asarray(logits).reshape(1, 1, 1, 2), jnp.asarray(gt_xyz).reshape(1, 1, 1, 3)
        )
        np.testing.assert_allclose(float(loss), 2 * 0.2, atol=1e-3)

    def test_ae_xyz_round_trip(self, rng):
        xyz = rng.normal(size=(64, 3))
        xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
        back = np.asarray(losses.ae2xyz(losses.xyz2ae(jnp.asarray(xyz))))
        np.testing.assert_allclose(back, xyz, atol=1e-5)


class TestSemanticsLoss:
    def test_uniform_logits_log6(self):
        logits = jnp.zeros((2, 4, 4, 6))
        labels = jnp.zeros((2, 4, 4), dtype=jnp.int32)
        loss, _ = losses.semantics_loss(logits, labels)
        np.testing.assert_allclose(float(loss), np.log(6.0), rtol=1e-5)

    def test_accuracy_rate(self, rng):
        labels = rng.integers(0, 6, size=(1, 8, 8))
        logits = np.full((1, 8, 8, 6), -10.0)
        for y in range(8):
            for x in range(8):
                logits[0, y, x, labels[0, y, x]] = 10.0
        # flip one pixel
        logits[0, 0, 0] = -10.0
        logits[0, 0, 0, (labels[0, 0, 0] + 1) % 6] = 10.0
        loss, rate = losses.semantics_loss(jnp.asarray(logits), jnp.asarray(labels))
        np.testing.assert_allclose(float(rate), 63 / 64)

    def test_trim_labels(self):
        raw = np.array([0, 1, 2, 3, 6, 9, 17])
        np.testing.assert_array_equal(losses.trim_semantic_label(raw), [0, 1, 1, 2, 3, 4, 5])
        with pytest.raises(ValueError):
            losses.trim_semantic_label(np.array([42]))

    def test_uncertainty_unsupported(self):
        with pytest.raises(NotImplementedError):
            losses.semantics_loss(
                jnp.zeros((1, 2, 2, 6)), jnp.zeros((1, 2, 2), dtype=jnp.int32),
                uncertainty_map=jnp.ones((1, 2, 2, 1)),
            )
