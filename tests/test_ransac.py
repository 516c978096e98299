"""GT-oracle tests for the differentiable RANSAC solver (SURVEY.md §4):
synthesize exact scene-coordinate maps from known poses and require the full
jit solver to recover them — exercises sampling, scoring, selection and
refinement without any dataset.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crossloc_tpu import geometry as geo
from crossloc_tpu import ransac

IMG_H, IMG_W = 480, 720
FOCAL = 500.0
HS, WS = 30, 45  # subsampled prediction grid (small for CPU test speed)


def synth_scene(rng, B=2, noise=0.0, outlier_frac=0.0, focal=FOCAL, pp_shift=None):
    """Exact scene coordinates by backprojecting the prediction grid.

    pp_shift (dx, dy) offsets the generating camera's principal point — the
    geometry an augmentation zoom-in crop produces (data/augment.py)."""
    K = np.array(geo.intrinsics(focal, IMG_W, IMG_H), copy=True)
    if pp_shift is not None:
        K[0, 2] += pp_shift[0]
        K[1, 2] += pp_shift[1]
    grid = np.asarray(geo.pixel_grid(HS, WS, 8)).reshape(-1, 2)
    N = grid.shape[0]
    coords, poses = [], []
    for _ in range(B):
        rvec = rng.normal(size=3) * 0.6
        R = np.asarray(geo.rodrigues(jnp.asarray(rvec)))
        t = rng.normal(size=3) * 20 + np.array([0, 0, 100.0])
        depth = rng.uniform(30.0, 300.0, size=N)
        cam_pts = np.asarray(
            geo.backproject(jnp.asarray(grid), jnp.asarray(depth), jnp.asarray(K))
        )
        world = cam_pts @ R.T + t  # cam-to-world
        if noise > 0:
            world = world + rng.normal(size=world.shape) * noise
        if outlier_frac > 0:
            n_out = int(N * outlier_frac)
            sel = rng.choice(N, n_out, replace=False)
            world[sel] += rng.uniform(-200, 200, size=(n_out, 3))
        c2w = np.eye(4)
        c2w[:3, :3] = R
        c2w[:3, 3] = t
        coords.append(world.reshape(HS, WS, 3))
        poses.append(c2w)
    return (
        jnp.asarray(np.stack(coords), dtype=jnp.float32),
        jnp.asarray(np.stack(poses), dtype=jnp.float32),
    )


def pose_errors(est_c2w, gt_c2w):
    t_err = np.linalg.norm(
        np.asarray(est_c2w)[:, 0:3, 3] - np.asarray(gt_c2w)[:, 0:3, 3], axis=-1
    )
    r_err = np.asarray(
        geo.rotation_angle_deg(est_c2w[:, 0:3, 0:3], gt_c2w[:, 0:3, 0:3])
    )
    return t_err, r_err


class TestOracle:
    def test_exact_coords_recover_pose(self, rng):
        coords, gt = synth_scene(rng, B=3)
        res = jax.jit(
            lambda c, k: ransac.solve_batch(c, FOCAL, (IMG_H, IMG_W), k)
        )(coords, jax.random.PRNGKey(0))
        assert bool(jnp.all(res.valid))
        t_err, r_err = pose_errors(res.cam_to_world, gt)
        assert t_err.max() < 0.5, f"t_err={t_err}"
        assert r_err.max() < 0.3, f"r_err={r_err}"
        # most pixels should be inliers under the recovered pose
        assert int(res.inlier_count.min()) > 0.9 * HS * WS

    def test_per_image_focal_mixed_batch(self, rng):
        """A batch mixing two calibrations must be solved with each image's
        own focal (`utils/evaluation.py:161-172` is per-image); using image
        0's focal for the whole batch breaks the second pose."""
        c0, g0 = synth_scene(rng, B=1, focal=400.0)
        c1, g1 = synth_scene(rng, B=1, focal=800.0)
        coords = jnp.concatenate([c0, c1])
        gt = jnp.concatenate([g0, g1])
        focals = jnp.asarray([400.0, 800.0], jnp.float32)

        res = ransac.solve_batch(coords, focals, (IMG_H, IMG_W), jax.random.PRNGKey(11))
        t_err, r_err = pose_errors(res.cam_to_world, gt)
        assert t_err.max() < 0.5, f"t_err={t_err}"
        assert r_err.max() < 0.3, f"r_err={r_err}"

        # regression contrast: the round-1 CLI bug (scalar focal[0] for the
        # whole batch) must visibly corrupt the differently-calibrated image
        bad = ransac.solve_batch(coords, 400.0, (IMG_H, IMG_W), jax.random.PRNGKey(11))
        t_bad, _ = pose_errors(bad.cam_to_world, gt)
        assert t_bad[1] > 10.0 * max(t_err[1], 0.05), f"t_bad={t_bad}"

    def test_hard_inlier_selection(self, rng):
        """eval_selection='hard' (consensus argmax) localizes like the soft
        default; benchmarked equal on the noisy oracle (BENCH_NOTES.md r2),
        kept as a config option."""
        coords, gt = synth_scene(rng, B=2)
        cfg = ransac.RansacConfig(eval_selection="hard")
        res = ransac.solve_batch(coords, FOCAL, (IMG_H, IMG_W), jax.random.PRNGKey(2), cfg)
        t_err, r_err = pose_errors(res.cam_to_world, gt)
        assert t_err.max() < 0.5 and r_err.max() < 0.3

    def test_refine_top_k_selection(self, rng):
        """refine_top_k>1 (refine K best hypotheses, select by final
        soft-inlier score) localizes like the default; A/B on the 180-frame
        noisy oracle measured 0.155 vs 0.157 m — within CIs, so K=1 stays
        the default (BENCH_NOTES round 3), the option ships tested."""
        coords, gt = synth_scene(rng, B=2)
        cfg = ransac.RansacConfig(refine_top_k=4)
        res = ransac.solve_batch(coords, FOCAL, (IMG_H, IMG_W), jax.random.PRNGKey(5), cfg)
        t_err, r_err = pose_errors(res.cam_to_world, gt)
        assert t_err.max() < 0.5 and r_err.max() < 0.3
        assert int(res.chosen.max()) < cfg.hypotheses

    def test_noisy_coords_with_outliers(self, rng):
        coords, gt = synth_scene(rng, B=4, noise=1.0, outlier_frac=0.25)
        res = ransac.solve_batch(coords, FOCAL, (IMG_H, IMG_W), jax.random.PRNGKey(1))
        t_err, r_err = pose_errors(res.cam_to_world, gt)
        assert np.median(t_err) < 5.0, f"t_err={t_err}"
        assert np.median(r_err) < 3.0, f"r_err={r_err}"

    def test_training_mode_samples(self, rng):
        coords, gt = synth_scene(rng, B=2)
        res = ransac.solve_batch(
            coords, FOCAL, (IMG_H, IMG_W), jax.random.PRNGKey(2), training=True
        )
        t_err, _ = pose_errors(res.cam_to_world, gt)
        assert t_err.max() < 2.0

    def test_scores_prefer_truth(self, rng):
        coords, gt = synth_scene(rng, B=1)
        res = ransac.solve_batch(coords, FOCAL, (IMG_H, IMG_W), jax.random.PRNGKey(3))
        probs = np.asarray(res.probs[0])
        assert probs.max() > 0.01
        assert abs(probs.sum() - 1.0) < 1e-4
        # entropy is in nats (reference units, `dsacstar_util.h:711-719`);
        # max over 64 hypotheses is ln(64)
        assert float(res.entropy[0]) < np.log(64.0) + 1e-3


class TestPPShift:
    """The augmentation's zoom-in crop moves the principal point by up to
    ~(W-1)/2·(s-1) input pixels (data/augment.py:241-247) — the solver camera
    must carry that shift (VERDICT r3 weak #3: the e2e path used to drop it,
    a systematic bias of up to ~20° equivalent rotation at f≈480)."""

    PP = np.asarray([110.0, -75.0], np.float32)

    def test_shifted_pp_exact_recovery(self, rng):
        """Exact coords generated under a shifted-pp camera recover the pose
        to the SAME tolerance as the central-pp oracle when solve_batch gets
        pp_shift — and are visibly biased without it."""
        coords, gt = synth_scene(rng, B=2, pp_shift=self.PP)
        res = ransac.solve_batch(
            coords, FOCAL, (IMG_H, IMG_W), jax.random.PRNGKey(7),
            pp_shift=jnp.asarray(self.PP),
        )
        t_err, r_err = pose_errors(res.cam_to_world, gt)
        assert t_err.max() < 0.5, f"t_err={t_err}"
        assert r_err.max() < 0.3, f"r_err={r_err}"

        bad = ransac.solve_batch(coords, FOCAL, (IMG_H, IMG_W), jax.random.PRNGKey(7))
        _, r_bad = pose_errors(bad.cam_to_world, gt)
        # dropping a ~133 px pp offset at f=500 is ~15 deg of equivalent
        # camera rotation; require a decisive gap over the correct solve
        assert r_bad.min() > 5.0, f"r_bad={r_bad}"

    def test_expected_loss_honors_pp_shift(self, rng):
        coords, gt = synth_scene(rng, B=1, pp_shift=self.PP)
        cfg = ransac.RansacConfig(hypotheses=16, sample_rounds=8, train_refine_steps=2)
        good, _ = ransac.expected_pose_loss(
            coords, gt, FOCAL, (IMG_H, IMG_W), jax.random.PRNGKey(0), cfg=cfg,
            pp_shift=jnp.asarray(self.PP),
        )
        bad, _ = ransac.expected_pose_loss(
            coords, gt, FOCAL, (IMG_H, IMG_W), jax.random.PRNGKey(0), cfg=cfg,
        )
        assert float(good) < 1.0, f"good={float(good)}"
        assert float(bad) > 3.0 * float(good), (float(good), float(bad))

    def test_augmented_batch_solves_with_returned_pp_shift(self, rng):
        """End-to-end exactness through the REAL augmentation: GT dense
        labels run through augment_batch (zoom-in + rotation + crop window),
        then the solver with the returned (focal, pp_shift) must recover the
        rotation-compensated GT pose; without pp_shift it is biased."""
        from crossloc_tpu import data
        from crossloc_tpu.data import AugmentConfig, augment_batch

        H_IMG, W_IMG, F = 240, 360, 300.0
        nprng = np.random.default_rng(3)
        s0 = data.synth_sample(nprng, img_h=H_IMG, img_w=W_IMG, focal=F)
        s1 = data.synth_sample(nprng, img_h=H_IMG, img_w=W_IMG, focal=F)
        images = jnp.asarray(np.stack([s0["image"], s1["image"]]))
        labels = jnp.asarray(np.stack([s0["coord"], s1["coord"]]))
        poses = jnp.asarray(np.stack([s0["pose"], s1["pose"]]))
        focal = jnp.asarray(F, jnp.float32)
        cfg = AugmentConfig(aug_scale_min=1.3, aug_scale_max=1.5, aug_rotation=15.0)

        # find a seed whose crop draw moves the pp decisively (the draw is
        # uniform over the feasible range, so tiny offsets are possible)
        for seed in range(16):
            _, lab_a, pose_a, focal_a, pp = augment_batch(
                images, labels, poses, focal, jax.random.PRNGKey(seed), cfg
            )
            if float(jnp.linalg.norm(pp)) > 35.0:
                break
        else:
            pytest.fail("no augmentation draw produced a >35px pp shift")

        res = ransac.solve_batch(
            lab_a, focal_a, (H_IMG, W_IMG), jax.random.PRNGKey(1), pp_shift=pp
        )
        t_err, r_err = pose_errors(res.cam_to_world, pose_a)
        # nearest-resampled labels quantize the correspondence by up to half
        # an input cell — the same quantization the reference's rotate+
        # interpolate collate has — so the tolerance is looser than the
        # exact-coords oracle but still unambiguous localization
        assert t_err.max() < 3.0, f"t_err={t_err}"
        assert r_err.max() < 1.5, f"r_err={r_err}"

        bad = ransac.solve_batch(lab_a, focal_a, (H_IMG, W_IMG), jax.random.PRNGKey(1))
        _, r_bad = pose_errors(bad.cam_to_world, pose_a)
        assert r_bad.min() > 2.0 * max(r_err.max(), 1.0), f"r_bad={r_bad}"


class TestExpectedLoss:
    def test_loss_small_for_exact(self, rng):
        coords, gt = synth_scene(rng, B=2)
        loss, aux = ransac.expected_pose_loss(
            coords, gt, FOCAL, (IMG_H, IMG_W), jax.random.PRNGKey(0)
        )
        assert float(loss) < 1.0

    def test_loss_larger_for_corrupted(self, rng):
        coords, gt = synth_scene(rng, B=2)
        bad = coords + jnp.asarray(rng.normal(size=coords.shape) * 20.0, dtype=jnp.float32)
        loss0, _ = ransac.expected_pose_loss(coords, gt, FOCAL, (IMG_H, IMG_W), jax.random.PRNGKey(0))
        loss1, _ = ransac.expected_pose_loss(bad, gt, FOCAL, (IMG_H, IMG_W), jax.random.PRNGKey(0))
        assert float(loss1) > float(loss0)

    def test_gradient_flows_to_coords(self, rng):
        coords, gt = synth_scene(rng, B=1, noise=0.5)
        cfg = ransac.RansacConfig(hypotheses=16, sample_rounds=4, train_refine_steps=2)

        def f(c):
            loss, _ = ransac.expected_pose_loss(
                c, gt, FOCAL, (IMG_H, IMG_W), jax.random.PRNGKey(0), cfg=cfg
            )
            return loss

        g = jax.grad(f)(coords)
        g = np.asarray(g)
        assert np.all(np.isfinite(g))
        assert np.abs(g).sum() > 0.0


class TestPoseLoss:
    def test_identity_zero(self):
        T = jnp.eye(4)[None]
        assert float(ransac.pose_loss(T, T)[0]) < 1e-5

    def test_translation_only(self):
        T1 = jnp.eye(4)[None]
        T2 = jnp.eye(4).at[0, 3].set(7.0)[None]
        np.testing.assert_allclose(float(ransac.pose_loss(T1, T2)[0]), 7.0, rtol=1e-5)

    def test_soft_clamp(self):
        T1 = jnp.eye(4)[None]
        T2 = jnp.eye(4).at[0, 3].set(400.0)[None]
        # above cut=100 -> sqrt(100 * 400) = 200
        np.testing.assert_allclose(float(ransac.pose_loss(T1, T2)[0]), 200.0, rtol=1e-4)


class TestRgbd:
    def test_exact_recovery(self, rng):
        coords, gt = synth_scene(rng, B=2)
        # camera coords = w2c(gt) applied to scene coords
        w2c = geo.invert_se3(gt)
        cam = geo.transform_points(w2c[:, None], coords.reshape(2, -1, 3)[:, None])[:, 0]
        cam = cam.reshape(coords.shape)
        vmask = jnp.ones(coords.shape[:3], dtype=bool)
        res = ransac.solve_rgbd(coords, cam, vmask, jax.random.PRNGKey(0))
        t_err, r_err = pose_errors(res.cam_to_world, gt)
        assert t_err.max() < 0.05 and r_err.max() < 0.05

    def test_invalid_depth_ignored(self, rng):
        coords, gt = synth_scene(rng, B=1)
        w2c = geo.invert_se3(gt)
        cam = geo.transform_points(w2c[:, None], coords.reshape(1, -1, 3)[:, None])[:, 0]
        cam = np.array(cam.reshape(coords.shape))  # writable copy
        vmask = np.ones(coords.shape[:3], dtype=bool)
        # corrupt half the pixels but mark them invalid
        cam[:, ::2] += 1000.0
        vmask[:, ::2] = False
        res = ransac.solve_rgbd(
            coords, jnp.asarray(cam), jnp.asarray(vmask), jax.random.PRNGKey(1)
        )
        t_err, r_err = pose_errors(res.cam_to_world, gt)
        assert t_err.max() < 0.05 and r_err.max() < 0.05


class TestCv2Oracle:
    def test_matches_cv2_solvepnpransac(self, rng):
        """External oracle: on the same noisy/outlier data, our solver's
        pose errors must be in the same class as OpenCV's RANSAC PnP."""
        import cv2

        coords, gt = synth_scene(rng, B=4, noise=1.0, outlier_frac=0.2)
        res = ransac.solve_batch(coords, FOCAL, (IMG_H, IMG_W), jax.random.PRNGKey(5))
        t_ours, r_ours = pose_errors(res.cam_to_world, gt)

        K = np.asarray(geo.intrinsics(FOCAL, IMG_W, IMG_H), np.float64)
        grid = np.asarray(geo.pixel_grid(HS, WS, 8), np.float64).reshape(-1, 2)
        t_cv, r_cv = [], []
        for b in range(coords.shape[0]):
            obj = np.asarray(coords[b], np.float64).reshape(-1, 3)
            ok, rvec, tvec, _ = cv2.solvePnPRansac(
                obj, grid, K, None, iterationsCount=64, reprojectionError=10.0,
                flags=cv2.SOLVEPNP_P3P,
            )
            assert ok
            R = cv2.Rodrigues(rvec)[0]
            c2w = np.eye(4)
            c2w[:3, :3] = R.T
            c2w[:3, 3] = (-R.T @ tvec).ravel()
            t_cv.append(np.linalg.norm(c2w[:3, 3] - np.asarray(gt[b])[:3, 3]))
            r_cv.append(float(geo.rotation_angle_deg(
                jnp.asarray(c2w[:3, :3]), gt[b][:3, :3])))
        # medians within 3x of each other (RANSAC stochasticity + our GN
        # refinement vs cv2's iterative refinement differ in detail)
        assert np.median(t_ours) < max(3.0 * np.median(t_cv), 3.0), (
            f"ours {np.median(t_ours):.2f}m vs cv2 {np.median(t_cv):.2f}m")
        assert np.median(r_ours) < max(3.0 * np.median(r_cv), 2.0)


class TestLocalizer:
    def test_make_localizer_fused(self, rng):
        """inference.make_localizer: net + solver fused in one jit."""
        import jax.numpy as jnp

        from crossloc_tpu import models
        from crossloc_tpu.inference import make_localizer

        model = models.build_network("coord", uncertainty="MLE", tiny=True,
                                     mean=[0.0, 0.0, 100.0])
        images = jnp.asarray(rng.normal(size=(2, 64, 96, 3)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), images)["params"]
        cfg = ransac.RansacConfig(hypotheses=8, sample_rounds=4, refine_steps=2,
                                  gn_iters=1, polish_iters=1)
        localize = make_localizer(model, cfg)
        coords, res = localize(params, images, jnp.float32(120.0),
                               jax.random.PRNGKey(1))
        assert coords.shape == (2, 8, 12, 3)
        assert res.cam_to_world.shape == (2, 4, 4)
        assert bool(jnp.all(jnp.isfinite(res.cam_to_world)))


class TestProjectErrors:
    """The intrinsics-folded projection (solver.py::_project_errors) must
    match the naive two-step form K (R X + t) to float tolerance."""

    def test_matches_two_step_projection(self):
        rng = np.random.default_rng(7)
        coords, _ = synth_scene(rng, B=1, noise=2.0)
        X = np.asarray(coords)[0].reshape(-1, 3).astype(np.float32)
        grid = np.asarray(geo.pixel_grid(HS, WS, 8)).reshape(-1, 2)
        K = np.asarray(geo.intrinsics(FOCAL, IMG_W, IMG_H), np.float64)
        pose6 = np.concatenate([rng.normal(size=3) * 0.4,
                                rng.normal(size=3) * 5 + [0, 0, 80]]).astype(np.float32)
        from crossloc_tpu.ransac.solver import _project_errors
        got = np.asarray(_project_errors(
            jnp.asarray(pose6), jnp.asarray(X), jnp.asarray(grid, jnp.float32),
            jnp.asarray(K, jnp.float32), 100.0))
        # f64 reference, naive order: pix = (K @ (R X + t)) perspective-divided
        R = np.asarray(geo.rodrigues(jnp.asarray(pose6[:3])), np.float64)
        Xc = X.astype(np.float64) @ R.T + pose6[3:6].astype(np.float64)
        proj = Xc @ K.T
        z = proj[:, 2]
        pix = proj[:, :2] / np.maximum(z, 1e-6)[:, None]
        err = np.sqrt(np.sum((pix - grid) ** 2, axis=-1) + 1e-12)
        err = np.where(z > 1e-6, err, 100.0)
        ref = np.minimum(err, 100.0)
        assert np.max(np.abs(got - ref)) < 5e-2  # px, f32-vs-f64 rounding
