"""Unit tests for the geometry core: closed-form cases + cv2 oracles."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crossloc_tpu import geometry as geo

cv2 = pytest.importorskip("cv2")


def random_rotation(rng, n=()):
    rvec = rng.normal(size=n + (3,))
    return np.asarray(geo.rodrigues(jnp.asarray(rvec))), rvec


class TestRodrigues:
    def test_round_trip(self, rng):
        rvec = rng.normal(size=(64, 3)) * 2.0
        R = geo.rodrigues(jnp.asarray(rvec))
        back = geo.inverse_rodrigues(R)
        R2 = geo.rodrigues(back)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_matches_cv2(self, rng):
        for _ in range(20):
            rvec = rng.normal(size=3)
            R_cv, _ = cv2.Rodrigues(rvec)
            R_us = np.asarray(geo.rodrigues(jnp.asarray(rvec)))
            np.testing.assert_allclose(R_us, R_cv, atol=1e-6)

    def test_small_angle_and_zero(self):
        for scale in [0.0, 1e-10, 1e-6]:
            rvec = jnp.array([scale, 0.0, 0.0])
            R = geo.rodrigues(rvec)
            assert np.all(np.isfinite(np.asarray(R)))
            np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-5)

    def test_near_pi(self, rng):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        rvec = axis * (np.pi - 1e-7)
        R = geo.rodrigues(jnp.asarray(rvec))
        back = np.asarray(geo.inverse_rodrigues(R))
        R2 = np.asarray(geo.rodrigues(jnp.asarray(back)))
        np.testing.assert_allclose(R2, np.asarray(R), atol=1e-4)

    def test_grad_finite_at_zero(self):
        g = jax.grad(lambda r: jnp.sum(geo.rodrigues(r)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))


class TestSE3:
    def test_invert(self, rng):
        R, rvec = random_rotation(rng)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = rng.normal(size=3)
        Tinv = np.asarray(geo.invert_se3(jnp.asarray(T)))
        np.testing.assert_allclose(Tinv @ T, np.eye(4), atol=1e-6)

    def test_pose_vec_round_trip(self, rng):
        pose6 = jnp.asarray(rng.normal(size=(8, 6)))
        T = geo.pose_vec_to_w2c(pose6)
        back = geo.w2c_to_pose_vec(T)
        T2 = geo.pose_vec_to_w2c(back)
        np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-5)

    def test_rotation_angle(self, rng):
        axis = np.array([0.0, 0.0, 1.0])
        for deg in [0.0, 10.0, 90.0, 179.0]:
            R = np.asarray(geo.rodrigues(jnp.asarray(axis * np.radians(deg))))
            ang = float(geo.rotation_angle_deg(jnp.eye(3), jnp.asarray(R)))
            assert abs(ang - deg) < 1e-3


class TestCamera:
    def test_project_backproject_round_trip(self, rng):
        K = geo.intrinsics(500.0, 720, 480)
        pts = rng.uniform(0.5, 50.0, size=(100, 3))
        pts[:, 0:2] = rng.normal(size=(100, 2)) * pts[:, 2:3] * 0.3
        pix = geo.project(jnp.asarray(pts), K)
        back = geo.backproject(pix, jnp.asarray(pts[:, 2]), K)
        np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-5, atol=1e-4)

    def test_pixel_grid_convention(self):
        # reference: x * 8 + 4 pixel centers (utils/learning.py:29-32)
        g = np.asarray(geo.pixel_grid(2, 3, subsample=8))
        assert g.shape == (2, 3, 2)
        assert g[0, 0, 0] == 4.0 and g[0, 0, 1] == 4.0
        assert g[0, 2, 0] == 2 * 8 + 4 and g[1, 0, 1] == 8 + 4

    def test_reprojection_error_zero_for_exact(self, rng):
        K = geo.intrinsics(500.0, 720, 480)
        pts = np.stack([rng.normal(size=50) * 5, rng.normal(size=50) * 5,
                        rng.uniform(2, 60, size=50)], axis=-1)
        pix = geo.project(jnp.asarray(pts), K)
        err = geo.reprojection_errors(jnp.asarray(pts), pix, K)
        assert float(jnp.max(err)) < 1e-3


class TestKabsch:
    def test_exact_recovery(self, rng):
        R, _ = random_rotation(rng)
        t = rng.normal(size=3) * 10
        src = rng.normal(size=(30, 3)) * 5
        dst = src @ R.T + t
        R_est, t_est = geo.kabsch(jnp.asarray(src), jnp.asarray(dst))
        np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-4)

    def test_weighted_ignores_outliers(self, rng):
        R, _ = random_rotation(rng)
        t = rng.normal(size=3)
        src = rng.normal(size=(20, 3))
        dst = np.asarray(src @ R.T + t)
        dst[:5] += rng.normal(size=(5, 3)) * 100  # gross outliers
        w = np.ones(20)
        w[:5] = 0.0
        R_est, t_est = geo.kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-4)

    def test_batched_and_differentiable(self, rng):
        src = jnp.asarray(rng.normal(size=(4, 10, 3)))
        dst = jnp.asarray(rng.normal(size=(4, 10, 3)))
        R, t = geo.kabsch(src, dst)
        assert R.shape == (4, 3, 3) and t.shape == (4, 3)
        g = jax.grad(lambda s: jnp.sum(geo.kabsch(s, dst)[1]))(src)
        assert np.all(np.isfinite(np.asarray(g)))


class TestP3P:
    def _synthetic(self, rng, n=4, noise=0.0):
        R, _ = random_rotation(rng)
        t = rng.normal(size=3) * 2 + np.array([0, 0, 30.0])
        K = np.asarray(geo.intrinsics(500.0, 720, 480))
        X_cam = np.stack(
            [rng.normal(size=n) * 8, rng.normal(size=n) * 6, rng.uniform(10, 60, size=n)],
            axis=-1,
        )
        X_world = (X_cam - t) @ R  # inverse: R^T (Xc - t)
        pix = X_cam @ K.T
        pix = pix[:, 0:2] / pix[:, 2:3] + rng.normal(size=(n, 2)) * noise
        return X_world, pix, K, R, t

    def test_exact_recovery(self, rng):
        ok = 0
        for _ in range(50):
            X, pix, K, R, t = self._synthetic(rng)
            R_est, t_est, err4, valid = geo.p3p_from_4pts(
                jnp.asarray(X), jnp.asarray(pix), jnp.asarray(K)
            )
            if not bool(valid):
                continue
            if float(err4) < 1e-2:
                np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-3)
                np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-2)
                ok += 1
        assert ok >= 45, f"only {ok}/50 exact P3P recoveries"

    def test_matches_cv2_p3p(self, rng):
        agree = 0
        total = 0
        for _ in range(30):
            X, pix, K, R, t = self._synthetic(rng, noise=0.2)
            R_est, t_est, err4, valid = geo.p3p_from_4pts(
                jnp.asarray(X), jnp.asarray(pix), jnp.asarray(K)
            )
            okcv, rvec, tvec = cv2.solvePnP(
                X.astype(np.float64), pix.astype(np.float64), K.astype(np.float64),
                None, flags=cv2.SOLVEPNP_P3P,
            )
            if not (okcv and bool(valid)):
                continue
            total += 1
            R_cv, _ = cv2.Rodrigues(rvec)
            ang = float(geo.rotation_angle_deg(jnp.asarray(R_cv), R_est))
            dt = np.linalg.norm(np.asarray(t_est) - tvec.ravel())
            if ang < 0.5 and dt < 0.5:
                agree += 1
        assert total >= 20 and agree / total > 0.85, f"{agree}/{total} cv2 agreements"

    def test_batched_vmap(self, rng):
        Xs, pixs, Ks = [], [], []
        for _ in range(16):
            X, pix, K, _, _ = self._synthetic(rng)
            Xs.append(X), pixs.append(pix), Ks.append(K)
        R, t, err, valid = jax.jit(geo.p3p_from_4pts)(
            jnp.asarray(np.stack(Xs)), jnp.asarray(np.stack(pixs)), jnp.asarray(np.stack(Ks))
        )
        assert R.shape == (16, 3, 3)
        assert int(jnp.sum(valid)) >= 14
        # fp32 closed-form P3P on far-away aerial geometry: sub-pixel is fine
        assert float(jnp.max(jnp.where(valid, err, 0.0))) < 1.0

    def test_degenerate_collinear_rejected(self, rng):
        K = np.asarray(geo.intrinsics(500.0, 720, 480))
        X = np.stack([np.linspace(0, 1, 4)] * 3, axis=-1)  # collinear points
        pix = rng.uniform(0, 400, size=(4, 2))
        _, _, err, valid = geo.p3p_from_4pts(jnp.asarray(X), jnp.asarray(pix), jnp.asarray(K))
        assert not bool(valid) or float(err) > 10.0


class TestSolveSPD:
    """Unrolled Cholesky solve vs numpy LU on SPD systems (geometry/linalg.py)."""

    def _spd(self, rng, n=6, batch=()):
        A = rng.normal(size=batch + (n, n))
        A = A @ np.swapaxes(A, -1, -2) + n * np.eye(n)
        b = rng.normal(size=batch + (n,))
        return A, b

    def test_matches_numpy_solve(self):
        rng = np.random.default_rng(0)
        A, b = self._spd(rng, batch=(32,))
        x = np.asarray(geo.solve_spd(jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)))
        ref = np.linalg.solve(A, b[..., None])[..., 0]
        assert np.max(np.abs(x - ref) / (1.0 + np.abs(ref))) < 1e-4

    def test_gn_normal_equations_shape(self):
        # the solver's actual use: damped JtJ with a ~1e4x diagonal spread
        rng = np.random.default_rng(1)
        J = rng.normal(size=(500, 6)) * np.array([100.0, 100.0, 100.0, 1.0, 1.0, 1.0])
        JtJ = J.T @ J
        damp = 1e-4 * np.diag(JtJ) + 1e-9
        A = JtJ + np.diag(damp)
        b = J.T @ rng.normal(size=500)
        x = np.asarray(geo.solve_spd(jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)))
        ref = np.linalg.solve(A, b)
        assert np.max(np.abs(x - ref) / (1.0 + np.abs(ref))) < 1e-3

    def test_rank_deficient_is_finite(self):
        A = jnp.zeros((6, 6), jnp.float32)
        x = geo.solve_spd(A, jnp.ones((6,), jnp.float32))
        assert bool(jnp.all(jnp.isfinite(x)))

    def test_gradients_match_lu(self):
        rng = np.random.default_rng(2)
        A, b = self._spd(rng)
        A32, b32 = jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)
        f_chol = lambda A, b: jnp.sum(geo.solve_spd(A, b) ** 2)
        f_lu = lambda A, b: jnp.sum(jnp.linalg.solve(A, b) ** 2)
        gA1, gb1 = jax.grad(f_chol, argnums=(0, 1))(A32, b32)
        gA2, gb2 = jax.grad(f_lu, argnums=(0, 1))(A32, b32)
        # Cholesky uses only the lower triangle; LU spreads dL/dA over both —
        # compare the symmetrized gradient (the solver's JtJ is symmetric)
        sym = lambda g: np.asarray(g + jnp.swapaxes(g, -1, -2)) / 2
        assert np.max(np.abs(sym(gA1) - sym(gA2))) < 1e-3 * (1 + np.max(np.abs(sym(gA2))))
        assert np.max(np.abs(np.asarray(gb1 - gb2))) < 1e-4 * (1 + np.max(np.abs(np.asarray(gb2))))
