"""RGB-D pose solver: Kabsch hypotheses over measured camera coordinates.

Parity with the plugin's RGB-D path (N3/N4, `dsacstar/dsacstar.cpp:495-885`):
3-point Kabsch hypotheses from valid-depth pixels
(`sampleHypothesesRGBD`, `dsacstar_util.h:236-307`), 3D distance errors in
**centimeters** (`get3DDistErrs`, `dsacstar_util.h:457-507`), soft-inlier
scoring, and Kabsch refinement on inliers (`refineHypRGBD`,
`dsacstar_util.h:611-677`). Differentiable end to end: JAX's SVD gradient
replaces the hand-ported `svd_backward` (`dsacstar_util_rgbd.h:101-191`).

Static shapes: instead of sampling from a dynamic valid-point list, indices
are drawn over the full grid and a round is valid only if all 3 points carry
valid depth; invalid pixels contribute max error and zero refinement weight.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import invert_se3, kabsch
from .config import PoseLossConfig, RansacConfig


class RgbdResult(NamedTuple):
    cam_to_world: jnp.ndarray  # [B, 4, 4]
    scores: jnp.ndarray  # [B, H]
    probs: jnp.ndarray  # [B, H]
    chosen: jnp.ndarray  # [B]
    inlier_count: jnp.ndarray  # [B]
    valid: jnp.ndarray  # [B]


def _dist_errors_cm(R, t, obj, eye, vmask, max_dist):
    """||eye - (R obj + t)|| * 100 (cm), clamped; invalid pixels -> max_dist
    (`dsacstar_util.h:457-507`)."""
    pred = jnp.einsum("...ij,...nj->...ni", R, obj) + t[..., None, :]
    d = jnp.linalg.norm(eye - pred, axis=-1) * 100.0
    d = jnp.where(vmask, d, max_dist)
    return jnp.minimum(d, max_dist)


def _kabsch_refine(R, t, obj, eye, vmask, cfg: RansacConfig):
    """Fixed-iteration inlier-recompute Kabsch refinement with monotone
    inlier-count acceptance (`refineHypRGBD` semantics)."""
    tau = cfg.inlier_threshold

    def body(_, carry):
        R, t, best = carry
        d = _dist_errors_cm(R, t, obj, eye, vmask, cfg.max_pixel_error)
        w = ((d < tau) & vmask).astype(obj.dtype)
        count = jnp.sum(w)
        grow = count > best
        Rn, tn = kabsch(obj, eye, w)
        ok = grow & jnp.all(jnp.isfinite(Rn)) & jnp.all(jnp.isfinite(tn))
        R = jnp.where(ok, Rn, R)
        t = jnp.where(ok, tn, t)
        return R, t, jnp.maximum(best, count)

    R, t, _ = jax.lax.fori_loop(
        0, cfg.refine_steps, body, (R, t, jnp.asarray(3.0, obj.dtype)), unroll=True
    )
    return R, t


def solve_rgbd(
    scene_coords,
    camera_coords,
    valid_mask,
    key,
    cfg: RansacConfig = RansacConfig(),
    training: bool = False,
) -> RgbdResult:
    """scene_coords / camera_coords: [B, Hs, Ws, 3]; valid_mask: [B, Hs, Ws].

    The hypothesis transform maps scene (world) points into the camera frame
    (obj -> eye), matching `kabsch(eyePts, objPts, hyp)` + `transform`
    usage in the reference; the returned transform is its inverse
    (cam-to-world, `pose2trans` semantics).
    """
    B, Hs, Ws, _ = scene_coords.shape
    N = Hs * Ws
    obj = scene_coords.reshape(B, N, 3)
    eye = camera_coords.reshape(B, N, 3)
    vmask = valid_mask.reshape(B, N)
    keys = jax.random.split(key, B)

    def per_image(o, e, vm, k):
        k_sample, k_draw = jax.random.split(k)
        H, Rr = cfg.hypotheses, cfg.sample_rounds
        idx = jax.random.randint(k_sample, (H, Rr, 3), 0, N)
        o3 = o[idx]  # [H, Rr, 3, 3]
        e3 = e[idx]
        all_valid = jnp.all(vm[idx], axis=-1)  # [H, Rr]
        Rk, tk = kabsch(o3, e3)  # [H, Rr, 3, 3], [H, Rr, 3]
        pred = jnp.einsum("hrij,hrnj->hrni", Rk, o3) + tk[..., None, :]
        d3 = jnp.linalg.norm(e3 - pred, axis=-1) * 100.0  # cm
        good = all_valid & jnp.all(d3 < cfg.inlier_threshold, axis=-1)
        first = jnp.argmax(good, axis=1)
        hyp_valid = jnp.any(good, axis=1)
        take = lambda arr: jnp.take_along_axis(
            arr, first[(...,) + (None,) * (arr.ndim - 1)], axis=1
        )[:, 0]
        R0, t0 = take(Rk), take(tk)

        d = _dist_errors_cm(R0, t0, o, e, vm, cfg.max_pixel_error)  # [H, N]
        beta = 5.0 / cfg.inlier_threshold
        s = jax.nn.sigmoid(-beta * (d - cfg.inlier_threshold))
        scores = cfg.inlier_alpha * jnp.mean(s, axis=-1)
        safe = jnp.where(hyp_valid, scores, -jnp.inf)
        any_valid = jnp.any(hyp_valid)
        safe = jnp.where(any_valid, safe, jnp.zeros_like(scores))
        probs = jax.nn.softmax(safe)
        chosen = (
            jax.random.categorical(k_draw, safe) if training else jnp.argmax(probs)
        )

        Rw, tw = _kabsch_refine(R0[chosen], t0[chosen], o, e, vm, cfg)
        dw = _dist_errors_cm(Rw, tw, o, e, vm, cfg.max_pixel_error)
        inl = jnp.sum((dw < cfg.inlier_threshold) & vm)

        w2c = jnp.eye(4, dtype=o.dtype).at[0:3, 0:3].set(Rw).at[0:3, 3].set(tw)
        return invert_se3(w2c), scores, probs, chosen, inl, any_valid

    # full-f32 matmul precision (see solve_batch docstring)
    with jax.default_matmul_precision("float32"):
        c2w, scores, probs, chosen, inl, valid = jax.vmap(per_image)(obj, eye, vmask, keys)
    return RgbdResult(c2w, scores, probs, chosen, inl, valid)


def expected_pose_loss_rgbd(
    scene_coords,
    camera_coords,
    valid_mask,
    gt_poses,
    key,
    cfg: RansacConfig = RansacConfig(),
    loss_cfg: PoseLossConfig = PoseLossConfig(),
):
    """DSAC training objective for the RGB-D path: E_h~p [ loss(refine(h), gt) ].

    Parity with `dsacstar_rgbd_backward` (`dsacstar.cpp:631-885`): Kabsch
    hypotheses + soft-inlier scores + expected pose loss, with gradients via
    autodiff through the SVD (replacing the hand-ported `svd_backward`).
    gt_poses: [B, 4, 4] cam-to-world.
    """
    from .loss import pose_loss

    B, Hs, Ws, _ = scene_coords.shape
    N = Hs * Ws
    obj = scene_coords.reshape(B, N, 3)
    eye = camera_coords.reshape(B, N, 3)
    vmask = valid_mask.reshape(B, N)
    keys = jax.random.split(key, B)

    def per_image(o, e, v, k, gt):
        H, Rr = cfg.hypotheses, cfg.sample_rounds
        idx = jax.random.randint(k, (H, Rr, 3), 0, N)
        o3, e3 = o[idx], e[idx]
        all_valid = jnp.all(v[idx], axis=-1)
        Rk, tk = kabsch(o3, e3)
        pred = jnp.einsum("hrij,hrnj->hrni", Rk, o3) + tk[..., None, :]
        d3 = jnp.linalg.norm(e3 - pred, axis=-1) * 100.0
        good = all_valid & jnp.all(d3 < cfg.inlier_threshold, axis=-1)
        first = jnp.argmax(good, axis=1)
        hyp_valid = jnp.any(good, axis=1)
        take = lambda a: jnp.take_along_axis(
            a, first[(...,) + (None,) * (a.ndim - 1)], axis=1
        )[:, 0]
        R0, t0 = take(Rk), take(tk)
        d = _dist_errors_cm(R0, t0, o, e, v, cfg.max_pixel_error)
        beta = 5.0 / cfg.inlier_threshold
        scores = cfg.inlier_alpha * jnp.mean(
            jax.nn.sigmoid(-beta * (d - cfg.inlier_threshold)), axis=-1
        )
        safe = jnp.where(hyp_valid, scores, -jnp.inf)
        safe = jnp.where(jnp.any(hyp_valid), safe, jnp.zeros_like(scores))
        probs = jax.nn.softmax(safe)
        Rr_, tr_ = jax.vmap(lambda R, t: _kabsch_refine(R, t, o, e, v, cfg))(R0, t0)
        w2c = (
            jnp.broadcast_to(jnp.eye(4), (H, 4, 4))
            .at[:, 0:3, 0:3].set(Rr_)
            .at[:, 0:3, 3].set(tr_)
        )
        est = invert_se3(w2c)
        losses = jnp.where(hyp_valid, pose_loss(est, gt, loss_cfg), 0.0)
        return jnp.sum(probs * losses)

    with jax.default_matmul_precision("float32"):
        return jnp.mean(jax.vmap(per_image)(obj, eye, vmask, keys, gt_poses))
