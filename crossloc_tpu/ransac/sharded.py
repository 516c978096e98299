"""Cross-chip hypothesis parallelism for the RANSAC solver (shard_map).

The reference parallelizes its 64 RANSAC hypotheses across OpenMP threads
(`dsacstar.cpp:124,277,306`). On a TPU mesh the same axis can be sharded
ACROSS CHIPS: each device samples and scores its local slice of the
hypothesis pool, an `all_gather` over ICI assembles the global score table,
and the softmax/argmax/refinement run replicated (they are tiny). Use when
the per-image hypothesis budget is large (the DSAC training mode refines
every hypothesis — that work shards linearly).

For the standard 64-hypothesis eval config, in-chip vmap (ransac/solver.py)
is faster; this module exists for scaled-budget runs and as the framework's
explicit-collective path (everything else relies on XLA sharding
propagation).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..geometry import intrinsics, invert_se3, pixel_grid, pose_vec_to_w2c
from .config import RansacConfig
from .solver import _project_errors, refine_pose, sample_hypotheses, soft_inlier_score


def solve_batch_hypsharded(
    scene_coords,
    focal_length,
    image_hw,
    key,
    mesh,
    axis: str = "spatial",
    cfg: RansacConfig = RansacConfig(),
):
    """Pose estimation with the hypothesis pool sharded over `axis`.

    scene_coords [B, Hs, Ws, 3] replicated; cfg.hypotheses is the GLOBAL
    pool size and must divide by the axis size. Returns cam-to-world [B,4,4]
    (replicated).
    """
    n_shards = mesh.shape[axis]
    if cfg.hypotheses % n_shards != 0:
        raise ValueError(f"hypotheses {cfg.hypotheses} not divisible by {n_shards}")
    local_cfg = cfg._replace(hypotheses=cfg.hypotheses // n_shards)

    B, Hs, Ws, _ = scene_coords.shape
    N = Hs * Ws
    grid = pixel_grid(Hs, Ws, cfg.subsample, dtype=scene_coords.dtype).reshape(N, 2)
    img_h, img_w = image_hw
    focal = jnp.broadcast_to(jnp.asarray(focal_length, scene_coords.dtype), (B,))
    cams = intrinsics(focal, img_w, img_h, dtype=scene_coords.dtype)
    coords = scene_coords.reshape(B, N, 3)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(coords_rep, cams_rep, key_rep):
        shard = jax.lax.axis_index(axis)

        def per_image(c, K, k):
            # decorrelate the per-shard hypothesis draws
            k_local = jax.random.fold_in(k, shard)
            pose6, hyp_valid = sample_hypotheses(c, grid, K, k_local, local_cfg)
            errs = _project_errors(pose6, c, grid, K, cfg.max_pixel_error)
            scores = soft_inlier_score(errs, cfg)
            scores = jnp.where(hyp_valid, scores, -jnp.inf)

            # assemble the global pool over ICI
            all_scores = jax.lax.all_gather(scores, axis, tiled=True)  # [H_global]
            all_poses = jax.lax.all_gather(pose6, axis, tiled=True)  # [H_global, 6]
            any_valid = jnp.any(jnp.isfinite(all_scores))
            safe = jnp.where(any_valid, all_scores, jnp.zeros_like(all_scores))
            chosen = jnp.argmax(jax.nn.softmax(safe))
            win = refine_pose(all_poses[chosen], c, grid, K, cfg)
            return invert_se3(pose_vec_to_w2c(win))

        keys = jax.random.split(key_rep, coords_rep.shape[0])
        # full-f32 matmul precision (see solve_batch docstring)
        with jax.default_matmul_precision("float32"):
            return jax.vmap(per_image)(coords_rep, cams_rep, keys)

    return run(coords, cams, key)
