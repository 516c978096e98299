"""Hypothesis-sharded solver over the virtual 8-device mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crossloc_tpu import geometry as geo, parallel, ransac
from crossloc_tpu.ransac.sharded import solve_batch_hypsharded

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
from test_ransac import synth_scene, pose_errors, FOCAL, IMG_H, IMG_W


class TestHypSharded:
    @pytest.mark.slow
    def test_recovers_pose_across_shards(self, rng):
        # slow-marked: even rolled (unroll=False) and at a tiny refine
        # budget, the P3P SoA graph under shard_map x vmap costs ~12 min of
        # XLA *CPU* compile (measured; the unrolled default was >20 min) —
        # the collective path's cheap guard is test_divisibility_guard below
        mesh = parallel.make_mesh(jax.devices(), data=2, spatial=4)
        coords, gt = synth_scene(rng, B=2)
        # rolled loops + tiny refine budget: exact coords converge in 2 outer
        # steps, and the default unrolled refine graph under shard_map took
        # >20 min of XLA *CPU* compile — a test nobody runs is dead weight
        cfg = ransac.RansacConfig(hypotheses=32, sample_rounds=4,
                                  refine_steps=2, gn_iters=2, polish_iters=1,
                                  unroll=False)
        c2w = solve_batch_hypsharded(
            coords, FOCAL, (IMG_H, IMG_W), jax.random.PRNGKey(0), mesh, "spatial", cfg
        )
        t_err, r_err = pose_errors(c2w, gt)
        assert t_err.max() < 0.5 and r_err.max() < 0.3

    def test_divisibility_guard(self, rng):
        mesh = parallel.make_mesh(jax.devices(), data=2, spatial=4)
        coords, _ = synth_scene(rng, B=1)
        with pytest.raises(ValueError):
            solve_batch_hypsharded(
                coords, FOCAL, (IMG_H, IMG_W), jax.random.PRNGKey(0), mesh, "spatial",
                ransac.RansacConfig(hypotheses=30),
            )
