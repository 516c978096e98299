"""Train-step tests: loss goes down, schedule parity, uncertainty split."""
import numpy as np

import jax
import jax.numpy as jnp

from crossloc_tpu import models, train


def synth_batch(rng, B=2, H=64, W=96):
    images = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.float32)
    poses = jnp.broadcast_to(jnp.eye(4), (B, 4, 4)).at[:, 2, 3].set(50.0)
    labels = jnp.asarray(rng.normal(size=(B, H // 8, W // 8, 3)) * 20, jnp.float32)
    return train.TrainBatch(images, poses, labels, jnp.float32(300.0))


class TestTrainStep:
    def test_loss_decreases(self, rng):
        model = models.build_network("coord", uncertainty="MLE", mean=[0.0, 0.0, 0.0])
        tx = train.make_optimizer(1e-4, steps_per_epoch=10)
        batch = synth_batch(rng)
        state = train.create_train_state(model, tx, batch.images)
        step = jax.jit(train.make_train_step(model, tx, "coord", uncertainty="MLE"))
        state, m0 = step(state, batch)
        for _ in range(5):
            state, m = step(state, batch)
        assert float(m["loss"]) < float(m0["loss"])
        assert np.isfinite(float(m["grad_norm"]))
        assert int(state.step) == 6

    def test_depth_task(self, rng):
        model = models.build_network("depth", mean=[100.0])
        tx = train.make_optimizer(1e-4)
        images = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        labels = jnp.asarray(rng.uniform(50, 150, size=(2, 4, 4, 1)), jnp.float32)
        batch = train.TrainBatch(images, jnp.broadcast_to(jnp.eye(4), (2, 4, 4)), labels,
                                 jnp.float32(300.0))
        state = train.create_train_state(model, tx, batch.images)
        step = jax.jit(train.make_train_step(model, tx, "depth"))
        state, m0 = step(state, batch)
        for _ in range(10):
            state, m = step(state, batch)
        assert float(m["loss"]) < float(m0["loss"])

    def test_multistep_schedule(self):
        # gamma=0.5 at epochs 50 and 100 (utils/learning.py:396)
        sched = train.multistep_lr(2e-4, steps_per_epoch=10)
        assert np.isclose(sched(0), 2e-4)
        assert np.isclose(sched(499), 2e-4)
        assert np.isclose(sched(500), 1e-4)
        assert np.isclose(sched(1000), 5e-5)

    def test_schedule_disabled(self):
        sched = train.multistep_lr(1e-4, steps_per_epoch=10, enabled=False)
        assert sched == 1e-4


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import importlib.util, pathlib

        spec = importlib.util.spec_from_file_location(
            "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)

    def test_dryrun_multichip_4(self):
        import importlib.util, pathlib

        spec = importlib.util.spec_from_file_location(
            "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(4)


class TestCheckpoint:
    def test_full_state_round_trip(self, rng, tmp_path):
        from crossloc_tpu.train import (
            load_train_state, save_train_state, latest_state_file,
        )

        model = models.build_network("coord", uncertainty="MLE", mean=[0.0, 0.0, 0.0])
        tx = train.make_optimizer(1e-4, steps_per_epoch=10)
        batch = synth_batch(rng)
        state = train.create_train_state(model, tx, batch.images)
        step = jax.jit(train.make_train_step(model, tx, "coord", uncertainty="MLE"))
        for _ in range(3):
            state, m = step(state, batch)

        path = save_train_state(str(tmp_path / "model.net"), state)
        template = train.create_train_state(model, tx, batch.images)
        restored = load_train_state(path, template)
        assert int(restored.step) == 3
        # optimizer moments restored exactly -> identical next update
        s1, m1 = step(state, batch)
        s2, m2 = step(restored, batch)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
        leaves1 = jax.tree_util.tree_leaves(s1.params)
        leaves2 = jax.tree_util.tree_leaves(s2.params)
        for a, b in zip(leaves1, leaves2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
        assert latest_state_file(str(tmp_path)) == path


class TestDsacTrainStep:
    def test_e2e_pose_loss_decreases(self, rng):
        import sys, pathlib

        sys.path.insert(0, str(pathlib.Path(__file__).parent))
        from test_ransac import synth_scene

        from crossloc_tpu import ransac
        from crossloc_tpu.train import make_dsac_train_step

        # tiny net + tiny solver on a synthetic scene; coords head must move
        # toward poses that explain the (random) images less badly
        model = models.build_network("coord", uncertainty="MLE", tiny=True,
                                     mean=[0.0, 0.0, 100.0])
        coords, gt = synth_scene(rng, B=1)
        B, HS, WS, _ = coords.shape
        images = jnp.asarray(rng.normal(size=(B, HS * 8, WS * 8, 3)), jnp.float32)
        tx = train.make_optimizer(1e-4)
        state = train.create_train_state(model, tx, images)
        # an untrained net yields no within-threshold hypotheses (DSAC e2e
        # training starts from a pretrained init, like the reference); a
        # permissive inlier threshold exercises the gradient plumbing
        cfg = ransac.RansacConfig(hypotheses=8, sample_rounds=4, train_refine_steps=1,
                                  refine_steps=2, gn_iters=1,
                                  inlier_threshold=5000.0, max_pixel_error=10000.0)
        step = jax.jit(make_dsac_train_step(model, tx, cfg))
        batch = train.TrainBatch(images=images, poses=gt, labels=coords,
                                 focal=jnp.float32(500.0))
        state, m0 = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(m0["loss"]))
        for i in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(i + 1))
            assert np.isfinite(float(m["loss"]))
        assert float(m["grad_norm"]) > 0.0


class TestCheckpointManager:
    def test_rotation_and_restore(self, rng, tmp_path):
        from crossloc_tpu.train import CheckpointManager

        model = models.build_network("depth", tiny=True, mean=[0.0])
        tx = train.make_optimizer(1e-4)
        images = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
        state = train.create_train_state(model, tx, images)
        mgr = CheckpointManager(str(tmp_path / "ckpts"), keep=3)
        for step in range(6):
            mgr.save(state._replace(step=jnp.asarray(step, jnp.int32)))
        assert mgr.all_steps() == [3, 4, 5]  # rotated down to keep=3
        restored = mgr.restore_latest(state)
        assert int(restored.step) == 5

    def test_restore_empty(self, rng, tmp_path):
        from crossloc_tpu.train import CheckpointManager

        model = models.build_network("depth", tiny=True, mean=[0.0])
        tx = train.make_optimizer(1e-4)
        state = train.create_train_state(model, tx, jnp.zeros((1, 16, 16, 3)))
        mgr = CheckpointManager(str(tmp_path / "empty"))
        assert mgr.restore_latest(state) is None
