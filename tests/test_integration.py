"""Capstone integration test: learn a scene, then localize in it.

The CrossLoc loop end to end without any dataset: a tiny coord net memorizes
a synthetic static scene (network + loss + optimizer + normalization), and
the differentiable RANSAC solver recovers the camera pose from the net's own
predictions — the minimum end-to-end slice of SURVEY.md §7 as an automated
test. (~2 min on CPU; the slowest test in the suite by design.)
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crossloc_tpu import data, geometry as geo, models, ransac, train


@pytest.mark.slow
def test_learn_then_localize(rng):
    s = data.synth_sample(rng, img_h=96, img_w=144, focal=120.0)
    B = 4
    images = jnp.asarray(np.stack([s["image"]] * B))
    labels = jnp.asarray(np.stack([s["coord"]] * B))
    poses = jnp.asarray(np.stack([s["pose"]] * B))
    focal = jnp.float32(s["focal"])
    mean = labels.reshape(-1, 3).mean(0)

    model = models.build_network("coord", tiny=True, mean=list(np.asarray(mean)))
    tx = train.make_optimizer(3e-3, steps_per_epoch=1, no_lr_scheduling=True)
    norm_images = data.normalize_images(images)
    state = train.create_train_state(model, tx, norm_images)
    step = jax.jit(train.make_train_step(model, tx, "coord"))
    batch = train.TrainBatch(images=norm_images, poses=poses, labels=labels, focal=focal)

    first_loss = None
    for i in range(400):
        state, m = step(state, batch)
        if first_loss is None:
            first_loss = float(m["loss"])
    assert float(m["loss"]) < 0.1 * first_loss
    assert float(m["valid_rate"]) > 0.95  # nearly every pixel within constraints

    preds = model.apply({"params": state.params}, norm_images)[..., :3]
    coord_err = jnp.linalg.norm(preds - labels, axis=-1)
    assert float(jnp.median(coord_err)) < 5.0  # memorized the scene geometry

    res = ransac.solve_batch(
        preds.astype(jnp.float32), float(focal), (96, 144), jax.random.PRNGKey(0)
    )
    t_err = np.linalg.norm(
        np.asarray(res.cam_to_world)[:, :3, 3] - np.asarray(poses)[:, :3, 3], axis=-1
    )
    r_err = np.asarray(geo.rotation_angle_deg(res.cam_to_world[:, :3, :3], poses[:, :3, :3]))
    assert t_err.max() < 5.0, f"t_err={t_err}"
    assert r_err.max() < 2.0, f"r_err={r_err}"
