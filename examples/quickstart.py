"""Programmatic quickstart: train on a synthetic scene, then localize.

Runs anywhere (CPU ok, ~2 min): generates an exact synthetic scene, fits a
tiny coord regressor, and recovers the camera pose with the fused
differentiable-RANSAC solver.

    python examples/quickstart.py [--steps N]
"""
import argparse

import numpy as np

import jax
import jax.numpy as jnp

from crossloc_tpu import data, geometry as geo, models, ransac, train


def main(steps: int = 400):
    rng = np.random.default_rng(0)
    scene = data.synth_sample(rng, img_h=96, img_w=144, focal=120.0)

    B = 4
    images = jnp.asarray(np.stack([scene["image"]] * B))
    labels = jnp.asarray(np.stack([scene["coord"]] * B))
    poses = jnp.asarray(np.stack([scene["pose"]] * B))
    focal = jnp.float32(scene["focal"])
    mean = labels.reshape(-1, 3).mean(0)

    # 1. model + optimizer (reference hyperparameters)
    model = models.build_network("coord", tiny=True, mean=list(np.asarray(mean)))
    tx = train.make_optimizer(3e-3, steps_per_epoch=1, no_lr_scheduling=True)
    norm_images = data.normalize_images(images)
    state = train.create_train_state(model, tx, norm_images)

    # 2. one fused jit training step
    step = jax.jit(train.make_train_step(model, tx, "coord"))
    batch = train.TrainBatch(images=norm_images, poses=poses, labels=labels, focal=focal)
    for i in range(steps):
        state, metrics = step(state, batch)
        if i % 100 == 0:
            print(f"step {i:4d}  loss {float(metrics['loss']):8.2f}  "
                  f"valid {float(metrics['valid_rate']):.2f}")

    # 3. localize from the net's own predictions
    preds = model.apply({"params": state.params}, norm_images)[..., :3]
    res = ransac.solve_batch(
        preds.astype(jnp.float32), float(focal), images.shape[1:3], jax.random.PRNGKey(0)
    )
    t_err = np.linalg.norm(
        np.asarray(res.cam_to_world)[:, :3, 3] - np.asarray(poses)[:, :3, 3], axis=-1
    )
    r_err = np.asarray(geo.rotation_angle_deg(res.cam_to_world[:, :3, :3], poses[:, :3, :3]))
    print(f"pose errors: {t_err.round(2)} m, {r_err.round(2)} deg")
    return t_err, r_err


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=400, help="training steps")
    main(steps=ap.parse_args().steps)
