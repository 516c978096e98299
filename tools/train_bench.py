"""Training-step throughput bench (aug + forward + task loss + Adam).

Measures the SAME fused jit program the training CLI runs
(`cli/train_single_task.py::fused_step`: device-side augmentation +
`train.make_train_step`) on synthetic 480x720 coord data, with true
device sync (see utils/profiling.device_sync for why).

A/B knobs mirror the perf probes recorded in BENCH_NOTES.md:
  --no-s2d      standard stems instead of space-to-depth
  --no-donate   disable state buffer donation
  --dtype f32   full-f32 conv compute (the CLI default; bf16 = --bf16)
Usage: python tools/train_bench.py [--batches 12,64] [--iters 10]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="12,64")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--no-s2d", dest="s2d", action="store_false")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"],
                    help="conv compute dtype (CLI: --bf16 vs default f32)")
    ap.add_argument("--no-donate", dest="donate", action="store_false")
    ap.add_argument("--no-bf16-gather", dest="bf16_gather", action="store_false",
                    help="full-f32 image resample (the CPU-test arithmetic)")
    ap.add_argument("--batch-inside-gather", action="store_true",
                    help="gather corner windows from the batch-inside "
                         "[H,W,B*C] re-layout (bit-exact; see "
                         "tools/gather_layout_probe.py)")
    ap.add_argument("--profile", default=None,
                    help="write a jax.profiler trace of the timed loop here")
    args = ap.parse_args()

    from crossloc_tpu import models
    from crossloc_tpu.data import AugmentConfig, augment_batch
    from crossloc_tpu.losses import CoordLossConfig
    from crossloc_tpu.train import (
        TrainBatch, create_train_state, make_optimizer, make_train_step,
    )

    model = models.build_network(
        "coord", uncertainty="MLE", mean=[-29.34, 184.17, 91.96],
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
        stem_s2d=args.s2d,
    )
    tx = make_optimizer(2e-4, 100, no_lr_scheduling=True)
    aug_cfg = AugmentConfig(grayscale=False, nodata_value=-1.0,
                            image_gather_bf16=args.bf16_gather,
                            gather_batch_inside=args.batch_inside_gather)
    coord_cfg = CoordLossConfig(nodata_value=-1.0)
    train_step = make_train_step(model, tx, "coord", "MLE", -1.0,
                                 coord_cfg, None, None)

    jit_kwargs = {"donate_argnums": (0,)} if args.donate else {}

    def _fused(state, images, labels, poses, focal, key):
        images, labels, poses, focal, pp_shift = augment_batch(
            images, labels, poses, focal, key, aug_cfg
        )
        return train_step(
            state,
            TrainBatch(images=images, poses=poses, labels=labels, focal=focal,
                       pp_shift=pp_shift),
        )

    fused_step = jax.jit(_fused, **jit_kwargs)

    rng = np.random.default_rng(0)
    for batch in (int(b) for b in args.batches.split(",")):
        images = jnp.asarray(rng.normal(size=(batch, 480, 720, 3)), jnp.float32)
        labels = jnp.asarray(rng.normal(size=(batch, 60, 90, 3)) * 5, jnp.float32)
        poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (batch, 1, 1))
        focal = jnp.asarray(480.0)
        state = create_train_state(model, tx, images[:1])
        key = jax.random.PRNGKey(0)

        state, metrics = fused_step(state, images, labels, poses, focal, key)
        np.asarray(metrics["loss"])  # compile + true sync
        state, metrics = fused_step(state, images, labels, poses, focal,
                                    jax.random.fold_in(key, 1))
        np.asarray(metrics["loss"])

        if args.profile:
            jax.profiler.start_trace(args.profile)
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, metrics = fused_step(state, images, labels, poses, focal,
                                        jax.random.fold_in(key, 2 + i))
        np.asarray(metrics["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        if args.profile:
            jax.profiler.stop_trace()
        print(f"train step B={batch}: {dt * 1e3:7.2f} ms -> {batch / dt:6.1f} img/s")


if __name__ == "__main__":
    main()
