"""Proxy-vs-e2e training A/B (VERDICT r4 weak #3 / item 2).

DSAC*'s core claim — the reason `backward_rgb` (reference
`dsacstar/dsacstar.cpp:200-483`) exists — is that end-to-end expected-pose-
loss training beats the proxy reprojection loss on final pose accuracy.
This measures that claim for our `--e2e_pose_loss` mode, from one SHARED
proxy-pretrained init, with matched step budget, optimizer, LR and data
order, on held-out median pose error.

Two label regimes:
  --labels corrupt (default): training coord labels carry a smooth
    per-frame bias field + gross outliers (the sparse-SfM-init error class
    the e2e mode exists to fix — e2e trains from GT poses only and never
    sees the corrupted labels, while the proxy loss keeps fitting them).
  --labels clean: exact labels; e2e has no information advantage and is
    expected to be ~parity (documents when e2e is NOT worth its cost).

Prints per-arm held-out medians and ONE final JSON line.
Usage: python tools/e2e_ab.py [--labels corrupt|clean] [--pre 600 --cont 300]
CPU, ~15-25 min. Numbers recorded in BENCH_NOTES.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--labels", choices=["corrupt", "clean"], default="corrupt")
    p.add_argument("--pre", type=int, default=600, help="shared pretrain steps")
    p.add_argument("--cont", type=int, default=300, help="per-arm continue steps")
    p.add_argument("--lr_cont", type=float, default=3e-4,
                   help="continue-phase LR for the proxy arm")
    p.add_argument("--lr_e2e", type=float, default=None,
                   help="continue-phase LR for the e2e arm (default: same as "
                        "--lr_cont). DSAC* runs its e2e phase at a far lower "
                        "LR than supervised pretraining (1e-6 vs 1e-4, "
                        "dsacstar train_e2e defaults) because the expected-"
                        "pose-loss gradient through RANSAC is high-variance; "
                        "measured here: at 3e-4 the e2e arm DIVERGES "
                        "(BENCH_NOTES round 5)")
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--platform", choices=["cpu", "tpu"], default="cpu",
                   help="tpu = run on the real chip (sequence it alone; the "
                        "dsac step is ~ms there vs ~9 s/step on this CPU)")
    p.add_argument("--json", type=str, default=None)
    return p.parse_args(argv)


H, W, F = 96, 144, 120.0


def corrupt_labels(labels, rng):
    """Smooth per-frame bias field + 15% gross outliers: spatially
    correlated, like real sparse-init / SfM error (not iid noise)."""
    B, h, w, _ = labels.shape
    yy, xx = np.meshgrid(np.arange(h) / h, np.arange(w) / w, indexing="ij")
    out = labels.copy()
    for i in range(B):
        for c in range(3):
            a, bx, by, ph = rng.uniform(4, 9), rng.uniform(2, 5), rng.uniform(2, 5), rng.uniform(0, 6)
            out[i, ..., c] += a * np.sin(bx * xx + by * yy + ph)
        n_out = int(0.15 * h * w)
        sel = rng.choice(h * w, n_out, replace=False)
        flat = out[i].reshape(-1, 3)
        flat[sel] += rng.uniform(-50, 50, size=(n_out, 3))
    return out


def main(argv=None):
    args = parse_args(argv)
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from crossloc_tpu import data, models, train, ransac
    from crossloc_tpu.data.augment import normalize_images
    from crossloc_tpu.eval.metrics import pose_err
    from crossloc_tpu.train.dsac_step import make_dsac_train_step

    rng = np.random.default_rng(0)
    tr = [data.synth_sample(rng, H, W, F, scene="plane") for _ in range(args.frames)]
    va = [data.synth_sample(rng, H, W, F, scene="plane") for _ in range(12)]
    tri = np.stack([s["image"] for s in tr])
    trc_clean = np.stack([s["coord"] for s in tr])
    trp = np.stack([s["pose"] for s in tr])
    vai = np.stack([s["image"] for s in va])
    vap = np.stack([s["pose"] for s in va])

    if args.labels == "corrupt":
        trc = corrupt_labels(trc_clean, np.random.default_rng(7))
        lbl_err = float(np.mean(np.linalg.norm(trc - trc_clean, axis=-1)))
        print(f"label corruption: mean |delta| = {lbl_err:.2f} units")
    else:
        trc = trc_clean

    mean = list(np.mean(trc_clean, axis=(0, 1, 2)))
    model = models.build_network("coord", tiny=True, mean=mean)
    tri_n = np.asarray(normalize_images(jnp.asarray(tri)))
    vai_n = np.asarray(normalize_images(jnp.asarray(vai)))

    eval_cfg = ransac.RansacConfig()
    solve = jax.jit(lambda sc, k: ransac.solve_batch(sc, F, (H, W), k, eval_cfg))
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))

    def evaluate(params, tag):
        preds = fwd(params, jnp.asarray(vai_n))[..., :3]
        res = solve(preds, jax.random.PRNGKey(99))
        errs = [pose_err(vap[i], np.asarray(res.cam_to_world[i])) for i in range(len(va))]
        t_med = float(np.median([e[0] for e in errs]))
        r_med = float(np.median([e[1] for e in errs]))
        print(f"{tag}: held-out median t={t_med:.3f} r={r_med:.3f}", flush=True)
        return t_med, r_med

    def batches(n_steps, seed):
        order = np.random.default_rng(seed)
        for _ in range(n_steps):
            idx = order.choice(args.frames, size=args.batch, replace=False)
            yield train.TrainBatch(jnp.asarray(tri_n[idx]), jnp.asarray(trp[idx]),
                                   jnp.asarray(trc[idx]), jnp.float32(F))

    # ---- phase 0: shared proxy pretrain
    tx0 = train.make_optimizer(2e-3, no_lr_scheduling=True)
    state = train.create_train_state(model, tx0, jnp.zeros((args.batch, H, W, 3)))
    step0 = jax.jit(train.make_train_step(model, tx0, "coord"))
    for b in batches(args.pre, 1):
        state, m = step0(state, b)
    print(f"pretrain done ({args.pre} steps, loss {float(m['loss']):.2f})")
    t0, r0 = evaluate(state.params, "shared init   ")
    shared_params = jax.tree_util.tree_map(lambda x: x, state.params)

    # ---- arm A: continue with the proxy loss (fresh optimizer, lower LR)
    txA = train.make_optimizer(args.lr_cont, no_lr_scheduling=True)
    stA = train.TrainState(shared_params, txA.init(shared_params), jnp.zeros((), jnp.int32))
    stepA = jax.jit(train.make_train_step(model, txA, "coord"))
    for b in batches(args.cont, 2):
        stA, _ = stepA(stA, b)
    tA, rA = evaluate(stA.params, "proxy-continue")

    # ---- arm B: continue with the expected pose loss (same data order)
    lr_e2e = args.lr_e2e if args.lr_e2e is not None else args.lr_cont
    txB = train.make_optimizer(lr_e2e, no_lr_scheduling=True)
    stB = train.TrainState(shared_params, txB.init(shared_params), jnp.zeros((), jnp.int32))
    stepB = jax.jit(make_dsac_train_step(model, txB))
    key = jax.random.PRNGKey(5)
    for i, b in enumerate(batches(args.cont, 2)):
        key, k = jax.random.split(key)
        stB, mB = stepB(stB, b, k)
    tB, rB = evaluate(stB.params, "e2e-continue  ")

    out = {"metric": "e2e_ab", "labels": args.labels, "platform": args.platform,
           "pre": args.pre, "cont": args.cont, "lr_cont": args.lr_cont,
           "lr_e2e": lr_e2e,
           "init": {"t": t0, "r": r0},
           "proxy": {"t": tA, "r": rA}, "e2e": {"t": tB, "r": rB},
           "t_ratio_e2e_over_proxy": round(tB / max(tA, 1e-9), 4)}
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
