"""Assembled-system convergence run on real hardware (VERDICT r4 item 1).

Drives the REAL CLIs end to end — `script_clean_training/encoder_pretrain.sh`
-> `script_clean_validation/validate_encoder_pretrain.sh` — on a learnable
synthetic scene (data/synthetic.py scene="plane": a fixed textured world
plane, so image content is a deterministic function of world geometry and a
net trained on some poses generalizes to held-out poses) at the production
configuration: 480x720, batch 12, --bf16, space-to-depth stems (auto on
TPU), device augmentation with bf16 corner gathers, buffer donation.

The reference trains end to end on its accelerator by construction
(`train_single_task.py:189-330`); this is the equivalent measured fact for
the assembled TPU configuration — per-op exactness tests and CPU
convergence A/Bs cannot catch cross-term compiler surprises (the jax 0.9.0
conv-grad miscompile class), only an assembled run can.

Usage:
  # the passing round-5 protocol (real chip, ~45-60 min):
  python tools/tpu_convergence.py --frames 480 --epochs 100 --lr 2e-3 \
      --const_lr --extend_epochs 50
  python tools/tpu_convergence.py --smoke         # tiny CPU mechanics check (~5 min)
  python tools/tpu_convergence.py --workdir DIR   # keep artifacts in DIR

Prints per-checkpoint held-out median pose errors and ONE final JSON line;
asserts the error trajectory actually drops (learning, not just running).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default=None)
    p.add_argument("--smoke", action="store_true",
                   help="tiny CPU run to verify the harness mechanics")
    p.add_argument("--frames", type=int, default=None, help="train frames")
    p.add_argument("--val_frames", type=int, default=16)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--lr", type=float, default=None,
                   help="override --learningrate (the reference's 2e-4 is "
                        "tuned for ~900k-iteration real-data runs; a "
                        "96-frame synthetic scene needs a higher LR to "
                        "converge within a few thousand steps)")
    p.add_argument("--const_lr", action="store_true",
                   help="disable the MultiStepLR([50,100]x0.5) schedule "
                        "(passes --no_lr_scheduling). The schedule is tuned "
                        "for the reference's 150-epoch real-data runs; on "
                        "the short synthetic run it halves the LR twice "
                        "exactly when coord error is still far from the "
                        "RANSAC inlier basin (run 2 evidence, BENCH_NOTES)")
    p.add_argument("--final_t_max", type=float, default=4.0,
                   help="required final held-out median translation error "
                        "(world units; scene footprint is ~300 units)")
    p.add_argument("--extend_epochs", type=int, default=0,
                   help="after phase 1, run an --epoch_plus extension of N "
                        "epochs with the MultiStepLR schedule ON (the "
                        "epoch-keyed fast-forward resumes at a decayed LR). "
                        "The passing round-5 protocol: --frames 480 "
                        "--epochs 100 --lr 2e-3 --const_lr "
                        "--extend_epochs 50 — a constant 2e-3 plateaus at "
                        "8-12 units of pose error; the decayed extension "
                        "(5e-4) reaches the ~2-unit RANSAC inlier basin "
                        "(BENCH_NOTES round 5: 96.6 -> 2.6 m median)")
    return p.parse_args(argv)


def run(cmd, cwd, env, log_path):
    print(f"+ {' '.join(cmd)}  (log: {log_path})", flush=True)
    with open(log_path, "w") as f:
        rc = subprocess.run(cmd, cwd=cwd, env=env, stdout=f,
                            stderr=subprocess.STDOUT).returncode
    if rc != 0:
        sys.stderr.write(open(log_path).read()[-4000:])
        raise SystemExit(f"command failed rc={rc}: {' '.join(cmd)}")


def main(argv=None):
    args = parse_args(argv)
    smoke = args.smoke
    ws = args.workdir or tempfile.mkdtemp(prefix="tpu_conv.")
    os.makedirs(ws, exist_ok=True)
    print(f"== workdir {ws} ({'smoke/CPU' if smoke else 'production/TPU'})")

    img_h, img_w, focal = (96, 144, 120.0) if smoke else (480, 720, 480.0)
    frames = args.frames or (24 if smoke else 96)
    epochs = args.epochs or (8 if smoke else 75)
    batch = 4 if smoke else 12

    env = dict(os.environ)
    if smoke:
        # CLAUDE.md: PYTHONPATH is REPLACED to skip the TPU sitecustomize hook
        env["PYTHONPATH"] = REPO
        env["JAX_PLATFORMS"] = "cpu"
    else:
        env["PYTHONPATH"] = REPO + (
            os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    env["CKPT_DIR"] = os.path.join(ws, "ckpts")

    for shim in ("train_single_task.py", "test_single_task.py"):
        dst = os.path.join(ws, shim)
        if not os.path.exists(dst):
            os.symlink(os.path.join(REPO, shim), dst)

    print("== 1. synthesize learnable plane-scene dataset")
    synth = (
        "from crossloc_tpu import data\n"
        f"data.write_fake_dataset('datasets/urbanscape/train_sim', n={frames}, "
        f"img_h={img_h}, img_w={img_w}, focal={focal}, seed=0, scene='plane')\n"
        f"data.write_fake_dataset('datasets/urbanscape/val_sim', n={args.val_frames}, "
        f"img_h={img_h}, img_w={img_w}, focal={focal}, seed=1, scene='plane')\n"
        "print('dataset ready')\n"
    )
    run([sys.executable, "-c", synth], ws, env, os.path.join(ws, "synth.log"))

    print(f"== 2. train: coord MLE, {frames} frames x {epochs} epochs, B={batch}")
    extra = (f"--epochs {epochs} --batch_size {batch} --datasets_dir {ws}/datasets "
             f"--image_height {img_h}")
    if not smoke:
        # snapshot cadence 5: the per-epoch model.net pull is ~120 MB of
        # params device->host; through the ~10 MB/s axon tunnel that is
        # ~12 s/epoch of pure save overhead (ckpt_iter_* keeps its own
        # 5-epoch cadence — the sweep's data source is unchanged)
        extra += " --bf16 --snapshot_every_epochs 5"
    if args.lr is not None:
        # appended AFTER the harness's --learningrate 2e-4; argparse last-wins
        extra += f" --learningrate {args.lr}"
    if args.const_lr:
        extra += " --no_lr_scheduling"
    env_tr = dict(env, EXTRA_ARGS=extra)
    depth = "TINY" if smoke else "FULL"
    run(["bash", os.path.join(REPO, "script_clean_training", "encoder_pretrain.sh"),
         "urbanscape", "coord", depth, "1.0", "in_place", "0.0", "MLE", "0"],
        ws, env_tr, os.path.join(ws, "train_driver.log"))

    out_dirs = glob.glob(os.path.join(ws, "output", "urbanscape-coord-*"))
    assert len(out_dirs) == 1, out_dirs
    out_dir = out_dirs[0]

    if args.extend_epochs:
        # Phase 2: --epoch_plus extension with the MultiStepLR schedule ON.
        # The epoch-keyed scheduler fast-forward resumes at the decayed
        # factor (x0.25 past epoch 100) — the LR drop the phase-1 plateau
        # needs, through the production resume path (utils/io.py epoch_plus
        # sibling search, log-parse resume, scheduler fast-forward).
        total = epochs + args.extend_epochs
        print(f"== 2b. epoch_plus extension to {total} epochs (schedule ON)")
        ext = (f"--epochs {total} --epoch_plus --batch_size {batch} "
               f"--datasets_dir {ws}/datasets --image_height {img_h}")
        if not smoke:
            ext += " --bf16 --snapshot_every_epochs 5"
        if args.lr is not None:
            ext += f" --learningrate {args.lr}"
        env_ext = dict(env, EXTRA_ARGS=ext)
        run(["bash", os.path.join(REPO, "script_clean_training",
                                  "encoder_pretrain.sh"),
             "urbanscape", "coord", depth, "1.0", "in_place", "0.0", "MLE", "0"],
            ws, env_ext, os.path.join(ws, "train_ext_driver.log"))

    # training-loss trajectory from the byte-format output.log(s),
    # phase-1 dir first, then the -e{total} extension dir
    losses = []
    for od in sorted(glob.glob(os.path.join(ws, "output", "urbanscape-coord-*")),
                     key=lambda d: int(re.search(r"-e(\d+)-", d).group(1))):
        for line in open(os.path.join(od, "output.log")):
            m = re.search(r"Total loss: ([-\d.]+)", line)
            if m:
                losses.append(float(m.group(1)))
    assert losses, "no loss lines in output.log"
    k = max(1, len(losses) // 20)
    first_loss, last_loss = (sum(losses[:k]) / k, sum(losses[-k:]) / k)
    print(f"train loss: first {first_loss:.2f} -> last {last_loss:.2f} "
          f"({len(losses)} steps)")

    print("== 3. sweep every checkpoint on held-out val_sim")
    ckpt_dirs = glob.glob(os.path.join(ws, "ckpts", "urbanscape-coord-*"))
    assert ckpt_dirs, "no checkpoint dirs"
    for cd in ckpt_dirs:
        env_val = dict(env, EXTRA_ARGS=f"--datasets_dir {ws}/datasets "
                                       f"--image_height {img_h} --batch_size 4",
                       CKPT_DIR=cd, MIN_CKPT_ITER="0")
        run(["bash", os.path.join(REPO, "script_clean_validation",
                                  "validate_encoder_pretrain.sh"),
             "urbanscape", "coord", depth, "MLE", "0"],
            ws, env_val, os.path.join(ws, "val_driver.log"))

    # collect per-checkpoint medians: one results_<ckpt>.net_task_coord.txt
    # per checkpoint (cli/test_single_task.py:266), byte-format
    # `Median Error: %.1f deg, %.2f m` (eval/reports.py:46)
    traj = []
    for cd in ckpt_dirs:
        for res in sorted(glob.glob(os.path.join(cd, "results_*.txt"))):
            it = re.search(r"ckpt_iter_(\d+)", os.path.basename(res))
            for line in open(res):
                m = re.match(r"Median Error: ([-\d.]+) deg, ([-\d.]+) m", line)
                if m:
                    traj.append((int(it.group(1)) if it else -1,
                                 float(m.group(2)), float(m.group(1))))
                    break
    traj.sort()
    assert traj, "no results rows parsed"
    print("\nheld-out pose error per checkpoint (iter, median t, median r):")
    for it, t, r in traj:
        print(f"  iter {it:>8d}: t {t:8.3f}  r {r:8.3f}")

    first_t, final_t = traj[0][1], traj[-1][1]
    best_t = min(t for _, t, _ in traj)
    out = {"metric": "tpu_convergence", "mode": "smoke" if smoke else "tpu",
           "steps": len(losses), "loss_first": round(first_loss, 3),
           "loss_last": round(last_loss, 3), "t_first": first_t,
           "t_final": final_t, "t_best": best_t,
           "r_final": traj[-1][2], "workdir": ws}
    print(json.dumps(out))

    assert last_loss < 0.5 * first_loss, (first_loss, last_loss)
    if smoke:
        # smoke = harness-mechanics check only (a tiny net for a few tiny
        # epochs does not converge in pose; the real run must)
        assert len(traj) >= 2
    else:
        assert final_t < 0.5 * first_t, (first_t, final_t)
        assert final_t < args.final_t_max, (final_t, args.final_t_max)
    print("CONVERGENCE RUN PASSED")
    return out


if __name__ == "__main__":
    main()
