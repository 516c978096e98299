"""REAL multi-process integration: two OS processes of the train CLI joined
through `jax.distributed` over localhost — exercising the actual collective
transport, `make_array_from_process_local_data` across real process
boundaries, collective orbax checkpointing, and rank-gated file writes.
This upgrades the monkeypatched `TestMultiHostCLI` (which simulates the
topology in-process) into evidence the real transport path works; only the
hardware DCN fabric itself remains out of reach on one machine.

The dataset is 16 IDENTICAL frames: per-batch augmentation draws are
positional ([B]-shaped keys), so with identical images the multiset of
(image, jitter) pairs — and therefore the mean loss and its gradient — is
invariant to how the global batch is assembled from per-process shards.
That makes the 2-process run numerically comparable to a single-process run
of the same global batch, which is exactly the all-reduce correctness
statement.
"""
import os
import shutil
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
IMG_H, IMG_W, FOCAL = 96, 144, 120.0
SCENE_NAME = "urbanscape-coord-smh2p-no_unc-e2-lr0.0002-sim_only-sc1.00-tiny"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _write_identical_dataset(root: str, n: int = 16):
    """n copies of ONE synthetic frame (order-invariant global batches)."""
    from crossloc_tpu import data

    data.write_fake_dataset(root, n=1, img_h=IMG_H, img_w=IMG_W, focal=FOCAL, seed=5)
    for sub in os.listdir(root):
        d = os.path.join(root, sub)
        files = sorted(os.listdir(d))
        if not files:
            continue
        src = files[0]
        ext = src.split("frame_00000")[1]
        for i in range(1, n):
            shutil.copyfile(os.path.join(d, src),
                            os.path.join(d, f"frame_{i:05d}{ext}"))


def _train_args(datasets_dir, ckpt_dir, epochs=2, extra=()):
    return [
        "urbanscape", "--task", "coord", "--batch_size", "16",
        "--epochs", str(epochs), "--tiny",
        "--sim_data_chunk", "1.0", "--real_data_chunk", "0.0",
        "--datasets_dir", str(datasets_dir),
        "--image_height", str(IMG_H),
        "--ckpt_dir", str(ckpt_dir),
        "--session", "mh2p",
    ] + list(extra)


def _launch_rank(rank: int, port: int, cwd: str, cli_args, log_path: str):
    """One train-CLI process joined to the localhost coordinator.

    PYTHONPATH is pinned to the repo root only: that skips this machine's
    sitecustomize TPU hook so JAX_PLATFORMS=cpu is honored (CLAUDE.md), and
    keeps crossloc_tpu importable.
    """
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": REPO_ROOT,
        "JAX_PLATFORMS": "cpu",
        "CROSSLOC_COORDINATOR": f"127.0.0.1:{port}",
        "CROSSLOC_NUM_PROCESSES": "2",
        "CROSSLOC_PROCESS_ID": str(rank),
    })
    env.pop("XLA_FLAGS", None)  # 1 local device per process
    log = open(log_path, "w")
    return subprocess.Popen(
        [sys.executable, "-m", "crossloc_tpu.cli.train_single_task"] + cli_args,
        cwd=cwd, env=env, stdout=log, stderr=subprocess.STDOUT,
    ), log


def _run_both(port, cwds, cli_args, tmp, tag, timeout=900):
    procs = []
    for rank in (0, 1):
        p, log = _launch_rank(rank, port, str(cwds[rank]), cli_args,
                              str(tmp / f"{tag}_rank{rank}.log"))
        procs.append((p, log))
    deadline = time.time() + timeout
    try:
        for rank, (p, _) in enumerate(procs):
            remaining = max(5.0, deadline - time.time())
            try:
                rc = p.wait(timeout=remaining)
            except subprocess.TimeoutExpired:
                for q, _ in procs:
                    q.kill()
                pytest.fail(f"{tag}: rank {rank} timed out after {timeout}s; "
                            f"see {tmp}/{tag}_rank*.log")
            if rc != 0:
                for q, _ in procs:
                    q.kill()
                out = open(str(tmp / f"{tag}_rank{rank}.log")).read()[-4000:]
                pytest.fail(f"{tag}: rank {rank} exited {rc}:\n{out}")
    finally:
        for _, log in procs:
            log.close()


@pytest.mark.slow
class TestTwoProcessLocalhost:
    @pytest.fixture(scope="class")
    def ws(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("mh_real")
        _write_identical_dataset(str(root / "datasets" / "urbanscape" / "train_sim"))
        (root / "rank0").mkdir()
        (root / "rank1").mkdir()
        return root

    def test_two_process_train_matches_single_process(self, ws):
        """2 real processes, global batch 16 (8 per process), 2 epochs:
        rank 1 writes NO artifacts, and rank 0's model.net matches a
        single-process run of the same global batch — the gradient
        all-reduce over the real transport produced the same trajectory."""
        cli_args = _train_args(ws / "datasets", ws / "ckpts")
        _run_both(_free_port(), {0: ws / "rank0", 1: ws / "rank1"},
                  cli_args, ws, "train")

        out0 = ws / "rank0" / "output" / SCENE_NAME
        out1 = ws / "rank1" / "output" / SCENE_NAME
        assert (out0 / "model.net").exists()
        assert (out0 / "FLAG_training_done.nodata").exists()
        log0 = (out0 / "output.log").read_text()
        assert "Multi-host data-parallel training: 2 processes x 1 local devices" in log0
        # iteration counts GLOBAL samples: 16/step, 1 step/epoch, 2 epochs
        assert "Iteration:      32, Epoch:   1" in log0
        # rank 1 (non-main) writes nothing
        if out1.exists():
            assert not (out1 / "model.net").exists()
            assert not (out1 / "output.log").exists()
            assert not (out1 / "FLAG_training_done.nodata").exists()

        # single-process control on the SAME global batch, in-process (the
        # conftest CPU backend): identical-frame dataset makes the comparison
        # order-invariant, so any mismatch is a broken all-reduce
        from crossloc_tpu.cli import train_single_task as train_cli

        single = ws / "single"
        single.mkdir(exist_ok=True)
        cwd = os.getcwd()
        os.chdir(single)
        try:
            train_cli.main(_train_args(ws / "datasets", ws / "ckpts_single"))
        finally:
            os.chdir(cwd)
        out_s = single / "output" / SCENE_NAME

        # per-step losses must agree to every printed digit: step 2's loss is
        # computed AFTER step 1's all-reduced update, so equality means the
        # cross-process gradient psum produced the same trajectory
        import re

        log_s = (out_s / "output.log").read_text()
        losses_mh = re.findall(r"Total loss: ([-\d.]+)", log0)
        losses_sp = re.findall(r"Total loss: ([-\d.]+)", log_s)
        assert losses_mh == losses_sp and len(losses_mh) == 2, (losses_mh, losses_sp)

        import torch

        st_mh = torch.load(str(out0 / "model.net"), map_location="cpu",
                           weights_only=False)
        st_sp = torch.load(str(out_s / "model.net"), map_location="cpu",
                           weights_only=False)
        assert st_mh.keys() == st_sp.keys()
        diffs = sorted(
            float(np.abs(np.asarray(st_mh[k], np.float64)
                         - np.asarray(st_sp[k], np.float64)).max())
            for k in st_mh
        )
        # Parameter bound, not bitwise: reduction order (2-device psum vs one
        # device) perturbs gradients at the ulp level, and Adam's m/sqrt(v)
        # normalization amplifies that to a FULL +-lr step in directions
        # whose true gradient is ~0 (e.g. conv biases feeding GroupNorm are
        # exactly function-invariant). So individual params may differ by up
        # to ~steps*lr = 4e-4 in those null directions (measured: conv1.bias
        # 4.1e-4) while the function — pinned by the loss equality above —
        # is unchanged. Typical (median) params must still agree tightly.
        assert diffs[len(diffs) // 2] < 1e-5, f"median param diff {diffs[len(diffs)//2]}"
        assert diffs[-1] < 3.0 * 2 * 2e-4, f"max param diff {diffs[-1]}"

    def test_zero_two_process_matches_single_process(self, ws):
        """--zero across 2 REAL processes: parameters and Adam moments are
        sharded over the cross-process "data" axis, so each rank holds only
        half of every conv kernel's out-channels. The host-side .net save
        must go through `parallel.gather_tree` (a bare jax.device_get on a
        cross-process-sharded array is not fully addressable). Per-step
        losses and the saved model.net must match a single-process
        replicated run of the same global batch — the same correctness
        statement as the replicated 2-process test, now with ZeRO
        placement + the gather-before-save path over the real transport."""
        zws = ws / "zero"
        zws.mkdir(exist_ok=True)
        (zws / "rank0").mkdir(exist_ok=True)
        (zws / "rank1").mkdir(exist_ok=True)
        cli_args = _train_args(ws / "datasets", ws / "ckpts_zero",
                               extra=["--zero"])
        _run_both(_free_port(), {0: zws / "rank0", 1: zws / "rank1"},
                  cli_args, ws, "zero")

        out0 = zws / "rank0" / "output" / SCENE_NAME
        assert (out0 / "FLAG_training_done.nodata").exists()
        log0 = (out0 / "output.log").read_text()
        assert "with ZeRO parameter sharding" in log0

        # single-process replicated control on the same global batch
        from crossloc_tpu.cli import train_single_task as train_cli

        single = zws / "single"
        single.mkdir(exist_ok=True)
        cwd = os.getcwd()
        os.chdir(single)
        try:
            train_cli.main(_train_args(ws / "datasets", ws / "ckpts_zero_s"))
        finally:
            os.chdir(cwd)
        out_s = single / "output" / SCENE_NAME

        import re

        log_s = (out_s / "output.log").read_text()
        losses_zero = re.findall(r"Total loss: ([-\d.]+)", log0)
        losses_sp = re.findall(r"Total loss: ([-\d.]+)", log_s)
        assert losses_zero == losses_sp and len(losses_zero) == 2, (
            losses_zero, losses_sp)

        import torch

        st_z = torch.load(str(out0 / "model.net"), map_location="cpu",
                          weights_only=False)
        st_s = torch.load(str(out_s / "model.net"), map_location="cpu",
                          weights_only=False)
        assert st_z.keys() == st_s.keys()
        diffs = sorted(
            float(np.abs(np.asarray(st_z[k], np.float64)
                         - np.asarray(st_s[k], np.float64)).max())
            for k in st_z
        )
        # same bounds as the replicated test: Adam amplifies ulp-level
        # reduction-order noise to a full +-lr step in null directions
        assert diffs[len(diffs) // 2] < 1e-5, f"median param diff {diffs[len(diffs)//2]}"
        assert diffs[-1] < 3.0 * 2 * 2e-4, f"max param diff {diffs[-1]}"

    def test_orbax_collective_save_and_exact_resume(self, ws):
        """--ckpt_backend orbax across 2 REAL processes: the save is
        collective (every process participates), and a later 2-process
        --auto_resume run restores the full train state through orbax on
        both ranks and continues."""
        # shared cwd for both ranks here: resume discovery reads the output
        # dir, which must be visible to both (rank gating is already proven
        # by test_two_process_train_matches_single_process)
        shared = ws / "shared"
        shared.mkdir(exist_ok=True)
        args1 = _train_args(ws / "datasets", ws / "ckpts_orbax", epochs=1,
                            extra=["--ckpt_backend", "orbax"])
        _run_both(_free_port(), {0: shared, 1: shared}, args1, ws, "orbax1")

        out = shared / "output" / SCENE_NAME.replace("-e2-", "-e1-")
        assert (out / "FLAG_training_done.nodata").exists()
        # orbax writes numbered step directories into the output dir
        steps = [p for p in os.listdir(out)
                 if p.isdigit() and os.path.isdir(os.path.join(out, p))]
        assert steps, f"no orbax step dir in {os.listdir(out)}"

        # epoch extension: finds the finished -e1 sibling by name pattern
        # and restores its FULL state (optimizer included) through orbax
        args2 = _train_args(ws / "datasets", ws / "ckpts_orbax", epochs=2,
                            extra=["--ckpt_backend", "orbax", "--epoch_plus"])
        _run_both(_free_port(), {0: shared, 1: shared}, args2, ws, "orbax2")
        out2 = shared / "output" / SCENE_NAME
        log = (out2 / "output.log").read_text()
        assert "Restored full train state" in log, log[-2000:]
        assert (out2 / "FLAG_training_done.nodata").exists()
        # epoch 0 was restored, not re-run: the -e2 log INHERITS the -e1
        # run's lines (epoch_plus copies the source log for continuous
        # iteration parsing), so look only after the restore marker
        tail = log.split("Restored full train state", 1)[1]
        assert "=== Epoch: 0 ===" not in tail
        assert "=== Epoch: 1 ===" in tail

    def test_zero_orbax_two_process_save_and_exact_resume(self, ws):
        """--zero composed with --ckpt_backend orbax across 2 REAL
        processes (round-4 verdict weak #4): the end-of-epoch save chains a
        COLLECTIVE all-gather (ZeRO host pull) into a COLLECTIVE orbax save
        — exactly the rank-asymmetry class the real 2-process harness
        already caught once — and --epoch_plus must restore the full train
        state back onto the ZeRO-sharded placement and continue the
        trajectory EXACTLY (validated against a single-process 2-epoch
        control: the post-restore loss must match the control's epoch-1
        loss to every printed digit, which requires the restored Adam
        moments, not just weights)."""
        shared = ws / "shared_zo"
        shared.mkdir(exist_ok=True)
        extra = ["--zero", "--ckpt_backend", "orbax"]
        args1 = _train_args(ws / "datasets", ws / "ckpts_zo", epochs=1,
                            extra=extra)
        _run_both(_free_port(), {0: shared, 1: shared}, args1, ws, "zo1")

        out1 = shared / "output" / SCENE_NAME.replace("-e2-", "-e1-")
        assert (out1 / "FLAG_training_done.nodata").exists()
        log1 = (out1 / "output.log").read_text()
        assert "with ZeRO parameter sharding" in log1
        steps = [p for p in os.listdir(out1)
                 if p.isdigit() and os.path.isdir(os.path.join(out1, p))]
        assert steps, f"no orbax step dir in {os.listdir(out1)}"

        args2 = _train_args(ws / "datasets", ws / "ckpts_zo", epochs=2,
                            extra=extra + ["--epoch_plus"])
        _run_both(_free_port(), {0: shared, 1: shared}, args2, ws, "zo2")
        out2 = shared / "output" / SCENE_NAME
        log2 = (out2 / "output.log").read_text()
        assert "Restored full train state" in log2, log2[-2000:]
        assert (out2 / "FLAG_training_done.nodata").exists()
        tail = log2.split("Restored full train state", 1)[1]
        assert "=== Epoch: 0 ===" not in tail
        assert "=== Epoch: 1 ===" in tail

        # single-process replicated 2-epoch control: the resumed run's
        # epoch-1 loss must continue the exact trajectory
        from crossloc_tpu.cli import train_single_task as train_cli

        single = ws / "zo_single"
        single.mkdir(exist_ok=True)
        cwd = os.getcwd()
        os.chdir(single)
        try:
            train_cli.main(_train_args(ws / "datasets", ws / "ckpts_zo_s"))
        finally:
            os.chdir(cwd)
        import re

        log_s = (single / "output" / SCENE_NAME / "output.log").read_text()
        losses_ctrl = re.findall(r"Total loss: ([-\d.]+)", log_s)
        losses_resumed = re.findall(r"Total loss: ([-\d.]+)", tail)
        assert len(losses_ctrl) == 2 and len(losses_resumed) == 1
        assert losses_resumed[0] == losses_ctrl[1], (losses_resumed, losses_ctrl)
