"""End-to-end CLI integration tests over the synthetic on-disk dataset:
train -> checkpoint files -> evaluate -> results text -> select_ckpt,
plus the MLR finetune wiring. (SURVEY.md §4: the reference has no tests;
this is the validation-sweep-as-test flow made automatic.)
"""
import os
import re

import numpy as np
import pytest

from crossloc_tpu import compat, data, models
from crossloc_tpu.cli import select_ckpt as select_cli
from crossloc_tpu.cli import test_single_task as test_cli
from crossloc_tpu.cli import train_single_task as train_cli
from crossloc_tpu.cli import finetune_decoder_single_task as ft_cli

IMG_H, IMG_W, FOCAL = 96, 144, 120.0


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """datasets/urbanscape/{train_sim,val_drone_real,...} + cwd for outputs."""
    root = tmp_path_factory.mktemp("ws")
    scene_dir = root / "datasets" / "urbanscape"
    for section, seed in [
        ("train_sim", 0), ("val_drone_real", 1), ("val_drone_sim", 2), ("train_drone_real", 3),
    ]:
        data.write_fake_dataset(str(scene_dir / section), n=4, img_h=IMG_H, img_w=IMG_W,
                                focal=FOCAL, seed=seed)
    return root


def common_train_args(workspace, task, extra=()):
    return [
        "urbanscape", "--task", task, "--batch_size", "2", "--epochs", "1",
        "--tiny", "--sim_data_chunk", "1.0", "--real_data_chunk", "0.0",
        "--datasets_dir", str(workspace / "datasets"),
        "--image_height", str(IMG_H),
        "--ckpt_dir", str(workspace / "ckpts"),
    ] + list(extra)


class TestTrainCLI:
    def test_coord_training_end_to_end(self, workspace, monkeypatch):
        monkeypatch.chdir(workspace)
        train_cli.main(common_train_args(workspace, "coord", ["--uncertainty", "MLE"]))

        out_dir = workspace / "output" / "urbanscape-coord-unc-MLE-e1-lr0.0002-sim_only-sc1.00-tiny"
        assert out_dir.is_dir()
        assert (out_dir / "model.net").exists()
        assert (out_dir / "FLAG_training_done.nodata").exists()
        log = (out_dir / "output.log").read_text()
        # reference log-line format (train_single_task.py:307-309)
        m = re.findall(
            r"Iteration:\s+\d+, Epoch:\s+\d+, Total loss: [-\d.]+, Valid: [\d.]+%, Avg Time: [\d.]+s",
            log,
        )
        assert len(m) == 2  # 4 images / batch 2 -> 2 iterations
        ckpt_dir = workspace / "ckpts" / out_dir.name
        assert list(ckpt_dir.glob("ckpt_iter_*.net"))

        # the snapshot must be a loadable torch-format reference checkpoint
        import torch

        state = torch.load(str(out_dir / "model.net"), map_location="cpu", weights_only=False)
        assert "decoder.fc3.weight" in state

    def test_depth_and_normal_training(self, workspace, monkeypatch):
        monkeypatch.chdir(workspace)
        for task in ("depth", "normal"):
            train_cli.main(common_train_args(workspace, task))
            out = workspace / "output" / f"urbanscape-{task}-no_unc-e1-lr0.0002-sim_only-sc1.00-tiny"
            assert (out / "FLAG_training_done.nodata").exists()

    def test_auto_resume(self, workspace, monkeypatch):
        monkeypatch.chdir(workspace)
        args = common_train_args(workspace, "coord", ["--session", "resume", "--epochs", "2"])
        train_cli.main(args)
        out = workspace / "output" / "urbanscape-coord-sresume-no_unc-e2-lr0.0002-sim_only-sc1.00-tiny"
        log_len_before = len((out / "output.log").read_text().splitlines())
        # same config + --auto_resume: reuses the dir, appends to the log,
        # and skips already-finished epochs (train_single_task.py:221-239)
        train_cli.main(args + ["--auto_resume"])
        log = (out / "output.log").read_text()
        assert "Automatic resume training" in log
        assert len(log.splitlines()) > log_len_before
        assert log.count("=== Epoch: 0 ===") == 1  # epoch 0 not re-run

    def test_epoch_plus_extension(self, workspace, monkeypatch):
        monkeypatch.chdir(workspace)
        args = common_train_args(workspace, "coord", ["--session", "extend"])
        train_cli.main(args)  # finishes a full -e1 run
        # extend to 2 epochs: finds the finished -e1 sibling by name pattern
        args2 = list(args)
        args2[args2.index("--epochs") + 1] = "2" if "--epochs" in args2 else None
        train_cli.main(args2 + ["--epoch_plus"])
        out2 = workspace / "output" / "urbanscape-coord-sextend-no_unc-e2-lr0.0002-sim_only-sc1.00-tiny"
        assert (out2 / "FLAG_training_done.nodata").exists()
        assert "Epoch extension resume training" in (out2 / "output.log").read_text()


class TestTestCLI:
    @pytest.fixture(scope="class")
    def trained_coord(self, workspace):
        import contextlib

        cwd = os.getcwd()
        os.chdir(workspace)
        try:
            args = common_train_args(workspace, "coord", ["--uncertainty", "MLE",
                                                          "--session", "eval"])
            train_cli.main(args)
        finally:
            os.chdir(cwd)
        return workspace / "output" / "urbanscape-coord-seval-unc-MLE-e1-lr0.0002-sim_only-sc1.00-tiny"

    def test_eval_coord_writes_results(self, workspace, trained_coord, monkeypatch):
        monkeypatch.chdir(workspace)
        test_cli.main([
            "urbanscape", "--task", "coord", "--uncertainty", "MLE", "--tiny",
            "--network_in", str(trained_coord),
            "--section", "val_drone_real",
            "--datasets_dir", str(workspace / "datasets"),
            "--image_height", str(IMG_H),
            "--batch_size", "2",
            "--save_pred",
        ])
        # sweep the checkpoint dir too (validation-script flow)
        test_cli.main([
            "urbanscape", "--task", "coord", "--uncertainty", "MLE", "--tiny",
            "--network_in", str(workspace / "ckpts" / trained_coord.name),
            "--section", "val_drone_real",
            "--datasets_dir", str(workspace / "datasets"),
            "--image_height", str(IMG_H),
            "--batch_size", "2",
        ])
        results = list(trained_coord.glob("results_*task_coord.txt"))
        assert results, "no results txt written"
        text = results[0].read_text()
        # exact format markers scraped by select_ckpt (select_ckpt.py:34-37)
        assert re.search(r"Median Error:\s+\d+.\d+ deg, \d+.\d+ m", text)
        assert re.search(r"5m5deg: \d+.\d+%", text)
        assert list(trained_coord.glob("*_out_xyz_poses.npy"))
        assert list(trained_coord.glob("*_out_xyz_poses.txt"))
        pred_dirs = list(trained_coord.glob("coord_pred_*"))
        assert pred_dirs and list(pred_dirs[0].glob("*.npz"))

    def test_eval_passes_per_image_focal(self, workspace, trained_coord, monkeypatch, capsys):
        """A batch mixing calibrations must reach the solver as [B] focal
        (reference evaluates per-image, `utils/evaluation.py:161-172`), and
        each frame gets the reference's per-image stdout line
        (`utils/evaluation.py:189-190`)."""
        scene_dir = workspace / "datasets" / "urbanscape"
        data.write_fake_dataset(str(scene_dir / "val_mixed_focal"), n=2,
                                img_h=IMG_H, img_w=IMG_W,
                                focal=[FOCAL, 2 * FOCAL], seed=7)
        import crossloc_tpu.ransac as ransac_mod

        orig = ransac_mod.solve_batch
        seen = []

        def spy(coords, focal, image_hw, key, cfg=None, training=False):
            seen.append(getattr(focal, "shape", ()))
            return orig(coords, focal, image_hw, key, cfg) if cfg is not None \
                else orig(coords, focal, image_hw, key)

        monkeypatch.setattr(ransac_mod, "solve_batch", spy)
        monkeypatch.chdir(workspace)
        test_cli.main([
            "urbanscape", "--task", "coord", "--uncertainty", "MLE", "--tiny",
            "--network_in", str(trained_coord / "model.net"),
            "--section", "val_mixed_focal",
            "--datasets_dir", str(workspace / "datasets"),
            "--image_height", str(IMG_H),
            "--batch_size", "2",
        ])
        assert seen and all(s == (2,) for s in seen), f"focal shapes: {seen}"
        out = capsys.readouterr().out
        lines = re.findall(
            r"Rotation Error: \d+\.\d\d deg, Translation Error: \d+\.\d m, "
            r"Mean coord prediction error: \d+\.\d m", out)
        assert len(lines) == 2, f"expected 2 per-image lines, got {len(lines)}:\n{out}"

    def test_eval_summary_printed_to_stdout(self, workspace, trained_coord,
                                            monkeypatch, capsys):
        """Each section's metric block goes to the console byte-identically
        to the results-file block (the reference prints every summary,
        `utils/evaluation.py:231,287,332`)."""
        monkeypatch.chdir(workspace)
        test_cli.main([
            "urbanscape", "--task", "coord", "--uncertainty", "MLE", "--tiny",
            "--network_in", str(trained_coord / "model.net"),
            "--section", "val_drone_real",
            "--datasets_dir", str(workspace / "datasets"),
            "--image_height", str(IMG_H),
            "--batch_size", "2",
        ])
        out = capsys.readouterr().out
        results = (trained_coord / "results_model.net_task_coord.txt").read_text()
        header = "=" * 20 + " Evaluation on section val_drone_real " + "=" * 20
        block = results.rsplit(header, 1)[1].strip("\n")
        assert block.startswith("Accuracy:")
        assert block in out, f"stdout is missing the metric block:\n{block}\n--- stdout:\n{out}"

    def test_ransac_cfg_override(self, workspace, trained_coord, monkeypatch, capsys):
        """--ransac_cfg JSON reaches the solver config (reproduces the
        refine_top_k / eval_selection experiments without code edits)."""
        import crossloc_tpu.ransac as ransac_mod

        orig = ransac_mod.solve_batch
        seen = []

        def spy(coords, focal, image_hw, key, cfg=None, training=False, pp_shift=None):
            seen.append(cfg)
            return orig(coords, focal, image_hw, key, cfg, training, pp_shift)

        monkeypatch.setattr(ransac_mod, "solve_batch", spy)
        monkeypatch.chdir(workspace)
        args = [
            "urbanscape", "--task", "coord", "--uncertainty", "MLE", "--tiny",
            "--network_in", str(trained_coord / "model.net"),
            "--section", "val_drone_real",
            "--datasets_dir", str(workspace / "datasets"),
            "--image_height", str(IMG_H),
            "--batch_size", "2",
        ]
        # JSON floats coerce onto int fields (they feed trace-time static
        # shapes — 64.0 must become 64, not fail deep inside jit; advisor r4)
        test_cli.main(args + ["--ransac_cfg",
                              '{"refine_top_k": 2.0, "eval_selection": "hard"}'])
        assert seen and all(
            c.refine_top_k == 2 and type(c.refine_top_k) is int
            and c.eval_selection == "hard" for c in seen
        ), f"cfgs: {seen}"
        # unknown fields fail fast instead of being silently dropped
        with pytest.raises(ValueError, match="unknown RansacConfig"):
            test_cli.main(args + ["--ransac_cfg", '{"no_such_field": 1}'])
        # non-integral floats on int fields fail fast with a clear message
        with pytest.raises(ValueError, match="expected int"):
            test_cli.main(args + ["--ransac_cfg", '{"refine_top_k": 2.5}'])

    def test_select_ckpt(self, workspace, trained_coord, monkeypatch):
        # selection runs over ckpt_iter_* results (like the reference's
        # validation scripts, which sweep CKPT_DIR); results for model.net
        # carry no iteration number and are not rankable
        ckpt_dir = workspace / "ckpts" / trained_coord.name
        if not list(ckpt_dir.glob("results_ckpt_iter_*task_coord.txt")):
            # self-sufficiency for filtered runs (-k): normally
            # test_eval_coord_writes_results has already swept the ckpt dir
            monkeypatch.chdir(workspace)
            test_cli.main([
                "urbanscape", "--task", "coord", "--uncertainty", "MLE",
                "--tiny", "--network_in", str(ckpt_dir),
                "--section", "val_drone_real",
                "--datasets_dir", str(workspace / "datasets"),
                "--image_height", str(IMG_H), "--batch_size", "2",
            ])
        assert list(ckpt_dir.glob("results_ckpt_iter_*task_coord.txt"))
        monkeypatch.chdir(ckpt_dir)
        select_cli.main(["--task", "coord"])
        flags = list(ckpt_dir.glob("FLAG_SELECTED_ITER_*.nodata"))
        assert flags
        assert (ckpt_dir / "results_overall.txt").exists()

    def test_weight_discovery_filters(self, workspace, trained_coord):
        paths = test_cli.config_weight_path(str(trained_coord))
        assert any(p.endswith("model.net") for p in paths)
        # min filter drops model.net (reference quirk) and keeps ckpts above
        paths2 = test_cli.config_weight_path(str(trained_coord), min_ckpt_iter=0)
        assert all("ckpt_iter_" in os.path.basename(p) for p in paths2)


class TestCompilationCache:
    def test_eval_populates_persistent_cache(self, workspace, monkeypatch, tmp_path):
        """CLI entry points enable the on-disk XLA executable cache (the
        validation scripts run one process per checkpoint — without this
        every invocation recompiles the same fused programs)."""
        monkeypatch.chdir(workspace)
        cache = tmp_path / "xla_cache"
        monkeypatch.setenv("CROSSLOC_COMPILATION_CACHE", str(cache))
        train_cli.main(common_train_args(workspace, "coord", [
            "--uncertainty", "MLE", "--session", "cache"]))
        out = (workspace / "output" /
               "urbanscape-coord-scache-unc-MLE-e1-lr0.0002-sim_only-sc1.00-tiny")
        test_cli.main([
            "urbanscape", "--task", "coord", "--uncertainty", "MLE", "--tiny",
            "--network_in", str(out / "model.net"),
            "--section", "val_drone_real",
            "--datasets_dir", str(workspace / "datasets"),
            "--image_height", str(IMG_H), "--batch_size", "2",
        ])
        entries = list(cache.iterdir())
        assert entries, "no executables written to the persistent cache"


class TestFinetuneCLI:
    def test_mlr_finetune(self, workspace, monkeypatch, tmp_path):
        monkeypatch.chdir(workspace)
        # fabricate task-pretrain weights (random init, correct layout)
        import jax
        import jax.numpy as jnp

        weights = {}
        for task, unc in [("coord", "MLE"), ("depth", "MLE"), ("normal", "MLE")]:
            m = models.build_network(task, uncertainty=unc, tiny=True)
            p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
            d = tmp_path / f"{task}_pretrain"
            d.mkdir(exist_ok=True)
            path = str(d / "model.net")
            compat.save_net(path, p, m)
            weights[task] = path

        ft_cli.main([
            "urbanscape", "--task", "coord", "--uncertainty", "MLE", "--tiny",
            "--batch_size", "2", "--epochs", "1",
            "--sim_data_chunk", "0.0", "--real_data_chunk", "1.0",
            "--real_only",
            "--encoders", "coord", "depth", "normal",
            "--coord_weight", weights["coord"],
            "--depth_weight", weights["depth"],
            "--normal_weight", weights["normal"],
            "--reuse_coord_encoder",
            "--datasets_dir", str(workspace / "datasets"),
            "--image_height", str(IMG_H),
            "--ckpt_dir", str(workspace / "ckpts"),
        ])
        out = (workspace / "output" /
               "urbanscape-coord-decoder_coord_frozen_depth_normal-unc-MLE-e1-lr0.0002-real_only-ip-rc1.00-tiny")
        assert out.is_dir(), os.listdir(workspace / "output")
        assert (out / "FLAG_training_done.nodata").exists()

        # the initialized model.net must contain 3 MLR encoder towers
        import torch

        state = torch.load(str(out / "model.net"), map_location="cpu", weights_only=False)
        assert "mlr_encoder_3.conv1.weight" in state

        # wired coord encoder weights must equal the donor's encoder weights
        # exactly (this is the *initialized* model.net saved before training)
        donor = torch.load(weights["coord"], map_location="cpu", weights_only=False)
        np.testing.assert_allclose(
            np.asarray(state["mlr_encoder_1.conv1.weight"]),
            np.asarray(donor["encoder.conv1.weight"]),
            atol=1e-6,
        )


class TestMultiDeviceCLI:
    def test_data_parallel_training(self, workspace, monkeypatch):
        """Full train CLI over the 8-device virtual CPU mesh."""
        monkeypatch.chdir(workspace)
        train_cli.main(common_train_args(workspace, "coord", [
            "--uncertainty", "MLE", "--session", "dp",
            "--batch_size", "4", "--num_devices", "4",
        ]))
        out = (workspace / "output" /
               "urbanscape-coord-sdp-unc-MLE-e1-lr0.0002-sim_only-sc1.00-tiny")
        assert (out / "FLAG_training_done.nodata").exists()
        log = (out / "output.log").read_text()
        assert "Data-parallel training over 4 devices" in log

    def test_zero_data_parallel_training(self, workspace, monkeypatch):
        """--zero: ZeRO/FSDP parameter+Adam-moment sharding over the DP mesh
        axis, through the full train CLI. Numerical equivalence to replicated
        DP is unit-tested (tests/test_train.py::TestShardingEquivalence::
        test_zero_over_data_train_step_matches_single_device); this drives
        the CLI wiring: shard_params state placement, gather_tree before the
        host-side .net save, and the log-line contract."""
        import torch

        monkeypatch.chdir(workspace)
        train_cli.main(common_train_args(workspace, "coord", [
            "--uncertainty", "MLE", "--session", "zero",
            "--batch_size", "4", "--num_devices", "4", "--zero",
        ]))
        out = (workspace / "output" /
               "urbanscape-coord-szero-unc-MLE-e1-lr0.0002-sim_only-sc1.00-tiny")
        assert (out / "FLAG_training_done.nodata").exists()
        log = (out / "output.log").read_text()
        assert "Data-parallel training over 4 devices with ZeRO parameter sharding" in log
        # the .net written through the gather path must be a valid full state
        # dict (reference key grammar, finite values)
        sd = torch.load(str(out / "model.net"), map_location="cpu", weights_only=False)
        assert "encoder.conv1.weight" in sd
        for k, v in sd.items():
            assert np.isfinite(np.asarray(v)).all(), k

    def test_zero_requires_mesh(self, workspace, monkeypatch):
        """--zero without a device mesh must fail loudly, not silently run
        unsharded."""
        monkeypatch.chdir(workspace)
        with pytest.raises(ValueError, match="--zero requires a device mesh"):
            train_cli.main(common_train_args(workspace, "coord", [
                "--uncertainty", "MLE", "--session", "zerr", "--zero",
            ]))

    def test_data_parallel_eval_matches_single_device(self, workspace, monkeypatch):
        """--num_devices on the eval CLI: batch axis sharded over the mesh,
        tail batch padded (2 frames onto 4 devices) — per-frame pose errors
        must match the single-device run."""
        monkeypatch.chdir(workspace)
        train_cli.main(common_train_args(workspace, "coord", [
            "--uncertainty", "MLE", "--session", "dpeval", "--batch_size", "4",
        ]))
        out = (workspace / "output" /
               "urbanscape-coord-sdpeval-unc-MLE-e1-lr0.0002-sim_only-sc1.00-tiny")
        eval_args = lambda n: [
            "urbanscape", "--task", "coord", "--uncertainty", "MLE", "--tiny",
            "--network_in", str(out / "model.net"),
            "--section", "val_drone_real",
            "--datasets_dir", str(workspace / "datasets"),
            "--image_height", str(IMG_H), "--batch_size", "2",
            "--save_pred", "--num_devices", str(n),
        ]

        def per_frame_errors():
            pred_dir = out / "coord_pred_model.net_val_drone_real"
            return {
                p.name: (float(np.load(p)["pose_t_err"]), float(np.load(p)["pose_r_err"]))
                for p in sorted(pred_dir.glob("*.npz"))
            }

        test_cli.main(eval_args(1))
        single = per_frame_errors()
        test_cli.main(eval_args(4))
        multi = per_frame_errors()
        assert single.keys() == multi.keys() and len(single) > 0
        for name in single:
            np.testing.assert_allclose(multi[name], single[name], rtol=1e-4,
                                       err_msg=name)

    def test_full_state_resume_onto_wider_mesh(self, workspace, monkeypatch):
        """Crash-on-1-chip, resume-on-4: a `.state` checkpoint written by a
        single-device run restores into a DP continuation (restore happens
        host-side, then `parallel.replicate` shards onto the mesh — the
        multi-host-shaped restore path, minus real multi-process).

        Trajectory exactness is pinned by test_exact_adam_resume_vs_weights_only
        (single-device: resumed == uninterrupted bit-for-bit); comparing a
        mixed-device trajectory against any control is meaningless — early
        Adam steps are ~lr*sign(m), so reduction-order noise on near-zero
        gradients flips whole-step signs (measured 4e-4 divergence on conv
        biases after ONE differing epoch). Here we assert the restore itself:
        exact step/epoch bookkeeping, no epoch re-run, and real progress."""
        monkeypatch.chdir(workspace)
        base = lambda sid, extra: common_train_args(
            workspace, "coord", ["--session", sid] + extra)

        train_cli.main(base("meshres", ["--epochs", "1", "--batch_size", "4",
                                        "--ckpt_backend", "msgpack"]))
        out1 = (workspace / "output" /
                "urbanscape-coord-smeshres-no_unc-e1-lr0.0002-sim_only-sc1.00-tiny")
        train_cli.main(base("meshres", ["--epochs", "2", "--epoch_plus",
                                        "--batch_size", "4",
                                        "--ckpt_backend", "msgpack",
                                        "--num_devices", "4"]))
        out = (workspace / "output" /
               "urbanscape-coord-smeshres-no_unc-e2-lr0.0002-sim_only-sc1.00-tiny")
        log = (out / "output.log").read_text()
        # 4 images / batch 4 -> 1 step/epoch; the restored step must be 1
        assert "Restored full train state (step 1): exact optimizer resume from epoch 1." in log
        assert "Data-parallel training over 4 devices" in log
        assert (out / "FLAG_training_done.nodata").exists()
        # the -e1 log is copied into the continuation dir (log-parse resume
        # contract), so epoch 0 appears exactly once — copied, not re-run
        assert log.count("=== Epoch: 0 ===") == 1
        assert log.count("=== Epoch: 1 ===") == 1

        # the DP epoch trained from the restored state: params moved by a
        # finite, one-epoch-sized amount from the epoch-1 snapshot
        pa = self._net_params(out1 / "model.net")
        pb = self._net_params(out / "model_epoch_plus_resume.net")
        assert all(np.isfinite(v).all() for v in pb.values())
        assert any(not np.array_equal(pa[k], pb[k]) for k in pa)
        lr = 2e-4  # one epoch = 1 Adam step; per-param step magnitude <= ~lr
        for k in pa:
            assert np.max(np.abs(pb[k] - pa[k])) <= 3 * lr, k

    def test_full_state_resume_onto_zero_sharded_mesh(self, workspace, monkeypatch):
        """The crash-on-1-chip, resume-on-4 contract with --zero: the restore
        template is gathered from the ZeRO-sharded placement (to_host →
        parallel.gather_tree), the restored host state re-shards through
        shard_params, and the continuation trains on channel-sharded Adam
        moments — every --zero-specific branch of the resume path."""
        monkeypatch.chdir(workspace)
        base = lambda sid, extra: common_train_args(
            workspace, "coord", ["--session", sid] + extra)

        train_cli.main(base("zmeshres", ["--epochs", "1", "--batch_size", "4",
                                         "--ckpt_backend", "msgpack"]))
        train_cli.main(base("zmeshres", ["--epochs", "2", "--epoch_plus",
                                         "--batch_size", "4",
                                         "--ckpt_backend", "msgpack",
                                         "--num_devices", "4", "--zero"]))
        out = (workspace / "output" /
               "urbanscape-coord-szmeshres-no_unc-e2-lr0.0002-sim_only-sc1.00-tiny")
        log = (out / "output.log").read_text()
        assert "Restored full train state (step 1): exact optimizer resume from epoch 1." in log
        assert "with ZeRO parameter sharding" in log
        assert (out / "FLAG_training_done.nodata").exists()
        pb = self._net_params(out / "model_epoch_plus_resume.net")
        assert all(np.isfinite(v).all() for v in pb.values())

    @staticmethod
    def _net_params(path):
        import torch

        sd = torch.load(str(path), map_location="cpu", weights_only=False)
        return {k: np.asarray(v) for k, v in sd.items()}


class TestE2EPoseLossCLI:
    """--e2e_pose_loss: DSAC end-to-end training through the real CLI
    (VERDICT r2 #4). The logged Total loss IS the expected pose loss, so a
    decrease across the e2e phase = lower expected pose error than at the
    phase's start."""

    def test_e2e_trains_and_improves(self, workspace, monkeypatch):
        monkeypatch.chdir(workspace)
        train_cli.main(common_train_args(workspace, "coord", [
            "--session", "e2e", "--epochs", "8", "--e2e_pose_loss",
            "--e2e_warmup_epochs", "2", "--learningrate", "0.001",
        ]))
        out = (workspace / "output" /
               "urbanscape-coord-se2e-no_unc-e2e-e8-lr0.0010-sim_only-sc1.00-tiny")
        assert (out / "FLAG_training_done.nodata").exists(), \
            [p.name for p in (workspace / "output").iterdir()]
        log = (out / "output.log").read_text()
        losses = [float(m) for m in re.findall(r"Total loss: ([-\d.]+)", log)]
        assert len(losses) == 16  # 4 imgs / bs 2 -> 2 steps x 8 epochs
        # e2e phase = epochs 2-7 (steps 4..15); the per-step loss is noisy
        # (per-batch augmentation re-draws the scale/crop geometry every
        # step), so compare 4-step means of the phase's first vs last epochs
        first_e2e = np.mean(losses[4:8])
        last_e2e = np.mean(losses[12:16])
        assert last_e2e < first_e2e, (losses, "expected pose loss did not drop")

        # naming grammar round-trips with the -e2e token
        scene, gray, task, sections, tiny, fullsize, unc = compat.read_meta_info(out.name)
        assert (scene, task, tiny, unc) == ("urbanscape", "coord", True, None)

    def test_e2e_requires_coord_task(self, workspace):
        with pytest.raises(ValueError, match="requires --task coord"):
            train_cli.main(common_train_args(workspace, "depth", ["--e2e_pose_loss"]))


class TestFullStateCheckpointCLI:
    """--ckpt_backend: exact Adam/step resume through the real CLIs
    (VERDICT r2 #2). A crashed-and-resumed run must reproduce the
    uninterrupted run bit-for-bit; the weights-only control must not."""

    def _net_params(self, path):
        import torch

        state = torch.load(str(path), map_location="cpu", weights_only=False)
        return {k: np.asarray(v) for k, v in state.items()}

    def test_exact_adam_resume_vs_weights_only(self, workspace, monkeypatch):
        monkeypatch.chdir(workspace)
        base = lambda sid, extra: common_train_args(
            workspace, "coord", ["--session", sid] + extra)

        # A: uninterrupted 2-epoch run (the ground truth trajectory)
        train_cli.main(base("ckA", ["--epochs", "2", "--ckpt_backend", "msgpack"]))
        out_a = workspace / "output" / "urbanscape-coord-sckA-no_unc-e2-lr0.0002-sim_only-sc1.00-tiny"
        assert list(out_a.glob("state_*.state")), "no .state files written"

        # B: 1 epoch, then epoch_plus extension to 2 with full-state restore
        train_cli.main(base("ckB", ["--epochs", "1", "--ckpt_backend", "msgpack"]))
        train_cli.main(base("ckB", ["--epochs", "2", "--epoch_plus",
                                    "--ckpt_backend", "msgpack"]))
        out_b = workspace / "output" / "urbanscape-coord-sckB-no_unc-e2-lr0.0002-sim_only-sc1.00-tiny"
        log_b = (out_b / "output.log").read_text()
        assert "Restored full train state" in log_b

        # C: control — same crash/resume without full-state checkpoints
        train_cli.main(base("ckC", ["--epochs", "1"]))
        train_cli.main(base("ckC", ["--epochs", "2", "--epoch_plus"]))
        out_c = workspace / "output" / "urbanscape-coord-sckC-no_unc-e2-lr0.0002-sim_only-sc1.00-tiny"

        # epoch_plus legs snapshot to model_epoch_plus_resume.net (reference
        # naming when --network_in initialized the run, utils/learning.py:317)
        pa = self._net_params(out_a / "model.net")
        pb = self._net_params(out_b / "model_epoch_plus_resume.net")
        pc = self._net_params(out_c / "model_epoch_plus_resume.net")
        # exact resume: resumed epoch-1 == uninterrupted epoch-1 (CPU math is
        # deterministic; data order and aug keys are epoch-keyed)
        for k in pa:
            np.testing.assert_array_equal(pa[k], pb[k], err_msg=k)
        # weights-only resume resets Adam moments -> different trajectory
        assert any(not np.array_equal(pa[k], pc[k]) for k in pa), (
            "weights-only control unexpectedly matched the exact-resume run")

    def test_orbax_backend_cli_smoke(self, workspace, monkeypatch):
        monkeypatch.chdir(workspace)
        args = common_train_args(workspace, "coord", [
            "--session", "ckO", "--ckpt_backend", "orbax"])
        train_cli.main(args)
        out = workspace / "output" / "urbanscape-coord-sckO-no_unc-e1-lr0.0002-sim_only-sc1.00-tiny"
        assert (out / "FLAG_training_done.nodata").exists()
        # auto_resume restores the orbax state (epochs already done -> no-op loop)
        train_cli.main(args + ["--auto_resume"])
        assert "Restored full train state" in (out / "output.log").read_text()


class TestMultiHostCLI:
    """Multi-host wiring exercised single-process by monkeypatching the
    process topology (the real DCN transport needs >1 host; everything else
    — global mesh, per-process batch split, write gating — runs here)."""

    @pytest.fixture(scope="class")
    def big_workspace(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("ws_mh")
        data.write_fake_dataset(
            str(root / "datasets" / "urbanscape" / "train_sim"),
            n=32, img_h=IMG_H, img_w=IMG_W, focal=FOCAL, seed=9)
        return root

    def test_batch_size_must_divide_by_process_count(self, big_workspace, monkeypatch):
        monkeypatch.chdir(big_workspace)
        monkeypatch.setattr(train_cli, "_process_topology", lambda: (0, 3))
        with pytest.raises(ValueError, match="divisible by the"):
            train_cli.main(common_train_args(big_workspace, "coord", ["--batch_size", "4"]))

    def test_rank0_trains_globally_and_writes(self, big_workspace, monkeypatch):
        monkeypatch.chdir(big_workspace)
        monkeypatch.setattr(train_cli, "_process_topology", lambda: (0, 2))
        train_cli.main(common_train_args(big_workspace, "coord", [
            "--session", "mh", "--batch_size", "16",
        ]))
        out = (big_workspace / "output" /
               "urbanscape-coord-smh-no_unc-e1-lr0.0002-sim_only-sc1.00-tiny")
        assert (out / "FLAG_training_done.nodata").exists()
        log = (out / "output.log").read_text()
        assert "Multi-host data-parallel training: 2 processes" in log
        # iteration counts GLOBAL samples: local batch 8 x world 2 = 16/step,
        # min-shard 16 items -> 2 steps -> final iteration 32
        assert re.search(r"Iteration:\s+32, Epoch:", log)

    def test_rank1_writes_no_artifacts(self, big_workspace, monkeypatch):
        monkeypatch.chdir(big_workspace)
        monkeypatch.setattr(train_cli, "_process_topology", lambda: (1, 2))
        train_cli.main(common_train_args(big_workspace, "coord", [
            "--session", "mh1", "--batch_size", "16",
        ]))
        out = (big_workspace / "output" /
               "urbanscape-coord-smh1-no_unc-e1-lr0.0002-sim_only-sc1.00-tiny")
        # non-main process: no snapshot, no log file, no FLAG
        assert not (out / "model.net").exists()
        assert not (out / "output.log").exists()
        assert not (out / "FLAG_training_done.nodata").exists()


class TestGrayscaleCLI:
    def test_grayscale_training(self, workspace, monkeypatch):
        monkeypatch.chdir(workspace)
        train_cli.main(common_train_args(workspace, "coord", ["--grayscale", "--session", "gray"]))
        out = (workspace / "output" /
               "urbanscape-coord-sgray-gray-no_unc-e1-lr0.0002-sim_only-sc1.00-tiny")
        assert (out / "FLAG_training_done.nodata").exists()
        # grayscale models have a 1-channel stem conv
        import torch

        state = torch.load(str(out / "model.net"), map_location="cpu", weights_only=False)
        assert state["encoder.conv1.weight"].shape[1] == 1


class TestOtherTaskEval:
    def test_depth_normal_eval(self, workspace, monkeypatch):
        monkeypatch.chdir(workspace)
        for task in ("depth", "normal"):
            out = workspace / "output" / f"urbanscape-{task}-no_unc-e1-lr0.0002-sim_only-sc1.00-tiny"
            if not out.exists():
                train_cli.main(common_train_args(workspace, task))
            test_cli.main([
                "urbanscape", "--task", task, "--tiny",
                "--network_in", str(out),
                "--section", "val_drone_real",
                "--datasets_dir", str(workspace / "datasets"),
                "--image_height", str(IMG_H),
                "--batch_size", "2",
            ])
            results = list(out.glob(f"results_*task_{task}.txt"))
            assert results, f"no {task} results"
            text = results[0].read_text()
            if task == "depth":
                assert re.search(r"absolute relative error, mean:\s+\d+.\d+%", text)
            else:
                assert re.search(r"angular prediction error, mean:\s+\d+.\d+ deg", text)

    def test_semantics_train_and_eval(self, workspace, monkeypatch):
        monkeypatch.chdir(workspace)
        train_cli.main(common_train_args(workspace, "semantics", ["--fullsize"]))
        out = (workspace / "output" /
               "urbanscape-semantics-no_unc-fullsize-e1-lr0.0002-sim_only-sc1.00-tiny")
        assert (out / "FLAG_training_done.nodata").exists()
        test_cli.main([
            "urbanscape", "--task", "semantics", "--tiny", "--fullsize",
            "--network_in", str(out),
            "--section", "val_drone_real",
            "--datasets_dir", str(workspace / "datasets"),
            "--image_height", str(IMG_H),
            "--batch_size", "2",
            "--plot",
        ])
        results = list(out.glob("results_*task_semantics.txt"))
        assert results
        assert re.search(r"Mean IoU, mean:\s+\d+.\d+", results[0].read_text())
        assert list(out.glob("sm_section_*.png"))  # qualitative plots


class TestFullsizeCoord:
    def test_fullsize_coord_train_and_eval(self, workspace, monkeypatch):
        """--fullsize for a NON-semantics task must train at subsample 1
        (the reference flips OUTPUT_SUBSAMPLE 8->1 globally,
        `dataloader/dataloader.py:61,165`, and the loss grid follows,
        `utils/learning.py:29-32`) — round 3 trained coord-fullsize against
        an x·8+4 grid while labels were full-res (VERDICT r3 weak #4)."""
        # training roots get the '-fullsize' scene suffix (`utils/learning.py:
        # 197-200`); eval loads from the PLAIN scene dir (the reference's
        # `_scene = scene + '-fullsize'` in `utils/evaluation.py:34` is dead
        # code — `data_to_load` uses `scene`), so the full-res val section
        # lives under urbanscape/ with its own name
        data.write_fake_dataset(
            str(workspace / "datasets" / "urbanscape-fullsize" / "train_sim"),
            n=4, img_h=IMG_H, img_w=IMG_W, focal=FOCAL, seed=10, fullsize=True)
        data.write_fake_dataset(
            str(workspace / "datasets" / "urbanscape" / "val_fullsize"),
            n=4, img_h=IMG_H, img_w=IMG_W, focal=FOCAL, seed=11, fullsize=True)

        import crossloc_tpu.cli.train_single_task as tst

        captured = {}
        orig_step = tst.make_train_step
        orig_aug = tst.AugmentConfig

        def spy_step(model, tx, task, unc, nodata, coord_cfg, depth_cfg, normal_cfg):
            captured["coord_cfg"] = coord_cfg
            return orig_step(model, tx, task, unc, nodata, coord_cfg, depth_cfg, normal_cfg)

        def spy_aug(*a, **k):
            cfg = orig_aug(*a, **k)
            captured["aug_cfg"] = cfg
            return cfg

        monkeypatch.setattr(tst, "make_train_step", spy_step)
        monkeypatch.setattr(tst, "AugmentConfig", spy_aug)
        monkeypatch.chdir(workspace)
        train_cli.main(common_train_args(workspace, "coord", ["--fullsize"]))

        assert captured["coord_cfg"].subsample == 1, captured["coord_cfg"]
        assert captured["aug_cfg"].subsample == 1, captured["aug_cfg"]
        out = (workspace / "output" /
               "urbanscape-coord-no_unc-fullsize-e1-lr0.0002-sim_only-sc1.00-tiny")
        assert (out / "FLAG_training_done.nodata").exists()

        # behavioral pin of WHY subsample matters: GT fullsize labels fed as
        # predictions are near-perfectly valid under the subsample-1 grid and
        # collapse under the buggy x·8+4 grid (pixels land outside the image)
        import jax.numpy as jnp

        from crossloc_tpu import geometry as geo
        from crossloc_tpu.losses import CoordLossConfig, scene_coords_loss

        s = data.synth_sample(np.random.default_rng(42), img_h=IMG_H,
                              img_w=IMG_W, focal=FOCAL, subsample=1)
        pred = jnp.asarray(s["coord"])[None]
        K = geo.intrinsics(FOCAL, IMG_W, IMG_H)
        pose = jnp.asarray(s["pose"])[None]
        loss1, vr1 = scene_coords_loss(pred, pred, pose, K, None, CoordLossConfig(subsample=1))
        loss8, _ = scene_coords_loss(pred, pred, pose, K, None, CoordLossConfig(subsample=8))
        assert float(vr1) > 0.99, f"subsample-1 valid rate {float(vr1)}"
        assert float(loss1) < 0.01, f"subsample-1 GT loss {float(loss1)}"
        assert float(loss8) > 100.0 * max(float(loss1), 1e-4), (
            f"x·8+4 grid vs full-res labels should blow up the reprojection "
            f"loss: {float(loss8)} vs {float(loss1)}")

        # eval round trip at subsample 1 (fused net + solver on the full grid)
        test_cli.main([
            "urbanscape", "--task", "coord", "--tiny", "--fullsize",
            "--network_in", str(out / "model.net"),
            "--section", "val_fullsize",
            "--datasets_dir", str(workspace / "datasets"),
            "--image_height", str(IMG_H),
            "--batch_size", "2",
            "--hypotheses", "16",
        ])
        results = list(out.glob("results_*task_coord.txt"))
        assert results and re.search(r"Median Error:\s+\d+.\d+ deg, \d+.\d+ m",
                                     results[0].read_text())


class TestSearchDir:
    def test_search_dir_meta_decode(self, workspace, monkeypatch):
        """--search_dir sweeps output/ and decodes scene/task/unc from the
        folder names (test_single_task.py:139-147 + read_mata_info)."""
        monkeypatch.chdir(workspace)
        out = workspace / "output" / "urbanscape-coord-seval-unc-MLE-e1-lr0.0002-sim_only-sc1.00-tiny"
        if not out.exists():
            train_cli.main(common_train_args(workspace, "coord",
                                             ["--uncertainty", "MLE", "--session", "eval"]))
        # read_meta_info defaults pretrain sections to val_drone_sim+real;
        # both fixture sections exist in the workspace
        folder = out.name
        scene, gray, task, sections, tiny, fullsize, unc = compat.read_meta_info(folder)
        assert (scene, task, unc, tiny) == ("urbanscape", "coord", "MLE", True)

        # the full search_dir sweep over the output dir (only this run inside)
        import shutil
        search_root = workspace / "search_me"
        if search_root.exists():
            shutil.rmtree(search_root)
        search_root.mkdir()
        shutil.copytree(out, search_root / folder)
        test_cli.main([
            "--search_dir", "--network_in", str(search_root),
            "--datasets_dir", str(workspace / "datasets"),
            "--image_height", str(IMG_H), "--batch_size", "2",
        ])
        results = list((search_root / folder).glob("results_*task_coord.txt"))
        assert results


class TestBF16CLI:
    def test_bf16_train_and_eval(self, workspace, monkeypatch):
        """--bf16 mixed precision through the full CLI round trip: the
        naming grammar gains a '-bf16' token, the snapshot is a normal
        torch-format .net (f32 params), and the eval CLI localizes with
        bf16 conv compute (bench.py's configuration)."""
        monkeypatch.chdir(workspace)
        train_cli.main(common_train_args(
            workspace, "coord", ["--uncertainty", "MLE", "--bf16"]))
        out = (workspace / "output" /
               "urbanscape-coord-unc-MLE-bf16-e1-lr0.0002-sim_only-sc1.00-tiny")
        assert (out / "FLAG_training_done.nodata").exists()

        import torch

        state = torch.load(str(out / "model.net"), map_location="cpu",
                           weights_only=False)
        assert state["decoder.fc3.weight"].dtype == torch.float32

        test_cli.main([
            "urbanscape", "--task", "coord", "--uncertainty", "MLE", "--tiny",
            "--network_in", str(out / "model.net"),
            "--section", "val_drone_real",
            "--datasets_dir", str(workspace / "datasets"),
            "--image_height", str(IMG_H),
            "--batch_size", "2",
            "--bf16",
        ])
        results = list(out.glob("results_*task_coord.txt"))
        assert results and re.search(
            r"Median Error:\s+\d+.\d+ deg, \d+.\d+ m", results[0].read_text())
