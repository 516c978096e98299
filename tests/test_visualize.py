"""Visualization CLI tests: log parsing, keyword extraction, plot output."""
import os

import numpy as np

from crossloc_tpu.cli.visualize import (
    extract_keyword_series,
    main,
    moving_average,
    parse_training_log,
    plot_pose_error_cdf,
)


def _write_log(path, n=50):
    with open(path, "w") as f:
        for i in range(n):
            f.write(
                f"2026-01-01, INFO: Iteration: {i * 2:7d}, Epoch: {i // 10:3d}, "
                f"Total loss: {100 - i}.50, Valid: {i}.0%, Avg Time: 0.100s\n"
            )


class TestVisualize:
    def test_parse_training_log(self, tmp_path):
        log = str(tmp_path / "output.log")
        _write_log(log)
        s = parse_training_log(log)
        assert len(s["loss"]) == 50
        assert s["iteration"][-1] == 98
        assert s["loss"][0] == 100.5

    def test_keyword_extraction(self, tmp_path):
        log = str(tmp_path / "output.log")
        _write_log(log)
        vals = extract_keyword_series(log, "Total loss")
        assert len(vals) == 50 and vals[0] == 100.5

    def test_moving_average(self):
        y = moving_average(np.arange(10.0), 5)
        np.testing.assert_allclose(y[0], 2.0)

    def test_main_writes_plots(self, tmp_path):
        log = str(tmp_path / "output.log")
        _write_log(log)
        main([log])
        assert (tmp_path / "training_curves.png").exists()
        main([log, "--keywords", "Total loss", "Valid"])
        assert (tmp_path / "keywords.png").exists()

    def test_pose_cdf(self, tmp_path, rng):
        out = str(tmp_path / "cdf.png")
        plot_pose_error_cdf(rng.uniform(0, 10, 100), rng.uniform(0, 5, 100), out)
        assert os.path.exists(out)

    def test_pose_cdf_cli_from_eval_artifacts(self, tmp_path, rng, capsys):
        """`--pose_errors` renders a CDF from the eval layer's own artifacts:
        a *_pose_errors.npy (written by eval.reports.scene_coords_report) and
        a --save_pred npz dump, mixed in one invocation."""
        from crossloc_tpu.cli.visualize import load_pose_errors

        npy = tmp_path / "val_sim_model.net_pose_errors.npy"
        np.save(str(npy), np.stack([rng.uniform(0, 10, 20), rng.uniform(0, 5, 20)], axis=1))
        pred_dir = tmp_path / "pred"
        pred_dir.mkdir()
        np.savez(str(pred_dir / "frame0.npz"), pose_t_err=3.0, pose_r_err=1.5)

        t, r = load_pose_errors([str(npy), str(pred_dir)])
        assert len(t) == 21 and len(r) == 21 and t[-1] == 3.0 and r[-1] == 1.5

        out = str(tmp_path / "results_info.png")
        main(["--pose_errors", str(tmp_path), "--out", out])
        assert os.path.exists(out)
        # directory scan prefers *_pose_errors.npy and ignores npz dumps
        # when one exists (double-counting guard, ADVICE r2): 20, not 21
        assert "Saved pose-error CDF (20 frames" in capsys.readouterr().out

        # a directory with ONLY npz dumps falls back to them
        t2, r2 = load_pose_errors([str(pred_dir)])
        assert len(t2) == 1 and t2[0] == 3.0 and r2[0] == 1.5

    def test_pose_cdf_npz_only_sibling_run_not_suppressed(self, tmp_path, rng):
        """The double-count guard is per-run-directory, not per-tree: a parent
        dir mixing an npy-producing run with an older npz-only sibling run
        must keep the npz-only run's frames (round-3 self-review finding)."""
        from crossloc_tpu.cli.visualize import load_pose_errors

        run_a = tmp_path / "runA"
        run_a.mkdir()
        np.save(str(run_a / "val_sim_model.net_pose_errors.npy"),
                np.stack([rng.uniform(0, 10, 20), rng.uniform(0, 5, 20)], axis=1))
        # runA's own npz dump is covered by its npy and must be suppressed
        (run_a / "coord_pred").mkdir()
        np.savez(str(run_a / "coord_pred" / "frame0.npz"),
                 pose_t_err=99.0, pose_r_err=99.0)
        run_b = tmp_path / "runB"
        run_b.mkdir()
        np.savez(str(run_b / "frame0.npz"), pose_t_err=3.0, pose_r_err=1.5)

        t, r = load_pose_errors([str(tmp_path)])
        assert len(t) == 21 and 3.0 in t and 99.0 not in t

    def test_report_writes_pose_errors_npy(self, tmp_path):
        """scene_coords_report persists per-frame (t, r) errors for the CDF CLI."""
        from crossloc_tpu.eval.reports import scene_coords_report

        net = tmp_path / "model.net"
        net.touch()
        scene_coords_report(
            t_err_ls=[1.0, 2.0], r_err_ls=[0.5, 0.7],
            est_xyz_ls=[[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]],
            coords_error_ls=[np.ones(4), np.ones(4)],
            testing_log=str(tmp_path / "testing.log"), network_path=str(net),
            section="val_sim", file_name_ls=["a.png", "b.png"])
        errs = np.load(str(tmp_path / "val_sim_model.net_pose_errors.npy"))
        np.testing.assert_allclose(errs, [[1.0, 0.5], [2.0, 0.7]])
