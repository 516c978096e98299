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
