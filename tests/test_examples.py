"""Smoke coverage for the checked-in examples (examples/quickstart.py).

The reference ships no runnable example; quickstart.py is this framework's
"first five minutes" surface, so it must not rot: run it in-process with a
short training budget and assert the full train->solve path produces finite
per-image pose errors.
"""
import importlib.util
import os

import numpy as np

_EX = os.path.join(os.path.dirname(__file__), "..", "examples", "quickstart.py")


def _load_quickstart():
    spec = importlib.util.spec_from_file_location("quickstart_example", _EX)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_quickstart_runs_end_to_end():
    qs = _load_quickstart()
    t_err, r_err = qs.main(steps=30)
    assert t_err.shape == (4,) and r_err.shape == (4,)
    assert np.all(np.isfinite(t_err)) and np.all(np.isfinite(r_err))
    # 30 steps is a smoke budget, not convergence; the solver must still
    # return a sane pose (scene extent is ~metres, MAXLOSS-scale blowups
    # would indicate a broken solve).
    assert np.all(t_err < 1e3) and np.all(r_err <= 180.0)
