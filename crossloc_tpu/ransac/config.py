"""RANSAC solver configuration.

Defaults mirror the reference evaluation setup (`test_single_task.py:76-89`,
`utils/evaluation.py:161-172`): 64 hypotheses, inlier tau = 10 px,
alpha = 100, max pixel error = 100, subsample 8. The unbounded retry /
convergence loops of the C++ plugin (`dsacstar.cpp:47-48`,
`dsacstar_util.h:540-563`) become static-shape equivalents:
`sample_rounds` masked retry rounds and `refine_steps` fixed refinement
iterations with monotone inlier-count acceptance.
"""
from __future__ import annotations

from typing import NamedTuple


class RansacConfig(NamedTuple):
    hypotheses: int = 64  # RANSAC pool size (reference: "hypotheses")
    inlier_threshold: float = 10.0  # px, tau
    inlier_alpha: float = 100.0  # soft inlier count scale
    max_pixel_error: float = 100.0  # reprojection clamp (maxReproj)
    subsample: int = 8  # prediction grid stride
    # static retry rounds per hypothesis. Re-tuned at full-f32 solver
    # precision (the earlier 8-vs-16 tie was measured under the TPU
    # default-precision bug): 16 scores median 0.185 m vs 8's 0.192 on the
    # plugin-parity oracle (plugin: 0.176 — 1.05x vs 1.09x) for ~8% solver
    # cost, negligible fused (<1%); 4 degrades to 0.226. BENCH_NOTES.md r2.
    sample_rounds: int = 16
    refine_steps: int = 8  # outer refine iterations (inlier recompute)
    gn_iters: int = 3  # Gauss-Newton steps per refine iteration
    gn_damping: float = 1e-4  # Marquardt damping (scales diag(J^T J))
    polish_iters: int = 2  # unconditional final GN polish rounds
    train_refine_steps: int = 4  # cheaper refinement inside the DSAC loss
    # eval-time winner selection: "soft" = argmax of the softmax over soft
    # inlier scores (the reference's `draw` at eval, `dsacstar_util.h:727-752`);
    # "hard" = argmax of the hard inlier count (consensus). Training always
    # samples from the soft distribution (the differentiable DSAC path).
    eval_selection: str = "soft"
    # unroll the refinement fori_loops: True is fastest on TPU (no loop
    # overhead, full fusion); False keeps the rolled loop — XLA *CPU*
    # compile of the unrolled refine graph under shard_map ran for tens of
    # minutes (tests/test_sharded_solver.py), the rolled one is seconds
    unroll: bool = True
    # eval-time: refine the K highest-scoring hypotheses and select the
    # winner AFTER refinement by its final soft-inlier score. K=1 is the
    # reference semantics (refine only the pre-selected winner,
    # `dsacstar.cpp:140-149`); the round-3 oracle diagnosis measured ~35%
    # of the median translation error to be pre-refinement selection noise
    # that post-refinement selection recovers (BENCH_NOTES round 3).
    refine_top_k: int = 1


class PoseLossConfig(NamedTuple):
    """Pose loss weights (`dsacstar_loss.h:67-85` defaults)."""

    w_rot: float = 1.0  # per degree
    w_trans: float = 1.0  # per meter
    soft_clamp: float = 100.0  # sqrt clamp above this ("cut")
    max_loss: float = 1.0e7  # MAXLOSS
