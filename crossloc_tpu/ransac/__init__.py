"""Differentiable RANSAC pose solvers (RGB PnP + RGB-D Kabsch) and DSAC loss."""
from .config import PoseLossConfig, RansacConfig
from .loss import expected_pose_loss, pose_loss
from .rgbd import RgbdResult, expected_pose_loss_rgbd, solve_rgbd
from .sharded import solve_batch_hypsharded
from .solver import RansacResult, refine_pose, sample_hypotheses, solve_batch

__all__ = [
    "PoseLossConfig",
    "RansacConfig",
    "RansacResult",
    "RgbdResult",
    "expected_pose_loss",
    "expected_pose_loss_rgbd",
    "pose_loss",
    "refine_pose",
    "sample_hypotheses",
    "solve_batch",
    "solve_batch_hypsharded",
    "solve_rgbd",
]
