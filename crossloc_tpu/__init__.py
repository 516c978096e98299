"""crossloc_tpu — a TPU-native (JAX/XLA/Pallas/pjit) visual localization framework.

A ground-up rebuild of the capabilities of TOPO-EPFL/CrossLoc (CVPR 2022):
scene-coordinate regression FCNs with cross-modal mid-level-representation
encoders, multi-task losses (coord / depth / normal / semantics, optional
MLE uncertainty), and a fully differentiable, batched RANSAC PnP pose solver
that replaces the reference's C++/OpenCV `dsacstar` plugin with one
jit-compiled XLA program.

Package layout (see SURVEY.md §7):
  geometry/  pure-jnp camera model, SE(3), Rodrigues, Kabsch, P3P
  ransac/    differentiable RANSAC: sample -> score -> softmax -> refine
  models/    flax encoder / decoder / MLR composition (NHWC, GroupNorm)
  losses/    coord reprojection+MLE, depth, normal (az/el), semantics
  data/      dataset-contract reader, device-side augmentation
  train/     jit/pjit train step, optax optimizer, checkpoint/resume
  parallel/  mesh + sharding helpers (data / hypothesis parallelism)
  eval/      metric suite, results_*.txt writers, checkpoint selection
  cli/       arg-compatible entry points
  compat/    torch `.net` checkpoint import/export, output-dir naming grammar
"""

__version__ = "0.1.0"
