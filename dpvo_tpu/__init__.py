"""dpvo_tpu — TPU-native Deep Patch Visual Odometry / SLAM framework.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of
princeton-vl/DPVO (reference mounted read-only at /root/reference): a learned
VO front-end (CNN patch features + recurrent update operator over a sparse
patch graph) with a windowed Gauss-Newton bundle-adjustment back-end, loop
closure, training stack, and evaluation harness.

Layer map (mirrors SURVEY.md section 1):
  lie.py          L0  Lie groups (SO3/RxSO3/SE3/Sim3) as pure-jnp functions
  projective.py   L1  projection / reprojection / analytic Jacobians
  ops/            L2  patchify + correlation + scatter primitives (XLA/Pallas)
  models/         L3  encoders, update operator, VONet, torch-ckpt converter
  ba.py               windowed/global bundle adjustment
  runtime/        L4  fixed-shape device state + host driver (DPVO class)
  loop_closure/   L5  proximity + classical backends
  stream.py,
  evaluation.py,
  plot_utils.py   L6  I/O, metrics, export
  train/          L7  training stack
  parallel/           multi-chip sharding utilities
"""

__version__ = '0.1.0'

from .config import cfg  # noqa: F401
