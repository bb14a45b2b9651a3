"""deblurgs_tpu — TPU-native Gaussian-splatting framework for camera-motion-deblur training.

A from-scratch JAX/XLA/Pallas framework with the capabilities of DeblurGS
(reference: taekkii/deblurgs — "DeblurGS: Gaussian Splatting for Camera Motion Blur"):

- a differentiable, tile-binned 3D Gaussian splatting rasterizer (``ops/``) whose
  hot compositing loop runs as Pallas TPU kernels with a hand-written backward pass,
  producing gradients w.r.t. Gaussian parameters *and* camera view/projection matrices;
- blur synthesis as the mean of N sub-frame renders along per-image learnable SE(3)
  Bézier camera trajectories with shutter-alignment parameters (``models/motion.py``);
- densification annealing, temporal-smoothness / depth-TV / hinge losses and
  tonemapping as pure JAX transforms inside one jitted train step (``train/``);
- COLMAP / Blender ingestion, PLY import/export, checkpointing and evaluation
  (``data/``, ``eval/``);
- multi-device scale-out over a ``jax.sharding.Mesh`` (``parallel/``).

Everything is a pytree + a pure function; the full train step jit-compiles with
static shapes (variable Gaussian counts become static capacity + active masks).

Matrix convention (matches the reference, diff-gaussian-rasterization):
row-vector transforms. A world point ``p`` maps to view space as ``p_hom @ view``
where ``view`` is the *transposed* world-to-view matrix (reference
``scene/cameras.py:56-58``). ``full_proj = view @ proj``.
"""

__version__ = "0.1.0"

import jax as _jax

# This framework has no MXU-bound matmuls: its FLOPs are elementwise VPU work
# in the rasterizer. The matmuls that *do* exist are tiny 3x3/4x4 camera,
# covariance and Lie-group products whose numerics must be f32-exact for
# gradient parity with the reference CUDA renderer — on TPU the default
# matmul precision is bfloat16, which breaks that. Force full precision.
_jax.config.update("jax_default_matmul_precision", "highest")
