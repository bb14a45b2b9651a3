"""Rasterizer ops: the TPU-native replacement for diff-gaussian-rasterization.

Pipeline (mirrors reference SURVEY.md §3.4, all static shapes):

1. ``preprocess``   — per-Gaussian cull/project/conic/SH (pure jnp, autodiff).
2. ``binning``      — (gaussian, tile) pair expansion via cumsum + searchsorted,
                      lexicographic ``lax.sort`` on (tile, depth), range lookup.
3. ``tile_blend``   — front-to-back alpha compositing per tile: a
                      ``jax.custom_vjp`` with a hand-written back-to-front
                      backward (suffix-reconstruction trick of backward.cu),
                      with XLA and Pallas backends.
4. ``oracle``       — O(P·pixels) autodiff compositor: the correctness anchor.
5. ``rasterize``    — the public ``render()`` gluing 1-3 together.
"""

from deblurgs_tpu.ops.rasterize import RasterizeConfig, render  # noqa: F401
