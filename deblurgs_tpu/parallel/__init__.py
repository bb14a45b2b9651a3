"""Multi-device scale-out: mesh construction + sub-frame sharding.

The reference is strictly single-GPU (SURVEY.md §2.3). Here the sub-frame
axis — f=21 serial renders per step in the reference (``motion.py:141-143``)
— becomes the first-class parallel axis: sub-frames shard across devices via
``shard_map``, Gaussian/curve parameters stay replicated, and gradients
all-reduce over ICI (inserted by GSPMD when the sharded loss is summed).
"""

from deblurgs_tpu.parallel.shard import make_mesh, sharded_subframe_render  # noqa: F401
