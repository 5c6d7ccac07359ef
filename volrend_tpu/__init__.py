"""volrend_tpu — a TPU-native differentiable PlenOctree volume renderer.

Brand-new JAX/Pallas framework with the capability surface of the reference
C++/CUDA/OpenGL renderer sxyu/volrend (see SURVEY.md), re-designed TPU-first:

- The N3-tree (reference ``src/n3tree.cpp``) becomes an HBM-resident flattened
  octree plus an optional dense leaf-pointer LUT so the per-sample query is a
  single batched gather instead of a serial pointer chase.
- The ray marcher (reference ``include/volrend/cuda/rt_core.cuh``,
  ``shaders/rt.frag``) becomes one JAX program: batched ray generation,
  ray/bbox clip, masked ``lax.while_loop`` march with early termination,
  vectorized SH/SG/ASG basis evaluation and front-to-back compositing.
- What the reference lacks: a hand-written backward pass (pixel loss ->
  per-leaf SH/sigma gradients) and multi-chip/multi-host execution via
  ``shard_map`` over a ``jax.sharding.Mesh`` with gradient ``psum`` over ICI.
"""

from volrend_tpu.utils.options import RenderOptions
from volrend_tpu.models.data_format import DataFormat, BasisType
from volrend_tpu.models.n3tree import N3Tree
from volrend_tpu.ops.camera import Camera

__version__ = "0.1.0"

__all__ = [
    "RenderOptions",
    "DataFormat",
    "BasisType",
    "N3Tree",
    "Camera",
    "__version__",
]
