"""Multi-device sharding of the front-end step.

Two mesh axes (SURVEY §2.7):

* ``chan`` — receivers are embarrassingly parallel (the reference's only
  scalable axis, there iterated sequentially: radio.cxx:151-156); here the
  ``[C, ...]`` batch is sharded with zero collectives.
* ``time`` — the block's time axis is sharded with tiny halo exchanges over
  ICI: FIR histories (K-1 frames), the FM discriminator's previous sample,
  and the spectrum tail travel by ``lax.ppermute``; NCO phase needs no
  exchange at all (closed-form from the block-start phase).
"""

from .mesh import make_mesh, mesh_shape_for
from .sharded import ShardedFrontEnd, sharded_frontend_step

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "ShardedFrontEnd",
    "sharded_frontend_step",
]
