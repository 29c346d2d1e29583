"""Multi-device scaling: grid sharding over a JAX device mesh.

The reference scales via a thread pool over grid chunks with a serial merge
protocol (/root/reference/pybader/thread_handlers.py).  Here the grid is
sharded over a 2-D device mesh; the 26-neighbour stencils become XLA
collective-permute halo exchanges (inserted automatically for the rolled
reads under SPMD partitioning), pointer doubling runs on the global flat
index space, and reductions are ``psum``-style sharded segment sums.
"""
from pybader_tpu.parallel.sharded import (  # noqa: F401
    make_mesh, sharded_partition, sharded_step,
)
