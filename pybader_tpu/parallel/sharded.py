"""Sharded (multi-chip) partitioning pipeline.

The density grid is sharded over a 2-D mesh ('x', 'y' — the first two grid
axes); z stays replicated-contiguous so the innermost dimension keeps good
layout.  Under jit+SPMD, XLA lowers:
 - the 26-neighbour rolls of the ascent stencil to halo exchanges
   (collective-permute) over ICI,
 - the pointer-doubling gathers to all-gather + local gather rounds,
 - the segment reductions to local segment-sums + psum.

This module is exercised on a virtual CPU mesh in tests and by the driver's
``dryrun_multichip``; on real hardware the same code spans a TPU slice.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pybader_tpu.ops.stencil import ongrid_parent, self_index
from pybader_tpu.ops.pointer import resolve_roots


def _factor2(n: int):
    """n -> (a, b), a*b == n, as square as possible."""
    a = int(np.sqrt(n))
    while n % a:
        a -= 1
    return max(a, 1), n // max(a, 1)


def make_mesh(n_devices: int | None = None, axis_names=("x", "y")) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    a, b = _factor2(len(devs))
    return Mesh(np.asarray(devs).reshape(a, b), axis_names)


def choose_grid_spec(mesh: Mesh, shape) -> P:
    """Pick a PartitionSpec for a 3-D grid compatible with its dimensions.

    Prefers sharding the two leading axes over the two mesh axes (z stays
    contiguous for layout); falls back to partial sharding or replication
    when grid dimensions don't divide the mesh factors.
    """
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    x, y = mesh.axis_names

    def ok(spec):
        for dim, s in zip(shape, spec):
            if s is None:
                continue
            axes = s if isinstance(s, tuple) else (s,)
            factor = int(np.prod([sizes[a] for a in axes]))
            if dim % factor:
                return False
        return True

    candidates = [
        P(x, y, None), P(y, x, None),
        P((x, y), None, None), P(None, (x, y), None),
        P(None, None, (x, y)),
        P(x, None, None), P(y, None, None),
        P(None, x, None), P(None, y, None),
        P(),
    ]
    for spec in candidates:
        if ok(spec):
            return spec
    return P()


@partial(jax.jit, static_argnames=("weights", "num_buckets"))
def _partition_step(density, weights, num_buckets=128):
    """One full partition 'step': parents -> roots -> summary reductions.

    This is the flagship compiled program: stencil (halo exchanges),
    pointer doubling (gathers), and segment reductions, all under one jit so
    SPMD partitioning spans the whole pipeline.  Returns small arrays only
    (no host round-trip of the grid).
    """
    parent = ongrid_parent(density, weights, None)
    roots = resolve_roots(parent)
    self_idx = self_index(density)
    n_maxima = jnp.sum(roots == self_idx)
    # bucketed charge reduction (dense labels need a host round-trip for
    # the maxima count; buckets exercise the same sharded segment-sum path)
    buckets = jnp.remainder(roots.reshape(-1), num_buckets)
    charge = jax.ops.segment_sum(
        density.reshape(-1), buckets, num_segments=num_buckets
    )
    return roots, n_maxima, charge


def sharded_step(mesh: Mesh, density, weights):
    """Run the fused partition step with the grid sharded over the mesh.

    returns (roots, n_maxima, bucketed_charge) with roots sharded like the
    input density.
    """
    density = jnp.asarray(density)
    grid_sharding = NamedSharding(mesh, choose_grid_spec(mesh, density.shape))
    density = jax.device_put(density, grid_sharding)
    fn = jax.jit(
        _partition_step,
        static_argnames=("weights", "num_buckets"),
        in_shardings=(grid_sharding,),
        out_shardings=(
            grid_sharding,
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P()),
        ),
    )
    return fn(density, tuple(weights))


def sharded_partition(mesh: Mesh, reference, vacuum, weights):
    """Full labelled partition on a mesh (host compaction like pipeline)."""
    from pybader_tpu.ops.pointer import label_volumes

    reference = jnp.asarray(reference)
    grid_sharding = NamedSharding(mesh, choose_grid_spec(mesh, reference.shape))
    reference = jax.device_put(reference, grid_sharding)
    vac = None
    if vacuum is not None:
        vac = jax.device_put(jnp.asarray(vacuum), grid_sharding)
    parent = jax.jit(
        ongrid_parent, static_argnames=("weights",),
        out_shardings=grid_sharding,
    )(reference, tuple(weights), vac)
    return label_volumes(parent, vac)
