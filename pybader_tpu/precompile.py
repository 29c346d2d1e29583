"""Compilation-cache warm-up — the TPU analog of the reference's JIT cache.

The reference precompiles every numba kernel for every dtype at install time
(/root/reference/pybader/jits.py, entry_points.JIT_caching) so first runs are
fast.  On TPU the equivalent is (a) enabling JAX's persistent compilation
cache so XLA/Mosaic binaries survive across processes, and (b) optionally
tracing the hot programs once on tiny grids so a fresh cache gets seeded.
"""
from __future__ import annotations

import os

import numpy as np

_CACHE_DIR = os.path.expanduser(
    os.path.join("~", ".cache", "bader-tpu", "jax_cache")
)


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at a durable directory."""
    import jax

    path = cache_dir or _CACHE_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path


def warm(shapes=((32, 32, 32),)) -> None:
    """Compile the hot pipeline stages for the given grid shapes."""
    import jax.numpy as jnp

    from pybader_tpu import grid, pipeline
    from pybader_tpu.ops import reductions

    for shape in shapes:
        lattice = np.diag(np.asarray(shape, dtype=np.float64) / 8.0)
        rng = np.random.default_rng(0)
        rho = rng.random(shape) + 0.1
        w = tuple(grid.distance_weights(lattice, shape))
        labels, maxima = pipeline.partition_ongrid(rho, None, w)
        reductions.charge_volume_sum(
            jnp.asarray(rho), labels, grid.voxel_volume(lattice, shape),
            max(len(maxima), 1),
        )
        pipeline.refine_labels(
            "neargrid", ("changed", 1), rho, labels, w,
            grid.t_grad(lattice, shape), verbose=False,
        )


def cache_jit() -> None:  # console-script equivalent of the reference hook
    path = enable_persistent_cache()
    print(f"  Warming JAX compilation cache at '{path}': ", end="")
    warm()
    print("Done.")
