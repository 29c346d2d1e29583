#!/usr/bin/env python
"""Driver benchmark: ongrid Bader partition throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (matches the BASELINE.md north star): end-to-end ongrid partition
of a 384^3 synthetic charge density — ascent stencil (f64), pointer-chain
resolution, dense basin labelling and per-basin charge/volume sums — all on
device, with only scalar host syncs.  A 512^3 run is timed as well and
reported on stderr.

vs_baseline: ratio to the reference CPU implementation's measured ongrid
throughput.  pybader publishes no numbers; 8.0 Mvoxel/s is our estimate for
its 8-thread ongrid phase (numba path-following at ~1 Mvoxel/s/thread),
see BASELINE.md.
"""
import json
import sys
import time

import numpy as np

REFERENCE_CPU_VOXELS_PER_SEC = 8.0e6  # estimated pybader 8-thread ongrid


def synthetic_density(shape, n_blobs=60, seed=1):
    rng = np.random.default_rng(seed)
    rho = np.zeros(shape)
    idx = tuple(rng.integers(0, s, size=n_blobs) for s in shape)
    rho[idx] = rng.uniform(1.0, 3.0, size=n_blobs)
    k2 = sum(
        np.fft.fftfreq(s).reshape([-1 if i == d else 1 for i in range(3)]) ** 2
        for d, s in enumerate(shape)
    )
    rho = np.real(np.fft.ifftn(np.fft.fftn(rho) * np.exp(-k2 * 120.0)))
    return np.ascontiguousarray(rho - rho.min() + 1e-6)


def main():
    import jax
    import jax.numpy as jnp

    from pybader_tpu import grid
    from pybader_tpu.ops.stencil import (
        ongrid_step_codes, parent_from_step_codes,
    )
    from pybader_tpu.ops.pointer import resolve_roots_auto
    from pybader_tpu.ops.stencil import self_index

    def partition_e2e(rho_dev, weights, max_basins):
        """Full on-device partition: labels + charges + volumes."""
        bk = ongrid_step_codes(rho_dev, weights)
        parent = parent_from_step_codes(bk)
        roots = resolve_roots_auto(parent, bk)
        flat = roots.reshape(-1)
        # dense labelling: unique maxima (device sort) + searchsorted
        maxima_sorted = jnp.unique(
            flat, size=max_basins, fill_value=jnp.iinfo(jnp.int32).max
        )
        labels = jnp.searchsorted(maxima_sorted, flat).astype(jnp.int32)
        charge = jax.ops.segment_sum(
            rho_dev.reshape(-1), labels, num_segments=max_basins
        )
        counts = jax.ops.segment_sum(
            jnp.ones_like(flat, dtype=jnp.float64), labels,
            num_segments=max_basins,
        )
        n_max = jnp.sum(maxima_sorted < jnp.iinfo(jnp.int32).max)
        return labels.reshape(roots.shape), charge, counts, n_max

    results = {}
    for shape in [(384, 384, 384), (512, 512, 512)]:
        n = int(np.prod(shape))
        lattice = np.diag([20.0, 20.0, 20.0])
        rho = synthetic_density(shape)
        w = tuple(grid.distance_weights(lattice, shape))
        rho_dev = jnp.asarray(rho)
        rho_dev.block_until_ready()

        def run():
            labels, charge, counts, n_max = partition_e2e(rho_dev, w, 1 << 17)
            return int(n_max), float(jnp.sum(charge))

        n_max, total = run()  # warm / compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        best = min(times)
        results[shape[0]] = (best, n, n_max, total)
        print(
            f"  {shape}: {best:.3f}s e2e, {n / best / 1e6:.1f} Mvox/s, "
            f"{n_max} basins, total charge {total:.3f}",
            file=sys.stderr,
        )

    best384, n384, _, _ = results[384]
    vox_per_sec = n384 / best384
    print(json.dumps({
        "metric": "ongrid_partition_voxels_per_sec_384cube",
        "value": round(vox_per_sec, 1),
        "unit": "voxel/s",
        "vs_baseline": round(vox_per_sec / REFERENCE_CPU_VOXELS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
