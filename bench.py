#!/usr/bin/env python
"""Driver benchmark: ongrid Bader partition throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (matches the BASELINE.md north star): end-to-end ongrid partition
of a 384^3 synthetic charge density — ascent stencil (f64), one-shot Pallas
label chase (dense basin labels), and per-basin charge/volume segment sums —
all on device, with only scalar host syncs.  A 512^3 run is timed as well
and reported on stderr.  Each size runs in its own process so HBM is clean.

vs_baseline: ratio to the reference CPU implementation's estimated ongrid
throughput.  pybader publishes no numbers; 8.0 Mvoxel/s is our estimate for
its 8-thread ongrid phase (numba path-following at ~1 Mvoxel/s/thread), see
BASELINE.md.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

REFERENCE_CPU_VOXELS_PER_SEC = 8.0e6  # estimated pybader 8-thread ongrid


def synthetic_density(shape, n_blobs=60, seed=1, blur=400.0):
    """Smooth periodic blob field, a stand-in for a molecular CHGCAR."""
    rng = np.random.default_rng(seed)
    rho = np.zeros(shape)
    idx = tuple(rng.integers(0, s, size=n_blobs) for s in shape)
    rho[idx] = rng.uniform(1.0, 3.0, size=n_blobs)
    k2 = sum(
        np.fft.fftfreq(s).reshape([-1 if i == d else 1 for i in range(3)]) ** 2
        for d, s in enumerate(shape)
    )
    rho = np.real(np.fft.ifftn(np.fft.fftn(rho) * np.exp(-k2 * blur)))
    return np.ascontiguousarray(rho - rho.min() + 1e-9)


def run_one(size: int):
    """Benchmark one grid size; returns (best_seconds, n_basins, charge)."""
    import jax
    import jax.numpy as jnp

    from pybader_tpu import grid
    from pybader_tpu.ops.stencil import ongrid_step_codes
    from pybader_tpu.ops import pallas_chase

    shape = (size, size, size)
    n = int(np.prod(shape))
    lattice = np.diag([20.0, 20.0, 20.0])
    rho = synthetic_density(shape)
    w = tuple(grid.distance_weights(lattice, shape))
    rho_dev = jnp.asarray(rho)
    rho_dev.block_until_ready()
    # vacuum masking at the CLI's 'auto' tolerance scale — the realistic
    # workload, and it suppresses meaningless one-voxel noise basins in the
    # near-zero background of the synthetic field
    vac_tol = 1e-3 * float(rho.max())
    use_pallas = (
        jax.default_backend() != "cpu"
        and pallas_chase.supports_shape(shape)
    )

    def partition_e2e():
        from pybader_tpu.ops import reductions

        vac = rho_dev <= vac_tol
        if use_pallas:
            from pybader_tpu.ops.pallas_stencil import ongrid_step_codes_dd

            bk = ongrid_step_codes_dd(rho_dev, w)
        else:
            bk = ongrid_step_codes(rho_dev, w)
        bk = jnp.where(vac, jnp.uint8(13), bk)
        if use_pallas:
            labels, n_max = pallas_chase.labels_oneshot(bk, vac)
        else:
            from pybader_tpu.ops.pointer import resolve_roots
            from pybader_tpu.ops.stencil import parent_from_step_codes

            parent = parent_from_step_codes(bk)
            roots = resolve_roots(parent).reshape(-1)
            is_max = (bk == 13) & ~vac
            mx = jnp.sort(
                jnp.where(
                    is_max.reshape(-1),
                    jnp.arange(roots.size, dtype=jnp.int32),
                    jnp.int32(roots.size),
                )
            )
            n_max = int(jnp.sum(is_max))
            labels = jnp.where(
                vac.reshape(-1), jnp.int32(-1),
                jnp.searchsorted(mx, roots).astype(jnp.int32),
            ).reshape(shape)
        charge, counts = reductions.charge_volume_sum(
            rho_dev, labels, 1.0, max(int(n_max), 1)
        )
        return int(n_max), float(jnp.sum(charge)), counts

    n_max, total, _ = partition_e2e()  # warm / compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        partition_e2e()
        times.append(time.perf_counter() - t0)
    return min(times), n_max, total


def main():
    if len(sys.argv) > 1 and sys.argv[1].startswith("--size="):
        size = int(sys.argv[1].split("=")[1])
        best, n_max, total = run_one(size)
        print(json.dumps({"size": size, "best": best, "n_max": n_max,
                          "total": total}))
        return

    results = {}
    for size in (384, 512):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), f"--size={size}"],
            capture_output=True, text=True,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"  size {size} failed:\n{proc.stderr[-2000:]}",
                  file=sys.stderr)
            continue
        r = json.loads(line[-1])
        n = size ** 3
        results[size] = r
        print(
            f"  {size}^3: {r['best']:.3f}s e2e, {n / r['best'] / 1e6:.1f} "
            f"Mvox/s, {r['n_max']} basins, charge {r['total']:.3f}",
            file=sys.stderr,
        )

    if 384 not in results:
        print(json.dumps({
            "metric": "ongrid_partition_voxels_per_sec_384cube",
            "value": 0.0, "unit": "voxel/s", "vs_baseline": 0.0,
        }))
        return
    best = results[384]["best"]
    vox_per_sec = 384 ** 3 / best
    print(json.dumps({
        "metric": "ongrid_partition_voxels_per_sec_384cube",
        "value": round(vox_per_sec, 1),
        "unit": "voxel/s",
        "vs_baseline": round(vox_per_sec / REFERENCE_CPU_VOXELS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
