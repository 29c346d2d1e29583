#!/usr/bin/env python
"""Driver benchmark: Bader partition throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline workload (matches the BASELINE.md north star): the PRODUCT ongrid
partition path at 384^3 — `pipeline.partition_ongrid` end-to-end (vacuum
mask, dd-Pallas ascent stencil, one-shot Pallas label chase, discovery-order
renumbering) plus per-basin charge/volume sums.  stderr detail adds 512^3
and the DEFAULT config pipeline (method=neargrid via the documented hybrid,
refine_mode=('changed', 2), maxima->atom assignment, surface distance) —
the reference's acceptance workload (BASELINE.md:28-31).  Each size runs in
its own process so HBM is clean.

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


def synthetic_density(shape, n_blobs=60, seed=1, blur=400.0,
                      return_centers=False):
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
    rho = np.ascontiguousarray(rho - rho.min() + 1e-9)
    if return_centers:
        centers = np.stack(idx, axis=1) / np.asarray(shape)  # fractional
        return rho, centers
    return rho


def _sync_scalar(x):
    """Device sync via a scalar fetch (block_until_ready is unreliable
    through the remote-device tunnel)."""
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def _enable_cache():
    """Persistent XLA cache: each size runs in its own process, and warm
    compiles must survive across them (and across driver runs)."""
    try:
        from pybader_tpu.precompile import enable_persistent_cache

        enable_persistent_cache()
    except Exception as e:  # cache is an optimisation, never a hard fail
        print(f"  (persistent cache unavailable: {e})", file=sys.stderr)


def run_partition(size: int):
    """Product ongrid partition path; returns (best_s, n_basins, charge)."""
    import jax.numpy as jnp

    _enable_cache()

    from pybader_tpu import grid, pipeline
    from pybader_tpu.ops import reductions

    shape = (size, size, size)
    lattice = np.diag([20.0, 20.0, 20.0])
    rho = synthetic_density(shape)
    w = tuple(grid.distance_weights(lattice, shape))
    rho_dev = jnp.asarray(rho)
    _sync_scalar(rho_dev)
    # vacuum masking at the CLI's 'auto' tolerance scale — the realistic
    # workload, and it suppresses meaningless one-voxel noise basins in the
    # near-zero background of the synthetic field
    vac_tol = 1e-3 * float(rho.max())

    def partition_e2e():
        vac = rho_dev <= vac_tol
        labels, maxima = pipeline.partition_ongrid(rho_dev, vac, w)
        n_max = max(len(maxima), 1)
        charge, counts = reductions.charge_volume_sum(
            rho_dev, labels, 1.0, n_max)
        return n_max, float(jnp.sum(charge)), counts

    n_max, total, _ = partition_e2e()  # warm / compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        partition_e2e()
        times.append(time.perf_counter() - t0)
    return min(times), n_max, total


def run_default(size: int):
    """Default-config pipeline (reference acceptance workload).

    method=neargrid (hybrid above 16M voxels), refine_mode=('changed', 2),
    maxima->atom assignment, surface distance, charge sums.
    returns (best_s, n_basins, n_changed).
    """
    import jax.numpy as jnp

    _enable_cache()

    from pybader_tpu import grid, pipeline
    from pybader_tpu.ops import atoms as atoms_ops
    from pybader_tpu.ops import edges as edges_ops
    from pybader_tpu.ops import reductions
    from pybader_tpu.ops.reductions import compact_indices

    shape = (size, size, size)
    lattice = np.diag([20.0, 20.0, 20.0])
    rho, centers = synthetic_density(shape, return_centers=True)
    atoms_cart = centers @ lattice
    w = tuple(grid.distance_weights(lattice, shape))
    tg = grid.t_grad(lattice, shape)
    rho_dev = jnp.asarray(rho)
    _sync_scalar(rho_dev)
    vac_tol = 1e-3 * float(rho.max())

    def default_e2e():
        vac = rho_dev <= vac_tol
        labels, maxima = pipeline.partition_neargrid(rho_dev, vac, w, tg)
        labels, changed = pipeline.refine_labels(
            "neargrid", ("changed", 2), rho_dev, labels, w, tg,
            verbose=False)
        n_max = max(len(maxima), 1)
        # maxima -> atoms, voxel map relabel (ref thread_handlers:78-125)
        mx_cart = (np.asarray(maxima) / np.asarray(shape)) @ lattice
        atom_of_max, _ = atoms_ops.assign_to_atoms(
            jnp.asarray(mx_cart), jnp.asarray(atoms_cart),
            jnp.asarray(lattice))
        atoms_volumes = reductions.relabel(labels, atom_of_max)
        # surface distance (ref thread_handlers:239-297)
        known = edges_ops.edge_find(rho_dev, atoms_volumes)
        edge_mask = (known == -2).reshape(-1)
        n_edges = int(jnp.sum(edge_mask))
        size_pow = max(4096, 1 << (max(n_edges, 1) - 1).bit_length())
        edge_idx = compact_indices(edge_mask, size_pow)[:n_edges]
        dists = atoms_ops.surface_distance_from_edges(
            edge_idx, atoms_volumes.reshape(-1), jnp.asarray(lattice),
            jnp.asarray(atoms_cart), shape, len(atoms_cart))
        charge, counts = reductions.charge_volume_sum(
            rho_dev, atoms_volumes, 1.0, len(atoms_cart))
        _sync_scalar(dists)
        return n_max, int(changed), float(jnp.sum(charge))

    n_max, changed, total = default_e2e()  # warm / compile
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        default_e2e()
        times.append(time.perf_counter() - t0)
    return min(times), n_max, changed


def main():
    if len(sys.argv) > 1 and sys.argv[1].startswith("--size="):
        size = int(sys.argv[1].split("=")[1])
        workload = sys.argv[2] if len(sys.argv) > 2 else "partition"
        if workload == "default":
            best, n_max, changed = run_default(size)
            print(json.dumps({"size": size, "best": best, "n_max": n_max,
                              "changed": changed, "workload": "default"}))
        else:
            best, n_max, total = run_partition(size)
            print(json.dumps({"size": size, "best": best, "n_max": n_max,
                              "total": total, "workload": "partition"}))
        return

    results = {}
    # the headline (384^3 partition) runs FIRST and its JSON line prints
    # immediately: detail workloads that follow are compile-heavy, and a
    # driver-side timeout must not cost the judged metric
    for size, workload in ((384, "partition"), (512, "partition"),
                           (384, "default"), (512, "default")):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), f"--size={size}",
             workload],
            capture_output=True, text=True,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"  {workload} {size} failed:\n{proc.stderr[-2000:]}",
                  file=sys.stderr)
        else:
            r = json.loads(line[-1])
            n = size ** 3
            results[(size, workload)] = r
            print(
                f"  {workload} {size}^3: {r['best']:.3f}s e2e, "
                f"{n / r['best'] / 1e6:.1f} Mvox/s, {r['n_max']} basins",
                file=sys.stderr,
            )
        if (size, workload) == (384, "partition"):
            if (384, "partition") in results:
                best = results[(384, "partition")]["best"]
                vox_per_sec = 384 ** 3 / best
                payload = {
                    "metric": "ongrid_partition_voxels_per_sec_384cube",
                    "value": round(vox_per_sec, 1),
                    "unit": "voxel/s",
                    "vs_baseline": round(
                        vox_per_sec / REFERENCE_CPU_VOXELS_PER_SEC, 2),
                }
            else:
                payload = {
                    "metric": "ongrid_partition_voxels_per_sec_384cube",
                    "value": 0.0, "unit": "voxel/s", "vs_baseline": 0.0,
                }
            print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    main()
