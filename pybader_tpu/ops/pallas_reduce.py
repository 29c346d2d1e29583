"""Pallas TPU per-label reduction kernels.

The per-label reductions of the partition pipeline — charge/volume sums
(reference utils.py:235-252), the renumber stage's first-member/maximum
minima, and the discovery-order remap — are masked sweeps in XLA
(ops/reductions.py): K label-equality compares per grid pass, each pass
re-reading the grid from HBM through XLA's select chains (measured 30-56 ms
each at 384^3, K~60; unrolling and 2-D reshapes do not help because XLA
materialises the chains).  These kernels do the same math in one grid read:
each block loads (R, 128) tiles once into VMEM and produces per-label
partial rows vectorised over lanes, so the label loop touches VMEM only.
Final cross-block (and cross-lane) combination is a tiny XLA reduction in
f64 — which also gives the sums a two-level error profile (f32 tree within
a block column, f64 across) identical to the existing split-f32 scheme.

All kernels keep every shape a multiple of (8, 128) (see memory note:
misaligned shapes hang Mosaic compiles) and use unrolled static label
indices — no gathers, no scatters, no dynamic-index stores.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Labels above this take the XLA masked-sweep path (kernel cost scales
# linearly with K; compile time too).
MAX_LABELS = 256
_LANES = 128
_TARGET_BLOCK = 1 << 16  # elements per block (~768 KB of f32 VMEM inputs)


def _block_rows(n_rows: int) -> int:
    """Rows per block: largest divisor of n_rows that is a multiple of 8
    and keeps the block near _TARGET_BLOCK elements."""
    target = max(8, _TARGET_BLOCK // _LANES)
    r = 8
    for cand in range(target, 7, -8):
        if n_rows % cand == 0:
            r = cand
            break
    return r


def _pad_k(k: int) -> int:
    """Static label-loop bound: next power of two >= k (>= 8) — few
    compile buckets, padded labels never match (labels < k)."""
    return max(8, 1 << (int(k) - 1).bit_length())


def _as_rows(flat, pad_value):
    """(N,) -> (rows, 128) with -1/0 padding; rows padded to a multiple
    of 8 so a divisor block always exists."""
    n = flat.shape[0]
    rows = -(-n // _LANES)
    rows = -(-rows // 8) * 8
    padded = rows * _LANES
    if padded != n:
        flat = jnp.concatenate(
            [flat, jnp.full((padded - n,), pad_value, flat.dtype)])
    return flat.reshape(rows, _LANES), rows


# ------------------------------------------------------------------ sums
def _sums_kernel(hi_ref, lo_ref, lab_ref, sh_ref, sl_ref, ct_ref, *,
                 kp: int):
    lab = lab_ref[...]
    hi = hi_ref[...]
    lo = lo_ref[...]
    zero = jnp.zeros_like(hi)
    for k in range(kp):
        m = lab == jnp.int32(k)
        sh_ref[k, :] = jnp.sum(jnp.where(m, hi, zero), axis=0)
        sl_ref[k, :] = jnp.sum(jnp.where(m, lo, zero), axis=0)
        ct_ref[k, :] = jnp.sum(jnp.where(m, jnp.float32(1), zero), axis=0)


@partial(jax.jit, static_argnames=("num_segments", "interpret"))
def charge_volume(density, labels, voxel_vol, num_segments: int,
                  interpret: bool = False):
    """Per-label (charge, voxel count) — Pallas path of
    :func:`pybader_tpu.ops.reductions.charge_volume_sum` (labels < 0
    excluded; returns f64 (K,) charge * voxel_vol and counts * voxel_vol).
    """
    flat_rho = density.reshape(-1)
    hi = flat_rho.astype(jnp.float32)
    lo = (flat_rho - hi.astype(flat_rho.dtype)).astype(jnp.float32)
    lab_flat = labels.reshape(-1).astype(jnp.int32)
    kp = _pad_k(num_segments)
    with jax.enable_x64(False):
        hi2, rows = _as_rows(hi, 0.0)
        lo2, _ = _as_rows(lo, 0.0)
        lab2, _ = _as_rows(lab_flat, -1)
        r = _block_rows(rows)
        nb = rows // r
        out_shape = jax.ShapeDtypeStruct((nb * kp, _LANES), jnp.float32)
        spec_in = pl.BlockSpec((r, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((kp, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        sh, sl, ct = pl.pallas_call(
            partial(_sums_kernel, kp=kp),
            grid=(nb,),
            in_specs=[spec_in, spec_in, spec_in],
            out_specs=[spec_out, spec_out, spec_out],
            out_shape=[out_shape, out_shape, out_shape],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(hi2, lo2, lab2)
    sh = sh.reshape(nb, kp, _LANES)[:, :num_segments].astype(jnp.float64)
    sl = sl.reshape(nb, kp, _LANES)[:, :num_segments].astype(jnp.float64)
    ct = ct.reshape(nb, kp, _LANES)[:, :num_segments].astype(jnp.float64)
    charge = (jnp.sum(sh, axis=(0, 2)) + jnp.sum(sl, axis=(0, 2)))
    volume = jnp.sum(ct, axis=(0, 2))
    return charge * voxel_vol, volume * voxel_vol


# -------------------------------------------------------------- min pair
def _minpair_kernel(lab_ref, mask_ref, mn_ref, mm_ref, *, kp: int, r: int):
    big = jnp.int32(np.iinfo(np.int32).max)
    lab = lab_ref[...]
    base = pl.program_id(0) * jnp.int32(r * _LANES)
    row = jax.lax.broadcasted_iota(jnp.int32, (r, _LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, _LANES), 1)
    iota = base + row * jnp.int32(_LANES) + col
    # u8 vector compares are unsupported on v5e — widen the mask to i32
    iota_m = jnp.where(mask_ref[...].astype(jnp.int32) != 0, iota, big)
    for k in range(kp):
        m = lab == jnp.int32(k)
        mn_ref[k, :] = jnp.min(jnp.where(m, iota, big), axis=0)
        mm_ref[k, :] = jnp.min(jnp.where(m, iota_m, big), axis=0)


@partial(jax.jit, static_argnames=("num_segments", "interpret"))
def min_pair(labels, mask, num_segments: int, interpret: bool = False):
    """Per-label (min flat index, min flat index where mask) — Pallas path
    of :func:`pybader_tpu.ops.reductions.masked_min_pair` (values ==
    the flat iota, which that caller always uses)."""
    lab_flat = labels.reshape(-1).astype(jnp.int32)
    mask_flat = mask.reshape(-1).astype(jnp.uint8)
    kp = _pad_k(num_segments)
    with jax.enable_x64(False):
        lab2, rows = _as_rows(lab_flat, -1)
        mask2, _ = _as_rows(mask_flat, 0)
        r = _block_rows(rows)
        nb = rows // r
        out_shape = jax.ShapeDtypeStruct((nb * kp, _LANES), jnp.int32)
        spec_out = pl.BlockSpec((kp, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        mn, mm = pl.pallas_call(
            partial(_minpair_kernel, kp=kp, r=r),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((r, _LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r, _LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[spec_out, spec_out],
            out_shape=[out_shape, out_shape],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(lab2, mask2)
    mn = mn.reshape(nb, kp, _LANES)[:, :num_segments]
    mm = mm.reshape(nb, kp, _LANES)[:, :num_segments]
    return jnp.min(mn, axis=(0, 2)), jnp.min(mm, axis=(0, 2))


# ------------------------------------------------- surface distance
def _surface_kernel(lab_ref, mask_ref, ax_ref, ay_ref, az_ref, sh_ref,
                    out_ref, *, kp: int, r: int, shape: tuple):
    """Per-label min squared edge-voxel -> own-atom distance (27 images).

    One grid read: each element reconstructs its voxel position from the
    block iota, picks its own atom's coordinates by a label-select chain
    (atom table in SMEM), scans the 27 periodic images, and the per-label
    minima reduce over sublanes — no gathers, no edge compaction.
    """
    nx, ny, nz = shape
    big = jnp.float32(np.finfo(np.float32).max)
    lab = lab_ref[...]
    base = pl.program_id(0) * jnp.int32(r * _LANES)
    row = jax.lax.broadcasted_iota(jnp.int32, (r, _LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, _LANES), 1)
    iota = base + row * jnp.int32(_LANES) + col
    x = iota // jnp.int32(ny * nz)
    rem = iota - x * jnp.int32(ny * nz)
    y = rem // jnp.int32(nz)
    z = rem - y * jnp.int32(nz)
    fx = x.astype(jnp.float32) * jnp.float32(1.0 / nx)
    fy = y.astype(jnp.float32) * jnp.float32(1.0 / ny)
    fz = z.astype(jnp.float32) * jnp.float32(1.0 / nz)
    # cart = frac @ lattice; lattice rows in the shifts SMEM tail (81..89)
    px = fx * sh_ref[81] + fy * sh_ref[84] + fz * sh_ref[87]
    py = fx * sh_ref[82] + fy * sh_ref[85] + fz * sh_ref[88]
    pz = fx * sh_ref[83] + fy * sh_ref[86] + fz * sh_ref[89]
    ox = jnp.zeros_like(px)
    oy = jnp.zeros_like(px)
    oz = jnp.zeros_like(px)
    for k in range(kp):
        m = lab == jnp.int32(k)
        ox = jnp.where(m, ax_ref[k], ox)
        oy = jnp.where(m, ay_ref[k], oy)
        oz = jnp.where(m, az_ref[k], oz)
    dx = px - ox
    dy = py - oy
    dz = pz - oz
    d2 = big
    for i in range(27):
        tx = dx - sh_ref[3 * i]
        ty = dy - sh_ref[3 * i + 1]
        tz = dz - sh_ref[3 * i + 2]
        d2 = jnp.minimum(d2, tx * tx + ty * ty + tz * tz)
    # u8 vector compares are unsupported on v5e — widen the mask to i32
    d2 = jnp.where(
        (mask_ref[...].astype(jnp.int32) != 0) & (lab >= 0), d2, big)
    for k in range(kp):
        out_ref[k, :] = jnp.min(
            jnp.where(lab == jnp.int32(k), d2, big), axis=0)


@partial(jax.jit, static_argnames=("num_atoms", "shape", "interpret"))
def surface_min_d2(labels, edge_mask, lattice, atoms_cart, shape: tuple,
                   num_atoms: int, interpret: bool = False):
    """(num_atoms,) min squared distance from each atom to its own
    volume's edge voxels over 27 periodic images — Pallas path of
    :func:`pybader_tpu.ops.atoms.surface_distance_from_edges` without the
    edge compaction (reference utils.py:320-379 semantics; inf where an
    atom's volume has no edge voxel in the mask)."""
    lab_flat = labels.reshape(-1).astype(jnp.int32)
    mask_flat = edge_mask.reshape(-1).astype(jnp.uint8)
    kp = _pad_k(num_atoms)
    lat = lattice.astype(jnp.float32)
    a32 = atoms_cart.astype(jnp.float32)
    ax = jnp.zeros((kp,), jnp.float32).at[:num_atoms].set(a32[:, 0])
    ay = jnp.zeros((kp,), jnp.float32).at[:num_atoms].set(a32[:, 1])
    az = jnp.zeros((kp,), jnp.float32).at[:num_atoms].set(a32[:, 2])
    combos = jnp.asarray(
        [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
         for k in (-1, 0, 1)], dtype=jnp.float32)
    sh = jnp.concatenate(
        [(combos @ lat).reshape(-1), lat.reshape(-1)])  # (81 + 9,)
    with jax.enable_x64(False):
        lab2, rows = _as_rows(lab_flat, -1)
        mask2, _ = _as_rows(mask_flat, 0)
        r = _block_rows(rows)
        nb = rows // r
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        out = pl.pallas_call(
            partial(_surface_kernel, kp=kp, r=r, shape=shape),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((r, _LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r, _LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                smem, smem, smem, smem,
            ],
            out_specs=pl.BlockSpec((kp, _LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb * kp, _LANES), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(lab2, mask2, ax, ay, az, sh)
    out = out.reshape(nb, kp, _LANES)[:, :num_atoms]
    d2 = jnp.min(out, axis=(0, 2)).astype(jnp.float64)
    return jnp.where(d2 >= jnp.float64(np.finfo(np.float32).max), jnp.inf,
                     d2)


# ------------------------------------------------------------------ remap
def _remap_kernel(lab_ref, tab_ref, out_ref, *, kp: int):
    lab = lab_ref[...]
    out = jnp.where(lab < 0, lab, jnp.int32(0))
    for k in range(kp):
        out = jnp.where(lab == jnp.int32(k), tab_ref[k], out)
    out_ref[...] = out


@partial(jax.jit, static_argnames=("num_segments", "interpret"))
def remap(labels, table, num_segments: int, interpret: bool = False):
    """labels -> table[labels] (negatives preserved) — Pallas path of
    :func:`pybader_tpu.ops.reductions.remap_sweep`."""
    lab_flat = labels.reshape(-1).astype(jnp.int32)
    kp = _pad_k(num_segments)
    tab = jnp.zeros((kp,), jnp.int32).at[:num_segments].set(
        table.astype(jnp.int32)[:num_segments])
    with jax.enable_x64(False):
        lab2, rows = _as_rows(lab_flat, -1)
        r = _block_rows(rows)
        nb = rows // r
        spec = pl.BlockSpec((r, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            partial(_remap_kernel, kp=kp),
            grid=(nb,),
            in_specs=[
                spec,
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(lab2, tab)
    n = labels.size
    return out.reshape(-1)[:n].reshape(labels.shape)
