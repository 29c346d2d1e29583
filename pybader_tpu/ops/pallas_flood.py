"""Pallas TPU kernel for one directional flood scan.

The XLA formulation (:func:`pybader_tpu.ops.scanflood.scan_flood_dir`)
pays for each plane step in HBM traffic: the three ``_sel9`` evaluations
materialise ~24 rolled copies of the plane plus a 9-deep select chain,
~16 MB of memory movement per 384^2 plane — 6 GB per scan, ~13.7 ms
measured.  Here the whole scan is ONE ``pallas_call`` whose sequential
grid walks the planes in scan order; the Gauss-Seidel carry (the
just-updated previous plane) persists in a VMEM scratch buffer across
grid steps, and the in-plane parent selection runs entirely in VMEM
(``pltpu.roll`` shuffles).  HBM sees exactly one read of the label /
code planes and one write of the result — the bandwidth floor.

Semantics are bit-identical to the XLA scan (pinned by
tpu_tests/test_tpu_kernels.py on device and tests/test_scanflood.py for
the XLA pair): a voxel adopts its parent's label if its own is 0, where
the parent sits in the previous plane (updated this scan), the own plane
(old values), or the next plane (old values) according to the step-code
axis component.

Reference semantics being replaced: serial path following with early
exit, /root/reference/pybader/methods.py:15-219.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supports_plane(h: int, w: int) -> bool:
    """The in-plane geometry the kernel can tile.

    w (lanes) must be a 128-multiple for the exact rolls; h covers the
    i32 sublane tile (8) and the u8 step-code tile (32) — u8 arrays pack
    4 sublanes per row, and a padded partial tile under a roll would pull
    padding into the result.
    """
    return h % 32 == 0 and w % 128 == 0


def _make_kernel(npl: int, h: int, w: int, reverse: bool, k: int):
    def sel9(src, ip):
        """src[(y+dy) % h, (z+dz) % w] per in-plane code (VMEM rolls)."""
        out = src  # code 4: dy = dz = 0
        for code in range(9):
            dy, dz = code // 3 - 1, code % 3 - 1
            if dy == 0 and dz == 0:
                continue
            rolled = src
            if dy:
                rolled = pltpu.roll(rolled, np.int32((-dy) % h), 0)
            if dz:
                rolled = pltpu.roll(rolled, np.int32((-dz) % w), 1)
            out = jnp.where(ip == np.int32(code), rolled, out)
        return out

    # the parent component value on the just-updated side of the scan
    # (np scalar, not jnp: a jnp constant would be captured by the kernel
    # closure as a traced array, which pallas_call rejects)
    upd_code = np.int32(2) if reverse else np.int32(0)

    def kernel(own_ref, c_ref, ip_ref, lm_any, out_ref, behind, edge_loc,
               sems):
        i = pl.program_id(0)
        # first plane (array order) of this group
        g0 = ((np.int32(npl - k) - i * np.int32(k)) if reverse
              else i * np.int32(k))
        # the one neighbour plane outside the group: the OLD value of the
        # plane past the group in scan direction (wraps periodically)
        edge_p = jax.lax.rem(
            g0 + np.int32(npl + (-1 if reverse else k)), np.int32(npl))
        cp_edge = pltpu.make_async_copy(
            lm_any.at[pl.ds(edge_p, 1)], edge_loc, sems.at[0])
        cp_edge.start()

        @pl.when(i == 0)
        def _init():  # periodic wrap: previous state of the far plane
            wrap_p = np.int32(0 if reverse else npl - 1)
            cp = pltpu.make_async_copy(
                lm_any.at[pl.ds(wrap_p, 1)], behind, sems.at[1])
            cp.start()
            cp.wait()

        cp_edge.wait()

        # u8 codes widen to i32 for the compares: Mosaic vector compare
        # is 32-bit only ("Target does not support this comparison" on
        # vector<...xi8>)
        c = c_ref[:].astype(jnp.int32)
        ip = ip_ref[:].astype(jnp.int32)
        # planes within the group chain through VMEM (Gauss-Seidel);
        # the ahead_old of plane j is its scan-direction successor's OLD
        # value — in-group for all but the last processed plane, the
        # DMA'd edge plane for that one
        prev = behind[0]
        order = tuple(range(k - 1, -1, -1) if reverse else range(k))
        for j in order:
            own = own_ref[j]
            nxt = j - 1 if reverse else j + 1
            ahead = edge_loc[0] if nxt in (-1, k) else own_ref[nxt]
            cand = jnp.where(
                c[j] == upd_code, sel9(prev, ip[j]),
                jnp.where(c[j] == np.int32(1), sel9(own, ip[j]),
                          sel9(ahead, ip[j])))
            new = jnp.where((own == 0) & (cand > 0), cand, own)
            out_ref[j] = new
            prev = new
        behind[0] = prev

    return kernel


@partial(jax.jit, static_argnames=("reverse", "interpret"))
def _scan_call(lm, cm, im, reverse: bool, interpret: bool = False):
    npl, h, w = lm.shape
    k = next((g for g in (8, 4, 2) if npl % g == 0), 1)
    kernel = _make_kernel(npl, h, w, reverse, k)
    groups = npl // k

    def gmap(i):  # group block index (descending for reverse scans)
        return ((groups - 1) - i if reverse else i, 0, 0)

    return pl.pallas_call(
        kernel,
        grid=(groups,),
        in_specs=[
            pl.BlockSpec((k, h, w), gmap),  # own planes (old values)
            pl.BlockSpec((k, h, w), gmap),
            pl.BlockSpec((k, h, w), gmap),
            pl.BlockSpec(memory_space=pl.ANY),  # wrap/edge DMAs
        ],
        out_specs=pl.BlockSpec((k, h, w), gmap),
        out_shape=jax.ShapeDtypeStruct((npl, h, w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, h, w), jnp.int32),  # carry: updated prev plane
            pltpu.VMEM((1, h, w), jnp.int32),  # edge plane (old)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lm, cm, im, lm)


def supports_shape(shape) -> bool:
    """Every directional scan must see an (8,128)-tileable plane."""
    nx, ny, nz = shape
    return (supports_plane(ny, nz) and supports_plane(nx, nz)
            and supports_plane(nx, ny))
