"""Pallas TPU double-float ongrid stencil.

Mosaic has no f64, but the ascent decision needs (near-)f64 precision:
candidate values ``(rho_n - rho_p) * w + rho_p`` for different neighbours can
differ at the 1e-9..1e-12 relative level near basin ridges, far below f32.
This kernel computes the 26 candidates in double-float ("dd") arithmetic —
each f64 input split into a pair of f32s (hi + lo), error-free transforms
(Knuth two-sum, Dekker two-prod) carrying ~48 mantissa bits.

Precision note: 48 bits is slightly below f64's 53, so tie-breaks between
candidates equal to within ~1e-14 relative can differ from the exact-f64
(XLA-emulated) stencil; those are numerical-noise ties with no physical
meaning.  The XLA f64 stencil (ops/stencil.py) remains the exact-parity
path; this kernel is the TPU speed path (validated to produce identical
step codes on the benchmark densities).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pybader_tpu.grid import SELF_INDEX


# ---------------------------------------------------------------- dd algebra
def _two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _quick_two_sum(a, b):  # requires |a| >= |b|
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    c = a * np.float32(4097.0)  # 2^12 + 1
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def _two_prod_presplit(a, b, b_sp_hi, b_sp_lo):
    """two_prod with b's Dekker split precomputed (b is a per-neighbour
    scalar weight: splitting it per element wasted 3 VPU ops/candidate)."""
    p = a * b
    a_hi, a_lo = _split(a)
    e = ((a_hi * b_sp_hi - p) + a_hi * b_sp_lo + a_lo * b_sp_hi) \
        + a_lo * b_sp_lo
    return p, e


def _dd_add(x_hi, x_lo, y_hi, y_lo):
    s, e = _two_sum(x_hi, y_hi)
    e = e + (x_lo + y_lo)
    return _quick_two_sum(s, e)


def _dd_sub(x_hi, x_lo, y_hi, y_lo):
    return _dd_add(x_hi, x_lo, -y_hi, -y_lo)


def _dd_mul_scalar(x_hi, x_lo, w_hi, w_lo, w_sp_hi, w_sp_lo):
    p, e = _two_prod_presplit(x_hi, w_hi, w_sp_hi, w_sp_lo)
    e = e + (x_hi * w_lo + x_lo * w_hi)
    return _quick_two_sum(p, e)


def _dd_gt(x_hi, x_lo, y_hi, y_lo):
    return (x_hi > y_hi) | ((x_hi == y_hi) & (x_lo > y_lo))


def _dd_eq(x_hi, x_lo, y_hi, y_lo):
    return (x_hi == y_hi) & (x_lo == y_lo)


# ----------------------------------------------------------------- kernel
def _pick_block(n, target):
    for b in range(min(target, n), 0, -1):
        if n % b == 0:
            return b
    return n


def _make_kernel(nx, ny, nz, bx, by, halo, perm=(0, 1, 2)):
    """Stencil kernel; ``perm`` says which ORIGINAL grid axis each local
    axis is (the caller passes transposed arrays for shapes whose natural
    layout the kernel can't tile).

    The reference's tie-break is "first strictly-greater neighbour in the
    ORIGINAL ix,iy,iz scan order wins" (methods.py:87-117).  Scanning in
    permuted order would pick a different neighbour on exact-value ties,
    so the update rule carries the candidate's original-order code and
    prefers the smaller one on exact dd equality — which reproduces the
    original scan order under any permutation (and reduces to plain
    first-wins when perm is the identity).  Ties with the centre's own
    value always go to the centre (best_orig starts at -1).
    """
    rx = bx + 2 * halo
    ry = by + 2 * halo
    # weight of each local-axis component in the ORIGINAL code
    axis_w = [0, 0, 0]
    for local_axis, orig_axis in enumerate(perm):
        axis_w[local_axis] = (9, 3, 1)[orig_axis]

    def kernel(whi_ref, wlo_ref, wsph_ref, wspl_ref, hi_any, lo_any,
               out_ref, hi_loc, lo_loc, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        x0 = i * np.int32(bx)
        y0 = j * np.int32(by)

        def wrap(v, n):
            return jax.lax.rem(v + np.int32(n), np.int32(n))

        xs = [(wrap(x0 - np.int32(halo), nx), halo, 0),
              (x0, bx, halo),
              (wrap(x0 + np.int32(bx), nx), halo, halo + bx)]
        ys = [(wrap(y0 - np.int32(halo), ny), halo, 0),
              (y0, by, halo),
              (wrap(y0 + np.int32(by), ny), halo, halo + by)]
        xs = [(pl.multiple_of(s, 8), l, d) for (s, l, d) in xs]
        ys = [(pl.multiple_of(s, 8), l, d) for (s, l, d) in ys]
        copies = []
        c = 0
        for (sx, lx, dx) in xs:
            for (sy, ly, dy) in ys:
                for src, dst in ((hi_any, hi_loc), (lo_any, lo_loc)):
                    copies.append(pltpu.make_async_copy(
                        src.at[pl.ds(sx, lx), pl.ds(sy, ly), :],
                        dst.at[pl.ds(dx, lx), pl.ds(dy, ly), :],
                        sems.at[jnp.int32(c)],
                    ))
                    c += 1
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

        # centre values (the block interior of the haloed region)
        p_hi = hi_loc[halo:halo + bx, halo:halo + by, :]
        p_lo = lo_loc[halo:halo + bx, halo:halo + by, :]

        def over_dx(kx, state):
            best_hi, best_lo, best_k, best_orig = state
            sx = jax.lax.rem(jnp.int32(rx) + jnp.int32(1) - kx,
                             jnp.int32(rx))
            hx = pltpu.roll(hi_loc[:], sx, 0)
            lx_ = pltpu.roll(lo_loc[:], sx, 0)

            def over_dy(ky, state2):
                best_hi, best_lo, best_k, best_orig = state2
                sy = jax.lax.rem(jnp.int32(ry) + jnp.int32(1) - ky,
                                 jnp.int32(ry))
                hxy = pltpu.roll(hx, sy, 1)
                lxy = pltpu.roll(lx_, sy, 1)
                base = kx * jnp.int32(9) + ky * jnp.int32(3)
                obase = (kx * jnp.int32(axis_w[0])
                         + ky * jnp.int32(axis_w[1]))
                for kz, dz in enumerate((-1, 0, 1)):
                    k = base + jnp.int32(kz)
                    orig = obase + jnp.int32(kz * axis_w[2])
                    if dz:
                        n_hi = pltpu.roll(hxy, np.int32((-dz) % nz), 2)
                        n_lo = pltpu.roll(lxy, np.int32((-dz) % nz), 2)
                    else:
                        n_hi, n_lo = hxy, lxy
                    n_hi = n_hi[halo:halo + bx, halo:halo + by, :]
                    n_lo = n_lo[halo:halo + bx, halo:halo + by, :]
                    # cand = (rho_n - rho_p) * w + rho_p in dd, exactly as
                    # the f64 reference computes it (methods.py:87-117).
                    # Comparing the raw q = (rho_n - rho_p) * w would be
                    # order-equivalent in exact arithmetic and one dd
                    # addition cheaper — but the f64 oracle's +rho_p
                    # addition QUANTIZES (absorbing the low bits of q into
                    # ulp(rho_p)), creating exact ties that scan order
                    # then breaks; ranking the un-quantized q values
                    # resolves those ties by magnitude instead (measured:
                    # 2/524K step-code flips vs the exact-f64 stencil on
                    # the TPU lane).  Parity requires mirroring the
                    # rounding, not improving on it.
                    d_hi, d_lo = _dd_sub(n_hi, n_lo, p_hi, p_lo)
                    m_hi, m_lo = _dd_mul_scalar(
                        d_hi, d_lo, whi_ref[k], wlo_ref[k],
                        wsph_ref[k], wspl_ref[k])
                    c_hi, c_lo = _dd_add(m_hi, m_lo, p_hi, p_lo)
                    upd = _dd_gt(c_hi, c_lo, best_hi, best_lo)
                    upd = upd | (_dd_eq(c_hi, c_lo, best_hi, best_lo)
                                 & (best_orig >= jnp.int32(0))
                                 & (orig < best_orig))
                    upd = jnp.logical_and(upd, k != jnp.int32(SELF_INDEX))
                    best_hi = jnp.where(upd, c_hi, best_hi)
                    best_lo = jnp.where(upd, c_lo, best_lo)
                    best_k = jnp.where(upd, k, best_k)
                    best_orig = jnp.where(upd, orig, best_orig)
                return best_hi, best_lo, best_k, best_orig

            return jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(3), over_dy,
                (best_hi, best_lo, best_k, best_orig))

        # best starts at the centre's own value (its candidate: q=0 + rho_p)
        init = (p_hi, p_lo,
                jnp.full((bx, by, nz), SELF_INDEX, dtype=jnp.int32),
                jnp.full((bx, by, nz), -1, dtype=jnp.int32))
        _, _, best_k, _ = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(3), over_dx, init)
        out_ref[:] = best_k

    return kernel, rx, ry


@partial(jax.jit, static_argnames=("weights", "bx", "by", "halo", "perm",
                                   "interpret"))
def _stencil_call(hi, lo, weights, bx, by, halo, perm=(0, 1, 2),
                  interpret=False):
    nx, ny, nz = hi.shape
    kernel, rx, ry = _make_kernel(nx, ny, nz, bx, by, halo, perm)
    grid = (nx // bx, ny // by)
    w = np.asarray(weights, dtype=np.float64)
    w_hi = w.astype(np.float32)
    w_lo = (w - w_hi).astype(np.float32)
    # Dekker split of w_hi, precomputed (same arithmetic as _split)
    c = w_hi * np.float32(4097.0)
    w_sp_hi = (c - (c - w_hi)).astype(np.float32)
    w_sp_lo = (w_hi - w_sp_hi).astype(np.float32)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((bx, by, nz), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((rx, ry, nz), jnp.float32),
            pltpu.VMEM((rx, ry, nz), jnp.float32),
            pltpu.SemaphoreType.DMA((18,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(w_hi), jnp.asarray(w_lo), jnp.asarray(w_sp_hi),
      jnp.asarray(w_sp_lo), hi, lo)
    return out


def supports_shape(shape) -> bool:
    nx, ny, nz = shape
    return (
        _pick_block(nx, 8) % 8 == 0
        and _pick_block(ny, 8) % 8 == 0
        and nz % 128 == 0
    )


def find_supported_perm(shape):
    """Axis permutation making ``shape`` kernel-tileable, or None.

    The identity is preferred (no transposes); otherwise any permutation
    placing a 128-multiple axis last with 8-multiples in front works for
    both the stencil and the chase kernel (labels are recovered by the
    inverse transpose; tie-breaks stay in original scan order via the
    kernel's ``perm`` argument).
    """
    from itertools import permutations

    for perm in ((0, 1, 2),) + tuple(permutations((0, 1, 2)))[1:]:
        if supports_shape(tuple(shape[p] for p in perm)):
            return perm
    return None


def permute_weights(weights, perm):
    """Reorder the 27-weight tuple into permuted-axis code order."""
    w = list(weights)
    out = [0.0] * 27
    for cx in range(3):
        for cy in range(3):
            for cz in range(3):
                kp = cx * 9 + cy * 3 + cz
                comps = (cx, cy, cz)
                orig = sum(comps[i] * (9, 3, 1)[perm[i]] for i in range(3))
                out[kp] = w[orig]
    return tuple(out)


def ongrid_step_codes_dd(reference, weights, block_target: int = 32,
                         halo: int = 8, perm=(0, 1, 2)):
    """Double-float Pallas stencil -> uint8 step codes.

    ``reference`` is f64; split into an f32 hi/lo pair on device.  With a
    non-identity ``perm``, the caller passes the TRANSPOSED density and
    weights already reordered by :func:`permute_weights`; the returned
    codes are in permuted-axis geometry (decode or remap accordingly).
    """
    nx, ny, nz = reference.shape
    hi = reference.astype(jnp.float32)
    lo = (reference - hi.astype(jnp.float64)).astype(jnp.float32)
    with jax.enable_x64(False):
        from pybader_tpu.ops.pallas_chase import _try_configs

        bk = _try_configs(
            ((block_target, block_target, halo),
             (16, 16, 8), (16, 8, 8), (8, 8, 8)),
            reference.shape,
            lambda bx, by, h: _stencil_call(hi, lo, tuple(weights),
                                            bx, by, h, tuple(perm)),
        )
    return bk.astype(jnp.uint8)


@partial(jax.jit, static_argnames=("perm",))
def remap_codes_to_original(bk_p: jax.Array, perm: tuple) -> jax.Array:
    """Permuted-geometry step codes -> original-axis code values.

    Elementwise arithmetic only (no gathers): decode the three offset
    components and re-weight them by the original axis positions.  The
    result still lives on the PERMUTED grid; transpose separately.
    """
    cx = bk_p // 9
    cy = (bk_p // 3) % 3
    cz = bk_p % 3
    w = (9, 3, 1)
    return (cx * np.uint8(w[perm[0]]) + cy * np.uint8(w[perm[1]])
            + cz * np.uint8(w[perm[2]])).astype(jnp.uint8)
