"""Vectorised neargrid trajectory walker.

The reference walks one neargrid trajectory at a time (methods.py:222-611
for initial partitioning, refinement.py:16-322 for edge re-walks): a
central-difference gradient is transformed to voxel-index steps, a
sub-voxel correction vector ``dr`` accumulates rounding error and is applied
once |dr_j| >= 0.5, and a path-revisit triggers an ongrid fallback step with
dr reset.

TPU-native formulation: every trajectory advances in lockstep inside one
``lax.while_loop``; the ongrid fallback is a single gather into the
precomputed ascent-pointer array (:func:`pybader_tpu.ops.stencil
.ongrid_parent`), and path-revisit detection uses the last two positions
(period-1/2 cycles — the only revisits the neargrid step rule produces in
practice) plus a step cap with a provably-terminating ongrid fallback.

Deliberate deviation (documented): the reference's *initial* neargrid pass
adopts labels from already-visited voxels (methods.py:509-511), making raw
assignments depend on voxel visit order; its refinement stage exists to fix
the resulting edge errors.  Here every trajectory is walked to termination
independently, which is order-free and matches the reference *after* its
refinement converges (the reference's own accuracy harness,
examples/compare_methods.py, defines that converged state as ground truth).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _round_away(x):
    """Round half away from zero (trunc(x + sign(x)*0.5)), x==0 -> 0.

    Matches reference methods.py:346-357: ``int64(g + .5)`` for g > 0 else
    ``int64(g - .5)`` (C-style truncation towards zero).
    """
    return jnp.trunc(x + jnp.where(x > 0, 0.5, -0.5)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("shape", "strict_grad", "max_steps"))
def walk(starts: jax.Array, rho_flat: jax.Array, parent_flat: jax.Array,
         stop_flat: jax.Array, t_grad: jax.Array, shape: tuple,
         strict_grad: bool = False, max_steps: int = 0):
    """Walk neargrid trajectories from ``starts`` until they terminate.

    args:
        starts: (K,) int32 flat start voxels, padded with -1 (padding slots
                are born done).
        rho_flat: (N,) reference density.
        parent_flat: (N,) ongrid ascent pointers (fallback steps and maxima
                test: parent[p] == p iff p is an ongrid maximum).
        stop_flat: (N,) bool; *arriving* at a True voxel terminates the walk
                (the refinement driver passes known==2 "interior" voxels,
                reference refinement.py:294-303; pass all-False to walk to
                maxima).
        t_grad: (3,3) gradient -> voxel-step transform.
        shape: static (nx, ny, nz).
        strict_grad: gradient-zero test flavour — False for the initial
                method (`rho+ <= rho_p >= rho-`, methods.py:324), True for
                refinement (`rho+ < rho_p > rho-`, refinement.py:111).
        max_steps: safety cap; 0 means 2*(nx+ny+nz)+64.  Trajectories still
                running at the cap report done=False and the caller should
                resolve them through the ongrid roots.
    returns:
        (final_pos (K,) int32, done (K,) bool)
    """
    nx, ny, nz = shape
    if max_steps == 0:
        max_steps = 2 * (nx + ny + nz) + 64
    dims = jnp.asarray([nx, ny, nz], dtype=jnp.int32)

    def flat(xyz):
        return (xyz[..., 0] * ny + xyz[..., 1]) * nz + xyz[..., 2]

    def unflat(p):
        return jnp.stack([p // (ny * nz), (p // nz) % ny, p % nz], axis=-1)

    pos0 = jnp.clip(starts, 0).astype(jnp.int32)
    done0 = starts < 0
    prev0 = jnp.full_like(pos0, -1)
    hist0 = jnp.full(starts.shape + (3,), -1, dtype=jnp.int32)
    dr0 = jnp.zeros(starts.shape + (3,), dtype=rho_flat.dtype)

    def cond(state):
        pos, prev, hist, dr, done, step = state
        return (~jnp.all(done)) & (step < max_steps)

    def body(state):
        pos, prev, hist, dr, done, step = state
        # -- termination checks on the current position
        at_stop = jnp.take(stop_flat, pos, mode="clip")
        at_max = jnp.take(parent_flat, pos, mode="clip") == pos
        done = done | at_stop | at_max

        # -- central-difference gradient (6 axis-neighbour gathers)
        xyz = unflat(pos)  # (K, 3)
        rho_p = jnp.take(rho_flat, pos, mode="clip")
        grads = []
        for j in range(3):
            up = xyz.at[:, j].set((xyz[:, j] + 1) % dims[j])
            dn = xyz.at[:, j].set((xyz[:, j] - 1) % dims[j])
            rho_up = jnp.take(rho_flat, flat(up), mode="clip")
            rho_dn = jnp.take(rho_flat, flat(dn), mode="clip")
            if strict_grad:
                axis_flat = (rho_up < rho_p) & (rho_dn < rho_p)
            else:
                axis_flat = (rho_up <= rho_p) & (rho_dn <= rho_p)
            grads.append(jnp.where(axis_flat, 0.0, (rho_up - rho_dn) * 0.5))
        grad = jnp.stack(grads, axis=-1)  # (K, 3)

        gd = grad @ t_grad.T  # grad_dir_i = sum_j T[i, j] grad[j]
        mg = jnp.max(jnp.abs(gd), axis=-1, keepdims=True)
        use_ongrid = mg[:, 0] < 1e-14
        g = gd / jnp.where(mg > 0, mg, 1.0)

        int_grad = _round_away(g)
        dr_new = dr + g - int_grad
        int_dr = _round_away(dr_new)
        dr_after = dr_new - int_dr
        nxt_xyz = jnp.remainder(xyz + int_grad + int_dr, dims)
        nxt = flat(nxt_xyz)

        ongrid_next = jnp.take(parent_flat, pos, mode="clip")
        # gradient ~ 0 => ongrid step (methods.py:340-343 + revisit branch)
        nxt = jnp.where(use_ongrid, ongrid_next, nxt)
        # path revisit => ongrid step, dr reset.  The reference detects
        # revisits against the FULL path (refinement.py:200); a bounded
        # recent-history window (period <= 5 cycles) catches every cycle
        # the neargrid step rule produces in practice, and the step cap +
        # root fallback remains the backstop for anything longer.
        revisit = (nxt == pos) | (nxt == prev)
        for h in range(hist.shape[-1]):
            revisit = revisit | (nxt == hist[:, h])
        nxt = jnp.where(revisit, ongrid_next, nxt)
        reset = use_ongrid | revisit
        dr_after = jnp.where(reset[:, None], 0.0, dr_after)

        pos_new = jnp.where(done, pos, nxt)
        prev_new = jnp.where(done, prev, pos)
        hist_new = jnp.where(
            done[:, None], hist,
            jnp.concatenate([prev[:, None], hist[:, :-1]], axis=1))
        dr_out = jnp.where(done[:, None], dr, dr_after)
        return pos_new, prev_new, hist_new, dr_out, done, step + 1

    pos, prev, hist, dr, done, _ = jax.lax.while_loop(
        cond, body, (pos0, prev0, hist0, dr0, done0, jnp.int32(0))
    )
    # final termination flags for trajectories that stopped on the last step
    at_stop = jnp.take(stop_flat, pos, mode="clip")
    at_max = jnp.take(parent_flat, pos, mode="clip") == pos
    done = done | at_stop | at_max
    return pos, done


def pad_starts(idx, min_size: int = 4096):
    """Pad a flat index list to the next power-of-four length with -1.

    Bucketing lengths limits jit recompilation of the walker across
    refinement iterations.
    """
    import numpy as np

    n = max(int(len(idx)), 1)
    size = max(min_size, 1 << (n - 1).bit_length())
    # coarsen to powers of 4: each distinct walker size costs a fresh XLA
    # compile, and refinement iterations shrink the edge set every round
    if size.bit_length() % 2 == 0:
        size <<= 1
    out = np.full(size, -1, dtype=np.int32)
    out[: len(idx)] = idx
    return out
