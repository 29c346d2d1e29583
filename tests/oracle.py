"""Clean-room numpy oracle for golden tests.

Independent, deliberately-naive serial implementation of grid-based Bader
partitioning per Tang, Sanville & Henkelman (2009), written from the
algorithm description to validate the TPU kernels.  Replicates the semantics
the reference CPU package exhibits with threads=1 (scan order, tie-breaks,
basin numbering by discovery order) without sharing any code with it.
"""
from __future__ import annotations

import numpy as np

OFFSETS = [
    (ix, iy, iz)
    for ix in (-1, 0, 1)
    for iy in (-1, 0, 1)
    for iz in (-1, 0, 1)
]


def gaussian_density(shape, lattice, centers_frac, widths, amps):
    """Periodic sum of gaussians — a synthetic 'charge density' fixture."""
    nx, ny, nz = shape
    fx, fy, fz = np.meshgrid(
        np.arange(nx) / nx, np.arange(ny) / ny, np.arange(nz) / nz,
        indexing="ij",
    )
    frac = np.stack([fx, fy, fz], axis=-1)  # (nx,ny,nz,3)
    rho = np.zeros(shape, dtype=np.float64)
    for c, w, a in zip(centers_frac, widths, amps):
        for sx in (-1, 0, 1):
            for sy in (-1, 0, 1):
                for sz in (-1, 0, 1):
                    d_frac = frac - (np.asarray(c) + np.array([sx, sy, sz]))
                    d_cart = d_frac @ lattice
                    r2 = np.sum(d_cart**2, axis=-1)
                    rho += a * np.exp(-r2 / (2.0 * w**2))
    return rho


def ongrid_step(rho, dist_flat, p):
    """Best ascent neighbour of voxel p (or p itself if p is a maximum).

    First strictly-greater value of (rho(n)-rho(p))*w + rho(p) in scan
    order wins; the voxel itself wins all ties.
    """
    shape = rho.shape
    best_val = rho[p]
    best = p
    for k, off in enumerate(OFFSETS):
        if off == (0, 0, 0):
            continue
        n = tuple((p[d] + off[d]) % shape[d] for d in range(3))
        val = (rho[n] - rho[p]) * dist_flat[k] + rho[p]
        if val > best_val:
            best_val = val
            best = n
    return best


def ongrid_oracle(rho, dist_flat, vacuum=None):
    """Serial ongrid partition with discovery-order basin numbering.

    returns (labels int32 [-1 vacuum, 0..M-1], maxima list of voxel tuples
    in discovery order).
    """
    shape = rho.shape
    labels = np.full(shape, -9, dtype=np.int32)  # -9 == unassigned
    if vacuum is not None:
        labels[vacuum] = -1
    maxima = []
    for p in np.ndindex(shape):
        if labels[p] != -9:
            continue
        path = [p]
        cur = p
        while True:
            nxt = ongrid_step(rho, dist_flat, cur)
            if nxt == cur:
                lab = len(maxima)
                maxima.append(cur)
                break
            if labels[nxt] != -9:
                lab = labels[nxt]
                break
            path.append(nxt)
            cur = nxt
        for q in path:
            labels[q] = lab
    return labels, maxima


def neargrid_trajectory(rho, dist_flat, t_grad, start, stop_mask=None,
                        strict_grad=False, max_steps=100000):
    """Serial neargrid trajectory from one voxel (spec for the walker).

    Walks with central-difference gradient + dr correction; gradient-zero or
    a period-1/2 revisit falls back to an ongrid step with dr reset; stops on
    arrival at a stop_mask voxel or an ongrid maximum.  Returns the final
    voxel.
    """
    shape = rho.shape
    pos = start
    prev = None
    dr = np.zeros(3)
    for _ in range(max_steps):
        if stop_mask is not None and stop_mask[pos]:
            return pos
        if ongrid_step(rho, dist_flat, pos) == pos:
            return pos
        grad = np.zeros(3)
        rp = rho[pos]
        for j in range(3):
            up = list(pos)
            up[j] = (up[j] + 1) % shape[j]
            dn = list(pos)
            dn[j] = (dn[j] - 1) % shape[j]
            ru, rd = rho[tuple(up)], rho[tuple(dn)]
            if strict_grad:
                flat = ru < rp and rd < rp
            else:
                flat = ru <= rp and rd <= rp
            grad[j] = 0.0 if flat else (ru - rd) / 2.0
        gd = t_grad @ grad
        mg = np.max(np.abs(gd))
        if mg < 1e-14:
            nxt = ongrid_step(rho, dist_flat, pos)
            dr[:] = 0.0
        else:
            g = gd / mg
            step = np.trunc(g + np.where(g > 0, 0.5, -0.5)).astype(int)
            dr = dr + g - step
            corr = np.trunc(dr + np.where(dr > 0, 0.5, -0.5)).astype(int)
            dr = dr - corr
            nxt = tuple(
                (pos[d] + step[d] + corr[d]) % shape[d] for d in range(3)
            )
            if nxt == pos or nxt == prev:
                nxt = ongrid_step(rho, dist_flat, pos)
                dr[:] = 0.0
        prev = pos
        pos = nxt
    return pos


def edge_scan(rho, labels):
    """Serial edge classification: returns known int8 grid (2/-1/-2/0)."""
    shape = rho.shape
    known = np.zeros(shape, dtype=np.int8)
    edge = np.zeros(shape, dtype=bool)
    for p in np.ndindex(shape):
        if labels[p] == -1:
            continue
        is_edge = False
        is_max = True
        for off in OFFSETS:
            if off == (0, 0, 0):
                continue
            n = tuple((p[d] + off[d]) % shape[d] for d in range(3))
            if labels[n] == -1:
                continue
            if labels[n] != labels[p]:
                is_edge = True
            if rho[n] > rho[p]:
                is_max = False
        edge[p] = is_edge and not is_max
    for p in np.ndindex(shape):
        if labels[p] != -1:
            known[p] = 2
    for p in np.ndindex(shape):
        if edge[p]:
            for off in OFFSETS:
                if off == (0, 0, 0):
                    continue
                n = tuple((p[d] + off[d]) % shape[d] for d in range(3))
                if not edge[n]:
                    known[n] = -1
    known[edge] = -2
    return known


def charge_sums(density, labels, voxel_vol, num_segments):
    charge = np.zeros(num_segments)
    volume = np.zeros(num_segments)
    for lab in range(num_segments):
        mask = labels == lab
        charge[lab] = density[mask].sum() * voxel_vol
        volume[lab] = mask.sum() * voxel_vol
    return charge, volume
