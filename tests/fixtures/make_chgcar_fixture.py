"""Generate the committed CHGCAR fixture and its golden results.

The fixture is a physically-plausible 8-atom cell with exponential-cusp
atomic densities on a 24x28x32 grid, written in VASP CHGCAR format by an
independent mini-writer (so the fixture does not depend on the package's own
IO).  Goldens are produced by the clean-room oracle chain implementing the
reference algorithm's exact default semantics: order-dependent neargrid
partition (reference methods.py:222-611) + refine_mode=('changed', 2)
re-walks (refinement.py:16-322) + nearest-atom assignment over 27 periodic
images (utils.py:185-232) + per-atom charge/volume sums (utils.py:235-252).

Run from the repo root to regenerate:
    python tests/fixtures/make_chgcar_fixture.py
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tests.oracle import (  # noqa: E402
    charge_sums, neargrid_oracle, refine_oracle,
)
from pybader_tpu import grid as g  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
SHAPE = (24, 28, 32)
LATTICE = np.array([
    [5.4, 0.0, 0.0],
    [0.3, 6.2, 0.0],
    [0.0, 0.4, 7.0],
])
# two species, 3 + 5 atoms (fractional)
ATOMS_FRAC = np.array([
    [0.10, 0.15, 0.20],
    [0.60, 0.20, 0.75],
    [0.25, 0.70, 0.45],
    [0.80, 0.75, 0.15],
    [0.45, 0.45, 0.85],
    [0.90, 0.35, 0.55],
    [0.15, 0.85, 0.80],
    [0.55, 0.90, 0.30],
])
AMPS = np.array([6.0, 5.0, 4.5, 4.0, 3.5, 3.0, 2.5, 2.0])
WIDTHS = np.array([0.55, 0.50, 0.60, 0.45, 0.50, 0.55, 0.45, 0.50])


def density():
    nx, ny, nz = SHAPE
    fx, fy, fz = np.meshgrid(
        np.arange(nx) / nx, np.arange(ny) / ny, np.arange(nz) / nz,
        indexing="ij",
    )
    frac = np.stack([fx, fy, fz], axis=-1)
    rho = np.zeros(SHAPE)
    for c, a, wdt in zip(ATOMS_FRAC, AMPS, WIDTHS):
        for sx in (-1, 0, 1):
            for sy in (-1, 0, 1):
                for sz in (-1, 0, 1):
                    d = (frac - (c + np.array([sx, sy, sz]))) @ LATTICE
                    r = np.sqrt(np.sum(d * d, axis=-1))
                    rho += a * np.exp(-r / wdt)
    return rho


def write_chgcar(path, rho):
    """Minimal CHGCAR writer (independent of pybader_tpu.io)."""
    vol = abs(np.linalg.det(LATTICE))
    lines = ["fixture: 8-atom exponential-cusp cell", "  1.0000000000"]
    for row in LATTICE:
        lines.append("  " + "  ".join(f"{v:18.12f}" for v in row))
    lines.append("  Si  O")
    lines.append("   3   5")
    lines.append("Direct")
    for p in ATOMS_FRAC:
        lines.append("  " + "  ".join(f"{v:16.12f}" for v in p))
    lines.append("")
    lines.append(f" {SHAPE[0]} {SHAPE[1]} {SHAPE[2]}")
    # CHGCAR stores rho * cell volume, z-fastest
    vals = (rho * vol).transpose(2, 1, 0).reshape(-1)
    for i in range(0, len(vals), 5):
        lines.append(" " + " ".join(
            f"{v:17.11E}" for v in vals[i:i + 5]))
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def atom_assign(maxima, atoms_cart):
    """Nearest atom over 27 images per maximum (spec: utils.py:185-232)."""
    shifts = np.array([
        [i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)
    ]) @ LATTICE
    frac = np.array(maxima, dtype=float) / np.array(SHAPE)
    mx_cart = frac @ LATTICE
    out = []
    dists = []
    for m in mx_cart:
        d = np.linalg.norm(
            m[None, None] - (atoms_cart[:, None] + shifts[None]), axis=-1)
        out.append(int(np.argmin(d.min(axis=1))))
        dists.append(float(d.min()))
    return np.array(out), np.array(dists)


def main():
    rho = density()
    path = os.path.join(HERE, "CHGCAR_fixture")
    write_chgcar(path, rho)
    # goldens from the reference-semantics oracle chain (default config)
    w = g.distance_weights(LATTICE, SHAPE)
    tg = g.t_grad(LATTICE, SHAPE)
    labels, maxima = neargrid_oracle(rho, w, tg)
    labels, _ = refine_oracle(rho, w, tg, labels, "changed", 2)
    vv = g.voxel_volume(LATTICE, SHAPE)
    q, v = charge_sums(rho, labels, vv, len(maxima))
    atoms_cart = ATOMS_FRAC @ LATTICE
    assign, dist = atom_assign(maxima, atoms_cart)
    n_atoms = len(ATOMS_FRAC)
    atoms_charge = np.zeros(n_atoms)
    atoms_volume = np.zeros(n_atoms)
    for b, a in enumerate(assign):
        atoms_charge[a] += q[b]
        atoms_volume[a] += v[b]
    golden = {
        "shape": list(SHAPE),
        "n_maxima": len(maxima),
        "maxima": [list(map(int, m)) for m in maxima],
        "maxima_atom": assign.tolist(),
        "bader_charge": [float(x) for x in q],
        "bader_volume": [float(x) for x in v],
        "atoms_charge": atoms_charge.tolist(),
        "atoms_volume": atoms_volume.tolist(),
        "total_charge": float(rho.sum() * vv),
    }
    with open(os.path.join(HERE, "CHGCAR_fixture_golden.json"), "w") as fh:
        json.dump(golden, fh, indent=1)
    print(f"fixture written: {len(maxima)} maxima, "
          f"atoms_charge={np.round(atoms_charge, 4)}")


if __name__ == "__main__":
    main()
