"""Speed-profile pipeline, stage by stage.

Runs the same stages ``Bader.__call__`` runs for the built-in 'speed'
profile (ongrid partition, atom assignment first, then neargrid refinement
of the atom partition — skipping the per-basin refine+sum pass), but
invoked manually so each stage can be timed or swapped.  Matches the
reference's speed-profile acceptance workload.

Usage: python bader_speed.py path/to/density [--no-spin]
"""
import sys
from time import perf_counter

from pybader_tpu.interface import Bader

path = sys.argv[1]
want_spin = "--no-spin" not in sys.argv[2:]

stages = []


def stage(name, fn, *args):
    t0 = perf_counter()
    out = fn(*args)
    stages.append((name, perf_counter() - t0))
    return out


bader = Bader.from_file(path, spin_flag=want_spin)
bader.load_config("speed")
bader.spin_flag = want_spin  # load_config resets every config attribute

stage("vacuum mask", bader.volumes_init)
stage("partition", bader.bader_calc)
stage("atom assignment", bader.bader_to_atom_distance)
stage("refinement", bader.refine_volumes, bader.atoms_volumes)
stage("surface distance", bader.min_surface_distance)
stage("charge sums", bader.sum_volumes)
if bader.output == "pickle":
    stage("pickle", bader.to_file)

print()
for name, dt in stages:
    print(f"  {name:<18s} {dt:8.3f}s")
print(f"  {'total':<18s} {sum(dt for _, dt in stages):8.3f}s")
