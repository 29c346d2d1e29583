"""Pick a vacuum tolerance by re-thresholding stored volumes.

Exercises the same acceptance workload as the reference's vacuum_tol
example (a speed_flag run followed by a descending vacuum_tol scan that
re-runs ``volumes_init`` on the already-partitioned grid), written against
this package's API.  Re-thresholding never re-partitions: each candidate
tolerance only masks more/fewer voxels as vacuum and re-sums, so the scan
is cheap even on large grids.

Usage: python vacuum_tol.py [CHGCAR] [max-vacuum-charge]
"""
import sys

from pybader_tpu.interface import Bader

filename = sys.argv[1] if len(sys.argv) > 1 else "CHGCAR"
max_vacuum_charge = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1

bader = Bader.from_file(filename)
bader(speed_flag=True)

chosen = None
for tol in (t * 1e-4 for t in range(10, 0, -1)):
    bader.vacuum_tol = tol
    # re-threshold the existing atom partition in place: voxels below the
    # new tolerance become vacuum, everything else keeps its atom label
    bader.volumes_init(bader.atoms_volumes)
    bader.atoms_volumes = bader.bader_volumes
    bader.sum_volumes()
    print(f"  vacuum_tol={tol:.1e}: vacuum charge {bader.vacuum_charge:.6f}")
    chosen = tol
    if bader.vacuum_charge < max_vacuum_charge:
        break

print(bader.results())
print(f" Vacuum Tolerance: {chosen}")
