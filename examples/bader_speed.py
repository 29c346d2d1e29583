"""Manual pipeline for the speed profile — mirrors reference examples/bader.py.

Usage: python bader_speed.py path/to/density
"""
import sys
from time import time

from pybader_tpu.interface import Bader

t0 = time()
bader = Bader.from_file(sys.argv[1], spin_flag=True)
bader.load_config('speed')
bader.spin_flag = True  # loading the speed config resets all config vars
bader.volumes_init()
bader.bader_calc()
bader.bader_to_atom_distance()
bader.refine_volumes(bader.atoms_volumes)
bader.min_surface_distance()
bader.sum_volumes()
print('\n  Writing output file: ', end='')
if bader.output == 'pickle':
    bader.to_file()
print('Done.')
print(f"Time taken: {time() - t0:.3f}s")
