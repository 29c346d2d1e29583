"""Accuracy-vs-refinement study — mirrors reference examples/compare_methods.py.

Ground truth is refine_mode=('all', -1) (refine every edge until no voxel
changes); sweeps method x speed_flag x refinement iterations and reports
the summed and maximum per-atom charge differences.

Usage: python compare_methods.py density_file
"""
import sys

import numpy as np

from pybader_tpu.interface import Bader
from pybader_tpu.utils import nostdout

bader = Bader.from_file(sys.argv[1])
bader.refine_mode = ('all', -1)
bader()
correct_charge = bader.atoms_charge.copy()

rows = []
for i in range(3):
    for method in ('neargrid', 'ongrid'):
        for speed in (False, True):
            bader.refine_mode = ('changed', i)
            bader.method = method
            bader.refine_method = 'neargrid'
            bader.speed_flag = speed
            with nostdout():
                bader()
            d = np.abs(correct_charge - bader.atoms_charge)
            rows.append((method, speed, i, d.sum(), d.max()))
            print(f"{method:9s} speed={speed!s:5s} iters={i}: "
                  f"sum|dq|={d.sum():.2e}  max|dq|={d.max():.2e}")
