"""Charge + separate spin cube files — mirrors the reference example.

Usage: python cube_spin_density.py charge.cube spin.cube
"""
import sys

from pybader_tpu.interface import Bader
from pybader_tpu.io import cube

bader = Bader.from_file(sys.argv[1])
density, _, _, _ = cube.read(sys.argv[2])
bader.spin = density['charge']
bader.spin_flag = True
bader()
