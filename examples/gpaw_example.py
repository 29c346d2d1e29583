"""In-memory GPAW calculator -> Bader analysis — mirrors the reference example.

Requires gpaw + ase (not bundled); shown for API parity.
"""
from ase.build import molecule
from gpaw import GPAW

from pybader_tpu.interface import Bader
from pybader_tpu.io import gpaw as gpaw_io

atoms = molecule('H2O')
atoms.center(vacuum=3.5)
atoms.calc = GPAW(h=0.17, txt='h2o.txt')
atoms.get_potential_energy()

bader = Bader(*gpaw_io.read_obj(atoms.calc))
bader()

x = bader.density.shape[0] // 2
density_slice = bader.density[x]
vol_slice = bader.atoms_volumes[x]
print("density slice", density_slice.shape, "labels slice", vol_slice.shape)
