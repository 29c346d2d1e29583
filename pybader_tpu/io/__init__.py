"""I/O subpackage: density-file readers and writers.

Contract (mirrors the reference io package, /root/reference/pybader/io/
__init__.py:3-7): every module exposes ``__extensions__`` (filename
fragments to match, or None for object-only), ``__args__`` (read kwargs) and
``read(filename, **kw) -> (density_dict, lattice, atoms, file_info)`` where
``density_dict`` holds float64 'charge' and/or 'spin' grids in rho units
(file units divided by the cell volume where applicable), ``lattice`` is a
3x3 row-vector matrix in Angstrom, ``atoms`` are cartesian positions and
``file_info`` carries filename, prefix, file_type, write_function,
voxel_offset plus format-specific flags.
"""
from pybader_tpu.io import cube, pymatgen, vasp

try:  # gpaw module is importable without gpaw; reader needs it
    from pybader_tpu.io import gpaw
except ImportError:  # pragma: no cover
    pass
