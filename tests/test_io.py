"""IO round-trip tests: CHGCAR and cube readers/writers."""
import numpy as np
import pytest

from tests.test_ongrid import LATTICE, make_density

from pybader_tpu.io import cube, vasp
from pybader_tpu.utils import dtype_calc, fortran_format, python_format


ATOMS = np.array([
    [1.0, 1.2, 1.4],
    [3.0, 2.5, 3.5],
])


def _write_chgcar(path, rho, spin=None, fortran=0):
    density = {"charge": rho}
    info = {
        "comment": "test cell\n",
        "element_nums": np.array([1, 1]),
        "elements": ["Si", "O"],
        "charge_flag": True,
        "spin_flag": spin is not None,
        "fortran_format": fortran,
    }
    if spin is not None:
        density["spin"] = spin
    vasp.write(str(path), ATOMS.copy(), LATTICE.copy(), density, info,
               prefix="", suffix="")


@pytest.mark.parametrize("fortran", [0, 1, 2])
def test_chgcar_roundtrip(tmp_path, fortran):
    rho = make_density(0)
    fn = tmp_path / "CHGCAR"
    _write_chgcar(fn, rho, fortran=fortran)
    density, lattice, atoms, info = vasp.read(str(fn))
    np.testing.assert_allclose(lattice, LATTICE, atol=2e-6)
    np.testing.assert_allclose(atoms, ATOMS, atol=2e-6)
    assert density["charge"].shape == rho.shape
    np.testing.assert_allclose(density["charge"], rho, rtol=2e-10)
    assert info["file_type"] == "VASP"
    assert info["write_function"] is vasp.write
    np.testing.assert_array_equal(info["voxel_offset"], np.zeros(3))


def test_chgcar_spin_roundtrip(tmp_path):
    rho = make_density(1)
    spin = make_density(2) * 0.1
    fn = tmp_path / "CHGCAR"
    _write_chgcar(fn, rho, spin=spin)
    density, lattice, atoms, info = vasp.read(str(fn), spin_flag=True)
    np.testing.assert_allclose(density["charge"], rho, rtol=2e-10)
    np.testing.assert_allclose(density["spin"], spin, rtol=2e-10, atol=1e-14)


def test_chgcar_spin_missing(tmp_path, capsys):
    rho = make_density(3)
    fn = tmp_path / "CHGCAR"
    _write_chgcar(fn, rho)
    density, *_ = vasp.read(str(fn), spin_flag=True)
    assert "spin" not in density
    assert "No spin density" in capsys.readouterr().out


def test_cube_roundtrip(tmp_path):
    rho = make_density(4)
    fn = tmp_path / "density"
    info = {
        "comment": "test\n",
        "elements": np.array([14, 8]),
        "fortran_format": 0,
    }
    cube.write(str(fn), ATOMS.copy(), LATTICE.copy(),
               {"charge": rho.copy()}, info, prefix="")
    density, lattice, atoms, out_info = cube.read(str(fn) + ".cube")
    np.testing.assert_allclose(lattice, LATTICE, atol=2e-5)
    np.testing.assert_allclose(atoms, ATOMS, atol=2e-5)
    np.testing.assert_allclose(density["charge"], rho, rtol=2e-5)
    np.testing.assert_array_equal(
        out_info["voxel_offset"], np.array([0.5, 0.5, 0.5])
    )


def test_dtype_calc():
    assert dtype_calc(200) == "uint8"
    assert dtype_calc(300) == "uint16"
    assert dtype_calc(70000) == "uint32"
    assert dtype_calc(5e9) == "uint64"
    assert dtype_calc(-100) == "int8"
    assert dtype_calc(-127) == "int8"
    assert dtype_calc(-128) == "int16"  # reference doubling rule
    assert dtype_calc(-40000) == "int32"


def test_fortran_format_strings():
    a = np.array([[12.345, -0.00321, 0.0, 1.0, -1e-12]])
    out = fortran_format(a, 11)
    assert out == (
        " 0.12345000000E+02 -.32100000000E-02 0.00000000000E+00"
        " 0.10000000000E+01 -.10000000000E-11\n"
    )


def test_python_format_strings():
    a = np.array([[1.5, -2.25]])
    assert python_format(a, 3) == " 1.500E+00 -2.250E+00\n"
    assert python_format(a, 3, " ") == "  1.500E+00 -2.250E+00\n"


def test_format_values_roundtrip():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(8, 5)) * 10.0 ** rng.integers(-8, 8, size=(8, 5))
    for fmt in (lambda x: fortran_format(x, 11), lambda x: python_format(x, 11)):
        parsed = np.array(fmt(a).split(), dtype=np.float64).reshape(a.shape)
        np.testing.assert_allclose(parsed, a, rtol=1e-10)
