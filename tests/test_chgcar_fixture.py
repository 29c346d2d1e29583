"""End-to-end golden test on the committed CHGCAR fixture.

The goldens (tests/fixtures/CHGCAR_fixture_golden.json) were produced by the
clean-room oracle chain implementing the reference algorithm's default
semantics — order-dependent neargrid partition + ('changed', 2) refinement +
27-image atom assignment (see make_chgcar_fixture.py).  This pins the full
product path (file read -> Bader() -> per-atom charges) to the reference
algorithm on a realistic multi-atom cell, at the acceptance config.
"""
import json
import os

import numpy as np
import pytest

from pybader_tpu.interface import Bader

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(HERE, "fixtures", "CHGCAR_fixture")
GOLDEN = os.path.join(HERE, "fixtures", "CHGCAR_fixture_golden.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def bader_run():
    b = Bader.from_file(FIXTURE)
    assert b.method == "neargrid"
    assert tuple(b.refine_mode) == ("changed", 2)
    b(output=None, export_mode=None)
    return b


def test_fixture_reads_correctly(golden):
    b = Bader.from_file(FIXTURE)
    assert b.density.shape == tuple(golden["shape"])
    assert len(b.atoms) == 8
    vv = b.voxel_volume
    np.testing.assert_allclose(
        float(b.density.sum() * vv), golden["total_charge"], rtol=1e-9)


def _maxima_voxels(b):
    """Recover voxel indices from the stored fractional maxima."""
    shape = np.array(b.density.shape)
    vox = np.rint(
        b.bader_maxima_fractional * shape - b.voxel_offset_fractional
    ).astype(int) % shape
    return [tuple(m) for m in vox]


def test_maxima_match_golden(bader_run, golden):
    got = set(_maxima_voxels(bader_run))
    want = {tuple(m) for m in golden["maxima"]}
    assert got == want
    assert len(bader_run.bader_maxima_fractional) == golden["n_maxima"]


def test_atom_charges_match_golden(bader_run, golden):
    np.testing.assert_allclose(
        bader_run.atoms_charge, golden["atoms_charge"], atol=1e-6)
    np.testing.assert_allclose(
        bader_run.atoms_volume, golden["atoms_volume"], atol=1e-6)


def test_bader_charges_match_golden(bader_run, golden):
    """Per-basin charges, matched through maxima coordinates."""
    got_by_max = {
        m: (float(q), float(v))
        for m, q, v in zip(_maxima_voxels(bader_run),
                           bader_run.bader_charge, bader_run.bader_volume)
    }
    for m, q, v, a in zip(golden["maxima"], golden["bader_charge"],
                          golden["bader_volume"], golden["maxima_atom"]):
        gq, gv = got_by_max[tuple(m)]
        assert abs(gq - q) < 1e-6
        assert abs(gv - v) < 1e-6
    np.testing.assert_array_equal(
        np.asarray(bader_run.bader_atoms, dtype=int),
        golden["maxima_atom"])


def test_charge_conservation(bader_run, golden):
    total = float(np.sum(bader_run.atoms_charge))
    np.testing.assert_allclose(total, golden["total_charge"], rtol=1e-9)
