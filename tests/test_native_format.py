"""The native density-text formatter is byte-exact vs the Python paths.

native/fastparse.cpp:fp_format replaces the per-value Python formatting
(utils.python_format / fortran_format) for large blocks — a 512^3 CHGCAR
write drops from minutes to seconds.  Both implementations share the exact
double arithmetic (libm log10/pow, printf %.xE == Python :.xE), asserted
here over adversarial values: negatives, zeros, denormals, huge/tiny
exponents, exact powers of ten, rounding-overflow mantissas.
"""
import numpy as np
import pytest

from pybader_tpu import utils

try:
    from pybader_tpu.io._fastparse import format_floats

    format_floats(np.ones(8), 5, 0, 11)
    HAVE_NATIVE = True
except Exception:  # pragma: no cover — toolchain missing
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native toolchain unavailable")


def _python_python_format(a, prec, align=""):
    fmt = (f" {{:{align}.{prec}E}}" * a.shape[1] + "\n") * a.shape[0]
    return fmt.format(*a.reshape(-1))


def _python_fortran_format(a, prec):
    rows, cols = a.shape
    flat = a.reshape(-1)
    out = []
    for i, v in enumerate(flat):
        if v == 0.0:
            s = " 0." + "0" * prec + "E+00"
        else:
            av = abs(v)
            exp = int(np.floor(np.log10(av))) + 1
            value = int(0.5 + av / 10.0 ** (exp - prec))
            digits = str(value)[:prec].ljust(prec, "0")
            sign = " -." if v < 0 else " 0."
            esign = "E-" if exp < 0 else "E+"
            s = f"{sign}{digits}{esign}{abs(exp):02d}"
        out.append(s)
        if (i + 1) % cols == 0:
            out.append("\n")
    return "".join(out)


def _adversarial(n=2000, seed=0, extreme=True):
    """Adversarial value set.  ``extreme=False`` keeps |exponents| < 290:
    the fortran formatter (Python AND reference, utils.py:40-94) computes
    10.0**(exp-prec), which underflows to 0 below ~1e-297 and raises
    OverflowError — a latent limitation shared with the reference, so the
    byte-parity contract only covers representable magnitudes there."""
    rng = np.random.default_rng(seed)
    parts = [
        rng.random(n) * 10.0,
        -rng.random(n // 4),
        rng.random(n // 4) * 1e-150,
        rng.random(n // 4) * 1e150,
        np.array([0.0, 1.0, -1.0, 10.0, 100.0, 1000.0, 0.1, 0.01]),
        np.array([9.999999999999e5, 9.99999999999999e-3]),
        10.0 ** rng.integers(-200, 200, n // 4).astype(float),
    ]
    if extreme:
        parts.append(np.array([5e-324, 1e308]))
    vals = np.concatenate(parts)
    rng.shuffle(vals)
    # pad to a multiple of 5 so rows are full (partial row tested apart)
    pad = (-len(vals)) % 5
    return np.concatenate([vals, np.ones(pad)]).reshape(-1, 5)


@pytest.mark.parametrize("mode,align", [(0, ""), (1, " ")])
def test_python_modes_byte_exact(mode, align):
    a = _adversarial()
    want = _python_python_format(a, 11, align)
    got = format_floats(a, 5, mode, 11)
    assert got == want


def test_fortran_mode_byte_exact():
    a = _adversarial(seed=1, extreme=False)
    want = _python_fortran_format(a, 11)
    got = format_floats(a, 5, 2, 11)
    assert got == want


def test_partial_row_and_single_value():
    a = np.array([[1.25, -3.5e-7, 0.0]])
    for mode, ref in ((0, _python_python_format(a, 11)),
                      (2, _python_fortran_format(a, 11))):
        assert format_floats(a, 3, mode, 11) == ref
    b = np.array([[42.0]])
    assert format_floats(b, 5, 0, 11) == _python_python_format(b, 11)


def test_utils_dispatch_equivalence():
    """The utils entry points produce identical text across the size
    threshold (native above, Python below)."""
    rng = np.random.default_rng(2)
    big = rng.random((8192, 5)) * np.exp(rng.normal(0, 30, (8192, 5)))
    small = big[:16]
    for fn in (lambda x: utils.python_format(x, 11),
               lambda x: utils.python_format(x, 11, " "),
               lambda x: utils.fortran_format(x, 11)):
        big_txt = fn(big)
        # recompute the first 16 rows through the (Python) small path
        head = fn(small)
        assert big_txt.startswith(head)


def test_row_len_matches_per_row_formatting():
    """row_len mode == formatting each logical row independently (cube
    writer layout: 6 per line, partial last line per z-row)."""
    rng = np.random.default_rng(5)
    nz = 17  # deliberately not a multiple of 6
    plane = rng.random((9, nz)) * 1e3
    got = format_floats(plane, 6, 0, 5, row_len=nz)
    want = ""
    for row in plane:
        full = (nz // 6) * 6
        want += _python_python_format(row[:full].reshape(-1, 6), 5)
        if nz % 6:
            want += _python_python_format(row[full:].reshape(1, -1), 5)
    assert got == want


def test_throughput_sanity():
    """Native per-value rate beats Python by a real margin.

    Measured ~7x single-core on the 1-CPU dev VM (4.5M vs 0.6M values/s);
    multi-core hosts add thread scaling on top.  Asserted at 4x to absorb
    CI noise — a genuine bound, unlike the old vacuous +1.0s slack."""
    import time

    a = np.random.default_rng(3).random((20000, 5))
    format_floats(a, 5, 0, 11)  # warm (first call may build the .so)

    def best(fn, arg):
        # process_time + best-of-3: robust to other processes contending
        # for the (possibly single) CPU while the suite runs
        ts = []
        for _ in range(3):
            t0 = time.process_time()
            fn(arg)
            ts.append(time.process_time() - t0)
        return min(ts)

    native_rate = a.size / best(lambda x: format_floats(x, 5, 0, 11), a)
    python_rate = a[:2000].size / best(
        lambda x: _python_python_format(x, 11), a[:2000])
    assert native_rate > 4 * python_rate


def test_nonfinite_values_match_python():
    """nan/inf (no exponent in to_chars output) must not corrupt the
    buffer: modes 0/1 uppercase the whole token like Python's :.xE does
    (advisor finding: the old backward 'e' scan overwrote byte 0)."""
    a = np.array([[np.nan, np.inf, -np.inf, 1.5, -2.25e-3]])
    for mode, align in ((0, ""), (1, " ")):
        got = format_floats(a, 5, mode, 11)
        want = _python_python_format(a, 11, align=align)
        assert got == want
    # mode 2 (fortran form) has no Python analog for non-finite (the
    # log10 arithmetic is undefined there); it must at least emit sane
    # uppercase tokens instead of corrupted text
    got2 = format_floats(a, 5, 2, 11)
    assert "NAN" in got2 and "INF" in got2 and "E" in got2
    assert "Ean" not in got2 and "Enf" not in got2
