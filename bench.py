#!/usr/bin/env python
"""Driver benchmark: Bader partition throughput on one chip.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline workload (matches the BASELINE.md north star): the PRODUCT ongrid
partition path at 384^3 — `pipeline.partition_ongrid` end-to-end (dd-Pallas
ascent stencil, directional-scan label flooding, discovery-order
renumbering) plus per-basin charge/volume sums.  stderr detail adds 512^3
and the DEFAULT config pipeline (method=neargrid via the documented hybrid,
refine_mode=('changed', 2), maxima->atom assignment, surface distance) —
the reference's acceptance workload (BASELINE.md:28-31) — with refinement
iteration statistics (edges walked / changed / step-cap fires).

Budget discipline (the round-2 artifact timed out; round 3 lost the
headline to a cold compile cache): each (size, workload) runs in its own
subprocess under its own budget, the synthetic density is generated ON
DEVICE via separable circulant matmuls (a 384^3 host FFT plus grid upload
through the tunnel costs minutes; the MXU matmuls are milliseconds), and
every workload emits a PROVISIONAL result line the moment its warm pass
finishes, so a slow tunnel compile degrades the headline number instead
of zeroing it.  stdout still carries exactly one JSON line: the driver
holds the provisional 384^3 partition number and prints the timed-pass
number if it lands in budget, the provisional one otherwise.

vs_baseline: ratio to the reference CPU implementation's ongrid phase,
anchored by a MEASURED number: native/serial_baseline.cpp (clean-room
serial implementation of the reference's ongrid kernel semantics,
methods.py:15-219) is timed on this host at ANCHOR_SIZE^3 on the same
dense field and scaled by an assumed linear 8-thread speedup (the
reference's default thread count; generous to the reference).  See
BASELINE.md for the methodology and recorded anchors.  Falls back to the
documented dev-VM measurement if the toolchain is unavailable.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

REFERENCE_THREADS = 8
# measured on the round-3 dev VM (1 core, dense bg_amp=10 field, no
# vacuum): 7.5/4.7/4.4 Mvox/s at 128/192/384 cubed (BASELINE.md) — the
# fallback when the bench host can't build the serial baseline in-run
FALLBACK_SERIAL_VOX_PER_SEC = 4.5e6
ANCHOR_SIZE = 192  # serial anchor grid (FFT+walk ~40 s once, then cached)


def _blob_filter(shape, blur, bg_amp, bg_blur):
    k2 = sum(
        np.fft.fftfreq(s).reshape([-1 if i == d else 1 for i in range(3)]) ** 2
        for d, s in enumerate(shape)
    )
    f = np.exp(-k2 * blur)
    if bg_amp:
        f = f + bg_amp * np.exp(-k2 * bg_blur)
    return f


def synthetic_density(shape, n_blobs=60, seed=1, blur=400.0,
                      bg_amp=10.0, bg_blur=40000.0, return_centers=False):
    """Dense periodic blob field, a stand-in for a bulk-solid CHGCAR.

    Sharp gaussian blobs (atomic peaks) ride on a broad smooth background
    (interstitial density) built from the same impulses.  The background
    matters: without it the field is numerically ~zero between blobs and
    the f64 FFT noise there spawns hundreds of thousands of meaningless
    one-voxel basins (round-2's field needed a vacuum mask to be usable,
    which made the workload 98% trivial skips — flattering to nobody).
    Here every voxel does real ascent work, the basin count stays at
    ~n_blobs, and no vacuum mask is needed — matching the reference's
    default config (vacuum_tol=None).
    """
    rng = np.random.default_rng(seed)
    rho = np.zeros(shape)
    idx = tuple(rng.integers(0, s, size=n_blobs) for s in shape)
    rho[idx] = rng.uniform(1.0, 3.0, size=n_blobs)
    filt = _blob_filter(shape, blur, bg_amp, bg_blur)
    rho = np.real(np.fft.ifftn(np.fft.fftn(rho) * filt))
    rho = np.ascontiguousarray(rho - rho.min() + 1e-9)
    if return_centers:
        centers = np.stack(idx, axis=1) / np.asarray(shape)  # fractional
        return rho, centers
    return rho


def _circulant_gauss(n, blur):
    """(n, n) circulant periodic-gaussian blur matrix (host f64)."""
    k = np.fft.fftfreq(n)
    g = np.real(np.fft.ifft(np.exp(-k * k * blur)))  # kernel row
    i = np.arange(n)
    return g[(i[:, None] - i[None, :]) % n]


def synthetic_density_device(shape, n_blobs=60, seed=1, blur=400.0,
                             bg_amp=10.0, bg_blur=40000.0):
    """Device-side f64 blob field (same construction as synthetic_density).

    The TPU backend has no complex FFT, but the periodic gaussian blur is
    separable: three circulant matmuls per blur scale, f32 on the MXU
    (milliseconds at 384^3 vs minutes for the host FFT + grid upload).
    f32 arithmetic noise is ~5 orders of magnitude below the interstitial
    background level at bg_amp=10, so the field keeps the same basin
    structure as the host version (checked: identical maxima counts under
    f32 quantization at 128^3/192^3).

    The normalised f32 field is cached on the host disk per (shape,
    params): a fresh process through the remote-device tunnel pays
    ~1-2 s of eager-op dispatch for each of the ~50 synthesis ops even
    with every compile cached (measured 250-450 s at 384^3), while a
    one-time 225 MB fetch + per-run upload costs ~10-20 s.  The upload
    path casts the identical f32 array, so the f64 field is bit-equal
    to the matmul construction.
    returns (rho device f64 array, centers fractional (n_blobs, 3)).
    """
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    idx = tuple(rng.integers(0, s, size=n_blobs) for s in shape)
    vals = rng.uniform(1.0, 3.0, size=n_blobs)
    centers = np.stack(idx, axis=1) / np.asarray(shape)

    cache = os.path.expanduser(
        "~/.cache/bader-tpu/field_{}x{}x{}_b{}_s{}_bl{:g}_ba{:g}_bb{:g}"
        ".npy".format(*shape, n_blobs, seed, blur, bg_amp, bg_blur))
    try:
        rho32 = np.load(cache)
        if rho32.shape == tuple(shape):
            return jnp.asarray(rho32).astype(jnp.float64), centers
    except Exception:
        pass

    flat_idx = np.ravel_multi_index(idx, shape)
    imp = jnp.zeros(int(np.prod(shape)), jnp.float32).at[
        jnp.asarray(flat_idx)].add(
        jnp.asarray(vals, jnp.float32)).reshape(shape)

    def blur_sep(a, b):
        cs = [jnp.asarray(_circulant_gauss(s, b), jnp.float32)
              for s in shape]
        # precision='highest': TPU matmuls default to bf16 inputs, whose
        # ~8-bit mantissa drowns the interstitial background in noise
        # (measured: 529 spurious maxima at 128^3 instead of ~55)
        a = jnp.einsum("ai,iyz->ayz", cs[0], a, precision="highest",
                       preferred_element_type=jnp.float32)
        a = jnp.einsum("bj,ajz->abz", cs[1], a, precision="highest",
                       preferred_element_type=jnp.float32)
        return jnp.einsum("ck,abk->abc", cs[2], a, precision="highest",
                          preferred_element_type=jnp.float32)

    rho32 = blur_sep(imp, blur) + jnp.float32(bg_amp) * blur_sep(imp, bg_blur)
    rho32 = rho32 - jnp.min(rho32) + 1e-9
    try:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.save(cache, np.asarray(rho32, dtype=np.float32))
    except Exception:
        pass  # caching is an optimisation, never a hard fail
    return rho32.astype(jnp.float64), centers


def _sync_scalar(x):
    """Device sync via a scalar fetch (block_until_ready is unreliable
    through the remote-device tunnel)."""
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def _enable_cache():
    """Persistent XLA cache: warm compiles survive across subprocesses and
    driver runs."""
    try:
        from pybader_tpu.precompile import enable_persistent_cache

        enable_persistent_cache()
    except Exception as e:  # cache is an optimisation, never a hard fail
        print(f"  (persistent cache unavailable: {e})", file=sys.stderr)


def measured_baseline():
    """Serial reference-semantics ongrid throughput on THIS host (vox/s).

    Builds native/serial_baseline.cpp on first use and times an
    ANCHOR_SIZE^3 partition of the SAME dense synthetic field the bench
    partitions on device; the measurement is cached per host under
    ~/.cache/bader-tpu (the field build dominates the one-time cost).
    Returns the fallback constant if anything fails.
    """
    import ctypes
    import tempfile

    cache_file = os.path.expanduser(
        "~/.cache/bader-tpu/serial_anchor.json")
    key = f"dense-{ANCHOR_SIZE}-seed1-v2"
    try:
        with open(cache_file) as f:
            cached = json.load(f)
        if cached.get("key") == key:
            print(f"  serial baseline (cached): "
                  f"{cached['vox_per_sec']/1e6:.2f} Mvox/s "
                  f"x {REFERENCE_THREADS} threads assumed",
                  file=sys.stderr)
            return float(cached["vox_per_sec"])
    except Exception:
        pass
    try:
        src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "native", "serial_baseline.cpp")
        lib_path = os.path.join(tempfile.gettempdir(),
                                f"serial_baseline-{os.getuid()}.so")
        if not os.path.isfile(lib_path) or (
                os.path.getmtime(src) > os.path.getmtime(lib_path)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", lib_path, src],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(lib_path)
        lib.so_partition.restype = ctypes.c_long
        lib.so_partition.argtypes = (
            [ctypes.POINTER(ctypes.c_double)] + [ctypes.c_long] * 3
            + [ctypes.POINTER(ctypes.c_double),
               ctypes.POINTER(ctypes.c_int)])
        from pybader_tpu import grid

        shape = (ANCHOR_SIZE,) * 3
        rho = synthetic_density(shape)
        w = np.asarray(grid.distance_weights(np.diag([20.0] * 3), shape))
        labels = np.empty(shape, dtype=np.int32)
        t0 = time.perf_counter()
        nm = lib.so_partition(
            rho.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), *shape,
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        dt = time.perf_counter() - t0
        if nm <= 0:
            raise RuntimeError(f"so_partition returned {nm}")
        rate = int(np.prod(shape)) / dt
        print(f"  serial baseline (this host, {nm} maxima): "
              f"{rate/1e6:.2f} Mvox/s x {REFERENCE_THREADS} threads "
              f"assumed", file=sys.stderr)
        try:
            os.makedirs(os.path.dirname(cache_file), exist_ok=True)
            with open(cache_file, "w") as f:
                json.dump({"key": key, "vox_per_sec": rate,
                           "n_maxima": int(nm), "seconds": dt}, f)
        except Exception:
            pass
        return rate
    except Exception as e:
        print(f"  serial baseline unavailable ({e}); using recorded "
              f"{FALLBACK_SERIAL_VOX_PER_SEC/1e6:.1f} Mvox/s",
              file=sys.stderr)
        return FALLBACK_SERIAL_VOX_PER_SEC


def run_workloads(size: int, which: str):
    """Run the selected workload(s) for one size; prints one JSON line per
    workload on stdout the moment it completes.  The driver launches one
    subprocess per (size, workload) so a multi-GB workload starts from a
    clean HBM allocator (the 512^3 default next to the partition's
    leftovers exceeded HBM)."""
    import jax.numpy as jnp

    _enable_cache()

    from pybader_tpu import grid, pipeline
    from pybader_tpu.ops import atoms as atoms_ops
    from pybader_tpu.ops import edges as edges_ops
    from pybader_tpu.ops import reductions

    shape = (size, size, size)
    lattice = np.diag([20.0, 20.0, 20.0])
    try:
        rho_dev, centers = synthetic_density_device(shape)
        _sync_scalar(rho_dev)
    except Exception as e:
        print(f"  device density failed ({e}); host fallback",
              file=sys.stderr)
        rho_h, centers = synthetic_density(shape, return_centers=True)
        rho_dev = jnp.asarray(rho_h)
        _sync_scalar(rho_dev)
    # heartbeat: r4's empty rows were indistinguishable from a hang
    # because the child printed nothing until its first full pass — the
    # field-ready mark proves the device allocator came up (its absence
    # after a prior kill = the HBM-leak hang)
    print(f"  [child] {size}^3 field on device; first {which} pass "
          f"starting (a cold compile cache pays minutes of tunnel "
          f"compiles)", file=sys.stderr, flush=True)
    atoms_cart = centers @ lattice
    w = tuple(grid.distance_weights(lattice, shape))
    tg = grid.t_grad(lattice, shape)

    # ---- workload 1: product ongrid partition + charge sums
    # (no vacuum mask: the reference's default config is vacuum_tol=None,
    # and the dense field gives every voxel real ascent work)
    def partition_e2e():
        labels, maxima = pipeline.partition_ongrid(rho_dev, None, w)
        n_max = max(len(maxima), 1)
        charge, counts = reductions.charge_volume_sum(
            rho_dev, labels, 1.0, n_max)
        return n_max, float(jnp.sum(charge)), counts

    if which in ("partition", "both"):
        # provisional line after the warm pass: round 3 lost the headline
        # to value 0.0 because one slow tunnel compile ate the whole
        # budget before the (warm + 2 timed passes) sequence printed
        # anything — a degraded first-pass number beats no number
        t0 = time.perf_counter()
        n_max, total, _ = partition_e2e()  # warm / compile
        warm_t = time.perf_counter() - t0
        print(json.dumps({"size": size, "best": warm_t,
                          "n_max": n_max, "total": total,
                          "workload": "partition",
                          "provisional": True}), flush=True)
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            partition_e2e()
            times.append(time.perf_counter() - t0)
        print(json.dumps({"size": size, "best": min(times),
                          "n_max": n_max, "total": total,
                          "workload": "partition"}), flush=True)
    if which == "partition":
        return

    # ---- workload 2: default acceptance pipeline
    def default_e2e(stats=None, istats=None):
        carry = {}
        labels, maxima = pipeline.partition_neargrid(
            rho_dev, None, w, tg, carry_out=carry, stats=istats)
        labels, changed = pipeline.refine_labels(
            "neargrid", ("changed", 2), rho_dev, labels, w, tg,
            verbose=False, stats=stats, carry_in=carry or None)
        n_max = max(len(maxima), 1)
        # maxima -> atoms, voxel map relabel (ref thread_handlers:78-125)
        mx_cart = (np.asarray(maxima) / np.asarray(shape)) @ lattice
        atom_of_max, _ = atoms_ops.assign_to_atoms(
            jnp.asarray(mx_cart), jnp.asarray(atoms_cart),
            jnp.asarray(lattice))
        atoms_volumes = reductions.relabel(labels, atom_of_max)
        # surface distance (ref thread_handlers:239-297)
        known = edges_ops.edge_find(rho_dev, atoms_volumes)
        dists = atoms_ops.surface_distance_masked(
            atoms_volumes, known == -2, jnp.asarray(lattice),
            jnp.asarray(atoms_cart), len(atoms_cart))
        charge, counts = reductions.charge_volume_sum(
            rho_dev, atoms_volumes, 1.0, len(atoms_cart))
        _sync_scalar(dists)
        return n_max, int(changed), float(jnp.sum(charge))

    # warm + timed: a fresh process pays ~0.5 s of executable-load /
    # first-dispatch cost per program even with every XLA compile in the
    # persistent cache (measured 215 s first pass vs 69 s steady-state at
    # 384^3 across the ~100 programs of this pipeline), so a single-run
    # number measures the harness, not the pipeline.  Both numbers are
    # reported: ``cold`` (first pass, what a one-shot CLI user sees with
    # a warm compile cache) and ``best`` (steady state).
    stats, istats = {}, {}
    t0 = time.perf_counter()
    n_max, changed, total = default_e2e(stats, istats)
    cold = time.perf_counter() - t0
    print(json.dumps({"size": size, "best": cold, "cold": cold,
                      "n_max": n_max, "changed": changed,
                      "workload": "default",
                      "refine_stats": stats.get("iterations", []),
                      "refine_stats_internal": istats.get("iterations", []),
                      "provisional": True}), flush=True)
    t0 = time.perf_counter()
    n_max, changed, total = default_e2e()
    best = time.perf_counter() - t0
    print(json.dumps({"size": size, "best": best, "cold": cold,
                      "n_max": n_max, "changed": changed,
                      "workload": "default",
                      "refine_stats": stats.get("iterations", []),
                      "refine_stats_internal": istats.get("iterations", [])}),
          flush=True)


def _clean_exit():
    """Release HBM explicitly, then exit with a bounded teardown.

    The round-4 artifact lost three of four workload rows to a
    kill->HBM-leak cascade: the driver killed each child the moment its
    results arrived, killed TPU clients leak their HBM for ~10-20 min on
    this environment, and every subsequent child hung silently inside its
    first large allocation for its whole budget.  The fix is on the child
    side: delete every live device buffer (buffer frees are explicit
    client->server operations that complete before we exit, unlike a
    kill, which drops the connection with the buffers still held), sync
    so the frees actually reach the server, then hard-exit: with the HBM
    already released there is nothing left for the XLA/tunnel teardown
    (which can hang for minutes) to do.
    """
    sys.stdout.flush()
    sys.stderr.flush()
    try:
        import jax
        import jax.numpy as jnp

        for a in jax.live_arrays():
            a.delete()
        float(jnp.zeros(()) + 1.0)  # round trip: frees reached the server
    except Exception:
        pass
    os._exit(0)


def _hbm_probe():
    """Child mode: prove a ~1 GB device allocation completes.

    The driver runs this between workloads after any kill: a leak from a
    killed predecessor makes this hang (the observed failure mode), and
    the gate retries off-budget until the server reclaims the memory —
    a leak then degrades start time, never the measurement.
    """
    import jax.numpy as jnp

    # 4 GiB: a 1 GiB probe cleared while a multi-GB workload alloc was
    # still blocked behind the remnant leak (measured r5) — probe at
    # workload scale
    x = jnp.ones((1 << 30,), jnp.float32)
    print(f"probe ok {_sync_scalar(x)}", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        _hbm_probe()
        _clean_exit()
        return
    if len(sys.argv) > 1 and sys.argv[1].startswith("--size="):
        size = int(sys.argv[1].split("=")[1])
        which = sys.argv[2] if len(sys.argv) > 2 else "both"
        run_workloads(size, which)
        _clean_exit()
        return

    serial = measured_baseline()
    baseline_8t = serial * REFERENCE_THREADS
    # headline discipline: stdout carries exactly ONE JSON line.  The
    # provisional (warm-pass) partition number is held until the final
    # (timed-pass) number lands or the 384^3 partition workload ends,
    # whichever first — round 3 scored 0.0 because the old
    # print-only-after-two-timed-passes flow never emitted anything
    # inside its budget on a cold compile cache.
    headline_value = None  # best 384^3 partition vox/s seen so far
    headline_done = False

    def emit_headline():
        nonlocal headline_done
        if headline_done:
            return
        headline_done = True
        v = headline_value or 0.0
        print(json.dumps({
            "metric": "ongrid_partition_voxels_per_sec_384cube",
            "value": round(v, 1), "unit": "voxel/s",
            "vs_baseline": round(v / baseline_8t, 2),
        }), flush=True)

    # budgets: a cold compile cache pays 1-5 min of tunnel compiles per
    # new shape, and first-pass program loads scale with shape — so the
    # 512^3 partition gets at least the 384^3 budget (the r4 240 s budget
    # was backwards) and the provisional line means each budget bounds
    # degradation, not success/failure.  The default workloads' budgets
    # must cover a COLD-cache first pass (any code change to the walker
    # invalidates every screened-walk program at once — measured: the
    # r5 _QS_EPS change pushed the 384^3 default first pass past 480 s
    # of tunnel compiles), and every workload gets a second attempt when
    # the first produced nothing: the compiles attempt 1 finished are in
    # the persistent cache either way.
    budget = {(384, "partition"): 480, (384, "default"): 900,
              (512, "partition"): 480, (512, "default"): 1200}
    # final JSON lines each workload emits (provisional lines don't
    # count); once they all arrived the child releases its HBM and exits
    # on its own (_clean_exit) — the driver only kills on budget expiry,
    # and any kill arms the HBM probe gate for the next launch
    expected = {"partition": 1, "default": 1}

    def handle_line(line, size, which, counts):
        if not line.startswith("{"):
            return
        try:
            r = json.loads(line)
        except ValueError:
            return  # partial line from a killed child
        counts["any"] += 1
        n = size ** 3
        extra = ""
        if r["workload"] == "default" and r.get("refine_stats"):
            it = ["/".join(map(str, t)) for t in r["refine_stats"]]
            extra = (f", refine edges/changed/capped per iter: "
                     f"{'; '.join(it)}")
        if r["workload"] == "default" and r.get("refine_stats_internal"):
            it = ["/".join(map(str, t))
                  for t in r["refine_stats_internal"]]
            extra += f", internal iters: {'; '.join(it)}"
        if "cold" in r and r["cold"] != r["best"]:
            extra += f", first pass {r['cold']:.3f}s"
        tag = " (first pass)" if r.get("provisional") else ""
        print(
            f"  {r['workload']}{tag} {size}^3: {r['best']:.3f}s "
            f"e2e, {n / r['best'] / 1e6:.1f} Mvox/s, "
            f"{r['n_max']} basins{extra}",
            file=sys.stderr,
        )
        if r["workload"] == "partition" and size == headline_size:
            nonlocal headline_value
            headline_value = max(headline_value or 0.0, n / r["best"])
            if not r.get("provisional"):
                emit_headline()
        if not r.get("provisional"):
            counts["got"] += 1

    schedule = [(384, "partition"), (512, "partition"),
                (384, "default"), (512, "default")]
    if os.environ.get("PYBADER_TPU_BENCH_SIZES"):
        # test/dev override: "48:partition,48:default" (budgets default
        # to 300 s for sizes not in the table)
        schedule = [
            (int(s.split(":")[0]), s.split(":")[1])
            for s in os.environ["PYBADER_TPU_BENCH_SIZES"].split(",")
        ]
    headline_size = next(s for s, w in schedule if w == "partition")
    # EVERY workload gets a second attempt if its first one ends with NO
    # result line at all (not even the provisional warm-pass line): a
    # cold XLA/Mosaic cache pays minutes of tunnel compiles, and attempt
    # 1 leaves the persistent cache warm for attempt 2 — the in-run
    # analog of the reference's install-time JIT warm (reference
    # entry_points.py:358-379).  r4 lost three rows by retrying only the
    # headline.
    run_list = [(size, which, 2) for size, which in schedule]
    for size, which, attempts_left in run_list:
        while attempts_left > 0:
            attempts_left -= 1
            if _NEED_GATE[0]:
                _hbm_gate()
                _NEED_GATE[0] = False
            got_any = _run_one(size, which, budget, expected, handle_line)
            if got_any or attempts_left == 0:
                break
            print(f"  {which} {size}^3: no result at all — retrying "
                  f"(compile cache is warmer now)", file=sys.stderr)
        if size == headline_size and which == "partition":
            emit_headline()  # provisional (or 0.0) if no final landed
    emit_headline()


# armed whenever a child had to be killed (budget expiry / hung exit):
# the NEXT launch must first pass the HBM probe gate, because a killed
# TPU client leaks its HBM for ~10-20 min on this environment and the
# next child's first big allocation hangs silently (the round-4 failure)
_NEED_GATE = [False]


def _hbm_gate(max_wait=900.0):
    """Block OFF-BUDGET until a throwaway child can allocate ~1 GB.

    Runs only after a kill.  A leak from the killed predecessor makes the
    probe hang; the gate retries until the server reclaims the memory (or
    the bounded wait runs out), so a leak degrades start time, never the
    next workload's measurement."""
    t_end = time.time() + max_wait
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--probe"],
                capture_output=True, text=True, timeout=120)
            if "probe ok" in (r.stdout or ""):
                print(f"  HBM gate: clear (attempt {attempt})",
                      file=sys.stderr)
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() > t_end:
            print(f"  HBM gate: still blocked after {max_wait:.0f}s; "
                  f"launching anyway", file=sys.stderr)
            return False
        print(f"  HBM gate: probe attempt {attempt} hung/failed; "
              f"retrying in 30s", file=sys.stderr)
        time.sleep(30)


def _run_one(size, which, budget, expected, handle_line):
    """Launch one (size, workload) subprocess under its budget.

    returns True if any result line (provisional included) arrived."""
    import select
    import tempfile

    # child stderr goes to a temp file, not a pipe: a chatty child
    # that outgrows the ~64KB pipe buffer would block mid-run and
    # silently burn its whole budget (ADVICE r3)
    err_f = tempfile.TemporaryFile(mode="w+")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), f"--size={size}",
         which],
        stdout=subprocess.PIPE, stderr=err_f, text=True,
    )
    wl_budget = budget.get((size, which), 300)
    deadline = time.time() + wl_budget
    counts = {"got": 0, "any": 0}
    try:
        while True:
            if time.time() > deadline:
                proc.kill()
                _NEED_GATE[0] = True
                print(f"  {which} {size}^3 exceeded "
                      f"{wl_budget}s budget",
                      file=sys.stderr)
                break
            # select-bounded read: a silent subprocess must not block
            # readline past the deadline
            ready, _, _ = select.select(
                [proc.stdout], [], [],
                max(0.2, min(5.0, deadline - time.time())))
            if not ready:
                if proc.poll() is not None:
                    # drain lines readline() may have buffered past
                    # the raw fd (ADVICE r3: select on the fd can
                    # show empty while the TextIOWrapper holds the
                    # result line)
                    for line in proc.stdout:
                        handle_line(line, size, which, counts)
                    break
                continue
            line = proc.stdout.readline()
            if not line:
                if proc.poll() is not None:
                    break
                continue
            handle_line(line, size, which, counts)
            if counts["got"] >= expected[which]:
                # results are in.  Do NOT kill: the child frees its HBM
                # and exits on its own within ~20 s (_clean_exit); a kill
                # here leaked the child's multi-GB working set and hung
                # every later workload (BENCH_r04).  The finally-wait
                # below bounds a child whose watchdog somehow fails.
                break
    finally:
        try:
            proc.wait(timeout=45)
        except subprocess.TimeoutExpired:
            proc.kill()
            _NEED_GATE[0] = True
        try:
            err_f.seek(0)
            err = err_f.read()
        except Exception:
            err = ""
        err_f.close()
        if (err and counts["got"] < expected[which]
                and proc.returncode not in (0, None)):
            print(f"  {which} {size}^3 stderr tail:\n{err[-1500:]}",
                  file=sys.stderr)
    return counts["any"] > 0


if __name__ == "__main__":
    main()
