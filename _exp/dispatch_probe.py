#!/usr/bin/env python
"""Measure per-dispatch overhead of walker segments through the tunnel.

Times K chained 8-step segments vs one K*8-step segment on the same
bucket: the difference divided by K-1 is the fixed cost of one extra
dispatch+boundary (with and without a blocking count fetch per segment).
Grounds walk_drain's boundary cost model (_COUNT_RTT).

Usage: PYTHONPATH=.:/root/.axon_site python _exp/dispatch_probe.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bench import _enable_cache, synthetic_density
    _enable_cache()
    import jax
    import jax.numpy as jnp

    from pybader_tpu import grid, pipeline
    from pybader_tpu.ops import neargrid as ng
    from pybader_tpu.ops.stencil import parent_from_step_codes

    shape = (192, 192, 192)
    lattice = np.diag([20.0] * 3)
    rho = synthetic_density(shape)
    w = tuple(grid.distance_weights(lattice, shape))
    tg = grid.t_grad(lattice, shape)
    rho_j = jnp.asarray(rho)
    bk = pipeline._step_codes_auto(rho_j, w)
    parent = parent_from_step_codes(bk)
    rows = ng.precompute_rows(rho_j, parent, jnp.asarray(tg),
                              strict_grad=True)
    rows = ng.update_stop(rows, jnp.zeros(rho.size, bool))

    rng = np.random.default_rng(0)
    for lanes in (1 << 16, 1 << 21):
        starts = jnp.asarray(
            rng.integers(0, rho.size, size=lanes), jnp.int32)
        state0 = ng._init_state(starts, rows.dtype)

        def run(n_segs, seg, fetch_each):
            state = state0
            cnts = []
            t0 = time.perf_counter()
            for _ in range(n_segs):
                state, cnt = ng._walk_segment_counted(
                    state, rows, shape, seg, early_exit=False)
                if fetch_each:
                    cnts.append(int(cnt))
            n = int(cnt)
            return time.perf_counter() - t0, n

        for which in range(2):
            run(1, 8, False)  # warm both programs
            run(1, 96, False)
        t12, n1 = run(12, 8, False)
        t12f, _ = run(12, 8, True)
        t1, n2 = run(1, 96, False)
        print(f"lanes={lanes}: 12x8-step {t12:.3f}s "
              f"(+count fetches {t12f:.3f}s), 1x96-step {t1:.3f}s -> "
              f"per-dispatch {(t12 - t1) / 11 * 1e3:.0f} ms, "
              f"per-fetch {(t12f - t12) / 12 * 1e3:.0f} ms "
              f"(alive {n1}/{n2})", flush=True)


if __name__ == "__main__":
    main()
