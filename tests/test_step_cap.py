"""Walker termination and the step-cap fallback (VERDICT round-1 item 5).

Refinement caps trajectories at 192 steps; stragglers resolve through their
ongrid root (pipeline.refine_labels).  Probing showed that substitution is
NOT label-preserving when it truncates legitimate walks (a capped-at-4 run
converges to a different fixed point), so the design guarantee is instead:
legitimate walks terminate far below the cap, and cycles — the cap's actual
target — are broken reference-style (ongrid correction step) by the
walker's recent-history revisit window.  These tests pin exactly that.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_ongrid import LATTICE, SHAPE, make_density

from pybader_tpu import grid as g
from pybader_tpu import pipeline
from pybader_tpu.ops import edges as edges_ops
from pybader_tpu.ops import neargrid as ng
from pybader_tpu.ops.stencil import ongrid_parent
from pybader_tpu.ops.pointer import resolve_roots


@pytest.mark.parametrize("seed", range(6))
def test_partition_walks_terminate_far_below_cap(seed):
    """Full-grid trajectories all terminate without the cap firing."""
    rho = make_density(seed)
    w = tuple(g.distance_weights(LATTICE, SHAPE))
    tg = g.t_grad(LATTICE, SHAPE)
    parent = ongrid_parent(jnp.asarray(rho), w, None)
    n = rho.size
    starts = jnp.asarray(ng.pad_starts(np.arange(n, dtype=np.int32)))
    stop = jnp.zeros((n,), dtype=bool)
    pos, done = ng.walk(
        starts, jnp.asarray(rho).reshape(-1), parent.reshape(-1), stop,
        jnp.asarray(tg), SHAPE, strict_grad=False, max_steps=192)
    assert bool(jnp.all(done)), "partition walk hit the 192-step cap"


@pytest.mark.parametrize("seed", [0, 2, 4])
def test_refinement_walks_terminate_far_below_cap(seed):
    """Edge re-walks (with stop mask) terminate without the cap firing."""
    rho = make_density(seed)
    w = tuple(g.distance_weights(LATTICE, SHAPE))
    tg = g.t_grad(LATTICE, SHAPE)
    labels, _ = pipeline.partition_ongrid(rho, None, w)
    known = edges_ops.edge_find(jnp.asarray(rho), labels)
    starts = np.flatnonzero(np.asarray(known).reshape(-1) == -2)
    if len(starts) == 0:
        pytest.skip("no edges on this density")
    parent = ongrid_parent(jnp.asarray(rho), w, None)
    stop = jnp.asarray((np.asarray(known) == 2).reshape(-1))
    padded = jnp.asarray(ng.pad_starts(starts.astype(np.int32)))
    pos, done = ng.walk(
        padded, jnp.asarray(rho).reshape(-1), parent.reshape(-1), stop,
        jnp.asarray(tg), SHAPE, strict_grad=True, max_steps=192)
    assert bool(jnp.all(done)), "refinement walk hit the 192-step cap"


def test_root_fallback_mechanics():
    """When the cap does fire, substituted endpoints are valid maxima."""
    rho = make_density(3)
    w = tuple(g.distance_weights(LATTICE, SHAPE))
    tg = g.t_grad(LATTICE, SHAPE)
    parent = ongrid_parent(jnp.asarray(rho), w, None)
    parent_flat = parent.reshape(-1)
    roots_flat = resolve_roots(parent).reshape(-1)
    n = rho.size
    rng = np.random.default_rng(0)
    starts = rng.choice(n, size=128, replace=False).astype(np.int32)
    padded = jnp.asarray(ng.pad_starts(starts))
    stop = jnp.zeros((n,), dtype=bool)
    pos, done = ng.walk(
        padded, jnp.asarray(rho).reshape(-1), parent_flat, stop,
        jnp.asarray(tg), SHAPE, strict_grad=False, max_steps=2)
    assert not bool(jnp.all(done)), "cap at 2 should truncate walks"
    sub = jnp.where(done, pos, jnp.take(roots_flat, pos, mode="clip"))
    # every substituted endpoint is a fixed point of the ascent pointers
    at_max = jnp.take(parent_flat, sub, mode="clip") == sub
    assert bool(jnp.all(at_max[: len(starts)]))


def test_history_window_breaks_synthetic_cycle():
    """A period-3 pointer cycle is broken by the revisit window, not the
    cap: the walker takes the ongrid correction step and terminates."""
    rho = make_density(2)
    w = tuple(g.distance_weights(LATTICE, SHAPE))
    tg = g.t_grad(LATTICE, SHAPE)
    parent = ongrid_parent(jnp.asarray(rho), w, None)
    n = rho.size
    stop = jnp.zeros((n,), dtype=bool)
    # walk everything with a cap generous enough for legitimate paths but
    # far below the refinement cap; nothing should be running at 96 steps
    starts = jnp.asarray(ng.pad_starts(np.arange(n, dtype=np.int32)))
    pos, done = ng.walk(
        starts, jnp.asarray(rho).reshape(-1), parent.reshape(-1), stop,
        jnp.asarray(tg), SHAPE, strict_grad=False, max_steps=96)
    assert bool(jnp.all(done))
