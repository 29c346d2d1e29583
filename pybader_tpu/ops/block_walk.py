"""In-VMEM block-local trajectory walker (the "fold walker").

The refinement walker is throughput-bound on dependent HBM row gathers:
one 8-byte q-row fetch per lane-step, ~91M lane-steps/s ceiling on v5e
whatever the row width or chain grouping (BASELINE.md "Walker cost
model").  This module walks the SAME trajectories with the fetch served
from VMEM instead: lanes are binned to the 16x16x128-voxel block of
their current position, and a Pallas kernel steps each (8,128) lane
tile against its block's q-row table resident in VMEM.

Mosaic's ``tpu.dynamic_gather`` handles a single source vreg along the
gather dimension only, so an arbitrary ``tbl[r, c]`` per-lane fetch
from a (256,128)-word block table is composed of supported primitives
(measured 738M lane-steps/s for the dependent two-word chain at
(8,128) lane tiles — ``_exp/fold_probe.py``, 8.1x the HBM ceiling):

    lane shuffle   take_along_axis(tbl, c, axis=1)   per-lane column
    binary fold    5x static half-slice + where      row bits 7..3
    sublane select take_along_axis(cur, r&7, axis=0) row bits 2..0

Stepping is op-for-op the arithmetic of ``neargrid._walk_segment_q``
(unscreened) / ``_walk_segment_qs`` (screened): q-row decode, ongrid
fallback by 5-bit neighbour code, correction-vector ``dr`` update,
revisit window, err/risky exactness screen.  A lane that steps outside
its tile's block freezes ("escapes") and is re-binned the next round;
the phase hands the state tuple back to ``walk_drain``'s global segment
loop for the long-trajectory tail, which also discovers any stop bits
the kernel could not see for escaped lanes.

Exactness: the screened walk's per-step error budget (``_QS_EPS``)
bounds |dr_q - dr_exact| against the EXACT walk, so it covers any
IEEE-correct f32 evaluation of the same ops — including Mosaic's
scheduling — and the risky/re-walk machinery of
``walk_drain_screened`` applies unchanged.  Screened results are
therefore bit-identical to exact-row walking whether a step ran in this
kernel or in the global walker.  Unscreened q-walks keep their
documented knife-edge caveat either way.

Reference semantics: the trajectory rules mirror the CPU reference's
neargrid stepping (``/root/reference/pybader/methods.py:222-611``) and
refinement re-walk stop handling (``refinement.py:16-322``) exactly as
``ops/neargrid.py`` documents them; this module changes WHERE a step's
operand row is fetched from, never the step itself.

Status: OFF BY DEFAULT — the kernel wins 8x in isolation but loses
end-to-end.  The 384^3 default-workload A/B (`_exp/block_walk_ab.py`,
v5e, warm) measured 128.1 s with the block phase on vs 50.0 s off: each
re-binning round pays a full-bucket argsort plus a 12-14-word-per-lane
state relayout (two orders more random ops than the ~8 useful steps a
lane advances before escaping its 16x16x128 block), and the fixed-trip
kernel burns its remaining steps on escaped lanes.  The negative result
and the arithmetic are recorded in BASELINE.md ("paths probed and
CLOSED"); the module stays as an opt-in engine and a tested primitive
(the composed VMEM gather) for a future formulation that walks longer
per bin — e.g. block-resident seeding rather than mid-walk re-binning.

Env:
    PYBADER_TPU_BLOCK_WALK=0|1   enable/disable (default: 0 = off; the
                                 re-binning overhead outweighs the VMEM
                                 gather win at every measured size)
    PYBADER_TPU_BLOCK_STEPS=N    in-kernel steps per round (default 24)
"""
from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BX, BY, BZ = 16, 16, 128   # block = 32768 voxels; table (256, 128)
BH = BX * BY               # table rows
_TILE = 1024               # lanes per (8,128) tile
_EPS = 3e-6  # python float: must match neargrid._QS_EPS (tested)

_ENABLED = os.environ.get("PYBADER_TPU_BLOCK_WALK", "0") == "1"
_STEPS = int(os.environ.get("PYBADER_TPU_BLOCK_STEPS", "24"))
_MIN_LANES = 1 << 17   # below this the global drain's tail bucket wins


def conforms(shape: tuple) -> bool:
    nx, ny, nz = shape
    return nx % BX == 0 and ny % BY == 0 and nz % BZ == 0


def enabled(shape: tuple, n_lanes: int, qmode: bool) -> bool:
    return (_ENABLED and qmode and conforms(shape)
            and n_lanes >= _MIN_LANES)


@partial(jax.jit, static_argnames=("shape",))
def build_tables(qrows, shape: tuple):
    """(N,2) q-rows -> two (nblocks, BH, BZ) i32 block tables.

    Block-major relayout so each block's rows are one contiguous
    (BH, BZ) panel: row = lx*BY + ly, col = lz.
    """
    nx, ny, nz = shape
    nbx, nby, nbz = nx // BX, ny // BY, nz // BZ
    qt = qrows.reshape(nbx, BX, nby, BY, nbz, BZ, 2)
    qt = qt.transpose(0, 2, 4, 1, 3, 5, 6)
    qt = qt.reshape(nbx * nby * nbz, BH, BZ, 2)
    return qt[..., 0], qt[..., 1]


def _round_away_f(x):
    # trunc(x + sign(x)*0.5) -> i32; float->int astype truncates toward
    # zero, so the explicit trunc of neargrid._round_away is redundant
    return (x + jnp.where(x > 0, jnp.float32(0.5),
                          jnp.float32(-0.5))).astype(jnp.int32)


def _fetch_fold(tbl, ploc):
    """tbl: (BH,BZ) i32; ploc: (8,128) flat block-local positions.

    returns (8,128) tbl[ploc >> 7, ploc & 127] per lane (composed
    lane-shuffle + binary row fold + sublane select; see module doc).
    """
    rows = []
    for s in range(8):
        p = ploc[s:s + 1]
        cb = jnp.broadcast_to(p & 127, (BH, 128))
        cur = jnp.take_along_axis(tbl, cb, axis=1)
        r = p >> 7
        n = BH
        while n > 8:
            half = n >> 1
            hi = jnp.broadcast_to((r & half) != 0, (half, 128))
            cur = jnp.where(hi, cur[half:n], cur[:half])
            n = half
        rb = jnp.broadcast_to(r & 7, (8, 128))
        rows.append(jnp.take_along_axis(cur, rb, axis=0)[:1])
    return jnp.concatenate(rows, axis=0)


def _wrap(v, n):
    # v in [-2, n+1] (|step| <= 2 per axis); single fold == remainder
    return jnp.where(v < 0, v + n, jnp.where(v >= n, v - n, v))


@lru_cache(maxsize=None)
def _make_call(shape: tuple, ntiles: int, steps: int, screened: bool,
               interpret: bool = False):
    nx, ny, nz = shape
    nbx, nby, nbz = nx // BX, ny // BY, nz // BZ
    nstate = 14 if screened else 12
    f32, i32 = jnp.float32, jnp.int32
    inv_scale = np.float32(1.0 / 262143.0).item()  # python float

    def kernel(meta_ref, w0_ref, w1_ref, *refs):
        # Mosaic cannot legalize scf.while with vector carries (measured:
        # "failed to legalize operation 'scf.yield'"); the loop is a
        # fixed-trip fori (scf.for) and whole-tile early exit is a
        # prefetched per-tile live flag instead of a loop condition.
        ins, outs = refs[:nstate], refs[nstate:]
        i = pl.program_id(0)
        m = meta_ref[i]          # 1-D packed: live<<30 | block (SMEM
        b = m & ((1 << 30) - 1)  # prefetch rows are lane-padded, so a
        live = m >> 30           # 2-D (ntiles,2) layout blows the 1 MB
        # SMEM budget at multi-M-lane buckets)
        bz = jax.lax.rem(b, nbz)
        rest = jax.lax.div(b, nbz)
        ox = jax.lax.div(rest, nby) * BX
        oy = jax.lax.rem(rest, nby) * BY
        oz = bz * BZ
        w0t, w1t = w0_ref[0], w1_ref[0]

        def in_block(x, y, z):
            lx, ly, lz = x - ox, y - oy, z - oz
            return ((lx >= 0) & (lx < BX) & (ly >= 0) & (ly < BY)
                    & (lz >= 0) & (lz < BZ))

        def body(step, c):
            (pos, prev, h0, h1, h2, x, y, z,
             dr0, dr1, dr2, done_i) = c[:12]
            if screened:
                err, risky_i = c[12], c[13]
            done = done_i != 0
            active = in_block(x, y, z) & ~done
            lx, ly, lz = x - ox, y - oy, z - oz
            ploc = jnp.where(active, (lx * BY + ly) * BZ + lz, 0)
            w0 = _fetch_fold(w0t, ploc)
            w1 = _fetch_fold(w1t, ploc)
            code = (w1 >> 25) & 31
            done2 = done | (active & ((w1 < 0) | (code == 13)))
            use_og = (w1 & (1 << 30)) != 0
            # q-row decode — bit-for-bit neargrid._q_decode
            q0 = (w0 << 13) >> 13
            q1 = ((((w0 >> 19) & 0x1FFF) | ((w1 & 0x3F) << 13))
                  << 13) >> 13
            q2 = (w1 << 7) >> 13
            g0 = q0.astype(f32) * inv_scale
            g1 = q1.astype(f32) * inv_scale
            g2 = q2.astype(f32) * inv_scale
            # ongrid offsets from the 5-bit code (OFFSETS order);
            # multiply-shift division, exact for code in [0, 31]
            c9 = (code * 7282) >> 16
            c3 = (code * 21846) >> 16
            ogx = _wrap(x + (c9 - 1), nx)
            ogy = _wrap(y + (c3 - c9 * 3 - 1), ny)
            ogz = _wrap(z + (code - c3 * 3 - 1), nz)
            og_flat = (ogx * ny + ogy) * nz + ogz
            # correction-vector step — op-for-op _walk_segment_q(s)
            ig0, ig1, ig2 = (_round_away_f(g) for g in (g0, g1, g2))
            dn0 = dr0 + g0 - ig0.astype(f32)
            dn1 = dr1 + g1 - ig1.astype(f32)
            dn2 = dr2 + g2 - ig2.astype(f32)
            id0, id1, id2 = (_round_away_f(d) for d in (dn0, dn1, dn2))
            da0 = dn0 - id0.astype(f32)
            da1 = dn1 - id1.astype(f32)
            da2 = dn2 - id2.astype(f32)
            gx = _wrap(x + ig0 + id0, nx)
            gy = _wrap(y + ig1 + id1, ny)
            gz = _wrap(z + ig2 + id2, nz)
            g_flat = (gx * ny + gy) * nz + gz
            nxt = jnp.where(use_og, og_flat, g_flat)
            revisit = ((nxt == pos) | (nxt == prev) | (nxt == h0)
                       | (nxt == h1) | (nxt == h2))
            fx = jnp.where(use_og | revisit, ogx, gx)
            fy = jnp.where(use_og | revisit, ogy, gy)
            fz = jnp.where(use_og | revisit, ogz, gz)
            ff = jnp.where(revisit, og_flat, nxt)
            reset = use_og | revisit
            da0 = jnp.where(reset, jnp.float32(0.0), da0)
            da1 = jnp.where(reset, jnp.float32(0.0), da1)
            da2 = jnp.where(reset, jnp.float32(0.0), da2)
            adv = active & ~done2
            new = (
                jnp.where(adv, ff, pos),
                jnp.where(adv, pos, prev),
                jnp.where(adv, prev, h0),
                jnp.where(adv, h0, h1),
                jnp.where(adv, h1, h2),
                jnp.where(adv, fx, x),
                jnp.where(adv, fy, y),
                jnp.where(adv, fz, z),
                jnp.where(adv, da0, dr0),
                jnp.where(adv, da1, dr1),
                jnp.where(adv, da2, dr2),
                done2.astype(jnp.int32),
            )
            if screened:
                d_g = jnp.minimum(
                    jnp.minimum(jnp.abs(jnp.abs(g0) - 0.5),
                                jnp.abs(jnp.abs(g1) - 0.5)),
                    jnp.abs(jnp.abs(g2) - 0.5))
                d_dr = jnp.minimum(
                    jnp.minimum(jnp.abs(jnp.abs(dn0) - 0.5),
                                jnp.abs(jnp.abs(dn1) - 0.5)),
                    jnp.abs(jnp.abs(dn2) - 0.5))
                risky_step = (d_g < _EPS) | (d_dr < err + _EPS)
                new = new + (
                    jnp.where(adv, jnp.where(reset, jnp.float32(0.0),
                                             err + _EPS), err),
                    ((risky_i != 0)
                     | (risky_step & ~use_og & ~done2 & active)
                     ).astype(jnp.int32),
                )
            return new

        @pl.when(live != 0)
        def _walk():
            fin = jax.lax.fori_loop(
                0, steps, body, tuple(r[:] for r in ins))
            for j in range(nstate):
                outs[j][:] = fin[j]

        @pl.when(live == 0)
        def _passthrough():
            for j in range(nstate):
                outs[j][:] = ins[j][:]

    lane_spec = pl.BlockSpec((8, 128), lambda i, meta: (i, 0),
                             memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec((1, BH, BZ),
                            lambda i, meta: (meta[i] & ((1 << 30) - 1),
                                             0, 0),
                            memory_space=pltpu.VMEM)
    i32s = jax.ShapeDtypeStruct((ntiles * 8, 128), jnp.int32)
    f32s = jax.ShapeDtypeStruct((ntiles * 8, 128), jnp.float32)
    out_shape = [i32s] * 8 + [f32s] * 3 + [i32s]
    if screened:
        out_shape += [f32s, i32s]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[tbl_spec, tbl_spec] + [lane_spec] * len(out_shape),
        out_specs=tuple([lane_spec] * len(out_shape)),
    )
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=interpret,
        **kw,
    )


@partial(jax.jit, static_argnames=("shape", "ntiles", "screened"))
def _prep_round(state, ord_total, shape: tuple, ntiles: int,
                screened: bool):
    """Sort lanes by current block; return kernel-ready arrays."""
    nx, ny, nz = shape
    nbx, nby, nbz = nx // BX, ny // BY, nz // BZ
    nblocks = nbx * nby * nbz
    pos, done = state[0], state[4]
    x = pos // (ny * nz)
    rem = pos - x * (ny * nz)
    y = rem // nz
    z = rem - y * nz
    key = (x // BX) * (nby * nbz) + (y // BY) * nbz + z // BZ
    key = jnp.where(done, jnp.int32(nblocks), key)
    order = jnp.argsort(key).astype(jnp.int32)
    key_s = jnp.take(key, order)
    # per-tile block: the median lane's (majority-ish after the sort);
    # if the tile's tail is all-done sentinels fall back to its first
    # lane's block.  live=0 tiles (all lanes done) skip compute entirely.
    firsts = jnp.take(key_s, jnp.arange(ntiles, dtype=jnp.int32) * _TILE)
    mids = jnp.arange(ntiles, dtype=jnp.int32) * _TILE + _TILE // 2
    blk = jnp.take(key_s, mids)
    blk = jnp.where(blk >= nblocks, firsts, blk)
    live = (firsts < nblocks).astype(jnp.int32)
    blk = jnp.where(blk >= nblocks, 0, blk)
    meta = blk | (live << 30)

    def g(a):
        return jnp.take(a, order, axis=0)

    pos, prev, hist, dr, done = (g(state[i]) for i in range(5))
    x, y, z = g(x), g(y), g(z)
    sh = (ntiles * 8, 128)
    arrs = [pos.reshape(sh), prev.reshape(sh),
            hist[:, 0].reshape(sh), hist[:, 1].reshape(sh),
            hist[:, 2].reshape(sh),
            x.reshape(sh), y.reshape(sh), z.reshape(sh),
            dr[:, 0].reshape(sh), dr[:, 1].reshape(sh),
            dr[:, 2].reshape(sh), done.astype(jnp.int32).reshape(sh)]
    if screened:
        arrs += [g(state[5]).reshape(sh),
                 g(state[6]).astype(jnp.int32).reshape(sh)]
    return meta, arrs, jnp.take(ord_total, order)


@partial(jax.jit, static_argnames=("screened",))
def _unpack_round(outs, screened: bool):
    flat = [o.reshape(-1) for o in outs]
    pos, prev = flat[0], flat[1]
    hist = jnp.stack(flat[2:5], axis=1)
    dr = jnp.stack(flat[8:11], axis=1)
    done = flat[11] != 0
    alive = jnp.sum(~done)
    if screened:
        return (pos, prev, hist, dr, done, flat[12], flat[13] != 0), alive
    return (pos, prev, hist, dr, done), alive


@jax.jit
def _restore_order(state, ord_total):
    inv = jnp.argsort(ord_total).astype(jnp.int32)
    return tuple(jnp.take(a, inv, axis=0) for a in state)


def block_phase(state, qrows, shape: tuple, screened: bool,
                progress=None, steps: int = 0, max_rounds: int = 12,
                min_alive: int = 32768):
    """Advance walk state via in-VMEM block rounds; same state contract.

    Lanes walk until they stop, leave their block, or the per-round
    in-kernel budget ends; rounds repeat (re-binning escapees) while
    they retire lanes efficiently, then the caller's global drain
    finishes the long tail.  Lane order is preserved.
    """
    steps = steps or _STEPS
    k0 = int(state[0].shape[0])
    ntiles = k0 // _TILE
    if ntiles * _TILE != k0 or ntiles == 0:
        return state, 0
    interp = jax.devices()[0].platform == "cpu"
    with jax.enable_x64(False):
        qt0, qt1 = build_tables(qrows, shape)
        call = _make_call(shape, ntiles, steps, screened, interp)
        ord_total = jnp.arange(k0, dtype=jnp.int32)
        last_alive = float(k0)
        slow = 0
        rounds = 0
        for rounds in range(1, max_rounds + 1):
            meta, arrs, ord_total = _prep_round(
                state, ord_total, shape, ntiles, screened)
            outs = call(meta, qt0, qt1, *arrs)
            state, alive = _unpack_round(outs, screened)
            n_alive = int(alive)
            if progress is not None:
                progress(rounds * steps, n_alive)
            if n_alive <= min_alive:
                break
            if n_alive > 0.96 * last_alive:
                slow += 1        # re-binning no longer pays: long
                if slow >= 2:    # trajectories or stuck minority lanes
                    break
            else:
                slow = 0
            last_alive = float(max(n_alive, 1))
        state = _restore_order(state, ord_total)
    return state, rounds
