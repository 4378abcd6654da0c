"""Spatial domain decomposition of the cell-pair sweep: shard_map + ppermute
halo exchange over a device mesh.

The MD analogue of sequence parallelism (SURVEY.md section 2.8): cells are
sharded as x-slabs across the 'atom' mesh axis; each device computes the
dense block sweep for its own cells after exchanging `window` boundary cell
planes with its ring neighbors via lax.ppermute (periodic wrap in x comes
for free from the ring topology).  Per-bath KE reductions and the total
energy are psums — the only global communication TGNH itself needs.

Round-1 scope: the sharded direct-space energy+force engine, validated
against the single-device sweep on a virtual 8-device CPU mesh
(tests/test_domain.py).  The fully-sharded step (constraint-aware atom
redistribution, sharded PME) is the round-2 flagship.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..forces import cellpair as cp


def _local_offsets(grid, window):
    """Full +/- stencil with x handled in extended (halo) coordinates."""
    def per_dim(n, w):
        if n >= 2 * w + 1:
            return list(range(-w, w + 1))
        return list(range(0, min(n, 2 * w + 1)))
    return [(ox, oy, oz)
            for ox in range(-window[0], window[0] + 1)
            for oy in per_dim(grid[1], window[1])
            for oz in per_dim(grid[2], window[2])]


def stencil_window(cfg: cp.CellPairConfig, box_diag) -> tuple:
    """Cell-plane reach of the cutoff stencil per dimension."""
    cell = np.asarray(box_diag, np.float64) / np.array(cfg.grid)
    return tuple(int(np.ceil(cfg.r_list / cell[d])) for d in range(3))


def make_sharded_pair_sweep(mesh: Mesh, axis: str, cfg: cp.CellPairConfig,
                            pair_eg, coulomb_scale: float, n_atoms: int,
                            window: tuple):
    """Build f(sorted_blocks, box_diag) -> (energy, force_blocks) where the
    (n_cells, C) block arrays are sharded as x-slabs over `axis`.

    sorted_blocks: dict with keys x, y, z, q, sig, eps, gid (+ ew<i>), each
    (n_cells, C), cell index x-major so contiguous shards are x-slabs.
    `window` from stencil_window(cfg, box_diag).  Requires
    grid[0] % mesh.shape[axis] == 0 and shard x-extent >= window[0]
    (a `window[0]`-plane halo is exchanged with each ring neighbor).
    """
    gx, gy, gz = cfg.grid
    n_dev = mesh.shape[axis]
    if gx % n_dev != 0:
        raise ValueError(f"grid x dim {gx} not divisible by {n_dev} devices")
    loc_x = gx // n_dev
    win = tuple(window)
    if loc_x < win[0]:
        raise ValueError(f"shard x-extent {loc_x} smaller than halo {win[0]}")

    offsets = _local_offsets((gx, gy, gz), win)
    cutoff2 = cfg.cutoff * cfg.cutoff
    W = cfg.excl_window
    C = cfg.capacity
    plane = gy * gz  # cells per x-plane

    def sweep(blocks, box_diag):
        """Executes per shard: blocks have (loc_x*plane, C) local shape."""
        # halo exchange: my last `win` planes -> right neighbor's left halo,
        # my first `win` planes -> left neighbor's right halo (ring)
        n_loc = loc_x * plane
        halo = win[0] * plane
        perm_fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        perm_bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

        ext = {}
        for k, v in blocks.items():
            left = jax.lax.ppermute(v[n_loc - halo:], axis, perm_fwd)
            right = jax.lax.ppermute(v[:halo], axis, perm_bwd)
            ext[k] = jnp.concatenate([left, v, right], axis=0)

        # local cell i (0..n_loc-1) sits at extended index i + halo
        base = jnp.arange(n_loc, dtype=jnp.int32) + halo
        cy = (jnp.arange(n_loc, dtype=jnp.int32) // gz) % gy
        cz = jnp.arange(n_loc, dtype=jnp.int32) % gz

        # mark the accumulators as device-varying over the shard axis so the
        # scan carry type matches its (varying) outputs
        def _pvary(x):
            if hasattr(jax.lax, "pcast"):
                return jax.lax.pcast(x, axis, to="varying")
            return jax.lax.pvary(x, axis)
        e_total = _pvary(jnp.zeros((), blocks["x"].dtype))
        f = [_pvary(jnp.zeros((n_loc, C), blocks["x"].dtype))
             for _ in range(3)]

        def one_offset(carry, o_idx):
            e_total, fx, fy, fz = carry
            off = jnp.asarray(offsets, jnp.int32)[o_idx]
            ox, oy, oz = off[0], off[1], off[2]
            ny = (cy + oy) % gy
            nz = (cz + oz) % gz
            b = base + ox * plane + (ny - cy) * gz + (nz - cz)
            e, g2, d = _block_eg(ext, blocks, b, box_diag, cutoff2, W, cfg)
            return (e_total + 0.5 * jnp.sum(e),
                    fx + jnp.sum(g2 * d[0], axis=2),
                    fy + jnp.sum(g2 * d[1], axis=2),
                    fz + jnp.sum(g2 * d[2], axis=2)), None

        (e_total, *f), _ = jax.lax.scan(
            one_offset, (e_total, f[0], f[1], f[2]),
            jnp.arange(len(offsets)), unroll=2)
        e_total = jax.lax.psum(e_total, axis)
        return e_total, jnp.stack([fc.reshape(-1) for fc in f], axis=1)

    def _block_eg(ext, blocks, b, box_diag, cutoff2, W, cfg):
        d = []
        r2 = 0.0
        for c, k in enumerate("xyz"):
            dc = blocks[k][:, :, None] - ext[k][b][:, None, :]
            dc = dc - box_diag[c] * jnp.round(dc / box_diag[c])
            d.append(dc)
            r2 = r2 + dc * dc
        gid_a = blocks["gid"][:, :, None]
        gid_b = ext["gid"][b][:, None, :]
        base_ok = (gid_a >= 0) & (gid_b >= 0) & (gid_a != gid_b)
        if W > 0:
            dg = gid_b - gid_a
            in_win = jnp.abs(dg) <= W
            bit = jnp.where(in_win, dg + W, 0)
            excl = jnp.zeros_like(base_ok)
            for w in range(cfg.excl_words):
                ew = blocks[f"ew{w}"][:, :, None]
                hit = (bit // 31 == w) & (((ew >> (bit % 31)) & 1) == 1)
                excl = excl | hit
            excl = base_ok & in_win & excl
        else:
            excl = jnp.zeros_like(base_ok)
        valid = base_ok & (r2 < cutoff2)
        r2s = jnp.where(valid, jnp.maximum(r2, 1e-6), 1.0)
        inv_r = jax.lax.rsqrt(r2s)
        inv_r2 = inv_r * inv_r
        qq = coulomb_scale * blocks["q"][:, :, None] * ext["q"][b][:, None, :]
        sig = 0.5 * (blocks["sig"][:, :, None] + ext["sig"][b][:, None, :])
        eps = jnp.sqrt(blocks["eps"][:, :, None] * ext["eps"][b][:, None, :])
        e, g = pair_eg(qq, sig, eps, r2s, inv_r, inv_r2, excl)
        e = jnp.where(valid, e, 0.0)
        g2 = jnp.where(valid, -2.0 * g, 0.0)
        return e, g2, d

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def apply(blocks, box_diag):
        specs_in = ({k: P(axis, None) for k in blocks}, P())
        specs_out = (P(), P(axis, None))
        fn = shard_map(sweep, mesh=mesh, in_specs=specs_in,
                       out_specs=specs_out)
        return fn(blocks, box_diag)

    return apply


def sorted_blocks_from_cellsort(params, positions, cellsort,
                                cfg: cp.CellPairConfig, n_atoms: int):
    """Build the (n_cells, C) block dict (same layout the local sweep
    uses)."""
    s = cp._sorted_arrays(params, positions, cellsort, cfg, n_atoms)
    return {k: v.reshape(cfg.n_cells, cfg.capacity) for k, v in s.items()}
